"""IMA ADPCM codec: reference replay, container roundtrip, dispatch."""

import numpy as np


def _ref_step(s, pred, index, steps, itab):
    """Independent literal transcription of the IMA ADPCM encoder step
    (IMA Digital Audio Pack 1992): returns (nibble, pred', index')."""
    step = steps[index]
    diff = s - pred
    nib = 8 if diff < 0 else 0
    diff = abs(diff)
    vpdiff = step >> 3
    if diff >= step:
        nib |= 4
        diff -= step
        vpdiff += step
    if diff >= step >> 1:
        nib |= 2
        diff -= step >> 1
        vpdiff += step >> 1
    if diff >= step >> 2:
        nib |= 1
        vpdiff += step >> 2
    pred = pred - vpdiff if nib & 8 else pred + vpdiff
    pred = max(-32768, min(32767, pred))
    index = max(0, min(88, index + itab[nib & 7]))
    return nib, pred, index


def test_encode_matches_reference_and_decode_lockstep():
    from tsdownsample_ray.functions.adpcm import (INDEX_TABLE, STEP_TABLE,
                                                  ima_decode, ima_encode)

    rng = np.random.default_rng(5)
    pcm = np.concatenate([
        rng.integers(-32768, 32768, 500),
        np.array([0, 32767, -32768, 32767, -32768, 0]),
        (1000 * np.sin(np.arange(200) / 7)).astype(int),
    ]).astype(np.int16)
    nib = ima_encode(pcm)
    steps = STEP_TABLE.tolist()
    itab = INDEX_TABLE.tolist()
    pred = index = 0
    exp_nib, exp_dec = [], []
    for s in pcm.tolist():
        nb, pred, index = _ref_step(s, pred, index, steps, itab)
        exp_nib.append(nb)
        exp_dec.append(pred)
    assert nib.tolist() == exp_nib
    # decoder lockstep: decoded sample == encoder's updated predictor
    assert ima_decode(nib).tolist() == exp_dec


def test_wav_container_roundtrip_odd_and_even():
    from tsdownsample_ray.functions.adpcm import (decode_wav_ima,
                                                  encode_wav_ima,
                                                  ima_decode, ima_encode)

    rng = np.random.default_rng(9)
    for n in (0, 1, 7, 64, 333):
        pcm = rng.integers(-2000, 2000, n).astype(np.int16)
        payload = encode_wav_ima(pcm, rate=8000)
        dec, rate = decode_wav_ima(payload)
        assert rate == 8000
        assert dec.tolist() == ima_decode(ima_encode(pcm)).tolist()
        assert len(dec) == n  # pad nibble dropped via the fact chunk


def test_decode_audio_dispatches_fmt_tag(ray_session):
    import pyarrow as pa

    from tsdownsample_ray.functions.adpcm import encode_wav_ima, ima_decode, \
        ima_encode
    from tsdownsample_ray.stages.multimodal import DecodeAudio

    pcm = np.arange(-50, 50, dtype=np.int16) * 100
    batch = pa.table({
        "media_id": pa.array([1]),
        "payload": pa.array([encode_wav_ima(pcm)], pa.binary()),
        "duration_ms": pa.array([0], pa.int32()),
    })
    out = DecodeAudio()(batch)
    got = np.rint(np.array(out["samples"][0].as_py()) * 32768).astype(int)
    assert got.tolist() == ima_decode(ima_encode(pcm)).tolist()


def test_decode_wav_ima_rejects_garbage():
    import pytest

    from tsdownsample_ray.functions.adpcm import decode_wav_ima

    with pytest.raises(ValueError):
        decode_wav_ima(b"nope" + b"\x00" * 40)
