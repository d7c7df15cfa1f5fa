"""Real stdlib decoders (BMP via struct/NumPy, WAV via wave) behind the
multimodal actor stages; fake pseudo-decoders remain for codec formats."""

import numpy as np
import pyarrow as pa
import pytest

from tsdownsample_ray.stages.multimodal import (DecodeAudio, DecodeImage,
                                                ResizeImage, decode_bmp,
                                                decode_wav, encode_bmp,
                                                encode_wav)


def test_bmp_roundtrip_exact():
    rng = np.random.default_rng(2)
    for h, w in ((5, 7), (8, 8), (3, 1), (16, 33)):  # odd widths hit padding
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(img)), img), (h, w)


def test_wav_roundtrip_exact():
    rng = np.random.default_rng(3)
    s = rng.integers(-32768, 32767, 1000).astype(np.int16)
    dec, rate = decode_wav(encode_wav(s, rate=8000))
    assert rate == 8000
    assert np.array_equal(np.rint(dec * 32768.0).astype(np.int16), s)


def test_decode_image_real_bmp_stage():
    rng = np.random.default_rng(4)
    imgs = [rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
            for _ in range(3)]
    t = pa.table({
        "media_id": pa.array([1, 2, 3], pa.int64()),
        "payload": pa.array([encode_bmp(i) for i in imgs], pa.binary()),
        "height": pa.array([0, 0, 0], pa.int32()),  # decoder must OVERWRITE
        "width": pa.array([0, 0, 0], pa.int32()),
    })
    out = DecodeImage()(t)  # real path, no fake flag
    assert out["height"].to_pylist() == [6, 6, 6]
    assert out["width"].to_pylist() == [5, 5, 5]
    for got, img in zip(out["pixels"].to_pylist(), imgs):
        assert np.array_equal(np.asarray(got, np.uint8), img.reshape(-1))
    # resize over the REAL decode
    rz = ResizeImage(out_h=3, out_w=3)(out)
    first = np.asarray(rz["pixels"][0].as_py(), np.uint8).reshape(3, 3, 3)
    yi = np.arange(3) * 6 // 3
    xi = np.arange(3) * 5 // 3
    assert np.array_equal(first, imgs[0][yi][:, xi])


def test_decode_audio_real_wav_stage():
    s = (np.arange(200) % 97).astype(np.int16)
    t = pa.table({
        "media_id": pa.array([7], pa.int64()),
        "payload": pa.array([encode_wav(s, rate=16_000)], pa.binary()),
        "duration_ms": pa.array([0], pa.int32()),
    })
    out = DecodeAudio()(t)
    assert out["sample_rate"].to_pylist() == [16_000]
    got = np.rint(np.asarray(out["samples"][0].as_py()) * 32768.0)
    assert np.array_equal(got.astype(np.int16), s)


def test_unsupported_formats_still_raise():
    t = pa.table({
        "media_id": pa.array([1], pa.int64()),
        "payload": pa.array([b"\x89PNG...."], pa.binary()),
        "height": pa.array([4], pa.int32()),
        "width": pa.array([4], pa.int32()),
        "duration_ms": pa.array([10], pa.int32()),
    })
    with pytest.raises(NotImplementedError):
        DecodeImage()(t)
    with pytest.raises(NotImplementedError):
        DecodeAudio()(t)
    # fake path still works for both
    assert DecodeImage(fake=True)(t).num_rows == 1
    assert DecodeAudio(fake=True)(t).num_rows == 1
