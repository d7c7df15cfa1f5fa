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


def test_png_roundtrip_exact():
    from tsdownsample_ray.stages.multimodal import decode_png, encode_png

    rng = np.random.default_rng(7)
    for h, w in ((1, 1), (3, 5), (17, 9), (40, 33)):
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert (decode_png(encode_png(img)) == img).all()


def test_png_all_filter_types():
    """Decode handles every PNG scanline filter (an independent filter
    implementation builds the test payloads)."""
    import struct
    import zlib

    from tsdownsample_ray.stages.multimodal import _PNG_SIG, decode_png

    def filt(img, ftypes):
        h, w = img.shape[:2]
        stride = w * 3
        flat = img.reshape(h, stride).astype(np.int64)
        rows = []
        for y in range(h):
            f = ftypes[y % len(ftypes)]
            cur = flat[y]
            prev = flat[y - 1] if y else np.zeros(stride, np.int64)
            line = np.empty(stride, np.int64)
            for i in range(stride):
                a = cur[i - 3] if i >= 3 else 0
                b = prev[i]
                c = prev[i - 3] if i >= 3 else 0
                if f == 0:
                    pred = 0
                elif f == 1:
                    pred = a
                elif f == 2:
                    pred = b
                elif f == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - c
                    pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa_ <= pb and pa_ <= pc) else (
                        b if pb <= pc else c)
                line[i] = (cur[i] - pred) % 256
            rows.append(bytes([f]) + bytes(line.astype(np.uint8)))
        return b"".join(rows)

    def build(img, ftypes):
        h, w = img.shape[:2]

        def chunk(ctype, data):
            return (struct.pack(">I", len(data)) + ctype + data
                    + struct.pack(">I", zlib.crc32(ctype + data)))

        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        return (_PNG_SIG + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(filt(img, ftypes)))
                + chunk(b"IEND", b""))

    img = np.random.default_rng(3).integers(0, 256, (10, 7, 3),
                                            dtype=np.uint8)
    for ftypes in ([1], [2], [3], [4], [0, 1, 2, 3, 4]):
        assert (decode_png(build(img, ftypes)) == img).all()


def test_decode_image_real_png_stage(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.multimodal import DecodeImage, encode_png

    rng = np.random.default_rng(5)
    imgs = [rng.integers(0, 256, (6 + i, 5, 3), dtype=np.uint8)
            for i in range(4)]
    t = pa.table({
        "media_id": pa.array(range(4), pa.int64()),
        "kind": pa.array(["image"] * 4),
        "payload": pa.array([encode_png(im) for im in imgs], pa.binary()),
        "height": pa.array([im.shape[0] for im in imgs], pa.int32()),
        "width": pa.array([5] * 4, pa.int32()),
    })
    out = rd.from_arrow(t).map_batches(
        DecodeImage, batch_format="pyarrow", batch_size=2,
        concurrency=(1, 2)).to_pandas().sort_values("media_id")
    for i, row in out.reset_index(drop=True).iterrows():
        assert (np.asarray(row.pixels, dtype=np.uint8)
                == imgs[i].reshape(-1)).all()


# --- MP4 container (ISO BMFF) demuxer --------------------------------------

def test_mp4_roundtrip_sample_table():
    from tsdownsample_ray.functions.mp4 import encode_mp4, mp4_sample_table

    frames = [bytes([i]) * (10 + 7 * i) for i in range(20)]  # variable sizes
    payload = encode_mp4(frames, fps=25, timescale=1000)
    t = mp4_sample_table(payload)
    assert t["timescale"] == 1000
    assert list(t["sizes"]) == [len(f) for f in frames]
    assert list(t["ts_ms"]) == [i * 40 for i in range(20)]
    # offsets point at the actual frame bytes inside mdat
    for off, size, f in zip(t["offsets"], t["sizes"], frames):
        assert payload[off: off + size] == f


def test_mp4_extract_samples():
    from tsdownsample_ray.functions.mp4 import encode_mp4, mp4_extract_samples

    frames = [f"frame-{i:03d}".encode() + bytes(i) for i in range(50)]
    payload = encode_mp4(frames, fps=10)
    got = mp4_extract_samples(payload, np.array([0, 7, 49]))
    assert got == [frames[0], frames[7], frames[49]]


def test_mp4_multichunk_stsc():
    """Multi-chunk layout (stsc runs + multiple stco entries) resolves
    per-sample offsets correctly — built by hand, not via encode_mp4."""
    import struct

    from tsdownsample_ray.functions import mp4 as m

    frames = [bytes([65 + i]) * (4 + i) for i in range(6)]
    # chunks: [f0,f1], [f2,f3], [f4,f5] with a gap byte between chunks
    chunk_bytes = [b"".join(frames[0:2]), b"".join(frames[2:4]),
                   b"".join(frames[4:6])]
    mdat_payload = b"\x00".join(chunk_bytes)
    ftyp = m._box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mdat = m._box(b"mdat", mdat_payload)
    base = len(ftyp) + 8
    offs = [base, base + len(chunk_bytes[0]) + 1,
            base + len(chunk_bytes[0]) + len(chunk_bytes[1]) + 2]

    stsd = m._full(b"stsd", 0, 0, struct.pack(">I", 1))
    stts = m._full(b"stts", 0, 0, struct.pack(">III", 1, 6, 100))
    # entry_count=1, first_chunk=1, samples_per_chunk=2, sdi=1
    stsc = m._full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, 2, 1))
    stsz = m._full(b"stsz", 0, 0, struct.pack(">II", 0, 6)
                   + b"".join(struct.pack(">I", len(f)) for f in frames))
    stco = m._full(b"stco", 0, 0, struct.pack(">I", 3)
                   + b"".join(struct.pack(">I", o) for o in offs))
    stbl = m._box(b"stbl", stsd + stts + stsc + stsz + stco)
    mdhd = m._full(b"mdhd", 0, 0, struct.pack(">IIIIHH", 0, 0, 1000, 600,
                                              0x55C4, 0))
    mdia = m._box(b"mdia", mdhd + m._box(b"minf", stbl))
    moov = m._box(b"moov", m._box(b"trak", mdia))
    payload = ftyp + mdat + moov

    t = m.mp4_sample_table(payload)
    assert list(t["sizes"]) == [len(f) for f in frames]
    got = m.mp4_extract_samples(payload, np.arange(6))
    assert got == frames
    assert list(t["ts_ms"]) == [0, 100, 200, 300, 400, 500]


def test_sample_frames_real_mp4():
    """SampleFrames(fake=False) demuxes MP4: EveryNth over the stts
    timeline, frame bytes sliced straight from mdat."""
    from tsdownsample_ray.functions.mp4 import encode_mp4
    from tsdownsample_ray.kernels import everynth
    from tsdownsample_ray.stages.multimodal import SampleFrames

    frames = [f"F{i:04d}".encode() * (1 + i % 3) for i in range(100)]
    payload = encode_mp4(frames, fps=25, timescale=1000)
    t = pa.table({
        "media_id": pa.array([9], pa.int64()),
        "payload": pa.array([payload], pa.binary()),
        "duration_ms": pa.array([4000], pa.int32()),
    })
    out = SampleFrames(n_frames=16, fake=False)(t)
    ts = np.arange(100, dtype=np.int64) * 40
    idx = everynth(None, ts, 16).astype(np.intp)
    assert out["frame_ts_ms"][0].as_py() == ts[idx].tolist()
    assert out["frames"][0].as_py() == [frames[i] for i in idx]


def test_sample_frames_corrupt_mp4_raises():
    from tsdownsample_ray.stages.multimodal import SampleFrames

    # ftyp magic present but box structure is garbage -> ValueError from
    # the demuxer, not silently empty output
    t = pa.table({
        "media_id": pa.array([1], pa.int64()),
        "payload": pa.array([b"\x00\x00\x00\x08ftyp" + b"\xff" * 4],
                            pa.binary()),
        "duration_ms": pa.array([100], pa.int32()),
    })
    with pytest.raises(ValueError):
        SampleFrames(fake=False)(t)


def test_g711_bit_identical_to_audioop():
    """Vectorized G.711 == stdlib audioop C reference, exhaustively."""
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import audioop

    from tsdownsample_ray.functions.g711 import (
        alaw_decode, alaw_encode, mulaw_decode, mulaw_encode,
    )

    pcm = np.arange(-32768, 32768, dtype=np.int16)
    allb = np.arange(256, dtype=np.uint8)
    assert (mulaw_encode(pcm) ==
            np.frombuffer(audioop.lin2ulaw(pcm.tobytes(), 2), np.uint8)).all()
    assert (mulaw_decode(allb) ==
            np.frombuffer(audioop.ulaw2lin(allb.tobytes(), 2), np.int16)).all()
    assert (alaw_encode(pcm) ==
            np.frombuffer(audioop.lin2alaw(pcm.tobytes(), 2), np.uint8)).all()
    assert (alaw_decode(allb) ==
            np.frombuffer(audioop.alaw2lin(allb.tobytes(), 2), np.int16)).all()


def test_au_container_roundtrip_and_decode_audio():
    from tsdownsample_ray.functions.g711 import decode_au, encode_au
    from tsdownsample_ray.stages.multimodal import DecodeAudio

    s = np.array([0, 500, -500, 30000, -30000], dtype=np.int16)
    # linear PCM16 is lossless through AU
    dec, rate = decode_au(encode_au(s, 16000, "pcm16"))
    assert rate == 16000
    assert (np.rint(dec * 32768).astype(np.int16) == s).all()
    # companded paths are within G.711 quantization error
    for enc in ("mulaw", "alaw"):
        dec, _ = decode_au(encode_au(s, 8000, enc))
        assert np.abs(dec * 32768 - s).max() < 1024
    # the actor stage dispatches on the AU magic
    batch = pa.table({
        "media_id": pa.array([1], pa.int64()),
        "payload": pa.array([encode_au(s, 8000, "mulaw")], pa.binary()),
        "duration_ms": pa.array([0], pa.int32()),
    })
    out = DecodeAudio()(batch)
    assert out["sample_rate"][0].as_py() == 8000
    assert len(out["samples"][0].as_py()) == len(s)
    # bad magic still raises (honest stub for perceptual codecs)
    bad = pa.table({
        "media_id": pa.array([1], pa.int64()),
        "payload": pa.array([b"ID3\x03fakemp3"], pa.binary()),
        "duration_ms": pa.array([0], pa.int32()),
    })
    with pytest.raises(NotImplementedError):
        DecodeAudio()(bad)
