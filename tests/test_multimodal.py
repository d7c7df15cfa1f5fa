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
