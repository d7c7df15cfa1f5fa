"""Baseline JPEG codec tests (functions/jpeg.py) + DecodeImage dispatch.

No reference counterpart (the reference is a downsampling kernel library)
— this layer is the brief-mandated multimodal decode support.
"""

import numpy as np
import pyarrow as pa
import pytest

from tsdownsample_ray.functions.jpeg import (
    _BitWriter, _pack_bits, dc_exact_quant, decode_jpeg, encode_jpeg)


def test_constant_blocks_exact_roundtrip():
    """8x8-constant blocks survive the LOSSY codec exactly when the DC
    quantizer is 8 — the property the driver oracle relies on."""
    rng = np.random.default_rng(1)
    vals = rng.integers(0, 256, size=(6, 9), dtype=np.uint8)
    img = np.kron(vals, np.ones((8, 8), np.uint8))
    dec = decode_jpeg(encode_jpeg(img, quant=dc_exact_quant()))
    assert dec.dtype == np.uint8 and dec.shape == img.shape
    assert np.array_equal(dec, img)


def test_allones_quant_near_lossless_gray():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, size=(24, 40), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quant=np.ones((8, 8), np.int64)))
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2


def test_rgb_roundtrip_shape_and_smooth_error():
    gx = np.linspace(0, 255, 64)
    smooth = np.stack([np.tile(gx, (32, 1)), np.tile(gx[::-1], (32, 1)),
                       np.full((32, 64), 100.0)], -1).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(smooth))
    assert dec.shape == smooth.shape
    assert np.abs(dec.astype(int) - smooth.astype(int)).max() <= 6


def test_non_multiple_of_8_dims_pad_and_crop():
    rng = np.random.default_rng(3)
    for h, w in ((1, 1), (7, 13), (17, 9)):
        img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        dec = decode_jpeg(encode_jpeg(img, quant=np.ones((8, 8), np.int64)))
        assert dec.shape == (h, w)
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2


def test_restart_markers_roundtrip():
    """DRI/RSTn: encoder emits restart markers, decoder resyncs and
    resets DC prediction at each one."""
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, size=(16, 40), dtype=np.uint8)  # 10 MCUs
    enc = encode_jpeg(img, quant=np.ones((8, 8), np.int64),
                      restart_interval=3)
    assert b"\xff\xdd" in enc and b"\xff\xd0" in enc
    dec = decode_jpeg(enc)
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2


def test_pack_bits_matches_bitwriter():
    """The vectorized DC-only packer must emit the identical stuffed
    byte stream as the per-symbol _BitWriter."""
    rng = np.random.default_rng(5)
    lens = rng.integers(1, 25, size=200).astype(np.int64)
    vals = np.array([int(rng.integers(0, 1 << l)) for l in lens],
                    dtype=np.int64)
    bw = _BitWriter()
    for v, l in zip(vals, lens):
        bw.write(int(v), int(l))
    bw.flush()
    assert bytes(_pack_bits(vals, lens)) == bytes(bw.buf)


def test_fast_and_general_entropy_paths_agree():
    """A constant-block image takes the vectorized DC-only path; forcing
    the general loop (restart_interval=1 disables the fast path) must
    decode to the same pixels."""
    rng = np.random.default_rng(6)
    vals = rng.integers(0, 256, size=(3, 4), dtype=np.uint8)
    img = np.kron(vals, np.ones((8, 8), np.uint8))
    q = dc_exact_quant()
    fast = decode_jpeg(encode_jpeg(img, quant=q))
    slow = decode_jpeg(encode_jpeg(img, quant=q, restart_interval=1))
    assert np.array_equal(fast, slow) and np.array_equal(fast, img)


def test_error_paths():
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((8, 8), np.float64))  # dtype
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((8, 8, 2), np.uint8))  # channels
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01not a jpeg")
    # progressive SOF2 refused, not mis-decoded
    enc = bytearray(encode_jpeg(np.zeros((8, 8), np.uint8)))
    sof = enc.find(b"\xff\xc0")
    enc[sof + 1] = 0xC2
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(enc))
    # subsampled SOF refused
    enc = bytearray(encode_jpeg(np.zeros((8, 8, 3), np.uint8)))
    sof = enc.find(b"\xff\xc0")
    enc[sof + 11] = 0x22  # comp 1 sampling 2x2
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(enc))


def test_decode_image_real_jpeg_stage(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.multimodal import DecodeImage

    rng = np.random.default_rng(8)
    grids = [rng.integers(0, 256, size=(2 + i, 8), dtype=np.uint8)
             for i in range(4)]
    imgs = [np.kron(g, np.ones((8, 8), np.uint8)) for g in grids]
    t = pa.table({
        "media_id": pa.array(range(4), pa.int64()),
        "kind": pa.array(["image"] * 4),
        "payload": pa.array(
            [encode_jpeg(im, quant=dc_exact_quant()) for im in imgs],
            pa.binary()),
        "height": pa.array([im.shape[0] for im in imgs], pa.int32()),
        "width": pa.array([64] * 4, pa.int32()),
    })
    out = rd.from_arrow(t).map_batches(
        DecodeImage, batch_format="pyarrow", batch_size=2,
        concurrency=(1, 2)).to_pandas().sort_values("media_id")
    for i, row in out.reset_index(drop=True).iterrows():
        assert (np.asarray(row.pixels, dtype=np.uint8)
                == imgs[i].reshape(-1)).all()
        assert row.height == imgs[i].shape[0] and row.width == 64
