"""Round-trip and compression-ratio tests for the Gorilla-style codecs."""

import numpy as np
import pytest

from tsdownsample_ray.functions.gorilla import (
    decode_timestamps,
    decode_values,
    encode_timestamps,
    encode_values,
)


@pytest.mark.parametrize("ts", [
    np.array([], dtype=np.int64),
    np.array([5], dtype=np.int64),
    np.arange(0, 1000) * 900_000_000,                      # perfectly regular
    np.array([0, 10, 20, 25, 100, 1 << 50, (1 << 50) + 3]),  # wild gaps
    np.cumsum(np.random.default_rng(0).integers(1, 10_000, 500)),
    np.array([-5, -3, 0, 7], dtype=np.int64),               # negative ts
])
def test_timestamps_roundtrip(ts):
    ts = np.asarray(ts, dtype=np.int64)
    assert np.array_equal(decode_timestamps(encode_timestamps(ts)), ts)


def test_timestamps_regular_is_tiny():
    ts = np.arange(0, 4096) * 900_000_000
    blob = encode_timestamps(ts)
    # dod == 0 everywhere -> ~1 bit per point + header
    assert len(blob) < 4096 // 8 + 32


@pytest.mark.parametrize("vals", [
    np.array([], dtype=np.float64),
    np.array([3.25], dtype=np.float64),
    np.full(1000, 42.5),
    np.random.default_rng(1).standard_normal(1000),
    np.array([1.0, np.nan, np.inf, -np.inf, 0.0, -0.0]),
    np.sin(np.arange(2000) / 50.0) * 100,
])
def test_values_roundtrip_float(vals):
    vals = np.asarray(vals, dtype=np.float64)
    words = vals.view(np.uint64)
    back = decode_values(encode_values(words)).view(np.float64)
    assert np.array_equal(back.view(np.uint64), words)  # bit-exact incl NaN


@pytest.mark.parametrize("vals", [
    np.arange(1000, dtype=np.int64),
    np.random.default_rng(2).integers(-1 << 40, 1 << 40, 500),
    np.array([0, 0, 0, 5, 5, -1], dtype=np.int64),
])
def test_values_roundtrip_int(vals):
    words = np.ascontiguousarray(vals, dtype=np.int64).view(np.uint64)
    back = decode_values(encode_values(words)).view(np.int64)
    assert np.array_equal(back, vals)


def test_constant_values_compress_well():
    vals = np.full(4096, 7.125)
    blob = encode_values(vals.view(np.uint64))
    assert len(blob) < 4096 // 8 + 32
