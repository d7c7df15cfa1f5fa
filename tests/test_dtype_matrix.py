"""Full dtype-matrix invariance over the class API — mirrors
test_tsdownsample.py:175-241 (same indices for every supported y dtype, and
for every x dtype x y dtype combination) plus the EveryNth non-contiguity
allowance and the NaN-near-end postcondition (:110-118, :326-335)."""

import numpy as np
import pytest

from tsdownsample_ray.api import (
    EveryNthDownsampler,
    LTTBDownsampler,
    M4Downsampler,
    MinMaxDownsampler,
    MinMaxLTTBDownsampler,
    NaNM4Downsampler,
    NaNMinMaxDownsampler,
    NaNMinMaxLTTBDownsampler,
)

# mirrors tests/test_config.py:5-25 dtype lists
DTYPES_Y = [np.float16, np.float32, np.float64, np.int8, np.int16, np.int32,
            np.int64, np.uint8, np.uint16, np.uint32, np.uint64, np.bool_]
DTYPES_X = [np.float32, np.float64, np.int16, np.int32, np.int64,
            np.uint16, np.uint32, np.uint64,
            "datetime64[us]", "timedelta64[us]"]

SAMPLERS = [MinMaxDownsampler(), NaNMinMaxDownsampler(), M4Downsampler(),
            NaNM4Downsampler(), LTTBDownsampler(), MinMaxLTTBDownsampler(),
            NaNMinMaxLTTBDownsampler()]


@pytest.mark.parametrize("sampler", SAMPLERS, ids=lambda s: type(s).__name__)
def test_dtype_matrix_no_x(sampler):
    arr_orig = np.random.default_rng(0).integers(0, 100, size=100)
    res = []
    for dtype in DTYPES_Y:
        arr = arr_orig.astype(dtype)
        idx = sampler.downsample(arr, n_out=76)
        assert idx.max() < 100 and idx.min() >= 0  # no out-of-bounds
        if dtype is not np.bool_:
            res.append(idx)
    for r in res[1:]:
        assert np.array_equal(res[0], r)


@pytest.mark.parametrize("sampler", SAMPLERS, ids=lambda s: type(s).__name__)
def test_dtype_matrix_with_x(sampler):
    arr_orig = np.random.default_rng(1).integers(0, 100, size=100)
    idx_orig = np.arange(len(arr_orig))
    for dtype_x in DTYPES_X:
        x = idx_orig.astype(dtype_x)
        res = []
        for dtype_y in DTYPES_Y:
            arr = arr_orig.astype(dtype_y)
            sel = sampler.downsample(x, arr, n_out=76)
            assert sel.max() < 100 and sel.min() >= 0
            if dtype_y is not np.bool_:
                res.append(sel)
        for r in res[1:]:
            assert np.array_equal(res[0], r)


def test_everynth_allows_non_contiguous():
    arr = np.random.default_rng(2).integers(0, 100, size=10_000)[::2]
    assert not arr.flags["C_CONTIGUOUS"]
    s = EveryNthDownsampler().downsample(arr, n_out=100)
    assert s[0] == 0 and s[-1] == 4950


def test_nan_downsampler_selects_edge_nans():
    """y[0]=NaN, y[9960]=NaN -> the NaN-returning samplers select index 0
    first and 9960 second-to-last (test_tsdownsample.py:110-118)."""
    rng = np.random.default_rng(3)
    y = rng.standard_normal(10_000)
    y[0] = np.nan
    y[9960] = np.nan
    for d in (NaNMinMaxDownsampler(), NaNM4Downsampler(),
              NaNMinMaxLTTBDownsampler()):
        s = d.downsample(y, n_out=100)
        assert s[0] == 0
        assert 9960 in s.astype(np.int64)
