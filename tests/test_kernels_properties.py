"""Property tests mirroring the reference API test suite
(`/root/reference/tests/test_tsdownsample.py`): first/last invariants, gap
shrinkage, NaN-policy postconditions, dtype invariance, no-overflow means,
serialization, and error paths.
"""

import pickle

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
from tsdownsample_ray.kernels import lttb, m4, minmax, minmaxlttb, nanm4, nanminmax

ALL_CLASSES = [
    MinMaxDownsampler,
    NaNMinMaxDownsampler,
    M4Downsampler,
    NaNM4Downsampler,
    LTTBDownsampler,
    MinMaxLTTBDownsampler,
    NaNMinMaxLTTBDownsampler,
    EveryNthDownsampler,
]


def _n_out_for(cls):
    return 100  # valid for every parity constraint


# --- first & last point invariants (test_tsdownsample.py:100-117) -----------
@pytest.mark.parametrize(
    "fn,n_out", [(lttb, 100), (minmaxlttb, 100), (m4, 100), (nanm4, 100)]
)
def test_first_last_kept(fn, n_out):
    rng = np.random.default_rng(0)
    y = rng.standard_normal(10_000)
    idx = fn(None, y, n_out)
    assert idx[0] == 0
    assert idx[-1] == len(y) - 1


# --- gap handling shrinks output (test_tsdownsample.py:158-171) -------------
def test_gap_shrinks_output():
    rng = np.random.default_rng(1)
    n = 10_000
    y = rng.standard_normal(n)
    x = np.arange(n, dtype=np.int64)
    x[: n // 2] += 0  # first half unchanged
    x[n // 2 :] += 5_000  # one large gap in the middle
    for fn in (minmax, nanminmax):
        idx = fn(x, y, 100)
        assert 66 <= len(idx) <= 100, len(idx)


# --- NaN-policy postconditions (test_tsdownsample.py:337-362) ---------------
def test_nan_returning_selects_nans():
    rng = np.random.default_rng(2)
    n = 50_000
    y = rng.standard_normal(n)
    y[::5] = np.nan  # 1 in 5 NaN -> every bin of >=5 points holds a NaN
    for fn in (nanminmax,):
        idx = fn(None, y, 100)
        assert np.all(np.isnan(y[idx.astype(np.intp)]))
    idx = nanm4(None, y, 100)
    interior = idx[(idx != 0) & (idx != n - 1)]
    # argmin/argmax of a NaN-containing slice both return NaN positions
    sel = y[interior.astype(np.intp)]
    assert np.isnan(sel).sum() >= len(interior) // 2


def test_nan_ignoring_selects_no_nans():
    rng = np.random.default_rng(3)
    n = 50_000
    y = rng.standard_normal(n)
    y[::5] = np.nan
    for fn in (minmax,):
        idx = fn(None, y, 100)
        assert not np.isnan(y[idx.astype(np.intp)]).any()


# --- dtype invariance (test_tsdownsample.py:174-241) ------------------------
Y_DTYPES = ["float16", "float32", "float64", "int8", "int16", "int32", "int64",
            "uint8", "uint16", "uint32", "uint64"]
X_DTYPES = ["float32", "float64", "int16", "int32", "int64",
            "uint16", "uint32", "uint64", "datetime64[us]", "timedelta64[us]"]


@pytest.mark.parametrize("dtype", Y_DTYPES)
def test_y_dtype_invariance(dtype):
    base = np.arange(0, 100, dtype=np.int64) % 128  # fits every dtype
    y = base.astype(dtype)
    ref = minmax(None, base.astype(np.float64), 20)
    assert np.array_equal(minmax(None, y, 20), ref)


@pytest.mark.parametrize("dtype", X_DTYPES)
def test_x_dtype_invariance(dtype):
    y = (np.arange(1000) % 97).astype(np.float64)
    x = np.arange(1000).astype(dtype)
    ref = minmax(np.arange(1000), y, 20)
    assert np.array_equal(minmax(x, y, 20), ref)


def test_bool_y_viewed_as_int8():
    y = (np.arange(1000) % 2).astype(bool)
    idx = minmax(None, y, 20)
    assert len(idx) == 20


# --- mean accumulates in f64, no f32 overflow (test_tsdownsample.py:244-264)
def test_no_overflow_mean_lttb():
    y = np.full(10_000, 2e5, dtype=np.float32)
    idx = lttb(None, y, 100)
    assert len(idx) == 100
    assert not np.isnan(y[idx.astype(np.intp)]).any()


# --- serialization (test_tsdownsample.py:70-97) -----------------------------
@pytest.mark.parametrize("cls", ALL_CLASSES)
def test_copy_deepcopy(cls):
    """copy/deepcopy parity (test_tsdownsample.py:70-87)."""
    import copy

    import warnings

    d1 = cls()
    d2 = copy.copy(d1)
    d3 = copy.deepcopy(d1)
    y = np.random.default_rng(11).standard_normal(2_000)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        a = d1.downsample(y, n_out=100)
        assert np.array_equal(a, d2.downsample(y, n_out=100))
        assert np.array_equal(a, d3.downsample(y, n_out=100))


@pytest.mark.parametrize("cls", ALL_CLASSES)
def test_pickle_roundtrip(cls):
    rng = np.random.default_rng(4)
    y = rng.standard_normal(5_000)
    d1 = cls()
    d2 = pickle.loads(pickle.dumps(d1))
    with np.errstate(all="ignore"):
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            a = d1.downsample(y, n_out=_n_out_for(cls))
            b = d2.downsample(y, n_out=_n_out_for(cls))
    assert np.array_equal(a, b)


# --- error paths (test_tsdownsample.py:267-334) -----------------------------
def test_errors():
    y = np.random.default_rng(5).standard_normal(1000)
    with pytest.raises(ValueError):
        MinMaxDownsampler().downsample(y, n_out=99)  # odd
    with pytest.raises(ValueError):
        M4Downsampler().downsample(y, n_out=98)  # not multiple of 4
    with pytest.raises(ValueError):
        MinMaxDownsampler().downsample(y, n_out=-2)
    with pytest.raises(ValueError):
        MinMaxDownsampler().downsample(y.reshape(2, -1).ravel()[::2][:400].reshape(20, 20), n_out=10)
    with pytest.raises(ValueError):
        MinMaxDownsampler().downsample(y[::2], n_out=10)  # non-contiguous
    with pytest.raises(ValueError):
        MinMaxDownsampler().downsample(y.astype("complex128"), n_out=10)
    with pytest.raises(ValueError):
        MinMaxDownsampler().downsample(np.arange(10), y[:5], n_out=4)  # len mismatch
    with pytest.raises(ValueError):
        LTTBDownsampler().downsample([1, 2, 3], n_out=2)  # not an ndarray


def test_everynth_warns_on_x():
    y = np.arange(100)
    with pytest.warns(UserWarning):
        EveryNthDownsampler().downsample(np.arange(100), y, n_out=10)


def test_lttb_parallel_warns():
    y = np.random.default_rng(6).standard_normal(1000)
    with pytest.warns(UserWarning):
        LTTBDownsampler().downsample(y, n_out=100, parallel=True)
