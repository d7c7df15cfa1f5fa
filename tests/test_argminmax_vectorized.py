"""Equivalence of the vectorized cores with the per-bin-loop reference
formulation — the analog of the reference's 100-iteration seq/parallel
equivalence tests (minmax.rs:429-444, m4.rs:438-453)."""

import numpy as np
import pytest

from tsdownsample_ray.kernels.m4 import _m4_core, _m4_core_loop
from tsdownsample_ray.kernels.minmax import _minmax_core, _minmax_core_loop


def _cases():
    rng = np.random.default_rng(123)
    cases = []
    for n in (10_000, 10_032, 20_321, 23_489):
        y = rng.standard_normal(n)
        x = np.arange(n)
        cases.append(("plain", x, y))
        # NaN-injected
        yn = y.copy()
        yn[rng.integers(0, n, 500)] = np.nan
        cases.append(("nan", x, yn))
        # gap in x
        xg = x.copy()
        xg[n // 2 :] += n // 2
        cases.append(("gap", xg, y))
        # extreme gaps -> singleton/tiny bins
        xs = np.sort(rng.integers(0, n * 50, n))
        cases.append(("sparse", xs, y))
    return cases


@pytest.mark.parametrize("nb", [50, 100, 126])
@pytest.mark.parametrize("nan_ret", [False, True])
@pytest.mark.parametrize("passthrough", [False, True])
def test_minmax_vectorized_equals_loop(nb, nan_ret, passthrough):
    for name, x, y in _cases():
        a = _minmax_core(x, y, nb, nan_policy_return=nan_ret, passthrough=passthrough)
        b = _minmax_core_loop(x, y, nb, nan_policy_return=nan_ret, passthrough=passthrough)
        assert np.array_equal(np.asarray(a), np.asarray(b)), (name, nb, nan_ret, passthrough)


@pytest.mark.parametrize("nb", [25, 50, 63])
@pytest.mark.parametrize("nan_ret", [False, True])
@pytest.mark.parametrize("passthrough", [False, True])
def test_m4_vectorized_equals_loop(nb, nan_ret, passthrough):
    for name, x, y in _cases():
        a = _m4_core(x, y, nb, nan_policy_return=nan_ret, passthrough=passthrough)
        b = _m4_core_loop(x, y, nb, nan_policy_return=nan_ret, passthrough=passthrough)
        assert np.array_equal(np.asarray(a, dtype=np.int64), np.asarray(b, dtype=np.int64)), (
            name, nb, nan_ret, passthrough)


@pytest.mark.parametrize("n_nans", [100, 500, 2000, 5000])
@pytest.mark.parametrize("nan_ret", [False, True])
def test_nan_count_grid(n_nans, nan_ret):
    """The compliance-suite NaN grid (test_algos_python_compliance.py:49-69):
    n=10000 with k random NaNs, vectorized == loop for both NaN policies."""
    rng = np.random.default_rng(n_nans)
    y = rng.standard_normal(10_000)
    y[rng.integers(0, 10_000, n_nans)] = np.nan
    x = np.arange(10_000)
    for nb in (50, 126):
        a = _minmax_core(x, y, nb, nan_policy_return=nan_ret, passthrough=True)
        b = _minmax_core_loop(x, y, nb, nan_policy_return=nan_ret, passthrough=True)
        assert np.array_equal(np.asarray(a), np.asarray(b))
        am = _m4_core(x, y, nb, nan_policy_return=nan_ret, passthrough=True)
        bm = _m4_core_loop(x, y, nb, nan_policy_return=nan_ret, passthrough=True)
        assert np.array_equal(np.asarray(am, np.int64), np.asarray(bm, np.int64))


def test_all_nan_bins():
    y = np.full(1000, np.nan)
    x = np.arange(1000)
    a = _minmax_core(x, y, 10, nan_policy_return=False, passthrough=True)
    b = _minmax_core_loop(x, y, 10, nan_policy_return=False, passthrough=True)
    assert np.array_equal(np.asarray(a), np.asarray(b))


def test_int_dtypes():
    rng = np.random.default_rng(9)
    y = rng.integers(-100, 100, 5000).astype(np.int32)
    x = np.arange(5000)
    for nan_ret in (False, True):
        a = _minmax_core(x, y, 40, nan_policy_return=nan_ret, passthrough=True)
        b = _minmax_core_loop(x, y, 40, nan_policy_return=nan_ret, passthrough=True)
        assert np.array_equal(np.asarray(a), np.asarray(b))
