"""Property-based kernel tests (hypothesis): structural invariants and
vectorized==loop equivalence over adversarial inputs — the randomized
analog of the reference's rstest sweeps."""

import numpy as np
from hypothesis import given, settings, strategies as st

from tsdownsample_ray.kernels import lttb, m4, minmax, minmaxlttb, nanminmax
from tsdownsample_ray.kernels.m4 import _m4_core, _m4_core_loop
from tsdownsample_ray.kernels.minmax import _minmax_core, _minmax_core_loop


@st.composite
def series(draw, min_n=8, max_n=2000):
    n = draw(st.integers(min_n, max_n))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    kind = draw(st.sampled_from(["randn", "const", "ramp", "nan", "int"]))
    if kind == "randn":
        y = rng.standard_normal(n)
    elif kind == "const":
        y = np.full(n, draw(st.floats(-1e6, 1e6, allow_nan=False)))
    elif kind == "ramp":
        y = np.arange(n, dtype=np.float64)
    elif kind == "nan":
        y = rng.standard_normal(n)
        k = draw(st.integers(0, max(1, n // 3)))
        if k:
            y[rng.integers(0, n, k)] = np.nan
    else:
        y = rng.integers(-1000, 1000, n).astype(np.int64)
    return y


@settings(max_examples=40, deadline=None)
@given(y=series(), nb=st.integers(2, 64), nan_ret=st.booleans(),
       passthrough=st.booleans(), gapped=st.booleans())
def test_minmax_core_equivalence(y, nb, nan_ret, passthrough, gapped):
    n = len(y)
    x = np.arange(n)
    if gapped:
        x = x.copy()
        x[n // 2 :] += n
    a = _minmax_core(x, y, nb, nan_policy_return=nan_ret, passthrough=passthrough)
    b = _minmax_core_loop(x, y, nb, nan_policy_return=nan_ret, passthrough=passthrough)
    assert np.array_equal(np.asarray(a, np.int64), np.asarray(b, np.int64))


@settings(max_examples=40, deadline=None)
@given(y=series(), nb=st.integers(1, 32), nan_ret=st.booleans(),
       passthrough=st.booleans(), gapped=st.booleans())
def test_m4_core_equivalence(y, nb, nan_ret, passthrough, gapped):
    n = len(y)
    x = np.arange(n)
    if gapped:
        x = x.copy()
        x[n // 2 :] += 3 * n
    a = _m4_core(x, y, nb, nan_policy_return=nan_ret, passthrough=passthrough)
    b = _m4_core_loop(x, y, nb, nan_policy_return=nan_ret, passthrough=passthrough)
    assert np.array_equal(np.asarray(a, np.int64), np.asarray(b, np.int64))


@settings(max_examples=30, deadline=None)
@given(y=series(min_n=20), n_out_half=st.integers(2, 40))
def test_public_invariants(y, n_out_half):
    n_out = n_out_half * 2
    n = len(y)
    for fn in (minmax, nanminmax):
        idx = fn(None, y, n_out).astype(np.int64)
        assert len(idx) <= max(n_out, n)
        assert idx.min() >= 0 and idx.max() < n
        assert (np.diff(idx) >= 0).all()
    if n_out >= 4 and n_out % 4 == 0:
        idx = m4(None, y, n_out).astype(np.int64)
        assert idx.min() >= 0 and idx.max() < n
    if n_out >= 3 and not np.isnan(y).all():
        with np.errstate(all="ignore"):
            idx = lttb(None, y, n_out).astype(np.int64)
        if n_out < n:
            assert idx[0] == 0 and idx[-1] == n - 1
        idx2 = minmaxlttb(None, y, n_out).astype(np.int64)
        if n_out < n:
            assert idx2[0] == 0 and idx2[-1] == n - 1
