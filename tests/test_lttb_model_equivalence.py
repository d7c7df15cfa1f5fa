"""Model-equivalence pin for the vectorized LTTB kernel.

The shipped kernel (kernels/lttb.py) replaces per-bucket slice sums with
one ``np.add.reduceat`` pass and the per-bucket area temporaries with
preallocated scratch buffers. This suite re-implements LTTB naively —
fresh slices, fresh temporaries, the exact LTTB_py elementwise order
(``/root/reference/tsdownsample/_python/downsamplers.py:31-116``) — and
asserts the selected indices are identical across dtypes, explicit /
implicit x, and both bucket-x conventions. Any future "optimization"
that changes a rounding path fails here before it can reach the oracle
sweep.
"""

import numpy as np
import pytest

from tsdownsample_ray.kernels.lttb import lttb


def _naive_lttb(x, y, n_out, bucket_x="mean"):
    y = np.asarray(y)
    n = y.shape[0]
    if n_out >= n:
        return np.arange(n, dtype=np.uint64)
    xf = (np.arange(n, dtype=np.float64) if x is None
          else np.asarray(x).astype(np.float64))
    offset = np.arange(start=1, stop=n,
                       step=(n - 2) / (n_out - 2)).astype(np.int64)
    sampled = np.empty(n_out, dtype=np.int64)
    sampled[0] = 0
    sampled[-1] = n - 1
    a = 0

    def _area_argmax(px, py, ax, ay, xb, yb):
        area = np.abs(xb * (py - ay) + yb * (ax - px) + (px * ay - ax * py))
        return int(area.argmax())

    for i in range(n_out - 3):
        o0, o1, o2 = int(offset[i]), int(offset[i + 1]), int(offset[i + 2])
        if bucket_x == "mean":
            ax = xf[o1:o2].sum() / (o2 - o1)
        else:
            ax = (xf[o2 - 1] + xf[o1]) / 2.0
        ay = y[o1:o2].astype(np.float64).sum() / (o2 - o1)
        a = _area_argmax(xf[a], float(y[a]), ax, ay,
                         xf[o0:o1], y[o0:o1].astype(np.float64)) + o0
        sampled[i + 1] = a
    o0, o1 = int(offset[-2]), int(offset[-1])
    sampled[-2] = _area_argmax(
        xf[a], float(y[a]), xf[-1], float(y[-1]),
        xf[o0:o1], y[o0:o1].astype(np.float64)) + o0
    return sampled.astype(np.uint64)


CASES = [(n, n_out) for n in (10, 37, 100, 999, 5000)
         for n_out in (3, 4, 7, 50) if n_out < n]


@pytest.mark.parametrize("dtype", [np.float32, np.float64, np.int64])
@pytest.mark.parametrize("n,n_out", CASES)
def test_implicit_x_matches_naive(dtype, n, n_out):
    rng = np.random.default_rng(n * 1000 + n_out)
    y = (rng.standard_normal(n) * 100).astype(dtype)
    np.testing.assert_array_equal(
        lttb(None, y, n_out), _naive_lttb(None, y, n_out))


@pytest.mark.parametrize("bucket_x", ["mean", "midpoint"])
@pytest.mark.parametrize("n,n_out", [(100, 7), (999, 50), (5000, 50)])
def test_explicit_gapped_x_matches_naive(bucket_x, n, n_out):
    rng = np.random.default_rng(n + n_out)
    # gapped, strictly increasing x — where mean and midpoint diverge
    x = np.cumsum(rng.integers(1, 1000, size=n)).astype(np.int64)
    y = rng.standard_normal(n).astype(np.float32)
    got = lttb(x, y, n_out, bucket_x=bucket_x)
    want = _naive_lttb(x, y, n_out, bucket_x=bucket_x)
    np.testing.assert_array_equal(got, want)


def test_midpoint_and_mean_actually_diverge_on_gapped_x():
    # sanity that the two bucket-x conventions are not vacuously equal:
    # over a handful of gapped fixtures at least one selects differently
    diverged = False
    for seed in range(8):
        rng = np.random.default_rng(seed)
        x = np.cumsum(rng.integers(1, 1000, size=999)).astype(np.int64)
        y = rng.standard_normal(999).astype(np.float32)
        if not np.array_equal(lttb(x, y, 50, bucket_x="midpoint"),
                              lttb(x, y, 50, bucket_x="mean")):
            diverged = True
            break
    assert diverged


@pytest.mark.parametrize("bucket_x", ["mean", "midpoint"])
def test_implicit_x_equals_explicit_arange(bucket_x):
    # the implicit-x closed-form/scratch path must match a real arange
    rng = np.random.default_rng(7)
    y = rng.standard_normal(4321).astype(np.float32)
    np.testing.assert_array_equal(
        lttb(None, y, 61, bucket_x=bucket_x),
        lttb(np.arange(4321, dtype=np.int64), y, 61, bucket_x=bucket_x))


def test_identity_short_circuit():
    y = np.arange(5, dtype=np.float64)
    np.testing.assert_array_equal(lttb(None, y, 10), np.arange(5))


@pytest.mark.parametrize("dtype", [np.int64, np.int32, np.float32])
def test_wide_buckets_exactly_summable_dtypes(dtype):
    # buckets wider than numpy's ~128-element pairwise-sum block: reduceat
    # (sequential) and slice.sum() (pairwise) only agree bit-for-bit when
    # every partial sum is exact in f64 — integers and small-magnitude f32
    # are; continuous f64 may differ by ~1 ulp (documented in the kernel).
    # width here is ~5000 elements per bucket.
    rng = np.random.default_rng(11)
    y = rng.integers(-1000, 1000, size=500_000).astype(dtype)
    np.testing.assert_array_equal(
        lttb(None, y, 100), _naive_lttb(None, y, 100))
