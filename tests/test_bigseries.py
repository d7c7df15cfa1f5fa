"""Distributed single-series MinMaxLTTB == the single-node kernel,
regardless of block structure (the within-series analog of the reference's
parallel==sequential equivalence, minmaxlttb.rs:280-291)."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _series(n, seed=3, nan_every=None):
    rng = np.random.default_rng(seed)
    x = np.cumsum(rng.integers(1, 5, n)).astype(np.int64)  # strict, gappy
    y = np.round(rng.standard_normal(n) * 100).astype(np.float64)
    if nan_every:
        y[::nan_every] = np.nan
    return x, y


def _run(x, y, n_out, nparts, shuffle_seed, nan=False):
    import ray.data as rd

    from tsdownsample_ray.stages.bigseries import downsample_big_series

    df = pd.DataFrame({"x": x, "y": y}).sample(frac=1.0,
                                               random_state=shuffle_seed)
    ds = rd.from_pandas(df).repartition(nparts)
    out = downsample_big_series(ds, n_out, x_col="x", y_col="y",
                                nan_policy_return=nan)
    return out.to_pandas()


def test_big_series_equals_kernel(ray_session):
    from tsdownsample_ray.kernels.minmaxlttb import minmaxlttb

    x, y = _series(50_000)
    idx = minmaxlttb(x, y, 100).astype(np.intp)
    want = pd.DataFrame({"x": x[idx], "y": y[idx]})
    for nparts, seed in ((1, 0), (7, 1), (32, 2)):
        got = _run(x, y, 100, nparts, seed)
        pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                      want.reset_index(drop=True),
                                      check_dtype=False)


def test_big_series_nan_policy(ray_session):
    from tsdownsample_ray.kernels.minmaxlttb import nanminmaxlttb

    x, y = _series(30_000, seed=8, nan_every=97)
    idx = nanminmaxlttb(x, y, 60).astype(np.intp)
    want = pd.DataFrame({"x": x[idx], "y": y[idx]})
    got = _run(x, y, 60, 16, 5, nan=True)
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True),
                                  check_dtype=False)


def test_big_series_rejects_small_input(ray_session):
    import pytest
    import ray.data as rd

    from tsdownsample_ray.stages.bigseries import downsample_big_series

    x, y = _series(200)
    ds = rd.from_pandas(pd.DataFrame({"x": x, "y": y}))
    with pytest.raises(ValueError):
        downsample_big_series(ds, 100)


def _run_kernel(x, y, n_out, nparts, shuffle_seed, kernel):
    import ray.data as rd

    from tsdownsample_ray.stages.bigseries import downsample_big_series

    df = pd.DataFrame({"x": x, "y": y}).sample(frac=1.0,
                                               random_state=shuffle_seed)
    ds = rd.from_pandas(df).repartition(nparts)
    return downsample_big_series(ds, n_out, kernel=kernel,
                                 x_col="x", y_col="y").to_pandas()


def test_big_series_minmax_m4_equal_kernels(ray_session):
    """Distributed full-range MinMax/M4 == the single-node with-x kernels
    on any partitioning (minmax.rs:139-179 / m4.rs:145-187 analog)."""
    from tsdownsample_ray.kernels.m4 import m4, nanm4
    from tsdownsample_ray.kernels.minmax import minmax, nanminmax

    x, y = _series(40_000, seed=5)
    for kname, kfn, n_out in (("minmax", minmax, 100),
                              ("nanminmax", nanminmax, 100),
                              ("m4", m4, 96), ("nanm4", nanm4, 96)):
        idx = kfn(x, y, n_out).astype(np.intp)
        want = pd.DataFrame({"x": x[idx], "y": y[idx]})
        for nparts, seed in ((1, 0), (13, 7)):
            got = _run_kernel(x, y, n_out, nparts, seed, kname)
            pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                          want.reset_index(drop=True),
                                          check_dtype=False)


def test_big_series_minmax_m4_nan_y(ray_session):
    """NaN-y input: both NaN policies match the single-node kernels across
    partitionings (nan-ignoring extreme selection incl. all-NaN-bin first-
    point fallback; NaN-returning first-NaN emission)."""
    from tsdownsample_ray.kernels.m4 import m4, nanm4
    from tsdownsample_ray.kernels.minmax import minmax, nanminmax
    from tsdownsample_ray.kernels.minmaxlttb import minmaxlttb

    x, y = _series(30_000, seed=13, nan_every=61)
    for kname, kfn, n_out in (("minmax", minmax, 80),
                              ("nanminmax", nanminmax, 80),
                              ("m4", m4, 80), ("nanm4", nanm4, 80)):
        idx = kfn(x, y, n_out).astype(np.intp)
        want = pd.DataFrame({"x": x[idx], "y": y[idx]})
        got = _run_kernel(x, y, n_out, 11, 3, kname)
        pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                      want.reset_index(drop=True),
                                      check_dtype=False)
    # plain (nan-ignoring) MinMaxLTTB path with NaN y, too
    idx = minmaxlttb(x, y, 60).astype(np.intp)
    want = pd.DataFrame({"x": x[idx], "y": y[idx]})
    got = _run(x, y, 60, 9, 2, nan=False)
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True),
                                  check_dtype=False)


def test_big_series_duplicate_x_raises(ray_session):
    """Strict-x violations error instead of silently mis-merging."""
    import pytest
    import ray.data as rd

    from tsdownsample_ray.stages.bigseries import downsample_big_series

    x, y = _series(5_000, seed=2)
    x[100] = x[101]  # duplicate interior x
    ds = rd.from_pandas(pd.DataFrame({"x": x, "y": y})).repartition(4)
    with pytest.raises(Exception, match="duplicate x"):
        downsample_big_series(ds, 40)


def test_big_series_gappy_singleton_bins(ray_session):
    """Large x-gaps -> empty bins + <=2-point passthrough bins; many tiny
    blocks -> per-block singleton partials (the nullable-column path)."""
    from tsdownsample_ray.kernels.minmaxlttb import minmaxlttb
    from tsdownsample_ray.stages.bigseries import downsample_big_series

    import ray.data as rd

    rng = np.random.default_rng(11)
    # clustered x: dense runs separated by huge gaps
    gaps = np.where(rng.random(8000) < 0.01, 500_000, 2)
    x = np.cumsum(gaps).astype(np.int64)
    y = np.round(rng.standard_normal(8000) * 50).astype(np.float64)
    idx = minmaxlttb(x, y, 64).astype(np.intp)
    want = pd.DataFrame({"x": x[idx], "y": y[idx]})

    df = pd.DataFrame({"x": x, "y": y}).sample(frac=1.0, random_state=1)
    ds = rd.from_pandas(df).repartition(40)
    got = downsample_big_series(ds, 64).to_pandas()
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True),
                                  check_dtype=False)


def test_big_series_cross_block_interior_duplicate_x_raises(ray_session):
    """Round-5 regression: a duplicate x living in two DIFFERENT blocks,
    away from the global edges, used to slip past both the per-block
    strict-x guard and the edge check; the merge tie-break then depended
    on shuffle arrival order. Detection now covers every candidate source
    in the per-bin merge."""
    import pytest
    import ray.data as rd

    from tsdownsample_ray.stages.bigseries import downsample_big_series

    rng = np.random.default_rng(3)
    # interleaved blocks, each internally strict; narrow bins (~4 points
    # per block per bin) so every point is a merge candidate — a dup that
    # never becomes a candidate provably cannot reach the output
    xa = np.arange(0, 5_000, 2, dtype=np.int64)
    xb = np.arange(1, 5_000, 2, dtype=np.int64)
    xb[1_000] = xa[1_000]  # cross-block dup away from global min/max
    xb = np.unique(xb)
    ya = rng.standard_normal(len(xa))
    yb = rng.standard_normal(len(xb))
    dsa = rd.from_pandas(pd.DataFrame({"x": xa, "y": ya}))
    dsb = rd.from_pandas(pd.DataFrame({"x": xb, "y": yb}))
    ds = dsa.union(dsb)
    with pytest.raises(Exception, match="duplicate x"):
        downsample_big_series(ds, 1_200, kernel="minmax").to_pandas()
