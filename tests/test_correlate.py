"""pairwise_correlation vs np.corrcoef on the co-populated buckets."""

import numpy as np
import pyarrow as pa
import pytest

ray = pytest.importorskip("ray")
import ray.data as rd  # noqa: E402

from tsdownsample_ray.stages.correlate import pairwise_correlation  # noqa: E402


def _rolled_table(series: dict[str, dict[int, int]]) -> pa.Table:
    rows = [(s, b, v) for s, bv in series.items() for b, v in bv.items()]
    return pa.table({
        "series_id": [r[0] for r in rows],
        "bucket": pa.array([r[1] for r in rows], pa.int64()),
        "sum_y": pa.array([r[2] for r in rows], pa.int64()),
    })


def test_matches_np_corrcoef(ray_session):
    rng = np.random.default_rng(2)
    buckets = list(range(40))
    series = {}
    base = rng.integers(-50, 50, size=len(buckets))
    series["a"] = {b: int(v) for b, v in zip(buckets, base)}
    series["b"] = {b: int(2 * v + 3) for b, v in zip(buckets, base)}  # r=1
    series["c"] = {b: int(rng.integers(-9, 9)) for b in buckets[5:30]}
    out = pairwise_correlation(rd.from_arrow(_rolled_table(series))
                               .repartition(3), num_partitions=3).take_all()
    got = {(r["s1"], r["s2"]): r for r in out}
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}
    assert got[("a", "b")]["n"] == 40
    assert got[("a", "b")]["corr"] == pytest.approx(1.0)
    assert got[("a", "c")]["n"] == 25
    x = np.array([series["a"][b] for b in buckets[5:30]], float)
    y = np.array([series["c"][b] for b in buckets[5:30]], float)
    assert got[("a", "c")]["corr"] == pytest.approx(
        np.corrcoef(x, y)[0, 1], abs=1e-12)


def test_zero_variance_is_null(ray_session):
    series = {"flat": {b: 7 for b in range(10)},
              "var": {b: b for b in range(10)}}
    out = pairwise_correlation(
        rd.from_arrow(_rolled_table(series))).take_all()
    (r,) = out
    assert (r["s1"], r["s2"]) == ("flat", "var")
    assert r["corr"] is None


def test_partition_invariance(ray_session):
    rng = np.random.default_rng(9)
    series = {f"s{i}": {b: int(rng.integers(-99, 99))
                        for b in rng.choice(60, size=35, replace=False)}
              for i in range(5)}
    tbl = _rolled_table(series)
    a = sorted((r["s1"], r["s2"], r["n"], r["sum_xy"], r["corr"])
               for r in pairwise_correlation(
                   rd.from_arrow(tbl).repartition(1),
                   num_partitions=1).take_all())
    b = sorted((r["s1"], r["s2"], r["n"], r["sum_xy"], r["corr"])
               for r in pairwise_correlation(
                   rd.from_arrow(tbl).repartition(8),
                   num_partitions=6).take_all())
    assert a == b


def test_lagged_correlation_matches_numpy(ray_session):
    """Ordered pairs at lag=1 vs a numpy replay; values chosen so the
    lagged alignment differs from the aligned one."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from tsdownsample_ray.stages.correlate import lagged_correlation

    rng = np.random.default_rng(11)
    rows = []
    series = {}
    for s in ("a", "b", "c"):
        buckets = np.sort(rng.choice(20, size=12, replace=False))
        vals = rng.integers(-100, 100, size=12)
        series[s] = dict(zip(buckets.tolist(), vals.tolist()))
        rows += [(s, int(b), int(v)) for b, v in zip(buckets, vals)]

    t = pa.table({"series_id": [r[0] for r in rows],
                  "bucket": [r[1] for r in rows],
                  "sum_y": [r[2] for r in rows]})
    out = lagged_correlation(rd.from_arrow(t).repartition(3), lag=1,
                             num_partitions=2).to_pandas()
    for s1 in series:
        for s2 in series:
            if s1 == s2:
                continue
            xs, ys = [], []
            for b, v in series[s1].items():
                if b + 1 in series[s2]:
                    xs.append(v)
                    ys.append(series[s2][b + 1])
            row = out[(out.s1 == s1) & (out.s2 == s2)]
            if not xs:
                assert row.empty
                continue
            assert row.n.iloc[0] == len(xs)
            assert row.sum_xy.iloc[0] == int(
                np.dot(np.array(xs, np.int64), np.array(ys, np.int64)))
            if len(xs) > 1 and np.std(xs) > 0 and np.std(ys) > 0:
                exp = np.corrcoef(xs, ys)[0, 1]
                assert abs(row["corr"].iloc[0] - exp) < 1e-9


def test_autocorrelation_vs_numpy_with_gaps(ray_session):
    """autocorrelation == a per-series numpy replay over aligned
    (t, t+lag) bucket pairs, gaps excluded, any input partitioning."""
    import pandas as pd
    import ray.data as rd

    from tsdownsample_ray.stages.correlate import autocorrelation

    rng = np.random.default_rng(13)
    rows = []
    for s in ("a", "b", "c"):
        # irregular bucket grid with gaps
        buckets = np.sort(rng.choice(np.arange(60), size=35,
                                     replace=False)) * 10
        vals = rng.integers(-20, 20, size=len(buckets))
        rows += [(s, int(b), int(v)) for b, v in zip(buckets, vals)]
    df = pd.DataFrame(rows, columns=["series_id", "bucket", "sum_y"])

    out = autocorrelation(rd.from_pandas(df).repartition(5),
                          lags=(1, 2), window_us=10,
                          num_partitions=3).to_pandas()

    for (s, lag), grp in out.set_index(["series_id", "lag"]).iterrows():
        g = df[df.series_id == s]
        by = dict(zip(g.bucket, g.sum_y))
        pairs = [(v, by[b + 10 * lag]) for b, v in by.items()
                 if b + 10 * lag in by]
        assert grp["n"] == len(pairs)
        x = np.array([p[0] for p in pairs], dtype=np.float64)
        y = np.array([p[1] for p in pairs], dtype=np.float64)
        assert grp["sum_xy"] == int((x * y).sum())
        if len(pairs) > 2 and x.std() > 0 and y.std() > 0:
            want = np.corrcoef(x, y)[0, 1]
            assert abs(grp["corr"] - want) < 1e-12
    # every (series, lag) with >=1 aligned pair is present
    for s in ("a", "b", "c"):
        for lag in (1, 2):
            g = df[df.series_id == s]
            by = set(g.bucket)
            n_pairs = sum(1 for b in by if b + 10 * lag in by)
            present = ((out.series_id == s) & (out.lag == lag)).any()
            assert present == (n_pairs > 0)


def test_autocorrelation_validation(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.correlate import autocorrelation

    t = pa.table({"series_id": ["a"], "bucket": [0], "sum_y": [1]})
    with pytest.raises(ValueError):
        autocorrelation(rd.from_arrow(t), lags=(), window_us=10)
    with pytest.raises(ValueError):
        autocorrelation(rd.from_arrow(t), lags=(0,), window_us=10)


def test_spearman_via_rank2avg_matches_scipyless_replay(ray_session):
    """rank2avg + pairwise_correlation == textbook Spearman (Pearson of
    tie-averaged ranks) on fully-aligned series, including ties."""
    import pandas as pd
    import ray.data as rd

    from tsdownsample_ray.stages.correlate import pairwise_correlation
    from tsdownsample_ray.stages.quantiles import rank2avg

    rng = np.random.default_rng(23)
    buckets = np.arange(40, dtype=np.int64)
    va = rng.integers(0, 8, size=40).astype(np.int64)   # ties guaranteed
    vb = (va * 3 + rng.integers(0, 5, size=40)).astype(np.int64)
    df = pd.DataFrame({
        "series_id": ["a"] * 40 + ["b"] * 40,
        "bucket": np.concatenate([buckets, buckets]),
        "sum_y": np.concatenate([va, vb]),
    })
    ranks = rank2avg(rd.from_pandas(df).repartition(4), num_partitions=2)
    out = pairwise_correlation(ranks, num_partitions=2).to_pandas()
    assert len(out) == 1

    # textbook replay: average ranks (ties averaged), then Pearson
    ra = pd.Series(va).rank(method="average").to_numpy()
    rb = pd.Series(vb).rank(method="average").to_numpy()
    want = np.corrcoef(ra, rb)[0, 1]
    assert abs(out["corr"].iloc[0] - want) < 1e-12


def test_rank2avg_values(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.quantiles import rank2avg

    t = pa.table({"series_id": ["s"] * 5, "bucket": [1, 2, 3, 4, 5],
                  "sum_y": np.array([7, 3, 7, 1, 3], dtype=np.int64)})
    out = rank2avg(rd.from_arrow(t), num_partitions=1).to_pandas()
    out = out.sort_values("bucket")
    # values 1,3,3,7,7 -> avg ranks 1, 2.5, 2.5, 4.5, 4.5 -> doubled
    assert list(out["sum_y"]) == [9, 5, 9, 2, 5]
