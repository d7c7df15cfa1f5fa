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
