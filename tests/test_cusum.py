"""CUSUM changepoint statistic (stages/rate.py:cusum): the vectorized
closed form (cumsum + running min, per-segment offsets) vs the literal
Page recursion, across partitionings."""

import numpy as np
import pyarrow as pa
import pytest

from tsdownsample_ray.stages.rate import cusum

ray = pytest.importorskip("ray")
import ray.data as rd  # noqa: E402


def _brute(rows, target, slack, h):
    """Literal recursion per series, rows pre-sorted by (series, x, tb)."""
    out = {}
    state = {}
    for sid, x, y in rows:
        sp, sn = state.get(sid, (0, 0))
        sp = max(0, sp + (y - target) - slack)
        sn = max(0, sn + (target - y) - slack)
        state[sid] = (sp, sn)
        alarm = 2 if (sp > h and sn > h) else (1 if sp > h
                                               else (-1 if sn > h else 0))
        out[(sid, x)] = (y, sp, sn, alarm)
    return out


@pytest.mark.parametrize("nparts", [1, 4])
def test_cusum_matches_recursion(ray_session, nparts):
    rng = np.random.default_rng(3)
    rows = []
    for s in range(7):
        xs = np.sort(rng.choice(10_000, size=60, replace=False))
        ys = rng.integers(-50, 80, size=60)  # drifting both ways
        rows += [(f"s{s}", int(x), int(y)) for x, y in zip(xs, ys)]
    exp = _brute(sorted(rows), target=5, slack=2, h=40)

    t = pa.table({"series_id": [r[0] for r in rows],
                  "x": [r[1] for r in rows],
                  "y": [r[2] for r in rows]})
    ds = rd.from_arrow(t).repartition(nparts)
    got = cusum(ds, target=5, slack=2, h=40,
                num_partitions=2).to_pandas()
    assert len(got) == len(rows)
    for _, r in got.iterrows():
        y, sp, sn, alarm = exp[(r["series_id"], r["x"])]
        assert (r["y"], r["s_pos"], r["s_neg"], r["alarm"]) == \
            (y, sp, sn, alarm), (r["series_id"], r["x"])


def test_cusum_alarm_fires(ray_session):
    # constant in-control run then a level shift: the statistic must
    # accumulate after the shift and stay 0 before it
    xs = list(range(40))
    ys = [10] * 20 + [30] * 20
    t = pa.table({"series_id": ["a"] * 40, "x": xs, "y": ys})
    got = cusum(rd.from_arrow(t), target=10, slack=3, h=50,
                num_partitions=1).to_pandas().sort_values("x")
    assert (got["s_pos"][:20] == 0).all()
    assert got["s_pos"].iloc[-1] == 17 * 20  # (30-10-3) per post-shift row
    assert (got["alarm"].iloc[-1]) == 1


def test_amoc_changepoint_finds_planted_shift(ray_session):
    """AMOC detects a planted mean shift exactly and matches a direct
    numpy replay (incl. smallest-k ties), partition-invariant."""
    import numpy as np
    import pyarrow as pa
    import ray

    from tsdownsample_ray.stages.rate import amoc_changepoint

    rng = np.random.default_rng(5)
    tables, expect = [], {}
    for sid, (n, shift_at, delta) in (("a", (60, 20, 400)),
                                      ("b", (30, 15, -250)),
                                      ("c", (2, 1, 100))):
        y = rng.integers(90, 110, n).astype(np.int64)
        y[shift_at:] += delta
        tables.append(pa.table({
            "series_id": pa.array([sid] * n),
            "bucket": pa.array(np.arange(n, dtype=np.int64) * 900),
            "sum_y": pa.array(y)}))
        cs = np.cumsum(y)
        k = np.arange(1, n)
        s1 = cs[:-1]
        s2 = cs[-1] - s1
        f = (s1.astype(float) ** 2) / k + (s2.astype(float) ** 2) / (n - k)
        b = int(np.argmax(f))
        expect[sid] = (n, int(k[b]), int(s1[b]), int(s2[b]), float(f[b]))

    tbl = pa.concat_tables(tables)
    for nparts in (1, 3):
        ds = ray.data.from_arrow(tbl).repartition(nparts)
        out = amoc_changepoint(ds, num_partitions=2).to_pandas()
        assert len(out) == len(expect)
        for _, r in out.iterrows():
            assert expect[r["series_id"]] == (r["n"], r["k"], r["s1"],
                                              r["s2"], r["f"])
    # the planted split is recovered for the long series
    assert expect["a"][1] == 20 and expect["b"][1] == 15
