"""resample_linear: grid bounds, exact hits, duplicate-x collapse,
partition invariance — vs np.interp on the collapsed series."""

import numpy as np
import pyarrow as pa
import pytest

ray = pytest.importorskip("ray")
import ray.data as rd  # noqa: E402

from tsdownsample_ray.stages.resample import resample_linear  # noqa: E402

STEP = 10


def _brute(x, y, step=STEP):
    lo = -(-x.min() // step) * step
    hi = x.max() // step * step
    if hi < lo:
        return np.empty(0, np.int64), np.empty(0)
    t = np.arange(lo, hi + 1, step)
    return t, np.interp(t, x, y)


def _run(tbl, **kw):
    out = resample_linear(rd.from_arrow(tbl), STEP, series_col="sid",
                          x_col="x", y_col="y", id_col="rid", **kw)
    rows = sorted((r["sid"], r["t_us"], r["value"])
                  for r in out.take_all())
    return rows


def test_matches_np_interp(ray_session):
    rng = np.random.default_rng(11)
    tables, expect = [], []
    for sid in ["a", "b", "c"]:
        x = np.unique(rng.integers(0, 500, size=60)).astype(np.int64)
        y = rng.integers(-100, 100, size=len(x)).astype(np.float64)
        tables.append(pa.table({
            "sid": [sid] * len(x), "x": x, "y": y,
            "rid": np.arange(len(x), dtype=np.int64)}))
        t, v = _brute(x, y)
        expect += [(sid, int(tt), float(vv)) for tt, vv in zip(t, v)]
    got = _run(pa.concat_tables(tables))
    assert len(got) == len(expect)
    for (gs, gt, gv), (es, et, ev) in zip(got, sorted(expect)):
        assert (gs, gt) == (es, et)
        assert gv == pytest.approx(ev, abs=1e-9)


def test_exact_hits_and_single_point(ray_session):
    tbl = pa.table({"sid": ["s", "s", "s", "one", "off"],
                    "x": pa.array([10, 20, 35, 30, 7], pa.int64()),
                    "y": pa.array([1.0, 5.0, 8.0, 42.0, 9.0]),
                    "rid": pa.array([0, 1, 2, 3, 4], pa.int64())})
    got = _run(tbl)
    # 'off' has one sample off-grid -> no rows; 'one' exact single hit
    assert ("one", 30, 42.0) in got
    assert not any(s == "off" for s, _, _ in got)
    d = {(s, t): v for s, t, v in got}
    assert d[("s", 10)] == 1.0 and d[("s", 20)] == 5.0
    assert d[("s", 30)] == pytest.approx(5.0 + 3.0 * 10 / 15)


def test_duplicate_x_keeps_max_id(ray_session):
    tbl = pa.table({"sid": ["s"] * 4,
                    "x": pa.array([0, 10, 10, 20], pa.int64()),
                    "y": pa.array([0.0, 99.0, 4.0, 8.0]),
                    "rid": pa.array([0, 1, 2, 3], pa.int64())})
    d = {t: v for _, t, v in _run(tbl)}
    assert d[10] == 4.0  # rid=2 wins over rid=1
    assert d[0] == 0.0 and d[20] == 8.0


def test_partition_invariance(ray_session):
    rng = np.random.default_rng(5)
    x = np.unique(rng.integers(0, 2000, size=300)).astype(np.int64)
    y = rng.normal(size=len(x))
    tbl = pa.table({"sid": ["z"] * len(x), "x": x, "y": y,
                    "rid": np.arange(len(x), dtype=np.int64)})
    a = _run(tbl, num_partitions=1)
    b = _run(tbl, num_partitions=7)
    assert a == b


# --- time-weighted average ---------------------------------------------------

def test_twa_matches_brute_force(ray_session):
    from collections import defaultdict

    from tsdownsample_ray.stages.twa import time_weighted_avg

    W = 100
    rng = np.random.default_rng(12)
    rows = []
    expect_num = defaultdict(int)
    expect_den = defaultdict(int)
    for sid in ["a", "b"]:
        x = np.sort(rng.choice(np.arange(0, 1000), size=40, replace=False))
        y = rng.integers(-50, 50, size=40)
        for i, (t, v) in enumerate(zip(map(int, x), map(int, y))):
            rows.append((sid, i, t, v))
        for (t0, v), t1 in zip(zip(x, y), x[1:]):
            for u in range(int(t0), int(t1)):  # brute per-microsecond
                expect_num[(sid, u // W * W)] += int(v)
                expect_den[(sid, u // W * W)] += 1
    tbl = pa.table({"series_id": [r[0] for r in rows],
                    "rid": pa.array([r[1] for r in rows], pa.int64()),
                    "x": pa.array([r[2] for r in rows], pa.int64()),
                    "y": pa.array([r[3] for r in rows], pa.int64())})
    out = time_weighted_avg(rd.from_arrow(tbl).repartition(5), W,
                            id_col="rid", num_partitions=3).take_all()
    got = {(r["series_id"], r["bucket"]): (r["num"], r["den"], r["twa"])
           for r in out}
    assert set(got) == set(expect_num)
    for key, (num, den, twa) in got.items():
        assert num == expect_num[key] and den == expect_den[key]
        assert twa == num / den


def test_twa_duplicate_ts_last_holds(ray_session):
    from tsdownsample_ray.stages.twa import time_weighted_avg

    # two rows at t=0 (values 1 then 9 by id); 9 must hold over [0, 10)
    tbl = pa.table({"series_id": ["s"] * 3,
                    "rid": pa.array([0, 1, 2], pa.int64()),
                    "x": pa.array([0, 0, 10], pa.int64()),
                    "y": pa.array([1, 9, 5], pa.int64())})
    out = time_weighted_avg(rd.from_arrow(tbl), 100,
                            id_col="rid").take_all()
    (r,) = out
    assert (r["bucket"], r["num"], r["den"], r["twa"]) == (0, 90, 10, 9.0)


def test_gapfill_linear_interpolation(ray_session):
    """Linear gap fill: exact e6 interpolation between present buckets,
    present rows exact, edges present by grid construction."""
    import numpy as np
    import pyarrow as pa
    import ray

    from tsdownsample_ray.stages.gapfill import gapfill_linear

    W = 10
    rows = {
        "a": [(0, 100), (30, 160), (40, -20)],  # gaps at 10,20
        "b": [(50, 7)],                          # single point, no gaps
    }
    tables = []
    for sid, pts in rows.items():
        tables.append(pa.table({
            "series_id": pa.array([sid] * len(pts)),
            "bucket": pa.array([p[0] for p in pts], pa.int64()),
            "sum_y": pa.array([p[1] for p in pts], pa.int64())}))
    tbl = pa.concat_tables(tables)

    def trunc_div(a, b):
        return a // b if a >= 0 else -((-a) // b)

    expect = {
        ("a", 0): (100 * 10**6, False),
        ("a", 10): (trunc_div((100 * 2 + 160 * 1) * 10**6, 3), True),
        ("a", 20): (trunc_div((100 * 1 + 160 * 2) * 10**6, 3), True),
        ("a", 30): (160 * 10**6, False),
        ("a", 40): (-20 * 10**6, False),
        ("b", 50): (7 * 10**6, False),
    }
    for nparts in (1, 3):
        ds = ray.data.from_arrow(tbl).repartition(nparts)
        out = gapfill_linear(ds, W, num_partitions=2).to_pandas()
        got = {(r["series_id"], r["bucket"]): (r["y_e6"], r["is_gap"])
               for _, r in out.iterrows()}
        assert got == expect
