"""Classical additive seasonal decomposition (2xM centered MA)."""

import numpy as np
import pyarrow as pa


def _replay(series):
    """Direct numpy replay per series: dict series -> (buckets, y)."""
    W, period, half, den = 3_600_000_000, 24, 12, 48
    rows = []
    for sid, (bk, y) in series.items():
        n = len(y)
        for i in range(half, n - half):
            inner = int(y[i - half + 1:i + half].sum())
            trend = int(y[i - half]) + 2 * inner + int(y[i + half])
            detr = den * int(y[i]) - trend
            rows.append([sid, bk[i], int(y[i]),
                         (bk[i] // W) % period, trend, detr])
    # seasonal index per (series, slot)
    agg = {}
    for r in rows:
        agg.setdefault((r[0], r[3]), [0, 0])
        agg[(r[0], r[3])][0] += r[5]
        agg[(r[0], r[3])][1] += 1
    out = []
    for r in rows:
        sn, sc = agg[(r[0], r[3])]
        rn = r[5] * sc - sn
        out.append(tuple(r) + (sn, sc, rn, rn / (48.0 * sc)))
    return sorted(out)


def test_classical_decompose_matches_replay(ray_session):
    import ray

    from tsdownsample_ray.stages.decompose import classical_decompose

    W = 3_600_000_000
    rng = np.random.default_rng(6)
    series = {}
    tables = []
    for sid, n in (("a", 80), ("b", 30), ("c", 20)):  # c: shorter than 25
        bk = (np.arange(n, dtype=np.int64) + rng.integers(0, 5)) * W
        y = rng.integers(-50, 200, n).astype(np.int64)
        series[sid] = (bk, y)
        tables.append(pa.table({
            "series_id": pa.array([sid] * n),
            "bucket": pa.array(bk), "sum_y": pa.array(y)}))
    tbl = pa.concat_tables(tables)
    expect = _replay(series)
    # series c has n=20 < 25 -> zero interior rows
    assert not any(r[0] == "c" for r in expect)

    for nparts in (1, 3):
        ds = ray.data.from_arrow(tbl).repartition(nparts)
        out = classical_decompose(ds, window_us=W, period=24,
                                  num_partitions=2).to_pandas()
        got = sorted(map(tuple, out[[
            "series_id", "bucket", "y", "slot", "trend_num", "detr",
            "seas_num", "seas_cnt", "rem_num", "rem"]].itertuples(
                index=False, name=None)))
        assert got == expect


def test_decompose_rejects_odd_period(ray_session):
    import pytest
    import ray

    from tsdownsample_ray.stages.decompose import classical_decompose

    ds = ray.data.from_arrow(pa.table({
        "series_id": pa.array(["x"]), "bucket": pa.array([0], pa.int64()),
        "sum_y": pa.array([1], pa.int64())}))
    with pytest.raises(ValueError):
        classical_decompose(ds, window_us=1, period=7)
