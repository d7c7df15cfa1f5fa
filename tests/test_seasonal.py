"""seasonal_profile / seasonal_anomalies: profile sums, broadcast flags."""

import numpy as np
import pyarrow as pa
import pytest

ray = pytest.importorskip("ray")
import ray.data as rd  # noqa: E402

from tsdownsample_ray.stages.seasonal import (  # noqa: E402
    seasonal_anomalies,
    seasonal_profile,
)

H = 3_600_000_000


def _events():
    # series 'a': slot 0 population {10, 10, 10, 100} (day-spread),
    # slot 1 population {5}
    rows = [("a", 0 * H, 10), ("a", 24 * H, 10), ("a", 48 * H, 10),
            ("a", 72 * H, 100), ("a", 1 * H, 5),
            ("b", 0 * H, 7), ("b", 24 * H, 7)]
    return pa.table({
        "series_id": [r[0] for r in rows],
        "rid": pa.array(range(len(rows)), pa.int64()),
        "x": pa.array([r[1] for r in rows], pa.int64()),
        "y": pa.array([r[2] for r in rows], pa.int64()),
    })


def test_profile_sums(ray_session):
    prof = {(r["series_id"], r["slot"]): (r["n"], r["s"], r["q"])
            for r in seasonal_profile(
                rd.from_arrow(_events()).repartition(3)).take_all()}
    assert prof[("a", 0)] == (4, 130, 10300)
    assert prof[("a", 1)] == (1, 5, 25)
    assert prof[("b", 0)] == (2, 14, 98)


def test_anomaly_flags(ray_session):
    ds = rd.from_arrow(_events())
    profile = pa.Table.from_pylist(seasonal_profile(ds).take_all())
    out = {r["rid"]: r["is_anomaly"]
           for r in seasonal_anomalies(ds, profile, id_col="rid",
                                       threshold=1).take_all()}
    # slot-0 'a': mean 32.5; the 100 outlier deviates far beyond 1 sigma
    assert out[3] is True
    # constant series 'b': zero variance, never anomalous
    assert out[5] is False and out[6] is False
    # singleton slot (n < 2) is never flagged
    assert out[4] is False


# --- fixed-point EWMA --------------------------------------------------------

def test_ewma_fixed_point_replay(ray_session):
    from tsdownsample_ray.stages.smoothing import ewma_fixed_point

    rng = np.random.default_rng(4)
    rows = []
    expect = {}
    for sid in ["a", "b"]:
        y = rng.integers(-500, 500, size=50)
        state = None
        for i, v in enumerate(map(int, y)):
            rows.append((sid, i * 10, v))
            state = v if state is None else state + ((v - state) >> 2)
            expect[(sid, i * 10)] = state
    tbl = pa.table({"series_id": [r[0] for r in rows],
                    "bucket": pa.array([r[1] for r in rows], pa.int64()),
                    "sum_y": pa.array([r[2] for r in rows], pa.int64())})
    out = ewma_fixed_point(rd.from_arrow(tbl).repartition(4), k=2,
                           x_col="bucket", num_partitions=3).take_all()
    assert len(out) == len(rows)
    for r in out:
        assert r["ema"] == expect[(r["series_id"], r["bucket"])]
        # negative diffs floor correctly (arithmetic shift semantics)


# --- exact quantiles ---------------------------------------------------------

def test_exact_quantiles_vs_numpy(ray_session):
    from tsdownsample_ray.stages.quantiles import exact_quantiles

    rng = np.random.default_rng(8)
    rows = []
    expect = {}
    for sid, n in [("a", 101), ("b", 7), ("c", 1)]:
        v = rng.integers(-1000, 1000, size=n)
        for i, x in enumerate(map(int, v)):
            rows.append((sid, i, x))
        sv = np.sort(v)
        expect[sid] = {p: int(sv[(n - 1) * p // 100]) for p in (50, 90, 99)}
    tbl = pa.table({"series_id": [r[0] for r in rows],
                    "bucket": pa.array([r[1] for r in rows], pa.int64()),
                    "sum_y": pa.array([r[2] for r in rows], pa.int64())})
    out = {r["series_id"]: r for r in exact_quantiles(
        rd.from_arrow(tbl).repartition(4), num_partitions=3).take_all()}
    for sid, e in expect.items():
        assert out[sid]["p50"] == e[50]
        assert out[sid]["p90"] == e[90]
        assert out[sid]["p99"] == e[99]
    assert out["c"]["n"] == 1 and out["c"]["p50"] == out["c"]["p99"]
