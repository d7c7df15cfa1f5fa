"""Inter-arrival gap profile (stages/rate.py:gap_profile): the
vectorized segment reductions vs a literal per-series Python replay,
across partitionings, plus single-event-series null semantics."""

import numpy as np
import pyarrow as pa
import pytest

from tsdownsample_ray.stages.rate import gap_profile

ray = pytest.importorskip("ray")
import ray.data as rd  # noqa: E402


def _brute(rows, over_us):
    """rows = [(sid, x, id)]; replay sort + consecutive deltas."""
    by_sid = {}
    for sid, x, i in sorted(rows):
        by_sid.setdefault(sid, []).append(x)
    out = {}
    for sid, xs in by_sid.items():
        gaps = [b - a for a, b in zip(xs, xs[1:])]
        out[sid] = {
            "n_events": len(xs),
            "n_gaps": len(gaps),
            "min_gap_us": min(gaps) if gaps else None,
            "max_gap_us": max(gaps) if gaps else None,
            "sum_gap_us": sum(gaps),
            "mean_gap_us": sum(gaps) / len(gaps) if gaps else None,
            "n_gaps_over": sum(1 for g in gaps if g > over_us),
        }
    return out


@pytest.mark.parametrize("nparts", [1, 4])
def test_gap_profile_matches_replay(ray_session, nparts):
    rng = np.random.default_rng(11)
    rows = []
    for s in range(6):
        xs = np.sort(rng.choice(1_000_000, size=40, replace=False))
        rows += [(f"s{s}", int(x), k) for k, x in enumerate(xs)]
    rows.append(("lonely", 777, 0))  # single-event series
    exp = _brute(rows, over_us=30_000)

    t = pa.table({"series_id": [r[0] for r in rows],
                  "x": [r[1] for r in rows],
                  "event_id": [r[2] for r in rows]})
    ds = rd.from_arrow(t).repartition(nparts)
    got = gap_profile(ds, over_us=30_000, id_col="event_id",
                      num_partitions=2).to_pandas()
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        e = exp[r["series_id"]]
        assert r["n_events"] == e["n_events"]
        assert r["n_gaps"] == e["n_gaps"]
        assert r["sum_gap_us"] == e["sum_gap_us"]
        assert r["n_gaps_over"] == e["n_gaps_over"]
        if e["n_gaps"] == 0:
            assert r["min_gap_us"] is None or np.isnan(r["min_gap_us"])
            assert r["mean_gap_us"] is None or np.isnan(r["mean_gap_us"])
        else:
            assert r["min_gap_us"] == e["min_gap_us"]
            assert r["max_gap_us"] == e["max_gap_us"]
            assert r["mean_gap_us"] == pytest.approx(e["mean_gap_us"])


def test_gap_profile_duplicate_x_tiebreak(ray_session):
    # duplicate x values: deltas of 0 are legal gaps, id breaks the order
    t = pa.table({"series_id": ["a"] * 4, "x": [5, 5, 9, 9],
                  "event_id": [1, 0, 3, 2]})
    got = gap_profile(rd.from_arrow(t), over_us=3, id_col="event_id",
                      num_partitions=1).to_pandas()
    assert got.iloc[0]["n_gaps"] == 3
    assert got.iloc[0]["min_gap_us"] == 0
    assert got.iloc[0]["max_gap_us"] == 4
    assert got.iloc[0]["n_gaps_over"] == 1
