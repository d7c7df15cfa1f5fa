"""Interval union / coverage (stages/intervals.py:interval_union): the
reset-free sweep-line vs a literal per-series merge replay, across
partitionings; touching-merge, containment, and zero-length semantics."""

import numpy as np
import pyarrow as pa
import pytest

from tsdownsample_ray.stages.intervals import interval_union

ray = pytest.importorskip("ray")
import ray.data as rd  # noqa: E402


def _brute(ivls):
    """ivls = [(sid, s, e)]; literal sort-and-merge per series."""
    by_sid = {}
    for sid, s, e in ivls:
        if e > s:
            by_sid.setdefault(sid, []).append((s, e))
    out = {}
    for sid, xs in by_sid.items():
        xs.sort()
        islands = []
        for s, e in xs:
            if islands and s <= islands[-1][1]:  # overlap or touch
                islands[-1][1] = max(islands[-1][1], e)
            else:
                islands.append([s, e])
        lens = [e - s for s, e in islands]
        out[sid] = (len(xs), len(islands), sum(lens), max(lens))
    return out


@pytest.mark.parametrize("nparts", [1, 4])
def test_interval_union_matches_merge(ray_session, nparts):
    rng = np.random.default_rng(5)
    ivls = []
    for s in range(8):
        starts = rng.integers(0, 50_000, 50)
        lens = rng.integers(0, 2_000, 50)  # includes zero-length
        ivls += [(f"u{s}", int(a), int(a + l))
                 for a, l in zip(starts, lens)]
    exp = _brute(ivls)

    t = pa.table({"series_id": [i[0] for i in ivls],
                  "start_us": [i[1] for i in ivls],
                  "end_us": [i[2] for i in ivls]})
    got = interval_union(rd.from_arrow(t).repartition(nparts),
                         num_partitions=3).to_pandas()
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        assert (r["n_intervals"], r["n_islands"], r["covered_us"],
                r["max_island_us"]) == exp[r["series_id"]], r["series_id"]


def test_interval_union_touch_and_containment(ray_session):
    t = pa.table({
        "series_id": ["a"] * 4 + ["b"],
        "start_us": [0, 5, 5, 20, 100],
        "end_us": [5, 9, 7, 30, 100],  # touch, containment, gap, zero-len
    })
    got = interval_union(rd.from_arrow(t),
                         num_partitions=2).to_pandas()
    got = got.set_index("series_id")
    a = got.loc["a"]
    assert (a["n_intervals"], a["n_islands"], a["covered_us"],
            a["max_island_us"]) == (4, 2, 19, 10)
    assert "b" not in got.index  # only a zero-length interval
