"""Grid-bucketed temporal overlap join
(stages/joins.py:interval_count_join): counts and range sums vs a
quadratic brute force, across partitionings; multi-cell intervals,
zero-match windows, and the max_cells guard."""

import numpy as np
import pyarrow as pa
import pytest

from tsdownsample_ray.stages.joins import interval_count_join

ray = pytest.importorskip("ray")
import ray.data as rd  # noqa: E402


def _brute(points, intervals):
    out = {}
    for ivl, s, e in intervals:
        hits = [(x, v) for x, v in points if s <= x <= e]
        out[ivl] = (s, e, len(hits), sum(v for _, v in hits))
    return out


@pytest.mark.parametrize("nparts", [1, 4])
def test_interval_join_matches_brute(ray_session, nparts):
    rng = np.random.default_rng(7)
    points = [(int(x), int(v)) for x, v in
              zip(rng.integers(0, 100_000, 400),
                  rng.integers(-50, 200, 400))]
    # interval lengths 0 .. ~9 cells at cell=1000
    starts = rng.integers(-500, 100_500, 60)
    lens = rng.integers(0, 9_000, 60)
    intervals = [(i, int(s), int(s + l))
                 for i, (s, l) in enumerate(zip(starts, lens))]
    exp = _brute(points, intervals)

    pds = rd.from_arrow(pa.table({
        "x": [p[0] for p in points],
        "v": [p[1] for p in points]})).repartition(nparts)
    ids = rd.from_arrow(pa.table({
        "ivl_id": [i[0] for i in intervals],
        "start_us": [i[1] for i in intervals],
        "end_us": [i[2] for i in intervals]})).repartition(nparts)
    got = interval_count_join(pds, ids, cell_us=1000, val_col="v",
                              max_cells=16, num_partitions=3).to_pandas()
    assert len(got) == len(intervals)  # LEFT semantics: all intervals
    for _, r in got.iterrows():
        s, e, n, sv = exp[r["ivl_id"]]
        assert (r["start_us"], r["end_us"], r["n_points"],
                r["sum_val"]) == (s, e, n, sv), r["ivl_id"]


def test_interval_join_max_cells_guard(ray_session):
    pds = rd.from_arrow(pa.table({"x": [5]}))
    ids = rd.from_arrow(pa.table({
        "ivl_id": [0], "start_us": [0], "end_us": [100_000]}))
    with pytest.raises(Exception, match="max_cells"):
        interval_count_join(pds, ids, cell_us=10, max_cells=4,
                            num_partitions=2).to_pandas()


def test_interval_join_inclusive_bounds(ray_session):
    # points exactly on start/end are matched; just outside are not
    pds = rd.from_arrow(pa.table({"x": [99, 100, 200, 201]}))
    ids = rd.from_arrow(pa.table({
        "ivl_id": [1], "start_us": [100], "end_us": [200]}))
    got = interval_count_join(pds, ids, cell_us=64,
                              num_partitions=2).to_pandas()
    assert got.iloc[0]["n_points"] == 2
    assert got.iloc[0]["sum_val"] == 0
