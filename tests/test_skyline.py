"""2-D Pareto skyline (stages/skyline.py:skyline2d): grid-pruned
frontier vs the quadratic dominance definition, across partitionings;
duplicate points, same-x ties, negative coordinates, null rows."""

import numpy as np
import pyarrow as pa
import pytest

from tsdownsample_ray.stages.skyline import skyline2d

ray = pytest.importorskip("ray")
import ray.data as rd  # noqa: E402


def _brute(pts):
    keep = []
    for i, (x, y) in enumerate(pts):
        dominated = any(
            (xj >= x and yj >= y and (xj > x or yj > y))
            for j, (xj, yj) in enumerate(pts) if j != i)
        if not dominated:
            keep.append((x, y))
    return sorted(keep)


@pytest.mark.parametrize("nparts", [1, 4])
def test_skyline_matches_quadratic(ray_session, nparts):
    rng = np.random.default_rng(9)
    xs = rng.integers(-500, 500, 300)
    ys = rng.integers(-1000, 1000, 300)
    # inject exact duplicates and same-x ties
    xs[10], ys[10] = xs[0], ys[0]
    xs[11] = xs[1]
    pts = list(zip(xs.tolist(), ys.tolist()))
    exp = _brute(pts)

    t = pa.table({"rid": list(range(len(pts))),
                  "x": [p[0] for p in pts],
                  "y": [p[1] for p in pts]})
    got = skyline2d(rd.from_arrow(t).repartition(nparts),
                    x_col="x", y_col="y", cell_w=100,
                    num_partitions=3).to_pandas()
    assert sorted(zip(got["x"], got["y"])) == exp
    assert set(got.columns) == {"rid", "x", "y"}


def test_skyline_duplicates_all_kept(ray_session):
    t = pa.table({"x": [5, 5, 1], "y": [7, 7, 9]})
    got = skyline2d(rd.from_arrow(t), x_col="x", y_col="y",
                    cell_w=2, num_partitions=2).to_pandas()
    assert sorted(zip(got["x"], got["y"])) == [(1, 9), (5, 7), (5, 7)]


def test_skyline_null_xy_dropped(ray_session):
    t = pa.table({"x": pa.array([1, None, 3], pa.int64()),
                  "y": pa.array([9, 100, None], pa.int64())})
    got = skyline2d(rd.from_arrow(t), x_col="x", y_col="y",
                    cell_w=10, num_partitions=2).to_pandas()
    assert sorted(zip(got["x"], got["y"])) == [(1, 9)]
