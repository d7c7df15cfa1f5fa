"""Generic tagged-union hash join (stages/joins.py:hash_inner_join):
inner semantics, null keys dropped, name-clash validation."""

import pyarrow as pa
import pytest

from tsdownsample_ray.stages.joins import hash_inner_join

ray = pytest.importorskip("ray")
import ray.data as rd  # noqa: E402


def test_inner_semantics_and_nulls(ray_session):
    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 2, 3, None], pa.int64()),
        "lv": pa.array([10, 20, 21, 30, 99], pa.int64())})).repartition(3)
    right = rd.from_arrow(pa.table({
        "rk": pa.array([2, 3, 3, 4, None], pa.int64()),
        "rv": pa.array([200, 300, 301, 400, 999],
                       pa.int64())})).repartition(2)
    got = hash_inner_join(left, right, on="k", right_on="rk",
                          num_partitions=2).to_pandas()
    rows = sorted(map(tuple, got[["k", "lv", "rv"]].to_numpy()))
    # k=2 matches 2x1 rows -> 2; k=3 matches 1x2 -> 2; nulls never match
    assert rows == [(2, 20, 200), (2, 21, 200),
                    (3, 30, 300), (3, 30, 301)]


def test_clash_validation(ray_session):
    t = rd.from_arrow(pa.table({"k": pa.array([1], pa.int64()),
                                "v": pa.array([1], pa.int64())}))
    with pytest.raises(ValueError, match="overlapping"):
        hash_inner_join(t, t, on="k")
