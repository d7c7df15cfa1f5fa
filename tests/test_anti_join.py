"""Exact distributed anti-join (stages/joins.py:anti_join): bincount
membership vs a Python set replay, across partitionings; null-key
semantics (NOT EXISTS on equality never matches nulls), payload
passthrough, duplicate right keys."""

import numpy as np
import pyarrow as pa
import pytest

from tsdownsample_ray.stages.joins import anti_join

ray = pytest.importorskip("ray")
import ray.data as rd  # noqa: E402


@pytest.mark.parametrize("nparts", [1, 4])
def test_anti_join_matches_set(ray_session, nparts):
    rng = np.random.default_rng(21)
    lk = rng.integers(0, 200, 500)
    rk = np.repeat(rng.integers(0, 200, 80), 3)  # duplicates on right
    rset = set(rk.tolist())
    left = pa.table({"k": lk, "payload": np.arange(500)})
    right = pa.table({"k": rk})
    got = anti_join(rd.from_arrow(left).repartition(nparts),
                    rd.from_arrow(right).repartition(nparts),
                    on="k", num_partitions=3).to_pandas()
    exp = [(int(k), i) for i, k in enumerate(lk) if int(k) not in rset]
    assert sorted(zip(got["k"], got["payload"])) == sorted(exp)
    assert list(got.columns) == ["k", "payload"]


def test_anti_join_null_keys_always_kept(ray_session):
    left = pa.table({"k": pa.array([1, None, 3], pa.int64()),
                     "v": ["a", "b", "c"]})
    right = pa.table({"k": pa.array([1, None], pa.int64())})
    got = anti_join(rd.from_arrow(left), rd.from_arrow(right),
                    on="k", num_partitions=2).to_pandas()
    # k=1 matched -> dropped; null never matches -> kept; 3 kept
    assert sorted(got["v"]) == ["b", "c"]


def test_anti_join_empty_right_keeps_all(ray_session):
    left = pa.table({"k": [1, 2], "v": ["a", "b"]})
    right = pa.table({"k": pa.array([], pa.int64())})
    got = anti_join(rd.from_arrow(left), rd.from_arrow(right),
                    on="k", num_partitions=2).to_pandas()
    assert sorted(got["v"]) == ["a", "b"]
