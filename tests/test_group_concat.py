"""Capped ordered string aggregation (stages/ordering.py:group_concat):
ListArray/binary_join construction vs a Python replay, across
partitionings; groups smaller than k, lexical-order contract."""

import numpy as np
import pyarrow as pa
import pytest

from tsdownsample_ray.stages.ordering import group_concat

ray = pytest.importorskip("ray")
import ray.data as rd  # noqa: E402


def _brute(rows, k, sep):
    by_g = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(str(v))
    return {g: (len(vs), sep.join(sorted(vs)[:k]))
            for g, vs in by_g.items()}


@pytest.mark.parametrize("nparts", [1, 4])
def test_group_concat_matches_replay(ray_session, nparts):
    rng = np.random.default_rng(17)
    rows = [(f"g{int(i) % 7}", int(v))
            for i, v in zip(rng.integers(0, 100, 200),
                            rng.integers(0, 1000, 200))]
    rows.append(("tiny", 5))  # group smaller than k
    exp = _brute(rows, k=4, sep=";")

    t = pa.table({"g": [r[0] for r in rows],
                  "v": [r[1] for r in rows]})
    got = group_concat(rd.from_arrow(t).repartition(nparts),
                       group_col="g", val_col="v", k=4, sep=";",
                       num_partitions=3).to_pandas()
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        n, sample = exp[r["group_id"]]
        assert (r["n"], r["sample"]) == (n, sample), r["group_id"]


def test_group_concat_lexical_order(ray_session):
    # "10" sorts before "2" in the string contract
    t = pa.table({"g": ["a", "a", "a"], "v": [2, 10, 1]})
    got = group_concat(rd.from_arrow(t), group_col="g", val_col="v",
                       k=2, num_partitions=1).to_pandas()
    assert got.iloc[0]["sample"] == "1,10"
    assert got.iloc[0]["n"] == 3
