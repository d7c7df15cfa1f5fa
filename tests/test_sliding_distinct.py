"""Sliding-window distinct actives
(stages/windows.py:sliding_distinct): island sweep vs a literal per-day
set replay, across partitionings; overlapping users, window gaps,
multi-series."""

import numpy as np
import pyarrow as pa
import pytest

from tsdownsample_ray.stages.windows import sliding_distinct

ray = pytest.importorskip("ray")
import ray.data as rd  # noqa: E402


def _brute(rows, w):
    """rows = [(sid, u, day)] -> {(sid, day): distinct users in
    trailing w days}, only days with >= 1 active."""
    seen = {}
    for sid, u, day in rows:
        seen.setdefault(sid, set()).add((u, day))
    out = {}
    for sid, ud in seen.items():
        days = [d for _, d in ud]
        for day in range(min(days), max(days) + w):
            us = {u for u, d in ud if day - w + 1 <= d <= day}
            if us:
                out[(sid, day)] = len(us)
    return out


@pytest.mark.parametrize("nparts", [1, 4])
def test_sliding_distinct_matches_replay(ray_session, nparts):
    rng = np.random.default_rng(47)
    rows = [(f"s{int(a) % 3}", int(u), int(d))
            for a, u, d in zip(rng.integers(0, 100, 300),
                               rng.integers(0, 12, 300),
                               rng.integers(0, 40, 300))]
    exp = _brute(rows, 7)

    t = pa.table({"series_id": [r[0] for r in rows],
                  "user_id": [r[1] for r in rows],
                  "day": [r[2] for r in rows]})
    got = sliding_distinct(rd.from_arrow(t).repartition(nparts),
                           window=7, num_partitions=3).to_pandas()
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        assert r["active_users"] == exp[(r["series_id"], r["day"])], \
            (r["series_id"], r["day"])


def test_sliding_distinct_hand_values(ray_session):
    # one user on days 0 and 10, w=3: active 0-2 and 10-12, gap between
    t = pa.table({"series_id": ["a", "a"], "user_id": [1, 1],
                  "day": [0, 10]})
    got = sliding_distinct(rd.from_arrow(t), window=3,
                           num_partitions=2).to_pandas()
    m = {(r["series_id"], r["day"]): r["active_users"]
         for _, r in got.iterrows()}
    assert m == {("a", 0): 1, ("a", 1): 1, ("a", 2): 1,
                 ("a", 10): 1, ("a", 11): 1, ("a", 12): 1}
