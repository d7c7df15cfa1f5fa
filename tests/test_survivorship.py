"""Golden-record survivorship (stages/cdc.py:survivorship_merge):
per-column latest-non-null vs a Python replay, across partitionings;
all-null columns, tie-break by id."""

import numpy as np
import pyarrow as pa
import pytest

from tsdownsample_ray.stages.cdc import survivorship_merge

ray = pytest.importorskip("ray")
import ray.data as rd  # noqa: E402


def _brute(rows):
    """rows = [(key, ts, id, a, b)] -> {key: (n, last_ts, a, b)}."""
    by_k = {}
    for r in rows:
        by_k.setdefault(r[0], []).append(r)
    out = {}
    for k, vs in by_k.items():
        vs.sort(key=lambda r: (r[1], r[2]))
        a = next((r[3] for r in reversed(vs) if r[3] is not None), None)
        b = next((r[4] for r in reversed(vs) if r[4] is not None), None)
        out[k] = (len(vs), vs[-1][1], a, b)
    return out


@pytest.mark.parametrize("nparts", [1, 4])
def test_survivorship_matches_replay(ray_session, nparts):
    rng = np.random.default_rng(53)
    rows = []
    for i in range(300):
        k = int(rng.integers(0, 20))
        ts = int(rng.integers(0, 1000))
        a = int(rng.integers(0, 100)) if rng.random() > 0.4 else None
        b = f"v{int(rng.integers(0, 9))}" if rng.random() > 0.4 else None
        rows.append((k, ts, i, a, b))
    rows.append((99, 5, 1000, None, None))  # all-null key
    exp = _brute(rows)

    t = pa.table({"key": [r[0] for r in rows],
                  "ts_us": [r[1] for r in rows],
                  "event_id": [r[2] for r in rows],
                  "a": pa.array([r[3] for r in rows], pa.int64()),
                  "b": pa.array([r[4] for r in rows], pa.string())})
    got = survivorship_merge(rd.from_arrow(t).repartition(nparts),
                             key_col="key", ts_col="ts_us",
                             id_col="event_id", cols=["a", "b"],
                             num_partitions=3).to_pandas()
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        n, last_ts, a, b = exp[r["key"]]
        assert (r["n_versions"], r["last_ts"]) == (n, last_ts)
        ra = None if r["a"] is None or (isinstance(r["a"], float)
                                        and np.isnan(r["a"])) else r["a"]
        assert ra == a, r["key"]
        assert (r["b"] if r["b"] is not None else None) == b, r["key"]


def test_survivorship_tie_break_by_id(ray_session):
    # same ts: the larger id wins
    t = pa.table({"key": [1, 1], "ts_us": [10, 10],
                  "event_id": [0, 1],
                  "a": pa.array([7, 9], pa.int64())})
    got = survivorship_merge(rd.from_arrow(t), key_col="key",
                             ts_col="ts_us", id_col="event_id",
                             cols=["a"], num_partitions=1).to_pandas()
    assert got.iloc[0]["a"] == 9
