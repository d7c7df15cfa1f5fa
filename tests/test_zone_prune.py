"""Zone-map pruning audit (stages/zorder.py:zone_map_prune): soundness
and exact per-partition match counts vs a brute replay."""

import numpy as np
import pyarrow as pa
import pytest

from tsdownsample_ray.stages.zorder import morton_interleave, zone_map_prune

ray = pytest.importorskip("ray")
import ray.data as rd  # noqa: E402


def test_zone_map_prune_matches_brute(ray_session):
    rng = np.random.default_rng(3)
    d0 = rng.integers(0, 256, size=4000).astype(np.int64)
    d1 = rng.integers(0, 256, size=4000).astype(np.int64)
    box = dict(lo0=40, hi0=80, lo1=100, hi1=140)
    ds = rd.from_arrow(pa.table({"d0": pa.array(d0),
                                 "d1": pa.array(d1)})).repartition(4)
    got = zone_map_prune(ds, d0_col="d0", d1_col="d1", bits=8,
                         parts_log2=4, num_partitions=2,
                         **box).to_pandas()
    p = morton_interleave(d0, d1) >> np.int64(12)
    hit = ((d0 >= box["lo0"]) & (d0 <= box["hi0"])
           & (d1 >= box["lo1"]) & (d1 <= box["hi1"]))
    for _, r in got.iterrows():
        sel = p == r["p"]
        assert r["n"] == int(sel.sum())
        assert r["matched"] == int((sel & hit).sum())
        # conservative: any matches -> scanned
        assert not (r["matched"] > 0 and r["scanned"] == 0)
        # exact box-overlap flag
        in_p = sel.nonzero()[0]
        exp_scan = int((d0[in_p].max() >= box["lo0"])
                       and (d0[in_p].min() <= box["hi0"])
                       and (d1[in_p].max() >= box["lo1"])
                       and (d1[in_p].min() <= box["hi1"]))
        assert r["scanned"] == exp_scan
    assert got["matched"].sum() == int(hit.sum())
    # the audit is non-trivial: some partitions pruned, some scanned
    assert 0 < got["scanned"].sum() < len(got)
