"""Consistent-hash ring: brute replay, wrap edge, minimal-move property."""

import numpy as np


def test_ring_owner_brute_and_wrap():
    from tsdownsample_ray.stages.dedup import _stable_u64
    from tsdownsample_ray.stages.ring import build_ring, ring_owner

    pos, own = build_ring(5, 8)
    assert np.all(np.diff(pos.astype(object)) >= 0)
    keys = np.array([_stable_u64(f"doc:{i}".encode()) for i in range(200)],
                    dtype=np.uint64)
    got = ring_owner(keys, pos, own)
    for k, g in zip(keys.tolist(), got.tolist()):
        cand = [(int((int(p) - k) % (1 << 64)), int(o))
                for p, o in zip(pos, own)]
        assert g == min(cand)[1]
    # a key past the largest position wraps to the ring's smallest
    past = np.array([int(pos.max()) + 1], dtype=np.uint64)
    assert ring_owner(past, pos, own)[0] == own[0]


def test_ring_rebalance_minimal_move(ray_session):
    import pandas as pd
    import ray.data as rd

    from tsdownsample_ray.stages.ring import ring_rebalance_audit

    ds = rd.from_pandas(pd.DataFrame({"doc_id": range(3000)})) \
        .repartition(4)
    out = ring_rebalance_audit(ds, n_nodes=16, vnodes=32).to_pandas()
    frac = out["moved"].mean()
    # consistent hashing moves ~1/17 of keys; mod-N would move ~16/17
    assert 0.02 < frac < 0.12
    # every moved key moved TO the new node (17th node, id 16) — the
    # defining property: old nodes never exchange keys on grow
    moved = out[out["moved"]]
    assert (moved["owner_b"] == 16).all()
