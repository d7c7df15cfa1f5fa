"""Consistent-hash ring assignment audit (Karger et al., STOC 1997;
the memcached/Dynamo placement scheme): keys and virtual nodes hash
onto a u64 ring, each key is owned by the first vnode clockwise, and
growing the cluster N -> N+1 moves only ~1/(N+1) of the keys — the
minimal-reshuffle property this audit measures key by key.

Hashes are the repo's md5-u64 convention (``dedup._stable_u64``), so
the DuckDB oracle replays both rings and every ownership decision
bit-exactly (md5 hex fold -> HUGEINT). The rings are tiny
(nodes x vnodes positions) and are built once on the driver, captured
into the map closure; per-key work is one md5 + two sorted-ring
``searchsorted`` probes — embarrassingly parallel, no shuffle.

No counterpart in the reference (kernel library only).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .dedup import _stable_u64

__all__ = ["build_ring", "ring_owner", "ring_rebalance_audit", "hrw_rebalance"]


def build_ring(n_nodes: int, vnodes: int) -> tuple:
    """(sorted positions: u64 array, owner node per position). Vnode
    ``v`` of node ``n`` sits at ``md5(f"n{n}:v{v}")``; ties (never
    observed — distinct md5 inputs) resolve to the smaller node id via
    the (pos, node) sort."""
    pos = np.empty(n_nodes * vnodes, dtype=np.uint64)
    owner = np.empty(n_nodes * vnodes, dtype=np.int64)
    i = 0
    for n in range(n_nodes):
        for v in range(vnodes):
            pos[i] = _stable_u64(f"n{n}:v{v}".encode())
            owner[i] = n
            i += 1
    order = np.lexsort((owner, pos))
    return pos[order], owner[order]


def ring_owner(key_hashes: np.ndarray, ring_pos: np.ndarray,
               ring_own: np.ndarray) -> np.ndarray:
    """First vnode clockwise (position >= key, wrapping to the ring's
    smallest position) — one vectorized searchsorted."""
    idx = np.searchsorted(ring_pos, key_hashes, side="left")
    idx[idx == len(ring_pos)] = 0
    return ring_own[idx]


def ring_rebalance_audit(ds, *, id_col: str = "doc_id",
                         n_nodes: int = 16, vnodes: int = 32):
    """Per key: its owner on an ``n_nodes``-node ring and on the
    ``n_nodes + 1``-node ring, plus whether it moved. Output
    ``(id_col, owner_a, owner_b, moved)``; the moved fraction should
    sit near ``1/(n_nodes+1)`` — the consistent-hashing guarantee a
    mod-N scheme lacks (it would move ~n/(n+1))."""
    pa_, oa = build_ring(n_nodes, vnodes)
    pb, ob = build_ring(n_nodes + 1, vnodes)

    def _audit(b: pa.Table) -> pa.Table:
        ids = b[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        kh = np.fromiter(
            (_stable_u64(f"doc:{v}".encode()) for v in ids.to_pylist()),
            dtype=np.uint64, count=len(ids))
        own_a = ring_owner(kh, pa_, oa)
        own_b = ring_owner(kh, pb, ob)
        return pa.table({id_col: ids,
                         "owner_a": pa.array(own_a),
                         "owner_b": pa.array(own_b),
                         "moved": pa.array(own_a != own_b)})

    return ds.map_batches(_audit, batch_format="pyarrow")


def hrw_rebalance(ds, *, key_col: str = "url", n_nodes: int = 8,
                  fanin: int = 4):
    """Rendezvous (highest-random-weight) hashing rebalance audit
    (Thaler & Ravishankar 1998 — the OTHER consistent placement scheme
    next to the Karger ring already in the catalog): each key's owner
    is ``argmax over nodes of md5-u64(node || '|' || key)``; adding
    node ``n<N>`` moves exactly the keys whose new argmax is the new
    node (the HRW minimal-disruption property, audited exactly).
    Output per N-node owner: ``(owner, n_keys, n_moved)`` — moved =
    keys this owner loses to the added node.

    Scale shape: per batch, DISTINCT keys hash once per node
    (``N+1`` md5 passes over batch-unique keys — the KMV hashing
    pattern); no shuffle except the final bounded per-owner grouped
    sum. The md5 -> u64 convention is the catalog-wide one, so SQL
    replays every hash including collisions."""
    from ..arrow_utils import rename_agg
    from .dedup import _hash_unique_tokens
    from .graph import grouped_sum_parts

    names = [f"n{i}" for i in range(n_nodes + 1)]

    def _owners(b: pa.Table) -> pa.Table:
        keys = b[key_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        u = pc.unique(keys)
        empty = pa.table({"owner": pa.array([], pa.string()),
                          "n_keys": pa.array([], pa.int64()),
                          "n_moved": pa.array([], pa.int64())})
        if len(u) == 0:
            return empty
        ul = u.to_pylist()
        hs = np.stack([
            _hash_unique_tokens([f"{nm}|{k}" for k in ul], None)
            for nm in names])  # (n_nodes+1, n_keys) u64
        old_owner = np.argmax(hs[:n_nodes], axis=0)
        new_owner = np.argmax(hs, axis=0)
        moved = new_owner == n_nodes
        t = pa.table({"owner": pa.array([names[i] for i in old_owner]),
                      "n_keys": pa.array(np.ones(len(ul), np.int64)),
                      "n_moved": pa.array(moved.astype(np.int64))})
        g = t.group_by(["owner"]).aggregate(
            [("n_keys", "sum"), ("n_moved", "sum")])
        return rename_agg(g, {"owner": "owner", "n_keys_sum": "n_keys",
                              "n_moved_sum": "n_moved"})

    return grouped_sum_parts(ds.map_batches(_owners,
                                            batch_format="pyarrow"),
                             ["owner"], ["n_keys", "n_moved"],
                             count_col=None, fanin=fanin)
