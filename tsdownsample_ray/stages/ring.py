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

from .dedup import _stable_u64

__all__ = ["build_ring", "ring_owner", "ring_rebalance_audit"]


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
