"""Blocked exact-neighbor operators over a labeled embedding column:
mutual nearest-neighbor pairs (record-linkage / bitext-mining shape) and
k-th-NN distance outlier scores (distance-based anomaly filtering for
curation).

Scale shape: the classic BLOCKING trick — the quadratic pair space is
confined to within-block (here: within-label) groups, so the only wide
step is one hash(label) shuffle; each group then runs a vectorized
integer Gram matmul (no Python loops, no broadcast of the full corpus).
At 100 TB the blocking key is whatever bounds group size (label, LSH
bucket, IVF list — `embedding_near_dup_pairs` / `knn_ivf` provide those
buckets); the within-group math here is identical. Components quantize
as ``trunc(v·scale)`` (int64) so every distance is exact and the whole
operator replays in SQL.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["quantized_groups", "mutual_nn_pairs", "kth_nn_distance"]


def quantized_groups(ds, *, scale: int = 1000, id_col: str = "vec_id",
                     col: str = "embedding", label_col: str = "label"):
    """(id, label, quantized int64 list) rows — the shared projection
    both neighbor operators group on."""
    from .similarity import embedding_matrix

    def _q(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({
                "vec_id": pa.array([], pa.int64()),
                "label": pa.array([], pa.int64()),
                "v": pa.array([], pa.list_(pa.int64()))})
        Q = np.trunc(embedding_matrix(b, col) * scale).astype(np.int64)
        off = pa.array(np.arange(0, (len(Q) + 1) * Q.shape[1],
                                 Q.shape[1], dtype=np.int32))
        return pa.table({
            "vec_id": pc.cast(b[id_col], pa.int64()),
            "label": pc.cast(b[label_col], pa.int64()),
            "v": pa.ListArray.from_arrays(off, pa.array(Q.ravel()))})

    return ds.map_batches(_q, batch_format="pyarrow")


def _group_mat(g: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = g["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    arr = g["v"]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
    Q = flat.reshape(len(arr), -1)
    order = np.argsort(ids)
    return ids[order], Q[order]


def _d2_matrix(Q: np.ndarray) -> np.ndarray:
    qq = np.einsum("ij,ij->i", Q, Q)
    return qq[:, None] + qq[None, :] - 2 * (Q @ Q.T)


def mutual_nn_pairs(ds, *, scale: int = 1000, id_col: str = "vec_id",
                    col: str = "embedding", label_col: str = "label"):
    """Within-label mutual nearest neighbors: pairs (a < b, label, d2)
    where b is a's nearest non-self neighbor AND a is b's (exact integer
    d2, ties to the smallest id)."""
    q = quantized_groups(ds, scale=scale, id_col=id_col, col=col,
                         label_col=label_col)

    def _mutual(g: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64()),
                          "label": pa.array([], pa.int64()),
                          "d2": pa.array([], pa.int64())})
        if g.num_rows < 2:
            return empty
        ids, Q = _group_mat(g)
        D = _d2_matrix(Q)
        np.fill_diagonal(D, np.iinfo(np.int64).max)
        nn = np.argmin(D, axis=1)  # ids sorted -> ties hit smallest id
        i = np.arange(len(ids))
        mutual = (nn[nn] == i) & (i < nn)
        if not mutual.any():
            return empty
        ai = i[mutual]
        bi = nn[mutual]
        lab = g["label"][0].as_py()
        return pa.table({
            "a": pa.array(ids[ai]), "b": pa.array(ids[bi]),
            "label": pa.array(np.full(len(ai), lab, np.int64)),
            "d2": pa.array(D[ai, bi])})

    return q.groupby("label").map_groups(_mutual, batch_format="pyarrow")


def kth_nn_distance(ds, *, k: int = 5, scale: int = 1000,
                    id_col: str = "vec_id", col: str = "embedding",
                    label_col: str = "label", top: int = 5):
    """Distance-based outlier scores: each row's exact integer d2 to its
    k-th nearest within-label neighbor, keeping the ``top`` most outlying
    rows per label (d2k desc, id asc) with their rank."""
    q = quantized_groups(ds, scale=scale, id_col=id_col, col=col,
                         label_col=label_col)

    def _kth(g: pa.Table) -> pa.Table:
        empty = pa.table({"vec_id": pa.array([], pa.int64()),
                          "label": pa.array([], pa.int64()),
                          "d2k": pa.array([], pa.int64()),
                          "rk": pa.array([], pa.int64())})
        if g.num_rows <= k:
            return empty
        ids, Q = _group_mat(g)
        D = _d2_matrix(Q)
        np.fill_diagonal(D, np.iinfo(np.int64).max)
        d2k = np.partition(D, k - 1, axis=1)[:, k - 1]
        order = np.lexsort((ids, -d2k))[:top]
        lab = g["label"][0].as_py()
        return pa.table({
            "vec_id": pa.array(ids[order]),
            "label": pa.array(np.full(len(order), lab, np.int64)),
            "d2k": pa.array(d2k[order]),
            "rk": pa.array(np.arange(1, len(order) + 1, dtype=np.int64))})

    return q.groupby("label").map_groups(_kth, batch_format="pyarrow")
