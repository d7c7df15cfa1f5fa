"""Similarity search over an embedding column (``list<float>``).

- ``knn_bruteforce``: exact top-k cosine. The query matrix is broadcast
  once (``ray.put``); each batch computes a vectorized f64 matmul against
  it and emits its LOCAL top-k, and a final tiny sort+limit merges them.
  Work per batch is O(batch x dim); the all-to-all is k rows per block.
- ``IVFIndex`` / ``knn_ivf``: the scale path — deterministic k-means
  (seeded, driver-side on a sample) partitions vectors into C lists; a
  probe searches only ``nprobe`` nearest lists. Recall vs brute force is
  pytest-checked.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["embedding_matrix", "knn_bruteforce", "train_ivf_centroids",
           "assign_lists_batch", "knn_ivf"]


def embedding_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    dim = len(arr[0])
    return flat.reshape(-1, dim)


def _cosine_to_query(E: np.ndarray, q: np.ndarray) -> np.ndarray:
    En = np.linalg.norm(E, axis=1)
    qn = np.linalg.norm(q)
    return (E @ q) / (En * qn)


def knn_bruteforce(ds, query_ref, k: int = 10, *, id_col: str = "vec_id",
                   col: str = "embedding"):
    """Exact top-k by (cosine desc, id asc). ``query_ref`` is a ``ray.put``
    handle of the query vector (np.ndarray f64)."""
    import ray

    class _Score:
        def __init__(self):
            self.q = np.asarray(ray.get(query_ref), dtype=np.float64)

        def __call__(self, b: pa.Table) -> pa.Table:
            E = embedding_matrix(b, col)
            cos = _cosine_to_query(E, self.q)
            ids = b[id_col].to_numpy(zero_copy_only=False)
            # local top-k prune before the global merge
            if len(ids) > k:
                part = np.argsort(-cos, kind="stable")[:k]
            else:
                part = np.arange(len(ids))
            return pa.table({
                id_col: pa.array(ids[part]),
                "cosine": pa.array(cos[part], pa.float64()),
            })

    scored = ds.map_batches(_Score, batch_format="pyarrow", concurrency=2)
    return scored.sort(key=["cosine", id_col],
                       descending=[True, False]).limit(k)


def train_ivf_centroids(E: np.ndarray, n_lists: int, *, iters: int = 8,
                        seed: int = 11) -> np.ndarray:
    """Deterministic Lloyd k-means on (a sample of) the vectors."""
    rng = np.random.default_rng(seed)
    C = E[rng.choice(len(E), size=min(n_lists, len(E)), replace=False)].copy()
    for _ in range(iters):
        d = ((E[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for j in range(len(C)):
            m = assign == j
            if m.any():
                C[j] = E[m].mean(0)
    return C


def assign_lists_batch(batch: pa.Table, centroids_ref, *,
                       col: str = "embedding") -> pa.Table:
    import ray

    C = ray.get(centroids_ref) if not isinstance(centroids_ref, np.ndarray) \
        else centroids_ref
    E = embedding_matrix(batch, col)
    d = ((E[:, None, :] - C[None, :, :]) ** 2).sum(-1)
    return batch.append_column("ivf_list", pa.array(d.argmin(1).astype(np.int32)))


def knn_ivf(ds, query_ref, centroids_ref, k: int = 10, *, nprobe: int = 4,
            id_col: str = "vec_id", col: str = "embedding"):
    """Approximate top-k: score only the ``nprobe`` lists nearest the query.

    The list assignment is a map-side filter (broadcast centroids), so the
    scan prunes (C - nprobe)/C of the corpus before any scoring work.
    """
    import ray

    class _Probe:
        def __init__(self):
            self.q = np.asarray(ray.get(query_ref), dtype=np.float64)
            self.C = np.asarray(ray.get(centroids_ref), dtype=np.float64)
            d = ((self.C - self.q[None, :]) ** 2).sum(-1)
            self.lists = np.sort(np.argsort(d, kind="stable")[:nprobe])

        def __call__(self, b: pa.Table) -> pa.Table:
            if "ivf_list" in b.column_names:
                lists = b["ivf_list"].to_numpy(zero_copy_only=False)
            else:
                E_all = embedding_matrix(b, col)
                d = ((E_all[:, None, :] - self.C[None, :, :]) ** 2).sum(-1)
                lists = d.argmin(1)
            b = b.filter(pa.array(np.isin(lists, self.lists)))
            if b.num_rows == 0:
                return pa.table({id_col: pa.array([], pa.int64()),
                                 "cosine": pa.array([], pa.float64())})
            E = embedding_matrix(b, col)
            cos = _cosine_to_query(E, self.q)
            ids = b[id_col].to_numpy(zero_copy_only=False)
            part = np.argsort(-cos, kind="stable")[:k]
            return pa.table({id_col: pa.array(ids[part]),
                             "cosine": pa.array(cos[part], pa.float64())})

    scored = ds.map_batches(_Probe, batch_format="pyarrow", concurrency=2)
    return scored.sort(key=["cosine", id_col],
                       descending=[True, False]).limit(k)
