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
           "assign_lists_batch", "knn_ivf", "embedding_near_dup_pairs",
           "kmeans_integer", "embedding_covariance", "centroid_classify",
           "semantic_prune", "pq_recall"]


def embedding_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if len(arr) == 0:
        # Ray emits empty blocks structurally (filters, sparse maps);
        # dim is unknowable from zero rows — (0, 0) keeps every caller's
        # matmul/argsort path trivially correct for the no-rows case
        return np.empty((0, 0), dtype=np.float64)
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
    handle of the query vector (np.ndarray f64) — broadcast once; each
    task's ``ray.get`` is a local object-store hit. A stateless TASK pool
    (not actors): the per-worker state is one tiny vector, so actor-pool
    startup latency would buy nothing."""
    import ray

    def _score(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:  # structural empty block (filter/sparse map)
            return pa.table({id_col: b[id_col],
                             "cosine": pa.array([], pa.float64())})
        q = np.asarray(ray.get(query_ref), dtype=np.float64)
        E = embedding_matrix(b, col)
        cos = _cosine_to_query(E, q)
        ids = b[id_col].to_numpy(zero_copy_only=False)
        # local top-k prune before the global merge — ties broken by id
        # asc (lexsort minor key), matching the GLOBAL (cosine desc, id
        # asc) order: a stable position-order argsort could prune the
        # smaller-id row of a tied pair at the k boundary
        if len(ids) > k:
            part = np.lexsort((ids, -cos))[:k]
        else:
            part = np.arange(len(ids))
        return pa.table({
            id_col: pa.array(ids[part]),
            "cosine": pa.array(cos[part], pa.float64()),
        })

    scored = ds.map_batches(_score, batch_format="pyarrow")
    return scored.sort(key=["cosine", id_col],
                       descending=[True, False]).limit(k)


def embedding_near_dup_pairs(ds, *, threshold: float = 0.9,
                             id_col: str = "vec_id", col: str = "embedding",
                             planes: int = 32, bands: int = 4, seed: int = 23,
                             max_bucket: int | None = None,
                             num_partitions: int = 16):
    """Embedding-cosine near-duplicate pairs via random-hyperplane LSH.

    SimHash-for-vectors: sign bits of ``E @ R`` (R = ``planes`` seeded
    hyperplanes) banded into ``bands`` buckets; vectors agreeing on all
    bits of any band become candidates; candidates are verified with the
    exact f64 cosine. P[bit match] = 1 - angle/pi, so high thresholds
    collide with high probability in at least one band.

    Scale shape: band rows carry ``(band, key, id)`` ONLY — the band
    shuffle moves ids, never vectors (was: every vector replicated x
    ``bands``). Candidate pairs are hash-partition-deduped, then the two
    vectors are re-acquired through hash-partitioned ``Dataset.join``s and
    verified with a vectorized batch cosine. Recall is pytest-checked vs
    brute force.

    ``max_bucket`` is OPT-IN (None, matching the dedup operators):
    truncating a hot bucket silently drops candidate pairs (logged), so
    callers must choose that recall trade explicitly."""
    from .dedup import bucket_candidate_pairs, distinct_pairs

    if planes % bands:  # same guard as the exact sibling: a remainder
        # would reshape to the wrong row count deep inside a Ray task
        raise ValueError(f"planes ({planes}) must divide evenly into "
                         f"bands ({bands})")
    r = planes // bands
    if r > 64:
        raise ValueError("bits per band must fit an int64 key")

    def _buckets(b: pa.Table) -> pa.Table:
        E = embedding_matrix(b, col)
        rng = np.random.default_rng(seed)  # same planes in every task
        R = rng.standard_normal((E.shape[1], planes))
        bits = (E @ R) > 0
        n = len(E)
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        # vectorized band-row construction: (bands * n) rows via repeat/tile;
        # the bucket key is the band's bit pattern packed into ONE int64
        # (r <= 64) — no strings, minimal shuffle bytes
        packed = np.packbits(bits.reshape(n * bands, r), axis=1)
        padded = np.zeros((n * bands, 8), dtype=np.uint8)
        padded[:, : packed.shape[1]] = packed
        keys = padded.view(np.uint64).ravel().view(np.int64)
        return pa.table({
            "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), n)),
            "key": pa.array(keys),
            id_col: pa.array(np.repeat(ids, bands)),
        })

    banded = ds.map_batches(_buckets, batch_format="pyarrow")
    cands = bucket_candidate_pairs(
        banded, key_cols=["band", "key"], id_col=id_col,
        max_bucket=max_bucket, num_partitions=num_partitions,
        log_tag="embedding LSH")
    cands = distinct_pairs(cands, num_partitions=num_partitions)

    def _serialize(b: pa.Table) -> pa.Table:
        # acero joins reject list<float> payloads -> ship f64 row bytes
        E = embedding_matrix(b, col)
        return pa.table({
            id_col: b[id_col],
            "vec_bin": pa.array([E[i].tobytes() for i in range(len(E))],
                                pa.binary()),
        })

    from .dedup import join_pair_payload

    vecs = ds.map_batches(_serialize, batch_format="pyarrow")
    j2 = join_pair_payload(cands, vecs, id_col=id_col,
                           payload_col="vec_bin",
                           num_partitions=num_partitions)

    def _unpack(column) -> np.ndarray:
        if isinstance(column, pa.ChunkedArray):
            column = column.combine_chunks()
        raw = b"".join(column.to_pylist())
        E = np.frombuffer(raw, dtype=np.float64)
        return E.reshape(len(column), -1)

    def _verify(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            # typed empty: reuse the batch's own id types
            return pa.table({"a": b["a"], "b": b["b"],
                             "cosine": pa.array([], pa.float64())})
        Ea = _unpack(b["payload_a"])
        Eb = _unpack(b["vec_bin"])
        cos = (Ea * Eb).sum(axis=1) / (
            np.linalg.norm(Ea, axis=1) * np.linalg.norm(Eb, axis=1))
        out = pa.table({"a": b["a"], "b": b["b"],
                        "cosine": pa.array(cos, pa.float64())})
        import pyarrow.compute as pc

        return out.filter(pc.greater_equal(out["cosine"], threshold))

    return j2.map_batches(_verify, batch_format="pyarrow")


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
    if batch.num_rows == 0:  # structural empty block
        return batch.append_column("ivf_list", pa.array([], pa.int32()))
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

    def _probe(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:  # structural empty block
            return pa.table({id_col: b[id_col],
                             "cosine": pa.array([], pa.float64())})
        q = np.asarray(ray.get(query_ref), dtype=np.float64)
        C = np.asarray(ray.get(centroids_ref), dtype=np.float64)
        d = ((C - q[None, :]) ** 2).sum(-1)
        probe_lists = np.sort(np.argsort(d, kind="stable")[:nprobe])
        if "ivf_list" in b.column_names:
            lists = b["ivf_list"].to_numpy(zero_copy_only=False)
        else:
            E_all = embedding_matrix(b, col)
            d = ((E_all[:, None, :] - C[None, :, :]) ** 2).sum(-1)
            lists = d.argmin(1)
        b = b.filter(pa.array(np.isin(lists, probe_lists)))
        if b.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        E = embedding_matrix(b, col)
        cos = _cosine_to_query(E, q)
        ids = b[id_col].to_numpy(zero_copy_only=False)
        part = np.lexsort((ids, -cos))[:k]  # id-asc ties, like the sort
        return pa.table({id_col: pa.array(ids[part]),
                         "cosine": pa.array(cos[part], pa.float64())})

    scored = ds.map_batches(_probe, batch_format="pyarrow")
    return scored.sort(key=["cosine", id_col],
                       descending=[True, False]).limit(k)


def embedding_near_dup_pairs_exact(ds, *, tau_num: int = 4,
                                   tau_den: int = 5,
                                   id_col: str = "vec_id",
                                   col: str = "embedding",
                                   planes: int = 64, bands: int = 8,
                                   num_partitions: int = 16):
    """The ORACLE-EXACT companion to :func:`embedding_near_dup_pairs`:
    identical distributed shape (band shuffle of (band, key, id) rows,
    hash-partitioned pair distinct, partitioned vector re-join, verify),
    but every numeric step is integer so the WHOLE pipeline — bucketing
    included — replays bit-exactly in SQL:

    - components quantize as ``trunc(v * 1e6)`` (trunc, not round: no
      half-way ties; the f64 multiply is IEEE-identical both sides);
    - hyperplanes are deterministic +-1 matrices
      (``parity((k*73856093 + d*19349663) % 97)`` — replayable
      arithmetic; statistical quality is secondary to auditability here,
      documented);
    - band keys are integer bit-packs of the sign bits;
    - the cosine threshold tau = tau_num/tau_den verifies as
      ``dot > 0 AND tau_den^2 * dot^2 >= tau_num^2 * n2a * n2b`` in
      unbounded ints (Python int per CANDIDATE pair — the candidate set
      is orders of magnitude smaller than the corpus; SQL uses HUGEINT).

    Output: ``(a, b, dot_ab, norm2_a, norm2_b)`` for every verified pair
    — all int64."""
    from .dedup import (bucket_candidate_pairs, distinct_pairs,
                        join_pair_payload)

    if planes % bands:
        raise ValueError(f"planes ({planes}) must divide evenly into "
                         f"bands ({bands})")
    r = planes // bands
    if r > 62:
        raise ValueError("bits per band must fit an int64 key")

    def _quantize(b: pa.Table) -> np.ndarray:
        E = embedding_matrix(b, col).astype(np.float64)
        return np.trunc(E * 1e6).astype(np.int64)

    def _plane_matrix(dim: int) -> np.ndarray:
        k = np.arange(planes, dtype=np.int64)[:, None]
        d_ = np.arange(dim, dtype=np.int64)[None, :]
        par = ((k * 73856093 + d_ * 19349663) % 97) % 2
        return (1 - 2 * par).astype(np.int64)  # (planes, dim) of +-1

    def _buckets(b: pa.Table) -> pa.Table:
        Q = _quantize(b)
        P = _plane_matrix(Q.shape[1])
        bits = (Q @ P.T) > 0  # (n, planes)
        n = len(Q)
        weights = (np.int64(1) << np.arange(r, dtype=np.int64))
        keys = bits.reshape(n, bands, r).astype(np.int64) @ weights
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), n)),
            "key": pa.array(keys.ravel()),
            id_col: pa.array(np.repeat(ids, bands)),
        })

    banded = ds.map_batches(_buckets, batch_format="pyarrow")
    cands = bucket_candidate_pairs(
        banded, key_cols=["band", "key"], id_col=id_col,
        max_bucket=None, num_partitions=num_partitions,
        log_tag="exact embedding LSH")
    cands = distinct_pairs(cands, num_partitions=num_partitions)

    def _serialize(b: pa.Table) -> pa.Table:
        Q = _quantize(b)
        return pa.table({
            id_col: b[id_col],
            "vec_bin": pa.array([Q[i].tobytes() for i in range(len(Q))],
                                pa.binary()),
        })

    vecs = ds.map_batches(_serialize, batch_format="pyarrow")
    j2 = join_pair_payload(cands, vecs, id_col=id_col,
                           payload_col="vec_bin",
                           num_partitions=num_partitions)

    tn2, td2 = tau_num * tau_num, tau_den * tau_den

    def _unpack_i64(column) -> np.ndarray:
        if isinstance(column, pa.ChunkedArray):
            column = column.combine_chunks()
        raw = b"".join(column.to_pylist())
        Q = np.frombuffer(raw, dtype=np.int64)
        return Q.reshape(len(column), -1)

    def _verify(b: pa.Table) -> pa.Table:
        empty = pa.table({"a": b["a"].slice(0, 0), "b": b["b"].slice(0, 0),
                          "dot_ab": pa.array([], pa.int64()),
                          "norm2_a": pa.array([], pa.int64()),
                          "norm2_b": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        Qa = _unpack_i64(b["payload_a"])
        Qb = _unpack_i64(b["vec_bin"])
        dab = (Qa * Qb).sum(axis=1)
        n2a = (Qa * Qa).sum(axis=1)
        n2b = (Qb * Qb).sum(axis=1)
        # exact threshold in unbounded ints (dot^2 overflows int64)
        keep = np.fromiter(
            (int(d) > 0 and td2 * int(d) * int(d)
             >= tn2 * int(x) * int(y)
             for d, x, y in zip(dab.tolist(), n2a.tolist(), n2b.tolist())),
            dtype=bool, count=len(dab))
        t = pa.table({"a": b["a"], "b": b["b"],
                      "dot_ab": pa.array(dab), "norm2_a": pa.array(n2a),
                      "norm2_b": pa.array(n2b)})
        return t.filter(pa.array(keep))

    return j2.map_batches(_verify, batch_format="pyarrow")


def kmeans_integer(ds, *, k: int = 4, updates: int = 2, scale: int = 1000,
                   id_col: str = "vec_id", col: str = "embedding",
                   num_partitions: int = 4, centroids_only: bool = False):
    """Integer Lloyd k-means over an embedding column — the clustering
    workhorse behind IVF index builds, dataset balancing and topic
    bucketing — made bit-deterministic so the WHOLE iteration replays in
    SQL: components quantize as ``trunc(v * scale)`` (int64), distances
    are exact integer cross products, argmin ties break to the smallest
    cluster id, and centroid updates are elementwise TRUNCATING division
    toward zero — DuckDB's integer ``//`` semantic, NOT Python's floor —
    (empty clusters keep their previous centroid).

    Init: clusters 0..k-1 seed from the vectors with ``id < k``
    (documented contract: those ids exist — true for the 0-based corpus).

    Distributed shape per round: centroids broadcast via ``ray.put``
    (k x d ints), map-side per-cluster partial sums + counts
    (``np.add.at``, one k*d-row partial per block), hashpart merge of the
    constant-size partials, driver update of the k x d array. The
    quantized input is materialized ONCE and re-scanned per round — the
    standard iterative-ML residency assumption (at 100 TB the embedding
    projection, not the corpus, is what must fit the aggregate object
    store; it spills if not).

    Returns the FINAL assignment ``(vec_id, cluster, d2)`` after
    ``updates`` centroid updates (i.e. ``updates + 1`` assignment
    passes, matching the SQL unroll).
    """
    import ray

    from .graph import grouped_sum_parts

    if k < 1 or updates < 0:
        raise ValueError(f"need k >= 1, updates >= 0; got {k}, {updates}")

    def _q(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:  # structural empty block
            return pa.table({id_col: b[id_col],
                             "v": pa.array([], pa.list_(pa.int64()))})
        E = embedding_matrix(b, col)
        Q = np.trunc(E * scale).astype(np.int64)
        flat = pa.array(Q.ravel())
        off = pa.array(np.arange(0, (len(Q) + 1) * Q.shape[1],
                                 Q.shape[1], dtype=np.int32))
        return pa.table({id_col: b[id_col],
                         "v": pa.ListArray.from_arrays(off, flat)})

    qds = ds.map_batches(_q, batch_format="pyarrow").materialize()

    def _qmat(b: pa.Table) -> np.ndarray:
        arr = b["v"]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        flat = arr.flatten().to_numpy(zero_copy_only=False)
        return flat.reshape(len(arr), -1).astype(np.int64)

    seeds = qds.filter(expr=f"{id_col} < {k}").take_all()
    if len(seeds) != k:
        raise ValueError(f"init needs ids 0..{k - 1}; found {len(seeds)}")
    seeds.sort(key=lambda r: r[id_col])
    C = np.array([r["v"] for r in seeds], dtype=np.int64)
    d = C.shape[1]

    def _assign(Q: np.ndarray, Cm: np.ndarray):
        qq = np.einsum("ij,ij->i", Q, Q)
        cc = np.einsum("ij,ij->i", Cm, Cm)
        d2 = qq[:, None] + cc[None, :] - 2 * (Q @ Cm.T)
        a = np.argmin(d2, axis=1)  # ties -> smallest cluster id
        return a, d2[np.arange(len(a)), a]

    for _ in range(updates):
        cref = ray.put(C)

        def _partial(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:  # structural empty block
                return pa.table({"k": pa.array([], pa.int64()),
                                 "i": pa.array([], pa.int64()),
                                 "s": pa.array([], pa.int64()),
                                 "n": pa.array([], pa.int64())})
            Cm = ray.get(cref)
            Q = _qmat(b)
            a, _d2 = _assign(Q, Cm)
            sums = np.zeros((k, d), np.int64)
            np.add.at(sums, a, Q)
            n = np.bincount(a, minlength=k).astype(np.int64)
            ks = np.repeat(np.arange(k, dtype=np.int64), d)
            return pa.table({
                "k": pa.array(ks),
                "i": pa.array(np.tile(np.arange(d, dtype=np.int64), k)),
                "s": pa.array(sums.ravel()),
                "n": pa.array(np.repeat(n, d))})

        cells = grouped_sum_parts(
            qds.map_batches(_partial, batch_format="pyarrow"),
            ["k", "i"], ["s", "n"], count_col=None, fanin=2)
        newC = C.copy()
        for row in cells.take_all():  # k*d rows: bounded constant
            if row["n"] > 0:
                s, nn = row["s"], row["n"]
                # trunc toward zero (DuckDB //), not Python floor
                newC[row["k"], row["i"]] = (s // nn if s >= 0
                                            else -((-s) // nn))
        C = newC

    if centroids_only:  # PQ/IVF codebook training: k x d ints, no assign pass
        return C

    cref = ray.put(C)

    def _final(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:  # structural empty block
            return pa.table({id_col: b[id_col],
                             "cluster": pa.array([], pa.int64()),
                             "d2": pa.array([], pa.int64())})
        Cm = ray.get(cref)
        Q = _qmat(b)
        a, d2 = _assign(Q, Cm)
        return pa.table({id_col: b[id_col],
                         "cluster": pa.array(a.astype(np.int64)),
                         "d2": pa.array(d2.astype(np.int64))})

    return qds.map_batches(_final, batch_format="pyarrow")


def embedding_covariance(ds, *, scale: int = 1000, col: str = "embedding",
                         fanin: int = 4):
    """Exact integer covariance / Gram statistics of an embedding
    column: for every dimension pair (i <= j, 1-based), the sufficient
    statistics ``(n, sxy, sx, sy)`` over trunc-quantized components
    ``trunc(v·scale)`` and the exact covariance numerator
    ``cov_num = n·sxy − sx·sy`` (cov = cov_num/n², the one pinned IEEE
    division). The input to PCA whitening, feature-redundancy pruning
    and drift monitors — computed without ever centering the data.

    Scale shape: a pure mergeable aggregation — each block contributes
    ONE d×d partial Gram via a float64 matmul (exact while per-cell
    sums stay under 2^53 — asserted per block; quantized cents-scale
    components keep products ~1e7, so ~1e8 rows/block fit) flattened to
    (i, j, partial) rows, then the standard hashpart grouped sum over
    d(d+1)/2 keys. No shuffle of vectors, no driver materialization
    beyond the d×d result.

    SQL restatement: 1-based list indexing over a dim range join + the
    same integer sums."""
    from .graph import grouped_sum_parts

    def _partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({
                "i": pa.array([], pa.int64()),
                "j": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "sxy": pa.array([], pa.int64()),
                "sx": pa.array([], pa.int64()),
                "sy": pa.array([], pa.int64()),
            })
        E = embedding_matrix(b, col)
        Q = np.trunc(E * scale)  # float64 holding exact integers
        n, d = Q.shape
        G = Q.T @ Q
        assert np.abs(G).max() < 2**53, \
            "embedding_covariance: partial Gram exceeds exact f64 range"
        s = Q.sum(axis=0)
        assert np.abs(s).max() < 2**53
        iu, ju = np.triu_indices(d)
        ones = np.full(len(iu), n, dtype=np.int64)
        return pa.table({
            "i": pa.array(iu.astype(np.int64) + 1),
            "j": pa.array(ju.astype(np.int64) + 1),
            "n": pa.array(ones),
            "sxy": pa.array(G[iu, ju].astype(np.int64)),
            "sx": pa.array(s[iu].astype(np.int64)),
            "sy": pa.array(s[ju].astype(np.int64)),
        })

    parts = ds.map_batches(_partial, batch_format="pyarrow")
    summed = grouped_sum_parts(parts, ["i", "j"],
                               ["n", "sxy", "sx", "sy"],
                               count_col=None, fanin=fanin)

    def _finalize(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        sxy = b["sxy"].to_numpy(zero_copy_only=False).astype(np.int64)
        sx = b["sx"].to_numpy(zero_copy_only=False).astype(np.int64)
        sy = b["sy"].to_numpy(zero_copy_only=False).astype(np.int64)
        # exact arbitrary-precision numerator: n*sxy and sx*sy overflow
        # int64 well inside the docstring's supported scale (n ~ 1e7 x
        # sxy ~ 1e13 -> 1e20 >> 2^63) — the <= d(d+1)/2 rows here are a
        # bounded driver-side-sized table, so Python ints cost nothing
        # (the same reasoning as the exact near-dup verify's dot^2)
        num_py = [int(a) * int(bb) - int(c) * int(dd)
                  for a, bb, c, dd in zip(n, sxy, sx, sy)]
        if all(-2**63 <= v < 2**63 for v in num_py):
            num = np.array(num_py, dtype=np.int64)
        else:
            raise OverflowError(
                "embedding_covariance: cov numerator exceeds int64; "
                "lower `scale` or center the embeddings first")
        ok = n > 0
        cov = np.where(ok, num / np.where(ok, (n * n).astype(np.float64),
                                          1.0), np.nan)
        return pa.table({
            "i": b["i"], "j": b["j"], "n": b["n"],
            "sxy": b["sxy"], "sx": b["sx"], "sy": b["sy"],
            "cov_num": pa.array(num),
            "cov": pa.array(np.nan_to_num(cov), pa.float64(), mask=~ok),
        })

    return summed.map_batches(_finalize, batch_format="pyarrow")


def centroid_classify(ds, *, scale: int = 1000, id_col: str = "vec_id",
                      col: str = "embedding", label_col: str = "label",
                      holdout_mod: int = 5, fanin: int = 2):
    """Nearest-centroid (Rocchio) classification over a labeled
    embedding column — the supervised companion to ``kmeans_integer``,
    bit-deterministic end to end: rows with ``id % holdout_mod != 0``
    train per-label integer centroids (trunc-quantized components,
    elementwise truncating division — DuckDB ``//``), held-out rows
    (``id % holdout_mod == 0``) classify to the centroid with the
    smallest exact integer squared distance, ties to the smallest label.

    Scale shape: train side collapses to |labels|·d mergeable partial
    sums per block (one hashpart grouped sum of a BOUNDED key space);
    the centroid matrix broadcasts via ``ray.put``; the classify pass is
    one shuffle-free ``map_batches``. Returns per-test-row
    ``(vec_id, label, pred, d2)``.
    """
    import ray

    from .graph import grouped_sum_parts

    def _train_part(b: pa.Table) -> pa.Table:
        empty = pa.table({"label": pa.array([], pa.int64()),
                          "i": pa.array([], pa.int64()),
                          "s": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        train = ids % holdout_mod != 0
        if not train.any():
            return empty
        Q = np.trunc(embedding_matrix(b, col) * scale).astype(
            np.int64)[train]
        lab = b[label_col].to_numpy(zero_copy_only=False).astype(
            np.int64)[train]
        d = Q.shape[1]
        ul, codes = np.unique(lab, return_inverse=True)
        sums = np.zeros((len(ul), d), np.int64)
        np.add.at(sums, codes, Q)
        n = np.bincount(codes, minlength=len(ul)).astype(np.int64)
        return pa.table({
            "label": pa.array(np.repeat(ul, d)),
            "i": pa.array(np.tile(np.arange(d, dtype=np.int64), len(ul))),
            "s": pa.array(sums.ravel()),
            "n": pa.array(np.repeat(n, d)),
        })

    parts = ds.map_batches(_train_part, batch_format="pyarrow")
    cells = grouped_sum_parts(parts, ["label", "i"], ["s", "n"],
                              count_col=None, fanin=fanin)
    rows = cells.take_all()  # |labels| x d rows: bounded constant
    if not rows:
        raise ValueError("centroid_classify: no training rows")
    labels = np.array(sorted({r["label"] for r in rows}), dtype=np.int64)
    lpos = {int(l): p for p, l in enumerate(labels)}
    d = 1 + max(r["i"] for r in rows)
    C = np.zeros((len(labels), d), np.int64)
    for r in rows:
        s, nn = int(r["s"]), int(r["n"])
        # trunc toward zero (DuckDB //), not Python floor
        C[lpos[int(r["label"])], r["i"]] = (s // nn if s >= 0
                                            else -((-s) // nn))
    cref = ray.put((labels, C))

    def _classify(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "label": pa.array([], pa.int64()),
                             "pred": pa.array([], pa.int64()),
                             "d2": pa.array([], pa.int64())})
        labs, Cm = ray.get(cref)
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        test = ids % holdout_mod == 0
        Q = np.trunc(embedding_matrix(b, col) * scale).astype(
            np.int64)[test]
        lab = b[label_col].to_numpy(zero_copy_only=False).astype(
            np.int64)[test]
        qq = np.einsum("ij,ij->i", Q, Q)
        cc = np.einsum("ij,ij->i", Cm, Cm)
        d2 = qq[:, None] + cc[None, :] - 2 * (Q @ Cm.T)
        a = np.argmin(d2, axis=1)  # labs sorted -> ties hit smallest
        return pa.table({
            "vec_id": pa.array(ids[test]),
            "label": pa.array(lab),
            "pred": pa.array(labs[a]),
            "d2": pa.array(d2[np.arange(len(a)), a]),
        })

    return ds.map_batches(_classify, batch_format="pyarrow")


def semantic_prune(assigned, *, keep: int = 32):
    """SemDeDup-style semantic pruning: from a ``kmeans_integer``
    assignment ``(vec_id, cluster, d2)``, keep the ``keep`` rows closest
    to each centroid (rank by ``d2`` asc, id asc) — the deterministic
    skeleton of cluster-based dataset pruning. Block-local per-cluster
    prune bounds every group's final sort at ``keep × blocks`` rows;
    clusters are the bounded key space of the one shuffle."""
    import pyarrow.compute as pc

    def _local(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        idx = pc.sort_indices(b, sort_keys=[
            ("cluster", "ascending"), ("d2", "ascending"),
            ("vec_id", "ascending")])
        t = b.take(idx)
        cl = t["cluster"].to_numpy(zero_copy_only=False)
        starts = np.r_[0, 1 + np.flatnonzero(cl[1:] != cl[:-1])]
        pos = np.arange(len(cl)) - np.repeat(
            starts, np.diff(np.r_[starts, len(cl)]))
        return t.filter(pa.array(pos < keep))

    def _final(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "cluster": pa.array([], pa.int64()),
                             "d2": pa.array([], pa.int64()),
                             "rk": pa.array([], pa.int64())})
        idx = pc.sort_indices(g, sort_keys=[("d2", "ascending"),
                                            ("vec_id", "ascending")])
        t = g.take(idx).slice(0, keep)
        return pa.table({"vec_id": t["vec_id"], "cluster": t["cluster"],
                         "d2": t["d2"],
                         "rk": pa.array(np.arange(1, t.num_rows + 1,
                                                  dtype=np.int64))})

    return (assigned.map_batches(_local, batch_format="pyarrow")
            .groupby("cluster").map_groups(_final,
                                           batch_format="pyarrow"))


def pq_recall(ds, *, n_sub: int = 4, k: int = 4, updates: int = 1,
              scale: int = 1000, n_queries: int = 8,
              id_col: str = "vec_id", col: str = "embedding",
              num_partitions: int = 4):
    """Product-quantization top-1 recall audit (Jegou et al. 2011 —
    the FAISS-style memory-scaling path for ANN): the embedding space
    splits into ``n_sub`` contiguous subspaces, each trained with the
    SAME bit-deterministic integer Lloyd kmeans as
    :func:`kmeans_integer` (``centroids_only=True``); every vector is
    coded by its per-subspace nearest centroid, and queries score
    candidates with the exact ADC (asymmetric distance computation)
    lookup — sum over subspaces of the integer d2 between the query
    subvector and the candidate's codeword. Output: per query (ids
    ``< n_queries``, self excluded) the ADC top-1, the exact-distance
    top-1 over the same quantized vectors, and the hit flag — the
    recall measurement that decides a PQ deployment.

    Distributed shape: ``n_sub`` small codebook trainings (each the
    kmeans partial-sum pattern; codebooks are k x d/n_sub ints held on
    the driver and broadcast ONCE with the per-query LUTs — n_queries x
    k x n_sub ints), then ONE streaming pass codes every vector and
    emits only each block's per-query best (adc, exact) rows
    (<= n_queries rows per block); a tiny final merge picks the global
    argmin with (distance, id) tie-breaks. Vectors never shuffle.
    """
    import ray

    if n_sub < 1 or k < 1 or n_queries < 1:
        raise ValueError("n_sub, k, n_queries must be >= 1")

    first = ds.take(1)
    if not first:
        raise ValueError("pq_recall: empty dataset")
    d = len(first[0][col])
    if d % n_sub:
        raise ValueError(f"dim {d} not divisible by n_sub {n_sub}")
    dsub = d // n_sub

    def _q(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({id_col: b[id_col],
                             "v": pa.array([], pa.list_(pa.int64()))})
        E = embedding_matrix(b, col)
        Qm = np.trunc(E * scale).astype(np.int64)
        off = pa.array(np.arange(0, (len(Qm) + 1) * Qm.shape[1],
                                 Qm.shape[1], dtype=np.int32))
        return pa.table({id_col: b[id_col],
                         "v": pa.ListArray.from_arrays(
                             off, pa.array(Qm.ravel()))})

    # ONE quantized materialization feeds every subspace's training AND
    # the final scoring pass (was: 4 independent kmeans_integer calls =
    # 4 materializations + 4 partial passes per update)
    qds = ds.map_batches(_q, batch_format="pyarrow").materialize()

    def _qmat(b: pa.Table) -> np.ndarray:
        arr = b["v"]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        flat = arr.flatten().to_numpy(zero_copy_only=False)
        return flat.reshape(len(arr), -1).astype(np.int64)

    seeds = qds.filter(expr=f"{id_col} < {k}").take_all()
    if len(seeds) != k:
        raise ValueError(f"init needs ids 0..{k - 1}; found {len(seeds)}")
    seeds.sort(key=lambda r: r[id_col])
    S0 = np.array([r["v"] for r in seeds], dtype=np.int64)
    books = [np.ascontiguousarray(S0[:, s * dsub:(s + 1) * dsub])
             for s in range(n_sub)]

    def _sub_d2(A, B):
        aa = np.einsum("ij,ij->i", A, A)
        bb = np.einsum("ij,ij->i", B, B)
        return aa[:, None] + bb[None, :] - 2 * (A @ B.T)

    from .graph import grouped_sum_parts

    for _ in range(updates):
        cref = ray.put(books)

        def _partial(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.table({"sub": pa.array([], pa.int64()),
                                 "k": pa.array([], pa.int64()),
                                 "i": pa.array([], pa.int64()),
                                 "s": pa.array([], pa.int64()),
                                 "n": pa.array([], pa.int64())})
            Cs = ray.get(cref)
            Qm = _qmat(b)
            subs, ks, iis, ss, ns = [], [], [], [], []
            for si, Cm in enumerate(Cs):  # n_sub is a small constant
                sub = Qm[:, si * dsub:(si + 1) * dsub]
                a = np.argmin(_sub_d2(sub, Cm), axis=1)
                sums = np.zeros((k, dsub), np.int64)
                np.add.at(sums, a, sub)
                n = np.bincount(a, minlength=k).astype(np.int64)
                subs.append(np.full(k * dsub, si, np.int64))
                ks.append(np.repeat(np.arange(k, dtype=np.int64), dsub))
                iis.append(np.tile(np.arange(dsub, dtype=np.int64), k))
                ss.append(sums.ravel())
                ns.append(np.repeat(n, dsub))
            return pa.table({"sub": pa.array(np.concatenate(subs)),
                             "k": pa.array(np.concatenate(ks)),
                             "i": pa.array(np.concatenate(iis)),
                             "s": pa.array(np.concatenate(ss)),
                             "n": pa.array(np.concatenate(ns))})

        cells = grouped_sum_parts(
            qds.map_batches(_partial, batch_format="pyarrow"),
            ["sub", "k", "i"], ["s", "n"], count_col=None, fanin=2)
        newbooks = [c.copy() for c in books]
        for row in cells.take_all():  # n_sub*k*dsub rows: bounded
            if row["n"] > 0:
                sv, nn = row["s"], row["n"]
                # trunc toward zero (DuckDB //), not Python floor —
                # same contract as kmeans_integer
                newbooks[row["sub"]][row["k"], row["i"]] = (
                    sv // nn if sv >= 0 else -((-sv) // nn))
        books = newbooks

    # bounded driver read: the n_queries query vectors, already
    # quantized inside qds
    qrows = qds.filter(expr=f"{id_col} < {n_queries}").take_all()
    qrows.sort(key=lambda r: r[id_col])
    qids = np.array([r[id_col] for r in qrows], np.int64)
    Qq = np.array([r["v"] for r in qrows], dtype=np.int64)
    luts = np.stack([_sub_d2(Qq[:, s * dsub:(s + 1) * dsub], books[s])
                     for s in range(n_sub)])  # (n_sub, n_q, k)
    bref = ray.put((books, luts, qids, Qq))
    I64MAX = np.iinfo(np.int64).max

    def _score(b: pa.Table) -> pa.Table:
        empty = pa.table({
            "qid": pa.array([], pa.int64()),
            "adc_id": pa.array([], pa.int64()),
            "adc_d2": pa.array([], pa.int64()),
            "exact_id": pa.array([], pa.int64()),
            "exact_d2": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        Cb, Lut, qi, Qm = ray.get(bref)
        Q = _qmat(b)  # already-quantized ints from qds
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        nq = len(qi)
        adc = np.zeros((len(Q), nq), np.int64)
        for s in range(len(Cb)):
            sub = Q[:, s * dsub:(s + 1) * dsub]
            codes = np.argmin(_sub_d2(sub, Cb[s]), axis=1)
            adc += Lut[s][:, codes].T  # (n, nq)
        exact = _sub_d2(Q, Qm)  # (n, nq)
        self_m = ids[:, None] == qi[None, :]
        adc[self_m] = I64MAX
        exact[self_m] = I64MAX
        out = {"qid": [], "adc_id": [], "adc_d2": [],
               "exact_id": [], "exact_d2": []}
        for j in range(nq):  # n_queries is a small constant
            aj = np.lexsort((ids, adc[:, j]))[0]
            ej = np.lexsort((ids, exact[:, j]))[0]
            if adc[aj, j] == I64MAX:  # block held only the query itself
                continue
            out["qid"].append(int(qi[j]))
            out["adc_id"].append(int(ids[aj]))
            out["adc_d2"].append(int(adc[aj, j]))
            out["exact_id"].append(int(ids[ej]))
            out["exact_d2"].append(int(exact[ej, j]))
        return pa.table({n: pa.array(v, pa.int64())
                         for n, v in out.items()})

    def _merge(g: pa.Table) -> pa.Table:
        qid = g["qid"][0]
        a_d2 = g["adc_d2"].to_numpy(zero_copy_only=False)
        a_id = g["adc_id"].to_numpy(zero_copy_only=False)
        e_d2 = g["exact_d2"].to_numpy(zero_copy_only=False)
        e_id = g["exact_id"].to_numpy(zero_copy_only=False)
        ai = np.lexsort((a_id, a_d2))[0]
        ei = np.lexsort((e_id, e_d2))[0]
        return pa.table({
            "qid": pa.array([qid.as_py()], pa.int64()),
            "adc_id": pa.array([int(a_id[ai])], pa.int64()),
            "adc_d2": pa.array([int(a_d2[ai])], pa.int64()),
            "exact_id": pa.array([int(e_id[ei])], pa.int64()),
            "exact_d2": pa.array([int(e_d2[ei])], pa.int64()),
            "hit": pa.array([int(a_id[ai] == e_id[ei])], pa.int64())})

    return (qds.map_batches(_score, batch_format="pyarrow")
            .groupby("qid").map_groups(_merge, batch_format="pyarrow"))
