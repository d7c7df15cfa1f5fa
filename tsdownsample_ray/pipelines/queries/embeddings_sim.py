"""Embedding similarity search (brute kNN, IVF, LSH near-dup).

Split from the former pipelines/queries.py monolith (r4 verdict
next-round #5); statement order inside this module is the original
file order. Explicit cross-module imports are generated: backward
dependencies at the top, forward (function-body-only) dependencies at
the bottom so package import order stays acyclic.
"""
from __future__ import annotations

from ._shared import _rd, _read_parquet_clean, np, pc

# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------

def q_token_count_bpeish(sf_dir: str):
    """BPE-ish regex token count (compiled pattern in an actor pool)."""
    rd = _rd()
    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    from ...stages.textstats import BpeishTokenizer

    return ds.map_batches(BpeishTokenizer, batch_format="pyarrow",
                          concurrency=(1, 8))


def q_embedding_near_dups(sf_dir: str):
    """Embedding-cosine near-dup pairs via random-hyperplane LSH + exact
    verification (rows-only; recall vs brute force pytest-checked)."""
    import ray.data as rd

    from ...stages.similarity import embedding_near_dup_pairs

    ds = _read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    # the synthetic embeddings' strongest pair sits just above 0.5;
    # 8-bit band keys keep buckets selective (r=4 made every bucket a
    # quadratic hot spot at scale); at this low a cosine LSH recall is
    # partial by design — the >=0.9-recall contract is pytest-pinned at
    # near-dup-grade thresholds where P[band match] is high
    # max_bucket is an explicit opt-in here (the operator default is None):
    # bounds pathological buckets to O(512^2) pair emission, trading a
    # logged slice of recall — acceptable for this already-partial-recall
    # low-threshold sweep
    return embedding_near_dup_pairs(ds, threshold=0.5, planes=128, bands=16,
                                    max_bucket=512, num_partitions=4)


def q_knn_embeddings(sf_dir: str):
    """Brute-force cosine top-10 for the vec_id=0 query vector."""
    import ray
    import ray.data as rd

    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qvec = np.asarray(t.filter(pc.equal(t["vec_id"], 0))["embedding"][0].as_py(),
                      dtype=np.float64)
    ds = _read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    ds = ds.filter(expr="vec_id > 0")
    from ...stages.similarity import knn_bruteforce

    top = knn_bruteforce(ds, ray.put(qvec), k=10).to_pandas()
    top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
    return top[["vec_id", "rank"]]


def q_knn_ivf_embeddings(sf_dir: str):
    """IVF (clustered) top-10 through the full IVF machinery — seeded
    k-means training, list assignment, probe-filtered scoring, global merge
    — run here with ``nprobe == n_lists`` (exhaustive probing) so the
    result provably equals exact brute force and the driver row is
    HASH-checkable against the same SQL oracle as ``knn_embeddings``.
    The approximate regime (``nprobe < n_lists``) is pytest-pinned: recall
    >= 0.9 at nprobe=4 with zero false positives
    (tests/test_embedding_neardup_bpeish.py)."""
    import ray
    import ray.data as rd

    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    from ...stages.similarity import embedding_matrix, knn_ivf, train_ivf_centroids

    E = embedding_matrix(t)
    ids = t["vec_id"].to_numpy()
    qvec = E[ids == 0][0]
    C = train_ivf_centroids(E[:512], n_lists=8)
    ds = _read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"]).filter(expr="vec_id > 0")
    top = knn_ivf(ds, ray.put(qvec), ray.put(C), k=10, nprobe=8).to_pandas()
    top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
    return top[["vec_id", "rank"]]


