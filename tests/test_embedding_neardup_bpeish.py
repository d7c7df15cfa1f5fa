"""Embedding-cosine near-dup recall vs brute force; BPE-ish token counts;
n-gram language-ID fallback."""

import numpy as np
import pyarrow as pa


def test_embedding_near_dup_recall(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.similarity import embedding_near_dup_pairs

    rng = np.random.default_rng(6)
    base = rng.standard_normal((40, 32))
    # create 10 near-duplicate rows (tiny perturbations of the first 10)
    near = base[:10] + rng.standard_normal((10, 32)) * 0.05
    E = np.vstack([base, near])
    t = pa.table({
        "vec_id": pa.array(np.arange(50), pa.int64()),
        "embedding": pa.array(E.astype(np.float32).tolist(),
                              pa.list_(pa.float32())),
    })
    # num_partitions small: each join reserves ~0.125 CPU per aggregator
    # and the 4-cpu test session must keep slots free for map tasks
    got = embedding_near_dup_pairs(
        rd.from_arrow(t).repartition(1), threshold=0.95, planes=64, bands=8,
        num_partitions=4,
    ).to_pandas()
    found = {(r.a, r.b) for r in got.itertuples()}

    # brute-force ground truth
    Ef = E.astype(np.float64)
    N = Ef / np.linalg.norm(Ef, axis=1, keepdims=True)
    C = N @ N.T
    truth = {(i, j) for i in range(50) for j in range(i + 1, 50)
             if C[i, j] >= 0.95}
    assert truth, "test setup must contain true near-dups"
    recall = len(found & truth) / len(truth)
    assert recall >= 0.9, (recall, truth - found)
    assert found <= truth  # verification step guarantees no false positives


def test_bpeish_tokenizer():
    from tsdownsample_ray.stages.textstats import BpeishTokenizer

    tok = BpeishTokenizer()
    assert tok.count("hello world") == 2      # ' world' merges the space
    assert tok.count("it's 2024, ok!") == 6   # it / 's / ' 2024' / ',' / ' ok' / '!'
    assert tok.count("") == 0
    t = pa.table({"doc_id": [1], "text": ["a b c"]})
    out = tok(t)
    assert out["n_bpeish_tokens"][0].as_py() == 3


def test_langid_ngram_fallback():
    from tsdownsample_ray.stages.textstats import LangId

    li = LangId()
    # no stopwords present -> the char n-gram profiles decide
    t = pa.table({"doc_id": [1, 2], "text": [
        "thinking bathing weathered",       # th/ing-heavy -> en
        "schönes mädchen brauchen suchen",  # sch/ch/en-heavy -> de
    ]})
    preds = li(t)["lang_pred"].to_pylist()
    assert preds[0] == "en"
    assert preds[1] == "de"


def test_embedding_near_dup_exact_finds_planted(ray_session):
    """Integer-exact LSH variant: planted near-copies are found, every
    reported pair truly clears the cross-multiplied threshold, and no
    non-planted pair sneaks in (the base vectors are near-orthogonal)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from tsdownsample_ray.stages.similarity import (
        embedding_near_dup_pairs_exact)

    rng = np.random.default_rng(17)
    n, dim = 80, 32
    E = rng.standard_normal((n, dim)).astype(np.float32)
    ids = list(range(n))
    # plant 8 near-copies (slight scale + tiny noise on one component)
    extra, eids = [], []
    for i in range(0, 80, 10):
        v = E[i].astype(np.float64) * 0.9
        v[1] += 0.05
        extra.append(v.astype(np.float32))
        eids.append(1000 + i)
    allE = np.concatenate([E, np.stack(extra)])
    flat = pa.array(allE.ravel())
    off = pa.array(np.arange(0, (len(allE) + 1) * dim, dim,
                             dtype=np.int32))
    t = pa.table({"vec_id": ids + eids,
                  "embedding": pa.ListArray.from_arrays(off, flat)})
    out = embedding_near_dup_pairs_exact(
        rd.from_arrow(t).repartition(3), tau_num=4, tau_den=5,
        planes=64, bands=8, num_partitions=2).to_pandas()
    pairs = set(zip(out["a"], out["b"]))
    planted = {(i, 1000 + i) for i in range(0, 80, 10)}
    assert len(pairs & planted) >= 7  # recall >= 7/8 at this geometry
    # soundness: every reported pair clears the exact threshold
    for _, r in out.iterrows():
        d, na, nb = int(r["dot_ab"]), int(r["norm2_a"]), int(r["norm2_b"])
        assert d > 0 and 25 * d * d >= 16 * na * nb
    assert not (pairs - planted)  # no false pair among near-orthogonal base


def test_kmeans_integer_vs_replay(ray_session):
    """kmeans_integer == a straight numpy Lloyd replay with the same
    deterministic rules (trunc quantize, first-index argmin, trunc-div
    centroid update), on any partitioning."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from tsdownsample_ray.stages.similarity import kmeans_integer

    rng = np.random.default_rng(3)
    n, d, k, updates = 120, 8, 3, 2
    E = rng.standard_normal((n, d)).astype(np.float32)
    t = pa.table({"vec_id": pa.array(np.arange(n, dtype=np.int64)),
                  "embedding": pa.array(list(E))})
    out = kmeans_integer(rd.from_arrow(t).repartition(5), k=k,
                         updates=updates, scale=1000,
                         num_partitions=2).to_pandas()
    out = out.sort_values("vec_id").reset_index(drop=True)

    Q = np.trunc(E.astype(np.float64) * 1000).astype(np.int64)
    C = Q[:k].copy()

    def assign(Q, C):
        qq = np.einsum("ij,ij->i", Q, Q)
        cc = np.einsum("ij,ij->i", C, C)
        d2 = qq[:, None] + cc[None, :] - 2 * (Q @ C.T)
        a = np.argmin(d2, axis=1)
        return a, d2[np.arange(n), a]

    for _ in range(updates):
        a, _ = assign(Q, C)
        for kk in range(k):
            m = a == kk
            if m.any():
                s = Q[m].sum(axis=0)
                nn = int(m.sum())
                C[kk] = np.where(s >= 0, s // nn, -((-s) // nn))
    a, d2 = assign(Q, C)
    assert list(out["cluster"]) == list(a)
    assert list(out["d2"]) == list(d2)
    # all k clusters in use on gaussian data
    assert out["cluster"].nunique() == k
