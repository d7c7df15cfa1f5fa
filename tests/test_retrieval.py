"""Hybrid retrieval (lexical + vector candidates, RRF fusion)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _docs_table():
    texts = [
        "hash join merge",          # all three → strong lexical
        "sort scan sort scan",      # tf=2 for two terms
        "join",                     # single hit
        "nothing relevant here",    # no hits → absent from lexical side
        "merge merge merge merge",  # heavy single-term
    ]
    return pa.table({"doc_id": pa.array(range(1, 6), pa.int64()),
                     "text": pa.array(texts)})


def test_lexical_scores_match_counts(ray_session):
    import ray

    from tsdownsample_ray.stages.retrieval import (lexical_scores,
                                                   query_term_df)

    terms = ["hash", "join", "merge", "sort", "scan"]
    ds = ray.data.from_arrow(_docs_table()).repartition(3)
    df = query_term_df(ds, terms)
    assert df.tolist() == [1, 2, 2, 1, 1]
    w = (np.int64(5) * 1000) // (df + 1)
    out = (lexical_scores(ds, terms, w).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    # doc 4 has no query terms -> absent
    assert out["doc_id"].tolist() == [1, 2, 3, 5]
    exp = {1: w[0] + w[1] + w[2], 2: 2 * w[3] + 2 * w[4], 3: w[1],
           5: 4 * w[2]}
    assert dict(zip(out["doc_id"], out["lex_score"])) == exp


def test_vector_scores_and_topk_partition_invariant(ray_session):
    import ray

    from tsdownsample_ray.stages.retrieval import topk_side, vector_scores

    rng = np.random.default_rng(3)
    n, d = 40, 8
    E = rng.normal(size=(n, d)).astype(np.float32)
    q = rng.normal(size=d)
    tbl = pa.table({
        "vec_id": pa.array(range(1, n + 1), pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(E.reshape(-1), pa.float32()), d)})
    Qi = np.trunc(E.astype(np.float64) * 1000).astype(np.int64)
    qi = np.trunc(q * 1000).astype(np.int64)
    dots = Qi @ qi
    order = np.lexsort((np.arange(1, n + 1), -dots))
    expect = [(int(i + 1), int(dots[i])) for i in order[:10]]

    for nparts in (1, 4):
        ds = ray.data.from_arrow(tbl).repartition(nparts)
        top = topk_side(vector_scores(ds, q), 10, "dot")
        got = list(zip(top["doc_id"], top["dot"]))
        assert got == expect
        assert top["rank"].tolist() == list(range(1, 11))


def test_rrf_fuse_exact_rational():
    from tsdownsample_ray.stages.retrieval import rrf_fuse

    lex = pd.DataFrame({"doc_id": [1, 2, 3], "rank": [1, 2, 3]})
    vec = pd.DataFrame({"doc_id": [2, 4], "rank": [1, 2]})
    out = rrf_fuse(lex, vec, k0=60)
    row = out.set_index("doc_id")
    # doc 2 in both lists: num=(60+2)+(60+1)=123, den=62*61=3782
    assert row.loc[2, "rrf_num"] == 123 and row.loc[2, "rrf_den"] == 3782
    # singles: num=1, den=k0+r
    assert row.loc[1, "rrf_den"] == 61 and row.loc[1, "rrf_num"] == 1
    assert row.loc[4, "rrf_den"] == 62
    np.testing.assert_allclose(row.loc[2, "rrf"], 123 / 3782)
    # doc 2 (both lists) must outrank every single-list doc here
    assert row.loc[2, "fused_rank"] == 1
    # deterministic ordering: rrf desc, then doc_id
    assert out["rrf"].is_monotonic_decreasing or (
        out.sort_values(["rrf", "doc_id"], ascending=[False, True])
        ["doc_id"].tolist() == out["doc_id"].tolist())
