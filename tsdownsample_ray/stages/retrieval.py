"""Hybrid retrieval: lexical (weighted term-frequency) and vector
(integer dot-product) candidate generation fused with reciprocal-rank
fusion (RRF, Cormack et al. 2009) — the standard hybrid-search shape of
a training-data curation / retrieval pipeline.

Scale shape:

1. **Lexical side** — one pass over the corpus computes per-term
   document frequencies for the (tiny, user-supplied) query-term set via
   block-local partials; a second pass scores every doc with integer
   weights ``w = (N·1000) // (df+1)``. Both passes are vectorized Arrow
   tokenize + ``np.add.at`` segment sums; the corpus text never
   shuffles.
2. **Vector side** — brute-force integer dot products of trunc-quantized
   embeddings against a broadcast query vector (one ``map_batches``, no
   shuffle).
3. **Top-K per side** — block-local prune to K rows, then a distributed
   ``sort().limit(K)`` (each reducer sees at most K rows per upstream
   block).
4. **Fusion** — the two K-row candidate lists are BOUNDED by
   construction; they merge driver-side (outer join on id) with exact
   rational RRF: ``num/den`` kept as int64 (``1/(k0+r)`` terms put over
   a common denominator), the float score being the single pinned IEEE
   division. Missing ranks are encoded 0, not NULL, so the fused schema
   is all-int64 + one float64.

No reference counterpart (the reference is a downsampling kernel
library); this is the training-data layer mandated by the brief.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["lexical_scores", "vector_scores", "topk_side", "rrf_fuse",
           "min_cover_window"]


def _explode_query_terms(b: pa.Table, terms: pa.Array,
                         text_col: str) -> tuple[np.ndarray, np.ndarray]:
    """(row_idx, term_idx) pairs for every occurrence of a query term in
    the batch, fully vectorized (Arrow split + offsets repeat +
    ``index_in``)."""
    toks = pc.split_pattern(b[text_col], pattern=" ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.values
    off = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    row_idx = np.repeat(np.arange(b.num_rows, dtype=np.int64),
                        np.diff(off))
    tidx = pc.index_in(flat, value_set=terms)
    keep = pc.is_valid(tidx).to_numpy(zero_copy_only=False)
    t = tidx.to_numpy(zero_copy_only=False)
    return row_idx[keep], t[keep].astype(np.int64)


def query_term_df(ds, terms: list[str], *,
                  text_col: str = "text") -> np.ndarray:
    """Document frequency of each query term: block-local distinct
    (row, term) membership partials summed into one |terms|-sized vector.
    The materialized result is |terms| × blocks rows — bounded by the
    QUERY size, not the corpus."""
    tarr = pa.array(terms, pa.string())
    nt = len(terms)

    def _part(b: pa.Table) -> pa.Table:
        r, t = _explode_query_terms(b, tarr, text_col)
        # distinct (row, term) -> membership counts
        seen = np.zeros((b.num_rows, nt), dtype=bool)
        seen[r, t] = True
        return pa.table({
            "tid": pa.array(np.arange(nt, dtype=np.int64)),
            "df_part": pa.array(seen.sum(axis=0).astype(np.int64)),
        })

    parts = ds.map_batches(_part, batch_format="pyarrow").to_pandas()
    df = np.zeros(nt, dtype=np.int64)
    np.add.at(df, parts["tid"].to_numpy(), parts["df_part"].to_numpy())
    return df


def lexical_scores(ds, terms: list[str], weights: np.ndarray, *,
                   id_col: str = "doc_id", text_col: str = "text"):
    """(id, lex_score) for every doc containing at least one query term:
    ``score = Σ_t tf(t, doc) · w_t`` — all int64."""
    tarr = pa.array(terms, pa.string())
    w = np.asarray(weights, dtype=np.int64)

    def _score(b: pa.Table) -> pa.Table:
        r, t = _explode_query_terms(b, tarr, text_col)
        s = np.zeros(b.num_rows, dtype=np.int64)
        np.add.at(s, r, w[t])
        keep = s > 0
        return pa.table({
            "doc_id": pc.cast(b[id_col], pa.int64()).filter(
                pa.array(keep)),
            "lex_score": pa.array(s[keep]),
        })

    return ds.map_batches(_score, batch_format="pyarrow")


def vector_scores(ds, qvec: np.ndarray, *, scale: int = 1000,
                  id_col: str = "vec_id", col: str = "embedding"):
    """(id, dot) integer dot products of trunc-quantized embeddings
    against the trunc-quantized broadcast query vector."""
    from .similarity import embedding_matrix

    qi = np.trunc(np.asarray(qvec, dtype=np.float64) * scale).astype(
        np.int64)

    def _dot(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "dot": pa.array([], pa.int64())})
        E = embedding_matrix(b, col)
        Q = np.trunc(E * scale).astype(np.int64)
        return pa.table({
            "doc_id": pc.cast(b[id_col], pa.int64()),
            "dot": pa.array(Q @ qi),
        })

    return ds.map_batches(_dot, batch_format="pyarrow")


def topk_side(scored, k: int, score_col: str) -> pd.DataFrame:
    """Top-``k`` by (score desc, id asc): block-local prune to ``k``
    rows, distributed sort + limit, then rank 1..k on the bounded
    result (the only driver-side rows are the ≤k winners)."""

    def _local(b: pa.Table) -> pa.Table:
        if b.num_rows <= k:
            return b
        idx = pc.sort_indices(b, sort_keys=[(score_col, "descending"),
                                            ("doc_id", "ascending")])
        return b.take(idx.slice(0, k))

    top = (scored.map_batches(_local, batch_format="pyarrow")
           .sort(key=[score_col, "doc_id"], descending=[True, False])
           .limit(k).to_pandas())
    top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
    return top


def rrf_fuse(lex_top: pd.DataFrame, vec_top: pd.DataFrame, *,
             k0: int = 60) -> pd.DataFrame:
    """Exact-rational reciprocal-rank fusion of two bounded candidate
    lists: score = Σ sides 1/(k0 + rank), carried as ``rrf_num/rrf_den``
    int64 (common denominator), ``rrf`` being the one pinned IEEE
    division. Missing ranks are 0 (absent from that side)."""
    a = lex_top[["doc_id", "rank"]].rename(columns={"rank": "r_lex"})
    b = vec_top[["doc_id", "rank"]].rename(columns={"rank": "r_vec"})
    m = a.merge(b, on="doc_id", how="outer")
    r_lex = m["r_lex"].fillna(0).to_numpy(dtype=np.int64)
    r_vec = m["r_vec"].fillna(0).to_numpy(dtype=np.int64)
    both = (r_lex > 0) & (r_vec > 0)
    dl = k0 + r_lex
    dv = k0 + r_vec
    num = np.where(both, dl + dv, np.int64(1))
    den = np.where(both, dl * dv, np.where(r_lex > 0, dl, dv))
    rrf = num / den
    out = pd.DataFrame({
        "doc_id": m["doc_id"].to_numpy(dtype=np.int64),
        "r_lex": r_lex, "r_vec": r_vec,
        "rrf_num": num.astype(np.int64), "rrf_den": den.astype(np.int64),
        "rrf": rrf,
    })
    out = out.sort_values(["rrf", "doc_id"],
                          ascending=[False, True]).reset_index(drop=True)
    out["fused_rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out


def min_cover_window(ds, terms: tuple, *, text_col: str = "text",
                     id_col: str = "doc_id"):
    """Minimal proximity window: per document containing EVERY query
    term, the length of the shortest token span covering at least one
    occurrence of each (the classic positional-proximity ranking
    signal; Sadakane & Imai 2001 / the MINDIST of web search). Output
    ``(doc_id, n_<i> per term, min_span)``; documents missing any term
    are dropped.

    Fully vectorized — the textbook linear scan (for each stream
    position as window END, the best START is the minimum over terms of
    the last occurrence seen) is computed with numpy ffills: token
    positions of the query terms are sorted once per batch, each term's
    last-seen position is a ``maximum.accumulate`` over doc-offset
    positions (the offset keeps the accumulate from crossing document
    boundaries), and per-doc minima reduce with ``minimum.reduceat``.
    Embarrassingly parallel per batch — no shuffle at all; the
    per-doc output is emitted from the same map."""
    tl = list(terms)
    k = len(tl)

    def _windows(b: pa.Table) -> pa.Table:
        cols = {id_col: pa.array([], pa.int64())}
        for i in range(k):
            cols[f"n_{i}"] = pa.array([], pa.int64())
        cols["min_span"] = pa.array([], pa.int64())
        empty = pa.table(cols)
        if b.num_rows == 0:
            return empty
        toks = pc.split_pattern(b[text_col], " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        off = toks.offsets.to_numpy().astype(np.int64)
        lens = np.diff(off)
        flat = toks.values
        doc_of = np.repeat(np.arange(b.num_rows, dtype=np.int64), lens)
        pos = np.arange(len(flat), dtype=np.int64) \
            - np.repeat(off[:-1], lens)
        term_id = np.full(len(flat), -1, dtype=np.int64)
        for i, t in enumerate(tl):
            term_id[pc.equal(flat, t).to_numpy(
                zero_copy_only=False)] = i
        sel = term_id >= 0
        if not sel.any():
            return empty
        d, p, t = doc_of[sel], pos[sel], term_id[sel]
        # already sorted by (doc, pos) by construction
        big = np.int64(1) << 32
        base = d * big
        last = np.empty((k, len(p)), dtype=np.int64)
        for i in range(k):
            x = np.where(t == i, base + p, np.int64(-1))
            acc = np.maximum.accumulate(x)
            ok = acc >= base  # same doc and seen at least once
            last[i] = np.where(ok, acc - base, np.int64(-1))
        seen_all = (last >= 0).all(axis=0)
        start = last.min(axis=0)
        span = np.where(seen_all, p - start + 1,
                        np.int64(1) << 40)
        heads = np.ones(len(d), dtype=bool)
        heads[1:] = d[1:] != d[:-1]
        seg = np.flatnonzero(heads)
        mins = np.minimum.reduceat(span, seg)
        counts = np.zeros((k, len(seg)), dtype=np.int64)
        doc_idx = np.cumsum(heads) - 1
        for i in range(k):
            np.add.at(counts[i], doc_idx[t == i], 1)
        keep = mins < (np.int64(1) << 40)
        ids = b[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        out = {id_col: ids.take(pa.array(d[seg[keep]]))}
        for i in range(k):
            out[f"n_{i}"] = pa.array(counts[i][keep])
        out["min_span"] = pa.array(mins[keep])
        return pa.table(out)

    return ds.map_batches(_windows, batch_format="pyarrow")
