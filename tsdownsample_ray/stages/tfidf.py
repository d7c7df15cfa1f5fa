"""TF-IDF top terms per group: the characteristic vocabulary of each
domain / source / language slice of a corpus.

Scale shape (the wide steps touch VOCABULARY-sized data, never the raw
corpus):

1. **map combiner** — each batch tokenizes vectorized (Arrow
   ``split_pattern`` + one offsets-derived explode) and collapses to
   per-(group, term) partials: term occurrences ``tf`` and distinct
   containing docs ``df`` (each doc lives in exactly one group, so
   per-group df partials sum to the global per-term df).
2. **one hash(term) shuffle of partials** — per partition, an Arrow
   aggregate finalizes (group, term) tf and the per-term df (all rows of
   a term are co-located), then scores tf-idf.
3. **per-group top-k** — the scored table is vocabulary x groups rows;
   a groupby(group) sort-within-group keeps the k best.

Weighting: smoothed ``idf = ln((1+N)/(1+df)) + 1`` (the scikit-learn
formulation); ``N`` (total docs) comes from Parquet row-count metadata,
not a data pass. The float score is ORDERING state only — rank/tf/df are
the exact outputs (ln is not bit-identical across engines; ranks are
stable because score gaps are astronomically larger than 1 ulp).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..arrow_utils import rename_agg, stable_part_codes

__all__ = ["tfidf_top_terms"]


def _explode_terms(b: pa.Table, group_col: str, text_col: str) -> pa.Table:
    """(group, doc_idx, term) rows from a batch, vectorized: Arrow split +
    one np.repeat over the list offsets; empty tokens dropped."""
    toks = pc.split_pattern(b[text_col], pattern=" ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.values
    off = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    doc_idx = np.repeat(np.arange(b.num_rows, dtype=np.int64),
                        np.diff(off))
    t = pa.table({
        "group": b[group_col].take(pa.array(doc_idx)),
        "doc": pa.array(doc_idx),
        "term": flat,
    })
    return t.filter(pc.not_equal(t["term"], ""))


def tfidf_top_terms(ds, n_docs: int, *, group_col: str,
                    text_col: str = "text", k: int = 5,
                    num_partitions: int = 16):
    """Top-``k`` terms per group by smoothed tf-idf. ``n_docs`` is the
    corpus document count (callers get it from ``ds.count()`` — Parquet
    metadata, no data pass). Returns (group, term, tf, df, rank)."""
    mod = num_partitions * 64

    def _partials(b: pa.Table) -> pa.Table:
        t = _explode_terms(b, group_col, text_col)
        # per-(doc, term) occurrence counts, then per-(group, term):
        # tf = sum of occurrences, df = count of distinct docs
        t = t.append_column("one", pa.array(np.ones(t.num_rows, np.int64)))
        per_doc = t.group_by(["group", "term", "doc"]).aggregate(
            [("one", "sum")])
        per_doc = rename_agg(per_doc, {"group": "group", "term": "term",
                                       "doc": "doc", "one_sum": "o"})
        g = per_doc.group_by(["group", "term"]).aggregate(
            [("o", "sum"), ("o", "count")])
        g = rename_agg(g, {"group": "group", "term": "term",
                           "o_sum": "tf", "o_count": "df"})
        h = stable_part_codes(g["term"], mod)
        return g.append_column("__part", pa.array(h))

    partials = ds.map_batches(_partials, batch_format="pyarrow")

    def _score(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table({
                "group": pa.array([], part["group"].type),
                "term": pa.array([], pa.string()),
                "tf": pa.array([], pa.int64()),
                "df": pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
            })
        g = part.group_by(["group", "term"]).aggregate(
            [("tf", "sum"), ("df", "sum")])
        g = rename_agg(g, {"group": "group", "term": "term",
                           "tf_sum": "tf", "df_sum": "df"})
        # all partials of a term are in this partition -> global df
        d = g.group_by(["term"]).aggregate([("df", "sum")])
        d = rename_agg(d, {"term": "term", "df_sum": "df_term"})
        j = g.join(d, keys=["term"])
        df = j["df_term"].to_numpy(zero_copy_only=False).astype(np.float64)
        tf = j["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        score = tf * (np.log((1.0 + n_docs) / (1.0 + df)) + 1.0)
        return pa.table({
            "group": j["group"], "term": j["term"],
            "tf": pc.cast(j["tf"], pa.int64()),
            "df": pc.cast(j["df_term"], pa.int64()),
            "score": pa.array(score),
        })

    scored = partials.repartition(num_partitions).groupby("__part") \
                     .map_groups(_score, batch_format="pyarrow")

    def _topk(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(g, sort_keys=[("score", "descending"),
                                            ("term", "ascending")])
        out = g.take(idx[:k])
        rank = pa.array(np.arange(1, out.num_rows + 1, dtype=np.int64))
        return pa.table({
            group_col: out["group"], "term": out["term"],
            "tf": out["tf"], "df": out["df"], "rank": rank,
        })

    return scored.groupby("group").map_groups(_topk, batch_format="pyarrow")
