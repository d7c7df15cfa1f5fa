"""Corpus-wide vocabulary construction — the tokenizer-training precursor.

Builds the exact top-V vocabulary of a document corpus: per-token total
occurrences (``count``), document frequency (``df``) and a contiguous
``vocab_id`` assigned by (count DESC, token ASC) rank — the layout a BPE
/ WordPiece trainer consumes as its initial symbol table.

Scale shape (100 TB): per-batch partial (token -> count, df) aggregates
collapse each block to its distinct tokens BEFORE any shuffle (Heap's
law: block vocab << block words), ONE hash(token) shuffle merges the
partials exactly, each partition keeps only its top-V candidates, and
the final exact top-V + rank assignment runs over <= partitions x V rows
(one small funnel block). Every token lives wholly in one partition, so
the global top-V is a subset of the per-partition top-Vs — the
truncation is exact, not approximate.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..arrow_utils import rename_agg, stable_part_codes

__all__ = ["build_vocab"]


def build_vocab(ds, *, text_col: str = "text", id_col: str = "doc_id",
                top_v: int = 50_000, num_partitions: int = 16):
    """Returns ``(token, count, df, vocab_id)`` for the corpus' top
    ``top_v`` tokens by (count DESC, token ASC); ``vocab_id`` is the
    0-based rank in that order."""
    mod = num_partitions * 64

    def _partials(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b[text_col], " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.values
        off = toks.offsets.to_numpy().astype(np.int64)
        doc_idx = np.repeat(np.arange(b.num_rows, dtype=np.int64),
                            np.diff(off))
        t = pa.table({"doc": pa.array(doc_idx), "token": flat,
                      "one": pa.array(np.ones(len(doc_idx), np.int64))})
        t = t.filter(pc.not_equal(t["token"], ""))
        per_doc = t.group_by(["doc", "token"]).aggregate([("one", "sum")])
        per_doc = rename_agg(per_doc, {"doc": "doc", "token": "token",
                                       "one_sum": "o"})
        g = per_doc.group_by(["token"]).aggregate(
            [("o", "sum"), ("o", "count")])
        g = rename_agg(g, {"token": "token", "o_sum": "count",
                           "o_count": "df"})
        h = stable_part_codes(g["token"], mod)
        return g.append_column("__part", pa.array(h))

    def _topv(t: pa.Table) -> pa.Table:
        neg = pc.negate(pc.cast(t["count"], pa.int64()))
        t = t.append_column("__neg", neg)
        t = t.take(pc.sort_indices(t, sort_keys=[
            ("__neg", "ascending"), ("token", "ascending")]))
        return t.drop_columns(["__neg"]).slice(0, top_v)

    def _part_merge(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        m = t.group_by(["token"]).aggregate(
            [("count", "sum"), ("df", "sum")])
        m = rename_agg(m, {"token": "token", "count_sum": "count",
                           "df_sum": "df"})
        return _topv(m)

    def _final(b: pa.Table) -> pa.Table:
        t = _topv(b)
        return t.append_column(
            "vocab_id", pa.array(np.arange(t.num_rows, dtype=np.int64)))

    partials = ds.map_batches(_partials, batch_format="pyarrow")
    merged = partials.repartition(num_partitions).groupby(
        "__part").map_groups(_part_merge, batch_format="pyarrow")
    return merged.repartition(1).map_batches(_final,
                                             batch_format="pyarrow")
