"""Inverted-index construction: token -> (df, total tf, sorted posting
list of doc ids) over a document corpus.

No counterpart in the reference (a kernel library); training-data /
retrieval layer (brief-mandated). The posting list is the core artifact
of corpus search and of TF-IDF/BM25 retrieval; building it distributed
is a canonical one-shuffle job.

Scale shape (100 TB): the explode collapses each block to its distinct
``(doc, token)`` pairs map-side (per-doc tf via one in-block Arrow
group-by — Heap's law keeps block vocab << block words), then ONE
hash(token) shuffle co-locates each token's pairs; the per-partition
pass is one sort + segment reduction + ``binary_join`` (zero Python per
row). Every token lives wholly in one partition so df/tf/posting are
exact. Posting payload per token is bounded by its df — at web scale
cap with ``max_df`` (drop stop-word-grade tokens whose posting would be
corpus-sized; the cap is a LOGGED semantic filter, not silent loss).
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..arrow_utils import rename_agg, stable_part_codes
from ..arrow_utils import group_codes

__all__ = ["build_postings"]

log = logging.getLogger(__name__)


def build_postings(ds, *, text_col: str = "text", id_col: str = "doc_id",
                   num_partitions: int = 16, max_df: int | None = None):
    """Returns ``(token, df, tf_total, posting)``: per corpus token its
    document frequency, total term count, and the comma-joined posting
    list of doc ids sorted ascending. ``max_df`` drops tokens with more
    than that many documents (logged count)."""
    mod = num_partitions * 64

    def _pairs(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b[text_col], " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.values
        off = toks.offsets.to_numpy().astype(np.int64)
        ids = b[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        doc = ids.take(pa.array(np.repeat(np.arange(b.num_rows),
                                          np.diff(off))))
        t = pa.table({"doc_id": doc, "token": flat,
                      "one": pa.array(np.ones(len(doc), np.int64))})
        t = t.filter(pc.not_equal(t["token"], ""))
        g = t.group_by(["token", "doc_id"]).aggregate([("one", "sum")])
        g = rename_agg(g, {"token": "token", "doc_id": "doc_id",
                           "one_sum": "tf"})
        h = stable_part_codes(g["token"], mod)
        return g.append_column("__part", pa.array(h))

    def _lists(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        empty = pa.table({"token": pa.array([], pa.string()),
                          "df": pa.array([], pa.int64()),
                          "tf_total": pa.array([], pa.int64()),
                          "posting": pa.array([], pa.string())})
        if t.num_rows == 0:
            return empty
        # blocks from different source blocks may repeat (token, doc):
        # merge tf first, then sort once for both segments and postings
        m = t.group_by(["token", "doc_id"]).aggregate([("tf", "sum")])
        m = rename_agg(m, {"token": "token", "doc_id": "doc_id",
                           "tf_sum": "tf"})
        m = m.take(pc.sort_indices(m, sort_keys=[
            ("token", "ascending"), ("doc_id", "ascending")]))
        tok = m["token"]
        if isinstance(tok, pa.ChunkedArray):
            tok = tok.combine_chunks()
        codes = group_codes(tok)
        heads = np.ones(len(codes), dtype=bool)
        heads[1:] = codes[1:] != codes[:-1]
        seg = np.flatnonzero(heads)
        bounds = np.append(seg, len(codes))
        df = np.diff(bounds)
        tf = m["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
        tf_total = np.add.reduceat(tf, seg)
        doc_str = pc.cast(m["doc_id"], pa.string())
        if isinstance(doc_str, pa.ChunkedArray):
            doc_str = doc_str.combine_chunks()
        offsets = pa.array(np.append(seg, len(codes)).astype(np.int32))
        # list offsets need a leading 0: seg[0] == 0 always (first row
        # starts the first segment), so seg ++ [n] IS the offsets vector
        posting = pc.binary_join(
            pa.ListArray.from_arrays(offsets, doc_str), ",")
        out = pa.table({"token": tok.take(pa.array(seg)),
                        "df": pa.array(df),
                        "tf_total": pa.array(tf_total),
                        "posting": posting})
        if max_df is not None:
            keep = pc.less_equal(out["df"], max_df)
            dropped = out.num_rows - pc.sum(
                pc.cast(keep, pa.int64())).as_py()
            if dropped:
                log.info("build_postings: dropped %d tokens with df > %d",
                         dropped, max_df)
            out = out.filter(keep)
        return out

    pairs = ds.map_batches(_pairs, batch_format="pyarrow")
    return pairs.repartition(num_partitions).groupby("__part").map_groups(
        _lists, batch_format="pyarrow")
