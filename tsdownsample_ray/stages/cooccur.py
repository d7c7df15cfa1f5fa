"""Token co-occurrence statistics (the PMI precursor): for every
unordered token pair (a < b), the number of documents containing BOTH,
alongside each token's document frequency — the inputs to pointwise
mutual information, collocation mining, and word-vector co-occurrence
matrices.

No counterpart in the reference; corpus-statistics layer. PMI itself is
``log(co_df * N / (df_a * df_b))``; the operator emits the exact integer
numerator/denominator (``pmi_num = co_df * n_docs``,
``pmi_den = df_a * df_b``) so ranking/thresholding stays float-free and
SQL-replayable.

Scale shape (100 TB): per block, documents collapse to distinct (doc,
token) rows (one Arrow group-by), within-doc pairs expand via the
shared ``_segmented_pairs`` gather (a vector op per distinct doc size,
never per doc), and pair counts pre-aggregate in-block BEFORE the ONE
hash(a, b) shuffle (`grouped_sum_parts`). Document frequencies are a
token-keyed grouped count — vocab-sized — broadcast back with
``ray.put`` (the small-side pattern; a vocab table is MBs when the pair
table is TBs). Pair cardinality is quadratic in per-doc distinct
tokens: cap long docs upstream (token_stats) or accept the documented
blow-up — the cap decision is the caller's, as with LSH buckets.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["cooccurrence"]


def cooccurrence(ds, *, text_col: str = "text", id_col: str = "doc_id",
                 n_docs: int, num_partitions: int = 8):
    """Returns ``(a, b, co_df, df_a, df_b, pmi_num, pmi_den)`` for every
    token pair co-occurring in at least one document. ``n_docs`` is the
    corpus size (read it from parquet metadata — a count job would scan
    the corpus twice)."""
    from .dedup import _segmented_pairs
    from .graph import grouped_sum_parts

    def _doc_tokens(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b[text_col], " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.values
        off = toks.offsets.to_numpy().astype(np.int64)
        doc_idx = np.repeat(np.arange(b.num_rows, dtype=np.int64),
                            np.diff(off))
        t = pa.table({"d": pa.array(doc_idx), "token": flat})
        t = t.filter(pc.not_equal(t["token"], ""))
        return t.group_by(["d", "token"]).aggregate([])

    def _pairs(b: pa.Table) -> pa.Table:
        t = _doc_tokens(b)
        if t.num_rows == 0:
            return pa.table({"a": pa.array([], pa.string()),
                             "b": pa.array([], pa.string()),
                             "co_df": pa.array([], pa.int64())})
        t = t.take(pc.sort_indices(t, sort_keys=[
            ("d", "ascending"), ("token", "ascending")]))
        d = t["d"].to_numpy(zero_copy_only=False).astype(np.int64)
        i, j = _segmented_pairs(np.arange(len(d)), d, None)
        tok = t["token"]
        if isinstance(tok, pa.ChunkedArray):
            tok = tok.combine_chunks()
        pairs = pa.table({"a": tok.take(pa.array(i)),
                          "b": tok.take(pa.array(j)),
                          "co_df": pa.array(np.ones(len(i), np.int64))})
        g = pairs.group_by(["a", "b"]).aggregate([("co_df", "sum")])
        from ..arrow_utils import rename_agg

        return rename_agg(g, {"a": "a", "b": "b", "co_df_sum": "co_df"})

    pair_counts = grouped_sum_parts(
        ds.map_batches(_pairs, batch_format="pyarrow"),
        ["a", "b"], ["co_df"], count_col=None, fanin=num_partitions)

    # document frequencies: vocab-sized — ONE grouped count, broadcast back
    def _tok_docs(b: pa.Table) -> pa.Table:
        return _doc_tokens(b).select(["token"])

    df_ds = grouped_sum_parts(
        ds.map_batches(_tok_docs, batch_format="pyarrow"),
        ["token"], [], count_col="df", fanin=4)
    import ray

    df_tbl = pa.concat_tables(
        list(df_ds.iter_batches(batch_format="pyarrow")))
    ref = ray.put(df_tbl.combine_chunks())

    def _attach(b: pa.Table) -> pa.Table:
        s = ray.get(ref)
        dfa = b.join(s.rename_columns(["a", "df_a"]), keys=["a"])
        both = dfa.join(s.rename_columns(["b", "df_b"]), keys=["b"])
        co = both["co_df"].to_numpy(zero_copy_only=False).astype(np.int64)
        da = both["df_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        db = both["df_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "a": both["a"], "b": both["b"],
            "co_df": pa.array(co),
            "df_a": pa.array(da), "df_b": pa.array(db),
            "pmi_num": pa.array(co * n_docs),
            "pmi_den": pa.array(da * db)})

    return pair_counts.map_batches(_attach, batch_format="pyarrow")
