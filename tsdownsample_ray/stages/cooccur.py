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

__all__ = ["cooccurrence", "g2_collocations"]


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


def g2_collocations(ds, *, text_col: str = "text", id_col: str = "doc_id",
                    min_count: int = 3, num_partitions: int = 8):
    """Dunning log-likelihood (G^2) collocation scores over ADJACENT
    token bigrams (Dunning 1993 — the collocation test that, unlike
    the PMI ranking, is calibrated for rare counts): for each bigram
    the 2x2 contingency ``a = c(w1 w2)``, ``b = c(w1 *) - a``,
    ``c = c(* w2) - a``, ``d = N - a - b - c`` and
    ``G2 = 2*(xlx(a)+xlx(b)+xlx(c)+xlx(d)+xlx(N)
    -xlx(a+b)-xlx(a+c)-xlx(b+d)-xlx(c+d))`` with ``xlx(0) = 0``.

    Adjacency is over the RAW whitespace split (the window_gram_pairs
    convention); bigrams containing an empty token are dropped.
    Counts are exact int64; G2 is a per-row expression whose ``ln``
    calls go through libm ``math.log`` (bounded bigram-vocabulary
    loop, the ed2 contract) so the SQL replay is bit-identical.

    Output: ``(w1, w2, a, b, c, d, g2)`` for bigrams with
    ``a >= min_count``.

    Scale shape: per-block vectorized bigram partial counts, ONE
    hash(bigram) grouped sum (vocabulary-sized), two vocabulary-sized
    margin aggregates hash-JOINED back (never a corpus-sized
    broadcast), a bounded-scalar N, and a final bounded per-row
    score pass."""
    import math

    import ray as _ray

    from ..arrow_utils import rename_agg
    from .graph import grouped_sum_parts
    from .joins import hash_inner_join

    def _bigrams(b: pa.Table) -> pa.Table:
        empty = pa.table({"w1": pa.array([], pa.string()),
                          "w2": pa.array([], pa.string()),
                          "cnt": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        toks = pc.split_pattern(b[text_col], " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        off = toks.offsets.to_numpy().astype(np.int64)
        lens = np.diff(off)
        flat = toks.values
        nf = len(flat)
        if nf < 2:
            return empty
        # adjacency: consecutive flat positions within the same doc
        row = np.repeat(np.arange(b.num_rows), lens)
        same = row[1:] == row[:-1]
        w1 = flat.slice(0, nf - 1)
        w2 = flat.slice(1, nf - 1)
        keep = same & (pc.not_equal(w1, "").to_numpy(zero_copy_only=False)
                       & pc.not_equal(w2, "").to_numpy(
                           zero_copy_only=False))
        sel = pa.array(np.flatnonzero(keep))
        t = pa.table({"w1": w1.take(sel), "w2": w2.take(sel),
                      "cnt": pa.array(np.ones(len(sel), np.int64))})
        g = t.group_by(["w1", "w2"]).aggregate([("cnt", "sum")])
        return rename_agg(g, {"w1": "w1", "w2": "w2", "cnt_sum": "cnt"})

    bg = grouped_sum_parts(ds.map_batches(_bigrams, batch_format="pyarrow"),
                           ["w1", "w2"], ["cnt"], count_col=None,
                           fanin=num_partitions)
    bg = bg.materialize()  # bigram vocabulary — bounded; reused 4x below
    n_total = int(bg.sum("cnt"))

    def _m1(b: pa.Table) -> pa.Table:
        g = b.group_by(["w1"]).aggregate([("cnt", "sum")])
        return rename_agg(g, {"w1": "w1", "cnt_sum": "m1"})

    def _m2(b: pa.Table) -> pa.Table:
        g = b.group_by(["w2"]).aggregate([("cnt", "sum")])
        return rename_agg(g, {"w2": "w2", "cnt_sum": "m2"})

    margin1 = grouped_sum_parts(
        bg.map_batches(_m1, batch_format="pyarrow"), ["w1"], ["m1"],
        count_col=None, fanin=num_partitions)
    margin2 = grouped_sum_parts(
        bg.map_batches(_m2, batch_format="pyarrow"), ["w2"], ["m2"],
        count_col=None, fanin=num_partitions)
    joined = hash_inner_join(bg, margin1, on="w1",
                             num_partitions=num_partitions)
    joined = hash_inner_join(joined, margin2, on="w2",
                             num_partitions=num_partitions)

    def _score(b: pa.Table) -> pa.Table:
        t = b.filter(pc.greater_equal(
            b["cnt"], pa.scalar(min_count, pa.int64())))
        empty = pa.table({"w1": pa.array([], pa.string()),
                          "w2": pa.array([], pa.string()),
                          "a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64()),
                          "c": pa.array([], pa.int64()),
                          "d": pa.array([], pa.int64()),
                          "g2": pa.array([], pa.float64())})
        if t.num_rows == 0:
            return empty
        a = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        m1 = t["m1"].to_numpy(zero_copy_only=False).astype(np.int64)
        m2 = t["m2"].to_numpy(zero_copy_only=False).astype(np.int64)
        bb = m1 - a
        cc = m2 - a
        dd = n_total - a - bb - cc

        def xlx(x: int) -> float:
            return float(x) * math.log(float(x)) if x > 0 else 0.0

        g2 = np.array([
            2.0 * (xlx(int(av)) + xlx(int(bv)) + xlx(int(cv))
                   + xlx(int(dv)) + xlx(n_total)
                   - xlx(int(av + bv)) - xlx(int(av + cv))
                   - xlx(int(bv + dv)) - xlx(int(cv + dv)))
            for av, bv, cv, dv in zip(a, bb, cc, dd)], dtype=np.float64)
        return pa.table({"w1": t["w1"], "w2": t["w2"],
                         "a": pa.array(a), "b": pa.array(bb),
                         "c": pa.array(cc), "d": pa.array(dd),
                         "g2": pa.array(g2, pa.float64())})

    return joined.map_batches(_score, batch_format="pyarrow")
