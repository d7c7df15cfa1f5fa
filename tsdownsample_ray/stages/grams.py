"""Overlapping word-k-gram corpus operators: duplicate-substring
detection and per-source boilerplate extraction.

Reference scope: the reference (tsdownsample) has no corpus operators —
these belong to the engine's training-data layer (brief-mandated).
``dup_windows`` is the detection side of exact-substring dedup (Lee et
al. 2022, "Deduplicating Training Data Makes Language Models Better":
duplicate token windows recurring across documents); unlike
``stages/spans.py`` (C4-style NON-overlapping tiles) every sliding
window position is a candidate. ``source_boilerplate_grams`` is
CCNet-style boilerplate mining (Wenzek et al. 2020): k-grams present in
a large fraction of one source's documents.

Scale shape (100 TB): the window explode is map-side and fully
vectorized — ONE ``split_pattern`` pass, k zero-copy slices of the flat
token buffer joined by ``binary_join_element_wise`` (never a per-doc or
per-window loop), straddle-masking via the list offsets. Each block's
(gram, doc) pairs are merged in-block BEFORE the exchange (Heap's law:
block gram-vocab << block windows), then ONE hash(gram) shuffle with
bounded reducers. Payload through the shuffle is ~k× the text bytes; at
100 TB you would emit a 64-bit gram hash instead of the string and add
a verify pass over hash-collision groups — the string form here is what
makes the DuckDB oracle replay exact, and the swap is one column
expression.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..arrow_utils import group_codes, rename_agg, stable_part_codes

__all__ = ["window_gram_pairs", "char_window_pairs", "dup_windows",
           "source_boilerplate_grams"]


def window_gram_pairs(b: pa.Table, *, k: int, text_col: str = "text",
                      id_col: str = "doc_id",
                      carry_cols: tuple = ()) -> pa.Table:
    """Explode each document into its overlapping ``k``-word windows:
    one row per window position, ``(gram, <id>, <carries...>)``. The
    gram is the space-joined window over the RAW whitespace split
    (empty tokens kept — both sides of the oracle operate on the same
    raw split). Vectorized: k shifted zero-copy slices of the flat
    token values joined element-wise; windows straddling a document
    boundary are masked via the list offsets."""
    toks = pc.split_pattern(b[text_col], " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    off = toks.offsets.to_numpy().astype(np.int64)
    lens = np.diff(off)
    flat = toks.values
    nf = len(flat)
    n_win = nf - k + 1 if nf >= k else 0
    empty_cols = {"gram": pa.array([], pa.string()),
                  id_col: pa.array([], b[id_col].type)}
    for c in carry_cols:
        empty_cols[c] = pa.array([], b[c].type)
    if n_win == 0:
        return pa.table(empty_cols)
    # valid start positions: the whole window stays inside the start's
    # document
    row = np.repeat(np.arange(b.num_rows), lens)
    pos = np.arange(nf) - np.repeat(off[:-1], lens)
    valid = (pos[:n_win] + k) <= np.repeat(lens, lens)[:n_win]
    sel = np.flatnonzero(valid)
    if len(sel) == 0:
        return pa.table(empty_cols)
    parts = [flat.slice(j, n_win) for j in range(k)]
    grams = pc.binary_join_element_wise(*parts, " ")
    take = pa.array(sel)
    rows = pa.array(row[sel])
    cols = {"gram": grams.take(take)}
    ids = b[id_col]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    cols[id_col] = ids.take(rows)
    for c in carry_cols:
        col = b[c]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        cols[c] = col.take(rows)
    return pa.table(cols)


def char_window_pairs(b: pa.Table, *, L: int, text_col: str = "text",
                      id_col: str = "doc_id") -> pa.Table:
    """Explode each document into its overlapping ``L``-CHARACTER
    windows (the exact-substring granularity of Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better", vs the
    word-gram tiles of :func:`window_gram_pairs`): one row per window
    position, ``(gram, <id>)``. Vectorized across the whole batch: all
    texts are joined with a ``\\x00`` separator, decoded ONCE to a flat
    utf-32 code array, and every window is materialized with one
    ``sliding_window_view`` + contiguous ``<U{L}`` reinterpret — no
    per-position Python. Windows that would straddle a document
    boundary (i.e. cover the separator) are masked via the per-doc
    character lengths. Contract: texts must not contain NUL (the
    separator); nulls are treated as empty strings. Character (not
    byte) windows, so the DuckDB ``substr``/``length`` oracle replays
    them exactly on any UTF-8 input."""
    col = b[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(col, "")
    n = b.num_rows
    empty = pa.table({"gram": pa.array([], pa.string()),
                      id_col: pa.array([], b[id_col].type)})
    if n == 0:
        return empty
    char_lens = pc.utf8_length(col).to_numpy(
        zero_copy_only=False).astype(np.int64)
    blob = "\x00".join(col.to_pylist())
    codes = np.frombuffer(blob.encode("utf-32-le"), dtype=np.uint32)
    total = len(codes)
    n_win = total - L + 1
    if n_win <= 0:
        return empty
    counts = char_lens + 1
    counts[-1] -= 1  # no trailing separator after the last doc
    row = np.repeat(np.arange(n, dtype=np.int64), counts)[:n_win]
    starts = np.zeros(n, np.int64)
    starts[1:] = np.cumsum(char_lens[:-1] + 1)
    pos = np.arange(n_win, dtype=np.int64) - starts[row]
    sel = np.flatnonzero(pos + L <= char_lens[row])
    if len(sel) == 0:
        return empty
    win = np.lib.stride_tricks.sliding_window_view(codes, L)[sel]
    subs = np.ascontiguousarray(win).view(f"<U{L}").ravel()
    ids = b[id_col]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    return pa.table({"gram": pa.array(subs),
                     id_col: ids.take(pa.array(row[sel]))})


def dup_windows(ds, *, k: int = 5, min_docs: int = 2,
                text_col: str = "text", id_col: str = "doc_id",
                num_partitions: int = 8, unit: str = "word"):
    """Duplicate overlapping ``k``-gram detection: per gram occurring in
    at least ``min_docs`` DISTINCT documents, ``(gram, n_docs, n_occ,
    min_doc)`` — distinct-document count, total occurrence count
    (overlaps included), smallest containing doc id. ``unit="word"``
    windows are ``k`` space-split tokens; ``unit="char"`` windows are
    ``k`` CHARACTERS (every sliding character position a candidate —
    the exact-substring dedup granularity).

    One hash(gram) shuffle; block-local (gram, doc) occurrence merge
    before the exchange, per-partition sort + segment reduction after
    (no per-gram loop). 100 TB note: shuffle volume is the distinct
    (gram, doc) pair volume (~``k`` x corpus chars for char mode); a
    u64 rolling-hash prefilter keyed on the window hash — same
    dataflow, 8-byte keys, survivors re-verified on the true substring
    — is the drop-in volume reducer when the string keys dominate."""
    mod = num_partitions * 64

    def _pairs(b: pa.Table) -> pa.Table:
        if unit == "char":
            t = char_window_pairs(b, L=k, text_col=text_col,
                                  id_col=id_col)
        else:
            t = window_gram_pairs(b, k=k, text_col=text_col,
                                  id_col=id_col)
        t = t.append_column("occ", pa.array(
            np.ones(t.num_rows, np.int64)))
        g = t.group_by(["gram", id_col]).aggregate([("occ", "sum")])
        g = rename_agg(g, {"gram": "gram", id_col: id_col,
                           "occ_sum": "occ"})
        return g.append_column(
            "__part", pa.array(stable_part_codes(g["gram"], mod)))

    def _agg(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        empty = pa.table({"gram": pa.array([], pa.string()),
                          "n_docs": pa.array([], pa.int64()),
                          "n_occ": pa.array([], pa.int64()),
                          "min_doc": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        m = t.group_by(["gram", id_col]).aggregate([("occ", "sum")])
        m = rename_agg(m, {"gram": "gram", id_col: id_col,
                           "occ_sum": "occ"})
        m = m.take(pc.sort_indices(m, sort_keys=[
            ("gram", "ascending"), (id_col, "ascending")]))
        gr = m["gram"]
        if isinstance(gr, pa.ChunkedArray):
            gr = gr.combine_chunks()
        codes = group_codes(gr)
        heads = np.ones(len(codes), dtype=bool)
        heads[1:] = codes[1:] != codes[:-1]
        seg = np.flatnonzero(heads)
        n_docs = np.diff(np.append(seg, len(codes)))
        occ = m["occ"].to_numpy(zero_copy_only=False).astype(np.int64)
        doc = m[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.flatnonzero(n_docs >= min_docs)
        if len(keep) == 0:
            return empty
        return pa.table({
            "gram": gr.take(pa.array(seg[keep])),
            "n_docs": pa.array(n_docs[keep].astype(np.int64)),
            "n_occ": pa.array(np.add.reduceat(occ, seg)[keep]),
            "min_doc": pa.array(doc[seg[keep]])})

    pairs = ds.map_batches(_pairs, batch_format="pyarrow")
    return pairs.repartition(num_partitions).groupby("__part").map_groups(
        _agg, batch_format="pyarrow")


def source_boilerplate_grams(ds, *, k: int = 3, min_df: int = 3,
                             frac_num: int = 1, frac_den: int = 5,
                             text_col: str = "text",
                             id_col: str = "doc_id",
                             source_col: str = "source",
                             num_partitions: int = 8):
    """CCNet-style per-source boilerplate k-grams: per ``(source,
    gram)`` with document frequency ``df >= min_df`` AND ``df/src_docs
    >= frac_num/frac_den`` (integer cross-multiplication — no float
    division), ``(source, gram, df, src_docs)``.

    Two exchanges of very different size: the per-source doc totals are
    a TINY aggregate (≤ |sources| × |blocks| partial rows, reduced on
    the driver and captured into the final filter — the broadcast-small-
    side pattern), while the (source, gram, doc) distinct pairs take
    ONE hash(gram) shuffle with block-local distinct before it."""
    mod = num_partitions * 64

    def _src_partial(b: pa.Table) -> pa.Table:
        b = b.append_column("n", pa.array(np.ones(b.num_rows, np.int64)))
        g = b.select([source_col, "n"]).group_by(
            [source_col]).aggregate([("n", "sum")])
        return rename_agg(g, {source_col: source_col, "n_sum": "n"})

    totals: dict = {}
    for r in ds.map_batches(
            _src_partial, batch_format="pyarrow").take_all():
        totals[r[source_col]] = totals.get(r[source_col], 0) + int(r["n"])

    def _pairs(b: pa.Table) -> pa.Table:
        t = window_gram_pairs(b, k=k, text_col=text_col, id_col=id_col,
                              carry_cols=(source_col,))
        t = t.append_column("one", pa.array(
            np.ones(t.num_rows, np.int64)))
        g = t.group_by(["gram", source_col, id_col]).aggregate(
            [("one", "min")])
        g = g.select(["gram", source_col, id_col])
        return g.append_column(
            "__part", pa.array(stable_part_codes(g["gram"], mod)))

    def _agg(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        empty = pa.table({source_col: pa.array([], pa.string()),
                          "gram": pa.array([], pa.string()),
                          "df": pa.array([], pa.int64()),
                          "src_docs": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        t = t.append_column("one", pa.array(
            np.ones(t.num_rows, np.int64)))
        d = t.group_by(["gram", source_col, id_col]).aggregate(
            [("one", "min")])
        d = d.append_column("dfp", pa.array(
            np.ones(d.num_rows, np.int64)))
        m = d.group_by([source_col, "gram"]).aggregate([("dfp", "sum")])
        m = rename_agg(m, {source_col: source_col, "gram": "gram",
                           "dfp_sum": "df"})
        df = m["df"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = m[source_col].to_pylist()
        tot = np.array([totals.get(s, 0) for s in src], np.int64)
        keep = np.flatnonzero((df >= min_df)
                              & (df * frac_den >= tot * frac_num))
        if len(keep) == 0:
            return empty
        take = pa.array(keep)
        return pa.table({source_col: m[source_col].take(take),
                         "gram": m["gram"].take(take),
                         "df": pa.array(df[keep]),
                         "src_docs": pa.array(tot[keep])})

    pairs = ds.map_batches(_pairs, batch_format="pyarrow")
    return pairs.repartition(num_partitions).groupby("__part").map_groups(
        _agg, batch_format="pyarrow")
