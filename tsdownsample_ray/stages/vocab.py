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

from ..arrow_utils import make_add_part, rename_agg, stable_part_codes

__all__ = ["build_vocab", "term_drift", "bigram_familiarity",
           "anagram_groups", "front_code_stats"]


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


def term_drift(ds, n0: int, n1: int, *, text_col: str = "text",
               id_col: str = "doc_id", top: int = 20, fanin: int = 4):
    """2×2 chi-square PRESENCE drift of every term between two corpus
    halves (``doc_id`` parity): the vocabulary-shift monitor between
    crawl snapshots / data mixes. Contingency per term: ``a/b`` = docs
    containing it in half 0/1, ``c/d`` the complements against the half
    totals ``n0/n1``; the classic ``chi2 = N·(ad−bc)²/((a+b)(c+d)·n0·n1)``
    with the identity ``ad−bc = a·n1 − b·n0``. Integers carry everything
    except the final pinned float chain (3 multiplies + 1 divide, the
    same expression tree in SQL).

    Scale shape: per-block distinct (doc, term) membership partials
    (vectorized dictionary-encode + unique), ONE hash(term) shuffle of
    vocabulary-sized partials, a bounded ``sort().limit(top)`` funnel.
    Returns the ``top`` most drifted terms (chi2 desc, term asc) with
    rank."""
    import pandas as pd

    from .graph import grouped_sum_parts

    def _part(b: pa.Table) -> pa.Table:
        empty = pa.table({"term": pa.array([], pa.string()),
                          "a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        toks = pc.split_pattern(b[text_col], " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.values
        off = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        row = np.repeat(np.arange(b.num_rows, dtype=np.int64),
                        np.diff(off))
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        row = row[keep]
        if len(row) == 0:
            return empty
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nt = len(enc.dictionary)
        pair = row * nt + codes
        _, first = np.unique(pair, return_index=True)
        row, codes = row[first], codes[first]
        half = (b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
                % 2)[row]
        av = np.zeros(nt, np.int64)
        bv = np.zeros(nt, np.int64)
        np.add.at(av, codes[half == 0], 1)
        np.add.at(bv, codes[half == 1], 1)
        nz = (av > 0) | (bv > 0)
        return pa.table({"term": enc.dictionary.filter(pa.array(nz)),
                         "a": pa.array(av[nz]), "b": pa.array(bv[nz])})

    summed = grouped_sum_parts(ds.map_batches(_part, batch_format="pyarrow"),
                               ["term"], ["a", "b"], count_col=None,
                               fanin=fanin)
    Nf = float(n0 + n1)
    p2f = float(n0 * n1)

    def _final(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        bb = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = n0 - a
        d = n1 - bb
        keep = (c + d) > 0
        a, bb, c, d = a[keep], bb[keep], c[keep], d[keep]
        p1 = (a + bb) * (c + d)
        d1 = a * n1 - bb * n0
        d1f = d1.astype(np.float64)
        chi2 = (Nf * d1f * d1f) / (p1.astype(np.float64) * p2f)
        term = t["term"]
        if isinstance(term, pa.ChunkedArray):
            term = term.combine_chunks()
        return pa.table({"term": term.filter(pa.array(keep)),
                         "a": pa.array(a), "b": pa.array(bb),
                         "p1": pa.array(p1), "d1": pa.array(d1),
                         "chi2": pa.array(chi2, pa.float64())})

    topt = (summed.map_batches(_final, batch_format="pyarrow")
            .sort(key=["chi2", "term"], descending=[True, False])
            .limit(top).to_pandas())
    topt["rank"] = np.arange(1, len(topt) + 1, dtype=np.int64)
    return topt


def bigram_familiarity(ds, *, text_col: str = "text",
                       id_col: str = "doc_id", fanin: int = 4,
                       num_partitions: int = 8):
    """Corpus-fit quality signal (the count-based stand-in for LM
    perplexity): per document, the mean corpus frequency of its
    adjacent-token bigrams — ``fam_mean_pm = (1000·Σ count(bg)) //
    n_bigrams`` — low scores flag out-of-distribution / garbled docs.

    Scale shape: pass 1 builds the corpus bigram table (block-local
    pre-collapse, ONE hash(bigram) grouped sum — vocabulary-sized);
    pass 2 re-explodes occurrences and hash-JOINs them against the
    counts (no broadcast of the bigram table), then one hash(doc)
    grouped sum. All integers; the permille mean is truncating."""

    def _explode(b: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "bg": pa.array([], pa.string())})
        if b.num_rows == 0:
            return empty
        toks = pc.split_pattern(b[text_col], " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.values
        off = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        row = np.repeat(np.arange(b.num_rows, dtype=np.int64),
                        np.diff(off))
        idx = np.arange(len(row), dtype=np.int64)
        valid = idx < off[row + 1] - 1
        li = idx[valid]
        bg = pc.binary_join_element_wise(
            flat.take(pa.array(li)), flat.take(pa.array(li + 1)), " ")
        ids = pc.cast(b[id_col], pa.int64()).take(pa.array(row[valid]))
        return pa.table({"doc_id": ids, "bg": bg})

    from .graph import grouped_sum_parts

    occ = ds.map_batches(_explode, batch_format="pyarrow")

    def _ones(b: pa.Table) -> pa.Table:
        return pa.table({"bg": b["bg"]})

    counts = grouped_sum_parts(occ.map_batches(_ones,
                                               batch_format="pyarrow"),
                               ["bg"], [], count_col="c", fanin=fanin)
    joined = occ.join(counts, join_type="inner",
                      num_partitions=num_partitions, on=("bg",))

    def _proj(b: pa.Table) -> pa.Table:
        return pa.table({"doc_id": b["doc_id"], "c": b["c"]})

    per_doc = grouped_sum_parts(joined.map_batches(_proj,
                                                   batch_format="pyarrow"),
                                ["doc_id"], ["c"], count_col="n_bg",
                                fanin=fanin)

    def _final(b: pa.Table) -> pa.Table:
        fam = b["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = b["n_bg"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "doc_id": b["doc_id"], "n_bg": b["n_bg"],
            "fam_sum": pa.array(fam),
            "fam_mean_pm": pa.array((1000 * fam) // n)})

    return per_doc.map_batches(_final, batch_format="pyarrow")


def heaps_law(ds, n_total: int, *, deciles: int = 10,
              text_col: str = "text", id_col: str = "doc_id",
              num_partitions: int = 8):
    """Heaps'-law vocabulary-growth audit: split the corpus into
    ``deciles`` deterministic slices (``doc_id * deciles // n_total``)
    and report, per slice boundary, the CUMULATIVE token count and the
    CUMULATIVE distinct-vocabulary size — the V(n) ~ K * n^beta curve a
    tokenizer-budget decision reads. Exact, not sketched.

    Scale shape: a token first contributes to the vocabulary at its
    MINIMUM decile, so the cumulative-distinct curve needs only one
    map-side (token -> min decile) partial per block, ONE hash(token)
    shuffle to merge mins, and a <= ``deciles``-row count per first
    decile; the token-volume side is a map-side (decile, n) partial with
    a tree combine. The final cumulative sums run over ``deciles`` rows
    on the driver — never a growing-prefix recount (which would be
    O(deciles) full passes)."""
    from .graph import grouped_sum_parts

    if n_total < 1:
        raise ValueError("n_total must be >= 1")

    def _dec(ids: np.ndarray) -> np.ndarray:
        return ids.astype(np.int64) * deciles // n_total

    def _tok_partial(b: pa.Table) -> pa.Table:
        texts = b[text_col].to_pylist()
        dec = _dec(b[id_col].to_numpy(zero_copy_only=False))
        toks_per = [t.split() for t in texts]
        counts = np.fromiter((len(t) for t in toks_per), np.int64,
                             count=len(toks_per))
        return pa.table({"decile": pa.array(dec),
                         "n_tok": pa.array(counts)})

    def _vocab_partial(b: pa.Table) -> pa.Table:
        texts = b[text_col].to_pylist()
        dec = _dec(b[id_col].to_numpy(zero_copy_only=False))
        toks_per = [t.split() for t in texts]
        flat = [tok for toks in toks_per for tok in toks]
        if not flat:
            return pa.table({"token": pa.array([], pa.string()),
                             "d0": pa.array([], pa.int64())})
        rep = np.repeat(dec, np.fromiter(
            (len(t) for t in toks_per), np.int64, count=len(toks_per)))
        t = pa.table({"token": pa.array(flat, pa.string()),
                      "d0": pa.array(rep)})
        # in-block pre-reduce: one row per (block-distinct token)
        agg = t.group_by("token").aggregate([("d0", "min")])
        return pa.table({"token": agg["token"], "d0": agg["d0_min"]})

    # token volume per decile: tiny key space -> map partial + tree merge
    vol = ds.map_batches(_tok_partial, batch_format="pyarrow")
    vol_t = grouped_sum_parts(vol, ["decile"], ["n_tok"], count_col=None,
                              fanin=2).to_arrow_refs()
    import ray as _ray

    vol_tbl = pa.concat_tables([_ray.get(r) for r in vol_t])

    # vocab first-decile: ONE hash(token) shuffle merging min(d0)
    mod = num_partitions * 64
    _add_part = make_add_part("token", mod)

    def _min_d0(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        m = t.group_by("token").aggregate([("d0", "min")])
        cnt = m["d0_min"].to_numpy(zero_copy_only=False)
        out = np.bincount(cnt, minlength=deciles)[:deciles]
        return pa.table({"d0": pa.array(np.arange(deciles, dtype=np.int64)),
                         "n_new": pa.array(out.astype(np.int64))})

    parts = ds.map_batches(_vocab_partial, batch_format="pyarrow") \
        .map_batches(_add_part, batch_format="pyarrow") \
        .repartition(num_partitions).groupby("__part") \
        .map_groups(_min_d0, batch_format="pyarrow").to_arrow_refs()
    newv = pa.concat_tables([_ray.get(r) for r in parts])

    # bounded driver finalize: deciles rows
    n_new = np.zeros(deciles, np.int64)
    d0 = newv["d0"].to_numpy(zero_copy_only=False)
    nn = newv["n_new"].to_numpy(zero_copy_only=False)
    np.add.at(n_new, d0, nn)
    n_tok = np.zeros(deciles, np.int64)
    vd = vol_tbl["decile"].to_numpy(zero_copy_only=False)
    vn = vol_tbl["n_tok"].to_numpy(zero_copy_only=False)
    np.add.at(n_tok, np.clip(vd, 0, deciles - 1), vn)
    return pa.table({
        "decile": pa.array(np.arange(deciles, dtype=np.int64)),
        "cum_tokens": pa.array(np.cumsum(n_tok)),
        "cum_vocab": pa.array(np.cumsum(n_new))})


def _distinct_tokens_block(b: pa.Table, text_col: str):
    """One block's distinct whitespace tokens as a pyarrow StringArray."""
    toks = pc.split_pattern(b[text_col], " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.values
    flat = flat.filter(pc.not_equal(flat, ""))
    u = pc.unique(flat)
    if isinstance(u, pa.ChunkedArray):
        u = u.combine_chunks()
    return u


def anagram_groups(ds, *, text_col: str = "text", L: int = 4,
                   min_terms: int = 2, num_partitions: int = 8):
    """Anagram groups over the corpus' distinct ``L``-character windows
    (the :func:`~tsdownsample_ray.stages.grams.char_window_pairs`
    granularity): windows bucketed by sorted-character signature; emits
    ``(sig, n_terms, min_token)`` for signatures shared by >=
    ``min_terms`` distinct windows — char-multiset blocking, the same
    family as Soundex phonetic blocks and ed2 deletion neighborhoods.

    Scale shape: per-block distinct collapses each block to its window
    vocabulary BEFORE the shuffle (bounded by alphabet^L, not corpus
    size), signatures are computed fully vectorized (fixed-width utf-32
    view, one ``np.sort(axis=1)`` — no Python per window), then ONE
    hash(signature) shuffle groups collided multisets; cross-block
    duplicate windows are re-deduped inside the group. Codepoint sort
    and the oracle's ``list_sort``/``min`` agree because UTF-8 byte
    order equals codepoint order."""
    from .grams import char_window_pairs

    mod = num_partitions * 64

    def _sigs(b: pa.Table) -> pa.Table:
        pairs = char_window_pairs(b, L=L, text_col=text_col,
                                  id_col=b.column_names[0])
        u = pc.unique(pairs["gram"])
        if isinstance(u, pa.ChunkedArray):
            u = u.combine_chunks()
        if len(u) == 0:
            return pa.table({"sig": pa.array([], pa.string()),
                             "token": pa.array([], pa.string()),
                             "__part": pa.array([], pa.int64())})
        codes = np.asarray(u.to_numpy(zero_copy_only=False),
                           dtype=f"<U{L}").view(np.uint32).reshape(-1, L)
        sigs = np.ascontiguousarray(
            np.sort(codes, axis=1)).view(f"<U{L}").ravel()
        t = pa.table({"sig": pa.array(sigs), "token": u})
        h = stable_part_codes(t["sig"], mod)
        return t.append_column("__part", pa.array(h))

    def _merge(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        # cross-block duplicates of the same token collapse here
        d = t.group_by(["sig", "token"]).aggregate([])
        m = d.group_by(["sig"]).aggregate(
            [("token", "count"), ("token", "min")])
        m = rename_agg(m, {"sig": "sig", "token_count": "n_terms",
                           "token_min": "min_token"})
        return m.filter(pc.greater_equal(m["n_terms"],
                                         pa.scalar(min_terms, pa.int64())))

    parted = ds.map_batches(_sigs, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _merge, batch_format="pyarrow")


def front_code_stats(ds, *, text_col: str = "text",
                     num_partitions: int = 8):
    """Front-coding statistics over the sorted corpus vocabulary: per
    FIRST-CHARACTER block, the distinct-term count, total codepoints,
    total longest-common-prefix codepoints with each term's sorted
    predecessor, and the saved ratio (one pinned IEEE quotient) —
    ``(first_char, n_terms, sum_len, sum_lcp, saved_ratio)``.

    Grouping by first character makes blocks independent (a block's
    first term has LCP 0 by construction: its global predecessor starts
    with a different character), so the layout is embarrassingly
    parallel: per-block distinct, ONE hash(first-char) shuffle, then a
    per-group sort + a predecessor walk bounded by vocab size."""
    mod = num_partitions * 64

    def _first(b: pa.Table) -> pa.Table:
        u = _distinct_tokens_block(b, text_col)
        fc = pc.utf8_slice_codeunits(u, 0, 1)
        t = pa.table({"first_char": fc, "token": u})
        h = stable_part_codes(t["first_char"], mod)
        return t.append_column("__part", pa.array(h))

    def _stats(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        d = t.group_by(["first_char", "token"]).aggregate([])
        d = d.take(pc.sort_indices(d, sort_keys=[
            ("first_char", "ascending"), ("token", "ascending")]))
        fcs = d["first_char"].to_pylist()
        toks = d["token"].to_pylist()
        agg: dict[str, list[int]] = {}
        prev_fc = None
        prev_tok = None
        for fc, tok in zip(fcs, toks):
            if fc != prev_fc:
                agg[fc] = [0, 0, 0]
                prev_tok = None
            a = agg[fc]
            a[0] += 1
            a[1] += len(tok)
            if prev_tok is not None:
                lim = min(len(tok), len(prev_tok))
                lcp = 0
                while lcp < lim and tok[lcp] == prev_tok[lcp]:
                    lcp += 1
                a[2] += lcp
            prev_fc, prev_tok = fc, tok
        keys = list(agg)
        n = pa.array([agg[k][0] for k in keys], pa.int64())
        sl = pa.array([agg[k][1] for k in keys], pa.int64())
        sp = pa.array([agg[k][2] for k in keys], pa.int64())
        ratio = pc.divide(pc.cast(sp, pa.float64()),
                          pc.cast(sl, pa.float64()))
        return pa.table({"first_char": pa.array(keys, pa.string()),
                         "n_terms": n, "sum_len": sl, "sum_lcp": sp,
                         "saved_ratio": ratio})

    parted = ds.map_batches(_first, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _stats, batch_format="pyarrow")
