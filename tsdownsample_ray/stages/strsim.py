"""String-similarity join: all vocabulary term pairs within edit
distance 1 (typo mining / spelling-variant clustering) via FastSS
deletion neighborhoods (Bocek et al. 2007) — candidates from shared
1-deletion variants, then an exact Levenshtein-≤1 verify.

Scale shape: the candidate key space is the deletion neighborhood
(|term|+1 variants per term), so the only exchange is ONE hash(variant)
shuffle of (variant, term) rows; pairs emerge inside each variant
bucket. Verification touches candidate PAIRS (vocabulary-neighborhood
sized, never corpus sized); the per-pair check is O(len) on short terms
and runs inside the bucket pass. A final hash-partitioned distinct
dedupes pairs found via multiple shared variants.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["ed1_pairs", "ed2_pairs", "soundex", "soundex_blocks",
           "weighted_jaccard_pairs", "transposition_pairs"]


def _ed_le1(a: str, b: str) -> bool:
    """Exact edit-distance <= 1 for short tokens."""
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) <= 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    # b is a plus one inserted char
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def _ed(a: str, b: str) -> int:
    """Exact Levenshtein distance (full DP — verify-phase only: inputs
    are vocabulary-neighborhood candidate pairs of short tokens)."""
    la, lb = len(a), len(b)
    if la < lb:
        a, b, la, lb = b, a, lb, la
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        ca = a[i - 1]
        for j in range(1, lb + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (ca != b[j - 1]))
        prev = cur
    return prev[lb]


def _fastss_pairs(terms_ds, *, term_col: str, num_partitions: int,
                  variants_of, pair_fn, schema: list, distinct):
    """Shared FastSS scaffold of :func:`ed1_pairs` / :func:`ed2_pairs`:
    ONE hash(variant) shuffle of (variant, term) rows, per-bucket
    sorted-set all-pairs verify, then a hash-partitioned distinct over
    the pair stream.

    ``variants_of(term)`` yields the term's deletion-neighborhood keys
    (term included); ``pair_fn(a, b)`` returns the verified pair's
    column values (ordered like ``schema``) or None; ``schema`` is the
    ``[(name, pa_type), ...]`` of the pair stream (first column is the
    final partition key); ``distinct(table)`` dedupes one partition."""
    from ..arrow_utils import stable_part_codes

    mod = num_partitions * 64

    def _variants(b: pa.Table) -> pa.Table:
        col = b[term_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        keys, names = [], []
        for t in col.to_pylist():  # vocabulary rows, not corpus rows
            vs = list(variants_of(t))
            keys.extend(vs)
            names.extend([t] * len(vs))
        return pa.table({"variant": pa.array(keys, pa.string()),
                         "term": pa.array(names, pa.string())})

    def _part_on(col_name: str):
        def _p(b: pa.Table) -> pa.Table:
            h = stable_part_codes(b[col_name], None)
            return b.append_column(
                "__part", pa.array((h % np.uint64(mod)).astype(np.int32)))
        return _p

    def _empty() -> pa.Table:
        return pa.table({name: pa.array([], typ) for name, typ in schema})

    def _bucket_pairs(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        if t.num_rows < 2:
            return _empty()
        t = t.take(pc.sort_indices(t, sort_keys=[
            ("variant", "ascending"), ("term", "ascending")]))
        var = t["variant"].to_pylist()
        term = t["term"].to_pylist()
        rows = {name: [] for name, _ in schema}
        i = 0
        n = len(var)
        while i < n:
            j = i
            while j < n and var[j] == var[i]:
                j += 1
            bucket = sorted(set(term[i:j]))
            for x in range(len(bucket)):
                for y in range(x + 1, len(bucket)):
                    vals = pair_fn(bucket[x], bucket[y])
                    if vals is not None:
                        for (name, _), v in zip(schema, vals):
                            rows[name].append(v)
            i = j
        return pa.table({name: pa.array(rows[name], typ)
                         for name, typ in schema})

    def _distinct(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        if t.num_rows == 0:
            return _empty()
        return distinct(t)

    cands = (terms_ds.map_batches(_variants, batch_format="pyarrow")
             .map_batches(_part_on("variant"), batch_format="pyarrow")
             .repartition(num_partitions).groupby("__part")
             .map_groups(_bucket_pairs, batch_format="pyarrow"))
    return (cands.map_batches(_part_on(schema[0][0]),
                              batch_format="pyarrow")
            .repartition(num_partitions).groupby("__part")
            .map_groups(_distinct, batch_format="pyarrow"))


def ed1_pairs(terms_ds, *, term_col: str = "token",
              num_partitions: int = 8):
    """(a < b) term pairs with Levenshtein distance exactly <= 1
    (excluding identical terms). ``terms_ds`` holds DISTINCT terms."""

    def _variants_of(t: str) -> list:
        return [t] + [t[:i] + t[i + 1:] for i in range(len(t))]

    return _fastss_pairs(
        terms_ds, term_col=term_col, num_partitions=num_partitions,
        variants_of=_variants_of,
        pair_fn=lambda a, b: (a, b) if _ed_le1(a, b) else None,
        schema=[("a", pa.string()), ("b", pa.string())],
        distinct=lambda t: t.group_by(["a", "b"]).aggregate([]))


def ed2_pairs(terms_ds, *, term_col: str = "token",
              num_partitions: int = 8):
    """(a < b) term pairs with Levenshtein distance in [1, 2] plus the
    exact distance — FastSS at depth 2 (Bocek et al. 2007): two terms
    are within edit distance k iff their <=k-deletion neighborhoods
    intersect, so candidates come from ONE hash shuffle of
    (variant, term) rows over the 1 + L + C(L,2) depth-2 deletion keys
    per vocabulary term, and each bucket verifies its pairs with the
    exact DP. Output (a, b, dist). Same distinct/dedup tail as
    :func:`ed1_pairs` (min over the duplicate pair stream — every
    duplicate carries the same exact distance)."""

    def _variants_of(t: str) -> set:
        vs = {t}
        for i in range(len(t)):
            d1 = t[:i] + t[i + 1:]
            vs.add(d1)
            for j in range(len(d1)):
                vs.add(d1[:j] + d1[j + 1:])
        return vs

    def _pair(a: str, b: str):
        d = _ed(a, b)
        return (a, b, d) if 1 <= d <= 2 else None

    def _distinct(t: pa.Table) -> pa.Table:
        g2 = t.group_by(["a", "b"]).aggregate([("dist", "min")])
        return pa.table({"a": g2["a"], "b": g2["b"],
                         "dist": g2["dist_min"]})

    return _fastss_pairs(
        terms_ds, term_col=term_col, num_partitions=num_partitions,
        variants_of=_variants_of, pair_fn=_pair,
        schema=[("a", pa.string()), ("b", pa.string()),
                ("dist", pa.int64())],
        distinct=_distinct)


_SOUNDEX_CODE = {}
for _grp, _c in (("bfpv", "1"), ("cgjkqsxz", "2"), ("dt", "3"),
                 ("l", "4"), ("mn", "5"), ("r", "6")):
    for _ch in _grp:
        _SOUNDEX_CODE[_ch] = _c


def soundex(term: str) -> str:
    """American Soundex (the SQL-Server/Oracle variant): first letter +
    3 digits; H/W are TRANSPARENT (do not reset the previous code),
    vowels separate (reset it), consecutive equal codes collapse.
    Lower-case [a-z]+ input contract (callers filter)."""
    first = term[0]
    prev = _SOUNDEX_CODE.get(first, "0")
    out = [first.upper()]
    for ch in term[1:]:
        if ch in "hw":
            continue
        c = _SOUNDEX_CODE.get(ch, "0")
        if c != "0" and c != prev and len(out) < 4:
            out.append(c)
        prev = c
    return "".join(out) + "0" * (4 - len(out))


def soundex_blocks(ds, *, text_col: str = "text", num_partitions: int = 4):
    """Phonetic blocking over the corpus VOCABULARY (the classic
    record-linkage blocking key; Russell 1918 / Knuth TAOCP 3): every
    distinct [a-z]+ token's American Soundex, grouped into blocks —
    per code ``(code, n_terms, min_term)``.

    Scale shape: tokens dictionary-encode per batch so soundex runs
    once per batch-UNIQUE term (bounded by vocabulary, not corpus —
    the ``ed2_pairs`` contract); (code, term) pairs dedup through one
    hashpart distinct, block stats in the same reduce. The SQL oracle
    replays the letter walk with a recursive CTE per distinct term."""
    from ..arrow_utils import group_codes, stable_part_codes

    mod = num_partitions * 64

    def _pairs(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b[text_col], " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.values
        uniq = pc.unique(flat)
        keep = pc.match_substring_regex(uniq, "^[a-z]+$")
        uniq = uniq.filter(keep)
        terms = uniq.to_pylist()
        codes = [soundex(t) for t in terms]
        t = pa.table({"code": pa.array(codes, pa.string()),
                      "term": uniq})
        h = stable_part_codes(t["code"], None)  # co-locate per CODE
        return t.append_column(
            "__part", pa.array((h % np.uint64(mod)).astype(np.int32)))

    def _blocks(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        empty = pa.table({"code": pa.array([], pa.string()),
                          "n_terms": pa.array([], pa.int64()),
                          "min_term": pa.array([], pa.string())})
        if t.num_rows == 0:
            return empty
        d = t.group_by(["code", "term"]).aggregate([])  # distinct pairs
        agg = d.group_by(["code"]).aggregate([("term", "count"),
                                              ("term", "min")])
        from ..arrow_utils import rename_agg

        return rename_agg(agg, {"code": "code", "term_count": "n_terms",
                                "term_min": "min_term"})

    pairs = ds.map_batches(_pairs, batch_format="pyarrow")
    return pairs.repartition(num_partitions).groupby("__part").map_groups(
        _blocks, batch_format="pyarrow")



def weighted_jaccard_pairs(ds, *, id_col: str = "doc_id",
                           text_col: str = "text",
                           group_col: str = "source",
                           num_partitions: int = 8):
    """Exact WEIGHTED Jaccard similarity between each document's
    term-frequency vector and its SUCCESSOR WITHIN THE SAME
    ``group_col`` value (next ``id_col`` in that group):
    ``J_w = sum_t min(c_a[t], c_b[t]) / sum_t max(c_a[t], c_b[t])`` —
    the multiset generalization the MinHash stage only approximates,
    exact on the bounded consecutive-pair set (the snapshot-to-snapshot
    drift measure).

    Exactness: ``num``/``den`` exact int64; ``wjac`` the one pinned
    IEEE quotient. Pairs whose union is empty (both docs token-free)
    are dropped, mirroring the SQL aggregate-over-nothing convention.

    Scale shape: ONE hash(group) shuffle of the raw documents (the
    same co-location contract as the per-source vocabulary queries:
    group cardinality >> partitions), then per partition one sort, one
    vectorized tokenize + per-doc count pass, and one arrow group_by
    per (pair, token) — each doc's vector enters pair ``r`` (as left)
    and pair ``r - 1`` (as right) by LOCAL row number, so no
    doc-to-doc join and no driver-side pair map exist anywhere."""
    from ..arrow_utils import make_add_part, rename_agg

    mod = num_partitions * 64

    _add_part = make_add_part(group_col, mod)

    def _pairs(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        empty = pa.table({"doc_a": pa.array([], pa.int64()),
                          "doc_b": pa.array([], pa.int64()),
                          "num": pa.array([], pa.int64()),
                          "den": pa.array([], pa.int64()),
                          "wjac": pa.array([], pa.float64())})
        if t.num_rows < 2:
            return empty
        t = t.take(pc.sort_indices(t, sort_keys=[
            (group_col, "ascending"), (id_col, "ascending")]))
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        grp = t[group_col]
        if isinstance(grp, pa.ChunkedArray):
            grp = grp.combine_chunks()
        from ..arrow_utils import group_codes

        codes = group_codes(grp)
        n_doc = t.num_rows
        # row r is LEFT of pair r iff row r+1 is in the same group
        left_ok = np.zeros(n_doc, dtype=bool)
        left_ok[:-1] = codes[1:] == codes[:-1]
        right_ok = np.zeros(n_doc, dtype=bool)
        right_ok[1:] = left_ok[:-1]
        toks = pc.split_pattern(t[text_col], " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.values
        off = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        row = np.repeat(np.arange(n_doc, dtype=np.int64), np.diff(off))
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        row = row[keep]
        pd_tbl = pa.table({"row": pa.array(row), "token": flat,
                           "one": pa.array(np.ones(len(row), np.int64))})
        per_doc = pd_tbl.group_by(["row", "token"]).aggregate(
            [("one", "sum")])
        per_doc = rename_agg(per_doc, {"row": "row", "token": "token",
                                       "one_sum": "cnt"})
        prow = per_doc["row"].to_numpy(zero_copy_only=False)
        ptok = per_doc["token"]
        if isinstance(ptok, pa.ChunkedArray):
            ptok = ptok.combine_chunks()
        pcnt = per_doc["cnt"].to_numpy(zero_copy_only=False)
        l_sel = np.flatnonzero(left_ok[prow])
        r_sel = np.flatnonzero(right_ok[prow])
        if len(l_sel) == 0 and len(r_sel) == 0:
            return empty
        zero_l = np.zeros(len(l_sel), np.int64)
        zero_r = np.zeros(len(r_sel), np.int64)
        left = pa.table({"pair": pa.array(prow[l_sel]),
                         "token": ptok.take(pa.array(l_sel)),
                         "lc": pa.array(pcnt[l_sel]),
                         "rc": pa.array(zero_l)})
        right = pa.table({"pair": pa.array(prow[r_sel] - 1),
                          "token": ptok.take(pa.array(r_sel)),
                          "lc": pa.array(zero_r),
                          "rc": pa.array(pcnt[r_sel])})
        both = pa.concat_tables([left, right])
        per_tok = both.group_by(["pair", "token"]).aggregate(
            [("lc", "sum"), ("rc", "sum")])
        per_tok = rename_agg(per_tok, {"pair": "pair", "token": "token",
                                       "lc_sum": "lc", "rc_sum": "rc"})
        lc = per_tok["lc"].to_numpy(zero_copy_only=False)
        rc = per_tok["rc"].to_numpy(zero_copy_only=False)
        per_tok = per_tok.append_column("mn", pa.array(np.minimum(lc, rc)))
        per_tok = per_tok.append_column("mx", pa.array(np.maximum(lc, rc)))
        agg = per_tok.group_by(["pair"]).aggregate(
            [("mn", "sum"), ("mx", "sum")])
        agg = rename_agg(agg, {"pair": "pair", "mn_sum": "num",
                               "mx_sum": "den"})
        agg = agg.filter(pc.greater(agg["den"], pa.scalar(0, pa.int64())))
        pr = agg["pair"].to_numpy(zero_copy_only=False).astype(np.int64)
        num = agg["num"].to_numpy(zero_copy_only=False).astype(np.int64)
        den = agg["den"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "doc_a": pa.array(ids[pr]), "doc_b": pa.array(ids[pr + 1]),
            "num": pa.array(num), "den": pa.array(den),
            "wjac": pa.array(num.astype(np.float64)
                             / den.astype(np.float64), pa.float64())})

    parted = ds.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _pairs, batch_format="pyarrow")


def transposition_pairs(ds, *, text_col: str = "text", L: int = 4,
                        num_partitions: int = 8):
    """All DISTINCT ``L``-character-window pairs that differ by exactly
    one ADJACENT TRANSPOSITION (the Damerau operation the
    Levenshtein-based ``ed1_pairs``/``ed2_pairs`` neighborhoods treat
    as distance 2): for every distinct window, each of its ``L-1``
    adjacent swaps is a candidate key; a pair emerges when the swapped
    string IS another distinct window. Output
    ``(term_a, term_b)`` with ``term_a < term_b``, deduped.

    Scale shape: per-block distinct windows (bounded by alphabet^L),
    swap variants generated vectorized on the fixed-width utf-32
    matrix (one column swap per position — no Python per window), ONE
    hash(key) shuffle where variant rows meet term rows, and a final
    hash-partitioned distinct on the canonical pair."""
    from ..arrow_utils import rename_agg, stable_part_codes
    from .grams import char_window_pairs

    mod = num_partitions * 64

    def _cands(b: pa.Table) -> pa.Table:
        pairs = char_window_pairs(b, L=L, text_col=text_col,
                                  id_col=b.column_names[0])
        u = pc.unique(pairs["gram"])
        if isinstance(u, pa.ChunkedArray):
            u = u.combine_chunks()
        empty = pa.table({"key": pa.array([], pa.string()),
                          "orig": pa.array([], pa.string()),
                          "is_term": pa.array([], pa.int8()),
                          "__part": pa.array([], pa.int64())})
        if len(u) == 0:
            return empty
        mat = np.asarray(u.to_numpy(zero_copy_only=False),
                         dtype=f"<U{L}").view(np.uint32).reshape(-1, L)
        keys = [u]
        origs = [u]
        kinds = [np.ones(len(u), np.int8)]
        for i in range(L - 1):
            diff = mat[:, i] != mat[:, i + 1]
            if not diff.any():
                continue
            sw = mat[diff].copy()
            sw[:, [i, i + 1]] = sw[:, [i + 1, i]]
            var = pa.array(np.ascontiguousarray(sw).view(f"<U{L}").ravel())
            keys.append(var)
            origs.append(u.filter(pa.array(diff)))
            kinds.append(np.zeros(int(diff.sum()), np.int8))
        t = pa.table({"key": pa.concat_arrays(
                          [k.cast(pa.string()) for k in keys]),
                      "orig": pa.concat_arrays(
                          [o.cast(pa.string()) for o in origs]),
                      "is_term": pa.array(np.concatenate(kinds))})
        h = stable_part_codes(t["key"], mod)
        return t.append_column("__part", pa.array(h))

    def _match(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        empty = pa.table({"term_a": pa.array([], pa.string()),
                          "term_b": pa.array([], pa.string()),
                          "__part": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        terms = t.filter(pc.equal(t["is_term"], pa.scalar(1, pa.int8())))
        real = terms.group_by(["key"]).aggregate([])
        variants = t.filter(pc.equal(t["is_term"], pa.scalar(0, pa.int8())))
        if real.num_rows == 0 or variants.num_rows == 0:
            return empty
        vj = variants.select(["key", "orig"]).join(
            real, keys=["key"], join_type="inner")
        vj = vj.filter(pc.not_equal(vj["key"], vj["orig"]))
        if vj.num_rows == 0:
            return empty
        a = pc.min_element_wise(vj["key"], vj["orig"])
        bcol = pc.max_element_wise(vj["key"], vj["orig"])
        out = pa.table({"term_a": a, "term_b": bcol})
        out = out.group_by(["term_a", "term_b"]).aggregate([])
        h = stable_part_codes(out["term_a"], mod)
        return out.append_column("__part", pa.array(h))

    def _dedup(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        return t.group_by(["term_a", "term_b"]).aggregate([])

    parted = ds.map_batches(_cands, batch_format="pyarrow")
    matched = parted.repartition(num_partitions).groupby(
        "__part").map_groups(_match, batch_format="pyarrow")
    return matched.repartition(num_partitions).groupby("__part").map_groups(
        _dedup, batch_format="pyarrow")
