"""Mergeable sketches: HyperLogLog distinct counting over a keyed column.

The scale pattern from the ray guide: emit ONE serialized sketch per key per
batch inside ``map_batches`` (vectorized register updates), merge sketches
with an elementwise max in a tiny combine stage — the shuffle moves
``|keys| x 2^p`` bytes instead of the raw values.

Pure NumPy HLL (Flajolet et al. 2007): ``p``-bit bucket index from the top
of a 64-bit hash, rank = leading-zero count of the remainder + 1, registers
= per-bucket max rank, estimate = alpha * m^2 / sum(2^-reg) with the
standard small-range (linear counting) correction.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
from ..arrow_utils import group_codes

__all__ = ["hll_sketch_batch", "hll_merge", "hll_estimate",
           "distinct_approx", "cms_token_counts", "kmv_distinct",
           "log2hist_quantiles", "ams_f2", "ams_coeffs",
           "linear_count"]


def _hash64(values: list[str]) -> np.ndarray:
    return np.fromiter(
        (int.from_bytes(hashlib.blake2b(v.encode(), digest_size=8).digest(),
                        "big") for v in values),
        dtype=np.uint64, count=len(values))


def _ranks_and_buckets(hashes: np.ndarray, p: int) -> tuple:
    """Vectorized (bucket index, rank) per hash — the two HLL register
    coordinates. rank = leading zeros of the (p-shifted, sentinel-padded)
    remainder + 1, computed exactly (float log2 candidate + shift check)."""
    idx = (hashes >> np.uint64(64 - p)).astype(np.int64)
    rem = (hashes << np.uint64(p)) | np.uint64(1 << (p - 1))  # sentinel bit
    e = np.floor(np.log2(rem.astype(np.float64))).astype(np.int64)
    e = np.minimum(e, 63)
    over = (rem >> e.astype(np.uint64)) == 0  # rounded up -> exponent -1
    e[over] -= 1
    rank = (64 - e).astype(np.uint8)  # = leading_zeros(rem) + 1
    return idx, rank


def _registers(hashes: np.ndarray, p: int) -> np.ndarray:
    m = 1 << p
    idx = (hashes >> np.uint64(64 - p)).astype(np.int64)
    rem = (hashes << np.uint64(p)) | np.uint64(1 << (p - 1))  # sentinel bit
    # rank = leading zeros of rem + 1. log2 gives a candidate exponent but
    # float64 rounding can bump values just below a power of two UP one
    # exponent (e.g. 2^63-1 -> 2^63); correct exactly with a shift check.
    e = np.floor(np.log2(rem.astype(np.float64))).astype(np.int64)
    e = np.minimum(e, 63)
    over = (rem >> e.astype(np.uint64)) == 0  # rounded up -> exponent -1
    e[over] -= 1
    rank = (64 - e).astype(np.uint8)  # = leading_zeros(rem) + 1
    regs = np.zeros(m, dtype=np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_sketch_batch(batch: pa.Table, *, key_col: str, value_col: str,
                     p: int = 12) -> pa.Table:
    """One (key, sketch) row per key per batch — fully vectorized: values
    are dictionary-encoded so each batch-UNIQUE value is blake2b-hashed
    ONCE (duplicates gather their hash via the dictionary indices — max is
    idempotent, so repeats cost nothing), keys are dictionary-encoded into
    dense group ids, and all registers update in a single flat
    ``np.maximum.at`` scatter over a ``(n_keys, 2^p)`` grid. No Python
    loop over rows."""
    m = 1 << p
    if batch.num_rows == 0:
        return pa.table({key_col: batch[key_col],
                         "hll": pa.array([], pa.binary())})
    keys = batch[key_col]
    vals = batch[value_col]
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    if isinstance(vals, pa.ChunkedArray):
        vals = vals.combine_chunks()
    kenc = keys.dictionary_encode()
    venc = vals.dictionary_encode()
    uh = _hash64(venc.dictionary.to_pylist())  # one digest per unique value
    vh = uh[venc.indices.to_numpy(zero_copy_only=False).astype(np.int64)]
    kidx = kenc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    n_keys = len(kenc.dictionary)
    bucket, rank = _ranks_and_buckets(vh, p)
    regs = np.zeros(n_keys * m, dtype=np.uint8)
    np.maximum.at(regs, kidx * m + bucket, rank)
    regs = regs.reshape(n_keys, m)
    return pa.table({key_col: kenc.dictionary,
                     "hll": pa.array([regs[i].tobytes()
                                      for i in range(n_keys)], pa.binary())})


def hll_merge(sketches: list[bytes]) -> bytes:
    regs = np.frombuffer(sketches[0], dtype=np.uint8).copy()
    for s in sketches[1:]:
        np.maximum(regs, np.frombuffer(s, dtype=np.uint8), out=regs)
    return regs.tobytes()


def hll_estimate(sketch: bytes) -> float:
    regs = np.frombuffer(sketch, dtype=np.uint8)
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting small-range correction
    return float(est)


def distinct_approx(ds, *, key_col: str, value_col: str, p: int = 12):
    """Approximate distinct(value) per key: per-batch sketches -> per-key
    sketch merge -> estimate. Returns (key, distinct_est: int64)."""
    sketches = ds.map_batches(
        lambda b: hll_sketch_batch(b, key_col=key_col, value_col=value_col, p=p),
        batch_format="pyarrow")

    def _merge_group(g: pa.Table) -> pa.Table:
        merged = hll_merge(g["hll"].to_pylist())
        return pa.table({
            key_col: g[key_col][:1],
            "distinct_est": pa.array([int(round(hll_estimate(merged)))],
                                     pa.int64()),
        })

    return sketches.groupby(key_col).map_groups(_merge_group,
                                                batch_format="pyarrow")


def cms_token_counts(ds, *, text_col: str = "text", depth: int = 4,
                     width: int = 32, num_partitions: int = 8):
    """Count-min sketch of corpus token frequencies, verified against the
    exact counts (Cormode & Muthukrishnan 2005).

    The sketch is the 100 TB story: each block folds its own tokens into
    ``depth x width`` integer cells LOCALLY — no token string ever leaves
    the block — and the cells merge ADDITIVELY through the standard
    hashpart grouped sum (the exchange carries <= depth*width rows per
    block, a constant). The merged sketch (<= depth*width rows) is the
    only driver materialization, broadcast back with ``ray.put``. The
    exact counts (ONE hash(token) shuffle) exist here to verify the
    one-sided error bound; a production pipeline keeps just the sketch.

    Hashing: md5-u64 per batch-UNIQUE token (``dedup._hash_unique_tokens``
    — SQL-restatable), row ``r``'s bucket = ``hash61(h, salt=r) % width``
    (``sampling.hash61``, already SQL-replayed). Output one row per
    distinct token: ``(token, exact_n, est_n, overcount)`` with
    ``est_n >= exact_n`` always (CMS never undercounts).

    No counterpart in the reference (kernel library only).
    """
    import ray
    import pyarrow.compute as pc

    from ..arrow_utils import rename_agg
    from .dedup import _hash_unique_tokens
    from .graph import grouped_sum_parts
    from .sampling import hash61

    def _tok_counts(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b[text_col], " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        t = pa.table({"token": toks.values,
                      "c": pa.array(np.ones(len(toks.values), np.int64))})
        t = t.filter(pc.not_equal(t["token"], ""))
        g = t.group_by(["token"]).aggregate([("c", "sum")])
        return rename_agg(g, {"token": "token", "c_sum": "c"})

    def _buckets(tokens: list) -> np.ndarray:
        """(depth, n) bucket indices for a list of unique tokens."""
        uh = _hash_unique_tokens(tokens, None)
        return np.stack([
            (hash61(uh, salt=r) % np.uint64(width)).astype(np.int64)
            for r in range(depth)])

    def _cells(b: pa.Table) -> pa.Table:
        t = _tok_counts(b)
        if t.num_rows == 0:
            return pa.table({"r": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        bkts = _buckets(t["token"].to_pylist())
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(c)
        return pa.table({
            "r": pa.array(np.repeat(np.arange(depth, dtype=np.int64), n)),
            "bucket": pa.array(bkts.ravel()),
            "c": pa.array(np.tile(c, depth)),
        })

    cells = grouped_sum_parts(
        ds.map_batches(_cells, batch_format="pyarrow"),
        ["r", "bucket"], ["c"], count_col=None, fanin=2)
    grid = np.zeros((depth, width), dtype=np.int64)
    for row in cells.take_all():  # <= depth*width rows: bounded constant
        grid[row["r"], row["bucket"]] = row["c"]
    grid_ref = ray.put(grid)

    exact = grouped_sum_parts(
        ds.map_batches(_tok_counts, batch_format="pyarrow"),
        ["token"], ["c"], count_col=None, fanin=num_partitions)

    def _estimate(b: pa.Table) -> pa.Table:
        g = ray.get(grid_ref)
        if b.num_rows == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "exact_n": pa.array([], pa.int64()),
                             "est_n": pa.array([], pa.int64()),
                             "overcount": pa.array([], pa.int64())})
        tok = b["token"]
        if isinstance(tok, pa.ChunkedArray):
            tok = tok.combine_chunks()
        bkts = _buckets(tok.to_pylist())
        est = np.min(
            np.stack([g[r][bkts[r]] for r in range(depth)]), axis=0)
        exact_n = b["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"token": tok, "exact_n": pa.array(exact_n),
                         "est_n": pa.array(est),
                         "overcount": pa.array(est - exact_n)})

    return exact.map_batches(_estimate, batch_format="pyarrow")


def kmv_distinct(ds, *, key_col: str, value_col: str, k: int = 64,
                 fanin: int = 8):
    """KMV (k-minimum-values) distinct-count sketch per key (Bar-Yossef
    et al., RANDOM 2002): keep the k smallest DISTINCT md5-u64 hashes of
    ``value_col``; estimate = (k-1) * 2^64 // kth_min when k values were
    kept, else the exact kept count. Unlike HLL the whole sketch is
    order-invariant set algebra (k smallest of a union), so the ESTIMATE
    itself is SQL-replayable bit-exactly (DuckDB md5 -> HUGEINT, row_number
    <= k) — not just an accuracy band. Output: ``(key_col, kmv_kept,
    kmv_est)`` int64 (estimate clamped to 2^62 both sides — an
    adversarially tiny kth hash cannot overflow the BIGINT cast).

    Scale shape: per batch, values dictionary-encode and only UNIQUE
    values md5 (the dedup._hash_unique_tokens pattern); each batch emits
    at most k hashes per key (vectorized lexsort + segment heads), the
    one shuffle moves <= |keys| x k u64 cells, and the per-key merge is
    again take-k-smallest."""
    import pyarrow.compute as pc

    from ..arrow_utils import rename_agg, stable_part_codes  # noqa: F401
    from .dedup import _hash_unique_tokens

    mod = fanin * 64
    CAP = np.int64(1) << np.int64(62)

    def _topk_per_key(keys_arr: pa.Array, hashes: np.ndarray) -> pa.Table:
        """(key, hash) rows -> per-key k smallest distinct hashes."""
        codes = group_codes(keys_arr)
        order = np.lexsort((hashes, codes))
        c, h = codes[order], hashes[order]
        # distinct within key
        first = np.ones(len(c), dtype=bool)
        first[1:] = (c[1:] != c[:-1]) | (h[1:] != h[:-1])
        c, h, order = c[first], h[first], order[first]
        # rank within key
        heads = np.ones(len(c), dtype=bool)
        heads[1:] = c[1:] != c[:-1]
        seg = np.flatnonzero(heads)
        rank = np.arange(len(c)) - np.repeat(seg, np.diff(
            np.append(seg, len(c))))
        keep = rank < k
        return pa.table({
            key_col: keys_arr.take(pa.array(order[keep])),
            # u64 hash stored SHIFTED by 2^63 into int64 — the shift is
            # order-preserving over the full u64 range, so min-k / sort
            # semantics survive the signed storage
            "__h": pa.array((h[keep] - np.uint64(1 << 63)).astype(np.int64)),
        })

    def _partial(b: pa.Table) -> pa.Table:
        kv = b.select([key_col, value_col])
        # SQL count(DISTINCT v) ignores NULLs — and a null dictionary
        # index would NaN-poison the uniq_h fancy-index below anyway
        kv = kv.filter(pc.is_valid(kv[value_col]))
        v = kv[value_col]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        d = v.dictionary_encode()
        uniq_h = _hash_unique_tokens(d.dictionary.to_pylist(), None)
        hashes = uniq_h[d.indices.to_numpy(zero_copy_only=False)]
        keys_arr = kv[key_col]
        if isinstance(keys_arr, pa.ChunkedArray):
            keys_arr = keys_arr.combine_chunks()
        t = _topk_per_key(keys_arr, hashes)
        h = stable_part_codes(t[key_col], None)
        return t.append_column(
            "__part", pa.array((h % np.uint64(mod)).astype(np.int32)))

    def _merge(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        ktype = t[key_col].type
        if t.num_rows == 0:
            return pa.table({key_col: pa.array([], ktype),
                             "kmv_kept": pa.array([], pa.int64()),
                             "kmv_est": pa.array([], pa.int64())})
        keys_arr = t[key_col]
        if isinstance(keys_arr, pa.ChunkedArray):
            keys_arr = keys_arr.combine_chunks()
        hs = (t["__h"].to_numpy(zero_copy_only=False).astype(np.int64)
              .astype(np.uint64) + np.uint64(1 << 63))
        mt = _topk_per_key(keys_arr, hs)
        mk = mt[key_col]
        if isinstance(mk, pa.ChunkedArray):
            mk = mk.combine_chunks()
        codes = group_codes(mk)
        h2 = (mt["__h"].to_numpy(zero_copy_only=False).astype(np.int64)
              .astype(np.uint64) + np.uint64(1 << 63))
        heads = np.ones(len(codes), dtype=bool)
        heads[1:] = codes[1:] != codes[:-1]
        seg = np.flatnonzero(heads)
        cnt = np.diff(np.append(seg, len(codes)))
        kth = h2[np.minimum(seg + k - 1, np.append(seg[1:], len(codes)) - 1)]
        est = np.empty(len(seg), dtype=np.int64)
        full = cnt >= k
        # python-int exact (k-1)*2^64 // kth, clamped; bounded rows/key
        for i in np.flatnonzero(full):
            est[i] = min((k - 1) * (1 << 64) // int(kth[i]), int(CAP))
        est[~full] = cnt[~full]
        return pa.table({
            key_col: mk.take(pa.array(seg)),
            "kmv_kept": pa.array(np.minimum(cnt, k).astype(np.int64)),
            "kmv_est": pa.array(est)})

    parted = ds.map_batches(_partial, batch_format="pyarrow")
    return parted.repartition(fanin).groupby("__part").map_groups(
        _merge, batch_format="pyarrow")


_POW2_TABLE = (np.int64(1) << np.arange(63, dtype=np.int64))


def log2hist_quantiles(ds, *, key_col: str, value_col: str,
                       quantiles=(50, 90, 99), fanin: int = 8):
    """DDSketch-style log-bucket quantile sketch with base 2 (Masson et
    al., VLDB 12(12), 2019, with the float gamma replaced by exact
    bit-length buckets): POSITIVE int64 values land in bucket
    ``floor(log2(v)) = bit_length(v) - 1``; per-key bucket counts are
    exact int64 cells (mergeable by addition, any order), and the
    q-quantile estimate is the LOWER BOUND ``2^b`` of the bucket holding
    the ``ceil(q/100 * n)``-th smallest value — a factor-2 guarantee that
    is bit-exactly SQL-replayable (``length(bin(v)) - 1``), unlike
    interpolating sketches. Output per key: ``(key_col, n, and per q:
    q{q}_bucket, q{q}_lo)``. Raises on non-positive values (callers
    offset or filter first — the contract keeps the SQL replay exact).

    Scale shape: one vectorized searchsorted per batch (63-entry power
    table), per-(key, bucket) partial counts collapse per block, the one
    shuffle moves <= |keys| x 63 count cells, per-key finalize is a
    cumsum over <= 63 cells."""
    from ..arrow_utils import rename_agg, stable_part_codes

    mod = fanin * 64
    qs = tuple(int(q) for q in quantiles)

    def _partial(b: pa.Table) -> pa.Table:
        v = b[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(v) and v.min() <= 0:
            raise ValueError("log2hist_quantiles: values must be > 0")
        bkt = np.searchsorted(_POW2_TABLE, v, side="right") - 1
        t = pa.table({key_col: b[key_col],
                      "__b": pa.array(bkt.astype(np.int64))})
        g = t.group_by([key_col, "__b"]).aggregate([([], "count_all")])
        g = rename_agg(g, {key_col: key_col, "__b": "__b",
                           "count_all": "c"})
        h = stable_part_codes(g[key_col], None)
        return g.append_column(
            "__part", pa.array((h % np.uint64(mod)).astype(np.int32)))

    def _finalize(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        ktype = t[key_col].type
        cols = {key_col: pa.array([], ktype),
                "n": pa.array([], pa.int64())}
        for q in qs:
            cols[f"q{q}_bucket"] = pa.array([], pa.int64())
            cols[f"q{q}_lo"] = pa.array([], pa.int64())
        if t.num_rows == 0:
            return pa.table(cols)
        agg = t.group_by([key_col, "__b"]).aggregate([("c", "sum")])
        agg = agg.sort_by([(key_col, "ascending"), ("__b", "ascending")])
        keys_arr = agg[key_col]
        if isinstance(keys_arr, pa.ChunkedArray):
            keys_arr = keys_arr.combine_chunks()
        codes = group_codes(keys_arr)
        bkt = agg["__b"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = agg["c_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        heads = np.ones(len(codes), dtype=bool)
        heads[1:] = codes[1:] != codes[:-1]
        seg = np.flatnonzero(heads)
        ends = np.append(seg[1:], len(codes))
        cs = np.cumsum(c)
        base = np.repeat(np.concatenate([[0], cs[ends[:-1] - 1]]),
                         ends - seg)
        run = cs - base                       # within-key cumulative count
        n_per = cs[ends - 1] - np.concatenate([[0], cs[ends[:-1] - 1]])
        out = {key_col: keys_arr.take(pa.array(seg)),
               "n": pa.array(n_per.astype(np.int64))}
        for q in qs:
            # rank = ceil(q/100 * n), 1-indexed
            rank = -(-(q * n_per) // 100)
            rank_rep = np.repeat(rank, ends - seg)
            ok = run >= rank_rep
            # first bucket per key where cumulative count reaches rank
            idx = np.full(len(seg), -1, dtype=np.int64)
            pos = np.flatnonzero(ok)
            key_of = np.searchsorted(ends, pos, side="right")
            first = np.ones(len(pos), dtype=bool)
            first[1:] = key_of[1:] != key_of[:-1]
            idx[key_of[first]] = pos[first]
            bq = bkt[idx]
            out[f"q{q}_bucket"] = pa.array(bq.astype(np.int64))
            out[f"q{q}_lo"] = pa.array(
                (np.int64(1) << bq).astype(np.int64))
        return pa.table(out)

    parted = ds.map_batches(_partial, batch_format="pyarrow")
    return parted.repartition(fanin).groupby("__part").map_groups(
        _finalize, batch_format="pyarrow")


def misra_gries_heavy(ds, *, m: int = 64, text_col: str = "text",
                      fanin: int = 4):
    """Misra-Gries heavy hitters over corpus tokens: EVERY token whose
    exact corpus count exceeds N/(m+1), found with bounded state. The
    MG guarantee makes the candidate + exact-recount layout exact: any
    globally-heavy token (count * (m+1) > N) is heavy in at least one
    block (pigeonhole over count = sum of block counts), so the union
    of per-block guarantee sets {t : count_b(t) * (m+1) > N_b} — each
    at most m tokens, computed from the block's exact
    dictionary-encoded counts — is a PROVEN superset of the answer.
    That bounded candidate set (<= blocks * m) is unioned on the driver
    (the same pass carries each block's token total as a null-token
    sentinel row, so N costs no extra scan), broadcast once
    (``ray.put``), exactly recounted map-side (membership tested on the
    block's DICTIONARY, never per occurrence; tokens never shuffle —
    only <= |candidates| partial rows do), and thresholded. Output is
    deterministic regardless of block order — unlike a streamed MG
    summary, whose residual counters are merge-order-dependent.
    """
    import pyarrow.compute as _pc
    import ray as _ray

    from .graph import grouped_sum_parts

    if m < 1:
        raise ValueError("m must be >= 1")

    def _tok_counts(b: pa.Table):
        """block vocabulary + exact per-vocab-token counts + total,
        via ONE split_pattern pass + dictionary encode (C speed)."""
        toks = _pc.split_pattern(b[text_col], " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        vals = toks.values.filter(_pc.not_equal(toks.values, ""))
        if len(vals) == 0:
            return None, None, 0
        enc = vals.dictionary_encode()
        idx = enc.indices.to_numpy(zero_copy_only=False)
        cnt = np.bincount(idx, minlength=len(enc.dictionary))
        return enc.dictionary, cnt, len(vals)

    def _block_heavy(b: pa.Table) -> pa.Table:
        vocab, cnt, nb = _tok_counts(b)
        if nb == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "nb": pa.array([], pa.int64())})
        heavy = np.flatnonzero(cnt * (m + 1) > nb)
        toks = vocab.take(pa.array(heavy, pa.int64())).to_pylist()
        # null-token sentinel carries the block's total token count
        return pa.table({"token": pa.array(toks + [None], pa.string()),
                         "nb": pa.array([0] * len(toks) + [nb],
                                        pa.int64())})

    cand_parts = ds.map_batches(_block_heavy,
                                batch_format="pyarrow").to_arrow_refs()
    cand_tbl = pa.concat_tables([_ray.get(r) for r in cand_parts])
    n_total = int(_pc.sum(cand_tbl["nb"]).as_py() or 0)
    cands = _pc.unique(cand_tbl["token"].combine_chunks()
                       .drop_null())
    cand_ref = _ray.put(cands)

    def _recount(b: pa.Table) -> pa.Table:
        cset = _ray.get(cand_ref)
        vocab, cnt, nb = _tok_counts(b)
        if nb == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        mask = _pc.is_in(vocab, value_set=cset).to_numpy(
            zero_copy_only=False)
        sel = np.flatnonzero(mask)
        return pa.table({
            "token": vocab.take(pa.array(sel, pa.int64())),
            "cnt": pa.array(cnt[sel].astype(np.int64))})

    # exact candidate recount: <= |candidates| rows per block
    partials = ds.map_batches(_recount, batch_format="pyarrow")
    summed = grouped_sum_parts(partials, ["token"], ["cnt"],
                               count_col=None, fanin=fanin)

    def _thresh(b: pa.Table) -> pa.Table:
        cnt = b["cnt"].to_numpy(zero_copy_only=False)
        keep = cnt * (m + 1) > n_total
        t = pa.table({"token": b["token"], "cnt": b["cnt"]})
        return t.filter(pa.array(keep))

    return summed.map_batches(_thresh, batch_format="pyarrow")


_AMS_P = (1 << 31) - 1  # Mersenne prime 2^31 - 1


def ams_coeffs(r: int) -> list[tuple[int, int, int, int]]:
    """Deterministic cubic-hash coefficients for ``r`` AMS counters:
    ``a_k(j) = (2654435761 * (4j + k + 1)) % p`` (Knuth's multiplicative
    constant; fixed so engine and SQL oracle share them literally)."""
    return [tuple((2654435761 * (4 * j + k + 1)) % _AMS_P
                  for k in range(4)) for j in range(r)]


def ams_f2(ds, *, key_col: str, r: int = 30, group: int = 6,
           fanin: int = 4):
    """AMS second-frequency-moment (F2) sketch (Alon, Matias & Szegedy,
    STOC 1996): ``r`` counters, counter j adding ``s_j(x) in {-1,+1}``
    per stream OCCURRENCE of key x, with the sign from a 4-wise
    cubic hash mod the Mersenne prime 2^31-1:

        x' = x % p
        h  = a3; h = (h*x' + a2) % p; h = (h*x' + a1) % p;
                 h = (h*x' + a0) % p
        s_j(x) = 1 - 2 * (h % 2)

    ``E[c_j^2] = F2 = sum_k count(k)^2``; the median over ``r/group``
    groups of the group-MEAN of ``c^2`` is the classic
    median-of-means estimate (left to the consumer — this operator
    emits the counters, which are what merges). Every step is exact
    int64 (Horner products < 2^62), so the DuckDB oracle replays the
    counters bit-identically.

    Scale shape: each block collapses to ``r`` partial counter rows
    (one (r x block_rows) vectorized Horner), ONE tiny hash(j) grouped
    sum over r keys — sketch state never exceeds r int64s per block.
    Output: ``(j, grp, c, c2)``, one row per counter."""
    coef = ams_coeffs(r)
    a3 = np.array([c[0] for c in coef], np.int64)[:, None]
    a2 = np.array([c[1] for c in coef], np.int64)[:, None]
    a1 = np.array([c[2] for c in coef], np.int64)[:, None]
    a0 = np.array([c[3] for c in coef], np.int64)[:, None]

    def _partial(b: pa.Table) -> pa.Table:
        x = (b[key_col].to_numpy(zero_copy_only=False)
             .astype(np.int64) % _AMS_P)[None, :]
        h = (a3 * x + a2) % _AMS_P
        h = (h * x + a1) % _AMS_P
        h = (h * x + a0) % _AMS_P
        c = len(x[0]) - 2 * (h & 1).sum(axis=1)  # sum of +-1 signs
        return pa.table({"j": pa.array(np.arange(r, dtype=np.int64)),
                         "c": pa.array(c.astype(np.int64))})

    parts = ds.map_batches(_partial, batch_format="pyarrow")
    summed = parts.groupby("j").sum("c")

    def _final(b: pa.Table) -> pa.Table:
        j = b["j"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = b["sum(c)"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"j": pa.array(j), "grp": pa.array(j // group),
                         "c": pa.array(c), "c2": pa.array(c * c)})

    return summed.map_batches(_final, batch_format="pyarrow")


def linear_count(ds, *, key_col: str, value_col: str, m: int = 4096,
                 fanin: int = 8):
    """Linear-counting distinct sketch per key (Whang et al., TODS
    1990): hash every value into an ``m``-cell bitmap, count the empty
    cells ``z``, estimate ``n ~ m * ln(m / z)``. The load-factor
    regime where LC beats HLL (n << m) — and, like the KMV sketch, the
    whole estimate replays bit-exactly in SQL (same md5-u64 value
    hash -> ``% m`` cell, ``count(DISTINCT cell)``, one libm ``ln``
    call on an exactly-representable integer quotient).

    Output per key: ``(key_col, occupied, zeros, lc_est)`` — ints
    exact, ``lc_est`` the pinned IEEE expression ``m * ln(m / z)``
    (``0.0`` when the bitmap saturates, CASE-replayed).

    Scale shape: per batch values dictionary-encode and only UNIQUE
    values md5 (the KMV pattern); each block emits its DISTINCT
    (key, cell) pairs — <= m cells per key per block, vocabulary-not-
    corpus sized; ONE hash(key) shuffle; per-key merge is again a
    distinct-cell count."""
    import math

    import pyarrow.compute as pc

    from ..arrow_utils import rename_agg, stable_part_codes
    from .dedup import _hash_unique_tokens

    mod = fanin * 64
    M = np.int64(m)

    def _partial(b: pa.Table) -> pa.Table:
        kv = b.select([key_col, value_col])
        kv = kv.filter(pc.is_valid(kv[value_col]))
        empty = pa.table({key_col: pa.array([], b[key_col].type),
                          "cell": pa.array([], pa.int64()),
                          "__part": pa.array([], pa.int32())})
        if kv.num_rows == 0:
            return empty
        v = kv[value_col]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        d = v.dictionary_encode()
        uniq_h = _hash_unique_tokens(d.dictionary.to_pylist(), None)
        cells = (uniq_h % np.uint64(m)).astype(np.int64)[
            d.indices.to_numpy(zero_copy_only=False)]
        keys_arr = kv[key_col]
        if isinstance(keys_arr, pa.ChunkedArray):
            keys_arr = keys_arr.combine_chunks()
        codes = group_codes(keys_arr)
        pair = codes.astype(np.int64) * M + cells
        _, first = np.unique(pair, return_index=True)
        t = pa.table({key_col: keys_arr.take(pa.array(first)),
                      "cell": pa.array(cells[first])})
        h = stable_part_codes(t[key_col], None)
        return t.append_column(
            "__part", pa.array((h % np.uint64(mod)).astype(np.int32)))

    def _merge(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        d = t.group_by([key_col, "cell"]).aggregate([])
        occ = d.group_by([key_col]).aggregate([("cell", "count")])
        occ = rename_agg(occ, {key_col: key_col, "cell_count": "occupied"})
        o = occ["occupied"].to_numpy(zero_copy_only=False).astype(np.int64)
        z = m - o
        est = np.array([
            float(m) * math.log(float(m) / float(zz)) if zz > 0 else 0.0
            for zz in z], dtype=np.float64)
        return pa.table({
            key_col: occ[key_col],
            "occupied": pa.array(o),
            "zeros": pa.array(z),
            "lc_est": pa.array(est, pa.float64())})

    parted = ds.map_batches(_partial, batch_format="pyarrow")
    return parted.repartition(fanin).groupby("__part").map_groups(
        _merge, batch_format="pyarrow")
