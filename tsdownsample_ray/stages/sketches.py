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

__all__ = ["hll_sketch_batch", "hll_merge", "hll_estimate",
           "distinct_approx", "cms_token_counts"]


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
