"""Order-independent table checksums (anti-entropy): per-key
``(row count, sum-hash mod 2^61-1, xor-hash)`` digests whose value is
independent of row order and partitioning — the primitive behind replica
verification, sync/repair (Cassandra's Merkle anti-entropy, DynamoDB
backup audits) and "did the migration copy every row" checks. Two
replicas agree iff their digests agree (up to hash collisions, ~2^-61
per key for the sum and independent 2^-61 for the xor).

Scale shape: each block folds its rows into per-key partial digests
(vectorized ``np.add.at`` over dictionary codes; the 61-bit row hashes
are summed as 32-bit halves so int64 never overflows mid-block), ONE
hashpart shuffle of the constant-size partials, and a tiny per-key
modular merge. The row hash chain (column fold in GF(2^61-1) + the
``sampling.hash61`` finalizer) is restated exactly in SQL by the
oracle.

No counterpart in the reference (kernel library only).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .sampling import MOD61, hash61, mulmod61

__all__ = ["grouped_checksum", "row_hash61", "fold_sql"]

_FOLD_K = 1000003  # odd multiplier for the column fold chain
_OFFSET = 1 << 40  # shifts possibly-negative int columns positive


def row_hash61(cols: list, salt: int = 0) -> np.ndarray:
    """Fold int64 column arrays into one 61-bit row hash: Horner chain
    ``a = a*K + (col + 2^40) (mod 2^61-1)`` then the hash61 finalizer.
    Columns must satisfy ``col + 2^40 >= 0`` (documented contract)."""
    a = np.zeros(len(cols[0]), dtype=np.uint64)
    for c in cols:
        v = np.asarray(c, dtype=np.int64) + np.int64(_OFFSET)
        if (v < 0).any():
            raise ValueError("column value below -2^40: fold undefined")
        a = (mulmod61(a, _FOLD_K) + v.astype(np.uint64) % MOD61) % MOD61
    return hash61(a, salt)


def fold_sql(col_exprs: list, salt: int = 0) -> str:
    """The exact SQL restatement of :func:`row_hash61` (HUGEINT
    arithmetic)."""
    from .sampling import hash61_sql

    m = MOD61
    a = "0::HUGEINT"
    for e in col_exprs:
        a = (f"((({a}) * {_FOLD_K}::HUGEINT % {m}) + "
             f"((({e}) + {_OFFSET}::HUGEINT) % {m})) % {m}")
    return hash61_sql(a, salt)


def grouped_checksum(ds, *, key_col: str, cols: list, salt: int = 0,
                     num_partitions: int = 8):
    """Per-key order-independent digest:
    ``(series_id, n, checksum_sum, checksum_xor)``."""
    from ..arrow_utils import stable_part_codes

    mod = num_partitions * 64
    m = np.uint64(MOD61)

    def _partial(b: pa.Table) -> pa.Table:
        key = b[key_col]
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        if b.num_rows == 0:
            return pa.table({key_col: pa.array([], key.type),
                             "s_lo": pa.array([], pa.int64()),
                             "s_hi": pa.array([], pa.int64()),
                             "x": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "__part": pa.array([], pa.int32())})
        h = row_hash61(
            [b[c].to_numpy(zero_copy_only=False) for c in cols], salt)
        d = key.dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        k = len(d.dictionary)
        # 32-bit halves: per-block int64 sums cannot overflow
        s_lo = np.zeros(k, np.int64)
        s_hi = np.zeros(k, np.int64)
        x = np.zeros(k, np.int64)
        n = np.zeros(k, np.int64)
        np.add.at(s_lo, codes, (h & np.uint64(0xFFFFFFFF)).astype(np.int64))
        np.add.at(s_hi, codes, (h >> np.uint64(32)).astype(np.int64))
        np.bitwise_xor.at(x, codes, h.astype(np.int64))
        np.add.at(n, codes, 1)
        t = pa.table({key_col: d.dictionary,
                      "s_lo": pa.array(s_lo % MOD61),
                      "s_hi": pa.array(s_hi % MOD61),
                      "x": pa.array(x), "n": pa.array(n)})
        hp = stable_part_codes(t[key_col], None)
        return t.append_column(
            "__part", pa.array((hp % np.uint64(mod)).astype(np.int32)))

    def _merge(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        key = t[key_col]
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        if t.num_rows == 0:
            return pa.table({"series_id": pa.array([], key.type),
                             "n": pa.array([], pa.int64()),
                             "checksum_sum": pa.array([], pa.int64()),
                             "checksum_xor": pa.array([], pa.int64())})
        d = key.dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        k = len(d.dictionary)
        s_lo = np.zeros(k, np.uint64)
        s_hi = np.zeros(k, np.uint64)
        x = np.zeros(k, np.int64)
        n = np.zeros(k, np.int64)
        # partials are < 2^61; per key there are <= #blocks of them. Sum
        # mod M after each add.at would be wrong; instead add in uint64
        # then reduce — safe while partials-per-key < 8; beyond that,
        # fold progressively (tiny loop over <=64-partial chunks).
        lo = t["s_lo"].to_numpy(zero_copy_only=False).astype(np.uint64)
        hi = t["s_hi"].to_numpy(zero_copy_only=False).astype(np.uint64)
        xr = t["x"].to_numpy(zero_copy_only=False).astype(np.int64)
        nn = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        chunk = 4  # 4 * (2^61-1) < 2^64: never overflows
        for i in range(0, len(codes), chunk):
            sl = slice(i, i + chunk)
            np.add.at(s_lo, codes[sl], lo[sl])
            np.add.at(s_hi, codes[sl], hi[sl])
            s_lo %= m
            s_hi %= m
            np.bitwise_xor.at(x, codes[sl], xr[sl])
            np.add.at(n, codes[sl], nn[sl])
        total = (mulmod61(s_hi, 1 << 32) + s_lo) % m
        return pa.table({"series_id": d.dictionary,
                         "n": pa.array(n),
                         "checksum_sum": pa.array(total.astype(np.int64)),
                         "checksum_xor": pa.array(x)})

    parted = ds.map_batches(_partial, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _merge, batch_format="pyarrow")
