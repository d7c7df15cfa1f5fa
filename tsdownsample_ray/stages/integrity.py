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
import pyarrow.compute as pc

from .sampling import MOD61, hash61, mulmod61

__all__ = ["grouped_checksum", "row_hash61", "fold_sql", "benford_audit"]

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


def benford_audit(ds, *, key_col: str, val_col: str,
                  fanin: int = 8):
    """Benford leading-digit audit: per key, the distribution of first
    digits of the POSITIVE integer values — the classic
    fabricated-number / instrumentation-bug screen. Output one row per
    (key, digit 1..9): ``(series_id, digit, n_values, digit_count,
    permille)`` with ``permille = 1000·digit_count // n_values`` (exact
    integer share; compare with Benford's ~301/176/125/... by eye or a
    downstream rule). Zero/negative/null values carry no leading digit
    and are dropped; keys with no positive values are omitted. Digits
    with zero count are omitted (sparse output, matching the SQL GROUP
    BY).

    Scale shape: a pure mergeable aggregation — the leading digit is
    extracted vectorized (cast-to-string + 1-codeunit slice, exactly
    the SQL ``substr(CAST(v AS VARCHAR), 1, 1)``), counts pre-reduce
    map-side per block, and the standard hashpart grouped sum merges
    (key, digit) partials; the per-key total re-joins by a second tiny
    grouped sum over the digit rows. No sort, no driver materialization.

    SQL restatement: two GROUP BYs over the same substr expression."""
    from .graph import grouped_sum_parts
    from ..arrow_utils import col_type, rename_agg

    def _digits(b: pa.Table) -> pa.Table:
        kt = col_type(b, key_col)
        v = pc.cast(b[val_col], pa.int64())
        mask = pc.and_(pc.is_valid(v), pc.greater(v, 0))
        b2 = pa.table({"k": b[key_col], "v": v}).filter(mask)
        if b2.num_rows == 0:
            return pa.table({
                "series_id": pa.array([], kt),
                "digit": pa.array([], pa.int64()),
                "digit_count": pa.array([], pa.int64()),
            })
        d = pc.cast(pc.utf8_slice_codeunits(
            pc.cast(b2["v"], pa.string()), 0, 1), pa.int64())
        t = pa.table({
            "series_id": b2["k"], "digit": d,
            "digit_count": pa.array(
                np.ones(b2.num_rows, dtype=np.int64)),
        })
        return rename_agg(
            t.group_by(["series_id", "digit"]).aggregate(
                [("digit_count", "sum")]),
            {"series_id": "series_id", "digit": "digit",
             "digit_count_sum": "digit_count"})

    parts = ds.map_batches(_digits, batch_format="pyarrow")
    counts = grouped_sum_parts(parts, ["series_id", "digit"],
                               ["digit_count"], count_col=None,
                               fanin=fanin)

    # per-key totals: re-aggregate the (key, digit) rows (<= 9 per key)
    def _with_total(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({
                "series_id": g["series_id"] if "series_id" in
                g.column_names else pa.array([], pa.string()),
                "digit": pa.array([], pa.int64()),
                "n_values": pa.array([], pa.int64()),
                "digit_count": pa.array([], pa.int64()),
                "permille": pa.array([], pa.int64()),
            })
        k = g["series_id"]
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        enc = k.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = g["digit_count"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        totals = np.zeros(int(codes.max()) + 1, dtype=np.int64)
        np.add.at(totals, codes, cnt)
        n_values = totals[codes]
        return pa.table({
            "series_id": g["series_id"], "digit": g["digit"],
            "n_values": pa.array(n_values),
            "digit_count": g["digit_count"],
            "permille": pa.array(1000 * cnt // n_values),
        })

    from ..arrow_utils import stable_part_codes

    mod = fanin * 64

    def _part_key(b: pa.Table) -> pa.Table:
        h = stable_part_codes(b["series_id"], None)
        return b.append_column(
            "__part", pa.array((h % np.uint64(mod)).astype(np.int32)))

    parted = counts.map_batches(_part_key, batch_format="pyarrow")
    grouped = parted.repartition(fanin).groupby("__part").map_groups(
        lambda g: _with_total(g.drop_columns(["__part"])),
        batch_format="pyarrow")
    return grouped
