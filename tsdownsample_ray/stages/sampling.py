"""Deterministic hash-based sampling: Bernoulli, stratified, and
train/val/test splits over any keyed Dataset.

Training-data pipelines sample constantly (data mixing, ablation subsets,
held-out splits), and at 100 TB the sampler must be (a) a pure map-side
filter — no shuffle, no state, no RNG coordination across workers — and
(b) reproducible: the same row lands in the same subset on every run and
on any partitioning. Both fall out of hashing the row's stable id:

    keep  <=>  hash61(id, salt) < rate * M

``hash61`` is a 2-round multiply–xorshift permutation over the Mersenne
prime field M = 2^61 - 1, fully vectorized in uint64 NumPy (the 61-bit
products are split 32/29 so no intermediate overflows) and restatable
verbatim in ANSI SQL via HUGEINT arithmetic (a*b < 2^122 fits DuckDB's
HUGEINT), which is what makes the driver oracles exact.

Changing ``salt`` yields an independent sample; reusing a salt yields
nested samples (rate 0.1 is a subset of rate 0.2 — handy for scaling-law
subset ladders).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = [
    "MOD61", "K1", "K2", "mulmod61", "hash61", "hash61_sql",
    "bernoulli_sample", "stratified_sample", "assign_splits",
]

MOD61 = (1 << 61) - 1  # Mersenne prime 2^61 - 1
# odd multipliers reduced into the field (golden-ratio / xxhash constants)
K1 = 0x9E3779B97F4A7C15 % MOD61
K2 = 0xC2B2AE3D27D4EB4F % MOD61
_M = np.uint64(MOD61)
_MASK32 = np.uint64(0xFFFFFFFF)


def mulmod61(a: np.ndarray, b: int) -> np.ndarray:
    """(a * b) mod (2^61-1), vectorized over uint64 ``a`` < M, scalar
    ``b`` < M. Split both into 32-bit halves; with a,b < 2^61 the high
    halves are < 2^29, so every intermediate stays below 2^64:

      a*b = A1*B1*2^64 + (A1*B0 + A0*B1)*2^32 + A0*B0
      2^64 === 8 (mod M);  mid*2^32 === (mid>>29) + (mid & (2^29-1))<<32
      (because 2^61 === 1);  low === (low>>61) + (low & M).
    """
    a = np.asarray(a, dtype=np.uint64)
    b = np.uint64(b)
    a1, a0 = a >> np.uint64(32), a & _MASK32
    b1, b0 = b >> np.uint64(32), b & _MASK32
    hi = (a1 * b1) * np.uint64(8) % _M                      # A1B1 < 2^58
    mid = a1 * b0 + a0 * b1                                 # < 2^62
    mid = ((mid >> np.uint64(29))
           + ((mid & np.uint64((1 << 29) - 1)) << np.uint64(32))) % _M
    low = a0 * b0                                           # < 2^64
    low = ((low >> np.uint64(61)) + (low & _M)) % _M
    return (hi + mid + low) % _M


def hash61(ids: np.ndarray, salt: int = 0) -> np.ndarray:
    """Deterministic uniform hash of int64/uint64 ids into [0, M).

    Two multiply rounds with an xorshift between them (a 64-bit
    finalizer pattern, e.g. splitmix64, restated in the 2^61-1 field so
    SQL HUGEINT arithmetic can replay it exactly)."""
    a = (np.asarray(ids).astype(np.uint64) % _M
         + np.uint64(1 + salt)) % _M
    h = mulmod61(a, K1)
    h = h ^ (h >> np.uint64(31))                            # still < 2^61
    return mulmod61(h, K2)


def hash61_sql(id_expr: str, salt: int = 0) -> str:
    """The exact SQL restatement of :func:`hash61` for a BIGINT column
    expression — used by the driver oracles; any drift from the NumPy
    path is a hash-mismatch there."""
    m = MOD61
    return (f"(xor(CAST((((({id_expr}) % {m}) + {1 + salt}) % {m}) * "
            f"{K1}::HUGEINT % {m} AS BIGINT), "
            f"CAST((((({id_expr}) % {m}) + {1 + salt}) % {m}) * "
            f"{K1}::HUGEINT % {m} AS BIGINT) // 2147483648)::HUGEINT "
            f"* {K2}::HUGEINT % {m})")


def rate_threshold(rate: float) -> int:
    """floor(rate * M) as an exact integer (the Python float product is
    computed once here and the SAME literal is injected into the SQL
    oracle, so both sides compare against an identical constant)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return min(int(rate * MOD61), MOD61)


def bernoulli_sample(ds, *, id_col: str, rate: float, salt: int = 0):
    """Keep each row independently with probability ``rate``, decided by
    ``hash61(id, salt)`` — a pure map-side filter (no shuffle, no RNG
    state), reproducible under any partitioning/retry."""
    thr = np.uint64(rate_threshold(rate))

    def _keep(b: pa.Table) -> pa.Table:
        h = hash61(b[id_col].to_numpy(zero_copy_only=False), salt)
        return b.filter(pa.array(h < thr))

    return ds.map_batches(_keep, batch_format="pyarrow")


def stratified_sample(ds, *, id_col: str, strata_col: str,
                      rates: dict[str, float], default_rate: float = 0.0,
                      salt: int = 0):
    """Per-stratum Bernoulli rates (e.g. language rebalancing: keep 5% of
    'en', all of 'fr'). The rate table is tiny and rides along in the UDF
    closure (shipped once per task spec, never per batch); per-row
    thresholds resolve through a dictionary-encode of the stratum column,
    so the hot path is one lookup per distinct stratum per batch."""
    thr_map = {k: rate_threshold(v) for k, v in rates.items()}
    default_thr = rate_threshold(default_rate)

    def _keep(b: pa.Table) -> pa.Table:
        col = b[strata_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        d = col.dictionary_encode()
        uniq_thr = np.array(
            [thr_map.get(v, default_thr) for v in d.dictionary.to_pylist()],
            dtype=np.uint64)
        thr = uniq_thr[d.indices.to_numpy(zero_copy_only=False)]
        h = hash61(b[id_col].to_numpy(zero_copy_only=False), salt)
        return b.filter(pa.array(h < thr))

    return ds.map_batches(_keep, batch_format="pyarrow")


def assign_splits(ds, *, id_col: str, splits: dict[str, float],
                  salt: int = 0, out_col: str = "split"):
    """Deterministic disjoint train/val/test assignment: the hash's
    position among cumulative weight boundaries names the split. Every
    row gets exactly one label; same id -> same split forever."""
    total = sum(splits.values())
    if not np.isclose(total, 1.0):
        raise ValueError(f"split weights must sum to 1, got {total}")
    names, bounds, acc = [], [], 0.0
    for name, w in splits.items():
        acc += w
        names.append(name)
        bounds.append(rate_threshold(min(acc, 1.0)))
    bounds[-1] = MOD61  # close the last bucket regardless of float error
    bounds_arr = np.array(bounds, dtype=np.uint64)
    names_arr = pa.array(names, pa.string())

    def _label(b: pa.Table) -> pa.Table:
        h = hash61(b[id_col].to_numpy(zero_copy_only=False), salt)
        idx = np.searchsorted(bounds_arr, h, side="right")
        return b.append_column(out_col, names_arr.take(
            pa.array(idx.astype(np.int64))))

    return ds.map_batches(_label, batch_format="pyarrow")


def split_boundaries_sql(splits: dict[str, float]) -> list[tuple[str, int]]:
    """(name, upper_bound) pairs matching :func:`assign_splits` exactly —
    for building the CASE expression in the SQL oracle."""
    names, bounds, acc = [], [], 0.0
    for name, w in splits.items():
        acc += w
        names.append(name)
        bounds.append(rate_threshold(min(acc, 1.0)))
    bounds[-1] = MOD61
    return list(zip(names, bounds))
