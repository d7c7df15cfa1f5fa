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

__all__ = ["hll_sketch_batch", "hll_merge", "hll_estimate", "distinct_approx"]


def _hash64(values: list[str]) -> np.ndarray:
    return np.fromiter(
        (int.from_bytes(hashlib.blake2b(v.encode(), digest_size=8).digest(),
                        "big") for v in values),
        dtype=np.uint64, count=len(values))


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
    """One (key, sketch) row per key per batch."""
    keys = batch[key_col].to_pylist()
    vals = batch[value_col].to_pylist()
    by_key: dict = {}
    for k, v in zip(keys, vals):
        by_key.setdefault(k, []).append(v)
    out_k, out_s = [], []
    for k, vs in by_key.items():
        out_k.append(k)
        out_s.append(_registers(_hash64(vs), p).tobytes())
    return pa.table({key_col: pa.array(out_k),
                     "hll": pa.array(out_s, pa.binary())})


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
