"""Elias-Fano quasi-succinct encoding of sorted integer lists (Elias
1974 / Fano 1971; Vigna, "Quasi-succinct indices", WSDM 2013) — the
modern posting-list codec, completing the index-compression family
next to LEB128 varints and Roaring containers.

Split each value into ``l = max(0, floor(log2(u / n)))`` low bits
(bit-packed verbatim) and high bits (a unary-gap bitvector: value i
sets bit ``high(x_i) + i``). Total size is within half a bit per
element of the information-theoretic minimum for a sorted list. Both
directions are real and vectorized (``packbits`` / ``unpackbits`` +
flatnonzero); byte sizes follow the exact integer formula
``ceil((n + high(max) + 1)/8) + ceil(n*l/8)`` that the SQL oracle
replays via ``length(bin(...))``.
"""

from __future__ import annotations

import numpy as np

__all__ = ["ef_encode", "ef_decode", "ef_l_bits"]


def ef_l_bits(u: int, n: int) -> int:
    """``max(0, floor(log2(u // n)))`` — exact via bit_length."""
    q = u // n
    return max(0, q.bit_length() - 1)


def ef_encode(ids: np.ndarray, u: int) -> tuple:
    """Sorted distinct non-negative int64 ids, universe ``u > max(ids)``
    -> (upper_bytes, lower_bytes, l). MSB-first bit order in both
    planes (the internal convention; decode mirrors it)."""
    ids = np.asarray(ids, dtype=np.int64)
    n = len(ids)
    if n == 0:
        return b"", b"", 0
    l = ef_l_bits(u, n)
    high = (ids >> l).astype(np.int64)
    upper_len = n + int(high[-1]) + 1
    upper = np.zeros(upper_len, dtype=np.uint8)
    upper[high + np.arange(n, dtype=np.int64)] = 1
    ub = np.packbits(upper).tobytes()
    if l:
        low = ids & np.int64((1 << l) - 1)
        shifts = np.arange(l - 1, -1, -1, dtype=np.int64)
        bits = ((low[:, None] >> shifts[None, :]) & 1).astype(np.uint8)
        lb = np.packbits(bits.ravel()).tobytes()
    else:
        lb = b""
    return ub, lb, l


def ef_decode(ub: bytes, lb: bytes, n: int, l: int) -> np.ndarray:
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    upper = np.unpackbits(np.frombuffer(ub, dtype=np.uint8))
    pos = np.flatnonzero(upper)[:n].astype(np.int64)
    high = pos - np.arange(n, dtype=np.int64)
    if l:
        bits = np.unpackbits(np.frombuffer(lb, dtype=np.uint8))[:n * l]
        shifts = np.arange(l - 1, -1, -1, dtype=np.int64)
        low = (bits.reshape(n, l).astype(np.int64)
               << shifts[None, :]).sum(axis=1)
    else:
        low = np.zeros(n, dtype=np.int64)
    return (high << l) | low
