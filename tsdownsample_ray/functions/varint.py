"""Vectorized LEB128 varint codec for delta-gap posting-list compression.

No counterpart in the reference (a kernel library); engine layer — the
classic inverted-index payload encoding (gap + varint), the integer
sibling of the Gorilla float chunks in ``functions/gorilla.py``. Both
directions are NumPy column passes (one loop over BYTE POSITION, max 10
iterations, each vectorized over every value in the batch) — never a
Python loop over values.

Encoding: standard unsigned LEB128 — 7 payload bits per byte, high bit
set on every byte except the last, little-endian groups. Gaps are
``>= 1`` by construction (sorted distinct doc ids, first gap
``doc_id + 1``), so byte length is ``ceil(bit_length / 7)`` with no
zero-length special case.
"""

from __future__ import annotations

import numpy as np

__all__ = ["varint_byte_lengths", "varint_encode", "varint_decode"]

_MAX_BYTES = 10  # ceil(64 / 7)


def varint_byte_lengths(vals: np.ndarray) -> np.ndarray:
    """LEB128 byte length per value (int64 out). Values must be >= 0;
    0 encodes in 1 byte."""
    v = vals.astype(np.uint64, copy=False)
    n = np.ones(len(v), dtype=np.int64)
    bound = np.uint64(1 << 7)
    for _ in range(_MAX_BYTES - 1):
        more = v >= bound
        if not more.any():
            break
        n += more
        # widen the threshold by 7 bits per extra byte
        if int(bound) <= (1 << 56):
            bound = np.uint64(int(bound) << 7)
        else:
            break
    return n


def varint_encode(vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Encode a non-negative int array to one contiguous uint8 buffer.

    Returns ``(buf, lengths)`` — the concatenated byte stream and the
    per-value byte count (so callers can segment the stream per key
    with a ``reduceat`` over lengths)."""
    v = vals.astype(np.uint64, copy=True)
    lens = varint_byte_lengths(vals)
    total = int(lens.sum())
    buf = np.zeros(total, dtype=np.uint8)
    starts = np.cumsum(lens) - lens  # int64, exclusive prefix sum
    for k in range(_MAX_BYTES):
        live = lens > k
        if not live.any():
            break
        b = (v[live] & np.uint64(0x7F)).astype(np.uint8)
        cont = (lens[live] - 1) > k
        buf[starts[live] + k] = b | (cont.astype(np.uint8) << 7)
        v[live] >>= np.uint64(7)
    return buf, lens


def varint_decode(buf: np.ndarray) -> np.ndarray:
    """Decode a LEB128 byte stream back to uint64 values (vectorized:
    value boundaries from the continuation bits, then one pass per byte
    position)."""
    if len(buf) == 0:
        return np.zeros(0, dtype=np.uint64)
    b = buf.astype(np.uint8, copy=False)
    last = (b & 0x80) == 0          # terminal byte of each value
    ends = np.flatnonzero(last)
    starts = np.concatenate([[0], ends[:-1] + 1]).astype(np.int64)
    lens = ends - starts + 1
    if lens.max() > _MAX_BYTES:
        raise ValueError("varint_decode: value longer than 10 bytes")
    out = np.zeros(len(starts), dtype=np.uint64)
    for k in range(int(lens.max())):
        live = lens > k
        out[live] |= ((b[starts[live] + k] & np.uint64(0x7F))
                      .astype(np.uint64) << np.uint64(7 * k))
    return out
