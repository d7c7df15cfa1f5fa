"""Gorilla-style chunk compression: delta-of-delta timestamps + XOR values.

Lossless, bit-exact codecs after the Gorilla paper (Pelkonen et al., VLDB
2015, §4.1/§4.2) — new design for this engine (the reference has no storage
layer; SURVEY.md §2.4):

Timestamps (int64, e.g. epoch-us bucket starts):
  header: t0 (64b), d0 = t1-t0 (64b); then per point the delta-of-delta
  ``dod = d_i - d_{i-1}`` with the paper's tag ladder:
    '0'                      dod == 0 (the steady-state bit for regular series)
    '10'  + 7b  (dod+63)     dod in [-63, 64]
    '110' + 9b  (dod+255)    dod in [-255, 256]
    '1110'+ 12b (dod+2047)   dod in [-2047, 2048]
    '1111'+ 64b              otherwise (paper uses 32b; widened to 64 for
                             microsecond gaps — documented deviation)

Values (64-bit words; callers view float64/int64 as uint64):
  header: v0 (64b); then xor = v_i ^ v_{i-1}:
    '0'                      xor == 0
    '1' '0' + M bits         xor fits the previous (leading, meaningful) block
    '1' '1' + 5b leading + 6b (M-1) + M bits   new block (M in 1..64 stored
                             as M-1 — resolves the paper's 64-vs-0 ambiguity)

The per-value Python loop is acceptable because compression runs on
ROLLED-UP tier rows (|series| x |buckets|), never on raw corpus rows —
SURVEY.md §7.1 step 4.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "encode_timestamps", "decode_timestamps",
    "encode_values", "decode_values",
]

_MASK64 = (1 << 64) - 1


class _BitWriter:
    __slots__ = ("acc", "nbits")

    def __init__(self):
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int):
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits

    def getvalue(self) -> bytes:
        pad = (-self.nbits) % 8
        acc = self.acc << pad
        return (self.nbits + pad).to_bytes(4, "big") + acc.to_bytes(
            (self.nbits + pad) // 8, "big"
        )


class _BitReader:
    __slots__ = ("data", "pos", "nbits")

    def __init__(self, blob: bytes):
        self.nbits = int.from_bytes(blob[:4], "big")
        self.data = int.from_bytes(blob[4:], "big")
        self.pos = 0

    def read(self, nbits: int) -> int:
        shift = self.nbits - self.pos - nbits
        self.pos += nbits
        return (self.data >> shift) & ((1 << nbits) - 1)


def encode_timestamps(ts: np.ndarray) -> bytes:
    ts = np.asarray(ts, dtype=np.int64)
    n = len(ts)
    w = _BitWriter()
    w.write(n, 32)
    if n == 0:
        return w.getvalue()
    w.write(int(ts[0]) & _MASK64, 64)
    if n == 1:
        return w.getvalue()
    deltas = np.diff(ts)
    w.write(int(deltas[0]) & _MASK64, 64)
    dods = np.diff(deltas)
    for dod in dods.tolist():
        if dod == 0:
            w.write(0, 1)
        elif -63 <= dod <= 64:
            w.write(0b10, 2)
            w.write(dod + 63, 7)
        elif -255 <= dod <= 256:
            w.write(0b110, 3)
            w.write(dod + 255, 9)
        elif -2047 <= dod <= 2048:
            w.write(0b1110, 4)
            w.write(dod + 2047, 12)
        else:
            w.write(0b1111, 4)
            w.write(dod & _MASK64, 64)
    return w.getvalue()


def _u64_to_i64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def decode_timestamps(blob: bytes) -> np.ndarray:
    r = _BitReader(blob)
    n = r.read(32)
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    t = _u64_to_i64(r.read(64))
    out[0] = t
    if n == 1:
        return out
    d = _u64_to_i64(r.read(64))
    t += d
    out[1] = t
    for i in range(2, n):
        tag = r.read(1)
        if tag == 0:
            dod = 0
        elif r.read(1) == 0:
            dod = r.read(7) - 63
        elif r.read(1) == 0:
            dod = r.read(9) - 255
        elif r.read(1) == 0:
            dod = r.read(12) - 2047
        else:
            dod = _u64_to_i64(r.read(64))
        d += dod
        t += d
        out[i] = t
    return out


def _clz64(x: int) -> int:
    return 64 - x.bit_length() if x else 64


def _ctz64(x: int) -> int:
    return (x & -x).bit_length() - 1 if x else 64


def encode_values(words: np.ndarray) -> bytes:
    """words: uint64 view of the column (float64: ``arr.view(np.uint64)``)."""
    words = np.asarray(words, dtype=np.uint64)
    n = len(words)
    w = _BitWriter()
    w.write(n, 32)
    if n == 0:
        return w.getvalue()
    prev = int(words[0])
    w.write(prev, 64)
    lead, mbits = -1, -1  # no previous block
    for v in words[1:].tolist():
        v = int(v)
        xor = prev ^ v
        prev = v
        if xor == 0:
            w.write(0, 1)
            continue
        l = min(_clz64(xor), 31)
        t = _ctz64(xor)
        m = 64 - l - t
        w.write(1, 1)
        if lead >= 0 and l >= lead and (64 - lead - mbits) <= t:
            # fits previous block: reuse (lead, mbits)
            w.write(0, 1)
            w.write(xor >> (64 - lead - mbits), mbits)
        else:
            lead, mbits = l, m
            w.write(1, 1)
            w.write(l, 5)
            w.write(m - 1, 6)
            w.write(xor >> t, m)
    return w.getvalue()


def decode_values(blob: bytes) -> np.ndarray:
    r = _BitReader(blob)
    n = r.read(32)
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out
    v = r.read(64)
    out[0] = v
    lead = mbits = 0
    for i in range(1, n):
        if r.read(1) == 0:
            out[i] = v
            continue
        if r.read(1) == 1:
            lead = r.read(5)
            mbits = r.read(6) + 1
        xor = r.read(mbits) << (64 - lead - mbits)
        v ^= xor
        out[i] = v
    return out
