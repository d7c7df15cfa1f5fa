"""Roaring-style posting-list containers (Chambi, Lemire et al.,
"Better bitmap performance with Roaring bitmaps", SPE 2016), fully
vectorized over a PARTITION of posting lists at once.

A posting list's doc ids are split into 2^16-wide containers by their
high bits; each container stores either a sorted ``uint16`` array of
the low bits (cardinality < 4096 -> 2 bytes/value) or an 8 KiB bitmap
(>= 4096 -> amortized <= 2 bytes/value). Every container carries an
8-byte header (high key + cardinality + kind, the serialized-format
overhead class of the reference spec's 4+4 bytes).

The codec never loops over tokens or containers: encoding packs every
array container's lows with one masked take and every bitmap
container's bits with one ``np.bitwise_or.at`` scatter; decoding
reverses both with one ``np.unpackbits``. The unit of work is the
PARTITION (all tokens hashed to it), mirroring ``functions/varint.py``.
"""

from __future__ import annotations

import numpy as np

__all__ = ["encode_containers", "decode_container_sums",
           "CONTAINER_HEADER_BYTES", "ARRAY_CONTAINER_MAX"]

CONTAINER_HEADER_BYTES = 8
ARRAY_CONTAINER_MAX = 4096  # below this cardinality: array container


def encode_containers(tok_codes: np.ndarray, ids: np.ndarray):
    """Encode distinct, (token, id)-sorted posting rows into container
    form. Returns ``(meta, array_lows, bitmap_bytes)`` where ``meta``
    holds per-container parallel arrays (token code, high key,
    cardinality, kind) in (token, high) order, ``array_lows`` is the
    concatenated uint16 payload of every array container, and
    ``bitmap_bytes`` the concatenated 8 KiB pages of every bitmap
    container (little-endian bit order within each byte)."""
    n = len(ids)
    if n == 0:
        return ({"tok": np.empty(0, np.int64),
                 "high": np.empty(0, np.int64),
                 "card": np.empty(0, np.int64),
                 "is_bitmap": np.empty(0, bool)},
                np.empty(0, np.uint16), np.empty(0, np.uint8))
    ids = ids.astype(np.int64)
    high = ids >> 16
    low = (ids & 0xFFFF).astype(np.uint16)
    new = np.ones(n, dtype=bool)
    new[1:] = (tok_codes[1:] != tok_codes[:-1]) | (high[1:] != high[:-1])
    starts = np.flatnonzero(new)
    bounds = np.append(starts, n)
    card = np.diff(bounds)
    is_bitmap = card >= ARRAY_CONTAINER_MAX
    meta = {"tok": tok_codes[starts], "high": high[starts],
            "card": card, "is_bitmap": is_bitmap}

    row_bitmap = np.repeat(is_bitmap, card)
    array_lows = low[~row_bitmap]

    n_bm = int(is_bitmap.sum())
    if n_bm:
        # rank of each bitmap container among bitmap containers, spread
        # to its rows: flat bit position = rank * 2^16 + low
        rank = np.cumsum(is_bitmap) - 1
        row_rank = np.repeat(rank, card)[row_bitmap]
        pos = row_rank.astype(np.int64) * 65536 + low[row_bitmap]
        buf = np.zeros(n_bm * 8192, dtype=np.uint8)
        np.bitwise_or.at(buf, pos >> 3,
                         np.left_shift(np.uint8(1),
                                       (pos & 7).astype(np.uint8)))
        bitmap_bytes = buf
    else:
        bitmap_bytes = np.empty(0, np.uint8)
    return meta, array_lows, bitmap_bytes


def decode_container_sums(meta, array_lows: np.ndarray,
                          bitmap_bytes: np.ndarray) -> np.ndarray:
    """Decode the container payloads back to doc ids and return each
    container's EXACT id sum (int64), in ``meta`` order — the roundtrip
    evidence consumed by ``roaring_postings``: sums derive only from
    the encoded bytes, so any codec fault diverges from the oracle's
    direct ``sum(doc_id)``."""
    card = meta["card"]
    is_bitmap = meta["is_bitmap"]
    high = meta["high"]
    n_c = len(card)
    sums = np.zeros(n_c, dtype=np.int64)
    if n_c == 0:
        return sums

    # array containers: segment sums of the lows + card * (high << 16)
    a_sel = np.flatnonzero(~is_bitmap)
    if len(a_sel):
        a_card = card[a_sel]
        seg = np.concatenate(([0], np.cumsum(a_card)[:-1]))
        lows = array_lows.astype(np.int64)
        low_sums = (np.add.reduceat(lows, seg) if len(lows)
                    else np.zeros(len(a_sel), np.int64))
        # reduceat on an empty trailing segment repeats; cards >= 1 here
        sums[a_sel] = low_sums + a_card * (high[a_sel] << 16)

    b_sel = np.flatnonzero(is_bitmap)
    if len(b_sel):
        bits = np.unpackbits(bitmap_bytes, bitorder="little")
        pos = np.flatnonzero(bits)
        rank = pos >> 16
        low = pos & 0xFFFF
        per = np.bincount(rank, weights=low,
                          minlength=len(b_sel)).astype(np.int64)
        cnt = np.bincount(rank, minlength=len(b_sel)).astype(np.int64)
        if not np.array_equal(cnt, card[b_sel]):
            raise AssertionError(
                "roaring roundtrip: bitmap cardinality mismatch")
        sums[b_sel] = per + cnt * (high[b_sel] << 16)
    return sums
