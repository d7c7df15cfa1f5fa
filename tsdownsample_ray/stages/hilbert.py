"""Hilbert-curve clustering + zone maps: the locality-preserving
sibling of ``zorder.py`` (Hilbert 1891; Faloutsos & Roseman, PODS 1994
for the database use; Delta/Iceberg offer it as the higher-locality
alternative to Z-order). Unlike Morton codes, consecutive Hilbert
indices are always grid-adjacent, so range partitions cut the plane
into compact tiles with strictly tighter per-partition zone maps on
BOTH dimensions.

The xy->d transform is the standard iterative rotate-and-reflect walk
over ``bits`` levels — vectorized here across all rows per level (a
``bits``-iteration numpy loop over whole arrays, never per row), and
replayed bit-identically by a recursive-CTE SQL oracle that carries
``(x, y, d, s)`` per row through the same ``bits`` levels. Every step
is pure int64 arithmetic; the level XOR ``(3*rx) ^ ry`` is restated as
``3*rx + ry*(1 - 2*rx)`` so both sides share one expression.

Scale shape: identical to ``zorder_zone_maps`` — per-block code
computation + zone-map partials (an Arrow group_by over
``<= 2^parts_log2`` keys), ONE constant-size shuffle of the partials;
rows never move.

No counterpart in the reference (kernel library only).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..arrow_utils import rename_agg

__all__ = ["hilbert_d", "hilbert_zone_maps"]


def hilbert_d(d0: np.ndarray, d1: np.ndarray, bits: int) -> np.ndarray:
    """Hilbert index of ``(d0, d1) % 2^bits`` — vectorized xy2d: per
    level ``s = 2^(bits-1) .. 1``, accumulate the quadrant digit and
    rotate/reflect the frame (the classic Wikipedia/Warren walk)."""
    x = d0.astype(np.int64) & np.int64((1 << bits) - 1)
    y = d1.astype(np.int64) & np.int64((1 << bits) - 1)
    d = np.zeros(len(x), dtype=np.int64)
    s = 1 << (bits - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * (3 * rx + ry * (1 - 2 * rx))  # == (3*rx) ^ ry
        # rotate/reflect the lower quadrant: when ry == 0, reflect if
        # rx == 1, then swap x/y
        refl = (ry == 0) & (rx == 1)
        x = np.where(refl, s - 1 - x, x)
        y = np.where(refl, s - 1 - y, y)
        swap = ry == 0
        x2 = np.where(swap, y, x)
        y = np.where(swap, x, y)
        x = x2
        s >>= 1
    return d


def hilbert_zone_maps(ds, *, d0_col: str, d1_col: str, bits: int = 8,
                      parts_log2: int = 4, num_partitions: int = 4):
    """Route rows to ``2^parts_log2`` Hilbert partitions (top bits of
    the ``2*bits``-wide index of ``d0 % 2^bits``, ``d1 % 2^bits``) and
    emit each partition's zone map ``(p, n, min_d0, max_d0, min_d1,
    max_d1, min_h, max_h)`` — same manifest contract as
    ``zorder_zone_maps``, tighter boxes by construction."""
    if not 1 <= bits <= 16:
        raise ValueError(f"bits must be in [1, 16], got {bits}")
    if not 0 <= parts_log2 <= 2 * bits:
        raise ValueError(
            f"parts_log2 must be in [0, {2 * bits}], got {parts_log2}")
    shift = 2 * bits - parts_log2
    dmask = np.int64((1 << bits) - 1)

    def _partial(b: pa.Table) -> pa.Table:
        d0 = b[d0_col].to_numpy(zero_copy_only=False).astype(np.int64) \
            & dmask
        d1 = b[d1_col].to_numpy(zero_copy_only=False).astype(np.int64) \
            & dmask
        h = hilbert_d(d0, d1, bits)
        p = h >> np.int64(shift)
        t = pa.table({"p": pa.array(p), "d0": pa.array(d0),
                      "d1": pa.array(d1), "h": pa.array(h),
                      "n": pa.array(np.ones(len(h), np.int64))})
        g = t.group_by(["p"]).aggregate([
            ("n", "sum"), ("d0", "min"), ("d0", "max"),
            ("d1", "min"), ("d1", "max"), ("h", "min"), ("h", "max")])
        return rename_agg(g, {
            "p": "p", "n_sum": "n", "d0_min": "min_d0", "d0_max": "max_d0",
            "d1_min": "min_d1", "d1_max": "max_d1",
            "h_min": "min_h", "h_max": "max_h"})

    def _merge(g: pa.Table) -> pa.Table:
        t = g.group_by(["p"]).aggregate([
            ("n", "sum"), ("min_d0", "min"), ("max_d0", "max"),
            ("min_d1", "min"), ("max_d1", "max"),
            ("min_h", "min"), ("max_h", "max")])
        return rename_agg(t, {
            "p": "p", "n_sum": "n",
            "min_d0_min": "min_d0", "max_d0_max": "max_d0",
            "min_d1_min": "min_d1", "max_d1_max": "max_d1",
            "min_h_min": "min_h", "max_h_max": "max_h"})

    parted = ds.map_batches(_partial, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("p").map_groups(
        _merge, batch_format="pyarrow")
