"""Z-order (Morton) clustering + zone maps: the multi-dimensional
data-layout primitive (Delta OPTIMIZE ZORDER, Iceberg sort orders) —
interleave the bits of two dimensions so one range partitioning gives
BOUNDED ranges in BOTH, and every output partition carries min/max zone
maps a reader uses to prune.

Scale shape: the z-code is a handful of vectorized shift/mask ops per
row inside ``map_batches`` (no stats pass, no sampling barrier: the
dimensions are reduced mod 2^bits, the standard fixed-grid variant);
each block pre-collapses its own per-partition zone maps (an Arrow
group_by over <= 2^parts_log2 keys), and ONE tiny shuffle of those
constant-size partials merges them. Rows themselves never shuffle here —
a writer would route blocks by ``p`` with the same code.

No counterpart in the reference (kernel library only).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["morton_interleave", "zorder_zone_maps"]

# 16-bit -> even-bit spread (standard Morton magic masks)
_SPREAD = ((8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333),
           (1, 0x55555555))


def _spread16(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.int64) & np.int64(0xFFFF)
    for sh, m in _SPREAD:
        x = (x | (x << np.int64(sh))) & np.int64(m)
    return x


def morton_interleave(d0: np.ndarray, d1: np.ndarray) -> np.ndarray:
    """32-bit Morton code of two 16-bit dims (d0 -> even bits)."""
    return _spread16(d0) | (_spread16(d1) << np.int64(1))


def spread16_sql(e: str) -> str:
    """The exact SQL restatement of :func:`_spread16` for a BIGINT
    expression (DuckDB bitwise ops)."""
    x = f"(({e}) & 65535)"
    for sh, m in _SPREAD:
        x = f"((({x}) | (({x}) << {sh})) & {m})"
    return x


def zorder_zone_maps(ds, *, d0_col: str, d1_col: str, bits: int = 16,
                     parts_log2: int = 6, num_partitions: int = 4):
    """Route rows to ``2^parts_log2`` z-order partitions (top bits of the
    ``2*bits``-wide Morton code of ``d0 % 2^bits``, ``d1 % 2^bits``) and
    emit each partition's zone map: ``(p, n, min_d0, max_d0, min_d1,
    max_d1, min_z, max_z)`` — the pruning manifest a z-clustered write
    would attach to its files. ``bits`` sets the grid resolution; pick it
    so the dimensions actually fill the grid (dims are reduced mod
    2^bits — the fixed-grid variant, no stats/sampling barrier)."""
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
        z = morton_interleave(d0, d1)
        p = z >> np.int64(shift)
        t = pa.table({"p": pa.array(p), "d0": pa.array(d0),
                      "d1": pa.array(d1), "z": pa.array(z),
                      "n": pa.array(np.ones(len(z), np.int64))})
        g = t.group_by(["p"]).aggregate([
            ("n", "sum"), ("d0", "min"), ("d0", "max"),
            ("d1", "min"), ("d1", "max"), ("z", "min"), ("z", "max")])
        from ..arrow_utils import rename_agg
        return rename_agg(g, {
            "p": "p", "n_sum": "n", "d0_min": "min_d0", "d0_max": "max_d0",
            "d1_min": "min_d1", "d1_max": "max_d1",
            "z_min": "min_z", "z_max": "max_z"})

    def _merge(g: pa.Table) -> pa.Table:
        t = g.group_by(["p"]).aggregate([
            ("n", "sum"), ("min_d0", "min"), ("max_d0", "max"),
            ("min_d1", "min"), ("max_d1", "max"),
            ("min_z", "min"), ("max_z", "max")])
        from ..arrow_utils import rename_agg
        return rename_agg(t, {
            "p": "p", "n_sum": "n",
            "min_d0_min": "min_d0", "max_d0_max": "max_d0",
            "min_d1_min": "min_d1", "max_d1_max": "max_d1",
            "min_z_min": "min_z", "max_z_max": "max_z"})

    parted = ds.map_batches(_partial, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("p").map_groups(
        _merge, batch_format="pyarrow")


def zone_map_prune(ds, *, d0_col: str, d1_col: str,
                   lo0: int, hi0: int, lo1: int, hi1: int,
                   bits: int = 16, parts_log2: int = 6,
                   num_partitions: int = 4):
    """Zone-map pruning audit — the READ side of the z-order story:
    for a rectangular predicate ``d0 in [lo0, hi0] AND d1 in
    [lo1, hi1]`` (on the mod-2^bits grid), which of the ``2^parts_log2``
    z-partitions would a manifest-aware scan touch, and how many rows
    actually match inside each? Emits per partition ``(p, n, scanned,
    matched)`` and ASSERTS pruning soundness in-task (a partition with
    matches must be scanned — zone maps are conservative by
    construction, so a violation means the manifest is corrupt).

    Scale shape: the manifest is the bounded ``zorder_zone_maps``
    output; ``matched`` is ONE streaming pass over the rows with a
    constant-size grouped count (never a second full shuffle); the
    flag-join happens on <= 2^parts_log2 rows."""
    from .graph import grouped_sum_parts

    zm = zorder_zone_maps(ds, d0_col=d0_col, d1_col=d1_col, bits=bits,
                          parts_log2=parts_log2,
                          num_partitions=num_partitions)
    shift = 2 * bits - parts_log2
    dmask = np.int64((1 << bits) - 1)

    def _match(b: pa.Table) -> pa.Table:
        d0 = b[d0_col].to_numpy(zero_copy_only=False).astype(np.int64) \
            & dmask
        d1 = b[d1_col].to_numpy(zero_copy_only=False).astype(np.int64) \
            & dmask
        z = morton_interleave(d0, d1)
        p = z >> np.int64(shift)
        hit = (d0 >= lo0) & (d0 <= hi0) & (d1 >= lo1) & (d1 <= hi1)
        return pa.table({"p": pa.array(p[hit]),
                         "matched": pa.array(
                             np.ones(int(hit.sum()), np.int64))})

    matched = grouped_sum_parts(ds.map_batches(_match,
                                               batch_format="pyarrow"),
                                ["p"], ["matched"], count_col=None,
                                fanin=2)

    def _m_ren(b: pa.Table) -> pa.Table:
        return pa.table({"mp": b["p"], "matched": b["matched"]})

    j = zm.join(matched.map_batches(_m_ren, batch_format="pyarrow"),
                join_type="left_outer", num_partitions=2,
                on=("p",), right_on=("mp",))

    def _flags(b: pa.Table) -> pa.Table:
        mn0 = b["min_d0"].to_numpy(zero_copy_only=False)
        mx0 = b["max_d0"].to_numpy(zero_copy_only=False)
        mn1 = b["min_d1"].to_numpy(zero_copy_only=False)
        mx1 = b["max_d1"].to_numpy(zero_copy_only=False)
        scanned = ((mx0 >= lo0) & (mn0 <= hi0)
                   & (mx1 >= lo1) & (mn1 <= hi1)).astype(np.int64)
        m = pc.fill_null(b["matched"],
                         0).to_numpy(zero_copy_only=False).astype(np.int64)
        if bool(((m > 0) & (scanned == 0)).any()):
            raise AssertionError("zone-map pruning dropped matching rows")
        return pa.table({"p": b["p"], "n": b["n"],
                         "scanned": pa.array(scanned),
                         "matched": pa.array(m)})

    return j.map_batches(_flags, batch_format="pyarrow")
