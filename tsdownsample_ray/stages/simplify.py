"""Ramer-Douglas-Peucker polyline simplification over tier rows.

The shape-preserving companion to the reference's bin-based kernels
(`minmax.rs` / `m4.rs` select extremes per fixed bin; RDP instead keeps
the fewest points whose polyline stays within a tolerance band of the
original) — the other classic downsampling family, exposed over the same
per-series tier-row contract as every kernel stage.

Exactness contract: points are integer ``(x, y)`` (bucket index, cents),
and the perpendicular-distance test ``dist(P; A,B) > eps`` is evaluated
as ``cross^2 > eps^2 * |AB|^2`` with

    cross = (xB-xA)*(yP-yA) - (yB-yA)*(xP-xA)

— pure int64 arithmetic, no sqrt, no floats — so the kept set is
bit-identical to a DuckDB HUGEINT replay (the recursive-CTE oracle) and
stable under any partitioning. The split point of a segment is the
max-|cross| interior point with ties broken toward the smallest x (the
classic first-occurrence convention, same struct-max trick as the
kernels' argmin/argmax).

Overflow guard: ``cross^2`` stays in int64 while |cross| < 3.0e9; the
segment pass checks the bound from the actual coordinate spans and
raises rather than wrapping (tier rows at the engine's design point are
~1e8, three orders inside the guard).

Scale shape: ONE hash(series) shuffle, then an iterative stack walk per
series whose iteration count is O(kept points) with a fully vectorized
interior argmax per split — no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ..arrow_utils import group_codes, make_add_part

__all__ = ["rdp_simplify", "rdp_keep_mask", "vw_simplify", "vw_keep_mask"]

_CROSS_GUARD = 3_000_000_000  # |cross| bound keeping cross^2 in int64


def rdp_keep_mask(x: np.ndarray, y: np.ndarray, eps: int) -> np.ndarray:
    """Boolean keep-mask of one series' points (x strictly increasing),
    exact integer RDP with tolerance ``eps`` (same x/y units as the
    distance)."""
    n = len(x)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[-1] = True
    if n <= 2:
        return keep
    if np.any(x[1:] <= x[:-1]):
        raise ValueError("rdp requires strictly increasing x per series")
    span_x = int(x[-1]) - int(x[0])
    span_y = int(y.max()) - int(y.min())
    eps2 = int(eps) * int(eps)
    if (2 * span_x * span_y >= _CROSS_GUARD
            or eps2 * (span_x * span_x + span_y * span_y) >= 2 ** 63):
        raise OverflowError(
            f"rdp int64 bound exceeded: {span_x=} {span_y=} {eps=}; "
            "rescale y (e.g. coarser units) to stay exact in int64")
    stack = [(0, n - 1)]
    while stack:
        lo, hi = stack.pop()
        if hi - lo < 2:
            continue
        dx = x[hi] - x[lo]
        dy = y[hi] - y[lo]
        xs = x[lo + 1:hi]
        ys = y[lo + 1:hi]
        cross = dx * (ys - y[lo]) - dy * (xs - x[lo])
        c2 = cross * cross
        m = int(np.argmax(c2))  # np.argmax: first max = smallest x
        if c2[m] > eps2 * (dx * dx + dy * dy):
            split = lo + 1 + m
            keep[split] = True
            stack.append((lo, split))
            stack.append((split, hi))
    return keep


def vw_keep_mask(x: np.ndarray, y: np.ndarray, min_area2: int) -> np.ndarray:
    """Visvalingam-Whyatt keep-mask of one series' points (x strictly
    increasing): repeatedly remove the ACTIVE interior point whose
    triangle with its current active neighbors has the smallest doubled
    area ``|cross|`` (< ``min_area2``), ties toward the smallest x.
    Endpoints are never removed. The removal order is the defining
    sequential dependency (each removal relinks neighbors) — parallel
    across series, exact int64 within one (same overflow bound as RDP).
    """
    n = len(x)
    keep = np.ones(n, dtype=bool)
    if n <= 2:
        return keep
    if np.any(x[1:] <= x[:-1]):
        raise ValueError("vw requires strictly increasing x per series")
    span_x = int(x[-1]) - int(x[0])
    span_y = int(y.max()) - int(y.min())
    if 2 * span_x * span_y >= _CROSS_GUARD:
        raise OverflowError(
            f"vw area bound exceeded: {span_x=} {span_y=}; rescale y")
    prv = np.arange(-1, n - 1)
    nxt = np.arange(1, n + 1)
    BIG = np.iinfo(np.int64).max

    def _area2(i):
        a, b = prv[i], nxt[i]
        return abs((x[b] - x[a]) * (y[i] - y[a])
                   - (y[b] - y[a]) * (x[i] - x[a]))

    area = np.full(n, BIG, dtype=np.int64)
    interior = np.arange(1, n - 1)
    a, b = prv[interior], nxt[interior]
    area[interior] = np.abs((x[b] - x[a]) * (y[interior] - y[a])
                            - (y[b] - y[a]) * (x[interior] - x[a]))
    while True:
        i = int(np.argmin(area))  # first min = smallest x (tie-break)
        if area[i] >= min_area2:
            break
        keep[i] = False
        area[i] = BIG
        p, q = prv[i], nxt[i]
        nxt[p], prv[q] = q, p
        if p > 0:
            area[p] = _area2(p)
        if q < n - 1:
            area[q] = _area2(q)
    return keep


def rdp_simplify(rolled, *, eps: int, series_col: str = "series_id",
                 x_col: str = "bucket", y_col: str = "sum_y",
                 num_partitions: int = 8):
    """Per-series exact-integer RDP over tier rows; returns the kept
    points ``(series_id, x, y)``. One hash(series) shuffle; each
    partition sorts once and walks every series' split stack."""
    from ..arrow_utils import stable_part_codes

    mod = num_partitions * 64

    _add_part = make_add_part(series_col, mod)

    def _simplify(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        s_type = t[series_col].type
        empty = pa.table({"series_id": pa.array([], s_type),
                          "x": pa.array([], pa.int64()),
                          "y": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        t = t.take(pc.sort_indices(t, sort_keys=[
            (series_col, "ascending"), (x_col, "ascending")]))
        sid = t[series_col]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = group_codes(sid)
        x = t[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        heads = np.ones(len(codes), dtype=bool)
        heads[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(heads)
        ends = np.r_[starts[1:], len(codes)]
        keep = np.zeros(len(codes), dtype=bool)
        for f, l in zip(starts, ends):  # series loop; split walk inside
            keep[f:l] = rdp_keep_mask(x[f:l], y[f:l], eps)
        idx = pa.array(np.flatnonzero(keep))
        return pa.table({"series_id": sid.take(idx),
                         "x": pa.array(x[keep]),
                         "y": pa.array(y[keep])})

    parted = rolled.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _simplify, batch_format="pyarrow")


def vw_simplify(rolled, *, min_area2: int, series_col: str = "series_id",
                x_col: str = "bucket", y_col: str = "sum_y",
                num_partitions: int = 8):
    """Per-series Visvalingam-Whyatt simplification over tier rows;
    returns the kept points ``(series_id, x, y)``. Same one-shuffle
    segment discipline as :func:`rdp_simplify`; the per-series removal
    loop is the algorithm's defining sequential dependency (each removal
    relinks neighbors), parallel across series."""
    from ..arrow_utils import stable_part_codes

    mod = num_partitions * 64

    _add_part = make_add_part(series_col, mod)

    def _simplify(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        s_type = t[series_col].type
        empty = pa.table({"series_id": pa.array([], s_type),
                          "x": pa.array([], pa.int64()),
                          "y": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        t = t.take(pc.sort_indices(t, sort_keys=[
            (series_col, "ascending"), (x_col, "ascending")]))
        sid = t[series_col]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = group_codes(sid)
        x = t[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        heads = np.ones(len(codes), dtype=bool)
        heads[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(heads)
        ends = np.r_[starts[1:], len(codes)]
        keep = np.zeros(len(codes), dtype=bool)
        for f, l in zip(starts, ends):  # series loop
            keep[f:l] = vw_keep_mask(x[f:l], y[f:l], min_area2)
        idx = pa.array(np.flatnonzero(keep))
        return pa.table({"series_id": sid.take(idx),
                         "x": pa.array(x[keep]),
                         "y": pa.array(y[keep])})

    parted = rolled.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _simplify, batch_format="pyarrow")
