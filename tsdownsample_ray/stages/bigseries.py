"""Distributed downsampling of ONE huge series that spans many blocks.

The per-series engine (``stages/downsample.py``) requires a series to fit
one group; the reference instead parallelizes WITHIN a series with rayon
over bins (``downsample_rs/src/minmax.rs:139-179``,
``m4.rs:145-187``, benched to 5e9 points in ``notebooks/benches.ipynb``).
This module is the Ray Data analog for three kernel families:

- ``kernel="minmax"`` / ``"nanminmax"``: bins over the FULL x range
  (``n_out/2`` bins, ``kernels/minmax.py`` semantics incl. tiny-bin
  passthrough, first-occurrence ties, NaN policies);
- ``kernel="m4"`` / ``"nanm4"``: ``n_out/4`` bins emitting
  first/argmin/argmax/last per bin (``kernels/m4.py`` semantics);
- ``kernel="minmaxlttb"`` (default; ``nan_policy_return=True`` for the NaN
  variant): the reference's two-phase trick (``minmaxlttb.rs:126-170``) —
  distributed MinMax preselection over the series INTERIOR, then the
  sequential LTTB kernel over the ~n_out*ratio*2 preselected points, so
  the result EQUALS ``kernels.minmaxlttb`` on the same arrays
  (pytest-pinned across partitionings).

Scale shape: each block reduces to per-bin partial candidate rows inside
``map_batches`` (O(bins) per block, independent of n); partials are merged
per bin by an associative ``groupby("bin").map_groups`` merge (never a
driver-side loop over blocks x bins), and only the <= 4*bins selected
points are collected on the driver.

Partitioning assumption (documented per the build brief): ``x`` is
STRICTLY increasing within the series — the engine's per-series stages
guarantee this for rollup buckets (one bucket value per row). Violations
are DETECTED, not silently mis-merged: every phase-1 block raises on
duplicate x within its rows, the edge pre-pass raises when the global
first/last x collide, and the per-bin merge raises on any duplicate x
among its candidate sources (first-4 / min / max / last per block) —
the only points that can reach the output, so every dup whose
tie-break could change the result is caught (first-occurrence
tie-breaks are positional, and position is unrecoverable across
unordered blocks). A dup that never surfaces as a candidate cannot
affect the selection.

NaN semantics match the single-node kernels on ANY partitioning: the
nan-ignoring policy (plain kernels) selects extremes over non-NaN values
with the bin's first point as the all-NaN fallback — exactly
``argminmax.bin_argminmax(nan_policy_return=False)`` — and the
NaN-returning policy emits the bin's first NaN (pytest-pinned with NaN-y
inputs).

Float exactness note: phase-2 LTTB averages bucket x in f64; callers with
epoch-us timestamps should REBASE x by a constant (x - base) so bucket
sums stay under 2^53 and remain bit-exact under any summation order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..arrow_utils import col_to_numpy
from ..kernels.lttb import lttb

__all__ = ["downsample_big_series"]


def _series_edges(ds, x_col: str, y_col: str):
    """Tiny pre-pass: the two smallest-x and two largest-x points of the
    series (x[0], x[1], x[n-2], x[n-1] and their y) + the total count.
    Each block contributes <= 4 candidate rows."""

    def _edge(b: pa.Table) -> pa.Table:
        x = col_to_numpy(b[x_col]).astype(np.int64)
        y = col_to_numpy(b[y_col])
        if len(x) == 0:
            return pa.table({"x": pa.array([], pa.int64()),
                             "y": pa.array([], pa.float64()),
                             "cnt": pa.array([], pa.int64())})
        order = np.argsort(x, kind="stable")
        if np.any(np.diff(x[order]) == 0):  # strict-x runtime guard
            raise ValueError(
                "duplicate x within a block: downsample_big_series requires "
                "strictly increasing x (dedupe first; positional tie-breaks "
                "are unrecoverable across unordered blocks)")
        pick = np.unique(np.concatenate([order[:2], order[-2:]]))
        return pa.table({
            "x": pa.array(x[pick], pa.int64()),
            "y": pa.array(y[pick].astype(np.float64), pa.float64()),
            "cnt": pa.array([len(x)] + [0] * (len(pick) - 1), pa.int64()),
        })

    # collect the tiny candidate set (<= 4 rows per block)
    parts = ds.map_batches(_edge, batch_format="pyarrow").take_all()
    x = np.array([r["x"] for r in parts], dtype=np.int64)
    y = np.array([r["y"] for r in parts], dtype=np.float64)
    n = int(sum(r["cnt"] for r in parts))
    if len(x) < 4 or n < 4:
        raise ValueError(
            f"series too small for the distributed path ({n} points); use "
            "downsample_dataset / the kernels directly")
    order = np.argsort(x, kind="stable")
    lo, hi = order[:2], order[-2:]
    if x[lo[0]] == x[lo[1]] or x[hi[0]] == x[hi[1]]:  # cross-block dup edge
        raise ValueError(
            "duplicate x at the series edge: downsample_big_series requires "
            "strictly increasing x")
    return (x[lo[0]], y[lo[0]], x[lo[1]],       # x0, y0, x1
            x[hi[0]], x[hi[1]], y[hi[1]], n)    # x_{n-2}, x_{n-1}, y_{n-1}


_PARTIAL_FIELDS = ("bin", "cnt", "ymin", "xminy", "ymax", "xmaxy", "nanx",
                   "f1x", "f1y", "f2x", "f2y", "f3x", "f3y", "f4x", "f4y",
                   "lx", "ly")


def _phase1_partial(b: pa.Table, *, boundaries: np.ndarray,
                    x_col: str, y_col: str, interior: tuple | None,
                    full_range: bool) -> pa.Table:
    """Per-block, per-bin partial candidates (vectorized over sorted bins).

    ``interior=(x_first, x_last)`` drops the series endpoints (the
    MinMaxLTTB preselection bins the interior only); ``full_range``
    switches per-point bin assignment to the public with-x formulation
    (``searchsorted(x, linspace, side='right')`` index boundaries, i.e. a
    point ON boundary j belongs to bin j-1) used by MinMax/M4.

    Each bin row carries: count, y-min/max with their x (first-occurrence
    tie == smallest x under strict x), the smallest x among NaN y, the
    first FOUR points and the last point — enough to merge any of the
    kernel families associatively."""
    x = col_to_numpy(b[x_col]).astype(np.int64)
    y = col_to_numpy(b[y_col]).astype(np.float64)
    if interior is not None:
        m = (x != interior[0]) & (x != interior[1])
        x, y = x[m], y[m]
    cols = {k: [] for k in _PARTIAL_FIELDS}
    if len(x):
        if full_range:
            # public with-x binning: side='right' index boundaries =>
            # point on boundary j -> bin j-1; clip pins x==x[0] to bin 0
            bins = np.clip(
                np.searchsorted(boundaries, x.astype(np.float64),
                                side="left") - 1,
                0, len(boundaries) - 2)
        else:
            bins = np.searchsorted(boundaries[1:-1], x.astype(np.float64),
                                   side="left")
        order = np.lexsort((x, bins))
        x, y, bins = x[order], y[order], bins[order]
        if np.any(np.diff(x) == 0):  # strict-x runtime guard (sorted by x
            # within each bin, and bins partition the x range)
            raise ValueError(
                "duplicate x within a block: downsample_big_series requires "
                "strictly increasing x")
        starts = np.concatenate([[0], np.flatnonzero(np.diff(bins)) + 1])
        ends = np.concatenate([starts[1:], [len(bins)]])
        for s, e in zip(starts, ends):
            xs, ys = x[s:e], y[s:e]
            isnan = np.isnan(ys)
            valid = ~isnan
            cols["bin"].append(int(bins[s]))
            cols["cnt"].append(int(e - s))
            if valid.any():
                xv, yv = xs[valid], ys[valid]
                i_min = np.lexsort((xv, yv))[0]        # min y, tie: min x
                i_max = np.lexsort((xv, -yv))[0]       # max y, tie: min x
                cols["ymin"].append(float(yv[i_min]))
                cols["xminy"].append(int(xv[i_min]))
                cols["ymax"].append(float(yv[i_max]))
                cols["xmaxy"].append(int(xv[i_max]))
            else:
                cols["ymin"].append(None)
                cols["xminy"].append(None)
                cols["ymax"].append(None)
                cols["xmaxy"].append(None)
            cols["nanx"].append(int(xs[isnan][0]) if isnan.any() else None)
            for k in range(4):
                cols[f"f{k+1}x"].append(int(xs[k]) if e - s > k else None)
                cols[f"f{k+1}y"].append(float(ys[k]) if e - s > k else None)
            cols["lx"].append(int(xs[-1]))
            cols["ly"].append(float(ys[-1]))
    ints = {"bin", "cnt"}
    xish = {"xminy", "xmaxy", "nanx", "f1x", "f2x", "f3x", "f4x", "lx"}
    return pa.table({
        k: pa.array(cols[k],
                    pa.int64() if (k in ints or k in xish) else pa.float64())
        for k in _PARTIAL_FIELDS
    })


def _first_points(rows: dict, k: int) -> list:
    """The k globally smallest-x (x, y) points from the per-block first-4
    candidates (exact whenever the bin holds <= 4 points in total, and for
    k <= 4 in general because each block contributed its own first 4)."""
    sx = np.concatenate([rows[f"f{j}x"] for j in range(1, 5)])
    sy = np.concatenate([rows[f"f{j}y"] for j in range(1, 5)])
    keep = ~np.isnan(sx)
    sx, sy = sx[keep], sy[keep]
    o = np.argsort(sx, kind="stable")
    ssx = sx[o]
    if ssx.size > 1 and np.any(ssx[1:] == ssx[:-1]):
        # in-block dups are rejected in _phase1_partial, so a dup here is
        # a cross-block duplicate x in the bin INTERIOR — exactly the case
        # whose tie-break would otherwise depend on shuffle arrival order
        raise ValueError(
            "duplicate x across blocks inside a bin: downsample_big_series "
            "requires strictly increasing x")
    return [(int(sx[i]), float(sy[i])) for i in o[:k]]


def _merge_bin(rows: dict, *, family: str, nan_return: bool) -> list:
    """Exact associative merge of one bin's partials -> the bin's selected
    (x, y) points in the kernel's emission order (ascending x under strict
    x; duplicates retained; tiny-bin passthrough).

    ``family="minmax"``: <=2-point passthrough, else the (min, max) pair —
    ``kernels/minmax.py`` / MinMaxLTTB phase-1 semantics.
    ``family="m4"``: <=4-point passthrough, else (first, min, max, last) —
    ``kernels/m4.py`` semantics."""
    cnt = int(np.nansum(rows["cnt"]))
    if cnt == 0:
        return []
    # cross-block duplicate-x detection over every candidate source that
    # can reach the output (first-4 are checked inside _first_points):
    # each partial row is one block's contribution, so a repeated value
    # within any of these arrays is the same x in two blocks
    for key in ("xminy", "xmaxy", "lx"):
        v = rows[key]
        v = v[~np.isnan(v)]
        if v.size > 1:
            vs = np.sort(v)
            if np.any(vs[1:] == vs[:-1]):
                raise ValueError(
                    "duplicate x across blocks inside a bin: "
                    "downsample_big_series requires strictly increasing x")
    thresh = 2 if family == "minmax" else 4
    if cnt <= thresh:  # tiny-bin passthrough: emit every point
        return _first_points(rows, cnt)

    first = _first_points(rows, 1)[0]
    last_i = int(np.argmax(rows["lx"]))
    last = (int(rows["lx"][last_i]), float(rows["ly"][last_i]))

    nanxs = rows["nanx"]
    nan_present = bool(np.any(~np.isnan(nanxs)))
    if nan_return and nan_present:
        nx = int(np.nanmin(nanxs))
        pair = [(nx, float("nan")), (nx, float("nan"))]
        return pair if family == "minmax" else [first] + pair + [last]

    ymin, xminy = rows["ymin"], rows["xminy"]
    valid = ~np.isnan(ymin)
    if not valid.any():  # all-NaN bin, nan-ignoring -> bin's first point
        pair = [first, first]
        return pair if family == "minmax" else [first, first, first, last]
    i_min = np.lexsort((xminy[valid], ymin[valid]))[0]
    a_min = (int(xminy[valid][i_min]), float(ymin[valid][i_min]))
    ymax, xmaxy = rows["ymax"], rows["xmaxy"]
    i_max = np.lexsort((xmaxy[valid], -ymax[valid]))[0]
    a_max = (int(xmaxy[valid][i_max]), float(ymax[valid][i_max]))
    pair = sorted([a_min, a_max], key=lambda p: p[0])
    return pair if family == "minmax" else [first] + pair + [last]


def _merge_partials(partials_ds, *, family: str, nan_return: bool):
    """groupby("bin") associative merge of the phase-1 partials -> the
    selected (bin, x, y) points, <= 4 per bin — the per-bin work runs in
    the cluster (a driver loop over blocks x bins rows would bottleneck at
    ~4k bins x 10k blocks); only the selected points reach the driver."""

    def _merge_group(g: pa.Table) -> pa.Table:
        rows = {k: pc.cast(g[k], pa.float64()).to_numpy(
            zero_copy_only=False) for k in _PARTIAL_FIELDS}
        # the x candidates round-trip through float64 here (NaN is the
        # missing-sentinel, so int64 storage can't carry them) — past
        # 2^53 that round-trip is lossy and the int(...) recovery below
        # would silently corrupt x; raise and ask for a rebase instead
        for k in ("xminy", "xmaxy", "nanx", "f1x", "f2x", "f3x", "f4x",
                  "lx"):
            a = rows[k]
            fin = a[np.isfinite(a)]
            if len(fin) and np.abs(fin).max() >= 2.0 ** 53:
                raise OverflowError(
                    "bigseries merge: |x| >= 2^53 is not exactly "
                    "representable in the float64 partial columns — "
                    "rebase x by a constant first (see the module "
                    "docstring's float exactness note)")
        pts = _merge_bin(rows, family=family, nan_return=nan_return)
        return pa.table({
            "bin": pa.array([int(rows["bin"][0])] * len(pts), pa.int64()),
            "x": pa.array([p[0] for p in pts], pa.int64()),
            "y": pa.array([p[1] for p in pts], pa.float64()),
        })

    merged = partials_ds.groupby("bin").map_groups(
        _merge_group, batch_format="pyarrow")
    pts = merged.take_all()  # <= 4 rows per bin, independent of n
    if not pts:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    bx = np.array([(r["bin"], r["x"]) for r in pts], dtype=np.int64)
    ys = np.array([r["y"] for r in pts], dtype=np.float64)
    order = np.lexsort((bx[:, 1], bx[:, 0]))  # bin order, x order within
    return bx[order, 1], ys[order]


_FAMILIES = {
    "minmax": ("minmax", False), "nanminmax": ("minmax", True),
    "m4": ("m4", False), "nanm4": ("m4", True),
    "minmaxlttb": ("lttb", False), "nanminmaxlttb": ("lttb", True),
}


def downsample_big_series(ds, n_out: int, *, kernel: str = "minmaxlttb",
                          x_col: str = "x", y_col: str = "y", ratio: int = 4,
                          nan_policy_return: bool | None = None) -> pa.Table:
    """Distributed downsample of one series held in a (multi-block)
    Dataset; returns the selected rows as a small Arrow table
    ``(x_col, y_col)`` equal to the single-node kernel's gather.

    ``kernel``: minmax | nanminmax | m4 | nanm4 | minmaxlttb |
    nanminmaxlttb (``nan_policy_return=True`` upgrades a plain name to its
    NaN-returning variant for backward compatibility)."""
    try:
        family, nan_ret = _FAMILIES[kernel]
    except KeyError:
        raise ValueError(f"unknown bigseries kernel: {kernel!r}") from None
    if nan_policy_return is not None and nan_policy_return:
        nan_ret = True
    x0, y0, x1, xm2, xm1, ylast, n = _series_edges(ds, x_col, y_col)

    if family == "lttb":
        nb = (n_out * ratio) // 2
        if n // n_out <= ratio:
            raise ValueError(
                "series too small for the two-phase path; use "
                "downsample_dataset (n // n_out must exceed ratio)")
        boundaries = np.linspace(float(x1), float(xm2), nb + 1)
        partials = ds.map_batches(
            lambda b: _phase1_partial(
                b, boundaries=boundaries, x_col=x_col, y_col=y_col,
                interior=(int(x0), int(xm1)), full_range=False),
            batch_format="pyarrow")
        xs, ys = _merge_partials(partials, family="minmax",
                                 nan_return=nan_ret)
        x_sel = np.concatenate(([x0], xs, [xm1])).astype(np.int64)
        y_sel = np.concatenate(([y0], ys, [ylast])).astype(np.float64)
        pos = lttb(x_sel, y_sel, n_out).astype(np.intp)
        return pa.table({x_col: pa.array(x_sel[pos], pa.int64()),
                         y_col: pa.array(y_sel[pos], pa.float64())})

    per_bin = 2 if family == "minmax" else 4
    if n_out % per_bin:
        raise ValueError(f"n_out must be a multiple of {per_bin}")
    if n_out >= n:
        raise ValueError(
            "n_out >= series length: the identity short-circuit needs no "
            "distribution; use downsample_dataset / the kernels directly")
    nb = n_out // per_bin
    boundaries = np.linspace(float(x0), float(xm1), nb + 1)
    partials = ds.map_batches(
        lambda b: _phase1_partial(
            b, boundaries=boundaries, x_col=x_col, y_col=y_col,
            interior=None, full_range=True),
        batch_format="pyarrow")
    xs, ys = _merge_partials(partials, family=family, nan_return=nan_ret)
    # the public minmax kernel np.unique()s its indices, but its
    # NaN-RETURNING variant retains the pinned duplicate pair — key the
    # dedup on the effective policy, not the kernel NAME, or
    # nan_policy_return=True on "minmax" would drop a mandated row
    if family == "minmax" and not nan_ret:
        keep = np.concatenate(([True], np.diff(xs) != 0))
        xs, ys = xs[keep], ys[keep]
    return pa.table({x_col: pa.array(xs, pa.int64()),
                     y_col: pa.array(ys, pa.float64())})
