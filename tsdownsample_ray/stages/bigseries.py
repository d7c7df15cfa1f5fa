"""Distributed downsampling of ONE huge series that spans many blocks.

The per-series engine (``stages/downsample.py``) requires a series to fit
one group; the reference instead parallelizes WITHIN a series with rayon
over bins (``downsample_rs/src/minmax.rs:139-179``, benched to 5e9 points
in ``notebooks/benches.ipynb``). This module is the Ray Data analog of the
reference's MinMaxLTTB two-phase trick (``minmaxlttb.rs:126-170``):

- **phase 1 (distributed)**: MinMax preselection over the series interior
  — bins are independent, so each block computes per-bin partial
  candidates inside ``map_batches`` (argmin/argmax with exact tie-breaks,
  tiny-bin passthrough rows, NaN policy) and the driver merges the tiny
  associative partials (O(blocks x bins) rows, independent of n);
- **phase 2 (driver)**: the sequential LTTB kernel over the ~n_out*ratio*2
  preselected points — exactly the single-node kernel, so the distributed
  result EQUALS ``kernels.minmaxlttb`` on the same arrays (pytest-pinned).

Partitioning assumption (documented per the build brief): ``x`` is
STRICTLY increasing within the series — the engine's per-series stages
guarantee this for rollup buckets (one bucket value per row); raw inputs
with duplicate x must be deduplicated first (first-occurrence tie-breaks
are positional, and position is unrecoverable across unordered blocks).

Float exactness note: phase-2 LTTB averages bucket x in f64; callers with
epoch-us timestamps should REBASE x by a constant (x - base) so bucket
sums stay under 2^53 and remain bit-exact under any summation order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

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
            f"series too small for the two-phase path ({n} points); use "
            "downsample_dataset / the kernels directly")
    order = np.argsort(x, kind="stable")
    lo, hi = order[:2], order[-2:]
    return (x[lo[0]], y[lo[0]], x[lo[1]],       # x0, y0, x1
            x[hi[0]], x[hi[1]], y[hi[1]], n)    # x_{n-2}, x_{n-1}, y_{n-1}


def _phase1_partial(b: pa.Table, *, boundaries: np.ndarray, x_first: int,
                    x_last: int, x_col: str, y_col: str,
                    nan_return: bool) -> pa.Table:
    """Per-block, per-bin partial candidates (vectorized over sorted bins)."""
    x = col_to_numpy(b[x_col]).astype(np.int64)
    y = col_to_numpy(b[y_col]).astype(np.float64)
    m = (x != x_first) & (x != x_last)  # interior only (strict-x assumption)
    x, y = x[m], y[m]
    cols = {k: [] for k in ("bin", "cnt", "ymin", "xminy", "ymax", "xmaxy",
                            "nanx", "x1", "y1", "x2", "y2")}
    if len(x):
        bins = np.searchsorted(boundaries[1:-1], x.astype(np.float64),
                               side="left")
        order = np.lexsort((x, bins))
        x, y, bins = x[order], y[order], bins[order]
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
            cols["x1"].append(int(xs[0]))
            cols["y1"].append(float(ys[0]))
            cols["x2"].append(int(xs[1]) if e - s > 1 else None)
            cols["y2"].append(float(ys[1]) if e - s > 1 else None)
    return pa.table({
        "bin": pa.array(cols["bin"], pa.int64()),
        "cnt": pa.array(cols["cnt"], pa.int64()),
        "ymin": pa.array(cols["ymin"], pa.float64()),
        "xminy": pa.array(cols["xminy"], pa.int64()),
        "ymax": pa.array(cols["ymax"], pa.float64()),
        "xmaxy": pa.array(cols["xmaxy"], pa.int64()),
        "nanx": pa.array(cols["nanx"], pa.int64()),
        "x1": pa.array(cols["x1"], pa.int64()),
        "y1": pa.array(cols["y1"], pa.float64()),
        "x2": pa.array(cols["x2"], pa.int64()),
        "y2": pa.array(cols["y2"], pa.float64()),
    })


def _merge_bin(rows: dict, nan_return: bool) -> list:
    """Exact associative merge of one bin's partials -> the bin's
    preselected (x, y) entries (kernel order: lo index first; duplicates
    retained; passthrough for <= 2 points)."""
    cnt = int(np.sum(rows["cnt"]))
    if cnt == 0:
        return []
    # two globally smallest-x rows (for passthrough / all-NaN fallback)
    sx = np.concatenate([rows["x1"], rows["x2"]])
    sy = np.concatenate([rows["y1"], rows["y2"]])
    keep = ~np.isnan(sx.astype(np.float64)) if sx.dtype.kind == "f" else \
        np.ones(len(sx), dtype=bool)
    sx, sy = sx[keep], sy[keep]
    o = np.argsort(sx, kind="stable")
    small = [(int(sx[i]), float(sy[i])) for i in o[:2]]
    if cnt <= 2:
        return small
    nanxs = rows["nanx"]
    nan_present = np.any(~np.isnan(nanxs)) if nanxs.dtype.kind == "f" else \
        np.any(nanxs != None)  # noqa: E711
    if nan_return and nan_present:
        nx = int(np.nanmin(nanxs.astype(np.float64)))
        return [(nx, float("nan")), (nx, float("nan"))]
    ymin, xminy = rows["ymin"], rows["xminy"]
    valid = ~np.isnan(ymin)
    if not valid.any():  # all-NaN bin under nan-ignoring policy -> first row
        return [small[0], small[0]]
    i_min = np.lexsort((xminy[valid], ymin[valid]))[0]
    a_min = (int(xminy[valid][i_min]), float(ymin[valid][i_min]))
    ymax, xmaxy = rows["ymax"], rows["xmaxy"]
    i_max = np.lexsort((xmaxy[valid], -ymax[valid]))[0]
    a_max = (int(xmaxy[valid][i_max]), float(ymax[valid][i_max]))
    return sorted([a_min, a_max], key=lambda p: p[0])


def downsample_big_series(ds, n_out: int, *, x_col: str = "x",
                          y_col: str = "y", ratio: int = 4,
                          nan_policy_return: bool = False) -> pa.Table:
    """Distributed MinMaxLTTB over one series held in a (multi-block)
    Dataset; returns the selected rows as a small Arrow table
    ``(x_col, y_col)`` equal to the single-node kernel's gather."""
    nb = (n_out * ratio) // 2
    x0, y0, x1, xm2, xm1, ylast, n = _series_edges(ds, x_col, y_col)
    if n // n_out <= ratio:
        raise ValueError(
            "series too small for the two-phase path; use "
            "downsample_dataset (n // n_out must exceed ratio)")
    boundaries = np.linspace(float(x1), float(xm2), nb + 1)

    partials = ds.map_batches(
        lambda b: _phase1_partial(
            b, boundaries=boundaries, x_first=int(x0), x_last=int(xm1),
            x_col=x_col, y_col=y_col, nan_return=nan_policy_return),
        batch_format="pyarrow",
    ).take_all()  # O(blocks x bins) tiny rows, independent of n

    import pandas as pd

    pt = pd.DataFrame(partials)
    xs, ys = [int(x0)], [float(y0)]
    if len(pt):
        for _, grp in pt.sort_values("bin").groupby("bin", sort=True):
            # uniform float64 view (None -> NaN): pandas gives OBJECT dtype
            # to nullable int columns, which breaks vectorized merging; x
            # stays exact below 2^53 (already required by the f64 LTTB math)
            rows = {k: pd.to_numeric(grp[k], errors="coerce")
                    .to_numpy(dtype=np.float64) for k in pt.columns}
            for px, py in _merge_bin(rows, nan_policy_return):
                xs.append(px)
                ys.append(py)
    xs.append(int(xm1))
    ys.append(float(ylast))

    x_sel = np.array(xs, dtype=np.int64)
    y_sel = np.array(ys, dtype=np.float64)
    pos = lttb(x_sel, y_sel, n_out).astype(np.intp)
    return pa.table({x_col: pa.array(x_sel[pos], pa.int64()),
                     y_col: pa.array(y_sel[pos], pa.float64())})