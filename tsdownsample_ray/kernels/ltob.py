"""Largest-Triangle-One-Bucket (LTOB) kernel (single series, NumPy).

From the same thesis as the reference's LTTB (Steinarsson,
"Downsampling Time Series for Visual Representation", U. Iceland 2013,
§4.1): per bucket, keep the point with the largest *effective area* —
the triangle over its IMMEDIATE neighbors ``(p[i-1], p[i], p[i+1])`` —
instead of LTTB's previously-selected-point/next-bucket-average
triangle. The reference ships only LTTB/MinMaxLTTB
(``/root/reference/downsample_rs/src/lttb.rs``); LTOB extends the
family with the non-sequential member: every point's area depends only
on its fixed neighbors, so the whole kernel is one vectorized area
pass plus a per-bucket argmax — no sequential chain (unlike LTTB,
SURVEY.md §2.3).

Layout: first/last pinned; the interior points ``1..n-2`` partition
into ``n_out - 2`` buckets by the INTEGER-EXACT equal-width rule
``bucket(i) = (i-1)*(n_out-2) // (n-2)`` (every bucket non-empty for
``n > n_out``). Chosen over LTTB's float-step offsets deliberately:
the whole kernel — layout, areas, argmax — is then pure integer
arithmetic on integer x/y, and the SQL oracle replays it term by term.
Doubled area ``|(x[i-1]-x[i+1])*(y[i]-y[i+1]) -
(x[i]-x[i+1])*(y[i-1]-y[i+1])|`` is exact int64 (overflow contract:
``2 * max|dx| * max|dy| < 2^63``); ties take the smallest index
(numpy-argmax semantics).
"""

from __future__ import annotations

import numpy as np

from .binning import view_x, view_y

__all__ = ["ltob"]


def ltob(x, y, n_out: int) -> np.ndarray:
    y = view_y(np.asarray(y))
    n = y.shape[0]
    if n_out >= n:
        return np.arange(n, dtype=np.uint64)
    if n_out < 3:
        raise ValueError("n_out must be >= 3 for LTOB")
    if x is None:
        xv = np.arange(n, dtype=np.int64)
    else:
        xv = view_x(np.asarray(x))
    exact = (np.issubdtype(xv.dtype, np.integer)
             and np.issubdtype(y.dtype, np.integer))
    dt = np.int64 if exact else np.float64
    xs = xv.astype(dt, copy=False)
    ys = y.astype(dt, copy=False)

    # doubled triangle area over immediate neighbors; slot i-1 holds
    # interior point i
    dx02 = xs[:-2] - xs[2:]          # x[i-1] - x[i+1]
    dy12 = ys[1:-1] - ys[2:]         # y[i]   - y[i+1]
    dx12 = xs[1:-1] - xs[2:]         # x[i]   - x[i+1]
    dy02 = ys[:-2] - ys[2:]          # y[i-1] - y[i+1]
    area = np.abs(dx02 * dy12 - dx12 * dy02)

    m = len(area)                    # == n - 2 interior points
    nb = n_out - 2
    b = np.arange(m, dtype=np.int64) * nb // m  # monotone, all values hit
    starts = np.searchsorted(b, np.arange(nb, dtype=np.int64))
    ends = np.r_[starts[1:], m]
    bmax = np.maximum.reduceat(area, starts)
    idx = np.arange(m, dtype=np.int64)
    big = np.int64(m + 1)
    hit = np.where(area == np.repeat(bmax, ends - starts), idx, big)
    win = np.minimum.reduceat(hit, starts)
    out = np.empty(n_out, dtype=np.uint64)
    out[0] = 0
    out[1:-1] = (win + 1).astype(np.uint64)
    out[-1] = n - 1
    return out
