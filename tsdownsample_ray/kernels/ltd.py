"""Largest-Triangle-Dynamic (LTD) kernel (single series, NumPy).

From the same thesis as the reference's LTTB (Steinarsson,
"Downsampling Time Series for Visual Representation", U. Iceland 2013,
§4.2): LTTB with DYNAMIC bucket sizing — an iterative phase first
re-allocates bucket boundaries so that high-variance regions get more
buckets (split the bucket with the largest linear-regression SSE,
merge the adjacent pair with the smallest combined SSE), then the
standard largest-triangle selection runs over the final buckets. The
reference ships only fixed-bucket LTTB/MinMaxLTTB
(``/root/reference/downsample_rs/src/lttb.rs``); LTD completes the
thesis' triangle family next to :mod:`ltob`.

Engine contract (this implementation's own, documented choices — the
thesis leaves them open):

- first/last pinned; interior points partition into ``n_out - 2``
  buckets; initial boundaries use LTTB's float-step offset rule, so
  ``iterations=0`` degenerates to LTTB's buckets exactly.
- per-bucket SSE is the ordinary-least-squares residual sum over the
  bucket's own points (no neighbor overlap); single-point buckets have
  SSE 0; a vertical bucket (zero x-variance) scores its centered y
  variance.
- per iteration: split the max-SSE bucket with >= 2 points at its
  midpoint (``len // 2``), merge the adjacent pair with the smallest
  SSE sum among pairs not involving the split bucket (need >= 4
  buckets). First-occurrence tie-breaks everywhere; the iteration
  stops early when no bucket is splittable.
- selection phase: LTTB_py semantics (previously selected point vs
  next-bucket mean, f64 arithmetic; last bucket pairs with the final
  point).

Deterministic: pure function of ``(x, y, n_out, iterations)``.
"""

from __future__ import annotations

import numpy as np

from .binning import view_x, view_y

__all__ = ["ltd"]


def _bucket_sse(xf: np.ndarray, yf: np.ndarray) -> float:
    """OLS residual SSE of one bucket (f64)."""
    m = len(yf)
    if m < 2:
        return 0.0
    xm = xf.mean()
    ym = yf.mean()
    dx = xf - xm
    dy = yf - ym
    sxx = float(dx @ dx)
    syy = float(dy @ dy)
    if sxx == 0.0:
        return syy
    sxy = float(dx @ dy)
    return syy - (sxy * sxy) / sxx


def ltd(x, y, n_out: int, *, iterations: int | None = None) -> np.ndarray:
    y = view_y(np.asarray(y))
    n = y.shape[0]
    if n_out >= n:
        return np.arange(n, dtype=np.uint64)
    if n_out < 3:
        raise ValueError("n_out must be >= 3 for LTD")
    if iterations is None:
        iterations = n_out
    if iterations < 0:
        raise ValueError("iterations must be >= 0")

    if x is None:
        xf = np.arange(n, dtype=np.float64)
    else:
        xf = view_x(np.asarray(x)).astype(np.float64, copy=False)
    yf = y.astype(np.float64, copy=False)

    # initial boundaries: LTTB's float-step offsets (iterations=0 == LTTB
    # buckets). bounds[i]..bounds[i+1] delimit interior bucket i.
    block_size = (n - 2) / (n_out - 2)
    offset = np.arange(start=1, stop=n, step=block_size).astype(np.int64)
    bounds = offset.tolist()
    if bounds[-1] != n - 1:
        bounds.append(n - 1)
    nb = len(bounds) - 1  # == n_out - 2 interior buckets

    sse = [_bucket_sse(xf[bounds[i]:bounds[i + 1]],
                       yf[bounds[i]:bounds[i + 1]]) for i in range(nb)]

    for _ in range(iterations):
        if nb < 4:
            break
        # split target: max SSE among buckets with >= 2 points
        f_idx, f_best = -1, -np.inf
        for i in range(nb):
            if bounds[i + 1] - bounds[i] >= 2 and sse[i] > f_best:
                f_idx, f_best = i, sse[i]
        if f_idx < 0:
            break
        # merge target: min adjacent SSE sum over pairs excluding f_idx
        m_idx, m_best = -1, np.inf
        for j in range(nb - 1):
            if j == f_idx or j + 1 == f_idx:
                continue
            s = sse[j] + sse[j + 1]
            if s < m_best:
                m_idx, m_best = j, s
        if m_idx < 0:
            break
        # apply: split f_idx at its midpoint, merge (m_idx, m_idx+1)
        lo, hi = bounds[f_idx], bounds[f_idx + 1]
        mid = lo + (hi - lo) // 2
        if m_idx < f_idx:
            # remove boundary between the merged pair, insert the split
            del bounds[m_idx + 1]
            bounds.insert(f_idx, mid)  # f_idx shifted left by 1
            merged = _bucket_sse(xf[bounds[m_idx]:bounds[m_idx + 1]],
                                 yf[bounds[m_idx]:bounds[m_idx + 1]])
            sse[m_idx:m_idx + 2] = [merged]
            fi = f_idx - 1
            sse[fi:fi + 1] = [
                _bucket_sse(xf[bounds[fi]:bounds[fi + 1]],
                            yf[bounds[fi]:bounds[fi + 1]]),
                _bucket_sse(xf[bounds[fi + 1]:bounds[fi + 2]],
                            yf[bounds[fi + 1]:bounds[fi + 2]])]
        else:
            bounds.insert(f_idx + 1, mid)
            sse[f_idx:f_idx + 1] = [
                _bucket_sse(xf[bounds[f_idx]:bounds[f_idx + 1]],
                            yf[bounds[f_idx]:bounds[f_idx + 1]]),
                _bucket_sse(xf[bounds[f_idx + 1]:bounds[f_idx + 2]],
                            yf[bounds[f_idx + 1]:bounds[f_idx + 2]])]
            mi = m_idx + 1  # shifted right by the insert
            del bounds[mi + 1]
            merged = _bucket_sse(xf[bounds[mi]:bounds[mi + 1]],
                                 yf[bounds[mi]:bounds[mi + 1]])
            sse[mi:mi + 2] = [merged]

    # selection phase: LTTB over the final buckets (LTTB_py semantics)
    sampled = np.empty(n_out, dtype=np.int64)
    sampled[0] = 0
    sampled[-1] = n - 1
    a = 0
    for i in range(nb - 1):
        o0, o1, o2 = bounds[i], bounds[i + 1], bounds[i + 2]
        avg_x = xf[o1:o2].mean()
        avg_y = yf[o1:o2].mean()
        xb = xf[o0:o1]
        yb = yf[o0:o1]
        area = np.abs(
            xb * (yf[a] - avg_y) + yb * (avg_x - xf[a])
            + (xf[a] * avg_y - avg_x * yf[a]))
        a = int(area.argmax()) + o0
        sampled[i + 1] = a
    o0, o1 = bounds[nb - 1], bounds[nb]
    xb = xf[o0:o1]
    yb = yf[o0:o1]
    area = np.abs(
        xb * (yf[a] - yf[-1]) + yb * (xf[-1] - xf[a])
        + (xf[a] * yf[-1] - xf[-1] * yf[a]))
    sampled[-2] = int(area.argmax()) + o0
    return sampled.astype(np.uint64)
