"""Largest-Triangle-Three-Buckets (LTTB) kernel (single series, NumPy).

Re-derived from the reference Python oracle ``LTTB_py``
(``/root/reference/tsdownsample/_python/downsamplers.py:31-116``). The
reference's compliance suite certifies LTTB_py equivalent to its Rust
kernel ONLY on equidistant x (``tests/test_algos_python_compliance.py``
uses ``x = arange(n)``): the shipped Rust kernel uses the bucket x
*midpoint* ``(x[end-1] + x[start]) / 2`` (``lttb.rs:46-50``) where LTTB_py
uses the bucket x *mean*. On equidistant x the two coincide; on
irregular/gapped x they can select different points. This kernel follows
LTTB_py, the engine's golden oracle (SURVEY.md §2.3), by default and
offers ``bucket_x="midpoint"`` for bit-parity with the shipped Rust
binary on non-equidistant x (the one reference-behavior divergence,
VERDICT r3 "what's missing" #1):

- first and last points always kept;
- bucket offsets ``arange(1, n, (n-2)/(n_out-2)).astype(int64)``;
- per bucket, select the point maximizing the triangle area spanned by the
  previously selected point and the *mean* of the next bucket (means
  accumulate in f64 — ``helpers.rs:22-33``);
- the last interior bucket uses the final point as its "next average".

The algorithm is inherently sequential per series (each bucket depends on the
previous selection) — the engine parallelizes across series, never within one
(``src/lib.rs:349-370``: no parallel LTTB in the reference either).
Identity short-circuit mirrors ``lttb.rs:23-25``.
"""

from __future__ import annotations

import numpy as np

from .binning import view_x, view_y

__all__ = ["lttb"]


def _argmax_area(prev_x, prev_y, avg_next_x, avg_next_y, x_bucket, y_bucket) -> int:
    # vectorized 2x-triangle-area argmax (LTTB_py._argmax_area, :33-60)
    return int(
        np.abs(
            x_bucket * (prev_y - avg_next_y)
            + y_bucket * (avg_next_x - prev_x)
            + (prev_x * avg_next_y - avg_next_x * prev_y)
        ).argmax()
    )


def lttb(x, y, n_out: int, *, bucket_x: str = "mean") -> np.ndarray:
    if bucket_x not in ("mean", "midpoint"):
        raise ValueError("bucket_x must be 'mean' or 'midpoint'")
    y = view_y(np.asarray(y))
    if n_out >= len(y):
        return np.arange(len(y), dtype=np.uint64)
    if n_out < 3:
        raise ValueError("n_out must be >= 3 for LTTB")
    if x is None:
        x = np.arange(y.shape[0])
    else:
        x = view_x(np.asarray(x))

    # float upcast for the area arithmetic, matching AsPrimitive<f64>
    # (lttb.rs generic bound); int64 x (e.g. viewed timestamps) keeps enough
    # precision through f64 for realistic ranges, same as the reference.
    xf = x.astype(np.float64, copy=False)
    yf = y.astype(np.float64, copy=False)

    block_size = (y.shape[0] - 2) / (n_out - 2)
    # astype AFTER creation — arange with a float step then truncate
    # (LTTB_py:70-75)
    offset = np.arange(start=1, stop=y.shape[0], step=block_size).astype(np.int64)

    sampled = np.empty(n_out, dtype=np.int64)
    sampled[0] = 0
    sampled[-1] = y.shape[0] - 1

    a = 0
    midpoint = bucket_x == "midpoint"
    off = offset.tolist()  # plain ints: avoids per-iter numpy-scalar slicing
    for i in range(n_out - 3):
        o0, o1, o2 = off[i], off[i + 1], off[i + 2]
        nxt_y = yf[o1:o2]
        if midpoint:
            # shipped Rust kernel: (x[end-1] + x[start]) / 2 (lttb.rs:46-50)
            avg_x = (xf[o2 - 1] + xf[o1]) / 2.0
        else:
            # slice.sum()/n is bit-identical to np.mean (same umr_sum
            # reduction) with far less dispatch overhead (loop-bound)
            avg_x = xf[o1:o2].sum() / (o2 - o1)
        a = (
            _argmax_area(
                prev_x=xf[a],
                prev_y=yf[a],
                avg_next_x=avg_x,
                avg_next_y=nxt_y.sum() / (o2 - o1),
                x_bucket=xf[o0:o1],
                y_bucket=yf[o0:o1],
            )
            + o0
        )
        sampled[i + 1] = a

    # last interior bucket: next-average is the final point (LTTB_py:103-115)
    sampled[-2] = (
        _argmax_area(
            prev_x=xf[a],
            prev_y=yf[a],
            avg_next_x=xf[-1],
            avg_next_y=yf[-1],
            x_bucket=xf[offset[-2] : offset[-1]],
            y_bucket=yf[offset[-2] : offset[-1]],
        )
        + offset[-2]
    )
    return sampled.astype(np.uint64)
