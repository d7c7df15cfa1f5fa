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
    n = y.shape[0]
    if n_out >= n:
        return np.arange(n, dtype=np.uint64)
    if n_out < 3:
        raise ValueError("n_out must be >= 3 for LTTB")

    # float upcast for the area arithmetic, matching AsPrimitive<f64>
    # (lttb.rs generic bound); int64 x (e.g. viewed timestamps) keeps enough
    # precision through f64 for realistic ranges, same as the reference.
    # The implicit-x path never materializes the 8·n-byte arange: bucket x
    # values are regenerated into an L2-resident scratch (exact — every
    # index < 2^53 round-trips f64), and bucket x sums use the closed-form
    # integer series sum, which equals the float reduction bit-for-bit while
    # the true integer sum is f64-exact (guarded below).
    have_x = x is not None
    if have_x:
        xf = view_x(np.asarray(x)).astype(np.float64, copy=False)

    block_size = (n - 2) / (n_out - 2)
    # astype AFTER creation — arange with a float step then truncate
    # (LTTB_py:70-75); block_size > 1 for n_out < n, so offsets are strictly
    # increasing (no empty buckets, reduceat segments == slice sums).
    offset = np.arange(start=1, stop=n, step=block_size).astype(np.int64)
    off = offset.tolist()  # plain ints: avoids per-iter numpy-scalar slicing
    wmax = int(np.diff(offset).max()) if offset.shape[0] > 1 else 1

    # ALL interior bucket y sums in one C pass (f64 accumulation regardless
    # of y dtype — each f16/f32/int element casts to f64 exactly) instead of
    # n_out per-bucket slice dispatches. Accumulation-order contract:
    # reduceat sums sequentially while slice.sum() switches to pairwise
    # blocking above ~128 elements, so for CONTINUOUS f64 data in buckets
    # wider than that the bucket mean can differ from LTTB_py's by ~1 ulp
    # (argmax flips only on exact area near-ties; the engine's SQL oracles
    # replay THIS kernel and the model-equivalence suite pins both the
    # narrow-bucket bit-exact regime and wide-bucket exactly-summable
    # dtypes, where any order is exact).
    ysum = np.add.reduceat(y, offset, dtype=np.float64)

    mean_x = bucket_x == "mean"
    exact_ix = not have_x and n * wmax < 2**53  # closed-form int sums f64-exact
    if have_x and mean_x:
        xsum = np.add.reduceat(xf, offset)
    elif mean_x and not exact_ix:  # pathological n: fall back to real arange
        xf = np.arange(n, dtype=np.float64)
        xsum = np.add.reduceat(xf, offset)
        have_x = True

    sampled = np.empty(n_out, dtype=np.int64)
    sampled[0] = 0
    sampled[-1] = n - 1

    a = 0
    # reused scratch for the area pass — widest bucket wins
    t1 = np.empty(wmax, dtype=np.float64)
    t2 = np.empty(wmax, dtype=np.float64)
    if not have_x:
        xbase = np.arange(wmax, dtype=np.float64)
        xb_s = np.empty(wmax, dtype=np.float64)
    cast_y = y.dtype != np.float64
    if cast_y:
        yb_s = np.empty(wmax, dtype=np.float64)

    def _bucket_views(o0: int, o1: int):
        w = o1 - o0
        if have_x:
            xb = xf[o0:o1]
        else:
            # xb[j] = f64(o0 + j), exact (both operands are exact integers)
            xb = xb_s[:w]
            np.add(xbase[:w], float(o0), out=xb)
        if cast_y:
            yb = yb_s[:w]
            yb[:] = y[o0:o1]  # widening cast, exact
        else:
            yb = y[o0:o1]
        return xb, yb

    for i in range(n_out - 3):
        o0, o1, o2 = off[i], off[i + 1], off[i + 2]
        if mean_x:
            # reduceat sum / n (accumulation-order caveat above); the
            # implicit-x series sum is an exact integer, which any float
            # reduction order computes exactly (sums < 2^53, guarded above)
            if have_x:
                avg_x = xsum[i + 1] / (o2 - o1)
            else:
                avg_x = float(((o1 + o2 - 1) * (o2 - o1)) // 2) / (o2 - o1)
        else:
            # shipped Rust kernel: (x[end-1] + x[start]) / 2 (lttb.rs:46-50)
            if have_x:
                avg_x = (xf[o2 - 1] + xf[o1]) / 2.0
            else:
                avg_x = (float(o2 - 1) + float(o1)) / 2.0
        xb, yb = _bucket_views(o0, o1)
        a = (
            _argmax_area_scratch(
                prev_x=xf[a] if have_x else float(a),
                prev_y=float(y[a]),
                avg_next_x=avg_x,
                avg_next_y=ysum[i + 1] / (o2 - o1),
                x_bucket=xb,
                y_bucket=yb,
                t1=t1,
                t2=t2,
            )
            + o0
        )
        sampled[i + 1] = a

    # last interior bucket: next-average is the final point (LTTB_py:103-115)
    o0, o1 = off[-2], off[-1]
    xb, yb = _bucket_views(o0, o1)
    sampled[-2] = (
        _argmax_area_scratch(
            prev_x=xf[a] if have_x else float(a),
            prev_y=float(y[a]),
            avg_next_x=xf[-1] if have_x else float(n - 1),
            avg_next_y=float(y[-1]),
            x_bucket=xb,
            y_bucket=yb,
            t1=t1,
            t2=t2,
        )
        + o0
    )
    return sampled.astype(np.uint64)
