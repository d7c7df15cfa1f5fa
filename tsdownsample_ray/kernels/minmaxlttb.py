"""MinMaxLTTB kernel — two-phase MinMax preselection + LTTB refinement.

Re-derived from ``/root/reference/downsample_rs/src/minmaxlttb.rs:126-207``
(``minmaxlttb_generic`` / ``minmaxlttb_generic_without_x``; paper
arXiv:2305.00332):

- If ``len // n_out > ratio`` (integer division, :136/:182): run MinMax on the
  *interior* ``y[1:-1]`` with ``n_out * ratio`` outputs, shift indices +1,
  prepend 0 and append len-1, gather the preselected points, run LTTB over
  them (x = original x values; in the no-x variant the preselected *indices*
  serve as x, :198), then map LTTB's positions back through the preselection
  index (:164-167).
- Otherwise plain LTTB on the full series (:169-170, :205-206).

Phase 1 uses the bin-ordered, duplicate-retaining MinMax output
(``minmax_unsorted_pairs``) exactly as the Rust ``f_minmax`` does; the NaN
variant swaps in the NaN-returning argminmax (``minmaxlttb.rs:32-36``).
"""

from __future__ import annotations

import numpy as np

from .binning import view_x, view_y
from .lttb import lttb
from .minmax import minmax_pairs

__all__ = ["minmaxlttb", "nanminmaxlttb"]


def _minmaxlttb(x, y, n_out: int, ratio: int, *, nan_policy_return: bool,
                bucket_x: str = "mean") -> np.ndarray:
    if ratio <= 1:
        # the reference's Rust layer rejects ratio <= 1 unconditionally
        # (minmaxlttb.rs:134/:180 `assert!(minmax_ratio > 1)`); silently
        # computing would diverge from every reference deployment
        raise ValueError("minmax_ratio must be greater than 1")
    y = view_y(np.asarray(y))
    n = len(y)
    if x is not None:
        x = view_x(np.asarray(x))
        assert len(x) == n
    if n_out >= n:
        return np.arange(n, dtype=np.uint64)

    if n // n_out > ratio:
        interior_x = None if x is None else x[1 : n - 1]
        nan_ret = bool(nan_policy_return and np.issubdtype(y.dtype, np.floating))
        index = minmax_pairs(
            interior_x, y[1 : n - 1], n_out * ratio, nan_policy_return=nan_ret
        )
        index = index + 1
        index = np.concatenate(([0], index, [n - 1]))
        y_sel = y[index]
        # with-x: LTTB over original x values; no-x: over the preselected
        # indices themselves (minmaxlttb.rs:162 vs :198)
        x_sel = index if x is None else x[index]
        pos = lttb(x_sel, y_sel, n_out, bucket_x=bucket_x)
        return index[pos.astype(np.intp)].astype(np.uint64)

    return lttb(x, y, n_out, bucket_x=bucket_x)


def minmaxlttb(x, y, n_out: int, minmax_ratio: int = 4, *,
               bucket_x: str = "mean") -> np.ndarray:
    """NaN-ignoring MinMaxLTTB (default ratio 4, ``downsamplers.py:110-116``).

    ``bucket_x="mean"`` (default) follows the Python-oracle LTTB in the
    refinement phase; ``bucket_x="midpoint"`` follows the shipped Rust
    binary (``lttb.rs:46-50``). The inner LTTB always runs over the
    preselected points, whose x (or index) spacing is irregular whenever
    phase 1 is active, so the two variants can differ even on equidistant
    input — the same mean/midpoint split documented in ``kernels/lttb.py``."""
    return _minmaxlttb(x, y, n_out, minmax_ratio, nan_policy_return=False,
                       bucket_x=bucket_x)


def nanminmaxlttb(x, y, n_out: int, minmax_ratio: int = 4, *,
                  bucket_x: str = "mean") -> np.ndarray:
    """NaN-returning MinMaxLTTB (``downsamplers.py:119-136``)."""
    return _minmaxlttb(x, y, n_out, minmax_ratio, nan_policy_return=True,
                       bucket_x=bucket_x)
