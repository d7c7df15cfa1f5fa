"""M4 / NaNM4 downsampling kernels (single series, NumPy).

Per non-empty bin (``n_out/4`` bins) emit: first index, y-argmin, y-argmax,
last index — in index order within the bin, duplicates retained.

Re-derived from the reference:

- Python oracle ``M4_py`` / ``NaNM4_py``
  (``/root/reference/tsdownsample/_python/downsamplers.py:181-257``).
- Rust public kernels: identity short-circuit (``m4.rs:109-111``); the with-x
  path emits ALL points of a bin holding <= 4 elements (tiny-bin passthrough,
  ``m4.rs:205-211``) — pinned by the gap hand-tests (``m4.rs:392-436``,
  e.g. the singleton bin emitting one index in
  ``[0,0,39,39,40,40,50,50,51,52,52,...]``). The no-x path
  (``m4.rs:103-142``) has no passthrough; no-x bins are always > 4 points
  whenever the identity guard doesn't fire, so the formulations agree on the
  compliance grid.
"""

from __future__ import annotations

import numpy as np

from .argminmax import bin_argminmax
from .binning import get_bin_idxs, get_bin_idxs_nox, view_x, view_y

__all__ = ["m4", "nanm4"]


def _m4_core_loop(x, y, nb_bins: int, *, nan_policy_return: bool, passthrough: bool) -> np.ndarray:
    """Reference formulation (per-bin loop) — the oracle for the vectorized
    core's equivalence tests."""
    bins = get_bin_idxs(x, nb_bins) if x is not None else get_bin_idxs_nox(len(y), nb_bins)
    if nan_policy_return:
        f_min, f_max = np.argmin, np.argmax
    else:
        f_min, f_max = np.nanargmin, np.nanargmax
    idxs = []
    for lower, upper in zip(bins[:-1], bins[1:]):
        n_bin = upper - lower
        if n_bin <= 0:
            continue
        if passthrough and n_bin <= 4:
            idxs.extend(range(lower, upper))  # m4.rs:205-211
            continue
        y_slice = y[lower:upper]
        try:
            mn = int(f_min(y_slice))
            mx = int(f_max(y_slice))
        except ValueError:  # all-NaN bin under nan-ignoring policy
            mn = mx = 0
        lo, hi = (mn, mx) if mn < mx else (mx, mn)
        # first, argmin/argmax in index order, last (m4.rs:126-137)
        idxs.append(lower)
        idxs.append(lower + lo)
        idxs.append(lower + hi)
        idxs.append(upper - 1)
    return np.asarray(idxs, dtype=np.uint64)


def _m4_core(x, y, nb_bins: int, *, nan_policy_return: bool, passthrough: bool) -> np.ndarray:
    """Vectorized core (see argminmax.bin_argminmax)."""
    bins = get_bin_idxs(x, nb_bins) if x is not None else get_bin_idxs_nox(len(y), nb_bins)
    starts, ends = bins[:-1], bins[1:]
    nonempty = ends > starts
    s = starts[nonempty].astype(np.int64)
    e = ends[nonempty].astype(np.int64)
    if len(s) == 0:
        return np.empty(0, dtype=np.uint64)

    nan_ret = nan_policy_return and np.issubdtype(y.dtype, np.floating)
    amin, amax = bin_argminmax(y, s, e, nan_policy_return=nan_ret)
    lo = np.minimum(amin, amax)
    hi = np.maximum(amin, amax)

    cnt = e - s
    small = (cnt <= 4) if passthrough else np.zeros(len(s), dtype=bool)
    out_counts = np.where(small, cnt, 4)
    offs = np.concatenate(([0], np.cumsum(out_counts)))
    out = np.empty(offs[-1], dtype=np.int64)

    big = ~small
    base = offs[:-1][big]
    out[base] = s[big]
    out[base + 1] = lo[big]
    out[base + 2] = hi[big]
    out[base + 3] = e[big] - 1
    if small.any():  # tiny-bin passthrough (m4.rs:205-211): emit all points
        for k in range(4):
            sel = small & (cnt > k)
            out[offs[:-1][sel] + k] = s[sel] + k
    return out.astype(np.uint64)


def _prep(x, y, n_out):
    y = view_y(np.asarray(y))
    if n_out % 4 != 0:
        raise ValueError("n_out must be a multiple of 4")
    had_x = x is not None
    if had_x:
        x = view_x(np.asarray(x))
        if len(x) != len(y):
            raise ValueError("x and y must have the same length")
    return x, y, had_x


def m4(x, y, n_out: int) -> np.ndarray:
    """NaN-ignoring M4 (M4_py:195-222)."""
    x, y, had_x = _prep(x, y, n_out)
    if n_out >= len(y):
        return np.arange(len(y), dtype=np.uint64)
    return _m4_core(x, y, n_out // 4, nan_policy_return=False, passthrough=had_x)


def nanm4(x, y, n_out: int) -> np.ndarray:
    """NaN-returning M4 (NaNM4_py:230-257); int y degrades to nan-ignoring
    (downsampling_interface.py:403-432)."""
    x, y, had_x = _prep(x, y, n_out)
    if n_out >= len(y):
        return np.arange(len(y), dtype=np.uint64)
    nan_ret = bool(np.issubdtype(y.dtype, np.floating))
    return _m4_core(x, y, n_out // 4, nan_policy_return=nan_ret, passthrough=had_x)
