"""MinMax / NaNMinMax downsampling kernels (single series, NumPy).

Semantics: split the series into ``n_out/2`` bins (equidistant in x-value
space; equal index blocks when x is None); per non-empty bin emit the indices
of the y-minimum and y-maximum, smaller index first.

Re-derived from the reference:

- Python oracle ``MinMax_py`` / ``NaNMinMax_py``
  (``/root/reference/tsdownsample/_python/downsamplers.py:119-178``):
  nan-ignoring (``np.nanargmin``/``nanargmax``) vs NaN-returning
  (``np.argmin``/``argmax``); ``MinMax_py`` passes the result through
  ``np.unique``, ``NaNMinMax_py`` keeps duplicates.
- Rust public kernels: identity short-circuit ``n_out >= len`` -> all indices
  (``downsample_rs/src/minmax.rs:105-107``); the with-x path emits ALL points
  of a bin holding <= 2 elements (tiny-bin passthrough,
  ``minmax.rs:199-203``) — behavior pinned by the gap hand-tests
  (``minmax.rs:376-416``). The no-x path has no passthrough
  (``minmax.rs:99-136``); for no-x inputs singleton bins are impossible
  (block_size >= 2 whenever the identity guard doesn't fire), so the two
  formulations agree everywhere the reference's compliance suite checks
  (``tests/test_algos_python_compliance.py:33-46``).

On ties, ``argmin``/``argmax`` return the FIRST occurrence — same as the
``argminmax`` crate used by the reference.

Known Python-oracle/Rust-binary split (the same class as LTTB's
mean-vs-midpoint bucket x): the shipped Rust ``MinMaxDownsampler`` always
emits two indices per bin — duplicating the index when argmin == argmax —
so on constant/quantized data it returns ``n_out`` indices where this
kernel (following ``MinMax_py:149``'s ``np.unique``) returns fewer. The
reference's own compliance suite never covers tied data, so the two
reference implementations disagree there too; this engine follows its
declared golden oracle (the Python one). ``minmax_pairs`` below exposes
the duplicate-retaining Rust vector for callers that need it.
"""

from __future__ import annotations

import numpy as np

from .argminmax import bin_argminmax
from .binning import get_bin_idxs, get_bin_idxs_nox, view_x, view_y

__all__ = ["minmax", "nanminmax", "minmax_pairs"]


def _minmax_core_loop(x, y, nb_bins: int, *, nan_policy_return: bool, passthrough: bool) -> list:
    """Reference formulation (per-bin loop) — kept as the oracle the
    vectorized core is equivalence-tested against."""
    bins = get_bin_idxs(x, nb_bins) if x is not None else get_bin_idxs_nox(len(y), nb_bins)
    if nan_policy_return:
        f_min, f_max = np.argmin, np.argmax
    else:
        f_min, f_max = np.nanargmin, np.nanargmax
    idxs = []
    for lower, upper in zip(bins[:-1], bins[1:]):
        n_bin = upper - lower
        if n_bin <= 0:
            continue  # empty bin == gap in x (searchsorted.rs:118-122)
        if passthrough and n_bin <= 2:
            idxs.extend(range(lower, upper))  # minmax.rs:199-203
            continue
        y_slice = y[lower:upper]
        try:
            mn = int(f_min(y_slice))
            mx = int(f_max(y_slice))
        except ValueError:  # all-NaN bin under nan-ignoring policy
            mn = mx = 0
        lo, hi = (mn, mx) if mn < mx else (mx, mn)
        idxs.append(lower + lo)
        idxs.append(lower + hi)
    return idxs


def _minmax_core(x, y, nb_bins: int, *, nan_policy_return: bool, passthrough: bool) -> np.ndarray:
    """Vectorized core: absolute indices in bin order, sorted within bin."""
    bins = get_bin_idxs(x, nb_bins) if x is not None else get_bin_idxs_nox(len(y), nb_bins)
    starts, ends = bins[:-1], bins[1:]
    nonempty = ends > starts
    s = starts[nonempty].astype(np.int64)
    e = ends[nonempty].astype(np.int64)
    if len(s) == 0:
        return np.empty(0, dtype=np.int64)

    nan_ret = nan_policy_return and np.issubdtype(y.dtype, np.floating)
    amin, amax = bin_argminmax(y, s, e, nan_policy_return=nan_ret)
    lo = np.minimum(amin, amax)
    hi = np.maximum(amin, amax)

    cnt = e - s
    small = (cnt <= 2) if passthrough else np.zeros(len(s), dtype=bool)
    out_counts = np.where(small, cnt, 2)
    offs = np.concatenate(([0], np.cumsum(out_counts)))
    out = np.empty(offs[-1], dtype=np.int64)

    big = ~small
    out[offs[:-1][big]] = lo[big]
    out[offs[:-1][big] + 1] = hi[big]
    if small.any():  # tiny-bin passthrough (minmax.rs:199-203): emit all points
        for k in range(2):
            sel = small & (cnt > k)
            out[offs[:-1][sel] + k] = s[sel] + k
    return out


def _prep(x, y, n_out):
    y = view_y(np.asarray(y))
    if n_out % 2 != 0:
        raise ValueError("n_out must be even")
    had_x = x is not None
    if had_x:
        x = view_x(np.asarray(x))
        if len(x) != len(y):
            raise ValueError("x and y must have the same length")
    return x, y, had_x


def minmax(x, y, n_out: int) -> np.ndarray:
    """NaN-ignoring MinMax; unique-sorted indices (MinMax_py:128-149)."""
    x, y, had_x = _prep(x, y, n_out)
    if n_out >= len(y):
        return np.arange(len(y), dtype=np.uint64)
    core = _minmax_core(x, y, n_out // 2, nan_policy_return=False, passthrough=had_x)
    return np.unique(core).astype(np.uint64)


def nanminmax(x, y, n_out: int) -> np.ndarray:
    """NaN-returning MinMax; sorted indices, duplicates kept (NaNMinMax_py:157-178).

    For non-float y the NaN policy degrades to the nan-ignoring kernel,
    matching ``downsampling_interface.py:403-432``.
    """
    x, y, had_x = _prep(x, y, n_out)
    if n_out >= len(y):
        return np.arange(len(y), dtype=np.uint64)
    core = _minmax_core(x, y, n_out // 2, nan_policy_return=True, passthrough=had_x)
    # core is emitted in bin order with bins on disjoint increasing index
    # ranges -> already globally sorted (NaNMinMax_py:178's `sorted`)
    return core.astype(np.uint64)


def minmax_pairs(x, y, n_out: int, *, nan_policy_return: bool) -> np.ndarray:
    """Raw bin-order output (exactly the Rust ``min_max_with_x`` /
    ``min_max_without_x`` vectors) — MinMaxLTTB's phase-1 preselector
    (``minmaxlttb.rs:138-142``). ``x=None`` selects the no-passthrough no-x
    formulation."""
    had_x = x is not None
    if n_out >= len(y):
        return np.arange(len(y), dtype=np.intp)
    core = _minmax_core(x, y, n_out // 2, nan_policy_return=nan_policy_return,
                        passthrough=had_x)
    return core.astype(np.intp)
