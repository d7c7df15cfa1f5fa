"""Vectorized per-bin argmin/argmax — the NumPy analog of the reference's
SIMD ``argminmax`` crate (``downsample_rs/src/minmax.rs:4``).

A naive per-bin ``np.nanargmin`` loop costs one Python call + a masked copy
per bin; this module computes argmin/argmax for ALL bins in a handful of
O(n) vectorized passes:

1. segment min/max via ``np.fmin.reduceat`` / ``np.fmax.reduceat``
   (NaN-ignoring, like the crate's default) over the non-empty bin starts
   (contiguous bins -> reduceat segments ARE the bins);
2. candidate positions where ``y == segment_extreme`` (repeat-expanded);
3. first candidate per bin (``np.unique(bin_of_candidate,
   return_index=True)``) — reproducing argmin/argmax FIRST-occurrence
   tie-breaking exactly.

NaN-returning policy (``NaNArgMinMax``): a bin containing a NaN returns the
index of its *first* NaN for both extremes — matching ``np.argmin/np.argmax``
NaN propagation used by the reference oracle
(``_python/downsamplers.py:176-177``).

All-NaN bins under the nan-ignoring policy fall back to the bin's first
index (the loop formulation's ``ValueError`` fallback).
"""

from __future__ import annotations

import numpy as np

__all__ = ["bin_argminmax"]


def _first_candidate_per_bin(cand: np.ndarray, starts: np.ndarray, n_bins: int,
                             default: np.ndarray) -> np.ndarray:
    """cand: sorted absolute candidate indices; map each to its bin via the
    (sorted) bin starts and keep the first per bin."""
    out = default.copy()
    if len(cand) == 0:
        return out
    bin_of = np.searchsorted(starts, cand, side="right") - 1
    uniq, first = np.unique(bin_of, return_index=True)
    out[uniq] = cand[first]
    return out


def bin_argminmax(y: np.ndarray, starts: np.ndarray, ends: np.ndarray,
                  *, nan_policy_return: bool):
    """Per-bin (argmin, argmax) absolute indices.

    ``starts``/``ends`` must be non-empty, contiguous (``starts[i+1] ==
    ends[i]``), cover a prefix..suffix range of ``y``.  Returns two int64
    arrays of length ``len(starts)``.
    """
    n_bins = len(starts)
    is_float = np.issubdtype(y.dtype, np.floating)

    if n_bins < 8:  # tiny series: the loop is cheaper than the setup
        amin = np.empty(n_bins, dtype=np.int64)
        amax = np.empty(n_bins, dtype=np.int64)
        f_min, f_max = (
            (np.argmin, np.argmax) if (nan_policy_return and is_float)
            else (np.nanargmin, np.nanargmax)
        )
        for i in range(n_bins):
            sl = y[starts[i] : ends[i]]
            try:
                amin[i] = starts[i] + f_min(sl)
                amax[i] = starts[i] + f_max(sl)
            except ValueError:
                amin[i] = amax[i] = starts[i]
        return amin, amax

    lo, hi = starts[0], ends[-1]
    yw = y[lo:hi]
    rel_starts = (starts - lo).astype(np.intp)
    counts = (ends - starts).astype(np.intp)

    if is_float:
        seg_min = np.fmin.reduceat(yw, rel_starts)
        seg_max = np.fmax.reduceat(yw, rel_starts)
    else:
        seg_min = np.minimum.reduceat(yw, rel_starts)
        seg_max = np.maximum.reduceat(yw, rel_starts)

    # candidates where the value attains its bin extreme
    rep_min = np.repeat(seg_min, counts)
    rep_max = np.repeat(seg_max, counts)
    cand_min = np.flatnonzero(yw == rep_min) + lo
    cand_max = np.flatnonzero(yw == rep_max) + lo

    default = starts.astype(np.int64)  # all-NaN-bin fallback: first index
    amin = _first_candidate_per_bin(cand_min, starts, n_bins, default)
    amax = _first_candidate_per_bin(cand_max, starts, n_bins, default)

    if nan_policy_return and is_float:
        nan_pos = np.flatnonzero(np.isnan(yw)) + lo
        if len(nan_pos):
            first_nan = _first_candidate_per_bin(
                nan_pos, starts, n_bins, np.full(n_bins, -1, dtype=np.int64)
            )
            has_nan = first_nan >= 0
            amin[has_nan] = first_nan[has_nan]
            amax[has_nan] = first_nan[has_nan]
    return amin, amax
