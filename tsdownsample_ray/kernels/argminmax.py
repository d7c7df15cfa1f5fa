"""Vectorized per-bin argmin/argmax — the NumPy analog of the reference's
SIMD ``argminmax`` crate (``downsample_rs/src/minmax.rs:4``).

Two regimes, picked by average bin width:

**Wide bins** (``>= LOOP_MIN_BIN`` points/bin — the 50M-point viz probe has
~50k): a per-bin ``ndarray.argmin()/.argmax()`` loop. Each bin is scanned
exactly once per extreme (2 passes total over the data) and ties break to
the first occurrence natively. NaNs are detected for free: NumPy's
``argmin``/``argmax`` land on the FIRST NaN whenever one exists, so a
single O(1) ``isnan(y[winner])`` probe routes the rare NaN-carrying bin to
the policy path. The Python dispatch (~4 calls/bin) is noise when bins are
thousands of points wide.

**Narrow bins**: the dispatch would dominate, so all bins are computed in a
handful of O(n) vectorized passes:

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

# below this average bin width the vectorized candidate path wins (the
# per-bin loop costs ~4 NumPy dispatches/bin; the vectorized path ~8 full
# passes over the window) — crossover measured at a few thousand points
LOOP_MIN_BIN = 4096


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


def _loop_argminmax(y: np.ndarray, starts: np.ndarray, ends: np.ndarray,
                    *, nan_policy_return: bool, is_float: bool):
    """Per-bin argmin/argmax scan — 2 passes over the data, first-occurrence
    ties and first-NaN propagation for free."""
    n_bins = len(starts)
    amin = np.empty(n_bins, dtype=np.int64)
    amax = np.empty(n_bins, dtype=np.int64)
    propagate = nan_policy_return and is_float
    for i in range(n_bins):
        s = starts[i]
        sl = y[s:ends[i]]
        im = int(sl.argmin())
        iM = int(sl.argmax())
        if is_float and not propagate and np.isnan(sl[im]):
            # argmin lands on the first NaN iff the bin contains one ->
            # O(1) detection; only then pay the nan-ignoring masked scan
            try:
                im = int(np.nanargmin(sl))
                iM = int(np.nanargmax(sl))
            except ValueError:  # all-NaN bin
                im = iM = 0
        amin[i] = s + im
        amax[i] = s + iM
    return amin, amax


def bin_argminmax(y: np.ndarray, starts: np.ndarray, ends: np.ndarray,
                  *, nan_policy_return: bool):
    """Per-bin (argmin, argmax) absolute indices.

    ``starts``/``ends`` must be non-empty, contiguous (``starts[i+1] ==
    ends[i]``), cover a prefix..suffix range of ``y``.  Returns two int64
    arrays of length ``len(starts)``.
    """
    n_bins = len(starts)
    is_float = np.issubdtype(y.dtype, np.floating)

    lo, hi = starts[0], ends[-1]
    if n_bins < 8 or (hi - lo) >= LOOP_MIN_BIN * n_bins:
        return _loop_argminmax(y, starts, ends,
                               nan_policy_return=nan_policy_return,
                               is_float=is_float)

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
