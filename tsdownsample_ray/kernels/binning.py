"""Bin-index computation and dtype canonicalization for downsample kernels.

Semantics re-derived from the reference's *Python oracle* formulation
(`/root/reference/tsdownsample/_python/downsamplers.py:8-28`, ``_get_bin_idxs``),
which the reference's own compliance suite certifies as equivalent to its
Rust kernels (`tests/test_algos_python_compliance.py:33-46`):

- ``nb_bins`` bins equidistant in x-VALUE space between ``x[0]`` and ``x[-1]``,
  realized as ``np.searchsorted(x, np.linspace(x[0], x[-1], nb+1), side="right")``
  with the first boundary forced to 0 and the last to ``len(x)``.
- Without x the reference uses equal *index* blocks
  (``downsample_rs/src/minmax.rs:110-119``: ``block_size=(len-1)/nb``,
  ``end_idx = floor(block_size*(i+1)) + 1``); on ``x = arange(n)`` the
  searchsorted-over-linspace formulation produces the *same* boundaries
  (``floor(i*(n-1)/nb)+1``), which is why the oracle uses one formulation for
  both paths.  We do the same.

Dtype canonicalization mirrors ``downsampling_interface.py:205-227``
(`_view_x` / `_view_y`): datetime64/timedelta64 are *viewed* (not cast) as
int64; bool is viewed as int8.  These are bit-preserving views.
"""

from __future__ import annotations

import numpy as np

__all__ = ["get_bin_idxs", "view_x", "view_y", "SUPPORTED_X_DTYPES", "SUPPORTED_Y_DTYPES"]

# Accepted dtype kinds, mirroring the regex gates in
# downsampling_interface.py:143-157 (x: no 8-bit ints, no bool/f16;
# y: additionally f16, i8, u8, bool).
SUPPORTED_X_DTYPES = (
    "float32", "float64",
    "int16", "int32", "int64",
    "uint16", "uint32", "uint64",
)  # plus any datetime64[*] / timedelta64[*]

SUPPORTED_Y_DTYPES = SUPPORTED_X_DTYPES + ("float16", "int8", "uint8", "bool")


def _is_datetimelike(dt: np.dtype) -> bool:
    return dt.kind in ("M", "m")


def check_x_dtype(x: np.ndarray) -> None:
    dt = x.dtype
    if _is_datetimelike(dt):
        return
    if dt.name not in SUPPORTED_X_DTYPES:
        raise ValueError(f"Unsupported x dtype: {dt}")


def check_y_dtype(y: np.ndarray) -> None:
    dt = y.dtype
    if _is_datetimelike(dt):
        return
    if dt.name not in SUPPORTED_Y_DTYPES:
        raise ValueError(f"Unsupported y dtype: {dt}")


def view_x(x: np.ndarray) -> np.ndarray:
    """datetime64/timedelta64 -> int64 bit view (downsampling_interface.py:205-213)."""
    if _is_datetimelike(x.dtype):
        return x.view(np.int64)
    return x


def view_y(y: np.ndarray) -> np.ndarray:
    """bool -> int8 view; datetime-like -> int64 view (downsampling_interface.py:218-227)."""
    if y.dtype == np.bool_:
        return y.view(np.int8)
    if _is_datetimelike(y.dtype):
        return y.view(np.int64)
    return y


def get_bin_idxs(x: np.ndarray, nb_bins: int) -> np.ndarray:
    """Equidistant (in x-value space) bin boundary indices; len == nb_bins+1.

    ``bins[i] .. bins[i+1]`` is the half-open index range of bin i; empty
    ranges represent gaps in x (the caller skips them, matching
    ``searchsorted.rs:118-122``).
    """
    boundaries = np.linspace(x[0], x[-1], nb_bins + 1)
    if x.dtype != boundaries.dtype:
        # np.searchsorted on mixed dtypes promotes BOTH sides to the common
        # type (f64) — same comparisons, but the implicit whole-array
        # promotion hits a slow path.  Casting once keeps results bit-exact
        # (the oracle's comparisons happen in f64 either way) and is ~50x
        # faster on large int64/f32 x.
        x = x.astype(boundaries.dtype)
    bins = np.searchsorted(x, boundaries, side="right")
    bins[0] = 0
    bins[-1] = len(x)
    return np.asarray(bins)


def get_bin_idxs_nox(n: int, nb_bins: int) -> np.ndarray:
    """``get_bin_idxs(np.arange(n), nb)`` in closed form (no O(n) work).

    ``searchsorted(arange(n), v, side='right') == floor(v) + 1`` for
    ``v >= 0``, so the boundaries are ``floor(linspace(0, n-1, nb+1)) + 1``
    with the first forced to 0 and the last to n — bit-exact with the
    searchsorted formulation (same f64 linspace values).
    """
    bins = np.floor(np.linspace(0, n - 1, nb_bins + 1)).astype(np.int64) + 1
    bins[0] = 0
    bins[-1] = n
    return bins
