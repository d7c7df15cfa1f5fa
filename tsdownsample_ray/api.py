"""Public downsampler class API — drop-in surface parity with the reference.

Mirrors the eight classes exported by
``/root/reference/tsdownsample/__init__.py:17-26`` with the same call
convention (``downsample([x], y, *, n_out, parallel=False, **kw) ->
ndarray[uint64]``, ``downsampling_interface.py:104-135``) and the same
validation behavior:

- positional args parsed as ``(y,)`` or ``(x, y)``
  (``downsampling_interface.py:56-84``);
- 1-D, C-contiguous arrays required (``:28-38``);
- dtype gates for x and y (``:40-53``, ``:143-157``);
- ``n_out`` must be a positive integer, with per-class parity constraints
  (``downsamplers.py:27-31`` even, ``:64-68`` multiple of 4).

``parallel=True`` is accepted for compatibility; a single series is always
processed by one vectorized NumPy kernel — parallelism in this engine lives
*across* series in the Ray Data pipeline (see
``tsdownsample_ray.stages.downsample``). The classes are stateless and
trivially picklable, like the reference's
(``downsampling_interface.py:378-389``).
"""

from __future__ import annotations

import warnings

import numpy as np

from .kernels import KERNELS
from .kernels.binning import check_x_dtype, check_y_dtype

__all__ = [
    "AbstractDownsampler",
    "EveryNthDownsampler",
    "LTTBDownsampler",
    "M4Downsampler",
    "MinMaxDownsampler",
    "MinMaxLTTBDownsampler",
    "NaNM4Downsampler",
    "NaNMinMaxDownsampler",
    "NaNMinMaxLTTBDownsampler",
]


def _parse_args(args):
    """(y,) or (x, y) -> (x_or_None, y)  — downsampling_interface.py:56-84.

    Non-ndarray inputs (lists, tuples) are coerced with ``np.array`` like
    the reference (``:69-72``); the dtype gates downstream then reject
    anything the kernels cannot take."""
    if len(args) == 1:
        x, y = None, args[0]
    elif len(args) == 2:
        x, y = args
    else:
        raise ValueError(
            f"downsample takes 1 or 2 positional arguments, got {len(args)}"
        )
    if not isinstance(y, np.ndarray):
        y = np.array(y)
    if y.ndim != 1:
        raise ValueError("y must be 1D")
    if x is not None:
        if not isinstance(x, np.ndarray):
            x = np.array(x)
        if x.ndim != 1:
            raise ValueError("x must be 1D")
        if len(x) != len(y):
            raise ValueError("x and y must have the same length")
    return x, y


def _check_contiguous(arr, name):
    if arr is not None and not arr.flags["C_CONTIGUOUS"]:
        raise ValueError(f"{name} array must be contiguous")


class AbstractDownsampler:
    """Wraps a registry kernel with reference-equivalent validation."""

    _kernel_name: str = ""
    check_contiguous: bool = True
    # kwargs the class understands. The reference's MinMax/M4/LTTB classes
    # forward **kwargs into the Rust function, which raises TypeError on
    # unknown keywords; MinMaxLTTB and EveryNth swallow extras via `**_`
    # (downsamplers.py:111/131/149). Matching that exactly: this base
    # REJECTS unknown kwargs, the swallowing classes override.
    _accepted_kwargs: frozenset = frozenset()

    def _check_valid_n_out(self, n_out: int) -> None:
        if not isinstance(n_out, (int, np.integer)):
            raise TypeError("n_out must be an integer")
        if n_out <= 0:
            raise ValueError("n_out must be > 0")

    def _kernel_kwargs(self, **kwargs) -> dict:
        return {}

    def downsample(self, *args, n_out: int, parallel: bool = False, **kwargs):
        unknown = sorted(set(kwargs) - set(self._accepted_kwargs))
        if unknown:
            raise TypeError(
                f"downsample() got unexpected keyword arguments {unknown} "
                f"(the reference's kernel call raises on unknown keywords)")
        self._check_valid_n_out(n_out)
        x, y = _parse_args(args)
        check_y_dtype(y)
        if self.check_contiguous:
            _check_contiguous(y, "y")
        if x is not None:
            check_x_dtype(x)
            if self.check_contiguous:
                _check_contiguous(x, "x")
        kern = KERNELS[self._kernel_name]
        return kern(x, y, int(n_out), **self._kernel_kwargs(**kwargs))


class MinMaxDownsampler(AbstractDownsampler):
    """Binned min/max selection; NaNs ignored (downsamplers.py:16-31)."""

    _kernel_name = "minmax"

    def _check_valid_n_out(self, n_out):
        super()._check_valid_n_out(n_out)
        if n_out % 2 != 0:
            raise ValueError("n_out must be even")


class NaNMinMaxDownsampler(MinMaxDownsampler):
    """Binned min/max; NaN indices returned (downsamplers.py:34-49)."""

    _kernel_name = "nanminmax"


class M4Downsampler(AbstractDownsampler):
    """First/min/max/last per bin; NaNs ignored (downsamplers.py:52-68)."""

    _kernel_name = "m4"

    def _check_valid_n_out(self, n_out):
        super()._check_valid_n_out(n_out)
        if n_out % 4 != 0:
            raise ValueError("n_out must be a multiple of 4")


class NaNM4Downsampler(M4Downsampler):
    """M4 with NaN-returning argminmax (downsamplers.py:71-87)."""

    _kernel_name = "nanm4"


class LTTBDownsampler(AbstractDownsampler):
    """Largest-Triangle-Three-Buckets (downsamplers.py:90-95).

    Sequential per series, like the reference (``src/lib.rs:349-370`` has no
    parallel LTTB; ``downsampling_interface.py:347-356`` warns and falls
    back).

    ``bucket_x="mean"`` (default) follows the reference's Python oracle
    (next-bucket x mean, LTTB_py); ``bucket_x="midpoint"`` follows the
    shipped Rust binary's ``(x[end-1]+x[start])/2`` (``lttb.rs:46-50``) —
    identical on equidistant x, divergent selections possible on
    irregular/gapped x.
    """

    _kernel_name = "lttb"
    _accepted_kwargs = frozenset({"bucket_x"})

    def _kernel_kwargs(self, **kwargs) -> dict:
        return {"bucket_x": kwargs.get("bucket_x", "mean")}

    def downsample(self, *args, n_out: int, parallel: bool = False, **kwargs):
        if parallel:
            warnings.warn(
                "There is no parallel implementation for LTTB; a single series "
                "is always downsampled sequentially (parallelism is across "
                "series in the Dataset pipeline)"
            )
        return super().downsample(*args, n_out=n_out, parallel=False, **kwargs)


class LTOBDownsampler(AbstractDownsampler):
    """Largest-Triangle-One-Bucket (Steinarsson 2013 §4.1) — an
    EXTENSION beyond the reference's class set (it ships only the
    three-bucket variant): per integer-exact equal-width bucket, the
    point whose immediate-neighbor triangle has the largest area;
    endpoints pinned. Non-sequential (every area depends only on fixed
    neighbors), so unlike LTTB it vectorizes fully within a series."""

    _kernel_name = "ltob"


class LTDDownsampler(AbstractDownsampler):
    """Largest-Triangle-Dynamic (Steinarsson 2013 §4.2) — an EXTENSION
    beyond the reference's class set, completing the thesis' triangle
    family next to :class:`LTOBDownsampler`: an iterative SSE-driven
    split/merge phase re-sizes the buckets (more where the series is
    least linear), then the LTTB selection runs over the dynamic
    buckets. ``iterations`` (default ``n_out``) bounds the re-sizing
    phase; ``iterations=0`` degenerates to LTTB's fixed buckets."""

    _kernel_name = "ltd"
    _accepted_kwargs = frozenset({"iterations"})

    def _kernel_kwargs(self, **kwargs) -> dict:
        return {"iterations": kwargs.get("iterations", None)}


class MinMaxLTTBDownsampler(AbstractDownsampler):
    """MinMax preselection + LTTB (arXiv:2305.00332; downsamplers.py:98-116).

    Extra keyword arguments are swallowed like the reference's ``**_``
    (``downsamplers.py:111``). ``bucket_x`` is this engine's extension for
    the refinement phase: ``"mean"`` (default) follows the Python-oracle
    LTTB convention; ``"midpoint"`` follows the shipped Rust binary, whose
    inner LTTB always sees the preselected points' irregular x
    (``minmaxlttb.rs:162/:198`` + ``lttb.rs:46-50``), so the two variants
    can select differently even on equidistant input whenever the MinMax
    preselection phase is active."""

    _kernel_name = "minmaxlttb"
    _accepted_kwargs = frozenset({"minmax_ratio", "bucket_x"})

    def downsample(
        self, *args, n_out: int, minmax_ratio: int = 4,
        parallel: bool = False, bucket_x: str = "mean", **_
    ):
        # the reference's Python layer asserts > 0 (downsamplers.py:113);
        # its Rust layer then asserts > 1 (minmaxlttb.rs:134) — the kernel
        # replays the Rust-side rejection for 0 < ratio <= 1
        assert minmax_ratio > 0, "minmax_ratio must be greater than 0"
        # ratio flows through the call, never through instance state: the
        # downsampler stays stateless/thread-safe like the reference's
        return super().downsample(*args, n_out=n_out, parallel=parallel,
                                  minmax_ratio=int(minmax_ratio),
                                  bucket_x=bucket_x)

    def _kernel_kwargs(self, **kwargs):
        return {"minmax_ratio": kwargs.get("minmax_ratio", 4),
                "bucket_x": kwargs.get("bucket_x", "mean")}


class NaNMinMaxLTTBDownsampler(MinMaxLTTBDownsampler):
    """NaN-returning MinMaxLTTB (downsamplers.py:119-136)."""

    _kernel_name = "nanminmaxlttb"


class EveryNthDownsampler(AbstractDownsampler):
    """Strided selection; x ignored with a warning (downsamplers.py:142-158).

    Mirrors the reference exactly: no y dtype gate (the reference class is
    built with no dtype restriction — strided selection never inspects y
    values, so strings/objects are valid), no contiguity check, extra
    kwargs swallowed (``**_``, :149), and ``n_out`` only needs to be
    positive (``_check_valid_n_out`` tests ``<= 0`` alone, so a float
    n_out flows into the pure-Python step arithmetic like the
    reference's)."""

    _kernel_name = "everynth"
    check_contiguous = False

    def downsample(self, *args, n_out, parallel: bool = False, **_):
        if n_out <= 0:
            raise ValueError("n_out must be > 0")
        x, y = _parse_args(args)
        if x is not None:
            warnings.warn(
                f"x is passed to downsample method of {self.__class__.__name__}, "
                "but is not taken into account by the current implementation of "
                "the EveryNth algorithm."
            )
        return KERNELS[self._kernel_name](None, y, n_out)
