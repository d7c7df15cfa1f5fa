"""Single-series NumPy downsampling kernels (the conformance core).

Each kernel has signature ``kernel(x_or_None, y, n_out, **kw) -> ndarray[uint64]``
returning *indices into the original arrays* — the reference's load-bearing
"select indices, not values" contract (``/root/reference/README.md:84-99``).
"""

from .binning import get_bin_idxs, view_x, view_y
from .everynth import everynth
from .lttb import lttb
from .ltd import ltd
from .ltob import ltob
from .m4 import m4, nanm4
from .minmax import minmax, nanminmax
from .minmaxlttb import minmaxlttb, nanminmaxlttb

#: name -> kernel; the engine-level ``downsample_dataset`` and the class API
#: both dispatch through this registry, and users can register custom kernels
#: (the analog of subclassing AbstractDownsampler,
#: ``downsampling_interface.py:15-135``).
KERNELS = {
    "everynth": everynth,
    "minmax": minmax,
    "nanminmax": nanminmax,
    "m4": m4,
    "nanm4": nanm4,
    "lttb": lttb,
    "ltob": ltob,
    "ltd": ltd,
    "minmaxlttb": minmaxlttb,
    "nanminmaxlttb": nanminmaxlttb,
}


def register_kernel(name: str, fn) -> None:
    """Register a custom ``(x, y, n_out, **kw) -> idx`` kernel."""
    KERNELS[name] = fn


def get_kernel(name: str):
    try:
        return KERNELS[name]
    except KeyError:
        raise KeyError(f"unknown downsample kernel {name!r}; have {sorted(KERNELS)}")


__all__ = [
    "KERNELS", "register_kernel", "get_kernel",
    "get_bin_idxs", "view_x", "view_y",
    "everynth", "lttb", "m4", "nanm4", "minmax", "nanminmax",
    "minmaxlttb", "nanminmaxlttb",
]
