"""EveryNth downsampling kernel — strided index selection.

Re-derived from ``/root/reference/tsdownsample/downsamplers.py:142-158``
(``EveryNthDownsampler._downsample``): ``step = max(1, len(y)/n_out)`` (a
float), indices ``np.arange(0, len(y)-0.1, step)`` truncated to unsigned
ints.  ``x`` is ignored (with a warning in the reference's class API — our
class wrapper reproduces the warning; the raw kernel just ignores it).
"""

from __future__ import annotations

import numpy as np

__all__ = ["everynth"]


def everynth(x, y, n_out: int) -> np.ndarray:
    if n_out <= 0:
        raise ValueError("n_out must be > 0")
    n = len(y)
    step = max(1, n / n_out)
    return np.arange(start=0, stop=n - 0.1, step=step).astype(np.uint64)
