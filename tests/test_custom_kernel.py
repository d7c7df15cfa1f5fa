"""User-extension surface: register a custom (x, y, n_out) -> idx kernel
(the analog of subclassing AbstractDownsampler,
downsampling_interface.py:15-135) and run it distributed."""

import numpy as np
import pandas as pd

from tsdownsample_ray.kernels import KERNELS, get_kernel, register_kernel


def _first_k(x, y, n_out, **_):
    return np.arange(min(n_out, len(y)), dtype=np.uint64)


def test_register_and_dispatch():
    register_kernel("first_k", _first_k)
    try:
        assert get_kernel("first_k") is _first_k
    finally:
        KERNELS.pop("first_k", None)


def test_custom_kernel_distributed(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.downsample import downsample_dataset

    def _first_k_local(x, y, n_out, **_):
        # nested def -> cloudpickled by value, like a user notebook kernel
        return np.arange(min(n_out, len(y)), dtype=np.uint64)

    register_kernel("first_k", _first_k_local)
    try:
        df = pd.DataFrame({
            "series_id": np.repeat(["a", "b"], 100),
            "x": np.tile(np.arange(100), 2),
            "y": np.arange(200, dtype=np.float64),
        })
        out = downsample_dataset(rd.from_pandas(df), kernel="first_k",
                                 n_out=5).to_pandas()
        assert len(out) == 10
        assert sorted(out[out.series_id == "a"]["x"]) == [0, 1, 2, 3, 4]
    finally:
        KERNELS.pop("first_k", None)
