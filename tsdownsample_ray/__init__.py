"""tsdownsample_ray — a Ray-Data-native time-series rollup, downsample and
retention engine.

Re-creates the full public operator surface of predict-idlab/tsdownsample
(`/root/reference/tsdownsample/__init__.py:17-26`) as vectorized NumPy/Arrow
kernels applied across a distributed ``ray.data.Dataset`` (one series = one
group), and adds the table-level engine the reference lacks: Common-Crawl
style page ingestion, per-domain series derivation, windowed continuous
aggregates cascading across retention tiers, gap-fill, delta-of-delta +
Gorilla XOR chunk compression, checkpoint/resume — plus training-data
utilities (dedup, similarity search, text stats).
"""

from .api import (
    AbstractDownsampler,
    EveryNthDownsampler,
    LTDDownsampler,
    LTOBDownsampler,
    LTTBDownsampler,
    M4Downsampler,
    MinMaxDownsampler,
    MinMaxLTTBDownsampler,
    NaNM4Downsampler,
    NaNMinMaxDownsampler,
    NaNMinMaxLTTBDownsampler,
)
from .kernels import KERNELS, get_kernel, register_kernel


def __getattr__(name):
    # lazy re-exports of the Dataset-level operators (importing them eagerly
    # would pull ray.data into every kernel-only use of the package)
    if name in ("downsample_dataset", "downsample_partitioned"):
        from .stages import downsample as _d

        return getattr(_d, name)
    if name in ("rollup", "cascade", "rollup_multi", "finalize_mean"):
        from .stages import rollup as _r

        return getattr(_r, name)
    if name == "run_retention_pipeline":
        from .pipelines.retention import run_retention_pipeline

        return run_retention_pipeline
    raise AttributeError(name)


__version__ = "0.1.0"

__all__ = [
    "AbstractDownsampler",
    "EveryNthDownsampler",
    "LTDDownsampler",
    "LTOBDownsampler",
    "LTTBDownsampler",
    "M4Downsampler",
    "MinMaxDownsampler",
    "MinMaxLTTBDownsampler",
    "NaNM4Downsampler",
    "NaNMinMaxDownsampler",
    "NaNMinMaxLTTBDownsampler",
    "KERNELS",
    "get_kernel",
    "register_kernel",
]
