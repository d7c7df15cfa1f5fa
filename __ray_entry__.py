"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (nor in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline at sf0.001: synthetic CC-style pages -> extract ->
    per-domain series -> 15-min rollup -> MinMaxLTTB downsample per series."""
    from tsdownsample_ray.pipelines.flagship import flagship_dataset
    from tsdownsample_ray.tuning import tune_data_context

    tune_data_context()
    return flagship_dataset("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from tsdownsample_ray.pipelines.queries import QUERIES
    from tsdownsample_ray.tuning import tune_data_context

    tune_data_context()
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from tsdownsample_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
