"""Retention policy: age out rows beyond a tier's horizon.

Each retention tier keeps data for a horizon (e.g. raw 15-min rollups for
7 days, hourly for 90 days, daily forever). Applying the policy is a
vectorized bucket filter — pushed into ``map_batches`` so at the parquet
level whole row groups drop via min/max statistics when the sink is
re-read with a bucket predicate.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["apply_retention", "DEFAULT_HORIZONS"]

US = 1_000_000
#: tier name -> horizon in us (None = keep forever)
DEFAULT_HORIZONS = {"15m": 7 * 86400 * US, "1h": 90 * 86400 * US, "1d": None}


def apply_retention(tier_ds, now_us: int, horizon_us: int | None,
                    *, bucket_col: str = "bucket"):
    """Drop buckets older than ``now_us - horizon_us`` (None = no-op)."""
    if horizon_us is None:
        return tier_ds
    cutoff = now_us - horizon_us

    def _trim(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater_equal(b[bucket_col], cutoff))

    return tier_ds.map_batches(_trim, batch_format="pyarrow")
