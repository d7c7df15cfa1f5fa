"""Incremental backfill: merge late/new data into an existing rollup tier.

Because tier rows are associative (min,max,sum,count) partials, merging
late-arriving raw rows is: partial-aggregate the new data at the tier's
window, union with the existing tier rows, and re-combine. Only buckets
touched by new data change; the merge is EXACT — incremental == recompute
from scratch (oracle-checked by the ``backfill_15m`` query).

At parquet level a real deployment rewrites only the partitions whose keys
appear in the new partials (the manifest's per-file row counts make the
touched-partition set cheap to compute); here the merged tier is returned
as a Dataset for the caller's sink.
"""

from __future__ import annotations

from .rollup import _combine, partial_rollup_batch

__all__ = ["merge_into_tier"]


def merge_into_tier(tier_ds, new_series_ds, window_us: int, *,
                    series_col: str = "series_id", x_col: str = "x",
                    y_col: str = "y", combine: str = "tree"):
    new_partials = new_series_ds.map_batches(
        lambda b: partial_rollup_batch(
            b, window_us, series_col=series_col, x_col=x_col, y_col=y_col),
        batch_format="pyarrow",
    )
    merged = tier_ds.union(new_partials)
    return _combine(merged, ["series_id", "bucket"], mode=combine)
