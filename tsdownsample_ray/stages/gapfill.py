"""Gap-fill stage: materialize missing windows of each series' rollup.

Per series (one group): generate every bucket in ``[min_bucket,
max_bucket]`` at the tier's window; buckets absent from the rollup become
explicit rows with ``n = 0``, ``is_gap = true`` and value columns either
null/zero ('zero') or carried forward from the previous present bucket
('ffill' — what a charting client wants before running LTTB over a sparse
series).

New design (no reference counterpart — SURVEY.md §2.4): the reference
*represents* gaps by returning fewer indices (README.md:99); a retention
engine must materialize them so cascaded tiers and downstream consumers see
a dense time axis. Shuffle: the same ``series_id`` groupby key as every
other per-series stage.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["gapfill"]


def gapfill(ds, window_us: int, *, value_cols: tuple = ("min_y", "max_y", "sum_y"),
            count_col: str = "n", fill: str = "zero"):
    if fill not in ("zero", "ffill"):
        raise ValueError("fill must be 'zero' or 'ffill'")

    def _fill_group(g: pa.Table) -> pa.Table:
        g = g.take(pc.sort_indices(g, sort_keys=[("bucket", "ascending")]))
        buckets = g["bucket"].to_numpy(zero_copy_only=False)
        full = np.arange(buckets[0], buckets[-1] + 1, window_us)
        pos = np.searchsorted(buckets, full)
        pos_clipped = np.minimum(pos, len(buckets) - 1)
        present = buckets[pos_clipped] == full
        src = pos_clipped  # index of the present row, valid where present

        n_vals = g[count_col].to_numpy(zero_copy_only=False)
        out = {
            "series_id": pa.array(
                np.repeat(g["series_id"][0].as_py(), len(full))),
            "bucket": pa.array(full, pa.int64()),
            count_col: pa.array(np.where(present, n_vals[src], 0), pa.int64()),
            "is_gap": pa.array(~present),
        }
        for c in value_cols:
            v = g[c].to_numpy(zero_copy_only=False)
            if fill == "ffill":
                # carry forward the previous present bucket's value
                last_present = np.maximum.accumulate(
                    np.where(present, np.arange(len(full)), -1))
                carried = v[src[np.maximum(last_present, 0)]]
                filled = np.where(
                    present, v[src],
                    np.where(last_present >= 0, carried, v[0]))
                out[c] = pa.array(filled)
            else:
                filled = np.where(present, v[src], 0)
                out[c] = pa.array(filled.astype(v.dtype))
        return pa.table(out)

    return ds.groupby("series_id").map_groups(_fill_group, batch_format="pyarrow")
