"""Event-time windowed operators beyond tumbling rollups: sliding (hopping)
windows and session windows.

Ray Data has no event-time window/watermark machinery (ray_guide: treat the
input as an ordered partitioned log), so:

- **sliding**: each row is replicated into its ``window/slide`` member
  windows inside ``map_batches`` (vectorized), then the standard partial ->
  tree-combine rollup machinery aggregates per (series, window_start). The
  replication factor is the shuffle amplification — callers keep
  window/slide small (2-12x), exactly like any hopping-window engine.
- **session**: per-series ``map_groups``: sort by (ts, id), break where the
  gap to the previous event exceeds ``gap_us``, cumulative-sum the breaks
  into session ids, aggregate per session. Ordering assumption: one series
  fits one group (same assumption as every per-series stage here).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..arrow_utils import rename_agg
from .rollup import _arrow_combine, _combine

__all__ = ["sliding_rollup", "sessionize"]


def sliding_rollup(ds, window_us: int, slide_us: int, *,
                   series_col: str = "series_id", x_col: str = "x",
                   y_col: str = "y"):
    """Hopping-window aggregate: one output row per (series, window_start)
    for every window [ws, ws+window) containing the event.

    Scale shape: rows are FIRST collapsed to per-(series, slide-bucket)
    partials inside the block, and only those partials are replicated into
    their ``window/slide`` member windows — the k-fold hopping-window
    amplification applies to <= |keys| partial rows per block, never to
    the raw events (associative (min,max,sum,count) merges make this
    exact)."""
    if window_us % slide_us != 0:
        raise ValueError("window must be a multiple of slide")
    k = window_us // slide_us

    def _replicate(b: pa.Table) -> pa.Table:
        # 1) per-slide-bucket partial aggregate (the raw-row collapse)
        x = b[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        base = x // slide_us * slide_us
        t = pa.table({"series_id": b[series_col], "bucket": pa.array(base),
                      "y": b[y_col]})
        g = t.group_by(["series_id", "bucket"]).aggregate(
            [("y", "min"), ("y", "max"), ("y", "sum"), ("y", "count")])
        g = rename_agg(g, {"series_id": "series_id", "bucket": "bucket",
                           "y_min": "min_y", "y_max": "max_y",
                           "y_sum": "sum_y", "y_count": "n"})
        # 2) replicate the PARTIALS into their k member windows
        n = g.num_rows
        idx = pa.array(np.repeat(np.arange(n), k))
        rep = g.take(idx)
        ws = (rep["bucket"].to_numpy(zero_copy_only=False)
              - np.tile(np.arange(k, dtype=np.int64) * slide_us, n))
        rep = rep.set_column(rep.column_names.index("bucket"), "bucket",
                             pa.array(ws))
        # 3) in-block merge of replicated partials
        return _arrow_combine(rep)

    partials = ds.map_batches(_replicate, batch_format="pyarrow")
    return _combine(partials, ["series_id", "bucket"])


def sessionize(ds, gap_us: int, *, series_col: str = "series_id",
               x_col: str = "x", id_col: str | None = None):
    """Session windows: consecutive events of one series belong to the same
    session while the inter-event gap is <= gap_us. Output one row per
    session: (series_id, session_start, session_end, n_events)."""

    def _sessions(g: pa.Table) -> pa.Table:
        keys = [(x_col, "ascending")] + (
            [(id_col, "ascending")] if id_col else [])
        g = g.take(pc.sort_indices(g, sort_keys=keys))
        x = g[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        brk = np.empty(len(x), dtype=np.int64)
        brk[0] = 1
        brk[1:] = (np.diff(x) > gap_us).astype(np.int64)
        sess = np.cumsum(brk)
        t = pa.table({
            "sess": pa.array(sess),
            "x": pa.array(x),
        })
        agg = t.group_by(["sess"]).aggregate(
            [("x", "min"), ("x", "max"), ("x", "count")])
        agg = rename_agg(agg, {"sess": "sess", "x_min": "session_start",
                               "x_max": "session_end", "x_count": "n_events"})
        sid = g[series_col][0].as_py()
        return pa.table({
            "series_id": pa.array([sid] * agg.num_rows),
            "session_start": agg["session_start"],
            "session_end": agg["session_end"],
            "n_events": pc.cast(agg["n_events"], pa.int64()),
        })

    return ds.groupby(series_col).map_groups(_sessions, batch_format="pyarrow")
