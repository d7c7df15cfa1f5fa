"""Time-weighted average per (series, bucket) over irregular samples.

The aggregation gauges actually need (InfluxDB ``integral``/Timescale
``time_weight`` semantics, step-hold/LOCF): each sample's value holds
until the next sample; a bucket's TWA is the value-time integral of that
step function clipped to the bucket, divided by the covered duration.
Plain ``avg`` over-weights dense bursts; TWA is sampling-rate-invariant.

Exactness: the integral is pure int64 (`cents x microseconds`); the
float ``twa`` is one division of two exact ints, so output is
bit-identical under any partitioning (ties at equal timestamps resolve
by the id column — the zero-duration span contributes nothing and the
LAST row at a timestamp holds forward, same as the SQL lead() replay).

Scale shape (100 TB): ONE hash(series) shuffle (all rows of a series in
one partition — cross-block sample pairs meet), one vectorized pass per
partition builds consecutive-sample spans and explodes each span into
its overlapped buckets (repeat/cumsum tiling; amplification =
span/bucket ratio, ~1 for sane data), partials collapse per partition,
and the final combine is the engine's standard tiny merge.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..arrow_utils import rename_agg, make_add_part
from ..arrow_utils import group_codes

__all__ = ["time_weighted_avg"]


def _merge_partials(b: pa.Table) -> pa.Table:
    g = b.group_by(["series_id", "bucket"]).aggregate(
        [("num", "sum"), ("den", "sum")])
    return rename_agg(g, {"series_id": "series_id", "bucket": "bucket",
                          "num_sum": "num", "den_sum": "den"})


def time_weighted_avg(ds, window_us: int, *, series_col: str = "series_id",
                      x_col: str = "x", y_col: str = "y",
                      id_col: str | None = None,
                      num_partitions: int = 8):
    """Returns ``(series_id, bucket, num, den, twa)``: ``num = Σ v·dur``
    and ``den = Σ dur`` over the bucket-clipped step function, ``twa``
    their float64 ratio. Buckets a series never covers are absent."""
    from ..arrow_utils import stable_part_codes

    W = int(window_us)
    mod = num_partitions * 64

    _add_part = make_add_part(series_col, mod)

    def _partials(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        s_type = t[series_col].type
        empty = pa.table({"series_id": pa.array([], s_type),
                          "bucket": pa.array([], pa.int64()),
                          "num": pa.array([], pa.int64()),
                          "den": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        keys = [(series_col, "ascending"), (x_col, "ascending")]
        if id_col:
            keys.append((id_col, "ascending"))
        t = t.take(pc.sort_indices(t, sort_keys=keys))
        sid = t[series_col]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = group_codes(sid)
        x = t[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        # consecutive-row spans within a series, positive duration only
        same = codes[:-1] == codes[1:] if len(codes) > 1 else np.empty(0, bool)
        live = same & (x[1:] > x[:-1])
        i = np.flatnonzero(live)
        if len(i) == 0:
            return empty
        t0, t1, v, sc = x[i], x[i + 1], y[i], codes[i]
        b0 = t0 // W
        b1 = (t1 - 1) // W
        cnt = b1 - b0 + 1
        total = int(cnt.sum())
        rep = np.repeat(np.arange(len(i)), cnt)
        starts_cum = np.concatenate(([0], np.cumsum(cnt)[:-1]))
        k = (np.arange(total) - np.repeat(starts_cum, cnt)
             + np.repeat(b0, cnt))
        lo = np.maximum(t0[rep], k * W)
        hi = np.minimum(t1[rep], (k + 1) * W)
        dur = hi - lo
        part = pa.table({
            "series_id": sid.take(pa.array(i[rep])),
            "bucket": pa.array(k * W),
            "num": pa.array(v[rep] * dur),
            "den": pa.array(dur),
        })
        return _merge_partials(part)

    parted = ds.map_batches(_add_part, batch_format="pyarrow")
    partials = parted.repartition(num_partitions).groupby(
        "__part").map_groups(_partials, batch_format="pyarrow")
    merged = partials.repartition(1).map_batches(
        _merge_partials, batch_format="pyarrow")

    def _fin(b: pa.Table) -> pa.Table:
        num = b["num"].to_numpy(zero_copy_only=False).astype(np.float64)
        den = b["den"].to_numpy(zero_copy_only=False).astype(np.float64)
        return b.append_column("twa", pa.array(num / den, pa.float64()))

    return merged.map_batches(_fin, batch_format="pyarrow")
