"""Histogram rollup + quantile estimation — the mergeable-sketch path for
percentiles over windowed series (p50/p95/p99 latency-style queries).

No counterpart in the reference; standard TSDB/observability operator
(fixed-bin histogram == Prometheus classic histogram). Exact-oracle
design: the bins are DETERMINISTIC ``[lo, hi)`` equal-width buckets, so
bin counts, cumulative ranks and the bin-edge quantile ESTIMATE are all
integer/f64 arithmetic a SQL oracle can replay bit-for-bit — unlike
t-digest-style sketches whose merge order changes results.

Scale shape (same discipline as the rollup):
- per-block partials: one ``(series, bucket, bin) -> count`` row per
  occupied bin per block (``map_batches`` Arrow group_by);
- ONE int-keyed hash shuffle: partials partitioned by hash(series,
  bucket) — every key's bins land in one partition — then each partition
  merges counts and computes every key's quantiles in one vectorized
  pass (segment cumsum + searchsorted), no per-key Python round-trip.

Quantile definition (restated by the SQL oracle): for percentile ``p``
the rank is ``ceil(n * p / 100)`` (integer arithmetic: ``(n*p + 99) //
100``), the quantile bin is the smallest bin whose cumulative count
reaches that rank, and the estimate is the bin's UPPER edge ``lo +
(bin + 1) * width`` — a deterministic upper bound of the true quantile
within one bin width. Values outside ``[lo, hi)`` clamp to the edge bins.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .rollup import bucketize
from ..arrow_utils import group_codes

__all__ = ["histogram_rollup", "histogram_quantiles"]


def histogram_rollup(ds, window_us: int, *, bins: int = 64,
                     lo: float = 0.0, hi: float = 1.0,
                     series_col: str = "series_id", x_col: str = "x",
                     y_col: str = "y", num_partitions: int = 16):
    """series rows -> ``(series_id, bucket, bin, cnt)`` histogram rows
    (long form; one row per OCCUPIED bin — sparse-friendly), mergeable by
    count addition. All of one (series, bucket)'s bins are co-located in
    one output partition (hash(series, bucket) shuffle)."""
    width = (hi - lo) / bins

    def _partial(b: pa.Table) -> pa.Table:
        y = b[y_col]
        if isinstance(y, pa.ChunkedArray):
            y = y.combine_chunks()
        yv = y.to_numpy(zero_copy_only=False).astype(np.float64)
        binidx = np.clip(np.floor((yv - lo) / width), 0, bins - 1).astype(
            np.int32)
        t = pa.table({
            "series_id": b[series_col],
            "bucket": bucketize(b[x_col], window_us),
            "bin": pa.array(binidx),
        })
        g = t.group_by(["series_id", "bucket", "bin"]).aggregate(
            [("bin", "count")])
        from ..arrow_utils import rename_agg

        return rename_agg(g, {"series_id": "series_id", "bucket": "bucket",
                              "bin": "bin", "bin_count": "cnt"})

    from ..arrow_utils import stable_part_codes

    mod = num_partitions * 64

    def _add_part(b: pa.Table) -> pa.Table:
        h = stable_part_codes(b["series_id"], None)
        v = b["bucket"]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        h = (h * np.uint64(0x9E3779B97F4A7C15)
             + v.to_numpy(zero_copy_only=False).astype(np.uint64))
        return b.append_column(
            "__part", pa.array((h % np.uint64(mod)).astype(np.int32)))

    def _merge(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        m = t.group_by(["series_id", "bucket", "bin"]).aggregate(
            [("cnt", "sum")])
        from ..arrow_utils import rename_agg

        return rename_agg(m, {"series_id": "series_id", "bucket": "bucket",
                              "bin": "bin", "cnt_sum": "cnt"})

    partials = ds.map_batches(_partial, batch_format="pyarrow")
    parted = partials.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _merge, batch_format="pyarrow")


def histogram_quantiles(hist_ds, *, bins: int, lo: float, hi: float,
                        percentiles=(50, 95, 99)):
    """``histogram_rollup`` output -> one row per (series, bucket) with
    ``n`` and a ``p{P}`` upper-edge estimate per requested percentile.

    Requires each (series, bucket)'s bins co-located per block — which
    ``histogram_rollup`` guarantees — so the whole pass is one
    ``map_batches``: sort the block, segment cumsum, one searchsorted per
    segment x percentile (bins rows each; no cluster round-trip)."""
    width = (hi - lo) / bins

    def _quant(b: pa.Table) -> pa.Table:
        names = (["series_id", "bucket", "n"]
                 + [f"p{p}" for p in percentiles])
        if b.num_rows == 0:
            return pa.table({
                "series_id": pa.array([], b["series_id"].type),
                "bucket": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                **{f"p{p}": pa.array([], pa.float64())
                   for p in percentiles},
            }).select(names)
        idx = pc.sort_indices(b, sort_keys=[("series_id", "ascending"),
                                            ("bucket", "ascending"),
                                            ("bin", "ascending")])
        t = b.take(idx)
        sid = t["series_id"].combine_chunks() if isinstance(
            t["series_id"], pa.ChunkedArray) else t["series_id"]
        codes = group_codes(sid)
        bkt = t["bucket"].to_numpy(zero_copy_only=False)
        cnt = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        binv = t["bin"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(cnt)
        change = np.ones(n, dtype=bool)
        change[1:] = (codes[1:] != codes[:-1]) | (bkt[1:] != bkt[:-1])
        starts = np.flatnonzero(change)
        ends = np.concatenate([starts[1:], [n]])
        csum = np.cumsum(cnt)
        base = np.concatenate([[0], csum[ends[:-1] - 1]])
        seg_cum = csum - np.repeat(base, ends - starts)
        totals = csum[ends - 1] - base
        out = {
            "series_id": sid.take(pa.array(starts)),
            "bucket": pa.array(bkt[starts], pa.int64()),
            "n": pa.array(totals, pa.int64()),
        }
        for p in percentiles:
            ranks = (totals * p + 99) // 100
            qb = np.empty(len(starts), dtype=np.int64)
            for i, (s, e) in enumerate(zip(starts, ends)):
                j = s + np.searchsorted(seg_cum[s:e], ranks[i], side="left")
                qb[i] = binv[j]
            out[f"p{p}"] = pa.array(lo + (qb + 1) * width, pa.float64())
        return pa.table(out)

    return hist_ds.map_batches(_quant, batch_format="pyarrow")
