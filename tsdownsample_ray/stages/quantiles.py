"""Exact per-series quantiles over rolled-up tier rows.

The exact companion to the mergeable fixed-bin histogram sketch
(``stages/histogram.py``): when the per-series tier row count fits a
partition (the engine's standard per-series contract — tier rows are
~100-1000x reduced from raw), the true order statistic is one sorted
pass away; no sketch error band.

Quantile definition (pinned, SQL-restatable): the value at 0-based sorted
index ``(n - 1) * p // 100`` with ties broken by the bucket column —
the "lower" discrete quantile on integer index arithmetic, identical on
both sides by construction.

Scale shape: ONE hash(series) shuffle, then each partition sorts once by
(series, value, bucket) and gathers EVERY series' quantile indices in one
vectorized segment pass.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["exact_quantiles"]


def exact_quantiles(rolled, probs=(50, 90, 99), *,
                    series_col: str = "series_id",
                    order_col: str = "bucket", value_col: str = "sum_y",
                    num_partitions: int = 8):
    """One row per series: ``(series_id, n, p<p0>, p<p1>, ...)`` with the
    exact discrete quantiles of ``value_col`` (int64)."""
    from ..arrow_utils import stable_part_codes

    mod = num_partitions * 64
    probs = tuple(int(p) for p in probs)

    def _add_part(b: pa.Table) -> pa.Table:
        h = stable_part_codes(b[series_col], None)
        return b.append_column(
            "__part", pa.array((h % np.uint64(mod)).astype(np.int32)))

    def _q(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        s_type = t[series_col].type
        if t.num_rows == 0:
            return pa.table({
                "series_id": pa.array([], s_type),
                "n": pa.array([], pa.int64()),
                **{f"p{p}": pa.array([], pa.int64()) for p in probs}})
        t = t.take(pc.sort_indices(t, sort_keys=[
            (series_col, "ascending"), (value_col, "ascending"),
            (order_col, "ascending")]))
        sid = t[series_col]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = sid.dictionary_encode().indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        heads = np.ones(len(codes), dtype=bool)
        heads[1:] = codes[1:] != codes[:-1]
        seg = np.flatnonzero(heads)
        n = np.diff(np.append(seg, len(codes)))
        cols = {"series_id": sid.take(pa.array(seg)),
                "n": pa.array(n)}
        for p in probs:
            idx = seg + (n - 1) * p // 100
            cols[f"p{p}"] = pa.array(v[idx])
        return pa.table(cols)

    parted = rolled.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _q, batch_format="pyarrow")


def mad_outliers(rolled, *, k: int = 3, mad_scale: int = 14826,
                 series_col: str = "series_id", order_col: str = "bucket",
                 value_col: str = "sum_y", num_partitions: int = 8):
    """Robust per-series outlier flags via the median absolute deviation,
    all-integer exact. Per series over its tier rows:

        m2  = v[(n-1)//2] + v[n//2]          (2 x median, sorted values)
        dev = |2*v - m2|                      (2 x |v - median|)
        d2  = dev[(n-1)//2] + dev[n//2]       (2 x median of dev = 4*MAD... /2)
        outlier when  10000 * dev > k * mad_scale * d2

    i.e. |v - med| > k * 1.4826 * MAD with every quantity doubled and the
    1.4826 consistency constant as the integer ratio mad_scale/10000 —
    no floats anywhere, so the flag is bit-stable under any partitioning
    and SQL-replayable. Median convention: average of the two middle
    order statistics, kept as their SUM (never divided).

    Scale shape: ONE hash(series) shuffle; each partition then runs two
    sorted segment-gather passes (values, deviations) — no second
    shuffle, no Python per series. Output: one row per input row,
    ``(series_id, bucket, v, m2, d2, outlier)``.
    """
    from ..arrow_utils import stable_part_codes

    mod = num_partitions * 64

    def _add_part(b: pa.Table) -> pa.Table:
        h = stable_part_codes(b[series_col], None)
        return b.append_column(
            "__part", pa.array((h % np.uint64(mod)).astype(np.int32)))

    def _twice_median_per_seg(v_sorted, seg, n):
        lo = seg + (n - 1) // 2
        hi = seg + n // 2
        return v_sorted[lo] + v_sorted[hi]

    def _flag(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        s_type = t[series_col].type
        if t.num_rows == 0:
            return pa.table({
                "series_id": pa.array([], s_type),
                "bucket": pa.array([], pa.int64()),
                "v": pa.array([], pa.int64()),
                "m2": pa.array([], pa.int64()),
                "d2": pa.array([], pa.int64()),
                "outlier": pa.array([], pa.int64())})
        t = t.take(pc.sort_indices(t, sort_keys=[
            (series_col, "ascending"), (value_col, "ascending"),
            (order_col, "ascending")]))
        sid = t[series_col]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = sid.dictionary_encode().indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bkt = t[order_col].to_numpy(zero_copy_only=False).astype(np.int64)
        heads = np.ones(len(codes), dtype=bool)
        heads[1:] = codes[1:] != codes[:-1]
        seg = np.flatnonzero(heads)
        n = np.diff(np.append(seg, len(codes)))
        seg_of_row = np.cumsum(heads) - 1
        m2 = _twice_median_per_seg(v, seg, n)[seg_of_row]
        dev = np.abs(2 * v - m2)
        # second order statistic: sort deviations WITHIN each segment
        # (rows already grouped by series -> one lexsort, no shuffle)
        order = np.lexsort((dev, seg_of_row))
        dev_sorted = dev[order]
        d2 = _twice_median_per_seg(dev_sorted, seg, n)[seg_of_row]
        out = 10000 * dev > k * mad_scale * d2
        return pa.table({
            "series_id": sid, "bucket": pa.array(bkt),
            "v": pa.array(v), "m2": pa.array(m2), "d2": pa.array(d2),
            "outlier": pa.array(out.astype(np.int64))})

    parted = rolled.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _flag, batch_format="pyarrow")
