"""Classical additive seasonal decomposition (trend / seasonal /
remainder) over a dense rollup tier — the moving-average decomposition
behind dashboard "deseasonalized" views and anomaly baselines, made
bit-exact: every intermediate is an integer numerator over a fixed
denominator, the remainder's single IEEE division being the only float.

For an even period ``m`` the classical centered trend is the 2×m MA:
``trend = (y[i-h] + 2·Σ y[i-h+1..i+h-1] + y[i+h]) / 2m`` with
``h = m/2``; we carry ``trend_num = 2m·trend`` exactly. The detrended
series is ``detr = 2m·y − trend_num`` (denominator 2m), the seasonal
index per (series, slot) is ``seas_num/ (2m·seas_cnt)``, and the
remainder ``rem = (detr·seas_cnt − seas_num) / (2m·seas_cnt)``. Edge
rows without a full window are dropped (the classical NaN edges).

Scale shape: ONE hash(series) shuffle; each partition handles ALL its
series in a single vectorized pass — global cumsum window sums (windows
never cross series because edge rows are masked out), slot sums via one
``np.add.at`` over (series_code, slot) keys, remainders joined back by
plain array indexing. No second shuffle, no driver materialization.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ..arrow_utils import group_codes, make_add_part

__all__ = ["classical_decompose"]


def classical_decompose(dense, *, window_us: int, period: int = 24,
                        series_col: str = "series_id",
                        bucket_col: str = "bucket",
                        value_col: str = "sum_y",
                        num_partitions: int = 8):
    """Decompose a DENSE per-series rollup (gapfill first): returns
    ``(series_id, bucket, y, slot, trend_num, detr, seas_num, seas_cnt,
    rem_num, rem)`` for every interior row."""
    if period % 2 != 0:
        raise ValueError("classical_decompose: period must be even "
                         "(2 x m centered moving average)")
    half = period // 2
    den = 2 * period

    from ..arrow_utils import stable_part_codes

    mod = num_partitions * 64

    _add_part = make_add_part(series_col, mod)

    def _decompose(g: pa.Table) -> pa.Table:
        sid_type = g[series_col].type
        empty = pa.table({
            "series_id": pa.array([], sid_type),
            "bucket": pa.array([], pa.int64()),
            "y": pa.array([], pa.int64()),
            "slot": pa.array([], pa.int64()),
            "trend_num": pa.array([], pa.int64()),
            "detr": pa.array([], pa.int64()),
            "seas_num": pa.array([], pa.int64()),
            "seas_cnt": pa.array([], pa.int64()),
            "rem_num": pa.array([], pa.int64()),
            "rem": pa.array([], pa.float64()),
        })
        if g.num_rows == 0:
            return empty
        t = g.take(pc.sort_indices(g, sort_keys=[
            (series_col, "ascending"), (bucket_col, "ascending")]))
        sid = t[series_col]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = group_codes(sid)
        buckets = t[bucket_col].to_numpy(zero_copy_only=False).astype(
            np.int64)
        y = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(y)
        change = np.ones(n, dtype=bool)
        change[1:] = codes[1:] != codes[:-1]
        seg_id = np.cumsum(change) - 1
        seg_first = np.flatnonzero(change)
        seg_len = np.diff(np.r_[seg_first, n])
        w = np.arange(n) - seg_first[seg_id]          # in-segment index
        interior = (w >= half) & (w <= seg_len[seg_id] - 1 - half)
        if not interior.any():
            return empty
        csum = np.cumsum(y)
        i = np.flatnonzero(interior)
        # inner window sum y[i-h+1 .. i+h-1] stays inside the segment
        inner = csum[i + half - 1] - csum[i - half]
        trend_num = y[i - half] + 2 * inner + y[i + half]
        detr = den * y[i] - trend_num
        slot = (buckets[i] // window_us) % period
        key = codes[i] * period + slot
        nk = int(codes.max()) * period + period
        snum = np.zeros(nk, np.int64)
        scnt = np.zeros(nk, np.int64)
        np.add.at(snum, key, detr)
        np.add.at(scnt, key, 1)
        seas_num = snum[key]
        seas_cnt = scnt[key]
        rem_num = detr * seas_cnt - seas_num
        rem = rem_num / (float(den) * seas_cnt)
        return pa.table({
            "series_id": sid.take(pa.array(i)),
            "bucket": pa.array(buckets[i]),
            "y": pa.array(y[i]),
            "slot": pa.array(slot),
            "trend_num": pa.array(trend_num),
            "detr": pa.array(detr),
            "seas_num": pa.array(seas_num),
            "seas_cnt": pa.array(seas_cnt),
            "rem_num": pa.array(rem_num),
            "rem": pa.array(rem, pa.float64()),
        })

    parted = dense.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _decompose, batch_format="pyarrow")
