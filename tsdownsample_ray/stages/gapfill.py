"""Gap-fill stage: materialize missing windows of each series' rollup.

Per series: generate every bucket in ``[min_bucket, max_bucket]`` at the
tier's window; buckets absent from the rollup become explicit rows with
``n = 0``, ``is_gap = true`` and value columns either null/zero ('zero')
or carried forward from the previous present bucket ('ffill' — what a
charting client wants before running LTTB over a sparse series).

New design (no reference counterpart — SURVEY.md §2.4): the reference
*represents* gaps by returning fewer indices (README.md:99); a retention
engine must materialize them so cascaded tiers and downstream consumers
see a dense time axis.

Scale shape: ONE hash(series) shuffle (dense part space, bounded
reducers), then each partition fills EVERY series in one vectorized pass —
per-series dense ranges built with repeat/arange arithmetic, present rows
scattered by their in-range position, forward-fill via a segment-reset
maximum-accumulate — one call per partition, not one ``map_groups``
round-trip per series."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ..arrow_utils import group_codes, make_add_part

__all__ = ["gapfill", "gapfill_linear", "gapfill_seasonal"]


def gapfill(ds, window_us: int, *, value_cols: tuple = ("min_y", "max_y", "sum_y"),
            count_col: str = "n", fill: str = "zero",
            num_partitions: int = 16):
    if fill not in ("zero", "ffill"):
        raise ValueError("fill must be 'zero' or 'ffill'")

    from ..arrow_utils import stable_part_codes

    mod = num_partitions * 64

    _add_part = make_add_part("series_id", mod)

    def _fill(g: pa.Table) -> pa.Table:
        sid_type = g["series_id"].type
        if g.num_rows == 0:
            cols = {"series_id": pa.array([], sid_type),
                    "bucket": pa.array([], pa.int64()),
                    count_col: pa.array([], pa.int64()),
                    "is_gap": pa.array([], pa.bool_())}
            for c in value_cols:
                cols[c] = pa.array([], g.schema.field(c).type)
            return pa.table(cols)
        t = g.take(pc.sort_indices(g, sort_keys=[("series_id", "ascending"),
                                                 ("bucket", "ascending")]))
        sid = t["series_id"]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = group_codes(sid)
        buckets = t["bucket"].to_numpy(zero_copy_only=False)
        n = len(codes)
        change = np.ones(n, dtype=bool)
        change[1:] = codes[1:] != codes[:-1]
        seg_first = np.flatnonzero(change)           # per-series first row
        seg_last = np.concatenate([seg_first[1:] - 1, [n - 1]])
        mins = buckets[seg_first]
        k = (buckets[seg_last] - mins) // window_us + 1  # dense len/series
        total = int(k.sum())
        out_off = np.concatenate([[0], np.cumsum(k)[:-1]])
        # dense bucket axis for every series at once
        intra = np.arange(total) - np.repeat(out_off, k)
        full = np.repeat(mins, k) + intra * window_us
        # scatter present rows to their dense positions
        series_of_row = np.repeat(np.arange(len(seg_first)), np.diff(
            np.concatenate([seg_first, [n]])))
        pos = (out_off[series_of_row]
               + (buckets - mins[series_of_row]) // window_us)
        present = np.zeros(total, dtype=bool)
        present[pos] = True
        src = np.zeros(total, dtype=np.int64)
        src[pos] = np.arange(n)

        n_vals = t[count_col].to_numpy(zero_copy_only=False)
        out = {
            "series_id": sid.take(pa.array(
                np.repeat(seg_first, k))),
            "bucket": pa.array(full, pa.int64()),
            count_col: pa.array(np.where(present, n_vals[src], 0),
                                pa.int64()),
            "is_gap": pa.array(~present),
        }
        if fill == "ffill":
            # last present dense position, reset at series boundaries via
            # the segment-start validity check
            out_start = np.repeat(out_off, k)
            lastp = np.maximum.accumulate(
                np.where(present, np.arange(total), -1))
            has_prev = lastp >= out_start
        for c in value_cols:
            v = t[c].to_numpy(zero_copy_only=False)
            if fill == "ffill":
                carried = v[src[np.maximum(lastp, 0)]]
                first_of_series = v[seg_first][
                    np.repeat(np.arange(len(seg_first)), k)]
                filled = np.where(present, v[src],
                                  np.where(has_prev, carried,
                                           first_of_series))
                out[c] = pa.array(filled)
            else:
                filled = np.where(present, v[src], 0)
                out[c] = pa.array(filled.astype(v.dtype))
        return pa.table(out)

    parted = ds.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _fill, batch_format="pyarrow")


def gapfill_linear(ds, window_us: int, *, value_col: str = "sum_y",
                   num_partitions: int = 16):
    """Linear-interpolation gap fill — the third fill mode (after
    'zero' / 'ffill'): every missing bucket takes the e6 fixed-point
    linear interpolation between its bracketing PRESENT buckets,
    ``y_e6 = (y0·(k1−k) + y1·(k−k0))·10⁶ // (k1−k0)`` over WINDOW-INDEX
    distances (k = bucket/window — small ints, so the integer product
    never overflows), truncating toward zero (DuckDB ``//``). The dense
    grid spans [min, max] per series, so every gap is interior. Present
    rows carry ``y·10⁶`` exactly. Output:
    ``(series_id, bucket, y_e6, is_gap)``.

    Scale shape: identical to :func:`gapfill` — ONE hash(series)
    shuffle, each partition fills all its series in one vectorized pass
    (prev/next present indices via two ``maximum.accumulate`` scans)."""
    from ..arrow_utils import stable_part_codes

    mod = num_partitions * 64
    E6 = 1_000_000

    _add_part = make_add_part("series_id", mod)

    def _fill(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        sid_type = t["series_id"].type
        empty = pa.table({"series_id": pa.array([], sid_type),
                          "bucket": pa.array([], pa.int64()),
                          "y_e6": pa.array([], pa.int64()),
                          "is_gap": pa.array([], pa.bool_())})
        if t.num_rows == 0:
            return empty
        t = t.take(pc.sort_indices(t, sort_keys=[
            ("series_id", "ascending"), ("bucket", "ascending")]))
        sid = t["series_id"]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = group_codes(sid)
        buckets = t["bucket"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        y = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(codes)
        change = np.ones(n, dtype=bool)
        change[1:] = codes[1:] != codes[:-1]
        seg_first = np.flatnonzero(change)
        seg_last = np.concatenate([seg_first[1:] - 1, [n - 1]])
        mins = buckets[seg_first]
        k = (buckets[seg_last] - mins) // window_us + 1
        total = int(k.sum())
        out_off = np.concatenate([[0], np.cumsum(k)[:-1]])
        intra = np.arange(total) - np.repeat(out_off, k)
        full = np.repeat(mins, k) + intra * window_us
        series_of_row = np.repeat(np.arange(len(seg_first)), np.diff(
            np.concatenate([seg_first, [n]])))
        pos = (out_off[series_of_row]
               + (buckets - mins[series_of_row]) // window_us)
        present = np.zeros(total, dtype=bool)
        present[pos] = True
        dense_y = np.zeros(total, np.int64)
        dense_y[pos] = y
        # bracketing present positions (gaps are interior by grid
        # construction, so prev/next always exist for gap rows)
        idx = np.arange(total)
        prev = np.maximum.accumulate(np.where(present, idx, -1))
        nxt = total - 1 - np.maximum.accumulate(
            np.where(present[::-1], idx, -1))[::-1]
        gap = ~present
        k0 = prev[gap]
        k1 = nxt[gap]
        num = (dense_y[k0] * (k1 - idx[gap])
               + dense_y[k1] * (idx[gap] - k0)) * E6
        den = k1 - k0
        interp = np.where(num >= 0, num // den, -((-num) // den))
        y_e6 = dense_y * E6
        y_e6[gap] = interp
        out_sid = sid.take(pa.array(np.repeat(seg_first, k)))
        return pa.table({"series_id": out_sid,
                         "bucket": pa.array(full, pa.int64()),
                         "y_e6": pa.array(y_e6),
                         "is_gap": pa.array(gap)})

    parted = ds.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _fill, batch_format="pyarrow")


def gapfill_seasonal(ds, window_us: int, *, value_col: str = "sum_y",
                     m: int = 24, num_partitions: int = 16):
    """Seasonal-slot mean imputation — the fourth fill mode (after
    zero / ffill / linear): every missing bucket takes the FLOOR mean
    of its series' PRESENT buckets in the same seasonal slot
    ``(bucket // window) % m`` (hour-of-day for a 1h window, m=24) —
    the classic profile-based imputation for strongly diurnal series.
    Exact integers: fill = ``floor(slot_sum / slot_cnt)`` (sign-handled
    floor, SQL-replayable); a slot with no present rows in the series
    fills 0. Present rows pass through unchanged. Output:
    ``(series_id, bucket, y, is_gap)``.

    Scale shape: identical to :func:`gapfill` — ONE hash(series)
    shuffle; slot sums/counts are per-series scatter-adds over m cells,
    computed inside the same partition pass (no second shuffle)."""
    mod = num_partitions * 64

    _add_part = make_add_part("series_id", mod)

    def _fill(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        sid_type = t["series_id"].type
        empty = pa.table({"series_id": pa.array([], sid_type),
                          "bucket": pa.array([], pa.int64()),
                          "y": pa.array([], pa.int64()),
                          "is_gap": pa.array([], pa.bool_())})
        if t.num_rows == 0:
            return empty
        t = t.take(pc.sort_indices(t, sort_keys=[
            ("series_id", "ascending"), ("bucket", "ascending")]))
        sid = t["series_id"]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = group_codes(sid)
        buckets = t["bucket"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        y = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(codes)
        change = np.ones(n, dtype=bool)
        change[1:] = codes[1:] != codes[:-1]
        seg_first = np.flatnonzero(change)
        seg_last = np.concatenate([seg_first[1:] - 1, [n - 1]])
        n_series = len(seg_first)
        series_of_row = np.repeat(np.arange(n_series), np.diff(
            np.concatenate([seg_first, [n]])))
        # per-(series, slot) sums/counts: one scatter-add over m cells
        slot_obs = (buckets // window_us) % m
        cell = series_of_row * m + slot_obs
        sums = np.zeros(n_series * m, np.int64)
        cnts = np.zeros(n_series * m, np.int64)
        np.add.at(sums, cell, y)
        np.add.at(cnts, cell, 1)
        mins = buckets[seg_first]
        k = (buckets[seg_last] - mins) // window_us + 1
        total = int(k.sum())
        out_off = np.concatenate([[0], np.cumsum(k)[:-1]])
        intra = np.arange(total) - np.repeat(out_off, k)
        full = np.repeat(mins, k) + intra * window_us
        pos = (out_off[series_of_row]
               + (buckets - mins[series_of_row]) // window_us)
        present = np.zeros(total, dtype=bool)
        present[pos] = True
        dense_y = np.zeros(total, np.int64)
        dense_y[pos] = y
        gap = ~present
        gser = np.repeat(np.arange(n_series), k)[gap]
        gslot = (full[gap] // window_us) % m
        gcell = gser * m + gslot
        gs, gc = sums[gcell], cnts[gcell]
        fill = np.zeros(len(gs), np.int64)
        nz = gc > 0
        fill[nz] = gs[nz] // gc[nz]  # numpy // IS floor (also for <0)
        dense_y[gap] = fill
        out_sid = sid.take(pa.array(np.repeat(seg_first, k)))
        return pa.table({"series_id": out_sid,
                         "bucket": pa.array(full, pa.int64()),
                         "y": pa.array(dense_y),
                         "is_gap": pa.array(gap)})

    parted = ds.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _fill, batch_format="pyarrow")
