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
from ..arrow_utils import group_codes, make_add_part

__all__ = ["ransac_line", "radix_select",
           "exact_quantiles", "mad_outliers", "theil_sen",
           "percentile_rank", "top_share", "winsorize", "rank2avg",
           "weighted_median", "gini_dispersion", "qn_scale"]


def exact_quantiles(rolled, probs=(50, 90, 99), *,
                    series_col: str = "series_id",
                    order_col: str = "bucket", value_col: str = "sum_y",
                    num_partitions: int = 8):
    """One row per series: ``(series_id, n, p<p0>, p<p1>, ...)`` with the
    exact discrete quantiles of ``value_col`` (int64)."""
    from ..arrow_utils import stable_part_codes

    mod = num_partitions * 64
    probs = tuple(int(p) for p in probs)

    _add_part = make_add_part(series_col, mod)

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
        codes = group_codes(sid)
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
        d2  = dev[(n-1)//2] + dev[n//2]       (2 x median of dev = 4 x MAD)
        outlier when  20000 * dev > k * mad_scale * d2

    (dev carries one factor of 2 and d2 two, so the left side needs the
    extra 2 for the comparison to reduce to |v - med| vs k*1.4826*MAD)

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

    _add_part = make_add_part(series_col, mod)

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
        codes = group_codes(sid)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bkt = t[order_col].to_numpy(zero_copy_only=False).astype(np.int64)
        heads = np.ones(len(codes), dtype=bool)
        heads[1:] = codes[1:] != codes[:-1]
        seg = np.flatnonzero(heads)
        n = np.diff(np.append(seg, len(codes)))
        seg_of_row = np.cumsum(heads) - 1
        # loud exactness guard (Python-int arithmetic, no wrap): the
        # flag compares 20000*dev (dev <= 4V) against k*mad_scale*d2
        # (d2 <= 8V) in int64 — numpy would wrap SILENTLY past these
        V = int(np.abs(v).max()) if len(v) else 0
        if 80000 * V >= 2 ** 63 or k * mad_scale * 8 * V >= 2 ** 63:
            raise OverflowError(
                "mad_outliers: |value| too large for the exact int64 "
                f"flag (max|v|={V}, k={k}) — rescale values")
        m2 = _twice_median_per_seg(v, seg, n)[seg_of_row]
        dev = np.abs(2 * v - m2)
        # second order statistic: sort deviations WITHIN each segment
        # (rows already grouped by series -> one lexsort, no shuffle)
        order = np.lexsort((dev, seg_of_row))
        dev_sorted = dev[order]
        d2 = _twice_median_per_seg(dev_sorted, seg, n)[seg_of_row]
        out = 20000 * dev > k * mad_scale * d2
        return pa.table({
            "series_id": sid, "bucket": pa.array(bkt),
            "v": pa.array(v), "m2": pa.array(m2), "d2": pa.array(d2),
            "outlier": pa.array(out.astype(np.int64))})

    parted = rolled.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _flag, batch_format="pyarrow")


def theil_sen(rolled, *, series_col: str = "series_id",
              order_col: str = "bucket", value_col: str = "sum_y",
              num_partitions: int = 8):
    """Theil-Sen robust trend estimate per series: the median of all
    pairwise slopes ``(v_j - v_i) / (b_j - b_i)`` over the series' tier
    rows (i < j by bucket). Median convention matches ``mad_outliers``:
    the SUM of the two middle order statistics (``slope2`` = 2x median
    slope), so even counts never divide.

    Determinism contract: slopes are IEEE float64 divisions — identical
    bit patterns on the NumPy and SQL sides (same operands, same IEEE
    op) — ordered by (slope, dv, db) so equal slopes from different
    pairs order deterministically. O(rows_per_series^2) pair expansion:
    tier rows only (the engine's per-series contract, ~100-1000x reduced
    from raw), NEVER raw events.

    Scale shape: ONE hash(series) shuffle; per partition one sort, one
    vectorized within-segment pair expansion (same index arithmetic as
    ``correlate.lagged_correlation``), one slope sort, one segment
    gather. Output: ``(series_id, n_pairs, slope2)``."""
    from ..arrow_utils import stable_part_codes

    mod = num_partitions * 64

    _add_part = make_add_part(series_col, mod)

    def _slopes(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        s_type = t[series_col].type
        empty = pa.table({"series_id": pa.array([], s_type),
                          "n_pairs": pa.array([], pa.int64()),
                          "slope2": pa.array([], pa.float64())})
        if t.num_rows == 0:
            return empty
        t = t.take(pc.sort_indices(t, sort_keys=[
            (series_col, "ascending"), (order_col, "ascending")]))
        sid = t[series_col]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = group_codes(sid)
        b_ = t[order_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        heads = np.ones(len(codes), dtype=bool)
        heads[1:] = codes[1:] != codes[:-1]
        seg = np.flatnonzero(heads)
        n = np.diff(np.append(seg, len(codes)))
        # all (i < j) pairs within each segment: full n^2 cross product
        # (same index arithmetic as lagged_correlation) then mask j > i —
        # 2x transient memory for a branch-free decode; n is tier rows
        # per series, so n^2 stays partition-local and small
        sq = n * n
        total_sq = int(sq.sum())
        if total_sq == 0:
            return empty
        live = n > 1
        if not bool(live.any()):
            return empty
        segl, nl = seg[live], n[live]
        sql_ = nl * nl
        starts = np.concatenate(([0], np.cumsum(sql_)[:-1]))
        q = np.arange(int(sql_.sum())) - np.repeat(starts, sql_)
        nn = np.repeat(nl, sql_)
        i_loc = q // nn
        j_loc = q % nn
        keep = j_loc > i_loc
        i = (np.repeat(segl, sql_) + i_loc)[keep]
        j = (np.repeat(segl, sql_) + j_loc)[keep]
        cntl = nl * (nl - 1) // 2
        dv = v[j] - v[i]
        db = b_[j] - b_[i]
        if bool((db == 0).any()):
            # duplicate (series, bucket) tier rows: the pair slope is
            # 0/0 or x/0 — inf/nan would SILENTLY shift the median, so
            # assert the tier-row uniqueness contract loudly instead
            raise ValueError(
                "theil_sen: duplicate (series, bucket) tier rows — "
                "dedupe/rollup upstream before the trend estimate")
        slope = dv.astype(np.float64) / db.astype(np.float64)
        seg_of_pair = np.repeat(np.arange(len(segl)), sql_)[keep]
        order = np.lexsort((db, dv, slope, seg_of_pair))
        s_sorted = slope[order]
        p_starts = np.concatenate(([0], np.cumsum(cntl)[:-1]))
        lo = p_starts + (cntl - 1) // 2
        hi = p_starts + cntl // 2
        slope2 = s_sorted[lo] + s_sorted[hi]
        return pa.table({"series_id": sid.take(pa.array(segl)),
                         "n_pairs": pa.array(cntl),
                         "slope2": pa.array(slope2)})

    parted = rolled.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _slopes, batch_format="pyarrow")


def percentile_rank(rolled, *, series_col: str = "series_id",
                    order_col: str = "bucket", value_col: str = "sum_y",
                    num_partitions: int = 8):
    """Percentile-rank transform per series: for every row, the number
    of rows in its series with a strictly smaller value (``rank_lt``),
    with ties below broken... not at all — ties share the count, exactly
    SQL's ``rank() - 1``. Emitted as exact integers ``(rank_lt, n)``
    rather than a float percentile, so the transform is bit-stable.

    Scale shape: ONE hash(series) shuffle, one sort + vectorized
    first-occurrence scatter per partition. Output:
    ``(series_id, bucket, v, rank_lt, n)``."""
    from ..arrow_utils import stable_part_codes

    mod = num_partitions * 64

    _add_part = make_add_part(series_col, mod)

    def _rank(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        s_type = t[series_col].type
        if t.num_rows == 0:
            return pa.table({"series_id": pa.array([], s_type),
                             "bucket": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64()),
                             "rank_lt": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        t = t.take(pc.sort_indices(t, sort_keys=[
            (series_col, "ascending"), (value_col, "ascending"),
            (order_col, "ascending")]))
        sid = t[series_col]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = group_codes(sid)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bkt = t[order_col].to_numpy(zero_copy_only=False).astype(np.int64)
        heads = np.ones(len(codes), dtype=bool)
        heads[1:] = codes[1:] != codes[:-1]
        seg = np.flatnonzero(heads)
        n = np.diff(np.append(seg, len(codes)))
        seg_of_row = np.cumsum(heads) - 1
        pos = np.arange(len(v)) - seg[seg_of_row]  # 0-based within series
        # rank_lt = position of the FIRST row with this (series, value):
        # a new value starts where value or series changes
        newv = np.ones(len(v), dtype=bool)
        newv[1:] = (v[1:] != v[:-1]) | heads[1:]
        first_pos = pos[np.flatnonzero(newv)][np.cumsum(newv) - 1]
        return pa.table({"series_id": sid, "bucket": pa.array(bkt),
                         "v": pa.array(v),
                         "rank_lt": pa.array(first_pos),
                         "n": pa.array(n[seg_of_row])})

    parted = rolled.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _rank, batch_format="pyarrow")


def top_share(ds, *, group_col: str, weight_col: str, k: int = 10,
              tiebreak_col: str | None = None, num_partitions: int = 8):
    """Concentration summary per group: how much of the group's total
    weight its top-``k`` members hold (the Lorenz/inequality audit every
    corpus balance check runs — e.g. chars per domain). Output one row
    per group: ``(group, n, total_w, top_w)`` — exact int64, callers
    derive the share; ties at the k boundary resolve by
    (weight DESC, tiebreak ASC).

    Scale shape: ONE hash(group) shuffle, per partition one sort + one
    segment-bounded prefix gather."""
    from ..arrow_utils import stable_part_codes

    mod = num_partitions * 64

    _add_part = make_add_part(group_col, mod)

    sort_keys = [(group_col, "ascending"), (weight_col, "descending")]
    if tiebreak_col is not None:
        sort_keys.append((tiebreak_col, "ascending"))

    def _share(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        g_type = t[group_col].type
        if t.num_rows == 0:
            return pa.table({"group": pa.array([], g_type),
                             "n": pa.array([], pa.int64()),
                             "total_w": pa.array([], pa.int64()),
                             "top_w": pa.array([], pa.int64())})
        t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
        grp = t[group_col]
        if isinstance(grp, pa.ChunkedArray):
            grp = grp.combine_chunks()
        codes = group_codes(grp)
        w = t[weight_col].to_numpy(zero_copy_only=False).astype(np.int64)
        heads = np.ones(len(codes), dtype=bool)
        heads[1:] = codes[1:] != codes[:-1]
        seg = np.flatnonzero(heads)
        n = np.diff(np.append(seg, len(codes)))
        cw = np.cumsum(w)
        total = cw[seg + n - 1] - cw[seg] + w[seg]
        end = seg + np.minimum(n, k)
        topw = cw[end - 1] - cw[seg] + w[seg]
        return pa.table({"group": grp.take(pa.array(seg)),
                         "n": pa.array(n),
                         "total_w": pa.array(total),
                         "top_w": pa.array(topw)})

    parted = ds.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _share, batch_format="pyarrow")


def winsorize(rolled, *, lo: int = 5, hi: int = 95,
              series_col: str = "series_id", order_col: str = "bucket",
              value_col: str = "sum_y", num_partitions: int = 8):
    """Winsorization per series: clamp every value into the series' own
    [p_lo, p_hi] discrete quantile band (``exact_quantiles``'s pinned
    lower-quantile convention) — the standard robust pre-transform before
    fitting on heavy-tailed telemetry. Output one row per input row:
    ``(series_id, bucket, v, v_wins, clipped)``; all integer, one
    hash(series) shuffle, one sorted segment pass."""
    from ..arrow_utils import stable_part_codes

    mod = num_partitions * 64

    _add_part = make_add_part(series_col, mod)

    def _clamp(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        s_type = t[series_col].type
        if t.num_rows == 0:
            return pa.table({"series_id": pa.array([], s_type),
                             "bucket": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64()),
                             "v_wins": pa.array([], pa.int64()),
                             "clipped": pa.array([], pa.int64())})
        t = t.take(pc.sort_indices(t, sort_keys=[
            (series_col, "ascending"), (value_col, "ascending"),
            (order_col, "ascending")]))
        sid = t[series_col]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = group_codes(sid)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bkt = t[order_col].to_numpy(zero_copy_only=False).astype(np.int64)
        heads = np.ones(len(codes), dtype=bool)
        heads[1:] = codes[1:] != codes[:-1]
        seg = np.flatnonzero(heads)
        n = np.diff(np.append(seg, len(codes)))
        seg_of_row = np.cumsum(heads) - 1
        lo_v = v[seg + (n - 1) * lo // 100][seg_of_row]
        hi_v = v[seg + (n - 1) * hi // 100][seg_of_row]
        vw = np.clip(v, lo_v, hi_v)
        return pa.table({"series_id": sid, "bucket": pa.array(bkt),
                         "v": pa.array(v), "v_wins": pa.array(vw),
                         "clipped": pa.array((vw != v).astype(np.int64))})

    parted = rolled.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _clamp, batch_format="pyarrow")


def rank2avg(rolled, *, series_col: str = "series_id",
             order_col: str = "bucket", value_col: str = "sum_y",
             num_partitions: int = 8):
    """Tie-aware rank transform per series: for every row, TWICE its
    average (fractional) rank within the series — ``2*rank() + c - 1``
    with ``c`` the tie-group size — kept as an exact int64 so the
    transform is bit-stable (the x2 cancels in any scale-invariant
    consumer, e.g. Spearman = Pearson over these). Output
    ``(series_id, bucket, sum_y=r2)``, ready for
    :func:`~tsdownsample_ray.stages.correlate.pairwise_correlation`.

    Same one-shuffle segment discipline as :func:`percentile_rank`."""
    from ..arrow_utils import stable_part_codes

    mod = num_partitions * 64

    _add_part = make_add_part(series_col, mod)

    def _rank(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        s_type = t[series_col].type
        if t.num_rows == 0:
            return pa.table({"series_id": pa.array([], s_type),
                             "bucket": pa.array([], pa.int64()),
                             "sum_y": pa.array([], pa.int64())})
        t = t.take(pc.sort_indices(t, sort_keys=[
            (series_col, "ascending"), (value_col, "ascending"),
            (order_col, "ascending")]))
        sid = t[series_col]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = group_codes(sid)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bkt = t[order_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = len(v)
        heads = np.ones(m, dtype=bool)
        heads[1:] = codes[1:] != codes[:-1]
        seg = np.flatnonzero(heads)
        seg_of_row = np.cumsum(heads) - 1
        pos = np.arange(m) - seg[seg_of_row]
        newv = np.ones(m, dtype=bool)
        newv[1:] = (v[1:] != v[:-1]) | heads[1:]
        runs = np.flatnonzero(newv)
        run_of_row = np.cumsum(newv) - 1
        run_len = np.diff(np.append(runs, m))
        first_pos = pos[runs][run_of_row]           # rank_lt
        c = run_len[run_of_row]                     # tie-group size
        r2 = 2 * (first_pos + 1) + c - 1            # 2 * average rank
        return pa.table({"series_id": sid, "bucket": pa.array(bkt),
                         "sum_y": pa.array(r2)})

    parted = rolled.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _rank, batch_format="pyarrow")


def weighted_median(ds, *, key_col: str = "series_id",
                    val_col: str = "y", weight_col: str = "w",
                    num_partitions: int = 16):
    """Exact weighted (lower) median per key: the smallest value ``v``
    whose cumulative weight (ascending value order) reaches half the
    key's total — ``2·cumw(v) >= total_w``. Integer weights/values make
    the result deterministic under any partitioning. Rows with
    non-positive weight are dropped (they carry no mass); keys with no
    positive-weight rows are omitted.

    Scale shape: ONE hash(key) shuffle, then a single sorted pass per
    partition: per-(key, value) weights collapse via an arrow group_by,
    segment cumulative weights come from a global cumsum minus the
    segment-head base (the reset), and the per-key answer is a
    ``np.minimum.reduceat`` over the monotone crossing mask. No per-key
    Python.

    SQL restatement: grouped weights + a running-sum window +
    ``min(v) FILTER (WHERE 2·cw >= tw)``."""
    from ..arrow_utils import col_type, rename_agg, stable_part_codes

    mod = num_partitions * 64

    _add_part = make_add_part(key_col, mod)

    def _median(g: pa.Table) -> pa.Table:
        kt = col_type(g, key_col)
        empty = pa.table({
            "series_id": pa.array([], kt),
            "total_w": pa.array([], pa.int64()),
            "wmedian": pa.array([], pa.int64()),
        })
        if g.num_rows == 0:
            return empty
        w = pc.cast(g[weight_col], pa.int64())
        g = g.filter(pc.greater(w, 0))
        if g.num_rows == 0:
            return empty
        t = rename_agg(
            pa.table({"k": g[key_col],
                      "v": pc.cast(g[val_col], pa.int64()),
                      "w": pc.cast(g[weight_col], pa.int64())})
            .group_by(["k", "v"]).aggregate([("w", "sum")]),
            {"k": "k", "v": "v", "w_sum": "w"})
        t = t.take(pc.sort_indices(
            t, sort_keys=[("k", "ascending"), ("v", "ascending")]))
        k = t["k"]
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        enc = k.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        v = t["v"].to_numpy(zero_copy_only=False)
        w = t["w"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(w)
        heads = np.ones(n, dtype=bool)
        heads[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(heads)
        seg = np.cumsum(heads) - 1
        gcum = np.cumsum(w)
        base = (gcum[starts] - w[starts])[seg]
        cw = gcum - base
        ends = np.append(starts[1:], n) - 1
        tw = cw[ends][seg]
        crossing = 2 * cw >= tw
        first = np.minimum.reduceat(np.where(crossing, np.arange(n), n),
                                    starts)
        return pa.table({
            "series_id": enc.dictionary.take(pa.array(codes[starts])),
            "total_w": pa.array(cw[ends]),
            "wmedian": pa.array(v[first]),
        })

    parted = ds.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _median, batch_format="pyarrow")


def gini_dispersion(ds, *, key_col: str = "series_id",
                    val_col: str = "y", num_partitions: int = 16):
    """Exact pairwise-dispersion statistic per key: ``pairdiff_total``
    = Σ_{i<j} |x_i − x_j| via the sorted closed form Σ_i (2i−n−1)·x_(i)
    (1-based rank; the coefficient sum over a tie block is
    order-invariant, so ties need no special handling) — all int64.
    Also emits n, sum_y, and ``gini`` = pairdiff_total / (n·sum_y) as a
    pinned IEEE double (the standard Gini coefficient for non-negative
    data; null when sum_y <= 0 or n < 2). O(n log n), never the
    quadratic pair expansion.

    Scale shape: ONE hash(key) shuffle, per-partition sort + reduceat
    segment reductions. Bound: ranks ≤ n per key, so Σ(2i−n−1)·x stays
    within int64 for n·max|x| up to ~4e18.

    SQL restatement: ``row_number()`` ranks + the same closed form."""
    from ..arrow_utils import col_type, stable_part_codes

    mod = num_partitions * 64

    _add_part = make_add_part(key_col, mod)

    def _gini(g: pa.Table) -> pa.Table:
        kt = col_type(g, key_col)
        empty = pa.table({
            "series_id": pa.array([], kt),
            "n": pa.array([], pa.int64()),
            "sum_y": pa.array([], pa.int64()),
            "pairdiff_total": pa.array([], pa.int64()),
            "gini": pa.array([], pa.float64()),
        })
        if g.num_rows == 0:
            return empty
        t = pa.table({"k": g[key_col],
                      "v": pc.cast(g[val_col], pa.int64())})
        t = t.take(pc.sort_indices(
            t, sort_keys=[("k", "ascending"), ("v", "ascending")]))
        k = t["k"]
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        enc = k.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = len(v)
        heads = np.ones(m, dtype=bool)
        heads[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(heads)
        seg = np.cumsum(heads) - 1
        n = np.diff(np.append(starts, m))
        rank = np.arange(m) - starts[seg] + 1  # 1-based within key
        coef = 2 * rank - n[seg] - 1
        total = np.add.reduceat(coef * v, starts)
        sy = np.add.reduceat(v, starts)
        ok = (sy > 0) & (n >= 2)
        gini = np.where(ok, total / np.where(n * sy == 0, 1, n * sy),
                        np.nan)
        return pa.table({
            "series_id": enc.dictionary.take(pa.array(codes[starts])),
            "n": pa.array(n),
            "sum_y": pa.array(sy),
            "pairdiff_total": pa.array(total),
            "gini": pa.array(np.nan_to_num(gini), pa.float64(),
                             mask=~ok),
        })

    parted = ds.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _gini, batch_format="pyarrow")


def ransac_line(rolled, *, eps: int, anchors: int = 8,
                series_col: str = "series_id", x_col: str = "bucket",
                y_col: str = "sum_y", num_partitions: int = 8):
    """Deterministic RANSAC consensus line fit per series (Fischler &
    Bolles, CACM 1981, with the random sampling replaced by a FIXED
    anchor design so the oracle replays it): candidate lines are all
    pairs of ``anchors`` evenly-rank-spaced points (rank ``floor(i*n/
    anchors)``), a point is an INLIER of candidate ((x1,y1),(x2,y2))
    iff ``|(y - y1)*dx - (x - x1)*dy| <= eps*dx`` (cross-multiplied —
    exact ints, dx > 0 since anchor ranks are distinct and x strictly
    increases), and the winner maximizes inliers with ties to the
    smaller (i, j). Unlike Theil-Sen (rank statistics over all pair
    slopes), this is the consensus-voting paradigm — robust to a
    minority of gross outliers with an explicit inlier band.

    x enters as the 0-based rank within the series (keeps every cross
    product far inside int64: |dy|*n and |y-y1|*n bounds). Output one
    row per series: ``(series_id, n, c_i, c_j, n_inliers)``.

    Scale shape: ONE hash(series) shuffle; per series a single
    vectorized (pairs x n) comparison matrix — pairs = C(anchors, 2)
    is a constant (28 at the default), so the work is O(28n) per
    series with no Python loop over points."""
    from ..arrow_utils import group_codes, make_add_part

    mod = num_partitions * 64
    _add_part = make_add_part(series_col, mod)
    pairs = [(i, j) for i in range(anchors) for j in range(anchors)
             if i < j]

    def _fit(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        s_type = t[series_col].type
        empty = pa.table({series_col: pa.array([], s_type),
                          "n": pa.array([], pa.int64()),
                          "c_i": pa.array([], pa.int64()),
                          "c_j": pa.array([], pa.int64()),
                          "n_inliers": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        t = t.take(pc.sort_indices(t, sort_keys=[
            (series_col, "ascending"), (x_col, "ascending")]))
        sid = t[series_col]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = group_codes(sid)
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        heads = np.ones(len(codes), dtype=bool)
        heads[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(heads)
        ends = np.r_[starts[1:], len(codes)]
        out_rows = {k: [] for k in ("n", "c_i", "c_j", "n_inliers")}
        for f, l in zip(starts, ends):  # series loop (constant pairs)
            ys = y[f:l]
            n = l - f
            xs = np.arange(n, dtype=np.int64)
            ar = np.array([i * n // anchors for i in range(anchors)],
                          dtype=np.int64)
            best = (-1, 0, 0)
            for pi, (i, j) in enumerate(pairs):
                r1, r2 = ar[i], ar[j]
                if r1 == r2:  # short series: ranks collide -> skip
                    continue
                dx = xs[r2] - xs[r1]
                dy = ys[r2] - ys[r1]
                resid = np.abs((ys - ys[r1]) * dx - (xs - xs[r1]) * dy)
                cnt = int((resid <= eps * dx).sum())
                if cnt > best[0]:
                    best = (cnt, i, j)
            if best[0] < 0:  # n too small for two distinct anchors
                best = (n, 0, 0)
            out_rows["n"].append(n)
            out_rows["c_i"].append(best[1])
            out_rows["c_j"].append(best[2])
            out_rows["n_inliers"].append(best[0])
        return pa.table({
            series_col: sid.take(pa.array(starts)),
            "n": pa.array(out_rows["n"], pa.int64()),
            "c_i": pa.array(out_rows["c_i"], pa.int64()),
            "c_j": pa.array(out_rows["c_j"], pa.int64()),
            "n_inliers": pa.array(out_rows["n_inliers"], pa.int64())})

    parted = rolled.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _fit, batch_format="pyarrow")


def radix_select(ds, *, value_col: str, k="median", fanin: int = 2):
    """GLOBAL exact k-th smallest int64 value WITHOUT a sort — the
    classic distributed radix-select: 8 rounds (one per byte, high to
    low) of 256-bucket histograms over the rows still matching the
    resolved prefix; each round is one map pass + a tiny grouped sum,
    and the driver reads exactly 256 counts (bounded) to pick the
    byte branch and shrink k. Order-preserving unsigned mapping
    ``u = v XOR 2^63`` handles negatives. ``k`` is 1-indexed, or
    ``"median"`` for ``(n+1)//2`` resolved from round 1's total.

    Scale note: a full ``ds.sort`` moves every row through an
    all-to-all exchange; this moves NOTHING — 8 streaming passes with
    constant-size exchanges, the right trade at 100 TB for single
    order statistics (sorting remains right when you need the whole
    order). Input is materialized once and re-scanned per round.

    Returns a one-row dataset ``(n, k, value)``."""
    import ray.data as rd

    from .graph import grouped_sum_parts

    sign = np.uint64(1) << np.uint64(63)
    src = ds.materialize()
    prefix = np.uint64(0)
    kk = None if k == "median" else int(k)
    n_total = None
    for byte_i in range(7, -1, -1):
        shift = np.uint64(8 * byte_i)

        def _hist(b: pa.Table, shift=shift, prefix=prefix,
                  byte_i=byte_i) -> pa.Table:
            v = b[value_col].to_numpy(zero_copy_only=False) \
                .astype(np.int64).view(np.uint64) ^ sign
            if byte_i < 7:
                v = v[(v >> (shift + np.uint64(8))) == prefix]
            byte = ((v >> shift) & np.uint64(0xFF)).astype(np.int64)
            cnt = np.bincount(byte, minlength=256)
            return pa.table({"b": pa.array(np.arange(256, dtype=np.int64)),
                             "c": pa.array(cnt.astype(np.int64))})

        rows = grouped_sum_parts(
            src.map_batches(_hist, batch_format="pyarrow"),
            ["b"], [], count_col="c", fanin=fanin).take_all()
        counts = np.zeros(256, dtype=np.int64)
        for r in rows:  # 256 rows: bounded driver read per round
            counts[r["b"]] = r["c"]
        if byte_i == 7:
            n_total = int(counts.sum())
            if kk is None:
                kk = (n_total + 1) // 2
            if not 1 <= kk <= n_total:
                raise ValueError(f"k={kk} outside [1, {n_total}]")
        cum = np.cumsum(counts)
        branch = int(np.searchsorted(cum, kk, side="left"))
        if branch > 0:
            kk -= int(cum[branch - 1])
        prefix = (prefix << np.uint64(8)) | np.uint64(branch)
    value = np.int64(np.uint64(prefix) ^ sign)
    out_k = (n_total + 1) // 2 if k == "median" else int(k)
    return rd.from_items([{"n": n_total, "k": out_k,
                           "value": int(value)}])


def qn_scale(rolled, *, series_col: str = "series_id",
             value_col: str = "sum_y", num_partitions: int = 8):
    """Pairwise-difference robust scale per series (the order statistic
    at the heart of Rousseeuw-Croux Qn): the LOWER MEDIAN of all
    ``n(n-1)/2`` pairwise absolute differences ``|y_i - y_j|`` — a
    breakdown-robust spread estimate that, unlike MAD, needs no
    location estimate first. Exact int64 end to end: the statistic is
    the 0-based ``(m-1)//2``-th smallest element of the difference
    multiset (deterministic under ties), replayed in SQL by a
    within-series cross join + ``row_number``.

    Output per series with n >= 2: ``(series_id, n, m_pairs, qn)``.

    Scale shape: ONE hash(series) shuffle; per series the pairwise
    differences materialize ONCE as a vectorized broadcast and the
    order statistic is ``np.partition`` — O(n^2) memory/time PER
    SERIES by definition (documented: run it on rollup tiers, where n
    is bounded by the retention window, not on raw events)."""
    from ..arrow_utils import group_codes, make_add_part

    mod = num_partitions * 64

    _add_part = make_add_part(series_col, mod)

    def _qn(g: pa.Table) -> pa.Table:
        sid_type = g[series_col].type
        empty = pa.table({"series_id": pa.array([], sid_type),
                          "n": pa.array([], pa.int64()),
                          "m_pairs": pa.array([], pa.int64()),
                          "qn": pa.array([], pa.int64())})
        t = g.drop_columns(["__part"])
        if t.num_rows == 0:
            return empty
        t = t.take(pc.sort_indices(t, sort_keys=[
            (series_col, "ascending")]))
        sid = t[series_col]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = group_codes(sid)
        y = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(y)
        change = np.ones(n, dtype=bool)
        change[1:] = codes[1:] != codes[:-1]
        seg_first = np.flatnonzero(change)
        seg_len = np.diff(np.r_[seg_first, n])
        out = {k: [] for k in ("sid", "n", "m", "q")}
        for si, f0 in enumerate(seg_first):
            m = int(seg_len[si])
            if m < 2:
                continue
            ys = y[f0:f0 + m]
            iu = np.triu_indices(m, k=1)
            diffs = np.abs(ys[iu[0]] - ys[iu[1]])
            mp = len(diffs)
            k = (mp - 1) // 2
            qn = int(np.partition(diffs, k)[k])
            out["sid"].append(sid[int(f0)].as_py())
            out["n"].append(m)
            out["m"].append(mp)
            out["q"].append(qn)
        return pa.table({"series_id": pa.array(out["sid"], sid_type),
                         "n": pa.array(out["n"], pa.int64()),
                         "m_pairs": pa.array(out["m"], pa.int64()),
                         "qn": pa.array(out["q"], pa.int64())})

    parted = rolled.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _qn, batch_format="pyarrow")
