"""Pairwise Pearson correlation between series over aligned time buckets.

Cross-series analytics the reference's single-array kernels cannot
express: given the per-(series, bucket) rollup, compute for every series
pair (s1 < s2) the correlation of their bucket values over the buckets
BOTH series populated (inner-join semantics).

Scale shape (100 TB): the input is the ROLLED-UP tier (|series| x
|buckets| rows, already reduced from raw events by the rollup's partial
combine), pairing is ONE hash(bucket) shuffle and a single vectorized
segment-pair expansion per partition (``_segmented_pairs`` — a Python
step per distinct co-population size, not per bucket), partials collapse
per partition BEFORE the final merge, and the last shuffle carries at
most |series|^2/2 keys of integer sufficient statistics. Pair emission is
quadratic in the number of series co-populating a bucket — the operator
targets metric fleets (10s-1000s of series), not per-user cardinality;
callers with more series filter first.

The correlation itself is derived from integer sufficient statistics
(n, Σx, Σy, Σxy, Σx², Σy²) so any partitioning yields bit-identical
output; the float ``corr`` is one pinned IEEE expression over them.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ..arrow_utils import group_codes, make_add_part

__all__ = ["pairwise_correlation", "lagged_correlation", "autocorrelation",
           "ols_slope", "kendall_pairs", "ar1_fit", "ols_influence"]

_STAT_COLS = ["n", "sum_x", "sum_y", "sum_xy", "sum_xx", "sum_yy"]


def _sum_combine(b: pa.Table) -> pa.Table:
    """Partial-collapse of the pair sufficient statistics (shared by the
    pairwise and lagged correlators): group (s1, s2), sum every stat."""
    from ..arrow_utils import rename_agg

    g = b.group_by(["s1", "s2"]).aggregate(
        [(c, "sum") for c in _STAT_COLS])
    return rename_agg(g, {"s1": "s1", "s2": "s2",
                          **{f"{c}_sum": c for c in _STAT_COLS}})


def _corr_from_stats(t: pa.Table) -> pa.Table:
    """corr = (n·Σxy − Σx·Σy) / sqrt((n·Σxx − Σx²)(n·Σyy − Σy²)), every
    operand cast to float64 FIRST (the SQL oracle's exact expression);
    NULL when either variance is zero."""
    f = {c: t[c].to_numpy(zero_copy_only=False).astype(np.float64)
         for c in _STAT_COLS}
    num = f["n"] * f["sum_xy"] - f["sum_x"] * f["sum_y"]
    vx = f["n"] * f["sum_xx"] - f["sum_x"] * f["sum_x"]
    vy = f["n"] * f["sum_yy"] - f["sum_y"] * f["sum_y"]
    den = np.sqrt(vx * vy)
    with np.errstate(divide="ignore", invalid="ignore"):
        r = num / den
    corr = pa.array(np.where(den > 0, r, np.nan), pa.float64(),
                    mask=~(den > 0))
    return t.append_column("corr", corr)


def pairwise_correlation(rolled, *, series_col: str = "series_id",
                         bucket_col: str = "bucket",
                         value_col: str = "sum_y",
                         num_partitions: int = 8):
    """``rolled`` has ONE row per (series, bucket) with ``value_col``
    (int64). Returns (s1, s2, n, sum_x, sum_y, sum_xy, sum_xx, sum_yy,
    corr) for every co-populated pair with s1 < s2."""
    from ..arrow_utils import rename_agg, stable_part_codes
    from .dedup import _segmented_pairs

    mod = num_partitions * 64

    _add_part = make_add_part(bucket_col, mod)

    def _pair_partials(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        s_type = t[series_col].type
        empty = pa.table({"s1": pa.array([], s_type),
                          "s2": pa.array([], s_type),
                          **{c: pa.array([], pa.int64())
                             for c in _STAT_COLS}})
        if t.num_rows == 0:
            return empty
        t = t.take(pc.sort_indices(t, sort_keys=[
            (bucket_col, "ascending"), (series_col, "ascending")]))
        bkt = t[bucket_col].combine_chunks() if isinstance(
            t[bucket_col], pa.ChunkedArray) else t[bucket_col]
        codes = group_codes(bkt)
        i, j = _segmented_pairs(np.arange(len(codes)), codes, None)
        if len(i) == 0:
            return empty
        sid = t[series_col]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        x, y = v[i], v[j]
        pairs = pa.table({
            "s1": sid.take(pa.array(i)), "s2": sid.take(pa.array(j)),
            "n": pa.array(np.ones(len(i), np.int64)),
            "sum_x": pa.array(x), "sum_y": pa.array(y),
            "sum_xy": pa.array(x * y), "sum_xx": pa.array(x * x),
            "sum_yy": pa.array(y * y),
        })
        # partition-local partial collapse before the tiny final merge
        return _sum_combine(pairs)

    parted = rolled.map_batches(_add_part, batch_format="pyarrow")
    partials = parted.repartition(num_partitions).groupby(
        "__part").map_groups(_pair_partials, batch_format="pyarrow")
    # final tree merge: the key space is <= |series|^2/2 partial rows per
    # partition — one funnel block of sufficient statistics
    merged = partials.repartition(1).map_batches(
        _sum_combine, batch_format="pyarrow")
    return merged.map_batches(_corr_from_stats, batch_format="pyarrow")


def lagged_correlation(rolled, *, lag: int,
                       series_col: str = "series_id",
                       bucket_col: str = "bucket",
                       value_col: str = "sum_y",
                       bucket_step: int = 1,
                       num_partitions: int = 8):
    """Cross-correlation at a bucket lag: for every ORDERED series pair
    (s1 != s2), the Pearson correlation of ``(s1 at bucket t, s2 at
    bucket t + lag*bucket_step)`` over the t where both exist. Output
    ``(s1, s2, lag, n, sufficient stats, corr)``.

    Signed/ordered semantics: ``(s1, s2, lag)`` equals ``(s2, s1, -lag)``
    — one call emits ALL ordered pairs at ONE lag; a lag scan is a loop
    of independent calls (embarrassingly parallel across lags — each lag
    is its own one-shuffle job, the scale-preferred shape over a single
    (2L+1)x-replicated shuffle).

    Scale shape: the y side is re-keyed to ``bucket - lag*step`` map-side,
    both sides union under ONE hash(key) shuffle, and each partition runs
    one sort + a fully vectorized per-bucket cross-pair expansion (x rows
    x y rows; no Python per bucket). Stats/merge/corr identical to
    :func:`pairwise_correlation` (int64 sufficient statistics,
    pinned-IEEE float)."""
    from ..arrow_utils import rename_agg, stable_part_codes

    mod = num_partitions * 64
    shift = lag * bucket_step

    def _tag(side: int):
        def _t(b: pa.Table) -> pa.Table:
            key = pc.cast(b[bucket_col], pa.int64())
            if side == 1:
                key = pc.subtract(key, shift)
            t = pa.table({"__key": key, "__side": pa.array(
                np.full(b.num_rows, side, np.int8)),
                series_col: b[series_col],
                "__v": pc.cast(b[value_col], pa.int64())})
            h = stable_part_codes(t["__key"], None)
            return t.append_column(
                "__part", pa.array((h % np.uint64(mod)).astype(np.int32)))
        return _t

    tagged = rolled.map_batches(_tag(0), batch_format="pyarrow").union(
        rolled.map_batches(_tag(1), batch_format="pyarrow"))

    def _pairs(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        s_type = t[series_col].type
        empty = pa.table({"s1": pa.array([], s_type),
                          "s2": pa.array([], s_type),
                          **{c: pa.array([], pa.int64())
                             for c in _STAT_COLS}})
        if t.num_rows == 0:
            return empty
        t = t.take(pc.sort_indices(t, sort_keys=[
            ("__key", "ascending"), ("__side", "ascending"),
            (series_col, "ascending")]))
        key = t["__key"].to_numpy(zero_copy_only=False).astype(np.int64)
        side = t["__side"].to_numpy(zero_copy_only=False).astype(np.int64)
        heads = np.ones(len(key), dtype=bool)
        heads[1:] = key[1:] != key[:-1]
        seg = np.flatnonzero(heads)
        bounds = np.append(seg, len(key))
        # per segment: x rows (side 0) first, then y rows (side 1)
        cum1 = np.concatenate(([0], np.cumsum(side)))
        n_y = cum1[bounds[1:]] - cum1[seg]
        n_tot = np.diff(bounds)
        n_x = n_tot - n_y
        counts = n_x * n_y
        total = int(counts.sum())
        if total == 0:
            return empty
        live = counts > 0
        x_start = seg[live]
        y_start = (seg + n_x)[live]
        ny = n_y[live]
        cnt = counts[live]
        starts = np.concatenate(([0], np.cumsum(cnt)[:-1]))
        q = np.arange(total) - np.repeat(starts, cnt)
        i = np.repeat(x_start, cnt) + q // np.repeat(ny, cnt)
        j = np.repeat(y_start, cnt) + q % np.repeat(ny, cnt)
        sid = t[series_col]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        a = sid.take(pa.array(i))
        b_ = sid.take(pa.array(j))
        neq = pc.invert(pc.equal(a, b_)).to_numpy(zero_copy_only=False)
        i, j = i[neq], j[neq]
        if len(i) == 0:
            return empty
        v = t["__v"].to_numpy(zero_copy_only=False).astype(np.int64)
        x, y = v[i], v[j]
        pairs = pa.table({
            "s1": sid.take(pa.array(i)), "s2": sid.take(pa.array(j)),
            "n": pa.array(np.ones(len(i), np.int64)),
            "sum_x": pa.array(x), "sum_y": pa.array(y),
            "sum_xy": pa.array(x * y), "sum_xx": pa.array(x * x),
            "sum_yy": pa.array(y * y),
        })
        return _sum_combine(pairs)

    partials = tagged.repartition(num_partitions).groupby(
        "__part").map_groups(_pairs, batch_format="pyarrow")
    merged = partials.repartition(1).map_batches(
        _sum_combine, batch_format="pyarrow")
    merged = merged.map_batches(_corr_from_stats, batch_format="pyarrow")
    return merged.map_batches(
        lambda b: b.append_column(
            "lag", pa.array(np.full(b.num_rows, lag, np.int64))),
        batch_format="pyarrow")


def autocorrelation(rolled, *, lags=(1, 2, 3, 4), window_us: int,
                    series_col: str = "series_id",
                    bucket_col: str = "bucket", value_col: str = "sum_y",
                    num_partitions: int = 8):
    """Per-series autocorrelation function: Pearson corr of
    ``(v at bucket t, v at bucket t + lag*window)`` for each lag, gaps
    excluded (a pair exists only when BOTH buckets are populated — the
    SQL inner-join semantic). Output ``(series_id, lag, n, integer
    sufficient stats, corr)``; series with no aligned pair at a lag emit
    no row for it.

    Scale shape: ONE hash(series) shuffle, then each partition sorts
    once and matches EVERY series' lagged pairs for ALL lags via
    searchsorted on a composite (series-code << 32 | bucket-index) key —
    no self-join exchange, no per-series Python. Stats accumulate in
    int64 via ``np.add.at`` (bit-exact, order-independent); the float
    ``corr`` is the same pinned IEEE expression as
    :func:`pairwise_correlation`."""
    from ..arrow_utils import stable_part_codes

    lags = [int(x) for x in lags]
    if not lags or min(lags) < 1:
        raise ValueError(f"lags must be positive, got {lags}")
    mod = num_partitions * 64

    _add_part = make_add_part(series_col, mod)

    def _acf(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        s_type = t[series_col].type
        empty = {series_col: pa.array([], s_type),
                 "lag": pa.array([], pa.int64()),
                 **{c: pa.array([], pa.int64()) for c in _STAT_COLS}}
        if t.num_rows == 0:
            return pa.table(empty)
        t = t.take(pc.sort_indices(t, sort_keys=[
            (series_col, "ascending"), (bucket_col, "ascending")]))
        sid = t[series_col]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        d = sid.dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniq = d.dictionary
        k = len(uniq)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bidx = (t[bucket_col].to_numpy(zero_copy_only=False)
                .astype(np.int64) // window_us)
        # composite sort key codes*span + bidx with span sized from the
        # partition's ACTUAL bucket range (a fixed 32-bit shift silently
        # wraps for epoch-us buckets at sub-second windows, breaking the
        # searchsorted precondition); rebasing to min keeps bidx small
        # and handles pre-epoch x. Loud guard instead of silent wrap.
        bidx -= bidx.min()
        span = np.int64(int(bidx.max()) + max(lags) + 1)
        if k * int(span) >= 2 ** 63:
            raise OverflowError(
                "autocorrelation: series x bucket-range composite key "
                f"exceeds int64 (k={k}, span={int(span)}) — use a larger "
                "window_us or fewer series per partition")
        c = codes * span + bidx
        n = len(c)
        out_series, out_lag = [], []
        stats = {sc: [] for sc in _STAT_COLS}
        for lag in lags:
            tgt = c + np.int64(lag)
            pos = np.searchsorted(c, tgt)
            posc = np.minimum(pos, n - 1)
            m = (pos < n) & (c[posc] == tgt)
            if not m.any():
                continue
            x = v[m]
            y = v[posc[m]]
            s = codes[m]
            acc = {sc: np.zeros(k, np.int64) for sc in _STAT_COLS}
            np.add.at(acc["n"], s, 1)
            np.add.at(acc["sum_x"], s, x)
            np.add.at(acc["sum_y"], s, y)
            np.add.at(acc["sum_xy"], s, x * y)
            np.add.at(acc["sum_xx"], s, x * x)
            np.add.at(acc["sum_yy"], s, y * y)
            present = np.flatnonzero(acc["n"] > 0)
            out_series.append(uniq.take(pa.array(present)))
            out_lag.append(np.full(len(present), lag, np.int64))
            for sc in _STAT_COLS:
                stats[sc].append(acc[sc][present])
        if not out_series:
            return pa.table(empty)
        return pa.table({
            series_col: pa.concat_arrays(out_series),
            "lag": pa.array(np.concatenate(out_lag)),
            **{sc: pa.array(np.concatenate(stats[sc]))
               for sc in _STAT_COLS}})

    parted = rolled.map_batches(_add_part, batch_format="pyarrow")
    merged = parted.repartition(num_partitions).groupby("__part").map_groups(
        _acf, batch_format="pyarrow")
    return merged.map_batches(_corr_from_stats, batch_format="pyarrow")


def ols_slope(ds, window_us: int, *, series_col: str = "series_id",
              x_col: str = "x", y_col: str = "y", fanin: int = 8):
    """Per-(series, bucket) ordinary-least-squares trend slope in EXACT
    rational form: with t = whole seconds since the bucket start and y
    integer, emit ``slope_num = n·Σty − Σt·Σy`` and ``slope_den =
    n·Σt² − (Σt)²`` (slope = num/den, also emitted as a pinned-IEEE
    double, null when the bucket has < 2 rows or zero t variance).
    Integer sufficient statistics make the result bit-identical under
    any partitioning; bounds: t < window seconds, so Σt² stays within
    int64 for windows up to days at millions of rows per bucket.

    Scale shape: a pure mergeable aggregation — map-side partial sums
    per (series, bucket) inside each block, then the standard hashpart
    grouped sum (``graph.grouped_sum_parts``); no sort, ONE shuffle of
    constant-width partials.

    SQL restatement: the same five integer sums + the same final
    expressions."""
    from .graph import grouped_sum_parts

    us = 1_000_000

    def _partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({
                "series_id": pa.array([], b[series_col].type
                                      if series_col in b.column_names
                                      else pa.string()),
                "bucket": pa.array([], pa.int64()),
                "st": pa.array([], pa.int64()),
                "sy": pa.array([], pa.int64()),
                "sty": pa.array([], pa.int64()),
                "stt": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            })
        x = pc.cast(b[x_col], pa.int64()).to_numpy(zero_copy_only=False)
        y = pc.cast(b[y_col], pa.int64()).to_numpy(zero_copy_only=False)
        # rollup.bucketize's floor-bucket convention, on numpy because t
        # needs the array anyway (x >= 0 here: trunc == floor)
        bucket = (x // window_us) * window_us
        t = (x - bucket) // us
        part = pa.table({
            "series_id": b[series_col],
            "bucket": pa.array(bucket),
            "st": pa.array(t),
            "sy": pa.array(y),
            "sty": pa.array(t * y),
            "stt": pa.array(t * t),
            "n": pa.array(np.ones(len(t), dtype=np.int64)),
        })
        from ..arrow_utils import rename_agg

        return rename_agg(
            part.group_by(["series_id", "bucket"]).aggregate(
                [("st", "sum"), ("sy", "sum"), ("sty", "sum"),
                 ("stt", "sum"), ("n", "sum")]),
            {"series_id": "series_id", "bucket": "bucket",
             "st_sum": "st", "sy_sum": "sy", "sty_sum": "sty",
             "stt_sum": "stt", "n_sum": "n"})

    parts = ds.map_batches(_partial, batch_format="pyarrow")
    summed = grouped_sum_parts(parts, ["series_id", "bucket"],
                               ["st", "sy", "sty", "stt", "n"],
                               count_col=None, fanin=fanin)

    def _finalize(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        st = b["st"].to_numpy(zero_copy_only=False).astype(np.int64)
        sy = b["sy"].to_numpy(zero_copy_only=False).astype(np.int64)
        sty = b["sty"].to_numpy(zero_copy_only=False).astype(np.int64)
        stt = b["stt"].to_numpy(zero_copy_only=False).astype(np.int64)
        num = n * sty - st * sy
        den = n * stt - st * st
        ok = den > 0
        slope = np.where(ok, num / np.where(ok, den, 1), np.nan)
        return pa.table({
            "series_id": b["series_id"], "bucket": b["bucket"],
            "n": b["n"],
            "slope_num": pa.array(num), "slope_den": pa.array(den),
            "slope": pa.array(np.nan_to_num(slope), pa.float64(),
                              mask=~ok),
        })

    return summed.map_batches(_finalize, batch_format="pyarrow")


def kendall_pairs(rolled, *, series_col: str = "series_id",
                  bucket_col: str = "bucket", value_col: str = "sum_y",
                  num_partitions: int = 8, block: int = 2048):
    """Kendall tau-b between every co-populated series pair (s1 < s2):
    classify every bucket pair (b_i < b_j) of the pair's aligned values
    by the sign of (dx, dy) — concordant / discordant / x-tie / y-tie /
    both-tie — and derive tau-b from the exact integer counts:

        tau_b = (nc - nd) / sqrt((n0 - n1) * (n0 - n2))

    with ``n0 = n(n-1)/2``, ``n1 = tie_x + tie_xy``, ``n2 = tie_y +
    tie_xy`` (NULL when either factor is zero). Unlike Pearson/Spearman
    (`pairwise_correlation`) the statistic is not a sum of per-bucket
    partials — it needs every bucket PAIR — so the shape is: one
    hash(bucket) shuffle aligns co-populated values (the
    `pairwise_correlation` expansion, values kept), one hash(s1, s2)
    shuffle co-locates each pair's aligned sequence, and the per-pair
    count is a blocked vectorized O(n^2) sign pass (``block`` rows of the
    comparison matrix at a time — O(n * block) peak memory). Quadratic in
    buckets-per-pair BY DEFINITION (so is the SQL replay); callers bound
    n by the tier window (a 1h tier over a month is ~720 buckets ->
    260k comparisons per pair). Exact integer counts make the output
    partitioning-invariant; tau is ONE pinned IEEE expression."""
    from ..arrow_utils import stable_part_codes
    from .dedup import _segmented_pairs

    mod = num_partitions * 64

    _add_part = make_add_part(bucket_col, mod)

    def _pair_rows(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        s_type = t[series_col].type
        empty = pa.table({"s1": pa.array([], s_type),
                          "s2": pa.array([], s_type),
                          "bucket": pa.array([], pa.int64()),
                          "x": pa.array([], pa.int64()),
                          "y": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        t = t.take(pc.sort_indices(t, sort_keys=[
            (bucket_col, "ascending"), (series_col, "ascending")]))
        bkt = t[bucket_col].combine_chunks() if isinstance(
            t[bucket_col], pa.ChunkedArray) else t[bucket_col]
        codes = group_codes(bkt)
        i, j = _segmented_pairs(np.arange(len(codes)), codes, None)
        if len(i) == 0:
            return empty
        sid = t[series_col]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b_np = bkt.to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "s1": sid.take(pa.array(i)), "s2": sid.take(pa.array(j)),
            "bucket": pa.array(b_np[i]),
            "x": pa.array(v[i]), "y": pa.array(v[j])})

    def _add_pair_part(b: pa.Table) -> pa.Table:
        h1 = stable_part_codes(b["s1"], None)
        h2 = stable_part_codes(b["s2"], None)
        h = (h1 * np.uint64(0x9E3779B97F4A7C15)) ^ h2
        return b.append_column(
            "__part", pa.array((h % np.uint64(mod)).astype(np.int32)))

    def _kendall_counts(x: np.ndarray, y: np.ndarray):
        n = len(x)
        idx = np.arange(n)
        nc = nd = tx = ty = txy = 0
        for s in range(0, n, block):
            e = min(s + block, n)
            dx = np.sign(x[s:e, None] - x[None, :])
            dy = np.sign(y[s:e, None] - y[None, :])
            m = idx[None, :] > idx[s:e, None]
            prod = dx * dy
            nc += int(((prod > 0) & m).sum())
            nd += int(((prod < 0) & m).sum())
            tx += int(((dx == 0) & (dy != 0) & m).sum())
            ty += int(((dy == 0) & (dx != 0) & m).sum())
            txy += int(((dx == 0) & (dy == 0) & m).sum())
        return nc, nd, tx, ty, txy

    def _per_pair(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        s_type = t["s1"].type
        out = {"s1": [], "s2": [], "n": [], "nc": [], "nd": [],
               "tie_x": [], "tie_y": [], "tie_xy": []}
        if t.num_rows:
            t = t.take(pc.sort_indices(t, sort_keys=[
                ("s1", "ascending"), ("s2", "ascending"),
                ("bucket", "ascending")]))
            s1 = t["s1"].to_numpy(zero_copy_only=False)
            s2 = t["s2"].to_numpy(zero_copy_only=False)
            x = t["x"].to_numpy(zero_copy_only=False).astype(np.int64)
            y = t["y"].to_numpy(zero_copy_only=False).astype(np.int64)
            heads = np.ones(len(s1), dtype=bool)
            heads[1:] = (s1[1:] != s1[:-1]) | (s2[1:] != s2[:-1])
            seg = np.flatnonzero(heads)
            ends = np.append(seg[1:], len(s1))
            for a, b_ in zip(seg, ends):
                nc, nd, tx, ty, txy = _kendall_counts(x[a:b_], y[a:b_])
                out["s1"].append(s1[a])
                out["s2"].append(s2[a])
                out["n"].append(int(b_ - a))
                out["nc"].append(nc)
                out["nd"].append(nd)
                out["tie_x"].append(tx)
                out["tie_y"].append(ty)
                out["tie_xy"].append(txy)
        res = pa.table({
            "s1": pa.array(out["s1"], s_type),
            "s2": pa.array(out["s2"], s_type),
            **{c: pa.array(out[c], pa.int64())
               for c in ("n", "nc", "nd", "tie_x", "tie_y", "tie_xy")}})
        return res

    def _tau(b: pa.Table) -> pa.Table:
        f = {c: b[c].to_numpy(zero_copy_only=False).astype(np.float64)
             for c in ("n", "nc", "nd", "tie_x", "tie_y", "tie_xy")}
        n0 = f["n"] * (f["n"] - 1.0) / 2.0
        d1 = n0 - (f["tie_x"] + f["tie_xy"])
        d2 = n0 - (f["tie_y"] + f["tie_xy"])
        den = np.sqrt(d1 * d2)
        ok = (d1 > 0) & (d2 > 0)
        with np.errstate(divide="ignore", invalid="ignore"):
            tau = (f["nc"] - f["nd"]) / den
        return b.append_column("tau", pa.array(
            np.where(ok, tau, np.nan), pa.float64(), mask=~ok))

    parted = rolled.map_batches(_add_part, batch_format="pyarrow")
    aligned = parted.repartition(num_partitions).groupby(
        "__part").map_groups(_pair_rows, batch_format="pyarrow")
    paired = aligned.map_batches(_add_pair_part, batch_format="pyarrow")
    counts = paired.repartition(num_partitions).groupby(
        "__part").map_groups(_per_pair, batch_format="pyarrow")
    return counts.map_batches(_tau, batch_format="pyarrow")


def ar1_fit(rolled, *, series_col: str = "series_id",
            order_col: str = "bucket", sum_col: str = "sum_y",
            n_col: str = "n", num_partitions: int = 8):
    """AR(1) fit + one-step forecast per series: OLS of ``y_t`` on
    ``y_{t-1}`` over consecutive points of the ordered series, with
    ``y`` the FLOORED per-bucket mean (``floor(sum/n)`` — integer, so
    the sufficient statistics are exact at any magnitude the per-bucket
    mean can reach; DuckDB replays the floor with the CASE-based sign
    handling the Holt-Winters oracle established).

    Exactness contract: ``(n_pairs, s1, s2, s11, s12)`` are exact int64
    sums over the lagged pairs; ``phi = (n*s12 - s1*s2) / (n*s11 -
    s1*s1)``, ``c = (s2 - phi*s1)/n`` and ``fcst = c + phi*y_last`` are
    pinned IEEE expressions the oracle evaluates with the identical
    tree (int64 -> double casts included). Consecutive means
    CONSECUTIVE IN BUCKET ORDER — gaps are not filled; compose with the
    gapfill stage when AR over a dense grid is wanted.

    Output per series with >= 2 points:
    ``(series_id, n_pairs, s1, s2, s11, s12, y_last, phi, c, fcst)``.

    Scale shape: ONE hash(series) shuffle, then per partition a single
    sort + segment-sliced vectorized sums (per-series Python loop
    bounded by series count; inner math vectorized)."""
    mod = num_partitions * 64

    _add_part = make_add_part(series_col, mod)

    def _ar1(g: pa.Table) -> pa.Table:
        sid_type = g[series_col].type
        empty = pa.table({
            "series_id": pa.array([], sid_type),
            "n_pairs": pa.array([], pa.int64()),
            "s1": pa.array([], pa.int64()),
            "s2": pa.array([], pa.int64()),
            "s11": pa.array([], pa.int64()),
            "s12": pa.array([], pa.int64()),
            "y_last": pa.array([], pa.int64()),
            "phi": pa.array([], pa.float64()),
            "c": pa.array([], pa.float64()),
            "fcst": pa.array([], pa.float64())})
        t = g.drop_columns(["__part"])
        if t.num_rows == 0:
            return empty
        t = t.take(pc.sort_indices(t, sort_keys=[
            (series_col, "ascending"), (order_col, "ascending")]))
        sid = t[series_col]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = group_codes(sid)
        s = t[sum_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = t[n_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = s // cnt  # numpy floor division == mathematical floor
        n = len(y)
        change = np.ones(n, dtype=bool)
        change[1:] = codes[1:] != codes[:-1]
        seg_first = np.flatnonzero(change)
        seg_len = np.diff(np.r_[seg_first, n])
        out = {k: [] for k in ("sid", "np", "s1", "s2", "s11", "s12",
                               "yl", "phi", "c", "f")}
        for si, f0 in enumerate(seg_first):
            m = int(seg_len[si])
            if m < 2:
                continue
            ys = y[f0:f0 + m]
            prev, cur = ys[:-1], ys[1:]
            npair = m - 1
            s1 = int(prev.sum())
            s2 = int(cur.sum())
            s11 = int((prev * prev).sum())
            s12 = int((prev * cur).sum())
            nf = float(npair)
            den = nf * float(s11) - float(s1) * float(s1)
            num = nf * float(s12) - float(s1) * float(s2)
            phi = num / den if den != 0.0 else 0.0
            c = (float(s2) - phi * float(s1)) / nf
            yl = int(ys[-1])
            f = c + phi * float(yl)
            out["sid"].append(sid[int(f0)].as_py())
            out["np"].append(npair)
            out["s1"].append(s1)
            out["s2"].append(s2)
            out["s11"].append(s11)
            out["s12"].append(s12)
            out["yl"].append(yl)
            out["phi"].append(phi)
            out["c"].append(c)
            out["f"].append(f)
        return pa.table({
            "series_id": pa.array(out["sid"], sid_type),
            "n_pairs": pa.array(out["np"], pa.int64()),
            "s1": pa.array(out["s1"], pa.int64()),
            "s2": pa.array(out["s2"], pa.int64()),
            "s11": pa.array(out["s11"], pa.int64()),
            "s12": pa.array(out["s12"], pa.int64()),
            "y_last": pa.array(out["yl"], pa.int64()),
            "phi": pa.array(out["phi"], pa.float64()),
            "c": pa.array(out["c"], pa.float64()),
            "fcst": pa.array(out["f"], pa.float64())})

    parted = rolled.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _ar1, batch_format="pyarrow")


def ols_influence(rolled, *, series_col: str = "series_id",
                  order_col: str = "bucket", value_col: str = "sum_y",
                  step: int, num_partitions: int = 8):
    """Per-point OLS influence diagnostics for each series' linear
    trend fit: residual ``e``, leverage ``h`` and the SCALED Cook
    numerator ``d_scaled = e^2 * h / (1-h)^2`` (the classic Cook's D
    without the s^2/p normalization — a float-sum-free variant, so
    every output is either exact int64 or a pinned IEEE expression of
    exact integer sufficient statistics; documented contract).

    ``t = (bucket - min_bucket) / step`` (exact small integers).
    Degenerate pins replayed by SQL CASE: ``den = n*Stt - St^2 = 0``
    -> slope 0 and ``h = 1/n``; ``h >= 1`` (single point) ->
    ``d_scaled = 0``.

    Output per tier row: ``(series_id, bucket, t, y, e, h, d_scaled)``.

    Scale shape: ONE hash(series) shuffle; per partition one sort, one
    segment pass for the integer stats, then fully vectorized per-row
    float expressions."""
    mod = num_partitions * 64

    _add_part = make_add_part(series_col, mod)

    def _infl(g: pa.Table) -> pa.Table:
        sid_type = g[series_col].type
        empty = pa.table({"series_id": pa.array([], sid_type),
                          "bucket": pa.array([], pa.int64()),
                          "t": pa.array([], pa.int64()),
                          "y": pa.array([], pa.int64()),
                          "e": pa.array([], pa.float64()),
                          "h": pa.array([], pa.float64()),
                          "d_scaled": pa.array([], pa.float64())})
        tb = g.drop_columns(["__part"])
        if tb.num_rows == 0:
            return empty
        tb = tb.take(pc.sort_indices(tb, sort_keys=[
            (series_col, "ascending"), (order_col, "ascending")]))
        sid = tb[series_col]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = group_codes(sid)
        y = tb[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bkt = tb[order_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(y)
        change = np.ones(n, dtype=bool)
        change[1:] = codes[1:] != codes[:-1]
        seg_first = np.flatnonzero(change)
        seg_len = np.diff(np.r_[seg_first, n])
        # per-row t and broadcast per-series integer stats
        base = np.repeat(bkt[seg_first], seg_len)
        t = (bkt - base) // step
        cnt = np.repeat(seg_len, seg_len).astype(np.int64)
        st = np.repeat(np.add.reduceat(t, seg_first), seg_len)
        sy = np.repeat(np.add.reduceat(y, seg_first), seg_len)
        stt = np.repeat(np.add.reduceat(t * t, seg_first), seg_len)
        sty = np.repeat(np.add.reduceat(t * y, seg_first), seg_len)
        den = cnt * stt - st * st
        s_num = cnt * sty - st * sy
        nf = cnt.astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            slope = np.where(den != 0,
                             s_num.astype(np.float64)
                             / den.astype(np.float64), 0.0)
            c = (sy.astype(np.float64) - slope * st.astype(np.float64)) / nf
            e = y.astype(np.float64) - (c + slope * t.astype(np.float64))
            tf = t.astype(np.float64)
            stf = st.astype(np.float64)
            h = np.where(
                den != 0,
                1.0 / nf + ((tf - stf / nf) * (tf - stf / nf)) * nf
                / den.astype(np.float64),
                1.0 / nf)
            d = np.where(h < 1.0,
                         e * e * h / ((1.0 - h) * (1.0 - h)), 0.0)
        return pa.table({
            "series_id": sid,
            "bucket": pa.array(bkt),
            "t": pa.array(t),
            "y": pa.array(y),
            "e": pa.array(e, pa.float64()),
            "h": pa.array(h, pa.float64()),
            "d_scaled": pa.array(d, pa.float64())})

    parted = rolled.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _infl, batch_format="pyarrow")
