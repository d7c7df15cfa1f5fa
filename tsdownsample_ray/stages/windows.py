"""Event-time windowed operators beyond tumbling rollups: sliding (hopping)
windows and session windows.

Ray Data has no event-time window/watermark machinery (ray_guide: treat the
input as an ordered partitioned log), so:

- **sliding**: each row is replicated into its ``window/slide`` member
  windows inside ``map_batches`` (vectorized), then the standard partial ->
  tree-combine rollup machinery aggregates per (series, window_start). The
  replication factor is the shuffle amplification — callers keep
  window/slide small (2-12x), exactly like any hopping-window engine.
- **session**: ONE hash(series) shuffle, then each partition sorts once by
  (series, ts, id) and derives every series' session breaks vectorized
  (gap > ``gap_us`` OR series boundary), cumulative-sums them into session
  ids and aggregates — one call per partition, not per series. Ordering
  assumption: one series fits one partition (the engine's standard
  per-series contract).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..arrow_utils import col_type, rename_agg, make_add_part
from .rollup import _arrow_combine, _combine
from ..arrow_utils import group_codes

__all__ = ["sliding_rollup", "sessionize", "rolling_stats",
           "rolling_median", "detect_anomalies", "session_paths"]


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
        # rollup.bucketize's floor-bucket convention, on numpy because
        # step 2 needs the array anyway (x >= 0 here: trunc == floor)
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
               x_col: str = "x", id_col: str | None = None,
               num_partitions: int = 16):
    """Session windows: consecutive events of one series belong to the same
    session while the inter-event gap is <= gap_us. Output one row per
    session: (series_id, session_start, session_end, n_events).

    Scale shape: ONE hash(series) shuffle (dense part space, bounded
    reducers), then each partition sorts once by (series, x[, id]) and
    derives EVERY series' session breaks in one vectorized pass (a series
    boundary is itself a break) — one call per partition, not one
    ``map_groups`` round-trip per series. Assumes one series' rows fit a
    partition (the engine's standard per-series contract)."""
    from ..arrow_utils import stable_part_codes

    mod = num_partitions * 64

    _add_part = make_add_part(series_col, mod)

    def _sessions(g: pa.Table) -> pa.Table:
        sid_type = g[series_col].type
        if g.num_rows == 0:
            return pa.table({
                "series_id": pa.array([], sid_type),
                "session_start": pa.array([], pa.int64()),
                "session_end": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
            })
        keys = ([(series_col, "ascending"), (x_col, "ascending")]
                + ([(id_col, "ascending")] if id_col else []))
        g = g.take(pc.sort_indices(g, sort_keys=keys))
        sid = g[series_col]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = group_codes(sid)
        x = g[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        brk = np.ones(len(x), dtype=np.int64)
        brk[1:] = ((codes[1:] != codes[:-1])
                   | (x[1:] - x[:-1] > gap_us)).astype(np.int64)
        sess = np.cumsum(brk)  # unique per (series, session) by construction
        t = pa.table({"sess": pa.array(sess), "x": pa.array(x),
                      "row": pa.array(np.arange(len(x)))})
        agg = t.group_by(["sess"]).aggregate(
            [("x", "min"), ("x", "max"), ("x", "count"), ("row", "min")])
        agg = rename_agg(agg, {"sess": "sess", "x_min": "session_start",
                               "x_max": "session_end",
                               "x_count": "n_events", "row_min": "row"})
        first_rows = agg["row"]
        return pa.table({
            "series_id": sid.take(first_rows),
            "session_start": agg["session_start"],
            "session_end": agg["session_end"],
            "n_events": pc.cast(agg["n_events"], pa.int64()),
        })

    parted = ds.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _sessions, batch_format="pyarrow")


def rolling_stats(ds, k: int, *, series_col: str = "series_id",
                  x_col: str = "x", y_col: str = "y",
                  id_col: str | None = None, num_partitions: int = 16):
    """Per-row trailing-window stats over each series: min/max/sum/count/
    mean of the last ``k`` rows (the current row and up to k-1 preceding,
    clipped at the series start) ordered by (x[, id]) — the SQL
    ``ROWS BETWEEN k-1 PRECEDING AND CURRENT ROW`` window, per series.

    Scale shape (same contract as :func:`sessionize`): ONE hash(series)
    shuffle, then each partition sorts once and computes EVERY series'
    windows in one vectorized pass — rolling sums from one cumsum
    difference, rolling min/max from k-1 shifted elementwise min/max with
    series-boundary masking (O(n*k) vectorized; callers keep k modest,
    which is what trailing-stat windows are). ``y`` must be int64 (exact
    sums — the engine's integer-cents convention) so results are
    bit-identical to any evaluation order."""
    from ..arrow_utils import stable_part_codes

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    mod = num_partitions * 64

    _add_part = make_add_part(series_col, mod)

    out_schema_tail = [("roll_min", pa.int64()), ("roll_max", pa.int64()),
                       ("roll_sum", pa.int64()), ("roll_n", pa.int64()),
                       ("roll_mean", pa.float64())]

    def _roll(g: pa.Table) -> pa.Table:
        cols = ([series_col, x_col] + ([id_col] if id_col else [])
                + [y_col])
        if g.num_rows == 0:
            return pa.table({c: pa.array([], g[c].type) for c in cols[:-1]}
                            | {n: pa.array([], t) for n, t in out_schema_tail})
        keys = ([(series_col, "ascending"), (x_col, "ascending")]
                + ([(id_col, "ascending")] if id_col else []))
        g = g.take(pc.sort_indices(g, sort_keys=keys))
        sid = g[series_col]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = group_codes(sid)
        y = g[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(y)
        i = np.arange(n)
        brk = np.ones(n, dtype=bool)
        brk[1:] = codes[1:] != codes[:-1]
        ser_start = np.maximum.accumulate(np.where(brk, i, 0))
        win_start = np.maximum(i - (k - 1), ser_start)
        cs = np.concatenate([[0], np.cumsum(y)])
        roll_sum = cs[i + 1] - cs[win_start]
        roll_n = i - win_start + 1
        roll_min = y.copy()
        roll_max = y.copy()
        for j in range(1, k):
            src = np.maximum(i - j, 0)
            valid = i - j >= win_start
            yj = y[src]
            roll_min = np.where(valid, np.minimum(roll_min, yj), roll_min)
            roll_max = np.where(valid, np.maximum(roll_max, yj), roll_max)
        out = {c: g[c] for c in cols[:-1]}
        out["roll_min"] = pa.array(roll_min)
        out["roll_max"] = pa.array(roll_max)
        out["roll_sum"] = pa.array(roll_sum)
        out["roll_n"] = pa.array(roll_n)
        out["roll_mean"] = pa.array(roll_sum.astype(np.float64) / roll_n)
        return pa.table(out)

    parted = ds.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _roll, batch_format="pyarrow")


def rolling_median(rolled, k: int, *, series_col: str = "series_id",
                   order_col: str = "bucket", value_col: str = "sum_y",
                   num_partitions: int = 8):
    """Per-row trailing-window DISCRETE median over each series: the
    element at sorted index ``(w-1)//2`` of the window of up to ``k``
    trailing rows (current row + k-1 preceding, clipped at the series
    start) ordered by ``order_col`` — exactly SQL's
    ``quantile_disc(v, 0.5) OVER (... ROWS k-1 PRECEDING)``. The
    order-statistic companion to :func:`rolling_stats` (min/max/sum are
    not robust to spikes; a sliding median is the classic despike
    filter for telemetry).

    Scale shape: ONE hash(series) shuffle, then each partition sorts
    once and computes EVERY series' windows in one vectorized pass — an
    (n, k) trailing-window gather with +inf sentinels for out-of-window
    slots, one ``np.sort(axis=1)`` (O(n k log k), k modest by contract).
    All integer: the discrete median of int64 values is an element, so
    results are bit-identical to any evaluation order.

    No counterpart in the reference (kernel library only); standard
    continuous-aggregate engine surface.
    """
    from ..arrow_utils import stable_part_codes

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    mod = num_partitions * 64

    _add_part = make_add_part(series_col, mod)

    def _med(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        s_type = t[series_col].type
        if t.num_rows == 0:
            return pa.table({"series_id": pa.array([], s_type),
                             "bucket": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64()),
                             "roll_med": pa.array([], pa.int64()),
                             "roll_w": pa.array([], pa.int64())})
        t = t.take(pc.sort_indices(t, sort_keys=[
            (series_col, "ascending"), (order_col, "ascending")]))
        sid = t[series_col]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = group_codes(sid)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bkt = t[order_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(v)
        i = np.arange(n)
        brk = np.ones(n, dtype=bool)
        brk[1:] = codes[1:] != codes[:-1]
        ser_start = np.maximum.accumulate(np.where(brk, i, 0))
        win_start = np.maximum(i - (k - 1), ser_start)
        w = i - win_start + 1
        idx = i[:, None] - np.arange(k)[None, :]
        in_win = idx >= win_start[:, None]
        M = v[np.maximum(idx, 0)]
        M[~in_win] = np.iinfo(np.int64).max  # sentinel sorts last
        M.sort(axis=1)
        med = M[i, (w - 1) // 2]
        return pa.table({"series_id": sid, "bucket": pa.array(bkt),
                         "v": pa.array(v), "roll_med": pa.array(med),
                         "roll_w": pa.array(w)})

    parted = rolled.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _med, batch_format="pyarrow")


def detect_anomalies(ds, k: int, t: int, *, series_col: str = "series_id",
                     x_col: str = "x", y_col: str = "y",
                     id_col: str | None = None, min_ref: int = 2,
                     num_partitions: int = 16):
    """Per-row z-score anomaly flags against the TRAILING reference
    window of the k preceding rows (current row excluded, clipped at the
    series start): flag when ``|y - mean_ref| > t * std_ref``.

    The comparison is done ENTIRELY in integer arithmetic — with
    ``s = sum(ref)``, ``q = sum(ref^2)``, ``n = |ref|``:

        |y - s/n| > t * sqrt((n*q - s^2) / n^2)
        <=>  (n*y - s)^2  >  t^2 * (n*q - s^2)

    so the flag is EXACT (no float sqrt/division anywhere) and therefore
    SQL-hash-verifiable bit for bit. ``y`` must be int64 (integer-cents
    convention); ``t`` is an integer multiplier. Rows with fewer than
    ``min_ref`` reference points are never flagged.

    Same scale shape as :func:`rolling_stats`: one hash(series) shuffle,
    one vectorized pass per partition (two cumsums)."""
    from ..arrow_utils import stable_part_codes

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    mod = num_partitions * 64

    _add_part = make_add_part(series_col, mod)

    tail = [("ref_n", pa.int64()), ("ref_sum", pa.int64()),
            ("ref_sumsq", pa.int64()), ("is_anomaly", pa.bool_())]

    def _flag(g: pa.Table) -> pa.Table:
        cols = ([series_col, x_col] + ([id_col] if id_col else [])
                + [y_col])
        if g.num_rows == 0:
            return pa.table({c: pa.array([], g[c].type) for c in cols}
                            | {n: pa.array([], tp) for n, tp in tail})
        keys = ([(series_col, "ascending"), (x_col, "ascending")]
                + ([(id_col, "ascending")] if id_col else []))
        g = g.take(pc.sort_indices(g, sort_keys=keys))
        sid = g[series_col]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = group_codes(sid)
        y = g[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(y)
        # loud exactness guard (Python-int arithmetic, no wrap): the
        # squared test needs (2kY)^2 and t^2*2(kY)^2 in int64, and the
        # y*y cumsum needs n*Y^2 — numpy would wrap SILENTLY past these
        Y = int(np.abs(y).max()) if n else 0
        if (n * Y * Y >= 2 ** 63
                or 2 * (k * Y) ** 2 * max(t * t, 2) >= 2 ** 63):
            raise OverflowError(
                "detect_anomalies: |y| too large for the exact int64 "
                f"z-test (max|y|={Y}, k={k}, t={t}) — rescale y or "
                "shrink k/t")
        i = np.arange(n)
        brk = np.ones(n, dtype=bool)
        brk[1:] = codes[1:] != codes[:-1]
        ser_start = np.maximum.accumulate(np.where(brk, i, 0))
        # reference window [max(i-k, ser_start), i) — current row excluded
        ref_start = np.maximum(i - k, ser_start)
        cs = np.concatenate([[0], np.cumsum(y)])
        cq = np.concatenate([[0], np.cumsum(y * y)])  # guarded above
        s = cs[i] - cs[ref_start]
        q = cq[i] - cq[ref_start]
        rn = i - ref_start
        # exact integer z-test: (n*y - s)^2 > t^2 * (n*q - s^2)
        lhs = (rn * y - s) ** 2
        rhs = (t * t) * (rn * q - s * s)
        flag = (rn >= min_ref) & (lhs > rhs)
        out = {c: g[c] for c in cols}
        out["ref_n"] = pa.array(rn)
        out["ref_sum"] = pa.array(s)
        out["ref_sumsq"] = pa.array(q)
        out["is_anomaly"] = pa.array(flag)
        return pa.table(out)

    parted = ds.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _flag, batch_format="pyarrow")


def sliding_distinct(ds, *, window: int = 7, series_col: str = "series_id",
                     user_col: str = "user_id", day_col: str = "day",
                     num_partitions: int = 16):
    """Trailing-window distinct actives (sliding MAU/WAU): for every
    (series, day) emit the number of DISTINCT users seen in the trailing
    ``window`` days ``[day - window + 1, day]`` — only days with at
    least one active user appear (inner semantics).

    The naive form re-counts a set per day; this is exact without any
    per-day set: a user seen on day d is active for the window-long span
    ``[d, d + window)``, so per (series, user) the seen-days merge into
    coverage islands (gap > window breaks), each island contributes
    ``+1`` at its start and ``-1`` past its end, and the per-(series,
    day) active count is the running sum of those deltas — the
    ``intervals.py`` reset-free sweep idea, aggregated at day
    granularity and exploded back to the covered days.

    Scale shape: TWO bounded shuffles — hash(series, user) for the
    per-user island merge (each user's days sit together; one sorted
    vectorized pass per partition), then hash(series) of the ±1 deltas
    (2 rows per island, << input) for the day cumsum + explode. No
    per-day distinct set, no driver materialization.

    SQL restatement: DISTINCT (series, user, day) + a day grid +
    ``count(DISTINCT u)`` over the trailing-window join."""
    from ..arrow_utils import stable_part_codes

    mod = num_partitions * 64
    w = int(window)

    def _part_su(b: pa.Table) -> pa.Table:
        h = stable_part_codes(b[series_col], None)
        h2 = stable_part_codes(b[user_col], None)
        mix = (h * np.uint64(0x9E3779B97F4A7C15)) ^ h2
        return b.append_column(
            "__part", pa.array((mix % np.uint64(mod)).astype(np.int32)))

    def _deltas(g: pa.Table) -> pa.Table:
        st = col_type(g, series_col)
        empty = pa.table({
            "series_id": pa.array([], st),
            "day": pa.array([], pa.int64()),
            "delta": pa.array([], pa.int64()),
        })
        if g.num_rows == 0:
            return empty
        t = pa.table({"s": g[series_col],
                      "u": pc.cast(g[user_col], pa.int64()),
                      "d": pc.cast(g[day_col], pa.int64())})
        # distinct (series, user, day), sorted by (series, user, day)
        t = t.group_by(["s", "u", "d"]).aggregate([])
        t = t.take(pc.sort_indices(t, sort_keys=[
            ("s", "ascending"), ("u", "ascending"), ("d", "ascending")]))
        s = t["s"]
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        enc = s.dictionary_encode()
        sc = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        u = t["u"].to_numpy(zero_copy_only=False)
        d = t["d"].to_numpy(zero_copy_only=False)
        n = len(d)
        # island break: new (series, user) OR day gap > window
        brk = np.ones(n, dtype=bool)
        brk[1:] = ((sc[1:] != sc[:-1]) | (u[1:] != u[:-1])
                   | (d[1:] - d[:-1] > w))
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], n) - 1
        isl_start = d[starts]               # +1 at first covered day
        isl_end = d[ends] + w               # -1 past the last covered day
        sid_idx = sc[starts]
        return pa.table({
            "series_id": enc.dictionary.take(
                pa.array(np.concatenate([sid_idx, sid_idx]))),
            "day": pa.array(np.concatenate([isl_start, isl_end])),
            "delta": pa.array(np.concatenate([
                np.ones(len(starts), dtype=np.int64),
                np.full(len(starts), -1, dtype=np.int64)])),
        })

    def _part_s(b: pa.Table) -> pa.Table:
        h = stable_part_codes(b["series_id"], None)
        return b.append_column(
            "__part", pa.array((h % np.uint64(mod)).astype(np.int32)))

    def _sweep(g: pa.Table) -> pa.Table:
        st = col_type(g, "series_id")
        empty = pa.table({
            "series_id": pa.array([], st),
            "day": pa.array([], pa.int64()),
            "active_users": pa.array([], pa.int64()),
        })
        if g.num_rows == 0:
            return empty
        # collapse deltas per (series, day), then sweep each series
        t = pa.table({"s": g["series_id"],
                      "d": pc.cast(g["day"], pa.int64()),
                      "x": pc.cast(g["delta"], pa.int64())})
        t = t.group_by(["s", "d"]).aggregate([("x", "sum")])
        t = t.take(pc.sort_indices(t, sort_keys=[
            ("s", "ascending"), ("d", "ascending")]))
        s = t["s"]
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        enc = s.dictionary_encode()
        sc = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["d"].to_numpy(zero_copy_only=False)
        x = t["x_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(d)
        heads = np.ones(n, dtype=bool)
        heads[1:] = sc[1:] != sc[:-1]
        # per-series deltas net to zero -> the global cumsum IS the
        # per-series running count (intervals.py discipline)
        count = np.cumsum(x)
        # run [d_i, d_{i+1}) has `count[i]` actives; last run of each
        # series has count 0 (all islands closed)
        nxt = np.empty(n, dtype=np.int64)
        nxt[:-1] = d[1:]
        nxt[-1] = d[-1]
        last = np.zeros(n, dtype=bool)
        last[:-1] = heads[1:]
        last[-1] = True
        run_len = np.where(last, 0, nxt - d)
        live = (count > 0) & (run_len > 0)
        reps = np.where(live, run_len, 0)
        idx = np.repeat(np.arange(n), reps)
        total = int(reps.sum())
        run_starts = np.cumsum(reps) - reps
        days = d[idx] + (np.arange(total) - run_starts[idx])
        return pa.table({
            "series_id": enc.dictionary.take(pa.array(sc[idx])),
            "day": pa.array(days),
            "active_users": pa.array(count[idx]),
        })

    parted = ds.map_batches(_part_su, batch_format="pyarrow")
    deltas = parted.repartition(num_partitions).groupby(
        "__part").map_groups(_deltas, batch_format="pyarrow")
    parted2 = deltas.map_batches(_part_s, batch_format="pyarrow")
    return parted2.repartition(num_partitions).groupby(
        "__part").map_groups(_sweep, batch_format="pyarrow")


def session_paths(ds, gap_us: int, k: int, *, series_col: str = "series_id",
                  x_col: str = "x", type_col: str = "event_type",
                  id_col: str | None = None, top: int = 10,
                  num_partitions: int = 16, fanin: int = 4):
    """Clickstream path mining: the ``top`` most frequent session-opening
    paths — each session's first ``k`` event types (time order) joined
    with ``>``. The funnel-discovery companion to :func:`sessionize`.

    Scale shape: ONE hash(series) shuffle; each partition derives every
    session's break mask, in-session positions and the capped path
    strings in one vectorized pass (ListArray offsets over the sorted
    type column + ``pc.binary_join``), collapsing immediately to
    (path, cnt) partials — paths are ≤ k types, so partials are
    vocabulary-sized, not session-sized. One hash(path) grouped sum, a
    bounded ``sort().limit(top)`` funnel."""
    import numpy as np

    from ..arrow_utils import stable_part_codes
    from .graph import grouped_sum_parts

    mod = num_partitions * 64

    _add_part = make_add_part(series_col, mod)

    sort_keys = [(series_col, "ascending"), (x_col, "ascending")]
    if id_col is not None:
        sort_keys.append((id_col, "ascending"))

    def _paths(g: pa.Table) -> pa.Table:
        empty = pa.table({"path": pa.array([], pa.string()),
                          "cnt": pa.array([], pa.int64())})
        t = g.drop_columns(["__part"])
        if t.num_rows == 0:
            return empty
        t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
        sid = t[series_col]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = group_codes(sid)
        x = t[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(codes)
        brk = np.ones(n, dtype=bool)
        brk[1:] = (codes[1:] != codes[:-1]) | (x[1:] - x[:-1] > gap_us)
        sess = np.cumsum(brk) - 1
        sess_first = np.flatnonzero(brk)
        pos = np.arange(n) - sess_first[sess]
        keep = pos < k
        types = t[type_col]
        if isinstance(types, pa.ChunkedArray):
            types = types.combine_chunks()
        kept = types.filter(pa.array(keep))
        # kept rows are already (session, time) ordered; sessions are
        # contiguous -> list offsets from per-session kept counts
        cnts = np.bincount(sess[keep], minlength=len(sess_first))
        off = pa.array(np.r_[0, np.cumsum(cnts)].astype(np.int32))
        paths = pc.binary_join(pa.ListArray.from_arrays(off, kept), ">")
        enc = paths.dictionary_encode()
        pc_codes = enc.indices.to_numpy(zero_copy_only=False).astype(
            np.int64)
        agg = np.bincount(pc_codes, minlength=len(enc.dictionary))
        return pa.table({"path": enc.dictionary,
                         "cnt": pa.array(agg.astype(np.int64))})

    parted = ds.map_batches(_add_part, batch_format="pyarrow")
    partials = parted.repartition(num_partitions).groupby(
        "__part").map_groups(_paths, batch_format="pyarrow")
    summed = grouped_sum_parts(partials, ["path"], ["cnt"],
                               count_col=None, fanin=fanin)
    topt = (summed.sort(key=["cnt", "path"], descending=[True, False])
            .limit(top).to_pandas())
    topt["rank"] = np.arange(1, len(topt) + 1, dtype=np.int64)
    return topt
