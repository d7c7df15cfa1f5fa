"""Counter rate / increase over windowed series (PromQL-style ``rate()``
with counter-reset handling).

No counterpart in the reference; core TSDB operator for monotone counters
(bytes served, requests). Definition (restated exactly by the SQL
oracle): per series ordered by (x, tiebreak), each point after the first
contributes ``y - prev`` when ``y >= prev`` and ``y`` on a counter reset
(``y < prev`` — the counter restarted from ~0, so the whole new value is
growth); the per-window ``increase`` is the sum of contributions whose x
falls in the window, and ``rate = increase / window_seconds``.

Scale shape: needs each point's PREDECESSOR across block and window
boundaries, so a series must be co-located: ONE hash(series) shuffle
(dense part space, bounded reducers), then each partition sorts once and
computes every series' lags, resets and per-window sums vectorized — no
per-series Python round-trip. Partitioning assumption (documented): one
series' rows fit one partition, the same contract as the per-series
downsample path."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .rollup import bucketize
from ..arrow_utils import group_codes, make_add_part

__all__ = ["counter_rate", "threshold_crossings", "series_diffs",
           "cusum", "gap_profile", "hysteresis_alerts",
           "amoc_changepoint", "pettitt_test", "spc_rules"]


def counter_rate(ds, window_us: int, *, series_col: str = "series_id",
                 x_col: str = "x", y_col: str = "y",
                 tiebreak_col: str | None = None,
                 num_partitions: int = 16):
    """series rows -> ``(series_id, bucket, increase, n_incr, rate)``.

    ``tiebreak_col`` breaks equal-x ordering deterministically (pass the
    event id when x can collide — the oracle must order identically)."""
    from ..arrow_utils import stable_part_codes

    mod = num_partitions * 64

    _add_part = make_add_part(series_col, mod)

    sort_keys = [(series_col, "ascending"), (x_col, "ascending")]
    if tiebreak_col is not None:
        sort_keys.append((tiebreak_col, "ascending"))

    def _rate(g: pa.Table) -> pa.Table:
        sid_type = g[series_col].type
        empty = pa.table({
            "series_id": pa.array([], sid_type),
            "bucket": pa.array([], pa.int64()),
            "increase": pa.array([], pa.int64()),
            "n_incr": pa.array([], pa.int64()),
            "rate": pa.array([], pa.float64()),
        })
        if g.num_rows == 0:
            return empty
        t = g.take(pc.sort_indices(g, sort_keys=sort_keys))
        sid = t[series_col]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = group_codes(sid)
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        x = t[x_col]
        if isinstance(x, pa.ChunkedArray):
            x = x.combine_chunks()
        n = len(y)
        prev = np.empty(n, dtype=np.int64)
        prev[1:] = y[:-1]
        prev[0] = 0
        first = np.ones(n, dtype=bool)
        first[1:] = codes[1:] != codes[:-1]
        inc = np.where(y >= prev, y - prev, y)  # reset -> full new value
        keep = ~first
        if not keep.any():
            return empty
        ki = np.flatnonzero(keep)
        sel = pa.array(ki)
        part = pa.table({
            "series_id": sid.take(sel),
            "bucket": bucketize(x, window_us).take(sel),
            "inc": pa.array(inc[ki], pa.int64()),
        })
        m = part.group_by(["series_id", "bucket"]).aggregate(
            [("inc", "sum"), ("inc", "count")])
        from ..arrow_utils import rename_agg

        m = rename_agg(m, {"series_id": "series_id", "bucket": "bucket",
                           "inc_sum": "increase", "inc_count": "n_incr"})
        rate = pc.divide(pc.cast(m["increase"], pa.float64()),
                         window_us / 1e6)
        return m.append_column("rate", rate)

    parted = ds.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _rate, batch_format="pyarrow")


def threshold_crossings(ds, threshold: int, *, series_col: str = "series_id",
                        x_col: str = "x", y_col: str = "y",
                        tiebreak_col: str | None = None,
                        num_partitions: int = 16):
    """Alerting primitive: emit one row per threshold CROSSING of each
    series — ``direction = 1`` where ``prev < T <= y`` (up-cross, the
    alert fires), ``-1`` where ``prev >= T > y`` (recovery). The first
    point of a series has no predecessor and never fires.

    Same scale shape as :func:`counter_rate` (the predecessor must be
    visible across block boundaries): ONE hash(series) shuffle, one
    sorted vectorized pass per partition. Output:
    ``(series_id, x, y, direction)``."""
    from ..arrow_utils import stable_part_codes

    mod = num_partitions * 64
    T = int(threshold)

    _add_part = make_add_part(series_col, mod)

    sort_keys = [(series_col, "ascending"), (x_col, "ascending")]
    if tiebreak_col is not None:
        sort_keys.append((tiebreak_col, "ascending"))

    def _cross(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        sid_type = t[series_col].type
        empty = pa.table({"series_id": pa.array([], sid_type),
                          "x": pa.array([], pa.int64()),
                          "y": pa.array([], pa.int64()),
                          "direction": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
        sid = t[series_col]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = group_codes(sid)
        x = t[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        same = codes[1:] == codes[:-1] if len(codes) > 1 else np.empty(0, bool)
        up = same & (y[:-1] < T) & (y[1:] >= T)
        dn = same & (y[:-1] >= T) & (y[1:] < T)
        idx = np.flatnonzero(up | dn) + 1
        if len(idx) == 0:
            return empty
        direction = np.where(up[idx - 1], 1, -1).astype(np.int64)
        return pa.table({"series_id": sid.take(pa.array(idx)),
                         "x": pa.array(x[idx]),
                         "y": pa.array(y[idx]),
                         "direction": pa.array(direction)})

    parted = ds.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _cross, batch_format="pyarrow")


def series_diffs(ds, *, series_col: str = "series_id", x_col: str = "x",
                 tiebreak_col: str | None = None,
                 num_partitions: int = 16):
    """Consecutive inter-arrival deltas per series:
    ``(series_id, x, delta)`` for every point after the first (delta =
    x - prev_x >= 0). Same one-shuffle sorted-pass shape as
    :func:`counter_rate`."""
    from ..arrow_utils import stable_part_codes

    mod = num_partitions * 64

    _add_part = make_add_part(series_col, mod)

    sort_keys = [(series_col, "ascending"), (x_col, "ascending")]
    if tiebreak_col is not None:
        sort_keys.append((tiebreak_col, "ascending"))

    def _diff(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        sid_type = t[series_col].type
        empty = pa.table({"series_id": pa.array([], sid_type),
                          "x": pa.array([], pa.int64()),
                          "delta": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
        sid = t[series_col]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = group_codes(sid)
        x = t[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        same = codes[1:] == codes[:-1] if len(codes) > 1 else np.empty(0, bool)
        idx = np.flatnonzero(same) + 1
        if len(idx) == 0:
            return empty
        return pa.table({"series_id": sid.take(pa.array(idx)),
                         "x": pa.array(x[idx]),
                         "delta": pa.array(x[idx] - x[idx - 1])})

    parted = ds.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _diff, batch_format="pyarrow")


def cusum(ds, *, target: int, slack: int, h: int,
          series_col: str = "series_id", x_col: str = "x", y_col: str = "y",
          tiebreak_col: str | None = None, num_partitions: int = 16):
    """Two-sided CUSUM changepoint statistic per series (Page 1954):

        s_pos[t] = max(0, s_pos[t-1] + (y[t] - target) - slack)
        s_neg[t] = max(0, s_neg[t-1] + (target - y[t]) - slack)

    emitted for EVERY row with ``alarm`` = 2 (both sides over ``h``),
    1 (upper), -1 (lower), 0 (in control). All-integer arithmetic.

    The recursion is NOT a plain scan, but it has the classic closed
    form ``s[t] = C[t] - min(0, min_{j<=t} C[j])`` with ``C`` the prefix
    sum of the drift-adjusted deviations — so the per-partition pass is
    one cumsum + one ``np.minimum.accumulate``, no Python loop. Segment
    restarts (many series per partition) use per-segment offsets spaced
    wider than the global value range so one global accumulate serves
    every series; an int64 headroom assertion guards the construction.

    Scale shape: ONE hash(series) shuffle, one sorted vectorized pass per
    partition (the ``counter_rate`` discipline). Output:
    ``(series_id, x, y, s_pos, s_neg, alarm)``."""
    from ..arrow_utils import stable_part_codes

    mod = num_partitions * 64

    def _add_part(b: pa.Table) -> pa.Table:
        hh = stable_part_codes(b[series_col], None)
        return b.append_column(
            "__part", pa.array((hh % np.uint64(mod)).astype(np.int32)))

    sort_keys = [(series_col, "ascending"), (x_col, "ascending")]
    if tiebreak_col is not None:
        sort_keys.append((tiebreak_col, "ascending"))

    def _segmented_cusum(vals: np.ndarray, starts: np.ndarray,
                         seg_of_row: np.ndarray) -> np.ndarray:
        """s[t] = C_local[t] - min(0, running min of C_local) per segment."""
        c = np.cumsum(vals, dtype=np.int64)
        base = (c[starts] - vals[starts])[seg_of_row]
        local = c - base  # per-segment prefix sums
        if local.size:
            big = int(local.max()) - int(local.min()) + 1
            nseg = int(seg_of_row[-1]) + 1
            assert big * (nseg + 1) < 2 ** 62, "cusum offset headroom"
            off = (nseg - seg_of_row).astype(np.int64) * big
            runmin = np.minimum.accumulate(local + off) - off
        else:
            runmin = local
        return local - np.minimum(runmin, 0)

    def _scan(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        sid_type = t[series_col].type
        empty = pa.table({"series_id": pa.array([], sid_type),
                          "x": pa.array([], pa.int64()),
                          "y": pa.array([], pa.int64()),
                          "s_pos": pa.array([], pa.int64()),
                          "s_neg": pa.array([], pa.int64()),
                          "alarm": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
        sid = t[series_col]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = group_codes(sid)
        x = t[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        heads = np.ones(len(codes), dtype=bool)
        heads[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(heads)
        seg_of_row = np.cumsum(heads) - 1
        s_pos = _segmented_cusum(y - target - slack, starts, seg_of_row)
        s_neg = _segmented_cusum(target - y - slack, starts, seg_of_row)
        alarm = np.where(s_pos > h, 1, 0) + np.where(s_neg > h, -1, 0)
        alarm = np.where((s_pos > h) & (s_neg > h), 2, alarm)
        return pa.table({"series_id": sid, "x": pa.array(x),
                         "y": pa.array(y), "s_pos": pa.array(s_pos),
                         "s_neg": pa.array(s_neg),
                         "alarm": pa.array(alarm.astype(np.int64))})

    parted = ds.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _scan, batch_format="pyarrow")


def gap_profile(ds, *, over_us: int, series_col: str = "series_id",
                x_col: str = "x", id_col: str | None = None,
                num_partitions: int = 16):
    """Per-series inter-arrival (heartbeat) profile: sort each series by
    ``(x, id)`` and reduce the consecutive deltas to ``(series_id,
    n_events, n_gaps, min_gap_us, max_gap_us, sum_gap_us, mean_gap_us,
    n_gaps_over)`` where ``n_gaps_over`` counts deltas strictly greater
    than ``over_us`` (missed-heartbeat / SLA-breach detector).

    Shape: ONE hash(series) shuffle; inside each partition the deltas and
    all eight stats come from vectorized segment reductions
    (``np.minimum.reduceat`` over series run starts) — no per-row Python.
    All stats are exact int64 (mean is the pinned IEEE ``sum/n`` double);
    single-event series report ``n_gaps = 0`` and null min/max/mean.
    SQL restatement: ``lag(x) OVER (PARTITION BY series ORDER BY x, id)``
    deltas + plain aggregates."""
    from ..arrow_utils import stable_part_codes

    mod = num_partitions * 64

    _add_part = make_add_part(series_col, mod)

    sort_keys = [(series_col, "ascending"), (x_col, "ascending")]
    if id_col is not None:
        sort_keys.append((id_col, "ascending"))

    def _profile(g: pa.Table) -> pa.Table:
        sid_type = g[series_col].type
        empty = pa.table({
            "series_id": pa.array([], sid_type),
            "n_events": pa.array([], pa.int64()),
            "n_gaps": pa.array([], pa.int64()),
            "min_gap_us": pa.array([], pa.int64()),
            "max_gap_us": pa.array([], pa.int64()),
            "sum_gap_us": pa.array([], pa.int64()),
            "mean_gap_us": pa.array([], pa.float64()),
            "n_gaps_over": pa.array([], pa.int64()),
        })
        if g.num_rows == 0:
            return empty
        t = g.take(pc.sort_indices(g, sort_keys=sort_keys))
        sid = t[series_col]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = group_codes(sid)
        x = t[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(x)
        heads = np.ones(n, dtype=bool)
        heads[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(heads)
        n_events = np.diff(np.append(starts, n))
        # deltas exist at rows that are NOT series heads
        delta = np.empty(n, dtype=np.int64)
        delta[1:] = x[1:] - x[:-1]
        delta[heads] = 0
        gap_rows = ~heads
        n_gaps = n_events - 1
        has_gap = n_gaps > 0
        # reduceat over [start+1, next_start) windows, guarded for 1-row series
        sum_gap = np.add.reduceat(delta, starts)  # heads contribute 0
        over = (delta > over_us) & gap_rows
        n_over = np.add.reduceat(over.astype(np.int64), starts)
        # min/max need the head slot neutralized
        big = np.iinfo(np.int64).max
        dmin = np.where(gap_rows, delta, big)
        dmax = np.where(gap_rows, delta, np.iinfo(np.int64).min)
        min_gap = np.minimum.reduceat(dmin, starts)
        max_gap = np.maximum.reduceat(dmax, starts)
        mean_gap = np.where(has_gap,
                            sum_gap.astype(np.float64) /
                            np.maximum(n_gaps, 1), np.nan)
        return pa.table({
            "series_id": sid.take(pa.array(starts)),
            "n_events": pa.array(n_events),
            "n_gaps": pa.array(n_gaps),
            "min_gap_us": pa.array(min_gap, pa.int64(), mask=~has_gap),
            "max_gap_us": pa.array(max_gap, pa.int64(), mask=~has_gap),
            "sum_gap_us": pa.array(sum_gap),
            "mean_gap_us": pa.array(np.nan_to_num(mean_gap), pa.float64(),
                                    mask=~has_gap),
            "n_gaps_over": pa.array(n_over),
        })

    parted = ds.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _profile, batch_format="pyarrow")


def hysteresis_alerts(ds, hi: int, lo: int, *,
                      series_col: str = "series_id", x_col: str = "x",
                      y_col: str = "y", tiebreak_col: str | None = None,
                      num_partitions: int = 16):
    """Schmitt-trigger alerting: a series enters the ALERT state when
    ``y >= hi`` and leaves it only when ``y <= lo`` (the hysteresis band
    (lo, hi) suppresses flapping that plain threshold crossings emit).
    Emits one row per STATE TRANSITION ``(series_id, x, y, state)`` —
    state 1 = alert fired, 0 = cleared; the implicit initial state is 0,
    so a series whose first point is already ≥ hi fires on that point.

    Scale shape: identical to :func:`threshold_crossings` — ONE
    hash(series) shuffle, then per partition a single vectorized pass:
    the forward-fill of the set/reset markers is a
    ``np.maximum.accumulate`` over marker positions with a
    segment-start validity check (no per-row Python, no recursion).
    """
    from ..arrow_utils import stable_part_codes

    if not hi > lo:
        raise ValueError(f"need hi > lo; got hi={hi}, lo={lo}")
    mod = num_partitions * 64
    HI, LO = int(hi), int(lo)

    _add_part = make_add_part(series_col, mod)

    sort_keys = [(series_col, "ascending"), (x_col, "ascending")]
    if tiebreak_col is not None:
        sort_keys.append((tiebreak_col, "ascending"))

    def _trans(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        sid_type = t[series_col].type
        empty = pa.table({"series_id": pa.array([], sid_type),
                          "x": pa.array([], pa.int64()),
                          "y": pa.array([], pa.int64()),
                          "state": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
        sid = t[series_col]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = group_codes(sid)
        x = t[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(y)
        change = np.ones(n, dtype=bool)
        change[1:] = codes[1:] != codes[:-1]
        seg_first = np.flatnonzero(change)
        seg_of = np.cumsum(change) - 1
        defined = (y >= HI) | (y <= LO)
        marker = (y >= HI).astype(np.int64)
        lastdef = np.maximum.accumulate(np.where(defined, np.arange(n), -1))
        valid = lastdef >= seg_first[seg_of]
        state = np.where(valid, marker[np.maximum(lastdef, 0)], 0)
        prev = np.empty(n, np.int64)
        prev[0] = 0
        prev[1:] = state[:-1]
        prev[change] = 0  # implicit 0 before each series' first row
        idx = np.flatnonzero(state != prev)
        if len(idx) == 0:
            return empty
        return pa.table({"series_id": sid.take(pa.array(idx)),
                         "x": pa.array(x[idx]),
                         "y": pa.array(y[idx]),
                         "state": pa.array(state[idx])})

    parted = ds.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _trans, batch_format="pyarrow")


def amoc_changepoint(rolled, *, series_col: str = "series_id",
                     order_col: str = "bucket", value_col: str = "sum_y",
                     num_partitions: int = 8):
    """At-Most-One-Change (AMOC) mean-shift detection per series: the
    split ``k`` (left block = first k points) maximizing the SSE
    reduction — equivalently ``f(k) = S1²/k + S2²/(n−k)`` — ties to the
    smallest k. Sufficient statistics are exact int64 prefix sums; the
    two squared terms are pinned IEEE doubles (squared in float64, the
    identical expression tree in SQL), so the argmax is deterministic.
    The closed-form companion to :func:`cusum`'s sequential detector.

    Output per series: ``(series_id, n, k, s1, s2, f)``.

    Scale shape: ONE hash(series) shuffle, then a single vectorized
    cumsum + argmax pass over every series in the partition."""
    from ..arrow_utils import stable_part_codes

    mod = num_partitions * 64

    _add_part = make_add_part(series_col, mod)

    def _amoc(g: pa.Table) -> pa.Table:
        sid_type = g[series_col].type
        empty = pa.table({"series_id": pa.array([], sid_type),
                          "n": pa.array([], pa.int64()),
                          "k": pa.array([], pa.int64()),
                          "s1": pa.array([], pa.int64()),
                          "s2": pa.array([], pa.int64()),
                          "f": pa.array([], pa.float64())})
        t = g.drop_columns(["__part"])
        if t.num_rows == 0:
            return empty
        t = t.take(pc.sort_indices(t, sort_keys=[
            (series_col, "ascending"), (order_col, "ascending")]))
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
        out = {k: [] for k in ("sid", "n", "k", "s1", "s2", "f")}
        csum = np.cumsum(y)
        for si, f0 in enumerate(seg_first):
            m = int(seg_len[si])
            if m < 2:
                continue
            base = csum[f0] - y[f0]
            s1 = csum[f0:f0 + m - 1] - base          # k = 1..m-1
            stot = csum[f0 + m - 1] - base
            k = np.arange(1, m, dtype=np.int64)
            s2 = stot - s1
            s1f = s1.astype(np.float64)
            s2f = s2.astype(np.float64)
            fval = (s1f * s1f) / k + (s2f * s2f) / (m - k)
            best = int(np.argmax(fval))              # ties -> smallest k
            out["sid"].append(sid[int(f0)].as_py())
            out["n"].append(m)
            out["k"].append(int(k[best]))
            out["s1"].append(int(s1[best]))
            out["s2"].append(int(s2[best]))
            out["f"].append(float(fval[best]))
        # per-series loop over bounded series count; inner math vectorized
        return pa.table({
            "series_id": pa.array(out["sid"], sid_type),
            "n": pa.array(out["n"], pa.int64()),
            "k": pa.array(out["k"], pa.int64()),
            "s1": pa.array(out["s1"], pa.int64()),
            "s2": pa.array(out["s2"], pa.int64()),
            "f": pa.array(out["f"], pa.float64())})

    parted = rolled.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _amoc, batch_format="pyarrow")


def pettitt_test(rolled, *, series_col: str = "series_id",
                 order_col: str = "bucket", value_col: str = "sum_y",
                 num_partitions: int = 8):
    """Pettitt's non-parametric change-point test per series (Pettitt
    1979): the rank-based companion to :func:`amoc_changepoint` — no
    mean-shift model, just the Mann-Whitney-style statistic
    ``U_t = sum_{i<=t} sum_{j>t} sgn(y_i - y_j)``.

    Exactness contract: ``sum_j sgn(y_i - y_j) = d_i - (n+1)`` where
    ``d_i = 2*r_i = 2*cnt_lt + cnt_eq + 1`` is the doubled midrank (an
    integer even under ties), so ``U_t = sum_{i<=t} (d_i - (n+1))``
    exactly — plain sign-sum units, all int64 through the argmax; only
    the closing significance approximation
    ``p ~ 2*exp(-6*K^2/(n^3+n^2))`` is a pinned IEEE expression that
    the SQL oracle evaluates with the identical tree (libm ``exp``
    both sides).

    Output per series (n >= 2):
    ``(series_id, n, t_star, bucket, k_stat, p_approx)`` with
    ``k_stat = max_t |U_t|`` (t = 1..n-1), ``t_star`` the smallest t
    attaining it, ``bucket`` that point's order value.

    Scale shape: identical to AMOC — ONE hash(series) shuffle, then per
    partition a sort and a per-series vectorized rank + cumsum + argmax
    (the per-series Python loop is bounded by series count, the inner
    math fully vectorized)."""
    mod = num_partitions * 64

    _add_part = make_add_part(series_col, mod)

    def _pettitt(g: pa.Table) -> pa.Table:
        sid_type = g[series_col].type
        bkt_type = g[order_col].type
        empty = pa.table({"series_id": pa.array([], sid_type),
                          "n": pa.array([], pa.int64()),
                          "t_star": pa.array([], pa.int64()),
                          "bucket": pa.array([], bkt_type),
                          "k_stat": pa.array([], pa.int64()),
                          "p_approx": pa.array([], pa.float64())})
        t = g.drop_columns(["__part"])
        if t.num_rows == 0:
            return empty
        t = t.take(pc.sort_indices(t, sort_keys=[
            (series_col, "ascending"), (order_col, "ascending")]))
        sid = t[series_col]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = group_codes(sid)
        y = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bkt = t[order_col].to_numpy(zero_copy_only=False)
        n = len(y)
        change = np.ones(n, dtype=bool)
        change[1:] = codes[1:] != codes[:-1]
        seg_first = np.flatnonzero(change)
        seg_len = np.diff(np.r_[seg_first, n])
        out = {k: [] for k in ("sid", "n", "t", "b", "k", "p")}
        for si, f0 in enumerate(seg_first):
            m = int(seg_len[si])
            if m < 2:
                continue
            ys = y[f0:f0 + m]
            # doubled midranks: d = 2*cnt_lt + cnt_eq + 1, exact int64
            uniq, inv, cnt = np.unique(ys, return_inverse=True,
                                       return_counts=True)
            cum_lt = np.concatenate(([0], np.cumsum(cnt)[:-1]))
            d = 2 * cum_lt[inv] + cnt[inv] + 1
            u = np.cumsum(d - (m + 1))[: m - 1]        # U_t, t = 1..m-1
            au = np.abs(u)
            best = int(np.argmax(au))                  # first max -> min t
            kk = int(au[best])
            mf = float(m)
            kf = float(kk)
            # math.exp (libm), not np.exp: numpy's SIMD exp rounds
            # differently by 1 ulp vs DuckDB's std::exp on some inputs
            import math as _math

            p = 2.0 * _math.exp(-6.0 * kf * kf / (mf * mf * mf + mf * mf))
            out["sid"].append(sid[int(f0)].as_py())
            out["n"].append(m)
            out["t"].append(best + 1)
            out["b"].append(bkt[f0 + best])
            out["k"].append(kk)
            out["p"].append(float(p))
        return pa.table({
            "series_id": pa.array(out["sid"], sid_type),
            "n": pa.array(out["n"], pa.int64()),
            "t_star": pa.array(out["t"], pa.int64()),
            "bucket": pa.array(out["b"], bkt_type),
            "k_stat": pa.array(out["k"], pa.int64()),
            "p_approx": pa.array(out["p"], pa.float64())})

    parted = rolled.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _pettitt, batch_format="pyarrow")



def spc_rules(rolled, *, series_col: str = "series_id",
              order_col: str = "bucket", value_col: str = "sum_y",
              num_partitions: int = 8):
    """Western-Electric-style control-chart rules per series with
    ROBUST integer limits (median / Qn instead of mean / sigma — no
    float sums anywhere, everything int64-exact):

    - ``rule = 1``: |y - med| > 3*qn (beyond the 3-sigma analog)
    - ``rule = 2``: beyond 2*qn AND one of the previous two points
      beyond 2*qn on the same side (the 2-of-3 analog, one-sided
      lookback — documented simplification of WE rule 2)
    - ``rule = 3``: beyond 1*qn AND >= 3 of the previous four beyond
      1*qn on the same side (the 4-of-5 analog)
    - ``rule = 4``: 9 consecutive points strictly on one side of the
      median (this point is the 9th or later)

    ``med`` is the lower median, ``qn`` the lower median of pairwise
    absolute differences (the ``qn_scale`` statistic). Output one row
    per (point, fired rule): ``(series_id, bucket, y, rule)``.

    Scale shape: ONE hash(series) shuffle, per-series vectorized
    indicator shifts (the Qn part is O(n^2) per series by definition —
    bounded-tier contract shared with ``qn_scale``)."""
    mod = num_partitions * 64

    _add_part = make_add_part(series_col, mod)

    def _rules(g: pa.Table) -> pa.Table:
        sid_type = g[series_col].type
        empty = pa.table({"series_id": pa.array([], sid_type),
                          "bucket": pa.array([], pa.int64()),
                          "y": pa.array([], pa.int64()),
                          "rule": pa.array([], pa.int64())})
        t = g.drop_columns(["__part"])
        if t.num_rows == 0:
            return empty
        t = t.take(pc.sort_indices(t, sort_keys=[
            (series_col, "ascending"), (order_col, "ascending")]))
        sid = t[series_col]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = group_codes(sid)
        y = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bkt = t[order_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(y)
        change = np.ones(n, dtype=bool)
        change[1:] = codes[1:] != codes[:-1]
        seg_first = np.flatnonzero(change)
        seg_len = np.diff(np.r_[seg_first, n])
        out_sid, out_b, out_y, out_r = [], [], [], []
        for si, f0 in enumerate(seg_first):
            m = int(seg_len[si])
            if m < 2:
                continue
            ys = y[f0:f0 + m]
            med = int(np.partition(ys, (m - 1) // 2)[(m - 1) // 2])
            iu = np.triu_indices(m, k=1)
            diffs = np.abs(ys[iu[0]] - ys[iu[1]])
            k = (len(diffs) - 1) // 2
            qn = int(np.partition(diffs, k)[k])
            dev = ys - med
            sgn = np.sign(dev)
            ad = np.abs(dev)

            def _shift(arr, j):
                s = np.zeros(m, dtype=arr.dtype)
                if j < m:
                    s[j:] = arr[:m - j]
                return s

            fired = {}
            fired[1] = ad > 3 * qn
            b2 = ad > 2 * qn
            same1 = _shift(sgn, 1) == sgn
            same2 = _shift(sgn, 2) == sgn
            fired[2] = b2 & ((_shift(b2, 1) & same1)
                             | (_shift(b2, 2) & same2))
            b1 = ad > qn
            cnt = np.zeros(m, dtype=np.int64)
            for j in range(1, 5):
                cnt += (_shift(b1, j)
                        & (_shift(sgn, j) == sgn)).astype(np.int64)
            fired[3] = b1 & (cnt >= 3)
            nz = sgn != 0
            run = np.zeros(m, dtype=np.int64)
            for i in range(m):
                if nz[i] and i > 0 and sgn[i] == sgn[i - 1]:
                    run[i] = run[i - 1] + 1
                elif nz[i]:
                    run[i] = 1
            fired[4] = run >= 9
            for r, mask in fired.items():
                idx = np.flatnonzero(mask)
                for i in idx:
                    out_sid.append(sid[int(f0)].as_py())
                    out_b.append(int(bkt[f0 + i]))
                    out_y.append(int(ys[i]))
                    out_r.append(r)
        return pa.table({"series_id": pa.array(out_sid, sid_type),
                         "bucket": pa.array(out_b, pa.int64()),
                         "y": pa.array(out_y, pa.int64()),
                         "rule": pa.array(out_r, pa.int64())})

    parted = rolled.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _rules, batch_format="pyarrow")
