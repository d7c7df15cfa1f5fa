"""Fixed-point exponential smoothing (EWMA) over rolled-up tier rows.

``ema_i = ema_{i-1} + floor((y_i - ema_{i-1}) / 2**k)`` with
``ema_0 = y_0`` — the classic integer EMA (alpha = 2^-k) used by
monitoring systems precisely because it is exact: integer state, no
float drift, bit-identical on replay. The floor makes the recursion
nonlinear, so there is no closed-form scan; it is computed sequentially
PER SERIES.

Scale shape (100 TB): EWMA consumes the ROLLED-UP tier (SURVEY.md §4.2:
~100-1000x smaller than raw events), exactly like the downsampling
kernels — the sequential per-row cost applies to tier rows only, off the
raw-data critical path. ONE hash(series) shuffle co-locates each series;
partitions then run one sorted pass (series advance independently —
parallelism across series, sequential within, which is the operator's
defining data dependency).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ..arrow_utils import group_codes, make_add_part

__all__ = ["theta_fixed_point",
           "ewma_fixed_point", "holt_fixed_point",
           "kalman_local_level",
           "holt_winters_fixed_point", "macd_fixed_point",
           "savgol_smooth"]


def ewma_fixed_point(ds, k: int = 3, *, series_col: str = "series_id",
                     x_col: str = "bucket", y_col: str = "sum_y",
                     num_partitions: int = 8):
    """Returns ``(series_id, bucket, y, ema)``; ``y``/``ema`` int64.
    The arithmetic shift ``>> k`` IS floor division by ``2**k`` for
    signed ints (matches the SQL oracle's ``floor(d / 2^k)``)."""
    mod = num_partitions * 64

    _add_part = make_add_part(series_col, mod)

    def _ewma(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        s_type = t[series_col].type
        if t.num_rows == 0:
            return pa.table({"series_id": pa.array([], s_type),
                             "bucket": pa.array([], pa.int64()),
                             "y": pa.array([], pa.int64()),
                             "ema": pa.array([], pa.int64())})
        t = t.take(pc.sort_indices(t, sort_keys=[
            (series_col, "ascending"), (x_col, "ascending")]))
        sid = t[series_col]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = group_codes(sid)
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        head = np.ones(len(y), dtype=bool)
        head[1:] = codes[1:] != codes[:-1]
        state = 0
        # inherently order-recursive (see module docstring); rows here are
        # tier rows, not raw events
        yl = y.tolist()
        hl = head.tolist()
        el = [0] * len(yl)
        for i in range(len(yl)):
            v = yl[i]
            state = v if hl[i] else state + ((v - state) >> k)
            el[i] = state
        return pa.table({"series_id": sid,
                         "bucket": t[x_col].cast(pa.int64()),
                         "y": pa.array(y),
                         "ema": pa.array(el, pa.int64())})

    parted = ds.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _ewma, batch_format="pyarrow")


def holt_fixed_point(ds, ka: int = 3, kb: int = 4, *,
                     series_col: str = "series_id", x_col: str = "bucket",
                     y_col: str = "sum_y", num_partitions: int = 8):
    """Holt's linear-trend double exponential smoothing, integer fixed
    point (alpha = 2^-ka, beta = 2^-kb):

        f_i = l_{i-1} + b_{i-1}                      (one-step forecast)
        l_i = f_i + ((y_i - f_i) >> ka)              (level update)
        b_i = b_{i-1} + ((l_i - l_{i-1} - b_{i-1}) >> kb)
        l_0 = y_0, b_0 = 0

    Same contract as :func:`ewma_fixed_point`: the arithmetic shift is
    floor division by 2^k on signed ints, the recursion is nonlinear
    (no closed-form scan) and runs sequentially PER SERIES over tier
    rows only — parallel across series after ONE hash(series) shuffle.
    Output ``(series_id, bucket, y, level, trend, forecast)`` with
    ``forecast`` the pre-update one-step-ahead prediction (f_i; equals
    y_0 at the head row by convention)."""
    mod = num_partitions * 64

    _add_part = make_add_part(series_col, mod)

    def _holt(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        s_type = t[series_col].type
        if t.num_rows == 0:
            return pa.table({"series_id": pa.array([], s_type),
                             "bucket": pa.array([], pa.int64()),
                             "y": pa.array([], pa.int64()),
                             "level": pa.array([], pa.int64()),
                             "trend": pa.array([], pa.int64()),
                             "forecast": pa.array([], pa.int64())})
        t = t.take(pc.sort_indices(t, sort_keys=[
            (series_col, "ascending"), (x_col, "ascending")]))
        sid = t[series_col]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = group_codes(sid)
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        head = np.ones(len(y), dtype=bool)
        head[1:] = codes[1:] != codes[:-1]
        yl = y.tolist()
        hl = head.tolist()
        lv = [0] * len(yl)
        tr = [0] * len(yl)
        fc = [0] * len(yl)
        level = trend = 0
        for i in range(len(yl)):
            v = yl[i]
            if hl[i]:
                level, trend, f = v, 0, v
            else:
                f = level + trend
                new_level = f + ((v - f) >> ka)
                trend = trend + ((new_level - level - trend) >> kb)
                level = new_level
            lv[i], tr[i], fc[i] = level, trend, f
        return pa.table({"series_id": sid,
                         "bucket": t[x_col].cast(pa.int64()),
                         "y": pa.array(y),
                         "level": pa.array(lv, pa.int64()),
                         "trend": pa.array(tr, pa.int64()),
                         "forecast": pa.array(fc, pa.int64())})

    parted = ds.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _holt, batch_format="pyarrow")


def kalman_local_level(ds, *, q_e6: int = 1_000_000,
                       r_e6: int = 9_000_000,
                       series_col: str = "series_id",
                       x_col: str = "bucket", y_col: str = "sum_y",
                       num_partitions: int = 8):
    """Kalman filter for the local-level model (random-walk state +
    observation noise), pinned integer fixed point so every row is
    bit-stable and SQL-replayable — completing the smoothing trio
    (EWMA = constant gain, Holt = trend, Kalman = converging
    time-varying gain). Per step, all e6-scaled int64:

        p     <- p + q_e6                                (predict)
        k_e6  <- (p * 1000000) // (p + r_e6)             (gain; p,r > 0)
        x     <- x + trunc(k_e6 * (y*1000000 - x) / 1e6) (update)
        p     <- ((1000000 - k_e6) * p) // 1000000       (posterior)

    The innovation product is the only signed quantity; its division
    truncates TOWARD ZERO on both sides (DuckDB ``//`` semantics),
    applied explicitly here since NumPy ``//`` floors. Initial state:
    x = first y (exact), p = r_e6. Gains depend only on the step index,
    converging to the steady-state Wiener gain. Returns
    ``(series_id, bucket, y, x_e6, k_e6)``; same one-shuffle sequential
    per-series contract as :func:`ewma_fixed_point` (tier rows only).
    """
    mod = num_partitions * 64
    E6 = 1_000_000

    _add_part = make_add_part(series_col, mod)

    def _kalman(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        s_type = t[series_col].type
        if t.num_rows == 0:
            return pa.table({"series_id": pa.array([], s_type),
                             "bucket": pa.array([], pa.int64()),
                             "y": pa.array([], pa.int64()),
                             "x_e6": pa.array([], pa.int64()),
                             "k_e6": pa.array([], pa.int64())})
        t = t.take(pc.sort_indices(t, sort_keys=[
            (series_col, "ascending"), (x_col, "ascending")]))
        sid = t[series_col]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = group_codes(sid)
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        head = np.ones(len(y), dtype=bool)
        head[1:] = codes[1:] != codes[:-1]
        xs = [0] * len(y)
        ks = [0] * len(y)
        x = p = 0
        yl = y.tolist()
        hl = head.tolist()
        for i in range(len(yl)):  # order-recursive; tier rows only
            v = yl[i]
            if hl[i]:
                x, p, k = v * E6, r_e6, 0
            else:
                p = p + q_e6
                k = (p * E6) // (p + r_e6)
                s = k * (v * E6 - x)
                x = x + (abs(s) // E6 if s >= 0 else -(abs(s) // E6))
                p = ((E6 - k) * p) // E6
            xs[i] = x
            ks[i] = k
        return pa.table({"series_id": sid,
                         "bucket": t[x_col].cast(pa.int64()),
                         "y": pa.array(y),
                         "x_e6": pa.array(xs, pa.int64()),
                         "k_e6": pa.array(ks, pa.int64())})

    parted = ds.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _kalman, batch_format="pyarrow")


def holt_winters_fixed_point(ds, ka: int = 3, kb: int = 4, kc: int = 3,
                             *, m: int = 24, window_us: int,
                             series_col: str = "series_id",
                             x_col: str = "bucket", y_col: str = "sum_y",
                             num_partitions: int = 8):
    """Additive Holt-Winters triple exponential smoothing, integer fixed
    point (alpha = 2^-ka, beta = 2^-kb, gamma = 2^-kc), season length
    ``m`` with slot = (bucket // window_us) % m (hour-of-day for a 1h
    tier, m=24):

        f_i = l + b + s[slot]                         (forecast)
        l_i = (l + b) + ((y_i - f_i) >> ka)           (level)
        b_i = b + ((l_i - l - b) >> kb)               (trend)
        s[slot] += (y_i - l_i - s[slot]) >> kc        (seasonal)
        head row: l = y_0, b = 0, s = zeros, f = y_0 (no updates)

    Arithmetic shift = floor division by 2^k on signed ints — the exact
    SQL-replayable convention of :func:`holt_fixed_point`; the seasonal
    state rides the recursion as an m-slot vector (a LIST column in the
    recursive-CTE oracle). Sequential per series over TIER rows only,
    parallel across series after ONE hash(series) shuffle. Output
    ``(series_id, bucket, y, level, trend, seasonal, forecast)`` with
    ``seasonal`` the slot value AFTER the row's update (0 on the head
    row)."""
    mod = num_partitions * 64

    _add_part = make_add_part(series_col, mod)

    def _hw(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        s_type = t[series_col].type
        if t.num_rows == 0:
            return pa.table({"series_id": pa.array([], s_type),
                             "bucket": pa.array([], pa.int64()),
                             "y": pa.array([], pa.int64()),
                             "level": pa.array([], pa.int64()),
                             "trend": pa.array([], pa.int64()),
                             "seasonal": pa.array([], pa.int64()),
                             "forecast": pa.array([], pa.int64())})
        t = t.take(pc.sort_indices(t, sort_keys=[
            (series_col, "ascending"), (x_col, "ascending")]))
        sid = t[series_col]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = group_codes(sid)
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        x = t[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        slot = ((x // window_us) % m).astype(np.int64)
        head = np.ones(len(y), dtype=bool)
        head[1:] = codes[1:] != codes[:-1]
        yl, sl, hl = y.tolist(), slot.tolist(), head.tolist()
        lv = [0] * len(yl)
        tr = [0] * len(yl)
        se = [0] * len(yl)
        fc = [0] * len(yl)
        level = trend = 0
        season = [0] * m
        for i in range(len(yl)):
            v, sj = yl[i], sl[i]
            if hl[i]:
                level, trend, season = v, 0, [0] * m
                f, s_out = v, 0
            else:
                f = level + trend + season[sj]
                new_level = (level + trend) + ((v - f) >> ka)
                trend = trend + ((new_level - level - trend) >> kb)
                level = new_level
                season[sj] = season[sj] + ((v - level - season[sj]) >> kc)
                s_out = season[sj]
            lv[i], tr[i], se[i], fc[i] = level, trend, s_out, f
        return pa.table({"series_id": sid,
                         "bucket": t[x_col].cast(pa.int64()),
                         "y": pa.array(y),
                         "level": pa.array(lv, pa.int64()),
                         "trend": pa.array(tr, pa.int64()),
                         "seasonal": pa.array(se, pa.int64()),
                         "forecast": pa.array(fc, pa.int64())})

    parted = ds.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _hw, batch_format="pyarrow")


def macd_fixed_point(ds, kf: int = 2, ks: int = 4, ksig: int = 3, *,
                     series_col: str = "series_id", x_col: str = "bucket",
                     y_col: str = "sum_y", num_partitions: int = 8):
    """MACD (moving-average convergence/divergence) in integer fixed
    point — the crossover-signal composition of two EMAs plus a signal
    EMA over their difference:

        ef_i = ef_{i-1} + ((y_i - ef_{i-1}) >> kf)    (fast, alpha 2^-kf)
        es_i = es_{i-1} + ((y_i - es_{i-1}) >> ks)    (slow, alpha 2^-ks)
        macd_i = ef_i - es_i
        sig_i  = sig_{i-1} + ((macd_i - sig_{i-1}) >> ksig)
        ef_0 = es_0 = y_0  (so macd_0 = 0), sig_0 = 0

    Same contract as :func:`ewma_fixed_point`: arithmetic shift = floor
    division by 2^k on signed ints, recursion nonlinear (no closed-form
    scan), sequential PER SERIES over tier rows only; ONE hash(series)
    shuffle, parallel across series. Returns ``(series_id, bucket, y,
    macd, signal, hist)`` (hist = macd - signal), all int64."""
    mod = num_partitions * 64

    _add_part = make_add_part(series_col, mod)

    def _macd(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        s_type = t[series_col].type
        cols = ("bucket", "y", "macd", "signal", "hist")
        if t.num_rows == 0:
            return pa.table({"series_id": pa.array([], s_type),
                             **{c: pa.array([], pa.int64())
                                for c in cols}})
        t = t.take(pc.sort_indices(t, sort_keys=[
            (series_col, "ascending"), (x_col, "ascending")]))
        sid = t[series_col]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = group_codes(sid)
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        head = np.ones(len(y), dtype=bool)
        head[1:] = codes[1:] != codes[:-1]
        yl = y.tolist()
        hl = head.tolist()
        ml = [0] * len(yl)
        sl = [0] * len(yl)
        ef = es = sig = 0
        for i in range(len(yl)):
            v = yl[i]
            if hl[i]:
                ef = es = v
                sig = 0
            else:
                ef += (v - ef) >> kf
                es += (v - es) >> ks
            m = ef - es
            if not hl[i]:
                sig += (m - sig) >> ksig
            ml[i] = m
            sl[i] = sig
        macd = np.array(ml, dtype=np.int64)
        signal = np.array(sl, dtype=np.int64)
        return pa.table({"series_id": sid,
                         "bucket": t[x_col].cast(pa.int64()),
                         "y": pa.array(y),
                         "macd": pa.array(macd),
                         "signal": pa.array(signal),
                         "hist": pa.array(macd - signal)})

    parted = ds.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _macd, batch_format="pyarrow")


def croston_fixed_point(ds, kz: int = 3, kp: int = 3, *,
                        window_us: int, series_col: str = "series_id",
                        x_col: str = "bucket", y_col: str = "sum_y",
                        num_partitions: int = 8):
    """Croston's method for INTERMITTENT demand (Croston 1972) — the
    forecasting-family member the dense smoothers (EWMA/Holt/HW/Kalman)
    can't be: two coupled SES states updated ONLY at nonzero-demand
    periods — ``z`` smooths the demand SIZE, ``p`` smooths the
    INTER-DEMAND INTERVAL (periods since the previous demand, derived
    from the bucket gap / ``window_us`` — silent periods need no
    materialized zero rows). Integer fixed point: alpha_z = 2^-kz,
    alpha_p = 2^-kp via arithmetic shifts (floor semantics, same
    contract as :func:`ewma_fixed_point`); the forecast is the exact
    RATIONAL pair (z, p) — z/p per period, never divided into a float.
    Init at each series' first demand: z = y, p = 1.

    Emits one row per demand period: ``(series_id, bucket, y, q, z,
    p)`` with q the interval that drove the update (0 at init). Same
    scale shape as the siblings: ONE hash(series) shuffle, sequential
    recursion per series over tier rows."""
    if window_us < 1:
        raise ValueError("window_us must be >= 1")
    mod = num_partitions * 64
    _add_part = make_add_part(series_col, mod)

    def _croston(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        s_type = t[series_col].type
        if t.num_rows == 0:
            return pa.table({"series_id": pa.array([], s_type),
                             "bucket": pa.array([], pa.int64()),
                             "y": pa.array([], pa.int64()),
                             "q": pa.array([], pa.int64()),
                             "z": pa.array([], pa.int64()),
                             "p": pa.array([], pa.int64())})
        t = t.take(pc.sort_indices(t, sort_keys=[
            (series_col, "ascending"), (x_col, "ascending")]))
        sid = t[series_col]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = group_codes(sid)
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bkt = t[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        head = np.ones(len(y), dtype=bool)
        head[1:] = codes[1:] != codes[:-1]
        yl, bl, hl = y.tolist(), bkt.tolist(), head.tolist()
        zl = [0] * len(yl)
        pl = [0] * len(yl)
        ql = [0] * len(yl)
        z = p = prev_b = 0
        for i in range(len(yl)):
            if hl[i]:
                z, p, q = yl[i], 1, 0
            else:
                q = (bl[i] - prev_b) // window_us
                z = z + ((yl[i] - z) >> kz)
                p = p + ((q - p) >> kp)
            prev_b = bl[i]
            zl[i], pl[i], ql[i] = z, p, q
        return pa.table({"series_id": sid, "bucket": pa.array(bkt),
                         "y": pa.array(y),
                         "q": pa.array(ql, pa.int64()),
                         "z": pa.array(zl, pa.int64()),
                         "p": pa.array(pl, pa.int64())})

    parted = ds.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _croston, batch_format="pyarrow")


def theta_fixed_point(ds, ka: int = 3, horizon: int = 12, *,
                      series_col: str = "series_id", x_col: str = "bucket",
                      y_col: str = "sum_y", num_partitions: int = 8):
    """Theta-method forecast, integer fixed point (Assimakopoulos &
    Nikolopoulos, IJF 16(4), 2000; via the Hyndman-Billah 2003
    equivalence: theta(0, 2) forecasting == SES plus HALF the linear
    trend as drift):

        level:    l_i = l_{i-1} + ((y_i - l_{i-1}) >> ka), l_0 = y_0
        slope:    bn = n*sum(t*y) - sum(t)*sum(y)     (t = 0-based rank)
                  bd = n*sum(t^2) - sum(t)^2          (exact rational b = bn/bd)
        forecast: f_h = l_n + floor(h*bn / (2*bd)), h = 1..horizon
                  (bd = 0 -- single-row series -- forecasts flat l_n)

    The shift is floor division by 2^ka on signed ints and the drift
    floor uses sign-handled integer division, so the SQL oracle (EWMA
    recursion + exact OLS sums) replays every forecast bit-identically.
    Overflow contract: ``horizon * n * sum|t*y|`` must fit int64.

    Output per series: ``(series_id, h, level, bn, bd, forecast)``,
    ``horizon`` rows each. Sequential level pass per series over TIER
    rows after ONE hash(series) shuffle; slope sums are vectorized
    segment reductions (no second pass)."""
    mod = num_partitions * 64
    _add_part = make_add_part(series_col, mod)

    def _theta(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        s_type = t[series_col].type
        empty = pa.table({"series_id": pa.array([], s_type),
                          "h": pa.array([], pa.int64()),
                          "level": pa.array([], pa.int64()),
                          "bn": pa.array([], pa.int64()),
                          "bd": pa.array([], pa.int64()),
                          "forecast": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        t = t.take(pc.sort_indices(t, sort_keys=[
            (series_col, "ascending"), (x_col, "ascending")]))
        sid = t[series_col]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = group_codes(sid)
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        head = np.ones(len(y), dtype=bool)
        head[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(head)
        ends = np.r_[starts[1:], len(y)]
        n = (ends - starts).astype(np.int64)
        rank = np.arange(len(y), dtype=np.int64) - np.repeat(starts, n)
        sty = np.add.reduceat(rank * y, starts)
        st = np.add.reduceat(rank, starts)
        sy = np.add.reduceat(y, starts)
        stt = np.add.reduceat(rank * rank, starts)
        bn = n * sty - st * sy
        bd = n * stt - st * st
        # sequential level pass (inherent chain; tier rows only)
        yl, hl = y.tolist(), head.tolist()
        state = 0
        last = [0] * len(starts)
        si = -1
        for i in range(len(yl)):
            if hl[i]:
                si += 1
                state = yl[i]
            else:
                state = state + ((yl[i] - state) >> ka)
            last[si] = state
        hs = np.tile(np.arange(1, horizon + 1, dtype=np.int64),
                     len(starts))
        lvl = np.repeat(np.array(last, np.int64), horizon)
        bn_r = np.repeat(bn, horizon)
        bd_r = np.repeat(bd, horizon)
        num = hs * bn_r
        den = 2 * bd_r
        drift = np.zeros(len(hs), dtype=np.int64)
        nz = den > 0
        # exact floor(num/den) for signed num, positive den
        drift[nz] = np.where(
            num[nz] >= 0, num[nz] // den[nz],
            -((-num[nz] + den[nz] - 1) // den[nz]))
        return pa.table({
            "series_id": sid.take(pa.array(np.repeat(starts, horizon))),
            "h": pa.array(hs),
            "level": pa.array(lvl),
            "bn": pa.array(bn_r),
            "bd": pa.array(bd_r),
            "forecast": pa.array(lvl + drift)})

    parted = ds.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _theta, batch_format="pyarrow")


# Savitzky-Golay quadratic/window-5 convolution: integer numerators
# over the common denominator 35 (Savitzky & Golay 1964, table I)
_SG5_NUM = (-3, 12, 17, 12, -3)
_SG5_DEN = 35


def savgol_smooth(rolled, *, series_col: str = "series_id",
                  order_col: str = "bucket", value_col: str = "sum_y",
                  num_partitions: int = 8):
    """Savitzky-Golay smoothing (window 5, quadratic) per series: the
    classic least-squares convolution smoother — each FULL window's
    center point gets ``(-3, 12, 17, 12, -3) . y / 35``. The integer
    numerator ``sg_num`` is exact int64; ``sg`` is the one pinned IEEE
    division by 35.0. Windows touching a series edge emit nothing
    (no padding — the no-fabrication convention of the gapfill
    family). Positional windows over the ORDERED series — compose
    with gapfill when a uniform time grid is wanted.

    Output: ``(series_id, bucket, y, sg_num, sg)`` for every interior
    point with two neighbors on each side.

    Scale shape: ONE hash(series) shuffle, per-partition sort + one
    vectorized 5-tap dot product over all series at once (window
    validity masked at series boundaries)."""
    from ..arrow_utils import group_codes

    mod = num_partitions * 64

    _add_part = make_add_part(series_col, mod)

    def _sg(g: pa.Table) -> pa.Table:
        sid_type = g[series_col].type
        empty = pa.table({"series_id": pa.array([], sid_type),
                          "bucket": pa.array([], pa.int64()),
                          "y": pa.array([], pa.int64()),
                          "sg_num": pa.array([], pa.int64()),
                          "sg": pa.array([], pa.float64())})
        t = g.drop_columns(["__part"])
        if t.num_rows < 5:
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
        num = (_SG5_NUM[0] * y[:-4] + _SG5_NUM[1] * y[1:-3]
               + _SG5_NUM[2] * y[2:-2] + _SG5_NUM[3] * y[3:-1]
               + _SG5_NUM[4] * y[4:])
        # center index c = i + 2; window valid iff all 5 points share
        # the series of the center
        same = codes[:-4] == codes[4:]
        ci = np.flatnonzero(same) + 2
        if len(ci) == 0:
            return empty
        numv = num[ci - 2]
        return pa.table({
            "series_id": sid.take(pa.array(ci)),
            "bucket": pa.array(bkt[ci]),
            "y": pa.array(y[ci]),
            "sg_num": pa.array(numv),
            "sg": pa.array(numv.astype(np.float64) / 35.0, pa.float64())})

    parted = rolled.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _sg, batch_format="pyarrow")
