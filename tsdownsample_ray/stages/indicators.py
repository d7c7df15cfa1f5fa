"""Robust-filter and technical-indicator operators over tier series:
Hampel despike, Bollinger-band breaches, max drawdown, Cutler RSI.

All four follow the engine's per-series windowed contract (same as
``stages/windows.py:rolling_median``): ONE hash(series) shuffle, each
partition sorts once by (series, bucket) and computes EVERY series'
windows in a single vectorized pass — trailing-window gathers /
cumulative scans, never a per-row Python loop. All arithmetic is int64
on exact cent values, so results replay bit-identically in SQL:

- **hampel**: trailing-k discrete median + discrete MAD (median of
  |v - med| over the SAME window); outlier iff |v - med| > c * MAD.
  The classic telemetry despike filter (Hampel 1974; the robust
  sibling of the reference's despike use case).
- **bollinger_flags**: breach of mean +/- nsig * sigma decided by the
  EXACT integer cross-multiplication (n*v - S)^2 > nsig^2 * (n*Q - S^2)
  — sigma itself is never materialized as a float. Magnitude guards
  raise loudly instead of overflowing silently (engine convention).
- **max_drawdown**: per-series running max minus current value; output
  is each series' worst drawdown and the FIRST bucket that attains it.
- **rsi_cutler**: Cutler's RSI over trailing ``period`` diffs, carried
  as the rational pair (gain_sum, loss_sum) plus integer-cross-mul
  overbought/oversold flags (100*g > hi*(g+l)) — no float division.

No counterpart in the reference (kernel library only, see
reference/README.md operator table); standard monitoring-engine
surface layered on the same tier rollups the downsamplers consume.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..arrow_utils import group_codes, make_add_part

__all__ = ["hampel", "bollinger_flags", "max_drawdown", "rsi_cutler"]

_I64MAX = np.iinfo(np.int64).max


def _sorted_series(g: pa.Table, series_col: str, order_col: str,
                   value_col: str):
    """Sort one partition by (series, bucket) and return the shared
    per-row machinery: series array, codes, values, buckets, row index
    and each row's series-start index."""
    t = g.drop_columns(["__part"])
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
    if n:
        brk[1:] = codes[1:] != codes[:-1]
    ser_start = np.maximum.accumulate(np.where(brk, i, 0))
    return sid, codes, v, bkt, i, ser_start


def _trailing_gather(v: np.ndarray, i: np.ndarray, ser_start: np.ndarray,
                     k: int):
    """(n, k) trailing-window gather clipped at series starts. Returns
    (M, w, valid): the gathered matrix (garbage in invalid slots), each
    row's window length, and the validity mask."""
    win_start = np.maximum(i - (k - 1), ser_start)
    w = i - win_start + 1
    idx = i[:, None] - np.arange(k)[None, :]
    valid = idx >= win_start[:, None]
    M = v[np.maximum(idx, 0)]
    return M, w, valid


def hampel(rolled, k: int, *, c: int = 3, series_col: str = "series_id",
           order_col: str = "bucket", value_col: str = "sum_y",
           num_partitions: int = 8):
    """Hampel filter: per-row trailing-``k`` discrete median ``med``
    and discrete MAD (the (w-1)//2-th sorted |v_j - med| over the same
    window); ``is_outlier = |v - med| > c * MAD`` as an exact int64
    comparison. Replayed in SQL by a windowed ``quantile_disc`` for the
    median plus a bounded self-join (rows within k-1 preceding) grouped
    per anchor row for the MAD — MAD is a median of row-dependent
    deviations, which no single window frame can express."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if c < 1:
        raise ValueError(f"c must be >= 1, got {c}")
    mod = num_partitions * 64
    _add_part = make_add_part(series_col, mod)

    def _hampel(g: pa.Table) -> pa.Table:
        s_type = g[series_col].type
        if g.num_rows == 0:
            return pa.table({"series_id": pa.array([], s_type),
                             "bucket": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64()),
                             "med": pa.array([], pa.int64()),
                             "mad": pa.array([], pa.int64()),
                             "is_outlier": pa.array([], pa.int64())})
        sid, _, v, bkt, i, ser_start = _sorted_series(
            g, series_col, order_col, value_col)
        M, w, valid = _trailing_gather(v, i, ser_start, k)
        Ms = np.where(valid, M, _I64MAX)  # sentinel sorts last
        Ms.sort(axis=1)
        med = Ms[i, (w - 1) // 2]
        # deviations over the SAME window: invalid slots pinned to the
        # row's own median (|0|) first, then pushed past every real
        # deviation so the (w-1)//2 order statistic ignores them
        D = np.abs(np.where(valid, M, med[:, None]) - med[:, None])
        D[~valid] = _I64MAX
        D.sort(axis=1)
        mad = D[i, (w - 1) // 2]
        if mad.size and int(mad.max()) > _I64MAX // max(c, 1):
            raise OverflowError("hampel: c * MAD exceeds int64")
        out = (np.abs(v - med) > c * mad).astype(np.int64)
        return pa.table({"series_id": sid, "bucket": pa.array(bkt),
                         "v": pa.array(v), "med": pa.array(med),
                         "mad": pa.array(mad),
                         "is_outlier": pa.array(out)})

    parted = rolled.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _hampel, batch_format="pyarrow")


def bollinger_flags(rolled, k: int, *, nsig: int = 2,
                    series_col: str = "series_id",
                    order_col: str = "bucket", value_col: str = "max_y",
                    num_partitions: int = 8):
    """Bollinger-band breach flags over the trailing-``k`` window:
    with S = sum(window), Q = sum(window^2), n = window length, the row
    breaches the upper band iff ``n*v > S`` and
    ``(n*v - S)^2 > nsig^2 * (n*Q - S^2)`` (lower band symmetric) —
    the exact integer restatement of |v - mean| > nsig * stddev_pop,
    so no float sqrt/mean ever exists on either side. Values are
    magnitude-guarded (|v| < 2^27) so every intermediate provably fits
    int64; the SQL replay widens through HUGEINT instead."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not 1 <= nsig <= 4:
        raise ValueError(f"nsig must be in [1, 4], got {nsig}")
    mod = num_partitions * 64
    _add_part = make_add_part(series_col, mod)
    bound = np.int64(1) << 27

    def _boll(g: pa.Table) -> pa.Table:
        s_type = g[series_col].type
        if g.num_rows == 0:
            return pa.table({"series_id": pa.array([], s_type),
                             "bucket": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64()),
                             "q": pa.array([], pa.int64()),
                             "breach_up": pa.array([], pa.int64()),
                             "breach_dn": pa.array([], pa.int64())})
        sid, _, v, bkt, i, ser_start = _sorted_series(
            g, series_col, order_col, value_col)
        if v.size and int(np.abs(v).max()) >= bound:
            raise OverflowError(
                "bollinger_flags: |v| >= 2^27; exact int64 band test "
                "would overflow — rescale the series first")
        M, w, valid = _trailing_gather(v, i, ser_start, k)
        Mz = np.where(valid, M, 0)
        S = Mz.sum(axis=1)
        Q = (Mz * Mz).sum(axis=1)
        lhs_root = w * v - S               # |.| <= 2k * 2^27
        lhs = lhs_root * lhs_root          # <= 4k^2 * 2^54
        rhs = nsig * nsig * (w * Q - S * S)  # <= 16 k^2 * 2^54
        up = ((lhs_root > 0) & (lhs > rhs)).astype(np.int64)
        dn = ((lhs_root < 0) & (lhs > rhs)).astype(np.int64)
        return pa.table({"series_id": sid, "bucket": pa.array(bkt),
                         "v": pa.array(v), "n": pa.array(w.astype(np.int64)),
                         "s": pa.array(S), "q": pa.array(Q),
                         "breach_up": pa.array(up),
                         "breach_dn": pa.array(dn)})

    parted = rolled.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _boll, batch_format="pyarrow")


def max_drawdown(rolled, *, series_col: str = "series_id",
                 order_col: str = "bucket", value_col: str = "sum_y",
                 num_partitions: int = 8):
    """Per-series maximum drawdown: running max of the bucket values
    minus the current value; output each series' worst drawdown, the
    FIRST bucket attaining it, and the peak value at that point. One
    cumulative-max scan per partition (series boundaries reset via the
    segmented trick: offset each series' values by a distinct huge
    base so one global ``np.maximum.accumulate`` never leaks across
    series — all int64-exact under the |v| < 2^40 guard)."""
    mod = num_partitions * 64
    _add_part = make_add_part(series_col, mod)
    bound = np.int64(1) << 40

    def _dd(g: pa.Table) -> pa.Table:
        s_type = g[series_col].type
        if g.num_rows == 0:
            return pa.table({"series_id": pa.array([], s_type),
                             "max_dd": pa.array([], pa.int64()),
                             "at_bucket": pa.array([], pa.int64()),
                             "peak_v": pa.array([], pa.int64())})
        sid, codes, v, bkt, i, ser_start = _sorted_series(
            g, series_col, order_col, value_col)
        if v.size and int(np.abs(v).max()) >= bound:
            raise OverflowError("max_drawdown: |v| >= 2^40")
        if codes.size and int(codes.max()) >= (1 << 21):
            raise OverflowError("max_drawdown: > 2^21 series/partition")
        # series k's offset values live in [k*2^41 - 2^40, k*2^41 + 2^40]
        # — disjoint up to a shared boundary point, where equality makes
        # the carried cummax still decode to the correct value
        base = codes.astype(np.int64) << np.int64(41)
        runmax = np.maximum.accumulate(v + base) - base
        dd = runmax - v
        # per-series max drawdown + first attaining bucket: one sort by
        # (code, -dd, bucket) then first-row-per-series gather
        order = np.lexsort((bkt, -dd, codes))
        first = np.ones(len(order), dtype=bool)
        cs = codes[order]
        first[1:] = cs[1:] != cs[:-1]
        pick = order[first]
        return pa.table({
            "series_id": sid.take(pa.array(pick)),
            "max_dd": pa.array(dd[pick]),
            "at_bucket": pa.array(bkt[pick]),
            "peak_v": pa.array(runmax[pick])})

    parted = rolled.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _dd, batch_format="pyarrow")


def rsi_cutler(rolled, period: int, *, hi: int = 70, lo: int = 30,
               series_col: str = "series_id", order_col: str = "bucket",
               value_col: str = "sum_y", num_partitions: int = 8):
    """Cutler's RSI (simple-moving-average variant — the recursive
    Wilder smoothing is ``stages/smoothing.py`` territory): per diff
    row, trailing-``period`` sums of gains and losses carried as the
    exact rational pair (gain_sum, loss_sum); overbought iff
    ``100 * g > hi * (g + l)``, oversold iff ``100 * g < lo * (g + l)``
    (both 0 when g + l = 0: flat window, RSI undefined). Only rows
    that HAVE a diff (2nd bucket onward per series) are emitted,
    windows clipped at each series' first diff."""
    if period < 1:
        raise ValueError(f"period must be >= 1, got {period}")
    mod = num_partitions * 64
    _add_part = make_add_part(series_col, mod)

    def _rsi(g: pa.Table) -> pa.Table:
        s_type = g[series_col].type
        empty = pa.table({"series_id": pa.array([], s_type),
                          "bucket": pa.array([], pa.int64()),
                          "v": pa.array([], pa.int64()),
                          "nd": pa.array([], pa.int64()),
                          "gain_sum": pa.array([], pa.int64()),
                          "loss_sum": pa.array([], pa.int64()),
                          "overbought": pa.array([], pa.int64()),
                          "oversold": pa.array([], pa.int64())})
        if g.num_rows == 0:
            return empty
        sid, codes, v, bkt, i, ser_start = _sorted_series(
            g, series_col, order_col, value_col)
        isdiff = i > ser_start
        if not isdiff.any():
            return empty
        d = np.zeros_like(v)
        d[1:] = v[1:] - v[:-1]
        gain = np.where(isdiff, np.maximum(d, 0), 0)
        loss = np.where(isdiff, np.maximum(-d, 0), 0)
        # trailing-period sums over DIFF rows only: gather on the diff
        # subsequence, clipped at each series' first diff row
        j = np.flatnonzero(isdiff)
        gj, lj = gain[j], loss[j]
        ii = np.arange(len(j))
        # series-start index within the diff subsequence
        brk = np.ones(len(j), dtype=bool)
        cj = codes[j]
        brk[1:] = cj[1:] != cj[:-1]
        dstart = np.maximum.accumulate(np.where(brk, ii, 0))
        win_start = np.maximum(ii - (period - 1), dstart)
        w = ii - win_start + 1
        idx = ii[:, None] - np.arange(period)[None, :]
        valid = idx >= win_start[:, None]
        G = np.where(valid, gj[np.maximum(idx, 0)], 0).sum(axis=1)
        L = np.where(valid, lj[np.maximum(idx, 0)], 0).sum(axis=1)
        if G.size and int(max(G.max(), L.max())) > _I64MAX // 100:
            raise OverflowError("rsi_cutler: 100 * sum exceeds int64")
        tot = G + L
        ob = ((tot > 0) & (100 * G > hi * tot)).astype(np.int64)
        osold = ((tot > 0) & (100 * G < lo * tot)).astype(np.int64)
        return pa.table({
            "series_id": sid.take(pa.array(j)),
            "bucket": pa.array(bkt[j]), "v": pa.array(v[j]),
            "nd": pa.array(w.astype(np.int64)),
            "gain_sum": pa.array(G), "loss_sum": pa.array(L),
            "overbought": pa.array(ob), "oversold": pa.array(osold)})

    parted = rolled.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _rsi, batch_format="pyarrow")
