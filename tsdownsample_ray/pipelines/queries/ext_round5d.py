"""Round-5 closing wave, part 4: robust-filter / technical-indicator
operators over the tier rollups (``stages/indicators.py``) — Hampel
despike, Bollinger-band breaches, max drawdown, Cutler RSI.

Each entry follows the catalog contract: a Ray-Data-first distributed
shape documented in place, integer-exact arithmetic so the DuckDB
oracle replays bit-identically, and column names matched between both
sides.
"""
from __future__ import annotations

from ._shared import W1H, W15M, pa

from .downsample_core import _events_cents


def _rolled(sf_dir: str, window_us: int):
    from ...stages.rollup import rollup

    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    return rollup(ev.map_batches(_series, batch_format="pyarrow"),
                  window_us)


_ROLLED_CTE = """
WITH e AS (
    SELECT event_type AS series_id,
           epoch_us(ts) // {w} * {w} AS bucket,
           CAST(round(value * 100) AS BIGINT) AS cents,
           value
    FROM events
),
r AS (
    SELECT series_id, bucket,
           CAST(sum(cents) AS BIGINT) AS v,
           CAST(max(cents) AS BIGINT) AS vmax
    FROM e GROUP BY series_id, bucket
)
"""


def q_hampel_15m(sf_dir: str):
    """Hampel despike filter over the 15-min tier
    (``stages/indicators.py:hampel``): trailing-5 discrete median +
    discrete MAD per row, outlier iff |v - med| > 3 * MAD — the robust
    outlier detector the plain z-score window (``rolling_stats``) can't
    be (mean/std are themselves corrupted by the spike). One
    hash(series) shuffle, one (n, k) vectorized window gather per
    partition, all int64."""
    from ...stages.indicators import hampel

    return hampel(_rolled(sf_dir, W15M), 5, c=3, num_partitions=2)


HAMPEL_SQL = _ROLLED_CTE.format(w=W15M) + """,
m AS (
    SELECT series_id, bucket, v,
           quantile_disc(v, 0.5) OVER (
               PARTITION BY series_id ORDER BY bucket
               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS med,
           row_number() OVER (PARTITION BY series_id
                              ORDER BY bucket) AS rn
    FROM r
)
SELECT a.series_id, a.bucket, a.v, a.med,
       quantile_disc(abs(b.v - a.med), 0.5) AS mad,
       CAST(abs(a.v - a.med) > 3 * quantile_disc(abs(b.v - a.med), 0.5)
            AS BIGINT) AS is_outlier
FROM m a JOIN m b
  ON b.series_id = a.series_id AND b.rn BETWEEN a.rn - 4 AND a.rn
GROUP BY a.series_id, a.bucket, a.v, a.med
"""


def q_bollinger_1h(sf_dir: str):
    """Bollinger-band breach flags over the 1h tier
    (``stages/indicators.py:bollinger_flags``): per-bucket MAX cents
    (price-like, magnitude-bounded) against the trailing-8 window's
    mean +/- 2 sigma band, decided by the exact integer
    cross-multiplication (n*v - S)^2 > 4 * (n*Q - S^2) — sigma never
    exists as a float on either side; the oracle widens through
    HUGEINT where the engine carries proven-in-range int64."""
    from ...stages.indicators import bollinger_flags

    return bollinger_flags(_rolled(sf_dir, W1H), 8, nsig=2,
                           value_col="max_y", num_partitions=2)


BOLLINGER_SQL = _ROLLED_CTE.format(w=W1H) + """,
wnd AS (
    SELECT series_id, bucket, vmax AS v,
           CAST(count(*) OVER w AS BIGINT) AS n,
           CAST(sum(vmax) OVER w AS BIGINT) AS s,
           CAST(sum(vmax * vmax) OVER w AS BIGINT) AS q
    FROM r
    WINDOW w AS (PARTITION BY series_id ORDER BY bucket
                 ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)
)
SELECT series_id, bucket, v, n, s, q,
       CAST(n * v > s AND
            CAST(n * v - s AS HUGEINT) * (n * v - s)
            > 4 * (CAST(n AS HUGEINT) * q - CAST(s AS HUGEINT) * s)
            AS BIGINT) AS breach_up,
       CAST(n * v < s AND
            CAST(n * v - s AS HUGEINT) * (n * v - s)
            > 4 * (CAST(n AS HUGEINT) * q - CAST(s AS HUGEINT) * s)
            AS BIGINT) AS breach_dn
FROM wnd
"""


def q_drawdown_1h(sf_dir: str):
    """Per-series maximum drawdown over the 1h tier
    (``stages/indicators.py:max_drawdown``): running max minus current
    bucket sum, reduced to each series' worst drawdown, the FIRST
    bucket attaining it and the peak value there — one segmented
    cumulative-max scan per partition, one lexsort, <= |series| output
    rows."""
    from ...stages.indicators import max_drawdown

    return max_drawdown(_rolled(sf_dir, W1H), num_partitions=2)


DRAWDOWN_SQL = _ROLLED_CTE.format(w=W1H) + """,
dd AS (
    SELECT series_id, bucket, v,
           max(v) OVER (PARTITION BY series_id ORDER BY bucket
                        ROWS UNBOUNDED PRECEDING) AS runmax
    FROM r
),
rk AS (
    SELECT series_id, runmax - v AS dd, bucket, runmax,
           row_number() OVER (PARTITION BY series_id
                              ORDER BY runmax - v DESC, bucket) AS rn
    FROM dd
)
SELECT series_id, CAST(dd AS BIGINT) AS max_dd,
       CAST(bucket AS BIGINT) AS at_bucket,
       CAST(runmax AS BIGINT) AS peak_v
FROM rk WHERE rn = 1
"""


def q_rsi_1h(sf_dir: str):
    """Cutler RSI over the 1h tier (``stages/indicators.py:
    rsi_cutler``): per diff row the trailing-14 gain/loss sums as an
    exact rational pair plus integer-cross-multiplied overbought (>70)
    / oversold (<30) flags — RSI itself is never a float. Only rows
    with a predecessor in their series are emitted."""
    from ...stages.indicators import rsi_cutler

    return rsi_cutler(_rolled(sf_dir, W1H), 14, num_partitions=2)


RSI_SQL = _ROLLED_CTE.format(w=W1H) + """,
d AS (
    SELECT series_id, bucket, v,
           v - lag(v) OVER (PARTITION BY series_id ORDER BY bucket)
               AS diff
    FROM r
),
f AS (SELECT * FROM d WHERE diff IS NOT NULL),
wnd AS (
    SELECT series_id, bucket, v,
           CAST(count(*) OVER w AS BIGINT) AS nd,
           CAST(sum(greatest(diff, 0)) OVER w AS BIGINT) AS gain_sum,
           CAST(sum(greatest(-diff, 0)) OVER w AS BIGINT) AS loss_sum
    FROM f
    WINDOW w AS (PARTITION BY series_id ORDER BY bucket
                 ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
)
SELECT series_id, bucket, v, nd, gain_sum, loss_sum,
       CAST(gain_sum + loss_sum > 0 AND
            100 * gain_sum > 70 * (gain_sum + loss_sum)
            AS BIGINT) AS overbought,
       CAST(gain_sum + loss_sum > 0 AND
            100 * gain_sum < 30 * (gain_sum + loss_sum)
            AS BIGINT) AS oversold
FROM wnd
"""


def q_for_bitpack_15m(sf_dir: str):
    """Frame-of-reference bit-packing manifest over the 15m tier
    (``stages/compress.py:for_bitpack_frames``): per 128-bucket frame
    per series, the re-based bit width (``length(bin(max - min))``
    semantics), packed byte size and delta checksum; the packing itself
    is really executed and roundtrip-asserted inside each task. The
    integer-codec sibling of the Gorilla XOR chunks
    (``compress_roundtrip_15m``)."""
    from ...stages.compress import for_bitpack_frames

    return for_bitpack_frames(_rolled(sf_dir, W15M), frame=128,
                              num_partitions=2)


FOR_BITPACK_SQL = _ROLLED_CTE.format(w=W15M) + """,
idx AS (
    SELECT series_id, bucket, v,
           (row_number() OVER (PARTITION BY series_id ORDER BY bucket)
            - 1) // 128 AS frame
    FROM r
)
SELECT series_id, frame, CAST(count(*) AS BIGINT) AS n,
       CAST(min(v) AS BIGINT) AS min_v,
       CAST(length(bin(max(v) - min(v))) AS BIGINT) AS bits,
       CAST((count(*) * length(bin(max(v) - min(v))) + 7) // 8
            AS BIGINT) AS packed_bytes,
       CAST(sum(v) - count(*) * min(v) AS BIGINT) AS sum_delta
FROM idx GROUP BY series_id, frame
"""


def q_croston_1h(sf_dir: str):
    """Croston intermittent-demand forecast states over a SPARSE
    series — hourly counts of the rare event subset (event_id % 13 ==
    0) per event_type (``stages/smoothing.py:croston_fixed_point``):
    demand-size SES z (alpha 1/8) + inter-demand-interval SES p (alpha
    1/8), intervals derived from bucket gaps so silent hours need no
    zero rows; the forecast stays the exact rational (z, p). Completes
    the forecasting family (naive/snaive/EWMA/Holt/HW/Kalman) with its
    intermittent-demand member."""
    from ...stages.rollup import rollup
    from ...stages.smoothing import croston_fixed_point

    ev = _events_cents(sf_dir)

    def _rare(b: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        eid = b["event_id"]
        keep = _pc.equal(
            _pc.subtract(eid, _pc.multiply(
                _pc.divide(eid, pa.scalar(13, pa.int64())),
                pa.scalar(13, pa.int64()))),
            pa.scalar(0, pa.int64()))
        t = b.filter(keep)
        ones = pa.array([1] * t.num_rows, pa.int64())
        return pa.table({"series_id": t["event_type"], "x": t["ts_us"],
                         "y": ones})

    rolled = rollup(ev.map_batches(_rare, batch_format="pyarrow"), W1H)
    return croston_fixed_point(rolled, 3, 3, window_us=W1H,
                               num_partitions=2)


CROSTON_SQL = f"""
WITH RECURSIVE numbered AS MATERIALIZED (
    SELECT series_id, bucket, y,
           row_number() OVER (PARTITION BY series_id
                              ORDER BY bucket) AS idx
    FROM (
        SELECT event_type AS series_id,
               epoch_us(ts) // {W1H} * {W1H} AS bucket,
               CAST(count(*) AS BIGINT) AS y
        FROM events WHERE event_id % 13 = 0
        GROUP BY 1, 2
    )
),
rec AS (
    SELECT series_id, bucket, y, idx,
           CAST(0 AS BIGINT) AS q, y AS z, CAST(1 AS BIGINT) AS p
    FROM numbered WHERE idx = 1
    UNION ALL
    SELECT w.series_id, w.bucket, w.y, w.idx, w.q,
           -- exact BIGINT floor(v / 2^3): DuckDB // truncates toward
           -- zero, so negatives take -((-v + 7) // 8)
           w.z + (CASE WHEN w.y - w.z >= 0 THEN (w.y - w.z) // 8
                  ELSE -(((-(w.y - w.z)) + 7) // 8) END),
           w.p + (CASE WHEN w.q - w.p >= 0 THEN (w.q - w.p) // 8
                  ELSE -(((-(w.q - w.p)) + 7) // 8) END)
    FROM (
        SELECT n.series_id, n.bucket, n.y, n.idx,
               (n.bucket - r.bucket) // {W1H} AS q,
               r.z AS z, r.p AS p
        FROM rec r JOIN numbered n
          ON n.series_id = r.series_id AND n.idx = r.idx + 1
    ) w
)
SELECT series_id, bucket, y, q, z, p FROM rec
"""
