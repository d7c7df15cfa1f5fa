"""Events windowed aggregates (tumbling/sliding windows, sessions, rolling stats, anomaly).

Split from the former pipelines/queries.py monolith (r4 verdict
next-round #5); statement order inside this module is the original
file order. Explicit cross-module imports are generated: backward
dependencies at the top, forward (function-body-only) dependencies at
the bottom so package import order stays acyclic.
"""
from __future__ import annotations

from ._shared import US, W15M, W1H, _rd, _read_parquet_clean, pa, pc, rollup

# ---------------------------------------------------------------------------
# events windowed aggregates
# ---------------------------------------------------------------------------

def _events_series(sf_dir: str, cols=("event_type", "ts", "value")):
    rd = _rd()
    ds = _read_parquet_clean(f"{sf_dir}/events.parquet", columns=list(cols))

    def _prep(b: pa.Table) -> pa.Table:
        out = {c: b[c] for c in b.column_names if c != "ts"}
        out["ts_us"] = b["ts"].cast(pa.int64())
        return pa.table(out)

    return ds.map_batches(_prep, batch_format="pyarrow")


def q_window_events_1h(sf_dir: str):
    ds = _events_series(sf_dir)
    agg = rollup(ds, W1H, series_col="event_type", x_col="ts_us", y_col="value")

    def _fin(b: pa.Table) -> pa.Table:
        # 2-decimal doubles -> exact integer cents (order-independent)
        cents = pc.round(pc.multiply(b["sum_y"], 100.0), ndigits=0)
        return pa.table({
            "event_type": b["series_id"],
            "bucket": b["bucket"],
            "min_v": b["min_y"],
            "max_v": b["max_y"],
            "n": b["n"],
            "sum_cents": pc.cast(cents, pa.int64()),
        })

    return agg.map_batches(_fin, batch_format="pyarrow")


def q_sliding_events_1h_15m(sf_dir: str):
    """Hopping window: 1h windows every 15min over events by type."""
    from ...stages.windows import sliding_rollup

    ds = _events_series(sf_dir)
    agg = sliding_rollup(ds, W1H, W15M, series_col="event_type",
                         x_col="ts_us", y_col="value")

    def _fin(b: pa.Table) -> pa.Table:
        cents = pc.round(pc.multiply(b["sum_y"], 100.0), ndigits=0)
        return pa.table({
            "event_type": b["series_id"],
            "bucket": b["bucket"],
            "min_v": b["min_y"],
            "max_v": b["max_y"],
            "n": b["n"],
            "sum_cents": pc.cast(cents, pa.int64()),
        })

    return agg.map_batches(_fin, batch_format="pyarrow")


def q_sessions_users(sf_dir: str):
    """Session windows per user (30-min inactivity gap)."""
    from ...stages.windows import sessionize

    rd = _rd()
    ds = _read_parquet_clean(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id"])

    def _prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b["user_id"],
            "ts_us": b["ts"].cast(pa.int64()),
            "event_id": b["event_id"],
        })

    prepped = ds.map_batches(_prep, batch_format="pyarrow")
    return sessionize(prepped, 30 * 60 * US, series_col="user_id",
                      x_col="ts_us", id_col="event_id")


def q_rolling_stats_events(sf_dir: str):
    """Trailing 4-row window stats per event_type series (ROWS BETWEEN 3
    PRECEDING AND CURRENT ROW), ordered by (ts, event_id) — one hash
    shuffle then one vectorized pass per partition."""
    from ...stages.windows import rolling_stats

    ds = _events_cents(sf_dir)
    # num_partitions sized to the series cardinality (4 event types): the
    # dense-part-code contract needs #series >> partitions or sort reducers
    # emit schema-less empty blocks
    return rolling_stats(ds, 4, series_col="event_type", x_col="ts_us",
                         y_col="cents", id_col="event_id", num_partitions=2)


ROLLING_STATS_SQL = """
WITH e AS (
    SELECT event_type, event_id, epoch_us(ts) AS ts_us,
           CAST(round(value * 100) AS BIGINT) AS cents
    FROM events
)
SELECT event_type, ts_us, event_id,
       min(cents) OVER w AS roll_min,
       max(cents) OVER w AS roll_max,
       CAST(sum(cents) OVER w AS BIGINT) AS roll_sum,
       count(*) OVER w AS roll_n,
       CAST(sum(cents) OVER w AS DOUBLE) / count(*) OVER w AS roll_mean
FROM e
WINDOW w AS (PARTITION BY event_type ORDER BY ts_us, event_id
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
"""


def q_anomaly_events(sf_dir: str):
    """Trailing-window z-score anomalies per event_type series: flag rows
    more than 3 reference-stddevs from the mean of the 8 preceding rows.
    The z-test is pure integer arithmetic ((n*y-s)^2 > t^2*(n*q-s^2)), so
    the flag column itself is hash-exact against the SQL window replay."""
    from ...stages.windows import detect_anomalies

    ds = _events_cents(sf_dir)
    return detect_anomalies(ds, 8, 3, series_col="event_type",
                            x_col="ts_us", y_col="cents",
                            id_col="event_id", num_partitions=2)


ANOMALY_SQL = """
WITH e AS (
    SELECT event_type, event_id, epoch_us(ts) AS ts_us,
           CAST(round(value * 100) AS BIGINT) AS cents
    FROM events
),
w AS (
    SELECT event_type, ts_us, event_id, cents,
           count(*) OVER wref AS ref_n,
           CAST(COALESCE(sum(cents) OVER wref, 0) AS BIGINT) AS ref_sum,
           CAST(COALESCE(sum(cents * cents) OVER wref, 0) AS BIGINT)
               AS ref_sumsq
    FROM e
    WINDOW wref AS (PARTITION BY event_type ORDER BY ts_us, event_id
                    ROWS BETWEEN 8 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, ts_us, event_id, cents, ref_n, ref_sum, ref_sumsq,
       (ref_n >= 2 AND
        (ref_n * cents - ref_sum) * (ref_n * cents - ref_sum)
          > 9 * (ref_n * ref_sumsq - ref_sum * ref_sum)) AS is_anomaly
FROM w
"""




# forward deps (referenced only inside function bodies above);
# imported after all of this module's definitions to keep the package
# import order acyclic
from .downsample_core import _events_cents  # noqa: E402
