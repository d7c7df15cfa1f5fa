"""Per-series statistics: resample, correlation, quantiles, seasonal, EWMA, time-weighted averages, as-of enrich.

Split from the former pipelines/queries.py monolith (r4 verdict
next-round #5); statement order inside this module is the original
file order. Explicit cross-module imports are generated: backward
dependencies at the top, forward (function-body-only) dependencies at
the bottom so package import order stays acyclic.
"""
from __future__ import annotations

from ._shared import US, _read_parquet_clean, pa, pc
from .downsample_core import _events_cents

def q_resample_linear_15m(sf_dir: str):
    """Linear-interpolation resample of every event_type series onto the
    uniform 15-minute grid (``stages/resample.py``): ONE hash(series)
    shuffle, one vectorized composite-key searchsorted per partition.
    Duplicate timestamps collapse to the max-event_id row; exact grid
    hits return the sample. DuckDB oracle: two ASOF joins (floor +
    ceiling bracket) with the identical float expression."""
    from ...stages.resample import resample_linear

    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"event_type": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"], "event_id": b["event_id"]})

    ds = ev.map_batches(_series, batch_format="pyarrow")
    return resample_linear(ds, 900 * US, series_col="event_type",
                           x_col="x", y_col="y", id_col="event_id",
                           num_partitions=2)


RESAMPLE_SQL = """
WITH e AS (
    SELECT event_type, epoch_us(ts) AS ts_us,
           CAST(round(value * 100) AS BIGINT) AS cents, event_id
    FROM events
),
s AS (
    SELECT event_type, ts_us, arg_max(cents, event_id) AS cents
    FROM e GROUP BY event_type, ts_us
),
b AS (
    SELECT event_type,
           (min(ts_us) + 899999999) // 900000000 AS lo_k,
           max(ts_us) // 900000000 AS hi_k
    FROM s GROUP BY event_type
),
g AS (
    SELECT event_type, unnest(range(lo_k, hi_k + 1)) * 900000000 AS t_us
    FROM b WHERE hi_k >= lo_k
),
p AS (
    SELECT g.event_type, g.t_us, s.ts_us AS x0, s.cents AS y0
    FROM g ASOF JOIN s
      ON g.event_type = s.event_type AND g.t_us >= s.ts_us
),
nsrc AS (SELECT event_type, -ts_us AS neg_ts, ts_us, cents FROM s),
n AS (
    SELECT g.event_type, g.t_us, nsrc.ts_us AS x1, nsrc.cents AS y1
    FROM g ASOF JOIN nsrc
      ON g.event_type = nsrc.event_type AND -g.t_us >= nsrc.neg_ts
)
SELECT p.event_type, p.t_us,
       CASE WHEN n.x1 = p.x0 THEN CAST(n.y1 AS DOUBLE)
            ELSE CAST(p.y0 AS DOUBLE)
                 + CAST(n.y1 - p.y0 AS DOUBLE)
                   * CAST(p.t_us - p.x0 AS DOUBLE)
                   / CAST(n.x1 - p.x0 AS DOUBLE)
       END AS value
FROM p JOIN n ON p.event_type = n.event_type AND p.t_us = n.t_us
"""


def q_corr_pairs_15m(sf_dir: str):
    """Pairwise Pearson correlation between event_type series over their
    co-populated 15m buckets (``stages/correlate.py``): rollup ->
    hash(bucket) pair expansion -> integer sufficient statistics ->
    pinned-IEEE corr. All-ways exact: the stats are int64 sums."""
    from ...stages.correlate import pairwise_correlation
    from ...stages.rollup import rollup

    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    rolled = rollup(ev.map_batches(_series, batch_format="pyarrow"),
                    900 * US)
    return pairwise_correlation(rolled, num_partitions=2)


CORR_PAIRS_SQL = """
WITH e AS (
    SELECT event_type, epoch_us(ts) AS ts_us,
           CAST(round(value * 100) AS BIGINT) AS cents
    FROM events
),
r AS (
    SELECT event_type, ts_us // 900000000 * 900000000 AS bucket,
           CAST(sum(cents) AS BIGINT) AS s
    FROM e GROUP BY event_type, bucket
),
p AS (
    SELECT a.event_type AS s1, b.event_type AS s2, a.s AS x, b.s AS y
    FROM r a JOIN r b
      ON a.bucket = b.bucket AND a.event_type < b.event_type
),
st AS (
    SELECT s1, s2, count(*) AS n,
           CAST(sum(x) AS BIGINT) AS sum_x,
           CAST(sum(y) AS BIGINT) AS sum_y,
           CAST(sum(x * y) AS BIGINT) AS sum_xy,
           CAST(sum(x * x) AS BIGINT) AS sum_xx,
           CAST(sum(y * y) AS BIGINT) AS sum_yy
    FROM p GROUP BY s1, s2
)
SELECT s1, s2, n, sum_x, sum_y, sum_xy, sum_xx, sum_yy,
       CASE WHEN (CAST(n AS DOUBLE) * CAST(sum_xx AS DOUBLE)
                  - CAST(sum_x AS DOUBLE) * CAST(sum_x AS DOUBLE))
                 * (CAST(n AS DOUBLE) * CAST(sum_yy AS DOUBLE)
                    - CAST(sum_y AS DOUBLE) * CAST(sum_y AS DOUBLE)) > 0
            THEN (CAST(n AS DOUBLE) * CAST(sum_xy AS DOUBLE)
                  - CAST(sum_x AS DOUBLE) * CAST(sum_y AS DOUBLE))
                 / sqrt((CAST(n AS DOUBLE) * CAST(sum_xx AS DOUBLE)
                         - CAST(sum_x AS DOUBLE) * CAST(sum_x AS DOUBLE))
                        * (CAST(n AS DOUBLE) * CAST(sum_yy AS DOUBLE)
                           - CAST(sum_y AS DOUBLE) * CAST(sum_y AS DOUBLE)))
            ELSE NULL
       END AS corr
FROM st
"""


def q_spearman_pairs_15m(sf_dir: str):
    """Pairwise SPEARMAN correlation between event_type series
    (``stages/quantiles.py:rank2avg`` + ``correlate.pairwise_correlation``):
    tie-aware 2x-average-rank transform per series (exact int64, one
    hash(series) shuffle), then Pearson over the co-populated buckets of
    the rank values. Rank-once-then-align (the scalable Spearman
    convention; per-pair re-ranking would be O(pairs x buckets)) —
    replayed identically in SQL."""
    from ...stages.correlate import pairwise_correlation
    from ...stages.quantiles import rank2avg
    from ...stages.rollup import rollup

    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    rolled = rollup(ev.map_batches(_series, batch_format="pyarrow"),
                    900 * US)
    ranks = rank2avg(rolled, num_partitions=2)
    return pairwise_correlation(ranks, num_partitions=2)


SPEARMAN_SQL = """
WITH e AS (
    SELECT event_type, epoch_us(ts) AS ts_us,
           CAST(round(value * 100) AS BIGINT) AS cents
    FROM events
),
r AS (
    SELECT event_type, ts_us // 900000000 * 900000000 AS bucket,
           CAST(sum(cents) AS BIGINT) AS v
    FROM e GROUP BY event_type, bucket
),
rk AS (
    SELECT event_type, bucket,
           2 * rank() OVER (PARTITION BY event_type ORDER BY v)
           + count(*) OVER (PARTITION BY event_type, v) - 1 AS s
    FROM r
),
p AS (
    SELECT a.event_type AS s1, b.event_type AS s2, a.s AS x, b.s AS y
    FROM rk a JOIN rk b
      ON a.bucket = b.bucket AND a.event_type < b.event_type
),
st AS (
    SELECT s1, s2, count(*) AS n,
           CAST(sum(x) AS BIGINT) AS sum_x,
           CAST(sum(y) AS BIGINT) AS sum_y,
           CAST(sum(x * y) AS BIGINT) AS sum_xy,
           CAST(sum(x * x) AS BIGINT) AS sum_xx,
           CAST(sum(y * y) AS BIGINT) AS sum_yy
    FROM p GROUP BY s1, s2
)
SELECT s1, s2, n, sum_x, sum_y, sum_xy, sum_xx, sum_yy,
       CASE WHEN (CAST(n AS DOUBLE) * CAST(sum_xx AS DOUBLE)
                  - CAST(sum_x AS DOUBLE) * CAST(sum_x AS DOUBLE))
                 * (CAST(n AS DOUBLE) * CAST(sum_yy AS DOUBLE)
                    - CAST(sum_y AS DOUBLE) * CAST(sum_y AS DOUBLE)) > 0
            THEN (CAST(n AS DOUBLE) * CAST(sum_xy AS DOUBLE)
                  - CAST(sum_x AS DOUBLE) * CAST(sum_y AS DOUBLE))
                 / sqrt((CAST(n AS DOUBLE) * CAST(sum_xx AS DOUBLE)
                         - CAST(sum_x AS DOUBLE) * CAST(sum_x AS DOUBLE))
                        * (CAST(n AS DOUBLE) * CAST(sum_yy AS DOUBLE)
                           - CAST(sum_y AS DOUBLE) * CAST(sum_y AS DOUBLE)))
            ELSE NULL
       END AS corr
FROM st
"""


def q_profile_events(sf_dir: str):
    """Table profiling / ANALYZE (``stages/profile.py:profile_columns``):
    per-column n / nulls / min / max / exact NDV over the events table in
    one pass — constant-size moment partials plus the standard exact-ndv
    exchange (per-block unique collapse, one hash(column,value)
    shuffle)."""
    from ...stages.profile import profile_columns

    ds = _read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "value"]).repartition(8)

    def _cols(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": b["event_id"], "user_id": b["user_id"],
            "ts_us": pc.cast(b["ts"], pa.int64()),
            "cents": pc.cast(pc.round(pc.multiply(b["value"], 100.0),
                                      ndigits=0), pa.int64()),
        })

    return profile_columns(ds.map_batches(_cols, batch_format="pyarrow"),
                           ["event_id", "user_id", "ts_us", "cents"],
                           num_partitions=4)


PROFILE_SQL = """
WITH e AS (
    SELECT event_id, user_id, epoch_us(ts) AS ts_us,
           CAST(round(value * 100) AS BIGINT) AS cents
    FROM events
)
SELECT 'event_id' AS column, count(*) AS n,
       count(*) - count(event_id) AS n_null,
       min(event_id) AS min_v, max(event_id) AS max_v,
       count(DISTINCT event_id) AS ndv FROM e
UNION ALL
SELECT 'user_id', count(*), count(*) - count(user_id),
       min(user_id), max(user_id), count(DISTINCT user_id) FROM e
UNION ALL
SELECT 'ts_us', count(*), count(*) - count(ts_us),
       min(ts_us), max(ts_us), count(DISTINCT ts_us) FROM e
UNION ALL
SELECT 'cents', count(*), count(*) - count(cents),
       min(cents), max(cents), count(DISTINCT cents) FROM e
"""


def q_state_changes_events(sf_dir: str):
    """State-change compression (``stages/diffing.py:state_changes``):
    per event_type series keep the first event + every value change; the
    kept rows losslessly encode step-function telemetry (``run_len``
    audit sums back to the input row count). One hash(series) shuffle,
    one sorted shift-compare pass. Values are quantized to decicents
    (cents // 10) so runs actually occur."""
    from ...stages.diffing import state_changes

    ds = _read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "event_type", "value"]).repartition(8)

    def _cols(b: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(b["value"], 100.0),
                                 ndigits=0), pa.int64())
        return pa.table({
            "series_id": b["event_type"],
            "ts_us": pc.cast(b["ts"], pa.int64()),
            "event_id": b["event_id"],
            "v": pc.divide(cents, pa.scalar(1000, pa.int64())),
        })

    return state_changes(ds.map_batches(_cols, batch_format="pyarrow"),
                         num_partitions=4)


STATE_CHANGES_SQL = """
WITH e AS (
    SELECT event_type AS series_id, epoch_us(ts) AS ts_us, event_id,
           CAST(round(value * 100) AS BIGINT) // 1000 AS v
    FROM events
),
s AS (
    SELECT *,
           lag(v) OVER w AS prev_v,
           row_number() OVER w AS rk,
           count(*) OVER (PARTITION BY series_id) AS n_rows
    FROM e
    WINDOW w AS (PARTITION BY series_id ORDER BY ts_us, event_id)
),
kept AS (
    SELECT series_id, ts_us, event_id, v, rk, n_rows,
           lead(rk) OVER (PARTITION BY series_id ORDER BY rk) AS next_rk
    FROM s WHERE prev_v IS NULL OR v <> prev_v
)
SELECT series_id, ts_us, event_id, v,
       CAST(COALESCE(next_rk, n_rows + 1) - rk AS BIGINT) AS run_len
FROM kept
"""


def q_kmeans_embeddings(sf_dir: str):
    """Integer Lloyd k-means (k=4, 2 updates) over the embeddings table
    (``stages/similarity.py:kmeans_integer``): trunc-quantized int64
    components, exact integer distances, floor-division centroid
    updates, smallest-id tie-breaks — every iteration replays in SQL
    (unrolled CTEs with DuckDB list arithmetic). Per round: broadcast
    centroids, map-side k x d partial sums, constant-size hashpart
    merge."""
    from ...stages.similarity import kmeans_integer

    ds = _read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding"]).repartition(4)
    return kmeans_integer(ds, k=4, updates=2, scale=1000,
                          num_partitions=4)


def _kmeans_sql(k: int = 4, updates: int = 2, scale: int = 1000,
                dim: int = 64) -> str:
    d2 = ("list_dot_product(q.v, q.v) + list_dot_product(c.v, c.v)"
          " - 2 * list_dot_product(q.v, c.v)")
    ctes = [f"""q AS (
    SELECT vec_id,
           list_transform(embedding,
               x -> CAST(trunc(CAST(x AS DOUBLE) * {scale}) AS BIGINT))
               AS v
    FROM embeddings
)""", f"""c0 AS (SELECT vec_id AS k, v FROM q WHERE vec_id < {k})"""]

    def _assign(name: str, cprev: str) -> str:
        return f"""{name} AS (
    SELECT vec_id, k, d2 FROM (
        SELECT q.vec_id, c.k, CAST({d2} AS BIGINT) AS d2,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY {d2}, c.k) AS rn
        FROM q CROSS JOIN {cprev} c)
    WHERE rn = 1
)"""

    cprev = "c0"
    for it in range(1, updates + 1):
        ctes.append(_assign(f"a{it}", cprev))
        ctes.append(f"""s{it} AS (
    SELECT a.k, r.range AS i, CAST(sum(q.v[r.range]) AS BIGINT) AS s,
           count(*) AS n
    FROM a{it} a JOIN q USING (vec_id) CROSS JOIN range(1, {dim + 1}) r
    GROUP BY a.k, r.range
)""")
        ctes.append(f"""c{it} AS (
    SELECT p.k, list(CASE WHEN s.n IS NULL THEN p.v[r.range]
                          ELSE s.s // s.n END ORDER BY r.range) AS v
    FROM {cprev} p CROSS JOIN range(1, {dim + 1}) r
    LEFT JOIN s{it} s ON s.k = p.k AND s.i = r.range
    GROUP BY p.k
)""")
        cprev = f"c{it}"
    ctes.append(_assign("afinal", cprev))
    joined = ",\n".join(ctes)
    return f"""
WITH {joined}
SELECT vec_id, k AS cluster, d2 FROM afinal
"""


KMEANS_SQL = _kmeans_sql()


def q_ewma_15m(sf_dir: str):
    """Fixed-point EWMA (alpha = 1/8) over the 15m rollup tier
    (``stages/smoothing.py``): integer state, exact replay; the DuckDB
    oracle is a recursive CTE walking each series' buckets in order."""
    from ...stages.rollup import rollup
    from ...stages.smoothing import ewma_fixed_point

    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    rolled = rollup(ev.map_batches(_series, batch_format="pyarrow"),
                    900 * US)
    return ewma_fixed_point(rolled, k=3, num_partitions=2)


EWMA_SQL = """
WITH RECURSIVE numbered AS MATERIALIZED (
    SELECT event_type AS series_id, bucket, y,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY bucket) AS idx
    FROM (
        SELECT event_type, epoch_us(ts) // 900000000 * 900000000 AS bucket,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
        FROM events GROUP BY event_type, bucket
    )
),
rec AS (
    SELECT series_id, bucket, y, idx, y AS ema
    FROM numbered WHERE idx = 1
    UNION ALL
    SELECT n.series_id, n.bucket, n.y, n.idx,
           -- exact BIGINT floor(v / 8): DuckDB // truncates toward zero,
           -- so negatives take -((-v + 7) // 8); no double round-trip,
           -- so the replay stays exact past 2^53 (r4 advice)
           r.ema + (CASE WHEN n.y - r.ema >= 0 THEN (n.y - r.ema) // 8
                    ELSE -(((-(n.y - r.ema)) + 7) // 8) END)
    FROM rec r JOIN numbered n
      ON n.series_id = r.series_id AND n.idx = r.idx + 1
)
SELECT series_id, bucket, y, ema FROM rec
"""


def q_interarrival_quantiles_events(sf_dir: str):
    """Composite: per-series inter-arrival deltas
    (``stages/rate.py:series_diffs``) -> exact p50/p90/p99
    (``stages/quantiles.py``) — the crawl-politeness / sampling-cadence
    audit. Two hash(series) shuffles (a composite of two one-shuffle
    operators)."""
    from ...stages.quantiles import exact_quantiles
    from ...stages.rate import series_diffs

    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "event_id": b["event_id"]})

    ds = ev.map_batches(_series, batch_format="pyarrow")
    diffs = series_diffs(ds, tiebreak_col="event_id", num_partitions=2)
    return exact_quantiles(diffs, probs=(50, 90, 99), order_col="x",
                           value_col="delta", num_partitions=2)


INTERARRIVAL_SQL = """
WITH e AS (
    SELECT event_type AS series_id, event_id, epoch_us(ts) AS ts_us
    FROM events
),
d AS (
    SELECT series_id, ts_us AS x,
           ts_us - lag(ts_us) OVER (PARTITION BY series_id
                                    ORDER BY ts_us, event_id) AS delta
    FROM e
),
f AS (SELECT * FROM d WHERE delta IS NOT NULL),
o AS (
    SELECT series_id, delta,
           row_number() OVER (PARTITION BY series_id
                              ORDER BY delta, x) - 1 AS rk,
           count(*) OVER (PARTITION BY series_id) AS n
    FROM f
)
SELECT series_id, CAST(max(n) AS BIGINT) AS n,
       max(CASE WHEN rk = (n - 1) * 50 // 100 THEN delta END) AS p50,
       max(CASE WHEN rk = (n - 1) * 90 // 100 THEN delta END) AS p90,
       max(CASE WHEN rk = (n - 1) * 99 // 100 THEN delta END) AS p99
FROM o GROUP BY series_id
"""


def q_threshold_crossings_events(sf_dir: str):
    """Alerting primitive (``stages/rate.py:threshold_crossings``): one
    row per 50.00-threshold crossing of each event_type series, with
    direction (1 = fire, -1 = recover). Cross-block predecessors via ONE
    hash(series) shuffle; the SQL oracle is a lag() window replay."""
    from ...stages.rate import threshold_crossings

    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"], "event_id": b["event_id"]})

    ds = ev.map_batches(_series, batch_format="pyarrow")
    return threshold_crossings(ds, 5000, tiebreak_col="event_id",
                               num_partitions=2)


THRESHOLD_CROSSINGS_SQL = """
WITH e AS (
    SELECT event_type AS series_id, event_id, epoch_us(ts) AS ts_us,
           CAST(round(value * 100) AS BIGINT) AS cents
    FROM events
),
o AS (
    SELECT series_id, ts_us AS x, cents AS y,
           lag(cents) OVER (PARTITION BY series_id
                            ORDER BY ts_us, event_id) AS prev
    FROM e
)
SELECT series_id, x, y,
       CAST(CASE WHEN prev < 5000 THEN 1 ELSE -1 END AS BIGINT) AS direction
FROM o
WHERE prev IS NOT NULL
  AND ((prev < 5000 AND y >= 5000) OR (prev >= 5000 AND y < 5000))
"""


def q_twa_events_1h(sf_dir: str):
    """Time-weighted average per (event_type, 1h bucket)
    (``stages/twa.py``): step-hold integral in exact int64
    cents-microseconds; one hash(series) shuffle. DuckDB oracle: lead()
    spans exploded over their overlapped buckets."""
    from ...stages.twa import time_weighted_avg

    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"], "event_id": b["event_id"]})

    ds = ev.map_batches(_series, batch_format="pyarrow")
    return time_weighted_avg(ds, 3600 * US, id_col="event_id",
                             num_partitions=2)


TWA_SQL = """
WITH e AS (
    SELECT event_type AS series_id, event_id, epoch_us(ts) AS ts_us,
           CAST(round(value * 100) AS BIGINT) AS cents
    FROM events
),
o AS (
    SELECT series_id, ts_us AS t0, cents AS v,
           lead(ts_us) OVER (PARTITION BY series_id
                             ORDER BY ts_us, event_id) AS t1
    FROM e
),
spans AS (SELECT * FROM o WHERE t1 IS NOT NULL AND t1 > t0),
pieces AS (
    SELECT series_id, v,
           k * 3600000000 AS bucket,
           greatest(t0, k * 3600000000) AS lo,
           least(t1, (k + 1) * 3600000000) AS hi
    FROM spans,
         unnest(range(t0 // 3600000000, (t1 - 1) // 3600000000 + 1)) r(k)
)
SELECT series_id, bucket,
       CAST(sum(v * (hi - lo)) AS BIGINT) AS num,
       CAST(sum(hi - lo) AS BIGINT) AS den,
       CAST(sum(v * (hi - lo)) AS DOUBLE) / CAST(sum(hi - lo) AS DOUBLE)
         AS twa
FROM pieces GROUP BY series_id, bucket
"""


def q_exact_quantiles_15m(sf_dir: str):
    """Exact per-series p50/p90/p99 over the 15m tier's bucket sums
    (``stages/quantiles.py``): one hash(series) shuffle, one sorted
    vectorized segment pass — the exact companion to
    ``hist_quantiles_1h``'s mergeable sketch."""
    from ...stages.quantiles import exact_quantiles
    from ...stages.rollup import rollup

    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    rolled = rollup(ev.map_batches(_series, batch_format="pyarrow"),
                    900 * US)
    return exact_quantiles(rolled, probs=(50, 90, 99), num_partitions=2)


EXACT_QUANTILES_SQL = """
WITH r AS (
    SELECT event_type AS series_id,
           epoch_us(ts) // 900000000 * 900000000 AS bucket,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s
    FROM events GROUP BY series_id, bucket
),
o AS (
    SELECT series_id, s,
           row_number() OVER (PARTITION BY series_id
                              ORDER BY s, bucket) - 1 AS rk,
           count(*) OVER (PARTITION BY series_id) AS n
    FROM r
)
SELECT series_id, CAST(max(n) AS BIGINT) AS n,
       max(CASE WHEN rk = (n - 1) * 50 // 100 THEN s END) AS p50,
       max(CASE WHEN rk = (n - 1) * 90 // 100 THEN s END) AS p90,
       max(CASE WHEN rk = (n - 1) * 99 // 100 THEN s END) AS p99
FROM o GROUP BY series_id
"""


def q_seasonal_hod_events(sf_dir: str):
    """Hour-of-day seasonal baseline (``stages/seasonal.py``): build the
    per-(event_type, hod) integer profile, broadcast it once (``ray.put``,
    the brief's small-side pattern), flag events whose cents fail the
    pure-integer z-test against their slot's population. No shuffle of
    the event stream at all."""
    import ray as _ray

    from ...stages.seasonal import seasonal_anomalies, seasonal_profile

    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"],
                         "event_id": b["event_id"],
                         "x": b["ts_us"], "y": b["cents"]})

    ds = ev.map_batches(_series, batch_format="pyarrow")
    prof_refs = seasonal_profile(ds).to_arrow_refs()
    profile = pa.concat_tables([_ray.get(r) for r in prof_refs])
    return seasonal_anomalies(ds, profile, id_col="event_id", threshold=3)


SEASONAL_HOD_SQL = """
WITH e AS (
    SELECT event_type AS series_id, event_id, epoch_us(ts) AS ts_us,
           CAST(round(value * 100) AS BIGINT) AS cents
    FROM events
),
h AS (
    SELECT series_id, event_id, (ts_us // 3600000000) % 24 AS slot, cents
    FROM e
),
p AS (
    SELECT series_id, slot, count(*) AS n,
           CAST(sum(cents) AS BIGINT) AS s,
           CAST(sum(cents * cents) AS BIGINT) AS q
    FROM h GROUP BY series_id, slot
)
SELECT h.series_id, h.event_id, h.slot, h.cents AS y,
       p.n AS slot_n, p.s AS slot_sum,
       (p.n >= 2 AND
        (p.n * h.cents - p.s) * (p.n * h.cents - p.s)
          > 9 * (p.n * p.q - p.s * p.s)) AS is_anomaly
FROM h JOIN p USING (series_id, slot)
"""


def q_asof_enrich_events(sf_dir: str):
    """As-of join (``stages/joins.py``): enrich every event with its
    type's last CLOSED hourly aggregate — right rows become available at
    ``bucket + 1h``, so the match is the latest window that finished
    at-or-before the event (the stream-enrichment pattern; DuckDB native
    ``ASOF LEFT JOIN`` is the oracle). One hash shuffle; no per-key
    Python, no broadcast."""
    US_H = 3_600_000_000
    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    from ...stages.joins import asof_join
    from ...stages.rollup import rollup

    hourly = rollup(ev.map_batches(_series, batch_format="pyarrow"), US_H)

    def _avail(b: pa.Table) -> pa.Table:
        return pa.table({
            "series_id": b["series_id"],
            "avail_us": pc.add(b["bucket"], US_H),
            "hr_sum": b["sum_y"], "hr_n": b["n"],
        })

    right = hourly.map_batches(_avail, batch_format="pyarrow")

    def _left(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"],
                         "event_id": b["event_id"],
                         "ts_us": b["ts_us"], "cents": b["cents"]})

    left = ev.map_batches(_left, batch_format="pyarrow")
    joined = asof_join(left, right, on="series_id", left_x="ts_us",
                       right_x="avail_us", right_cols=["hr_sum", "hr_n"],
                       num_partitions=8)

    def _project(b: pa.Table) -> pa.Table:
        return pa.table({"event_type": b["series_id"],
                         "event_id": b["event_id"],
                         "cents": b["cents"],
                         "hr_sum": b["hr_sum"], "hr_n": b["hr_n"]})

    return joined.map_batches(_project, batch_format="pyarrow")


ASOF_ENRICH_SQL = """
WITH ev AS (
    SELECT event_type, event_id, epoch_us(ts) AS ts_us,
           CAST(round(value * 100) AS BIGINT) AS cents
    FROM events
),
h AS (
    SELECT event_type,
           (ts_us // 3600000000) * 3600000000 AS bucket,
           CAST(sum(cents) AS BIGINT) AS hr_sum, count(*) AS hr_n
    FROM ev GROUP BY 1, 2
),
r AS (SELECT event_type, bucket + 3600000000 AS avail_us, hr_sum, hr_n
      FROM h)
SELECT e.event_type, e.event_id, e.cents, r.hr_sum, r.hr_n
FROM ev e
ASOF LEFT JOIN r
  ON e.event_type = r.event_type AND e.ts_us >= r.avail_us
"""


def q_hist_quantiles_1h(sf_dir: str):
    """Histogram rollup + p50/p95/p99 per (event_type, hour)
    (``stages/histogram.py``): deterministic fixed-bin sketch, mergeable
    by count addition, quantile = upper edge of the first bin reaching
    rank ceil(n*p/100) — every step SQL-replayable bit-for-bit."""
    US_H = 3_600_000_000
    BINS, LO, HI = 40, -400.0, 400.0
    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": pc.cast(b["cents"], pa.float64())})

    from ...stages.histogram import histogram_quantiles, histogram_rollup

    hist = histogram_rollup(ev.map_batches(_series, batch_format="pyarrow"),
                            US_H, bins=BINS, lo=LO, hi=HI, num_partitions=8)
    q = histogram_quantiles(hist, bins=BINS, lo=LO, hi=HI,
                            percentiles=(50, 95, 99))

    def _rename(b: pa.Table) -> pa.Table:
        return b.rename_columns(
            ["event_type"] + b.column_names[1:])

    return q.map_batches(_rename, batch_format="pyarrow")


HIST_QUANTILES_SQL = """
WITH ev AS (
    SELECT event_type, epoch_us(ts) AS ts_us,
           CAST(round(value * 100) AS BIGINT) AS cents
    FROM events
),
hb AS (
    SELECT event_type, (ts_us // 3600000000) * 3600000000 AS bucket,
           CAST(least(39, greatest(0,
               floor((CAST(cents AS DOUBLE) - (-400.0)) / 20.0)))
               AS BIGINT) AS bin,
           count(*) AS c
    FROM ev GROUP BY 1, 2, 3
),
tot AS (SELECT event_type, bucket, sum(c) AS n FROM hb GROUP BY 1, 2),
cum AS (
    SELECT event_type, bucket, bin,
           sum(c) OVER (PARTITION BY event_type, bucket
                        ORDER BY bin) AS cum
    FROM hb
),
q AS (
    SELECT c.event_type, c.bucket,
           any_value(t.n) AS n,
           min(c.bin) FILTER (WHERE c.cum >= (t.n * 50 + 99) // 100) AS b50,
           min(c.bin) FILTER (WHERE c.cum >= (t.n * 95 + 99) // 100) AS b95,
           min(c.bin) FILTER (WHERE c.cum >= (t.n * 99 + 99) // 100) AS b99
    FROM cum c JOIN tot t USING (event_type, bucket)
    GROUP BY 1, 2
)
SELECT event_type, bucket, CAST(n AS BIGINT) AS n,
       -400.0 + (b50 + 1) * 20.0 AS p50,
       -400.0 + (b95 + 1) * 20.0 AS p95,
       -400.0 + (b99 + 1) * 20.0 AS p99
FROM q
"""


def q_counter_rate_1h(sf_dir: str):
    """PromQL-style counter rate per (event_type, hour)
    (``stages/rate.py``): per-point increase with counter-reset handling
    (y < prev -> the new value counts whole), summed per window; rate =
    increase / 3600 s. Cross-row lag across block AND window boundaries —
    one hash(series) shuffle, vectorized per partition."""
    US_H = 3_600_000_000
    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"], "event_id": b["event_id"]})

    from ...stages.rate import counter_rate

    out = counter_rate(ev.map_batches(_series, batch_format="pyarrow"),
                       US_H, tiebreak_col="event_id", num_partitions=8)

    def _rename(b: pa.Table) -> pa.Table:
        return b.rename_columns(["event_type"] + b.column_names[1:])

    return out.map_batches(_rename, batch_format="pyarrow")


COUNTER_RATE_SQL = """
WITH ev AS (
    SELECT event_type, event_id, epoch_us(ts) AS ts_us,
           CAST(round(value * 100) AS BIGINT) AS cents
    FROM events
),
d AS (
    SELECT event_type, ts_us, cents,
           lag(cents) OVER (PARTITION BY event_type
                            ORDER BY ts_us, event_id) AS prev
    FROM ev
),
i AS (
    SELECT event_type, (ts_us // 3600000000) * 3600000000 AS bucket,
           CASE WHEN prev IS NULL THEN NULL
                WHEN cents >= prev THEN cents - prev
                ELSE cents END AS inc
    FROM d
)
SELECT event_type, bucket, CAST(sum(inc) AS BIGINT) AS increase,
       count(inc) AS n_incr,
       CAST(sum(inc) AS DOUBLE) / 3600.0 AS rate
FROM i WHERE inc IS NOT NULL GROUP BY 1, 2
"""


