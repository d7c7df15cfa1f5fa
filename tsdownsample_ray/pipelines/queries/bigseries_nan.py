"""Distributed single-series downsampling (bigseries), partitioned and NaN kernel variants.

Split from the former pipelines/queries.py monolith (r4 verdict
next-round #5); statement order inside this module is the original
file order. Explicit cross-module imports are generated: backward
dependencies at the top, forward (function-body-only) dependencies at
the bottom so package import order stays acyclic.
"""
from __future__ import annotations

from ._shared import (
    _lttb_phase2_sql,
    _rd,
    _read_parquet_clean,
    downsample_table,
    pa,
    pc,
)
from .events_windows import _events_series
from .downsample_core import _XBASE, _downsample_events

def q_minmax_bigseries(sf_dir: str, n_out: int = 40):
    """Distributed FULL-RANGE MinMax over ALL events as ONE series spanning
    many blocks (``stages/bigseries.py`` kernel="minmax" — the Ray analog
    of the reference's parallel per-bin MinMax, minmax.rs:139-179): per-bin
    partial candidates in map_batches, associative groupby("bin") merge,
    with-x bin semantics (searchsorted-over-linspace, tiny-bin passthrough,
    first-occurrence ties)."""
    rd = _rd()
    ds = _read_parquet_clean(f"{sf_dir}/events.parquet", columns=["ts", "value"])

    def _prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "x": pc.subtract(b["ts"].cast(pa.int64()), _XBASE),
            "cents": pc.cast(pc.round(pc.multiply(b["value"], 100.0),
                                      ndigits=0), pa.int64()),
        })

    from ...stages.bigseries import downsample_big_series

    series = ds.map_batches(_prep, batch_format="pyarrow").repartition(24)
    out = downsample_big_series(series, n_out, kernel="minmax",
                                x_col="x", y_col="cents")
    return out.set_column(out.column_names.index("cents"), "cents",
                          pc.cast(out["cents"], pa.int64()))


def q_m4_bigseries(sf_dir: str, n_out: int = 40):
    """Distributed FULL-RANGE M4 over ALL events as ONE series
    (``stages/bigseries.py`` kernel="m4" — the reference's parallel per-bin
    M4, m4.rs:145-187): first/argmin/argmax/last per x-value bin,
    duplicates retained, <=4-point passthrough."""
    rd = _rd()
    ds = _read_parquet_clean(f"{sf_dir}/events.parquet", columns=["ts", "value"])

    def _prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "x": pc.subtract(b["ts"].cast(pa.int64()), _XBASE),
            "cents": pc.cast(pc.round(pc.multiply(b["value"], 100.0),
                                      ndigits=0), pa.int64()),
        })

    from ...stages.bigseries import downsample_big_series

    series = ds.map_batches(_prep, batch_format="pyarrow").repartition(24)
    out = downsample_big_series(series, n_out, kernel="m4",
                                x_col="x", y_col="cents")
    return out.set_column(out.column_names.index("cents"), "cents",
                          pc.cast(out["cents"], pa.int64()))


def _m4_bigseries_sql(n_out: int) -> str:
    """Full-range with-x M4 over the single all-events series: per bin
    emit first / argmin / argmax / last (duplicates RETAINED — UNION ALL),
    <=4-point passthrough, first-occurrence ties via min(rn)."""
    nb = n_out // 4
    return f"""
WITH e AS (
    SELECT epoch_us(ts) - {_XBASE} AS x,
           CAST(round(value * 100) AS BIGINT) AS cy
    FROM events
),
s AS MATERIALIZED (
    SELECT x, cy, row_number() OVER (ORDER BY x) - 1 AS rn,
           min(x) OVER () AS x0, max(x) OVER () AS xn
    FROM e
),
assigned AS MATERIALIZED (
    SELECT s.x, s.cy, s.rn, count(k.k) AS bin
    FROM s LEFT JOIN generate_series(1, {nb - 1}) k(k)
      ON CAST(s.x0 AS DOUBLE)
         + k.k * ((CAST(s.xn AS DOUBLE) - CAST(s.x0 AS DOUBLE)) / {nb}.0)
         < CAST(s.x AS DOUBLE)
    GROUP BY ALL
),
ext AS MATERIALIZED (
    SELECT bin, count(*) AS nbin, min(cy) AS mn, max(cy) AS mx,
           min(rn) AS rn_first, max(rn) AS rn_last
    FROM assigned GROUP BY 1
),
sel AS (
    SELECT a.bin, any_value(e.rn_first) AS rn_first,
           any_value(e.rn_last) AS rn_last,
           min(a.rn) FILTER (WHERE a.cy = e.mn) AS rn_min,
           min(a.rn) FILTER (WHERE a.cy = e.mx) AS rn_max
    FROM assigned a JOIN ext e USING (bin)
    WHERE e.nbin > 4
    GROUP BY 1
),
picked AS (
    SELECT rn_first AS rn FROM sel
    UNION ALL SELECT least(rn_min, rn_max) FROM sel
    UNION ALL SELECT greatest(rn_min, rn_max) FROM sel
    UNION ALL SELECT rn_last FROM sel
    UNION ALL SELECT a.rn FROM assigned a JOIN ext e USING (bin)
              WHERE e.nbin <= 4
)
SELECT a.x, a.cy AS cents
FROM assigned a JOIN picked p ON a.rn = p.rn
"""


def _minmax_bigseries_sql(n_out: int) -> str:
    """Full-range with-x MinMax over the single all-events series: bin
    assignment by boundary counts (a point ON boundary k belongs to bin
    k-1 — the searchsorted side='right' index-boundary semantic), <=2-point
    passthrough, first-occurrence ties via min(rn), np.unique via UNION."""
    nb = n_out // 2
    return f"""
WITH e AS (
    SELECT epoch_us(ts) - {_XBASE} AS x,
           CAST(round(value * 100) AS BIGINT) AS cy
    FROM events
),
s AS MATERIALIZED (
    SELECT x, cy, row_number() OVER (ORDER BY x) - 1 AS rn,
           min(x) OVER () AS x0, max(x) OVER () AS xn
    FROM e
),
assigned AS MATERIALIZED (
    SELECT s.x, s.cy, s.rn, count(k.k) AS bin
    FROM s LEFT JOIN generate_series(1, {nb - 1}) k(k)
      ON CAST(s.x0 AS DOUBLE)
         + k.k * ((CAST(s.xn AS DOUBLE) - CAST(s.x0 AS DOUBLE)) / {nb}.0)
         < CAST(s.x AS DOUBLE)
    GROUP BY ALL
),
ext AS MATERIALIZED (
    SELECT bin, count(*) AS nbin, min(cy) AS mn, max(cy) AS mx
    FROM assigned GROUP BY 1
),
sel AS (
    SELECT a.bin,
           min(a.rn) FILTER (WHERE a.cy = e.mn) AS rn_min,
           min(a.rn) FILTER (WHERE a.cy = e.mx) AS rn_max
    FROM assigned a JOIN ext e USING (bin)
    WHERE e.nbin > 2
    GROUP BY 1
),
picked AS (
    SELECT rn_min AS rn FROM sel
    UNION SELECT rn_max FROM sel
    UNION SELECT a.rn FROM assigned a JOIN ext e USING (bin)
          WHERE e.nbin <= 2
)
SELECT a.x, a.cy AS cents
FROM assigned a JOIN picked p ON a.rn = p.rn
"""


def _bigseries_sql(n_out: int, ratio: int) -> str:
    """The big-series path's oracle: with-x MinMax pairs over the interior
    (x-value bins via boundary counts, tiny-bin passthrough, empty-bin
    skip) + the LTTB recursion over the positioned preselection."""
    nb = n_out * ratio // 2
    return f"""
WITH RECURSIVE e AS (
    SELECT epoch_us(ts) - {_XBASE} AS x,
           CAST(round(value * 100) AS BIGINT) AS cy
    FROM events
),
s AS MATERIALIZED (
    SELECT 'all' AS event_type, x, cy,
           row_number() OVER (ORDER BY x) - 1 AS rn,
           count(*) OVER () AS cnt
    FROM e
),
edges AS MATERIALIZED (
    SELECT max(CASE WHEN rn = 1 THEN x END) AS x1,
           max(CASE WHEN rn = cnt - 2 THEN x END) AS xm2
    FROM s
),
assigned AS MATERIALIZED (
    SELECT i.event_type, i.x, i.cy, i.rn, count(k.k) AS bin
    FROM (SELECT s.*, e2.x1, e2.xm2 FROM s, edges e2
          WHERE rn >= 1 AND rn <= cnt - 2) i
    LEFT JOIN generate_series(1, {nb - 1}) k(k)
      ON CAST(i.x1 AS DOUBLE)
         + k.k * ((CAST(i.xm2 AS DOUBLE) - CAST(i.x1 AS DOUBLE)) / {nb}.0)
         < CAST(i.x AS DOUBLE)
    GROUP BY ALL
),
ext AS MATERIALIZED (
    SELECT bin, count(*) AS nbin, min(cy) AS mn, max(cy) AS mx
    FROM assigned GROUP BY 1
),
selp AS MATERIALIZED (
    SELECT a.bin,
           min(a.rn) FILTER (WHERE a.cy = e.mn) AS rn_min,
           min(a.rn) FILTER (WHERE a.cy = e.mx) AS rn_max
    FROM assigned a JOIN ext e USING (bin)
    WHERE e.nbin > 2
    GROUP BY 1
),
presel_rns AS (
    SELECT 0::BIGINT AS rn
    UNION ALL SELECT least(rn_min, rn_max) FROM selp
    UNION ALL SELECT greatest(rn_min, rn_max) FROM selp
    UNION ALL SELECT a.rn FROM assigned a JOIN ext e USING (bin)
              WHERE e.nbin <= 2
    UNION ALL SELECT any_value(cnt) - 1 FROM s
),
presel AS MATERIALIZED (
    SELECT s.event_type,
           row_number() OVER (ORDER BY p.rn) - 1 AS p,
           s.x, s.cy,
           count(*) OVER () AS m2
    FROM presel_rns p JOIN s ON s.rn = p.rn
),
{_lttb_phase2_sql(n_out, "presel")},
picked AS (
    SELECT t.x, t.cy FROM rec r
    JOIN presel t ON t.event_type = r.event_type AND t.p = r.a
    UNION ALL SELECT x, cy FROM s WHERE rn = cnt - 1
)
SELECT x, cy AS cents FROM picked
"""


def q_minmax_events_partitioned(sf_dir: str):
    """The explicit hash-partitioned downsample path over the same series —
    shares minmax_events' bin-exact SQL oracle (paths must agree)."""
    from ...kernels import minmax
    from ...stages.downsample import downsample_partitioned

    ds = _events_series(sf_dir, cols=("event_id", "event_type", "ts", "value"))

    def _no_x_minmax(x, y, n_out, **_):
        # match minmax_events: sort by ts, bins over INDEX (no-x variant)
        return minmax(None, y, n_out)

    out = downsample_partitioned(
        ds, kernel=_no_x_minmax, n_out=20, num_partitions=3,
        series_col="event_type", x_col="ts_us", y_col="value",
        tiebreak_cols=("event_id",))  # same order as the oracle's (ts, id)
    return out.select_columns(["event_type", "event_id", "value"])


def q_nanminmax_events(sf_dir: str):
    """NaN-returning MinMax: NaN injected at event_id%37==0 (every series
    gets scattered NaNs); a bin containing NaN returns its FIRST NaN index
    as both extremes (np.argmin/argmax propagation) — SQL-oracled via
    DuckDB's NaN-is-greatest total order."""
    return _downsample_events(sf_dir, "nanminmax", 20, y_col="cents",
                              nan_every=37,
                              out_cols=("event_type", "event_id"))


def q_nanm4_events(sf_dir: str):
    """NaN-returning M4 (first, NaN-propagating argmin/argmax, last)."""
    return _downsample_events(sf_dir, "nanm4", 20, y_col="cents",
                              nan_every=37,
                              out_cols=("event_type", "event_id"))


def q_everynth_events(sf_dir: str, n_out: int = 50):
    ds = _events_series(sf_dir, cols=("event_id", "event_type", "ts"))

    def _group(tbl: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            tbl, sort_keys=[("ts_us", "ascending"), ("event_id", "ascending")]
        )
        tbl = tbl.take(idx)
        out = downsample_table(tbl, "everynth", n_out, x_col=None, y_col="event_id",
                               presorted=True)
        return out.select(["event_type", "event_id"])

    return ds.groupby("event_type").map_groups(_group, batch_format="pyarrow")


