"""The reference downsampler surface as driver rows (MinMax/M4/LTTB/MinMaxLTTB/EveryNth, with-x, midpoint, dtype-view).

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
    np,
    pa,
    pc,
)
from .events_windows import _events_series

def _events_cents(sf_dir: str, *, nan_every: int | None = None):
    """events + ``cents = round(value*100)``: int64, or float64 with NaN
    injected at ``event_id % nan_every == 0`` (the NaN-policy test fixture;
    deterministic and SQL-restatable). Integer cents keep every bucket sum
    EXACT, so kernel-vs-SQL float arithmetic is bit-identical."""
    ds = _events_series(sf_dir, cols=("event_id", "event_type", "ts", "value"))

    def _cents(b: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(b["value"], 100.0), ndigits=0),
                        pa.int64())
        if nan_every is not None:
            import numpy as _np

            v = cents.to_numpy(zero_copy_only=False).astype(_np.float64)
            eid = b["event_id"].to_numpy(zero_copy_only=False)
            v = v.copy()
            v[eid % nan_every == 0] = _np.nan
            cents = pa.array(v)
        return pa.table({"event_type": b["event_type"],
                         "event_id": b["event_id"],
                         "ts_us": b["ts_us"], "cents": cents})

    return ds.map_batches(_cents, batch_format="pyarrow")


def _downsample_events(sf_dir: str, kernel: str, n_out: int, *,
                       y_col: str = "value", nan_every: int | None = None,
                       out_cols=("event_type", "event_id", "value")):
    """Per-event_type series (sorted by ts,event_id), no-x kernel over
    ``y_col``; returns the selected original rows."""
    if y_col == "cents":
        ds = _events_cents(sf_dir, nan_every=nan_every)
    else:
        ds = _events_series(sf_dir,
                            cols=("event_id", "event_type", "ts", "value"))

    def _group(tbl: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            tbl, sort_keys=[("ts_us", "ascending"), ("event_id", "ascending")]
        )
        tbl = tbl.take(idx)
        out = downsample_table(tbl, kernel, n_out, x_col=None, y_col=y_col,
                               presorted=True)
        return out.select(list(out_cols))

    return ds.groupby("event_type").map_groups(_group, batch_format="pyarrow")


def q_minmax_events(sf_dir: str):
    return _downsample_events(sf_dir, "minmax", 20)


def _minmax_nox_sql(n_bins: int) -> str:
    """The no-x MinMax oracle (first-occurrence ties, equidistant index
    bins) parameterized over the bin count — the building block for the
    LOD pyramid levels; ``n_bins=10`` is textually identical to the
    ``minmax_events`` oracle."""
    nb = int(n_bins)
    return f"""
        WITH s AS MATERIALIZED (
            SELECT event_type, event_id, value,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY ts, event_id) - 1 AS rn,
                   count(*) OVER (PARTITION BY event_type) AS cnt
            FROM events
        ),
        binned AS MATERIALIZED (
            SELECT s.*, b.i,
                   CASE WHEN b.i = 0 THEN 0
                        ELSE CAST(FLOOR(b.i * ((s.cnt - 1.0) / {nb})) AS BIGINT) + 1
                   END AS lo,
                   CASE WHEN b.i = {nb - 1} THEN s.cnt
                        ELSE CAST(FLOOR((b.i + 1) * ((s.cnt - 1.0) / {nb})) AS BIGINT) + 1
                   END AS hi
            FROM s JOIN generate_series(0, {nb - 1}) b(i) ON TRUE
        ),
        inbin AS MATERIALIZED (SELECT * FROM binned WHERE rn >= lo AND rn < hi),
        ext AS MATERIALIZED (
            SELECT event_type, i,
                   min(value) AS mn, max(value) AS mx
            FROM inbin GROUP BY 1, 2
        ),
        sel AS (
            SELECT ib.event_type,
                   min(ib.rn) FILTER (WHERE ib.value = e.mn) AS rn_min,
                   min(ib.rn) FILTER (WHERE ib.value = e.mx) AS rn_max
            FROM inbin ib JOIN ext e ON ib.event_type = e.event_type AND ib.i = e.i
            GROUP BY ib.event_type, ib.i
        ),
        picked AS (
            SELECT event_type, rn_min AS rn FROM sel
            UNION
            SELECT event_type, rn_max AS rn FROM sel
        )
        SELECT s.event_type, s.event_id, s.value
        FROM s JOIN picked p ON s.event_type = p.event_type AND s.rn = p.rn
    """


_LOD_LEVELS = ((0, 100), (1, 20), (2, 4))  # (level, n_out); bins = n_out/2


def q_lod_pyramid_events(sf_dir: str):
    """The reference's flagship interactive-zoom use case as one
    pipeline: MinMax downsample of every series at three zoom levels
    (n_out 100/20/4), unioned with a ``level`` column — the
    level-of-detail pyramid a plotting front-end pages through. Each
    level is an independent streamed downsample; the union is lazy."""
    out = None
    for lvl, n_out in _LOD_LEVELS:
        ds = _downsample_events(sf_dir, "minmax", n_out)

        def _tag(b: pa.Table, _lvl=lvl) -> pa.Table:
            return pa.table({
                "level": pa.array(np.full(b.num_rows, _lvl, np.int64)),
                "event_type": b["event_type"],
                "event_id": b["event_id"],
                "value": b["value"],
            })

        tagged = ds.map_batches(_tag, batch_format="pyarrow")
        out = tagged if out is None else out.union(tagged)
    return out


def _lod_pyramid_sql() -> str:
    parts = [f"SELECT CAST({lvl} AS BIGINT) AS level, * "
             f"FROM ({_minmax_nox_sql(n // 2)})"
             for lvl, n in _LOD_LEVELS]
    return " UNION ALL ".join(parts)


def q_m4_events(sf_dir: str):
    return _downsample_events(sf_dir, "m4", 20)


def q_lttb_events(sf_dir: str):
    """LTTB over integer cents (exact bucket means -> the SQL oracle's
    recursive bucket-loop replay is bit-identical)."""
    return _downsample_events(sf_dir, "lttb", 50, y_col="cents",
                              out_cols=("event_type", "event_id", "cents"))


def q_lttb_events_gapped_midpoint(sf_dir: str, n_out: int = 40):
    """LTTB WITH x over a GAPPED series using the shipped Rust binary's
    bucket-x *midpoint* semantics (``lttb.rs:46-50``, exposed as
    ``lttb(..., bucket_x="midpoint")``) — the one input regime where the
    reference's Rust kernel and its Python oracle diverge (the compliance
    suite only certifies equidistant x). Keep only days with
    ``day % 9 < 4`` (5-day holes ≫ bucket width); x = rebased epoch-us so
    f64 arithmetic is pinned-IEEE on both sides."""
    day = 86_400_000_000
    ds = _events_cents(sf_dir)

    def _gap_filter(b: pa.Table) -> pa.Table:
        d = pc.divide(b["ts_us"], day)
        keep = pc.less(pc.subtract(d, pc.multiply(pc.divide(d, 9), 9)), 4)
        return b.filter(keep)

    gappy = ds.map_batches(_gap_filter, batch_format="pyarrow")

    def _group(tbl: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            tbl, sort_keys=[("ts_us", "ascending"), ("event_id", "ascending")]
        )
        tbl = tbl.take(idx)
        tbl = tbl.append_column("x", pc.subtract(tbl["ts_us"], _XBASE))
        out = downsample_table(tbl, "lttb", n_out, x_col="x", y_col="cents",
                               presorted=True, bucket_x="midpoint")
        return out.select(["event_type", "event_id", "cents"])

    return gappy.groupby("event_type").map_groups(_group,
                                                  batch_format="pyarrow")


def _lttb_gapped_midpoint_sql(n_out: int) -> str:
    """Exact oracle for the gapped-x midpoint LTTB: same recursive
    bucket-loop replay, next-bucket x = (last + first) / 2."""
    return f"""
WITH RECURSIVE s0 AS MATERIALIZED (
    SELECT event_type, event_id,
           CAST(round(value * 100) AS BIGINT) AS cy,
           epoch_us(ts) AS ts_us
    FROM events
    WHERE ((epoch_us(ts) // 86400000000) % 9) < 4
),
s AS MATERIALIZED (
    SELECT event_type, event_id, cy,
           ts_us - {_XBASE} AS x,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY ts_us, event_id) - 1 AS rn,
           count(*) OVER (PARTITION BY event_type) AS cnt
    FROM s0
),
sp AS MATERIALIZED (SELECT event_type, rn AS p, x, cy, cnt AS m2 FROM s),
{_lttb_phase2_sql(n_out, "sp", bucket_x="midpoint")},
picked AS (
    SELECT event_type, a AS rn FROM rec
    UNION ALL SELECT event_type, m2 - 1 FROM meta
)
SELECT s.event_type, s.event_id, s.cy AS cents
FROM s JOIN picked p ON s.event_type = p.event_type AND s.rn = p.rn
"""


def q_minmaxlttb_events(sf_dir: str):
    return _downsample_events(sf_dir, "minmaxlttb", 20, y_col="cents",
                              out_cols=("event_type", "event_id", "cents"))


def q_nanminmaxlttb_events(sf_dir: str):
    """NaN-returning MinMaxLTTB: float cents with NaN at event_id%37==0."""
    return _downsample_events(sf_dir, "nanminmaxlttb", 20, y_col="cents",
                              nan_every=37,
                              out_cols=("event_type", "event_id"))


def q_minmax_events_withx(sf_dir: str, n_out: int = 20):
    """MinMax WITH x (timestamps) over a gappy series: keep only days with
    ``day % 9 < 4`` (5-day holes >> bin width), bins equidistant in x-VALUE
    space -> empty bins emit nothing (the reference's gap semantic,
    README.md:99 / searchsorted.rs:118-122) and <=2-point bins pass all
    points through (minmax.rs:199-203). Output shrinks below n_out."""
    day = 86_400_000_000
    ds = _events_cents(sf_dir)

    def _gap_filter(b: pa.Table) -> pa.Table:
        d = pc.divide(b["ts_us"], day)
        keep = pc.less(pc.subtract(d, pc.multiply(pc.divide(d, 9), 9)), 4)
        return b.filter(keep)

    gappy = ds.map_batches(_gap_filter, batch_format="pyarrow")

    def _group(tbl: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            tbl, sort_keys=[("ts_us", "ascending"), ("event_id", "ascending")]
        )
        tbl = tbl.take(idx)
        out = downsample_table(tbl, "minmax", n_out, x_col="ts_us",
                               y_col="cents", presorted=True)
        return out.select(["event_type", "event_id", "cents"])

    return gappy.groupby("event_type").map_groups(_group,
                                                  batch_format="pyarrow")


_XBASE = 1_704_000_000_000_000  # rebase epoch-us x so f64 bucket sums are
# exact (< 2^53) in BOTH the kernel and the SQL replay


def q_minmax_events_dt64bool(sf_dir: str, n_out: int = 20):
    """MinMax end-to-end through the DTYPE-VIEW path: x stays a
    datetime64[us] timestamp column (``view_x`` i64-views it,
    ``downsampling_interface.py:205-227`` parity) and y is a BOOL column
    (``view_y`` i8-views it) — the reference's dtype matrix
    (``downsample_rs`` datetime/bool support) exercised as a driver row
    rather than only the pytest matrix (r4 verdict next-round #8).
    Equidistant x-VALUE bins over the full per-type series; flag =
    value >= 0."""
    ds = _read_parquet_clean(f"{sf_dir}/events.parquet",
                             columns=["event_id", "event_type", "ts",
                                      "value"]).repartition(4)

    def _flag(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": b["event_type"],
            "event_id": b["event_id"],
            "ts": b["ts"],  # KEEP timestamp type — the view under test
            "flag": pc.greater_equal(b["value"], 0.0),
        })

    flagged = ds.map_batches(_flag, batch_format="pyarrow")

    def _group(tbl: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            tbl, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
        tbl = tbl.take(idx)
        out = downsample_table(tbl, "minmax", n_out, x_col="ts",
                               y_col="flag", presorted=True)
        return out.select(["event_type", "event_id", "flag"])

    return flagged.groupby("event_type").map_groups(_group,
                                                    batch_format="pyarrow")


def q_minmaxlttb_bigseries(sf_dir: str, n_out: int = 40):
    """Distributed MinMaxLTTB over ALL events as ONE series spanning many
    blocks (stages/bigseries.py): per-bin partials in map_batches, LTTB
    phase-2 on the gathered preselection. x = rebased timestamp (strictly
    increasing — verified collision-free in this corpus)."""
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
    out = downsample_big_series(series, n_out, x_col="x", y_col="cents",
                                ratio=4)
    return out.set_column(out.column_names.index("cents"), "cents",
                          pc.cast(out["cents"], pa.int64()))


