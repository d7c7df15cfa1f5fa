"""TPC-H analog joins (orders-by-nation broadcast, pricing summary) and session labeling.

Split from the former pipelines/queries.py monolith (r4 verdict
next-round #5); statement order inside this module is the original
file order. Explicit cross-module imports are generated: backward
dependencies at the top, forward (function-body-only) dependencies at
the bottom so package import order stays acyclic.
"""
from __future__ import annotations

from ._shared import US, _rd, _read_parquet_clean, pa, pc

def q_orders_by_nation_broadcast(sf_dir: str):
    """Dimension enrichment via the SMALL-SIDE BROADCAST pattern
    (``stages/broadcast.py``): the customer->nation lookup (tiny) is
    pre-joined on the driver, ``ray.put`` once, and every orders batch
    does an in-batch Arrow hash join — the large side never shuffles.
    Revenue per nation via ``grouped_sum`` map-side partials."""
    import pyarrow.parquet as pq

    from ...stages.broadcast import broadcast_lookup_join
    from ...stages.rollup import grouped_sum

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    lookup = cust.join(nation, keys="c_nationkey",
                       right_keys="n_nationkey").select(
        ["c_custkey", "n_name"]).rename_columns(["o_custkey", "n_name"])

    orders = _read_parquet_clean(f"{sf_dir}/orders.parquet",
                                 columns=["o_custkey", "o_totalprice"])

    def _cents(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": b["o_custkey"],
            "cents": pc.cast(pc.round(pc.multiply(b["o_totalprice"], 100.0),
                                      ndigits=0), pa.int64()),
        })

    enriched = broadcast_lookup_join(
        orders.map_batches(_cents, batch_format="pyarrow"),
        lookup, on="o_custkey", join_type="inner")
    out = grouped_sum(enriched, ["n_name"], ["cents"], count_col="n_orders")

    def _rename(b: pa.Table) -> pa.Table:
        return b.rename_columns(["n_name", "total_cents", "n_orders"])

    return out.map_batches(_rename, batch_format="pyarrow")


ORDERS_BY_NATION_SQL = """
SELECT n_name,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS total_cents,
       count(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY 1
"""


def q_lineitem_pricing_summary(sf_dir: str):
    """TPC-H-Q1-style pricing summary over ``lineitem`` through the
    engine's map-side-partial ``grouped_sum``: money converted to integer
    cents (and discount/tax to integer percent) so every sum is EXACT in
    any combine order; averages are single f64 divisions of exact integer
    sums — the SQL oracle replays them bit-for-bit."""
    from ...stages.rollup import grouped_sum

    li = _read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_tax"])

    def _ints(b: pa.Table) -> pa.Table:
        def c100(col):
            return pc.cast(pc.round(pc.multiply(b[col], 100.0), ndigits=0),
                           pa.int64())

        qty = c100("l_quantity")
        ep = c100("l_extendedprice")
        disc = c100("l_discount")
        tax = c100("l_tax")
        disc_price = pc.multiply(ep, pc.subtract(pa.scalar(100, pa.int64()),
                                                 disc))
        charge = pc.multiply(disc_price,
                             pc.add(pa.scalar(100, pa.int64()), tax))
        return pa.table({
            "l_returnflag": b["l_returnflag"],
            "l_linestatus": b["l_linestatus"],
            "qty_c": qty, "base_c": ep, "disc_pct": disc,
            "disc_e4": disc_price, "charge_e6": charge,
        })

    summed = grouped_sum(
        li.map_batches(_ints, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        ["qty_c", "base_c", "disc_pct", "disc_e4", "charge_e6"],
        count_col="count_order")

    def _avgs(b: pa.Table) -> pa.Table:
        n = pc.cast(b["count_order"], pa.float64())
        f = pa.float64()

        def over100(col):
            return pc.divide(pc.divide(pc.cast(col, f), 100.0), n)

        return pa.table({
            "l_returnflag": b["l_returnflag"],
            "l_linestatus": b["l_linestatus"],
            "sum_qty_cents": b["qty_c"],
            "sum_base_cents": b["base_c"],
            "sum_disc_price_e4": b["disc_e4"],
            "sum_charge_e6": b["charge_e6"],
            "avg_qty": over100(b["qty_c"]),
            "avg_price": over100(b["base_c"]),
            "avg_disc_pct": pc.divide(pc.cast(b["disc_pct"], f), n),
            "count_order": b["count_order"],
        })

    return summed.map_batches(_avgs, batch_format="pyarrow")


LINEITEM_SUMMARY_SQL = """
WITH i AS (
    SELECT l_returnflag, l_linestatus,
           CAST(round(l_quantity * 100) AS BIGINT) AS qty_c,
           CAST(round(l_extendedprice * 100) AS BIGINT) AS base_c,
           CAST(round(l_discount * 100) AS BIGINT) AS disc_pct,
           CAST(round(l_tax * 100) AS BIGINT) AS tax_pct
    FROM lineitem
),
g AS (
    SELECT l_returnflag, l_linestatus,
           CAST(sum(qty_c) AS BIGINT) AS sum_qty_cents,
           CAST(sum(base_c) AS BIGINT) AS sum_base_cents,
           CAST(sum(base_c * (100 - disc_pct)) AS BIGINT)
               AS sum_disc_price_e4,
           CAST(sum(base_c * (100 - disc_pct) * (100 + tax_pct)) AS BIGINT)
               AS sum_charge_e6,
           CAST(sum(disc_pct) AS BIGINT) AS sum_disc_pct,
           count(*) AS count_order
    FROM i GROUP BY 1, 2
)
SELECT l_returnflag, l_linestatus, sum_qty_cents, sum_base_cents,
       sum_disc_price_e4, sum_charge_e6,
       (CAST(sum_qty_cents AS DOUBLE) / 100.0)
           / CAST(count_order AS DOUBLE) AS avg_qty,
       (CAST(sum_base_cents AS DOUBLE) / 100.0)
           / CAST(count_order AS DOUBLE) AS avg_price,
       CAST(sum_disc_pct AS DOUBLE) / CAST(count_order AS DOUBLE)
           AS avg_disc_pct,
       count_order
FROM g
"""


def q_session_label_events(sf_dir: str):
    """Interval (range) join expressed through the as-of operator: label
    every event with its user's session window. Session windows are
    DISJOINT per user (gap-based sessionization), so "latest session_start
    at-or-before ts" + "ts <= session_end" equals the interval join — the
    asof-reduction that makes a range join one hash shuffle."""
    from ...stages.joins import asof_join
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

    ev = ds.map_batches(_prep, batch_format="pyarrow")
    sess = sessionize(ev, 30 * 60 * US, series_col="user_id",
                      x_col="ts_us", id_col="event_id")

    def _right(b: pa.Table) -> pa.Table:
        return pa.table({"user_id": b["series_id"],
                         "session_start": b["session_start"],
                         "session_end": b["session_end"]})

    right = sess.map_batches(_right, batch_format="pyarrow")
    joined = asof_join(ev, right, on="user_id", left_x="ts_us",
                       right_x="session_start",
                       right_cols=["session_start", "session_end"],
                       num_partitions=8)

    def _label(b: pa.Table) -> pa.Table:
        out = pa.table({"user_id": b["user_id"], "event_id": b["event_id"],
                        "session_start": b["session_start"],
                        "session_end": b["session_end"]})
        return out.filter(pc.and_(
            pc.is_valid(out["session_end"]),
            pc.less_equal(b["ts_us"], out["session_end"])))

    return joined.map_batches(_label, batch_format="pyarrow")


SESSION_LABEL_SQL = f"""
WITH o AS (
    SELECT user_id, epoch_us(ts) AS t, event_id FROM events
),
s AS MATERIALIZED (
    SELECT user_id, t, event_id,
           CASE WHEN lag(t) OVER w IS NULL
                     OR t - lag(t) OVER w > {30 * 60 * 1_000_000}
                THEN 1 ELSE 0 END AS brk
    FROM o
    WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
),
t2 AS (
    SELECT user_id, t, event_id,
           SUM(brk) OVER (PARTITION BY user_id ORDER BY t, event_id
                          ROWS UNBOUNDED PRECEDING) AS sess
    FROM s
),
sw AS (
    SELECT user_id, min(t) AS session_start, max(t) AS session_end
    FROM t2 GROUP BY user_id, sess
)
SELECT e.user_id, e.event_id, w.session_start, w.session_end
FROM o e JOIN sw w
  ON e.user_id = w.user_id
 AND e.t BETWEEN w.session_start AND w.session_end
"""


