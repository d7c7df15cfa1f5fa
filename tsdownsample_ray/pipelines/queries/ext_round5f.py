"""Round-5 session-3 wave, part 1: the TPC-H join shapes the catalog
was still missing — Q2 (region-scoped argmin with deterministic
tie-break), Q6 (band-filtered revenue scan), Q11 (group share vs a
broadcast group-total threshold), Q12 (conditional aggregation after a
partitioned fact-fact join), Q16 (multi-key distinct count behind an
exclusion anti-set), Q20 (self-threshold semi-join: per-pair sum vs
half the per-key total), and Q21 (two-level grouped existence test:
the sole late supplier on multi-supplier orders).

The testdata has no ``partsupp`` table, ``l_shipmode`` or
``l_receiptdate``, so each analog re-expresses the reference query's
JOIN SHAPE on the columns that exist (supply cost := observed line
price; lateness := ship > order date + 60 days). Money is converted to
integer cents / basis points first, so every sum is exact in any
combine order and the DuckDB oracle replays bit-identically.
"""
from __future__ import annotations

import pyarrow.parquet as _pq

from ._shared import _read_parquet_clean, pa, pc

_DAY_US = 86_400 * 1_000_000


def _cents(col) -> pa.ChunkedArray:
    return pc.cast(pc.round(pc.multiply(col, 100.0), ndigits=0), pa.int64())


def _supplier_nation(sf_dir: str, *, region: str | None = None) -> pa.Table:
    """Driver-side supplier->nation(->region filter) lookup: all three
    dims are tiny by construction (|suppliers| << facts), the canonical
    broadcast small side."""
    supp = _pq.read_table(f"{sf_dir}/supplier.parquet",
                          columns=["s_suppkey", "s_name", "s_nationkey"])
    nat = _pq.read_table(f"{sf_dir}/nation.parquet")
    t = supp.join(nat, keys="s_nationkey", right_keys="n_nationkey")
    if region is not None:
        reg = _pq.read_table(f"{sf_dir}/region.parquet")
        t = t.join(reg, keys="n_regionkey", right_keys="r_regionkey")
        t = t.filter(pc.equal(t["r_name"], region))
    return t.select(["s_suppkey", "s_name", "n_name"])


def q_min_cost_supplier_parts(sf_dir: str):
    """TPC-H Q2 analog (region-scoped min-cost supplier per part): for
    every part with ``p_size >= 40``, the AFRICA-region supplier whose
    observed line price is minimal, ties broken on the lower suppkey.
    Shape: broadcast the (tiny) region-filtered supplier dim and the
    part-filter key set onto ``lineitem``, PACK (cents, suppkey) into
    one int64 so a single hashpart grouped-min IS the deterministic
    argmin — no join-back to recover the winning supplier (SQL's
    ``ORDER BY cost, suppkey LIMIT 1`` per part, replayed as
    ``min(cents*1024 + suppkey)``)."""
    from ...stages.broadcast import broadcast_lookup_join
    from ...stages.rollup import grouped_min_parts

    rs = _supplier_nation(sf_dir, region="AFRICA")
    part = _pq.read_table(f"{sf_dir}/part.parquet",
                          columns=["p_partkey", "p_brand", "p_size"])
    part = part.filter(pc.greater_equal(part["p_size"], 40))
    pkeys = part.select(["p_partkey"]).rename_columns(["l_partkey"])

    li = _read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_extendedprice"])

    def _pack(b: pa.Table) -> pa.Table:
        # suppkey < 1024 by dim-size contract — assert, don't assume
        mx = pc.max(b["l_suppkey"]).as_py()
        if mx is not None and mx >= 1024:
            raise ValueError(f"suppkey {mx} overflows the 1024 pack")
        packed = pc.add(pc.multiply(_cents(b["l_extendedprice"]),
                                    pa.scalar(1024, pa.int64())),
                        b["l_suppkey"])
        return pa.table({"l_partkey": b["l_partkey"], "packed": packed})

    cand = broadcast_lookup_join(li, rs.select(["s_suppkey"]).rename_columns(
        ["l_suppkey"]), on="l_suppkey", join_type="inner")
    cand = broadcast_lookup_join(cand, pkeys, on="l_partkey",
                                 join_type="inner")
    mins = grouped_min_parts(cand.map_batches(_pack, batch_format="pyarrow"),
                             ["l_partkey"], ["packed"], fanin=4)

    attrs = part.select(["p_partkey", "p_brand"]).rename_columns(
        ["l_partkey", "p_brand"])
    sup = rs.rename_columns(["win_suppkey", "s_name", "n_name"])

    def _unpack(b: pa.Table) -> pa.Table:
        cents = pc.divide(b["packed"], pa.scalar(1024, pa.int64()))
        supp = pc.subtract(b["packed"], pc.multiply(
            cents, pa.scalar(1024, pa.int64())))
        return pa.table({"l_partkey": b["l_partkey"],
                         "min_cost_cents": cents, "win_suppkey": supp})

    out = broadcast_lookup_join(
        mins.map_batches(_unpack, batch_format="pyarrow"), attrs,
        on="l_partkey", join_type="inner")
    out = broadcast_lookup_join(out, sup, on="win_suppkey",
                                join_type="inner")

    def _final(b: pa.Table) -> pa.Table:
        return pa.table({"p_partkey": b["l_partkey"],
                         "p_brand": b["p_brand"],
                         "min_cost_cents": b["min_cost_cents"],
                         "s_suppkey": b["win_suppkey"],
                         "s_name": b["s_name"], "n_name": b["n_name"]})

    return out.map_batches(_final, batch_format="pyarrow")


MIN_COST_SUPPLIER_SQL = """
WITH rs AS (
    SELECT s_suppkey, s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'AFRICA'
),
c AS (
    SELECT l_partkey,
           CAST(round(l_extendedprice * 100) AS BIGINT) * 1024 + l_suppkey
               AS packed
    FROM lineitem JOIN rs ON l_suppkey = s_suppkey
    JOIN part ON l_partkey = p_partkey
    WHERE p_size >= 40
),
m AS (SELECT l_partkey, min(packed) AS mp FROM c GROUP BY 1)
SELECT l_partkey AS p_partkey, p_brand,
       CAST(mp // 1024 AS BIGINT) AS min_cost_cents,
       CAST(mp % 1024 AS BIGINT) AS s_suppkey, s_name, n_name
FROM m JOIN part ON l_partkey = p_partkey
JOIN rs ON s_suppkey = mp % 1024
"""


def q_revenue_band_by_year(sf_dir: str):
    """TPC-H Q6 analog (banded revenue scan) per ship year: lines with
    discount in [5, 7] basis-cents and quantity < 24;
    revenue := extendedprice_cents x discount_bp stays integer so the
    global sum is combine-order-free. Pure filter+map-side-partial
    aggregate — the read projects three columns and nothing shuffles
    but <=7 partial rows per block."""
    from ...stages.rollup import grouped_sum

    li = _read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_quantity", "l_extendedprice",
                 "l_discount"])

    def _prep(b: pa.Table) -> pa.Table:
        bp = _cents(b["l_discount"])
        qty = pc.cast(b["l_quantity"], pa.int64())
        keep = pc.and_(pc.and_(pc.greater_equal(bp, 5),
                               pc.less_equal(bp, 7)),
                       pc.less(qty, 24))
        t = pa.table({
            "ship_year": pc.cast(pc.year(b["l_shipdate"]), pa.int64()),
            "revenue_cbp": pc.multiply(_cents(b["l_extendedprice"]), bp),
        })
        return t.filter(keep)

    return grouped_sum(li.map_batches(_prep, batch_format="pyarrow"),
                       ["ship_year"], ["revenue_cbp"], count_col="n_lines")


REVENUE_BAND_SQL = """
SELECT CAST(year(l_shipdate) AS BIGINT) AS ship_year,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT)
           AS revenue_cbp,
       count(*) AS n_lines
FROM lineitem
WHERE CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
  AND CAST(l_quantity AS BIGINT) < 24
GROUP BY 1
"""


def q_important_parts_by_nation(sf_dir: str):
    """TPC-H Q11 analog (important stock): per supplier-nation, the
    parts whose line-value share exceeds 1/500 of the nation's total.
    Shape: broadcast the supplier->nation dim, hashpart grouped-sum on
    (nation, part) — the per-entity key space — then the nation totals
    are a SECOND tiny aggregate of that result (<= |nations| rows, the
    documented bounded driver read) broadcast back as a filter
    threshold. The fact table is read once and shuffled once."""
    import ray

    from ...stages.broadcast import broadcast_lookup_join
    from ...stages.graph import grouped_sum_parts
    from ...stages.rollup import grouped_sum

    lookup = _supplier_nation(sf_dir).select(
        ["s_suppkey", "n_name"]).rename_columns(["l_suppkey", "n_name"])

    li = _read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                             columns=["l_suppkey", "l_partkey",
                                      "l_extendedprice"])

    def _prep(b: pa.Table) -> pa.Table:
        return pa.table({"l_suppkey": b["l_suppkey"],
                         "p_partkey": b["l_partkey"],
                         "value_cents": _cents(b["l_extendedprice"])})

    enriched = broadcast_lookup_join(
        li.map_batches(_prep, batch_format="pyarrow"), lookup,
        on="l_suppkey", join_type="inner")
    per_part = grouped_sum_parts(enriched, ["n_name", "p_partkey"],
                                 ["value_cents"], count_col=None,
                                 fanin=4).materialize()
    # materialized: consumed twice (nation totals + the filter pass) —
    # without it both lazy plans would re-read and re-shuffle lineitem

    # nation totals: <= |nations| rows by construction (bounded read)
    totals = grouped_sum(per_part, ["n_name"], ["value_cents"],
                         count_col="n_parts")
    tot_map = {r["n_name"]: r["value_cents"]
               for r in totals.take_all()}
    ref = ray.put(tot_map)

    def _keep(b: pa.Table) -> pa.Table:
        m = ray.get(ref)
        tot = pa.array([m[k] for k in b["n_name"].to_pylist()], pa.int64())
        return b.filter(pc.greater(
            pc.multiply(b["value_cents"], pa.scalar(500, pa.int64())), tot))

    return per_part.map_batches(_keep, batch_format="pyarrow")


IMPORTANT_PARTS_SQL = """
WITH v AS (
    SELECT n_name, l_partkey AS p_partkey,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS value_cents
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    GROUP BY 1, 2
),
t AS (SELECT n_name, sum(value_cents) AS tot FROM v GROUP BY 1)
SELECT v.n_name, p_partkey, value_cents
FROM v JOIN t ON v.n_name = t.n_name
WHERE value_cents * 500 > tot
"""


def q_ship_delay_priority(sf_dir: str):
    """TPC-H Q12 analog (shipping-delay service classes): join the two
    FACT tables (lineitem x orders — neither side broadcastable at
    scale) through the tagged-union partitioned ``hash_inner_join``,
    bucket ship delay into 30-day classes capped at 4, and count
    high- vs low-priority lines per class as 0/1 integer sums."""
    from ...stages.joins import hash_inner_join
    from ...stages.rollup import grouped_sum

    li = _read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                             columns=["l_orderkey", "l_shipdate"])
    orders = _read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"])

    def _o(b: pa.Table) -> pa.Table:
        return b.rename_columns(["l_orderkey", "o_orderdate",
                                 "o_orderpriority"])

    joined = hash_inner_join(
        li, orders.map_batches(_o, batch_format="pyarrow"),
        on="l_orderkey", num_partitions=4)

    def _classify(b: pa.Table) -> pa.Table:
        delay_us = pc.cast(pc.subtract(b["l_shipdate"], b["o_orderdate"]),
                           pa.int64())
        days = pc.divide(delay_us, pa.scalar(_DAY_US, pa.int64()))
        # early shipments (ship before order date exist in the corpus)
        # clamp to bucket 0 BEFORE dividing: pc.divide truncates toward
        # zero while SQL // floors, so the division must see >= 0 only
        days = pc.max_element_wise(days, pa.scalar(0, pa.int64()))
        bucket = pc.min_element_wise(
            pc.divide(days, pa.scalar(30, pa.int64())),
            pa.scalar(4, pa.int64()))
        hi = pc.is_in(b["o_orderpriority"],
                      value_set=pa.array(["1-URGENT", "2-HIGH"]))
        hi64 = pc.cast(hi, pa.int64())
        return pa.table({
            "delay_bucket": bucket,
            "high_line_count": hi64,
            "low_line_count": pc.subtract(pa.scalar(1, pa.int64()), hi64),
        })

    return grouped_sum(joined.map_batches(_classify, batch_format="pyarrow"),
                       ["delay_bucket"],
                       ["high_line_count", "low_line_count"],
                       count_col="n_lines")


SHIP_DELAY_PRIORITY_SQL = """
SELECT least(greatest(CAST(date_diff('day', o_orderdate, l_shipdate)
                           AS BIGINT), 0) // 30, 4) AS delay_bucket,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count,
       count(*) AS n_lines
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
"""


def q_supplier_cnt_part_class(sf_dir: str):
    """TPC-H Q16 analog (supplier count per part class): distinct
    suppliers per (brand, size-decade band), excluding suppliers with a
    negative account balance (the complaints anti-set, broadcast as an
    inner join against the KEPT set — an anti-join by complement since
    the dim is tiny). Distinctness is established by a hashpart grouped
    collapse on the full (brand, band, supp) key, then the class counts
    are a second tiny aggregate. No row ever leaves as a pair list."""
    from ...stages.broadcast import broadcast_lookup_join
    from ...stages.graph import grouped_sum_parts
    from ...stages.rollup import grouped_sum

    supp = _pq.read_table(f"{sf_dir}/supplier.parquet",
                          columns=["s_suppkey", "s_acctbal"])
    good = supp.filter(pc.greater_equal(supp["s_acctbal"], 0.0)).select(
        ["s_suppkey"]).rename_columns(["l_suppkey"])
    part = _pq.read_table(f"{sf_dir}/part.parquet",
                          columns=["p_partkey", "p_brand", "p_size"])
    pattrs = pa.table({
        "l_partkey": part["p_partkey"], "p_brand": part["p_brand"],
        "size_band": pc.cast(pc.divide(part["p_size"], 10), pa.int64()),
    })

    li = _read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                             columns=["l_partkey", "l_suppkey"])
    kept = broadcast_lookup_join(li, good, on="l_suppkey",
                                 join_type="inner")
    kept = broadcast_lookup_join(kept, pattrs, on="l_partkey",
                                 join_type="inner")

    def _proj(b: pa.Table) -> pa.Table:
        return b.select(["p_brand", "size_band", "l_suppkey"])

    triples = grouped_sum_parts(
        kept.map_batches(_proj, batch_format="pyarrow"),
        ["p_brand", "size_band", "l_suppkey"], [], count_col="n_occ",
        fanin=4)

    def _one(b: pa.Table) -> pa.Table:
        return b.select(["p_brand", "size_band"])

    return grouped_sum(triples.map_batches(_one, batch_format="pyarrow"),
                       ["p_brand", "size_band"], [],
                       count_col="supplier_cnt")


SUPPLIER_CNT_SQL = """
SELECT p_brand, CAST(p_size // 10 AS BIGINT) AS size_band,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
WHERE s_acctbal >= 0
GROUP BY 1, 2
"""


def q_excess_qty_suppliers(sf_dir: str):
    """TPC-H Q20 analog (excess-quantity suppliers): suppliers who in
    ship-year 1997 shipped MORE THAN HALF of some part's total shipped
    quantity. Shape: one hashpart grouped-sum on (part, supp), a second
    on (part) DERIVED FROM THE FIRST (no second fact read), the
    threshold compare as a partitioned self-join on partkey, then a
    tiny supplier rollup with the nation dim broadcast."""
    from ...stages.broadcast import broadcast_lookup_join
    from ...stages.graph import grouped_sum_parts
    from ...stages.joins import hash_inner_join
    from ...stages.rollup import grouped_sum

    li = _read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                             columns=["l_partkey", "l_suppkey",
                                      "l_quantity", "l_shipdate"])

    def _prep(b: pa.Table) -> pa.Table:
        t = pa.table({"l_partkey": b["l_partkey"],
                      "l_suppkey": b["l_suppkey"],
                      "qty": pc.cast(b["l_quantity"], pa.int64())})
        return t.filter(pc.equal(pc.year(b["l_shipdate"]), 1997))

    ps = grouped_sum_parts(li.map_batches(_prep, batch_format="pyarrow"),
                           ["l_partkey", "l_suppkey"], ["qty"],
                           count_col=None, fanin=4).materialize()
    # materialized: ps feeds both the part totals and the join's left
    # side — the fact read + (part, supp) shuffle must not run twice
    totals = grouped_sum_parts(ps, ["l_partkey"], ["qty"], count_col=None,
                               fanin=4)

    def _tot(b: pa.Table) -> pa.Table:
        return b.rename_columns(["l_partkey", "tot_qty"])

    joined = hash_inner_join(
        ps, totals.map_batches(_tot, batch_format="pyarrow"),
        on="l_partkey", num_partitions=4)

    def _excess(b: pa.Table) -> pa.Table:
        t = b.filter(pc.greater(
            pc.multiply(b["qty"], pa.scalar(2, pa.int64())), b["tot_qty"]))
        return t.select(["l_suppkey"])

    per_supp = grouped_sum(joined.map_batches(_excess,
                                              batch_format="pyarrow"),
                           ["l_suppkey"], [], count_col="n_parts_excess")
    sup = _supplier_nation(sf_dir).rename_columns(
        ["l_suppkey", "s_name", "n_name"])
    out = broadcast_lookup_join(per_supp, sup, on="l_suppkey",
                                join_type="inner")

    def _final(b: pa.Table) -> pa.Table:
        return pa.table({"s_suppkey": b["l_suppkey"], "s_name": b["s_name"],
                         "n_name": b["n_name"],
                         "n_parts_excess": b["n_parts_excess"]})

    return out.map_batches(_final, batch_format="pyarrow")


EXCESS_QTY_SQL = """
WITH ps AS (
    SELECT l_partkey, l_suppkey,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
    FROM lineitem WHERE year(l_shipdate) = 1997 GROUP BY 1, 2
),
t AS (SELECT l_partkey, sum(qty) AS tot_qty FROM ps GROUP BY 1)
SELECT s_suppkey, s_name, n_name,
       CAST(count(*) AS BIGINT) AS n_parts_excess
FROM ps JOIN t ON ps.l_partkey = t.l_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE qty * 2 > tot_qty
GROUP BY 1, 2, 3
"""


def q_sole_late_supplier_orders(sf_dir: str):
    """TPC-H Q21 analog (suppliers who kept orders waiting): count, per
    supplier, the multi-supplier orders on which THAT supplier was the
    only one shipping more than 60 days after the order date. The
    classic EXISTS / NOT-EXISTS pair becomes two levels of grouped
    integer aggregation after ONE partitioned fact-fact join: level 1
    collapses to (order, supplier, any_late); level 2 reduces each
    order to (n_supp, n_late, sum(supp x late)) — when exactly one
    supplier is late, that sum IS the culprit's key, no re-join."""
    from ...stages.broadcast import broadcast_lookup_join
    from ...stages.graph import grouped_sum_parts
    from ...stages.joins import hash_inner_join
    from ...stages.rollup import grouped_sum

    li = _read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                             columns=["l_orderkey", "l_suppkey",
                                      "l_shipdate"])
    orders = _read_parquet_clean(f"{sf_dir}/orders.parquet",
                                 columns=["o_orderkey", "o_orderdate"])

    def _o(b: pa.Table) -> pa.Table:
        return b.rename_columns(["l_orderkey", "o_orderdate"])

    joined = hash_inner_join(
        li, orders.map_batches(_o, batch_format="pyarrow"),
        on="l_orderkey", num_partitions=4)

    def _late(b: pa.Table) -> pa.Table:
        delay_us = pc.cast(pc.subtract(b["l_shipdate"], b["o_orderdate"]),
                           pa.int64())
        late = pc.cast(pc.greater(
            delay_us, pa.scalar(60 * _DAY_US, pa.int64())), pa.int64())
        return pa.table({"l_orderkey": b["l_orderkey"],
                         "l_suppkey": b["l_suppkey"], "late": late})

    pair = grouped_sum_parts(joined.map_batches(_late,
                                                batch_format="pyarrow"),
                             ["l_orderkey", "l_suppkey"], ["late"],
                             count_col=None, fanin=4)

    def _flags(b: pa.Table) -> pa.Table:
        is_late = pc.cast(pc.greater(b["late"], 0), pa.int64())
        return pa.table({
            "l_orderkey": b["l_orderkey"],
            "n_late": is_late,
            "late_supp": pc.multiply(b["l_suppkey"], is_late),
        })

    per_order = grouped_sum_parts(
        pair.map_batches(_flags, batch_format="pyarrow"),
        ["l_orderkey"], ["n_late", "late_supp"], count_col="n_supp",
        fanin=4)

    def _sole(b: pa.Table) -> pa.Table:
        keep = pc.and_(pc.greater_equal(b["n_supp"], 2),
                       pc.equal(b["n_late"], 1))
        return pa.table({"s_suppkey": b["late_supp"]}).filter(keep)

    waits = grouped_sum(per_order.map_batches(_sole,
                                              batch_format="pyarrow"),
                        ["s_suppkey"], [], count_col="numwait")
    names = _pq.read_table(f"{sf_dir}/supplier.parquet",
                           columns=["s_suppkey", "s_name"])
    return broadcast_lookup_join(waits, names, on="s_suppkey",
                                 join_type="inner")


SOLE_LATE_SQL = """
WITH pair AS (
    SELECT l_orderkey, l_suppkey,
           max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                    THEN 1 ELSE 0 END) AS is_late
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1, 2
),
per_order AS (
    SELECT l_orderkey, count(*) AS n_supp,
           sum(is_late) AS n_late,
           sum(l_suppkey * is_late) AS late_supp
    FROM pair GROUP BY 1
)
SELECT CAST(late_supp AS BIGINT) AS s_suppkey,
       CAST(count(*) AS BIGINT) AS numwait, s_name
FROM per_order JOIN supplier ON s_suppkey = late_supp
WHERE n_supp >= 2 AND n_late = 1
GROUP BY 1, 3
"""
