"""Round-5 closing wave, part 3: overlapping-window corpus dedup ops
and the missing TPC-H join shapes (global-argmax, per-group-scalar
broadcast predicate, having + join-back).

Each entry follows the catalog contract: a Ray-Data-first distributed
shape documented in place, integer-exact arithmetic so the DuckDB
oracle replays bit-identically, and column names matched between both
sides.
"""
from __future__ import annotations

import numpy as np

from ._shared import _read_parquet_clean, pa, pc

US = 1_000_000


def q_dup_window_docs(sf_dir: str):
    """Duplicate-substring detection over OVERLAPPING 5-word windows
    (``stages/grams.py:dup_windows``; Lee et al. 2022 semantics — every
    sliding position is a candidate, unlike the C4-style tiles of
    ``span_dedup_docs``): per 5-gram found in >= 2 distinct documents,
    its distinct-doc count, total occurrence count, and smallest doc
    id. Map-side (gram, doc) merge, ONE hash(gram) shuffle."""
    from ...stages.grams import dup_windows

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"]).repartition(8)
    return dup_windows(ds, k=5, min_docs=2, num_partitions=8)


DUP_WINDOW_SQL = """
WITH d AS (
    SELECT doc_id, string_split(text, ' ') AS arr FROM documents
),
g AS (
    SELECT doc_id,
           array_to_string(list_slice(arr, i, i + 4), ' ') AS gram
    FROM d, LATERAL unnest(generate_series(1, len(arr) - 4)) AS t(i)
)
SELECT gram,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_occ,
       CAST(min(doc_id) AS BIGINT) AS min_doc
FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
"""


def q_boilerplate_grams_source(sf_dir: str):
    """CCNet-style per-source boilerplate bigram mining
    (``stages/grams.py:source_boilerplate_grams``): 2-grams present in
    >= 20% of a source's documents (integer cross-multiplied — no
    float division) with df >= 3. Per-source doc totals are a tiny
    driver-reduced aggregate captured into the filter (broadcast small
    side); the distinct (source, gram, doc) pairs take one hash(gram)
    shuffle."""
    from ...stages.grams import source_boilerplate_grams

    ds = _read_parquet_clean(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "source"]).repartition(8)
    return source_boilerplate_grams(ds, k=2, min_df=3, frac_num=1,
                                    frac_den=5, num_partitions=8)


BOILERPLATE_GRAMS_SQL = """
WITH d AS (
    SELECT doc_id, source, string_split(text, ' ') AS arr
    FROM documents
),
g AS (
    SELECT DISTINCT doc_id, source,
           array_to_string(list_slice(arr, i, i + 1), ' ') AS gram
    FROM d, LATERAL unnest(generate_series(1, len(arr) - 1)) AS t(i)
),
s AS (
    SELECT source, CAST(count(*) AS BIGINT) AS src_docs
    FROM documents GROUP BY source
)
SELECT source, gram, CAST(count(*) AS BIGINT) AS df, src_docs
FROM g JOIN s USING (source)
GROUP BY source, gram, src_docs
HAVING count(*) >= 3 AND count(*) * 5 >= src_docs
"""


def q_top_supplier_revenue(sf_dir: str):
    """TPC-H-Q15-style top supplier: per-supplier exact e6 revenue over
    1996Q1, then every supplier tied at the GLOBAL maximum, labeled.
    Shape: date-pruned projected scan, hashpart grouped sum (bounded by
    |suppliers|), the max as a tiny dataset aggregate broadcast into an
    equality filter — only the tied rows are collected, and only THEIR
    supplier labels are fetched (dimension lookup after the argmax,
    never a broadcast of supplier)."""
    from ...stages.graph import grouped_sum_parts

    lo_us = 820_454_400 * US   # 1996-01-01 UTC
    hi_us = 828_316_800 * US   # 1996-04-01 UTC

    def _line(b: pa.Table) -> pa.Table:
        ts = pc.cast(b["l_shipdate"], pa.int64())
        keep = pc.and_(pc.greater_equal(ts, pa.scalar(lo_us, pa.int64())),
                       pc.less(ts, pa.scalar(hi_us, pa.int64())))
        t = b.filter(keep)
        price = pc.cast(pc.round(pc.multiply(t["l_extendedprice"],
                                             100.0), ndigits=0),
                        pa.int64())
        disc = pc.cast(pc.round(pc.multiply(t["l_discount"], 10000.0),
                                ndigits=0), pa.int64())
        rev = pc.multiply(price,
                          pc.subtract(pa.scalar(10000, pa.int64()),
                                      disc))
        return pa.table({"l_suppkey": t["l_suppkey"],
                         "total_revenue_e6": rev})

    line = _read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_shipdate", "l_extendedprice",
                 "l_discount"]).map_batches(_line, batch_format="pyarrow")
    agg = grouped_sum_parts(line, ["l_suppkey"], ["total_revenue_e6"],
                            count_col=None, fanin=4)
    mx = agg.max("total_revenue_e6")
    top = agg.map_batches(
        lambda b: b.filter(pc.equal(b["total_revenue_e6"],
                                    pa.scalar(mx, pa.int64()))),
        batch_format="pyarrow").take_all()
    keys = sorted(int(r["l_suppkey"]) for r in top)
    names = {int(r["s_suppkey"]): r["s_name"]
             for r in _read_parquet_clean(
                 f"{sf_dir}/supplier.parquet",
                 columns=["s_suppkey", "s_name"]).map_batches(
                 lambda b: b.filter(pc.is_in(
                     b["s_suppkey"],
                     value_set=pa.array(keys, pa.int64()))),
                 batch_format="pyarrow").take_all()}
    top = sorted(top, key=lambda r: int(r["l_suppkey"]))
    return pa.table({
        "s_suppkey": pa.array([int(r["l_suppkey"]) for r in top],
                              pa.int64()),
        "s_name": pa.array([names[int(r["l_suppkey"])] for r in top]),
        "total_revenue_e6": pa.array(
            [int(r["total_revenue_e6"]) for r in top], pa.int64())})


TOP_SUPPLIER_SQL = """
WITH r AS (
    SELECT l_suppkey,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (10000 - CAST(round(l_discount * 10000) AS BIGINT)))
                AS BIGINT) AS total_revenue_e6
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1996-04-01'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue_e6
FROM supplier JOIN r ON s_suppkey = l_suppkey
WHERE total_revenue_e6 = (SELECT max(total_revenue_e6) FROM r)
"""


def q_small_qty_revenue(sf_dir: str):
    """TPC-H-Q17-style small-quantity revenue: total extended price (in
    cents) of Brand#1 lineitems whose quantity is below 20% of that
    part's average quantity — the per-group-scalar broadcast pattern.
    The brand's part keys and the per-part (count, quantity-sum) pairs
    are both bounded by |parts in brand| and travel as captured lookup
    arrays; the 20% test is exact integer cross-multiplication
    (qty * 5 * cnt < sum_qty). Two projected scans of lineitem (one to
    build the per-part scalars, one to apply them), mirroring the
    correlated-subquery plan."""
    bp = _read_parquet_clean(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]) \
        .map_batches(lambda b: b.filter(
            pc.equal(b["p_brand"], "Brand#1")).select(["p_partkey"]),
            batch_format="pyarrow").take_all()
    brand_keys = pa.array(sorted(int(r["p_partkey"]) for r in bp),
                          pa.int64())

    def _proj(b: pa.Table) -> pa.Table:
        t = b.filter(pc.is_in(b["l_partkey"], value_set=brand_keys))
        qty = pc.cast(pc.round(t["l_quantity"], ndigits=0), pa.int64())
        price = pc.cast(pc.round(pc.multiply(t["l_extendedprice"],
                                             100.0), ndigits=0),
                        pa.int64())
        return pa.table({"l_partkey": t["l_partkey"], "qty": qty,
                         "price_c": price})

    cols = ["l_partkey", "l_quantity", "l_extendedprice"]
    from ...stages.graph import grouped_sum_parts

    proj = _read_parquet_clean(
        f"{sf_dir}/lineitem.parquet", columns=cols).map_batches(
        _proj, batch_format="pyarrow")
    agg = grouped_sum_parts(proj, ["l_partkey"], ["qty"],
                            count_col="cnt", fanin=2).take_all()
    k = np.array([int(r["l_partkey"]) for r in agg], np.int64)
    order = np.argsort(k)
    k = k[order]
    sq = np.array([int(r["qty"]) for r in agg], np.int64)[order]
    cn = np.array([int(r["cnt"]) for r in agg], np.int64)[order]

    def _apply(b: pa.Table) -> pa.Table:
        pk = b["l_partkey"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(k, pk)
        qty = b["qty"].to_numpy(zero_copy_only=False)
        price = b["price_c"].to_numpy(zero_copy_only=False)
        keep = qty * 5 * cn[idx] < sq[idx]
        return pa.table({
            "small_qty_cents": pa.array(
                [int(price[keep].sum())], pa.int64()),
            "n_lines": pa.array([int(keep.sum())], pa.int64())})

    parts = proj.map_batches(_apply, batch_format="pyarrow").take_all()
    return pa.table({
        "small_qty_cents": pa.array(
            [sum(int(r["small_qty_cents"]) for r in parts)], pa.int64()),
        "n_lines": pa.array(
            [sum(int(r["n_lines"]) for r in parts)], pa.int64())})


SMALL_QTY_SQL = """
WITH l AS (
    SELECT l_partkey,
           CAST(round(l_quantity) AS BIGINT) AS qty,
           CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand = 'Brand#1'
),
a AS (
    SELECT l_partkey, CAST(sum(qty) AS BIGINT) AS sum_qty,
           CAST(count(*) AS BIGINT) AS cnt
    FROM l GROUP BY l_partkey
)
SELECT CAST(COALESCE(sum(price_c)
            FILTER (WHERE qty * 5 * cnt < sum_qty), 0)
            AS BIGINT) AS small_qty_cents,
       CAST(count(*) FILTER (WHERE qty * 5 * cnt < sum_qty) AS BIGINT)
           AS n_lines
FROM l JOIN a USING (l_partkey)
"""


def q_large_volume_orders(sf_dir: str):
    """TPC-H-Q18-style large-volume orders: orders whose total lineitem
    quantity exceeds 300, with customer key, order date, exact cents
    total price, and the quantity sum — the having + join-back shape.
    One hashpart grouped sum over lineitem (bounded by |orders|), the
    >300 filter BEFORE the join, then one hash join against a projected
    orders scan; nothing is collected until the (small) survivor set."""
    from ...stages.graph import grouped_sum_parts

    def _lq(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": b["l_orderkey"],
            "sum_qty": pc.cast(pc.round(b["l_quantity"], ndigits=0),
                               pa.int64())})

    line = _read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_quantity"]).map_batches(
        _lq, batch_format="pyarrow")
    qsum = grouped_sum_parts(line, ["l_orderkey"], ["sum_qty"],
                             count_col=None, fanin=4).map_batches(
        lambda b: b.filter(pc.greater(b["sum_qty"],
                                      pa.scalar(300, pa.int64()))),
        batch_format="pyarrow")

    def _orders(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": b["o_orderkey"],
            "o_custkey": b["o_custkey"],
            "o_orderdate": b["o_orderdate"],
            "total_cents": pc.cast(
                pc.round(pc.multiply(b["o_totalprice"], 100.0),
                         ndigits=0), pa.int64())})

    orders = _read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate",
                 "o_totalprice"]).map_batches(
        _orders, batch_format="pyarrow")
    j = qsum.join(orders, join_type="inner", num_partitions=4,
                  on=("l_orderkey",), right_on=("o_orderkey",))
    return j.map_batches(lambda b: pa.table({
        "o_orderkey": b["l_orderkey"], "o_custkey": b["o_custkey"],
        "o_orderdate": b["o_orderdate"],
        "total_cents": b["total_cents"], "sum_qty": b["sum_qty"]}),
        batch_format="pyarrow")


LARGE_VOLUME_SQL = """
WITH q AS (
    SELECT l_orderkey,
           CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
               AS sum_qty
    FROM lineitem GROUP BY l_orderkey
    HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 300
)
SELECT o_orderkey, o_custkey, o_orderdate,
       CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents,
       sum_qty
FROM orders JOIN q ON o_orderkey = l_orderkey
"""


def _rev_e6(t: pa.Table) -> pa.Array:
    """Exact e6 revenue: round(price*100) * (10000 - round(disc*1e4))."""
    price = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0),
                             ndigits=0), pa.int64())
    disc = pc.cast(pc.round(pc.multiply(t["l_discount"], 10000.0),
                            ndigits=0), pa.int64())
    return pc.multiply(price, pc.subtract(pa.scalar(10000, pa.int64()),
                                          disc))


def _np_lookup(keys: np.ndarray, vals: np.ndarray):
    """Vectorized small-dimension lookup: sorted-key searchsorted
    closure (the broadcast-small-side pattern — the table is captured
    once per task, never re-shipped per batch)."""
    order = np.argsort(keys)
    k, v = keys[order], vals[order]

    def _get(q: np.ndarray) -> np.ndarray:
        return v[np.searchsorted(k, q)]

    return _get


def q_volume_shipping_pairs(sf_dir: str):
    """TPC-H-Q7-style volume shipping: exact e6 revenue per (supplier
    nation, customer nation, ship year) over 1995-1996, cross-nation
    pairs only. Shape: orders hash-join customer (the two BIG
    dimensions exchange once, on the custkey then orderkey spine);
    supplier->nation and nation->name are tiny captured lookups applied
    vectorized inside the map; final hashpart grouped sum over the
    bounded (nation x nation x year) key space."""
    from ...stages.graph import grouped_sum_parts

    lo_us = 788_918_400 * US   # 1995-01-01 UTC
    hi_us = 852_076_800 * US   # 1997-01-01 UTC

    nat = _read_parquet_clean(f"{sf_dir}/nation.parquet",
                              columns=["n_nationkey", "n_name"]).take_all()
    nkey = np.array([int(r["n_nationkey"]) for r in nat], np.int64)
    nname = np.array([r["n_name"] for r in nat], dtype=object)
    n_get = _np_lookup(nkey, nname)
    sup = _read_parquet_clean(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_nationkey"]).take_all()
    s_get = _np_lookup(
        np.array([int(r["s_suppkey"]) for r in sup], np.int64),
        np.array([int(r["s_nationkey"]) for r in sup], np.int64))

    cust = _read_parquet_clean(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey"])
    orders = _read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    oc = orders.join(cust, join_type="inner", num_partitions=4,
                     on=("o_custkey",), right_on=("c_custkey",))

    def _line(b: pa.Table) -> pa.Table:
        ts = pc.cast(b["l_shipdate"], pa.int64())
        keep = pc.and_(pc.greater_equal(ts, pa.scalar(lo_us, pa.int64())),
                       pc.less(ts, pa.scalar(hi_us, pa.int64())))
        t = b.filter(keep)
        yr = pc.cast(pc.year(t["l_shipdate"]), pa.int64())
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "l_suppkey": t["l_suppkey"],
                         "l_year": yr, "revenue_e6": _rev_e6(t)})

    line = _read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate",
                 "l_extendedprice", "l_discount"]).map_batches(
        _line, batch_format="pyarrow")
    j = line.join(oc, join_type="inner", num_partitions=4,
                  on=("l_orderkey",), right_on=("o_orderkey",))

    def _label(b: pa.Table) -> pa.Table:
        sk = b["l_suppkey"].to_numpy(zero_copy_only=False)
        cn = b["c_nationkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        supp_nation = n_get(s_get(sk))
        cust_nation = n_get(cn)
        keep = np.flatnonzero(supp_nation != cust_nation)
        take = pa.array(keep)
        return pa.table({
            "supp_nation": pa.array(supp_nation[keep].tolist(),
                                    pa.string()),
            "cust_nation": pa.array(cust_nation[keep].tolist(),
                                    pa.string()),
            "l_year": b["l_year"].take(take),
            "revenue_e6": b["revenue_e6"].take(take)})

    lab = j.map_batches(_label, batch_format="pyarrow")
    return grouped_sum_parts(lab, ["supp_nation", "cust_nation",
                                   "l_year"], ["revenue_e6"],
                             count_col=None, fanin=4)


VOLUME_SHIPPING_SQL = """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (10000 - CAST(round(l_discount * 10000) AS BIGINT)))
            AS BIGINT) AS revenue_e6
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND sn.n_name <> cn.n_name
GROUP BY 1, 2, 3
"""


def q_market_share_year(sf_dir: str):
    """TPC-H-Q8-style market share, kept EXACT by returning the share
    as a rational: per ship year, NATION_2's supplier revenue
    (numerator) and all-supplier revenue (denominator) over PROMO-type
    parts ordered by ASIA-region customers. Shape: part is a REAL hash
    join (the type slice is still corpus-scale at 100 TB), orders
    hash-joins customer, supplier/nation are tiny captured lookups; the
    numerator rides the same grouped sum as the denominator via an
    indicator multiply — one exchange, two sums."""
    from ...stages.graph import grouped_sum_parts

    nat = _read_parquet_clean(
        f"{sf_dir}/nation.parquet",
        columns=["n_nationkey", "n_name", "n_regionkey"]).take_all()
    nkey = np.array([int(r["n_nationkey"]) for r in nat], np.int64)
    nreg = np.array([int(r["n_regionkey"]) for r in nat], np.int64)
    nname = np.array([r["n_name"] for r in nat], dtype=object)
    reg_get = _np_lookup(nkey, nreg)
    name_get = _np_lookup(nkey, nname)
    sup = _read_parquet_clean(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_nationkey"]).take_all()
    s_get = _np_lookup(
        np.array([int(r["s_suppkey"]) for r in sup], np.int64),
        np.array([int(r["s_nationkey"]) for r in sup], np.int64))
    asia = 2  # region ASIA

    part = _read_parquet_clean(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_type"]).map_batches(
        lambda b: b.filter(pc.equal(b["p_type"], "PROMO"))
        .select(["p_partkey"]), batch_format="pyarrow")
    cust = _read_parquet_clean(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey"]).map_batches(
        lambda b: b.filter(pa.array(
            reg_get(b["c_nationkey"].to_numpy(zero_copy_only=False)
                    .astype(np.int64)) == asia))
        .select(["c_custkey"]), batch_format="pyarrow")
    orders = _read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    oc = orders.join(cust, join_type="inner", num_partitions=4,
                     on=("o_custkey",), right_on=("c_custkey",))

    def _line(b: pa.Table) -> pa.Table:
        yr = pc.cast(pc.year(b["l_shipdate"]), pa.int64())
        return pa.table({"l_orderkey": b["l_orderkey"],
                         "l_partkey": b["l_partkey"],
                         "l_suppkey": b["l_suppkey"],
                         "l_year": yr, "revenue_e6": _rev_e6(b)})

    line = _read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_shipdate",
                 "l_extendedprice", "l_discount"]).map_batches(
        _line, batch_format="pyarrow")
    lp = line.join(part, join_type="inner", num_partitions=4,
                   on=("l_partkey",), right_on=("p_partkey",))
    j = lp.join(oc, join_type="inner", num_partitions=4,
                on=("l_orderkey",), right_on=("o_orderkey",))

    def _split(b: pa.Table) -> pa.Table:
        sk = b["l_suppkey"].to_numpy(zero_copy_only=False)
        is_nat = (name_get(s_get(sk)) == "NATION_2").astype(np.int64)
        rev = b["revenue_e6"].to_numpy(zero_copy_only=False)
        return pa.table({"l_year": b["l_year"],
                         "nation_volume_e6": pa.array(rev * is_nat),
                         "total_volume_e6": b["revenue_e6"]})

    lab = j.map_batches(_split, batch_format="pyarrow")
    return grouped_sum_parts(lab, ["l_year"],
                             ["nation_volume_e6", "total_volume_e6"],
                             count_col=None, fanin=2)


MARKET_SHARE_SQL = """
SELECT CAST(year(l_shipdate) AS BIGINT) AS l_year,
       CAST(sum(CASE WHEN sn.n_name = 'NATION_2'
                THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                     * (10000 - CAST(round(l_discount * 10000) AS BIGINT))
                ELSE 0 END) AS BIGINT) AS nation_volume_e6,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (10000 - CAST(round(l_discount * 10000) AS BIGINT)))
            AS BIGINT) AS total_volume_e6
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE p_type = 'PROMO' AND cn.n_regionkey = 2
GROUP BY 1
"""


def q_closeness_docs(sf_dir: str):
    """Closeness centrality from a fixed 8-seed set over the same
    deterministic variable-degree undirected link graph as
    ``bfs_hops_docs``/``kcore_docs``: per seed, the count of OTHER
    reachable nodes and the exact sum of hop distances — closeness
    stays a rational (n_reach, sum_hops), never a float division.
    Multi-source labeled frontier BFS: each round ONE broadcast of the
    combined (seed, node) frontier (``ray.put``) and one map over the
    partition-deduped edge Dataset emits the next ring per seed;
    visited state accumulates driver-side under the bounded-node
    contract documented for the BFS family (|seeds| x |nodes| ids — at
    100 TB, seeds are a handful of probe points, not the corpus)."""
    import pyarrow.parquet as _pq
    import ray as _ray

    from ...arrow_utils import stable_part_codes

    n = _pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    seeds = list(range(8))
    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id"]).repartition(4)

    def _edges(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        srcs, dsts = [], []
        for j in range(1, 7):
            m = j <= 1 + d % 6
            s = d[m]
            t = (s * 31 + 97 * j) % n
            keep = s != t
            srcs.append(np.minimum(s[keep], t[keep]))
            dsts.append(np.maximum(s[keep], t[keep]))
        return pa.table({"u": pa.array(np.concatenate(srcs)),
                         "v": pa.array(np.concatenate(dsts))})

    mod = 4 * 64

    def _part_u(b: pa.Table) -> pa.Table:
        h = stable_part_codes(b["u"], None)
        return b.append_column(
            "__part", pa.array((h % np.uint64(mod)).astype(np.int32)))

    def _dedup(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        if t.num_rows == 0:
            return pa.table({"u": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64())})
        u = t["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = np.unique(u * np.int64(2 ** 32) + v)
        return pa.table({"u": pa.array(key // np.int64(2 ** 32)),
                         "v": pa.array(key % np.int64(2 ** 32))})

    edges = (ds.map_batches(_edges, batch_format="pyarrow")
             .map_batches(_part_u, batch_format="pyarrow")
             .repartition(4).groupby("__part")
             .map_groups(_dedup, batch_format="pyarrow")).materialize()

    visited = {s: {s} for s in seeds}
    sum_hops = {s: 0 for s in seeds}
    frontier = {s: {s} for s in seeds}
    hop = 0
    while any(frontier.values()):
        hop += 1
        fs = np.array([s for s in seeds for _ in frontier[s]], np.int64)
        fn = np.array([x for s in seeds for x in frontier[s]], np.int64)
        f_ref = _ray.put((fs, fn))

        def _ring(b: pa.Table) -> pa.Table:
            sarr, narr = _ray.get(f_ref)
            u = b["u"].to_numpy(zero_copy_only=False).astype(np.int64)
            v = b["v"].to_numpy(zero_copy_only=False).astype(np.int64)
            # per-seed frontier membership: encode (seed, node) pairs
            # and probe both edge directions with one searchsorted each
            enc = np.unique(sarr * np.int64(2 ** 32) + narr)
            out_s, out_n = [], []
            for sd in np.unique(sarr):
                base = sd * np.int64(2 ** 32)
                lo = np.searchsorted(enc, base)
                hi = np.searchsorted(enc, base + np.int64(2 ** 32))
                nodes = enc[lo:hi] - base
                mu = np.isin(u, nodes)
                mv = np.isin(v, nodes)
                nb = np.unique(np.concatenate([v[mu], u[mv]]))
                out_s.append(np.full(len(nb), sd, np.int64))
                out_n.append(nb)
            if not out_s:
                return pa.table({"seed": pa.array([], pa.int64()),
                                 "node": pa.array([], pa.int64())})
            return pa.table({"seed": pa.array(np.concatenate(out_s)),
                             "node": pa.array(np.concatenate(out_n))})

        rings = edges.map_batches(_ring, batch_format="pyarrow") \
            .take_all()
        nxt = {s: set() for s in seeds}
        for r in rings:
            sd, nd = int(r["seed"]), int(r["node"])
            if nd not in visited[sd]:
                nxt[sd].add(nd)
        for s in seeds:
            visited[s] |= nxt[s]
            sum_hops[s] += hop * len(nxt[s])
        frontier = nxt
        if hop > 64:
            raise RuntimeError("closeness bfs exceeded diameter bound")
    return pa.table({
        "seed": pa.array(seeds, pa.int64()),
        "n_reach": pa.array([len(visited[s]) - 1 for s in seeds],
                            pa.int64()),
        "sum_hops": pa.array([sum_hops[s] for s in seeds], pa.int64())})


CLOSENESS_SQL = """
WITH RECURSIVE nn AS (SELECT count(*) AS c FROM documents),
e0 AS (
    SELECT doc_id AS src,
           (doc_id * 31 + 97 * j) % (SELECT c FROM nn) AS dst
    FROM documents, unnest([1, 2, 3, 4, 5, 6]) t(j)
    WHERE j <= 1 + doc_id % 6
),
und AS (
    SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
    FROM e0 WHERE src <> dst
),
ed AS (
    SELECT u AS src, v AS dst FROM und
    UNION ALL
    SELECT v, u FROM und
),
reach(seed, node, hop) AS (
    SELECT CAST(s AS BIGINT), CAST(s AS BIGINT), CAST(0 AS BIGINT)
    FROM unnest([0, 1, 2, 3, 4, 5, 6, 7]) t(s)
    UNION
    SELECT r.seed, ed.dst, r.hop + 1
    FROM reach r JOIN ed ON ed.src = r.node
    WHERE r.hop < 15
),
m AS (
    SELECT seed, node, min(hop) AS hop FROM reach GROUP BY 1, 2
)
SELECT seed, CAST(count(*) - 1 AS BIGINT) AS n_reach,
       CAST(sum(hop) AS BIGINT) AS sum_hops
FROM m GROUP BY seed
"""


def q_brand_qty_revenue(sf_dir: str):
    """TPC-H-Q19-style three-branch compound predicate: exact e6
    revenue and line count over (brand, quantity-range, size-range)
    disjunctions evaluated AFTER one hash join of lineitem against the
    projected part dimension — the predicate is a single vectorized
    Arrow expression per batch (three AND-chains OR-ed), never a row
    loop, and the join carries only (p_brand, p_size)."""

    def _part(b: pa.Table) -> pa.Table:
        return pa.table({"p_partkey": b["p_partkey"],
                         "p_brand": b["p_brand"],
                         "p_size": b["p_size"]})

    part = _read_parquet_clean(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand", "p_size"]).map_batches(
        _part, batch_format="pyarrow")

    def _line(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_partkey": b["l_partkey"],
            "qty": pc.cast(pc.round(b["l_quantity"], ndigits=0),
                           pa.int64()),
            "revenue_e6": _rev_e6(b)})

    line = _read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice",
                 "l_discount"]).map_batches(_line, batch_format="pyarrow")
    j = line.join(part, join_type="inner", num_partitions=4,
                  on=("l_partkey",), right_on=("p_partkey",))

    def _branch(b, brand, qlo, qhi, slo, shi):
        sz = pc.cast(b["p_size"], pa.int64())
        return pc.and_(
            pc.and_(pc.equal(b["p_brand"], brand),
                    pc.and_(pc.greater_equal(
                        b["qty"], pa.scalar(qlo, pa.int64())),
                        pc.less_equal(b["qty"],
                                      pa.scalar(qhi, pa.int64())))),
            pc.and_(pc.greater_equal(sz, pa.scalar(slo, pa.int64())),
                    pc.less_equal(sz, pa.scalar(shi, pa.int64()))))

    def _filt(b: pa.Table) -> pa.Table:
        keep = pc.or_(pc.or_(
            _branch(b, "Brand#1", 1, 11, 1, 5),
            _branch(b, "Brand#2", 10, 20, 1, 10)),
            _branch(b, "Brand#3", 20, 30, 1, 15))
        t = b.filter(keep)
        rev = t["revenue_e6"].to_numpy(zero_copy_only=False)
        return pa.table({
            "revenue_e6": pa.array([int(rev.sum())], pa.int64()),
            "n_lines": pa.array([t.num_rows], pa.int64())})

    parts = j.map_batches(_filt, batch_format="pyarrow").take_all()
    return pa.table({
        "revenue_e6": pa.array(
            [sum(int(r["revenue_e6"]) for r in parts)], pa.int64()),
        "n_lines": pa.array(
            [sum(int(r["n_lines"]) for r in parts)], pa.int64())})


BRAND_QTY_SQL = """
SELECT CAST(COALESCE(sum(
           CAST(round(l_extendedprice * 100) AS BIGINT)
           * (10000 - CAST(round(l_discount * 10000) AS BIGINT))), 0)
           AS BIGINT) AS revenue_e6,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1'
       AND CAST(round(l_quantity) AS BIGINT) BETWEEN 1 AND 11
       AND p_size BETWEEN 1 AND 5)
   OR (p_brand = 'Brand#2'
       AND CAST(round(l_quantity) AS BIGINT) BETWEEN 10 AND 20
       AND p_size BETWEEN 1 AND 10)
   OR (p_brand = 'Brand#3'
       AND CAST(round(l_quantity) AS BIGINT) BETWEEN 20 AND 30
       AND p_size BETWEEN 1 AND 15)
"""
