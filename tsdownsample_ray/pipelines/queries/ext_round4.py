"""Round-4 wave: GIF decode, chi-square, Holt-Winters, keyword tagging, graph audits, LOD routing, edit-distance joins, CDC chunking.

Split from the former pipelines/queries.py monolith (r4 verdict
next-round #5); statement order inside this module is the original
file order. Explicit cross-module imports are generated: backward
dependencies at the top, forward (function-body-only) dependencies at
the bottom so package import order stays acyclic.
"""
from __future__ import annotations

from ._shared import W15M, W1D, W1H, _rd, _read_parquet_clean, np, pa, pc
from .downsample_core import _events_cents
from .graph_link import _graph_targets
from ...arrow_utils import group_codes, make_add_part

def q_multimodal_gif_decode(sf_dir: str):
    """REAL GIF decode through the actor-pool stage: 8px-wide grayscale
    GIF87a images whose palette indices ARE the documents' own bytes
    (zero-padded to whole rows), compressed with the from-scratch
    adaptive LZW encoder and decoded with DecodeImage's full LZW decoder
    (variable code width, dictionary reset, KwKwK) —
    ``functions/gif.py``. The gray palette replicates each byte into RGB,
    so the per-doc pixel stats replay from the text with a factor 3 on
    counts/sums (ASCII: unicode(char) == byte)."""
    rd = _rd()
    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"])
    from ...functions.gif import encode_gif
    from ...stages.multimodal import DecodeImage

    def _media(b: pa.Table) -> pa.Table:
        import numpy as _np

        payloads, hs = [], []
        for t in b["text"].to_pylist():
            raw = t.encode()
            h = max(1, -(-len(raw) // 8))
            buf = _np.zeros(h * 8, dtype=_np.uint8)
            buf[: len(raw)] = _np.frombuffer(raw, _np.uint8)
            payloads.append(encode_gif(buf.reshape(h, 8)))
            hs.append(h)
        return pa.table({
            "media_id": b["doc_id"],
            "kind": pa.array(["image"] * b.num_rows),
            "payload": pa.array(payloads, pa.binary()),
            "height": pa.array(hs, pa.int32()),
            "width": pa.array([8] * b.num_rows, pa.int32()),
        })

    media = ds.map_batches(_media, batch_format="pyarrow", batch_size=256)
    dec = media.map_batches(DecodeImage, batch_format="pyarrow",
                            batch_size=256, concurrency=(1, 8))

    def _stats(b: pa.Table) -> pa.Table:
        import numpy as _np

        s = b["pixels"]
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        flat = s.values.to_numpy(zero_copy_only=False).astype(_np.int64)
        off = s.offsets.to_numpy(zero_copy_only=False).astype(_np.int64)
        cs = _np.concatenate([[0], _np.cumsum(flat)])
        n = off[1:] - off[:-1]
        first = _np.where(n > 0, flat[_np.minimum(off[:-1], len(flat) - 1)]
                          if len(flat) else 0, -1)
        nz = _np.flatnonzero(flat)
        lo = _np.searchsorted(nz, off[:-1], side="left")
        hi = _np.searchsorted(nz, off[1:], side="left")
        has = hi > lo
        last_nz = _np.where(
            has, flat[nz[_np.maximum(hi - 1, 0)]] if len(nz) else 0, -1)
        return pa.table({
            "media_id": b["media_id"],
            "n_bytes": pa.array(n, pa.int64()),
            "sum_codes": pa.array(cs[off[1:]] - cs[off[:-1]], pa.int64()),
            "first_code": pa.array(
                _np.where(first == 0, -1, first), pa.int64()),
            "last_code": pa.array(last_nz, pa.int64()),
        })

    return dec.map_batches(_stats, batch_format="pyarrow")


# gray-palette GIF replicates each text byte into R,G,B: counts and sums
# replay from the text x3; first/last byte values are channel-invariant
MULTIMODAL_GIF_SQL = """
SELECT doc_id AS media_id,
       24 * greatest(1, CAST(ceil(length(text) / 8.0) AS BIGINT))
           AS n_bytes,
       CAST(3 * COALESCE(list_sum(list_transform(
            range(1, length(text) + 1),
            i -> unicode(substring(text, i, 1)))), 0) AS BIGINT)
            AS sum_codes,
       CAST(CASE WHEN length(text) = 0 THEN -1
            ELSE unicode(substring(text, 1, 1)) END AS BIGINT) AS first_code,
       CAST(CASE WHEN length(text) = 0 THEN -1
            ELSE unicode(substring(text, length(text), 1))
       END AS BIGINT) AS last_code
FROM documents
"""


def q_chi2_lang_source(sf_dir: str):
    """Chi-square independence test of (lang x source) over documents
    (``stages/abtest.py:chi2_contingency``): exact floor-per-cell scaled
    statistic over the full R x C cross product (zero cells included),
    one hashpart grouped count, bounded-cell finalize; Cramer's V is the
    one pinned float."""
    from ...stages.abtest import chi2_contingency

    docs = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                               columns=["lang", "source"]).repartition(4)
    return chi2_contingency(docs, row_col="lang", col_col="source",
                            fanin=4)


CHI2_SQL = """
WITH o AS (
    SELECT lang, source, CAST(count(*) AS BIGINT) AS o
    FROM documents GROUP BY 1, 2
),
r AS (SELECT lang, CAST(sum(o) AS BIGINT) AS r FROM o GROUP BY 1),
c AS (SELECT source, CAST(sum(o) AS BIGINT) AS c FROM o GROUP BY 1),
n_ AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM o),
grid AS (
    SELECT r.lang, c.source, r.r, c.c,
           coalesce(o.o, 0) AS o, n_.n
    FROM r CROSS JOIN c CROSS JOIN n_
    LEFT JOIN o ON o.lang = r.lang AND o.source = c.source
),
terms AS (
    SELECT n,
           (CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c)
           * (CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c)
           * 1000000 // (CAST(n AS HUGEINT) * r * c) AS term
    FROM grid
),
agg AS (
    SELECT any_value(n) AS n, CAST(sum(term) AS BIGINT) AS chi2_e6,
           (SELECT count(*) FROM r) AS n_rows,
           (SELECT count(*) FROM c) AS n_cols
    FROM terms
)
SELECT n, CAST(n_rows AS BIGINT) AS n_rows, CAST(n_cols AS BIGINT) AS n_cols,
       CAST((n_rows - 1) * (n_cols - 1) AS BIGINT) AS dof,
       chi2_e6,
       sqrt((CAST(chi2_e6 AS DOUBLE) / 1000000)
            / (CAST(n AS DOUBLE) * (least(n_rows, n_cols) - 1)))
           AS cramers_v
FROM agg
"""


def q_holtwinters_1h(sf_dir: str):
    """Additive Holt-Winters (alpha 1/8, beta 1/16, gamma 1/8, season
    m=24 hour-of-day) per event_type over the 1h tier
    (``stages/smoothing.py:holt_winters_fixed_point``): exact integer
    shift arithmetic, seasonal vector carried per series; the SQL oracle
    replays the recursion with a LIST-typed seasonal state in a
    recursive CTE."""
    from ...stages.rollup import rollup
    from ...stages.smoothing import holt_winters_fixed_point

    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    rolled = rollup(ev.map_batches(_series, batch_format="pyarrow"), W1H)
    return holt_winters_fixed_point(rolled, 3, 4, 3, m=24, window_us=W1H,
                                    num_partitions=2)


HOLTWINTERS_SQL = f"""
WITH RECURSIVE numbered AS MATERIALIZED (
    SELECT event_type AS series_id, bucket, y,
           (bucket // {W1H}) % 24 AS slot,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY bucket) AS idx
    FROM (
        SELECT event_type, epoch_us(ts) // {W1H} * {W1H} AS bucket,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
        FROM events GROUP BY event_type, bucket
    )
),
rec AS (
    SELECT series_id, bucket, y, idx, slot,
           y AS level, CAST(0 AS BIGINT) AS trend, y AS forecast,
           list_transform(range(1, 25), j -> CAST(0 AS BIGINT)) AS season
    FROM numbered WHERE idx = 1
    UNION ALL
    SELECT series_id, bucket, y, idx, slot, level,
           -- exact BIGINT floor(v / 2^k): DuckDB // truncates toward zero,
           -- so negatives take -((-v + 2^k - 1) // 2^k); no double
           -- round-trip, so the replay stays exact past 2^53 (r4 advice)
           trend0 + (CASE WHEN level - l0 - trend0 >= 0
                     THEN (level - l0 - trend0) // 16
                     ELSE -(((-(level - l0 - trend0)) + 15) // 16)
                     END) AS trend,
           f AS forecast,
           list_transform(range(1, 25), j -> CASE WHEN j = slot + 1
               THEN s0[j] + (CASE WHEN y - level - s0[j] >= 0
                             THEN (y - level - s0[j]) // 8
                             ELSE -(((-(y - level - s0[j])) + 7) // 8)
                             END)
               ELSE s0[j] END) AS season
    FROM (
        SELECT n.series_id, n.bucket, n.y, n.idx, n.slot,
               r.level AS l0, r.trend AS trend0, r.season AS s0,
               r.level + r.trend + r.season[n.slot + 1] AS f,
               (r.level + r.trend)
                 + (CASE WHEN n.y - (r.level + r.trend
                                     + r.season[n.slot + 1]) >= 0
                    THEN (n.y - (r.level + r.trend
                                 + r.season[n.slot + 1])) // 8
                    ELSE -(((-(n.y - (r.level + r.trend
                                      + r.season[n.slot + 1]))) + 7) // 8)
                    END) AS level
        FROM rec r JOIN numbered n
          ON n.series_id = r.series_id AND n.idx = r.idx + 1
    ) z
)
SELECT series_id, bucket, y, level, trend,
       season[slot + 1] AS seasonal, forecast
FROM rec
"""


# deterministic multi-pattern dictionary for the keyword tagger — the
# patterns include substring-of-each-other and multi-token cases so the
# non-overlapping leftmost count semantics are actually exercised
_KEYWORDS = ("scan", "hash scan", "window", "batch batch", "order",
             "merge part", "an")


def q_keyword_tag_docs(sf_dir: str):
    """Multi-pattern keyword tagging over the corpus: count the
    NON-OVERLAPPING leftmost occurrences of each dictionary pattern in
    every document (the Aho-Corasick use case, vectorized as one Arrow
    ``count_substring`` kernel pass per pattern — P kernel calls per
    batch, zero Python per row; the pattern list is a broadcast-small
    closure constant). Output per pattern: docs matched + total
    occurrences. SQL replays via the replace-length trick, which has the
    identical greedy leftmost semantics."""
    docs = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"]).repartition(4)

    def _tag(b: pa.Table) -> pa.Table:
        import numpy as _np

        text = b["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        pats, n_docs, n_occ = [], [], []
        for p in _KEYWORDS:
            c = pc.count_substring(text, p).to_numpy(zero_copy_only=False)
            c = c.astype(_np.int64)
            pats.append(p)
            n_docs.append(int((c > 0).sum()))
            n_occ.append(int(c.sum()))
        return pa.table({"pattern": pa.array(pats),
                         "n_docs": pa.array(n_docs, pa.int64()),
                         "n_occurrences": pa.array(n_occ, pa.int64())})

    def _merge(b: pa.Table) -> pa.Table:
        g = b.group_by(["pattern"]).aggregate(
            [("n_docs", "sum"), ("n_occurrences", "sum")])
        from ...arrow_utils import rename_agg

        return rename_agg(g, {"pattern": "pattern",
                              "n_docs_sum": "n_docs",
                              "n_occurrences_sum": "n_occurrences"})

    # per-block P-row partials -> one tiny merge (|patterns| rows total)
    return docs.map_batches(_tag, batch_format="pyarrow").repartition(
        1).map_batches(_merge, batch_format="pyarrow")


KEYWORD_TAG_SQL = """
WITH pat AS (SELECT * FROM (VALUES {values}) p(pattern)),
cnt AS (
    SELECT p.pattern,
           (length(d.text) - length(replace(d.text, p.pattern, '')))
               // length(p.pattern) AS c
    FROM documents d CROSS JOIN pat p
)
SELECT pattern,
       CAST(count(*) FILTER (WHERE c > 0) AS BIGINT) AS n_docs,
       CAST(sum(c) AS BIGINT) AS n_occurrences
FROM cnt GROUP BY pattern
""".format(values=", ".join(f"('{p}')" for p in _KEYWORDS))


def q_backtest_snaive_1h(sf_dir: str):
    """Seasonal-naive forecasting backtest with exact-integer MASE parts
    per event_type over the 1h tier: forecast y[t] = y[t-24 buckets by
    ROW position], absolute errors and the in-sample naive denominator
    (mean |y_t - y_{t-1}|) accumulated as exact int64 sums; MASE is the
    ONE pinned float ratio of the two rational means. One hash(series)
    shuffle + one sorted shift pass (`stages/backfill.py`-style row
    positioning); SQL replays via lag(24)/lag(1) windows."""
    from ...stages.rollup import rollup

    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    rolled = rollup(ev.map_batches(_series, batch_format="pyarrow"), W1H)

    from ...arrow_utils import stable_part_codes

    mod = 2 * 64

    _add_part = make_add_part("series_id", mod)

    def _mase(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        s_type = t["series_id"].type
        empty = pa.table({
            "series_id": pa.array([], s_type),
            "n_forecasts": pa.array([], pa.int64()),
            "sum_abs_err": pa.array([], pa.int64()),
            "n_naive": pa.array([], pa.int64()),
            "sum_abs_naive": pa.array([], pa.int64()),
            "mase": pa.array([], pa.float64())})
        if t.num_rows == 0:
            return empty
        t = t.take(pc.sort_indices(t, sort_keys=[
            ("series_id", "ascending"), ("bucket", "ascending")]))
        sid = t["series_id"]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = group_codes(sid)
        y = t["sum_y"].to_numpy(zero_copy_only=False).astype(np.int64)
        out = {k: [] for k in ("i", "nf", "se", "nn", "sn")}
        heads = np.ones(len(codes), dtype=bool)
        heads[1:] = codes[1:] != codes[:-1]
        seg = np.flatnonzero(heads)
        ends = np.append(seg[1:], len(codes))
        for a, b_ in zip(seg, ends):
            v = y[a:b_]
            e24 = np.abs(v[24:] - v[:-24]) if len(v) > 24 else v[:0]
            e1 = np.abs(v[1:] - v[:-1]) if len(v) > 1 else v[:0]
            out["i"].append(a)
            out["nf"].append(len(e24))
            out["se"].append(int(e24.sum()))
            out["nn"].append(len(e1))
            out["sn"].append(int(e1.sum()))
        nf = np.array(out["nf"], np.int64)
        se = np.array(out["se"], np.int64)
        nn = np.array(out["nn"], np.int64)
        sn = np.array(out["sn"], np.int64)
        ok = (nf > 0) & (sn > 0)
        with np.errstate(divide="ignore", invalid="ignore"):
            mase = (se.astype(np.float64) / nf) / (sn.astype(np.float64)
                                                   / nn)
        return pa.table({
            "series_id": sid.take(pa.array(np.array(out["i"], np.int64))),
            "n_forecasts": pa.array(nf),
            "sum_abs_err": pa.array(se),
            "n_naive": pa.array(nn),
            "sum_abs_naive": pa.array(sn),
            "mase": pa.array(np.where(ok, mase, np.nan), pa.float64(),
                             mask=~ok)})

    parted = rolled.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(2).groupby("__part").map_groups(
        _mase, batch_format="pyarrow")


BACKTEST_SNAIVE_SQL = f"""
WITH r AS (
    SELECT event_type AS series_id,
           epoch_us(ts) // {W1H} * {W1H} AS bucket,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
    FROM events GROUP BY 1, 2
),
l AS (
    SELECT series_id, y,
           lag(y, 24) OVER (PARTITION BY series_id ORDER BY bucket) AS y24,
           lag(y, 1) OVER (PARTITION BY series_id ORDER BY bucket) AS y1
    FROM r
),
agg AS (
    SELECT series_id,
           CAST(count(y24) AS BIGINT) AS n_forecasts,
           CAST(coalesce(sum(abs(y - y24)), 0) AS BIGINT) AS sum_abs_err,
           CAST(count(y1) AS BIGINT) AS n_naive,
           CAST(coalesce(sum(abs(y - y1)), 0) AS BIGINT) AS sum_abs_naive
    FROM l GROUP BY series_id
)
SELECT series_id, n_forecasts, sum_abs_err, n_naive, sum_abs_naive,
       CASE WHEN n_forecasts > 0 AND sum_abs_naive > 0
            THEN (CAST(sum_abs_err AS DOUBLE) / n_forecasts)
                 / (CAST(sum_abs_naive AS DOUBLE) / n_naive)
            ELSE NULL END AS mase
FROM agg
"""


def q_twohop_docs(sf_dir: str):
    """2-hop neighborhood profile of the doc link graph: for every node,
    the count of DISTINCT nodes reachable in exactly <= 2 directed hops
    (excluding the node itself) — one edges-to-edges hash join + one
    hashpart distinct count; the neighborhood-growth signal used for
    supernode detection. SQL replays with the identical join."""
    import numpy as np
    import pyarrow.parquet as _pq

    from ...stages.dedup import distinct_pairs
    from ...stages.graph import grouped_sum_parts

    n = _pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    nodes = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                                columns=["doc_id"]).repartition(4)

    def _edges(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy()
        ts = _graph_targets(d, n)
        src = np.concatenate([d.astype(np.int64)] * 3)
        dst = np.concatenate(ts)
        t = pa.table({"src": pa.array(src), "dst": pa.array(dst)})
        return t.filter(pc.invert(pc.equal(t["src"], t["dst"])))

    edges = nodes.map_batches(_edges, batch_format="pyarrow")
    e1 = distinct_pairs(edges, cols=("src", "dst"), num_partitions=4)
    hop2 = e1.join(
        e1.map_batches(lambda b: pa.table({"mid": b["src"],
                                           "dst2": b["dst"]}),
                       batch_format="pyarrow"),
        join_type="inner", num_partitions=4, on=("dst",),
        right_on=("mid",))
    reach = hop2.map_batches(
        lambda b: pa.table({"src": b["src"], "v": b["dst2"]}),
        batch_format="pyarrow").union(
        e1.map_batches(lambda b: pa.table({"src": b["src"],
                                           "v": b["dst"]}),
                       batch_format="pyarrow"))
    reach = reach.map_batches(
        lambda b: b.filter(pc.invert(pc.equal(b["src"], b["v"]))),
        batch_format="pyarrow")
    dr = distinct_pairs(reach, cols=("src", "v"), num_partitions=4)
    return grouped_sum_parts(
        dr.map_batches(lambda b: pa.table({"doc_id": b["src"]}),
                       batch_format="pyarrow"),
        ["doc_id"], [], count_col="n_within_2", fanin=4)


TWOHOP_SQL = """
WITH n AS (SELECT count(*) AS c FROM documents),
e AS (
    SELECT DISTINCT d.doc_id AS src,
           (d.doc_id*31 + 97*j.j) % (SELECT c FROM n) AS dst
    FROM documents d CROSS JOIN (VALUES (1), (2), (3)) AS j(j)),
d_ AS (SELECT src, dst FROM e WHERE src != dst),
reach AS (
    SELECT src, dst AS v FROM d_
    UNION
    SELECT a.src, b.dst AS v FROM d_ a JOIN d_ b ON a.dst = b.src
)
SELECT src AS doc_id, CAST(count(*) AS BIGINT) AS n_within_2
FROM reach WHERE src != v GROUP BY src
"""


def q_order_priority_check(sf_dir: str):
    """TPC-H Q4 analog (order priority checking — the corpus lineitem has
    no commit/receipt dates, so the late-ship predicate is ``l_shipdate >
    o_orderdate``): orders in a fixed quarter with at least one late
    lineitem, counted per priority. Distributed semi-join shape: the
    probe side reduces to DISTINCT qualifying orderkeys map-side
    (`dedup.distinct_pairs` on one column), ONE hash(orderkey) join, then
    a hashpart grouped count by priority."""
    from ...stages.dedup import distinct_pairs
    from ...stages.graph import grouped_sum_parts

    orders = _read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"])

    def _win(b: pa.Table) -> pa.Table:
        d = pc.cast(b["o_orderdate"], pa.date32())
        lo = pa.scalar(__import__("datetime").date(1996, 1, 1))
        hi = pa.scalar(__import__("datetime").date(1996, 4, 1))
        m = pc.and_(pc.greater_equal(d, lo), pc.less(d, hi))
        t = pa.table({"o_orderkey": b["o_orderkey"],
                      "o_orderdate": d,
                      "o_orderpriority": b["o_orderpriority"]})
        return t.filter(m)

    owin = orders.map_batches(_win, batch_format="pyarrow")
    li = _read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                             columns=["l_orderkey", "l_shipdate"])
    j = owin.join(
        li.map_batches(lambda b: pa.table({
            "l_orderkey": b["l_orderkey"],
            "l_shipdate": pc.cast(b["l_shipdate"], pa.date32())}),
            batch_format="pyarrow"),
        join_type="inner", num_partitions=4,
        on=("o_orderkey",), right_on=("l_orderkey",))
    late = j.map_batches(
        lambda b: b.filter(pc.greater(b["l_shipdate"], b["o_orderdate"])),
        batch_format="pyarrow")
    keys = distinct_pairs(
        late.map_batches(lambda b: pa.table({
            "o_orderkey": b["o_orderkey"],
            "o_orderpriority": b["o_orderpriority"]}),
            batch_format="pyarrow"),
        cols=("o_orderkey", "o_orderpriority"), num_partitions=4)
    return grouped_sum_parts(
        keys.map_batches(lambda b: pa.table(
            {"o_orderpriority": b["o_orderpriority"]}),
            batch_format="pyarrow"),
        ["o_orderpriority"], [], count_col="order_count", fanin=4)


ORDER_PRIORITY_SQL = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
"""


def q_custdist_orders(sf_dir: str):
    """TPC-H Q13 analog (customer order-count distribution): per-customer
    order counts via one hashpart grouped count, LEFT join back to
    customers (zero-order customers kept, fill 0), then the histogram —
    a second bounded grouped count keyed by c_count."""
    from ...stages.graph import grouped_sum_parts

    cust = _read_parquet_clean(f"{sf_dir}/customer.parquet",
                               columns=["c_custkey"]).repartition(4)
    orders = _read_parquet_clean(f"{sf_dir}/orders.parquet",
                                 columns=["o_custkey"])
    per_cust = grouped_sum_parts(
        orders.map_batches(lambda b: pa.table({"c_custkey": b["o_custkey"]}),
                           batch_format="pyarrow"),
        ["c_custkey"], [], count_col="c_count", fanin=4)
    j = cust.join(per_cust, join_type="left_outer", num_partitions=4,
                  on=("c_custkey",))
    filled = j.map_batches(
        lambda b: pa.table({
            "c_count": pc.fill_null(pc.cast(b["c_count"], pa.int64()), 0)}),
        batch_format="pyarrow")
    return grouped_sum_parts(filled, ["c_count"], [], count_col="custdist",
                             fanin=4)


CUSTDIST_SQL = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
    SELECT c.c_custkey, CAST(count(o.o_custkey) AS BIGINT) AS c_count
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
)
GROUP BY c_count
"""


def q_sales_opportunity_nations(sf_dir: str):
    """TPC-H Q22 analog (global sales opportunity): customers with
    above-average positive account balance and no RECENT orders (none
    since 2001-01-01 — the corpus gives every customer at least one
    lifetime order, so the dormancy window carries the Q22 semantics),
    grouped by nation. The average is never materialized as a float: the filter is
    the exact integer cross-multiplication ``acctbal_cents * n_pos >
    sum_pos_cents`` (broadcast scalars), the no-orders side is the exact
    hash anti-join (`stages/joins.py:anti_join`), and the output carries
    exact cent sums."""
    from ...stages.graph import grouped_sum_parts
    from ...stages.joins import anti_join

    cust = _read_parquet_clean(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_acctbal"])

    def _cents(b: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": b["c_custkey"],
            "c_nationkey": pc.cast(b["c_nationkey"], pa.int64()),
            "bal_cents": pc.cast(pc.round(pc.multiply(
                b["c_acctbal"], 100.0), ndigits=0), pa.int64())})

    cc = cust.map_batches(_cents, batch_format="pyarrow")
    pos = cc.map_batches(
        lambda b: b.filter(pc.greater(b["bal_cents"], 0)),
        batch_format="pyarrow")
    # bounded scalar aggregate: (n_pos, sum_pos) — two driver ints
    n_pos = pos.count()
    sum_pos = pos.sum("bal_cents") or 0

    def _above(b: pa.Table) -> pa.Table:
        import numpy as _np

        bal = b["bal_cents"].to_numpy(zero_copy_only=False).astype(
            _np.int64)
        return b.filter(pa.array(bal * n_pos > sum_pos))

    rich = cc.map_batches(_above, batch_format="pyarrow")
    orders = _read_parquet_clean(f"{sf_dir}/orders.parquet",
                                 columns=["o_custkey", "o_orderdate"])

    def _recent(b: pa.Table) -> pa.Table:
        d = pc.cast(b["o_orderdate"], pa.date32())
        lo = pa.scalar(__import__("datetime").date(2001, 1, 1))
        t = pa.table({"c_custkey": b["o_custkey"], "__d": d})
        return t.filter(pc.greater_equal(t["__d"], lo)).drop_columns(
            ["__d"])

    no_orders = anti_join(rich,
                          orders.map_batches(_recent,
                                             batch_format="pyarrow"),
                          on="c_custkey", num_partitions=4)
    return grouped_sum_parts(no_orders.map_batches(
        lambda b: pa.table({"c_nationkey": b["c_nationkey"],
                            "bal_cents": b["bal_cents"]}),
        batch_format="pyarrow"),
        ["c_nationkey"], ["bal_cents"], count_col="numcust", fanin=4)


SALES_OPPORTUNITY_SQL = """
WITH c AS (
    SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey,
           CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
    FROM customer
),
s AS (
    SELECT CAST(count(*) AS BIGINT) AS n_pos,
           CAST(sum(bal_cents) AS BIGINT) AS sum_pos
    FROM c WHERE bal_cents > 0
)
SELECT c_nationkey,
       CAST(sum(bal_cents) AS BIGINT) AS bal_cents,
       CAST(count(*) AS BIGINT) AS numcust
FROM c, s
WHERE bal_cents * n_pos > sum_pos
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= DATE '2001-01-01')
GROUP BY c_nationkey
"""


def q_vocab_overlap_sources(sf_dir: str):
    """Vocabulary overlap between every source pair: exact |V_a inter
    V_b|, |V_a|, |V_b|, union and Jaccard over the sources' distinct
    token sets — the corpus-mixture redundancy signal. Shape: distinct
    (token, source) via one hash(token, source) shuffle
    (`dedup.distinct_pairs`), per-token source lists expand to (s1 < s2)
    pairs with the segment-pair gather (bounded by |sources|^2 per
    token), one hashpart pair sum; per-source sizes are a bounded
    broadcast joined in the final map. Jaccard is the one pinned float."""
    from ...arrow_utils import stable_part_codes
    from ...stages.dedup import distinct_pairs
    from ...stages.graph import grouped_sum_parts

    docs = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                               columns=["source", "text"]).repartition(4)

    def _toks(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b["text"], " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        n = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        src = b["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        idx = np.repeat(np.arange(b.num_rows), n)
        t = pa.table({"token": toks.values, "source": src.take(
            pa.array(idx))})
        t = t.filter(pc.not_equal(t["token"], ""))
        # in-block distinct before the shuffle
        return t.group_by(["token", "source"]).aggregate([])

    ts = distinct_pairs(docs.map_batches(_toks, batch_format="pyarrow"),
                        cols=("token", "source"), num_partitions=4)
    sizes = grouped_sum_parts(
        ts.map_batches(lambda b: pa.table({"source": b["source"]}),
                       batch_format="pyarrow"),
        ["source"], [], count_col="n", fanin=4).to_pandas()
    size_of = dict(zip(sizes["source"], sizes["n"].astype(int)))

    mod = 4 * 64

    _add_part = make_add_part("token", mod)

    def _pairs(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        empty = pa.table({"s1": pa.array([], pa.string()),
                          "s2": pa.array([], pa.string()),
                          "one": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        t = t.take(pc.sort_indices(t, sort_keys=[
            ("token", "ascending"), ("source", "ascending")]))
        tok = t["token"]
        if isinstance(tok, pa.ChunkedArray):
            tok = tok.combine_chunks()
        codes = group_codes(tok)
        src = t["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        from ...stages.dedup import _segmented_pairs

        i, j = _segmented_pairs(np.arange(len(codes)), codes, None)
        if len(i) == 0:
            return empty
        return pa.table({"s1": src.take(pa.array(i)),
                         "s2": src.take(pa.array(j)),
                         "one": pa.array(np.ones(len(i), np.int64))})

    inter = grouped_sum_parts(
        ts.map_batches(_add_part, batch_format="pyarrow")
          .repartition(4).groupby("__part")
          .map_groups(_pairs, batch_format="pyarrow"),
        ["s1", "s2"], ["one"], count_col=None, fanin=4)

    def _final(b: pa.Table) -> pa.Table:
        s1 = b["s1"].to_pylist()
        s2 = b["s2"].to_pylist()
        it = b["one"].to_numpy(zero_copy_only=False).astype(np.int64)
        na = np.array([size_of[s] for s in s1], np.int64)
        nb = np.array([size_of[s] for s in s2], np.int64)
        un = na + nb - it
        return pa.table({
            "s1": b["s1"], "s2": b["s2"],
            "n_inter": pa.array(it), "n_a": pa.array(na),
            "n_b": pa.array(nb), "n_union": pa.array(un),
            "jaccard": pa.array(it.astype(np.float64)
                                / un.astype(np.float64), pa.float64())})

    return inter.map_batches(_final, batch_format="pyarrow")


VOCAB_OVERLAP_SQL = """
WITH ts AS (
    SELECT DISTINCT source, unnest(string_split(text, ' ')) AS token
    FROM documents
),
ts_ AS (SELECT source, token FROM ts WHERE token <> ''),
sz AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM ts_ GROUP BY 1),
pr AS (
    SELECT a.source AS s1, b.source AS s2,
           CAST(count(*) AS BIGINT) AS n_inter
    FROM ts_ a JOIN ts_ b ON a.token = b.token AND a.source < b.source
    GROUP BY 1, 2
)
SELECT pr.s1, pr.s2, pr.n_inter, za.n AS n_a, zb.n AS n_b,
       za.n + zb.n - pr.n_inter AS n_union,
       CAST(pr.n_inter AS DOUBLE)
           / CAST(za.n + zb.n - pr.n_inter AS DOUBLE) AS jaccard
FROM pr JOIN sz za ON za.source = pr.s1 JOIN sz zb ON zb.source = pr.s2
"""


def q_ppr_docs(sf_dir: str):
    """Personalized PageRank (random walk with restart) from the seed set
    ``doc_id % 17 == 0`` over the deterministic doc link graph
    (``stages/graph.py:pagerank(seeds_ds=...)``): teleport mass lands
    only on seeds, init r = scale on seeds and 0 elsewhere, 5 integer
    fixed-point iterations; unreachable nodes report 0. Same join-based
    distributed shape as global PageRank — no rank-vector broadcast."""
    import numpy as np
    import pyarrow.parquet as _pq

    from ...stages.graph import pagerank

    n = _pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    nodes = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                                columns=["doc_id"]).repartition(4)

    def _edges(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy()
        ts = _graph_targets(d, n)
        src = np.concatenate([d.astype(np.int64)] * 3)
        dst = np.concatenate(ts)
        return pa.table({"src": pa.array(src), "dst": pa.array(dst)})

    edges = nodes.map_batches(_edges, batch_format="pyarrow")
    seeds = nodes.map_batches(
        lambda b: b.filter(pc.equal(
            pc.bit_wise_and(pa.array(
                b["doc_id"].to_numpy() % 17), 0xFFFF), 0)),
        batch_format="pyarrow")
    return pagerank(edges, nodes, node_col="doc_id", iters=5,
                    num_partitions=4, fanin=4, seeds_ds=seeds)


def _ppr_sql(iters: int = 5, scale: int = 10 ** 9, damp: int = 85,
             den: int = 100) -> str:
    tele = (den - damp) * scale // den
    parts = [f"""
WITH n AS (SELECT count(*) AS c FROM documents),
e AS (
    SELECT d.doc_id AS src,
           (d.doc_id*31 + 97*j.j) % (SELECT c FROM n) AS dst
    FROM documents d CROSS JOIN (VALUES (1), (2), (3)) AS j(j)),
deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
it0 AS (SELECT doc_id AS v, CAST({scale} AS BIGINT) AS r
        FROM documents WHERE doc_id % 17 = 0)"""]
    for k in range(1, iters + 1):
        parts.append(f""",
it{k} AS (
    SELECT d.doc_id AS v,
           (CASE WHEN d.doc_id % 17 = 0 THEN {tele} ELSE 0 END)
             + COALESCE(SUM(({damp} * r.r) // ({den} * g.outdeg)), 0) AS r
    FROM documents d
    LEFT JOIN e ON e.dst = d.doc_id
    LEFT JOIN it{k - 1} r ON r.v = e.src
    LEFT JOIN deg g ON g.src = e.src
    GROUP BY d.doc_id)""")
    parts.append(f"""
SELECT v AS doc_id, CAST(r AS BIGINT) AS pr_e9 FROM it{iters}""")
    return "".join(parts)


PPR_SQL = _ppr_sql()


def q_modularity_docs(sf_dir: str):
    """Newman modularity of the embedding-label partition over the
    undirected simple doc graph (Newman & Girvan, PRE 69:026113 (2004)):
    per community c, intra-edge count ``e_c`` and degree sum ``d_c``
    yield the EXACT per-community contribution numerator
    ``4*m*e_c - d_c^2`` over the common denominator ``4*m^2``; the float
    ``q_contrib`` is one pinned expression. Shape: distinct undirected
    edges via one hash shuffle, labels ride a broadcast closure (the
    bounded dimension contract, like label propagation), intra counts
    and degree sums reduce through hashpart grouped sums — community
    rows are bounded by |labels|."""
    import pyarrow.parquet as _pq

    from ...stages.dedup import distinct_pairs
    from ...stages.graph import grouped_sum_parts

    n = _pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    lab_rows = _read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                                   columns=["vec_id", "label"]).take_all()
    lab = {int(r["vec_id"]): int(r["label"]) for r in lab_rows}

    nodes = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                                columns=["doc_id"]).repartition(4)

    def _edges(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy().astype(np.int64)
        srcs, dsts = [], []
        for j in range(1, 7):
            keep = (d % 6) >= (j - 1)
            dd = d[keep]
            srcs.append(dd)
            dsts.append((dd * 31 + 97 * j) % n)
        src = np.concatenate(srcs)
        dst = np.concatenate(dsts)
        u = np.minimum(src, dst)
        v = np.maximum(src, dst)
        t = pa.table({"u": pa.array(u), "v": pa.array(v)})
        return t.filter(pc.invert(pc.equal(t["u"], t["v"])))

    und = distinct_pairs(nodes.map_batches(_edges, batch_format="pyarrow"),
                         cols=("u", "v"), num_partitions=4)
    m = und.count()

    def _intra(b: pa.Table) -> pa.Table:
        u = b["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        lu = np.array([lab[x] for x in u], np.int64)
        lv = np.array([lab[x] for x in v], np.int64)
        t = pa.table({"label": pa.array(lu)})
        return t.filter(pa.array(lu == lv))

    intra = grouped_sum_parts(
        und.map_batches(_intra, batch_format="pyarrow"),
        ["label"], [], count_col="n_intra", fanin=4)

    def _degs(b: pa.Table) -> pa.Table:
        u = b["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        ends = np.concatenate([u, v])
        return pa.table({"label": pa.array(
            np.array([lab[x] for x in ends], np.int64))})

    degs = grouped_sum_parts(
        und.map_batches(_degs, batch_format="pyarrow"),
        ["label"], [], count_col="deg_sum", fanin=4)
    j = degs.join(intra, join_type="left_outer", num_partitions=4,
                  on=("label",))

    def _final(b: pa.Table) -> pa.Table:
        e_c = pc.fill_null(pc.cast(b["n_intra"], pa.int64()), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        d_c = b["deg_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        contrib = 4 * m * e_c - d_c * d_c
        q = contrib.astype(np.float64) / float(4 * m * m)
        return pa.table({
            "label": b["label"],
            "n_intra": pa.array(e_c), "deg_sum": pa.array(d_c),
            "m": pa.array(np.full(len(e_c), m, np.int64)),
            "contrib_num": pa.array(contrib),
            "q_contrib": pa.array(q, pa.float64())})

    return j.map_batches(_final, batch_format="pyarrow")


MODULARITY_SQL = """
WITH nn AS (SELECT count(*) AS c FROM documents),
e0 AS (
    SELECT doc_id AS src,
           (doc_id * 31 + 97 * j) % (SELECT c FROM nn) AS dst
    FROM documents, unnest([1, 2, 3, 4, 5, 6]) t(j)
    WHERE j <= 1 + doc_id % 6
),
und AS MATERIALIZED (
    SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
    FROM e0 WHERE src <> dst
),
m_ AS (SELECT CAST(count(*) AS BIGINT) AS m FROM und),
intra AS (
    SELECT CAST(a.label AS BIGINT) AS label,
           CAST(count(*) AS BIGINT) AS n_intra
    FROM und JOIN embeddings a ON a.vec_id = und.u
             JOIN embeddings b ON b.vec_id = und.v
    WHERE a.label = b.label GROUP BY 1
),
ends AS (
    SELECT u AS node FROM und UNION ALL SELECT v FROM und
),
degs AS (
    SELECT CAST(l.label AS BIGINT) AS label,
           CAST(count(*) AS BIGINT) AS deg_sum
    FROM ends JOIN embeddings l ON l.vec_id = ends.node GROUP BY 1
)
SELECT d.label, coalesce(i.n_intra, 0) AS n_intra, d.deg_sum, m_.m,
       4 * m_.m * coalesce(i.n_intra, 0) - d.deg_sum * d.deg_sum
           AS contrib_num,
       CAST(4 * m_.m * coalesce(i.n_intra, 0)
            - d.deg_sum * d.deg_sum AS DOUBLE)
           / CAST(4 * m_.m * m_.m AS DOUBLE) AS q_contrib
FROM degs d CROSS JOIN m_ LEFT JOIN intra i ON i.label = d.label
"""


def q_dominant_period_1h(sf_dir: str):
    """Dominant seasonality period per series: the ACF lag (2..48 hours)
    with the maximum autocorrelation. The ACF stats are exact int64
    (``correlate.autocorrelation``); the argmax orders by
    ``floor(corr * 1e12)`` — corr is already ONE pinned IEEE expression
    on both sides, so its floored fixed-point image is bit-identical
    too — with smallest-lag tie-break. Output: (series_id, period_lag,
    corr_e12, n)."""
    from ...stages.correlate import autocorrelation
    from ...stages.rollup import rollup

    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    rolled = rollup(ev.map_batches(_series, batch_format="pyarrow"), W1H)
    acf = autocorrelation(rolled, lags=tuple(range(2, 49)),
                          window_us=W1H, num_partitions=2)

    def _argmax(b: pa.Table) -> pa.Table:
        import numpy as _np

        corr = b["corr"].to_numpy(zero_copy_only=False)
        ok = ~_np.isnan(corr)
        t = pa.table({
            "series_id": b["series_id"], "lag": b["lag"], "n": b["n"],
            "corr_e12": pa.array(
                _np.where(ok, _np.floor(
                    _np.nan_to_num(corr) * 1e12), 0).astype(_np.int64)),
        }).filter(pa.array(ok))
        t = t.take(pc.sort_indices(t, sort_keys=[
            ("series_id", "ascending"), ("corr_e12", "descending"),
            ("lag", "ascending")]))
        sid = t["series_id"]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = sid.dictionary_encode().indices.to_numpy(
            zero_copy_only=False).astype(_np.int64)
        heads = _np.ones(len(codes), dtype=bool)
        heads[1:] = codes[1:] != codes[:-1]
        seg = pa.array(_np.flatnonzero(heads))
        return pa.table({
            "series_id": sid.take(seg),
            "period_lag": t["lag"].take(seg),
            "corr_e12": t["corr_e12"].take(seg),
            "n": t["n"].take(seg)})

    # |series| x 47 rows total — one bounded block, documented
    return acf.repartition(1).map_batches(_argmax, batch_format="pyarrow")


DOMINANT_PERIOD_SQL = f"""
WITH e AS (
    SELECT event_type, epoch_us(ts) AS ts_us,
           CAST(round(value * 100) AS BIGINT) AS cents
    FROM events
),
r AS (
    SELECT event_type AS series_id,
           ts_us // {W1H} * {W1H} AS bucket,
           CAST(sum(cents) AS BIGINT) AS v
    FROM e GROUP BY series_id, bucket
),
p AS (
    SELECT a.series_id, l.lag, a.v AS x, b.v AS y
    FROM r a
    JOIN (SELECT unnest(range(2, 49)) AS lag) l ON true
    JOIN r b ON b.series_id = a.series_id
            AND b.bucket = a.bucket + CAST(l.lag AS BIGINT) * {W1H}
),
st AS (
    SELECT series_id, CAST(lag AS BIGINT) AS lag,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(x) AS BIGINT) AS sum_x,
           CAST(sum(y) AS BIGINT) AS sum_y,
           CAST(sum(x * y) AS BIGINT) AS sum_xy,
           CAST(sum(x * x) AS BIGINT) AS sum_xx,
           CAST(sum(y * y) AS BIGINT) AS sum_yy
    FROM p GROUP BY series_id, lag
),
c AS (
    SELECT series_id, lag, n,
           CASE WHEN (CAST(n AS DOUBLE) * CAST(sum_xx AS DOUBLE)
                      - CAST(sum_x AS DOUBLE) * CAST(sum_x AS DOUBLE))
                     * (CAST(n AS DOUBLE) * CAST(sum_yy AS DOUBLE)
                        - CAST(sum_y AS DOUBLE) * CAST(sum_y AS DOUBLE)) > 0
                THEN (CAST(n AS DOUBLE) * CAST(sum_xy AS DOUBLE)
                      - CAST(sum_x AS DOUBLE) * CAST(sum_y AS DOUBLE))
                     / sqrt((CAST(n AS DOUBLE) * CAST(sum_xx AS DOUBLE)
                             - CAST(sum_x AS DOUBLE) * CAST(sum_x AS DOUBLE))
                            * (CAST(n AS DOUBLE) * CAST(sum_yy AS DOUBLE)
                               - CAST(sum_y AS DOUBLE)
                                 * CAST(sum_y AS DOUBLE)))
                ELSE NULL
           END AS corr
    FROM st
),
f AS (
    SELECT series_id, lag, n,
           CAST(floor(corr * 1e12) AS BIGINT) AS corr_e12,
           row_number() OVER (PARTITION BY series_id
                              ORDER BY CAST(floor(corr * 1e12) AS BIGINT)
                                       DESC, lag) AS rk
    FROM c WHERE corr IS NOT NULL
)
SELECT series_id, lag AS period_lag, corr_e12, n FROM f WHERE rk = 1
"""


def q_quantized_knn_recall(sf_dir: str):
    """Embedding-quantization recall audit: int8 quantization
    (``clamp(trunc(v*127), -127, 127)`` — the symmetric-scale int8 used
    for memory-bound ANN serving) versus the exact e6 baseline
    (``trunc(v*1e6)``, the engine's standard integer-dot convention).
    For each of 10 query vectors (vec_id 0..9), both metrics rank all
    other vectors by integer dot product ((dot DESC, vec_id ASC) total
    order) and the audit reports the top-10 overlap + whether the top-1
    agrees. Shape: the 10 query vectors broadcast as a closure matrix;
    each batch computes BOTH dot sets in two (batch x dim) @ (dim x 10)
    matmuls and emits only its per-(query, metric) top-10 partials
    (<= 200 rows per block); the bounded final merge re-sorts and
    intersects."""
    import pyarrow.parquet as _pq

    from ...stages.similarity import embedding_matrix

    t = _pq.read_table(f"{sf_dir}/embeddings.parquet",
                       columns=["vec_id", "embedding"])
    qmask = pc.less(t["vec_id"], 10)
    qt = t.filter(qmask)
    order = pc.sort_indices(qt, sort_keys=[("vec_id", "ascending")])
    qt = qt.take(order)
    Qf = np.array(qt["embedding"].to_pylist(), dtype=np.float64)
    Q8 = np.clip(np.trunc(Qf * 127), -127, 127).astype(np.int64)
    Qe6 = np.trunc(Qf * 1e6).astype(np.int64)
    qids = qt["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)

    ds = _read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding"])
    ds = ds.filter(expr="vec_id >= 10")

    def _partial(b: pa.Table) -> pa.Table:
        E = embedding_matrix(b, "embedding").astype(np.float64)
        V8 = np.clip(np.trunc(E * 127), -127, 127).astype(np.int64)
        Ve6 = np.trunc(E * 1e6).astype(np.int64)
        vid = b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        out = {"query_id": [], "metric": [], "vec_id": [], "dot": []}
        for mname, V, Qm in (("int8", V8, Q8), ("e6", Ve6, Qe6)):
            D = V @ Qm.T  # (n, 10) exact int64
            for c in range(D.shape[1]):
                d = D[:, c]
                k = min(10, len(d))
                # top-k by (dot DESC, vec_id ASC)
                idx = np.lexsort((vid, -d))[:k]
                out["query_id"].extend([int(qids[c])] * k)
                out["metric"].extend([mname] * k)
                out["vec_id"].extend(vid[idx].tolist())
                out["dot"].extend(d[idx].tolist())
        return pa.table({
            "query_id": pa.array(out["query_id"], pa.int64()),
            "metric": pa.array(out["metric"]),
            "vec_id": pa.array(out["vec_id"], pa.int64()),
            "dot": pa.array(out["dot"], pa.int64())})

    def _final(b: pa.Table) -> pa.Table:
        qid = b["query_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        met = np.asarray(b["metric"].to_pylist())
        vid = b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        dot = b["dot"].to_numpy(zero_copy_only=False).astype(np.int64)
        rows = {"query_id": [], "n_overlap": [], "top1_match": []}
        for q in sorted(set(qid.tolist())):
            tops = {}
            for mname in ("int8", "e6"):
                sel = (qid == q) & (met == mname)
                idx = np.lexsort((vid[sel], -dot[sel]))[:10]
                tops[mname] = vid[sel][idx]
            rows["query_id"].append(q)
            rows["n_overlap"].append(
                len(set(tops["int8"]) & set(tops["e6"])))
            rows["top1_match"].append(
                int(tops["int8"][0] == tops["e6"][0]))
        return pa.table({
            "query_id": pa.array(rows["query_id"], pa.int64()),
            "n_overlap": pa.array(rows["n_overlap"], pa.int64()),
            "top1_match": pa.array(rows["top1_match"], pa.int64())})

    return ds.map_batches(_partial, batch_format="pyarrow").repartition(
        1).map_batches(_final, batch_format="pyarrow")


QUANTIZED_KNN_SQL = """
WITH q AS (
    SELECT vec_id AS qid,
           list_transform(embedding, x ->
               greatest(-127, least(127, CAST(trunc(x * 127) AS BIGINT))))
               AS v8,
           list_transform(embedding,
               x -> CAST(trunc(x * 1000000) AS BIGINT)) AS ve6
    FROM embeddings WHERE vec_id < 10
),
c AS (
    SELECT vec_id,
           list_transform(embedding, x ->
               greatest(-127, least(127, CAST(trunc(x * 127) AS BIGINT))))
               AS v8,
           list_transform(embedding,
               x -> CAST(trunc(x * 1000000) AS BIGINT)) AS ve6
    FROM embeddings WHERE vec_id >= 10
),
d AS (
    SELECT q.qid, c.vec_id,
           list_dot_product(q.v8, c.v8) AS d8,
           list_dot_product(q.ve6, c.ve6) AS d6
    FROM q CROSS JOIN c
),
r AS (
    SELECT qid, vec_id,
           row_number() OVER (PARTITION BY qid ORDER BY d8 DESC, vec_id)
               AS r8,
           row_number() OVER (PARTITION BY qid ORDER BY d6 DESC, vec_id)
               AS r6
    FROM d
)
SELECT qid AS query_id,
       CAST(count(*) FILTER (WHERE r8 <= 10 AND r6 <= 10) AS BIGINT)
           AS n_overlap,
       CAST(max(CASE WHEN r8 = 1 AND r6 = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS top1_match
FROM r GROUP BY qid
"""


def q_profit_by_nation_year(sf_dir: str):
    """TPC-H Q9 analog (product-type profit by nation and year; the
    corpus has no partsupp, so profit = revenue =
    ``l_extendedprice * (1 - l_discount)`` in exact e4 cents): lineitems
    whose part name contains 'widget', joined part -> supplier ->
    nation -> orders through four hash joins (dimension sides reduce
    map-side to the join keys), rolled up per (nation, order year) via
    one hashpart grouped sum. Revenue arithmetic is exact int64:
    ``price_cents * (10000 - disc_e4)`` summed, one pinned float
    division at the end."""
    from ...stages.graph import grouped_sum_parts

    li = _read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_orderkey",
                 "l_extendedprice", "l_discount"])
    part = _read_parquet_clean(f"{sf_dir}/part.parquet",
                               columns=["p_partkey", "p_name"])
    widget = part.map_batches(
        lambda b: pa.table({"p_partkey": b["p_partkey"]}).filter(
            pc.match_substring(b["p_name"], "widget")),
        batch_format="pyarrow")
    supp = _read_parquet_clean(f"{sf_dir}/supplier.parquet",
                               columns=["s_suppkey", "s_nationkey"])
    nation = _read_parquet_clean(f"{sf_dir}/nation.parquet",
                                 columns=["n_nationkey", "n_name"])
    orders = _read_parquet_clean(f"{sf_dir}/orders.parquet",
                                 columns=["o_orderkey", "o_orderdate"])

    def _rev(b: pa.Table) -> pa.Table:
        price = pc.cast(pc.round(pc.multiply(
            b["l_extendedprice"], 100.0), ndigits=0), pa.int64())
        disc = pc.cast(pc.round(pc.multiply(
            b["l_discount"], 10000.0), ndigits=0), pa.int64())
        import numpy as _np

        p = price.to_numpy(zero_copy_only=False).astype(_np.int64)
        d = disc.to_numpy(zero_copy_only=False).astype(_np.int64)
        return pa.table({
            "l_partkey": b["l_partkey"], "l_suppkey": b["l_suppkey"],
            "l_orderkey": b["l_orderkey"],
            "rev_e4": pa.array(p * (10000 - d))})

    j = li.map_batches(_rev, batch_format="pyarrow")
    j = j.join(widget, join_type="inner", num_partitions=4,
               on=("l_partkey",), right_on=("p_partkey",))
    j = j.join(supp, join_type="inner", num_partitions=4,
               on=("l_suppkey",), right_on=("s_suppkey",))
    j = j.join(orders, join_type="inner", num_partitions=4,
               on=("l_orderkey",), right_on=("o_orderkey",))

    def _ny(b: pa.Table) -> pa.Table:
        yr = pc.year(pc.cast(b["o_orderdate"], pa.timestamp("us")))
        return pa.table({"s_nationkey": pc.cast(b["s_nationkey"],
                                                pa.int64()),
                         "o_year": pc.cast(yr, pa.int64()),
                         "rev_e4": b["rev_e4"]})

    agg = grouped_sum_parts(j.map_batches(_ny, batch_format="pyarrow"),
                            ["s_nationkey", "o_year"], ["rev_e4"],
                            count_col="n_items", fanin=4)
    named = agg.join(
        nation.map_batches(lambda b: pa.table({
            "s_nationkey": pc.cast(b["n_nationkey"], pa.int64()),
            "nation": b["n_name"]}), batch_format="pyarrow"),
        join_type="inner", num_partitions=4, on=("s_nationkey",))

    def _fin(b: pa.Table) -> pa.Table:
        import numpy as _np

        r = b["rev_e4"].to_numpy(zero_copy_only=False).astype(_np.int64)
        return pa.table({
            "nation": b["nation"], "o_year": b["o_year"],
            "rev_e4": b["rev_e4"], "n_items": b["n_items"],
            "profit": pa.array(r.astype(_np.float64) / 1e6, pa.float64())})

    return named.map_batches(_fin, batch_format="pyarrow")


PROFIT_SQL = """
WITH j AS (
    SELECT s.s_nationkey,
           CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           CAST(round(l.l_extendedprice * 100) AS BIGINT)
             * (10000 - CAST(round(l.l_discount * 10000) AS BIGINT))
             AS rev_e4
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%widget%'
),
agg AS (
    SELECT s_nationkey, o_year, CAST(sum(rev_e4) AS BIGINT) AS rev_e4,
           CAST(count(*) AS BIGINT) AS n_items
    FROM j GROUP BY 1, 2
)
SELECT n.n_name AS nation, a.o_year, a.rev_e4, a.n_items,
       CAST(a.rev_e4 AS DOUBLE) / 1000000 AS profit
FROM agg a JOIN nation n ON n.n_nationkey = a.s_nationkey
"""


def q_join_size_profile(sf_dir: str):
    """Join-cardinality profile of orders x lineitem on orderkey — the
    planner-calibration audit: exact join row count WITHOUT running the
    join (sum over keys of count products), plus key-overlap counts and
    the hottest key's contribution. Two hashpart per-key counts meet in
    ONE count-table join (|keys| rows, never the payload); all outputs
    exact int64."""
    from ...stages.graph import grouped_sum_parts

    o = grouped_sum_parts(
        _read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_orderkey"]).map_batches(
            lambda b: pa.table({"k": b["o_orderkey"]}),
            batch_format="pyarrow"),
        ["k"], [], count_col="n_o", fanin=4)
    li = grouped_sum_parts(
        _read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey"]).map_batches(
            lambda b: pa.table({"k": b["l_orderkey"]}),
            batch_format="pyarrow"),
        ["k"], [], count_col="n_l", fanin=4)
    j = o.join(li, join_type="inner", num_partitions=4, on=("k",))

    def _partial(b: pa.Table) -> pa.Table:
        import numpy as _np

        a = b["n_o"].to_numpy(zero_copy_only=False).astype(_np.int64)
        c = b["n_l"].to_numpy(zero_copy_only=False).astype(_np.int64)
        prod = a * c
        return pa.table({
            "n_keys_both": pa.array([_np.int64(len(a))]),
            "join_rows": pa.array([prod.sum()]),
            "max_key_rows": pa.array([prod.max() if len(prod) else
                                      _np.int64(0)])})

    def _merge(b: pa.Table) -> pa.Table:
        import numpy as _np

        def s(c):
            return b[c].to_numpy(zero_copy_only=False).astype(
                _np.int64)

        return pa.table({
            "n_keys_both": pa.array([s("n_keys_both").sum()]),
            "join_rows": pa.array([s("join_rows").sum()]),
            "max_key_rows": pa.array([s("max_key_rows").max()])})

    return j.map_batches(_partial, batch_format="pyarrow").repartition(
        1).map_batches(_merge, batch_format="pyarrow")


JOIN_SIZE_SQL = """
WITH o AS (SELECT o_orderkey AS k, CAST(count(*) AS BIGINT) AS n_o
           FROM orders GROUP BY 1),
l AS (SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS n_l
      FROM lineitem GROUP BY 1),
j AS (SELECT o.n_o * l.n_l AS prod FROM o JOIN l USING (k))
SELECT CAST(count(*) AS BIGINT) AS n_keys_both,
       CAST(sum(prod) AS BIGINT) AS join_rows,
       CAST(max(prod) AS BIGINT) AS max_key_rows
FROM j
"""


# (case_id, n_out) pairs for the LOD router — picked so the rule lands on
# DIFFERENT tiers over the 30-day corpus (1h for 100, 1d for 20/4)
_LOD_ROUTE_CASES = ((1, 100), (2, 20), (3, 4))


def q_lod_route_events(sf_dir: str):
    """The interactive-zoom READ path end-to-end (the Grafana router):
    given (time range, n_out), choose the COARSEST retention tier whose
    bucket estimate still covers n_out points —

        w = first w in (1d, 1h, 15m) with range_us // w + 1 >= n_out

    — build that tier with the standard rollup, and MinMax-downsample
    each series' tier values to n_out (no-x binning over bucket order,
    ties -> first, the reference kernel semantics). The range scalars are
    TWO bounded driver aggregates; everything else streams. Output:
    (case_id, series_id, bucket, v) — the points a plot would draw."""
    from ...stages.downsample import downsample_table
    from ...stages.rollup import rollup

    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    src = ev.map_batches(_series, batch_format="pyarrow")
    lo = src.min("x")
    hi = src.max("x")
    rng = int(hi) - int(lo)

    out = None
    for case_id, n_out in _LOD_ROUTE_CASES:
        w = next((wu for wu in (W1D, W1H, W15M)
                  if rng // wu + 1 >= n_out), W15M)
        tier = rollup(src, w)

        def _ds_group(tbl: pa.Table, _n=n_out) -> pa.Table:
            t = tbl.take(pc.sort_indices(tbl, sort_keys=[
                ("bucket", "ascending")]))
            t2 = pa.table({"series_id": t["series_id"],
                           "bucket": t["bucket"], "v": t["sum_y"]})
            return downsample_table(t2, "minmax", _n, x_col=None,
                                    y_col="v")

        sel = tier.groupby("series_id").map_groups(
            _ds_group, batch_format="pyarrow")

        def _tag(b: pa.Table, _c=case_id) -> pa.Table:
            return pa.table({
                "case_id": pa.array(np.full(b.num_rows, _c, np.int64)),
                "series_id": b["series_id"], "bucket": b["bucket"],
                "v": b["v"]})

        tagged = sel.map_batches(_tag, batch_format="pyarrow")
        out = tagged if out is None else out.union(tagged)
    return out


def _lod_route_case_sql(case_id: int, n_out: int) -> str:
    bins = n_out // 2
    return f"""
SELECT CAST({case_id} AS BIGINT) AS case_id, series_id, bucket, v
FROM (
    WITH rng AS (
        SELECT max(epoch_us(ts)) - min(epoch_us(ts)) AS r FROM events
    ),
    w_ AS (
        SELECT CASE WHEN r // {W1D} + 1 >= {n_out} THEN {W1D}
                    WHEN r // {W1H} + 1 >= {n_out} THEN {W1H}
                    ELSE {W15M} END AS w
        FROM rng
    ),
    r AS MATERIALIZED (
        SELECT event_type AS series_id,
               epoch_us(ts) // (SELECT w FROM w_) * (SELECT w FROM w_)
                   AS bucket,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS v
        FROM events GROUP BY 1, 2
    ),
    s AS MATERIALIZED (
        SELECT series_id, bucket, v,
               row_number() OVER (PARTITION BY series_id
                                  ORDER BY bucket) - 1 AS rn,
               count(*) OVER (PARTITION BY series_id) AS cnt
        FROM r
    ),
    binned AS MATERIALIZED (
        SELECT s.*, b.i,
               CASE WHEN b.i = 0 THEN 0
                    ELSE CAST(FLOOR(b.i * ((s.cnt - 1.0) / {bins}))
                              AS BIGINT) + 1 END AS lo,
               CASE WHEN b.i = {bins - 1} THEN s.cnt
                    ELSE CAST(FLOOR((b.i + 1) * ((s.cnt - 1.0) / {bins}))
                              AS BIGINT) + 1 END AS hi
        FROM s JOIN generate_series(0, {bins - 1}) b(i) ON TRUE
    ),
    inbin AS MATERIALIZED (SELECT * FROM binned
                           WHERE rn >= lo AND rn < hi AND cnt > {n_out}),
    ext AS MATERIALIZED (
        SELECT series_id, i, min(v) AS mn, max(v) AS mx
        FROM inbin GROUP BY 1, 2
    ),
    sel AS (
        SELECT ib.series_id,
               min(ib.rn) FILTER (WHERE ib.v = e.mn) AS rn_min,
               min(ib.rn) FILTER (WHERE ib.v = e.mx) AS rn_max
        FROM inbin ib JOIN ext e
          ON e.series_id = ib.series_id AND e.i = ib.i
        GROUP BY ib.series_id, ib.i
    ),
    keep AS (
        SELECT series_id, rn_min AS rn FROM sel
        UNION
        SELECT series_id, rn_max FROM sel
        UNION ALL
        SELECT series_id, rn FROM s WHERE cnt <= {n_out}
    )
    SELECT s.series_id, s.bucket, s.v
    FROM s JOIN keep k ON k.series_id = s.series_id AND k.rn = s.rn
) q
"""


LOD_ROUTE_SQL = " UNION ALL ".join(
    _lod_route_case_sql(c, n) for c, n in _LOD_ROUTE_CASES)


def q_ed2_pairs_docs(sf_dir: str):
    """Edit-distance-<=2 similarity join (``stages/strsim.py:ed2_pairs``)
    — spelling-correction candidate generation: FastSS depth-2 deletion
    neighborhoods (1 + L + C(L,2) variant keys per vocabulary term), one
    hash(variant) shuffle, in-bucket exact-DP verify reporting the exact
    distance, hash-partitioned pair distinct. Runs on the corpus
    vocabulary (distinct tokens), never corpus rows."""
    from ...stages.strsim import ed2_pairs

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["text"])

    def _toks(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b["text"], pattern=" ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.values
        flat = flat.filter(pc.not_equal(flat, ""))
        return pa.table({"token": pc.unique(flat)})

    # per-batch unique is enough: ed2_pairs' buckets set-dedup terms and
    # its distinct tail dedups pairs found via multiple shared variants
    vocab = ds.map_batches(_toks, batch_format="pyarrow")
    return ed2_pairs(vocab, num_partitions=4)


ED2_PAIRS_SQL = """
WITH v AS (
    SELECT DISTINCT t.term AS tok
    FROM documents, unnest(string_split(text, ' ')) AS t(term)
    WHERE t.term <> ''
)
SELECT a.tok AS a, b.tok AS b,
       CAST(levenshtein(a.tok, b.tok) AS BIGINT) AS dist
FROM v a JOIN v b ON a.tok < b.tok
WHERE levenshtein(a.tok, b.tok) BETWEEN 1 AND 2
"""


def _cdc_sql_core(src: str = "SELECT doc_id, text FROM documents") -> str:
    """The CDC chunk replay parameterized over the source relation.
    ``unicode``/``substring``/``length`` are all CODEPOINT-based in
    DuckDB — the exact unit the engine chunker hashes and cuts on
    (``stages/packing.py:cdc_chunk_batch``), so the replay is corpus-
    general, not ASCII-only."""
    return f"""
corpus AS MATERIALIZED ({src}),
pos AS (
    SELECT doc_id, text, length(text) AS n,
           CAST(t.p AS BIGINT) AS p
    FROM corpus, unnest(range(
        1, greatest(length(text) - 7, 0) + 1)) t(p)
),
hw AS (
    SELECT doc_id, text, n, p,
           list_reduce(list_prepend(0::HUGEINT,
               list_transform(range(0, 8),
                   k -> unicode(substring(text, CAST(p + k AS INT),
                                          1))::HUGEINT)),
               (h, c) -> (h * 1000003 + c) % 2305843009213693951) AS hv
    FROM pos
),
allcuts AS (
    SELECT DISTINCT doc_id, p + 7 AS cut FROM hw WHERE hv % 64 = 0
    UNION
    SELECT doc_id, length(text) FROM corpus WHERE length(text) > 0
),
seg AS (
    SELECT a.doc_id,
           coalesce(lag(a.cut) OVER (PARTITION BY a.doc_id
                                     ORDER BY a.cut), 0) AS s,
           a.cut AS e
    FROM allcuts a
),
chunks AS (
    SELECT seg.doc_id,
           row_number() OVER (PARTITION BY seg.doc_id
                              ORDER BY seg.s) - 1 AS chunk_id,
           substring(d.text, CAST(seg.s + 1 AS INT),
                     CAST(seg.e - seg.s AS INT)) AS chunk,
           seg.e - seg.s AS chunk_len
    FROM seg JOIN corpus d ON d.doc_id = seg.doc_id
)
"""


_CDC_SQL_CORE = _cdc_sql_core()


def _cdc_chunk_stats(chunks):
    """(doc_id, n_chunks, min/max/total chunk length) from a chunk
    stream. Chunk rows of one doc stay in the producing block (map
    stage), so the per-doc aggregate needs no shuffle at all."""
    from ...arrow_utils import rename_agg

    def _stats(b: pa.Table) -> pa.Table:
        g = b.group_by(["doc_id"]).aggregate(
            [("chunk_len", "count"), ("chunk_len", "min"),
             ("chunk_len", "max"), ("chunk_len", "sum")])
        return rename_agg(g, {
            "doc_id": "doc_id", "chunk_len_count": "n_chunks",
            "chunk_len_min": "min_len", "chunk_len_max": "max_len",
            "chunk_len_sum": "total_len"})

    def _cast(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b["doc_id"],
            "n_chunks": pc.cast(b["n_chunks"], pa.int64()),
            "min_len": b["min_len"], "max_len": b["max_len"],
            "total_len": b["total_len"]})

    return chunks.map_batches(_stats, batch_format="pyarrow").map_batches(
        _cast, batch_format="pyarrow")


def q_cdc_chunk_docs(sf_dir: str):
    """Content-defined chunking stats per document
    (``stages/packing.py:cdc_chunk_batch`` — rsync/FastCDC boundaries
    from the engine's Horner-mod-2^61-1 window hash): (doc_id, n_chunks,
    min/max/total chunk length). Pure map stage + in-block aggregate —
    no shuffle touches chunk text here."""
    from ...stages.packing import cdc_chunk_batch

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"])
    return _cdc_chunk_stats(
        ds.map_batches(cdc_chunk_batch, batch_format="pyarrow"))


def q_cdc_chunk_docs_utf8(sf_dir: str):
    """CDC chunking over a NON-ASCII corpus (r4 verdict next-round #7):
    every 'e' becomes 'é' (a 2-byte UTF-8 codepoint, so byte and
    codepoint positions diverge on ~every doc), then the same
    codepoint-based chunker runs. Boundaries are codepoint positions —
    all chunks are valid strings and the DuckDB replay (codepoint
    ``unicode``/``substring``/``length``) is exact."""
    from ...stages.packing import cdc_chunk_batch

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"])

    def _accent(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b["doc_id"],
            "text": pc.replace_substring(b["text"], "e", "é"),
        })

    accented = ds.map_batches(_accent, batch_format="pyarrow")
    return _cdc_chunk_stats(
        accented.map_batches(cdc_chunk_batch, batch_format="pyarrow"))


_CDC_STATS_SELECT = """
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(min(chunk_len) AS BIGINT) AS min_len,
       CAST(max(chunk_len) AS BIGINT) AS max_len,
       CAST(sum(chunk_len) AS BIGINT) AS total_len
FROM chunks GROUP BY doc_id
"""

CDC_CHUNK_SQL = f"WITH {_CDC_SQL_CORE} {_CDC_STATS_SELECT}"

CDC_CHUNK_UTF8_SQL = "WITH " + _cdc_sql_core(
    "SELECT doc_id, replace(text, 'e', 'é') AS text FROM documents"
) + _CDC_STATS_SELECT


def q_cdc_dedup_corpus(sf_dir: str):
    """Corpus-level chunk dedup ratio over the content-defined chunks:
    total chunks vs distinct chunk TEXTS (one hash(chunk) distinct
    exchange — the block-level dedup storage win CDC exists to expose).
    ONE row: (total_chunks, distinct_chunks, total_bytes,
    distinct_bytes, dedup_ratio)."""
    from ...stages.dedup import distinct_pairs
    from ...stages.packing import cdc_chunk_batch

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"])
    chunks = ds.map_batches(cdc_chunk_batch, batch_format="pyarrow")
    total = chunks.count()
    tot_bytes = chunks.sum("chunk_len") or 0
    dchunks = distinct_pairs(
        chunks.map_batches(lambda b: pa.table({"chunk": b["chunk"],
                                               "chunk_len":
                                               b["chunk_len"]}),
                           batch_format="pyarrow"),
        cols=("chunk", "chunk_len"), num_partitions=4)
    distinct = dchunks.count()
    dis_bytes = dchunks.sum("chunk_len") or 0
    import pandas as pd

    return pd.DataFrame({
        "total_chunks": [total], "distinct_chunks": [distinct],
        "total_bytes": [int(tot_bytes)], "distinct_bytes": [int(dis_bytes)],
        "dedup_ratio": [float(distinct) / total if total else None]})


CDC_DEDUP_SQL = f"""
WITH {_CDC_SQL_CORE}
SELECT CAST(count(*) AS BIGINT) AS total_chunks,
       CAST(count(DISTINCT chunk) AS BIGINT) AS distinct_chunks,
       CAST(sum(chunk_len) AS BIGINT) AS total_bytes,
       CAST((SELECT sum(l) FROM (SELECT DISTINCT chunk, chunk_len AS l
                                 FROM chunks)) AS BIGINT)
           AS distinct_bytes,
       CAST(count(DISTINCT chunk) AS DOUBLE) / count(*) AS dedup_ratio
FROM chunks
"""


