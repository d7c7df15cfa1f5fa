"""Changepoint/smoothing/robust series ops plus postings, normalization, canonical URLs, BPE, winsorize, upsert.

Split from the former pipelines/queries.py monolith (r4 verdict
next-round #5); statement order inside this module is the original
file order. Explicit cross-module imports are generated: backward
dependencies at the top, forward (function-body-only) dependencies at
the bottom so package import order stays acyclic.
"""
from __future__ import annotations

from ._shared import US, _read_parquet_clean, pa, pc
from .downsample_core import _events_cents

def q_cusum_events(sf_dir: str):
    """Two-sided CUSUM changepoint statistic per event_type series
    (``stages/rate.py:cusum``): target 50.00, slack 2.00, alarm threshold
    200.00, all in integer cents. The recursion collapses to cumsum +
    running-min (one vectorized pass per partition, ONE hash(series)
    shuffle); the SQL oracle replays it with two window passes."""
    from ...stages.rate import cusum

    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"], "event_id": b["event_id"]})

    ds = ev.map_batches(_series, batch_format="pyarrow")
    return cusum(ds, target=5000, slack=200, h=20000,
                 tiebreak_col="event_id", num_partitions=2)


CUSUM_SQL = """
WITH e AS (
    SELECT event_type AS series_id, event_id, epoch_us(ts) AS ts_us,
           CAST(round(value * 100) AS BIGINT) AS cents
    FROM events
),
c AS (
    SELECT series_id, event_id, ts_us AS x, cents AS y,
           sum(cents - 5000 - 200) OVER w AS cp,
           sum(5000 - cents - 200) OVER w AS cn
    FROM e
    WINDOW w AS (PARTITION BY series_id ORDER BY ts_us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
s AS (
    SELECT series_id, x, y,
           cp - LEAST(0, MIN(cp) OVER w2) AS s_pos,
           cn - LEAST(0, MIN(cn) OVER w2) AS s_neg
    FROM c
    WINDOW w2 AS (PARTITION BY series_id ORDER BY x, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT series_id, x, y,
       CAST(s_pos AS BIGINT) AS s_pos, CAST(s_neg AS BIGINT) AS s_neg,
       CAST(CASE WHEN s_pos > 20000 AND s_neg > 20000 THEN 2
            WHEN s_pos > 20000 THEN 1
            WHEN s_neg > 20000 THEN -1 ELSE 0 END AS BIGINT) AS alarm
FROM s
"""


def q_postings_docs(sf_dir: str):
    """Inverted-index build (``stages/postings.py:build_postings``): per
    corpus token its document frequency, total term count, and the
    comma-joined posting list of ascending doc ids — map-side (doc,
    token, tf) partials, ONE hash(token) shuffle, one sort + segment
    reduction + binary_join per partition."""
    from ...stages.postings import build_postings

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"]).repartition(8)
    return build_postings(ds, num_partitions=8)


POSTINGS_SQL = """
WITH w AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS token
    FROM documents
),
f AS (SELECT doc_id, token FROM w WHERE token <> ''),
p AS (SELECT token, doc_id, count(*) AS tf FROM f GROUP BY token, doc_id)
SELECT token, CAST(count(*) AS BIGINT) AS df,
       CAST(sum(tf) AS BIGINT) AS tf_total,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS posting
FROM p GROUP BY token
"""


def q_lag_corr_15m(sf_dir: str):
    """Lead/lag cross-correlation at one 15m-bucket lag
    (``stages/correlate.py:lagged_correlation``): every ORDERED
    event_type pair's Pearson corr of (s1 at t, s2 at t+15m) — y side
    re-keyed map-side, ONE hash(bucket) shuffle, vectorized per-bucket
    cross-pair expansion, int64 sufficient stats, pinned-IEEE corr."""
    from ...stages.correlate import lagged_correlation
    from ...stages.rollup import rollup

    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    rolled = rollup(ev.map_batches(_series, batch_format="pyarrow"),
                    900 * US)
    return lagged_correlation(rolled, lag=1, bucket_step=900 * US,
                              num_partitions=2)


LAG_CORR_SQL = """
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
      ON b.bucket = a.bucket + 900000000
     AND a.event_type <> b.event_type
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
       END AS corr,
       CAST(1 AS BIGINT) AS lag
FROM st
"""


def q_normalize_docs(sf_dir: str):
    """Unicode text normalization (``stages/textstats.py:
    normalize_text_batch``): NFC -> lower -> whitespace collapse -> trim,
    every step an Arrow kernel. The corpus text is ASCII by construction,
    so each doc is decorated with combining-accent + mixed-case + tab
    noise (same expression in the SQL oracle) to exercise the NFC and
    case paths; the normalized TEXT itself is hash-verified."""
    from ...stages.textstats import normalize_text_batch

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"]).repartition(8)

    def _decorate(b: pa.Table) -> pa.Table:
        deco = pc.binary_join_element_wise(
            "Cafe\u0301 \t ", b["text"], "  E\u0301VIAN", "")
        return pa.table({"doc_id": b["doc_id"], "text": deco})

    return ds.map_batches(_decorate, batch_format="pyarrow").map_batches(
        normalize_text_batch, batch_format="pyarrow")


NORMALIZE_SQL = """
WITH d AS (
    SELECT doc_id,
           'Cafe' || chr(769) || ' ' || chr(9) || ' ' || text
           || '  E' || chr(769) || 'VIAN' AS text
    FROM documents
),
n AS (
    SELECT doc_id, text,
           trim(regexp_replace(lower(nfc_normalize(text)),
                               '\\s+', ' ', 'g')) AS norm_text
    FROM d
)
SELECT doc_id, norm_text,
       CAST(length(text) AS BIGINT) AS n_chars_raw,
       CAST(length(norm_text) AS BIGINT) AS n_chars_norm
FROM n
"""


def q_mad_outliers_15m(sf_dir: str):
    """Robust per-series outlier flags over the 15m tier
    (``stages/quantiles.py:mad_outliers``): exact integer medians kept as
    2x sums, deviation median, flag |v - med| > 3 * 1.4826 * MAD with the
    consistency constant as the 14826/10000 integer ratio — no floats,
    ONE hash(series) shuffle, two in-partition segment-gather passes."""
    from ...stages.quantiles import mad_outliers
    from ...stages.rollup import rollup

    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    rolled = rollup(ev.map_batches(_series, batch_format="pyarrow"),
                    900 * US)
    return mad_outliers(rolled, num_partitions=2)


MAD_OUTLIERS_SQL = """
WITH e AS (
    SELECT event_type, epoch_us(ts) AS ts_us,
           CAST(round(value * 100) AS BIGINT) AS cents
    FROM events
),
r AS (
    SELECT event_type AS series_id,
           ts_us // 900000000 * 900000000 AS bucket,
           CAST(sum(cents) AS BIGINT) AS v
    FROM e GROUP BY series_id, bucket
),
o AS (
    SELECT series_id, bucket, v,
           row_number() OVER (PARTITION BY series_id
                              ORDER BY v, bucket) AS rn,
           count(*) OVER (PARTITION BY series_id) AS n
    FROM r
),
m AS (
    SELECT series_id,
           sum(CASE WHEN rn = (n - 1) // 2 + 1 THEN v ELSE 0 END)
         + sum(CASE WHEN rn = n // 2 + 1 THEN v ELSE 0 END) AS m2
    FROM o GROUP BY series_id
),
d AS (
    SELECT o.series_id, o.bucket, o.v, m.m2,
           abs(2 * o.v - m.m2) AS dev
    FROM o JOIN m USING (series_id)
),
o2 AS (
    SELECT *, row_number() OVER (PARTITION BY series_id
                                 ORDER BY dev) AS rn2,
           count(*) OVER (PARTITION BY series_id) AS n2
    FROM d
),
md AS (
    SELECT series_id,
           sum(CASE WHEN rn2 = (n2 - 1) // 2 + 1 THEN dev ELSE 0 END)
         + sum(CASE WHEN rn2 = n2 // 2 + 1 THEN dev ELSE 0 END) AS d2
    FROM o2 GROUP BY series_id
)
SELECT d.series_id, d.bucket, d.v,
       CAST(d.m2 AS BIGINT) AS m2, CAST(md.d2 AS BIGINT) AS d2,
       CAST(CASE WHEN 20000 * d.dev > 3 * 14826 * md.d2
                 THEN 1 ELSE 0 END AS BIGINT) AS outlier
FROM d JOIN md USING (series_id)
"""


def q_canonical_urls_docs(sf_dir: str):
    """URL canonicalization dedup (``stages/urls.py``): four messy
    spellings (case, default ports, utm params, fragments) of each of 50
    canonical URLs, canonicalized with vectorized Arrow RE2/split
    kernels, then counted per canonical via the hashpart grouped sum —
    the canonicalization itself is what the oracle hash-checks."""
    import numpy as np

    from ...stages.graph import grouped_sum_parts
    from ...stages.urls import canonicalize_urls_batch

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id"]).repartition(8)

    def _mk_urls(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy()
        base = pc.cast(pa.array(d % 50), pa.string())
        variant = d % 4
        full = pc.binary_join_element_wise(
            "HTTPS://WWW.Example.COM:443/Item/", base,
            "?utm_source=feed&id=1#frag", "")
        v1 = pc.binary_join_element_wise(
            "https://www.example.com/Item/", base, "?id=1", "")
        v2 = pc.binary_join_element_wise(
            "https://WWW.example.com:443/Item/", base,
            "?utm_campaign=x&id=1", "")
        v3 = pc.binary_join_element_wise(
            "https://www.EXAMPLE.com/Item/", base, "?id=1&utm_term=z", "")
        url = pc.if_else(pa.array(variant == 0), full,
                         pc.if_else(pa.array(variant == 1), v1,
                                    pc.if_else(pa.array(variant == 2),
                                               v2, v3)))
        return pa.table({"url": url})

    canon = ds.map_batches(_mk_urls, batch_format="pyarrow").map_batches(
        canonicalize_urls_batch, batch_format="pyarrow")
    return grouped_sum_parts(
        canon.map_batches(lambda b: pa.table({"canonical": b["canonical"]}),
                          batch_format="pyarrow"),
        ["canonical"], [], count_col="n", fanin=4)


CANONICAL_URLS_SQL = """
WITH u AS (
    SELECT CASE doc_id % 4
        WHEN 0 THEN 'HTTPS://WWW.Example.COM:443/Item/'
                    || CAST(doc_id % 50 AS VARCHAR)
                    || '?utm_source=feed&id=1#frag'
        WHEN 1 THEN 'https://www.example.com/Item/'
                    || CAST(doc_id % 50 AS VARCHAR) || '?id=1'
        WHEN 2 THEN 'https://WWW.example.com:443/Item/'
                    || CAST(doc_id % 50 AS VARCHAR) || '?utm_campaign=x&id=1'
        ELSE        'https://www.EXAMPLE.com/Item/'
                    || CAST(doc_id % 50 AS VARCHAR) || '?id=1&utm_term=z'
        END AS url
    FROM documents
),
f AS (SELECT regexp_replace(url, '#.*$', '') AS url FROM u),
a AS (
    -- authority ends at the FIRST '/' or '?'; path/query case preserved
    SELECT lower(split_part(url, '://', 1)) || '://'
           || lower(regexp_extract(split_part(url, '://', 2), '^[^/?]*'))
           || substr(split_part(url, '://', 2),
                     length(regexp_extract(split_part(url, '://', 2),
                                           '^[^/?]*')) + 1) AS url
    FROM f
),
c AS (
    SELECT regexp_replace(regexp_replace(regexp_replace(regexp_replace(
               regexp_replace(regexp_replace(url,
               '^(https://[^/?#]*):443(/|\\?|$)', '\\1\\2'),
               '^(http://[^/?#]*):80(/|\\?|$)', '\\1\\2'),
               '&utm_[^&#]*', '', 'g'),
               '\\?utm_[^&#]*&', '?'),
               '\\?utm_[^&#]*$', ''),
               '\\?$', '') AS canonical
    FROM a
)
SELECT canonical, count(*) AS n FROM c GROUP BY canonical
"""


def q_snapshot_diff_docs(sf_dir: str):
    """Incremental-crawl snapshot diff (``stages/diffing.py``): old crawl
    = every doc's page; new crawl drops doc_id%7==0 (removed), rewrites
    text for doc_id%5==0 (changed), adds an /extra page for doc_id%11==0
    — per-URL status via ONE hash(url) shuffle + vectorized segment
    classification, then per-domain status counts."""
    import numpy as np

    from ...stages.diffing import snapshot_diff
    from ...stages.graph import grouped_sum_parts

    cols = ["doc_id", "text"]

    def _page(b: pa.Table, *, extra: bool = False) -> pa.Table:
        d = b["doc_id"].to_numpy()
        dom = pc.cast(pa.array(d % 20), pa.string())
        did = pc.cast(b["doc_id"], pa.string())
        path = "/extra/" if extra else "/doc/"
        url = pc.binary_join_element_wise(
            "https://d", dom, ".example.com", path, did, "")
        return pa.table({"url": url, "text": b["text"]})

    old = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=cols).repartition(4)
    old_pages = old.map_batches(_page, batch_format="pyarrow")

    def _new_pages(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy()
        keep = d % 7 != 0
        t = b.filter(pa.array(keep))
        dk = t["doc_id"].to_numpy()
        text = t["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        changed = pa.array(dk % 5 == 0)
        text = pc.if_else(changed, pc.binary_join_element_wise(
            text, " v2", ""), text)
        base = _page(pa.table({"doc_id": t["doc_id"], "text": text}))
        extra_rows = b.filter(pa.array(d % 11 == 0))
        extra = _page(extra_rows, extra=True)
        return pa.concat_tables([base, extra])

    new_pages = _read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=cols).repartition(4
        ).map_batches(_new_pages, batch_format="pyarrow")

    diff = snapshot_diff(old_pages, new_pages, num_partitions=4)

    def _domain(b: pa.Table) -> pa.Table:
        dom = pc.list_element(pc.split_pattern(b["url"], "/"), 2)
        return pa.table({"domain": dom, "status": b["status"]})

    return grouped_sum_parts(
        diff.map_batches(_domain, batch_format="pyarrow"),
        ["domain", "status"], [], count_col="n", fanin=4)


SNAPSHOT_DIFF_SQL = """
WITH old AS (
    SELECT 'https://d' || CAST(doc_id % 20 AS VARCHAR)
           || '.example.com/doc/' || CAST(doc_id AS VARCHAR) AS url,
           text
    FROM documents
),
new AS (
    SELECT 'https://d' || CAST(doc_id % 20 AS VARCHAR)
           || '.example.com/doc/' || CAST(doc_id AS VARCHAR) AS url,
           CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END AS text
    FROM documents WHERE doc_id % 7 <> 0
    UNION ALL
    SELECT 'https://d' || CAST(doc_id % 20 AS VARCHAR)
           || '.example.com/extra/' || CAST(doc_id AS VARCHAR) AS url,
           text
    FROM documents WHERE doc_id % 11 = 0
),
d AS (
    SELECT COALESCE(o.url, n.url) AS url,
           CASE WHEN o.url IS NULL THEN 'added'
                WHEN n.url IS NULL THEN 'removed'
                WHEN o.text = n.text THEN 'same'
                ELSE 'changed' END AS status
    FROM old o FULL OUTER JOIN new n ON o.url = n.url
)
SELECT split_part(url, '/', 3) AS domain, status, count(*) AS n
FROM d GROUP BY domain, status
"""


def q_holt_15m(sf_dir: str):
    """Holt double exponential smoothing (level + trend, alpha=1/8,
    beta=1/16 fixed point — ``stages/smoothing.py:holt_fixed_point``)
    over the 15m tier: sequential per series (tier rows only), parallel
    across series after ONE hash(series) shuffle. The SQL oracle replays
    the coupled recursion with a recursive CTE."""
    from ...stages.rollup import rollup
    from ...stages.smoothing import holt_fixed_point

    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    rolled = rollup(ev.map_batches(_series, batch_format="pyarrow"),
                    900 * US)
    return holt_fixed_point(rolled, ka=3, kb=4, num_partitions=2)


HOLT_SQL = """
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
    SELECT series_id, bucket, y, idx,
           y AS level, CAST(0 AS BIGINT) AS trend, y AS forecast
    FROM numbered WHERE idx = 1
    UNION ALL
    SELECT series_id, bucket, y, idx,
           l0 + t0 + d8 AS level,
           -- level_new - l0 - t0 == d8, so the trend correction is
           -- floor(d8 / 16) with the same exact-integer idiom
           t0 + (CASE WHEN d8 >= 0 THEN d8 // 16
                 ELSE -(((-d8) + 15) // 16) END) AS trend,
           l0 + t0 AS forecast
    FROM (
        SELECT n.series_id, n.bucket, n.y, n.idx,
               r.level AS l0, r.trend AS t0,
               -- exact BIGINT floor(v / 8): DuckDB // truncates toward
               -- zero, so negatives take -((-v + 7) // 8); no double
               -- round-trip, so the replay stays exact past 2^53
               -- (r4 advice)
               CASE WHEN n.y - r.level - r.trend >= 0
                    THEN (n.y - r.level - r.trend) // 8
                    ELSE -(((-(n.y - r.level - r.trend)) + 7) // 8)
               END AS d8
        FROM rec r JOIN numbered n
          ON n.series_id = r.series_id AND n.idx = r.idx + 1
    ) z
)
SELECT series_id, bucket, y, level, trend, forecast FROM rec
"""


def q_theil_sen_15m(sf_dir: str):
    """Theil-Sen robust trend per series over the 15m tier
    (``stages/quantiles.py:theil_sen``): 2x median of all pairwise
    slopes; IEEE float64 division on both sides, order statistics with
    (slope, dv, db) tie-break, tier rows only (O(n^2) pairs stay
    partition-local)."""
    from ...stages.quantiles import theil_sen
    from ...stages.rollup import rollup

    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    rolled = rollup(ev.map_batches(_series, batch_format="pyarrow"),
                    900 * US)
    return theil_sen(rolled, num_partitions=2)


THEIL_SEN_SQL = """
WITH e AS (
    SELECT event_type, epoch_us(ts) AS ts_us,
           CAST(round(value * 100) AS BIGINT) AS cents
    FROM events
),
r AS (
    SELECT event_type AS series_id,
           ts_us // 900000000 * 900000000 AS bucket,
           CAST(sum(cents) AS BIGINT) AS v
    FROM e GROUP BY series_id, bucket
),
p AS (
    SELECT a.series_id,
           b.v - a.v AS dv, b.bucket - a.bucket AS db,
           CAST(b.v - a.v AS DOUBLE)
           / CAST(b.bucket - a.bucket AS DOUBLE) AS slope
    FROM r a JOIN r b
      ON a.series_id = b.series_id AND b.bucket > a.bucket
),
o AS (
    SELECT series_id, slope,
           row_number() OVER (PARTITION BY series_id
                              ORDER BY slope, dv, db) AS rn,
           count(*) OVER (PARTITION BY series_id) AS n
    FROM p
)
SELECT series_id, CAST(max(n) AS BIGINT) AS n_pairs,
       sum(CASE WHEN rn = (n - 1) // 2 + 1 THEN slope ELSE 0 END)
     + sum(CASE WHEN rn = n // 2 + 1 THEN slope ELSE 0 END) AS slope2
FROM o GROUP BY series_id
"""


def q_shipping_priority(sf_dir: str):
    """TPC-H-Q3-style three-table pipeline: segment-filtered customers
    hash-join orders (date-pruned at the read), the result hash-joins
    date-filtered lineitem, revenue in exact integer e6 units aggregates
    through the hashpart grouped sum (per-order key space), distributed
    sort + limit takes the top 10. Demonstrates chained ``Dataset.join``s
    with map-side filters BEFORE every exchange."""
    from ...stages.graph import grouped_sum_parts

    cutoff_us = 899_251_200 * US  # 1998-07-01 UTC

    cust = _read_parquet_clean(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment"]).map_batches(
        lambda b: pa.table({"o_custkey": b.filter(
            pc.equal(b["c_mktsegment"], "BUILDING"))["c_custkey"]}),
        batch_format="pyarrow")

    def _orders(b: pa.Table) -> pa.Table:
        ts = pc.cast(b["o_orderdate"], pa.int64())
        t = b.append_column("o_date_us", ts)
        return pa.table({
            "o_orderkey": t["o_orderkey"], "o_custkey": t["o_custkey"],
            "o_date_us": t["o_date_us"],
            "o_orderpriority": t["o_orderpriority"],
        }).filter(pc.less(t["o_date_us"], cutoff_us))

    orders = _read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate",
                 "o_orderpriority"]).map_batches(
        _orders, batch_format="pyarrow")
    j1 = orders.join(cust, join_type="inner", num_partitions=4,
                     on=("o_custkey",))
    j1 = j1.map_batches(
        lambda b: pa.table({"o_orderkey": b["o_orderkey"],
                            "o_date_us": b["o_date_us"],
                            "o_orderpriority": b["o_orderpriority"]}),
        batch_format="pyarrow")

    def _line(b: pa.Table) -> pa.Table:
        keep = pc.greater(pc.cast(b["l_shipdate"], pa.int64()), cutoff_us)
        t = b.filter(keep)
        price = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0),
                                 ndigits=0), pa.int64())
        disc = pc.cast(pc.round(pc.multiply(t["l_discount"], 10000.0),
                                ndigits=0), pa.int64())
        rev = pc.multiply(price, pc.subtract(pa.scalar(10000, pa.int64()),
                                             disc))
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "revenue_e6": rev})

    line = _read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_shipdate"]).map_batches(_line, batch_format="pyarrow")
    j2 = line.join(j1, join_type="inner", num_partitions=4,
                   on=("l_orderkey",), right_on=("o_orderkey",))
    agg = grouped_sum_parts(
        j2.map_batches(lambda b: pa.table({
            "l_orderkey": b["l_orderkey"], "o_date_us": b["o_date_us"],
            "o_orderpriority": b["o_orderpriority"],
            "revenue_e6": b["revenue_e6"]}), batch_format="pyarrow"),
        ["l_orderkey", "o_date_us", "o_orderpriority"], ["revenue_e6"],
        count_col=None, fanin=4)
    return agg.sort(key=["revenue_e6", "o_date_us", "l_orderkey"],
                    descending=[True, False, False]).limit(10)


SHIPPING_PRIORITY_SQL = """
SELECT l_orderkey, epoch_us(o_orderdate) AS o_date_us, o_orderpriority,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (10000 - CAST(round(l_discount * 10000) AS BIGINT)))
            AS BIGINT) AS revenue_e6
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-07-01'
  AND l_shipdate > TIMESTAMP '1998-07-01'
GROUP BY l_orderkey, o_date_us, o_orderpriority
ORDER BY revenue_e6 DESC, o_date_us, l_orderkey
LIMIT 10
"""


def q_funnel_users(sf_dir: str):
    """Ordered funnel view -> click -> purchase per user
    (``stages/funnel.py:funnel``): greedy-earliest match with strictly
    increasing timestamps, ONE hash(user) shuffle, vectorized
    minimum.reduceat per step. The SQL oracle replays the greedy match
    with nested min-filters."""
    from ...stages.funnel import funnel

    ds = _read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_type", "ts"]).map_batches(
        lambda b: pa.table({"user_id": b["user_id"],
                            "t": b["event_type"],
                            "x": pc.cast(b["ts"], pa.int64())}),
        batch_format="pyarrow")
    return funnel(ds, ["view", "click", "purchase"], num_partitions=2)


FUNNEL_SQL = """
WITH e AS (
    SELECT user_id, event_type, epoch_us(ts) AS x FROM events
),
s1 AS (SELECT user_id, min(x) AS t1 FROM e
       WHERE event_type = 'view' GROUP BY user_id),
s2 AS (SELECT e.user_id, min(x) AS t2 FROM e JOIN s1 USING (user_id)
       WHERE event_type = 'click' AND x > t1 GROUP BY e.user_id),
s3 AS (SELECT e.user_id, min(x) AS t3 FROM e JOIN s2 USING (user_id)
       WHERE event_type = 'purchase' AND x > t2 GROUP BY e.user_id)
SELECT u.user_id,
       CAST((t1 IS NOT NULL) AS BIGINT) + CAST((t2 IS NOT NULL) AS BIGINT)
       + CAST((t3 IS NOT NULL) AS BIGINT) AS depth,
       COALESCE(t1, -1) AS step1_us,
       COALESCE(t2, -1) AS step2_us,
       COALESCE(t3, -1) AS step3_us
FROM (SELECT DISTINCT user_id FROM e) u
LEFT JOIN s1 USING (user_id)
LEFT JOIN s2 USING (user_id)
LEFT JOIN s3 USING (user_id)
"""


def q_cohort_retention_users(sf_dir: str):
    """Weekly cohort retention (``stages/funnel.py:cohort_retention``):
    cohort = week of the user's first event, one (cohort, offset) pair
    per active week per user (first-occurrence mask after the per-user
    sort), tiny grouped count."""
    from ...stages.funnel import cohort_retention

    ds = _read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts"]).map_batches(
        lambda b: pa.table({"user_id": b["user_id"],
                            "x": pc.cast(b["ts"], pa.int64())}),
        batch_format="pyarrow")
    return cohort_retention(ds, num_partitions=2)


COHORT_SQL = """
WITH e AS (
    SELECT user_id, epoch_us(ts) // 604800000000 AS wk FROM events
),
f AS (SELECT user_id, min(wk) AS cw FROM e GROUP BY user_id),
p AS (SELECT DISTINCT e.user_id, f.cw, e.wk - f.cw AS off
      FROM e JOIN f USING (user_id))
SELECT cw * 604800000000 AS cohort_week_us, off AS week_offset,
       count(*) AS n_users
FROM p GROUP BY cw, off
"""


def q_lang_source_pivot(sf_dir: str):
    """Corpus crosstab (``stages/pivot.py:pivot_counts``): documents per
    source x language as a WIDE table with a caller-declared column set
    ('es' intentionally undeclared -> lands in ``other``) — map-side
    one-hot widening + the tree grouped sum."""
    from ...stages.pivot import pivot_counts

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["source", "lang"]).repartition(4)
    return pivot_counts(ds, row_col="source", col_col="lang",
                        columns=["en", "zh", "fr", "de"], fanin=4)


LANG_PIVOT_SQL = """
SELECT source,
       CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
       CAST(sum(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END) AS BIGINT) AS n_zh,
       CAST(sum(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS BIGINT) AS n_fr,
       CAST(sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS BIGINT) AS n_de,
       CAST(sum(CASE WHEN lang NOT IN ('en', 'zh', 'fr', 'de')
                     THEN 1 ELSE 0 END) AS BIGINT) AS other
FROM documents GROUP BY source
"""


def q_burn_rate_alerts(sf_dir: str):
    """SRE multi-window burn-rate alerting over the events stream: error
    fraction (value-cents > 9000 counts as 'bad') evaluated on BOTH a 5m
    and a 1h window; a 5m row alerts when bad*1000 > 14*n holds in its
    window AND in the enclosing hour (fast burn of a 0.1% budget at 14x,
    the SRE-workbook pair). Two rollups (each map-side partials + one
    exchange) + ONE multi-key hash join; all-integer cross-multiplied
    ratios, no float division."""
    ev = _events_cents(sf_dir)

    def _flags(b: pa.Table) -> pa.Table:
        bad = pc.cast(pc.greater(b["cents"], 9000), pa.int64())
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": bad})

    from ...stages.rollup import rollup

    flagged = ev.map_batches(_flags, batch_format="pyarrow")
    r5 = rollup(flagged, 300 * US)
    r1 = rollup(flagged, 3600 * US)

    def _w5(b: pa.Table) -> pa.Table:
        h = pc.multiply(pc.divide(b["bucket"],
                                  pa.scalar(3600 * US, pa.int64())),
                        pa.scalar(3600 * US, pa.int64()))
        return pa.table({"series_id": b["series_id"], "b5": b["bucket"],
                         "h": h, "bad5": b["sum_y"], "n5": b["n"]})

    def _w1(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["series_id"], "h": b["bucket"],
                         "bad1": b["sum_y"], "n1": b["n"]})

    j = r5.map_batches(_w5, batch_format="pyarrow").join(
        r1.map_batches(_w1, batch_format="pyarrow"), join_type="inner",
        num_partitions=2, on=("series_id", "h"))

    def _alert(b: pa.Table) -> pa.Table:
        fast = pc.greater(pc.multiply(b["bad5"],
                                      pa.scalar(1000, pa.int64())),
                          pc.multiply(b["n5"], pa.scalar(14, pa.int64())))
        slow = pc.greater(pc.multiply(b["bad1"],
                                      pa.scalar(1000, pa.int64())),
                          pc.multiply(b["n1"], pa.scalar(14, pa.int64())))
        both = pc.and_(fast, slow)
        return pa.table({"series_id": b["series_id"], "b5": b["b5"],
                         "bad5": b["bad5"], "n5": b["n5"],
                         "bad1": b["bad1"], "n1": b["n1"],
                         "alert": pc.cast(both, pa.int64())})

    return j.map_batches(_alert, batch_format="pyarrow")


BURN_RATE_SQL = """
WITH e AS (
    SELECT event_type AS series_id, epoch_us(ts) AS ts_us,
           CAST(CAST(round(value * 100) AS BIGINT) > 9000 AS BIGINT)
               AS bad
    FROM events
),
r5 AS (
    SELECT series_id, ts_us // 300000000 * 300000000 AS b5,
           CAST(sum(bad) AS BIGINT) AS bad5, count(*) AS n5
    FROM e GROUP BY series_id, b5
),
r1 AS (
    SELECT series_id, ts_us // 3600000000 * 3600000000 AS h,
           CAST(sum(bad) AS BIGINT) AS bad1, count(*) AS n1
    FROM e GROUP BY series_id, h
)
SELECT r5.series_id, r5.b5, r5.bad5, r5.n5, r1.bad1, r1.n1,
       CAST(r5.bad5 * 1000 > 14 * r5.n5
            AND r1.bad1 * 1000 > 14 * r1.n1 AS BIGINT) AS alert
FROM r5 JOIN r1
  ON r5.series_id = r1.series_id
 AND r5.b5 // 3600000000 * 3600000000 = r1.h
"""


def q_cooccurrence_docs(sf_dir: str):
    """Token co-occurrence / PMI precursor
    (``stages/cooccur.py:cooccurrence``): per unordered token pair the
    co-document count plus each side's df and the exact integer PMI
    numerator/denominator — in-block pair partials via the shared
    segment-pair gather, ONE hash(a,b) shuffle, vocab-sized df table
    broadcast back with ray.put."""
    import pyarrow.parquet as _pq

    from ...stages.cooccur import cooccurrence

    n = _pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"]).repartition(8)
    return cooccurrence(ds, n_docs=n, num_partitions=8)


COOCCURRENCE_SQL = """
WITH w AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS token
    FROM documents
),
f AS (SELECT DISTINCT doc_id, token FROM w WHERE token <> ''),
p AS (
    SELECT x.token AS a, y.token AS b
    FROM f x JOIN f y
      ON x.doc_id = y.doc_id AND x.token < y.token
),
c AS (SELECT a, b, count(*) AS co_df FROM p GROUP BY a, b),
d AS (SELECT token, count(*) AS df FROM f GROUP BY token),
n AS (SELECT count(*) AS c FROM documents)
SELECT c.a, c.b, CAST(c.co_df AS BIGINT) AS co_df,
       CAST(da.df AS BIGINT) AS df_a, CAST(db.df AS BIGINT) AS df_b,
       CAST(c.co_df * (SELECT c FROM n) AS BIGINT) AS pmi_num,
       CAST(da.df * db.df AS BIGINT) AS pmi_den
FROM c JOIN d da ON da.token = c.a JOIN d db ON db.token = c.b
"""


def q_bpe_merges_docs(sf_dir: str):
    """BPE merge training over the corpus word vocabulary
    (``stages/bpe.py:train_bpe``, 4 merges): per step one pair-count
    hashpart shuffle + a one-row distributed top-1 + a literal-replace
    map — the inherently sequential tokenizer-training loop, with every
    step replayed by the unrolled SQL oracle."""
    from ...stages.bpe import train_bpe
    from ...stages.graph import grouped_sum_parts

    docs = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                               columns=["text"]).repartition(8)

    def _words(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b["text"], " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        t = pa.table({"word": toks.values})
        return t.filter(pc.not_equal(t["word"], ""))

    words = grouped_sum_parts(
        docs.map_batches(_words, batch_format="pyarrow"),
        ["word"], [], count_col="n", fanin=4)
    merges, _final = train_bpe(words, merges=4, num_partitions=4)
    return merges


def _bpe_sql(merges: int = 4) -> str:
    parts = ["""
WITH w AS (
    SELECT token AS word, count(*) AS n FROM (
        SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ) WHERE token <> '' GROUP BY token
),
s0 AS (
    SELECT ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') AS tok, n
    FROM w
)"""]
    for k in range(1, merges + 1):
        p = k - 1
        parts.append(f""",
p{k} AS (
    SELECT z.pr[1] AS lft, z.pr[2] AS rgt, z.n FROM (
        SELECT unnest(list_zip(
            list_slice(syms, 1, len(syms) - 1),
            list_slice(syms, 2, len(syms)))) AS pr, n
        FROM (SELECT string_split(trim(tok, ' '), ' ') AS syms, n
              FROM s{p}) ) z
),
best{k} AS (
    SELECT lft, rgt, CAST(sum(n) AS BIGINT) AS w
    FROM p{k} GROUP BY lft, rgt
    ORDER BY w DESC, lft, rgt LIMIT 1
),
s{k} AS (
    SELECT replace(tok,
                   ' ' || (SELECT lft FROM best{k}) || ' '
                       || (SELECT rgt FROM best{k}) || ' ',
                   ' ' || (SELECT lft FROM best{k})
                       || (SELECT rgt FROM best{k}) || ' ') AS tok, n
    FROM s{p}
)""")
    sel = "\nUNION ALL\n".join(
        f'SELECT CAST({k} AS BIGINT) AS step, lft AS "left", rgt AS "right",'
        f" lft || rgt AS merged, w AS pair_count FROM best{k}"
        for k in range(1, merges + 1))
    parts.append("\n" + sel)
    return "".join(parts)


BPE_SQL = _bpe_sql()


def q_percentile_rank_15m(sf_dir: str):
    """Percentile-rank transform per series over the 15m tier
    (``stages/quantiles.py:percentile_rank``): exact integer
    (rank_lt, n) per row — SQL rank()-1 — via one hash(series) shuffle
    and a vectorized first-occurrence scatter."""
    from ...stages.quantiles import percentile_rank
    from ...stages.rollup import rollup

    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    rolled = rollup(ev.map_batches(_series, batch_format="pyarrow"),
                    900 * US)
    return percentile_rank(rolled, num_partitions=2)


PERCENTILE_RANK_SQL = """
WITH e AS (
    SELECT event_type, epoch_us(ts) AS ts_us,
           CAST(round(value * 100) AS BIGINT) AS cents
    FROM events
),
r AS (
    SELECT event_type AS series_id,
           ts_us // 900000000 * 900000000 AS bucket,
           CAST(sum(cents) AS BIGINT) AS v
    FROM e GROUP BY series_id, bucket
)
SELECT series_id, bucket, v,
       rank() OVER (PARTITION BY series_id ORDER BY v) - 1 AS rank_lt,
       count(*) OVER (PARTITION BY series_id) AS n
FROM r
"""


def q_bpe_tokenize_docs(sf_dir: str):
    """Tokenizer rollout: train 4 BPE merges on the word vocab, then
    apply them to every document map-side
    (``stages/bpe.py:tokenize_docs``) — per doc the word count, BPE
    token count (the compression diagnostic) and boundary tokens. The
    SQL oracle replays training AND application end to end."""
    from ...stages.bpe import tokenize_docs, train_bpe
    from ...stages.graph import grouped_sum_parts

    docs = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"]).repartition(8)

    def _words(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b["text"], " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        t = pa.table({"word": toks.values})
        return t.filter(pc.not_equal(t["word"], ""))

    words = grouped_sum_parts(
        docs.map_batches(_words, batch_format="pyarrow"),
        ["word"], [], count_col="n", fanin=4)
    merges, _ = train_bpe(words, merges=4, num_partitions=4)
    return tokenize_docs(docs, merges)


def _bpe_tokenize_sql(merges: int = 4) -> str:
    base = _bpe_sql(merges)
    # reuse the training CTE chain (everything before the final SELECT)
    body = base[:base.rindex("\nSELECT CAST(1 AS BIGINT) AS step")]
    parts = [body, """,
d0 AS (
    SELECT doc_id, text,
           ' ' || regexp_replace(text, '(.)', '\\1 ', 'g') AS tok
    FROM documents
)"""]
    for k in range(1, merges + 1):
        parts.append(f""",
d{k} AS (
    SELECT doc_id, text,
           replace(tok,
                   ' ' || (SELECT lft FROM best{k}) || ' '
                       || (SELECT rgt FROM best{k}) || ' ',
                   ' ' || (SELECT lft FROM best{k})
                       || (SELECT rgt FROM best{k}) || ' ') AS tok
    FROM d{k - 1}
)""")
    parts.append(f""",
fin AS (
    SELECT doc_id,
           list_filter(string_split(text, ' '), x -> x <> '') AS ws,
           list_filter(string_split(tok, ' '), x -> x <> '') AS ts
    FROM d{merges}
)
SELECT doc_id,
       CAST(len(ws) AS BIGINT) AS n_words,
       CAST(len(ts) AS BIGINT) AS n_tokens_bpe,
       CASE WHEN len(ts) = 0 THEN '' ELSE ts[1] END AS first_tok,
       CASE WHEN len(ts) = 0 THEN '' ELSE ts[len(ts)] END AS last_tok
FROM fin""")
    return "".join(parts)


BPE_TOKENIZE_SQL = _bpe_tokenize_sql()


def q_domain_concentration_docs(sf_dir: str):
    """Corpus balance audit (``stages/quantiles.py:top_share``): per
    source, how many of its total chars the top-10 docs hold — exact
    int64 (n, total, top-k sum), ties at the boundary by (chars DESC,
    doc_id ASC), one hash(source) shuffle."""
    from ...stages.quantiles import top_share

    ds = _read_parquet_clean(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "source", "n_chars"]).repartition(4)
    return top_share(ds, group_col="source", weight_col="n_chars", k=10,
                     tiebreak_col="doc_id", num_partitions=2)


DOMAIN_CONCENTRATION_SQL = """
WITH o AS (
    SELECT source, n_chars,
           row_number() OVER (PARTITION BY source
                              ORDER BY n_chars DESC, doc_id) AS rn
    FROM documents
)
SELECT source AS "group", count(*) AS n,
       CAST(sum(n_chars) AS BIGINT) AS total_w,
       CAST(sum(CASE WHEN rn <= 10 THEN n_chars ELSE 0 END) AS BIGINT)
           AS top_w
FROM o GROUP BY source
"""


def q_winsorize_15m(sf_dir: str):
    """Per-series winsorization to the [p5, p95] discrete quantile band
    (``stages/quantiles.py:winsorize``): the robust pre-transform for
    heavy-tailed telemetry — all integer, one hash(series) shuffle,
    clamp bounds from the same pinned lower-quantile convention as
    ``exact_quantiles``."""
    from ...stages.quantiles import winsorize
    from ...stages.rollup import rollup

    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    rolled = rollup(ev.map_batches(_series, batch_format="pyarrow"),
                    900 * US)
    return winsorize(rolled, num_partitions=2)


WINSORIZE_SQL = """
WITH e AS (
    SELECT event_type, epoch_us(ts) AS ts_us,
           CAST(round(value * 100) AS BIGINT) AS cents
    FROM events
),
r AS (
    SELECT event_type AS series_id,
           ts_us // 900000000 * 900000000 AS bucket,
           CAST(sum(cents) AS BIGINT) AS v
    FROM e GROUP BY series_id, bucket
),
o AS (
    SELECT series_id, bucket, v,
           row_number() OVER (PARTITION BY series_id
                              ORDER BY v, bucket) AS rn,
           count(*) OVER (PARTITION BY series_id) AS n
    FROM r
),
q AS (
    SELECT series_id,
           sum(CASE WHEN rn = (n - 1) * 5 // 100 + 1 THEN v END) AS lo_v,
           sum(CASE WHEN rn = (n - 1) * 95 // 100 + 1 THEN v END) AS hi_v
    FROM o GROUP BY series_id
)
SELECT o.series_id, o.bucket, o.v,
       CAST(least(greatest(o.v, q.lo_v), q.hi_v) AS BIGINT) AS v_wins,
       CAST(o.v <> least(greatest(o.v, q.lo_v), q.hi_v) AS BIGINT)
           AS clipped
FROM o JOIN q USING (series_id)
"""


def q_rolling_median_15m(sf_dir: str):
    """Per-series sliding DISCRETE median over the 15-min tier
    (``stages/windows.py:rolling_median``): the order-statistic despike
    window ``rolling_stats`` can't express — element ``(w-1)//2`` of
    the sorted trailing-5 window, clipped at the series start. One
    hash(series) shuffle, one vectorized (n,k) window-gather per
    partition; all integer, replayed in SQL by
    ``quantile_disc(v, 0.5) OVER (ROWS 4 PRECEDING)``."""
    from ...stages.rollup import rollup
    from ...stages.windows import rolling_median

    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    rolled = rollup(ev.map_batches(_series, batch_format="pyarrow"),
                    900 * US)
    return rolling_median(rolled, 5, num_partitions=2)


ROLLING_MEDIAN_SQL = """
WITH e AS (
    SELECT event_type, epoch_us(ts) AS ts_us,
           CAST(round(value * 100) AS BIGINT) AS cents
    FROM events
),
r AS (
    SELECT event_type AS series_id,
           ts_us // 900000000 * 900000000 AS bucket,
           CAST(sum(cents) AS BIGINT) AS v
    FROM e GROUP BY series_id, bucket
)
SELECT series_id, bucket, v,
       quantile_disc(v, 0.5) OVER (
           PARTITION BY series_id ORDER BY bucket
           ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS roll_med,
       CAST(least(row_number() OVER (PARTITION BY series_id
                                     ORDER BY bucket), 5) AS BIGINT)
           AS roll_w
FROM r
"""


def q_upsert_latest_events(sf_dir: str):
    """CDC latest-wins compaction with delete tombstones
    (``stages/cdc.py:upsert_latest``): the events table replayed as a
    change log keyed by (user_id, event_type), survivor = greatest
    (ts_us, event_id), tombstone when ``event_id % 17 == 0``. Map-side
    per-key pre-reduce (latest-wins is mergeable) -> ONE hash(key)
    shuffle of the partials -> final selection + tombstone filter; no
    row_number over the full log, no global sort."""
    from ...stages.cdc import upsert_latest

    ds = _read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    ).repartition(8)

    def _log(b: pa.Table) -> pa.Table:
        eid = b["event_id"]
        tomb = pc.cast(pc.equal(
            pc.subtract(eid, pc.multiply(
                pc.divide(eid, pa.scalar(17, pa.int64())),
                pa.scalar(17, pa.int64()))),
            pa.scalar(0, pa.int64())), pa.int64())
        return pa.table({
            "user_id": b["user_id"], "event_type": b["event_type"],
            "ts_us": pc.cast(b["ts"], pa.int64()),
            "cents": pc.cast(pc.round(pc.multiply(b["value"], 100.0),
                                      ndigits=0), pa.int64()),
            "event_id": eid, "is_delete": tomb,
        })

    log = ds.map_batches(_log, batch_format="pyarrow")
    return upsert_latest(log, key_cols=["event_type", "user_id"],
                         order_cols=["ts_us", "event_id"],
                         tombstone_col="is_delete", num_partitions=4)


UPSERT_LATEST_SQL = """
WITH e AS (
    SELECT user_id, event_type, epoch_us(ts) AS ts_us,
           CAST(round(value * 100) AS BIGINT) AS cents, event_id,
           CAST(event_id % 17 = 0 AS BIGINT) AS is_delete
    FROM events
),
r AS (
    SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                 ORDER BY ts_us DESC, event_id DESC) AS rk
    FROM e
)
SELECT user_id, event_type, ts_us, cents, event_id
FROM r WHERE rk = 1 AND is_delete = 0
"""


