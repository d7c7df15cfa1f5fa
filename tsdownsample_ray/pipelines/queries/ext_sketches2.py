"""Kendall tau-b, ordinal patterns, HITS, reciprocity, assortativity, KMV, log2-histogram quantiles.

Split from the former pipelines/queries.py monolith (r4 verdict
next-round #5); statement order inside this module is the original
file order. Explicit cross-module imports are generated: backward
dependencies at the top, forward (function-body-only) dependencies at
the bottom so package import order stays acyclic.
"""
from __future__ import annotations

from ._shared import (
    PAGES_CTE,
    SNAPSHOTS,
    W15M,
    W1H,
    _read_parquet_clean,
    pa,
    pc,
    read_pages,
)
from .downsample_core import _events_cents
from .graph_link import _graph_targets

# --- round 4 additions: rank correlation, ordinal patterns, HITS,
# --- reciprocity, assortativity, KMV distinct, log2-histogram quantiles


def q_kendall_pairs_1h(sf_dir: str):
    """Kendall tau-b between event_type series over co-populated 1h
    buckets (``stages/correlate.py:kendall_pairs``): every bucket pair of
    the aligned values classified concordant / discordant / tied by exact
    integer sign comparison — one hash(bucket) align shuffle, one
    hash(pair) gather shuffle, and a blocked vectorized O(n^2) sign pass
    per pair (quadratic BY DEFINITION; so is the SQL bucket-pair
    self-join). tau-b is ONE pinned IEEE expression over the int64
    counts. No counterpart in the reference (kernel library)."""
    from ...stages.correlate import kendall_pairs
    from ...stages.rollup import rollup

    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    rolled = rollup(ev.map_batches(_series, batch_format="pyarrow"), W1H)
    return kendall_pairs(rolled, num_partitions=2)


KENDALL_SQL = f"""
WITH e AS (
    SELECT event_type, epoch_us(ts) AS ts_us,
           CAST(round(value * 100) AS BIGINT) AS cents
    FROM events
),
r AS (
    SELECT event_type, ts_us // {W1H} * {W1H} AS bucket,
           CAST(sum(cents) AS BIGINT) AS v
    FROM e GROUP BY event_type, bucket
),
p AS (
    SELECT a.event_type AS s1, b.event_type AS s2, a.bucket,
           a.v AS x, b.v AS y
    FROM r a JOIN r b
      ON a.bucket = b.bucket AND a.event_type < b.event_type
),
q AS (
    SELECT p1.s1, p1.s2,
           CASE WHEN p2.x > p1.x THEN 1
                WHEN p2.x < p1.x THEN -1 ELSE 0 END AS dx,
           CASE WHEN p2.y > p1.y THEN 1
                WHEN p2.y < p1.y THEN -1 ELSE 0 END AS dy
    FROM p p1 JOIN p p2
      ON p1.s1 = p2.s1 AND p1.s2 = p2.s2 AND p1.bucket < p2.bucket
),
c AS (
    SELECT s1, s2,
           CAST(count(*) FILTER (WHERE dx * dy > 0) AS BIGINT) AS nc,
           CAST(count(*) FILTER (WHERE dx * dy < 0) AS BIGINT) AS nd,
           CAST(count(*) FILTER (WHERE dx = 0 AND dy != 0) AS BIGINT)
               AS tie_x,
           CAST(count(*) FILTER (WHERE dy = 0 AND dx != 0) AS BIGINT)
               AS tie_y,
           CAST(count(*) FILTER (WHERE dx = 0 AND dy = 0) AS BIGINT)
               AS tie_xy
    FROM q GROUP BY s1, s2
),
n_ AS (
    SELECT s1, s2, CAST(count(*) AS BIGINT) AS n FROM p GROUP BY s1, s2
),
st AS (
    SELECT n_.s1, n_.s2, n_.n,
           coalesce(c.nc, 0) AS nc, coalesce(c.nd, 0) AS nd,
           coalesce(c.tie_x, 0) AS tie_x, coalesce(c.tie_y, 0) AS tie_y,
           coalesce(c.tie_xy, 0) AS tie_xy
    FROM n_ LEFT JOIN c ON n_.s1 = c.s1 AND n_.s2 = c.s2
)
SELECT s1, s2, n, nc, nd, tie_x, tie_y, tie_xy,
       CASE WHEN (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1) / 2
                  - (CAST(tie_x AS DOUBLE) + CAST(tie_xy AS DOUBLE))) > 0
             AND (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1) / 2
                  - (CAST(tie_y AS DOUBLE) + CAST(tie_xy AS DOUBLE))) > 0
            THEN (CAST(nc AS DOUBLE) - CAST(nd AS DOUBLE))
                 / sqrt((CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1) / 2
                         - (CAST(tie_x AS DOUBLE) + CAST(tie_xy AS DOUBLE)))
                        * (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1) / 2
                           - (CAST(tie_y AS DOUBLE)
                              + CAST(tie_xy AS DOUBLE))))
            ELSE NULL
       END AS tau
FROM st
"""


def q_ordinal_patterns_15m(sf_dir: str):
    """Permutation-entropy histogram (order-3 ordinal patterns, Bandt &
    Pompe 2002) per event_type series over the 15m tier
    (``stages/sax.py:ordinal_patterns``): one hash(series) shuffle, one
    vectorized shift pass encoding every 3-window's stable rank pattern
    as three <=-comparison bits — exact int64 counts, lead()-window SQL
    replay."""
    from ...stages.rollup import rollup
    from ...stages.sax import ordinal_patterns

    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    rolled = rollup(ev.map_batches(_series, batch_format="pyarrow"), W15M)
    return ordinal_patterns(rolled, num_partitions=2)


ORDINAL_SQL = f"""
WITH e AS (
    SELECT event_type, epoch_us(ts) AS ts_us,
           CAST(round(value * 100) AS BIGINT) AS cents
    FROM events
),
r AS (
    SELECT event_type AS series_id, ts_us // {W15M} * {W15M} AS bucket,
           CAST(sum(cents) AS BIGINT) AS v
    FROM e GROUP BY 1, 2
),
w AS (
    SELECT series_id, v,
           lead(v, 1) OVER (PARTITION BY series_id ORDER BY bucket) AS v1,
           lead(v, 2) OVER (PARTITION BY series_id ORDER BY bucket) AS v2
    FROM r
)
SELECT series_id,
       4 * (v <= v1)::BIGINT + 2 * (v <= v2)::BIGINT + (v1 <= v2)::BIGINT
           AS pattern,
       CAST(count(*) AS BIGINT) AS n
FROM w WHERE v2 IS NOT NULL
GROUP BY 1, 2
"""


def q_hits_docs(sf_dir: str):
    """Integer fixed-point HITS (4 rounds, scale 1e6, max-normalized) over
    the deterministic doc link graph (``stages/graph.py:hits``):
    partitioned-iterative raw tasks — edges hash-partitioned once per
    direction, state co-partitioned by the same hash, per half-round P
    local Arrow joins + a distinct-key-bounded partial exchange; the
    driver reads one int per partition per half-round, never the state.
    Bit-exact vs the unrolled SQL replay (int64 floor division
    throughout)."""
    import numpy as np
    import pyarrow.parquet as _pq

    from ...stages.graph import hits

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
    return hits(edges, nodes, node_col="doc_id", iters=4,
                num_partitions=4)


def _hits_sql(iters: int = 4, scale: int = 10 ** 6) -> str:
    parts = [f"""
WITH n AS (SELECT count(*) AS c FROM documents),
e AS (
    SELECT d.doc_id AS src,
           (d.doc_id*31 + 97*j.j) % (SELECT c FROM n) AS dst
    FROM documents d CROSS JOIN (VALUES (1), (2), (3)) AS j(j)),
h0 AS (SELECT doc_id AS v, CAST({scale} AS BIGINT) AS s FROM documents)"""]
    for k in range(1, iters + 1):
        # MATERIALIZED: each s-CTE is referenced twice (normalize + its
        # scalar max); DuckDB inlines CTEs by default, which doubles the
        # whole chain per round — exponential re-evaluation over iters
        parts.append(f""",
a{k}s AS MATERIALIZED (
    SELECT e.dst AS v, CAST(sum(h.s) AS BIGINT) AS s
    FROM e JOIN h{k - 1} h ON h.v = e.src GROUP BY e.dst),
a{k} AS MATERIALIZED (
    SELECT v, s * {scale} // (SELECT max(s) FROM a{k}s) AS s
    FROM a{k}s),
h{k}s AS MATERIALIZED (
    SELECT e.src AS v, CAST(sum(a.s) AS BIGINT) AS s
    FROM e JOIN a{k} a ON a.v = e.dst GROUP BY e.src),
h{k} AS MATERIALIZED (
    SELECT v, s * {scale} // (SELECT max(s) FROM h{k}s) AS s
    FROM h{k}s)""")
    parts.append(f"""
SELECT d.doc_id,
       CAST(coalesce(h.s, 0) AS BIGINT) AS hub_e6,
       CAST(coalesce(a.s, 0) AS BIGINT) AS auth_e6
FROM documents d
LEFT JOIN h{iters} h ON h.v = d.doc_id
LEFT JOIN a{iters} a ON a.v = d.doc_id""")
    return "".join(parts)


HITS_SQL = _hits_sql()


def q_reciprocity_docs(sf_dir: str):
    """Edge reciprocity of the deterministic doc link graph
    (``stages/graph.py:reciprocity``): distinct non-loop edges hash-join
    their own reversal — exact reduced fraction + one-expression float,
    never all-pairs."""
    import numpy as np
    import pyarrow.parquet as _pq

    from ...stages.graph import reciprocity

    n = _pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    nodes = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                                columns=["doc_id"]).repartition(4)

    def _edges(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy()
        ts = _graph_targets(d, n)
        src = np.concatenate([d.astype(np.int64)] * 3)
        dst = np.concatenate(ts)
        return pa.table({"src": pa.array(src), "dst": pa.array(dst)})

    return reciprocity(nodes.map_batches(_edges, batch_format="pyarrow"),
                       num_partitions=4, fanin=4)


RECIPROCITY_SQL = """
WITH n AS (SELECT count(*) AS c FROM documents),
e AS (
    SELECT DISTINCT d.doc_id AS src,
           (d.doc_id*31 + 97*j.j) % (SELECT c FROM n) AS dst
    FROM documents d CROSS JOIN (VALUES (1), (2), (3)) AS j(j)),
d_ AS (SELECT src, dst FROM e WHERE src != dst),
cnt AS (
    SELECT CAST(count(*) AS BIGINT) AS n_edges,
           CAST(count(*) FILTER (WHERE EXISTS (
               SELECT 1 FROM d_ r WHERE r.src = d_.dst AND r.dst = d_.src))
               AS BIGINT) AS n_recip
    FROM d_)
SELECT n_edges, n_recip,
       CAST(n_recip // greatest(gcd(n_recip, n_edges), 1) AS BIGINT)
           AS recip_num,
       CAST(n_edges // greatest(gcd(n_recip, n_edges), 1) AS BIGINT)
           AS recip_den,
       CAST(n_recip AS DOUBLE) / n_edges AS reciprocity
FROM cnt
"""


def q_assortativity_docs(sf_dir: str):
    """Directed out-in degree assortativity (Newman 2002) of the doc link
    graph (``stages/graph.py:degree_assortativity``): two hashpart degree
    counts + two hash joins attach endpoint degrees; exact int64
    sufficient statistics, pinned-IEEE corr."""
    import numpy as np
    import pyarrow.parquet as _pq

    from ...stages.graph import degree_assortativity

    n = _pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    nodes = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                                columns=["doc_id"]).repartition(4)

    def _edges(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy()
        ts = _graph_targets(d, n)
        src = np.concatenate([d.astype(np.int64)] * 3)
        dst = np.concatenate(ts)
        return pa.table({"src": pa.array(src), "dst": pa.array(dst)})

    return degree_assortativity(
        nodes.map_batches(_edges, batch_format="pyarrow"),
        num_partitions=4, fanin=4)


ASSORTATIVITY_SQL = """
WITH nn AS (SELECT count(*) AS c FROM documents),
e AS (
    SELECT DISTINCT d.doc_id AS src,
           (d.doc_id*31 + 97*j.j) % (SELECT c FROM nn) AS dst
    FROM documents d CROSS JOIN (VALUES (1), (2), (3)) AS j(j)),
d_ AS (SELECT src, dst FROM e WHERE src != dst),
od AS (SELECT src, CAST(count(*) AS BIGINT) AS x FROM d_ GROUP BY src),
id_ AS (SELECT dst, CAST(count(*) AS BIGINT) AS y FROM d_ GROUP BY dst),
j AS (SELECT od.x, id_.y FROM d_
      JOIN od ON od.src = d_.src JOIN id_ ON id_.dst = d_.dst),
st AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(x) AS BIGINT) AS sum_x, CAST(sum(y) AS BIGINT) AS sum_y,
           CAST(sum(x * y) AS BIGINT) AS sum_xy,
           CAST(sum(x * x) AS BIGINT) AS sum_xx,
           CAST(sum(y * y) AS BIGINT) AS sum_yy
    FROM j)
SELECT n, sum_x, sum_y, sum_xy, sum_xx, sum_yy,
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


def q_kmv_distinct_domains(sf_dir: str):
    """KMV (k-minimum-values) distinct-URL sketch per domain
    (``stages/sketches.py:kmv_distinct``, k=64): per-batch unique-value
    md5, at most k u64 hashes per key leave any block, per-key merge is
    again take-k-smallest — and the ESTIMATE replays bit-exactly in SQL
    (md5 -> HUGEINT, row_number <= k), unlike HLL's accuracy-band check."""
    from ...stages.sketches import kmv_distinct

    pages = read_pages(sf_dir, snapshots=SNAPSHOTS,
                       columns=["url", "warc_ts"])

    def _dom(b: pa.Table) -> pa.Table:
        url = b["url"]
        if isinstance(url, pa.ChunkedArray):
            url = url.combine_chunks()
        from ...stages.series import _DOMAIN_PATTERN

        domain = pc.struct_field(pc.extract_regex(url, _DOMAIN_PATTERN),
                                 "domain")
        return pa.table({"domain": domain, "url": url})

    return kmv_distinct(pages.map_batches(_dom, batch_format="pyarrow"),
                        key_col="domain", value_col="url", k=64, fanin=4)


KMV_SQL = f"""
WITH {{PAGES_CTE}}
, h AS (
    SELECT DISTINCT series_id AS domain,
        list_reduce(list_prepend(0::HUGEINT,
            list_transform(range(1, 17),
                i -> CAST(strpos('0123456789abcdef',
                                 substring(md5(url), i, 1)) - 1
                          AS HUGEINT))), (h, d) -> h * 16 + d) AS hv
    FROM pages
),
rk AS (
    SELECT domain, hv,
           row_number() OVER (PARTITION BY domain ORDER BY hv) AS rn,
           count(*) OVER (PARTITION BY domain) AS cnt
    FROM h
),
kth AS (
    SELECT domain, max(hv) FILTER (WHERE rn <= 64) AS kth,
           any_value(cnt) AS cnt,
           CAST(count(*) FILTER (WHERE rn <= 64) AS BIGINT) AS kept
    FROM rk GROUP BY domain
)
SELECT domain, kept AS kmv_kept,
       CASE WHEN cnt >= 64
            THEN CAST(LEAST(63 * 18446744073709551616::HUGEINT // kth,
                            4611686018427387904::HUGEINT) AS BIGINT)
            ELSE kept END AS kmv_est
FROM kth
"""


def q_log2hist_events(sf_dir: str):
    """DDSketch-style log2-bucket quantile sketch over event cents per
    event_type (``stages/sketches.py:log2hist_quantiles``): exact
    bit-length buckets (mergeable int64 cells, <= 63 per key on the
    wire), p50/p90/p99 reported as the bucket index + its 2^b lower
    bound — factor-2 guarantees that replay bit-exactly in SQL
    (``length(bin(v)) - 1``)."""
    from ...stages.sketches import log2hist_quantiles

    ev = _events_cents(sf_dir)

    def _kv(b: pa.Table) -> pa.Table:
        t = pa.table({"event_type": b["event_type"],
                      "cents": b["cents"]})
        # the log-bucket sketch's domain is v > 0 (it raises otherwise);
        # zero-cent events (sub-cent values, present from sf0.1 up) are
        # filtered on BOTH sides
        return t.filter(pc.greater(t["cents"], 0))

    return log2hist_quantiles(ev.map_batches(_kv, batch_format="pyarrow"),
                              key_col="event_type", value_col="cents",
                              quantiles=(50, 90, 99), fanin=4)


LOG2HIST_SQL = """
WITH e AS (
    SELECT event_type,
           length(bin(CAST(round(value * 100) AS BIGINT))) - 1 AS b
    FROM events WHERE CAST(round(value * 100) AS BIGINT) > 0
),
c AS (
    SELECT event_type, b, CAST(count(*) AS BIGINT) AS c
    FROM e GROUP BY 1, 2
),
n_ AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY 1),
cum AS (
    SELECT event_type, b,
           sum(c) OVER (PARTITION BY event_type ORDER BY b) AS run
    FROM c
)
SELECT n_.event_type, n_.n,
       (SELECT min(b) FROM cum WHERE cum.event_type = n_.event_type
        AND run >= (50 * n_.n + 99) // 100) AS q50_bucket,
       CAST(2 ** (SELECT min(b) FROM cum WHERE cum.event_type = n_.event_type
        AND run >= (50 * n_.n + 99) // 100) AS BIGINT) AS q50_lo,
       (SELECT min(b) FROM cum WHERE cum.event_type = n_.event_type
        AND run >= (90 * n_.n + 99) // 100) AS q90_bucket,
       CAST(2 ** (SELECT min(b) FROM cum WHERE cum.event_type = n_.event_type
        AND run >= (90 * n_.n + 99) // 100) AS BIGINT) AS q90_lo,
       (SELECT min(b) FROM cum WHERE cum.event_type = n_.event_type
        AND run >= (99 * n_.n + 99) // 100) AS q99_bucket,
       CAST(2 ** (SELECT min(b) FROM cum WHERE cum.event_type = n_.event_type
        AND run >= (99 * n_.n + 99) // 100) AS BIGINT) AS q99_lo
FROM n_
"""

KMV_SQL = KMV_SQL.format(PAGES_CTE=PAGES_CTE)


