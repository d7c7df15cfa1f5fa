"""Sketches (CMS), z-order zone maps, ACF, cube, checksums, bloom semi-join, triangles, ordering, skyline, streaks.

Split from the former pipelines/queries.py monolith (r4 verdict
next-round #5); statement order inside this module is the original
file order. Explicit cross-module imports are generated: backward
dependencies at the top, forward (function-body-only) dependencies at
the bottom so package import order stays acyclic.
"""
from __future__ import annotations

from ._shared import (
    US,
    _MD5U64,
    _read_parquet_clean,
    finalize_mean,
    np,
    pa,
    pc,
    rollup,
)
from .downsample_core import _events_cents
from .graph_link import _graph_targets

def q_cms_heavy_hitters_docs(sf_dir: str):
    """Count-min sketch of corpus token frequencies
    (``stages/sketches.py:cms_token_counts``): per-block depth x width
    integer cells merged ADDITIVELY (no token leaves its block), final
    <=depth*width-row sketch broadcast via ray.put; the exact counts
    (one hash(token) shuffle) verify the one-sided error. md5-u64 token
    hashes + hash61 row buckets keep the whole sketch SQL-replayable."""
    from ...stages.sketches import cms_token_counts

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"]).repartition(4)
    return cms_token_counts(ds, depth=4, width=32, num_partitions=4)


def _cms_sql(depth: int = 4, width: int = 32) -> str:
    from ...stages.sampling import hash61_sql

    per_r_cells = "\n        UNION ALL\n        ".join(
        f"SELECT {r} AS r, CAST({hash61_sql('h64', r)} % {width} AS BIGINT)"
        f" AS bucket, exact_n FROM h"
        for r in range(depth))
    per_r_est = "\n    UNION ALL\n    ".join(
        f"SELECT h.tok, h.exact_n, c.c FROM h JOIN cells c ON c.r = {r}"
        f" AND c.bucket = CAST({hash61_sql('h.h64', r)} % {width} AS BIGINT)"
        for r in range(depth))
    return f"""
WITH tk AS (
    SELECT unnest(list_filter(string_split(text, ' '), x -> x <> ''))
        AS tok
    FROM documents
),
cnt AS (SELECT tok, count(*) AS exact_n FROM tk GROUP BY tok),
h AS (SELECT tok, exact_n, {_MD5U64} AS h64 FROM cnt),
cells AS (
    SELECT r, bucket, CAST(sum(exact_n) AS BIGINT) AS c FROM (
        {per_r_cells}
    ) GROUP BY r, bucket
),
j AS (
    {per_r_est}
)
SELECT tok AS token, exact_n, CAST(min(c) AS BIGINT) AS est_n,
       CAST(min(c) - exact_n AS BIGINT) AS overcount
FROM j GROUP BY tok, exact_n
"""


CMS_SQL = _cms_sql()


def q_zorder_zone_maps_events(sf_dir: str):
    """Z-order clustering manifest (``stages/zorder.py``): Morton-
    interleave (user_id, hour-bucket) so ONE range partitioning bounds
    BOTH dimensions, emit per-partition zone maps (the pruning manifest
    of a z-clustered write). Vectorized shift/mask z-codes, block-local
    zone-map partials, one constant-size shuffle; rows never move."""
    from ...stages.zorder import zorder_zone_maps

    ds = _read_parquet_clean(f"{sf_dir}/events.parquet",
                             columns=["user_id", "ts"]).repartition(8)

    def _dims(b: pa.Table) -> pa.Table:
        ts_us = pc.cast(b["ts"], pa.int64())
        hour = pc.divide(ts_us, pa.scalar(3_600_000_000, pa.int64()))
        return pa.table({"d0": b["user_id"], "d1": hour})

    return zorder_zone_maps(ds.map_batches(_dims, batch_format="pyarrow"),
                            d0_col="d0", d1_col="d1", bits=8,
                            parts_log2=4, num_partitions=2)


def _zorder_sql(bits: int = 8, parts_log2: int = 4) -> str:
    from ...stages.zorder import spread16_sql

    m = (1 << bits) - 1
    z = f"({spread16_sql('d0')} | ({spread16_sql('d1')} << 1))"
    return f"""
WITH e AS (
    SELECT user_id % {m + 1} AS d0,
           (epoch_us(ts) // 3600000000) % {m + 1} AS d1
    FROM events
),
z AS (SELECT d0, d1, {z} AS zcode FROM e)
SELECT zcode >> {2 * bits - parts_log2} AS p, count(*) AS n,
       min(d0) AS min_d0, max(d0) AS max_d0,
       min(d1) AS min_d1, max(d1) AS max_d1,
       min(zcode) AS min_z, max(zcode) AS max_z
FROM z GROUP BY 1
"""


ZORDER_SQL = _zorder_sql()


def q_acf_15m(sf_dir: str):
    """Per-series autocorrelation at lags 1..3 over the 15-min tier
    (``stages/correlate.py:autocorrelation``): one hash(series) shuffle,
    all lags matched in one composite-key searchsorted pass, int64
    sufficient stats, pinned-IEEE corr — gaps excluded like the SQL
    inner join."""
    from ...stages.correlate import autocorrelation
    from ...stages.rollup import rollup

    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    rolled = rollup(ev.map_batches(_series, batch_format="pyarrow"),
                    900 * US)
    return autocorrelation(rolled, lags=(1, 2, 3), window_us=900 * US,
                           num_partitions=2)


_CORR_EXPR = """
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
"""

ACF_SQL = f"""
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
    SELECT a.series_id, l.lag, a.v AS x, b.v AS y
    FROM r a
    JOIN (VALUES (1), (2), (3)) l(lag) ON true
    JOIN r b ON b.series_id = a.series_id
            AND b.bucket = a.bucket + CAST(l.lag AS BIGINT) * 900000000
),
st AS (
    SELECT series_id, CAST(lag AS BIGINT) AS lag, count(*) AS n,
           CAST(sum(x) AS BIGINT) AS sum_x,
           CAST(sum(y) AS BIGINT) AS sum_y,
           CAST(sum(x * y) AS BIGINT) AS sum_xy,
           CAST(sum(x * x) AS BIGINT) AS sum_xx,
           CAST(sum(y * y) AS BIGINT) AS sum_yy
    FROM p GROUP BY series_id, lag
)
SELECT series_id, lag, n, sum_x, sum_y, sum_xy, sum_xx, sum_yy,
{_CORR_EXPR}
FROM st
"""


def q_cube_docs(sf_dir: str):
    """CUBE(source, lang) totals in ONE pass
    (``stages/cube.py:grouping_sets_sum``): per-(source,lang), per-source,
    per-lang and grand totals with SQL's GROUPING() bitmask — block-local
    replicate + pre-collapse, one hashpart grouped sum; the exchange
    carries per-set partials, never replicated rows."""
    from ...stages.cube import grouping_sets_sum

    ds = _read_parquet_clean(
        f"{sf_dir}/documents.parquet",
        columns=["source", "lang", "n_chars"]).repartition(4)
    return grouping_sets_sum(
        ds, keys=["source", "lang"],
        sets=[("source", "lang"), ("source",), ("lang",), ()],
        sum_cols=["n_chars"], count_col="n_docs", num_partitions=4)


CUBE_SQL = """
SELECT source, lang, CAST(GROUPING(source, lang) AS BIGINT) AS gid,
       CAST(sum(n_chars) AS BIGINT) AS n_chars,
       count(*) AS n_docs
FROM documents
GROUP BY CUBE (source, lang)
"""


def q_table_checksum_events(sf_dir: str):
    """Order-independent per-series table digests
    (``stages/integrity.py:grouped_checksum``): the anti-entropy /
    replica-verification primitive — (n, sum-hash mod 2^61-1, xor-hash)
    per event_type, identical on ANY row order or partitioning.
    Block-local partial digests, one constant-size hashpart shuffle."""
    from ...stages.integrity import grouped_checksum

    ds = _read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "event_type", "value"]).repartition(8)

    def _cols(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": b["event_type"],
            "event_id": b["event_id"],
            "ts_us": pc.cast(b["ts"], pa.int64()),
            "cents": pc.cast(pc.round(pc.multiply(b["value"], 100.0),
                                      ndigits=0), pa.int64()),
        })

    return grouped_checksum(ds.map_batches(_cols, batch_format="pyarrow"),
                            key_col="event_type",
                            cols=["event_id", "ts_us", "cents"],
                            salt=5, num_partitions=4)


def _table_checksum_sql() -> str:
    from ...stages.integrity import fold_sql
    from ...stages.sampling import MOD61

    h = fold_sql(["event_id", "ts_us", "cents"], salt=5)
    m = MOD61
    return f"""
WITH e AS (
    SELECT event_type, event_id, epoch_us(ts) AS ts_us,
           CAST(round(value * 100) AS BIGINT) AS cents
    FROM events
),
d AS (SELECT event_type, CAST({h} AS BIGINT) AS h FROM e)
SELECT event_type AS series_id, count(*) AS n,
       CAST(((sum(CAST(h // 4294967296 AS HUGEINT)) % {m})
             * 4294967296::HUGEINT % {m}
             + (sum(CAST(h % 4294967296 AS HUGEINT)) % {m})) % {m}
            AS BIGINT) AS checksum_sum,
       bit_xor(h) AS checksum_xor
FROM d GROUP BY 1
"""


TABLE_CHECKSUM_SQL = _table_checksum_sql()


def q_event_transitions(sf_dir: str):
    """Per-user behavior bigrams (``stages/funnel.py:event_transitions``):
    the Markov transition matrix of adjacent event types per user —
    one hash(user) shuffle + sorted vectorized pass, bigram cells (not
    events) in the second exchange."""
    from ...stages.funnel import event_transitions

    ds = _read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"]).repartition(8)

    def _cols(b: pa.Table) -> pa.Table:
        return pa.table({"user_id": b["user_id"],
                         "event_type": b["event_type"],
                         "event_id": b["event_id"],
                         "ts_us": pc.cast(b["ts"], pa.int64())})

    return event_transitions(ds.map_batches(_cols, batch_format="pyarrow"),
                             num_partitions=4, fanin=2)


EVENT_TRANSITIONS_SQL = """
WITH e AS (
    SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us
    FROM events
),
s AS (
    SELECT user_id, event_type,
           lag(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts_us, event_id) AS prev
    FROM e
)
SELECT prev AS src, event_type AS dst, count(*) AS c
FROM s WHERE prev IS NOT NULL
GROUP BY 1, 2
"""


def q_bloom_semi_join(sf_dir: str):
    """Bloom runtime-filter semi-join (``stages/bloom.py``): lineitem
    pruned map-side by a 2048-bit bloom over URGENT orders' keys (the
    big table never shuffles on the filter), survivors confirmed by ONE
    hash-partitioned left join — false positives kept and flagged, so
    the exact bloom behavior (bit pattern included) is hash-verified."""
    from ...stages.bloom import bloom_semi_join

    orders = _read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority"]).repartition(4)
    urgent = orders.filter(
        expr="o_orderpriority == '1-URGENT'").map_batches(
        lambda b: pa.table({"o_orderkey": b["o_orderkey"]}),
        batch_format="pyarrow")
    li = _read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber"]).repartition(4)
    out = bloom_semi_join(li, urgent, key_col="l_orderkey",
                          small_key_col="o_orderkey",
                          m_bits=2048, k=3, num_partitions=4)
    return out.map_batches(
        lambda b: b.select(["l_orderkey", "l_linenumber", "is_member"]),
        batch_format="pyarrow")


def _bloom_sql(m_bits: int = 2048, k: int = 3) -> str:
    from ...stages.sampling import hash61_sql

    pos_union = "\n        UNION ALL\n        ".join(
        f"SELECT CAST({hash61_sql('key', r)} % {m_bits} AS BIGINT) AS pos "
        f"FROM sk"
        for r in range(k))
    probe_conds = "\n      AND ".join(
        f"CAST({hash61_sql('l_orderkey', r)} % {m_bits} AS BIGINT)"
        f" IN (SELECT pos FROM bits)"
        for r in range(k))
    return f"""
WITH sk AS (
    SELECT DISTINCT o_orderkey AS key FROM orders
    WHERE o_orderpriority = '1-URGENT'
),
bits AS (
    SELECT DISTINCT pos FROM (
        {pos_union}
    )
),
probe AS (
    SELECT l_orderkey, l_linenumber FROM lineitem
    WHERE {probe_conds}
)
SELECT l_orderkey, l_linenumber,
       CAST(l_orderkey IN (SELECT key FROM sk) AS BIGINT) AS is_member
FROM probe
"""


BLOOM_SQL = _bloom_sql()


def q_triangle_counts_docs(sf_dir: str):
    """Per-node triangle counts over the deterministic doc link graph
    (``stages/graph.py:triangle_counts``): canonical-edge distinct, one
    self-join on the middle vertex (wedges), one composite-key join to
    close, hashpart per-node counts — exact enumeration, each triangle
    found once."""
    import pyarrow.parquet as _pq

    from ...stages.graph import triangle_counts

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
    return triangle_counts(edges, num_partitions=4, fanin=4)


TRIANGLES_SQL = """
WITH nn AS (SELECT count(*) AS n FROM documents),
e0 AS (
    SELECT doc_id AS src, (doc_id * 31 + 97) % (SELECT n FROM nn) AS dst
    FROM documents
    UNION ALL
    SELECT doc_id, (doc_id * 31 + 194) % (SELECT n FROM nn)
    FROM documents
    UNION ALL
    SELECT doc_id, (doc_id * 31 + 291) % (SELECT n FROM nn)
    FROM documents
),
e AS (
    SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
    FROM e0 WHERE src <> dst
),
w AS (
    SELECT e1.a, e1.b, e2.b AS c
    FROM e e1 JOIN e e2 ON e1.b = e2.a
),
t AS (
    SELECT w.a, w.b, w.c
    FROM w JOIN e e3 ON e3.a = w.a AND e3.b = w.c
),
v AS (
    SELECT a AS doc_id FROM t
    UNION ALL SELECT b FROM t
    UNION ALL SELECT c FROM t
)
SELECT doc_id, count(*) AS n_triangles FROM v GROUP BY doc_id
"""


def q_training_order_docs(sf_dir: str):
    """Deterministic global shuffle order for a training epoch
    (``stages/ordering.py:training_order``): rank by the salted
    GF(2^61-1) hash — hash-range bucketing + a broadcast prefix sum, no
    global sort barrier. Same hash family as sampling/splits, so the
    whole data-prep story derives from one reproducible permutation."""
    from ...stages.ordering import training_order

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id"]).repartition(8)
    return training_order(ds, salt=41, num_buckets=64)


def _training_order_sql() -> str:
    from ...stages.sampling import hash61_sql

    h = hash61_sql("doc_id", 41)
    return f"""
SELECT doc_id,
       row_number() OVER (ORDER BY {h}, doc_id) - 1 AS shuffle_rank
FROM documents
"""


TRAINING_ORDER_SQL = _training_order_sql()


def q_url_blocklist_docs(sf_dir: str):
    """URL/domain blocklist filtering — the first gate of every web
    pipeline: a (broadcast) blocklist of domains, pages dropped by
    membership, per-domain kept/blocked counts. The blocklist is
    deterministic (src index % 7 == 3) so the SQL oracle rebuilds it;
    the filter is one vectorized ``is_in`` per block, no shuffle until
    the tiny count aggregate."""
    from ...stages.graph import grouped_sum_parts

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "source"]).repartition(4)

    # membership is computed from the source INDEX (idx % 7 == 3) on
    # both sides — a frozen range(20) set would silently diverge from
    # the SQL oracle if the corpus ever grew more sources
    def _flag(b: pa.Table) -> pa.Table:
        idx = pc.cast(pc.utf8_slice_codeunits(b["source"], 3, 2 ** 30),
                      pa.int64())
        hit = pc.equal(pc.subtract(idx, pc.multiply(
            pc.divide(idx, pa.scalar(7, pa.int64())),
            pa.scalar(7, pa.int64()))), pa.scalar(3, pa.int64()))
        return pa.table({"source": b["source"],
                         "blocked": pc.cast(hit, pa.int64())})

    return grouped_sum_parts(
        ds.map_batches(_flag, batch_format="pyarrow"),
        ["source"], ["blocked"], count_col="n_docs", fanin=2)


URL_BLOCKLIST_SQL = """
SELECT source,
       CAST(sum(CASE WHEN CAST(substr(source, 4) AS BIGINT) % 7 = 3
                     THEN 1 ELSE 0 END) AS BIGINT) AS blocked,
       count(*) AS n_docs
FROM documents
GROUP BY source
"""


def q_embedding_near_dups_exact(sf_dir: str):
    """The hash-verifiable ANN pipeline
    (``stages/similarity.py:embedding_near_dup_pairs_exact``): identical
    distributed shape to the float LSH near-dup (band shuffle of id-only
    rows, partitioned pair distinct, partitioned vector re-join) but
    all-integer — quantized components, deterministic +-1 hyperplanes,
    bit-packed band keys, exact cross-multiplied cosine threshold — so
    the ENTIRE pipeline, recall behavior included, replays in SQL."""
    from ...stages.similarity import (embedding_matrix,
                                     embedding_near_dup_pairs_exact)

    ds = _read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding"]).repartition(4)

    # the synthetic embeddings are near-orthogonal (max pair cosine
    # ~0.48), so plant deterministic near-dups: every 10th vector gets a
    # copy at id+1000000 scaled by 0.875 (exact in binary FP) with the
    # d=0 component sign-flipped — cosine just under 1, LSH signs mostly
    # preserved; the SQL oracle rebuilds the same augmentation
    def _augment(b: pa.Table) -> pa.Table:
        ids = b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        E = embedding_matrix(b).astype(np.float32)
        sel = ids % 10 == 0
        P = (E[sel].astype(np.float64) * 0.875)
        P[:, 0] = -P[:, 0]
        all_ids = np.concatenate([ids, ids[sel] + 1_000_000])
        allE = np.concatenate([E.astype(np.float64),
                               P]).astype(np.float32)
        flat = pa.array(allE.ravel())
        off = pa.array(np.arange(0, (len(allE) + 1) * allE.shape[1],
                                 allE.shape[1], dtype=np.int32))
        return pa.table({"vec_id": pa.array(all_ids),
                         "embedding": pa.ListArray.from_arrays(off, flat)})

    aug = ds.map_batches(_augment, batch_format="pyarrow")
    return embedding_near_dup_pairs_exact(aug, tau_num=4, tau_den=5,
                                          planes=64, bands=8,
                                          num_partitions=4)


EMBEDDING_EXACT_SQL = """
WITH q0 AS (
    SELECT vec_id,
           generate_subscripts(embedding, 1) - 1 AS d,
           unnest(embedding) AS x
    FROM embeddings
),
q AS (
    SELECT vec_id, d,
           CAST(trunc(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS qv
    FROM q0
    UNION ALL
    SELECT vec_id + 1000000 AS vec_id, d,
           CAST(trunc(CAST(CAST(
               CASE WHEN d = 0 THEN -0.875 * CAST(x AS DOUBLE)
                    ELSE 0.875 * CAST(x AS DOUBLE) END
               AS FLOAT) AS DOUBLE) * 1000000) AS BIGINT) AS qv
    FROM q0 WHERE vec_id % 10 = 0
),
ks AS (SELECT unnest(range(64)) AS k),
dots AS (
    SELECT q.vec_id, ks.k,
           sum(q.qv * (1 - 2 * (((ks.k * 73856093 + q.d * 19349663) % 97)
                                % 2))) AS s
    FROM q CROSS JOIN ks
    GROUP BY q.vec_id, ks.k
),
keys AS (
    SELECT vec_id, k // 8 AS band,
           CAST(sum(CASE WHEN s > 0
                         THEN (CAST(1 AS BIGINT) << (k % 8))
                         ELSE 0 END) AS BIGINT) AS key
    FROM dots GROUP BY vec_id, band
),
cand AS (
    SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
    FROM keys x JOIN keys y
      ON x.band = y.band AND x.key = y.key AND x.vec_id < y.vec_id
),
norms AS (
    SELECT vec_id, CAST(sum(qv * qv) AS HUGEINT) AS n2
    FROM q GROUP BY vec_id
),
pd AS (
    SELECT c.a, c.b, CAST(sum(qa.qv * qb.qv) AS HUGEINT) AS dab
    FROM cand c
    JOIN q qa ON qa.vec_id = c.a
    JOIN q qb ON qb.vec_id = c.b AND qb.d = qa.d
    GROUP BY c.a, c.b
)
SELECT pd.a, pd.b,
       CAST(pd.dab AS BIGINT) AS dot_ab,
       CAST(na.n2 AS BIGINT) AS norm2_a,
       CAST(nb.n2 AS BIGINT) AS norm2_b
FROM pd
JOIN norms na ON na.vec_id = pd.a
JOIN norms nb ON nb.vec_id = pd.b
WHERE pd.dab > 0
  AND 25 * pd.dab * pd.dab >= 16 * na.n2 * nb.n2
"""


def q_domain_cap_docs(sf_dir: str):
    """Per-domain frequency cap (``stages/curation.py:cap_per_group``):
    keep each source's top-3 docs by (n_chars DESC, doc_id) — the
    FineWeb-style over-represented-domain lever; kept rows carry their
    in-group rank for auditability."""
    from ...stages.curation import cap_per_group

    ds = _read_parquet_clean(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "source", "n_chars"]).repartition(4)
    return cap_per_group(ds, group_col="source", k=3,
                         order_col="n_chars", tiebreak_col="doc_id",
                         num_partitions=2)


DOMAIN_CAP_SQL = """
WITH o AS (
    SELECT doc_id, source, n_chars,
           row_number() OVER (PARTITION BY source
                              ORDER BY n_chars DESC, doc_id) - 1 AS rk
    FROM documents
)
SELECT doc_id, source, n_chars, rk FROM o WHERE rk < 3
"""


def q_mixture_order_docs(sf_dir: str):
    """Deterministic weighted mixture schedule
    (``stages/curation.py:mixture_order``): src0 at weight 4, src1 at 2,
    the rest at 1 — order key = (rank_in_source + 1) * (lcm / weight),
    integer stride scheduling over the salted-hash within-source
    shuffle; sorting by (mix_key, source, doc_id) IS the training
    order."""
    from ...stages.curation import mixture_order

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "source"]).repartition(4)
    return mixture_order(ds, {"src0": 4, "src1": 2}, salt=13,
                         num_partitions=2)


def _mixture_order_sql() -> str:
    from ...stages.sampling import hash61_sql

    h = hash61_sql("doc_id", 13)
    return f"""
WITH r AS (
    SELECT doc_id, source,
           row_number() OVER (PARTITION BY source
                              ORDER BY {h}, doc_id) - 1 AS rk
    FROM documents
)
SELECT doc_id, source,
       (rk + 1) * CASE source WHEN 'src0' THEN 1
                              WHEN 'src1' THEN 2
                              ELSE 4 END AS mix_key,
       rk
FROM r
"""


MIXTURE_ORDER_SQL = _mixture_order_sql()


def q_gap_profile_events(sf_dir: str):
    """Per-series inter-arrival heartbeat profile
    (``stages/rate.py:gap_profile``): one hash(event_type) shuffle, then
    vectorized segment reductions over the sorted deltas — n_events,
    n_gaps, min/max/sum gap, pinned-IEEE mean, and an SLA counter of
    gaps > 120 s. Single-event series yield null min/max/mean."""
    from ...stages.rate import gap_profile

    ds = _read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "event_type"]).repartition(8)

    def _cols(b: pa.Table) -> pa.Table:
        return pa.table({
            "series_id": b["event_type"],
            "x": pc.cast(b["ts"], pa.int64()),
            "event_id": b["event_id"],
        })

    return gap_profile(ds.map_batches(_cols, batch_format="pyarrow"),
                       over_us=120 * US, id_col="event_id",
                       num_partitions=4)


GAP_PROFILE_SQL = f"""
WITH e AS (
    SELECT event_type AS series_id, epoch_us(ts) AS ts_us, event_id
    FROM events
),
d AS (
    SELECT series_id,
           ts_us - lag(ts_us) OVER (PARTITION BY series_id
                                    ORDER BY ts_us, event_id) AS gap
    FROM e
)
SELECT series_id,
       count(*) AS n_events,
       count(gap) AS n_gaps,
       min(gap) AS min_gap_us,
       max(gap) AS max_gap_us,
       CAST(coalesce(sum(gap), 0) AS BIGINT) AS sum_gap_us,
       CASE WHEN count(gap) > 0
            THEN CAST(sum(gap) AS DOUBLE) / count(gap) END AS mean_gap_us,
       CAST(coalesce(sum(CASE WHEN gap > {120 * US} THEN 1 END), 0)
            AS BIGINT) AS n_gaps_over
FROM d GROUP BY series_id
"""


def q_purchase_impact_events(sf_dir: str):
    """Temporal overlap join without an equi-key
    (``stages/joins.py:interval_count_join``): for every 'error' event's
    30-minute impact window, count 'purchase' events inside it and sum
    their integer cents. Grid-bucketed — both sides shuffle ONCE on the
    30-minute time cell, each interval touches <= 2 cells, matching is
    two searchsorted probes against a prefix-sum. LEFT-join semantics:
    zero-purchase windows report 0/0."""
    from ...stages.joins import interval_count_join

    win = 1800 * US
    ev = _read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "event_type", "value"]).repartition(8)

    def _pts(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["event_type"], "purchase"))
        return pa.table({
            "x": pc.cast(b["ts"], pa.int64()),
            "cv": pc.cast(pc.round(pc.multiply(b["value"], 100.0),
                                   ndigits=0), pa.int64()),
        })

    def _ivls(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["event_type"], "error"))
        ts = pc.cast(b["ts"], pa.int64())
        return pa.table({
            "ivl_id": b["event_id"],
            "start_us": ts,
            "end_us": pc.add(ts, win),
        })

    pts = ev.map_batches(_pts, batch_format="pyarrow")
    ivls = ev.map_batches(_ivls, batch_format="pyarrow")
    return interval_count_join(pts, ivls, cell_us=win, val_col="cv",
                               num_partitions=8)


PURCHASE_IMPACT_SQL = f"""
WITH p AS (
    SELECT epoch_us(ts) AS x,
           CAST(round(value * 100) AS BIGINT) AS cv
    FROM events WHERE event_type = 'purchase'
),
iv AS (
    SELECT event_id AS ivl_id, epoch_us(ts) AS start_us,
           epoch_us(ts) + {1800 * US} AS end_us
    FROM events WHERE event_type = 'error'
)
SELECT iv.ivl_id, iv.start_us, iv.end_us,
       count(p.x) AS n_points,
       CAST(coalesce(sum(p.cv), 0) AS BIGINT) AS sum_val
FROM iv LEFT JOIN p ON p.x BETWEEN iv.start_us AND iv.end_us
GROUP BY 1, 2, 3
"""


def q_activity_coverage_events(sf_dir: str):
    """Interval union / coverage (``stages/intervals.py:interval_union``):
    every event opens a 10-minute activity window ``[ts, ts+600s)``;
    per user, merge overlapping-or-touching windows into islands and
    report total covered time, island count, and the longest island.
    One hash(user) shuffle + a single reset-free sweep-line pass."""
    from ...stages.intervals import interval_union

    w = 600 * US
    ev = _read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts"]).repartition(8)

    def _ivls(b: pa.Table) -> pa.Table:
        ts = pc.cast(b["ts"], pa.int64())
        return pa.table({
            "series_id": b["user_id"],
            "start_us": ts,
            "end_us": pc.add(ts, w),
        })

    return interval_union(ev.map_batches(_ivls, batch_format="pyarrow"),
                          num_partitions=8)


ACTIVITY_COVERAGE_SQL = f"""
WITH iv AS (
    SELECT user_id AS series_id, epoch_us(ts) AS s,
           epoch_us(ts) + {600 * US} AS e
    FROM events
),
m AS (
    SELECT series_id, s, e,
           max(e) OVER (PARTITION BY series_id ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_max
    FROM iv
),
g AS (
    SELECT series_id, s, e,
           CASE WHEN prev_max IS NULL OR s > prev_max
                THEN 1 ELSE 0 END AS brk
    FROM m
),
isl AS (
    SELECT series_id, s, e,
           sum(brk) OVER (PARTITION BY series_id ORDER BY s, e
                          ROWS UNBOUNDED PRECEDING) AS island
    FROM g
),
a AS (
    SELECT series_id, island, min(s) AS i_s, max(e) AS i_e,
           count(*) AS n_iv
    FROM isl GROUP BY 1, 2
)
SELECT series_id,
       CAST(sum(n_iv) AS BIGINT) AS n_intervals,
       count(*) AS n_islands,
       CAST(sum(i_e - i_s) AS BIGINT) AS covered_us,
       CAST(max(i_e - i_s) AS BIGINT) AS max_island_us
FROM a GROUP BY 1
"""


def q_skyline_orders(sf_dir: str):
    """2-D Pareto skyline (``stages/skyline.py:skyline2d``): the orders no
    other order beats on BOTH recency and total price — grid-bucketed by
    order-date day, per-cell max broadcast as an exclusive suffix
    threshold, one cell-hash shuffle, vectorized frontier scan."""
    from ...stages.skyline import skyline2d

    ds = _read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_totalprice"]).repartition(8)

    def _cols(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": b["o_orderkey"],
            "order_date_us": pc.cast(b["o_orderdate"], pa.int64()),
            "price_cents": pc.cast(
                pc.round(pc.multiply(b["o_totalprice"], 100.0), ndigits=0),
                pa.int64()),
        })

    return skyline2d(ds.map_batches(_cols, batch_format="pyarrow"),
                     x_col="order_date_us", y_col="price_cents",
                     cell_w=86_400 * US, num_partitions=8)


SKYLINE_ORDERS_SQL = """
WITH w AS (
    SELECT o_orderkey, epoch_us(o_orderdate) AS order_date_us,
           CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
    FROM orders
),
s AS (
    SELECT order_date_us, max(price_cents) AS mp
    FROM w GROUP BY order_date_us
),
suf AS (
    SELECT order_date_us, mp,
           max(mp) OVER (ORDER BY order_date_us DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS best_above
    FROM s
)
SELECT w.o_orderkey, w.order_date_us, w.price_cents
FROM w JOIN suf USING (order_date_us)
WHERE w.price_cents = suf.mp
  AND (suf.best_above IS NULL OR w.price_cents > suf.best_above)
"""


def q_streaks_events(sf_dir: str):
    """Monotone streak profile (``stages/diffing.py:streak_profile``):
    per event_type, the longest strictly-increasing / decreasing / flat
    run of integer-cents values ordered by (ts, event_id), plus the run
    count. One hash shuffle + one sorted vectorized pass."""
    from ...stages.diffing import streak_profile

    ds = _read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "event_type", "value"]).repartition(8)

    def _cols(b: pa.Table) -> pa.Table:
        return pa.table({
            "series_id": b["event_type"],
            "x": pc.cast(b["ts"], pa.int64()),
            "event_id": b["event_id"],
            "y": pc.cast(pc.round(pc.multiply(b["value"], 100.0),
                                  ndigits=0), pa.int64()),
        })

    return streak_profile(ds.map_batches(_cols, batch_format="pyarrow"),
                          id_col="event_id", num_partitions=4)


STREAKS_SQL = """
WITH e AS (
    SELECT event_type AS sid, epoch_us(ts) AS x, event_id AS id,
           CAST(round(value * 100) AS BIGINT) AS y
    FROM events
),
o AS (
    SELECT sid, y, lag(y) OVER w AS py,
           row_number() OVER w AS rn
    FROM e WINDOW w AS (PARTITION BY sid ORDER BY x, id)
),
s AS (
    SELECT sid, rn,
           CASE WHEN y > py THEN 1 WHEN y < py THEN -1 ELSE 0 END AS dir
    FROM o WHERE py IS NOT NULL
),
b AS (
    SELECT sid, rn, dir,
           CASE WHEN lag(dir) OVER (PARTITION BY sid ORDER BY rn)
                     IS DISTINCT FROM dir THEN 1 ELSE 0 END AS brk
    FROM s
),
r AS (
    SELECT sid, dir,
           sum(brk) OVER (PARTITION BY sid ORDER BY rn) AS run_id
    FROM b
),
l AS (
    SELECT sid, dir, run_id, count(*) AS len
    FROM r GROUP BY 1, 2, 3
)
SELECT sid AS series_id,
       CAST(coalesce(max(len) FILTER (WHERE dir = 1), 0) AS BIGINT)
           AS max_up_steps,
       CAST(coalesce(max(len) FILTER (WHERE dir = -1), 0) AS BIGINT)
           AS max_down_steps,
       CAST(coalesce(max(len) FILTER (WHERE dir = 0), 0) AS BIGINT)
           AS max_flat_steps,
       count(*) AS n_runs
FROM l GROUP BY 1
"""


def q_calendar_rollup_month(sf_dir: str):
    """Calendar-aware rollup: months are NOT fixed-width, so x is
    truncated to its month start (``pc.floor_temporal``, == DuckDB
    ``date_trunc('month', …)``) and the standard tier-0 rollup runs with
    ``window_us=1`` — the bucket IS the month-start epoch. Monthly order
    totals per priority class."""
    ds = _read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderpriority", "o_orderdate",
                 "o_totalprice"]).repartition(8)

    def _cols(b: pa.Table) -> pa.Table:
        month = pc.floor_temporal(b["o_orderdate"], unit="month")
        return pa.table({
            "series_id": b["o_orderpriority"],
            "x": pc.cast(month, pa.int64()),
            "y": pc.cast(pc.round(pc.multiply(b["o_totalprice"], 100.0),
                                  ndigits=0), pa.int64()),
        })

    return finalize_mean(
        rollup(ds.map_batches(_cols, batch_format="pyarrow"), 1))


CALENDAR_ROLLUP_SQL = """
WITH o AS (
    SELECT o_orderpriority AS series_id,
           epoch_us(date_trunc('month', o_orderdate)) AS bucket,
           CAST(round(o_totalprice * 100) AS BIGINT) AS y
    FROM orders
)
SELECT series_id, bucket, min(y) AS min_y, max(y) AS max_y,
       CAST(sum(y) AS BIGINT) AS sum_y, count(*) AS n,
       CAST(sum(y) AS DOUBLE) / count(*) AS mean_y
FROM o GROUP BY 1, 2
"""


def q_anti_join_lineitems(sf_dir: str):
    """Exact distributed anti-join (``stages/joins.py:anti_join``):
    lineitems whose order is NOT open ('O') — the exact complement of the
    Bloom semi-join, with full left payload and no broadcast. Right side
    reduces to distinct keys map-side; one hash(key) shuffle; bincount
    membership."""
    from ...stages.joins import anti_join

    li = _read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber",
                 "l_returnflag"]).repartition(8)
    orders = _read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderstatus"]).repartition(8)

    def _open(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["o_orderstatus"], "O"))
        return pa.table({"l_orderkey": b["o_orderkey"]})

    right = orders.map_batches(_open, batch_format="pyarrow")
    out = anti_join(li, right, on="l_orderkey", num_partitions=8)

    def _cast(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": b["l_orderkey"],
            "l_linenumber": pc.cast(b["l_linenumber"], pa.int64()),
            "l_returnflag": b["l_returnflag"],
        })

    return out.map_batches(_cast, batch_format="pyarrow")


ANTI_JOIN_SQL = """
SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
       l_returnflag
FROM lineitem l
WHERE NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_orderkey = l.l_orderkey AND o.o_orderstatus = 'O'
)
"""


def q_group_samples_docs(sf_dir: str):
    """Capped ordered string aggregation
    (``stages/ordering.py:group_concat``): per (lang, source) group, the
    first 3 doc ids (lexical string order on both sides), comma-joined,
    plus the group's total count. One hash(group) shuffle; ListArray +
    binary_join, never a group's full membership in one string."""
    from ...stages.ordering import group_concat

    ds = _read_parquet_clean(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "lang", "source"]).repartition(8)

    def _cols(b: pa.Table) -> pa.Table:
        return pa.table({
            "g": pc.binary_join_element_wise(b["lang"], b["source"], "|"),
            "doc_id": b["doc_id"],
        })

    return group_concat(ds.map_batches(_cols, batch_format="pyarrow"),
                        group_col="g", val_col="doc_id", k=3,
                        num_partitions=4)


GROUP_SAMPLES_SQL = """
WITH d AS (
    SELECT lang || '|' || source AS g, CAST(doc_id AS VARCHAR) AS v
    FROM documents
),
c AS (SELECT g, count(*) AS n FROM d GROUP BY g),
r AS (
    SELECT g, v,
           row_number() OVER (PARTITION BY g ORDER BY v) AS rn
    FROM d
),
s AS (
    SELECT g, string_agg(v, ',' ORDER BY v) AS sample
    FROM r WHERE rn <= 3 GROUP BY g
)
SELECT c.g AS group_id, c.n, s.sample
FROM c JOIN s USING (g)
"""


def q_ols_slope_1h(sf_dir: str):
    """Per-(event_type, 1h bucket) OLS trend slope in exact rational form
    (``stages/correlate.py:ols_slope``): integer sufficient statistics
    (t = seconds since bucket start, y = cents), pure mergeable sums,
    one hashpart shuffle; slope_num/slope_den exact, slope the pinned
    IEEE quotient."""
    from ...stages.correlate import ols_slope

    ds = _read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["ts", "event_type", "value"]).repartition(8)

    def _cols(b: pa.Table) -> pa.Table:
        return pa.table({
            "series_id": b["event_type"],
            "x": pc.cast(b["ts"], pa.int64()),
            "y": pc.cast(pc.round(pc.multiply(b["value"], 100.0),
                                  ndigits=0), pa.int64()),
        })

    return ols_slope(ds.map_batches(_cols, batch_format="pyarrow"),
                     3600 * US, fanin=4)


OLS_SLOPE_SQL = f"""
WITH e AS (
    SELECT event_type AS series_id,
           (epoch_us(ts) // {3600 * US}) * {3600 * US} AS bucket,
           (epoch_us(ts) % {3600 * US}) // {US} AS t,
           CAST(round(value * 100) AS BIGINT) AS y
    FROM events
),
s AS (
    SELECT series_id, bucket, count(*) AS n,
           CAST(sum(t) AS BIGINT) AS st,
           CAST(sum(y) AS BIGINT) AS sy,
           CAST(sum(t * y) AS BIGINT) AS sty,
           CAST(sum(t * t) AS BIGINT) AS stt
    FROM e GROUP BY 1, 2
)
SELECT series_id, bucket, n,
       n * sty - st * sy AS slope_num,
       n * stt - st * st AS slope_den,
       CASE WHEN n * stt - st * st > 0
            THEN CAST(n * sty - st * sy AS DOUBLE)
                 / (n * stt - st * st) END AS slope
FROM s
"""


def q_weighted_median_lineitem(sf_dir: str):
    """Exact weighted lower median
    (``stages/quantiles.py:weighted_median``): per return flag, the
    extended price (cents) at which half the shipped QUANTITY sits below
    — one hash(key) shuffle, grouped-weight collapse, reset-by-base
    cumulative weights, reduceat crossing pick."""
    from ...stages.quantiles import weighted_median

    ds = _read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_extendedprice",
                 "l_quantity"]).repartition(8)

    def _cols(b: pa.Table) -> pa.Table:
        return pa.table({
            "series_id": b["l_returnflag"],
            "y": pc.cast(pc.round(pc.multiply(b["l_extendedprice"], 100.0),
                                  ndigits=0), pa.int64()),
            "w": pc.cast(pc.round(b["l_quantity"], ndigits=0), pa.int64()),
        })

    return weighted_median(ds.map_batches(_cols, batch_format="pyarrow"),
                           num_partitions=4)


WEIGHTED_MEDIAN_SQL = """
WITH l AS (
    SELECT l_returnflag AS k,
           CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
           CAST(round(l_quantity) AS BIGINT) AS w
    FROM lineitem
),
c AS (
    SELECT k, v, CAST(sum(w) AS BIGINT) AS wv
    FROM l WHERE w > 0 GROUP BY 1, 2
),
a AS (
    SELECT k, v,
           CAST(sum(wv) OVER (PARTITION BY k ORDER BY v) AS BIGINT) AS cw,
           CAST(sum(wv) OVER (PARTITION BY k) AS BIGINT) AS tw
    FROM c
)
SELECT k AS series_id,
       CAST(max(tw) AS BIGINT) AS total_w,
       CAST(min(CASE WHEN 2 * cw >= tw THEN v END) AS BIGINT) AS wmedian
FROM a GROUP BY 1
"""




def q_zone_map_prune_events(sf_dir: str):
    """Zone-map pruning audit over the z-ordered events layout
    (``stages/zorder.py:zone_map_prune``): for the rectangular predicate
    user_id%256 in [32, 96] AND hour%256 in [8, 16], which of the 16
    z-partitions a manifest-aware scan touches and the exact per-
    partition match counts; pruning soundness (matches => scanned) is
    asserted inside the task."""
    from ...stages.zorder import zone_map_prune

    ds = _read_parquet_clean(f"{sf_dir}/events.parquet",
                             columns=["user_id", "ts"]).repartition(8)

    def _dims(b: pa.Table) -> pa.Table:
        ts_us = pc.cast(b["ts"], pa.int64())
        hour = pc.divide(ts_us, pa.scalar(3_600_000_000, pa.int64()))
        return pa.table({"d0": b["user_id"], "d1": hour})

    return zone_map_prune(ds.map_batches(_dims, batch_format="pyarrow"),
                          d0_col="d0", d1_col="d1",
                          lo0=32, hi0=96, lo1=8, hi1=16,
                          bits=8, parts_log2=4, num_partitions=2)


def _zone_prune_sql(bits: int = 8, parts_log2: int = 4,
                    lo0: int = 32, hi0: int = 96,
                    lo1: int = 8, hi1: int = 16) -> str:
    from ...stages.zorder import spread16_sql

    m = (1 << bits) - 1
    z = f"({spread16_sql('d0')} | ({spread16_sql('d1')} << 1))"
    return f"""
WITH e AS (
    SELECT user_id % {m + 1} AS d0,
           (epoch_us(ts) // 3600000000) % {m + 1} AS d1
    FROM events
),
z AS (SELECT d0, d1, {z} AS zcode FROM e),
zm AS (
    SELECT zcode >> {2 * bits - parts_log2} AS p,
           CAST(count(*) AS BIGINT) AS n,
           min(d0) AS min_d0, max(d0) AS max_d0,
           min(d1) AS min_d1, max(d1) AS max_d1
    FROM z GROUP BY 1
),
mt AS (
    SELECT zcode >> {2 * bits - parts_log2} AS p,
           CAST(count(*) AS BIGINT) AS matched
    FROM z
    WHERE d0 BETWEEN {lo0} AND {hi0} AND d1 BETWEEN {lo1} AND {hi1}
    GROUP BY 1
)
SELECT zm.p, zm.n,
       CAST(zm.max_d0 >= {lo0} AND zm.min_d0 <= {hi0}
            AND zm.max_d1 >= {lo1} AND zm.min_d1 <= {hi1}
            AS BIGINT) AS scanned,
       CAST(coalesce(mt.matched, 0) AS BIGINT) AS matched
FROM zm LEFT JOIN mt ON mt.p = zm.p
"""


ZONE_PRUNE_SQL = _zone_prune_sql()
