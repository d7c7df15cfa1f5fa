"""SAX, rank/nonparametric tests, embedding covariance/RRF/centroid/prune/mutual-NN, seasonal decompose, drift, TPC-H locals.

Split from the former pipelines/queries.py monolith (r4 verdict
next-round #5); statement order inside this module is the original
file order. Explicit cross-module imports are generated: backward
dependencies at the top, forward (function-body-only) dependencies at
the bottom so package import order stays acyclic.
"""
from __future__ import annotations

from ._shared import US, W1H, _read_parquet_clean, np, pa, pc
from .downsample_core import _events_cents

def q_sax_events(sf_dir: str):
    """SAX symbolic representation (``stages/sax.py:sax_symbols``): each
    event_type's cents series PAA-reduced over 2-day windows, each
    segment mean mapped to an a–d range-quartile symbol by exact integer
    cross-multiplication, strings assembled zero-copy."""
    from ...stages.sax import sax_symbols

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

    return sax_symbols(ds.map_batches(_cols, batch_format="pyarrow"),
                       2 * 86_400 * US, alphabet=4, num_partitions=4)


SAX_SQL = f"""
WITH e AS (
    SELECT event_type AS sid, epoch_us(ts) AS x,
           CAST(round(value * 100) AS BIGINT) AS y
    FROM events
),
g AS (SELECT sid, min(y) AS gmin, max(y) AS gmax FROM e GROUP BY 1),
seg AS (
    SELECT sid, (x // {2 * 86_400 * US}) * {2 * 86_400 * US} AS bucket,
           CAST(sum(y) AS BIGINT) AS s, count(*) AS n
    FROM e GROUP BY 1, 2
),
sym AS (
    SELECT seg.sid, bucket,
           (CASE WHEN 4 * s >= (4 * gmin + 1 * (gmax - gmin)) * n
                 THEN 1 ELSE 0 END
          + CASE WHEN 4 * s >= (4 * gmin + 2 * (gmax - gmin)) * n
                 THEN 1 ELSE 0 END
          + CASE WHEN 4 * s >= (4 * gmin + 3 * (gmax - gmin)) * n
                 THEN 1 ELSE 0 END) AS q
    FROM seg JOIN g ON seg.sid = g.sid
)
SELECT sid AS series_id, count(*) AS n_segments,
       string_agg(chr(97 + q), '' ORDER BY bucket) AS sax
FROM sym GROUP BY 1
"""


def q_gini_orders(sf_dir: str):
    """Exact pairwise dispersion / Gini concentration
    (``stages/quantiles.py:gini_dispersion``): per order priority, the
    total |price_i − price_j| over all pairs via the sorted closed form
    Σ(2i−n−1)·v — O(n log n), one hash shuffle, never the quadratic
    expansion; Gini = total / (n·sum)."""
    from ...stages.quantiles import gini_dispersion

    ds = _read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderpriority", "o_totalprice"]).repartition(8)

    def _cols(b: pa.Table) -> pa.Table:
        return pa.table({
            "series_id": b["o_orderpriority"],
            "y": pc.cast(pc.round(pc.multiply(b["o_totalprice"], 100.0),
                                  ndigits=0), pa.int64()),
        })

    return gini_dispersion(ds.map_batches(_cols, batch_format="pyarrow"),
                           num_partitions=4)


GINI_SQL = """
WITH o AS (
    SELECT o_orderpriority AS k,
           CAST(round(o_totalprice * 100) AS BIGINT) AS v
    FROM orders
),
r AS (
    SELECT k, v,
           row_number() OVER (PARTITION BY k ORDER BY v) AS i,
           count(*) OVER (PARTITION BY k) AS n
    FROM o
)
SELECT k AS series_id, count(*) AS n,
       CAST(sum(v) AS BIGINT) AS sum_y,
       CAST(sum((2 * i - n - 1) * v) AS BIGINT) AS pairdiff_total,
       CASE WHEN sum(v) > 0 AND count(*) >= 2
            THEN CAST(sum((2 * i - n - 1) * v) AS DOUBLE)
                 / (count(*) * CAST(sum(v) AS BIGINT)) END AS gini
FROM r GROUP BY 1
"""


def q_benford_orders(sf_dir: str):
    """Benford leading-digit audit
    (``stages/integrity.py:benford_audit``): per order priority, the
    first-digit distribution of positive price cents — mergeable
    (key, digit) count partials, exact integer permille shares."""
    from ...stages.integrity import benford_audit

    ds = _read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderpriority", "o_totalprice"]).repartition(8)

    def _cols(b: pa.Table) -> pa.Table:
        return pa.table({
            "k": b["o_orderpriority"],
            "v": pc.cast(pc.round(pc.multiply(b["o_totalprice"], 100.0),
                                  ndigits=0), pa.int64()),
        })

    return benford_audit(ds.map_batches(_cols, batch_format="pyarrow"),
                         key_col="k", val_col="v", fanin=4)


BENFORD_SQL = """
WITH o AS (
    SELECT o_orderpriority AS k,
           CAST(round(o_totalprice * 100) AS BIGINT) AS v
    FROM orders
),
d AS (
    SELECT k, CAST(substr(CAST(v AS VARCHAR), 1, 1) AS BIGINT) AS digit
    FROM o WHERE v > 0
),
c AS (
    SELECT k, digit, count(*) AS digit_count
    FROM d GROUP BY 1, 2
),
t AS (SELECT k, CAST(sum(digit_count) AS BIGINT) AS n_values FROM c
      GROUP BY 1)
SELECT c.k AS series_id, c.digit, t.n_values, c.digit_count,
       1000 * c.digit_count // t.n_values AS permille
FROM c JOIN t ON c.k = t.k
"""


def q_kwic_docs(sf_dir: str):
    """Keyword-in-context concordance (``stages/textstats.py:kwic``):
    first occurrence of 'data' per document with 15 chars of context on
    each side — no shuffle, scalar-arg Arrow slices only, character
    semantics identical to SQL split_part/substr."""
    from ...stages.textstats import kwic

    ds = _read_parquet_clean(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"]).repartition(8)
    return kwic(ds, term="data", ctx=15)


KWIC_SQL = """
WITH m AS (
    SELECT doc_id, text FROM documents WHERE contains(text, 'data')
),
p AS (
    SELECT doc_id, split_part(text, 'data', 1) AS pre, text FROM m
),
s AS (
    SELECT doc_id, pre,
           substr(text, length(pre) + 4 + 1) AS suf
    FROM p
)
SELECT doc_id, CAST(length(pre) + 1 AS BIGINT) AS char_pos,
       substr(pre, greatest(length(pre) - 15 + 1, 1))
           || 'data' || substr(suf, 1, 15) AS snippet
FROM s
"""


def q_mann_whitney_events(sf_dir: str):
    """Mann-Whitney U A/B comparison
    (``stages/abtest.py:mann_whitney``): per event_type, do weekend
    values shift vs weekday values — exact doubled tie-average ranks,
    one hash shuffle; u_over_nanb is the common-language effect size."""
    from ...stages.abtest import mann_whitney

    ds = _read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["ts", "event_type", "value"]).repartition(8)

    def _cols(b: pa.Table) -> pa.Table:
        days = pc.divide(pc.cast(b["ts"], pa.int64()), 86_400 * US)
        dow = pc.subtract(
            pc.add(days, 4),
            pc.multiply(pc.divide(pc.add(days, 4), 7), 7))
        weekend = pc.or_(pc.equal(dow, 0), pc.equal(dow, 6))
        return pa.table({
            "series_id": b["event_type"],
            "y": pc.cast(pc.round(pc.multiply(b["value"], 100.0),
                                  ndigits=0), pa.int64()),
            "side": pc.cast(weekend, pa.int64()),
        })

    return mann_whitney(ds.map_batches(_cols, batch_format="pyarrow"),
                        num_partitions=4)


MANN_WHITNEY_SQL = """
WITH e AS (
    SELECT event_type AS k,
           CAST(round(value * 100) AS BIGINT) AS v,
           CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS s
    FROM events
),
r AS (
    SELECT k, v, s,
           rank() OVER (PARTITION BY k ORDER BY v) AS fr,
           count(*) OVER (PARTITION BY k, v) AS ties
    FROM e
),
a AS (
    SELECT k,
           CAST(sum(s) AS BIGINT) AS n_a,
           CAST(count(*) - sum(s) AS BIGINT) AS n_b,
           CAST(sum((2 * fr + ties - 1) * s) AS BIGINT) AS r2_a
    FROM r GROUP BY k
)
SELECT k AS series_id, n_a, n_b, r2_a,
       r2_a - n_a * (n_a + 1) AS u2_a,
       CAST(r2_a - n_a * (n_a + 1) AS DOUBLE)
           / (2 * n_a * n_b) AS u_over_nanb
FROM a WHERE n_a > 0 AND n_b > 0
"""


def q_sliding_wau_events(sf_dir: str):
    """Sliding-window distinct actives
    (``stages/windows.py:sliding_distinct``): per event_type per day,
    the distinct users seen in the trailing 7 days — per-user coverage
    islands + a reset-free ±1 sweep, never a per-day distinct set."""
    from ...stages.windows import sliding_distinct

    ds = _read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["ts", "event_type", "user_id"]).repartition(8)

    def _cols(b: pa.Table) -> pa.Table:
        return pa.table({
            "series_id": b["event_type"],
            "user_id": b["user_id"],
            "day": pc.divide(pc.cast(b["ts"], pa.int64()), 86_400 * US),
        })

    return sliding_distinct(ds.map_batches(_cols, batch_format="pyarrow"),
                            window=7, num_partitions=4)


SLIDING_WAU_SQL = f"""
WITH d AS (
    SELECT DISTINCT event_type AS sid, user_id AS u,
           epoch_us(ts) // {86_400 * US} AS day
    FROM events
),
bounds AS (
    SELECT sid, min(day) AS d0, max(day) + 6 AS d1 FROM d GROUP BY 1
),
grid AS (
    SELECT sid, unnest(generate_series(d0, d1)) AS day FROM bounds
)
SELECT g.sid AS series_id, g.day,
       count(DISTINCT d.u) AS active_users
FROM grid g
JOIN d ON d.sid = g.sid AND d.day BETWEEN g.day - 6 AND g.day
GROUP BY 1, 2
"""


def q_survivorship_users(sf_dir: str):
    """Golden-record survivorship merge
    (``stages/cdc.py:survivorship_merge``): per user, the latest
    NON-NULL value of each column across all event versions (cents are
    null on view/click rows, props null on error rows — the
    deterministic null pattern both sides apply), plus version count
    and last timestamp. One hash(key) shuffle, reduceat per column."""
    from ...stages.cdc import survivorship_merge

    ds = _read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value",
                 "props"]).repartition(8)

    def _cols(b: pa.Table) -> pa.Table:
        cv = pc.cast(pc.round(pc.multiply(b["value"], 100.0), ndigits=0),
                     pa.int64())
        null_cv = pc.or_(pc.equal(b["event_type"], "view"),
                         pc.equal(b["event_type"], "click"))
        null_pr = pc.equal(b["event_type"], "error")
        n = b.num_rows
        return pa.table({
            "key": b["user_id"],
            "ts_us": pc.cast(b["ts"], pa.int64()),
            "event_id": b["event_id"],
            "cv": pc.if_else(null_cv, pa.nulls(n, pa.int64()), cv),
            "pr": pc.if_else(null_pr, pa.nulls(n, pa.string()),
                             b["props"]),
        })

    return survivorship_merge(
        ds.map_batches(_cols, batch_format="pyarrow"),
        key_col="key", ts_col="ts_us", id_col="event_id",
        cols=["cv", "pr"], num_partitions=4)


SURVIVORSHIP_SQL = """
WITH v AS (
    SELECT user_id AS key, epoch_us(ts) AS ts_us, event_id,
           CASE WHEN event_type IN ('view', 'click') THEN NULL
                ELSE CAST(round(value * 100) AS BIGINT) END AS cv,
           CASE WHEN event_type = 'error' THEN NULL ELSE props END AS pr,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS rn
    FROM events
)
SELECT key, count(*) AS n_versions,
       CAST(max(ts_us) AS BIGINT) AS last_ts,
       max_by(cv, rn) FILTER (WHERE cv IS NOT NULL) AS cv,
       max_by(pr, rn) FILTER (WHERE pr IS NOT NULL) AS pr
FROM v GROUP BY 1
"""


def q_embedding_covariance(sf_dir: str):
    """Exact integer embedding covariance
    (``stages/similarity.py:embedding_covariance``): per dimension pair
    (i <= j), sufficient statistics over trunc-quantized components and
    the exact covariance numerator — one d×d partial Gram per block,
    mergeable hashpart sums, vectors never shuffle."""
    from ...stages.similarity import embedding_covariance

    ds = _read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                             columns=["embedding"]).repartition(4)
    return embedding_covariance(ds, scale=1000, fanin=4)


EMBEDDING_COV_SQL = """
WITH q AS (
    SELECT vec_id, r.i AS i,
           CAST(trunc(CAST(embedding[r.i] AS DOUBLE) * 1000) AS BIGINT)
               AS v
    FROM embeddings, range(1, 65) r(i)
),
p AS (
    SELECT a.i AS i, b.i AS j, count(*) AS n,
           CAST(sum(a.v * b.v) AS BIGINT) AS sxy,
           CAST(sum(a.v) AS BIGINT) AS sx,
           CAST(sum(b.v) AS BIGINT) AS sy
    FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.i <= b.i
    GROUP BY 1, 2
)
SELECT i, j, n, sxy, sx, sy,
       n * sxy - sx * sy AS cov_num,
       CAST(n * sxy - sx * sy AS DOUBLE)
           / (CAST(n AS DOUBLE) * n) AS cov
FROM p
"""


def q_hybrid_rrf_docs(sf_dir: str):
    """Hybrid retrieval with reciprocal-rank fusion
    (``stages/retrieval.py``): lexical candidates (integer
    ``tf·((N·1000)//(df+1))`` weights over a fixed query-term set) and
    vector candidates (integer dot products vs the broadcast vec_id=0
    query vector) each produce a distributed top-50 (block-local prune
    + sort/limit); the two BOUNDED lists fuse driver-side with exact
    rational RRF (k0=60), the float score being one pinned division."""
    import pyarrow.parquet as pq

    from ...stages.retrieval import (lexical_scores, query_term_df,
                                    rrf_fuse, topk_side, vector_scores)

    terms = ["hash", "join", "merge", "sort", "scan"]
    docs = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    n_docs = docs.count()  # parquet metadata, no data pass
    docs = docs.filter(expr="doc_id > 0")
    df = query_term_df(docs, terms)
    weights = (np.int64(n_docs) * 1000) // (df + 1)
    lex_top = topk_side(lexical_scores(docs, terms, weights), 50,
                        "lex_score")

    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    qvec = np.asarray(
        t.filter(pc.equal(t["vec_id"], 0))["embedding"][0].as_py(),
        dtype=np.float64)
    emb = _read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                              columns=["vec_id", "embedding"]).filter(
        expr="vec_id > 0")
    vec_top = topk_side(vector_scores(emb, qvec), 50, "dot")
    return rrf_fuse(lex_top, vec_top)


HYBRID_RRF_SQL = """
WITH n AS (SELECT count(*) AS n FROM documents),
tok AS (
    SELECT doc_id, t.term
    FROM documents, unnest(string_split(text, ' ')) AS t(term)
    WHERE doc_id > 0
      AND t.term IN ('hash', 'join', 'merge', 'sort', 'scan')
),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
w AS (SELECT term, (SELECT n FROM n) * 1000 // (df + 1) AS w FROM df),
tf AS (SELECT doc_id, term, count(*) AS cnt FROM tok GROUP BY 1, 2),
lex AS (
    SELECT doc_id, CAST(sum(cnt * w) AS BIGINT) AS score
    FROM tf JOIN w USING (term) GROUP BY 1
),
lex_top AS (
    SELECT doc_id,
           row_number() OVER (ORDER BY score DESC, doc_id) AS r
    FROM lex QUALIFY r <= 50
),
q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
vec AS (
    SELECT e.vec_id AS doc_id,
           CAST(sum(
               CAST(trunc(CAST(e.embedding[r.i] AS DOUBLE) * 1000)
                    AS BIGINT)
               * CAST(trunc(CAST((SELECT qe FROM q)[r.i] AS DOUBLE)
                            * 1000) AS BIGINT)) AS BIGINT) AS dot
    FROM embeddings e, range(1, 65) r(i)
    WHERE e.vec_id > 0 GROUP BY 1
),
vec_top AS (
    SELECT doc_id,
           row_number() OVER (ORDER BY dot DESC, doc_id) AS r
    FROM vec QUALIFY r <= 50
),
f AS (
    SELECT doc_id,
           CAST(COALESCE(l.r, 0) AS BIGINT) AS r_lex,
           CAST(COALESCE(v.r, 0) AS BIGINT) AS r_vec
    FROM lex_top l FULL OUTER JOIN vec_top v USING (doc_id)
)
SELECT doc_id, r_lex, r_vec,
       CAST(CASE WHEN r_lex > 0 AND r_vec > 0
                 THEN (60 + r_lex) + (60 + r_vec) ELSE 1 END
            AS BIGINT) AS rrf_num,
       CAST(CASE WHEN r_lex > 0 AND r_vec > 0
                 THEN (60 + r_lex) * (60 + r_vec)
                 WHEN r_lex > 0 THEN 60 + r_lex
                 ELSE 60 + r_vec END AS BIGINT) AS rrf_den,
       CAST(rrf_num AS DOUBLE) / rrf_den AS rrf,
       row_number() OVER (
           ORDER BY CAST(rrf_num AS DOUBLE) / rrf_den DESC, doc_id
       ) AS fused_rank
FROM f
"""


def q_centroid_classify_embeddings(sf_dir: str):
    """Nearest-centroid (Rocchio) classification
    (``stages/similarity.py:centroid_classify``): vec_id % 5 != 0 rows
    train per-label integer centroids (trunc-quantized sums, truncating
    division), the held-out fifth classifies to the nearest centroid by
    exact integer d2, ties to the smallest label. Bounded |labels|·d
    partial-sum merge + broadcast centroids + one shuffle-free classify
    pass."""
    from ...stages.similarity import centroid_classify

    ds = _read_parquet_clean(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding", "label"]).repartition(4)
    return centroid_classify(ds, scale=1000, holdout_mod=5, fanin=2)


CENTROID_CLASSIFY_SQL = """
WITH q AS (
    SELECT vec_id, CAST(label AS BIGINT) AS label, r.i AS i,
           CAST(trunc(CAST(embedding[r.i] AS DOUBLE) * 1000) AS BIGINT)
               AS v
    FROM embeddings, range(1, 65) r(i)
),
cent AS (
    SELECT label, i, CAST(sum(v) AS BIGINT) AS s, count(*) AS n
    FROM q WHERE vec_id % 5 <> 0 GROUP BY 1, 2
),
c AS (SELECT label, i, s // n AS cv FROM cent),
d AS (
    SELECT t.vec_id, t.label, c.label AS cl,
           CAST(sum((t.v - c.cv) * (t.v - c.cv)) AS BIGINT) AS d2
    FROM q t JOIN c ON t.i = c.i
    WHERE t.vec_id % 5 = 0 GROUP BY 1, 2, 3
),
p AS (
    SELECT vec_id, label, cl AS pred, d2,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY d2, cl) AS rn
    FROM d
)
SELECT vec_id, label, pred, d2 FROM p WHERE rn = 1
"""


def q_semantic_prune_embeddings(sf_dir: str):
    """SemDeDup-style semantic pruning
    (``stages/similarity.py:semantic_prune``): the k-means assignment
    (k=4, 2 updates — identical machinery to ``kmeans_embeddings``)
    keeps only the 32 vectors closest to each centroid (d2 asc, id asc)
    — cluster-based dataset pruning with a block-local prune before the
    one bounded-key shuffle."""
    from ...stages.similarity import kmeans_integer, semantic_prune

    ds = _read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding"]).repartition(4)
    assigned = kmeans_integer(ds, k=4, updates=2, scale=1000,
                              num_partitions=4)
    return semantic_prune(assigned, keep=32)


def q_mutual_nn_embeddings(sf_dir: str):
    """Within-label mutual nearest neighbors
    (``stages/neighbors.py:mutual_nn_pairs``): the record-linkage /
    bitext-mining primitive — label is the blocking key (ONE
    hash(label) shuffle), each group runs a vectorized integer Gram
    matmul, pairs (a<b) kept when each is the other's nearest non-self
    neighbor (exact int d2, smallest-id ties)."""
    from ...stages.neighbors import mutual_nn_pairs

    ds = _read_parquet_clean(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding", "label"]).repartition(4)
    return mutual_nn_pairs(ds, scale=1000)


_NEIGHBOR_PAIRS_CTE = """
q AS (
    SELECT vec_id, CAST(label AS BIGINT) AS label,
           list_transform(embedding,
               x -> CAST(trunc(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
    FROM embeddings
),
d AS (
    SELECT a.vec_id AS ia, b.vec_id AS ib, a.label AS label,
           CAST(list_dot_product(a.v, a.v) + list_dot_product(b.v, b.v)
                - 2 * list_dot_product(a.v, b.v) AS BIGINT) AS d2
    FROM q a JOIN q b
      ON a.label = b.label AND a.vec_id <> b.vec_id
),
nn AS (
    SELECT ia, ib, label, d2,
           row_number() OVER (PARTITION BY ia ORDER BY d2, ib) AS rn
    FROM d
)
"""

MUTUAL_NN_SQL = f"""
WITH {_NEIGHBOR_PAIRS_CTE.strip()}
SELECT l.ia AS a, l.ib AS b, l.label AS label, l.d2 AS d2
FROM nn l JOIN nn r ON l.ib = r.ia AND r.ib = l.ia
WHERE l.rn = 1 AND r.rn = 1 AND l.ia < l.ib
"""


def q_knn_outliers_embeddings(sf_dir: str):
    """Distance-based outlier scores
    (``stages/neighbors.py:kth_nn_distance``): each vector's exact
    integer d2 to its 5th-nearest within-label neighbor; the 5 most
    outlying rows per label (d2k desc, id asc) survive — the
    anomaly-filtering gate of an embedding-curation pipeline. Same
    blocked shape as ``mutual_nn_embeddings``."""
    from ...stages.neighbors import kth_nn_distance

    ds = _read_parquet_clean(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding", "label"]).repartition(4)
    return kth_nn_distance(ds, k=5, top=5, scale=1000)


KNN_OUTLIERS_SQL = f"""
WITH {_NEIGHBOR_PAIRS_CTE.strip()},
kth AS (SELECT ia AS vec_id, label, d2 AS d2k FROM nn WHERE rn = 5),
t AS (
    SELECT vec_id, label, d2k,
           row_number() OVER (PARTITION BY label
                              ORDER BY d2k DESC, vec_id) AS rk
    FROM kth
)
SELECT vec_id, label, d2k, rk FROM t WHERE rk <= 5
"""


def q_seasonal_decompose_1h(sf_dir: str):
    """Classical additive seasonal decomposition over the dense 1h tier
    (``stages/decompose.py``): 2×24 centered moving-average trend,
    per-(series, hour-of-day) seasonal index, remainder — every value an
    integer numerator over a fixed denominator (48, 48·cnt), the
    remainder's division the only float. One hash(series) shuffle; each
    partition decomposes ALL its series in a single vectorized cumsum
    pass (edges dropped, the classical NaN rows)."""
    from ...stages.decompose import classical_decompose
    from ...stages.gapfill import gapfill
    from ...stages.rollup import rollup

    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    rolled = rollup(ev.map_batches(_series, batch_format="pyarrow"), W1H)
    dense = gapfill(rolled, W1H, value_cols=("sum_y",), fill="zero",
                    num_partitions=4)
    return classical_decompose(dense, window_us=W1H, period=24,
                               num_partitions=4)


SEASONAL_DECOMP_SQL = f"""
WITH r AS (
    SELECT event_type AS series_id,
           (epoch_us(ts) // {W1H}) * {W1H} AS bucket,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s
    FROM events GROUP BY 1, 2
),
b AS (SELECT series_id, min(bucket) mn, max(bucket) mx FROM r GROUP BY 1),
g AS (SELECT series_id, unnest(range(mn, mx + 1, {W1H})) AS bucket
      FROM b),
f AS (
    SELECT g.series_id, g.bucket, COALESCE(r.s, 0) AS y,
           row_number() OVER (PARTITION BY g.series_id
                              ORDER BY g.bucket) - 1 AS p,
           count(*) OVER (PARTITION BY g.series_id) AS n
    FROM g LEFT JOIN r USING (series_id, bucket)
),
t AS (
    SELECT series_id, bucket, y, p, n,
           sum(y) OVER (PARTITION BY series_id ORDER BY bucket
                        ROWS BETWEEN 11 PRECEDING AND 11 FOLLOWING)
               AS inner23,
           lag(y, 12) OVER (PARTITION BY series_id
                            ORDER BY bucket) AS ym,
           lead(y, 12) OVER (PARTITION BY series_id
                             ORDER BY bucket) AS yp
    FROM f
),
i AS (
    SELECT series_id, bucket, y, (bucket // {W1H}) % 24 AS slot,
           CAST(ym + 2 * inner23 + yp AS BIGINT) AS trend_num,
           CAST(48 * y - (ym + 2 * inner23 + yp) AS BIGINT) AS detr
    FROM t WHERE p >= 12 AND p <= n - 13
),
s AS (
    SELECT series_id, slot, CAST(sum(detr) AS BIGINT) AS seas_num,
           CAST(count(*) AS BIGINT) AS seas_cnt
    FROM i GROUP BY 1, 2
)
SELECT i.series_id, i.bucket, i.y, i.slot, i.trend_num, i.detr,
       s.seas_num, s.seas_cnt,
       CAST(i.detr * s.seas_cnt - s.seas_num AS BIGINT) AS rem_num,
       CAST(i.detr * s.seas_cnt - s.seas_num AS DOUBLE)
           / (48.0 * s.seas_cnt) AS rem
FROM i JOIN s USING (series_id, slot)
"""


def q_hysteresis_alerts_events(sf_dir: str):
    """Schmitt-trigger alerting (``stages/rate.py:hysteresis_alerts``):
    ALERT when cents >= 7000, clear only at <= 3000 — the hysteresis
    band suppresses the flapping plain crossings emit. One hash(series)
    shuffle; forward-fill of set/reset markers via
    ``np.maximum.accumulate`` with segment-start validity (no per-row
    Python). Emits one row per state transition."""
    from ...stages.rate import hysteresis_alerts

    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"], "event_id": b["event_id"]})

    ds = ev.map_batches(_series, batch_format="pyarrow")
    return hysteresis_alerts(ds, 7000, 3000, tiebreak_col="event_id",
                             num_partitions=2)


HYSTERESIS_SQL = """
WITH e AS (
    SELECT event_type AS series_id, event_id, epoch_us(ts) AS x,
           CAST(round(value * 100) AS BIGINT) AS y
    FROM events
),
m AS (
    SELECT series_id, x, event_id, y,
           CASE WHEN y >= 7000 THEN 1
                WHEN y <= 3000 THEN 0 END AS mk
    FROM e
),
s AS (
    SELECT series_id, x, event_id, y,
           CAST(COALESCE(last_value(mk IGNORE NULLS) OVER (
               PARTITION BY series_id ORDER BY x, event_id
               ROWS UNBOUNDED PRECEDING), 0) AS BIGINT) AS state
    FROM m
),
t AS (
    SELECT series_id, x, y, state,
           lag(state, 1, 0) OVER (PARTITION BY series_id
                                  ORDER BY x, event_id) AS prev
    FROM s
)
SELECT series_id, x, y, state FROM t WHERE state <> prev
"""


def q_coverage_sample_docs(sf_dir: str):
    """Greedy maximum-coverage selection
    (``stages/coverage.py:greedy_coverage``): 5 rounds of "pick the doc
    adding the most uncovered distinct BIGRAMS" (ties to smallest id) —
    the (1-1/e) facility-location heuristic for diverse seed-set /
    eval-suite curation. Per round: broadcast covered set, vectorized
    marginal gains, distributed sort/limit(1); only the winner's token
    set reaches the driver."""
    from ...stages.coverage import greedy_coverage

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"])
    return greedy_coverage(ds, 5, ngram=2)


def _coverage_sql(k: int = 5) -> str:
    parts = ["""tok AS (
    SELECT DISTINCT doc_id, t.term
    FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
         unnest(list_transform(range(1, array_length(l)),
                               i -> l[i] || ' ' || l[i + 1]))
             AS t(term)
)"""]
    selects = []
    for r in range(1, k + 1):
        cond = (f"\n    WHERE term NOT IN (SELECT term FROM c{r - 1})"
                if r > 1 else "")
        parts.append(f"""g{r} AS (
    SELECT doc_id, count(*) AS gain FROM tok{cond} GROUP BY 1
)""")
        parts.append(f"""p{r} AS (
    SELECT doc_id, gain FROM g{r} ORDER BY gain DESC, doc_id LIMIT 1
)""")
        if r == 1:
            parts.append("""c1 AS (
    SELECT term FROM tok WHERE doc_id = (SELECT doc_id FROM p1)
)""")
        else:
            parts.append(f"""c{r} AS (
    SELECT term FROM c{r - 1}
    UNION
    SELECT term FROM tok WHERE doc_id = (SELECT doc_id FROM p{r})
)""")
        selects.append(
            f"SELECT CAST({r} AS BIGINT) AS rnd, doc_id, gain,\n"
            f"       (SELECT count(*) FROM c{r}) AS covered FROM p{r}")
    return ("WITH " + ",\n".join(parts) + "\n"
            + "\nUNION ALL\n".join(selects))


COVERAGE_SQL = _coverage_sql()


def q_term_drift_docs(sf_dir: str):
    """Vocabulary drift between corpus halves
    (``stages/vocab.py:term_drift``): 2×2 chi-square presence drift per
    term (doc_id parity as the snapshot split), top-20 most drifted.
    Per-block distinct-(doc, term) partials, one hash(term) shuffle,
    bounded sort/limit funnel; chi2 is the pinned 3-multiply/1-divide
    float chain over exact integer contingency cells."""
    import pyarrow.parquet as pq

    from ...stages.vocab import term_drift

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"])
    halves = ds.map_batches(
        lambda b: pa.table({
            "n0": pa.array([int((b["doc_id"].to_numpy(
                zero_copy_only=False) % 2 == 0).sum())], pa.int64()),
            "n1": pa.array([int((b["doc_id"].to_numpy(
                zero_copy_only=False) % 2 == 1).sum())], pa.int64())}),
        batch_format="pyarrow").to_pandas()
    n0, n1 = int(halves["n0"].sum()), int(halves["n1"].sum())
    return term_drift(ds, n0, n1, top=20)


TERM_DRIFT_SQL = """
WITH tok AS (
    SELECT DISTINCT doc_id, t.term
    FROM documents, unnest(string_split(text, ' ')) AS t(term)
    WHERE t.term <> ''
),
n AS (
    SELECT count(*) FILTER (doc_id % 2 = 0) AS n0,
           count(*) FILTER (doc_id % 2 = 1) AS n1
    FROM documents
),
h AS (
    SELECT term,
           CAST(count(*) FILTER (doc_id % 2 = 0) AS BIGINT) AS a,
           CAST(count(*) FILTER (doc_id % 2 = 1) AS BIGINT) AS b
    FROM tok GROUP BY 1
),
s AS (
    SELECT term, a, b,
           CAST((a + b) * ((n.n0 - a) + (n.n1 - b)) AS BIGINT) AS p1,
           CAST(a * n.n1 - b * n.n0 AS BIGINT) AS d1,
           CAST(n.n0 + n.n1 AS DOUBLE) * CAST(a * n.n1 - b * n.n0
                                              AS DOUBLE)
               * CAST(a * n.n1 - b * n.n0 AS DOUBLE)
               / (CAST((a + b) * ((n.n0 - a) + (n.n1 - b)) AS DOUBLE)
                  * CAST(n.n0 * n.n1 AS DOUBLE)) AS chi2
    FROM h, n
    WHERE (n.n0 - a) + (n.n1 - b) > 0
)
SELECT term, a, b, p1, d1, chi2,
       row_number() OVER (ORDER BY chi2 DESC, term) AS rank
FROM s QUALIFY rank <= 20
"""


def q_session_paths_events(sf_dir: str):
    """Clickstream path mining (``stages/windows.py:session_paths``):
    the 10 most frequent session-opening paths — each 30-min-gap
    session's first 3 event types joined with '>'. One hash(user)
    shuffle with immediate collapse to (path, cnt) partials, one
    hash(path) grouped sum, bounded top-10 funnel."""
    from ...stages.windows import session_paths

    ds = _read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"])

    def _prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b["user_id"],
            "ts_us": b["ts"].cast(pa.int64()),
            "event_id": b["event_id"],
            "event_type": b["event_type"],
        })

    prepped = ds.map_batches(_prep, batch_format="pyarrow")
    return session_paths(prepped, 30 * 60 * US, 3, series_col="user_id",
                         x_col="ts_us", id_col="event_id", top=10,
                         num_partitions=4)


SESSION_PATHS_SQL = f"""
WITH e AS (
    SELECT user_id, epoch_us(ts) AS x, event_id, event_type
    FROM events
),
m AS (
    SELECT user_id, x, event_id, event_type,
           CASE WHEN lag(x) OVER w IS NULL
                  OR x - lag(x) OVER w > {30 * 60 * US}
                THEN 1 ELSE 0 END AS brk
    FROM e WINDOW w AS (PARTITION BY user_id ORDER BY x, event_id)
),
s AS (
    SELECT user_id, x, event_id, event_type,
           sum(brk) OVER (PARTITION BY user_id ORDER BY x, event_id
                          ROWS UNBOUNDED PRECEDING) AS sess
    FROM m
),
r AS (
    SELECT user_id, sess, x, event_id, event_type,
           row_number() OVER (PARTITION BY user_id, sess
                              ORDER BY x, event_id) AS rn
    FROM s
),
p AS (
    SELECT user_id, sess,
           string_agg(event_type, '>' ORDER BY x, event_id) AS path
    FROM r WHERE rn <= 3 GROUP BY 1, 2
),
c AS (SELECT path, CAST(count(*) AS BIGINT) AS cnt FROM p GROUP BY 1)
SELECT path, cnt, row_number() OVER (ORDER BY cnt DESC, path) AS rank
FROM c QUALIFY rank <= 10
"""


def q_heatmap_tiles_events(sf_dir: str):
    """Density heatmap tiles — the rendering strategy when a series is
    too dense even for M4: 2-D (1h time bucket × 10.00-value bin) tile
    counts + exact cent sums per event_type. Map-side Arrow group_by
    collapses each block to its distinct tiles before ONE hash shuffle
    (``stages/graph.py:grouped_sum_parts``); tile space is bounded by
    (time range × value range), never by row count."""
    from ...stages.graph import grouped_sum_parts

    ev = _events_cents(sf_dir)

    def _tiles(b: pa.Table) -> pa.Table:
        ts = b["ts_us"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = b["cents"].to_numpy(zero_copy_only=False).astype(np.int64)
        # all-positive domain: trunc-div == floor-div == DuckDB //
        return pa.table({
            "event_type": b["event_type"],
            "tbucket": pa.array(ts // W1H * W1H),
            "vbin": pa.array(cents // 1000),  # 10.00-unit value bins
            "sum_cents": pa.array(cents),
        })

    tiles = ev.map_batches(_tiles, batch_format="pyarrow")
    return grouped_sum_parts(tiles, ["event_type", "tbucket", "vbin"],
                             ["sum_cents"], count_col="n", fanin=4)


HEATMAP_TILES_SQL = f"""
SELECT event_type,
       (epoch_us(ts) // {W1H}) * {W1H} AS tbucket,
       CAST(round(value * 100) AS BIGINT) // 1000 AS vbin,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
           AS sum_cents,
       CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY 1, 2, 3
"""


def q_classify_confusion_embeddings(sf_dir: str):
    """Per-class evaluation of the nearest-centroid classifier
    (``centroid_classify`` composed with a bounded confusion rollup):
    per true label — support, predicted count, true positives, and
    integer permille precision/recall (truncating division). The
    (label, pred) confusion space is |labels|² — the rollup's one
    shuffle and the final driver table are bounded constants."""
    import pandas as pd

    from ...stages.graph import grouped_sum_parts
    from ...stages.similarity import centroid_classify

    ds = _read_parquet_clean(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding", "label"]).repartition(4)
    assigned = centroid_classify(ds, scale=1000, holdout_mod=5, fanin=2)

    def _pairs(b: pa.Table) -> pa.Table:
        return pa.table({"label": b["label"], "pred": b["pred"]})

    cm = grouped_sum_parts(assigned.map_batches(_pairs,
                                                batch_format="pyarrow"),
                           ["label", "pred"], [], count_col="c",
                           fanin=2).to_pandas()  # bounded |labels|^2 rows
    per = {}
    for _, r in cm.iterrows():
        l, p, c = int(r["label"]), int(r["pred"]), int(r["c"])
        per.setdefault(l, [0, 0])  # [support, tp]
        per[l][0] += c
        if l == p:
            per[l][1] += c
    predicted = cm.groupby("pred")["c"].sum().to_dict()
    rows = []
    for l in sorted(per):
        support, tp = per[l]
        pred_n = int(predicted.get(l, 0))
        prec = (1000 * tp) // pred_n if pred_n > 0 else 0
        rec = (1000 * tp) // support
        rows.append((l, support, pred_n, tp, prec, rec))
    return pd.DataFrame(rows, columns=[
        "label", "support", "predicted", "tp", "prec_pm",
        "rec_pm"]).astype(np.int64)


CLASSIFY_CONFUSION_SQL = """
WITH base AS ({base}),
cm AS (SELECT label, pred, count(*) AS c FROM base GROUP BY 1, 2),
per AS (
    SELECT label, CAST(sum(c) AS BIGINT) AS support,
           CAST(COALESCE(sum(c) FILTER (label = pred), 0) AS BIGINT)
               AS tp
    FROM cm GROUP BY 1
),
pr AS (SELECT pred, CAST(sum(c) AS BIGINT) AS predicted
       FROM cm GROUP BY 1)
SELECT l.label, l.support,
       CAST(COALESCE(p.predicted, 0) AS BIGINT) AS predicted, l.tp,
       CAST(CASE WHEN COALESCE(p.predicted, 0) > 0
                 THEN (1000 * l.tp) // p.predicted ELSE 0 END
            AS BIGINT) AS prec_pm,
       CAST((1000 * l.tp) // l.support AS BIGINT) AS rec_pm
FROM per l LEFT JOIN pr p ON p.pred = l.label
"""


def q_local_supplier_volume(sf_dir: str):
    """TPC-H-Q5-style six-table star join: per-nation revenue from
    ASIA-region orders (1995–1996) where the supplier and customer share
    a nation. The dimension tables (region, nation, supplier) are the
    BROADCAST small sides — read once, shipped as sorted-key lookup
    arrays via closure capture, probed map-side with ``searchsorted`` —
    so the only exchanges are the two fact hash joins
    (orders⋈customer, lineitem⋈·) plus a 25-key grouped sum. Revenue in
    exact integer e6 units (cents × basis-point discount complement)."""
    import pyarrow.parquet as pq

    from ...stages.graph import grouped_sum_parts

    lo_us = 788_918_400 * US    # 1995-01-01 UTC
    hi_us = 852_076_800 * US    # 1997-01-01 UTC

    region = pq.read_table(f"{sf_dir}/region.parquet")
    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    asia_key = region.filter(pc.equal(region["r_name"], "ASIA"))[
        "r_regionkey"][0].as_py()
    nat = nation.filter(pc.equal(nation["n_regionkey"], asia_key))
    asia_nations = np.sort(nat["n_nationkey"].to_numpy(
        zero_copy_only=False).astype(np.int64))
    nation_name = dict(zip(nat["n_nationkey"].to_pylist(),
                           nat["n_name"].to_pylist()))

    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"])
    sk = sup["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    sn = sup["s_nationkey"].to_numpy(zero_copy_only=False).astype(
        np.int64)
    order_ = np.argsort(sk)
    sup_keys, sup_nat = sk[order_], sn[order_]

    def _cust(b: pa.Table) -> pa.Table:
        nk = b["c_nationkey"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        keep = np.isin(nk, asia_nations)
        return pa.table({
            "o_custkey": pc.cast(b["c_custkey"], pa.int64()).filter(
                pa.array(keep)),
            "c_nationkey": pa.array(nk[keep])})

    cust = _read_parquet_clean(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey"]).map_batches(
        _cust, batch_format="pyarrow")

    def _orders(b: pa.Table) -> pa.Table:
        ts = pc.cast(b["o_orderdate"], pa.int64())
        keep = pc.and_(pc.greater_equal(ts, lo_us), pc.less(ts, hi_us))
        t = b.filter(keep)
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "o_custkey": t["o_custkey"]})

    orders = _read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        _orders, batch_format="pyarrow")
    j1 = orders.join(cust, join_type="inner", num_partitions=4,
                     on=("o_custkey",))
    j1 = j1.map_batches(
        lambda b: pa.table({"o_orderkey": b["o_orderkey"],
                            "c_nationkey": b["c_nationkey"]}),
        batch_format="pyarrow")

    def _line(b: pa.Table) -> pa.Table:
        price = pc.cast(pc.round(pc.multiply(b["l_extendedprice"], 100.0),
                                 ndigits=0), pa.int64())
        disc = pc.cast(pc.round(pc.multiply(b["l_discount"], 10000.0),
                                ndigits=0), pa.int64())
        rev = pc.multiply(price, pc.subtract(pa.scalar(10000, pa.int64()),
                                             disc))
        lsk = b["l_suppkey"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        pos = np.searchsorted(sup_keys, lsk)
        pos_c = np.minimum(pos, len(sup_keys) - 1)
        valid = sup_keys[pos_c] == lsk
        s_nat = np.where(valid, sup_nat[pos_c], np.int64(-1))
        return pa.table({"l_orderkey": b["l_orderkey"],
                         "s_nationkey": pa.array(s_nat),
                         "revenue_e6": rev})

    line = _read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount"]).map_batches(_line, batch_format="pyarrow")
    j2 = line.join(j1, join_type="inner", num_partitions=4,
                   on=("l_orderkey",), right_on=("o_orderkey",))

    def _match(b: pa.Table) -> pa.Table:
        keep = pc.equal(b["s_nationkey"], b["c_nationkey"])
        t = b.filter(keep)
        return pa.table({"n_nationkey": t["s_nationkey"],
                         "revenue_e6": t["revenue_e6"]})

    agg = grouped_sum_parts(j2.map_batches(_match, batch_format="pyarrow"),
                            ["n_nationkey"], ["revenue_e6"],
                            count_col=None, fanin=2).to_pandas()
    agg["n_name"] = agg["n_nationkey"].map(nation_name)
    agg = agg.sort_values(["revenue_e6", "n_name"],
                          ascending=[False, True]).reset_index(drop=True)
    return agg[["n_name", "revenue_e6"]]


LOCAL_SUPPLIER_SQL = """
SELECT n_name,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (10000 - CAST(round(l_discount * 10000) AS BIGINT)))
            AS BIGINT) AS revenue_e6
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1995-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY 1
"""


def q_promo_share_month(sf_dir: str):
    """TPC-H-Q14-style promotion effect per ship month: the revenue
    share (integer permille, truncating) of PROMO-type parts. The part
    table is the broadcast small side (dense-key boolean lookup via
    ``searchsorted``); lineitem collapses map-side to per-month
    (promo_e6, total_e6) partials before one tiny grouped sum — the
    fact table never shuffles at full width."""
    import pyarrow.parquet as pq

    from ...stages.graph import grouped_sum_parts

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_type"])
    pk = part["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    promo = pc.equal(part["p_type"], "PROMO").to_numpy(
        zero_copy_only=False)
    o = np.argsort(pk)
    part_keys, part_promo = pk[o], promo[o]

    def _line(b: pa.Table) -> pa.Table:
        month = pc.cast(pc.floor_temporal(b["l_shipdate"], unit="month"),
                        pa.int64()).to_numpy(zero_copy_only=False)
        price = pc.cast(pc.round(pc.multiply(b["l_extendedprice"], 100.0),
                                 ndigits=0),
                        pa.int64()).to_numpy(zero_copy_only=False)
        disc = pc.cast(pc.round(pc.multiply(b["l_discount"], 10000.0),
                                ndigits=0),
                       pa.int64()).to_numpy(zero_copy_only=False)
        rev = price * (10000 - disc)
        lpk = b["l_partkey"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        pos = np.minimum(np.searchsorted(part_keys, lpk),
                         len(part_keys) - 1)
        is_promo = (part_keys[pos] == lpk) & part_promo[pos]
        return pa.table({
            "bucket": pa.array(month),
            "promo_e6": pa.array(np.where(is_promo, rev, 0)),
            "total_e6": pa.array(rev),
        })

    line = _read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_shipdate", "l_extendedprice",
                 "l_discount"]).map_batches(_line, batch_format="pyarrow")
    agg = grouped_sum_parts(line, ["bucket"], ["promo_e6", "total_e6"],
                            count_col=None, fanin=2)

    def _share(b: pa.Table) -> pa.Table:
        p = b["promo_e6"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = b["total_e6"].to_numpy(zero_copy_only=False).astype(np.int64)
        ok = t > 0
        share = np.where(ok, (1000 * p) // np.where(ok, t, 1), 0)
        return pa.table({"bucket": b["bucket"], "promo_e6": b["promo_e6"],
                         "total_e6": b["total_e6"],
                         "share_pm": pa.array(share)})

    return agg.map_batches(_share, batch_format="pyarrow")


PROMO_SHARE_SQL = """
WITH l AS (
    SELECT epoch_us(date_trunc('month', l_shipdate)) AS bucket,
           CAST(round(l_extendedprice * 100) AS BIGINT)
               * (10000 - CAST(round(l_discount * 10000) AS BIGINT))
               AS rev,
           p_type = 'PROMO' AS is_promo
    FROM lineitem JOIN part ON l_partkey = p_partkey
),
a AS (
    SELECT bucket,
           CAST(COALESCE(sum(rev) FILTER (is_promo), 0) AS BIGINT)
               AS promo_e6,
           CAST(sum(rev) AS BIGINT) AS total_e6
    FROM l GROUP BY 1
)
SELECT bucket, promo_e6, total_e6,
       CAST(CASE WHEN total_e6 > 0 THEN (1000 * promo_e6) // total_e6
                 ELSE 0 END AS BIGINT) AS share_pm
FROM a
"""


def q_cluster_ari_embeddings(sf_dir: str):
    """Clustering evaluation: EXACT Adjusted Rand Index between the
    k-means assignment and the true labels, as a rational
    ``ari = num2/den2`` over pair-count sufficient statistics
    (``num2 = 2·C·Σij − 2·Σa·Σb``, ``den2 = C·(Σa+Σb) − 2·Σa·Σb``,
    C = n(n−1)/2) — the one division is the only float. The
    contingency table (k × |labels|, BOUNDED) comes from one hash join
    (assignment ⋈ labels) + one grouped sum; the pair algebra runs
    driver-side on those bounded rows in arbitrary-precision ints."""
    import pandas as pd

    from ...stages.graph import grouped_sum_parts
    from ...stages.similarity import kmeans_integer

    ds = _read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding"]).repartition(4)
    assigned = kmeans_integer(ds, k=4, updates=2, scale=1000,
                              num_partitions=4)
    labels = _read_parquet_clean(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "label"]).map_batches(
        lambda b: pa.table({"vec_id": pc.cast(b["vec_id"], pa.int64()),
                            "label": pc.cast(b["label"], pa.int64())}),
        batch_format="pyarrow")
    j = assigned.join(labels, join_type="inner", num_partitions=4,
                      on=("vec_id",))
    ct = grouped_sum_parts(
        j.map_batches(lambda b: pa.table({
            "cluster": b["cluster"], "label": b["label"]}),
            batch_format="pyarrow"),
        ["cluster", "label"], [], count_col="c", fanin=2).to_pandas()

    # bounded k x |labels| rows: exact pair algebra in python ints
    n = int(ct["c"].sum())
    sumij = sum(int(c) * (int(c) - 1) // 2 for c in ct["c"])
    suma = sum(int(a) * (int(a) - 1) // 2
               for a in ct.groupby("cluster")["c"].sum())
    sumb = sum(int(b) * (int(b) - 1) // 2
               for b in ct.groupby("label")["c"].sum())
    C = n * (n - 1) // 2
    num2 = 2 * C * sumij - 2 * suma * sumb
    den2 = C * (suma + sumb) - 2 * suma * sumb
    ari = float(num2) / float(den2) if den2 else 1.0
    return pd.DataFrame([(n, sumij, suma, sumb, num2, den2, ari)],
                        columns=["n", "sumij", "suma", "sumb", "num2",
                                 "den2", "ari"]).astype(
        {c: np.int64 for c in ("n", "sumij", "suma", "sumb", "num2",
                               "den2")})


CLUSTER_ARI_SQL = """
WITH base AS ({base}),
j AS (
    SELECT b.vec_id, b.cluster, CAST(e.label AS BIGINT) AS label
    FROM base b JOIN embeddings e USING (vec_id)
),
ct AS (SELECT cluster, label, CAST(count(*) AS BIGINT) AS c
       FROM j GROUP BY 1, 2),
s AS (
    SELECT CAST(sum(c) AS BIGINT) AS n,
           CAST(sum(c * (c - 1) // 2) AS BIGINT) AS sumij
    FROM ct
),
sa AS (
    SELECT CAST(sum(a * (a - 1) // 2) AS BIGINT) AS suma
    FROM (SELECT CAST(sum(c) AS BIGINT) AS a FROM ct GROUP BY cluster)
),
sb AS (
    SELECT CAST(sum(b * (b - 1) // 2) AS BIGINT) AS sumb
    FROM (SELECT CAST(sum(c) AS BIGINT) AS b FROM ct GROUP BY label)
)
SELECT n, sumij, suma, sumb,
       CAST(2 * (n * (n - 1) // 2) * sumij - 2 * suma * sumb AS BIGINT)
           AS num2,
       CAST((n * (n - 1) // 2) * (suma + sumb) - 2 * suma * sumb
            AS BIGINT) AS den2,
       CAST(2 * (n * (n - 1) // 2) * sumij - 2 * suma * sumb AS DOUBLE)
           / ((n * (n - 1) // 2) * (suma + sumb) - 2 * suma * sumb)
           AS ari
FROM s, sa, sb
"""


