"""Round-5 session-4 wave, part 1: exact CHARACTER-level duplicate
substrings (the Lee et al. 2022 exact-substring dedup granularity —
every sliding character position a candidate, vs the word-gram tiles
already in the catalog) and SWINGING-DOOR TRENDING compression (the
classic industrial-historian codec; the stateful sibling of the
dead-band filter, bit-exact through integer slope cross-products).

Each entry follows the catalog contract: a Ray-Data-first distributed
shape documented in place, integer-exact arithmetic so the DuckDB
oracle replays bit-identically, and column names matched between both
sides.
"""
from __future__ import annotations

from ._shared import _read_parquet_clean, pa, pc  # noqa: F401

US = 1_000_000
W15M = 900 * US

_SUB_L = 24      # character window length
_SDT_DEV = 4000  # swinging-door half-width in cents (median 15m |dy| ~4.8k)


def q_shared_substring_docs(sf_dir: str):
    """Exact duplicate L=24-CHARACTER substrings across the corpus
    (``stages/grams.py:dup_windows(unit="char")``; Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better" — the
    character-granular exact-substring pass, complementing the
    word-gram ``dup_window_docs``): per 24-char window found in >= 2
    distinct documents, its distinct-doc count, total occurrence count
    and smallest doc id. Window extraction is one utf-32 decode +
    ``sliding_window_view`` reinterpret per batch (no per-position
    Python); map-side (gram, doc) merge, ONE hash(gram) shuffle."""
    from ...stages.grams import dup_windows

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"]).repartition(8)
    return dup_windows(ds, k=_SUB_L, min_docs=2, num_partitions=8,
                       unit="char")


SHARED_SUBSTRING_SQL = f"""
WITH g AS (
    SELECT doc_id, substr(text, i, {_SUB_L}) AS gram
    FROM documents,
         LATERAL unnest(generate_series(1, length(text) - {_SUB_L} + 1))
         AS t(i)
)
SELECT gram,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_occ,
       CAST(min(doc_id) AS BIGINT) AS min_doc
FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
"""


def q_sdt_compress_15m(sf_dir: str):
    """Swinging-door trending compression of the 15m tier per
    event_type (``stages/compress.py:sdt_compress``; Bristol, ISA
    1990 — OSIsoft PI's compression step): a tier row is retained when
    the running max of lower-pivot slopes exceeds the running min of
    upper-pivot slopes since the current anchor (doors collapse ->
    previous point becomes the new anchor); first/last rows always
    emit. dev = 4000 cents; slopes compare on whole-second x (15m
    buckets are exact second multiples) via integer cross-products, so
    the recursive-CTE oracle replays the walk bit-identically."""
    from ...stages.compress import sdt_compress
    from ...stages.rollup import rollup
    from .downsample_core import _events_cents

    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    rolled = rollup(ev.map_batches(_series, batch_format="pyarrow"), W15M)
    return sdt_compress(rolled, dev=_SDT_DEV, x_col="bucket",
                        y_col="sum_y", x_div=US, num_partitions=2)


SDT_SQL = f"""
WITH RECURSIVE numbered AS MATERIALIZED (
    SELECT event_type AS series_id, bucket AS x, y,
           bucket // {US} AS xs,
           lag(bucket) OVER w AS px, lag(y) OVER w AS py,
           lag(bucket // {US}) OVER w AS pxs,
           row_number() OVER w AS idx,
           count(*) OVER (PARTITION BY event_type) AS n
    FROM (
        SELECT event_type, epoch_us(ts) // {W15M} * {W15M} AS bucket,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
        FROM events GROUP BY event_type, bucket
    )
    WINDOW w AS (PARTITION BY event_type ORDER BY bucket)
),
rec AS (
    -- state AFTER processing row idx: anchor (ax: seconds, ay), doors
    -- (lo_n/lo_d, hi_n/hi_d; NULL den = fresh anchor, no doors yet),
    -- new_anchor = doors collapsed at this row (row idx-1 emitted)
    SELECT series_id, idx, n, xs AS ax, y AS ay,
           CAST(NULL AS BIGINT) AS lo_n, CAST(NULL AS BIGINT) AS lo_d,
           CAST(NULL AS BIGINT) AS hi_n, CAST(NULL AS BIGINT) AS hi_d,
           FALSE AS new_anchor
    FROM numbered WHERE idx = 1
    UNION ALL
    SELECT series_id, idx, n,
           CASE WHEN collapse THEN pxs ELSE ax END AS ax,
           CASE WHEN collapse THEN py ELSE ay END AS ay,
           CASE WHEN collapse THEN y - {_SDT_DEV} - py ELSE lo2_n END,
           CASE WHEN collapse THEN xs - pxs ELSE lo2_d END,
           CASE WHEN collapse THEN y + {_SDT_DEV} - py ELSE hi2_n END,
           CASE WHEN collapse THEN xs - pxs ELSE hi2_d END,
           collapse AS new_anchor
    FROM (
        SELECT series_id, idx, n, ax, ay, xs, y, pxs, py,
               lo2_n, lo2_d, hi2_n, hi2_d,
               (fresh = FALSE AND lo2_n * hi2_d > hi2_n * lo2_d)
                   AS collapse
        FROM (
            SELECT n.series_id, n.idx, n.n, r.ax, r.ay, n.xs, n.y,
                   n.pxs, n.py,
                   r.lo_d IS NULL AS fresh,
                   CASE WHEN r.lo_d IS NULL
                             OR (n.y - {_SDT_DEV} - r.ay) * r.lo_d
                                > r.lo_n * (n.xs - r.ax)
                        THEN n.y - {_SDT_DEV} - r.ay
                        ELSE r.lo_n END AS lo2_n,
                   CASE WHEN r.lo_d IS NULL
                             OR (n.y - {_SDT_DEV} - r.ay) * r.lo_d
                                > r.lo_n * (n.xs - r.ax)
                        THEN n.xs - r.ax ELSE r.lo_d END AS lo2_d,
                   CASE WHEN r.hi_d IS NULL
                             OR (n.y + {_SDT_DEV} - r.ay) * r.hi_d
                                < r.hi_n * (n.xs - r.ax)
                        THEN n.y + {_SDT_DEV} - r.ay
                        ELSE r.hi_n END AS hi2_n,
                   CASE WHEN r.hi_d IS NULL
                             OR (n.y + {_SDT_DEV} - r.ay) * r.hi_d
                                < r.hi_n * (n.xs - r.ax)
                        THEN n.xs - r.ax ELSE r.hi_d END AS hi2_d
            FROM rec r JOIN numbered n
              ON n.series_id = r.series_id AND n.idx = r.idx + 1
        ) u
    ) z
)
SELECT DISTINCT m.series_id, m.x, m.y
FROM numbered m
LEFT JOIN rec e
  ON e.series_id = m.series_id AND e.idx = m.idx + 1 AND e.new_anchor
WHERE m.idx = 1 OR m.idx = m.n OR e.idx IS NOT NULL
"""


def q_multimodal_adpcm_decode(sf_dir: str):
    """REAL stateful compressed-audio decode through the actor-pool
    stage: IMA/DVI ADPCM (WAV fmt 0x11) payloads whose PCM samples are
    the documents' own bytes, encoded with
    ``functions/adpcm.py:encode_wav_ima`` and decoded by DecodeAudio's
    RIFF fmt-tag dispatch. Unlike the stateless G.711 companding of
    ``multimodal_mulaw_decode``, every nibble updates a (predictor,
    step-index) state machine; the encoder and decoder predictors stay
    in lockstep (decoded sample == updated predictor), so the oracle
    replays the whole encode->decode roundtrip as ONE recursive-CTE
    integer recursion per document. Per-doc waveform stats
    hash-verified against that replay."""
    from ...functions.adpcm import encode_wav_ima
    from ...stages.multimodal import DecodeAudio
    from .multimodal_curation import _audio_code_stats
    import numpy as _np

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"])

    def _media(b: pa.Table) -> pa.Table:
        payloads = [
            encode_wav_ima(_np.frombuffer(t.encode(), _np.uint8)
                           .astype(_np.int16), 8000)
            for t in b["text"].to_pylist()]
        return pa.table({
            "media_id": b["doc_id"],
            "kind": pa.array(["audio"] * b.num_rows),
            "payload": pa.array(payloads, pa.binary()),
            "duration_ms": pa.array([0] * b.num_rows, pa.int32()),
        })

    media = ds.map_batches(_media, batch_format="pyarrow", batch_size=256)
    dec = media.map_batches(DecodeAudio, batch_format="pyarrow",
                            batch_size=256, concurrency=(1, 8))
    return dec.map_batches(_audio_code_stats, batch_format="pyarrow")


_IMA_STEPS = ("[7,8,9,10,11,12,13,14,16,17,19,21,23,25,28,31,34,37,41,"
              "45,50,55,60,66,73,80,88,97,107,118,130,143,157,173,190,"
              "209,230,253,279,307,337,371,408,449,494,544,598,658,724,"
              "796,876,963,1060,1166,1282,1411,1552,1707,1878,2066,2272,"
              "2499,2749,3024,3327,3660,4026,4428,4871,5358,5894,6484,"
              "7132,7845,8630,9493,10442,11487,12635,13899,15289,16818,"
              "18500,20350,22385,24623,27086,29794,32767]")

ADPCM_SQL = f"""
WITH RECURSIVE numbered AS MATERIALIZED (
    SELECT doc_id, i, unicode(substring(text, i, 1)) AS c
    FROM documents,
         LATERAL unnest(generate_series(1, length(text))) AS t(i)
),
lens AS MATERIALIZED (
    SELECT doc_id, length(text) AS n FROM documents
),
steps AS (SELECT {_IMA_STEPS} AS st),
rec AS (
    -- state AFTER sample i: predictor p (== decoded sample i), step
    -- index ix, running sum s, first decoded sample f
    SELECT doc_id, 0 AS i, CAST(0 AS BIGINT) AS p, CAST(0 AS BIGINT) AS ix,
           CAST(0 AS BIGINT) AS s, CAST(NULL AS BIGINT) AS f
    FROM lens
    UNION ALL
    SELECT doc_id, i, np AS p,
           least(88, greatest(0, ix + CASE b2 * 4 + b1 * 2 + b0
                 WHEN 4 THEN 2 WHEN 5 THEN 4 WHEN 6 THEN 6 WHEN 7 THEN 8
                 ELSE -1 END)) AS ix,
           s + np AS s, coalesce(f, np) AS f
    FROM (
        SELECT *, least(32767, greatest(-32768,
               p + CASE WHEN sgn THEN -vp ELSE vp END)) AS np
        FROM (
            SELECT *, st8 + b2 * step + b1 * h1 + b0 * h2 AS vp
            FROM (
                SELECT *, CASE WHEN a1 - (CASE WHEN a1 >= h1 THEN 1
                               ELSE 0 END) * h1 >= h2 THEN 1 ELSE 0
                               END AS b0,
                       CASE WHEN a1 >= h1 THEN 1 ELSE 0 END AS b1
                FROM (
                    SELECT *, CASE WHEN ad >= step THEN 1 ELSE 0 END AS b2,
                           ad - (CASE WHEN ad >= step THEN 1 ELSE 0 END)
                              * step AS a1
                    FROM (
                        SELECT r.doc_id, n.i, r.p, r.ix, r.s, r.f,
                               st[CAST(r.ix AS INTEGER) + 1] AS step,
                               st[CAST(r.ix AS INTEGER) + 1] // 2 AS h1,
                               st[CAST(r.ix AS INTEGER) + 1] // 4 AS h2,
                               st[CAST(r.ix AS INTEGER) + 1] // 8 AS st8,
                               n.c - r.p < 0 AS sgn, abs(n.c - r.p) AS ad
                        FROM rec r
                        JOIN numbered n
                          ON n.doc_id = r.doc_id AND n.i = r.i + 1
                        CROSS JOIN steps
                    ) q1
                ) q2
            ) q3
        ) q4
    ) q5
)
SELECT l.doc_id AS media_id,
       CAST(l.n AS BIGINT) AS n_samples,
       r.s AS sum_codes,
       CAST(coalesce(r.f, -1) AS BIGINT) AS first_code,
       CAST(CASE WHEN l.n = 0 THEN -1 ELSE r.p END AS BIGINT) AS last_code
FROM lens l JOIN rec r ON r.doc_id = l.doc_id AND r.i = l.n
"""


def q_ams_f2_users(sf_dir: str):
    """AMS F2 sketch of the per-user event-count frequency vector
    (``stages/sketches.py:ams_f2``; Alon-Matias-Szegedy, STOC 1996):
    30 sign counters from a 4-wise cubic hash mod 2^31-1, one stream
    occurrence per event row. Deterministic coefficients make the
    counters (and so the median-of-means estimate) bit-exact in SQL;
    each block collapses to 30 partial int64s before the one tiny
    grouped sum."""
    from ...stages.sketches import ams_f2

    ev = _read_parquet_clean(f"{sf_dir}/events.parquet",
                             columns=["user_id"]).repartition(8)
    return ams_f2(ev, key_col="user_id", r=30, group=6)


AMS_SQL = '''
WITH params AS (
    SELECT * FROM (VALUES (0, 506952114, 1013904228, 1520856342, 2027808456), (1, 387276923, 894229037, 1401181151, 1908133265), (2, 267601732, 774553846, 1281505960, 1788458074), (3, 147926541, 654878655, 1161830769, 1668782883), (4, 28251350, 535203464, 1042155578, 1549107692), (5, 2056059806, 415528273, 922480387, 1429432501), (6, 1936384615, 295853082, 802805196, 1309757310), (7, 1816709424, 176177891, 683130005, 1190082119), (8, 1697034233, 56502700, 563454814, 1070406928), (9, 1577359042, 2084311156, 443779623, 950731737), (10, 1457683851, 1964635965, 324104432, 831056546), (11, 1338008660, 1844960774, 204429241, 711381355), (12, 1218333469, 1725285583, 84754050, 591706164), (13, 1098658278, 1605610392, 2112562506, 472030973), (14, 978983087, 1485935201, 1992887315, 352355782), (15, 859307896, 1366260010, 1873212124, 232680591), (16, 739632705, 1246584819, 1753536933, 113005400), (17, 619957514, 1126909628, 1633861742, 2140813856), (18, 500282323, 1007234437, 1514186551, 2021138665), (19, 380607132, 887559246, 1394511360, 1901463474), (20, 260931941, 767884055, 1274836169, 1781788283), (21, 141256750, 648208864, 1155160978, 1662113092), (22, 21581559, 528533673, 1035485787, 1542437901), (23, 2049390015, 408858482, 915810596, 1422762710), (24, 1929714824, 289183291, 796135405, 1303087519), (25, 1810039633, 169508100, 676460214, 1183412328), (26, 1690364442, 49832909, 556785023, 1063737137), (27, 1570689251, 2077641365, 437109832, 944061946), (28, 1451014060, 1957966174, 317434641, 824386755), (29, 1331338869, 1838290983, 197759450, 704711564)) t(j, a3, a2, a1, a0)
),
signs AS (
    SELECT p.j,
           1 - 2 * (((((p.a3 * (e.user_id % 2147483647) + p.a2) % 2147483647)
                      * (e.user_id % 2147483647) + p.a1) % 2147483647
                     * (e.user_id % 2147483647) + p.a0) % 2147483647 % 2) AS s
    FROM events e CROSS JOIN params p
),
ctr AS (
    SELECT j, CAST(sum(s) AS BIGINT) AS c FROM signs GROUP BY j
)
SELECT CAST(j AS BIGINT) AS j, CAST(j // 6 AS BIGINT) AS grp, c, c * c AS c2 FROM ctr
'''


def q_hilbert_zone_maps_events(sf_dir: str):
    """Hilbert-curve clustering manifest (``stages/hilbert.py``): the
    locality-preserving sibling of ``zorder_zone_maps_events`` — index
    (user_id, hour-bucket) on a 256x256 Hilbert grid, emit
    per-partition zone maps. The xy->d rotate-and-reflect walk is
    vectorized across rows per bit level; the oracle replays the same
    walk per row through a recursive CTE. Block-local zone-map
    partials, one constant-size shuffle; rows never move."""
    from ...stages.hilbert import hilbert_zone_maps

    ds = _read_parquet_clean(f"{sf_dir}/events.parquet",
                             columns=["user_id", "ts"]).repartition(8)

    def _dims(b: pa.Table) -> pa.Table:
        ts_us = pc.cast(b["ts"], pa.int64())
        hour = pc.divide(ts_us, pa.scalar(3_600_000_000, pa.int64()))
        return pa.table({"d0": b["user_id"], "d1": hour})

    return hilbert_zone_maps(ds.map_batches(_dims, batch_format="pyarrow"),
                             d0_col="d0", d1_col="d1", bits=8,
                             parts_log2=4, num_partitions=2)


HILBERT_SQL = """
WITH RECURSIVE e AS MATERIALIZED (
    SELECT event_id, user_id % 256 AS d0,
           (epoch_us(ts) // 3600000000) % 256 AS d1
    FROM events
),
walk AS (
    -- per row: (x, y) frame, accumulated index d, current level s;
    -- the level digit (3*rx) XOR ry is restated arithmetically as
    -- 3*rx + ry*(1 - 2*rx) — identical expression to the engine
    SELECT event_id, d0 AS x, d1 AS y, CAST(0 AS BIGINT) AS d,
           CAST(128 AS BIGINT) AS s
    FROM e
    UNION ALL
    SELECT event_id,
           CASE WHEN ry = 0
                THEN (CASE WHEN rx = 1 THEN s - 1 - y ELSE y END)
                ELSE x END AS x,
           CASE WHEN ry = 0
                THEN (CASE WHEN rx = 1 THEN s - 1 - x ELSE x END)
                ELSE y END AS y,
           d + s * s * (3 * rx + ry * (1 - 2 * rx)) AS d,
           s // 2 AS s
    FROM (
        SELECT event_id, x, y, d, s,
               CASE WHEN (x & s) > 0 THEN 1 ELSE 0 END AS rx,
               CASE WHEN (y & s) > 0 THEN 1 ELSE 0 END AS ry
        FROM walk WHERE s > 0
    ) q
),
h AS (SELECT event_id, d FROM walk WHERE s = 0)
SELECT h.d >> 12 AS p, count(*) AS n,
       min(e.d0) AS min_d0, max(e.d0) AS max_d0,
       min(e.d1) AS min_d1, max(e.d1) AS max_d1,
       min(h.d) AS min_h, max(h.d) AS max_h
FROM e JOIN h USING (event_id)
GROUP BY 1
"""


W1H = 3600 * US


def q_theta_1h(sf_dir: str):
    """Theta-method forecast per event_type over the 1h tier
    (``stages/smoothing.py:theta_fixed_point``; Assimakopoulos &
    Nikolopoulos 2000, via the SES-plus-half-trend equivalence of
    Hyndman & Billah 2003): integer-shift SES level (alpha = 1/8),
    exact rational OLS slope, sign-handled floor drift — 12 forecast
    steps per series, every value bit-exact in SQL."""
    from ...stages.rollup import rollup
    from ...stages.smoothing import theta_fixed_point
    from .downsample_core import _events_cents

    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    rolled = rollup(ev.map_batches(_series, batch_format="pyarrow"), W1H)
    return theta_fixed_point(rolled, ka=3, horizon=12, num_partitions=2)


THETA_SQL = f"""
WITH RECURSIVE numbered AS MATERIALIZED (
    SELECT event_type AS series_id, bucket, y,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY bucket) AS idx
    FROM (
        SELECT event_type, epoch_us(ts) // {W1H} * {W1H} AS bucket,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
        FROM events GROUP BY event_type, bucket
    )
),
rec AS (
    SELECT series_id, idx, y AS ema FROM numbered WHERE idx = 1
    UNION ALL
    SELECT n.series_id, n.idx,
           r.ema + (CASE WHEN n.y - r.ema >= 0 THEN (n.y - r.ema) // 8
                    ELSE -(((-(n.y - r.ema)) + 7) // 8) END)
    FROM rec r JOIN numbered n
      ON n.series_id = r.series_id AND n.idx = r.idx + 1
),
stats AS (
    SELECT series_id, CAST(count(*) AS BIGINT) AS n,
           CAST(sum((idx - 1) * y) AS BIGINT) AS sty,
           CAST(sum(idx - 1) AS BIGINT) AS st,
           CAST(sum(y) AS BIGINT) AS sy,
           CAST(sum((idx - 1) * (idx - 1)) AS BIGINT) AS stt
    FROM numbered GROUP BY 1
),
slope AS (
    SELECT series_id, n * sty - st * sy AS bn, n * stt - st * st AS bd
    FROM stats
),
lvl AS (
    SELECT r.series_id, r.ema AS level
    FROM rec r JOIN (SELECT series_id, max(idx) AS mi
                     FROM numbered GROUP BY 1) m
      ON r.series_id = m.series_id AND r.idx = m.mi
)
SELECT l.series_id, h.h, l.level, s.bn, s.bd,
       l.level + (CASE WHEN s.bd = 0 THEN 0
                  WHEN h.h * s.bn >= 0 THEN (h.h * s.bn) // (2 * s.bd)
                  ELSE -(((-(h.h * s.bn)) + 2 * s.bd - 1) // (2 * s.bd))
                  END) AS forecast
FROM lvl l
JOIN slope s USING (series_id)
CROSS JOIN (SELECT unnest(generate_series(1, 12)) AS h) h
"""


def q_delta_rollup_15m(sf_dir: str):
    """Incremental continuous-aggregate maintenance
    (``stages/rollup.py:merge_tiers``; the TimescaleDB invalidation
    contract): the 15m tier is built as a BASE tier over events with
    ``epoch_us(ts) % 3 != 0`` plus a DELTA tier over the rest (the
    append slice — at scale these are separate inputs), then merged by
    associative partials (min/min, max/max, sum+sum, n+n). The oracle
    replays a FULL rebuild over all events — hash-equality IS the
    proof that incremental maintenance is exact."""
    from ...stages.rollup import merge_tiers, rollup

    def _side(keep_delta: bool):
        ds = _read_parquet_clean(f"{sf_dir}/events.parquet",
                                 columns=["event_type", "ts", "value"])

        def _series(b: pa.Table) -> pa.Table:
            ts_us = pc.cast(b["ts"], pa.int64())
            cents = pc.cast(pc.round(pc.multiply(b["value"], 100.0),
                                     ndigits=0), pa.int64())
            t = pa.table({"series_id": b["event_type"], "x": ts_us,
                          "y": cents})
            is_delta = pc.equal(pc.subtract(
                ts_us, pc.multiply(pc.divide(ts_us, pa.scalar(3, pa.int64())),
                                   pa.scalar(3, pa.int64()))),
                pa.scalar(0, pa.int64()))
            return t.filter(is_delta if keep_delta else
                            pc.invert(is_delta))

        return rollup(ds.map_batches(_series, batch_format="pyarrow"),
                      W15M)

    return merge_tiers(_side(False), _side(True))


DELTA_ROLLUP_SQL = f"""
SELECT event_type AS series_id,
       epoch_us(ts) // {W15M} * {W15M} AS bucket,
       CAST(min(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS min_y,
       CAST(max(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS max_y,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_y,
       CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY 1, 2
"""


_MW_TERMS = ("table", "scan", "hash")


def q_min_window_docs(sf_dir: str):
    """Minimal proximity window for the conjunctive query {table, scan,
    hash} (``stages/retrieval.py:min_cover_window``; the positional
    MINDIST ranking signal): per document containing all three terms,
    the shortest token span covering one occurrence of each plus the
    per-term counts. The textbook linear scan vectorized as numpy
    ffills over doc-offset positions — no shuffle at all; the SQL
    oracle brute-forces the same minimum over the three position
    lists' cross product."""
    from ...stages.retrieval import min_cover_window

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"]).repartition(8)
    return min_cover_window(ds, _MW_TERMS)


MIN_WINDOW_SQL = f"""
WITH d AS MATERIALIZED (
    SELECT doc_id, string_split(text, ' ') AS arr FROM documents
),
p AS MATERIALIZED (
    SELECT doc_id, i - 1 AS pos, arr[i] AS tok
    FROM d, LATERAL unnest(generate_series(1, len(arr))) AS t(i)
),
p0 AS (SELECT doc_id, pos FROM p WHERE tok = '{_MW_TERMS[0]}'),
p1 AS (SELECT doc_id, pos FROM p WHERE tok = '{_MW_TERMS[1]}'),
p2 AS (SELECT doc_id, pos FROM p WHERE tok = '{_MW_TERMS[2]}'),
m AS (
    SELECT p0.doc_id,
           CAST(min(greatest(p0.pos, p1.pos, p2.pos)
                    - least(p0.pos, p1.pos, p2.pos) + 1) AS BIGINT)
               AS min_span
    FROM p0
    JOIN p1 ON p1.doc_id = p0.doc_id
    JOIN p2 ON p2.doc_id = p0.doc_id
    GROUP BY 1
),
c AS (
    SELECT doc_id,
           CAST(count(*) FILTER (tok = '{_MW_TERMS[0]}') AS BIGINT) AS n_0,
           CAST(count(*) FILTER (tok = '{_MW_TERMS[1]}') AS BIGINT) AS n_1,
           CAST(count(*) FILTER (tok = '{_MW_TERMS[2]}') AS BIGINT) AS n_2
    FROM p GROUP BY 1
)
SELECT m.doc_id, c.n_0, c.n_1, c.n_2, m.min_span
FROM m JOIN c ON c.doc_id = m.doc_id
"""


_MD5FOLD = ("list_reduce(list_prepend(0::HUGEINT, "
            "list_transform(range(1, 17), i -> "
            "CAST(strpos('0123456789abcdef', substring(md5({expr}), i, 1))"
            " - 1 AS HUGEINT))), (h, d) -> h * 16 + d)")
_RING_WRAP = "18446744073709551616"  # 2^64


def q_ring_rebalance_docs(sf_dir: str):
    """Consistent-hash ring rebalance audit
    (``stages/ring.py:ring_rebalance_audit``; Karger et al. 1997): each
    doc key's owner on a 16-node and a 17-node ring (32 vnodes each,
    md5-u64 positions) and whether growing the cluster moved it — the
    minimal-reshuffle guarantee, replayed key by key in SQL via the
    md5-hex fold and the clockwise-distance argmin."""
    from ...stages.ring import ring_rebalance_audit

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id"]).repartition(8)
    return ring_rebalance_audit(ds, n_nodes=16, vnodes=32)


def _ring_sql() -> str:
    kfold = _MD5FOLD.format(expr="'doc:' || CAST(doc_id AS VARCHAR)")
    rfold = _MD5FOLD.format(
        expr="'n' || CAST(n AS VARCHAR) || ':v' || CAST(v AS VARCHAR)")
    own = """
own_{s} AS (
    SELECT doc_id, node AS owner_{s} FROM (
        SELECT k.doc_id, r.node,
               row_number() OVER (PARTITION BY k.doc_id
                   ORDER BY (r.pos - k.kpos + {W}) % {W}, r.node) AS rn
        FROM keys k CROSS JOIN ring_{s} r
    ) q WHERE rn = 1
)"""
    return f"""
WITH ring_a AS (
    SELECT n AS node, {rfold} AS pos
    FROM (SELECT unnest(generate_series(0, 15)) AS n),
         (SELECT unnest(generate_series(0, 31)) AS v)
),
ring_b AS (
    SELECT n AS node, {rfold} AS pos
    FROM (SELECT unnest(generate_series(0, 16)) AS n),
         (SELECT unnest(generate_series(0, 31)) AS v)
),
keys AS (SELECT doc_id, {kfold} AS kpos FROM documents),
{own.format(s='a', W=_RING_WRAP)},
{own.format(s='b', W=_RING_WRAP)}
SELECT k.doc_id, a.owner_a, b.owner_b,
       a.owner_a <> b.owner_b AS moved
FROM keys k
JOIN own_a a ON a.doc_id = k.doc_id
JOIN own_b b ON b.doc_id = k.doc_id
"""


RING_SQL = _ring_sql()


def q_meeting_select_users(sf_dir: str):
    """Greedy maximum non-overlapping interval selection per user
    (``stages/intervals.py:activity_selection``; earliest-finish-first,
    provably optimal): deterministic intervals derived from events
    (start = ts, duration = (|cents| % 7200 + 60) s), one hash(user)
    shuffle, per-user sequential greedy chain over (end, start) order
    — replayed by a recursive-CTE walk in SQL."""
    from ...stages.intervals import activity_selection

    ds = _read_parquet_clean(f"{sf_dir}/events.parquet",
                             columns=["user_id", "ts", "value"])

    def _iv(b: pa.Table) -> pa.Table:
        ts_us = pc.cast(b["ts"], pa.int64())
        cents = pc.cast(pc.round(pc.multiply(b["value"], 100.0),
                                 ndigits=0), pa.int64())
        import numpy as _np

        c = pc.abs(cents).to_numpy(zero_copy_only=False)
        s = ts_us.to_numpy(zero_copy_only=False)
        dur = (c % 7200 + 60) * 1_000_000
        return pa.table({"user_id": b["user_id"],
                         "start": pa.array(s),
                         "end": pa.array(s + dur)})

    return activity_selection(ds.map_batches(_iv, batch_format="pyarrow"),
                              key_col="user_id", num_partitions=4)


MEETING_SQL = """
WITH RECURSIVE iv AS MATERIALIZED (
    SELECT user_id, epoch_us(ts) AS s,
           epoch_us(ts)
             + (abs(CAST(round(value * 100) AS BIGINT)) % 7200 + 60)
               * 1000000 AS e
    FROM events
),
numbered AS MATERIALIZED (
    SELECT user_id, s, e,
           row_number() OVER (PARTITION BY user_id ORDER BY e, s) AS idx,
           count(*) OVER (PARTITION BY user_id) AS n
    FROM iv
),
rec AS (
    SELECT user_id, idx, n, CAST(1 AS BIGINT) AS cnt, e AS last_end
    FROM numbered WHERE idx = 1
    UNION ALL
    SELECT m.user_id, m.idx, m.n,
           r.cnt + CASE WHEN m.s >= r.last_end THEN 1 ELSE 0 END,
           CASE WHEN m.s >= r.last_end THEN m.e ELSE r.last_end END
    FROM rec r JOIN numbered m
      ON m.user_id = r.user_id AND m.idx = r.idx + 1
)
SELECT user_id, CAST(n AS BIGINT) AS n_intervals,
       cnt AS n_selected, last_end
FROM rec WHERE idx = n
"""


_RANSAC_EPS = 2000


def q_ransac_line_1h(sf_dir: str):
    """Deterministic RANSAC consensus line per event_type over the 1h
    tier (``stages/quantiles.py:ransac_line``; Fischler-Bolles 1981
    with a fixed evenly-rank-spaced anchor design): 28 candidate lines
    per series, inliers counted via exact cross-multiplied residual
    bands (eps = 2000 cents), winner = max inliers with ties to the
    smaller anchor pair — every count replayed in SQL."""
    from ...stages.quantiles import ransac_line
    from ...stages.rollup import rollup
    from .downsample_core import _events_cents

    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    rolled = rollup(ev.map_batches(_series, batch_format="pyarrow"), W1H)
    return ransac_line(rolled, eps=_RANSAC_EPS, anchors=8,
                       num_partitions=2)


RANSAC_SQL = f"""
WITH numbered AS MATERIALIZED (
    SELECT event_type AS series_id, y,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY bucket) - 1 AS x,
           count(*) OVER (PARTITION BY event_type) AS n
    FROM (
        SELECT event_type, epoch_us(ts) // {3600 * US} * {3600 * US}
                   AS bucket,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
        FROM events GROUP BY event_type, bucket
    )
),
-- anchor i sits at 0-based rank i*n//8 (engine contract; series here
-- always have n >= 2 distinct anchor ranks)
anch AS (
    SELECT m.series_id, g.i, m.x, m.y
    FROM (SELECT unnest(generate_series(0, 7)) AS i) g
    JOIN numbered m
      ON m.x = (g.i * m.n) // 8
),
cands AS (
    SELECT a.series_id, a.i, b.i AS j, a.x AS x1, a.y AS y1,
           b.x - a.x AS dx, b.y - a.y AS dy
    FROM anch a JOIN anch b
      ON b.series_id = a.series_id AND a.i < b.i AND b.x <> a.x
),
inl AS (
    SELECT c.series_id, c.i, c.j,
           CAST(count(*) FILTER (
               abs((m.y - c.y1) * c.dx - (m.x - c.x1) * c.dy)
               <= {_RANSAC_EPS} * c.dx) AS BIGINT) AS cnt
    FROM cands c JOIN numbered m ON m.series_id = c.series_id
    GROUP BY 1, 2, 3
)
SELECT series_id, CAST(any_value(n) AS BIGINT) AS n, c_i, c_j, n_inliers
FROM (
    SELECT i.series_id, CAST(i.i AS BIGINT) AS c_i,
           CAST(i.j AS BIGINT) AS c_j, i.cnt AS n_inliers,
           row_number() OVER (PARTITION BY i.series_id
                              ORDER BY i.cnt DESC, i.i, i.j) AS rn
    FROM inl i
) w JOIN numbered USING (series_id)
WHERE rn = 1
GROUP BY series_id, c_i, c_j, n_inliers
"""


_SC_TAU = 300  # SAD cut threshold
_SC_PAD = 255  # per-missing-byte penalty when frame lengths differ


def q_scene_change_frames(sf_dir: str):
    """Scene-change detection over the REAL MP4 demux path: every frame
    of each doc's genuine ISO BMFF container (the
    ``multimodal_frame_sample`` fixture with the EveryNth identity
    short-circuit selecting ALL frames), consecutive-frame SAD = sum of
    per-byte absolute differences over the common prefix plus 255 per
    missing byte, a CUT where SAD >= 300. Exact integers end to end;
    the SQL oracle replays the frame plan and every SAD over ``text``
    — binding mux -> demux -> full-frame extraction -> pairwise
    differencing. Per doc: ``(media_id, n_frames, n_cuts, max_sad,
    sum_sad)``."""
    import numpy as _np

    from ...stages.multimodal import SampleFrames, encode_mp4

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text", "n_chars"])

    def _media(b: pa.Table) -> pa.Table:
        payloads = []
        for t, nc in zip(b["text"].to_pylist(), b["n_chars"].to_pylist()):
            raw = t.encode()
            n_total = 8 + nc % 25
            frames = [raw[(i * 11) % (nc - 4):
                          (i * 11) % (nc - 4) + 1 + (i + nc) % 5]
                      for i in range(n_total)]
            payloads.append(encode_mp4(frames, fps=25, timescale=1000))
        return pa.table({
            "media_id": b["doc_id"],
            "kind": pa.array(["video"] * b.num_rows),
            "payload": pa.array(payloads, pa.binary()),
            "duration_ms": pc.cast(pc.multiply(b["n_chars"], 40),
                                   pa.int32()),
        })

    media = ds.map_batches(_media, batch_format="pyarrow", batch_size=256)
    sampled = media.map_batches(
        SampleFrames, fn_constructor_kwargs={"n_frames": 64, "fake": False},
        batch_format="pyarrow", batch_size=256, concurrency=(1, 8))

    def _cuts(b: pa.Table) -> pa.Table:
        fr = b["frames"]
        if isinstance(fr, pa.ChunkedArray):
            fr = fr.combine_chunks()
        n_fr, n_cuts, mx, sm = [], [], [], []
        for flist in fr.to_pylist():
            sads = []
            for a, c in zip(flist, flist[1:]):
                m = min(len(a), len(c))
                sad = sum(abs(a[k] - c[k]) for k in range(m)) \
                    + _SC_PAD * (max(len(a), len(c)) - m)
                sads.append(sad)
            n_fr.append(len(flist))
            n_cuts.append(sum(s >= _SC_TAU for s in sads))
            mx.append(max(sads) if sads else -1)
            sm.append(sum(sads))
        return pa.table({
            "media_id": b["media_id"],
            "n_frames": pa.array(n_fr, pa.int64()),
            "n_cuts": pa.array(n_cuts, pa.int64()),
            "max_sad": pa.array(mx, pa.int64()),
            "sum_sad": pa.array(sm, pa.int64())})

    return sampled.map_batches(_cuts, batch_format="pyarrow")


SCENE_SQL = f"""
WITH d AS MATERIALIZED (
    SELECT doc_id, text, n_chars, 8 + n_chars % 25 AS n_total
    FROM documents
),
f AS MATERIALIZED (
    SELECT d.doc_id, i.i,
           substr(d.text, 1 + (i.i * 11) % (d.n_chars - 4),
                  1 + (i.i + d.n_chars) % 5) AS fr
    FROM d JOIN LATERAL unnest(generate_series(0, d.n_total - 1))
        AS i(i) ON TRUE
),
sad AS (
    SELECT a.doc_id,
           CAST(coalesce(list_sum(list_transform(
                    range(1, least(length(a.fr), length(b.fr)) + 1),
                    k -> abs(unicode(substr(a.fr, k, 1))
                             - unicode(substr(b.fr, k, 1))))), 0)
                + {_SC_PAD} * (greatest(length(a.fr), length(b.fr))
                               - least(length(a.fr), length(b.fr)))
                AS BIGINT) AS s
    FROM f a JOIN f b ON b.doc_id = a.doc_id AND b.i = a.i + 1
)
SELECT d.doc_id AS media_id,
       CAST(d.n_total AS BIGINT) AS n_frames,
       CAST(coalesce(sum(CASE WHEN s.s >= {_SC_TAU} THEN 1 ELSE 0 END),
                     0) AS BIGINT) AS n_cuts,
       CAST(coalesce(max(s.s), -1) AS BIGINT) AS max_sad,
       CAST(coalesce(sum(s.s), 0) AS BIGINT) AS sum_sad
FROM d LEFT JOIN sad s ON s.doc_id = d.doc_id
GROUP BY d.doc_id, d.n_total
"""


def q_soundex_blocks_docs(sf_dir: str):
    """Phonetic blocking keys over the corpus vocabulary
    (``stages/strsim.py:soundex_blocks``; American Soundex — Russell
    1918, the record-linkage blocking classic): every distinct [a-z]+
    token's code (H/W transparent, vowels separating, equal codes
    collapsing), blocks with term counts and the smallest member.
    Soundex runs once per batch-unique term (vocabulary-bounded); the
    oracle replays the letter walk with a recursive CTE per distinct
    term."""
    from ...stages.strsim import soundex_blocks

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["text"]).repartition(8)
    return soundex_blocks(ds, num_partitions=4)


SOUNDEX_SQL = """
WITH RECURSIVE terms AS MATERIALIZED (
    SELECT DISTINCT tok AS term
    FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
    WHERE regexp_matches(tok, '^[a-z]+$')
),
-- letter walk: state AFTER char i = (acc, prev code); H/W skip without
-- touching prev, vowels reset prev to '0', codes append when they
-- differ from prev and acc < 4 chars
walk AS (
    SELECT term, 1 AS i,
           upper(substr(term, 1, 1)) AS acc,
           CASE
             WHEN substr(term, 1, 1) IN ('b','f','p','v') THEN '1'
             WHEN substr(term, 1, 1) IN
                  ('c','g','j','k','q','s','x','z') THEN '2'
             WHEN substr(term, 1, 1) IN ('d','t') THEN '3'
             WHEN substr(term, 1, 1) = 'l' THEN '4'
             WHEN substr(term, 1, 1) IN ('m','n') THEN '5'
             WHEN substr(term, 1, 1) = 'r' THEN '6'
             ELSE '0' END AS prev
    FROM terms
    UNION ALL
    SELECT term, i + 1,
           CASE WHEN ch IN ('h','w') THEN acc
                WHEN c <> '0' AND c <> prev AND length(acc) < 4
                THEN acc || c ELSE acc END,
           CASE WHEN ch IN ('h','w') THEN prev ELSE c END
    FROM (
        SELECT w.term, w.i, w.acc, w.prev,
               substr(w.term, w.i + 1, 1) AS ch,
               CASE
                 WHEN substr(w.term, w.i + 1, 1) IN
                      ('b','f','p','v') THEN '1'
                 WHEN substr(w.term, w.i + 1, 1) IN
                      ('c','g','j','k','q','s','x','z') THEN '2'
                 WHEN substr(w.term, w.i + 1, 1) IN ('d','t') THEN '3'
                 WHEN substr(w.term, w.i + 1, 1) = 'l' THEN '4'
                 WHEN substr(w.term, w.i + 1, 1) IN ('m','n') THEN '5'
                 WHEN substr(w.term, w.i + 1, 1) = 'r' THEN '6'
                 ELSE '0' END AS c
        FROM walk w WHERE w.i < length(w.term)
    ) q
),
fin AS (
    SELECT term, acc || repeat('0', 4 - length(acc)) AS code
    FROM walk WHERE i = length(term)
)
SELECT code, CAST(count(*) AS BIGINT) AS n_terms,
       min(term) AS min_term
FROM fin GROUP BY code
"""


_BUDGET_QTY = 250_000


def q_budget_select_lineitems(sf_dir: str):
    """Greedy fractional-knapsack admission under a quantity budget
    (``stages/prefixscan.py:budget_select``): lineitems in best
    value-per-unit order (exact integer ratio ``cents*1e6 // qty``,
    ties by (orderkey, linenumber)), selected while the inclusive
    running quantity stays within 250k — the cache-admission /
    retention-budget primitive, built on a Ray range sort + the
    Blelloch two-pass block prefix scan (driver reads ONE row per
    sorted block). Output one row: totals of the selection."""
    from ...stages.prefixscan import budget_select

    ds = _read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_extendedprice",
                 "l_quantity"]).repartition(8)

    def _prep(b: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(b["l_extendedprice"], 100.0),
                                 ndigits=0), pa.int64())
        qty = pc.cast(b["l_quantity"], pa.int64())
        import numpy as _np

        c = cents.to_numpy(zero_copy_only=False)
        q = qty.to_numpy(zero_copy_only=False)
        return pa.table({
            "ratio": pa.array(c * 1_000_000 // q),
            "l_orderkey": b["l_orderkey"],
            "l_linenumber": b["l_linenumber"],
            "qty": qty, "cents": cents})

    prepped = ds.map_batches(_prep, batch_format="pyarrow")
    return budget_select(
        prepped, order_cols=["ratio", "l_orderkey", "l_linenumber"],
        descending=[True, False, False], cost_col="qty",
        value_col="cents", budget=_BUDGET_QTY)


BUDGET_SELECT_SQL = f"""
WITH l AS (
    SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
           CAST(l_quantity AS BIGINT) AS qty,
           l_orderkey, l_linenumber,
           (CAST(round(l_extendedprice * 100) AS BIGINT) * 1000000)
               // CAST(l_quantity AS BIGINT) AS ratio
    FROM lineitem
),
w AS (
    SELECT cents, qty,
           sum(qty) OVER (ORDER BY ratio DESC, l_orderkey, l_linenumber
                          ROWS UNBOUNDED PRECEDING) AS running
    FROM l
)
SELECT CAST(count(*) AS BIGINT) AS n_total,
       CAST(count(*) FILTER (running <= {_BUDGET_QTY}) AS BIGINT)
           AS n_selected,
       CAST(coalesce(sum(qty) FILTER (running <= {_BUDGET_QTY}), 0)
            AS BIGINT) AS sel_cost,
       CAST(coalesce(sum(cents) FILTER (running <= {_BUDGET_QTY}), 0)
            AS BIGINT) AS sel_value
FROM w
"""


def q_gapfill_seasonal_1h(sf_dir: str):
    """Seasonal-slot mean imputation over a sparsified 1h tier
    (``stages/gapfill.py:gapfill_seasonal``): buckets with
    ``(bucket // 1h) % 5 == 3`` are withheld to create gaps, and every
    missing hour takes the floor mean of its series' PRESENT buckets
    in the same hour-of-day slot — the diurnal-profile imputation.
    One hash(series) shuffle, slot means as m-cell scatter-adds inside
    the partition pass; the oracle replays grid, slot means and
    sign-exact floors."""
    from ...stages.gapfill import gapfill_seasonal
    from ...stages.rollup import rollup
    from .downsample_core import _events_cents

    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    rolled = rollup(ev.map_batches(_series, batch_format="pyarrow"), W1H)

    def _sparsify(b: pa.Table) -> pa.Table:
        import numpy as _np

        bkt = b["bucket"].to_numpy(zero_copy_only=False)
        keep = (bkt // W1H) % 5 != 3
        return b.filter(pa.array(keep))

    sparse = rolled.map_batches(_sparsify, batch_format="pyarrow")
    return gapfill_seasonal(sparse, W1H, m=24, num_partitions=2)


GAPFILL_SEASONAL_SQL = f"""
WITH tier AS MATERIALIZED (
    SELECT event_type AS series_id,
           epoch_us(ts) // {W1H} * {W1H} AS bucket,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
    FROM events GROUP BY 1, 2
),
sparse AS MATERIALIZED (
    SELECT * FROM tier WHERE (bucket // {W1H}) % 5 <> 3
),
bounds AS (
    SELECT series_id, min(bucket) AS lo, max(bucket) AS hi
    FROM sparse GROUP BY 1
),
grid AS (
    SELECT b.series_id, b.lo + g.g * {W1H} AS bucket
    FROM bounds b,
         LATERAL unnest(generate_series(0, (b.hi - b.lo) // {W1H}))
             AS g(g)
),
slots AS (
    SELECT series_id, (bucket // {W1H}) % 24 AS slot,
           CAST(sum(y) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS c
    FROM sparse GROUP BY 1, 2
)
SELECT g.series_id, g.bucket,
       CASE WHEN p.y IS NOT NULL THEN p.y
            WHEN sl.c IS NULL THEN 0
            WHEN sl.s >= 0 THEN sl.s // sl.c
            ELSE -(((-sl.s) + sl.c - 1) // sl.c) END AS y,
       p.y IS NULL AS is_gap
FROM grid g
LEFT JOIN sparse p
  ON p.series_id = g.series_id AND p.bucket = g.bucket
LEFT JOIN slots sl
  ON sl.series_id = g.series_id
 AND sl.slot = (g.bucket // {W1H}) % 24
"""


_LTOB_NOUT = 50


def q_ltob_events(sf_dir: str):
    """Largest-Triangle-One-Bucket downsample per event_type
    (``kernels/ltob.py``; Steinarsson 2013 §4.1 — the non-sequential
    member of the reference's triangle family): integer-exact
    equal-width index buckets, per-point doubled areas over immediate
    neighbors, per-bucket argmax with smallest-index ties; endpoints
    pinned. All-integer x (epoch us) and y (cents), so the SQL oracle
    replays layout, areas and argmax term by term."""
    from ...kernels.ltob import ltob
    from .downsample_core import _events_cents

    ds = _events_cents(sf_dir)

    def _group(tbl: pa.Table) -> pa.Table:
        idx = pc.sort_indices(tbl, sort_keys=[
            ("ts_us", "ascending"), ("event_id", "ascending")])
        tbl = tbl.take(idx)
        import numpy as _np

        x = tbl["ts_us"].to_numpy(zero_copy_only=False).astype(_np.int64)
        y = tbl["cents"].to_numpy(zero_copy_only=False).astype(_np.int64)
        sel = ltob(x, y, _LTOB_NOUT).astype(_np.int64)
        out = tbl.take(pa.array(sel))
        return out.select(["event_type", "event_id", "cents"])

    return ds.groupby("event_type").map_groups(_group,
                                               batch_format="pyarrow")


LTOB_SQL = f"""
WITH numbered AS MATERIALIZED (
    SELECT event_type, event_id,
           CAST(round(value * 100) AS BIGINT) AS cents,
           epoch_us(ts) AS x,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY ts, event_id) - 1 AS i,
           count(*) OVER (PARTITION BY event_type) AS n
    FROM events
),
ar AS (
    SELECT event_type, event_id, cents, i, n,
           abs((lag(x) OVER w - lead(x) OVER w)
                   * (cents - lead(cents) OVER w)
               - (x - lead(x) OVER w)
                   * (lag(cents) OVER w - lead(cents) OVER w)) AS area
    FROM numbered
    WINDOW w AS (PARTITION BY event_type ORDER BY i)
)
SELECT event_type, event_id, cents FROM (
    SELECT event_type, event_id, cents,
           row_number() OVER (
               PARTITION BY event_type,
                            ((i - 1) * {_LTOB_NOUT - 2}) // (n - 2)
               ORDER BY area DESC, i) AS rn
    FROM ar WHERE i BETWEEN 1 AND n - 2
) q WHERE rn = 1
UNION ALL
SELECT event_type, event_id, cents FROM numbered
WHERE i = 0 OR i = n - 1
"""


def q_ef_postings_docs(sf_dir: str):
    """Elias-Fano posting compression audit
    (``stages/postings.py:ef_postings``; Vigna WSDM 2013): per corpus
    token the real encoded-plane size, the low-bit width, and the sum
    of doc ids recovered by decoding — hash-compared against the SQL
    replay of the exact size formula and the direct id sum."""
    from ...stages.postings import ef_postings

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"]).repartition(8)
    return ef_postings(ds, num_partitions=8)


EF_POSTINGS_SQL = """
WITH w AS (
    SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
    FROM documents
),
w2 AS (SELECT token, doc_id FROM w WHERE token <> ''),
s AS (
    SELECT token, CAST(count(*) AS BIGINT) AS df,
           CAST(max(doc_id) AS BIGINT) AS mx,
           CAST(sum(doc_id) AS BIGINT) AS decoded_sum
    FROM w2 GROUP BY token
),
p AS (
    SELECT token, df, mx, decoded_sum,
           -- l = max(0, floor(log2(u // n))), u = mx + 1; bit_length
           -- via length(bin(k)) for k >= 1
           CAST(length(bin((mx + 1) // df)) - 1 AS BIGINT) AS l
    FROM s
)
SELECT token, df, 8 * df AS plain_bytes,
       (df + (mx >> l) + 1 + 7) // 8 + (df * l + 7) // 8 AS ef_bytes,
       l AS l_bits, decoded_sum
FROM p
"""


_BLOOM_M = 4096
_BLOOM_K = 3


def q_bloom_fpr_audit_users(sf_dir: str):
    """Bloom-filter false-positive-rate audit: build the
    ``bloom_semi_join`` filter (m=4096, k=3, hash61 bit pattern) over
    the member set ``user_id % 3 == 0`` and probe the DISJOINT set
    ``% 3 == 1`` — every false positive is a deterministic consequence
    of the bit pattern, so the SQL replay of the same hash61
    expressions reproduces the exact FP set. Output one row:
    ``(m_bits, k, n_member, n_probe, bits_set, fp_count)``."""
    import numpy as _np
    import ray as _ray

    from ...stages.graph import grouped_sum_parts
    from ...stages.sampling import hash61

    ds = _read_parquet_clean(f"{sf_dir}/events.parquet",
                             columns=["user_id"]).repartition(8)

    def _distinct(b: pa.Table) -> pa.Table:
        u = b["user_id"]
        if isinstance(u, pa.ChunkedArray):
            u = u.combine_chunks()
        return pa.table({"user_id": u.unique(),
                         "c": pa.array([1] * len(u.unique()), pa.int64())})

    users = grouped_sum_parts(
        ds.map_batches(_distinct, batch_format="pyarrow"),
        ["user_id"], [], count_col="c", fanin=4)

    def _positions(b: pa.Table) -> pa.Table:
        keys = b["user_id"].to_numpy(zero_copy_only=False).astype(
            _np.int64)
        keys = keys[keys % 3 == 0]
        pos = [(hash61(keys, salt=r) % _np.uint64(_BLOOM_M))
               .astype(_np.int64) for r in range(_BLOOM_K)]
        out = _np.unique(_np.concatenate(pos)) if len(keys) else \
            _np.zeros(0, _np.int64)
        return pa.table({"pos": pa.array(out),
                         "c": pa.array(_np.ones(len(out), _np.int64))})

    bits_rows = grouped_sum_parts(
        users.map_batches(_positions, batch_format="pyarrow"),
        ["pos"], [], count_col="c", fanin=2)
    bits = _np.zeros(_BLOOM_M, dtype=bool)
    for row in bits_rows.take_all():  # <= m_bits rows: bounded constant
        bits[row["pos"]] = True
    bits_ref = _ray.put(bits)

    def _audit(b: pa.Table) -> pa.Table:
        arr = _ray.get(bits_ref)
        keys = b["user_id"].to_numpy(zero_copy_only=False).astype(
            _np.int64)
        members = keys[keys % 3 == 0]
        probe = keys[keys % 3 == 1]
        ok = _np.ones(len(probe), dtype=bool)
        for r in range(_BLOOM_K):
            pos = (hash61(probe, salt=r) % _np.uint64(_BLOOM_M)) \
                .astype(_np.int64)
            ok &= arr[pos]
        return pa.table({
            "n_member_part": pa.array([len(members)], pa.int64()),
            "n_probe_part": pa.array([len(probe)], pa.int64()),
            "fp_part": pa.array([int(ok.sum())], pa.int64())})

    parts = users.map_batches(_audit, batch_format="pyarrow")

    def _final(b: pa.Table) -> pa.Table:
        import numpy as _np2

        return pa.table({
            "m_bits": pa.array([_BLOOM_M], pa.int64()),
            "k": pa.array([_BLOOM_K], pa.int64()),
            "n_member": pa.array([int(_np2.sum(
                b["n_member_part"].to_numpy(zero_copy_only=False)))],
                pa.int64()),
            "n_probe": pa.array([int(_np2.sum(
                b["n_probe_part"].to_numpy(zero_copy_only=False)))],
                pa.int64()),
            "bits_set": pa.array([int(bits.sum())], pa.int64()),
            "fp_count": pa.array([int(_np2.sum(
                b["fp_part"].to_numpy(zero_copy_only=False)))],
                pa.int64())})

    return parts.repartition(1).map_batches(_final,
                                            batch_format="pyarrow")


def _bloom_fpr_sql() -> str:
    from ...stages.sampling import hash61_sql

    probes = {s: hash61_sql("u.user_id", salt=s) for s in range(_BLOOM_K)}
    bit_union = "\nUNION\n".join(
        f"SELECT {hash61_sql('m.user_id', salt=s)} % {_BLOOM_M} AS pos "
        f"FROM members m" for s in range(_BLOOM_K))
    fp_conds = " AND ".join(
        f"EXISTS (SELECT 1 FROM bits b WHERE b.pos = "
        f"{probes[s]} % {_BLOOM_M})" for s in range(_BLOOM_K))
    return f"""
WITH users AS MATERIALIZED (SELECT DISTINCT user_id FROM events),
members AS MATERIALIZED (SELECT user_id FROM users WHERE user_id % 3 = 0),
probes AS MATERIALIZED (SELECT user_id FROM users WHERE user_id % 3 = 1),
bits AS MATERIALIZED ({bit_union})
SELECT CAST({_BLOOM_M} AS BIGINT) AS m_bits,
       CAST({_BLOOM_K} AS BIGINT) AS k,
       (SELECT CAST(count(*) AS BIGINT) FROM members) AS n_member,
       (SELECT CAST(count(*) AS BIGINT) FROM probes) AS n_probe,
       (SELECT CAST(count(*) AS BIGINT) FROM bits) AS bits_set,
       (SELECT CAST(count(*) AS BIGINT) FROM probes u
        WHERE {fp_conds}) AS fp_count
"""


BLOOM_FPR_SQL = _bloom_fpr_sql()


def q_median_select_events(sf_dir: str):
    """Global exact median of event cents via distributed radix-select
    (``stages/quantiles.py:radix_select``): 8 byte-histogram rounds,
    constant-size exchanges, no sort — the single-order-statistic
    shape for 100 TB. Oracle: the direct SQL order statistic."""
    from ...stages.quantiles import radix_select

    ds = _read_parquet_clean(f"{sf_dir}/events.parquet",
                             columns=["value"]).repartition(8)

    def _cents(b: pa.Table) -> pa.Table:
        return pa.table({"cents": pc.cast(
            pc.round(pc.multiply(b["value"], 100.0), ndigits=0),
            pa.int64())})

    return radix_select(ds.map_batches(_cents, batch_format="pyarrow"),
                        value_col="cents", k="median")


MEDIAN_SELECT_SQL = """
WITH c AS (
    SELECT CAST(round(value * 100) AS BIGINT) AS cents FROM events
),
n_ AS (SELECT CAST(count(*) AS BIGINT) AS n FROM c)
SELECT n_.n, (n_.n + 1) // 2 AS k,
       (SELECT cents FROM c ORDER BY cents
        LIMIT 1 OFFSET (SELECT (n + 1) // 2 - 1 FROM n_)) AS value
FROM n_
"""
