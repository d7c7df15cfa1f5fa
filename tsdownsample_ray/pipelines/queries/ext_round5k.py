"""Round-5 session-5 wave, part 1: Pettitt's non-parametric
change-point test (the rank-based sibling of the AMOC mean-shift split
already in the catalog), anagram grouping over the corpus vocabulary
(signature blocking — the char-multiset analogue of the Soundex
phonetic blocks), and front-coding compression statistics over the
sorted vocabulary (the classic dictionary prefix-compression layout).

Each entry follows the catalog contract: a Ray-Data-first distributed
shape documented in place, integer-exact arithmetic so the DuckDB
oracle replays bit-identically (the one float per query is a single
pinned IEEE expression evaluated with the identical tree on both
sides), and column names matched between both sides.
"""
from __future__ import annotations

from ._shared import US, _read_parquet_clean, pa, pc  # noqa: F401

W15M = 900 * US


def q_pettitt_15m(sf_dir: str):
    """Pettitt change-point test per event_type over the 15m tier
    (``stages/rate.py:pettitt_test``; Pettitt 1979): ``U_t =
    sum_{i<=t} sum_{j>t} sgn(y_i - y_j)`` via the midrank identity
    ``U_t = sum_{i<=t} (2*r_i - (n+1))`` — exact int64
    through the argmax (ties: smallest t); only the closing
    significance approximation ``p ~ 2*exp(-6K²/(n³+n²))`` is a pinned
    IEEE expression replayed by the identical SQL tree. ONE
    hash(series) shuffle, per-partition vectorized ranks + cumsum."""
    from ...stages.rate import pettitt_test
    from ...stages.rollup import rollup

    from .downsample_core import _events_cents

    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    rolled = rollup(ev.map_batches(_series, batch_format="pyarrow"), W15M)
    return pettitt_test(rolled, num_partitions=4)


PETTITT_SQL = f"""
WITH r AS (
    SELECT event_type AS series_id,
           (epoch_us(ts) // {W15M}) * {W15M} AS bucket,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
    FROM events GROUP BY 1, 2
),
o AS (
    SELECT series_id, bucket, y,
           row_number() OVER (PARTITION BY series_id
                              ORDER BY bucket) AS idx,
           count(*) OVER (PARTITION BY series_id) AS n,
           -- doubled midrank: 2*cnt_lt + cnt_eq + 1, exact under ties
           2 * (rank() OVER (PARTITION BY series_id ORDER BY y) - 1)
             + count(*) OVER (PARTITION BY series_id, y) + 1 AS d
    FROM r
),
u AS (
    SELECT series_id, bucket, idx, n,
           CAST(sum(d - (n + 1)) OVER (PARTITION BY series_id ORDER BY idx
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ut
    FROM o
    QUALIFY idx < n
),
b AS (
    SELECT series_id, n, idx, bucket, abs(ut) AS au,
           row_number() OVER (PARTITION BY series_id
                              ORDER BY abs(ut) DESC, idx) AS rn
    FROM u
)
SELECT series_id, CAST(n AS BIGINT) AS n, CAST(idx AS BIGINT) AS t_star,
       bucket, CAST(au AS BIGINT) AS k_stat,
       2.0 * exp(-6.0 * CAST(au AS DOUBLE) * CAST(au AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                    + CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS p_approx
FROM b WHERE rn = 1
"""


def q_anagram_groups_vocab(sf_dir: str):
    """Anagram groups over the corpus' distinct 4-character windows
    (``stages/vocab.py:anagram_groups``): every distinct sliding
    4-char window grouped by its sorted-character signature; signatures
    shared by >= 2 distinct windows are emitted with the group size and
    lexicographic min window. The char-multiset blocking key — same
    family as the Soundex phonetic blocks and the ed2 deletion
    neighborhoods, at the exact-substring granularity of
    ``shared_substring_docs``. Map-side distinct per block (bounded by
    alphabet^4, not corpus size), fully vectorized utf-32 signature
    sort, ONE hash(signature) shuffle. UTF-8 byte order == codepoint
    order, so the numpy codepoint sort and DuckDB
    ``list_sort``/``min`` agree on any corpus."""
    from ...stages.vocab import anagram_groups

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"]).repartition(8)
    return anagram_groups(ds, L=4, num_partitions=8)


ANAGRAM_SQL = """
WITH g AS (
    SELECT DISTINCT substr(text, i, 4) AS token
    FROM documents,
         LATERAL unnest(generate_series(1, length(text) - 3)) AS t(i)
),
s AS (
    SELECT token,
           array_to_string(list_sort(str_split(token, '')), '') AS sig
    FROM g
)
SELECT sig, CAST(count(*) AS BIGINT) AS n_terms,
       min(token) AS min_token
FROM s GROUP BY sig HAVING count(*) >= 2
"""


def q_front_code_vocab(sf_dir: str):
    """Front-coding statistics over the sorted corpus vocabulary
    (``stages/vocab.py:front_code_stats``): terms sorted ascending,
    each term's longest common prefix (in codepoints) with its
    predecessor; per first-character block the term count, total
    characters, total LCP characters saved, and the saved ratio (one
    pinned IEEE quotient). The dictionary layout every FST / prefix
    dictionary build step measures first.

    Distributed shape: grouping by FIRST CHARACTER makes the blocks
    independent — the predecessor of a block's first term starts with
    a different character, so its LCP is 0 by construction; ONE
    hash(first-char) shuffle, per-group sort + bounded vocab loop."""
    from ...stages.vocab import front_code_stats

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"]).repartition(8)
    return front_code_stats(ds, num_partitions=8)


FRONT_CODE_SQL = """
WITH w AS (
    SELECT unnest(string_split(text, ' ')) AS token FROM documents
),
v AS (SELECT DISTINCT token FROM w WHERE token <> ''),
l AS (
    SELECT token, substr(token, 1, 1) AS first_char,
           lag(token) OVER (PARTITION BY substr(token, 1, 1)
                            ORDER BY token) AS prev
    FROM v
),
p AS (
    SELECT first_char, token,
           CASE WHEN prev IS NULL THEN 0
                ELSE len(list_filter(
                    range(1, least(len(token), len(prev)) + 1),
                    i -> substr(token, 1, i) = substr(prev, 1, i)))
           END AS lcp
    FROM l
)
SELECT first_char, CAST(count(*) AS BIGINT) AS n_terms,
       CAST(sum(len(token)) AS BIGINT) AS sum_len,
       CAST(sum(lcp) AS BIGINT) AS sum_lcp,
       CAST(sum(lcp) AS DOUBLE) / CAST(sum(len(token)) AS DOUBLE)
           AS saved_ratio
FROM p GROUP BY first_char
"""


W1H = 3600 * US
_MIN_US = 60 * US


def q_ar1_1h(sf_dir: str):
    """AR(1) fit + one-step forecast per event_type over the 1h tier
    (``stages/correlate.py:ar1_fit``): OLS of the floored per-bucket
    mean on its lag — exact int64 sufficient statistics
    ``(n_pairs, s1, s2, s11, s12)`` (the per-bucket mean is bounded by
    the value domain, so the squares never overflow at any sf), then
    ``phi``/``c``/``fcst`` as pinned IEEE expressions the oracle
    replays with the identical tree (degenerate ``den = 0`` pins
    ``phi = 0``). The autoregressive sibling of ``ols_slope_1h``."""
    from ...stages.correlate import ar1_fit
    from ...stages.rollup import rollup

    from .downsample_core import _events_cents

    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    rolled = rollup(ev.map_batches(_series, batch_format="pyarrow"), W1H)
    return ar1_fit(rolled, num_partitions=4)


AR1_SQL = f"""
WITH r AS (
    SELECT event_type AS series_id,
           (epoch_us(ts) // {W1H}) * {W1H} AS bucket,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s,
           count(*) AS cnt
    FROM events GROUP BY 1, 2
),
m AS (
    SELECT series_id, bucket,
           -- exact floor(s / cnt): // truncates, negatives need the
           -- CASE form (the Holt-Winters oracle convention)
           CASE WHEN s >= 0 THEN s // cnt
                ELSE -(((-s) + cnt - 1) // cnt) END AS y
    FROM r
),
l AS (
    SELECT series_id, y,
           lag(y) OVER w AS py,
           row_number() OVER (PARTITION BY series_id
                              ORDER BY bucket DESC) AS rdesc
    FROM m WINDOW w AS (PARTITION BY series_id ORDER BY bucket)
),
st AS (
    SELECT series_id,
           CAST(count(py) AS BIGINT) AS n_pairs,
           CAST(sum(py) AS BIGINT) AS s1,
           CAST(sum(CASE WHEN py IS NOT NULL THEN y END) AS BIGINT) AS s2,
           CAST(sum(py * py) AS BIGINT) AS s11,
           CAST(sum(py * y) AS BIGINT) AS s12
    FROM l GROUP BY 1
),
lastv AS (
    SELECT series_id, CAST(y AS BIGINT) AS y_last FROM l WHERE rdesc = 1
),
ph AS (
    SELECT st.*, lastv.y_last,
           CASE WHEN CAST(n_pairs AS DOUBLE) * CAST(s11 AS DOUBLE)
                     - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) = 0.0
                THEN 0.0
                ELSE (CAST(n_pairs AS DOUBLE) * CAST(s12 AS DOUBLE)
                      - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE))
                     / (CAST(n_pairs AS DOUBLE) * CAST(s11 AS DOUBLE)
                        - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
           END AS phi
    FROM st JOIN lastv USING (series_id)
    WHERE n_pairs >= 1
),
cc AS (
    SELECT *, (CAST(s2 AS DOUBLE) - phi * CAST(s1 AS DOUBLE))
              / CAST(n_pairs AS DOUBLE) AS c
    FROM ph
)
SELECT series_id, n_pairs, s1, s2, s11, s12, y_last, phi, c,
       c + phi * CAST(y_last AS DOUBLE) AS fcst
FROM cc
"""


def q_allen_relations_events(sf_dir: str):
    """Allen interval-algebra census over per-user event intervals
    (``stages/intervals.py:allen_relations``; Allen 1983): each event
    spans ``[ts, ts + (1 + event_id % 7) minutes)``; every consecutive
    pair per user (ordered by start, event_id) is classified into its
    Allen relation and counted globally. Pure int64 comparisons — the
    SQL lag-window replay is trivially exact. ONE hash(user) shuffle,
    one vectorized comparison pass, <= 8-row funnel."""
    from ...stages.intervals import allen_relations

    ds = _read_parquet_clean(f"{sf_dir}/events.parquet",
                             columns=["event_id", "ts", "user_id"]) \
        .repartition(8)

    def _iv(b: pa.Table) -> pa.Table:
        ts = pc.cast(b["ts"], pa.int64())
        eid = b["event_id"]
        import numpy as _np

        e = eid.to_numpy(zero_copy_only=False).astype(_np.int64)
        dur = (1 + e % 7) * _MIN_US
        tsv = ts.to_numpy() if not isinstance(ts, pa.ChunkedArray) \
            else ts.combine_chunks().to_numpy()
        return pa.table({"user_id": b["user_id"], "event_id": eid,
                         "start": ts, "end": pa.array(tsv + dur)})

    return allen_relations(ds.map_batches(_iv, batch_format="pyarrow"),
                           num_partitions=8)


ALLEN_SQL = f"""
WITH iv AS (
    SELECT user_id, event_id, epoch_us(ts) AS s,
           epoch_us(ts) + (1 + event_id % 7) * {_MIN_US} AS e
    FROM events
),
l AS (
    SELECT user_id, s, e,
           lag(s) OVER w AS ps, lag(e) OVER w AS pe
    FROM iv WINDOW w AS (PARTITION BY user_id ORDER BY s, event_id)
),
c AS (
    SELECT CASE
        WHEN ps < s AND s > pe THEN 'before'
        WHEN ps < s AND s = pe THEN 'meets'
        WHEN ps < s AND s < pe AND e > pe THEN 'overlaps'
        WHEN ps < s AND s < pe AND e = pe THEN 'finished_by'
        WHEN ps < s AND s < pe AND e < pe THEN 'contains'
        WHEN ps = s AND pe < e THEN 'starts'
        WHEN ps = s AND pe = e THEN 'equals'
        ELSE 'started_by' END AS relation
    FROM l WHERE ps IS NOT NULL
)
SELECT relation, CAST(count(*) AS BIGINT) AS n_pairs
FROM c GROUP BY relation
"""


def q_weighted_jaccard_docs(sf_dir: str):
    """Exact weighted Jaccard between each document and its SUCCESSOR
    WITHIN THE SAME SOURCE (``stages/strsim.py:weighted_jaccard_pairs``):
    ``J_w = sum min(c_a, c_b) / sum max(c_a, c_b)`` over the two docs'
    term-frequency vectors — the multiset similarity the MinHash band
    pass approximates, exact on the bounded consecutive-pair set.
    ``num``/``den`` exact int64, ``wjac`` the pinned quotient. ONE
    hash(source) shuffle co-locates each source (the per-source
    vocabulary contract), then pairing is a local sort + row-shift —
    no doc-to-doc join, no driver-side pair map."""
    from ...stages.strsim import weighted_jaccard_pairs

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text", "source"]) \
        .repartition(8)
    return weighted_jaccard_pairs(ds, num_partitions=8)


WJACCARD_SQL = """
WITH tc AS (
    SELECT doc_id, token, CAST(count(*) AS BIGINT) AS c
    FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents
    ) WHERE token <> ''
    GROUP BY doc_id, token
),
pairs AS (
    SELECT doc_id AS a,
           lead(doc_id) OVER (PARTITION BY source ORDER BY doc_id) AS b
    FROM documents
    QUALIFY b IS NOT NULL
),
contrib AS (
    SELECT p.a, p.b, tc.token, tc.c AS lc, CAST(0 AS BIGINT) AS rc
    FROM pairs p JOIN tc ON tc.doc_id = p.a
    UNION ALL
    SELECT p.a, p.b, tc.token, CAST(0 AS BIGINT), tc.c
    FROM pairs p JOIN tc ON tc.doc_id = p.b
),
per_tok AS (
    SELECT a, b, token, sum(lc) AS lc, sum(rc) AS rc
    FROM contrib GROUP BY a, b, token
)
SELECT a AS doc_a, b AS doc_b,
       CAST(sum(least(lc, rc)) AS BIGINT) AS num,
       CAST(sum(greatest(lc, rc)) AS BIGINT) AS den,
       CAST(sum(least(lc, rc)) AS DOUBLE)
           / CAST(sum(greatest(lc, rc)) AS DOUBLE) AS wjac
FROM per_tok GROUP BY a, b
"""


def q_sssp_docs(sf_dir: str):
    """Weighted single-source shortest paths from doc 0 over the
    kcore/bfs link graph (``stages/graph.py:sssp``): undirected edges
    ``u—v`` with deterministic weight ``1 + (u+v) % 7``, 6 Bellman-Ford
    relaxation rounds (the bfs_hops diameter contract). Each round is
    ONE tagged-union hash join + ONE hashpart grouped min; the
    node-bounded distance table is the only materialized state. The
    oracle replays the identical bounded recursion as 6 chained
    CTE rounds — exact int64 distances."""
    import pyarrow.parquet as _pq

    from ...stages.graph import sssp

    n = _pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id"]).repartition(4)

    def _edges(b: pa.Table) -> pa.Table:
        import numpy as _np

        d = b["doc_id"].to_numpy(zero_copy_only=False).astype(_np.int64)
        srcs, dsts = [], []
        for j in range(1, 7):
            m = j <= 1 + d % 6
            s = d[m]
            t = (s * 31 + 97 * j) % n
            keep = s != t
            srcs.append(_np.minimum(s[keep], t[keep]))
            dsts.append(_np.maximum(s[keep], t[keep]))
        u = _np.concatenate(srcs)
        v = _np.concatenate(dsts)
        ww = 1 + (u + v) % 7
        # undirected: emit both directions
        return pa.table({
            "src": pa.array(_np.concatenate([u, v])),
            "dst": pa.array(_np.concatenate([v, u])),
            "w": pa.array(_np.concatenate([ww, ww]))})

    edges = ds.map_batches(_edges, batch_format="pyarrow")
    return sssp(edges, source_node=0, rounds=6, num_partitions=4)


SSSP_SQL = """
WITH nn AS (SELECT count(*) AS n FROM documents),
base AS (
    SELECT d.doc_id AS s, u.j,
           ((d.doc_id * 31 + 97 * u.j) % (SELECT n FROM nn)) AS t
    FROM documents d, LATERAL unnest(generate_series(1, 6)) AS u(j)
    WHERE u.j <= 1 + d.doc_id % 6
),
canon AS (
    SELECT least(s, t) AS u, greatest(s, t) AS v FROM base WHERE s <> t
),
ed AS (
    SELECT u AS node, v AS dst, 1 + (u + v) % 7 AS w FROM canon
    UNION ALL
    SELECT v AS node, u AS dst, 1 + (u + v) % 7 AS w FROM canon
),
d0 AS (SELECT CAST(0 AS BIGINT) AS node, CAST(0 AS BIGINT) AS dist),
d1 AS (
    SELECT node, min(dist) AS dist FROM (
        SELECT node, dist FROM d0
        UNION ALL
        SELECT e.dst AS node, d.dist + e.w AS dist
        FROM d0 d JOIN ed e ON e.node = d.node
    ) GROUP BY node
),
d2 AS (
    SELECT node, min(dist) AS dist FROM (
        SELECT node, dist FROM d1
        UNION ALL
        SELECT e.dst AS node, d.dist + e.w AS dist
        FROM d1 d JOIN ed e ON e.node = d.node
    ) GROUP BY node
),
d3 AS (
    SELECT node, min(dist) AS dist FROM (
        SELECT node, dist FROM d2
        UNION ALL
        SELECT e.dst AS node, d.dist + e.w AS dist
        FROM d2 d JOIN ed e ON e.node = d.node
    ) GROUP BY node
),
d4 AS (
    SELECT node, min(dist) AS dist FROM (
        SELECT node, dist FROM d3
        UNION ALL
        SELECT e.dst AS node, d.dist + e.w AS dist
        FROM d3 d JOIN ed e ON e.node = d.node
    ) GROUP BY node
),
d5 AS (
    SELECT node, min(dist) AS dist FROM (
        SELECT node, dist FROM d4
        UNION ALL
        SELECT e.dst AS node, d.dist + e.w AS dist
        FROM d4 d JOIN ed e ON e.node = d.node
    ) GROUP BY node
),
d6 AS (
    SELECT node, min(dist) AS dist FROM (
        SELECT node, dist FROM d5
        UNION ALL
        SELECT e.dst AS node, d.dist + e.w AS dist
        FROM d5 d JOIN ed e ON e.node = d.node
    ) GROUP BY node
)
SELECT node, CAST(dist AS BIGINT) AS dist FROM d6
"""


def q_linear_count_domains(sf_dir: str):
    """Linear-counting distinct-URL sketch per domain
    (``stages/sketches.py:linear_count``, m=4096; Whang et al. 1990):
    md5-u64 URL hash -> bitmap cell, exact occupied/zero counts, and
    the estimate ``m * ln(m/z)`` as one pinned libm call on an integer
    quotient — the low-load-factor companion to the KMV and HLL
    sketches, bit-exactly SQL-replayed like KMV."""
    from ...stages.sketches import linear_count

    from ._shared import SNAPSHOTS
    from ...sources.corpus import read_pages

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

    return linear_count(pages.map_batches(_dom, batch_format="pyarrow"),
                        key_col="domain", value_col="url", m=4096,
                        fanin=4)


LINEAR_COUNT_SQL = """
WITH {PAGES_CTE}
, h AS (
    SELECT DISTINCT series_id AS domain,
        list_reduce(list_prepend(0::HUGEINT,
            list_transform(range(1, 17),
                i -> CAST(strpos('0123456789abcdef',
                                 substring(md5(url), i, 1)) - 1
                          AS HUGEINT))), (h, d) -> h * 16 + d)
            % 4096 AS cell
    FROM pages
),
occ AS (
    SELECT domain, CAST(count(DISTINCT cell) AS BIGINT) AS occupied
    FROM h GROUP BY domain
)
SELECT domain, occupied,
       CAST(4096 - occupied AS BIGINT) AS zeros,
       CASE WHEN occupied = 4096 THEN 0.0
            ELSE 4096.0 * ln(4096.0 / CAST(4096 - occupied AS DOUBLE))
       END AS lc_est
FROM occ
"""


from ._shared import PAGES_CTE  # noqa: E402

LINEAR_COUNT_SQL = LINEAR_COUNT_SQL.format(PAGES_CTE=PAGES_CTE)


def q_simple8b_events(sf_dir: str):
    """Simple8b-style packing manifest of each series' zigzag 15m-tier
    deltas (``stages/compress.py:simple8b_pack``; Anh & Moffat 2010 —
    the InfluxDB/Prometheus integer-block codec): greedy
    largest-count-first words over the 60-bit payload ladder, each word
    decode-verified inside the task before it is emitted. Exact int64
    manifest ``(word_idx, start_pos, cnt, bits, payload)``; the oracle
    replays the greedy walk with 14 window maxima + one recursive CTE
    (the ADPCM / Elias-Fano replay family)."""
    from ...stages.compress import simple8b_pack

    from .downsample_core import _events_cents
    from ...stages.rollup import rollup

    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    rolled = rollup(ev.map_batches(_series, batch_format="pyarrow"), W15M)
    return simple8b_pack(rolled, num_partitions=4)


SIMPLE8B_SQL = """
WITH RECURSIVE e AS (
    SELECT event_type AS series_id,
           epoch_us(ts) // {w} * {w} AS bucket,
           CAST(round(value * 100) AS BIGINT) AS cents
    FROM events
),
r AS (
    SELECT series_id, bucket, CAST(sum(cents) AS BIGINT) AS y
    FROM e GROUP BY series_id, bucket
),
dz AS (
    SELECT series_id,
           row_number() OVER (PARTITION BY series_id ORDER BY bucket) AS p,
           count(*) OVER (PARTITION BY series_id) AS n,
           y - coalesce(lag(y) OVER (PARTITION BY series_id
                                     ORDER BY bucket), 0) AS d
    FROM r
),
q AS (
    SELECT series_id, p, n,
           CASE WHEN d >= 0 THEN 2 * d ELSE -2 * d - 1 END AS v
    FROM dz
),
qq AS (
    SELECT series_id, p, n, v,
           (p + 60 - 1 <= n AND max(v) OVER (PARTITION BY series_id ORDER BY p ROWS BETWEEN CURRENT ROW AND 59 FOLLOWING) < 2) AS ok60,
           (p + 30 - 1 <= n AND max(v) OVER (PARTITION BY series_id ORDER BY p ROWS BETWEEN CURRENT ROW AND 29 FOLLOWING) < 4) AS ok30,
           (p + 20 - 1 <= n AND max(v) OVER (PARTITION BY series_id ORDER BY p ROWS BETWEEN CURRENT ROW AND 19 FOLLOWING) < 8) AS ok20,
           (p + 15 - 1 <= n AND max(v) OVER (PARTITION BY series_id ORDER BY p ROWS BETWEEN CURRENT ROW AND 14 FOLLOWING) < 16) AS ok15,
           (p + 12 - 1 <= n AND max(v) OVER (PARTITION BY series_id ORDER BY p ROWS BETWEEN CURRENT ROW AND 11 FOLLOWING) < 32) AS ok12,
           (p + 10 - 1 <= n AND max(v) OVER (PARTITION BY series_id ORDER BY p ROWS BETWEEN CURRENT ROW AND 9 FOLLOWING) < 64) AS ok10,
           (p + 8 - 1 <= n AND max(v) OVER (PARTITION BY series_id ORDER BY p ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) < 128) AS ok8,
           (p + 7 - 1 <= n AND max(v) OVER (PARTITION BY series_id ORDER BY p ROWS BETWEEN CURRENT ROW AND 6 FOLLOWING) < 256) AS ok7,
           (p + 6 - 1 <= n AND max(v) OVER (PARTITION BY series_id ORDER BY p ROWS BETWEEN CURRENT ROW AND 5 FOLLOWING) < 1024) AS ok6,
           (p + 5 - 1 <= n AND max(v) OVER (PARTITION BY series_id ORDER BY p ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) < 4096) AS ok5,
           (p + 4 - 1 <= n AND max(v) OVER (PARTITION BY series_id ORDER BY p ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) < 32768) AS ok4,
           (p + 3 - 1 <= n AND max(v) OVER (PARTITION BY series_id ORDER BY p ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING) < 1048576) AS ok3,
           (p + 2 - 1 <= n AND max(v) OVER (PARTITION BY series_id ORDER BY p ROWS BETWEEN CURRENT ROW AND 1 FOLLOWING) < 1073741824) AS ok2
    FROM q
),
walk AS (
    SELECT series_id, CAST(1 AS BIGINT) AS pos, CAST(0 AS BIGINT) AS word_idx
    FROM (SELECT DISTINCT series_id FROM qq)
    UNION ALL
    SELECT series_id, pos + cnt, word_idx + 1 FROM (
        SELECT w.series_id, w.pos, w.word_idx,
               CASE WHEN t.ok60 THEN 60 WHEN t.ok30 THEN 30 WHEN t.ok20 THEN 20 WHEN t.ok15 THEN 15 WHEN t.ok12 THEN 12 WHEN t.ok10 THEN 10 WHEN t.ok8 THEN 8 WHEN t.ok7 THEN 7 WHEN t.ok6 THEN 6 WHEN t.ok5 THEN 5 WHEN t.ok4 THEN 4 WHEN t.ok3 THEN 3 WHEN t.ok2 THEN 2 ELSE 1 END AS cnt, t.n
        FROM walk w JOIN qq t
          ON t.series_id = w.series_id AND t.p = w.pos
    ) z WHERE pos + cnt <= n
),
words AS (
    SELECT w.series_id, w.word_idx, w.pos AS start_pos,
           CASE WHEN t.ok60 THEN 60 WHEN t.ok30 THEN 30 WHEN t.ok20 THEN 20 WHEN t.ok15 THEN 15 WHEN t.ok12 THEN 12 WHEN t.ok10 THEN 10 WHEN t.ok8 THEN 8 WHEN t.ok7 THEN 7 WHEN t.ok6 THEN 6 WHEN t.ok5 THEN 5 WHEN t.ok4 THEN 4 WHEN t.ok3 THEN 3 WHEN t.ok2 THEN 2 ELSE 1 END AS cnt
    FROM walk w JOIN qq t ON t.series_id = w.series_id AND t.p = w.pos
)
SELECT wo.series_id, wo.word_idx, wo.start_pos,
       CAST(wo.cnt AS BIGINT) AS cnt,
       CAST(60 // wo.cnt AS BIGINT) AS bits,
       CAST(sum(t.v << ((60 // wo.cnt) * (t.p - wo.start_pos)))
            AS BIGINT) AS payload
FROM words wo JOIN qq t
  ON t.series_id = wo.series_id
 AND t.p >= wo.start_pos AND t.p < wo.start_pos + wo.cnt
GROUP BY wo.series_id, wo.word_idx, wo.start_pos, wo.cnt
""".format(w=900000000)


def _rolled_k(sf_dir: str, w: int):
    from ...stages.rollup import rollup

    from .downsample_core import _events_cents

    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    return rollup(ev.map_batches(_series, batch_format="pyarrow"), w)


def q_wilcoxon_signed_1h(sf_dir: str):
    """Wilcoxon signed-rank test between every event-type pair over
    common 1h buckets (``stages/abtest.py:wilcoxon_signed``): paired
    differences of the bucket sums, zeros dropped, doubled midranks of
    |d| keep ``w2_pos``/``w2_neg`` exact int64
    (``w2_pos + w2_neg = n(n+1)``); the normal-approximation ``z`` is
    the one pinned IEEE expression (no tie correction, both sides).
    The paired companion to ``mann_whitney_events`` /
    ``kendall_pairs_1h``. Pairing is one arrow self-join per
    hash(bucket) partition; the test itself is ONE hash(pair)
    shuffle."""
    from ...arrow_utils import make_add_part
    from ...stages.abtest import wilcoxon_signed

    rolled = _rolled_k(sf_dir, W1H)
    _add_part = make_add_part("bucket", 64)

    def _pairs(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"]).select(
            ["series_id", "bucket", "sum_y"])
        a = t.rename_columns(["ta", "bucket", "ya"])
        bb = t.rename_columns(["tb", "bucket", "yb"])
        j = a.join(bb, keys=["bucket"])
        j = j.filter(pc.less(j["ta"], j["tb"]))
        pair = pc.binary_join_element_wise(j["ta"], j["tb"], "|")
        d = pc.subtract(j["ya"], j["yb"])
        return pa.table({"pair": pair, "d": d})

    parted = rolled.map_batches(_add_part, batch_format="pyarrow")
    pairs = parted.repartition(4).groupby("__part").map_groups(
        _pairs, batch_format="pyarrow")
    return wilcoxon_signed(pairs, num_partitions=4)


WILCOXON_SQL = f"""
WITH r AS (
    SELECT event_type AS series_id,
           (epoch_us(ts) // {W1H}) * {W1H} AS bucket,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
    FROM events GROUP BY 1, 2
),
p AS (
    SELECT a.series_id AS ta, b.series_id AS tb, a.y - b.y AS d
    FROM r a JOIN r b
      ON a.bucket = b.bucket AND a.series_id < b.series_id
),
o AS (
    SELECT ta, tb, d,
           2 * (rank() OVER (PARTITION BY ta, tb ORDER BY abs(d)) - 1)
             + count(*) OVER (PARTITION BY ta, tb, abs(d)) + 1 AS d2,
           count(*) OVER (PARTITION BY ta, tb) AS n
    FROM p WHERE d <> 0
),
agg AS (
    SELECT ta || '|' || tb AS pair,
           CAST(any_value(n) AS BIGINT) AS n_nz,
           CAST(sum(CASE WHEN d > 0 THEN d2 ELSE 0 END) AS BIGINT)
               AS w2_pos,
           CAST(sum(CASE WHEN d < 0 THEN d2 ELSE 0 END) AS BIGINT)
               AS w2_neg
    FROM o GROUP BY 1
)
SELECT pair, n_nz, w2_pos, w2_neg,
       (CAST(w2_pos AS DOUBLE) / 2.0
        - CAST(n_nz AS DOUBLE) * (CAST(n_nz AS DOUBLE) + 1.0) / 4.0)
       / sqrt(CAST(n_nz AS DOUBLE) * (CAST(n_nz AS DOUBLE) + 1.0)
              * (2.0 * CAST(n_nz AS DOUBLE) + 1.0) / 24.0) AS z
FROM agg
"""


def q_runs_test_15m(sf_dir: str):
    """Wald-Wolfowitz runs test per event_type over the 15m tier
    (``stages/abtest.py:runs_test``): values binarize against the
    series' LOWER MEDIAN (the deterministic ``(n-1)//2``-th order
    statistic; equals drop), the run count tests sequence randomness.
    Counts exact int64, ``z`` the one pinned IEEE expression with the
    degenerate cases CASE-pinned to 0.0 on both sides."""
    from ...stages.abtest import runs_test

    return runs_test(_rolled_k(sf_dir, W15M), num_partitions=4)


RUNS_SQL = f"""
WITH r AS (
    SELECT event_type AS series_id,
           (epoch_us(ts) // {W15M}) * {W15M} AS bucket,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
    FROM events GROUP BY 1, 2
),
med AS (
    SELECT series_id, y AS med FROM (
        SELECT series_id, y,
               row_number() OVER (PARTITION BY series_id ORDER BY y) AS rn,
               count(*) OVER (PARTITION BY series_id) AS n
        FROM r
    ) WHERE rn = (n - 1) // 2 + 1
),
nn AS (SELECT series_id, CAST(count(*) AS BIGINT) AS n FROM r GROUP BY 1),
f AS (
    SELECT r.series_id, r.bucket, (r.y > m.med) AS ab
    FROM r JOIN med m USING (series_id)
    WHERE r.y <> m.med
),
l AS (
    SELECT series_id, ab,
           lag(ab) OVER (PARTITION BY series_id ORDER BY bucket) AS pab
    FROM f
),
agg AS (
    SELECT series_id,
           CAST(count(*) FILTER (ab) AS BIGINT) AS n_above,
           CAST(count(*) FILTER (NOT ab) AS BIGINT) AS n_below,
           CAST(1 + count(*) FILTER (pab IS NOT NULL AND ab <> pab)
                AS BIGINT) AS runs
    FROM l GROUP BY 1
)
SELECT nn.series_id, nn.n, med.med,
       coalesce(agg.n_above, 0) AS n_above,
       coalesce(agg.n_below, 0) AS n_below,
       coalesce(agg.runs, 0) AS runs,
       CASE WHEN coalesce(agg.n_above, 0) > 0
             AND coalesce(agg.n_below, 0) > 0
             AND agg.n_above + agg.n_below > 1
             AND (2.0 * CAST(agg.n_above AS DOUBLE)
                  * CAST(agg.n_below AS DOUBLE)
                  * (2.0 * CAST(agg.n_above AS DOUBLE)
                     * CAST(agg.n_below AS DOUBLE)
                     - CAST(agg.n_above AS DOUBLE)
                     - CAST(agg.n_below AS DOUBLE)))
                 / ((CAST(agg.n_above AS DOUBLE)
                     + CAST(agg.n_below AS DOUBLE))
                    * (CAST(agg.n_above AS DOUBLE)
                       + CAST(agg.n_below AS DOUBLE))
                    * (CAST(agg.n_above AS DOUBLE)
                       + CAST(agg.n_below AS DOUBLE) - 1.0)) > 0.0
       THEN (CAST(agg.runs AS DOUBLE)
             - (2.0 * CAST(agg.n_above AS DOUBLE)
                * CAST(agg.n_below AS DOUBLE)
                / (CAST(agg.n_above AS DOUBLE)
                   + CAST(agg.n_below AS DOUBLE)) + 1.0))
            / sqrt((2.0 * CAST(agg.n_above AS DOUBLE)
                    * CAST(agg.n_below AS DOUBLE)
                    * (2.0 * CAST(agg.n_above AS DOUBLE)
                       * CAST(agg.n_below AS DOUBLE)
                       - CAST(agg.n_above AS DOUBLE)
                       - CAST(agg.n_below AS DOUBLE)))
                   / ((CAST(agg.n_above AS DOUBLE)
                       + CAST(agg.n_below AS DOUBLE))
                      * (CAST(agg.n_above AS DOUBLE)
                         + CAST(agg.n_below AS DOUBLE))
                      * (CAST(agg.n_above AS DOUBLE)
                         + CAST(agg.n_below AS DOUBLE) - 1.0)))
       ELSE 0.0 END AS z
FROM nn JOIN med USING (series_id)
LEFT JOIN agg USING (series_id)
"""


def q_qn_scale_15m(sf_dir: str):
    """Pairwise-difference robust scale per event_type over the 15m
    tier (``stages/quantiles.py:qn_scale``; the Rousseeuw-Croux Qn
    order statistic): lower median of all n(n-1)/2 absolute pairwise
    differences — exact int64, replayed by a within-series cross join
    + row_number. O(n^2) per series BY DEFINITION, so it runs on the
    bounded rollup tier (documented contract)."""
    from ...stages.quantiles import qn_scale

    return qn_scale(_rolled_k(sf_dir, W15M), num_partitions=4)


QN_SQL = f"""
WITH r AS (
    SELECT event_type AS series_id,
           (epoch_us(ts) // {W15M}) * {W15M} AS bucket,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
    FROM events GROUP BY 1, 2
),
x AS (
    SELECT series_id, y,
           row_number() OVER (PARTITION BY series_id ORDER BY bucket) AS i
    FROM r
),
d AS (
    SELECT a.series_id, abs(a.y - b.y) AS diff
    FROM x a JOIN x b ON a.series_id = b.series_id AND a.i < b.i
),
o AS (
    SELECT series_id, diff,
           row_number() OVER (PARTITION BY series_id ORDER BY diff) AS rn,
           count(*) OVER (PARTITION BY series_id) AS m
    FROM d
),
nn AS (SELECT series_id, CAST(count(*) AS BIGINT) AS n FROM r GROUP BY 1)
SELECT o.series_id, nn.n, CAST(o.m AS BIGINT) AS m_pairs,
       CAST(o.diff AS BIGINT) AS qn
FROM o JOIN nn USING (series_id)
WHERE o.rn = (o.m - 1) // 2 + 1
"""


def q_lz_complexity_15m(sf_dir: str):
    """LZ76 sequence complexity per event_type over the 15m tier
    (``stages/abtest.py:lz76_complexity``; Lempel & Ziv 1976, the
    Kaspar-Schuster parse): binarize against the lower median, count
    exhaustive-history phrases. Pure integers; the oracle replays the
    parse as ONE recursive walk over ``strpos`` probes of the
    ``string_agg`` binary sequence."""
    from ...stages.abtest import lz76_complexity

    return lz76_complexity(_rolled_k(sf_dir, W15M), num_partitions=4)


LZ_SQL = f"""
WITH RECURSIVE r AS (
    SELECT event_type AS series_id,
           (epoch_us(ts) // {W15M}) * {W15M} AS bucket,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
    FROM events GROUP BY 1, 2
),
med AS (
    SELECT series_id, y AS med FROM (
        SELECT series_id, y,
               row_number() OVER (PARTITION BY series_id ORDER BY y) AS rn,
               count(*) OVER (PARTITION BY series_id) AS n
        FROM r
    ) WHERE rn = (n - 1) // 2 + 1
),
strs AS (
    SELECT r.series_id,
           string_agg(CASE WHEN r.y > m.med THEN '1' ELSE '0' END,
                      '' ORDER BY r.bucket) AS s,
           CAST(count(*) AS BIGINT) AS n,
           any_value(m.med) AS med
    FROM r JOIN med m USING (series_id)
    GROUP BY r.series_id
),
walk AS (
    SELECT series_id, CAST(1 AS BIGINT) AS pos, CAST(1 AS BIGINT) AS l,
           CAST(0 AS BIGINT) AS c
    FROM strs
    UNION ALL
    SELECT series_id,
           CASE WHEN ok THEN pos ELSE pos + l END,
           CASE WHEN ok THEN l + 1 ELSE CAST(1 AS BIGINT) END,
           CASE WHEN ok THEN c ELSE c + 1 END
    FROM (
        SELECT w.series_id, w.pos, w.l, w.c,
               (w.pos + w.l - 1 <= st.n AND
                strpos(substr(st.s, 1, CAST(w.pos + w.l - 2 AS INTEGER)),
                       substr(st.s, CAST(w.pos AS INTEGER),
                              CAST(w.l AS INTEGER))) >= 1) AS ok
        FROM walk w JOIN strs st USING (series_id)
        WHERE w.pos <= st.n
    ) z
)
SELECT st.series_id, st.n, CAST(st.med AS BIGINT) AS med,
       (SELECT max(c) FROM walk w WHERE w.series_id = st.series_id)
           AS c_phrases
FROM strs st
"""


def q_mtf_score_users(sf_dir: str):
    """Move-to-front coding score of each user's event-type sequence
    (``stages/compress.py:mtf_score``; Bentley et al. 1986 — the
    BWT/bzip2 second stage): list starts as the sorted global
    event-type alphabet (a bounded Dataset ``unique`` aggregate, never
    a raw driver read), each event emits its current list position and
    moves to front. ``mtf_sum`` low = bursty/clustered behavior.
    Exact int64; the oracle replays the permutation walk with a
    LIST-state recursive CTE (the Holt-Winters replay family)."""
    from ...stages.compress import mtf_score

    ds = _read_parquet_clean(f"{sf_dir}/events.parquet",
                             columns=["event_id", "ts", "user_id",
                                      "event_type"]).repartition(8)
    alphabet = sorted(ds.unique("event_type"))

    def _rows(b: pa.Table) -> pa.Table:
        return pa.table({"user_id": b["user_id"],
                         "sym": b["event_type"],
                         "x": pc.cast(b["ts"], pa.int64()),
                         "tie": b["event_id"]})

    return mtf_score(ds.map_batches(_rows, batch_format="pyarrow"),
                     alphabet, num_partitions=8)


MTF_SQL = """
WITH RECURSIVE seq AS (
    SELECT user_id, event_type,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS idx,
           count(*) OVER (PARTITION BY user_id) AS n
    FROM events
),
alpha AS (SELECT list_sort(list(DISTINCT event_type)) AS a FROM events),
rec AS (
    SELECT user_id, CAST(0 AS BIGINT) AS idx,
           (SELECT a FROM alpha) AS lst,
           CAST(0 AS BIGINT) AS tot, CAST(0 AS BIGINT) AS mx
    FROM (SELECT DISTINCT user_id FROM seq)
    UNION ALL
    SELECT r.user_id, s.idx,
           list_prepend(s.event_type,
                        list_filter(r.lst, x -> x <> s.event_type)),
           r.tot + list_position(r.lst, s.event_type) - 1,
           greatest(r.mx, list_position(r.lst, s.event_type) - 1)
    FROM rec r JOIN seq s
      ON s.user_id = r.user_id AND s.idx = r.idx + 1
)
SELECT r.user_id, CAST(s.n AS BIGINT) AS n, r.tot AS mtf_sum,
       r.mx AS mtf_max
FROM rec r JOIN (SELECT user_id, any_value(n) AS n FROM seq
                 GROUP BY user_id) s
  ON s.user_id = r.user_id AND r.idx = s.n
"""


def q_transposition_pairs_docs(sf_dir: str):
    """Adjacent-transposition pairs over the corpus' distinct 4-char
    windows (``stages/strsim.py:transposition_pairs``): window pairs
    that differ by exactly one Damerau swap — the edit operation the
    Levenshtein ``ed1``/``ed2`` deletion neighborhoods cost 2 for.
    Swap variants are generated as vectorized utf-32 column swaps
    (bounded by alphabet^4, never corpus size); ONE hash(key) shuffle
    matches variants to real windows; a second hash-partitioned
    distinct canonicalizes the pair found from both endpoints."""
    from ...stages.strsim import transposition_pairs

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"]).repartition(8)
    return transposition_pairs(ds, L=4, num_partitions=8)


TRANSPOSITION_SQL = """
WITH g AS (
    SELECT DISTINCT substr(text, i, 4) AS token
    FROM documents,
         LATERAL unnest(generate_series(1, length(text) - 3)) AS t(i)
),
sw AS (
    SELECT token,
           substr(token, 1, i - 1) || substr(token, i + 1, 1)
               || substr(token, i, 1) || substr(token, i + 2) AS v
    FROM g, LATERAL unnest(generate_series(1, 3)) AS s(i)
    WHERE substr(token, i, 1) <> substr(token, i + 1, 1)
)
SELECT DISTINCT least(sw.token, g2.token) AS term_a,
       greatest(sw.token, g2.token) AS term_b
FROM sw JOIN g g2 ON g2.token = sw.v AND sw.token <> g2.token
"""


def q_golomb_postings_docs(sf_dir: str):
    """Rice/Golomb posting-gap compression with per-token optimal k
    (``stages/postings.py:golomb_postings``; Managing Gigabytes §3.3):
    the classic IR gap codec next to the catalog's LEB128, Elias-Fano
    and Roaring entries. The bitstream is really packed in each task
    (length-asserted, head-word sample-decoded); the manifest
    ``(df, rice_k, rice_bits, rice_bytes)`` replays in SQL via an
    unnested k-grid + argmin (ties -> smallest k)."""
    from ...stages.postings import golomb_postings

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"]).repartition(8)
    return golomb_postings(ds, num_partitions=8)


GOLOMB_SQL = """
WITH w AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS token
    FROM documents
),
f AS (SELECT DISTINCT doc_id, token FROM w WHERE token <> ''),
gg AS (
    SELECT token,
           COALESCE(doc_id - lag(doc_id) OVER (PARTITION BY token
                                               ORDER BY doc_id),
                    doc_id + 1) AS gap
    FROM f
),
c AS (
    SELECT token, k.k AS k,
           CAST(sum((gap - 1) >> k.k) + count(*) * (1 + k.k) AS BIGINT)
               AS bits
    FROM gg CROSS JOIN
         (SELECT unnest(generate_series(0, 40)) AS k) k
    GROUP BY token, k.k
),
best AS (
    SELECT token, k AS rice_k, bits AS rice_bits,
           row_number() OVER (PARTITION BY token
                              ORDER BY bits, k) AS rn
    FROM c
),
dfs AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM f GROUP BY token)
SELECT dfs.token, dfs.df, 8 * dfs.df AS plain_bytes,
       CAST(b.rice_k AS BIGINT) AS rice_k, b.rice_bits,
       (b.rice_bits + 7) // 8 AS rice_bytes
FROM dfs JOIN best b ON b.token = dfs.token AND b.rn = 1
"""


def q_savgol_15m(sf_dir: str):
    """Savitzky-Golay window-5 quadratic smoothing per event_type over
    the 15m tier (``stages/smoothing.py:savgol_smooth``; Savitzky &
    Golay 1964): integer (-3,12,17,12,-3)/35 convolution — ``sg_num``
    exact int64, ``sg`` the one pinned division. Full windows only (no
    edge padding); the SQL replay is a lag/lead window dot product."""
    from ...stages.smoothing import savgol_smooth

    return savgol_smooth(_rolled_k(sf_dir, W15M), num_partitions=4)


SAVGOL_SQL = f"""
WITH r AS (
    SELECT event_type AS series_id,
           (epoch_us(ts) // {W15M}) * {W15M} AS bucket,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
    FROM events GROUP BY 1, 2
),
l AS (
    SELECT series_id, bucket, y,
           lag(y, 2) OVER w AS ym2, lag(y, 1) OVER w AS ym1,
           lead(y, 1) OVER w AS yp1, lead(y, 2) OVER w AS yp2
    FROM r WINDOW w AS (PARTITION BY series_id ORDER BY bucket)
)
SELECT series_id, bucket, y,
       CAST(-3 * ym2 + 12 * ym1 + 17 * y + 12 * yp1 - 3 * yp2
            AS BIGINT) AS sg_num,
       CAST(-3 * ym2 + 12 * ym1 + 17 * y + 12 * yp1 - 3 * yp2
            AS DOUBLE) / 35.0 AS sg
FROM l
WHERE ym2 IS NOT NULL AND yp2 IS NOT NULL
"""


def q_ols_influence_1h(sf_dir: str):
    """Per-point OLS influence diagnostics over each event_type's 1h
    trend fit (``stages/correlate.py:ols_influence``): residual,
    leverage and the scaled Cook numerator ``e^2 h/(1-h)^2`` — a
    float-sum-free influence measure where every output is either
    exact int64 or a pinned IEEE expression of the exact integer
    sufficient statistics (degenerate fits CASE-pinned on both
    sides). The diagnostics companion to ``ols_slope_1h`` /
    ``ransac_line_1h``."""
    from ...stages.correlate import ols_influence

    return ols_influence(_rolled_k(sf_dir, W1H), step=W1H,
                         num_partitions=4)


OLS_INFLUENCE_SQL = f"""
WITH r AS (
    SELECT event_type AS series_id,
           (epoch_us(ts) // {W1H}) * {W1H} AS bucket,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
    FROM events GROUP BY 1, 2
),
tt AS (
    SELECT series_id, bucket, y,
           (bucket - min(bucket) OVER (PARTITION BY series_id))
               // {W1H} AS t
    FROM r
),
st AS (
    SELECT series_id,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(t) AS BIGINT) AS s_t,
           CAST(sum(y) AS BIGINT) AS s_y,
           CAST(sum(t * t) AS BIGINT) AS s_tt,
           CAST(sum(t * y) AS BIGINT) AS s_ty
    FROM tt GROUP BY 1
),
j AS (
    SELECT tt.series_id, tt.bucket, tt.t, tt.y,
           st.n, st.s_t, st.s_y,
           st.n * st.s_tt - st.s_t * st.s_t AS den,
           st.n * st.s_ty - st.s_t * st.s_y AS s_num
    FROM tt JOIN st USING (series_id)
),
k AS (
    SELECT *,
           CASE WHEN den <> 0
                THEN CAST(s_num AS DOUBLE) / CAST(den AS DOUBLE)
                ELSE 0.0 END AS slope
    FROM j
),
m AS (
    SELECT *,
           (CAST(s_y AS DOUBLE) - slope * CAST(s_t AS DOUBLE))
               / CAST(n AS DOUBLE) AS c
    FROM k
),
p AS (
    SELECT *,
           CAST(y AS DOUBLE) - (c + slope * CAST(t AS DOUBLE)) AS e,
           CASE WHEN den <> 0
                THEN 1.0 / CAST(n AS DOUBLE)
                     + ((CAST(t AS DOUBLE)
                         - CAST(s_t AS DOUBLE) / CAST(n AS DOUBLE))
                        * (CAST(t AS DOUBLE)
                           - CAST(s_t AS DOUBLE) / CAST(n AS DOUBLE)))
                       * CAST(n AS DOUBLE) / CAST(den AS DOUBLE)
                ELSE 1.0 / CAST(n AS DOUBLE) END AS h
    FROM m
)
SELECT series_id, bucket, t, y, e, h,
       CASE WHEN h < 1.0
            THEN e * e * h / ((1.0 - h) * (1.0 - h))
            ELSE 0.0 END AS d_scaled
FROM p
"""


def q_mis_docs(sf_dir: str):
    """Maximal independent set over the kcore/bfs link graph by
    deterministic greedy-by-id rounds (``stages/graph.py:mis_rounds``;
    the Luby 1986 schema with node id as priority, 6 rounds — the
    bounded-round contract of ``bfs_hops_docs``/``sssp_docs``): per
    round two tagged-union hash joins against the streaming edge set,
    one hashpart grouped min and one hash-partitioned anti join; only
    node-bounded pool/MIS tables materialize. Output
    ``(node, round)`` — exact integers, replayed by 6 chained CTE
    rounds."""
    import pyarrow.parquet as _pq

    from ...stages.graph import mis_rounds

    n = _pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id"]).repartition(4)

    def _edges(b: pa.Table) -> pa.Table:
        import numpy as _np

        d = b["doc_id"].to_numpy(zero_copy_only=False).astype(_np.int64)
        srcs, dsts = [], []
        for j in range(1, 7):
            m = j <= 1 + d % 6
            s = d[m]
            t = (s * 31 + 97 * j) % n
            keep = s != t
            srcs.append(_np.minimum(s[keep], t[keep]))
            dsts.append(_np.maximum(s[keep], t[keep]))
        u = _np.concatenate(srcs)
        v = _np.concatenate(dsts)
        return pa.table({
            "src": pa.array(_np.concatenate([u, v])),
            "dst": pa.array(_np.concatenate([v, u]))})

    edges = ds.map_batches(_edges, batch_format="pyarrow")
    return mis_rounds(edges, ds, node_col="doc_id", rounds=6,
                      num_partitions=4)


MIS_SQL = """
WITH nn AS (SELECT count(*) AS n FROM documents),
base AS (
    SELECT d.doc_id AS s, u.j,
           ((d.doc_id * 31 + 97 * u.j) % (SELECT n FROM nn)) AS t
    FROM documents d, LATERAL unnest(generate_series(1, 6)) AS u(j)
    WHERE u.j <= 1 + d.doc_id % 6
),
canon AS MATERIALIZED (
    SELECT least(s, t) AS u, greatest(s, t) AS v FROM base WHERE s <> t
),
ed AS MATERIALIZED (
    SELECT u AS node, v AS nbr FROM canon
    UNION ALL
    SELECT v AS node, u AS nbr FROM canon
),
rem0 AS MATERIALIZED (SELECT doc_id AS node FROM documents),
mis1 AS MATERIALIZED (
    SELECT rem.node FROM rem0 rem
    WHERE NOT EXISTS (
        SELECT 1 FROM ed JOIN rem0 r2 ON r2.node = ed.nbr
        WHERE ed.node = rem.node AND ed.nbr < rem.node)
),
rem1 AS MATERIALIZED (
    SELECT node FROM rem0
    WHERE node NOT IN (SELECT node FROM mis1)
      AND node NOT IN (SELECT ed.nbr FROM ed
                       JOIN mis1 m ON ed.node = m.node)
),
mis2 AS MATERIALIZED (
    SELECT rem.node FROM rem1 rem
    WHERE NOT EXISTS (
        SELECT 1 FROM ed JOIN rem1 r2 ON r2.node = ed.nbr
        WHERE ed.node = rem.node AND ed.nbr < rem.node)
),
rem2 AS MATERIALIZED (
    SELECT node FROM rem1
    WHERE node NOT IN (SELECT node FROM mis2)
      AND node NOT IN (SELECT ed.nbr FROM ed
                       JOIN mis2 m ON ed.node = m.node)
),
mis3 AS MATERIALIZED (
    SELECT rem.node FROM rem2 rem
    WHERE NOT EXISTS (
        SELECT 1 FROM ed JOIN rem2 r2 ON r2.node = ed.nbr
        WHERE ed.node = rem.node AND ed.nbr < rem.node)
),
rem3 AS MATERIALIZED (
    SELECT node FROM rem2
    WHERE node NOT IN (SELECT node FROM mis3)
      AND node NOT IN (SELECT ed.nbr FROM ed
                       JOIN mis3 m ON ed.node = m.node)
),
mis4 AS MATERIALIZED (
    SELECT rem.node FROM rem3 rem
    WHERE NOT EXISTS (
        SELECT 1 FROM ed JOIN rem3 r2 ON r2.node = ed.nbr
        WHERE ed.node = rem.node AND ed.nbr < rem.node)
),
rem4 AS MATERIALIZED (
    SELECT node FROM rem3
    WHERE node NOT IN (SELECT node FROM mis4)
      AND node NOT IN (SELECT ed.nbr FROM ed
                       JOIN mis4 m ON ed.node = m.node)
),
mis5 AS MATERIALIZED (
    SELECT rem.node FROM rem4 rem
    WHERE NOT EXISTS (
        SELECT 1 FROM ed JOIN rem4 r2 ON r2.node = ed.nbr
        WHERE ed.node = rem.node AND ed.nbr < rem.node)
),
rem5 AS MATERIALIZED (
    SELECT node FROM rem4
    WHERE node NOT IN (SELECT node FROM mis5)
      AND node NOT IN (SELECT ed.nbr FROM ed
                       JOIN mis5 m ON ed.node = m.node)
),
mis6 AS MATERIALIZED (
    SELECT rem.node FROM rem5 rem
    WHERE NOT EXISTS (
        SELECT 1 FROM ed JOIN rem5 r2 ON r2.node = ed.nbr
        WHERE ed.node = rem.node AND ed.nbr < rem.node)
),
rem6 AS MATERIALIZED (
    SELECT node FROM rem5
    WHERE node NOT IN (SELECT node FROM mis6)
      AND node NOT IN (SELECT ed.nbr FROM ed
                       JOIN mis6 m ON ed.node = m.node)
)
SELECT node, CAST(1 AS BIGINT) AS round FROM mis1
UNION ALL
SELECT node, CAST(2 AS BIGINT) AS round FROM mis2
UNION ALL
SELECT node, CAST(3 AS BIGINT) AS round FROM mis3
UNION ALL
SELECT node, CAST(4 AS BIGINT) AS round FROM mis4
UNION ALL
SELECT node, CAST(5 AS BIGINT) AS round FROM mis5
UNION ALL
SELECT node, CAST(6 AS BIGINT) AS round FROM mis6
"""


def q_g2_collocations_docs(sf_dir: str):
    """Dunning log-likelihood collocations over adjacent token bigrams
    (``stages/cooccur.py:g2_collocations``; Dunning 1993): exact 2x2
    contingency from the bigram and margin counts (raw whitespace
    adjacency, empty tokens dropped), G2 as a single per-row
    expression whose xlx terms go through libm ``log`` on both sides.
    The calibrated-for-rare-counts companion to the PMI ranking."""
    from ...stages.cooccur import g2_collocations

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"]).repartition(8)
    return g2_collocations(ds, min_count=3, num_partitions=8)


G2_SQL = """
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS l FROM documents
),
bg AS (
    SELECT l[i] AS w1, l[i + 1] AS w2
    FROM toks, LATERAL unnest(generate_series(1, len(l) - 1)) AS t(i)
    WHERE l[i] <> '' AND l[i + 1] <> ''
),
cnts AS (
    SELECT w1, w2, CAST(count(*) AS BIGINT) AS a
    FROM bg GROUP BY w1, w2
),
m1 AS (SELECT w1, CAST(sum(a) AS BIGINT) AS c1 FROM cnts GROUP BY w1),
m2 AS (SELECT w2, CAST(sum(a) AS BIGINT) AS c2 FROM cnts GROUP BY w2),
nt AS (SELECT CAST(sum(a) AS BIGINT) AS n FROM cnts),
tab AS (
    SELECT c.w1, c.w2, c.a, m1.c1 - c.a AS b, m2.c2 - c.a AS c,
           (SELECT n FROM nt) - c.a - (m1.c1 - c.a) - (m2.c2 - c.a) AS d,
           (SELECT n FROM nt) AS n
    FROM cnts c JOIN m1 USING (w1) JOIN m2 USING (w2)
    WHERE c.a >= 3
)
SELECT w1, w2, a, b, c, d,
       2.0 * (
           (CASE WHEN a > 0 THEN CAST(a AS DOUBLE)
                 * ln(CAST(a AS DOUBLE)) ELSE 0.0 END)
         + (CASE WHEN b > 0 THEN CAST(b AS DOUBLE)
                 * ln(CAST(b AS DOUBLE)) ELSE 0.0 END)
         + (CASE WHEN c > 0 THEN CAST(c AS DOUBLE)
                 * ln(CAST(c AS DOUBLE)) ELSE 0.0 END)
         + (CASE WHEN d > 0 THEN CAST(d AS DOUBLE)
                 * ln(CAST(d AS DOUBLE)) ELSE 0.0 END)
         + CAST(n AS DOUBLE) * ln(CAST(n AS DOUBLE))
         - (CASE WHEN a + b > 0 THEN CAST(a + b AS DOUBLE)
                 * ln(CAST(a + b AS DOUBLE)) ELSE 0.0 END)
         - (CASE WHEN a + c > 0 THEN CAST(a + c AS DOUBLE)
                 * ln(CAST(a + c AS DOUBLE)) ELSE 0.0 END)
         - (CASE WHEN b + d > 0 THEN CAST(b + d AS DOUBLE)
                 * ln(CAST(b + d AS DOUBLE)) ELSE 0.0 END)
         - (CASE WHEN c + d > 0 THEN CAST(c + d AS DOUBLE)
                 * ln(CAST(c + d AS DOUBLE)) ELSE 0.0 END)
       ) AS g2
FROM tab
"""


def q_mst_docs(sf_dir: str):
    """Minimum spanning forest of the weighted link graph by
    deterministic Boruvka rounds (``stages/graph.py:boruvka_mst``;
    the classic distributed MST): same kcore/bfs edge generator with
    weight ``1 + (u+v) % 7``, lightest-outgoing-edge selection under
    the total order ``(w, a, b)``, 2-cycle-broken pointer forests and
    driver-side numpy pointer contraction under the kcore bounded-node
    contract (8 rounds — measured 4 at sf0.01, 6 at sf0.1; the
    engine early-exits at convergence, identically to the oracle's
    empty trailing rounds). Output: the exact forest edges
    ``(u, v, w)`` — verified equal to Kruskal in pytest."""
    import pyarrow.parquet as _pq

    from ...stages.graph import boruvka_mst

    n = _pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id"]).repartition(4)

    def _edges(b: pa.Table) -> pa.Table:
        import numpy as _np

        d = b["doc_id"].to_numpy(zero_copy_only=False).astype(_np.int64)
        srcs, dsts = [], []
        for j in range(1, 7):
            m = j <= 1 + d % 6
            s = d[m]
            t = (s * 31 + 97 * j) % n
            keep = s != t
            srcs.append(_np.minimum(s[keep], t[keep]))
            dsts.append(_np.maximum(s[keep], t[keep]))
        u = _np.concatenate(srcs)
        v = _np.concatenate(dsts)
        ww = 1 + (u + v) % 7
        return pa.table({
            "src": pa.array(_np.concatenate([u, v])),
            "dst": pa.array(_np.concatenate([v, u])),
            "w": pa.array(_np.concatenate([ww, ww]))})

    edges = ds.map_batches(_edges, batch_format="pyarrow")
    return boruvka_mst(edges, ds, node_col="doc_id", rounds=8,
                       num_partitions=4)


MST_SQL = """
WITH nn AS (SELECT count(*) AS n FROM documents),
base AS MATERIALIZED (
    SELECT d.doc_id AS s, u.j,
           ((d.doc_id * 31 + 97 * u.j) % (SELECT n FROM nn)) AS t
    FROM documents d, LATERAL unnest(generate_series(1, 6)) AS u(j)
    WHERE u.j <= 1 + d.doc_id % 6
),
canon AS MATERIALIZED (
    SELECT least(s, t) AS u, greatest(s, t) AS v FROM base WHERE s <> t
),
ed AS MATERIALIZED (
    SELECT u AS a, v AS b, 1 + (u + v) % 7 AS w FROM canon
    UNION ALL
    SELECT v AS a, u AS b, 1 + (u + v) % 7 AS w FROM canon
),
lab0 AS MATERIALIZED (
    SELECT doc_id AS node, doc_id AS lbl FROM documents
),
el1 AS MATERIALIZED (
    SELECT e.a, e.b, e.w, x.lbl AS la, y.lbl AS lb
    FROM ed e JOIN lab0 x ON x.node = e.a
              JOIN lab0 y ON y.node = e.b
    WHERE x.lbl <> y.lbl
),
ch1 AS MATERIALIZED (
    SELECT la, lb, a, b, w FROM (
        SELECT el.*, row_number() OVER (
            PARTITION BY la
            ORDER BY w, least(a, b), greatest(a, b)) AS rn
        FROM el1 el) WHERE rn = 1
),
ms1 AS MATERIALIZED (
    SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v, w FROM ch1
),
p0_1 AS MATERIALIZED (
    SELECT z.c, CASE WHEN z.pp = z.c AND z.c < z.p
                THEN z.c ELSE z.p END AS p
    FROM (SELECT x.la AS c, x.lb AS p, y.lb AS pp
          FROM ch1 x JOIN ch1 y ON y.la = x.lb) z
),
p1_1 AS MATERIALIZED (
    SELECT x.c, y.p FROM p0_1 x JOIN p0_1 y ON y.c = x.p
),
p2_1 AS MATERIALIZED (
    SELECT x.c, y.p FROM p1_1 x JOIN p1_1 y ON y.c = x.p
),
p3_1 AS MATERIALIZED (
    SELECT x.c, y.p FROM p2_1 x JOIN p2_1 y ON y.c = x.p
),
p4_1 AS MATERIALIZED (
    SELECT x.c, y.p FROM p3_1 x JOIN p3_1 y ON y.c = x.p
),
lab1 AS MATERIALIZED (
    SELECT l.node, COALESCE(j.p, l.lbl) AS lbl
    FROM lab0 l LEFT JOIN p4_1 j ON j.c = l.lbl
),
el2 AS MATERIALIZED (
    SELECT e.a, e.b, e.w, x.lbl AS la, y.lbl AS lb
    FROM ed e JOIN lab1 x ON x.node = e.a
              JOIN lab1 y ON y.node = e.b
    WHERE x.lbl <> y.lbl
),
ch2 AS MATERIALIZED (
    SELECT la, lb, a, b, w FROM (
        SELECT el.*, row_number() OVER (
            PARTITION BY la
            ORDER BY w, least(a, b), greatest(a, b)) AS rn
        FROM el2 el) WHERE rn = 1
),
ms2 AS MATERIALIZED (
    SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v, w FROM ch2
),
p0_2 AS MATERIALIZED (
    SELECT z.c, CASE WHEN z.pp = z.c AND z.c < z.p
                THEN z.c ELSE z.p END AS p
    FROM (SELECT x.la AS c, x.lb AS p, y.lb AS pp
          FROM ch2 x JOIN ch2 y ON y.la = x.lb) z
),
p1_2 AS MATERIALIZED (
    SELECT x.c, y.p FROM p0_2 x JOIN p0_2 y ON y.c = x.p
),
p2_2 AS MATERIALIZED (
    SELECT x.c, y.p FROM p1_2 x JOIN p1_2 y ON y.c = x.p
),
p3_2 AS MATERIALIZED (
    SELECT x.c, y.p FROM p2_2 x JOIN p2_2 y ON y.c = x.p
),
p4_2 AS MATERIALIZED (
    SELECT x.c, y.p FROM p3_2 x JOIN p3_2 y ON y.c = x.p
),
lab2 AS MATERIALIZED (
    SELECT l.node, COALESCE(j.p, l.lbl) AS lbl
    FROM lab1 l LEFT JOIN p4_2 j ON j.c = l.lbl
),
el3 AS MATERIALIZED (
    SELECT e.a, e.b, e.w, x.lbl AS la, y.lbl AS lb
    FROM ed e JOIN lab2 x ON x.node = e.a
              JOIN lab2 y ON y.node = e.b
    WHERE x.lbl <> y.lbl
),
ch3 AS MATERIALIZED (
    SELECT la, lb, a, b, w FROM (
        SELECT el.*, row_number() OVER (
            PARTITION BY la
            ORDER BY w, least(a, b), greatest(a, b)) AS rn
        FROM el3 el) WHERE rn = 1
),
ms3 AS MATERIALIZED (
    SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v, w FROM ch3
),
p0_3 AS MATERIALIZED (
    SELECT z.c, CASE WHEN z.pp = z.c AND z.c < z.p
                THEN z.c ELSE z.p END AS p
    FROM (SELECT x.la AS c, x.lb AS p, y.lb AS pp
          FROM ch3 x JOIN ch3 y ON y.la = x.lb) z
),
p1_3 AS MATERIALIZED (
    SELECT x.c, y.p FROM p0_3 x JOIN p0_3 y ON y.c = x.p
),
p2_3 AS MATERIALIZED (
    SELECT x.c, y.p FROM p1_3 x JOIN p1_3 y ON y.c = x.p
),
p3_3 AS MATERIALIZED (
    SELECT x.c, y.p FROM p2_3 x JOIN p2_3 y ON y.c = x.p
),
p4_3 AS MATERIALIZED (
    SELECT x.c, y.p FROM p3_3 x JOIN p3_3 y ON y.c = x.p
),
lab3 AS MATERIALIZED (
    SELECT l.node, COALESCE(j.p, l.lbl) AS lbl
    FROM lab2 l LEFT JOIN p4_3 j ON j.c = l.lbl
),
el4 AS MATERIALIZED (
    SELECT e.a, e.b, e.w, x.lbl AS la, y.lbl AS lb
    FROM ed e JOIN lab3 x ON x.node = e.a
              JOIN lab3 y ON y.node = e.b
    WHERE x.lbl <> y.lbl
),
ch4 AS MATERIALIZED (
    SELECT la, lb, a, b, w FROM (
        SELECT el.*, row_number() OVER (
            PARTITION BY la
            ORDER BY w, least(a, b), greatest(a, b)) AS rn
        FROM el4 el) WHERE rn = 1
),
ms4 AS MATERIALIZED (
    SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v, w FROM ch4
),
p0_4 AS MATERIALIZED (
    SELECT z.c, CASE WHEN z.pp = z.c AND z.c < z.p
                THEN z.c ELSE z.p END AS p
    FROM (SELECT x.la AS c, x.lb AS p, y.lb AS pp
          FROM ch4 x JOIN ch4 y ON y.la = x.lb) z
),
p1_4 AS MATERIALIZED (
    SELECT x.c, y.p FROM p0_4 x JOIN p0_4 y ON y.c = x.p
),
p2_4 AS MATERIALIZED (
    SELECT x.c, y.p FROM p1_4 x JOIN p1_4 y ON y.c = x.p
),
p3_4 AS MATERIALIZED (
    SELECT x.c, y.p FROM p2_4 x JOIN p2_4 y ON y.c = x.p
),
p4_4 AS MATERIALIZED (
    SELECT x.c, y.p FROM p3_4 x JOIN p3_4 y ON y.c = x.p
),
lab4 AS MATERIALIZED (
    SELECT l.node, COALESCE(j.p, l.lbl) AS lbl
    FROM lab3 l LEFT JOIN p4_4 j ON j.c = l.lbl
),
el5 AS MATERIALIZED (
    SELECT e.a, e.b, e.w, x.lbl AS la, y.lbl AS lb
    FROM ed e JOIN lab4 x ON x.node = e.a
              JOIN lab4 y ON y.node = e.b
    WHERE x.lbl <> y.lbl
),
ch5 AS MATERIALIZED (
    SELECT la, lb, a, b, w FROM (
        SELECT el.*, row_number() OVER (
            PARTITION BY la
            ORDER BY w, least(a, b), greatest(a, b)) AS rn
        FROM el5 el) WHERE rn = 1
),
ms5 AS MATERIALIZED (
    SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v, w FROM ch5
),
p0_5 AS MATERIALIZED (
    SELECT z.c, CASE WHEN z.pp = z.c AND z.c < z.p
                THEN z.c ELSE z.p END AS p
    FROM (SELECT x.la AS c, x.lb AS p, y.lb AS pp
          FROM ch5 x JOIN ch5 y ON y.la = x.lb) z
),
p1_5 AS MATERIALIZED (
    SELECT x.c, y.p FROM p0_5 x JOIN p0_5 y ON y.c = x.p
),
p2_5 AS MATERIALIZED (
    SELECT x.c, y.p FROM p1_5 x JOIN p1_5 y ON y.c = x.p
),
p3_5 AS MATERIALIZED (
    SELECT x.c, y.p FROM p2_5 x JOIN p2_5 y ON y.c = x.p
),
p4_5 AS MATERIALIZED (
    SELECT x.c, y.p FROM p3_5 x JOIN p3_5 y ON y.c = x.p
),
lab5 AS MATERIALIZED (
    SELECT l.node, COALESCE(j.p, l.lbl) AS lbl
    FROM lab4 l LEFT JOIN p4_5 j ON j.c = l.lbl
),
el6 AS MATERIALIZED (
    SELECT e.a, e.b, e.w, x.lbl AS la, y.lbl AS lb
    FROM ed e JOIN lab5 x ON x.node = e.a
              JOIN lab5 y ON y.node = e.b
    WHERE x.lbl <> y.lbl
),
ch6 AS MATERIALIZED (
    SELECT la, lb, a, b, w FROM (
        SELECT el.*, row_number() OVER (
            PARTITION BY la
            ORDER BY w, least(a, b), greatest(a, b)) AS rn
        FROM el6 el) WHERE rn = 1
),
ms6 AS MATERIALIZED (
    SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v, w FROM ch6
),
p0_6 AS MATERIALIZED (
    SELECT z.c, CASE WHEN z.pp = z.c AND z.c < z.p
                THEN z.c ELSE z.p END AS p
    FROM (SELECT x.la AS c, x.lb AS p, y.lb AS pp
          FROM ch6 x JOIN ch6 y ON y.la = x.lb) z
),
p1_6 AS MATERIALIZED (
    SELECT x.c, y.p FROM p0_6 x JOIN p0_6 y ON y.c = x.p
),
p2_6 AS MATERIALIZED (
    SELECT x.c, y.p FROM p1_6 x JOIN p1_6 y ON y.c = x.p
),
p3_6 AS MATERIALIZED (
    SELECT x.c, y.p FROM p2_6 x JOIN p2_6 y ON y.c = x.p
),
p4_6 AS MATERIALIZED (
    SELECT x.c, y.p FROM p3_6 x JOIN p3_6 y ON y.c = x.p
),
lab6 AS MATERIALIZED (
    SELECT l.node, COALESCE(j.p, l.lbl) AS lbl
    FROM lab5 l LEFT JOIN p4_6 j ON j.c = l.lbl
),
el7 AS MATERIALIZED (
    SELECT e.a, e.b, e.w, x.lbl AS la, y.lbl AS lb
    FROM ed e JOIN lab6 x ON x.node = e.a
              JOIN lab6 y ON y.node = e.b
    WHERE x.lbl <> y.lbl
),
ch7 AS MATERIALIZED (
    SELECT la, lb, a, b, w FROM (
        SELECT el.*, row_number() OVER (
            PARTITION BY la
            ORDER BY w, least(a, b), greatest(a, b)) AS rn
        FROM el7 el) WHERE rn = 1
),
ms7 AS MATERIALIZED (
    SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v, w FROM ch7
),
p0_7 AS MATERIALIZED (
    SELECT z.c, CASE WHEN z.pp = z.c AND z.c < z.p
                THEN z.c ELSE z.p END AS p
    FROM (SELECT x.la AS c, x.lb AS p, y.lb AS pp
          FROM ch7 x JOIN ch7 y ON y.la = x.lb) z
),
p1_7 AS MATERIALIZED (
    SELECT x.c, y.p FROM p0_7 x JOIN p0_7 y ON y.c = x.p
),
p2_7 AS MATERIALIZED (
    SELECT x.c, y.p FROM p1_7 x JOIN p1_7 y ON y.c = x.p
),
p3_7 AS MATERIALIZED (
    SELECT x.c, y.p FROM p2_7 x JOIN p2_7 y ON y.c = x.p
),
p4_7 AS MATERIALIZED (
    SELECT x.c, y.p FROM p3_7 x JOIN p3_7 y ON y.c = x.p
),
lab7 AS MATERIALIZED (
    SELECT l.node, COALESCE(j.p, l.lbl) AS lbl
    FROM lab6 l LEFT JOIN p4_7 j ON j.c = l.lbl
),
el8 AS MATERIALIZED (
    SELECT e.a, e.b, e.w, x.lbl AS la, y.lbl AS lb
    FROM ed e JOIN lab7 x ON x.node = e.a
              JOIN lab7 y ON y.node = e.b
    WHERE x.lbl <> y.lbl
),
ch8 AS MATERIALIZED (
    SELECT la, lb, a, b, w FROM (
        SELECT el.*, row_number() OVER (
            PARTITION BY la
            ORDER BY w, least(a, b), greatest(a, b)) AS rn
        FROM el8 el) WHERE rn = 1
),
ms8 AS MATERIALIZED (
    SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v, w FROM ch8
),
p0_8 AS MATERIALIZED (
    SELECT z.c, CASE WHEN z.pp = z.c AND z.c < z.p
                THEN z.c ELSE z.p END AS p
    FROM (SELECT x.la AS c, x.lb AS p, y.lb AS pp
          FROM ch8 x JOIN ch8 y ON y.la = x.lb) z
),
p1_8 AS MATERIALIZED (
    SELECT x.c, y.p FROM p0_8 x JOIN p0_8 y ON y.c = x.p
),
p2_8 AS MATERIALIZED (
    SELECT x.c, y.p FROM p1_8 x JOIN p1_8 y ON y.c = x.p
),
p3_8 AS MATERIALIZED (
    SELECT x.c, y.p FROM p2_8 x JOIN p2_8 y ON y.c = x.p
),
p4_8 AS MATERIALIZED (
    SELECT x.c, y.p FROM p3_8 x JOIN p3_8 y ON y.c = x.p
),
lab8 AS MATERIALIZED (
    SELECT l.node, COALESCE(j.p, l.lbl) AS lbl
    FROM lab7 l LEFT JOIN p4_8 j ON j.c = l.lbl
)
SELECT DISTINCT u, v, CAST(w AS BIGINT) AS w FROM (
SELECT u, v, w FROM ms1
UNION ALL
SELECT u, v, w FROM ms2
UNION ALL
SELECT u, v, w FROM ms3
UNION ALL
SELECT u, v, w FROM ms4
UNION ALL
SELECT u, v, w FROM ms5
UNION ALL
SELECT u, v, w FROM ms6
UNION ALL
SELECT u, v, w FROM ms7
UNION ALL
SELECT u, v, w FROM ms8
)
"""


_W7D = 7 * 86400 * US
_CR_BASE = 1704067200 * US  # 2024-01-01, the corpus epoch


def q_capture_recapture_users(sf_dir: str):
    """Chapman capture-recapture population estimate per event_type
    (Chapman 1951 — the two-sample mark-recapture estimator, here
    "how many users does this event type really have" from two
    observation windows): capture occasions are the first and second
    7-day windows from the corpus epoch (2024-01-01); ``n1``/``n2`` are distinct
    users seen in each, ``m`` the recaptures, and the estimator
    ``(n1+1)(n2+1) // (m+1) - 1`` stays exact int64 (floored, both
    sides). Distributed shape: map-side distinct (type, window, user)
    partials, ONE hash shuffle, bounded per-type merge."""
    ds = _read_parquet_clean(f"{sf_dir}/events.parquet",
                             columns=["ts", "user_id", "event_type"]) \
        .repartition(8)

    import numpy as _np

    from ...arrow_utils import rename_agg, stable_part_codes

    def _windows(b: pa.Table) -> pa.Table:
        ts = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        w = (ts - _CR_BASE) // _W7D
        keep = w < 2  # first two 7-day occasions only
        t = pa.table({"event_type": b["event_type"],
                      "user_id": b["user_id"],
                      "win": pa.array(w)}).filter(pa.array(keep))
        d = t.group_by(["event_type", "user_id", "win"]).aggregate([])
        h = stable_part_codes(d["event_type"], 256)
        return d.append_column("__part", pa.array(h))

    def _merge(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        d = t.group_by(["event_type", "user_id", "win"]).aggregate([])
        et = d["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        from ...arrow_utils import group_codes

        d = d.take(pc.sort_indices(d, sort_keys=[
            ("event_type", "ascending"), ("user_id", "ascending")]))
        et = d["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        codes = group_codes(et)
        uid = d["user_id"].to_numpy(zero_copy_only=False)
        win = d["win"].to_numpy(zero_copy_only=False)
        out = {k: [] for k in ("t", "n1", "n2", "m", "est")}
        n = len(uid)
        change = _np.ones(n, dtype=bool)
        change[1:] = codes[1:] != codes[:-1]
        seg_first = _np.flatnonzero(change)
        seg_len = _np.diff(_np.r_[seg_first, n])
        for si, f0 in enumerate(seg_first):
            sl = slice(f0, f0 + int(seg_len[si]))
            u, w = uid[sl], win[sl]
            s1 = set(u[w == 0].tolist())
            s2 = set(u[w == 1].tolist())
            n1, n2, m = len(s1), len(s2), len(s1 & s2)
            out["t"].append(et[int(f0)].as_py())
            out["n1"].append(n1)
            out["n2"].append(n2)
            out["m"].append(m)
            out["est"].append((n1 + 1) * (n2 + 1) // (m + 1) - 1)
        return pa.table({"event_type": pa.array(out["t"], et.type),
                         "n1": pa.array(out["n1"], pa.int64()),
                         "n2": pa.array(out["n2"], pa.int64()),
                         "m": pa.array(out["m"], pa.int64()),
                         "chapman_est": pa.array(out["est"], pa.int64())})

    parted = ds.map_batches(_windows, batch_format="pyarrow")
    return parted.repartition(4).groupby("__part").map_groups(
        _merge, batch_format="pyarrow")


CAPTURE_SQL = f"""
WITH e AS (
    SELECT event_type, user_id,
           (epoch_us(ts) - {_CR_BASE}) // {_W7D} AS win
    FROM events
    WHERE (epoch_us(ts) - {_CR_BASE}) // {_W7D} < 2
),
agg AS (
    SELECT event_type,
           CAST(count(DISTINCT CASE WHEN win = 0 THEN user_id END)
                AS BIGINT) AS n1,
           CAST(count(DISTINCT CASE WHEN win = 1 THEN user_id END)
                AS BIGINT) AS n2
    FROM e GROUP BY event_type
),
recap AS (
    SELECT event_type, CAST(count(*) AS BIGINT) AS m FROM (
        SELECT event_type, user_id FROM e WHERE win = 0
        INTERSECT
        SELECT event_type, user_id FROM e WHERE win = 1
    ) GROUP BY event_type
)
SELECT a.event_type, a.n1, a.n2, coalesce(r.m, 0) AS m,
       (a.n1 + 1) * (a.n2 + 1) // (coalesce(r.m, 0) + 1) - 1
           AS chapman_est
FROM agg a LEFT JOIN recap r USING (event_type)
"""


def q_wilson_interval_events(sf_dir: str):
    """Wilson score 95% interval for the per-event-type proportion of
    high-value events (cents > 10000, ~p15 of the value domain)
    (``stages/abtest.py:wilson_interval``; Wilson 1927): exact int64
    ``(n, s)`` from one hash(key) grouped sum of map-side partials;
    ``p_hat``/``lo``/``hi`` are pinned IEEE expression chains (z =
    1.96, sqrt is IEEE-correctly-rounded) replayed term by term."""
    from ...stages.abtest import wilson_interval

    ds = _read_parquet_clean(f"{sf_dir}/events.parquet",
                             columns=["event_type", "value"]) \
        .repartition(8)

    def _flag(b: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(b["value"], 100.0),
                                 ndigits=0), pa.int64())
        return pa.table({
            "event_type": b["event_type"],
            "hi_val": pc.cast(pc.greater(cents,
                                         pa.scalar(10000, pa.int64())),
                              pa.int64())})

    return wilson_interval(ds.map_batches(_flag, batch_format="pyarrow"),
                           key_col="event_type", flag_col="hi_val",
                           fanin=4)


WILSON_SQL = """
WITH c AS (
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN CAST(round(value * 100) AS BIGINT) > 10000
                    THEN 1 ELSE 0 END) AS BIGINT) AS s
    FROM events GROUP BY 1
),
k AS (
    SELECT event_type, n, s,
           CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS p,
           -- literals MUST be DOUBLE: DuckDB folds 1.96*1.96 in exact
           -- DECIMAL (3.8416), one ulp off the engine's float64 z*z
           CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE) AS z2,
           CAST(n AS DOUBLE) AS nf
    FROM c
),
m AS (
    SELECT *,
           1.0 + z2 / nf AS denom,
           (p + z2 / (2.0 * nf)) / (1.0 + z2 / nf) AS center,
           CAST(1.96 AS DOUBLE)
               * sqrt(p * (1.0 - p) / nf + z2 / (4.0 * nf * nf))
               / (1.0 + z2 / nf) AS half
    FROM k
)
SELECT event_type, n, s, p AS p_hat,
       center - half AS lo, center + half AS hi
FROM m
"""


def q_hrw_rebalance_docs(sf_dir: str):
    """Rendezvous-hash (HRW) placement + rebalance audit over the
    per-doc url space (``stages/ring.py:hrw_rebalance``; Thaler &
    Ravishankar 1998 — the argmax-weight counterpart of the Karger
    ring in ``ring_rebalance_docs``): owner = argmax over 8 nodes of
    md5-u64(node|url); adding node n8 moves exactly the keys whose
    9-node argmax is the new node. Each batch-unique key hashes once
    per node map-side; the only shuffle is the bounded per-owner
    grouped sum. Hash ties (2^-64) break toward the smaller node index
    on both sides."""
    from ...stages.ring import hrw_rebalance

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "source"]).repartition(8)

    def _urls(b: pa.Table) -> pa.Table:
        # the corpus url per doc (unique by construction — the HRW
        # audit counts DISTINCT keys, and per-block uniqueness must be
        # global uniqueness)
        url = pc.binary_join_element_wise(
            pc.binary_join_element_wise(
                "https://", b["source"], ".example.com/doc/", ""),
            pc.cast(b["doc_id"], pa.string()), "")
        return pa.table({"url": url})

    return hrw_rebalance(ds.map_batches(_urls, batch_format="pyarrow"),
                         key_col="url", n_nodes=8, fanin=4)


_MD5U64 = """list_reduce(list_prepend(0::HUGEINT,
    list_transform(range(1, 17),
        i -> CAST(strpos('0123456789abcdef',
                         substring(md5({expr}), i, 1)) - 1
                  AS HUGEINT))), (h, d) -> h * 16 + d)"""

HRW_SQL = f"""
WITH urls AS (
    SELECT 'https://' || source || '.example.com/doc/'
           || CAST(doc_id AS VARCHAR) AS url
    FROM documents
),
h AS (
    SELECT url, t.i,
           {_MD5U64.format(expr="'n' || CAST(t.i AS VARCHAR) || '|' || url")} AS hv
    FROM urls, LATERAL unnest(generate_series(0, 8)) AS t(i)
),
o8 AS (
    SELECT url, max(struct_pack(h := hv, ni := -i)) AS s8
    FROM h WHERE i < 8 GROUP BY url
),
o9 AS (
    SELECT url, max(struct_pack(h := hv, ni := -i)) AS s9
    FROM h GROUP BY url
)
SELECT 'n' || CAST(-(o8.s8.ni) AS VARCHAR) AS owner,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(CASE WHEN -(o9.s9.ni) = 8 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_moved
FROM o8 JOIN o9 USING (url) GROUP BY 1
"""


def q_spc_rules_15m(sf_dir: str):
    """Western-Electric control-chart rules per event_type over the
    15m tier with ROBUST integer limits (``stages/rate.py:spc_rules``:
    median / Qn instead of mean / sigma, so every comparison is exact
    int64): rule 1 beyond 3*Qn, rule 2 the 2-of-3 analog (one-sided
    lookback), rule 3 the 4-of-5 analog, rule 4 nine consecutive
    points one side of the median. One row per (point, fired rule);
    the SQL replay is the Qn/median CTEs + an 8-deep lag window."""
    from ...stages.rate import spc_rules

    return spc_rules(_rolled_k(sf_dir, W15M), num_partitions=4)


SPC_SQL = f"""
WITH r AS (
    SELECT event_type AS series_id,
           (epoch_us(ts) // {W15M}) * {W15M} AS bucket,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
    FROM events GROUP BY 1, 2
),
med AS (
    SELECT series_id, y AS med FROM (
        SELECT series_id, y,
               row_number() OVER (PARTITION BY series_id ORDER BY y) AS rn,
               count(*) OVER (PARTITION BY series_id) AS n
        FROM r
    ) WHERE rn = (n - 1) // 2 + 1
),
x AS (
    SELECT series_id, y,
           row_number() OVER (PARTITION BY series_id ORDER BY bucket) AS i
    FROM r
),
qn AS (
    SELECT series_id, CAST(diff AS BIGINT) AS qn FROM (
        SELECT a.series_id, abs(a.y - b.y) AS diff,
               row_number() OVER (PARTITION BY a.series_id
                                  ORDER BY abs(a.y - b.y)) AS rn,
               count(*) OVER (PARTITION BY a.series_id) AS m
        FROM x a JOIN x b ON a.series_id = b.series_id AND a.i < b.i
    ) WHERE rn = (m - 1) // 2 + 1
),
base AS (
    SELECT r.series_id, r.bucket, r.y, qn.qn,
           sign(r.y - med.med) AS sgn, abs(r.y - med.med) AS ad
    FROM r JOIN med USING (series_id) JOIN qn USING (series_id)
),
w AS (
    SELECT *,
           lag(ad, 1) OVER win AS ad1, lag(ad, 2) OVER win AS ad2,
           lag(ad, 3) OVER win AS ad3, lag(ad, 4) OVER win AS ad4,
           lag(sgn, 1) OVER win AS s1, lag(sgn, 2) OVER win AS s2,
           lag(sgn, 3) OVER win AS s3, lag(sgn, 4) OVER win AS s4,
           lag(sgn, 5) OVER win AS s5, lag(sgn, 6) OVER win AS s6,
           lag(sgn, 7) OVER win AS s7, lag(sgn, 8) OVER win AS s8
    FROM base WINDOW win AS (PARTITION BY series_id ORDER BY bucket)
)
SELECT series_id, bucket, y, CAST(1 AS BIGINT) AS rule
FROM w WHERE ad > 3 * qn
UNION ALL
SELECT series_id, bucket, y, 2 FROM w
WHERE ad > 2 * qn AND ((ad1 > 2 * qn AND s1 = sgn)
                       OR (ad2 > 2 * qn AND s2 = sgn))
UNION ALL
SELECT series_id, bucket, y, 3 FROM w
WHERE ad > qn
  AND (CASE WHEN ad1 > qn AND s1 = sgn THEN 1 ELSE 0 END
       + CASE WHEN ad2 > qn AND s2 = sgn THEN 1 ELSE 0 END
       + CASE WHEN ad3 > qn AND s3 = sgn THEN 1 ELSE 0 END
       + CASE WHEN ad4 > qn AND s4 = sgn THEN 1 ELSE 0 END) >= 3
UNION ALL
SELECT series_id, bucket, y, 4 FROM w
WHERE sgn <> 0 AND s1 = sgn AND s2 = sgn AND s3 = sgn AND s4 = sgn
  AND s5 = sgn AND s6 = sgn AND s7 = sgn AND s8 = sgn
"""


def _doc_graph_edges(sf_dir: str, *, weighted: bool):
    import pyarrow.parquet as _pq

    n = _pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id"]).repartition(4)

    def _edges(b: pa.Table) -> pa.Table:
        import numpy as _np

        d = b["doc_id"].to_numpy(zero_copy_only=False).astype(_np.int64)
        srcs, dsts = [], []
        for j in range(1, 7):
            m = j <= 1 + d % 6
            s = d[m]
            t = (s * 31 + 97 * j) % n
            keep = s != t
            srcs.append(_np.minimum(s[keep], t[keep]))
            dsts.append(_np.maximum(s[keep], t[keep]))
        u = _np.concatenate(srcs)
        v = _np.concatenate(dsts)
        cols = {"src": pa.array(_np.concatenate([u, v])),
                "dst": pa.array(_np.concatenate([v, u]))}
        if weighted:
            ww = 1 + (u + v) % 7
            cols["w"] = pa.array(_np.concatenate([ww, ww]))
        return pa.table(cols)

    return ds, ds.map_batches(_edges, batch_format="pyarrow")


def q_single_linkage_docs(sf_dir: str):
    """Single-linkage clustering of the weighted link graph at
    distance threshold 2 (``stages/graph.py:single_linkage``): cut
    every Boruvka-forest edge with w > 2 — the classic identity that
    level-T single-linkage components equal the components of the
    T-thresholded graph, which is exactly what the oracle computes
    (recursive-closure components, no MST required on the SQL side:
    the theorem IS the check). Output ``(cluster, n_nodes)`` with
    cluster = min member id, singletons included."""
    from ...stages.graph import single_linkage

    nodes, edges = _doc_graph_edges(sf_dir, weighted=True)
    return single_linkage(edges, nodes, threshold=2, node_col="doc_id",
                          rounds=8, num_partitions=4)


SINGLE_LINKAGE_SQL = """
WITH RECURSIVE nn AS (SELECT count(*) AS n FROM documents),
base AS MATERIALIZED (
    SELECT d.doc_id AS s, u.j,
           ((d.doc_id * 31 + 97 * u.j) % (SELECT n FROM nn)) AS t
    FROM documents d, LATERAL unnest(generate_series(1, 6)) AS u(j)
    WHERE u.j <= 1 + d.doc_id % 6
),
canon AS MATERIALIZED (
    SELECT least(s, t) AS u, greatest(s, t) AS v FROM base WHERE s <> t
),
ed AS MATERIALIZED (
    SELECT u AS node, v AS dst FROM canon WHERE 1 + (u + v) % 7 <= 2
    UNION ALL
    SELECT v AS node, u AS dst FROM canon WHERE 1 + (u + v) % 7 <= 2
),
reach AS (
    SELECT doc_id AS node, doc_id AS r FROM documents
    UNION
    SELECT reach.node, ed.dst FROM reach JOIN ed ON ed.node = reach.r
),
lab AS (
    SELECT node, min(r) AS cluster FROM reach GROUP BY node
)
SELECT cluster, CAST(count(*) AS BIGINT) AS n_nodes
FROM lab GROUP BY cluster
"""


def q_wl_refinement_docs(sf_dir: str):
    """One-round Weisfeiler-Lehman color refinement histogram over the
    link graph (``stages/graph.py:wl_refinement``): refined color =
    md5-u64 of ``deg:[sorted neighbor degrees]``, counted per color —
    the WL-kernel / GNN-expressiveness fingerprint. Node-bounded
    degree table broadcast once; (node, neighbor-degree) rows stream
    through ONE hash(node) shuffle. The md5-u64-minus-2^63 int64
    storage is the KMV convention, replayed exactly in SQL."""
    from ...stages.graph import wl_refinement

    nodes, edges = _doc_graph_edges(sf_dir, weighted=False)
    return wl_refinement(edges, nodes, node_col="doc_id", fanin=4)


_MD5U64_WL = """list_reduce(list_prepend(0::HUGEINT,
    list_transform(range(1, 17),
        i -> CAST(strpos('0123456789abcdef',
                         substring(md5({expr}), i, 1)) - 1
                  AS HUGEINT))), (h, d) -> h * 16 + d)"""

WL_SQL = f"""
WITH nn AS (SELECT count(*) AS n FROM documents),
base AS (
    SELECT d.doc_id AS s, u.j,
           ((d.doc_id * 31 + 97 * u.j) % (SELECT n FROM nn)) AS t
    FROM documents d, LATERAL unnest(generate_series(1, 6)) AS u(j)
    WHERE u.j <= 1 + d.doc_id % 6
),
canon AS (
    SELECT least(s, t) AS u, greatest(s, t) AS v FROM base WHERE s <> t
),
ed AS (
    SELECT u AS node, v AS dst FROM canon
    UNION ALL
    SELECT v AS node, u AS dst FROM canon
),
deg AS (SELECT node, CAST(count(*) AS BIGINT) AS d FROM ed GROUP BY node),
strs AS (
    SELECT n.doc_id AS node,
           coalesce(dg.d, 0) AS d0,
           coalesce((SELECT string_agg(CAST(dg2.d AS VARCHAR),
                                       ',' ORDER BY dg2.d)
                     FROM ed e JOIN deg dg2 ON dg2.node = e.dst
                     WHERE e.node = n.doc_id), '') AS lst
    FROM documents n LEFT JOIN deg dg ON dg.node = n.doc_id
),
colors AS (
    SELECT CAST({_MD5U64_WL.format(
        expr="CAST(d0 AS VARCHAR) || ':[' || lst || ']'")}
        - 9223372036854775808::HUGEINT AS BIGINT) AS wl_color
    FROM strs
)
SELECT wl_color, CAST(count(*) AS BIGINT) AS n_nodes
FROM colors GROUP BY wl_color
"""


def q_rake_words_docs(sf_dir: str):
    """RAKE keyword statistics over the corpus
    (``stages/textstats.py:rake_word_scores``; Rose et al. 2010):
    phrases are maximal non-stopword runs (stopwords: the/a/an/and/of;
    empty tokens and document boundaries break runs), each word's
    ``freq`` counts phrase occurrences, ``deg`` sums the containing
    phrase lengths, ``score = deg/freq`` the pinned quotient. The SQL
    replay is the classic gaps-and-islands row_number difference."""
    from ...stages.textstats import rake_word_scores

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"]).repartition(8)
    return rake_word_scores(ds, num_partitions=8)


RAKE_SQL = """
WITH w AS (
    SELECT doc_id, token, i,
           (token IN ('the', 'a', 'an', 'and', 'of')
            OR token = '') AS is_stop
    FROM (
        SELECT doc_id, l[i] AS token, i
        FROM (SELECT doc_id, string_split(text, ' ') AS l
              FROM documents),
             LATERAL unnest(generate_series(1, len(l))) AS t(i)
    )
),
k AS (
    SELECT doc_id, token, i,
           i - row_number() OVER (PARTITION BY doc_id
                                  ORDER BY i) AS grp
    FROM w WHERE NOT is_stop
),
p AS (
    SELECT doc_id, token, grp,
           count(*) OVER (PARTITION BY doc_id, grp) AS plen
    FROM k
),
agg AS (
    SELECT token AS word, CAST(count(*) AS BIGINT) AS freq,
           CAST(sum(plen) AS BIGINT) AS deg
    FROM p GROUP BY token
)
SELECT word, freq, deg,
       CAST(deg AS DOUBLE) / CAST(freq AS DOUBLE) AS score
FROM agg
"""


def q_katz_docs(sf_dir: str):
    """Katz centrality over the link graph by 4 integer fixed-point
    rounds (``stages/graph.py:katz_rounds``; Katz 1953): attenuation
    1/8 as an arithmetic shift on non-negative scores (== floor
    division, replayed as `// 8`), +1000 base unit — exact int64 end
    to end, the EWMA fixed-point convention applied to a graph
    recursion. Edges stream; the node-bounded score vector is
    driver-held (kcore contract)."""
    from ...stages.graph import katz_rounds

    nodes, edges = _doc_graph_edges(sf_dir, weighted=False)
    return katz_rounds(edges, nodes, node_col="doc_id", rounds=4,
                       num_partitions=4)


KATZ_SQL = """
WITH nn AS (SELECT count(*) AS n FROM documents),
base AS MATERIALIZED (
    SELECT d.doc_id AS s, u.j,
           ((d.doc_id * 31 + 97 * u.j) % (SELECT n FROM nn)) AS t
    FROM documents d, LATERAL unnest(generate_series(1, 6)) AS u(j)
    WHERE u.j <= 1 + d.doc_id % 6
),
canon AS MATERIALIZED (
    SELECT least(s, t) AS u, greatest(s, t) AS v FROM base WHERE s <> t
),
ed AS MATERIALIZED (
    SELECT u AS node, v AS dst FROM canon
    UNION ALL
    SELECT v AS node, u AS dst FROM canon
),
k0 AS MATERIALIZED (
    SELECT doc_id AS node, CAST(1000 AS BIGINT) AS x FROM documents
),
k1 AS MATERIALIZED (
    SELECT n.doc_id AS node,
           1000 + coalesce(s.sm, 0) // 8 AS x
    FROM documents n LEFT JOIN (
        SELECT e.dst AS node, CAST(sum(k0.x) AS BIGINT) AS sm
        FROM ed e JOIN k0 ON k0.node = e.node
        GROUP BY e.dst
    ) s ON s.node = n.doc_id
),
k2 AS MATERIALIZED (
    SELECT n.doc_id AS node,
           1000 + coalesce(s.sm, 0) // 8 AS x
    FROM documents n LEFT JOIN (
        SELECT e.dst AS node, CAST(sum(k1.x) AS BIGINT) AS sm
        FROM ed e JOIN k1 ON k1.node = e.node
        GROUP BY e.dst
    ) s ON s.node = n.doc_id
),
k3 AS MATERIALIZED (
    SELECT n.doc_id AS node,
           1000 + coalesce(s.sm, 0) // 8 AS x
    FROM documents n LEFT JOIN (
        SELECT e.dst AS node, CAST(sum(k2.x) AS BIGINT) AS sm
        FROM ed e JOIN k2 ON k2.node = e.node
        GROUP BY e.dst
    ) s ON s.node = n.doc_id
),
k4 AS MATERIALIZED (
    SELECT n.doc_id AS node,
           1000 + coalesce(s.sm, 0) // 8 AS x
    FROM documents n LEFT JOIN (
        SELECT e.dst AS node, CAST(sum(k3.x) AS BIGINT) AS sm
        FROM ed e JOIN k3 ON k3.node = e.node
        GROUP BY e.dst
    ) s ON s.node = n.doc_id
)
SELECT node, CAST(x AS BIGINT) AS katz FROM k4
"""


def q_term_adaptation_docs(sf_dir: str):
    """Church-Gale burstiness / adaptation per corpus token
    (``stages/textstats.py:term_adaptation``; Church & Gale 1995):
    exact cf/df from one hash(token) grouped sum of per-doc partials;
    ``burstiness = cf/df`` and ``adaptation = (cf-df)/cf`` are pinned
    quotients. min_df = 2 trims hapaxes."""
    from ...stages.textstats import term_adaptation

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"]).repartition(8)
    return term_adaptation(ds, min_df=2, num_partitions=8)


ADAPTATION_SQL = """
WITH w AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS token
    FROM documents
),
f AS (SELECT doc_id, token FROM w WHERE token <> ''),
agg AS (
    SELECT token, CAST(count(*) AS BIGINT) AS cf,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS df
    FROM f GROUP BY token
)
SELECT token, cf, df,
       CAST(cf AS DOUBLE) / CAST(df AS DOUBLE) AS burstiness,
       CAST(cf - df AS DOUBLE) / CAST(cf AS DOUBLE) AS adaptation
FROM agg WHERE df >= 2
"""


def q_log_odds_sources_docs(sf_dir: str):
    """Monroe-Colaresi-Quinn log-odds keyword contrast between the
    even and odd source halves of the corpus
    (``stages/textstats.py:log_odds_contrast``; "Fightin' Words",
    2008): symmetric Dirichlet prior alpha=1, exact integer counts,
    per-row pinned libm ln/sqrt chains for delta and z. The calibrated
    sibling of the chi-square ``term_drift_docs``."""
    from ...stages.textstats import log_odds_contrast

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text", "source"]) \
        .repartition(8)
    return log_odds_contrast(ds, min_cf=3, num_partitions=8)


LOGODDS_SQL = """
WITH w AS (
    SELECT CAST(regexp_extract(source, '(\\d+)$', 1) AS BIGINT) % 2
               AS side,
           unnest(string_split(text, ' ')) AS token
    FROM documents
),
f AS (SELECT side, token FROM w WHERE token <> ''),
agg AS (
    SELECT token,
           CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS c1,
           CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS c2
    FROM f GROUP BY token
),
tot AS (
    SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2,
           CAST(count(*) AS BIGINT) AS v
    FROM agg
),
d AS (
    SELECT a.token, a.c1, a.c2,
           ln((CAST(a.c1 AS DOUBLE) + 1.0)
              / (CAST(t.n1 AS DOUBLE) + CAST(t.v AS DOUBLE)
                 - CAST(a.c1 AS DOUBLE) - 1.0))
           - ln((CAST(a.c2 AS DOUBLE) + 1.0)
                / (CAST(t.n2 AS DOUBLE) + CAST(t.v AS DOUBLE)
                   - CAST(a.c2 AS DOUBLE) - 1.0)) AS delta,
           1.0 / (CAST(a.c1 AS DOUBLE) + 1.0)
           + 1.0 / (CAST(a.c2 AS DOUBLE) + 1.0) AS var
    FROM agg a CROSS JOIN tot t
    WHERE a.c1 + a.c2 >= 3
)
SELECT token, c1, c2, delta, delta / sqrt(var) AS z
FROM d
"""


def q_double_sweep_docs(sf_dir: str):
    """Double-sweep BFS diameter lower bound over the link graph
    (``stages/graph.py:double_sweep``; Magnien-Latapy-Habib 2009):
    BFS from the minimum doc id, re-BFS from the farthest node (ties
    -> smallest id), both bounded to 6 hops (the bfs_hops contract).
    One exact-int row ``(src_node, src_ecc, far_node, far_ecc)`` —
    ``far_ecc`` is the diameter lower bound."""
    from ...stages.graph import double_sweep

    nodes, edges = _doc_graph_edges(sf_dir, weighted=False)
    return double_sweep(edges, nodes, node_col="doc_id", rounds=6,
                        num_partitions=4)


DOUBLE_SWEEP_SQL = """
WITH nn AS (SELECT count(*) AS n FROM documents),
base AS MATERIALIZED (
    SELECT d.doc_id AS s, u.j,
           ((d.doc_id * 31 + 97 * u.j) % (SELECT n FROM nn)) AS t
    FROM documents d, LATERAL unnest(generate_series(1, 6)) AS u(j)
    WHERE u.j <= 1 + d.doc_id % 6
),
canon AS MATERIALIZED (
    SELECT least(s, t) AS u, greatest(s, t) AS v FROM base WHERE s <> t
),
ed AS MATERIALIZED (
    SELECT u AS node, v AS dst FROM canon
    UNION ALL
    SELECT v AS node, u AS dst FROM canon
),
da0 AS MATERIALIZED (
    SELECT min(doc_id) AS node, CAST(0 AS BIGINT) AS h FROM documents
),
da1 AS MATERIALIZED (
    SELECT node, min(h) AS h FROM (
        SELECT node, h FROM da0
        UNION ALL
        SELECT e.dst AS node, d.h + 1 AS h
        FROM da0 d JOIN ed e ON e.node = d.node
    ) GROUP BY node
),
da2 AS MATERIALIZED (
    SELECT node, min(h) AS h FROM (
        SELECT node, h FROM da1
        UNION ALL
        SELECT e.dst AS node, d.h + 1 AS h
        FROM da1 d JOIN ed e ON e.node = d.node
    ) GROUP BY node
),
da3 AS MATERIALIZED (
    SELECT node, min(h) AS h FROM (
        SELECT node, h FROM da2
        UNION ALL
        SELECT e.dst AS node, d.h + 1 AS h
        FROM da2 d JOIN ed e ON e.node = d.node
    ) GROUP BY node
),
da4 AS MATERIALIZED (
    SELECT node, min(h) AS h FROM (
        SELECT node, h FROM da3
        UNION ALL
        SELECT e.dst AS node, d.h + 1 AS h
        FROM da3 d JOIN ed e ON e.node = d.node
    ) GROUP BY node
),
da5 AS MATERIALIZED (
    SELECT node, min(h) AS h FROM (
        SELECT node, h FROM da4
        UNION ALL
        SELECT e.dst AS node, d.h + 1 AS h
        FROM da4 d JOIN ed e ON e.node = d.node
    ) GROUP BY node
),
da6 AS MATERIALIZED (
    SELECT node, min(h) AS h FROM (
        SELECT node, h FROM da5
        UNION ALL
        SELECT e.dst AS node, d.h + 1 AS h
        FROM da5 d JOIN ed e ON e.node = d.node
    ) GROUP BY node
),
ecc_a AS (SELECT max(h) AS ecc0 FROM da6),
farn AS (
    SELECT min(node) AS far FROM da6
    WHERE h = (SELECT ecc0 FROM ecc_a)
),
db0 AS MATERIALIZED (
    SELECT (SELECT far FROM farn) AS node, CAST(0 AS BIGINT) AS h
),
db1 AS MATERIALIZED (
    SELECT node, min(h) AS h FROM (
        SELECT node, h FROM db0
        UNION ALL
        SELECT e.dst AS node, d.h + 1 AS h
        FROM db0 d JOIN ed e ON e.node = d.node
    ) GROUP BY node
),
db2 AS MATERIALIZED (
    SELECT node, min(h) AS h FROM (
        SELECT node, h FROM db1
        UNION ALL
        SELECT e.dst AS node, d.h + 1 AS h
        FROM db1 d JOIN ed e ON e.node = d.node
    ) GROUP BY node
),
db3 AS MATERIALIZED (
    SELECT node, min(h) AS h FROM (
        SELECT node, h FROM db2
        UNION ALL
        SELECT e.dst AS node, d.h + 1 AS h
        FROM db2 d JOIN ed e ON e.node = d.node
    ) GROUP BY node
),
db4 AS MATERIALIZED (
    SELECT node, min(h) AS h FROM (
        SELECT node, h FROM db3
        UNION ALL
        SELECT e.dst AS node, d.h + 1 AS h
        FROM db3 d JOIN ed e ON e.node = d.node
    ) GROUP BY node
),
db5 AS MATERIALIZED (
    SELECT node, min(h) AS h FROM (
        SELECT node, h FROM db4
        UNION ALL
        SELECT e.dst AS node, d.h + 1 AS h
        FROM db4 d JOIN ed e ON e.node = d.node
    ) GROUP BY node
),
db6 AS MATERIALIZED (
    SELECT node, min(h) AS h FROM (
        SELECT node, h FROM db5
        UNION ALL
        SELECT e.dst AS node, d.h + 1 AS h
        FROM db5 d JOIN ed e ON e.node = d.node
    ) GROUP BY node
)
SELECT (SELECT min(doc_id) FROM documents) AS src_node,
       (SELECT ecc0 FROM ecc_a) AS src_ecc,
       (SELECT far FROM farn) AS far_node,
       (SELECT max(h) FROM db6) AS far_ecc
"""


def q_set_cover_sources(sf_dir: str):
    """Greedy set cover of the corpus BIGRAM vocabulary by sources
    (``stages/curation.py:greedy_set_cover``, unit="bigram" — the
    single-token universe converges in one pick on this corpus):
    which sources do you need for full bigram coverage — the ln(n)-approximation selection
    every corpus-mixture curation step runs. Deterministic ties
    (max new coverage, then smallest source); exact ints; the oracle
    replays the greedy walk as UNROLLED chained list-state CTEs over
    the bounded (source, token-list) table (22 steps > the 20-source
    domain; trailing no-op steps emit nothing — DuckDB rejects
    correlated references into recursive rows, so the Boruvka-style
    unroll replaces a recursive CTE here)."""
    from ...stages.curation import greedy_set_cover

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["text", "source"]).repartition(8)
    return greedy_set_cover(ds, unit="bigram", num_partitions=8)


SET_COVER_SQL = """
WITH toks0 AS (
    SELECT source AS grp, string_split(text, ' ') AS l FROM documents
),
w AS (
    SELECT grp, l[i] || ' ' || l[i + 1] AS token
    FROM toks0, LATERAL unnest(generate_series(1, len(l) - 1)) AS t(i)
    WHERE l[i] <> '' AND l[i + 1] <> ''
),
st AS MATERIALIZED (
    SELECT grp, list_sort(list(DISTINCT token)) AS toks
    FROM w GROUP BY grp
),
cov0 AS MATERIALIZED (SELECT CAST([] AS VARCHAR[]) AS covered),
c1 AS MATERIALIZED (
    SELECT s.grp,
           CAST(len(list_filter(s.toks,
                t -> NOT list_contains(cv.covered, t))) AS BIGINT)
               AS newly,
           list_filter(s.toks,
                t -> NOT list_contains(cv.covered, t)) AS newt
    FROM st s CROSS JOIN cov0 cv
),
pick1 AS MATERIALIZED (
    SELECT CAST(1 AS BIGINT) AS pick, grp, newly, newt
    FROM c1 ORDER BY newly DESC, grp LIMIT 1
),
cov1 AS MATERIALIZED (
    SELECT list_sort(list_distinct(
        cv.covered || CASE WHEN p.newly > 0 THEN p.newt
                      ELSE [] END)) AS covered
    FROM cov0 cv CROSS JOIN pick1 p
),
c2 AS MATERIALIZED (
    SELECT s.grp,
           CAST(len(list_filter(s.toks,
                t -> NOT list_contains(cv.covered, t))) AS BIGINT)
               AS newly,
           list_filter(s.toks,
                t -> NOT list_contains(cv.covered, t)) AS newt
    FROM st s CROSS JOIN cov1 cv
),
pick2 AS MATERIALIZED (
    SELECT CAST(2 AS BIGINT) AS pick, grp, newly, newt
    FROM c2 ORDER BY newly DESC, grp LIMIT 1
),
cov2 AS MATERIALIZED (
    SELECT list_sort(list_distinct(
        cv.covered || CASE WHEN p.newly > 0 THEN p.newt
                      ELSE [] END)) AS covered
    FROM cov1 cv CROSS JOIN pick2 p
),
c3 AS MATERIALIZED (
    SELECT s.grp,
           CAST(len(list_filter(s.toks,
                t -> NOT list_contains(cv.covered, t))) AS BIGINT)
               AS newly,
           list_filter(s.toks,
                t -> NOT list_contains(cv.covered, t)) AS newt
    FROM st s CROSS JOIN cov2 cv
),
pick3 AS MATERIALIZED (
    SELECT CAST(3 AS BIGINT) AS pick, grp, newly, newt
    FROM c3 ORDER BY newly DESC, grp LIMIT 1
),
cov3 AS MATERIALIZED (
    SELECT list_sort(list_distinct(
        cv.covered || CASE WHEN p.newly > 0 THEN p.newt
                      ELSE [] END)) AS covered
    FROM cov2 cv CROSS JOIN pick3 p
),
c4 AS MATERIALIZED (
    SELECT s.grp,
           CAST(len(list_filter(s.toks,
                t -> NOT list_contains(cv.covered, t))) AS BIGINT)
               AS newly,
           list_filter(s.toks,
                t -> NOT list_contains(cv.covered, t)) AS newt
    FROM st s CROSS JOIN cov3 cv
),
pick4 AS MATERIALIZED (
    SELECT CAST(4 AS BIGINT) AS pick, grp, newly, newt
    FROM c4 ORDER BY newly DESC, grp LIMIT 1
),
cov4 AS MATERIALIZED (
    SELECT list_sort(list_distinct(
        cv.covered || CASE WHEN p.newly > 0 THEN p.newt
                      ELSE [] END)) AS covered
    FROM cov3 cv CROSS JOIN pick4 p
),
c5 AS MATERIALIZED (
    SELECT s.grp,
           CAST(len(list_filter(s.toks,
                t -> NOT list_contains(cv.covered, t))) AS BIGINT)
               AS newly,
           list_filter(s.toks,
                t -> NOT list_contains(cv.covered, t)) AS newt
    FROM st s CROSS JOIN cov4 cv
),
pick5 AS MATERIALIZED (
    SELECT CAST(5 AS BIGINT) AS pick, grp, newly, newt
    FROM c5 ORDER BY newly DESC, grp LIMIT 1
),
cov5 AS MATERIALIZED (
    SELECT list_sort(list_distinct(
        cv.covered || CASE WHEN p.newly > 0 THEN p.newt
                      ELSE [] END)) AS covered
    FROM cov4 cv CROSS JOIN pick5 p
),
c6 AS MATERIALIZED (
    SELECT s.grp,
           CAST(len(list_filter(s.toks,
                t -> NOT list_contains(cv.covered, t))) AS BIGINT)
               AS newly,
           list_filter(s.toks,
                t -> NOT list_contains(cv.covered, t)) AS newt
    FROM st s CROSS JOIN cov5 cv
),
pick6 AS MATERIALIZED (
    SELECT CAST(6 AS BIGINT) AS pick, grp, newly, newt
    FROM c6 ORDER BY newly DESC, grp LIMIT 1
),
cov6 AS MATERIALIZED (
    SELECT list_sort(list_distinct(
        cv.covered || CASE WHEN p.newly > 0 THEN p.newt
                      ELSE [] END)) AS covered
    FROM cov5 cv CROSS JOIN pick6 p
),
c7 AS MATERIALIZED (
    SELECT s.grp,
           CAST(len(list_filter(s.toks,
                t -> NOT list_contains(cv.covered, t))) AS BIGINT)
               AS newly,
           list_filter(s.toks,
                t -> NOT list_contains(cv.covered, t)) AS newt
    FROM st s CROSS JOIN cov6 cv
),
pick7 AS MATERIALIZED (
    SELECT CAST(7 AS BIGINT) AS pick, grp, newly, newt
    FROM c7 ORDER BY newly DESC, grp LIMIT 1
),
cov7 AS MATERIALIZED (
    SELECT list_sort(list_distinct(
        cv.covered || CASE WHEN p.newly > 0 THEN p.newt
                      ELSE [] END)) AS covered
    FROM cov6 cv CROSS JOIN pick7 p
),
c8 AS MATERIALIZED (
    SELECT s.grp,
           CAST(len(list_filter(s.toks,
                t -> NOT list_contains(cv.covered, t))) AS BIGINT)
               AS newly,
           list_filter(s.toks,
                t -> NOT list_contains(cv.covered, t)) AS newt
    FROM st s CROSS JOIN cov7 cv
),
pick8 AS MATERIALIZED (
    SELECT CAST(8 AS BIGINT) AS pick, grp, newly, newt
    FROM c8 ORDER BY newly DESC, grp LIMIT 1
),
cov8 AS MATERIALIZED (
    SELECT list_sort(list_distinct(
        cv.covered || CASE WHEN p.newly > 0 THEN p.newt
                      ELSE [] END)) AS covered
    FROM cov7 cv CROSS JOIN pick8 p
),
c9 AS MATERIALIZED (
    SELECT s.grp,
           CAST(len(list_filter(s.toks,
                t -> NOT list_contains(cv.covered, t))) AS BIGINT)
               AS newly,
           list_filter(s.toks,
                t -> NOT list_contains(cv.covered, t)) AS newt
    FROM st s CROSS JOIN cov8 cv
),
pick9 AS MATERIALIZED (
    SELECT CAST(9 AS BIGINT) AS pick, grp, newly, newt
    FROM c9 ORDER BY newly DESC, grp LIMIT 1
),
cov9 AS MATERIALIZED (
    SELECT list_sort(list_distinct(
        cv.covered || CASE WHEN p.newly > 0 THEN p.newt
                      ELSE [] END)) AS covered
    FROM cov8 cv CROSS JOIN pick9 p
),
c10 AS MATERIALIZED (
    SELECT s.grp,
           CAST(len(list_filter(s.toks,
                t -> NOT list_contains(cv.covered, t))) AS BIGINT)
               AS newly,
           list_filter(s.toks,
                t -> NOT list_contains(cv.covered, t)) AS newt
    FROM st s CROSS JOIN cov9 cv
),
pick10 AS MATERIALIZED (
    SELECT CAST(10 AS BIGINT) AS pick, grp, newly, newt
    FROM c10 ORDER BY newly DESC, grp LIMIT 1
),
cov10 AS MATERIALIZED (
    SELECT list_sort(list_distinct(
        cv.covered || CASE WHEN p.newly > 0 THEN p.newt
                      ELSE [] END)) AS covered
    FROM cov9 cv CROSS JOIN pick10 p
),
c11 AS MATERIALIZED (
    SELECT s.grp,
           CAST(len(list_filter(s.toks,
                t -> NOT list_contains(cv.covered, t))) AS BIGINT)
               AS newly,
           list_filter(s.toks,
                t -> NOT list_contains(cv.covered, t)) AS newt
    FROM st s CROSS JOIN cov10 cv
),
pick11 AS MATERIALIZED (
    SELECT CAST(11 AS BIGINT) AS pick, grp, newly, newt
    FROM c11 ORDER BY newly DESC, grp LIMIT 1
),
cov11 AS MATERIALIZED (
    SELECT list_sort(list_distinct(
        cv.covered || CASE WHEN p.newly > 0 THEN p.newt
                      ELSE [] END)) AS covered
    FROM cov10 cv CROSS JOIN pick11 p
),
c12 AS MATERIALIZED (
    SELECT s.grp,
           CAST(len(list_filter(s.toks,
                t -> NOT list_contains(cv.covered, t))) AS BIGINT)
               AS newly,
           list_filter(s.toks,
                t -> NOT list_contains(cv.covered, t)) AS newt
    FROM st s CROSS JOIN cov11 cv
),
pick12 AS MATERIALIZED (
    SELECT CAST(12 AS BIGINT) AS pick, grp, newly, newt
    FROM c12 ORDER BY newly DESC, grp LIMIT 1
),
cov12 AS MATERIALIZED (
    SELECT list_sort(list_distinct(
        cv.covered || CASE WHEN p.newly > 0 THEN p.newt
                      ELSE [] END)) AS covered
    FROM cov11 cv CROSS JOIN pick12 p
),
c13 AS MATERIALIZED (
    SELECT s.grp,
           CAST(len(list_filter(s.toks,
                t -> NOT list_contains(cv.covered, t))) AS BIGINT)
               AS newly,
           list_filter(s.toks,
                t -> NOT list_contains(cv.covered, t)) AS newt
    FROM st s CROSS JOIN cov12 cv
),
pick13 AS MATERIALIZED (
    SELECT CAST(13 AS BIGINT) AS pick, grp, newly, newt
    FROM c13 ORDER BY newly DESC, grp LIMIT 1
),
cov13 AS MATERIALIZED (
    SELECT list_sort(list_distinct(
        cv.covered || CASE WHEN p.newly > 0 THEN p.newt
                      ELSE [] END)) AS covered
    FROM cov12 cv CROSS JOIN pick13 p
),
c14 AS MATERIALIZED (
    SELECT s.grp,
           CAST(len(list_filter(s.toks,
                t -> NOT list_contains(cv.covered, t))) AS BIGINT)
               AS newly,
           list_filter(s.toks,
                t -> NOT list_contains(cv.covered, t)) AS newt
    FROM st s CROSS JOIN cov13 cv
),
pick14 AS MATERIALIZED (
    SELECT CAST(14 AS BIGINT) AS pick, grp, newly, newt
    FROM c14 ORDER BY newly DESC, grp LIMIT 1
),
cov14 AS MATERIALIZED (
    SELECT list_sort(list_distinct(
        cv.covered || CASE WHEN p.newly > 0 THEN p.newt
                      ELSE [] END)) AS covered
    FROM cov13 cv CROSS JOIN pick14 p
),
c15 AS MATERIALIZED (
    SELECT s.grp,
           CAST(len(list_filter(s.toks,
                t -> NOT list_contains(cv.covered, t))) AS BIGINT)
               AS newly,
           list_filter(s.toks,
                t -> NOT list_contains(cv.covered, t)) AS newt
    FROM st s CROSS JOIN cov14 cv
),
pick15 AS MATERIALIZED (
    SELECT CAST(15 AS BIGINT) AS pick, grp, newly, newt
    FROM c15 ORDER BY newly DESC, grp LIMIT 1
),
cov15 AS MATERIALIZED (
    SELECT list_sort(list_distinct(
        cv.covered || CASE WHEN p.newly > 0 THEN p.newt
                      ELSE [] END)) AS covered
    FROM cov14 cv CROSS JOIN pick15 p
),
c16 AS MATERIALIZED (
    SELECT s.grp,
           CAST(len(list_filter(s.toks,
                t -> NOT list_contains(cv.covered, t))) AS BIGINT)
               AS newly,
           list_filter(s.toks,
                t -> NOT list_contains(cv.covered, t)) AS newt
    FROM st s CROSS JOIN cov15 cv
),
pick16 AS MATERIALIZED (
    SELECT CAST(16 AS BIGINT) AS pick, grp, newly, newt
    FROM c16 ORDER BY newly DESC, grp LIMIT 1
),
cov16 AS MATERIALIZED (
    SELECT list_sort(list_distinct(
        cv.covered || CASE WHEN p.newly > 0 THEN p.newt
                      ELSE [] END)) AS covered
    FROM cov15 cv CROSS JOIN pick16 p
),
c17 AS MATERIALIZED (
    SELECT s.grp,
           CAST(len(list_filter(s.toks,
                t -> NOT list_contains(cv.covered, t))) AS BIGINT)
               AS newly,
           list_filter(s.toks,
                t -> NOT list_contains(cv.covered, t)) AS newt
    FROM st s CROSS JOIN cov16 cv
),
pick17 AS MATERIALIZED (
    SELECT CAST(17 AS BIGINT) AS pick, grp, newly, newt
    FROM c17 ORDER BY newly DESC, grp LIMIT 1
),
cov17 AS MATERIALIZED (
    SELECT list_sort(list_distinct(
        cv.covered || CASE WHEN p.newly > 0 THEN p.newt
                      ELSE [] END)) AS covered
    FROM cov16 cv CROSS JOIN pick17 p
),
c18 AS MATERIALIZED (
    SELECT s.grp,
           CAST(len(list_filter(s.toks,
                t -> NOT list_contains(cv.covered, t))) AS BIGINT)
               AS newly,
           list_filter(s.toks,
                t -> NOT list_contains(cv.covered, t)) AS newt
    FROM st s CROSS JOIN cov17 cv
),
pick18 AS MATERIALIZED (
    SELECT CAST(18 AS BIGINT) AS pick, grp, newly, newt
    FROM c18 ORDER BY newly DESC, grp LIMIT 1
),
cov18 AS MATERIALIZED (
    SELECT list_sort(list_distinct(
        cv.covered || CASE WHEN p.newly > 0 THEN p.newt
                      ELSE [] END)) AS covered
    FROM cov17 cv CROSS JOIN pick18 p
),
c19 AS MATERIALIZED (
    SELECT s.grp,
           CAST(len(list_filter(s.toks,
                t -> NOT list_contains(cv.covered, t))) AS BIGINT)
               AS newly,
           list_filter(s.toks,
                t -> NOT list_contains(cv.covered, t)) AS newt
    FROM st s CROSS JOIN cov18 cv
),
pick19 AS MATERIALIZED (
    SELECT CAST(19 AS BIGINT) AS pick, grp, newly, newt
    FROM c19 ORDER BY newly DESC, grp LIMIT 1
),
cov19 AS MATERIALIZED (
    SELECT list_sort(list_distinct(
        cv.covered || CASE WHEN p.newly > 0 THEN p.newt
                      ELSE [] END)) AS covered
    FROM cov18 cv CROSS JOIN pick19 p
),
c20 AS MATERIALIZED (
    SELECT s.grp,
           CAST(len(list_filter(s.toks,
                t -> NOT list_contains(cv.covered, t))) AS BIGINT)
               AS newly,
           list_filter(s.toks,
                t -> NOT list_contains(cv.covered, t)) AS newt
    FROM st s CROSS JOIN cov19 cv
),
pick20 AS MATERIALIZED (
    SELECT CAST(20 AS BIGINT) AS pick, grp, newly, newt
    FROM c20 ORDER BY newly DESC, grp LIMIT 1
),
cov20 AS MATERIALIZED (
    SELECT list_sort(list_distinct(
        cv.covered || CASE WHEN p.newly > 0 THEN p.newt
                      ELSE [] END)) AS covered
    FROM cov19 cv CROSS JOIN pick20 p
),
c21 AS MATERIALIZED (
    SELECT s.grp,
           CAST(len(list_filter(s.toks,
                t -> NOT list_contains(cv.covered, t))) AS BIGINT)
               AS newly,
           list_filter(s.toks,
                t -> NOT list_contains(cv.covered, t)) AS newt
    FROM st s CROSS JOIN cov20 cv
),
pick21 AS MATERIALIZED (
    SELECT CAST(21 AS BIGINT) AS pick, grp, newly, newt
    FROM c21 ORDER BY newly DESC, grp LIMIT 1
),
cov21 AS MATERIALIZED (
    SELECT list_sort(list_distinct(
        cv.covered || CASE WHEN p.newly > 0 THEN p.newt
                      ELSE [] END)) AS covered
    FROM cov20 cv CROSS JOIN pick21 p
),
c22 AS MATERIALIZED (
    SELECT s.grp,
           CAST(len(list_filter(s.toks,
                t -> NOT list_contains(cv.covered, t))) AS BIGINT)
               AS newly,
           list_filter(s.toks,
                t -> NOT list_contains(cv.covered, t)) AS newt
    FROM st s CROSS JOIN cov21 cv
),
pick22 AS MATERIALIZED (
    SELECT CAST(22 AS BIGINT) AS pick, grp, newly, newt
    FROM c22 ORDER BY newly DESC, grp LIMIT 1
),
cov22 AS MATERIALIZED (
    SELECT list_sort(list_distinct(
        cv.covered || CASE WHEN p.newly > 0 THEN p.newt
                      ELSE [] END)) AS covered
    FROM cov21 cv CROSS JOIN pick22 p
)
SELECT pick, grp, newly AS newly_covered, covered_total FROM (
SELECT pick, grp, newly, (SELECT CAST(len(covered) AS BIGINT) FROM cov1) AS covered_total FROM pick1
UNION ALL
SELECT pick, grp, newly, (SELECT CAST(len(covered) AS BIGINT) FROM cov2) AS covered_total FROM pick2
UNION ALL
SELECT pick, grp, newly, (SELECT CAST(len(covered) AS BIGINT) FROM cov3) AS covered_total FROM pick3
UNION ALL
SELECT pick, grp, newly, (SELECT CAST(len(covered) AS BIGINT) FROM cov4) AS covered_total FROM pick4
UNION ALL
SELECT pick, grp, newly, (SELECT CAST(len(covered) AS BIGINT) FROM cov5) AS covered_total FROM pick5
UNION ALL
SELECT pick, grp, newly, (SELECT CAST(len(covered) AS BIGINT) FROM cov6) AS covered_total FROM pick6
UNION ALL
SELECT pick, grp, newly, (SELECT CAST(len(covered) AS BIGINT) FROM cov7) AS covered_total FROM pick7
UNION ALL
SELECT pick, grp, newly, (SELECT CAST(len(covered) AS BIGINT) FROM cov8) AS covered_total FROM pick8
UNION ALL
SELECT pick, grp, newly, (SELECT CAST(len(covered) AS BIGINT) FROM cov9) AS covered_total FROM pick9
UNION ALL
SELECT pick, grp, newly, (SELECT CAST(len(covered) AS BIGINT) FROM cov10) AS covered_total FROM pick10
UNION ALL
SELECT pick, grp, newly, (SELECT CAST(len(covered) AS BIGINT) FROM cov11) AS covered_total FROM pick11
UNION ALL
SELECT pick, grp, newly, (SELECT CAST(len(covered) AS BIGINT) FROM cov12) AS covered_total FROM pick12
UNION ALL
SELECT pick, grp, newly, (SELECT CAST(len(covered) AS BIGINT) FROM cov13) AS covered_total FROM pick13
UNION ALL
SELECT pick, grp, newly, (SELECT CAST(len(covered) AS BIGINT) FROM cov14) AS covered_total FROM pick14
UNION ALL
SELECT pick, grp, newly, (SELECT CAST(len(covered) AS BIGINT) FROM cov15) AS covered_total FROM pick15
UNION ALL
SELECT pick, grp, newly, (SELECT CAST(len(covered) AS BIGINT) FROM cov16) AS covered_total FROM pick16
UNION ALL
SELECT pick, grp, newly, (SELECT CAST(len(covered) AS BIGINT) FROM cov17) AS covered_total FROM pick17
UNION ALL
SELECT pick, grp, newly, (SELECT CAST(len(covered) AS BIGINT) FROM cov18) AS covered_total FROM pick18
UNION ALL
SELECT pick, grp, newly, (SELECT CAST(len(covered) AS BIGINT) FROM cov19) AS covered_total FROM pick19
UNION ALL
SELECT pick, grp, newly, (SELECT CAST(len(covered) AS BIGINT) FROM cov20) AS covered_total FROM pick20
UNION ALL
SELECT pick, grp, newly, (SELECT CAST(len(covered) AS BIGINT) FROM cov21) AS covered_total FROM pick21
UNION ALL
SELECT pick, grp, newly, (SELECT CAST(len(covered) AS BIGINT) FROM cov22) AS covered_total FROM pick22
) WHERE newly > 0
"""


_DAY_US = 86400 * US


def q_k_anonymity_events(sf_dir: str):
    """k-anonymity audit of the event stream under the
    quasi-identifier (event_type, day, user_id % 50)
    (``stages/curation.py:k_anonymity_audit``; Sweeney 2002): one
    exact-int row counting equivalence classes below k=5 and the rows
    they expose — the release-safety gate for event-level data."""
    from ...stages.curation import k_anonymity_audit

    ds = _read_parquet_clean(f"{sf_dir}/events.parquet",
                             columns=["ts", "user_id", "event_type"]) \
        .repartition(8)

    def _quasi(b: pa.Table) -> pa.Table:
        ts = pc.cast(b["ts"], pa.int64())
        import numpy as _np

        tv = ts.to_numpy() if not isinstance(ts, pa.ChunkedArray) \
            else ts.combine_chunks().to_numpy()
        uid = b["user_id"].to_numpy(zero_copy_only=False)
        return pa.table({"event_type": b["event_type"],
                         "day": pa.array(tv // _DAY_US),
                         "ub": pa.array(uid % 50)})

    return k_anonymity_audit(ds.map_batches(_quasi,
                                            batch_format="pyarrow"),
                             quasi_cols=("event_type", "day", "ub"),
                             k=5, num_partitions=4)


K_ANON_SQL = f"""
WITH cls AS (
    SELECT event_type, epoch_us(ts) // {_DAY_US} AS day,
           user_id % 50 AS ub, CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY 1, 2, 3
)
SELECT CAST(5 AS BIGINT) AS k,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(count(*) FILTER (n < 5) AS BIGINT) AS n_violating,
       CAST(coalesce(sum(n) FILTER (n < 5), 0) AS BIGINT)
           AS rows_at_risk
FROM cls
"""


def q_sprt_users(sf_dir: str):
    """Wald SPRT per user over the ordered event stream
    (``stages/abtest.py:sprt_decide``; Wald 1945): Bernoulli trial =
    event value above the corpus median (cents > 3459), H0 p=0.4 vs
    H1 p=0.6, alpha=beta=0.05. The log-likelihood ratio is the CLOSED
    FORM s*c1 + (t-s)*c0 of exact integer cumsums — no float
    accumulation — and every constant is a pinned libm ln of
    DOUBLE-cast literals (the Wilson DECIMAL-folding lesson). Output:
    earliest decision per user."""
    from ...stages.abtest import sprt_decide

    ds = _read_parquet_clean(f"{sf_dir}/events.parquet",
                             columns=["event_id", "ts", "user_id",
                                      "value"]).repartition(8)

    def _flag(b: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(b["value"], 100.0),
                                 ndigits=0), pa.int64())
        return pa.table({
            "user_id": b["user_id"],
            "x": pc.cast(pc.greater(cents, pa.scalar(3459, pa.int64())),
                         pa.int64()),
            "ts_us": pc.cast(b["ts"], pa.int64()),
            "event_id": b["event_id"]})

    return sprt_decide(ds.map_batches(_flag, batch_format="pyarrow"),
                       key_col="user_id", flag_col="x",
                       order_cols=("ts_us", "event_id"),
                       num_partitions=8)


SPRT_SQL = """
WITH cst AS (
    SELECT ln(CAST(0.6 AS DOUBLE) / CAST(0.4 AS DOUBLE)) AS c1,
           ln((1.0 - CAST(0.6 AS DOUBLE))
              / (1.0 - CAST(0.4 AS DOUBLE))) AS c0,
           ln((1.0 - CAST(0.05 AS DOUBLE)) / CAST(0.05 AS DOUBLE))
               AS up,
           ln(CAST(0.05 AS DOUBLE) / (1.0 - CAST(0.05 AS DOUBLE)))
               AS lo
),
e AS (
    SELECT user_id,
           CASE WHEN CAST(round(value * 100) AS BIGINT) > 3459
                THEN 1 ELSE 0 END AS x,
           row_number() OVER w AS t,
           CAST(sum(CASE WHEN CAST(round(value * 100) AS BIGINT) > 3459
                    THEN 1 ELSE 0 END) OVER (PARTITION BY user_id
                ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
               AS BIGINT) AS s
    FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
l AS (
    SELECT e.*, CAST(s AS DOUBLE) * cst.c1
                + CAST(t - s AS DOUBLE) * cst.c0 AS llr,
           cst.up, cst.lo
    FROM e CROSS JOIN cst
),
h AS (
    SELECT user_id, t, s, (llr >= up) AS hu
    FROM l WHERE llr >= up OR llr <= lo
),
f AS (SELECT user_id, min(t) AS td FROM h GROUP BY user_id),
tot AS (
    SELECT user_id, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(x) AS BIGINT) AS s_total
    FROM e GROUP BY user_id
)
SELECT tot.user_id, tot.n, tot.s_total,
       CASE WHEN f.td IS NULL THEN 'continue'
            WHEN hh.hu THEN 'accept_h1'
            ELSE 'accept_h0' END AS decision,
       coalesce(f.td, 0) AS t_decide,
       coalesce(hh.s, 0) AS s_decide
FROM tot LEFT JOIN f USING (user_id)
LEFT JOIN h hh ON hh.user_id = tot.user_id AND hh.t = f.td
"""


def q_bwt_docs(sf_dir: str):
    """Burrows-Wheeler transform statistics over the bounded doc
    subset (``stages/compress.py:bwt_stats``; Burrows & Wheeler 1994):
    with ``mtf_score_users`` this completes the BWT->MTF->RLE bzip2
    story. Rotation sort in codepoint order, '~' sentinel (validated
    absent), md5-u64 transform fingerprint, and the run-count drop
    that is the whole point of the transform. Embarrassingly parallel
    — no shuffle; the oracle replays the rotation sort with
    list_transform + list_sort."""
    from ...stages.compress import bwt_stats

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"]).repartition(8)
    return bwt_stats(ds, max_chars=400, modulus=7, num_partitions=8)


_MD5U64_BWT = """list_reduce(list_prepend(0::HUGEINT,
    list_transform(range(1, 17),
        i -> CAST(strpos('0123456789abcdef',
                         substring(md5({expr}), i, 1)) - 1
                  AS HUGEINT))), (h, d) -> h * 16 + d)"""

BWT_SQL = f"""
WITH sel AS (
    SELECT doc_id, text || '~' AS s2, length(text) + 1 AS n
    FROM documents
    WHERE doc_id % 7 = 0 AND length(text) <= 400
),
rot AS (
    SELECT doc_id, n,
           list_sort(list_transform(range(1, n + 1),
               i -> substr(s2 || s2, CAST(i AS INTEGER),
                           CAST(n AS INTEGER)))) AS rots,
           s2
    FROM sel
),
bw AS (
    SELECT doc_id, n, s2,
           array_to_string(list_transform(rots,
               r -> substr(r, CAST(n AS INTEGER), 1)), '') AS bwt
    FROM rot
)
SELECT doc_id, CAST(n AS BIGINT) AS n,
       CAST({_MD5U64_BWT.format(expr="bwt")}
            - 9223372036854775808::HUGEINT AS BIGINT) AS bwt_hash,
       CAST(1 + len(list_filter(range(2, CAST(n AS INTEGER) + 1),
            i -> substr(s2, i, 1) <> substr(s2, i - 1, 1)))
            AS BIGINT) AS runs_text,
       CAST(1 + len(list_filter(range(2, CAST(n AS INTEGER) + 1),
            i -> substr(bwt, i, 1) <> substr(bwt, i - 1, 1)))
            AS BIGINT) AS runs_bwt
FROM bw
"""


def q_knapsack_suppliers(sf_dir: str):
    """Exact 0/1 knapsack value function over suppliers
    (``stages/curation.py:knapsack_dp``): deterministic item weights
    ``1 + s_suppkey % 9`` and values ``1 + (s_suppkey * 7) % 100``,
    budget 50. The engine computes it DISTRIBUTED (per-block DP folds
    merged by max-plus convolution — associative, partition-
    invariant); the oracle replays the SEQUENTIAL textbook DP with a
    LIST-state recursive CTE over suppkey order — hash equality
    proves the merge algebra. Output ``(w, best)`` for w = 0..50."""
    from ...stages.curation import knapsack_dp

    ds = _read_parquet_clean(f"{sf_dir}/supplier.parquet",
                             columns=["s_suppkey"]).repartition(4)

    def _items(b: pa.Table) -> pa.Table:
        import numpy as _np

        k = b["s_suppkey"].to_numpy(zero_copy_only=False).astype(
            _np.int64)
        return pa.table({"wt": pa.array(1 + k % 9),
                         "val": pa.array(1 + (k * 7) % 100)})

    return knapsack_dp(ds.map_batches(_items, batch_format="pyarrow"),
                       budget=50, num_partitions=4)


KNAPSACK_SQL = """
WITH RECURSIVE items AS MATERIALIZED (
    SELECT row_number() OVER (ORDER BY s_suppkey) AS idx,
           1 + s_suppkey % 9 AS wt,
           1 + (s_suppkey * 7) % 100 AS val
    FROM supplier
),
ni AS (SELECT CAST(count(*) AS BIGINT) AS n FROM items),
rec AS (
    SELECT CAST(0 AS BIGINT) AS idx,
           list_transform(range(0, 51),
                          w -> CAST(0 AS BIGINT)) AS dp
    UNION ALL
    SELECT r.idx + 1,
           list_transform(range(0, 51),
               w -> CASE WHEN w >= it.wt
                    THEN greatest(r.dp[w + 1],
                                  r.dp[w - it.wt + 1] + it.val)
                    ELSE r.dp[w + 1] END)
    FROM rec r JOIN items it ON it.idx = r.idx + 1
)
SELECT CAST(t.w AS BIGINT) AS w, CAST(f.dp[t.w + 1] AS BIGINT) AS best
FROM (SELECT dp FROM rec WHERE idx = (SELECT n FROM ni)) f,
     LATERAL unnest(generate_series(0, 50)) AS t(w)
"""
