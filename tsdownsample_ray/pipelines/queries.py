"""Driver-facing query catalog: one callable per operator/pipeline, each
taking ``sf_dir`` and returning a ``ray.data.Dataset`` (or Arrow table),
with a matching ANSI-SQL oracle in ``ORACLE_SQL`` where the semantics are
SQL-expressible (the driver's correctness gate).

Column names are chosen to match the oracle SQL aliases exactly.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..sources.corpus import (
    BASE_EPOCH_S,
    DOC_CADENCE_S,
    SNAPSHOT_CADENCE_S,
    read_pages,
)
from ..stages.compress import ChunkCompressor, ChunkDecompressor
from ..stages.downsample import downsample_table
from ..stages.extract import HtmlTextExtractor
from ..stages.gapfill import gapfill
from ..stages.rollup import cascade, finalize_mean, rollup
from ..stages.series import derive_series

US = 1_000_000
W15M = 900 * US
W1H = 3600 * US
W1D = 86400 * US
SNAPSHOTS = 3  # pages per document in the correctness corpus


def _read_parquet_clean(*a, **kw):
    from ..sources import read_parquet_clean

    return read_parquet_clean(*a, **kw)


def _rd():
    import ray.data as rd

    return rd


# ---------------------------------------------------------------------------
# shared SQL fragments
# ---------------------------------------------------------------------------

# the pages corpus as SQL — must mirror sources/corpus.py exactly
_K_VALUES = ", ".join(f"({k})" for k in range(SNAPSHOTS))
PAGES_CTE = f"""
pages AS (
    SELECT d.source || '.example.com' AS series_id,
           'https://' || d.source || '.example.com/doc/' || CAST(d.doc_id AS VARCHAR) AS url,
           ({BASE_EPOCH_S} + d.doc_id*{DOC_CADENCE_S} + s.k*{SNAPSHOT_CADENCE_S}) * {US} AS ts_us,
           d.text AS text,
           d.lang AS lang,
           length(d.text) AS y
    FROM documents d CROSS JOIN (VALUES {_K_VALUES}) s(k)
)
"""

_ROLLUP_SQL = """
WITH {cte}
SELECT series_id,
       (ts_us // {w}) * {w} AS bucket,
       min(y) AS min_y,
       max(y) AS max_y,
       CAST(sum(y) AS BIGINT) AS sum_y,
       count(*) AS n,
       CAST(sum(y) AS DOUBLE) / count(*) AS mean_y
FROM pages
GROUP BY 1, 2
"""


def _events_s_cte(nan_every: int | None) -> str:
    """The per-series row-numbered events CTE shared by all kernel oracles:
    ``cy`` = integer cents (exact sums -> f64 arithmetic bit-identical to
    the NumPy kernels), optionally NaN-injected for the NaN-policy kernels."""
    if nan_every is None:
        cy = "CAST(round(value * 100) AS BIGINT)"
    else:
        cy = (f"CASE WHEN event_id % {nan_every} = 0 THEN 'NaN'::DOUBLE "
              "ELSE round(value * 100) END")
    return f"""s AS MATERIALIZED (
    SELECT event_type, event_id, {cy} AS cy,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY ts, event_id) - 1 AS rn,
           count(*) OVER (PARTITION BY event_type) AS cnt
    FROM events
)"""


def _lttb_phase2_sql(n_out: int, src: str, *, bucket_x: str = "mean") -> str:
    """LTTB bucket-loop replay over table ``src(event_type, p, x, cy, m2)``
    (positions p = 0..m2-1): np.arange offset replay, exact integer bucket
    means, and the sequential argmax recursion — numpy's first-occurrence /
    NaN-propagating argmax is ``max(struct_pack(area, -p))`` under DuckDB's
    NaN-is-greatest total float order. ``bucket_x="midpoint"`` replays the
    shipped Rust binary's next-bucket x ``(x[hi-1] + x[lo]) / 2``
    (``lttb.rs:46-50``) instead of LTTB_py's mean — the identical IEEE
    add-then-halve both sides, so gapped-x runs stay bit-exact."""
    if bucket_x == "midpoint":
        avg_x = ("(CAST(arg_max(t.x, t.p) AS DOUBLE) "
                 "+ CAST(arg_min(t.x, t.p) AS DOUBLE)) / 2.0")
    else:
        avg_x = "CAST(sum(t.x) AS DOUBLE) / count(*)"
    return f"""
meta AS MATERIALIZED (
    SELECT event_type, any_value(m2) AS m2,
           (any_value(m2) - 2.0) / {n_out - 2} AS bs,
           CAST(CEIL((any_value(m2) - 1.0)
                / ((any_value(m2) - 2.0) / {n_out - 2})) AS BIGINT) AS n_off
    FROM {src} GROUP BY 1
),
off AS MATERIALIZED (
    -- per-series unnest(range(n_off)): exactly n_off rows per series (a
    -- giant literal generate_series upper bound would materialize
    -- hundreds of millions of rows before the join filter)
    SELECT event_type, k,
           CAST(FLOOR(1.0 + k * bs) AS BIGINT) AS o, n_off, m2
    FROM (SELECT m.*, unnest(range(0, m.n_off)) AS k FROM meta m)
),
buckets AS MATERIALIZED (
    SELECT event_type, k AS b, o AS lo,
           lead(o) OVER (PARTITION BY event_type ORDER BY k) AS hi,
           n_off, m2
    FROM off
),
bstats AS MATERIALIZED (
    SELECT b.event_type, b.b,
           {avg_x} AS avg_x,
           sum(CAST(t.cy AS DOUBLE)) / count(*) AS avg_y
    FROM buckets b JOIN {src} t ON t.event_type = b.event_type
                               AND t.p >= b.lo AND t.p < b.hi
    WHERE b.hi IS NOT NULL
    GROUP BY 1, 2
),
tavg AS MATERIALIZED (
    SELECT b.event_type, b.b AS t, b.lo, b.hi, st.avg_x, st.avg_y
    FROM buckets b JOIN bstats st ON st.event_type = b.event_type
                                 AND st.b = b.b + 1
    WHERE b.b <= {n_out - 4}
    UNION ALL
    SELECT b.event_type, {n_out - 3} AS t, b.lo, b.hi,
           sl.x_last AS avg_x, sl.cy_last AS avg_y
    FROM buckets b
    JOIN (SELECT event_type, CAST(x AS DOUBLE) AS x_last,
                 CAST(cy AS DOUBLE) AS cy_last
          FROM {src} WHERE p = m2 - 1) sl ON sl.event_type = b.event_type
    WHERE b.b = b.n_off - 2
),
rec AS (
    SELECT event_type, -1::BIGINT AS t, 0::BIGINT AS a FROM meta
    UNION ALL
    SELECT event_type, t, -(m).nr AS a FROM (
        SELECT q.event_type, q.t,
               max(struct_pack(ar := q.area, nr := -q.p)) AS m
        FROM (
            SELECT r.event_type, r.t + 1 AS t, c.p,
                   abs(CAST(c.x AS DOUBLE)
                         * (CAST(pp.cy AS DOUBLE) - ta.avg_y)
                       + CAST(c.cy AS DOUBLE)
                         * (ta.avg_x - CAST(pp.x AS DOUBLE))
                       + (CAST(pp.x AS DOUBLE) * ta.avg_y
                          - ta.avg_x * CAST(pp.cy AS DOUBLE))) AS area
            FROM rec r
            JOIN {src} pp ON pp.event_type = r.event_type AND pp.p = r.a
            JOIN tavg ta ON ta.event_type = r.event_type AND ta.t = r.t + 1
            JOIN {src} c ON c.event_type = r.event_type
                        AND c.p >= ta.lo AND c.p < ta.hi
            WHERE r.t + 1 <= {n_out - 3}
        ) q GROUP BY q.event_type, q.t
    )
)"""


def _lttb_sql(n_out: int) -> str:
    """Exact LTTB oracle over the full series (y = integer cents)."""
    return f"""
WITH RECURSIVE {_events_s_cte(None)},
sp AS MATERIALIZED (SELECT event_type, rn AS p, rn AS x, cy, cnt AS m2 FROM s),
{_lttb_phase2_sql(n_out, "sp")},
picked AS (
    SELECT event_type, a AS rn FROM rec
    UNION ALL SELECT event_type, m2 - 1 FROM meta
)
SELECT s.event_type, s.event_id, s.cy AS cents
FROM s JOIN picked p ON s.event_type = p.event_type AND s.rn = p.rn
"""


def _minmaxlttb_sql(n_out: int, ratio: int, nan_every: int | None,
                    with_cents: bool) -> str:
    """Exact MinMaxLTTB oracle: phase-1 MinMax pairs over the interior
    (NaN-returning when ``nan_every`` is set), phase-2 LTTB over the
    positioned preselection with x = original index (the kernel's no-x
    variant, ``minmaxlttb.rs:198``)."""
    nb1 = n_out * ratio // 2
    if nan_every is None:
        sel_min = "min(ib.irn) FILTER (WHERE ib.cy = e.mn)"
        sel_max = "min(ib.irn) FILTER (WHERE ib.cy = e.mx)"
        ext_nan = ""
    else:
        sel_min = ("CASE WHEN any_value(e.has_nan) THEN any_value(e.rn_nan) "
                   "ELSE min(ib.irn) FILTER (WHERE ib.cy = e.mn) END")
        sel_max = ("CASE WHEN any_value(e.has_nan) THEN any_value(e.rn_nan) "
                   "ELSE min(ib.irn) FILTER (WHERE ib.cy = e.mx) END")
        ext_nan = (", bool_or(isnan(cy)) AS has_nan, "
                   "min(irn) FILTER (WHERE isnan(cy)) AS rn_nan")
    out_cols = (", s.cy AS cents" if with_cents else "")
    return f"""
WITH RECURSIVE {_events_s_cte(nan_every)},
interior AS MATERIALIZED (
    SELECT event_type, cy, rn - 1 AS irn, cnt - 2 AS m
    FROM s WHERE rn >= 1 AND rn < cnt - 1
),
binned AS MATERIALIZED (
    SELECT i.*, b.i AS bin,
           CASE WHEN b.i = 0 THEN 0
                ELSE CAST(FLOOR(b.i * ((i.m - 1.0) / {nb1})) AS BIGINT) + 1
           END AS blo,
           CASE WHEN b.i = {nb1 - 1} THEN i.m
                ELSE CAST(FLOOR((b.i + 1) * ((i.m - 1.0) / {nb1}))
                          AS BIGINT) + 1
           END AS bhi
    FROM interior i JOIN generate_series(0, {nb1 - 1}) b(i) ON TRUE
),
inbin AS MATERIALIZED (SELECT * FROM binned WHERE irn >= blo AND irn < bhi),
ext AS MATERIALIZED (
    SELECT event_type, bin, min(cy) AS mn, max(cy) AS mx{ext_nan}
    FROM inbin GROUP BY 1, 2
),
selbin AS MATERIALIZED (
    SELECT ib.event_type, ib.bin,
           {sel_min} AS rn_min,
           {sel_max} AS rn_max
    FROM inbin ib JOIN ext e ON ib.event_type = e.event_type
                            AND ib.bin = e.bin
    GROUP BY ib.event_type, ib.bin
),
presel_rns AS (
    SELECT event_type, 0::BIGINT AS rn
    FROM (SELECT DISTINCT event_type FROM s)
    UNION ALL SELECT event_type, least(rn_min, rn_max) + 1 FROM selbin
    UNION ALL SELECT event_type, greatest(rn_min, rn_max) + 1 FROM selbin
    UNION ALL SELECT event_type, any_value(cnt) - 1 FROM s GROUP BY event_type
),
presel AS MATERIALIZED (
    SELECT p.event_type,
           row_number() OVER (PARTITION BY p.event_type
                              ORDER BY p.rn) - 1 AS p,
           p.rn AS x, s.cy,
           count(*) OVER (PARTITION BY p.event_type) AS m2
    FROM presel_rns p JOIN s ON s.event_type = p.event_type AND s.rn = p.rn
),
{_lttb_phase2_sql(n_out, "presel")},
picked AS (
    SELECT r.event_type, t.x AS rn
    FROM rec r JOIN presel t ON t.event_type = r.event_type AND t.p = r.a
    UNION ALL SELECT event_type, cnt - 1 FROM s WHERE rn = 0
)
SELECT s.event_type, s.event_id{out_cols}
FROM s JOIN picked p ON s.event_type = p.event_type AND s.rn = p.rn
"""


def _nan_binned_sql(nb: int, extra_ext: str = "", extra_pick: str = "") -> str:
    """Shared binned/ext/sel scaffold for the NaN-policy MinMax/M4 oracles
    (NaN in a bin -> its FIRST NaN index is both extremes, matching
    np.argmin/argmax propagation)."""
    return f"""
binned AS MATERIALIZED (
    SELECT s.*, b.i,
           CASE WHEN b.i = 0 THEN 0
                ELSE CAST(FLOOR(b.i * ((s.cnt - 1.0) / {nb})) AS BIGINT) + 1
           END AS lo,
           CASE WHEN b.i = {nb - 1} THEN s.cnt
                ELSE CAST(FLOOR((b.i + 1) * ((s.cnt - 1.0) / {nb}))
                          AS BIGINT) + 1
           END AS hi
    FROM s JOIN generate_series(0, {nb - 1}) b(i) ON TRUE
),
inbin AS MATERIALIZED (SELECT * FROM binned WHERE rn >= lo AND rn < hi),
ext AS MATERIALIZED (
    SELECT event_type, i, min(cy) AS mn, max(cy) AS mx,
           bool_or(isnan(cy)) AS has_nan,
           min(rn) FILTER (WHERE isnan(cy)) AS rn_nan{extra_ext}
    FROM inbin GROUP BY 1, 2
),
sel AS (
    SELECT ib.event_type, ib.i,{extra_pick}
           CASE WHEN any_value(e.has_nan) THEN any_value(e.rn_nan)
                ELSE min(ib.rn) FILTER (WHERE ib.cy = e.mn) END AS rn_min,
           CASE WHEN any_value(e.has_nan) THEN any_value(e.rn_nan)
                ELSE min(ib.rn) FILTER (WHERE ib.cy = e.mx) END AS rn_max
    FROM inbin ib JOIN ext e ON ib.event_type = e.event_type AND ib.i = e.i
    GROUP BY ib.event_type, ib.i
)"""


def _langid_ctes(src: str) -> str:
    """The LangId heuristic's CTE chain (over relation ``src`` providing
    (doc_id, text)), generated from the class's own stopword/n-gram
    tables: per-language stopword score over whitespace-split lowercase
    tokens, n-gram substring-count fallback, 'und' when both are zero.
    Python's ``max(key=(score, lang))`` is ``max(struct_pack(s, l))``
    (ties broken by the greater language code). The han/'zh' branch is
    omitted — the driver corpus is pure ASCII. Exposes ``lid_out(doc_id,
    lang_pred)``."""
    from ..stages.textstats import LangId

    def _sw_case():
        parts = []
        for lang, words in LangId.PROFILES.items():
            ws = ", ".join(f"'{w}'" for w in sorted(words))
            parts.append(f"WHEN '{lang}' THEN len(list_filter(toks,"
                         f" x -> x IN ({ws})))")
        return "CASE l.lang " + " ".join(parts) + " END"

    def _ng_case():
        parts = []
        for lang, grams in LangId.NGRAMS.items():
            terms = " + ".join(
                f"((length(low) - length(replace(low, '{g}', '')))"
                f" // {len(g)})" for g in grams)
            parts.append(f"WHEN '{lang}' THEN {terms}")
        return "CASE l.lang " + " ".join(parts) + " END"

    langs = ", ".join(f"('{k}')" for k in LangId.PROFILES)
    return f"""
lid_t AS (
    SELECT doc_id, lower(text) AS low,
           list_filter(string_split_regex(lower(text), '\\s+'),
                       x -> x <> '') AS toks
    FROM {src}
),
lid_scores AS (
    SELECT t.doc_id, l.lang,
           {_sw_case()} AS sw_score,
           {_ng_case()} AS ng_score
    FROM lid_t t CROSS JOIN (VALUES {langs}) l(lang)
),
lid_agg AS (
    SELECT doc_id,
           max(struct_pack(s := sw_score, l := lang)) AS msw,
           max(struct_pack(s := ng_score, l := lang)) AS mng
    FROM lid_scores GROUP BY 1
),
lid_out AS (
    SELECT t.doc_id,
           CASE WHEN len(t.toks) = 0 THEN 'und'
                WHEN (a.msw).s > 0 THEN (a.msw).l
                WHEN (a.mng).s > 0 THEN (a.mng).l
                ELSE 'und' END AS lang_pred
    FROM lid_t t JOIN lid_agg a ON t.doc_id = a.doc_id
)"""


def _langid_sql() -> str:
    return f"""
WITH {_langid_ctes("documents")}
SELECT doc_id, lang_pred FROM lid_out
"""


_FP_EXPR = """CAST(list_reduce(list_prepend(0::HUGEINT,
    list_transform(range(1, length(text) + 1),
                   i -> unicode(substring(text, i, 1))::HUGEINT)),
    (h, c) -> (h * 1000003 + c) % 2305843009213693951) AS BIGINT)"""


def _curation_sql() -> str:
    """quality filter -> fingerprint dedup (keep lowest doc_id) -> langid
    -> per-language totals, composed from the stage oracles."""
    return f"""
WITH q0 AS (
    SELECT doc_id, text,
           list_filter(string_split_regex(text, '\\s+'),
                       x -> x <> '') AS toks
    FROM documents
),
q1 AS (
    SELECT doc_id, text, len(toks) AS n_tokens FROM q0
),
filtered AS (
    SELECT doc_id, text, n_tokens FROM q1 WHERE n_tokens >= 20
),
fp AS (
    SELECT doc_id, text, n_tokens, {_FP_EXPR} AS fingerprint FROM filtered
),
deduped AS (
    SELECT doc_id, text, n_tokens FROM fp
    QUALIFY row_number() OVER (PARTITION BY fingerprint
                               ORDER BY doc_id) = 1
),
{_langid_ctes("deduped")}
SELECT l.lang_pred, count(*) AS n_docs,
       CAST(sum(d.n_tokens) AS BIGINT) AS total_tokens
FROM deduped d JOIN lid_out l ON d.doc_id = l.doc_id
GROUP BY 1
"""


# md5's first 8 bytes as uint64 ("big"), exactly dedup._stable_u64
_MD5U64 = """list_reduce(list_prepend(0::HUGEINT,
    list_transform(range(1, 17),
        i -> CAST(strpos('0123456789abcdef', substring(md5(tok), i, 1)) - 1
                  AS HUGEINT))), (h, d) -> h * 16 + d)"""
_POW2 = ", ".join(f"({b}, {1 << b}::HUGEINT)" for b in range(64))


def _simhash_ctes(src: str, id_col: str) -> str:
    """SimHash replayed exactly over relation ``src(id_col, text)``:
    per-bit +/-1 majority over md5-u64 token hashes, signature re-packed
    and wrapped to signed int64. Exposes ``sh_out(id_col, simhash)``."""
    return f"""
sh_t AS (
    SELECT {id_col},
           list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
    FROM {src}
),
sh_tok AS (SELECT {id_col}, unnest(toks) AS tok FROM sh_t),
sh_th AS (SELECT {id_col}, {_MD5U64} AS h FROM sh_tok),
sh_bits AS (
    SELECT th.{id_col}, p.b,
           sum(CASE WHEN (th.h // p.pw) % 2 = 1 THEN 1 ELSE -1 END) AS acc
    FROM sh_th th CROSS JOIN (VALUES {_POW2}) p(b, pw)
    GROUP BY 1, 2
),
sh_sig AS (
    SELECT b.{id_col},
           sum(CASE WHEN b.acc > 0 THEN p.pw ELSE 0::HUGEINT END) AS v
    FROM sh_bits b JOIN (VALUES {_POW2}) p(b, pw) ON p.b = b.b
    GROUP BY 1
),
sh_out AS (
    SELECT t.{id_col},
           CAST(CASE WHEN COALESCE(s.v, 0) >= 9223372036854775808::HUGEINT
                     THEN COALESCE(s.v, 0) - 18446744073709551616::HUGEINT
                     ELSE COALESCE(s.v, 0) END AS BIGINT) AS simhash
    FROM sh_t t LEFT JOIN sh_sig s ON t.{id_col} = s.{id_col}
)"""


def _simhash_sql() -> str:
    return f"""
WITH {_simhash_ctes("documents", "doc_id")}
SELECT doc_id, simhash FROM sh_out
"""


def _simhash_neardup_sql(max_hamming: int) -> str:
    """Quadratic ground truth for the banded SimHash near-dup operator —
    the 4x16-bit banding has PERFECT recall at hamming <= 3 (pigeonhole),
    so the distributed result must EQUAL this all-pairs definition."""
    return f"""
WITH {PAGES_CTE},
p AS (SELECT url || '#' || CAST(ts_us AS VARCHAR) AS pid, text FROM pages),
{_simhash_ctes("p", "pid")}
SELECT x.pid AS a, y.pid AS b,
       CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming
FROM sh_out x JOIN sh_out y ON x.pid < y.pid
WHERE bit_count(xor(x.simhash, y.simhash)) <= {max_hamming}
"""


def _minhash_sql(num_perm: int = 64, w: int = 3, seed: int = 7) -> str:
    """Every MinHash signature slot replayed exactly: md5-u64 token hashes
    -> 31-bit shingle mix (mod-2^31 ring arithmetic == the kernel's uint64
    wrap + mask) -> min over (a*g + b) mod 2^31-1 per embedded
    permutation (the MinHasher's own seeded constants)."""
    from ..stages.dedup import _SHINGLE_MIX, MinHasher

    mh = MinHasher(num_perm=num_perm, shingle_w=w, seed=seed)
    m31 = 1 << 31
    mer = (1 << 31) - 1
    c = [int(x) % m31 for x in _SHINGLE_MIX[:w]]
    perms = ", ".join(f"({k}, {int(a)}, {int(b)})"
                      for k, (a, b) in enumerate(zip(mh.a, mh.b)))
    return f"""
WITH t AS (
    SELECT doc_id,
           list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
    FROM documents
),
tokidx AS (
    SELECT doc_id, i, toks[i] AS tok, len(toks) AS n
    FROM t, unnest(range(1, len(toks) + 1)) r(i)
),
th AS (
    SELECT doc_id, i, n, CAST({_MD5U64} % {m31} AS BIGINT) AS h31
    FROM tokidx
),
th2 AS (
    SELECT doc_id, n, h31,
           lead(h31, 1) OVER win AS h1, lead(h31, 2) OVER win AS h2
    FROM th WINDOW win AS (PARTITION BY doc_id ORDER BY i)
),
grams AS (
    SELECT doc_id,
           ((h31 * {c[0]}) % {m31} + (h1 * {c[1]}) % {m31}
            + (h2 * {c[2]}) % {m31}) % {m31} AS g
    FROM th2 WHERE h2 IS NOT NULL AND n >= {w}
    UNION ALL
    -- short docs (< w tokens): one shingle = hash of the joined tokens
    SELECT doc_id, CAST({_MD5U64} % {m31} AS BIGINT) AS g
    FROM (SELECT doc_id, array_to_string(toks, ' ') AS tok FROM t
          WHERE len(toks) > 0 AND len(toks) < {w}) short
),
sig AS (
    SELECT g.doc_id, p.k, min((g.g * p.a + p.b) % {mer}) AS sig
    FROM grams g CROSS JOIN (VALUES {perms}) p(k, a, b)
    GROUP BY 1, 2
)
SELECT t.doc_id, CAST(p.k AS BIGINT) AS perm, COALESCE(s.sig, 0) AS sig
FROM t CROSS JOIN (VALUES {perms}) p(k, a, b)
LEFT JOIN sig s ON s.doc_id = t.doc_id AND s.k = p.k
"""


def _nanminmax_sql(n_out: int, nan_every: int) -> str:
    return f"""
WITH {_events_s_cte(nan_every)},
{_nan_binned_sql(n_out // 2)},
picked AS (
    SELECT event_type, rn_min AS rn FROM sel
    UNION ALL SELECT event_type, rn_max FROM sel
)
SELECT s.event_type, s.event_id
FROM s JOIN picked p ON s.event_type = p.event_type AND s.rn = p.rn
"""


def _nanm4_sql(n_out: int, nan_every: int) -> str:
    return f"""
WITH {_events_s_cte(nan_every)},
{_nan_binned_sql(
    n_out // 4,
    extra_ext=", min(rn) AS first_rn, max(rn) AS last_rn",
    extra_pick=(" any_value(e.first_rn) AS first_rn,"
                " any_value(e.last_rn) AS last_rn,"))},
picked AS (
    SELECT event_type, first_rn AS rn FROM sel
    UNION ALL SELECT event_type, least(rn_min, rn_max) FROM sel
    UNION ALL SELECT event_type, greatest(rn_min, rn_max) FROM sel
    UNION ALL SELECT event_type, last_rn FROM sel
)
SELECT s.event_type, s.event_id
FROM s JOIN picked p ON s.event_type = p.event_type AND s.rn = p.rn
"""


# ---------------------------------------------------------------------------
# corpus / extraction
# ---------------------------------------------------------------------------

def q_pages_extract(sf_dir: str):
    """pages -> html->text extraction; byte-identical text invariant."""
    pages = read_pages(sf_dir, snapshots=SNAPSHOTS)
    ext = pages.map_batches(HtmlTextExtractor, batch_format="pyarrow", concurrency=(1, 8))

    def _proj(b: pa.Table) -> pa.Table:
        return pa.table({
            "url": b["url"],
            "ts_us": b["warc_ts"].cast(pa.int64()),
            "text": b["extracted_text"],  # extracted, not pass-through
            "lang": b["lang"],
        })

    return ext.map_batches(_proj, batch_format="pyarrow")


def _series(sf_dir: str):
    return derive_series(
        read_pages(sf_dir, snapshots=SNAPSHOTS,
                   columns=["url", "warc_ts", "text"])
    )


def q_page_rollup_15m(sf_dir: str):
    return finalize_mean(rollup(_series(sf_dir), W15M))


def q_rollup_cascade_1h(sf_dir: str):
    return finalize_mean(cascade(rollup(_series(sf_dir), W15M), W1H))


def q_rollup_cascade_1d(sf_dir: str):
    t0 = rollup(_series(sf_dir), W15M)
    return finalize_mean(cascade(cascade(t0, W1H), W1D))


def q_crawl_rate_1h(sf_dir: str):
    t = cascade(rollup(_series(sf_dir), W15M), W1H)
    return t.select_columns(["series_id", "bucket", "n"])


def q_topk_domains(sf_dir: str):
    # window >= any epoch-us value -> exactly ONE bucket per series (a
    # calendar-sized window would have an epoch-aligned boundary a large
    # corpus could straddle, splitting a domain into two partial sums)
    totals = rollup(_series(sf_dir), 1 << 62)

    def _proj(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["series_id"], "sum_chars": b["sum_y"]})

    return (
        totals.map_batches(_proj, batch_format="pyarrow")
        .sort(key=["sum_chars", "series_id"], descending=[True, False])
        .limit(5)
    )


def q_page_rollup_multi_15m(sf_dir: str):
    """Multi-metric rollup: page length AND token count rolled in one pass."""
    from ..stages.rollup import rollup_multi

    pages = read_pages(sf_dir, snapshots=SNAPSHOTS,
                       columns=["url", "warc_ts", "text"])

    def _metrics(b: pa.Table) -> pa.Table:
        url = b["url"]
        if isinstance(url, pa.ChunkedArray):
            url = url.combine_chunks()
        from ..stages.series import _DOMAIN_PATTERN

        domain = pc.struct_field(pc.extract_regex(url, _DOMAIN_PATTERN),
                                 "domain")
        return pa.table({
            "series_id": domain,
            "x": b["warc_ts"].cast(pa.int64()),
            "len": pc.cast(pc.utf8_length(b["text"]), pa.int64()),
            "tok": pc.cast(pc.add(pc.count_substring(b["text"], " "), 1),
                           pa.int64()),
        })

    series = pages.map_batches(_metrics, batch_format="pyarrow")
    return rollup_multi(series, W15M, ["len", "tok"])


def q_backfill_15m(sf_dir: str):
    """Incremental backfill: rollup of the first two snapshots, then the
    third snapshot merged in late — must equal the full 3-snapshot rollup
    (the oracle is the plain rollup SQL)."""
    from ..stages.backfill import merge_into_tier

    initial = derive_series(
        read_pages(sf_dir, snapshots=SNAPSHOTS - 1,
                   columns=["url", "warc_ts", "text"]))
    tier = rollup(initial, W15M)
    late = derive_series(
        read_pages(sf_dir, snapshots=1, first_snapshot=SNAPSHOTS - 1,
                   columns=["url", "warc_ts", "text"]))
    return finalize_mean(merge_into_tier(tier, late, W15M))


def q_distinct_urls_per_domain(sf_dir: str):
    """Distinct urls per domain, twice: EXACT (batch-local dedup partial ->
    per-domain distinct count — the hash-verified column) and the mergeable
    HLL sketch, reported as ``est_in_band`` = |est - exact|/exact <= 6%
    (the sketch's accuracy contract, checked against the SQL oracle's
    TRUE). The final merge touches only |domains| rows."""
    from ..stages.sketches import distinct_approx

    pages = read_pages(sf_dir, snapshots=SNAPSHOTS, columns=["url", "warc_ts"])

    def _dom(b: pa.Table) -> pa.Table:
        url = b["url"]
        if isinstance(url, pa.ChunkedArray):
            url = url.combine_chunks()
        from ..stages.series import _DOMAIN_PATTERN

        domain = pc.struct_field(pc.extract_regex(url, _DOMAIN_PATTERN),
                                 "domain")
        return pa.table({"domain": domain, "url": url})

    du = pages.map_batches(_dom, batch_format="pyarrow")
    est = distinct_approx(du, key_col="domain", value_col="url").to_pandas()

    # exact side, scale-safe: hash-partitioned (domain, url) distinct (a
    # hot domain spreads across partitions by url hash), then per-block
    # partial counts -> tiny per-domain merge. Never one group per domain.
    from ..arrow_utils import rename_agg
    from ..stages.dedup import distinct_pairs

    distinct = distinct_pairs(du, cols=("domain", "url"), num_partitions=16)

    def _cnt_partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["domain"]).aggregate([("url", "count")])
        return rename_agg(g, {"domain": "domain",
                              "url_count": "exact_distinct"})

    def _cnt_merge(b: pa.Table) -> pa.Table:
        g = b.group_by(["domain"]).aggregate([("exact_distinct", "sum")])
        return rename_agg(g, {"domain": "domain",
                              "exact_distinct_sum": "exact_distinct"})

    exact = (distinct.map_batches(_cnt_partial, batch_format="pyarrow")
             .repartition(1)
             .map_batches(_cnt_merge, batch_format="pyarrow")
             .to_pandas())
    exact["exact_distinct"] = exact["exact_distinct"].astype("int64")
    m = exact.merge(est, on="domain")
    m["est_in_band"] = (
        (m["distinct_est"] - m["exact_distinct"]).abs()
        / m["exact_distinct"] <= 0.06)
    return m[["domain", "exact_distinct", "est_in_band"]]


def q_topk_buckets_per_domain(sf_dir: str):
    """Per-group top-k: each domain's 3 busiest 15-min buckets (crawl
    bursts) — sort-within-group, deterministic (n desc, bucket asc)."""
    t0 = rollup(_series(sf_dir), W15M)

    def _top3(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(g, sort_keys=[("n", "descending"),
                                            ("bucket", "ascending")])
        out = g.take(idx[:3])
        return out.select(["series_id", "bucket", "n"])

    return t0.groupby("series_id").map_groups(_top3, batch_format="pyarrow")


def q_retention_trim_15m(sf_dir: str):
    """Retention policy: drop 15-min buckets older than 3h before the
    newest bucket (age-out filter, SURVEY §2.4 retention row)."""
    from ..stages.retention_policy import apply_retention

    t0 = finalize_mean(rollup(_series(sf_dir), W15M))
    newest = t0.max("bucket")  # tiny driver-side aggregate
    return apply_retention(t0, int(newest) + W15M, 3 * W1H + W15M)


def q_gapfill_15m(sf_dir: str):
    """Rollup + explicit gap rows (n=0) on the 15-min tier."""
    t0 = rollup(_series(sf_dir), W15M)
    filled = gapfill(t0, W15M, value_cols=(), fill="zero")
    return filled.select_columns(["series_id", "bucket", "n", "is_gap"])


def q_compress_roundtrip_15m(sf_dir: str):
    """Rollup -> Gorilla chunk compression (actor pool) -> decompression.

    The oracle is the plain rollup SQL: passing proves the codec is
    lossless end-to-end inside the pipeline.
    """
    t0 = finalize_mean(rollup(_series(sf_dir), W15M))
    comp = t0.map_batches(ChunkCompressor, batch_format="pyarrow", concurrency=(1, 8))
    return comp.map_batches(ChunkDecompressor, batch_format="pyarrow", concurrency=(1, 8))


def q_compaction_roundtrip_15m(sf_dir: str):
    """Chunk-store compaction (``stages/compress.py:compact_chunks``):
    the tier is deliberately chunked SMALL (64-point runs -> many chunks
    per series), compacted to 4096-point canonical chunks via one
    hash(series) shuffle, then decoded — the oracle is the plain rollup
    SQL, so passing proves compaction is lossless end to end."""
    from ..stages.compress import compact_chunks, compress_chunks_per_series

    t0 = finalize_mean(rollup(_series(sf_dir), W15M))
    small = compress_chunks_per_series(t0, chunk_size=64)
    compacted = compact_chunks(small, chunk_size=4096, num_partitions=4)
    return compacted.map_batches(ChunkDecompressor,
                                 batch_format="pyarrow",
                                 concurrency=(1, 4))


# ---------------------------------------------------------------------------
# events windowed aggregates
# ---------------------------------------------------------------------------

def _events_series(sf_dir: str, cols=("event_type", "ts", "value")):
    rd = _rd()
    ds = _read_parquet_clean(f"{sf_dir}/events.parquet", columns=list(cols))

    def _prep(b: pa.Table) -> pa.Table:
        out = {c: b[c] for c in b.column_names if c != "ts"}
        out["ts_us"] = b["ts"].cast(pa.int64())
        return pa.table(out)

    return ds.map_batches(_prep, batch_format="pyarrow")


def q_window_events_1h(sf_dir: str):
    ds = _events_series(sf_dir)
    agg = rollup(ds, W1H, series_col="event_type", x_col="ts_us", y_col="value")

    def _fin(b: pa.Table) -> pa.Table:
        # 2-decimal doubles -> exact integer cents (order-independent)
        cents = pc.round(pc.multiply(b["sum_y"], 100.0), ndigits=0)
        return pa.table({
            "event_type": b["series_id"],
            "bucket": b["bucket"],
            "min_v": b["min_y"],
            "max_v": b["max_y"],
            "n": b["n"],
            "sum_cents": pc.cast(cents, pa.int64()),
        })

    return agg.map_batches(_fin, batch_format="pyarrow")


def q_sliding_events_1h_15m(sf_dir: str):
    """Hopping window: 1h windows every 15min over events by type."""
    from ..stages.windows import sliding_rollup

    ds = _events_series(sf_dir)
    agg = sliding_rollup(ds, W1H, W15M, series_col="event_type",
                         x_col="ts_us", y_col="value")

    def _fin(b: pa.Table) -> pa.Table:
        cents = pc.round(pc.multiply(b["sum_y"], 100.0), ndigits=0)
        return pa.table({
            "event_type": b["series_id"],
            "bucket": b["bucket"],
            "min_v": b["min_y"],
            "max_v": b["max_y"],
            "n": b["n"],
            "sum_cents": pc.cast(cents, pa.int64()),
        })

    return agg.map_batches(_fin, batch_format="pyarrow")


def q_sessions_users(sf_dir: str):
    """Session windows per user (30-min inactivity gap)."""
    from ..stages.windows import sessionize

    rd = _rd()
    ds = _read_parquet_clean(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id"])

    def _prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b["user_id"],
            "ts_us": b["ts"].cast(pa.int64()),
            "event_id": b["event_id"],
        })

    prepped = ds.map_batches(_prep, batch_format="pyarrow")
    return sessionize(prepped, 30 * 60 * US, series_col="user_id",
                      x_col="ts_us", id_col="event_id")


def q_rolling_stats_events(sf_dir: str):
    """Trailing 4-row window stats per event_type series (ROWS BETWEEN 3
    PRECEDING AND CURRENT ROW), ordered by (ts, event_id) — one hash
    shuffle then one vectorized pass per partition."""
    from ..stages.windows import rolling_stats

    ds = _events_cents(sf_dir)
    # num_partitions sized to the series cardinality (4 event types): the
    # dense-part-code contract needs #series >> partitions or sort reducers
    # emit schema-less empty blocks
    return rolling_stats(ds, 4, series_col="event_type", x_col="ts_us",
                         y_col="cents", id_col="event_id", num_partitions=2)


ROLLING_STATS_SQL = """
WITH e AS (
    SELECT event_type, event_id, epoch_us(ts) AS ts_us,
           CAST(round(value * 100) AS BIGINT) AS cents
    FROM events
)
SELECT event_type, ts_us, event_id,
       min(cents) OVER w AS roll_min,
       max(cents) OVER w AS roll_max,
       CAST(sum(cents) OVER w AS BIGINT) AS roll_sum,
       count(*) OVER w AS roll_n,
       CAST(sum(cents) OVER w AS DOUBLE) / count(*) OVER w AS roll_mean
FROM e
WINDOW w AS (PARTITION BY event_type ORDER BY ts_us, event_id
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
"""


def q_anomaly_events(sf_dir: str):
    """Trailing-window z-score anomalies per event_type series: flag rows
    more than 3 reference-stddevs from the mean of the 8 preceding rows.
    The z-test is pure integer arithmetic ((n*y-s)^2 > t^2*(n*q-s^2)), so
    the flag column itself is hash-exact against the SQL window replay."""
    from ..stages.windows import detect_anomalies

    ds = _events_cents(sf_dir)
    return detect_anomalies(ds, 8, 3, series_col="event_type",
                            x_col="ts_us", y_col="cents",
                            id_col="event_id", num_partitions=2)


ANOMALY_SQL = """
WITH e AS (
    SELECT event_type, event_id, epoch_us(ts) AS ts_us,
           CAST(round(value * 100) AS BIGINT) AS cents
    FROM events
),
w AS (
    SELECT event_type, ts_us, event_id, cents,
           count(*) OVER wref AS ref_n,
           CAST(COALESCE(sum(cents) OVER wref, 0) AS BIGINT) AS ref_sum,
           CAST(COALESCE(sum(cents * cents) OVER wref, 0) AS BIGINT)
               AS ref_sumsq
    FROM e
    WINDOW wref AS (PARTITION BY event_type ORDER BY ts_us, event_id
                    ROWS BETWEEN 8 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, ts_us, event_id, cents, ref_n, ref_sum, ref_sumsq,
       (ref_n >= 2 AND
        (ref_n * cents - ref_sum) * (ref_n * cents - ref_sum)
          > 9 * (ref_n * ref_sumsq - ref_sum * ref_sum)) AS is_anomaly
FROM w
"""


def _events_cents(sf_dir: str, *, nan_every: int | None = None):
    """events + ``cents = round(value*100)``: int64, or float64 with NaN
    injected at ``event_id % nan_every == 0`` (the NaN-policy test fixture;
    deterministic and SQL-restatable). Integer cents keep every bucket sum
    EXACT, so kernel-vs-SQL float arithmetic is bit-identical."""
    ds = _events_series(sf_dir, cols=("event_id", "event_type", "ts", "value"))

    def _cents(b: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(b["value"], 100.0), ndigits=0),
                        pa.int64())
        if nan_every is not None:
            import numpy as _np

            v = cents.to_numpy(zero_copy_only=False).astype(_np.float64)
            eid = b["event_id"].to_numpy(zero_copy_only=False)
            v = v.copy()
            v[eid % nan_every == 0] = _np.nan
            cents = pa.array(v)
        return pa.table({"event_type": b["event_type"],
                         "event_id": b["event_id"],
                         "ts_us": b["ts_us"], "cents": cents})

    return ds.map_batches(_cents, batch_format="pyarrow")


def _downsample_events(sf_dir: str, kernel: str, n_out: int, *,
                       y_col: str = "value", nan_every: int | None = None,
                       out_cols=("event_type", "event_id", "value")):
    """Per-event_type series (sorted by ts,event_id), no-x kernel over
    ``y_col``; returns the selected original rows."""
    if y_col == "cents":
        ds = _events_cents(sf_dir, nan_every=nan_every)
    else:
        ds = _events_series(sf_dir,
                            cols=("event_id", "event_type", "ts", "value"))

    def _group(tbl: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            tbl, sort_keys=[("ts_us", "ascending"), ("event_id", "ascending")]
        )
        tbl = tbl.take(idx)
        out = downsample_table(tbl, kernel, n_out, x_col=None, y_col=y_col,
                               presorted=True)
        return out.select(list(out_cols))

    return ds.groupby("event_type").map_groups(_group, batch_format="pyarrow")


def q_minmax_events(sf_dir: str):
    return _downsample_events(sf_dir, "minmax", 20)


def _minmax_nox_sql(n_bins: int) -> str:
    """The no-x MinMax oracle (first-occurrence ties, equidistant index
    bins) parameterized over the bin count — the building block for the
    LOD pyramid levels; ``n_bins=10`` is textually identical to the
    ``minmax_events`` oracle."""
    nb = int(n_bins)
    return f"""
        WITH s AS MATERIALIZED (
            SELECT event_type, event_id, value,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY ts, event_id) - 1 AS rn,
                   count(*) OVER (PARTITION BY event_type) AS cnt
            FROM events
        ),
        binned AS MATERIALIZED (
            SELECT s.*, b.i,
                   CASE WHEN b.i = 0 THEN 0
                        ELSE CAST(FLOOR(b.i * ((s.cnt - 1.0) / {nb})) AS BIGINT) + 1
                   END AS lo,
                   CASE WHEN b.i = {nb - 1} THEN s.cnt
                        ELSE CAST(FLOOR((b.i + 1) * ((s.cnt - 1.0) / {nb})) AS BIGINT) + 1
                   END AS hi
            FROM s JOIN generate_series(0, {nb - 1}) b(i) ON TRUE
        ),
        inbin AS MATERIALIZED (SELECT * FROM binned WHERE rn >= lo AND rn < hi),
        ext AS MATERIALIZED (
            SELECT event_type, i,
                   min(value) AS mn, max(value) AS mx
            FROM inbin GROUP BY 1, 2
        ),
        sel AS (
            SELECT ib.event_type,
                   min(ib.rn) FILTER (WHERE ib.value = e.mn) AS rn_min,
                   min(ib.rn) FILTER (WHERE ib.value = e.mx) AS rn_max
            FROM inbin ib JOIN ext e ON ib.event_type = e.event_type AND ib.i = e.i
            GROUP BY ib.event_type, ib.i
        ),
        picked AS (
            SELECT event_type, rn_min AS rn FROM sel
            UNION
            SELECT event_type, rn_max AS rn FROM sel
        )
        SELECT s.event_type, s.event_id, s.value
        FROM s JOIN picked p ON s.event_type = p.event_type AND s.rn = p.rn
    """


_LOD_LEVELS = ((0, 100), (1, 20), (2, 4))  # (level, n_out); bins = n_out/2


def q_lod_pyramid_events(sf_dir: str):
    """The reference's flagship interactive-zoom use case as one
    pipeline: MinMax downsample of every series at three zoom levels
    (n_out 100/20/4), unioned with a ``level`` column — the
    level-of-detail pyramid a plotting front-end pages through. Each
    level is an independent streamed downsample; the union is lazy."""
    out = None
    for lvl, n_out in _LOD_LEVELS:
        ds = _downsample_events(sf_dir, "minmax", n_out)

        def _tag(b: pa.Table, _lvl=lvl) -> pa.Table:
            return pa.table({
                "level": pa.array(np.full(b.num_rows, _lvl, np.int64)),
                "event_type": b["event_type"],
                "event_id": b["event_id"],
                "value": b["value"],
            })

        tagged = ds.map_batches(_tag, batch_format="pyarrow")
        out = tagged if out is None else out.union(tagged)
    return out


def _lod_pyramid_sql() -> str:
    parts = [f"SELECT CAST({lvl} AS BIGINT) AS level, * "
             f"FROM ({_minmax_nox_sql(n // 2)})"
             for lvl, n in _LOD_LEVELS]
    return " UNION ALL ".join(parts)


def q_m4_events(sf_dir: str):
    return _downsample_events(sf_dir, "m4", 20)


def q_lttb_events(sf_dir: str):
    """LTTB over integer cents (exact bucket means -> the SQL oracle's
    recursive bucket-loop replay is bit-identical)."""
    return _downsample_events(sf_dir, "lttb", 50, y_col="cents",
                              out_cols=("event_type", "event_id", "cents"))


def q_lttb_events_gapped_midpoint(sf_dir: str, n_out: int = 40):
    """LTTB WITH x over a GAPPED series using the shipped Rust binary's
    bucket-x *midpoint* semantics (``lttb.rs:46-50``, exposed as
    ``lttb(..., bucket_x="midpoint")``) — the one input regime where the
    reference's Rust kernel and its Python oracle diverge (the compliance
    suite only certifies equidistant x). Keep only days with
    ``day % 9 < 4`` (5-day holes ≫ bucket width); x = rebased epoch-us so
    f64 arithmetic is pinned-IEEE on both sides."""
    day = 86_400_000_000
    ds = _events_cents(sf_dir)

    def _gap_filter(b: pa.Table) -> pa.Table:
        d = pc.divide(b["ts_us"], day)
        keep = pc.less(pc.subtract(d, pc.multiply(pc.divide(d, 9), 9)), 4)
        return b.filter(keep)

    gappy = ds.map_batches(_gap_filter, batch_format="pyarrow")

    def _group(tbl: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            tbl, sort_keys=[("ts_us", "ascending"), ("event_id", "ascending")]
        )
        tbl = tbl.take(idx)
        tbl = tbl.append_column("x", pc.subtract(tbl["ts_us"], _XBASE))
        out = downsample_table(tbl, "lttb", n_out, x_col="x", y_col="cents",
                               presorted=True, bucket_x="midpoint")
        return out.select(["event_type", "event_id", "cents"])

    return gappy.groupby("event_type").map_groups(_group,
                                                  batch_format="pyarrow")


def _lttb_gapped_midpoint_sql(n_out: int) -> str:
    """Exact oracle for the gapped-x midpoint LTTB: same recursive
    bucket-loop replay, next-bucket x = (last + first) / 2."""
    return f"""
WITH RECURSIVE s0 AS MATERIALIZED (
    SELECT event_type, event_id,
           CAST(round(value * 100) AS BIGINT) AS cy,
           epoch_us(ts) AS ts_us
    FROM events
    WHERE ((epoch_us(ts) // 86400000000) % 9) < 4
),
s AS MATERIALIZED (
    SELECT event_type, event_id, cy,
           ts_us - {_XBASE} AS x,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY ts_us, event_id) - 1 AS rn,
           count(*) OVER (PARTITION BY event_type) AS cnt
    FROM s0
),
sp AS MATERIALIZED (SELECT event_type, rn AS p, x, cy, cnt AS m2 FROM s),
{_lttb_phase2_sql(n_out, "sp", bucket_x="midpoint")},
picked AS (
    SELECT event_type, a AS rn FROM rec
    UNION ALL SELECT event_type, m2 - 1 FROM meta
)
SELECT s.event_type, s.event_id, s.cy AS cents
FROM s JOIN picked p ON s.event_type = p.event_type AND s.rn = p.rn
"""


def q_minmaxlttb_events(sf_dir: str):
    return _downsample_events(sf_dir, "minmaxlttb", 20, y_col="cents",
                              out_cols=("event_type", "event_id", "cents"))


def q_nanminmaxlttb_events(sf_dir: str):
    """NaN-returning MinMaxLTTB: float cents with NaN at event_id%37==0."""
    return _downsample_events(sf_dir, "nanminmaxlttb", 20, y_col="cents",
                              nan_every=37,
                              out_cols=("event_type", "event_id"))


def q_minmax_events_withx(sf_dir: str, n_out: int = 20):
    """MinMax WITH x (timestamps) over a gappy series: keep only days with
    ``day % 9 < 4`` (5-day holes >> bin width), bins equidistant in x-VALUE
    space -> empty bins emit nothing (the reference's gap semantic,
    README.md:99 / searchsorted.rs:118-122) and <=2-point bins pass all
    points through (minmax.rs:199-203). Output shrinks below n_out."""
    day = 86_400_000_000
    ds = _events_cents(sf_dir)

    def _gap_filter(b: pa.Table) -> pa.Table:
        d = pc.divide(b["ts_us"], day)
        keep = pc.less(pc.subtract(d, pc.multiply(pc.divide(d, 9), 9)), 4)
        return b.filter(keep)

    gappy = ds.map_batches(_gap_filter, batch_format="pyarrow")

    def _group(tbl: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            tbl, sort_keys=[("ts_us", "ascending"), ("event_id", "ascending")]
        )
        tbl = tbl.take(idx)
        out = downsample_table(tbl, "minmax", n_out, x_col="ts_us",
                               y_col="cents", presorted=True)
        return out.select(["event_type", "event_id", "cents"])

    return gappy.groupby("event_type").map_groups(_group,
                                                  batch_format="pyarrow")


_XBASE = 1_704_000_000_000_000  # rebase epoch-us x so f64 bucket sums are
# exact (< 2^53) in BOTH the kernel and the SQL replay


def q_minmax_events_dt64bool(sf_dir: str, n_out: int = 20):
    """MinMax end-to-end through the DTYPE-VIEW path: x stays a
    datetime64[us] timestamp column (``view_x`` i64-views it,
    ``downsampling_interface.py:205-227`` parity) and y is a BOOL column
    (``view_y`` i8-views it) — the reference's dtype matrix
    (``downsample_rs`` datetime/bool support) exercised as a driver row
    rather than only the pytest matrix (r4 verdict next-round #8).
    Equidistant x-VALUE bins over the full per-type series; flag =
    value >= 0."""
    ds = _read_parquet_clean(f"{sf_dir}/events.parquet",
                             columns=["event_id", "event_type", "ts",
                                      "value"]).repartition(4)

    def _flag(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": b["event_type"],
            "event_id": b["event_id"],
            "ts": b["ts"],  # KEEP timestamp type — the view under test
            "flag": pc.greater_equal(b["value"], 0.0),
        })

    flagged = ds.map_batches(_flag, batch_format="pyarrow")

    def _group(tbl: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            tbl, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
        tbl = tbl.take(idx)
        out = downsample_table(tbl, "minmax", n_out, x_col="ts",
                               y_col="flag", presorted=True)
        return out.select(["event_type", "event_id", "flag"])

    return flagged.groupby("event_type").map_groups(_group,
                                                    batch_format="pyarrow")


def q_minmaxlttb_bigseries(sf_dir: str, n_out: int = 40):
    """Distributed MinMaxLTTB over ALL events as ONE series spanning many
    blocks (stages/bigseries.py): per-bin partials in map_batches, LTTB
    phase-2 on the gathered preselection. x = rebased timestamp (strictly
    increasing — verified collision-free in this corpus)."""
    rd = _rd()
    ds = _read_parquet_clean(f"{sf_dir}/events.parquet", columns=["ts", "value"])

    def _prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "x": pc.subtract(b["ts"].cast(pa.int64()), _XBASE),
            "cents": pc.cast(pc.round(pc.multiply(b["value"], 100.0),
                                      ndigits=0), pa.int64()),
        })

    from ..stages.bigseries import downsample_big_series

    series = ds.map_batches(_prep, batch_format="pyarrow").repartition(24)
    out = downsample_big_series(series, n_out, x_col="x", y_col="cents",
                                ratio=4)
    return out.set_column(out.column_names.index("cents"), "cents",
                          pc.cast(out["cents"], pa.int64()))


def q_resample_linear_15m(sf_dir: str):
    """Linear-interpolation resample of every event_type series onto the
    uniform 15-minute grid (``stages/resample.py``): ONE hash(series)
    shuffle, one vectorized composite-key searchsorted per partition.
    Duplicate timestamps collapse to the max-event_id row; exact grid
    hits return the sample. DuckDB oracle: two ASOF joins (floor +
    ceiling bracket) with the identical float expression."""
    from ..stages.resample import resample_linear

    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"event_type": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"], "event_id": b["event_id"]})

    ds = ev.map_batches(_series, batch_format="pyarrow")
    return resample_linear(ds, 900 * US, series_col="event_type",
                           x_col="x", y_col="y", id_col="event_id",
                           num_partitions=2)


RESAMPLE_SQL = """
WITH e AS (
    SELECT event_type, epoch_us(ts) AS ts_us,
           CAST(round(value * 100) AS BIGINT) AS cents, event_id
    FROM events
),
s AS (
    SELECT event_type, ts_us, arg_max(cents, event_id) AS cents
    FROM e GROUP BY event_type, ts_us
),
b AS (
    SELECT event_type,
           (min(ts_us) + 899999999) // 900000000 AS lo_k,
           max(ts_us) // 900000000 AS hi_k
    FROM s GROUP BY event_type
),
g AS (
    SELECT event_type, unnest(range(lo_k, hi_k + 1)) * 900000000 AS t_us
    FROM b WHERE hi_k >= lo_k
),
p AS (
    SELECT g.event_type, g.t_us, s.ts_us AS x0, s.cents AS y0
    FROM g ASOF JOIN s
      ON g.event_type = s.event_type AND g.t_us >= s.ts_us
),
nsrc AS (SELECT event_type, -ts_us AS neg_ts, ts_us, cents FROM s),
n AS (
    SELECT g.event_type, g.t_us, nsrc.ts_us AS x1, nsrc.cents AS y1
    FROM g ASOF JOIN nsrc
      ON g.event_type = nsrc.event_type AND -g.t_us >= nsrc.neg_ts
)
SELECT p.event_type, p.t_us,
       CASE WHEN n.x1 = p.x0 THEN CAST(n.y1 AS DOUBLE)
            ELSE CAST(p.y0 AS DOUBLE)
                 + CAST(n.y1 - p.y0 AS DOUBLE)
                   * CAST(p.t_us - p.x0 AS DOUBLE)
                   / CAST(n.x1 - p.x0 AS DOUBLE)
       END AS value
FROM p JOIN n ON p.event_type = n.event_type AND p.t_us = n.t_us
"""


def q_corr_pairs_15m(sf_dir: str):
    """Pairwise Pearson correlation between event_type series over their
    co-populated 15m buckets (``stages/correlate.py``): rollup ->
    hash(bucket) pair expansion -> integer sufficient statistics ->
    pinned-IEEE corr. All-ways exact: the stats are int64 sums."""
    from ..stages.correlate import pairwise_correlation
    from ..stages.rollup import rollup

    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    rolled = rollup(ev.map_batches(_series, batch_format="pyarrow"),
                    900 * US)
    return pairwise_correlation(rolled, num_partitions=2)


CORR_PAIRS_SQL = """
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
      ON a.bucket = b.bucket AND a.event_type < b.event_type
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
       END AS corr
FROM st
"""


def q_spearman_pairs_15m(sf_dir: str):
    """Pairwise SPEARMAN correlation between event_type series
    (``stages/quantiles.py:rank2avg`` + ``correlate.pairwise_correlation``):
    tie-aware 2x-average-rank transform per series (exact int64, one
    hash(series) shuffle), then Pearson over the co-populated buckets of
    the rank values. Rank-once-then-align (the scalable Spearman
    convention; per-pair re-ranking would be O(pairs x buckets)) —
    replayed identically in SQL."""
    from ..stages.correlate import pairwise_correlation
    from ..stages.quantiles import rank2avg
    from ..stages.rollup import rollup

    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    rolled = rollup(ev.map_batches(_series, batch_format="pyarrow"),
                    900 * US)
    ranks = rank2avg(rolled, num_partitions=2)
    return pairwise_correlation(ranks, num_partitions=2)


SPEARMAN_SQL = """
WITH e AS (
    SELECT event_type, epoch_us(ts) AS ts_us,
           CAST(round(value * 100) AS BIGINT) AS cents
    FROM events
),
r AS (
    SELECT event_type, ts_us // 900000000 * 900000000 AS bucket,
           CAST(sum(cents) AS BIGINT) AS v
    FROM e GROUP BY event_type, bucket
),
rk AS (
    SELECT event_type, bucket,
           2 * rank() OVER (PARTITION BY event_type ORDER BY v)
           + count(*) OVER (PARTITION BY event_type, v) - 1 AS s
    FROM r
),
p AS (
    SELECT a.event_type AS s1, b.event_type AS s2, a.s AS x, b.s AS y
    FROM rk a JOIN rk b
      ON a.bucket = b.bucket AND a.event_type < b.event_type
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
       END AS corr
FROM st
"""


def q_profile_events(sf_dir: str):
    """Table profiling / ANALYZE (``stages/profile.py:profile_columns``):
    per-column n / nulls / min / max / exact NDV over the events table in
    one pass — constant-size moment partials plus the standard exact-ndv
    exchange (per-block unique collapse, one hash(column,value)
    shuffle)."""
    from ..stages.profile import profile_columns

    ds = _read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "value"]).repartition(8)

    def _cols(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": b["event_id"], "user_id": b["user_id"],
            "ts_us": pc.cast(b["ts"], pa.int64()),
            "cents": pc.cast(pc.round(pc.multiply(b["value"], 100.0),
                                      ndigits=0), pa.int64()),
        })

    return profile_columns(ds.map_batches(_cols, batch_format="pyarrow"),
                           ["event_id", "user_id", "ts_us", "cents"],
                           num_partitions=4)


PROFILE_SQL = """
WITH e AS (
    SELECT event_id, user_id, epoch_us(ts) AS ts_us,
           CAST(round(value * 100) AS BIGINT) AS cents
    FROM events
)
SELECT 'event_id' AS column, count(*) AS n,
       count(*) - count(event_id) AS n_null,
       min(event_id) AS min_v, max(event_id) AS max_v,
       count(DISTINCT event_id) AS ndv FROM e
UNION ALL
SELECT 'user_id', count(*), count(*) - count(user_id),
       min(user_id), max(user_id), count(DISTINCT user_id) FROM e
UNION ALL
SELECT 'ts_us', count(*), count(*) - count(ts_us),
       min(ts_us), max(ts_us), count(DISTINCT ts_us) FROM e
UNION ALL
SELECT 'cents', count(*), count(*) - count(cents),
       min(cents), max(cents), count(DISTINCT cents) FROM e
"""


def q_state_changes_events(sf_dir: str):
    """State-change compression (``stages/diffing.py:state_changes``):
    per event_type series keep the first event + every value change; the
    kept rows losslessly encode step-function telemetry (``run_len``
    audit sums back to the input row count). One hash(series) shuffle,
    one sorted shift-compare pass. Values are quantized to decicents
    (cents // 10) so runs actually occur."""
    from ..stages.diffing import state_changes

    ds = _read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "event_type", "value"]).repartition(8)

    def _cols(b: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(b["value"], 100.0),
                                 ndigits=0), pa.int64())
        return pa.table({
            "series_id": b["event_type"],
            "ts_us": pc.cast(b["ts"], pa.int64()),
            "event_id": b["event_id"],
            "v": pc.divide(cents, pa.scalar(1000, pa.int64())),
        })

    return state_changes(ds.map_batches(_cols, batch_format="pyarrow"),
                         num_partitions=4)


STATE_CHANGES_SQL = """
WITH e AS (
    SELECT event_type AS series_id, epoch_us(ts) AS ts_us, event_id,
           CAST(round(value * 100) AS BIGINT) // 1000 AS v
    FROM events
),
s AS (
    SELECT *,
           lag(v) OVER w AS prev_v,
           row_number() OVER w AS rk,
           count(*) OVER (PARTITION BY series_id) AS n_rows
    FROM e
    WINDOW w AS (PARTITION BY series_id ORDER BY ts_us, event_id)
),
kept AS (
    SELECT series_id, ts_us, event_id, v, rk, n_rows,
           lead(rk) OVER (PARTITION BY series_id ORDER BY rk) AS next_rk
    FROM s WHERE prev_v IS NULL OR v <> prev_v
)
SELECT series_id, ts_us, event_id, v,
       CAST(COALESCE(next_rk, n_rows + 1) - rk AS BIGINT) AS run_len
FROM kept
"""


def q_kmeans_embeddings(sf_dir: str):
    """Integer Lloyd k-means (k=4, 2 updates) over the embeddings table
    (``stages/similarity.py:kmeans_integer``): trunc-quantized int64
    components, exact integer distances, floor-division centroid
    updates, smallest-id tie-breaks — every iteration replays in SQL
    (unrolled CTEs with DuckDB list arithmetic). Per round: broadcast
    centroids, map-side k x d partial sums, constant-size hashpart
    merge."""
    from ..stages.similarity import kmeans_integer

    ds = _read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding"]).repartition(4)
    return kmeans_integer(ds, k=4, updates=2, scale=1000,
                          num_partitions=4)


def _kmeans_sql(k: int = 4, updates: int = 2, scale: int = 1000,
                dim: int = 64) -> str:
    d2 = ("list_dot_product(q.v, q.v) + list_dot_product(c.v, c.v)"
          " - 2 * list_dot_product(q.v, c.v)")
    ctes = [f"""q AS (
    SELECT vec_id,
           list_transform(embedding,
               x -> CAST(trunc(CAST(x AS DOUBLE) * {scale}) AS BIGINT))
               AS v
    FROM embeddings
)""", f"""c0 AS (SELECT vec_id AS k, v FROM q WHERE vec_id < {k})"""]

    def _assign(name: str, cprev: str) -> str:
        return f"""{name} AS (
    SELECT vec_id, k, d2 FROM (
        SELECT q.vec_id, c.k, CAST({d2} AS BIGINT) AS d2,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY {d2}, c.k) AS rn
        FROM q CROSS JOIN {cprev} c)
    WHERE rn = 1
)"""

    cprev = "c0"
    for it in range(1, updates + 1):
        ctes.append(_assign(f"a{it}", cprev))
        ctes.append(f"""s{it} AS (
    SELECT a.k, r.range AS i, CAST(sum(q.v[r.range]) AS BIGINT) AS s,
           count(*) AS n
    FROM a{it} a JOIN q USING (vec_id) CROSS JOIN range(1, {dim + 1}) r
    GROUP BY a.k, r.range
)""")
        ctes.append(f"""c{it} AS (
    SELECT p.k, list(CASE WHEN s.n IS NULL THEN p.v[r.range]
                          ELSE s.s // s.n END ORDER BY r.range) AS v
    FROM {cprev} p CROSS JOIN range(1, {dim + 1}) r
    LEFT JOIN s{it} s ON s.k = p.k AND s.i = r.range
    GROUP BY p.k
)""")
        cprev = f"c{it}"
    ctes.append(_assign("afinal", cprev))
    joined = ",\n".join(ctes)
    return f"""
WITH {joined}
SELECT vec_id, k AS cluster, d2 FROM afinal
"""


KMEANS_SQL = _kmeans_sql()


def q_ewma_15m(sf_dir: str):
    """Fixed-point EWMA (alpha = 1/8) over the 15m rollup tier
    (``stages/smoothing.py``): integer state, exact replay; the DuckDB
    oracle is a recursive CTE walking each series' buckets in order."""
    from ..stages.rollup import rollup
    from ..stages.smoothing import ewma_fixed_point

    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    rolled = rollup(ev.map_batches(_series, batch_format="pyarrow"),
                    900 * US)
    return ewma_fixed_point(rolled, k=3, num_partitions=2)


EWMA_SQL = """
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
    SELECT series_id, bucket, y, idx, y AS ema
    FROM numbered WHERE idx = 1
    UNION ALL
    SELECT n.series_id, n.bucket, n.y, n.idx,
           r.ema + CAST(floor(CAST(n.y - r.ema AS DOUBLE) / 8.0) AS BIGINT)
    FROM rec r JOIN numbered n
      ON n.series_id = r.series_id AND n.idx = r.idx + 1
)
SELECT series_id, bucket, y, ema FROM rec
"""


def q_interarrival_quantiles_events(sf_dir: str):
    """Composite: per-series inter-arrival deltas
    (``stages/rate.py:series_diffs``) -> exact p50/p90/p99
    (``stages/quantiles.py``) — the crawl-politeness / sampling-cadence
    audit. Two hash(series) shuffles (a composite of two one-shuffle
    operators)."""
    from ..stages.quantiles import exact_quantiles
    from ..stages.rate import series_diffs

    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "event_id": b["event_id"]})

    ds = ev.map_batches(_series, batch_format="pyarrow")
    diffs = series_diffs(ds, tiebreak_col="event_id", num_partitions=2)
    return exact_quantiles(diffs, probs=(50, 90, 99), order_col="x",
                           value_col="delta", num_partitions=2)


INTERARRIVAL_SQL = """
WITH e AS (
    SELECT event_type AS series_id, event_id, epoch_us(ts) AS ts_us
    FROM events
),
d AS (
    SELECT series_id, ts_us AS x,
           ts_us - lag(ts_us) OVER (PARTITION BY series_id
                                    ORDER BY ts_us, event_id) AS delta
    FROM e
),
f AS (SELECT * FROM d WHERE delta IS NOT NULL),
o AS (
    SELECT series_id, delta,
           row_number() OVER (PARTITION BY series_id
                              ORDER BY delta, x) - 1 AS rk,
           count(*) OVER (PARTITION BY series_id) AS n
    FROM f
)
SELECT series_id, CAST(max(n) AS BIGINT) AS n,
       max(CASE WHEN rk = (n - 1) * 50 // 100 THEN delta END) AS p50,
       max(CASE WHEN rk = (n - 1) * 90 // 100 THEN delta END) AS p90,
       max(CASE WHEN rk = (n - 1) * 99 // 100 THEN delta END) AS p99
FROM o GROUP BY series_id
"""


def q_threshold_crossings_events(sf_dir: str):
    """Alerting primitive (``stages/rate.py:threshold_crossings``): one
    row per 50.00-threshold crossing of each event_type series, with
    direction (1 = fire, -1 = recover). Cross-block predecessors via ONE
    hash(series) shuffle; the SQL oracle is a lag() window replay."""
    from ..stages.rate import threshold_crossings

    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"], "event_id": b["event_id"]})

    ds = ev.map_batches(_series, batch_format="pyarrow")
    return threshold_crossings(ds, 5000, tiebreak_col="event_id",
                               num_partitions=2)


THRESHOLD_CROSSINGS_SQL = """
WITH e AS (
    SELECT event_type AS series_id, event_id, epoch_us(ts) AS ts_us,
           CAST(round(value * 100) AS BIGINT) AS cents
    FROM events
),
o AS (
    SELECT series_id, ts_us AS x, cents AS y,
           lag(cents) OVER (PARTITION BY series_id
                            ORDER BY ts_us, event_id) AS prev
    FROM e
)
SELECT series_id, x, y,
       CAST(CASE WHEN prev < 5000 THEN 1 ELSE -1 END AS BIGINT) AS direction
FROM o
WHERE prev IS NOT NULL
  AND ((prev < 5000 AND y >= 5000) OR (prev >= 5000 AND y < 5000))
"""


def q_twa_events_1h(sf_dir: str):
    """Time-weighted average per (event_type, 1h bucket)
    (``stages/twa.py``): step-hold integral in exact int64
    cents-microseconds; one hash(series) shuffle. DuckDB oracle: lead()
    spans exploded over their overlapped buckets."""
    from ..stages.twa import time_weighted_avg

    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"], "event_id": b["event_id"]})

    ds = ev.map_batches(_series, batch_format="pyarrow")
    return time_weighted_avg(ds, 3600 * US, id_col="event_id",
                             num_partitions=2)


TWA_SQL = """
WITH e AS (
    SELECT event_type AS series_id, event_id, epoch_us(ts) AS ts_us,
           CAST(round(value * 100) AS BIGINT) AS cents
    FROM events
),
o AS (
    SELECT series_id, ts_us AS t0, cents AS v,
           lead(ts_us) OVER (PARTITION BY series_id
                             ORDER BY ts_us, event_id) AS t1
    FROM e
),
spans AS (SELECT * FROM o WHERE t1 IS NOT NULL AND t1 > t0),
pieces AS (
    SELECT series_id, v,
           k * 3600000000 AS bucket,
           greatest(t0, k * 3600000000) AS lo,
           least(t1, (k + 1) * 3600000000) AS hi
    FROM spans,
         unnest(range(t0 // 3600000000, (t1 - 1) // 3600000000 + 1)) r(k)
)
SELECT series_id, bucket,
       CAST(sum(v * (hi - lo)) AS BIGINT) AS num,
       CAST(sum(hi - lo) AS BIGINT) AS den,
       CAST(sum(v * (hi - lo)) AS DOUBLE) / CAST(sum(hi - lo) AS DOUBLE)
         AS twa
FROM pieces GROUP BY series_id, bucket
"""


def q_exact_quantiles_15m(sf_dir: str):
    """Exact per-series p50/p90/p99 over the 15m tier's bucket sums
    (``stages/quantiles.py``): one hash(series) shuffle, one sorted
    vectorized segment pass — the exact companion to
    ``hist_quantiles_1h``'s mergeable sketch."""
    from ..stages.quantiles import exact_quantiles
    from ..stages.rollup import rollup

    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    rolled = rollup(ev.map_batches(_series, batch_format="pyarrow"),
                    900 * US)
    return exact_quantiles(rolled, probs=(50, 90, 99), num_partitions=2)


EXACT_QUANTILES_SQL = """
WITH r AS (
    SELECT event_type AS series_id,
           epoch_us(ts) // 900000000 * 900000000 AS bucket,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s
    FROM events GROUP BY series_id, bucket
),
o AS (
    SELECT series_id, s,
           row_number() OVER (PARTITION BY series_id
                              ORDER BY s, bucket) - 1 AS rk,
           count(*) OVER (PARTITION BY series_id) AS n
    FROM r
)
SELECT series_id, CAST(max(n) AS BIGINT) AS n,
       max(CASE WHEN rk = (n - 1) * 50 // 100 THEN s END) AS p50,
       max(CASE WHEN rk = (n - 1) * 90 // 100 THEN s END) AS p90,
       max(CASE WHEN rk = (n - 1) * 99 // 100 THEN s END) AS p99
FROM o GROUP BY series_id
"""


def q_seasonal_hod_events(sf_dir: str):
    """Hour-of-day seasonal baseline (``stages/seasonal.py``): build the
    per-(event_type, hod) integer profile, broadcast it once (``ray.put``,
    the brief's small-side pattern), flag events whose cents fail the
    pure-integer z-test against their slot's population. No shuffle of
    the event stream at all."""
    import ray as _ray

    from ..stages.seasonal import seasonal_anomalies, seasonal_profile

    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"],
                         "event_id": b["event_id"],
                         "x": b["ts_us"], "y": b["cents"]})

    ds = ev.map_batches(_series, batch_format="pyarrow")
    prof_refs = seasonal_profile(ds).to_arrow_refs()
    profile = pa.concat_tables([_ray.get(r) for r in prof_refs])
    return seasonal_anomalies(ds, profile, id_col="event_id", threshold=3)


SEASONAL_HOD_SQL = """
WITH e AS (
    SELECT event_type AS series_id, event_id, epoch_us(ts) AS ts_us,
           CAST(round(value * 100) AS BIGINT) AS cents
    FROM events
),
h AS (
    SELECT series_id, event_id, (ts_us // 3600000000) % 24 AS slot, cents
    FROM e
),
p AS (
    SELECT series_id, slot, count(*) AS n,
           CAST(sum(cents) AS BIGINT) AS s,
           CAST(sum(cents * cents) AS BIGINT) AS q
    FROM h GROUP BY series_id, slot
)
SELECT h.series_id, h.event_id, h.slot, h.cents AS y,
       p.n AS slot_n, p.s AS slot_sum,
       (p.n >= 2 AND
        (p.n * h.cents - p.s) * (p.n * h.cents - p.s)
          > 9 * (p.n * p.q - p.s * p.s)) AS is_anomaly
FROM h JOIN p USING (series_id, slot)
"""


def q_asof_enrich_events(sf_dir: str):
    """As-of join (``stages/joins.py``): enrich every event with its
    type's last CLOSED hourly aggregate — right rows become available at
    ``bucket + 1h``, so the match is the latest window that finished
    at-or-before the event (the stream-enrichment pattern; DuckDB native
    ``ASOF LEFT JOIN`` is the oracle). One hash shuffle; no per-key
    Python, no broadcast."""
    US_H = 3_600_000_000
    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    from ..stages.joins import asof_join
    from ..stages.rollup import rollup

    hourly = rollup(ev.map_batches(_series, batch_format="pyarrow"), US_H)

    def _avail(b: pa.Table) -> pa.Table:
        return pa.table({
            "series_id": b["series_id"],
            "avail_us": pc.add(b["bucket"], US_H),
            "hr_sum": b["sum_y"], "hr_n": b["n"],
        })

    right = hourly.map_batches(_avail, batch_format="pyarrow")

    def _left(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"],
                         "event_id": b["event_id"],
                         "ts_us": b["ts_us"], "cents": b["cents"]})

    left = ev.map_batches(_left, batch_format="pyarrow")
    joined = asof_join(left, right, on="series_id", left_x="ts_us",
                       right_x="avail_us", right_cols=["hr_sum", "hr_n"],
                       num_partitions=8)

    def _project(b: pa.Table) -> pa.Table:
        return pa.table({"event_type": b["series_id"],
                         "event_id": b["event_id"],
                         "cents": b["cents"],
                         "hr_sum": b["hr_sum"], "hr_n": b["hr_n"]})

    return joined.map_batches(_project, batch_format="pyarrow")


ASOF_ENRICH_SQL = """
WITH ev AS (
    SELECT event_type, event_id, epoch_us(ts) AS ts_us,
           CAST(round(value * 100) AS BIGINT) AS cents
    FROM events
),
h AS (
    SELECT event_type,
           (ts_us // 3600000000) * 3600000000 AS bucket,
           CAST(sum(cents) AS BIGINT) AS hr_sum, count(*) AS hr_n
    FROM ev GROUP BY 1, 2
),
r AS (SELECT event_type, bucket + 3600000000 AS avail_us, hr_sum, hr_n
      FROM h)
SELECT e.event_type, e.event_id, e.cents, r.hr_sum, r.hr_n
FROM ev e
ASOF LEFT JOIN r
  ON e.event_type = r.event_type AND e.ts_us >= r.avail_us
"""


def q_hist_quantiles_1h(sf_dir: str):
    """Histogram rollup + p50/p95/p99 per (event_type, hour)
    (``stages/histogram.py``): deterministic fixed-bin sketch, mergeable
    by count addition, quantile = upper edge of the first bin reaching
    rank ceil(n*p/100) — every step SQL-replayable bit-for-bit."""
    US_H = 3_600_000_000
    BINS, LO, HI = 40, -400.0, 400.0
    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": pc.cast(b["cents"], pa.float64())})

    from ..stages.histogram import histogram_quantiles, histogram_rollup

    hist = histogram_rollup(ev.map_batches(_series, batch_format="pyarrow"),
                            US_H, bins=BINS, lo=LO, hi=HI, num_partitions=8)
    q = histogram_quantiles(hist, bins=BINS, lo=LO, hi=HI,
                            percentiles=(50, 95, 99))

    def _rename(b: pa.Table) -> pa.Table:
        return b.rename_columns(
            ["event_type"] + b.column_names[1:])

    return q.map_batches(_rename, batch_format="pyarrow")


HIST_QUANTILES_SQL = """
WITH ev AS (
    SELECT event_type, epoch_us(ts) AS ts_us,
           CAST(round(value * 100) AS BIGINT) AS cents
    FROM events
),
hb AS (
    SELECT event_type, (ts_us // 3600000000) * 3600000000 AS bucket,
           CAST(least(39, greatest(0,
               floor((CAST(cents AS DOUBLE) - (-400.0)) / 20.0)))
               AS BIGINT) AS bin,
           count(*) AS c
    FROM ev GROUP BY 1, 2, 3
),
tot AS (SELECT event_type, bucket, sum(c) AS n FROM hb GROUP BY 1, 2),
cum AS (
    SELECT event_type, bucket, bin,
           sum(c) OVER (PARTITION BY event_type, bucket
                        ORDER BY bin) AS cum
    FROM hb
),
q AS (
    SELECT c.event_type, c.bucket,
           any_value(t.n) AS n,
           min(c.bin) FILTER (WHERE c.cum >= (t.n * 50 + 99) // 100) AS b50,
           min(c.bin) FILTER (WHERE c.cum >= (t.n * 95 + 99) // 100) AS b95,
           min(c.bin) FILTER (WHERE c.cum >= (t.n * 99 + 99) // 100) AS b99
    FROM cum c JOIN tot t USING (event_type, bucket)
    GROUP BY 1, 2
)
SELECT event_type, bucket, CAST(n AS BIGINT) AS n,
       -400.0 + (b50 + 1) * 20.0 AS p50,
       -400.0 + (b95 + 1) * 20.0 AS p95,
       -400.0 + (b99 + 1) * 20.0 AS p99
FROM q
"""


def q_counter_rate_1h(sf_dir: str):
    """PromQL-style counter rate per (event_type, hour)
    (``stages/rate.py``): per-point increase with counter-reset handling
    (y < prev -> the new value counts whole), summed per window; rate =
    increase / 3600 s. Cross-row lag across block AND window boundaries —
    one hash(series) shuffle, vectorized per partition."""
    US_H = 3_600_000_000
    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"], "event_id": b["event_id"]})

    from ..stages.rate import counter_rate

    out = counter_rate(ev.map_batches(_series, batch_format="pyarrow"),
                       US_H, tiebreak_col="event_id", num_partitions=8)

    def _rename(b: pa.Table) -> pa.Table:
        return b.rename_columns(["event_type"] + b.column_names[1:])

    return out.map_batches(_rename, batch_format="pyarrow")


COUNTER_RATE_SQL = """
WITH ev AS (
    SELECT event_type, event_id, epoch_us(ts) AS ts_us,
           CAST(round(value * 100) AS BIGINT) AS cents
    FROM events
),
d AS (
    SELECT event_type, ts_us, cents,
           lag(cents) OVER (PARTITION BY event_type
                            ORDER BY ts_us, event_id) AS prev
    FROM ev
),
i AS (
    SELECT event_type, (ts_us // 3600000000) * 3600000000 AS bucket,
           CASE WHEN prev IS NULL THEN NULL
                WHEN cents >= prev THEN cents - prev
                ELSE cents END AS inc
    FROM d
)
SELECT event_type, bucket, CAST(sum(inc) AS BIGINT) AS increase,
       count(inc) AS n_incr,
       CAST(sum(inc) AS DOUBLE) / 3600.0 AS rate
FROM i WHERE inc IS NOT NULL GROUP BY 1, 2
"""


def q_orders_by_nation_broadcast(sf_dir: str):
    """Dimension enrichment via the SMALL-SIDE BROADCAST pattern
    (``stages/broadcast.py``): the customer->nation lookup (tiny) is
    pre-joined on the driver, ``ray.put`` once, and every orders batch
    does an in-batch Arrow hash join — the large side never shuffles.
    Revenue per nation via ``grouped_sum`` map-side partials."""
    import pyarrow.parquet as pq

    from ..stages.broadcast import broadcast_lookup_join
    from ..stages.rollup import grouped_sum

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
    from ..stages.rollup import grouped_sum

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
    from ..stages.joins import asof_join
    from ..stages.windows import sessionize

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


def q_minmax_bigseries(sf_dir: str, n_out: int = 40):
    """Distributed FULL-RANGE MinMax over ALL events as ONE series spanning
    many blocks (``stages/bigseries.py`` kernel="minmax" — the Ray analog
    of the reference's parallel per-bin MinMax, minmax.rs:139-179): per-bin
    partial candidates in map_batches, associative groupby("bin") merge,
    with-x bin semantics (searchsorted-over-linspace, tiny-bin passthrough,
    first-occurrence ties)."""
    rd = _rd()
    ds = _read_parquet_clean(f"{sf_dir}/events.parquet", columns=["ts", "value"])

    def _prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "x": pc.subtract(b["ts"].cast(pa.int64()), _XBASE),
            "cents": pc.cast(pc.round(pc.multiply(b["value"], 100.0),
                                      ndigits=0), pa.int64()),
        })

    from ..stages.bigseries import downsample_big_series

    series = ds.map_batches(_prep, batch_format="pyarrow").repartition(24)
    out = downsample_big_series(series, n_out, kernel="minmax",
                                x_col="x", y_col="cents")
    return out.set_column(out.column_names.index("cents"), "cents",
                          pc.cast(out["cents"], pa.int64()))


def q_m4_bigseries(sf_dir: str, n_out: int = 40):
    """Distributed FULL-RANGE M4 over ALL events as ONE series
    (``stages/bigseries.py`` kernel="m4" — the reference's parallel per-bin
    M4, m4.rs:145-187): first/argmin/argmax/last per x-value bin,
    duplicates retained, <=4-point passthrough."""
    rd = _rd()
    ds = _read_parquet_clean(f"{sf_dir}/events.parquet", columns=["ts", "value"])

    def _prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "x": pc.subtract(b["ts"].cast(pa.int64()), _XBASE),
            "cents": pc.cast(pc.round(pc.multiply(b["value"], 100.0),
                                      ndigits=0), pa.int64()),
        })

    from ..stages.bigseries import downsample_big_series

    series = ds.map_batches(_prep, batch_format="pyarrow").repartition(24)
    out = downsample_big_series(series, n_out, kernel="m4",
                                x_col="x", y_col="cents")
    return out.set_column(out.column_names.index("cents"), "cents",
                          pc.cast(out["cents"], pa.int64()))


def _m4_bigseries_sql(n_out: int) -> str:
    """Full-range with-x M4 over the single all-events series: per bin
    emit first / argmin / argmax / last (duplicates RETAINED — UNION ALL),
    <=4-point passthrough, first-occurrence ties via min(rn)."""
    nb = n_out // 4
    return f"""
WITH e AS (
    SELECT epoch_us(ts) - {_XBASE} AS x,
           CAST(round(value * 100) AS BIGINT) AS cy
    FROM events
),
s AS MATERIALIZED (
    SELECT x, cy, row_number() OVER (ORDER BY x) - 1 AS rn,
           min(x) OVER () AS x0, max(x) OVER () AS xn
    FROM e
),
assigned AS MATERIALIZED (
    SELECT s.x, s.cy, s.rn, count(k.k) AS bin
    FROM s LEFT JOIN generate_series(1, {nb - 1}) k(k)
      ON CAST(s.x0 AS DOUBLE)
         + k.k * ((CAST(s.xn AS DOUBLE) - CAST(s.x0 AS DOUBLE)) / {nb}.0)
         < CAST(s.x AS DOUBLE)
    GROUP BY ALL
),
ext AS MATERIALIZED (
    SELECT bin, count(*) AS nbin, min(cy) AS mn, max(cy) AS mx,
           min(rn) AS rn_first, max(rn) AS rn_last
    FROM assigned GROUP BY 1
),
sel AS (
    SELECT a.bin, any_value(e.rn_first) AS rn_first,
           any_value(e.rn_last) AS rn_last,
           min(a.rn) FILTER (WHERE a.cy = e.mn) AS rn_min,
           min(a.rn) FILTER (WHERE a.cy = e.mx) AS rn_max
    FROM assigned a JOIN ext e USING (bin)
    WHERE e.nbin > 4
    GROUP BY 1
),
picked AS (
    SELECT rn_first AS rn FROM sel
    UNION ALL SELECT least(rn_min, rn_max) FROM sel
    UNION ALL SELECT greatest(rn_min, rn_max) FROM sel
    UNION ALL SELECT rn_last FROM sel
    UNION ALL SELECT a.rn FROM assigned a JOIN ext e USING (bin)
              WHERE e.nbin <= 4
)
SELECT a.x, a.cy AS cents
FROM assigned a JOIN picked p ON a.rn = p.rn
"""


def _minmax_bigseries_sql(n_out: int) -> str:
    """Full-range with-x MinMax over the single all-events series: bin
    assignment by boundary counts (a point ON boundary k belongs to bin
    k-1 — the searchsorted side='right' index-boundary semantic), <=2-point
    passthrough, first-occurrence ties via min(rn), np.unique via UNION."""
    nb = n_out // 2
    return f"""
WITH e AS (
    SELECT epoch_us(ts) - {_XBASE} AS x,
           CAST(round(value * 100) AS BIGINT) AS cy
    FROM events
),
s AS MATERIALIZED (
    SELECT x, cy, row_number() OVER (ORDER BY x) - 1 AS rn,
           min(x) OVER () AS x0, max(x) OVER () AS xn
    FROM e
),
assigned AS MATERIALIZED (
    SELECT s.x, s.cy, s.rn, count(k.k) AS bin
    FROM s LEFT JOIN generate_series(1, {nb - 1}) k(k)
      ON CAST(s.x0 AS DOUBLE)
         + k.k * ((CAST(s.xn AS DOUBLE) - CAST(s.x0 AS DOUBLE)) / {nb}.0)
         < CAST(s.x AS DOUBLE)
    GROUP BY ALL
),
ext AS MATERIALIZED (
    SELECT bin, count(*) AS nbin, min(cy) AS mn, max(cy) AS mx
    FROM assigned GROUP BY 1
),
sel AS (
    SELECT a.bin,
           min(a.rn) FILTER (WHERE a.cy = e.mn) AS rn_min,
           min(a.rn) FILTER (WHERE a.cy = e.mx) AS rn_max
    FROM assigned a JOIN ext e USING (bin)
    WHERE e.nbin > 2
    GROUP BY 1
),
picked AS (
    SELECT rn_min AS rn FROM sel
    UNION SELECT rn_max FROM sel
    UNION SELECT a.rn FROM assigned a JOIN ext e USING (bin)
          WHERE e.nbin <= 2
)
SELECT a.x, a.cy AS cents
FROM assigned a JOIN picked p ON a.rn = p.rn
"""


def _bigseries_sql(n_out: int, ratio: int) -> str:
    """The big-series path's oracle: with-x MinMax pairs over the interior
    (x-value bins via boundary counts, tiny-bin passthrough, empty-bin
    skip) + the LTTB recursion over the positioned preselection."""
    nb = n_out * ratio // 2
    return f"""
WITH RECURSIVE e AS (
    SELECT epoch_us(ts) - {_XBASE} AS x,
           CAST(round(value * 100) AS BIGINT) AS cy
    FROM events
),
s AS MATERIALIZED (
    SELECT 'all' AS event_type, x, cy,
           row_number() OVER (ORDER BY x) - 1 AS rn,
           count(*) OVER () AS cnt
    FROM e
),
edges AS MATERIALIZED (
    SELECT max(CASE WHEN rn = 1 THEN x END) AS x1,
           max(CASE WHEN rn = cnt - 2 THEN x END) AS xm2
    FROM s
),
assigned AS MATERIALIZED (
    SELECT i.event_type, i.x, i.cy, i.rn, count(k.k) AS bin
    FROM (SELECT s.*, e2.x1, e2.xm2 FROM s, edges e2
          WHERE rn >= 1 AND rn <= cnt - 2) i
    LEFT JOIN generate_series(1, {nb - 1}) k(k)
      ON CAST(i.x1 AS DOUBLE)
         + k.k * ((CAST(i.xm2 AS DOUBLE) - CAST(i.x1 AS DOUBLE)) / {nb}.0)
         < CAST(i.x AS DOUBLE)
    GROUP BY ALL
),
ext AS MATERIALIZED (
    SELECT bin, count(*) AS nbin, min(cy) AS mn, max(cy) AS mx
    FROM assigned GROUP BY 1
),
selp AS MATERIALIZED (
    SELECT a.bin,
           min(a.rn) FILTER (WHERE a.cy = e.mn) AS rn_min,
           min(a.rn) FILTER (WHERE a.cy = e.mx) AS rn_max
    FROM assigned a JOIN ext e USING (bin)
    WHERE e.nbin > 2
    GROUP BY 1
),
presel_rns AS (
    SELECT 0::BIGINT AS rn
    UNION ALL SELECT least(rn_min, rn_max) FROM selp
    UNION ALL SELECT greatest(rn_min, rn_max) FROM selp
    UNION ALL SELECT a.rn FROM assigned a JOIN ext e USING (bin)
              WHERE e.nbin <= 2
    UNION ALL SELECT any_value(cnt) - 1 FROM s
),
presel AS MATERIALIZED (
    SELECT s.event_type,
           row_number() OVER (ORDER BY p.rn) - 1 AS p,
           s.x, s.cy,
           count(*) OVER () AS m2
    FROM presel_rns p JOIN s ON s.rn = p.rn
),
{_lttb_phase2_sql(n_out, "presel")},
picked AS (
    SELECT t.x, t.cy FROM rec r
    JOIN presel t ON t.event_type = r.event_type AND t.p = r.a
    UNION ALL SELECT x, cy FROM s WHERE rn = cnt - 1
)
SELECT x, cy AS cents FROM picked
"""


def q_minmax_events_partitioned(sf_dir: str):
    """The explicit hash-partitioned downsample path over the same series —
    shares minmax_events' bin-exact SQL oracle (paths must agree)."""
    from ..kernels import minmax
    from ..stages.downsample import downsample_partitioned

    ds = _events_series(sf_dir, cols=("event_id", "event_type", "ts", "value"))

    def _no_x_minmax(x, y, n_out, **_):
        # match minmax_events: sort by ts, bins over INDEX (no-x variant)
        return minmax(None, y, n_out)

    out = downsample_partitioned(
        ds, kernel=_no_x_minmax, n_out=20, num_partitions=3,
        series_col="event_type", x_col="ts_us", y_col="value",
        tiebreak_cols=("event_id",))  # same order as the oracle's (ts, id)
    return out.select_columns(["event_type", "event_id", "value"])


def q_nanminmax_events(sf_dir: str):
    """NaN-returning MinMax: NaN injected at event_id%37==0 (every series
    gets scattered NaNs); a bin containing NaN returns its FIRST NaN index
    as both extremes (np.argmin/argmax propagation) — SQL-oracled via
    DuckDB's NaN-is-greatest total order."""
    return _downsample_events(sf_dir, "nanminmax", 20, y_col="cents",
                              nan_every=37,
                              out_cols=("event_type", "event_id"))


def q_nanm4_events(sf_dir: str):
    """NaN-returning M4 (first, NaN-propagating argmin/argmax, last)."""
    return _downsample_events(sf_dir, "nanm4", 20, y_col="cents",
                              nan_every=37,
                              out_cols=("event_type", "event_id"))


def q_everynth_events(sf_dir: str, n_out: int = 50):
    ds = _events_series(sf_dir, cols=("event_id", "event_type", "ts"))

    def _group(tbl: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            tbl, sort_keys=[("ts_us", "ascending"), ("event_id", "ascending")]
        )
        tbl = tbl.take(idx)
        out = downsample_table(tbl, "everynth", n_out, x_col=None, y_col="event_id",
                               presorted=True)
        return out.select(["event_type", "event_id"])

    return ds.groupby("event_type").map_groups(_group, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# dedup / text
# ---------------------------------------------------------------------------

def q_dedup_exact_pages(sf_dir: str):
    """Exact dedup: md5(text) hash-partition, keep the earliest crawl."""
    pages = read_pages(sf_dir, snapshots=SNAPSHOTS, columns=["url", "warc_ts", "text"])

    from ..stages.dedup import content_hash_batch

    def _hash(b: pa.Table) -> pa.Table:
        hashed = content_hash_batch(b, "text", out_col="text_md5")
        return pa.table({
            "text_md5": hashed["text_md5"],
            "url": hashed["url"],
            "ts_us": hashed["warc_ts"].cast(pa.int64()),
        })

    hashed = pages.map_batches(_hash, batch_format="pyarrow")

    from ..stages.dedup import keep_first_by_key

    first = keep_first_by_key(hashed, key_col="text_md5",
                              order_cols=["ts_us", "url"])

    def _rename(b: pa.Table) -> pa.Table:
        return pa.table({"text_md5": b["text_md5"], "url": b["url"],
                         "first_ts_us": b["ts_us"]})

    return first.map_batches(_rename, batch_format="pyarrow")


def q_span_dedup_docs(sf_dir: str):
    """C4-style span dedup: tile every document into 10-word spans,
    drop corpus-wide duplicate spans (first (doc_id, span_idx) occurrence
    wins), reassemble each document from its surviving spans. Explode is
    map-side vectorized; ONE hash(span) shuffle + ONE hash(doc) shuffle."""
    from ..stages.spans import span_dedup

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"]).repartition(8)
    return span_dedup(ds, span_w=10, num_partitions=8)


SPAN_DEDUP_SQL = """
WITH w AS (
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS word,
           generate_subscripts(string_split(text, ' '), 1) AS i
    FROM documents
),
spans AS (
    SELECT doc_id, (i - 1) // 10 AS span_idx,
           string_agg(word, ' ' ORDER BY i) AS span
    FROM w GROUP BY doc_id, span_idx
),
r AS (
    SELECT doc_id, span_idx, span,
           row_number() OVER (PARTITION BY span
                              ORDER BY doc_id, span_idx) AS rn
    FROM spans
)
SELECT doc_id,
       count(*) AS n_spans,
       count(*) FILTER (rn = 1) AS n_kept,
       coalesce(string_agg(span, ' ' ORDER BY span_idx)
                  FILTER (WHERE rn = 1), '') AS clean_text
FROM r GROUP BY doc_id
"""


def q_repetition_docs(sf_dir: str):
    """Gopher-style repetition signals per doc (dup-word / top-word /
    dup-bigram / top-bigram fractions) — purely map-side vectorized."""
    from ..stages.textstats import repetition_batch

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"]).repartition(8)
    return ds.map_batches(repetition_batch, batch_format="pyarrow")


REPETITION_SQL = """
WITH w AS (
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS word,
           generate_subscripts(string_split(text, ' '), 1) AS i
    FROM documents
),
wc AS (SELECT doc_id, word, count(*) AS c FROM w GROUP BY doc_id, word),
tw AS (
    SELECT doc_id, word AS top_word, c AS top_c
    FROM wc QUALIFY row_number() OVER (PARTITION BY doc_id
                                       ORDER BY c DESC, word) = 1
),
ws AS (
    SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
           CAST(coalesce(sum(c) FILTER (c > 1), 0) AS BIGINT) AS dup_w
    FROM wc GROUP BY doc_id
),
bg AS (
    SELECT doc_id,
           word || ' ' || lead(word) OVER (PARTITION BY doc_id ORDER BY i)
             AS bigram
    FROM w
    QUALIFY lead(word) OVER (PARTITION BY doc_id ORDER BY i) IS NOT NULL
),
bc AS (SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY doc_id, bigram),
tb AS (
    SELECT doc_id, bigram AS top_bigram, c AS top_c
    FROM bc QUALIFY row_number() OVER (PARTITION BY doc_id
                                       ORDER BY c DESC, bigram) = 1
),
bs AS (
    SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
           CAST(coalesce(sum(c) FILTER (c > 1), 0) AS BIGINT) AS dup_b
    FROM bc GROUP BY doc_id
)
SELECT ws.doc_id,
       ws.n_words,
       coalesce(bs.n_bigrams, 0) AS n_bigrams,
       CAST(ws.dup_w AS DOUBLE) / ws.n_words AS dup_word_frac,
       tw.top_word,
       CAST(tw.top_c AS DOUBLE) / ws.n_words AS top_word_frac,
       CASE WHEN bs.n_bigrams IS NULL THEN 0.0
            ELSE CAST(bs.dup_b AS DOUBLE) / bs.n_bigrams
       END AS dup_bigram_frac,
       tb.top_bigram,
       CASE WHEN bs.n_bigrams IS NULL THEN 0.0
            ELSE CAST(tb.top_c AS DOUBLE) / bs.n_bigrams
       END AS top_bigram_frac
FROM ws JOIN tw USING (doc_id)
LEFT JOIN bs USING (doc_id) LEFT JOIN tb USING (doc_id)
"""


def q_token_count_docs(sf_dir: str):
    rd = _rd()
    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def _tok(b: pa.Table) -> pa.Table:
        spaces = pc.count_substring(b["text"], " ")
        return pa.table({
            "doc_id": b["doc_id"],
            "n_tokens": pc.cast(pc.add(spaces, 1), pa.int64()),
        })

    return ds.map_batches(_tok, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# near-dup / fingerprints / text analysis
# ---------------------------------------------------------------------------

def _pages_with_pid(sf_dir: str):
    """pages + a unique page id (url#ts_us) for pairwise outputs."""
    pages = read_pages(sf_dir, snapshots=SNAPSHOTS, columns=["url", "warc_ts", "text"])

    def _pid(b: pa.Table) -> pa.Table:
        ts = b["warc_ts"].cast(pa.int64())
        pid = pc.binary_join_element_wise(
            b["url"].combine_chunks() if isinstance(b["url"], pa.ChunkedArray) else b["url"],
            "#", pc.cast(ts, pa.string()), "")
        return pa.table({"pid": pid, "text": b["text"]})

    return pages.map_batches(_pid, batch_format="pyarrow")


def q_near_dup_pages(sf_dir: str):
    """MinHash+LSH near-dup pairs (threshold ~1.0 -> exact-dup pairs here,
    which makes the result SQL-checkable; lower thresholds exercised in
    pytest with synthetic mutations). Fully distributed: candidate pairs
    re-acquire their texts through hash-partitioned joins — no broadcast,
    no single-block funnel."""
    from ..stages.dedup import near_dup_pairs

    # the corpus is consumed twice (signature pass + verify payload
    # joins); materialize the 2-column (pid, text) projection once so the
    # read/expand/pid chain doesn't run twice. Object-store resident at
    # toy scale; at 100 TB the same line relies on Ray's object spilling
    # — or drop the materialize and pay the recompute, whichever the
    # deployment prefers (read-twice of a columnar projection is the
    # usual choice on real clusters; both shapes are scale-safe).
    ds = _pages_with_pid(sf_dir).materialize()
    # num_partitions sizes the pair-distinct and the two verify joins;
    # each join reserves aggregator actors whose startup dominates at this
    # corpus size (measured: 4 is ~20% faster than 8 at sf0.1) — a real
    # cluster run raises it toward the node count
    pairs = near_dup_pairs(ds, id_col="pid", text_col="text", num_perm=64,
                           bands=8, threshold=0.999, num_partitions=4)

    def _proj(b: pa.Table) -> pa.Table:
        return b.select(["a", "b", "jaccard"])

    return pairs.map_batches(_proj, batch_format="pyarrow")


def q_near_dup_clusters(sf_dir: str):
    """Near-dup PAIRS -> duplicate CLUSTERS: MinHash+LSH pairs (threshold
    ~1.0) fed through distributed min-label propagation; every page in a
    duplicate component gets the component's minimum pid. Oracle: the
    exact-dup pair SQL + a recursive-CTE transitive closure."""
    from ..stages.components import connected_components
    from ..stages.dedup import near_dup_pairs

    ds = _pages_with_pid(sf_dir)
    pairs = near_dup_pairs(ds, id_col="pid", text_col="text", num_perm=64,
                           bands=8, threshold=0.999, num_partitions=4)
    return connected_components(pairs, a_col="a", b_col="b",
                                num_partitions=4)


def q_simhash_docs(sf_dir: str):
    rd = _rd()
    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    from ..stages.dedup import simhash_signatures

    return simhash_signatures(ds)


def q_simhash_near_dup_pages(sf_dir: str):
    """Banded SimHash near-dup pairs over pages — the banding is recall-
    PERFECT at hamming <= 3, so the result equals the quadratic all-pairs
    SQL oracle exactly."""
    from ..stages.dedup import simhash_near_dup_pairs

    ds = _pages_with_pid(sf_dir)
    return simhash_near_dup_pairs(ds, id_col="pid", max_hamming=3)


def q_ngram_jaccard_docs(sf_dir: str):
    """EXACT character-5-gram Jaccard similarity join over documents at
    t=0.5 via the lossless prefix filter (``ngram_jaccard_pairs``) — the
    non-probabilistic member of the near-dup family (MinHash recall < 1,
    SimHash bounded hamming; this one EQUALS the quadratic definition,
    which the SQL oracle restates as an inverted-index join)."""
    from ..stages.dedup import ngram_jaccard_pairs

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"])
    return ngram_jaccard_pairs(ds, id_col="doc_id", text_col="text",
                               n=5, threshold=0.5, num_partitions=4)


def q_incremental_dedup_docs(sf_dir: str):
    """Incremental-crawl dedup (``stages/dedup.py:dedup_against``): odd
    doc_ids are the new batch, even doc_ids the existing base corpus; a
    new doc is flagged when its exact content already exists in the base.
    Anti-join shape: both sides meet in ONE hash(md5) shuffle — the base
    is never broadcast (it is as large as the input)."""
    from ..stages.dedup import dedup_against

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"]).repartition(8)

    def _half(b: pa.Table, parity: int) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(ids % 2 == parity))

    base = ds.map_batches(lambda b: _half(b, 0), batch_format="pyarrow")
    new = ds.map_batches(lambda b: _half(b, 1), batch_format="pyarrow")
    return dedup_against(new, base, num_partitions=8)


INCREMENTAL_DEDUP_SQL = """
WITH b AS (
    SELECT DISTINCT md5(text) AS k FROM documents WHERE doc_id % 2 = 0
),
n AS (
    SELECT doc_id, md5(text) AS k FROM documents WHERE doc_id % 2 = 1
)
SELECT n.doc_id, (b.k IS NOT NULL) AS seen_in_base
FROM n LEFT JOIN b ON n.k = b.k
"""


def q_vocab_docs(sf_dir: str):
    """Exact top-20 corpus vocabulary (``stages/vocab.py``): per-block
    partial (token -> count, df), ONE hash(token) shuffle, per-partition
    top-V, tiny exact final rank — the tokenizer-training precursor."""
    from ..stages.vocab import build_vocab

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"]).repartition(8)
    return build_vocab(ds, top_v=20, num_partitions=8)


VOCAB_SQL = """
WITH w AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS token
    FROM documents
),
f AS (SELECT doc_id, token FROM w WHERE token <> ''),
c AS (
    SELECT token, count(*) AS count,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS df
    FROM f GROUP BY token
)
SELECT token, count, df,
       row_number() OVER (ORDER BY count DESC, token) - 1 AS vocab_id
FROM c
ORDER BY count DESC, token
LIMIT 20
"""


def q_contamination_docs(sf_dir: str):
    """Benchmark decontamination (``stages/dedup.py``): docs with
    ``doc_id % 97 == 0`` act as the eval suite; every other doc is
    flagged if it shares any 3-gram shingle with that set. Benchmark
    shingles are a driver-side union broadcast once (``ray.put``); the
    training side streams with NO shuffle. Same md5/31-bit ring as
    MinHash, so the oracle replays every hash (collisions included)."""
    from ..stages.dedup import benchmark_shingle_set, contamination_check

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"]).repartition(8)

    def _split(b: pa.Table, bench: bool) -> pa.Table:
        import numpy as _np

        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        m = (ids % 97) == 0
        return b.filter(pa.array(m if bench else ~m))

    bench_docs = ds.map_batches(lambda b: _split(b, True),
                                batch_format="pyarrow")
    train_docs = ds.map_batches(lambda b: _split(b, False),
                                batch_format="pyarrow")
    bench = benchmark_shingle_set(bench_docs, w=3)
    return contamination_check(train_docs, bench, w=3)


def _contamination_sql(w: int = 3, modulus: int = 97) -> str:
    from ..stages.dedup import _SHINGLE_MIX

    m31 = 1 << 31
    c = [int(x) % m31 for x in _SHINGLE_MIX[:w]]
    return f"""
WITH t AS (
    SELECT doc_id,
           list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
    FROM documents
),
tokidx AS (
    SELECT doc_id, i, toks[i] AS tok, len(toks) AS n
    FROM t, unnest(range(1, len(toks) + 1)) r(i)
),
th AS (
    SELECT doc_id, i, n, CAST({_MD5U64} % {m31} AS BIGINT) AS h31
    FROM tokidx
),
th2 AS (
    SELECT doc_id, n, h31,
           lead(h31, 1) OVER win AS h1, lead(h31, 2) OVER win AS h2
    FROM th WINDOW win AS (PARTITION BY doc_id ORDER BY i)
),
grams AS (
    SELECT DISTINCT doc_id,
           ((h31 * {c[0]}) % {m31} + (h1 * {c[1]}) % {m31}
            + (h2 * {c[2]}) % {m31}) % {m31} AS g
    FROM th2 WHERE h2 IS NOT NULL AND n >= {w}
    UNION
    SELECT doc_id, CAST({_MD5U64} % {m31} AS BIGINT) AS g
    FROM (SELECT doc_id, array_to_string(toks, ' ') AS tok FROM t
          WHERE len(toks) > 0 AND len(toks) < {w}) short
),
bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % {modulus} = 0),
agg AS (
    SELECT gr.doc_id, count(*) AS n_grams,
           CAST(sum(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hits
    FROM grams gr LEFT JOIN bench b ON gr.g = b.g
    WHERE gr.doc_id % {modulus} <> 0
    GROUP BY gr.doc_id
)
SELECT d.doc_id,
       coalesce(a.n_grams, 0) AS n_grams,
       coalesce(a.n_hits, 0) AS n_hits,
       coalesce(a.n_hits, 0) > 0 AS contaminated
FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
WHERE d.doc_id % {modulus} <> 0
"""


def q_minhash_docs(sf_dir: str):
    """Full MinHash signatures, exploded to one row per (doc, permutation)
    so EVERY signature slot is hash-verified against the SQL replay."""
    rd = _rd()
    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    from ..stages.dedup import minhash_signatures

    sigs = minhash_signatures(ds, num_perm=64)

    def _explode(b: pa.Table) -> pa.Table:
        import numpy as _np

        mh = b["minhash"]
        if isinstance(mh, pa.ChunkedArray):
            mh = mh.combine_chunks()
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        flat = mh.values.to_numpy(zero_copy_only=False).view(_np.int64)
        n_perm = len(flat) // max(1, len(ids))
        return pa.table({
            "doc_id": pa.array(_np.repeat(ids, n_perm)),
            "perm": pa.array(_np.tile(_np.arange(n_perm), len(ids))),
            "sig": pa.array(flat),
        })

    return sigs.map_batches(_explode, batch_format="pyarrow")


def q_lang_id_docs(sf_dir: str):
    rd = _rd()
    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    from ..stages.textstats import LangId

    return ds.map_batches(LangId, batch_format="pyarrow",
                          concurrency=(1, 8)).select_columns(["doc_id", "lang_pred"])


def q_quality_docs(sf_dir: str):
    """Full quality-signal panel (length/tokens/stopword/punct/upper) —
    every column SQL-oracled."""
    rd = _rd()
    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    from ..stages.textstats import quality_batch

    return ds.map_batches(quality_batch, batch_format="pyarrow")


def q_token_stats_docs(sf_dir: str):
    rd = _rd()
    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    from ..stages.textstats import token_stats_batch

    return ds.map_batches(token_stats_batch, batch_format="pyarrow")


def q_fingerprint_docs(sf_dir: str):
    rd = _rd()
    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    from ..stages.textstats import fingerprint_batch

    return ds.map_batches(fingerprint_batch, batch_format="pyarrow")


def q_chunk_docs(sf_dir: str):
    """Context-window chunking: 40-token chunks with 10-token overlap
    (stride 30) per document; the chunk TEXT itself is hash-verified
    against the SQL list_slice replay."""
    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    from ..stages.packing import chunk_documents

    return chunk_documents(ds, chunk_tokens=40, overlap=10)


CHUNK_DOCS_SQL = """
WITH t AS MATERIALIZED (
    SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
c AS (
    SELECT doc_id, toks, len(toks) AS n,
           CASE WHEN len(toks) <= 40 THEN 1
                ELSE 1 + (len(toks) - 40 + 29) // 30 END AS n_chunks
    FROM t
),
e AS (SELECT doc_id, toks, unnest(range(n_chunks)) AS ci FROM c)
SELECT doc_id, ci AS chunk_idx,
       array_to_string(list_slice(toks, ci*30 + 1, ci*30 + 40), ' ')
           AS chunk_text,
       len(list_slice(toks, ci*30 + 1, ci*30 + 40)) AS n_chunk_tokens
FROM e
"""


def q_pack_sequences_docs(sf_dir: str):
    """Concat-then-split sequence packing at capacity 1000: every doc's
    global token offset via the distributed prefix sum (bucket partials
    -> one tiny scan task -> broadcast offsets -> per-bucket cumsum)."""
    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    from ..stages.packing import pack_sequences
    from ..stages.textstats import token_stats_batch

    def _counts(b: pa.Table) -> pa.Table:
        t = token_stats_batch(b)
        return pa.table({"doc_id": t["doc_id"],
                         "n_tokens": t["n_tokens"]})

    counts = ds.map_batches(_counts, batch_format="pyarrow")
    # toy corpus: 500 docs / bucket_size 50 -> 10 dense buckets, 2 parts
    return pack_sequences(counts, 1000, bucket_size=50, num_partitions=2)


PACK_SEQUENCES_SQL = """
WITH t AS (
    SELECT doc_id,
           length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens
    FROM documents
),
o AS (
    SELECT doc_id, n_tokens,
           CAST(COALESCE(sum(n_tokens) OVER (
               ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS token_start
    FROM t
)
SELECT doc_id, n_tokens, token_start,
       token_start // 1000 AS first_pack,
       (token_start + GREATEST(n_tokens, 1) - 1) // 1000 AS last_pack
FROM o
"""


def q_gzip_text_docs(sf_dir: str):
    """Real gzip ingestion roundtrip: each document's text is gzipped
    (fixture), inflated back by the stdlib-zlib decode stage, and token
    stats are computed on the INFLATED text — the oracle is the plain
    token-stats SQL over the raw text, so passing proves the codec path
    is lossless end to end."""
    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    from ..sources.archives import gunzip_batch, gzip_bytes
    from ..stages.textstats import token_stats_batch

    def _compress(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b["doc_id"],
            "payload": pa.array([gzip_bytes(t.encode())
                                 for t in b["text"].to_pylist()],
                                pa.binary()),
        })

    gz = ds.map_batches(_compress, batch_format="pyarrow")
    txt = gz.map_batches(gunzip_batch, batch_format="pyarrow")
    return txt.map_batches(token_stats_batch, batch_format="pyarrow")


def q_warc_extract_docs(sf_dir: str):
    """Real WARC (ISO 28500) record extraction: documents are packed 50
    per archive into WARC/1.0 response records (Content-Length framing),
    then WarcRecordExtractor walks the archives back into one row per
    record. Per-record byte stats are hash-verified against the SQL
    replay over the raw documents."""
    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    from ..sources.archives import WarcRecordExtractor, build_warc

    def _pack(b: pa.Table) -> pa.Table:
        return b.append_column(
            "archive_id", pc.cast(pc.floor(pc.divide(
                pc.cast(b["doc_id"], pa.float64()), 50.0)), pa.int64()))

    def _build(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(g, sort_keys=[("doc_id", "ascending")])
        g = g.take(idx)
        recs = [(f"https://corpus.example/doc/{i}", t.encode())
                for i, t in zip(g["doc_id"].to_pylist(),
                                g["text"].to_pylist())]
        return pa.table({
            "archive_id": pa.array([g["archive_id"][0].as_py()],
                                   pa.int64()),
            "payload": pa.array([build_warc(recs)], pa.binary()),
        })

    archives = ds.map_batches(_pack, batch_format="pyarrow") \
                 .groupby("archive_id").map_groups(_build,
                                                   batch_format="pyarrow")
    records = archives.map_batches(WarcRecordExtractor,
                                   batch_format="pyarrow", batch_size=64,
                                   concurrency=(1, 4))

    def _stats(b: pa.Table) -> pa.Table:
        payloads = b["payload"].to_pylist()
        n = [len(p) for p in payloads]
        head = [p[0] if p else -1 for p in payloads]
        return pa.table({
            "archive_id": b["archive_id"],
            "uri": b["uri"],
            "warc_type": b["warc_type"],
            "n_bytes": pa.array(n, pa.int64()),
            "head_code": pa.array(head, pa.int64()),
        })

    return records.map_batches(_stats, batch_format="pyarrow")


WARC_EXTRACT_SQL = """
SELECT doc_id // 50 AS archive_id,
       'https://corpus.example/doc/' || CAST(doc_id AS VARCHAR) AS uri,
       'response' AS warc_type,
       length(text) AS n_bytes,
       CAST(CASE WHEN length(text) = 0 THEN -1
            ELSE unicode(substring(text, 1, 1)) END AS BIGINT) AS head_code
FROM documents
"""


def q_tfidf_terms(sf_dir: str):
    """Top-5 characteristic terms per source by smoothed tf-idf
    (sklearn-style idf = ln((1+N)/(1+df)) + 1). Ints (tf, df, rank) are
    the hashed outputs; the float score only orders them."""
    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source", "text"])
    from ..stages.tfidf import tfidf_top_terms

    n_docs = ds.count()  # parquet metadata, no data pass
    # toy vocab (~40 terms) -> 2 partitions keeps sort reducers non-empty
    return tfidf_top_terms(ds, n_docs, group_col="source", k=5,
                           num_partitions=2)


TFIDF_SQL = """
WITH tok AS MATERIALIZED (
    SELECT doc_id, source, t.term
    FROM documents, unnest(string_split(text, ' ')) AS t(term)
    WHERE t.term <> ''
),
tf AS (SELECT source, term, count(*) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
n AS (SELECT count(*) AS n FROM documents),
scored AS (
    SELECT tf.source, tf.term, tf.tf, df.df,
           tf.tf * (ln((1.0 + (SELECT n FROM n)) / (1.0 + df.df)) + 1.0)
               AS score
    FROM tf JOIN df USING (term)
),
ranked AS (
    SELECT source, term, tf, df,
           row_number() OVER (PARTITION BY source
                              ORDER BY score DESC, term) AS rank
    FROM scored
)
SELECT source, term, tf, df, rank FROM ranked WHERE rank <= 5
"""


def q_pii_scrub_docs(sf_dir: str):
    """PII masking over documents: deterministic contact info (email, IP,
    phone derived from doc_id) is appended to every third doc, then the
    vectorized RE2 scrub masks it and counts per category. The scrubbed
    TEXT itself is hash-compared against the DuckDB regexp_replace replay
    (same RE2 engine), not just the counts."""
    rd = _rd()
    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    from ..stages.pii import pii_scrub_batch

    def _inject_and_scrub(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        # fixture synthesis (not the operator hot path): every 3rd doc
        # gets contact info derived from its id
        suffix = [
            (f" contact user{i}@mail.example.com from 10.{i % 256}.0.1"
             f" call 555-{100 + i % 900}-{1000 + i % 9000}")
            if i % 3 == 0 else ""
            for i in ids]
        aug = pa.table({
            "doc_id": b["doc_id"],
            "text": pc.binary_join_element_wise(
                b["text"], pa.array(suffix, pa.string()), ""),
        })
        out = pii_scrub_batch(aug)
        return out.drop_columns(["text"])

    return ds.map_batches(_inject_and_scrub, batch_format="pyarrow")


def _build_pii_sql() -> str:
    """Chained regexp_replace replay generated from the SAME pattern table
    the Ray scrub uses (stages/pii.py) — counts taken on each stage's
    input, masking applied in the same category order."""
    from ..stages.pii import PII_PATTERNS

    sql = ("WITH aug AS MATERIALIZED (\n"
           "  SELECT doc_id, text || CASE WHEN doc_id % 3 = 0 THEN\n"
           "    ' contact user' || CAST(doc_id AS VARCHAR) ||\n"
           "    '@mail.example.com from 10.' ||\n"
           "    CAST(doc_id % 256 AS VARCHAR) || '.0.1 call 555-' ||\n"
           "    CAST(100 + doc_id % 900 AS VARCHAR) || '-' ||\n"
           "    CAST(1000 + doc_id % 9000 AS VARCHAR)\n"
           "    ELSE '' END AS t0 FROM documents\n)")
    prev = "aug"
    prev_col = "t0"
    carry = []
    for i, (name, (pat, rep)) in enumerate(PII_PATTERNS.items(), 1):
        carried = ", ".join(carry) + (", " if carry else "")
        sql += (f", s{i} AS MATERIALIZED (\n"
                f"  SELECT doc_id, {carried}"
                f"len(regexp_extract_all({prev_col}, '{pat}'))::BIGINT"
                f" AS n_{name},\n"
                f"  regexp_replace({prev_col}, '{pat}', '{rep}', 'g')"
                f" AS t{i}\n  FROM {prev}\n)")
        carry.append(f"n_{name}")
        prev, prev_col = f"s{i}", f"t{i}"
    names = ", ".join(carry)
    return (sql + f"\nSELECT doc_id, {prev_col} AS clean_text, {names}"
            f" FROM {prev}")


# deterministic sampling: the query constants live here so the SQL oracles
# below inject the IDENTICAL thresholds/rates the Ray path filters on
_SAMPLE_RATE, _SAMPLE_SALT = 0.25, 7
_STRAT_RATES = {"en": 0.05, "de": 0.5, "es": 0.3, "fr": 1.0, "zh": 0.1}
_STRAT_SALT = 11
_SPLITS = {"train": 0.8, "val": 0.1, "test": 0.1}
_SPLIT_SALT = 3


def q_sample_docs(sf_dir: str):
    """Deterministic 25% Bernoulli sample of documents by doc_id hash —
    a pure map-side filter (no shuffle, no RNG state), reproducible on
    any partitioning."""
    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "lang", "n_chars"])
    from ..stages.sampling import bernoulli_sample

    return bernoulli_sample(ds, id_col="doc_id", rate=_SAMPLE_RATE,
                            salt=_SAMPLE_SALT)


def q_sample_stratified_docs(sf_dir: str):
    """Language-rebalancing stratified sample: per-lang keep rates
    (downsample the over-represented 'en', keep all 'fr'). The rate table
    rides in the UDF closure; the filter stays map-side."""
    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "lang", "n_chars"])
    from ..stages.sampling import stratified_sample

    return stratified_sample(ds, id_col="doc_id", strata_col="lang",
                             rates=_STRAT_RATES, default_rate=0.1,
                             salt=_STRAT_SALT)


def q_train_split_docs(sf_dir: str):
    """Deterministic 80/10/10 train/val/test assignment by doc_id hash,
    reported as per-split corpus totals (3 rows)."""
    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "n_chars"])
    from ..arrow_utils import rename_agg
    from ..stages.sampling import assign_splits

    labeled = assign_splits(ds, id_col="doc_id", splits=_SPLITS,
                            salt=_SPLIT_SALT)

    def _agg(b: pa.Table) -> pa.Table:
        g = b.group_by(["split"]).aggregate(
            [("doc_id", "count"), ("n_chars", "sum")])
        return rename_agg(g, {"split": "split", "doc_id_count": "n_docs",
                              "n_chars_sum": "total_chars"})

    def _merge(b: pa.Table) -> pa.Table:
        g = b.group_by(["split"]).aggregate(
            [("n_docs", "sum"), ("total_chars", "sum")])
        g = rename_agg(g, {"split": "split", "n_docs_sum": "n_docs",
                           "total_chars_sum": "total_chars"})
        return pa.table({
            "split": g["split"],
            "n_docs": pc.cast(g["n_docs"], pa.int64()),
            "total_chars": pc.cast(g["total_chars"], pa.int64()),
        })

    # per-block partials (<= 3 rows each) then one tiny merge
    return labeled.map_batches(_agg, batch_format="pyarrow") \
                  .repartition(1).map_batches(_merge, batch_format="pyarrow")


def _build_sampling_sql():
    """Oracle SQL for the three sampling queries, generated from the same
    constants/hash the Ray path uses (stages/sampling.py) so any drift is
    a driver hash-mismatch, not a silent approximation."""
    from ..stages.sampling import (hash61_sql, rate_threshold,
                                   split_boundaries_sql)

    h_sample = hash61_sql("doc_id", _SAMPLE_SALT)
    sample = f"""
        SELECT doc_id, lang, n_chars FROM documents
        WHERE {h_sample} < {rate_threshold(_SAMPLE_RATE)}
    """
    h_strat = hash61_sql("doc_id", _STRAT_SALT)
    cases = " ".join(f"WHEN '{k}' THEN {rate_threshold(v)}::HUGEINT"
                     for k, v in _STRAT_RATES.items())
    strat = f"""
        SELECT doc_id, lang, n_chars FROM documents
        WHERE {h_strat} < CASE lang {cases}
                          ELSE {rate_threshold(0.1)}::HUGEINT END
    """
    h_split = hash61_sql("doc_id", _SPLIT_SALT)
    bounds = split_boundaries_sql(_SPLITS)
    whens = " ".join(f"WHEN hv < {b}::HUGEINT THEN '{name}'"
                     for name, b in bounds[:-1])
    split = f"""
        WITH hashed AS (SELECT doc_id, n_chars, {h_split} AS hv
                        FROM documents)
        SELECT CASE {whens} ELSE '{bounds[-1][0]}' END AS split,
               count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM hashed GROUP BY 1
    """
    return sample, strat, split


_SAMPLE_SQL, _STRAT_SQL, _SPLIT_SQL = _build_sampling_sql()


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------

def q_token_count_bpeish(sf_dir: str):
    """BPE-ish regex token count (compiled pattern in an actor pool)."""
    rd = _rd()
    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    from ..stages.textstats import BpeishTokenizer

    return ds.map_batches(BpeishTokenizer, batch_format="pyarrow",
                          concurrency=(1, 8))


def q_embedding_near_dups(sf_dir: str):
    """Embedding-cosine near-dup pairs via random-hyperplane LSH + exact
    verification (rows-only; recall vs brute force pytest-checked)."""
    import ray.data as rd

    from ..stages.similarity import embedding_near_dup_pairs

    ds = _read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    # the synthetic embeddings' strongest pair sits just above 0.5;
    # 8-bit band keys keep buckets selective (r=4 made every bucket a
    # quadratic hot spot at scale); at this low a cosine LSH recall is
    # partial by design — the >=0.9-recall contract is pytest-pinned at
    # near-dup-grade thresholds where P[band match] is high
    # max_bucket is an explicit opt-in here (the operator default is None):
    # bounds pathological buckets to O(512^2) pair emission, trading a
    # logged slice of recall — acceptable for this already-partial-recall
    # low-threshold sweep
    return embedding_near_dup_pairs(ds, threshold=0.5, planes=128, bands=16,
                                    max_bucket=512, num_partitions=4)


def q_knn_embeddings(sf_dir: str):
    """Brute-force cosine top-10 for the vec_id=0 query vector."""
    import ray
    import ray.data as rd

    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qvec = np.asarray(t.filter(pc.equal(t["vec_id"], 0))["embedding"][0].as_py(),
                      dtype=np.float64)
    ds = _read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    ds = ds.filter(expr="vec_id > 0")
    from ..stages.similarity import knn_bruteforce

    top = knn_bruteforce(ds, ray.put(qvec), k=10).to_pandas()
    top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
    return top[["vec_id", "rank"]]


def q_knn_ivf_embeddings(sf_dir: str):
    """IVF (clustered) top-10 through the full IVF machinery — seeded
    k-means training, list assignment, probe-filtered scoring, global merge
    — run here with ``nprobe == n_lists`` (exhaustive probing) so the
    result provably equals exact brute force and the driver row is
    HASH-checkable against the same SQL oracle as ``knn_embeddings``.
    The approximate regime (``nprobe < n_lists``) is pytest-pinned: recall
    >= 0.9 at nprobe=4 with zero false positives
    (tests/test_embedding_neardup_bpeish.py)."""
    import ray
    import ray.data as rd

    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    from ..stages.similarity import embedding_matrix, knn_ivf, train_ivf_centroids

    E = embedding_matrix(t)
    ids = t["vec_id"].to_numpy()
    qvec = E[ids == 0][0]
    C = train_ivf_centroids(E[:512], n_lists=8)
    ds = _read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"]).filter(expr="vec_id > 0")
    top = knn_ivf(ds, ray.put(qvec), ray.put(C), k=10, nprobe=8).to_pandas()
    top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
    return top[["vec_id", "rank"]]


# ---------------------------------------------------------------------------
# multimodal (stubbed decode, real plumbing)
# ---------------------------------------------------------------------------

def q_multimodal_frame_sample(sf_dir: str):
    """REAL video frame sampling through the actor-pool stage: each doc
    becomes a genuine single-track MP4 (``functions/mp4.py`` writer) whose
    frame payloads are deterministic slices of the doc's own text; the
    ISO BMFF demuxer in ``SampleFrames(fake=False)`` reconstructs the
    sample table (stsz/stco/stsc/stts), EveryNth picks 16 frames, and the
    selected frames' BYTES are sliced out of mdat. Per-doc stats computed
    from those extracted bytes are hash-verified against the SQL replay
    over ``text`` — binding the whole mux->demux->select->extract path.

    Frame plan (replayed in SQL): n_total = 8 + n_chars % 25 frames at
    25 fps; frame i = substr(text, 1 + (i*11) % (n_chars-4), 1 + (i+n_chars) % 5)
    (slices may overlap — the container doesn't care)."""
    rd = _rd()
    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "n_chars"])

    from ..stages.multimodal import SampleFrames, encode_mp4

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
            "duration_ms": pc.cast(pc.multiply(b["n_chars"], 40), pa.int32()),
        })

    media = ds.map_batches(_media, batch_format="pyarrow", batch_size=256)
    sampled = media.map_batches(
        SampleFrames, fn_constructor_kwargs={"n_frames": 16, "fake": False},
        batch_format="pyarrow", batch_size=256, concurrency=(1, 8))

    def _summ(b: pa.Table) -> pa.Table:
        fts = b["frame_ts_ms"].to_pylist()
        frames = b["frames"].to_pylist()
        return pa.table({
            "media_id": b["media_id"],
            "n_sel": pa.array([len(f) for f in fts], pa.int64()),
            "first_ts": pa.array([f[0] for f in fts], pa.int64()),
            "last_ts": pa.array([f[-1] for f in fts], pa.int64()),
            "sel_bytes": pa.array([sum(len(x) for x in fs)
                                   for fs in frames], pa.int64()),
            "head_cs": pa.array([sum(x[0] for x in fs)
                                 for fs in frames], pa.int64()),
        })

    return sampled.map_batches(_summ, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# catalog
# ---------------------------------------------------------------------------

def q_chunkstore_downsample(sf_dir: str, n_out: int = 8):
    """Serve a visualization downsample DIRECTLY from the compressed chunk
    store: 15-min rollup -> canonical Gorilla/DoD chunks -> decode ->
    per-series with-x MinMax over (bucket, sum_y). Proves the chunk store
    is a first-class query source (decode feeds the kernels losslessly);
    the oracle replays rollup + x-value-bin MinMax in SQL."""
    from ..stages.compress import ChunkDecompressor, compress_chunks_per_series

    t0 = rollup(_series(sf_dir), W15M)
    chunks = compress_chunks_per_series(
        t0, {"min_y": "i8", "max_y": "i8", "sum_y": "i8", "n": "i8"})
    decoded = chunks.map_batches(
        ChunkDecompressor, fn_constructor_kwargs={
            "value_cols": {"min_y": "i8", "max_y": "i8", "sum_y": "i8",
                           "n": "i8"}},
        batch_format="pyarrow", concurrency=(1, 8))

    def _group(tbl: pa.Table) -> pa.Table:
        out = downsample_table(tbl, "minmax", n_out, x_col="bucket",
                               y_col="sum_y")
        return out.select(["series_id", "bucket", "sum_y"])

    return decoded.groupby("series_id").map_groups(_group,
                                                   batch_format="pyarrow")


def q_corpus_curation(sf_dir: str):
    """The canonical training-data curation flow as ONE pipeline:
    quality-filter (length + stopword ratio) -> exact dedup by fingerprint
    (keep lowest doc_id) -> language ID -> per-language corpus totals.
    Every stage is an existing operator; the composition is SQL-oracled."""
    rd = _rd()
    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    from ..arrow_utils import rename_agg
    from ..stages.textstats import LangId, fingerprint_batch, quality_batch

    def _quality_filter(b: pa.Table) -> pa.Table:
        q = quality_batch(b)
        # language-agnostic length gate (an EN-stopword gate would empty
        # the non-en strata and leave a 1-row result — weak hash check)
        keep = pc.greater_equal(q["n_tokens"], 20)
        b = b.filter(keep)
        q = q.filter(keep)
        fp = fingerprint_batch(b)
        return pa.table({"doc_id": b["doc_id"], "text": b["text"],
                         "n_tokens": q["n_tokens"],
                         "fingerprint": fp["fingerprint"]})

    filtered = ds.map_batches(_quality_filter, batch_format="pyarrow")

    from ..stages.dedup import keep_first_by_key

    deduped = keep_first_by_key(filtered, key_col="fingerprint",
                                order_cols=["doc_id"], num_partitions=8)
    tagged = deduped.map_batches(LangId, batch_format="pyarrow",
                                 concurrency=(1, 4))

    def _agg(b: pa.Table) -> pa.Table:
        g = b.group_by(["lang_pred"]).aggregate(
            [("doc_id", "count"), ("n_tokens", "sum")])
        return rename_agg(g, {"lang_pred": "lang_pred",
                              "doc_id_count": "n_docs",
                              "n_tokens_sum": "total_tokens"})

    # per-lang partials then one tiny tree merge (<= |langs| rows)
    partials = tagged.map_batches(_agg, batch_format="pyarrow")

    def _merge(b: pa.Table) -> pa.Table:
        g = b.group_by(["lang_pred"]).aggregate(
            [("n_docs", "sum"), ("total_tokens", "sum")])
        return rename_agg(g, {"lang_pred": "lang_pred",
                              "n_docs_sum": "n_docs",
                              "total_tokens_sum": "total_tokens"})

    out = partials.repartition(1).map_batches(_merge, batch_format="pyarrow")

    def _cast(b: pa.Table) -> pa.Table:
        return pa.table({
            "lang_pred": b["lang_pred"],
            "n_docs": pc.cast(b["n_docs"], pa.int64()),
            "total_tokens": pc.cast(b["total_tokens"], pa.int64()),
        })

    return out.map_batches(_cast, batch_format="pyarrow")


def q_multimodal_wav_decode(sf_dir: str):
    """REAL audio decode through the actor-pool stage: WAV payloads built
    from the documents' own bytes (PCM16 sample i = byte i), decoded with
    DecodeAudio (stdlib ``wave``), per-doc waveform stats hash-verified
    against the SQL replay over the text."""
    rd = _rd()
    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    from ..stages.multimodal import DecodeAudio, encode_wav

    def _media(b: pa.Table) -> pa.Table:
        import numpy as _np

        payloads = [
            encode_wav(_np.frombuffer(t.encode(), _np.uint8).astype("<i2"))
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


def _audio_code_stats(b: pa.Table) -> pa.Table:
    """Per-doc waveform stats over DecodeAudio output: n / sum / first /
    last of the int16 codes (rint(f32*32768) recovers them exactly)."""
    import numpy as _np

    s = b["samples"]
    if isinstance(s, pa.ChunkedArray):
        s = s.combine_chunks()
    flat = s.values.to_numpy(zero_copy_only=False)
    codes = _np.rint(flat * 32768.0).astype(_np.int64)
    off = s.offsets.to_numpy(zero_copy_only=False).astype(_np.int64)
    cs = _np.concatenate([[0], _np.cumsum(codes)])
    n = off[1:] - off[:-1]
    # empty docs: clip the gather indices and mask to -1 (an unguarded
    # codes[off[i]] would read the NEXT doc's first sample)
    first = _np.where(
        n > 0, codes[_np.minimum(off[:-1], len(codes) - 1)]
        if len(codes) else 0, -1)
    last = _np.where(
        n > 0, codes[_np.maximum(off[1:] - 1, 0)]
        if len(codes) else 0, -1)
    return pa.table({
        "media_id": b["media_id"],
        "n_samples": pa.array(n, pa.int64()),
        "sum_codes": pa.array(cs[off[1:]] - cs[off[:-1]], pa.int64()),
        "first_code": pa.array(first, pa.int64()),
        "last_code": pa.array(last, pa.int64()),
    })


def q_multimodal_mulaw_decode(sf_dir: str):
    """REAL compressed-audio decode through the actor-pool stage: G.711
    mu-law AU payloads companded from the documents' own bytes (PCM
    sample i = byte i, mu-law encoded, Sun AU container), decoded with
    DecodeAudio (vectorized G.711, bit-identical to the stdlib audioop
    reference), per-doc waveform stats hash-verified against the SQL
    replay of the companding arithmetic over the text."""
    rd = _rd()
    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    from ..functions.g711 import encode_au
    from ..stages.multimodal import DecodeAudio

    def _media(b: pa.Table) -> pa.Table:
        import numpy as _np

        payloads = [
            encode_au(_np.frombuffer(t.encode(), _np.uint8)
                      .astype(_np.int16), 8000, "mulaw")
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


def q_multimodal_png_decode(sf_dir: str):
    """REAL image decode through the actor-pool stage: 8x?-pixel RGB PNGs
    whose pixel bytes ARE the documents' own bytes (zero-padded to whole
    rows), encoded with the stdlib-zlib PNG writer, decoded with
    DecodeImage's stdlib-zlib PNG reader (full scanline de-filtering),
    per-doc pixel stats hash-verified against the SQL replay over the
    text."""
    rd = _rd()
    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"])
    from ..stages.multimodal import DecodeImage, encode_png

    def _media(b: pa.Table) -> pa.Table:
        import numpy as _np

        payloads, hs = [], []
        for t in b["text"].to_pylist():
            raw = t.encode()
            h = max(1, -(-len(raw) // 24))  # ceil(bytes / (8 px * 3 ch))
            buf = _np.zeros(h * 24, dtype=_np.uint8)
            buf[: len(raw)] = _np.frombuffer(raw, _np.uint8)
            payloads.append(encode_png(buf.reshape(h, 8, 3)))
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
        # last NON-ZERO byte per doc == the text's last character (ASCII
        # printable text has no NUL; the zero row padding is transparent)
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


# the PNG pixel payload carries the text's own bytes (zero-padded to whole
# 8px rows), so the decoded pixel stats replay from the text (ASCII:
# unicode(char) == byte; empty text -> a single all-zero row)
def q_multimodal_jpeg_decode(sf_dir: str):
    """REAL JPEG decode through the actor-pool stage: grayscale baseline
    JPEGs whose 8x8 blocks are each CONSTANT at one document byte (8
    blocks per row, zero-padded to whole rows). With the DC quantizer
    pinned to 8 (``dc_exact_quant``) constant blocks survive the lossy
    codec EXACTLY (qDC = round(8*(v-128)/8) = v-128), so the full
    encode -> Huffman entropy stream -> decode -> per-doc byte stats
    pipeline is hash-verified against the SQL replay over the text. The
    decoder itself is the general baseline codec
    (``functions/jpeg.py``), not a special case."""
    rd = _rd()
    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"])
    from ..stages.multimodal import DecodeImage, encode_jpeg
    from ..functions.jpeg import dc_exact_quant

    quant = dc_exact_quant()

    def _media(b: pa.Table) -> pa.Table:
        import numpy as _np

        payloads, hs = [], []
        for t in b["text"].to_pylist():
            raw = t.encode()
            hb = max(1, -(-len(raw) // 8))   # block rows (8 blocks/row)
            grid = _np.zeros(hb * 8, dtype=_np.uint8)
            grid[: len(raw)] = _np.frombuffer(raw, _np.uint8)
            img = _np.kron(grid.reshape(hb, 8),
                           _np.ones((8, 8), _np.uint8))
            payloads.append(encode_jpeg(img, quant=quant))
            hs.append(hb * 8)
        return pa.table({
            "media_id": b["doc_id"],
            "kind": pa.array(["image"] * b.num_rows),
            "payload": pa.array(payloads, pa.binary()),
            "height": pa.array(hs, pa.int32()),
            "width": pa.array([64] * b.num_rows, pa.int32()),
        })

    # batch_size 32: entropy coding is ~6 ms/doc of real CPU — small
    # batches keep all 8 decode actors fed (128 -> only 4 tasks total)
    media = ds.map_batches(_media, batch_format="pyarrow", batch_size=32)
    dec = media.map_batches(DecodeImage, batch_format="pyarrow",
                            batch_size=32, concurrency=(1, 8))

    def _stats(b: pa.Table) -> pa.Table:
        import numpy as _np

        s = b["pixels"]
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        flat = s.values.to_numpy(zero_copy_only=False).astype(_np.int64)
        off = s.offsets.to_numpy(zero_copy_only=False).astype(_np.int64)
        # one sample per 8x8 block: within each 64-px-wide grayscale
        # image, block corners sit at rel % 512 in {0, 8, ..., 56}
        n_px = off[1:] - off[:-1]
        rel = _np.arange(len(flat)) - _np.repeat(off[:-1], n_px)
        m = rel % 512
        mask = (m < 64) & (m % 8 == 0)
        codes = flat[mask]
        n = n_px // 64                      # decoded bytes (padded) per doc
        coff = _np.concatenate([[0], _np.cumsum(n)])
        cs = _np.concatenate([[0], _np.cumsum(codes)])
        first = codes[coff[:-1]]
        nz = _np.flatnonzero(codes)
        lo = _np.searchsorted(nz, coff[:-1], side="left")
        hi = _np.searchsorted(nz, coff[1:], side="left")
        has = hi > lo
        last_nz = _np.where(
            has, codes[nz[_np.maximum(hi - 1, 0)]] if len(nz) else 0, -1)
        return pa.table({
            "media_id": b["media_id"],
            "n_bytes": pa.array(n, pa.int64()),
            "sum_codes": pa.array(cs[coff[1:]] - cs[coff[:-1]], pa.int64()),
            "first_code": pa.array(
                _np.where(first == 0, -1, first), pa.int64()),
            "last_code": pa.array(last_nz, pa.int64()),
        })

    return dec.map_batches(_stats, batch_format="pyarrow")


MULTIMODAL_JPEG_SQL = """
SELECT doc_id AS media_id,
       8 * greatest(1, CAST(ceil(length(text) / 8.0) AS BIGINT))
           AS n_bytes,
       CAST(COALESCE(list_sum(list_transform(
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


MULTIMODAL_PNG_SQL = """
SELECT doc_id AS media_id,
       24 * greatest(1, CAST(ceil(length(text) / 24.0) AS BIGINT))
           AS n_bytes,
       CAST(COALESCE(list_sum(list_transform(
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


# ---------------------------------------------------------------------------
# link graph + PageRank (stages/graph.py)
# ---------------------------------------------------------------------------

def _graph_targets(doc_id, n_docs):
    """Deterministic out-links: doc d -> (d*31 + 97*j) % N for j=1..3.
    Multi-edges/self-loops possible by construction; both sides (NumPy and
    SQL) treat them identically (each edge contributes separately)."""
    import numpy as np

    d = doc_id.astype(np.int64)
    return [(d * 31 + 97 * j) % n_docs for j in (1, 2, 3)]


def q_link_graph_docs(sf_dir: str):
    """Link-graph build over href-bearing HTML: synthesize 3 deterministic
    ``<a href>`` links per document (the shared corpus html is link-free by
    design — its byte-identity with the reference extractor is
    load-bearing), extract every link with the vectorized split-based
    extractor (``stages/graph.py:extract_links_batch`` — one Arrow pass,
    no per-doc regex loop), parse the target doc id, and aggregate
    in-degree + sum of linking ids per target via the hashpart grouped sum
    (scale path: per-node key space, ONE int32 hash shuffle)."""
    import numpy as np
    import pyarrow.parquet as _pq

    from ..stages.graph import extract_links_batch, grouped_sum_parts

    n = _pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id"]).repartition(8)

    def _mk_html(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy()
        t1, t2, t3 = (pc.cast(pa.array(t), pa.string())
                      for t in _graph_targets(d, n))
        html = pc.binary_join_element_wise(
            '<html><body><p>intro</p><a href="https://d', t1,
            '.example.com/page">x</a><a href="https://d', t2,
            '.example.com/page">y</a><a href="https://d', t3,
            '.example.com/page">z</a></body></html>', "")
        return pa.table({"doc_id": b["doc_id"], "html": html})

    links = ds.map_batches(_mk_html, batch_format="pyarrow").map_batches(
        lambda b: extract_links_batch(b, html_col="html", src_col="doc_id"),
        batch_format="pyarrow")

    def _parse_dst(b: pa.Table) -> pa.Table:
        tail = pc.utf8_slice_codeunits(b["link"], 9)  # strip 'https://d'
        dst = pc.cast(pc.list_element(
            pc.split_pattern(tail, ".", max_splits=1), 0), pa.int64())
        return pa.table({"dst": dst, "src": pc.cast(b["src"], pa.int64())})

    agg = grouped_sum_parts(
        links.map_batches(_parse_dst, batch_format="pyarrow"),
        ["dst"], ["src"], count_col="n_inlinks", fanin=8)
    return agg.map_batches(
        lambda b: pa.table({"dst": b["dst"], "sum_src": b["src"],
                            "n_inlinks": b["n_inlinks"]}),
        batch_format="pyarrow")


LINK_GRAPH_SQL = """
WITH n AS (SELECT count(*) AS c FROM documents),
h AS (
    SELECT doc_id,
           '<html><body><p>intro</p>'
           || '<a href="https://d' || CAST((doc_id*31 + 97) % (SELECT c FROM n) AS VARCHAR) || '.example.com/page">x</a>'
           || '<a href="https://d' || CAST((doc_id*31 + 194) % (SELECT c FROM n) AS VARCHAR) || '.example.com/page">y</a>'
           || '<a href="https://d' || CAST((doc_id*31 + 291) % (SELECT c FROM n) AS VARCHAR) || '.example.com/page">z</a>'
           || '</body></html>' AS html
    FROM documents),
l AS (
    SELECT doc_id AS src,
           unnest(regexp_extract_all(html, 'href="([^"]*)"', 1)) AS link
    FROM h),
d AS (
    SELECT src,
           CAST(regexp_extract(link, '^https://d(\\d+)\\.', 1) AS BIGINT) AS dst
    FROM l)
SELECT dst, CAST(sum(src) AS BIGINT) AS sum_src, count(*) AS n_inlinks
FROM d GROUP BY dst
"""


def q_pagerank_docs(sf_dir: str):
    """Integer fixed-point PageRank (5 iterations, damping 0.85, scale
    1e9) over the deterministic doc link graph: per iteration ONE hash
    join (ranks onto edges by src) + ONE hashpart grouped sum by dst —
    the join-based distributed form, no rank-vector broadcast
    (``stages/graph.py:pagerank``). Bit-exact vs the unrolled SQL replay
    (int64 floor division throughout)."""
    import numpy as np
    import pyarrow.parquet as _pq

    from ..stages.graph import pagerank

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
    return pagerank(edges, nodes, node_col="doc_id", iters=5,
                    num_partitions=4, fanin=4)


def _pagerank_sql(iters: int = 5, scale: int = 10 ** 9, damp: int = 85,
                  den: int = 100) -> str:
    tele = (den - damp) * scale // den
    parts = [f"""
WITH n AS (SELECT count(*) AS c FROM documents),
e AS (
    SELECT d.doc_id AS src,
           (d.doc_id*31 + 97*j.j) % (SELECT c FROM n) AS dst
    FROM documents d CROSS JOIN (VALUES (1), (2), (3)) AS j(j)),
deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
it0 AS (SELECT doc_id AS v, CAST({scale} AS BIGINT) AS r FROM documents)"""]
    for k in range(1, iters + 1):
        parts.append(f""",
it{k} AS (
    SELECT d.doc_id AS v,
           {tele} + COALESCE(SUM(({damp} * r.r) // ({den} * g.outdeg)), 0) AS r
    FROM documents d
    LEFT JOIN e ON e.dst = d.doc_id
    LEFT JOIN it{k - 1} r ON r.v = e.src
    LEFT JOIN deg g ON g.src = e.src
    GROUP BY d.doc_id)""")
    parts.append(f"""
SELECT v AS doc_id, CAST(r AS BIGINT) AS pr_e9 FROM it{iters}""")
    return "".join(parts)


PAGERANK_SQL = _pagerank_sql()


def q_cusum_events(sf_dir: str):
    """Two-sided CUSUM changepoint statistic per event_type series
    (``stages/rate.py:cusum``): target 50.00, slack 2.00, alarm threshold
    200.00, all in integer cents. The recursion collapses to cumsum +
    running-min (one vectorized pass per partition, ONE hash(series)
    shuffle); the SQL oracle replays it with two window passes."""
    from ..stages.rate import cusum

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
    from ..stages.postings import build_postings

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
    from ..stages.correlate import lagged_correlation
    from ..stages.rollup import rollup

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
    from ..stages.textstats import normalize_text_batch

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
    from ..stages.quantiles import mad_outliers
    from ..stages.rollup import rollup

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

    from ..stages.graph import grouped_sum_parts
    from ..stages.urls import canonicalize_urls_batch

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

    from ..stages.diffing import snapshot_diff
    from ..stages.graph import grouped_sum_parts

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
    from ..stages.rollup import rollup
    from ..stages.smoothing import holt_fixed_point

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
    SELECT n.series_id, n.bucket, n.y, n.idx,
           (r.level + r.trend)
             + CAST(floor(CAST(n.y - r.level - r.trend AS DOUBLE) / 8.0)
                    AS BIGINT) AS level,
           r.trend + CAST(floor(CAST(
               ((r.level + r.trend)
                + CAST(floor(CAST(n.y - r.level - r.trend AS DOUBLE) / 8.0)
                       AS BIGINT))
               - r.level - r.trend AS DOUBLE) / 16.0) AS BIGINT) AS trend,
           r.level + r.trend AS forecast
    FROM rec r JOIN numbered n
      ON n.series_id = r.series_id AND n.idx = r.idx + 1
)
SELECT series_id, bucket, y, level, trend, forecast FROM rec
"""


def q_theil_sen_15m(sf_dir: str):
    """Theil-Sen robust trend per series over the 15m tier
    (``stages/quantiles.py:theil_sen``): 2x median of all pairwise
    slopes; IEEE float64 division on both sides, order statistics with
    (slope, dv, db) tie-break, tier rows only (O(n^2) pairs stay
    partition-local)."""
    from ..stages.quantiles import theil_sen
    from ..stages.rollup import rollup

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
    from ..stages.graph import grouped_sum_parts

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
    from ..stages.funnel import funnel

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
    from ..stages.funnel import cohort_retention

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
    from ..stages.pivot import pivot_counts

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

    from ..stages.rollup import rollup

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

    from ..stages.cooccur import cooccurrence

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
    from ..stages.bpe import train_bpe
    from ..stages.graph import grouped_sum_parts

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
    from ..stages.quantiles import percentile_rank
    from ..stages.rollup import rollup

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
    from ..stages.bpe import tokenize_docs, train_bpe
    from ..stages.graph import grouped_sum_parts

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
    from ..stages.quantiles import top_share

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
    from ..stages.quantiles import winsorize
    from ..stages.rollup import rollup

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
    from ..stages.rollup import rollup
    from ..stages.windows import rolling_median

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
    from ..stages.cdc import upsert_latest

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


def q_cms_heavy_hitters_docs(sf_dir: str):
    """Count-min sketch of corpus token frequencies
    (``stages/sketches.py:cms_token_counts``): per-block depth x width
    integer cells merged ADDITIVELY (no token leaves its block), final
    <=depth*width-row sketch broadcast via ray.put; the exact counts
    (one hash(token) shuffle) verify the one-sided error. md5-u64 token
    hashes + hash61 row buckets keep the whole sketch SQL-replayable."""
    from ..stages.sketches import cms_token_counts

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"]).repartition(4)
    return cms_token_counts(ds, depth=4, width=32, num_partitions=4)


def _cms_sql(depth: int = 4, width: int = 32) -> str:
    from ..stages.sampling import hash61_sql

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
    from ..stages.zorder import zorder_zone_maps

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
    from ..stages.zorder import spread16_sql

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
    from ..stages.correlate import autocorrelation
    from ..stages.rollup import rollup

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
    from ..stages.cube import grouping_sets_sum

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
    from ..stages.integrity import grouped_checksum

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
    from ..stages.integrity import fold_sql
    from ..stages.sampling import MOD61

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
    from ..stages.funnel import event_transitions

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
    from ..stages.bloom import bloom_semi_join

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
    from ..stages.sampling import hash61_sql

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

    from ..stages.graph import triangle_counts

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
    from ..stages.ordering import training_order

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id"]).repartition(8)
    return training_order(ds, salt=41, num_buckets=64)


def _training_order_sql() -> str:
    from ..stages.sampling import hash61_sql

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
    from ..stages.graph import grouped_sum_parts

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
    from ..stages.similarity import (embedding_matrix,
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
    from ..stages.curation import cap_per_group

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
    from ..stages.curation import mixture_order

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "source"]).repartition(4)
    return mixture_order(ds, {"src0": 4, "src1": 2}, salt=13,
                         num_partitions=2)


def _mixture_order_sql() -> str:
    from ..stages.sampling import hash61_sql

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
    from ..stages.rate import gap_profile

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
    from ..stages.joins import interval_count_join

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
    from ..stages.intervals import interval_union

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
    from ..stages.skyline import skyline2d

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
    from ..stages.diffing import streak_profile

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
    from ..stages.joins import anti_join

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
    from ..stages.ordering import group_concat

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
    from ..stages.correlate import ols_slope

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
    from ..stages.quantiles import weighted_median

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


def q_sax_events(sf_dir: str):
    """SAX symbolic representation (``stages/sax.py:sax_symbols``): each
    event_type's cents series PAA-reduced over 2-day windows, each
    segment mean mapped to an a–d range-quartile symbol by exact integer
    cross-multiplication, strings assembled zero-copy."""
    from ..stages.sax import sax_symbols

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
    from ..stages.quantiles import gini_dispersion

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
    from ..stages.integrity import benford_audit

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
    from ..stages.textstats import kwic

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
    from ..stages.abtest import mann_whitney

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
    from ..stages.windows import sliding_distinct

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
    from ..stages.cdc import survivorship_merge

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
    from ..stages.similarity import embedding_covariance

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

    from ..stages.retrieval import (lexical_scores, query_term_df,
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
    from ..stages.similarity import centroid_classify

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
    from ..stages.similarity import kmeans_integer, semantic_prune

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
    from ..stages.neighbors import mutual_nn_pairs

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
    from ..stages.neighbors import kth_nn_distance

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
    from ..stages.decompose import classical_decompose
    from ..stages.gapfill import gapfill
    from ..stages.rollup import rollup

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
    from ..stages.rate import hysteresis_alerts

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
    from ..stages.coverage import greedy_coverage

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

    from ..stages.vocab import term_drift

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
    from ..stages.windows import session_paths

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
    from ..stages.graph import grouped_sum_parts

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

    from ..stages.graph import grouped_sum_parts
    from ..stages.similarity import centroid_classify

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

    from ..stages.graph import grouped_sum_parts

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

    from ..stages.graph import grouped_sum_parts

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

    from ..stages.graph import grouped_sum_parts
    from ..stages.similarity import kmeans_integer

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


def q_lttb_fidelity_events(sf_dir: str):
    """Downsample QUALITY audit — the fidelity report a charting /
    retention pipeline runs before trusting a tier's LTTB selection:
    per series, the exact integer reconstruction error of the n_out=50
    LTTB selection (linear interpolation between selected positions,
    e6 fixed-point with truncating division; selected points score 0).
    Same per-series groupby shape as the kernel queries; the fidelity
    pass is one vectorized ``searchsorted`` bracket + interp per group.
    Output: (event_type, n_pts, n_sel, sum_err_e6, max_err_e6)."""
    ds = _events_cents(sf_dir)

    def _fid(tbl: pa.Table) -> pa.Table:
        idx = pc.sort_indices(tbl, sort_keys=[
            ("ts_us", "ascending"), ("event_id", "ascending")])
        tbl = tbl.take(idx)
        y = tbl["cents"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(y)
        out = downsample_table(tbl, "lttb", 50, x_col=None,
                               y_col="cents", presorted=True)
        eid = tbl["event_id"].to_numpy(zero_copy_only=False)
        sel = np.isin(eid, out["event_id"].to_numpy(
            zero_copy_only=False))
        pos = np.flatnonzero(sel)
        p = np.arange(n, dtype=np.int64)
        j = np.searchsorted(pos, p, side="right") - 1
        p0 = pos[np.clip(j, 0, len(pos) - 1)]
        p1 = pos[np.clip(j + 1, 0, len(pos) - 1)]
        interior = ~sel
        gap = np.where(interior, p1 - p0, 1)
        num = y[p0] * (p1 - p) + y[p1] * (p - p0)
        yhat = (num * 1_000_000) // gap  # all-positive: trunc == //
        err = np.where(interior, np.abs(y * 1_000_000 - yhat), 0)
        return pa.table({
            "event_type": tbl["event_type"].slice(0, 1),
            "n_pts": pa.array([n], pa.int64()),
            "n_sel": pa.array([int(sel.sum())], pa.int64()),
            "sum_err_e6": pa.array([int(err.sum())], pa.int64()),
            "max_err_e6": pa.array([int(err.max()) if n else 0],
                                   pa.int64()),
        })

    return ds.groupby("event_type").map_groups(_fid,
                                               batch_format="pyarrow")


def _lttb_fidelity_sql(n_out: int) -> str:
    return f"""
WITH RECURSIVE {_events_s_cte(None)},
sp AS MATERIALIZED (SELECT event_type, rn AS p, rn AS x, cy, cnt AS m2
                    FROM s),
{_lttb_phase2_sql(n_out, "sp")},
picked AS (
    SELECT DISTINCT event_type, rn FROM (
        SELECT event_type, a AS rn FROM rec
        UNION ALL SELECT event_type, m2 - 1 FROM meta
    )
),
o AS (
    SELECT s.event_type, s.rn, s.cy,
           CASE WHEN p.rn IS NOT NULL THEN 1 ELSE 0 END AS is_sel
    FROM s LEFT JOIN picked p
      ON p.event_type = s.event_type AND p.rn = s.rn
),
w AS (
    SELECT event_type, rn, cy, is_sel,
           last_value(CASE WHEN is_sel = 1 THEN rn END IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY rn
                     ROWS UNBOUNDED PRECEDING) AS p0,
           last_value(CASE WHEN is_sel = 1 THEN cy END IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY rn
                     ROWS UNBOUNDED PRECEDING) AS y0,
           first_value(CASE WHEN is_sel = 1 THEN rn END IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY rn
                     ROWS BETWEEN CURRENT ROW
                              AND UNBOUNDED FOLLOWING) AS p1,
           first_value(CASE WHEN is_sel = 1 THEN cy END IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY rn
                     ROWS BETWEEN CURRENT ROW
                              AND UNBOUNDED FOLLOWING) AS y1
    FROM o
),
e AS (
    SELECT event_type, is_sel,
           CASE WHEN is_sel = 1 THEN 0
                ELSE abs(cy * 1000000
                         - (y0 * (p1 - rn) + y1 * (rn - p0)) * 1000000
                           // (p1 - p0)) END AS err
    FROM w
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_pts,
       CAST(sum(is_sel) AS BIGINT) AS n_sel,
       CAST(sum(err) AS BIGINT) AS sum_err_e6,
       CAST(max(err) AS BIGINT) AS max_err_e6
FROM e GROUP BY 1
"""


def q_assoc_rules_events(sf_dir: str):
    """Market-basket association rules over user event-type baskets
    (``stages/baskets.py:association_rules``): support, integer permille
    confidence and exact-rational lift for every ordered type pair. One
    hash(user) shuffle collapsing to CONSTANT-size bitmask-histogram
    partials (2^|types| bins); all rule algebra runs on those bounded
    counts."""
    from ..stages.baskets import association_rules

    ds = _read_parquet_clean(f"{sf_dir}/events.parquet",
                             columns=["user_id", "event_type"])
    types = sorted(ds.map_batches(
        lambda b: pa.table({"t": pc.unique(b["event_type"])}),
        batch_format="pyarrow").to_pandas()["t"].unique())
    return association_rules(ds, list(types), num_partitions=4)


ASSOC_RULES_SQL = """
WITH b AS (SELECT DISTINCT user_id, event_type FROM events),
n AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n FROM events),
na AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_a
       FROM b GROUP BY 1),
pair AS (
    SELECT x.event_type AS antecedent, y.event_type AS consequent,
           CAST(count(*) AS BIGINT) AS n_ab
    FROM b x JOIN b y ON x.user_id = y.user_id
                     AND x.event_type <> y.event_type
    GROUP BY 1, 2
)
SELECT p.antecedent, p.consequent, n.n, a1.n_a, a2.n_a AS n_b, p.n_ab,
       CAST((1000 * p.n_ab) // a1.n_a AS BIGINT) AS conf_pm,
       CAST(n.n * p.n_ab AS BIGINT) AS lift_num,
       CAST(a1.n_a * a2.n_a AS BIGINT) AS lift_den,
       CAST(n.n * p.n_ab AS DOUBLE) / (a1.n_a * a2.n_a) AS lift
FROM pair p
JOIN na a1 ON a1.event_type = p.antecedent
JOIN na a2 ON a2.event_type = p.consequent
CROSS JOIN n
"""


def q_haar_energy_15m(sf_dir: str):
    """Integer Haar wavelet energy profile of the 15m tier
    (``stages/wavelet.py:haar_energy``): 3 lifting-scheme levels
    (``s=(a+b)//2``, ``d=a−b`` — exactly reversible), per level the
    detail count / Σ|d| / max|d| plus the final-approximation row. One
    hash(series) shuffle; each level a vectorized even/odd slice."""
    from ..stages.rollup import rollup
    from ..stages.wavelet import haar_energy

    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    rolled = rollup(ev.map_batches(_series, batch_format="pyarrow"),
                    900 * US)
    return haar_energy(rolled, levels=3, num_partitions=4)


def _haar_sql(levels: int = 3) -> str:
    ctes = [f"""r AS (
    SELECT event_type AS series_id,
           (epoch_us(ts) // {900 * US}) * {900 * US} AS bucket,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
    FROM events GROUP BY 1, 2
)""", """v0 AS (
    SELECT series_id,
           row_number() OVER (PARTITION BY series_id
                              ORDER BY bucket) - 1 AS rn, v
    FROM r
)"""]
    sels = []
    for l in range(1, levels + 1):
        ctes.append(f"""p{l} AS (
    SELECT series_id, rn // 2 AS rn,
           max(CASE WHEN rn % 2 = 0 THEN v END) AS a,
           max(CASE WHEN rn % 2 = 1 THEN v END) AS b,
           count(*) AS m
    FROM v{l - 1} GROUP BY 1, 2
)""")
        ctes.append(f"""v{l} AS (
    SELECT series_id, rn,
           CASE WHEN m = 2 THEN (a + b) // 2 ELSE a END AS v
    FROM p{l}
)""")
        sels.append(f"""SELECT series_id, CAST({l} AS BIGINT) AS level,
       CAST(count(*) FILTER (m = 2) AS BIGINT) AS n,
       CAST(COALESCE(sum(abs(a - b)) FILTER (m = 2), 0) AS BIGINT)
           AS sum_abs,
       CAST(COALESCE(max(abs(a - b)) FILTER (m = 2), 0) AS BIGINT)
           AS max_abs
FROM p{l} GROUP BY 1""")
    sels.append(f"""SELECT series_id, CAST(0 AS BIGINT) AS level,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(abs(v)) AS BIGINT) AS sum_abs,
       CAST(max(abs(v)) AS BIGINT) AS max_abs
FROM v{levels} GROUP BY 1""")
    return ("WITH " + ",\n".join(ctes) + "\n"
            + "\nUNION ALL\n".join(sels))


HAAR_ENERGY_SQL = _haar_sql(3)


def q_attribution_events(sf_dir: str):
    """Last-touch attribution
    (``stages/joins.py:last_touch_attribution``): each purchase credits
    the same user's most recent non-purchase event within 1h (equal-ts
    ties to the larger event id — the exact `max_by(type, struct(x,id))`
    semantic, deterministic where plain as-of is not); unmatched
    purchases count as 'none'. One hash(user) shuffle collapsing to
    type-vocabulary partials."""
    from ..stages.joins import last_touch_attribution

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

    return last_touch_attribution(
        ds.map_batches(_prep, batch_format="pyarrow"),
        target="purchase", window_us=3_600_000_000, num_partitions=4)


ATTRIBUTION_SQL = """
WITH p AS (
    SELECT user_id, epoch_us(ts) AS x, event_id
    FROM events WHERE event_type = 'purchase'
),
e AS (
    SELECT user_id, epoch_us(ts) AS x, event_id, event_type
    FROM events WHERE event_type <> 'purchase'
),
m AS (
    SELECT p.event_id AS pid,
           max(struct_pack(x := e.x, eid := e.event_id,
                           ty := e.event_type)) AS mx
    FROM p LEFT JOIN e
      ON e.user_id = p.user_id AND e.x <= p.x
     AND p.x - e.x <= 3600000000
    GROUP BY 1
)
SELECT COALESCE((mx).ty, 'none') AS event_type,
       CAST(count(*) AS BIGINT) AS n
FROM m GROUP BY 1
"""


def q_amoc_changepoint_15m(sf_dir: str):
    """At-Most-One-Change mean-shift detection per series over the 15m
    tier (``stages/rate.py:amoc_changepoint``): the split maximizing
    ``f(k) = S1²/k + S2²/(n−k)`` (exact int prefix sums; squares pinned
    in float64 with the identical SQL expression tree; ties to the
    smallest k) — the closed-form companion to ``cusum_events``."""
    from ..stages.rate import amoc_changepoint
    from ..stages.rollup import rollup

    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    rolled = rollup(ev.map_batches(_series, batch_format="pyarrow"),
                    900 * US)
    return amoc_changepoint(rolled, num_partitions=4)


AMOC_SQL = f"""
WITH r AS (
    SELECT event_type AS series_id,
           (epoch_us(ts) // {900 * US}) * {900 * US} AS bucket,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s
    FROM events GROUP BY 1, 2
),
o AS (
    SELECT series_id,
           row_number() OVER (PARTITION BY series_id
                              ORDER BY bucket) AS p,
           count(*) OVER (PARTITION BY series_id) AS n,
           sum(s) OVER (PARTITION BY series_id ORDER BY bucket
                        ROWS UNBOUNDED PRECEDING) AS s1,
           sum(s) OVER (PARTITION BY series_id) AS stot
    FROM r
),
f AS (
    SELECT series_id, p AS k, n, s1, stot - s1 AS s2,
           (CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) / p
           + (CAST(stot - s1 AS DOUBLE) * CAST(stot - s1 AS DOUBLE))
             / (n - p) AS f
    FROM o WHERE p < n
),
b AS (
    SELECT series_id, k, n, s1, s2, f,
           row_number() OVER (PARTITION BY series_id
                              ORDER BY f DESC, k) AS rn
    FROM f
)
SELECT series_id, CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
       CAST(s1 AS BIGINT) AS s1, CAST(s2 AS BIGINT) AS s2, f
FROM b WHERE rn = 1
"""


def q_boolean_search_docs(sf_dir: str):
    """Conjunctive (AND) boolean retrieval: docs containing ALL query
    terms — the postings-intersection primitive, here as a single
    shuffle-free ``map_batches`` pass (distinct matched-term count per
    doc == |query| via `index_in` + bitmask OR). Returns
    ``(doc_id, n_terms)`` with the doc's total term count as evidence."""
    terms = ["hash", "join", "merge"]
    tarr = pa.array(terms, pa.string())
    nt = len(terms)
    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"])

    def _and(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b["text"], pattern=" ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.values
        off = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        row = np.repeat(np.arange(b.num_rows, dtype=np.int64),
                        np.diff(off))
        tidx = pc.fill_null(pc.index_in(flat, value_set=tarr),
                            -1).to_numpy(zero_copy_only=False).astype(
            np.int64)
        known = tidx >= 0
        mask = np.zeros(b.num_rows, np.int64)
        np.bitwise_or.at(mask, row[known],
                         np.int64(1) << tidx[known])
        hit = mask == (1 << nt) - 1
        nonempty = ~pc.equal(flat, "").to_numpy(zero_copy_only=False)
        ntok = np.bincount(row[nonempty], minlength=b.num_rows)
        return pa.table({
            "doc_id": pc.cast(b["doc_id"], pa.int64()).filter(
                pa.array(hit)),
            "n_terms": pa.array(ntok[hit].astype(np.int64)),
        })

    return ds.map_batches(_and, batch_format="pyarrow")


BOOLEAN_SEARCH_SQL = """
WITH tok AS (
    SELECT doc_id, t.term
    FROM documents, unnest(string_split(text, ' ')) AS t(term)
    WHERE t.term <> ''
),
hit AS (
    SELECT doc_id
    FROM tok WHERE term IN ('hash', 'join', 'merge')
    GROUP BY 1 HAVING count(DISTINCT term) = 3
)
SELECT h.doc_id, CAST(count(*) AS BIGINT) AS n_terms
FROM hit h JOIN tok t ON t.doc_id = h.doc_id
GROUP BY 1
"""


def q_top_movers_events(sf_dir: str):
    """Day-over-day top movers: per series the per-day cent sums, the
    consecutive-PRESENT-day diff via one sorted lag pass, and the 5
    largest absolute moves (ties |diff| desc, series asc, day asc).
    Rollup partials → one hash(series) shuffle → bounded top-k funnel."""
    from ..stages.rollup import rollup

    DAY = 86_400_000_000
    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    rolled = rollup(ev.map_batches(_series, batch_format="pyarrow"), DAY)
    from ..arrow_utils import stable_part_codes

    def _add_part(b: pa.Table) -> pa.Table:
        h = stable_part_codes(b["series_id"], None)
        return b.append_column(
            "__part", pa.array((h % np.uint64(128)).astype(np.int32)))

    def _diff(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        sid_type = t["series_id"].type
        empty = pa.table({"series_id": pa.array([], sid_type),
                          "day_us": pa.array([], pa.int64()),
                          "prev_sum": pa.array([], pa.int64()),
                          "cur_sum": pa.array([], pa.int64()),
                          "diff": pa.array([], pa.int64()),
                          "absdiff": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        t = t.take(pc.sort_indices(t, sort_keys=[
            ("series_id", "ascending"), ("bucket", "ascending")]))
        sid = t["series_id"]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = sid.dictionary_encode().indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        y = t["sum_y"].to_numpy(zero_copy_only=False).astype(np.int64)
        bk = t["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
        same = codes[1:] == codes[:-1] if len(codes) > 1 else \
            np.empty(0, bool)
        idx = np.flatnonzero(same) + 1
        d = y[idx] - y[idx - 1]
        return pa.table({"series_id": sid.take(pa.array(idx)),
                         "day_us": pa.array(bk[idx]),
                         "prev_sum": pa.array(y[idx - 1]),
                         "cur_sum": pa.array(y[idx]),
                         "diff": pa.array(d),
                         "absdiff": pa.array(np.abs(d))})

    diffs = (rolled.map_batches(_add_part, batch_format="pyarrow")
             .repartition(2).groupby("__part")
             .map_groups(_diff, batch_format="pyarrow"))
    top = (diffs.sort(key=["absdiff", "series_id", "day_us"],
                      descending=[True, False, False]).limit(5)
           .to_pandas())
    top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
    return top.drop(columns=["absdiff"])


TOP_MOVERS_SQL = f"""
WITH r AS (
    SELECT event_type AS series_id,
           (epoch_us(ts) // {86_400_000_000}) * {86_400_000_000}
               AS day_us,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s
    FROM events GROUP BY 1, 2
),
d AS (
    SELECT series_id, day_us,
           lag(s) OVER (PARTITION BY series_id ORDER BY day_us)
               AS prev_sum,
           s AS cur_sum
    FROM r
),
f AS (
    SELECT series_id, day_us, prev_sum, cur_sum,
           cur_sum - prev_sum AS diff,
           row_number() OVER (ORDER BY abs(cur_sum - prev_sum) DESC,
                              series_id, day_us) AS rank
    FROM d WHERE prev_sum IS NOT NULL
)
SELECT series_id, day_us, prev_sum, cur_sum, diff, rank
FROM f WHERE rank <= 5
"""


def q_rfm_segments_users(sf_dir: str):
    """RFM customer segmentation over purchase events: per user the
    recency (last purchase ts), frequency (count) and monetary (cent
    sum) aggregates, quintile-scored by VALUE against exact discrete
    20/40/60/80 order statistics (the ``exact_quantiles`` machinery,
    all three dimensions as three series in ONE pass) — value-based
    buckets are tie-deterministic without any global rank sort. Output
    ``(user_id, last_ts, cnt, sum_cents, r, f, m, rfm)``."""
    from ..stages.graph import grouped_sum_parts
    from ..stages.quantiles import exact_quantiles

    ds = _read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_type", "value"])

    def _pur(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b["event_type"], "purchase"))
        return pa.table({
            "user_id": pc.cast(t["user_id"], pa.int64()),
            "neg_ts": pc.multiply(pc.cast(t["ts"].cast(pa.int64()),
                                          pa.int64()),
                                  pa.scalar(-1, pa.int64())),
            "cents": pc.cast(pc.round(pc.multiply(t["value"], 100.0),
                                      ndigits=0), pa.int64()),
        })

    # max(ts) == -min(-ts): min is a SUM-like... not mergeable by sum —
    # use the grouped min trick via Arrow group_by inside a hashpart pass
    pur = ds.map_batches(_pur, batch_format="pyarrow")
    from ..arrow_utils import rename_agg, stable_part_codes

    def _agg(b: pa.Table) -> pa.Table:
        b = b.select([c for c in b.column_names if c != "__part"])
        g = b.group_by(["user_id"]).aggregate(
            [("neg_ts", "min"), ("cents", "sum"), ("cents", "count")])
        return rename_agg(g, {"user_id": "user_id",
                              "neg_ts_min": "neg_ts",
                              "cents_sum": "sum_cents",
                              "cents_count": "cnt"})

    def _agg2(g: pa.Table) -> pa.Table:
        t = g.select([c for c in g.column_names if c != "__part"])
        m = t.group_by(["user_id"]).aggregate(
            [("neg_ts", "min"), ("sum_cents", "sum"), ("cnt", "sum")])
        return rename_agg(m, {"user_id": "user_id",
                              "neg_ts_min": "neg_ts",
                              "sum_cents_sum": "sum_cents",
                              "cnt_sum": "cnt"})

    def _part(b: pa.Table) -> pa.Table:
        b = _agg(b)
        h = stable_part_codes(b["user_id"], None)
        return b.append_column(
            "__part", pa.array((h % np.uint64(256)).astype(np.int32)))

    pu = (pur.map_batches(_part, batch_format="pyarrow")
          .repartition(4).groupby("__part")
          .map_groups(_agg2, batch_format="pyarrow")).materialize()

    def _dims(b: pa.Table) -> pa.Table:
        uid = b["user_id"]
        last_ts = pc.multiply(b["neg_ts"], pa.scalar(-1, pa.int64()))
        parts = []
        for name, col in (("r", last_ts), ("f", b["cnt"]),
                          ("m", b["sum_cents"])):
            parts.append(pa.table({
                "series_id": pa.array([name] * b.num_rows),
                "bucket": pc.cast(uid, pa.int64()),
                "sum_y": pc.cast(col, pa.int64())}))
        return pa.concat_tables(parts)

    th = exact_quantiles(pu.map_batches(_dims, batch_format="pyarrow"),
                         probs=(20, 40, 60, 80), num_partitions=2
                         ).to_pandas().set_index("series_id")
    T = {d: [int(th.loc[d][f"p{p}"]) for p in (20, 40, 60, 80)]
         for d in ("r", "f", "m")}

    def _score(b: pa.Table) -> pa.Table:
        last_ts = pc.multiply(b["neg_ts"],
                              pa.scalar(-1, pa.int64())).to_numpy(
            zero_copy_only=False)
        cnt = b["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = b["sum_cents"].to_numpy(zero_copy_only=False).astype(
            np.int64)

        def quint(v, d):
            s = np.ones(len(v), np.int64)
            for t in T[d]:
                s += (v > t)
            return s

        r = quint(last_ts, "r")
        f = quint(cnt, "f")
        m = quint(cents, "m")
        return pa.table({
            "user_id": b["user_id"],
            "last_ts": pa.array(last_ts.astype(np.int64)),
            "cnt": pa.array(cnt), "sum_cents": pa.array(cents),
            "r": pa.array(r), "f": pa.array(f), "m": pa.array(m),
            "rfm": pa.array(100 * r + 10 * f + m)})

    return pu.map_batches(_score, batch_format="pyarrow")


RFM_SQL = """
WITH pu AS (
    SELECT user_id, max(epoch_us(ts)) AS last_ts,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS sum_cents
    FROM events WHERE event_type = 'purchase' GROUP BY 1
),
dims AS (
    SELECT 'r' AS d, last_ts AS v, user_id FROM pu
    UNION ALL SELECT 'f', cnt, user_id FROM pu
    UNION ALL SELECT 'm', sum_cents, user_id FROM pu
),
o AS (
    SELECT d, v,
           row_number() OVER (PARTITION BY d ORDER BY v, user_id) - 1
               AS rk,
           count(*) OVER (PARTITION BY d) AS n
    FROM dims
),
t AS (
    SELECT d,
           max(CASE WHEN rk = (n - 1) * 20 // 100 THEN v END) AS t20,
           max(CASE WHEN rk = (n - 1) * 40 // 100 THEN v END) AS t40,
           max(CASE WHEN rk = (n - 1) * 60 // 100 THEN v END) AS t60,
           max(CASE WHEN rk = (n - 1) * 80 // 100 THEN v END) AS t80
    FROM o GROUP BY 1
),
s AS (
    SELECT pu.*,
           CAST(1 + (pu.last_ts > tr.t20)::INT + (pu.last_ts > tr.t40)::INT
                + (pu.last_ts > tr.t60)::INT + (pu.last_ts > tr.t80)::INT
                AS BIGINT) AS r,
           CAST(1 + (pu.cnt > tf.t20)::INT + (pu.cnt > tf.t40)::INT
                + (pu.cnt > tf.t60)::INT + (pu.cnt > tf.t80)::INT
                AS BIGINT) AS f,
           CAST(1 + (pu.sum_cents > tm.t20)::INT
                + (pu.sum_cents > tm.t40)::INT
                + (pu.sum_cents > tm.t60)::INT
                + (pu.sum_cents > tm.t80)::INT AS BIGINT) AS m
    FROM pu, t tr, t tf, t tm
    WHERE tr.d = 'r' AND tf.d = 'f' AND tm.d = 'm'
)
SELECT user_id, last_ts, cnt, sum_cents, r, f, m,
       100 * r + 10 * f + m AS rfm
FROM s
"""


def q_bigram_familiarity_docs(sf_dir: str):
    """Corpus-fit quality scoring
    (``stages/vocab.py:bigram_familiarity``): per doc the mean corpus
    frequency of its adjacent-token bigrams (truncating permille) — the
    count-based perplexity stand-in that flags out-of-distribution
    docs. Two vocabulary-sized exchanges (bigram grouped sum, then a
    hash JOIN of occurrences against counts — no broadcast), one
    hash(doc) grouped sum."""
    from ..stages.vocab import bigram_familiarity

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"])
    return bigram_familiarity(ds, fanin=4, num_partitions=4)


BIGRAM_FAM_SQL = """
WITH occ AS (
    SELECT doc_id, t.bg
    FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
         unnest(list_transform(range(1, array_length(l)),
                               i -> l[i] || ' ' || l[i + 1]))
             AS t(bg)
),
c AS (SELECT bg, CAST(count(*) AS BIGINT) AS c FROM occ GROUP BY 1)
SELECT o.doc_id, CAST(count(*) AS BIGINT) AS n_bg,
       CAST(sum(c.c) AS BIGINT) AS fam_sum,
       CAST((1000 * sum(c.c)) // count(*) AS BIGINT) AS fam_mean_pm
FROM occ o JOIN c USING (bg)
GROUP BY 1
"""


def q_json_props_events(sf_dir: str):
    """Semi-structured extraction: the JSON ``props`` payload is parsed
    with the SAME RE2 engine on both sides (`pc.extract_regex` /
    DuckDB `regexp_extract`) — no Python json loop — and the extracted
    integer rolls up per (event_type, k//10 decade): count + exact sum.
    Map-side Arrow group_by collapse before one bounded-key shuffle."""
    from ..stages.graph import grouped_sum_parts

    ds = _read_parquet_clean(f"{sf_dir}/events.parquet",
                             columns=["event_type", "props"])

    def _extract(b: pa.Table) -> pa.Table:
        m = pc.extract_regex(b["props"], r'"k":\s*(?P<k>-?\d+)')
        kstr = pc.struct_field(m, "k")
        valid = pc.is_valid(kstr)
        t = pa.table({"event_type": b["event_type"],
                      "k": pc.cast(kstr, pa.int64())}).filter(valid)
        kv = t["k"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "event_type": t["event_type"],
            "kbin": pa.array(np.where(kv >= 0, kv // 10,
                                      -((-kv) // 10))),  # trunc like //
            "sum_k": pa.array(kv)})

    ex = ds.map_batches(_extract, batch_format="pyarrow")
    return grouped_sum_parts(ex, ["event_type", "kbin"], ["sum_k"],
                             count_col="n", fanin=2)


JSON_PROPS_SQL = """
WITH e AS (
    SELECT event_type,
           CAST(regexp_extract(props, '"k":\\s*(-?\\d+)', 1) AS BIGINT)
               AS k
    FROM events
    WHERE regexp_extract(props, '"k":\\s*(-?\\d+)', 1) <> ''
)
SELECT event_type, k // 10 AS kbin,
       CAST(sum(k) AS BIGINT) AS sum_k,
       CAST(count(*) AS BIGINT) AS n
FROM e GROUP BY 1, 2
"""


def q_conversion_latency_users(sf_dir: str):
    """Time-to-convert distribution: the funnel's fully-converted users
    (depth 3) reduced to exact discrete latency quantiles
    (p50/p90/p99 of ``purchase_ts − view_ts``) plus count and exact sum
    — the product-metric composition of ``funnel`` and
    ``exact_quantiles``. One extra bounded aggregation beyond the
    funnel's single hash(user) shuffle."""
    from ..stages.funnel import funnel
    from ..stages.quantiles import exact_quantiles

    ds = _read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_type", "ts"]).map_batches(
        lambda b: pa.table({"user_id": b["user_id"],
                            "t": b["event_type"],
                            "x": pc.cast(b["ts"], pa.int64())}),
        batch_format="pyarrow")
    fu = funnel(ds, ["view", "click", "purchase"], num_partitions=2)

    def _lat(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b["depth"], 3))
        lat = pc.subtract(t["step3_us"], t["step1_us"])
        return pa.table({
            "series_id": pa.array(["all"] * t.num_rows),
            "bucket": pc.cast(t["user_id"], pa.int64()),
            "sum_y": pc.cast(lat, pa.int64())})

    # converted-user rows only: user-count sized, safe to pin once so
    # the quantile and total passes don't re-run the funnel
    lats = fu.map_batches(_lat, batch_format="pyarrow").materialize()
    q = exact_quantiles(lats, probs=(50, 90, 99), num_partitions=2)

    def _tot(b: pa.Table) -> pa.Table:
        return pa.table({
            "series_id": pa.array(["all"]),
            "n_part": pa.array([b.num_rows], pa.int64()),
            "sum_part": pa.array(
                [int(b["sum_y"].to_numpy(
                    zero_copy_only=False).sum()) if b.num_rows else 0],
                pa.int64())})

    tot = lats.map_batches(_tot, batch_format="pyarrow").to_pandas()
    qdf = q.to_pandas()
    qdf["sum_lat"] = np.int64(tot["sum_part"].sum())
    return qdf


CONVERSION_LATENCY_SQL = """
WITH e AS (
    SELECT user_id, event_type, epoch_us(ts) AS x FROM events
),
s1 AS (SELECT user_id, min(x) AS t1 FROM e
       WHERE event_type = 'view' GROUP BY user_id),
s2 AS (SELECT e.user_id, min(x) AS t2 FROM e JOIN s1 USING (user_id)
       WHERE event_type = 'click' AND x > t1 GROUP BY e.user_id),
s3 AS (SELECT e.user_id, min(x) AS t3 FROM e JOIN s2 USING (user_id)
       WHERE event_type = 'purchase' AND x > t2 GROUP BY e.user_id),
lat AS (
    SELECT s1.user_id, t3 - t1 AS l
    FROM s1 JOIN s2 USING (user_id) JOIN s3 USING (user_id)
),
o AS (
    SELECT l, user_id,
           row_number() OVER (ORDER BY l, user_id) - 1 AS rk,
           count(*) OVER () AS n
    FROM lat
)
SELECT 'all' AS series_id, CAST(max(n) AS BIGINT) AS n,
       max(CASE WHEN rk = (n - 1) * 50 // 100 THEN l END) AS p50,
       max(CASE WHEN rk = (n - 1) * 90 // 100 THEN l END) AS p90,
       max(CASE WHEN rk = (n - 1) * 99 // 100 THEN l END) AS p99,
       CAST(sum(l) AS BIGINT) AS sum_lat
FROM o
"""


def q_ks_test_events(sf_dir: str):
    """Exact two-sample Kolmogorov–Smirnov statistic for every
    event-type pair: ``D = max_v |A(v)·n_b − B(v)·n_a| / (n_a·n_b)``
    with the cross-multiplied numerator in exact int64 and the argmax
    cent (smallest on ties). The distribution-shift companion to
    ``mann_whitney_events``. Scale shape: ONE (type, cent) grouped sum
    — the key space is bounded by the VALUE DOMAIN (cents), not the row
    count — then the pairwise ECDF scan runs on that bounded table."""
    import pandas as pd

    from ..stages.graph import grouped_sum_parts

    ev = _events_cents(sf_dir)

    def _tc(b: pa.Table) -> pa.Table:
        return pa.table({"t": b["event_type"], "v": b["cents"]})

    counts = grouped_sum_parts(ev.map_batches(_tc,
                                              batch_format="pyarrow"),
                               ["t", "v"], [], count_col="n",
                               fanin=2).to_pandas()
    # bounded by |types| x |cent domain| rows, never by event count
    vals = np.sort(counts["v"].unique())
    types = sorted(counts["t"].unique())
    cum = {}
    tot = {}
    for t in types:
        sub = counts[counts["t"] == t]
        h = np.zeros(len(vals), np.int64)
        h[np.searchsorted(vals, sub["v"].to_numpy())] = \
            sub["n"].to_numpy()
        cum[t] = np.cumsum(h)
        tot[t] = int(cum[t][-1])
    rows = []
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            num = np.abs(cum[a] * tot[b] - cum[b] * tot[a])
            best = int(num.argmax())  # ties -> smallest cent
            ks_num = int(num[best])
            ks_den = tot[a] * tot[b]
            rows.append((a, b, tot[a], tot[b], ks_num, ks_den,
                         int(vals[best]), float(ks_num) / float(ks_den)))
    out = pd.DataFrame(rows, columns=[
        "type_a", "type_b", "n_a", "n_b", "ks_num", "ks_den",
        "at_cent", "ks"])
    for c in ("n_a", "n_b", "ks_num", "ks_den", "at_cent"):
        out[c] = out[c].astype(np.int64)
    return out


KS_TEST_SQL = """
WITH c AS (
    SELECT event_type AS t, CAST(round(value * 100) AS BIGINT) AS v,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY 1, 2
),
vals AS (SELECT DISTINCT v FROM c),
types AS (SELECT DISTINCT t FROM c),
grid AS (SELECT t, v FROM types, vals),
cum AS (
    SELECT g.t, g.v,
           CAST(sum(COALESCE(c.n, 0)) OVER (
               PARTITION BY g.t ORDER BY g.v) AS BIGINT) AS cle
    FROM grid g LEFT JOIN c ON c.t = g.t AND c.v = g.v
),
nt AS (SELECT t, CAST(sum(n) AS BIGINT) AS n FROM c GROUP BY 1),
d AS (
    SELECT a.t AS ta, b.t AS tb, a.v,
           abs(a.cle * nb.n - b.cle * na.n) AS num
    FROM cum a JOIN cum b ON a.v = b.v AND a.t < b.t
    JOIN nt na ON na.t = a.t
    JOIN nt nb ON nb.t = b.t
),
k AS (SELECT ta, tb, CAST(max(num) AS BIGINT) AS ks_num
      FROM d GROUP BY 1, 2),
at AS (
    SELECT d.ta, d.tb, k.ks_num, CAST(min(d.v) AS BIGINT) AS at_cent
    FROM d JOIN k ON d.ta = k.ta AND d.tb = k.tb AND d.num = k.ks_num
    GROUP BY 1, 2, 3
)
SELECT at.ta AS type_a, at.tb AS type_b, na.n AS n_a, nb.n AS n_b,
       at.ks_num, CAST(na.n * nb.n AS BIGINT) AS ks_den, at.at_cent,
       CAST(at.ks_num AS DOUBLE) / (na.n * nb.n) AS ks
FROM at JOIN nt na ON na.t = at.ta JOIN nt nb ON nb.t = at.tb
"""


def q_markov_baseline_events(sf_dir: str):
    """Next-action baseline evaluation: from the per-user transition
    matrix (``event_transitions``), the always-predict-the-argmax
    policy per source type — prediction (count desc, type asc ties),
    support, hits, and truncating permille accuracy. The transition
    matrix is \\|types\\|² BOUNDED rows; the policy evaluation runs on
    those counts, never re-touching events."""
    import pandas as pd

    from ..stages.funnel import event_transitions

    ds = _read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"]).repartition(8)

    def _cols(b: pa.Table) -> pa.Table:
        return pa.table({"user_id": b["user_id"],
                         "event_type": b["event_type"],
                         "event_id": b["event_id"],
                         "ts_us": pc.cast(b["ts"], pa.int64())})

    tm = event_transitions(ds.map_batches(_cols, batch_format="pyarrow"),
                           num_partitions=4, fanin=2).to_pandas()
    rows = []
    for src, g in tm.groupby("src"):
        g = g.sort_values(["c", "dst"], ascending=[False, True])
        pred = g.iloc[0]["dst"]
        hits = int(g.iloc[0]["c"])
        support = int(g["c"].sum())
        rows.append((src, pred, support, hits,
                     (1000 * hits) // support))
    out = pd.DataFrame(rows, columns=["src", "pred", "support", "hits",
                                      "acc_pm"]).sort_values(
        "src").reset_index(drop=True)
    for c in ("support", "hits", "acc_pm"):
        out[c] = out[c].astype(np.int64)
    return out


MARKOV_BASELINE_SQL = """
WITH e AS (
    SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us
    FROM events
),
s AS (
    SELECT user_id, event_type,
           lag(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts_us, event_id) AS prev
    FROM e
),
tm AS (
    SELECT prev AS src, event_type AS dst, count(*) AS c
    FROM s WHERE prev IS NOT NULL GROUP BY 1, 2
),
r AS (
    SELECT src, dst, c,
           row_number() OVER (PARTITION BY src
                              ORDER BY c DESC, dst) AS rn,
           CAST(sum(c) OVER (PARTITION BY src) AS BIGINT) AS support
    FROM tm
)
SELECT src, dst AS pred, support, CAST(c AS BIGINT) AS hits,
       CAST((1000 * c) // support AS BIGINT) AS acc_pm
FROM r WHERE rn = 1
"""


def q_gapfill_linear_15m(sf_dir: str):
    """Linear-interpolation gap fill over the 15m tier
    (``stages/gapfill.py:gapfill_linear``): missing buckets take the e6
    fixed-point interpolation between bracketing present buckets
    (window-index distances, truncating division); present rows carry
    y·10⁶ exactly. The third fill mode beside zero/ffill."""
    from ..stages.gapfill import gapfill_linear
    from ..stages.rollup import rollup

    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    rolled = rollup(ev.map_batches(_series, batch_format="pyarrow"),
                    900 * US)
    return gapfill_linear(rolled, 900 * US, num_partitions=4)


GAPFILL_LINEAR_SQL = f"""
WITH r AS (
    SELECT event_type AS series_id,
           (epoch_us(ts) // {900 * US}) * {900 * US} AS bucket,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s
    FROM events GROUP BY 1, 2
),
b AS (SELECT series_id, min(bucket) AS mn, max(bucket) AS mx
      FROM r GROUP BY 1),
g AS (SELECT series_id, unnest(range(mn, mx + 1, {900 * US}))
          AS bucket, mn
      FROM b),
f AS (
    SELECT g.series_id, g.bucket, r.s,
           (g.bucket - g.mn) // {900 * US} AS k
    FROM g LEFT JOIN r USING (series_id, bucket)
),
w AS (
    SELECT series_id, bucket, s, k,
           last_value(CASE WHEN s IS NOT NULL THEN k END IGNORE NULLS)
               OVER (PARTITION BY series_id ORDER BY bucket
                     ROWS UNBOUNDED PRECEDING) AS k0,
           last_value(CASE WHEN s IS NOT NULL THEN s END IGNORE NULLS)
               OVER (PARTITION BY series_id ORDER BY bucket
                     ROWS UNBOUNDED PRECEDING) AS y0,
           first_value(CASE WHEN s IS NOT NULL THEN k END IGNORE NULLS)
               OVER (PARTITION BY series_id ORDER BY bucket
                     ROWS BETWEEN CURRENT ROW
                              AND UNBOUNDED FOLLOWING) AS k1,
           first_value(CASE WHEN s IS NOT NULL THEN s END IGNORE NULLS)
               OVER (PARTITION BY series_id ORDER BY bucket
                     ROWS BETWEEN CURRENT ROW
                              AND UNBOUNDED FOLLOWING) AS y1
    FROM f
)
SELECT series_id, bucket,
       CAST(CASE WHEN s IS NOT NULL THEN s * 1000000
                 ELSE (y0 * (k1 - k) + y1 * (k - k0)) * 1000000
                      // (k1 - k0) END AS BIGINT) AS y_e6,
       s IS NULL AS is_gap
FROM w
"""


def q_welch_t_events(sf_dir: str):
    """Welch's unequal-variance t statistic for every event-type pair —
    the moments-based member of the shift-test family (alongside
    ``mann_whitney_events`` ranks and ``ks_test_events`` ECDFs). One
    grouped sum to \\|types\\| sufficient-statistic rows (n, Σx, Σx²);
    the t chain (means, variances, sqrt) is the identical pinned IEEE
    expression tree on both sides."""
    import pandas as pd

    from ..stages.graph import grouped_sum_parts

    ev = _events_cents(sf_dir)

    def _mom(b: pa.Table) -> pa.Table:
        v = b["cents"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"t": b["event_type"], "s": pa.array(v),
                         "ss": pa.array(v * v)})

    mom = grouped_sum_parts(ev.map_batches(_mom, batch_format="pyarrow"),
                            ["t"], ["s", "ss"], count_col="n",
                            fanin=2).to_pandas()  # |types| rows
    mom = mom.sort_values("t").reset_index(drop=True)
    rows = []
    for i in range(len(mom)):
        for j in range(i + 1, len(mom)):
            a, b = mom.iloc[i], mom.iloc[j]
            na, nb = int(a["n"]), int(b["n"])
            sa, sb = int(a["s"]), int(b["s"])
            ssa, ssb = int(a["ss"]), int(b["ss"])
            ma = float(sa) / na
            mb = float(sb) / nb
            va = (float(ssa) - float(sa) * ma) / (na - 1)
            vb = (float(ssb) - float(sb) * mb) / (nb - 1)
            tstat = (ma - mb) / np.sqrt(va / na + vb / nb)
            rows.append((a["t"], b["t"], na, nb, sa, sb, float(tstat)))
    out = pd.DataFrame(rows, columns=["type_a", "type_b", "n_a", "n_b",
                                      "sum_a", "sum_b", "t"])
    for c in ("n_a", "n_b", "sum_a", "sum_b"):
        out[c] = out[c].astype(np.int64)
    return out


WELCH_T_SQL = """
WITH m AS (
    SELECT event_type AS t, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s,
           CAST(sum(CAST(round(value * 100) AS BIGINT)
                    * CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS ss
    FROM events GROUP BY 1
)
SELECT a.t AS type_a, b.t AS type_b, a.n AS n_a, b.n AS n_b,
       a.s AS sum_a, b.s AS sum_b,
       (CAST(a.s AS DOUBLE) / a.n - CAST(b.s AS DOUBLE) / b.n)
       / sqrt(((CAST(a.ss AS DOUBLE)
                - CAST(a.s AS DOUBLE) * (CAST(a.s AS DOUBLE) / a.n))
               / (a.n - 1)) / a.n
              + ((CAST(b.ss AS DOUBLE)
                  - CAST(b.s AS DOUBLE) * (CAST(b.s AS DOUBLE) / b.n))
                 / (b.n - 1)) / b.n) AS t
FROM m a JOIN m b ON a.t < b.t
"""


def q_fleet_bands_1h(sf_dir: str):
    """Fleet percentile ribbon: per 1h bucket, the exact discrete
    p10/p50/p90 of the per-series sums ACROSS series — the
    "thousands of hosts as one chart" dashboard band. Pure reuse of the
    ``exact_quantiles`` machinery with the TIME BUCKET as the group key
    (one hash(bucket) shuffle; groups are fleet-sized, not
    history-sized)."""
    from ..stages.quantiles import exact_quantiles
    from ..stages.rollup import rollup

    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    rolled = rollup(ev.map_batches(_series, batch_format="pyarrow"), W1H)

    def _pivot(b: pa.Table) -> pa.Table:
        sid = b["series_id"]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        # order col must be int64: dictionary-code the series name — the
        # quantile VALUE picks are order-insensitive among ties anyway
        codes = sid.dictionary_encode().indices
        return pa.table({"series_id": b["bucket"],
                         "bucket": pc.cast(codes, pa.int64()),
                         "sum_y": b["sum_y"]})

    q = exact_quantiles(rolled.map_batches(_pivot, batch_format="pyarrow"),
                        probs=(10, 50, 90), num_partitions=4)

    def _rename(b: pa.Table) -> pa.Table:
        return b.rename_columns(["bucket"] + b.column_names[1:])

    return q.map_batches(_rename, batch_format="pyarrow")


FLEET_BANDS_SQL = f"""
WITH r AS (
    SELECT event_type AS series_id,
           (epoch_us(ts) // {W1H}) * {W1H} AS bucket,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s
    FROM events GROUP BY 1, 2
),
o AS (
    SELECT bucket, s,
           row_number() OVER (PARTITION BY bucket
                              ORDER BY s, series_id) - 1 AS rk,
           count(*) OVER (PARTITION BY bucket) AS n
    FROM r
)
SELECT bucket, CAST(max(n) AS BIGINT) AS n,
       max(CASE WHEN rk = (n - 1) * 10 // 100 THEN s END) AS p10,
       max(CASE WHEN rk = (n - 1) * 50 // 100 THEN s END) AS p50,
       max(CASE WHEN rk = (n - 1) * 90 // 100 THEN s END) AS p90
FROM o GROUP BY 1
"""


def q_tier_consistency_events(sf_dir: str):
    """Cascade trust audit: per series the exact cent totals of the
    15m, 1h and 1d tiers plus equality bits — the invariant every
    retention cascade must preserve (associative merges lose nothing).
    Three rollups collapse to \\|series\\| rows each; the comparison is
    a bounded merge."""
    import pandas as pd

    from ..stages.rollup import rollup

    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    src = ev.map_batches(_series, batch_format="pyarrow").materialize()
    totals = {}
    for name, w in (("t15m", 900 * US), ("t1h", W1H),
                    ("t1d", 86_400_000_000)):
        rolled = rollup(src, w)

        def _tot(b: pa.Table) -> pa.Table:
            return pa.table({"series_id": b["series_id"],
                             "s": b["sum_y"]})

        from ..stages.graph import grouped_sum_parts

        t = grouped_sum_parts(rolled.map_batches(_tot,
                                                 batch_format="pyarrow"),
                              ["series_id"], ["s"], count_col="nb",
                              fanin=2).to_pandas()  # |series| rows
        totals[name] = t.set_index("series_id")
    idx = sorted(totals["t15m"].index)
    rows = []
    for sid in idx:
        s15 = int(totals["t15m"].loc[sid, "s"])
        s1h = int(totals["t1h"].loc[sid, "s"])
        s1d = int(totals["t1d"].loc[sid, "s"])
        rows.append((sid, s15, s1h, s1d,
                     int(totals["t15m"].loc[sid, "nb"]),
                     int(totals["t1h"].loc[sid, "nb"]),
                     int(totals["t1d"].loc[sid, "nb"]),
                     bool(s15 == s1h == s1d)))
    out = pd.DataFrame(rows, columns=[
        "series_id", "sum_15m", "sum_1h", "sum_1d", "nb_15m", "nb_1h",
        "nb_1d", "consistent"])
    for c in out.columns[1:-1]:
        out[c] = out[c].astype(np.int64)
    return out


TIER_CONSISTENCY_SQL = f"""
WITH e AS (
    SELECT event_type AS series_id, epoch_us(ts) AS x,
           CAST(round(value * 100) AS BIGINT) AS y
    FROM events
),
t15 AS (SELECT series_id, CAST(sum(y) AS BIGINT) AS s,
               CAST(count(DISTINCT x // {900 * US}) AS BIGINT) AS nb
        FROM e GROUP BY 1),
t1h AS (SELECT series_id, CAST(sum(y) AS BIGINT) AS s,
               CAST(count(DISTINCT x // {W1H}) AS BIGINT) AS nb
        FROM e GROUP BY 1),
t1d AS (SELECT series_id, CAST(sum(y) AS BIGINT) AS s,
               CAST(count(DISTINCT x // {86_400_000_000}) AS BIGINT)
                   AS nb
        FROM e GROUP BY 1)
SELECT t15.series_id, t15.s AS sum_15m, t1h.s AS sum_1h,
       t1d.s AS sum_1d, t15.nb AS nb_15m, t1h.nb AS nb_1h,
       t1d.nb AS nb_1d,
       (t15.s = t1h.s AND t1h.s = t1d.s) AS consistent
FROM t15 JOIN t1h USING (series_id) JOIN t1d USING (series_id)
"""


def q_ed1_pairs_docs(sf_dir: str):
    """String-similarity join (``stages/strsim.py:ed1_pairs``): every
    vocabulary term pair within Levenshtein distance 1 via FastSS
    deletion neighborhoods — one hash(variant) shuffle of
    neighborhood-sized rows, in-bucket exact verify, hash-partitioned
    pair distinct. The typo-mining / spelling-variant primitive."""
    from ..stages.graph import grouped_sum_parts
    from ..stages.strsim import ed1_pairs

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["text"])

    def _toks(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b["text"], pattern=" ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.values
        flat = flat.filter(pc.not_equal(flat, ""))
        u = pc.unique(flat)
        # fixture synthesis (not the operator hot path): the toy vocab
        # has no true near-spellings, so every token of length >= 5
        # contributes its last-char-dropped "typo" variant — the
        # deterministic rule the SQL oracle replays
        longs = u.filter(pc.greater_equal(pc.utf8_length(u), 5))
        typo = pa.array([t[:-1] for t in longs.to_pylist()],
                        pa.string())  # vocab-sized, not corpus-sized
        return pa.table({"token": pa.concat_arrays(
            [u.combine_chunks() if isinstance(u, pa.ChunkedArray) else u,
             typo])})

    vocab = grouped_sum_parts(ds.map_batches(_toks,
                                             batch_format="pyarrow"),
                              ["token"], [], count_col="c", fanin=2)
    vocab = vocab.map_batches(
        lambda b: pa.table({"token": b["token"]}),
        batch_format="pyarrow")
    return ed1_pairs(vocab, num_partitions=4)


ED1_PAIRS_SQL = """
WITH base AS (
    SELECT DISTINCT t.term AS tok
    FROM documents, unnest(string_split(text, ' ')) AS t(term)
    WHERE t.term <> ''
),
v AS (
    SELECT DISTINCT tok FROM (
        SELECT tok FROM base
        UNION ALL
        SELECT substr(tok, 1, length(tok) - 1) FROM base
        WHERE length(tok) >= 5
    )
)
SELECT a.tok AS a, b.tok AS b
FROM v a JOIN v b
  ON a.tok < b.tok AND levenshtein(a.tok, b.tok) <= 1
"""


def q_graph_degree_stats_docs(sf_dir: str):
    """Graph topology profile over the deterministic link graph
    (`_graph_targets` edges): out/in-degree distributions (including
    the 0-in-degree class) and edge reciprocity — the completeness
    companion to pagerank / triangles / components. All steps are
    bounded grouped counts: distinct edges → per-node degrees → tiny
    degree histogram; reciprocity via canonical-pair counts. Output
    ``(kind, k, n)`` rows ('out'/'in' degree classes; one 'recip' row
    with k = reciprocated directed edges, n = distinct non-self
    edges)."""
    import pandas as pd
    import pyarrow.parquet as _pq

    from ..stages.graph import grouped_sum_parts

    n_docs = _pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id"]).repartition(8)

    def _edges(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = _graph_targets(d, n_docs)
        src = np.concatenate([d, d, d])
        dst = np.concatenate(ts)
        return pa.table({"src": pa.array(src), "dst": pa.array(dst)})

    edges = grouped_sum_parts(ds.map_batches(_edges,
                                             batch_format="pyarrow"),
                              ["src", "dst"], [], count_col="m",
                              fanin=4)  # distinct directed edges

    def _clean(b: pa.Table) -> pa.Table:
        return pa.table({"src": b["src"], "dst": b["dst"]})

    e = edges.map_batches(_clean, batch_format="pyarrow").materialize()

    outdeg = grouped_sum_parts(e.map_batches(
        lambda b: pa.table({"src": b["src"]}), batch_format="pyarrow"),
        ["src"], [], count_col="d", fanin=2)
    indeg = grouped_sum_parts(e.map_batches(
        lambda b: pa.table({"dst": b["dst"]}), batch_format="pyarrow"),
        ["dst"], [], count_col="d", fanin=2)

    def _hist(ds_, col):
        t = grouped_sum_parts(ds_.map_batches(
            lambda b: pa.table({"k": b["d"]}), batch_format="pyarrow"),
            ["k"], [], count_col="n", fanin=2).to_pandas()
        return t  # bounded: degree classes

    oh = _hist(outdeg, "d")
    ih = _hist(indeg, "d")
    nodes_with_in = int(ih["n"].sum())
    rows = [("out", int(r["k"]), int(r["n"])) for _, r in oh.iterrows()]
    rows += [("in", int(r["k"]), int(r["n"])) for _, r in ih.iterrows()]
    if n_docs - nodes_with_in > 0:
        rows.append(("in", 0, n_docs - nodes_with_in))

    def _canon(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table({"lo": pa.array(np.minimum(s, d)),
                         "hi": pa.array(np.maximum(s, d))})

    pairs = grouped_sum_parts(e.map_batches(_canon,
                                            batch_format="pyarrow"),
                              ["lo", "hi"], [], count_col="c",
                              fanin=2).to_pandas()
    mutual_pairs = int((pairs["c"] == 2).sum())
    nonself_edges = int(pairs["c"].sum())
    rows.append(("recip", 2 * mutual_pairs, nonself_edges))
    out = pd.DataFrame(rows, columns=["kind", "k", "n"]).sort_values(
        ["kind", "k"]).reset_index(drop=True)
    out["k"] = out["k"].astype(np.int64)
    out["n"] = out["n"].astype(np.int64)
    return out


GRAPH_DEGREE_SQL = """
WITH n AS (SELECT count(*) AS c FROM documents),
raw AS (
    SELECT doc_id AS src,
           (doc_id * 31 + 97 * j.j) % (SELECT c FROM n) AS dst
    FROM documents, generate_series(1, 3) j(j)
),
e AS (SELECT DISTINCT src, dst FROM raw),
od AS (SELECT src, count(*) AS d FROM e GROUP BY 1),
idg AS (SELECT dst, count(*) AS d FROM e GROUP BY 1),
oh AS (SELECT 'out' AS kind, CAST(d AS BIGINT) AS k,
              CAST(count(*) AS BIGINT) AS n
       FROM od GROUP BY 2),
ih AS (SELECT 'in' AS kind, CAST(d AS BIGINT) AS k,
              CAST(count(*) AS BIGINT) AS n
       FROM idg GROUP BY 2),
iz AS (SELECT 'in' AS kind, CAST(0 AS BIGINT) AS k,
              CAST((SELECT c FROM n) - count(*) AS BIGINT) AS n
       FROM idg HAVING (SELECT c FROM n) > count(*)),
p AS (
    SELECT least(src, dst) AS lo, greatest(src, dst) AS hi,
           count(*) AS c
    FROM e WHERE src <> dst GROUP BY 1, 2
),
r AS (SELECT 'recip' AS kind,
             CAST(2 * count(*) FILTER (c = 2) AS BIGINT) AS k,
             CAST(sum(c) AS BIGINT) AS n
      FROM p)
SELECT * FROM oh UNION ALL SELECT * FROM ih
UNION ALL SELECT * FROM iz UNION ALL SELECT * FROM r
"""


def q_sax_motifs_events(sf_dir: str):
    """Time-series motif discovery over the SAX representation: each
    series' most frequent symbol TRIGRAM (ties to the lexicographically
    smallest) with its count — the classic symbolic-motif primitive
    built on ``sax_symbols``. The trigram pass touches one short string
    per SERIES (tier-reduced), never raw points."""
    import pandas as pd

    base = q_sax_events(sf_dir).to_pandas()  # one row per series
    rows = []
    from collections import Counter
    for _, r in base.iterrows():
        s = r["sax"]
        grams = Counter(s[i:i + 3] for i in range(len(s) - 2))
        if not grams:
            continue
        motif, cnt = sorted(grams.items(),
                            key=lambda kv: (-kv[1], kv[0]))[0]
        rows.append((r["series_id"], motif, cnt, len(s) - 2))
    out = pd.DataFrame(rows, columns=["series_id", "motif", "cnt",
                                      "n_grams"])
    out["cnt"] = out["cnt"].astype(np.int64)
    out["n_grams"] = out["n_grams"].astype(np.int64)
    return out.sort_values("series_id").reset_index(drop=True)


def q_ohlc_15m(sf_dir: str):
    """OHLC candles per (series, 15m bucket): open/close = first/last
    value in (ts, event_id) order (the deterministic struct-argmin/max
    semantic), high/low = exact extremes, plus count — the financial /
    monitoring candle view that complements M4's extreme-POSITION
    selection. One hash(series) shuffle, sorted segment pass with
    `reduceat` extremes and first/last gathers."""
    from ..arrow_utils import stable_part_codes

    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"],
                         "x": b["ts_us"], "eid": b["event_id"],
                         "y": b["cents"]})

    ds = ev.map_batches(_series, batch_format="pyarrow")
    mod = 2 * 64

    def _add_part(b: pa.Table) -> pa.Table:
        h = stable_part_codes(b["series_id"], None)
        return b.append_column(
            "__part", pa.array((h % np.uint64(mod)).astype(np.int32)))

    def _candles(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        sid_type = t["series_id"].type
        empty = pa.table({"series_id": pa.array([], sid_type),
                          "bucket": pa.array([], pa.int64()),
                          "open": pa.array([], pa.int64()),
                          "high": pa.array([], pa.int64()),
                          "low": pa.array([], pa.int64()),
                          "close": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        x = t["x"].to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = x // (900 * US) * (900 * US)
        t = t.append_column("bucket", pa.array(bucket))
        t = t.take(pc.sort_indices(t, sort_keys=[
            ("series_id", "ascending"), ("bucket", "ascending"),
            ("x", "ascending"), ("eid", "ascending")]))
        sid = t["series_id"]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = sid.dictionary_encode().indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        bk = t["bucket"].to_numpy(zero_copy_only=False)
        y = t["y"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(y)
        change = np.ones(n, dtype=bool)
        change[1:] = (codes[1:] != codes[:-1]) | (bk[1:] != bk[:-1])
        first = np.flatnonzero(change)
        last = np.r_[first[1:] - 1, n - 1]
        return pa.table({
            "series_id": sid.take(pa.array(first)),
            "bucket": pa.array(bk[first]),
            "open": pa.array(y[first]),
            "high": pa.array(np.maximum.reduceat(y, first)),
            "low": pa.array(np.minimum.reduceat(y, first)),
            "close": pa.array(y[last]),
            "n": pa.array((last - first + 1).astype(np.int64))})

    return (ds.map_batches(_add_part, batch_format="pyarrow")
            .repartition(2).groupby("__part")
            .map_groups(_candles, batch_format="pyarrow"))


OHLC_SQL = f"""
WITH e AS (
    SELECT event_type AS series_id, epoch_us(ts) AS x, event_id,
           CAST(round(value * 100) AS BIGINT) AS y
    FROM events
)
SELECT series_id, (x // {900 * US}) * {900 * US} AS bucket,
       (min(struct_pack(x := x, eid := event_id, y := y))).y AS open,
       max(y) AS high, min(y) AS low,
       (max(struct_pack(x := x, eid := event_id, y := y))).y AS close,
       CAST(count(*) AS BIGINT) AS n
FROM e GROUP BY 1, 2
"""


def q_ltv_curve_users(sf_dir: str):
    """Customer lifetime-value curve: per week offset since each
    purchaser's FIRST purchase week — active purchasers, exact cent
    revenue, and the cumulative revenue (ints cumsummed over the
    BOUNDED offset axis). One hash(user) shuffle collapsing to
    (user, offset) partials inside the pass, one tiny offset grouped
    sum."""
    import pandas as pd

    from ..arrow_utils import stable_part_codes
    from ..stages.graph import grouped_sum_parts

    WEEK = 7 * 86_400_000_000
    ds = _read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_type", "value"])

    def _pur(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b["event_type"], "purchase"))
        return pa.table({
            "user_id": pc.cast(t["user_id"], pa.int64()),
            "week": pa.array(t["ts"].cast(pa.int64()).to_numpy(
                zero_copy_only=False) // WEEK),
            "cents": pc.cast(pc.round(pc.multiply(t["value"], 100.0),
                                      ndigits=0), pa.int64())})

    pur = ds.map_batches(_pur, batch_format="pyarrow")
    mod = 2 * 64

    def _add_part(b: pa.Table) -> pa.Table:
        h = stable_part_codes(b["user_id"], None)
        return b.append_column(
            "__part", pa.array((h % np.uint64(mod)).astype(np.int32)))

    def _offsets(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        empty = pa.table({"woff": pa.array([], pa.int64()),
                          "rev": pa.array([], pa.int64()),
                          "u": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        t = t.take(pc.sort_indices(t, sort_keys=[
            ("user_id", "ascending"), ("week", "ascending")]))
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        wk = t["week"].to_numpy(zero_copy_only=False)
        c = t["cents"].to_numpy(zero_copy_only=False).astype(np.int64)
        change = np.ones(len(uid), dtype=bool)
        change[1:] = uid[1:] != uid[:-1]
        first_wk = wk[np.flatnonzero(change)][
            (np.cumsum(change) - 1)]
        off = wk - first_wk
        # rows are (user, week)-sorted, so (user, offset) groups are
        # CONTIGUOUS — segment reduction, no composite key to overflow
        pair_change = np.ones(len(uid), dtype=bool)
        pair_change[1:] = (uid[1:] != uid[:-1]) | (off[1:] != off[:-1])
        fi = np.flatnonzero(pair_change)
        rev = np.add.reduceat(c, fi)
        return pa.table({"woff": pa.array(off[fi]),
                         "rev": pa.array(rev),
                         "u": pa.array(np.ones(len(fi), np.int64))})

    per_off = grouped_sum_parts(
        pur.map_batches(_add_part, batch_format="pyarrow")
        .repartition(2).groupby("__part")
        .map_groups(_offsets, batch_format="pyarrow"),
        ["woff"], ["rev", "u"], count_col=None,
        fanin=2).to_pandas()  # bounded: week-span rows
    per_off = per_off.sort_values("woff").reset_index(drop=True)
    per_off["cum_rev"] = per_off["rev"].cumsum()
    for c in ("woff", "rev", "u", "cum_rev"):
        per_off[c] = per_off[c].astype(np.int64)
    return per_off


LTV_CURVE_SQL = f"""
WITH p AS (
    SELECT user_id, epoch_us(ts) // {7 * 86_400_000_000} AS week,
           CAST(round(value * 100) AS BIGINT) AS cents
    FROM events WHERE event_type = 'purchase'
),
f AS (SELECT user_id, min(week) AS w0 FROM p GROUP BY 1),
o AS (
    SELECT p.user_id, p.week - f.w0 AS woff,
           CAST(sum(p.cents) AS BIGINT) AS rev
    FROM p JOIN f USING (user_id) GROUP BY 1, 2
),
a AS (
    SELECT woff, CAST(sum(rev) AS BIGINT) AS rev,
           CAST(count(*) AS BIGINT) AS u
    FROM o GROUP BY 1
)
SELECT woff, rev, u,
       CAST(sum(rev) OVER (ORDER BY woff
                           ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cum_rev
FROM a
"""


def q_clamped_balance_events(sf_dir: str):
    """Inventory / queue-depth simulation: the floor-at-zero running
    balance ``b_i = max(0, b_{i-1} + d_i)`` — a SEQUENTIAL recurrence
    made distributable by the prefix identity
    ``b_i = S_i − min(0, min_{j≤i} S_j)`` (cumsum + running min, both
    vectorizable and window-expressible). Signed deltas are the
    deterministic fixture ``even event_id → +cents, odd → −cents``.
    Output per series: n, Σd, the final prefix floor, final and max
    balance — all exact int64. One hash(series) shuffle, per-segment
    cumsum/cummin pass."""
    from ..arrow_utils import stable_part_codes

    ev = _events_cents(sf_dir)

    def _signed(b: pa.Table) -> pa.Table:
        c = b["cents"].to_numpy(zero_copy_only=False).astype(np.int64)
        eid = b["event_id"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        d = np.where(eid % 2 == 0, c, -c)
        return pa.table({"series_id": b["event_type"],
                         "x": b["ts_us"], "eid": b["event_id"],
                         "d": pa.array(d)})

    ds = ev.map_batches(_signed, batch_format="pyarrow")
    mod = 2 * 64

    def _add_part(b: pa.Table) -> pa.Table:
        h = stable_part_codes(b["series_id"], None)
        return b.append_column(
            "__part", pa.array((h % np.uint64(mod)).astype(np.int32)))

    def _balance(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        sid_type = t["series_id"].type
        empty = pa.table({"series_id": pa.array([], sid_type),
                          "n": pa.array([], pa.int64()),
                          "sum_d": pa.array([], pa.int64()),
                          "min_prefix": pa.array([], pa.int64()),
                          "final_balance": pa.array([], pa.int64()),
                          "max_balance": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        t = t.take(pc.sort_indices(t, sort_keys=[
            ("series_id", "ascending"), ("x", "ascending"),
            ("eid", "ascending")]))
        sid = t["series_id"]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = sid.dictionary_encode().indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        d = t["d"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(d)
        change = np.ones(n, dtype=bool)
        change[1:] = codes[1:] != codes[:-1]
        seg = np.flatnonzero(change)
        ends = np.r_[seg[1:], n]
        rows = {k: [] for k in ("sid", "n", "sum", "mp", "fin", "mx")}
        for f, l in zip(seg, ends):  # series loop; inner fully vector
            S = np.cumsum(d[f:l])
            mp = np.minimum(np.minimum.accumulate(S), 0)
            b_ = S - mp
            rows["sid"].append(sid[int(f)].as_py())
            rows["n"].append(l - f)
            rows["sum"].append(int(S[-1]))
            rows["mp"].append(int(mp[-1]))
            rows["fin"].append(int(b_[-1]))
            rows["mx"].append(int(b_.max()))
        return pa.table({
            "series_id": pa.array(rows["sid"], sid_type),
            "n": pa.array(rows["n"], pa.int64()),
            "sum_d": pa.array(rows["sum"], pa.int64()),
            "min_prefix": pa.array(rows["mp"], pa.int64()),
            "final_balance": pa.array(rows["fin"], pa.int64()),
            "max_balance": pa.array(rows["mx"], pa.int64())})

    return (ds.map_batches(_add_part, batch_format="pyarrow")
            .repartition(2).groupby("__part")
            .map_groups(_balance, batch_format="pyarrow"))


CLAMPED_BALANCE_SQL = """
WITH e AS (
    SELECT event_type AS series_id, epoch_us(ts) AS x, event_id,
           CASE WHEN event_id % 2 = 0
                THEN CAST(round(value * 100) AS BIGINT)
                ELSE -CAST(round(value * 100) AS BIGINT) END AS d
    FROM events
),
s AS (
    SELECT series_id, x, event_id, d,
           CAST(sum(d) OVER (PARTITION BY series_id
                             ORDER BY x, event_id
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS S
    FROM e
),
m AS (
    SELECT series_id, d, S,
           CAST(least(min(S) OVER (PARTITION BY series_id
                                   ORDER BY x, event_id
                                   ROWS UNBOUNDED PRECEDING), 0)
                AS BIGINT) AS mp
    FROM s
)
SELECT series_id, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(d) AS BIGINT) AS sum_d,
       CAST(min(mp) AS BIGINT) AS min_prefix,
       CAST(sum(d) - min(mp) AS BIGINT) AS final_balance,
       CAST(max(S - mp) AS BIGINT) AS max_balance
FROM m GROUP BY 1
"""


def q_token_bucket_events(sf_dir: str):
    """Token-bucket / bounded-inventory simulation: the TWO-sided clamp
    recurrence ``b_i = min(C, max(0, b_{i-1} + d_i))`` (capacity C,
    bucket starts full). Unlike the one-sided floor walk
    (``clamped_balance_events``), the two-sided clamp has no running
    min/max closed form — but each step is the clamp-affine map
    ``phi(x) = min(h, max(l, x + a))`` and that family is CLOSED under
    composition (``a'=a1+a2, l'=max(l2, l1+a2),
    h'=min(h2, max(l2, h1+a2))``), i.e. an associative monoid. Per-row
    balances therefore come from a segmented Hillis-Steele scan over
    ``(a, l, h)`` triples — log2(n) rounds of whole-array NumPy
    combines, no per-row Python — the same monoid merge that combines
    per-block partials across nodes at cluster scale. Deltas: even
    event_id → +cents, odd → −cents; C = 25_000. Output per series:
    n, Σd, final/min/max balance, floor/ceiling saturation counts and
    total ceiling-spilled / floor-shortfall volume — all exact int64,
    internally consistent via ``final = C + Σd − spill + short``."""
    from ..arrow_utils import stable_part_codes

    CAP = 25_000
    ev = _events_cents(sf_dir)

    def _signed(b: pa.Table) -> pa.Table:
        c = b["cents"].to_numpy(zero_copy_only=False).astype(np.int64)
        eid = b["event_id"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        d = np.where(eid % 2 == 0, c, -c)
        return pa.table({"series_id": b["event_type"],
                         "x": b["ts_us"], "eid": b["event_id"],
                         "d": pa.array(d)})

    ds = ev.map_batches(_signed, batch_format="pyarrow")
    mod = 2 * 64

    def _add_part(b: pa.Table) -> pa.Table:
        h = stable_part_codes(b["series_id"], None)
        return b.append_column(
            "__part", pa.array((h % np.uint64(mod)).astype(np.int32)))

    def _bucket(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        sid_type = t["series_id"].type
        int_cols = ("n", "sum_d", "final_balance", "min_balance",
                    "max_balance", "n_empty", "n_full", "total_spill",
                    "total_shortfall")
        empty = pa.table(
            {"series_id": pa.array([], sid_type),
             **{c: pa.array([], pa.int64()) for c in int_cols}})
        if t.num_rows == 0:
            return empty
        t = t.take(pc.sort_indices(t, sort_keys=[
            ("series_id", "ascending"), ("x", "ascending"),
            ("eid", "ascending")]))
        sid = t["series_id"]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = sid.dictionary_encode().indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        d = t["d"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(d)
        # segmented Hillis-Steele scan over the clamp-affine monoid:
        # element i holds phi_i; after the scan, (a,l,h)[i] is the
        # composition phi_i o ... o phi_first-of-segment.
        a = d.copy()
        lo = np.zeros(n, np.int64)
        hi = np.full(n, CAP, np.int64)
        k = 1
        while k < n:
            same = codes[k:] == codes[:-k]
            a1, l1, h1 = a[:-k], lo[:-k], hi[:-k]
            a2, l2, h2 = a[k:], lo[k:], hi[k:]
            na = a1 + a2
            nl = np.maximum(l2, l1 + a2)
            nh = np.minimum(h2, np.maximum(l2, h1 + a2))
            a, lo, hi = a.copy(), lo.copy(), hi.copy()
            a[k:] = np.where(same, na, a2)
            lo[k:] = np.where(same, nl, l2)
            hi[k:] = np.where(same, nh, h2)
            k *= 2
        bal = np.minimum(hi, np.maximum(lo, CAP + a))
        starts = np.flatnonzero(
            np.r_[True, codes[1:] != codes[:-1]])
        ends = np.r_[starts[1:], n]
        prev = np.empty(n, np.int64)
        prev[1:] = bal[:-1]
        prev[starts] = CAP
        raw = prev + d
        spill = np.maximum(0, raw - CAP)
        short = np.maximum(0, -raw)
        out = {
            "series_id": pa.array(
                [sid[int(f)].as_py() for f in starts], sid_type),
            "n": ends - starts,
            "sum_d": np.add.reduceat(d, starts),
            "final_balance": bal[ends - 1],
            "min_balance": np.minimum.reduceat(bal, starts),
            "max_balance": np.maximum.reduceat(bal, starts),
            "n_empty": np.add.reduceat((bal == 0).astype(np.int64),
                                       starts),
            "n_full": np.add.reduceat((bal == CAP).astype(np.int64),
                                      starts),
            "total_spill": np.add.reduceat(spill, starts),
            "total_shortfall": np.add.reduceat(short, starts),
        }
        return pa.table({c: (v if isinstance(v, pa.Array)
                             else pa.array(np.asarray(v, np.int64)))
                         for c, v in out.items()})

    return (ds.map_batches(_add_part, batch_format="pyarrow")
            .repartition(2).groupby("__part")
            .map_groups(_bucket, batch_format="pyarrow"))


TOKEN_BUCKET_SQL = """
WITH RECURSIVE e AS (
    SELECT event_type AS series_id, epoch_us(ts) AS x, event_id,
           CASE WHEN event_id % 2 = 0
                THEN CAST(round(value * 100) AS BIGINT)
                ELSE -CAST(round(value * 100) AS BIGINT) END AS d
    FROM events
),
o AS (
    SELECT series_id, d,
           CAST(row_number() OVER (PARTITION BY series_id
                                   ORDER BY x, event_id) AS BIGINT) AS rn
    FROM e
),
r AS (
    SELECT series_id, CAST(0 AS BIGINT) AS rn,
           CAST(25000 AS BIGINT) AS bal,
           CAST(0 AS BIGINT) AS spill, CAST(0 AS BIGINT) AS short
    FROM (SELECT DISTINCT series_id FROM o)
    UNION ALL
    SELECT o.series_id, o.rn,
           least(25000, greatest(0, r.bal + o.d)),
           greatest(0, r.bal + o.d - 25000),
           greatest(0, -(r.bal + o.d))
    FROM r JOIN o ON o.series_id = r.series_id AND o.rn = r.rn + 1
),
agg AS (
    SELECT series_id,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(bal) AS BIGINT) AS min_balance,
           CAST(max(bal) AS BIGINT) AS max_balance,
           CAST(sum(CASE WHEN bal = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_empty,
           CAST(sum(CASE WHEN bal = 25000 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_full,
           CAST(sum(spill) AS BIGINT) AS total_spill,
           CAST(sum(short) AS BIGINT) AS total_shortfall
    FROM r WHERE rn >= 1 GROUP BY 1
),
sd AS (SELECT series_id, CAST(sum(d) AS BIGINT) AS sum_d
       FROM o GROUP BY 1),
fin AS (
    SELECT r.series_id, CAST(r.bal AS BIGINT) AS final_balance
    FROM r JOIN (SELECT series_id, max(rn) AS mx FROM r GROUP BY 1) f
      ON r.series_id = f.series_id AND r.rn = f.mx
)
SELECT agg.series_id, agg.n, sd.sum_d, fin.final_balance,
       agg.min_balance, agg.max_balance, agg.n_empty, agg.n_full,
       agg.total_spill, agg.total_shortfall
FROM agg
JOIN sd ON sd.series_id = agg.series_id
JOIN fin ON fin.series_id = agg.series_id
"""


def q_rdp_simplify_15m(sf_dir: str):
    """Ramer-Douglas-Peucker simplification of each series' 15m tier
    polyline (``stages/simplify.py``) — the tolerance-band downsampling
    family complementing the bin-based kernels. Exact integer geometry:
    keep/split decisions are ``cross^2 > eps^2 * |AB|^2`` on (bucket
    index, cents) int64 coordinates, so the kept set is bit-identical to
    the DuckDB recursive-CTE replay (one iteration per split depth,
    every active segment split in parallel). One hash(series) shuffle;
    per-partition split-stack walk with vectorized interior argmax."""
    from ..stages.rollup import rollup
    from ..stages.simplify import rdp_simplify

    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    rolled = rollup(ev.map_batches(_series, batch_format="pyarrow"),
                    900 * US)

    def _xi(b: pa.Table) -> pa.Table:
        bkt = b["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"series_id": b["series_id"],
                         "bucket": pa.array(bkt // (900 * US)),
                         "sum_y": b["sum_y"]})

    return rdp_simplify(rolled.map_batches(_xi, batch_format="pyarrow"),
                        eps=250, num_partitions=2)


RDP_SIMPLIFY_SQL = """
WITH RECURSIVE r AS (
    SELECT event_type AS series_id,
           epoch_us(ts) // 900000000 AS xi,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
    FROM events GROUP BY 1, 2
),
p AS (
    SELECT series_id, xi, y,
           CAST(row_number() OVER (PARTITION BY series_id ORDER BY xi)
                AS BIGINT) AS rn
    FROM r
),
seg AS (
    SELECT series_id, CAST(1 AS BIGINT) AS lo,
           CAST(max(rn) AS BIGINT) AS hi
    FROM p GROUP BY 1
    UNION ALL
    SELECT q.series_id,
           CASE WHEN v.side = 0 THEN q.lo ELSE q.split END AS lo,
           CASE WHEN v.side = 0 THEN q.split ELSE q.hi END AS hi
    FROM (
        SELECT series_id, lo, hi, split, c2, l2 FROM (
            SELECT g.series_id, g.lo, g.hi, i.rn AS split,
                   CAST((b.xi - a.xi) * (i.y - a.y)
                        - (b.y - a.y) * (i.xi - a.xi) AS HUGEINT)
                   * ((b.xi - a.xi) * (i.y - a.y)
                      - (b.y - a.y) * (i.xi - a.xi)) AS c2,
                   CAST((b.xi - a.xi) AS HUGEINT) * (b.xi - a.xi)
                   + CAST((b.y - a.y) AS HUGEINT) * (b.y - a.y) AS l2,
                   row_number() OVER (
                       PARTITION BY g.series_id, g.lo, g.hi
                       ORDER BY CAST((b.xi - a.xi) * (i.y - a.y)
                                     - (b.y - a.y) * (i.xi - a.xi)
                                     AS HUGEINT)
                                * ((b.xi - a.xi) * (i.y - a.y)
                                   - (b.y - a.y) * (i.xi - a.xi)) DESC,
                                i.rn) AS rk
            FROM seg g
            JOIN p a ON a.series_id = g.series_id AND a.rn = g.lo
            JOIN p b ON b.series_id = g.series_id AND b.rn = g.hi
            JOIN p i ON i.series_id = g.series_id
                    AND i.rn > g.lo AND i.rn < g.hi
        ) WHERE rk = 1
    ) q
    CROSS JOIN (VALUES (0), (1)) v(side)
    WHERE q.c2 > 62500 * q.l2
),
k AS (
    SELECT DISTINCT series_id, rn FROM (
        SELECT series_id, lo AS rn FROM seg
        UNION ALL
        SELECT series_id, hi AS rn FROM seg
    )
)
SELECT p.series_id, CAST(p.xi AS BIGINT) AS x, p.y AS y
FROM p JOIN k ON k.series_id = p.series_id AND k.rn = p.rn
"""


def q_vw_simplify_15m(sf_dir: str):
    """Visvalingam-Whyatt simplification of each series' 15m tier
    polyline (``stages/simplify.py:vw_simplify``): repeatedly drop the
    interior point with the smallest doubled triangle area ``|cross|``
    (< 20000, ties toward smallest x) with its CURRENT neighbors — the
    area-based tolerance family beside RDP's distance-based one. Exact
    int64 areas; the removal sequence is replayed by the SQL oracle one
    removal per series per recursive-CTE iteration (lag/lead areas +
    encoded (area, rn) window argmin)."""
    from ..stages.rollup import rollup
    from ..stages.simplify import vw_simplify

    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    rolled = rollup(ev.map_batches(_series, batch_format="pyarrow"),
                    900 * US)

    def _xi(b: pa.Table) -> pa.Table:
        bkt = b["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"series_id": b["series_id"],
                         "bucket": pa.array(bkt // (900 * US)),
                         "sum_y": b["sum_y"]})

    return vw_simplify(rolled.map_batches(_xi, batch_format="pyarrow"),
                       min_area2=20000, num_partitions=2)


VW_SIMPLIFY_SQL = """
WITH RECURSIVE r AS (
    SELECT event_type AS series_id,
           epoch_us(ts) // 900000000 AS xi,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
    FROM events GROUP BY 1, 2
),
p AS (
    SELECT series_id, xi, y,
           CAST(row_number() OVER (PARTITION BY series_id ORDER BY xi)
                AS BIGINT) AS rn
    FROM r
),
w AS (
    SELECT CAST(0 AS BIGINT) AS iter, series_id, rn, xi, y FROM p
    UNION ALL
    SELECT iter + 1, series_id, rn, xi, y FROM (
        SELECT iter, series_id, rn, xi, y, k,
               min(k) OVER (PARTITION BY series_id) AS vick
        FROM (
            SELECT iter, series_id, rn, xi, y,
                   CASE WHEN a2 IS NOT NULL AND a2 < 20000
                        THEN a2 * 1000000 + rn END AS k
            FROM (
                SELECT iter, series_id, rn, xi, y,
                       CASE WHEN xp IS NULL OR xn IS NULL THEN NULL
                            ELSE abs((xn - xp) * (y - yp)
                                     - (yn - yp) * (xi - xp)) END AS a2
                FROM (
                    SELECT iter, series_id, rn, xi, y,
                           lag(xi) OVER win AS xp, lag(y) OVER win AS yp,
                           lead(xi) OVER win AS xn, lead(y) OVER win AS yn
                    FROM w
                    WINDOW win AS (PARTITION BY series_id ORDER BY rn)
                )
            )
        )
    )
    WHERE vick IS NOT NULL AND (k IS NULL OR k <> vick)
)
SELECT series_id, CAST(xi AS BIGINT) AS x, y FROM (
    SELECT series_id, xi, y, iter,
           max(iter) OVER (PARTITION BY series_id) AS mx
    FROM w
) WHERE iter = mx
"""


def q_deadband_events(sf_dir: str):
    """Dead-band / report-by-exception compression of each event series
    (``stages/compress.py:deadband_filter``): emit a point iff its cents
    value moved more than delta=6000 from the LAST EMITTED value (first
    point always emits) — LOCF reconstruction stays within ±delta. The
    state jumps data-dependently (no prefix identity), so the per-series
    pass hops emission-to-emission with a vectorized tail scan, and the
    oracle replays the walk row-by-row in a recursive CTE."""
    from ..stages.compress import deadband_filter

    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"],
                         "x": b["ts_us"], "eid": b["event_id"],
                         "y": b["cents"]})

    ds = ev.map_batches(_series, batch_format="pyarrow")
    return deadband_filter(ds, delta=6000, order_cols=("x", "eid"),
                           num_partitions=2)


DEADBAND_SQL = """
WITH RECURSIVE e AS (
    SELECT event_type AS series_id, epoch_us(ts) AS x, event_id,
           CAST(round(value * 100) AS BIGINT) AS y
    FROM events
),
o AS (
    SELECT series_id, x, y,
           CAST(row_number() OVER (PARTITION BY series_id
                                   ORDER BY x, event_id) AS BIGINT) AS rn
    FROM e
),
r AS (
    SELECT series_id, rn, x, y, y AS last_emit, 1 AS emitted
    FROM o WHERE rn = 1
    UNION ALL
    SELECT o.series_id, o.rn, o.x, o.y,
           CASE WHEN abs(o.y - r.last_emit) > 6000
                THEN o.y ELSE r.last_emit END,
           CASE WHEN abs(o.y - r.last_emit) > 6000 THEN 1 ELSE 0 END
    FROM r JOIN o ON o.series_id = r.series_id AND o.rn = r.rn + 1
)
SELECT series_id, CAST(x AS BIGINT) AS x, y
FROM r WHERE emitted = 1
"""


def q_incident_coverage_events(sf_dir: str):
    """Interval-overlap range join, monitoring flavor: every ``error``
    event opens a 30-minute incident window ``[ts, ts+30m]``; for each
    series count its events covered by >=1 window and the total
    coverage multiplicity. Bounded-overlap range join, fully streaming
    (no driver materialization of the error stream): both sides are
    time-bucketed at the window width W, each error timestamp is
    replicated to its own bucket and the next (with bucket size == W,
    every ``te`` in ``[t-W, t]`` lands in the stab event's bucket or
    the one before, so 2 copies suffice) and to every salt lane
    (errors are the small side, so replication is cheap; salting keeps
    a hot 30-minute window from funneling into one task). Each
    ``(bucket, salt)`` group sorts its local errors once and answers
    its stab queries with two ``searchsorted`` calls: ``cov(t) =
    #(te <= t) - #(te < t-W)``. Per-group partials; final merge is
    <=|series| rows."""
    W = 1_800_000_000
    SALT = 4
    ev = _events_series(sf_dir, cols=("event_id", "event_type", "ts"))

    def _tag(b: pa.Table) -> pa.Table:
        t = b["ts_us"].to_numpy(zero_copy_only=False).astype(np.int64)
        eid = b["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        k = t // W
        left = pa.table({
            "part": k * SALT + (eid % SALT),
            "role": np.zeros(len(t), dtype=np.int8),
            "ts_us": t,
            "event_type": b["event_type"]})
        m = pc.equal(b["event_type"], "error")
        te = t[m.to_numpy(zero_copy_only=False)]
        n_err = len(te)
        te_rep = np.repeat(te, 2 * SALT)
        kk = np.repeat(te // W, 2 * SALT)
        off = np.tile(np.repeat(np.array([0, 1], dtype=np.int64), SALT),
                      n_err)
        lanes = np.tile(np.arange(SALT, dtype=np.int64), 2 * n_err)
        right = pa.table({
            "part": (kk + off) * SALT + lanes,
            "role": np.ones(2 * SALT * n_err, dtype=np.int8),
            "ts_us": te_rep,
            "event_type": pa.array(["error"] * (2 * SALT * n_err),
                                   type=left["event_type"].type)})
        return pa.concat_tables([left, right])

    def _cover(g: pa.Table) -> pa.Table:
        role = g["role"].to_numpy(zero_copy_only=False)
        t_all = g["ts_us"].to_numpy(zero_copy_only=False).astype(np.int64)
        te_s = np.sort(t_all[role == 1])
        lm = role == 0
        t = t_all[lm]
        cov = (np.searchsorted(te_s, t, side="right")
               - np.searchsorted(te_s, t - W, side="left"))
        tbl = pa.table({"event_type": g["event_type"].filter(pa.array(lm)),
                        "one": np.ones(len(t), dtype=np.int64),
                        "covered": (cov > 0).astype(np.int64),
                        "cov": cov.astype(np.int64)})
        p = tbl.group_by(["event_type"]).aggregate(
            [("one", "sum"), ("covered", "sum"), ("cov", "sum")])
        return p.rename_columns(
            ["event_type", "n_events", "n_covered", "total_coverage"])

    def _merge(g: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": g["event_type"].slice(0, 1),
            "n_events": pa.array([pc.sum(g["n_events"]).as_py()],
                                 pa.int64()),
            "n_covered": pa.array([pc.sum(g["n_covered"]).as_py()],
                                  pa.int64()),
            "total_coverage": pa.array(
                [pc.sum(g["total_coverage"]).as_py()], pa.int64())})

    return (ev.map_batches(_tag, batch_format="pyarrow")
            .groupby("part").map_groups(_cover, batch_format="pyarrow")
            .groupby("event_type").map_groups(_merge,
                                              batch_format="pyarrow"))


INCIDENT_COVERAGE_SQL = """
WITH err AS (
    SELECT epoch_us(ts) AS te FROM events WHERE event_type = 'error'
),
ev AS (
    SELECT event_type, event_id, epoch_us(ts) AS t FROM events
),
c AS (
    SELECT e.event_type, e.event_id, count(w.te) AS cov
    FROM ev e LEFT JOIN err w
      ON w.te BETWEEN e.t - 1800000000 AND e.t
    GROUP BY 1, 2
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN cov > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_covered,
       CAST(sum(cov) AS BIGINT) AS total_coverage
FROM c GROUP BY 1
"""


def q_backtest_naive_1h(sf_dir: str):
    """Forecast backtest over the 1h tier: score the two standard
    baselines per series — seasonal-naive (y[t−24h]) and naive-1
    (y[t−1h]) — as exact integer error sums (the MASE building blocks;
    callers divide). A row is scored against a baseline only where that
    lagged bucket EXISTS (no gap-fill assumptions). One hash(series)
    shuffle; per-segment bucket alignment via two ``searchsorted``
    probes — no self-join shuffle."""
    from ..arrow_utils import stable_part_codes
    from ..stages.rollup import rollup

    H = 3_600_000_000
    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    rolled = rollup(ev.map_batches(_series, batch_format="pyarrow"), H)
    mod = 2 * 64

    def _add_part(b: pa.Table) -> pa.Table:
        h = stable_part_codes(b["series_id"], None)
        return b.append_column(
            "__part", pa.array((h % np.uint64(mod)).astype(np.int32)))

    def _score(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        s_type = t["series_id"].type
        cols = ("n", "n_seasonal", "sae_seasonal", "n_naive",
                "sae_naive")
        if t.num_rows == 0:
            return pa.table({"series_id": pa.array([], s_type),
                             **{c: pa.array([], pa.int64())
                                for c in cols}})
        t = t.take(pc.sort_indices(t, sort_keys=[
            ("series_id", "ascending"), ("bucket", "ascending")]))
        sid = t["series_id"]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = sid.dictionary_encode().indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        bkt = t["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = t["sum_y"].to_numpy(zero_copy_only=False).astype(np.int64)
        heads = np.ones(len(codes), dtype=bool)
        heads[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(heads)
        ends = np.r_[starts[1:], len(codes)]
        out = {k: [] for k in ("sid",) + cols}
        for f, l in zip(starts, ends):  # series loop; inner vectorized
            b_, y_ = bkt[f:l], y[f:l]
            out["sid"].append(sid[int(f)].as_py())
            out["n"].append(l - f)
            for lag, nk, sk in ((24 * H, "n_seasonal", "sae_seasonal"),
                                (H, "n_naive", "sae_naive")):
                tgt = b_ - lag
                idx = np.searchsorted(b_, tgt)
                ok = (idx < len(b_)) & (b_[np.minimum(idx, len(b_) - 1)]
                                        == tgt)
                err = np.abs(y_[ok] - y_[idx[ok]])
                out[nk].append(int(ok.sum()))
                out[sk].append(int(err.sum()))
        return pa.table({"series_id": pa.array(out["sid"], s_type),
                         **{c: pa.array(out[c], pa.int64())
                            for c in cols}})

    return (rolled.map_batches(_add_part, batch_format="pyarrow")
            .repartition(2).groupby("__part")
            .map_groups(_score, batch_format="pyarrow"))


BACKTEST_NAIVE_SQL = """
WITH r AS (
    SELECT event_type AS series_id,
           epoch_us(ts) // 3600000000 * 3600000000 AS bucket,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
    FROM events GROUP BY 1, 2
)
SELECT a.series_id, CAST(count(*) AS BIGINT) AS n,
       CAST(count(s.bucket) AS BIGINT) AS n_seasonal,
       CAST(coalesce(sum(abs(a.y - s.y)), 0) AS BIGINT) AS sae_seasonal,
       CAST(count(n1.bucket) AS BIGINT) AS n_naive,
       CAST(coalesce(sum(abs(a.y - n1.y)), 0) AS BIGINT) AS sae_naive
FROM r a
LEFT JOIN r s  ON s.series_id = a.series_id
              AND s.bucket = a.bucket - 86400000000
LEFT JOIN r n1 ON n1.series_id = a.series_id
              AND n1.bucket = a.bucket - 3600000000
GROUP BY 1
"""


def q_rate_limit_users(sf_dir: str):
    """Sliding-window rate-limiter audit: for every event, the TRAILING
    count of the same user's events in ``(t − 24h, t]``; an event is
    throttled when that count exceeds L=4. Per user output: n_events,
    the peak trailing count and the throttled total — exact int64.
    One hash(user) shuffle; the trailing counts for ALL rows of a
    partition come from two global ``searchsorted`` probes on a
    composite ``user_code*SPAN + (t − tmin)`` key (no per-user Python,
    no self-join shuffle)."""
    from ..arrow_utils import stable_part_codes

    W = 86_400_000_000
    L = 4
    ev = _events_series(sf_dir, cols=("event_id", "user_id", "ts"))
    mod = 4 * 64

    def _add_part(b: pa.Table) -> pa.Table:
        h = stable_part_codes(b["user_id"], None)
        return b.append_column(
            "__part", pa.array((h % np.uint64(mod)).astype(np.int32)))

    def _audit(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        u_type = t["user_id"].type
        cols = ("n_events", "max_trailing", "n_throttled")
        if t.num_rows == 0:
            return pa.table({"user_id": pa.array([], u_type),
                             **{c: pa.array([], pa.int64())
                                for c in cols}})
        t = t.take(pc.sort_indices(t, sort_keys=[
            ("user_id", "ascending"), ("ts_us", "ascending"),
            ("event_id", "ascending")]))
        uid = t["user_id"]
        if isinstance(uid, pa.ChunkedArray):
            uid = uid.combine_chunks()
        codes = uid.dictionary_encode().indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        ts = t["ts_us"].to_numpy(zero_copy_only=False).astype(np.int64)
        tmin = int(ts.min())
        span = int(ts.max()) - tmin + W + 2
        key = codes * span + (ts - tmin)
        # trailing count in (t-W, t]: both bounds via side='right'
        cnt = (np.searchsorted(key, key, side="right")
               - np.searchsorted(key, codes * span + (ts - tmin - W),
                                 side="right"))
        heads = np.ones(len(codes), dtype=bool)
        heads[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(heads)
        return pa.table({
            "user_id": uid.take(pa.array(starts)),
            "n_events": pa.array(np.diff(np.append(starts, len(codes)))),
            "max_trailing": pa.array(np.maximum.reduceat(cnt, starts)),
            "n_throttled": pa.array(np.add.reduceat(
                (cnt > L).astype(np.int64), starts))})

    return (ev.map_batches(_add_part, batch_format="pyarrow")
            .repartition(4).groupby("__part")
            .map_groups(_audit, batch_format="pyarrow"))


RATE_LIMIT_SQL = """
WITH e AS (
    SELECT user_id AS u, event_id, epoch_us(ts) AS t FROM events
),
c AS (
    SELECT a.u, a.event_id, count(*) AS cnt
    FROM e a JOIN e b
      ON b.u = a.u AND b.t > a.t - 86400000000 AND b.t <= a.t
    GROUP BY 1, 2
)
SELECT u AS user_id, CAST(count(*) AS BIGINT) AS n_events,
       CAST(max(cnt) AS BIGINT) AS max_trailing,
       CAST(sum(CASE WHEN cnt > 4 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_throttled
FROM c GROUP BY 1
"""


def q_readability_docs(sf_dir: str):
    """Flesch reading-ease panel per document
    (``stages/textstats.py:readability_batch``): words / sentence-runs /
    vowel-group syllables as byte-exact integers plus the pinned-IEEE
    Flesch score — one vectorized pass over the UTF-8 buffer, no
    shuffle at all (embarrassingly parallel map)."""
    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"])
    from ..stages.textstats import readability_batch

    return ds.map_batches(readability_batch, batch_format="pyarrow")


READABILITY_SQL = """
WITH m AS (
    SELECT doc_id,
           length(text) - length(replace(text, ' ', '')) + 1 AS n_words,
           length(regexp_replace(text, '[.!?]+', 'X', 'g'))
             - length(regexp_replace(text, '[.!?]+', '', 'g'))
               AS n_sentences,
           length(regexp_replace(lower(text), '[aeiouy]+', 'X', 'g'))
             - length(regexp_replace(lower(text), '[aeiouy]+', '', 'g'))
               AS n_syllables
    FROM documents
)
SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
       CAST(n_sentences AS BIGINT) AS n_sentences,
       CAST(n_syllables AS BIGINT) AS n_syllables,
       CASE WHEN n_words > 0 AND n_sentences > 0 THEN
            206.835
            - 1.015 * (CAST(n_words AS DOUBLE)
                       / CAST(n_sentences AS DOUBLE))
            - 84.6 * (CAST(n_syllables AS DOUBLE)
                      / CAST(n_words AS DOUBLE))
       END AS flesch
FROM m
"""


def q_isotonic_fit_1h(sf_dir: str):
    """Isotonic (non-decreasing) regression per series over the 1h tier
    via pool-adjacent-violators: classic stack PAVA per series (merge
    while the previous pool's mean exceeds the last's, compared by
    int64 cross-multiplication — no floats). The isotonic FIT is the
    unique L2 projection onto the monotone cone and PAVA reaches it
    under ANY adjacent-violator merge order, so the per-ROW fitted
    value is well-defined even where pool boundaries are not; it is
    emitted as the gcd-reduced exact fraction ``(fit_num, fit_den)``.
    The SQL oracle replays PAVA merging the FIRST violating pair per
    series per recursive-CTE iteration — a different merge order,
    provably the same row-level fit. One hash(series) shuffle; the
    per-series stack walk is O(n) amortized (each row merges at most
    once)."""
    from ..arrow_utils import stable_part_codes
    from ..stages.rollup import rollup

    H = 3_600_000_000
    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    rolled = rollup(ev.map_batches(_series, batch_format="pyarrow"), H)
    mod = 2 * 64

    def _add_part(b: pa.Table) -> pa.Table:
        h = stable_part_codes(b["series_id"], None)
        return b.append_column(
            "__part", pa.array((h % np.uint64(mod)).astype(np.int32)))

    def _pava(y: np.ndarray):
        """Stack PAVA -> per-row (pool_sum, pool_cnt)."""
        sums, cnts = [], []
        for v in y:
            s, c = int(v), 1
            while sums and sums[-1] * c > s * cnts[-1]:
                s += sums.pop()
                c += cnts.pop()
            sums.append(s)
            cnts.append(c)
        ps = np.repeat(np.array(sums, np.int64),
                       np.array(cnts, np.int64))
        pc_ = np.repeat(np.array(cnts, np.int64),
                        np.array(cnts, np.int64))
        return ps, pc_

    def _fit(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        s_type = t["series_id"].type
        if t.num_rows == 0:
            return pa.table({"series_id": pa.array([], s_type),
                             "bucket": pa.array([], pa.int64()),
                             "y": pa.array([], pa.int64()),
                             "fit_num": pa.array([], pa.int64()),
                             "fit_den": pa.array([], pa.int64())})
        t = t.take(pc.sort_indices(t, sort_keys=[
            ("series_id", "ascending"), ("bucket", "ascending")]))
        sid = t["series_id"]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = sid.dictionary_encode().indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        bkt = t["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = t["sum_y"].to_numpy(zero_copy_only=False).astype(np.int64)
        heads = np.ones(len(codes), dtype=bool)
        heads[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(heads)
        ends = np.r_[starts[1:], len(codes)]
        num = np.empty(len(y), np.int64)
        den = np.empty(len(y), np.int64)
        for f, l in zip(starts, ends):  # series loop (tier contract)
            ps, pcnt = _pava(y[f:l])
            num[f:l], den[f:l] = ps, pcnt
        g_ = np.gcd(num, den)
        return pa.table({"series_id": sid, "bucket": pa.array(bkt),
                         "y": pa.array(y),
                         "fit_num": pa.array(num // g_),
                         "fit_den": pa.array(den // g_)})

    return (rolled.map_batches(_add_part, batch_format="pyarrow")
            .repartition(2).groupby("__part")
            .map_groups(_fit, batch_format="pyarrow"))


ISOTONIC_SQL = """
WITH RECURSIVE r AS (
    SELECT event_type AS series_id,
           epoch_us(ts) // 3600000000 * 3600000000 AS bucket,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
    FROM events GROUP BY 1, 2
),
p AS (
    SELECT series_id, bucket, y,
           CAST(row_number() OVER (PARTITION BY series_id
                                   ORDER BY bucket) AS BIGINT) AS rn
    FROM r
),
w AS (
    SELECT CAST(0 AS BIGINT) AS iter, series_id, rn AS start_rn,
           rn AS end_rn, y AS psum, CAST(1 AS BIGINT) AS pcnt
    FROM p
    UNION ALL
    SELECT iter + 1, series_id,
           start_rn,
           CASE WHEN start_rn = fv THEN nend ELSE end_rn END,
           CASE WHEN start_rn = fv THEN psum + nsum ELSE psum END,
           CASE WHEN start_rn = fv THEN pcnt + ncnt ELSE pcnt END
    FROM (
        SELECT iter, series_id, start_rn, end_rn, psum, pcnt,
               nsum, ncnt, nend, pstart,
               min(viol) OVER (PARTITION BY series_id) AS fv
        FROM (
            SELECT iter, series_id, start_rn, end_rn, psum, pcnt,
                   lead(psum) OVER ws AS nsum,
                   lead(pcnt) OVER ws AS ncnt,
                   lead(end_rn) OVER ws AS nend,
                   lag(start_rn) OVER ws AS pstart,
                   CASE WHEN lead(psum) OVER ws IS NOT NULL
                         AND psum * lead(pcnt) OVER ws
                             > lead(psum) OVER ws * pcnt
                        THEN start_rn END AS viol
            FROM w
            WINDOW ws AS (PARTITION BY series_id ORDER BY start_rn)
        )
    )
    WHERE fv IS NOT NULL AND (pstart IS NULL OR pstart <> fv)
),
f AS (
    SELECT series_id, start_rn, end_rn, psum, pcnt FROM (
        SELECT w.*, max(iter) OVER (PARTITION BY series_id) AS mx
        FROM w
    ) WHERE iter = mx
)
SELECT p.series_id, CAST(p.bucket AS BIGINT) AS bucket, p.y,
       CAST(f.psum // gcd(f.psum, f.pcnt) AS BIGINT) AS fit_num,
       CAST(f.pcnt // gcd(f.psum, f.pcnt) AS BIGINT) AS fit_den
FROM p JOIN f
  ON f.series_id = p.series_id
 AND p.rn BETWEEN f.start_rn AND f.end_rn
"""


def q_mmr_select_embeddings(sf_dir: str):
    """Maximal-marginal-relevance selection (the RAG/result-diversity
    primitive): greedily pick k=10 of the top-M=50 candidates by
    ``score = qsim − max_sim_to_selected`` (lambda=1/2, scaled by 2),
    all on exact integer dot products over trunc(x*1000)-quantized
    components (the catalog's embedding convention), ties to the
    smallest vec_id. Distributed shape: the query vector broadcasts in
    a closure; each batch computes qsim with one integer matmul and
    keeps only its LOCAL top-M rows, so the driver merge sees
    blocks×M rows, never the corpus; the greedy loop then runs on the
    M-row candidate set. Query vector: vec_id=7 (excluded)."""
    QID, M, K = 7, 50, 10
    ds = _read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding"])

    from ..stages.similarity import embedding_matrix

    def _qrow(b: pa.Table) -> pa.Table:
        m = pc.equal(b["vec_id"], QID)
        return b.filter(m)

    qrows = ds.map_batches(_qrow, batch_format="pyarrow").take_all()
    qv = np.trunc(np.asarray(qrows[0]["embedding"], np.float64)
                  * 1000).astype(np.int64)

    def _local_top(b: pa.Table) -> pa.Table:
        ids = b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        E = np.trunc(embedding_matrix(b).astype(np.float64)
                     * 1000).astype(np.int64)
        keep = ids != QID
        ids, E = ids[keep], E[keep]
        qsim = E @ qv
        order = np.lexsort((ids, -qsim))[:M]
        return pa.table({
            "vec_id": pa.array(ids[order]),
            "qsim": pa.array(qsim[order]),
            "v": pa.array(list(E[order]),
                          pa.list_(pa.int64()))})

    parts = ds.map_batches(_local_top, batch_format="pyarrow").take_all()
    ids = np.array([r["vec_id"] for r in parts], dtype=np.int64)
    qsim = np.array([r["qsim"] for r in parts], dtype=np.int64)
    V = np.array([r["v"] for r in parts], dtype=np.int64)
    order = np.lexsort((ids, -qsim))[:M]
    ids, qsim, V = ids[order], qsim[order], V[order]

    red = np.zeros(len(ids), dtype=np.int64)
    alive = np.ones(len(ids), dtype=bool)
    out = {"rank": [], "vec_id": [], "qsim": [], "redundancy": []}
    for k in range(1, K + 1):
        score = qsim - red
        cand = np.flatnonzero(alive)
        w = cand[np.lexsort((ids[cand], -score[cand]))[0]]
        out["rank"].append(k)
        out["vec_id"].append(int(ids[w]))
        out["qsim"].append(int(qsim[w]))
        out["redundancy"].append(int(red[w]))
        alive[w] = False
        red = np.maximum(red, V @ V[w])
    return pa.table({c: pa.array(v, pa.int64())
                     for c, v in out.items()})


MMR_SELECT_SQL = """
WITH RECURSIVE q AS (
    SELECT vec_id,
           list_transform(embedding,
               x -> CAST(trunc(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
    FROM embeddings
),
qq AS (SELECT v FROM q WHERE vec_id = 7),
s AS (
    SELECT q.vec_id, CAST(list_dot_product(q.v, qq.v) AS BIGINT) AS qsim,
           q.v
    FROM q, qq WHERE q.vec_id <> 7
),
cand AS (
    SELECT vec_id, qsim, v FROM (
        SELECT vec_id, qsim, v,
               row_number() OVER (ORDER BY qsim DESC, vec_id) AS rk
        FROM s
    ) WHERE rk <= 50
),
w AS (
    SELECT CAST(0 AS BIGINT) AS iter, vec_id, qsim, v,
           CAST(0 AS BIGINT) AS red
    FROM cand
    UNION ALL
    SELECT iter + 1, vec_id, qsim, v,
           greatest(red, CAST(list_dot_product(v, wv) AS BIGINT))
    FROM (
        SELECT iter, vec_id, qsim, v, red,
               first_value(v) OVER wo AS wv,
               first_value(vec_id) OVER wo AS wid
        FROM w
        WINDOW wo AS (ORDER BY qsim - red DESC, vec_id)
    )
    WHERE vec_id <> wid AND iter < 9
)
SELECT CAST(iter + 1 AS BIGINT) AS rank, vec_id, qsim,
       red AS redundancy
FROM (
    SELECT iter, vec_id, qsim, red,
           row_number() OVER (PARTITION BY iter
                              ORDER BY qsim - red DESC, vec_id) AS rk
    FROM w
) WHERE rk = 1 AND iter < 10
"""


def q_kalman_1h(sf_dir: str):
    """Kalman local-level filter over the 1h tier
    (``stages/smoothing.py:kalman_local_level``): converging
    time-varying gain in pinned e6 fixed point (q=1, r=9 variance
    units), the filtering companion to ``ewma_15m``/``holt_15m``.
    Sequential per series (the defining data dependency), parallel
    across series; oracle replays each step in a recursive CTE."""
    from ..stages.rollup import rollup
    from ..stages.smoothing import kalman_local_level

    H = 3_600_000_000
    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    rolled = rollup(ev.map_batches(_series, batch_format="pyarrow"), H)
    return kalman_local_level(rolled, num_partitions=2)


KALMAN_SQL = """
WITH RECURSIVE r AS (
    SELECT event_type AS series_id,
           epoch_us(ts) // 3600000000 * 3600000000 AS bucket,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
    FROM events GROUP BY 1, 2
),
o AS (
    SELECT series_id, bucket, y,
           CAST(row_number() OVER (PARTITION BY series_id
                                   ORDER BY bucket) AS BIGINT) AS rn
    FROM r
),
w AS (
    SELECT series_id, rn, bucket, y,
           y * 1000000 AS x, CAST(9000000 AS BIGINT) AS p,
           CAST(0 AS BIGINT) AS k
    FROM o WHERE rn = 1
    UNION ALL
    SELECT o.series_id, o.rn, o.bucket, o.y,
           w.x + (((w.p + 1000000) * 1000000
                   // (w.p + 1000000 + 9000000))
                  * (o.y * 1000000 - w.x)) // 1000000,
           ((1000000 - ((w.p + 1000000) * 1000000
                        // (w.p + 1000000 + 9000000)))
            * (w.p + 1000000)) // 1000000,
           (w.p + 1000000) * 1000000 // (w.p + 1000000 + 9000000)
    FROM w JOIN o ON o.series_id = w.series_id AND o.rn = w.rn + 1
)
SELECT series_id, CAST(bucket AS BIGINT) AS bucket, y,
       x AS x_e6, k AS k_e6
FROM w
"""


def q_expectations_events(sf_dir: str):
    """Declarative data-quality audit (the expectations/contract layer
    every production ingest runs): one row per check with exact
    violation counts over the events table —

      id_unique        duplicate event_id rows (count − distinct)
      value_in_range   value outside (0, 300]
      type_in_set      event_type outside the 5 known labels
      user_nonnull     missing user_id
      ts_monotonic_id  rows where (ts, event_id) order disagrees with
                       event_id order per user (id assigned out of
                       arrival order)

    Distributed shape: every check except id_unique is a map-side
    per-batch partial (tiny merge); id_unique counts distinct via one
    hash(event_id) shuffle's per-group sizes; the monotonicity check
    rides the same hash(user) segment pass as the rate-limit audit."""
    from ..arrow_utils import stable_part_codes

    ALLOWED = {"click", "view", "signup", "purchase", "error"}
    ev = _read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "event_type", "ts", "user_id", "value"])

    def _prep(b: pa.Table) -> pa.Table:
        out = {c: b[c] for c in b.column_names if c != "ts"}
        out["ts_us"] = b["ts"].cast(pa.int64())
        return pa.table(out)

    ds = ev.map_batches(_prep, batch_format="pyarrow")

    # map-side partials for the row-local checks
    def _local(b: pa.Table) -> pa.Table:
        v = b["value"].to_numpy(zero_copy_only=False)
        bad_range = int(((v <= 0) | (v > 300)).sum())
        et = b["event_type"]
        in_set = pc.is_in(et, value_set=pa.array(sorted(ALLOWED)))
        bad_type = int(pc.sum(pc.cast(pc.invert(in_set),
                                      pa.int64())).as_py() or 0)
        bad_user = int(b["user_id"].null_count)
        return pa.table({
            "check": pa.array(["value_in_range", "type_in_set",
                               "user_nonnull"]),
            "n_violations": pa.array([bad_range, bad_type, bad_user],
                                     pa.int64()),
            "n_rows": pa.array([b.num_rows] * 3, pa.int64())})

    local = ds.map_batches(_local, batch_format="pyarrow")

    # id uniqueness: hash(event_id) shuffle, per-group excess
    mod = 4 * 64

    def _part_id(b: pa.Table) -> pa.Table:
        h = stable_part_codes(b["event_id"], None)
        return pa.table({
            "event_id": b["event_id"],
            "__part": pa.array((h % np.uint64(mod)).astype(np.int32))})

    def _dups(g: pa.Table) -> pa.Table:
        ids = g["event_id"].to_numpy(zero_copy_only=False)
        extra = len(ids) - len(np.unique(ids))
        return pa.table({"check": pa.array(["id_unique"]),
                         "n_violations": pa.array([extra], pa.int64()),
                         "n_rows": pa.array([len(ids)], pa.int64())})

    dups = (ds.map_batches(_part_id, batch_format="pyarrow")
            .repartition(4).groupby("__part")
            .map_groups(_dups, batch_format="pyarrow"))

    # per-user monotonicity of event_id vs (ts, event_id) arrival order
    def _part_u(b: pa.Table) -> pa.Table:
        h = stable_part_codes(b["user_id"], None)
        return b.append_column(
            "__part", pa.array((h % np.uint64(mod)).astype(np.int32)))

    def _mono(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        if t.num_rows == 0:
            return pa.table({"check": pa.array([], pa.string()),
                             "n_violations": pa.array([], pa.int64()),
                             "n_rows": pa.array([], pa.int64())})
        t = t.take(pc.sort_indices(t, sort_keys=[
            ("user_id", "ascending"), ("ts_us", "ascending"),
            ("event_id", "ascending")]))
        uid = t["user_id"]
        if isinstance(uid, pa.ChunkedArray):
            uid = uid.combine_chunks()
        codes = uid.dictionary_encode().indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        same = np.zeros(len(eid), dtype=bool)
        same[1:] = codes[1:] == codes[:-1]
        viol = int((same & np.r_[False, eid[1:] < eid[:-1]]).sum())
        return pa.table({"check": pa.array(["ts_monotonic_id"]),
                         "n_violations": pa.array([viol], pa.int64()),
                         "n_rows": pa.array([t.num_rows], pa.int64())})

    mono = (ds.map_batches(_part_u, batch_format="pyarrow")
            .repartition(4).groupby("__part")
            .map_groups(_mono, batch_format="pyarrow"))

    def _merge(g: pa.Table) -> pa.Table:
        return pa.table({
            "check": g["check"].slice(0, 1),
            "n_violations": pa.array(
                [pc.sum(g["n_violations"]).as_py() or 0], pa.int64()),
            "n_rows": pa.array([pc.sum(g["n_rows"]).as_py() or 0],
                               pa.int64())})

    return (local.union(dups).union(mono)
            .groupby("check").map_groups(_merge, batch_format="pyarrow"))


EXPECTATIONS_SQL = """
WITH e AS (
    SELECT event_id, event_type, epoch_us(ts) AS t, user_id, value
    FROM events
),
mono AS (
    SELECT count(*) AS n,
           sum(CASE WHEN prev_id IS NOT NULL AND event_id < prev_id
                    THEN 1 ELSE 0 END) AS v
    FROM (
        SELECT event_id,
               lag(event_id) OVER (PARTITION BY user_id
                                   ORDER BY t, event_id) AS prev_id
        FROM e
    )
)
SELECT * FROM (
    SELECT 'id_unique' AS "check",
           CAST(count(*) - count(DISTINCT event_id) AS BIGINT)
               AS n_violations,
           CAST(count(*) AS BIGINT) AS n_rows FROM e
    UNION ALL
    SELECT 'value_in_range',
           CAST(sum(CASE WHEN value <= 0 OR value > 300
                    THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(*) AS BIGINT) FROM e
    UNION ALL
    SELECT 'type_in_set',
           CAST(sum(CASE WHEN event_type NOT IN
                         ('click','view','signup','purchase','error')
                    THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(*) AS BIGINT) FROM e
    UNION ALL
    SELECT 'user_nonnull',
           CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
                AS BIGINT),
           CAST(count(*) AS BIGINT) FROM e
    UNION ALL
    SELECT 'ts_monotonic_id', CAST(v AS BIGINT), CAST(n AS BIGINT)
    FROM mono
)
"""


def q_huffman_code_docs(sf_dir: str):
    """Optimal-prefix-code construction (the compression-theory
    companion to ``gzip_text_docs``): corpus-wide character frequencies
    for [a-z ] reduce map-side to a 27-bin histogram per batch (one
    tiny merge — the distributed part), then the Huffman tree is built
    with the PINNED deterministic convention: repeatedly merge the two
    nodes with smallest ``(freq, min-symbol-in-subtree)``. Output per
    symbol: frequency, code length, and the corpus' total encoded bits
    (Σ freq·len) — the entropy-coding size every storage planner
    estimates. The SQL oracle replays the same merges one per
    recursive-CTE iteration via dense-rank windows over the leaf rows.
    """
    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"])

    SYMS = "abcdefghijklmnopqrstuvwxyz "

    def _hist(b: pa.Table) -> pa.Table:
        text = b["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        data = np.frombuffer(text.buffers()[2], dtype=np.uint8)
        off = np.frombuffer(
            text.buffers()[1],
            dtype=np.int32 if pa.types.is_string(text.type)
            else np.int64)
        lo = int(off[text.offset])
        hi = int(off[text.offset + len(text)])
        counts = np.bincount(data[lo:hi], minlength=256)
        freqs = [int(counts[ord(c)]) for c in SYMS]
        return pa.table({"sym": pa.array(list(SYMS)),
                         "freq": pa.array(freqs, pa.int64())})

    rows = ds.map_batches(_hist, batch_format="pyarrow").take_all()
    freq = {}
    for r in rows:
        freq[r["sym"]] = freq.get(r["sym"], 0) + r["freq"]

    import heapq
    # node = (freq, min_symbol, [leaf syms]); merge two smallest
    heap = [(f, s, [s]) for s, f in freq.items()]
    heapq.heapify(heap)
    length = {s: 0 for s in freq}
    while len(heap) > 1:
        f1, m1, l1 = heapq.heappop(heap)
        f2, m2, l2 = heapq.heappop(heap)
        for s in l1 + l2:
            length[s] += 1
        heapq.heappush(heap, (f1 + f2, min(m1, m2), l1 + l2))
    total_bits = sum(freq[s] * length[s] for s in freq)
    syms = sorted(freq)
    return pa.table({
        "sym": pa.array(syms),
        "freq": pa.array([freq[s] for s in syms], pa.int64()),
        "code_len": pa.array([length[s] for s in syms], pa.int64()),
        "total_bits": pa.array([total_bits] * len(syms), pa.int64())})


HUFFMAN_SQL = """
WITH RECURSIVE syms AS (
    SELECT unnest(string_split('a b c d e f g h i j k l m n o p q r s'
                               || ' t u v w x y z _SP', ' ')) AS tok
),
leaf AS (
    SELECT CASE WHEN tok = '_SP' THEN ' ' ELSE tok END AS sym,
           (SELECT CAST(coalesce(sum(
                length(text) - length(replace(text,
                    CASE WHEN tok = '_SP' THEN ' ' ELSE tok END, ''))
            ), 0) AS BIGINT) FROM documents) AS freq
    FROM syms
),
w AS (
    SELECT CAST(0 AS BIGINT) AS iter, sym, freq, sym AS node_min,
           freq AS node_freq, CAST(0 AS BIGINT) AS len,
           CAST((SELECT count(*) FROM leaf) AS BIGINT) AS n_nodes
    FROM leaf
    UNION ALL
    SELECT iter + 1, sym, freq,
           CASE WHEN rnk <= 2 THEN mmin ELSE node_min END,
           CASE WHEN rnk <= 2 THEN f1 + f2 ELSE node_freq END,
           CASE WHEN rnk <= 2 THEN len + 1 ELSE len END,
           n_nodes - 1
    FROM (
        SELECT iter, sym, freq, node_min, node_freq, len, n_nodes, rnk,
               min(CASE WHEN rnk <= 2 THEN node_min END) OVER ()
                   AS mmin,
               min(CASE WHEN rnk = 1 THEN node_freq END) OVER () AS f1,
               min(CASE WHEN rnk = 2 THEN node_freq END) OVER () AS f2
        FROM (
            SELECT iter, sym, freq, node_min, node_freq, len, n_nodes,
                   dense_rank() OVER (ORDER BY node_freq, node_min)
                       AS rnk
            FROM w
        )
    )
    WHERE n_nodes > 1
),
f AS (SELECT w.*, max(iter) OVER () AS mx FROM w)
SELECT sym, freq, len AS code_len,
       CAST(sum(freq * len) OVER () AS BIGINT) AS total_bits
FROM f WHERE iter = mx
"""


def q_dtw_pairs_1d(sf_dir: str):
    """Dynamic-time-warping distance between every pair of series over
    the 1d tier (30 points each, the engine's tier-reduction contract
    for quadratic ops — same rule as Theil-Sen's pair expansion):
    exact integer |Δy| costs, the classic
    ``D[i,j] = c + min(left, up, diag)`` recurrence. Distributed
    shape: each series' tier rows fan out once per pair it belongs to
    (k−1 replication of 1000×-reduced rows), then ONE hash(pair)
    shuffle and an independent per-pair DP. Also emits the unwarped L1
    distance for contrast. The SQL oracle advances the DP one
    anti-diagonal per recursive-CTE iteration (all pairs in
    parallel), with pass-through/contribution moves in a single scan.
    """
    from ..arrow_utils import stable_part_codes
    from ..stages.rollup import rollup

    D1 = 86_400_000_000
    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    rolled = rollup(ev.map_batches(_series, batch_format="pyarrow"), D1)
    rolled = rolled.select_columns(["series_id", "bucket", "sum_y"])

    names = sorted({r["series_id"]
                    for r in rolled.groupby("series_id").count()
                    .take_all()})
    pairs = [(a, b) for i, a in enumerate(names)
             for b in names[i + 1:]]

    def _fan(b: pa.Table) -> pa.Table:
        out = {"pair": [], "role": [], "bucket": [], "y": []}
        sid = b["series_id"].to_pylist()
        bkt = b["bucket"].to_pylist()
        y = b["sum_y"].to_pylist()
        for a, c in pairs:
            for s, k, v in zip(sid, bkt, y):
                if s == a:
                    out["pair"].append(f"{a}|{c}")
                    out["role"].append(0)
                    out["bucket"].append(k)
                    out["y"].append(v)
                elif s == c:
                    out["pair"].append(f"{a}|{c}")
                    out["role"].append(1)
                    out["bucket"].append(k)
                    out["y"].append(v)
        return pa.table({"pair": pa.array(out["pair"]),
                         "role": pa.array(out["role"], pa.int64()),
                         "bucket": pa.array(out["bucket"], pa.int64()),
                         "y": pa.array(out["y"], pa.int64())})

    mod = 4 * 64

    def _add_part(b: pa.Table) -> pa.Table:
        h = stable_part_codes(b["pair"], None)
        return b.append_column(
            "__part", pa.array((h % np.uint64(mod)).astype(np.int32)))

    def _dtw(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        empty = pa.table({"a": pa.array([], pa.string()),
                          "b": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64()),
                          "m": pa.array([], pa.int64()),
                          "dtw": pa.array([], pa.int64()),
                          "l1": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        t = t.take(pc.sort_indices(t, sort_keys=[
            ("pair", "ascending"), ("role", "ascending"),
            ("bucket", "ascending")]))
        pairc = t["pair"].to_pylist()
        role = t["role"].to_pylist()
        y = t["y"].to_pylist()
        out = {k: [] for k in ("a", "b", "n", "m", "dtw", "l1")}
        from itertools import groupby as _gb
        idx = 0
        for pr, grp in _gb(range(len(pairc)), key=lambda i: pairc[i]):
            rows = list(grp)
            va = [y[i] for i in rows if role[i] == 0]
            vb = [y[i] for i in rows if role[i] == 1]
            n, m = len(va), len(vb)
            INF = 1 << 60
            prev = [INF] * (m + 1)
            prev[0] = 0
            first = True
            for i in range(1, n + 1):
                cur = [INF] * (m + 1)
                for j in range(1, m + 1):
                    c = abs(va[i - 1] - vb[j - 1])
                    best = min(prev[j], cur[j - 1], prev[j - 1])
                    if i == 1 and j == 1:
                        best = 0
                    cur[j] = c + best
                prev = cur
                first = False
            aname, bname = pr.split("|")
            out["a"].append(aname)
            out["b"].append(bname)
            out["n"].append(n)
            out["m"].append(m)
            out["dtw"].append(prev[m] if n and m else 0)
            out["l1"].append(sum(abs(p - q) for p, q in zip(va, vb)))
            idx += 1
        return pa.table({"a": pa.array(out["a"]),
                         "b": pa.array(out["b"]),
                         "n": pa.array(out["n"], pa.int64()),
                         "m": pa.array(out["m"], pa.int64()),
                         "dtw": pa.array(out["dtw"], pa.int64()),
                         "l1": pa.array(out["l1"], pa.int64())})

    return (rolled.map_batches(_fan, batch_format="pyarrow")
            .map_batches(_add_part, batch_format="pyarrow")
            .repartition(4).groupby("__part")
            .map_groups(_dtw, batch_format="pyarrow"))


DTW_PAIRS_SQL = """
WITH RECURSIVE r AS (
    SELECT event_type AS series_id,
           epoch_us(ts) // 86400000000 AS bucket,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
    FROM events GROUP BY 1, 2
),
p AS (
    SELECT series_id, y,
           CAST(row_number() OVER (PARTITION BY series_id
                                   ORDER BY bucket) AS BIGINT) AS rk
    FROM r
),
dims AS (SELECT series_id, max(rk) AS n FROM p GROUP BY 1),
pairs AS (
    SELECT x.series_id AS a, y.series_id AS b, x.n AS na, y.n AS nb
    FROM dims x JOIN dims y ON x.series_id < y.series_id
),
c AS (
    SELECT pr.a, pr.b, pr.na, pr.nb, x.rk AS i, y.rk AS j,
           abs(x.y - y.y) AS cost
    FROM pairs pr
    JOIN p x ON x.series_id = pr.a
    JOIN p y ON y.series_id = pr.b
),
w AS (
    SELECT a, b, na, nb, i, j, CAST(i + j AS BIGINT) AS diag,
           CAST(cost AS BIGINT) AS val
    FROM c WHERE i = 1 AND j = 1
    UNION ALL
    SELECT t.a, t.b, t.na, t.nb, t.i, t.j, t.diag,
           t.val + CASE WHEN t.is_new THEN cc.cost ELSE 0 END
    FROM (
        SELECT a, b, na, nb, i + di AS i, j + dj AS j,
               diag + di + dj AS diag,
               min(val) AS val,
               (di + dj > 0) AS is_new
        FROM (
            SELECT q.*, mv.di, mv.dj
            FROM (
                SELECT a, b, na, nb, i, j, diag, val,
                       max(diag) OVER (PARTITION BY a, b) AS mxd
                FROM w
            ) q
            CROSS JOIN (VALUES (0, 0), (1, 0), (0, 1), (1, 1))
                 mv(di, dj)
            WHERE (q.diag = q.mxd AND mv.di + mv.dj = 1)
               OR (q.diag = q.mxd - 1 AND mv.di = 1 AND mv.dj = 1)
               OR (q.diag = q.mxd AND mv.di = 0 AND mv.dj = 0
                   AND q.diag < q.na + q.nb)
        )
        WHERE i + di <= na AND j + dj <= nb
          AND diag + di + dj <= na + nb
        GROUP BY a, b, na, nb, i + di, j + dj, diag + di + dj,
                 (di + dj > 0)
    ) t
    LEFT JOIN c cc ON cc.a = t.a AND cc.b = t.b AND cc.i = t.i
                  AND cc.j = t.j AND t.is_new
)
SELECT w.a, w.b, CAST(w.na AS BIGINT) AS n, CAST(w.nb AS BIGINT) AS m,
       CAST(min(w.val) AS BIGINT) AS dtw,
       (SELECT CAST(sum(abs(x.y - y.y)) AS BIGINT)
        FROM p x JOIN p y
          ON x.series_id = w.a AND y.series_id = w.b AND x.rk = y.rk)
           AS l1
FROM w
WHERE w.i = w.na AND w.j = w.nb
GROUP BY w.a, w.b, w.na, w.nb
"""


def q_dbscan_embeddings(sf_dir: str):
    """Density-based clustering, DBSCAN* flavor (no order-dependent
    border assignment — clusters are the connected components of
    CORE-core eps-edges, which is deterministic): exact integer
    distances over trunc(x*1000)-quantized vectors, eps^2 = 1_380_000,
    minPts = 5 (self excluded). Distributed shape: the quantized
    matrix broadcasts once (``ray.put`` — the bounded-corpus/sample
    contract shared with kmeans' centroid rounds; at full scale this
    runs per LSH/IVF block), each batch computes its rows' degrees and
    core-core edges with one integer matmul, and the component merge
    reuses ``stages/components.py`` (the same hash-partitioned
    min-label propagation as near-dup clustering). Output per vector:
    degree, core flag, cluster label (min core id; NULL for
    non-core)."""
    import ray as _ray

    from ..stages.similarity import embedding_matrix

    EPS2, MINPTS = 1_380_000, 5
    ds = _read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding"])

    def _quant(b: pa.Table) -> pa.Table:
        E = np.trunc(embedding_matrix(b).astype(np.float64)
                     * 1000).astype(np.int64)
        return pa.table({"vec_id": b["vec_id"],
                         "v": pa.array(list(E), pa.list_(pa.int64()))})

    rows = ds.map_batches(_quant, batch_format="pyarrow").take_all()
    all_ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    order = np.argsort(all_ids)
    all_ids = all_ids[order]
    M = np.array([rows[i]["v"] for i in order], dtype=np.int64)
    nrm = (M * M).sum(axis=1)
    ref = _ray.put((all_ids, M, nrm))

    def _deg(b: pa.Table) -> pa.Table:
        ids_b = b["vec_id"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        E = np.trunc(embedding_matrix(b).astype(np.float64)
                     * 1000).astype(np.int64)
        aid, AM, an = _ray.get(ref)
        d2 = ((E * E).sum(axis=1)[:, None] + an[None, :]
              - 2 * (E @ AM.T))
        within = d2 <= EPS2
        self_col = aid[None, :] == ids_b[:, None]
        deg = (within & ~self_col).sum(axis=1)
        return pa.table({"vec_id": pa.array(ids_b),
                         "deg": pa.array(deg.astype(np.int64))})

    deg_rows = (ds.map_batches(_deg, batch_format="pyarrow").take_all())
    deg = {int(r["vec_id"]): int(r["deg"]) for r in deg_rows}
    core = {i for i, d in deg.items() if d >= MINPTS}
    core_ref = _ray.put(core)

    def _edges(b: pa.Table) -> pa.Table:
        ids_b = b["vec_id"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        E = np.trunc(embedding_matrix(b).astype(np.float64)
                     * 1000).astype(np.int64)
        aid, AM, an = _ray.get(ref)
        cset = _ray.get(core_ref)
        row_core = np.array([int(i) in cset for i in ids_b])
        col_core = np.array([int(i) in cset for i in aid])
        d2 = ((E * E).sum(axis=1)[:, None] + an[None, :]
              - 2 * (E @ AM.T))
        m = ((d2 <= EPS2) & row_core[:, None] & col_core[None, :]
             & (ids_b[:, None] < aid[None, :]))
        ri, ci = np.nonzero(m)
        return pa.table({"a": pa.array(ids_b[ri]),
                         "b": pa.array(aid[ci])})

    # core-core edges are bounded by the same sample contract as the
    # broadcast matrix, so the component merge is a driver union-find;
    # a full-scale corpus run swaps in stages/components.py's
    # hash-partitioned min-label propagation (as near_dup_clusters does)
    edge_rows = (ds.map_batches(_edges, batch_format="pyarrow")
                 .take_all())
    parent: dict = {}

    def _find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for r in edge_rows:
        ra, rb = _find(int(r["a"])), _find(int(r["b"]))
        if ra != rb:
            hi, lo = max(ra, rb), min(ra, rb)
            parent[hi] = lo
    comp = {i: _find(i)
            for i in {int(r["a"]) for r in edge_rows}
            | {int(r["b"]) for r in edge_rows}}

    ids_sorted = sorted(deg)
    cluster = [comp.get(i, i if i in core else None)
               for i in ids_sorted]
    return pa.table({
        "vec_id": pa.array(ids_sorted, pa.int64()),
        "deg": pa.array([deg[i] for i in ids_sorted], pa.int64()),
        "is_core": pa.array([int(i in core) for i in ids_sorted],
                            pa.int64()),
        "cluster": pa.array(cluster, pa.int64())})


DBSCAN_SQL = """
WITH RECURSIVE q AS (
    SELECT vec_id,
           list_transform(embedding,
               x -> CAST(trunc(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
    FROM embeddings
),
d AS (
    SELECT a.vec_id AS ia, b.vec_id AS ib,
           CAST(list_dot_product(a.v, a.v) + list_dot_product(b.v, b.v)
                - 2 * list_dot_product(a.v, b.v) AS BIGINT) AS d2
    FROM q a JOIN q b ON a.vec_id <> b.vec_id
),
deg AS (
    SELECT ia AS vec_id,
           CAST(count(*) FILTER (WHERE d2 <= 1380000) AS BIGINT) AS deg
    FROM d GROUP BY 1
),
core AS (SELECT vec_id FROM deg WHERE deg >= 5),
ed AS (
    SELECT d.ia AS src, d.ib AS dst
    FROM d JOIN core x ON x.vec_id = d.ia
           JOIN core y ON y.vec_id = d.ib
    WHERE d.d2 <= 1380000
),
reach(node, lbl) AS (
    SELECT DISTINCT src, src FROM ed
    UNION
    SELECT ed.dst, r.lbl FROM reach r JOIN ed ON ed.src = r.node
),
comp AS (SELECT node, min(lbl) AS component FROM reach GROUP BY node)
SELECT deg.vec_id, deg.deg,
       CAST(CASE WHEN c.vec_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
           AS is_core,
       CAST(CASE WHEN c.vec_id IS NULL THEN NULL
                 ELSE coalesce(comp.component, deg.vec_id) END
            AS BIGINT) AS cluster
FROM deg
LEFT JOIN core c ON c.vec_id = deg.vec_id
LEFT JOIN comp ON comp.node = deg.vec_id
"""


def q_interval_union_events(sf_dir: str):
    """Islands-and-gaps interval merge: every event opens a 30-minute
    activity window ``[t, t+30m)``; per series, merge overlapping /
    touching windows into maximal islands and report island count,
    total covered microseconds, the longest island and the longest
    uncovered gap between islands — the classic uptime/coverage
    reduction. One hash(series) shuffle; per segment the island
    boundaries fall out of one running-max pass (``new island iff
    t > cummax(prev ends)``), all exact int64."""
    from ..arrow_utils import stable_part_codes

    W = 1_800_000_000
    ev = _events_series(sf_dir, cols=("event_id", "event_type", "ts"))
    mod = 2 * 64

    def _add_part(b: pa.Table) -> pa.Table:
        h = stable_part_codes(b["event_type"], None)
        return b.append_column(
            "__part", pa.array((h % np.uint64(mod)).astype(np.int32)))

    def _islands(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        s_type = t["event_type"].type
        cols = ("n_islands", "covered_us", "longest_island_us",
                "longest_gap_us")
        if t.num_rows == 0:
            return pa.table({"series_id": pa.array([], s_type),
                             **{c: pa.array([], pa.int64())
                                for c in cols}})
        t = t.take(pc.sort_indices(t, sort_keys=[
            ("event_type", "ascending"), ("ts_us", "ascending")]))
        sid = t["event_type"]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = sid.dictionary_encode().indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        ts = t["ts_us"].to_numpy(zero_copy_only=False).astype(np.int64)
        heads = np.ones(len(codes), dtype=bool)
        heads[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(heads)
        ends_seg = np.r_[starts[1:], len(codes)]
        out = {k: [] for k in ("sid",) + cols}
        for f, l in zip(starts, ends_seg):  # series loop; inner vector
            s_ = ts[f:l]
            e_ = s_ + W
            cm = np.maximum.accumulate(e_)
            new = np.ones(l - f, dtype=bool)
            new[1:] = s_[1:] > cm[:-1]
            isl = np.flatnonzero(new)
            isl_end = np.r_[isl[1:], l - f]
            lo = s_[isl]
            hi = cm[isl_end - 1]
            lens = hi - lo
            gaps = lo[1:] - hi[:-1]
            out["sid"].append(sid[int(f)].as_py())
            out["n_islands"].append(len(isl))
            out["covered_us"].append(int(lens.sum()))
            out["longest_island_us"].append(int(lens.max()))
            out["longest_gap_us"].append(
                int(gaps.max()) if len(gaps) else 0)
        return pa.table({"series_id": pa.array(out["sid"], s_type),
                         **{c: pa.array(out[c], pa.int64())
                            for c in cols}})

    return (ev.map_batches(_add_part, batch_format="pyarrow")
            .repartition(2).groupby("__part")
            .map_groups(_islands, batch_format="pyarrow"))


INTERVAL_UNION_SQL = """
WITH e AS (
    SELECT event_type AS series_id, epoch_us(ts) AS s,
           epoch_us(ts) + 1800000000 AS f
    FROM events
),
m AS (
    SELECT series_id, s, f,
           max(f) OVER (PARTITION BY series_id ORDER BY s, f
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING) AS prev_max
    FROM e
),
g AS (
    SELECT series_id, s, f,
           sum(CASE WHEN prev_max IS NULL OR s > prev_max
                    THEN 1 ELSE 0 END)
               OVER (PARTITION BY series_id ORDER BY s, f
                     ROWS UNBOUNDED PRECEDING) AS island
    FROM m
),
isl AS (
    SELECT series_id, island, min(s) AS lo, max(f) AS hi
    FROM g GROUP BY 1, 2
),
gaps AS (
    SELECT series_id, island, lo, hi,
           lo - lag(hi) OVER (PARTITION BY series_id
                              ORDER BY island) AS gap
    FROM isl
)
SELECT series_id, CAST(count(*) AS BIGINT) AS n_islands,
       CAST(sum(hi - lo) AS BIGINT) AS covered_us,
       CAST(max(hi - lo) AS BIGINT) AS longest_island_us,
       CAST(coalesce(max(gap), 0) AS BIGINT) AS longest_gap_us
FROM gaps GROUP BY 1
"""


def q_experiment_readout_users(sf_dir: str):
    """A/B experiment readout: deterministic arm assignment
    (``user_id % 2``), per-arm user counts, converters (>=1 purchase),
    purchase revenue and event volume — the exact integer inputs to any
    conversion test (the chi-square / Welch layers already exist as
    ``welch_t_events`` / ``term_drift_docs``'s 2x2 machinery). One
    hash(user) shuffle builds per-user rows; arm partials reduce
    map-side; final merge is two rows."""
    from ..arrow_utils import stable_part_codes

    ds = _events_series(
        sf_dir, cols=("event_id", "user_id", "event_type", "ts",
                      "value"))

    def _prep(b: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(b["value"], 100.0),
                                 ndigits=0), pa.int64())
        is_p = pc.equal(b["event_type"], "purchase")
        return pa.table({
            "user_id": b["user_id"],
            "one": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            "purch": pc.cast(is_p, pa.int64()),
            "pcents": pc.if_else(is_p, cents,
                                 pa.scalar(0, pa.int64()))})

    mod = 4 * 64

    def _add_part(b: pa.Table) -> pa.Table:
        h = stable_part_codes(b["user_id"], None)
        return b.append_column(
            "__part", pa.array((h % np.uint64(mod)).astype(np.int32)))

    def _arm_partial(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        if t.num_rows == 0:
            return pa.table({
                "arm": pa.array([], pa.int64()),
                "n_users": pa.array([], pa.int64()),
                "n_converted": pa.array([], pa.int64()),
                "sum_purchase_cents": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64())})
        per_u = t.group_by(["user_id"]).aggregate(
            [("one", "sum"), ("purch", "sum"), ("pcents", "sum")])
        uid = per_u["user_id"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        arm = uid % 2
        nev = per_u["one_sum"].to_numpy(zero_copy_only=False)
        npu = per_u["purch_sum"].to_numpy(zero_copy_only=False)
        cts = per_u["pcents_sum"].to_numpy(zero_copy_only=False)
        rows = {"arm": [], "n_users": [], "n_converted": [],
                "sum_purchase_cents": [], "n_events": []}
        for a in (0, 1):
            m = arm == a
            if not m.any():
                continue
            rows["arm"].append(a)
            rows["n_users"].append(int(m.sum()))
            rows["n_converted"].append(int((npu[m] > 0).sum()))
            rows["sum_purchase_cents"].append(int(cts[m].sum()))
            rows["n_events"].append(int(nev[m].sum()))
        return pa.table({c: pa.array(v, pa.int64())
                         for c, v in rows.items()})

    def _merge(g: pa.Table) -> pa.Table:
        return pa.table({
            "arm": g["arm"].slice(0, 1),
            **{c: pa.array([pc.sum(g[c]).as_py() or 0], pa.int64())
               for c in ("n_users", "n_converted",
                         "sum_purchase_cents", "n_events")}})

    return (ds.map_batches(_prep, batch_format="pyarrow")
            .map_batches(_add_part, batch_format="pyarrow")
            .repartition(4).groupby("__part")
            .map_groups(_arm_partial, batch_format="pyarrow")
            .groupby("arm").map_groups(_merge, batch_format="pyarrow"))


EXPERIMENT_SQL = """
WITH u AS (
    SELECT user_id, user_id % 2 AS arm,
           count(*) AS n_events,
           sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS n_purch,
           sum(CASE WHEN event_type = 'purchase'
               THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
               AS cents
    FROM events GROUP BY 1, 2
)
SELECT CAST(arm AS BIGINT) AS arm,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(CASE WHEN n_purch > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_converted,
       CAST(sum(cents) AS BIGINT) AS sum_purchase_cents,
       CAST(sum(n_events) AS BIGINT) AS n_events
FROM u GROUP BY 1
"""


def q_kcore_docs(sf_dir: str):
    """k-core decomposition (k=5) of the deterministic variable-degree
    link graph (doc d emits ``1 + d % 6`` links ``(d*31 + 97j) % N``,
    undirected simple graph): iteratively peel nodes of degree < k
    until the fixpoint — the standard graph-mining density filter.
    Distributed shape per round (the pagerank/kmeans driver-round
    precedent): degrees from one hash-partitioned grouped count over
    the doubled edge list; the shrinking LOW-degree id set broadcasts
    (``ray.put``) and edges filter map-side; the edge Dataset
    materializes once per round. ~10 rounds at this fixture. Output:
    ``(node, core_deg)`` for the surviving 5-core."""
    import pyarrow.parquet as _pq
    import ray as _ray

    from ..arrow_utils import stable_part_codes

    K = 5
    n = _pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
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

    def _doubled_deg(ed):
        def _both(b: pa.Table) -> pa.Table:
            return pa.table({
                "x": pa.concat_arrays([
                    b["u"].combine_chunks() if isinstance(
                        b["u"], pa.ChunkedArray) else b["u"],
                    b["v"].combine_chunks() if isinstance(
                        b["v"], pa.ChunkedArray) else b["v"]])})

        def _cnt(g: pa.Table) -> pa.Table:
            t = g.drop_columns(["__part"])
            if t.num_rows == 0:
                return pa.table({"node": pa.array([], pa.int64()),
                                 "deg": pa.array([], pa.int64())})
            x = t["x"].to_numpy(zero_copy_only=False).astype(np.int64)
            uniq, cnt = np.unique(x, return_counts=True)
            return pa.table({"node": pa.array(uniq),
                             "deg": pa.array(cnt.astype(np.int64))})

        def _part_x(b: pa.Table) -> pa.Table:
            h = stable_part_codes(b["x"], None)
            return b.append_column(
                "__part",
                pa.array((h % np.uint64(mod)).astype(np.int32)))

        return (ed.map_batches(_both, batch_format="pyarrow")
                .map_batches(_part_x, batch_format="pyarrow")
                .repartition(4).groupby("__part")
                .map_groups(_cnt, batch_format="pyarrow"))

    for _round in range(60):
        deg_rows = _doubled_deg(edges).take_all()
        low = {int(r["node"]) for r in deg_rows if r["deg"] < K}
        if not low:
            break
        low_ref = _ray.put(low)

        def _filter(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return b
            bad = np.fromiter(_ray.get(low_ref), dtype=np.int64)
            u = b["u"].to_numpy(zero_copy_only=False).astype(np.int64)
            v = b["v"].to_numpy(zero_copy_only=False).astype(np.int64)
            keep = ~np.isin(u, bad) & ~np.isin(v, bad)
            return b.filter(pa.array(keep))

        edges = edges.map_batches(
            _filter, batch_format="pyarrow").materialize()
    else:
        raise RuntimeError("k-core peel did not converge in 60 rounds")

    final = _doubled_deg(edges)

    def _rename(b: pa.Table) -> pa.Table:
        return pa.table({"node": b["node"], "core_deg": b["deg"]})

    return final.map_batches(_rename, batch_format="pyarrow")


KCORE_SQL = """
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
seed AS (
    SELECT u AS src, v AS dst FROM und
    UNION ALL
    SELECT v, u FROM und
),
w AS (
    SELECT CAST(0 AS BIGINT) AS iter, src, dst FROM seed
    UNION ALL
    SELECT iter + 1, src, dst FROM (
        SELECT iter, src, dst, keep,
               sum(CASE WHEN keep THEN 1 ELSE 0 END) OVER () AS kept,
               count(*) OVER () AS tot
        FROM (
            SELECT iter, src, dst,
                   (count(*) OVER (PARTITION BY src) >= 5 AND
                    count(*) OVER (PARTITION BY dst) >= 5) AS keep
            FROM w
        )
    )
    WHERE keep AND kept < tot
)
SELECT src AS node, CAST(count(*) AS BIGINT) AS core_deg
FROM (SELECT w.*, max(iter) OVER () AS mx FROM w)
WHERE iter = mx
GROUP BY src
"""


def q_weighted_sample_docs(sf_dir: str):
    """Weighted priority sampling (Duffield-Lund-Thorup shape with the
    uniform draw PINNED to the md5-u64 of the doc id, the catalog's
    SQL-restatable hash): priority = ``(w << 80) // (h + 1)`` — exact
    integer, no float pow/ln, ties broken by doc_id — and the sample is
    the top-k=20 priorities. Heavier docs (w = n_chars) are
    proportionally more likely under the pinned draw, and the selection
    is deterministic and replayable. Distributed shape: per-batch
    local top-k, driver merge sees blocks×k rows."""
    K = 20
    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "n_chars"])

    from ..stages.dedup import _stable_u64

    def _local(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        w = b["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        pri = np.array([(int(wi) << 80) //
                        (_stable_u64(str(int(di)).encode()) + 1)
                        for di, wi in zip(ids, w)], dtype=np.int64)
        order = np.lexsort((ids, -pri))[:K]
        return pa.table({"doc_id": pa.array(ids[order]),
                         "w": pa.array(w[order]),
                         "priority": pa.array(pri[order])})

    parts = ds.map_batches(_local, batch_format="pyarrow").take_all()
    ids = np.array([r["doc_id"] for r in parts], dtype=np.int64)
    w = np.array([r["w"] for r in parts], dtype=np.int64)
    pri = np.array([r["priority"] for r in parts], dtype=np.int64)
    order = np.lexsort((ids, -pri))[:K]
    return pa.table({"doc_id": pa.array(ids[order]),
                     "w": pa.array(w[order]),
                     "priority": pa.array(pri[order])})


_MD5U64_DOCID = _MD5U64.replace("md5(tok)",
                                "md5(CAST(doc_id AS VARCHAR))")

WEIGHTED_SAMPLE_SQL = f"""
WITH t AS (
    SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
           {_MD5U64_DOCID} AS h
    FROM documents
)
SELECT doc_id, w,
       CAST((CAST(w AS HUGEINT) * 1208925819614629174706176)
            // (h + 1) AS BIGINT)
           AS priority
FROM t
ORDER BY priority DESC, doc_id
LIMIT 20
"""


def q_bfs_hops_docs(sf_dir: str):
    """Single-source BFS hop distances from doc 0 over the same
    variable-degree undirected link graph as ``kcore_docs`` —
    completing the graph family (PageRank, components, triangles,
    degree stats, k-core, reachability). Driver-round frontier BFS
    (diameter rounds, 6 here): each round the current frontier
    broadcasts (``ray.put``) and one map over the edge Dataset emits
    the next ring; the distance table accumulates driver-side under
    the same bounded-node contract as the k-core peel. Output:
    ``(node, hop)`` for every reachable node."""
    import pyarrow.parquet as _pq
    import ray as _ray

    from ..arrow_utils import stable_part_codes

    n = _pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
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

    dist = {0: 0}
    frontier = {0}
    hop = 0
    while frontier:
        hop += 1
        f_ref = _ray.put(frontier)

        def _ring(b: pa.Table) -> pa.Table:
            fr = np.fromiter(_ray.get(f_ref), dtype=np.int64)
            u = b["u"].to_numpy(zero_copy_only=False).astype(np.int64)
            v = b["v"].to_numpy(zero_copy_only=False).astype(np.int64)
            mu = np.isin(u, fr)
            mv = np.isin(v, fr)
            nb = np.unique(np.concatenate([v[mu], u[mv]]))
            return pa.table({"node": pa.array(nb)})

        ring = {int(r["node"]) for r in
                edges.map_batches(_ring,
                                  batch_format="pyarrow").take_all()}
        frontier = {x for x in ring if x not in dist}
        for x in frontier:
            dist[x] = hop
        if hop > 64:
            raise RuntimeError("bfs exceeded the diameter bound")
    nodes = sorted(dist)
    return pa.table({"node": pa.array(nodes, pa.int64()),
                     "hop": pa.array([dist[x] for x in nodes],
                                     pa.int64())})


BFS_HOPS_SQL = """
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
reach(node, hop) AS (
    SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT)
    UNION
    SELECT ed.dst, r.hop + 1
    FROM reach r JOIN ed ON ed.src = r.node
    WHERE r.hop < 15
)
SELECT node, CAST(min(hop) AS BIGINT) AS hop
FROM reach GROUP BY 1
"""


def q_churn_features_users(sf_dir: str):
    """Per-user churn feature/label table (the feature-engineering step
    of a training pipeline): activity counts, span, distinct active
    days, largest inter-event gap, purchase stats, and the label
    ``churned = no activity in the final 7 days of the corpus window``
    — all exact int64, point-in-time consistent (every feature derives
    only from the user's own ordered events; the global window end is
    the one broadcast scalar). One hash(user) shuffle, vectorized
    segment pass."""
    from ..arrow_utils import stable_part_codes

    D7 = 7 * 86_400_000_000
    ds = _events_series(
        sf_dir, cols=("event_id", "user_id", "event_type", "ts",
                      "value"))

    def _prep(b: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(b["value"], 100.0),
                                 ndigits=0), pa.int64())
        is_p = pc.equal(b["event_type"], "purchase")
        return pa.table({"user_id": b["user_id"],
                         "ts_us": b["ts_us"],
                         "event_id": b["event_id"],
                         "purch": pc.cast(is_p, pa.int64()),
                         "pcents": pc.if_else(
                             is_p, cents, pa.scalar(0, pa.int64()))})

    prepped = ds.map_batches(_prep, batch_format="pyarrow")
    tmax = max(r["tmax"] for r in prepped.map_batches(
        lambda b: pa.table({"tmax": pa.array(
            [int(b["ts_us"].to_numpy(zero_copy_only=False).max())
             if b.num_rows else 0], pa.int64())}),
        batch_format="pyarrow").take_all())

    mod = 4 * 64

    def _add_part(b: pa.Table) -> pa.Table:
        h = stable_part_codes(b["user_id"], None)
        return b.append_column(
            "__part", pa.array((h % np.uint64(mod)).astype(np.int32)))

    def _features(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        u_type = t["user_id"].type
        cols = ("n_events", "n_purchases", "purchase_cents",
                "active_days", "span_us", "max_gap_us", "churned")
        if t.num_rows == 0:
            return pa.table({"user_id": pa.array([], u_type),
                             **{c: pa.array([], pa.int64())
                                for c in cols}})
        t = t.take(pc.sort_indices(t, sort_keys=[
            ("user_id", "ascending"), ("ts_us", "ascending"),
            ("event_id", "ascending")]))
        uid = t["user_id"]
        if isinstance(uid, pa.ChunkedArray):
            uid = uid.combine_chunks()
        codes = uid.dictionary_encode().indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        ts = t["ts_us"].to_numpy(zero_copy_only=False).astype(np.int64)
        purch = t["purch"].to_numpy(zero_copy_only=False)
        pcents = t["pcents"].to_numpy(zero_copy_only=False)
        heads = np.ones(len(codes), dtype=bool)
        heads[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(heads)
        ends = np.r_[starts[1:], len(codes)]
        n = ends - starts
        day = ts // 86_400_000_000
        gaps = np.diff(ts)
        gaps = np.where(heads[1:], 0, gaps)
        # per-segment max gap over the boundary-masked diffs
        max_gap = np.array(
            [int(gaps[f:l - 1].max()) if l - f > 1 else 0
             for f, l in zip(starts, ends)], dtype=np.int64)
        active = np.array(
            [len(np.unique(day[f:l])) for f, l in zip(starts, ends)],
            dtype=np.int64)
        last = ts[ends - 1]
        return pa.table({
            "user_id": uid.take(pa.array(starts)),
            "n_events": pa.array(n),
            "n_purchases": pa.array(np.add.reduceat(purch, starts)),
            "purchase_cents": pa.array(np.add.reduceat(pcents, starts)),
            "active_days": pa.array(active),
            "span_us": pa.array(last - ts[starts]),
            "max_gap_us": pa.array(max_gap),
            "churned": pa.array(
                (last < tmax - D7).astype(np.int64))})

    return (prepped.map_batches(_add_part, batch_format="pyarrow")
            .repartition(4).groupby("__part")
            .map_groups(_features, batch_format="pyarrow"))


CHURN_FEATURES_SQL = """
WITH e AS (
    SELECT user_id, event_id, epoch_us(ts) AS t, event_type,
           CAST(round(value * 100) AS BIGINT) AS cents
    FROM events
),
mx AS (SELECT max(t) AS tmax FROM e),
g AS (
    SELECT user_id, t,
           t - lag(t) OVER (PARTITION BY user_id
                            ORDER BY t, event_id) AS gap
    FROM e
)
SELECT e.user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_purchases,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN cents
                ELSE 0 END) AS BIGINT) AS purchase_cents,
       CAST(count(DISTINCT t // 86400000000) AS BIGINT) AS active_days,
       CAST(max(t) - min(t) AS BIGINT) AS span_us,
       CAST(coalesce((SELECT max(gap) FROM g
                      WHERE g.user_id = e.user_id), 0) AS BIGINT)
           AS max_gap_us,
       CAST(CASE WHEN max(t) < (SELECT tmax FROM mx) - 604800000000
                 THEN 1 ELSE 0 END AS BIGINT) AS churned
FROM e GROUP BY e.user_id
"""


def q_ips_policy_eval_events(sf_dir: str):
    """Off-policy evaluation by inverse-propensity scoring (the RL /
    recommender counterfactual estimator): behavior policy = the
    logged uniform-over-5-arms stream (propensity 1/5), target policy
    ``pi(user) = 'purchase' if user_id % 3 == 0 else 'click'``, reward
    ``value > 50``. The IPS estimate ``(1/n) Σ r·1[a=pi(x)]/p`` is
    emitted as exact integer numerators (×5): matched count, matched
    reward sum, n — purely map-side partials, one tiny merge, no
    shuffle at all."""
    ds = _events_series(
        sf_dir, cols=("event_id", "user_id", "event_type", "ts",
                      "value"))

    def _partial(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        v = b["value"].to_numpy(zero_copy_only=False)
        target = np.where(uid % 3 == 0, "purchase", "click")
        match = pc.equal(b["event_type"],
                         pa.array(target.tolist())).to_numpy(
            zero_copy_only=False)
        r = v > 50
        return pa.table({
            "n": pa.array([b.num_rows], pa.int64()),
            "n_matched": pa.array([int(match.sum())], pa.int64()),
            "reward_matched_x5": pa.array(
                [int((match & r).sum()) * 5], pa.int64()),
            "reward_all": pa.array([int(r.sum())], pa.int64())})

    rows = ds.map_batches(_partial, batch_format="pyarrow").take_all()
    agg = {k: sum(int(r[k]) for r in rows)
           for k in ("n", "n_matched", "reward_matched_x5",
                     "reward_all")}
    return pa.table({k: pa.array([v], pa.int64())
                     for k, v in agg.items()})


IPS_POLICY_SQL = """
SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN event_type =
                     (CASE WHEN user_id % 3 = 0
                           THEN 'purchase' ELSE 'click' END)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
       CAST(5 * sum(CASE WHEN value > 50 AND event_type =
                         (CASE WHEN user_id % 3 = 0
                               THEN 'purchase' ELSE 'click' END)
                    THEN 1 ELSE 0 END) AS BIGINT)
           AS reward_matched_x5,
       CAST(sum(CASE WHEN value > 50 THEN 1 ELSE 0 END) AS BIGINT)
           AS reward_all
FROM events
"""


def q_returned_revenue_customers(sf_dir: str):
    """TPC-H-Q10-style returned-item report: revenue lost to returns
    per customer over one half-year of orders, top 20 with customer /
    nation labels. Shape: date-pruned orders hash-join
    returnflag-filtered lineitem (both filtered BEFORE the exchange),
    exact e6 integer revenue partial-sums per customer (hashpart
    grouped sum), distributed sort+limit — and only the 20 surviving
    rows are labeled (dimension lookups AFTER the top-k, so customer
    is never broadcast)."""
    from ..stages.graph import grouped_sum_parts

    lo_us = 820_454_400 * US   # 1996-01-01 UTC
    hi_us = 836_179_200 * US   # 1996-07-01 UTC

    def _orders(b: pa.Table) -> pa.Table:
        ts = pc.cast(b["o_orderdate"], pa.int64())
        t = b.append_column("o_date_us", ts)
        keep = pc.and_(pc.greater_equal(t["o_date_us"],
                                        pa.scalar(lo_us, pa.int64())),
                       pc.less(t["o_date_us"],
                               pa.scalar(hi_us, pa.int64())))
        t = t.filter(keep)
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "o_custkey": t["o_custkey"]})

    orders = _read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        _orders, batch_format="pyarrow")

    def _line(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b["l_returnflag"], "R"))
        price = pc.cast(pc.round(pc.multiply(t["l_extendedprice"],
                                             100.0), ndigits=0),
                        pa.int64())
        disc = pc.cast(pc.round(pc.multiply(t["l_discount"], 10000.0),
                                ndigits=0), pa.int64())
        rev = pc.multiply(price,
                          pc.subtract(pa.scalar(10000, pa.int64()),
                                      disc))
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "revenue_e6": rev})

    line = _read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice",
                 "l_discount"]).map_batches(_line,
                                            batch_format="pyarrow")
    j = line.join(orders, join_type="inner", num_partitions=4,
                  on=("l_orderkey",), right_on=("o_orderkey",))
    agg = grouped_sum_parts(
        j.map_batches(lambda b: pa.table({
            "o_custkey": b["o_custkey"],
            "revenue_e6": b["revenue_e6"]}), batch_format="pyarrow"),
        ["o_custkey"], ["revenue_e6"], count_col=None, fanin=4)
    top = (agg.sort(key=["revenue_e6", "o_custkey"],
                    descending=[True, False]).limit(20).take_all())
    keys = {int(r["o_custkey"]) for r in top}

    cust = {int(r["c_custkey"]): (r["c_name"], int(r["c_nationkey"]))
            for r in _read_parquet_clean(
                f"{sf_dir}/customer.parquet",
                columns=["c_custkey", "c_name", "c_nationkey"])
            .map_batches(
                lambda b: b.filter(pc.is_in(
                    b["c_custkey"],
                    value_set=pa.array(sorted(keys), pa.int64()))),
                batch_format="pyarrow").take_all()}
    nation = {int(r["n_nationkey"]): r["n_name"]
              for r in _read_parquet_clean(
                  f"{sf_dir}/nation.parquet",
                  columns=["n_nationkey", "n_name"]).take_all()}
    return pa.table({
        "c_custkey": pa.array([int(r["o_custkey"]) for r in top],
                              pa.int64()),
        "c_name": pa.array([cust[int(r["o_custkey"])][0]
                            for r in top]),
        "n_name": pa.array([nation[cust[int(r["o_custkey"])][1]]
                            for r in top]),
        "revenue_e6": pa.array([int(r["revenue_e6"]) for r in top],
                               pa.int64())})


RETURNED_REVENUE_SQL = """
WITH r AS (
    SELECT o_custkey,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (10000 - CAST(round(l_discount * 10000)
                                    AS BIGINT))) AS BIGINT)
               AS revenue_e6
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-07-01'
    GROUP BY 1
)
SELECT c_custkey, c_name, n_name, revenue_e6
FROM r
JOIN customer ON c_custkey = o_custkey
JOIN nation ON n_nationkey = c_nationkey
ORDER BY revenue_e6 DESC, c_custkey
LIMIT 20
"""


def q_quantile_normalize_1d(sf_dir: str):
    """Quantile normalization across series (the cross-sample
    calibration classic): every series' rank-r value is replaced by
    the cross-series SUM of rank-r values (the exact-integer form of
    the usual rank mean — divide by the series count to taste). The
    1d tier gives equal-length series (30 buckets), the method's
    requirement. Shape: one hash(series) shuffle ranks each series
    (ties pinned by (y, bucket)); the 30-row rank-sum profile reduces
    map-side and broadcasts back in a closure; one more pass maps each
    row. Output: ``(series_id, bucket, y, rank, qn_sum)``."""
    from ..arrow_utils import stable_part_codes
    from ..stages.rollup import rollup

    D1 = 86_400_000_000
    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    rolled = (rollup(ev.map_batches(_series, batch_format="pyarrow"),
                     D1)
              .select_columns(["series_id", "bucket", "sum_y"]))
    mod = 2 * 64

    def _add_part(b: pa.Table) -> pa.Table:
        h = stable_part_codes(b["series_id"], None)
        return b.append_column(
            "__part", pa.array((h % np.uint64(mod)).astype(np.int32)))

    def _rank(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        s_type = t["series_id"].type
        if t.num_rows == 0:
            return pa.table({"series_id": pa.array([], s_type),
                             "bucket": pa.array([], pa.int64()),
                             "y": pa.array([], pa.int64()),
                             "rank": pa.array([], pa.int64())})
        t = t.take(pc.sort_indices(t, sort_keys=[
            ("series_id", "ascending"), ("sum_y", "ascending"),
            ("bucket", "ascending")]))
        sid = t["series_id"]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = sid.dictionary_encode().indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        heads = np.ones(len(codes), dtype=bool)
        heads[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(heads)
        seg_of = np.cumsum(heads) - 1
        pos = np.arange(len(codes)) - starts[seg_of]
        return pa.table({
            "series_id": sid,
            "bucket": t["bucket"].cast(pa.int64()),
            "y": t["sum_y"].cast(pa.int64()),
            "rank": pa.array(pos + 1)})

    ranked = (rolled.map_batches(_add_part, batch_format="pyarrow")
              .repartition(2).groupby("__part")
              .map_groups(_rank, batch_format="pyarrow")).materialize()

    def _profile(b: pa.Table) -> pa.Table:
        g = pa.table({"rank": b["rank"], "y": b["y"]}).group_by(
            ["rank"]).aggregate([("y", "sum")])
        return g.rename_columns(["rank", "ysum"])

    prof_rows = ranked.map_batches(
        _profile, batch_format="pyarrow").take_all()
    prof: dict = {}
    for r in prof_rows:
        prof[int(r["rank"])] = prof.get(int(r["rank"]), 0) + int(
            r["ysum"])

    def _apply(b: pa.Table) -> pa.Table:
        rk = b["rank"].to_numpy(zero_copy_only=False).astype(np.int64)
        qn = np.array([prof[int(r)] for r in rk], dtype=np.int64)
        return b.append_column("qn_sum", pa.array(qn))

    return ranked.map_batches(_apply, batch_format="pyarrow")


QUANTILE_NORMALIZE_SQL = """
WITH r AS (
    SELECT event_type AS series_id,
           epoch_us(ts) // 86400000000 * 86400000000 AS bucket,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
    FROM events GROUP BY 1, 2
),
rk AS (
    SELECT series_id, bucket, y,
           CAST(row_number() OVER (PARTITION BY series_id
                                   ORDER BY y, bucket) AS BIGINT)
               AS rank
    FROM r
),
prof AS (
    SELECT rank, CAST(sum(y) AS BIGINT) AS qn_sum FROM rk GROUP BY 1
)
SELECT rk.series_id, CAST(rk.bucket AS BIGINT) AS bucket, rk.y,
       rk.rank, prof.qn_sum
FROM rk JOIN prof ON prof.rank = rk.rank
"""


def q_pmi_pairs_docs(sf_dir: str):
    """Collocation mining: the top-30 token pairs by pointwise mutual
    information, ranked WITHOUT floats — the existing co-occurrence
    stage already emits exact ``pmi_num = co_df·N`` / ``pmi_den =
    df_a·df_b``, and the ranking key is the scaled integer quotient
    ``(pmi_num·1e6) // pmi_den`` with (a, b) tie-breaks. Composes
    ``stages/cooccur.py`` with a distributed sort+limit; a minimum
    co-document support of 3 filters hapax noise."""
    import pyarrow.parquet as _pq

    from ..stages.cooccur import cooccurrence

    n = _pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"]).repartition(8)
    co = cooccurrence(ds, n_docs=n, num_partitions=8)

    def _score(b: pa.Table) -> pa.Table:
        t = b.filter(pc.greater_equal(b["co_df"],
                                      pa.scalar(3, pa.int64())))
        num = t["pmi_num"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        den = t["pmi_den"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        score = num * 1_000_000 // den
        return pa.table({"a": t["a"], "b": t["b"],
                         "co_df": t["co_df"],
                         "pmi_score_e6": pa.array(score)})

    return (co.map_batches(_score, batch_format="pyarrow")
            .sort(key=["pmi_score_e6", "a", "b"],
                  descending=[True, False, False]).limit(30))


PMI_PAIRS_SQL = """
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
       CAST(c.co_df * (SELECT c FROM n) * 1000000
            // (da.df * db.df) AS BIGINT) AS pmi_score_e6
FROM c JOIN d da ON da.token = c.a JOIN d db ON db.token = c.b
WHERE c.co_df >= 3
ORDER BY pmi_score_e6 DESC, a, b
LIMIT 30
"""


def q_class_terms_docs(sf_dir: str):
    """Class-characteristic terms (the BERTopic/c-TF-IDF readout,
    float-free): for each embedding label, the top-5 tokens by the
    integer lift ``(c_lt · T · 1e6) // (t_total · T_l)`` — occurrences
    of t in the label's docs vs the corpus rate, min support 5,
    (score, token) tie-breaks. Shape: the 500-row doc→label map
    broadcasts in a closure (dimension contract); per-batch
    (label, token) count partials reduce through one hashpart grouped
    sum; token totals come from the same table re-reduced; the final
    per-label top-5 is one segment pass over a label-hash shuffle."""
    from ..arrow_utils import stable_part_codes

    ds_lab = _read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                                 columns=["vec_id", "label"])
    lab = {int(r["vec_id"]): int(r["label"])
           for r in ds_lab.take_all()}

    docs = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"]).repartition(8)

    def _counts(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        toks = pc.split_pattern(b["text"], " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        off = toks.offsets.to_numpy(zero_copy_only=False).astype(
            np.int64)
        flat = toks.values.slice(int(off[0]), int(off[-1] - off[0]))
        nonempty = pc.invert(pc.equal(pc.utf8_length(flat), 0))
        labels = np.array([lab[int(i)] for i in ids], dtype=np.int64)
        per_tok_label = np.repeat(labels, np.diff(off))
        keep = nonempty.to_numpy(zero_copy_only=False)
        t = pa.table({"label": pa.array(per_tok_label[keep]),
                      "token": flat.filter(nonempty)})
        g = t.group_by(["label", "token"]).aggregate([([], "count_all")])
        return g.rename_columns(["label", "token", "c"])

    counts = docs.map_batches(_counts, batch_format="pyarrow")
    mod = 4 * 64

    def _part_lt(b: pa.Table) -> pa.Table:
        h = stable_part_codes(b["token"], None)
        return b.append_column(
            "__part", pa.array((h % np.uint64(mod)).astype(np.int32)))

    def _sum_lt(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        if t.num_rows == 0:
            return pa.table({"label": pa.array([], pa.int64()),
                             "token": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        s = t.group_by(["label", "token"]).aggregate([("c", "sum")])
        return s.rename_columns(["label", "token", "c"])

    lt = (counts.map_batches(_part_lt, batch_format="pyarrow")
          .repartition(4).groupby("__part")
          .map_groups(_sum_lt, batch_format="pyarrow")).materialize()

    tot_rows = lt.map_batches(
        lambda b: pa.table({
            "token": b["token"], "c": b["c"],
            "label": b["label"]}),
        batch_format="pyarrow").take_all()
    t_total: dict = {}
    t_label: dict = {}
    T = 0
    for r in tot_rows:
        t_total[r["token"]] = t_total.get(r["token"], 0) + int(r["c"])
        t_label[int(r["label"])] = (t_label.get(int(r["label"]), 0)
                                    + int(r["c"]))
        T += int(r["c"])

    def _score(b: pa.Table) -> pa.Table:
        t = b.filter(pc.greater_equal(b["c"], pa.scalar(5, pa.int64())))
        toks = t["token"].to_pylist()
        labs = t["label"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        score = np.array(
            [int(ci) * T * 1_000_000
             // (t_total[tk] * t_label[int(li)])
             for ci, tk, li in zip(c, toks, labs)], dtype=np.int64)
        return pa.table({"label": pa.array(labs), "token": t["token"],
                         "c": pa.array(c),
                         "score_e6": pa.array(score)})

    scored = lt.map_batches(_score, batch_format="pyarrow")

    def _part_l(b: pa.Table) -> pa.Table:
        h = stable_part_codes(b["label"], None)
        return b.append_column(
            "__part", pa.array((h % np.uint64(mod)).astype(np.int32)))

    def _top5(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        if t.num_rows == 0:
            return pa.table({"label": pa.array([], pa.int64()),
                             "token": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64()),
                             "score_e6": pa.array([], pa.int64())})
        t = t.take(pc.sort_indices(t, sort_keys=[
            ("label", "ascending"), ("score_e6", "descending"),
            ("token", "ascending")]))
        labs = t["label"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        heads = np.ones(len(labs), dtype=bool)
        heads[1:] = labs[1:] != labs[:-1]
        starts = np.flatnonzero(heads)
        seg_of = np.cumsum(heads) - 1
        pos = np.arange(len(labs)) - starts[seg_of]
        return t.filter(pa.array(pos < 5))

    return (scored.map_batches(_part_l, batch_format="pyarrow")
            .repartition(4).groupby("__part")
            .map_groups(_top5, batch_format="pyarrow"))


CLASS_TERMS_SQL = """
WITH lab AS (SELECT vec_id AS doc_id, CAST(label AS BIGINT) AS label
             FROM embeddings),
w AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS token
    FROM documents
),
wf AS (
    SELECT w.doc_id, lab.label, token
    FROM w JOIN lab ON lab.doc_id = w.doc_id
    WHERE token <> ''
),
ct AS (SELECT label, token, CAST(count(*) AS BIGINT) AS c
       FROM wf GROUP BY 1, 2),
tt AS (SELECT token, CAST(count(*) AS BIGINT) AS t_total
       FROM wf GROUP BY 1),
tl AS (SELECT label, CAST(count(*) AS BIGINT) AS t_label
       FROM wf GROUP BY 1),
tot AS (SELECT CAST(count(*) AS BIGINT) AS t FROM wf),
s AS (
    SELECT ct.label, ct.token, ct.c,
           CAST(ct.c * (SELECT t FROM tot) * 1000000
                // (tt.t_total * tl.t_label) AS BIGINT) AS score_e6
    FROM ct
    JOIN tt ON tt.token = ct.token
    JOIN tl ON tl.label = ct.label
    WHERE ct.c >= 5
)
SELECT label, token, c, score_e6 FROM (
    SELECT s.*, row_number() OVER (PARTITION BY label
                                   ORDER BY score_e6 DESC, token) AS rk
    FROM s
) WHERE rk <= 5
"""


def q_langid_confusion_docs(sf_dir: str):
    """Language-ID quality audit: confusion matrix of the LangId
    heuristic's predictions against the corpus' ground-truth ``lang``
    column — (true, predicted, count) cells, the standard classifier
    acceptance report. Actor-pool prediction (profiles built once per
    actor in ``__init__``), per-batch cell partials, tiny final merge
    (<=|langs|² rows)."""
    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text", "lang"])

    from ..stages.textstats import LangId

    class _Conf:
        def __init__(self):
            self.lid = LangId()

        def __call__(self, b: pa.Table) -> pa.Table:
            preds = self.lid(b.select(["doc_id", "text"]))
            t = pa.table({"true_lang": b["lang"],
                          "pred_lang": preds["lang_pred"]})
            g = t.group_by(["true_lang", "pred_lang"]).aggregate(
                [([], "count_all")])
            return g.rename_columns(["true_lang", "pred_lang", "n"])

    def _merge(g: pa.Table) -> pa.Table:
        return pa.table({
            "true_lang": g["true_lang"].slice(0, 1),
            "pred_lang": g["pred_lang"].slice(0, 1),
            "n": pa.array([pc.sum(g["n"]).as_py() or 0], pa.int64())})

    return (ds.map_batches(_Conf, batch_format="pyarrow",
                           concurrency=(1, 8))
            .groupby(["true_lang", "pred_lang"])
            .map_groups(_merge, batch_format="pyarrow"))


def _langid_confusion_sql() -> str:
    return f"""
WITH {_langid_ctes("documents")}
SELECT d.lang AS true_lang, l.lang_pred AS pred_lang,
       CAST(count(*) AS BIGINT) AS n
FROM lid_out l JOIN documents d USING (doc_id)
GROUP BY 1, 2
"""


def q_busday_rollup_orders(sf_dir: str):
    """Business-day settlement rollup: weekend orders roll FORWARD to
    the next business day (Sat → +2, Sun → +1, pinned epoch-day
    arithmetic ``dow = (day + 4) % 7`` — no calendar library on either
    side), then exact cents totals per business day through the
    hashpart grouped sum. The settlement-calendar semantics every
    finance pipeline needs, minus the holiday table (which would
    broadcast exactly like the seasonal profile)."""
    from ..stages.graph import grouped_sum_parts

    DAY = 86_400_000_000

    def _prep(b: pa.Table) -> pa.Table:
        day = (pc.cast(b["o_orderdate"], pa.int64()).to_numpy(
            zero_copy_only=False) // DAY)
        dow = (day + 4) % 7
        bus = day + np.where(dow == 6, 2, np.where(dow == 0, 1, 0))
        cents = pc.cast(pc.round(pc.multiply(b["o_totalprice"], 100.0),
                                 ndigits=0), pa.int64())
        return pa.table({"busday": pa.array(bus.astype(np.int64)),
                         "total_cents": cents,
                         "one": pa.array(
                             np.ones(b.num_rows, dtype=np.int64))})

    ds = _read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderdate", "o_totalprice"]).map_batches(
        _prep, batch_format="pyarrow")
    agg = grouped_sum_parts(ds, ["busday"], ["total_cents", "one"],
                            count_col=None, fanin=4)
    return agg.map_batches(
        lambda b: pa.table({"busday": b["busday"],
                            "n_orders": b["one"],
                            "total_cents": b["total_cents"]}),
        batch_format="pyarrow")


BUSDAY_ROLLUP_SQL = """
WITH o AS (
    SELECT epoch_us(o_orderdate) // 86400000000 AS day,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
),
b AS (
    SELECT day + CASE WHEN (day + 4) % 7 = 6 THEN 2
                      WHEN (day + 4) % 7 = 0 THEN 1
                      ELSE 0 END AS busday,
           cents
    FROM o
)
SELECT CAST(busday AS BIGINT) AS busday,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(cents) AS BIGINT) AS total_cents
FROM b GROUP BY 1
"""


def q_clustering_coeff_docs(sf_dir: str):
    """Local clustering coefficient per node — ``2·tri / (deg·(deg−1))``
    as an exact gcd-reduced fraction — composing the per-node triangle
    counts (``stages/graph.py:triangle_counts``) with doubled-edge
    degree counts. Join-free merge: both per-node tables union as
    zero-padded partials ``(node, deg, tri)`` and reduce through ONE
    hashpart grouped sum; nodes with deg < 2 are omitted (undefined
    coefficient)."""
    import pyarrow.parquet as _pq

    from ..arrow_utils import stable_part_codes
    from ..stages.graph import triangle_counts

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
    tri = triangle_counts(edges, num_partitions=4, fanin=4)

    def _tri_part(b: pa.Table) -> pa.Table:
        return pa.table({
            "node": b["doc_id"].cast(pa.int64()),
            "deg": pa.array(np.zeros(b.num_rows, dtype=np.int64)),
            "tri": b["n_triangles"].cast(pa.int64())})

    mod = 4 * 64

    # exact degrees need a hashpart distinct over canonical edges first
    # (hash by u co-locates every copy of an edge; per-node partial
    # degrees from different partitions merge in the final grouped sum)
    def _canon(b: pa.Table) -> pa.Table:
        src = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = src != dst
        u = np.minimum(src[keep], dst[keep])
        v = np.maximum(src[keep], dst[keep])
        return pa.table({"u": pa.array(u), "v": pa.array(v)})

    def _part_u(b: pa.Table) -> pa.Table:
        h = stable_part_codes(b["u"], None)
        return b.append_column(
            "__part", pa.array((h % np.uint64(mod)).astype(np.int32)))

    def _dedup(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        if t.num_rows == 0:
            return pa.table({"node": pa.array([], pa.int64()),
                             "deg": pa.array([], pa.int64()),
                             "tri": pa.array([], pa.int64())})
        u = t["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = np.unique(u * np.int64(2 ** 32) + v)
        both = np.concatenate([key // np.int64(2 ** 32),
                               key % np.int64(2 ** 32)])
        uniq, cnt = np.unique(both, return_counts=True)
        return pa.table({"node": pa.array(uniq),
                         "deg": pa.array(cnt.astype(np.int64)),
                         "tri": pa.array(np.zeros(len(uniq),
                                                  dtype=np.int64))})

    deg = (edges.map_batches(_canon, batch_format="pyarrow")
           .map_batches(_part_u, batch_format="pyarrow")
           .repartition(4).groupby("__part")
           .map_groups(_dedup, batch_format="pyarrow"))

    unioned = deg.union(tri.map_batches(_tri_part,
                                        batch_format="pyarrow"))

    def _part_n(b: pa.Table) -> pa.Table:
        h = stable_part_codes(b["node"], None)
        return b.append_column(
            "__part", pa.array((h % np.uint64(mod)).astype(np.int32)))

    def _cc(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        empty = pa.table({"node": pa.array([], pa.int64()),
                          "deg": pa.array([], pa.int64()),
                          "n_triangles": pa.array([], pa.int64()),
                          "cc_num": pa.array([], pa.int64()),
                          "cc_den": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        node = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        degv = t["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
        triv = t["tri"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(node, kind="stable")
        node, degv, triv = node[order], degv[order], triv[order]
        heads = np.ones(len(node), dtype=bool)
        heads[1:] = node[1:] != node[:-1]
        starts = np.flatnonzero(heads)
        nd = node[starts]
        d = np.add.reduceat(degv, starts)
        tr = np.add.reduceat(triv, starts)
        keep = d >= 2
        nd, d, tr = nd[keep], d[keep], tr[keep]
        num = 2 * tr
        den = d * (d - 1)
        g_ = np.gcd(num, den)
        g_ = np.where(g_ == 0, 1, g_)
        return pa.table({"node": pa.array(nd), "deg": pa.array(d),
                         "n_triangles": pa.array(tr),
                         "cc_num": pa.array(num // g_),
                         "cc_den": pa.array(den // g_)})

    return (unioned.map_batches(_part_n, batch_format="pyarrow")
            .repartition(4).groupby("__part")
            .map_groups(_cc, batch_format="pyarrow"))


CLUSTERING_COEFF_SQL = """
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
deg AS (
    SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
        SELECT a AS node FROM e UNION ALL SELECT b FROM e
    ) GROUP BY 1
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
    SELECT a AS node FROM t
    UNION ALL SELECT b FROM t
    UNION ALL SELECT c FROM t
),
tri AS (SELECT node, CAST(count(*) AS BIGINT) AS tri FROM v GROUP BY 1)
SELECT deg.node, deg.deg,
       CAST(coalesce(tri.tri, 0) AS BIGINT) AS n_triangles,
       CAST(2 * coalesce(tri.tri, 0)
            // greatest(gcd(2 * coalesce(tri.tri, 0),
                            deg.deg * (deg.deg - 1)), 1) AS BIGINT)
           AS cc_num,
       CAST(deg.deg * (deg.deg - 1)
            // greatest(gcd(2 * coalesce(tri.tri, 0),
                            deg.deg * (deg.deg - 1)), 1) AS BIGINT)
           AS cc_den
FROM deg LEFT JOIN tri ON tri.node = deg.node
WHERE deg.deg >= 2
"""


def q_lateness_accounting_events(sf_dir: str):
    """Streaming watermark/lateness accounting (the Beam/Flink triage
    every windowed pipeline reports): with the deterministic ingest
    delay ``(event_id % 10) * 90 s`` and 15-minute tumbling windows, an
    event is ON TIME if it arrives before its window closes, LATE-OK
    within the 5-minute allowed lateness, DROPPED after. Per series:
    the three counts plus total delay — pure per-row arithmetic, so the
    whole audit is map-side partials + a ≤|series| merge, no shuffle of
    the stream."""
    W15 = 900 * US
    ALLOW = 300 * US

    ev = _events_series(sf_dir, cols=("event_id", "event_type", "ts"))

    def _partial(b: pa.Table) -> pa.Table:
        ts = b["ts_us"].to_numpy(zero_copy_only=False).astype(np.int64)
        eid = b["event_id"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        delay = (eid % 10) * 90 * US
        ingest = ts + delay
        close = (ts // W15 + 1) * W15
        on_time = ingest <= close
        late_ok = ~on_time & (ingest <= close + ALLOW)
        dropped = ~on_time & ~late_ok
        t = pa.table({"event_type": b["event_type"],
                      "on_time": pa.array(on_time.astype(np.int64)),
                      "late_ok": pa.array(late_ok.astype(np.int64)),
                      "dropped": pa.array(dropped.astype(np.int64)),
                      "delay_us": pa.array(delay)})
        g = t.group_by(["event_type"]).aggregate(
            [("on_time", "sum"), ("late_ok", "sum"),
             ("dropped", "sum"), ("delay_us", "sum")])
        return g.rename_columns(["event_type", "n_on_time",
                                 "n_late_ok", "n_dropped",
                                 "total_delay_us"])

    def _merge(g: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": g["event_type"].slice(0, 1),
            **{c: pa.array([pc.sum(g[c]).as_py() or 0], pa.int64())
               for c in ("n_on_time", "n_late_ok", "n_dropped",
                         "total_delay_us")}})

    return (ev.map_batches(_partial, batch_format="pyarrow")
            .groupby("event_type").map_groups(_merge,
                                              batch_format="pyarrow"))


LATENESS_SQL = """
WITH e AS (
    SELECT event_type, epoch_us(ts) AS t,
           (event_id % 10) * 90000000 AS delay
    FROM events
),
c AS (
    SELECT event_type, delay,
           t + delay AS ingest,
           (t // 900000000 + 1) * 900000000 AS wclose
    FROM e
)
SELECT event_type,
       CAST(sum(CASE WHEN ingest <= wclose THEN 1 ELSE 0 END)
            AS BIGINT) AS n_on_time,
       CAST(sum(CASE WHEN ingest > wclose
                      AND ingest <= wclose + 300000000
                THEN 1 ELSE 0 END) AS BIGINT) AS n_late_ok,
       CAST(sum(CASE WHEN ingest > wclose + 300000000
                THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       CAST(sum(delay) AS BIGINT) AS total_delay_us
FROM c GROUP BY 1
"""


def q_decision_stump_users(sf_dir: str):
    """Train a depth-1 decision tree (stump) on the churn table:
    the exact Gini-optimal threshold on ``n_events`` for predicting
    ``churned``. Minimizing weighted Gini = maximizing
    ``h(t) = (p_l²+q_l²)/n_l + (p_r²+q_r²)/n_r``; candidates are
    ordered by the e12-scaled integer quotient of h's common-denominator
    form (ties → smaller threshold) — no floats, both sides identical.
    Scale shape: the stream reduces map-side to the BOUNDED
    (feature value → (count, churned)) histogram (distinct n_events
    values, not users); the prefix-sum scan over candidates is
    driver-side on that bounded table. Output: one row with the chosen
    threshold and its split counts."""
    from ..arrow_utils import stable_part_codes

    D7 = 7 * 86_400_000_000
    ds = _events_series(sf_dir, cols=("event_id", "user_id", "ts"))

    tmax = max(r["tmax"] for r in ds.map_batches(
        lambda b: pa.table({"tmax": pa.array(
            [int(b["ts_us"].to_numpy(zero_copy_only=False).max())
             if b.num_rows else 0], pa.int64())}),
        batch_format="pyarrow").take_all())

    mod = 4 * 64

    def _add_part(b: pa.Table) -> pa.Table:
        h = stable_part_codes(b["user_id"], None)
        return b.append_column(
            "__part", pa.array((h % np.uint64(mod)).astype(np.int32)))

    def _hist(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        if t.num_rows == 0:
            return pa.table({"x": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "churn": pa.array([], pa.int64())})
        uid = t["user_id"]
        if isinstance(uid, pa.ChunkedArray):
            uid = uid.combine_chunks()
        codes = uid.dictionary_encode().indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        ts = t["ts_us"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(codes, kind="stable")
        codes, ts = codes[order], ts[order]
        heads = np.ones(len(codes), dtype=bool)
        heads[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(heads)
        n_ev = np.diff(np.append(starts, len(codes)))
        last = np.maximum.reduceat(ts, starts)
        churned = (last < tmax - D7).astype(np.int64)
        xs, inv = np.unique(n_ev, return_inverse=True)
        cnt = np.bincount(inv)
        ch = np.bincount(inv, weights=churned).astype(np.int64)
        return pa.table({"x": pa.array(xs.astype(np.int64)),
                         "n": pa.array(cnt.astype(np.int64)),
                         "churn": pa.array(ch)})

    rows = (ds.map_batches(_add_part, batch_format="pyarrow")
            .repartition(4).groupby("__part")
            .map_groups(_hist, batch_format="pyarrow")).take_all()
    hist: dict = {}
    for r in rows:
        x = int(r["x"])
        n0, c0 = hist.get(x, (0, 0))
        hist[x] = (n0 + int(r["n"]), c0 + int(r["churn"]))
    xs = sorted(hist)
    N = sum(n for n, _ in hist.values())
    P = sum(c for _, c in hist.values())
    best = None
    nl = pl = 0
    for t in xs[:-1]:
        n, c = hist[t]
        nl += n
        pl += c
        nr, pr = N - nl, P - pl
        ql, qr = nl - pl, nr - pr
        A = pl * pl + ql * ql
        B = pr * pr + qr * qr
        score_q = (A * nr + B * nl) * 10 ** 12 // (nl * nr)
        key = (-score_q, t)
        if best is None or key < best[0]:
            best = (key, t, nl, pl, nr, pr)
    _, thr, n_left, churn_left, n_right, churn_right = best
    return pa.table({
        "threshold": pa.array([thr], pa.int64()),
        "n_left": pa.array([n_left], pa.int64()),
        "churn_left": pa.array([churn_left], pa.int64()),
        "n_right": pa.array([n_right], pa.int64()),
        "churn_right": pa.array([churn_right], pa.int64())})


DECISION_STUMP_SQL = """
WITH u AS (
    SELECT user_id, count(*) AS n_events,
           CAST(max(epoch_us(ts)) <
                (SELECT max(epoch_us(ts)) FROM events) - 604800000000
                AS BIGINT) AS churned
    FROM events GROUP BY 1
),
h AS (
    SELECT n_events AS x, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(churned) AS BIGINT) AS churn
    FROM u GROUP BY 1
),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
               CAST(sum(churn) AS BIGINT) AS pp FROM h),
pre AS (
    SELECT x,
           CAST(sum(n) OVER (ORDER BY x
                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS nl,
           CAST(sum(churn) OVER (ORDER BY x
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS pl
    FROM h
),
cand AS (
    SELECT x AS threshold, nl, pl,
           (SELECT nn FROM tot) - nl AS nr,
           (SELECT pp FROM tot) - pl AS pr
    FROM pre
    WHERE (SELECT nn FROM tot) - nl > 0
),
scored AS (
    SELECT threshold, nl, pl, nr, pr,
           ((pl * pl + (nl - pl) * (nl - pl)) * nr
            + (pr * pr + (nr - pr) * (nr - pr)) * nl)
           * 1000000000000 // (nl * nr) AS score_q
    FROM cand
)
SELECT CAST(threshold AS BIGINT) AS threshold,
       nl AS n_left, pl AS churn_left,
       nr AS n_right, pr AS churn_right
FROM (
    SELECT scored.*, row_number() OVER (ORDER BY score_q DESC,
                                        threshold) AS rk
    FROM scored
) WHERE rk = 1
"""


def q_mann_kendall_15m(sf_dir: str):
    """Mann-Kendall nonparametric trend test per series over the 15m
    tier: ``S = Σ_{i<j} sign(y_j − y_i)`` and the tie-corrected
    variance NUMERATOR ``18·Var = n(n−1)(2n+5) − Σ t(t−1)(2t+5)`` —
    all exact int64 (the significance z is one float away, left to the
    caller). The standard companion to Theil-Sen's slope: same ONE
    hash(series) shuffle; S accumulates earlier-smaller minus
    earlier-larger counts through a Fenwick tree over compressed value
    ranks — O(n log n) on tier rows, never the quadratic pair
    expansion."""
    from ..arrow_utils import stable_part_codes
    from ..stages.rollup import rollup

    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    rolled = rollup(ev.map_batches(_series, batch_format="pyarrow"),
                    900 * US)
    mod = 2 * 64

    def _add_part(b: pa.Table) -> pa.Table:
        h = stable_part_codes(b["series_id"], None)
        return b.append_column(
            "__part", pa.array((h % np.uint64(mod)).astype(np.int32)))

    def _mk(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        s_type = t["series_id"].type
        cols = ("n", "s_stat", "var18")
        if t.num_rows == 0:
            return pa.table({"series_id": pa.array([], s_type),
                             **{c: pa.array([], pa.int64())
                                for c in cols}})
        t = t.take(pc.sort_indices(t, sort_keys=[
            ("series_id", "ascending"), ("bucket", "ascending")]))
        sid = t["series_id"]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = sid.dictionary_encode().indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        y = t["sum_y"].to_numpy(zero_copy_only=False).astype(np.int64)
        heads = np.ones(len(codes), dtype=bool)
        heads[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(heads)
        ends = np.r_[starts[1:], len(codes)]
        out = {k: [] for k in ("sid",) + cols}
        for f, l in zip(starts, ends):  # series loop; inner vectorized
            yy = y[f:l]
            n = l - f
            order = np.argsort(yy, kind="stable")
            ys = yy[order]
            newv = np.ones(n, dtype=bool)
            newv[1:] = ys[1:] != ys[:-1]
            vstart = np.flatnonzero(newv)
            tcnt = np.diff(np.append(vstart, n))
            # S = sum over time-ordered pairs of sign(y_later - y_early)
            # = per position j: (#earlier smaller) - (#earlier larger),
            # counted with a Fenwick tree over compressed value ranks
            ranks = np.searchsorted(ys[newv], yy)
            tree = np.zeros(len(vstart) + 1, dtype=np.int64)

            def _upd(i):
                i += 1
                while i < len(tree):
                    tree[i] += 1
                    i += i & (-i)

            def _qry(i):
                s = 0
                i += 1
                while i > 0:
                    s += tree[i]
                    i -= i & (-i)
                return s

            S = 0
            for j in range(n):  # Fenwick walk; tier rows only
                r = int(ranks[j])
                smaller = _qry(r - 1)
                eq = _qry(r) - smaller
                S += smaller - (j - smaller - eq)
                _upd(r)
            var18 = (n * (n - 1) * (2 * n + 5)
                     - int((tcnt * (tcnt - 1) * (2 * tcnt + 5)).sum()))
            out["sid"].append(sid[int(f)].as_py())
            out["n"].append(n)
            out["s_stat"].append(int(S))
            out["var18"].append(var18)
        return pa.table({"series_id": pa.array(out["sid"], s_type),
                         **{c: pa.array(out[c], pa.int64())
                            for c in cols}})

    return (rolled.map_batches(_add_part, batch_format="pyarrow")
            .repartition(2).groupby("__part")
            .map_groups(_mk, batch_format="pyarrow"))


MANN_KENDALL_SQL = """
WITH r AS (
    SELECT event_type AS series_id,
           epoch_us(ts) // 900000000 * 900000000 AS bucket,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
    FROM events GROUP BY 1, 2
),
p AS (
    SELECT a.series_id,
           CAST(sum(CASE WHEN b.y > a.y THEN 1
                         WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT)
               AS s_stat
    FROM r a JOIN r b
      ON a.series_id = b.series_id AND b.bucket > a.bucket
    GROUP BY 1
),
nn AS (SELECT series_id, CAST(count(*) AS BIGINT) AS n
       FROM r GROUP BY 1),
ties AS (
    SELECT series_id,
           CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
               AS tie_term
    FROM (SELECT series_id, y, count(*) AS t FROM r GROUP BY 1, 2)
    GROUP BY 1
)
SELECT nn.series_id, nn.n, coalesce(p.s_stat, 0) AS s_stat,
       CAST(nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tie_term
            AS BIGINT) AS var18
FROM nn
LEFT JOIN p ON p.series_id = nn.series_id
JOIN ties ON ties.series_id = nn.series_id
"""


def q_page_hinkley_15m(sf_dir: str):
    """Page-Hinkley mean-shift drift detector per series over the 15m
    tier (the streaming-ML drift test beside CUSUM/AMOC): deviations
    are scaled by the series count to stay integer
    (``d_i = n·y_i − Σy``), ``PH_t = cumsum(d) − running_min`` and an
    alarm fires when ``PH_t > n·λ`` (λ = 50 000 cents). Output per
    series: n, final/max PH (in the n-scaled units), alarm count and
    first alarm bucket. One hash(series) shuffle; cumsum + running min
    per segment — the one-sided clamp family's window identity again.
    """
    from ..arrow_utils import stable_part_codes
    from ..stages.rollup import rollup

    LAM = 50_000
    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    rolled = rollup(ev.map_batches(_series, batch_format="pyarrow"),
                    900 * US)
    mod = 2 * 64

    def _add_part(b: pa.Table) -> pa.Table:
        h = stable_part_codes(b["series_id"], None)
        return b.append_column(
            "__part", pa.array((h % np.uint64(mod)).astype(np.int32)))

    def _ph(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        s_type = t["series_id"].type
        cols = ("n", "final_ph", "max_ph", "n_alarms", "first_alarm")
        if t.num_rows == 0:
            return pa.table({"series_id": pa.array([], s_type),
                             **{c: pa.array([], pa.int64())
                                for c in cols}})
        t = t.take(pc.sort_indices(t, sort_keys=[
            ("series_id", "ascending"), ("bucket", "ascending")]))
        sid = t["series_id"]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = sid.dictionary_encode().indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        y = t["sum_y"].to_numpy(zero_copy_only=False).astype(np.int64)
        bkt = t["bucket"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        heads = np.ones(len(codes), dtype=bool)
        heads[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(heads)
        ends = np.r_[starts[1:], len(codes)]
        out = {k: [] for k in ("sid",) + cols}
        for f, l in zip(starts, ends):  # series loop; inner vector
            yy = y[f:l]
            n = l - f
            d = n * yy - yy.sum()
            M = np.cumsum(d)
            ph = M - np.minimum.accumulate(M)
            alarm = ph > n * LAM
            out["sid"].append(sid[int(f)].as_py())
            out["n"].append(n)
            out["final_ph"].append(int(ph[-1]))
            out["max_ph"].append(int(ph.max()))
            out["n_alarms"].append(int(alarm.sum()))
            first = np.flatnonzero(alarm)
            out["first_alarm"].append(
                int(bkt[f + first[0]]) if len(first) else None)
        return pa.table({
            "series_id": pa.array(out["sid"], s_type),
            "n": pa.array(out["n"], pa.int64()),
            "final_ph": pa.array(out["final_ph"], pa.int64()),
            "max_ph": pa.array(out["max_ph"], pa.int64()),
            "n_alarms": pa.array(out["n_alarms"], pa.int64()),
            "first_alarm": pa.array(out["first_alarm"], pa.int64())})

    return (rolled.map_batches(_add_part, batch_format="pyarrow")
            .repartition(2).groupby("__part")
            .map_groups(_ph, batch_format="pyarrow"))


PAGE_HINKLEY_SQL = """
WITH r AS (
    SELECT event_type AS series_id,
           epoch_us(ts) // 900000000 * 900000000 AS bucket,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
    FROM events GROUP BY 1, 2
),
s AS (
    SELECT series_id, bucket, y,
           CAST(count(*) OVER (PARTITION BY series_id) AS BIGINT) AS n,
           CAST(sum(y) OVER (PARTITION BY series_id) AS BIGINT) AS sy
    FROM r
),
m AS (
    SELECT series_id, bucket, n,
           CAST(sum(n * y - sy) OVER w AS BIGINT) AS M
    FROM s
    WINDOW w AS (PARTITION BY series_id ORDER BY bucket
                 ROWS UNBOUNDED PRECEDING)
),
p AS (
    SELECT series_id, bucket, n,
           M - min(M) OVER (PARTITION BY series_id ORDER BY bucket
                            ROWS UNBOUNDED PRECEDING) AS ph
    FROM m
)
SELECT series_id, CAST(max(n) AS BIGINT) AS n,
       CAST(max(CASE WHEN rk = n THEN ph END) AS BIGINT) AS final_ph,
       CAST(max(ph) AS BIGINT) AS max_ph,
       CAST(sum(CASE WHEN ph > n * 50000 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_alarms,
       CAST(min(CASE WHEN ph > n * 50000 THEN bucket END) AS BIGINT)
           AS first_alarm
FROM (
    SELECT p.*, row_number() OVER (PARTITION BY series_id
                                   ORDER BY bucket) AS rk
    FROM p
) GROUP BY 1
"""


def q_covisit_users(sf_dir: str):
    """Co-visitation pairs (the collaborative-filtering bipartite
    projection): two users co-visit when both are active in the same
    (event_type, 1h bucket) cell; emit the top-20 user pairs by
    co-cell count — exact integers, (count DESC, u, v) total order.
    Shape: one hash(cell) shuffle; per-cell DISTINCT user lists expand
    to (u < v) pairs with the segment-pair gather (cells are bounded —
    a production run caps hot cells with logged drops, as the dedup
    operators do); pair counts reduce through one hashpart grouped
    sum; distributed sort + limit."""
    from ..arrow_utils import stable_part_codes
    from ..stages.graph import grouped_sum_parts

    H = 3_600_000_000
    ev = _events_series(sf_dir, cols=("event_id", "user_id",
                                      "event_type", "ts"))

    def _cells(b: pa.Table) -> pa.Table:
        bkt = (b["ts_us"].to_numpy(zero_copy_only=False).astype(
            np.int64) // H)
        return pa.table({"cell_type": b["event_type"],
                         "cell_bucket": pa.array(bkt),
                         "user_id": b["user_id"].cast(pa.int64())})

    mod = 4 * 64

    def _add_part(b: pa.Table) -> pa.Table:
        h = stable_part_codes(b["cell_type"], None)
        bkt = b["cell_bucket"].to_numpy(zero_copy_only=False).astype(
            np.uint64)
        mix = (h ^ (bkt * np.uint64(0x9E3779B97F4A7C15)))
        return b.append_column(
            "__part", pa.array((mix % np.uint64(mod)).astype(np.int32)))

    def _pairs(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        empty = pa.table({"u": pa.array([], pa.int64()),
                          "v": pa.array([], pa.int64()),
                          "one": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        key = pa.table({"ct": t["cell_type"], "cb": t["cell_bucket"],
                        "u": t["user_id"]})
        key = key.group_by(["ct", "cb", "u"]).aggregate([])
        key = key.take(pc.sort_indices(key, sort_keys=[
            ("ct", "ascending"), ("cb", "ascending"),
            ("u", "ascending")]))
        ct = key["ct"]
        if isinstance(ct, pa.ChunkedArray):
            ct = ct.combine_chunks()
        ccode = ct.dictionary_encode().indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        cb = key["cb"].to_numpy(zero_copy_only=False).astype(np.int64)
        u = key["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        cell = ccode * np.int64(2 ** 32) + cb % np.int64(2 ** 32)
        heads = np.ones(len(cell), dtype=bool)
        heads[1:] = cell[1:] != cell[:-1]
        starts = np.flatnonzero(heads)
        n = np.diff(np.append(starts, len(cell)))
        live = n > 1
        if not live.any():
            return empty
        segl, nl = starts[live], n[live]
        sq = nl * nl
        offs = np.concatenate(([0], np.cumsum(sq)[:-1]))
        q = np.arange(int(sq.sum())) - np.repeat(offs, sq)
        nn_ = np.repeat(nl, sq)
        i_loc = q // nn_
        j_loc = q % nn_
        keep = j_loc > i_loc
        i = (np.repeat(segl, sq) + i_loc)[keep]
        j = (np.repeat(segl, sq) + j_loc)[keep]
        return pa.table({"u": pa.array(u[i]), "v": pa.array(u[j]),
                         "one": pa.array(np.ones(len(i),
                                                 dtype=np.int64))})

    pairs = (ev.map_batches(_cells, batch_format="pyarrow")
             .map_batches(_add_part, batch_format="pyarrow")
             .repartition(4).groupby("__part")
             .map_groups(_pairs, batch_format="pyarrow"))
    agg = grouped_sum_parts(pairs, ["u", "v"], ["one"],
                            count_col=None, fanin=4)
    return (agg.map_batches(
        lambda b: pa.table({"u": b["u"], "v": b["v"],
                            "n_cocells": b["one"]}),
        batch_format="pyarrow")
        .sort(key=["n_cocells", "u", "v"],
              descending=[True, False, False]).limit(20))


COVISIT_SQL = """
WITH c AS (
    SELECT DISTINCT event_type AS ct, epoch_us(ts) // 3600000000 AS cb,
           user_id AS u
    FROM events
)
SELECT a.u AS u, b.u AS v, CAST(count(*) AS BIGINT) AS n_cocells
FROM c a JOIN c b ON a.ct = b.ct AND a.cb = b.cb AND a.u < b.u
GROUP BY 1, 2
ORDER BY n_cocells DESC, u, v
LIMIT 20
"""


def q_boxplot_15m(sf_dir: str):
    """Tukey boxplot summary per series over the 15m tier: min, Q1,
    median, Q3, max (the pinned lower-quantile convention shared with
    ``exact_quantiles``), the 1.5·IQR whiskers and the outlier count —
    fences kept exact by doubling (``upper2 = 2·Q3 + 3·IQR``, compare
    ``2·y`` against it; never a .5 float). One hash(series) shuffle,
    one sorted segment pass for every statistic."""
    from ..arrow_utils import stable_part_codes
    from ..stages.rollup import rollup

    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    rolled = rollup(ev.map_batches(_series, batch_format="pyarrow"),
                    900 * US)
    mod = 2 * 64

    def _add_part(b: pa.Table) -> pa.Table:
        h = stable_part_codes(b["series_id"], None)
        return b.append_column(
            "__part", pa.array((h % np.uint64(mod)).astype(np.int32)))

    def _box(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        s_type = t["series_id"].type
        cols = ("n", "y_min", "q1", "median", "q3", "y_max",
                "lo_whisker", "hi_whisker", "n_outliers")
        if t.num_rows == 0:
            return pa.table({"series_id": pa.array([], s_type),
                             **{c: pa.array([], pa.int64())
                                for c in cols}})
        t = t.take(pc.sort_indices(t, sort_keys=[
            ("series_id", "ascending"), ("sum_y", "ascending"),
            ("bucket", "ascending")]))
        sid = t["series_id"]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = sid.dictionary_encode().indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        y = t["sum_y"].to_numpy(zero_copy_only=False).astype(np.int64)
        heads = np.ones(len(codes), dtype=bool)
        heads[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(heads)
        ends = np.r_[starts[1:], len(codes)]
        out = {k: [] for k in ("sid",) + cols}
        for f, l in zip(starts, ends):  # series loop; inner vector
            yy = y[f:l]
            n = l - f
            q1 = int(yy[(n - 1) * 25 // 100])
            q2 = int(yy[(n - 1) * 50 // 100])
            q3 = int(yy[(n - 1) * 75 // 100])
            iqr = q3 - q1
            lo2 = 2 * q1 - 3 * iqr
            hi2 = 2 * q3 + 3 * iqr
            inside = (2 * yy >= lo2) & (2 * yy <= hi2)
            out["sid"].append(sid[int(f)].as_py())
            out["n"].append(n)
            out["y_min"].append(int(yy[0]))
            out["q1"].append(q1)
            out["median"].append(q2)
            out["q3"].append(q3)
            out["y_max"].append(int(yy[-1]))
            out["lo_whisker"].append(int(yy[inside].min()))
            out["hi_whisker"].append(int(yy[inside].max()))
            out["n_outliers"].append(int((~inside).sum()))
        return pa.table({"series_id": pa.array(out["sid"], s_type),
                         **{c: pa.array(out[c], pa.int64())
                            for c in cols}})

    return (rolled.map_batches(_add_part, batch_format="pyarrow")
            .repartition(2).groupby("__part")
            .map_groups(_box, batch_format="pyarrow"))


BOXPLOT_SQL = """
WITH r AS (
    SELECT event_type AS series_id,
           epoch_us(ts) // 900000000 * 900000000 AS bucket,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
    FROM events GROUP BY 1, 2
),
o AS (
    SELECT series_id, y,
           row_number() OVER (PARTITION BY series_id
                              ORDER BY y, bucket) - 1 AS rk,
           count(*) OVER (PARTITION BY series_id) AS n
    FROM r
),
q AS (
    SELECT series_id, CAST(max(n) AS BIGINT) AS n,
           CAST(min(y) AS BIGINT) AS y_min,
           CAST(max(CASE WHEN rk = (n - 1) * 25 // 100 THEN y END)
                AS BIGINT) AS q1,
           CAST(max(CASE WHEN rk = (n - 1) * 50 // 100 THEN y END)
                AS BIGINT) AS median,
           CAST(max(CASE WHEN rk = (n - 1) * 75 // 100 THEN y END)
                AS BIGINT) AS q3,
           CAST(max(y) AS BIGINT) AS y_max
    FROM o GROUP BY series_id
)
SELECT q.series_id, q.n, q.y_min, q.q1, q.median, q.q3, q.y_max,
       CAST(min(CASE WHEN 2 * r.y >= 2 * q.q1 - 3 * (q.q3 - q.q1)
                      AND 2 * r.y <= 2 * q.q3 + 3 * (q.q3 - q.q1)
                THEN r.y END) AS BIGINT) AS lo_whisker,
       CAST(max(CASE WHEN 2 * r.y >= 2 * q.q1 - 3 * (q.q3 - q.q1)
                      AND 2 * r.y <= 2 * q.q3 + 3 * (q.q3 - q.q1)
                THEN r.y END) AS BIGINT) AS hi_whisker,
       CAST(sum(CASE WHEN 2 * r.y < 2 * q.q1 - 3 * (q.q3 - q.q1)
                      OR 2 * r.y > 2 * q.q3 + 3 * (q.q3 - q.q1)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM q JOIN r ON r.series_id = q.series_id
GROUP BY 1, 2, 3, 4, 5, 6, 7
"""


def q_median_of_means_15m(sf_dir: str):
    """Median-of-means robust mean per series (the heavy-tail-safe
    estimator behind every streaming robust-statistics bound): tier
    rows stripe into g=10 contiguous groups (``grp = (rk−1)·g // n``),
    group means stay EXACT rationals (sum, count), and the median
    group is selected by exact rational order — keys are
    ``sum_i · (D / cnt_i)`` with D = the ≤2 distinct group sizes'
    product, ties by group index; the lower median. Output per series:
    n, n_groups, the median group's (sum, count) and the plain overall
    sum for contrast. One hash(series) shuffle, one segment pass."""
    from ..arrow_utils import stable_part_codes
    from ..stages.rollup import rollup

    G = 10
    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    rolled = rollup(ev.map_batches(_series, batch_format="pyarrow"),
                    900 * US)
    mod = 2 * 64

    def _add_part(b: pa.Table) -> pa.Table:
        h = stable_part_codes(b["series_id"], None)
        return b.append_column(
            "__part", pa.array((h % np.uint64(mod)).astype(np.int32)))

    def _mom(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        s_type = t["series_id"].type
        cols = ("n", "n_groups", "mom_sum", "mom_cnt", "total_sum")
        if t.num_rows == 0:
            return pa.table({"series_id": pa.array([], s_type),
                             **{c: pa.array([], pa.int64())
                                for c in cols}})
        t = t.take(pc.sort_indices(t, sort_keys=[
            ("series_id", "ascending"), ("bucket", "ascending")]))
        sid = t["series_id"]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = sid.dictionary_encode().indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        y = t["sum_y"].to_numpy(zero_copy_only=False).astype(np.int64)
        heads = np.ones(len(codes), dtype=bool)
        heads[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(heads)
        ends = np.r_[starts[1:], len(codes)]
        out = {k: [] for k in ("sid",) + cols}
        for f, l in zip(starts, ends):  # series loop; inner vector
            yy = y[f:l]
            n = l - f
            rk = np.arange(n)
            grp = rk * G // n
            ng = int(grp.max()) + 1
            sums = np.bincount(grp, weights=yy).astype(np.int64)
            cnts = np.bincount(grp).astype(np.int64)
            D = int(np.unique(cnts).prod())
            keys = sums * (D // cnts)
            order = np.lexsort((np.arange(ng), keys))
            med = order[(ng - 1) // 2]
            out["sid"].append(sid[int(f)].as_py())
            out["n"].append(n)
            out["n_groups"].append(ng)
            out["mom_sum"].append(int(sums[med]))
            out["mom_cnt"].append(int(cnts[med]))
            out["total_sum"].append(int(yy.sum()))
        return pa.table({"series_id": pa.array(out["sid"], s_type),
                         **{c: pa.array(out[c], pa.int64())
                            for c in cols}})

    return (rolled.map_batches(_add_part, batch_format="pyarrow")
            .repartition(2).groupby("__part")
            .map_groups(_mom, batch_format="pyarrow"))


MEDIAN_OF_MEANS_SQL = """
WITH r AS (
    SELECT event_type AS series_id,
           epoch_us(ts) // 900000000 * 900000000 AS bucket,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
    FROM events GROUP BY 1, 2
),
o AS (
    SELECT series_id, y,
           CAST(row_number() OVER (PARTITION BY series_id
                                   ORDER BY bucket) - 1 AS BIGINT)
               AS rk,
           CAST(count(*) OVER (PARTITION BY series_id) AS BIGINT) AS n
    FROM r
),
grps AS (
    SELECT series_id, n, rk * 10 // n AS grp,
           CAST(sum(y) AS BIGINT) AS gsum,
           CAST(count(*) AS BIGINT) AS gcnt
    FROM o GROUP BY 1, 2, 3
),
dd AS (
    -- product of the (<=2) distinct group sizes: striping makes sizes
    -- take at most two values, so max*min covers it (just max if equal)
    SELECT series_id,
           CAST(max(cnt) * min(cnt)
                // CASE WHEN max(cnt) = min(cnt) THEN max(cnt)
                        ELSE 1 END AS BIGINT) AS d
    FROM (SELECT DISTINCT series_id, gcnt AS cnt FROM grps)
    GROUP BY 1
),
keyed AS (
    SELECT g.series_id, g.n, g.grp, g.gsum, g.gcnt,
           g.gsum * (dd.d // g.gcnt) AS k,
           count(*) OVER (PARTITION BY g.series_id) AS ng
    FROM grps g JOIN dd ON dd.series_id = g.series_id
)
SELECT series_id, n, CAST(ng AS BIGINT) AS n_groups,
       CAST(gsum AS BIGINT) AS mom_sum,
       CAST(gcnt AS BIGINT) AS mom_cnt,
       (SELECT CAST(sum(y) AS BIGINT) FROM o
        WHERE o.series_id = keyed.series_id) AS total_sum
FROM (
    SELECT keyed.*, row_number() OVER (PARTITION BY series_id
                                       ORDER BY k, grp) AS rnk
    FROM keyed
) keyed
WHERE rnk = (ng - 1) // 2 + 1
"""


def q_discord_1h(sf_dir: str):
    """Time-series discord discovery (matrix-profile-lite): per series
    over the 1h tier, the length-6 window whose exact integer squared
    Euclidean distance to its NEAREST non-overlapping neighbor
    (exclusion zone |i−j| >= w) is LARGEST — the classic anomaly
    primitive. Engine: one integer Gram matmul per series
    (``D² = S_i + S_j − 2·A·Aᵀ``, windows as rows), exclusion-zone
    mask, row-min then argmax with smallest-index ties; tier rows keep
    the quadratic profile partition-local. Output per series:
    discord position (bucket), its nearest-neighbor D² and the window
    count."""
    from ..arrow_utils import stable_part_codes
    from ..stages.rollup import rollup

    W = 6
    H = 3_600_000_000
    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    rolled = rollup(ev.map_batches(_series, batch_format="pyarrow"), H)
    mod = 2 * 64

    def _add_part(b: pa.Table) -> pa.Table:
        h = stable_part_codes(b["series_id"], None)
        return b.append_column(
            "__part", pa.array((h % np.uint64(mod)).astype(np.int32)))

    def _discord(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        s_type = t["series_id"].type
        cols = ("n_windows", "discord_bucket", "nn_d2")
        if t.num_rows == 0:
            return pa.table({"series_id": pa.array([], s_type),
                             **{c: pa.array([], pa.int64())
                                for c in cols}})
        t = t.take(pc.sort_indices(t, sort_keys=[
            ("series_id", "ascending"), ("bucket", "ascending")]))
        sid = t["series_id"]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = sid.dictionary_encode().indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        y = t["sum_y"].to_numpy(zero_copy_only=False).astype(np.int64)
        bkt = t["bucket"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        heads = np.ones(len(codes), dtype=bool)
        heads[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(heads)
        ends = np.r_[starts[1:], len(codes)]
        out = {k: [] for k in ("sid",) + cols}
        BIG = np.int64(1 << 62)
        for f, l in zip(starts, ends):  # series loop; inner matmul
            yy = y[f:l]
            n = l - f
            m = n - W + 1
            if m < 2:
                continue
            A = np.lib.stride_tricks.sliding_window_view(yy, W)
            A = np.ascontiguousarray(A)
            S = (A * A).sum(axis=1)
            D2 = S[:, None] + S[None, :] - 2 * (A @ A.T)
            ii = np.arange(m)
            mask = np.abs(ii[:, None] - ii[None, :]) < W
            D2 = np.where(mask, BIG, D2)
            nn = D2.min(axis=1)
            valid = nn < BIG
            if not valid.any():
                continue
            nn_v = np.where(valid, nn, -1)
            best = int(np.argmax(nn_v))  # first max = smallest index
            out["sid"].append(sid[int(f)].as_py())
            out["n_windows"].append(m)
            out["discord_bucket"].append(int(bkt[f + best]))
            out["nn_d2"].append(int(nn[best]))
        return pa.table({"series_id": pa.array(out["sid"], s_type),
                         **{c: pa.array(out[c], pa.int64())
                            for c in cols}})

    return (rolled.map_batches(_add_part, batch_format="pyarrow")
            .repartition(2).groupby("__part")
            .map_groups(_discord, batch_format="pyarrow"))


DISCORD_SQL = """
WITH r AS (
    SELECT event_type AS series_id,
           epoch_us(ts) // 3600000000 * 3600000000 AS bucket,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
    FROM events GROUP BY 1, 2
),
o AS (
    SELECT series_id, bucket, y,
           CAST(row_number() OVER win AS BIGINT) AS rk,
           list(y) OVER (PARTITION BY series_id ORDER BY bucket
                         ROWS BETWEEN CURRENT ROW AND 5 FOLLOWING)
               AS v,
           count(*) OVER (PARTITION BY series_id ORDER BY bucket
                          ROWS BETWEEN CURRENT ROW AND 5 FOLLOWING)
               AS wlen
    FROM r
    WINDOW win AS (PARTITION BY series_id ORDER BY bucket)
),
wv AS (SELECT series_id, bucket, rk, v FROM o WHERE wlen = 6),
d AS (
    SELECT a.series_id, a.rk AS i, a.bucket,
           min(CAST(list_dot_product(a.v, a.v)
                    + list_dot_product(b.v, b.v)
                    - 2 * list_dot_product(a.v, b.v) AS BIGINT))
               AS nn_d2
    FROM wv a JOIN wv b
      ON a.series_id = b.series_id AND abs(a.rk - b.rk) >= 6
    GROUP BY 1, 2, 3
),
m AS (SELECT series_id, CAST(count(*) AS BIGINT) AS n_windows
      FROM wv GROUP BY 1)
SELECT d.series_id, m.n_windows,
       CAST(d.bucket AS BIGINT) AS discord_bucket, d.nn_d2
FROM (
    SELECT d.*, row_number() OVER (PARTITION BY series_id
                                   ORDER BY nn_d2 DESC, i) AS rnk
    FROM d
) d JOIN m ON m.series_id = d.series_id
WHERE d.rnk = 1
"""


def q_motif_1h(sf_dir: str):
    """Top motif (the discord's complement): per series the PAIR of
    non-overlapping length-6 windows with the smallest exact integer
    squared distance — the repeated-pattern primitive (numeric sibling
    of the SAX trigram motifs). Same per-series integer Gram machinery
    as ``discord_1h``; ties resolve by (d2, i, j). Output:
    (series_id, bucket_a, bucket_b, d2)."""
    from ..arrow_utils import stable_part_codes
    from ..stages.rollup import rollup

    W = 6
    H = 3_600_000_000
    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    rolled = rollup(ev.map_batches(_series, batch_format="pyarrow"), H)
    mod = 2 * 64

    def _add_part(b: pa.Table) -> pa.Table:
        h = stable_part_codes(b["series_id"], None)
        return b.append_column(
            "__part", pa.array((h % np.uint64(mod)).astype(np.int32)))

    def _motif(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        s_type = t["series_id"].type
        cols = ("bucket_a", "bucket_b", "d2")
        if t.num_rows == 0:
            return pa.table({"series_id": pa.array([], s_type),
                             **{c: pa.array([], pa.int64())
                                for c in cols}})
        t = t.take(pc.sort_indices(t, sort_keys=[
            ("series_id", "ascending"), ("bucket", "ascending")]))
        sid = t["series_id"]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = sid.dictionary_encode().indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        y = t["sum_y"].to_numpy(zero_copy_only=False).astype(np.int64)
        bkt = t["bucket"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        heads = np.ones(len(codes), dtype=bool)
        heads[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(heads)
        ends = np.r_[starts[1:], len(codes)]
        out = {k: [] for k in ("sid",) + cols}
        BIG = np.int64(1 << 62)
        for f, l in zip(starts, ends):
            yy = y[f:l]
            n = l - f
            m = n - W + 1
            if m < 2:
                continue
            A = np.ascontiguousarray(
                np.lib.stride_tricks.sliding_window_view(yy, W))
            S = (A * A).sum(axis=1)
            D2 = S[:, None] + S[None, :] - 2 * (A @ A.T)
            ii = np.arange(m)
            bad = (ii[:, None] >= ii[None, :] - W + 1)
            # keep only j - i >= W (i < j, non-overlapping, each pair once)
            D2 = np.where(bad, BIG, D2)
            if D2.min() >= BIG:
                continue
            flat = int(np.argmin(D2))  # first min = smallest (i, j)
            i, j = divmod(flat, m)
            out["sid"].append(sid[int(f)].as_py())
            out["bucket_a"].append(int(bkt[f + i]))
            out["bucket_b"].append(int(bkt[f + j]))
            out["d2"].append(int(D2[i, j]))
        return pa.table({"series_id": pa.array(out["sid"], s_type),
                         **{c: pa.array(out[c], pa.int64())
                            for c in cols}})

    return (rolled.map_batches(_add_part, batch_format="pyarrow")
            .repartition(2).groupby("__part")
            .map_groups(_motif, batch_format="pyarrow"))


MOTIF_SQL = """
WITH r AS (
    SELECT event_type AS series_id,
           epoch_us(ts) // 3600000000 * 3600000000 AS bucket,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
    FROM events GROUP BY 1, 2
),
o AS (
    SELECT series_id, bucket, y,
           CAST(row_number() OVER win AS BIGINT) AS rk,
           list(y) OVER (PARTITION BY series_id ORDER BY bucket
                         ROWS BETWEEN CURRENT ROW AND 5 FOLLOWING)
               AS v,
           count(*) OVER (PARTITION BY series_id ORDER BY bucket
                          ROWS BETWEEN CURRENT ROW AND 5 FOLLOWING)
               AS wlen
    FROM r
    WINDOW win AS (PARTITION BY series_id ORDER BY bucket)
),
wv AS (SELECT series_id, bucket, rk, v FROM o WHERE wlen = 6),
d AS (
    SELECT a.series_id, a.rk AS i, b.rk AS j,
           a.bucket AS bucket_a, b.bucket AS bucket_b,
           CAST(list_dot_product(a.v, a.v) + list_dot_product(b.v, b.v)
                - 2 * list_dot_product(a.v, b.v) AS BIGINT) AS d2
    FROM wv a JOIN wv b
      ON a.series_id = b.series_id AND b.rk - a.rk >= 6
)
SELECT series_id, CAST(bucket_a AS BIGINT) AS bucket_a,
       CAST(bucket_b AS BIGINT) AS bucket_b, d2
FROM (
    SELECT d.*, row_number() OVER (PARTITION BY series_id
                                   ORDER BY d2, i, j) AS rnk
    FROM d
) WHERE rnk = 1
"""


def q_label_propagation_docs(sf_dir: str):
    """One synchronous round of label propagation (the semi-supervised
    graph-ML baseline): every node's predicted label is the MAJORITY of
    its neighbors' seed labels (embeddings.label keyed by
    vec_id = doc_id), ties to the smallest label — deterministic by
    construction. Shape: undirected edges fan both directions, seed
    labels ride a broadcast closure (dimension contract), per-(node,
    label) vote partials reduce through one hashpart grouped sum, and
    the per-node argmax is a sorted segment pass. Output:
    (node, pred_label, n_votes, n_neighbors)."""
    import pyarrow.parquet as _pq

    from ..arrow_utils import stable_part_codes

    n = _pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    lab_rows = _read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                                   columns=["vec_id", "label"]
                                   ).take_all()
    lab = {int(r["vec_id"]): int(r["label"]) for r in lab_rows}

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id"]).repartition(4)

    mod = 4 * 64

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

    def _part_e(b: pa.Table) -> pa.Table:
        h = stable_part_codes(b["u"], None)
        return b.append_column(
            "__part", pa.array((h % np.uint64(mod)).astype(np.int32)))

    def _votes(g: pa.Table) -> pa.Table:
        # hash(u) co-locates every copy of an edge -> exact distinct,
        # then votes fan both directions with broadcast seed labels
        t = g.drop_columns(["__part"])
        if t.num_rows == 0:
            return pa.table({"node": pa.array([], pa.int64()),
                             "vote": pa.array([], pa.int64()),
                             "one": pa.array([], pa.int64())})
        u = t["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = np.unique(u * np.int64(2 ** 32) + v)
        u, v = key // np.int64(2 ** 32), key % np.int64(2 ** 32)
        node = np.concatenate([u, v])
        nb = np.concatenate([v, u])
        votes = np.array([lab[int(x)] for x in nb], dtype=np.int64)
        return pa.table({"node": pa.array(node),
                         "vote": pa.array(votes),
                         "one": pa.array(np.ones(len(node),
                                                 dtype=np.int64))})

    def _add_part(b: pa.Table) -> pa.Table:
        h = stable_part_codes(b["node"], None)
        return b.append_column(
            "__part", pa.array((h % np.uint64(mod)).astype(np.int32)))

    def _majority(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        if t.num_rows == 0:
            return pa.table({"node": pa.array([], pa.int64()),
                             "pred_label": pa.array([], pa.int64()),
                             "n_votes": pa.array([], pa.int64()),
                             "n_neighbors": pa.array([], pa.int64())})
        s = t.group_by(["node", "vote"]).aggregate([("one", "sum")])
        node = s["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        vote = s["vote"].to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = s["one_sum"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        order = np.lexsort((vote, -cnt, node))
        node, vote, cnt = node[order], vote[order], cnt[order]
        heads = np.ones(len(node), dtype=bool)
        heads[1:] = node[1:] != node[:-1]
        starts = np.flatnonzero(heads)
        tot = np.add.reduceat(cnt, starts)
        return pa.table({"node": pa.array(node[starts]),
                         "pred_label": pa.array(vote[starts]),
                         "n_votes": pa.array(cnt[starts]),
                         "n_neighbors": pa.array(tot)})

    return (ds.map_batches(_edges, batch_format="pyarrow")
            .map_batches(_part_e, batch_format="pyarrow")
            .repartition(4).groupby("__part")
            .map_groups(_votes, batch_format="pyarrow")
            .map_batches(_add_part, batch_format="pyarrow")
            .repartition(4).groupby("__part")
            .map_groups(_majority, batch_format="pyarrow"))


LABEL_PROP_SQL = """
WITH nn AS (SELECT count(*) AS c FROM documents),
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
    SELECT u AS node, v AS nb FROM und
    UNION ALL
    SELECT v, u FROM und
),
votes AS (
    SELECT ed.node, CAST(l.label AS BIGINT) AS vote,
           CAST(count(*) AS BIGINT) AS cnt
    FROM ed JOIN embeddings l ON l.vec_id = ed.nb
    GROUP BY 1, 2
),
tot AS (SELECT node, CAST(sum(cnt) AS BIGINT) AS n_neighbors
        FROM votes GROUP BY 1)
SELECT v.node, v.vote AS pred_label, v.cnt AS n_votes,
       tot.n_neighbors
FROM (
    SELECT votes.*, row_number() OVER (PARTITION BY node
                                       ORDER BY cnt DESC, vote) AS rk
    FROM votes
) v JOIN tot ON tot.node = v.node
WHERE v.rk = 1
"""


def q_burstiness_events(sf_dir: str):
    """Burstiness / Fano factor per series (the overdispersion index:
    variance-to-mean of 1h event COUNTS over observed buckets; > 1 =
    bursty, 1 = Poisson-like): kept as the exact gcd-reduced rational
    ``(n·Σc² − (Σc)²) / (n·Σc)``. Map-side (series, bucket) count
    partials, one hashpart grouped sum, tiny per-series reduction."""
    from ..arrow_utils import stable_part_codes

    H = 3_600_000_000
    ev = _events_series(sf_dir, cols=("event_id", "event_type", "ts"))

    def _counts(b: pa.Table) -> pa.Table:
        bkt = (b["ts_us"].to_numpy(zero_copy_only=False).astype(
            np.int64) // H)
        t = pa.table({"series_id": b["event_type"],
                      "bucket": pa.array(bkt),
                      "one": pa.array(np.ones(b.num_rows,
                                              dtype=np.int64))})
        g = t.group_by(["series_id", "bucket"]).aggregate(
            [("one", "sum")])
        return g.rename_columns(["series_id", "bucket", "c"])

    mod = 2 * 64

    def _add_part(b: pa.Table) -> pa.Table:
        h = stable_part_codes(b["series_id"], None)
        return b.append_column(
            "__part", pa.array((h % np.uint64(mod)).astype(np.int32)))

    def _fano(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        s_type = t["series_id"].type
        cols = ("n_buckets", "n_events", "fano_num", "fano_den")
        if t.num_rows == 0:
            return pa.table({"series_id": pa.array([], s_type),
                             **{c: pa.array([], pa.int64())
                                for c in cols}})
        s = t.group_by(["series_id", "bucket"]).aggregate([("c", "sum")])
        sid = s["series_id"]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = sid.dictionary_encode().indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        c = s["c_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(codes, kind="stable")
        codes, c = codes[order], c[order]
        sidx = sid.take(pa.array(order))
        heads = np.ones(len(codes), dtype=bool)
        heads[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(heads)
        n = np.diff(np.append(starts, len(codes)))
        sc = np.add.reduceat(c, starts)
        sc2 = np.add.reduceat(c * c, starts)
        num = n * sc2 - sc * sc
        den = n * sc
        g_ = np.gcd(num, den)
        g_ = np.where(g_ == 0, 1, g_)
        return pa.table({
            "series_id": sidx.take(pa.array(starts)),
            "n_buckets": pa.array(n),
            "n_events": pa.array(sc),
            "fano_num": pa.array(num // g_),
            "fano_den": pa.array(den // g_)})

    return (ev.map_batches(_counts, batch_format="pyarrow")
            .map_batches(_add_part, batch_format="pyarrow")
            .repartition(2).groupby("__part")
            .map_groups(_fano, batch_format="pyarrow"))


BURSTINESS_SQL = """
WITH c AS (
    SELECT event_type AS series_id, epoch_us(ts) // 3600000000 AS b,
           CAST(count(*) AS BIGINT) AS c
    FROM events GROUP BY 1, 2
),
a AS (
    SELECT series_id, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(c) AS BIGINT) AS sc,
           CAST(sum(c * c) AS BIGINT) AS sc2
    FROM c GROUP BY 1
)
SELECT series_id, n AS n_buckets, sc AS n_events,
       CAST((n * sc2 - sc * sc)
            // greatest(gcd(n * sc2 - sc * sc, n * sc), 1) AS BIGINT)
           AS fano_num,
       CAST((n * sc)
            // greatest(gcd(n * sc2 - sc * sc, n * sc), 1) AS BIGINT)
           AS fano_den
FROM a
"""


def q_sweepline_audit_events(sf_dir: str):
    """Sweep-line / Little's-law style conservation audit: each series'
    30-minute activity islands (the ``interval_union_events`` merge)
    are measured TWO independent ways — (a) per-series island-length
    sums, (b) the global sweep-line integral ``∫ concurrency(t) dt``
    over all series' island endpoints — and by Fubini the totals must
    agree EXACTLY (int64 microseconds). Emits both sides, the equality
    flag and the peak concurrency; the kind of cross-computation
    invariant a 100 TB pipeline runs to catch partition-merge bugs.
    Islands reduce per series (one hash shuffle); endpoints are
    islands-count-bounded (<< events), so the sweep is a tiny ordered
    pass."""
    from ..arrow_utils import stable_part_codes

    W = 1_800_000_000
    ev = _events_series(sf_dir, cols=("event_id", "event_type", "ts"))
    mod = 2 * 64

    def _add_part(b: pa.Table) -> pa.Table:
        h = stable_part_codes(b["event_type"], None)
        return b.append_column(
            "__part", pa.array((h % np.uint64(mod)).astype(np.int32)))

    def _islands(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        if t.num_rows == 0:
            return pa.table({"lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64())})
        t = t.take(pc.sort_indices(t, sort_keys=[
            ("event_type", "ascending"), ("ts_us", "ascending")]))
        sid = t["event_type"]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = sid.dictionary_encode().indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        ts = t["ts_us"].to_numpy(zero_copy_only=False).astype(np.int64)
        heads = np.ones(len(codes), dtype=bool)
        heads[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(heads)
        ends_seg = np.r_[starts[1:], len(codes)]
        los, his = [], []
        for f, l in zip(starts, ends_seg):
            s_ = ts[f:l]
            e_ = s_ + W
            cm = np.maximum.accumulate(e_)
            new = np.ones(l - f, dtype=bool)
            new[1:] = s_[1:] > cm[:-1]
            isl = np.flatnonzero(new)
            isl_end = np.r_[isl[1:], l - f]
            los.append(s_[isl])
            his.append(cm[isl_end - 1])
        return pa.table({"lo": pa.array(np.concatenate(los)),
                         "hi": pa.array(np.concatenate(his))})

    rows = (ev.map_batches(_add_part, batch_format="pyarrow")
            .repartition(2).groupby("__part")
            .map_groups(_islands, batch_format="pyarrow")).take_all()
    lo = np.array([r["lo"] for r in rows], dtype=np.int64)
    hi = np.array([r["hi"] for r in rows], dtype=np.int64)
    covered = int((hi - lo).sum())

    pts = np.concatenate([lo, hi])
    delta = np.concatenate([np.ones(len(lo), np.int64),
                            -np.ones(len(hi), np.int64)])
    order = np.lexsort((-delta, pts))  # opens before closes at ties
    pts, delta = pts[order], delta[order]
    level = np.cumsum(delta)
    dt = np.diff(pts)
    integral = int((level[:-1] * dt).sum())
    return pa.table({
        "covered_sum_us": pa.array([covered], pa.int64()),
        "sweep_integral_us": pa.array([integral], pa.int64()),
        "conserved": pa.array([int(covered == integral)], pa.int64()),
        "max_concurrency": pa.array([int(level.max())], pa.int64()),
        "n_islands": pa.array([len(lo)], pa.int64())})


SWEEPLINE_SQL = """
WITH e AS (
    SELECT event_type AS series_id, epoch_us(ts) AS s,
           epoch_us(ts) + 1800000000 AS f
    FROM events
),
m AS (
    SELECT series_id, s, f,
           max(f) OVER (PARTITION BY series_id ORDER BY s, f
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING) AS prev_max
    FROM e
),
g AS (
    SELECT series_id, s, f,
           sum(CASE WHEN prev_max IS NULL OR s > prev_max
                    THEN 1 ELSE 0 END)
               OVER (PARTITION BY series_id ORDER BY s, f
                     ROWS UNBOUNDED PRECEDING) AS island
    FROM m
),
isl AS (
    SELECT series_id, island, min(s) AS lo, max(f) AS hi
    FROM g GROUP BY 1, 2
),
pts AS (
    SELECT lo AS t, 1 AS d FROM isl
    UNION ALL
    SELECT hi, -1 FROM isl
),
sw AS (
    SELECT t, d,
           sum(d) OVER (ORDER BY t, d DESC
                        ROWS UNBOUNDED PRECEDING) AS level,
           lead(t) OVER (ORDER BY t, d DESC) AS nxt
    FROM pts
)
SELECT
    (SELECT CAST(sum(hi - lo) AS BIGINT) FROM isl) AS covered_sum_us,
    CAST(sum(level * (nxt - t)) AS BIGINT) AS sweep_integral_us,
    CAST(CASE WHEN (SELECT sum(hi - lo) FROM isl)
               = sum(level * (nxt - t)) THEN 1 ELSE 0 END AS BIGINT)
        AS conserved,
    CAST(max(level) AS BIGINT) AS max_concurrency,
    (SELECT CAST(count(*) AS BIGINT) FROM isl) AS n_islands
FROM sw WHERE nxt IS NOT NULL
"""


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
    from ..functions.gif import encode_gif
    from ..stages.multimodal import DecodeImage

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
    from ..stages.abtest import chi2_contingency

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
    from ..stages.rollup import rollup
    from ..stages.smoothing import holt_winters_fixed_point

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
        from ..arrow_utils import rename_agg

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
    from ..stages.rollup import rollup

    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    rolled = rollup(ev.map_batches(_series, batch_format="pyarrow"), W1H)

    from ..arrow_utils import stable_part_codes

    mod = 2 * 64

    def _add_part(b: pa.Table) -> pa.Table:
        h = stable_part_codes(b["series_id"], None)
        return b.append_column(
            "__part", pa.array((h % np.uint64(mod)).astype(np.int32)))

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
        codes = sid.dictionary_encode().indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
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

    from ..stages.dedup import distinct_pairs
    from ..stages.graph import grouped_sum_parts

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
    from ..stages.dedup import distinct_pairs
    from ..stages.graph import grouped_sum_parts

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
    from ..stages.graph import grouped_sum_parts

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
    from ..stages.graph import grouped_sum_parts
    from ..stages.joins import anti_join

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
    from ..arrow_utils import stable_part_codes
    from ..stages.dedup import distinct_pairs
    from ..stages.graph import grouped_sum_parts

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

    def _add_part(b: pa.Table) -> pa.Table:
        h = stable_part_codes(b["token"], None)
        return b.append_column(
            "__part", pa.array((h % np.uint64(mod)).astype(np.int32)))

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
        codes = tok.dictionary_encode().indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        src = t["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        from ..stages.dedup import _segmented_pairs

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

    from ..stages.graph import pagerank

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

    from ..stages.dedup import distinct_pairs
    from ..stages.graph import grouped_sum_parts

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
    from ..stages.correlate import autocorrelation
    from ..stages.rollup import rollup

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

    from ..stages.similarity import embedding_matrix

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
    from ..stages.graph import grouped_sum_parts

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
    from ..stages.graph import grouped_sum_parts

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
    from ..stages.downsample import downsample_table
    from ..stages.rollup import rollup

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
    from ..stages.strsim import ed2_pairs

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
    from ..arrow_utils import rename_agg

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
    from ..stages.packing import cdc_chunk_batch

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
    from ..stages.packing import cdc_chunk_batch

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
    from ..stages.dedup import distinct_pairs
    from ..stages.packing import cdc_chunk_batch

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
    from ..stages.correlate import kendall_pairs
    from ..stages.rollup import rollup

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
    from ..stages.rollup import rollup
    from ..stages.sax import ordinal_patterns

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
    the deterministic doc link graph (``stages/graph.py:hits``): per
    half-round ONE hash join (state onto edges) + ONE hashpart grouped
    sum + a scalar max read — the join-based distributed form, no state
    broadcast. Bit-exact vs the unrolled SQL replay (int64 floor division
    throughout)."""
    import numpy as np
    import pyarrow.parquet as _pq

    from ..stages.graph import hits

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
                num_partitions=4, fanin=4)


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

    from ..stages.graph import reciprocity

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

    from ..stages.graph import degree_assortativity

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
    from ..stages.sketches import kmv_distinct

    pages = read_pages(sf_dir, snapshots=SNAPSHOTS,
                       columns=["url", "warc_ts"])

    def _dom(b: pa.Table) -> pa.Table:
        url = b["url"]
        if isinstance(url, pa.ChunkedArray):
            url = url.combine_chunks()
        from ..stages.series import _DOMAIN_PATTERN

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
    from ..stages.sketches import log2hist_quantiles

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


QUERIES = {
    "pages_extract": q_pages_extract,
    "page_rollup_15m": q_page_rollup_15m,
    "rollup_cascade_1h": q_rollup_cascade_1h,
    "rollup_cascade_1d": q_rollup_cascade_1d,
    "crawl_rate_1h": q_crawl_rate_1h,
    "gapfill_15m": q_gapfill_15m,
    "retention_trim_15m": q_retention_trim_15m,
    "backfill_15m": q_backfill_15m,
    "page_rollup_multi_15m": q_page_rollup_multi_15m,
    "topk_buckets_per_domain": q_topk_buckets_per_domain,
    "distinct_urls_per_domain": q_distinct_urls_per_domain,
    "compress_roundtrip_15m": q_compress_roundtrip_15m,
    "compaction_roundtrip_15m": q_compaction_roundtrip_15m,
    "topk_domains": q_topk_domains,
    "window_events_1h": q_window_events_1h,
    "sliding_events_1h_15m": q_sliding_events_1h_15m,
    "sessions_users": q_sessions_users,
    "rolling_stats_events": q_rolling_stats_events,
    "anomaly_events": q_anomaly_events,
    "everynth_events": q_everynth_events,
    "minmax_events": q_minmax_events,
    "lod_pyramid_events": q_lod_pyramid_events,
    "m4_events": q_m4_events,
    "lttb_events": q_lttb_events,
    "lttb_events_gapped_midpoint": q_lttb_events_gapped_midpoint,
    "minmaxlttb_events": q_minmaxlttb_events,
    "nanminmaxlttb_events": q_nanminmaxlttb_events,
    "nanminmax_events": q_nanminmax_events,
    "nanm4_events": q_nanm4_events,
    "minmax_events_withx": q_minmax_events_withx,
    "minmax_events_dt64bool": q_minmax_events_dt64bool,
    "minmaxlttb_bigseries": q_minmaxlttb_bigseries,
    "minmax_bigseries": q_minmax_bigseries,
    "m4_bigseries": q_m4_bigseries,
    "asof_enrich_events": q_asof_enrich_events,
    "resample_linear_15m": q_resample_linear_15m,
    "corr_pairs_15m": q_corr_pairs_15m,
    "threshold_crossings_events": q_threshold_crossings_events,
    "interarrival_quantiles_events": q_interarrival_quantiles_events,
    "twa_events_1h": q_twa_events_1h,
    "exact_quantiles_15m": q_exact_quantiles_15m,
    "seasonal_hod_events": q_seasonal_hod_events,
    "ewma_15m": q_ewma_15m,
    "hist_quantiles_1h": q_hist_quantiles_1h,
    "counter_rate_1h": q_counter_rate_1h,
    "orders_by_nation_broadcast": q_orders_by_nation_broadcast,
    "lineitem_pricing_summary": q_lineitem_pricing_summary,
    "session_label_events": q_session_label_events,
    "minmax_events_partitioned": q_minmax_events_partitioned,
    "dedup_exact_pages": q_dedup_exact_pages,
    "token_count_docs": q_token_count_docs,
    "span_dedup_docs": q_span_dedup_docs,
    "repetition_docs": q_repetition_docs,
    "near_dup_pages": q_near_dup_pages,
    "near_dup_clusters": q_near_dup_clusters,
    "simhash_docs": q_simhash_docs,
    "simhash_near_dup_pages": q_simhash_near_dup_pages,
    "ngram_jaccard_docs": q_ngram_jaccard_docs,
    "contamination_docs": q_contamination_docs,
    "vocab_docs": q_vocab_docs,
    "link_graph_docs": q_link_graph_docs,
    "pagerank_docs": q_pagerank_docs,
    "cusum_events": q_cusum_events,
    "postings_docs": q_postings_docs,
    "lag_corr_15m": q_lag_corr_15m,
    "normalize_docs": q_normalize_docs,
    "mad_outliers_15m": q_mad_outliers_15m,
    "canonical_urls_docs": q_canonical_urls_docs,
    "snapshot_diff_docs": q_snapshot_diff_docs,
    "holt_15m": q_holt_15m,
    "theil_sen_15m": q_theil_sen_15m,
    "shipping_priority": q_shipping_priority,
    "funnel_users": q_funnel_users,
    "cohort_retention_users": q_cohort_retention_users,
    "lang_source_pivot": q_lang_source_pivot,
    "burn_rate_alerts": q_burn_rate_alerts,
    "cooccurrence_docs": q_cooccurrence_docs,
    "bpe_merges_docs": q_bpe_merges_docs,
    "percentile_rank_15m": q_percentile_rank_15m,
    "bpe_tokenize_docs": q_bpe_tokenize_docs,
    "domain_concentration_docs": q_domain_concentration_docs,
    "winsorize_15m": q_winsorize_15m,
    "rolling_median_15m": q_rolling_median_15m,
    "upsert_latest_events": q_upsert_latest_events,
    "cms_heavy_hitters_docs": q_cms_heavy_hitters_docs,
    "zorder_zone_maps_events": q_zorder_zone_maps_events,
    "acf_15m": q_acf_15m,
    "cube_docs": q_cube_docs,
    "table_checksum_events": q_table_checksum_events,
    "event_transitions": q_event_transitions,
    "bloom_semi_join": q_bloom_semi_join,
    "triangle_counts_docs": q_triangle_counts_docs,
    "spearman_pairs_15m": q_spearman_pairs_15m,
    "profile_events": q_profile_events,
    "state_changes_events": q_state_changes_events,
    "kmeans_embeddings": q_kmeans_embeddings,
    "gap_profile_events": q_gap_profile_events,
    "purchase_impact_events": q_purchase_impact_events,
    "activity_coverage_events": q_activity_coverage_events,
    "skyline_orders": q_skyline_orders,
    "streaks_events": q_streaks_events,
    "calendar_rollup_month": q_calendar_rollup_month,
    "anti_join_lineitems": q_anti_join_lineitems,
    "group_samples_docs": q_group_samples_docs,
    "ols_slope_1h": q_ols_slope_1h,
    "weighted_median_lineitem": q_weighted_median_lineitem,
    "sax_events": q_sax_events,
    "gini_orders": q_gini_orders,
    "benford_orders": q_benford_orders,
    "kwic_docs": q_kwic_docs,
    "mann_whitney_events": q_mann_whitney_events,
    "sliding_wau_events": q_sliding_wau_events,
    "survivorship_users": q_survivorship_users,
    "embedding_covariance": q_embedding_covariance,
    "hybrid_rrf_docs": q_hybrid_rrf_docs,
    "centroid_classify_embeddings": q_centroid_classify_embeddings,
    "semantic_prune_embeddings": q_semantic_prune_embeddings,
    "mutual_nn_embeddings": q_mutual_nn_embeddings,
    "knn_outliers_embeddings": q_knn_outliers_embeddings,
    "seasonal_decompose_1h": q_seasonal_decompose_1h,
    "hysteresis_alerts_events": q_hysteresis_alerts_events,
    "coverage_sample_docs": q_coverage_sample_docs,
    "term_drift_docs": q_term_drift_docs,
    "session_paths_events": q_session_paths_events,
    "heatmap_tiles_events": q_heatmap_tiles_events,
    "classify_confusion_embeddings": q_classify_confusion_embeddings,
    "local_supplier_volume": q_local_supplier_volume,
    "promo_share_month": q_promo_share_month,
    "cluster_ari_embeddings": q_cluster_ari_embeddings,
    "lttb_fidelity_events": q_lttb_fidelity_events,
    "assoc_rules_events": q_assoc_rules_events,
    "haar_energy_15m": q_haar_energy_15m,
    "attribution_events": q_attribution_events,
    "amoc_changepoint_15m": q_amoc_changepoint_15m,
    "boolean_search_docs": q_boolean_search_docs,
    "top_movers_events": q_top_movers_events,
    "rfm_segments_users": q_rfm_segments_users,
    "bigram_familiarity_docs": q_bigram_familiarity_docs,
    "json_props_events": q_json_props_events,
    "conversion_latency_users": q_conversion_latency_users,
    "ks_test_events": q_ks_test_events,
    "markov_baseline_events": q_markov_baseline_events,
    "gapfill_linear_15m": q_gapfill_linear_15m,
    "welch_t_events": q_welch_t_events,
    "fleet_bands_1h": q_fleet_bands_1h,
    "tier_consistency_events": q_tier_consistency_events,
    "ed1_pairs_docs": q_ed1_pairs_docs,
    "graph_degree_stats_docs": q_graph_degree_stats_docs,
    "sax_motifs_events": q_sax_motifs_events,
    "ohlc_15m": q_ohlc_15m,
    "ltv_curve_users": q_ltv_curve_users,
    "clamped_balance_events": q_clamped_balance_events,
    "token_bucket_events": q_token_bucket_events,
    "rdp_simplify_15m": q_rdp_simplify_15m,
    "vw_simplify_15m": q_vw_simplify_15m,
    "deadband_events": q_deadband_events,
    "incident_coverage_events": q_incident_coverage_events,
    "backtest_naive_1h": q_backtest_naive_1h,
    "rate_limit_users": q_rate_limit_users,
    "readability_docs": q_readability_docs,
    "isotonic_fit_1h": q_isotonic_fit_1h,
    "mmr_select_embeddings": q_mmr_select_embeddings,
    "kalman_1h": q_kalman_1h,
    "expectations_events": q_expectations_events,
    "huffman_code_docs": q_huffman_code_docs,
    "dtw_pairs_1d": q_dtw_pairs_1d,
    "dbscan_embeddings": q_dbscan_embeddings,
    "interval_union_events": q_interval_union_events,
    "experiment_readout_users": q_experiment_readout_users,
    "kcore_docs": q_kcore_docs,
    "weighted_sample_docs": q_weighted_sample_docs,
    "bfs_hops_docs": q_bfs_hops_docs,
    "churn_features_users": q_churn_features_users,
    "ips_policy_eval_events": q_ips_policy_eval_events,
    "returned_revenue_customers": q_returned_revenue_customers,
    "quantile_normalize_1d": q_quantile_normalize_1d,
    "pmi_pairs_docs": q_pmi_pairs_docs,
    "class_terms_docs": q_class_terms_docs,
    "langid_confusion_docs": q_langid_confusion_docs,
    "busday_rollup_orders": q_busday_rollup_orders,
    "clustering_coeff_docs": q_clustering_coeff_docs,
    "lateness_accounting_events": q_lateness_accounting_events,
    "decision_stump_users": q_decision_stump_users,
    "mann_kendall_15m": q_mann_kendall_15m,
    "page_hinkley_15m": q_page_hinkley_15m,
    "covisit_users": q_covisit_users,
    "boxplot_15m": q_boxplot_15m,
    "median_of_means_15m": q_median_of_means_15m,
    "discord_1h": q_discord_1h,
    "motif_1h": q_motif_1h,
    "label_propagation_docs": q_label_propagation_docs,
    "burstiness_events": q_burstiness_events,
    "sweepline_audit_events": q_sweepline_audit_events,
    "training_order_docs": q_training_order_docs,
    "url_blocklist_docs": q_url_blocklist_docs,
    "embedding_near_dups_exact": q_embedding_near_dups_exact,
    "domain_cap_docs": q_domain_cap_docs,
    "mixture_order_docs": q_mixture_order_docs,
    "incremental_dedup_docs": q_incremental_dedup_docs,
    "minhash_docs": q_minhash_docs,
    "lang_id_docs": q_lang_id_docs,
    "quality_docs": q_quality_docs,
    "token_stats_docs": q_token_stats_docs,
    "fingerprint_docs": q_fingerprint_docs,
    "pii_scrub_docs": q_pii_scrub_docs,
    "tfidf_terms": q_tfidf_terms,
    "gzip_text_docs": q_gzip_text_docs,
    "warc_extract_docs": q_warc_extract_docs,
    "chunk_docs": q_chunk_docs,
    "pack_sequences_docs": q_pack_sequences_docs,
    "sample_docs": q_sample_docs,
    "sample_stratified_docs": q_sample_stratified_docs,
    "train_split_docs": q_train_split_docs,
    "token_count_bpeish": q_token_count_bpeish,
    "embedding_near_dups": q_embedding_near_dups,
    "knn_embeddings": q_knn_embeddings,
    "knn_ivf_embeddings": q_knn_ivf_embeddings,
    "multimodal_frame_sample": q_multimodal_frame_sample,
    "multimodal_wav_decode": q_multimodal_wav_decode,
    "multimodal_mulaw_decode": q_multimodal_mulaw_decode,
    "multimodal_png_decode": q_multimodal_png_decode,
    "multimodal_jpeg_decode": q_multimodal_jpeg_decode,
    "corpus_curation": q_corpus_curation,
    "chunkstore_downsample": q_chunkstore_downsample,
}

ORACLE_SQL = {
    "pages_extract": f"""
        WITH {PAGES_CTE}
        SELECT url, ts_us, text, lang FROM pages
    """,
    "page_rollup_15m": _ROLLUP_SQL.format(cte=PAGES_CTE, w=W15M),
    "rollup_cascade_1h": _ROLLUP_SQL.format(cte=PAGES_CTE, w=W1H),
    "rollup_cascade_1d": _ROLLUP_SQL.format(cte=PAGES_CTE, w=W1D),
    "crawl_rate_1h": f"""
        WITH {PAGES_CTE}
        SELECT series_id, (ts_us // {W1H}) * {W1H} AS bucket, count(*) AS n
        FROM pages GROUP BY 1, 2
    """,
    "topk_domains": f"""
        WITH {PAGES_CTE}
        SELECT series_id, CAST(sum(y) AS BIGINT) AS sum_chars
        FROM pages GROUP BY 1
        ORDER BY sum_chars DESC, series_id LIMIT 5
    """,
    "backfill_15m": _ROLLUP_SQL.format(cte=PAGES_CTE, w=W15M),
    "page_rollup_multi_15m": f"""
        WITH {PAGES_CTE}
        SELECT series_id,
               (ts_us // {W15M}) * {W15M} AS bucket,
               min(y) AS min_len, max(y) AS max_len,
               CAST(sum(y) AS BIGINT) AS sum_len,
               min(length(text) - length(replace(text, ' ', '')) + 1) AS min_tok,
               max(length(text) - length(replace(text, ' ', '')) + 1) AS max_tok,
               CAST(sum(length(text) - length(replace(text, ' ', '')) + 1)
                    AS BIGINT) AS sum_tok,
               count(*) AS n
        FROM pages GROUP BY 1, 2
    """,
    "topk_buckets_per_domain": f"""
        WITH {PAGES_CTE},
        r AS (
            SELECT series_id, (ts_us // {W15M}) * {W15M} AS bucket,
                   count(*) AS n
            FROM pages GROUP BY 1, 2
        ),
        ranked AS (
            SELECT *, row_number() OVER (PARTITION BY series_id
                                         ORDER BY n DESC, bucket) AS rk
            FROM r
        )
        SELECT series_id, bucket, n FROM ranked WHERE rk <= 3
    """,
    "retention_trim_15m": f"""
        WITH {PAGES_CTE},
        r AS (
            SELECT series_id,
                   (ts_us // {W15M}) * {W15M} AS bucket,
                   min(y) AS min_y, max(y) AS max_y,
                   CAST(sum(y) AS BIGINT) AS sum_y, count(*) AS n,
                   CAST(sum(y) AS DOUBLE) / count(*) AS mean_y
            FROM pages GROUP BY 1, 2
        )
        SELECT * FROM r
        WHERE bucket >= (SELECT max(bucket) FROM r) + {W15M} - {3 * W1H + W15M}
    """,
    "gapfill_15m": f"""
        WITH {PAGES_CTE},
        r AS (
            SELECT series_id, (ts_us // {W15M}) * {W15M} AS bucket, count(*) AS n
            FROM pages GROUP BY 1, 2
        ),
        b AS (SELECT series_id, min(bucket) mn, max(bucket) mx FROM r GROUP BY 1),
        g AS (SELECT series_id, unnest(range(mn, mx + 1, {W15M})) AS bucket FROM b)
        SELECT g.series_id, g.bucket,
               COALESCE(r.n, 0) AS n,
               r.series_id IS NULL AS is_gap
        FROM g LEFT JOIN r ON g.series_id = r.series_id AND g.bucket = r.bucket
    """,
    "compress_roundtrip_15m": _ROLLUP_SQL.format(cte=PAGES_CTE, w=W15M),
    "compaction_roundtrip_15m": _ROLLUP_SQL.format(cte=PAGES_CTE, w=W15M),
    # exact side hash-verified; TRUE pins the sketch's <=6% accuracy band
    "distinct_urls_per_domain": f"""
        WITH {PAGES_CTE}
        SELECT series_id AS domain,
               count(DISTINCT url) AS exact_distinct,
               TRUE AS est_in_band
        FROM pages GROUP BY 1
    """,
    "window_events_1h": f"""
        SELECT event_type,
               (epoch_us(ts) // {W1H}) * {W1H} AS bucket,
               min(value) AS min_v,
               max(value) AS max_v,
               count(*) AS n,
               CAST(round(sum(value) * 100, 0) AS BIGINT) AS sum_cents
        FROM events GROUP BY 1, 2
    """,
    "sliding_events_1h_15m": f"""
        SELECT event_type,
               (epoch_us(ts) // {W15M}) * {W15M} - j.j * {W15M} AS bucket,
               min(value) AS min_v,
               max(value) AS max_v,
               count(*) AS n,
               CAST(round(sum(value) * 100, 0) AS BIGINT) AS sum_cents
        FROM events, generate_series(0, 3) j(j)
        GROUP BY 1, 2
    """,
    "sessions_users": f"""
        WITH o AS (
            SELECT user_id, epoch_us(ts) AS t, event_id FROM events
        ),
        s AS MATERIALIZED (
            SELECT user_id, t, event_id,
                   CASE WHEN lag(t) OVER w IS NULL
                             OR t - lag(t) OVER w > {30 * 60 * US}
                        THEN 1 ELSE 0 END AS brk
            FROM o
            WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
        ),
        t2 AS (
            SELECT user_id, t,
                   SUM(brk) OVER (PARTITION BY user_id ORDER BY t, event_id
                                  ROWS UNBOUNDED PRECEDING) AS sess
            FROM s
        )
        SELECT user_id AS series_id,
               min(t) AS session_start,
               max(t) AS session_end,
               count(*) AS n_events
        FROM t2 GROUP BY user_id, sess
    """,
    "everynth_events": f"""
        WITH s AS MATERIALIZED (
            SELECT event_type, event_id,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY ts, event_id) - 1 AS rn,
                   count(*) OVER (PARTITION BY event_type) AS cnt
            FROM events
        )
        SELECT s.event_type, s.event_id
        FROM s JOIN generate_series(0, 49) k(k)
          ON s.rn = CAST(FLOOR(k.k * GREATEST(1.0, s.cnt / 50.0)) AS BIGINT)
        WHERE k.k * GREATEST(1.0, s.cnt / 50.0) < s.cnt - 0.1
    """,
    # MinMax/M4 bin-exact oracles: nb equal-ish index bins whose boundaries
    # replicate numpy's searchsorted-over-linspace (floor(i*((n-1)/nb))+1),
    # argmin/argmax with FIRST-occurrence tie-breaking via min(rn) over the
    # rows attaining the bin extreme.
    "lod_pyramid_events": _lod_pyramid_sql(),
    "minmax_events": """
        WITH s AS MATERIALIZED (
            SELECT event_type, event_id, value,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY ts, event_id) - 1 AS rn,
                   count(*) OVER (PARTITION BY event_type) AS cnt
            FROM events
        ),
        binned AS MATERIALIZED (
            SELECT s.*, b.i,
                   CASE WHEN b.i = 0 THEN 0
                        ELSE CAST(FLOOR(b.i * ((s.cnt - 1.0) / 10)) AS BIGINT) + 1
                   END AS lo,
                   CASE WHEN b.i = 9 THEN s.cnt
                        ELSE CAST(FLOOR((b.i + 1) * ((s.cnt - 1.0) / 10)) AS BIGINT) + 1
                   END AS hi
            FROM s JOIN generate_series(0, 9) b(i) ON TRUE
        ),
        inbin AS MATERIALIZED (SELECT * FROM binned WHERE rn >= lo AND rn < hi),
        ext AS MATERIALIZED (
            SELECT event_type, i,
                   min(value) AS mn, max(value) AS mx
            FROM inbin GROUP BY 1, 2
        ),
        sel AS (
            SELECT ib.event_type,
                   min(ib.rn) FILTER (WHERE ib.value = e.mn) AS rn_min,
                   min(ib.rn) FILTER (WHERE ib.value = e.mx) AS rn_max
            FROM inbin ib JOIN ext e ON ib.event_type = e.event_type AND ib.i = e.i
            GROUP BY ib.event_type, ib.i
        ),
        picked AS (
            SELECT event_type, rn_min AS rn FROM sel
            UNION
            SELECT event_type, rn_max AS rn FROM sel
        )
        SELECT s.event_type, s.event_id, s.value
        FROM s JOIN picked p ON s.event_type = p.event_type AND s.rn = p.rn
    """,
    "m4_events": """
        WITH s AS MATERIALIZED (
            SELECT event_type, event_id, value,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY ts, event_id) - 1 AS rn,
                   count(*) OVER (PARTITION BY event_type) AS cnt
            FROM events
        ),
        binned AS MATERIALIZED (
            SELECT s.*, b.i,
                   CASE WHEN b.i = 0 THEN 0
                        ELSE CAST(FLOOR(b.i * ((s.cnt - 1.0) / 5)) AS BIGINT) + 1
                   END AS lo,
                   CASE WHEN b.i = 4 THEN s.cnt
                        ELSE CAST(FLOOR((b.i + 1) * ((s.cnt - 1.0) / 5)) AS BIGINT) + 1
                   END AS hi
            FROM s JOIN generate_series(0, 4) b(i) ON TRUE
        ),
        inbin AS MATERIALIZED (SELECT * FROM binned WHERE rn >= lo AND rn < hi),
        ext AS MATERIALIZED (
            SELECT event_type, i, min(rn) AS first_rn, max(rn) AS last_rn,
                   min(value) AS mn, max(value) AS mx
            FROM inbin GROUP BY 1, 2
        ),
        sel AS (
            SELECT ib.event_type, ib.i,
                   any_value(e.first_rn) AS first_rn,
                   any_value(e.last_rn) AS last_rn,
                   min(ib.rn) FILTER (WHERE ib.value = e.mn) AS rn_min,
                   min(ib.rn) FILTER (WHERE ib.value = e.mx) AS rn_max
            FROM inbin ib JOIN ext e ON ib.event_type = e.event_type AND ib.i = e.i
            GROUP BY ib.event_type, ib.i
        ),
        picked AS (            -- duplicates retained (M4 keeps multiplicity)
            SELECT event_type, first_rn AS rn FROM sel
            UNION ALL SELECT event_type, rn_min FROM sel
            UNION ALL SELECT event_type, rn_max FROM sel
            UNION ALL SELECT event_type, last_rn FROM sel
        )
        SELECT s.event_type, s.event_id, s.value
        FROM s JOIN picked p ON s.event_type = p.event_type AND s.rn = p.rn
    """,
    # exact index-selection oracles for the sequential kernels: the LTTB
    # bucket loop replayed as a recursive CTE (same f64 operation order,
    # exact integer bucket sums, argmax == max(struct(area, -idx)))
    "lttb_events": _lttb_sql(50),
    "lttb_events_gapped_midpoint": _lttb_gapped_midpoint_sql(40),
    "minmaxlttb_events": _minmaxlttb_sql(20, 4, None, True),
    "nanminmaxlttb_events": _minmaxlttb_sql(20, 4, 37, False),
    "nanminmax_events": _nanminmax_sql(20, 37),
    "nanm4_events": _nanm4_sql(20, 37),
    "minmaxlttb_bigseries": _bigseries_sql(40, 4),
    "minmax_bigseries": _minmax_bigseries_sql(40),
    "m4_bigseries": _m4_bigseries_sql(40),
    "asof_enrich_events": ASOF_ENRICH_SQL,
    "resample_linear_15m": RESAMPLE_SQL,
    "corr_pairs_15m": CORR_PAIRS_SQL,
    "threshold_crossings_events": THRESHOLD_CROSSINGS_SQL,
    "interarrival_quantiles_events": INTERARRIVAL_SQL,
    "twa_events_1h": TWA_SQL,
    "exact_quantiles_15m": EXACT_QUANTILES_SQL,
    "seasonal_hod_events": SEASONAL_HOD_SQL,
    "ewma_15m": EWMA_SQL,
    "hist_quantiles_1h": HIST_QUANTILES_SQL,
    "counter_rate_1h": COUNTER_RATE_SQL,
    "orders_by_nation_broadcast": ORDERS_BY_NATION_SQL,
    "lineitem_pricing_summary": LINEITEM_SUMMARY_SQL,
    "session_label_events": SESSION_LABEL_SQL,
    # with-x + gaps: bins equidistant in x-value (searchsorted-over-linspace
    # replayed as "count of interior boundaries strictly below x"), empty
    # bins vanish, <=2-point bins pass through
    "minmax_events_withx": f"""
        WITH e AS (
            SELECT event_type, event_id, epoch_us(ts) AS x,
                   CAST(round(value * 100) AS BIGINT) AS cy
            FROM events
            WHERE (epoch_us(ts) // {86_400_000_000}) % 9 < 4
        ),
        s AS MATERIALIZED (
            SELECT *, row_number() OVER (PARTITION BY event_type
                                         ORDER BY x, event_id) - 1 AS rn,
                   min(x) OVER (PARTITION BY event_type) AS x0,
                   max(x) OVER (PARTITION BY event_type) AS xn
            FROM e
        ),
        assigned AS MATERIALIZED (
            SELECT s.event_type, s.event_id, s.x, s.cy, s.rn,
                   count(k.k) AS bin
            FROM s LEFT JOIN generate_series(1, 9) k(k)
              ON CAST(s.x0 AS DOUBLE)
                 + k.k * ((CAST(s.xn AS DOUBLE)
                           - CAST(s.x0 AS DOUBLE)) / 10.0)
                 < CAST(s.x AS DOUBLE)
            GROUP BY ALL
        ),
        ext AS MATERIALIZED (
            SELECT event_type, bin, count(*) AS nbin,
                   min(cy) AS mn, max(cy) AS mx
            FROM assigned GROUP BY 1, 2
        ),
        sel AS (
            SELECT a.event_type, a.bin,
                   min(a.rn) FILTER (WHERE a.cy = e.mn) AS rn_min,
                   min(a.rn) FILTER (WHERE a.cy = e.mx) AS rn_max
            FROM assigned a JOIN ext e ON a.event_type = e.event_type
                                      AND a.bin = e.bin
            WHERE e.nbin > 2
            GROUP BY 1, 2
        ),
        picked AS (
            SELECT event_type, rn_min AS rn FROM sel
            UNION SELECT event_type, rn_max FROM sel
            UNION SELECT a.event_type, a.rn
                  FROM assigned a JOIN ext e ON a.event_type = e.event_type
                                            AND a.bin = e.bin
                  WHERE e.nbin <= 2
        )
        SELECT a.event_type, a.event_id, a.cy AS cents
        FROM assigned a
        JOIN picked p ON a.event_type = p.event_type AND a.rn = p.rn
    """,
    # dtype-view row: x = raw timestamp (i64 view), y = bool (i8 view);
    # same equidistant x-value binning replay as minmax_events_withx but
    # over the FULL series and a boolean y (false < true ordering == the
    # kernel's i8 view ordering; first-occurrence ties both sides)
    "minmax_events_dt64bool": """
        WITH e AS (
            SELECT event_type, event_id, epoch_us(ts) AS x,
                   (value >= 0) AS flag
            FROM events
        ),
        s AS MATERIALIZED (
            SELECT *, row_number() OVER (PARTITION BY event_type
                                         ORDER BY x, event_id) - 1 AS rn,
                   min(x) OVER (PARTITION BY event_type) AS x0,
                   max(x) OVER (PARTITION BY event_type) AS xn
            FROM e
        ),
        assigned AS MATERIALIZED (
            SELECT s.event_type, s.event_id, s.x, s.flag, s.rn,
                   count(k.k) AS bin
            FROM s LEFT JOIN generate_series(1, 9) k(k)
              ON CAST(s.x0 AS DOUBLE)
                 + k.k * ((CAST(s.xn AS DOUBLE)
                           - CAST(s.x0 AS DOUBLE)) / 10.0)
                 < CAST(s.x AS DOUBLE)
            GROUP BY ALL
        ),
        ext AS MATERIALIZED (
            SELECT event_type, bin, count(*) AS nbin,
                   min(flag) AS mn, max(flag) AS mx
            FROM assigned GROUP BY 1, 2
        ),
        sel AS (
            SELECT a.event_type, a.bin,
                   min(a.rn) FILTER (WHERE a.flag = e.mn) AS rn_min,
                   min(a.rn) FILTER (WHERE a.flag = e.mx) AS rn_max
            FROM assigned a JOIN ext e ON a.event_type = e.event_type
                                      AND a.bin = e.bin
            WHERE e.nbin > 2
            GROUP BY 1, 2
        ),
        picked AS (
            SELECT event_type, rn_min AS rn FROM sel
            UNION SELECT event_type, rn_max FROM sel
            UNION SELECT a.event_type, a.rn
                  FROM assigned a JOIN ext e ON a.event_type = e.event_type
                                            AND a.bin = e.bin
                  WHERE e.nbin <= 2
        )
        SELECT a.event_type, a.event_id, a.flag
        FROM assigned a
        JOIN picked p ON a.event_type = p.event_type AND a.rn = p.rn
    """,
    "dedup_exact_pages": f"""
        WITH {PAGES_CTE}
        SELECT md5(text) AS text_md5,
               arg_min(url, ts_us) AS url,
               min(ts_us) AS first_ts_us
        FROM pages GROUP BY 1
    """,
    "span_dedup_docs": SPAN_DEDUP_SQL,
    "repetition_docs": REPETITION_SQL,
    "token_count_docs": """
        SELECT doc_id,
               length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens
        FROM documents
    """,
    "near_dup_pages": f"""
        WITH {PAGES_CTE},
        p AS (SELECT url || '#' || CAST(ts_us AS VARCHAR) AS pid, text FROM pages)
        SELECT x.pid AS a, y.pid AS b, 1.0 AS jaccard
        FROM p x JOIN p y ON x.text = y.text AND x.pid < y.pid
    """,
    # pair SQL + recursive transitive closure: component = min reachable pid
    "near_dup_clusters": f"""
        WITH RECURSIVE {PAGES_CTE},
        p AS MATERIALIZED (
            SELECT url || '#' || CAST(ts_us AS VARCHAR) AS pid, text
            FROM pages
        ),
        ed AS MATERIALIZED (
            SELECT x.pid AS src, y.pid AS dst
            FROM p x JOIN p y ON x.text = y.text AND x.pid <> y.pid
        ),
        reach(node, lbl) AS (
            SELECT DISTINCT src, src FROM ed
            UNION
            SELECT ed.dst, r.lbl FROM reach r JOIN ed ON ed.src = r.node
        )
        SELECT node, min(lbl) AS component FROM reach GROUP BY node
    """,
    # quality panel: exact ASCII re-statement of quality_batch —
    # n_tokens counts non-empty whitespace-split tokens, ratios divide by
    # max(1, denominator) in f64 (identical rounding: one division)
    "quality_docs": """
        WITH t AS (
            SELECT doc_id, text, length(text) AS n_chars,
                   list_filter(string_split_regex(text, '\\s+'),
                               x -> x <> '') AS toks
            FROM documents
        )
        SELECT doc_id, n_chars,
               len(toks) AS n_tokens,
               CAST(len(list_filter(toks, x -> x IN
                    ('the','and','of','to','a','in','is','it','that','for')))
                    AS DOUBLE) / greatest(1, len(toks)) AS stopword_ratio,
               CAST(length(regexp_replace(text, '[[:alnum:][:space:]]', '',
                    'g')) AS DOUBLE) / greatest(1, n_chars) AS punct_ratio,
               CAST(length(regexp_replace(text, '[^A-Z]', '', 'g'))
                    AS DOUBLE) / greatest(1, n_chars) AS upper_ratio
        FROM t
    """,
    "token_stats_docs": """
        SELECT doc_id,
               length(text) AS n_chars,
               length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens,
               CAST(length(replace(text, ' ', '')) AS DOUBLE)
                 / (length(text) - length(replace(text, ' ', '')) + 1)
                 AS mean_token_len
        FROM documents
    """,
    "lang_id_docs": _langid_sql(),
    # rollup -> (chunk store roundtrip is lossless, so the oracle skips it)
    # per-series with-x MinMax over (bucket, sum_y): x-value bins via
    # boundary counts, <=2-point passthrough, empty bins vanish, unique'd
    "chunkstore_downsample": f"""
        WITH {PAGES_CTE},
        r AS MATERIALIZED (
            SELECT series_id, (ts_us // {W15M}) * {W15M} AS x,
                   CAST(sum(y) AS BIGINT) AS cy
            FROM pages GROUP BY 1, 2
        ),
        s AS MATERIALIZED (
            SELECT *, row_number() OVER (PARTITION BY series_id
                                         ORDER BY x) - 1 AS rn,
                   min(x) OVER (PARTITION BY series_id) AS x0,
                   max(x) OVER (PARTITION BY series_id) AS xn
            FROM r
        ),
        assigned AS MATERIALIZED (
            SELECT s.series_id, s.x, s.cy, s.rn, count(k.k) AS bin
            FROM s LEFT JOIN generate_series(1, 3) k(k)
              ON CAST(s.x0 AS DOUBLE)
                 + k.k * ((CAST(s.xn AS DOUBLE)
                           - CAST(s.x0 AS DOUBLE)) / 4.0)
                 < CAST(s.x AS DOUBLE)
            GROUP BY ALL
        ),
        ext AS MATERIALIZED (
            SELECT series_id, bin, count(*) AS nbin,
                   min(cy) AS mn, max(cy) AS mx
            FROM assigned GROUP BY 1, 2
        ),
        sel AS (
            SELECT a.series_id, a.bin,
                   min(a.rn) FILTER (WHERE a.cy = e.mn) AS rn_min,
                   min(a.rn) FILTER (WHERE a.cy = e.mx) AS rn_max
            FROM assigned a JOIN ext e ON a.series_id = e.series_id
                                      AND a.bin = e.bin
            WHERE e.nbin > 2
            GROUP BY 1, 2
        ),
        picked AS (
            SELECT series_id, rn_min AS rn FROM sel
            UNION SELECT series_id, rn_max FROM sel
            UNION SELECT a.series_id, a.rn
                  FROM assigned a JOIN ext e ON a.series_id = e.series_id
                                            AND a.bin = e.bin
                  WHERE e.nbin <= 2
        )
        SELECT a.series_id, a.x AS bucket, a.cy AS sum_y
        FROM assigned a
        JOIN picked p ON a.series_id = p.series_id AND a.rn = p.rn
    """,
    "corpus_curation": _curation_sql(),
    "simhash_docs": _simhash_sql(),
    "simhash_near_dup_pages": _simhash_neardup_sql(3),
    # the quadratic definition the prefix-filter join must EQUAL, restated
    # as an inverted-index join (pairs at J >= 0.5 share >= 1 gram, so the
    # gram equi-join finds every qualifying pair; n_inter >= t*n_union is
    # the same double comparison the Ray verify runs)
    "ngram_jaccard_docs": """
        WITH g AS MATERIALIZED (
            SELECT doc_id, unnest(list_distinct(list_transform(
                       range(1, length(text) - 3),
                       i -> substring(text, i, 5)))) AS gram
            FROM documents
        ),
        sz AS MATERIALIZED (
            SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id
        ),
        inter AS MATERIALIZED (
            SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS n_inter
            FROM g x JOIN g y ON x.gram = y.gram AND x.doc_id < y.doc_id
            GROUP BY x.doc_id, y.doc_id
        )
        SELECT i.a, i.b, i.n_inter,
               sa.n + sb.n - i.n_inter AS n_union,
               CAST(i.n_inter AS DOUBLE) / (sa.n + sb.n - i.n_inter)
                    AS jaccard
        FROM inter i
        JOIN sz sa ON sa.doc_id = i.a
        JOIN sz sb ON sb.doc_id = i.b
        WHERE CAST(i.n_inter AS DOUBLE)
              >= 0.5 * (sa.n + sb.n - i.n_inter)
    """,
    "contamination_docs": _contamination_sql(),
    "vocab_docs": VOCAB_SQL,
    "link_graph_docs": LINK_GRAPH_SQL,
    "pagerank_docs": PAGERANK_SQL,
    "cusum_events": CUSUM_SQL,
    "postings_docs": POSTINGS_SQL,
    "lag_corr_15m": LAG_CORR_SQL,
    "normalize_docs": NORMALIZE_SQL,
    "mad_outliers_15m": MAD_OUTLIERS_SQL,
    "canonical_urls_docs": CANONICAL_URLS_SQL,
    "snapshot_diff_docs": SNAPSHOT_DIFF_SQL,
    "holt_15m": HOLT_SQL,
    "theil_sen_15m": THEIL_SEN_SQL,
    "shipping_priority": SHIPPING_PRIORITY_SQL,
    "funnel_users": FUNNEL_SQL,
    "cohort_retention_users": COHORT_SQL,
    "lang_source_pivot": LANG_PIVOT_SQL,
    "burn_rate_alerts": BURN_RATE_SQL,
    "cooccurrence_docs": COOCCURRENCE_SQL,
    "bpe_merges_docs": BPE_SQL,
    "percentile_rank_15m": PERCENTILE_RANK_SQL,
    "bpe_tokenize_docs": BPE_TOKENIZE_SQL,
    "domain_concentration_docs": DOMAIN_CONCENTRATION_SQL,
    "winsorize_15m": WINSORIZE_SQL,
    "rolling_median_15m": ROLLING_MEDIAN_SQL,
    "upsert_latest_events": UPSERT_LATEST_SQL,
    "cms_heavy_hitters_docs": CMS_SQL,
    "zorder_zone_maps_events": ZORDER_SQL,
    "acf_15m": ACF_SQL,
    "cube_docs": CUBE_SQL,
    "table_checksum_events": TABLE_CHECKSUM_SQL,
    "event_transitions": EVENT_TRANSITIONS_SQL,
    "bloom_semi_join": BLOOM_SQL,
    "triangle_counts_docs": TRIANGLES_SQL,
    "spearman_pairs_15m": SPEARMAN_SQL,
    "profile_events": PROFILE_SQL,
    "state_changes_events": STATE_CHANGES_SQL,
    "kmeans_embeddings": KMEANS_SQL,
    "gap_profile_events": GAP_PROFILE_SQL,
    "purchase_impact_events": PURCHASE_IMPACT_SQL,
    "activity_coverage_events": ACTIVITY_COVERAGE_SQL,
    "skyline_orders": SKYLINE_ORDERS_SQL,
    "streaks_events": STREAKS_SQL,
    "calendar_rollup_month": CALENDAR_ROLLUP_SQL,
    "anti_join_lineitems": ANTI_JOIN_SQL,
    "group_samples_docs": GROUP_SAMPLES_SQL,
    "ols_slope_1h": OLS_SLOPE_SQL,
    "weighted_median_lineitem": WEIGHTED_MEDIAN_SQL,
    "sax_events": SAX_SQL,
    "gini_orders": GINI_SQL,
    "benford_orders": BENFORD_SQL,
    "kwic_docs": KWIC_SQL,
    "mann_whitney_events": MANN_WHITNEY_SQL,
    "sliding_wau_events": SLIDING_WAU_SQL,
    "survivorship_users": SURVIVORSHIP_SQL,
    "embedding_covariance": EMBEDDING_COV_SQL,
    "hybrid_rrf_docs": HYBRID_RRF_SQL,
    "centroid_classify_embeddings": CENTROID_CLASSIFY_SQL,
    "mutual_nn_embeddings": MUTUAL_NN_SQL,
    "knn_outliers_embeddings": KNN_OUTLIERS_SQL,
    "seasonal_decompose_1h": SEASONAL_DECOMP_SQL,
    "hysteresis_alerts_events": HYSTERESIS_SQL,
    "coverage_sample_docs": COVERAGE_SQL,
    "term_drift_docs": TERM_DRIFT_SQL,
    "session_paths_events": SESSION_PATHS_SQL,
    "heatmap_tiles_events": HEATMAP_TILES_SQL,
    "local_supplier_volume": LOCAL_SUPPLIER_SQL,
    "promo_share_month": PROMO_SHARE_SQL,
    "lttb_fidelity_events": _lttb_fidelity_sql(50),
    "assoc_rules_events": ASSOC_RULES_SQL,
    "haar_energy_15m": HAAR_ENERGY_SQL,
    "attribution_events": ATTRIBUTION_SQL,
    "amoc_changepoint_15m": AMOC_SQL,
    "boolean_search_docs": BOOLEAN_SEARCH_SQL,
    "top_movers_events": TOP_MOVERS_SQL,
    "rfm_segments_users": RFM_SQL,
    "bigram_familiarity_docs": BIGRAM_FAM_SQL,
    "json_props_events": JSON_PROPS_SQL,
    "conversion_latency_users": CONVERSION_LATENCY_SQL,
    "ks_test_events": KS_TEST_SQL,
    "markov_baseline_events": MARKOV_BASELINE_SQL,
    "gapfill_linear_15m": GAPFILL_LINEAR_SQL,
    "welch_t_events": WELCH_T_SQL,
    "fleet_bands_1h": FLEET_BANDS_SQL,
    "tier_consistency_events": TIER_CONSISTENCY_SQL,
    "ed1_pairs_docs": ED1_PAIRS_SQL,
    "graph_degree_stats_docs": GRAPH_DEGREE_SQL,
    "ohlc_15m": OHLC_SQL,
    "ltv_curve_users": LTV_CURVE_SQL,
    "clamped_balance_events": CLAMPED_BALANCE_SQL,
    "token_bucket_events": TOKEN_BUCKET_SQL,
    "rdp_simplify_15m": RDP_SIMPLIFY_SQL,
    "vw_simplify_15m": VW_SIMPLIFY_SQL,
    "deadband_events": DEADBAND_SQL,
    "incident_coverage_events": INCIDENT_COVERAGE_SQL,
    "backtest_naive_1h": BACKTEST_NAIVE_SQL,
    "rate_limit_users": RATE_LIMIT_SQL,
    "readability_docs": READABILITY_SQL,
    "isotonic_fit_1h": ISOTONIC_SQL,
    "mmr_select_embeddings": MMR_SELECT_SQL,
    "kalman_1h": KALMAN_SQL,
    "expectations_events": EXPECTATIONS_SQL,
    "huffman_code_docs": HUFFMAN_SQL,
    "dtw_pairs_1d": DTW_PAIRS_SQL,
    "dbscan_embeddings": DBSCAN_SQL,
    "interval_union_events": INTERVAL_UNION_SQL,
    "experiment_readout_users": EXPERIMENT_SQL,
    "kcore_docs": KCORE_SQL,
    "weighted_sample_docs": WEIGHTED_SAMPLE_SQL,
    "bfs_hops_docs": BFS_HOPS_SQL,
    "churn_features_users": CHURN_FEATURES_SQL,
    "ips_policy_eval_events": IPS_POLICY_SQL,
    "returned_revenue_customers": RETURNED_REVENUE_SQL,
    "quantile_normalize_1d": QUANTILE_NORMALIZE_SQL,
    "pmi_pairs_docs": PMI_PAIRS_SQL,
    "class_terms_docs": CLASS_TERMS_SQL,
    "langid_confusion_docs": _langid_confusion_sql(),
    "busday_rollup_orders": BUSDAY_ROLLUP_SQL,
    "clustering_coeff_docs": CLUSTERING_COEFF_SQL,
    "lateness_accounting_events": LATENESS_SQL,
    "decision_stump_users": DECISION_STUMP_SQL,
    "mann_kendall_15m": MANN_KENDALL_SQL,
    "page_hinkley_15m": PAGE_HINKLEY_SQL,
    "covisit_users": COVISIT_SQL,
    "boxplot_15m": BOXPLOT_SQL,
    "median_of_means_15m": MEDIAN_OF_MEANS_SQL,
    "discord_1h": DISCORD_SQL,
    "motif_1h": MOTIF_SQL,
    "label_propagation_docs": LABEL_PROP_SQL,
    "burstiness_events": BURSTINESS_SQL,
    "sweepline_audit_events": SWEEPLINE_SQL,
    "sax_motifs_events": """
WITH base AS ({sax}),
m0 AS (
    SELECT series_id, sax,
           unnest(range(1, length(sax) - 1)) AS i
    FROM base
),
m AS (SELECT series_id, substr(sax, CAST(i AS INT), 3) AS g FROM m0),
c AS (SELECT series_id, g, count(*) AS c FROM m GROUP BY 1, 2),
r AS (
    SELECT series_id, g, c,
           row_number() OVER (PARTITION BY series_id
                              ORDER BY c DESC, g) AS rn,
           CAST(sum(c) OVER (PARTITION BY series_id) AS BIGINT)
               AS n_grams
    FROM c
)
SELECT series_id, g AS motif, CAST(c AS BIGINT) AS cnt, n_grams
FROM r WHERE rn = 1
""".format(sax=SAX_SQL),
    "cluster_ari_embeddings": CLUSTER_ARI_SQL.format(base=KMEANS_SQL),
    "classify_confusion_embeddings":
        CLASSIFY_CONFUSION_SQL.format(base=CENTROID_CLASSIFY_SQL),
    "semantic_prune_embeddings": """
SELECT vec_id, cluster, d2,
       row_number() OVER (PARTITION BY cluster
                          ORDER BY d2, vec_id) AS rk
FROM (""" + KMEANS_SQL + """) base
QUALIFY rk <= 32
""",
    "training_order_docs": TRAINING_ORDER_SQL,
    "url_blocklist_docs": URL_BLOCKLIST_SQL,
    "embedding_near_dups_exact": EMBEDDING_EXACT_SQL,
    "domain_cap_docs": DOMAIN_CAP_SQL,
    "mixture_order_docs": MIXTURE_ORDER_SQL,
    "incremental_dedup_docs": INCREMENTAL_DEDUP_SQL,
    "minhash_docs": _minhash_sql(),
    # the WAV payload carries the text's own bytes as PCM16 samples, so
    # the decoded waveform stats replay directly from the text (ASCII:
    # unicode(char) == byte)
    "multimodal_wav_decode": """
        SELECT doc_id AS media_id,
               length(text) AS n_samples,
               CAST(COALESCE(list_sum(list_transform(
                    range(1, length(text) + 1),
                    i -> unicode(substring(text, i, 1)))), 0) AS BIGINT)
                    AS sum_codes,
               CAST(CASE WHEN length(text) = 0 THEN -1
                    ELSE unicode(substring(text, 1, 1)) END AS BIGINT) AS first_code,
               CAST(CASE WHEN length(text) = 0 THEN -1
                    ELSE unicode(substring(text, length(text), 1))
               END AS BIGINT) AS last_code
        FROM documents
    """,
    # G.711 mu-law companding replayed arithmetically: sample = byte b,
    # 14-bit mag = b//4 + 33 (positive branch, no clip below 8159), segment
    # = (mag > 63), mantissa = (mag >> (seg+1)) & 15, decoded =
    # ((mant*8 + 132) << seg) - 132 — the exact encode+decode the Ray side
    # runs through the AU container and the vectorized G.711 codec
    "multimodal_mulaw_decode": """
        WITH codes AS MATERIALIZED (
            SELECT doc_id,
                   list_transform(range(1, length(text) + 1), i ->
                       unicode(substring(text, i, 1)) // 4 + 33) AS mags
            FROM documents
        ),
        dec AS MATERIALIZED (
            SELECT doc_id,
                   list_transform(mags, m ->
                       ((m // (CASE WHEN m > 63 THEN 4 ELSE 2 END)) % 16)
                       * 8 * (CASE WHEN m > 63 THEN 2 ELSE 1 END)
                       + 132 * (CASE WHEN m > 63 THEN 2 ELSE 1 END)
                       - 132) AS d
            FROM codes
        )
        SELECT doc_id AS media_id,
               len(d) AS n_samples,
               CAST(COALESCE(list_sum(d), 0) AS BIGINT) AS sum_codes,
               CAST(CASE WHEN len(d) = 0 THEN -1 ELSE d[1] END
                    AS BIGINT) AS first_code,
               CAST(CASE WHEN len(d) = 0 THEN -1 ELSE d[len(d)] END
                    AS BIGINT) AS last_code
        FROM dec
    """,
    # real MP4 demux replay: the frame plan (8 + n_chars%25 frames, frame i
    # = substr(text, 1+(i*11)%(n_chars-4), 1+(i+n_chars)%5)) and the
    # EveryNth float-step selection (same arithmetic as everynth_events)
    # are restated over text; the Ray side computes the SAME stats from
    # the bytes the ISO BMFF demuxer extracted out of mdat
    "multimodal_frame_sample": """
        WITH d AS MATERIALIZED (
            SELECT doc_id, text, n_chars, 8 + n_chars % 25 AS n_total
            FROM documents
        ),
        sel AS MATERIALIZED (
            SELECT d.doc_id, d.text, d.n_chars,
                   CAST(FLOOR(k.k * GREATEST(1.0, d.n_total / 16.0))
                        AS BIGINT) AS i
            FROM d JOIN generate_series(0, 15) k(k)
              ON k.k * GREATEST(1.0, d.n_total / 16.0) < d.n_total - 0.1
        )
        SELECT doc_id AS media_id,
               count(*) AS n_sel,
               40 * min(i) AS first_ts,
               40 * max(i) AS last_ts,
               CAST(sum(1 + (i + n_chars) % 5) AS BIGINT) AS sel_bytes,
               CAST(sum(unicode(substring(text,
                    1 + (i * 11) % (n_chars - 4), 1))) AS BIGINT) AS head_cs
        FROM sel GROUP BY doc_id
    """,
    "multimodal_png_decode": MULTIMODAL_PNG_SQL,
    "multimodal_jpeg_decode": MULTIMODAL_JPEG_SQL,
    # the GPT-2-style pretokenizer count; RE2 has no lookahead, so the
    # `\\s+(?!\\S)` (trailing-whitespace) branch is dropped — equivalent on
    # this corpus (no trailing whitespace), verified doc-by-doc
    "token_count_bpeish": r"""
        SELECT doc_id,
               len(regexp_extract_all(text,
                   '''s|''t|''re|''ve|''m|''ll|''d| ?[^\W\d_]+| ?\d+| ?[^\s\w]+|\s+'
               )) AS n_bpeish_tokens
        FROM documents
    """,
    # the defining byte-Horner recurrence, replayed exactly in HUGEINT
    # (ASCII corpus: unicode(char) == utf-8 byte)
    "fingerprint_docs": """
        SELECT doc_id,
               CAST(list_reduce(list_prepend(0::HUGEINT,
                    list_transform(range(1, length(text) + 1),
                                   i -> unicode(substring(text, i, 1))::HUGEINT)),
                    (h, c) -> (h * 1000003 + c) % 2305843009213693951)
                    AS BIGINT) AS fingerprint
        FROM documents
    """,
    # hash61 replayed in HUGEINT; thresholds are the SAME integers the Ray
    # filter compares against (rate_threshold), so the row sets are equal
    "rolling_stats_events": ROLLING_STATS_SQL,
    "anomaly_events": ANOMALY_SQL,
    "pii_scrub_docs": _build_pii_sql(),
    "tfidf_terms": TFIDF_SQL,
    # gzip roundtrip is lossless -> the oracle is the plain token-stats SQL
    "gzip_text_docs": """
        SELECT doc_id,
               length(text) AS n_chars,
               length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens,
               CAST(length(replace(text, ' ', '')) AS DOUBLE)
                 / (length(text) - length(replace(text, ' ', '')) + 1)
                 AS mean_token_len
        FROM documents
    """,
    "warc_extract_docs": WARC_EXTRACT_SQL,
    "chunk_docs": CHUNK_DOCS_SQL,
    "pack_sequences_docs": PACK_SEQUENCES_SQL,
    "sample_docs": _SAMPLE_SQL,
    "sample_stratified_docs": _STRAT_SQL,
    "train_split_docs": _SPLIT_SQL,
    "knn_embeddings": """
        WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
        SELECT vec_id,
               row_number() OVER (
                 ORDER BY list_cosine_similarity(embedding, (SELECT qe FROM q))
                          DESC, vec_id) AS rank
        FROM embeddings WHERE vec_id > 0
        ORDER BY rank LIMIT 10
    """,
}

# the partitioned path must agree with the per-series path bin-for-bin
ORACLE_SQL["minmax_events_partitioned"] = ORACLE_SQL["minmax_events"]
# exhaustive-probe IVF (nprobe == n_lists) provably equals brute force —
# same oracle; the approximate regime is pytest-pinned (see the query)
ORACLE_SQL["knn_ivf_embeddings"] = ORACLE_SQL["knn_embeddings"]

# round-4 additions
QUERIES["kendall_pairs_1h"] = q_kendall_pairs_1h
ORACLE_SQL["kendall_pairs_1h"] = KENDALL_SQL
QUERIES["ordinal_patterns_15m"] = q_ordinal_patterns_15m
ORACLE_SQL["ordinal_patterns_15m"] = ORDINAL_SQL
QUERIES["hits_docs"] = q_hits_docs
ORACLE_SQL["hits_docs"] = HITS_SQL
QUERIES["reciprocity_docs"] = q_reciprocity_docs
ORACLE_SQL["reciprocity_docs"] = RECIPROCITY_SQL
QUERIES["assortativity_docs"] = q_assortativity_docs
ORACLE_SQL["assortativity_docs"] = ASSORTATIVITY_SQL
QUERIES["kmv_distinct_domains"] = q_kmv_distinct_domains
ORACLE_SQL["kmv_distinct_domains"] = KMV_SQL
QUERIES["log2hist_events"] = q_log2hist_events
ORACLE_SQL["log2hist_events"] = LOG2HIST_SQL

QUERIES["multimodal_gif_decode"] = q_multimodal_gif_decode
ORACLE_SQL["multimodal_gif_decode"] = MULTIMODAL_GIF_SQL

QUERIES["chi2_lang_source"] = q_chi2_lang_source
ORACLE_SQL["chi2_lang_source"] = CHI2_SQL

QUERIES["holtwinters_1h"] = q_holtwinters_1h
ORACLE_SQL["holtwinters_1h"] = HOLTWINTERS_SQL

QUERIES["keyword_tag_docs"] = q_keyword_tag_docs
ORACLE_SQL["keyword_tag_docs"] = KEYWORD_TAG_SQL
QUERIES["backtest_snaive_1h"] = q_backtest_snaive_1h
ORACLE_SQL["backtest_snaive_1h"] = BACKTEST_SNAIVE_SQL
QUERIES["twohop_docs"] = q_twohop_docs
ORACLE_SQL["twohop_docs"] = TWOHOP_SQL

QUERIES["order_priority_check"] = q_order_priority_check
ORACLE_SQL["order_priority_check"] = ORDER_PRIORITY_SQL
QUERIES["custdist_orders"] = q_custdist_orders
ORACLE_SQL["custdist_orders"] = CUSTDIST_SQL
QUERIES["sales_opportunity_nations"] = q_sales_opportunity_nations
ORACLE_SQL["sales_opportunity_nations"] = SALES_OPPORTUNITY_SQL

QUERIES["vocab_overlap_sources"] = q_vocab_overlap_sources
ORACLE_SQL["vocab_overlap_sources"] = VOCAB_OVERLAP_SQL

QUERIES["ppr_docs"] = q_ppr_docs
ORACLE_SQL["ppr_docs"] = PPR_SQL

QUERIES["modularity_docs"] = q_modularity_docs
ORACLE_SQL["modularity_docs"] = MODULARITY_SQL

QUERIES["dominant_period_1h"] = q_dominant_period_1h
ORACLE_SQL["dominant_period_1h"] = DOMINANT_PERIOD_SQL

QUERIES["quantized_knn_recall"] = q_quantized_knn_recall
ORACLE_SQL["quantized_knn_recall"] = QUANTIZED_KNN_SQL

QUERIES["profit_by_nation_year"] = q_profit_by_nation_year
ORACLE_SQL["profit_by_nation_year"] = PROFIT_SQL
QUERIES["join_size_profile"] = q_join_size_profile
ORACLE_SQL["join_size_profile"] = JOIN_SIZE_SQL

QUERIES["lod_route_events"] = q_lod_route_events
ORACLE_SQL["lod_route_events"] = LOD_ROUTE_SQL

QUERIES["ed2_pairs_docs"] = q_ed2_pairs_docs
ORACLE_SQL["ed2_pairs_docs"] = ED2_PAIRS_SQL

QUERIES["cdc_chunk_docs"] = q_cdc_chunk_docs
ORACLE_SQL["cdc_chunk_docs"] = CDC_CHUNK_SQL
QUERIES["cdc_chunk_docs_utf8"] = q_cdc_chunk_docs_utf8
ORACLE_SQL["cdc_chunk_docs_utf8"] = CDC_CHUNK_UTF8_SQL
QUERIES["cdc_dedup_corpus"] = q_cdc_dedup_corpus
ORACLE_SQL["cdc_dedup_corpus"] = CDC_DEDUP_SQL
