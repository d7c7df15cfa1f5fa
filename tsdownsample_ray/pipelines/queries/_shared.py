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

from ...sources.corpus import (
    BASE_EPOCH_S,
    DOC_CADENCE_S,
    SNAPSHOT_CADENCE_S,
    read_pages,
)
from ...stages.compress import ChunkCompressor, ChunkDecompressor
from ...stages.downsample import downsample_table
from ...stages.extract import HtmlTextExtractor
from ...stages.gapfill import gapfill
from ...stages.rollup import cascade, finalize_mean, rollup
from ...stages.series import derive_series

US = 1_000_000
W15M = 900 * US
W1H = 3600 * US
W1D = 86400 * US
SNAPSHOTS = 3  # pages per document in the correctness corpus


def _read_parquet_clean(*a, **kw):
    from ...sources import read_parquet_clean

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
    from ...stages.textstats import LangId

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
    from ...stages.dedup import _SHINGLE_MIX, MinHasher

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


