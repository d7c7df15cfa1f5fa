"""Round-5 closing wave, part 5: corpus-statistics operators —
shingle-containment near-dup join, Heaps'-law vocabulary growth,
Misra-Gries heavy hitters with exact recount.

Each entry follows the catalog contract: a Ray-Data-first distributed
shape documented in place, integer-exact arithmetic so the DuckDB
oracle replays bit-identically, and column names matched between both
sides.
"""
from __future__ import annotations

from ._shared import _MD5U64, _read_parquet_clean, pa

_M31 = 1 << 31


def q_containment_docs(sf_dir: str):
    """Shingle-containment near-dup join at t=0.5 over informative
    3-gram shingles, df in [2, 64]
    (``stages/dedup.py:containment_pairs``): the asymmetric companion
    to ``ngram_jaccard_docs`` — catches a short doc fully embedded in a
    long one, which Jaccard scores low. Exact intersection counts over
    the same md5/31-bit shingle ring as MinHash (collisions replayed in
    SQL); the df cap is part of the operator definition, so both sides
    compute identical pair sets."""
    from ...stages.dedup import containment_pairs

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"]).repartition(8)
    return containment_pairs(ds, w=3, df_cap=64, num_partitions=4)


def _grams31_cte(w: int = 3) -> str:
    from ...stages.dedup import _SHINGLE_MIX

    c = [int(x) % _M31 for x in _SHINGLE_MIX[:w]]
    mix = " + ".join(f"(h{j} * {c[j]}) % {_M31}" for j in range(w))
    leads = ",\n           ".join(
        f"lead(h0, {j}) OVER win AS h{j}" for j in range(1, w))
    return f"""
t AS (
    SELECT doc_id,
           list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
    FROM documents
),
tokidx AS (
    SELECT doc_id, i, toks[i] AS tok, len(toks) AS n
    FROM t, unnest(range(1, len(toks) + 1)) r(i)
),
th AS (
    SELECT doc_id, i, n, CAST({_MD5U64} % {_M31} AS BIGINT) AS h0
    FROM tokidx
),
th2 AS (
    SELECT doc_id, n, h0,
           {leads}
    FROM th WINDOW win AS (PARTITION BY doc_id ORDER BY i)
),
grams AS (
    SELECT DISTINCT doc_id, ({mix}) % {_M31} AS g
    FROM th2 WHERE h{w - 1} IS NOT NULL AND n >= {w}
    UNION
    SELECT doc_id, CAST({_MD5U64} % {_M31} AS BIGINT) AS g
    FROM (SELECT doc_id, array_to_string(toks, ' ') AS tok FROM t
          WHERE len(toks) > 0 AND len(toks) < {w}) short
)"""


CONTAINMENT_SQL = f"""
WITH {_grams31_cte(3)},
df AS (SELECT g, count(*) AS dfc FROM grams GROUP BY g),
kept AS (
    SELECT gr.doc_id, gr.g FROM grams gr JOIN df USING (g)
    WHERE dfc BETWEEN 2 AND 64
),
sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS s FROM kept
       GROUP BY doc_id),
pr AS (
    SELECT x.doc_id AS a, y.doc_id AS b,
           CAST(count(*) AS BIGINT) AS inter
    FROM kept x JOIN kept y USING (g)
    WHERE x.doc_id < y.doc_id GROUP BY 1, 2
)
SELECT a, b, inter, sa.s AS sz_a, sb.s AS sz_b,
       CAST(2 * inter >= sa.s AS BIGINT) AS cont_a,
       CAST(2 * inter >= sb.s AS BIGINT) AS cont_b
FROM pr JOIN sz sa ON sa.doc_id = a JOIN sz sb ON sb.doc_id = b
WHERE 2 * inter >= least(sa.s, sb.s)
"""


def q_heaps_law_docs(sf_dir: str):
    """Heaps'-law vocabulary-growth curve over 10 deterministic corpus
    slices (``stages/vocab.py:heaps_law``): cumulative token count and
    cumulative exact distinct-vocabulary size per slice boundary. The
    cumulative-distinct curve costs ONE hash(token) shuffle of
    (token, min-slice) partials — never a growing-prefix recount."""
    import pyarrow.parquet as _pq

    from ...stages.vocab import heaps_law

    n = _pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"]).repartition(8)
    return heaps_law(ds, n, deciles=10, num_partitions=4)


HEAPS_SQL = """
WITH n_ AS (SELECT count(*) AS n FROM documents),
w AS (
    SELECT doc_id * 10 // (SELECT n FROM n_) AS dec,
           unnest(list_filter(string_split(text, ' '), x -> x <> ''))
               AS tok
    FROM documents
),
v AS (SELECT tok, min(dec) AS d0 FROM w GROUP BY tok),
tv AS (SELECT dec, CAST(count(*) AS BIGINT) AS n_tok FROM w GROUP BY dec),
nv AS (SELECT d0, CAST(count(*) AS BIGINT) AS n_new FROM v GROUP BY d0),
d AS (SELECT unnest(range(10)) AS decile)
SELECT CAST(decile AS BIGINT) AS decile,
       CAST(sum(coalesce(tv.n_tok, 0))
            OVER (ORDER BY decile) AS BIGINT) AS cum_tokens,
       CAST(sum(coalesce(nv.n_new, 0))
            OVER (ORDER BY decile) AS BIGINT) AS cum_vocab
FROM d LEFT JOIN tv ON tv.dec = decile LEFT JOIN nv ON nv.d0 = decile
"""


def q_misra_gries_terms(sf_dir: str):
    """Misra-Gries heavy hitters (capacity 64) over corpus tokens with
    exact recount (``stages/sketches.py:misra_gries_heavy``): every
    token with exact count > N/65, discovered through bounded per-block
    candidate sets (the MG pigeonhole guarantee) so no full token
    shuffle ever happens — the deterministic-guarantee sibling of the
    probabilistic ``cms_heavy_hitters_docs``."""
    from ...stages.sketches import misra_gries_heavy

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["text"]).repartition(8)
    return misra_gries_heavy(ds, m=64, fanin=4)


MISRA_GRIES_SQL = """
WITH tk AS (
    SELECT unnest(list_filter(string_split(text, ' '), x -> x <> ''))
        AS token
    FROM documents
),
n_ AS (SELECT count(*) AS n FROM tk)
SELECT token, CAST(count(*) AS BIGINT) AS cnt
FROM tk GROUP BY token
HAVING count(*) * 65 > (SELECT n FROM n_)
"""
