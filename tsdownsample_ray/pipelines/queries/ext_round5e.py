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


def q_pq_recall_embeddings(sf_dir: str):
    """Product-quantization top-1 recall audit
    (``stages/similarity.py:pq_recall``): 4 subspaces x 4 codewords
    trained with the bit-deterministic integer Lloyd kmeans, ADC
    scoring against 8 fixed queries, exact-distance ground truth and
    the hit flag — all integer, the SQL oracle replays every kmeans
    iteration per subspace plus the ADC lookup."""
    from ...stages.similarity import pq_recall

    ds = _read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding"]).repartition(4)
    return pq_recall(ds, n_sub=4, k=4, updates=1, scale=1000,
                     n_queries=8, num_partitions=4)


def _pq_sql(n_sub: int = 4, k: int = 4, updates: int = 1,
            scale: int = 1000, dim: int = 64, n_queries: int = 8) -> str:
    dsub = dim // n_sub

    def _d2(a: str, b: str) -> str:
        return (f"list_dot_product({a}, {a}) + list_dot_product({b}, {b})"
                f" - 2 * list_dot_product({a}, {b})")

    ctes = [f"""q AS (
    SELECT vec_id,
           list_transform(embedding,
               x -> CAST(trunc(CAST(x AS DOUBLE) * {scale}) AS BIGINT))
               AS v
    FROM embeddings
)"""]
    code_joins, adc_terms = [], []
    for s in range(n_sub):
        p = f"s{s}_"
        lo, hi = s * dsub + 1, (s + 1) * dsub
        ctes.append(f"""{p}q AS (
    SELECT vec_id, list_slice(v, {lo}, {hi}) AS v FROM q
)""")
        ctes.append(
            f"{p}c0 AS (SELECT vec_id AS k, v FROM {p}q"
            f" WHERE vec_id < {k})")
        d2qc = _d2("q.v", "c.v")

        def _assign(name: str, cprev: str) -> str:
            return f"""{name} AS (
    SELECT vec_id, k FROM (
        SELECT q.vec_id, c.k,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY {d2qc}, c.k) AS rn
        FROM {p}q q CROSS JOIN {cprev} c)
    WHERE rn = 1
)"""

        cprev = f"{p}c0"
        for it in range(1, updates + 1):
            ctes.append(_assign(f"{p}a{it}", cprev))
            ctes.append(f"""{p}s{it} AS (
    SELECT a.k, r.range AS i, CAST(sum(q.v[r.range]) AS BIGINT) AS s,
           count(*) AS n
    FROM {p}a{it} a JOIN {p}q q USING (vec_id)
    CROSS JOIN range(1, {dsub + 1}) r
    GROUP BY a.k, r.range
)""")
            ctes.append(f"""{p}c{it} AS (
    SELECT pv.k, list(CASE WHEN s.n IS NULL THEN pv.v[r.range]
                           ELSE s.s // s.n END ORDER BY r.range) AS v
    FROM {cprev} pv CROSS JOIN range(1, {dsub + 1}) r
    LEFT JOIN {p}s{it} s ON s.k = pv.k AND s.i = r.range
    GROUP BY pv.k
)""")
            cprev = f"{p}c{it}"
        ctes.append(_assign(f"{p}af", cprev))
        code_joins.append(f"JOIN {p}af a{s} ON a{s}.vec_id = x.vec_id")
        adc_terms.append(
            f"({_d2(f'list_slice(qry.v, {lo}, {hi})', f'c{s}.v')})")
    cent_joins = "\n    ".join(
        f"JOIN s{s}_c{updates} c{s} ON c{s}.k = a{s}.k"
        for s in range(n_sub))
    a_joins = "\n    ".join(code_joins)
    joined = ",\n".join(ctes)
    return f"""
WITH {joined},
qry AS (SELECT vec_id AS qid, v FROM q WHERE vec_id < {n_queries}),
x AS (SELECT vec_id FROM q),
adc AS (
    SELECT qry.qid, x.vec_id,
           CAST({" + ".join(adc_terms)} AS BIGINT) AS adc_d2
    FROM x CROSS JOIN qry
    {a_joins}
    {cent_joins}
    WHERE x.vec_id <> qry.qid
),
exact AS (
    SELECT qry.qid, q.vec_id, CAST({_d2("q.v", "qry.v")} AS BIGINT)
               AS ex_d2
    FROM q CROSS JOIN qry WHERE q.vec_id <> qry.qid
),
ar AS (
    SELECT qid, vec_id AS adc_id, adc_d2,
           row_number() OVER (PARTITION BY qid
                              ORDER BY adc_d2, vec_id) AS rn
    FROM adc
),
er AS (
    SELECT qid, vec_id AS exact_id, ex_d2,
           row_number() OVER (PARTITION BY qid
                              ORDER BY ex_d2, vec_id) AS rn
    FROM exact
)
SELECT a.qid, a.adc_id, a.adc_d2, e.exact_id,
       e.ex_d2 AS exact_d2,
       CAST(a.adc_id = e.exact_id AS BIGINT) AS hit
FROM ar a JOIN er e USING (qid)
WHERE a.rn = 1 AND e.rn = 1
"""


PQ_RECALL_SQL = _pq_sql()
