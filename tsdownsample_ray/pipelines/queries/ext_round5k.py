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
