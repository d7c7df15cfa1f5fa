"""Exact dedup, span dedup, repetition and token counting over the corpus.

Split from the former pipelines/queries.py monolith (r4 verdict
next-round #5); statement order inside this module is the original
file order. Explicit cross-module imports are generated: backward
dependencies at the top, forward (function-body-only) dependencies at
the bottom so package import order stays acyclic.
"""
from __future__ import annotations

from ._shared import SNAPSHOTS, _rd, _read_parquet_clean, pa, pc, read_pages

# ---------------------------------------------------------------------------
# dedup / text
# ---------------------------------------------------------------------------

def q_dedup_exact_pages(sf_dir: str):
    """Exact dedup: md5(text) hash-partition, keep the earliest crawl."""
    pages = read_pages(sf_dir, snapshots=SNAPSHOTS, columns=["url", "warc_ts", "text"])

    from ...stages.dedup import content_hash_batch

    def _hash(b: pa.Table) -> pa.Table:
        hashed = content_hash_batch(b, "text", out_col="text_md5")
        return pa.table({
            "text_md5": hashed["text_md5"],
            "url": hashed["url"],
            "ts_us": hashed["warc_ts"].cast(pa.int64()),
        })

    hashed = pages.map_batches(_hash, batch_format="pyarrow")

    from ...stages.dedup import keep_first_by_key

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
    from ...stages.spans import span_dedup

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
    from ...stages.textstats import repetition_batch

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


