"""MinHash/SimHash/ngram near-dup, contamination, PII scrub, TF-IDF, sampling and splits.

Split from the former pipelines/queries.py monolith (r4 verdict
next-round #5); statement order inside this module is the original
file order. Explicit cross-module imports are generated: backward
dependencies at the top, forward (function-body-only) dependencies at
the bottom so package import order stays acyclic.
"""
from __future__ import annotations

from ._shared import (
    SNAPSHOTS,
    _MD5U64,
    _rd,
    _read_parquet_clean,
    pa,
    pc,
    read_pages,
)

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
    from ...stages.dedup import near_dup_pairs

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
    from ...stages.components import connected_components
    from ...stages.dedup import near_dup_pairs

    ds = _pages_with_pid(sf_dir)
    pairs = near_dup_pairs(ds, id_col="pid", text_col="text", num_perm=64,
                           bands=8, threshold=0.999, num_partitions=4)
    return connected_components(pairs, a_col="a", b_col="b",
                                num_partitions=4)


def q_simhash_docs(sf_dir: str):
    rd = _rd()
    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    from ...stages.dedup import simhash_signatures

    return simhash_signatures(ds)


def q_simhash_near_dup_pages(sf_dir: str):
    """Banded SimHash near-dup pairs over pages — the banding is recall-
    PERFECT at hamming <= 3, so the result equals the quadratic all-pairs
    SQL oracle exactly."""
    from ...stages.dedup import simhash_near_dup_pairs

    ds = _pages_with_pid(sf_dir)
    return simhash_near_dup_pairs(ds, id_col="pid", max_hamming=3)


def q_ngram_jaccard_docs(sf_dir: str):
    """EXACT character-5-gram Jaccard similarity join over documents at
    t=0.5 via the lossless prefix filter (``ngram_jaccard_pairs``) — the
    non-probabilistic member of the near-dup family (MinHash recall < 1,
    SimHash bounded hamming; this one EQUALS the quadratic definition,
    which the SQL oracle restates as an inverted-index join)."""
    from ...stages.dedup import ngram_jaccard_pairs

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
    from ...stages.dedup import dedup_against

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
    from ...stages.vocab import build_vocab

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
    from ...stages.dedup import benchmark_shingle_set, contamination_check

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
    from ...stages.dedup import _SHINGLE_MIX

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
    from ...stages.dedup import minhash_signatures

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
    from ...stages.textstats import LangId

    return ds.map_batches(LangId, batch_format="pyarrow",
                          concurrency=(1, 8)).select_columns(["doc_id", "lang_pred"])


def q_quality_docs(sf_dir: str):
    """Full quality-signal panel (length/tokens/stopword/punct/upper) —
    every column SQL-oracled."""
    rd = _rd()
    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    from ...stages.textstats import quality_batch

    return ds.map_batches(quality_batch, batch_format="pyarrow")


def q_token_stats_docs(sf_dir: str):
    rd = _rd()
    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    from ...stages.textstats import token_stats_batch

    return ds.map_batches(token_stats_batch, batch_format="pyarrow")


def q_fingerprint_docs(sf_dir: str):
    rd = _rd()
    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    from ...stages.textstats import fingerprint_batch

    return ds.map_batches(fingerprint_batch, batch_format="pyarrow")


def q_chunk_docs(sf_dir: str):
    """Context-window chunking: 40-token chunks with 10-token overlap
    (stride 30) per document; the chunk TEXT itself is hash-verified
    against the SQL list_slice replay."""
    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    from ...stages.packing import chunk_documents

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
    from ...stages.packing import pack_sequences
    from ...stages.textstats import token_stats_batch

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
    from ...sources.archives import gunzip_batch, gzip_bytes
    from ...stages.textstats import token_stats_batch

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
    from ...sources.archives import WarcRecordExtractor, build_warc

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
    from ...stages.tfidf import tfidf_top_terms

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
    from ...stages.pii import pii_scrub_batch

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
    from ...stages.pii import PII_PATTERNS

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
    from ...stages.sampling import bernoulli_sample

    return bernoulli_sample(ds, id_col="doc_id", rate=_SAMPLE_RATE,
                            salt=_SAMPLE_SALT)


def q_sample_stratified_docs(sf_dir: str):
    """Language-rebalancing stratified sample: per-lang keep rates
    (downsample the over-represented 'en', keep all 'fr'). The rate table
    rides in the UDF closure; the filter stays map-side."""
    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "lang", "n_chars"])
    from ...stages.sampling import stratified_sample

    return stratified_sample(ds, id_col="doc_id", strata_col="lang",
                             rates=_STRAT_RATES, default_rate=0.1,
                             salt=_STRAT_SALT)


def q_train_split_docs(sf_dir: str):
    """Deterministic 80/10/10 train/val/test assignment by doc_id hash,
    reported as per-split corpus totals (3 rows)."""
    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "n_chars"])
    from ...arrow_utils import rename_agg
    from ...stages.sampling import assign_splits

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
    from ...stages.sampling import (hash61_sql, rate_threshold,
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


