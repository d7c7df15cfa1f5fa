"""Corpus extraction and rollup-cascade queries (pages_extract, tier cascades, top-k, gapfill, compress roundtrips).

Split from the former pipelines/queries.py monolith (r4 verdict
next-round #5); statement order inside this module is the original
file order. Explicit cross-module imports are generated: backward
dependencies at the top, forward (function-body-only) dependencies at
the bottom so package import order stays acyclic.
"""
from __future__ import annotations

from ._shared import (
    ChunkCompressor,
    ChunkDecompressor,
    HtmlTextExtractor,
    SNAPSHOTS,
    W15M,
    W1D,
    W1H,
    cascade,
    derive_series,
    finalize_mean,
    gapfill,
    pa,
    pc,
    read_pages,
    rollup,
)

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
    from ...stages.rollup import rollup_multi

    pages = read_pages(sf_dir, snapshots=SNAPSHOTS,
                       columns=["url", "warc_ts", "text"])

    def _metrics(b: pa.Table) -> pa.Table:
        url = b["url"]
        if isinstance(url, pa.ChunkedArray):
            url = url.combine_chunks()
        from ...stages.series import _DOMAIN_PATTERN

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
    from ...stages.backfill import merge_into_tier

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
    from ...stages.sketches import distinct_approx

    pages = read_pages(sf_dir, snapshots=SNAPSHOTS, columns=["url", "warc_ts"])

    def _dom(b: pa.Table) -> pa.Table:
        url = b["url"]
        if isinstance(url, pa.ChunkedArray):
            url = url.combine_chunks()
        from ...stages.series import _DOMAIN_PATTERN

        domain = pc.struct_field(pc.extract_regex(url, _DOMAIN_PATTERN),
                                 "domain")
        return pa.table({"domain": domain, "url": url})

    du = pages.map_batches(_dom, batch_format="pyarrow")
    est = distinct_approx(du, key_col="domain", value_col="url").to_pandas()

    # exact side, scale-safe: hash-partitioned (domain, url) distinct (a
    # hot domain spreads across partitions by url hash), then per-block
    # partial counts -> tiny per-domain merge. Never one group per domain.
    from ...arrow_utils import rename_agg
    from ...stages.dedup import distinct_pairs

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
    from ...stages.retention_policy import apply_retention

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
    from ...stages.compress import compact_chunks, compress_chunks_per_series

    t0 = finalize_mean(rollup(_series(sf_dir), W15M))
    small = compress_chunks_per_series(t0, chunk_size=64)
    compacted = compact_chunks(small, chunk_size=4096, num_partitions=4)
    return compacted.map_batches(ChunkDecompressor,
                                 batch_format="pyarrow",
                                 concurrency=(1, 4))


