"""Common-Crawl-style page corpus (BASELINE.json input_hint schema).

Schema: ``(url: string, warc_ts: timestamp[us], html: binary, text: string,
lang: string)``.

Pages are synthesized DETERMINISTICALLY from the driver's ``documents``
table (TESTDATA.md): each document becomes ``snapshots`` crawl snapshots of
the same url at a fixed per-domain cadence. Every derived column is a pure
function of ``(doc_id, source, text, lang, k)``, so a DuckDB oracle can
reproduce the corpus exactly from the same parquet (see
``__ray_entry__.oracle_sql``):

- ``domain  = source || '.example.com'``
- ``url     = 'https://' || domain || '/doc/' || doc_id``
- ``warc_ts = TIMESTAMP '2025-01-01' + (doc_id*37 + k*971) seconds``
- ``html    = HTML_PREFIX || text || HTML_SUFFIX`` (fixed-length wrapper so
  extraction is an exact inverse — the byte-identical-text invariant)

At bench scale ``snapshots`` is raised to amplify the corpus
deterministically (same generator, more rows per doc); hot-domain skew can
be injected via ``hot_domain_factor`` which gives domain src0 extra
snapshots (Zipf-ish head, exercises salting).
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

HTML_PREFIX = b'<html><head><meta charset="utf-8"></head><body>'
HTML_SUFFIX = b"</body></html>"
BASE_EPOCH_S = 1735689600  # 2025-01-01T00:00:00Z
DOC_CADENCE_S = 37  # seconds between consecutive doc_ids' first crawl
SNAPSHOT_CADENCE_S = 971  # seconds between snapshots of one url

__all__ = [
    "HTML_PREFIX", "HTML_SUFFIX", "BASE_EPOCH_S",
    "DOC_CADENCE_S", "SNAPSHOT_CADENCE_S", "estimate_rollup_keys",
    "read_pages", "read_pages_sliced", "expand_documents_to_pages",
]


def expand_documents_to_pages(batch: pa.Table, *, snapshots: int = 3,
                              hot_domain_factor: int = 1,
                              first_snapshot: int = 0,
                              out_cols=("url", "warc_ts", "html", "text", "lang")) -> pa.Table:
    """documents rows -> pages rows (vectorized Arrow; one input row ->
    ``snapshots`` output rows, ``snapshots*hot_domain_factor`` for src0).
    Only the columns in ``out_cols`` are constructed (html and url string
    building dominate the expansion cost at bench scale)."""
    out_cols = tuple(out_cols)
    n = batch.num_rows
    doc_id = batch["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
    source = batch["source"]
    if isinstance(source, pa.ChunkedArray):
        source = source.combine_chunks()

    per_row = np.full(n, snapshots, dtype=np.int64)
    if hot_domain_factor > 1:
        hot = pc.equal(source, "src0").to_numpy(zero_copy_only=False)
        per_row[hot] = snapshots * hot_domain_factor
    row_idx = np.repeat(np.arange(n), per_row)
    # within-row snapshot index, fully vectorized (no per-row arange):
    # global position minus each row's starting offset
    if n:
        starts = np.concatenate(([0], np.cumsum(per_row)[:-1]))
        k = (np.arange(per_row.sum()) - np.repeat(starts, per_row)
             + first_snapshot)
    else:
        k = np.empty(0, np.int64)

    # bytes-per-page discipline: every string/binary column is built ONCE
    # at DOC level (n rows) and replicated to page level by a single
    # `take` — the prior shape replicated `text` first and then ran the
    # html/url joins over the replicated arrays, writing each payload
    # byte twice per page instead of once (at `snapshots` >= 100 the
    # doc-level build amortizes to ~0 per page; the take is the one
    # unavoidable payload write of the expansion)
    doc_rep = doc_id[row_idx]
    ts_us = (BASE_EPOCH_S + doc_rep * DOC_CADENCE_S + k * SNAPSHOT_CADENCE_S) * 1_000_000
    warc_ts = pa.array(ts_us, type=pa.int64()).cast(pa.timestamp("us"))

    doc_cols = {}
    if "url" in out_cols:
        source_c = source
        doc_str = pc.cast(batch["doc_id"], pa.string())
        domain = pc.binary_join_element_wise(source_c, ".example.com", "")
        doc_cols["url"] = pc.binary_join_element_wise(
            "https://", domain, "/doc/", doc_str, "")
    if "html" in out_cols or "text" in out_cols:
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        if "html" in out_cols:
            doc_cols["html"] = pc.binary_join_element_wise(
                pa.scalar(HTML_PREFIX, type=pa.binary()),
                text.cast(pa.binary()),
                pa.scalar(HTML_SUFFIX, type=pa.binary()),
                pa.scalar(b"", type=pa.binary()),
            )
        if "text" in out_cols:
            doc_cols["text"] = text
    if "lang" in out_cols:
        doc_cols["lang"] = batch["lang"]

    rep = pa.table(doc_cols).take(pa.array(row_idx)) if doc_cols else None
    cols = {}
    for c in out_cols:
        cols[c] = warc_ts if c == "warc_ts" else rep[c]
    return pa.table({c: cols[c] for c in out_cols})


def read_pages(sf_dir: str, *, snapshots: int = 3, hot_domain_factor: int = 1,
               first_snapshot: int = 0,
               columns: list | None = None, parallelism: int = 0,
               doc_range: tuple | None = None):
    """Dataset of synthetic pages derived from ``{sf_dir}/documents.parquet``.

    ``columns`` prunes the OUTPUT page columns; the read itself only loads
    the document columns actually needed (prune-at-the-read).
    ``doc_range=(lo, hi)`` keeps only docs with ``lo <= doc_id < hi``,
    applied BEFORE the page expansion (shard pruning at the source).

    The documents file is a single small parquet -> one read block; the
    expansion multiplies rows by ``snapshots``, so the source is split into
    ``parallelism`` blocks FIRST (default: enough that every CPU gets work;
    at real CC scale the input is thousands of files and this repartition
    disappears).
    """
    import ray.data as rd

    need = {"doc_id", "source"}
    out_cols = columns or ["url", "warc_ts", "html", "text", "lang"]
    if "text" in out_cols or "html" in out_cols:
        need.add("text")
    if "lang" in out_cols:
        need.add("lang")
    # read through the metadata-stripping reader: a metadata-bearing
    # pa.Schema is UNHASHABLE, so every downstream shuffle's unify_schemas
    # would log a "Failed to hash the schemas" warning per reduce task and
    # skip its dedup fast path (see sources.read_parquet_clean)
    from . import read_parquet_clean

    if parallelism == 0:
        import pyarrow.parquet as pq

        n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
        # upper bound including the hot-domain expansion (estimate_pages'
        # bound): sizing by n_docs*snapshots alone would leave hot-skewed
        # corpora with blocks up to hot_domain_factor x the ~90 MB target
        total = n_docs * snapshots * max(hot_domain_factor, 1)
        # ~125k expanded rows (~90MB with html) per block: sized by DATA, not
        # by CPU count — oversized blocks pressure the object store, and the
        # tree combine keeps many blocks cheap downstream. When the data-
        # sized count can't fill the cluster (small corpora), floor it at
        # the CPU count as long as blocks stay >= ~30k rows (~22 MB): the
        # fused expand->extract->series map is compute-bound, so fewer
        # tasks than cores directly forfeits wall time.
        try:
            import ray as _ray

            cpus = int(_ray.available_resources().get("CPU", 0)) \
                if _ray.is_initialized() else 0
        except Exception:
            cpus = 0
        floor = min(cpus, max(total // 30_000, 1))
        parallelism = min(max(total // 125_000, floor, 1), 512)
        if parallelism <= 1:
            parallelism = 0
    # NOTE: a post-read repartition (not override_num_blocks) is the right
    # splitter here — measured: the reader's own SplitBlocks dribbles
    # blocks through the streaming-generator buffer and GATES the fused
    # expand map (map-only wall 6.8 s vs 2.4 s), while the repartition's
    # operator wall fully overlaps with downstream execution.
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=sorted(need))
    if doc_range is not None:
        # shard pruning BEFORE the expansion: filtering pages after
        # expand would build every html/url payload shards times over
        # just to discard most of them (the expansion's string building
        # dominates its cost)
        lo, hi = int(doc_range[0]), int(doc_range[1])

        def _prune(b: pa.Table) -> pa.Table:
            ids = b["doc_id"]
            return b.filter(pc.and_(pc.greater_equal(ids, lo),
                                    pc.less(ids, hi)))

        ds = ds.map_batches(_prune, batch_format="pyarrow")
    if parallelism > 1:
        ds = ds.repartition(parallelism)

    def _expand(batch: pa.Table) -> pa.Table:
        if "text" not in batch.column_names:  # html/text pruned at the read
            batch = batch.append_column("text", pa.array([""] * batch.num_rows))
        if "lang" not in batch.column_names:
            batch = batch.append_column("lang", pa.array([""] * batch.num_rows))
        return expand_documents_to_pages(
            batch, snapshots=snapshots, hot_domain_factor=hot_domain_factor,
            first_snapshot=first_snapshot, out_cols=out_cols,
        )

    return ds.map_batches(_expand, batch_format="pyarrow")


def estimate_pages(sf_dir: str, *, snapshots: int = 3,
                   hot_domain_factor: int = 1) -> int:
    """Metadata-only upper bound on the number of pages ``read_pages``
    will emit (parquet footer row count x expansion factor — nothing is
    read). Each page contributes at most one ``(series, bucket)`` key to
    a rollup, so this also upper-bounds the tier-0 key space: pipelines
    pass it as ``rollup(..., est_keys=...)`` so ``combine="auto"`` flips
    to the hash-partitioned merge BEFORE the tree combine's single-block
    final merge becomes the bottleneck (VERDICT r3 item 6)."""
    import pyarrow.parquet as pq

    n_docs = pq.ParquetFile(
        f"{sf_dir}/documents.parquet").metadata.num_rows
    return n_docs * snapshots * max(hot_domain_factor, 1)


def _corpus_dims(sf_dir: str) -> tuple:
    """(n_domains, n_docs) of documents.parquet, cached per (path,
    mtime, size) so a multi-tier run pays the |docs|-row ``source``
    column read once, not once per tier."""
    import os

    path = f"{sf_dir}/documents.parquet"
    st = os.stat(path)
    return _corpus_dims_cached(path, st.st_mtime_ns, st.st_size)


@functools.lru_cache(maxsize=64)
def _corpus_dims_cached(path: str, mtime_ns: int, size: int) -> tuple:
    import pyarrow.parquet as pq

    t = pq.read_table(path, columns=["source"])
    return (len(t["source"].combine_chunks().unique()), t.num_rows)


def estimate_rollup_keys(sf_dir: str, window_us: int, *,
                         snapshots: int = 3, hot_domain_factor: int = 1,
                         first_snapshot: int = 0,
                         n_docs_span: int | None = None) -> int:
    """Tight |series| x |buckets| bound for ``rollup(..., est_keys=...)``.

    ``estimate_pages`` (every page its own key) overestimates the tier-0
    key space by orders of magnitude — series are per-DOMAIN, and domains
    come from the bounded ``source`` dimension. A 40M-page sf0.1 run has
    ~20 domains x ~3k buckets ≈ 60k keys, where the pages bound says 40M
    and flips ``combine="auto"`` to the hash-partitioned merge whose two
    all-to-all exchanges cost ~2x the tree combine at this key count
    (round-4 A/B in BASELINE.md). Reads ONE small dictionary column
    (``source``, |docs| rows) — bounded, not a corpus scan; the time span
    derives from the generator's cadence constants.

    ``n_docs_span`` narrows the TIME span to a doc-id range of that
    width (doc time is doc_id-cadenced, so a contiguous shard covers
    ~1/shards of the buckets) — the per-shard estimate for
    ``pipelines/sharded.py``; domains stay corpus-wide (conservative)."""
    n_domains, n_docs = _corpus_dims(sf_dir)
    # hot src0 docs carry snapshot indices up to
    # first_snapshot + snapshots*factor - 1 (expand_documents_to_pages),
    # so the bucket span must use the SAME max index — the n_docs-only
    # formula under-counts hot corpora by up to factor x and could keep
    # combine="auto" on the tree merge past TREE_MAX_KEYS
    max_k = first_snapshot + snapshots * max(hot_domain_factor, 1)
    span_docs = n_docs if n_docs_span is None else min(n_docs_span, n_docs)
    span_us = (span_docs * DOC_CADENCE_S
               + max_k * SNAPSHOT_CADENCE_S) * 1_000_000
    n_buckets = span_us // window_us + 2
    return int(n_domains * n_buckets)


def read_pages_sliced(sf_dir: str, *, snapshots: int,
                      columns: list | None = None,
                      slice_snapshots: int = 0,
                      doc_range: tuple | None = None):
    """Pages dataset partitioned by TIME SLICE instead of by doc slice:
    each task expands ALL documents for a contiguous snapshot range, so
    a block covers ``slice_snapshots`` time buckets x every domain and
    map-side rollup partials collapse ACROSS docs (~|docs-per-domain| x
    reduction) before any exchange.

    Why this exists (measured, r5): ``read_pages`` splits by doc, so at
    wide snapshot ranges every block covers the FULL time range and a
    15m-rollup partial pass achieves ~zero in-block reduction — at 80M
    pages the tier-0 combine must then move ~80M partial rows
    (n_blocks x keys-per-block) through the object store, and the wall
    time grows superlinearly with corpus size (41-77 s at 16000
    snapshots vs 10 s at 8000, 32 CPUs; the combine's 16 merge tasks
    each burn 6-9 s on 5M-row inputs). Slicing by time bounds
    keys-per-block at |domains| x slice_snapshots regardless of corpus
    width, so total partial volume stays ~|keys| — the continuous-
    aggregate design point. This is also the realistic 100 TB layout:
    crawl corpora shard by (date, segment), so a reader sees bounded
    time ranges per shard and rollup partials collapse naturally.

    The doc table is read ONCE on the driver (it is the small dimension
    side) and broadcast via ``ray.put``; every expansion task reads it
    zero-copy from the object store — never re-shipped per task. The
    parallelism axis is a ``range(n_slices)`` index dataset, one slice
    per block.

    Emits exactly the same rows as ``read_pages`` (the snapshot index
    enters the row construction only through ``first_snapshot``, which
    is linear in ``warc_ts``); hot-domain skew is doc-sliced-only
    because ``hot_domain_factor`` scales the per-doc snapshot count and
    overlapping k-ranges would duplicate rows across slices."""
    import math

    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    need = {"doc_id", "source"}
    out_cols = columns or ["url", "warc_ts", "html", "text", "lang"]
    if "text" in out_cols or "html" in out_cols:
        need.add("text")
    if "lang" in out_cols:
        need.add("lang")
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=sorted(need))
    docs = docs.replace_schema_metadata(None)
    if doc_range is not None:
        lo, hi = int(doc_range[0]), int(doc_range[1])
        ids = docs["doc_id"]
        docs = docs.filter(pc.and_(pc.greater_equal(ids, lo),
                                   pc.less(ids, hi)))
    n_docs = docs.num_rows
    if slice_snapshots <= 0:
        try:
            cpus = int(ray.available_resources().get("CPU", 0)) \
                if ray.is_initialized() else 0
        except Exception:
            cpus = 0
        # ~125k pages per block (the read_pages target), but never fewer
        # slices than the cluster width when the corpus allows it
        per_block = max(125_000 // max(n_docs, 1), 1)
        if cpus:
            per_block = min(per_block,
                            max(math.ceil(snapshots / cpus), 1))
        slice_snapshots = per_block
    n_slices = max(math.ceil(snapshots / slice_snapshots), 1)
    ref = ray.put(docs)
    total_snaps = snapshots
    cnt = slice_snapshots

    def _expand_slices(b: pa.Table) -> pa.Table:
        base = ray.get(ref)  # zero-copy plasma read, once per task
        parts = []
        for sid in b["id"].to_pylist():
            s0 = sid * cnt
            k = min(cnt, total_snaps - s0)
            if k <= 0 or base.num_rows == 0:
                continue
            parts.append(expand_documents_to_pages(
                base, snapshots=k, first_snapshot=s0,
                out_cols=out_cols))
        if not parts:
            return expand_documents_to_pages(
                base.slice(0, 0), snapshots=1, out_cols=out_cols)
        return pa.concat_tables(parts)

    idx = rd.range(n_slices, override_num_blocks=n_slices)
    return idx.map_batches(_expand_slices, batch_format="pyarrow")
