"""Shard-level (per-partition) resumable tier-0 build.

The tier-level resume in ``retention.py`` re-runs ALL of tier 0 if the run
died mid-tier. At 100 TB tier 0 is hours of work, so the corpus is split
into ``shards`` deterministic doc_id ranges; each shard's PARTIAL rollup
rows are written to ``shard=<i>/`` with its own manifest, and the final
tier is the (associative) combine of all shard partials. A resumed run
skips complete shards — this is the per-partition lineage story of the
north rule at the granularity that matters.

Shard outputs are partials (one row per (series,bucket) per shard), so the
final combine is exact regardless of how work was split.
"""

from __future__ import annotations

import time

from ..sources.corpus import read_pages
from ..stages.extract import extract_text_batch
from ..stages.rollup import _combine, partial_rollup_batch
from ..stages.series import derive_series
from ..state import checkpoint as ckpt

__all__ = ["run_sharded_tier0"]


def _shard_filter(ds, shard: int, shards: int, n_docs: int):
    import pyarrow.compute as pc

    lo = shard * n_docs // shards
    hi = (shard + 1) * n_docs // shards

    # doc_id is recoverable from the url suffix; filtering PAGES keeps the
    # shard a pure function of the corpus (at real scale shards are input
    # file ranges and this filter disappears)
    def _keep(b):
        url = b["url"]
        if hasattr(url, "combine_chunks"):
            url = url.combine_chunks()
        doc = pc.cast(
            pc.struct_field(pc.extract_regex(url, r"/doc/(?P<d>\d+)$"), "d"),
            "int64")
        return b.filter(pc.and_(pc.greater_equal(doc, lo), pc.less(doc, hi)))

    return ds.map_batches(_keep, batch_format="pyarrow")


def run_sharded_tier0(sf_dir: str, out_dir: str, *, snapshots: int = 3,
                      shards: int = 4, window_us: int = 900 * 1_000_000,
                      resume: bool = False, fail_after_shard: int = -1) -> dict:
    """Build tier 0 as ``shards`` independently-checkpointed partial runs +
    one final combine. ``fail_after_shard`` injects a crash for the
    kill-and-resume test."""
    import pyarrow.parquet as pq
    import ray.data as rd

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    summary = {"shards": {}, "resumed": [], "out_dir": out_dir}

    for s in range(shards):
        d = ckpt.tier_dir(out_dir, "shard", str(s))
        if resume and ckpt.is_complete(d):
            summary["resumed"].append(s)
            summary["shards"][s] = ckpt.read_manifest(d)
            continue
        t0 = time.time()
        pages = read_pages(sf_dir, snapshots=snapshots,
                           columns=["url", "warc_ts", "html"])
        pages = _shard_filter(pages, s, shards, n_docs)
        ext = pages.map_batches(extract_text_batch, batch_format="pyarrow")
        series = derive_series(ext, text_col="extracted_text")
        partials = series.map_batches(
            lambda b: partial_rollup_batch(b, window_us),
            batch_format="pyarrow")
        # combine within the shard -> <= |keys| rows written per shard
        shard_rows = _combine(partials, ["series_id", "bucket"], fanin=4)
        ckpt.reset_dir(d)
        shard_rows.write_parquet(d)
        summary["shards"][s] = ckpt.write_manifest(
            d, rows=-1, seconds=time.time() - t0,
            lineage={"input": "corpus", "doc_lo": s * n_docs // shards,
                     "doc_hi": (s + 1) * n_docs // shards,
                     "window_us": window_us})
        if fail_after_shard == s:
            raise RuntimeError(f"injected failure after shard {s}")

    # final combine across shard partials (cheap: shards x |keys| rows)
    td = ckpt.tier_dir(out_dir, "tier", "sharded0")
    t0 = time.time()
    import os

    files = []
    for s in range(shards):
        sd = ckpt.tier_dir(out_dir, "shard", str(s))
        files.extend(os.path.join(sd, f)
                     for f in ckpt.read_manifest(sd)["partitions"])
    all_partials = rd.read_parquet(files)
    tier = _combine(all_partials, ["series_id", "bucket"], fanin=4)
    ckpt.reset_dir(td)
    tier.repartition(4).write_parquet(td)
    summary["tier"] = ckpt.write_manifest(
        td, rows=-1, seconds=time.time() - t0,
        lineage={"input": [f"shard={s}" for s in range(shards)]})
    return summary
