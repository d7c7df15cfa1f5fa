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

Resume safety (round-5 review): a shard manifest is only trusted when its
recorded lineage (corpus path, doc range, window, snapshots, corpus doc
count) matches the CURRENT run's parameters — resuming yesterday's
shards=4 layout under shards=2 used to silently drop a quarter of the
corpus. Mismatched shards are rebuilt (reported under
``summary["rebuilt"]``). Coverage is asserted UP FRONT: the shard ranges
partition ``[0, n_docs)``, and the one-column doc_id min/max check below
fails loudly if any doc lives outside that span (a non-dense doc_id
space would otherwise vanish from every shard).
"""

from __future__ import annotations

import time

from ..sources.corpus import estimate_rollup_keys, read_pages
from ..stages.extract import extract_text_batch
# _combine is the rollup module's mode-dispatched merge executor; sharded
# final merges are partial-row merges (not raw series), so rollup() cannot
# serve here. pick_combine supplies the same tree->hashpart escape every
# other combine site uses.
from ..stages.rollup import _combine, pick_combine, rollup
from ..stages.series import derive_series
from ..state import checkpoint as ckpt

__all__ = ["run_sharded_tier0"]


def _shard_lineage(s: int, shards: int, n_docs: int, window_us: int,
                   snapshots: int, sf_dir: str) -> dict:
    # sf_dir is part of the identity: equal n_docs/window/snapshots over
    # a DIFFERENT corpus must not pass the resume check
    return {"input": "corpus", "sf_dir": sf_dir,
            "doc_lo": s * n_docs // shards,
            "doc_hi": (s + 1) * n_docs // shards, "n_docs": n_docs,
            "window_us": window_us, "snapshots": snapshots}


def run_sharded_tier0(sf_dir: str, out_dir: str, *, snapshots: int = 3,
                      shards: int = 4, window_us: int = 900 * 1_000_000,
                      resume: bool = False, fail_after_shard: int = -1) -> dict:
    """Build tier 0 as ``shards`` independently-checkpointed partial runs +
    one final combine. ``fail_after_shard`` injects a crash for the
    kill-and-resume test."""
    import pyarrow.parquet as pq
    import ray.data as rd

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    # coverage invariant: the shard ranges partition [0, n_docs), which
    # covers every row iff doc_id lives in [0, n_docs) — assert it loudly
    # instead of letting out-of-range docs silently vanish from EVERY
    # shard (one |docs|-row int column read, bounded)
    ids = pq.read_table(f"{sf_dir}/documents.parquet",
                        columns=["doc_id"])["doc_id"]
    import pyarrow.compute as pc

    mm = pc.min_max(ids).as_py()
    if mm["min"] < 0 or mm["max"] >= n_docs:
        raise AssertionError(
            f"doc_id range [{mm['min']}, {mm['max']}] escapes [0, "
            f"{n_docs}): the doc_id shard ranges would not cover the "
            "corpus")
    est = estimate_rollup_keys(sf_dir, window_us, snapshots=snapshots)
    summary = {"shards": {}, "resumed": [], "rebuilt": [],
               "out_dir": out_dir}

    for s in range(shards):
        d = ckpt.tier_dir(out_dir, "shard", str(s))
        want = _shard_lineage(s, shards, n_docs, window_us, snapshots,
                              sf_dir)
        if resume and ckpt.is_complete(d):
            m = ckpt.read_manifest(d)  # one parse: lineage + summary
            have = m.get("lineage", {})
            if all(have.get(k) == v for k, v in want.items()):
                summary["resumed"].append(s)
                summary["shards"][s] = m
                continue
            # stale layout/parameters: rebuilding is the only output-
            # preserving choice — merging old-parameter partials with new
            # ones would be silent corruption
            summary["rebuilt"].append(s)
        t0 = time.time()
        # shard pruning at the SOURCE (documents carry doc_id directly):
        # expanding the full corpus and filtering pages afterwards would
        # pay the dominant html/url string-building cost shards times
        pages = read_pages(sf_dir, snapshots=snapshots,
                           columns=["url", "warc_ts", "html"],
                           doc_range=(want["doc_lo"], want["doc_hi"]))
        n_shard_docs = want["doc_hi"] - want["doc_lo"]
        ext = pages.map_batches(extract_text_batch, batch_format="pyarrow")
        series = derive_series(ext, text_col="extracted_text")
        # rollup() resolves combine="auto" from the key estimate — a
        # >TREE_MAX_KEYS shard takes the hash-partitioned merge instead
        # of the tree's single-block funnel. The estimate is PER-SHARD
        # (doc time is doc_id-cadenced, so this shard covers ~1/shards
        # of the buckets): the corpus-wide figure overestimates by
        # ~shards x and would flip small shards onto the ~2x-slower
        # hashpart merge (the exact regression the estimate exists to
        # avoid — see flagship.py)
        shard_est = estimate_rollup_keys(sf_dir, window_us,
                                         snapshots=snapshots,
                                         n_docs_span=n_shard_docs)
        shard_rows = rollup(series, window_us, est_keys=shard_est)
        ckpt.reset_dir(d)
        shard_rows.write_parquet(d)
        summary["shards"][s] = ckpt.write_manifest(
            d, rows=-1, seconds=time.time() - t0,
            lineage={**want, "shard_docs": n_shard_docs})
        if fail_after_shard == s:
            raise RuntimeError(f"injected failure after shard {s}")


    # final combine across shard partials (cheap: shards x |keys| rows).
    # Skipped on resume when nothing was rebuilt and the tier manifest is
    # already complete — re-running would needlessly reset_dir a finished
    # tier (a crash mid-rewrite would wipe it).
    td = ckpt.tier_dir(out_dir, "tier", "sharded0")
    if (resume and not summary["rebuilt"] and ckpt.is_complete(td)
            and len(summary["resumed"]) == shards):
        summary["tier"] = ckpt.read_manifest(td)
        summary["resumed"].append("tier")
        return summary
    t0 = time.time()
    import os

    files = []
    for s in range(shards):
        sd = ckpt.tier_dir(out_dir, "shard", str(s))
        files.extend(os.path.join(sd, f)
                     for f in ckpt.read_manifest(sd)["partitions"])
    all_partials = rd.read_parquet(files)
    mode, _ = pick_combine("auto", 1, est)
    tier = _combine(all_partials, ["series_id", "bucket"], mode=mode,
                    fanin=4, spread=False)
    ckpt.reset_dir(td)
    tier.repartition(4).write_parquet(td)
    summary["tier"] = ckpt.write_manifest(
        td, rows=-1, seconds=time.time() - t0,
        lineage={"input": [f"shard={s}" for s in range(shards)]})
    return summary
