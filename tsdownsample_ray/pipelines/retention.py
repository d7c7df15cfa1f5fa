"""The full retention pipeline: pages -> extract -> series -> cascading
rollup tiers -> per-tier Gorilla chunks + visualization downsamples, with
per-tier checkpoint manifests and resume.

This is the end-to-end job of the north rule (read -> rollup -> downsample
-> compress -> write). Every tier is written to its own parquet prefix and
each later tier READS the previous tier's parquet (not the raw corpus), so
a resumed run touches raw data only if tier 0 is incomplete — and the tier
cascade is exact (associative (min,max,sum,count) merges, rollup.py).
"""

from __future__ import annotations

import time
from concurrent.futures import ThreadPoolExecutor

from ..sources.corpus import estimate_rollup_keys, read_pages
from ..stages.compress import compress_chunks_per_series
from ..stages.downsample import downsample_dataset
from ..stages.gapfill import gapfill
from ..stages.rollup import cascade, finalize_mean, rollup
from ..stages.series import derive_series
from ..state import checkpoint as ckpt

US = 1_000_000
DEFAULT_TIERS = (("15m", 900 * US), ("1h", 3600 * US), ("1d", 86400 * US))

__all__ = ["run_retention_pipeline", "DEFAULT_TIERS"]


def _rd():
    import ray.data as rd

    return rd


def run_retention_pipeline(
    sf_dir: str,
    out_dir: str,
    *,
    snapshots: int = 3,
    hot_domain_factor: int = 1,
    tiers=DEFAULT_TIERS,
    n_out: int = 100,
    kernel: str = "minmaxlttb",
    salt: int = 1,
    resume: bool = False,
    compress: bool = True,
    downsample: bool = True,
    gap_fill: bool = False,
    extract: bool = False,
    horizons: dict | None = None,
    now_us: int | None = None,
    series_ds=None,
) -> dict:
    """Run (or resume) all tiers; returns a summary dict with per-tier
    metrics. ``series_ds`` overrides the corpus-derived series input."""
    rd = _rd()
    summary = {"tiers": {}, "resumed": [], "out_dir": out_dir}
    pool = ThreadPoolExecutor(max_workers=4)
    sink_jobs = []

    prev_ds = None
    for i, (name, window) in enumerate(tiers):
        d = ckpt.tier_dir(out_dir, "tier", name)
        tier_resumed = resume and ckpt.is_complete(d)
        if tier_resumed:
            summary["resumed"].append(name)
            summary["tiers"][name] = ckpt.read_manifest(d)
            from ..sources import read_parquet_clean

            prev_ds = read_parquet_clean(d)

        t0 = time.time()
        if tier_resumed:
            tier = None  # tier rows already on disk; sinks repaired below
        elif i == 0 or prev_ds is None:
            if series_ds is None:
                if extract:
                    # honest end-to-end: carry html, extract text, derive
                    # series from the EXTRACTED text (byte-identity holds).
                    # Function form (stateless tasks): elastic, no actor-pool
                    # size cap to throttle the widest stage.
                    from ..stages.extract import extract_text_batch

                    pages = read_pages(sf_dir, snapshots=snapshots,
                                       hot_domain_factor=hot_domain_factor,
                                       columns=["url", "warc_ts", "html"])
                    pages = pages.map_batches(extract_text_batch,
                                              batch_format="pyarrow")
                    src = derive_series(pages, text_col="extracted_text")
                else:
                    pages = read_pages(sf_dir, snapshots=snapshots,
                                       hot_domain_factor=hot_domain_factor,
                                       columns=["url", "warc_ts", "text"])
                    src = derive_series(pages)
                # tight |domains| x |buckets| bound (the pages bound
                # overestimates by orders of magnitude and picks the
                # 2x-slower hashpart merge at toy key counts; a real
                # billion-key space still crosses TREE_MAX_KEYS)
                est = estimate_rollup_keys(sf_dir, window,
                                           snapshots=snapshots)
            else:
                src = series_ds
                est = None
            tier = rollup(src, window, salt=salt, est_keys=est)
        else:
            tier = cascade(prev_ds, window)

        if tier is not None:
            if gap_fill:
                tier = gapfill(tier, window, fill="zero")
            if horizons and horizons.get(name) is not None:
                from ..stages.retention_policy import apply_retention

                if now_us is None:
                    raise ValueError("now_us required when horizons are set")
                tier = apply_retention(tier, now_us, horizons[name])

            ckpt.reset_dir(d)
            # coalesce before the sink: tier rows are small; dozens of tiny
            # part files would re-inflate the NEXT tier's block count (and
            # its shuffle overhead). Still >1 file -> a rerun can skip
            # finished partitions. materialize() pins the (small) tier rows
            # so the heavy upstream plan executes exactly once;
            # compress/downsample/cascade feed from memory while the parquet
            # files remain the durable checkpoint for resume.
            tier = tier.repartition(8).materialize()
            tier.write_parquet(d)
            # write_manifest derives rows from the parquet footers and
            # records rows/wall_seconds/rows_per_sec + per-file lineage
            summary["tiers"][name] = ckpt.write_manifest(
                d, rows=-1, seconds=time.time() - t0,
                lineage={"input": "corpus" if i == 0
                         else f"tier={tiers[i-1][0]}",
                         "window_us": window, "sf_dir": sf_dir,
                         "snapshots": snapshots},
            )
            prev_ds = tier
        # on resume, prev_ds already reads the tier's parquet; the sink jobs
        # below still run so an interrupted chunk/downsample sink is REPAIRED
        # (each checks its own manifest and no-ops when complete)

        # the chunk and downsample sinks both consume the MATERIALIZED tier
        # and write to independent directories -> run them on driver threads
        # so their (small) executions overlap each other and the next tier's
        # cascade instead of serializing the tail
        def _do_compress(tier_ds=prev_ds, tname=name):
            cd = ckpt.tier_dir(out_dir, "chunks", tname)
            if resume and ckpt.is_complete(cd):
                return
            t1 = time.time()
            ckpt.reset_dir(cd)
            value_cols = {"min_y": "i8", "max_y": "i8", "sum_y": "i8",
                          "n": "i8"}
            # canonical per-series chunks: layout independent of block
            # structure -> idempotent chunk store across reruns
            compress_chunks_per_series(tier_ds, value_cols).write_parquet(cd)
            ckpt.write_manifest(cd, rows=-1, seconds=time.time() - t1,
                                lineage={"input": f"tier={tname}"})

        def _do_downsample(tier_ds=prev_ds, tname=name):
            vd = ckpt.tier_dir(out_dir, "downsample", tname)
            if resume and ckpt.is_complete(vd):
                return
            t1 = time.time()
            ckpt.reset_dir(vd)
            # drop gap rows (n == 0): the kernels represent gaps natively by
            # empty x-bins (reference README.md:99) — a zero-filled mean_y
            # would instead be downsampled as real data
            import pyarrow.compute as _pc

            real = tier_ds.map_batches(
                lambda b: b.filter(_pc.greater(b["n"], 0)),
                batch_format="pyarrow")
            viz = downsample_dataset(
                finalize_mean(real), kernel=kernel, n_out=n_out,
                x_col="bucket", y_col="mean_y")
            viz.write_parquet(vd)
            ckpt.write_manifest(vd, rows=-1, seconds=time.time() - t1,
                                lineage={"input": f"tier={tname}",
                                         "kernel": kernel, "n_out": n_out})

        if compress:
            sink_jobs.append(pool.submit(_do_compress))
        if downsample:
            sink_jobs.append(pool.submit(_do_downsample))

    for f in sink_jobs:
        f.result()  # propagate sink errors
    pool.shutdown()
    return summary
