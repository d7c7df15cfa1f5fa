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

from ..sources.corpus import (estimate_rollup_keys, read_pages,
                              read_pages_sliced)
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
    # the cascade rebuckets by bucket START — exact only on an aligned
    # ladder (stages/rollup.py:cascade); reject a bad ladder up front
    for (n1, w1), (n2, w2) in zip(tiers, tiers[1:]):
        if w2 % w1:
            raise ValueError(
                f"tier ladder misaligned: {n2} window {w2} is not a "
                f"multiple of {n1} window {w1}")
    # validate up front, next to the ladder check: discovering a missing
    # now_us only AFTER tier 0's full build (hours at 100 TB) wastes the
    # whole read->extract->rollup
    if (horizons and any(v is not None for v in horizons.values())
            and now_us is None):
        raise ValueError("now_us required when horizons are set")
    pool = ThreadPoolExecutor(max_workers=4)
    sink_jobs = []

    # try/finally: a mid-loop failure (e.g. a tier write raising) must not
    # abandon running sink threads — they would keep writing into out_dir
    # during unwinding. Running sinks are awaited, queued ones cancelled;
    # the primary exception still propagates.
    try:
        return _run_tiers(
            tiers, sf_dir, out_dir, summary, pool, sink_jobs, rd,
            snapshots=snapshots, hot_domain_factor=hot_domain_factor,
            n_out=n_out, kernel=kernel, salt=salt, resume=resume,
            compress=compress, downsample=downsample, gap_fill=gap_fill,
            extract=extract, horizons=horizons, now_us=now_us,
            series_ds=series_ds)
    finally:
        pool.shutdown(wait=True, cancel_futures=True)


def _run_tiers(tiers, sf_dir, out_dir, summary, pool, sink_jobs, rd, *,
               snapshots, hot_domain_factor, n_out, kernel, salt, resume,
               compress, downsample, gap_fill, extract, horizons, now_us,
               series_ds):
    summary.setdefault("rebuilt", [])
    prev_ds = None
    for i, (name, window) in enumerate(tiers):
        d = ckpt.tier_dir(out_dir, "tier", name)
        # lineage-checked resume (the sharded.py discipline): a complete
        # manifest is trusted only when every parameter that shapes the
        # tier's ROWS matches this run — and, via the parent manifest's
        # write stamp, only when it was cascaded from the SAME parent
        # data (a tier-0 rebuild invalidates every coarser tier even if
        # their own parameters match: no mixed-provenance output)
        parent = summary["tiers"].get(tiers[i - 1][0]) if i else None
        want = {"input": "corpus" if i == 0 else f"tier={tiers[i-1][0]}",
                "window_us": window, "sf_dir": sf_dir,
                "snapshots": snapshots,
                "hot_domain_factor": hot_domain_factor,
                "extract": extract, "gap_fill": gap_fill,
                "horizon": (horizons or {}).get(name),
                "input_written_at": (parent or {}).get("written_at")}
        tier_resumed = False
        if resume and ckpt.is_complete(d):
            m = ckpt.read_manifest(d)
            have = m.get("lineage", {})
            if all(have.get(k) == v for k, v in want.items()):
                tier_resumed = True
                summary["resumed"].append(name)
                summary["tiers"][name] = m
                from ..sources import read_parquet_clean

                prev_ds = read_parquet_clean(d)
            else:
                # stale parameters or a rebuilt parent: rebuilding is the
                # only output-preserving choice
                summary["rebuilt"].append(name)

        t0 = time.time()
        if tier_resumed:
            tier = None  # tier rows already on disk; sinks repaired below
        elif i == 0 or prev_ds is None:
            if series_ds is None:
                # time-sliced expansion when unskewed: blocks cover few
                # buckets x all docs, so rollup partials collapse in the
                # map and the combine moves ~|keys| rows, not
                # n_blocks x keys (r5: doc-sliced tier0 went superlinear
                # past 80M pages; see read_pages_sliced). Hot-domain skew
                # stays doc-sliced (overlapping k-ranges would duplicate).
                def _pages(cols):
                    if hot_domain_factor == 1:
                        return read_pages_sliced(sf_dir,
                                                 snapshots=snapshots,
                                                 columns=cols)
                    return read_pages(sf_dir, snapshots=snapshots,
                                      hot_domain_factor=hot_domain_factor,
                                      columns=cols)

                if extract:
                    # honest end-to-end: carry html, extract text, derive
                    # series from the EXTRACTED text (byte-identity holds).
                    # Function form (stateless tasks): elastic, no actor-pool
                    # size cap to throttle the widest stage.
                    from ..stages.extract import extract_text_batch

                    pages = _pages(["url", "warc_ts", "html"])
                    pages = pages.map_batches(extract_text_batch,
                                              batch_format="pyarrow")
                    src = derive_series(pages, text_col="extracted_text")
                else:
                    pages = _pages(["url", "warc_ts", "text"])
                    src = derive_series(pages)
                # tight |domains| x |buckets| bound (the pages bound
                # overestimates by orders of magnitude and picks the
                # 2x-slower hashpart merge at toy key counts; a real
                # billion-key space still crosses TREE_MAX_KEYS)
                est = estimate_rollup_keys(
                    sf_dir, window, snapshots=snapshots,
                    hot_domain_factor=hot_domain_factor)
            else:
                src = series_ds
                est = None
            tier = rollup(src, window, salt=salt, est_keys=est)
        else:
            # the coarser tier's key estimate follows the same
            # |domains| x |buckets| metadata bound as tier 0, so a
            # >TREE_MAX_KEYS cascade picks the hash-partitioned merge
            # instead of the tree's single-block funnel
            cas_est = (estimate_rollup_keys(
                sf_dir, window, snapshots=snapshots,
                hot_domain_factor=hot_domain_factor)
                if series_ds is None else None)
            tier = cascade(prev_ds, window, est_keys=cas_est,
                           finer_window_us=tiers[i - 1][1])

        if tier is not None:
            if gap_fill:
                tier = gapfill(tier, window, fill="zero")
            # materialize the FULL tier first: the next tier's cascade must
            # see pre-trim history — a coarser tier with a longer horizon
            # keeps rows the finer tier drops, so trimming before the
            # cascade would silently truncate every later tier to the
            # finest tier's horizon. Storage still holds the trimmed rows
            # (retention IS the disk trim); on resume a later tier
            # therefore cascades from the retained rows only — the same
            # contract as any store whose source tier was already trimmed.
            full = tier.repartition(8).materialize()
            tier = full
            if horizons and horizons.get(name) is not None:
                from ..stages.retention_policy import apply_retention

                if now_us is None:
                    raise ValueError("now_us required when horizons are set")
                tier = apply_retention(full, now_us,
                                       horizons[name]).materialize()

            ckpt.reset_dir(d)
            # coalesce before the sink: tier rows are small; dozens of tiny
            # part files would re-inflate the NEXT tier's block count (and
            # its shuffle overhead). Still >1 file -> a rerun can skip
            # finished partitions. materialize() pins the (small) tier rows
            # so the heavy upstream plan executes exactly once;
            # compress/downsample/cascade feed from memory while the parquet
            # files remain the durable checkpoint for resume.
            tier.write_parquet(d)
            # write_manifest derives rows from the parquet footers and
            # records rows/wall_seconds/rows_per_sec + the SAME lineage
            # dict the resume path compares (`want`), so every recorded
            # key is checked and every checked key is recorded
            summary["tiers"][name] = ckpt.write_manifest(
                d, seconds=time.time() - t0,
                lineage={**want,
                         "series_override": series_ds is not None},
            )
            sink_src = tier       # sinks reflect the STORED (trimmed) rows
            prev_ds = full        # the cascade sees pre-trim history
        else:
            sink_src = prev_ds
        # on resume, prev_ds already reads the tier's parquet; the sink jobs
        # below still run so an interrupted chunk/downsample sink is REPAIRED
        # (each checks its own manifest and no-ops when complete)

        # the chunk and downsample sinks both consume the MATERIALIZED tier
        # and write to independent directories -> run them on driver threads
        # so their (small) executions overlap each other and the next tier's
        # cascade instead of serializing the tail
        tier_written = summary["tiers"][name].get("written_at")

        def _sink_fresh(sd: str, want_sink: dict) -> bool:
            # same lineage discipline as the tiers: a complete sink is
            # reused only when its parameters AND its source tier's
            # write stamp match (a rebuilt tier invalidates its sinks)
            if not (resume and ckpt.is_complete(sd)):
                return False
            have = ckpt.read_manifest(sd).get("lineage", {})
            return all(have.get(k) == v for k, v in want_sink.items())

        def _do_compress(tier_ds=sink_src, tname=name,
                         tier_written=tier_written):
            cd = ckpt.tier_dir(out_dir, "chunks", tname)
            want_sink = {"input": f"tier={tname}",
                         "input_written_at": tier_written}
            if _sink_fresh(cd, want_sink):
                return
            t1 = time.time()
            ckpt.reset_dir(cd)
            value_cols = {"min_y": "i8", "max_y": "i8", "sum_y": "i8",
                          "n": "i8"}
            # canonical per-series chunks: layout independent of block
            # structure -> idempotent chunk store across reruns
            compress_chunks_per_series(tier_ds, value_cols).write_parquet(cd)
            ckpt.write_manifest(cd, seconds=time.time() - t1,
                                lineage=want_sink)

        def _do_downsample(tier_ds=sink_src, tname=name,
                           tier_written=tier_written):
            vd = ckpt.tier_dir(out_dir, "downsample", tname)
            want_sink = {"input": f"tier={tname}", "kernel": kernel,
                         "n_out": n_out, "input_written_at": tier_written}
            if _sink_fresh(vd, want_sink):
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
            ckpt.write_manifest(vd, seconds=time.time() - t1,
                                lineage=want_sink)

        if compress:
            sink_jobs.append(pool.submit(_do_compress))
        if downsample:
            sink_jobs.append(pool.submit(_do_downsample))

    for f in sink_jobs:
        f.result()  # propagate sink errors
    return summary
