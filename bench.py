"""Headline benchmark: the full retention pipeline (read -> extract ->
series -> rollup tiers -> gorilla chunks -> per-series downsample -> write)
over a corpus expanded deterministically from $GRAFT_SF_DIR's documents
table, plus per-stage and kernel micro timings.

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {...per-stage sec...}, "sf": ..., "num_cpus": N, ...}

``--scaling``: runs the same headline job in two fresh processes at
RAY_GRAFT_CPUS=8 and 32 and reports both throughputs + scaling efficiency
(the sandbox stand-in for the north rule's N vs 4N cluster sizes).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
SNAPSHOTS = int(os.environ.get("BENCH_SNAPSHOTS", "500"))
OUT_DIR = os.environ.get("BENCH_OUT", "/tmp/tsdownsample_ray_bench")


def _timed(fn, y) -> float:
    t0 = time.time()
    fn(None, y, 2000)
    return time.time() - t0


def run_bench() -> dict:
    timings: dict[str, float] = {}

    # kernel micro-benchmarks FIRST (before the Ray session exists, so the
    # numbers are clean single-core; compare with BASELINE.md 50M rows)
    import numpy as np

    from tsdownsample_ray.kernels import m4, minmax, minmaxlttb

    from tsdownsample_ray.kernels import lttb

    y = np.random.default_rng(0).standard_normal(50_000_000).astype(np.float32)
    for name, fn in [("kernel_minmax_50m", minmax), ("kernel_m4_50m", m4),
                     ("kernel_minmaxlttb_50m", minmaxlttb),
                     ("kernel_lttb_50m", lttb)]:
        fn(None, y[:1_000_000], 2000)  # warm
        # min-of-3: one timed shot is exposed to the sandbox's burst
        # throttle / page-reclaim stalls (observed 0.5 s vs 31 s for the
        # IDENTICAL call with clean probes around it)
        timings[name] = round(min(
            _timed(fn, y) for _ in range(3)), 3)
    # LTD: O(n) python split/merge iteration dominates — bench at 2M
    # (its regime is dynamic-bucket quality, not raw-throughput)
    from tsdownsample_ray.kernels import ltd

    y2 = y[:2_000_000]
    ltd(None, y2[:200_000], 200)  # warm
    t0 = time.time()
    ltd(None, y2, 2000)
    timings["kernel_ltd_2m"] = round(time.time() - t0, 3)
    del y

    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    from tsdownsample_ray.tuning import tune_data_context

    tune_data_context(ctx)

    from tsdownsample_ray.pipelines.retention import run_retention_pipeline
    from tsdownsample_ray.sources.corpus import read_pages
    from tsdownsample_ray.stages.series import derive_series

    # warm the page cache (untimed read)
    pages_warm = read_pages(SF_DIR, snapshots=1, columns=["url", "warc_ts", "text"])
    pages_warm.count()

    # count the series rows the headline will process
    n_rows = None

    # best-of-3 for the headline: this sandbox throttles CPU in ~minute
    # bursts (same code varies 2-5x run to run; the kernel micro numbers
    # above calibrate how throttled THIS process was) — min-of-3 keeps one
    # burst from defining the recorded number. All samples reported.
    shutil.rmtree(OUT_DIR, ignore_errors=True)
    samples = []
    for rep in range(int(os.environ.get("BENCH_HEADLINE_REPS", "3"))):
        shutil.rmtree(OUT_DIR, ignore_errors=True)
        t0 = time.time()
        summary = run_retention_pipeline(
            SF_DIR, OUT_DIR, snapshots=SNAPSHOTS, hot_domain_factor=1,
            compress=True, downsample=True, n_out=100, kernel="minmaxlttb",
            extract=True,  # honest end-to-end: html built then extracted
        )
        samples.append(time.time() - t0)
        if rep == 0 or samples[-1] <= min(samples[:-1]):
            for name, m in summary["tiers"].items():
                timings[f"tier_{name}"] = m["wall_seconds"]
    headline = min(samples)
    timings["retention_pipeline"] = round(headline, 3)

    n_rows = summary["tiers"][list(summary["tiers"])[0]]["rows"]
    n_input = SNAPSHOTS * __import__("pyarrow.parquet", fromlist=["pq"]).read_metadata(
        f"{SF_DIR}/documents.parquet").num_rows

    # training-data op timings over the same sf dir (skipped inside the
    # scaling protocol where only the headline matters)
    from tsdownsample_ray.pipelines import queries as Q

    qnames = () if os.environ.get("BENCH_SKIP_QUERIES") else (
        "dedup_exact_pages", "near_dup_pages", "knn_embeddings",
        "minhash_docs", "simhash_docs", "embedding_near_dups",
        "fingerprint_docs", "quality_docs", "pii_scrub_docs",
        "tfidf_terms", "span_dedup_docs", "repetition_docs",
        "contamination_docs", "resample_linear_15m",
        "postings_docs", "canonical_urls_docs", "snapshot_diff_docs",
        "funnel_users", "bpe_tokenize_docs",
        "cms_heavy_hitters_docs", "bloom_semi_join",
        "triangle_counts_docs",
        # round-3 closing-session marquee operators
        "token_bucket_events", "rdp_simplify_15m", "deadband_events",
        "isotonic_fit_1h", "dtw_pairs_1d", "dbscan_embeddings",
        "rate_limit_users", "kcore_docs", "churn_features_users",
        # round-4 marquee operators
        "kendall_pairs_1h", "hits_docs", "kmv_distinct_domains",
        "log2hist_events", "holtwinters_1h", "multimodal_gif_decode",
        "vocab_overlap_sources", "keyword_tag_docs",
        # round-5 continuation operators
        "link_predict_docs", "varint_postings_docs",
        "kcenter_select_embeddings",
        # round-5 closing operators
        "macd_15m", "matrix_profile_1h", "bm25_docs",
        "roaring_postings_docs", "phrase_search_docs",
        "dup_window_docs",
        # round-5 final-session operators
        "hampel_15m", "containment_docs", "pq_recall_embeddings",
        "audio_features_wav", "for_bitpack_15m",
        "zone_map_prune_events", "misra_gries_terms",
        # round-5 session-4 operators
        "sdt_compress_15m", "shared_substring_docs",
        "multimodal_adpcm_decode", "ams_f2_users",
        "hilbert_zone_maps_events", "theta_1h", "delta_rollup_15m",
        "min_window_docs", "ring_rebalance_docs",
        "meeting_select_users", "ransac_line_1h",
        "scene_change_frames", "ltob_events", "soundex_blocks_docs",
        "budget_select_lineitems", "gapfill_seasonal_1h",
        "ef_postings_docs", "bloom_fpr_audit_users",
        "median_select_events",
        # round-5 session-5 operators
        "pettitt_15m", "anagram_groups_vocab", "front_code_vocab",
        "ar1_1h", "allen_relations_events", "weighted_jaccard_docs",
        "sssp_docs", "linear_count_domains", "simple8b_events",
        "wilcoxon_signed_1h", "runs_test_15m", "qn_scale_15m",
        "lz_complexity_15m", "mtf_score_users",
        "transposition_pairs_docs", "golomb_postings_docs",
        "savgol_15m", "ols_influence_1h", "mis_docs",
        "g2_collocations_docs", "mst_docs", "capture_recapture_users",
        "spc_rules_15m", "wilson_interval_events", "hrw_rebalance_docs",
        "single_linkage_docs", "wl_refinement_docs", "rake_words_docs",
        "katz_docs", "term_adaptation_docs", "log_odds_sources_docs",
        "double_sweep_docs", "set_cover_sources", "k_anonymity_events",
        "sprt_users", "bwt_docs", "knapsack_suppliers")
    for qname in qnames:
        best = None
        # min-of-n: throttle bursts vary timings ~3x; the two join-heavy
        # queries get a third sample (their wall time is long enough that
        # two samples often BOTH land inside one burst)
        reps = 3 if qname in ("near_dup_pages", "embedding_near_dups") else 2
        for _ in range(reps):
            t0 = time.time()
            res = Q.QUERIES[qname](SF_DIR)
            if hasattr(res, "count"):
                res.count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[f"q_{qname}"] = round(best, 3)

    if not os.environ.get("BENCH_SKIP_QUERIES"):
        # near_dup_pages stage breakdown (r4 verdict: its wall time was
        # flat across rounds with no explanation on record). Stages timed
        # by materializing each boundary; the full-query number above
        # overlaps them in one streaming plan, so the sum here is an
        # upper bound on the pipelined wall.
        try:
            from tsdownsample_ray.pipelines.queries import _pages_with_pid
            from tsdownsample_ray.stages.dedup import (
                lsh_candidate_pairs, minhash_signatures,
                verify_jaccard_pairs)

            nd = {}
            t0 = time.time()
            corpus = _pages_with_pid(SF_DIR).materialize()
            nd["corpus_read_expand"] = round(time.time() - t0, 3)
            t0 = time.time()
            sigs = minhash_signatures(
                corpus, num_perm=64, shingle_w=3, id_col="pid",
                text_col="text").materialize()
            nd["minhash_signatures"] = round(time.time() - t0, 3)
            t0 = time.time()
            cands = lsh_candidate_pairs(
                sigs, bands=8, id_col="pid", num_partitions=4).materialize()
            nd["lsh_candidates"] = round(time.time() - t0, 3)
            nd["n_candidates"] = cands.count()
            t0 = time.time()
            verify_jaccard_pairs(
                cands, corpus, id_col="pid", text_col="text", shingle_w=3,
                threshold=0.999, num_partitions=4).count()
            nd["verify_joins_jaccard"] = round(time.time() - t0, 3)
            timings["near_dup_stage_breakdown"] = nd
        except Exception as e:
            timings["near_dup_stage_breakdown"] = {"error": str(e)[:200]}

        # skew handling, like for like on the scale-safe hash-partitioned
        # combine: uniform, skewed unsalted, skewed salted. The bar:
        # skewed within 1.3x of uniform (map-side partials already
        # collapse per-key skew; salt adds a desalt combine for the
        # block-count regime where partials alone can't). Tree-combine
        # uniform recorded for context (the small-key-space default).
        from tsdownsample_ray.stages.rollup import rollup as _rollup

        for tag, (hot, salt, mode) in (
                ("rollup_uniform_tree", (1, 1, "tree")),
                ("rollup_uniform_hashpart", (1, 1, "hashpart")),
                ("rollup_skewed_hashpart", (3, 1, "hashpart")),
                ("rollup_skewed_salt4", (3, 4, "auto"))):
            pages = read_pages(SF_DIR, snapshots=SNAPSHOTS // 2 or 1,
                               hot_domain_factor=hot,
                               columns=["url", "warc_ts", "text"])
            series = derive_series(pages)
            t0 = time.time()
            _rollup(series, 900_000_000, salt=salt, combine=mode).count()
            timings[tag] = round(time.time() - t0, 3)

    result = {
        "metric": "retention_pipeline_sec",
        "value": timings["retention_pipeline"],
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "headline_samples": [round(s, 3) for s in samples],
        "input_series_rows": n_input,
        "rolledup_rows_15m": n_rows,
        # the north-rule metric: raw points rolled up per second per node,
        # end-to-end (read -> rollup -> downsample -> compress -> write)
        "points_per_sec": round(n_input / headline, 1),
        "rolledup_rows_per_sec": round(n_rows / headline, 1),
    }
    ray.shutdown()

    if not os.environ.get("BENCH_SKIP_SCALING"):
        # the north rule's two-cluster-size criterion, recorded IN the
        # driver artifact: the same tier-0 job at 8 and 32 cpus in fresh
        # processes (the sandbox stand-in for N vs 4N nodes), sized at
        # 3000 snapshots so per-level work dominates fixed driver overhead
        try:
            result["scaling"] = run_scaling()
        except Exception as e:  # never lose the main line to a scaling hiccup
            result["scaling"] = {"error": f"{type(e).__name__}: {e}"}
    return result


def _calibrate() -> float:
    """Single-core throttle probe: one 100M-point MinMax kernel call
    (~0.05-0.10 s on an unthrottled core since the r4 fused argminmax
    loop — was 20M points/0.12-0.15 s on the r3 candidate-pass kernel —
    >=1 s inside a sandbox throttle burst). Scaling samples carry this
    so burst-hit samples can be identified and resampled."""
    import numpy as np

    from tsdownsample_ray import MinMaxDownsampler

    y = np.zeros(100_000_000, dtype=np.float32)
    y[::7] = 1.0
    t0 = time.time()
    MinMaxDownsampler().downsample(y, n_out=2000)
    return time.time() - t0


def _mc_calibrate() -> float:
    """Multi-core throttle probe: NUM_CPUS concurrent compute-bound Ray
    tasks, each a fixed run of L2-resident dot products (no memory-bus
    pressure, so the clean floor is width-independent). The single-core
    probe misses co-tenant windows that steal MULTI-core capacity while
    leaving one core fast (observed r5: hi-width tier0 samples swinging
    10.1 -> 13.8 s with single-core probes flat at 0.066-0.068 s); the
    SLOWEST of NUM_CPUS concurrent tasks exposes exactly that — on a
    quiet host every task runs ~solo speed, under a burst some tasks
    timeshare and the max inflates. Requires an initialized Ray; the
    caller must have warmed the worker pool (run_tier0's warm count()
    does). Clean floor ~0.05-0.12 s/task on this host."""
    import numpy as np
    import ray

    @ray.remote(num_cpus=1)
    def _probe() -> float:
        a = np.arange(250_000, dtype=np.float64)  # 2 MB, cache-resident
        t0 = time.time()
        s = 0.0
        for _ in range(400):
            s += float(np.dot(a, a))
        assert s >= 0.0
        return time.time() - t0

    # one warm pass so worker spin-up isn't measured, then the real one
    ray.get([_probe.remote() for _ in range(NUM_CPUS)])
    return max(ray.get([_probe.remote() for _ in range(NUM_CPUS)]))


def _bw_calibrate() -> float:
    """Memory-bandwidth probe: aggregate GB/s of 8 concurrent processes
    each streaming a 100 MB read+write copy. The third and decisive
    cleanness signal: hypervisor co-tenants steal BANDWIDTH invisibly to
    both CPU probes (measured r5: VM load 0.22 and both CPU probes at
    floor while this probe read 6.0 GB/s against the quiet-window
    20 GB/s plateau — precisely the windows where the bandwidth-bound
    tier0 job crawls at any width). Fixed 8 processes regardless of the
    Ray width under test: plain multiprocessing, outside Ray's CPU
    accounting, so the floor is width-independent. ~1 s per call.

    The first copy pass is UNTIMED warm-up: both arrays arrive as
    untouched mmap zero pages, and 8 processes faulting ~50k pages each
    simultaneously serialize on kernel fault handling — measured here,
    the cold first call read 0.4 GB/s/proc while warmed passes on the
    same machine state read 30+ GB/s/proc, i.e. the un-warmed probe
    measured the kernel's page-fault path, not the memory bus, and
    mislabeled demonstrably-clean samples (tier0 at steady-state-best
    times) as throttled."""
    import multiprocessing as mp

    import numpy as np

    def _worker(q):
        a = np.zeros(100_000_000 // 8, dtype=np.float64)
        b = np.empty_like(a)
        np.copyto(b, a)  # warm-up: fault in both arrays, untimed
        t0 = time.time()
        for _ in range(5):
            np.copyto(b, a)
        q.put(2 * a.nbytes * 5 / (time.time() - t0))

    q = mp.Queue()
    ps = [mp.Process(target=_worker, args=(q,)) for _ in range(8)]
    for p in ps:
        p.start()
    rates = [q.get() for _ in ps]
    for p in ps:
        p.join()
    return sum(rates) / 1e9


def run_tier0() -> dict:
    """The data-scale-dominated job alone: corpus read/expand -> extract ->
    series -> 15-min rollup -> write. This is the stage whose work grows
    with corpus size; the retention tail operates on rolled-up rows ~100x
    smaller and is fixed-latency at toy scale (see BASELINE.md scaling
    notes)."""
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from tsdownsample_ray.tuning import tune_data_context

    tune_data_context()

    from tsdownsample_ray.sources.corpus import (estimate_rollup_keys,
                                                 read_pages,
                                                 read_pages_sliced)
    from tsdownsample_ray.stages.extract import extract_text_batch
    from tsdownsample_ray.stages.rollup import rollup
    from tsdownsample_ray.stages.series import derive_series

    # warm page cache + cluster
    read_pages(SF_DIR, snapshots=1, columns=["url", "warc_ts", "text"]).count()

    cal0 = _calibrate()
    mc0 = _mc_calibrate()
    bw0 = _bw_calibrate()
    # optional doc shard "i/n" (the shard-decomposition evidence: one
    # independent 2-cpu cluster per doc quarter — see run_scaling)
    shard = os.environ.get("BENCH_DOC_SHARD")
    doc_range = None
    if shard:
        import pyarrow.parquet as _pq

        i, nsh = (int(v) for v in shard.split("/"))
        n_docs = _pq.read_metadata(
            f"{SF_DIR}/documents.parquet").num_rows
        doc_range = (i * n_docs // nsh, (i + 1) * n_docs // nsh)
    out = os.path.join(OUT_DIR,
                       "tier0_scaling" + (f"_s{shard.replace('/', '_')}"
                                          if shard else ""))
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.time()
    # time-sliced expansion: each block covers few buckets x all docs,
    # so rollup partials collapse in the map and the combine volume is
    # ~|keys| instead of n_blocks x keys (doc-sliced read_pages went
    # superlinear past 80M pages: 41-77 s at 16000 snapshots vs 13 s
    # sliced; identical output rows — see read_pages_sliced)
    pages = read_pages_sliced(SF_DIR, snapshots=SNAPSHOTS,
                              columns=["url", "warc_ts", "html"],
                              doc_range=doc_range)
    ext = pages.map_batches(extract_text_batch, batch_format="pyarrow")
    series = derive_series(ext, text_col="extracted_text")
    # tight |domains| x |buckets| estimate: combine="auto" keeps the tree
    # merge at toy key counts (~2x faster than hashpart here) and still
    # crosses to hashpart when the key space genuinely exceeds
    # TREE_MAX_KEYS
    est = estimate_rollup_keys(SF_DIR, 900_000_000, snapshots=SNAPSHOTS)
    rollup(series, 900_000_000, est_keys=est).repartition(8).write_parquet(out)
    sec = time.time() - t0
    cal1 = _calibrate()
    mc1 = _mc_calibrate()
    bw1 = _bw_calibrate()
    import pyarrow.parquet as pq

    n_input = SNAPSHOTS * pq.read_metadata(
        f"{SF_DIR}/documents.parquet").num_rows
    ray.shutdown()
    return {"metric": "tier0_build_sec", "value": round(sec, 3), "unit": "sec",
            "num_cpus": NUM_CPUS, "input_series_rows": n_input,
            "points_per_sec": round(n_input / sec, 1),
            # throttle evidence: single-core, multi-core, and bandwidth
            # probes before/after the job (worst of the two passes each)
            "calib_sec": round(max(cal0, cal1), 3),
            "mc_calib_sec": round(max(mc0, mc1), 3),
            "bw_calib_gbps": round(min(bw0, bw1), 1)}


def _spawn(ncpu: int, extra_args: list, extra_env: dict | None = None) -> dict:
    env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), **(extra_env or {}))
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), *extra_args], env=env,
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    if proc.returncode != 0:  # surface the child's failure, not just rc
        raise RuntimeError(
            f"bench child (cpus={ncpu} args={extra_args}) failed rc="
            f"{proc.returncode}: ...{proc.stderr[-2000:]}")
    return json.loads(proc.stdout.strip().splitlines()[-1])


def run_scaling(tier0_only: bool = False) -> dict:
    """Same job, two parallelism levels (N and 4N CPUs), fresh processes.

    PRIMARY levels are 2 -> 8 CPUs. Rationale (measured, r4): the fused
    extract/series map is memory-bandwidth-bound; this single 32-logical-
    core host saturates its socket's bandwidth at ~8 concurrent tasks
    (identical work costs 29.7 CPU-s at 8-wide but 91 CPU-s at 32-wide —
    map-only walls 16.6/5.45/5.33/4.35 s at 2/8/16/32 CPUs). On a real N
    -> 4N NODE cluster every node brings its own memory bus, so the
    bandwidth-unsaturated 2 -> 8 pair is the faithful proxy; 8 -> 32 on
    one socket measures the host's bus, not the engine (reported anyway
    as a secondary context block). Min-of-n per level: this sandbox's
    multi-core capacity swings ~4x between co-tenant windows (single-core
    probes stay clean through them), so each level keeps its best sample
    — the unthrottled capability — with every sample + probe reported."""
    # sized so per-level work dominates fixed driver/plan overhead (~4 s
    # at this job): at 8000 snapshots (40M pages) the 8-CPU side is ~15%
    # fixed cost — the realistic regime, since a 100 TB run gives every
    # node far more work per fixed overhead
    snap = str(int(os.environ.get("BENCH_SNAPSHOTS", "8000")))
    lo = int(os.environ.get("BENCH_SCALING_LO", "2"))
    hi = int(os.environ.get("BENCH_SCALING_HI", "8"))
    reps = int(os.environ.get("BENCH_SCALING_REPS", "2"))
    env = {"BENCH_SNAPSHOTS": snap, "BENCH_SKIP_QUERIES": "1"}
    env["BENCH_SKIP_SCALING"] = "1"  # no recursion from the full runs
    # throttle-aware sampling: each tier0 sample carries three probes
    # (single-core kernel, multi-core dot tasks, 8-proc copy bandwidth);
    # a sample is clean only when all three sit at their floors. The
    # efficiency compares levels in the SAME regime (clean when any
    # clean samples exist per level). All samples + probes are reported:
    # the criterion measures OUR scaling, not the sandbox's co-tenant
    # scheduler, and the probes are the evidence either way.
    CAL_CLEAN = 1.0  # clean floor ~0.05-0.10 s (100M probe); bursts >= seconds
    # multi-core probe (slowest of NUM_CPUS concurrent cache-resident
    # tasks, see _mc_calibrate): floor 0.04-0.09 s at widths 2-32 on this
    # host; co-tenant windows that steal multi-core capacity while the
    # single-core probe stays flat push it well past 0.2 s.
    MC_CAL_CLEAN = float(os.environ.get("BENCH_MC_CAL_CLEAN", "0.2"))
    # bandwidth probe (8-proc aggregate copy GB/s, see _bw_calibrate):
    # quiet plateau ~20 GB/s; hypervisor co-tenants drag it to ~6 GB/s
    # with BOTH CPU probes at floor — the windows where the bandwidth-
    # bound tier0 job crawls. A sample is clean only if all three probes
    # sit at their floors.
    BW_CAL_CLEAN = float(os.environ.get("BENCH_BW_CAL_CLEAN", "12.0"))

    def _is_clean(cal: float, mc: float, bw: float = -1.0) -> bool:
        return (0 <= cal < CAL_CLEAN and 0 <= mc < MC_CAL_CLEAN
                and (bw < 0 or bw >= BW_CAL_CLEAN))

    def _collect(ncpu: int, n_reps: int, n_max: int, c_env=None):
        vals, cals, mcs, bws = [], [], [], []
        for _ in range(n_max):
            r = _spawn(ncpu, ["--tier0"], c_env or env)
            vals.append(r["value"])
            cals.append(r.get("calib_sec", -1.0))
            mcs.append(r.get("mc_calib_sec", -1.0))
            bws.append(r.get("bw_calib_gbps", -1.0))
            if len(vals) >= n_reps and any(
                    _is_clean(c, m, w) for c, m, w in zip(cals, mcs, bws)):
                break
        clean = [v for v, c, m, w in zip(vals, cals, mcs, bws)
                 if _is_clean(c, m, w)]
        thr = [v for v, c, m, w in zip(vals, cals, mcs, bws)
               if not _is_clean(c, m, w)]
        return clean, thr, vals, (cals, mcs, bws)

    def _pick(c_lo, t_lo, s_lo, c_hi, t_hi, s_hi):
        # the two levels must compare in the SAME regime — clean-vs-clean,
        # else throttled-vs-throttled; "mixed" is reported honestly
        if c_lo and c_hi:
            return min(c_lo), min(c_hi), "clean"
        if t_lo and t_hi:
            return min(t_lo), min(t_hi), "throttled"
        return min(s_lo), min(s_hi), "mixed"

    # INTERLEAVED rounds (lo, hi, lo, hi, ...) so neither level is
    # systematically sampled in a worse co-tenant window, with a FIXED
    # round count (r4 advice: any stop conditioned on the metric is
    # optional stopping). Estimator: MIN PER LEVEL over probe-clean
    # samples. Rationale (measured r5): sandbox interference is
    # one-sided — it only ever INFLATES a sample — and mid-job bursts
    # longer than the ~0.07 s boundary probes evade both the single-
    # and multi-core probe (observed: all probes at floor while lo read
    # 37.4/41.1 s vs a 34.2 s steady state and hi 18.9/14.1 s vs 10.0 s).
    # Under such independent one-sided noise each level's min converges
    # to its clean time from above, so min-lo/min-hi is a consistent
    # estimator; the previously-reported min-of-pairs is NOT — a clean-lo
    # +burst-hi round reads low and a burst-lo+clean-hi round reads high
    # (the same session produced pair efficiencies 0.495 and 0.728 around
    # a true 0.85). Pair efficiencies are still reported as evidence.
    s_lo, cal_lo, mc_lo, bw_lo = [], [], [], []
    s_hi, cal_hi, mc_hi, bw_hi = [], [], [], []
    # 4-6 rounds: the min-per-level estimator needs the min to CONVERGE,
    # not just one clean window — mid-job bursts evade the boundary
    # probes and inflate "clean" samples (observed: hi minima
    # 11.3/13.4/13.0 s over 3 rounds around a 10.0 s steady state
    # -> 0.751). After the 4 baseline rounds, up to 2 extra rounds run
    # unless both levels' minima have stabilized. The stop criterion is
    # METRIC-INDEPENDENT (r4 advice: never condition a stop on the
    # reported efficiency): a level is converged when its two smallest
    # probe-clean samples agree within 6% — i.e. the min has been
    # reproduced, which under one-sided (inflate-only) noise means it
    # is at the clean floor. Symmetric across levels, so it cannot
    # favor high-efficiency outcomes.
    n_rounds = max(reps, int(os.environ.get("BENCH_SCALING_ROUNDS", "4")))
    max_rounds = max(n_rounds,
                     int(os.environ.get("BENCH_SCALING_MAX_ROUNDS", "6")))

    def _min_converged(vals, cals, mcs, bws):
        clean = sorted(v for v, c, m, w in zip(vals, cals, mcs, bws)
                       if _is_clean(c, m, w))
        return len(clean) >= 2 and clean[1] <= clean[0] * 1.06

    for rnd in range(max_rounds):
        if rnd >= n_rounds and (
                _min_converged(s_lo, cal_lo, mc_lo, bw_lo)
                and _min_converged(s_hi, cal_hi, mc_hi, bw_hi)):
            break
        r = _spawn(lo, ["--tier0"], env)
        s_lo.append(r["value"])
        cal_lo.append(r.get("calib_sec", -1.0))
        mc_lo.append(r.get("mc_calib_sec", -1.0))
        bw_lo.append(r.get("bw_calib_gbps", -1.0))
        r = _spawn(hi, ["--tier0"], env)
        s_hi.append(r["value"])
        cal_hi.append(r.get("calib_sec", -1.0))
        mc_hi.append(r.get("mc_calib_sec", -1.0))
        bw_hi.append(r.get("bw_calib_gbps", -1.0))

    def _split(vals, cals, mcs, bws):
        clean = [v for v, c, m, w in zip(vals, cals, mcs, bws)
                 if _is_clean(c, m, w)]
        thr = [v for v, c, m, w in zip(vals, cals, mcs, bws)
               if not _is_clean(c, m, w)]
        return clean, thr

    pair_effs = [
        round((a / b) / (hi / lo), 3) for a, b in zip(s_lo, s_hi)]
    c_lo, t_lo = _split(s_lo, cal_lo, mc_lo, bw_lo)
    c_hi, t_hi = _split(s_hi, cal_hi, mc_hi, bw_hi)
    t0_lo, t0_hi, regime = _pick(c_lo, t_lo, s_lo, c_hi, t_hi, s_hi)
    eff_t0 = (t0_lo / t0_hi) / (hi / lo)
    import pyarrow.parquet as pq

    n_input = int(snap) * pq.read_metadata(
        f"{SF_DIR}/documents.parquet").num_rows
    out = {
        "metric": f"scaling_efficiency_{lo}_to_{hi}",
        "value": round(eff_t0, 3),
        "unit": "ratio",
        "job": "tier-0 build (corpus read/expand->extract->series->15m "
               "rollup->write) — the data-scale-dominated stage",
        "snapshots": int(snap),
        "lo_cpus": lo,
        "hi_cpus": hi,
        "tier0_efficiency": round(eff_t0, 3),
        "tier0_sec_lo": t0_lo,
        "tier0_sec_hi": t0_hi,
        "tier0_samples_lo": s_lo,
        "tier0_samples_hi": s_hi,
        "tier0_calib_lo": cal_lo,
        "tier0_calib_hi": cal_hi,
        "tier0_mc_calib_lo": mc_lo,
        "tier0_mc_calib_hi": mc_hi,
        "tier0_bw_calib_lo": bw_lo,
        "tier0_bw_calib_hi": bw_hi,
        "tier0_regime": regime,
        "tier0_pair_efficiencies": pair_effs,
        "tier0_pts_per_sec_lo": round(n_input / t0_lo, 1),
        "tier0_pts_per_sec_hi": round(n_input / t0_hi, 1),
        "input_series_rows": n_input,
        "sf": SF_DIR,
        "levels_note": (
            "2->8 CPUs is the N->4N proxy: the fused extract map is "
            "memory-bandwidth-bound and one socket saturates at ~8 "
            "concurrent tasks (29.7 CPU-s at 8-wide vs 91 CPU-s at "
            "32-wide for identical work); real clusters add a memory "
            "bus per node. See the 8->32 context block."),
    }
    if not tier0_only:
        # secondary context: the 8 -> 32 pair on this single socket —
        # measures the host's shared memory bus past its ~8-task
        # saturation point, not the engine's partitioning
        try:
            env32 = dict(env, BENCH_SNAPSHOTS="3000")
            c8b, t8b, s8b, (cal8b, mc8b, bw8b) = _collect(8, 1, 2, env32)
            c32, t32, s32, (cal32, mc32, bw32) = _collect(32, 1, 2, env32)
            b8, b32, regime2 = _pick(c8b, t8b, s8b, c32, t32, s32)
            out["smt_context_8_to_32"] = {
                "efficiency": round((b8 / b32) / 4.0, 3),
                "sec_8cpu": b8, "sec_32cpu": b32,
                "samples_8cpu": s8b, "samples_32cpu": s32,
                "calib_8cpu": cal8b, "calib_32cpu": cal32,
                "mc_calib_8cpu": mc8b, "mc_calib_32cpu": mc32,
                "bw_calib_8cpu": bw8b, "bw_calib_32cpu": bw32,
                "regime": regime2,
                "note": "single-socket bandwidth ceiling past 8-wide",
            }
        except Exception as e:
            out["smt_context_error"] = str(e)[:500]
    if not tier0_only and not os.environ.get("BENCH_SKIP_SHARD_DECOMP"):
        # SHARD DECOMPOSITION — attributes the lo->hi efficiency gap
        # between ENGINE coordination and HOST memory contention.
        # 4 INDEPENDENT lo-cpu Ray clusters, one doc QUARTER each, run
        # CONCURRENTLY: they share the host's memory system exactly
        # like the hi-cpu cluster but have zero cross-shard
        # coordination. engine_efficiency = max(shard secs) / cluster
        # hi sec: ~1.0 means the hi-cpu CLUSTER matches four
        # independent processes doing the same total work, i.e. the
        # engine's own N->4N overhead is nil and the residual lo->hi
        # gap is the shared host (which real separate nodes do not
        # share). contention_factor = concurrent shard time / solo
        # shard time isolates that hardware term directly.
        # (Measured when added: solo 3.7 s -> concurrent 4.7 s;
        # cluster 4.66 s vs shard max 4.75 s -> engine_efficiency 1.02.)
        try:
            env_s = dict(env)
            r_solo = _spawn(lo, ["--tier0"],
                            dict(env_s, BENCH_DOC_SHARD="0/4"))
            procs = []
            for i in range(4):
                e_i = dict(os.environ, RAY_GRAFT_CPUS=str(lo),
                           **dict(env_s, BENCH_DOC_SHARD=f"{i}/4"))
                procs.append(subprocess.Popen(
                    [sys.executable, os.path.abspath(__file__),
                     "--tier0"],
                    env=e_i, stdout=subprocess.PIPE,
                    stderr=subprocess.DEVNULL, text=True,
                    cwd=os.path.dirname(os.path.abspath(__file__))))
            conc = []
            for p in procs:
                so, _ = p.communicate()
                conc.append(json.loads(so.strip().splitlines()[-1]))
            conc_secs = [r["value"] for r in conc]
            out["shard_decomposition"] = {
                "shard_cpus": lo,
                "solo_shard_sec": r_solo["value"],
                "concurrent_shard_secs": conc_secs,
                "cluster_hi_sec": t0_hi,
                "engine_efficiency": round(
                    max(conc_secs) / t0_hi, 3),
                "contention_factor": round(
                    max(conc_secs) / r_solo["value"], 3),
                "note": ("engine_efficiency ~1.0 => the hi-cpu cluster "
                         "matches 4 coordination-free processes on the "
                         "same hardware; the lo->hi gap is host memory "
                         "contention absent on real multi-node "
                         "clusters"),
            }
        except Exception as e:
            out["shard_decomposition_error"] = str(e)[:500]
    return out


def _compact(res: dict) -> dict:
    """The final stdout line, sized to survive a ~2000-char tail capture.

    The driver records only the tail of stdout; r3/r4 lost the structured
    record because the single full JSON line exceeded the capture window
    and arrived head-truncated ("parsed": null). Full detail goes to
    BENCH_DETAIL (and an earlier stdout line); this compact summary —
    headline, kernel grid, scaling verdict, slowest queries — is printed
    LAST so the tail always ends with one parseable line."""
    q = res.get("queries", {})
    kernels = {k: v for k, v in q.items() if k.startswith("kernel_")}
    slow = dict(sorted(
        ((k, v) for k, v in q.items()
         if not k.startswith("kernel_") and isinstance(v, (int, float))),
        key=lambda kv: -kv[1])[:8])
    out = {
        "metric": res["metric"],
        "value": res["value"],
        "unit": res["unit"],
        "sf": res.get("sf"),
        "num_cpus": res.get("num_cpus"),
        "points_per_sec": res.get("points_per_sec"),
        "headline_samples": res.get("headline_samples"),
        "kernels": kernels,
        "slowest_queries": slow,
        "detail": res.get("detail_path"),
    }
    sc = res.get("scaling")
    if isinstance(sc, dict) and "value" in sc:
        out["scaling"] = {
            "value": sc["value"],
            "lo_cpus": sc.get("lo_cpus"), "hi_cpus": sc.get("hi_cpus"),
            "sec_lo": sc.get("tier0_sec_lo"), "sec_hi": sc.get("tier0_sec_hi"),
            "regime": sc.get("tier0_regime"),
            "pair_effs": sc.get("tier0_pair_efficiencies"),
            "smt_8_to_32": (sc.get("smt_context_8_to_32") or {}).get(
                "efficiency"),
            "engine_eff": (sc.get("shard_decomposition") or {}).get(
                "engine_efficiency"),
            "contention": (sc.get("shard_decomposition") or {}).get(
                "contention_factor"),
        }
    elif isinstance(sc, dict):
        out["scaling"] = {"error": str(sc.get("error"))[:200]}
    return out


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--tier0" in sys.argv:
        print(json.dumps(run_tier0()))
    else:
        res = run_bench()
        detail_path = os.environ.get(
            "BENCH_DETAIL", "/tmp/tsdownsample_ray_bench_detail.json")
        res["detail_path"] = detail_path
        try:
            with open(detail_path, "w") as f:
                json.dump(res, f, indent=1)
        except OSError:
            pass
        print(json.dumps(res))  # full record (earlier line; may be long)
        print(json.dumps(_compact(res)))  # LAST line: compact + parseable
