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
SNAPSHOTS = int(os.environ.get("BENCH_SNAPSHOTS", "200"))
OUT_DIR = os.environ.get("BENCH_OUT", "/tmp/tsdownsample_ray_bench")


def run_bench() -> dict:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from tsdownsample_ray.pipelines.retention import run_retention_pipeline
    from tsdownsample_ray.sources.corpus import read_pages
    from tsdownsample_ray.stages.series import derive_series

    timings: dict[str, float] = {}

    # warm the page cache (untimed read)
    pages_warm = read_pages(SF_DIR, snapshots=1, columns=["url", "warc_ts", "text"])
    pages_warm.count()

    # count the series rows the headline will process
    n_rows = None

    shutil.rmtree(OUT_DIR, ignore_errors=True)
    t0 = time.time()
    summary = run_retention_pipeline(
        SF_DIR, OUT_DIR, snapshots=SNAPSHOTS, hot_domain_factor=1,
        compress=True, downsample=True, n_out=100, kernel="minmaxlttb",
    )
    headline = time.time() - t0
    timings["retention_pipeline"] = round(headline, 3)
    for name, m in summary["tiers"].items():
        timings[f"tier_{name}"] = m["wall_seconds"]

    # stage timing: rollup only (the wide shuffle)
    from tsdownsample_ray.stages.rollup import rollup

    t0 = time.time()
    series = derive_series(
        read_pages(SF_DIR, snapshots=SNAPSHOTS, columns=["url", "warc_ts", "text"]))
    n_rows = rollup(series, 900_000_000).count()  # rows OUT; forces full run
    timings["rollup_15m_only"] = round(time.time() - t0, 3)

    t0 = time.time()
    n_input = derive_series(
        read_pages(SF_DIR, snapshots=SNAPSHOTS, columns=["url", "warc_ts", "text"])
    ).count()
    timings["series_derive_only"] = round(time.time() - t0, 3)

    # kernel micro-benchmarks (single core, compare with BASELINE.md 50M rows)
    import numpy as np

    from tsdownsample_ray.kernels import m4, minmax, minmaxlttb

    y = np.random.default_rng(0).standard_normal(50_000_000).astype(np.float32)
    for name, fn in [("kernel_minmax_50m", minmax), ("kernel_m4_50m", m4),
                     ("kernel_minmaxlttb_50m", minmaxlttb)]:
        t0 = time.time()
        fn(None, y, 2000)
        timings[name] = round(time.time() - t0, 3)

    result = {
        "metric": "retention_pipeline_sec",
        "value": timings["retention_pipeline"],
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "input_series_rows": n_input,
        "rolledup_rows_15m": n_rows,
        "points_per_sec": round(n_input / headline, 1),
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = one(8), one(32)
    eff = (lo["value"] / hi["value"]) / (32 / 8)
    return {
        "metric": "scaling_efficiency_8_to_32",
        "value": round(eff, 3),
        "unit": "ratio",
        "sec_8cpu": lo["value"],
        "sec_32cpu": hi["value"],
        "pts_per_sec_8cpu": lo["points_per_sec"],
        "pts_per_sec_32cpu": hi["points_per_sec"],
        "sf": SF_DIR,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
