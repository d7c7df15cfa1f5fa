"""CLI entry point — the module you hand to ``ray job submit``:

    ray job submit -- python -m tsdownsample_ray run \
        --sf-dir /root/testdata/sf0.01 --out /tmp/retention --resume

Subcommands:
    run       full retention pipeline (tiers + chunks + downsamples)
    sharded   shard-level resumable tier-0 build
    query     run one catalog query and print row count + head
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kw = {"address": "local", "include_dashboard": False,
              "logging_level": "ERROR"}
        if num_cpus:
            kw["num_cpus"] = num_cpus
        ray.init(**kw)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    # the same context tuning every other entry point applies: operator
    # reservation off (measured 5x tier-0 starvation on small clusters)
    # and the fsspec http pre-import that fixes the concurrent-import
    # race in overlapped tier sink threads
    from .tuning import tune_data_context

    tune_data_context()


def main(argv=None):
    p = argparse.ArgumentParser(prog="tsdownsample_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    pr = sub.add_parser("run")
    pr.add_argument("--sf-dir", required=True)
    pr.add_argument("--out", required=True)
    pr.add_argument("--snapshots", type=int, default=3)
    pr.add_argument("--resume", action="store_true")
    pr.add_argument("--extract", action="store_true")
    pr.add_argument("--salt", type=int, default=1)
    pr.add_argument("--kernel", default="minmaxlttb")
    pr.add_argument("--n-out", type=int, default=100)

    ps = sub.add_parser("sharded")
    ps.add_argument("--sf-dir", required=True)
    ps.add_argument("--out", required=True)
    ps.add_argument("--snapshots", type=int, default=3)
    ps.add_argument("--shards", type=int, default=4)
    ps.add_argument("--resume", action="store_true")

    pq = sub.add_parser("query")
    pq.add_argument("name")
    pq.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    pq.add_argument("--limit", type=int, default=5)

    a = p.parse_args(argv)
    _ensure_ray(a.num_cpus)

    if a.cmd == "run":
        from tsdownsample_ray.pipelines.retention import run_retention_pipeline

        s = run_retention_pipeline(
            a.sf_dir, a.out, snapshots=a.snapshots, resume=a.resume,
            extract=a.extract, salt=a.salt, kernel=a.kernel, n_out=a.n_out)
        print(json.dumps(s, indent=1, default=str))
    elif a.cmd == "sharded":
        from tsdownsample_ray.pipelines.sharded import run_sharded_tier0

        s = run_sharded_tier0(a.sf_dir, a.out, snapshots=a.snapshots,
                              shards=a.shards, resume=a.resume)
        print(json.dumps(s, indent=1, default=str))
    else:
        from tsdownsample_ray.pipelines.queries import QUERIES

        if a.name not in QUERIES:
            print(f"unknown query {a.name}; have {sorted(QUERIES)}")
            return 2
        res = QUERIES[a.name](a.sf_dir)
        df = res if hasattr(res, "head") else res.to_pandas()
        print(f"{len(df)} rows")
        print(df.head(a.limit).to_string())
    return 0


if __name__ == "__main__":
    sys.exit(main())
