"""Per-tier checkpoint manifests with partition lineage + metrics.

Layout (SURVEY.md §2.4 checkpoint/resume row):

    out_dir/
      tier=15m/  part-*.parquet          # the tier's rollup rows
      tier=15m/_MANIFEST.json            # written AFTER the data, atomically
      chunks=15m/ ...                    # compressed chunk rows
      downsample=15m/ ...                # per-series visualization points

A tier is COMPLETE iff its manifest exists and says so; resume skips
complete tiers and re-reads their parquet as the next tier's input, so a
killed run re-does only unfinished tiers (writes are idempotent: each tier
directory is wiped before a fresh attempt). The manifest records lineage
(input tier, window, per-file row counts) and metrics (rows, wall seconds)
— the ``ray job submit`` resumability story of the north rule, minus the
cluster.
"""

from __future__ import annotations

import json
import os
import shutil
import time

__all__ = ["tier_dir", "is_complete", "write_manifest", "read_manifest",
           "reset_dir"]

MANIFEST = "_MANIFEST.json"


def tier_dir(out_dir: str, kind: str, name: str) -> str:
    return os.path.join(out_dir, f"{kind}={name}")


def is_complete(d: str) -> bool:
    p = os.path.join(d, MANIFEST)
    if not os.path.exists(p):
        return False
    try:
        with open(p) as f:
            m = json.load(f)
    except (json.JSONDecodeError, OSError):
        return False
    if not m.get("complete"):
        return False
    # a surviving manifest over a partially-lost directory (interrupted
    # copy, disk cleanup) must NOT pass: a consumer reading the directory
    # would silently resume truncated data
    return all(os.path.exists(os.path.join(d, f))
               for f in m.get("partitions", {}))


def read_manifest(d: str) -> dict:
    with open(os.path.join(d, MANIFEST)) as f:
        return json.load(f)


def reset_dir(d: str) -> None:
    if os.path.exists(d):
        shutil.rmtree(d)
    os.makedirs(d, exist_ok=True)


def write_manifest(d: str, *, rows: int = -1, seconds: float,
                   lineage: dict) -> dict:
    files = sorted(
        f for f in os.listdir(d) if f.endswith(".parquet")
    )
    import pyarrow.parquet as pq

    per_file = {f: pq.read_metadata(os.path.join(d, f)).num_rows for f in files}
    if rows < 0:  # derive from footers — no extra Dataset pass
        rows = sum(per_file.values())
    m = {
        "complete": True,
        "rows": rows,
        "wall_seconds": round(seconds, 3),
        "rows_per_sec": round(rows / seconds, 1) if seconds > 0 else None,
        "written_at": time.time(),
        "lineage": lineage,
        "partitions": per_file,
    }
    tmp = os.path.join(d, MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(m, f, indent=1)
    os.replace(tmp, os.path.join(d, MANIFEST))  # atomic publish
    return m
