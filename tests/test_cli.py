"""CLI smoke via a real subprocess (own Ray session, like ray job submit)."""

import json
import subprocess
import sys


def test_cli_query_subprocess(tmp_path):
    out = subprocess.run(
        [sys.executable, "-m", "tsdownsample_ray", "--num-cpus", "2",
         "query", "token_count_docs", "--sf-dir", "/root/testdata/sf0.001",
         "--limit", "2"],
        capture_output=True, text=True, timeout=240, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "500 rows" in out.stdout


def test_cli_sharded_run_subprocess(tmp_path):
    d = str(tmp_path / "cli_sharded")
    out = subprocess.run(
        [sys.executable, "-m", "tsdownsample_ray", "--num-cpus", "2",
         "sharded", "--sf-dir", "/root/testdata/sf0.001", "--out", d,
         "--snapshots", "2", "--shards", "2"],
        capture_output=True, text=True, timeout=240, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    payload = json.loads(out.stdout[out.stdout.index("{"):])
    assert payload["tier"]["complete"]
