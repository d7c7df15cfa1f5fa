"""Shard-level kill-and-resume: a run killed mid-tier skips completed
shards on resume and the final tier equals the unsharded rollup."""

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def test_sharded_tier0_kill_and_resume(ray_session, tmp_path):
    import ray.data as rd

    from tsdownsample_ray.pipelines.sharded import run_sharded_tier0
    from tsdownsample_ray.sources.corpus import read_pages
    from tsdownsample_ray.stages.rollup import rollup
    from tsdownsample_ray.stages.series import derive_series
    from tsdownsample_ray.state import checkpoint as ckpt

    out = str(tmp_path / "sharded")

    # killed after shard 1 (shards 0 and 1 complete, 2 and 3 missing)
    with pytest.raises(RuntimeError, match="injected failure"):
        run_sharded_tier0(SF, out, snapshots=2, shards=4, fail_after_shard=1)
    assert ckpt.is_complete(ckpt.tier_dir(out, "shard", "0"))
    assert ckpt.is_complete(ckpt.tier_dir(out, "shard", "1"))
    assert not ckpt.is_complete(ckpt.tier_dir(out, "shard", "2"))

    # resume: shards 0,1 skipped; 2,3 computed; final combine runs
    s = run_sharded_tier0(SF, out, snapshots=2, shards=4, resume=True)
    assert s["resumed"] == [0, 1]
    assert s["tier"]["complete"]

    # result equals the unsharded rollup exactly
    got = rd.read_parquet(ckpt.tier_dir(out, "tier", "sharded0")).to_pandas()
    direct = rollup(
        derive_series(read_pages(SF, snapshots=2,
                                 columns=["url", "warc_ts", "text"])),
        900 * 1_000_000).to_pandas()
    key = ["series_id", "bucket"]
    got = got.sort_values(key).reset_index(drop=True)[direct.columns]
    direct = direct.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, direct)


def test_sharded_resume_rejects_stale_layout(ray_session, tmp_path):
    """Round-5 regression: resuming under a DIFFERENT shard layout (or
    snapshots/window) must rebuild mismatched shards, not trust them — the
    old code skipped any complete shard dir, silently dropping the doc
    ranges the new layout assigned differently."""
    import ray.data as rd

    from tsdownsample_ray.pipelines.sharded import run_sharded_tier0
    from tsdownsample_ray.sources.corpus import read_pages
    from tsdownsample_ray.stages.rollup import rollup
    from tsdownsample_ray.stages.series import derive_series
    from tsdownsample_ray.state import checkpoint as ckpt

    out = str(tmp_path / "relayout")
    # full run at shards=4, then resume at shards=2: every shard dir 0/1
    # exists and is complete, but records the 4-way doc ranges
    run_sharded_tier0(SF, out, snapshots=2, shards=4)
    s = run_sharded_tier0(SF, out, snapshots=2, shards=2, resume=True)
    assert s["resumed"] == [] or s["resumed"] == ["tier"]  # nothing trusted
    assert 0 in s["rebuilt"] and 1 in s["rebuilt"]

    got = rd.read_parquet(ckpt.tier_dir(out, "tier", "sharded0")).to_pandas()
    direct = rollup(
        derive_series(read_pages(SF, snapshots=2,
                                 columns=["url", "warc_ts", "text"])),
        900 * 1_000_000).to_pandas()
    key = ["series_id", "bucket"]
    got = got.sort_values(key).reset_index(drop=True)[direct.columns]
    direct = direct.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, direct)


def test_sharded_resume_skips_final_combine(ray_session, tmp_path):
    from tsdownsample_ray.pipelines.sharded import run_sharded_tier0

    out = str(tmp_path / "noop")
    run_sharded_tier0(SF, out, snapshots=2, shards=2)
    s = run_sharded_tier0(SF, out, snapshots=2, shards=2, resume=True)
    assert s["resumed"] == [0, 1, "tier"]
    assert s["rebuilt"] == []
    assert s["tier"]["complete"]
