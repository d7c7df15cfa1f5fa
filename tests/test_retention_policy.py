"""Retention policy + partition-count invariance + timestamp-x plumbing."""

import pytest
import numpy as np
import pandas as pd
import pyarrow as pa


def test_apply_retention(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.retention_policy import apply_retention

    t = pa.table({"series_id": ["a"] * 4, "bucket": [0, 100, 200, 300],
                  "n": [1, 2, 3, 4]})
    out = apply_retention(rd.from_arrow(t), now_us=350, horizon_us=200).to_pandas()
    assert sorted(out["bucket"]) == [200, 300]
    # horizon None = keep everything
    out2 = apply_retention(rd.from_arrow(t), now_us=350, horizon_us=None).to_pandas()
    assert len(out2) == 4


def test_pipeline_horizons(ray_session, tmp_path):
    import ray.data as rd

    from tsdownsample_ray.pipelines.retention import run_retention_pipeline
    from tsdownsample_ray.sources.corpus import BASE_EPOCH_S
    from tsdownsample_ray.state import checkpoint as ckpt

    out = str(tmp_path / "ret")
    now = (BASE_EPOCH_S + 6 * 3600) * 1_000_000
    s = run_retention_pipeline(
        "/root/testdata/sf0.001", out, snapshots=2,
        tiers=(("15m", 900_000_000),), compress=False, downsample=False,
        horizons={"15m": 2 * 3600 * 1_000_000}, now_us=now)
    t = rd.read_parquet(ckpt.tier_dir(out, "tier", "15m")).to_pandas()
    assert (t["bucket"] >= now - 2 * 3600 * 1_000_000).all()
    assert s["tiers"]["15m"]["complete"]


def test_all_features_pipeline(ray_session, tmp_path):
    """Every retention feature at once: extraction, gap-fill, horizons,
    salting, compression, downsampling — runs end to end and resumes."""
    import ray.data as rd

    from tsdownsample_ray.pipelines.retention import run_retention_pipeline
    from tsdownsample_ray.sources.corpus import BASE_EPOCH_S
    from tsdownsample_ray.state import checkpoint as ckpt

    out = str(tmp_path / "full")
    now = (BASE_EPOCH_S + 10 * 3600) * 1_000_000
    kw = dict(
        snapshots=2, hot_domain_factor=3, extract=True, gap_fill=True,
        salt=2, horizons={"15m": 8 * 3600 * 1_000_000}, now_us=now,
        tiers=(("15m", 900_000_000), ("1h", 3_600_000_000)),
        compress=True, downsample=True,
    )
    s1 = run_retention_pipeline("/root/testdata/sf0.001", out, **kw)
    for tier in ("15m", "1h"):
        assert s1["tiers"][tier]["complete"]
        for kind in ("tier", "chunks", "downsample"):
            assert ckpt.is_complete(ckpt.tier_dir(out, kind, tier)), (kind, tier)
    t = rd.read_parquet(ckpt.tier_dir(out, "tier", "15m")).to_pandas()
    assert (t["bucket"] >= now - 8 * 3600 * 1_000_000).all()  # horizon held
    assert "is_gap" in t.columns  # gap-fill rows present

    s2 = run_retention_pipeline("/root/testdata/sf0.001", out, resume=True, **kw)
    assert s2["resumed"] == ["15m", "1h"]  # nothing recomputed


def test_gapfill_does_not_poison_cascade(ray_session, tmp_path):
    """Zero-filled gap rows (n=0) must NOT flow into the coarser tier's
    min/max, and the downsample sink must never see an n=0 mean (NaN)."""
    import ray.data as rd

    from tsdownsample_ray.pipelines.retention import run_retention_pipeline
    from tsdownsample_ray.state import checkpoint as ckpt

    tiers = (("15m", 900_000_000), ("1h", 3_600_000_000))
    kw = dict(snapshots=2, compress=False, downsample=True, n_out=8)
    a = str(tmp_path / "gap")
    b = str(tmp_path / "nogap")
    run_retention_pipeline("/root/testdata/sf0.001", a, gap_fill=True,
                           tiers=tiers, **kw)
    run_retention_pipeline("/root/testdata/sf0.001", b, gap_fill=False,
                           tiers=tiers, **kw)

    cols = ["series_id", "bucket", "min_y", "max_y", "sum_y", "n"]
    for tier in ("15m", "1h"):
        ta = (rd.read_parquet(ckpt.tier_dir(a, "tier", tier)).to_pandas())
        tb = (rd.read_parquet(ckpt.tier_dir(b, "tier", tier)).to_pandas())
        ta = ta[ta["n"] > 0][cols]  # real rows only
        ta = ta.sort_values(cols[:2]).reset_index(drop=True)
        tb = tb[cols].sort_values(cols[:2]).reset_index(drop=True)
        pd.testing.assert_frame_equal(ta, tb)  # gap rows changed nothing

        da = (rd.read_parquet(ckpt.tier_dir(a, "downsample", tier))
              .to_pandas())
        db = (rd.read_parquet(ckpt.tier_dir(b, "downsample", tier))
              .to_pandas())
        assert not da["mean_y"].isna().any()
        dcols = ["series_id", "bucket", "mean_y"]
        pd.testing.assert_frame_equal(
            da[dcols].sort_values(dcols[:2]).reset_index(drop=True),
            db[dcols].sort_values(dcols[:2]).reset_index(drop=True))


def test_downsample_invariant_to_partitioning(ray_session):
    """The distributed-parallelism analog of the reference's
    parallel==sequential equivalence (test_tsdownsample.py:129-145)."""
    import ray.data as rd

    from tsdownsample_ray.stages.downsample import downsample_dataset

    rng = np.random.default_rng(21)
    df = pd.DataFrame({
        "series_id": np.repeat([f"s{i}" for i in range(5)], 2000),
        "x": np.tile(np.arange(2000, dtype=np.int64), 5),
        "y": rng.standard_normal(10_000),
    })
    outs = []
    for nparts in (1, 3, 16):
        ds = rd.from_pandas(df.sample(frac=1.0, random_state=nparts)
                            ).repartition(nparts)
        out = downsample_dataset(ds, kernel="minmaxlttb", n_out=100,
                                 x_col="x", y_col="y").to_pandas()
        outs.append(out.sort_values(["series_id", "x"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])
    pd.testing.assert_frame_equal(outs[0], outs[2])


def test_downsample_with_timestamp_x(ray_session):
    """x as a real Arrow timestamp column: datetime64 view -> int64 in the
    kernel (downsampling_interface.py:205-213 analog) end to end."""
    import ray.data as rd

    from tsdownsample_ray.kernels import minmax
    from tsdownsample_ray.stages.downsample import downsample_dataset

    n = 3000
    rng = np.random.default_rng(5)
    ts = pa.array((1735689600_000_000 + np.arange(n) * 60_000_000),
                  type=pa.int64()).cast(pa.timestamp("us"))
    y = rng.standard_normal(n)
    t = pa.table({"series_id": ["s"] * n, "x": ts, "y": y})
    out = downsample_dataset(rd.from_arrow(t), kernel="minmax", n_out=40,
                             x_col="x", y_col="y").to_pandas()
    expected_idx = minmax(np.arange(n) * 60_000_000 + 1735689600_000_000, y, 40)
    assert np.array_equal(out["y"].to_numpy(), y[expected_idx.astype(np.intp)])
    assert str(out["x"].dtype).startswith("datetime64")


def test_coarser_tier_keeps_history_beyond_finer_horizon(ray_session, tmp_path):
    """Round-5 regression: the cascade must consume the PRE-trim tier.
    A coarser tier with no (or a longer) horizon keeps history the finer
    tier's horizon drops from storage — trimming before the cascade used
    to silently truncate every later tier to the finest horizon."""
    import ray.data as rd

    from tsdownsample_ray.pipelines.retention import run_retention_pipeline
    from tsdownsample_ray.sources.corpus import BASE_EPOCH_S
    from tsdownsample_ray.state import checkpoint as ckpt

    out = str(tmp_path / "hz")
    now = (BASE_EPOCH_S + 6 * 3600) * 1_000_000
    horizon_15m = 2 * 3600 * 1_000_000
    run_retention_pipeline(
        "/root/testdata/sf0.001", out, snapshots=2,
        tiers=(("15m", 900_000_000), ("1h", 3_600_000_000)),
        compress=False, downsample=False,
        horizons={"15m": horizon_15m}, now_us=now)
    t15 = rd.read_parquet(ckpt.tier_dir(out, "tier", "15m")).to_pandas()
    t1h = rd.read_parquet(ckpt.tier_dir(out, "tier", "1h")).to_pandas()
    # storage honors the 15m horizon...
    assert (t15["bucket"] >= now - horizon_15m).all()
    # ...but the 1h tier (horizon None) retains the full pre-trim span
    assert (t1h["bucket"] < now - horizon_15m).any(), \
        "1h tier lost history older than the 15m horizon"


def test_misaligned_tier_ladder_rejected(ray_session, tmp_path):
    from tsdownsample_ray.pipelines.retention import run_retention_pipeline
    from tsdownsample_ray.stages.rollup import cascade

    with pytest.raises(ValueError, match="misaligned"):
        run_retention_pipeline(
            "/root/testdata/sf0.001", str(tmp_path / "bad"), snapshots=2,
            tiers=(("15m", 900_000_000), ("40m", 2_400_000_000)),
            compress=False, downsample=False)
    with pytest.raises(ValueError, match="not a multiple"):
        cascade(None, 2_400_000_000, finer_window_us=900_000_000)


def test_combine_mode_typo_rejected(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.rollup import rollup

    t = pa.table({"series_id": ["a"] * 4, "x": [0, 1, 2, 3],
                  "y": [1.0, 2.0, 3.0, 4.0]})
    with pytest.raises(ValueError, match="unknown combine mode"):
        rollup(rd.from_arrow(t), 2, combine="treee").materialize()
