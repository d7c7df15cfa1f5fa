"""Dataset-level tests: distributed result == single-node NumPy oracle,
extraction byte-identity, gap-fill, chunk compression in-pipeline, and
checkpoint/resume. (Ray via the session-scoped fixture.)"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from tsdownsample_ray.kernels import KERNELS

SF = "/root/testdata/sf0.001"


def _make_series_dataset(rng, n_series=6, n=5000):
    """Long-format multi-series frame with shuffled row order."""
    frames = []
    for s in range(n_series):
        x = np.arange(n, dtype=np.int64) * 1000
        if s % 3 == 1:
            x[n // 2:] += 5_000_000  # gap
        y = rng.standard_normal(n)
        if s % 3 == 2:
            y[::7] = np.nan
        frames.append(pd.DataFrame(
            {"series_id": f"s{s}", "x": x, "y": y}))
    df = pd.concat(frames, ignore_index=True)
    return df.sample(frac=1.0, random_state=0).reset_index(drop=True)


@pytest.mark.parametrize("kernel,n_out", [
    ("minmax", 100), ("nanminmax", 100), ("m4", 100), ("nanm4", 100),
    ("lttb", 100), ("minmaxlttb", 100), ("nanminmaxlttb", 100),
    ("everynth", 100),
])
def test_distributed_equals_oracle(ray_session, kernel, n_out):
    import ray.data as rd

    from tsdownsample_ray.stages.downsample import downsample_dataset

    rng = np.random.default_rng(42)
    df = _make_series_dataset(rng)
    ds = rd.from_pandas(df).repartition(7)  # scatter series across blocks
    out = downsample_dataset(ds, kernel=kernel, n_out=n_out,
                             x_col="x", y_col="y").to_pandas()

    kern = KERNELS[kernel]
    for sid, g in df.groupby("series_id"):
        g = g.sort_values("x", kind="stable")
        idx = kern(g["x"].to_numpy(), g["y"].to_numpy(), n_out)
        expected = g.iloc[idx.astype(np.intp)]
        got = out[out.series_id == sid]
        assert len(got) == len(expected), sid
        assert np.array_equal(got["x"].to_numpy(), expected["x"].to_numpy()), sid
        assert np.array_equal(
            got["y"].to_numpy(), expected["y"].to_numpy(), equal_nan=True), sid


def test_extraction_byte_identity(ray_session):
    from tsdownsample_ray.sources.corpus import read_pages
    from tsdownsample_ray.stages.extract import HtmlTextExtractor

    pages = read_pages(SF, snapshots=2)
    ext = pages.map_batches(HtmlTextExtractor, batch_format="pyarrow",
                            concurrency=1)
    bad = ext.map_batches(
        lambda b: b.filter(pc.invert(pc.equal(b["text"], b["extracted_text"]))),
        batch_format="pyarrow")
    assert bad.count() == 0


def test_gapfill_inserts_gap_rows(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.gapfill import gapfill

    # series with buckets 0, 10, 40 at window 10 -> gaps at 20, 30
    t = pa.table({
        "series_id": ["a", "a", "a", "b"],
        "bucket": [0, 10, 40, 100],
        "min_y": [1, 2, 3, 9], "max_y": [1, 2, 3, 9],
        "sum_y": [1, 2, 3, 9], "n": [1, 1, 1, 1],
    })
    out = gapfill(rd.from_arrow(t), 10).to_pandas().sort_values(
        ["series_id", "bucket"]).reset_index(drop=True)
    a = out[out.series_id == "a"]
    assert list(a["bucket"]) == [0, 10, 20, 30, 40]
    assert list(a["is_gap"]) == [False, False, True, True, False]
    assert list(a["n"]) == [1, 1, 0, 0, 1]
    assert list(a["sum_y"]) == [1, 2, 0, 0, 3]
    # ffill variant carries values forward
    out2 = gapfill(rd.from_arrow(t), 10, fill="ffill").to_pandas()
    a2 = out2[out2.series_id == "a"].sort_values("bucket")
    assert list(a2["sum_y"]) == [1, 2, 2, 2, 3]


def test_chunk_compressor_roundtrip_stage(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.compress import ChunkCompressor, ChunkDecompressor

    rng = np.random.default_rng(3)
    n = 3000
    t = pa.table({
        "series_id": np.repeat([f"s{i}" for i in range(3)], n // 3),
        "bucket": np.tile(np.arange(n // 3, dtype=np.int64) * 900, 3),
        "min_y": rng.integers(0, 100, n), "max_y": rng.integers(100, 200, n),
        "sum_y": rng.integers(0, 10_000, n), "n": rng.integers(1, 50, n),
        "mean_y": rng.standard_normal(n),
    })
    ds = rd.from_arrow(t)
    comp = ds.map_batches(ChunkCompressor(), batch_format="pyarrow")
    back = comp.map_batches(ChunkDecompressor(), batch_format="pyarrow").to_pandas()
    orig = t.to_pandas().sort_values(["series_id", "bucket"]).reset_index(drop=True)
    back = back.sort_values(["series_id", "bucket"]).reset_index(drop=True)
    for c in ["min_y", "max_y", "sum_y", "n"]:
        assert np.array_equal(orig[c].to_numpy(), back[c].to_numpy()), c
    assert np.array_equal(orig["mean_y"].to_numpy(), back["mean_y"].to_numpy())
    # chunks must actually be smaller than raw
    raw_bytes = n * 8 * 6
    comp_bytes = sum(
        len(v) for b in comp.to_pandas().itertuples()
        for v in (b.ts_blob, b.blob_min_y, b.blob_max_y, b.blob_sum_y, b.blob_n,
                  b.blob_mean_y))
    assert comp_bytes < raw_bytes


def test_retention_pipeline_resume(ray_session, tmp_path):
    from tsdownsample_ray.pipelines.retention import run_retention_pipeline
    from tsdownsample_ray.state import checkpoint as ckpt

    out = str(tmp_path / "retention")
    tiers = (("15m", 900_000_000), ("1h", 3_600_000_000))
    # first run: only tier 0 completes ("killed" before tier 1)
    s1 = run_retention_pipeline(SF, out, tiers=tiers[:1], snapshots=2,
                                compress=True, downsample=True)
    assert s1["tiers"]["15m"]["complete"]
    assert ckpt.is_complete(ckpt.tier_dir(out, "tier", "15m"))

    # resumed run: tier 0 skipped, tier 1 computed from tier 0's parquet
    s2 = run_retention_pipeline(SF, out, tiers=tiers, snapshots=2,
                                resume=True, compress=True, downsample=True)
    assert s2["resumed"] == ["15m"]
    assert s2["tiers"]["1h"]["complete"]
    assert s2["tiers"]["1h"]["lineage"]["input"] == "tier=15m"

    # tier1 rows must equal a direct 1h rollup (cascade exactness)
    import ray.data as rd

    t1 = rd.read_parquet(ckpt.tier_dir(out, "tier", "1h")).to_pandas()
    from tsdownsample_ray.sources.corpus import read_pages
    from tsdownsample_ray.stages.rollup import rollup
    from tsdownsample_ray.stages.series import derive_series

    direct = rollup(
        derive_series(read_pages(SF, snapshots=2,
                                 columns=["url", "warc_ts", "text"])),
        3_600_000_000).to_pandas()
    key = ["series_id", "bucket"]
    t1 = t1.sort_values(key).reset_index(drop=True)[direct.columns]
    direct = direct.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(t1, direct)


def test_resume_repairs_interrupted_sinks(ray_session, tmp_path):
    """A tier whose chunk/downsample sink was interrupted (manifest missing)
    must be repaired on resume even though the tier itself is complete."""
    import shutil

    from tsdownsample_ray.pipelines.retention import run_retention_pipeline
    from tsdownsample_ray.state import checkpoint as ckpt

    out = str(tmp_path / "repair")
    tiers = (("15m", 900_000_000),)
    run_retention_pipeline(SF, out, tiers=tiers, snapshots=2,
                           compress=True, downsample=True)
    cd = ckpt.tier_dir(out, "chunks", "15m")
    assert ckpt.is_complete(cd)
    shutil.rmtree(cd)  # simulate a sink killed mid-write (no manifest)

    s = run_retention_pipeline(SF, out, tiers=tiers, snapshots=2,
                               resume=True, compress=True, downsample=True)
    assert s["resumed"] == ["15m"]        # tier rows NOT recomputed
    assert ckpt.is_complete(cd)           # but the sink was rebuilt
    import ray.data as rd

    assert rd.read_parquet(cd).count() > 0


def test_entry_smoke(ray_session):
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as em

    res = em.entry()
    df = res.to_pandas()
    assert len(df) > 0
    assert "series_id" in df.columns


def test_resume_rejects_stale_parameters(ray_session, tmp_path):
    """A complete tier built under different parameters (snapshots) must
    be REBUILT on resume, not silently reused (lineage-checked resume —
    the sharded.py discipline applied at tier level)."""
    from tsdownsample_ray.pipelines.retention import run_retention_pipeline
    from tsdownsample_ray.state import checkpoint as ckpt

    out = str(tmp_path / "stale")
    tiers = (("15m", 900_000_000),)
    run_retention_pipeline(SF, out, tiers=tiers, snapshots=2,
                           compress=False, downsample=False)
    s = run_retention_pipeline(SF, out, tiers=tiers, snapshots=3,
                               resume=True, compress=False,
                               downsample=False)
    assert s["resumed"] == []
    assert "15m" in s["rebuilt"]
    # and the rebuilt tier reflects the NEW parameter
    import ray.data as rd

    from tsdownsample_ray.sources.corpus import read_pages
    from tsdownsample_ray.stages.rollup import rollup
    from tsdownsample_ray.stages.series import derive_series

    got = rd.read_parquet(ckpt.tier_dir(out, "tier", "15m")).count()
    want = rollup(
        derive_series(read_pages(SF, snapshots=3,
                                 columns=["url", "warc_ts", "text"])),
        900_000_000).count()
    assert got == want


def test_is_complete_detects_missing_partition(ray_session, tmp_path):
    """A manifest that survives while a part file is lost must fail
    is_complete — resuming the directory would silently truncate."""
    import os

    from tsdownsample_ray.pipelines.retention import run_retention_pipeline
    from tsdownsample_ray.state import checkpoint as ckpt

    out = str(tmp_path / "lost")
    run_retention_pipeline(SF, out, tiers=(("15m", 900_000_000),),
                           snapshots=2, compress=False, downsample=False)
    d = ckpt.tier_dir(out, "tier", "15m")
    assert ckpt.is_complete(d)
    victim = next(f for f in sorted(os.listdir(d))
                  if f.endswith(".parquet"))
    os.remove(os.path.join(d, victim))
    assert not ckpt.is_complete(d)
