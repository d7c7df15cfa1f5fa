"""Canonical chunking: chunk rows are a pure function of the data,
invariant to input partitioning and row order."""

import numpy as np
import pandas as pd
import pyarrow as pa


def test_chunk_layout_invariant_to_partitioning(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.compress import compress_chunks_per_series

    rng = np.random.default_rng(13)
    n = 5000
    df = pd.DataFrame({
        "series_id": np.repeat([f"s{i}" for i in range(4)], n // 4),
        "bucket": np.tile(np.arange(n // 4, dtype=np.int64) * 900, 4),
        "min_y": rng.integers(0, 100, n),
        "max_y": rng.integers(100, 200, n),
        "sum_y": rng.integers(0, 10_000, n),
        "n": rng.integers(1, 50, n),
    })
    cols = {"min_y": "i8", "max_y": "i8", "sum_y": "i8", "n": "i8"}

    outs = []
    for nparts in (2, 11):
        shuffled = df.sample(frac=1.0, random_state=nparts)
        ds = rd.from_pandas(shuffled).repartition(nparts)
        out = compress_chunks_per_series(ds, cols, chunk_size=256).to_pandas()
        outs.append(out.sort_values(["series_id", "start_bucket"])
                    .reset_index(drop=True))
    # byte-identical chunk rows regardless of blocks/order
    pd.testing.assert_frame_equal(outs[0], outs[1])
    assert (outs[0]["n_points"] <= 256).all()
    # 1250 points per series -> ceil(1250/256) = 5 chunks each
    assert len(outs[0]) == 4 * 5


def test_compact_chunks_reduces_and_roundtrips(ray_session):
    """Many 8-point chunks -> one 4096-point chunk per series, points
    byte-identical after decode; re-compaction is idempotent."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from tsdownsample_ray.stages.compress import (
        ChunkDecompressor, compact_chunks, compress_chunks_per_series)

    cols = {"min_y": "i8", "max_y": "i8", "sum_y": "i8", "n": "i8",
            "mean_y": "f8"}
    rng = np.random.default_rng(2)
    rows = 300
    t = pa.table({
        "series_id": ["s" + str(i % 3) for i in range(rows)],
        "bucket": [(i // 3) * 900 for i in range(rows)],
        "min_y": rng.integers(0, 100, rows), "max_y": rng.integers(100, 200, rows),
        "sum_y": rng.integers(0, 10**6, rows), "n": rng.integers(1, 50, rows),
        "mean_y": rng.standard_normal(rows),
    })
    small = compress_chunks_per_series(rd.from_arrow(t).repartition(4),
                                       cols, chunk_size=8)
    n_small = small.count()
    compacted = compact_chunks(small, cols, chunk_size=4096,
                               num_partitions=2).materialize()
    n_comp = compacted.count()
    assert n_comp == 3 < n_small  # one chunk per series now
    dec = ChunkDecompressor(cols)
    got = pa.concat_tables([dec(b) for b in
                            compacted.iter_batches(batch_format="pyarrow")])
    gp = got.to_pandas().sort_values(["series_id", "bucket"]).reset_index(
        drop=True)
    ep = t.to_pandas().sort_values(["series_id", "bucket"]).reset_index(
        drop=True)
    for c in ("min_y", "max_y", "sum_y", "n", "mean_y", "bucket"):
        assert (gp[c].to_numpy() == ep[c].to_numpy()).all(), c
    # idempotence: compacting the compacted store is byte-identical
    again = compact_chunks(compacted, cols, chunk_size=4096,
                           num_partitions=2).to_pandas()
    first = compacted.to_pandas()
    a = again.sort_values(["series_id", "start_bucket"]).reset_index(drop=True)
    f = first.sort_values(["series_id", "start_bucket"]).reset_index(drop=True)
    assert a.equals(f)
