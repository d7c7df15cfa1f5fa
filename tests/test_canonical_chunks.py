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
