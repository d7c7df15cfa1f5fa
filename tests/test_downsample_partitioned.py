"""Explicit hash-partitioned downsampling == per-series map_groups."""

import numpy as np
import pandas as pd
import pytest


@pytest.mark.parametrize("kernel", ["minmax", "minmaxlttb", "m4", "everynth"])
def test_partitioned_equals_per_series(ray_session, kernel):
    import ray.data as rd

    from tsdownsample_ray.stages.downsample import (
        downsample_dataset,
        downsample_partitioned,
    )

    rng = np.random.default_rng(33)
    frames = []
    for s in range(23):  # more series than partitions in one case below
        n = int(rng.integers(500, 3000))
        frames.append(pd.DataFrame({
            "series_id": f"srs{s}",
            "x": np.arange(n, dtype=np.int64) * 1000,
            "y": rng.standard_normal(n),
        }))
    df = pd.concat(frames, ignore_index=True).sample(frac=1.0, random_state=1)
    ds = rd.from_pandas(df).repartition(6)

    a = downsample_dataset(ds, kernel=kernel, n_out=96).to_pandas()
    for nparts in (4, 64):
        b = downsample_partitioned(ds, kernel=kernel, n_out=96,
                                   num_partitions=nparts).to_pandas()
        key = ["series_id", "x"]
        aa = a.sort_values(key).reset_index(drop=True)
        bb = b.sort_values(key).reset_index(drop=True)[aa.columns]
        pd.testing.assert_frame_equal(aa, bb)
