"""Streaming rollup (ordered log -> stateful partition actors) must equal
the batch rollup on the same input, and must emit finalized buckets early
as the watermark advances."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _events(n=20_000, n_series=7, seed=3):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame({
        "series_id": rng.integers(0, n_series, n).astype(str),
        "x": np.sort(rng.integers(0, 10**7, n)) * 1000,  # ts-ordered log
        "y": rng.integers(-50, 50, n),
    })
    return df


def test_streaming_equals_batch(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.rollup import rollup
    from tsdownsample_ray.streaming import StreamingRollup

    df = _events()
    window = 3_600_000_000

    sr = StreamingRollup(window, partitions=3, lateness_us=0)
    for chunk in np.array_split(np.arange(len(df)), 13):
        sr.ingest(pa.Table.from_pandas(df.iloc[chunk], preserve_index=False))
    got = sr.flush().to_pandas()

    exp = rollup(rd.from_pandas(df), window).to_pandas()
    key = ["series_id", "bucket"]
    got = got.sort_values(key).reset_index(drop=True)[exp.columns]
    exp = exp.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)


def test_streaming_empty_flush(ray_session):
    """flush() on an empty stream returns an empty, correctly-schema'd
    table instead of crashing."""
    from tsdownsample_ray.streaming import StreamingRollup

    sr = StreamingRollup(100, partitions=2)
    out = sr.flush()
    assert out.num_rows == 0
    assert set(out.column_names) == {"series_id", "bucket", "min_y",
                                     "max_y", "sum_y", "n"}


def test_streaming_lateness_budget(ray_session):
    """Out-of-order events within the allowed lateness still land in their
    bucket; the watermark only finalizes window_end <= max_ts - lateness."""
    import ray.data as rd

    from tsdownsample_ray.stages.rollup import rollup
    from tsdownsample_ray.streaming import StreamingRollup

    df = _events(n=5000)
    # shuffle each chunk internally (out-of-order within a bounded horizon)
    rng = np.random.default_rng(0)
    chunks = np.array_split(np.arange(len(df)), 10)
    window = 3_600_000_000
    sr = StreamingRollup(window, partitions=2, lateness_us=window)
    for c in chunks:
        sub = df.iloc[rng.permutation(c)]
        sr.ingest(pa.Table.from_pandas(sub, preserve_index=False))
    got = sr.flush().to_pandas()
    exp = rollup(rd.from_pandas(df), window).to_pandas()
    key = ["series_id", "bucket"]
    got = got.sort_values(key).reset_index(drop=True)[exp.columns]
    exp = exp.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)


def test_streaming_emits_early(ray_session):
    from tsdownsample_ray.streaming import StreamingRollup

    window = 100
    sr = StreamingRollup(window, partitions=1, lateness_us=0)
    t1 = pa.table({"series_id": ["a", "a"], "x": [10, 50], "y": [1, 2]})
    sr.ingest(t1)
    # bucket [0,100) still open (watermark = 50)
    t2 = pa.table({"series_id": ["a"], "x": [250], "y": [3]})
    sr.ingest(t2)
    # watermark 250 -> bucket 0 finalized before flush
    import ray

    n_emitted = ray.get(sr.actors[0].ingest.remote(
        pa.table({"series_id": ["a"], "x": [260], "y": [4]})))
    assert n_emitted >= 1
    out = sr.flush().to_pandas().sort_values("bucket")
    assert list(out["bucket"]) == [0, 200]
    assert list(out["n"]) == [2, 2]
    assert list(out["sum_y"]) == [3, 7]
