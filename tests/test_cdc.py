"""CDC latest-wins upsert compaction (stages/cdc.py) vs a pandas replay."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _replay(df: pd.DataFrame) -> pd.DataFrame:
    r = df.sort_values(["ts", "rid"]).groupby(["k1", "k2"], sort=False).tail(1)
    r = r[r["tomb"] == 0].drop(columns=["tomb"])
    return r.sort_values(["k1", "k2"]).reset_index(drop=True)


def test_upsert_latest_vs_replay(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.cdc import upsert_latest

    rng = np.random.default_rng(3)
    n = 800
    df = pd.DataFrame({
        "k1": rng.choice(["a", "b", "c"], size=n),
        "k2": rng.integers(0, 20, size=n).astype("int64"),
        "ts": rng.integers(0, 100, size=n).astype("int64"),
        "rid": np.arange(n, dtype="int64"),
        "payload": rng.integers(-5, 5, size=n).astype("int64"),
        "tomb": (rng.random(n) < 0.2).astype("int64"),
    })
    for parts in (1, 7):
        out = upsert_latest(rd.from_pandas(df).repartition(parts),
                            key_cols=["k1", "k2"],
                            order_cols=["ts", "rid"],
                            tombstone_col="tomb",
                            num_partitions=3).to_pandas()
        out = out.sort_values(["k1", "k2"]).reset_index(drop=True)
        ref = _replay(df)
        assert list(out.columns) == ["k1", "k2", "ts", "rid", "payload"]
        pd.testing.assert_frame_equal(
            out[["k1", "k2", "ts", "rid", "payload"]],
            ref[["k1", "k2", "ts", "rid", "payload"]])


def test_upsert_latest_all_tombstoned_key_disappears(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.cdc import upsert_latest

    t = pa.table({"k": ["x", "x", "y"],
                  "ts": np.array([1, 2, 1], dtype=np.int64),
                  "tomb": np.array([0, 1, 0], dtype=np.int64)})
    out = upsert_latest(rd.from_arrow(t), key_cols=["k"],
                        order_cols=["ts"], tombstone_col="tomb",
                        num_partitions=1).to_pandas()
    # x's latest record is a delete -> x gone; y survives
    assert list(out["k"]) == ["y"]
    with pytest.raises(ValueError):
        upsert_latest(rd.from_arrow(t), key_cols=[], order_cols=["ts"],
                      tombstone_col="tomb")
