"""broadcast_lookup_join + grouped_sum == plain pandas merge/groupby."""

import numpy as np
import pandas as pd
import pyarrow as pa


def test_broadcast_lookup_join_and_grouped_sum(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.broadcast import broadcast_lookup_join
    from tsdownsample_ray.stages.rollup import grouped_sum

    rng = np.random.default_rng(2)
    big = pd.DataFrame({
        "k": rng.integers(0, 40, 5000).astype(np.int64),
        "v": rng.integers(0, 1000, 5000).astype(np.int64),
    })
    dim = pa.table({"k": pa.array(np.arange(40, dtype=np.int64)),
                    "grp": pa.array([f"g{i % 5}" for i in range(40)])})
    want = (big.assign(grp=big.k.map({i: f"g{i % 5}" for i in range(40)}))
            .groupby("grp").agg(v=("v", "sum"), n=("v", "size"))
            .reset_index().sort_values("grp").reset_index(drop=True))

    ds = rd.from_pandas(big).repartition(7)
    joined = broadcast_lookup_join(ds, dim, on="k", join_type="inner")
    got = grouped_sum(joined.map_batches(
        lambda b: b.select(["grp", "v"]), batch_format="pyarrow"),
        ["grp"], ["v"]).to_pandas().sort_values("grp").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_broadcast_join_missing_keys_inner(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.broadcast import broadcast_lookup_join

    big = pd.DataFrame({"k": np.array([1, 2, 99], np.int64),
                        "v": np.array([10, 20, 30], np.int64)})
    dim = pa.table({"k": pa.array(np.array([1, 2], np.int64)),
                    "name": pa.array(["a", "b"])})
    got = broadcast_lookup_join(rd.from_pandas(big), dim, on="k",
                                join_type="inner").to_pandas()
    assert set(got.k) == {1, 2}  # 99 dropped by inner semantics
