"""Bloom semi-join: no false negatives, exact membership flags, pruning."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def test_bloom_semi_join_flags_and_covers(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.bloom import bloom_semi_join

    rng = np.random.default_rng(31)
    members = np.arange(0, 500, 5, dtype=np.int64)          # 100 keys
    big = pd.DataFrame({"key": rng.integers(0, 500, size=3000)
                        .astype("int64"),
                        "rid": np.arange(3000, dtype="int64")})
    small = pd.DataFrame({"key": members})
    out = bloom_semi_join(rd.from_pandas(big).repartition(5),
                          rd.from_pandas(small).repartition(3),
                          key_col="key", m_bits=1 << 12, k=3,
                          num_partitions=3).to_pandas()
    mem = set(members.tolist())
    # every true member row survives (bloom has NO false negatives)
    want_members = big[big.key.isin(mem)]
    got_members = out[out.is_member == 1]
    assert set(got_members.rid) == set(want_members.rid)
    # is_member flag is exact on every survivor
    for r in out.itertuples():
        assert (r.key in mem) == (r.is_member == 1)
    # the bloom actually prunes (most non-members dropped at 4096 bits)
    n_nonmember_rows = (~big.key.isin(mem)).sum()
    fp_rows = (out.is_member == 0).sum()
    assert fp_rows < 0.2 * n_nonmember_rows


def test_bloom_semi_join_validation(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.bloom import bloom_semi_join

    d = rd.from_arrow(pa.table({"key": pa.array([1], pa.int64())}))
    with pytest.raises(ValueError):
        bloom_semi_join(d, d, key_col="key", k=0)
