"""profile_columns: exact stats incl. nulls and NDV, any partitioning."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def test_profile_columns_exact(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.profile import profile_columns

    rng = np.random.default_rng(41)
    n = 1000
    a = rng.integers(-50, 50, size=n).astype("float64")
    a[rng.random(n) < 0.1] = np.nan  # nulls
    t = pa.table({
        "a": pa.array(pd.Series(a).astype("Int64")),
        "b": pa.array(rng.integers(0, 7, size=n), pa.int64()),
    })
    out = profile_columns(rd.from_arrow(t).repartition(7), ["a", "b"],
                          num_partitions=3).to_pandas()
    out = out.set_index("column")
    av = pd.Series(a).dropna().astype(int)
    assert out.loc["a", "n"] == n
    assert out.loc["a", "n_null"] == int(np.isnan(a).sum())
    assert out.loc["a", "min_v"] == av.min()
    assert out.loc["a", "max_v"] == av.max()
    assert out.loc["a", "ndv"] == av.nunique()
    assert out.loc["b", "ndv"] == 7 and out.loc["b", "n_null"] == 0

    with pytest.raises(ValueError):
        profile_columns(rd.from_arrow(t), [])
