"""Z-order clustering (stages/zorder.py): Morton code exactness, zone-map
correctness, and the 2D-locality property that justifies the layout."""

import numpy as np
import pyarrow as pa
import pytest

from tsdownsample_ray.stages.zorder import morton_interleave


def _morton_ref(a: int, b: int) -> int:
    out = 0
    for i in range(16):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


def test_morton_matches_bitloop():
    rng = np.random.default_rng(5)
    a = rng.integers(0, 1 << 16, size=200).astype(np.int64)
    b = rng.integers(0, 1 << 16, size=200).astype(np.int64)
    z = morton_interleave(a, b)
    want = [_morton_ref(int(x), int(y)) for x, y in zip(a, b)]
    assert list(z) == want


def test_zone_maps_partition_and_bound(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.zorder import zorder_zone_maps

    rng = np.random.default_rng(9)
    n = 4000
    t = pa.table({"d0": rng.integers(0, 256, size=n).astype(np.int64),
                  "d1": rng.integers(0, 256, size=n).astype(np.int64)})
    out = zorder_zone_maps(rd.from_arrow(t).repartition(6),
                           d0_col="d0", d1_col="d1", bits=8,
                           parts_log2=4, num_partitions=2).to_pandas()
    assert out["n"].sum() == n
    assert out["p"].is_unique and len(out) == 16
    # the locality property: 16 z-partitions of the 256x256 grid each
    # bound BOTH dims to a quarter of the range (top 2 bits of each dim)
    assert (out["max_d0"] - out["min_d0"] < 64).all()
    assert (out["max_d1"] - out["min_d1"] < 64).all()
    # z ranges are disjoint across partitions (it IS a range partitioning)
    s = out.sort_values("p")
    assert (s["min_z"].to_numpy()[1:] > s["max_z"].to_numpy()[:-1]).all()


def test_zone_maps_validation(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.zorder import zorder_zone_maps

    t = pa.table({"d0": [1], "d1": [2]})
    with pytest.raises(ValueError):
        zorder_zone_maps(rd.from_arrow(t), d0_col="d0", d1_col="d1",
                         bits=20)
    with pytest.raises(ValueError):
        zorder_zone_maps(rd.from_arrow(t), d0_col="d0", d1_col="d1",
                         bits=8, parts_log2=17)
