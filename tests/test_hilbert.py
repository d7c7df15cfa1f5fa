"""Hilbert index: scalar reference replay, bijectivity, locality."""

import numpy as np


def _ref_xy2d(n, x, y):
    rx = ry = 0
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_matches_scalar_reference_and_is_bijective():
    from tsdownsample_ray.stages.hilbert import hilbert_d

    bits = 5
    n = 1 << bits
    xs, ys = np.meshgrid(np.arange(n), np.arange(n))
    xs, ys = xs.ravel(), ys.ravel()
    d = hilbert_d(xs, ys, bits)
    exp = np.array([_ref_xy2d(n, int(x), int(y)) for x, y in zip(xs, ys)])
    assert np.array_equal(d, exp)
    # bijection onto [0, n^2)
    assert len(np.unique(d)) == n * n
    assert d.min() == 0 and d.max() == n * n - 1
    # locality: consecutive indices are grid-adjacent (the property
    # Morton codes lack)
    order = np.argsort(d)
    dx = np.abs(np.diff(xs[order])) + np.abs(np.diff(ys[order]))
    assert np.all(dx == 1)


def test_hilbert_zone_maps_partitions(ray_session):
    import pandas as pd
    import ray.data as rd

    from tsdownsample_ray.stages.hilbert import hilbert_d, hilbert_zone_maps

    rng = np.random.default_rng(4)
    df = pd.DataFrame({"d0": rng.integers(0, 1000, 5000),
                       "d1": rng.integers(0, 1000, 5000)})
    out = hilbert_zone_maps(rd.from_pandas(df).repartition(4),
                            d0_col="d0", d1_col="d1", bits=8,
                            parts_log2=4).to_pandas().sort_values("p")
    h = hilbert_d(df["d0"].to_numpy() % 256, df["d1"].to_numpy() % 256, 8)
    p = h >> 12
    assert out["n"].sum() == 5000
    for _, r in out.iterrows():
        m = p == r["p"]
        assert r["n"] == int(m.sum())
        assert r["min_h"] == int(h[m].min())
        assert r["max_h"] == int(h[m].max())
