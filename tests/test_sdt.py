"""Swinging-door trending: reconstruction bound, endpoints, brute replay."""

import numpy as np
import pandas as pd


def _brute_sdt(x, y, dev):
    """Literal rational-arithmetic replay of the walk (python ints)."""
    n = len(x)
    keep = [False] * n
    keep[0] = keep[n - 1] = True
    if n <= 1:
        return keep
    ax, ay = x[0], y[0]
    lo = hi = None
    for i in range(1, n):
        d = x[i] - ax
        nlo, nhi = y[i] - dev - ay, y[i] + dev - ay
        if lo is None:
            lo, hi = (nlo, d), (nhi, d)
        else:
            if nlo * lo[1] > lo[0] * d:
                lo = (nlo, d)
            if nhi * hi[1] < hi[0] * d:
                hi = (nhi, d)
            if lo[0] * hi[1] > hi[0] * lo[1]:
                keep[i - 1] = True
                ax, ay = x[i - 1], y[i - 1]
                d = x[i] - ax
                lo, hi = (y[i] - dev - ay, d), (y[i] + dev - ay, d)
    return keep


def _mk(rng, n):
    x = np.cumsum(rng.integers(1, 5, n)).astype(np.int64)
    y = np.cumsum(rng.integers(-20, 21, n)).astype(np.int64)
    return x, y


def test_sdt_matches_brute_and_reconstructs(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.compress import sdt_compress

    rng = np.random.default_rng(3)
    frames, dev = [], 15
    for sid in range(12):
        x, y = _mk(rng, int(rng.integers(1, 120)))
        frames.append(pd.DataFrame(
            {"series_id": sid, "x": x, "y": y}))
    df = pd.concat(frames, ignore_index=True)
    ds = rd.from_pandas(df.sample(frac=1.0, random_state=0)).repartition(4)
    out = sdt_compress(ds, dev=dev, num_partitions=3).to_pandas()

    for sid, g in df.groupby("series_id"):
        x = g["x"].tolist()
        y = g["y"].tolist()
        keep = _brute_sdt(x, y, dev)
        got = out[out["series_id"] == sid].sort_values("x")
        exp_x = [xi for xi, k in zip(x, keep) if k]
        exp_y = [yi for yi, k in zip(y, keep) if k]
        assert got["x"].tolist() == exp_x
        assert got["y"].tolist() == exp_y
        # first/last always retained
        assert exp_x[0] == x[0] and exp_x[-1] == x[-1]
        # reconstruction: linear interp between retained points stays
        # within 3*dev of every original sample (emit-actual-points SDT:
        # the door invariant pins a +-dev line per segment; the
        # retained-point line adds at most 2*dev — see the docstring)
        recon = np.interp(x, exp_x, exp_y)
        assert np.all(np.abs(recon - np.array(y)) <= 3 * dev + 1e-9)


def test_sdt_x_div_seconds(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.compress import sdt_compress

    US = 1_000_000
    x_us = (np.arange(10, dtype=np.int64) * 900 * US)
    y = np.array([0, 100, 210, 280, 1000, 990, 1020, 400, 380, 350],
                 dtype=np.int64)
    ds = rd.from_pandas(pd.DataFrame(
        {"series_id": 1, "x": x_us, "y": y}))
    out = sdt_compress(ds, dev=50, x_div=US,
                       num_partitions=1).to_pandas().sort_values("x")
    keep = _brute_sdt((x_us // US).tolist(), y.tolist(), 50)
    assert out["x"].tolist() == [int(xi) for xi, k in zip(x_us, keep) if k]
