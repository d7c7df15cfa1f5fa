"""Croston intermittent-demand smoothing (stages/smoothing.py:
croston_fixed_point) vs the literal recursion, across partitionings."""

import numpy as np
import pyarrow as pa
import pytest

from tsdownsample_ray.stages.smoothing import croston_fixed_point

ray = pytest.importorskip("ray")
import ray.data as rd  # noqa: E402

W = 100  # window_us for the test grid


def _brute(seq, kz, kp):
    out = []
    z = p = prev = 0
    for i, (b, y) in enumerate(seq):
        if i == 0:
            z, p, q = y, 1, 0
        else:
            q = (b - prev) // W
            z = z + ((y - z) >> kz)
            p = p + ((q - p) >> kp)
        prev = b
        out.append((b, y, q, z, p))
    return out


@pytest.mark.parametrize("nparts", [1, 4])
def test_croston_matches_recursion(ray_session, nparts):
    rng = np.random.default_rng(17)
    rows = []
    per = {}
    for s in range(6):
        # sparse demand: strictly increasing buckets with gaps
        gaps = rng.integers(1, 9, size=25)
        bks = np.cumsum(gaps) * W
        ys = rng.integers(1, 50, size=25)
        seq = [(int(b), int(y)) for b, y in zip(bks, ys)]
        per[f"s{s}"] = seq
        rows += [(f"s{s}", b, y) for b, y in seq]
    t = pa.table({"series_id": [r[0] for r in rows],
                  "bucket": [r[1] for r in rows],
                  "sum_y": [r[2] for r in rows]})
    got = croston_fixed_point(
        rd.from_arrow(t).repartition(nparts), 3, 3, window_us=W,
        num_partitions=2).to_pandas()
    assert len(got) == len(rows)
    exp = {}
    for sid, seq in per.items():
        for b, y, q, z, p in _brute(seq, 3, 3):
            exp[(sid, b)] = (y, q, z, p)
    for _, r in got.iterrows():
        assert (r["y"], r["q"], r["z"], r["p"]) == \
            exp[(r["series_id"], r["bucket"])]


def test_croston_validation():
    with pytest.raises(ValueError):
        croston_fixed_point(None, window_us=0)
