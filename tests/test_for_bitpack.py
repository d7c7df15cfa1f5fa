"""FOR bit-packing (stages/compress.py:for_bitpack_frames): manifest vs
brute replay, including boundary bit widths (0, 2^k - 1, 2^k)."""

import numpy as np
import pyarrow as pa
import pytest

from tsdownsample_ray.stages.compress import for_bitpack_frames

ray = pytest.importorskip("ray")
import ray.data as rd  # noqa: E402


def _mk(rows):
    t = pa.table({"series_id": [r[0] for r in rows],
                  "bucket": [r[1] for r in rows],
                  "sum_y": [r[2] for r in rows]})
    return rd.from_arrow(t).repartition(3)


def test_for_bitpack_matches_brute(ray_session):
    rng = np.random.default_rng(6)
    rows = []
    for s in range(5):
        n = int(rng.integers(3, 40))
        bks = np.sort(rng.choice(10_000, size=n, replace=False))
        ys = rng.integers(-(10 ** 6), 10 ** 6, size=n)
        rows += [(f"s{s}", int(b), int(y)) for b, y in zip(bks, ys)]
    # boundary widths: constant frame (width 0), width 2^k-1 and 2^k
    rows += [("c0", i, 42) for i in range(6)]
    rows += [("c1", 0, 0), ("c1", 1, 255)]       # width 255 -> 8 bits
    rows += [("c2", 0, 0), ("c2", 1, 256)]       # width 256 -> 9 bits
    rows += [("c3", 0, -7), ("c3", 1, -7 + (1 << 40))]

    frame = 8
    got = for_bitpack_frames(_mk(rows), frame=frame,
                             num_partitions=2).to_pandas()
    per = {}
    for sid, b, y in sorted(rows):
        per.setdefault(sid, []).append((b, y))
    exp = {}
    for sid, seq in per.items():
        vs = [y for _, y in seq]
        for f in range(-(-len(vs) // frame)):
            w = vs[f * frame:(f + 1) * frame]
            mn, mx = min(w), max(w)
            bits = max(1, int(mx - mn).bit_length())
            exp[(sid, f)] = (len(w), mn, bits,
                             (len(w) * bits + 7) // 8,
                             sum(w) - len(w) * mn)
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        assert (r["n"], r["min_v"], r["bits"], r["packed_bytes"],
                r["sum_delta"]) == exp[(r["series_id"], r["frame"])], \
            (r["series_id"], r["frame"])


def test_for_bitpack_validation():
    with pytest.raises(ValueError):
        for_bitpack_frames(None, frame=0)
