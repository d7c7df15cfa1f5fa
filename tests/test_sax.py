"""SAX symbolic representation (stages/sax.py:sax_symbols): the
vectorized PAA + integer-quartile alphabet vs a literal replay, across
partitionings; constant series, alphabet sizes, gap windows."""

import numpy as np
import pyarrow as pa
import pytest

from tsdownsample_ray.stages.sax import sax_symbols

ray = pytest.importorskip("ray")
import ray.data as rd  # noqa: E402


def _brute(rows, w, a):
    by_sid = {}
    for sid, x, y in rows:
        by_sid.setdefault(sid, []).append((x, y))
    out = {}
    for sid, pts in by_sid.items():
        ys = [y for _, y in pts]
        gmin, gmax = min(ys), max(ys)
        segs = {}
        for x, y in pts:
            b = (x // w) * w
            s, n = segs.get(b, (0, 0))
            segs[b] = (s + y, n + 1)
        sax = ""
        for b in sorted(segs):
            s, n = segs[b]
            q = sum(1 for k in range(1, a)
                    if a * s >= (a * gmin + k * (gmax - gmin)) * n)
            sax += chr(97 + q)
        out[sid] = (len(segs), sax)
    return out


@pytest.mark.parametrize("nparts", [1, 4])
@pytest.mark.parametrize("alphabet", [2, 4, 6])
def test_sax_matches_replay(ray_session, nparts, alphabet):
    rng = np.random.default_rng(31)
    rows = []
    for s in range(5):
        xs = np.sort(rng.choice(100_000, size=60, replace=False))
        ys = rng.integers(-200, 300, size=60)
        rows += [(f"s{s}", int(x), int(y)) for x, y in zip(xs, ys)]
    rows += [("const", 10, 7), ("const", 20_000, 7)]  # gmin == gmax
    exp = _brute(rows, 10_000, alphabet)

    t = pa.table({"series_id": [r[0] for r in rows],
                  "x": [r[1] for r in rows],
                  "y": [r[2] for r in rows]})
    got = sax_symbols(rd.from_arrow(t).repartition(nparts), 10_000,
                      alphabet=alphabet, num_partitions=3).to_pandas()
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        assert (r["n_segments"], r["sax"]) == exp[r["series_id"]], \
            r["series_id"]


def test_sax_hand_values(ray_session):
    # range 0..100, quartile bands: means 0,30,60,100 -> a, b, c, d
    rows = [(0, 0), (10, 30), (20, 60), (30, 100)]
    t = pa.table({"series_id": ["a"] * 4,
                  "x": [r[0] for r in rows],
                  "y": [r[1] for r in rows]})
    got = sax_symbols(rd.from_arrow(t), 10, alphabet=4,
                      num_partitions=1).to_pandas()
    assert got.iloc[0]["sax"] == "abcd"


def test_sax_alphabet_validation(ray_session):
    t = pa.table({"series_id": ["a"], "x": [1], "y": [1]})
    with pytest.raises(ValueError, match="alphabet"):
        sax_symbols(rd.from_arrow(t), 10, alphabet=1)
