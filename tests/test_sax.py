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


def test_haar_energy_matches_python(ray_session):
    """Integer Haar lifting replay: per-level detail stats and the
    roundtrip-reversible S-transform, partition-invariant."""
    import numpy as np
    import pyarrow as pa
    import ray

    from tsdownsample_ray.stages.wavelet import haar_energy

    rng = np.random.default_rng(31)
    tables, expect = [], {}
    for sid, n in (("a", 33), ("b", 8), ("c", 1)):
        y = rng.integers(0, 500, n).astype(np.int64)
        tables.append(pa.table({
            "series_id": pa.array([sid] * n),
            "bucket": pa.array(np.arange(n, dtype=np.int64)),
            "sum_y": pa.array(y)}))
        cur = list(map(int, y))
        for lvl in range(1, 4):
            m = len(cur) // 2
            d = [cur[2 * i] - cur[2 * i + 1] for i in range(m)]
            s = [(cur[2 * i] + cur[2 * i + 1]) // 2 for i in range(m)]
            if len(cur) % 2:
                s.append(cur[-1])
            expect[(sid, lvl)] = (m, sum(abs(x) for x in d),
                                  max((abs(x) for x in d), default=0))
            cur = s
        expect[(sid, 0)] = (len(cur), sum(abs(x) for x in cur),
                            max(abs(x) for x in cur))
    tbl = pa.concat_tables(tables)

    for nparts in (1, 3):
        ds = ray.data.from_arrow(tbl).repartition(nparts)
        out = haar_energy(ds, levels=3, num_partitions=2).to_pandas()
        assert len(out) == len(expect)
        for _, r in out.iterrows():
            assert expect[(r["series_id"], r["level"])] == (
                r["n"], r["sum_abs"], r["max_abs"])


def test_sax_motifs_top_trigram(ray_session):
    """Motif = most frequent trigram of the SAX string, smallest
    lexicographic on count ties."""
    from collections import Counter

    from tsdownsample_ray.pipelines.queries import (q_sax_events,
                                                    q_sax_motifs_events)

    sf = "/root/testdata/sf0.001"
    base = q_sax_events(sf).to_pandas().set_index("series_id")
    out = q_sax_motifs_events(sf)
    for _, r in out.iterrows():
        s = base.loc[r["series_id"], "sax"]
        grams = Counter(s[i:i + 3] for i in range(len(s) - 2))
        motif, cnt = sorted(grams.items(),
                            key=lambda kv: (-kv[1], kv[0]))[0]
        assert (r["motif"], r["cnt"]) == (motif, cnt)
        assert r["n_grams"] == len(s) - 2
