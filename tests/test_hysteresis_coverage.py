"""Hysteresis (Schmitt-trigger) alerts and greedy max-coverage."""

import numpy as np
import pyarrow as pa
import pytest


def _replay_hysteresis(y, hi, lo):
    state, out = 0, []
    for i, v in enumerate(y):
        s = state
        if v >= hi:
            s = 1
        elif v <= lo:
            s = 0
        if s != state:
            out.append((i, s))
        state = s
    return out


def test_hysteresis_matches_sequential_replay(ray_session):
    import ray

    from tsdownsample_ray.stages.rate import hysteresis_alerts

    rng = np.random.default_rng(8)
    rows = []
    expect = set()
    for sid in ("a", "b"):
        y = rng.integers(-20, 120, 200).astype(np.int64)
        x = np.arange(200, dtype=np.int64) * 10
        for i, v in enumerate(y):
            rows.append((sid, int(x[i]), int(v)))
        for i, s in _replay_hysteresis(y, hi=100, lo=10):
            expect.add((sid, int(x[i]), int(y[i]), s))
    # series that STARTS above hi fires on its first point
    rows.append(("c", 0, 150))
    expect.add(("c", 0, 150, 1))
    tbl = pa.table({
        "series_id": pa.array([r[0] for r in rows]),
        "x": pa.array([r[1] for r in rows], pa.int64()),
        "y": pa.array([r[2] for r in rows], pa.int64())})

    for nparts in (1, 4):
        ds = ray.data.from_arrow(tbl).repartition(nparts)
        out = hysteresis_alerts(ds, 100, 10, num_partitions=2).to_pandas()
        got = set(zip(out["series_id"], out["x"], out["y"], out["state"]))
        assert got == expect


def test_hysteresis_rejects_bad_band(ray_session):
    import ray

    from tsdownsample_ray.stages.rate import hysteresis_alerts

    ds = ray.data.from_arrow(pa.table({
        "series_id": pa.array(["x"]), "x": pa.array([0], pa.int64()),
        "y": pa.array([1], pa.int64())}))
    with pytest.raises(ValueError):
        hysteresis_alerts(ds, 10, 10)


def test_greedy_coverage_matches_python(ray_session):
    import ray

    from tsdownsample_ray.stages.coverage import greedy_coverage

    docs = {
        1: "a b c d",        # bigrams: ab bc cd
        2: "a b x y z",      # ab bx xy yz
        3: "p q r s t u",    # 5 bigrams -> round-1 winner
        4: "p q r",          # subset of 3
        5: "m n",            # mn
    }
    texts = [docs[i] for i in sorted(docs)]
    tbl = pa.table({"doc_id": pa.array(sorted(docs), pa.int64()),
                    "text": pa.array(texts)})

    def bigrams(t):
        w = t.split(" ")
        return {f"{w[i]} {w[i+1]}" for i in range(len(w) - 1)}

    covered, expect = set(), []
    for rnd in range(1, 6):
        best = None
        for did in sorted(docs):
            gain = len(bigrams(docs[did]) - covered)
            if gain > 0 and (best is None or gain > best[1]):
                best = (did, gain)
        if best is None:
            break
        covered |= bigrams(docs[best[0]])
        expect.append((rnd, best[0], best[1], len(covered)))

    ds = ray.data.from_arrow(tbl).repartition(2)
    out = greedy_coverage(ds, 5, ngram=2)
    got = list(out.itertuples(index=False, name=None))
    assert got == expect
    # round-1 winner must be doc 3 (most distinct bigrams)
    assert got[0][1] == 3
