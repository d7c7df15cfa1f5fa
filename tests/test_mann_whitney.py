"""Mann-Whitney U (stages/abtest.py:mann_whitney): doubled tie-average
ranks vs scipy-style replay, across partitionings; heavy ties,
single-side keys omitted."""

import numpy as np
import pyarrow as pa
import pytest

from tsdownsample_ray.stages.abtest import mann_whitney

ray = pytest.importorskip("ray")
import ray.data as rd  # noqa: E402


def _brute(rows):
    by_k = {}
    for k, v, s in rows:
        by_k.setdefault(k, []).append((v, s))
    out = {}
    for k, vs in by_k.items():
        n_a = sum(s for _, s in vs)
        n_b = len(vs) - n_a
        if n_a == 0 or n_b == 0:
            continue
        svals = sorted(v for v, _ in vs)
        # doubled average rank per value (1-based ranks)
        rank2 = {}
        i = 0
        while i < len(svals):
            j = i
            while j < len(svals) and svals[j] == svals[i]:
                j += 1
            rank2[svals[i]] = (i + 1) + j  # 2*avg of ranks i+1..j
            i = j
        r2a = sum(rank2[v] for v, s in vs if s == 1)
        u2a = r2a - n_a * (n_a + 1)
        out[k] = (n_a, n_b, r2a, u2a, u2a / (2 * n_a * n_b))
    return out


@pytest.mark.parametrize("nparts", [1, 4])
def test_mann_whitney_matches_replay(ray_session, nparts):
    rng = np.random.default_rng(43)
    rows = [(f"k{int(i) % 4}", int(v), int(s))
            for i, v, s in zip(rng.integers(0, 100, 400),
                               rng.integers(0, 20, 400),  # heavy ties
                               rng.integers(0, 2, 400))]
    rows += [("onlyA", 5, 1), ("onlyB", 7, 0)]  # omitted
    exp = _brute(rows)

    t = pa.table({"series_id": [r[0] for r in rows],
                  "y": [r[1] for r in rows],
                  "side": [r[2] for r in rows]})
    got = mann_whitney(rd.from_arrow(t).repartition(nparts),
                       num_partitions=3).to_pandas()
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        n_a, n_b, r2a, u2a, eff = exp[r["series_id"]]
        assert (r["n_a"], r["n_b"], r["r2_a"], r["u2_a"]) == \
            (n_a, n_b, r2a, u2a)
        assert r["u_over_nanb"] == pytest.approx(eff)


def test_mann_whitney_hand_values(ray_session):
    # A = {1, 3}, B = {2}: ranks 1,2,3; r2_a = 2*(1+3) = 8
    # u2_a = 8 - 2*3 = 2; U = 1; effect = 1/(2*1) = 0.5
    t = pa.table({"series_id": ["x"] * 3, "y": [1, 2, 3],
                  "side": [1, 0, 1]})
    got = mann_whitney(rd.from_arrow(t), num_partitions=1).to_pandas()
    r = got.iloc[0]
    assert (r["n_a"], r["n_b"], r["r2_a"], r["u2_a"]) == (2, 1, 8, 2)
    assert r["u_over_nanb"] == pytest.approx(0.5)


def test_ks_statistic_matches_scipy_style_replay(ray_session):
    """Exact KS numerator equals the classic D = sup|F_a - F_b| replay
    over pooled values."""
    from tsdownsample_ray.pipelines.queries import q_ks_test_events

    import duckdb
    import numpy as np

    sf = "/root/testdata/sf0.001"
    out = q_ks_test_events(sf)
    rows = duckdb.sql(f"""
        SELECT event_type, CAST(round(value*100) AS BIGINT) v
        FROM '{sf}/events.parquet'""").fetchall()
    from collections import defaultdict
    by_t = defaultdict(list)
    for t, v in rows:
        by_t[t].append(v)
    for _, r in out.iterrows():
        a = np.sort(by_t[r["type_a"]])
        b = np.sort(by_t[r["type_b"]])
        vals = np.unique(np.r_[a, b])
        ca = np.searchsorted(a, vals, side="right")
        cb = np.searchsorted(b, vals, side="right")
        num = np.abs(ca * len(b) - cb * len(a))
        assert r["ks_num"] == num.max()
        assert r["n_a"] == len(a) and r["n_b"] == len(b)
        assert r["ks"] == num.max() / (len(a) * len(b))
        # D matches the float definition too
        d = np.abs(ca / len(a) - cb / len(b)).max()
        assert abs(r["ks"] - d) < 1e-12


def test_welch_t_matches_scipy_formula(ray_session):
    """Welch t equals the textbook unequal-variance formula (numpy
    replay with sample variances)."""
    from tsdownsample_ray.pipelines.queries import q_welch_t_events

    import duckdb
    import numpy as np

    sf = "/root/testdata/sf0.001"
    out = q_welch_t_events(sf)
    rows = duckdb.sql(f"""
        SELECT event_type, CAST(round(value*100) AS BIGINT) v
        FROM '{sf}/events.parquet'""").fetchall()
    from collections import defaultdict
    by_t = defaultdict(list)
    for t, v in rows:
        by_t[t].append(v)
    for _, r in out.iterrows():
        a = np.array(by_t[r["type_a"]], dtype=np.float64)
        b = np.array(by_t[r["type_b"]], dtype=np.float64)
        t_ref = (a.mean() - b.mean()) / np.sqrt(
            a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b))
        assert r["n_a"] == len(a) and r["n_b"] == len(b)
        assert abs(r["t"] - t_ref) < 1e-9
