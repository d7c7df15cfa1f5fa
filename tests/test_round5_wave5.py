"""Round-5 session-5 wave 1: Pettitt change-point test, anagram
signature blocking over char windows, front-coding vocabulary stats —
each replayed against an independent brute-force oracle (partitioning
must not change any value)."""

import numpy as np
import pandas as pd
import pytest


def _pettitt_ref(y):
    """O(n^2) sign double-sum — the textbook definition."""
    n = len(y)
    best_k2, best_t = -1, None
    for t in range(1, n):
        u = 0
        for i in range(t):
            for j in range(t, n):
                u += int(y[i] > y[j]) - int(y[i] < y[j])
        if abs(u) > best_k2:
            best_k2, best_t = abs(u), t
    return best_t, best_k2


def test_pettitt_matches_bruteforce(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.rate import pettitt_test

    rng = np.random.default_rng(41)
    frames = []
    for s in range(6):
        n = int(rng.integers(2, 40))
        y = rng.integers(-50, 50, n)
        if s % 2 == 0 and n > 6:  # inject a level shift
            y[n // 2:] += 40
        frames.append(pd.DataFrame({
            "series_id": f"s{s}",
            "bucket": np.sort(rng.choice(10_000, n, replace=False)),
            "sum_y": y}))
    df = pd.concat(frames).sample(frac=1.0, random_state=3)
    ds = rd.from_pandas(df.reset_index(drop=True)).repartition(5)
    out = pettitt_test(ds, num_partitions=3).to_pandas()
    out = out.set_index("series_id")
    for s in range(6):
        sub = (df[df.series_id == f"s{s}"]
               .sort_values("bucket").reset_index(drop=True))
        t_ref, k2_ref = _pettitt_ref(sub.sum_y.to_numpy())
        row = out.loc[f"s{s}"]
        assert int(row.k_stat) == k2_ref, f"s{s} k_stat"
        assert int(row.t_star) == t_ref, f"s{s} t_star"
        assert int(row.bucket) == int(sub.bucket.iloc[t_ref - 1])
        assert int(row.n) == len(sub)


def test_pettitt_tie_heavy_series(ray_session):
    """Ties everywhere — the midrank identity must stay exact."""
    import ray.data as rd

    from tsdownsample_ray.stages.rate import pettitt_test

    y = np.array([5, 5, 5, 9, 9, 5, 9, 9, 9])
    df = pd.DataFrame({"series_id": "t", "bucket": np.arange(9),
                       "sum_y": y})
    out = pettitt_test(
        rd.from_pandas(df), num_partitions=2).to_pandas().iloc[0]
    t_ref, k2_ref = _pettitt_ref(y)
    assert int(out.k_stat) == k2_ref
    assert int(out.t_star) == t_ref


def test_anagram_groups_bruteforce(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.vocab import anagram_groups

    texts = ["abcd dcba xyzw", "bcda abdc", "wxyz qqqq"]
    df = pd.DataFrame({"doc_id": [0, 1, 2], "text": texts})
    out = anagram_groups(rd.from_pandas(df).repartition(3),
                         L=4, num_partitions=2).to_pandas()
    # brute force over distinct 4-char windows
    wins = set()
    for t in texts:
        for i in range(len(t) - 3):
            wins.add(t[i:i + 4])
    groups = {}
    for w in wins:
        groups.setdefault("".join(sorted(w)), set()).add(w)
    exp = {s: g for s, g in groups.items() if len(g) >= 2}
    got = {r.sig: r for r in out.itertuples()}
    assert set(got) == set(exp)
    for s, g in exp.items():
        assert got[s].n_terms == len(g)
        assert got[s].min_token == min(g)


def test_front_code_stats_bruteforce(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.vocab import front_code_stats

    texts = ["apple apply apricot banana band", "band banjo apple cat",
             "cat cap car"]
    df = pd.DataFrame({"doc_id": [0, 1, 2], "text": texts})
    out = front_code_stats(rd.from_pandas(df).repartition(3),
                           num_partitions=2).to_pandas()
    vocab = sorted({t for s in texts for t in s.split() if t})
    exp = {}
    prev = None
    for t in vocab:
        fc = t[0]
        if fc not in exp:
            exp[fc] = [0, 0, 0]
            prev = None
        exp[fc][0] += 1
        exp[fc][1] += len(t)
        if prev is not None:
            lcp = 0
            while (lcp < min(len(t), len(prev))
                   and t[lcp] == prev[lcp]):
                lcp += 1
            exp[fc][2] += lcp
        prev = t
    got = out.set_index("first_char")
    assert set(got.index) == set(exp)
    for fc, (n, sl, sp) in exp.items():
        assert int(got.loc[fc].n_terms) == n
        assert int(got.loc[fc].sum_len) == sl
        assert int(got.loc[fc].sum_lcp) == sp
        assert got.loc[fc].saved_ratio == pytest.approx(sp / sl)


def test_front_code_utf8(ray_session):
    """Multibyte tokens: LCP and lengths are codepoint-based."""
    import ray.data as rd

    from tsdownsample_ray.stages.vocab import front_code_stats

    df = pd.DataFrame({"doc_id": [0], "text": ["héllo hémo hat"]})
    out = front_code_stats(rd.from_pandas(df),
                           num_partitions=1).to_pandas()
    row = out[out.first_char == "h"].iloc[0]
    # sorted: hat, héllo, hémo -> lcps: 0, 1 ('h'), 2 ('hé')
    assert int(row.n_terms) == 3
    assert int(row.sum_len) == 3 + 5 + 4
    assert int(row.sum_lcp) == 1 + 2
