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


def test_ar1_fit_bruteforce(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.correlate import ar1_fit

    rng = np.random.default_rng(17)
    frames = []
    for s in range(5):
        n = int(rng.integers(2, 30))
        frames.append(pd.DataFrame({
            "series_id": f"s{s}",
            "bucket": np.sort(rng.choice(10_000, n, replace=False)),
            "sum_y": rng.integers(-10**6, 10**6, n),
            "n": rng.integers(1, 9, n)}))
    df = pd.concat(frames).sample(frac=1.0, random_state=5)
    out = ar1_fit(rd.from_pandas(df.reset_index(drop=True)).repartition(4),
                  num_partitions=3).to_pandas().set_index("series_id")
    for s in range(5):
        sub = (df[df.series_id == f"s{s}"]
               .sort_values("bucket").reset_index(drop=True))
        y = np.floor_divide(sub.sum_y.to_numpy(), sub.n.to_numpy())
        prev, cur = y[:-1], y[1:]
        npair = len(prev)
        s1, s2 = prev.sum(), cur.sum()
        s11, s12 = (prev * prev).sum(), (prev * cur).sum()
        row = out.loc[f"s{s}"]
        assert int(row.n_pairs) == npair
        assert int(row.s1) == s1 and int(row.s2) == s2
        assert int(row.s11) == s11 and int(row.s12) == s12
        den = npair * float(s11) - float(s1) ** 2
        phi = ((npair * float(s12) - float(s1) * float(s2)) / den
               if den else 0.0)
        assert row.phi == pytest.approx(phi, rel=1e-12)
        c = (float(s2) - phi * float(s1)) / npair
        assert row.fcst == pytest.approx(c + phi * float(y[-1]), rel=1e-9)


def test_allen_relations_all_eight(ray_session):
    """A constructed user hitting every one of the 8 forward relations."""
    import ray.data as rd

    from tsdownsample_ray.stages.intervals import allen_relations

    # consecutive pairs (a=prev, b=cur), sorted by (start, event_id):
    iv = [
        (0, 0, 10),    # a
        (0, 20, 30),   # before    (10 < 20)
        (0, 30, 35),   # meets     (30 == 30)
        (0, 32, 40),   # overlaps  (32 < 35, 40 > 35)
        (0, 36, 40),   # finished_by (36 < 40, 40 == 40)
        (0, 37, 39),   # contains  (37 < 40? prev is (36,40): 37<40, 39<40)
        (0, 37, 50),   # prev (37,39): 37==37 -> starts (39 < 50)
        (0, 37, 50),   # equals
        (0, 37, 45),   # started_by (50 > 45)
    ]
    df = pd.DataFrame({
        "user_id": [u for u, _, _ in iv],
        "event_id": np.arange(len(iv)),
        "start": [s for _, s, _ in iv],
        "end": [e for _, _, e in iv]})
    out = allen_relations(rd.from_pandas(df).repartition(3),
                          num_partitions=2).to_pandas()
    got = dict(zip(out.relation, out.n_pairs))
    assert got == {"before": 1, "meets": 1, "overlaps": 1,
                   "finished_by": 1, "contains": 1, "starts": 1,
                   "equals": 1, "started_by": 1}


def test_weighted_jaccard_bruteforce(ray_session):
    import ray.data as rd
    from collections import Counter

    from tsdownsample_ray.stages.strsim import weighted_jaccard_pairs

    docs = [
        (0, "a b b c", "s1"),
        (5, "b b c d", "s1"),
        (9, "a a a", "s1"),
        (2, "x y", "s2"),
        (3, "x y z z", "s2"),
        (7, "", "s2"),     # empty text: union with doc 3 is non-empty
        (4, "lone", "s3"),
    ]
    df = pd.DataFrame(docs, columns=["doc_id", "text", "source"])
    out = weighted_jaccard_pairs(
        rd.from_pandas(df).repartition(4),
        num_partitions=3).to_pandas().sort_values("doc_a")
    by_src = {}
    for d, t, s in docs:
        by_src.setdefault(s, []).append((d, t))
    exp = {}
    for s, lst in by_src.items():
        lst.sort()
        for (da, ta), (db, tb) in zip(lst, lst[1:]):
            ca, cb = Counter(ta.split()), Counter(tb.split())
            toks = set(ca) | set(cb)
            num = sum(min(ca[t], cb[t]) for t in toks)
            den = sum(max(ca[t], cb[t]) for t in toks)
            if den:
                exp[(da, db)] = (num, den)
    got = {(r.doc_a, r.doc_b): (r.num, r.den) for r in out.itertuples()}
    assert got == exp
    for r in out.itertuples():
        assert r.wjac == pytest.approx(r.num / r.den)


def test_sssp_bruteforce(ray_session):
    import heapq

    import ray.data as rd

    from tsdownsample_ray.stages.graph import sssp

    rng = np.random.default_rng(23)
    n_nodes = 30
    edges = []
    for _ in range(70):
        u, v = map(int, rng.integers(0, n_nodes, 2))
        if u == v:
            continue
        w = int(rng.integers(1, 9))
        edges.append((u, v, w))
        edges.append((v, u, w))
    df = pd.DataFrame(edges, columns=["src", "dst", "w"])
    out = sssp(rd.from_pandas(df).repartition(4), source_node=0,
               rounds=12, num_partitions=3).to_pandas()
    # Dijkstra reference (rounds=12 > any shortest hop count here is not
    # guaranteed, so clamp the reference to 12 relaxation rounds too)
    INF = float("inf")
    dist = {i: INF for i in range(n_nodes)}
    dist[0] = 0
    for _ in range(12):
        nd = dict(dist)
        for u, v, w in edges:
            if dist[u] + w < nd.get(v, INF):
                nd[v] = dist[u] + w
        dist = nd
    exp = {k: int(v) for k, v in dist.items() if v < INF}
    got = dict(zip(out.node, out.dist))
    assert got == exp


def test_sssp_rejects_bad_rounds(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.graph import sssp

    df = pd.DataFrame({"src": [0], "dst": [1], "w": [1]})
    with pytest.raises(ValueError):
        sssp(rd.from_pandas(df), rounds=0)


def test_linear_count_bruteforce(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.dedup import _stable_u64
    from tsdownsample_ray.stages.sketches import linear_count

    rng = np.random.default_rng(9)
    rows = []
    for k in ("a", "b"):
        vals = [f"{k}-url-{int(i)}" for i in rng.integers(0, 200, 300)]
        rows += [(k, v) for v in vals]
    df = pd.DataFrame(rows, columns=["domain", "url"])
    m = 256
    out = linear_count(rd.from_pandas(df).repartition(5),
                       key_col="domain", value_col="url", m=m,
                       fanin=3).to_pandas().set_index("domain")
    import math

    for k in ("a", "b"):
        urls = {v for kk, v in rows if kk == k}
        cells = {int(_stable_u64(u.encode()) % m) for u in urls}
        assert int(out.loc[k].occupied) == len(cells)
        assert int(out.loc[k].zeros) == m - len(cells)
        assert out.loc[k].lc_est == pytest.approx(
            m * math.log(m / (m - len(cells))))


def test_simple8b_bruteforce(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.compress import S8B_COUNTS, simple8b_pack

    rng = np.random.default_rng(31)
    frames = []
    for s in range(4):
        n = int(rng.integers(1, 120))
        mag = 10 ** int(rng.integers(1, 7))
        frames.append(pd.DataFrame({
            "series_id": f"s{s}",
            "bucket": np.sort(rng.choice(100_000, n, replace=False)),
            "sum_y": rng.integers(-mag, mag, n)}))
    df = pd.concat(frames).sample(frac=1.0, random_state=11)
    out = simple8b_pack(
        rd.from_pandas(df.reset_index(drop=True)).repartition(4),
        num_partitions=3).to_pandas()
    for s in range(4):
        sub = (df[df.series_id == f"s{s}"]
               .sort_values("bucket").reset_index(drop=True))
        y = sub.sum_y.to_numpy()
        d = np.diff(np.concatenate(([0], y)))
        v = np.where(d >= 0, 2 * d, -2 * d - 1).astype(np.int64)
        # reference greedy walk
        words = []
        pos = 0
        while pos < len(v):
            for c in S8B_COUNTS:
                b = 60 // c
                if pos + c <= len(v) and int(v[pos:pos + c].max()) < (1 << b):
                    break
            payload = sum(int(v[pos + i]) << (b * i) for i in range(c))
            words.append((len(words), pos + 1, c, b, payload))
            pos += c
        got = (out[out.series_id == f"s{s}"]
               .sort_values("word_idx").reset_index(drop=True))
        assert len(got) == len(words)
        for w, (wi, sp, c, b, pl) in zip(got.itertuples(), words):
            assert (w.word_idx, w.start_pos, w.cnt, w.bits, w.payload) \
                == (wi, sp, c, b, pl)


def test_ltd_properties():
    from tsdownsample_ray.kernels.ltd import ltd
    from tsdownsample_ray.kernels.lttb import lttb

    rng = np.random.default_rng(7)
    y = np.concatenate([np.zeros(3000),
                        np.cumsum(rng.normal(size=1000)) * 10,
                        np.zeros(3000)])
    idx = ltd(None, y, 80)
    assert len(idx) == 80
    assert idx[0] == 0 and idx[-1] == len(y) - 1
    assert np.all(np.diff(idx.astype(np.int64)) > 0)
    # dynamic buckets concentrate on the variance burst
    in_burst = ((idx >= 3000) & (idx < 4000)).sum()
    lttb_in_burst = ((lttb(None, y, 80) >= 3000)
                     & (lttb(None, y, 80) < 4000)).sum()
    assert in_burst > 2 * lttb_in_burst
    # iterations=0 degenerates to LTTB exactly (integer y: sums exact)
    yi = (y * 100).astype(np.int64)
    assert np.array_equal(ltd(None, yi, 50, iterations=0),
                          lttb(None, yi, 50))
    # identity short-circuit + validation
    assert np.array_equal(ltd(None, y[:10], 20), np.arange(10))
    import pytest as _pytest

    with _pytest.raises(ValueError):
        ltd(None, y, 2)
    with _pytest.raises(ValueError):
        ltd(None, y, 50, iterations=-1)


def test_ltd_deterministic_and_registered():
    import numpy as _np

    from tsdownsample_ray import LTDDownsampler
    from tsdownsample_ray.kernels import KERNELS

    assert "ltd" in KERNELS
    rng = _np.random.default_rng(3)
    y = rng.normal(size=5000).astype(_np.float32)
    a = LTDDownsampler().downsample(y, n_out=60)
    b = LTDDownsampler().downsample(y, n_out=60)
    assert _np.array_equal(a, b)
    # explicit x path agrees with implicit on equidistant x
    x = _np.arange(len(y), dtype=_np.int64)
    c = LTDDownsampler().downsample(x, y, n_out=60)
    assert _np.array_equal(a, c)


def test_wilcoxon_signed_bruteforce(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.abtest import wilcoxon_signed

    rng = np.random.default_rng(19)
    rows = []
    for p in ("p1", "p2", "p3"):
        d = rng.integers(-6, 7, int(rng.integers(5, 40)))
        rows += [(p, int(x)) for x in d]
    df = pd.DataFrame(rows, columns=["pair", "d"])
    out = wilcoxon_signed(rd.from_pandas(df).repartition(4),
                          num_partitions=3).to_pandas().set_index("pair")
    import math

    for p in ("p1", "p2", "p3"):
        d = np.array([x for k, x in rows if k == p and x != 0])
        ad = np.abs(d)
        # doubled midranks
        order = np.argsort(ad, kind="stable")
        d2 = np.empty(len(d), np.int64)
        for i, v in enumerate(ad):
            lt = int((ad < v).sum())
            eq = int((ad == v).sum())
            d2[i] = 2 * lt + eq + 1
        wp = int(d2[d > 0].sum())
        wn = int(d2[d < 0].sum())
        row = out.loc[p]
        assert int(row.n_nz) == len(d)
        assert int(row.w2_pos) == wp and int(row.w2_neg) == wn
        assert wp + wn == len(d) * (len(d) + 1)
        nf = float(len(d))
        z = ((wp / 2.0) - nf * (nf + 1) / 4.0) / math.sqrt(
            nf * (nf + 1) * (2 * nf + 1) / 24.0)
        assert row.z == pytest.approx(z, rel=1e-12)


def test_runs_test_bruteforce(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.abtest import runs_test

    rng = np.random.default_rng(29)
    frames = []
    for s in range(4):
        n = int(rng.integers(3, 50))
        frames.append(pd.DataFrame({
            "series_id": f"s{s}", "bucket": np.arange(n),
            "sum_y": rng.integers(-5, 6, n)}))
    # a constant series: everything equals the median
    frames.append(pd.DataFrame({
        "series_id": "const", "bucket": np.arange(5),
        "sum_y": np.full(5, 7)}))
    df = pd.concat(frames).sample(frac=1.0, random_state=2)
    out = runs_test(rd.from_pandas(df.reset_index(drop=True))
                    .repartition(4),
                    num_partitions=3).to_pandas().set_index("series_id")
    row = out.loc["const"]
    assert (int(row.n_above), int(row.n_below),
            int(row.runs), row.z) == (0, 0, 0, 0.0)
    assert int(row.med) == 7
    for s in range(4):
        sub = (df[df.series_id == f"s{s}"]
               .sort_values("bucket").reset_index(drop=True))
        y = sub.sum_y.to_numpy()
        med = int(np.sort(y)[(len(y) - 1) // 2])
        sgn = y[y != med] > med
        runs = 1 + int((sgn[1:] != sgn[:-1]).sum()) if len(sgn) else 0
        row = out.loc[f"s{s}"]
        assert int(row.med) == med
        assert int(row.runs) == runs
        assert int(row.n_above) == int(sgn.sum())
        assert int(row.n_below) == int((~sgn).sum())


def test_qn_scale_bruteforce(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.quantiles import qn_scale

    rng = np.random.default_rng(37)
    frames = []
    for s in range(4):
        n = int(rng.integers(2, 40))
        frames.append(pd.DataFrame({
            "series_id": f"s{s}", "bucket": np.arange(n),
            "sum_y": rng.integers(-100, 100, n)}))
    df = pd.concat(frames).sample(frac=1.0, random_state=8)
    out = qn_scale(rd.from_pandas(df.reset_index(drop=True)).repartition(3),
                   num_partitions=2).to_pandas().set_index("series_id")
    for s in range(4):
        y = df[df.series_id == f"s{s}"].sum_y.to_numpy()
        diffs = sorted(abs(int(a) - int(b))
                       for i, a in enumerate(y) for b in y[i + 1:])
        row = out.loc[f"s{s}"]
        assert int(row.m_pairs) == len(diffs)
        assert int(row.qn) == diffs[(len(diffs) - 1) // 2]


def _lz76_ref(s):
    """Independent Kaspar-Schuster parse (phrase count)."""
    n = len(s)
    c, pos = 0, 0
    while pos < n:
        ln = 1
        while pos + ln <= n and s[pos:pos + ln] in s[:pos + ln - 1]:
            ln += 1
        pos += ln
        c += 1
    return c


def test_lz76_bruteforce(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.abtest import lz76_complexity

    rng = np.random.default_rng(43)
    frames = []
    for s in range(5):
        n = int(rng.integers(2, 80))
        frames.append(pd.DataFrame({
            "series_id": f"s{s}", "bucket": np.arange(n),
            "sum_y": rng.integers(0, 4, n)}))
    # known sequences: all-same and alternating
    frames.append(pd.DataFrame({"series_id": "flat",
                                "bucket": np.arange(8),
                                "sum_y": [1, 2, 1, 2, 1, 2, 1, 2]}))
    df = pd.concat(frames).sample(frac=1.0, random_state=13)
    out = lz76_complexity(rd.from_pandas(df.reset_index(drop=True))
                          .repartition(4),
                          num_partitions=3).to_pandas()
    out = out.set_index("series_id")
    for sid in out.index:
        sub = (df[df.series_id == sid]
               .sort_values("bucket").reset_index(drop=True))
        y = sub.sum_y.to_numpy()
        med = int(np.sort(y)[(len(y) - 1) // 2])
        s = "".join("1" if v > med else "0" for v in y)
        assert int(out.loc[sid].c_phrases) == _lz76_ref(s), sid
        assert int(out.loc[sid].med) == med
    # alternating "01010101" parses to 0|1|010101 = 3 phrases
    assert int(out.loc["flat"].c_phrases) == 3


def test_mtf_score_bruteforce(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.compress import mtf_score

    rng = np.random.default_rng(51)
    alpha = ["a", "b", "c", "d"]
    rows = []
    for u in range(6):
        n = int(rng.integers(1, 50))
        for i in range(n):
            rows.append((u, alpha[int(rng.integers(0, 4))], i, i))
    df = pd.DataFrame(rows, columns=["user_id", "sym", "x", "tie"])
    out = mtf_score(rd.from_pandas(df).repartition(4), alpha,
                    num_partitions=3).to_pandas().set_index("user_id")
    for u in range(6):
        syms = [s for uu, s, _, _ in rows if uu == u]
        lst = list(alpha)
        tot = mx = 0
        for s in syms:
            p = lst.index(s)
            tot += p
            mx = max(mx, p)
            lst.insert(0, lst.pop(p))
        assert int(out.loc[u].mtf_sum) == tot
        assert int(out.loc[u].mtf_max) == mx
        assert int(out.loc[u].n) == len(syms)


def test_transposition_pairs_bruteforce(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.strsim import transposition_pairs

    texts = ["abcd abdc xyzw", "bacd abcd qrst", "xyzw yxzw"]
    df = pd.DataFrame({"doc_id": [0, 1, 2], "text": texts})
    out = transposition_pairs(rd.from_pandas(df).repartition(3),
                              L=4, num_partitions=2).to_pandas()
    wins = set()
    for t in texts:
        for i in range(len(t) - 3):
            wins.add(t[i:i + 4])
    exp = set()
    for w in wins:
        for i in range(3):
            if w[i] != w[i + 1]:
                v = w[:i] + w[i + 1] + w[i] + w[i + 2:]
                if v in wins and v != w:
                    exp.add((min(w, v), max(w, v)))
    got = {(r.term_a, r.term_b) for r in out.itertuples()}
    assert got == exp and len(exp) > 0


def test_golomb_postings_bruteforce(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.postings import golomb_postings

    texts = {0: "a b c", 3: "a c", 7: "a b", 9: "a", 12: "b c c"}
    df = pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    out = golomb_postings(rd.from_pandas(df).repartition(3),
                          num_partitions=2).to_pandas().set_index("token")
    posts = {}
    for d, t in texts.items():
        for tok in set(t.split()):
            posts.setdefault(tok, []).append(d)
    for tok, docs in posts.items():
        docs.sort()
        gaps = [docs[0] + 1] + [b - a for a, b in zip(docs, docs[1:])]
        best = None
        for k in range(41):
            bits = sum((g - 1) >> k for g in gaps) + len(gaps) * (1 + k)
            if best is None or bits < best[1]:
                best = (k, bits)
        row = out.loc[tok]
        assert int(row.df) == len(docs)
        assert (int(row.rice_k), int(row.rice_bits)) == best
        assert int(row.rice_bytes) == (best[1] + 7) // 8


def test_savgol_bruteforce(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.smoothing import savgol_smooth

    rng = np.random.default_rng(61)
    frames = []
    for s in range(3):
        n = int(rng.integers(3, 30))
        frames.append(pd.DataFrame({
            "series_id": f"s{s}", "bucket": np.arange(n) * 10,
            "sum_y": rng.integers(-100, 100, n)}))
    df = pd.concat(frames).sample(frac=1.0, random_state=3)
    out = savgol_smooth(rd.from_pandas(df.reset_index(drop=True))
                        .repartition(3), num_partitions=2).to_pandas()
    coeffs = np.array([-3, 12, 17, 12, -3])
    exp_rows = 0
    for s in range(3):
        y = (df[df.series_id == f"s{s}"]
             .sort_values("bucket").sum_y.to_numpy())
        for c in range(2, len(y) - 2):
            num = int(coeffs @ y[c - 2:c + 3])
            row = out[(out.series_id == f"s{s}")
                      & (out.bucket == c * 10)]
            assert len(row) == 1
            assert int(row.sg_num.iloc[0]) == num
            assert row.sg.iloc[0] == pytest.approx(num / 35.0)
            exp_rows += 1
    assert len(out) == exp_rows


def test_ols_influence_bruteforce(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.correlate import ols_influence

    rng = np.random.default_rng(67)
    frames = []
    for s in range(3):
        n = int(rng.integers(1, 25))
        frames.append(pd.DataFrame({
            "series_id": f"s{s}",
            "bucket": np.sort(rng.choice(1000, n, replace=False)) * 10,
            "sum_y": rng.integers(-50, 50, n)}))
    df = pd.concat(frames).sample(frac=1.0, random_state=9)
    out = ols_influence(rd.from_pandas(df.reset_index(drop=True))
                        .repartition(3), step=10,
                        num_partitions=2).to_pandas()
    for s in range(3):
        sub = (df[df.series_id == f"s{s}"]
               .sort_values("bucket").reset_index(drop=True))
        t = (sub.bucket.to_numpy() - sub.bucket.min()) // 10
        y = sub.sum_y.to_numpy().astype(float)
        n = len(y)
        got = (out[out.series_id == f"s{s}"]
               .sort_values("bucket").reset_index(drop=True))
        assert list(got.t) == list(t)
        if n >= 2:
            # numpy OLS reference
            A = np.vstack([np.ones(n), t]).T
            beta, _, _, _ = np.linalg.lstsq(A, y, rcond=None)
            e_ref = y - A @ beta
            assert np.allclose(got.e.to_numpy(), e_ref, atol=1e-8)
            h_ref = 1 / n + (t - t.mean()) ** 2 / ((t - t.mean()) ** 2).sum()
            assert np.allclose(got.h.to_numpy(), h_ref, atol=1e-12)
            d_ref = e_ref ** 2 * h_ref / (1 - h_ref) ** 2
            assert np.allclose(got.d_scaled.to_numpy(), d_ref, rtol=1e-9)
        else:
            assert got.h.iloc[0] == 1.0 and got.d_scaled.iloc[0] == 0.0


def test_mis_rounds_bruteforce(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.graph import mis_rounds

    rng = np.random.default_rng(71)
    n_nodes = 25
    edges = set()
    for _ in range(40):
        u, v = map(int, rng.integers(0, n_nodes, 2))
        if u != v:
            edges.add((u, v))
            edges.add((v, u))
    eds = rd.from_pandas(pd.DataFrame(sorted(edges),
                                      columns=["src", "dst"]))
    nds = rd.from_pandas(pd.DataFrame({"node": range(n_nodes)}))
    out = mis_rounds(eds, nds, rounds=8,
                     num_partitions=3).to_pandas()
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    rem = set(range(n_nodes))
    mis = {}
    for r in range(1, 9):
        if not rem:
            break
        join = {v for v in rem
                if all(w not in rem or w > v for w in adj.get(v, ()))}
        for v in join:
            mis[v] = r
        rem -= join | {w for v in join
                       for w in adj.get(v, ()) if w in rem}
    got = {int(r.node): int(r.round) for r in out.itertuples()}
    assert got == mis
    # MIS property: no two members adjacent; maximal (every non-member
    # has a member neighbor) once the pool drained
    for v in got:
        assert not (adj.get(v, set()) & set(got))
    if not rem:
        for v in set(range(n_nodes)) - set(got):
            assert adj.get(v, set()) & set(got)


def test_g2_collocations_bruteforce(ray_session):
    import math

    import ray.data as rd

    from tsdownsample_ray.stages.cooccur import g2_collocations

    texts = ["the cat sat on the mat the cat ran",
             "the cat sat here the cat sat there",
             "a cat sat on a mat"]
    df = pd.DataFrame({"doc_id": range(3), "text": texts})
    out = g2_collocations(rd.from_pandas(df).repartition(3),
                          min_count=2, num_partitions=2).to_pandas()
    bgs = {}
    for t in texts:
        toks = t.split(" ")
        for x, y in zip(toks, toks[1:]):
            if x and y:
                bgs[(x, y)] = bgs.get((x, y), 0) + 1
    N = sum(bgs.values())
    m1 = {}
    m2 = {}
    for (x, y), c in bgs.items():
        m1[x] = m1.get(x, 0) + c
        m2[y] = m2.get(y, 0) + c

    def xlx(v):
        return v * math.log(v) if v > 0 else 0.0

    got = {(r.w1, r.w2): r for r in out.itertuples()}
    exp_keys = {k for k, c in bgs.items() if c >= 2}
    assert set(got) == exp_keys
    for (x, y) in exp_keys:
        a = bgs[(x, y)]
        b = m1[x] - a
        c = m2[y] - a
        d = N - a - b - c
        g2 = 2.0 * (xlx(a) + xlx(b) + xlx(c) + xlx(d) + xlx(N)
                    - xlx(a + b) - xlx(a + c) - xlx(b + d) - xlx(c + d))
        r = got[(x, y)]
        assert (r.a, r.b, r.c, r.d) == (a, b, c, d)
        assert r.g2 == pytest.approx(g2, rel=1e-12)


def test_boruvka_mst_matches_kruskal(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.graph import boruvka_mst

    rng = np.random.default_rng(5)
    n = 30
    edges = {}
    for _ in range(70):
        u, v = sorted(map(int, rng.integers(0, n, 2)))
        if u != v and (u, v) not in edges:
            edges[(u, v)] = int(rng.integers(1, 9))  # heavy ties
    rows = ([(u, v, w) for (u, v), w in edges.items()]
            + [(v, u, w) for (u, v), w in edges.items()])
    eds = rd.from_pandas(pd.DataFrame(rows, columns=["src", "dst", "w"]))
    nds = rd.from_pandas(pd.DataFrame({"node": range(n)}))
    out = boruvka_mst(eds, nds, rounds=8, num_partitions=3).to_pandas()
    got = sorted((int(r.u), int(r.v), int(r.w)) for r in out.itertuples())
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ref = []
    for (u, v), w in sorted(edges.items(), key=lambda kv: (kv[1], kv[0])):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            ref.append((u, v, w))
    assert got == sorted(ref)
    assert sum(w for _, _, w in got) == sum(w for _, _, w in ref)


def test_boruvka_mst_forest_on_disconnected(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.graph import boruvka_mst

    rows = [(0, 1, 5), (1, 0, 5), (2, 3, 7), (3, 2, 7)]
    eds = rd.from_pandas(pd.DataFrame(rows, columns=["src", "dst", "w"]))
    nds = rd.from_pandas(pd.DataFrame({"node": range(5)}))
    out = boruvka_mst(eds, nds, rounds=4, num_partitions=2).to_pandas()
    got = sorted((int(r.u), int(r.v), int(r.w)) for r in out.itertuples())
    assert got == [(0, 1, 5), (2, 3, 7)]
    with pytest.raises(ValueError):
        boruvka_mst(eds, nds, rounds=0)


def test_capture_recapture_query_shape(ray_session):
    from tsdownsample_ray.pipelines.queries import QUERIES

    out = QUERIES["capture_recapture_users"](
        "/root/testdata/sf0.001").to_pandas()
    assert set(out.columns) == {"event_type", "n1", "n2", "m",
                                "chapman_est"}
    for r in out.itertuples():
        assert r.m <= min(r.n1, r.n2)
        assert r.chapman_est == (r.n1 + 1) * (r.n2 + 1) // (r.m + 1) - 1


def test_wilson_interval_bruteforce(ray_session):
    import math

    import ray.data as rd

    from tsdownsample_ray.stages.abtest import wilson_interval

    rng = np.random.default_rng(73)
    rows = []
    for k in ("a", "b", "c"):
        n = int(rng.integers(5, 200))
        rows += [(k, int(x)) for x in rng.integers(0, 2, n)]
    # an all-zero key (p = 0 edge)
    rows += [("z", 0)] * 7
    df = pd.DataFrame(rows, columns=["key", "flag"])
    out = wilson_interval(rd.from_pandas(df).repartition(4),
                          key_col="key", flag_col="flag",
                          fanin=2).to_pandas().set_index("key")
    z = 1.96
    for k in ("a", "b", "c", "z"):
        flags = [f for kk, f in rows if kk == k]
        n, s = len(flags), sum(flags)
        p = s / n
        denom = 1 + z * z / n
        center = (p + z * z / (2 * n)) / denom
        half = z * math.sqrt(p * (1 - p) / n
                             + z * z / (4 * n * n)) / denom
        row = out.loc[k]
        assert (int(row.n), int(row.s)) == (n, s)
        assert row.p_hat == pytest.approx(p)
        assert row.lo == pytest.approx(center - half, rel=1e-12)
        assert row.hi == pytest.approx(center + half, rel=1e-12)
        assert 0.0 <= row.lo <= row.hi <= 1.0


def test_hrw_rebalance_bruteforce(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.dedup import _stable_u64
    from tsdownsample_ray.stages.ring import hrw_rebalance

    urls = [f"u{i}" for i in range(300)]
    df = pd.DataFrame({"url": urls})
    out = hrw_rebalance(rd.from_pandas(df).repartition(4),
                        key_col="url", n_nodes=8,
                        fanin=2).to_pandas().set_index("owner")
    exp = {}
    for u in urls:
        hs = [_stable_u64(f"n{i}|{u}".encode()) for i in range(9)]
        old = max(range(8), key=lambda i: (hs[i], -i))
        new = max(range(9), key=lambda i: (hs[i], -i))
        o = f"n{old}"
        exp.setdefault(o, [0, 0])
        exp[o][0] += 1
        exp[o][1] += int(new == 8)
    assert set(out.index) == set(exp)
    total_moved = 0
    for o, (nk, nm) in exp.items():
        assert int(out.loc[o].n_keys) == nk
        assert int(out.loc[o].n_moved) == nm
        total_moved += nm
    # HRW minimal disruption: roughly 1/9 of keys move
    assert 0 < total_moved < len(urls) // 3


def test_spc_rules_bruteforce(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.rate import spc_rules

    rng = np.random.default_rng(79)
    frames = []
    # one noisy series with an injected spike + a drift run
    y = rng.integers(-5, 6, 60)
    y[30] = 100          # rule-1 spike
    y[45:] += 50         # sustained shift -> rule 4 fires eventually
    frames.append(pd.DataFrame({"series_id": "s0",
                                "bucket": np.arange(60), "sum_y": y}))
    frames.append(pd.DataFrame({"series_id": "s1",
                                "bucket": np.arange(20),
                                "sum_y": rng.integers(-3, 4, 20)}))
    df = pd.concat(frames).sample(frac=1.0, random_state=4)
    out = spc_rules(rd.from_pandas(df.reset_index(drop=True))
                    .repartition(3), num_partitions=2).to_pandas()
    # independent reference
    got = {(r.series_id, r.bucket, r.rule) for r in out.itertuples()}
    exp = set()
    for sid in ("s0", "s1"):
        ys = (df[df.series_id == sid].sort_values("bucket")
              .sum_y.to_numpy().astype(int))
        m = len(ys)
        med = int(np.sort(ys)[(m - 1) // 2])
        diffs = sorted(abs(int(a) - int(b))
                       for i, a in enumerate(ys) for b in ys[i + 1:])
        qn = diffs[(len(diffs) - 1) // 2]
        dev = ys - med
        sgn = np.sign(dev)
        ad = np.abs(dev)
        for i in range(m):
            if ad[i] > 3 * qn:
                exp.add((sid, i, 1))
            if ad[i] > 2 * qn and any(
                    j >= 0 and ad[j] > 2 * qn and sgn[j] == sgn[i]
                    for j in (i - 1, i - 2)):
                exp.add((sid, i, 2))
            if ad[i] > qn and sum(
                    1 for j in range(i - 4, i)
                    if j >= 0 and ad[j] > qn and sgn[j] == sgn[i]) >= 3:
                exp.add((sid, i, 3))
            if sgn[i] != 0 and i >= 8 and all(
                    sgn[j] == sgn[i] for j in range(i - 8, i)):
                exp.add((sid, i, 4))
    assert got == exp
    assert any(r == 1 for _, _, r in exp)
    assert any(r == 4 for _, _, r in exp)


def test_single_linkage_bruteforce(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.graph import single_linkage

    rng = np.random.default_rng(83)
    n = 25
    edges = {}
    for _ in range(50):
        u, v = sorted(map(int, rng.integers(0, n, 2)))
        if u != v and (u, v) not in edges:
            edges[(u, v)] = int(rng.integers(1, 8))
    rows = ([(u, v, w) for (u, v), w in edges.items()]
            + [(v, u, w) for (u, v), w in edges.items()])
    eds = rd.from_pandas(pd.DataFrame(rows, columns=["src", "dst", "w"]))
    nds = rd.from_pandas(pd.DataFrame({"node": range(n)}))
    T = 3
    out = single_linkage(eds, nds, threshold=T, rounds=8,
                         num_partitions=2).to_pandas()
    # reference: components of the thresholded graph (the theorem)
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for (u, v), w in edges.items():
        if w <= T:
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[max(ru, rv)] = min(ru, rv)
    exp = {}
    for i in range(n):
        exp[find(i)] = exp.get(find(i), 0) + 1
    got = dict(zip(out.cluster, out.n_nodes))
    assert got == exp
    assert sum(got.values()) == n


def test_wl_refinement_bruteforce(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.dedup import _stable_u64
    from tsdownsample_ray.stages.graph import wl_refinement

    edges = [(0, 1), (1, 2), (2, 0), (3, 4)]  # triangle + edge + iso 5
    both = edges + [(b, a) for a, b in edges]
    eds = rd.from_pandas(pd.DataFrame(both, columns=["src", "dst"]))
    nds = rd.from_pandas(pd.DataFrame({"node": range(6)}))
    out = wl_refinement(eds, nds, fanin=2).to_pandas()
    adj = {}
    for a, b in both:
        adj.setdefault(a, []).append(b)
    exp = {}
    for v in range(6):
        deg = len(adj.get(v, []))
        nds_deg = sorted(len(adj.get(w, [])) for w in adj.get(v, []))
        s = f"{deg}:[{','.join(str(d) for d in nds_deg)}]"
        c = _stable_u64(s.encode()) - (1 << 63)
        exp[c] = exp.get(c, 0) + 1
    got = dict(zip(out.wl_color, out.n_nodes))
    assert got == exp
    assert sum(got.values()) == 6


def test_rake_word_scores_bruteforce(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.textstats import rake_word_scores

    texts = ["deep learning of the neural net",
             "the deep net and a deep deep stack",
             "a  lone"]  # double space: empty token breaks the run
    df = pd.DataFrame({"doc_id": range(3), "text": texts})
    out = rake_word_scores(rd.from_pandas(df).repartition(3),
                           num_partitions=2).to_pandas()
    stop = {"the", "a", "an", "and", "of"}
    freq, deg = {}, {}
    for t in texts:
        run = []
        for tok in t.split(" ") + [""]:
            if tok in stop or tok == "":
                for wd in run:
                    freq[wd] = freq.get(wd, 0) + 1
                    deg[wd] = deg.get(wd, 0) + len(run)
                run = []
            else:
                run.append(tok)
    got = {r.word: (r.freq, r.deg) for r in out.itertuples()}
    assert got == {w: (freq[w], deg[w]) for w in freq}
    for r in out.itertuples():
        assert r.score == pytest.approx(r.deg / r.freq)
    # the doubled word in one phrase counts twice (RAKE convention)
    assert got["deep"][0] == 4


def test_katz_rounds_bruteforce(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.graph import katz_rounds

    rng = np.random.default_rng(89)
    n = 20
    edges = set()
    for _ in range(40):
        u, v = map(int, rng.integers(0, n, 2))
        if u != v:
            edges.add((u, v))
            edges.add((v, u))
    eds = rd.from_pandas(pd.DataFrame(sorted(edges),
                                      columns=["src", "dst"]))
    nds = rd.from_pandas(pd.DataFrame({"node": range(n)}))
    out = katz_rounds(eds, nds, rounds=4,
                      num_partitions=2).to_pandas().set_index("node")
    x = {v: 1000 for v in range(n)}
    inn = {}
    for a, b in edges:
        inn.setdefault(b, []).append(a)
    for _ in range(4):
        x = {v: 1000 + sum(x[a] for a in inn.get(v, [])) // 8
             for v in range(n)}
    for v in range(n):
        assert int(out.loc[v].katz) == x[v], v


def test_term_adaptation_bruteforce(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.textstats import term_adaptation

    texts = ["cat cat dog", "dog bird", "cat fish fish fish"]
    df = pd.DataFrame({"doc_id": range(3), "text": texts})
    out = term_adaptation(rd.from_pandas(df).repartition(3),
                          min_df=1, num_partitions=2) \
        .to_pandas().set_index("token")
    from collections import Counter

    cf = Counter(t for s in texts for t in s.split())
    dfc = Counter(t for s in texts for t in set(s.split()))
    for tok in cf:
        row = out.loc[tok]
        assert (int(row.cf), int(row.df)) == (cf[tok], dfc[tok])
        assert row.burstiness == pytest.approx(cf[tok] / dfc[tok])
        assert row.adaptation == pytest.approx(
            (cf[tok] - dfc[tok]) / cf[tok])


def test_log_odds_contrast_bruteforce(ray_session):
    import math

    import ray.data as rd

    from tsdownsample_ray.stages.textstats import log_odds_contrast

    texts = [("alpha beta beta gamma", "s0"), ("beta gamma", "s2"),
             ("alpha alpha delta", "s1"), ("delta beta", "s3")]
    df = pd.DataFrame(texts, columns=["text", "source"])
    out = log_odds_contrast(rd.from_pandas(df).repartition(2),
                            min_cf=1, num_partitions=2) \
        .to_pandas().set_index("token")
    from collections import Counter

    c1 = Counter(t for s, g in texts if int(g[1:]) % 2 == 0
                 for t in s.split())
    c2 = Counter(t for s, g in texts if int(g[1:]) % 2 == 1
                 for t in s.split())
    vocab = len(set(c1) | set(c2))
    n1, n2 = sum(c1.values()), sum(c2.values())
    for tok in set(c1) | set(c2):
        x1, x2 = c1.get(tok, 0), c2.get(tok, 0)
        a, av = 1.0, float(vocab)
        delta = (math.log((x1 + a) / (n1 + av - x1 - a))
                 - math.log((x2 + a) / (n2 + av - x2 - a)))
        var = 1.0 / (x1 + a) + 1.0 / (x2 + a)
        row = out.loc[tok]
        assert (int(row.c1), int(row.c2)) == (x1, x2)
        assert row.delta == pytest.approx(delta, rel=1e-12)
        assert row.z == pytest.approx(delta / math.sqrt(var), rel=1e-12)


def test_double_sweep_bruteforce(ray_session):
    from collections import deque

    import ray.data as rd

    from tsdownsample_ray.stages.graph import double_sweep

    rng = np.random.default_rng(97)
    n = 30
    edges = set()
    for _ in range(45):
        u, v = map(int, rng.integers(0, n, 2))
        if u != v:
            edges.add((u, v))
            edges.add((v, u))
    eds = rd.from_pandas(pd.DataFrame(sorted(edges),
                                      columns=["src", "dst"]))
    nds = rd.from_pandas(pd.DataFrame({"node": range(n)}))
    out = double_sweep(eds, nds, rounds=10,
                       num_partitions=2).to_pandas().iloc[0]
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)

    def bfs(s, cap=10):
        hop = {s: 0}
        q = deque([s])
        while q:
            v = q.popleft()
            if hop[v] >= cap:
                continue
            for w in adj.get(v, ()):
                if w not in hop:
                    hop[w] = hop[v] + 1
                    q.append(w)
        return hop

    h0 = bfs(0)
    ecc0 = max(h0.values())
    far = min(v for v, h in h0.items() if h == ecc0)
    h1 = bfs(far)
    assert int(out.src_node) == 0
    assert int(out.src_ecc) == ecc0
    assert int(out.far_node) == far
    assert int(out.far_ecc) == max(h1.values())


def test_greedy_set_cover_bruteforce(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.curation import greedy_set_cover

    docs = [("a b c d", "s1"), ("c d e", "s2"), ("e f", "s3"),
            ("a f g", "s4"), ("g", "s5")]
    df = pd.DataFrame(docs, columns=["text", "source"])
    out = greedy_set_cover(rd.from_pandas(df).repartition(3),
                           num_partitions=2).to_pandas()
    sets = {}
    for t, s in docs:
        sets.setdefault(s, set()).update(t.split())
    covered = set()
    exp = []
    for pick in range(1, 10):
        best_g, best_new = None, 0
        for g in sorted(sets):
            new = len(sets[g] - covered)
            if new > best_new:
                best_g, best_new = g, new
        if best_g is None:
            break
        covered |= sets[best_g]
        exp.append((pick, best_g, best_new, len(covered)))
    got = [(r.pick, r.grp, r.newly_covered, r.covered_total)
           for r in out.sort_values("pick").itertuples()]
    assert got == exp


def test_k_anonymity_audit_bruteforce(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.curation import k_anonymity_audit

    rng = np.random.default_rng(101)
    df = pd.DataFrame({"qa": rng.integers(0, 6, 200),
                       "qb": rng.integers(0, 4, 200)})
    out = k_anonymity_audit(rd.from_pandas(df).repartition(4),
                            quasi_cols=("qa", "qb"), k=8,
                            num_partitions=2).to_pandas().iloc[0]
    sizes = df.groupby(["qa", "qb"]).size()
    assert int(out.n_classes) == len(sizes)
    assert int(out.n_violating) == int((sizes < 8).sum())
    assert int(out.rows_at_risk) == int(sizes[sizes < 8].sum())
    assert int(out.k) == 8


def test_sprt_decide_bruteforce(ray_session):
    import math

    import ray.data as rd

    from tsdownsample_ray.stages.abtest import sprt_decide

    rng = np.random.default_rng(103)
    rows = []
    for u, p in [(0, 0.9), (1, 0.1), (2, 0.5)]:
        for i in range(60):
            rows.append((u, int(rng.random() < p), i, i))
    df = pd.DataFrame(rows, columns=["user_id", "x", "ts_us", "event_id"])
    out = sprt_decide(rd.from_pandas(df).repartition(3),
                      key_col="user_id", flag_col="x",
                      order_cols=("ts_us", "event_id"),
                      num_partitions=2).to_pandas().set_index("user_id")
    c1 = math.log(0.6 / 0.4)
    c0 = math.log((1.0 - 0.6) / (1.0 - 0.4))
    up = math.log((1.0 - 0.05) / 0.05)
    lo = math.log(0.05 / (1.0 - 0.05))
    for u in (0, 1, 2):
        xs = [x for uu, x, _, _ in rows if uu == u]
        s = 0
        dec, td, sd = "continue", 0, 0
        for t, x in enumerate(xs, 1):
            s += x
            llr = float(s) * c1 + float(t - s) * c0
            if llr >= up:
                dec, td, sd = "accept_h1", t, s
                break
            if llr <= lo:
                dec, td, sd = "accept_h0", t, s
                break
        row = out.loc[u]
        assert row.decision == dec, u
        assert (int(row.t_decide), int(row.s_decide)) == (td, sd)
        assert int(row.n) == 60 and int(row.s_total) == sum(xs)
    assert out.loc[0].decision == "accept_h1"
    assert out.loc[1].decision == "accept_h0"


def test_bwt_stats_bruteforce(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.compress import bwt_stats
    from tsdownsample_ray.stages.dedup import _stable_u64

    texts = {0: "banana", 7: "abracadabra abra", 14: "zzzzz",
             3: "skipped (not % 7)", 21: "x" * 500}
    df = pd.DataFrame({"doc_id": list(texts),
                       "text": list(texts.values())})
    out = bwt_stats(rd.from_pandas(df).repartition(3), max_chars=400,
                    modulus=7).to_pandas().set_index("doc_id")
    assert set(out.index) == {0, 7, 14}  # 3 fails %7, 21 too long
    for d in (0, 7, 14):
        s2 = texts[d] + "~"
        n = len(s2)
        rots = sorted(s2[i:] + s2[:i] for i in range(n))
        bwt = "".join(r[-1] for r in rots)
        row = out.loc[d]
        assert int(row.n) == n
        assert int(row.bwt_hash) == _stable_u64(bwt.encode()) - (1 << 63)
        assert int(row.runs_bwt) == 1 + sum(
            1 for j in range(1, n) if bwt[j] != bwt[j - 1])
        assert int(row.runs_text) == 1 + sum(
            1 for j in range(1, n) if s2[j] != s2[j - 1])
    # banana~ -> BWT clusters repeats
    assert int(out.loc[0].runs_bwt) <= int(out.loc[0].runs_text)


def test_bwt_sentinel_validation(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.compress import bwt_stats

    df = pd.DataFrame({"doc_id": [0], "text": ["bad~text"]})
    with pytest.raises(Exception):
        bwt_stats(rd.from_pandas(df), modulus=1).to_pandas()


def test_knapsack_dp_bruteforce(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.curation import knapsack_dp

    rng = np.random.default_rng(107)
    items = [(int(rng.integers(1, 8)), int(rng.integers(1, 40)))
             for _ in range(30)]
    df = pd.DataFrame(items, columns=["wt", "val"])
    B = 25
    # partition-invariance: two different repartitions, same answer
    out1 = knapsack_dp(rd.from_pandas(df).repartition(5),
                       budget=B).to_pandas().sort_values("w")
    out2 = knapsack_dp(rd.from_pandas(df).repartition(2),
                       budget=B).to_pandas().sort_values("w")
    dp = [0] * (B + 1)
    for w, v in items:
        for c in range(B, w - 1, -1):
            dp[c] = max(dp[c], dp[c - w] + v)
    assert list(out1.best) == dp
    assert list(out2.best) == dp
    assert list(out1.w) == list(range(B + 1))
    with pytest.raises(Exception):
        knapsack_dp(rd.from_pandas(pd.DataFrame(
            {"wt": [0], "val": [1]})), budget=5).to_pandas()
