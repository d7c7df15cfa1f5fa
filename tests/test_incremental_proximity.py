"""merge_tiers exactness and min_cover_window brute-force replay."""

import numpy as np
import pandas as pd


def test_merge_tiers_equals_full_rebuild(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.rollup import merge_tiers, rollup

    rng = np.random.default_rng(8)
    n = 4000
    df = pd.DataFrame({
        "series_id": rng.choice(["a", "b", "c"], n),
        "x": rng.integers(0, 10_000_000, n).astype(np.int64),
        "y": rng.integers(-500, 500, n).astype(np.int64)})
    w = 100_000
    full = rollup(rd.from_pandas(df).repartition(4), w).to_pandas() \
        .sort_values(["series_id", "bucket"]).reset_index(drop=True)
    # three disjoint slices, uneven sizes
    m = np.arange(n) % 5
    parts = [rollup(rd.from_pandas(df[m == 0]).repartition(2), w),
             rollup(rd.from_pandas(df[(m == 1) | (m == 2)])
                    .repartition(3), w),
             rollup(rd.from_pandas(df[m >= 3]).repartition(2), w)]
    merged = merge_tiers(*parts).to_pandas() \
        .sort_values(["series_id", "bucket"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(merged[full.columns], full)


def test_min_cover_window_matches_bruteforce(ray_session):
    import itertools

    import ray.data as rd

    from tsdownsample_ray.stages.retrieval import min_cover_window

    rng = np.random.default_rng(3)
    vocab = ["x", "y", "z", "w", "u"]
    rows = [{"doc_id": int(i),
             "text": " ".join(rng.choice(vocab, rng.integers(1, 40)))}
            for i in range(300)]
    terms = ("x", "y", "z")
    ds = rd.from_pandas(pd.DataFrame(rows)).repartition(5)
    out = min_cover_window(ds, terms).to_pandas() \
        .set_index("doc_id").sort_index()

    exp = {}
    for r in rows:
        toks = r["text"].split(" ")
        posl = [[i for i, t in enumerate(toks) if t == q] for q in terms]
        if any(not p for p in posl):
            continue
        best = min(max(c) - min(c) + 1
                   for c in itertools.product(*posl))
        exp[r["doc_id"]] = (tuple(len(p) for p in posl), best)
    assert set(out.index) == set(exp)
    for did, (ns, best) in exp.items():
        assert tuple(out.loc[did, ["n_0", "n_1", "n_2"]]) == ns
        assert out.loc[did, "min_span"] == best


def test_activity_selection_greedy_optimal(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.intervals import activity_selection

    rng = np.random.default_rng(12)
    rows = []
    for uid in range(20):
        for _ in range(int(rng.integers(1, 30))):
            s = int(rng.integers(0, 1000))
            rows.append({"user_id": uid, "start": s,
                         "end": s + int(rng.integers(0, 100))})
    df = pd.DataFrame(rows)
    out = activity_selection(
        rd.from_pandas(df.sample(frac=1.0, random_state=0))
        .repartition(4), key_col="user_id", num_partitions=3) \
        .to_pandas().set_index("user_id").sort_index()

    for uid, g in df.groupby("user_id"):
        iv = sorted(zip(g["end"], g["start"]))
        cnt, last = 0, None
        for e, s in iv:
            if last is None or s >= last:
                cnt += 1
                last = e
        # brute-force optimality check on small users (greedy == max
        # independent set size for intervals)
        if len(iv) <= 12:
            import itertools

            best = 0
            ivs = [(s, e) for e, s in iv]
            for r in range(len(ivs), 0, -1):
                found = False
                for comb in itertools.combinations(ivs, r):
                    cs = sorted(comb, key=lambda p: p[1])
                    if all(cs[i + 1][0] >= cs[i][1]
                           for i in range(len(cs) - 1)):
                        found = True
                        break
                if found:
                    best = r
                    break
            assert cnt == best
        assert out.loc[uid, "n_selected"] == cnt
        assert out.loc[uid, "n_intervals"] == len(iv)
        assert out.loc[uid, "last_end"] == last


def test_ransac_line_matches_brute(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.quantiles import ransac_line

    rng = np.random.default_rng(9)
    frames = []
    for sid in ("s1", "s2"):
        n = int(rng.integers(20, 80))
        base = 5 * np.arange(n) + rng.integers(-10, 11, n)
        out_i = rng.choice(n, n // 5, replace=False)
        base[out_i] += rng.integers(300, 800, len(out_i))  # gross outliers
        frames.append(pd.DataFrame({
            "series_id": sid, "bucket": np.arange(n, dtype=np.int64) * 10,
            "sum_y": base.astype(np.int64)}))
    df = pd.concat(frames, ignore_index=True)
    eps = 15
    out = ransac_line(
        rd.from_pandas(df.sample(frac=1.0, random_state=2)).repartition(3),
        eps=eps, anchors=8, num_partitions=2).to_pandas() \
        .set_index("series_id")

    for sid, g in df.groupby("series_id"):
        ys = g.sort_values("bucket")["sum_y"].to_numpy()
        n = len(ys)
        ar = [i * n // 8 for i in range(8)]
        best = (-1, 0, 0)
        for i in range(8):
            for j in range(i + 1, 8):
                r1, r2 = ar[i], ar[j]
                if r1 == r2:
                    continue
                dx, dy = r2 - r1, int(ys[r2]) - int(ys[r1])
                cnt = int(sum(
                    abs((int(y) - int(ys[r1])) * dx - (x - r1) * dy)
                    <= eps * dx for x, y in enumerate(ys)))
                if cnt > best[0]:
                    best = (cnt, i, j)
        assert out.loc[sid, "n_inliers"] == best[0]
        assert out.loc[sid, "c_i"] == best[1]
        assert out.loc[sid, "c_j"] == best[2]
        # the consensus line shrugs off the planted outliers
        assert best[0] >= 0.7 * n


def test_soundex_canonical_examples():
    from tsdownsample_ray.stages.strsim import soundex

    # census.gov / Knuth examples (lower-case input contract)
    for t, exp in {"robert": "R163", "rupert": "R163",
                   "ashcraft": "A261", "ashcroft": "A261",
                   "tymczak": "T522", "pfister": "P236",
                   "honeyman": "H555", "jackson": "J250",
                   "a": "A000", "hw": "H000"}.items():
        assert soundex(t) == exp, t


def test_soundex_blocks_vocabulary(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.strsim import soundex, soundex_blocks

    docs = pd.DataFrame({"text": [
        "robert rupert met ashcraft", "ashcroft saw robert 42x",
        "tymczak pfister honeyman", "pfister again and again"]})
    out = soundex_blocks(rd.from_pandas(docs).repartition(2),
                         num_partitions=2).to_pandas() \
        .set_index("code").sort_index()
    vocab = sorted({t for s in docs["text"] for t in s.split(" ")
                    if t.isalpha() and t.islower()})
    exp = {}
    for t in vocab:
        exp.setdefault(soundex(t), []).append(t)
    assert set(out.index) == set(exp)
    for code, terms in exp.items():
        assert out.loc[code, "n_terms"] == len(terms)
        assert out.loc[code, "min_term"] == min(terms)
    assert out.loc["R163", "n_terms"] == 2  # robert + rupert blocked


def test_gapfill_seasonal_matches_brute(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.gapfill import gapfill_seasonal

    rng = np.random.default_rng(14)
    W, m = 100, 6
    frames = []
    for sid in ("a", "b"):
        buckets = np.arange(0, 60) * W
        keep = rng.random(60) > 0.3
        keep[0] = keep[-1] = True
        frames.append(pd.DataFrame({
            "series_id": sid, "bucket": buckets[keep],
            "sum_y": rng.integers(-100, 100, keep.sum()).astype(np.int64)}))
    df = pd.concat(frames, ignore_index=True)
    out = gapfill_seasonal(
        rd.from_pandas(df.sample(frac=1.0, random_state=3)).repartition(3),
        W, m=m, num_partitions=2).to_pandas() \
        .sort_values(["series_id", "bucket"]).reset_index(drop=True)

    rows = []
    for sid, g in df.groupby("series_id"):
        present = dict(zip(g["bucket"], g["sum_y"]))
        slots = {}
        for b, y in present.items():
            sl = (b // W) % m
            s, c = slots.get(sl, (0, 0))
            slots[sl] = (s + y, c + 1)
        for b in range(g["bucket"].min(), g["bucket"].max() + 1, W):
            if b in present:
                rows.append((sid, b, int(present[b]), False))
            else:
                s, c = slots.get((b // W) % m, (0, 0))
                rows.append((sid, b, s // c if c else 0, True))
    exp = pd.DataFrame(rows, columns=["series_id", "bucket", "y",
                                      "is_gap"])
    pd.testing.assert_frame_equal(
        out[exp.columns].astype(exp.dtypes.to_dict()), exp)
