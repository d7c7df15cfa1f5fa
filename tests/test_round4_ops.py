"""Round-4 operators: Kendall tau-b, ordinal patterns, HITS,
reciprocity, assortativity, KMV sketch, log2-histogram quantiles —
each replayed against an independent brute-force / DuckDB oracle on
seeded data (partitioning must not change any value)."""

import math

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def rolled_df():
    rng = np.random.default_rng(7)
    n = 4000
    df = pd.DataFrame({
        "series_id": rng.choice(["a", "b", "c", "d"], n),
        "bucket": rng.integers(0, 300, n) * 900,
        "sum_y": rng.integers(-50, 50, n).astype(np.int64),
    })
    return df.groupby(["series_id", "bucket"], as_index=False).agg(
        sum_y=("sum_y", "sum"))


def test_kendall_pairs_matches_bruteforce(ray_session, rolled_df):
    import ray.data as rd

    from tsdownsample_ray.stages.correlate import kendall_pairs

    ds = rd.from_pandas(rolled_df).repartition(5)
    out = kendall_pairs(ds, num_partitions=2).to_pandas().sort_values(
        ["s1", "s2"]).reset_index(drop=True)

    piv = rolled_df.pivot(index="bucket", columns="series_id",
                          values="sum_y")
    for _, row in out.iterrows():
        sub = piv[[row.s1, row.s2]].dropna()
        x = sub[row.s1].to_numpy(np.int64)
        y = sub[row.s2].to_numpy(np.int64)
        assert row.n == len(x)
        nc = nd = tx = ty = txy = 0
        for i in range(len(x)):
            dx = np.sign(x[i + 1:] - x[i])
            dy = np.sign(y[i + 1:] - y[i])
            nc += int(((dx * dy) > 0).sum())
            nd += int(((dx * dy) < 0).sum())
            tx += int(((dx == 0) & (dy != 0)).sum())
            ty += int(((dy == 0) & (dx != 0)).sum())
            txy += int(((dx == 0) & (dy == 0)).sum())
        assert (row.nc, row.nd, row.tie_x, row.tie_y, row.tie_xy) == \
            (nc, nd, tx, ty, txy)
        n0 = row.n * (row.n - 1) / 2.0
        d1, d2 = n0 - (tx + txy), n0 - (ty + txy)
        if d1 > 0 and d2 > 0:
            assert row.tau == (nc - nd) / math.sqrt(d1 * d2)
        else:
            assert pd.isna(row.tau)


def test_ordinal_patterns_matches_replay(ray_session, rolled_df):
    import ray.data as rd

    from tsdownsample_ray.stages.sax import ordinal_patterns

    ds = rd.from_pandas(rolled_df).repartition(4)
    out = ordinal_patterns(ds, num_partitions=2).to_pandas()

    exp = {}
    for sid, g in rolled_df.sort_values("bucket").groupby("series_id"):
        v = g["sum_y"].to_numpy(np.int64)
        for i in range(len(v) - 2):
            code = (4 * int(v[i] <= v[i + 1]) + 2 * int(v[i] <= v[i + 2])
                    + int(v[i + 1] <= v[i + 2]))
            exp[(sid, code)] = exp.get((sid, code), 0) + 1
    got = {(r.series_id, r.pattern): r.n for r in out.itertuples()}
    assert got == exp
    assert not any(p in (2, 5) for _, p in got)  # transitivity-excluded


@pytest.fixture(scope="module")
def edges_df():
    rng = np.random.default_rng(3)
    return pd.DataFrame({"src": rng.integers(0, 50, 400),
                         "dst": rng.integers(0, 50, 400)})


def test_hits_matches_python_replay(ray_session, edges_df):
    import ray.data as rd

    from tsdownsample_ray.stages.graph import hits

    nodes = pd.DataFrame({"doc_id": np.arange(50)})
    out = hits(rd.from_pandas(edges_df).repartition(3),
               rd.from_pandas(nodes).repartition(2),
               iters=3).to_pandas().sort_values("doc_id").reset_index(
                   drop=True)
    SC = 10 ** 6
    hh = {v: SC for v in nodes.doc_id}
    aa = {v: 0 for v in nodes.doc_id}
    for _ in range(3):
        s = {}
        for r in edges_df.itertuples():
            s[r.dst] = s.get(r.dst, 0) + hh.get(r.src, 0)
        mx = max(s.values(), default=0)
        aa = {v: s.get(v, 0) * SC // mx if mx else 0 for v in nodes.doc_id}
        s2 = {}
        for r in edges_df.itertuples():
            s2[r.src] = s2.get(r.src, 0) + aa.get(r.dst, 0)
        mx2 = max(s2.values(), default=0)
        hh = {v: s2.get(v, 0) * SC // mx2 if mx2 else 0
              for v in nodes.doc_id}
    assert list(out.hub_e6) == [hh[v] for v in nodes.doc_id]
    assert list(out.auth_e6) == [aa[v] for v in nodes.doc_id]


def test_reciprocity_and_assortativity(ray_session, edges_df):
    import ray.data as rd

    from tsdownsample_ray.stages.graph import (degree_assortativity,
                                               reciprocity)

    eds = rd.from_pandas(edges_df).repartition(3)
    d = edges_df.query("src != dst").drop_duplicates()
    rset = set(zip(d.src, d.dst))
    n_recip = sum((b, a) in rset for a, b in rset)
    r = reciprocity(eds)
    assert r.n_edges[0] == len(rset) and r.n_recip[0] == n_recip
    assert math.gcd(int(r.recip_num[0]), int(r.recip_den[0])) == 1

    a = degree_assortativity(eds).to_pandas()
    od = d.groupby("src").size()
    idg = d.groupby("dst").size()
    x = d.src.map(od).to_numpy(np.int64)
    y = d.dst.map(idg).to_numpy(np.int64)
    assert a.n[0] == len(x) and a.sum_xy[0] == int((x * y).sum())
    num = len(x) * (x * y).sum() - x.sum() * y.sum()
    den = math.sqrt((len(x) * (x * x).sum() - x.sum() ** 2)
                    * (len(x) * (y * y).sum() - y.sum() ** 2))
    assert abs(a["corr"][0] - num / den) < 1e-12


def test_kmv_distinct_small_keys_exact_and_partition_invariant(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.sketches import kmv_distinct

    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "domain": rng.choice(["a", "b", "c"], 3000),
        "url": [f"u{i % 700}" for i in range(3000)]})
    outs = []
    for parts in (2, 7):
        ds = rd.from_pandas(df).repartition(parts)
        out = kmv_distinct(ds, key_col="domain", value_col="url",
                           k=32).to_pandas().sort_values(
                               "domain").reset_index(drop=True)
        outs.append(out)
    assert outs[0].equals(outs[1])  # partition-invariant
    exact = df.groupby("domain").url.nunique()
    for r in outs[0].itertuples():
        assert r.kmv_kept == min(32, exact[r.domain])
        if exact[r.domain] < 32:
            assert r.kmv_est == exact[r.domain]  # under-k keys are exact
        else:  # KMV accuracy: ~1/sqrt(k) relative error, generous band
            assert abs(r.kmv_est - exact[r.domain]) / exact[r.domain] < 0.6


def test_log2hist_quantiles_bounds_and_replay(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.sketches import log2hist_quantiles

    rng = np.random.default_rng(11)
    df = pd.DataFrame({"k": rng.choice(["x", "y"], 5000),
                       "v": rng.integers(1, 100000, 5000).astype(np.int64)})
    out = log2hist_quantiles(
        rd.from_pandas(df).repartition(4), key_col="k",
        value_col="v").to_pandas().set_index("k")
    for key, g in df.groupby("k"):
        v = np.sort(g.v.to_numpy())
        n = len(v)
        for q in (50, 90, 99):
            rank = -(-q * n // 100)
            true = v[rank - 1]
            b = int(out.loc[key, f"q{q}_bucket"])
            lo = int(out.loc[key, f"q{q}_lo"])
            assert lo == 1 << b
            assert lo <= true < 2 * lo  # factor-2 sketch guarantee


def test_log2hist_rejects_nonpositive(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.sketches import log2hist_quantiles

    df = pd.DataFrame({"k": ["a", "a"], "v": [3, 0]})
    with pytest.raises(Exception):
        log2hist_quantiles(rd.from_pandas(df), key_col="k",
                           value_col="v").to_pandas()


def test_gif_codec_roundtrip():
    from tsdownsample_ray.functions.gif import decode_gif, encode_gif

    rng = np.random.default_rng(0)
    for h, w in ((40, 8), (1, 8), (300, 8), (64, 64)):
        img = rng.integers(0, 256, (h, w), dtype=np.uint8)
        rt = decode_gif(encode_gif(img))
        assert rt.shape == (h, w, 3)
        assert (rt == img[..., None]).all()
    # repetitive text: dictionary growth across width boundaries + the
    # 4096-entry reset; long zero runs: the KwKwK case
    txt = np.frombuffer(b"the quick brown fox " * 2000, np.uint8)
    img = txt[: (len(txt) // 8) * 8].reshape(-1, 8)
    assert (decode_gif(encode_gif(img))[..., 0] == img).all()
    payload = encode_gif(img)
    assert len(payload) < img.size * 0.25  # real LZW compression
    assert (decode_gif(encode_gif(np.zeros((600, 8), np.uint8))) == 0).all()


def test_gif_decoder_rejects_garbage():
    from tsdownsample_ray.functions.gif import decode_gif

    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF" + b"\x00" * 32)


def test_chi2_contingency_matches_replay(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.abtest import chi2_contingency

    rng = np.random.default_rng(9)
    df = pd.DataFrame({"r": rng.choice(["a", "b", "c"], 2000),
                       "c": rng.choice(["x", "y", "z", "w"], 2000)})
    out = chi2_contingency(rd.from_pandas(df).repartition(4),
                           row_col="r", col_col="c").to_pandas()
    o = df.groupby(["r", "c"]).size()
    rt, ct, N = df.r.value_counts(), df.c.value_counts(), len(df)
    chi2_e = 0
    for a in sorted(df.r.unique()):
        for b in sorted(df.c.unique()):
            ov = int(o.get((a, b), 0))
            rc = int(rt[a]) * int(ct[b])
            chi2_e += ((ov * N - rc) ** 2 * 10 ** 6) // (N * rc)
    assert out.chi2_e6[0] == chi2_e
    assert out.dof[0] == 6
    # sanity vs the float statistic
    chi2 = sum((int(o.get((a, b), 0)) - rt[a] * ct[b] / N) ** 2
               / (rt[a] * ct[b] / N)
               for a in df.r.unique() for b in df.c.unique())
    assert abs(out.chi2_e6[0] / 1e6 - chi2) < 1e-3 * max(chi2, 1)


def test_holt_winters_matches_python_replay(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.smoothing import holt_winters_fixed_point

    rng = np.random.default_rng(13)
    W = 3_600_000_000
    rows = []
    for sid in ("a", "b"):
        base = rng.integers(100, 200)
        for i in range(100):
            rows.append((sid, i * W,
                         int(base + 20 * np.sin(i % 24) + rng.integers(-5, 6))))
    df = pd.DataFrame(rows, columns=["series_id", "bucket", "sum_y"])
    out = holt_winters_fixed_point(
        rd.from_pandas(df).repartition(3), 3, 4, 3, m=24, window_us=W,
        num_partitions=2).to_pandas().sort_values(
            ["series_id", "bucket"]).reset_index(drop=True)
    exp_rows = []
    for sid, g in df.groupby("series_id"):
        level = trend = 0
        season = [0] * 24
        for i, r in enumerate(g.sort_values("bucket").itertuples()):
            sj = (r.bucket // W) % 24
            if i == 0:
                level, trend, season = r.sum_y, 0, [0] * 24
                f, s_out = r.sum_y, 0
            else:
                f = level + trend + season[sj]
                nl = (level + trend) + ((r.sum_y - f) >> 3)
                trend = trend + ((nl - level - trend) >> 4)
                level = nl
                season[sj] += (r.sum_y - level - season[sj]) >> 3
                s_out = season[sj]
            exp_rows.append((sid, r.bucket, r.sum_y, level, trend, s_out, f))
    exp = pd.DataFrame(exp_rows, columns=[
        "series_id", "bucket", "y", "level", "trend", "seasonal",
        "forecast"]).sort_values(["series_id", "bucket"]).reset_index(
            drop=True)
    assert out.astype({c: "int64" for c in exp.columns[1:]}).equals(
        exp.astype({c: "int64" for c in exp.columns[1:]}))


def test_keyword_tag_and_snaive_and_twohop_run(ray_session):
    """sf0.001 smoke: shapes + internal invariants (values are
    hash-verified vs DuckDB by tools/check_correctness)."""
    from tsdownsample_ray.pipelines.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    kw = QUERIES["keyword_tag_docs"](sf).to_pandas()
    assert set(kw.columns) == {"pattern", "n_docs", "n_occurrences"}
    assert (kw.n_occurrences >= kw.n_docs).all()

    bt = QUERIES["backtest_snaive_1h"](sf).to_pandas()
    assert (bt.n_naive == bt.n_forecasts + 23).all()  # 24-lag vs 1-lag
    assert (bt.mase > 0).all()

    th = QUERIES["twohop_docs"](sf).to_pandas()
    # <= 3 one-hop + 9 two-hop distinct targets per node
    assert th.n_within_2.between(1, 12).all()


def test_personalized_pagerank_seeds_and_zeros(ray_session, edges_df):
    import ray.data as rd

    from tsdownsample_ray.stages.graph import pagerank

    nodes = pd.DataFrame({"doc_id": np.arange(50)})
    seeds = pd.DataFrame({"doc_id": [0, 17, 34]})
    out = pagerank(rd.from_pandas(edges_df).repartition(3),
                   rd.from_pandas(nodes).repartition(2), iters=3,
                   seeds_ds=rd.from_pandas(seeds),
                   num_partitions=2, fanin=2).to_pandas().sort_values(
                       "doc_id").reset_index(drop=True)
    assert len(out) == 50
    # python replay
    SC, DAMP, DEN = 10 ** 9, 85, 100
    tele = (DEN - DAMP) * SC // DEN
    deg = edges_df.groupby("src").size().to_dict()
    r = {v: (SC if v in (0, 17, 34) else 0) for v in range(50)}
    for _ in range(3):
        nxt = {v: (tele if v in (0, 17, 34) else 0) for v in range(50)}
        for e in edges_df.itertuples():
            nxt[e.dst] += (DAMP * r[e.src]) // (DEN * deg[e.src])
        r = nxt
    assert list(out.pr_e9) == [r[v] for v in range(50)]


def test_vocab_overlap_identities(ray_session):
    from tsdownsample_ray.pipelines.queries import QUERIES

    out = QUERIES["vocab_overlap_sources"](
        "/root/testdata/sf0.001").to_pandas()
    assert len(out) == 190  # C(20, 2)
    assert (out.n_union == out.n_a + out.n_b - out.n_inter).all()
    assert (out.n_inter <= out[["n_a", "n_b"]].min(axis=1)).all()
    assert ((out.jaccard > 0) & (out.jaccard <= 1)).all()


def test_modularity_sums_and_bounds(ray_session):
    from tsdownsample_ray.pipelines.queries import QUERIES

    out = QUERIES["modularity_docs"]("/root/testdata/sf0.001").to_pandas()
    m = int(out.m.iloc[0])
    assert (out.m == m).all()
    assert out.n_intra.sum() <= m            # intra edges partition m
    assert out.deg_sum.sum() == 2 * m        # handshake lemma
    q = out.contrib_num.sum() / (4 * m * m)
    assert -0.5 <= q <= 1.0                  # modularity range
    assert abs(out.q_contrib.sum() - q) < 1e-9


def test_dominant_period_is_argmax(ray_session):
    from tsdownsample_ray.pipelines.queries import QUERIES
    from tsdownsample_ray.stages.correlate import autocorrelation
    from tsdownsample_ray.stages.rollup import rollup
    import pyarrow as pa

    sf = "/root/testdata/sf0.001"
    out = QUERIES["dominant_period_1h"](sf).to_pandas()
    assert out.period_lag.between(2, 48).all()
    assert len(out) == out.series_id.nunique()


def test_quantized_knn_recall_bounds(ray_session):
    from tsdownsample_ray.pipelines.queries import QUERIES

    out = QUERIES["quantized_knn_recall"](
        "/root/testdata/sf0.001").to_pandas()
    assert len(out) == 10
    assert out.n_overlap.between(0, 10).all()
    assert out.top1_match.isin((0, 1)).all()
    # int8 over 128-dim near-unit vectors keeps most of the ranking
    assert out.n_overlap.mean() >= 5


def test_join_size_profile_equals_real_join(ray_session):
    import duckdb

    from tsdownsample_ray.pipelines.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    out = QUERIES["join_size_profile"](sf).to_pandas()
    real = duckdb.sql(f"""
        SELECT count(*) FROM '{sf}/orders.parquet' o
        JOIN '{sf}/lineitem.parquet' l ON l.l_orderkey = o.o_orderkey
    """).fetchone()[0]
    assert int(out.join_rows[0]) == real


def test_lod_route_tier_choice_and_counts(ray_session):
    from tsdownsample_ray.pipelines.queries import QUERIES, W1D, W1H

    out = QUERIES["lod_route_events"](
        "/root/testdata/sf0.001").to_pandas()
    # case 1 (n_out=100) must route to the 1h tier, cases 2/3 to 1d
    for cid, w in ((1, W1H), (2, W1D), (3, W1D)):
        b = out[out.case_id == cid].bucket
        assert (b % w == 0).all()
    # per series, selected points never exceed n_out
    for cid, n_out in ((1, 100), (2, 20), (3, 4)):
        per = out[out.case_id == cid].groupby("series_id").size()
        assert (per <= n_out).all() and (per > 0).all()


def test_ed2_pairs_matches_bruteforce(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.strsim import _ed, ed2_pairs

    vocab = ["spark", "spar", "spa", "shark", "stark", "sort", "part",
             "sport", "xyzzy", "ab", "ba", "abc"]
    ds = rd.from_pandas(pd.DataFrame({"token": vocab})).repartition(3)
    out = ed2_pairs(ds, num_partitions=2).to_pandas()
    got = {(r.a, r.b): r.dist for r in out.itertuples()}
    exp = {}
    for i in range(len(vocab)):
        for j in range(len(vocab)):
            a, b = sorted((vocab[i], vocab[j]))
            if a < b:
                d = _ed(a, b)
                if 1 <= d <= 2:
                    exp[(a, b)] = d
    assert got == exp


def test_cdc_chunks_lossless_and_shift_resistant(ray_session):
    import pyarrow as pa

    from tsdownsample_ray.stages.packing import cdc_chunk_batch

    t = pa.table({"doc_id": [1, 2],
                  "text": ["the quick brown fox jumps over the lazy dog "
                           * 20,
                           "xy" * 3]})
    out = cdc_chunk_batch(t)
    df = out.to_pandas()
    # lossless: chunks concatenate back to the text, in chunk_id order
    for did, txt in ((1, t["text"][0].as_py()), (2, t["text"][1].as_py())):
        g = df[df.doc_id == did].sort_values("chunk_id")
        assert "".join(g.chunk) == txt
    # shift resistance: prepending bytes leaves the TAIL chunks identical
    base = "the quick brown fox jumps over the lazy dog " * 20
    a = cdc_chunk_batch(pa.table({"doc_id": [1], "text": [base]}))
    b = cdc_chunk_batch(pa.table({"doc_id": [1],
                                  "text": ["ZZZZ" + base]}))
    ca = a["chunk"].to_pylist()
    cb = b["chunk"].to_pylist()
    assert len(ca) > 3  # boundaries actually fire on this text
    assert ca[-3:] == cb[-3:]  # unchanged content re-chunks identically


def test_theta_fixed_point_matches_brute(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from tsdownsample_ray.stages.smoothing import theta_fixed_point

    rng = np.random.default_rng(6)
    frames = []
    for sid in ("a", "b", "c"):
        n = int(rng.integers(1, 60))
        frames.append(pd.DataFrame({
            "series_id": sid,
            "bucket": np.arange(n, dtype=np.int64) * 900,
            "sum_y": rng.integers(-5000, 5000, n).astype(np.int64)}))
    df = pd.concat(frames, ignore_index=True)
    ds = rd.from_pandas(df.sample(frac=1.0, random_state=1)).repartition(3)
    out = theta_fixed_point(ds, ka=3, horizon=5, num_partitions=2) \
        .to_pandas().sort_values(["series_id", "h"]).reset_index(drop=True)

    rows = []
    for sid, g in df.groupby("series_id"):
        y = g.sort_values("bucket")["sum_y"].tolist()
        n = len(y)
        lvl = y[0]
        for v in y[1:]:
            lvl = lvl + ((v - lvl) >> 3)
        t = list(range(n))
        bn = n * sum(ti * yi for ti, yi in zip(t, y)) - sum(t) * sum(y)
        bd = n * sum(ti * ti for ti in t) - sum(t) ** 2
        for h in range(1, 6):
            if bd == 0:
                drift = 0
            else:
                num, den = h * bn, 2 * bd
                drift = num // den  # python floor div == exact floor
            rows.append((sid, h, lvl, bn, bd, lvl + drift))
    exp = pd.DataFrame(rows, columns=["series_id", "h", "level", "bn",
                                      "bd", "forecast"])
    pd.testing.assert_frame_equal(
        out[exp.columns].astype(exp.dtypes.to_dict()), exp)
