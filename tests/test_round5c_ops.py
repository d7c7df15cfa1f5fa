"""Round-5 closing operators: MACD fixed point, full matrix profile,
rational-idf BM25 — each replayed against an independent brute-force
oracle (partitioning must not change any value)."""

import duckdb
import numpy as np
import pandas as pd
import pytest


def _macd_ref(y, kf=2, ks=4, ksig=3):
    ef = es = y[0]
    sig = 0
    rows = []
    for i, v in enumerate(map(int, y)):
        if i:
            ef += (v - ef) >> kf
            es += (v - es) >> ks
        m = ef - es
        if i:
            sig += (m - sig) >> ksig
        rows.append((m, sig, m - sig))
    return rows


def test_macd_matches_bruteforce(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.smoothing import macd_fixed_point

    rng = np.random.default_rng(29)
    frames = []
    for s in range(5):
        n = int(rng.integers(1, 60))
        frames.append(pd.DataFrame({
            "series_id": f"s{s}",
            "bucket": np.sort(rng.choice(10_000, n, replace=False)),
            "sum_y": rng.integers(-10**9, 10**9, n)}))
    df = pd.concat(frames).sample(frac=1.0, random_state=7)
    ds = rd.from_pandas(df.reset_index(drop=True)).repartition(6)
    out = macd_fixed_point(ds, num_partitions=3).to_pandas() \
        .sort_values(["series_id", "bucket"]).reset_index(drop=True)

    exp = []
    for s, g in df.sort_values(["series_id", "bucket"]).groupby(
            "series_id"):
        y = g.sum_y.to_numpy().astype(np.int64)
        for (b, yy), (m, sig, h) in zip(
                zip(g.bucket, y), _macd_ref(y)):
            exp.append((s, int(b), int(yy), m, sig, h))
    exp = pd.DataFrame(exp, columns=["series_id", "bucket", "y",
                                     "macd", "signal", "hist"])
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)


def test_macd_single_row_series(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.smoothing import macd_fixed_point

    ds = rd.from_pandas(pd.DataFrame({
        "series_id": ["a"], "bucket": [5], "sum_y": [-123]}))
    out = macd_fixed_point(ds, num_partitions=2).to_pandas()
    assert out.iloc[0].tolist() == ["a", 5, -123, 0, 0, 0]


def test_matrix_profile_replay(ray_session):
    from tsdownsample_ray.pipelines.queries import q_matrix_profile_1h

    sf = "/root/testdata/sf0.001"
    out = q_matrix_profile_1h(sf).to_pandas() \
        .sort_values(["series_id", "bucket"]).reset_index(drop=True)
    H = 3_600_000_000
    df = duckdb.sql(f"""
        SELECT event_type s, epoch_us(ts)//{H}*{H} b,
               CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) y
        FROM '{sf}/events.parquet' GROUP BY 1, 2 ORDER BY 1, 2""").df()
    W = 6
    exp = []
    for s, g in df.groupby("s"):
        y = g.y.to_numpy().astype(np.int64)
        b = g.b.to_numpy()
        m = len(y) - W + 1
        for i in range(m):
            wi = y[i:i + W]
            nn = None
            for j in range(m):
                if abs(i - j) < W:
                    continue
                d2 = int(((wi - y[j:j + W]) ** 2).sum())
                if nn is None or d2 < nn[0]:
                    nn = (d2, j)  # strict < keeps the smallest j on ties
            if nn is not None:
                exp.append((s, int(b[i]), int(b[nn[1]]), nn[0]))
    exp = pd.DataFrame(exp, columns=["series_id", "bucket",
                                     "nn_bucket", "nn_d2"]) \
        .sort_values(["series_id", "bucket"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)


def test_bm25_matches_bruteforce(ray_session):
    from tsdownsample_ray.pipelines.queries.ext_round5b import (
        BM25_QUERY_TERMS,
        q_bm25_docs,
    )

    sf = "/root/testdata/sf0.001"
    out = q_bm25_docs(sf).to_pandas() \
        .sort_values(["doc_id", "term"]).reset_index(drop=True)

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf}/documents.parquet'").df()
    toks = {int(r.doc_id): [t for t in r.text.split(" ") if t]
            for r in docs.itertuples()}
    toks = {d: t for d, t in toks.items() if t}
    n = len(toks)
    total_len = sum(len(t) for t in toks.values())
    exp = []
    for qt in BM25_QUERY_TERMS:
        df_t = sum(1 for t in toks.values() if qt in t)
        if not df_t:
            continue
        for d, t in toks.items():
            tf = t.count(qt)
            if not tf:
                continue
            dl = len(t)
            num = (n - df_t) * 44 * total_len * tf * 1_000_000
            den = df_t * (20 * total_len * tf + 6 * total_len
                          + 18 * dl * n)
            exp.append((d, qt, tf, dl, num // den))
    exp = pd.DataFrame(exp, columns=["doc_id", "term", "tf", "dl",
                                     "score_e6"]) \
        .sort_values(["doc_id", "term"]).reset_index(drop=True)
    assert len(exp) > 0
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)


def test_bm25_score_monotonic_in_tf(ray_session):
    # same dl, higher tf -> higher score (the BM25 saturation curve is
    # increasing); exactness is covered by the brute-force replay
    from tsdownsample_ray.pipelines.queries.ext_round5b import q_bm25_docs

    out = q_bm25_docs("/root/testdata/sf0.001").to_pandas()
    for (term, dl), g in out.groupby(["term", "dl"]):
        g = g.sort_values("tf")
        assert g.score_e6.is_monotonic_increasing
