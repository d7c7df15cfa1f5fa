"""Incident-coverage range join and naive-forecast backtest."""

import duckdb
import numpy as np


def test_incident_coverage_properties(ray_session):
    from tsdownsample_ray.pipelines.queries import (
        q_incident_coverage_events,
    )

    sf = "/root/testdata/sf0.001"
    out = (q_incident_coverage_events(sf).to_pandas()
           .set_index("event_type"))
    assert set(out.index) == {"click", "error", "purchase", "signup",
                              "view"}
    assert (out.n_covered <= out.n_events).all()
    assert (out.total_coverage >= out.n_covered).all()
    # every error event covers itself -> the error series is fully covered
    assert out.loc["error", "n_covered"] == out.loc["error", "n_events"]
    # hand replay one series
    te = np.sort(duckdb.sql(
        f"SELECT epoch_us(ts) FROM '{sf}/events.parquet' "
        "WHERE event_type='error'").df().iloc[:, 0].to_numpy())
    t = duckdb.sql(
        f"SELECT epoch_us(ts) FROM '{sf}/events.parquet' "
        "WHERE event_type='click'").df().iloc[:, 0].to_numpy()
    W = 1_800_000_000
    cov = (np.searchsorted(te, t, "right")
           - np.searchsorted(te, t - W, "left"))
    assert out.loc["click", "total_coverage"] == int(cov.sum())
    assert out.loc["click", "n_covered"] == int((cov > 0).sum())


def test_backtest_naive_replay(ray_session):
    from tsdownsample_ray.pipelines.queries import q_backtest_naive_1h

    sf = "/root/testdata/sf0.001"
    out = (q_backtest_naive_1h(sf).to_pandas().set_index("series_id"))
    H = 3_600_000_000
    df = duckdb.sql(f"""
        SELECT event_type s, epoch_us(ts)//{H}*{H} b,
               CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) y
        FROM '{sf}/events.parquet' GROUP BY 1, 2 ORDER BY 1, 2
    """).df()
    for s, g in df.groupby("s"):
        by_b = dict(zip(g.b, g.y))
        n_s = sae_s = n_1 = sae_1 = 0
        for b, y in by_b.items():
            if b - 24 * H in by_b:
                n_s += 1
                sae_s += abs(int(y) - int(by_b[b - 24 * H]))
            if b - H in by_b:
                n_1 += 1
                sae_1 += abs(int(y) - int(by_b[b - H]))
        r = out.loc[s]
        assert (r.n, r.n_seasonal, r.sae_seasonal, r.n_naive,
                r.sae_naive) == (len(by_b), n_s, sae_s, n_1, sae_1)


def test_rate_limit_replay(ray_session):
    from tsdownsample_ray.pipelines.queries import q_rate_limit_users

    sf = "/root/testdata/sf0.001"
    out = q_rate_limit_users(sf).to_pandas().set_index("user_id")
    W, L = 86_400_000_000, 4
    df = duckdb.sql(f"""
        SELECT user_id u, epoch_us(ts) t FROM '{sf}/events.parquet'
        ORDER BY 1, 2
    """).df()
    for u, g in df.groupby("u"):
        t = g.t.to_numpy()
        cnt = np.array([((t > ti - W) & (t <= ti)).sum() for ti in t])
        r = out.loc[u]
        assert (r.n_events, r.max_trailing, r.n_throttled) == (
            len(t), int(cnt.max()), int((cnt > L).sum()))


def test_readability_hand_values(ray_session):
    import pyarrow as pa

    from tsdownsample_ray.stages.textstats import readability_batch

    b = pa.table({"doc_id": [1, 2, 3],
                  "text": ["Hello world. It is day!",
                           "x# .!? yy",
                           "zzz"]})
    out = readability_batch(b).to_pandas().set_index("doc_id")
    # doc 1: 5 words; runs of [.!?]: '.'+'!' = 2; vowel runs:
    # e,o,o,I,i,ay -> hEllO wOrld It Is dAy -> e|o|o|I|i|a+y(run 'ay')
    r = out.loc[1]
    assert (r.n_words, r.n_sentences, r.n_syllables) == (5, 2, 6)
    # doc 2: '#' in text must not inflate run counts; '.!?' is ONE run
    r = out.loc[2]
    assert (r.n_words, r.n_sentences, r.n_syllables) == (3, 1, 1)
    # doc 3: no vowels, no sentences -> flesch null
    import math
    assert math.isnan(out.loc[3].flesch)


def test_isotonic_fit_properties(ray_session):
    from fractions import Fraction

    from tsdownsample_ray.pipelines.queries import q_isotonic_fit_1h

    sf = "/root/testdata/sf0.001"
    out = q_isotonic_fit_1h(sf).to_pandas()
    for s, g in out.groupby("series_id"):
        g = g.sort_values("bucket")
        fits = [Fraction(int(n), int(d))
                for n, d in zip(g.fit_num, g.fit_den)]
        # non-decreasing fit
        assert all(a <= b for a, b in zip(fits, fits[1:]))
        # total mass preserved (sum of fits == sum of y)
        assert sum(fits) == sum(int(v) for v in g.y)
        # each maximal constant block's fit is the block mean of y
        i = 0
        vals = list(g.y)
        while i < len(fits):
            j = i
            while j < len(fits) and fits[j] == fits[i]:
                j += 1
            assert Fraction(sum(int(v) for v in vals[i:j]),
                            j - i) == fits[i]
            i = j
