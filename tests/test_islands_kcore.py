"""Interval union, experiment readout, k-core."""

import duckdb
import numpy as np


def test_interval_union_replay(ray_session):
    from tsdownsample_ray.pipelines.queries import q_interval_union_events

    sf = "/root/testdata/sf0.001"
    out = (q_interval_union_events(sf).to_pandas()
           .set_index("series_id"))
    W = 1_800_000_000
    df = duckdb.sql(f"""
        SELECT event_type s, epoch_us(ts) t FROM '{sf}/events.parquet'
        ORDER BY 1, 2""").df()
    for s, g in df.groupby("s"):
        t = g.t.to_numpy()
        islands = []
        lo, hi = t[0], t[0] + W
        for x in t[1:]:
            if x > hi:
                islands.append((lo, hi))
                lo, hi = x, x + W
            else:
                hi = max(hi, x + W)
        islands.append((lo, hi))
        r = out.loc[s]
        assert r.n_islands == len(islands)
        assert r.covered_us == sum(h - l for l, h in islands)
        assert r.longest_island_us == max(h - l for l, h in islands)
        gaps = [islands[i + 1][0] - islands[i][1]
                for i in range(len(islands) - 1)]
        assert r.longest_gap_us == (max(gaps) if gaps else 0)


def test_experiment_readout_consistency(ray_session):
    from tsdownsample_ray.pipelines.queries import (
        q_experiment_readout_users,
    )

    sf = "/root/testdata/sf0.001"
    out = q_experiment_readout_users(sf).to_pandas().set_index("arm")
    assert set(out.index) == {0, 1}
    n_users = duckdb.sql(
        f"SELECT count(DISTINCT user_id) FROM '{sf}/events.parquet'"
    ).fetchone()[0]
    n_events = duckdb.sql(
        f"SELECT count(*) FROM '{sf}/events.parquet'").fetchone()[0]
    assert out.n_users.sum() == n_users
    assert out.n_events.sum() == n_events
    assert (out.n_converted <= out.n_users).all()


def test_kcore_fixpoint(ray_session):
    from tsdownsample_ray.pipelines.queries import q_kcore_docs

    out = q_kcore_docs("/root/testdata/sf0.001").to_pandas()
    # every surviving node has core degree >= k in the surviving graph
    assert (out.core_deg >= 5).all()
    assert 0 < len(out) < 500  # a real peel happened


def test_weighted_sample_determinism_and_bias(ray_session):
    import hashlib

    from tsdownsample_ray.pipelines.queries import q_weighted_sample_docs

    sf = "/root/testdata/sf0.001"
    out = q_weighted_sample_docs(sf).to_pandas()
    assert len(out) == 20
    # exact replay
    df = duckdb.sql(
        f"SELECT doc_id, n_chars FROM '{sf}/documents.parquet'").df()
    pri = {}
    for d, w in zip(df.doc_id, df.n_chars):
        h = int.from_bytes(
            hashlib.md5(str(int(d)).encode()).digest()[:8], "big")
        pri[int(d)] = (int(w) << 80) // (h + 1)
    want = sorted(pri, key=lambda d: (-pri[d], d))[:20]
    assert out.doc_id.tolist() == want
    # weight bias: sampled docs skew heavier than the corpus median
    assert out.w.median() >= df.n_chars.median()


def test_bfs_hops_replay(ray_session):
    import collections

    from tsdownsample_ray.pipelines.queries import q_bfs_hops_docs

    out = (q_bfs_hops_docs("/root/testdata/sf0.001").to_pandas()
           .set_index("node"))
    df = duckdb.sql('''
        WITH n AS (SELECT count(*) c
                   FROM read_parquet('/root/testdata/sf0.001/documents.parquet')),
        d0 AS (SELECT doc_id
               FROM read_parquet('/root/testdata/sf0.001/documents.parquet')),
        e0 AS (SELECT doc_id src,
                      (doc_id*31 + 97*j) % (SELECT c FROM n) dst
               FROM d0, unnest([1,2,3,4,5,6]) t(j)
               WHERE j <= 1 + doc_id % 6),
        und AS (SELECT DISTINCT least(src,dst) u, greatest(src,dst) v
                FROM e0 WHERE src <> dst)
        SELECT u, v FROM und''').df()
    adj = collections.defaultdict(set)
    for u, v in zip(df.u, df.v):
        adj[u].add(v)
        adj[v].add(u)
    dist = {0: 0}
    frontier = [0]
    hop = 0
    while frontier:
        hop += 1
        nxt = []
        for x in frontier:
            for y in adj[x]:
                if y not in dist:
                    dist[y] = hop
                    nxt.append(y)
        frontier = nxt
    assert out.hop.to_dict() == dist


def test_churn_features_replay(ray_session):
    from tsdownsample_ray.pipelines.queries import q_churn_features_users

    sf = "/root/testdata/sf0.001"
    out = q_churn_features_users(sf).to_pandas().set_index("user_id")
    df = duckdb.sql(f"""
        SELECT user_id u, epoch_us(ts) t, event_type et,
               CAST(round(value*100) AS BIGINT) c
        FROM '{sf}/events.parquet' ORDER BY 1, 2""").df()
    tmax = df.t.max()
    D7 = 7 * 86_400_000_000
    for u, g in df.groupby("u"):
        r = out.loc[u]
        t = g.t.to_numpy()
        assert r.n_events == len(g)
        assert r.n_purchases == (g.et == "purchase").sum()
        assert r.purchase_cents == g[g.et == "purchase"].c.sum()
        assert r.active_days == len(set(t // 86_400_000_000))
        assert r.span_us == t.max() - t.min()
        assert r.max_gap_us == (int(np.diff(t).max())
                                if len(t) > 1 else 0)
        assert r.churned == int(t.max() < tmax - D7)


def test_ips_policy_eval_consistency(ray_session):
    from tsdownsample_ray.pipelines.queries import (
        q_ips_policy_eval_events,
    )

    sf = "/root/testdata/sf0.001"
    out = q_ips_policy_eval_events(sf).to_pandas().iloc[0]
    assert out.n == 1000
    assert 0 < out.n_matched < out.n
    assert out.reward_matched_x5 % 5 == 0
    assert out.reward_matched_x5 // 5 <= out.reward_all


def test_returned_revenue_top20(ray_session):
    from tsdownsample_ray.pipelines.queries import (
        q_returned_revenue_customers,
    )

    out = q_returned_revenue_customers(
        "/root/testdata/sf0.001").to_pandas()
    assert len(out) == 20
    assert out.revenue_e6.is_monotonic_decreasing
    assert out.c_name.notna().all() and out.n_name.notna().all()


def test_quantile_normalize_properties(ray_session):
    from tsdownsample_ray.pipelines.queries import q_quantile_normalize_1d

    out = q_quantile_normalize_1d("/root/testdata/sf0.001").to_pandas()
    # equal-length series, ranks 1..30 each
    for s, g in out.groupby("series_id"):
        assert sorted(g["rank"]) == list(range(1, 31))
        g = g.sort_values("rank")
        # qn profile is monotone in rank and shared across series
        assert g.qn_sum.is_monotonic_increasing
    # after normalization every series has the IDENTICAL multiset
    sets = {tuple(sorted(g.qn_sum))
            for _, g in out.groupby("series_id")}
    assert len(sets) == 1
    # rank-r qn_sum equals the cross-series sum of rank-r values
    for r in (1, 15, 30):
        rows = out[out["rank"] == r]
        assert (rows.qn_sum == rows.y.sum()).all()


def test_pmi_pairs_properties(ray_session):
    from tsdownsample_ray.pipelines.queries import q_pmi_pairs_docs

    out = q_pmi_pairs_docs("/root/testdata/sf0.001").to_pandas()
    assert len(out) == 30
    assert out.pmi_score_e6.is_monotonic_decreasing
    assert (out.co_df >= 3).all()
    assert (out.a < out.b).all()


def test_class_terms_properties(ray_session):
    from tsdownsample_ray.pipelines.queries import q_class_terms_docs

    out = q_class_terms_docs("/root/testdata/sf0.001").to_pandas()
    per = out.groupby("label").size()
    assert len(per) == 10 and (per == 5).all()
    for _, g in out.groupby("label"):
        assert g.score_e6.is_monotonic_decreasing or len(g) == 1
    assert (out.c >= 5).all()


def test_langid_confusion_properties(ray_session):
    from tsdownsample_ray.pipelines.queries import (
        q_langid_confusion_docs,
    )

    sf = "/root/testdata/sf0.001"
    out = q_langid_confusion_docs(sf).to_pandas()
    total = duckdb.sql(
        f"SELECT count(*) FROM '{sf}/documents.parquet'").fetchone()[0]
    assert out.n.sum() == total
    # the synthetic corpus text is English-like regardless of its lang
    # LABEL — the audit's job is to surface exactly that: predictions
    # concentrate on 'en', and the true-en row is strongly diagonal
    pred_en = out[out.pred_lang == "en"].n.sum()
    assert pred_en > total * 0.7
    en_row = out[out.true_lang == "en"]
    assert (en_row[en_row.pred_lang == "en"].n.sum()
            > en_row.n.sum() * 0.8)


def test_busday_rollup_no_weekends(ray_session):
    from tsdownsample_ray.pipelines.queries import q_busday_rollup_orders

    sf = "/root/testdata/sf0.001"
    out = q_busday_rollup_orders(sf).to_pandas()
    dow = (out.busday + 4) % 7
    assert ((dow != 0) & (dow != 6)).all()  # no weekend buckets
    n = duckdb.sql(
        f"SELECT count(*) FROM '{sf}/orders.parquet'").fetchone()[0]
    assert out.n_orders.sum() == n


def test_clustering_coeff_replay(ray_session):
    import collections
    import math

    from tsdownsample_ray.pipelines.queries import q_clustering_coeff_docs

    out = (q_clustering_coeff_docs("/root/testdata/sf0.001")
           .to_pandas().set_index("node"))
    df = duckdb.sql('''
        WITH nn AS (SELECT count(*) n
                    FROM read_parquet('/root/testdata/sf0.001/documents.parquet')),
        d0 AS (SELECT doc_id
               FROM read_parquet('/root/testdata/sf0.001/documents.parquet')),
        e0 AS (SELECT doc_id src,
                      (doc_id*31 + 97*j) % (SELECT n FROM nn) dst
               FROM d0, unnest([1,2,3]) t(j)),
        und AS (SELECT DISTINCT least(src,dst) u, greatest(src,dst) v
                FROM e0 WHERE src <> dst)
        SELECT u, v FROM und''').df()
    adj = collections.defaultdict(set)
    for u, v in zip(df.u, df.v):
        adj[u].add(v)
        adj[v].add(u)
    for node, r in out.iterrows():
        nb = adj[node]
        assert r.deg == len(nb)
        tri = sum(1 for x in nb for y in nb
                  if x < y and y in adj[x])
        assert r.n_triangles == tri
        g = math.gcd(2 * tri, r.deg * (r.deg - 1)) or 1
        assert (r.cc_num, r.cc_den) == (2 * tri // g,
                                        r.deg * (r.deg - 1) // g)
    # coefficients live in [0, 1]
    assert (out.cc_num <= out.cc_den).all()


def test_lateness_accounting_partition(ray_session):
    from tsdownsample_ray.pipelines.queries import (
        q_lateness_accounting_events,
    )

    sf = "/root/testdata/sf0.001"
    out = q_lateness_accounting_events(sf).to_pandas()
    n = duckdb.sql(
        f"SELECT count(*) FROM '{sf}/events.parquet'").fetchone()[0]
    # trichotomy partitions the stream
    assert (out.n_on_time + out.n_late_ok + out.n_dropped).sum() == n
    assert (out.n_dropped > 0).any()  # the 13.5-min max delay drops some
    assert (out.n_on_time > 0).all()


def test_decision_stump_optimality(ray_session):
    from fractions import Fraction

    from tsdownsample_ray.pipelines.queries import q_decision_stump_users

    sf = "/root/testdata/sf0.001"
    out = q_decision_stump_users(sf).to_pandas().iloc[0]
    df = duckdb.sql(f"""
        WITH u AS (SELECT user_id, count(*) x,
                   CAST(max(epoch_us(ts)) <
                        (SELECT max(epoch_us(ts))
                         FROM '{sf}/events.parquet') - 604800000000
                        AS BIGINT) churned
                   FROM '{sf}/events.parquet' GROUP BY 1)
        SELECT x, churned FROM u""").df()
    xs = df.x.to_numpy()
    ch = df.churned.to_numpy()
    N = len(xs)
    # exact-rational check: no threshold beats the chosen one
    def h(t):
        l = xs <= t
        nl, nr = int(l.sum()), int(N - l.sum())
        if nl == 0 or nr == 0:
            return None
        pl, pr = int(ch[l].sum()), int(ch[~l].sum())
        return (Fraction(pl * pl + (nl - pl) ** 2, nl)
                + Fraction(pr * pr + (nr - pr) ** 2, nr))
    chosen = h(out.threshold)
    for t in sorted(set(xs))[:-1]:
        v = h(t)
        assert v is None or v <= chosen or t == out.threshold
    assert out.n_left + out.n_right == N


def test_mann_kendall_replay(ray_session):
    from tsdownsample_ray.pipelines.queries import q_mann_kendall_15m

    sf = "/root/testdata/sf0.001"
    out = q_mann_kendall_15m(sf).to_pandas().set_index("series_id")
    df = duckdb.sql(f"""
        SELECT event_type s, epoch_us(ts)//900000000 b,
               CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) y
        FROM '{sf}/events.parquet' GROUP BY 1, 2 ORDER BY 1, 2""").df()
    for s, g in df.groupby("s"):
        y = g.y.tolist()
        n = len(y)
        S = sum((y[j] > y[i]) - (y[j] < y[i])
                for i in range(n) for j in range(i + 1, n))
        from collections import Counter

        ties = Counter(y)
        var18 = (n * (n - 1) * (2 * n + 5)
                 - sum(t * (t - 1) * (2 * t + 5)
                       for t in ties.values()))
        r = out.loc[s]
        assert (r.n, r.s_stat, r.var18) == (n, S, var18)


def test_page_hinkley_replay(ray_session):
    from tsdownsample_ray.pipelines.queries import q_page_hinkley_15m

    sf = "/root/testdata/sf0.001"
    out = q_page_hinkley_15m(sf).to_pandas().set_index("series_id")
    df = duckdb.sql(f"""
        SELECT event_type s, epoch_us(ts)//900000000*900000000 b,
               CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) y
        FROM '{sf}/events.parquet' GROUP BY 1, 2 ORDER BY 1, 2""").df()
    for s, g in df.groupby("s"):
        y = g.y.tolist()
        n = len(y)
        tot = sum(y)
        mn = None  # running min over M_1..M_t (no empty-prefix zero)
        maxph = n_alarms = 0
        first = None
        cur = 0
        for b, v in zip(g.b, y):
            cur += n * v - tot
            mn = cur if mn is None else min(mn, cur)
            ph = cur - mn
            maxph = max(maxph, ph)
            if ph > n * 50_000:
                n_alarms += 1
                if first is None:
                    first = b
        r = out.loc[s]
        assert (r.n, r.final_ph, r.max_ph) == (n, cur - mn, maxph)
        assert r.n_alarms == n_alarms
        assert (r.first_alarm == first
                or (first is None and np.isnan(r.first_alarm)))


def test_covisit_replay(ray_session):
    import collections
    import itertools

    from tsdownsample_ray.pipelines.queries import q_covisit_users

    sf = "/root/testdata/sf0.001"
    out = q_covisit_users(sf).to_pandas()
    df = duckdb.sql(f"""
        SELECT DISTINCT event_type ct, epoch_us(ts)//3600000000 cb,
               user_id u
        FROM '{sf}/events.parquet'""").df()
    cnt = collections.Counter()
    for _, g in df.groupby(["ct", "cb"]):
        for a, b in itertools.combinations(sorted(g.u), 2):
            cnt[(a, b)] += 1
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [((int(r.u), int(r.v)), int(r.n_cocells))
           for r in out.itertuples()]
    assert got == want


def test_boxplot_properties(ray_session):
    from tsdownsample_ray.pipelines.queries import q_boxplot_15m

    out = q_boxplot_15m("/root/testdata/sf0.001").to_pandas()
    assert len(out) == 5
    for _, r in out.iterrows():
        assert (r.y_min <= r.lo_whisker <= r.q1 <= r["median"]
                <= r.q3 <= r.hi_whisker <= r.y_max)
        assert r.n_outliers >= 0
        # whiskers inside the 1.5 IQR fences (doubled arithmetic)
        iqr = r.q3 - r.q1
        assert 2 * r.lo_whisker >= 2 * r.q1 - 3 * iqr
        assert 2 * r.hi_whisker <= 2 * r.q3 + 3 * iqr


def test_median_of_means_replay(ray_session):
    from fractions import Fraction

    from tsdownsample_ray.pipelines.queries import q_median_of_means_15m

    sf = "/root/testdata/sf0.001"
    out = (q_median_of_means_15m(sf).to_pandas()
           .set_index("series_id"))
    df = duckdb.sql(f"""
        SELECT event_type s, epoch_us(ts)//900000000 b,
               CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) y
        FROM '{sf}/events.parquet' GROUP BY 1, 2 ORDER BY 1, 2""").df()
    for s, g in df.groupby("s"):
        y = g.y.tolist()
        n = len(y)
        groups = {}
        for rk, v in enumerate(y):
            groups.setdefault(rk * 10 // n, []).append(v)
        means = sorted(
            ((Fraction(sum(v), len(v)), k) for k, v in groups.items()))
        med_frac, med_k = means[(len(means) - 1) // 2]
        r = out.loc[s]
        assert (r.n, r.n_groups) == (n, len(groups))
        assert Fraction(int(r.mom_sum), int(r.mom_cnt)) == med_frac
        assert r.total_sum == sum(y)


def test_discord_replay(ray_session):
    from tsdownsample_ray.pipelines.queries import q_discord_1h

    sf = "/root/testdata/sf0.001"
    out = q_discord_1h(sf).to_pandas().set_index("series_id")
    H = 3_600_000_000
    df = duckdb.sql(f"""
        SELECT event_type s, epoch_us(ts)//{H}*{H} b,
               CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) y
        FROM '{sf}/events.parquet' GROUP BY 1, 2 ORDER BY 1, 2""").df()
    W = 6
    for s, g in df.groupby("s"):
        y = g.y.to_numpy().astype(np.int64)
        b = g.b.to_numpy()
        m = len(y) - W + 1
        best = None
        for i in range(m):
            wi = y[i:i + W]
            nn = None
            for j in range(m):
                if abs(i - j) < W:
                    continue
                wj = y[j:j + W]
                d2 = int(((wi - wj) ** 2).sum())
                nn = d2 if nn is None else min(nn, d2)
            if nn is not None and (best is None or nn > best[0]):
                best = (nn, i)
        r = out.loc[s]
        assert (r.n_windows, r.discord_bucket, r.nn_d2) == (
            m, b[best[1]], best[0])


def test_motif_replay(ray_session):
    from tsdownsample_ray.pipelines.queries import q_motif_1h

    sf = "/root/testdata/sf0.001"
    out = q_motif_1h(sf).to_pandas().set_index("series_id")
    H = 3_600_000_000
    df = duckdb.sql(f"""
        SELECT event_type s, epoch_us(ts)//{H}*{H} b,
               CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) y
        FROM '{sf}/events.parquet' GROUP BY 1, 2 ORDER BY 1, 2""").df()
    W = 6
    for s, g in df.groupby("s"):
        y = g.y.to_numpy().astype(np.int64)
        b = g.b.to_numpy()
        m = len(y) - W + 1
        best = None
        for i in range(m):
            for j in range(i + W, m):
                d2 = int(((y[i:i + W] - y[j:j + W]) ** 2).sum())
                k = (d2, i, j)
                if best is None or k < best:
                    best = k
        r = out.loc[s]
        assert (r.bucket_a, r.bucket_b, r.d2) == (
            b[best[1]], b[best[2]], best[0])


def test_label_propagation_replay(ray_session):
    import collections

    from tsdownsample_ray.pipelines.queries import (
        q_label_propagation_docs,
    )

    sf = "/root/testdata/sf0.001"
    out = (q_label_propagation_docs(sf).to_pandas()
           .set_index("node"))
    lab = dict(duckdb.sql(
        f"SELECT vec_id, label FROM '{sf}/embeddings.parquet'"
    ).fetchall())
    df = duckdb.sql(f'''
        WITH n AS (SELECT count(*) c FROM '{sf}/documents.parquet'),
        e0 AS (SELECT doc_id src,
                      (doc_id*31 + 97*j) % (SELECT c FROM n) dst
               FROM '{sf}/documents.parquet',
                    unnest([1,2,3,4,5,6]) t(j)
               WHERE j <= 1 + doc_id % 6),
        und AS (SELECT DISTINCT least(src,dst) u, greatest(src,dst) v
                FROM e0 WHERE src <> dst)
        SELECT u, v FROM und''').df()
    adj = collections.defaultdict(list)
    for u, v in zip(df.u, df.v):
        adj[u].append(v)
        adj[v].append(u)
    for node, nbs in adj.items():
        votes = collections.Counter(lab[x] for x in nbs)
        pred = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))
        r = out.loc[node]
        assert (r.pred_label, r.n_votes, r.n_neighbors) == (
            pred[0], pred[1], len(nbs))


def test_burstiness_replay(ray_session):
    from fractions import Fraction

    from tsdownsample_ray.pipelines.queries import q_burstiness_events

    sf = "/root/testdata/sf0.001"
    out = q_burstiness_events(sf).to_pandas().set_index("series_id")
    df = duckdb.sql(f"""
        SELECT event_type s, epoch_us(ts)//3600000000 b, count(*) c
        FROM '{sf}/events.parquet' GROUP BY 1, 2""").df()
    for s, g in df.groupby("s"):
        c = g.c.to_numpy().astype(np.int64)
        n = len(c)
        want = Fraction(int(n * (c * c).sum() - c.sum() ** 2),
                        int(n * c.sum()))
        r = out.loc[s]
        assert Fraction(int(r.fano_num), int(r.fano_den)) == want
        assert (r.n_buckets, r.n_events) == (n, c.sum())


def test_sweepline_conservation(ray_session):
    from tsdownsample_ray.pipelines.queries import (
        q_sweepline_audit_events,
    )

    out = (q_sweepline_audit_events("/root/testdata/sf0.001")
           .to_pandas().iloc[0])
    # Fubini: the two independent measurements must agree exactly
    assert out.conserved == 1
    assert out.covered_sum_us == out.sweep_integral_us
    assert 1 <= out.max_concurrency <= 5  # at most one island/series
    assert out.n_islands > 5
