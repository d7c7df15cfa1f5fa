"""Funnel matching, cohort retention, and wide pivot vs Python replays."""

import numpy as np
import pyarrow as pa
import pytest

ray = pytest.importorskip("ray")
import ray.data as rd  # noqa: E402


def test_funnel_greedy_semantics(ray_session):
    from tsdownsample_ray.stages.funnel import funnel

    rows = [
        # u1 full funnel
        ("u1", "view", 10), ("u1", "click", 20), ("u1", "purchase", 30),
        # u2: click BEFORE view never matches; later click does
        ("u2", "click", 5), ("u2", "view", 10), ("u2", "click", 15),
        # u3: purchase without click -> depth 1
        ("u3", "view", 1), ("u3", "purchase", 2),
        # u4: no funnel events at all -> depth 0
        ("u4", "error", 9),
        # u5: greedy-earliest view (t=1), click must be after 1 not 100
        ("u5", "view", 100), ("u5", "view", 1), ("u5", "click", 50),
        ("u5", "purchase", 49),
    ]
    t = pa.table({"user_id": [r[0] for r in rows],
                  "t": [r[1] for r in rows],
                  "x": [r[2] for r in rows]})
    out = funnel(rd.from_arrow(t).repartition(3),
                 ["view", "click", "purchase"],
                 num_partitions=2).to_pandas().set_index("user_id")
    assert out.loc["u1"].tolist() == [3, 10, 20, 30]
    assert out.loc["u2"].tolist() == [2, 10, 15, -1]
    assert out.loc["u3"].tolist() == [1, 1, -1, -1]
    assert out.loc["u4"].tolist() == [0, -1, -1, -1]
    # u5: view@1, click@50, purchase@49 < 50 -> unmatched
    assert out.loc["u5"].tolist() == [2, 1, 50, -1]


def test_cohort_retention(ray_session):
    from tsdownsample_ray.stages.funnel import cohort_retention

    W = 7 * 24 * 3600 * 1_000_000
    rows = [("a", 0), ("a", 1), ("a", 1), ("a", 3),
            ("b", 1), ("b", 2),
            ("c", 0)]
    t = pa.table({"user_id": [r[0] for r in rows],
                  "x": [r[1] * W + 17 for r in rows]})
    out = cohort_retention(rd.from_arrow(t).repartition(2),
                           num_partitions=2).to_pandas()
    got = {(r["cohort_week_us"] // W, r["week_offset"]): r["n_users"]
           for _, r in out.iterrows()}
    assert got == {(0, 0): 2, (0, 1): 1, (0, 3): 1,
                   (1, 0): 1, (1, 1): 1}


def test_pivot_counts(ray_session):
    from tsdownsample_ray.stages.pivot import pivot_counts

    t = pa.table({"src": ["s1", "s1", "s1", "s2", "s2"],
                  "lang": ["en", "en", "xx", "de", "en"]})
    out = pivot_counts(rd.from_arrow(t).repartition(2), row_col="src",
                       col_col="lang", columns=["en", "de"],
                       fanin=2).to_pandas().set_index("src")
    assert out.loc["s1"].tolist() == [2, 0, 1]   # n_en, n_de, other
    assert out.loc["s2"].tolist() == [1, 1, 0]


def test_cap_per_group(ray_session):
    from tsdownsample_ray.stages.curation import cap_per_group

    t = pa.table({"g": ["a"] * 5 + ["b"] * 2,
                  "w": [10, 50, 30, 50, 20, 7, 9],
                  "id": [1, 2, 3, 4, 5, 6, 7]})
    out = cap_per_group(rd.from_arrow(t).repartition(3), group_col="g",
                        k=2, order_col="w", tiebreak_col="id",
                        num_partitions=2).to_pandas()
    kept = set(zip(out["g"], out["id"], out["rk"]))
    # a: w=50 twice, tie by id -> ids 2 (rk0), 4 (rk1); b: 9 then 7
    assert kept == {("a", 2, 0), ("a", 4, 1), ("b", 7, 0), ("b", 6, 1)}


def test_mixture_order_stride(ray_session):
    """Weight-2 source appears twice per weight-1 appearance in any
    schedule prefix (stride scheduling invariant)."""
    import numpy as np

    from tsdownsample_ray.stages.curation import mixture_order

    t = pa.table({"doc_id": list(range(40)),
                  "source": ["hi"] * 20 + ["lo"] * 20})
    out = mixture_order(rd.from_arrow(t), {"hi": 2, "lo": 1}, salt=3,
                        num_partitions=2).to_pandas()
    sched = out.sort_values(["mix_key", "source", "doc_id"])
    first12 = sched.head(12)["source"].tolist()
    assert first12.count("hi") == 8 and first12.count("lo") == 4


def test_conversion_latency_matches_duckdb(ray_session):
    import duckdb

    from tsdownsample_ray.pipelines.queries import (
        CONVERSION_LATENCY_SQL, q_conversion_latency_users)

    sf = "/root/testdata/sf0.001"
    got = q_conversion_latency_users(sf)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS FROM '{sf}/events.parquet'")
    exp = con.sql(CONVERSION_LATENCY_SQL).df()
    for c in ("n", "p50", "p90", "p99", "sum_lat"):
        assert int(got[c].iloc[0]) == int(exp[c].iloc[0]), c
    assert int(got["n"].iloc[0]) > 0


def test_markov_baseline_argmax_policy(ray_session):
    import duckdb

    from tsdownsample_ray.pipelines.queries import q_markov_baseline_events

    sf = "/root/testdata/sf0.001"
    out = q_markov_baseline_events(sf)
    tm = duckdb.sql(f"""
        WITH s AS (
            SELECT event_type,
                   lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY epoch_us(ts), event_id)
                       AS prev
            FROM '{sf}/events.parquet'
        )
        SELECT prev AS src, event_type AS dst, count(*) AS c
        FROM s WHERE prev IS NOT NULL GROUP BY 1, 2
    """).df()
    for _, r in out.iterrows():
        g = tm[tm["src"] == r["src"]].sort_values(
            ["c", "dst"], ascending=[False, True])
        assert r["pred"] == g.iloc[0]["dst"]
        assert r["hits"] == g.iloc[0]["c"]
        assert r["support"] == g["c"].sum()
        assert r["acc_pm"] == (1000 * r["hits"]) // r["support"]
    assert set(out["src"]) == set(tm["src"].unique())


def test_ltv_curve_matches_duckdb(ray_session):
    import duckdb

    from tsdownsample_ray.pipelines.queries import (LTV_CURVE_SQL,
                                                    q_ltv_curve_users)

    sf = "/root/testdata/sf0.001"
    got = q_ltv_curve_users(sf)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS FROM '{sf}/events.parquet'")
    exp = con.sql(LTV_CURVE_SQL).df().sort_values(
        "woff").reset_index(drop=True)
    for c in ("woff", "rev", "u", "cum_rev"):
        assert got[c].tolist() == exp[c].tolist(), c
    # offset-0 row exists (every purchaser's first week) and cum is
    # monotone
    assert got["woff"].iloc[0] == 0
    assert got["cum_rev"].is_monotonic_increasing
