"""grouping_sets_sum, grouped_checksum, event_transitions unit tests."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def test_grouping_sets_match_pandas(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.cube import grouping_sets_sum

    rng = np.random.default_rng(21)
    n = 300
    df = pd.DataFrame({
        "a": rng.choice(["x", "y"], size=n),
        "b": rng.choice(["p", "q", "r"], size=n),
        "v": rng.integers(0, 10, size=n).astype("int64"),
    })
    out = grouping_sets_sum(
        rd.from_pandas(df).repartition(5), keys=["a", "b"],
        sets=[("a", "b"), ("a",), ("b",), ()],
        sum_cols=["v"], count_col="n", num_partitions=2).to_pandas()

    # grand total (gid=3): both keys aggregated away
    g3 = out[out.gid == 3]
    assert len(g3) == 1 and g3["v"].iloc[0] == df["v"].sum() \
        and g3["n"].iloc[0] == n
    # per-a (gid=1: b aggregated away, the LAST key = least-sig bit)
    g1 = out[out.gid == 1].set_index("a")
    want = df.groupby("a")["v"].sum()
    assert {k: int(v) for k, v in g1["v"].items()} == want.to_dict()
    # per-(a,b) (gid=0) matches the full groupby
    g0 = out[out.gid == 0].set_index(["a", "b"])
    want = df.groupby(["a", "b"])["v"].sum()
    assert g0["v"].to_dict() == want.to_dict()
    # validation
    with pytest.raises(ValueError):
        grouping_sets_sum(rd.from_pandas(df), keys=["a"],
                          sets=[("zz",)], sum_cols=["v"])


def test_grouped_checksum_order_and_partition_invariant(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.integrity import grouped_checksum

    rng = np.random.default_rng(2)
    n = 500
    df = pd.DataFrame({
        "k": rng.choice(["a", "b"], size=n),
        "c1": rng.integers(-1000, 1000, size=n).astype("int64"),
        "c2": rng.integers(0, 10**9, size=n).astype("int64"),
    })
    base = grouped_checksum(rd.from_pandas(df).repartition(2),
                            key_col="k", cols=["c1", "c2"],
                            num_partitions=2).to_pandas()
    shuf = df.sample(frac=1.0, random_state=7).reset_index(drop=True)
    again = grouped_checksum(rd.from_pandas(shuf).repartition(9),
                             key_col="k", cols=["c1", "c2"],
                             num_partitions=3).to_pandas()
    a = base.sort_values("series_id").reset_index(drop=True)
    b = again.sort_values("series_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # a single changed row changes the digest
    df2 = df.copy()
    df2.loc[0, "c1"] += 1
    diff = grouped_checksum(rd.from_pandas(df2).repartition(2),
                            key_col="k", cols=["c1", "c2"],
                            num_partitions=2).to_pandas()
    d = diff.sort_values("series_id").reset_index(drop=True)
    k0 = df.loc[0, "k"]
    assert (a[a.series_id == k0]["checksum_sum"].iloc[0]
            != d[d.series_id == k0]["checksum_sum"].iloc[0])


def test_event_transitions_vs_replay(ray_session):
    import collections

    import ray.data as rd

    from tsdownsample_ray.stages.funnel import event_transitions

    rng = np.random.default_rng(17)
    n = 400
    df = pd.DataFrame({
        "user_id": rng.integers(0, 12, size=n).astype("int64"),
        "event_type": rng.choice(["v", "c", "p"], size=n),
        "event_id": np.arange(n, dtype="int64"),
        "ts_us": rng.integers(0, 50, size=n).astype("int64"),
    })
    out = event_transitions(rd.from_pandas(df).repartition(6),
                            num_partitions=3, fanin=2).to_pandas()
    want = collections.Counter()
    for _, g in df.sort_values(["ts_us", "event_id"]).groupby("user_id"):
        ev = list(g["event_type"])
        for s, t in zip(ev, ev[1:]):
            want[(s, t)] += 1
    got = {(r.src, r.dst): r.c for r in out.itertuples()}
    assert got == dict(want)


def test_tier_consistency_all_consistent(ray_session):
    """The cascade invariant holds on real data: every tier total is
    identical, and bucket counts shrink monotonically up the tiers."""
    from tsdownsample_ray.pipelines.queries import q_tier_consistency_events

    out = q_tier_consistency_events("/root/testdata/sf0.001")
    assert out["consistent"].all()
    assert (out["nb_15m"] >= out["nb_1h"]).all()
    assert (out["nb_1h"] >= out["nb_1d"]).all()
    assert len(out) == 5


def test_fleet_bands_match_numpy(ray_session):
    """Per-bucket cross-series discrete quantiles equal a numpy replay."""
    import duckdb
    import numpy as np

    from tsdownsample_ray.pipelines.queries import q_fleet_bands_1h

    sf = "/root/testdata/sf0.001"
    out = (q_fleet_bands_1h(sf).to_pandas()
           .sort_values("bucket").reset_index(drop=True))
    r = duckdb.sql(f"""
        SELECT event_type, (epoch_us(ts) // 3600000000) * 3600000000 b,
               CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) s
        FROM '{sf}/events.parquet' GROUP BY 1, 2
    """).df()
    for _, row in out.iterrows():
        vals = np.sort(r[r["b"] == row["bucket"]]["s"].to_numpy())
        n = len(vals)
        assert row["n"] == n
        for p, col in ((10, "p10"), (50, "p50"), (90, "p90")):
            assert row[col] == vals[(n - 1) * p // 100], (p, row["bucket"])
