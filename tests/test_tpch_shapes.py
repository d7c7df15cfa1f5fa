"""The round-5 TPC-H shape batch: grouped_min_parts (hashpart argmin
scaffold) against pandas, the packed-int64 tie-break contract, and two
of the analog queries replayed against DuckDB at sf0.001."""

import duckdb
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_grouped_min_parts_matches_pandas(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.rollup import grouped_min_parts

    rng = np.random.default_rng(41)
    n = 5000
    df = pd.DataFrame({
        "k1": rng.choice([f"g{i}" for i in range(37)], n),
        "k2": rng.integers(0, 5, n),
        "v": rng.integers(-10**12, 10**12, n),
        "w": rng.integers(0, 10**6, n),
    })
    ds = rd.from_pandas(df).repartition(9)
    out = grouped_min_parts(ds, ["k1", "k2"], ["v", "w"], fanin=3) \
        .to_pandas().sort_values(["k1", "k2"]).reset_index(drop=True)
    exp = df.groupby(["k1", "k2"], as_index=False)[["v", "w"]].min() \
        .sort_values(["k1", "k2"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)


def test_packed_argmin_is_order_by_limit_1(ray_session):
    """min(value * K + id) with id < K must equal SQL's
    ORDER BY value, id LIMIT 1 per key — including exact-tie groups."""
    import ray.data as rd

    from tsdownsample_ray.stages.rollup import grouped_min_parts

    rng = np.random.default_rng(43)
    n = 2000
    df = pd.DataFrame({
        "key": rng.integers(0, 50, n),
        "cost": rng.integers(0, 20, n),  # small range -> many ties
        "sid": rng.integers(0, 1000, n),
    })
    df["packed"] = df.cost * 1024 + df.sid
    ds = rd.from_pandas(df[["key", "packed"]]).repartition(7)
    out = grouped_min_parts(ds, ["key"], ["packed"], fanin=2).to_pandas()
    out["cost"] = out.packed // 1024
    out["sid"] = out.packed % 1024

    exp = df.sort_values(["key", "cost", "sid"]).groupby(
        "key", as_index=False).first()
    merged = out.merge(exp, on="key", suffixes=("", "_exp"))
    assert (merged.cost == merged.cost_exp).all()
    assert (merged.sid == merged.sid_exp).all()


def test_ship_delay_priority_vs_duckdb(ray_session):
    """Negative ship-order deltas exist in the corpus: the engine's
    clamp-before-divide must agree with SQL's greatest()//30."""
    from tsdownsample_ray.pipelines.queries import QUERIES

    out = QUERIES["ship_delay_priority"](SF).to_pandas() \
        .sort_values("delay_bucket").reset_index(drop=True)
    exp = duckdb.sql(f"""
        SELECT least(greatest(CAST(date_diff('day', o_orderdate,
                                             l_shipdate) AS BIGINT), 0)
                     // 30, 4) AS delay_bucket,
               sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS high_line_count,
               sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 0 ELSE 1 END) AS low_line_count,
               count(*) AS n_lines
        FROM '{SF}/lineitem.parquet'
        JOIN '{SF}/orders.parquet' ON l_orderkey = o_orderkey
        GROUP BY 1 ORDER BY 1
    """).df()
    assert len(out) == len(exp)
    for c in ("delay_bucket", "high_line_count", "low_line_count",
              "n_lines"):
        assert (out[c].to_numpy().astype(np.int64)
                == exp[c].to_numpy().astype(np.int64)).all(), c


def test_sole_late_supplier_vs_duckdb(ray_session):
    from tsdownsample_ray.pipelines.queries import QUERIES

    out = QUERIES["sole_late_supplier_orders"](SF).to_pandas() \
        .sort_values("s_suppkey").reset_index(drop=True)
    exp = duckdb.sql(f"""
        WITH pair AS (
            SELECT l_orderkey, l_suppkey,
                   max(CASE WHEN l_shipdate > o_orderdate
                                 + INTERVAL 60 DAY THEN 1 ELSE 0 END)
                       AS is_late
            FROM '{SF}/lineitem.parquet'
            JOIN '{SF}/orders.parquet' ON l_orderkey = o_orderkey
            GROUP BY 1, 2
        ),
        per_order AS (
            SELECT l_orderkey, count(*) AS n_supp, sum(is_late) AS n_late,
                   sum(l_suppkey * is_late) AS late_supp
            FROM pair GROUP BY 1
        )
        SELECT late_supp AS s_suppkey, count(*) AS numwait
        FROM per_order WHERE n_supp >= 2 AND n_late = 1
        GROUP BY 1 ORDER BY 1
    """).df()
    assert len(out) == len(exp)
    assert (out.s_suppkey.to_numpy().astype(np.int64)
            == exp.s_suppkey.to_numpy().astype(np.int64)).all()
    assert (out.numwait.to_numpy().astype(np.int64)
            == exp.numwait.to_numpy().astype(np.int64)).all()
