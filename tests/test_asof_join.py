"""asof_join == pandas.merge_asof(by=key, direction='backward') on any
partitioning (the operator's one hash shuffle must be invisible)."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _frames(n_left=4000, n_right=700, keys=13, seed=5):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame({
        "series_id": [f"k{int(i)}" for i in rng.integers(0, keys, n_left)],
        "x": rng.integers(0, 100_000, n_left).astype(np.int64),
        "val": rng.standard_normal(n_left),
    })
    right = pd.DataFrame({
        "series_id": [f"k{int(i)}" for i in rng.integers(0, keys, n_right)],
        "x": rng.integers(0, 100_000, n_right).astype(np.int64),
        "agg": rng.integers(0, 1000, n_right).astype(np.int64),
    })
    # unique (key, x) on the right: backward-asof ties are then unambiguous
    right = right.drop_duplicates(["series_id", "x"]).reset_index(drop=True)
    return left, right


def _want(left, right):
    out = pd.merge_asof(
        left.sort_values("x", kind="stable"),
        right.sort_values("x", kind="stable"),
        on="x", by="series_id", direction="backward", suffixes=("", "_r"))
    return out.sort_values(["series_id", "x", "val"]).reset_index(drop=True)


def test_asof_join_matches_pandas(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.joins import asof_join

    left, right = _frames()
    want = _want(left, right)
    for lparts, rparts in ((1, 1), (9, 3), (25, 7)):
        got = asof_join(
            rd.from_pandas(left).repartition(lparts),
            rd.from_pandas(right).repartition(rparts),
            on="series_id", left_x="x", right_x="x", num_partitions=4,
        ).to_pandas().sort_values(["series_id", "x", "val"]).reset_index(
            drop=True)
        pd.testing.assert_frame_equal(
            got[["series_id", "x", "val", "agg"]],
            want[["series_id", "x", "val", "agg"]], check_dtype=False)


def test_asof_join_no_match_is_null(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.joins import asof_join

    left = pd.DataFrame({"series_id": ["a", "a", "b"],
                         "x": np.array([5, 50, 7], dtype=np.int64),
                         "val": [1.0, 2.0, 3.0]})
    right = pd.DataFrame({"series_id": ["a"],
                          "x": np.array([10], dtype=np.int64),
                          "agg": np.array([99], dtype=np.int64)})
    got = asof_join(rd.from_pandas(left), rd.from_pandas(right),
                    on="series_id", num_partitions=2,
                    left_x="x", right_x="x").to_pandas()
    got = got.sort_values(["series_id", "x"]).reset_index(drop=True)
    assert got.loc[0, "agg"] != got.loc[0, "agg"] or pd.isna(got.loc[0, "agg"])
    assert got.loc[1, "agg"] == 99          # x=50 >= 10
    assert pd.isna(got.loc[2, "agg"])       # key b has no right rows


def test_asof_join_inclusive_tie(ray_session):
    """left_x == right_x matches (DuckDB ASOF >= semantics)."""
    import ray.data as rd

    from tsdownsample_ray.stages.joins import asof_join

    left = pd.DataFrame({"series_id": ["a"], "x": np.array([10], np.int64),
                         "val": [1.0]})
    right = pd.DataFrame({"series_id": ["a"], "x": np.array([10], np.int64),
                          "agg": np.array([7], np.int64)})
    got = asof_join(rd.from_pandas(left), rd.from_pandas(right),
                    on="series_id", left_x="x", right_x="x",
                    num_partitions=2).to_pandas()
    assert got.loc[0, "agg"] == 7


def test_last_touch_attribution_matches_python(ray_session):
    """Deterministic last-touch: sequential replay incl. equal-ts ties
    (larger event id wins) and window expiry."""
    import numpy as np
    import pyarrow as pa
    import ray

    from tsdownsample_ray.stages.joins import last_touch_attribution

    W = 100
    rows = [
        # user 1: view@10, click@50, purchase@60 -> click
        (1, 10, 1, "view"), (1, 50, 2, "click"), (1, 60, 3, "purchase"),
        # user 1: purchase@200 -> window expired (200-50 > 100) -> none
        (1, 200, 4, "purchase"),
        # user 2: tie at x=30 between ids 6,7 -> larger id (7, 'b') wins
        (2, 30, 6, "a"), (2, 30, 7, "b"), (2, 30, 8, "purchase"),
        # user 3: purchase with no prior -> none
        (3, 5, 9, "purchase"),
        # user 4: later purchase of ANOTHER user must not cross users
        (4, 31, 10, "view"), (4, 40, 11, "purchase"),
        # user 5: null source type attributes to the documented 'none'
        # fallback, never the accidental str(None) == 'None' label
        (5, 10, 12, None), (5, 20, 13, "purchase"),
    ]
    expect = {"click": 1, "none": 3, "b": 1, "view": 1}

    tbl = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts_us": pa.array([r[1] for r in rows], pa.int64()),
        "event_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows])})
    for nparts in (1, 3):
        ds = ray.data.from_arrow(tbl).repartition(nparts)
        out = last_touch_attribution(ds, window_us=W, num_partitions=2,
                                     fanin=2).to_pandas()
        got = dict(zip(out["event_type"], out["n"]))
        assert got == expect
