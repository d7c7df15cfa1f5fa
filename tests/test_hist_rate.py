"""histogram_rollup+quantiles and counter_rate == local NumPy oracles on
any partitioning (one hash shuffle each; partition structure invisible)."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _series_df(n=20_000, keys=7, seed=9):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "series_id": [f"s{int(i)}" for i in rng.integers(0, keys, n)],
        "x": rng.integers(0, 40 * 3_600_000_000, n).astype(np.int64),
        "y": rng.integers(-350, 350, n).astype(np.int64),
        "event_id": np.arange(n, dtype=np.int64),
    })


def _hist_oracle(df, window, bins, lo, hi, ps):
    width = (hi - lo) / bins
    d = df.copy()
    d["bucket"] = (d.x // window) * window
    d["bin"] = np.clip(np.floor((d.y.astype(np.float64) - lo) / width),
                       0, bins - 1).astype(np.int64)
    rows = []
    for (s, b), g in d.groupby(["series_id", "bucket"]):
        cnt = g.groupby("bin").size().sort_index()
        cum = cnt.cumsum()
        n = int(cnt.sum())
        row = {"series_id": s, "bucket": b, "n": n}
        for p in ps:
            rank = (n * p + 99) // 100
            qb = int(cum.index[np.searchsorted(cum.values, rank)])
            row[f"p{p}"] = lo + (qb + 1) * width
        rows.append(row)
    return pd.DataFrame(rows).sort_values(
        ["series_id", "bucket"]).reset_index(drop=True)


def test_histogram_quantiles_match_oracle(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.histogram import (histogram_quantiles,
                                                   histogram_rollup)

    df = _series_df()
    window, bins, lo, hi = 3_600_000_000, 32, -400.0, 400.0
    want = _hist_oracle(df, window, bins, lo, hi, (50, 95, 99))
    for parts in (1, 13):
        ds = rd.from_pandas(df.sample(frac=1.0, random_state=parts)
                            ).repartition(parts)
        hist = histogram_rollup(ds, window, bins=bins, lo=lo, hi=hi,
                                num_partitions=4)
        got = histogram_quantiles(hist, bins=bins, lo=lo, hi=hi,
                                  percentiles=(50, 95, 99)).to_pandas()
        got = got.sort_values(["series_id", "bucket"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def _rate_oracle(df, window):
    d = df.sort_values(["series_id", "x", "event_id"],
                       kind="stable").copy()
    d["prev"] = d.groupby("series_id")["y"].shift(1)
    d = d[d.prev.notna()]
    inc = np.where(d.y >= d.prev, d.y - d.prev, d.y).astype(np.int64)
    d = d.assign(inc=inc, bucket=(d.x // window) * window)
    g = d.groupby(["series_id", "bucket"]).agg(
        increase=("inc", "sum"), n_incr=("inc", "size")).reset_index()
    g["rate"] = g.increase.astype(np.float64) / (window / 1e6)
    return g.sort_values(["series_id", "bucket"]).reset_index(drop=True)


def test_counter_rate_matches_oracle(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.rate import counter_rate

    df = _series_df(seed=4)
    window = 3_600_000_000
    want = _rate_oracle(df, window)
    for parts in (1, 11):
        ds = rd.from_pandas(df.sample(frac=1.0, random_state=parts)
                            ).repartition(parts)
        got = counter_rate(ds, window, tiebreak_col="event_id",
                           num_partitions=4).to_pandas()
        got = got.sort_values(["series_id", "bucket"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got[["series_id", "bucket", "increase", "n_incr", "rate"]],
            want, check_dtype=False)


def test_counter_reset_semantics(ray_session):
    """y < prev is a reset: the new value counts whole."""
    import ray.data as rd

    from tsdownsample_ray.stages.rate import counter_rate

    df = pd.DataFrame({
        "series_id": ["a"] * 4,
        "x": np.array([0, 10, 20, 30], np.int64),
        "y": np.array([100, 150, 30, 40], np.int64),  # reset at x=20
        "event_id": np.arange(4, dtype=np.int64),
    })
    got = counter_rate(rd.from_pandas(df), 1_000, tiebreak_col="event_id",
                       num_partitions=2).to_pandas()
    assert int(got.increase.sum()) == 50 + 30 + 10  # delta, reset, delta


# --- threshold crossings & inter-arrival diffs -------------------------------

def test_threshold_crossings_directions(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.rate import threshold_crossings

    # y: 1 9 9 3 9 -> up at idx1, down at idx3, up at idx4
    tbl = pa.table({"series_id": ["s"] * 5,
                    "rid": pa.array(range(5), pa.int64()),
                    "x": pa.array([0, 10, 20, 30, 40], pa.int64()),
                    "y": pa.array([1, 9, 9, 3, 9], pa.int64())})
    out = sorted((r["x"], r["direction"]) for r in threshold_crossings(
        rd.from_arrow(tbl).repartition(3), 5, tiebreak_col="rid",
        num_partitions=2).take_all())
    assert out == [(10, 1), (30, -1), (40, 1)]


def test_series_diffs_cross_block(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.rate import series_diffs

    tbl = pa.table({"series_id": ["a"] * 4 + ["b"] * 2,
                    "rid": pa.array(range(6), pa.int64()),
                    "x": pa.array([0, 7, 9, 9, 100, 250], pa.int64())})
    out = sorted((r["series_id"], r["x"], r["delta"])
                 for r in series_diffs(
                     rd.from_arrow(tbl).repartition(6),
                     tiebreak_col="rid", num_partitions=3).take_all())
    assert out == [("a", 7, 7), ("a", 9, 0), ("a", 9, 2), ("b", 250, 150)]


def test_mad_outliers_matches_numpy(ray_session):
    """Integer MAD flags vs a float numpy replay (values chosen so no
    flag sits exactly on the threshold boundary)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from tsdownsample_ray.stages.quantiles import mad_outliers

    rng = np.random.default_rng(5)
    rows = []
    for s in ("a", "b"):
        # 130 sits between 1x and 2x the threshold band for this
        # geometry (catches the historical 2x-threshold bug)
        vals = rng.integers(90, 110, size=21).tolist() + [500, -300, 130]
        rows += [(s, i, int(v)) for i, v in enumerate(vals)]
    t = pa.table({"series_id": [r[0] for r in rows],
                  "bucket": [r[1] for r in rows],
                  "sum_y": [r[2] for r in rows]})
    out = mad_outliers(rd.from_arrow(t).repartition(3),
                       num_partitions=2).to_pandas()
    assert len(out) == len(rows)
    for s in ("a", "b"):
        vs = np.array([r[2] for r in rows if r[0] == s], dtype=np.float64)
        med = np.median(vs)
        mad = np.median(np.abs(vs - med))
        sub = out[out.series_id == s]
        for _, r in sub.iterrows():
            exp = abs(r["v"] - med) > 3 * 1.4826 * mad
            assert bool(r["outlier"]) == exp, (s, r["v"])
        # the planted extremes must flag
        assert sub[sub.v.isin([500, -300])]["outlier"].eq(1).all()


def test_theil_sen_matches_brute(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from tsdownsample_ray.stages.quantiles import theil_sen

    rng = np.random.default_rng(21)
    rows = []
    for s in ("a", "b"):
        buckets = np.sort(rng.choice(100, size=15, replace=False))
        vals = rng.integers(-50, 50, size=15)
        rows += [(s, int(b), int(v)) for b, v in zip(buckets, vals)]
    rows.append(("single", 0, 5))  # 1-point series: no output row
    t = pa.table({"series_id": [r[0] for r in rows],
                  "bucket": [r[1] for r in rows],
                  "sum_y": [r[2] for r in rows]})
    out = theil_sen(rd.from_arrow(t).repartition(3),
                    num_partitions=2).to_pandas()
    assert set(out["series_id"]) == {"a", "b"}
    for s in ("a", "b"):
        pts = sorted((b, v) for ss, b, v in rows if ss == s)
        slopes = sorted(
            (v2 - v1) / (b2 - b1)
            for i, (b1, v1) in enumerate(pts)
            for (b2, v2) in pts[i + 1:])
        n = len(slopes)
        exp = slopes[(n - 1) // 2] + slopes[n // 2]
        row = out[out.series_id == s]
        assert row["n_pairs"].iloc[0] == n
        assert row["slope2"].iloc[0] == exp
