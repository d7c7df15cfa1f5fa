"""Pin the defensive guards added to the dedup/similarity stages:
mis-sized LSH banding, out-of-contract SimHash radii, string doc ids in
the stop-gram sampler, empty-block embedding batches, and the
covariance numerator overflow escape."""

import numpy as np
import pyarrow as pa
import pytest

from tsdownsample_ray.stages.similarity import (
    embedding_matrix,
    embedding_near_dup_pairs,
)


def test_lsh_bands_must_divide_signature(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.dedup import lsh_candidate_pairs

    sigs = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "minhash": pa.array([list(range(10)), list(range(10, 20))],
                            pa.list_(pa.uint64())),
    })
    # bands=16 > num_perm=10: r would be 0 -> one global bucket
    with pytest.raises(Exception, match="must divide"):
        lsh_candidate_pairs(rd.from_arrow(sigs), bands=16).materialize()
    # bands=3 leaves a remainder over 10 values
    with pytest.raises(Exception, match="must divide"):
        lsh_candidate_pairs(rd.from_arrow(sigs), bands=3).materialize()


def test_lsh_dividing_bands_still_pass(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.dedup import lsh_candidate_pairs

    sig = list(range(10))
    sigs = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "minhash": pa.array([sig, sig], pa.list_(pa.uint64())),
    })
    out = lsh_candidate_pairs(rd.from_arrow(sigs), bands=5).materialize()
    got = out.to_pandas()
    assert len(got) == 1  # identical signatures -> the one (1, 2) pair
    assert got.iloc[0]["a"] == 1 and got.iloc[0]["b"] == 2


def test_simhash_max_hamming_contract(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.dedup import simhash_near_dup_pairs

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1], pa.int64()), "text": ["hello world"]}))
    # the 4x16 banding's pigeonhole recall stops at 3 differing bits
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_near_dup_pairs(docs, max_hamming=4)
    # the boundary value stays accepted
    out = simhash_near_dup_pairs(docs, max_hamming=3).materialize()
    assert out.count() == 0  # one doc -> no pairs


def test_embedding_lsh_plane_guards():
    dummy = None  # guards fire before the dataset is touched
    with pytest.raises(ValueError, match="divide"):
        embedding_near_dup_pairs(dummy, planes=100, bands=16)
    with pytest.raises(ValueError, match="int64"):
        embedding_near_dup_pairs(dummy, planes=130, bands=2)  # r = 65


def test_corpus_stop_grams_string_ids(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.dedup import corpus_stop_grams

    texts = [f"AAAAA unique{i}snippet" for i in range(8)]
    int_t = pa.table({"doc_id": pa.array(range(8), pa.int64()),
                      "text": texts})
    str_t = pa.table({"doc_id": [f"doc-{i}" for i in range(8)],
                      "text": texts})
    # sample_mod=1 samples every doc under both id hash disciplines, so
    # the string-id path must reproduce the integer-id result exactly
    ci, di = corpus_stop_grams(rd.from_arrow(int_t), n=5, stop_m=4,
                               sample_mod=1)
    cs, ds_ = corpus_stop_grams(rd.from_arrow(str_t), n=5, stop_m=4,
                                sample_mod=1)
    assert np.array_equal(ci, cs) and np.array_equal(di, ds_)
    # a real subsample over string ids is deterministic and non-crashing
    c1, _ = corpus_stop_grams(rd.from_arrow(str_t), n=5, stop_m=4,
                              sample_mod=2)
    c2, _ = corpus_stop_grams(rd.from_arrow(str_t), n=5, stop_m=4,
                              sample_mod=2)
    assert np.array_equal(c1, c2)


def test_embedding_matrix_empty_batch():
    empty = pa.table({"vec_id": pa.array([], pa.int64()),
                      "embedding": pa.array([], pa.list_(pa.float64()))})
    E = embedding_matrix(empty)
    assert E.shape == (0, 0) and E.dtype == np.float64


def test_embedding_covariance_overflow_raises(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.similarity import embedding_covariance

    # 2000 rows alternating q = ±2.1e6 (raw ±2100, scale 1000): the
    # per-partial Gram 8.8e15 stays under the 2^53 exactness assert and
    # sx = 0, so the numerator n*sxy = 2000 * 8.8e15 = 1.76e19 exceeds
    # int64 with no sx*sy cancellation — the guard must surface the
    # OverflowError, not wrap silently
    t = pa.table({"vec_id": pa.array(range(2000), pa.int64()),
                  "embedding": pa.array(
                      [[2100.0], [-2100.0]] * 1000,
                      pa.list_(pa.float64()))})
    with pytest.raises(Exception, match="exceeds int64"):
        embedding_covariance(rd.from_arrow(t), scale=1000).materialize()


def test_embedding_covariance_in_range_unchanged(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.similarity import embedding_covariance

    rng = np.random.default_rng(7)
    V = rng.normal(size=(50, 3))
    t = pa.table({"vec_id": pa.array(range(50), pa.int64()),
                  "embedding": pa.array(V.tolist(), pa.list_(pa.float64()))})
    out = (embedding_covariance(rd.from_arrow(t), scale=1000)
           .to_pandas().set_index(["i", "j"]).sort_index())
    Q = np.trunc(V * 1000).astype(np.int64)
    n = 50
    for (i, j), row in out.iterrows():
        x, y = Q[:, i - 1], Q[:, j - 1]
        num = n * int((x * y).sum()) - int(x.sum()) * int(y.sum())
        assert row["cov_num"] == num
        assert row["cov"] == pytest.approx(num / (n * n))


# --- round-5 review batch: exactness guards + typed-empty paths -------------

def test_detect_anomalies_overflow_raises(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.windows import detect_anomalies

    t = pa.table({
        "series_id": pa.array(["s"] * 6, pa.string()),
        "x": pa.array(list(range(6)), pa.int64()),
        # within the comment's old (wrong) |y|<2^31 claim but far past
        # the real (2kY)^2 bound — must raise, never wrap silently
        "y": pa.array([0, 0, 0, 0, 0, 2_000_000_000], pa.int64()),
    })
    with pytest.raises(Exception, match="OverflowError|too large"):
        detect_anomalies(rd.from_arrow(t), k=50, t=3,
                         num_partitions=1).materialize()


def test_mad_outliers_overflow_raises(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.quantiles import mad_outliers

    t = pa.table({
        "series_id": pa.array(["s"] * 3, pa.string()),
        "bucket": pa.array([0, 1, 2], pa.int64()),
        "sum_y": pa.array([0, 0, 2 ** 60], pa.int64()),
    })
    with pytest.raises(Exception, match="OverflowError|too large"):
        mad_outliers(rd.from_arrow(t), num_partitions=1).materialize()


def test_theil_sen_duplicate_bucket_raises(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.quantiles import theil_sen

    t = pa.table({
        "series_id": pa.array(["s", "s", "s"], pa.string()),
        "bucket": pa.array([0, 0, 1], pa.int64()),  # duplicate bucket
        "sum_y": pa.array([1, 2, 3], pa.int64()),
    })
    with pytest.raises(Exception, match="duplicate"):
        theil_sen(rd.from_arrow(t), num_partitions=1).materialize()


def test_autocorrelation_subsecond_window_epoch_buckets(ray_session):
    """The old 32-bit composite-key mask wrapped for epoch-us buckets at
    sub-second windows (bidx >= 2^32), silently corrupting lag matches;
    the dynamic-span key must produce the exact pair stats."""
    import ray.data as rd

    from tsdownsample_ray.stages.correlate import autocorrelation

    w = 100_000  # 100 ms: epoch-us // w ~ 1.7e10 > 2^32
    base = 1_770_000_000_000_000
    buckets = [base + i * w for i in range(6)]
    vals = [3, 1, 4, 1, 5, 9]
    t = pa.table({
        "series_id": pa.array(["s"] * 6, pa.string()),
        "bucket": pa.array(buckets, pa.int64()),
        "sum_y": pa.array(vals, pa.int64()),
    })
    out = autocorrelation(rd.from_arrow(t), window_us=w, lags=(1,),
                          num_partitions=1).to_pandas()
    assert len(out) == 1
    x = np.array(vals[:-1], np.float64)
    y = np.array(vals[1:], np.float64)
    n = len(x)
    num = n * (x * y).sum() - x.sum() * y.sum()
    den = np.sqrt(n * (x * x).sum() - x.sum() ** 2) * np.sqrt(
        n * (y * y).sum() - y.sum() ** 2)
    assert out["corr"].iloc[0] == pytest.approx(num / den, abs=1e-12)


def test_weighted_median_int_key_empty_group_schema(ray_session):
    """Zero-row groups must emit the INPUT key type (int64), not the old
    pa.string() fallback that schema-mismatched populated blocks."""
    import ray.data as rd

    from tsdownsample_ray.stages.quantiles import weighted_median

    t = pa.table({
        "series_id": pa.array([7, 7, 8], pa.int64()),
        "v": pa.array([10, 20, 30], pa.int64()),
        "w": pa.array([1, 2, 1], pa.int64()),
    })
    out = weighted_median(rd.from_arrow(t), key_col="series_id",
                          val_col="v", weight_col="w",
                          num_partitions=4).to_pandas()
    assert sorted(out["series_id"].tolist()) == [7, 8]
    assert str(out["series_id"].dtype) == "int64"


def test_asof_join_null_key_never_matches(ray_session):
    """SQL ASOF 'l.key = r.key' never matches NULL: a null-key left row
    must emit null right columns even when a null-key right row exists
    at an earlier x (group_codes groups nulls — the join must veto)."""
    import ray.data as rd

    from tsdownsample_ray.stages.joins import asof_join

    left = pa.table({
        "series_id": pa.array([None, "a"], pa.string()),
        "x": pa.array([10, 10], pa.int64()),
    })
    right = pa.table({
        "series_id": pa.array([None, "a"], pa.string()),
        "x": pa.array([5, 5], pa.int64()),
        "val": pa.array([7, 9], pa.int64()),
    })
    out = asof_join(rd.from_arrow(left), rd.from_arrow(right),
                    on="series_id", num_partitions=1).to_pandas()
    nulls = out[out["series_id"].isna()]
    assert len(nulls) == 1 and nulls["val"].isna().all()
    a = out[out["series_id"] == "a"]
    assert a["val"].tolist() == [9]


def test_last_touch_null_user_counts_none(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.joins import last_touch_attribution

    t = pa.table({
        "user_id": pa.array([None, None], pa.string()),
        "x": pa.array([1, 2], pa.int64()),
        "event_id": pa.array([1, 2], pa.int64()),
        "event_type": pa.array(["ad_click", "purchase"], pa.string()),
    })
    out = last_touch_attribution(
        rd.from_arrow(t), on="user_id", x_col="x", id_col="event_id",
        type_col="event_type", target="purchase",
        num_partitions=1).to_pandas()
    d = dict(zip(out["event_type"], out["n"]))
    assert d.get("none") == 1 and "ad_click" not in d


def test_kmv_distinct_ignores_null_values(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.sketches import kmv_distinct

    t = pa.table({
        "domain": pa.array(["d"] * 4, pa.string()),
        "url": pa.array(["u1", None, "u2", None], pa.string()),
    })
    out = kmv_distinct(rd.from_arrow(t), key_col="domain",
                       value_col="url").to_pandas()
    assert len(out) == 1


def test_streak_profile_null_series_survives(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.diffing import streak_profile

    t = pa.table({
        "series_id": pa.array([None, None, None, "s", "s"], pa.string()),
        "x": pa.array([1, 2, 3, 1, 2], pa.int64()),
        "y": pa.array([1, 2, 3, 5, 4], pa.int64()),
    })
    out = streak_profile(rd.from_arrow(t),
                         num_partitions=1).to_pandas()
    # null series forms its own group (SQL GROUP BY NULL semantics)
    assert len(out) == 2
    nul = out[out["series_id"].isna()].iloc[0]
    assert nul["max_up_steps"] == 2
    s = out[out["series_id"] == "s"].iloc[0]
    assert s["max_down_steps"] == 1


def test_resize_image_grayscale_channel_inference():
    """ResizeImage must infer c=1 for grayscale tensors (1-component
    JPEGs decode to h*w buffers); a hard-coded 3-channel reshape would
    crash."""
    from tsdownsample_ray.stages.multimodal import ResizeImage

    h, w = 6, 4
    gray = list(range(h * w))
    batch = pa.table({
        "pixels": pa.array([gray], pa.list_(pa.uint8())),
        "height": pa.array([h], pa.int32()),
        "width": pa.array([w], pa.int32()),
    })
    out = ResizeImage(out_h=3, out_w=2)(batch)
    px = out["pixels"].to_pylist()[0]
    assert len(px) == 3 * 2  # c = 1 preserved
    img = np.asarray(gray, np.uint8).reshape(h, w, 1)
    yi = np.arange(3) * h // 3
    xi = np.arange(2) * w // 2
    assert px == img[yi][:, xi].reshape(-1).tolist()


def test_bigseries_minmax_nan_return_keeps_duplicate_pair(ray_session):
    """nan_policy_return=True on kernel='minmax' must keep the pinned
    duplicate (x, NaN) pair exactly like kernel='nanminmax' (the dedup
    keys on the effective policy, not the kernel name)."""
    import ray.data as rd

    from tsdownsample_ray.stages.bigseries import downsample_big_series

    n = 4000
    x = np.arange(n, dtype=np.int64)
    y = np.sin(x / 40.0).astype(np.float64)
    y[1234] = np.nan
    t = pa.table({"x": pa.array(x), "y": pa.array(y)})
    ds = rd.from_arrow(t).repartition(4)
    up = downsample_big_series(ds, 8, kernel="minmax",
                               nan_policy_return=True).to_pandas()
    ref = downsample_big_series(ds, 8, kernel="nanminmax").to_pandas()
    assert up["x"].tolist() == ref["x"].tolist()
    assert np.array_equal(np.isnan(up["y"]), np.isnan(ref["y"]))
