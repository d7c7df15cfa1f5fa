"""Deterministic hash sampling: field arithmetic, statistical sanity,
reproducibility under partitioning, and the stratified/split contracts."""

import numpy as np
import pyarrow as pa
import pytest

from tsdownsample_ray.stages.sampling import (
    K1, K2, MOD61, assign_splits, bernoulli_sample, hash61, mulmod61,
    rate_threshold, stratified_sample,
)


def test_mulmod61_matches_python_ints():
    rng = np.random.default_rng(0)
    a = rng.integers(0, MOD61, size=2000, dtype=np.uint64)
    for k in (K1, K2, 3, MOD61 - 1):
        got = mulmod61(a, k)
        want = (a.astype(object) * k) % MOD61
        assert (got.astype(object) == want).all()


def test_hash61_uniform_and_deterministic():
    h1 = hash61(np.arange(50_000))
    h2 = hash61(np.arange(50_000))
    assert (h1 == h2).all()
    # uniformity: decile occupancy within 3% absolute
    frac = np.searchsorted(np.sort(h1), np.uint64(MOD61 // 10)) / len(h1)
    assert abs(frac - 0.1) < 0.03
    # salt decorrelates
    assert (hash61(np.arange(100), salt=1) != h1[:100]).any()


def test_nested_samples():
    """rate 0.1 sample is a subset of the rate 0.3 sample (same salt)."""
    ids = np.arange(10_000)
    h = hash61(ids, salt=2)
    small = set(ids[h < np.uint64(rate_threshold(0.1))])
    large = set(ids[h < np.uint64(rate_threshold(0.3))])
    assert small <= large
    assert 0.07 < len(small) / 10_000 < 0.13
    assert 0.27 < len(large) / 10_000 < 0.33


@pytest.fixture
def doc_ds(ray_session):
    import ray.data as rd

    n = 4000
    t = pa.table({
        "doc_id": pa.array(np.arange(n)),
        "lang": pa.array(np.array(["en", "de", "fr", "zh"])[np.arange(n) % 4]),
    })
    return rd.from_arrow(t)


def test_bernoulli_sample_partition_invariant(doc_ds):
    a = set(bernoulli_sample(doc_ds, id_col="doc_id", rate=0.2, salt=5)
            .to_pandas()["doc_id"])
    b = set(bernoulli_sample(doc_ds.repartition(13), id_col="doc_id",
                             rate=0.2, salt=5).to_pandas()["doc_id"])
    assert a == b
    assert 0.15 < len(a) / 4000 < 0.25


def test_stratified_rates(doc_ds):
    out = stratified_sample(doc_ds, id_col="doc_id", strata_col="lang",
                            rates={"en": 1.0, "de": 0.0, "fr": 0.5},
                            default_rate=0.1, salt=1).to_pandas()
    by = out.groupby("lang").size()
    assert by.get("en", 0) == 1000
    assert by.get("de", 0) == 0
    assert 350 < by.get("fr", 0) < 650
    assert 40 < by.get("zh", 0) < 200  # default 0.1


def test_assign_splits_disjoint_complete(doc_ds):
    out = assign_splits(doc_ds, id_col="doc_id",
                        splits={"train": 0.8, "val": 0.1, "test": 0.1},
                        salt=9).to_pandas()
    assert len(out) == 4000
    assert set(out["split"]) == {"train", "val", "test"}
    counts = out.groupby("split").size()
    assert 0.75 < counts["train"] / 4000 < 0.85
    # exactly one label per id
    assert out["doc_id"].is_unique


def test_assign_splits_bad_weights(doc_ds):
    with pytest.raises(ValueError):
        assign_splits(doc_ds, id_col="doc_id",
                      splits={"a": 0.5, "b": 0.4}, salt=0)


def test_hash61_sql_parity():
    """The SQL restatement used by the driver oracles is bit-identical."""
    import duckdb

    from tsdownsample_ray.stages.sampling import hash61_sql

    ids = np.array([0, 1, 17, 999999937, 2**60 + 123], dtype=np.int64)
    con = duckdb.connect()
    con.register("t", pa.table({"id": pa.array(ids)}))
    got = con.execute(
        f"SELECT CAST({hash61_sql('id', 4)} AS BIGINT) AS h FROM t"
    ).fetchnumpy()["h"].astype(np.uint64)
    assert (got == hash61(ids, salt=4)).all()


def test_training_order_is_total_permutation(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from tsdownsample_ray.stages.ordering import training_order
    from tsdownsample_ray.stages.sampling import hash61

    ids = np.arange(1000, dtype=np.int64)
    ds = rd.from_arrow(pa.table({"doc_id": ids})).repartition(5)
    out = training_order(ds, salt=7, num_buckets=16).to_pandas()
    assert sorted(out["shuffle_rank"]) == list(range(1000))
    h = hash61(ids, 7)
    exp = ids[np.lexsort((ids, h))]
    got = out.sort_values("shuffle_rank")["doc_id"].to_numpy()
    assert (got == exp).all()
    # different salt -> different permutation
    out2 = training_order(rd.from_arrow(pa.table({"doc_id": ids})),
                          salt=8, num_buckets=16).to_pandas()
    g2 = out2.sort_values("shuffle_rank")["doc_id"].to_numpy()
    assert not (g2 == got).all()
