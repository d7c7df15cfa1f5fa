"""Salting and skew: salted rollup must be bit-identical to unsalted; the
hot-domain corpus exercises the skewed-key path end-to-end."""

import numpy as np
import pandas as pd
import pytest


def _cmp(a: pd.DataFrame, b: pd.DataFrame):
    key = ["series_id", "bucket"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)[a.columns]
    pd.testing.assert_frame_equal(a, b)


def test_salted_rollup_equals_unsalted(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.rollup import rollup

    rng = np.random.default_rng(17)
    n = 50_000
    df = pd.DataFrame({
        # one pathologically hot series (90% of rows) + a long tail
        "series_id": np.where(rng.random(n) < 0.9, "hot",
                              rng.integers(0, 50, n).astype(str)),
        "x": rng.integers(0, 10**9, n) * 1000,
        "y": rng.integers(0, 1000, n),
    })
    ds = rd.from_pandas(df).repartition(9)
    plain = rollup(ds, 3_600_000_000).to_pandas()
    salted = rollup(ds, 3_600_000_000, salt=4).to_pandas()
    _cmp(plain, salted)
    # shuffle-mode combine (the huge-key-space path) must agree with tree
    shuffled = rollup(ds, 3_600_000_000, combine="shuffle").to_pandas()
    _cmp(plain, shuffled)
    shuffled_salted = rollup(ds, 3_600_000_000, salt=4,
                             combine="shuffle").to_pandas()
    _cmp(plain, shuffled_salted)


def test_salt_must_be_power_of_two(ray_session):
    import pyarrow as pa

    from tsdownsample_ray.stages.rollup import partial_rollup_batch

    t = pa.table({"series_id": ["a"], "x": [1], "y": [2]})
    with pytest.raises(ValueError):
        partial_rollup_batch(t, 1000, salt=3)


def test_hot_domain_corpus_rollup(ray_session):
    """hot_domain_factor inflates src0's snapshots; the rollup must still
    match a driver-side pandas recomputation exactly."""
    from tsdownsample_ray.sources.corpus import read_pages
    from tsdownsample_ray.stages.rollup import rollup
    from tsdownsample_ray.stages.series import derive_series

    sf = "/root/testdata/sf0.001"
    pages = read_pages(sf, snapshots=2, hot_domain_factor=5,
                       columns=["url", "warc_ts", "text"])
    series = derive_series(pages)
    got = rollup(series, 3_600_000_000, salt=2).to_pandas()

    pdf = series.to_pandas()
    pdf["bucket"] = pdf["x"] // 3_600_000_000 * 3_600_000_000
    exp = (pdf.groupby(["series_id", "bucket"])["y"]
           .agg(min_y="min", max_y="max", sum_y="sum", n="count")
           .reset_index())
    _cmp(got, exp)
    # and src0 really is hot (5x the pages of any other domain)
    per_dom = exp.groupby("series_id")["n"].sum()
    assert per_dom["src0.example.com"] == 5 * per_dom["src1.example.com"]


def test_combine_auto_mode_equivalence(ray_session):
    """combine='auto' with a huge est_keys (-> hashpart) equals the tree
    path row for row."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from tsdownsample_ray.stages.rollup import rollup

    rng = np.random.default_rng(4)
    df = pd.DataFrame({
        "series_id": rng.choice(["a", "b", "c"], 3000),
        "x": rng.integers(0, 10_000_000, 3000),
        "y": rng.integers(0, 100, 3000),
    })
    ds = rd.from_pandas(df).repartition(5)
    cols = ["series_id", "bucket", "min_y", "max_y", "sum_y", "n"]
    tree = (rollup(ds, 1_000_000, combine="auto").to_pandas()[cols]
            .sort_values(cols[:2]).reset_index(drop=True))
    shuf = (rollup(ds, 1_000_000, combine="auto", est_keys=10_000_000)
            .to_pandas()[cols].sort_values(cols[:2]).reset_index(drop=True))
    pd.testing.assert_frame_equal(tree, shuf, check_dtype=False)


def test_pick_combine_thresholds():
    """combine='auto' resolution: tree below TREE_MAX_KEYS, hashpart (and
    a shuffle desalt) above; salt>1 always forces hashpart."""
    from tsdownsample_ray.stages.rollup import TREE_MAX_KEYS, pick_combine

    assert pick_combine("auto", 1, None) == ("tree", "tree")
    assert pick_combine("auto", 1, TREE_MAX_KEYS) == ("tree", "tree")
    assert pick_combine("auto", 1, TREE_MAX_KEYS + 1) == (
        "hashpart", "shuffle")
    assert pick_combine("auto", 4, 100) == ("hashpart", "tree")
    assert pick_combine("tree", 4, None) == ("hashpart", "tree")
    assert pick_combine("hashpart", 1, None) == ("hashpart", "tree")


def test_flagship_est_keys_selects_hashpart(tmp_path):
    """The flagship/retention tier-0 rollup passes a metadata-only
    est_keys upper bound (pages = docs x snapshots); above TREE_MAX_KEYS
    the auto combine must select the hash-partitioned merge -- no
    single-block funnel at 100x corpus scale."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tsdownsample_ray.sources.corpus import estimate_pages
    from tsdownsample_ray.stages.rollup import TREE_MAX_KEYS, pick_combine

    n_docs = 2_000_000  # footer metadata only -- writing ids is cheap
    pq.write_table(
        pa.table({"doc_id": pa.array(range(n_docs), pa.int64())}),
        tmp_path / "documents.parquet")
    est = estimate_pages(str(tmp_path), snapshots=3)
    assert est == 3 * n_docs > TREE_MAX_KEYS
    assert pick_combine("auto", 1, est) == ("hashpart", "shuffle")
    # and the sf0.001 fixture stays on the fast tree path
    small = estimate_pages("/root/testdata/sf0.001", snapshots=3)
    assert small < TREE_MAX_KEYS
    assert pick_combine("auto", 1, small) == ("tree", "tree")
