"""HLL sketch: accuracy, mergeability, and the distributed distinct-count."""

import numpy as np
import pyarrow as pa

from tsdownsample_ray.stages.sketches import (
    _hash64,
    _registers,
    hll_estimate,
    hll_merge,
)


def test_hll_accuracy():
    vals = [f"item-{i}" for i in range(10_000)]
    est = hll_estimate(_registers(_hash64(vals), 12).tobytes())
    assert abs(est - 10_000) / 10_000 < 0.05


def test_hll_small_range():
    vals = [f"x{i}" for i in range(50)]
    est = hll_estimate(_registers(_hash64(vals), 12).tobytes())
    assert abs(est - 50) < 5


def test_hll_merge_equals_union():
    a = [f"a{i}" for i in range(5_000)]
    b = [f"b{i}" for i in range(5_000)] + a[:1_000]  # overlap
    sa = _registers(_hash64(a), 12).tobytes()
    sb = _registers(_hash64(b), 12).tobytes()
    merged = hll_merge([sa, sb])
    direct = _registers(_hash64(list(set(a) | set(b))), 12).tobytes()
    assert merged == direct  # register-max merge == sketch of the union


def test_distinct_approx_distributed(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.sketches import distinct_approx

    rng = np.random.default_rng(4)
    n = 30_000
    keys = rng.integers(0, 3, n)
    t = pa.table({
        "k": pa.array([f"k{v}" for v in keys]),
        "v": pa.array([f"v{v}" for v in rng.integers(0, 2_000, n) + keys * 10_000]),
    })
    out = rd.from_arrow(t).repartition(8)
    got = distinct_approx(out, key_col="k", value_col="v").to_pandas()
    import pandas as pd

    df = t.to_pandas()
    exact = df.groupby("k")["v"].nunique()
    for r in got.itertuples():
        assert abs(r.distinct_est - exact[r.k]) / exact[r.k] < 0.06, (
            r.k, r.distinct_est, exact[r.k])


def test_cms_never_undercounts_and_exact_when_wide(ray_session):
    """CMS one-sided error: est >= exact always; with width >> vocab and
    no collisions the estimate is exact."""
    import ray.data as rd

    from tsdownsample_ray.stages.sketches import cms_token_counts

    t = pa.table({"doc_id": list(range(6)),
                  "text": ["a b c", "a a d", "b e", "f", "a c", "g h a"]})
    out = cms_token_counts(rd.from_arrow(t).repartition(3),
                           depth=4, width=4096,
                           num_partitions=2).to_pandas()
    got = dict(zip(out["token"], out["exact_n"]))
    assert got == {"a": 5, "b": 2, "c": 2, "d": 1, "e": 1, "f": 1,
                   "g": 1, "h": 1}
    assert (out["overcount"] == 0).all()
    assert (out["est_n"] == out["exact_n"]).all()

    tight = cms_token_counts(rd.from_arrow(t).repartition(2),
                             depth=2, width=2,
                             num_partitions=1).to_pandas()
    assert (tight["est_n"] >= tight["exact_n"]).all()
    # total mass per sketch row is conserved: min estimate still bounded
    assert tight["est_n"].max() <= int(tight["exact_n"].sum())


def test_ams_f2_counters_and_estimate(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from tsdownsample_ray.stages.sketches import ams_coeffs, ams_f2

    P = (1 << 31) - 1
    rng = np.random.default_rng(2)
    keys = rng.zipf(1.5, 20000) % 500  # skewed stream
    ds = rd.from_pandas(pd.DataFrame({"k": keys})).repartition(6)
    out = ams_f2(ds, key_col="k", r=30, group=6).to_pandas() \
        .sort_values("j").reset_index(drop=True)

    # brute counters
    for j, (a3, a2, a1, a0) in enumerate(ams_coeffs(30)):
        x = keys.astype(np.int64) % P
        h = (a3 * x + a2) % P
        h = (h * x + a1) % P
        h = (h * x + a0) % P
        c = int(len(x) - 2 * (h & 1).sum())
        assert out.loc[j, "c"] == c
        assert out.loc[j, "c2"] == c * c
        assert out.loc[j, "grp"] == j // 6

    # median-of-means estimate lands within 3x of true F2 (30 counters)
    f2 = int((np.bincount(keys).astype(np.int64) ** 2).sum())
    means = out.groupby("grp")["c2"].mean().to_numpy()
    est = float(np.median(means))
    assert f2 / 3 < est < f2 * 3
