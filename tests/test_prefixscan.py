"""budget_select: brute greedy replay across block layouts."""

import numpy as np
import pandas as pd


def test_budget_select_matches_brute(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.prefixscan import budget_select

    rng = np.random.default_rng(7)
    n = 5000
    df = pd.DataFrame({
        "ratio": rng.integers(0, 1000, n).astype(np.int64),
        "id": np.arange(n, dtype=np.int64),
        "cost": rng.integers(1, 50, n).astype(np.int64),
        "value": rng.integers(0, 10_000, n).astype(np.int64)})
    budget = 30_000

    g = df.sort_values(["ratio", "id"],
                       ascending=[False, True]).reset_index(drop=True)
    running = g["cost"].cumsum()
    sel = running <= budget
    exp = (n, int(sel.sum()), int(g["cost"][sel].sum()),
           int(g["value"][sel].sum()))

    for nparts in (1, 4, 13):
        ds = rd.from_pandas(df.sample(frac=1.0, random_state=nparts)) \
            .repartition(nparts)
        out = budget_select(
            ds, order_cols=["ratio", "id"], descending=[True, False],
            cost_col="cost", value_col="value",
            budget=budget).to_pandas()
        got = (int(out["n_total"][0]), int(out["n_selected"][0]),
               int(out["sel_cost"][0]), int(out["sel_value"][0]))
        assert got == exp, nparts


def test_elias_fano_roundtrip_and_sizes():
    import numpy as np

    from tsdownsample_ray.functions.eliasfano import (ef_decode, ef_encode,
                                                      ef_l_bits)

    rng = np.random.default_rng(11)
    for n, umax in ((1, 10), (5, 8), (100, 120), (64, 100000),
                    (1000, 1 << 30)):
        ids = np.sort(rng.choice(umax, size=n, replace=False)) \
            .astype(np.int64)
        u = int(ids[-1]) + 1
        ub, lb, l = ef_encode(ids, u)
        assert l == ef_l_bits(u, n)
        back = ef_decode(ub, lb, n, l)
        assert np.array_equal(back, ids)
        # exact size formula (what the SQL oracle replays)
        mx = int(ids[-1])
        assert len(ub) == (n + (mx >> l) + 1 + 7) // 8
        assert len(lb) == (n * l + 7) // 8
    # dense list: l = 0, unary plane only
    ids = np.arange(50, dtype=np.int64)
    ub, lb, l = ef_encode(ids, 50)
    assert l == 0 and lb == b""
    assert np.array_equal(ef_decode(ub, lb, 50, 0), ids)


def test_radix_select_matches_sorted(ray_session):
    import pandas as pd
    import ray.data as rd

    from tsdownsample_ray.stages.quantiles import radix_select

    rng = np.random.default_rng(13)
    vals = np.concatenate([
        rng.integers(-10**12, 10**12, 3000),
        np.array([np.iinfo(np.int64).min + 1, -1, 0, 1,
                  np.iinfo(np.int64).max - 1])]).astype(np.int64)
    ds = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(5)
    sv = np.sort(vals)
    for k in (1, 2, len(vals) // 2, len(vals) - 1, len(vals)):
        out = radix_select(ds, value_col="v", k=k).to_pandas()
        assert out["value"][0] == sv[k - 1], k
        assert out["n"][0] == len(vals)
    med = radix_select(ds, value_col="v", k="median").to_pandas()
    assert med["value"][0] == sv[(len(vals) + 1) // 2 - 1]
    import pytest

    with pytest.raises(ValueError):
        radix_select(ds, value_col="v", k=0).to_pandas()
