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
