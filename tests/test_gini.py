"""Gini / pairwise dispersion (stages/quantiles.py:gini_dispersion):
the sorted closed form vs the literal quadratic sum, across
partitionings; ties, negative values, singleton keys."""

import numpy as np
import pyarrow as pa
import pytest

from tsdownsample_ray.stages.quantiles import gini_dispersion

ray = pytest.importorskip("ray")
import ray.data as rd  # noqa: E402


def _brute(rows):
    by_k = {}
    for k, v in rows:
        by_k.setdefault(k, []).append(v)
    out = {}
    for k, vs in by_k.items():
        total = sum(abs(a - b) for i, a in enumerate(vs)
                    for b in vs[i + 1:])
        sy = sum(vs)
        gini = (total / (len(vs) * sy)
                if sy > 0 and len(vs) >= 2 else None)
        out[k] = (len(vs), sy, total, gini)
    return out


@pytest.mark.parametrize("nparts", [1, 4])
def test_gini_matches_quadratic(ray_session, nparts):
    rng = np.random.default_rng(37)
    rows = [(f"k{int(i) % 4}", int(v))
            for i, v in zip(rng.integers(0, 100, 200),
                            rng.integers(-50, 500, 200))]  # some negatives
    rows.append(("single", 5))
    exp = _brute(rows)

    t = pa.table({"series_id": [r[0] for r in rows],
                  "y": [r[1] for r in rows]})
    got = gini_dispersion(rd.from_arrow(t).repartition(nparts),
                          num_partitions=3).to_pandas()
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        n, sy, total, gini = exp[r["series_id"]]
        assert (r["n"], r["sum_y"], r["pairdiff_total"]) == (n, sy, total)
        if gini is None:
            assert r["gini"] is None or np.isnan(r["gini"])
        else:
            assert r["gini"] == pytest.approx(gini)


def test_gini_hand_values(ray_session):
    # values 1,1,4: pairs |1-1|+|1-4|+|1-4| = 6; gini = 6/(3*6) = 1/3
    t = pa.table({"series_id": ["a"] * 3, "y": [1, 1, 4]})
    got = gini_dispersion(rd.from_arrow(t), num_partitions=1).to_pandas()
    r = got.iloc[0]
    assert (r["n"], r["sum_y"], r["pairdiff_total"]) == (3, 6, 6)
    assert r["gini"] == pytest.approx(1 / 3)
