"""Benford leading-digit audit (stages/integrity.py:benford_audit):
mergeable digit counts vs a Python replay, across partitionings;
zero/negative/null filtering, integer permille."""

import numpy as np
import pyarrow as pa
import pytest

from tsdownsample_ray.stages.integrity import benford_audit

ray = pytest.importorskip("ray")
import ray.data as rd  # noqa: E402


def _brute(rows):
    by_k = {}
    for k, v in rows:
        if v is not None and v > 0:
            d = int(str(v)[0])
            by_k.setdefault(k, {}).setdefault(d, 0)
            by_k[k][d] += 1
    out = {}
    for k, dd in by_k.items():
        n = sum(dd.values())
        for d, c in dd.items():
            out[(k, d)] = (n, c, 1000 * c // n)
    return out


@pytest.mark.parametrize("nparts", [1, 4])
def test_benford_matches_replay(ray_session, nparts):
    rng = np.random.default_rng(41)
    rows = [(f"k{int(i) % 3}", int(v))
            for i, v in zip(rng.integers(0, 100, 300),
                            rng.integers(-50, 99999, 300))]
    rows += [("k0", 0), ("k0", None)]  # no leading digit
    exp = _brute(rows)

    t = pa.table({"k": [r[0] for r in rows],
                  "v": pa.array([r[1] for r in rows], pa.int64())})
    got = benford_audit(rd.from_arrow(t).repartition(nparts),
                        key_col="k", val_col="v", fanin=2).to_pandas()
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        assert (r["n_values"], r["digit_count"],
                r["permille"]) == exp[(r["series_id"], r["digit"])]


def test_benford_hand_values(ray_session):
    t = pa.table({"k": ["a"] * 4, "v": [123, 19, 999, 2]})
    got = benford_audit(rd.from_arrow(t), key_col="k", val_col="v",
                        fanin=1).to_pandas().set_index("digit")
    assert got.loc[1]["digit_count"] == 2
    assert got.loc[1]["permille"] == 500
    assert got.loc[2]["digit_count"] == 1
    assert got.loc[9]["digit_count"] == 1
