"""OLS slope (stages/correlate.py:ols_slope) and weighted median
(stages/quantiles.py:weighted_median): exact integer statistics vs
literal replays, across partitionings."""

import numpy as np
import pyarrow as pa
import pytest

from tsdownsample_ray.stages.correlate import ols_slope
from tsdownsample_ray.stages.quantiles import weighted_median

ray = pytest.importorskip("ray")
import ray.data as rd  # noqa: E402

W = 1_000 * 1_000_000  # 1000-second windows


def _slope_brute(rows, w_us):
    by_key = {}
    for sid, x, y in rows:
        b = (x // w_us) * w_us
        t = (x - b) // 1_000_000
        by_key.setdefault((sid, b), []).append((t, y))
    out = {}
    for (sid, b), pts in by_key.items():
        n = len(pts)
        st = sum(t for t, _ in pts)
        sy = sum(y for _, y in pts)
        sty = sum(t * y for t, y in pts)
        stt = sum(t * t for t, _ in pts)
        num, den = n * sty - st * sy, n * stt - st * st
        out[(sid, b)] = (n, num, den,
                         num / den if den > 0 else None)
    return out


@pytest.mark.parametrize("nparts", [1, 4])
def test_ols_slope_matches_replay(ray_session, nparts):
    rng = np.random.default_rng(23)
    rows = [(f"s{int(i) % 3}", int(x), int(y))
            for i, x, y in zip(rng.integers(0, 100, 300),
                               rng.integers(0, 5 * W, 300),
                               rng.integers(-500, 500, 300))]
    rows.append(("lonely", 7 * W + 5, 42))  # single-row bucket: den=0
    exp = _slope_brute(rows, W)

    t = pa.table({"series_id": [r[0] for r in rows],
                  "x": [r[1] for r in rows],
                  "y": [r[2] for r in rows]})
    got = ols_slope(rd.from_arrow(t).repartition(nparts), W,
                    fanin=2).to_pandas()
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        n, num, den, slope = exp[(r["series_id"], r["bucket"])]
        assert (r["n"], r["slope_num"], r["slope_den"]) == (n, num, den)
        if slope is None:
            assert r["slope"] is None or np.isnan(r["slope"])
        else:
            assert r["slope"] == pytest.approx(slope)


def _wmedian_brute(rows):
    by_k = {}
    for k, v, w in rows:
        if w > 0:
            by_k.setdefault(k, []).append((v, w))
    out = {}
    for k, vw in by_k.items():
        vw.sort()
        tw = sum(w for _, w in vw)
        cw = 0
        for v, w in vw:
            cw += w
            if 2 * cw >= tw:
                out[k] = (tw, v)
                break
    return out


@pytest.mark.parametrize("nparts", [1, 4])
def test_weighted_median_matches_replay(ray_session, nparts):
    rng = np.random.default_rng(29)
    rows = [(f"k{int(i) % 5}", int(v), int(w))
            for i, v, w in zip(rng.integers(0, 100, 400),
                               rng.integers(-100, 100, 400),
                               rng.integers(-2, 9, 400))]  # some w <= 0
    exp = _wmedian_brute(rows)

    t = pa.table({"series_id": [r[0] for r in rows],
                  "y": [r[1] for r in rows],
                  "w": [r[2] for r in rows]})
    got = weighted_median(rd.from_arrow(t).repartition(nparts),
                          num_partitions=3).to_pandas()
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        assert (r["total_w"], r["wmedian"]) == exp[r["series_id"]]


def test_weighted_median_hand_values(ray_session):
    # weights 1,1,2 over values 10,20,30: tw=4, crossing at v=20 (cw=2)
    t = pa.table({"series_id": ["a"] * 3, "y": [10, 20, 30],
                  "w": [1, 1, 2]})
    got = weighted_median(rd.from_arrow(t), num_partitions=1).to_pandas()
    assert (got.iloc[0]["total_w"], got.iloc[0]["wmedian"]) == (4, 20)
