"""Indicator stages (stages/indicators.py): vectorized window math vs
literal per-series recursions, plus the int64 overflow guards."""

import numpy as np
import pyarrow as pa
import pytest

from tsdownsample_ray.stages.indicators import (bollinger_flags, hampel,
                                                max_drawdown, rsi_cutler)

ray = pytest.importorskip("ray")
import ray.data as rd  # noqa: E402


def _mk(rows, value_col="sum_y"):
    t = pa.table({"series_id": [r[0] for r in rows],
                  "bucket": [r[1] for r in rows],
                  value_col: [r[2] for r in rows]})
    return rd.from_arrow(t).repartition(3)


def _series_rows(rng, n_series=5, n=40, lo=-500, hi=500):
    rows = []
    for s in range(n_series):
        bks = np.sort(rng.choice(100_000, size=n, replace=False))
        ys = rng.integers(lo, hi, size=n)
        rows += [(f"s{s}", int(b), int(y)) for b, y in zip(bks, ys)]
    return rows


def test_hampel_matches_brute(ray_session):
    rng = np.random.default_rng(11)
    rows = _series_rows(rng)
    k, c = 5, 3
    exp = {}
    per = {}
    for sid, b, y in sorted(rows):
        per.setdefault(sid, []).append((b, y))
    for sid, seq in per.items():
        for i, (b, y) in enumerate(seq):
            w = [v for _, v in seq[max(0, i - k + 1):i + 1]]
            med = sorted(w)[(len(w) - 1) // 2]
            mad = sorted(abs(v - med) for v in w)[(len(w) - 1) // 2]
            exp[(sid, b)] = (y, med, mad, int(abs(y - med) > c * mad))
    got = hampel(_mk(rows), k, c=c, num_partitions=2).to_pandas()
    assert len(got) == len(rows)
    for _, r in got.iterrows():
        assert (r["v"], r["med"], r["mad"], r["is_outlier"]) == \
            exp[(r["series_id"], r["bucket"])], r["series_id"]


def test_bollinger_matches_brute(ray_session):
    rng = np.random.default_rng(7)
    rows = _series_rows(rng, lo=0, hi=10_000)
    k, nsig = 8, 2
    per = {}
    for sid, b, y in sorted(rows):
        per.setdefault(sid, []).append((b, y))
    exp = {}
    for sid, seq in per.items():
        for i, (b, y) in enumerate(seq):
            w = [v for _, v in seq[max(0, i - k + 1):i + 1]]
            n, S, Q = len(w), sum(w), sum(v * v for v in w)
            lhs = (n * y - S) ** 2
            rhs = nsig * nsig * (n * Q - S * S)
            exp[(sid, b)] = (int(n * y > S and lhs > rhs),
                             int(n * y < S and lhs > rhs))
    got = bollinger_flags(_mk(rows, "max_y"), k, nsig=nsig,
                          num_partitions=2).to_pandas()
    assert len(got) == len(rows)
    for _, r in got.iterrows():
        assert (r["breach_up"], r["breach_dn"]) == \
            exp[(r["series_id"], r["bucket"])]


def test_bollinger_overflow_guard(ray_session):
    rows = [("s0", 1, 1 << 28), ("s0", 2, 5)]
    with pytest.raises(Exception, match="2\\^27"):
        bollinger_flags(_mk(rows, "max_y"), 4, num_partitions=1).to_pandas()


def test_max_drawdown_matches_brute(ray_session):
    rng = np.random.default_rng(3)
    rows = _series_rows(rng, n_series=6, n=50)
    per = {}
    for sid, b, y in sorted(rows):
        per.setdefault(sid, []).append((b, y))
    exp = {}
    for sid, seq in per.items():
        runmax, best = None, None
        for b, y in seq:
            runmax = y if runmax is None else max(runmax, y)
            dd = runmax - y
            if best is None or dd > best[0]:
                best = (dd, b, runmax)
        exp[sid] = best
    got = max_drawdown(_mk(rows), num_partitions=2).to_pandas()
    assert len(got) == len(per)
    for _, r in got.iterrows():
        assert (r["max_dd"], r["at_bucket"], r["peak_v"]) == \
            exp[r["series_id"]]


def test_rsi_matches_brute(ray_session):
    rng = np.random.default_rng(5)
    rows = _series_rows(rng, n_series=4, n=30)
    period = 6
    per = {}
    for sid, b, y in sorted(rows):
        per.setdefault(sid, []).append((b, y))
    exp = {}
    n_exp = 0
    for sid, seq in per.items():
        diffs = [(seq[i][0], seq[i][1], seq[i][1] - seq[i - 1][1])
                 for i in range(1, len(seq))]
        for i, (b, y, _) in enumerate(diffs):
            w = diffs[max(0, i - period + 1):i + 1]
            g = sum(max(d, 0) for _, _, d in w)
            l = sum(max(-d, 0) for _, _, d in w)
            exp[(sid, b)] = (y, len(w), g, l,
                             int(g + l > 0 and 100 * g > 70 * (g + l)),
                             int(g + l > 0 and 100 * g < 30 * (g + l)))
            n_exp += 1
    got = rsi_cutler(_mk(rows), period, num_partitions=2).to_pandas()
    assert len(got) == n_exp  # first row of each series has no diff
    for _, r in got.iterrows():
        assert (r["v"], r["nd"], r["gain_sum"], r["loss_sum"],
                r["overbought"], r["oversold"]) == \
            exp[(r["series_id"], r["bucket"])]


def test_validation():
    with pytest.raises(ValueError):
        hampel(None, 0)
    with pytest.raises(ValueError):
        bollinger_flags(None, 3, nsig=9)
    with pytest.raises(ValueError):
        rsi_cutler(None, 0)
