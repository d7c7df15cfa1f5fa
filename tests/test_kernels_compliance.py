"""Conformance of the NumPy kernels to the reference's pinned behavior.

Expected index vectors are the hand-computed values from the reference's own
Rust unit tests (facts about the algorithms, cited per case) — see
`/root/reference/downsample_rs/src/{minmax,m4,lttb,minmaxlttb}.rs` test
modules.
"""

import numpy as np
import pytest

from tsdownsample_ray.kernels import (
    everynth,
    lttb,
    m4,
    minmax,
    minmaxlttb,
    nanm4,
    nanminmax,
    nanminmaxlttb,
)

RAMP100 = np.arange(100, dtype=np.float32)
X100 = np.arange(100, dtype=np.int32)


# --- hand values: minmax.rs:294-372 ---------------------------------------
def test_minmax_ramp_no_x():
    assert minmax(None, RAMP100, 10).tolist() == [0, 19, 20, 39, 40, 59, 60, 79, 80, 99]


def test_minmax_ramp_with_x():
    assert minmax(X100, RAMP100, 10).tolist() == [0, 19, 20, 39, 40, 59, 60, 79, 80, 99]


# --- gap hand values: minmax.rs:376-416 ------------------------------------
def _gap_x():
    return np.array([i + 50 if i > 50 else i for i in range(100)], dtype=np.int32)


def test_minmax_gap_full():
    out = nanminmax(_gap_x(), RAMP100, 10)
    assert out.tolist() == [0, 29, 30, 50, 51, 69, 70, 99]  # one empty bin


def test_minmax_gap_singleton():
    x = _gap_x()
    x = np.where(x > 101, x + 50, x)
    out = nanminmax(x, RAMP100, 10)
    assert out.tolist() == [0, 39, 40, 50, 51, 52, 59, 60, 99]  # 1-point bin


# --- hand values: m4.rs:310-436 --------------------------------------------
def test_m4_ramp_no_x():
    assert m4(None, RAMP100, 12).tolist() == [0, 0, 33, 33, 34, 34, 66, 66, 67, 67, 99, 99]


def test_m4_ramp_with_x():
    assert m4(X100, RAMP100, 12).tolist() == [0, 0, 33, 33, 34, 34, 66, 66, 67, 67, 99, 99]


def test_m4_gap_full():
    out = m4(_gap_x(), RAMP100, 20)
    assert out.tolist() == [0, 0, 29, 29, 30, 30, 50, 50, 51, 51, 69, 69, 70, 70, 99, 99]


def test_m4_gap_singleton():
    x = _gap_x()
    x = np.where(x > 101, x + 50, x)
    out = m4(x, RAMP100, 20)
    assert out.tolist() == [0, 0, 39, 39, 40, 40, 50, 50, 51, 52, 52, 59, 59, 60, 60, 99, 99]


# --- hand values: lttb.rs:190-203, minmaxlttb.rs:231-258 --------------------
def test_lttb_ramp10():
    y = np.arange(10, dtype=np.float64)
    assert lttb(None, y, 4).tolist() == [0, 1, 5, 9]
    assert lttb(np.arange(10, dtype=np.int64), y, 4).tolist() == [0, 1, 5, 9]


def test_minmaxlttb_ramp10():
    y = np.arange(10, dtype=np.float64)
    assert minmaxlttb(None, y, 4, 2).tolist() == [0, 1, 5, 9]
    assert minmaxlttb(np.arange(10), y, 4, 2).tolist() == [0, 1, 5, 9]


# --- with-x == no-x on a uniform grid (minmaxlttb.rs:262-278,
#     test_tsdownsample.py:148-155) -----------------------------------------
@pytest.mark.parametrize("n,n_out", [(2001, 100), (1001, 26)])
def test_minmaxlttb_with_x_equals_without(n, n_out):
    y = np.arange(n, dtype=np.float32)
    x = np.arange(n, dtype=np.int32)
    assert np.array_equal(minmaxlttb(x, y, n_out, 4), minmaxlttb(None, y, n_out, 4))


@pytest.mark.parametrize("n_out", [98, 100, 102, 196, 200, 204, 252])
@pytest.mark.parametrize(
    "fn", [minmax, nanminmax, lttb, minmaxlttb, nanminmaxlttb]
)
def test_with_x_equals_without_random(fn, n_out):
    rng = np.random.default_rng(7)
    y = rng.standard_normal(20_003)
    x = np.arange(20_003)
    assert np.array_equal(fn(x, y, n_out), fn(None, y, n_out))


@pytest.mark.parametrize("n_out", [96, 100, 104, 196, 200, 204, 252])
@pytest.mark.parametrize("fn", [m4, nanm4])
def test_m4_with_x_equals_without_random(fn, n_out):
    rng = np.random.default_rng(7)
    y = rng.standard_normal(20_003)
    x = np.arange(20_003)
    assert np.array_equal(fn(x, y, n_out), fn(None, y, n_out))


# --- everynth formula (downsamplers.py:142-158) -----------------------------
@pytest.mark.parametrize("n,n_out", [(10, 4), (100, 7), (1000, 33), (5, 10)])
def test_everynth_formula(n, n_out):
    y = np.arange(n)
    step = max(1, n / n_out)
    expected = np.arange(0, n - 0.1, step).astype(np.uint64)
    assert np.array_equal(everynth(None, y, n_out), expected)


# --- identity short-circuit (minmax.rs:105-107 etc.) ------------------------
@pytest.mark.parametrize("fn", [minmax, nanminmax, m4, nanm4, lttb, minmaxlttb])
def test_identity_when_n_out_ge_len(fn):
    y = np.arange(50, dtype=np.float64)
    assert np.array_equal(fn(None, y, 100), np.arange(50))


def test_lttb_fidelity_python_replay(ray_session):
    """Fidelity audit equals a per-point python interpolation replay."""
    from tsdownsample_ray.pipelines.queries import q_lttb_fidelity_events

    import duckdb
    import numpy as np

    sf = "/root/testdata/sf0.001"
    out = (q_lttb_fidelity_events(sf).to_pandas()
           .sort_values("event_type").reset_index(drop=True))
    con = duckdb.connect()
    rows = con.sql(f"""
        SELECT event_type, round(value * 100) AS cy
        FROM '{sf}/events.parquet' ORDER BY event_type, ts, event_id
    """).df()
    from tsdownsample_ray.kernels import lttb as lttb_kernel
    for _, r in out.iterrows():
        y = rows[rows["event_type"] == r["event_type"]]["cy"].to_numpy()
        idx = np.sort(np.asarray(
            lttb_kernel(None, y.astype(np.float64), 50), dtype=np.int64))
        assert r["n_pts"] == len(y) and r["n_sel"] == len(idx)
        sel = set(idx.tolist())
        tot = mx = 0
        for p in range(len(y)):
            if p in sel:
                continue
            j = int(np.searchsorted(idx, p, side="right") - 1)
            p0, p1 = int(idx[j]), int(idx[j + 1])
            num = int(y[p0]) * (p1 - p) + int(y[p1]) * (p - p0)
            yhat = (num * 1_000_000) // (p1 - p0)
            err = abs(int(y[p]) * 1_000_000 - yhat)
            tot += err
            mx = max(mx, err)
        assert r["sum_err_e6"] == tot and r["max_err_e6"] == mx


def test_lttb_bucket_x_midpoint_matches_mean_on_equidistant():
    """On equidistant x the Rust binary's midpoint and LTTB_py's mean
    coincide (the regime the reference compliance suite certifies)."""
    import numpy as np

    from tsdownsample_ray.kernels.lttb import lttb

    rng = np.random.default_rng(11)
    y = rng.normal(0, 1, 10_000)
    x = np.arange(10_000, dtype=np.int64)
    a = lttb(x, y, 97)
    b = lttb(x, y, 97, bucket_x="midpoint")
    assert np.array_equal(a, b)
    # no-x defaults to arange -> also identical
    assert np.array_equal(lttb(None, y, 97, bucket_x="midpoint"),
                          lttb(None, y, 97))


def test_lttb_bucket_x_midpoint_diverges_on_gapped_x():
    """On gapped x the two bucket-x conventions can pick different points
    (lttb.rs:46-50 vs LTTB_py) -- construct a bucket where the gap pulls
    mean and midpoint apart and assert the selections differ."""
    import numpy as np

    from tsdownsample_ray.kernels.lttb import lttb

    x = np.array([21, 755, 1283, 69092, 69224, 69261, 69696, 69703,
                  69789, 80079, 80563, 154506, 215704, 215967, 215974,
                  232866, 233765, 282600, 282993, 283000, 284256, 285296,
                  342532], dtype=np.int64)
    y = np.array([0, 30, 41, -21, -12, 31, -27, -16, 40, -16, 28, -38,
                  -17, 30, 18, 28, -3, -7, 32, 35, 9, 4, -19],
                 dtype=np.float64)
    a = lttb(x, y, 6)
    b = lttb(x, y, 6, bucket_x="midpoint")
    assert a.tolist() == [0, 2, 6, 13, 19, 22]
    assert b.tolist() == [0, 2, 6, 11, 19, 22]
    # both remain valid monotone selections with pinned endpoints
    for s in (a, b):
        assert s[0] == 0 and s[-1] == len(x) - 1
        assert np.all(np.diff(s.astype(np.int64)) > 0)


def test_lttb_downsampler_accepts_bucket_x():
    import numpy as np

    from tsdownsample_ray import LTTBDownsampler

    y = np.sin(np.arange(3000) / 10.0)
    idx = LTTBDownsampler().downsample(y, n_out=50, bucket_x="midpoint")
    assert len(idx) == 50
    try:
        LTTBDownsampler().downsample(y, n_out=50, bucket_x="nope")
        raise AssertionError("bad bucket_x accepted")
    except ValueError:
        pass
