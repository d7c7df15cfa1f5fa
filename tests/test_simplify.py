"""RDP simplification: exact-integer keep mask vs a recursive reference,
tolerance-band property, guard paths, and the Dataset stage."""

import numpy as np
import pytest

from tsdownsample_ray.stages.simplify import rdp_keep_mask


def _rdp_reference(x, y, eps):
    """Textbook recursive RDP, Python ints (exact)."""
    n = len(x)
    keep = set([0, n - 1])

    def rec(lo, hi):
        if hi - lo < 2:
            return
        dx, dy = int(x[hi] - x[lo]), int(y[hi] - y[lo])
        best, best_c2 = None, -1
        for i in range(lo + 1, hi):
            c = dx * int(y[i] - y[lo]) - dy * int(x[i] - x[lo])
            if c * c > best_c2:
                best, best_c2 = i, c * c
        if best_c2 > eps * eps * (dx * dx + dy * dy):
            keep.add(best)
            rec(lo, best)
            rec(best, hi)

    rec(0, n - 1)
    return np.array([i in keep for i in range(n)])


def test_rdp_mask_matches_reference():
    rng = np.random.default_rng(3)
    for _ in range(200):
        n = int(rng.integers(1, 120))
        x = np.cumsum(rng.integers(1, 4, n)).astype(np.int64)
        y = np.cumsum(rng.integers(-50, 51, n)).astype(np.int64)
        eps = int(rng.integers(0, 60))
        got = rdp_keep_mask(x, y, eps)
        want = _rdp_reference(x, y, eps)
        assert np.array_equal(got, want)


def test_rdp_tolerance_band():
    """Every dropped point lies within eps of the kept polyline segment
    spanning it (the RDP guarantee)."""
    rng = np.random.default_rng(5)
    x = np.arange(500, dtype=np.int64)
    y = np.cumsum(rng.integers(-30, 31, 500)).astype(np.int64)
    eps = 40
    keep = rdp_keep_mask(x, y, eps)
    kept = np.flatnonzero(keep)
    for a, b in zip(kept[:-1], kept[1:]):
        dx, dy = int(x[b] - x[a]), int(y[b] - y[a])
        for i in range(a + 1, b):
            c = dx * int(y[i] - y[a]) - dy * int(x[i] - x[a])
            assert c * c <= eps * eps * (dx * dx + dy * dy)


def test_rdp_edges_and_guards():
    x = np.array([0, 1, 2], dtype=np.int64)
    y = np.array([0, 100, 0], dtype=np.int64)
    assert rdp_keep_mask(x[:0], y[:0], 1).tolist() == []
    assert rdp_keep_mask(x[:1], y[:1], 1).tolist() == [True]
    assert rdp_keep_mask(x[:2], y[:2], 1).tolist() == [True, True]
    # huge eps keeps only endpoints; eps=0 keeps the spike
    assert rdp_keep_mask(x, y, 10**6).tolist() == [True, False, True]
    assert rdp_keep_mask(x, y, 0).tolist() == [True, True, True]
    with pytest.raises(ValueError):
        rdp_keep_mask(np.array([0, 0, 1], np.int64), y, 1)
    with pytest.raises(OverflowError):
        rdp_keep_mask(np.array([0, 1, 10**6], np.int64),
                      np.array([0, 10**7, 0], np.int64), 1)


def test_rdp_query_nontrivial(ray_session):
    from tsdownsample_ray.pipelines.queries import q_rdp_simplify_15m

    out = q_rdp_simplify_15m("/root/testdata/sf0.001").to_pandas()
    per = out.groupby("series_id").size()
    assert len(per) == 5
    # non-trivial: strictly fewer than all tier rows, more than endpoints
    assert (per > 2).all()


def _vw_reference(x, y, T):
    """Naive VW: recompute all areas each round, remove global (area, x)
    min while < T. Python ints, exact."""
    pts = list(range(len(x)))
    while len(pts) > 2:
        best, best_a = None, None
        for j in range(1, len(pts) - 1):
            a, i, b = pts[j - 1], pts[j], pts[j + 1]
            ar = abs(int(x[b] - x[a]) * int(y[i] - y[a])
                     - int(y[b] - y[a]) * int(x[i] - x[a]))
            if best_a is None or ar < best_a:
                best, best_a = j, ar
        if best_a >= T:
            break
        pts.pop(best)
    keep = np.zeros(len(x), dtype=bool)
    keep[pts] = True
    return keep


def test_vw_mask_matches_reference():
    from tsdownsample_ray.stages.simplify import vw_keep_mask

    rng = np.random.default_rng(11)
    for _ in range(150):
        n = int(rng.integers(1, 90))
        x = np.cumsum(rng.integers(1, 4, n)).astype(np.int64)
        y = np.cumsum(rng.integers(-40, 41, n)).astype(np.int64)
        T = int(rng.integers(1, 250))
        got = vw_keep_mask(x, y, T)
        want = _vw_reference(x, y, T)
        assert np.array_equal(got, want), (n, T)


def test_vw_query_nontrivial(ray_session):
    from tsdownsample_ray.pipelines.queries import q_vw_simplify_15m

    out = q_vw_simplify_15m("/root/testdata/sf0.001").to_pandas()
    per = out.groupby("series_id").size()
    assert len(per) == 5 and (per > 2).all()
