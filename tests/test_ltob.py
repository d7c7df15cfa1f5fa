"""LTOB kernel: brute replay, identity shortcut, tie semantics."""

import numpy as np


def _brute_ltob(x, y, n_out):
    n = len(y)
    if n_out >= n:
        return list(range(n))
    areas = {}
    for i in range(1, n - 1):
        areas[i] = abs((x[i - 1] - x[i + 1]) * (y[i] - y[i + 1])
                       - (x[i] - x[i + 1]) * (y[i - 1] - y[i + 1]))
    nb = n_out - 2
    sel = [0]
    for b in range(nb):
        cand = [i for i in range(1, n - 1)
                if (i - 1) * nb // (n - 2) == b]
        best = max(cand, key=lambda i: (areas[i], -i))
        sel.append(best)
    sel.append(n - 1)
    return sel


def test_ltob_matches_brute_and_edges():
    from tsdownsample_ray.kernels.ltob import ltob

    rng = np.random.default_rng(10)
    for n, n_out in ((30, 5), (100, 20), (997, 50), (50, 3)):
        x = np.cumsum(rng.integers(1, 100, n)).astype(np.int64)
        y = rng.integers(-1000, 1000, n).astype(np.int64)
        got = ltob(x, y, n_out).tolist()
        assert got == _brute_ltob(x.tolist(), y.tolist(), n_out)
        assert got[0] == 0 and got[-1] == n - 1
        assert len(got) == n_out
    # identity shortcut
    assert ltob(None, np.arange(5), 10).tolist() == list(range(5))
    # ties -> smallest index: flat series, every area 0
    flat = np.zeros(40, dtype=np.int64)
    sel = ltob(None, flat, 6).tolist()
    assert sel == _brute_ltob(list(range(40)), [0] * 40, 6)
    import pytest

    with pytest.raises(ValueError):
        ltob(None, np.arange(10), 2)
