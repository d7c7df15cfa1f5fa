"""NaN edge positions and remaining FIXTURES.md F2 cases."""

import numpy as np
import pytest

from tsdownsample_ray.kernels import (
    lttb,
    m4,
    minmax,
    minmaxlttb,
    nanm4,
    nanminmax,
    nanminmaxlttb,
)


def _nan_edges():
    rng = np.random.default_rng(8)
    y = rng.standard_normal(10_000)
    y[0] = np.nan
    y[9_960] = np.nan
    return y


@pytest.mark.parametrize("fn,n_out", [
    (minmax, 100), (nanminmax, 100), (m4, 100), (nanm4, 100),
    (lttb, 100), (minmaxlttb, 100), (nanminmaxlttb, 100),
])
def test_nan_at_edges_runs(fn, n_out):
    """NaN in the first and near-last position (test_tsdownsample.py:62-67):
    every kernel must run and keep its length/invariant guarantees."""
    y = _nan_edges()
    idx = fn(None, y, n_out)
    assert len(idx) > 0
    assert (np.diff(idx.astype(np.int64)) >= 0).all()


def test_worst_alternating():
    """Alternating ever-lower min / ever-higher max
    (dev_utils/src/utils.rs:18-34): MinMax must select every point when
    n_out/2 bins each hold one min and one max pair."""
    n = 1000
    y = np.empty(n)
    y[0::2] = -np.arange(n // 2)   # ever-lower minima
    y[1::2] = np.arange(n // 2)    # ever-higher maxima
    idx = minmax(None, y, 200)
    sel = y[idx.astype(np.intp)]
    # each bin contributes its extreme pair: strictly alternating signs
    assert len(idx) == 200
    assert (sel[0::2] <= 0).all() and (sel[1::2] >= 0).all()


@pytest.mark.parametrize("n", [10_000, 10_032, 20_321, 23_489])
@pytest.mark.parametrize("n_out", [100, 200, 252])
def test_compliance_grid_sorted_and_bounded(n, n_out):
    """The reference compliance grid sizes
    (test_algos_python_compliance.py:31-32): structural postconditions for
    every kernel at every grid point."""
    rng = np.random.default_rng(n + n_out)
    y = rng.standard_normal(n)
    for fn in (minmax, nanminmax, lttb, minmaxlttb):
        idx = fn(None, y, n_out).astype(np.int64)
        assert idx.min() >= 0 and idx.max() < n
        assert (np.diff(idx) >= 0).all()
        assert len(idx) <= n_out
    for fn in (m4, nanm4):
        idx = fn(None, y, 252).astype(np.int64)
        assert idx.min() >= 0 and idx.max() < n
        assert (np.diff(idx) >= 0).all()
