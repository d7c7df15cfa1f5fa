"""Sliding and session window unit tests (hand-computed expectations)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def test_sliding_membership(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.windows import sliding_rollup

    # one event at t=25 with window=20, slide=10 -> windows starting 10, 20
    t = pa.table({"series_id": ["a"], "x": [25], "y": [7]})
    out = sliding_rollup(rd.from_arrow(t), 20, 10).to_pandas()
    assert sorted(out["bucket"]) == [10, 20]
    assert (out["min_y"] == 7).all() and (out["n"] == 1).all()


def test_sliding_aggregates(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.windows import sliding_rollup

    # events at 5 and 15: window 20 slide 10 -> starts {0,-10? no: floor/slide}
    t = pa.table({"series_id": ["a", "a"], "x": [5, 15], "y": [1, 3]})
    out = sliding_rollup(rd.from_arrow(t), 20, 10).to_pandas()
    got = {r.bucket: (r.min_y, r.max_y, r.n) for r in out.itertuples()}
    assert got[0] == (1, 3, 2)     # both events in [0,20)
    assert got[10] == (3, 3, 1)    # only t=15 in [10,30)
    assert got[-10] == (1, 1, 1)   # only t=5 in [-10,10)


def test_sliding_rejects_bad_slide(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.windows import sliding_rollup

    t = pa.table({"series_id": ["a"], "x": [1], "y": [1]})
    with pytest.raises(ValueError):
        sliding_rollup(rd.from_arrow(t), 25, 10)


def test_sessionize(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.windows import sessionize

    # gaps: 5, 100 (break), 5 -> sessions [0,5], [105,110]
    t = pa.table({
        "series_id": ["u"] * 4,
        "x": [0, 5, 105, 110],
        "event_id": [1, 2, 3, 4],
    })
    out = sessionize(rd.from_arrow(t), 50, id_col="event_id").to_pandas()
    out = out.sort_values("session_start").reset_index(drop=True)
    assert list(out["session_start"]) == [0, 105]
    assert list(out["session_end"]) == [5, 110]
    assert list(out["n_events"]) == [2, 2]
