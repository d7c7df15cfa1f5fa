"""Monotone streak profile (stages/diffing.py:streak_profile): the
run-break vectorization vs a literal per-series replay, across
partitionings; flat runs, singletons omitted, (x, id) tie order."""

import numpy as np
import pyarrow as pa
import pytest

from tsdownsample_ray.stages.diffing import streak_profile

ray = pytest.importorskip("ray")
import ray.data as rd  # noqa: E402


def _brute(rows):
    """rows = [(sid, x, id, y)] -> {sid: (up, down, flat, n_runs)}."""
    by_sid = {}
    for sid, x, i, y in sorted(rows):
        by_sid.setdefault(sid, []).append(y)
    out = {}
    for sid, ys in by_sid.items():
        dirs = [np.sign(b - a) for a, b in zip(ys, ys[1:])]
        if not dirs:
            continue
        runs = []
        for d in dirs:
            if runs and runs[-1][0] == d:
                runs[-1][1] += 1
            else:
                runs.append([d, 1])
        mx = {1: 0, -1: 0, 0: 0}
        for d, ln in runs:
            mx[d] = max(mx[d], ln)
        out[sid] = (mx[1], mx[-1], mx[0], len(runs))
    return out


@pytest.mark.parametrize("nparts", [1, 4])
def test_streaks_match_replay(ray_session, nparts):
    rng = np.random.default_rng(13)
    rows = []
    for s in range(6):
        n = 50
        xs = np.sort(rng.choice(100_000, size=n, replace=False))
        ys = rng.integers(0, 4, size=n)  # small range -> many flats
        rows += [(f"s{s}", int(x), k, int(y))
                 for k, (x, y) in enumerate(zip(xs, ys))]
    rows.append(("single", 5, 0, 9))  # no steps -> omitted
    exp = _brute(rows)

    t = pa.table({"series_id": [r[0] for r in rows],
                  "x": [r[1] for r in rows],
                  "event_id": [r[2] for r in rows],
                  "y": [r[3] for r in rows]})
    got = streak_profile(rd.from_arrow(t).repartition(nparts),
                         id_col="event_id", num_partitions=2).to_pandas()
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        assert (r["max_up_steps"], r["max_down_steps"],
                r["max_flat_steps"], r["n_runs"]) == exp[r["series_id"]]


def test_streaks_hand_values(ray_session):
    # y: 1,2,3,3,2 -> dirs: +,+,0,- -> up=2, down=1, flat=1, runs=3
    t = pa.table({"series_id": ["a"] * 5, "x": [1, 2, 3, 4, 5],
                  "event_id": [0, 1, 2, 3, 4], "y": [1, 2, 3, 3, 2]})
    got = streak_profile(rd.from_arrow(t), id_col="event_id",
                         num_partitions=1).to_pandas()
    r = got.iloc[0]
    assert (r["max_up_steps"], r["max_down_steps"], r["max_flat_steps"],
            r["n_runs"]) == (2, 1, 1, 3)


def test_clamped_balance_prefix_identity(ray_session):
    """b_i = max(0, b_{i-1}+d_i) equals S_i - min(0, min prefix S) —
    checked against a direct sequential replay on the real fixture."""
    import duckdb
    import numpy as np

    from tsdownsample_ray.pipelines.queries import q_clamped_balance_events

    sf = "/root/testdata/sf0.001"
    out = (q_clamped_balance_events(sf).to_pandas()
           .set_index("series_id"))
    rows = duckdb.sql(f"""
        SELECT event_type,
               CASE WHEN event_id % 2 = 0
                    THEN CAST(round(value*100) AS BIGINT)
                    ELSE -CAST(round(value*100) AS BIGINT) END AS d
        FROM '{sf}/events.parquet' ORDER BY event_type, ts, event_id
    """).fetchall()
    from collections import defaultdict
    by_s = defaultdict(list)
    for t, d in rows:
        by_s[t].append(d)
    for sid, ds_ in by_s.items():
        b = 0
        mx = 0
        for d in ds_:
            b = max(0, b + d)
            mx = max(mx, b)
        r = out.loc[sid]
        assert r["final_balance"] == b
        assert r["max_balance"] == mx
        assert r["n"] == len(ds_) and r["sum_d"] == sum(ds_)
        assert r["final_balance"] == r["sum_d"] - r["min_prefix"]


def test_token_bucket_sequential_replay(ray_session):
    """The segmented clamp-monoid scan must equal a direct sequential
    replay of b_i = min(C, max(0, b_{i-1}+d_i)) on the real fixture."""
    import duckdb

    from tsdownsample_ray.pipelines.queries import q_token_bucket_events

    sf = "/root/testdata/sf0.001"
    CAP = 25_000
    out = (q_token_bucket_events(sf).to_pandas().set_index("series_id"))
    rows = duckdb.sql(f"""
        SELECT event_type,
               CASE WHEN event_id % 2 = 0
                    THEN CAST(round(value*100) AS BIGINT)
                    ELSE -CAST(round(value*100) AS BIGINT) END AS d
        FROM '{sf}/events.parquet' ORDER BY event_type, ts, event_id
    """).fetchall()
    from collections import defaultdict
    by_s = defaultdict(list)
    for t, d in rows:
        by_s[t].append(d)
    assert set(out.index) == set(by_s)
    for sid, ds_ in by_s.items():
        b = CAP
        mn, mx, n_empty, n_full, spill, short = CAP, CAP, 0, 0, 0, 0
        for d in ds_:
            raw = b + d
            spill += max(0, raw - CAP)
            short += max(0, -raw)
            b = min(CAP, max(0, raw))
            mn, mx = min(mn, b), max(mx, b)
            n_empty += b == 0
            n_full += b == CAP
        r = out.loc[sid]
        assert r["final_balance"] == b and r["min_balance"] == mn
        assert r["max_balance"] == mx
        assert (r["n_empty"], r["n_full"]) == (n_empty, n_full)
        assert (r["total_spill"], r["total_shortfall"]) == (spill, short)
        assert r["n"] == len(ds_) and r["sum_d"] == sum(ds_)
        # conservation: final = C + sum_d - spill + short
        assert r["final_balance"] == CAP + r["sum_d"] - spill + short


def test_deadband_sequential_replay(ray_session):
    """deadband_filter must equal a direct sequential replay: emit iff
    |y - last_emitted| > delta, plus the LOCF tolerance-band property."""
    import duckdb

    from tsdownsample_ray.pipelines.queries import q_deadband_events

    sf = "/root/testdata/sf0.001"
    out = q_deadband_events(sf).to_pandas()
    rows = duckdb.sql(f"""
        SELECT event_type, epoch_us(ts),
               CAST(round(value*100) AS BIGINT)
        FROM '{sf}/events.parquet' ORDER BY event_type, ts, event_id
    """).fetchall()
    from collections import defaultdict
    by_s = defaultdict(list)
    for t, x, y in rows:
        by_s[t].append((x, y))
    for sid, pts in by_s.items():
        want = [pts[0]]
        last = pts[0][1]
        for x, y in pts[1:]:
            if abs(y - last) > 6000:
                want.append((x, y))
                last = y
        got = sorted(map(tuple, out[out.series_id == sid]
                         [["x", "y"]].itertuples(index=False)))
        assert got == sorted(want), sid
        # every dropped point is within delta of its LOCF value
        last = pts[0][1]
        for x, y in pts[1:]:
            if abs(y - last) > 6000:
                last = y
            else:
                assert abs(y - last) <= 6000
