"""URL canonicalization (stages/urls.py) and crawl snapshot diffing
(stages/diffing.py)."""

import numpy as np
import pyarrow as pa
import pytest

from tsdownsample_ray.stages.urls import canonicalize_urls_batch

ray = pytest.importorskip("ray")
import ray.data as rd  # noqa: E402


def _canon(urls):
    t = pa.table({"url": pa.array(urls, pa.string())})
    return canonicalize_urls_batch(t)["canonical"].to_pylist()


def test_canonicalize_cases():
    assert _canon([
        "HTTPS://WWW.Example.COM:443/Item/3?utm_source=a&id=1#frag",
        "https://www.example.com/Item/3?id=1",
        "http://Host.com:80/p?a=1&utm_b=2&c=3",
        "https://h.com/p?utm_only=1",
        "https://h.com/CaseKept/Path",
        "https://h.com:8443/p",          # non-default port survives
        "http://h.com:443/p",            # 443 on http is NOT default
        "https://Example.com?Session=AbC",   # query, no path slash:
        "HTTPS://H.com:443?Tok=AbC",         # case must be preserved
    ]) == [
        "https://www.example.com/Item/3?id=1",
        "https://www.example.com/Item/3?id=1",
        "http://host.com/p?a=1&c=3",
        "https://h.com/p",
        "https://h.com/CaseKept/Path",
        "https://h.com:8443/p",
        "http://h.com:443/p",
        "https://example.com?Session=AbC",
        "https://h.com?Tok=AbC",
    ]


def test_canonicalize_no_authority():
    assert _canon(["relative/Path#x"]) == ["relative/path"]


def test_snapshot_diff(ray_session):
    from tsdownsample_ray.stages.diffing import snapshot_diff

    old = rd.from_arrow(pa.table({
        "url": ["u1", "u2", "u3", "u4"],
        "text": ["a", "b", "c", "d"]})).repartition(2)
    new = rd.from_arrow(pa.table({
        "url": ["u2", "u3", "u5"],
        "text": ["b", "CHANGED", "e"]})).repartition(2)
    out = snapshot_diff(old, new, num_partitions=2).to_pandas()
    got = dict(zip(out["url"], out["status"]))
    assert got == {"u1": "removed", "u2": "same", "u3": "changed",
                   "u4": "removed", "u5": "added"}


def test_snapshot_diff_null_payload_is_changed(ray_session):
    # SQL '=' semantics (documented in the docstring): a null payload is
    # never equal to anything, including another null, so null-vs-null
    # and null-vs-value both classify 'changed'.
    from tsdownsample_ray.stages.diffing import snapshot_diff

    old = rd.from_arrow(pa.table({
        "url": ["u1", "u2", "u3"],
        "text": pa.array([None, None, "c"], pa.string())}))
    new = rd.from_arrow(pa.table({
        "url": ["u1", "u2", "u3"],
        "text": pa.array([None, "b", "c"], pa.string())}))
    out = snapshot_diff(old, new, num_partitions=2).to_pandas()
    got = dict(zip(out["url"], out["status"]))
    assert got == {"u1": "changed", "u2": "changed", "u3": "same"}


def test_snapshot_diff_rejects_dup_key(ray_session):
    from tsdownsample_ray.stages.diffing import snapshot_diff

    old = rd.from_arrow(pa.table({"url": ["u1", "u1"],
                                  "text": ["a", "b"]}))
    new = rd.from_arrow(pa.table({"url": ["u1"], "text": ["a"]}))
    with pytest.raises(Exception):
        snapshot_diff(old, new, num_partitions=1).to_pandas()


def test_holt_matches_recursion(ray_session):
    """Holt fixed point vs the literal coupled recursion."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from tsdownsample_ray.stages.smoothing import holt_fixed_point

    rng = np.random.default_rng(9)
    rows = []
    for s in ("a", "b", "c"):
        ys = (rng.integers(0, 200, size=30)
              + np.arange(30) * 5).tolist()  # drift so trend is nonzero
        rows += [(s, i, int(y)) for i, y in enumerate(ys)]
    t = pa.table({"series_id": [r[0] for r in rows],
                  "bucket": [r[1] for r in rows],
                  "sum_y": [r[2] for r in rows]})
    got = holt_fixed_point(rd.from_arrow(t).repartition(4), ka=3, kb=4,
                           num_partitions=2).to_pandas()
    exp = {}
    for s in ("a", "b", "c"):
        ys = [r[2] for r in rows if r[0] == s]
        level, trend = ys[0], 0
        exp[(s, 0)] = (level, trend, ys[0])
        for i, v in enumerate(ys[1:], start=1):
            f = level + trend
            nl = f + ((v - f) >> 3)
            trend = trend + ((nl - level - trend) >> 4)
            level = nl
            exp[(s, i)] = (level, trend, f)
    assert len(got) == len(rows)
    for _, r in got.iterrows():
        assert exp[(r["series_id"], r["bucket"])] == \
            (r["level"], r["trend"], r["forecast"])


def test_state_changes_lossless_runs(ray_session):
    """state_changes keeps exactly the first row + value changes per
    series; run_len sums back to the input row count (lossless)."""
    import pandas as pd
    import ray.data as rd

    from tsdownsample_ray.stages.diffing import state_changes

    rng = np.random.default_rng(8)
    n = 600
    df = pd.DataFrame({
        "series_id": rng.choice(["a", "b"], size=n),
        "ts_us": rng.permutation(n).astype("int64"),
        "event_id": np.arange(n, dtype="int64"),
        "v": rng.integers(0, 3, size=n).astype("int64"),   # runs likely
    })
    out = state_changes(rd.from_pandas(df).repartition(5),
                        num_partitions=3).to_pandas()
    assert out["run_len"].sum() == n
    for s, g in df.sort_values(["ts_us", "event_id"]).groupby("series_id"):
        v = g["v"].to_numpy()
        keep = np.ones(len(v), dtype=bool)
        keep[1:] = v[1:] != v[:-1]
        want_ids = g["event_id"].to_numpy()[keep]
        got = out[out.series_id == s].sort_values("ts_us")
        assert list(got["event_id"]) == list(want_ids)
        runs = np.diff(np.append(np.flatnonzero(keep), len(v)))
        assert list(got["run_len"]) == list(runs)
