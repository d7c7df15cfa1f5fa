"""Seasonal (time-of-cycle) profile and deseasonalized anomaly flags.

The monitoring-engine companion to the windowed z-score detector
(``stages/windows.detect_anomalies``): instead of a trailing window, the
reference population for each event is every event of its series that
fell in the same CYCLE SLOT (e.g. hour-of-day) — the classic diurnal
baseline. Two stages:

- :func:`seasonal_profile` — per (series, slot) integer sufficient
  statistics (n, Σy, Σy²): map-side partial aggregate per block, then a
  tiny tree merge (|series| × cycle keys, e.g. 24 per series).
- :func:`seasonal_anomalies` — the brief's broadcast pattern: the profile
  is `ray.put` ONCE and each batch joins it locally (no shuffle of the event
  stream); the flag is the pure-integer z-test
  ``(n·y − Σy)² > t²·(n·Σy² − (Σy)²)`` so output is exact under any
  partitioning.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..arrow_utils import rename_agg

__all__ = ["seasonal_profile", "seasonal_anomalies"]


def _slot_partials(b: pa.Table, *, series_col: str, x_col: str,
                   y_col: str, period_us: int, cycle: int) -> pa.Table:
    x = b[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
    y = b[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
    slot = (x // period_us) % cycle
    t = pa.table({"series_id": b[series_col], "slot": pa.array(slot),
                  "one": pa.array(np.ones(len(x), np.int64)),
                  "s": pa.array(y), "q": pa.array(y * y)})
    g = t.group_by(["series_id", "slot"]).aggregate(
        [("one", "sum"), ("s", "sum"), ("q", "sum")])
    return rename_agg(g, {"series_id": "series_id", "slot": "slot",
                          "one_sum": "n", "s_sum": "s", "q_sum": "q"})


def _merge_partials(b: pa.Table) -> pa.Table:
    g = b.group_by(["series_id", "slot"]).aggregate(
        [("n", "sum"), ("s", "sum"), ("q", "sum")])
    return rename_agg(g, {"series_id": "series_id", "slot": "slot",
                          "n_sum": "n", "s_sum": "s", "q_sum": "q"})


def seasonal_profile(ds, *, series_col: str = "series_id",
                     x_col: str = "x", y_col: str = "y",
                     period_us: int = 3_600_000_000, cycle: int = 24):
    """Per (series, slot) profile with ``slot = (x // period_us) % cycle``:
    ``(series_id, slot, n, s=Σy, q=Σy²)`` — all int64."""
    partials = ds.map_batches(
        lambda b: _slot_partials(b, series_col=series_col, x_col=x_col,
                                 y_col=y_col, period_us=period_us,
                                 cycle=cycle),
        batch_format="pyarrow")
    # final merge: <= |series| * cycle rows — one funnel block
    return partials.repartition(1).map_batches(
        _merge_partials, batch_format="pyarrow")


def seasonal_anomalies(ds, profile: pa.Table, *,
                       series_col: str = "series_id", x_col: str = "x",
                       y_col: str = "y", id_col: str | None = None,
                       period_us: int = 3_600_000_000, cycle: int = 24,
                       threshold: int = 3):
    """Flag events > ``threshold`` profile-stddevs from their slot mean
    (integer z-test; population includes the event itself). ``profile``
    is the materialized (tiny) output of :func:`seasonal_profile`,
    broadcast once via ``ray.put``."""
    import ray

    ref = ray.put(profile.combine_chunks())
    t2 = threshold * threshold

    def _flag(b: pa.Table) -> pa.Table:
        p = ray.get(ref)
        x = b[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        slot = (x // period_us) % cycle
        cols = {"series_id": b[series_col], "slot": pa.array(slot),
                "y": b[y_col]}
        if id_col:
            cols[id_col] = b[id_col]
        j = pa.table(cols).join(p, keys=["series_id", "slot"],
                                join_type="inner")
        n = j["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = j["s"].to_numpy(zero_copy_only=False).astype(np.int64)
        q = j["q"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = j["y"].to_numpy(zero_copy_only=False).astype(np.int64)
        dev = n * y - s
        flag = (n >= 2) & (dev * dev > t2 * (n * q - s * s))
        out = {"series_id": j["series_id"], "slot": j["slot"],
               "y": j["y"], "slot_n": j["n"], "slot_sum": j["s"],
               "is_anomaly": pa.array(flag)}
        if id_col:
            out = {"series_id": j["series_id"], id_col: j[id_col],
                   **{k: v for k, v in out.items() if k != "series_id"}}
        return pa.table(out)

    return ds.map_batches(_flag, batch_format="pyarrow")
