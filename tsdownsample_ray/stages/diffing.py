"""Crawl snapshot diffing: given two crawls of the same URL space,
classify every URL as ``same`` / ``changed`` / ``added`` / ``removed``
— the incremental-crawl primitive (what must be re-fetched, what can be
deduped against the previous snapshot, what disappeared).

No counterpart in the reference (a kernel library); web-corpus layer
(brief-mandated). Input contract: ONE row per key per side (pre-collapse
multi-snapshot inputs with a rollup/keep-first first).

Scale shape (100 TB): both sides are tagged map-side and union under ONE
hash(key) shuffle; each partition sorts once by (key, side) and
classifies every key in one vectorized segment pass (segments have 1 or
2 rows by contract — presence pattern + one vectorized value comparison).
No broadcast, no driver materialization, payloads travel exactly one
exchange. Pair the output with ``graph.grouped_sum_parts`` for per-domain
status counts.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ..arrow_utils import group_codes, make_add_part

__all__ = ["snapshot_diff", "state_changes", "streak_profile"]

_STATUS = {0: "removed", 1: "added", 2: "same", 3: "changed"}


def snapshot_diff(old_ds, new_ds, *, key_col: str = "url",
                  val_col: str = "text", num_partitions: int = 8):
    """Returns one row per distinct key: ``(key_col, status)`` with
    status in {'same', 'changed', 'added', 'removed'}; 'changed' compares
    ``val_col`` for binary equality with SQL ``=`` null semantics: a null
    payload is never equal to anything — including another null — so a
    key whose value is null on BOTH sides classifies as 'changed' (match
    the oracle with plain ``=``, not ``IS NOT DISTINCT FROM``)."""
    from ..arrow_utils import stable_part_codes

    mod = num_partitions * 64

    def _tag(side: int):
        def _t(b: pa.Table) -> pa.Table:
            t = pa.table({key_col: b[key_col], "__v": b[val_col],
                          "__side": pa.array(
                              np.full(b.num_rows, side, np.int8))})
            h = stable_part_codes(t[key_col], None)
            return t.append_column(
                "__part", pa.array((h % np.uint64(mod)).astype(np.int32)))
        return _t

    tagged = old_ds.map_batches(_tag(0), batch_format="pyarrow").union(
        new_ds.map_batches(_tag(1), batch_format="pyarrow"))

    def _classify(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        k_type = t[key_col].type
        empty = pa.table({key_col: pa.array([], k_type),
                          "status": pa.array([], pa.string())})
        if t.num_rows == 0:
            return empty
        t = t.take(pc.sort_indices(t, sort_keys=[
            (key_col, "ascending"), ("__side", "ascending")]))
        key = t[key_col]
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        codes = group_codes(key)
        side = t["__side"].to_numpy(zero_copy_only=False).astype(np.int64)
        heads = np.ones(len(codes), dtype=bool)
        heads[1:] = codes[1:] != codes[:-1]
        seg = np.flatnonzero(heads)
        n = np.diff(np.append(seg, len(codes)))
        if n.max(initial=0) > 2:
            raise ValueError(
                "snapshot_diff: more than one row per (key, side) — "
                "collapse snapshots per key first")
        both = n == 2
        v = t["__v"]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        # segments of size 2 are (old, new) in that order after the sort;
        # a size-2 segment with equal sides would violate the contract
        if bool(both.any()):
            s2 = seg[both]
            if not (side[s2] == 0).all() or not (side[s2 + 1] == 1).all():
                raise ValueError(
                    "snapshot_diff: duplicate key within one side")
            eq = pc.equal(v.take(pa.array(s2)),
                          v.take(pa.array(s2 + 1))).to_numpy(
                              zero_copy_only=False)
        status_code = np.where(n == 1, side[seg], 0)  # 0/1 removed/added
        if bool(both.any()):
            status_code[both] = np.where(eq, 2, 3)
        lut = pa.array([_STATUS[i] for i in range(4)])
        return pa.table({
            key_col: key.take(pa.array(seg)),
            "status": lut.take(pa.array(status_code.astype(np.int64)))})

    return tagged.repartition(num_partitions).groupby("__part").map_groups(
        _classify, batch_format="pyarrow")


def state_changes(ds, *, series_col: str = "series_id",
                  ts_col: str = "ts_us", id_col: str = "event_id",
                  value_col: str = "v", num_partitions: int = 8):
    """State-change compression: per series (ordered by ts, id), keep the
    first row and every row whose value differs from its predecessor —
    the lossless encoding for step-function telemetry (feature flags,
    device states, status gauges), where the kept rows ARE the series.

    One hash(series) shuffle, one sorted vectorized pass (shift-compare
    with series-boundary reset); output keeps the input columns plus
    ``run_len`` — how many consecutive input rows the kept row stands
    for (so ``sum(run_len) == n input rows`` is the lossless audit).
    SQL: ``lag() OVER`` inequality filter + lead-position arithmetic."""

    mod = num_partitions * 64

    _add_part = make_add_part(series_col, mod)

    def _compress(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        s_type = t[series_col].type
        if t.num_rows == 0:
            return pa.table({series_col: pa.array([], s_type),
                             ts_col: pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64()),
                             value_col: pa.array([], pa.int64()),
                             "run_len": pa.array([], pa.int64())})
        t = t.take(pc.sort_indices(t, sort_keys=[
            (series_col, "ascending"), (ts_col, "ascending"),
            (id_col, "ascending")]))
        sid = t[series_col]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = group_codes(sid)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(v)
        keep = np.ones(n, dtype=bool)
        keep[1:] = (codes[1:] != codes[:-1]) | (v[1:] != v[:-1])
        starts = np.flatnonzero(keep)
        run_len = np.diff(np.append(starts, n))
        kept = t.take(pa.array(starts))
        return pa.table({
            series_col: kept[series_col],
            ts_col: kept[ts_col], id_col: kept[id_col],
            value_col: kept[value_col],
            "run_len": pa.array(run_len)})

    parted = ds.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _compress, batch_format="pyarrow")


def streak_profile(ds, *, series_col: str = "series_id",
                   x_col: str = "x", y_col: str = "y",
                   id_col: str | None = None,
                   num_partitions: int = 16):
    """Monotone streak / run-length profile: per series, classify every
    consecutive step (ordered by ``(x, id)``) as up / down / flat by the
    sign of ``y[i] - y[i-1]``, group maximal same-direction runs, and
    reduce to ``(series_id, max_up_steps, max_down_steps,
    max_flat_steps, n_runs)``. Series with fewer than two rows have no
    steps and are omitted (matching the SQL ``WHERE lag IS NOT NULL``).

    Scale shape: ONE hash(series) shuffle; inside each partition one
    sorted pass derives every series' steps, run breaks (direction OR
    series change), run lengths (``np.bincount`` over the break-cumsum)
    and the per-direction maxima (an arrow ``group_by`` over the
    runs-sized table) — no per-row Python.

    SQL restatement: ``lag()`` step signs + islands (window-summed
    breaks) + ``max(len) FILTER (WHERE dir = …)``."""

    mod = num_partitions * 64

    _add_part = make_add_part(series_col, mod)

    sort_keys = [(series_col, "ascending"), (x_col, "ascending")]
    if id_col is not None:
        sort_keys.append((id_col, "ascending"))

    def _profile(g: pa.Table) -> pa.Table:
        sid_type = g[series_col].type
        empty = pa.table({
            "series_id": pa.array([], sid_type),
            "max_up_steps": pa.array([], pa.int64()),
            "max_down_steps": pa.array([], pa.int64()),
            "max_flat_steps": pa.array([], pa.int64()),
            "n_runs": pa.array([], pa.int64()),
        })
        if g.num_rows == 0:
            return empty
        t = g.take(pc.sort_indices(g, sort_keys=sort_keys))
        sid = t[series_col]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        # group_codes (nulls -> one -1 group, the SQL GROUP BY NULL
        # semantic); labels come from a representative ROW per group
        # below, never dictionary.take (-1 is not a dictionary slot)
        codes = group_codes(sid)
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(y)
        if n < 2:
            return empty
        same = codes[1:] == codes[:-1]  # step exists within a series
        dir_ = np.sign(y[1:] - y[:-1]).astype(np.int64)
        step_sid = codes[1:][same]
        step_row = np.arange(1, n)[same]  # later row of each step
        step_dir = dir_[same]
        if len(step_sid) == 0:
            return empty
        brk = np.ones(len(step_sid), dtype=np.int64)
        brk[1:] = ((step_sid[1:] != step_sid[:-1])
                   | (step_dir[1:] != step_dir[:-1])).astype(np.int64)
        run_id = np.cumsum(brk) - 1
        lens = np.bincount(run_id)
        heads = np.flatnonzero(brk)
        run_sid = step_sid[heads]
        run_row = step_row[heads]
        run_dir = step_dir[heads]
        runs = pa.table({
            "sid": pa.array(run_sid),
            "row": pa.array(run_row),
            "up": pa.array(np.where(run_dir == 1, lens, 0)),
            "down": pa.array(np.where(run_dir == -1, lens, 0)),
            "flat": pa.array(np.where(run_dir == 0, lens, 0)),
            "one": pa.array(np.ones(len(run_sid), dtype=np.int64)),
        }).group_by(["sid"]).aggregate(
            [("up", "max"), ("down", "max"), ("flat", "max"),
             ("one", "sum"), ("row", "min")])
        return pa.table({
            "series_id": sid.take(pc.cast(runs["row_min"], pa.int64())),
            "max_up_steps": pc.cast(runs["up_max"], pa.int64()),
            "max_down_steps": pc.cast(runs["down_max"], pa.int64()),
            "max_flat_steps": pc.cast(runs["flat_max"], pa.int64()),
            "n_runs": pc.cast(runs["one_sum"], pa.int64()),
        })

    parted = ds.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _profile, batch_format="pyarrow")
