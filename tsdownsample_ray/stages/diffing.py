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

__all__ = ["snapshot_diff", "state_changes"]

_STATUS = {0: "removed", 1: "added", 2: "same", 3: "changed"}


def snapshot_diff(old_ds, new_ds, *, key_col: str = "url",
                  val_col: str = "text", num_partitions: int = 8):
    """Returns one row per distinct key: ``(key_col, status)`` with
    status in {'same', 'changed', 'added', 'removed'}; 'changed' compares
    ``val_col`` for binary equality."""
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
        codes = key.dictionary_encode().indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
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
    from ..arrow_utils import stable_part_codes

    mod = num_partitions * 64

    def _add_part(b: pa.Table) -> pa.Table:
        h = stable_part_codes(b[series_col], None)
        return b.append_column(
            "__part", pa.array((h % np.uint64(mod)).astype(np.int32)))

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
        codes = sid.dictionary_encode().indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
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
