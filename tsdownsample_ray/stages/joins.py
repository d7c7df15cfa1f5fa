"""Time-series joins the Dataset API lacks: as-of join (latest right row
at-or-before each left row, per key).

No counterpart in the reference (a kernel library); mandated by the build
brief's custom-operator list ("as-of join, range join, windowed
aggregate"). Classic uses: enrich raw events with the latest rollup
aggregate, align two sensor series, attach slowly-changing dimensions.

Scale shape: ONE hash shuffle. Both sides are tagged and union'd, rows
are hash-partitioned by key (dense part space + bounded reducers, the
``distinct_pairs`` discipline), and each partition is sorted ONCE by
(key, x, side) — the per-row match is then a vectorized
maximum-accumulate over right-row positions with a segment-start validity
check (a previous key's carry-over is always < this key's segment start,
so one comparison invalidates cross-key matches). No per-key Python call,
no broadcast, no driver materialization.

Partitioning assumption: none beyond hashable keys; duplicate right x
within a key resolves to the LAST row in (x, input-order) — callers
wanting a deterministic oracle match should keep right (key, x) unique
(e.g. rollup buckets)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["asof_join"]


def asof_join(left_ds, right_ds, *, on: str = "series_id",
              left_x: str = "x", right_x: str = "x",
              right_cols: list | None = None, suffix: str = "_r",
              num_partitions: int = 16):
    """For every left row, attach the right row of the same ``on`` key with
    the greatest ``right_x`` <= ``left_x`` (backward as-of, inclusive —
    DuckDB ``ASOF JOIN ... ON l.key = r.key AND l.x >= r.x`` semantics).
    Left rows without a match keep nulls (left join). Right columns are
    appended with ``suffix`` when they collide with left names."""
    rcols = right_cols
    if rcols is None:
        sch = right_ds.schema()
        rcols = [c for c in sch.names if c not in (on, right_x)]

    # the union must carry ONE schema: left rows hold the left payload +
    # null right slots; right rows hold their payload in the right slots.
    # Build both to the same column set (typed via the datasets' schemas).
    lsch = left_ds.schema()
    ltypes = dict(zip(lsch.names, lsch.types))
    rsch = right_ds.schema()
    rtypes = dict(zip(rsch.names, rsch.types))
    lpay = [c for c in lsch.names if c != on]
    out_names = {}  # right col -> output name (suffix on collision)
    for c in rcols:
        out_names[c] = c + suffix if c in lsch.names else c

    def _tag_left(b: pa.Table) -> pa.Table:
        cols = {on: b[on], "__x": pc.cast(b[left_x], pa.int64()),
                "__side": pa.array(np.ones(b.num_rows, dtype=np.int8))}
        for c in lpay:
            cols[f"L__{c}"] = b[c]
        for c in rcols:
            cols[f"R__{c}"] = pa.nulls(b.num_rows, rtypes[c])
        return pa.table(cols)

    def _tag_right(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = {on: b[on], "__x": pc.cast(b[right_x], pa.int64()),
                "__side": pa.array(np.zeros(n, dtype=np.int8))}
        for c in lpay:
            cols[f"L__{c}"] = pa.nulls(n, ltypes[c])
        for c in rcols:
            cols[f"R__{c}"] = b[c]
        return pa.table(cols)

    tagged = left_ds.map_batches(_tag_left, batch_format="pyarrow").union(
        right_ds.map_batches(_tag_right, batch_format="pyarrow"))

    from ..arrow_utils import stable_part_codes

    mod = num_partitions * 64

    def _add_part(b: pa.Table) -> pa.Table:
        h = stable_part_codes(b[on], None)
        part = (h % np.uint64(mod)).astype(np.int32)
        return b.append_column("__part", pa.array(part, pa.int32()))

    def _merge(g: pa.Table) -> pa.Table:
        # one sort per partition group: (key, x, side) — right rows (side
        # 0) before left at equal x makes 'backward' INCLUSIVE
        idx = pc.sort_indices(g, sort_keys=[(on, "ascending"),
                                            ("__x", "ascending"),
                                            ("__side", "ascending")])
        g = g.take(idx)
        n = g.num_rows
        side = g["__side"].to_numpy(zero_copy_only=False)
        is_left = side == 1
        if not is_left.any():
            return pa.table({
                on: g[on].slice(0, 0),
                **{c: g[f"L__{c}"].slice(0, 0) for c in lpay},
                **{out_names[c]: g[f"R__{c}"].slice(0, 0) for c in rcols},
            })
        # segment starts per key (dictionary codes of the sorted key col)
        key = g[on]
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        codes_arr = key.dictionary_encode().indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        change = np.ones(n, dtype=bool)
        change[1:] = codes_arr[1:] != codes_arr[:-1]
        seg_start = np.maximum.accumulate(
            np.where(change, np.arange(n), -1))
        # latest right-row position at or before each row, within segment
        pos_right = np.where(~is_left, np.arange(n), -1)
        cand = np.maximum.accumulate(pos_right)
        valid = (cand >= seg_start) & is_left
        li = np.flatnonzero(is_left)
        match = cand[li]
        ok = valid[li]
        take_right = pa.array(np.where(ok, match, -1), pa.int64())
        take_right = pc.if_else(pc.equal(take_right, -1),
                                pa.scalar(None, pa.int64()), take_right)
        left_take = pa.array(li, pa.int64())
        cols = {on: key.take(left_take)}
        for c in lpay:  # original left columns (left_x keeps its type)
            cols[c] = g[f"L__{c}"].take(left_take)
        for c in rcols:
            cols[out_names[c]] = g[f"R__{c}"].take(take_right)
        return pa.table(cols)

    parted = tagged.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _merge, batch_format="pyarrow")
