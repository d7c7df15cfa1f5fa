"""Distributed sorted prefix scan + greedy budget selection — the
fractional-knapsack / cache-admission primitive (select items in
best-ratio-first order until a budget is exhausted), built on the two
fundamental distributed pieces: a Ray Data range-partitioning SORT and
an exclusive PREFIX SUM across the sorted blocks.

The prefix sum is the textbook two-pass scan (Blelloch 1990) at block
granularity: pass 1 reduces each sorted block to (first-row key, block
cost sum) — n_blocks rows to the driver, a bounded read; the driver
orders them by first-row key (block ranges are disjoint in the sorted
output and the full sort key is unique per row, so first-row keys
order blocks correctly) and computes exclusive offsets; pass 2 hands
each block its offset — looked up by the block's own first-row key
from the broadcast offset list — and finishes the selection with one
local cumsum. No row ever leaves its block except through the sort.

No counterpart in the reference (kernel library only).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["budget_select"]


def _first_key(b: pa.Table, order_cols: list) -> tuple:
    return tuple(b[c][0].as_py() for c in order_cols)


def budget_select(ds, *, order_cols: list, descending: list,
                  cost_col: str, value_col: str, budget: int):
    """Greedy selection in ``order_cols`` order until the running
    ``cost_col`` total would exceed ``budget`` (classic greedy: an item
    is selected iff its INCLUSIVE running cost stays within budget —
    later cheaper items are NOT back-filled, matching the windowed-SQL
    replay). Returns a ONE-ROW dataset:
    ``(n_total, n_selected, sel_cost, sel_value)``.

    The full sort key (order_cols) must be unique per row — it is what
    orders blocks for the prefix pass. Descending is supported for
    NUMERIC key columns only (the driver-side block ordering negates
    values; a descending string key would mis-order blocks, so it is
    rejected up front)."""
    import ray

    s = ds.sort(order_cols, descending=descending)
    s = s.materialize()  # sorted blocks reused by both passes

    def _block_stats(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"key_json": pa.array([], pa.string()),
                             "cost": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        import json as _json

        cost = b[cost_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "key_json": pa.array([_json.dumps(_first_key(b, order_cols))]),
            "cost": pa.array([int(cost.sum())]),
            "n": pa.array([b.num_rows])})

    stats = s.map_batches(_block_stats, batch_size=None,
                          batch_format="pyarrow").take_all()
    # bounded driver read: one row per sorted block
    import json as _json

    def _order_key(r):
        key = _json.loads(r["key_json"])
        for v, d in zip(key, descending):
            if d and not isinstance(v, (int, float)):
                raise TypeError(
                    "budget_select: descending requires numeric key "
                    f"columns (got {type(v).__name__})")
        return tuple((-v if d else v) if isinstance(v, (int, float))
                     else v for v, d in zip(key, descending))

    stats.sort(key=_order_key)
    offsets = {}
    run = 0
    for r in stats:
        offsets[r["key_json"]] = run
        run += r["cost"]
    off_ref = ray.put(offsets)

    def _select(b: pa.Table) -> pa.Table:
        empty = pa.table({"n_total": pa.array([], pa.int64()),
                          "n_selected": pa.array([], pa.int64()),
                          "sel_cost": pa.array([], pa.int64()),
                          "sel_value": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        import json as _json

        offs = ray.get(off_ref)
        base = offs[_json.dumps(_first_key(b, order_cols))]
        cost = b[cost_col].to_numpy(zero_copy_only=False).astype(np.int64)
        val = b[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        running = base + np.cumsum(cost)
        sel = running <= budget
        return pa.table({
            "n_total": pa.array([b.num_rows]),
            "n_selected": pa.array([int(sel.sum())]),
            "sel_cost": pa.array([int(cost[sel].sum())]),
            "sel_value": pa.array([int(val[sel].sum())])})

    parts = s.map_batches(_select, batch_size=None,
                          batch_format="pyarrow")

    def _final(b: pa.Table) -> pa.Table:
        out = {}
        for c in ("n_total", "n_selected", "sel_cost", "sel_value"):
            v = b[c].to_numpy(zero_copy_only=False).astype(np.int64)
            out[c] = pa.array([int(v.sum())])
        return pa.table(out)

    return parts.repartition(1).map_batches(_final,
                                            batch_format="pyarrow")
