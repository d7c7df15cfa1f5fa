"""Table profiling (``describe``): one pass over an int64-column table
producing per-column ``(n, n_null, min_v, max_v, ndv)`` — the data-quality
/ catalog-statistics primitive (ANALYZE TABLE, Deequ/GE profiles) an
engine runs before planning and after every load.

Scale shape: per-block partials are CONSTANT-size for the moments
(n/null/min/max — one ``pc.min_max`` per column) and
distinct-VALUE rows for the exact NDV (per-block ``unique()`` collapse
first, then ONE hash(column,value) shuffle + per-partition distinct
count — the standard exact-ndv exchange, carrying unique values only).
The two tiny result sides meet in one ≤|cols|-row join.

No counterpart in the reference (kernel library only).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["profile_columns"]


def profile_columns(ds, cols: list, *, num_partitions: int = 8):
    """Profile int64 columns: returns one row per column:
    ``(column, n, n_null, min_v, max_v, ndv)`` (min/max/ndv over
    non-null values)."""
    from .graph import grouped_sum_parts

    cols = list(cols)
    if not cols:
        raise ValueError("cols must be non-empty")

    def _stats(b: pa.Table) -> pa.Table:
        names, ns, nulls, mins, maxs = [], [], [], [], []
        for c in cols:
            col = b[c]
            mm = pc.min_max(col)
            names.append(c)
            ns.append(b.num_rows)
            nulls.append(col.null_count)
            mn, mx = mm["min"].as_py(), mm["max"].as_py()
            mins.append(mn)
            maxs.append(mx)
        return pa.table({"column": pa.array(names, pa.string()),
                         "n": pa.array(ns, pa.int64()),
                         "n_null": pa.array(nulls, pa.int64()),
                         "min_v": pa.array(mins, pa.int64()),
                         "max_v": pa.array(maxs, pa.int64())})

    def _merge_stats(g: pa.Table) -> pa.Table:
        t = g.group_by(["column"]).aggregate([
            ("n", "sum"), ("n_null", "sum"),
            ("min_v", "min"), ("max_v", "max")])
        from ..arrow_utils import rename_agg
        return rename_agg(t, {"column": "column", "n_sum": "n",
                              "n_null_sum": "n_null",
                              "min_v_min": "min_v", "max_v_max": "max_v"})

    stats = ds.map_batches(_stats, batch_format="pyarrow") \
        .groupby("column").map_groups(_merge_stats, batch_format="pyarrow")

    def _dv(b: pa.Table) -> pa.Table:
        names, vals = [], []
        for c in cols:
            col = b[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            u = col.drop_null().unique().to_numpy(zero_copy_only=False)
            names.append(np.full(len(u), cols.index(c), np.int64))
            vals.append(u.astype(np.int64))
        return pa.table({"ci": pa.array(np.concatenate(names)),
                         "value": pa.array(np.concatenate(vals))})

    distinct = grouped_sum_parts(
        ds.map_batches(_dv, batch_format="pyarrow"),
        ["ci", "value"], [], count_col="m", fanin=num_partitions)

    def _ndv_partial(b: pa.Table) -> pa.Table:
        t = pa.table({"ci": b["ci"],
                      "one": pa.array(np.ones(b.num_rows, np.int64))})
        g = t.group_by(["ci"]).aggregate([("one", "sum")])
        from ..arrow_utils import rename_agg
        return rename_agg(g, {"ci": "ci", "one_sum": "ndv"})

    ndv = grouped_sum_parts(
        distinct.map_batches(_ndv_partial, batch_format="pyarrow"),
        ["ci"], ["ndv"], count_col=None, fanin=2).map_batches(
        lambda b: pa.table({
            "column": pa.array([cols[i] for i in
                                b["ci"].to_pylist()], pa.string()),
            "ndv": b["ndv"]}),
        batch_format="pyarrow")

    joined = stats.join(ndv, join_type="inner",
                        num_partitions=2, on=("column",))
    return joined.map_batches(
        lambda b: b.select(["column", "n", "n_null", "min_v", "max_v",
                            "ndv"]),
        batch_format="pyarrow")
