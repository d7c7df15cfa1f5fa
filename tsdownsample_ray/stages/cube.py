"""GROUPING SETS / ROLLUP / CUBE in one pass: hierarchical totals
(per-(a,b), per-a, per-b, grand) computed without re-scanning the input
per level — the OLAP primitive behind every "by domain, by language, and
overall" report.

Scale shape: each block replicates its rows once per grouping set with
the non-member keys nulled and a ``gid`` bitmask column (vectorized
column projection, NOT row loops), pre-collapses locally, and the
standard hashpart grouped sum merges — so the exchange carries per-set
PARTIALS (bounded by the per-block key cardinality x |sets|), never the
replicated rows. gid follows SQL's ``GROUPING()``: bit i set when key i
is aggregated away (i = 0 for the FIRST key = most-significant bit,
matching DuckDB).

No counterpart in the reference (kernel library only).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["grouping_sets_sum"]


def grouping_sets_sum(ds, *, keys: list, sets: list, sum_cols: list,
                      count_col: str = "n", num_partitions: int = 8):
    """``keys`` is the full key list; ``sets`` is a list of tuples, each
    the subset of keys that grouping set keeps (others emit NULL).
    Returns one row per group per set with ``gid`` =
    ``GROUPING(*keys)``."""
    from .graph import grouped_sum_parts

    keys = list(keys)
    sets = [tuple(s) for s in sets]
    for s in sets:
        unknown = set(s) - set(keys)
        if unknown:
            raise ValueError(f"grouping set {s} has unknown keys {unknown}")
    if len(set(sets)) != len(sets):
        raise ValueError("duplicate grouping sets")

    gids = [sum((1 << (len(keys) - 1 - i))
                for i, k in enumerate(keys) if k not in s)
            for s in sets]

    # aggregated-away keys are SENTINELS (not nulls) during grouping:
    # pyarrow 16.1's hash grouper splits an all-null string key into many
    # groups once a non-null int key sits beside it (>~32 rows), so the
    # null stays out of the grouper entirely. gid already says which keys
    # are aggregated away, so within a gid the sentinel is constant and
    # cannot merge distinct groups; nulls are restored at the very end.
    def _replicate(b: pa.Table) -> pa.Table:
        parts = []
        for s, gid in zip(sets, gids):
            cols = {}
            for k in keys:
                col = b[k]
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                if k in s:
                    cols[k] = col
                else:
                    sent = (pa.scalar("", col.type)
                            if pa.types.is_string(col.type)
                            or pa.types.is_large_string(col.type)
                            else pa.scalar(0, col.type))
                    cols[k] = pa.repeat(sent, b.num_rows)
            cols["gid"] = pa.array(
                np.full(b.num_rows, gid, np.int64))
            for c in sum_cols:
                cols[c] = b[c]
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    def _restore_nulls(b: pa.Table) -> pa.Table:
        gid_np = b["gid"].to_numpy(zero_copy_only=False).astype(np.int64)
        for i, k in enumerate(keys):
            bit = 1 << (len(keys) - 1 - i)
            away = (gid_np & bit) > 0
            if not away.any():
                continue
            col = b[k]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            masked = pc.if_else(pa.array(away), pa.nulls(len(away),
                                                         col.type), col)
            b = b.set_column(b.schema.get_field_index(k), k, masked)
        return b

    rep = ds.map_batches(_replicate, batch_format="pyarrow")
    summed = grouped_sum_parts(rep, keys + ["gid"], sum_cols,
                               count_col=count_col, fanin=num_partitions)
    return summed.map_batches(_restore_nulls, batch_format="pyarrow")
