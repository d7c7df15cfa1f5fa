"""Wide-format pivot: long ``(row_key, col_key)`` pairs -> one row per
row_key with a count column per (caller-declared) col value.

No counterpart in the reference; engine-level reshaping (the
"crosstab" every corpus audit ends with, e.g. documents per source x
language). The column set is a CALLER-DECLARED static list — the
scale-safe contract: a data-driven column set would need a full pass
before the schema exists and can explode to millions of columns;
declaring it keeps the pivot a pure map-side transform + one grouped
sum. Values outside the declared set land in ``other``.

Scale shape: per block one Arrow group-by + a vectorized scatter into
the wide layout (no per-row Python), then the standard tree grouped sum
over |row_keys| rows — the wide columns are additive, so partials
merge exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["pivot_counts"]


def pivot_counts(ds, *, row_col: str, col_col: str, columns,
                 other_col: str = "other", fanin: int = 8):
    """Returns ``(row_col, n_<c> for c in columns, <other_col>)``."""
    from .rollup import grouped_sum

    columns = list(columns)
    wide = [f"n_{c}" for c in columns] + [other_col]

    def _widen(b: pa.Table) -> pa.Table:
        g = b.select([row_col, col_col]).group_by(
            [row_col, col_col]).aggregate([(col_col, "count")])
        cnt_name = f"{col_col}_count"
        cnt = g[cnt_name].to_numpy(zero_copy_only=False).astype(np.int64)
        colv = g[col_col]
        if isinstance(colv, pa.ChunkedArray):
            colv = colv.combine_chunks()
        # map col values to wide slot (declared order; unknown -> other)
        slot = np.full(len(cnt), len(columns), dtype=np.int64)
        for i, c in enumerate(columns):
            hit = pc.equal(colv, c).to_numpy(zero_copy_only=False)
            slot[hit] = i
        out = {row_col: g[row_col]}
        for i, name in enumerate(wide):
            out[name] = pa.array(np.where(slot == i, cnt, 0))
        return pa.table(out)

    long = ds.map_batches(_widen, batch_format="pyarrow")
    return grouped_sum(long, [row_col], wide, count_col="__nrows",
                       fanin=fanin).drop_columns(["__nrows"])
