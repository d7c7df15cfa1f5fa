"""Arrow <-> NumPy helpers shared by the stages.

Batches flow through the pipeline as ``pyarrow.Table`` (zero-copy from the
Ray object store); kernels want contiguous NumPy arrays. Arrow validity
bitmaps are converted to IEEE NaN for float columns on extraction, matching
the reference's float-NaN model (SURVEY.md §1.4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["col_to_numpy", "table_sorted_by", "rename_agg"]


def rename_agg(g: pa.Table, mapping: dict) -> pa.Table:
    """Select + rename a ``group_by().aggregate()`` output BY NAME.

    pyarrow's aggregate output column order is version-dependent (older
    releases emit aggregate columns before keys), so positional
    ``rename_columns`` would silently relabel columns across versions;
    ``mapping`` is {generated_name: wanted_name} and also fixes the order.
    """
    return g.select(list(mapping)).rename_columns(list(mapping.values()))


def col_to_numpy(col) -> np.ndarray:
    """ChunkedArray/Array -> contiguous ndarray; float nulls become NaN,
    timestamps become datetime64 (later int64-viewed by the kernels)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        arr = col.to_numpy(zero_copy_only=False)
    else:
        try:
            arr = col.to_numpy(zero_copy_only=True)
        except pa.ArrowInvalid:
            arr = col.to_numpy(zero_copy_only=False)
    return np.ascontiguousarray(arr)


def table_sorted_by(tbl: pa.Table, col: str) -> pa.Table:
    """Stable ascending sort by one column (deterministic tie order)."""
    import pyarrow.compute as pc

    idx = pc.sort_indices(tbl, sort_keys=[(col, "ascending")])
    return tbl.take(idx)
