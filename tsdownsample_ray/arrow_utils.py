"""Arrow <-> NumPy helpers shared by the stages.

Batches flow through the pipeline as ``pyarrow.Table`` (zero-copy from the
Ray object store); kernels want contiguous NumPy arrays. Arrow validity
bitmaps are converted to IEEE NaN for float columns on extraction, matching
the reference's float-NaN model (SURVEY.md §1.4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["col_to_numpy", "table_sorted_by", "rename_agg",
           "stable_part_codes", "compact_nonempty_blocks", "col_type",
           "make_add_part", "group_codes", "segment_positions"]


def col_type(t: pa.Table, col: str, default=None):
    """Type of ``t[col]`` read from the SCHEMA, so a zero-row block with
    an int64 key keeps emitting int64 on the empty path (a
    ``pa.string()`` fallback there makes empty-group output blocks
    schema-mismatch the populated ones). ``default`` (pa.string() when
    None) applies only to the schema-LESS empty blocks Ray structurally
    emits, which carry no type information at all."""
    if col in t.schema.names:
        return t.schema.field(col).type
    return pa.string() if default is None else default


def rename_agg(g: pa.Table, mapping: dict) -> pa.Table:
    """Select + rename a ``group_by().aggregate()`` output BY NAME.

    pyarrow's aggregate output column order is version-dependent (older
    releases emit aggregate columns before keys), so positional
    ``rename_columns`` would silently relabel columns across versions;
    ``mapping`` is {generated_name: wanted_name} and also fixes the order.
    """
    return g.select(list(mapping)).rename_columns(list(mapping.values()))


def stable_part_codes(col, mod: int | None) -> np.ndarray:
    """Deterministic hash per row: crc32 over the DICTIONARY-ENCODED
    uniques (O(uniques) hashing, not O(rows)), null-safe — a null key
    hashes like the string 'None' (matching the historical
    ``crc32(str(s))`` row hash; a null index would otherwise surface as
    NaN->-2^63 and crash the take). Returns int32 codes in ``[0, mod)``,
    or the raw uint64 crc values when ``mod`` is None."""
    import zlib

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    d = col.dictionary_encode()
    crcs = [zlib.crc32(str(s).encode()) for s in d.dictionary.to_pylist()]
    crcs.append(zlib.crc32(b"None"))  # slot -1: null rows
    u = np.array(crcs, dtype=np.uint64)
    if mod is not None:
        u = (u % np.uint64(mod)).astype(np.int32)
    idx = d.indices
    if idx.null_count:
        idx = idx.fill_null(-1)
    codes = idx.to_numpy(zero_copy_only=False).astype(np.int64)
    return u[codes]


def compact_nonempty_blocks(mat_ds):
    """MATERIALIZED dataset -> new dataset holding only its non-empty
    blocks (zero-copy: the same object-store refs, re-listed).

    ``groupby().map_groups`` emits a SCHEMA-LESS empty block for every
    reduce partition that received no rows, and a map task whose generator
    yields nothing still materializes one schema-less empty block (Ray
    2.49) — so no map stage can remove them. Downstream, Ray's unified
    ``Dataset.schema()`` may pick the empty block's (absent) schema and
    the hash-shuffle join then fails to resolve its key column (acero:
    "No match ... FieldRef.Name(...)"). Re-listing the non-empty block
    refs sidesteps both. Returns None when every block is empty (a
    zero-block dataset has no schema at all — callers short-circuit)."""
    import ray
    import ray.data as rd

    refs = []
    for bundle in mat_ds.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            if meta.num_rows:
                refs.append(ref)
    if not refs:
        return None
    return rd.from_arrow_refs(refs)


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


def make_add_part(col: str, mod: int):
    """The ``__part``-stamping map fn shared by every hashpart stage:
    int32 codes in ``[0, mod)`` from the stable key hash (dense part
    space -> bounded reducers; ``mod = num_partitions * 64`` by
    convention)."""
    def _add_part(b: pa.Table) -> pa.Table:
        h = stable_part_codes(b[col], None)
        return b.append_column(
            "__part", pa.array((h % np.uint64(mod)).astype(np.int32)))
    return _add_part


def group_codes(col) -> np.ndarray:
    """Dictionary codes of a key column as int64, null rows coded -1
    (equality-based segmentation then groups nulls as their own
    segment). THE one way to derive group codes: a raw
    ``dictionary_encode().indices.to_numpy().astype(int64)`` on a
    null-bearing column is platform-dependent garbage (NaN -> INT64_MIN
    on x86, 0 on aarch64 — see :func:`segment_positions`'s null-key
    note), which would silently merge null rows into a real group."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    idx = col.dictionary_encode().indices
    if idx.null_count:
        idx = idx.fill_null(-1)
    return idx.to_numpy(zero_copy_only=False).astype(np.int64)


def segment_positions(codes):
    """Shared segment bookkeeping for sorted per-group passes: given
    monotone group codes (rows pre-sorted by group), returns
    ``(seg, seg_of_row, pos)`` — segment start indices, each row's
    segment index, and each row's 0-based position within its segment.
    Null-key note: callers derive ``codes`` from
    ``dictionary_encode().indices``; fill nulls BEFORE the astype or a
    null index becomes garbage."""
    import numpy as np

    heads = np.ones(len(codes), dtype=bool)
    heads[1:] = codes[1:] != codes[:-1]
    seg = np.flatnonzero(heads)
    seg_of_row = np.cumsum(heads) - 1
    pos = np.arange(len(codes)) - seg[seg_of_row]
    return seg, seg_of_row, pos
