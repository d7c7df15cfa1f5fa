"""Change-data-capture compaction: latest-wins upsert merge with delete
tombstones — the LSM/merge-on-read primitive every mutable-table engine
(Hudi/Iceberg/Delta, TimescaleDB compress) carries and a kernel library
like the reference (kernel-only: no counterpart) does not.

Semantics: the input is a change log; each row is an upsert (or a delete
when its tombstone flag is set) for its key. The survivor per key is the
row with the greatest ``order_cols`` tuple (descending lexicographic,
ties impossible when the last order col is a unique id); a key whose
survivor is a tombstone disappears from the compacted table.

Scale shape — the whole point at 100 TB:

1. **map-side pre-reduce**: latest-wins is a MERGEABLE aggregate, so each
   input block first selects its own per-key survivor (one vectorized
   multi-key sort + segment-head gather). A change log with heavy
   per-key churn collapses by its churn factor BEFORE the exchange.
2. ONE hash(key) shuffle of the partials (``repartition`` +
   ``groupby("__part")``, the engine's standard contract).
3. per-partition final selection (same vectorized pass) + tombstone
   filter.

No row_number() over the full log, no global sort barrier; the exchange
carries at most one row per (block, key).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ..arrow_utils import group_codes, make_add_part

__all__ = ["upsert_latest", "survivorship_merge"]


def _survivors(t: pa.Table, key_cols: list, order_cols: list) -> pa.Table:
    """One row per key: the greatest ``order_cols`` tuple (vectorized:
    one multi-key sort, segment heads via adjacent-difference on the
    dictionary-encoded composite key)."""
    if t.num_rows == 0:
        return t
    sort_keys = ([(c, "ascending") for c in key_cols]
                 + [(c, "descending") for c in order_cols])
    t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
    # adjacent-difference across ALL key cols (composite key boundary)
    heads = np.zeros(t.num_rows, dtype=bool)
    heads[0] = True
    for c in key_cols:
        col = t[c]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        codes = group_codes(col)
        heads[1:] |= codes[1:] != codes[:-1]
    return t.take(pa.array(np.flatnonzero(heads)))


def upsert_latest(ds, *, key_cols: list, order_cols: list,
                  tombstone_col: str, num_partitions: int = 16):
    """Compact a change-log Dataset to its latest-wins survivors.

    ``tombstone_col`` is an int64 0/1 column (computed upstream by the
    caller, vectorized); surviving tombstones are dropped from the
    output, which keeps every input column except ``tombstone_col``.
    """
    from ..arrow_utils import stable_part_codes

    if not key_cols or not order_cols:
        raise ValueError("key_cols and order_cols must be non-empty")
    mod = num_partitions * 64

    def _partial(b: pa.Table) -> pa.Table:
        s = _survivors(b, key_cols, order_cols)
        # composite-key row hash: crc of the first key's uniques, further
        # keys folded with the uint64 golden-ratio mix (rollup.py's
        # multi-key discipline; string keys fold via their own crc)
        h = stable_part_codes(s[key_cols[0]], None)
        for kc in key_cols[1:]:
            v = s[kc]
            if isinstance(v, pa.ChunkedArray):
                v = v.combine_chunks()
            if pa.types.is_integer(v.type):
                vk = v.to_numpy(zero_copy_only=False).astype(np.uint64)
            else:
                vk = stable_part_codes(v, None)
            h = h * np.uint64(0x9E3779B97F4A7C15) + vk
        return s.append_column(
            "__part", pa.array((h % np.uint64(mod)).astype(np.int32)))

    def _final(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        s = _survivors(t, key_cols, order_cols)
        keep = pc.equal(s[tombstone_col], pa.scalar(0, pa.int64()))
        return s.filter(keep).drop_columns([tombstone_col])

    parted = ds.map_batches(_partial, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _final, batch_format="pyarrow")


def survivorship_merge(ds, *, key_col: str, ts_col: str,
                       id_col: str, cols: list,
                       num_partitions: int = 16):
    """Column-level survivorship (golden-record merge): per key, one row
    holding for EVERY payload column its latest NON-NULL value across
    all versions (ordered by ``(ts, id)``), plus ``n_versions`` and
    ``last_ts``. The master-data-management step ``upsert_latest``
    cannot express: row-level latest-wins drops older rows entirely,
    while survivorship back-fills each column from the newest version
    that actually populated it. A key whose every version is null in a
    column stays null there.

    Scale shape: ONE hash(key) shuffle; each partition sorts once by
    (key, ts, id) and resolves every column with one
    ``np.maximum.reduceat`` over the non-null row positions (no per-key
    or per-column Python loops beyond the constant-width column list).

    SQL restatement: ``row_number()`` version ranks + per-column
    ``max_by(col, rn) FILTER (WHERE col IS NOT NULL)``."""
    from ..arrow_utils import col_type, stable_part_codes

    mod = num_partitions * 64

    _add_part = make_add_part(key_col, mod)

    def _merge(g: pa.Table) -> pa.Table:
        kt = col_type(g, key_col)
        sch = {c: col_type(g, c)
               for c in cols}
        if g.num_rows == 0:
            return pa.table({
                "key": pa.array([], kt),
                "n_versions": pa.array([], pa.int64()),
                "last_ts": pa.array([], pa.int64()),
                **{c: pa.array([], t) for c, t in sch.items()},
            })
        t = g.take(pc.sort_indices(g, sort_keys=[
            (key_col, "ascending"), (ts_col, "ascending"),
            (id_col, "ascending")]))
        k = t[key_col]
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        enc = k.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(codes)
        heads = np.ones(n, dtype=bool)
        heads[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(heads)
        nv = np.diff(np.append(starts, n))
        ends = np.append(starts[1:], n) - 1
        ts = pc.cast(t[ts_col], pa.int64()).to_numpy(zero_copy_only=False)
        out = {
            "key": enc.dictionary.take(pa.array(codes[starts])),
            "n_versions": pa.array(nv),
            "last_ts": pa.array(ts[ends]),
        }
        rows = np.arange(n)
        for c in cols:
            col = t[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
            pos = np.where(valid, rows, -1)
            best = np.maximum.reduceat(pos, starts)
            has = best >= 0
            taken = col.take(pa.array(np.where(has, best, 0)))
            if not has.all():  # re-null keys with no populated version
                taken = pc.if_else(pa.array(has), taken,
                                   pa.nulls(len(starts), col.type))
            out[c] = taken
        return pa.table(out)

    parted = ds.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _merge, batch_format="pyarrow")
