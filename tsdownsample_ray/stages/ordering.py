"""Deterministic global training order: rank every document by a salted
hash — the reproducible corpus shuffle a training run consumes (same
salt -> same order on any cluster size; a new salt is a fresh epoch
permutation).

No counterpart in the reference; training-data layer. Built on the
GF(2^61-1) multiply-xorshift hash from ``stages/sampling.py`` (already
SQL-replayed there), so shuffle order, sampling and splits all derive
from one hash family.

Scale shape: global rank = hash-range bucketing + a distributed prefix
sum, never a single total sort:

1. map-side: ``h = hash61(id, salt)``, bucket = top bits of h;
2. per-bucket row counts (tiny table) -> ONE scan task -> ``ray.put``
   broadcast of bucket offsets (``stages/packing.py``'s prefix-sum
   discipline);
3. ONE hash... RANGE shuffle by bucket; each partition sorts its
   buckets' rows by (h, id) and adds the broadcast offset — global rank
   without a global sort barrier.

Rank ties cannot occur between distinct ids with distinct hashes; equal
hashes (astronomically rare, but the 61-bit space does collide at 10^12
docs) break by id, which the SQL oracle replays.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..arrow_utils import make_add_part
import pyarrow.compute as pc

__all__ = ["training_order", "group_concat"]


def training_order(ds, *, id_col: str = "doc_id", salt: int = 0,
                   num_buckets: int = 256):
    """Returns one row per input row: ``(id_col, shuffle_rank)`` with
    ``shuffle_rank`` the 0-based position in (hash61(id, salt), id)
    order. Parallelism of the ranking exchange == the number of hash
    buckets (``num_buckets``)."""
    import ray

    from .sampling import hash61

    shift = 61 - int(num_buckets - 1).bit_length()

    def _hb(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = hash61(ids, salt)
        bucket = (h >> np.uint64(shift)).astype(np.int64)
        return pa.table({id_col: b[id_col],
                         "__h": pa.array(h.astype(np.int64)),
                         "__bucket": pa.array(bucket)})

    hashed = ds.map_batches(_hb, batch_format="pyarrow").materialize()

    def _counts(b: pa.Table) -> pa.Table:
        g = b.select(["__bucket"]).group_by(["__bucket"]).aggregate(
            [("__bucket", "count")])
        return pa.table({"__bucket": g["__bucket"],
                         "c": pc.cast(g["__bucket_count"], pa.int64())})

    partials = hashed.map_batches(_counts, batch_format="pyarrow")

    def _scan(b: pa.Table) -> pa.Table:
        g = b.group_by(["__bucket"]).aggregate([("c", "sum")])
        buckets = g["__bucket"].to_numpy(zero_copy_only=False)
        totals = g["c_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(buckets, kind="stable")
        offs = np.zeros(len(order), dtype=np.int64)
        offs[1:] = np.cumsum(totals[order])[:-1]
        return pa.table({"__bucket": pa.array(buckets[order]),
                         "off": pa.array(offs)})

    off_tbl = pa.concat_tables(list(
        partials.repartition(1).map_batches(
            _scan, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow")))
    off_ref = ray.put({int(b): int(o) for b, o in
                       zip(off_tbl["__bucket"].to_pylist(),
                           off_tbl["off"].to_pylist())})

    def _rank(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "shuffle_rank": pa.array([], pa.int64())})
        t = g.take(pc.sort_indices(g, sort_keys=[
            ("__bucket", "ascending"), ("__h", "ascending"),
            (id_col, "ascending")]))
        offs = ray.get(off_ref)
        bkt = t["__bucket"].to_numpy(zero_copy_only=False)
        from ..arrow_utils import segment_positions

        seg, seg_of_row, pos = segment_positions(bkt)
        base = np.array([offs[int(b)] for b in bkt[seg]], dtype=np.int64)
        rank = base[seg_of_row] + pos
        return pa.table({id_col: t[id_col],
                         "shuffle_rank": pa.array(rank)})

    # a bucket must land wholly in one group: groupby(__bucket) ranges it
    return hashed.groupby("__bucket").map_groups(
        _rank, batch_format="pyarrow")


def group_concat(ds, *, group_col: str, val_col: str, k: int,
                 sep: str = ",", num_partitions: int = 16):
    """Deterministic ordered string aggregation with a per-group cap:
    for every group, the first ``k`` values (ascending, as strings)
    joined by ``sep``, plus the group's TOTAL row count — the
    "show me example members per group" audit (sample URLs per domain,
    example doc ids per language) without ever materializing a group's
    full membership into one string.

    Scale shape: ONE hash(group) shuffle; each partition sorts once by
    (group, val) and derives every group's rank mask, the capped
    member ListArray (built from segment offsets, zero-copy over the
    sorted string column) and the join in vectorized Arrow calls
    (``pc.binary_join``); counts come from the pre-filter segment
    sizes. No per-group Python, no unbounded string growth (output is
    <= k values per group by construction).

    SQL restatement: ``row_number() OVER (PARTITION BY g ORDER BY v)``
    cap + ``string_agg(v, sep ORDER BY v)`` + a COUNT join."""
    from ..arrow_utils import col_type, stable_part_codes

    mod = num_partitions * 64

    _add_part = make_add_part(group_col, mod)

    def _concat(g: pa.Table) -> pa.Table:
        gt = col_type(g, group_col)
        empty = pa.table({
            "group_id": pa.array([], gt),
            "n": pa.array([], pa.int64()),
            "sample": pa.array([], pa.string()),
        })
        if g.num_rows == 0:
            return empty
        vals = pc.cast(g[val_col], pa.string())
        t = pa.table({"g": g[group_col], "v": vals})
        t = t.take(pc.sort_indices(
            t, sort_keys=[("g", "ascending"), ("v", "ascending")]))
        gcol = t["g"]
        if isinstance(gcol, pa.ChunkedArray):
            gcol = gcol.combine_chunks()
        enc = gcol.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(codes)
        heads = np.ones(n, dtype=bool)
        heads[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(heads)
        sizes = np.diff(np.append(starts, n))
        rank = np.arange(n) - starts[np.cumsum(heads) - 1]
        keepmask = rank < k
        v = t["v"]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        kept = v.filter(pa.array(keepmask))
        capped = np.minimum(sizes, k)
        offsets = np.concatenate([[0], np.cumsum(capped)]).astype(np.int32)
        lists = pa.ListArray.from_arrays(pa.array(offsets), kept)
        joined = pc.binary_join(lists, sep)
        return pa.table({
            "group_id": enc.dictionary.take(pa.array(codes[starts])),
            "n": pa.array(sizes),
            "sample": joined,
        })

    parted = ds.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _concat, batch_format="pyarrow")
