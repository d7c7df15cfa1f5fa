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
from ..arrow_utils import group_codes, make_add_part

__all__ = ["asof_join", "interval_count_join", "anti_join",
           "last_touch_attribution", "hash_inner_join"]


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

    mod = num_partitions * 64

    _add_part = make_add_part(on, mod)

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
        codes_arr = group_codes(key)
        change = np.ones(n, dtype=bool)
        change[1:] = codes_arr[1:] != codes_arr[:-1]
        seg_start = np.maximum.accumulate(
            np.where(change, np.arange(n), -1))
        # latest right-row position at or before each row, within segment
        pos_right = np.where(~is_left, np.arange(n), -1)
        cand = np.maximum.accumulate(pos_right)
        valid = (cand >= seg_start) & is_left
        # group_codes groups null keys as one -1 segment, but SQL ASOF
        # 'l.key = r.key' NEVER matches NULL — null-key left rows emit
        # null right columns (anti_join documents the same rule)
        valid &= codes_arr != -1
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


def interval_count_join(points_ds, intervals_ds, *, cell_us: int,
                        x_col: str = "x", val_col: str | None = None,
                        ivl_id_col: str = "ivl_id",
                        start_col: str = "start_us",
                        end_col: str = "end_us",
                        max_cells: int = 64,
                        num_partitions: int = 16):
    """Temporal overlap (range) join without an equi-key, aggregated: for
    every interval ``[start, end]`` (inclusive, integer microseconds)
    count the points with ``start <= x <= end`` — plus ``sum_val`` over an
    optional int64 point column. LEFT-join semantics: every interval
    appears, zero-match intervals report 0/0.

    Scale shape (grid bucketing — both sides can be arbitrarily large, no
    broadcast): time is cut into ``cell_us`` cells; each point belongs to
    exactly ONE cell, each interval is replicated to the <= ``max_cells``
    cells it overlaps (raise otherwise — pick ``cell_us`` near the typical
    interval length). Both sides hash-shuffle ONCE on the cell id; inside
    a partition the points are sorted once by x and every interval replica
    resolves via two ``np.searchsorted`` probes against its cell-clipped
    bounds (a prefix-sum turns range sums into two lookups). A point's
    cell is unique, so each (interval, point) match is produced exactly
    once — partials then merge in a second, interval-sized shuffle.

    SQL restatement: ``LEFT JOIN ON p.x BETWEEN i.start AND i.end`` +
    ``GROUP BY interval``. Reference has no counterpart (kernel library);
    mandated by the build brief's custom-operator list ("range join")."""

    mod = num_partitions * 64
    cw = int(cell_us)
    has_val = val_col is not None

    def _points(b: pa.Table) -> pa.Table:
        x = pc.cast(b[x_col], pa.int64())
        xs = x.to_numpy(zero_copy_only=False)
        cols = {
            "__cell": pa.array(xs // cw),
            "__side": pa.array(np.zeros(b.num_rows, dtype=np.int8)),
            "__x": x,
            "__val": (pc.cast(b[val_col], pa.int64()) if has_val
                      else pa.nulls(b.num_rows, pa.int64())),
            "__ivl": pa.nulls(b.num_rows, pa.int64()),
            "__start": pa.nulls(b.num_rows, pa.int64()),
            "__end": pa.nulls(b.num_rows, pa.int64()),
        }
        return pa.table(cols)

    def _intervals(b: pa.Table) -> pa.Table:
        s = pc.cast(b[start_col], pa.int64()).to_numpy(zero_copy_only=False)
        e = pc.cast(b[end_col], pa.int64()).to_numpy(zero_copy_only=False)
        if np.any(e < s):
            raise ValueError("interval_count_join: end < start")
        c0 = s // cw
        ncells = e // cw - c0 + 1
        if ncells.max(initial=0) > max_cells:
            raise ValueError(
                f"interval_count_join: an interval overlaps "
                f"{int(ncells.max())} cells > max_cells={max_cells}; "
                f"raise cell_us or max_cells")
        idx = np.repeat(np.arange(len(s)), ncells)
        run_starts = np.cumsum(ncells) - ncells
        cell = c0[idx] + (np.arange(len(idx)) - run_starts[idx])
        ivl = pc.cast(b[ivl_id_col], pa.int64()).take(pa.array(idx))
        n = len(idx)
        return pa.table({
            "__cell": pa.array(cell),
            "__side": pa.array(np.ones(n, dtype=np.int8)),
            "__x": pa.nulls(n, pa.int64()),
            "__val": pa.nulls(n, pa.int64()),
            "__ivl": ivl,
            "__start": pa.array(s[idx]),
            "__end": pa.array(e[idx]),
        })

    tagged = points_ds.map_batches(_points, batch_format="pyarrow").union(
        intervals_ds.map_batches(_intervals, batch_format="pyarrow"))

    _add_part = make_add_part("__cell", mod)

    def _empty_partial() -> pa.Table:
        return pa.table({
            "__ivl": pa.array([], pa.int64()),
            "__start": pa.array([], pa.int64()),
            "__end": pa.array([], pa.int64()),
            "n_points": pa.array([], pa.int64()),
            "sum_val": pa.array([], pa.int64()),
        })

    def _match(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _empty_partial()
        side = g["__side"].to_numpy(zero_copy_only=False)
        pts = g.filter(pa.array(side == 0))
        ivm = g.filter(pa.array(side == 1))
        if ivm.num_rows == 0:
            return _empty_partial()
        xs = pts["__x"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(xs, kind="stable")
        xs = xs[order]
        if has_val and pts.num_rows:
            vs = pts["__val"].to_numpy(zero_copy_only=False).astype(
                np.int64)[order]
            pre = np.concatenate([[0], np.cumsum(vs)])
        else:
            pre = np.zeros(len(xs) + 1, dtype=np.int64)
        cell = ivm["__cell"].to_numpy(zero_copy_only=False)
        s = ivm["__start"].to_numpy(zero_copy_only=False)
        e = ivm["__end"].to_numpy(zero_copy_only=False)
        lo_b = np.maximum(s, cell * cw)
        hi_b = np.minimum(e, cell * cw + cw - 1)
        lo = np.searchsorted(xs, lo_b, side="left")
        hi = np.searchsorted(xs, hi_b, side="right")
        n = np.maximum(hi - lo, 0)
        sv = np.where(n > 0, pre[np.maximum(hi, lo)] - pre[lo], 0)
        part = pa.table({
            "__ivl": ivm["__ivl"], "__start": ivm["__start"],
            "__end": ivm["__end"], "n": pa.array(n.astype(np.int64)),
            "sv": pa.array(sv.astype(np.int64)),
        }).group_by(["__ivl"]).aggregate(
            [("__start", "min"), ("__end", "min"),
             ("n", "sum"), ("sv", "sum")])
        return pa.table({
            "__ivl": part["__ivl"], "__start": part["__start_min"],
            "__end": part["__end_min"],
            "n_points": pc.cast(part["n_sum"], pa.int64()),
            "sum_val": pc.cast(part["sv_sum"], pa.int64()),
        })

    partials = tagged.map_batches(
        _add_part, batch_format="pyarrow").repartition(
        num_partitions).groupby("__part").map_groups(
        _match, batch_format="pyarrow")

    _add_part2 = make_add_part("__ivl", mod)

    def _merge(g: pa.Table) -> pa.Table:
        out_empty = pa.table({
            ivl_id_col: pa.array([], pa.int64()),
            start_col: pa.array([], pa.int64()),
            end_col: pa.array([], pa.int64()),
            "n_points": pa.array([], pa.int64()),
            "sum_val": pa.array([], pa.int64()),
        })
        if g.num_rows == 0:
            return out_empty
        m = g.group_by(["__ivl"]).aggregate(
            [("__start", "min"), ("__end", "min"),
             ("n_points", "sum"), ("sum_val", "sum")])
        return pa.table({
            ivl_id_col: m["__ivl"], start_col: m["__start_min"],
            end_col: m["__end_min"],
            "n_points": pc.cast(m["n_points_sum"], pa.int64()),
            "sum_val": pc.cast(m["sum_val_sum"], pa.int64()),
        })

    return partials.map_batches(
        _add_part2, batch_format="pyarrow").repartition(
        num_partitions).groupby("__part").map_groups(
        _merge, batch_format="pyarrow")


def anti_join(left_ds, right_ds, *, on: str, num_partitions: int = 16):
    """Distributed anti semi-join: the left rows whose ``on`` key appears
    NOWHERE in the right side (``WHERE NOT EXISTS``). The exact
    complement of a semi-join — referential-integrity orphan audits,
    "never-purchased parts", blocklist subtraction with full-row output.

    Scale shape: the right side is reduced map-side to its DISTINCT keys
    per block (no payload travels), both sides union under ONE hash(key)
    shuffle, and each partition resolves membership in one vectorized
    pass — dictionary-encode the combined key column once, bincount the
    right codes, keep the left rows whose code count is zero. No
    broadcast (unlike the Bloom runtime filter, this is exact with
    arbitrarily large right sides), no driver materialization.

    Left payload columns pass through unchanged; left rows with a null
    key are kept only if the right side has no null key (SQL NOT EXISTS
    on an equality predicate never matches nulls — so null-keyed left
    rows are ALWAYS kept, and we match that)."""

    mod = num_partitions * 64
    lsch = left_ds.schema()
    ltypes = dict(zip(lsch.names, lsch.types))
    lpay = [c for c in lsch.names if c != on]
    key_t = ltypes[on]

    def _tag_left(b: pa.Table) -> pa.Table:
        cols = {on: b[on],
                "__side": pa.array(np.zeros(b.num_rows, dtype=np.int8))}
        for c in lpay:
            cols[c] = b[c]
        return pa.table(cols)

    def _tag_right(b: pa.Table) -> pa.Table:
        # distinct keys per block; drop nulls (they never match equality)
        k = pc.unique(b[on])
        k = k.filter(pc.is_valid(k))
        k = pc.cast(k, key_t)
        n = len(k)
        cols = {on: k, "__side": pa.array(np.ones(n, dtype=np.int8))}
        for c in lpay:
            cols[c] = pa.nulls(n, ltypes[c])
        return pa.table(cols)

    tagged = left_ds.map_batches(_tag_left, batch_format="pyarrow").union(
        right_ds.map_batches(_tag_right, batch_format="pyarrow"))

    _add_part = make_add_part(on, mod)

    def _filter(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__part"])
        side = g["__side"].to_numpy(zero_copy_only=False) \
            if g.num_rows else np.array([], dtype=np.int8)
        if g.num_rows == 0:
            return g.drop_columns(["__side"])
        key = g[on]
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        enc = key.dictionary_encode()
        idx = enc.indices
        codes = (idx.fill_null(-1) if idx.null_count else idx) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        nuniq = len(enc.dictionary)
        right_codes = codes[side == 1]
        hit = np.zeros(nuniq + 1, dtype=bool)
        hit[right_codes] = True  # right side never carries nulls (-1)
        keep = (side == 0) & ~hit[codes]  # null left keys: codes=-1 slot
        return g.filter(pa.array(keep)).drop_columns(["__side"])

    parted = tagged.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _filter, batch_format="pyarrow")


def last_touch_attribution(events_ds, *, on: str = "user_id",
                           x_col: str = "ts_us", id_col: str = "event_id",
                           type_col: str = "event_type",
                           target: str = "purchase",
                           window_us: int = 3_600_000_000,
                           num_partitions: int = 8, fanin: int = 2):
    """Marketing last-touch attribution: every ``target`` event credits
    the SAME user's most recent non-target event within ``window_us``
    (ties at equal timestamp break by the larger event id — the exact
    ``max_by(type, struct(x, id))`` SQL semantic, so the operator is
    deterministic where a plain as-of would not be). Unattributed
    targets count under ``'none'``. Returns ``(event_type, n)``.

    Scale shape: ONE hash(user) shuffle; per partition one sorted pass —
    non-target rows sort before targets at equal x, a
    ``np.maximum.accumulate`` finds each target's latest predecessor,
    and the partition collapses to per-type partial counts (bounded by
    the type vocabulary) before a tiny grouped sum."""
    from .graph import grouped_sum_parts

    mod = num_partitions * 64

    _add_part = make_add_part(on, mod)

    def _attrib(g: pa.Table) -> pa.Table:
        empty = pa.table({"event_type": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        t = g.drop_columns(["__part"])
        if t.num_rows == 0:
            return empty
        # a null event_type is a non-target source labelled 'none' (the
        # documented fallback) — fill BEFORE the target test, where a
        # null would otherwise poison both __side and the final label
        t = t.set_column(t.schema.get_field_index(type_col), type_col,
                         pc.fill_null(t[type_col], "none"))
        is_tgt_arr = pc.equal(t[type_col], target)
        side = pc.cast(is_tgt_arr, pa.int8())  # right(0) before left(1)
        t = t.append_column("__side", side)
        t = t.take(pc.sort_indices(t, sort_keys=[
            (on, "ascending"), (x_col, "ascending"),
            ("__side", "ascending"), (id_col, "ascending")]))
        uid = t[on]
        if isinstance(uid, pa.ChunkedArray):
            uid = uid.combine_chunks()
        codes = group_codes(uid)
        x = t[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        is_tgt = t["__side"].to_numpy(zero_copy_only=False).astype(bool)
        n = len(x)
        change = np.ones(n, dtype=bool)
        change[1:] = codes[1:] != codes[:-1]
        seg_first = np.flatnonzero(change)
        seg_of = np.cumsum(change) - 1
        lastsrc = np.maximum.accumulate(
            np.where(~is_tgt, np.arange(n), -1))
        tgt_idx = np.flatnonzero(is_tgt)
        src = lastsrc[tgt_idx]
        ok = (src >= seg_first[seg_of[tgt_idx]]) & (src >= 0)
        # group_codes groups null users as one -1 segment, but the SQL
        # equality semantic never matches NULL — null-user targets
        # count under 'none'
        ok &= codes[tgt_idx] != -1
        ok &= np.where(ok, x[tgt_idx] - x[np.maximum(src, 0)]
                       <= window_us, False)
        types = t[type_col]
        if isinstance(types, pa.ChunkedArray):
            types = types.combine_chunks()
        attributed = types.take(pa.array(np.maximum(src, 0)))
        lab = np.where(ok, attributed.to_numpy(zero_copy_only=False),
                       "none")
        labels = pa.array(lab.astype(str))
        enc = labels.dictionary_encode()
        cnt = np.bincount(enc.indices.to_numpy(zero_copy_only=False),
                          minlength=len(enc.dictionary))
        return pa.table({"event_type": enc.dictionary,
                         "n": pa.array(cnt.astype(np.int64))})

    parted = events_ds.map_batches(_add_part, batch_format="pyarrow")
    partials = parted.repartition(num_partitions).groupby(
        "__part").map_groups(_attrib, batch_format="pyarrow")
    return grouped_sum_parts(partials, ["event_type"], ["n"],
                             count_col=None, fanin=fanin)


def hash_inner_join(left_ds, right_ds, *, on: str, right_on: str | None
                    = None, num_partitions: int = 8):
    """Generic single-key inner hash join via the tagged-union
    discipline this module (and ``dedup.join_pair_payload``) uses
    instead of ``Dataset.join``: each acero ``Dataset.join`` spins up
    its own aggregator actor pool plus a barrier, which dominates
    small-to-medium joins at toy scale (measured in the r4->r5
    near-dup work: two joins + barrier were ~6.7 s of a 10.7 s query).
    Here both relations are tagged, union'd, hash-partitioned ONCE on
    the key, and inner-joined with Arrow ``Table.join`` inside each
    co-located group — identical shuffle volume and skew behavior, no
    extra actor pools.

    Contract: column names must be disjoint apart from the key (rename
    before calling); the right key column is dropped; output carries
    the left key name. Nulls in either key never match (SQL inner-join
    semantics — ``stable_part_codes`` routes them to a partition but
    ``Table.join`` drops them from the inner result)."""
    from ..arrow_utils import stable_part_codes

    right_on = right_on or on
    lsch = left_ds.schema()
    rsch = right_ds.schema()
    ltypes = dict(zip(lsch.names, lsch.types))
    rtypes = dict(zip(rsch.names, rsch.types))
    lcols = [c for c in lsch.names if c != on]
    rcols = [c for c in rsch.names if c != right_on]
    clash = (set(lcols) & set(rcols)) | ({on} & set(rcols))
    if clash:
        raise ValueError(f"hash_inner_join: overlapping columns {clash}")
    ktype = ltypes[on]
    nparts = num_partitions * 16

    def _tag_left(b: pa.Table) -> pa.Table:
        cols = {"__k": b[on]}
        for c in lcols:
            cols[c] = b[c]
        for c in rcols:
            cols[c] = pa.nulls(b.num_rows, rtypes[c])
        cols["__side"] = pa.array(np.zeros(b.num_rows, np.int8))
        cols["__part"] = pa.array(
            stable_part_codes(b[on], nparts), pa.int32())
        return pa.table(cols)

    def _tag_right(b: pa.Table) -> pa.Table:
        cols = {"__k": b[right_on].cast(ktype)}
        for c in lcols:
            cols[c] = pa.nulls(b.num_rows, ltypes[c])
        for c in rcols:
            cols[c] = b[c]
        cols["__side"] = pa.array(np.ones(b.num_rows, np.int8))
        cols["__part"] = pa.array(
            stable_part_codes(b[right_on], nparts), pa.int32())
        return pa.table(cols)

    def _merge(g: pa.Table) -> pa.Table:
        is_r = pc.equal(g["__side"], 1)
        rt = g.filter(is_r).select(["__k"] + rcols)
        lt = g.filter(pc.invert(is_r)).select(["__k"] + lcols)
        j = lt.join(rt, keys=["__k"], join_type="inner")
        out = {on: j["__k"]}
        for c in lcols + rcols:
            out[c] = j[c]
        return pa.table(out)

    tagged = left_ds.map_batches(_tag_left, batch_format="pyarrow").union(
        right_ds.map_batches(_tag_right, batch_format="pyarrow"))
    return tagged.repartition(num_partitions).groupby("__part").map_groups(
        _merge, batch_format="pyarrow")
