"""Interval-set operators: union / coverage (gaps-and-islands merge).

No counterpart in the reference (a kernel library; see SURVEY.md §2.4);
mandated by the build brief's custom-operator list. Classic uses: total
user-activity time from per-event activity windows, SLA uptime from
incident intervals, covered-airtime audits.

Scale shape: ONE hash(series) shuffle, then each partition runs a single
vectorized sweep-line pass over ALL its series at once. The sweep needs
no per-series reset: every interval contributes a +1 at ``start`` and a
-1 at ``end``, so the running depth returns to exactly 0 at each series
boundary — ``np.cumsum`` over the (series, pos, +1-first) sorted deltas
is already the per-series depth. Island starts are 0→1 transitions,
ends are 1→0; the k-th start pairs with the k-th end, so per-island
lengths and per-series reductions are plain ``np.*.reduceat`` calls.
No per-row or per-series Python.

Intervals are half-open ``[start, end)`` integer microseconds; touching
intervals (``next.start == prev.end``) merge (the +1 sorts before the
-1 at equal positions). Zero-length intervals (``end <= start``) cover
nothing and are dropped before the sweep."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..arrow_utils import make_add_part
import pyarrow.compute as pc

__all__ = ["interval_union", "activity_selection",
           "allen_relations"]


def interval_union(ds, *, series_col: str = "series_id",
                   start_col: str = "start_us", end_col: str = "end_us",
                   num_partitions: int = 16):
    """Merge each series' overlapping-or-touching ``[start, end)``
    intervals into islands and reduce: ``(series_id, n_intervals,
    n_islands, covered_us, max_island_us)``.

    SQL restatement: gaps-and-islands — break where ``start >
    max(end) OVER (... ROWS ... 1 PRECEDING)``, then two GROUP BYs."""
    from ..arrow_utils import stable_part_codes

    mod = num_partitions * 64

    _add_part = make_add_part(series_col, mod)

    def _sweep(g: pa.Table) -> pa.Table:
        sid_type = g[series_col].type
        empty = pa.table({
            "series_id": pa.array([], sid_type),
            "n_intervals": pa.array([], pa.int64()),
            "n_islands": pa.array([], pa.int64()),
            "covered_us": pa.array([], pa.int64()),
            "max_island_us": pa.array([], pa.int64()),
        })
        if g.num_rows == 0:
            return empty
        s = pc.cast(g[start_col], pa.int64()).to_numpy(zero_copy_only=False)
        e = pc.cast(g[end_col], pa.int64()).to_numpy(zero_copy_only=False)
        live = e > s  # zero/negative length covers nothing
        g = g.filter(pa.array(live))
        if g.num_rows == 0:
            return empty
        s, e = s[live], e[live]
        sid = g[series_col]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        enc = sid.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(s)
        # sweep events: (+1 at start sorts before -1 at end on ties)
        ev_sid = np.concatenate([codes, codes])
        ev_pos = np.concatenate([s, e])
        ev_delta = np.concatenate([np.ones(n, dtype=np.int64),
                                   np.full(n, -1, dtype=np.int64)])
        order = np.lexsort((-ev_delta, ev_pos, ev_sid))
        ev_sid, ev_pos, ev_delta = (ev_sid[order], ev_pos[order],
                                    ev_delta[order])
        depth = np.cumsum(ev_delta)  # per-series: each series nets to 0
        is_start = (ev_delta == 1) & (depth == 1)
        is_end = (ev_delta == -1) & (depth == 0)
        isl_sid = ev_sid[is_start]
        isl_len = ev_pos[is_end] - ev_pos[is_start]
        # per-series reductions over the (already sid-sorted) islands
        heads = np.ones(len(isl_sid), dtype=bool)
        heads[1:] = isl_sid[1:] != isl_sid[:-1]
        starts = np.flatnonzero(heads)
        n_islands = np.diff(np.append(starts, len(isl_sid)))
        covered = np.add.reduceat(isl_len, starts)
        max_isl = np.maximum.reduceat(isl_len, starts)
        # n_intervals per series, aligned to the same series order
        uniq_codes = isl_sid[starts]
        n_ivls = np.bincount(codes, minlength=int(codes.max()) + 1)
        return pa.table({
            "series_id": enc.dictionary.take(pa.array(uniq_codes)),
            "n_intervals": pa.array(n_ivls[uniq_codes]),
            "n_islands": pa.array(n_islands),
            "covered_us": pa.array(covered),
            "max_island_us": pa.array(max_isl),
        })

    parted = ds.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _sweep, batch_format="pyarrow")


def activity_selection(ds, *, key_col: str = "user_id",
                       start_col: str = "start", end_col: str = "end",
                       num_partitions: int = 8):
    """Greedy maximum non-overlapping interval selection per key — the
    classic activity-selection algorithm (earliest-finish-first, optimal
    by the standard exchange argument): intervals sorted by
    ``(end, start)``, an interval is SELECTED iff its start is at or
    after the last selected end (touching allowed). Output one row per
    key: ``(key_col, n_intervals, n_selected, last_end)``.

    The running last-selected-end jumps data-dependently (no prefix
    identity — same contract as ``compress.deadband_filter``), so the
    per-key pass is sequential; parallel across keys after ONE
    hash(key) shuffle. The SQL oracle replays the walk with a
    recursive CTE over the same (end, start) order. Contract: per-key
    interval counts bounded (the per-user/session scale), not
    corpus-bounded."""
    from ..arrow_utils import group_codes

    mod = num_partitions * 64
    _add_part = make_add_part(key_col, mod)

    def _select(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        k_type = t[key_col].type
        empty = pa.table({key_col: pa.array([], k_type),
                          "n_intervals": pa.array([], pa.int64()),
                          "n_selected": pa.array([], pa.int64()),
                          "last_end": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        t = t.take(pc.sort_indices(t, sort_keys=[
            (key_col, "ascending"), (end_col, "ascending"),
            (start_col, "ascending")]))
        keys = t[key_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        codes = group_codes(keys)
        s = t[start_col].to_numpy(zero_copy_only=False).astype(np.int64)
        e = t[end_col].to_numpy(zero_copy_only=False).astype(np.int64)
        heads = np.ones(len(codes), dtype=bool)
        heads[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(heads)
        ends = np.r_[starts[1:], len(codes)]
        sl, el = s.tolist(), e.tolist()
        n_sel = np.zeros(len(starts), dtype=np.int64)
        last = np.zeros(len(starts), dtype=np.int64)
        for gi, (f, l) in enumerate(zip(starts, ends)):
            cnt = 0
            last_end = None
            for i in range(f, l):  # per-key greedy chain
                if last_end is None or sl[i] >= last_end:
                    cnt += 1
                    last_end = el[i]
            n_sel[gi] = cnt
            last[gi] = last_end
        return pa.table({
            key_col: keys.take(pa.array(starts)),
            "n_intervals": pa.array((ends - starts).astype(np.int64)),
            "n_selected": pa.array(n_sel),
            "last_end": pa.array(last)})

    parted = ds.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _select, batch_format="pyarrow")


ALLEN_LABELS = ("before", "meets", "overlaps", "finished_by", "contains",
                "starts", "equals", "started_by")


def allen_relations(ds, *, key_col: str = "user_id", start_col: str = "start",
                    end_col: str = "end", tiebreak_col: str = "event_id",
                    num_partitions: int = 8):
    """Classify every CONSECUTIVE interval pair per key into its Allen
    interval-algebra relation (Allen 1983). With pairs ordered by
    ``(start, tiebreak)`` the earlier interval ``a`` has
    ``a.start <= b.start``, so exactly the 8 forward relations can
    occur: ``before / meets / overlaps / finished_by / contains``
    (a.start < b.start, split on b.start vs a.end then b.end vs a.end)
    and ``starts / equals / started_by`` (a.start = b.start, split on
    the ends). Pure int64 comparisons — trivially exact.

    Output: ``(relation, n_pairs)`` global counts (relations with zero
    pairs are omitted).

    Scale shape: ONE hash(key) shuffle, per-partition sort + one
    vectorized comparison pass over all keys at once (lag via shifted
    views, key boundaries masked), then a tiny <= 8-row-per-partition
    funnel merged in one final block."""
    mod = num_partitions * 64

    _add_part = make_add_part(key_col, mod)

    def _classify(g: pa.Table) -> pa.Table:
        empty = pa.table({"relation": pa.array([], pa.string()),
                          "n_pairs": pa.array([], pa.int64())})
        t = g.drop_columns(["__part"])
        if t.num_rows < 2:
            return empty
        t = t.take(pc.sort_indices(t, sort_keys=[
            (key_col, "ascending"), (start_col, "ascending"),
            (tiebreak_col, "ascending")]))
        from ..arrow_utils import group_codes

        codes = group_codes(t[key_col] if not isinstance(
            t[key_col], pa.ChunkedArray) else t[key_col].combine_chunks())
        s = t[start_col].to_numpy(zero_copy_only=False).astype(np.int64)
        e = t[end_col].to_numpy(zero_copy_only=False).astype(np.int64)
        same = codes[1:] == codes[:-1]
        a_s, a_e = s[:-1][same], e[:-1][same]
        b_s, b_e = s[1:][same], e[1:][same]
        if len(a_s) == 0:
            return empty
        rel = np.empty(len(a_s), dtype=np.int64)
        eq_start = a_s == b_s
        # a.start < b.start branch
        lt = ~eq_start
        rel[lt & (b_s > a_e)] = 0                       # before
        rel[lt & (b_s == a_e)] = 1                      # meets
        ov = lt & (b_s < a_e)
        rel[ov & (b_e > a_e)] = 2                       # overlaps
        rel[ov & (b_e == a_e)] = 3                      # finished_by
        rel[ov & (b_e < a_e)] = 4                       # contains
        # a.start == b.start branch
        rel[eq_start & (a_e < b_e)] = 5                 # starts
        rel[eq_start & (a_e == b_e)] = 6                # equals
        rel[eq_start & (a_e > b_e)] = 7                 # started_by
        cnt = np.bincount(rel, minlength=8)
        nz = np.flatnonzero(cnt)
        return pa.table({
            "relation": pa.array([ALLEN_LABELS[i] for i in nz]),
            "n_pairs": pa.array(cnt[nz], pa.int64())})

    def _merge(b: pa.Table) -> pa.Table:
        m = b.group_by(["relation"]).aggregate([("n_pairs", "sum")])
        from ..arrow_utils import rename_agg

        return rename_agg(m, {"relation": "relation",
                              "n_pairs_sum": "n_pairs"})

    parted = ds.map_batches(_add_part, batch_format="pyarrow")
    partials = parted.repartition(num_partitions).groupby(
        "__part").map_groups(_classify, batch_format="pyarrow")
    return partials.repartition(1).map_batches(_merge,
                                               batch_format="pyarrow")
