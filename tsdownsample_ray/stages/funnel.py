"""Product-analytics operators over per-user event streams: ordered
funnel matching and cohort retention.

No counterpart in the reference (a kernel library); engine-level
analytics (brief scope: windowed/sessionized event analytics). Both
operators follow the engine's one-shuffle-per-entity discipline: ONE
hash(user) exchange, then a fully vectorized per-partition pass.

``funnel``: per user, greedily match an ordered step sequence
(e.g. view -> click -> purchase) with STRICTLY increasing timestamps —
step k matches the user's earliest event of that type after the step
k-1 match. Emits every user with their depth and per-step match times
(-1 where unmatched). The greedy-earliest rule is the standard funnel
semantic and makes the match unique, hence SQL-replayable with nested
min-filters.

``cohort_retention``: assign each user to the week of their first
event (cohort), then count for every (cohort week, week offset >= 0)
the distinct users active in that later week. The per-user pass emits
(cohort, offset) pairs — distinct by construction — and a tiny grouped
count (weeks x weeks keys) finishes map-side.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ..arrow_utils import group_codes, make_add_part

__all__ = ["funnel", "cohort_retention", "event_transitions"]

WEEK_US = 7 * 24 * 3600 * 1_000_000


def _user_parted(ds, user_col, mod):
    from ..arrow_utils import stable_part_codes

    _add_part = make_add_part(user_col, mod)

    return ds.map_batches(_add_part, batch_format="pyarrow")


def funnel(ds, steps, *, user_col: str = "user_id", type_col: str = "t",
           x_col: str = "x", num_partitions: int = 8):
    """``steps`` is the ordered tuple of event types. Output one row per
    user: ``(user_id, depth, step1_us, step2_us, ...)``."""
    steps = list(steps)
    mod = num_partitions * 64

    def _match(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        u_type = t[user_col].type
        if t.num_rows == 0:
            return pa.table({
                user_col: pa.array([], u_type),
                "depth": pa.array([], pa.int64()),
                **{f"step{i + 1}_us": pa.array([], pa.int64())
                   for i in range(len(steps))}})
        t = t.take(pc.sort_indices(t, sort_keys=[
            (user_col, "ascending"), (x_col, "ascending")]))
        uid = t[user_col]
        if isinstance(uid, pa.ChunkedArray):
            uid = uid.combine_chunks()
        codes = group_codes(uid)
        x = t[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ev = t[type_col]
        if isinstance(ev, pa.ChunkedArray):
            ev = ev.combine_chunks()
        heads = np.ones(len(codes), dtype=bool)
        heads[1:] = codes[1:] != codes[:-1]
        seg = np.flatnonzero(heads)
        seg_of_row = np.cumsum(heads) - 1
        n_users = len(seg)
        prev = np.full(n_users, np.iinfo(np.int64).min, dtype=np.int64)
        cols = {}
        depth = np.zeros(n_users, dtype=np.int64)
        big = np.iinfo(np.int64).max
        for i, step in enumerate(steps):
            is_step = pc.equal(ev, step).to_numpy(zero_copy_only=False)
            cand = np.where(is_step & (x > prev[seg_of_row]), x, big)
            # per-user min of candidates: minimum.reduceat over segments
            m = np.minimum.reduceat(cand, seg)
            matched = m != big
            depth += matched.astype(np.int64)
            cols[f"step{i + 1}_us"] = pa.array(np.where(matched, m, -1))
            prev = np.where(matched, m, big)  # unmatched kills later steps
        return pa.table({user_col: uid.take(pa.array(seg)),
                         "depth": pa.array(depth), **cols})

    parted = _user_parted(ds, user_col, mod)
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _match, batch_format="pyarrow")


def cohort_retention(ds, *, user_col: str = "user_id", x_col: str = "x",
                     week_us: int = WEEK_US, num_partitions: int = 8):
    """Output: ``(cohort_week_us, week_offset, n_users)`` for every
    offset >= 0 with at least one active user."""
    from .graph import grouped_sum_parts

    mod = num_partitions * 64

    def _pairs(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        if t.num_rows == 0:
            return pa.table({"cohort_week_us": pa.array([], pa.int64()),
                             "week_offset": pa.array([], pa.int64())})
        t = t.take(pc.sort_indices(t, sort_keys=[
            (user_col, "ascending"), (x_col, "ascending")]))
        uid = t[user_col]
        if isinstance(uid, pa.ChunkedArray):
            uid = uid.combine_chunks()
        codes = group_codes(uid)
        x = t[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        wk = x // week_us
        heads = np.ones(len(codes), dtype=bool)
        heads[1:] = codes[1:] != codes[:-1]
        seg_of_row = np.cumsum(heads) - 1
        seg = np.flatnonzero(heads)
        cohort = wk[seg][seg_of_row]  # first event's week (rows sorted)
        off = wk - cohort
        # distinct (user, offset): consecutive after the sort? weeks are
        # nondecreasing within a user, so a first-occurrence mask works
        first = np.ones(len(off), dtype=bool)
        first[1:] = (off[1:] != off[:-1]) | (codes[1:] != codes[:-1])
        return pa.table({
            "cohort_week_us": pa.array(cohort[first] * week_us),
            "week_offset": pa.array(off[first])})

    parted = _user_parted(ds, user_col, mod)
    pairs = parted.repartition(num_partitions).groupby(
        "__part").map_groups(_pairs, batch_format="pyarrow")
    return grouped_sum_parts(pairs, ["cohort_week_us", "week_offset"], [],
                             count_col="n_users", fanin=4)


def event_transitions(ds, *, user_col: str = "user_id",
                      ts_col: str = "ts_us", id_col: str = "event_id",
                      event_col: str = "event_type",
                      num_partitions: int = 8, fanin: int = 4):
    """Per-user adjacent-transition bigram counts: for every consecutive
    event pair in a user's (ts, id)-ordered stream, count (src -> dst) —
    the Markov transition matrix of user behavior (next-action
    prediction, anomaly routes, UX-path analysis). SQL's
    ``lag() OVER (PARTITION BY user ORDER BY ts, id)`` + group count.

    Scale shape: ONE hash(user) shuffle, one sorted vectorized pass per
    partition producing (src, dst, c) PARTIALS collapsed per partition
    (<= |event types|^2 rows each), then the standard hashpart grouped
    sum — the second exchange carries bigram cells, never event rows."""
    from .graph import grouped_sum_parts

    mod = num_partitions * 64
    parted = _user_parted(ds, user_col, mod)

    def _pairs(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        e_type = t[event_col].type
        if t.num_rows == 0:
            return pa.table({"src": pa.array([], e_type),
                             "dst": pa.array([], e_type),
                             "c": pa.array([], pa.int64())})
        t = t.take(pc.sort_indices(t, sort_keys=[
            (user_col, "ascending"), (ts_col, "ascending"),
            (id_col, "ascending")]))
        uid = t[user_col]
        if isinstance(uid, pa.ChunkedArray):
            uid = uid.combine_chunks()
        codes = group_codes(uid)
        same = np.zeros(len(codes), dtype=bool)
        same[1:] = codes[1:] == codes[:-1]
        idx = np.flatnonzero(same)
        ev = t[event_col]
        if isinstance(ev, pa.ChunkedArray):
            ev = ev.combine_chunks()
        pairs = pa.table({"src": ev.take(pa.array(idx - 1)),
                          "dst": ev.take(pa.array(idx)),
                          "c": pa.array(np.ones(len(idx), np.int64))})
        g2 = pairs.group_by(["src", "dst"]).aggregate([("c", "sum")])
        from ..arrow_utils import rename_agg
        return rename_agg(g2, {"src": "src", "dst": "dst", "c_sum": "c"})

    cells = parted.repartition(num_partitions).groupby("__part").map_groups(
        _pairs, batch_format="pyarrow")
    return grouped_sum_parts(cells, ["src", "dst"], ["c"],
                             count_col=None, fanin=fanin)
