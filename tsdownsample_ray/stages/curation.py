"""Corpus curation actions: per-domain frequency capping and a
deterministic weighted mixture order — the two levers that turn audited
counts (pivot / concentration) into an actual training mix.

No counterpart in the reference; training-data layer.

``cap_per_group``: keep at most ``k`` rows per group, preference order
caller-pinned (e.g. longest docs first) — the FineWeb-style domain
frequency cap. ONE hash(group) shuffle, per-partition sort + segment
position mask; emits kept rows with their in-group rank so callers can
audit what the cap cut.

``mixture_order``: a deterministic interleave of sources at declared
integer weights — the data-mixing schedule. Each row's order key is
``rank_in_source * inv_weight`` (integer; ``inv_weight = L / w`` with
``L = lcm`` of the weights), so a source with weight 2 appears twice as
often as weight 1 in any prefix, exactly — the classic
stride-scheduling argument, integer throughout and therefore
SQL-replayable. Ties (same key, different sources) break by source
name, then id. Per-source ranks come from the same salted-hash
permutation as ``ordering.training_order``, so the within-source order
is reproducibly shuffled too. Output: ``(id, source, mix_key, rk)`` —
globally sorting by (mix_key, source, id) IS the schedule; the operator
leaves the sort to the consumer (a training reader consumes it as a
streamed merge, never one total sort).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ..arrow_utils import group_codes, make_add_part

__all__ = ["cap_per_group", "mixture_order", "greedy_set_cover",
           "k_anonymity_audit", "knapsack_dp"]


def cap_per_group(ds, *, group_col: str, k: int, order_col: str,
                  descending: bool = True, tiebreak_col: str,
                  num_partitions: int = 8):
    """Keep each group's top ``k`` rows by (order_col, tiebreak_col).
    Output: input columns + ``rk`` (0-based in-group rank)."""
    from ..arrow_utils import stable_part_codes

    mod = num_partitions * 64

    _add_part = make_add_part(group_col, mod)

    sort_keys = [(group_col, "ascending"),
                 (order_col, "descending" if descending else "ascending"),
                 (tiebreak_col, "ascending")]

    def _cap(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        if t.num_rows == 0:
            return t.append_column("rk", pa.array([], pa.int64()))
        t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
        grp = t[group_col]
        if isinstance(grp, pa.ChunkedArray):
            grp = grp.combine_chunks()
        codes = group_codes(grp)
        from ..arrow_utils import segment_positions

        _seg, _sor, pos = segment_positions(codes)
        t = t.append_column("rk", pa.array(pos))
        return t.filter(pa.array(pos < k))

    parted = ds.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _cap, batch_format="pyarrow")


def mixture_order(ds, weights: dict, *, group_col: str = "source",
                  id_col: str = "doc_id", salt: int = 0,
                  default_weight: int = 1, num_partitions: int = 8):
    """``weights``: {source: positive int}. See module docstring."""
    from ..arrow_utils import stable_part_codes
    from .sampling import hash61

    ws = {k: int(v) for k, v in weights.items()}
    if any(w <= 0 for w in ws.values()) or default_weight <= 0:
        raise ValueError("mixture weights must be positive integers")
    lcm = math.lcm(default_weight, *ws.values()) if ws else default_weight
    inv = {k: lcm // w for k, w in ws.items()}
    inv_default = lcm // default_weight

    mod = num_partitions * 64

    _add_part = make_add_part(group_col, mod)

    def _rank(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        if t.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             group_col: pa.array([], pa.string()),
                             "mix_key": pa.array([], pa.int64()),
                             "rk": pa.array([], pa.int64())})
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = hash61(ids, salt).astype(np.int64)
        t = t.append_column("__h", pa.array(h))
        t = t.take(pc.sort_indices(t, sort_keys=[
            (group_col, "ascending"), ("__h", "ascending"),
            (id_col, "ascending")]))
        grp = t[group_col]
        if isinstance(grp, pa.ChunkedArray):
            grp = grp.combine_chunks()
        codes = group_codes(grp)
        from ..arrow_utils import segment_positions

        seg, seg_of_row, rk = segment_positions(codes)
        inv_arr = np.array(
            [inv.get(s, inv_default) for s in
             grp.take(pa.array(seg)).to_pylist()],
            dtype=np.int64)  # one lookup per GROUP, not per row
        mix = (rk + 1) * inv_arr[seg_of_row]
        return pa.table({id_col: t[id_col], group_col: grp,
                         "mix_key": pa.array(mix), "rk": pa.array(rk)})

    parted = ds.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _rank, batch_format="pyarrow")


def greedy_set_cover(ds, *, group_col: str = "source",
                     text_col: str = "text", unit: str = "token",
                     max_picks: int = 64, num_partitions: int = 8):
    """Greedy weighted SET COVER over (group -> token set): pick the
    group covering the most uncovered vocabulary each step (ties ->
    lexicographically smallest group) until coverage stops growing —
    the ln(n)-approximation workhorse for source/corpus selection
    ("which crawls do I need for full vocabulary coverage").
    Deterministic; output one row per pick:
    ``(pick, grp, newly_covered, covered_total)`` — exact ints.

    Scale shape: ONE distinct (group, token) aggregate (bounded by
    groups x vocabulary — the Heap's-law side, never corpus-sized)
    collapses map-side per block; the greedy loop then runs on that
    bounded table driver-side (the kcore bounded-state contract; group
    count bounds the rounds)."""
    import ray as _ray

    from ..arrow_utils import rename_agg, stable_part_codes

    if unit not in ("token", "bigram"):
        raise ValueError("unit must be 'token' or 'bigram'")

    def _pairs(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b[text_col], " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.values
        off = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        row = np.repeat(np.arange(b.num_rows, dtype=np.int64),
                        np.diff(off))
        grp = b[group_col]
        if isinstance(grp, pa.ChunkedArray):
            grp = grp.combine_chunks()
        if unit == "bigram":
            # adjacent raw-split bigrams, empties dropped (the
            # g2_collocations adjacency convention)
            n = len(flat)
            same = row[1:] == row[:-1] if n > 1 else np.empty(0, bool)
            w1 = flat.slice(0, max(n - 1, 0))
            w2 = flat.slice(1, max(n - 1, 0))
            ok = same & (
                pc.not_equal(w1, "").to_numpy(zero_copy_only=False)
                & pc.not_equal(w2, "").to_numpy(zero_copy_only=False))
            sel = pa.array(np.flatnonzero(ok))
            t = pa.table({
                "grp": grp.take(pa.array(row[:-1][ok])),
                "token": pc.binary_join_element_wise(
                    w1.take(sel), w2.take(sel), " ")})
        else:
            keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
            t = pa.table({"grp": grp.take(pa.array(row[keep])),
                          "token": flat.filter(pa.array(keep))})
        d = t.group_by(["grp", "token"]).aggregate([])
        h = stable_part_codes(d["grp"], num_partitions * 64)
        return d.append_column("__part", pa.array(h))

    def _merge(g: pa.Table) -> pa.Table:
        return g.drop_columns(["__part"]).group_by(
            ["grp", "token"]).aggregate([])

    pairs = pa.concat_tables(_ray.get(
        ds.map_batches(_pairs, batch_format="pyarrow")
        .repartition(num_partitions).groupby("__part").map_groups(
            _merge, batch_format="pyarrow").to_arrow_refs()))
    # bounded driver state: groups x vocab distinct pairs
    sets: dict[str, set] = {}
    for gname, tok in zip(pairs["grp"].to_pylist(),
                          pairs["token"].to_pylist()):
        sets.setdefault(gname, set()).add(tok)
    covered: set = set()
    out_rows = []
    for pick in range(1, max_picks + 1):
        best_g, best_new = None, 0
        for gname in sorted(sets):
            new = len(sets[gname] - covered)
            if new > best_new:
                best_g, best_new = gname, new
        if best_g is None:
            break
        covered |= sets[best_g]
        out_rows.append((pick, best_g, best_new, len(covered)))

    import ray.data as rd

    return rd.from_arrow(pa.table({
        "pick": pa.array([r[0] for r in out_rows], pa.int64()),
        "grp": pa.array([r[1] for r in out_rows], pa.string()),
        "newly_covered": pa.array([r[2] for r in out_rows], pa.int64()),
        "covered_total": pa.array([r[3] for r in out_rows],
                                  pa.int64())}))


def k_anonymity_audit(ds, *, quasi_cols: tuple, k: int = 5,
                      num_partitions: int = 8):
    """k-anonymity audit over a quasi-identifier tuple (Sweeney 2002 —
    the release-safety check every training-data pipeline should run
    before publishing event-level data): group by the quasi-identifier
    columns and count equivalence classes smaller than ``k`` plus the
    rows they expose. Output ONE exact-int row:
    ``(k, n_classes, n_violating, rows_at_risk)``.

    Scale shape: map-side class-count partials, ONE hash(quasi)
    grouped sum, bounded scalar finish."""
    from .graph import grouped_sum_parts

    cols = list(quasi_cols)

    def _partial(b: pa.Table) -> pa.Table:
        t = b.select(cols)
        t = t.append_column("n", pa.array(np.ones(t.num_rows, np.int64)))
        g = t.group_by(cols).aggregate([("n", "sum")])
        from ..arrow_utils import rename_agg

        return rename_agg(g, {**{c: c for c in cols}, "n_sum": "n"})

    summed = grouped_sum_parts(ds.map_batches(_partial,
                                              batch_format="pyarrow"),
                               cols, ["n"], count_col=None,
                               fanin=num_partitions)

    def _audit(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        viol = n < k
        return pa.table({
            "k": pa.array([k], pa.int64()),
            "n_classes": pa.array([len(n)], pa.int64()),
            "n_violating": pa.array([int(viol.sum())], pa.int64()),
            "rows_at_risk": pa.array([int(n[viol].sum())], pa.int64())})

    # the per-class table is quasi-cardinality bounded; one final block
    return summed.repartition(1).map_batches(_audit,
                                             batch_format="pyarrow")


def knapsack_dp(ds, *, weight_col: str = "wt", value_col: str = "val",
                budget: int = 50, num_partitions: int = 8):
    """Exact 0/1 KNAPSACK value function up to ``budget`` — computed
    DISTRIBUTED via the max-plus-convolution merge: each block folds
    its items into a local DP vector ``dp[w] = best value within
    capacity w`` (one vectorized shift-max per item), and block
    vectors combine with ``dp_ab[w] = max_k dp_a[k] + dp_b[w-k]`` —
    associative and commutative, so the result is independent of the
    partitioning (the pytest pins this against the sequential DP).
    Output one row per capacity: ``(w, best)`` — exact int64.

    Scale shape: per-block O(items x B) fold, ONE O(B) vector per
    block to the driver, O(blocks x B^2) final merge — the classic
    mergeable-aggregate shape (budget bounds the state, never the
    item count). Weights must be >= 1 (validated)."""
    import ray as _ray
    import ray.data as rd

    B = int(budget)

    def _block_dp(b: pa.Table) -> pa.Table:
        wt = b[weight_col].to_numpy(zero_copy_only=False).astype(np.int64)
        val = b[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if (wt < 1).any():
            raise ValueError("knapsack_dp: weights must be >= 1")
        dp = np.zeros(B + 1, dtype=np.int64)
        for w, v in zip(wt, val):
            if w <= B:
                upd = dp[:-w] + v
                dp[w:] = np.maximum(dp[w:], upd)
        return pa.table({"dp": pa.array([dp.tolist()],
                                        pa.list_(pa.int64()))})

    parts = _ray.get(ds.map_batches(_block_dp, batch_format="pyarrow")
                     .to_arrow_refs())
    dps = [np.array(row, dtype=np.int64)
           for t in parts for row in t["dp"].to_pylist()]
    acc = np.zeros(B + 1, dtype=np.int64)
    for d in dps:
        # max-plus convolution (bounded O(B^2) per block vector)
        nxt = np.full(B + 1, -1, dtype=np.int64)
        for w in range(B + 1):
            nxt[w] = int(np.max(acc[:w + 1] + d[w::-1]))
        acc = nxt
    return rd.from_arrow(pa.table({
        "w": pa.array(np.arange(B + 1, dtype=np.int64)),
        "best": pa.array(acc)}))
