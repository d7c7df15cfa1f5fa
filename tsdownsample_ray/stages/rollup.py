"""Windowed continuous aggregates (rollup) with map-side partial
aggregation, hot-key salting, and retention-tier cascades.

No counterpart in the reference (SURVEY.md §2.4) — mandated by the
BASELINE.json north rule: min/max/mean/count per ``(series_id, window)``,
cascading across retention tiers (raw -> 1m -> 1h -> 1d ...).

Scale design:
- **partial pre-aggregation**: each input block is reduced to <= one row per
  ``(series_id, bucket)`` inside ``map_batches`` (an Arrow hash group-by)
  BEFORE the cluster-wide shuffle, so the ``groupby.aggregate`` exchange
  moves partials, not raw rows. On a 100 TB corpus the wide shuffle is
  ~|series| x |buckets| rows, orders of magnitude below the input.
- **salting**: with a skewed domain distribution a single hot
  ``(series_id, bucket)`` reducer can straggle; ``salt > 1`` splits each key
  into ``salt`` sub-keys for the first combine and de-salts in a second,
  tiny combine. (With per-block partials the unsalted path is already one
  row per key per block; salting matters when |blocks| is huge.)
- **tier cascade**: tier k+1 re-aggregates tier k's (min,max,sum,count)
  partials on a coarser bucket — associative merges, so every tier is exact
  and each is ~1/60th the rows of the previous (SURVEY.md §4.2).

Mean is derived as ``sum/count`` at the end (exact for integer y; for float
y it matches any oracle computing sum/count in f64 over the same partial
tree).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..arrow_utils import rename_agg

__all__ = ["bucketize", "partial_rollup_batch", "rollup", "cascade",
           "finalize_mean", "rollup_multi", "grouped_sum", "merge_tiers"]

_PARTIAL_SCHEMA = ("min_y", "max_y", "sum_y", "n")


def bucketize(x: pa.ChunkedArray | pa.Array, window_us: int) -> pa.Array:
    """int64 epoch-us -> window start (floor) in epoch-us."""
    d = pc.divide(x, window_us)  # int64 division truncates toward zero;
    # x >= 0 in this engine (epoch-us), so trunc == floor
    return pc.multiply(d, window_us)


def partial_rollup_batch(batch: pa.Table, window_us: int, *,
                         series_col: str = "series_id", x_col: str = "x",
                         y_col: str = "y", salt: int = 1) -> pa.Table:
    """One block -> per-(series,bucket[,salt]) partial aggregate rows."""
    bucket = bucketize(batch[x_col], window_us)
    t = pa.table({
        "series_id": batch[series_col],
        "bucket": bucket,
        "y": batch[y_col],
    })
    keys = ["series_id", "bucket"]
    if salt > 1:
        # deterministic sub-key (salt must be a power of two): spread one hot
        # key's rows over `salt` reducers; de-salted by the second combine.
        # Mix bits from three x scales (128 us, 128 ms, ~1 s) so the spread
        # survives ANY window size — the old x // 1_000_003 alone collapsed
        # to 1-2 sub-keys for sub-second windows, silently disabling the
        # salt exactly where the hot key lives in one ~1 s bucket
        if salt & (salt - 1):
            raise ValueError("salt must be a power of two")
        x = batch[x_col]
        h = pc.bit_wise_xor(pc.shift_right(x, 7), pc.shift_right(x, 17))
        h = pc.bit_wise_xor(h, pc.divide(x, 1_000_003))
        t = t.append_column("salt", pc.cast(pc.bit_wise_and(h, salt - 1), pa.int32()))
        keys.append("salt")
    g = t.group_by(keys).aggregate(
        [("y", "min"), ("y", "max"), ("y", "sum"), ("y", "count")]
    )
    return rename_agg(g, {**{k: k for k in keys}, "y_min": "min_y",
                          "y_max": "max_y", "y_sum": "sum_y",
                          "y_count": "n"})


def _arrow_combine(b: pa.Table, keys=("series_id", "bucket")) -> pa.Table:
    """In-block exact merge of partial rows (associative min/max/sum/sum)."""
    keys = [k for k in keys if k in b.column_names]
    g = b.group_by(keys).aggregate(
        [("min_y", "min"), ("max_y", "max"), ("sum_y", "sum"), ("n", "sum")]
    )
    return rename_agg(g, {**{k: k for k in keys}, "min_y_min": "min_y",
                          "max_y_max": "max_y", "sum_y_sum": "sum_y",
                          "n_sum": "n"})


def tree_combine(ds, merge_fn, *, fanin: int = 16, spread: bool = True):
    """Two-level in-block associative merge: ``repartition(fanin)`` ->
    per-block ``merge_fn`` -> ``repartition(1)`` -> final ``merge_fn``.
    The shared skeleton behind ``_combine(mode="tree")``, ``rollup_multi``
    and ``grouped_sum`` — one place to carry the spread optimization and
    the single-final-block contract (callers own the key-space bound;
    see TREE_MAX_KEYS)."""
    lvl1 = (ds.repartition(fanin) if spread else ds).map_batches(
        merge_fn, batch_format="pyarrow")
    return lvl1.repartition(1).map_batches(merge_fn, batch_format="pyarrow")


def _combine(ds, keys, *, mode: str = "tree", fanin: int = 16,
             spread: bool = True):
    """Merge partial aggregate rows to one row per key.

    ``mode="tree"`` (default): two-level in-block Arrow merges —
    ``repartition(fanin)`` -> per-block combine -> ``repartition(1)`` ->
    final combine. No sort-based shuffle at all; correct because the merge
    is associative and the partials are already <= |keys| rows per input
    block. Right whenever the rolled-up key space (|series| x |buckets|)
    fits one block — the engine's design point (rollup output is ~100-1000x
    smaller than input; SURVEY.md §4.2). Ray's sort-based Aggregate costs
    O(input_blocks) per-reducer overhead, which at toy scale dominated the
    whole pipeline and degraded with parallelism.

    ``mode="shuffle"``: Ray hash/sort groupby — the fallback for key spaces
    too large for a single final block (e.g. billions of series); reducers
    bounded by ``fanin`` via a pre-repartition.

    ``mode="hashpart"``: scale-safe like shuffle but cheaper — ONE int32
    partition key (hash of the group keys, dictionary-encoded uniques) is
    shuffled instead of sorting the full multi-column key; each of the
    ``fanin`` partitions then runs an in-block Arrow hash aggregate.
    Measured ~3x faster than the native sort groupby on salted partials.
    """
    if mode == "tree":
        # ``spread=False`` skips the level-1 repartition: callers whose
        # input is ALREADY few well-sized blocks of combined rows (a
        # materialized tier feeding a cascade) gain nothing from an extra
        # shuffle before the per-block merge
        return tree_combine(ds, lambda b: _arrow_combine(b, keys),
                            fanin=fanin, spread=spread)

    if mode == "hashpart":
        import numpy as np

        from ..arrow_utils import stable_part_codes

        kcols = list(keys)
        # part space is DENSER than the reducer count (x64) and the input is
        # round-robined down to ``fanin`` blocks before the part groupby:
        # reducer count == block count in Ray's sort shuffle, so bounding
        # blocks at fanin with ~64 occupied part values per reducer keeps
        # every reduce partition non-empty — empty reduce outputs carry no
        # schema and trigger "RefBundle with a different schema" warnings
        # downstream (the failure class that crashed joins in round 1)
        mod = fanin * 64

        def _add_part(b: pa.Table) -> pa.Table:
            b = _arrow_combine(b, kcols)  # in-block pre-collapse
            # row hash mixes ALL group keys (a salted hot key must spread
            # across reducers): crc32 of the dictionary-encoded series
            # uniques (null-safe), then int keys folded in with a uint64 mix
            h = stable_part_codes(b[kcols[0]], None)
            for kc in kcols[1:]:
                v = b[kc]
                if isinstance(v, pa.ChunkedArray):
                    v = v.combine_chunks()
                h = (h * np.uint64(0x9E3779B97F4A7C15)
                     + v.to_numpy(zero_copy_only=False).astype(np.uint64))
            part = (h % np.uint64(mod)).astype(np.int32)
            return b.append_column("__part", pa.array(part, pa.int32()))

        def _merge(g: pa.Table) -> pa.Table:
            return _arrow_combine(g.drop_columns(["__part"]), kcols)

        parted = ds.map_batches(_add_part, batch_format="pyarrow")
        return parted.repartition(fanin).groupby("__part").map_groups(
            _merge, batch_format="pyarrow")

    if mode != "shuffle":  # typos must not silently take the 10x path
        raise ValueError(f"unknown combine mode {mode!r} "
                         "(expected tree | hashpart | shuffle)")
    from ray.data.aggregate import Max, Min, Sum

    return ds.repartition(fanin).groupby(list(keys)).aggregate(
        Min("min_y", alias_name="min_y"),
        Max("max_y", alias_name="max_y"),
        Sum("sum_y", alias_name="sum_y"),
        Sum("n", alias_name="n"),
    )


# above this many distinct (series, bucket) keys the tree combine's final
# single-block merge (~40 B/row -> ~200 MB and one core) becomes the
# bottleneck; the sort-based shuffle scales its reducers instead
TREE_MAX_KEYS = 5_000_000


def pick_combine(combine: str, salt: int, est_keys: int | None) -> tuple:
    """Resolve ``combine="auto"`` + salt into the (combine, desalt) merge
    strategies ``rollup`` will run. Pure function so pipelines can be
    tested for selecting the hash-partitioned path above TREE_MAX_KEYS
    without executing a shuffle."""
    if combine == "auto":
        combine = "hashpart" if (est_keys or 0) > TREE_MAX_KEYS else "tree"
    if salt > 1 and combine == "tree":
        combine = "hashpart"
    desalt = "shuffle" if (est_keys or 0) > TREE_MAX_KEYS else "tree"
    return combine, desalt


def rollup(ds, window_us: int, *, series_col: str = "series_id",
           x_col: str = "x", y_col: str = "y", salt: int = 1,
           combine: str = "auto", est_keys: int | None = None):
    """series rows -> tier-0 continuous aggregate
    ``(series_id, bucket, min_y, max_y, sum_y, n)``.

    ``combine="auto"`` picks the merge strategy from ``est_keys`` (the
    caller's estimate of |series| x |buckets|): tree for key spaces whose
    final merge fits one block (< TREE_MAX_KEYS), the hash-partitioned
    combine beyond (the desalt pass uses Ray's sort groupby, mode
    "shuffle") — a billion-series corpus must never funnel into one
    block. Without an estimate the tree is used (measured 10x faster at
    small key spaces; see _combine)."""
    # salting exists to split a hot key across sharded reducers; the tree
    # combine has no per-key reducers. Asking for salt implies a key space
    # worth sharding, so salt>1 selects the hash-partitioned combine
    # (callers may force mode="shuffle" for Ray's native sort groupby).
    combine, desalt_mode = pick_combine(combine, salt, est_keys)
    use_salt = salt if salt > 1 else 1
    partials = ds.map_batches(
        lambda b: partial_rollup_batch(
            b, window_us, series_col=series_col, x_col=x_col, y_col=y_col,
            salt=use_salt,
        ),
        batch_format="pyarrow",
    )
    if use_salt > 1:
        salted = _combine(partials, ["series_id", "bucket", "salt"],
                          mode=combine)
        salted = salted.drop_columns(["salt"])
        # the desalt merge sees <= |keys| x salt already-combined rows —
        # the hot key is already split, so the cheap tree merge suffices
        # unless the FINAL key space itself outgrows one block
        return _combine(salted, ["series_id", "bucket"], mode=desalt_mode)
    return _combine(partials, ["series_id", "bucket"], mode=combine)


def rollup_multi(ds, window_us: int, y_cols: list, *,
                 series_col: str = "series_id", x_col: str = "x",
                 fanin: int = 16):
    """Multi-metric rollup: one pass produces min/max/sum per value column
    plus a shared count — ``(series_id, bucket, min_<c>, max_<c>, sum_<c>
    ..., n)``. Same partial + tree-combine shape as the single-metric
    rollup (all merges associative)."""
    aggs = [(c, f) for c in y_cols for f in ("min", "max", "sum")]
    out_names = [f"{f}_{c}" for c in y_cols for f in ("min", "max", "sum")]

    def _partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "series_id": batch[series_col],
            "bucket": bucketize(batch[x_col], window_us),
            **{c: batch[c] for c in y_cols},
        })
        g = t.group_by(["series_id", "bucket"]).aggregate(
            aggs + [(y_cols[0], "count")])
        return rename_agg(g, {
            "series_id": "series_id", "bucket": "bucket",
            **{f"{c}_{f}": f"{f}_{c}" for c, f in aggs},
            f"{y_cols[0]}_count": "n"})

    merge_aggs = ([(n, n.split("_", 1)[0]) for n in out_names]
                  + [("n", "sum")])

    def _merge(b: pa.Table) -> pa.Table:
        g = b.group_by(["series_id", "bucket"]).aggregate(merge_aggs)
        return rename_agg(g, {
            "series_id": "series_id", "bucket": "bucket",
            **{f"{n}_{f}": n for n, f in merge_aggs[:-1]},
            "n_sum": "n"})

    partials = ds.map_batches(_partial, batch_format="pyarrow")
    return tree_combine(partials, _merge, fanin=fanin)


def grouped_sum(ds, keys: list, sum_cols: list, *, count_col: str = "n",
                fanin: int = 16):
    """Generic map-side-partial grouped SUM + row count: each block is
    pre-aggregated to <= one row per key (Arrow hash group-by) before the
    tree combine — the same shuffle-minimizing shape as ``rollup`` for
    arbitrary additive summaries (e.g. pricing rollups over ``lineitem``).
    Key spaces must fit one block (summaries — tens to thousands of keys);
    use ``rollup``'s hashpart machinery for per-entity key spaces."""
    keys = list(keys)

    def _partial(b: pa.Table) -> pa.Table:
        g = b.select(keys + sum_cols).group_by(keys).aggregate(
            [(c, "sum") for c in sum_cols] + [(keys[0], "count")])
        return rename_agg(g, {**{k: k for k in keys},
                              **{f"{c}_sum": c for c in sum_cols},
                              f"{keys[0]}_count": count_col})

    def _merge(b: pa.Table) -> pa.Table:
        g = b.group_by(keys).aggregate(
            [(c, "sum") for c in sum_cols] + [(count_col, "sum")])
        return rename_agg(g, {**{k: k for k in keys},
                              **{f"{c}_sum": c for c in sum_cols},
                              f"{count_col}_sum": count_col})

    partials = ds.map_batches(_partial, batch_format="pyarrow")
    return tree_combine(partials, _merge, fanin=fanin)


def cascade(tier_ds, coarser_window_us: int, *, combine: str = "auto",
            est_keys: int | None = None,
            finer_window_us: int | None = None):
    """tier k aggregate -> tier k+1 on a coarser window (exact associative
    re-merge of (min,max,sum,count) partials).

    Gap-filled rows (``n == 0``) are dropped on input: their zero-filled
    min/max would otherwise poison the coarser tier's extremes (a phantom
    ``min_y = 0`` on an all-positive series). Gap materialization is a
    per-tier presentation concern; every tier re-derives its own gaps.

    ``combine="auto"`` resolves through ``pick_combine`` exactly like
    ``rollup``: callers pass the coarser tier's |series| x |buckets|
    estimate so a >TREE_MAX_KEYS cascade takes the hash-partitioned merge
    instead of funnelling into one block (without an estimate the tree is
    used — the pre-round-5 behavior).

    ``finer_window_us``: the input tier's window. The cascade rebuckets by
    each finer bucket's START, which is only exact when the coarser window
    is an integer multiple of the finer one — pass it to get that checked
    instead of silently mis-attributing boundary rows."""
    if finer_window_us is not None and coarser_window_us % finer_window_us:
        raise ValueError(
            f"coarser window {coarser_window_us} is not a multiple of the "
            f"finer tier's window {finer_window_us}: rebucketing by bucket "
            "start would split finer buckets across coarse windows")
    mode, _ = pick_combine(combine, 1, est_keys)

    def _rebucket(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater(b["n"], 0))
        if "is_gap" in b.column_names:
            b = b.drop_columns(["is_gap"])
        return b.set_column(
            b.column_names.index("bucket"),
            "bucket",
            bucketize(b["bucket"], coarser_window_us),
        )

    rebucketed = tier_ds.map_batches(_rebucket, batch_format="pyarrow")
    # a tier is already combined rows in a handful of blocks — per-block
    # merge directly (spread=False), saving one shuffle per cascade tier
    return _combine(rebucketed, ["series_id", "bucket"], mode=mode,
                    spread=False)


def grouped_min_parts(ds, keys: list, min_cols: list, *, fanin: int = 8):
    """Hashpart grouped MIN for key spaces too large for a single final
    block (the argmin sibling of ``graph.grouped_sum_parts``): map-side
    per-block min, one int32-keyed shuffle (dense part space, ``fanin``
    reducers), per-partition Arrow min. Pack (value, id) into one int64
    before calling to get a deterministic tie-broken argmin — min over
    ``value * K + id`` with ``id < K`` is exactly SQL's
    ``ORDER BY value, id LIMIT 1`` per key."""
    import numpy as np

    from ..arrow_utils import rename_agg, stable_part_codes

    keys = list(keys)
    mod = fanin * 64

    def _agg(b: pa.Table) -> pa.Table:
        g = b.select([c for c in b.column_names if c != "__part"]) \
             .group_by(keys).aggregate([(c, "min") for c in min_cols])
        return rename_agg(g, {**{k: k for k in keys},
                              **{f"{c}_min": c for c in min_cols}})

    def _add_part(b: pa.Table) -> pa.Table:
        b = _agg(b)  # in-block pre-collapse before the exchange
        # same secondary-key fold as graph.grouped_sum_parts: raw int64
        # view for integer keys (no per-unique Python hashing),
        # stable_part_codes for string/binary keys
        h = stable_part_codes(b[keys[0]], None)
        for kc in keys[1:]:
            v = b[kc]
            if isinstance(v, pa.ChunkedArray):
                v = v.combine_chunks()
            if pa.types.is_integer(v.type):
                folded = v.to_numpy(zero_copy_only=False).astype(np.uint64)
            else:
                folded = stable_part_codes(v, None)
            h = h * np.uint64(0x9E3779B97F4A7C15) + folded
        part = (h % np.uint64(mod)).astype(np.int32)
        return b.append_column("__part", pa.array(part, pa.int32()))

    parted = ds.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(fanin).groupby("__part").map_groups(
        _agg, batch_format="pyarrow")


def finalize_mean(ds):
    """Append ``mean_y = sum_y / n`` (f64); null where ``n == 0`` (gap
    rows), never NaN/inf."""

    def _mean(b: pa.Table) -> pa.Table:
        empty = pc.equal(b["n"], 0)
        denom = pc.if_else(empty, pa.scalar(1, b["n"].type), b["n"])
        mean = pc.divide(
            pc.cast(b["sum_y"], pa.float64()), pc.cast(denom, pa.float64())
        )
        mean = pc.if_else(empty, pa.scalar(None, pa.float64()), mean)
        return b.append_column("mean_y", mean)

    return ds.map_batches(_mean, batch_format="pyarrow")


def merge_tiers(*tiers, keys=("series_id", "bucket"), combine: str = "auto",
                est_keys: int | None = None, fanin: int = 16):
    """Incremental continuous-aggregate maintenance: merge tier tables
    that partition the SAME window over disjoint input slices (a base
    tier plus append/backfill delta tiers) into the tier the full input
    would produce. Exact because every tier column is an associative
    partial (min/min, max/max, sum+sum, n+n) — the TimescaleDB-style
    invalidation story: recompute only the delta's buckets, merge, and
    the result is bit-identical to a full rebuild (the oracle replays
    the full rebuild). Mode selection matches :func:`rollup`
    (``auto``: tree below TREE_MAX_KEYS, hashpart beyond)."""
    ds = tiers[0]
    for t in tiers[1:]:
        ds = ds.union(t)
    mode, _ = pick_combine(combine, 1, est_keys)
    return _combine(ds, list(keys), mode=mode, fanin=fanin)
