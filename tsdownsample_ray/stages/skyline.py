"""2-D Pareto skyline (maximize both dimensions): the rows no other row
dominates — ``exists j: x_j >= x_i and y_j >= y_i and one strict``.
Equal (x, y) duplicates are mutually non-dominating and all kept.

No counterpart in the reference (kernel library; SURVEY.md §2.4).
Classic uses: multi-objective curation fronts (newest AND highest-value
orders, longest AND highest-quality documents), cost/latency tradeoff
audits.

Scale shape (no quadratic pass, no broadcast of data rows): x is cut
into ``cell_w``-wide grid cells. Stage 1 computes the per-cell max y —
a map-side partial plus a cells-sized aggregate (bounded by the x range
/ ``cell_w``, independent of row count; keep it <= ~1e6 cells). The
driver turns it into an EXCLUSIVE suffix max per cell ("best y in any
strictly-higher cell") and broadcasts that small array via ``ray.put``.
Stage 2 hash-shuffles rows ONCE on their cell and scans each partition
in one vectorized pass: rows sort by (cell, x desc, y desc); a row
survives iff its y equals its x-group's max AND strictly exceeds both
the cell's suffix threshold and the running max over higher-x groups of
the same cell (an exclusive segmented cummax via a guarded
integer-offset encoding — raises if ``n_segments * y_range`` would
overflow int64; raise ``cell_w`` in that case).

SQL restatement: per-x max + suffix window max over x desc + the
``y = mp(x) AND y > best_above`` filter."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["skyline2d"]


def skyline2d(ds, *, x_col: str, y_col: str, cell_w: int,
              num_partitions: int = 16):
    """Return the Pareto-maximal rows of ``ds`` over integer columns
    (``x_col``, ``y_col``), all input columns preserved. Null x/y rows
    are dropped (they cannot sit on the frontier of an integer order)."""
    import ray

    from ..arrow_utils import stable_part_codes

    cw = int(cell_w)
    mod = num_partitions * 64

    def _xy_valid(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(b[x_col]), pc.is_valid(b[y_col]))
        return b.filter(m)

    def _cell_partial(b: pa.Table) -> pa.Table:
        b = _xy_valid(b)
        if b.num_rows == 0:
            return pa.table({"cell": pa.array([], pa.int64()),
                             "my": pa.array([], pa.int64())})
        x = pc.cast(b[x_col], pa.int64()).to_numpy(zero_copy_only=False)
        y = pc.cast(b[y_col], pa.int64()).to_numpy(zero_copy_only=False)
        t = pa.table({"cell": pa.array(x // cw), "y": pa.array(y)})
        m = t.group_by(["cell"]).aggregate([("y", "max")])
        return pa.table({"cell": m["cell"],
                         "my": pc.cast(m["y_max"], pa.int64())})

    cellmax = ds.map_batches(_cell_partial, batch_format="pyarrow") \
        .groupby("cell").max("my")
    cm = cellmax.to_pandas()  # <= n_cells rows — bounded, documented
    if len(cm) == 0:
        import ray.data as rd

        sch = ds.schema()
        return rd.from_arrow(pa.table(
            {n: pa.array([], t) for n, t in zip(sch.names, sch.types)}))
    cells = cm["cell"].to_numpy()
    mys = cm["max(my)"].to_numpy()
    order = np.argsort(cells)[::-1]  # cell desc
    cells_d, mys_d = cells[order], mys[order]
    lo = np.iinfo(np.int64).min
    suffix = np.concatenate([[lo], np.maximum.accumulate(mys_d)[:-1]])
    # ascending-cell arrays for vectorized searchsorted lookup
    thr_cells = cells_d[::-1].astype(np.int64).copy()
    thr_vals = suffix[::-1].astype(np.int64).copy()
    thr_ref = ray.put((thr_cells, thr_vals))

    def _add_part(b: pa.Table) -> pa.Table:
        b = _xy_valid(b)
        x = pc.cast(b[x_col], pa.int64()).to_numpy(zero_copy_only=False)
        cell = x // cw
        b = b.append_column("__cell", pa.array(cell))
        h = stable_part_codes(b["__cell"], None)
        return b.append_column(
            "__part", pa.array((h % np.uint64(mod)).astype(np.int32)))

    def _scan(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__part"])
        if g.num_rows == 0:
            return g.drop_columns(["__cell"])
        thr_cells, thr_vals = ray.get(thr_ref)
        x = pc.cast(g[x_col], pa.int64()).to_numpy(zero_copy_only=False)
        y = pc.cast(g[y_col], pa.int64()).to_numpy(zero_copy_only=False)
        cell = g["__cell"].to_numpy(zero_copy_only=False)
        order = np.lexsort((-y, -x, cell))
        x, y, cell = x[order], y[order], cell[order]
        n = len(x)
        # x-groups (same cell, same x); heads carry the group's max y
        gheads = np.ones(n, dtype=bool)
        gheads[1:] = (cell[1:] != cell[:-1]) | (x[1:] != x[:-1])
        gstart = np.flatnonzero(gheads)
        gcell = cell[gstart]
        gmp = y[gstart]
        # cell-segments at group granularity
        cheads = np.ones(len(gstart), dtype=bool)
        cheads[1:] = gcell[1:] != gcell[:-1]
        seg_idx = np.cumsum(cheads) - 1
        # exclusive segmented cummax via guarded offset encoding
        ymin = int(gmp.min())
        rng = int(gmp.max()) - ymin + 1
        nseg = int(seg_idx[-1]) + 1
        if nseg * rng >= 2**62:
            raise ValueError(
                "skyline2d: n_segments * y_range risks int64 overflow; "
                "raise cell_w")
        enc = seg_idx * rng + (gmp.astype(np.int64) - ymin)
        acc = np.maximum.accumulate(enc)
        excl = np.full(len(gstart), np.iinfo(np.int64).min)
        not_head = ~cheads
        excl[not_head] = (acc[np.flatnonzero(not_head) - 1]
                          - seg_idx[not_head] * rng + ymin)
        # every cell seen here was counted in stage 1 → exact positions
        thr_arr = thr_vals[np.searchsorted(thr_cells, gcell)]
        best_above = np.maximum(excl, thr_arr)
        gkeep = gmp > best_above
        # expand back to rows: row kept iff its group kept and y == gmp
        row_gid = np.cumsum(gheads) - 1
        keep = gkeep[row_gid] & (y == gmp[row_gid])
        sel = order[keep]
        return g.take(pa.array(np.sort(sel))).drop_columns(["__cell"])

    parted = ds.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _scan, batch_format="pyarrow")
