"""Per-series linear-interpolation resampling onto a uniform time grid.

The classic irregular->regular sampling conversion (the dual of the
reference's downsampling kernels, which assume a series already on a
grid; cf. `reference/downsample_rs/.../minmax.rs` equidistant-bin
assumption): for every series, emit one row per grid point ``t`` in
``[ceil(min_x/step)*step, floor(max_x/step)*step]`` with the linear
interpolation between the bracketing samples (exact sample hit wins).

Scale shape (100 TB): ONE hash(series) shuffle (dense part space,
bounded reducers), then each partition handles ALL its series in a
single vectorized pass — duplicate-x collapse, per-series grid
construction (repeat/cumsum tiling) and bracketing via ONE composite-key
``searchsorted`` over ``(series_code, x)`` keys, never a per-series or
per-grid-point Python loop. A per-segment numpy fallback covers the
(astronomically wide) key ranges where the composite int64 would
overflow. Grid amplification is range/step per series — the caller's
knob, identical to any gap-filling engine.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..arrow_utils import make_add_part
import pyarrow.compute as pc

__all__ = ["resample_linear"]


def _interp(t, x0, x1, y0, y1):
    """y0 + (y1-y0)*(t-x0)/(x1-x0), evaluated in the exact operand order
    the SQL oracle uses (all int-valued float64 -> bit-identical)."""
    exact = x1 == x0
    with np.errstate(divide="ignore", invalid="ignore"):
        v = y0 + (y1 - y0) * (t - x0) / (x1 - x0)
    return np.where(exact, y1, v)


def resample_linear(ds, step_us: int, *, series_col: str = "series_id",
                    x_col: str = "x", y_col: str = "y",
                    id_col: str | None = None, num_partitions: int = 16):
    """Resample every series onto the uniform ``step_us`` grid.

    Duplicate x within a series collapses to the row with the greatest
    ``id_col`` (deterministic; required for a well-defined bracketing).
    Output: ``(series_col, t_us: int64, value: float64)``.
    """
    from ..arrow_utils import stable_part_codes

    mod = num_partitions * 64
    step = int(step_us)

    _add_part = make_add_part(series_col, mod)

    def _resample(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        s_type = t[series_col].type
        if t.num_rows == 0:
            return pa.table({series_col: pa.array([], s_type),
                             "t_us": pa.array([], pa.int64()),
                             "value": pa.array([], pa.float64())})
        keys = [(series_col, "ascending"), (x_col, "ascending")]
        if id_col:
            keys.append((id_col, "ascending"))
        t = t.take(pc.sort_indices(t, sort_keys=keys))
        sid = t[series_col]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        d = sid.dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        x = t[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.float64)

        # collapse duplicate (series, x): keep the LAST row of each run
        # (max id under the sort above)
        last = np.ones(len(x), dtype=bool)
        last[:-1] = (codes[1:] != codes[:-1]) | (x[1:] != x[:-1])
        codes, x, y = codes[last], x[last], y[last]

        # per-series segments and grid bounds
        heads = np.ones(len(codes), dtype=bool)
        heads[1:] = codes[1:] != codes[:-1]
        seg = np.flatnonzero(heads)
        ends = np.append(seg[1:], len(codes))
        mn, mx = x[seg], x[ends - 1]
        lo_k = (mn + step - 1) // step
        hi_k = mx // step
        cnt = np.maximum(0, hi_k - lo_k + 1)
        total = int(cnt.sum())
        if total == 0:
            return pa.table({series_col: pa.array([], s_type),
                             "t_us": pa.array([], pa.int64()),
                             "value": pa.array([], pa.float64())})
        seg_rep = np.repeat(np.arange(len(seg)), cnt)
        starts_cum = np.concatenate(([0], np.cumsum(cnt)[:-1]))
        k = (np.arange(total) - np.repeat(starts_cum, cnt)
             + np.repeat(lo_k, cnt))
        tg = k * step
        gcodes = codes[seg][seg_rep]

        xmin = int(x.min())
        span = int(x.max()) - xmin + 2
        if (int(codes.max()) + 1) * span < (1 << 62):
            xk = codes * span + (x - xmin)
            tk = gcodes * span + (tg - xmin)
            prev = np.searchsorted(xk, tk, side="right") - 1
            nxt = np.searchsorted(xk, tk, side="left")
            v = _interp(tg.astype(np.float64), x[prev].astype(np.float64),
                        x[nxt].astype(np.float64), y[prev], y[nxt])
        else:  # composite key would overflow: per-segment fallback
            v = np.empty(total, dtype=np.float64)
            for i, s0 in enumerate(seg):
                e0 = ends[i]
                gm = seg_rep == i
                tseg = tg[gm]
                xs = x[s0:e0]
                prev = s0 + np.searchsorted(xs, tseg, side="right") - 1
                nxt = s0 + np.searchsorted(xs, tseg, side="left")
                v[gm] = _interp(tseg.astype(np.float64),
                                x[prev].astype(np.float64),
                                x[nxt].astype(np.float64), y[prev], y[nxt])

        series_out = d.dictionary.take(pa.array(gcodes))
        return pa.table({series_col: series_out, "t_us": pa.array(tg),
                         "value": pa.array(v, pa.float64())})

    parted = ds.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _resample, batch_format="pyarrow")
