"""Integer Haar (S-transform) wavelet energy profile per series — the
multiresolution fingerprint behind wavelet compression pickers and
similarity search: per level, the detail-coefficient energy of the
lifting-scheme Haar transform, all in exact integers (``s = (a+b)//2``,
``d = a − b`` — the reversible S-transform; odd tails pass through).

Scale shape: one hash(series) shuffle (the standard per-series
contract), then every level of every series in the partition computes
vectorized (even/odd slicing per contiguous segment); output is
levels × series rows — tier-rollup sized, never raw-data sized.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ..arrow_utils import group_codes, make_add_part

__all__ = ["haar_energy"]


def haar_energy(rolled, *, levels: int = 3,
                series_col: str = "series_id",
                order_col: str = "bucket", value_col: str = "sum_y",
                num_partitions: int = 8):
    """Per (series, level 1..levels): detail count, Σ|d|, max|d|; plus
    a ``level = 0`` row with the FINAL approximation's count, Σ|v|,
    max|v|. Values must be int64 (the engine's cents contract)."""
    from ..arrow_utils import stable_part_codes

    mod = num_partitions * 64

    _add_part = make_add_part(series_col, mod)

    def _transform(g: pa.Table) -> pa.Table:
        sid_type = g[series_col].type
        empty = pa.table({"series_id": pa.array([], sid_type),
                          "level": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64()),
                          "sum_abs": pa.array([], pa.int64()),
                          "max_abs": pa.array([], pa.int64())})
        t = g.drop_columns(["__part"])
        if t.num_rows == 0:
            return empty
        t = t.take(pc.sort_indices(t, sort_keys=[
            (series_col, "ascending"), (order_col, "ascending")]))
        sid = t[series_col]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = group_codes(sid)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(v)
        change = np.ones(n, dtype=bool)
        change[1:] = codes[1:] != codes[:-1]
        seg_first = np.flatnonzero(change)
        out_sid, out_lvl, out_n, out_sum, out_max = [], [], [], [], []
        for si, f in enumerate(seg_first):
            l_ = (seg_first[si + 1] if si + 1 < len(seg_first) else n)
            cur = v[f:l_]
            sval = sid[int(f)].as_py()
            for lvl in range(1, levels + 1):
                m = len(cur) // 2
                a = cur[: 2 * m : 2]
                bb = cur[1 : 2 * m : 2]
                d = a - bb
                # floor-div: values are positive bucket sums by contract
                s = (a + bb) // 2
                nxt = (np.append(s, cur[-1]) if len(cur) % 2 else s)
                out_sid.append(sval)
                out_lvl.append(lvl)
                out_n.append(m)
                out_sum.append(int(np.abs(d).sum()) if m else 0)
                out_max.append(int(np.abs(d).max()) if m else 0)
                cur = nxt
            out_sid.append(sval)
            out_lvl.append(0)
            out_n.append(len(cur))
            out_sum.append(int(np.abs(cur).sum()))
            out_max.append(int(np.abs(cur).max()) if len(cur) else 0)
        # per-series python loop is over SERIES (bounded per partition);
        # each level is a vectorized slice over that series' rows
        return pa.table({
            "series_id": pa.array(out_sid, sid_type),
            "level": pa.array(out_lvl, pa.int64()),
            "n": pa.array(out_n, pa.int64()),
            "sum_abs": pa.array(out_sum, pa.int64()),
            "max_abs": pa.array(out_max, pa.int64())})

    parted = rolled.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _transform, batch_format="pyarrow")
