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

__all__ = ["cap_per_group", "mixture_order"]


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
