"""Market-basket association rules over (user, item) events — the
support / confidence / lift mining behind cross-feature recommendation
and behavioral cohorting. Baskets are each user's DISTINCT item set.

Scale shape (the trick): with a BOUNDED item vocabulary (catalog
categories, event types — here ≤ 63), a user's basket is one uint64
BITMASK, and a partition's contribution collapses to ``bincount`` over
mask values — CONSTANT-size partials (≤ 2^|items| rows, here 32)
regardless of user count. One hash(user) shuffle co-locates each user's
rows; everything after the mask histogram is driver-side arithmetic
over those bounded counts. For large vocabularies the same operator
falls back to per-pair grouped sums (the `cooccurrence` stage shape).

All rule metrics are exact integers (``conf_pm = 1000·n_ab // n_a``,
``lift_num/lift_den``) with lift's single pinned IEEE division.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ..arrow_utils import group_codes, make_add_part

__all__ = ["association_rules"]


def association_rules(ds, items: list[str], *,
                      user_col: str = "user_id",
                      item_col: str = "event_type",
                      num_partitions: int = 8):
    """Returns one row per ordered rule a→b (a ≠ b, n_ab > 0):
    ``(antecedent, consequent, n, n_a, n_b, n_ab, conf_pm, lift_num,
    lift_den, lift)``. ``items`` is the bounded, sorted item
    vocabulary (≤ 63 entries)."""
    items = sorted(items)
    ni = len(items)
    if ni > 63:
        raise ValueError("association_rules: bitmask path needs <= 63 "
                         "items; use the cooccurrence stage beyond that")
    iarr = pa.array(items, pa.string())

    from ..arrow_utils import stable_part_codes

    mod = num_partitions * 64

    _add_part = make_add_part(user_col, mod)

    def _masks(g: pa.Table) -> pa.Table:
        empty = pa.table({"mask": pa.array([], pa.int64()),
                          "cnt": pa.array([], pa.int64())})
        if g.num_rows == 0:
            return empty
        uid = g[user_col]
        if isinstance(uid, pa.ChunkedArray):
            uid = uid.combine_chunks()
        ucodes = group_codes(uid)
        tidx = pc.fill_null(pc.index_in(g[item_col], value_set=iarr),
                            -1).to_numpy(zero_copy_only=False).astype(
            np.int64)
        known = tidx >= 0
        masks = np.zeros(int(ucodes.max()) + 1, np.int64)
        np.bitwise_or.at(masks, ucodes[known],
                         np.int64(1) << tidx[known].astype(np.int64))
        masks = masks[masks > 0]
        hist = np.bincount(masks, minlength=1 << ni)
        nz = np.flatnonzero(hist)
        return pa.table({"mask": pa.array(nz.astype(np.int64)),
                         "cnt": pa.array(hist[nz].astype(np.int64))})

    parts = (ds.map_batches(_add_part, batch_format="pyarrow")
             .repartition(num_partitions).groupby("__part")
             .map_groups(_masks, batch_format="pyarrow")
             .to_pandas())  # <= partitions x 2^ni rows: bounded constant

    hist = np.zeros(1 << ni, np.int64)
    np.add.at(hist, parts["mask"].to_numpy(), parts["cnt"].to_numpy())
    n = int(hist.sum())
    masks = np.arange(1 << ni)
    n_one = np.array([int(hist[(masks >> i) & 1 == 1].sum())
                      for i in range(ni)], dtype=np.int64)
    rows = []
    for a in range(ni):
        for b in range(ni):
            if a == b:
                continue
            both = (((masks >> a) & 1) == 1) & (((masks >> b) & 1) == 1)
            n_ab = int(hist[both].sum())
            if n_ab == 0:
                continue
            n_a, n_b = int(n_one[a]), int(n_one[b])
            rows.append((items[a], items[b], n, n_a, n_b, n_ab,
                         (1000 * n_ab) // n_a, n * n_ab, n_a * n_b,
                         float(n * n_ab) / float(n_a * n_b)))
    out = pd.DataFrame(rows, columns=[
        "antecedent", "consequent", "n", "n_a", "n_b", "n_ab",
        "conf_pm", "lift_num", "lift_den", "lift"])
    for c in ("n", "n_a", "n_b", "n_ab", "conf_pm", "lift_num",
              "lift_den"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["antecedent", "consequent"]).reset_index(
        drop=True)
