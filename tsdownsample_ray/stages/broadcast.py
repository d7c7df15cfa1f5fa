"""Small-side broadcast lookup join — the brief's prescribed pattern for
joining a large Dataset against a SMALL table: ``ray.put`` the table once,
``ray.get`` inside each map task (a local object-store hit per node), and
run an in-batch Arrow hash join — instead of shuffling the large side
through a cluster-wide join exchange.

When to use: dimension enrichment (key -> attributes) where the small
side fits comfortably in worker memory (say, <= a few hundred MB). For
large-x-large joins use ``Dataset.join`` / ``join_pair_payload``.

Row order WITHIN a batch is not preserved (acero hash join); downstream
aggregations are order-insensitive, and callers needing order should sort
after."""

from __future__ import annotations

import pyarrow as pa

__all__ = ["broadcast_lookup_join"]


def broadcast_lookup_join(ds, small: pa.Table, *, on: str | list,
                          select: list | None = None,
                          join_type: str = "inner"):
    """Join every batch of ``ds`` against the broadcast ``small`` table on
    column(s) ``on`` (same names both sides). ``select`` prunes the small
    side's payload columns (default: all non-key columns)."""
    import ray

    keys = [on] if isinstance(on, str) else list(on)
    cols = select if select is not None else [
        c for c in small.column_names if c not in keys]
    small = small.select(keys + list(cols)).combine_chunks()
    ref = ray.put(small)

    def _join(b: pa.Table) -> pa.Table:
        s = ray.get(ref)
        return b.join(s, keys=keys, join_type=join_type)

    return ds.map_batches(_join, batch_format="pyarrow")
