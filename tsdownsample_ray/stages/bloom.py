"""Bloom-filter semi-join: prune a big table by membership in another
table's key set WITHOUT shuffling the big side — the classic runtime
filter every distributed SQL engine pushes below its joins (Spark/Trino
bloom runtime filters, dynamic partition pruning).

Scale shape:

1. **build** (small side): each block folds its keys into distinct bit
   positions (``k`` ``hash61`` salts x ``m_bits`` space, vectorized,
   ``np.unique`` per block), a hashpart distinct merges them — the
   exchange carries <= m_bits position rows total, a constant — and the
   merged positions become one ``m_bits`` boolean array, broadcast via
   ``ray.put``.
2. **probe** (big side): map-side mask test per batch, k vectorized
   gathers; only survivors (true members + bloom false positives)
   continue. The big table never shuffles on the bloom.
3. **confirm**: ONE hash-partitioned left join of the survivors against
   the distinct small keys flags each survivor ``is_member`` — the
   production shape (bloom prunes the exchange volume, the exact join
   settles residual false positives).

Determinism: given (m_bits, k), the bloom's exact bit pattern — and
therefore the exact false-positive set — replays in SQL from the same
hash61 expressions, so the whole operator is hash-verifiable.

No counterpart in the reference (kernel library only).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .sampling import hash61

__all__ = ["bloom_semi_join"]


def bloom_semi_join(big_ds, small_ds, *, key_col: str,
                    small_key_col: str | None = None,
                    m_bits: int = 1 << 16, k: int = 3,
                    num_partitions: int = 8):
    """Returns the bloom-surviving rows of ``big_ds`` with an
    ``is_member`` int64 flag (1 = confirmed in the small side's key set,
    0 = bloom false positive)."""
    import ray

    from .graph import grouped_sum_parts

    skey = small_key_col or key_col
    if k < 1 or m_bits < 2:
        raise ValueError(f"need k >= 1, m_bits >= 2; got k={k}, "
                         f"m_bits={m_bits}")

    def _positions(b: pa.Table) -> pa.Table:
        keys = b[skey].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = [(hash61(keys, salt=r) % np.uint64(m_bits)).astype(np.int64)
               for r in range(k)]
        return pa.table({"pos": pa.array(np.unique(np.concatenate(pos)))})

    bits_rows = grouped_sum_parts(
        small_ds.map_batches(_positions, batch_format="pyarrow"),
        ["pos"], [], count_col="c", fanin=2)
    bits = np.zeros(m_bits, dtype=bool)
    for row in bits_rows.take_all():  # <= m_bits rows: bounded constant
        bits[row["pos"]] = True
    bits_ref = ray.put(bits)

    def _probe(b: pa.Table) -> pa.Table:
        arr = ray.get(bits_ref)
        keys = b[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ok = np.ones(len(keys), dtype=bool)
        for r in range(k):
            pos = (hash61(keys, salt=r) % np.uint64(m_bits)).astype(
                np.int64)
            ok &= arr[pos]
        return b.filter(pa.array(ok))

    survivors = big_ds.map_batches(_probe, batch_format="pyarrow")

    def _distinct_keys(b: pa.Table) -> pa.Table:
        key = b[skey]
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        uniq = key.unique()
        return pa.table({"__bloom_key": uniq,
                         "__m": pa.array(np.ones(len(uniq), np.int64))})

    keys_ds = grouped_sum_parts(
        small_ds.map_batches(_distinct_keys, batch_format="pyarrow"),
        ["__bloom_key"], [], count_col="__m", fanin=num_partitions)

    joined = survivors.join(keys_ds, join_type="left_outer",
                            num_partitions=num_partitions,
                            on=(key_col,), right_on=("__bloom_key",))

    def _flag(b: pa.Table) -> pa.Table:
        member = pc.cast(pc.is_valid(b["__m"]), pa.int64())
        out = b.drop_columns(
            [c for c in ("__m", "__bloom_key") if c in b.column_names])
        return out.append_column("is_member", member)

    return joined.map_batches(_flag, batch_format="pyarrow")
