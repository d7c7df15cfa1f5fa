"""Distributed per-series downsampling — the Dataset-level form of the
reference's downsamplers.

The reference operates on one in-memory series
(``downsampling_interface.py:104-135``); here a ``ray.data.Dataset`` holds
MANY series in long format ``(series_id, x, y, ...)`` and each series is
downsampled independently: ``ds.groupby(series_id).map_groups(kernel_fn)``.
Parallelism is ACROSS series/groups (the reference's rayon
bins-within-one-series parallelism is unnecessary here — SURVEY.md §4.1);
a single group always runs the exact single-threaded NumPy kernel, so the
distributed result equals the single-node oracle bit-for-bit regardless of
partitioning, block order, or cluster size.

Partitioning assumption: one series must fit in one group/block (LTTB's
sequential dependency forbids splitting a series across workers —
SURVEY.md §7.4). For visualization-grade n_out (1e2..1e4) on rolled-up tier
data this holds by construction; cap raw-series size upstream via rollup.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..arrow_utils import col_to_numpy, table_sorted_by
from ..kernels import get_kernel

__all__ = ["downsample_dataset", "downsample_table", "downsample_partitioned"]


def downsample_table(
    tbl: pa.Table,
    kernel,
    n_out: int,
    *,
    x_col: str | None = "x",
    y_col: str = "y",
    presorted: bool = False,
    **kernel_kwargs,
) -> pa.Table:
    """Downsample ONE series held in an Arrow table; returns the selected
    original rows (the ``y[s_ds]`` gather of the reference README:63-73,
    done via ``Table.take``)."""
    if isinstance(kernel, str):
        kernel = get_kernel(kernel)
    if x_col is not None and not presorted:
        tbl = table_sorted_by(tbl, x_col)  # kernels assume x sorted
    x = col_to_numpy(tbl[x_col]) if x_col is not None else None
    y = col_to_numpy(tbl[y_col])
    idx = kernel(x, y, n_out, **kernel_kwargs)
    return tbl.take(pa.array(idx.astype(np.int64)))


def downsample_dataset(
    ds,
    kernel: str = "minmaxlttb",
    n_out: int = 1000,
    *,
    series_col: str = "series_id",
    x_col: str | None = "x",
    y_col: str = "y",
    **kernel_kwargs,
):
    """groupby(series) -> per-group kernel -> selected original rows.

    The groupby is the only shuffle; its key is the engine-wide partitioning
    key ``series_id`` (SURVEY.md §7.3), so a pipeline that already hash-
    partitioned on series reuses the layout.
    """

    if isinstance(kernel, str):
        # resolve on the DRIVER: the callable ships in the task closure, so
        # custom kernels registered here don't need re-registration on workers
        kernel = get_kernel(kernel)

    def _group_fn(tbl: pa.Table) -> pa.Table:
        return downsample_table(
            tbl, kernel, n_out, x_col=x_col, y_col=y_col, **kernel_kwargs
        )

    return ds.groupby(series_col).map_groups(_group_fn, batch_format="pyarrow")


def downsample_partitioned(
    ds,
    kernel: str = "minmaxlttb",
    n_out: int = 1000,
    *,
    num_partitions: int = 64,
    series_col: str = "series_id",
    x_col: str = "x",
    y_col: str = "y",
    tiebreak_cols: tuple = (),
    **kernel_kwargs,
):
    """Explicit hash partitioning on the series key (the north-star
    partitioning scheme): every series hashes to one of ``num_partitions``
    partitions, ONE group per partition carries all of its series, and the
    per-partition function runs the kernels over series runs inside one
    Arrow batch.

    Scale rationale vs ``downsample_dataset``: groupby machinery costs per
    GROUP; with 1e8 series, 1e8 groups is pathological while
    ``num_partitions`` groups is flat. Salting a hot series is a matter of
    widening ``num_partitions`` — series stay whole by construction.
    Results are identical (pytest-checked)."""
    if isinstance(kernel, str):
        kernel = get_kernel(kernel)

    def _add_part(b: pa.Table) -> pa.Table:
        from ..arrow_utils import stable_part_codes

        part = stable_part_codes(b[series_col], num_partitions)
        return b.append_column("__part", pa.array(part, pa.int32()))

    # deterministic order even with duplicate x: callers with possible ties
    # pass tiebreak_cols (e.g. an id column), matching the per-series path
    sort_keys = ([(series_col, "ascending"), (x_col, "ascending")]
                 + [(c, "ascending") for c in tiebreak_cols])

    def _partition_fn(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        idx = pc.sort_indices(tbl, sort_keys=sort_keys)
        tbl = tbl.take(idx)
        series = tbl[series_col].to_numpy(zero_copy_only=False)
        change = np.flatnonzero(series[1:] != series[:-1]) + 1
        bounds = np.concatenate(([0], change, [len(series)]))
        x = col_to_numpy(tbl[x_col])
        y = col_to_numpy(tbl[y_col])
        take = []
        for a, b in zip(bounds[:-1], bounds[1:]):
            sel = kernel(x[a:b], y[a:b], n_out, **kernel_kwargs)
            take.append(sel.astype(np.int64) + a)
        if not take:
            return tbl.slice(0, 0).drop_columns(["__part"])
        out = tbl.take(pa.array(np.concatenate(take)))
        return out.drop_columns(["__part"])

    parted = ds.map_batches(_add_part, batch_format="pyarrow")
    return parted.groupby("__part").map_groups(_partition_fn,
                                               batch_format="pyarrow")
