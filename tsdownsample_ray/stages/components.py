"""Connected components over a candidate-pair edge list — the step that
turns near-duplicate PAIRS into duplicate CLUSTERS (so a curation run can
keep one canonical doc per cluster, not arbitrary pair survivors).

Algorithm: iterative min-label propagation (the BSP formulation):

    label(v) <- min(label(v), min over neighbors u of label(u))

repeated until a fixpoint; every node ends with the minimum node id of
its component. Each round is edge-scale work — one hash join
(edges x labels) + one per-node min — never corpus-scale, and the
iteration count is the component diameter (near-dup clusters are tiny:
a handful of rounds).

Scale shape: edges and labels are hash-partitioned datasets; each round
materializes the (node-scale) label table — truncating lineage so round
N+1 does not re-execute rounds 1..N — and convergence is decided by an
exact changed-row count computed INSIDE the min-combine (the node's old
label rides the union as a null-elsewhere column, so no second join per
round), not a heuristic.
Empty-block hygiene follows ``join_pair_payload``: blocks are compacted
before every join (Ray's hash join cannot resolve keys on the
schema-less empty blocks map stages structurally emit).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["connected_components"]


def _min_by_node(ds, num_partitions: int):
    """(node, lbl) -> per-node min(lbl): dense-code hash partition +
    vectorized per-partition Arrow aggregate (the rollup hashpart
    discipline — no full sort of the label table)."""
    from ..arrow_utils import stable_part_codes

    mod = num_partitions * 64

    def _part(b: pa.Table) -> pa.Table:
        h = stable_part_codes(b["node"], mod)
        return b.append_column("__part", pa.array(h))

    def _agg(g: pa.Table) -> pa.Table:
        t = g.group_by(["node"]).aggregate([("lbl", "min")])
        return pa.table({"node": t["node"], "lbl": t["lbl_min"]})

    return ds.map_batches(_part, batch_format="pyarrow") \
             .repartition(num_partitions).groupby("__part") \
             .map_groups(_agg, batch_format="pyarrow")


def connected_components(edges_ds, *, a_col: str = "a", b_col: str = "b",
                         max_iters: int = 50, num_partitions: int = 4):
    """Edge list -> (node, component) for every node appearing in an
    edge, where component = min node id in its connected component.
    Raises if ``max_iters`` rounds don't converge (diameter bound)."""
    import ray.data as rd

    from ..arrow_utils import compact_nonempty_blocks

    def _both(b: pa.Table) -> pa.Table:
        return pa.concat_tables([
            pa.table({"src": b[a_col], "dst": b[b_col]}),
            pa.table({"src": b[b_col], "dst": b[a_col]}),
        ])

    edges = compact_nonempty_blocks(
        edges_ds.map_batches(_both, batch_format="pyarrow").materialize())
    if edges is None:
        # typed empty result: mirror the INPUT id type so downstream
        # unions/joins/appends against non-empty runs stay schema-stable
        sch = edges_ds.schema()
        id_t = (dict(zip(sch.names, sch.types)).get(a_col, pa.string())
                if sch is not None else pa.string())
        return rd.from_arrow(pa.table({
            "node": pa.array([], id_t),
            "component": pa.array([], id_t),
        }))

    # initial labels: every node labels itself (src covers both endpoints
    # because edges carry both directions)
    init = edges.map_batches(
        lambda b: pa.table({"node": b["src"].unique()
                            if not isinstance(b["src"], pa.ChunkedArray)
                            else b["src"].combine_chunks().unique()}),
        batch_format="pyarrow")
    # compact after EVERY map_groups producer: sparse reduce partitions
    # emit schema-less empty blocks which can poison the acero hash join
    # below when Dataset.schema() lands on one (the documented
    # compact_nonempty_blocks failure class) — edges alone being
    # compacted is not enough, labels is the other join side
    labels = compact_nonempty_blocks(_min_by_node(init.map_batches(
        lambda b: pa.table({"node": b["node"], "lbl": b["node"]}),
        batch_format="pyarrow"), num_partitions).materialize())
    assert labels is not None  # edges is non-empty here, so nodes exist

    from ..arrow_utils import stable_part_codes

    mod = num_partitions * 64

    def _part(b: pa.Table) -> pa.Table:
        h = stable_part_codes(b["node"], mod)
        return b.append_column("__part", pa.array(h))

    def _min_with_changed(g: pa.Table) -> pa.Table:
        """Per-node min over the union of the node's OLD label row
        (``old`` = its label) and propagated messages (``old`` = null,
        skipped by the min), plus a per-node changed bit (new < old) —
        the convergence test riding the combine instead of costing a
        second join per round."""
        g = g.drop_columns(["__part"])
        if g.num_rows == 0:
            return pa.table({"node": pa.array([], g.schema.field(
                                 "node").type),
                             "lbl": pa.array([], g.schema.field(
                                 "lbl").type),
                             "chg": pa.array([], pa.int64())})
        t = g.group_by(["node"]).aggregate([("lbl", "min"),
                                            ("old", "min")])
        new = t["lbl_min"]
        old = t["old_min"]  # exactly one non-null old row per node
        chg = pc.cast(pc.less(new, old), pa.int64())
        return pa.table({"node": t["node"], "lbl": new, "chg": chg})

    for _ in range(max_iters):
        msgs = edges.join(labels, join_type="inner",
                          num_partitions=num_partitions,
                          on=("src",), right_on=("node",))
        msgs = msgs.map_batches(
            lambda b: pa.table({"node": b["dst"], "lbl": b["lbl"],
                                "old": pa.nulls(b.num_rows,
                                                b["lbl"].type)}),
            batch_format="pyarrow")
        tagged_old = labels.map_batches(
            lambda b: pa.table({"node": b["node"], "lbl": b["lbl"],
                                "old": b["lbl"]}),
            batch_format="pyarrow")
        merged = compact_nonempty_blocks(
            (tagged_old.union(msgs)
             .map_batches(_part, batch_format="pyarrow")
             .repartition(num_partitions).groupby("__part")
             .map_groups(_min_with_changed,
                         batch_format="pyarrow")).materialize())
        changed = merged.sum("chg")
        labels = merged.map_batches(
            lambda b: pa.table({"node": b["node"], "lbl": b["lbl"]}),
            batch_format="pyarrow")
        if not changed:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds")

    return labels.map_batches(
        lambda b: pa.table({"node": b["node"], "component": b["lbl"]}),
        batch_format="pyarrow")
