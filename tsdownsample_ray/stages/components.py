"""Connected components over a candidate-pair edge list — the step that
turns near-duplicate PAIRS into duplicate CLUSTERS (so a curation run can
keep one canonical doc per cluster, not arbitrary pair survivors).

Algorithm: iterative min-label propagation (the BSP formulation):

    label(v) <- min(label(v), min over neighbors u of label(u))

repeated until a fixpoint; every node ends with the minimum node id of
its component. Each round is edge-scale work — one partition-local hash
join (edges x labels) + one per-node min — never corpus-scale, and the
iteration count is the component diameter (near-dup clusters are tiny:
a handful of rounds).

Scale shape: PARTITIONED-ITERATIVE raw Ray tasks (the same
escape-hatch shape as ``stages/graph.py:hits`` — an iterative algorithm
whose per-round convergence scalar the Dataset API cannot express
without one full streaming-executor job per round). Edges are
partitioned ONCE by a type-agnostic hash of src (both directions, so a
node's every edge AND its label live at hash(node)); each round is P
partition-local joins + per-dst min partials, one bounded exchange, P
min-combine tasks. The driver reads ONE int per partition per round
(the changed count, computed inside the min-combine by riding the
node's old label through the union as a null-elsewhere column) — never
the label table itself.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["connected_components"]

_CC_REMOTES = None


def _cc_remote_fns():
    """Cached raw-task kit for :func:`connected_components` (lazy so
    importing this module never touches `ray`)."""
    global _CC_REMOTES
    if _CC_REMOTES is not None:
        return _CC_REMOTES
    import types

    import ray

    from ..arrow_utils import stable_part_codes

    def _split(t: pa.Table, key: str, P: int):
        h = stable_part_codes(t[key], None) % np.uint64(P)
        out = tuple(t.filter(pa.array(h == p)) for p in range(P))
        # num_returns=P unpacks a P-tuple only for P > 1; at P == 1 the
        # single ObjectRef holds the RETURN VALUE itself, so hand back
        # the bare table (callers wrap the ref in a 1-list)
        return out[0] if P == 1 else out

    @ray.remote
    def split_edges(tbl: pa.Table, a_col: str, b_col: str, P: int):
        # both directions: a node's out-rows, in-rows and label all land
        # at hash(node), so every join below is partition-local exact
        both = pa.concat_tables([
            pa.table({"src": tbl[a_col], "dst": tbl[b_col]}),
            pa.table({"src": tbl[b_col], "dst": tbl[a_col]})])
        return _split(both, "src", P)

    @ray.remote
    def concat(*tbls: pa.Table) -> pa.Table:
        return pa.concat_tables(tbls)

    @ray.remote
    def init_labels(epart: pa.Table) -> pa.Table:
        # src covers both endpoints (edges carry both directions) and
        # hash(src) co-locates a node's every occurrence, so the
        # partition-local unique IS the partition's exact node set
        src = epart["src"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        u = src.unique()
        return pa.table({"node": u, "lbl": u})

    @ray.remote
    def msgs_task(epart: pa.Table, lpart: pa.Table, P: int):
        j = epart.join(lpart, keys=["src"], right_keys=["node"],
                       join_type="inner")
        g = pa.table({"node": j["dst"], "lbl": j["lbl"]}).group_by(
            ["node"]).aggregate([("lbl", "min")])  # per-dst partial min
        return _split(pa.table({"node": g["node"], "lbl": g["lbl_min"]}),
                      "node", P)

    @ray.remote(num_returns=2)
    def merge_task(lpart: pa.Table, *msg_parts: pa.Table):
        """Per-node min over (old labels ∪ messages) + the changed
        count. The node's OLD label rides the union as a null-elsewhere
        column, so convergence costs no second join; every message dst
        is also some edge's src, hence already present in ``lpart``."""
        msgs = pa.concat_tables(msg_parts)
        if msgs.num_rows == 0:
            return lpart, 0
        tagged = pa.concat_tables([
            pa.table({"node": lpart["node"], "lbl": lpart["lbl"],
                      "old": lpart["lbl"]}),
            pa.table({"node": msgs["node"], "lbl": msgs["lbl"],
                      "old": pa.nulls(msgs.num_rows, msgs["lbl"].type)})])
        g = tagged.group_by(["node"]).aggregate([("lbl", "min"),
                                                 ("old", "min")])
        chg = pc.sum(pc.cast(pc.less(g["lbl_min"], g["old_min"]),
                             pa.int64())).as_py() or 0
        return pa.table({"node": g["node"], "lbl": g["lbl_min"]}), int(chg)

    @ray.remote
    def final_part(lpart: pa.Table) -> pa.Table:
        return lpart.rename_columns(["node", "component"])

    _CC_REMOTES = types.SimpleNamespace(
        split_edges=split_edges, concat=concat, init_labels=init_labels,
        msgs_task=msgs_task, merge_task=merge_task, final_part=final_part)
    return _CC_REMOTES


def connected_components(edges_ds, *, a_col: str = "a", b_col: str = "b",
                         max_iters: int = 50, num_partitions: int = 4):
    """Edge list -> (node, component) for every node appearing in an
    edge, where component = min node id in its connected component
    (lexicographic min for string ids, numeric min for ints — Arrow's
    ``min``). Raises if ``max_iters`` rounds don't converge (diameter
    bound)."""
    import ray
    import ray.data as rd

    P = num_partitions
    fns = _cc_remote_fns()

    mat = edges_ds.materialize()
    if mat.count() == 0:
        # typed empty result: mirror the INPUT id type so downstream
        # unions/joins/appends against non-empty runs stay schema-stable
        sch = edges_ds.schema()
        id_t = (dict(zip(sch.names, sch.types)).get(a_col, pa.string())
                if sch is not None else pa.string())
        return rd.from_arrow(pa.table({
            "node": pa.array([], id_t),
            "component": pa.array([], id_t),
        }))

    cols = [fns.split_edges.options(num_returns=P).remote(r, a_col, b_col, P)
            for r in mat.to_arrow_refs()]
    if P == 1:  # num_returns=1 yields the bare value, not a list
        cols = [[c] for c in cols]
    e_parts = [fns.concat.remote(*[c[p] for c in cols]) for p in range(P)]
    labels = [fns.init_labels.remote(e) for e in e_parts]

    for _ in range(max_iters):
        outs = [fns.msgs_task.options(num_returns=P).remote(
            e_parts[p], labels[p], P) for p in range(P)]
        if P == 1:
            outs = [[o] for o in outs]
        merged = [fns.merge_task.remote(
            labels[q], *[outs[p][q] for p in range(P)]) for q in range(P)]
        labels = [m[0] for m in merged]
        if sum(ray.get([m[1] for m in merged])) == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds")

    return rd.from_arrow_refs([fns.final_part.remote(l) for l in labels])
