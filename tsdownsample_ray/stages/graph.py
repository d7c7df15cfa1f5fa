"""Link-graph operators: vectorized href extraction from HTML and an
integer fixed-point PageRank over an edge Dataset.

No counterpart in the reference (tsdownsample is a kernel library); this
belongs to the engine's web-corpus layer (brief-mandated training-data
operators — a link graph is the canonical derived structure of a
Common-Crawl-style corpus, and PageRank-style centrality is a standard
quality prior for training-data selection).

Scale shape (100 TB):

- ``extract_links_batch`` is one vectorized Arrow pass per block
  (``split_pattern`` on ``href="`` + one more bounded split for the
  closing quote) — never a per-document regex loop. One page in, its
  links out: embarrassingly parallel, no shuffle.
- ``grouped_sum_parts`` is the generic hashpart grouped sum for PER-NODE
  key spaces (billions of keys): map-side partial aggregate per block,
  ONE int32 hash-partition shuffle, per-partition Arrow aggregate —
  ``rollup._combine(mode="hashpart")``'s discipline for arbitrary
  additive columns (dense part space = fanin x 64 so no reduce partition
  is empty/schema-less).
- ``pagerank`` is the join-based distributed form: per iteration ONE
  hash join (ranks onto edges by src) + ONE hashpart grouped sum of
  contributions by dst. Edges (with out-degree attached) are
  materialized ONCE and reused across iterations; ranks are materialized
  per iteration (O(|V|) rows), so the per-iteration lineage never
  re-executes prior iterations. No broadcast of the rank vector, no
  driver-side state — both sides of every exchange are hash-partitioned.

Exactness: all arithmetic is int64 fixed point. Ranks start at
``scale``; each iteration sets
``r'[v] = T + sum_{(u,v) in E} floor(damp * r[u] / (den * outdeg[u]))``
with ``T = floor((den - damp) * scale / den)`` — floor division on
non-negative int64 on both the NumPy and SQL sides, so results are
bit-exact and order-independent (int sums commute), replayable in
DuckDB by unrolling the iterations. Overflow bound: requires
``damp * |V| * scale < 2^63`` (documented caller contract; at
|V|=10^9 and scale=10^9 use a smaller scale).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["extract_links_batch", "grouped_sum_parts", "pagerank",
           "triangle_counts", "link_prediction", "hits", "reciprocity",
           "degree_assortativity", "sssp", "mis_rounds",
           "boruvka_mst", "single_linkage", "wl_refinement",
           "katz_rounds", "double_sweep"]


def extract_links_batch(batch: pa.Table, *, html_col: str = "html",
                        src_col: str = "url",
                        out_src: str = "src") -> pa.Table:
    """One row per ``href="..."`` occurrence: ``(out_src, link)``.

    Vectorized: split every page on ``href="`` (the first segment of each
    page precedes any link and is dropped), then one ``max_splits=1``
    split on ``"`` takes each candidate's prefix up to the closing quote.
    Well-formed attributes only: an unterminated ``href="`` yields the
    page's remaining text as the link (the regex oracle
    ``href="([^"]*)"`` would skip it) — fine for extractor input that is
    machine-generated HTML, documented for hand-written edge cases.
    """
    html = batch[html_col]
    if isinstance(html, pa.ChunkedArray):
        html = html.combine_chunks()
    if pa.types.is_binary(html.type) or pa.types.is_large_binary(html.type):
        html = html.cast(pa.string())
    if html.null_count:  # null pages emit zero links (offsets math below
        html = html.fill_null("")  # assumes every slot advances)
    src = batch[src_col]
    if isinstance(src, pa.ChunkedArray):
        src = src.combine_chunks()
    if batch.num_rows == 0:
        return pa.table({out_src: pa.array([], src.type),
                         "link": pa.array([], pa.string())})
    parts = pc.split_pattern(html, 'href="')
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    off = parts.offsets.to_numpy().astype(np.int64)
    flat = parts.values  # segments; first of each page is pre-link text
    n_links = np.diff(off) - 1  # split yields >= 1 segment per page
    keep = np.ones(len(flat), dtype=bool)
    keep[off[:-1]] = False  # drop each page's first segment
    cand = flat.filter(pa.array(keep))
    closed = pc.split_pattern(cand, '"', max_splits=1)
    link = pc.list_element(closed, 0) if len(cand) else pa.array(
        [], pa.string())
    src_rep = src.take(pa.array(np.repeat(np.arange(batch.num_rows),
                                          n_links)))
    return pa.table({out_src: src_rep, "link": link})


def grouped_sum_parts(ds, keys: list, sum_cols: list, *,
                      count_col: str | None = "n", fanin: int = 8):
    """Hashpart grouped sum for key spaces too large for a single final
    block: map-side partial per block, one int32-keyed shuffle (dense
    part space, ``fanin`` reducers), per-partition Arrow aggregate.
    ``count_col=None`` omits the row count."""
    from ..arrow_utils import rename_agg, stable_part_codes

    keys = list(keys)
    mod = fanin * 64

    def _agg(b: pa.Table) -> pa.Table:
        aggs = [(c, "sum") for c in sum_cols]
        names = {**{k: k for k in keys},
                 **{f"{c}_sum": c for c in sum_cols}}
        if count_col:
            if count_col not in b.column_names:
                # count ROWS via a ones column — a (key, "count")
                # aggregate counts non-null KEYS and would undercount
                # null-key groups, which stable_part_codes routes through
                b = b.append_column(count_col, pa.array(
                    np.ones(b.num_rows, dtype=np.int64)))
            aggs.append((count_col, "sum"))
            names[f"{count_col}_sum"] = count_col
        return rename_agg(b.select([c for c in b.column_names
                                    if c != "__part"])
                          .group_by(keys).aggregate(aggs), names)

    def _add_part(b: pa.Table) -> pa.Table:
        b = _agg(b)  # in-block pre-collapse before the exchange
        h = stable_part_codes(b[keys[0]], None)
        for kc in keys[1:]:
            v = b[kc]
            if isinstance(v, pa.ChunkedArray):
                v = v.combine_chunks()
            if pa.types.is_integer(v.type):
                folded = v.to_numpy(zero_copy_only=False).astype(np.uint64)
            else:  # string/binary keys hash like the primary key
                folded = stable_part_codes(v, None)
            h = h * np.uint64(0x9E3779B97F4A7C15) + folded
        part = (h % np.uint64(mod)).astype(np.int32)
        return b.append_column("__part", pa.array(part, pa.int32()))

    parted = ds.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(fanin).groupby("__part").map_groups(
        _agg, batch_format="pyarrow")


def pagerank(edges_ds, nodes_ds, *, node_col: str = "doc_id",
             src: str = "src", dst: str = "dst", iters: int = 5,
             scale: int = 10 ** 9, damp: int = 85, den: int = 100,
             num_partitions: int = 4, fanin: int = 8,
             seeds_ds=None):
    """Integer fixed-point PageRank over ``edges_ds(src, dst)`` /
    ``nodes_ds(node_col)``. Returns one row per node:
    ``(node_col, pr_e9)`` with ``pr_e9`` the rank after ``iters``
    iterations at fixed-point ``scale``.

    Nodes with no out-edges leak their mass (no dangling redistribution)
    and nodes with no in-edges hold the teleport constant — both choices
    are deterministic and replayed by the SQL oracle. See the module
    docstring for the exactness/overflow contract.

    ``seeds_ds`` (node_col rows) switches to PERSONALIZED PageRank: the
    teleport mass lands only on the seed set (init r = scale on seeds, 0
    elsewhere) — the standard random-walk-with-restart; non-seed nodes
    unreachable from a seed report 0.

    Scale shape: PARTITIONED-ITERATIVE on the same raw-task kit as
    :func:`hits` (see its docstring for the escape-hatch rationale and
    the one-hash-routes-everything partitioning assumption). Edges are
    hash-partitioned by src ONCE — co-locating every occurrence of a
    src, so out-degree is a partition-LOCAL count, no degree join —
    and, unlike HITS, PageRank has no per-round scalar feedback, so all
    ``iters`` rounds are submitted as one asynchronous task graph with
    ZERO driver synchronization between rounds (the r4 Dataset shape
    paid a join-operator spin-up plus a materialize barrier per round).
    ``fanin`` is retained for API compatibility (the raw-task shape has
    no hashpart reducers)."""
    del fanin
    import ray
    import ray.data as rd

    P = num_partitions
    fns = _hits_remote_fns()
    prf = _pagerank_remote_fns()
    teleport = (den - damp) * scale // den

    def _partition(refs, split_fn, *args):
        cols = [split_fn.options(num_returns=P).remote(r, *args, P)
                for r in refs]
        if P == 1:  # num_returns=1 yields the bare value, not a list
            cols = [[c] for c in cols]
        return [fns.concat.remote(*[c[p] for c in cols]) for p in range(P)]

    e_by_src = _partition(edges_ds.materialize().to_arrow_refs(),
                          fns.split_edges, src, dst)
    # out-degree once per partition (local: hash(src) co-locates a
    # src's every edge), attached per edge row, reused every iteration
    e_by_src = [prf.attach_outdeg.remote(e) for e in e_by_src]

    init_src = seeds_ds if seeds_ds is not None else nodes_ds
    n_parts = _partition(init_src.materialize().to_arrow_refs(),
                         fns.split_nodes, node_col)
    tele = [prf.tele_part.remote(p, teleport) for p in n_parts]
    state = [fns.init_state.remote(p, scale) for p in n_parts]

    for _ in range(iters):
        outs = [prf.pr_half.options(num_returns=P).remote(
            e_by_src[p], state[p], damp, den, P) for p in range(P)]
        if P == 1:
            outs = [[o] for o in outs]
        state = [prf.pr_merge.remote(
            tele[q], *[outs[p][q] for p in range(P)]) for q in range(P)]

    if seeds_ds is None:
        return rd.from_arrow_refs(
            [prf.pr_final.remote(s, node_col) for s in state])
    # personalized: nodes never reached carry rank 0 (absent from the
    # contribution stream) — restore them with a partition-local left
    # join + fill (nodes ride the same hash as state)
    all_nodes = _partition(nodes_ds.materialize().to_arrow_refs(),
                           fns.split_nodes, node_col)
    return rd.from_arrow_refs([
        prf.pr_final_join.remote(all_nodes[p], state[p], node_col)
        for p in range(P)])


def triangle_counts(edges_ds, *, src: str = "src", dst: str = "dst",
                    num_partitions: int = 4, fanin: int = 8):
    """Per-node triangle participation counts over the UNDIRECTED simple
    graph induced by ``edges_ds`` (direction ignored, self-loops dropped,
    multi-edges collapsed) — the graph-analytics workhorse behind
    clustering coefficients and community/spam detection.

    The join-based distributed form (no adjacency broadcast):

    1. canonicalize ``a < b`` + hashpart DISTINCT (block-local collapse
       first, constant-size exchange);
    2. wedges: ONE hash join of edges with themselves on the middle
       vertex — ``(a<b) x (b<c)`` yields each candidate ``a<b<c`` path
       exactly once;
    3. close: ONE composite-key hash join of wedges against edges on
       ``(a, c)`` — each triangle materializes exactly once, so no /3
       correction is needed;
    4. per-node counts: 3 rows per triangle into the hashpart grouped
       sum.

    Exchange volume is the wedge count (sum of deg^2 over mid vertices)
    — the unavoidable cost of exact triangle enumeration; at scale,
    degree-cap the hub vertices upstream (the engine's standard
    logged-truncation lever) before calling this.
    """

    def _canon(b: pa.Table) -> pa.Table:
        s = b[src].to_numpy(zero_copy_only=False).astype(np.int64)
        d = b[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        a = np.minimum(s, d)
        c = np.maximum(s, d)
        keep = a != c
        return pa.table({"a": pa.array(a[keep]), "b": pa.array(c[keep])})

    edges = grouped_sum_parts(
        edges_ds.map_batches(_canon, batch_format="pyarrow"),
        ["a", "b"], [], count_col="m", fanin=fanin).map_batches(
        lambda b: b.drop_columns(["m"]), batch_format="pyarrow")

    e2 = edges.map_batches(
        lambda b: pa.table({"b2": b["a"], "c": b["b"]}),
        batch_format="pyarrow")
    wedges = edges.join(e2, join_type="inner",
                        num_partitions=num_partitions,
                        on=("b",), right_on=("b2",))
    e3 = edges.map_batches(
        lambda b: pa.table({"a3": b["a"], "c3": b["b"]}),
        batch_format="pyarrow")
    tris = wedges.join(e3, join_type="inner",
                       num_partitions=num_partitions,
                       on=("a", "c"), right_on=("a3", "c3"))

    def _vertices(b: pa.Table) -> pa.Table:
        cols = [b[c].to_numpy(zero_copy_only=False).astype(np.int64)
                for c in ("a", "b", "c")]
        return pa.table({"doc_id": pa.array(np.concatenate(cols))})

    return grouped_sum_parts(
        tris.map_batches(_vertices, batch_format="pyarrow"),
        ["doc_id"], [], count_col="n_triangles", fanin=fanin)


def link_prediction(edges_ds, *, src: str = "src", dst: str = "dst",
                    num_partitions: int = 4, fanin: int = 8,
                    min_common: int = 2):
    """Common-neighbor link prediction over the UNDIRECTED simple graph
    induced by ``edges_ds``: for every NON-edge pair ``(a, b)`` sharing
    at least ``min_common`` neighbors, the three classical topology
    scores — ``common_neighbors``, ``jaccard_e6`` (floor of
    ``1e6 * |N(a) ∩ N(b)| / |N(a) ∪ N(b)|``, exact int64) and
    ``pref_attachment`` (``deg(a) * deg(b)``). The standard candidate
    generator for graph-completion / recommendation pipelines.

    Distributed shape (no adjacency broadcast, same discipline as
    ``triangle_counts``):

    1. canonicalize ``a < b`` + hashpart DISTINCT edges;
    2. symmetric adjacency ``(node, nbr)`` both directions;
    3. candidate pairs: ONE hash self-join on the shared neighbor,
       ordered ``u < w`` so each pair materializes once per witness;
    4. per-pair witness counts via the hashpart grouped sum;
    5. drop EXISTING edges with one left-outer join + null filter
       (link prediction scores non-edges only);
    6. attach the two endpoint degrees with two hash joins against the
       per-node degree table (degrees are |V|-sized — joined, never
       broadcast).

    Exchange volume is the wedge count (sum of deg^2 over shared
    neighbors) — degree-cap hub vertices upstream at web scale (the
    engine's standard logged-truncation lever). All arithmetic is
    non-negative int64; ``jaccard_e6`` uses floor division, bit-exact
    against the SQL replay."""

    def _canon(b: pa.Table) -> pa.Table:
        s = b[src].to_numpy(zero_copy_only=False).astype(np.int64)
        d = b[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        a = np.minimum(s, d)
        c = np.maximum(s, d)
        keep = a != c
        return pa.table({"a": pa.array(a[keep]), "b": pa.array(c[keep])})

    # the distinct edge set feeds FIVE consumers (adjacency twice, the
    # anti-join mark side, and the degree table's two join copies) —
    # materialize it once, same discipline as pagerank's edges, so the
    # canon+distinct lineage never re-executes per consumer
    edges = grouped_sum_parts(
        edges_ds.map_batches(_canon, batch_format="pyarrow"),
        ["a", "b"], [], count_col="m", fanin=fanin).map_batches(
        lambda b: b.drop_columns(["m"]), batch_format="pyarrow") \
        .materialize()

    adj = edges.map_batches(
        lambda b: pa.table({
            "node": pa.concat_arrays([c.combine_chunks() if isinstance(
                c, pa.ChunkedArray) else c for c in (b["a"], b["b"])]),
            "nbr": pa.concat_arrays([c.combine_chunks() if isinstance(
                c, pa.ChunkedArray) else c for c in (b["b"], b["a"])])}),
        batch_format="pyarrow")

    deg = grouped_sum_parts(adj, ["node"], [], count_col="deg",
                            fanin=fanin).materialize()  # reused twice

    right = adj.map_batches(
        lambda b: pa.table({"nbr2": b["nbr"], "w": b["node"]}),
        batch_format="pyarrow")
    wedges = adj.join(right, join_type="inner",
                      num_partitions=num_partitions,
                      on=("nbr",), right_on=("nbr2",))

    def _ordered(b: pa.Table) -> pa.Table:
        u = b["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = b["w"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = u < w
        return pa.table({"u": pa.array(u[keep]), "w": pa.array(w[keep])})

    common = grouped_sum_parts(
        wedges.map_batches(_ordered, batch_format="pyarrow"),
        ["u", "w"], [], count_col="common_neighbors", fanin=fanin)
    common = common.map_batches(
        lambda b: b.filter(pc.greater_equal(
            b["common_neighbors"], pa.scalar(min_common, pa.int64()))),
        batch_format="pyarrow")

    mark = edges.map_batches(
        lambda b: pa.table({"ea": b["a"], "eb": b["b"],
                            "hit": pa.array(
                                np.ones(b.num_rows, np.int8))}),
        batch_format="pyarrow")
    cand = common.join(mark, join_type="left_outer",
                       num_partitions=num_partitions,
                       on=("u", "w"), right_on=("ea", "eb"))
    cand = cand.map_batches(
        lambda b: b.filter(pc.is_null(b["hit"])).select(
            ["u", "w", "common_neighbors"]),
        batch_format="pyarrow")

    da = deg.map_batches(
        lambda b: pa.table({"na": b["node"], "deg_a": b["deg"]}),
        batch_format="pyarrow")
    db = deg.map_batches(
        lambda b: pa.table({"nb": b["node"], "deg_b": b["deg"]}),
        batch_format="pyarrow")
    cand = cand.join(da, join_type="inner",
                     num_partitions=num_partitions,
                     on=("u",), right_on=("na",))
    cand = cand.join(db, join_type="inner",
                     num_partitions=num_partitions,
                     on=("w",), right_on=("nb",))

    def _scores(b: pa.Table) -> pa.Table:
        c = b["common_neighbors"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        a_ = b["deg_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b_ = b["deg_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        union = a_ + b_ - c
        return pa.table({
            "a": b["u"], "b": b["w"],
            "common_neighbors": pa.array(c),
            "jaccard_e6": pa.array(c * 1_000_000 // union),
            "pref_attachment": pa.array(a_ * b_)})

    return cand.map_batches(_scores, batch_format="pyarrow")


def hits(edges_ds, nodes_ds, *, node_col: str = "doc_id",
         src: str = "src", dst: str = "dst", iters: int = 4,
         scale: int = 10 ** 6, num_partitions: int = 4):
    """Integer fixed-point HITS (Kleinberg, JACM 46(5), 1999) over
    ``edges_ds(src, dst)`` / ``nodes_ds(node_col)``. Returns one row per
    node: ``(node_col, hub_e6, auth_e6)`` after ``iters`` rounds of

        a(v) = (sum_{u->v} h(u)) * scale // max_w(sum h)      (auth)
        h(u) = (sum_{u->v} a(v)) * scale // max_w(sum a)      (hub)

    Max-normalization instead of the classic L2: it keeps every step in
    EXACT int64 (no sqrt), is deterministic under any partitioning, and
    is replayed verbatim by the unrolled SQL oracle. Initial h = scale
    for every node; a node with no in-edges has auth 0, no out-edges hub
    0 (from round 1 on). Overflow contract: max in-degree (and
    out-degree) x scale^2 must fit int64 — at scale 1e6 that is degree
    <= ~9.2e6/scale*1e6 ≈ 9200; the per-round max is a single scalar
    driver read (bounded: one int per round).

    Scale shape: degree-free, PARTITIONED-ITERATIVE (raw Ray tasks — the
    brief's sanctioned escape hatch for iterative algorithms whose
    per-round scalar feedback the Dataset API cannot express without one
    full streaming-executor job per half-round). Edges are hash-
    partitioned ONCE per direction (by src for auth rounds, by dst for
    hub rounds — the only edge movement in the whole algorithm); state
    lives as ``num_partitions`` Arrow tables partitioned by the SAME
    hash of v, so every half-round is: P local pyarrow hash joins +
    per-in-key partial sums (task-parallel), one partial exchange
    bounded by distinct-keys-per-partition, P merge tasks. The driver
    reads ONE int per partition per half-round (the running max) —
    never the state. The r4 shape (Ray Data join + hashpart grouped sum
    per half-round) was scale-safe but paid ~0.7 s of join-operator
    startup per half-round at toy scale; this shape keeps the same
    partitioned-hash-join dataflow with none of the per-round operator
    spin-up. Partitioning assumption: one hash fn routes v everywhere
    (edge out-key, state, nodes), so joins are partition-local by
    construction."""
    if iters < 1:
        raise ValueError("hits: iters must be >= 1")
    import ray

    P = num_partitions
    fns = _hits_remote_fns()

    edge_refs = edges_ds.materialize().to_arrow_refs()
    node_refs = nodes_ds.materialize().to_arrow_refs()

    def _partition(refs, split_fn, *args):
        # manual shuffle: per-block split into P sub-tables, then one
        # concat task per partition (fan-in = |blocks|; tree-merge here
        # if block counts ever warrant it)
        cols = [split_fn.options(num_returns=P).remote(r, *args, P)
                for r in refs]
        if P == 1:  # num_returns=1 yields the bare value, not a list
            cols = [[c] for c in cols]
        return [fns.concat.remote(*[c[p] for c in cols]) for p in range(P)]

    e_by_src = _partition(edge_refs, fns.split_edges, src, dst)
    e_by_dst = _partition(edge_refs, fns.split_edges, dst, src)
    n_parts = _partition(node_refs, fns.split_nodes, node_col)

    # state: P (v, s) tables partitioned by hash(v); norm=None means the
    # consumer must NOT normalize (initial state, or an all-<=0 round —
    # same contract as the r4 shape's mx<=0 early return)
    state_h = [fns.init_state.remote(p, scale) for p in n_parts]
    norm_h: int | None = None
    state_a, norm_a = None, None

    def _half_round(state, norm, eparts):
        outs = [fns.half_task.options(num_returns=P).remote(
            eparts[p], state[p], norm, scale, P) for p in range(P)]
        if P == 1:
            outs = [[o] for o in outs]
        merged = [fns.merge_part.options(num_returns=2).remote(
            *[outs[p][q] for p in range(P)]) for q in range(P)]
        new_state = [m[0] for m in merged]
        maxes = ray.get([m[1] for m in merged])
        mx = max((m for m in maxes if m is not None), default=0)
        if mx <= 0:
            return new_state, None
        assert mx <= (2 ** 63 - 1) // scale, (
            "hits: max degree x scale^2 exceeds int64 — lower `scale`")
        return new_state, mx

    for _ in range(iters):
        state_a, norm_a = _half_round(state_h, norm_h, e_by_src)
        state_h, norm_h = _half_round(state_a, norm_a, e_by_dst)

    import ray.data as rd

    return rd.from_arrow_refs([
        fns.final_part.remote(n_parts[p], state_h[p], norm_h,
                              state_a[p], norm_a, scale, node_col)
        for p in range(P)])


_HITS_REMOTES = None


def _hits_remote_fns():
    """Cached raw-task kit for `hits` (defined lazily so importing this
    module never touches `ray`)."""
    global _HITS_REMOTES
    if _HITS_REMOTES is not None:
        return _HITS_REMOTES
    import types

    import ray

    MULT = np.uint64(0x9E3779B97F4A7C15)

    def _pcodes(v: np.ndarray, P: int) -> np.ndarray:
        # one multiply-hash routes v EVERYWHERE (edges, state, nodes)
        return (((v.astype(np.uint64) * MULT) >> np.uint64(33))
                % np.uint64(P)).astype(np.int64)

    def _col64(t: pa.Table, name: str) -> np.ndarray:
        return pc.cast(t[name], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False)

    @ray.remote
    def split_edges(tbl: pa.Table, out_key: str, in_key: str, P: int):
        k = _col64(tbl, out_key)
        o = _col64(tbl, in_key)
        parts = _pcodes(k, P)
        out = tuple(
            pa.table({"k": pa.array(k[parts == p]),
                      "o": pa.array(o[parts == p])}) for p in range(P))
        # num_returns=P unpacks a P-tuple only for P > 1; at P == 1 the
        # single ObjectRef holds the RETURN VALUE itself, so hand back
        # the bare table (callers wrap the ref in a 1-list)
        return out[0] if P == 1 else out

    @ray.remote
    def split_nodes(tbl: pa.Table, node_col: str, P: int):
        v = _col64(tbl, node_col)
        parts = _pcodes(v, P)
        out = tuple(pa.table({"v": pa.array(v[parts == p])})
                    for p in range(P))
        return out[0] if P == 1 else out  # see split_edges

    @ray.remote
    def concat(*tbls: pa.Table) -> pa.Table:
        return pa.concat_tables(tbls)

    @ray.remote
    def init_state(npart: pa.Table, scale: int) -> pa.Table:
        return pa.table({
            "v": npart["v"],
            "s": pa.array(np.full(npart.num_rows, scale, dtype=np.int64))})

    def _normalized(spart: pa.Table, norm, scale: int) -> pa.Table:
        if norm is None:
            return spart
        s = spart["s"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"v": spart["v"], "s": pa.array(s * scale // norm)})

    @ray.remote
    def half_task(epart: pa.Table, spart: pa.Table, norm, scale: int,
                  P: int):
        # local join is exact because both sides are partitioned by the
        # SAME hash of the join key; per-in-key partial sum collapses
        # the task's output to its distinct in-keys before the exchange
        j = epart.join(_normalized(spart, norm, scale), keys=["k"],
                       right_keys=["v"], join_type="inner")
        g = pa.table({"v": j["o"], "s": j["s"]}).group_by(
            ["v"]).aggregate([("s", "sum")])
        v = _col64(g, "v")
        s = _col64(g, "s_sum")
        parts = _pcodes(v, P)
        out = tuple(
            pa.table({"v": pa.array(v[parts == p]),
                      "s": pa.array(s[parts == p])}) for p in range(P))
        return out[0] if P == 1 else out  # see split_edges

    @ray.remote
    def merge_part(*parts: pa.Table):
        t = pa.concat_tables(parts)
        g = t.group_by(["v"]).aggregate([("s", "sum")])
        g = pa.table({"v": g["v"], "s": g["s_sum"]})
        mx = pc.max(g["s"]).as_py() if g.num_rows else None
        return g, mx

    @ray.remote
    def final_part(npart: pa.Table, hpart: pa.Table, norm_h,
                   apart: pa.Table, norm_a, scale: int,
                   node_col: str) -> pa.Table:
        hub = _normalized(hpart, norm_h, scale).rename_columns(
            [node_col, "hub_e6"])
        auth = _normalized(apart, norm_a, scale).rename_columns(
            [node_col, "auth_e6"])
        out = npart.rename_columns([node_col]).join(
            hub, keys=[node_col], join_type="left outer").join(
            auth, keys=[node_col], join_type="left outer")
        return pa.table({
            node_col: out[node_col],
            "hub_e6": pc.fill_null(pc.cast(out["hub_e6"], pa.int64()), 0),
            "auth_e6": pc.fill_null(pc.cast(out["auth_e6"], pa.int64()), 0)})

    _HITS_REMOTES = types.SimpleNamespace(
        split_edges=split_edges, split_nodes=split_nodes, concat=concat,
        init_state=init_state, half_task=half_task, merge_part=merge_part,
        final_part=final_part, pcodes=_pcodes, col64=_col64)
    return _HITS_REMOTES


_PR_REMOTES = None


def _pagerank_remote_fns():
    """Cached raw-task kit for :func:`pagerank` (split/concat/init come
    from the shared :func:`_hits_remote_fns` kit)."""
    global _PR_REMOTES
    if _PR_REMOTES is not None:
        return _PR_REMOTES
    import types

    import ray

    fns = _hits_remote_fns()
    _pcodes, _col64 = fns.pcodes, fns.col64

    @ray.remote
    def attach_outdeg(epart: pa.Table) -> pa.Table:
        # hash(src) co-located every edge of a src in this partition, so
        # the out-degree count is exact without any exchange
        if epart.num_rows == 0:
            return pa.table({"k": pa.array([], pa.int64()),
                             "o": pa.array([], pa.int64()),
                             "od": pa.array([], pa.int64())})
        g = epart.group_by(["k"]).aggregate([("k", "count")])
        j = epart.join(g.rename_columns(["k", "od"]), keys=["k"],
                       join_type="inner")
        return pa.table({"k": j["k"], "o": j["o"],
                         "od": pc.cast(j["od"], pa.int64())})

    @ray.remote
    def tele_part(npart: pa.Table, teleport: int) -> pa.Table:
        return pa.table({
            "v": npart["v"],
            "s": pa.array(np.full(npart.num_rows, teleport,
                                  dtype=np.int64))})

    @ray.remote
    def pr_half(epart: pa.Table, spart: pa.Table, damp: int, den: int,
                P: int):
        # partition-local exact join (both sides keyed by the same hash
        # of the src/v); per-dst partial sum collapses the task's output
        # to its distinct dsts before the exchange
        j = epart.join(spart, keys=["k"], right_keys=["v"],
                       join_type="inner")
        r = j["s"].to_numpy(zero_copy_only=False).astype(np.int64)
        od = j["od"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = (damp * r) // (den * od)
        g = pa.table({"v": j["o"], "s": pa.array(c)}).group_by(
            ["v"]).aggregate([("s", "sum")])
        v = _col64(g, "v")
        s = _col64(g, "s_sum")
        parts = _pcodes(v, P)
        out = tuple(
            pa.table({"v": pa.array(v[parts == p]),
                      "s": pa.array(s[parts == p])}) for p in range(P))
        return out[0] if P == 1 else out  # see split_edges

    @ray.remote
    def pr_merge(tele: pa.Table, *parts: pa.Table) -> pa.Table:
        t = pa.concat_tables(parts + (tele,))
        g = t.group_by(["v"]).aggregate([("s", "sum")])
        return pa.table({"v": g["v"], "s": g["s_sum"]})

    @ray.remote
    def pr_final(state: pa.Table, node_col: str) -> pa.Table:
        return state.rename_columns([node_col, "pr_e9"])

    @ray.remote
    def pr_final_join(npart: pa.Table, state: pa.Table,
                      node_col: str) -> pa.Table:
        out = npart.rename_columns([node_col]).join(
            state.rename_columns([node_col, "pr_e9"]), keys=[node_col],
            join_type="left outer")
        return pa.table({
            node_col: out[node_col],
            "pr_e9": pc.fill_null(pc.cast(out["pr_e9"], pa.int64()), 0)})

    _PR_REMOTES = types.SimpleNamespace(
        attach_outdeg=attach_outdeg, tele_part=tele_part, pr_half=pr_half,
        pr_merge=pr_merge, pr_final=pr_final, pr_final_join=pr_final_join)
    return _PR_REMOTES


def _distinct_nonloop_edges(edges_ds, src: str, dst: str, fanin: int):
    """DISTINCT non-loop ``(src, dst)`` pairs as int64 — the shared
    prelude of :func:`reciprocity` / :func:`degree_assortativity` (one
    hashpart grouped count collapses multi-edges)."""

    def _clean(b: pa.Table) -> pa.Table:
        t = pa.table({src: pc.cast(b[src], pa.int64()),
                      dst: pc.cast(b[dst], pa.int64())})
        return t.filter(pc.invert(pc.equal(t[src], t[dst])))

    return grouped_sum_parts(
        edges_ds.map_batches(_clean, batch_format="pyarrow"),
        [src, dst], [], count_col="n", fanin=fanin).drop_columns(["n"])


def reciprocity(edges_ds, *, src: str = "src", dst: str = "dst",
                num_partitions: int = 4, fanin: int = 8):
    """Edge reciprocity of a directed graph: the fraction of distinct
    non-loop edges (u, v) whose reverse (v, u) is also present. ONE row:
    ``(n_edges, n_recip, recip_num, recip_den, reciprocity)`` — exact
    reduced fraction (gcd) plus the one-expression float. Shape: distinct
    via one hashpart grouped count, then one hash join of the edge set
    against its own reversal — never all-pairs, never a broadcast."""
    import math

    import pandas as pd

    dedup = _distinct_nonloop_edges(edges_ds, src, dst, fanin)
    rev = dedup.map_batches(
        lambda b: pa.table({src: b[dst], dst: b[src]}),
        batch_format="pyarrow")
    j = dedup.join(rev, join_type="inner", num_partitions=num_partitions,
                   on=(src, dst))
    n_edges = dedup.count()
    n_recip = j.count()
    g = math.gcd(n_recip, n_edges) or 1
    return pd.DataFrame({
        "n_edges": [n_edges], "n_recip": [n_recip],
        # empty graph: 0/1 (a well-formed zero), not the malformed 0/0
        "recip_num": [n_recip // g], "recip_den": [(n_edges // g) or 1],
        "reciprocity": [float(n_recip) / n_edges if n_edges else None]})


def degree_assortativity(edges_ds, *, src: str = "src", dst: str = "dst",
                         num_partitions: int = 4, fanin: int = 8):
    """Directed out-in degree assortativity (Newman, PRL 89:208701
    (2002), eq. 4 in Pearson form): over the DISTINCT non-loop edge set,
    the Pearson correlation of (out-degree of the source, in-degree of
    the target). ONE output row of exact int64 sufficient statistics
    ``(n, sum_x, sum_y, sum_xy, sum_xx, sum_yy)`` + the pinned-IEEE
    ``corr`` (`correlate._corr_from_stats` — identical expression to the
    SQL). Shape: two hashpart degree counts + two hash joins attach the
    endpoint degrees; partials collapse per block before one tiny merge."""
    dedup = _distinct_nonloop_edges(edges_ds, src, dst, fanin)
    outdeg = grouped_sum_parts(
        dedup.map_batches(lambda b: pa.table({src: b[src]}),
                          batch_format="pyarrow"),
        [src], [], count_col="outdeg", fanin=fanin)
    indeg = grouped_sum_parts(
        dedup.map_batches(lambda b: pa.table({dst: b[dst]}),
                          batch_format="pyarrow"),
        [dst], [], count_col="indeg", fanin=fanin)
    e = dedup.join(outdeg, join_type="inner",
                   num_partitions=num_partitions, on=(src,))
    e = e.join(indeg, join_type="inner",
               num_partitions=num_partitions, on=(dst,))

    def _partial(b: pa.Table) -> pa.Table:
        x = b["outdeg"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = b["indeg"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "n": pa.array([np.int64(len(x))]),
            "sum_x": pa.array([x.sum()]), "sum_y": pa.array([y.sum()]),
            "sum_xy": pa.array([(x * y).sum()]),
            "sum_xx": pa.array([(x * x).sum()]),
            "sum_yy": pa.array([(y * y).sum()])})

    def _merge(b: pa.Table) -> pa.Table:
        import pyarrow as _pa
        return _pa.table({c: _pa.array(
            [b[c].to_numpy(zero_copy_only=False).astype(np.int64).sum()])
            for c in ("n", "sum_x", "sum_y", "sum_xy", "sum_xx", "sum_yy")})

    from .correlate import _corr_from_stats

    partials = e.map_batches(_partial, batch_format="pyarrow")
    merged = partials.repartition(1).map_batches(
        _merge, batch_format="pyarrow")
    return merged.map_batches(_corr_from_stats, batch_format="pyarrow")


def sssp(edges_ds, *, src: str = "src", dst: str = "dst", w: str = "w",
         source_node: int = 0, rounds: int = 6, num_partitions: int = 8):
    """Single-source shortest paths over a WEIGHTED directed edge set
    via ``rounds`` Bellman-Ford relaxation rounds — the weighted
    companion to the frontier BFS (``bfs_hops_docs``): exact for every
    node whose shortest path uses <= ``rounds`` edges (pass the graph
    diameter; the SQL oracle replays the same bounded recursion, so
    the bound is part of the operator contract, not an approximation
    gap).

    Per round: ONE hash join of the current distance table against the
    edge set (``joins.hash_inner_join`` — tagged-union, no extra actor
    pools), a union with the standing distances, and ONE hashpart
    grouped min. The distance table is node-bounded (ids + one int64),
    so the per-round ``materialize()`` barrier holds the frontier
    state, never the edge set — the same state-never-broadcast
    discipline as :func:`hits`/:func:`pagerank`. Edges stream from
    their dataset each round.

    Returns ``(node, dist)`` int64 for every node reached within
    ``rounds`` relaxations. Int64 distances — exact.
    """
    import ray.data as rd

    from ..arrow_utils import rename_agg, stable_part_codes
    from .joins import hash_inner_join

    if rounds < 1:
        raise ValueError("sssp: rounds must be >= 1")
    mod = num_partitions * 64

    def _canon(b: pa.Table) -> pa.Table:
        return pa.table({"node": b[src], "__dst": b[dst], "__w": b[w]})

    edges = edges_ds.map_batches(_canon, batch_format="pyarrow")

    dist = rd.from_arrow(pa.table({
        "node": pa.array([int(source_node)], pa.int64()),
        "dist": pa.array([0], pa.int64())})).materialize()

    def _relaxed(b: pa.Table) -> pa.Table:
        d = b["dist"].to_numpy(zero_copy_only=False).astype(np.int64)
        ww = b["__w"].to_numpy(zero_copy_only=False).astype(np.int64)
        dst_ids = b["__dst"]
        return pa.table({"node": dst_ids, "dist": pa.array(d + ww)})

    def _min_part(b: pa.Table) -> pa.Table:
        m = b.group_by(["node"]).aggregate([("dist", "min")])
        m = rename_agg(m, {"node": "node", "dist_min": "dist"})
        h = stable_part_codes(m["node"], mod)
        return m.append_column("__part", pa.array(h))

    def _min_merge(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        m = t.group_by(["node"]).aggregate([("dist", "min")])
        return rename_agg(m, {"node": "node", "dist_min": "dist"})

    for _ in range(rounds):
        cand = hash_inner_join(edges, dist, on="node",
                               num_partitions=num_partitions)
        relaxed = cand.map_batches(_relaxed, batch_format="pyarrow")
        merged = dist.union(relaxed).map_batches(
            _min_part, batch_format="pyarrow")
        dist = merged.repartition(num_partitions).groupby(
            "__part").map_groups(
                _min_merge, batch_format="pyarrow").materialize()
    return dist



def mis_rounds(edges_ds, nodes_ds, *, node_col: str = "node",
               src: str = "src", dst: str = "dst", rounds: int = 6,
               num_partitions: int = 8):
    """Maximal-independent-set construction by deterministic
    greedy-by-id rounds (the Luby 1986 schema with node id as the
    fixed priority): each round, every REMAINING node with no smaller
    remaining neighbor joins the MIS; the joiners and their remaining
    neighbors leave the pool. After ``rounds`` rounds the undecided
    remainder (if any) is simply not emitted — the bounded-round
    contract shared with :func:`sssp` / the frontier BFS, replayed
    identically by the SQL oracle.

    Returns ``(node, round)`` for every MIS member (round is
    1-based). Isolated nodes join in round 1.

    Scale shape — the kcore/bfs/boruvka bounded-NODE contract: the
    EDGE set only ever streams (per round ONE broadcast-lookup map
    with in-block min pre-reduction + ONE hashpart grouped min; a
    second streamed pass marks the joiners' neighbors), while the
    node-bounded remaining/MIS sets are driver-held numpy state. A
    first cut kept the pool distributed (two tagged-union joins, a
    grouped min and an anti join PER ROUND) — identical output, ~15
    small pipeline barriers per round of pure fixed overhead at toy
    scale; see the boruvka_mst note."""
    import ray as _ray
    import ray.data as rd

    from ..arrow_utils import rename_agg, stable_part_codes

    if rounds < 1:
        raise ValueError("mis_rounds: rounds must be >= 1")
    mod = num_partitions * 64

    def _canon(b: pa.Table) -> pa.Table:
        return pa.table({"a": pc.cast(b[src], pa.int64()),
                         "b": pc.cast(b[dst], pa.int64())})

    edges = edges_ds.map_batches(_canon,
                                 batch_format="pyarrow").materialize()
    nodes = np.sort(np.unique(np.concatenate([
        t["node"].to_numpy(zero_copy_only=False) for t in _ray.get(
            nodes_ds.map_batches(
                lambda b: pa.table({"node": pc.cast(b[node_col],
                                                    pa.int64())}),
                batch_format="pyarrow").to_arrow_refs())])))
    remaining = np.ones(len(nodes), dtype=bool)
    mis_nodes, mis_round = [], []

    for rnd in range(1, rounds + 1):
        if not remaining.any():
            break
        rem_ref = _ray.put((nodes, remaining))

        def _min_nbr(b: pa.Table, _ref=rem_ref) -> pa.Table:
            nds, rem = _ray.get(_ref)
            a = b["a"].to_numpy(zero_copy_only=False)
            bb = b["b"].to_numpy(zero_copy_only=False)
            keep = rem[np.searchsorted(nds, a)] \
                & rem[np.searchsorted(nds, bb)]
            t = pa.table({"node": pa.array(a[keep]),
                          "nbr": pa.array(bb[keep])})
            m = t.group_by(["node"]).aggregate([("nbr", "min")])
            m = rename_agg(m, {"node": "node", "nbr_min": "mn"})
            h = stable_part_codes(m["node"], mod)
            return m.append_column("__part", pa.array(h))

        def _min_merge(g: pa.Table) -> pa.Table:
            t = g.drop_columns(["__part"])
            m = t.group_by(["node"]).aggregate([("mn", "min")])
            return rename_agg(m, {"node": "node", "mn_min": "mn"})

        mins = [t for t in _ray.get(
            edges.map_batches(_min_nbr, batch_format="pyarrow")
            .repartition(num_partitions).groupby("__part").map_groups(
                _min_merge, batch_format="pyarrow").to_arrow_refs())
            if t.num_rows > 0]
        # bounded driver read: one (node, min remaining neighbor) row
        # per remaining non-isolated node
        blocked = np.zeros(len(nodes), dtype=bool)
        nbr_of = {}
        if mins:
            mt = pa.concat_tables(mins)
            mn_node = mt["node"].to_numpy(zero_copy_only=False)
            mn_val = mt["mn"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(nodes, mn_node)
            blocked[pos[mn_val < mn_node]] = True
        joiners = remaining & ~blocked
        j_ids = nodes[joiners]
        if len(j_ids) == 0:
            break
        mis_nodes.append(j_ids)
        mis_round.append(np.full(len(j_ids), rnd, np.int64))
        # second streamed pass: neighbors of the joiners leave the pool
        j_ref = _ray.put(j_ids)

        def _nbrs(b: pa.Table, _ref=j_ref) -> pa.Table:
            js = _ray.get(_ref)
            a = b["a"].to_numpy(zero_copy_only=False)
            bb = b["b"].to_numpy(zero_copy_only=False)
            ins = np.searchsorted(js, a)
            ins = np.clip(ins, 0, len(js) - 1)
            hit = js[ins] == a
            return pa.table({"n": pa.array(np.unique(bb[hit]))})

        kills = [t["n"].to_numpy(zero_copy_only=False)
                 for t in _ray.get(edges.map_batches(
                     _nbrs, batch_format="pyarrow").to_arrow_refs())
                 if t.num_rows > 0]
        kill = np.unique(np.concatenate(kills + [j_ids])) if kills \
            else j_ids
        remaining[np.searchsorted(nodes, kill)] = False

    if not mis_nodes:
        return rd.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "round": pa.array([], pa.int64())}))
    return rd.from_arrow(pa.table({
        "node": pa.array(np.concatenate(mis_nodes)),
        "round": pa.array(np.concatenate(mis_round))}))


def boruvka_mst(edges_ds, nodes_ds, *, node_col: str = "node",
                src: str = "src", dst: str = "dst", w: str = "w",
                rounds: int = 8, num_partitions: int = 8):
    """Minimum spanning forest by deterministic BORUVKA rounds — the
    classic distributed MST (Boruvka 1926; the GBBS/Pregel workhorse):
    every component picks its lightest outgoing edge under the
    UNDIRECTED canonical total order ``(w, min(a,b), max(a,b))``
    (consistency guarantees the pointer graph's only cycles are
    2-cycles, broken toward the smaller label), picked edges contract
    components, repeat. Components at least halve per round, so
    ``rounds >= ceil(log2 n)`` yields the exact MSF; the SQL oracle
    replays the identical fixed rounds (no-op trailing rounds are
    empty on both sides) with pointer-jump CTEs.

    Returns the forest edges ``(u, v, w)`` (canonical u < v,
    distinct) — pytest-verified equal to Kruskal under the same tie
    order.

    Scale shape — the kcore/bfs bounded-NODE contract: the EDGE set
    only ever streams (per round: one broadcast-lookup map with
    in-block pre-reduction + one hashpart lightest-edge reduction;
    never pulled, never shuffled whole), while the node-bounded label
    vector is driver-held state updated by numpy pointer contraction,
    exactly like the k-core peel's degree table and the BFS frontier.
    Per round the driver reads only the per-component chosen edges
    (<= component count <= nodes). Edges >> nodes is the operating
    regime (domain-level web graphs)."""
    import ray as _ray
    import ray.data as rd

    from ..arrow_utils import stable_part_codes

    if rounds < 1:
        raise ValueError("boruvka_mst: rounds must be >= 1")
    mod = num_partitions * 64

    def _canon(b: pa.Table) -> pa.Table:
        return pa.table({"a": pc.cast(b[src], pa.int64()),
                         "b": pc.cast(b[dst], pa.int64()),
                         "w": pc.cast(b[w], pa.int64())})

    edges = edges_ds.map_batches(_canon,
                                 batch_format="pyarrow").materialize()
    nodes = np.sort(np.unique(np.concatenate([
        t["node"].to_numpy(zero_copy_only=False) for t in _ray.get(
            nodes_ds.map_batches(
                lambda b: pa.table({"node": pc.cast(b[node_col],
                                                    pa.int64())}),
                batch_format="pyarrow").to_arrow_refs())])))
    lbl = nodes.copy()  # node-bounded driver state (the kcore contract)

    def _sel_keys(t: pa.Table) -> pa.Table:
        t = t.take(pc.sort_indices(t, sort_keys=[
            ("la", "ascending"), ("w", "ascending"),
            ("cu", "ascending"), ("cv", "ascending")]))
        la = t["la"].to_numpy(zero_copy_only=False)
        heads = np.ones(len(la), dtype=bool)
        heads[1:] = la[1:] != la[:-1]
        return t.filter(pa.array(heads))

    mst_u, mst_v, mst_w = [], [], []
    for _ in range(rounds):
        lbl_ref = _ray.put((nodes, lbl))  # broadcast ONCE per round

        def _cross_choose(b: pa.Table, _ref=lbl_ref) -> pa.Table:
            nds, lb = _ray.get(_ref)
            a = b["a"].to_numpy(zero_copy_only=False)
            bb = b["b"].to_numpy(zero_copy_only=False)
            ww = b["w"].to_numpy(zero_copy_only=False)
            la = lb[np.searchsorted(nds, a)]
            lbv = lb[np.searchsorted(nds, bb)]
            keep = la != lbv
            cu = np.minimum(a, bb)[keep]
            cv = np.maximum(a, bb)[keep]
            t = pa.table({
                "la": pa.array(np.concatenate([la[keep], lbv[keep]])),
                "lb": pa.array(np.concatenate([lbv[keep], la[keep]])),
                "w": pa.array(np.concatenate([ww[keep], ww[keep]])),
                "cu": pa.array(np.concatenate([cu, cu])),
                "cv": pa.array(np.concatenate([cv, cv]))})
            t = _sel_keys(t)  # in-block pre-reduction before the shuffle
            h = stable_part_codes(t["la"], mod)
            return t.append_column("__part", pa.array(h))

        def _sel_merge(g: pa.Table) -> pa.Table:
            return _sel_keys(g.drop_columns(["__part"]))

        chosen_tbls = [
            t for t in _ray.get(
                edges.map_batches(_cross_choose, batch_format="pyarrow")
                .repartition(num_partitions).groupby("__part").map_groups(
                    _sel_merge, batch_format="pyarrow").to_arrow_refs())
            if t.num_rows > 0]
        if not chosen_tbls:
            break
        chosen = pa.concat_tables(chosen_tbls)
        # bounded driver read: <= one edge per component
        la = chosen["la"].to_numpy(zero_copy_only=False)
        lb2 = chosen["lb"].to_numpy(zero_copy_only=False)
        mst_u.append(chosen["cu"].to_numpy(zero_copy_only=False))
        mst_v.append(chosen["cv"].to_numpy(zero_copy_only=False))
        mst_w.append(chosen["w"].to_numpy(zero_copy_only=False))
        # pointer contraction: ptr[la] = lb, 2-cycle break toward the
        # smaller label, then full path compression
        ptr = {int(c): int(p) for c, p in zip(la, lb2)}
        for c, p in list(ptr.items()):
            if ptr.get(p) == c and c < p:
                ptr[c] = c

        def _root(c: int) -> int:
            path = []
            while ptr.get(c, c) != c:
                path.append(c)
                c = ptr[c]
            for q in path:
                ptr[q] = c
            return c

        res = {c: _root(c) for c in ptr}
        lbl = np.array([res.get(int(x), int(x)) for x in lbl],
                       dtype=np.int64)

    if not mst_u:
        return rd.from_arrow(pa.table({"u": pa.array([], pa.int64()),
                                       "v": pa.array([], pa.int64()),
                                       "w": pa.array([], pa.int64())}))
    forest = pa.table({"u": pa.array(np.concatenate(mst_u)),
                       "v": pa.array(np.concatenate(mst_v)),
                       "w": pa.array(np.concatenate(mst_w))})
    # distinct: each undirected edge is chosen from both of its sides
    forest = forest.group_by(["u", "v", "w"]).aggregate([])
    return rd.from_arrow(forest)


def single_linkage(edges_ds, nodes_ds, *, threshold: int,
                   node_col: str = "node", src: str = "src",
                   dst: str = "dst", w: str = "w", rounds: int = 8,
                   num_partitions: int = 8):
    """SINGLE-LINKAGE clustering at a distance ``threshold`` via the
    Boruvka forest: cut every MSF edge with ``w > threshold`` — the
    classic identity that single-linkage components at level T equal
    the connected components of the T-thresholded graph, with the MSF
    as the (node-bounded!) certificate. Output per cluster:
    ``(cluster, n_nodes)`` with ``cluster`` the member-minimum node id
    (singletons included).

    Scale shape: all the heavy lifting is :func:`boruvka_mst` (edges
    stream, node-bounded state); the final cut + union-find runs on
    the FOREST (< n edges) driver-side under the same bounded-node
    contract."""
    import ray as _ray
    import ray.data as rd

    forest = boruvka_mst(edges_ds, nodes_ds, node_col=node_col, src=src,
                         dst=dst, w=w, rounds=rounds,
                         num_partitions=num_partitions)
    ft = pa.concat_tables(_ray.get(forest.to_arrow_refs()))
    nodes = np.sort(np.unique(np.concatenate([
        t["node"].to_numpy(zero_copy_only=False) for t in _ray.get(
            nodes_ds.map_batches(
                lambda b: pa.table({"node": pc.cast(b[node_col],
                                                    pa.int64())}),
                batch_format="pyarrow").to_arrow_refs())])))
    parent = {int(n): int(n) for n in nodes}

    def _find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    if ft.num_rows:
        uu = ft["u"].to_numpy(zero_copy_only=False)
        vv = ft["v"].to_numpy(zero_copy_only=False)
        ww = ft["w"].to_numpy(zero_copy_only=False)
        keep = ww <= threshold
        for a, b in zip(uu[keep], vv[keep]):
            ra, rb = _find(int(a)), _find(int(b))
            if ra != rb:
                # union toward the smaller root: cluster id = min member
                if ra < rb:
                    parent[rb] = ra
                else:
                    parent[ra] = rb
    counts: dict[int, int] = {}
    for n in nodes:
        r = _find(int(n))
        counts[r] = counts.get(r, 0) + 1
    ks = sorted(counts)
    return rd.from_arrow(pa.table({
        "cluster": pa.array(ks, pa.int64()),
        "n_nodes": pa.array([counts[k] for k in ks], pa.int64())}))


def wl_refinement(edges_ds, nodes_ds, *, node_col: str = "node",
                  src: str = "src", dst: str = "dst", fanin: int = 4):
    """One round of Weisfeiler-Lehman color refinement over the graph
    (Weisfeiler & Lehman 1968; the graph-fingerprint primitive behind
    WL kernels and GNN expressiveness): initial color = degree; the
    refined color of a node is the md5-u64 of ``deg:[sorted neighbor
    degrees joined by ,]``. Output: the refined color HISTOGRAM
    ``(wl_color, n_nodes)`` — the per-graph fingerprint (isolated
    nodes hash ``0:[]``).

    Scale shape: degrees are one hashpart grouped count (node-bounded)
    broadcast back with ``ray.put`` (the small-side pattern); the
    refinement pass streams the edge set once, building each node's
    neighbor-degree multiset with one lexsort per block partial, then
    a hashpart merge re-sorts the (bounded) per-node lists. The
    md5-u64 convention is the catalog-wide one, so SQL replays every
    hash."""
    import ray as _ray
    import ray.data as rd

    from ..arrow_utils import rename_agg, stable_part_codes
    from .dedup import _stable_u64

    def _canon(b: pa.Table) -> pa.Table:
        return pa.table({"a": pc.cast(b[src], pa.int64()),
                         "b": pc.cast(b[dst], pa.int64())})

    edges = edges_ds.map_batches(_canon,
                                 batch_format="pyarrow").materialize()
    nodes = np.sort(np.unique(np.concatenate([
        t["node"].to_numpy(zero_copy_only=False) for t in _ray.get(
            nodes_ds.map_batches(
                lambda b: pa.table({"node": pc.cast(b[node_col],
                                                    pa.int64())}),
                batch_format="pyarrow").to_arrow_refs())])))
    # degree table: node-bounded; built distributed, broadcast once
    deg_tbls = _ray.get(edges.map_batches(
        lambda b: b.group_by(["a"]).aggregate([("b", "count")]),
        batch_format="pyarrow").to_arrow_refs())
    deg = np.zeros(len(nodes), dtype=np.int64)
    for t in deg_tbls:
        if t.num_rows:
            pos = np.searchsorted(nodes, t["a"].to_numpy(
                zero_copy_only=False))
            np.add.at(deg, pos, t["b_count"].to_numpy(
                zero_copy_only=False))
    deg_ref = _ray.put((nodes, deg))

    def _partial(b: pa.Table, _ref=deg_ref) -> pa.Table:
        nds, dg = _ray.get(_ref)
        a = b["a"].to_numpy(zero_copy_only=False)
        bb = b["b"].to_numpy(zero_copy_only=False)
        nd = dg[np.searchsorted(nds, bb)]
        t = pa.table({"node": pa.array(a), "nd": pa.array(nd)})
        h = stable_part_codes(t["node"], 256)
        return t.append_column("__part", pa.array(h))

    def _merge(g: pa.Table, _ref=deg_ref) -> pa.Table:
        nds, dg = _ray.get(_ref)
        t = g.drop_columns(["__part"])
        empty = pa.table({"wl_color": pa.array([], pa.int64()),
                          "n_nodes": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        t = t.take(pc.sort_indices(t, sort_keys=[
            ("node", "ascending"), ("nd", "ascending")]))
        node = t["node"].to_numpy(zero_copy_only=False)
        nd = t["nd"].to_numpy(zero_copy_only=False)
        heads = np.ones(len(node), dtype=bool)
        heads[1:] = node[1:] != node[:-1]
        seg = np.flatnonzero(heads)
        seg_len = np.diff(np.append(seg, len(node)))
        colors = []
        for si, f0 in enumerate(seg):
            nid = int(node[f0])
            d0 = int(dg[np.searchsorted(nds, nid)])
            lst = ",".join(str(int(x))
                           for x in nd[f0:f0 + int(seg_len[si])])
            s = f"{d0}:[{lst}]"
            # u64 stored shifted into int64 (the KMV convention);
            # plain Python ints: uint64 wraparound would overflow here
            colors.append(_stable_u64(s.encode()) - (1 << 63))
        ct = pa.table({"wl_color": pa.array(colors, pa.int64()),
                       "one": pa.array(np.ones(len(colors), np.int64))})
        m = ct.group_by(["wl_color"]).aggregate([("one", "sum")])
        return rename_agg(m, {"wl_color": "wl_color",
                              "one_sum": "n_nodes"})

    parts = edges.map_batches(_partial, batch_format="pyarrow") \
        .repartition(fanin).groupby("__part").map_groups(
            _merge, batch_format="pyarrow")
    hist = grouped_sum_parts(parts, ["wl_color"], ["n_nodes"],
                             count_col=None, fanin=fanin)
    # isolated nodes never enter the edge stream: add them as one
    # bounded row ("0:[]" color) if any exist
    n_iso = int((deg == 0).sum())
    if n_iso:
        iso_color = _stable_u64(b"0:[]") - (1 << 63)
        iso = rd.from_arrow(pa.table({
            "wl_color": pa.array([iso_color], pa.int64()),
            "n_nodes": pa.array([n_iso], pa.int64())}))
        hist = grouped_sum_parts(hist.union(iso), ["wl_color"],
                                 ["n_nodes"], count_col=None,
                                 fanin=fanin)
    return hist


def katz_rounds(edges_ds, nodes_ds, *, node_col: str = "node",
                src: str = "src", dst: str = "dst", rounds: int = 4,
                num_partitions: int = 8):
    """Katz centrality by fixed-point INTEGER iteration (Katz 1953;
    the attenuation-walk counterpart of the PageRank/HITS rows):
    ``x_{k+1}[v] = 1000 + (sum over in-neighbors of x_k) >> 3`` —
    attenuation 1/8 as an arithmetic shift and a scaled +1000 unit, so
    after ``rounds`` rounds every score is exact int64 and the SQL
    replay is bit-identical (the EWMA/Holt fixed-point convention
    applied to a graph recursion). Converges when alpha = 1/8 < 1 /
    spectral-radius; the bounded round count is part of the replayed
    contract (bfs/sssp family). Output: ``(node, katz)``.

    Scale shape: per round ONE broadcast-lookup edge map with in-block
    partial sums + ONE hashpart grouped sum; the node-bounded score
    vector is driver-held state (the kcore/boruvka contract), edges
    only ever stream."""
    import ray as _ray
    import ray.data as rd

    from ..arrow_utils import rename_agg, stable_part_codes

    if rounds < 1:
        raise ValueError("katz_rounds: rounds must be >= 1")
    mod = num_partitions * 64

    def _canon(b: pa.Table) -> pa.Table:
        return pa.table({"a": pc.cast(b[src], pa.int64()),
                         "b": pc.cast(b[dst], pa.int64())})

    edges = edges_ds.map_batches(_canon,
                                 batch_format="pyarrow").materialize()
    nodes = np.sort(np.unique(np.concatenate([
        t["node"].to_numpy(zero_copy_only=False) for t in _ray.get(
            nodes_ds.map_batches(
                lambda b: pa.table({"node": pc.cast(b[node_col],
                                                    pa.int64())}),
                batch_format="pyarrow").to_arrow_refs())])))
    x = np.full(len(nodes), 1000, dtype=np.int64)

    for _ in range(rounds):
        x_ref = _ray.put((nodes, x))

        def _contrib(b: pa.Table, _ref=x_ref) -> pa.Table:
            nds, xv = _ray.get(_ref)
            a = b["a"].to_numpy(zero_copy_only=False)
            bb = b["b"].to_numpy(zero_copy_only=False)
            # edge (a -> b): b receives x[a]
            t = pa.table({"node": pa.array(bb),
                          "s": pa.array(xv[np.searchsorted(nds, a)])})
            g = t.group_by(["node"]).aggregate([("s", "sum")])
            g = rename_agg(g, {"node": "node", "s_sum": "s"})
            h = stable_part_codes(g["node"], mod)
            return g.append_column("__part", pa.array(h))

        def _merge(g: pa.Table) -> pa.Table:
            t = g.drop_columns(["__part"])
            m = t.group_by(["node"]).aggregate([("s", "sum")])
            return rename_agg(m, {"node": "node", "s_sum": "s"})

        sums = [t for t in _ray.get(
            edges.map_batches(_contrib, batch_format="pyarrow")
            .repartition(num_partitions).groupby("__part").map_groups(
                _merge, batch_format="pyarrow").to_arrow_refs())
            if t.num_rows > 0]
        nx = np.full(len(nodes), 1000, dtype=np.int64)
        if sums:
            st = pa.concat_tables(sums)
            pos = np.searchsorted(nodes, st["node"].to_numpy(
                zero_copy_only=False))
            # scores are non-negative, so >> 3 is plain floor division
            nx[pos] += st["s"].to_numpy(zero_copy_only=False) >> 3
        x = nx

    return rd.from_arrow(pa.table({"node": pa.array(nodes),
                                   "katz": pa.array(x)}))


def double_sweep(edges_ds, nodes_ds, *, node_col: str = "node",
                 src: str = "src", dst: str = "dst", rounds: int = 6,
                 num_partitions: int = 8):
    """Double-sweep BFS diameter lower bound (Magnien-Latapy-Habib
    2009 — the standard cheap diameter estimator): BFS from a fixed
    source (the minimum node id), pick the farthest reached node
    (ties -> smallest id), BFS again from it; the second eccentricity
    is a diameter lower bound that is exact on trees and empirically
    tight on web graphs. Both sweeps are bounded to ``rounds`` hops
    (the bfs_hops contract, replayed identically). Output ONE row:
    ``(src_node, src_ecc, far_node, far_ecc)`` with ``far_ecc`` the
    diameter lower bound.

    Scale shape: per hop ONE broadcast-frontier edge map + distinct
    (the frontier BFS shape); node-bounded visited state driver-held
    (kcore contract); edges only ever stream."""
    import ray as _ray
    import ray.data as rd

    if rounds < 1:
        raise ValueError("double_sweep: rounds must be >= 1")

    def _canon(b: pa.Table) -> pa.Table:
        return pa.table({"a": pc.cast(b[src], pa.int64()),
                         "b": pc.cast(b[dst], pa.int64())})

    edges = edges_ds.map_batches(_canon,
                                 batch_format="pyarrow").materialize()
    nodes = np.sort(np.unique(np.concatenate([
        t["node"].to_numpy(zero_copy_only=False) for t in _ray.get(
            nodes_ds.map_batches(
                lambda b: pa.table({"node": pc.cast(b[node_col],
                                                    pa.int64())}),
                batch_format="pyarrow").to_arrow_refs())])))

    def _bfs(start: int):
        """hop vector over ``nodes`` (-1 unreached), bounded rounds."""
        hop = np.full(len(nodes), -1, dtype=np.int64)
        hop[np.searchsorted(nodes, start)] = 0
        frontier = np.array([start], dtype=np.int64)
        for h in range(1, rounds + 1):
            f_ref = _ray.put(frontier)

            def _next(b: pa.Table, _ref=f_ref) -> pa.Table:
                fr = _ray.get(_ref)
                a = b["a"].to_numpy(zero_copy_only=False)
                bb = b["b"].to_numpy(zero_copy_only=False)
                ins = np.clip(np.searchsorted(fr, a), 0, len(fr) - 1)
                hit = fr[ins] == a
                return pa.table({"n": pa.array(np.unique(bb[hit]))})

            ring = [t["n"].to_numpy(zero_copy_only=False)
                    for t in _ray.get(edges.map_batches(
                        _next, batch_format="pyarrow").to_arrow_refs())
                    if t.num_rows > 0]
            if not ring:
                break
            cand = np.unique(np.concatenate(ring))
            pos = np.searchsorted(nodes, cand)
            new = pos[hop[pos] < 0]
            if len(new) == 0:
                break
            hop[new] = h
            frontier = nodes[new]
        return hop

    s0 = int(nodes[0])
    hop0 = _bfs(s0)
    ecc0 = int(hop0.max())
    far = int(nodes[hop0 == ecc0].min())  # ties -> smallest id
    hop1 = _bfs(far)
    ecc1 = int(hop1.max())
    return rd.from_arrow(pa.table({
        "src_node": pa.array([s0], pa.int64()),
        "src_ecc": pa.array([ecc0], pa.int64()),
        "far_node": pa.array([far], pa.int64()),
        "far_ecc": pa.array([ecc1], pa.int64())}))
