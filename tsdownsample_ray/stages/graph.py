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

__all__ = ["extract_links_batch", "grouped_sum_parts", "pagerank"]


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
             num_partitions: int = 4, fanin: int = 8):
    """Integer fixed-point PageRank over ``edges_ds(src, dst)`` /
    ``nodes_ds(node_col)``. Returns one row per node:
    ``(node_col, pr_e9)`` with ``pr_e9`` the rank after ``iters``
    iterations at fixed-point ``scale``.

    Nodes with no out-edges leak their mass (no dangling redistribution)
    and nodes with no in-edges hold the teleport constant — both choices
    are deterministic and replayed by the SQL oracle. See the module
    docstring for the exactness/overflow contract.
    """
    import ray.data as rd

    teleport = (den - damp) * scale // den

    # out-degree once, attached to edges once, reused every iteration
    deg = grouped_sum_parts(
        edges_ds.map_batches(lambda b: pa.table({src: b[src]}),
                             batch_format="pyarrow"),
        [src], [], count_col="outdeg", fanin=fanin)
    edges = edges_ds.join(deg, join_type="inner",
                          num_partitions=num_partitions,
                          on=(src,)).materialize()

    def _init(b: pa.Table) -> pa.Table:
        return pa.table({
            "v": pc.cast(b[node_col], pa.int64()),
            "r": pa.array(np.full(b.num_rows, scale, dtype=np.int64))})

    def _tele(b: pa.Table) -> pa.Table:
        return pa.table({
            dst: pc.cast(b[node_col], pa.int64()),
            "c": pa.array(np.full(b.num_rows, teleport, dtype=np.int64))})

    ranks = nodes_ds.map_batches(_init, batch_format="pyarrow").materialize()
    tele = nodes_ds.map_batches(_tele, batch_format="pyarrow").materialize()

    def _contrib(b: pa.Table) -> pa.Table:
        r = b["r"].to_numpy(zero_copy_only=False).astype(np.int64)
        od = b["outdeg"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = (damp * r) // (den * od)
        return pa.table({dst: pc.cast(b[dst], pa.int64()),
                         "c": pa.array(c)})

    for _ in range(iters):
        j = edges.join(ranks, join_type="inner",
                       num_partitions=num_partitions,
                       on=(src,), right_on=("v",))
        contrib = j.map_batches(_contrib, batch_format="pyarrow")
        agg = grouped_sum_parts(contrib.union(tele), [dst], ["c"],
                                count_col=None, fanin=fanin)
        ranks = agg.map_batches(
            lambda b: pa.table({"v": b[dst], "r": b["c"]}),
            batch_format="pyarrow").materialize()

    return ranks.map_batches(
        lambda b: pa.table({node_col: b["v"], "pr_e9": b["r"]}),
        batch_format="pyarrow")


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
