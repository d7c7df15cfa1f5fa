"""Link graph extraction and PageRank.

Split from the former pipelines/queries.py monolith (r4 verdict
next-round #5); statement order inside this module is the original
file order. Explicit cross-module imports are generated: backward
dependencies at the top, forward (function-body-only) dependencies at
the bottom so package import order stays acyclic.
"""
from __future__ import annotations

from ._shared import _read_parquet_clean, pa, pc

# ---------------------------------------------------------------------------
# link graph + PageRank (stages/graph.py)
# ---------------------------------------------------------------------------

def _graph_targets(doc_id, n_docs):
    """Deterministic out-links: doc d -> (d*31 + 97*j) % N for j=1..3.
    Multi-edges/self-loops possible by construction; both sides (NumPy and
    SQL) treat them identically (each edge contributes separately)."""
    import numpy as np

    d = doc_id.astype(np.int64)
    return [(d * 31 + 97 * j) % n_docs for j in (1, 2, 3)]


def q_link_graph_docs(sf_dir: str):
    """Link-graph build over href-bearing HTML: synthesize 3 deterministic
    ``<a href>`` links per document (the shared corpus html is link-free by
    design — its byte-identity with the reference extractor is
    load-bearing), extract every link with the vectorized split-based
    extractor (``stages/graph.py:extract_links_batch`` — one Arrow pass,
    no per-doc regex loop), parse the target doc id, and aggregate
    in-degree + sum of linking ids per target via the hashpart grouped sum
    (scale path: per-node key space, ONE int32 hash shuffle)."""
    import numpy as np
    import pyarrow.parquet as _pq

    from ...stages.graph import extract_links_batch, grouped_sum_parts

    n = _pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id"]).repartition(8)

    def _mk_html(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy()
        t1, t2, t3 = (pc.cast(pa.array(t), pa.string())
                      for t in _graph_targets(d, n))
        html = pc.binary_join_element_wise(
            '<html><body><p>intro</p><a href="https://d', t1,
            '.example.com/page">x</a><a href="https://d', t2,
            '.example.com/page">y</a><a href="https://d', t3,
            '.example.com/page">z</a></body></html>', "")
        return pa.table({"doc_id": b["doc_id"], "html": html})

    links = ds.map_batches(_mk_html, batch_format="pyarrow").map_batches(
        lambda b: extract_links_batch(b, html_col="html", src_col="doc_id"),
        batch_format="pyarrow")

    def _parse_dst(b: pa.Table) -> pa.Table:
        tail = pc.utf8_slice_codeunits(b["link"], 9)  # strip 'https://d'
        dst = pc.cast(pc.list_element(
            pc.split_pattern(tail, ".", max_splits=1), 0), pa.int64())
        return pa.table({"dst": dst, "src": pc.cast(b["src"], pa.int64())})

    agg = grouped_sum_parts(
        links.map_batches(_parse_dst, batch_format="pyarrow"),
        ["dst"], ["src"], count_col="n_inlinks", fanin=8)
    return agg.map_batches(
        lambda b: pa.table({"dst": b["dst"], "sum_src": b["src"],
                            "n_inlinks": b["n_inlinks"]}),
        batch_format="pyarrow")


LINK_GRAPH_SQL = """
WITH n AS (SELECT count(*) AS c FROM documents),
h AS (
    SELECT doc_id,
           '<html><body><p>intro</p>'
           || '<a href="https://d' || CAST((doc_id*31 + 97) % (SELECT c FROM n) AS VARCHAR) || '.example.com/page">x</a>'
           || '<a href="https://d' || CAST((doc_id*31 + 194) % (SELECT c FROM n) AS VARCHAR) || '.example.com/page">y</a>'
           || '<a href="https://d' || CAST((doc_id*31 + 291) % (SELECT c FROM n) AS VARCHAR) || '.example.com/page">z</a>'
           || '</body></html>' AS html
    FROM documents),
l AS (
    SELECT doc_id AS src,
           unnest(regexp_extract_all(html, 'href="([^"]*)"', 1)) AS link
    FROM h),
d AS (
    SELECT src,
           CAST(regexp_extract(link, '^https://d(\\d+)\\.', 1) AS BIGINT) AS dst
    FROM l)
SELECT dst, CAST(sum(src) AS BIGINT) AS sum_src, count(*) AS n_inlinks
FROM d GROUP BY dst
"""


def q_pagerank_docs(sf_dir: str):
    """Integer fixed-point PageRank (5 iterations, damping 0.85, scale
    1e9) over the deterministic doc link graph: per iteration ONE hash
    join (ranks onto edges by src) + ONE hashpart grouped sum by dst —
    the join-based distributed form, no rank-vector broadcast
    (``stages/graph.py:pagerank``). Bit-exact vs the unrolled SQL replay
    (int64 floor division throughout)."""
    import numpy as np
    import pyarrow.parquet as _pq

    from ...stages.graph import pagerank

    n = _pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    nodes = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                                columns=["doc_id"]).repartition(4)

    def _edges(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy()
        ts = _graph_targets(d, n)
        src = np.concatenate([d.astype(np.int64)] * 3)
        dst = np.concatenate(ts)
        return pa.table({"src": pa.array(src), "dst": pa.array(dst)})

    edges = nodes.map_batches(_edges, batch_format="pyarrow")
    return pagerank(edges, nodes, node_col="doc_id", iters=5,
                    num_partitions=4, fanin=4)


def _pagerank_sql(iters: int = 5, scale: int = 10 ** 9, damp: int = 85,
                  den: int = 100) -> str:
    tele = (den - damp) * scale // den
    parts = [f"""
WITH n AS (SELECT count(*) AS c FROM documents),
e AS (
    SELECT d.doc_id AS src,
           (d.doc_id*31 + 97*j.j) % (SELECT c FROM n) AS dst
    FROM documents d CROSS JOIN (VALUES (1), (2), (3)) AS j(j)),
deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
it0 AS (SELECT doc_id AS v, CAST({scale} AS BIGINT) AS r FROM documents)"""]
    for k in range(1, iters + 1):
        parts.append(f""",
it{k} AS (
    SELECT d.doc_id AS v,
           {tele} + COALESCE(SUM(({damp} * r.r) // ({den} * g.outdeg)), 0) AS r
    FROM documents d
    LEFT JOIN e ON e.dst = d.doc_id
    LEFT JOIN it{k - 1} r ON r.v = e.src
    LEFT JOIN deg g ON g.src = e.src
    GROUP BY d.doc_id)""")
    parts.append(f"""
SELECT v AS doc_id, CAST(r AS BIGINT) AS pr_e9 FROM it{iters}""")
    return "".join(parts)


PAGERANK_SQL = _pagerank_sql()


