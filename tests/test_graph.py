"""Link extraction + integer fixed-point PageRank (stages/graph.py):
vectorized extractor vs hand cases; distributed PageRank vs a NumPy
sequential replay, across partitionings."""

import numpy as np
import pyarrow as pa
import pytest

from tsdownsample_ray.stages.graph import (extract_links_batch,
                                           grouped_sum_parts, pagerank)

ray = pytest.importorskip("ray")
import ray.data as rd  # noqa: E402


def test_extract_links_basic():
    html = [
        b'<a href="http://a/1">x</a> text <a href="http://b/2">y</a>',
        b"no links at all",
        b'<link href="s.css"><a HREF="upper-ignored">z</a>',
        b"",
    ]
    t = pa.table({"url": [f"u{i}" for i in range(len(html))],
                  "html": pa.array(html, pa.binary())})
    out = extract_links_batch(t)
    assert out["src"].to_pylist() == ["u0", "u0", "u2"]
    # href= matching is case-sensitive and attribute-agnostic (<link> too)
    assert out["link"].to_pylist() == ["http://a/1", "http://b/2", "s.css"]


def test_extract_links_empty_batch():
    t = pa.table({"url": pa.array([], pa.string()),
                  "html": pa.array([], pa.binary())})
    out = extract_links_batch(t)
    assert out.num_rows == 0
    assert out.column_names == ["src", "link"]


def _pagerank_numpy(edges, n, iters=5, scale=10 ** 9, damp=85, den=100):
    src = np.array([e[0] for e in edges], dtype=np.int64)
    dst = np.array([e[1] for e in edges], dtype=np.int64)
    outdeg = np.bincount(src, minlength=n).astype(np.int64)
    tele = (den - damp) * scale // den
    r = np.full(n, scale, dtype=np.int64)
    for _ in range(iters):
        c = (damp * r[src]) // (den * outdeg[src])
        r = np.full(n, tele, dtype=np.int64)
        np.add.at(r, dst, c)
    return r


@pytest.mark.parametrize("nparts", [1, 3])
def test_pagerank_matches_numpy(ray_session, nparts):
    rng = np.random.default_rng(7)
    n = 40
    edges = [(int(s), int(d))
             for s in range(n)
             for d in rng.integers(0, n, size=int(rng.integers(1, 4)))]
    # one dangling node (no out-edges): mass leaks, teleport-only floor
    edges = [e for e in edges if e[0] != 13]
    # one sink-ish node with no in-edges is likely present by chance; the
    # numpy replay covers both regimes either way
    exp = _pagerank_numpy(edges, n)

    nodes = rd.from_arrow(pa.table({"doc_id": list(range(n))})).repartition(
        nparts)
    e = rd.from_arrow(pa.table({
        "src": [x[0] for x in edges],
        "dst": [x[1] for x in edges]})).repartition(nparts)
    out = pagerank(e, nodes, node_col="doc_id", iters=5,
                   num_partitions=2, fanin=2).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert len(out) == n
    np.testing.assert_array_equal(out["pr_e9"].to_numpy(), exp)


def test_grouped_sum_parts(ray_session):
    t = pa.table({"k": [1, 2, 1, 3, 2, 1], "v": [10, 20, 30, 40, 50, 60]})
    ds = rd.from_arrow(t).repartition(3)
    out = grouped_sum_parts(ds, ["k"], ["v"], count_col="n",
                            fanin=2).to_pandas().sort_values("k")
    assert out["k"].tolist() == [1, 2, 3]
    assert out["v"].tolist() == [100, 70, 40]
    assert out["n"].tolist() == [3, 2, 1]


def test_triangle_counts_known_graph(ray_session):
    """Hand-checked graph: K4 on {0,1,2,3} (4 triangles, each vertex in
    3) plus a pendant edge 3-4 and a disconnected edge 5-6; direction
    and multi-edges must not matter."""
    import ray.data as rd

    from tsdownsample_ray.stages.graph import triangle_counts

    k4 = [(a, b) for a in range(4) for b in range(4) if a != b]  # directed both ways
    edges = k4 + [(3, 4), (4, 3), (5, 6), (2, 2)]
    t = pa.table({"src": pa.array([e[0] for e in edges], pa.int64()),
                  "dst": pa.array([e[1] for e in edges], pa.int64())})
    out = triangle_counts(rd.from_arrow(t).repartition(3),
                          num_partitions=2, fanin=2).to_pandas()
    got = dict(zip(out["doc_id"], out["n_triangles"]))
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_graph_degree_stats_python_replay(ray_session):
    """Degree histograms + reciprocity vs a direct edge-rule replay."""
    from collections import Counter

    from tsdownsample_ray.pipelines.queries import q_graph_degree_stats_docs

    sf = "/root/testdata/sf0.001"
    out = q_graph_degree_stats_docs(sf)
    import pyarrow.parquet as pq
    n = pq.read_metadata(f"{sf}/documents.parquet").num_rows
    edges = set()
    for d in range(n):
        for j in (1, 2, 3):
            edges.add((d, (d * 31 + 97 * j) % n))
    od = Counter(); idg = Counter()
    for s, t in edges:
        od[s] += 1
        idg[t] += 1
    oh = Counter(od.values())
    ih = Counter(idg.values())
    zero_in = n - len(idg)
    pairs = Counter()
    for s, t in edges:
        if s != t:
            pairs[(min(s, t), max(s, t))] += 1
    mutual = sum(1 for c in pairs.values() if c == 2)
    nonself = sum(pairs.values())

    got = {(r["kind"], r["k"]): r["n"] for _, r in out.iterrows()}
    for k, c in oh.items():
        assert got[("out", k)] == c
    for k, c in ih.items():
        assert got[("in", k)] == c
    if zero_in:
        assert got[("in", 0)] == zero_in
    assert got[("recip", 2 * mutual)] == nonself
