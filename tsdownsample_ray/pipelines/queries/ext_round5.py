"""Round-5 continuation wave: link prediction, varint posting
compression, k-center coreset selection.

Each entry follows the catalog contract: a Ray-Data-first distributed
shape documented in the stage docstring, integer-exact arithmetic so the
DuckDB oracle replays bit-identically, and column names matched between
both sides.
"""
from __future__ import annotations

from ._shared import _read_parquet_clean, np, pa, pc
from .graph_link import _graph_targets


def q_link_predict_docs(sf_dir: str):
    """Common-neighbor link prediction
    (``stages/graph.py:link_prediction``) over the deterministic doc
    link graph (same canonical undirected simple graph as
    ``triangle_counts_docs``): every NON-edge pair with >= 2 shared
    neighbors scored with the three classical topology features —
    common-neighbor count, floor(1e6 * Jaccard(N(a), N(b))) and
    preferential attachment deg(a)*deg(b). One wedge self-join + one
    anti-join against the edge set + two degree joins; no adjacency
    broadcast anywhere (degrees are |V|-sized and travel by hash
    join)."""
    import pyarrow.parquet as _pq

    from ...stages.graph import link_prediction

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
    return link_prediction(edges, num_partitions=4, fanin=4,
                           min_common=2)


LINK_PREDICT_SQL = """
WITH nn AS (SELECT count(*) AS n FROM documents),
e0 AS (
    SELECT doc_id AS src, (doc_id * 31 + 97) % (SELECT n FROM nn) AS dst
    FROM documents
    UNION ALL
    SELECT doc_id, (doc_id * 31 + 194) % (SELECT n FROM nn)
    FROM documents
    UNION ALL
    SELECT doc_id, (doc_id * 31 + 291) % (SELECT n FROM nn)
    FROM documents
),
e AS (
    SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
    FROM e0 WHERE src <> dst
),
adj AS (
    SELECT a AS node, b AS nbr FROM e
    UNION ALL
    SELECT b, a FROM e
),
deg AS (SELECT node, count(*) AS d FROM adj GROUP BY node),
cn AS (
    SELECT a1.node AS u, a2.node AS w, count(*) AS common
    FROM adj a1 JOIN adj a2 ON a1.nbr = a2.nbr AND a1.node < a2.node
    GROUP BY 1, 2
),
cand AS (
    SELECT cn.u, cn.w, cn.common
    FROM cn LEFT JOIN e ON e.a = cn.u AND e.b = cn.w
    WHERE e.a IS NULL AND cn.common >= 2
)
SELECT cand.u AS a, cand.w AS b,
       CAST(cand.common AS BIGINT) AS common_neighbors,
       CAST(cand.common * 1000000
            // (da.d + db.d - cand.common) AS BIGINT) AS jaccard_e6,
       CAST(da.d * db.d AS BIGINT) AS pref_attachment
FROM cand
JOIN deg da ON da.node = cand.u
JOIN deg db ON db.node = cand.w
"""


def q_varint_postings_docs(sf_dir: str):
    """Delta-gap + LEB128 posting-list compression
    (``stages/postings.py:varint_postings``): per corpus token the
    uncompressed int64 payload size, the REAL encoded stream size, and
    the sum of doc ids recovered by DECODING the stream — the roundtrip
    is load-bearing (a codec fault diverges from the oracle's direct
    ``sum(doc_id)``). One hash(token) shuffle; the codec loops over
    byte position, never over values (``functions/varint.py``)."""
    from ...stages.postings import varint_postings

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"]).repartition(8)
    return varint_postings(ds, num_partitions=8)


# byte-count replay covers gaps < 2^42 (7 CASE terms) — doc ids at any
# catalog sf are far below that; the engine side handles full uint64
VARINT_POSTINGS_SQL = """
WITH w AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS token
    FROM documents
),
f AS (SELECT DISTINCT doc_id, token FROM w WHERE token <> ''),
g AS (
    SELECT token, doc_id,
           COALESCE(doc_id - lag(doc_id) OVER (PARTITION BY token
                                               ORDER BY doc_id),
                    doc_id + 1) AS gap
    FROM f
)
SELECT token, CAST(count(*) AS BIGINT) AS df,
       CAST(8 * count(*) AS BIGINT) AS plain_bytes,
       CAST(sum(1
            + CASE WHEN gap >= 128 THEN 1 ELSE 0 END
            + CASE WHEN gap >= 16384 THEN 1 ELSE 0 END
            + CASE WHEN gap >= 2097152 THEN 1 ELSE 0 END
            + CASE WHEN gap >= 268435456 THEN 1 ELSE 0 END
            + CASE WHEN gap >= 34359738368 THEN 1 ELSE 0 END
            + CASE WHEN gap >= 4398046511104 THEN 1 ELSE 0 END)
            AS BIGINT) AS varint_bytes,
       CAST(sum(doc_id) AS BIGINT) AS decoded_sum
FROM g GROUP BY token
"""


def q_kcenter_select_embeddings(sf_dir: str, k: int = 8):
    """Gonzalez greedy k-center selection — the coverage-first coreset
    primitive (farthest-point traversal), complementing
    ``mmr_select_embeddings``'s relevance-diversity greedy: seed at the
    smallest vec_id, then k-1 rounds of "add the point farthest from
    the selected set". Distances are exact integer squared L2 over the
    catalog's trunc(x*1000) quantization, ties to the smallest vec_id.

    Distributed shape: the newest center (one d-vector) broadcasts in a
    closure each round; ONE map over the state Dataset updates each
    point's running min-distance, per-block top-1 rows (blocks x 1, the
    bounded-driver-read contract shared with k-core/BFS) elect the
    global winner; state re-materializes per round so lineage never
    replays earlier rounds. k full passes total — the known cost of
    farthest-point traversal; at corpus scale run it on a uniform
    sample tier, not the raw corpus."""
    ds = _read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding"])

    from ...stages.similarity import embedding_matrix

    seed = ds.min("vec_id")

    def _seed_row(b: pa.Table) -> pa.Table:
        return b.filter(pc.equal(b["vec_id"], seed))

    srow = ds.map_batches(_seed_row, batch_format="pyarrow").take_all()
    sv = np.trunc(np.asarray(srow[0]["embedding"], np.float64)
                  * 1000).astype(np.int64)

    def _init(b: pa.Table) -> pa.Table:
        ids = b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        E = np.trunc(embedding_matrix(b).astype(np.float64)
                     * 1000).astype(np.int64)
        keep = ids != seed
        ids, E = ids[keep], E[keep]
        diff = E - sv
        return pa.table({
            "vec_id": pa.array(ids),
            "mindist": pa.array(np.einsum("ij,ij->i", diff, diff)),
            "v": pa.array(list(E), pa.list_(pa.int64()))})

    state = ds.map_batches(_init, batch_format="pyarrow").materialize()

    def _top1(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        md = b["mindist"].to_numpy(zero_copy_only=False)
        ids = b["vec_id"].to_numpy(zero_copy_only=False)
        i = np.lexsort((ids, -md))[0]
        return b.take(pa.array([int(i)]))

    out = {"rank": [1], "vec_id": [int(seed)], "mindist": [0]}
    for r in range(2, k + 1):
        tops = state.map_batches(_top1, batch_format="pyarrow").take_all()
        w = min(tops, key=lambda t: (-t["mindist"], t["vec_id"]))
        out["rank"].append(r)
        out["vec_id"].append(int(w["vec_id"]))
        out["mindist"].append(int(w["mindist"]))
        if r == k:
            break
        wv = np.asarray(w["v"], np.int64)
        wid = int(w["vec_id"])

        def _update(b: pa.Table, wv=wv, wid=wid) -> pa.Table:
            ids = b["vec_id"].to_numpy(zero_copy_only=False)
            keep = ids != wid
            b = b.filter(pa.array(keep))
            if b.num_rows == 0:
                return b
            V = np.stack(b["v"].to_numpy(zero_copy_only=False))
            diff = V - wv
            d2 = np.einsum("ij,ij->i", diff, diff)
            md = np.minimum(
                b["mindist"].to_numpy(zero_copy_only=False), d2)
            return pa.table({"vec_id": b["vec_id"],
                             "mindist": pa.array(md),
                             "v": b["v"]})

        state = state.map_batches(
            _update, batch_format="pyarrow").materialize()
    return pa.table({c: pa.array(v, pa.int64()) for c, v in out.items()})


KCENTER_SQL = """
WITH RECURSIVE q AS (
    SELECT vec_id,
           list_transform(embedding,
               x -> CAST(trunc(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
    FROM embeddings
),
seed AS (SELECT vec_id, v FROM q
         WHERE vec_id = (SELECT min(vec_id) FROM q)),
w AS (
    SELECT CAST(1 AS BIGINT) AS iter, q.vec_id, q.v,
           CAST(list_dot_product(q.v, q.v)
                + list_dot_product(s.v, s.v)
                - 2 * list_dot_product(q.v, s.v) AS BIGINT) AS mindist
    FROM q, seed s WHERE q.vec_id <> s.vec_id
    UNION ALL
    SELECT iter + 1, vec_id, v,
           least(mindist,
                 CAST(list_dot_product(v, v)
                      + list_dot_product(wv, wv)
                      - 2 * list_dot_product(v, wv) AS BIGINT))
    FROM (
        SELECT iter, vec_id, v, mindist,
               first_value(v) OVER wo AS wv,
               first_value(vec_id) OVER wo AS wid
        FROM w
        WINDOW wo AS (ORDER BY mindist DESC, vec_id)
    )
    WHERE vec_id <> wid AND iter < 7
)
SELECT CAST(1 AS BIGINT) AS rank,
       (SELECT vec_id FROM seed) AS vec_id,
       CAST(0 AS BIGINT) AS mindist
UNION ALL
SELECT CAST(iter + 1 AS BIGINT) AS rank, vec_id, mindist
FROM (
    SELECT iter, vec_id, mindist,
           row_number() OVER (PARTITION BY iter
                              ORDER BY mindist DESC, vec_id) AS rk
    FROM w
) WHERE rk = 1
"""
