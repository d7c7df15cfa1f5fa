"""DTW, DBSCAN, interval union, experiment readout, k-core, BFS, churn features, IPS, quantile normalize.

Split from the former pipelines/queries.py monolith (r4 verdict
next-round #5); statement order inside this module is the original
file order. Explicit cross-module imports are generated: backward
dependencies at the top, forward (function-body-only) dependencies at
the bottom so package import order stays acyclic.
"""
from __future__ import annotations

from ._shared import US, _MD5U64, _read_parquet_clean, np, pa, pc
from .events_windows import _events_series
from .downsample_core import _events_cents
from ...arrow_utils import group_codes, make_add_part

def q_dtw_pairs_1d(sf_dir: str):
    """Dynamic-time-warping distance between every pair of series over
    the 1d tier (30 points each, the engine's tier-reduction contract
    for quadratic ops — same rule as Theil-Sen's pair expansion):
    exact integer |Δy| costs, the classic
    ``D[i,j] = c + min(left, up, diag)`` recurrence. Distributed
    shape: each series' tier rows fan out once per pair it belongs to
    (k−1 replication of 1000×-reduced rows), then ONE hash(pair)
    shuffle and an independent per-pair DP. Also emits the unwarped L1
    distance for contrast. The SQL oracle advances the DP one
    anti-diagonal per recursive-CTE iteration (all pairs in
    parallel), with pass-through/contribution moves in a single scan.
    """
    from ...arrow_utils import stable_part_codes
    from ...stages.rollup import rollup

    D1 = 86_400_000_000
    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    rolled = rollup(ev.map_batches(_series, batch_format="pyarrow"), D1)
    rolled = rolled.select_columns(["series_id", "bucket", "sum_y"])

    names = sorted({r["series_id"]
                    for r in rolled.groupby("series_id").count()
                    .take_all()})
    pairs = [(a, b) for i, a in enumerate(names)
             for b in names[i + 1:]]

    def _fan(b: pa.Table) -> pa.Table:
        out = {"pair": [], "role": [], "bucket": [], "y": []}
        sid = b["series_id"].to_pylist()
        bkt = b["bucket"].to_pylist()
        y = b["sum_y"].to_pylist()
        for a, c in pairs:
            for s, k, v in zip(sid, bkt, y):
                if s == a:
                    out["pair"].append(f"{a}|{c}")
                    out["role"].append(0)
                    out["bucket"].append(k)
                    out["y"].append(v)
                elif s == c:
                    out["pair"].append(f"{a}|{c}")
                    out["role"].append(1)
                    out["bucket"].append(k)
                    out["y"].append(v)
        return pa.table({"pair": pa.array(out["pair"]),
                         "role": pa.array(out["role"], pa.int64()),
                         "bucket": pa.array(out["bucket"], pa.int64()),
                         "y": pa.array(out["y"], pa.int64())})

    mod = 4 * 64

    _add_part = make_add_part("pair", mod)

    def _dtw(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        empty = pa.table({"a": pa.array([], pa.string()),
                          "b": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64()),
                          "m": pa.array([], pa.int64()),
                          "dtw": pa.array([], pa.int64()),
                          "l1": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        t = t.take(pc.sort_indices(t, sort_keys=[
            ("pair", "ascending"), ("role", "ascending"),
            ("bucket", "ascending")]))
        pairc = t["pair"].to_pylist()
        role = t["role"].to_pylist()
        y = t["y"].to_pylist()
        out = {k: [] for k in ("a", "b", "n", "m", "dtw", "l1")}
        from itertools import groupby as _gb
        idx = 0
        for pr, grp in _gb(range(len(pairc)), key=lambda i: pairc[i]):
            rows = list(grp)
            va = [y[i] for i in rows if role[i] == 0]
            vb = [y[i] for i in rows if role[i] == 1]
            n, m = len(va), len(vb)
            INF = 1 << 60
            prev = [INF] * (m + 1)
            prev[0] = 0
            first = True
            for i in range(1, n + 1):
                cur = [INF] * (m + 1)
                for j in range(1, m + 1):
                    c = abs(va[i - 1] - vb[j - 1])
                    best = min(prev[j], cur[j - 1], prev[j - 1])
                    if i == 1 and j == 1:
                        best = 0
                    cur[j] = c + best
                prev = cur
                first = False
            aname, bname = pr.split("|")
            out["a"].append(aname)
            out["b"].append(bname)
            out["n"].append(n)
            out["m"].append(m)
            out["dtw"].append(prev[m] if n and m else 0)
            out["l1"].append(sum(abs(p - q) for p, q in zip(va, vb)))
            idx += 1
        return pa.table({"a": pa.array(out["a"]),
                         "b": pa.array(out["b"]),
                         "n": pa.array(out["n"], pa.int64()),
                         "m": pa.array(out["m"], pa.int64()),
                         "dtw": pa.array(out["dtw"], pa.int64()),
                         "l1": pa.array(out["l1"], pa.int64())})

    return (rolled.map_batches(_fan, batch_format="pyarrow")
            .map_batches(_add_part, batch_format="pyarrow")
            .repartition(4).groupby("__part")
            .map_groups(_dtw, batch_format="pyarrow"))


DTW_PAIRS_SQL = """
WITH RECURSIVE r AS (
    SELECT event_type AS series_id,
           epoch_us(ts) // 86400000000 AS bucket,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
    FROM events GROUP BY 1, 2
),
p AS (
    SELECT series_id, y,
           CAST(row_number() OVER (PARTITION BY series_id
                                   ORDER BY bucket) AS BIGINT) AS rk
    FROM r
),
dims AS (SELECT series_id, max(rk) AS n FROM p GROUP BY 1),
pairs AS (
    SELECT x.series_id AS a, y.series_id AS b, x.n AS na, y.n AS nb
    FROM dims x JOIN dims y ON x.series_id < y.series_id
),
c AS (
    SELECT pr.a, pr.b, pr.na, pr.nb, x.rk AS i, y.rk AS j,
           abs(x.y - y.y) AS cost
    FROM pairs pr
    JOIN p x ON x.series_id = pr.a
    JOIN p y ON y.series_id = pr.b
),
w AS (
    SELECT a, b, na, nb, i, j, CAST(i + j AS BIGINT) AS diag,
           CAST(cost AS BIGINT) AS val
    FROM c WHERE i = 1 AND j = 1
    UNION ALL
    SELECT t.a, t.b, t.na, t.nb, t.i, t.j, t.diag,
           t.val + CASE WHEN t.is_new THEN cc.cost ELSE 0 END
    FROM (
        SELECT a, b, na, nb, i + di AS i, j + dj AS j,
               diag + di + dj AS diag,
               min(val) AS val,
               (di + dj > 0) AS is_new
        FROM (
            SELECT q.*, mv.di, mv.dj
            FROM (
                SELECT a, b, na, nb, i, j, diag, val,
                       max(diag) OVER (PARTITION BY a, b) AS mxd
                FROM w
            ) q
            CROSS JOIN (VALUES (0, 0), (1, 0), (0, 1), (1, 1))
                 mv(di, dj)
            WHERE (q.diag = q.mxd AND mv.di + mv.dj = 1)
               OR (q.diag = q.mxd - 1 AND mv.di = 1 AND mv.dj = 1)
               OR (q.diag = q.mxd AND mv.di = 0 AND mv.dj = 0
                   AND q.diag < q.na + q.nb)
        )
        WHERE i + di <= na AND j + dj <= nb
          AND diag + di + dj <= na + nb
        GROUP BY a, b, na, nb, i + di, j + dj, diag + di + dj,
                 (di + dj > 0)
    ) t
    LEFT JOIN c cc ON cc.a = t.a AND cc.b = t.b AND cc.i = t.i
                  AND cc.j = t.j AND t.is_new
)
SELECT w.a, w.b, CAST(w.na AS BIGINT) AS n, CAST(w.nb AS BIGINT) AS m,
       CAST(min(w.val) AS BIGINT) AS dtw,
       (SELECT CAST(sum(abs(x.y - y.y)) AS BIGINT)
        FROM p x JOIN p y
          ON x.series_id = w.a AND y.series_id = w.b AND x.rk = y.rk)
           AS l1
FROM w
WHERE w.i = w.na AND w.j = w.nb
GROUP BY w.a, w.b, w.na, w.nb
"""


def q_dbscan_embeddings(sf_dir: str):
    """Density-based clustering, DBSCAN* flavor (no order-dependent
    border assignment — clusters are the connected components of
    CORE-core eps-edges, which is deterministic): exact integer
    distances over trunc(x*1000)-quantized vectors, eps^2 = 1_380_000,
    minPts = 5 (self excluded). Distributed shape: the quantized
    matrix broadcasts once (``ray.put`` — the bounded-corpus/sample
    contract shared with kmeans' centroid rounds; at full scale this
    runs per LSH/IVF block), each batch computes its rows' degrees and
    core-core edges with one integer matmul, and the component merge
    reuses ``stages/components.py`` (the same hash-partitioned
    min-label propagation as near-dup clustering). Output per vector:
    degree, core flag, cluster label (min core id; NULL for
    non-core)."""
    import ray as _ray

    from ...stages.similarity import embedding_matrix

    EPS2, MINPTS = 1_380_000, 5
    ds = _read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding"])

    def _quant(b: pa.Table) -> pa.Table:
        E = np.trunc(embedding_matrix(b).astype(np.float64)
                     * 1000).astype(np.int64)
        return pa.table({"vec_id": b["vec_id"],
                         "v": pa.array(list(E), pa.list_(pa.int64()))})

    rows = ds.map_batches(_quant, batch_format="pyarrow").take_all()
    all_ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    order = np.argsort(all_ids)
    all_ids = all_ids[order]
    M = np.array([rows[i]["v"] for i in order], dtype=np.int64)
    nrm = (M * M).sum(axis=1)
    ref = _ray.put((all_ids, M, nrm))

    def _deg(b: pa.Table) -> pa.Table:
        ids_b = b["vec_id"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        E = np.trunc(embedding_matrix(b).astype(np.float64)
                     * 1000).astype(np.int64)
        aid, AM, an = _ray.get(ref)
        d2 = ((E * E).sum(axis=1)[:, None] + an[None, :]
              - 2 * (E @ AM.T))
        within = d2 <= EPS2
        self_col = aid[None, :] == ids_b[:, None]
        deg = (within & ~self_col).sum(axis=1)
        return pa.table({"vec_id": pa.array(ids_b),
                         "deg": pa.array(deg.astype(np.int64))})

    deg_rows = (ds.map_batches(_deg, batch_format="pyarrow").take_all())
    deg = {int(r["vec_id"]): int(r["deg"]) for r in deg_rows}
    core = {i for i, d in deg.items() if d >= MINPTS}
    core_ref = _ray.put(core)

    def _edges(b: pa.Table) -> pa.Table:
        ids_b = b["vec_id"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        E = np.trunc(embedding_matrix(b).astype(np.float64)
                     * 1000).astype(np.int64)
        aid, AM, an = _ray.get(ref)
        cset = _ray.get(core_ref)
        row_core = np.array([int(i) in cset for i in ids_b])
        col_core = np.array([int(i) in cset for i in aid])
        d2 = ((E * E).sum(axis=1)[:, None] + an[None, :]
              - 2 * (E @ AM.T))
        m = ((d2 <= EPS2) & row_core[:, None] & col_core[None, :]
             & (ids_b[:, None] < aid[None, :]))
        ri, ci = np.nonzero(m)
        return pa.table({"a": pa.array(ids_b[ri]),
                         "b": pa.array(aid[ci])})

    # core-core edges are bounded by the same sample contract as the
    # broadcast matrix, so the component merge is a driver union-find;
    # a full-scale corpus run swaps in stages/components.py's
    # hash-partitioned min-label propagation (as near_dup_clusters does)
    edge_rows = (ds.map_batches(_edges, batch_format="pyarrow")
                 .take_all())
    parent: dict = {}

    def _find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for r in edge_rows:
        ra, rb = _find(int(r["a"])), _find(int(r["b"]))
        if ra != rb:
            hi, lo = max(ra, rb), min(ra, rb)
            parent[hi] = lo
    comp = {i: _find(i)
            for i in {int(r["a"]) for r in edge_rows}
            | {int(r["b"]) for r in edge_rows}}

    ids_sorted = sorted(deg)
    cluster = [comp.get(i, i if i in core else None)
               for i in ids_sorted]
    return pa.table({
        "vec_id": pa.array(ids_sorted, pa.int64()),
        "deg": pa.array([deg[i] for i in ids_sorted], pa.int64()),
        "is_core": pa.array([int(i in core) for i in ids_sorted],
                            pa.int64()),
        "cluster": pa.array(cluster, pa.int64())})


DBSCAN_SQL = """
WITH RECURSIVE q AS (
    SELECT vec_id,
           list_transform(embedding,
               x -> CAST(trunc(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
    FROM embeddings
),
d AS (
    SELECT a.vec_id AS ia, b.vec_id AS ib,
           CAST(list_dot_product(a.v, a.v) + list_dot_product(b.v, b.v)
                - 2 * list_dot_product(a.v, b.v) AS BIGINT) AS d2
    FROM q a JOIN q b ON a.vec_id <> b.vec_id
),
deg AS (
    SELECT ia AS vec_id,
           CAST(count(*) FILTER (WHERE d2 <= 1380000) AS BIGINT) AS deg
    FROM d GROUP BY 1
),
core AS (SELECT vec_id FROM deg WHERE deg >= 5),
ed AS (
    SELECT d.ia AS src, d.ib AS dst
    FROM d JOIN core x ON x.vec_id = d.ia
           JOIN core y ON y.vec_id = d.ib
    WHERE d.d2 <= 1380000
),
reach(node, lbl) AS (
    SELECT DISTINCT src, src FROM ed
    UNION
    SELECT ed.dst, r.lbl FROM reach r JOIN ed ON ed.src = r.node
),
comp AS (SELECT node, min(lbl) AS component FROM reach GROUP BY node)
SELECT deg.vec_id, deg.deg,
       CAST(CASE WHEN c.vec_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
           AS is_core,
       CAST(CASE WHEN c.vec_id IS NULL THEN NULL
                 ELSE coalesce(comp.component, deg.vec_id) END
            AS BIGINT) AS cluster
FROM deg
LEFT JOIN core c ON c.vec_id = deg.vec_id
LEFT JOIN comp ON comp.node = deg.vec_id
"""


def q_interval_union_events(sf_dir: str):
    """Islands-and-gaps interval merge: every event opens a 30-minute
    activity window ``[t, t+30m)``; per series, merge overlapping /
    touching windows into maximal islands and report island count,
    total covered microseconds, the longest island and the longest
    uncovered gap between islands — the classic uptime/coverage
    reduction. One hash(series) shuffle; per segment the island
    boundaries fall out of one running-max pass (``new island iff
    t > cummax(prev ends)``), all exact int64."""
    from ...arrow_utils import stable_part_codes

    W = 1_800_000_000
    ev = _events_series(sf_dir, cols=("event_id", "event_type", "ts"))
    mod = 2 * 64

    _add_part = make_add_part("event_type", mod)

    def _islands(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        s_type = t["event_type"].type
        cols = ("n_islands", "covered_us", "longest_island_us",
                "longest_gap_us")
        if t.num_rows == 0:
            return pa.table({"series_id": pa.array([], s_type),
                             **{c: pa.array([], pa.int64())
                                for c in cols}})
        t = t.take(pc.sort_indices(t, sort_keys=[
            ("event_type", "ascending"), ("ts_us", "ascending")]))
        sid = t["event_type"]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = group_codes(sid)
        ts = t["ts_us"].to_numpy(zero_copy_only=False).astype(np.int64)
        heads = np.ones(len(codes), dtype=bool)
        heads[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(heads)
        ends_seg = np.r_[starts[1:], len(codes)]
        out = {k: [] for k in ("sid",) + cols}
        for f, l in zip(starts, ends_seg):  # series loop; inner vector
            s_ = ts[f:l]
            e_ = s_ + W
            cm = np.maximum.accumulate(e_)
            new = np.ones(l - f, dtype=bool)
            new[1:] = s_[1:] > cm[:-1]
            isl = np.flatnonzero(new)
            isl_end = np.r_[isl[1:], l - f]
            lo = s_[isl]
            hi = cm[isl_end - 1]
            lens = hi - lo
            gaps = lo[1:] - hi[:-1]
            out["sid"].append(sid[int(f)].as_py())
            out["n_islands"].append(len(isl))
            out["covered_us"].append(int(lens.sum()))
            out["longest_island_us"].append(int(lens.max()))
            out["longest_gap_us"].append(
                int(gaps.max()) if len(gaps) else 0)
        return pa.table({"series_id": pa.array(out["sid"], s_type),
                         **{c: pa.array(out[c], pa.int64())
                            for c in cols}})

    return (ev.map_batches(_add_part, batch_format="pyarrow")
            .repartition(2).groupby("__part")
            .map_groups(_islands, batch_format="pyarrow"))


INTERVAL_UNION_SQL = """
WITH e AS (
    SELECT event_type AS series_id, epoch_us(ts) AS s,
           epoch_us(ts) + 1800000000 AS f
    FROM events
),
m AS (
    SELECT series_id, s, f,
           max(f) OVER (PARTITION BY series_id ORDER BY s, f
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING) AS prev_max
    FROM e
),
g AS (
    SELECT series_id, s, f,
           sum(CASE WHEN prev_max IS NULL OR s > prev_max
                    THEN 1 ELSE 0 END)
               OVER (PARTITION BY series_id ORDER BY s, f
                     ROWS UNBOUNDED PRECEDING) AS island
    FROM m
),
isl AS (
    SELECT series_id, island, min(s) AS lo, max(f) AS hi
    FROM g GROUP BY 1, 2
),
gaps AS (
    SELECT series_id, island, lo, hi,
           lo - lag(hi) OVER (PARTITION BY series_id
                              ORDER BY island) AS gap
    FROM isl
)
SELECT series_id, CAST(count(*) AS BIGINT) AS n_islands,
       CAST(sum(hi - lo) AS BIGINT) AS covered_us,
       CAST(max(hi - lo) AS BIGINT) AS longest_island_us,
       CAST(coalesce(max(gap), 0) AS BIGINT) AS longest_gap_us
FROM gaps GROUP BY 1
"""


def q_experiment_readout_users(sf_dir: str):
    """A/B experiment readout: deterministic arm assignment
    (``user_id % 2``), per-arm user counts, converters (>=1 purchase),
    purchase revenue and event volume — the exact integer inputs to any
    conversion test (the chi-square / Welch layers already exist as
    ``welch_t_events`` / ``term_drift_docs``'s 2x2 machinery). One
    hash(user) shuffle builds per-user rows; arm partials reduce
    map-side; final merge is two rows."""
    from ...arrow_utils import stable_part_codes

    ds = _events_series(
        sf_dir, cols=("event_id", "user_id", "event_type", "ts",
                      "value"))

    def _prep(b: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(b["value"], 100.0),
                                 ndigits=0), pa.int64())
        is_p = pc.equal(b["event_type"], "purchase")
        return pa.table({
            "user_id": b["user_id"],
            "one": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            "purch": pc.cast(is_p, pa.int64()),
            "pcents": pc.if_else(is_p, cents,
                                 pa.scalar(0, pa.int64()))})

    mod = 4 * 64

    _add_part = make_add_part("user_id", mod)

    def _arm_partial(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        if t.num_rows == 0:
            return pa.table({
                "arm": pa.array([], pa.int64()),
                "n_users": pa.array([], pa.int64()),
                "n_converted": pa.array([], pa.int64()),
                "sum_purchase_cents": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64())})
        per_u = t.group_by(["user_id"]).aggregate(
            [("one", "sum"), ("purch", "sum"), ("pcents", "sum")])
        uid = per_u["user_id"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        arm = uid % 2
        nev = per_u["one_sum"].to_numpy(zero_copy_only=False)
        npu = per_u["purch_sum"].to_numpy(zero_copy_only=False)
        cts = per_u["pcents_sum"].to_numpy(zero_copy_only=False)
        rows = {"arm": [], "n_users": [], "n_converted": [],
                "sum_purchase_cents": [], "n_events": []}
        for a in (0, 1):
            m = arm == a
            if not m.any():
                continue
            rows["arm"].append(a)
            rows["n_users"].append(int(m.sum()))
            rows["n_converted"].append(int((npu[m] > 0).sum()))
            rows["sum_purchase_cents"].append(int(cts[m].sum()))
            rows["n_events"].append(int(nev[m].sum()))
        return pa.table({c: pa.array(v, pa.int64())
                         for c, v in rows.items()})

    def _merge(g: pa.Table) -> pa.Table:
        return pa.table({
            "arm": g["arm"].slice(0, 1),
            **{c: pa.array([pc.sum(g[c]).as_py() or 0], pa.int64())
               for c in ("n_users", "n_converted",
                         "sum_purchase_cents", "n_events")}})

    return (ds.map_batches(_prep, batch_format="pyarrow")
            .map_batches(_add_part, batch_format="pyarrow")
            .repartition(4).groupby("__part")
            .map_groups(_arm_partial, batch_format="pyarrow")
            .groupby("arm").map_groups(_merge, batch_format="pyarrow"))


EXPERIMENT_SQL = """
WITH u AS (
    SELECT user_id, user_id % 2 AS arm,
           count(*) AS n_events,
           sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS n_purch,
           sum(CASE WHEN event_type = 'purchase'
               THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
               AS cents
    FROM events GROUP BY 1, 2
)
SELECT CAST(arm AS BIGINT) AS arm,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(CASE WHEN n_purch > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_converted,
       CAST(sum(cents) AS BIGINT) AS sum_purchase_cents,
       CAST(sum(n_events) AS BIGINT) AS n_events
FROM u GROUP BY 1
"""


def q_kcore_docs(sf_dir: str):
    """k-core decomposition (k=5) of the deterministic variable-degree
    link graph (doc d emits ``1 + d % 6`` links ``(d*31 + 97j) % N``,
    undirected simple graph): iteratively peel nodes of degree < k
    until the fixpoint — the standard graph-mining density filter.
    Distributed shape per round (the pagerank/kmeans driver-round
    precedent): per-block partial doubled-degree counts merged on the
    driver (the driver already reads every node's degree to build the
    peel set, so partials — at most #blocks rows per node — cost the
    same bounded read and drop the per-round repartition+groupby
    shuffle entirely); the shrinking LOW-degree id set broadcasts
    (``ray.put``, sorted, searchsorted membership) and edges filter
    map-side; the edge Dataset materializes once per round. ~10 rounds
    at this fixture. Output: ``(node, core_deg)`` for the surviving
    5-core (one partitioned grouped count, the only shuffle after the
    edge build)."""
    import pyarrow.parquet as _pq
    import ray as _ray

    from ...arrow_utils import stable_part_codes

    K = 5
    n = _pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id"]).repartition(4)

    def _edges(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        srcs, dsts = [], []
        for j in range(1, 7):
            m = j <= 1 + d % 6
            s = d[m]
            t = (s * 31 + 97 * j) % n
            keep = s != t
            srcs.append(np.minimum(s[keep], t[keep]))
            dsts.append(np.maximum(s[keep], t[keep]))
        return pa.table({"u": pa.array(np.concatenate(srcs)),
                         "v": pa.array(np.concatenate(dsts))})

    mod = 4 * 64

    def _part_u(b: pa.Table) -> pa.Table:
        h = stable_part_codes(b["u"], None)
        return b.append_column(
            "__part", pa.array((h % np.uint64(mod)).astype(np.int32)))

    def _dedup(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        if t.num_rows == 0:
            return pa.table({"u": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64())})
        u = t["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = np.unique(u * np.int64(2 ** 32) + v)
        return pa.table({"u": pa.array(key // np.int64(2 ** 32)),
                         "v": pa.array(key % np.int64(2 ** 32))})

    edges = (ds.map_batches(_edges, batch_format="pyarrow")
             .map_batches(_part_u, batch_format="pyarrow")
             .repartition(4).groupby("__part")
             .map_groups(_dedup, batch_format="pyarrow")).materialize()

    def _doubled_deg(ed):
        def _both(b: pa.Table) -> pa.Table:
            return pa.table({
                "x": pa.concat_arrays([
                    b["u"].combine_chunks() if isinstance(
                        b["u"], pa.ChunkedArray) else b["u"],
                    b["v"].combine_chunks() if isinstance(
                        b["v"], pa.ChunkedArray) else b["v"]])})

        def _cnt(g: pa.Table) -> pa.Table:
            t = g.drop_columns(["__part"])
            if t.num_rows == 0:
                return pa.table({"node": pa.array([], pa.int64()),
                                 "deg": pa.array([], pa.int64())})
            x = t["x"].to_numpy(zero_copy_only=False).astype(np.int64)
            uniq, cnt = np.unique(x, return_counts=True)
            return pa.table({"node": pa.array(uniq),
                             "deg": pa.array(cnt.astype(np.int64))})

        def _part_x(b: pa.Table) -> pa.Table:
            h = stable_part_codes(b["x"], None)
            return b.append_column(
                "__part",
                pa.array((h % np.uint64(mod)).astype(np.int32)))

        return (ed.map_batches(_both, batch_format="pyarrow")
                .map_batches(_part_x, batch_format="pyarrow")
                .repartition(4).groupby("__part")
                .map_groups(_cnt, batch_format="pyarrow"))

    def _deg_partials(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"node": pa.array([], pa.int64()),
                             "deg": pa.array([], pa.int64())})
        u = b["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, cnt = np.unique(np.concatenate([u, v]), return_counts=True)
        return pa.table({"node": pa.array(uniq),
                         "deg": pa.array(cnt.astype(np.int64))})

    for _round in range(60):
        parts = edges.map_batches(
            _deg_partials, batch_format="pyarrow").take_all()
        if parts:
            nodes = np.array([r["node"] for r in parts], dtype=np.int64)
            degs = np.array([r["deg"] for r in parts], dtype=np.int64)
            uniq, inv = np.unique(nodes, return_inverse=True)
            tot = np.bincount(inv, weights=degs).astype(np.int64)
            low_arr = np.sort(uniq[tot < K])
        else:
            low_arr = np.array([], dtype=np.int64)
        if low_arr.size == 0:
            break
        low_ref = _ray.put(low_arr)

        def _filter(b: pa.Table, _ref=low_ref) -> pa.Table:
            if b.num_rows == 0:
                return b
            bad = _ray.get(_ref)  # sorted int64 ids
            u = b["u"].to_numpy(zero_copy_only=False).astype(np.int64)
            v = b["v"].to_numpy(zero_copy_only=False).astype(np.int64)
            iu = np.minimum(np.searchsorted(bad, u), bad.size - 1)
            iv = np.minimum(np.searchsorted(bad, v), bad.size - 1)
            keep = (bad[iu] != u) & (bad[iv] != v)
            return b.filter(pa.array(keep))

        edges = edges.map_batches(
            _filter, batch_format="pyarrow").materialize()
    else:
        raise RuntimeError("k-core peel did not converge in 60 rounds")

    final = _doubled_deg(edges)

    def _rename(b: pa.Table) -> pa.Table:
        return pa.table({"node": b["node"], "core_deg": b["deg"]})

    return final.map_batches(_rename, batch_format="pyarrow")


KCORE_SQL = """
WITH RECURSIVE nn AS (SELECT count(*) AS c FROM documents),
e0 AS (
    SELECT doc_id AS src,
           (doc_id * 31 + 97 * j) % (SELECT c FROM nn) AS dst
    FROM documents, unnest([1, 2, 3, 4, 5, 6]) t(j)
    WHERE j <= 1 + doc_id % 6
),
und AS (
    SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
    FROM e0 WHERE src <> dst
),
seed AS (
    SELECT u AS src, v AS dst FROM und
    UNION ALL
    SELECT v, u FROM und
),
w AS (
    SELECT CAST(0 AS BIGINT) AS iter, src, dst FROM seed
    UNION ALL
    SELECT iter + 1, src, dst FROM (
        SELECT iter, src, dst, keep,
               sum(CASE WHEN keep THEN 1 ELSE 0 END) OVER () AS kept,
               count(*) OVER () AS tot
        FROM (
            SELECT iter, src, dst,
                   (count(*) OVER (PARTITION BY src) >= 5 AND
                    count(*) OVER (PARTITION BY dst) >= 5) AS keep
            FROM w
        )
    )
    WHERE keep AND kept < tot
)
SELECT src AS node, CAST(count(*) AS BIGINT) AS core_deg
FROM (SELECT w.*, max(iter) OVER () AS mx FROM w)
WHERE iter = mx
GROUP BY src
"""


def q_weighted_sample_docs(sf_dir: str):
    """Weighted priority sampling (Duffield-Lund-Thorup shape with the
    uniform draw PINNED to the md5-u64 of the doc id, the catalog's
    SQL-restatable hash): priority = ``(w << 80) // (h + 1)`` — exact
    integer, no float pow/ln, ties broken by doc_id — and the sample is
    the top-k=20 priorities. Heavier docs (w = n_chars) are
    proportionally more likely under the pinned draw, and the selection
    is deterministic and replayable. Distributed shape: per-batch
    local top-k, driver merge sees blocks×k rows."""
    K = 20
    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "n_chars"])

    from ...stages.dedup import _stable_u64

    def _local(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        w = b["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        pri = np.array([(int(wi) << 80) //
                        (_stable_u64(str(int(di)).encode()) + 1)
                        for di, wi in zip(ids, w)], dtype=np.int64)
        order = np.lexsort((ids, -pri))[:K]
        return pa.table({"doc_id": pa.array(ids[order]),
                         "w": pa.array(w[order]),
                         "priority": pa.array(pri[order])})

    parts = ds.map_batches(_local, batch_format="pyarrow").take_all()
    ids = np.array([r["doc_id"] for r in parts], dtype=np.int64)
    w = np.array([r["w"] for r in parts], dtype=np.int64)
    pri = np.array([r["priority"] for r in parts], dtype=np.int64)
    order = np.lexsort((ids, -pri))[:K]
    return pa.table({"doc_id": pa.array(ids[order]),
                     "w": pa.array(w[order]),
                     "priority": pa.array(pri[order])})


_MD5U64_DOCID = _MD5U64.replace("md5(tok)",
                                "md5(CAST(doc_id AS VARCHAR))")

WEIGHTED_SAMPLE_SQL = f"""
WITH t AS (
    SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
           {_MD5U64_DOCID} AS h
    FROM documents
)
SELECT doc_id, w,
       CAST((CAST(w AS HUGEINT) * 1208925819614629174706176)
            // (h + 1) AS BIGINT)
           AS priority
FROM t
ORDER BY priority DESC, doc_id
LIMIT 20
"""


def q_bfs_hops_docs(sf_dir: str):
    """Single-source BFS hop distances from doc 0 over the same
    variable-degree undirected link graph as ``kcore_docs`` —
    completing the graph family (PageRank, components, triangles,
    degree stats, k-core, reachability). Driver-round frontier BFS
    (diameter rounds, 6 here): each round the current frontier
    broadcasts (``ray.put``) and one map over the edge Dataset emits
    the next ring; the distance table accumulates driver-side under
    the same bounded-node contract as the k-core peel. Output:
    ``(node, hop)`` for every reachable node."""
    import pyarrow.parquet as _pq
    import ray as _ray

    from ...arrow_utils import stable_part_codes

    n = _pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id"]).repartition(4)

    def _edges(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        srcs, dsts = [], []
        for j in range(1, 7):
            m = j <= 1 + d % 6
            s = d[m]
            t = (s * 31 + 97 * j) % n
            keep = s != t
            srcs.append(np.minimum(s[keep], t[keep]))
            dsts.append(np.maximum(s[keep], t[keep]))
        return pa.table({"u": pa.array(np.concatenate(srcs)),
                         "v": pa.array(np.concatenate(dsts))})

    mod = 4 * 64

    def _part_u(b: pa.Table) -> pa.Table:
        h = stable_part_codes(b["u"], None)
        return b.append_column(
            "__part", pa.array((h % np.uint64(mod)).astype(np.int32)))

    def _dedup(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        if t.num_rows == 0:
            return pa.table({"u": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64())})
        u = t["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = np.unique(u * np.int64(2 ** 32) + v)
        return pa.table({"u": pa.array(key // np.int64(2 ** 32)),
                         "v": pa.array(key % np.int64(2 ** 32))})

    edges = (ds.map_batches(_edges, batch_format="pyarrow")
             .map_batches(_part_u, batch_format="pyarrow")
             .repartition(4).groupby("__part")
             .map_groups(_dedup, batch_format="pyarrow")).materialize()

    dist = {0: 0}
    frontier = {0}
    hop = 0
    while frontier:
        hop += 1
        f_ref = _ray.put(frontier)

        def _ring(b: pa.Table) -> pa.Table:
            fr = np.fromiter(_ray.get(f_ref), dtype=np.int64)
            u = b["u"].to_numpy(zero_copy_only=False).astype(np.int64)
            v = b["v"].to_numpy(zero_copy_only=False).astype(np.int64)
            mu = np.isin(u, fr)
            mv = np.isin(v, fr)
            nb = np.unique(np.concatenate([v[mu], u[mv]]))
            return pa.table({"node": pa.array(nb)})

        ring = {int(r["node"]) for r in
                edges.map_batches(_ring,
                                  batch_format="pyarrow").take_all()}
        frontier = {x for x in ring if x not in dist}
        for x in frontier:
            dist[x] = hop
        if hop > 64:
            raise RuntimeError("bfs exceeded the diameter bound")
    nodes = sorted(dist)
    return pa.table({"node": pa.array(nodes, pa.int64()),
                     "hop": pa.array([dist[x] for x in nodes],
                                     pa.int64())})


BFS_HOPS_SQL = """
WITH RECURSIVE nn AS (SELECT count(*) AS c FROM documents),
e0 AS (
    SELECT doc_id AS src,
           (doc_id * 31 + 97 * j) % (SELECT c FROM nn) AS dst
    FROM documents, unnest([1, 2, 3, 4, 5, 6]) t(j)
    WHERE j <= 1 + doc_id % 6
),
und AS (
    SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
    FROM e0 WHERE src <> dst
),
ed AS (
    SELECT u AS src, v AS dst FROM und
    UNION ALL
    SELECT v, u FROM und
),
reach(node, hop) AS (
    SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT)
    UNION
    SELECT ed.dst, r.hop + 1
    FROM reach r JOIN ed ON ed.src = r.node
    WHERE r.hop < 15
)
SELECT node, CAST(min(hop) AS BIGINT) AS hop
FROM reach GROUP BY 1
"""


def q_churn_features_users(sf_dir: str):
    """Per-user churn feature/label table (the feature-engineering step
    of a training pipeline): activity counts, span, distinct active
    days, largest inter-event gap, purchase stats, and the label
    ``churned = no activity in the final 7 days of the corpus window``
    — all exact int64, point-in-time consistent (every feature derives
    only from the user's own ordered events; the global window end is
    the one broadcast scalar). One hash(user) shuffle, vectorized
    segment pass."""
    from ...arrow_utils import stable_part_codes

    D7 = 7 * 86_400_000_000
    ds = _events_series(
        sf_dir, cols=("event_id", "user_id", "event_type", "ts",
                      "value"))

    def _prep(b: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(b["value"], 100.0),
                                 ndigits=0), pa.int64())
        is_p = pc.equal(b["event_type"], "purchase")
        return pa.table({"user_id": b["user_id"],
                         "ts_us": b["ts_us"],
                         "event_id": b["event_id"],
                         "purch": pc.cast(is_p, pa.int64()),
                         "pcents": pc.if_else(
                             is_p, cents, pa.scalar(0, pa.int64()))})

    prepped = ds.map_batches(_prep, batch_format="pyarrow")
    tmax = max(r["tmax"] for r in prepped.map_batches(
        lambda b: pa.table({"tmax": pa.array(
            [int(b["ts_us"].to_numpy(zero_copy_only=False).max())
             if b.num_rows else 0], pa.int64())}),
        batch_format="pyarrow").take_all())

    mod = 4 * 64

    _add_part = make_add_part("user_id", mod)

    def _features(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        u_type = t["user_id"].type
        cols = ("n_events", "n_purchases", "purchase_cents",
                "active_days", "span_us", "max_gap_us", "churned")
        if t.num_rows == 0:
            return pa.table({"user_id": pa.array([], u_type),
                             **{c: pa.array([], pa.int64())
                                for c in cols}})
        t = t.take(pc.sort_indices(t, sort_keys=[
            ("user_id", "ascending"), ("ts_us", "ascending"),
            ("event_id", "ascending")]))
        uid = t["user_id"]
        if isinstance(uid, pa.ChunkedArray):
            uid = uid.combine_chunks()
        codes = group_codes(uid)
        ts = t["ts_us"].to_numpy(zero_copy_only=False).astype(np.int64)
        purch = t["purch"].to_numpy(zero_copy_only=False)
        pcents = t["pcents"].to_numpy(zero_copy_only=False)
        heads = np.ones(len(codes), dtype=bool)
        heads[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(heads)
        ends = np.r_[starts[1:], len(codes)]
        n = ends - starts
        day = ts // 86_400_000_000
        gaps = np.diff(ts)
        gaps = np.where(heads[1:], 0, gaps)
        # per-segment max gap over the boundary-masked diffs
        max_gap = np.array(
            [int(gaps[f:l - 1].max()) if l - f > 1 else 0
             for f, l in zip(starts, ends)], dtype=np.int64)
        active = np.array(
            [len(np.unique(day[f:l])) for f, l in zip(starts, ends)],
            dtype=np.int64)
        last = ts[ends - 1]
        return pa.table({
            "user_id": uid.take(pa.array(starts)),
            "n_events": pa.array(n),
            "n_purchases": pa.array(np.add.reduceat(purch, starts)),
            "purchase_cents": pa.array(np.add.reduceat(pcents, starts)),
            "active_days": pa.array(active),
            "span_us": pa.array(last - ts[starts]),
            "max_gap_us": pa.array(max_gap),
            "churned": pa.array(
                (last < tmax - D7).astype(np.int64))})

    return (prepped.map_batches(_add_part, batch_format="pyarrow")
            .repartition(4).groupby("__part")
            .map_groups(_features, batch_format="pyarrow"))


CHURN_FEATURES_SQL = """
WITH e AS (
    SELECT user_id, event_id, epoch_us(ts) AS t, event_type,
           CAST(round(value * 100) AS BIGINT) AS cents
    FROM events
),
mx AS (SELECT max(t) AS tmax FROM e),
g AS (
    SELECT user_id, t,
           t - lag(t) OVER (PARTITION BY user_id
                            ORDER BY t, event_id) AS gap
    FROM e
)
SELECT e.user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_purchases,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN cents
                ELSE 0 END) AS BIGINT) AS purchase_cents,
       CAST(count(DISTINCT t // 86400000000) AS BIGINT) AS active_days,
       CAST(max(t) - min(t) AS BIGINT) AS span_us,
       CAST(coalesce((SELECT max(gap) FROM g
                      WHERE g.user_id = e.user_id), 0) AS BIGINT)
           AS max_gap_us,
       CAST(CASE WHEN max(t) < (SELECT tmax FROM mx) - 604800000000
                 THEN 1 ELSE 0 END AS BIGINT) AS churned
FROM e GROUP BY e.user_id
"""


def q_ips_policy_eval_events(sf_dir: str):
    """Off-policy evaluation by inverse-propensity scoring (the RL /
    recommender counterfactual estimator): behavior policy = the
    logged uniform-over-5-arms stream (propensity 1/5), target policy
    ``pi(user) = 'purchase' if user_id % 3 == 0 else 'click'``, reward
    ``value > 50``. The IPS estimate ``(1/n) Σ r·1[a=pi(x)]/p`` is
    emitted as exact integer numerators (×5): matched count, matched
    reward sum, n — purely map-side partials, one tiny merge, no
    shuffle at all."""
    ds = _events_series(
        sf_dir, cols=("event_id", "user_id", "event_type", "ts",
                      "value"))

    def _partial(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        v = b["value"].to_numpy(zero_copy_only=False)
        target = np.where(uid % 3 == 0, "purchase", "click")
        match = pc.equal(b["event_type"],
                         pa.array(target.tolist())).to_numpy(
            zero_copy_only=False)
        r = v > 50
        return pa.table({
            "n": pa.array([b.num_rows], pa.int64()),
            "n_matched": pa.array([int(match.sum())], pa.int64()),
            "reward_matched_x5": pa.array(
                [int((match & r).sum()) * 5], pa.int64()),
            "reward_all": pa.array([int(r.sum())], pa.int64())})

    rows = ds.map_batches(_partial, batch_format="pyarrow").take_all()
    agg = {k: sum(int(r[k]) for r in rows)
           for k in ("n", "n_matched", "reward_matched_x5",
                     "reward_all")}
    return pa.table({k: pa.array([v], pa.int64())
                     for k, v in agg.items()})


IPS_POLICY_SQL = """
SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN event_type =
                     (CASE WHEN user_id % 3 = 0
                           THEN 'purchase' ELSE 'click' END)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
       CAST(5 * sum(CASE WHEN value > 50 AND event_type =
                         (CASE WHEN user_id % 3 = 0
                               THEN 'purchase' ELSE 'click' END)
                    THEN 1 ELSE 0 END) AS BIGINT)
           AS reward_matched_x5,
       CAST(sum(CASE WHEN value > 50 THEN 1 ELSE 0 END) AS BIGINT)
           AS reward_all
FROM events
"""


def q_returned_revenue_customers(sf_dir: str):
    """TPC-H-Q10-style returned-item report: revenue lost to returns
    per customer over one half-year of orders, top 20 with customer /
    nation labels. Shape: date-pruned orders hash-join
    returnflag-filtered lineitem (both filtered BEFORE the exchange),
    exact e6 integer revenue partial-sums per customer (hashpart
    grouped sum), distributed sort+limit — and only the 20 surviving
    rows are labeled (dimension lookups AFTER the top-k, so customer
    is never broadcast)."""
    from ...stages.graph import grouped_sum_parts

    lo_us = 820_454_400 * US   # 1996-01-01 UTC
    hi_us = 836_179_200 * US   # 1996-07-01 UTC

    def _orders(b: pa.Table) -> pa.Table:
        ts = pc.cast(b["o_orderdate"], pa.int64())
        t = b.append_column("o_date_us", ts)
        keep = pc.and_(pc.greater_equal(t["o_date_us"],
                                        pa.scalar(lo_us, pa.int64())),
                       pc.less(t["o_date_us"],
                               pa.scalar(hi_us, pa.int64())))
        t = t.filter(keep)
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "o_custkey": t["o_custkey"]})

    orders = _read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        _orders, batch_format="pyarrow")

    def _line(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b["l_returnflag"], "R"))
        price = pc.cast(pc.round(pc.multiply(t["l_extendedprice"],
                                             100.0), ndigits=0),
                        pa.int64())
        disc = pc.cast(pc.round(pc.multiply(t["l_discount"], 10000.0),
                                ndigits=0), pa.int64())
        rev = pc.multiply(price,
                          pc.subtract(pa.scalar(10000, pa.int64()),
                                      disc))
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "revenue_e6": rev})

    line = _read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice",
                 "l_discount"]).map_batches(_line,
                                            batch_format="pyarrow")
    j = line.join(orders, join_type="inner", num_partitions=4,
                  on=("l_orderkey",), right_on=("o_orderkey",))
    agg = grouped_sum_parts(
        j.map_batches(lambda b: pa.table({
            "o_custkey": b["o_custkey"],
            "revenue_e6": b["revenue_e6"]}), batch_format="pyarrow"),
        ["o_custkey"], ["revenue_e6"], count_col=None, fanin=4)
    top = (agg.sort(key=["revenue_e6", "o_custkey"],
                    descending=[True, False]).limit(20).take_all())
    keys = {int(r["o_custkey"]) for r in top}

    cust = {int(r["c_custkey"]): (r["c_name"], int(r["c_nationkey"]))
            for r in _read_parquet_clean(
                f"{sf_dir}/customer.parquet",
                columns=["c_custkey", "c_name", "c_nationkey"])
            .map_batches(
                lambda b: b.filter(pc.is_in(
                    b["c_custkey"],
                    value_set=pa.array(sorted(keys), pa.int64()))),
                batch_format="pyarrow").take_all()}
    nation = {int(r["n_nationkey"]): r["n_name"]
              for r in _read_parquet_clean(
                  f"{sf_dir}/nation.parquet",
                  columns=["n_nationkey", "n_name"]).take_all()}
    return pa.table({
        "c_custkey": pa.array([int(r["o_custkey"]) for r in top],
                              pa.int64()),
        "c_name": pa.array([cust[int(r["o_custkey"])][0]
                            for r in top]),
        "n_name": pa.array([nation[cust[int(r["o_custkey"])][1]]
                            for r in top]),
        "revenue_e6": pa.array([int(r["revenue_e6"]) for r in top],
                               pa.int64())})


RETURNED_REVENUE_SQL = """
WITH r AS (
    SELECT o_custkey,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (10000 - CAST(round(l_discount * 10000)
                                    AS BIGINT))) AS BIGINT)
               AS revenue_e6
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-07-01'
    GROUP BY 1
)
SELECT c_custkey, c_name, n_name, revenue_e6
FROM r
JOIN customer ON c_custkey = o_custkey
JOIN nation ON n_nationkey = c_nationkey
ORDER BY revenue_e6 DESC, c_custkey
LIMIT 20
"""


def q_quantile_normalize_1d(sf_dir: str):
    """Quantile normalization across series (the cross-sample
    calibration classic): every series' rank-r value is replaced by
    the cross-series SUM of rank-r values (the exact-integer form of
    the usual rank mean — divide by the series count to taste). The
    1d tier gives equal-length series (30 buckets), the method's
    requirement. Shape: one hash(series) shuffle ranks each series
    (ties pinned by (y, bucket)); the 30-row rank-sum profile reduces
    map-side and broadcasts back in a closure; one more pass maps each
    row. Output: ``(series_id, bucket, y, rank, qn_sum)``."""
    from ...arrow_utils import stable_part_codes
    from ...stages.rollup import rollup

    D1 = 86_400_000_000
    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    rolled = (rollup(ev.map_batches(_series, batch_format="pyarrow"),
                     D1)
              .select_columns(["series_id", "bucket", "sum_y"]))
    mod = 2 * 64

    _add_part = make_add_part("series_id", mod)

    def _rank(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        s_type = t["series_id"].type
        if t.num_rows == 0:
            return pa.table({"series_id": pa.array([], s_type),
                             "bucket": pa.array([], pa.int64()),
                             "y": pa.array([], pa.int64()),
                             "rank": pa.array([], pa.int64())})
        t = t.take(pc.sort_indices(t, sort_keys=[
            ("series_id", "ascending"), ("sum_y", "ascending"),
            ("bucket", "ascending")]))
        sid = t["series_id"]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = group_codes(sid)
        heads = np.ones(len(codes), dtype=bool)
        heads[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(heads)
        seg_of = np.cumsum(heads) - 1
        pos = np.arange(len(codes)) - starts[seg_of]
        return pa.table({
            "series_id": sid,
            "bucket": t["bucket"].cast(pa.int64()),
            "y": t["sum_y"].cast(pa.int64()),
            "rank": pa.array(pos + 1)})

    ranked = (rolled.map_batches(_add_part, batch_format="pyarrow")
              .repartition(2).groupby("__part")
              .map_groups(_rank, batch_format="pyarrow")).materialize()

    def _profile(b: pa.Table) -> pa.Table:
        g = pa.table({"rank": b["rank"], "y": b["y"]}).group_by(
            ["rank"]).aggregate([("y", "sum")])
        return g.rename_columns(["rank", "ysum"])

    prof_rows = ranked.map_batches(
        _profile, batch_format="pyarrow").take_all()
    prof: dict = {}
    for r in prof_rows:
        prof[int(r["rank"])] = prof.get(int(r["rank"]), 0) + int(
            r["ysum"])

    def _apply(b: pa.Table) -> pa.Table:
        rk = b["rank"].to_numpy(zero_copy_only=False).astype(np.int64)
        qn = np.array([prof[int(r)] for r in rk], dtype=np.int64)
        return b.append_column("qn_sum", pa.array(qn))

    return ranked.map_batches(_apply, batch_format="pyarrow")


QUANTILE_NORMALIZE_SQL = """
WITH r AS (
    SELECT event_type AS series_id,
           epoch_us(ts) // 86400000000 * 86400000000 AS bucket,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
    FROM events GROUP BY 1, 2
),
rk AS (
    SELECT series_id, bucket, y,
           CAST(row_number() OVER (PARTITION BY series_id
                                   ORDER BY y, bucket) AS BIGINT)
               AS rank
    FROM r
),
prof AS (
    SELECT rank, CAST(sum(y) AS BIGINT) AS qn_sum FROM rk GROUP BY 1
)
SELECT rk.series_id, CAST(rk.bucket AS BIGINT) AS bucket, rk.y,
       rk.rank, prof.qn_sum
FROM rk JOIN prof ON prof.rank = rk.rank
"""


