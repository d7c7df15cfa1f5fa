"""PMI, c-TF-IDF class terms, clustering coefficient, decision stump, Mann-Kendall, Page-Hinkley, covisitation, discord/motif, label propagation, sweepline.

Split from the former pipelines/queries.py monolith (r4 verdict
next-round #5); statement order inside this module is the original
file order. Explicit cross-module imports are generated: backward
dependencies at the top, forward (function-body-only) dependencies at
the bottom so package import order stays acyclic.
"""
from __future__ import annotations

from ._shared import US, _langid_ctes, _read_parquet_clean, np, pa, pc
from .events_windows import _events_series
from .downsample_core import _events_cents
from .graph_link import _graph_targets
from ...arrow_utils import group_codes, make_add_part

def q_pmi_pairs_docs(sf_dir: str):
    """Collocation mining: the top-30 token pairs by pointwise mutual
    information, ranked WITHOUT floats — the existing co-occurrence
    stage already emits exact ``pmi_num = co_df·N`` / ``pmi_den =
    df_a·df_b``, and the ranking key is the scaled integer quotient
    ``(pmi_num·1e6) // pmi_den`` with (a, b) tie-breaks. Composes
    ``stages/cooccur.py`` with a distributed sort+limit; a minimum
    co-document support of 3 filters hapax noise."""
    import pyarrow.parquet as _pq

    from ...stages.cooccur import cooccurrence

    n = _pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"]).repartition(8)
    co = cooccurrence(ds, n_docs=n, num_partitions=8)

    def _score(b: pa.Table) -> pa.Table:
        t = b.filter(pc.greater_equal(b["co_df"],
                                      pa.scalar(3, pa.int64())))
        num = t["pmi_num"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        den = t["pmi_den"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        score = num * 1_000_000 // den
        return pa.table({"a": t["a"], "b": t["b"],
                         "co_df": t["co_df"],
                         "pmi_score_e6": pa.array(score)})

    return (co.map_batches(_score, batch_format="pyarrow")
            .sort(key=["pmi_score_e6", "a", "b"],
                  descending=[True, False, False]).limit(30))


PMI_PAIRS_SQL = """
WITH w AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS token
    FROM documents
),
f AS (SELECT DISTINCT doc_id, token FROM w WHERE token <> ''),
p AS (
    SELECT x.token AS a, y.token AS b
    FROM f x JOIN f y
      ON x.doc_id = y.doc_id AND x.token < y.token
),
c AS (SELECT a, b, count(*) AS co_df FROM p GROUP BY a, b),
d AS (SELECT token, count(*) AS df FROM f GROUP BY token),
n AS (SELECT count(*) AS c FROM documents)
SELECT c.a, c.b, CAST(c.co_df AS BIGINT) AS co_df,
       CAST(c.co_df * (SELECT c FROM n) * 1000000
            // (da.df * db.df) AS BIGINT) AS pmi_score_e6
FROM c JOIN d da ON da.token = c.a JOIN d db ON db.token = c.b
WHERE c.co_df >= 3
ORDER BY pmi_score_e6 DESC, a, b
LIMIT 30
"""


def q_class_terms_docs(sf_dir: str):
    """Class-characteristic terms (the BERTopic/c-TF-IDF readout,
    float-free): for each embedding label, the top-5 tokens by the
    integer lift ``(c_lt · T · 1e6) // (t_total · T_l)`` — occurrences
    of t in the label's docs vs the corpus rate, min support 5,
    (score, token) tie-breaks. Shape: the 500-row doc→label map
    broadcasts in a closure (dimension contract); per-batch
    (label, token) count partials reduce through one hashpart grouped
    sum; token totals come from the same table re-reduced; the final
    per-label top-5 is one segment pass over a label-hash shuffle."""
    from ...arrow_utils import stable_part_codes

    ds_lab = _read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                                 columns=["vec_id", "label"])
    lab = {int(r["vec_id"]): int(r["label"])
           for r in ds_lab.take_all()}

    docs = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"]).repartition(8)

    def _counts(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        toks = pc.split_pattern(b["text"], " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        off = toks.offsets.to_numpy(zero_copy_only=False).astype(
            np.int64)
        flat = toks.values.slice(int(off[0]), int(off[-1] - off[0]))
        nonempty = pc.invert(pc.equal(pc.utf8_length(flat), 0))
        labels = np.array([lab[int(i)] for i in ids], dtype=np.int64)
        per_tok_label = np.repeat(labels, np.diff(off))
        keep = nonempty.to_numpy(zero_copy_only=False)
        t = pa.table({"label": pa.array(per_tok_label[keep]),
                      "token": flat.filter(nonempty)})
        g = t.group_by(["label", "token"]).aggregate([([], "count_all")])
        return g.rename_columns(["label", "token", "c"])

    counts = docs.map_batches(_counts, batch_format="pyarrow")
    mod = 4 * 64

    def _part_lt(b: pa.Table) -> pa.Table:
        h = stable_part_codes(b["token"], None)
        return b.append_column(
            "__part", pa.array((h % np.uint64(mod)).astype(np.int32)))

    def _sum_lt(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        if t.num_rows == 0:
            return pa.table({"label": pa.array([], pa.int64()),
                             "token": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        s = t.group_by(["label", "token"]).aggregate([("c", "sum")])
        return s.rename_columns(["label", "token", "c"])

    lt = (counts.map_batches(_part_lt, batch_format="pyarrow")
          .repartition(4).groupby("__part")
          .map_groups(_sum_lt, batch_format="pyarrow")).materialize()

    tot_rows = lt.map_batches(
        lambda b: pa.table({
            "token": b["token"], "c": b["c"],
            "label": b["label"]}),
        batch_format="pyarrow").take_all()
    t_total: dict = {}
    t_label: dict = {}
    T = 0
    for r in tot_rows:
        t_total[r["token"]] = t_total.get(r["token"], 0) + int(r["c"])
        t_label[int(r["label"])] = (t_label.get(int(r["label"]), 0)
                                    + int(r["c"]))
        T += int(r["c"])

    def _score(b: pa.Table) -> pa.Table:
        t = b.filter(pc.greater_equal(b["c"], pa.scalar(5, pa.int64())))
        toks = t["token"].to_pylist()
        labs = t["label"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        score = np.array(
            [int(ci) * T * 1_000_000
             // (t_total[tk] * t_label[int(li)])
             for ci, tk, li in zip(c, toks, labs)], dtype=np.int64)
        return pa.table({"label": pa.array(labs), "token": t["token"],
                         "c": pa.array(c),
                         "score_e6": pa.array(score)})

    scored = lt.map_batches(_score, batch_format="pyarrow")

    def _part_l(b: pa.Table) -> pa.Table:
        h = stable_part_codes(b["label"], None)
        return b.append_column(
            "__part", pa.array((h % np.uint64(mod)).astype(np.int32)))

    def _top5(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        if t.num_rows == 0:
            return pa.table({"label": pa.array([], pa.int64()),
                             "token": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64()),
                             "score_e6": pa.array([], pa.int64())})
        t = t.take(pc.sort_indices(t, sort_keys=[
            ("label", "ascending"), ("score_e6", "descending"),
            ("token", "ascending")]))
        labs = t["label"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        heads = np.ones(len(labs), dtype=bool)
        heads[1:] = labs[1:] != labs[:-1]
        starts = np.flatnonzero(heads)
        seg_of = np.cumsum(heads) - 1
        pos = np.arange(len(labs)) - starts[seg_of]
        return t.filter(pa.array(pos < 5))

    return (scored.map_batches(_part_l, batch_format="pyarrow")
            .repartition(4).groupby("__part")
            .map_groups(_top5, batch_format="pyarrow"))


CLASS_TERMS_SQL = """
WITH lab AS (SELECT vec_id AS doc_id, CAST(label AS BIGINT) AS label
             FROM embeddings),
w AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS token
    FROM documents
),
wf AS (
    SELECT w.doc_id, lab.label, token
    FROM w JOIN lab ON lab.doc_id = w.doc_id
    WHERE token <> ''
),
ct AS (SELECT label, token, CAST(count(*) AS BIGINT) AS c
       FROM wf GROUP BY 1, 2),
tt AS (SELECT token, CAST(count(*) AS BIGINT) AS t_total
       FROM wf GROUP BY 1),
tl AS (SELECT label, CAST(count(*) AS BIGINT) AS t_label
       FROM wf GROUP BY 1),
tot AS (SELECT CAST(count(*) AS BIGINT) AS t FROM wf),
s AS (
    SELECT ct.label, ct.token, ct.c,
           CAST(ct.c * (SELECT t FROM tot) * 1000000
                // (tt.t_total * tl.t_label) AS BIGINT) AS score_e6
    FROM ct
    JOIN tt ON tt.token = ct.token
    JOIN tl ON tl.label = ct.label
    WHERE ct.c >= 5
)
SELECT label, token, c, score_e6 FROM (
    SELECT s.*, row_number() OVER (PARTITION BY label
                                   ORDER BY score_e6 DESC, token) AS rk
    FROM s
) WHERE rk <= 5
"""


def q_langid_confusion_docs(sf_dir: str):
    """Language-ID quality audit: confusion matrix of the LangId
    heuristic's predictions against the corpus' ground-truth ``lang``
    column — (true, predicted, count) cells, the standard classifier
    acceptance report. Actor-pool prediction (profiles built once per
    actor in ``__init__``), per-batch cell partials, tiny final merge
    (<=|langs|² rows)."""
    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text", "lang"])

    from ...stages.textstats import LangId

    class _Conf:
        def __init__(self):
            self.lid = LangId()

        def __call__(self, b: pa.Table) -> pa.Table:
            preds = self.lid(b.select(["doc_id", "text"]))
            t = pa.table({"true_lang": b["lang"],
                          "pred_lang": preds["lang_pred"]})
            g = t.group_by(["true_lang", "pred_lang"]).aggregate(
                [([], "count_all")])
            return g.rename_columns(["true_lang", "pred_lang", "n"])

    def _merge(g: pa.Table) -> pa.Table:
        return pa.table({
            "true_lang": g["true_lang"].slice(0, 1),
            "pred_lang": g["pred_lang"].slice(0, 1),
            "n": pa.array([pc.sum(g["n"]).as_py() or 0], pa.int64())})

    return (ds.map_batches(_Conf, batch_format="pyarrow",
                           concurrency=(1, 8))
            .groupby(["true_lang", "pred_lang"])
            .map_groups(_merge, batch_format="pyarrow"))


def _langid_confusion_sql() -> str:
    return f"""
WITH {_langid_ctes("documents")}
SELECT d.lang AS true_lang, l.lang_pred AS pred_lang,
       CAST(count(*) AS BIGINT) AS n
FROM lid_out l JOIN documents d USING (doc_id)
GROUP BY 1, 2
"""


def q_busday_rollup_orders(sf_dir: str):
    """Business-day settlement rollup: weekend orders roll FORWARD to
    the next business day (Sat → +2, Sun → +1, pinned epoch-day
    arithmetic ``dow = (day + 4) % 7`` — no calendar library on either
    side), then exact cents totals per business day through the
    hashpart grouped sum. The settlement-calendar semantics every
    finance pipeline needs, minus the holiday table (which would
    broadcast exactly like the seasonal profile)."""
    from ...stages.graph import grouped_sum_parts

    DAY = 86_400_000_000

    def _prep(b: pa.Table) -> pa.Table:
        day = (pc.cast(b["o_orderdate"], pa.int64()).to_numpy(
            zero_copy_only=False) // DAY)
        dow = (day + 4) % 7
        bus = day + np.where(dow == 6, 2, np.where(dow == 0, 1, 0))
        cents = pc.cast(pc.round(pc.multiply(b["o_totalprice"], 100.0),
                                 ndigits=0), pa.int64())
        return pa.table({"busday": pa.array(bus.astype(np.int64)),
                         "total_cents": cents,
                         "one": pa.array(
                             np.ones(b.num_rows, dtype=np.int64))})

    ds = _read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderdate", "o_totalprice"]).map_batches(
        _prep, batch_format="pyarrow")
    agg = grouped_sum_parts(ds, ["busday"], ["total_cents", "one"],
                            count_col=None, fanin=4)
    return agg.map_batches(
        lambda b: pa.table({"busday": b["busday"],
                            "n_orders": b["one"],
                            "total_cents": b["total_cents"]}),
        batch_format="pyarrow")


BUSDAY_ROLLUP_SQL = """
WITH o AS (
    SELECT epoch_us(o_orderdate) // 86400000000 AS day,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
),
b AS (
    SELECT day + CASE WHEN (day + 4) % 7 = 6 THEN 2
                      WHEN (day + 4) % 7 = 0 THEN 1
                      ELSE 0 END AS busday,
           cents
    FROM o
)
SELECT CAST(busday AS BIGINT) AS busday,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(cents) AS BIGINT) AS total_cents
FROM b GROUP BY 1
"""


def q_clustering_coeff_docs(sf_dir: str):
    """Local clustering coefficient per node — ``2·tri / (deg·(deg−1))``
    as an exact gcd-reduced fraction — composing the per-node triangle
    counts (``stages/graph.py:triangle_counts``) with doubled-edge
    degree counts. Join-free merge: both per-node tables union as
    zero-padded partials ``(node, deg, tri)`` and reduce through ONE
    hashpart grouped sum; nodes with deg < 2 are omitted (undefined
    coefficient)."""
    import pyarrow.parquet as _pq

    from ...arrow_utils import stable_part_codes
    from ...stages.graph import triangle_counts

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
    tri = triangle_counts(edges, num_partitions=4, fanin=4)

    def _tri_part(b: pa.Table) -> pa.Table:
        return pa.table({
            "node": b["doc_id"].cast(pa.int64()),
            "deg": pa.array(np.zeros(b.num_rows, dtype=np.int64)),
            "tri": b["n_triangles"].cast(pa.int64())})

    mod = 4 * 64

    # exact degrees need a hashpart distinct over canonical edges first
    # (hash by u co-locates every copy of an edge; per-node partial
    # degrees from different partitions merge in the final grouped sum)
    def _canon(b: pa.Table) -> pa.Table:
        src = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = src != dst
        u = np.minimum(src[keep], dst[keep])
        v = np.maximum(src[keep], dst[keep])
        return pa.table({"u": pa.array(u), "v": pa.array(v)})

    def _part_u(b: pa.Table) -> pa.Table:
        h = stable_part_codes(b["u"], None)
        return b.append_column(
            "__part", pa.array((h % np.uint64(mod)).astype(np.int32)))

    def _dedup(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        if t.num_rows == 0:
            return pa.table({"node": pa.array([], pa.int64()),
                             "deg": pa.array([], pa.int64()),
                             "tri": pa.array([], pa.int64())})
        u = t["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = np.unique(u * np.int64(2 ** 32) + v)
        both = np.concatenate([key // np.int64(2 ** 32),
                               key % np.int64(2 ** 32)])
        uniq, cnt = np.unique(both, return_counts=True)
        return pa.table({"node": pa.array(uniq),
                         "deg": pa.array(cnt.astype(np.int64)),
                         "tri": pa.array(np.zeros(len(uniq),
                                                  dtype=np.int64))})

    deg = (edges.map_batches(_canon, batch_format="pyarrow")
           .map_batches(_part_u, batch_format="pyarrow")
           .repartition(4).groupby("__part")
           .map_groups(_dedup, batch_format="pyarrow"))

    unioned = deg.union(tri.map_batches(_tri_part,
                                        batch_format="pyarrow"))

    def _part_n(b: pa.Table) -> pa.Table:
        h = stable_part_codes(b["node"], None)
        return b.append_column(
            "__part", pa.array((h % np.uint64(mod)).astype(np.int32)))

    def _cc(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        empty = pa.table({"node": pa.array([], pa.int64()),
                          "deg": pa.array([], pa.int64()),
                          "n_triangles": pa.array([], pa.int64()),
                          "cc_num": pa.array([], pa.int64()),
                          "cc_den": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        node = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        degv = t["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
        triv = t["tri"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(node, kind="stable")
        node, degv, triv = node[order], degv[order], triv[order]
        heads = np.ones(len(node), dtype=bool)
        heads[1:] = node[1:] != node[:-1]
        starts = np.flatnonzero(heads)
        nd = node[starts]
        d = np.add.reduceat(degv, starts)
        tr = np.add.reduceat(triv, starts)
        keep = d >= 2
        nd, d, tr = nd[keep], d[keep], tr[keep]
        num = 2 * tr
        den = d * (d - 1)
        g_ = np.gcd(num, den)
        g_ = np.where(g_ == 0, 1, g_)
        return pa.table({"node": pa.array(nd), "deg": pa.array(d),
                         "n_triangles": pa.array(tr),
                         "cc_num": pa.array(num // g_),
                         "cc_den": pa.array(den // g_)})

    return (unioned.map_batches(_part_n, batch_format="pyarrow")
            .repartition(4).groupby("__part")
            .map_groups(_cc, batch_format="pyarrow"))


CLUSTERING_COEFF_SQL = """
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
deg AS (
    SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
        SELECT a AS node FROM e UNION ALL SELECT b FROM e
    ) GROUP BY 1
),
w AS (
    SELECT e1.a, e1.b, e2.b AS c
    FROM e e1 JOIN e e2 ON e1.b = e2.a
),
t AS (
    SELECT w.a, w.b, w.c
    FROM w JOIN e e3 ON e3.a = w.a AND e3.b = w.c
),
v AS (
    SELECT a AS node FROM t
    UNION ALL SELECT b FROM t
    UNION ALL SELECT c FROM t
),
tri AS (SELECT node, CAST(count(*) AS BIGINT) AS tri FROM v GROUP BY 1)
SELECT deg.node, deg.deg,
       CAST(coalesce(tri.tri, 0) AS BIGINT) AS n_triangles,
       CAST(2 * coalesce(tri.tri, 0)
            // greatest(gcd(2 * coalesce(tri.tri, 0),
                            deg.deg * (deg.deg - 1)), 1) AS BIGINT)
           AS cc_num,
       CAST(deg.deg * (deg.deg - 1)
            // greatest(gcd(2 * coalesce(tri.tri, 0),
                            deg.deg * (deg.deg - 1)), 1) AS BIGINT)
           AS cc_den
FROM deg LEFT JOIN tri ON tri.node = deg.node
WHERE deg.deg >= 2
"""


def q_lateness_accounting_events(sf_dir: str):
    """Streaming watermark/lateness accounting (the Beam/Flink triage
    every windowed pipeline reports): with the deterministic ingest
    delay ``(event_id % 10) * 90 s`` and 15-minute tumbling windows, an
    event is ON TIME if it arrives before its window closes, LATE-OK
    within the 5-minute allowed lateness, DROPPED after. Per series:
    the three counts plus total delay — pure per-row arithmetic, so the
    whole audit is map-side partials + a ≤|series| merge, no shuffle of
    the stream."""
    W15 = 900 * US
    ALLOW = 300 * US

    ev = _events_series(sf_dir, cols=("event_id", "event_type", "ts"))

    def _partial(b: pa.Table) -> pa.Table:
        ts = b["ts_us"].to_numpy(zero_copy_only=False).astype(np.int64)
        eid = b["event_id"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        delay = (eid % 10) * 90 * US
        ingest = ts + delay
        close = (ts // W15 + 1) * W15
        on_time = ingest <= close
        late_ok = ~on_time & (ingest <= close + ALLOW)
        dropped = ~on_time & ~late_ok
        t = pa.table({"event_type": b["event_type"],
                      "on_time": pa.array(on_time.astype(np.int64)),
                      "late_ok": pa.array(late_ok.astype(np.int64)),
                      "dropped": pa.array(dropped.astype(np.int64)),
                      "delay_us": pa.array(delay)})
        g = t.group_by(["event_type"]).aggregate(
            [("on_time", "sum"), ("late_ok", "sum"),
             ("dropped", "sum"), ("delay_us", "sum")])
        return g.rename_columns(["event_type", "n_on_time",
                                 "n_late_ok", "n_dropped",
                                 "total_delay_us"])

    def _merge(g: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": g["event_type"].slice(0, 1),
            **{c: pa.array([pc.sum(g[c]).as_py() or 0], pa.int64())
               for c in ("n_on_time", "n_late_ok", "n_dropped",
                         "total_delay_us")}})

    return (ev.map_batches(_partial, batch_format="pyarrow")
            .groupby("event_type").map_groups(_merge,
                                              batch_format="pyarrow"))


LATENESS_SQL = """
WITH e AS (
    SELECT event_type, epoch_us(ts) AS t,
           (event_id % 10) * 90000000 AS delay
    FROM events
),
c AS (
    SELECT event_type, delay,
           t + delay AS ingest,
           (t // 900000000 + 1) * 900000000 AS wclose
    FROM e
)
SELECT event_type,
       CAST(sum(CASE WHEN ingest <= wclose THEN 1 ELSE 0 END)
            AS BIGINT) AS n_on_time,
       CAST(sum(CASE WHEN ingest > wclose
                      AND ingest <= wclose + 300000000
                THEN 1 ELSE 0 END) AS BIGINT) AS n_late_ok,
       CAST(sum(CASE WHEN ingest > wclose + 300000000
                THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       CAST(sum(delay) AS BIGINT) AS total_delay_us
FROM c GROUP BY 1
"""


def q_decision_stump_users(sf_dir: str):
    """Train a depth-1 decision tree (stump) on the churn table:
    the exact Gini-optimal threshold on ``n_events`` for predicting
    ``churned``. Minimizing weighted Gini = maximizing
    ``h(t) = (p_l²+q_l²)/n_l + (p_r²+q_r²)/n_r``; candidates are
    ordered by the e12-scaled integer quotient of h's common-denominator
    form (ties → smaller threshold) — no floats, both sides identical.
    Scale shape: the stream reduces map-side to the BOUNDED
    (feature value → (count, churned)) histogram (distinct n_events
    values, not users); the prefix-sum scan over candidates is
    driver-side on that bounded table. Output: one row with the chosen
    threshold and its split counts."""
    from ...arrow_utils import stable_part_codes

    D7 = 7 * 86_400_000_000
    ds = _events_series(sf_dir, cols=("event_id", "user_id", "ts"))

    tmax = max(r["tmax"] for r in ds.map_batches(
        lambda b: pa.table({"tmax": pa.array(
            [int(b["ts_us"].to_numpy(zero_copy_only=False).max())
             if b.num_rows else 0], pa.int64())}),
        batch_format="pyarrow").take_all())

    mod = 4 * 64

    _add_part = make_add_part("user_id", mod)

    def _hist(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        if t.num_rows == 0:
            return pa.table({"x": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "churn": pa.array([], pa.int64())})
        uid = t["user_id"]
        if isinstance(uid, pa.ChunkedArray):
            uid = uid.combine_chunks()
        codes = group_codes(uid)
        ts = t["ts_us"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(codes, kind="stable")
        codes, ts = codes[order], ts[order]
        heads = np.ones(len(codes), dtype=bool)
        heads[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(heads)
        n_ev = np.diff(np.append(starts, len(codes)))
        last = np.maximum.reduceat(ts, starts)
        churned = (last < tmax - D7).astype(np.int64)
        xs, inv = np.unique(n_ev, return_inverse=True)
        cnt = np.bincount(inv)
        ch = np.bincount(inv, weights=churned).astype(np.int64)
        return pa.table({"x": pa.array(xs.astype(np.int64)),
                         "n": pa.array(cnt.astype(np.int64)),
                         "churn": pa.array(ch)})

    rows = (ds.map_batches(_add_part, batch_format="pyarrow")
            .repartition(4).groupby("__part")
            .map_groups(_hist, batch_format="pyarrow")).take_all()
    hist: dict = {}
    for r in rows:
        x = int(r["x"])
        n0, c0 = hist.get(x, (0, 0))
        hist[x] = (n0 + int(r["n"]), c0 + int(r["churn"]))
    xs = sorted(hist)
    N = sum(n for n, _ in hist.values())
    P = sum(c for _, c in hist.values())
    best = None
    nl = pl = 0
    for t in xs[:-1]:
        n, c = hist[t]
        nl += n
        pl += c
        nr, pr = N - nl, P - pl
        ql, qr = nl - pl, nr - pr
        A = pl * pl + ql * ql
        B = pr * pr + qr * qr
        score_q = (A * nr + B * nl) * 10 ** 12 // (nl * nr)
        key = (-score_q, t)
        if best is None or key < best[0]:
            best = (key, t, nl, pl, nr, pr)
    _, thr, n_left, churn_left, n_right, churn_right = best
    return pa.table({
        "threshold": pa.array([thr], pa.int64()),
        "n_left": pa.array([n_left], pa.int64()),
        "churn_left": pa.array([churn_left], pa.int64()),
        "n_right": pa.array([n_right], pa.int64()),
        "churn_right": pa.array([churn_right], pa.int64())})


DECISION_STUMP_SQL = """
WITH u AS (
    SELECT user_id, count(*) AS n_events,
           CAST(max(epoch_us(ts)) <
                (SELECT max(epoch_us(ts)) FROM events) - 604800000000
                AS BIGINT) AS churned
    FROM events GROUP BY 1
),
h AS (
    SELECT n_events AS x, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(churned) AS BIGINT) AS churn
    FROM u GROUP BY 1
),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
               CAST(sum(churn) AS BIGINT) AS pp FROM h),
pre AS (
    SELECT x,
           CAST(sum(n) OVER (ORDER BY x
                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS nl,
           CAST(sum(churn) OVER (ORDER BY x
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS pl
    FROM h
),
cand AS (
    SELECT x AS threshold, nl, pl,
           (SELECT nn FROM tot) - nl AS nr,
           (SELECT pp FROM tot) - pl AS pr
    FROM pre
    WHERE (SELECT nn FROM tot) - nl > 0
),
scored AS (
    SELECT threshold, nl, pl, nr, pr,
           ((pl * pl + (nl - pl) * (nl - pl)) * nr
            + (pr * pr + (nr - pr) * (nr - pr)) * nl)
           * 1000000000000 // (nl * nr) AS score_q
    FROM cand
)
SELECT CAST(threshold AS BIGINT) AS threshold,
       nl AS n_left, pl AS churn_left,
       nr AS n_right, pr AS churn_right
FROM (
    SELECT scored.*, row_number() OVER (ORDER BY score_q DESC,
                                        threshold) AS rk
    FROM scored
) WHERE rk = 1
"""


def q_mann_kendall_15m(sf_dir: str):
    """Mann-Kendall nonparametric trend test per series over the 15m
    tier: ``S = Σ_{i<j} sign(y_j − y_i)`` and the tie-corrected
    variance NUMERATOR ``18·Var = n(n−1)(2n+5) − Σ t(t−1)(2t+5)`` —
    all exact int64 (the significance z is one float away, left to the
    caller). The standard companion to Theil-Sen's slope: same ONE
    hash(series) shuffle; S accumulates earlier-smaller minus
    earlier-larger counts through a Fenwick tree over compressed value
    ranks — O(n log n) on tier rows, never the quadratic pair
    expansion."""
    from ...arrow_utils import stable_part_codes
    from ...stages.rollup import rollup

    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    rolled = rollup(ev.map_batches(_series, batch_format="pyarrow"),
                    900 * US)
    mod = 2 * 64

    _add_part = make_add_part("series_id", mod)

    def _mk(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        s_type = t["series_id"].type
        cols = ("n", "s_stat", "var18")
        if t.num_rows == 0:
            return pa.table({"series_id": pa.array([], s_type),
                             **{c: pa.array([], pa.int64())
                                for c in cols}})
        t = t.take(pc.sort_indices(t, sort_keys=[
            ("series_id", "ascending"), ("bucket", "ascending")]))
        sid = t["series_id"]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = group_codes(sid)
        y = t["sum_y"].to_numpy(zero_copy_only=False).astype(np.int64)
        heads = np.ones(len(codes), dtype=bool)
        heads[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(heads)
        ends = np.r_[starts[1:], len(codes)]
        out = {k: [] for k in ("sid",) + cols}
        for f, l in zip(starts, ends):  # series loop; inner vectorized
            yy = y[f:l]
            n = l - f
            order = np.argsort(yy, kind="stable")
            ys = yy[order]
            newv = np.ones(n, dtype=bool)
            newv[1:] = ys[1:] != ys[:-1]
            vstart = np.flatnonzero(newv)
            tcnt = np.diff(np.append(vstart, n))
            # S = sum over time-ordered pairs of sign(y_later - y_early)
            # = per position j: (#earlier smaller) - (#earlier larger),
            # counted with a Fenwick tree over compressed value ranks
            ranks = np.searchsorted(ys[newv], yy)
            tree = np.zeros(len(vstart) + 1, dtype=np.int64)

            def _upd(i):
                i += 1
                while i < len(tree):
                    tree[i] += 1
                    i += i & (-i)

            def _qry(i):
                s = 0
                i += 1
                while i > 0:
                    s += tree[i]
                    i -= i & (-i)
                return s

            S = 0
            for j in range(n):  # Fenwick walk; tier rows only
                r = int(ranks[j])
                smaller = _qry(r - 1)
                eq = _qry(r) - smaller
                S += smaller - (j - smaller - eq)
                _upd(r)
            var18 = (n * (n - 1) * (2 * n + 5)
                     - int((tcnt * (tcnt - 1) * (2 * tcnt + 5)).sum()))
            out["sid"].append(sid[int(f)].as_py())
            out["n"].append(n)
            out["s_stat"].append(int(S))
            out["var18"].append(var18)
        return pa.table({"series_id": pa.array(out["sid"], s_type),
                         **{c: pa.array(out[c], pa.int64())
                            for c in cols}})

    return (rolled.map_batches(_add_part, batch_format="pyarrow")
            .repartition(2).groupby("__part")
            .map_groups(_mk, batch_format="pyarrow"))


MANN_KENDALL_SQL = """
WITH r AS (
    SELECT event_type AS series_id,
           epoch_us(ts) // 900000000 * 900000000 AS bucket,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
    FROM events GROUP BY 1, 2
),
p AS (
    SELECT a.series_id,
           CAST(sum(CASE WHEN b.y > a.y THEN 1
                         WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT)
               AS s_stat
    FROM r a JOIN r b
      ON a.series_id = b.series_id AND b.bucket > a.bucket
    GROUP BY 1
),
nn AS (SELECT series_id, CAST(count(*) AS BIGINT) AS n
       FROM r GROUP BY 1),
ties AS (
    SELECT series_id,
           CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
               AS tie_term
    FROM (SELECT series_id, y, count(*) AS t FROM r GROUP BY 1, 2)
    GROUP BY 1
)
SELECT nn.series_id, nn.n, coalesce(p.s_stat, 0) AS s_stat,
       CAST(nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tie_term
            AS BIGINT) AS var18
FROM nn
LEFT JOIN p ON p.series_id = nn.series_id
JOIN ties ON ties.series_id = nn.series_id
"""


def q_page_hinkley_15m(sf_dir: str):
    """Page-Hinkley mean-shift drift detector per series over the 15m
    tier (the streaming-ML drift test beside CUSUM/AMOC): deviations
    are scaled by the series count to stay integer
    (``d_i = n·y_i − Σy``), ``PH_t = cumsum(d) − running_min`` and an
    alarm fires when ``PH_t > n·λ`` (λ = 50 000 cents). Output per
    series: n, final/max PH (in the n-scaled units), alarm count and
    first alarm bucket. One hash(series) shuffle; cumsum + running min
    per segment — the one-sided clamp family's window identity again.
    """
    from ...arrow_utils import stable_part_codes
    from ...stages.rollup import rollup

    LAM = 50_000
    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    rolled = rollup(ev.map_batches(_series, batch_format="pyarrow"),
                    900 * US)
    mod = 2 * 64

    _add_part = make_add_part("series_id", mod)

    def _ph(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        s_type = t["series_id"].type
        cols = ("n", "final_ph", "max_ph", "n_alarms", "first_alarm")
        if t.num_rows == 0:
            return pa.table({"series_id": pa.array([], s_type),
                             **{c: pa.array([], pa.int64())
                                for c in cols}})
        t = t.take(pc.sort_indices(t, sort_keys=[
            ("series_id", "ascending"), ("bucket", "ascending")]))
        sid = t["series_id"]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = group_codes(sid)
        y = t["sum_y"].to_numpy(zero_copy_only=False).astype(np.int64)
        bkt = t["bucket"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        heads = np.ones(len(codes), dtype=bool)
        heads[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(heads)
        ends = np.r_[starts[1:], len(codes)]
        out = {k: [] for k in ("sid",) + cols}
        for f, l in zip(starts, ends):  # series loop; inner vector
            yy = y[f:l]
            n = l - f
            d = n * yy - yy.sum()
            M = np.cumsum(d)
            ph = M - np.minimum.accumulate(M)
            alarm = ph > n * LAM
            out["sid"].append(sid[int(f)].as_py())
            out["n"].append(n)
            out["final_ph"].append(int(ph[-1]))
            out["max_ph"].append(int(ph.max()))
            out["n_alarms"].append(int(alarm.sum()))
            first = np.flatnonzero(alarm)
            out["first_alarm"].append(
                int(bkt[f + first[0]]) if len(first) else None)
        return pa.table({
            "series_id": pa.array(out["sid"], s_type),
            "n": pa.array(out["n"], pa.int64()),
            "final_ph": pa.array(out["final_ph"], pa.int64()),
            "max_ph": pa.array(out["max_ph"], pa.int64()),
            "n_alarms": pa.array(out["n_alarms"], pa.int64()),
            "first_alarm": pa.array(out["first_alarm"], pa.int64())})

    return (rolled.map_batches(_add_part, batch_format="pyarrow")
            .repartition(2).groupby("__part")
            .map_groups(_ph, batch_format="pyarrow"))


PAGE_HINKLEY_SQL = """
WITH r AS (
    SELECT event_type AS series_id,
           epoch_us(ts) // 900000000 * 900000000 AS bucket,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
    FROM events GROUP BY 1, 2
),
s AS (
    SELECT series_id, bucket, y,
           CAST(count(*) OVER (PARTITION BY series_id) AS BIGINT) AS n,
           CAST(sum(y) OVER (PARTITION BY series_id) AS BIGINT) AS sy
    FROM r
),
m AS (
    SELECT series_id, bucket, n,
           CAST(sum(n * y - sy) OVER w AS BIGINT) AS M
    FROM s
    WINDOW w AS (PARTITION BY series_id ORDER BY bucket
                 ROWS UNBOUNDED PRECEDING)
),
p AS (
    SELECT series_id, bucket, n,
           M - min(M) OVER (PARTITION BY series_id ORDER BY bucket
                            ROWS UNBOUNDED PRECEDING) AS ph
    FROM m
)
SELECT series_id, CAST(max(n) AS BIGINT) AS n,
       CAST(max(CASE WHEN rk = n THEN ph END) AS BIGINT) AS final_ph,
       CAST(max(ph) AS BIGINT) AS max_ph,
       CAST(sum(CASE WHEN ph > n * 50000 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_alarms,
       CAST(min(CASE WHEN ph > n * 50000 THEN bucket END) AS BIGINT)
           AS first_alarm
FROM (
    SELECT p.*, row_number() OVER (PARTITION BY series_id
                                   ORDER BY bucket) AS rk
    FROM p
) GROUP BY 1
"""


def q_covisit_users(sf_dir: str):
    """Co-visitation pairs (the collaborative-filtering bipartite
    projection): two users co-visit when both are active in the same
    (event_type, 1h bucket) cell; emit the top-20 user pairs by
    co-cell count — exact integers, (count DESC, u, v) total order.
    Shape: one hash(cell) shuffle; per-cell DISTINCT user lists expand
    to (u < v) pairs with the segment-pair gather (cells are bounded —
    a production run caps hot cells with logged drops, as the dedup
    operators do); pair counts reduce through one hashpart grouped
    sum; distributed sort + limit."""
    from ...arrow_utils import stable_part_codes
    from ...stages.graph import grouped_sum_parts

    H = 3_600_000_000
    ev = _events_series(sf_dir, cols=("event_id", "user_id",
                                      "event_type", "ts"))

    def _cells(b: pa.Table) -> pa.Table:
        bkt = (b["ts_us"].to_numpy(zero_copy_only=False).astype(
            np.int64) // H)
        return pa.table({"cell_type": b["event_type"],
                         "cell_bucket": pa.array(bkt),
                         "user_id": b["user_id"].cast(pa.int64())})

    mod = 4 * 64

    def _add_part(b: pa.Table) -> pa.Table:
        h = stable_part_codes(b["cell_type"], None)
        bkt = b["cell_bucket"].to_numpy(zero_copy_only=False).astype(
            np.uint64)
        mix = (h ^ (bkt * np.uint64(0x9E3779B97F4A7C15)))
        return b.append_column(
            "__part", pa.array((mix % np.uint64(mod)).astype(np.int32)))

    def _pairs(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        empty = pa.table({"u": pa.array([], pa.int64()),
                          "v": pa.array([], pa.int64()),
                          "one": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        key = pa.table({"ct": t["cell_type"], "cb": t["cell_bucket"],
                        "u": t["user_id"]})
        key = key.group_by(["ct", "cb", "u"]).aggregate([])
        key = key.take(pc.sort_indices(key, sort_keys=[
            ("ct", "ascending"), ("cb", "ascending"),
            ("u", "ascending")]))
        ct = key["ct"]
        if isinstance(ct, pa.ChunkedArray):
            ct = ct.combine_chunks()
        ccode = group_codes(ct)
        cb = key["cb"].to_numpy(zero_copy_only=False).astype(np.int64)
        u = key["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        cell = ccode * np.int64(2 ** 32) + cb % np.int64(2 ** 32)
        heads = np.ones(len(cell), dtype=bool)
        heads[1:] = cell[1:] != cell[:-1]
        starts = np.flatnonzero(heads)
        n = np.diff(np.append(starts, len(cell)))
        live = n > 1
        if not live.any():
            return empty
        segl, nl = starts[live], n[live]
        sq = nl * nl
        offs = np.concatenate(([0], np.cumsum(sq)[:-1]))
        q = np.arange(int(sq.sum())) - np.repeat(offs, sq)
        nn_ = np.repeat(nl, sq)
        i_loc = q // nn_
        j_loc = q % nn_
        keep = j_loc > i_loc
        i = (np.repeat(segl, sq) + i_loc)[keep]
        j = (np.repeat(segl, sq) + j_loc)[keep]
        return pa.table({"u": pa.array(u[i]), "v": pa.array(u[j]),
                         "one": pa.array(np.ones(len(i),
                                                 dtype=np.int64))})

    pairs = (ev.map_batches(_cells, batch_format="pyarrow")
             .map_batches(_add_part, batch_format="pyarrow")
             .repartition(4).groupby("__part")
             .map_groups(_pairs, batch_format="pyarrow"))
    agg = grouped_sum_parts(pairs, ["u", "v"], ["one"],
                            count_col=None, fanin=4)
    return (agg.map_batches(
        lambda b: pa.table({"u": b["u"], "v": b["v"],
                            "n_cocells": b["one"]}),
        batch_format="pyarrow")
        .sort(key=["n_cocells", "u", "v"],
              descending=[True, False, False]).limit(20))


COVISIT_SQL = """
WITH c AS (
    SELECT DISTINCT event_type AS ct, epoch_us(ts) // 3600000000 AS cb,
           user_id AS u
    FROM events
)
SELECT a.u AS u, b.u AS v, CAST(count(*) AS BIGINT) AS n_cocells
FROM c a JOIN c b ON a.ct = b.ct AND a.cb = b.cb AND a.u < b.u
GROUP BY 1, 2
ORDER BY n_cocells DESC, u, v
LIMIT 20
"""


def q_boxplot_15m(sf_dir: str):
    """Tukey boxplot summary per series over the 15m tier: min, Q1,
    median, Q3, max (the pinned lower-quantile convention shared with
    ``exact_quantiles``), the 1.5·IQR whiskers and the outlier count —
    fences kept exact by doubling (``upper2 = 2·Q3 + 3·IQR``, compare
    ``2·y`` against it; never a .5 float). One hash(series) shuffle,
    one sorted segment pass for every statistic."""
    from ...arrow_utils import stable_part_codes
    from ...stages.rollup import rollup

    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    rolled = rollup(ev.map_batches(_series, batch_format="pyarrow"),
                    900 * US)
    mod = 2 * 64

    _add_part = make_add_part("series_id", mod)

    def _box(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        s_type = t["series_id"].type
        cols = ("n", "y_min", "q1", "median", "q3", "y_max",
                "lo_whisker", "hi_whisker", "n_outliers")
        if t.num_rows == 0:
            return pa.table({"series_id": pa.array([], s_type),
                             **{c: pa.array([], pa.int64())
                                for c in cols}})
        t = t.take(pc.sort_indices(t, sort_keys=[
            ("series_id", "ascending"), ("sum_y", "ascending"),
            ("bucket", "ascending")]))
        sid = t["series_id"]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = group_codes(sid)
        y = t["sum_y"].to_numpy(zero_copy_only=False).astype(np.int64)
        heads = np.ones(len(codes), dtype=bool)
        heads[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(heads)
        ends = np.r_[starts[1:], len(codes)]
        out = {k: [] for k in ("sid",) + cols}
        for f, l in zip(starts, ends):  # series loop; inner vector
            yy = y[f:l]
            n = l - f
            q1 = int(yy[(n - 1) * 25 // 100])
            q2 = int(yy[(n - 1) * 50 // 100])
            q3 = int(yy[(n - 1) * 75 // 100])
            iqr = q3 - q1
            lo2 = 2 * q1 - 3 * iqr
            hi2 = 2 * q3 + 3 * iqr
            inside = (2 * yy >= lo2) & (2 * yy <= hi2)
            out["sid"].append(sid[int(f)].as_py())
            out["n"].append(n)
            out["y_min"].append(int(yy[0]))
            out["q1"].append(q1)
            out["median"].append(q2)
            out["q3"].append(q3)
            out["y_max"].append(int(yy[-1]))
            out["lo_whisker"].append(int(yy[inside].min()))
            out["hi_whisker"].append(int(yy[inside].max()))
            out["n_outliers"].append(int((~inside).sum()))
        return pa.table({"series_id": pa.array(out["sid"], s_type),
                         **{c: pa.array(out[c], pa.int64())
                            for c in cols}})

    return (rolled.map_batches(_add_part, batch_format="pyarrow")
            .repartition(2).groupby("__part")
            .map_groups(_box, batch_format="pyarrow"))


BOXPLOT_SQL = """
WITH r AS (
    SELECT event_type AS series_id,
           epoch_us(ts) // 900000000 * 900000000 AS bucket,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
    FROM events GROUP BY 1, 2
),
o AS (
    SELECT series_id, y,
           row_number() OVER (PARTITION BY series_id
                              ORDER BY y, bucket) - 1 AS rk,
           count(*) OVER (PARTITION BY series_id) AS n
    FROM r
),
q AS (
    SELECT series_id, CAST(max(n) AS BIGINT) AS n,
           CAST(min(y) AS BIGINT) AS y_min,
           CAST(max(CASE WHEN rk = (n - 1) * 25 // 100 THEN y END)
                AS BIGINT) AS q1,
           CAST(max(CASE WHEN rk = (n - 1) * 50 // 100 THEN y END)
                AS BIGINT) AS median,
           CAST(max(CASE WHEN rk = (n - 1) * 75 // 100 THEN y END)
                AS BIGINT) AS q3,
           CAST(max(y) AS BIGINT) AS y_max
    FROM o GROUP BY series_id
)
SELECT q.series_id, q.n, q.y_min, q.q1, q.median, q.q3, q.y_max,
       CAST(min(CASE WHEN 2 * r.y >= 2 * q.q1 - 3 * (q.q3 - q.q1)
                      AND 2 * r.y <= 2 * q.q3 + 3 * (q.q3 - q.q1)
                THEN r.y END) AS BIGINT) AS lo_whisker,
       CAST(max(CASE WHEN 2 * r.y >= 2 * q.q1 - 3 * (q.q3 - q.q1)
                      AND 2 * r.y <= 2 * q.q3 + 3 * (q.q3 - q.q1)
                THEN r.y END) AS BIGINT) AS hi_whisker,
       CAST(sum(CASE WHEN 2 * r.y < 2 * q.q1 - 3 * (q.q3 - q.q1)
                      OR 2 * r.y > 2 * q.q3 + 3 * (q.q3 - q.q1)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM q JOIN r ON r.series_id = q.series_id
GROUP BY 1, 2, 3, 4, 5, 6, 7
"""


def q_median_of_means_15m(sf_dir: str):
    """Median-of-means robust mean per series (the heavy-tail-safe
    estimator behind every streaming robust-statistics bound): tier
    rows stripe into g=10 contiguous groups (``grp = (rk−1)·g // n``),
    group means stay EXACT rationals (sum, count), and the median
    group is selected by exact rational order — keys are
    ``sum_i · (D / cnt_i)`` with D = the ≤2 distinct group sizes'
    product, ties by group index; the lower median. Output per series:
    n, n_groups, the median group's (sum, count) and the plain overall
    sum for contrast. One hash(series) shuffle, one segment pass."""
    from ...arrow_utils import stable_part_codes
    from ...stages.rollup import rollup

    G = 10
    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    rolled = rollup(ev.map_batches(_series, batch_format="pyarrow"),
                    900 * US)
    mod = 2 * 64

    _add_part = make_add_part("series_id", mod)

    def _mom(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        s_type = t["series_id"].type
        cols = ("n", "n_groups", "mom_sum", "mom_cnt", "total_sum")
        if t.num_rows == 0:
            return pa.table({"series_id": pa.array([], s_type),
                             **{c: pa.array([], pa.int64())
                                for c in cols}})
        t = t.take(pc.sort_indices(t, sort_keys=[
            ("series_id", "ascending"), ("bucket", "ascending")]))
        sid = t["series_id"]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = group_codes(sid)
        y = t["sum_y"].to_numpy(zero_copy_only=False).astype(np.int64)
        heads = np.ones(len(codes), dtype=bool)
        heads[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(heads)
        ends = np.r_[starts[1:], len(codes)]
        out = {k: [] for k in ("sid",) + cols}
        for f, l in zip(starts, ends):  # series loop; inner vector
            yy = y[f:l]
            n = l - f
            rk = np.arange(n)
            grp = rk * G // n
            ng = int(grp.max()) + 1
            sums = np.bincount(grp, weights=yy).astype(np.int64)
            cnts = np.bincount(grp).astype(np.int64)
            D = int(np.unique(cnts).prod())
            keys = sums * (D // cnts)
            order = np.lexsort((np.arange(ng), keys))
            med = order[(ng - 1) // 2]
            out["sid"].append(sid[int(f)].as_py())
            out["n"].append(n)
            out["n_groups"].append(ng)
            out["mom_sum"].append(int(sums[med]))
            out["mom_cnt"].append(int(cnts[med]))
            out["total_sum"].append(int(yy.sum()))
        return pa.table({"series_id": pa.array(out["sid"], s_type),
                         **{c: pa.array(out[c], pa.int64())
                            for c in cols}})

    return (rolled.map_batches(_add_part, batch_format="pyarrow")
            .repartition(2).groupby("__part")
            .map_groups(_mom, batch_format="pyarrow"))


MEDIAN_OF_MEANS_SQL = """
WITH r AS (
    SELECT event_type AS series_id,
           epoch_us(ts) // 900000000 * 900000000 AS bucket,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
    FROM events GROUP BY 1, 2
),
o AS (
    SELECT series_id, y,
           CAST(row_number() OVER (PARTITION BY series_id
                                   ORDER BY bucket) - 1 AS BIGINT)
               AS rk,
           CAST(count(*) OVER (PARTITION BY series_id) AS BIGINT) AS n
    FROM r
),
grps AS (
    SELECT series_id, n, rk * 10 // n AS grp,
           CAST(sum(y) AS BIGINT) AS gsum,
           CAST(count(*) AS BIGINT) AS gcnt
    FROM o GROUP BY 1, 2, 3
),
dd AS (
    -- product of the (<=2) distinct group sizes: striping makes sizes
    -- take at most two values, so max*min covers it (just max if equal)
    SELECT series_id,
           CAST(max(cnt) * min(cnt)
                // CASE WHEN max(cnt) = min(cnt) THEN max(cnt)
                        ELSE 1 END AS BIGINT) AS d
    FROM (SELECT DISTINCT series_id, gcnt AS cnt FROM grps)
    GROUP BY 1
),
keyed AS (
    SELECT g.series_id, g.n, g.grp, g.gsum, g.gcnt,
           g.gsum * (dd.d // g.gcnt) AS k,
           count(*) OVER (PARTITION BY g.series_id) AS ng
    FROM grps g JOIN dd ON dd.series_id = g.series_id
)
SELECT series_id, n, CAST(ng AS BIGINT) AS n_groups,
       CAST(gsum AS BIGINT) AS mom_sum,
       CAST(gcnt AS BIGINT) AS mom_cnt,
       (SELECT CAST(sum(y) AS BIGINT) FROM o
        WHERE o.series_id = keyed.series_id) AS total_sum
FROM (
    SELECT keyed.*, row_number() OVER (PARTITION BY series_id
                                       ORDER BY k, grp) AS rnk
    FROM keyed
) keyed
WHERE rnk = (ng - 1) // 2 + 1
"""


def q_discord_1h(sf_dir: str):
    """Time-series discord discovery (matrix-profile-lite): per series
    over the 1h tier, the length-6 window whose exact integer squared
    Euclidean distance to its NEAREST non-overlapping neighbor
    (exclusion zone |i−j| >= w) is LARGEST — the classic anomaly
    primitive. Engine: one integer Gram matmul per series
    (``D² = S_i + S_j − 2·A·Aᵀ``, windows as rows), exclusion-zone
    mask, row-min then argmax with smallest-index ties; tier rows keep
    the quadratic profile partition-local. Output per series:
    discord position (bucket), its nearest-neighbor D² and the window
    count."""
    from ...arrow_utils import stable_part_codes
    from ...stages.rollup import rollup

    W = 6
    H = 3_600_000_000
    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    rolled = rollup(ev.map_batches(_series, batch_format="pyarrow"), H)
    mod = 2 * 64

    _add_part = make_add_part("series_id", mod)

    def _discord(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        s_type = t["series_id"].type
        cols = ("n_windows", "discord_bucket", "nn_d2")
        if t.num_rows == 0:
            return pa.table({"series_id": pa.array([], s_type),
                             **{c: pa.array([], pa.int64())
                                for c in cols}})
        t = t.take(pc.sort_indices(t, sort_keys=[
            ("series_id", "ascending"), ("bucket", "ascending")]))
        sid = t["series_id"]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = group_codes(sid)
        y = t["sum_y"].to_numpy(zero_copy_only=False).astype(np.int64)
        bkt = t["bucket"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        heads = np.ones(len(codes), dtype=bool)
        heads[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(heads)
        ends = np.r_[starts[1:], len(codes)]
        out = {k: [] for k in ("sid",) + cols}
        BIG = np.int64(1 << 62)
        for f, l in zip(starts, ends):  # series loop; inner matmul
            yy = y[f:l]
            n = l - f
            m = n - W + 1
            if m < 2:
                continue
            A = np.lib.stride_tricks.sliding_window_view(yy, W)
            A = np.ascontiguousarray(A)
            S = (A * A).sum(axis=1)
            D2 = S[:, None] + S[None, :] - 2 * (A @ A.T)
            ii = np.arange(m)
            mask = np.abs(ii[:, None] - ii[None, :]) < W
            D2 = np.where(mask, BIG, D2)
            nn = D2.min(axis=1)
            valid = nn < BIG
            if not valid.any():
                continue
            nn_v = np.where(valid, nn, -1)
            best = int(np.argmax(nn_v))  # first max = smallest index
            out["sid"].append(sid[int(f)].as_py())
            out["n_windows"].append(m)
            out["discord_bucket"].append(int(bkt[f + best]))
            out["nn_d2"].append(int(nn[best]))
        return pa.table({"series_id": pa.array(out["sid"], s_type),
                         **{c: pa.array(out[c], pa.int64())
                            for c in cols}})

    return (rolled.map_batches(_add_part, batch_format="pyarrow")
            .repartition(2).groupby("__part")
            .map_groups(_discord, batch_format="pyarrow"))


DISCORD_SQL = """
WITH r AS (
    SELECT event_type AS series_id,
           epoch_us(ts) // 3600000000 * 3600000000 AS bucket,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
    FROM events GROUP BY 1, 2
),
o AS (
    SELECT series_id, bucket, y,
           CAST(row_number() OVER win AS BIGINT) AS rk,
           list(y) OVER (PARTITION BY series_id ORDER BY bucket
                         ROWS BETWEEN CURRENT ROW AND 5 FOLLOWING)
               AS v,
           count(*) OVER (PARTITION BY series_id ORDER BY bucket
                          ROWS BETWEEN CURRENT ROW AND 5 FOLLOWING)
               AS wlen
    FROM r
    WINDOW win AS (PARTITION BY series_id ORDER BY bucket)
),
wv AS (SELECT series_id, bucket, rk, v FROM o WHERE wlen = 6),
d AS (
    SELECT a.series_id, a.rk AS i, a.bucket,
           min(CAST(list_dot_product(a.v, a.v)
                    + list_dot_product(b.v, b.v)
                    - 2 * list_dot_product(a.v, b.v) AS BIGINT))
               AS nn_d2
    FROM wv a JOIN wv b
      ON a.series_id = b.series_id AND abs(a.rk - b.rk) >= 6
    GROUP BY 1, 2, 3
),
m AS (SELECT series_id, CAST(count(*) AS BIGINT) AS n_windows
      FROM wv GROUP BY 1)
SELECT d.series_id, m.n_windows,
       CAST(d.bucket AS BIGINT) AS discord_bucket, d.nn_d2
FROM (
    SELECT d.*, row_number() OVER (PARTITION BY series_id
                                   ORDER BY nn_d2 DESC, i) AS rnk
    FROM d
) d JOIN m ON m.series_id = d.series_id
WHERE d.rnk = 1
"""


def q_motif_1h(sf_dir: str):
    """Top motif (the discord's complement): per series the PAIR of
    non-overlapping length-6 windows with the smallest exact integer
    squared distance — the repeated-pattern primitive (numeric sibling
    of the SAX trigram motifs). Same per-series integer Gram machinery
    as ``discord_1h``; ties resolve by (d2, i, j). Output:
    (series_id, bucket_a, bucket_b, d2)."""
    from ...arrow_utils import stable_part_codes
    from ...stages.rollup import rollup

    W = 6
    H = 3_600_000_000
    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    rolled = rollup(ev.map_batches(_series, batch_format="pyarrow"), H)
    mod = 2 * 64

    _add_part = make_add_part("series_id", mod)

    def _motif(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        s_type = t["series_id"].type
        cols = ("bucket_a", "bucket_b", "d2")
        if t.num_rows == 0:
            return pa.table({"series_id": pa.array([], s_type),
                             **{c: pa.array([], pa.int64())
                                for c in cols}})
        t = t.take(pc.sort_indices(t, sort_keys=[
            ("series_id", "ascending"), ("bucket", "ascending")]))
        sid = t["series_id"]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = group_codes(sid)
        y = t["sum_y"].to_numpy(zero_copy_only=False).astype(np.int64)
        bkt = t["bucket"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        heads = np.ones(len(codes), dtype=bool)
        heads[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(heads)
        ends = np.r_[starts[1:], len(codes)]
        out = {k: [] for k in ("sid",) + cols}
        BIG = np.int64(1 << 62)
        for f, l in zip(starts, ends):
            yy = y[f:l]
            n = l - f
            m = n - W + 1
            if m < 2:
                continue
            A = np.ascontiguousarray(
                np.lib.stride_tricks.sliding_window_view(yy, W))
            S = (A * A).sum(axis=1)
            D2 = S[:, None] + S[None, :] - 2 * (A @ A.T)
            ii = np.arange(m)
            bad = (ii[:, None] >= ii[None, :] - W + 1)
            # keep only j - i >= W (i < j, non-overlapping, each pair once)
            D2 = np.where(bad, BIG, D2)
            if D2.min() >= BIG:
                continue
            flat = int(np.argmin(D2))  # first min = smallest (i, j)
            i, j = divmod(flat, m)
            out["sid"].append(sid[int(f)].as_py())
            out["bucket_a"].append(int(bkt[f + i]))
            out["bucket_b"].append(int(bkt[f + j]))
            out["d2"].append(int(D2[i, j]))
        return pa.table({"series_id": pa.array(out["sid"], s_type),
                         **{c: pa.array(out[c], pa.int64())
                            for c in cols}})

    return (rolled.map_batches(_add_part, batch_format="pyarrow")
            .repartition(2).groupby("__part")
            .map_groups(_motif, batch_format="pyarrow"))


MOTIF_SQL = """
WITH r AS (
    SELECT event_type AS series_id,
           epoch_us(ts) // 3600000000 * 3600000000 AS bucket,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
    FROM events GROUP BY 1, 2
),
o AS (
    SELECT series_id, bucket, y,
           CAST(row_number() OVER win AS BIGINT) AS rk,
           list(y) OVER (PARTITION BY series_id ORDER BY bucket
                         ROWS BETWEEN CURRENT ROW AND 5 FOLLOWING)
               AS v,
           count(*) OVER (PARTITION BY series_id ORDER BY bucket
                          ROWS BETWEEN CURRENT ROW AND 5 FOLLOWING)
               AS wlen
    FROM r
    WINDOW win AS (PARTITION BY series_id ORDER BY bucket)
),
wv AS (SELECT series_id, bucket, rk, v FROM o WHERE wlen = 6),
d AS (
    SELECT a.series_id, a.rk AS i, b.rk AS j,
           a.bucket AS bucket_a, b.bucket AS bucket_b,
           CAST(list_dot_product(a.v, a.v) + list_dot_product(b.v, b.v)
                - 2 * list_dot_product(a.v, b.v) AS BIGINT) AS d2
    FROM wv a JOIN wv b
      ON a.series_id = b.series_id AND b.rk - a.rk >= 6
)
SELECT series_id, CAST(bucket_a AS BIGINT) AS bucket_a,
       CAST(bucket_b AS BIGINT) AS bucket_b, d2
FROM (
    SELECT d.*, row_number() OVER (PARTITION BY series_id
                                   ORDER BY d2, i, j) AS rnk
    FROM d
) WHERE rnk = 1
"""


def q_label_propagation_docs(sf_dir: str):
    """One synchronous round of label propagation (the semi-supervised
    graph-ML baseline): every node's predicted label is the MAJORITY of
    its neighbors' seed labels (embeddings.label keyed by
    vec_id = doc_id), ties to the smallest label — deterministic by
    construction. Shape: undirected edges fan both directions, seed
    labels ride a broadcast closure (dimension contract), per-(node,
    label) vote partials reduce through one hashpart grouped sum, and
    the per-node argmax is a sorted segment pass. Output:
    (node, pred_label, n_votes, n_neighbors)."""
    import pyarrow.parquet as _pq

    from ...arrow_utils import stable_part_codes

    n = _pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    lab_rows = _read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                                   columns=["vec_id", "label"]
                                   ).take_all()
    lab = {int(r["vec_id"]): int(r["label"]) for r in lab_rows}

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id"]).repartition(4)

    mod = 4 * 64

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

    def _part_e(b: pa.Table) -> pa.Table:
        h = stable_part_codes(b["u"], None)
        return b.append_column(
            "__part", pa.array((h % np.uint64(mod)).astype(np.int32)))

    def _votes(g: pa.Table) -> pa.Table:
        # hash(u) co-locates every copy of an edge -> exact distinct,
        # then votes fan both directions with broadcast seed labels
        t = g.drop_columns(["__part"])
        if t.num_rows == 0:
            return pa.table({"node": pa.array([], pa.int64()),
                             "vote": pa.array([], pa.int64()),
                             "one": pa.array([], pa.int64())})
        u = t["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = np.unique(u * np.int64(2 ** 32) + v)
        u, v = key // np.int64(2 ** 32), key % np.int64(2 ** 32)
        node = np.concatenate([u, v])
        nb = np.concatenate([v, u])
        votes = np.array([lab[int(x)] for x in nb], dtype=np.int64)
        return pa.table({"node": pa.array(node),
                         "vote": pa.array(votes),
                         "one": pa.array(np.ones(len(node),
                                                 dtype=np.int64))})

    _add_part = make_add_part("node", mod)

    def _majority(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        if t.num_rows == 0:
            return pa.table({"node": pa.array([], pa.int64()),
                             "pred_label": pa.array([], pa.int64()),
                             "n_votes": pa.array([], pa.int64()),
                             "n_neighbors": pa.array([], pa.int64())})
        s = t.group_by(["node", "vote"]).aggregate([("one", "sum")])
        node = s["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        vote = s["vote"].to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = s["one_sum"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        order = np.lexsort((vote, -cnt, node))
        node, vote, cnt = node[order], vote[order], cnt[order]
        heads = np.ones(len(node), dtype=bool)
        heads[1:] = node[1:] != node[:-1]
        starts = np.flatnonzero(heads)
        tot = np.add.reduceat(cnt, starts)
        return pa.table({"node": pa.array(node[starts]),
                         "pred_label": pa.array(vote[starts]),
                         "n_votes": pa.array(cnt[starts]),
                         "n_neighbors": pa.array(tot)})

    return (ds.map_batches(_edges, batch_format="pyarrow")
            .map_batches(_part_e, batch_format="pyarrow")
            .repartition(4).groupby("__part")
            .map_groups(_votes, batch_format="pyarrow")
            .map_batches(_add_part, batch_format="pyarrow")
            .repartition(4).groupby("__part")
            .map_groups(_majority, batch_format="pyarrow"))


LABEL_PROP_SQL = """
WITH nn AS (SELECT count(*) AS c FROM documents),
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
    SELECT u AS node, v AS nb FROM und
    UNION ALL
    SELECT v, u FROM und
),
votes AS (
    SELECT ed.node, CAST(l.label AS BIGINT) AS vote,
           CAST(count(*) AS BIGINT) AS cnt
    FROM ed JOIN embeddings l ON l.vec_id = ed.nb
    GROUP BY 1, 2
),
tot AS (SELECT node, CAST(sum(cnt) AS BIGINT) AS n_neighbors
        FROM votes GROUP BY 1)
SELECT v.node, v.vote AS pred_label, v.cnt AS n_votes,
       tot.n_neighbors
FROM (
    SELECT votes.*, row_number() OVER (PARTITION BY node
                                       ORDER BY cnt DESC, vote) AS rk
    FROM votes
) v JOIN tot ON tot.node = v.node
WHERE v.rk = 1
"""


def q_burstiness_events(sf_dir: str):
    """Burstiness / Fano factor per series (the overdispersion index:
    variance-to-mean of 1h event COUNTS over observed buckets; > 1 =
    bursty, 1 = Poisson-like): kept as the exact gcd-reduced rational
    ``(n·Σc² − (Σc)²) / (n·Σc)``. Map-side (series, bucket) count
    partials, one hashpart grouped sum, tiny per-series reduction."""
    from ...arrow_utils import stable_part_codes

    H = 3_600_000_000
    ev = _events_series(sf_dir, cols=("event_id", "event_type", "ts"))

    def _counts(b: pa.Table) -> pa.Table:
        bkt = (b["ts_us"].to_numpy(zero_copy_only=False).astype(
            np.int64) // H)
        t = pa.table({"series_id": b["event_type"],
                      "bucket": pa.array(bkt),
                      "one": pa.array(np.ones(b.num_rows,
                                              dtype=np.int64))})
        g = t.group_by(["series_id", "bucket"]).aggregate(
            [("one", "sum")])
        return g.rename_columns(["series_id", "bucket", "c"])

    mod = 2 * 64

    _add_part = make_add_part("series_id", mod)

    def _fano(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        s_type = t["series_id"].type
        cols = ("n_buckets", "n_events", "fano_num", "fano_den")
        if t.num_rows == 0:
            return pa.table({"series_id": pa.array([], s_type),
                             **{c: pa.array([], pa.int64())
                                for c in cols}})
        s = t.group_by(["series_id", "bucket"]).aggregate([("c", "sum")])
        sid = s["series_id"]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = group_codes(sid)
        c = s["c_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(codes, kind="stable")
        codes, c = codes[order], c[order]
        sidx = sid.take(pa.array(order))
        heads = np.ones(len(codes), dtype=bool)
        heads[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(heads)
        n = np.diff(np.append(starts, len(codes)))
        sc = np.add.reduceat(c, starts)
        sc2 = np.add.reduceat(c * c, starts)
        num = n * sc2 - sc * sc
        den = n * sc
        g_ = np.gcd(num, den)
        g_ = np.where(g_ == 0, 1, g_)
        return pa.table({
            "series_id": sidx.take(pa.array(starts)),
            "n_buckets": pa.array(n),
            "n_events": pa.array(sc),
            "fano_num": pa.array(num // g_),
            "fano_den": pa.array(den // g_)})

    return (ev.map_batches(_counts, batch_format="pyarrow")
            .map_batches(_add_part, batch_format="pyarrow")
            .repartition(2).groupby("__part")
            .map_groups(_fano, batch_format="pyarrow"))


BURSTINESS_SQL = """
WITH c AS (
    SELECT event_type AS series_id, epoch_us(ts) // 3600000000 AS b,
           CAST(count(*) AS BIGINT) AS c
    FROM events GROUP BY 1, 2
),
a AS (
    SELECT series_id, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(c) AS BIGINT) AS sc,
           CAST(sum(c * c) AS BIGINT) AS sc2
    FROM c GROUP BY 1
)
SELECT series_id, n AS n_buckets, sc AS n_events,
       CAST((n * sc2 - sc * sc)
            // greatest(gcd(n * sc2 - sc * sc, n * sc), 1) AS BIGINT)
           AS fano_num,
       CAST((n * sc)
            // greatest(gcd(n * sc2 - sc * sc, n * sc), 1) AS BIGINT)
           AS fano_den
FROM a
"""


def q_sweepline_audit_events(sf_dir: str):
    """Sweep-line / Little's-law style conservation audit: each series'
    30-minute activity islands (the ``interval_union_events`` merge)
    are measured TWO independent ways — (a) per-series island-length
    sums, (b) the global sweep-line integral ``∫ concurrency(t) dt``
    over all series' island endpoints — and by Fubini the totals must
    agree EXACTLY (int64 microseconds). Emits both sides, the equality
    flag and the peak concurrency; the kind of cross-computation
    invariant a 100 TB pipeline runs to catch partition-merge bugs.
    Islands reduce per series (one hash shuffle); endpoints are
    islands-count-bounded (<< events), so the sweep is a tiny ordered
    pass."""
    from ...arrow_utils import stable_part_codes

    W = 1_800_000_000
    ev = _events_series(sf_dir, cols=("event_id", "event_type", "ts"))
    mod = 2 * 64

    _add_part = make_add_part("event_type", mod)

    def _islands(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        if t.num_rows == 0:
            return pa.table({"lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64())})
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
        los, his = [], []
        for f, l in zip(starts, ends_seg):
            s_ = ts[f:l]
            e_ = s_ + W
            cm = np.maximum.accumulate(e_)
            new = np.ones(l - f, dtype=bool)
            new[1:] = s_[1:] > cm[:-1]
            isl = np.flatnonzero(new)
            isl_end = np.r_[isl[1:], l - f]
            los.append(s_[isl])
            his.append(cm[isl_end - 1])
        return pa.table({"lo": pa.array(np.concatenate(los)),
                         "hi": pa.array(np.concatenate(his))})

    rows = (ev.map_batches(_add_part, batch_format="pyarrow")
            .repartition(2).groupby("__part")
            .map_groups(_islands, batch_format="pyarrow")).take_all()
    lo = np.array([r["lo"] for r in rows], dtype=np.int64)
    hi = np.array([r["hi"] for r in rows], dtype=np.int64)
    covered = int((hi - lo).sum())

    pts = np.concatenate([lo, hi])
    delta = np.concatenate([np.ones(len(lo), np.int64),
                            -np.ones(len(hi), np.int64)])
    order = np.lexsort((-delta, pts))  # opens before closes at ties
    pts, delta = pts[order], delta[order]
    level = np.cumsum(delta)
    dt = np.diff(pts)
    integral = int((level[:-1] * dt).sum())
    return pa.table({
        "covered_sum_us": pa.array([covered], pa.int64()),
        "sweep_integral_us": pa.array([integral], pa.int64()),
        "conserved": pa.array([int(covered == integral)], pa.int64()),
        "max_concurrency": pa.array([int(level.max())], pa.int64()),
        "n_islands": pa.array([len(lo)], pa.int64())})


SWEEPLINE_SQL = """
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
pts AS (
    SELECT lo AS t, 1 AS d FROM isl
    UNION ALL
    SELECT hi, -1 FROM isl
),
sw AS (
    SELECT t, d,
           sum(d) OVER (ORDER BY t, d DESC
                        ROWS UNBOUNDED PRECEDING) AS level,
           lead(t) OVER (ORDER BY t, d DESC) AS nxt
    FROM pts
)
SELECT
    (SELECT CAST(sum(hi - lo) AS BIGINT) FROM isl) AS covered_sum_us,
    CAST(sum(level * (nxt - t)) AS BIGINT) AS sweep_integral_us,
    CAST(CASE WHEN (SELECT sum(hi - lo) FROM isl)
               = sum(level * (nxt - t)) THEN 1 ELSE 0 END AS BIGINT)
        AS conserved,
    CAST(max(level) AS BIGINT) AS max_concurrency,
    (SELECT CAST(count(*) AS BIGINT) FROM isl) AS n_islands
FROM sw WHERE nxt IS NOT NULL
"""


