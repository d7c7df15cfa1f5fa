"""LTTB fidelity audit, association rules, attribution, AMOC, search, RFM, KS/Welch tests, tier consistency, OHLC, LTV.

Split from the former pipelines/queries.py monolith (r4 verdict
next-round #5); statement order inside this module is the original
file order. Explicit cross-module imports are generated: backward
dependencies at the top, forward (function-body-only) dependencies at
the bottom so package import order stays acyclic.
"""
from __future__ import annotations

from ._shared import (
    US,
    W1H,
    _events_s_cte,
    _lttb_phase2_sql,
    _read_parquet_clean,
    downsample_table,
    np,
    pa,
    pc,
)
from .downsample_core import _events_cents
from .graph_link import _graph_targets
from .ext_stats_embed import q_sax_events
from ...arrow_utils import group_codes, make_add_part

def q_lttb_fidelity_events(sf_dir: str):
    """Downsample QUALITY audit — the fidelity report a charting /
    retention pipeline runs before trusting a tier's LTTB selection:
    per series, the exact integer reconstruction error of the n_out=50
    LTTB selection (linear interpolation between selected positions,
    e6 fixed-point with truncating division; selected points score 0).
    Same per-series groupby shape as the kernel queries; the fidelity
    pass is one vectorized ``searchsorted`` bracket + interp per group.
    Output: (event_type, n_pts, n_sel, sum_err_e6, max_err_e6)."""
    ds = _events_cents(sf_dir)

    def _fid(tbl: pa.Table) -> pa.Table:
        idx = pc.sort_indices(tbl, sort_keys=[
            ("ts_us", "ascending"), ("event_id", "ascending")])
        tbl = tbl.take(idx)
        y = tbl["cents"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(y)
        out = downsample_table(tbl, "lttb", 50, x_col=None,
                               y_col="cents", presorted=True)
        eid = tbl["event_id"].to_numpy(zero_copy_only=False)
        sel = np.isin(eid, out["event_id"].to_numpy(
            zero_copy_only=False))
        pos = np.flatnonzero(sel)
        p = np.arange(n, dtype=np.int64)
        j = np.searchsorted(pos, p, side="right") - 1
        p0 = pos[np.clip(j, 0, len(pos) - 1)]
        p1 = pos[np.clip(j + 1, 0, len(pos) - 1)]
        interior = ~sel
        gap = np.where(interior, p1 - p0, 1)
        num = y[p0] * (p1 - p) + y[p1] * (p - p0)
        yhat = (num * 1_000_000) // gap  # all-positive: trunc == //
        err = np.where(interior, np.abs(y * 1_000_000 - yhat), 0)
        return pa.table({
            "event_type": tbl["event_type"].slice(0, 1),
            "n_pts": pa.array([n], pa.int64()),
            "n_sel": pa.array([int(sel.sum())], pa.int64()),
            "sum_err_e6": pa.array([int(err.sum())], pa.int64()),
            "max_err_e6": pa.array([int(err.max()) if n else 0],
                                   pa.int64()),
        })

    return ds.groupby("event_type").map_groups(_fid,
                                               batch_format="pyarrow")


def _lttb_fidelity_sql(n_out: int) -> str:
    return f"""
WITH RECURSIVE {_events_s_cte(None)},
sp AS MATERIALIZED (SELECT event_type, rn AS p, rn AS x, cy, cnt AS m2
                    FROM s),
{_lttb_phase2_sql(n_out, "sp")},
picked AS (
    SELECT DISTINCT event_type, rn FROM (
        SELECT event_type, a AS rn FROM rec
        UNION ALL SELECT event_type, m2 - 1 FROM meta
    )
),
o AS (
    SELECT s.event_type, s.rn, s.cy,
           CASE WHEN p.rn IS NOT NULL THEN 1 ELSE 0 END AS is_sel
    FROM s LEFT JOIN picked p
      ON p.event_type = s.event_type AND p.rn = s.rn
),
w AS (
    SELECT event_type, rn, cy, is_sel,
           last_value(CASE WHEN is_sel = 1 THEN rn END IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY rn
                     ROWS UNBOUNDED PRECEDING) AS p0,
           last_value(CASE WHEN is_sel = 1 THEN cy END IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY rn
                     ROWS UNBOUNDED PRECEDING) AS y0,
           first_value(CASE WHEN is_sel = 1 THEN rn END IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY rn
                     ROWS BETWEEN CURRENT ROW
                              AND UNBOUNDED FOLLOWING) AS p1,
           first_value(CASE WHEN is_sel = 1 THEN cy END IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY rn
                     ROWS BETWEEN CURRENT ROW
                              AND UNBOUNDED FOLLOWING) AS y1
    FROM o
),
e AS (
    SELECT event_type, is_sel,
           CASE WHEN is_sel = 1 THEN 0
                ELSE abs(cy * 1000000
                         - (y0 * (p1 - rn) + y1 * (rn - p0)) * 1000000
                           // (p1 - p0)) END AS err
    FROM w
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_pts,
       CAST(sum(is_sel) AS BIGINT) AS n_sel,
       CAST(sum(err) AS BIGINT) AS sum_err_e6,
       CAST(max(err) AS BIGINT) AS max_err_e6
FROM e GROUP BY 1
"""


def q_assoc_rules_events(sf_dir: str):
    """Market-basket association rules over user event-type baskets
    (``stages/baskets.py:association_rules``): support, integer permille
    confidence and exact-rational lift for every ordered type pair. One
    hash(user) shuffle collapsing to CONSTANT-size bitmask-histogram
    partials (2^|types| bins); all rule algebra runs on those bounded
    counts."""
    from ...stages.baskets import association_rules

    ds = _read_parquet_clean(f"{sf_dir}/events.parquet",
                             columns=["user_id", "event_type"])
    types = sorted(ds.map_batches(
        lambda b: pa.table({"t": pc.unique(b["event_type"])}),
        batch_format="pyarrow").to_pandas()["t"].unique())
    return association_rules(ds, list(types), num_partitions=4)


ASSOC_RULES_SQL = """
WITH b AS (SELECT DISTINCT user_id, event_type FROM events),
n AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n FROM events),
na AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_a
       FROM b GROUP BY 1),
pair AS (
    SELECT x.event_type AS antecedent, y.event_type AS consequent,
           CAST(count(*) AS BIGINT) AS n_ab
    FROM b x JOIN b y ON x.user_id = y.user_id
                     AND x.event_type <> y.event_type
    GROUP BY 1, 2
)
SELECT p.antecedent, p.consequent, n.n, a1.n_a, a2.n_a AS n_b, p.n_ab,
       CAST((1000 * p.n_ab) // a1.n_a AS BIGINT) AS conf_pm,
       CAST(n.n * p.n_ab AS BIGINT) AS lift_num,
       CAST(a1.n_a * a2.n_a AS BIGINT) AS lift_den,
       CAST(n.n * p.n_ab AS DOUBLE) / (a1.n_a * a2.n_a) AS lift
FROM pair p
JOIN na a1 ON a1.event_type = p.antecedent
JOIN na a2 ON a2.event_type = p.consequent
CROSS JOIN n
"""


def q_haar_energy_15m(sf_dir: str):
    """Integer Haar wavelet energy profile of the 15m tier
    (``stages/wavelet.py:haar_energy``): 3 lifting-scheme levels
    (``s=(a+b)//2``, ``d=a−b`` — exactly reversible), per level the
    detail count / Σ|d| / max|d| plus the final-approximation row. One
    hash(series) shuffle; each level a vectorized even/odd slice."""
    from ...stages.rollup import rollup
    from ...stages.wavelet import haar_energy

    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    rolled = rollup(ev.map_batches(_series, batch_format="pyarrow"),
                    900 * US)
    return haar_energy(rolled, levels=3, num_partitions=4)


def _haar_sql(levels: int = 3) -> str:
    ctes = [f"""r AS (
    SELECT event_type AS series_id,
           (epoch_us(ts) // {900 * US}) * {900 * US} AS bucket,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
    FROM events GROUP BY 1, 2
)""", """v0 AS (
    SELECT series_id,
           row_number() OVER (PARTITION BY series_id
                              ORDER BY bucket) - 1 AS rn, v
    FROM r
)"""]
    sels = []
    for l in range(1, levels + 1):
        ctes.append(f"""p{l} AS (
    SELECT series_id, rn // 2 AS rn,
           max(CASE WHEN rn % 2 = 0 THEN v END) AS a,
           max(CASE WHEN rn % 2 = 1 THEN v END) AS b,
           count(*) AS m
    FROM v{l - 1} GROUP BY 1, 2
)""")
        ctes.append(f"""v{l} AS (
    SELECT series_id, rn,
           CASE WHEN m = 2 THEN (a + b) // 2 ELSE a END AS v
    FROM p{l}
)""")
        sels.append(f"""SELECT series_id, CAST({l} AS BIGINT) AS level,
       CAST(count(*) FILTER (m = 2) AS BIGINT) AS n,
       CAST(COALESCE(sum(abs(a - b)) FILTER (m = 2), 0) AS BIGINT)
           AS sum_abs,
       CAST(COALESCE(max(abs(a - b)) FILTER (m = 2), 0) AS BIGINT)
           AS max_abs
FROM p{l} GROUP BY 1""")
    sels.append(f"""SELECT series_id, CAST(0 AS BIGINT) AS level,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(abs(v)) AS BIGINT) AS sum_abs,
       CAST(max(abs(v)) AS BIGINT) AS max_abs
FROM v{levels} GROUP BY 1""")
    return ("WITH " + ",\n".join(ctes) + "\n"
            + "\nUNION ALL\n".join(sels))


HAAR_ENERGY_SQL = _haar_sql(3)


def q_attribution_events(sf_dir: str):
    """Last-touch attribution
    (``stages/joins.py:last_touch_attribution``): each purchase credits
    the same user's most recent non-purchase event within 1h (equal-ts
    ties to the larger event id — the exact `max_by(type, struct(x,id))`
    semantic, deterministic where plain as-of is not); unmatched
    purchases count as 'none'. One hash(user) shuffle collapsing to
    type-vocabulary partials."""
    from ...stages.joins import last_touch_attribution

    ds = _read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"])

    def _prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b["user_id"],
            "ts_us": b["ts"].cast(pa.int64()),
            "event_id": b["event_id"],
            "event_type": b["event_type"],
        })

    return last_touch_attribution(
        ds.map_batches(_prep, batch_format="pyarrow"),
        target="purchase", window_us=3_600_000_000, num_partitions=4)


ATTRIBUTION_SQL = """
WITH p AS (
    SELECT user_id, epoch_us(ts) AS x, event_id
    FROM events WHERE event_type = 'purchase'
),
e AS (
    SELECT user_id, epoch_us(ts) AS x, event_id, event_type
    FROM events WHERE event_type <> 'purchase'
),
m AS (
    SELECT p.event_id AS pid,
           max(struct_pack(x := e.x, eid := e.event_id,
                           ty := e.event_type)) AS mx
    FROM p LEFT JOIN e
      ON e.user_id = p.user_id AND e.x <= p.x
     AND p.x - e.x <= 3600000000
    GROUP BY 1
)
SELECT COALESCE((mx).ty, 'none') AS event_type,
       CAST(count(*) AS BIGINT) AS n
FROM m GROUP BY 1
"""


def q_amoc_changepoint_15m(sf_dir: str):
    """At-Most-One-Change mean-shift detection per series over the 15m
    tier (``stages/rate.py:amoc_changepoint``): the split maximizing
    ``f(k) = S1²/k + S2²/(n−k)`` (exact int prefix sums; squares pinned
    in float64 with the identical SQL expression tree; ties to the
    smallest k) — the closed-form companion to ``cusum_events``."""
    from ...stages.rate import amoc_changepoint
    from ...stages.rollup import rollup

    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    rolled = rollup(ev.map_batches(_series, batch_format="pyarrow"),
                    900 * US)
    return amoc_changepoint(rolled, num_partitions=4)


AMOC_SQL = f"""
WITH r AS (
    SELECT event_type AS series_id,
           (epoch_us(ts) // {900 * US}) * {900 * US} AS bucket,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s
    FROM events GROUP BY 1, 2
),
o AS (
    SELECT series_id,
           row_number() OVER (PARTITION BY series_id
                              ORDER BY bucket) AS p,
           count(*) OVER (PARTITION BY series_id) AS n,
           sum(s) OVER (PARTITION BY series_id ORDER BY bucket
                        ROWS UNBOUNDED PRECEDING) AS s1,
           sum(s) OVER (PARTITION BY series_id) AS stot
    FROM r
),
f AS (
    SELECT series_id, p AS k, n, s1, stot - s1 AS s2,
           (CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) / p
           + (CAST(stot - s1 AS DOUBLE) * CAST(stot - s1 AS DOUBLE))
             / (n - p) AS f
    FROM o WHERE p < n
),
b AS (
    SELECT series_id, k, n, s1, s2, f,
           row_number() OVER (PARTITION BY series_id
                              ORDER BY f DESC, k) AS rn
    FROM f
)
SELECT series_id, CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
       CAST(s1 AS BIGINT) AS s1, CAST(s2 AS BIGINT) AS s2, f
FROM b WHERE rn = 1
"""


def q_boolean_search_docs(sf_dir: str):
    """Conjunctive (AND) boolean retrieval: docs containing ALL query
    terms — the postings-intersection primitive, here as a single
    shuffle-free ``map_batches`` pass (distinct matched-term count per
    doc == |query| via `index_in` + bitmask OR). Returns
    ``(doc_id, n_terms)`` with the doc's total term count as evidence."""
    terms = ["hash", "join", "merge"]
    tarr = pa.array(terms, pa.string())
    nt = len(terms)
    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"])

    def _and(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b["text"], pattern=" ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.values
        off = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        row = np.repeat(np.arange(b.num_rows, dtype=np.int64),
                        np.diff(off))
        tidx = pc.fill_null(pc.index_in(flat, value_set=tarr),
                            -1).to_numpy(zero_copy_only=False).astype(
            np.int64)
        known = tidx >= 0
        mask = np.zeros(b.num_rows, np.int64)
        np.bitwise_or.at(mask, row[known],
                         np.int64(1) << tidx[known])
        hit = mask == (1 << nt) - 1
        nonempty = ~pc.equal(flat, "").to_numpy(zero_copy_only=False)
        ntok = np.bincount(row[nonempty], minlength=b.num_rows)
        return pa.table({
            "doc_id": pc.cast(b["doc_id"], pa.int64()).filter(
                pa.array(hit)),
            "n_terms": pa.array(ntok[hit].astype(np.int64)),
        })

    return ds.map_batches(_and, batch_format="pyarrow")


BOOLEAN_SEARCH_SQL = """
WITH tok AS (
    SELECT doc_id, t.term
    FROM documents, unnest(string_split(text, ' ')) AS t(term)
    WHERE t.term <> ''
),
hit AS (
    SELECT doc_id
    FROM tok WHERE term IN ('hash', 'join', 'merge')
    GROUP BY 1 HAVING count(DISTINCT term) = 3
)
SELECT h.doc_id, CAST(count(*) AS BIGINT) AS n_terms
FROM hit h JOIN tok t ON t.doc_id = h.doc_id
GROUP BY 1
"""


def q_top_movers_events(sf_dir: str):
    """Day-over-day top movers: per series the per-day cent sums, the
    consecutive-PRESENT-day diff via one sorted lag pass, and the 5
    largest absolute moves (ties |diff| desc, series asc, day asc).
    Rollup partials → one hash(series) shuffle → bounded top-k funnel."""
    from ...stages.rollup import rollup

    DAY = 86_400_000_000
    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    rolled = rollup(ev.map_batches(_series, batch_format="pyarrow"), DAY)
    from ...arrow_utils import stable_part_codes

    def _add_part(b: pa.Table) -> pa.Table:
        h = stable_part_codes(b["series_id"], None)
        return b.append_column(
            "__part", pa.array((h % np.uint64(128)).astype(np.int32)))

    def _diff(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        sid_type = t["series_id"].type
        empty = pa.table({"series_id": pa.array([], sid_type),
                          "day_us": pa.array([], pa.int64()),
                          "prev_sum": pa.array([], pa.int64()),
                          "cur_sum": pa.array([], pa.int64()),
                          "diff": pa.array([], pa.int64()),
                          "absdiff": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        t = t.take(pc.sort_indices(t, sort_keys=[
            ("series_id", "ascending"), ("bucket", "ascending")]))
        sid = t["series_id"]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = group_codes(sid)
        y = t["sum_y"].to_numpy(zero_copy_only=False).astype(np.int64)
        bk = t["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
        same = codes[1:] == codes[:-1] if len(codes) > 1 else \
            np.empty(0, bool)
        idx = np.flatnonzero(same) + 1
        d = y[idx] - y[idx - 1]
        return pa.table({"series_id": sid.take(pa.array(idx)),
                         "day_us": pa.array(bk[idx]),
                         "prev_sum": pa.array(y[idx - 1]),
                         "cur_sum": pa.array(y[idx]),
                         "diff": pa.array(d),
                         "absdiff": pa.array(np.abs(d))})

    diffs = (rolled.map_batches(_add_part, batch_format="pyarrow")
             .repartition(2).groupby("__part")
             .map_groups(_diff, batch_format="pyarrow"))
    top = (diffs.sort(key=["absdiff", "series_id", "day_us"],
                      descending=[True, False, False]).limit(5)
           .to_pandas())
    top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
    return top.drop(columns=["absdiff"])


TOP_MOVERS_SQL = f"""
WITH r AS (
    SELECT event_type AS series_id,
           (epoch_us(ts) // {86_400_000_000}) * {86_400_000_000}
               AS day_us,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s
    FROM events GROUP BY 1, 2
),
d AS (
    SELECT series_id, day_us,
           lag(s) OVER (PARTITION BY series_id ORDER BY day_us)
               AS prev_sum,
           s AS cur_sum
    FROM r
),
f AS (
    SELECT series_id, day_us, prev_sum, cur_sum,
           cur_sum - prev_sum AS diff,
           row_number() OVER (ORDER BY abs(cur_sum - prev_sum) DESC,
                              series_id, day_us) AS rank
    FROM d WHERE prev_sum IS NOT NULL
)
SELECT series_id, day_us, prev_sum, cur_sum, diff, rank
FROM f WHERE rank <= 5
"""


def q_rfm_segments_users(sf_dir: str):
    """RFM customer segmentation over purchase events: per user the
    recency (last purchase ts), frequency (count) and monetary (cent
    sum) aggregates, quintile-scored by VALUE against exact discrete
    20/40/60/80 order statistics (the ``exact_quantiles`` machinery,
    all three dimensions as three series in ONE pass) — value-based
    buckets are tie-deterministic without any global rank sort. Output
    ``(user_id, last_ts, cnt, sum_cents, r, f, m, rfm)``."""
    from ...stages.graph import grouped_sum_parts
    from ...stages.quantiles import exact_quantiles

    ds = _read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_type", "value"])

    def _pur(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b["event_type"], "purchase"))
        return pa.table({
            "user_id": pc.cast(t["user_id"], pa.int64()),
            "neg_ts": pc.multiply(pc.cast(t["ts"].cast(pa.int64()),
                                          pa.int64()),
                                  pa.scalar(-1, pa.int64())),
            "cents": pc.cast(pc.round(pc.multiply(t["value"], 100.0),
                                      ndigits=0), pa.int64()),
        })

    # max(ts) == -min(-ts): min is a SUM-like... not mergeable by sum —
    # use the grouped min trick via Arrow group_by inside a hashpart pass
    pur = ds.map_batches(_pur, batch_format="pyarrow")
    from ...arrow_utils import rename_agg, stable_part_codes

    def _agg(b: pa.Table) -> pa.Table:
        b = b.select([c for c in b.column_names if c != "__part"])
        g = b.group_by(["user_id"]).aggregate(
            [("neg_ts", "min"), ("cents", "sum"), ("cents", "count")])
        return rename_agg(g, {"user_id": "user_id",
                              "neg_ts_min": "neg_ts",
                              "cents_sum": "sum_cents",
                              "cents_count": "cnt"})

    def _agg2(g: pa.Table) -> pa.Table:
        t = g.select([c for c in g.column_names if c != "__part"])
        m = t.group_by(["user_id"]).aggregate(
            [("neg_ts", "min"), ("sum_cents", "sum"), ("cnt", "sum")])
        return rename_agg(m, {"user_id": "user_id",
                              "neg_ts_min": "neg_ts",
                              "sum_cents_sum": "sum_cents",
                              "cnt_sum": "cnt"})

    def _part(b: pa.Table) -> pa.Table:
        b = _agg(b)
        h = stable_part_codes(b["user_id"], None)
        return b.append_column(
            "__part", pa.array((h % np.uint64(256)).astype(np.int32)))

    pu = (pur.map_batches(_part, batch_format="pyarrow")
          .repartition(4).groupby("__part")
          .map_groups(_agg2, batch_format="pyarrow")).materialize()

    def _dims(b: pa.Table) -> pa.Table:
        uid = b["user_id"]
        last_ts = pc.multiply(b["neg_ts"], pa.scalar(-1, pa.int64()))
        parts = []
        for name, col in (("r", last_ts), ("f", b["cnt"]),
                          ("m", b["sum_cents"])):
            parts.append(pa.table({
                "series_id": pa.array([name] * b.num_rows),
                "bucket": pc.cast(uid, pa.int64()),
                "sum_y": pc.cast(col, pa.int64())}))
        return pa.concat_tables(parts)

    th = exact_quantiles(pu.map_batches(_dims, batch_format="pyarrow"),
                         probs=(20, 40, 60, 80), num_partitions=2
                         ).to_pandas().set_index("series_id")
    T = {d: [int(th.loc[d][f"p{p}"]) for p in (20, 40, 60, 80)]
         for d in ("r", "f", "m")}

    def _score(b: pa.Table) -> pa.Table:
        last_ts = pc.multiply(b["neg_ts"],
                              pa.scalar(-1, pa.int64())).to_numpy(
            zero_copy_only=False)
        cnt = b["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = b["sum_cents"].to_numpy(zero_copy_only=False).astype(
            np.int64)

        def quint(v, d):
            s = np.ones(len(v), np.int64)
            for t in T[d]:
                s += (v > t)
            return s

        r = quint(last_ts, "r")
        f = quint(cnt, "f")
        m = quint(cents, "m")
        return pa.table({
            "user_id": b["user_id"],
            "last_ts": pa.array(last_ts.astype(np.int64)),
            "cnt": pa.array(cnt), "sum_cents": pa.array(cents),
            "r": pa.array(r), "f": pa.array(f), "m": pa.array(m),
            "rfm": pa.array(100 * r + 10 * f + m)})

    return pu.map_batches(_score, batch_format="pyarrow")


RFM_SQL = """
WITH pu AS (
    SELECT user_id, max(epoch_us(ts)) AS last_ts,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS sum_cents
    FROM events WHERE event_type = 'purchase' GROUP BY 1
),
dims AS (
    SELECT 'r' AS d, last_ts AS v, user_id FROM pu
    UNION ALL SELECT 'f', cnt, user_id FROM pu
    UNION ALL SELECT 'm', sum_cents, user_id FROM pu
),
o AS (
    SELECT d, v,
           row_number() OVER (PARTITION BY d ORDER BY v, user_id) - 1
               AS rk,
           count(*) OVER (PARTITION BY d) AS n
    FROM dims
),
t AS (
    SELECT d,
           max(CASE WHEN rk = (n - 1) * 20 // 100 THEN v END) AS t20,
           max(CASE WHEN rk = (n - 1) * 40 // 100 THEN v END) AS t40,
           max(CASE WHEN rk = (n - 1) * 60 // 100 THEN v END) AS t60,
           max(CASE WHEN rk = (n - 1) * 80 // 100 THEN v END) AS t80
    FROM o GROUP BY 1
),
s AS (
    SELECT pu.*,
           CAST(1 + (pu.last_ts > tr.t20)::INT + (pu.last_ts > tr.t40)::INT
                + (pu.last_ts > tr.t60)::INT + (pu.last_ts > tr.t80)::INT
                AS BIGINT) AS r,
           CAST(1 + (pu.cnt > tf.t20)::INT + (pu.cnt > tf.t40)::INT
                + (pu.cnt > tf.t60)::INT + (pu.cnt > tf.t80)::INT
                AS BIGINT) AS f,
           CAST(1 + (pu.sum_cents > tm.t20)::INT
                + (pu.sum_cents > tm.t40)::INT
                + (pu.sum_cents > tm.t60)::INT
                + (pu.sum_cents > tm.t80)::INT AS BIGINT) AS m
    FROM pu, t tr, t tf, t tm
    WHERE tr.d = 'r' AND tf.d = 'f' AND tm.d = 'm'
)
SELECT user_id, last_ts, cnt, sum_cents, r, f, m,
       100 * r + 10 * f + m AS rfm
FROM s
"""


def q_bigram_familiarity_docs(sf_dir: str):
    """Corpus-fit quality scoring
    (``stages/vocab.py:bigram_familiarity``): per doc the mean corpus
    frequency of its adjacent-token bigrams (truncating permille) — the
    count-based perplexity stand-in that flags out-of-distribution
    docs. Two vocabulary-sized exchanges (bigram grouped sum, then a
    hash JOIN of occurrences against counts — no broadcast), one
    hash(doc) grouped sum."""
    from ...stages.vocab import bigram_familiarity

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"])
    return bigram_familiarity(ds, fanin=4, num_partitions=4)


BIGRAM_FAM_SQL = """
WITH occ AS (
    SELECT doc_id, t.bg
    FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
         unnest(list_transform(range(1, array_length(l)),
                               i -> l[i] || ' ' || l[i + 1]))
             AS t(bg)
),
c AS (SELECT bg, CAST(count(*) AS BIGINT) AS c FROM occ GROUP BY 1)
SELECT o.doc_id, CAST(count(*) AS BIGINT) AS n_bg,
       CAST(sum(c.c) AS BIGINT) AS fam_sum,
       CAST((1000 * sum(c.c)) // count(*) AS BIGINT) AS fam_mean_pm
FROM occ o JOIN c USING (bg)
GROUP BY 1
"""


def q_json_props_events(sf_dir: str):
    """Semi-structured extraction: the JSON ``props`` payload is parsed
    with the SAME RE2 engine on both sides (`pc.extract_regex` /
    DuckDB `regexp_extract`) — no Python json loop — and the extracted
    integer rolls up per (event_type, k//10 decade): count + exact sum.
    Map-side Arrow group_by collapse before one bounded-key shuffle."""
    from ...stages.graph import grouped_sum_parts

    ds = _read_parquet_clean(f"{sf_dir}/events.parquet",
                             columns=["event_type", "props"])

    def _extract(b: pa.Table) -> pa.Table:
        m = pc.extract_regex(b["props"], r'"k":\s*(?P<k>-?\d+)')
        kstr = pc.struct_field(m, "k")
        valid = pc.is_valid(kstr)
        t = pa.table({"event_type": b["event_type"],
                      "k": pc.cast(kstr, pa.int64())}).filter(valid)
        kv = t["k"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "event_type": t["event_type"],
            "kbin": pa.array(np.where(kv >= 0, kv // 10,
                                      -((-kv) // 10))),  # trunc like //
            "sum_k": pa.array(kv)})

    ex = ds.map_batches(_extract, batch_format="pyarrow")
    return grouped_sum_parts(ex, ["event_type", "kbin"], ["sum_k"],
                             count_col="n", fanin=2)


JSON_PROPS_SQL = """
WITH e AS (
    SELECT event_type,
           CAST(regexp_extract(props, '"k":\\s*(-?\\d+)', 1) AS BIGINT)
               AS k
    FROM events
    WHERE regexp_extract(props, '"k":\\s*(-?\\d+)', 1) <> ''
)
SELECT event_type, k // 10 AS kbin,
       CAST(sum(k) AS BIGINT) AS sum_k,
       CAST(count(*) AS BIGINT) AS n
FROM e GROUP BY 1, 2
"""


def q_conversion_latency_users(sf_dir: str):
    """Time-to-convert distribution: the funnel's fully-converted users
    (depth 3) reduced to exact discrete latency quantiles
    (p50/p90/p99 of ``purchase_ts − view_ts``) plus count and exact sum
    — the product-metric composition of ``funnel`` and
    ``exact_quantiles``. One extra bounded aggregation beyond the
    funnel's single hash(user) shuffle."""
    from ...stages.funnel import funnel
    from ...stages.quantiles import exact_quantiles

    ds = _read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_type", "ts"]).map_batches(
        lambda b: pa.table({"user_id": b["user_id"],
                            "t": b["event_type"],
                            "x": pc.cast(b["ts"], pa.int64())}),
        batch_format="pyarrow")
    fu = funnel(ds, ["view", "click", "purchase"], num_partitions=2)

    def _lat(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b["depth"], 3))
        lat = pc.subtract(t["step3_us"], t["step1_us"])
        return pa.table({
            "series_id": pa.array(["all"] * t.num_rows),
            "bucket": pc.cast(t["user_id"], pa.int64()),
            "sum_y": pc.cast(lat, pa.int64())})

    # converted-user rows only: user-count sized, safe to pin once so
    # the quantile and total passes don't re-run the funnel
    lats = fu.map_batches(_lat, batch_format="pyarrow").materialize()
    q = exact_quantiles(lats, probs=(50, 90, 99), num_partitions=2)

    def _tot(b: pa.Table) -> pa.Table:
        return pa.table({
            "series_id": pa.array(["all"]),
            "n_part": pa.array([b.num_rows], pa.int64()),
            "sum_part": pa.array(
                [int(b["sum_y"].to_numpy(
                    zero_copy_only=False).sum()) if b.num_rows else 0],
                pa.int64())})

    tot = lats.map_batches(_tot, batch_format="pyarrow").to_pandas()
    qdf = q.to_pandas()
    qdf["sum_lat"] = np.int64(tot["sum_part"].sum())
    return qdf


CONVERSION_LATENCY_SQL = """
WITH e AS (
    SELECT user_id, event_type, epoch_us(ts) AS x FROM events
),
s1 AS (SELECT user_id, min(x) AS t1 FROM e
       WHERE event_type = 'view' GROUP BY user_id),
s2 AS (SELECT e.user_id, min(x) AS t2 FROM e JOIN s1 USING (user_id)
       WHERE event_type = 'click' AND x > t1 GROUP BY e.user_id),
s3 AS (SELECT e.user_id, min(x) AS t3 FROM e JOIN s2 USING (user_id)
       WHERE event_type = 'purchase' AND x > t2 GROUP BY e.user_id),
lat AS (
    SELECT s1.user_id, t3 - t1 AS l
    FROM s1 JOIN s2 USING (user_id) JOIN s3 USING (user_id)
),
o AS (
    SELECT l, user_id,
           row_number() OVER (ORDER BY l, user_id) - 1 AS rk,
           count(*) OVER () AS n
    FROM lat
)
SELECT 'all' AS series_id, CAST(max(n) AS BIGINT) AS n,
       max(CASE WHEN rk = (n - 1) * 50 // 100 THEN l END) AS p50,
       max(CASE WHEN rk = (n - 1) * 90 // 100 THEN l END) AS p90,
       max(CASE WHEN rk = (n - 1) * 99 // 100 THEN l END) AS p99,
       CAST(sum(l) AS BIGINT) AS sum_lat
FROM o
"""


def q_ks_test_events(sf_dir: str):
    """Exact two-sample Kolmogorov–Smirnov statistic for every
    event-type pair: ``D = max_v |A(v)·n_b − B(v)·n_a| / (n_a·n_b)``
    with the cross-multiplied numerator in exact int64 and the argmax
    cent (smallest on ties). The distribution-shift companion to
    ``mann_whitney_events``. Scale shape: ONE (type, cent) grouped sum
    — the key space is bounded by the VALUE DOMAIN (cents), not the row
    count — then the pairwise ECDF scan runs on that bounded table."""
    import pandas as pd

    from ...stages.graph import grouped_sum_parts

    ev = _events_cents(sf_dir)

    def _tc(b: pa.Table) -> pa.Table:
        return pa.table({"t": b["event_type"], "v": b["cents"]})

    counts = grouped_sum_parts(ev.map_batches(_tc,
                                              batch_format="pyarrow"),
                               ["t", "v"], [], count_col="n",
                               fanin=2).to_pandas()
    # bounded by |types| x |cent domain| rows, never by event count
    vals = np.sort(counts["v"].unique())
    types = sorted(counts["t"].unique())
    cum = {}
    tot = {}
    for t in types:
        sub = counts[counts["t"] == t]
        h = np.zeros(len(vals), np.int64)
        h[np.searchsorted(vals, sub["v"].to_numpy())] = \
            sub["n"].to_numpy()
        cum[t] = np.cumsum(h)
        tot[t] = int(cum[t][-1])
    rows = []
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            num = np.abs(cum[a] * tot[b] - cum[b] * tot[a])
            best = int(num.argmax())  # ties -> smallest cent
            ks_num = int(num[best])
            ks_den = tot[a] * tot[b]
            rows.append((a, b, tot[a], tot[b], ks_num, ks_den,
                         int(vals[best]), float(ks_num) / float(ks_den)))
    out = pd.DataFrame(rows, columns=[
        "type_a", "type_b", "n_a", "n_b", "ks_num", "ks_den",
        "at_cent", "ks"])
    for c in ("n_a", "n_b", "ks_num", "ks_den", "at_cent"):
        out[c] = out[c].astype(np.int64)
    return out


KS_TEST_SQL = """
WITH c AS (
    SELECT event_type AS t, CAST(round(value * 100) AS BIGINT) AS v,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY 1, 2
),
vals AS (SELECT DISTINCT v FROM c),
types AS (SELECT DISTINCT t FROM c),
grid AS (SELECT t, v FROM types, vals),
cum AS (
    SELECT g.t, g.v,
           CAST(sum(COALESCE(c.n, 0)) OVER (
               PARTITION BY g.t ORDER BY g.v) AS BIGINT) AS cle
    FROM grid g LEFT JOIN c ON c.t = g.t AND c.v = g.v
),
nt AS (SELECT t, CAST(sum(n) AS BIGINT) AS n FROM c GROUP BY 1),
d AS (
    SELECT a.t AS ta, b.t AS tb, a.v,
           abs(a.cle * nb.n - b.cle * na.n) AS num
    FROM cum a JOIN cum b ON a.v = b.v AND a.t < b.t
    JOIN nt na ON na.t = a.t
    JOIN nt nb ON nb.t = b.t
),
k AS (SELECT ta, tb, CAST(max(num) AS BIGINT) AS ks_num
      FROM d GROUP BY 1, 2),
at AS (
    SELECT d.ta, d.tb, k.ks_num, CAST(min(d.v) AS BIGINT) AS at_cent
    FROM d JOIN k ON d.ta = k.ta AND d.tb = k.tb AND d.num = k.ks_num
    GROUP BY 1, 2, 3
)
SELECT at.ta AS type_a, at.tb AS type_b, na.n AS n_a, nb.n AS n_b,
       at.ks_num, CAST(na.n * nb.n AS BIGINT) AS ks_den, at.at_cent,
       CAST(at.ks_num AS DOUBLE) / (na.n * nb.n) AS ks
FROM at JOIN nt na ON na.t = at.ta JOIN nt nb ON nb.t = at.tb
"""


def q_markov_baseline_events(sf_dir: str):
    """Next-action baseline evaluation: from the per-user transition
    matrix (``event_transitions``), the always-predict-the-argmax
    policy per source type — prediction (count desc, type asc ties),
    support, hits, and truncating permille accuracy. The transition
    matrix is \\|types\\|² BOUNDED rows; the policy evaluation runs on
    those counts, never re-touching events."""
    import pandas as pd

    from ...stages.funnel import event_transitions

    ds = _read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"]).repartition(8)

    def _cols(b: pa.Table) -> pa.Table:
        return pa.table({"user_id": b["user_id"],
                         "event_type": b["event_type"],
                         "event_id": b["event_id"],
                         "ts_us": pc.cast(b["ts"], pa.int64())})

    tm = event_transitions(ds.map_batches(_cols, batch_format="pyarrow"),
                           num_partitions=4, fanin=2).to_pandas()
    rows = []
    for src, g in tm.groupby("src"):
        g = g.sort_values(["c", "dst"], ascending=[False, True])
        pred = g.iloc[0]["dst"]
        hits = int(g.iloc[0]["c"])
        support = int(g["c"].sum())
        rows.append((src, pred, support, hits,
                     (1000 * hits) // support))
    out = pd.DataFrame(rows, columns=["src", "pred", "support", "hits",
                                      "acc_pm"]).sort_values(
        "src").reset_index(drop=True)
    for c in ("support", "hits", "acc_pm"):
        out[c] = out[c].astype(np.int64)
    return out


MARKOV_BASELINE_SQL = """
WITH e AS (
    SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us
    FROM events
),
s AS (
    SELECT user_id, event_type,
           lag(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts_us, event_id) AS prev
    FROM e
),
tm AS (
    SELECT prev AS src, event_type AS dst, count(*) AS c
    FROM s WHERE prev IS NOT NULL GROUP BY 1, 2
),
r AS (
    SELECT src, dst, c,
           row_number() OVER (PARTITION BY src
                              ORDER BY c DESC, dst) AS rn,
           CAST(sum(c) OVER (PARTITION BY src) AS BIGINT) AS support
    FROM tm
)
SELECT src, dst AS pred, support, CAST(c AS BIGINT) AS hits,
       CAST((1000 * c) // support AS BIGINT) AS acc_pm
FROM r WHERE rn = 1
"""


def q_gapfill_linear_15m(sf_dir: str):
    """Linear-interpolation gap fill over the 15m tier
    (``stages/gapfill.py:gapfill_linear``): missing buckets take the e6
    fixed-point interpolation between bracketing present buckets
    (window-index distances, truncating division); present rows carry
    y·10⁶ exactly. The third fill mode beside zero/ffill."""
    from ...stages.gapfill import gapfill_linear
    from ...stages.rollup import rollup

    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    rolled = rollup(ev.map_batches(_series, batch_format="pyarrow"),
                    900 * US)
    return gapfill_linear(rolled, 900 * US, num_partitions=4)


GAPFILL_LINEAR_SQL = f"""
WITH r AS (
    SELECT event_type AS series_id,
           (epoch_us(ts) // {900 * US}) * {900 * US} AS bucket,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s
    FROM events GROUP BY 1, 2
),
b AS (SELECT series_id, min(bucket) AS mn, max(bucket) AS mx
      FROM r GROUP BY 1),
g AS (SELECT series_id, unnest(range(mn, mx + 1, {900 * US}))
          AS bucket, mn
      FROM b),
f AS (
    SELECT g.series_id, g.bucket, r.s,
           (g.bucket - g.mn) // {900 * US} AS k
    FROM g LEFT JOIN r USING (series_id, bucket)
),
w AS (
    SELECT series_id, bucket, s, k,
           last_value(CASE WHEN s IS NOT NULL THEN k END IGNORE NULLS)
               OVER (PARTITION BY series_id ORDER BY bucket
                     ROWS UNBOUNDED PRECEDING) AS k0,
           last_value(CASE WHEN s IS NOT NULL THEN s END IGNORE NULLS)
               OVER (PARTITION BY series_id ORDER BY bucket
                     ROWS UNBOUNDED PRECEDING) AS y0,
           first_value(CASE WHEN s IS NOT NULL THEN k END IGNORE NULLS)
               OVER (PARTITION BY series_id ORDER BY bucket
                     ROWS BETWEEN CURRENT ROW
                              AND UNBOUNDED FOLLOWING) AS k1,
           first_value(CASE WHEN s IS NOT NULL THEN s END IGNORE NULLS)
               OVER (PARTITION BY series_id ORDER BY bucket
                     ROWS BETWEEN CURRENT ROW
                              AND UNBOUNDED FOLLOWING) AS y1
    FROM f
)
SELECT series_id, bucket,
       CAST(CASE WHEN s IS NOT NULL THEN s * 1000000
                 ELSE (y0 * (k1 - k) + y1 * (k - k0)) * 1000000
                      // (k1 - k0) END AS BIGINT) AS y_e6,
       s IS NULL AS is_gap
FROM w
"""


def q_welch_t_events(sf_dir: str):
    """Welch's unequal-variance t statistic for every event-type pair —
    the moments-based member of the shift-test family (alongside
    ``mann_whitney_events`` ranks and ``ks_test_events`` ECDFs). One
    grouped sum to \\|types\\| sufficient-statistic rows (n, Σx, Σx²);
    the t chain (means, variances, sqrt) is the identical pinned IEEE
    expression tree on both sides."""
    import pandas as pd

    from ...stages.graph import grouped_sum_parts

    ev = _events_cents(sf_dir)

    def _mom(b: pa.Table) -> pa.Table:
        v = b["cents"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"t": b["event_type"], "s": pa.array(v),
                         "ss": pa.array(v * v)})

    mom = grouped_sum_parts(ev.map_batches(_mom, batch_format="pyarrow"),
                            ["t"], ["s", "ss"], count_col="n",
                            fanin=2).to_pandas()  # |types| rows
    mom = mom.sort_values("t").reset_index(drop=True)
    rows = []
    for i in range(len(mom)):
        for j in range(i + 1, len(mom)):
            a, b = mom.iloc[i], mom.iloc[j]
            na, nb = int(a["n"]), int(b["n"])
            sa, sb = int(a["s"]), int(b["s"])
            ssa, ssb = int(a["ss"]), int(b["ss"])
            ma = float(sa) / na
            mb = float(sb) / nb
            va = (float(ssa) - float(sa) * ma) / (na - 1)
            vb = (float(ssb) - float(sb) * mb) / (nb - 1)
            tstat = (ma - mb) / np.sqrt(va / na + vb / nb)
            rows.append((a["t"], b["t"], na, nb, sa, sb, float(tstat)))
    out = pd.DataFrame(rows, columns=["type_a", "type_b", "n_a", "n_b",
                                      "sum_a", "sum_b", "t"])
    for c in ("n_a", "n_b", "sum_a", "sum_b"):
        out[c] = out[c].astype(np.int64)
    return out


WELCH_T_SQL = """
WITH m AS (
    SELECT event_type AS t, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s,
           CAST(sum(CAST(round(value * 100) AS BIGINT)
                    * CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS ss
    FROM events GROUP BY 1
)
SELECT a.t AS type_a, b.t AS type_b, a.n AS n_a, b.n AS n_b,
       a.s AS sum_a, b.s AS sum_b,
       (CAST(a.s AS DOUBLE) / a.n - CAST(b.s AS DOUBLE) / b.n)
       / sqrt(((CAST(a.ss AS DOUBLE)
                - CAST(a.s AS DOUBLE) * (CAST(a.s AS DOUBLE) / a.n))
               / (a.n - 1)) / a.n
              + ((CAST(b.ss AS DOUBLE)
                  - CAST(b.s AS DOUBLE) * (CAST(b.s AS DOUBLE) / b.n))
                 / (b.n - 1)) / b.n) AS t
FROM m a JOIN m b ON a.t < b.t
"""


def q_fleet_bands_1h(sf_dir: str):
    """Fleet percentile ribbon: per 1h bucket, the exact discrete
    p10/p50/p90 of the per-series sums ACROSS series — the
    "thousands of hosts as one chart" dashboard band. Pure reuse of the
    ``exact_quantiles`` machinery with the TIME BUCKET as the group key
    (one hash(bucket) shuffle; groups are fleet-sized, not
    history-sized)."""
    from ...stages.quantiles import exact_quantiles
    from ...stages.rollup import rollup

    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    rolled = rollup(ev.map_batches(_series, batch_format="pyarrow"), W1H)

    def _pivot(b: pa.Table) -> pa.Table:
        sid = b["series_id"]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        # order col must be int64: dictionary-code the series name — the
        # quantile VALUE picks are order-insensitive among ties anyway
        codes = sid.dictionary_encode().indices
        return pa.table({"series_id": b["bucket"],
                         "bucket": pc.cast(codes, pa.int64()),
                         "sum_y": b["sum_y"]})

    q = exact_quantiles(rolled.map_batches(_pivot, batch_format="pyarrow"),
                        probs=(10, 50, 90), num_partitions=4)

    def _rename(b: pa.Table) -> pa.Table:
        return b.rename_columns(["bucket"] + b.column_names[1:])

    return q.map_batches(_rename, batch_format="pyarrow")


FLEET_BANDS_SQL = f"""
WITH r AS (
    SELECT event_type AS series_id,
           (epoch_us(ts) // {W1H}) * {W1H} AS bucket,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s
    FROM events GROUP BY 1, 2
),
o AS (
    SELECT bucket, s,
           row_number() OVER (PARTITION BY bucket
                              ORDER BY s, series_id) - 1 AS rk,
           count(*) OVER (PARTITION BY bucket) AS n
    FROM r
)
SELECT bucket, CAST(max(n) AS BIGINT) AS n,
       max(CASE WHEN rk = (n - 1) * 10 // 100 THEN s END) AS p10,
       max(CASE WHEN rk = (n - 1) * 50 // 100 THEN s END) AS p50,
       max(CASE WHEN rk = (n - 1) * 90 // 100 THEN s END) AS p90
FROM o GROUP BY 1
"""


def q_tier_consistency_events(sf_dir: str):
    """Cascade trust audit: per series the exact cent totals of the
    15m, 1h and 1d tiers plus equality bits — the invariant every
    retention cascade must preserve (associative merges lose nothing).
    Three rollups collapse to \\|series\\| rows each; the comparison is
    a bounded merge."""
    import pandas as pd

    from ...stages.rollup import rollup

    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    src = ev.map_batches(_series, batch_format="pyarrow").materialize()
    totals = {}
    for name, w in (("t15m", 900 * US), ("t1h", W1H),
                    ("t1d", 86_400_000_000)):
        rolled = rollup(src, w)

        def _tot(b: pa.Table) -> pa.Table:
            return pa.table({"series_id": b["series_id"],
                             "s": b["sum_y"]})

        from ...stages.graph import grouped_sum_parts

        t = grouped_sum_parts(rolled.map_batches(_tot,
                                                 batch_format="pyarrow"),
                              ["series_id"], ["s"], count_col="nb",
                              fanin=2).to_pandas()  # |series| rows
        totals[name] = t.set_index("series_id")
    idx = sorted(totals["t15m"].index)
    rows = []
    for sid in idx:
        s15 = int(totals["t15m"].loc[sid, "s"])
        s1h = int(totals["t1h"].loc[sid, "s"])
        s1d = int(totals["t1d"].loc[sid, "s"])
        rows.append((sid, s15, s1h, s1d,
                     int(totals["t15m"].loc[sid, "nb"]),
                     int(totals["t1h"].loc[sid, "nb"]),
                     int(totals["t1d"].loc[sid, "nb"]),
                     bool(s15 == s1h == s1d)))
    out = pd.DataFrame(rows, columns=[
        "series_id", "sum_15m", "sum_1h", "sum_1d", "nb_15m", "nb_1h",
        "nb_1d", "consistent"])
    for c in out.columns[1:-1]:
        out[c] = out[c].astype(np.int64)
    return out


TIER_CONSISTENCY_SQL = f"""
WITH e AS (
    SELECT event_type AS series_id, epoch_us(ts) AS x,
           CAST(round(value * 100) AS BIGINT) AS y
    FROM events
),
t15 AS (SELECT series_id, CAST(sum(y) AS BIGINT) AS s,
               CAST(count(DISTINCT x // {900 * US}) AS BIGINT) AS nb
        FROM e GROUP BY 1),
t1h AS (SELECT series_id, CAST(sum(y) AS BIGINT) AS s,
               CAST(count(DISTINCT x // {W1H}) AS BIGINT) AS nb
        FROM e GROUP BY 1),
t1d AS (SELECT series_id, CAST(sum(y) AS BIGINT) AS s,
               CAST(count(DISTINCT x // {86_400_000_000}) AS BIGINT)
                   AS nb
        FROM e GROUP BY 1)
SELECT t15.series_id, t15.s AS sum_15m, t1h.s AS sum_1h,
       t1d.s AS sum_1d, t15.nb AS nb_15m, t1h.nb AS nb_1h,
       t1d.nb AS nb_1d,
       (t15.s = t1h.s AND t1h.s = t1d.s) AS consistent
FROM t15 JOIN t1h USING (series_id) JOIN t1d USING (series_id)
"""


def q_ed1_pairs_docs(sf_dir: str):
    """String-similarity join (``stages/strsim.py:ed1_pairs``): every
    vocabulary term pair within Levenshtein distance 1 via FastSS
    deletion neighborhoods — one hash(variant) shuffle of
    neighborhood-sized rows, in-bucket exact verify, hash-partitioned
    pair distinct. The typo-mining / spelling-variant primitive."""
    from ...stages.graph import grouped_sum_parts
    from ...stages.strsim import ed1_pairs

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["text"])

    def _toks(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b["text"], pattern=" ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.values
        flat = flat.filter(pc.not_equal(flat, ""))
        u = pc.unique(flat)
        # fixture synthesis (not the operator hot path): the toy vocab
        # has no true near-spellings, so every token of length >= 5
        # contributes its last-char-dropped "typo" variant — the
        # deterministic rule the SQL oracle replays
        longs = u.filter(pc.greater_equal(pc.utf8_length(u), 5))
        typo = pa.array([t[:-1] for t in longs.to_pylist()],
                        pa.string())  # vocab-sized, not corpus-sized
        return pa.table({"token": pa.concat_arrays(
            [u.combine_chunks() if isinstance(u, pa.ChunkedArray) else u,
             typo])})

    vocab = grouped_sum_parts(ds.map_batches(_toks,
                                             batch_format="pyarrow"),
                              ["token"], [], count_col="c", fanin=2)
    vocab = vocab.map_batches(
        lambda b: pa.table({"token": b["token"]}),
        batch_format="pyarrow")
    return ed1_pairs(vocab, num_partitions=4)


ED1_PAIRS_SQL = """
WITH base AS (
    SELECT DISTINCT t.term AS tok
    FROM documents, unnest(string_split(text, ' ')) AS t(term)
    WHERE t.term <> ''
),
v AS (
    SELECT DISTINCT tok FROM (
        SELECT tok FROM base
        UNION ALL
        SELECT substr(tok, 1, length(tok) - 1) FROM base
        WHERE length(tok) >= 5
    )
)
SELECT a.tok AS a, b.tok AS b
FROM v a JOIN v b
  ON a.tok < b.tok AND levenshtein(a.tok, b.tok) <= 1
"""


def q_graph_degree_stats_docs(sf_dir: str):
    """Graph topology profile over the deterministic link graph
    (`_graph_targets` edges): out/in-degree distributions (including
    the 0-in-degree class) and edge reciprocity — the completeness
    companion to pagerank / triangles / components. All steps are
    bounded grouped counts: distinct edges → per-node degrees → tiny
    degree histogram; reciprocity via canonical-pair counts. Output
    ``(kind, k, n)`` rows ('out'/'in' degree classes; one 'recip' row
    with k = reciprocated directed edges, n = distinct non-self
    edges)."""
    import pandas as pd
    import pyarrow.parquet as _pq

    from ...stages.graph import grouped_sum_parts

    n_docs = _pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id"]).repartition(8)

    def _edges(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = _graph_targets(d, n_docs)
        src = np.concatenate([d, d, d])
        dst = np.concatenate(ts)
        return pa.table({"src": pa.array(src), "dst": pa.array(dst)})

    edges = grouped_sum_parts(ds.map_batches(_edges,
                                             batch_format="pyarrow"),
                              ["src", "dst"], [], count_col="m",
                              fanin=4)  # distinct directed edges

    def _clean(b: pa.Table) -> pa.Table:
        return pa.table({"src": b["src"], "dst": b["dst"]})

    e = edges.map_batches(_clean, batch_format="pyarrow").materialize()

    outdeg = grouped_sum_parts(e.map_batches(
        lambda b: pa.table({"src": b["src"]}), batch_format="pyarrow"),
        ["src"], [], count_col="d", fanin=2)
    indeg = grouped_sum_parts(e.map_batches(
        lambda b: pa.table({"dst": b["dst"]}), batch_format="pyarrow"),
        ["dst"], [], count_col="d", fanin=2)

    def _hist(ds_, col):
        t = grouped_sum_parts(ds_.map_batches(
            lambda b: pa.table({"k": b["d"]}), batch_format="pyarrow"),
            ["k"], [], count_col="n", fanin=2).to_pandas()
        return t  # bounded: degree classes

    oh = _hist(outdeg, "d")
    ih = _hist(indeg, "d")
    nodes_with_in = int(ih["n"].sum())
    rows = [("out", int(r["k"]), int(r["n"])) for _, r in oh.iterrows()]
    rows += [("in", int(r["k"]), int(r["n"])) for _, r in ih.iterrows()]
    if n_docs - nodes_with_in > 0:
        rows.append(("in", 0, n_docs - nodes_with_in))

    def _canon(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table({"lo": pa.array(np.minimum(s, d)),
                         "hi": pa.array(np.maximum(s, d))})

    pairs = grouped_sum_parts(e.map_batches(_canon,
                                            batch_format="pyarrow"),
                              ["lo", "hi"], [], count_col="c",
                              fanin=2).to_pandas()
    mutual_pairs = int((pairs["c"] == 2).sum())
    nonself_edges = int(pairs["c"].sum())
    rows.append(("recip", 2 * mutual_pairs, nonself_edges))
    out = pd.DataFrame(rows, columns=["kind", "k", "n"]).sort_values(
        ["kind", "k"]).reset_index(drop=True)
    out["k"] = out["k"].astype(np.int64)
    out["n"] = out["n"].astype(np.int64)
    return out


GRAPH_DEGREE_SQL = """
WITH n AS (SELECT count(*) AS c FROM documents),
raw AS (
    SELECT doc_id AS src,
           (doc_id * 31 + 97 * j.j) % (SELECT c FROM n) AS dst
    FROM documents, generate_series(1, 3) j(j)
),
e AS (SELECT DISTINCT src, dst FROM raw),
od AS (SELECT src, count(*) AS d FROM e GROUP BY 1),
idg AS (SELECT dst, count(*) AS d FROM e GROUP BY 1),
oh AS (SELECT 'out' AS kind, CAST(d AS BIGINT) AS k,
              CAST(count(*) AS BIGINT) AS n
       FROM od GROUP BY 2),
ih AS (SELECT 'in' AS kind, CAST(d AS BIGINT) AS k,
              CAST(count(*) AS BIGINT) AS n
       FROM idg GROUP BY 2),
iz AS (SELECT 'in' AS kind, CAST(0 AS BIGINT) AS k,
              CAST((SELECT c FROM n) - count(*) AS BIGINT) AS n
       FROM idg HAVING (SELECT c FROM n) > count(*)),
p AS (
    SELECT least(src, dst) AS lo, greatest(src, dst) AS hi,
           count(*) AS c
    FROM e WHERE src <> dst GROUP BY 1, 2
),
r AS (SELECT 'recip' AS kind,
             CAST(2 * count(*) FILTER (c = 2) AS BIGINT) AS k,
             CAST(sum(c) AS BIGINT) AS n
      FROM p)
SELECT * FROM oh UNION ALL SELECT * FROM ih
UNION ALL SELECT * FROM iz UNION ALL SELECT * FROM r
"""


def q_sax_motifs_events(sf_dir: str):
    """Time-series motif discovery over the SAX representation: each
    series' most frequent symbol TRIGRAM (ties to the lexicographically
    smallest) with its count — the classic symbolic-motif primitive
    built on ``sax_symbols``. The trigram pass touches one short string
    per SERIES (tier-reduced), never raw points."""
    import pandas as pd

    base = q_sax_events(sf_dir).to_pandas()  # one row per series
    rows = []
    from collections import Counter
    for _, r in base.iterrows():
        s = r["sax"]
        grams = Counter(s[i:i + 3] for i in range(len(s) - 2))
        if not grams:
            continue
        motif, cnt = sorted(grams.items(),
                            key=lambda kv: (-kv[1], kv[0]))[0]
        rows.append((r["series_id"], motif, cnt, len(s) - 2))
    out = pd.DataFrame(rows, columns=["series_id", "motif", "cnt",
                                      "n_grams"])
    out["cnt"] = out["cnt"].astype(np.int64)
    out["n_grams"] = out["n_grams"].astype(np.int64)
    return out.sort_values("series_id").reset_index(drop=True)


def q_ohlc_15m(sf_dir: str):
    """OHLC candles per (series, 15m bucket): open/close = first/last
    value in (ts, event_id) order (the deterministic struct-argmin/max
    semantic), high/low = exact extremes, plus count — the financial /
    monitoring candle view that complements M4's extreme-POSITION
    selection. One hash(series) shuffle, sorted segment pass with
    `reduceat` extremes and first/last gathers."""
    from ...arrow_utils import stable_part_codes

    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"],
                         "x": b["ts_us"], "eid": b["event_id"],
                         "y": b["cents"]})

    ds = ev.map_batches(_series, batch_format="pyarrow")
    mod = 2 * 64

    _add_part = make_add_part("series_id", mod)

    def _candles(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        sid_type = t["series_id"].type
        empty = pa.table({"series_id": pa.array([], sid_type),
                          "bucket": pa.array([], pa.int64()),
                          "open": pa.array([], pa.int64()),
                          "high": pa.array([], pa.int64()),
                          "low": pa.array([], pa.int64()),
                          "close": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        x = t["x"].to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = x // (900 * US) * (900 * US)
        t = t.append_column("bucket", pa.array(bucket))
        t = t.take(pc.sort_indices(t, sort_keys=[
            ("series_id", "ascending"), ("bucket", "ascending"),
            ("x", "ascending"), ("eid", "ascending")]))
        sid = t["series_id"]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = group_codes(sid)
        bk = t["bucket"].to_numpy(zero_copy_only=False)
        y = t["y"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(y)
        change = np.ones(n, dtype=bool)
        change[1:] = (codes[1:] != codes[:-1]) | (bk[1:] != bk[:-1])
        first = np.flatnonzero(change)
        last = np.r_[first[1:] - 1, n - 1]
        return pa.table({
            "series_id": sid.take(pa.array(first)),
            "bucket": pa.array(bk[first]),
            "open": pa.array(y[first]),
            "high": pa.array(np.maximum.reduceat(y, first)),
            "low": pa.array(np.minimum.reduceat(y, first)),
            "close": pa.array(y[last]),
            "n": pa.array((last - first + 1).astype(np.int64))})

    return (ds.map_batches(_add_part, batch_format="pyarrow")
            .repartition(2).groupby("__part")
            .map_groups(_candles, batch_format="pyarrow"))


OHLC_SQL = f"""
WITH e AS (
    SELECT event_type AS series_id, epoch_us(ts) AS x, event_id,
           CAST(round(value * 100) AS BIGINT) AS y
    FROM events
)
SELECT series_id, (x // {900 * US}) * {900 * US} AS bucket,
       (min(struct_pack(x := x, eid := event_id, y := y))).y AS open,
       max(y) AS high, min(y) AS low,
       (max(struct_pack(x := x, eid := event_id, y := y))).y AS close,
       CAST(count(*) AS BIGINT) AS n
FROM e GROUP BY 1, 2
"""


def q_ltv_curve_users(sf_dir: str):
    """Customer lifetime-value curve: per week offset since each
    purchaser's FIRST purchase week — active purchasers, exact cent
    revenue, and the cumulative revenue (ints cumsummed over the
    BOUNDED offset axis). One hash(user) shuffle collapsing to
    (user, offset) partials inside the pass, one tiny offset grouped
    sum."""
    import pandas as pd

    from ...arrow_utils import stable_part_codes
    from ...stages.graph import grouped_sum_parts

    WEEK = 7 * 86_400_000_000
    ds = _read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_type", "value"])

    def _pur(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b["event_type"], "purchase"))
        return pa.table({
            "user_id": pc.cast(t["user_id"], pa.int64()),
            "week": pa.array(t["ts"].cast(pa.int64()).to_numpy(
                zero_copy_only=False) // WEEK),
            "cents": pc.cast(pc.round(pc.multiply(t["value"], 100.0),
                                      ndigits=0), pa.int64())})

    pur = ds.map_batches(_pur, batch_format="pyarrow")
    mod = 2 * 64

    _add_part = make_add_part("user_id", mod)

    def _offsets(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        empty = pa.table({"woff": pa.array([], pa.int64()),
                          "rev": pa.array([], pa.int64()),
                          "u": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        t = t.take(pc.sort_indices(t, sort_keys=[
            ("user_id", "ascending"), ("week", "ascending")]))
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        wk = t["week"].to_numpy(zero_copy_only=False)
        c = t["cents"].to_numpy(zero_copy_only=False).astype(np.int64)
        change = np.ones(len(uid), dtype=bool)
        change[1:] = uid[1:] != uid[:-1]
        first_wk = wk[np.flatnonzero(change)][
            (np.cumsum(change) - 1)]
        off = wk - first_wk
        # rows are (user, week)-sorted, so (user, offset) groups are
        # CONTIGUOUS — segment reduction, no composite key to overflow
        pair_change = np.ones(len(uid), dtype=bool)
        pair_change[1:] = (uid[1:] != uid[:-1]) | (off[1:] != off[:-1])
        fi = np.flatnonzero(pair_change)
        rev = np.add.reduceat(c, fi)
        return pa.table({"woff": pa.array(off[fi]),
                         "rev": pa.array(rev),
                         "u": pa.array(np.ones(len(fi), np.int64))})

    per_off = grouped_sum_parts(
        pur.map_batches(_add_part, batch_format="pyarrow")
        .repartition(2).groupby("__part")
        .map_groups(_offsets, batch_format="pyarrow"),
        ["woff"], ["rev", "u"], count_col=None,
        fanin=2).to_pandas()  # bounded: week-span rows
    per_off = per_off.sort_values("woff").reset_index(drop=True)
    per_off["cum_rev"] = per_off["rev"].cumsum()
    for c in ("woff", "rev", "u", "cum_rev"):
        per_off[c] = per_off[c].astype(np.int64)
    return per_off


LTV_CURVE_SQL = f"""
WITH p AS (
    SELECT user_id, epoch_us(ts) // {7 * 86_400_000_000} AS week,
           CAST(round(value * 100) AS BIGINT) AS cents
    FROM events WHERE event_type = 'purchase'
),
f AS (SELECT user_id, min(week) AS w0 FROM p GROUP BY 1),
o AS (
    SELECT p.user_id, p.week - f.w0 AS woff,
           CAST(sum(p.cents) AS BIGINT) AS rev
    FROM p JOIN f USING (user_id) GROUP BY 1, 2
),
a AS (
    SELECT woff, CAST(sum(rev) AS BIGINT) AS rev,
           CAST(count(*) AS BIGINT) AS u
    FROM o GROUP BY 1
)
SELECT woff, rev, u,
       CAST(sum(rev) OVER (ORDER BY woff
                           ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cum_rev
FROM a
"""


