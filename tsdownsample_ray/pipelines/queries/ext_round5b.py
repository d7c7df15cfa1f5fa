"""Round-5 closing wave: full matrix profile, MACD, and rational-idf
BM25 ranking.

Each entry follows the catalog contract: a Ray-Data-first distributed
shape documented in place, integer-exact arithmetic so the DuckDB
oracle replays bit-identically, and column names matched between both
sides.
"""
from __future__ import annotations

from ...arrow_utils import group_codes, make_add_part
from ._shared import _read_parquet_clean, np, pa, pc
from .downsample_core import _events_cents


def q_macd_15m(sf_dir: str):
    """MACD crossover signals over the 15m tier
    (``stages/smoothing.py:macd_fixed_point``): fast EMA (alpha 1/4),
    slow EMA (alpha 1/16), signal EMA (alpha 1/8) over their
    difference — the classic momentum composition, in the catalog's
    integer fixed point (arithmetic shift = exact floor division) so
    the recursive-CTE oracle replays bit-identically at any magnitude.
    One hash(series) shuffle; sequential only within a series, over
    tier rows."""
    from ...stages.rollup import rollup
    from ...stages.smoothing import macd_fixed_point

    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    rolled = rollup(ev.map_batches(_series, batch_format="pyarrow"),
                    900_000_000)
    return macd_fixed_point(rolled, kf=2, ks=4, ksig=3,
                            num_partitions=2)


# exact BIGINT floor(d / 2^k) per the EWMA/Holt idiom: DuckDB //
# truncates toward zero, so negatives take -((-d + 2^k - 1) // 2^k)
MACD_SQL = """
WITH RECURSIVE numbered AS MATERIALIZED (
    SELECT event_type AS series_id, bucket, y,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY bucket) AS idx
    FROM (
        SELECT event_type, epoch_us(ts) // 900000000 * 900000000 AS bucket,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
        FROM events GROUP BY event_type, bucket
    )
),
rec AS (
    SELECT series_id, bucket, y, idx,
           y AS ef, y AS es, CAST(0 AS BIGINT) AS sig
    FROM numbered WHERE idx = 1
    UNION ALL
    SELECT series_id, bucket, y, idx, nef, nes,
           sig + (CASE WHEN nef - nes - sig >= 0
                       THEN (nef - nes - sig) // 8
                       ELSE -(((-(nef - nes - sig)) + 7) // 8) END)
    FROM (
        SELECT n.series_id, n.bucket, n.y, n.idx, r.sig,
               r.ef + (CASE WHEN n.y - r.ef >= 0 THEN (n.y - r.ef) // 4
                       ELSE -(((-(n.y - r.ef)) + 3) // 4) END) AS nef,
               r.es + (CASE WHEN n.y - r.es >= 0 THEN (n.y - r.es) // 16
                       ELSE -(((-(n.y - r.es)) + 15) // 16) END) AS nes
        FROM rec r JOIN numbered n
          ON n.series_id = r.series_id AND n.idx = r.idx + 1
    )
)
SELECT series_id, bucket, y, ef - es AS macd, sig AS signal,
       (ef - es) - sig AS hist
FROM rec
"""


def q_matrix_profile_1h(sf_dir: str):
    """The FULL matrix profile (completing the ``discord_1h`` /
    ``motif_1h`` extremes): per series over the 1h tier, EVERY length-6
    window's exact integer squared Euclidean distance to its nearest
    non-overlapping neighbor (exclusion zone |i-j| >= 6) plus that
    neighbor's bucket — the whole-profile primitive behind anomaly
    ranking and segmentation (Yeh et al., "Matrix Profile I", ICDM'16;
    non-z-normalized ED variant so integer arithmetic stays exact).

    Engine: one integer Gram matmul per series (D2 = S_i + S_j -
    2*A*A^T, windows as rows), exclusion mask, per-row min + first
    argmin (= smallest neighbor index). Tier rows keep the quadratic
    profile partition-local; a single huge series would partition by
    diagonal bands (the SCRIMP/STOMP decomposition) — documented, not
    needed at tier scale. Output: (series_id, bucket, nn_bucket,
    nn_d2), one row per window with a valid neighbor."""
    from ...stages.rollup import rollup

    W = 6
    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({"series_id": b["event_type"], "x": b["ts_us"],
                         "y": b["cents"]})

    rolled = rollup(ev.map_batches(_series, batch_format="pyarrow"),
                    3_600_000_000)
    mod = 2 * 64

    _add_part = make_add_part("series_id", mod)

    def _profile(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        s_type = t["series_id"].type
        cols = ("bucket", "nn_bucket", "nn_d2")
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
        bkt = t["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
        heads = np.ones(len(codes), dtype=bool)
        heads[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(heads)
        ends = np.r_[starts[1:], len(codes)]
        sids, parts = [], []
        BIG = np.int64(1 << 62)
        for f, l in zip(starts, ends):  # series loop; inner matmul
            yy = y[f:l]
            m = (l - f) - W + 1
            if m < 2:
                continue
            A = np.ascontiguousarray(
                np.lib.stride_tricks.sliding_window_view(yy, W))
            S = (A * A).sum(axis=1)
            D2 = S[:, None] + S[None, :] - 2 * (A @ A.T)
            ii = np.arange(m)
            mask = np.abs(ii[:, None] - ii[None, :]) < W
            D2 = np.where(mask, BIG, D2)
            nn = D2.min(axis=1)
            nnj = D2.argmin(axis=1)  # first min = smallest j
            valid = nn < BIG
            if not valid.any():
                continue
            iv = np.flatnonzero(valid)
            parts.append(pa.table({
                "bucket": pa.array(bkt[f + iv]),
                "nn_bucket": pa.array(bkt[f + nnj[iv]]),
                "nn_d2": pa.array(nn[iv])}))
            sids.append(pa.array([sid[int(f)].as_py()] * len(iv),
                                 s_type))
        if not parts:
            return pa.table({"series_id": pa.array([], s_type),
                             **{c: pa.array([], pa.int64())
                                for c in cols}})
        body = pa.concat_tables(parts)
        return body.add_column(0, "series_id",
                               pa.concat_arrays(sids))

    return (rolled.map_batches(_add_part, batch_format="pyarrow")
            .repartition(2).groupby("__part")
            .map_groups(_profile, batch_format="pyarrow"))


MATRIX_PROFILE_SQL = """
WITH r AS (
    SELECT event_type AS series_id,
           epoch_us(ts) // 3600000000 * 3600000000 AS bucket,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
    FROM events GROUP BY 1, 2
),
o AS (
    SELECT series_id, bucket,
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
           b.rk AS j, b.bucket AS nn_bucket,
           CAST(list_dot_product(a.v, a.v) + list_dot_product(b.v, b.v)
                - 2 * list_dot_product(a.v, b.v) AS BIGINT) AS nn_d2
    FROM wv a JOIN wv b
      ON a.series_id = b.series_id AND abs(a.rk - b.rk) >= 6
)
SELECT series_id, CAST(bucket AS BIGINT) AS bucket,
       CAST(nn_bucket AS BIGINT) AS nn_bucket, nn_d2
FROM (
    SELECT d.*, row_number() OVER (PARTITION BY series_id, i
                                   ORDER BY nn_d2, j) AS rnk
    FROM d
) WHERE rnk = 1
"""


#: the fixed retrieval query for ``bm25_docs`` — common corpus terms so
#: every sf produces matches; literal in BOTH the engine and the oracle
BM25_QUERY_TERMS = ("merge", "join", "sort", "scan")


def q_bm25_docs(sf_dir: str):
    """BM25 ranking (Robertson & Zaragoza 2009) of every document
    against the fixed query ``BM25_QUERY_TERMS``, with the RATIONAL idf
    surrogate idf_r = (N - df) / df — the classic Robertson idf with
    the log dropped, keeping every quantity rational so the score is
    exact in integer arithmetic (a transcendental ln cannot hash-match
    across engines bit-for-bit). k1 = 6/5, b = 3/4; clearing all
    denominators:

        score_e6 = floor(1e6 * (N-df) * 44 * total_len * tf
                         / (df * (20*total_len*tf + 6*total_len
                                  + 18*dl*N)))

    N / total_len count only docs with >= 1 token (both sides agree).
    Intermediates exceed int64 at corpus scale, so the scoring map uses
    exact Python-int (object-dtype) arithmetic — bounded work: rows are
    matched (doc, term) pairs, |query| x matching docs, never the
    corpus token stream (at retrieval scale this stage consumes a
    postings-selected candidate set). Shape: ONE tokenize pass emits a
    narrow per-doc stat row (dl + one tf column per query term); global
    N / total_len / df reduce via one small aggregate; scores then map
    over the same stat rows with the scalars broadcast in a closure.
    Output: (doc_id, term, tf, dl, score_e6)."""
    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"])
    terms = BM25_QUERY_TERMS

    def _stats(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.fill_null(b["text"], ""), " ")
        # pc.list_flatten respects any list offset/slicing, and the
        # row boundaries are rebuilt from value lengths — the safe
        # idiom regardless of the splitter's buffer layout
        lens = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        offs = np.r_[0, np.cumsum(lens)]
        vals = pc.list_flatten(toks)
        cols = {"doc_id": b["doc_id"]}
        # dl = nonempty token count per doc: total slots minus
        # empty-string slots, per row, via cumsum windows
        empty = pc.equal(vals, "").to_numpy(zero_copy_only=False)
        cum = np.r_[0, np.cumsum(empty.astype(np.int64))]
        cols["dl"] = pa.array(lens - (cum[offs[1:]] - cum[offs[:-1]]),
                              pa.int64())
        for qt in terms:
            hit = pc.equal(vals, qt).to_numpy(zero_copy_only=False)
            c = np.r_[0, np.cumsum(hit.astype(np.int64))]
            tf = c[offs[1:]] - c[offs[:-1]]
            cols[f"tf_{qt}"] = pa.array(tf, pa.int64())
            cols[f"m_{qt}"] = pa.array(
                (tf > 0).astype(np.int64), pa.int64())
        t = pa.table(cols)
        return t.filter(pc.greater(t["dl"], 0))

    stats = ds.map_batches(_stats, batch_format="pyarrow").materialize()
    n_docs = stats.count()
    agg = stats.sum(["dl"] + [f"m_{qt}" for qt in terms])
    total_len = int(agg["sum(dl)"])
    dfs = {qt: int(agg[f"sum(m_{qt})"]) for qt in terms}

    def _score(b: pa.Table) -> pa.Table:
        out = {"doc_id": [], "term": [], "tf": [], "dl": [],
               "score_e6": []}
        dl = b["dl"].to_numpy(zero_copy_only=False)
        did = b["doc_id"].to_numpy(zero_copy_only=False)
        for qt in terms:
            df = dfs[qt]
            if df == 0:
                continue
            tf = b[f"tf_{qt}"].to_numpy(zero_copy_only=False)
            sel = np.flatnonzero(tf > 0)
            # exact big-int arithmetic (object dtype): intermediates
            # pass 2^63 at corpus scale; row count bounded by matches
            tfo = tf[sel].astype(object)
            dlo = dl[sel].astype(object)
            num = (n_docs - df) * 44 * total_len * tfo * 1_000_000
            den = df * (20 * total_len * tfo + 6 * total_len
                        + 18 * dlo * n_docs)
            out["doc_id"].extend(did[sel].tolist())
            out["term"].extend([qt] * len(sel))
            out["tf"].extend(tf[sel].tolist())
            out["dl"].extend(dl[sel].tolist())
            out["score_e6"].extend((num // den).tolist())
        return pa.table({
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "term": pa.array(out["term"], pa.string()),
            "tf": pa.array(out["tf"], pa.int64()),
            "dl": pa.array(out["dl"], pa.int64()),
            "score_e6": pa.array(out["score_e6"], pa.int64())})

    return stats.map_batches(_score, batch_format="pyarrow")


BM25_SQL = """
WITH tok AS MATERIALIZED (
    SELECT doc_id, t.term
    FROM documents, unnest(string_split(text, ' ')) AS t(term)
    WHERE t.term <> ''
),
dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY 1),
g AS (SELECT CAST(sum(dl) AS BIGINT) AS total_len,
             CAST(count(*) AS BIGINT) AS n FROM dl),
tf AS (
    SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
    FROM tok WHERE term IN ('merge', 'join', 'sort', 'scan')
    GROUP BY 1, 2
),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1)
SELECT tf.doc_id, tf.term, tf.tf, dl.dl,
       CAST((CAST(g.n - df.df AS HUGEINT) * 44 * g.total_len
             * tf.tf * 1000000)
            // (CAST(df.df AS HUGEINT)
                * (20 * g.total_len * tf.tf + 6 * g.total_len
                   + 18 * dl.dl * g.n)) AS BIGINT) AS score_e6
FROM tf
JOIN dl USING (doc_id)
JOIN df USING (term)
CROSS JOIN g
"""


def q_roaring_postings_docs(sf_dir: str):
    """Roaring-container posting compression
    (``stages/postings.py:roaring_postings``): per corpus token the
    container count/kinds, the REAL serialized size (2^16-wide
    containers: uint16 array under 4096 ids, 8 KiB bitmap above,
    8-byte headers), and the sum of doc ids recovered by DECODING the
    payloads — the roundtrip is load-bearing against the oracle's
    direct ``sum(doc_id)``. One hash(token) shuffle; the codec is
    whole-partition vectorized (``functions/roaring.py``)."""
    from ...stages.postings import roaring_postings

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"]).repartition(8)
    return roaring_postings(ds, num_partitions=8)


ROARING_POSTINGS_SQL = """
WITH w AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS token
    FROM documents
),
f AS (SELECT DISTINCT doc_id, token FROM w WHERE token <> ''),
c AS (
    SELECT token, doc_id // 65536 AS high,
           CAST(count(*) AS BIGINT) AS card,
           CAST(sum(doc_id) AS BIGINT) AS s
    FROM f GROUP BY 1, 2
)
SELECT token, CAST(sum(card) AS BIGINT) AS df,
       CAST(count(*) AS BIGINT) AS n_containers,
       CAST(sum(CASE WHEN card >= 4096 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_bitmap,
       CAST(sum(8 + CASE WHEN card >= 4096
                         THEN 8192 ELSE 2 * card END) AS BIGINT)
           AS roaring_bytes,
       CAST(sum(s) AS BIGINT) AS decoded_sum
FROM c GROUP BY token
"""


#: fixed query phrase for ``phrase_search_docs`` — consecutive-token
#: match; literal in BOTH the engine and the oracle
PHRASE = ("merge", "join")


def q_phrase_search_docs(sf_dir: str):
    """Exact phrase search (``stages/postings.py:phrase_search``): every
    document containing the consecutive bigram ``PHRASE``, with its
    occurrence count (all starting positions, overlaps included) and
    first 1-based position over the raw whitespace split. One shuffle-
    free map: equality scans per phrase word AND-ed under shifts, doc
    boundaries masked via list offsets."""
    from ...stages.postings import phrase_search

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"]).repartition(4)
    return phrase_search(ds, PHRASE)


PHRASE_SEARCH_SQL = """
WITH d AS (
    SELECT doc_id, string_split(text, ' ') AS arr FROM documents
),
p AS (
    SELECT doc_id, t.i
    FROM d, LATERAL unnest(generate_series(1, len(arr) - 1)) AS t(i)
    WHERE arr[i] = 'merge' AND arr[i + 1] = 'join'
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_occ,
       CAST(min(i) AS BIGINT) AS first_pos
FROM p GROUP BY doc_id
"""
