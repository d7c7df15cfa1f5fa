"""Round-5 session-3 wave, part 4: semi-hard TRIPLET MINING over the
labeled embedding table (the contrastive-training data-prep step) and
exact exponential TIME-DECAY activity scoring (the feature-store
freshness aggregate, bit-exact through integer right shifts).
"""
from __future__ import annotations

import numpy as np

from ._shared import _read_parquet_clean, pa, pc

_TRIP_NA = 16            # anchor subset (vec_id < _TRIP_NA)
_TRIP_K = 1 << 20        # vec_id radix in the packed argmax
_DAY_US = 86_400 * 1_000_000


def q_triplet_margin_embeddings(sf_dir: str):
    """Hardest-positive / hardest-negative triplet mining per anchor —
    the data-prep pass of contrastive training: for each of the 16
    anchor vectors, the same-label vector with the MAX integer-e3 dot
    product and the different-label vector with the MAX dot (ties to
    the smaller vec_id), plus the margin between them. The corpus side
    runs distributed: each batch computes one (rows x 64) @ (64 x 16)
    int matmul against the broadcast anchor matrix and emits only its
    per-(anchor, side) best row packed as ``dot * 2^20 + (2^20-1 -
    vec_id)`` (<= 32 rows per block); a hashpart grouped-min over the
    NEGATED pack is the global argmax — exactly SQL's ``ORDER BY dot
    DESC, vec_id ASC LIMIT 1``. Anchors lacking a positive or negative
    candidate are dropped on both sides (inner-join semantics)."""
    import pyarrow.parquet as _pq

    from ...stages.graph import grouped_sum_parts
    from ...stages.rollup import grouped_min_parts

    t = _pq.read_table(f"{sf_dir}/embeddings.parquet",
                       columns=["vec_id", "embedding", "label"])
    at = t.filter(pc.less(t["vec_id"], _TRIP_NA))
    at = at.take(pc.sort_indices(at, sort_keys=[("vec_id", "ascending")]))
    A = np.trunc(np.array(at["embedding"].to_pylist(), np.float64)
                 * 1000).astype(np.int64)
    a_ids = at["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    a_lab = at["label"].to_numpy(zero_copy_only=False).astype(np.int64)

    ds = _read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding", "label"])

    def _best(b: pa.Table) -> pa.Table:
        emb = b["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        m = np.trunc(emb.values.to_numpy(zero_copy_only=False)
                     .reshape(-1, 64).astype(np.float64) * 1000) \
            .astype(np.int64)
        ids = b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lab = b["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        if ids.max(initial=0) >= _TRIP_K:
            raise ValueError("vec_id overflows the triplet pack")
        dots = m @ A.T                       # (rows, n_anchors)
        pack = dots * _TRIP_K + (_TRIP_K - 1 - ids)[:, None]
        self_mask = ids[:, None] == a_ids[None, :]
        pos = (lab[:, None] == a_lab[None, :]) & ~self_mask
        neg = (lab[:, None] != a_lab[None, :])
        out_a, out_s, out_p = [], [], []
        for side, mask in ((0, pos), (1, neg)):
            masked = np.where(mask, pack, np.iinfo(np.int64).min)
            best = masked.max(axis=0)
            ok = mask.any(axis=0)
            out_a.extend(a_ids[ok].tolist())
            out_s.extend([side] * int(ok.sum()))
            out_p.extend((-best[ok]).tolist())   # negate: grouped MIN
        return pa.table({"anchor": pa.array(out_a, pa.int64()),
                         "side": pa.array(out_s, pa.int64()),
                         "neg_pack": pa.array(out_p, pa.int64())})

    partials = ds.map_batches(_best, batch_format="pyarrow")
    mins = grouped_min_parts(partials, ["anchor", "side"], ["neg_pack"],
                             fanin=4)

    def _pivot_rows(b: pa.Table) -> pa.Table:
        packv = pc.multiply(b["neg_pack"], pa.scalar(-1, pa.int64()))
        dot = pc.if_else(
            pc.less(packv, 0),
            pc.divide(pc.subtract(packv,
                                  pa.scalar(_TRIP_K - 1, pa.int64())),
                      pa.scalar(_TRIP_K, pa.int64())),
            pc.divide(packv, pa.scalar(_TRIP_K, pa.int64())))
        vid = pc.subtract(
            pa.scalar(_TRIP_K - 1, pa.int64()),
            pc.subtract(packv, pc.multiply(dot, pa.scalar(_TRIP_K,
                                                          pa.int64()))))
        is_pos = pc.equal(b["side"], 0)
        z = pa.scalar(0, pa.int64())

        def _side(val, want_pos):
            cond = is_pos if want_pos else pc.invert(is_pos)
            return pc.if_else(cond, val, z)

        one = pa.scalar(1, pa.int64())
        return pa.table({
            "anchor": b["anchor"],
            "pos_id": _side(vid, True), "dot_pos": _side(dot, True),
            "neg_id": _side(vid, False), "dot_neg": _side(dot, False),
            "has_pos": pc.if_else(is_pos, one, z),
            "has_neg": pc.if_else(is_pos, z, one),
        })

    summed = grouped_sum_parts(
        mins.map_batches(_pivot_rows, batch_format="pyarrow"),
        ["anchor"], ["pos_id", "dot_pos", "neg_id", "dot_neg",
                     "has_pos", "has_neg"], count_col=None, fanin=2)

    def _final(b: pa.Table) -> pa.Table:
        both = pc.and_(pc.equal(b["has_pos"], 1), pc.equal(b["has_neg"], 1))
        t2 = b.filter(both)
        return pa.table({
            "anchor": t2["anchor"], "pos_id": t2["pos_id"],
            "neg_id": t2["neg_id"], "dot_pos": t2["dot_pos"],
            "dot_neg": t2["dot_neg"],
            "margin": pc.subtract(t2["dot_pos"], t2["dot_neg"])})

    return summed.map_batches(_final, batch_format="pyarrow")


TRIPLET_SQL = f"""
WITH v AS (
    SELECT vec_id, label,
           list_transform(embedding,
               x -> CAST(trunc(x * 1000) AS BIGINT)) AS q
    FROM embeddings
),
a AS (SELECT * FROM v WHERE vec_id < {_TRIP_NA}),
d AS (
    SELECT a.vec_id AS anchor, v.vec_id AS cand,
           CAST(a.label = v.label AS BIGINT) AS same,
           CAST(sum(a.q[i + 1] * v.q[i + 1]) AS BIGINT) AS dot
    FROM a JOIN v ON v.vec_id <> a.vec_id,
         unnest(range(64)) r(i)
    GROUP BY 1, 2, 3
),
r AS (
    SELECT anchor, cand, same, dot,
           row_number() OVER (PARTITION BY anchor, same
                              ORDER BY dot DESC, cand ASC) AS rn
    FROM d
)
SELECT p.anchor, p.cand AS pos_id, n.cand AS neg_id,
       p.dot AS dot_pos, n.dot AS dot_neg,
       p.dot - n.dot AS margin
FROM (SELECT * FROM r WHERE same = 1 AND rn = 1) p
JOIN (SELECT * FROM r WHERE same = 0 AND rn = 1) n USING (anchor)
"""


def q_decayed_activity_users(sf_dir: str):
    """Exponential time-decay activity score per user — the
    feature-store freshness aggregate — kept BIT-EXACT by doing the
    decay as an integer right shift: each event contributes
    ``1e6 >> min(age_days, 62)`` micro-units where age is measured
    from the corpus max timestamp (one documented scalar driver read,
    broadcast into the map). Half-life = 1 day, exact at every
    magnitude — no float pow on either side. One hashpart grouped sum;
    also emits the event count and the most recent age."""
    import pyarrow.parquet as _pq

    from ...stages.graph import grouped_sum_parts

    ev = _read_parquet_clean(f"{sf_dir}/events.parquet",
                             columns=["user_id", "ts"])
    # corpus max ts from parquet ROW-GROUP STATISTICS (zero data read);
    # falls back to a single-column scan only when stats are absent
    pf = _pq.ParquetFile(f"{sf_dir}/events.parquet")
    ts_idx = pf.schema_arrow.names.index("ts")
    maxes = []
    for rg in range(pf.metadata.num_row_groups):
        st = pf.metadata.row_group(rg).column(ts_idx).statistics
        if st is None or not st.has_min_max:
            maxes = []
            break
        maxes.append(st.max)
    if maxes:
        mx = int(pa.scalar(max(maxes), pa.timestamp("us"))
                 .cast(pa.int64()).as_py())
    else:
        mx = int(pc.max(_pq.read_table(f"{sf_dir}/events.parquet",
                                       columns=["ts"])["ts"])
                 .cast(pa.int64()).as_py())

    def _decay(b: pa.Table) -> pa.Table:
        ts = pc.cast(b["ts"], pa.int64())
        age = pc.divide(pc.subtract(pa.scalar(mx, pa.int64()), ts),
                        pa.scalar(_DAY_US, pa.int64()))
        a = pc.min_element_wise(age, pa.scalar(62, pa.int64()))
        an = a.to_numpy(zero_copy_only=False).astype(np.int64)
        score = (np.int64(1_000_000) >> an)
        return pa.table({"user_id": b["user_id"],
                         "decayed_e6": pa.array(score),
                         "min_age": age})

    scored = ev.map_batches(_decay, batch_format="pyarrow").materialize()
    # materialized: scored feeds both the sum and the min reduction —
    # unmaterialized, the events read + decay map would execute twice
    from ...stages.rollup import grouped_min_parts

    sums = grouped_sum_parts(
        scored.map_batches(lambda b: b.select(["user_id", "decayed_e6"]),
                           batch_format="pyarrow"),
        ["user_id"], ["decayed_e6"], count_col="n_events", fanin=4)
    mins = grouped_min_parts(
        scored.map_batches(lambda b: b.select(["user_id", "min_age"]),
                           batch_format="pyarrow"),
        ["user_id"], ["min_age"], fanin=4)

    from ...stages.joins import hash_inner_join

    def _ren(b: pa.Table) -> pa.Table:
        return b.rename_columns(["user_id", "last_age_days"])

    return hash_inner_join(sums, mins.map_batches(_ren,
                                                  batch_format="pyarrow"),
                           on="user_id", num_partitions=4)


DECAYED_SQL = """
WITH m AS (SELECT max(epoch_us(ts)) AS mx FROM events)
SELECT user_id,
       CAST(sum(1000000 >> least((mx - epoch_us(ts)) // 86400000000,
                                 62)) AS BIGINT) AS decayed_e6,
       count(*) AS n_events,
       CAST(min((mx - epoch_us(ts)) // 86400000000) AS BIGINT)
           AS last_age_days
FROM events, m
GROUP BY user_id
"""
