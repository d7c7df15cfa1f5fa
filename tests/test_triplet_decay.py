"""Batch-D ops: triplet mining (negative-dot pack/unpack, argmax
tie-break) and exact shift-decay scoring."""

import duckdb
import numpy as np


def test_triplet_matches_bruteforce(ray_session):
    from tsdownsample_ray.pipelines.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    out = QUERIES["triplet_margin_embeddings"](sf).to_pandas() \
        .sort_values("anchor").reset_index(drop=True)

    rows = duckdb.sql(f"""
        SELECT vec_id, label, embedding
        FROM '{sf}/embeddings.parquet' ORDER BY vec_id""").fetchall()
    ids = np.array([r[0] for r in rows], np.int64)
    lab = np.array([r[1] for r in rows], np.int64)
    Q = np.trunc(np.array([r[2] for r in rows], np.float64) * 1000) \
        .astype(np.int64)
    n_a = 16
    for _, r in out.iterrows():
        a = int(r.anchor)
        dots = Q @ Q[a]
        # positives / negatives exclude the anchor itself
        for side, want_id, want_dot in (("pos", r.pos_id, r.dot_pos),
                                        ("neg", r.neg_id, r.dot_neg)):
            if side == "pos":
                mask = (lab == lab[a]) & (ids != a)
            else:
                mask = lab != lab[a]
            # max dot, ties -> min vec_id
            cand = np.flatnonzero(mask)
            best = cand[np.lexsort((ids[cand], -dots[cand]))][0]
            assert int(want_id) == int(ids[best]), (a, side)
            assert int(want_dot) == int(dots[best]), (a, side)
        assert r.margin == r.dot_pos - r.dot_neg
    assert len(out) <= n_a


def test_triplet_pack_handles_negative_dots():
    """Pure pack/unpack property over random signed dots."""
    K = 1 << 20
    rng = np.random.default_rng(17)
    dot = rng.integers(-10**9, 10**9, 1000)
    vid = rng.integers(0, K, 1000)
    packv = dot * K + (K - 1 - vid)

    def tdiv(a, b):  # pyarrow pc.divide: integer TRUNCATION toward zero
        return np.sign(a) * (np.abs(a) // b)

    rec_dot = np.where(packv < 0, tdiv(packv - (K - 1), K), tdiv(packv, K))
    rec_vid = (K - 1) - (packv - rec_dot * K)
    assert (rec_dot == dot).all()
    assert (rec_vid == vid).all()


def test_decayed_activity_vs_duckdb(ray_session):
    from tsdownsample_ray.pipelines.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    out = QUERIES["decayed_activity_users"](sf).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    exp = duckdb.sql(f"""
        WITH m AS (SELECT max(epoch_us(ts)) AS mx
                   FROM '{sf}/events.parquet')
        SELECT user_id,
               sum(1000000 >> least((mx - epoch_us(ts)) // 86400000000,
                                    62)) AS decayed_e6,
               count(*) AS n_events,
               min((mx - epoch_us(ts)) // 86400000000) AS last_age_days
        FROM '{sf}/events.parquet', m GROUP BY 1 ORDER BY 1
    """).df()
    assert len(out) == len(exp)
    for c in ("decayed_e6", "n_events", "last_age_days"):
        assert (out[c].to_numpy().astype(np.int64)
                == exp[c].to_numpy().astype(np.int64)).all(), c
    # the freshest user decays least: score bounded by 1e6 * n_events
    assert (out.decayed_e6 <= 1_000_000 * out.n_events).all()
