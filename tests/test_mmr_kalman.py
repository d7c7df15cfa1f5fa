"""MMR diversified selection and the fixed-point Kalman filter."""

import duckdb
import numpy as np


def test_mmr_greedy_replay(ray_session):
    from tsdownsample_ray.pipelines.queries import q_mmr_select_embeddings

    sf = "/root/testdata/sf0.001"
    out = q_mmr_select_embeddings(sf).to_pandas().sort_values("rank")
    # exact python replay
    df = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{sf}/embeddings.parquet'").df()
    ids = df.vec_id.to_numpy().astype(np.int64)
    E = np.trunc(np.stack(df.embedding.to_numpy()).astype(np.float64)
                 * 1000).astype(np.int64)
    qv = E[ids == 7][0]
    keep = ids != 7
    ids, E = ids[keep], E[keep]
    qsim = E @ qv
    order = np.lexsort((ids, -qsim))[:50]
    ids, qsim, E = ids[order], qsim[order], E[order]
    red = np.zeros(len(ids), dtype=np.int64)
    alive = np.ones(len(ids), dtype=bool)
    want = []
    for k in range(1, 11):
        cand = np.flatnonzero(alive)
        w = cand[np.lexsort((ids[cand], -(qsim - red)[cand]))[0]]
        want.append((k, int(ids[w]), int(qsim[w]), int(red[w])))
        alive[w] = False
        red = np.maximum(red, E @ E[w])
    got = [tuple(int(v) for v in r)
           for r in out[["rank", "vec_id", "qsim",
                         "redundancy"]].itertuples(index=False)]
    assert got == want
    # rank-1 is the max-relevance pick; later picks trade off redundancy
    assert got[0][3] == 0
    assert len({g[1] for g in got}) == 10


def test_kalman_replay_and_convergence(ray_session):
    from tsdownsample_ray.pipelines.queries import q_kalman_1h

    sf = "/root/testdata/sf0.001"
    out = (q_kalman_1h(sf).to_pandas()
           .sort_values(["series_id", "bucket"]))
    H = 3_600_000_000
    df = duckdb.sql(f"""
        SELECT event_type s, epoch_us(ts)//{H}*{H} b,
               CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) y
        FROM '{sf}/events.parquet' GROUP BY 1, 2 ORDER BY 1, 2
    """).df()
    E6 = 1_000_000
    for s, g in df.groupby("s"):
        got = out[out.series_id == s]
        x = p = 0
        want_x, want_k = [], []
        for i, v in enumerate(int(v) for v in g.y):
            if i == 0:
                x, p, k = v * E6, 9 * E6, 0
            else:
                p += E6
                k = (p * E6) // (p + 9 * E6)
                sgn = k * (v * E6 - x)
                x += abs(sgn) // E6 if sgn >= 0 else -(abs(sgn) // E6)
                p = ((E6 - k) * p) // E6
            want_x.append(x)
            want_k.append(k)
        assert got.x_e6.tolist() == want_x
        assert got.k_e6.tolist() == want_k
        # gain converges to the steady-state Wiener gain for q/r = 1/9:
        # k* = (sqrt(q^2+4qr) - q) / 2r = (sqrt(37)-1)/18 ~ 0.28237
        assert abs(want_k[-1] / E6 - 0.28237) < 2e-3


def test_expectations_clean_fixture(ray_session):
    from tsdownsample_ray.pipelines.queries import q_expectations_events

    sf = "/root/testdata/sf0.001"
    out = (q_expectations_events(sf).to_pandas().set_index("check"))
    assert set(out.index) == {"id_unique", "value_in_range",
                              "type_in_set", "user_nonnull",
                              "ts_monotonic_id"}
    n = duckdb.sql(
        f"SELECT count(*) FROM '{sf}/events.parquet'").fetchone()[0]
    assert (out.n_rows == n).all()
    # the synthetic fixture is clean on ids/types/users
    assert out.loc["id_unique", "n_violations"] == 0
    assert out.loc["type_in_set", "n_violations"] == 0
    assert out.loc["user_nonnull", "n_violations"] == 0
    # range violations replay exactly
    want = duckdb.sql(
        f"SELECT count(*) FROM '{sf}/events.parquet' "
        "WHERE value <= 0 OR value > 300").fetchone()[0]
    assert out.loc["value_in_range", "n_violations"] == want


def test_huffman_kraft_and_optimality(ray_session):
    from tsdownsample_ray.pipelines.queries import q_huffman_code_docs

    out = q_huffman_code_docs("/root/testdata/sf0.001").to_pandas()
    assert len(out) == 27
    # Kraft equality for a full binary tree
    assert sum(0.5 ** l for l in out.code_len) == 1.0
    # higher frequency never gets a strictly longer code
    s = out.sort_values(["freq"], ascending=False).reset_index()
    assert (s.code_len.diff().dropna() >= 0).all()
    # total bits beat the fixed-width 5-bit baseline
    assert out.total_bits.iloc[0] < 5 * out.freq.sum()


def test_dtw_properties(ray_session):
    from tsdownsample_ray.pipelines.queries import q_dtw_pairs_1d

    out = q_dtw_pairs_1d("/root/testdata/sf0.001").to_pandas()
    assert len(out) == 10  # C(5,2)
    # warping can only help: dtw <= unwarped L1 (same-length series)
    assert (out.dtw <= out.l1).all()
    assert (out.dtw > 0).all()
    assert (out.n == 30).all() and (out.m == 30).all()
    # self-distance sanity via a tiny direct call on equal inputs is
    # covered by dtw <= l1 == 0 iff series equal; here all distinct
    assert (out.a < out.b).all()


def test_dbscan_properties(ray_session):
    from tsdownsample_ray.pipelines.queries import q_dbscan_embeddings

    out = q_dbscan_embeddings("/root/testdata/sf0.001").to_pandas()
    assert len(out) == 500
    core = out[out.is_core == 1]
    noise = out[out.is_core == 0]
    assert len(core) > 20 and len(noise) > 100  # real structure
    # every core has a cluster label <= its own id; noise has none
    assert core.cluster.notna().all()
    assert (core.cluster <= core.vec_id).all()
    assert noise.cluster.isna().all()
    # cluster label is itself a core id of the same cluster
    cids = set(core.vec_id)
    assert set(core.cluster.astype(int)) <= cids
    # degrees consistent with coreness
    assert (core.deg >= 5).all() and (noise.deg < 5).all()
