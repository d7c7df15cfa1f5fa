"""Blocked exact-neighbor ops: mutual NN pairs, kth-NN outliers."""

import numpy as np
import pyarrow as pa


def _emb_table(n=60, d=6, labels=3, seed=11):
    rng = np.random.default_rng(seed)
    E = rng.normal(size=(n, d)).astype(np.float32)
    lab = (np.arange(n) % labels).astype(np.int32)
    return pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(E.reshape(-1), pa.float32()), d),
        "label": pa.array(lab, pa.int32())}), E, lab.astype(np.int64)


def _d2(Q):
    qq = np.einsum("ij,ij->i", Q, Q)
    return qq[:, None] + qq[None, :] - 2 * (Q @ Q.T)


def test_mutual_nn_matches_numpy(ray_session):
    import ray

    from tsdownsample_ray.stages.neighbors import mutual_nn_pairs

    tbl, E, lab = _emb_table()
    Q = np.trunc(E.astype(np.float64) * 1000).astype(np.int64)
    expect = set()
    for l in np.unique(lab):
        ids = np.flatnonzero(lab == l)
        D = _d2(Q[ids])
        np.fill_diagonal(D, np.iinfo(np.int64).max)
        nn = np.argmin(D, axis=1)
        for i in range(len(ids)):
            j = nn[i]
            if nn[j] == i and i < j:
                expect.add((ids[i], ids[j], l, D[i, j]))

    for nparts in (1, 4):
        ds = ray.data.from_arrow(tbl).repartition(nparts)
        out = mutual_nn_pairs(ds).to_pandas()
        got = set(zip(out["a"], out["b"], out["label"], out["d2"]))
        assert got == expect and len(out) == len(expect)


def test_kth_nn_outliers_match_numpy(ray_session):
    import ray

    from tsdownsample_ray.stages.neighbors import kth_nn_distance

    tbl, E, lab = _emb_table(n=45, labels=2, seed=4)
    Q = np.trunc(E.astype(np.float64) * 1000).astype(np.int64)
    k, top = 5, 4
    expect = []
    for l in np.unique(lab):
        ids = np.flatnonzero(lab == l)
        D = _d2(Q[ids])
        np.fill_diagonal(D, np.iinfo(np.int64).max)
        d2k = np.partition(D, k - 1, axis=1)[:, k - 1]
        order = np.lexsort((ids, -d2k))[:top]
        for r, i in enumerate(order):
            expect.append((ids[i], l, d2k[i], r + 1))

    ds = ray.data.from_arrow(tbl).repartition(3)
    out = (kth_nn_distance(ds, k=k, top=top).to_pandas()
           .sort_values(["label", "rk"]).reset_index(drop=True))
    got = list(zip(out["vec_id"], out["label"], out["d2k"], out["rk"]))
    assert sorted(got, key=lambda t: (t[1], t[3])) == sorted(
        expect, key=lambda t: (t[1], t[3]))


def test_kth_nn_small_group_empty(ray_session):
    import ray

    from tsdownsample_ray.stages.neighbors import kth_nn_distance

    tbl, _, _ = _emb_table(n=4, labels=1)
    ds = ray.data.from_arrow(tbl)
    out = kth_nn_distance(ds, k=5, top=3).to_pandas()
    assert len(out) == 0
