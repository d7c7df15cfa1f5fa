"""Product quantization (stages/similarity.py:pq_recall): ADC top-1 vs
a literal driver-side replay, across partitionings."""

import numpy as np
import pyarrow as pa
import pytest

from tsdownsample_ray.stages.similarity import kmeans_integer, pq_recall

ray = pytest.importorskip("ray")
import ray.data as rd  # noqa: E402


def _vecs(rng, n=60, d=16):
    return rng.normal(size=(n, d)).astype(np.float32)


def _mk(V):
    return pa.table({
        "vec_id": pa.array(np.arange(len(V), dtype=np.int64)),
        "embedding": pa.array([list(map(float, v)) for v in V],
                              pa.list_(pa.float64()))})


@pytest.mark.parametrize("nparts", [1, 4])
def test_pq_matches_replay(ray_session, nparts):
    rng = np.random.default_rng(13)
    V = _vecs(rng)
    n_sub, k, updates, scale, nq = 4, 3, 1, 1000, 5
    ds = rd.from_arrow(_mk(V)).repartition(nparts)
    got = pq_recall(ds, n_sub=n_sub, k=k, updates=updates, scale=scale,
                    n_queries=nq, num_partitions=2).to_pandas() \
        .sort_values("qid").reset_index(drop=True)

    # literal replay: same integer kmeans per subspace (reuse the
    # pytest-pinned kmeans via centroids_only), then brute ADC / exact
    Q = np.trunc(V.astype(np.float64) * scale).astype(np.int64)
    d = Q.shape[1]
    dsub = d // n_sub

    def d2(A, B):
        return ((A[:, None, :] - B[None, :, :]) ** 2).sum(axis=2)

    books = []
    for s in range(n_sub):
        sub_ds = rd.from_arrow(_mk(V[:, s * dsub:(s + 1) * dsub]))
        books.append(kmeans_integer(sub_ds, k=k, updates=updates,
                                    scale=scale, centroids_only=True))
    ids = np.arange(len(V))
    adc = np.zeros((len(V), nq), np.int64)
    for s in range(n_sub):
        sub = Q[:, s * dsub:(s + 1) * dsub]
        codes = np.argmin(d2(sub, books[s]), axis=1)
        lut = d2(Q[:nq, s * dsub:(s + 1) * dsub], books[s])
        adc += lut[:, codes].T
    exact = d2(Q, Q[:nq])
    big = np.iinfo(np.int64).max
    for j in range(nq):
        adc[j, j] = big
        exact[j, j] = big
    assert len(got) == nq
    for j in range(nq):
        aj = np.lexsort((ids, adc[:, j]))[0]
        ej = np.lexsort((ids, exact[:, j]))[0]
        r = got.iloc[j]
        assert (r["qid"], r["adc_id"], r["adc_d2"], r["exact_id"],
                r["exact_d2"], r["hit"]) == \
            (j, ids[aj], adc[aj, j], ids[ej], exact[ej, j],
             int(ids[aj] == ids[ej]))


def test_pq_validation(ray_session):
    rng = np.random.default_rng(1)
    ds = rd.from_arrow(_mk(_vecs(rng, n=10, d=10)))
    with pytest.raises(ValueError, match="divisible"):
        pq_recall(ds, n_sub=4, n_queries=2).to_pandas()
