"""Round-5 continuation operators: link prediction, varint posting
compression, k-center selection — each replayed against an independent
brute-force oracle on seeded data (partitioning must not change any
value)."""

import numpy as np
import pandas as pd
import pytest

from tsdownsample_ray.functions.varint import (
    varint_byte_lengths,
    varint_decode,
    varint_encode,
)


def test_varint_roundtrip_and_lengths():
    rng = np.random.default_rng(3)
    vals = np.concatenate([
        np.array([0, 1, 127, 128, 16383, 16384, 2**28 - 1, 2**28,
                  2**35, 2**56, 2**63 - 1, 2**64 - 1], np.uint64),
        rng.integers(0, 2**45, 5000).astype(np.uint64)])
    buf, lens = varint_encode(vals)
    assert int(lens.sum()) == len(buf)
    assert np.array_equal(varint_decode(buf), vals)
    for v, ln in zip(vals.tolist(), lens.tolist()):
        expect = max(1, -(-max(v, 1).bit_length() // 7))
        assert ln == expect, v
    assert np.array_equal(varint_byte_lengths(vals), lens)


def test_varint_empty():
    buf, lens = varint_encode(np.array([], np.uint64))
    assert len(buf) == 0 and len(lens) == 0
    assert len(varint_decode(np.array([], np.uint8))) == 0


def test_varint_postings_matches_bruteforce(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.postings import varint_postings

    rng = np.random.default_rng(11)
    vocab = [f"t{i}" for i in range(17)]
    rows = [{"doc_id": int(d),
             "text": " ".join(rng.choice(vocab,
                                          rng.integers(1, 12)))}
            for d in rng.permutation(400)]
    ds = rd.from_pandas(pd.DataFrame(rows)).repartition(7)
    out = varint_postings(ds, num_partitions=3).to_pandas() \
        .sort_values("token").reset_index(drop=True)

    # brute force: distinct (token, doc) pairs, python-int LEB128
    def nbytes(v):
        n = 1
        while v >= 128:
            v >>= 7
            n += 1
        return n

    posting = {}
    for r in rows:
        for t in r["text"].split(" "):
            if t:
                posting.setdefault(t, set()).add(r["doc_id"])
    assert sorted(posting) == out["token"].tolist()
    for _, row in out.iterrows():
        docs = sorted(posting[row.token])
        gaps = [docs[0] + 1] + [b - a for a, b in zip(docs, docs[1:])]
        assert row.df == len(docs)
        assert row.plain_bytes == 8 * len(docs)
        assert row.varint_bytes == sum(nbytes(g) for g in gaps)
        assert row.decoded_sum == sum(docs)


def test_link_prediction_matches_bruteforce(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.graph import link_prediction

    rng = np.random.default_rng(5)
    n = 60
    src = rng.integers(0, n, 250)
    dst = rng.integers(0, n, 250)
    ds = rd.from_pandas(pd.DataFrame({"src": src, "dst": dst})) \
        .repartition(5)
    out = link_prediction(ds, num_partitions=2, fanin=2, min_common=2) \
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)

    edges = {(min(a, b), max(a, b)) for a, b in zip(src, dst) if a != b}
    nbrs = {}
    for a, b in edges:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    expect = []
    ids = sorted(nbrs)
    for i, u in enumerate(ids):
        for w in ids[i + 1:]:
            if (u, w) in edges:
                continue
            common = len(nbrs[u] & nbrs[w])
            if common < 2:
                continue
            union = len(nbrs[u] | nbrs[w])
            expect.append({
                "a": u, "b": w, "common_neighbors": common,
                "jaccard_e6": common * 1_000_000 // union,
                "pref_attachment": len(nbrs[u]) * len(nbrs[w])})
    exp = pd.DataFrame(expect).sort_values(["a", "b"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out.astype(np.int64), exp.astype(np.int64))


def test_kcenter_matches_bruteforce(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tsdownsample_ray.pipelines.queries.ext_round5 import (
        q_kcenter_select_embeddings,
    )

    rng = np.random.default_rng(9)
    n, d, k = 40, 6, 5
    emb = rng.normal(size=(n, d)).astype(np.float32)
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array(list(emb), pa.list_(pa.float32())),
        "label": pa.array(np.zeros(n, np.int32))}),
        tmp_path / "embeddings.parquet")

    out = q_kcenter_select_embeddings(str(tmp_path), k=k).to_pandas()

    V = np.trunc(emb.astype(np.float64) * 1000).astype(np.int64)
    selected = [0]
    mind = np.einsum("ij,ij->i", V - V[0], V - V[0])
    mind[0] = -1  # selected sentinel
    expect = [(1, 0, 0)]
    for r in range(2, k + 1):
        best = np.lexsort((np.arange(n), -mind))[0]
        expect.append((r, int(best), int(mind[best])))
        selected.append(best)
        dd = np.einsum("ij,ij->i", V - V[best], V - V[best])
        mind = np.minimum(mind, dd)
        mind[best] = -1
    exp = pd.DataFrame(expect, columns=["rank", "vec_id", "mindist"])
    pd.testing.assert_frame_equal(out.astype(np.int64),
                                  exp.astype(np.int64))
