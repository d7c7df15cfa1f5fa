"""Roaring-container postings + phrase search: codec roundtrip across
both container kinds (the corpus oracle only exercises array
containers), brute-force replays, partitioning invariance."""

import numpy as np
import pandas as pd
import pytest

from tsdownsample_ray.functions.roaring import (
    ARRAY_CONTAINER_MAX,
    decode_container_sums,
    encode_containers,
)


def _ref_containers(tok_codes, ids):
    out = []
    for t in sorted(set(tok_codes.tolist())):
        sel = ids[tok_codes == t]
        for h in sorted(set((sel >> 16).tolist())):
            vals = sel[(sel >> 16) == h]
            out.append((t, h, len(vals), int(vals.sum())))
    return out


def test_roaring_roundtrip_mixed_containers():
    rng = np.random.default_rng(5)
    # token 0: dense container (card >= 4096 in one 2^16 range) ->
    # bitmap; token 1: sparse across several highs -> arrays; token 2:
    # one dense + one sparse container
    t0 = np.sort(rng.choice(65536, 6000, replace=False))
    t1 = np.sort(rng.choice(1 << 20, 300, replace=False))
    t2 = np.sort(np.concatenate([
        rng.choice(65536, ARRAY_CONTAINER_MAX, replace=False),
        65536 + rng.choice(65536, 10, replace=False)]))
    ids = np.concatenate([t0, t1, t2]).astype(np.int64)
    toks = np.concatenate([np.zeros(len(t0), np.int64),
                           np.ones(len(t1), np.int64),
                           np.full(len(t2), 2, np.int64)])
    meta, lows, bitmaps = encode_containers(toks, ids)
    assert meta["is_bitmap"].sum() == 2  # t0 dense + t2's first
    sums = decode_container_sums(meta, lows, bitmaps)
    ref = _ref_containers(toks, ids)
    assert len(ref) == len(sums)
    for (rt, rh, rc, rs), mt, mh, mc, ms in zip(
            ref, meta["tok"], meta["high"], meta["card"], sums):
        assert (rt, rh, rc, rs) == (mt, mh, mc, ms)


def test_roaring_empty():
    meta, lows, bitmaps = encode_containers(
        np.empty(0, np.int64), np.empty(0, np.int64))
    assert len(decode_container_sums(meta, lows, bitmaps)) == 0


def test_roaring_postings_matches_bruteforce(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.postings import roaring_postings

    rng = np.random.default_rng(13)
    vocab = [f"w{i}" for i in range(9)]
    rows = [{"doc_id": int(d),
             "text": " ".join(rng.choice(vocab, rng.integers(1, 9)))}
            for d in rng.permutation(500)]
    ds = rd.from_pandas(pd.DataFrame(rows)).repartition(7)
    out = roaring_postings(ds, num_partitions=3).to_pandas() \
        .sort_values("token").reset_index(drop=True)
    pairs = {}
    for r in rows:
        for t in r["text"].split(" "):
            if t:
                pairs.setdefault(t, set()).add(r["doc_id"])
    for r in out.itertuples():
        docs = pairs[r.token]
        highs = {d >> 16 for d in docs}  # all < 2^16 here -> 1 container
        assert r.df == len(docs)
        assert r.n_containers == len(highs) == 1
        assert r.n_bitmap == 0
        assert r.roaring_bytes == 8 + 2 * len(docs)
        assert r.decoded_sum == sum(docs)
    assert set(out.token) == set(pairs)


def test_phrase_search_matches_bruteforce(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.postings import phrase_search

    rng = np.random.default_rng(21)
    vocab = ["a", "b", "c", "d"]
    rows = [{"doc_id": i,
             "text": " ".join(rng.choice(vocab, rng.integers(1, 30)))}
            for i in range(400)]
    rows.append({"doc_id": 400, "text": "a b a b a b"})  # overlaps
    rows.append({"doc_id": 401, "text": "a"})            # shorter than w
    rows.append({"doc_id": 402, "text": "b a"})          # wrong order
    ds = rd.from_pandas(pd.DataFrame(rows)).repartition(5)
    out = phrase_search(ds, ("a", "b")).to_pandas() \
        .set_index("doc_id").sort_index()

    exp = {}
    for r in rows:
        toks = r["text"].split(" ")
        hits = [i + 1 for i in range(len(toks) - 1)
                if toks[i] == "a" and toks[i + 1] == "b"]
        if hits:
            exp[r["doc_id"]] = (len(hits), hits[0])
    assert set(out.index) == set(exp)
    for d, (n, p) in exp.items():
        assert (out.loc[d, "n_occ"], out.loc[d, "first_pos"]) == (n, p)
    assert out.loc[400, "n_occ"] == 3
    assert 401 not in out.index and 402 not in out.index


def test_phrase_search_single_word(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.postings import phrase_search

    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": [0, 1], "text": ["x y x", "y y"]}))
    out = phrase_search(ds, ("x",)).to_pandas().set_index("doc_id")
    assert out.loc[0, "n_occ"] == 2 and out.loc[0, "first_pos"] == 1
    assert 1 not in out.index
