"""Corpus-statistics stages: containment_pairs, heaps_law,
misra_gries_heavy vs literal brute-force definitions."""

import numpy as np
import pyarrow as pa
import pytest

from tsdownsample_ray.stages.dedup import containment_pairs, word_shingles
from tsdownsample_ray.stages.sketches import misra_gries_heavy
from tsdownsample_ray.stages.vocab import heaps_law

ray = pytest.importorskip("ray")
import ray.data as rd  # noqa: E402


def _docs(rng, n=40, vocab=30, length=25):
    words = [f"w{i}" for i in range(vocab)]
    texts = []
    for i in range(n):
        toks = [words[int(x)] for x in rng.integers(0, vocab, length)]
        texts.append(" ".join(toks))
    # plant a containment pair: doc n is a strict slice of doc 0
    texts.append(texts[0].split(" ", 12)[-1])
    return texts


def test_containment_matches_brute(ray_session):
    rng = np.random.default_rng(2)
    texts = _docs(rng)
    ids = list(range(len(texts)))
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts)})
    got = containment_pairs(rd.from_arrow(t).repartition(3), w=3,
                            df_cap=64, num_partitions=2).to_pandas()

    sh = {i: word_shingles(x, 3) for i, x in zip(ids, texts)}
    from collections import Counter
    df = Counter(int(g) for s in sh.values() for g in s)
    kept = {i: {int(g) for g in s if 2 <= df[int(g)] <= 64}
            for i, s in sh.items()}
    exp = {}
    for a in ids:
        for b in ids:
            if a >= b:
                continue
            inter = len(kept[a] & kept[b])
            if inter and 2 * inter >= min(len(kept[a]), len(kept[b])):
                exp[(a, b)] = (inter, len(kept[a]), len(kept[b]),
                               int(2 * inter >= len(kept[a])),
                               int(2 * inter >= len(kept[b])))
    assert len(got) == len(exp) and len(exp) >= 1
    for _, r in got.iterrows():
        assert (r["inter"], r["sz_a"], r["sz_b"], r["cont_a"],
                r["cont_b"]) == exp[(r["a"], r["b"])]
    # the planted substring pair must be flagged as contained
    assert any(r["cont_a"] or r["cont_b"] for _, r in got.iterrows())


def test_heaps_law_matches_brute(ray_session):
    rng = np.random.default_rng(5)
    texts = _docs(rng, n=49)
    ids = list(range(len(texts)))
    n = len(ids)
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts)})
    got = heaps_law(rd.from_arrow(t).repartition(4), n, deciles=10,
                    num_partitions=2).to_pandas().sort_values(
        "decile").reset_index(drop=True)
    seen = set()
    cum_tok = 0
    exp = []
    per_dec = {d: [] for d in range(10)}
    for i, x in zip(ids, texts):
        per_dec[i * 10 // n].append(x)
    for d in range(10):
        for x in per_dec[d]:
            toks = x.split()
            cum_tok += len(toks)
            seen.update(toks)
        exp.append((d, cum_tok, len(seen)))
    assert [tuple(r) for r in
            got[["decile", "cum_tokens", "cum_vocab"]].to_numpy()] == exp


def test_misra_gries_matches_brute(ray_session):
    rng = np.random.default_rng(9)
    # Zipf-ish skew so a couple of tokens clear the N/(m+1) bar
    words = [f"w{i}" for i in range(12)]
    p = np.array([0.30, 0.20] + [0.05] * 10)
    texts = [" ".join(rng.choice(words, size=40, p=p))
             for _ in range(30)]
    t = pa.table({"text": pa.array(texts)})
    m = 8
    got = misra_gries_heavy(rd.from_arrow(t).repartition(4), m=m,
                            fanin=2).to_pandas()
    from collections import Counter
    cnt = Counter(tok for x in texts for tok in x.split())
    total = sum(cnt.values())
    exp = {tok: c for tok, c in cnt.items() if c * (m + 1) > total}
    assert len(exp) >= 1  # vocab of 12 guarantees heavy tokens at m=8
    assert dict(zip(got["token"], got["cnt"])) == exp
