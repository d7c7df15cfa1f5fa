"""Span-level (C4-style) dedup: explode tiling, corpus-wide keep-first,
document reassembly — vs a brute-force Python replay."""

import numpy as np
import pyarrow as pa
import pytest

from tsdownsample_ray.stages.spans import explode_spans_batch, span_dedup

ray = pytest.importorskip("ray")
import ray.data as rd  # noqa: E402


def _brute(docs: dict[int, str], w: int):
    """Reference replay: tile, global first-occurrence by (doc_id, idx)."""
    seen = {}
    spans = {}
    for doc_id in sorted(docs):
        words = docs[doc_id].split(" ")
        tiles = [" ".join(words[i:i + w]) for i in range(0, len(words), w)]
        spans[doc_id] = tiles
        for idx, s in enumerate(tiles):
            seen.setdefault(s, (doc_id, idx))
    out = {}
    for doc_id, tiles in spans.items():
        kept = [s for i, s in enumerate(tiles) if seen[s] == (doc_id, i)]
        out[doc_id] = (len(tiles), len(kept), " ".join(kept))
    return out


def test_explode_tiling_exact():
    b = pa.table({"doc_id": [1, 2], "text": ["a b c d e", ""]})
    t = explode_spans_batch(b, span_w=2)
    assert t["doc_id"].to_pylist() == [1, 1, 1, 2]
    assert t["span_idx"].to_pylist() == [0, 1, 2, 0]
    assert t["span"].to_pylist() == ["a b", "c d", "e", ""]


def test_explode_empty_batch():
    b = pa.table({"doc_id": pa.array([], pa.int64()),
                  "text": pa.array([], pa.string())})
    t = explode_spans_batch(b, span_w=3)
    assert t.num_rows == 0 and t.column_names == ["doc_id", "span_idx", "span"]


def test_span_dedup_matches_brute_force(ray_session):
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(12)]
    docs = {i: " ".join(rng.choice(vocab, size=int(rng.integers(1, 40))))
            for i in range(30)}
    # force exact duplicate spans across docs
    docs[40] = docs[0]
    docs[41] = docs[1] + " " + docs[2]
    ds = rd.from_arrow(pa.table({
        "doc_id": list(docs), "text": list(docs.values())}))
    got = {r["doc_id"]: (r["n_spans"], r["n_kept"], r["clean_text"])
           for r in span_dedup(ds.repartition(4), span_w=3,
                               num_partitions=4).take_all()}
    assert got == _brute(docs, 3)


def test_span_dedup_result_partition_invariant(ray_session):
    docs = {i: " ".join(["tok%d" % (j % 5) for j in range(i + 1)])
            for i in range(12)}
    tbl = pa.table({"doc_id": list(docs), "text": list(docs.values())})
    a = {r["doc_id"]: r["clean_text"]
         for r in span_dedup(rd.from_arrow(tbl).repartition(1), span_w=4,
                             num_partitions=2).take_all()}
    b = {r["doc_id"]: r["clean_text"]
         for r in span_dedup(rd.from_arrow(tbl).repartition(6), span_w=4,
                             num_partitions=5).take_all()}
    assert a == b == {d: v for d, (_, _, v) in _brute(docs, 4).items()}


# --- repetition signals ------------------------------------------------------

def test_repetition_brute_force():
    from collections import Counter

    from tsdownsample_ray.stages.textstats import repetition_batch

    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(9)]
    texts = [" ".join(rng.choice(vocab, size=int(rng.integers(1, 30))))
             for _ in range(50)] + ["solo", "", "a a a a"]
    b = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    t = repetition_batch(b).to_pydict()
    for i, txt in enumerate(texts):
        words = txt.split(" ")
        wc = Counter(words)
        bigrams = [f"{a} {c}" for a, c in zip(words, words[1:])]
        bc = Counter(bigrams)
        assert t["n_words"][i] == len(words)
        assert t["n_bigrams"][i] == len(bigrams)
        assert t["dup_word_frac"][i] == sum(
            c for c in wc.values() if c > 1) / len(words)
        top_w = min(wc, key=lambda w: (-wc[w], w))
        assert t["top_word"][i] == top_w
        assert t["top_word_frac"][i] == wc[top_w] / len(words)
        if bigrams:
            top_b = min(bc, key=lambda g: (-bc[g], g))
            assert t["top_bigram"][i] == top_b
            assert t["top_bigram_frac"][i] == bc[top_b] / len(bigrams)
            assert t["dup_bigram_frac"][i] == sum(
                c for c in bc.values() if c > 1) / len(bigrams)
        else:
            assert t["top_bigram"][i] is None
            assert t["top_bigram_frac"][i] == 0.0
            assert t["dup_bigram_frac"][i] == 0.0


# --- vocabulary construction -------------------------------------------------

def test_build_vocab_exact_topv(ray_session):
    from collections import Counter

    import ray.data as rd

    from tsdownsample_ray.stages.vocab import build_vocab

    rng = np.random.default_rng(6)
    vocab = [f"t{i:02d}" for i in range(25)]
    # zipf-ish counts so the top-V boundary is meaningful
    texts = [" ".join(rng.choice(vocab,
                                 p=np.linspace(2, 0.1, 25)
                                 / np.linspace(2, 0.1, 25).sum(),
                                 size=int(rng.integers(2, 40))))
             for _ in range(60)]
    cnt, df = Counter(), Counter()
    for t in texts:
        words = t.split()
        cnt.update(words)
        df.update(set(words))
    expect = sorted(cnt, key=lambda w: (-cnt[w], w))[:10]
    ds = rd.from_items([{"doc_id": i, "text": t}
                        for i, t in enumerate(texts)]).repartition(5)
    out = build_vocab(ds, top_v=10, num_partitions=4).take_all()
    assert [r["token"] for r in sorted(out, key=lambda r: r["vocab_id"])] \
        == expect
    for r in out:
        assert r["count"] == cnt[r["token"]]
        assert r["df"] == df[r["token"]]
