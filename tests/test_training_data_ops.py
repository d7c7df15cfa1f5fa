"""Tests for the training-data operators: dedup family, text analysis,
similarity search, multimodal plumbing."""

import numpy as np
import pyarrow as pa
import pytest

from tsdownsample_ray.stages.dedup import (
    MinHasher,
    jaccard,
    simhash_batch,
    word_shingles,
)
from tsdownsample_ray.stages.multimodal import DecodeImage, ResizeImage, SampleFrames
from tsdownsample_ray.stages.similarity import (
    embedding_matrix,
    train_ivf_centroids,
)
from tsdownsample_ray.stages.textstats import LangId, fingerprint_batch


def _mutate(text: str, k: int, seed: int = 5) -> str:
    toks = text.split()
    rng = np.random.default_rng(seed)
    for i in rng.choice(len(toks), size=min(k, len(toks)), replace=False):
        toks[i] = "zzz%d" % i
    return " ".join(toks)


# --- MinHash ---------------------------------------------------------------

def test_minhash_identical_texts_identical_sigs():
    mh = MinHasher(num_perm=64)
    t = "the quick brown fox jumps over the lazy dog " * 20
    assert np.array_equal(mh.signature(t), mh.signature(t))


def test_minhash_estimates_jaccard():
    mh = MinHasher(num_perm=256)
    base = " ".join(f"w{i}" for i in range(400))
    near = _mutate(base, 20)   # ~95% token overlap
    far = " ".join(f"v{i}" for i in range(400))
    s0, s1, s2 = mh.signature(base), mh.signature(near), mh.signature(far)
    est_near = (s0 == s1).mean()
    est_far = (s0 == s2).mean()
    true_near = jaccard(word_shingles(base), word_shingles(near))
    assert abs(est_near - true_near) < 0.1
    assert est_far < 0.05 < est_near


def test_lsh_finds_near_dups(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.dedup import near_dup_pairs

    base = " ".join(f"token{i}" for i in range(300))
    docs = {
        1: base,
        2: _mutate(base, 5),         # very near dup
        3: _mutate(base, 8, seed=9),  # near dup
        4: " ".join(f"other{i}" for i in range(300)),  # unrelated
    }
    t = pa.table({"doc_id": list(docs), "text": list(docs.values())})
    pairs = near_dup_pairs(
        rd.from_arrow(t), id_col="doc_id",
        num_perm=128, bands=32, threshold=0.5, num_partitions=2,
    ).to_pandas()
    found = {tuple(sorted((r.a, r.b))) for r in pairs.itertuples()}
    assert (1, 2) in found
    assert (1, 3) in found
    assert all(4 not in p for p in found)


# --- SimHash ---------------------------------------------------------------

def test_simhash_hamming():
    base = " ".join(f"token{i}" for i in range(300))
    t = pa.table({
        "doc_id": [1, 2, 3],
        "text": [base, _mutate(base, 3), " ".join(f"x{i}" for i in range(300))],
    })
    sigs = simhash_batch(t)["simhash"].to_numpy().view(np.uint64)

    def ham(a, b):
        return bin(int(a) ^ int(b)).count("1")

    assert ham(sigs[0], sigs[1]) < 12   # near-dup -> small distance
    assert ham(sigs[0], sigs[2]) > 20   # unrelated -> large distance


# --- text stats ------------------------------------------------------------

def test_langid_real_samples():
    li = LangId()
    t = pa.table({"doc_id": [1, 2, 3, 4, 5], "text": [
        "the cat sat on the mat and it is happy for now",
        "der hund ist nicht mit der katze und das ist gut",
        "le chat est sur la table et les chiens ne sont pas la",
        "el perro es grande y los gatos son de la casa que",
        "这是一个中文句子用来测试语言识别",
    ]})
    preds = li(t)["lang_pred"].to_pylist()
    assert preds == ["en", "de", "fr", "es", "zh"]


def test_fingerprint_deterministic_and_sensitive():
    t = pa.table({"doc_id": [1, 2, 3], "text": ["abc def", "abc def", "abc deg"]})
    fps = fingerprint_batch(t)["fingerprint"].to_pylist()
    assert fps[0] == fps[1]
    assert fps[0] != fps[2]


def test_fingerprint_matches_byte_horner():
    """The vectorized power-table fingerprint equals the defining
    byte-Horner recurrence h = (h*BASE + byte) % (2^61-1)."""
    import random

    from tsdownsample_ray.stages.textstats import _BASE, _MOD

    rng = random.Random(3)
    texts = ["", "a", "Ω unicode ✓ bytes", "x" * 5000] + [
        "".join(chr(rng.randrange(32, 127)) for _ in range(rng.randrange(0, 400)))
        for _ in range(50)]
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    got = fingerprint_batch(t)["fingerprint"].to_pylist()
    for txt, g in zip(texts, got):
        h = 0
        for b in txt.encode():
            h = (h * _BASE + b) % _MOD
        assert g == h, txt[:40]


def test_quality_batch_matches_python_reference():
    """Vectorized quality signals equal the per-row Python definition,
    including the non-ASCII fallback path."""
    import random

    from tsdownsample_ray.stages.textstats import (LangId, _quality_row,
                                                   quality_batch)

    rng = random.Random(9)
    words = ["the", "Cat", "sat!", "on", "a", "MAT.", "und", "42", "--"]
    texts = ["", "   ", "The quick; brown FOX!", "naïve café — ünïcode",
             "\tleading and trailing \n"] + [
        " ".join(rng.choice(words) for _ in range(rng.randrange(0, 60)))
        for _ in range(40)]
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    # exercise the sliced-array path too
    out = quality_batch(t.slice(2)).to_pydict()
    stop = frozenset(LangId.PROFILES["en"])
    for i, txt in enumerate(texts[2:]):
        exp = _quality_row(txt, stop)
        got = (out["n_chars"][i], out["n_tokens"][i],
               out["stopword_ratio"][i], out["punct_ratio"][i],
               out["upper_ratio"][i])
        assert got == exp, (txt, got, exp)


# --- similarity ------------------------------------------------------------

def test_ivf_recall_vs_bruteforce(ray_session):
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from tsdownsample_ray.stages.similarity import knn_bruteforce, knn_ivf

    path = "/root/testdata/sf0.01/embeddings.parquet"
    t = pq.read_table(path, columns=["vec_id", "embedding"])
    E = embedding_matrix(t)
    ids = t["vec_id"].to_numpy()
    q = E[ids == 0][0]
    C = train_ivf_centroids(E, n_lists=8)
    ds = rd.read_parquet(path, columns=["vec_id", "embedding"]).filter(
        expr="vec_id > 0")
    bf = knn_bruteforce(ds, ray.put(q), k=10).to_pandas()
    iv = knn_ivf(ds, ray.put(q), ray.put(C), k=10, nprobe=6).to_pandas()
    recall = len(set(bf.vec_id) & set(iv.vec_id)) / 10
    assert recall >= 0.7
    # full probe == exact
    iv_full = knn_ivf(ds, ray.put(q), ray.put(C), k=10, nprobe=8).to_pandas()
    assert list(iv_full.vec_id) == list(bf.vec_id)


# --- multimodal ------------------------------------------------------------

def test_decode_stub_raises_without_fake():
    # image/audio decode is REAL for BMP/PNG/JPEG/WAV and frame sampling
    # is REAL for MP4 containers; only payloads needing an external codec
    # still raise — at CALL time, on the offending payload.
    t = pa.table({
        "media_id": [1],
        "payload": [b"not an mp4 container......."],
        "duration_ms": pa.array([1000], pa.int32()),
    })
    with pytest.raises(NotImplementedError):
        SampleFrames(fake=False)(t)


def test_fake_audio_decode_and_downsample():
    from tsdownsample_ray.kernels import minmaxlttb
    from tsdownsample_ray.stages.multimodal import DecodeAudio

    t = pa.table({
        "media_id": [1],
        "payload": [b"wavbytes"],
        "duration_ms": pa.array([2000], pa.int32()),
    })
    out = DecodeAudio(fake=True)(t)
    samples = np.asarray(out["samples"][0].as_py(), dtype=np.float32)
    assert len(samples) == 32_000  # 2 s at 16 kHz
    # the downsample kernels apply to waveforms directly
    idx = minmaxlttb(None, samples, 200)
    assert len(idx) == 200
    # deterministic in payload
    again = DecodeAudio(fake=True)(t)
    assert np.array_equal(
        samples, np.asarray(again["samples"][0].as_py(), np.float32))


def test_fake_decode_resize_plumbing():
    t = pa.table({
        "media_id": [1, 2],
        "kind": ["image", "image"],
        "payload": [b"imgbytes1", b"imgbytes2"],
        "mime": ["image/png", "image/png"],
        "width": pa.array([16, 8], pa.int32()),
        "height": pa.array([8, 8], pa.int32()),
        "duration_ms": pa.array([0, 0], pa.int32()),
    })
    dec = DecodeImage(fake=True)(t)
    assert dec["pixels"].to_pylist()[0] == DecodeImage(fake=True)(t)["pixels"].to_pylist()[0]  # deterministic
    assert len(dec["pixels"][0]) == 16 * 8 * 3
    rs = ResizeImage(4, 4)(dec)
    assert len(rs["pixels"][0]) == 4 * 4 * 3
    assert rs["width"][0].as_py() == 4


def test_frame_sample_counts():
    t = pa.table({
        "media_id": [1],
        "payload": [b"vid"],
        "duration_ms": pa.array([4000], pa.int32()),  # 100 frames at 25fps
    })
    out = SampleFrames(n_frames=16, fake=True)(t)
    frames = out["frame_ts_ms"][0].as_py()
    assert len(frames) == 16
    assert frames[0] == 0


def test_exact_dedup_stage(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.dedup import exact_dedup

    t = pa.table({
        "text": ["aa", "bb", "aa", "cc", "bb"],
        "ts": [5, 1, 2, 9, 0],
        "id": [1, 2, 3, 4, 5],
    })
    out = exact_dedup(rd.from_arrow(t), order_col="ts").to_pandas()
    # one row per distinct text, the earliest by ts kept
    kept = {r.text: r.id for r in out.itertuples()}
    assert kept == {"aa": 3, "bb": 5, "cc": 4}


def test_simhash_near_dup_perfect_recall(ray_session):
    """The 4x16-bit banding must find EVERY pair within hamming<=3
    (pigeonhole) — compare against the quadratic ground truth."""
    import itertools

    import ray.data as rd

    from tsdownsample_ray.stages.dedup import (simhash_batch,
                                               simhash_near_dup_pairs)

    base = " ".join(f"tok{i}" for i in range(120))
    docs = {0: base}
    for k in range(1, 8):  # flip a few tokens -> small hamming distances
        toks = base.split()
        toks[k * 3] = f"alt{k}"
        docs[k] = " ".join(toks)
    docs[8] = " ".join(f"other{i}" for i in range(120))
    t = pa.table({"doc_id": list(docs), "text": list(docs.values())})

    sigs = simhash_batch(t)["simhash"].to_numpy().astype(np.uint64)
    truth = set()
    for i, j in itertools.combinations(range(len(docs)), 2):
        if bin(int(sigs[i] ^ sigs[j])).count("1") <= 3:
            truth.add((i, j))

    got = simhash_near_dup_pairs(
        rd.from_arrow(t).repartition(2), max_hamming=3,
        num_partitions=2).to_pandas()
    found = {tuple(sorted((r.a, r.b))) for r in got.itertuples()}
    assert found == truth


def test_simhash_near_dup_sparse_default_partitions(ray_session):
    """Sparse candidates at the DEFAULT num_partitions: 1-id buckets emit
    empty pair blocks which must not break the verify joins (Ray drops
    empty blocks' schemas through its hash-shuffle join)."""
    import ray.data as rd

    from tsdownsample_ray.stages.dedup import simhash_near_dup_pairs

    base = " ".join(f"tok{i}" for i in range(120))
    docs = {0: base}
    for k in range(1, 8):
        toks = base.split()
        toks[k * 3] = f"alt{k}"
        docs[k] = " ".join(toks)
    docs[8] = " ".join(f"other{i}" for i in range(120))
    t = pa.table({"doc_id": list(docs), "text": list(docs.values())})
    out = simhash_near_dup_pairs(rd.from_arrow(t).repartition(2),
                                 max_hamming=3).to_pandas()
    assert len(out) > 0
    assert (out["hamming"] <= 3).all()


def test_near_dup_zero_candidates(ray_session):
    """All-distinct corpus -> zero candidate pairs -> the verify joins see
    an empty (possibly zero-block) left side and must return empty."""
    import ray.data as rd

    from tsdownsample_ray.stages.dedup import (near_dup_pairs,
                                               simhash_near_dup_pairs)

    docs = {i: " ".join(f"w{i}_{j}" for j in range(80)) for i in range(6)}
    t = pa.table({"doc_id": list(docs), "text": list(docs.values())})
    nd = near_dup_pairs(rd.from_arrow(t), num_perm=32, bands=4,
                        threshold=0.9, num_partitions=2).to_pandas()
    assert len(nd) == 0
    sh = simhash_near_dup_pairs(rd.from_arrow(t), max_hamming=1,
                                num_partitions=2).to_pandas()
    assert len(sh) == 0


def test_partition_hash_null_series_keys(ray_session):
    """Null series keys must route like the string 'None', not crash the
    dictionary-code take (NaN index -> -2^63 -> IndexError)."""
    import pandas as pd
    import ray.data as rd

    from tsdownsample_ray.arrow_utils import stable_part_codes
    from tsdownsample_ray.stages.rollup import rollup

    col = pa.array(["a", None, "b", None])
    codes = stable_part_codes(col, 8)
    ref = stable_part_codes(pa.array(["a", "None", "b", "None"]), 8)
    assert list(codes) == list(ref)

    t = pa.table({"series_id": pa.array(["a", None, "a", None]),
                  "x": pa.array([0, 1, 2, 3], pa.int64()),
                  "y": pa.array([1, 2, 3, 4], pa.int64())})
    out = (rollup(rd.from_arrow(t), 10, combine="hashpart")
           .to_pandas().sort_values("series_id", na_position="last"))
    assert out["sum_y"].tolist() == [4, 6]  # a: 1+3, null: 2+4


# --- character-n-gram Jaccard (prefix filter) ------------------------------

def _naive_ngrams(text: str, n: int = 5) -> set:
    return {text[i:i + n] for i in range(len(text) - n + 1)}


def test_char_ngram_codes_match_naive():
    from tsdownsample_ray.stages.dedup import char_ngram_codes

    texts = ["hello world, hello again", "abcd", "abcde", "", "xy" * 40]
    for n in (3, 5, 8):
        got = char_ngram_codes(texts, n)
        for t, codes in zip(texts, got):
            want = _naive_ngrams(t, n)
            dec = {bytes((int(c) >> (8 * (n - 1 - j))) & 0xFF
                         for j in range(n)).decode() for c in codes}
            assert dec == want, (t, n)
            # sorted ascending == byte-lexicographic order of the grams
            assert list(codes) == sorted(int(c) for c in codes)


def _brute_jaccard_pairs(texts: dict, n: int, thr: float) -> set:
    out = set()
    ids = sorted(texts)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            sa, sb = _naive_ngrams(texts[a], n), _naive_ngrams(texts[b], n)
            if not (sa | sb):
                continue
            if len(sa & sb) >= thr * len(sa | sb):
                out.add((a, b))
    return out


@pytest.mark.parametrize("stop_m", [None, 64])
def test_ngram_jaccard_equals_bruteforce(ray_session, stop_m):
    """The prefix-filter join EQUALS the quadratic definition — with or
    without the df-ascending stop-gram order (any consistent global
    order is exact), across partitionings."""
    import ray.data as rd

    from tsdownsample_ray.stages.dedup import ngram_jaccard_pairs

    rng = np.random.default_rng(11)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
    base = " ".join(rng.choice(vocab, 30))
    texts = {}
    for i in range(40):
        if i % 4 == 0 and i:
            t = list(texts[i - 1])  # near-dup of the previous doc
            t[rng.integers(len(t))] = "Q"
            texts[i] = "".join(t)
        else:
            texts[i] = " ".join(rng.choice(vocab, rng.integers(10, 40)))
    t = pa.table({"doc_id": pa.array(list(texts), pa.int64()),
                  "text": pa.array(list(texts.values()))})
    want = _brute_jaccard_pairs(texts, 5, 0.5)
    got = ngram_jaccard_pairs(
        rd.from_arrow(t).repartition(3), n=5, threshold=0.5,
        stop_m=stop_m, num_partitions=4).to_pandas()
    assert set(zip(got.a, got.b)) == want
    # exact counts, not just membership
    for _, r in got.iterrows():
        sa = _naive_ngrams(texts[r.a], 5)
        sb = _naive_ngrams(texts[r.b], 5)
        assert r.n_inter == len(sa & sb)
        assert r.n_union == len(sa | sb)


def test_ngram_jaccard_no_pairs(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.dedup import ngram_jaccard_pairs

    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": ["completely different words here",
                           "zzz yyy xxx qqq ppp mmm nnn"]})
    out = ngram_jaccard_pairs(rd.from_arrow(t), threshold=0.9,
                              num_partitions=2).to_pandas()
    assert len(out) == 0


def test_corpus_stop_grams_orders_by_df(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.dedup import corpus_stop_grams

    # "AAAAA" in every doc, rarer grams elsewhere; sample_mod=1 samples all
    t = pa.table({"doc_id": pa.array(range(8), pa.int64()),
                  "text": [f"AAAAA unique{i}snippet" for i in range(8)]})
    codes, dfs = corpus_stop_grams(rd.from_arrow(t), n=5, stop_m=4,
                                   sample_mod=1)
    assert len(codes) == 4 and len(dfs) == 4
    # every selected stop gram appears in ALL 8 docs
    assert (dfs == 8).all()
    decs = {bytes((int(c) >> (8 * (4 - j))) & 0xFF
                  for j in range(5)).decode() for c in codes}
    texts = t["text"].to_pylist()
    for d in decs:
        assert all(d in x for x in texts), d
    assert list(codes) == sorted(codes)  # sorted for searchsorted


def test_pii_scrub_batch_masks_and_counts():
    from tsdownsample_ray.stages.pii import pii_scrub_batch

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            "mail me at jo.doe+x@sub.example.org or call 555-123-4567",
            "server at 192.168.0.1 and 10.0.0.254 no contact",
            "clean text with no pii at all",
        ]),
    })
    out = pii_scrub_batch(t)
    clean = out["clean_text"].to_pylist()
    assert clean[0] == "mail me at <EMAIL> or call <PHONE>"
    assert clean[1] == "server at <IP> and <IP> no contact"
    assert clean[2] == "clean text with no pii at all"
    assert out["n_email"].to_pylist() == [1, 0, 0]
    assert out["n_ipv4"].to_pylist() == [0, 2, 0]
    assert out["n_phone"].to_pylist() == [1, 0, 0]


def test_pii_scrub_email_digits_not_double_counted():
    """Digit runs inside an email are masked by the email pass first and
    never counted as phones."""
    from tsdownsample_ray.stages.pii import pii_scrub_batch

    t = pa.table({"text": pa.array(["x 555-123-4567@host.example.com y"])})
    out = pii_scrub_batch(t)
    assert out["clean_text"][0].as_py() == "x <EMAIL> y"
    assert out["n_phone"][0].as_py() == 0


def test_tfidf_top_terms_hand_corpus(ray_session):
    import math

    import ray.data as rd

    from tsdownsample_ray.stages.tfidf import tfidf_top_terms

    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "source": pa.array(["a", "a", "b", "b"]),
        "text": pa.array([
            "x x common", "y common", "z z z common", "z common",
        ]),
    })
    out = tfidf_top_terms(rd.from_arrow(t).repartition(3), 4,
                          group_col="source", k=2,
                          num_partitions=1).to_pandas()
    out = out.sort_values(["source", "rank"]).reset_index(drop=True)
    # group a: 'x' tf=2 df=1 beats 'common' tf=2 df=4; group b: 'z' tf=4 df=2
    a = out[out["source"] == "a"]
    assert list(a["term"]) == ["x", "common"]
    assert list(a["tf"]) == [2, 2]
    assert list(a["df"]) == [1, 4]
    b = out[out["source"] == "b"]
    assert list(b["term"]) == ["z", "common"]
    assert list(b["tf"]) == [4, 2]
    # df is corpus-global: 'common' appears in all 4 docs
    assert list(b["df"]) == [2, 4]


def test_warc_roundtrip_binary_safe():
    """Content-Length framing survives payloads that CONTAIN the record
    separator bytes (a scan-for-separator parser would mis-split)."""
    from tsdownsample_ray.sources.archives import build_warc, parse_warc

    recs = [
        ("https://a.example/1", b"plain body"),
        ("https://a.example/2", b"tricky\r\n\r\nWARC/1.0\r\n\r\nbody"),
        ("https://a.example/3", b""),
    ]
    out = parse_warc(build_warc(recs))
    assert [(u, p) for _, u, p in out] == recs
    assert all(t == "response" for t, _, _ in out)
    with pytest.raises(ValueError):
        parse_warc(b"NOT-A-WARC")


def test_gzip_batch_roundtrip():
    from tsdownsample_ray.sources.archives import (
        gunzip_batch, gzip_bytes, gunzip_bytes,
    )

    texts = ["hello world", "", "unicode é中文 text"]
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "payload": pa.array([gzip_bytes(s.encode()) for s in texts],
                            pa.binary()),
    })
    out = gunzip_batch(t)
    assert out["text"].to_pylist() == texts
    assert "payload" not in out.column_names
    # wbits=47 autodetects plain zlib streams too
    import zlib

    assert gunzip_bytes(zlib.compress(b"abc")) == b"abc"


def test_warc_extractor_stage():
    from tsdownsample_ray.sources.archives import (
        WarcRecordExtractor, build_warc,
    )

    blob = build_warc([("u1", b"xx"), ("u2", b"yyy")])
    batch = pa.table({
        "archive_id": pa.array([7], pa.int64()),
        "payload": pa.array([blob], pa.binary()),
    })
    out = WarcRecordExtractor()(batch)
    assert out["archive_id"].to_pylist() == [7, 7]
    assert out["uri"].to_pylist() == ["u1", "u2"]
    assert out["payload"].to_pylist() == [b"xx", b"yyy"]


def test_connected_components_shapes(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.components import connected_components

    # chain + triangle-with-cycle + isolated pair, across partitions
    t = pa.table({
        "a": ["c2", "c3", "c1", "t1", "t2", "t3", "p9"],
        "b": ["c3", "c4", "c2", "t2", "t3", "t1", "p8"],
    })
    out = connected_components(rd.from_arrow(t).repartition(4),
                               num_partitions=2).to_pandas()
    comp = dict(zip(out["node"], out["component"]))
    assert {comp[n] for n in ("c1", "c2", "c3", "c4")} == {"c1"}
    assert {comp[n] for n in ("t1", "t2", "t3")} == {"t1"}
    assert {comp[n] for n in ("p8", "p9")} == {"p8"}


def test_connected_components_empty(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.components import connected_components

    t = pa.table({"a": pa.array([], pa.string()),
                  "b": pa.array([], pa.string())})
    out = connected_components(rd.from_arrow(t)).to_pandas()
    assert len(out) == 0


# --- benchmark decontamination ----------------------------------------------

def test_contamination_check_flags_overlap(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.dedup import (
        benchmark_shingle_set,
        contamination_check,
        word_shingles,
    )

    bench_texts = ["the quick brown fox jumps", "one two three four"]
    train = {
        0: "something about the quick brown fox here",  # shares a 3-gram
        1: "completely unrelated words only here",
        2: "one two",              # < w tokens: whole-text shingle, no hit
        3: "",                      # zero grams
    }
    bench = benchmark_shingle_set(
        rd.from_items([{"doc_id": i, "text": t}
                       for i, t in enumerate(bench_texts)]), w=3)
    assert set(bench) == set(np.concatenate(
        [word_shingles(t, 3) for t in bench_texts]))
    out = {r["doc_id"]: r for r in contamination_check(
        rd.from_items([{"doc_id": i, "text": t}
                       for i, t in train.items()]), bench, w=3).take_all()}
    assert out[0]["contaminated"] is True and out[0]["n_hits"] >= 1
    assert out[1]["contaminated"] is False
    assert out[2]["contaminated"] is False and out[2]["n_grams"] == 1
    assert out[3]["n_grams"] == 0 and out[3]["contaminated"] is False


def test_dedup_against_base_corpus(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.dedup import dedup_against

    base = rd.from_items([{"doc_id": i, "text": t} for i, t in
                          enumerate(["aaa", "bbb", "ccc"])])
    new = rd.from_items([{"doc_id": 100 + i, "text": t} for i, t in
                         enumerate(["bbb", "xyz", "ccc", "qqq"])])
    out = {r["doc_id"]: r["seen_in_base"]
           for r in dedup_against(new, base, num_partitions=3).take_all()}
    assert out == {100: True, 101: False, 102: True, 103: False}


def test_dedup_against_empty_base(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.dedup import dedup_against

    base = rd.from_items([{"doc_id": 0, "text": "zzz"}]).filter(
        lambda r: False)
    new = rd.from_items([{"doc_id": 1, "text": "aaa"}])
    out = dedup_against(new, base, num_partitions=2).take_all()
    assert out == [{"doc_id": 1, "seen_in_base": False}]


def test_normalize_text_batch():
    """NFC composes combining accents (non-ASCII fallback path), case
    folds, collapses whitespace, trims; ASCII rows stay untouched-exact."""
    import pyarrow as pa

    from tsdownsample_ray.stages.textstats import normalize_text_batch

    t = pa.table({
        "doc_id": [1, 2, 3],
        "text": ["  Hello\t\tWORLD  ",
                 "Café Du  Monde",   # decomposed e + U+0301
                 "plain ascii"],
    })
    out = normalize_text_batch(t)
    assert out["norm_text"].to_pylist() == [
        "hello world", "café du monde", "plain ascii"]
    assert out["n_chars_raw"].to_pylist() == [16, 15, 11]
    # é composed: one codepoint shorter than the raw decomposed form
    assert out["n_chars_norm"].to_pylist() == [11, 13, 11]


def test_embedding_covariance_matches_numpy(ray_session):
    """embedding_covariance sufficient statistics equal a direct numpy
    replay of the quantized Gram, independent of block partitioning."""
    import ray

    from tsdownsample_ray.stages.similarity import embedding_covariance

    rng = np.random.default_rng(17)
    n, d, scale = 257, 6, 1000
    E = rng.normal(size=(n, d)).astype(np.float32)
    tbl = pa.table({"embedding": pa.FixedSizeListArray.from_arrays(
        pa.array(E.reshape(-1), pa.float32()), d)})

    Q = np.trunc(E.astype(np.float64) * scale)
    iu, ju = np.triu_indices(d)
    G = Q.T @ Q
    s = Q.sum(axis=0)

    for nparts in (1, 3, 7):
        ds = ray.data.from_arrow(tbl).repartition(nparts)
        out = embedding_covariance(ds, scale=scale, fanin=2).to_pandas()
        out = out.sort_values(["i", "j"]).reset_index(drop=True)
        assert len(out) == d * (d + 1) // 2
        assert (out["i"].to_numpy() == iu + 1).all()
        assert (out["j"].to_numpy() == ju + 1).all()
        assert (out["n"].to_numpy() == n).all()
        assert (out["sxy"].to_numpy() == G[iu, ju].astype(np.int64)).all()
        assert (out["sx"].to_numpy() == s[iu].astype(np.int64)).all()
        assert (out["sy"].to_numpy() == s[ju].astype(np.int64)).all()
        num = n * G[iu, ju] - s[iu] * s[ju]
        assert (out["cov_num"].to_numpy() == num.astype(np.int64)).all()
        np.testing.assert_array_equal(out["cov"].to_numpy(), num / (n * n))


def test_centroid_classify_matches_numpy(ray_session):
    """centroid_classify equals a direct numpy replay (trunc-quantize,
    trunc-div centroids, integer d2 argmin with smallest-label ties)
    for every partitioning."""
    import ray

    from tsdownsample_ray.stages.similarity import centroid_classify

    rng = np.random.default_rng(9)
    n, d, scale, mod = 101, 5, 1000, 4
    E = rng.normal(size=(n, d)).astype(np.float32)
    lab = rng.integers(0, 3, size=n).astype(np.int64)
    ids = np.arange(n, dtype=np.int64)
    tbl = pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(E.reshape(-1), pa.float32()), d),
        "label": pa.array(lab.astype(np.int32), pa.int32())})

    Q = np.trunc(E.astype(np.float64) * scale).astype(np.int64)
    train = ids % mod != 0
    labels = np.unique(lab[train])
    C = np.zeros((len(labels), d), np.int64)
    for p, l in enumerate(labels):
        s = Q[train & (lab == l)].sum(axis=0)
        nn = (train & (lab == l)).sum()
        C[p] = np.where(s >= 0, s // nn, -((-s) // nn))
    test = ids % mod == 0
    d2 = ((Q[test][:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    a = np.argmin(d2, axis=1)
    exp = dict(zip(ids[test],
                   zip(labels[a], d2[np.arange(test.sum()), a])))

    for nparts in (1, 3):
        ds = ray.data.from_arrow(tbl).repartition(nparts)
        out = (centroid_classify(ds, scale=scale, holdout_mod=mod)
               .to_pandas().sort_values("vec_id").reset_index(drop=True))
        assert out["vec_id"].tolist() == sorted(ids[test])
        for _, r in out.iterrows():
            pl, pd2 = exp[r["vec_id"]]
            assert r["pred"] == pl and r["d2"] == pd2
        assert (out["label"].to_numpy() ==
                lab[np.isin(ids, out["vec_id"])]).all()


def test_semantic_prune_keeps_closest(ray_session):
    import ray

    from tsdownsample_ray.stages.similarity import semantic_prune

    rng = np.random.default_rng(21)
    n = 300
    t = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "cluster": pa.array(rng.integers(0, 3, n).astype(np.int64)),
        "d2": pa.array(rng.integers(0, 50, n).astype(np.int64))})
    ds = ray.data.from_arrow(t).repartition(5)
    out = (semantic_prune(ds, keep=10).to_pandas()
           .sort_values(["cluster", "rk"]).reset_index(drop=True))
    import pandas as pd
    df = t.to_pandas()
    for c, g in df.groupby("cluster"):
        want = g.sort_values(["d2", "vec_id"]).head(10)
        got = out[out["cluster"] == c]
        assert got["vec_id"].tolist() == want["vec_id"].tolist()
        assert got["rk"].tolist() == list(range(1, len(want) + 1))


def test_term_drift_matches_python(ray_session):
    """term_drift chi2 equals a direct python contingency replay,
    partition-invariant."""
    import ray

    from tsdownsample_ray.stages.vocab import term_drift

    docs = {0: "x y", 1: "x z", 2: "x y w", 3: "z w",
            4: "y y q", 5: "z q"}
    tbl = pa.table({"doc_id": pa.array(sorted(docs), pa.int64()),
                    "text": pa.array([docs[i] for i in sorted(docs)])})
    n0 = sum(1 for i in docs if i % 2 == 0)
    n1 = len(docs) - n0
    from collections import defaultdict
    ab = defaultdict(lambda: [0, 0])
    for did, t in docs.items():
        for term in set(t.split()):
            ab[term][did % 2] += 1
    exp = {}
    for term, (a, b) in ab.items():
        c, d = n0 - a, n1 - b
        if c + d == 0:
            continue
        p1 = (a + b) * (c + d)
        d1 = a * n1 - b * n0
        chi2 = (float(n0 + n1) * float(d1) * float(d1)) / (
            float(p1) * float(n0 * n1))
        exp[term] = (a, b, p1, d1, chi2)

    for nparts in (1, 3):
        ds = ray.data.from_arrow(tbl).repartition(nparts)
        out = term_drift(ds, n0, n1, top=20, fanin=2)
        assert len(out) == len(exp)
        for _, r in out.iterrows():
            a, b, p1, d1, chi2 = exp[r["term"]]
            assert (r["a"], r["b"], r["p1"], r["d1"]) == (a, b, p1, d1)
            assert r["chi2"] == chi2
        # ranked by chi2 desc, term asc
        key = sorted(exp.items(), key=lambda kv: (-kv[1][4], kv[0]))
        assert out["term"].tolist() == [k for k, _ in key]
        assert out["rank"].tolist() == list(range(1, len(exp) + 1))


def test_classify_confusion_permille(ray_session):
    """Confusion rollup: permille precision/recall replay from the
    classifier's per-row output."""
    from tsdownsample_ray.pipelines.queries import (
        q_classify_confusion_embeddings, q_centroid_classify_embeddings)

    sf = "/root/testdata/sf0.001"
    rows = q_centroid_classify_embeddings(sf).to_pandas()
    out = q_classify_confusion_embeddings(sf)
    for _, r in out.iterrows():
        l = r["label"]
        sup = (rows["label"] == l).sum()
        pred = (rows["pred"] == l).sum()
        tp = ((rows["label"] == l) & (rows["pred"] == l)).sum()
        assert r["support"] == sup and r["predicted"] == pred
        assert r["tp"] == tp
        assert r["prec_pm"] == ((1000 * tp) // pred if pred else 0)
        assert r["rec_pm"] == (1000 * tp) // sup
    assert set(out["label"]) == set(rows["label"].unique())


def test_local_supplier_volume_matches_duckdb(ray_session):
    """Q5-style six-table join equals the DuckDB replay at sf0.001."""
    import duckdb

    from tsdownsample_ray.pipelines.queries import (LOCAL_SUPPLIER_SQL,
                                                    q_local_supplier_volume)

    sf = "/root/testdata/sf0.001"
    got = q_local_supplier_volume(sf)
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "orders",
              "lineitem"):
        con.sql(f"CREATE VIEW {t} AS FROM '{sf}/{t}.parquet'")
    exp = con.sql(LOCAL_SUPPLIER_SQL).df().sort_values(
        ["revenue_e6", "n_name"], ascending=[False, True])
    assert got["n_name"].tolist() == exp["n_name"].tolist()
    assert got["revenue_e6"].tolist() == exp["revenue_e6"].tolist()


def test_promo_share_matches_duckdb(ray_session):
    import duckdb

    from tsdownsample_ray.pipelines.queries import (PROMO_SHARE_SQL,
                                                    q_promo_share_month)

    sf = "/root/testdata/sf0.001"
    got = (q_promo_share_month(sf).to_pandas()
           .sort_values("bucket").reset_index(drop=True))
    con = duckdb.connect()
    for t in ("lineitem", "part"):
        con.sql(f"CREATE VIEW {t} AS FROM '{sf}/{t}.parquet'")
    exp = con.sql(PROMO_SHARE_SQL).df().sort_values(
        "bucket").reset_index(drop=True)
    for c in ("bucket", "promo_e6", "total_e6", "share_pm"):
        assert got[c].tolist() == exp[c].tolist(), c


def test_cluster_ari_matches_sklearn_formula(ray_session):
    """Exact-rational ARI equals the textbook formula computed from the
    same contingency (independent python replay)."""
    from tsdownsample_ray.pipelines.queries import q_cluster_ari_embeddings
    from tsdownsample_ray.stages.similarity import kmeans_integer

    import pyarrow.parquet as pq
    import ray

    sf = "/root/testdata/sf0.001"
    out = q_cluster_ari_embeddings(sf)
    r = out.iloc[0]

    # independent replay: contingency from kmeans + labels
    t = pq.read_table(f"{sf}/embeddings.parquet")
    labels = dict(zip(t["vec_id"].to_pylist(), t["label"].to_pylist()))
    ds = ray.data.read_parquet(f"{sf}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    assigned = kmeans_integer(ds, k=4, updates=2, scale=1000,
                              num_partitions=2).to_pandas()
    from collections import Counter
    ct = Counter((c, labels[v]) for v, c in
                 zip(assigned["vec_id"], assigned["cluster"]))
    n = sum(ct.values())
    sumij = sum(c * (c - 1) // 2 for c in ct.values())
    ca, cb = Counter(), Counter()
    for (cl, la), c in ct.items():
        ca[cl] += c
        cb[la] += c
    suma = sum(a * (a - 1) // 2 for a in ca.values())
    sumb = sum(b * (b - 1) // 2 for b in cb.values())
    C = n * (n - 1) // 2
    num2 = 2 * C * sumij - 2 * suma * sumb
    den2 = C * (suma + sumb) - 2 * suma * sumb
    assert (r["n"], r["sumij"], r["suma"], r["sumb"]) == (n, sumij,
                                                          suma, sumb)
    assert (r["num2"], r["den2"]) == (num2, den2)
    assert r["ari"] == float(num2) / float(den2)
    # sanity: ARI of a non-degenerate clustering lies in (-0.5, 1]
    assert -0.5 < r["ari"] <= 1.0


def test_association_rules_match_python(ray_session):
    """Bitmask-histogram rule mining equals a direct set replay,
    partition-invariant; unknown items are ignored."""
    import ray

    from tsdownsample_ray.stages.baskets import association_rules

    rng = np.random.default_rng(2)
    items = ["a", "b", "c", "d"]
    rows = []
    for uid in range(40):
        for it in rng.choice(items + ["zz"], size=rng.integers(1, 6),
                             replace=True):
            rows.append((uid, str(it)))
    tbl = pa.table({"user_id": pa.array([r[0] for r in rows], pa.int64()),
                    "event_type": pa.array([r[1] for r in rows])})

    from collections import defaultdict
    baskets = defaultdict(set)
    for uid, it in rows:
        if it in items:
            baskets[uid].add(it)
    baskets = {u: s for u, s in baskets.items() if s}
    n = len(baskets)
    exp = {}
    for a in items:
        for b in items:
            if a == b:
                continue
            n_a = sum(1 for s in baskets.values() if a in s)
            n_b = sum(1 for s in baskets.values() if b in s)
            n_ab = sum(1 for s in baskets.values() if a in s and b in s)
            if n_ab:
                exp[(a, b)] = (n, n_a, n_b, n_ab, (1000 * n_ab) // n_a,
                               n * n_ab, n_a * n_b,
                               float(n * n_ab) / float(n_a * n_b))

    for nparts in (1, 4):
        ds = ray.data.from_arrow(tbl).repartition(nparts)
        out = association_rules(ds, items, num_partitions=2)
        assert len(out) == len(exp)
        for _, r in out.iterrows():
            assert exp[(r["antecedent"], r["consequent"])] == (
                r["n"], r["n_a"], r["n_b"], r["n_ab"], r["conf_pm"],
                r["lift_num"], r["lift_den"], r["lift"])


def test_boolean_search_and_semantics(ray_session):
    import ray

    from tsdownsample_ray.pipelines.queries import q_boolean_search_docs

    sf = "/root/testdata/sf0.001"
    out = q_boolean_search_docs(sf).to_pandas()
    import duckdb
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf}/documents.parquet'").df()
    expect = {}
    for _, d in docs.iterrows():
        toks = [t for t in d["text"].split(" ") if t]
        if {"hash", "join", "merge"} <= set(toks):
            expect[d["doc_id"]] = len(toks)
    assert dict(zip(out["doc_id"], out["n_terms"])) == expect
    assert len(expect) > 0


def test_rfm_segments_match_python(ray_session):
    """RFM value-based quintiles equal a pure-python replay of the
    discrete order-statistic thresholds."""
    import duckdb

    from tsdownsample_ray.pipelines.queries import q_rfm_segments_users

    sf = "/root/testdata/sf0.001"
    out = (q_rfm_segments_users(sf).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    pu = duckdb.sql(f"""
        SELECT user_id, max(epoch_us(ts)) AS last_ts, count(*) AS cnt,
               CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT)
                   AS sum_cents
        FROM '{sf}/events.parquet' WHERE event_type = 'purchase'
        GROUP BY 1
    """).df().sort_values("user_id").reset_index(drop=True)
    assert out["user_id"].tolist() == pu["user_id"].tolist()

    def thresholds(vals):
        v = sorted(vals)
        n = len(v)
        return [v[(n - 1) * p // 100] for p in (20, 40, 60, 80)]

    def quint(x, th):
        return 1 + sum(x > t for t in th)

    tr = thresholds(pu["last_ts"])
    tf = thresholds(pu["cnt"])
    tm = thresholds(pu["sum_cents"])
    for i in range(len(pu)):
        r = quint(pu["last_ts"][i], tr)
        f = quint(pu["cnt"][i], tf)
        m = quint(pu["sum_cents"][i], tm)
        assert (out["r"][i], out["f"][i], out["m"][i]) == (r, f, m)
        assert out["rfm"][i] == 100 * r + 10 * f + m
    assert set(out["r"]) <= set(range(1, 6))


def test_bigram_familiarity_matches_python(ray_session):
    import ray

    from tsdownsample_ray.stages.vocab import bigram_familiarity

    texts = ["a b c a b", "a b", "x y z", "q"]
    tbl = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                    "text": pa.array(texts)})
    from collections import Counter
    occ = []
    for did, t in enumerate(texts):
        w = t.split(" ")
        occ += [(did, f"{w[i]} {w[i+1]}") for i in range(len(w) - 1)]
    cnt = Counter(bg for _, bg in occ)
    exp = {}
    for did in range(4):
        bgs = [bg for d, bg in occ if d == did]
        if not bgs:
            continue  # doc 'q' has no bigrams -> absent
        fam = sum(cnt[bg] for bg in bgs)
        exp[did] = (len(bgs), fam, (1000 * fam) // len(bgs))

    for nparts in (1, 3):
        ds = ray.data.from_arrow(tbl).repartition(nparts)
        out = bigram_familiarity(ds, fanin=2, num_partitions=2).to_pandas()
        got = {r["doc_id"]: (r["n_bg"], r["fam_sum"], r["fam_mean_pm"])
               for _, r in out.iterrows()}
        assert got == exp


def test_json_props_extraction(ray_session):
    """RE2 JSON extraction: malformed rows dropped, trunc-div decade
    bins, exact sums — vs a python json replay."""
    import json as _json

    import ray

    from tsdownsample_ray.pipelines.queries import q_json_props_events

    sf = "/root/testdata/sf0.001"
    out = q_json_props_events(sf).to_pandas()
    import duckdb
    rows = duckdb.sql(f"SELECT event_type, props FROM "
                      f"'{sf}/events.parquet'").fetchall()
    from collections import defaultdict
    exp = defaultdict(lambda: [0, 0])
    for et, pr in rows:
        k = _json.loads(pr)["k"]
        kbin = k // 10 if k >= 0 else -((-k) // 10)
        exp[(et, kbin)][0] += k
        exp[(et, kbin)][1] += 1
    got = {(r["event_type"], r["kbin"]): (r["sum_k"], r["n"])
           for _, r in out.iterrows()}
    assert got == {k: tuple(v) for k, v in exp.items()}


def test_ed1_pairs_fastss_complete(ray_session):
    """FastSS candidate generation + exact verify finds EXACTLY the
    Levenshtein<=1 pairs (substitution, insertion, deletion; the
    shared-variant false positive 'ab'/'ba' is rejected)."""
    import itertools

    import ray

    from tsdownsample_ray.stages.strsim import _ed_le1, ed1_pairs

    terms = ["cat", "cut", "cart", "car", "dog", "dig", "ab", "ba",
             "hello", "hallo", "hell", "xyz"]
    tbl = pa.table({"token": pa.array(terms)})

    def lev(a, b):
        m = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
        for i in range(len(a) + 1):
            m[i][0] = i
        for j in range(len(b) + 1):
            m[0][j] = j
        for i in range(1, len(a) + 1):
            for j in range(1, len(b) + 1):
                m[i][j] = min(m[i - 1][j] + 1, m[i][j - 1] + 1,
                              m[i - 1][j - 1] + (a[i - 1] != b[j - 1]))
        return m[len(a)][len(b)]

    expect = {tuple(sorted(p)) for p in itertools.combinations(terms, 2)
              if lev(*p) <= 1}
    assert ("ab", "ba") not in expect  # distance 2 guard
    for a, b in itertools.combinations(terms, 2):
        assert _ed_le1(a, b) == (lev(a, b) <= 1), (a, b)

    for nparts in (1, 3):
        ds = ray.data.from_arrow(tbl).repartition(nparts)
        out = ed1_pairs(ds, num_partitions=2).to_pandas()
        got = {tuple(sorted((r["a"], r["b"]))) for _, r in out.iterrows()}
        assert got == expect
        assert len(out) == len(expect)  # distinct: no duplicate pairs
