"""Overlapping k-gram ops: brute-force replays, boundary masking,
partitioning invariance."""

import numpy as np
import pandas as pd


def _brute_windows(rows, k):
    out = []
    for r in rows:
        toks = r["text"].split(" ")
        for i in range(len(toks) - k + 1):
            out.append((r["doc_id"], " ".join(toks[i:i + k])))
    return out


def test_dup_windows_matches_bruteforce(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.grams import dup_windows

    rng = np.random.default_rng(7)
    vocab = ["a", "b", "c", "d", "e"]
    rows = [{"doc_id": int(i),
             "text": " ".join(rng.choice(vocab, rng.integers(3, 20)))}
            for i in range(300)]
    rows.append({"doc_id": 300, "text": "a b"})  # shorter than k
    ds = rd.from_pandas(pd.DataFrame(rows)).repartition(6)
    out = dup_windows(ds, k=3, min_docs=2, num_partitions=3) \
        .to_pandas().set_index("gram").sort_index()

    pairs = _brute_windows(rows, 3)
    exp = {}
    for d, g in pairs:
        e = exp.setdefault(g, {"docs": set(), "occ": 0})
        e["docs"].add(d)
        e["occ"] += 1
    exp = {g: e for g, e in exp.items() if len(e["docs"]) >= 2}
    assert set(out.index) == set(exp)
    for g, e in exp.items():
        assert out.loc[g, "n_docs"] == len(e["docs"])
        assert out.loc[g, "n_occ"] == e["occ"]
        assert out.loc[g, "min_doc"] == min(e["docs"])


def test_dup_windows_partition_invariance(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.grams import dup_windows

    rng = np.random.default_rng(11)
    vocab = ["x", "y", "z"]
    rows = [{"doc_id": int(i),
             "text": " ".join(rng.choice(vocab, rng.integers(2, 12)))}
            for i in range(120)]
    outs = []
    for nb, npart in ((2, 2), (9, 5)):
        ds = rd.from_pandas(pd.DataFrame(rows)).repartition(nb)
        outs.append(dup_windows(ds, k=2, min_docs=2,
                                num_partitions=npart).to_pandas()
                    .sort_values("gram").reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_source_boilerplate_cross_multiplied_threshold(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.grams import source_boilerplate_grams

    # srcA: "p q" in 3/5 docs (>= 1/5, df >= 3 -> kept), "q r" in 2/5
    # (df < 3 -> dropped); srcB: "p q" in 1/4 (df < 3 -> dropped)
    rows = [
        {"doc_id": 0, "source": "srcA", "text": "p q m"},
        {"doc_id": 1, "source": "srcA", "text": "m p q"},
        {"doc_id": 2, "source": "srcA", "text": "p q r"},
        {"doc_id": 3, "source": "srcA", "text": "q r m"},
        {"doc_id": 4, "source": "srcA", "text": "m m m"},
        {"doc_id": 5, "source": "srcB", "text": "p q"},
        {"doc_id": 6, "source": "srcB", "text": "u v"},
        {"doc_id": 7, "source": "srcB", "text": "v u"},
        {"doc_id": 8, "source": "srcB", "text": "u u"},
    ]
    ds = rd.from_pandas(pd.DataFrame(rows)).repartition(3)
    out = source_boilerplate_grams(
        ds, k=2, min_df=3, frac_num=1, frac_den=5,
        num_partitions=2).to_pandas()
    got = {(r.source, r.gram): (r.df, r.src_docs)
           for r in out.itertuples()}
    assert got == {("srcA", "p q"): (3, 5)}


def test_char_windows_match_bruteforce(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.grams import dup_windows

    rng = np.random.default_rng(11)
    alpha = list("abcd") + ["é", "漢"]  # exercises the utf-32 char path
    rows = [{"doc_id": int(i),
             "text": "".join(rng.choice(alpha, rng.integers(0, 30)))}
            for i in range(200)]
    L = 4
    ds = rd.from_pandas(pd.DataFrame(rows)).repartition(5)
    out = dup_windows(ds, k=L, min_docs=2, num_partitions=3,
                      unit="char").to_pandas().set_index("gram")

    exp = {}
    for r in rows:
        t = r["text"]
        for i in range(len(t) - L + 1):
            e = exp.setdefault(t[i:i + L], {"docs": set(), "occ": 0})
            e["docs"].add(r["doc_id"])
            e["occ"] += 1
    exp = {g: e for g, e in exp.items() if len(e["docs"]) >= 2}
    assert set(out.index) == set(exp)
    for g, e in exp.items():
        assert out.loc[g, "n_docs"] == len(e["docs"])
        assert out.loc[g, "n_occ"] == e["occ"]
        assert out.loc[g, "min_doc"] == min(e["docs"])
