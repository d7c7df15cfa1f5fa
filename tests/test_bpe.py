"""BPE merge training (stages/bpe.py) vs a Python replay of the same
string-replace merge convention."""

import pyarrow as pa
import pytest

ray = pytest.importorskip("ray")
import ray.data as rd  # noqa: E402


def _replay(words, merges):
    """Same convention as the operator: space-delimited symbols, literal
    ' l r ' -> ' lr ' replace, best pair = (count DESC, left, right)."""
    state = {(" " + " ".join(w) + " "): n for w, n in words.items()}
    out = []
    for step in range(1, merges + 1):
        counts = {}
        for tok, n in state.items():
            syms = tok.split()
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + n
        if not counts:
            break
        (l, r), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < 2:
            break
        out.append((step, l, r, l + r, c))
        state = {tok.replace(f" {l} {r} ", f" {l}{r} "): n
                 for tok, n in state.items()}
    return out, state


def test_bpe_matches_replay(ray_session):
    from tsdownsample_ray.stages.bpe import train_bpe

    words = {"low": 5, "lower": 2, "newest": 6, "widest": 3, "new": 4}
    ds = rd.from_arrow(pa.table({"word": list(words),
                                 "n": list(words.values())})).repartition(2)
    merges, final = train_bpe(ds, merges=6, num_partitions=2)
    exp, exp_state = _replay(words, 6)
    got = list(zip(merges["step"].to_pylist(), merges["left"].to_pylist(),
                   merges["right"].to_pylist(),
                   merges["merged"].to_pylist(),
                   merges["pair_count"].to_pylist()))
    assert got == exp
    fin = dict(zip(final.to_pandas()["tok"], final.to_pandas()["n"]))
    assert fin == exp_state


def test_bpe_early_stop(ray_session):
    from tsdownsample_ray.stages.bpe import train_bpe

    # every word is a single char: no pairs at all -> zero merges
    ds = rd.from_arrow(pa.table({"word": ["a", "b"], "n": [3, 2]}))
    merges, _ = train_bpe(ds, merges=3, num_partitions=1)
    assert merges.num_rows == 0


def test_tokenize_docs(ray_session):
    from tsdownsample_ray.stages.bpe import tokenize_docs

    merges = pa.table({"step": [1, 2], "left": ["l", "o"],
                       "right": ["o", "w"], "merged": ["lo", "ow"],
                       "pair_count": [9, 9]})
    # merge 1: l o -> lo ; merge 2: o w -> ow (only where o survives)
    docs = pa.table({"doc_id": [1, 2, 3],
                     "text": ["low slow", "own", ""]})
    out = tokenize_docs(rd.from_arrow(docs),
                        merges).to_pandas().set_index("doc_id")
    # "low" -> l o w -> lo w ; "slow" -> s l o w -> s lo w
    assert out.loc[1, "n_words"] == 2
    assert out.loc[1, "n_tokens_bpe"] == 2 + 3
    assert out.loc[1, "first_tok"] == "lo"
    assert out.loc[1, "last_tok"] == "w"
    # "own" -> o w n -> ow n (merge 1 doesn't apply, merge 2 does)
    assert out.loc[2, "n_tokens_bpe"] == 2
    assert out.loc[2, "first_tok"] == "ow"
    assert out.loc[3, "n_words"] == 0
    assert out.loc[3, "n_tokens_bpe"] == 0
    assert out.loc[3, "first_tok"] == ""
