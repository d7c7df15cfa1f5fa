"""Distributed byte-pair-encoding merge training — the tokenizer-training
step proper (the precursor tables live in ``stages/vocab.py``).

Following Sennrich et al. 2016's key reduction: BPE training never needs
the corpus, only the WORD VOCABULARY with counts. The engine therefore
trains on the ``(word, n)`` table (Heap's law: vastly smaller than the
corpus, but still a Dataset — at web scale the word vocab alone is
billions of rows, so it stays distributed).

Per merge step (inherently sequential — each merge changes the next
step's pair statistics; this is BPE's defining data dependency):

1. adjacent-pair counts: one vectorized pass per block over the
   space-joined symbol strings (ListArray offsets arithmetic, weight =
   word count), in-block pre-aggregation, ONE hashpart grouped sum;
2. best pair = global (count DESC, left ASC, right ASC) — a distributed
   sort + limit(1), materialized to the driver (one row);
3. merge applied corpus-wide as ONE literal substring replace per block
   (`" l r " -> " lr "` on sentinel-space-wrapped strings) — left-to-right
   non-overlapping, which IS the BPE merge convention, and exactly what
   SQL ``replace()`` does, making every step SQL-replayable.

k merges = k (pair-count shuffle + tiny sort + map) rounds; the word
table is re-materialized each round so no lineage chain builds up.

Divergences from the textbook BPE formulation, both documented and
CONSISTENT on the Ray and SQL sides:

- no ``</w>`` end-of-word marker (add one by pre-suffixing words);
- the merge convention is string-replace left-to-right non-overlap on
  the delimited form ``" l r " -> " lr "`` — for a run of >=3 identical
  symbols (``"aaa"`` under merge (a,a)) this yields ``"aa a"`` where a
  list-scan merge yields the same, but for 4+ (``"aaaa"``) it yields
  ``"aa a a"`` after one pass where a list scan yields ``"aa aa"``
  (the consumed delimiter hides the follow-on pair until the NEXT merge
  round re-selects it). Tokenizer implementations genuinely differ
  here; this operator pins the replace convention because it is exactly
  SQL ``replace()``'s semantic, keeping every training step
  oracle-replayable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["symbolize_words", "train_bpe"]


def symbolize_words(ds, *, word_col: str = "word", n_col: str = "n"):
    """(word, n) -> (tok, n) with ``tok`` the sentinel-space-wrapped
    character sequence: ``"fox" -> " f o x "``."""

    def _sym(b: pa.Table) -> pa.Table:
        spaced = pc.replace_substring_regex(b[word_col], "(.)", r"\1 ")
        tok = pc.binary_join_element_wise(" ", spaced, "")
        return pa.table({"tok": tok, n_col: b[n_col]})

    return ds.map_batches(_sym, batch_format="pyarrow")


def _pair_counts_batch(b: pa.Table, n_col: str) -> pa.Table:
    toks = pc.split_pattern(pc.utf8_trim(b["tok"], " "), " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.values
    off = toks.offsets.to_numpy().astype(np.int64)
    n_sym = np.diff(off)
    n_pairs = np.maximum(n_sym - 1, 0)
    if int(n_pairs.sum()) == 0:
        return pa.table({"left": pa.array([], pa.string()),
                         "right": pa.array([], pa.string()),
                         "w": pa.array([], pa.int64())})
    # left positions: every flat index except each word's last symbol
    keep = np.ones(len(flat), dtype=bool)
    keep[off[1:] - 1] = False
    li = np.flatnonzero(keep)
    w = b[n_col].to_numpy(zero_copy_only=False).astype(np.int64)
    t = pa.table({"left": flat.take(pa.array(li)),
                  "right": flat.take(pa.array(li + 1)),
                  "w": pa.array(np.repeat(w, n_pairs))})
    g = t.group_by(["left", "right"]).aggregate([("w", "sum")])
    from ..arrow_utils import rename_agg

    return rename_agg(g, {"left": "left", "right": "right", "w_sum": "w"})


def train_bpe(words_ds, *, merges: int, n_col: str = "n",
              num_partitions: int = 8):
    """Returns ``(merges_table, final_words_ds)``: ``merges_table`` is a
    pyarrow Table ``(step, left, right, merged, pair_count)`` with one
    row per learned merge (stops early when no pair repeats);
    ``final_words_ds`` is the word Dataset with ``tok`` re-segmented
    under all learned merges."""
    from .graph import grouped_sum_parts

    state = symbolize_words(words_ds, n_col=n_col).materialize()
    out = {"step": [], "left": [], "right": [], "merged": [],
           "pair_count": []}
    for step in range(1, merges + 1):
        counts = grouped_sum_parts(
            state.map_batches(lambda b: _pair_counts_batch(b, n_col),
                              batch_format="pyarrow"),
            ["left", "right"], ["w"], count_col=None,
            fanin=num_partitions)
        best = counts.sort(key=["w", "left", "right"],
                           descending=[True, False, False]).limit(
            1).to_pandas()
        if best.empty or int(best["w"].iloc[0]) < 2:
            break
        left, right = str(best["left"].iloc[0]), str(best["right"].iloc[0])
        cnt = int(best["w"].iloc[0])
        out["step"].append(step)
        out["left"].append(left)
        out["right"].append(right)
        out["merged"].append(left + right)
        out["pair_count"].append(cnt)
        pat, rep = f" {left} {right} ", f" {left}{right} "

        def _apply(b: pa.Table, pat=pat, rep=rep) -> pa.Table:
            return pa.table({
                "tok": pc.replace_substring(b["tok"], pat, rep),
                n_col: b[n_col]})

        state = state.map_batches(_apply,
                                  batch_format="pyarrow").materialize()
    return pa.table({k: pa.array(v) for k, v in out.items()}), state


def tokenize_docs(docs_ds, merges_tbl: pa.Table, *,
                  text_col: str = "text", id_col: str = "doc_id"):
    """Apply learned merges to whole documents, purely map-side: each doc
    is char-symbolized with the original spaces widening to a 3-space
    word boundary no ``" l r "`` pattern can span, then every merge
    replays in training order as one literal replace per block. Output:
    ``(id_col, n_words, n_tokens_bpe, first_tok, last_tok)`` — the
    compression diagnostic a tokenizer rollout needs (words vs BPE
    tokens), plus boundary tokens as a content check."""
    pats = [(f" {l} {r} ", f" {l}{r} ")
            for l, r in zip(merges_tbl["left"].to_pylist(),
                            merges_tbl["right"].to_pylist())]

    def _tok(b: pa.Table) -> pa.Table:
        spaced = pc.replace_substring_regex(b[text_col], "(.)", r"\1 ")
        tok = pc.binary_join_element_wise(" ", spaced, "")
        for pat, rep in pats:
            tok = pc.replace_substring(tok, pat, rep)
        parts = pc.split_pattern(tok, " ")
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        flat = parts.values
        off = parts.offsets.to_numpy().astype(np.int64)
        nonempty = (pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
                    .astype(np.int64))
        cum = np.concatenate(([0], np.cumsum(nonempty)))
        n_tok = cum[off[1:]] - cum[off[:-1]]
        # first/last non-empty symbol per doc via masked min/max position
        posn = np.arange(len(flat), dtype=np.int64)
        big = len(flat) + 1
        first_idx = np.minimum.reduceat(
            np.where(nonempty > 0, posn, big), off[:-1])
        last_idx = np.maximum.reduceat(
            np.where(nonempty > 0, posn, -1), off[:-1])
        has = n_tok > 0
        first = pc.if_else(
            pa.array(has),
            flat.take(pa.array(np.where(has, first_idx, 0))),
            pa.scalar("", pa.string()))
        last = pc.if_else(
            pa.array(has),
            flat.take(pa.array(np.where(has, last_idx, 0))),
            pa.scalar("", pa.string()))
        words = pc.split_pattern(b[text_col], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        woff = words.offsets.to_numpy().astype(np.int64)
        wflat_ne = (pc.not_equal(words.values, "")
                    .to_numpy(zero_copy_only=False).astype(np.int64))
        wcum = np.concatenate(([0], np.cumsum(wflat_ne)))
        n_words = wcum[woff[1:]] - wcum[woff[:-1]]
        return pa.table({id_col: b[id_col],
                         "n_words": pa.array(n_words),
                         "n_tokens_bpe": pa.array(n_tok),
                         "first_tok": first, "last_tok": last})

    return docs_ds.map_batches(_tok, batch_format="pyarrow")
