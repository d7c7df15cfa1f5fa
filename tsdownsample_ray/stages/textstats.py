"""Text analysis operators: language ID, quality scoring, token counting,
document fingerprinting. All vectorized or cheap-per-row, deterministic.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["token_stats_batch", "LangId", "fingerprint_batch",
           "quality_batch", "BpeishTokenizer"]

# GPT-2-style pretokenizer pattern (contractions, letter runs, digit runs,
# punctuation runs, whitespace) — the "BPE-ish regex" token count
_BPEISH = (r"'s|'t|'re|'ve|'m|'ll|'d"
           r"| ?[^\W\d_]+| ?\d+| ?[^\s\w]+|\s+(?!\S)|\s+")


class BpeishTokenizer:
    """Actor-pool stage: compiled-regex token counting (the pattern compile
    is the one-time ``__init__`` state)."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.pat = re.compile(_BPEISH)
        self.id_col = id_col
        self.text_col = text_col

    def count(self, text: str) -> int:
        return sum(1 for _ in self.pat.finditer(text))

    def __call__(self, batch: pa.Table) -> pa.Table:
        counts = [self.count(t) for t in batch[self.text_col].to_pylist()]
        return pa.table({
            self.id_col: batch[self.id_col],
            "n_bpeish_tokens": pa.array(counts, pa.int64()),
        })

_MOD = (1 << 61) - 1
_BASE = 1_000_003


def token_stats_batch(batch: pa.Table, *, text_col: str = "text",
                      id_col: str = "doc_id") -> pa.Table:
    """Exact integer token statistics (single-space-tokenized corpora;
    SQL-oracle-able)."""
    text = batch[text_col]
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    spaces = pc.cast(pc.count_substring(text, " "), pa.int64())
    n_tokens = pc.add(spaces, 1)
    letters = pc.subtract(n_chars, spaces)
    mean_tok = pc.divide(pc.cast(letters, pa.float64()),
                         pc.cast(n_tokens, pa.float64()))
    return pa.table({
        id_col: batch[id_col],
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_token_len": mean_tok,
    })


class LangId:
    """Stopword-profile language guess (en/de/fr/es/zh) — an actor-pool
    stage: profiles built once per actor. Heuristic, so no SQL oracle; the
    pytest checks determinism and sane behavior on genuine samples."""

    PROFILES = {
        "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for"},
        "de": {"der", "die", "und", "das", "ist", "nicht", "ein", "mit", "zu"},
        "fr": {"le", "la", "et", "les", "des", "est", "une", "pas", "que"},
        "es": {"el", "la", "de", "que", "los", "una", "es", "por", "con"},
    }

    # characteristic char n-grams per language (the n-gram fallback when no
    # stopword hits — e.g. short fragments)
    NGRAMS = {
        "en": ("th", "he", "ing", "ed ", " of"),
        "de": ("ch", "ei", "sch", "und", "en "),
        "fr": ("es ", "ait", "oi", " de", "qu"),
        "es": ("os ", " el", "ción", " de", "ar "),
    }

    def __init__(self):
        self.profiles = {k: frozenset(v) for k, v in self.PROFILES.items()}
        self.ngrams = dict(self.NGRAMS)

    def _guess(self, text: str) -> str:
        toks = text.lower().split()
        if not toks:
            return "und"  # undetermined
        # CJK heuristic: any han codepoint dominates
        han = sum(1 for ch in text if "一" <= ch <= "鿿")
        if han > len(text) * 0.2:
            return "zh"
        scores = {k: sum(t in p for t in toks) for k, p in self.profiles.items()}
        best = max(scores, key=lambda k: (scores[k], k))
        if scores[best] > 0:
            return best
        # n-gram heuristic fallback
        low = text.lower()
        ng = {k: sum(low.count(g) for g in gs) for k, gs in self.ngrams.items()}
        best = max(ng, key=lambda k: (ng[k], k))
        return best if ng[best] > 0 else "und"

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = [self._guess(t) for t in batch["text"].to_pylist()]
        return batch.append_column("lang_pred", pa.array(preds, pa.string()))


def fingerprint_batch(batch: pa.Table, *, text_col: str = "text",
                      id_col: str = "doc_id") -> pa.Table:
    """Polynomial rolling hash mod 2^61-1 of the full text (stable document
    fingerprint; two byte-identical docs share it, any byte change flips it)."""
    fps = []
    for t in batch[text_col].to_pylist():
        h = 0
        for b in t.encode():
            h = (h * _BASE + b) % _MOD
        fps.append(h)
    return pa.table({
        id_col: batch[id_col],
        "fingerprint": pa.array(np.array(fps, dtype=np.uint64).view(np.int64)),
    })


def quality_batch(batch: pa.Table, *, text_col: str = "text",
                  id_col: str = "doc_id") -> pa.Table:
    """Heuristic quality signals: length, token stats, stopword ratio,
    uppercase/punct ratios. (Richer than token_stats; rows-only check.)"""
    stop = LangId.PROFILES["en"]
    ids = batch[id_col]
    rows = {"n_chars": [], "n_tokens": [], "stopword_ratio": [],
            "punct_ratio": [], "upper_ratio": []}
    for t in batch[text_col].to_pylist():
        toks = t.split()
        n = len(t)
        rows["n_chars"].append(n)
        rows["n_tokens"].append(len(toks))
        rows["stopword_ratio"].append(
            sum(tok in stop for tok in toks) / max(1, len(toks)))
        rows["punct_ratio"].append(
            sum(not c.isalnum() and not c.isspace() for c in t) / max(1, n))
        rows["upper_ratio"].append(sum(c.isupper() for c in t) / max(1, n))
    return pa.table({id_col: ids, **{k: pa.array(v) for k, v in rows.items()}})
