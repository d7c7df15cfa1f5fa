"""Text analysis operators: language ID, quality scoring, token counting,
document fingerprinting. All vectorized or cheap-per-row, deterministic.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["token_stats_batch", "LangId", "fingerprint_batch", "quality_batch"]

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

    def __init__(self):
        self.profiles = {k: frozenset(v) for k, v in self.PROFILES.items()}

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
        return best if scores[best] > 0 else "und"

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
