"""Text analysis operators: language ID, quality scoring, token counting,
document fingerprinting. All vectorized or cheap-per-row, deterministic.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["token_stats_batch", "LangId", "fingerprint_batch",
           "quality_batch", "BpeishTokenizer", "kwic",
           "readability_batch",
           "rake_word_scores", "term_adaptation",
           "log_odds_contrast"]

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


# growing power table BASE^k mod M (built with exact Python ints, read as
# uint64 — every value < 2^61)
_POWS = np.ones(1, dtype=np.uint64)


def _powers(n: int) -> np.ndarray:
    global _POWS
    if len(_POWS) < n:
        ext, h = [], int(_POWS[-1])
        for _ in range(n - len(_POWS)):
            h = (h * _BASE) % _MOD
            ext.append(h)
        _POWS = np.concatenate([_POWS, np.array(ext, dtype=np.uint64)])
    return _POWS


def _mulmod_byte(b: np.ndarray, p: np.ndarray) -> np.ndarray:
    """(b * p) mod 2^61-1 for b < 2^21 (bytes OR unicode codepoints),
    p < 2^61, fully in uint64.

    Split p = hi*2^32 + lo; b*lo < 2^53 needs no reduction, and
    (b*hi)*2^32 reduces with 2^61 === 1 (mod M): t*2^32 =
    (t>>29)*2^61 + (t & (2^29-1))*2^32 === (t>>29) + (t&mask)<<32."""
    t = (p >> np.uint64(32)) * b                       # < 2^50
    hi = (t >> np.uint64(29)) + ((t & np.uint64((1 << 29) - 1))
                                 << np.uint64(32))     # < 2^61 + 2^21
    v = hi + (p & np.uint64(0xFFFFFFFF)) * b           # < 2^61+2^53+2^21 < 2M
    return np.where(v >= _MOD, v - np.uint64(_MOD), v)


def _modsum(v: np.ndarray) -> int:
    """Tree-sum of values < M without overflow (pairwise add + one
    conditional subtract per level; a+b < 2M always)."""
    while len(v) > 1:
        if len(v) & 1:
            v = np.concatenate([v, np.zeros(1, np.uint64)])
        v = v[0::2] + v[1::2]
        v = np.where(v >= _MOD, v - np.uint64(_MOD), v)
    return int(v[0]) if len(v) else 0


def fingerprint_batch(batch: pa.Table, *, text_col: str = "text",
                      id_col: str = "doc_id") -> pa.Table:
    """Polynomial rolling hash mod 2^61-1 of the full text (stable document
    fingerprint; two byte-identical docs share it, any byte change flips
    it). Vectorized: h = sum(byte_i * BASE^(n-1-i)) mod M via a power table
    and branch-free uint64 modular arithmetic — equal to the byte-Horner
    definition (pytest-pinned) at ~vector throughput."""
    texts = batch[text_col].to_pylist()
    pows = _powers(max((len(t) for t in texts), default=1)
                   * 4 + 1)  # *4: worst-case utf-8 bytes per char
    fps = []
    for t in texts:
        codes = np.frombuffer(t.encode(), dtype=np.uint8).astype(np.uint64)
        n = len(codes)
        fps.append(_modsum(_mulmod_byte(codes, pows[n - 1::-1])) if n else 0)
    return pa.table({
        id_col: batch[id_col],
        "fingerprint": pa.array(np.array(fps, dtype=np.uint64).view(np.int64)),
    })


# byte-class tables matching Python's str.isalnum/isspace/isupper for the
# ASCII range (non-ASCII rows take the exact per-row fallback below)
_IS_PUNCT = np.array([not chr(i).isalnum() and not chr(i).isspace()
                      for i in range(128)] + [False] * 128, dtype=np.int64)
_IS_UPPER = np.array([chr(i).isupper() for i in range(128)] + [False] * 128,
                     dtype=np.int64)


def _seg_counts(flags: np.ndarray, starts: np.ndarray,
                ends: np.ndarray) -> np.ndarray:
    """Per-segment sums of ``flags`` (safe for empty segments)."""
    cs = np.concatenate([[0], np.cumsum(flags)])
    return cs[ends] - cs[starts]


def _quality_row(t: str, stop: frozenset) -> tuple:
    toks = t.split()
    n = len(t)
    return (n, len(toks),
            sum(tok in stop for tok in toks) / max(1, len(toks)),
            sum(not c.isalnum() and not c.isspace() for c in t) / max(1, n),
            sum(c.isupper() for c in t) / max(1, n))


def quality_batch(batch: pa.Table, *, text_col: str = "text",
                  id_col: str = "doc_id") -> pa.Table:
    """Heuristic quality signals: length, token stats, stopword ratio,
    uppercase/punct ratios. Vectorized over the Arrow string column's raw
    UTF-8 buffer (zero-copy byte-class lookups + cumsum segment counts);
    rows containing non-ASCII take an exact per-row fallback so outputs
    match the reference Python semantics bit-for-bit."""
    stop = frozenset(LangId.PROFILES["en"])
    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    # absolute byte offsets into the (possibly shared) utf-8 data buffer —
    # correct for sliced/offset arrays without copying
    odt = np.int32 if pa.types.is_string(text.type) else np.int64
    off_buf = np.frombuffer(text.buffers()[1], dtype=odt)
    offsets = off_buf[text.offset: text.offset + len(text) + 1].astype(np.int64)
    data = np.frombuffer(text.buffers()[2], dtype=np.uint8)
    starts, ends = offsets[:-1], offsets[1:]

    n_bytes = ends - starts
    non_ascii = _seg_counts((data >= 128).astype(np.int64), starts, ends) > 0
    punct = _seg_counts(_IS_PUNCT[data], starts, ends)
    upper = _seg_counts(_IS_UPPER[data], starts, ends)

    toks = pc.utf8_split_whitespace(text)
    tok_off = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = toks.values  # absolute indexing to match .offsets
    valid = pc.invert(pc.equal(pc.utf8_length(flat), 0))  # drop edge empties
    is_stop = pc.and_(valid, pc.is_in(flat, value_set=pa.array(sorted(stop))))
    n_tok = _seg_counts(valid.to_numpy(zero_copy_only=False).astype(np.int64),
                        tok_off[:-1], tok_off[1:])
    stop_hits = _seg_counts(
        is_stop.to_numpy(zero_copy_only=False).astype(np.int64),
        tok_off[:-1], tok_off[1:])

    n_chars = n_bytes.copy()  # == len(t) for pure-ASCII rows
    stop_ratio = stop_hits / np.maximum(1, n_tok)
    punct_ratio = punct / np.maximum(1, n_chars)
    upper_ratio = upper / np.maximum(1, n_chars)

    if non_ascii.any():  # exact Python semantics for non-ASCII rows
        for i in np.flatnonzero(non_ascii):
            (n_chars[i], n_tok[i], stop_ratio[i], punct_ratio[i],
             upper_ratio[i]) = _quality_row(text[i].as_py(), stop)

    return pa.table({
        id_col: batch[id_col],
        "n_chars": pa.array(n_chars, pa.int64()),
        "n_tokens": pa.array(n_tok, pa.int64()),
        "stopword_ratio": pa.array(stop_ratio, pa.float64()),
        "punct_ratio": pa.array(punct_ratio, pa.float64()),
        "upper_ratio": pa.array(upper_ratio, pa.float64()),
    })


def repetition_batch(batch: pa.Table, *, text_col: str = "text",
                     id_col: str = "doc_id") -> pa.Table:
    """Gopher-style repetition signals per document (Rae et al. 2021,
    "Scaling Language Models" §A1.1 repetition filters, adapted to the
    word level): fraction of word occurrences that are duplicates inside
    the doc, the most-frequent word/bigram and the fraction of
    occurrences it accounts for. Ties on the top count break to the
    lexicographically smallest word / bigram string (binary collation,
    matching DuckDB's default).

    Fully vectorized per BATCH (never a per-doc loop): one
    ``split_pattern`` explode, dictionary-encoded word codes, and
    ``np.unique``/``lexsort`` segment reductions over (doc, code) keys.
    Purely map-side — stat computation needs no shuffle at any scale."""
    n_docs = batch.num_rows
    empty = {
        id_col: batch[id_col],
        "n_words": pa.array([], pa.int64()),
        "n_bigrams": pa.array([], pa.int64()),
        "dup_word_frac": pa.array([], pa.float64()),
        "top_word": pa.array([], pa.string()),
        "top_word_frac": pa.array([], pa.float64()),
        "dup_bigram_frac": pa.array([], pa.float64()),
        "top_bigram": pa.array([], pa.string()),
        "top_bigram_frac": pa.array([], pa.float64()),
    }
    if n_docs == 0:
        return pa.table(empty)

    words = pc.split_pattern(batch[text_col], " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    flat = words.values
    off = words.offsets.to_numpy().astype(np.int64)
    n_words = np.diff(off)  # >= 1 (split('') == [''])
    doc_rep = np.repeat(np.arange(n_docs), n_words)

    d = flat.dictionary_encode()
    dict_vals = d.dictionary.to_numpy(zero_copy_only=False)
    rank = np.empty(len(dict_vals), dtype=np.int64)
    rank[np.argsort(dict_vals)] = np.arange(len(dict_vals))
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)

    # ---- words: key = doc*K + code (unique per (doc, word)) --------------
    K = len(dict_vals)
    wkeys = doc_rep * K + codes
    u, inv, cnt = np.unique(wkeys, return_inverse=True, return_counts=True)
    dup_w = np.bincount(doc_rep, weights=cnt[inv] > 1, minlength=n_docs)
    u_doc = u // K
    u_code = u % K
    order = np.lexsort((rank[u_code], -cnt, u_doc))
    heads = np.ones(len(order), dtype=bool)
    heads[1:] = u_doc[order][1:] != u_doc[order][:-1]
    top_w_cnt = np.zeros(n_docs, dtype=np.int64)
    top_w_code = np.zeros(n_docs, dtype=np.int64)
    top_w_cnt[u_doc[order][heads]] = cnt[order][heads]
    top_w_code[u_doc[order][heads]] = u_code[order][heads]
    top_word = d.dictionary.take(pa.array(top_w_code))

    # ---- bigrams: adjacent word pairs within a doc ------------------------
    valid = doc_rep[:-1] == doc_rep[1:] if len(doc_rep) else np.empty(0, bool)
    n_bigrams = n_words - 1  # == per-doc count of valid positions
    bg_doc = doc_rep[:-1][valid]
    c1 = codes[:-1][valid]
    c2 = codes[1:][valid]
    bg_key = (bg_doc * K + c1) * K + c2
    top_bigram = pa.nulls(n_docs, pa.string())
    dup_b = np.zeros(n_docs, dtype=np.float64)
    top_b_cnt = np.zeros(n_docs, dtype=np.int64)
    if len(bg_key):
        ub, binv, bcnt = np.unique(bg_key, return_inverse=True,
                                   return_counts=True)
        dup_b = np.bincount(bg_doc, weights=bcnt[binv] > 1,
                            minlength=n_docs)
        ub_doc = ub // (K * K)
        ub_c1 = (ub // K) % K
        ub_c2 = ub % K
        border = np.lexsort((rank[ub_c2], rank[ub_c1], -bcnt, ub_doc))
        bheads = np.ones(len(border), dtype=bool)
        bheads[1:] = ub_doc[border][1:] != ub_doc[border][:-1]
        hd = ub_doc[border][bheads]
        top_b_cnt[hd] = bcnt[border][bheads]
        w1 = d.dictionary.take(pa.array(ub_c1[border][bheads]))
        w2 = d.dictionary.take(pa.array(ub_c2[border][bheads]))
        joined = pc.binary_join_element_wise(w1, " ", w2, "")
        tb = np.full(n_docs, None, dtype=object)
        tb[hd] = joined.to_numpy(zero_copy_only=False)
        top_bigram = pa.array(tb, pa.string())

    nb_safe = np.maximum(1, n_bigrams).astype(np.float64)
    return pa.table({
        id_col: batch[id_col],
        "n_words": pa.array(n_words, pa.int64()),
        "n_bigrams": pa.array(n_bigrams, pa.int64()),
        "dup_word_frac": pa.array(dup_w / n_words.astype(np.float64),
                                  pa.float64()),
        "top_word": top_word,
        "top_word_frac": pa.array(
            top_w_cnt.astype(np.float64) / n_words.astype(np.float64),
            pa.float64()),
        "dup_bigram_frac": pa.array(
            np.where(n_bigrams > 0, dup_b / nb_safe, 0.0), pa.float64()),
        "top_bigram": top_bigram,
        "top_bigram_frac": pa.array(
            np.where(n_bigrams > 0, top_b_cnt.astype(np.float64) / nb_safe,
                     0.0), pa.float64()),
    })


def normalize_text_batch(batch: pa.Table, *, text_col: str = "text",
                         id_col: str = "doc_id") -> pa.Table:
    """Canonical text normalization for corpus hygiene: Unicode NFC
    composition -> lowercase -> collapse ASCII whitespace runs to one
    space -> trim. Map-side; lower/replace/trim are Arrow kernels over
    the utf-8 buffer. NFC itself falls back to ``unicodedata`` for the
    NON-ASCII rows only (mask via ``string_is_ascii``; NFC is the
    identity on ASCII, so ASCII rows never leave Arrow) because this
    pyarrow's ``utf8_normalize`` emits DEcomposed output for every
    requested form (observed on 16.1.0) — swap back to the kernel when a
    fixed Arrow lands. Whitespace class is RE2's ASCII ``\\s``
    (identical in the DuckDB oracle, same engine). Output:
    ``(id_col, norm_text, n_chars_raw, n_chars_norm)`` with codepoint
    lengths."""
    import unicodedata

    txt = batch[text_col]
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    ascii_mask = pc.string_is_ascii(txt).to_numpy(zero_copy_only=False)
    if bool(ascii_mask.all()):
        norm = txt
    else:
        # only the non-ASCII rows round-trip to Python; ASCII rows stay
        # in the original Arrow buffer via a concat + take reassembly
        idx = np.flatnonzero(~ascii_mask)
        base = (txt.combine_chunks() if isinstance(txt, pa.ChunkedArray)
                else txt)
        fixed = pa.array([unicodedata.normalize("NFC", s)
                          for s in txt.take(pa.array(idx)).to_pylist()],
                         base.type)  # match string/large_string exactly
        combined = pa.concat_arrays([base, fixed])
        gather = np.arange(len(ascii_mask), dtype=np.int64)
        gather[idx] = len(ascii_mask) + np.arange(len(idx))
        norm = combined.take(pa.array(gather))
    norm = pc.utf8_lower(norm)
    norm = pc.replace_substring_regex(norm, r"\s+", " ")
    norm = pc.utf8_trim_whitespace(norm)
    return pa.table({id_col: batch[id_col],
                     "norm_text": norm,
                     "n_chars_raw": pc.cast(pc.utf8_length(txt),
                                            pa.int64()),
                     "n_chars_norm": pc.cast(pc.utf8_length(norm),
                                             pa.int64())})


def kwic(ds, *, term: str, ctx: int, text_col: str = "text",
         id_col: str = "doc_id"):
    """Keyword-in-context concordance: for every document containing
    ``term``, the FIRST occurrence's 1-based character position and a
    snippet of up to ``ctx`` characters of context on each side —
    ``left_ctx + term + right_ctx``. The corpus-inspection primitive
    (what surrounds this token?) and a contamination-triage aid.

    Scale shape: embarrassingly parallel, NO shuffle — one stateless
    ``map_batches`` pass. Variable-position windows are extracted with
    only scalar-argument Arrow kernels: split on the first occurrence,
    negative-start slice of the prefix (Python tail semantics), bounded
    slice of the suffix, vectorized 3-way join. Character (codepoint)
    semantics end to end — identical to SQL ``split_part`` / ``substr``.

    SQL restatement: ``contains`` filter + ``split_part`` prefix +
    ``substr`` windows + concatenation."""
    if not term:
        raise ValueError("term must be non-empty")
    ctx = int(ctx)

    def _kwic(b: pa.Table) -> pa.Table:
        idt = b[id_col].type if b.num_rows else pa.int64()
        txt = b[text_col]
        m = pc.match_substring(txt, term)
        m = pc.fill_null(m, False)
        b2 = pa.table({"id": b[id_col], "t": txt}).filter(m)
        if b2.num_rows == 0:
            return pa.table({
                "doc_id": pa.array([], idt),
                "char_pos": pa.array([], pa.int64()),
                "snippet": pa.array([], pa.string()),
            })
        parts = pc.split_pattern(b2["t"], term, max_splits=1)
        pre = pc.list_element(parts, 0)
        suf = pc.list_element(parts, 1)
        left = pc.utf8_slice_codeunits(pre, -ctx) if ctx else \
            pc.utf8_slice_codeunits(pre, 0, 0)
        right = pc.utf8_slice_codeunits(suf, 0, ctx)
        snippet = pc.binary_join_element_wise(left, term, right, "")
        pos = pc.add(pc.cast(pc.utf8_length(pre), pa.int64()), 1)
        return pa.table({
            "doc_id": b2["id"],
            "char_pos": pos,
            "snippet": snippet,
        })

    return ds.map_batches(_kwic, batch_format="pyarrow")


_IS_VOWEL = np.zeros(256, dtype=bool)
for _c in b"aeiouyAEIOUY":
    _IS_VOWEL[_c] = True
_IS_SENT = np.zeros(256, dtype=bool)
for _c in b".!?":
    _IS_SENT[_c] = True


def readability_batch(batch: pa.Table, *, text_col: str = "text",
                      id_col: str = "doc_id") -> pa.Table:
    """Flesch reading-ease inputs, pinned to byte-exact definitions:
    words = space count + 1 (the corpus token convention), sentences =
    maximal runs of ``[.!?]``, syllables = maximal runs of
    ``[aeiouyAEIOUY]`` (the classic vowel-group heuristic). Run
    boundaries are identical measured in bytes or characters (the
    classes are pure ASCII), so the counts are exact for any UTF-8
    text with no per-row fallback. Flesch itself is one pinned IEEE
    expression over the three counts (null when words or sentences are
    zero).

    Vectorized: one pass over the column's raw UTF-8 buffer — class
    lookup tables, run-start flags, cumsum segment counts."""
    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    odt = np.int32 if pa.types.is_string(text.type) else np.int64
    off_buf = np.frombuffer(text.buffers()[1], dtype=odt)
    offsets = off_buf[text.offset: text.offset + len(text) + 1].astype(
        np.int64)
    data = np.frombuffer(text.buffers()[2], dtype=np.uint8)
    starts, ends = offsets[:-1], offsets[1:]

    spaces = _seg_counts((data == 32).astype(np.int64), starts, ends)
    n_words = spaces + 1

    def _runs(cls: np.ndarray) -> np.ndarray:
        m = cls[data]
        start_flag = m.copy()
        start_flag[1:] &= ~m[:-1]
        # a doc-initial class byte always starts a run (reset at docs)
        inb = starts[starts < len(data)]
        start_flag[inb] = m[inb]
        return _seg_counts(start_flag.astype(np.int64), starts, ends)

    n_syllables = _runs(_IS_VOWEL)
    n_sentences = _runs(_IS_SENT)

    ok = (n_words > 0) & (n_sentences > 0)
    w = n_words.astype(np.float64)
    s = np.where(n_sentences == 0, 1, n_sentences).astype(np.float64)
    sy = n_syllables.astype(np.float64)
    flesch = 206.835 - 1.015 * (w / s) - 84.6 * (sy / w)
    return pa.table({
        id_col: batch[id_col],
        "n_words": pa.array(n_words, pa.int64()),
        "n_sentences": pa.array(n_sentences, pa.int64()),
        "n_syllables": pa.array(n_syllables, pa.int64()),
        "flesch": pa.array(np.where(ok, flesch, np.nan), pa.float64(),
                           mask=~ok),
    })


RAKE_STOPWORDS = ("the", "a", "an", "and", "of")


def rake_word_scores(ds, *, text_col: str = "text",
                     stopwords: tuple = RAKE_STOPWORDS,
                     num_partitions: int = 8):
    """RAKE keyword statistics (Rose et al. 2010 — Rapid Automatic
    Keyword Extraction): candidate PHRASES are maximal runs of
    non-stopword tokens (stopwords and empty tokens break phrases,
    document boundaries too); each word's ``freq`` counts its phrase
    occurrences, ``deg`` sums the lengths of the phrases it occurs in
    (degree-including-self, the RAKE convention), and
    ``score = deg / freq`` favors words living in long phrases.
    Word-level output only — phrase scores would sum floats in
    arbitrary order; ``(word, freq, deg, score)`` keeps ints exact and
    the score a pinned quotient.

    Scale shape: per block one vectorized segmentation (boundary
    cumsum -> phrase ids -> phrase lengths by repeat/diff), in-block
    (word -> freq, deg) partials, ONE hash(word) grouped sum
    (vocabulary-sized), a tiny float finish."""
    from ..arrow_utils import rename_agg
    from .graph import grouped_sum_parts

    stop = set(stopwords)

    def _partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"word": pa.array([], pa.string()),
                          "freq": pa.array([], pa.int64()),
                          "deg": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        toks = pc.split_pattern(b[text_col], " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.values
        off = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        row = np.repeat(np.arange(b.num_rows, dtype=np.int64),
                        np.diff(off))
        n = len(flat)
        if n == 0:
            return empty
        is_stop = pc.is_in(flat, value_set=pa.array(
            sorted(stop) + [""])).to_numpy(zero_copy_only=False)
        keep = ~is_stop
        # boundary: first kept token of a run (doc change or a broken
        # predecessor)
        prev_keep = np.zeros(n, dtype=bool)
        prev_keep[1:] = keep[:-1] & (row[1:] == row[:-1])
        start = keep & ~prev_keep
        phrase_id = np.cumsum(start) - 1  # valid only where keep
        kept_pid = phrase_id[keep]
        if len(kept_pid) == 0:
            return empty
        plen = np.bincount(kept_pid)
        t = pa.table({"word": flat.filter(pa.array(keep)),
                      "freq": pa.array(np.ones(len(kept_pid), np.int64)),
                      "deg": pa.array(plen[kept_pid].astype(np.int64))})
        g = t.group_by(["word"]).aggregate([("freq", "sum"),
                                            ("deg", "sum")])
        return rename_agg(g, {"word": "word", "freq_sum": "freq",
                              "deg_sum": "deg"})

    summed = grouped_sum_parts(ds.map_batches(_partial,
                                              batch_format="pyarrow"),
                               ["word"], ["freq", "deg"],
                               count_col=None, fanin=num_partitions)

    def _finish(b: pa.Table) -> pa.Table:
        f = b["freq"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = b["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "word": b["word"], "freq": pa.array(f), "deg": pa.array(d),
            "score": pa.array(d.astype(np.float64)
                              / f.astype(np.float64), pa.float64())})

    return summed.map_batches(_finish, batch_format="pyarrow")


def term_adaptation(ds, *, text_col: str = "text", id_col: str = "doc_id",
                    min_df: int = 2, num_partitions: int = 8):
    """Church-Gale term BURSTINESS / adaptation statistics (Church &
    Gale 1995 — "Poisson mixtures"): per token the collection
    frequency ``cf``, document frequency ``df``, the burstiness ratio
    ``cf/df`` (mean occurrences per containing doc) and the adaptation
    probability ``(cf - df) / cf`` (chance a token repeats given it
    occurred). Content words adapt, function words do not — the
    classic evidence against the independence assumption. Ints exact;
    the two ratios are pinned quotients.

    Scale shape: the build_vocab partial (per-doc counts -> per-block
    token partials), ONE hash(token) grouped sum, tiny float finish."""
    from ..arrow_utils import rename_agg
    from .graph import grouped_sum_parts

    def _partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b[text_col], " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.values
        off = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        row = np.repeat(np.arange(b.num_rows, dtype=np.int64),
                        np.diff(off))
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        t = pa.table({"row": pa.array(row[keep]),
                      "token": flat.filter(pa.array(keep)),
                      "one": pa.array(np.ones(int(keep.sum()), np.int64))})
        per_doc = t.group_by(["row", "token"]).aggregate([("one", "sum")])
        per_doc = rename_agg(per_doc, {"row": "row", "token": "token",
                                       "one_sum": "cf"})
        g = per_doc.group_by(["token"]).aggregate(
            [("cf", "sum"), ("cf", "count")])
        return rename_agg(g, {"token": "token", "cf_sum": "cf",
                              "cf_count": "df"})

    summed = grouped_sum_parts(ds.map_batches(_partial,
                                              batch_format="pyarrow"),
                               ["token"], ["cf", "df"], count_col=None,
                               fanin=num_partitions)

    def _finish(b: pa.Table) -> pa.Table:
        t = b.filter(pc.greater_equal(b["df"],
                                      pa.scalar(min_df, pa.int64())))
        cf = t["cf"].to_numpy(zero_copy_only=False).astype(np.int64)
        df = t["df"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "token": t["token"], "cf": pa.array(cf), "df": pa.array(df),
            "burstiness": pa.array(cf.astype(np.float64)
                                   / df.astype(np.float64), pa.float64()),
            "adaptation": pa.array(
                (cf - df).astype(np.float64) / cf.astype(np.float64),
                pa.float64())})

    return summed.map_batches(_finish, batch_format="pyarrow")


def log_odds_contrast(ds, *, text_col: str = "text",
                      group_col: str = "source",
                      split_fn=None, alpha: int = 1, min_cf: int = 3,
                      num_partitions: int = 8):
    """Monroe-Colaresi-Quinn log-odds-ratio with a (symmetric)
    Dirichlet prior between two corpus halves ("Fightin' Words",
    2008 — the calibrated keyword-contrast statistic): per token with
    group counts ``c1``/``c2`` and totals ``N1``/``N2``,
    ``delta = ln((c1+a)/(N1+aV-c1-a)) - ln((c2+a)/(N2+aV-c2-a))``,
    ``var = 1/(c1+a) + 1/(c2+a)``, ``z = delta/sqrt(var)`` — integer
    counts exact, the three floats pinned per-row libm chains. The
    principled sibling of the chi-square ``term_drift``.

    ``split_fn(group_value) -> 0/1`` assigns the halves (default:
    parity of the trailing integer in the group string).

    Scale shape: per-block (token, side) partials, ONE hash(token)
    grouped sum (vocabulary-sized), scalar totals via a bounded
    aggregate, per-row float finish."""
    import math
    import re as _re

    from ..arrow_utils import rename_agg
    from .graph import grouped_sum_parts

    if split_fn is None:
        def split_fn(g):  # noqa: E731 - documented default
            m = _re.search(r"(\d+)$", g)
            return int(m.group(1)) % 2 if m else 0

    def _partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b[text_col], " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.values
        off = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        row = np.repeat(np.arange(b.num_rows, dtype=np.int64),
                        np.diff(off))
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        grp = b[group_col]
        if isinstance(grp, pa.ChunkedArray):
            grp = grp.combine_chunks()
        enc = grp.dictionary_encode()
        side_of = np.array([split_fn(g) for g in
                            enc.dictionary.to_pylist()], dtype=np.int64)
        side = side_of[enc.indices.to_numpy(zero_copy_only=False)][
            row[keep]]
        t = pa.table({"token": flat.filter(pa.array(keep)),
                      "c1": pa.array((side == 0).astype(np.int64)),
                      "c2": pa.array((side == 1).astype(np.int64))})
        g = t.group_by(["token"]).aggregate([("c1", "sum"), ("c2", "sum")])
        return rename_agg(g, {"token": "token", "c1_sum": "c1",
                              "c2_sum": "c2"})

    summed = grouped_sum_parts(ds.map_batches(_partial,
                                              batch_format="pyarrow"),
                               ["token"], ["c1", "c2"], count_col=None,
                               fanin=num_partitions).materialize()
    n1 = int(summed.sum("c1"))
    n2 = int(summed.sum("c2"))
    vocab = summed.count()

    def _finish(b: pa.Table) -> pa.Table:
        t = b.filter(pc.greater_equal(
            pc.add(b["c1"], b["c2"]), pa.scalar(min_cf, pa.int64())))
        c1 = t["c1"].to_numpy(zero_copy_only=False).astype(np.int64)
        c2 = t["c2"].to_numpy(zero_copy_only=False).astype(np.int64)
        a = float(alpha)
        av = float(alpha * vocab)
        delta = np.array([
            math.log((x1 + a) / (n1 + av - x1 - a))
            - math.log((x2 + a) / (n2 + av - x2 - a))
            for x1, x2 in zip(c1, c2)], dtype=np.float64)
        var = np.array([1.0 / (x1 + a) + 1.0 / (x2 + a)
                        for x1, x2 in zip(c1, c2)], dtype=np.float64)
        z = np.array([d / math.sqrt(v) for d, v in zip(delta, var)],
                     dtype=np.float64)
        return pa.table({"token": t["token"],
                         "c1": pa.array(c1), "c2": pa.array(c2),
                         "delta": pa.array(delta, pa.float64()),
                         "z": pa.array(z, pa.float64())})

    return summed.map_batches(_finish, batch_format="pyarrow")
