"""PII scrubbing: mask emails / IPv4 addresses / phone numbers in a text
column and count what was masked.

A corpus-curation staple (strip contact info before training). Fully
vectorized: both the counting (``pc.count_substring_regex``) and the
masking (``pc.replace_substring_regex``) are Arrow C++ kernels running
RE2 — the same regex engine DuckDB uses, which is why the driver oracle
(``regexp_replace(..., 'g')`` / ``regexp_extract_all``) replays the scrub
byte-for-byte. Patterns are RE2-safe (no lookaround/backrefs) so they
mean the same thing in Python ``re``, Arrow, and DuckDB.

Scale shape: a stateless map-side transform — no shuffle, no state; the
regex programs are compiled inside the Arrow kernel per batch (C++ RE2
compile, microseconds — not the hot cost; the scan is).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["PII_PATTERNS", "pii_scrub_batch", "pii_scrub"]

# category -> (RE2 pattern, replacement token); applied in this order, each
# over the previous category's output (emails first so their digit runs
# can't double-count as phones)
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    "phone": (r"\+?\d{3}[- ]\d{3}[- ]\d{4}", "<PHONE>"),
}


def pii_scrub_batch(batch: pa.Table, *, text_col: str = "text",
                    out_col: str = "clean_text",
                    categories=None) -> pa.Table:
    """Mask every category's matches in ``text_col``; emit the scrubbed
    text as ``out_col`` plus one ``n_<category>`` int64 count column per
    category (counted on the text each pattern actually saw)."""
    cats = categories or list(PII_PATTERNS)
    col = batch[text_col]
    counts = {}
    for name in cats:
        pat, rep = PII_PATTERNS[name]
        counts[f"n_{name}"] = pc.cast(
            pc.count_substring_regex(col, pattern=pat), pa.int64())
        col = pc.replace_substring_regex(col, pattern=pat, replacement=rep)
    out = batch.append_column(out_col, col)
    for name, arr in counts.items():
        out = out.append_column(name, arr)
    return out


def pii_scrub(ds, *, text_col: str = "text", out_col: str = "clean_text",
              categories=None):
    """Dataset form of :func:`pii_scrub_batch` (pure map stage)."""
    def _scrub(b: pa.Table) -> pa.Table:
        return pii_scrub_batch(b, text_col=text_col, out_col=out_col,
                               categories=categories)

    return ds.map_batches(_scrub, batch_format="pyarrow")
