"""URL canonicalization for crawl dedup: normalize scheme/host case,
strip default ports, fragments and utm_* tracking params — the standard
pre-key for exact URL-level dedup of a web corpus.

No counterpart in the reference (a kernel library); web-corpus layer
(brief-mandated). Scale shape: pure map-side, every step an Arrow RE2 /
split kernel over the utf-8 buffer — no per-row Python, no shuffle; the
downstream dedup/count is the usual ONE hash(canonical) exchange.

Canonical form (pinned, SQL-replayable — the DuckDB oracle runs the
same RE2 patterns):

1. drop the fragment (``#...`` to end),
2. lowercase the scheme and the host:port authority (path/query case is
   preserved — path case is significant per RFC 3986),
3. strip an explicit default port (``:80`` for http, ``:443`` for
   https) at the end of the authority,
4. drop ``utm_*`` query parameters wherever they sit, re-normalizing
   the separator (leading ``?utm_a=1&x=2`` keeps ``?x=2``),
5. drop a trailing ``?`` left by an all-tracking query string.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["canonicalize_urls_batch"]


def _lower_authority(u: pa.Array) -> pa.Array:
    """Lowercase only ``scheme://authority`` — split at the first '/'
    after the scheme separator, lower the head, rejoin. Rows lacking a
    separator are padded with a sentinel first (``list_element`` raises
    on short lists) and routed to plain lowercasing at the end."""
    has_auth = pc.match_substring(u, "://")
    safe = pc.if_else(has_auth, u,
                      pc.binary_join_element_wise("x://", u, ""))
    parts = pc.split_pattern(safe, "://", max_splits=1)
    scheme = pc.list_element(parts, 0)
    rest = pc.list_element(parts, 1)
    # the authority ends at the FIRST '/' or '?' (fragments are already
    # stripped) — a query with no path slash must keep its case. Two
    # sentinel-padded splits keep everything vectorized.
    has_q = pc.match_substring(rest, "?")
    safe_q = pc.if_else(has_q, rest,
                        pc.binary_join_element_wise(rest, "?", ""))
    q_parts = pc.split_pattern(safe_q, "?", max_splits=1)
    ap = pc.list_element(q_parts, 0)     # authority [+ path]
    qs = pc.list_element(q_parts, 1)     # query (case preserved)
    has_path = pc.match_substring(ap, "/")
    safe_ap = pc.if_else(has_path, ap,
                         pc.binary_join_element_wise(ap, "/", ""))
    tail_parts = pc.split_pattern(safe_ap, "/", max_splits=1)
    auth = pc.list_element(tail_parts, 0)
    path = pc.list_element(tail_parts, 1)
    lowered = pc.binary_join_element_wise(
        pc.utf8_lower(scheme), "://", pc.utf8_lower(auth), "")
    lowered = pc.if_else(
        has_path,
        pc.binary_join_element_wise(lowered, "/", path, ""),
        lowered)
    lowered = pc.if_else(
        has_q,
        pc.binary_join_element_wise(lowered, "?", qs, ""),
        lowered)
    return pc.if_else(has_auth, lowered, pc.utf8_lower(u))


def canonicalize_urls_batch(batch: pa.Table, *, url_col: str = "url",
                            out_col: str = "canonical") -> pa.Table:
    """Append ``out_col`` with the canonical form of ``url_col``."""
    u = batch[url_col]
    if isinstance(u, pa.ChunkedArray):
        u = u.combine_chunks()
    u = pc.replace_substring_regex(u, r"#.*$", "")
    u = _lower_authority(u)
    u = pc.replace_substring_regex(
        u, r"^(https://[^/?#]*):443(/|\?|$)", r"\1\2")
    u = pc.replace_substring_regex(
        u, r"^(http://[^/?#]*):80(/|\?|$)", r"\1\2")
    # utm params: mid/trailing '&utm_x=v' drops cleanly; a LEADING
    # '?utm_x=v&next' must hand '?' to the next param
    u = pc.replace_substring_regex(u, r"&utm_[^&#]*", "")
    u = pc.replace_substring_regex(u, r"\?utm_[^&#]*&", "?")
    u = pc.replace_substring_regex(u, r"\?utm_[^&#]*$", "")
    u = pc.replace_substring_regex(u, r"\?$", "")
    return batch.append_column(out_col, u)
