"""Greedy maximum-coverage document selection — the facility-location
/ set-cover heuristic behind "pick the k docs that together cover the
most vocabulary" curation (diverse seed sets, eval-suite selection,
annotation budgeting). Classic (1 − 1/e)-approximation: each round
selects the document adding the most UNCOVERED distinct terms, ties to
the smallest doc id; rounds stop early when no document adds coverage.

Scale shape: k passes over the corpus (the standard greedy trade — k is
small). Per round: the covered-term set broadcasts via ``ray.put``; one
``map_batches`` computes each doc's marginal gain fully vectorized
(Arrow split → one unique over (doc, dictionary-code) pairs →
``pc.is_in`` mask → ``np.bincount``); the winner comes back through a
distributed ``sort().limit(1)``; only the ONE winning doc's token set
ever reaches the driver. No quadratic step, no full-vocabulary shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["greedy_coverage"]


def _doc_term_pairs(b: pa.Table, text_col: str, ngram: int = 1):
    """Distinct (row_idx, term) pairs per batch, vectorized. ``ngram=2``
    makes the coverage universe adjacent-token bigrams (joined with one
    space) — a far larger, doc-discriminating term space."""
    toks = pc.split_pattern(b[text_col], pattern=" ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.values
    off = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    row = np.repeat(np.arange(b.num_rows, dtype=np.int64), np.diff(off))
    if ngram == 2:
        idx = np.arange(len(row), dtype=np.int64)
        valid = idx < off[row + 1] - 1   # not the last token of its row
        li = idx[valid]
        flat = pc.binary_join_element_wise(
            flat.take(pa.array(li)), flat.take(pa.array(li + 1)), " ")
        row = row[valid]
    else:
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        row = row[keep]
    codes_arr = flat.dictionary_encode()
    codes = codes_arr.indices.to_numpy(zero_copy_only=False).astype(
        np.int64)
    pair = row * (codes.max() + 1 if len(codes) else 1) + codes
    _, first = np.unique(pair, return_index=True)
    return row[first], flat.take(pa.array(first))


def greedy_coverage(ds, k: int, *, id_col: str = "doc_id",
                    text_col: str = "text", ngram: int = 1):
    """Run ``k`` greedy rounds; returns a pandas DataFrame
    ``(rnd, doc_id, gain, covered)`` — one bounded row per round
    (fewer if coverage saturates)."""
    import ray

    covered: set[str] = set()
    out = []
    for rnd in range(1, k + 1):
        cref = ray.put(sorted(covered))

        def _gain(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.table({"doc_id": pa.array([], pa.int64()),
                                 "gain": pa.array([], pa.int64())})
            row, terms = _doc_term_pairs(b, text_col, ngram)
            cov = ray.get(cref)
            if cov:
                new = pc.invert(pc.is_in(
                    terms, value_set=pa.array(cov))).to_numpy(
                    zero_copy_only=False)
            else:
                new = np.ones(len(row), dtype=bool)
            g = np.bincount(row[new], minlength=b.num_rows).astype(
                np.int64)
            keep = g > 0
            return pa.table({
                "doc_id": pc.cast(b[id_col], pa.int64()).filter(
                    pa.array(keep)),
                "gain": pa.array(g[keep])})

        top = (ds.map_batches(_gain, batch_format="pyarrow")
               .sort(key=["gain", "doc_id"], descending=[True, False])
               .limit(1).take_all())
        if not top:
            break
        win_id, gain = int(top[0]["doc_id"]), int(top[0]["gain"])
        win = ds.filter(expr=f"{id_col} == {win_id}").take_all()
        _, terms = _doc_term_pairs(pa.table({
            id_col: pa.array([win_id], pa.int64()),
            text_col: pa.array([win[0][text_col]])}), text_col, ngram)
        covered.update(terms.to_pylist())
        out.append((rnd, win_id, gain, len(covered)))

    return pd.DataFrame(out, columns=["rnd", "doc_id", "gain",
                                      "covered"]).astype(np.int64)
