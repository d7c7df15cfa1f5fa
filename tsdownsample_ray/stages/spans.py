"""C4-style span-level exact dedup over a document corpus.

Reference scope: the reference (tsdownsample) has no corpus operators —
this belongs to the engine's training-data layer (brief-mandated). The
semantics mirror C4's span dedup (Raffel et al. 2020, "Exploring the
Limits of Transfer Learning": discard duplicate three-sentence spans
corpus-wide, keeping one occurrence): documents are tiled into fixed-width
word spans, every span is deduplicated CORPUS-WIDE keeping the earliest
``(doc_id, span_idx)`` occurrence, and each document is reassembled from
its surviving spans.

Scale shape (100 TB): the explode is map-side (one vectorized Arrow pass
per block — ``split_pattern`` + a ListArray re-offset + ``binary_join``,
never a per-doc loop), dedup is ONE hash(span) shuffle with bounded
reducers (dense part space, the ``keep_first_by_key`` contract), and
reassembly is ONE hash(doc) shuffle whose partition pass is a single
sort + segment-reduction call. Peak reducer memory is one partition of
spans, never the corpus; span payloads travel exactly two shuffles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ..arrow_utils import group_codes

__all__ = ["explode_spans_batch", "span_dedup"]


def explode_spans_batch(batch: pa.Table, *, span_w: int,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> pa.Table:
    """Tile each document's words into non-overlapping ``span_w``-word
    spans (last span may be shorter): one output row per (doc, span_idx).

    Fully vectorized: the words ListArray from ``split_pattern`` is
    re-offset at every span boundary (spans tile each list contiguously,
    so the new offsets are strictly increasing over the SAME flat values
    buffer — zero-copy) and joined back with ``binary_join``.
    """
    ids = batch[id_col]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    if batch.num_rows == 0:
        return pa.table({id_col: ids, "span_idx": pa.array([], pa.int64()),
                         "span": pa.array([], pa.string())})
    # null text -> '' (one empty span), NOT a silent doc drop: a null
    # list slot from split_pattern has zero offset width (n_spans = 0)
    # and the doc would vanish from the one-row-per-document contract
    words = pc.split_pattern(pc.fill_null(batch[text_col], ""), " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    flat = words.values
    off = words.offsets.to_numpy().astype(np.int64)
    n_words = np.diff(off)  # >= 1 always: split('') == ['']
    n_spans = -(-n_words // span_w)
    doc_rep = np.repeat(np.arange(batch.num_rows), n_spans)
    total = int(n_spans.sum())
    starts_cum = np.concatenate(([0], np.cumsum(n_spans)[:-1]))
    span_idx = np.arange(total) - np.repeat(starts_cum, n_spans)
    sp_start = off[:-1][doc_rep] + span_idx * span_w
    # span end == next span's start (tiling) == next doc's first start at
    # doc boundaries, so one offsets vector covers every span exactly
    offsets = pa.array(np.append(sp_start, off[-1]).astype(np.int32))
    span = pc.binary_join(pa.ListArray.from_arrays(offsets, flat), " ")
    return pa.table({id_col: ids.take(pa.array(doc_rep)),
                     "span_idx": pa.array(span_idx),
                     "span": span})


def span_dedup(ds, *, span_w: int = 10, id_col: str = "doc_id",
               text_col: str = "text", num_partitions: int = 16):
    """Corpus-wide span dedup: returns one row per document with
    ``(id_col, n_spans, n_kept, clean_text)`` where ``clean_text`` is the
    space-join of the document's corpus-unique spans (first occurrence by
    ``(doc_id, span_idx)`` wins) in original order.
    """
    from ..arrow_utils import stable_part_codes
    from .dedup import mark_first_by_key

    spans = ds.map_batches(
        lambda b: explode_spans_batch(b, span_w=span_w, id_col=id_col,
                                      text_col=text_col),
        batch_format="pyarrow")
    marked = mark_first_by_key(spans, key_col="span",
                               order_cols=[id_col, "span_idx"],
                               num_partitions=num_partitions)

    mod = num_partitions * 64

    def _doc_part(b: pa.Table) -> pa.Table:
        h = stable_part_codes(b[id_col], None)
        return b.append_column(
            "__part", pa.array((h % np.uint64(mod)).astype(np.int32)))

    def _reassemble(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        id_type = t[id_col].type
        if t.num_rows == 0:
            return pa.table({id_col: pa.array([], id_type),
                             "n_spans": pa.array([], pa.int64()),
                             "n_kept": pa.array([], pa.int64()),
                             "clean_text": pa.array([], pa.string())})
        t = t.take(pc.sort_indices(t, sort_keys=[(id_col, "ascending"),
                                                 ("span_idx", "ascending")]))
        ids = t[id_col].combine_chunks() if isinstance(
            t[id_col], pa.ChunkedArray) else t[id_col]
        codes = group_codes(ids)
        heads = np.ones(len(codes), dtype=bool)
        heads[1:] = codes[1:] != codes[:-1]
        seg = np.flatnonzero(heads)
        bounds = np.append(seg, len(codes))
        n_spans = np.diff(bounds)
        kept = t["is_first"].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        n_kept = np.add.reduceat(kept, seg)
        spans_col = t["span"]
        if isinstance(spans_col, pa.ChunkedArray):
            spans_col = spans_col.combine_chunks()
        kept_spans = spans_col.filter(pa.array(kept.astype(bool)))
        offsets = pa.array(np.concatenate(
            ([0], np.cumsum(n_kept))).astype(np.int32))
        clean = pc.binary_join(
            pa.ListArray.from_arrays(offsets, kept_spans), " ")
        return pa.table({id_col: ids.take(pa.array(seg)),
                         "n_spans": pa.array(n_spans),
                         "n_kept": pa.array(n_kept),
                         "clean_text": clean})

    parted = marked.map_batches(_doc_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _reassemble, batch_format="pyarrow")
