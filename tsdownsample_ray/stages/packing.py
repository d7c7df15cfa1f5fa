"""Training-sequence preparation: context-window chunking and
concat-then-split sequence packing — the last mile between a curated
corpus and a token-budgeted training run.

- ``chunk_documents``: split each doc into overlapping fixed-token-count
  chunks (stride = chunk - overlap; every doc yields >= 1 chunk, the
  final chunk is clamped to the doc end). Pure map-side — each doc's
  chunks are derived inside its batch, no shuffle.

- ``pack_sequences``: the standard LLM packing model — concatenate all
  docs in id order and cut every ``capacity`` tokens; each doc learns
  its global token offset and which pack(s) it lands in. The global
  offset is a DISTRIBUTED PREFIX SUM, done 100 TB-safe in three steps:
  (1) map-side per-bucket (id // bucket_size) token-count partials,
  (2) ONE tiny task exclusive-scans the bucket totals (|docs|/bucket_size
  rows — a few MB at petabyte scale; never the raw rows),
  (3) the bucket-offset table is broadcast (``ray.put`` once, read per
  task) and each bucket's docs — co-located by a dense bucket->partition
  code — cumsum within the bucket and add their bucket's offset.
  Per-doc ordering inside the scan is by id (the engine's deterministic
  contract), so the result is partition-invariant.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["chunk_documents", "pack_sequences", "cdc_chunk_batch"]


def chunk_documents(ds, *, chunk_tokens: int, overlap: int = 0,
                    id_col: str = "doc_id", text_col: str = "text"):
    """Overlapping token-window chunks per doc (whitespace tokens):
    chunk i covers tokens [i*stride, i*stride + chunk_tokens), clamped;
    docs shorter than one chunk yield exactly one chunk. Output:
    (id, chunk_idx, chunk_text, n_chunk_tokens)."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap

    def _chunks(b: pa.Table) -> pa.Table:
        ids, idxs, texts, ntoks = [], [], [], []
        for i, t in zip(b[id_col].to_pylist(), b[text_col].to_pylist()):
            toks = t.split(" ")
            n = len(toks)
            n_chunks = (1 if n <= chunk_tokens
                        else 1 + -(-(n - chunk_tokens) // stride))
            for c in range(n_chunks):
                seg = toks[c * stride: c * stride + chunk_tokens]
                ids.append(i)
                idxs.append(c)
                texts.append(" ".join(seg))
                ntoks.append(len(seg))
        return pa.table({
            id_col: pa.array(ids, b[id_col].type),
            "chunk_idx": pa.array(idxs, pa.int64()),
            "chunk_text": pa.array(texts, pa.string()),
            "n_chunk_tokens": pa.array(ntoks, pa.int64()),
        })

    return ds.map_batches(_chunks, batch_format="pyarrow")


def pack_sequences(ds, capacity: int, *, id_col: str = "doc_id",
                   count_col: str = "n_tokens",
                   bucket_size: int = 1000, num_partitions: int = 8):
    """Concat-then-split packing: with docs laid out in ``id_col`` order
    and cut every ``capacity`` tokens, compute each doc's global
    ``token_start`` and its first/last pack index. Input needs
    (id_col, count_col); ids must be unique. Output adds
    (token_start, first_pack, last_pack)."""
    import ray

    def _bucket_partials(b: pa.Table) -> pa.Table:
        t = pa.table({
            "bucket": pc.cast(pc.floor(pc.divide(
                pc.cast(b[id_col], pa.float64()), float(bucket_size))),
                pa.int64()),
            "c": pc.cast(b[count_col], pa.int64()),
        })
        g = t.group_by(["bucket"]).aggregate([("c", "sum")])
        return pa.table({"bucket": g["bucket"],
                         "partial": pc.cast(g["c_sum"], pa.int64())})

    # bucket totals: |docs|/bucket_size rows; the scan runs in ONE task
    # over that tiny table (not over raw rows)
    partials = ds.map_batches(_bucket_partials, batch_format="pyarrow")

    def _scan(b: pa.Table) -> pa.Table:
        g = b.group_by(["bucket"]).aggregate([("partial", "sum")])
        buckets = g["bucket"].to_numpy(zero_copy_only=False)
        totals = g["partial_sum"].to_numpy(zero_copy_only=False)
        order = np.argsort(buckets, kind="stable")
        offs = np.zeros(len(order), dtype=np.int64)
        offs[1:] = np.cumsum(totals[order])[:-1]
        return pa.table({"bucket": pa.array(buckets[order]),
                         "bucket_offset": pa.array(offs)})

    # the scan output is tiny (|docs|/bucket_size rows): materialize it,
    # ray.put ONCE, read per task — the brief's broadcast pattern, never
    # re-shipped per batch
    refs = partials.repartition(1).map_batches(
        _scan, batch_format="pyarrow").to_arrow_refs()
    tbl = pa.concat_tables([ray.get(r) for r in refs])
    off_map_ref = ray.put({
        int(b): int(o) for b, o in zip(tbl["bucket"].to_pylist(),
                                       tbl["bucket_offset"].to_pylist())})

    def _add_part(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = ids // bucket_size
        b = b.append_column("__bucket", pa.array(bucket))
        # dense bucket -> partition code (buckets are dense ints, so a
        # plain modulus keeps every sort reducer non-empty)
        return b.append_column(
            "__part", pa.array((bucket % num_partitions).astype(np.int32)))

    def _offsets(g: pa.Table) -> pa.Table:
        import ray as _ray

        off_map = _ray.get(off_map_ref)
        if g.num_rows == 0:
            return pa.table({
                id_col: pa.array([], g[id_col].type),
                count_col: pa.array([], pa.int64()),
                "token_start": pa.array([], pa.int64()),
                "first_pack": pa.array([], pa.int64()),
                "last_pack": pa.array([], pa.int64()),
            })
        idx = pc.sort_indices(g, sort_keys=[("__bucket", "ascending"),
                                            (id_col, "ascending")])
        g = g.take(idx)
        cnt = g[count_col].to_numpy(zero_copy_only=False).astype(np.int64)
        buckets = g["__bucket"].to_numpy(zero_copy_only=False)
        brk = np.ones(len(cnt), dtype=bool)
        brk[1:] = buckets[1:] != buckets[:-1]
        cs = np.concatenate([[0], np.cumsum(cnt)])[:-1]  # exclusive
        # per-bucket exclusive cumsum: subtract the running total at the
        # bucket's first row
        bucket_first = np.maximum.accumulate(
            np.where(brk, np.arange(len(cnt)), 0))
        within = cs - cs[bucket_first]
        base = np.array([off_map[int(x)] for x in buckets[brk]],
                        dtype=np.int64)
        start = within + np.repeat(base, np.diff(
            np.append(np.flatnonzero(brk), len(cnt))))
        last = start + np.maximum(cnt, 1) - 1
        return pa.table({
            id_col: g[id_col],
            count_col: pa.array(cnt),
            "token_start": pa.array(start),
            "first_pack": pa.array(start // capacity),
            "last_pack": pa.array(last // capacity),
        })

    parted = ds.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _offsets, batch_format="pyarrow")


def cdc_chunk_batch(batch: pa.Table, *, text_col: str = "text",
                    id_col: str = "doc_id", window: int = 8,
                    mask: int = 63) -> pa.Table:
    """Content-defined chunking (the rsync/FastCDC family, Muthitacharoen
    et al., SOSP 2001): a chunk boundary falls AFTER every ``window``-char
    run whose polynomial hash (the engine's Horner base-1000003 mod
    2^61-1 — ``textstats.fingerprint_batch``'s function) satisfies
    ``h % (mask+1) == 0``; a byte edit only moves boundaries inside its
    own neighborhood, so unchanged content re-chunks identically — the
    dedup-friendly splitter, unlike fixed-stride chunking. Emits one row
    per chunk: (id, chunk_id, chunk, chunk_len). Pure map stage; window
    hashes are vectorized per doc (one mulmod per window offset), only
    the per-CHUNK substring gather is a Python loop (bounded by
    chunks-per-doc, ~len/(mask+1)). Boundaries are CODEPOINT positions
    (the utf-32 view of the text, vectorized by ``np.frombuffer``), so
    the chunker is corpus-general: every boundary falls between unicode
    scalar values and every chunk is a valid string — on ASCII input
    this is byte-identical to byte-position chunking (the pre-r5
    contract), and chunk_len counts codepoints, matching SQL
    ``length()``. A binary-media CDC would instead hash raw bytes and
    emit ``binary`` chunks."""
    import numpy as np

    from .textstats import _MOD, _mulmod_byte, _powers

    pows = _powers(window)
    texts = batch[text_col].to_pylist()
    ids = batch[id_col].to_pylist()
    out_id, out_cid, out_chunk = [], [], []
    for did, t in zip(ids, texts):
        n = len(t)  # codepoints
        if n == 0:
            continue
        cuts = []
        if n >= window:
            codes = np.frombuffer(t.encode("utf-32-le"),
                                  dtype=np.uint32).astype(np.uint64)
            acc = np.zeros(n - window + 1, dtype=np.uint64)
            for k in range(window):
                term = _mulmod_byte(codes[k: n - window + 1 + k],
                                    pows[window - 1 - k: window - k])
                acc = acc + term
                acc = np.where(acc >= _MOD, acc - np.uint64(_MOD), acc)
            cuts = (np.flatnonzero(acc % np.uint64(mask + 1) == 0)
                    + window).tolist()
        if not cuts or cuts[-1] != n:
            cuts.append(n)
        prev = 0
        for ci, c in enumerate(cuts):
            out_id.append(did)
            out_cid.append(ci)
            out_chunk.append(t[prev:c])  # str slice = codepoint slice
            prev = c
    return pa.table({
        id_col: pa.array(out_id, batch[id_col].type),
        "chunk_id": pa.array(out_cid, pa.int64()),
        "chunk": pa.array(out_chunk, pa.string()),
        "chunk_len": pa.array([len(c) for c in out_chunk], pa.int64()),
    })
