"""Deduplication operators for training-data pipelines: exact, MinHash+LSH,
SimHash, n-gram Jaccard, embedding-cosine near-dup.

All stages are deterministic (fixed hash parameters, no RNG at run time)
so results are reproducible and testable. Scale shapes:

- exact: content-hash in ``map_batches`` -> ``groupby(hash)`` keep-first
  (one shuffle on the hash — uniform by construction, no skew).
- MinHash+LSH: signatures per batch (vectorized) -> explode to
  ``(band_id, band_hash, doc)`` rows -> ``groupby(band)`` -> candidate
  pairs (per-bucket emission cap with logged drops) -> hash-partitioned
  pair distinct -> verification joins the text back through TWO
  hash-partitioned ``Dataset.join``s (on a, then on b) — nothing is ever
  broadcast or funneled into one block, so the shape survives 100 TB.
- SimHash: 64-bit signature per doc; near-dups = signatures at small
  Hamming distance, banded into 4x16-bit blocks for candidate generation
  (any pair within distance 3 shares at least one block).
- embedding cosine: see ``similarity.py`` (same kernel, thresholded).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ..arrow_utils import group_codes, make_add_part

__all__ = [
    "content_hash_batch", "exact_dedup", "keep_first_by_key",
    "MinHasher", "minhash_signatures", "lsh_candidate_pairs",
    "verify_jaccard_pairs", "near_dup_pairs",
    "simhash_batch", "simhash_signatures", "simhash_near_dup_pairs",
    "distinct_pairs", "bucket_candidate_pairs", "word_shingles", "jaccard",
    "char_ngram_codes", "ngram_prefix_index", "ngram_jaccard_pairs",
    "corpus_stop_grams",
]

# Mersenne-31: (a*x + b) with a, x < 2^31 fits uint64 exactly, so the
# permutation arithmetic stays fully vectorized in native uint64.
_MERSENNE = (1 << 31) - 1


def _stable_u64(token: bytes) -> int:
    """First 8 md5 bytes, big-endian. md5 (not blake2b) so the full MinHash
    and SimHash pipelines are restatable in ANSI SQL (DuckDB ``md5()``) for
    the driver's exact-value oracle."""
    return int.from_bytes(hashlib.md5(token).digest()[:8], "big")


# odd constants for the w-slot shingle combiner (uint64 wraparound mixing)
_SHINGLE_MIX = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
                         0x165667B19E3779F9, 0x27D4EB2F165667C5,
                         0x85EBCA6B2F165667], dtype=np.uint64)


def _hash_unique_tokens(uniq: list, cache: dict | None) -> np.ndarray:
    """md5-hash a batch's UNIQUE tokens (one digest per distinct token;
    ``cache`` — an actor-held token->hash dict — carries the common
    vocabulary across batches so steady-state batches hash only novel
    tokens)."""
    if cache is None:
        return np.fromiter((_stable_u64(t.encode()) for t in uniq),
                           dtype=np.uint64, count=len(uniq))
    if len(cache) > 4_000_000:  # bound actor memory
        cache.clear()
    out = np.empty(len(uniq), dtype=np.uint64)
    for i, t in enumerate(uniq):
        v = cache.get(t)
        if v is None:
            v = _stable_u64(t.encode())
            cache[t] = v
        out[i] = v
    return out


def _hash_tokens_batch(texts: list, cache: dict | None) -> tuple:
    """Whitespace-tokenize every text (Python ``str.split`` semantics — the
    tokenization the SQL oracles restate), hash each batch-unique token
    ONCE (``pyarrow.dictionary_encode`` finds uniques at C speed), and
    return ``(unique-token hashes, per-occurrence dictionary indices,
    per-doc offsets)`` — per-occurrence hashes are the array gather
    ``uh[inv]``."""
    toks_per_doc = [t.split() for t in texts]
    counts = np.fromiter((len(t) for t in toks_per_doc), dtype=np.int64,
                         count=len(toks_per_doc))
    offsets = np.concatenate(([0], np.cumsum(counts)))
    flat = [tok for toks in toks_per_doc for tok in toks]
    if not flat:
        e = np.empty(0, dtype=np.uint64)
        return e, np.empty(0, dtype=np.int64), offsets
    enc = pa.array(flat, pa.string()).dictionary_encode()
    uh = _hash_unique_tokens(enc.dictionary.to_pylist(), cache)
    inv = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    return uh, inv, offsets


def _shingles_from_hashes(th: np.ndarray, w: int) -> np.ndarray:
    """Per-occurrence token hashes -> deduplicated 31-bit w-gram hashes
    (position-weighted uint64 mix of consecutive token hashes; three numpy
    adds for w=3 instead of a per-gram digest). Requires len(th) >= w."""
    n_grams = len(th) - w + 1
    acc = np.zeros(n_grams, dtype=np.uint64)
    for j in range(w):  # w is tiny; each step is one vector FMA
        acc += th[j: j + n_grams] * _SHINGLE_MIX[j]
    return np.unique(acc & np.uint64(_MERSENNE))


def word_shingles(text: str, w: int = 3, cache: dict | None = None) -> np.ndarray:
    """w-word shingle hashes (31-bit, uint64 dtype) of ONE text,
    deduplicated. Batch callers (``MinHasher``) use ``_hash_tokens_batch``
    + ``_shingles_from_hashes`` directly so each batch-unique token is
    md5-hashed once for the whole batch."""
    toks = text.split()
    if not toks:
        return np.empty(0, dtype=np.uint64)
    if len(toks) < w:
        return np.array([_stable_u64(" ".join(toks).encode()) & _MERSENNE],
                        dtype=np.uint64)
    uh, inv, _ = _hash_tokens_batch([text], cache)
    return _shingles_from_hashes(uh[inv], w)


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    inter = len(np.intersect1d(a, b, assume_unique=True))
    union = len(a) + len(b) - inter
    return inter / union if union else 1.0


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def content_hash_batch(batch: pa.Table, text_col: str = "text",
                       out_col: str = "content_md5") -> pa.Table:
    md5 = pa.array([hashlib.md5(t.encode()).hexdigest()
                    for t in batch[text_col].to_pylist()])
    return batch.append_column(out_col, md5)


def _firsts_by_key(ds, *, key_col: str, order_cols: list,
                   num_partitions: int, finish):
    """Shared scaffold of :func:`keep_first_by_key` /
    :func:`mark_first_by_key`: ONE hash(key) shuffle (dense part space,
    bounded reducers), then each partition sorts once by
    (key, *order_cols) and computes the segment-head mask vectorized —
    one call per PARTITION instead of one ``map_groups`` round-trip per
    distinct key (the dominant cost at corpus scale: |groups| ~= |rows|
    for dedup keys). Hash partitioning co-locates every occurrence of a
    key, so a partition segment head IS the global first.
    ``finish(sorted_table, first_mask)`` shapes the partition output."""
    from ..arrow_utils import stable_part_codes

    mod = num_partitions * 64

    _add_part = make_add_part(key_col, mod)

    def _heads(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        t = t.take(pc.sort_indices(
            t, sort_keys=[(key_col, "ascending")]
            + [(c, "ascending") for c in order_cols]))
        key = t[key_col]
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        codes = group_codes(key)
        first = np.ones(len(codes), dtype=bool)
        first[1:] = codes[1:] != codes[:-1]
        return finish(t, first)

    parted = ds.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _heads, batch_format="pyarrow")


def keep_first_by_key(ds, *, key_col: str, order_cols: list,
                      keep_cols: list | None = None,
                      num_partitions: int = 16):
    """Keep the minimum-(order_cols) row of each distinct ``key_col``
    (one hash shuffle + a vectorized per-partition segment-head pass —
    see :func:`_firsts_by_key` for the scale rationale)."""

    def _keep(t: pa.Table, first: np.ndarray) -> pa.Table:
        out = t.take(pa.array(np.flatnonzero(first)))
        return out.select(keep_cols) if keep_cols else out

    return _firsts_by_key(ds, key_col=key_col, order_cols=order_cols,
                          num_partitions=num_partitions, finish=_keep)


def mark_first_by_key(ds, *, key_col: str, order_cols: list,
                      flag_col: str = "is_first",
                      num_partitions: int = 16):
    """Like :func:`keep_first_by_key` but returns ALL rows, with a boolean
    ``flag_col`` set on the minimum-(order_cols) row of each distinct
    key."""
    return _firsts_by_key(
        ds, key_col=key_col, order_cols=order_cols,
        num_partitions=num_partitions,
        finish=lambda t, first: t.append_column(flag_col, pa.array(first)))


def exact_dedup(ds, *, text_col: str = "text", order_col: str,
                keep_cols: list | None = None, num_partitions: int = 16):
    """Keep the first row (by ``order_col``) of each distinct text
    (content-md5 key -> :func:`keep_first_by_key`)."""
    hashed = ds.map_batches(
        lambda b: content_hash_batch(b, text_col), batch_format="pyarrow")
    return keep_first_by_key(hashed, key_col="content_md5",
                             order_cols=[order_col], keep_cols=keep_cols,
                             num_partitions=num_partitions)


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

class MinHasher:
    """Vectorized MinHash signatures (k linear permutations over a Mersenne
    prime). A callable class -> actor pool: permutation params are built
    once per actor."""

    def __init__(self, num_perm: int = 128, shingle_w: int = 3,
                 text_col: str = "text", id_col: str = "doc_id", seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.shingle_w = shingle_w
        self.text_col = text_col
        self.id_col = id_col
        self._cache: dict = {}  # gram -> hash, lives as long as the actor

    def _sig_from_shingles(self, sh: np.ndarray) -> np.ndarray:
        if not len(sh):
            return np.zeros(self.num_perm, dtype=np.uint64)
        # (s x k) permuted hashes; products < 2^62 fit uint64 exactly
        prods = (sh[:, None] * self.a[None, :] + self.b[None, :]) % np.uint64(
            _MERSENNE)
        return np.min(prods, axis=0)

    def signature(self, text: str) -> np.ndarray:
        return self._sig_from_shingles(
            word_shingles(text, self.shingle_w, self._cache))

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        # batch-level tokenization: every batch-unique token md5-hashed
        # once (dictionary-encoded), per-doc hashes gathered by index
        uh, inv, off = _hash_tokens_batch(texts, self._cache)
        th = uh[inv]
        w = self.shingle_w
        sigs = []
        for i, t in enumerate(texts):
            d = th[off[i]: off[i + 1]]
            if len(d) and len(d) < w:  # short-doc fallback: one joined gram
                sh = np.array(
                    [_stable_u64(" ".join(t.split()).encode()) & _MERSENNE],
                    dtype=np.uint64)
            else:
                sh = _shingles_from_hashes(d, w) if len(d) else d
            sigs.append(self._sig_from_shingles(sh))
        return pa.table({
            self.id_col: batch[self.id_col],
            "minhash": pa.array([s.tolist() for s in sigs],
                                type=pa.list_(pa.uint64())),
        })


_MINHASH_WORKER_CACHE: dict = {}


def _minhash_task(batch: pa.Table, **kw) -> pa.Table:
    # per-WORKER-PROCESS singleton: task-based map_batches reuses warm Ray
    # workers, so the token-hash cache amortizes across batches exactly as
    # an actor's would — without paying actor-pool spin-up (~1-2 s of the
    # near_dup query's fixed cost at toy scale was the two (1,8) pools)
    key = tuple(sorted(kw.items()))
    mh = _MINHASH_WORKER_CACHE.get(key)
    if mh is None:
        mh = _MINHASH_WORKER_CACHE[key] = MinHasher(**kw)
    return mh(batch)


def minhash_signatures(ds, **kw):
    import functools

    return ds.map_batches(functools.partial(_minhash_task, **kw),
                          batch_format="pyarrow")


def _segmented_pairs(ids_sorted: np.ndarray, codes: np.ndarray,
                     max_bucket: int | None, log_fn=None) -> tuple:
    """Within-bucket all-pairs for EVERY bucket of a partition at once.

    ``ids_sorted`` is the partition's id column sorted by (bucket, id);
    ``codes`` marks each row's bucket (monotone ints). Buckets of the SAME
    size emit their pairs in one ``triu_indices`` gather — a Python step
    per distinct bucket size, not per bucket (dup clusters share a handful
    of sizes, so a 40k-bucket partition pairs in a few vector ops).
    ``max_bucket`` keeps the first ``max_bucket`` sorted ids of an
    oversized bucket (logged) as an OPT-IN scale guard — it trades
    exactness for bounded O(max_bucket^2) emission, so operators that
    promise equality with a quadratic definition must leave it None."""
    n = len(codes)
    if n == 0:
        return ids_sorted[:0], ids_sorted[:0]
    starts = np.concatenate([[0], np.flatnonzero(codes[1:] != codes[:-1]) + 1])
    counts = np.diff(np.concatenate([starts, [n]])).astype(np.int64)
    a_parts, b_parts = [], []
    for m in np.unique(counts):
        if m < 2:
            continue
        mm = int(m)
        sel = np.flatnonzero(counts == m)
        use = mm
        if max_bucket is not None and mm > max_bucket:
            if log_fn is not None:
                for _ in range(len(sel)):
                    log_fn(mm)
            use = max_bucket
        offs = starts[sel][:, None] + np.arange(use)[None, :]
        seg = ids_sorted[offs]  # (buckets_of_size_m, use)
        iu0, iu1 = np.triu_indices(use, k=1)
        a_parts.append(seg[:, iu0].ravel())
        b_parts.append(seg[:, iu1].ravel())
    if not a_parts:
        return ids_sorted[:0], ids_sorted[:0]
    return np.concatenate(a_parts), np.concatenate(b_parts)


def bucket_candidate_pairs(banded_ds, *, key_cols, id_col: str,
                           max_bucket: int | None = None,
                           num_partitions: int = 16, log_tag: str = "lsh"):
    """(bucket key cols, id) rows -> within-bucket candidate pairs (a < b).

    Scale shape: ONE int-keyed hash shuffle — each row gets ``__part =
    hash(key_cols) mod (num_partitions*64)`` (dense part space, reducers
    bounded by a pre-repartition, same discipline as ``distinct_pairs``) —
    then each partition sorts ONCE by (keys, id) and emits every bucket's
    pairs via ``_segmented_pairs``. Replaces a ``map_groups`` call per
    BUCKET (~one Python/Arrow round-trip per bucket; the dominant cost of
    the candidate stage at bench scale) with one vectorized call per
    PARTITION. Requires int-typed key columns (band ids / band hashes)."""

    def _add_part(b: pa.Table) -> pa.Table:
        h = np.zeros(b.num_rows, dtype=np.uint64)
        for k in key_cols:
            v = b[k]
            if isinstance(v, pa.ChunkedArray):
                v = v.combine_chunks()
            h = (h * np.uint64(0x9E3779B97F4A7C15)
                 + v.to_numpy(zero_copy_only=False).astype(np.uint64))
        part = (h % np.uint64(num_partitions * 64)).astype(np.int32)
        return b.append_column("__part", pa.array(part, pa.int32()))

    def _pairs_partition(g: pa.Table) -> pa.Table:
        t = g[id_col].type
        if g.num_rows == 0:
            return pa.table({"a": pa.array([], t), "b": pa.array([], t)})
        idx = pc.sort_indices(
            g, sort_keys=[(k, "ascending") for k in key_cols]
            + [(id_col, "ascending")])
        g = g.take(idx)
        change = np.zeros(g.num_rows, dtype=bool)
        change[0] = True
        for k in key_cols:
            v = g[k]
            if isinstance(v, pa.ChunkedArray):
                v = v.combine_chunks()
            arr = v.to_numpy(zero_copy_only=False)
            change[1:] |= arr[1:] != arr[:-1]
        codes = np.cumsum(change) - 1
        ids = g[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        if pa.types.is_integer(t):
            ids_np = ids.to_numpy(zero_copy_only=False)
        else:  # string ids: Arrow sorted by UTF-8 bytes == Python order
            # for the engine's ASCII pids
            ids_np = np.asarray(ids.to_pylist(), dtype=object)
        import logging

        a, b = _segmented_pairs(
            ids_np, codes, max_bucket,
            log_fn=(lambda n_ids: logging.getLogger(__name__).warning(
                "%s bucket truncated: %d ids > max_bucket=%d",
                log_tag, n_ids, max_bucket))
            if max_bucket is not None else None)
        return pa.table({"a": pa.array(list(a), t), "b": pa.array(list(b), t)})

    parted = banded_ds.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _pairs_partition, batch_format="pyarrow")


def join_pair_payload(pairs_ds, payload_ds, *, id_col: str,
                      payload_col: str, num_partitions: int = 8):
    """Re-acquire a per-id payload for BOTH sides of candidate pairs —
    the scale-safe alternative to broadcasting the payload table. Returns
    ``(a, b, payload_a, payload_b)`` where ``payload_b`` keeps
    ``payload_col``'s name.

    Implemented as two TAG-UNION-REPARTITION-GROUPBY passes (the
    ``stages/joins.py`` discipline: hash both relations on the key into a
    shared partition space, one sort-shuffle groupby, Arrow ``Table.join``
    inside each co-located group) rather than two ``Dataset.join``s: each
    hash-shuffle join spins up its own aggregator actor pool plus a
    barrier, which dominated this stage's wall time at toy scale (r4
    verdict: `near_dup_pages` flat ~10.7 s since r1; measured here, the
    two joins + barrier were 6.7 s of it). The shuffle volume and skew
    behavior are identical — pairs and payload both move once per side,
    partitioned by the same key hash — so the 100 TB shape is unchanged.

    Empty candidate blocks (sparse bucket/distinct partitions emit them
    structurally, and they arrive SCHEMA-LESS from ``map_groups``) are
    compacted away first, and an entirely-empty pair set short-circuits
    to a typed empty result (a ZERO-block dataset has no schema at all).
    The candidate set is materialized once: it is orders of magnitude
    smaller than the corpus and the block compaction needs block-level
    metadata.

    Rows are told apart by an explicit ``__side`` int8 tag (the
    ``stages/joins.py`` discipline), so null payload values pass through
    correctly rather than being misclassified as pair rows."""
    import ray.data as rd

    from ..arrow_utils import compact_nonempty_blocks, stable_part_codes

    psch = payload_ds.schema()  # ray Schema: .names / .types (pyarrow)
    ptype = dict(zip(psch.names, psch.types))[payload_col]

    def _typed_empty(cands):
        itype = None
        if cands is not None:
            csch = cands.schema()
            itype = (dict(zip(csch.names, csch.types)).get("a")
                     if csch else None)
        return rd.from_arrow(pa.table({
            "a": pa.array([], itype or pa.int64()),
            "b": pa.array([], itype or pa.int64()),
            "payload_a": pa.array([], ptype),
            payload_col: pa.array([], ptype),
        }))

    cands = compact_nonempty_blocks(pairs_ds.materialize())
    if cands is None:  # no candidate rows at all
        return _typed_empty(None)
    itype = dict(zip(cands.schema().names, cands.schema().types))["a"]
    nparts = num_partitions * 16  # finer codes bound per-group memory

    def _side(pairs, key_col: str, out_name: str, carry: tuple):
        """One side's acquisition: union (pair rows ∪ payload rows) keyed
        by ``key_col``/id, hash-partition, in-group Arrow inner join."""

        def _tag_pairs(b: pa.Table) -> pa.Table:
            cols = {"__k": b[key_col], "a": b["a"], "b": b["b"]}
            for c in carry:
                cols[c] = b[c]
            cols["__pay"] = pa.nulls(b.num_rows, ptype)
            cols["__side"] = pa.array(
                np.zeros(b.num_rows, dtype=np.int8))
            part = stable_part_codes(b[key_col], nparts)
            cols["__part"] = pa.array(part, pa.int32())
            return pa.table(cols)

        def _tag_payload(b: pa.Table) -> pa.Table:
            n = b.num_rows
            cols = {"__k": b[id_col].cast(itype),
                    "a": pa.nulls(n, itype), "b": pa.nulls(n, itype)}
            for c in carry:
                cols[c] = pa.nulls(n, ptype)
            cols["__pay"] = b[payload_col]
            cols["__side"] = pa.array(np.ones(n, dtype=np.int8))
            part = stable_part_codes(b[id_col], nparts)
            cols["__part"] = pa.array(part, pa.int32())
            return pa.table(cols)

        def _merge(g: pa.Table) -> pa.Table:
            is_pay = pc.equal(g["__side"], 1)
            pay = g.filter(is_pay).select(["__k", "__pay"])
            prs = g.filter(pc.invert(is_pay)).drop_columns(
                ["__pay", "__part", "__side"])
            j = prs.join(pay, keys=["__k"], join_type="inner")
            out = {"a": j["a"], "b": j["b"]}
            for c in carry:
                out[c] = j[c]
            out[out_name] = j["__pay"]
            return pa.table(out)

        tagged = pairs.map_batches(_tag_pairs, batch_format="pyarrow")
        tagged = tagged.union(payload_ds.map_batches(
            _tag_payload, batch_format="pyarrow"))
        return tagged.repartition(num_partitions).groupby(
            "__part").map_groups(_merge, batch_format="pyarrow")

    j1 = _side(cands, "a", "payload_a", ())
    return _side(j1, "b", payload_col, ("payload_a",))


def distinct_pairs(pairs_ds, *, num_partitions: int = 16,
                   cols: tuple = ("a", "b")):
    """Scale-safe pair distinct: ONE int-keyed hash shuffle (partition =
    hash(a,b) mod a dense part space) + per-partition Arrow distinct — no
    single-block funnel, parallelism bounded by ``num_partitions`` (the
    input is round-robined down to that many blocks so Ray's sort shuffle
    never schedules an empty — schema-less — reduce partition)."""

    def _add_part(b: pa.Table) -> pa.Table:
        from ..arrow_utils import stable_part_codes

        # vectorized pair hash: per-column crc over dictionary-encoded
        # uniques, folded with a uint64 odd-constant mix (same discipline
        # as rollup._combine's hashpart) — no per-row Python
        h = stable_part_codes(b[cols[0]], None)
        h = (h * np.uint64(0x9E3779B97F4A7C15)
             + stable_part_codes(b[cols[1]], None))
        part = (h % np.uint64(num_partitions * 64)).astype(np.int32)
        return b.append_column("__part", pa.array(part, pa.int32()))

    def _distinct(g: pa.Table) -> pa.Table:
        keep = [c for c in g.column_names if c != "__part"]
        agg = g.group_by(list(cols)).aggregate(
            [(c, "min") for c in keep if c not in cols])
        mapping = {c: c for c in cols}
        mapping.update({f"{c}_min": c for c in keep if c not in cols})
        from ..arrow_utils import rename_agg

        return rename_agg(agg, mapping)

    parted = pairs_ds.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _distinct, batch_format="pyarrow")


def lsh_candidate_pairs(sig_ds, *, bands: int = 16, id_col: str = "doc_id",
                        max_bucket: int | None = None,
                        num_partitions: int = 16):
    """signatures -> banded buckets -> distinct candidate pairs (a < b).

    The band groupby shuffles ``(band, band_hash, id)`` rows only (key
    space = band hashes -> uniform); the cross-band pair dedup is a
    hash-partitioned distinct, never a single block. ``max_bucket`` is an
    OPT-IN guard that truncates pathological buckets (logged) at the cost
    of missed pairs — leave None when downstream claims exact recall."""

    def _bands(b: pa.Table) -> pa.Table:
        mh = b["minhash"]
        if isinstance(mh, pa.ChunkedArray):
            mh = mh.combine_chunks()
        n = len(mh)
        ids = b[id_col]
        if n == 0:
            return pa.table({
                "band": pa.array([], pa.int32()),
                "band_hash": pa.array([], pa.int64()),
                id_col: ids,
            })
        # vectorized FNV-1a over each band's slice of the signature matrix
        # (the band key only buckets: equal slices always collide, unequal
        # slices collide with ~2^-64 probability and any false candidate is
        # removed by the exact verify stage — so no cryptographic digest is
        # needed and the whole batch hashes in num_perm vector ops)
        flat = mh.flatten().to_numpy(zero_copy_only=False).astype(np.uint64)
        k = len(flat) // n  # num_perm (constant per signature)
        if bands > k or k % bands:
            # bands > k makes r = 0 -> every band hash a CONSTANT -> one
            # global bucket -> a silent O(n^2) candidate explosion; a
            # remainder silently discards trailing signature values
            raise ValueError(
                f"bands ({bands}) must divide the signature length ({k})")
        r = k // bands
        sa = flat.reshape(n, k)
        prime = np.uint64(0x100000001B3)
        hashes = np.empty((n, bands), dtype=np.uint64)
        for bi in range(bands):
            h = np.full(n, 0xCBF29CE484222325, dtype=np.uint64)
            for j in range(r):
                h = (h ^ sa[:, bi * r + j]) * prime
            hashes[:, bi] = h
        return pa.table({
            "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), n)),
            "band_hash": pa.array(hashes.reshape(-1).view(np.int64)),
            id_col: ids.take(pa.array(np.repeat(np.arange(n), bands))),
        })

    banded = sig_ds.map_batches(_bands, batch_format="pyarrow")
    pairs = bucket_candidate_pairs(
        banded, key_cols=["band", "band_hash"], id_col=id_col,
        max_bucket=max_bucket, num_partitions=num_partitions, log_tag="lsh")
    return distinct_pairs(pairs, num_partitions=num_partitions)


def verify_jaccard_pairs(pairs_ds, texts_ds, *, id_col: str = "doc_id",
                         text_col: str = "text", shingle_w: int = 3,
                         threshold: float = 0.8, num_partitions: int = 8):
    """Exact-Jaccard verification of candidate pairs: texts re-acquired
    through the hash-partitioned ``join_pair_payload`` scaffold (never
    broadcast / driver-materialized, so the stage survives any corpus
    size). An actor-held shingle cache (keyed by id) amortizes
    re-shingling of ids that appear in many pairs."""
    j2 = join_pair_payload(pairs_ds, texts_ds, id_col=id_col,
                           payload_col=text_col,
                           num_partitions=num_partitions)

    # task-based (no actor-pool spin-up); cloudpickle captures this dict
    # BY VALUE into each task's closure, so every task deserializes its
    # own copy — the cache amortizes re-shingling across the batches one
    # task processes (ids repeated across many pairs), never across
    # executions, so stale entries cannot leak between runs
    cache: dict = {}

    def _verify(b: pa.Table) -> pa.Table:

        def _sh(key, text):
            v = cache.get(key)
            if v is None:
                if len(cache) > 200_000:
                    cache.clear()
                v = word_shingles(text, shingle_w)
                cache[key] = v
            return v

        a_ids = b["a"].to_pylist()
        b_ids = b["b"].to_pylist()
        ta = b["payload_a"].to_pylist()
        tb = b[text_col].to_pylist()
        js = [jaccard(_sh(x, xt), _sh(y, yt))
              for x, xt, y, yt in zip(a_ids, ta, b_ids, tb)]
        out = pa.table({"a": b["a"], "b": b["b"],
                        "jaccard": pa.array(js, pa.float64())})
        return out.filter(pc.greater_equal(out["jaccard"], threshold))

    return j2.map_batches(_verify, batch_format="pyarrow")


def near_dup_pairs(ds, *, id_col: str = "doc_id", text_col: str = "text",
                   num_perm: int = 128, bands: int = 16, shingle_w: int = 3,
                   threshold: float = 0.8, num_partitions: int = 8):
    """MinHash+LSH near-duplicate pairs end to end over ONE Dataset (it is
    consumed twice: signatures and the verify joins).

    ``num_partitions`` sizes the pair-distinct and the two verify joins;
    each join reserves ~0.125 CPU per aggregator, so keep it a small
    fraction of the cluster (measured: 4-8 optimal at 32 cpus, 32+
    starves the map stages)."""
    sigs = minhash_signatures(ds, num_perm=num_perm, shingle_w=shingle_w,
                              id_col=id_col, text_col=text_col)
    cands = lsh_candidate_pairs(sigs, bands=bands, id_col=id_col,
                                num_partitions=max(4, num_partitions))
    return verify_jaccard_pairs(cands, ds, id_col=id_col, text_col=text_col,
                                shingle_w=shingle_w, threshold=threshold,
                                num_partitions=num_partitions)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_batch(batch: pa.Table, *, text_col: str = "text",
                  id_col: str = "doc_id",
                  cache: dict | None = None) -> pa.Table:
    texts = batch[text_col].to_pylist()
    shifts = np.arange(64, dtype=np.uint64)
    # batch-unique tokens hashed once; the ±1 bit matrix is built per
    # UNIQUE token (|vocab| x 64 int8) and per-doc sums gather through the
    # dictionary indices — no per-occurrence md5, no per-token Python
    uh, inv, off = _hash_tokens_batch(texts, cache)
    out = np.zeros(len(texts), dtype=np.uint64)
    if len(uh):
        bits_u = ((((uh[:, None] >> shifts[None, :]) & np.uint64(1))
                   .astype(np.int8) << 1) - 1)  # ±1 per (unique token, bit)
        for i in range(len(texts)):
            seg = inv[off[i]: off[i + 1]]
            if not len(seg):
                continue
            acc = bits_u[seg].sum(axis=0, dtype=np.int64)
            out[i] = ((acc > 0).astype(np.uint64) << shifts).sum(
                dtype=np.uint64)
    return pa.table({
        id_col: batch[id_col],
        "simhash": pa.array(out.view(np.int64)),
    })


def simhash_signatures(ds, **kw):
    return ds.map_batches(lambda b: simhash_batch(b, **kw),
                          batch_format="pyarrow")


def simhash_near_dup_pairs(ds, *, id_col: str = "doc_id",
                           text_col: str = "text", max_hamming: int = 3,
                           max_bucket: int | None = None,
                           num_partitions: int = 8):
    """SimHash near-duplicate pairs: 64-bit signatures banded into FOUR
    16-bit blocks; any pair within Hamming distance <= 3 must agree on at
    least one whole block (pigeonhole: 3 differing bits cannot touch all 4
    blocks), so the band groupby has PERFECT recall at ``max_hamming <= 3``
    — the exact-hamming verify then keeps true pairs only, making the
    whole operator's output EQUAL to the quadratic all-pairs definition
    (the SQL oracle) at any scale PROVIDED ``max_bucket`` stays None (the
    opt-in truncation guard trades that exactness for bounded emission).
    One band shuffle of (band, key16, id) rows + a hash-partitioned pair
    distinct; the verify joins signatures (8 bytes) back, never texts."""
    if max_hamming > 3:
        # the 4x16-bit banding's pigeonhole recall guarantee stops at 3
        # differing bits; accepting a larger bound would silently drop
        # qualifying pairs whose diffs touch all four blocks
        raise ValueError(
            "max_hamming > 3 breaks the 4-band pigeonhole recall "
            "guarantee; use more/narrower bands or the all-pairs verify")
    sigs = simhash_signatures(ds, id_col=id_col, text_col=text_col)

    def _bands(b: pa.Table) -> pa.Table:
        sig = b["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        ids = b[id_col]
        n = len(sig)
        keys = np.empty(4 * n, dtype=np.int32)
        for bi in range(4):
            keys[bi::4] = ((sig >> np.uint64(16 * bi))
                           & np.uint64(0xFFFF)).astype(np.int32)
        return pa.table({
            "band": pa.array(np.tile(np.arange(4, dtype=np.int32), n)),
            "key": pa.array(keys),
            id_col: ids.take(pa.array(np.repeat(np.arange(n), 4))),
        })

    banded = sigs.map_batches(_bands, batch_format="pyarrow")
    cands = distinct_pairs(
        bucket_candidate_pairs(
            banded, key_cols=["band", "key"], id_col=id_col,
            max_bucket=max_bucket, num_partitions=num_partitions,
            log_tag="simhash"),
        num_partitions=num_partitions)

    j2 = join_pair_payload(cands, sigs, id_col=id_col,
                           payload_col="simhash",
                           num_partitions=num_partitions)

    def _verify(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            # typed empty: reuse the batch's OWN id/payload types
            return pa.table({"a": b["a"], "b": b["b"],
                             "hamming": pa.array([], pa.int64())})
        sa = b["payload_a"].to_numpy(zero_copy_only=False).view(np.uint64)
        sb = b["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        x = sa ^ sb
        ham = np.zeros(len(x), dtype=np.int64)
        for _ in range(64):  # branch-free popcount via shift-accumulate
            ham += (x & np.uint64(1)).astype(np.int64)
            x = x >> np.uint64(1)
        out = pa.table({"a": b["a"], "b": b["b"],
                        "hamming": pa.array(ham, pa.int64())})
        return out.filter(pc.less_equal(out["hamming"], max_hamming))

    return j2.map_batches(_verify, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# character-n-gram Jaccard (exact similarity join via prefix filtering)
# ---------------------------------------------------------------------------

def char_ngram_codes(texts: list, n: int = 5) -> list:
    """Per-doc SORTED distinct character-n-gram codes for a batch of ASCII
    texts. Each n-gram (n <= 8 bytes) packs big-endian into one uint64, so
    integer order == the n-gram's lexicographic byte order — the global
    total order the prefix filter needs — and every downstream shuffle
    ships int64 codes, never strings. The windowing is n vector ops over
    the batch's CONCATENATED bytes (windows crossing doc boundaries are
    masked out), then one ``np.unique`` per doc segment."""
    if n > 8:
        raise ValueError("n-gram codes pack into uint64: n must be <= 8")
    if not texts:
        return []
    data = np.frombuffer("".join(texts).encode(), np.uint8).astype(np.uint64)
    lens = np.fromiter((len(t) for t in texts), np.int64, len(texts))
    offs = np.concatenate(([0], np.cumsum(lens)))
    total = int(offs[-1])
    if total < n:
        return [np.empty(0, np.uint64) for _ in texts]
    n_win = total - n + 1
    codes = np.zeros(n_win, dtype=np.uint64)
    for j in range(n):
        codes = (codes << np.uint64(8)) + data[j: j + n_win]
    out = []
    for d in range(len(texts)):
        lo, hi = int(offs[d]), int(offs[d + 1]) - n + 1
        out.append(np.unique(codes[lo:hi]) if hi > lo
                   else np.empty(0, np.uint64))
    return out


def corpus_stop_grams(ds, *, id_col: str = "doc_id",
                      text_col: str = "text", n: int = 5,
                      stop_m: int = 1024, sample_mod: int = 4) -> tuple:
    """``(codes_sorted, dfs)`` — the ``stop_m`` most document-frequent
    n-gram codes with their frequencies, estimated from the deterministic
    doc sample ``id % sample_mod == 0``; ``codes_sorted`` is uint64
    ascending and ``dfs`` is aligned to it. Used only to ORDER prefixes
    (df-ascending, the classic AllPairs choice) — the prefix filter is
    exact under any consistent global order, so sampling error costs
    bucket size, never pairs.

    Scale shape: per-batch partial df (top 2m kept) -> 16-way tree merge
    -> one small final merge; driver sees <= 16 * 2m rows total, never the
    corpus gram space."""

    def _partial(b: pa.Table) -> pa.Table:
        ids = b[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        if pa.types.is_integer(ids.type):
            # id % mod — the SQL-restatable form the oracles replay
            mask = (ids.to_numpy(zero_copy_only=False).astype(np.int64)
                    % sample_mod) == 0
        else:
            # string ids (supported throughout the pair machinery): the
            # vectorized stable hash gives the same deterministic 1/mod
            # sample without the int cast that used to crash here
            from ..arrow_utils import stable_part_codes

            mask = (stable_part_codes(ids, None)
                    % np.uint64(sample_mod)) == 0
        texts = [t for t, m in zip(b[text_col].to_pylist(), mask) if m]
        sets = char_ngram_codes(texts, n)
        allg = (np.concatenate(sets) if sets
                else np.empty(0, np.uint64))
        g, c = np.unique(allg, return_counts=True)
        if len(g) > 2 * stop_m:
            keep = np.argpartition(c, -2 * stop_m)[-2 * stop_m:]
            g, c = g[keep], c[keep]
        return pa.table({"gram": pa.array(g.view(np.int64), pa.int64()),
                         "cnt": pa.array(c.astype(np.int64), pa.int64())})

    def _merge(b: pa.Table) -> pa.Table:
        t = b.group_by(["gram"]).aggregate([("cnt", "sum")])
        g = t["gram"].to_numpy(zero_copy_only=False)
        c = t["cnt_sum"].to_numpy(zero_copy_only=False)
        if len(g) > 2 * stop_m:
            keep = np.argpartition(c, -2 * stop_m)[-2 * stop_m:]
            g, c = g[keep], c[keep]
        return pa.table({"gram": pa.array(g, pa.int64()),
                         "cnt": pa.array(c, pa.int64())})

    _merge.__name__ = "merge_stop_grams"  # map_batches display name
    parts = ds.map_batches(_partial, batch_format="pyarrow")
    merged = (parts.repartition(16).map_batches(_merge,
                                                batch_format="pyarrow")
              .repartition(1).map_batches(_merge, batch_format="pyarrow"))
    t = merged.take_all()
    if not t:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    g = np.fromiter((r["gram"] for r in t), np.int64, len(t))
    c = np.fromiter((r["cnt"] for r in t), np.int64, len(t))
    top = np.argsort(-c, kind="stable")[:stop_m]
    g, c = g[top].view(np.uint64), c[top]
    o = np.argsort(g)
    return g[o], c[o]


def ngram_prefix_index(ds, *, id_col: str = "doc_id",
                       text_col: str = "text", n: int = 5,
                       threshold: float = 0.5,
                       stop_grams: tuple | None = None):
    """(id, text) -> (gram int64, id) prefix-index rows.

    Prefix filter (AllPairs/PPJoin family, Bayardo et al. WWW'07): under
    ANY global total order on tokens, two sets with Jaccard >= t must
    share a token within each side's first ``|S| - ceil(t*|S|) + 1``
    tokens — so indexing only those prefixes loses NO qualifying pair
    while shrinking the inverted index by the factor t.

    The global order is df-ascending over the sampled ``stop_grams``
    table ``(codes_sorted, dfs)`` — grams absent from the table count as
    df 0 (rarest), byte order breaks ties — so a doc's prefix is its
    RAREST grams and stop-gram buckets mostly vanish from the index
    (measured 4.3M -> 0.9M candidate emissions on the bench corpus).
    With ``stop_grams=None`` the order is plain byte order (still exact;
    hot buckets possible on vocabulary-heavy corpora)."""
    if stop_grams is not None and len(stop_grams[0]):
        stops, dfs = stop_grams
        stops = stops.astype(np.uint64)
    else:
        stops = None

    def _prefix(b: pa.Table) -> pa.Table:
        texts = b[text_col].to_pylist()
        sets = char_ngram_codes(texts, n)
        ids = b[id_col]
        plens = np.fromiter(
            (len(s) - int(np.ceil(threshold * len(s))) + 1 if len(s) else 0
             for s in sets), np.int64, len(sets))
        if stops is None:
            pref = [s[:p] for s, p in zip(sets, plens)]
        else:
            pref = []
            for s, p in zip(sets, plens):
                if not len(s):
                    pref.append(s)
                    continue
                idx = np.searchsorted(stops, s)
                idx[idx == len(stops)] = 0
                found = stops[idx] == s
                rank = np.where(found, dfs[idx], 0)
                # df-ascending, byte-order tiebreak (lexsort: last key is
                # primary)
                order = np.lexsort((s, rank))
                pref.append(s[order[:p]])
        grams = (np.concatenate(pref) if pref
                 else np.empty(0, np.uint64))
        return pa.table({
            "gram": pa.array(grams.view(np.int64), pa.int64()),
            id_col: ids.take(pa.array(np.repeat(np.arange(len(sets)),
                                                plens))),
        })

    return ds.map_batches(_prefix, batch_format="pyarrow")


def ngram_jaccard_pairs(ds, *, id_col: str = "doc_id",
                        text_col: str = "text", n: int = 5,
                        threshold: float = 0.5,
                        max_bucket: int | None = None,
                        stop_m: int | None = 1024,
                        num_partitions: int = 8):
    """EXACT all-pairs character-n-gram Jaccard similarity join: every
    pair (a < b) with ``J(grams(a), grams(b)) >= threshold``, with the
    exact ``(n_inter, n_union, jaccard)``. Equals the quadratic definition
    (the SQL oracle) at any scale PROVIDED ``max_bucket`` stays None — the
    prefix filter is lossless, unlike MinHash banding's probabilistic
    recall, and stays lossless under ANY consistent prefix order.

    Scale shape: a sampled stop-gram df pass (``stop_m`` top grams; the
    df-ascending prefix order collapses stop-gram buckets — measured 4.7x
    fewer candidate emissions on the bench corpus — and costs nothing in
    exactness), one prefix-index emission (int64 gram codes, ~(1-t) of
    the full inverted index), ONE int-keyed bucket shuffle for candidate
    pairs, a hash-partitioned pair distinct, then exact verification with
    texts re-acquired through two hash-partitioned joins. ``stop_m=None``
    skips the df pass (plain byte order — hot buckets possible on
    vocabulary-heavy corpora); ``max_bucket`` remains the opt-in emission
    cap (logged drops) for adversarial corpora."""
    stops = (corpus_stop_grams(ds, id_col=id_col, text_col=text_col, n=n,
                               stop_m=stop_m)
             if stop_m else None)
    cands = distinct_pairs(
        bucket_candidate_pairs(
            ngram_prefix_index(ds, id_col=id_col, text_col=text_col, n=n,
                               threshold=threshold, stop_grams=stops),
            key_cols=["gram"], id_col=id_col, max_bucket=max_bucket,
            num_partitions=num_partitions, log_tag="ngram"),
        num_partitions=num_partitions)

    j2 = join_pair_payload(cands, ds, id_col=id_col, payload_col=text_col,
                           num_partitions=num_partitions)

    class _Verify:
        def __init__(self):
            self.cache: dict = {}

        def _set(self, key, text):
            v = self.cache.get(key)
            if v is None:
                if len(self.cache) > 200_000:
                    self.cache.clear()
                v = char_ngram_codes([text], n)[0]
                self.cache[key] = v
            return v

        def __call__(self, b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.table({"a": b["a"], "b": b["b"],
                                 "n_inter": pa.array([], pa.int64()),
                                 "n_union": pa.array([], pa.int64()),
                                 "jaccard": pa.array([], pa.float64())})
            a_ids = b["a"].to_pylist()
            b_ids = b["b"].to_pylist()
            ta = b["payload_a"].to_pylist()
            tb = b[text_col].to_pylist()
            ni = np.empty(b.num_rows, np.int64)
            nu = np.empty(b.num_rows, np.int64)
            for i, (x, xt, y, yt) in enumerate(zip(a_ids, ta, b_ids, tb)):
                sa, sb = self._set(x, xt), self._set(y, yt)
                inter = len(np.intersect1d(sa, sb, assume_unique=True))
                ni[i] = inter
                nu[i] = len(sa) + len(sb) - inter
            out = pa.table({
                "a": b["a"], "b": b["b"],
                "n_inter": pa.array(ni, pa.int64()),
                "n_union": pa.array(nu, pa.int64()),
                "jaccard": pa.array(
                    ni.astype(np.float64)
                    / np.where(nu > 0, nu, 1).astype(np.float64),
                    pa.float64()),
            })
            # same float comparison the SQL oracle runs: n_inter >= t*n_union
            return out.filter(pc.greater_equal(
                pc.cast(out["n_inter"], pa.float64()),
                pc.multiply(pa.scalar(threshold),
                            pc.cast(out["n_union"], pa.float64()))))

    return j2.map_batches(_Verify, batch_format="pyarrow",
                          concurrency=(1, 8))


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------

def benchmark_shingle_set(ds, *, w: int = 3, text_col: str = "text"):
    """Distinct w-gram shingle hashes of a (SMALL) benchmark corpus as a
    sorted uint64 array — the broadcast side of
    :func:`contamination_check`. Eval suites are tiny next to the
    training corpus, so a driver-side union is the right shape (the
    standard decontamination layout: benchmark n-gram set in memory,
    training corpus streamed)."""
    import ray

    def _sh(b: pa.Table) -> pa.Table:
        texts = b[text_col].to_pylist()
        uh, inv, off = _hash_tokens_batch(texts, None)
        th = uh[inv]
        parts = []
        for i in range(len(texts)):
            seg = th[off[i]:off[i + 1]]
            if len(seg) == 0:
                continue
            if len(seg) < w:
                toks = texts[i].split()
                parts.append(np.array(
                    [_stable_u64(" ".join(toks).encode()) & _MERSENNE],
                    dtype=np.uint64))
            else:
                parts.append(_shingles_from_hashes(seg, w))
        u = (np.unique(np.concatenate(parts)) if parts
             else np.empty(0, np.uint64))
        return pa.table({"g": pa.array(u.view(np.int64))})

    refs = ds.map_batches(_sh, batch_format="pyarrow").repartition(
        1).to_arrow_refs()
    tbl = pa.concat_tables([ray.get(r) for r in refs])
    return np.unique(tbl["g"].to_numpy(zero_copy_only=False)
                     .view(np.uint64))


class ContaminationChecker:
    """Actor-pool stage: flags training docs sharing any w-gram with the
    broadcast benchmark set (the lm-eval-style n-gram decontamination
    check, over the same md5/31-bit shingle ring as MinHash so the whole
    operator — including hash collisions — replays exactly in SQL).
    Benchmark array is fetched ONCE per actor in ``__init__``."""

    def __init__(self, bench_ref, w: int = 3, id_col: str = "doc_id",
                 text_col: str = "text"):
        import ray

        self._bench = ray.get(bench_ref)  # sorted uint64
        self._w = w
        self.id_col = id_col
        self.text_col = text_col
        self._cache: dict = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        uh, inv, off = _hash_tokens_batch(texts, self._cache)
        th = uh[inv]
        n_grams = np.zeros(len(texts), np.int64)
        n_hits = np.zeros(len(texts), np.int64)
        for i, t in enumerate(texts):
            seg = th[off[i]:off[i + 1]]
            if len(seg) == 0:
                continue
            if len(seg) < self._w:
                toks = t.split()
                sh = np.array(
                    [_stable_u64(" ".join(toks).encode()) & _MERSENNE],
                    dtype=np.uint64)
            else:
                sh = _shingles_from_hashes(seg, self._w)
            n_grams[i] = len(sh)
            idx = np.searchsorted(self._bench, sh)
            idx[idx >= len(self._bench)] = 0
            if len(self._bench):
                n_hits[i] = int((self._bench[idx] == sh).sum())
        return pa.table({
            self.id_col: batch[self.id_col],
            "n_grams": pa.array(n_grams),
            "n_hits": pa.array(n_hits),
            "contaminated": pa.array(n_hits > 0),
        })


def contamination_check(ds, bench: np.ndarray, *, w: int = 3,
                        id_col: str = "doc_id", text_col: str = "text"):
    """Stream the training corpus against the broadcast benchmark shingle
    set: ``(id, n_grams, n_hits, contaminated)`` per doc. No shuffle —
    the benchmark side is ``ray.put`` once and read per actor."""
    import ray

    ref = ray.put(np.sort(bench.astype(np.uint64)))
    return ds.map_batches(
        ContaminationChecker, fn_constructor_kwargs={
            "bench_ref": ref, "w": w, "id_col": id_col,
            "text_col": text_col},
        batch_format="pyarrow", concurrency=(1, 8))


# ---------------------------------------------------------------------------
# incremental dedup against a base corpus
# ---------------------------------------------------------------------------

def dedup_against(new_ds, base_ds, *, text_col: str = "text",
                  id_col: str = "doc_id", num_partitions: int = 16):
    """Incremental-crawl dedup: flag every NEW doc whose content already
    exists in the (large) BASE corpus — the recrawl-vs-index anti-join.

    Scale shape (100 TB): the base corpus is NOT broadcast (it is as big
    as the input); both sides collapse to (md5, side) rows map-side, meet
    in ONE hash(md5) shuffle with bounded reducers, and each partition
    answers membership with a single sorted vectorized pass. New-side
    payload carries only (id, md5) — texts never travel.

    Returns ``(id_col, seen_in_base: bool)`` for every new doc."""
    from ..arrow_utils import stable_part_codes

    mod = num_partitions * 64

    def _tag(side: int):
        def _f(b: pa.Table) -> pa.Table:
            hashed = content_hash_batch(b, text_col, out_col="k")
            ids = (hashed[id_col] if side == 1
                   else pa.nulls(b.num_rows, b[id_col].type))
            t = pa.table({
                "k": hashed["k"], "id": ids,
                "side": pa.array(np.full(b.num_rows, side, np.int8)),
            })
            if side == 0:  # base side: distinct md5 per block is enough
                g = t.group_by(["k"]).aggregate([])
                return pa.table({
                    "k": g["k"], "id": pa.nulls(g.num_rows, b[id_col].type),
                    "side": pa.array(np.zeros(g.num_rows, np.int8)),
                })
            return t
        return _f

    _add_part = make_add_part("k", mod)

    def _member(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        id_type = t["id"].type
        new_mask = pc.equal(t["side"], 1)
        new_rows = t.filter(new_mask)
        if new_rows.num_rows == 0:
            return pa.table({"id": pa.array([], id_type),
                             "seen_in_base": pa.array([], pa.bool_())})
        base_keys = t.filter(pc.equal(t["side"], 0))["k"]
        if isinstance(base_keys, pa.ChunkedArray):
            base_keys = base_keys.combine_chunks()
        seen = pc.is_in(new_rows["k"], value_set=base_keys)
        return pa.table({"id": new_rows["id"],
                         "seen_in_base": pc.fill_null(seen, False)})

    tagged = new_ds.map_batches(_tag(1), batch_format="pyarrow").union(
        base_ds.map_batches(_tag(0), batch_format="pyarrow"))
    parted = tagged.map_batches(_add_part, batch_format="pyarrow")
    out = parted.repartition(num_partitions).groupby("__part").map_groups(
        _member, batch_format="pyarrow")

    def _rename(b: pa.Table) -> pa.Table:
        return pa.table({id_col: b["id"], "seen_in_base": b["seen_in_base"]})

    return out.map_batches(_rename, batch_format="pyarrow")


def containment_pairs(ds, *, id_col: str = "doc_id",
                      text_col: str = "text", w: int = 3,
                      df_cap: int = 64, num_partitions: int = 8):
    """Shingle-CONTAINMENT near-dup join (Broder 1997's asymmetric
    resemblance companion): for every document pair sharing at least one
    informative w-gram shingle, the exact intersection size over the
    INFORMATIVE shingle vocabulary — shingles with document frequency in
    ``[2, df_cap]`` (df=1 can't be shared; df > df_cap is boilerplate,
    and the cap is part of the operator's definition so the SQL oracle
    replays it) — plus per-side informative-set sizes and the
    containment flags ``2*inter >= sz`` (t=0.5), kept when either side
    is contained. Catches the sub-document case Jaccard misses: a short
    doc fully embedded in a long one has high containment but low
    Jaccard.

    Scale shape: same md5/31-bit shingle ring as MinHash (collisions
    replayed in SQL), map-side per-doc distinct shingles, ONE
    hash(gram) shuffle whose reducers drop df outside [2, df_cap] —
    bounding every gram bucket at df_cap so pair emission is
    O(df_cap^2) per gram, never corpus-quadratic — a second pass over
    the SAME partitioned postings emits segmented within-gram pairs,
    one hashpart pair count, and two bounded hash joins attach the
    per-doc sizes. The df cap is the documented partitioning
    assumption (boilerplate shingles carry no dedup signal)."""
    from .graph import grouped_sum_parts

    def _posts(b: pa.Table) -> pa.Table:
        texts = b[text_col].to_pylist()
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        uh, inv, off = _hash_tokens_batch(texts, None)
        th = uh[inv]
        gs, ds_ = [], []
        for i in range(len(texts)):
            seg = th[off[i]:off[i + 1]]
            if len(seg) == 0:
                continue
            if len(seg) < w:
                sh = np.array([_stable_u64(
                    " ".join(texts[i].split()).encode()) & _MERSENNE],
                    dtype=np.uint64)
            else:
                sh = _shingles_from_hashes(seg, w)
            gs.append(sh)
            ds_.append(np.full(len(sh), ids[i], np.int64))
        if not gs:
            return pa.table({"g": pa.array([], pa.int64()),
                             "doc": pa.array([], pa.int64())})
        return pa.table({
            "g": pa.array(np.concatenate(gs).view(np.int64)),
            "doc": pa.array(np.concatenate(ds_))})

    mod = num_partitions * 64
    _add_part = make_add_part("g", mod)

    def _df_filter(gr: pa.Table) -> pa.Table:
        t = gr.drop_columns(["__part"])
        if t.num_rows == 0:
            return pa.table({"g": pa.array([], pa.int64()),
                             "doc": pa.array([], pa.int64())})
        t = t.take(pc.sort_indices(t, sort_keys=[("g", "ascending"),
                                                 ("doc", "ascending")]))
        g = t["g"].to_numpy(zero_copy_only=False)
        n = len(g)
        starts = np.concatenate(
            [[0], np.flatnonzero(g[1:] != g[:-1]) + 1])
        counts = np.diff(np.concatenate([starts, [n]]))
        keep_grp = (counts >= 2) & (counts <= df_cap)
        keep = np.repeat(keep_grp, counts)
        return t.filter(pa.array(keep))

    posts = ds.map_batches(_posts, batch_format="pyarrow")
    parted = posts.map_batches(_add_part, batch_format="pyarrow")
    kept = parted.repartition(num_partitions).groupby("__part").map_groups(
        _df_filter, batch_format="pyarrow").materialize()  # reused 2x

    sizes = grouped_sum_parts(kept, ["doc"], [], count_col="sz", fanin=4)

    def _pairs(gr: pa.Table) -> pa.Table:
        t = gr.drop_columns(["__part"])
        if t.num_rows == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        t = t.take(pc.sort_indices(t, sort_keys=[("g", "ascending"),
                                                 ("doc", "ascending")]))
        g = t["g"].to_numpy(zero_copy_only=False)
        ids = t["doc"].to_numpy(zero_copy_only=False).astype(np.int64)
        codes = np.zeros(len(g), np.int64)
        if len(g):
            codes[1:] = np.cumsum(g[1:] != g[:-1])
        a, b = _segmented_pairs(ids, codes, None)
        return pa.table({"a": pa.array(a), "b": pa.array(b)})

    reparted = kept.map_batches(_add_part, batch_format="pyarrow")
    pairs = reparted.repartition(num_partitions).groupby(
        "__part").map_groups(_pairs, batch_format="pyarrow")
    inter = grouped_sum_parts(pairs, ["a", "b"], [], count_col="inter",
                              fanin=4)

    from .joins import hash_inner_join

    def _sz_as(name: str):
        def _f(b: pa.Table) -> pa.Table:
            return pa.table({"doc": b["doc"], name: b["sz"]})
        return _f

    sizes = sizes.materialize()  # consumed by both side-joins
    j = hash_inner_join(inter,
                        sizes.map_batches(_sz_as("sz_a"),
                                          batch_format="pyarrow"),
                        on="a", right_on="doc", num_partitions=4)
    j = hash_inner_join(j,
                        sizes.map_batches(_sz_as("sz_b"),
                                          batch_format="pyarrow"),
                        on="b", right_on="doc", num_partitions=4)

    def _flags(b: pa.Table) -> pa.Table:
        inter_v = b["inter"].to_numpy(zero_copy_only=False)
        sa = b["sz_a"].to_numpy(zero_copy_only=False)
        sb = b["sz_b"].to_numpy(zero_copy_only=False)
        keep = 2 * inter_v >= np.minimum(sa, sb)
        t = pa.table({
            "a": b["a"], "b": b["b"], "inter": b["inter"],
            "sz_a": pa.array(sa.astype(np.int64)),
            "sz_b": pa.array(sb.astype(np.int64)),
            "cont_a": pa.array((2 * inter_v >= sa).astype(np.int64)),
            "cont_b": pa.array((2 * inter_v >= sb).astype(np.int64))})
        return t.filter(pa.array(keep))

    return j.map_batches(_flags, batch_format="pyarrow")
