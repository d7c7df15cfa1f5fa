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

__all__ = [
    "content_hash_batch", "exact_dedup",
    "MinHasher", "minhash_signatures", "lsh_candidate_pairs",
    "verify_jaccard_pairs", "near_dup_pairs",
    "simhash_batch", "simhash_signatures", "simhash_near_dup_pairs",
    "distinct_pairs", "word_shingles", "jaccard",
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


def word_shingles(text: str, w: int = 3, cache: dict | None = None) -> np.ndarray:
    """w-word shingle hashes (31-bit, uint64 dtype), deduplicated.

    Vectorized: each TOKEN is md5-hashed once (``cache`` — an
    actor-held token->hash dict — turns the digest into a dict hit for the
    common-vocabulary bulk of a corpus), then the w-gram hash is a
    position-weighted uint64 mix of consecutive token hashes (three numpy
    adds for w=3 instead of a per-gram digest)."""
    toks = text.split()
    if not toks:
        return np.empty(0, dtype=np.uint64)
    if len(toks) < w:
        return np.array([_stable_u64(" ".join(toks).encode()) & _MERSENNE],
                        dtype=np.uint64)
    if cache is None:
        th = np.fromiter((_stable_u64(t.encode()) for t in toks),
                         dtype=np.uint64, count=len(toks))
    else:
        if len(cache) > 4_000_000:  # bound actor memory
            cache.clear()

        def _h(t):
            v = cache.get(t)
            if v is None:
                v = _stable_u64(t.encode())
                cache[t] = v
            return v

        th = np.fromiter((_h(t) for t in toks), dtype=np.uint64,
                         count=len(toks))
    n_grams = len(toks) - w + 1
    acc = np.zeros(n_grams, dtype=np.uint64)
    for j in range(w):  # w is tiny; each step is one vector FMA
        acc += th[j: j + n_grams] * _SHINGLE_MIX[j]
    return np.unique(acc & np.uint64(_MERSENNE))


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


def exact_dedup(ds, *, text_col: str = "text", order_col: str,
                keep_cols: list | None = None):
    """Keep the first row (by ``order_col``) of each distinct text."""
    hashed = ds.map_batches(
        lambda b: content_hash_batch(b, text_col), batch_format="pyarrow")

    def _first(g: pa.Table) -> pa.Table:
        i = pc.sort_indices(g, sort_keys=[(order_col, "ascending")])
        out = g.take(i[:1])
        return out.select(keep_cols) if keep_cols else out

    return hashed.groupby("content_md5").map_groups(_first, batch_format="pyarrow")


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

    def signature(self, text: str) -> np.ndarray:
        sh = word_shingles(text, self.shingle_w, self._cache)
        if not len(sh):
            return np.zeros(self.num_perm, dtype=np.uint64)
        # (s x k) permuted hashes; products < 2^62 fit uint64 exactly
        prods = (sh[:, None] * self.a[None, :] + self.b[None, :]) % np.uint64(
            _MERSENNE)
        return np.min(prods, axis=0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [self.signature(t) for t in batch[self.text_col].to_pylist()]
        return pa.table({
            self.id_col: batch[self.id_col],
            "minhash": pa.array([s.tolist() for s in sigs],
                                type=pa.list_(pa.uint64())),
        })


def minhash_signatures(ds, **kw):
    return ds.map_batches(MinHasher, fn_constructor_kwargs=kw,
                          batch_format="pyarrow", concurrency=(1, 8))


def _emit_bucket_pairs(ids: list, max_bucket: int | None,
                       log_fn=None) -> tuple:
    """All-pairs over one bucket, vectorized. ``max_bucket`` truncates
    oversized buckets (logged) as an OPT-IN scale guard — it trades
    exactness for bounded O(max_bucket^2) emission, so operators that
    promise equality with a quadratic definition must leave it None."""
    ids = sorted(ids)
    if max_bucket is not None and len(ids) > max_bucket:
        if log_fn is not None:
            log_fn(len(ids))
        ids = ids[:max_bucket]
    n = len(ids)
    if n < 2:
        return [], []
    iu = np.triu_indices(n, k=1)
    arr = np.asarray(ids, dtype=object)
    return arr[iu[0]].tolist(), arr[iu[1]].tolist()


def join_pair_payload(pairs_ds, payload_ds, *, id_col: str,
                      payload_col: str, num_partitions: int = 8):
    """Re-acquire a per-id payload for BOTH sides of candidate pairs via
    two hash-partitioned ``Dataset.join``s (shuffle pairs on ``a``, join,
    shuffle on ``b``, join) — the scale-safe alternative to broadcasting
    the payload table. Returns ``(a, b, payload_a, payload_b)`` where
    ``payload_b`` keeps ``payload_col``'s name.

    Empty candidate blocks (1-id buckets emit them structurally) are
    dropped before each join — Ray's hash-shuffle join loses empty blocks'
    schemas and a partition fed only empties fails to resolve the key
    column — and an entirely-empty pair set short-circuits to a typed
    empty result (a ZERO-block dataset has no schema to join on at all).
    The candidate set is materialized first: it is orders of magnitude
    smaller than the corpus, and the joins would otherwise re-execute the
    whole candidate pipeline."""
    import ray.data as rd

    from ..arrow_utils import drop_empty_blocks

    psch = payload_ds.schema()  # ray Schema: .names / .types (pyarrow)
    ptype = dict(zip(psch.names, psch.types))[payload_col]

    def _typed_empty(cands):
        csch = cands.schema()
        itype = (dict(zip(csch.names, csch.types)).get("a")
                 if csch else None)
        return rd.from_arrow(pa.table({
            "a": pa.array([], itype or pa.int64()),
            "b": pa.array([], itype or pa.int64()),
            "payload_a": pa.array([], ptype),
            payload_col: pa.array([], ptype),
        }))

    payload = payload_ds.map_batches(
        lambda b: pa.table({id_col: b[id_col], payload_col: b[payload_col]}),
        batch_format="pyarrow")
    cands = pairs_ds.materialize()
    if cands.count() == 0:
        return _typed_empty(cands)
    j1 = drop_empty_blocks(cands).join(
        payload, join_type="inner", num_partitions=num_partitions,
        on=("a",), right_on=(id_col,))
    j1 = j1.map_batches(
        lambda b: pa.table({"a": b["a"], "b": b["b"],
                            "payload_a": b[payload_col]}),
        batch_format="pyarrow").materialize()
    if j1.count() == 0:  # inner join may drop every pair
        return _typed_empty(cands)
    return drop_empty_blocks(j1).join(
        payload, join_type="inner", num_partitions=num_partitions,
        on=("b",), right_on=(id_col,))


def distinct_pairs(pairs_ds, *, num_partitions: int = 16,
                   cols: tuple = ("a", "b")):
    """Scale-safe pair distinct: ONE int-keyed hash shuffle (partition =
    hash(a,b) % P) + per-partition Arrow distinct — no single-block funnel,
    parallelism bounded by ``num_partitions``."""

    def _add_part(b: pa.Table) -> pa.Table:
        import zlib

        a = b[cols[0]].to_pylist()
        bb = b[cols[1]].to_pylist()
        part = np.fromiter(
            (zlib.crc32(f"{x}\x00{y}".encode()) % num_partitions
             for x, y in zip(a, bb)), dtype=np.int32, count=len(a))
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
    return parted.groupby("__part").map_groups(_distinct,
                                               batch_format="pyarrow")


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
        ids = b[id_col].to_pylist()
        sigs = b["minhash"].to_pylist()
        out_band, out_hash, out_id = [], [], []
        for i, sig in enumerate(sigs):
            r = len(sig) // bands
            sa = np.asarray(sig, dtype=np.uint64)
            for bi in range(bands):
                h = hashlib.blake2b(sa[bi * r: (bi + 1) * r].tobytes(),
                                    digest_size=8).hexdigest()
                out_band.append(bi)
                out_hash.append(h)
                out_id.append(ids[i])
        return pa.table({
            "band": pa.array(out_band, pa.int32()),
            "band_hash": pa.array(out_hash, pa.string()),
            id_col: pa.array(out_id),
        })

    banded = sig_ds.map_batches(_bands, batch_format="pyarrow")

    def _pairs(g: pa.Table) -> pa.Table:
        import logging

        a, b = _emit_bucket_pairs(
            g[id_col].to_pylist(), max_bucket,
            log_fn=lambda n: logging.getLogger(__name__).warning(
                "lsh bucket truncated: %d ids > max_bucket=%d (band %s)",
                n, max_bucket, g["band"][0].as_py()))
        t = g[id_col].type
        return pa.table({"a": pa.array(a, t), "b": pa.array(b, t)})

    pairs = banded.groupby(["band", "band_hash"]).map_groups(
        _pairs, batch_format="pyarrow")
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

    class _Verify:
        def __init__(self):
            self.cache: dict = {}

        def _sh(self, key, text):
            v = self.cache.get(key)
            if v is None:
                if len(self.cache) > 200_000:
                    self.cache.clear()
                v = word_shingles(text, shingle_w)
                self.cache[key] = v
            return v

        def __call__(self, b: pa.Table) -> pa.Table:
            a_ids = b["a"].to_pylist()
            b_ids = b["b"].to_pylist()
            ta = b["payload_a"].to_pylist()
            tb = b[text_col].to_pylist()
            js = [jaccard(self._sh(x, xt), self._sh(y, yt))
                  for x, xt, y, yt in zip(a_ids, ta, b_ids, tb)]
            out = pa.table({"a": b["a"], "b": b["b"],
                            "jaccard": pa.array(js, pa.float64())})
            return out.filter(pc.greater_equal(out["jaccard"], threshold))

    return j2.map_batches(_Verify, batch_format="pyarrow",
                          concurrency=(1, 8))


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
                  id_col: str = "doc_id") -> pa.Table:
    shifts = np.arange(64, dtype=np.uint64)
    out = []
    for t in batch[text_col].to_pylist():
        toks = t.split()
        if not toks:
            out.append(0)
            continue
        hs = np.fromiter((_stable_u64(tok.encode()) for tok in toks),
                         dtype=np.uint64, count=len(toks))
        bits = ((hs[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
        acc = (2 * bits - 1).sum(axis=0)  # +1 per set bit, -1 per clear bit
        sig = int(((acc > 0).astype(np.uint64) << shifts).sum(dtype=np.uint64))
        out.append(sig)
    return pa.table({
        id_col: batch[id_col],
        "simhash": pa.array(np.array(out, dtype=np.uint64).view(np.int64)),
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

    def _pairs(g: pa.Table) -> pa.Table:
        import logging

        a, b = _emit_bucket_pairs(
            g[id_col].to_pylist(), max_bucket,
            log_fn=lambda k: logging.getLogger(__name__).warning(
                "simhash bucket truncated: %d ids > max_bucket=%d",
                k, max_bucket))
        t = g[id_col].type
        return pa.table({"a": pa.array(a, t), "b": pa.array(b, t)})

    cands = distinct_pairs(
        banded.groupby(["band", "key"]).map_groups(_pairs,
                                                   batch_format="pyarrow"),
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
