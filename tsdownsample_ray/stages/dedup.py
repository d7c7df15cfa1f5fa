"""Deduplication operators for training-data pipelines: exact, MinHash+LSH,
SimHash, n-gram Jaccard, embedding-cosine near-dup.

All stages are deterministic (fixed hash parameters, no RNG at run time)
so results are reproducible and testable. Scale shapes:

- exact: content-hash in ``map_batches`` -> ``groupby(hash)`` keep-first
  (one shuffle on the hash — uniform by construction, no skew).
- MinHash+LSH: signatures per batch (vectorized) -> explode to
  ``(band_id, band_hash, doc)`` rows -> ``groupby(band)`` -> candidate
  pairs -> verify true Jaccard. The band groupby is the only wide op and
  its key space is huge (band hashes), so it shuffles evenly; verification
  joins text back via an explicit hash-partitioned join at real scale —
  here the small side is broadcast with ``ray.put``.
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
    "simhash_batch", "simhash_signatures",
    "word_shingles", "jaccard",
]

# Mersenne-31: (a*x + b) with a, x < 2^31 fits uint64 exactly, so the
# permutation arithmetic stays fully vectorized in native uint64.
_MERSENNE = (1 << 31) - 1


def _stable_u64(token: bytes) -> int:
    return int.from_bytes(hashlib.blake2b(token, digest_size=8).digest(), "big")


def word_shingles(text: str, w: int = 3, cache: dict | None = None) -> np.ndarray:
    """w-word shingle hashes (31-bit, uint64 dtype), deduplicated.

    ``cache`` (gram -> hash) amortizes the digest across repeated grams —
    an actor-held cache turns the per-gram blake2b into a dict hit for the
    common-vocabulary bulk of a corpus."""
    toks = text.split()
    if len(toks) < w:
        grams = [" ".join(toks)] if toks else []
    else:
        grams = [" ".join(toks[i : i + w]) for i in range(len(toks) - w + 1)]
    if cache is None:
        it = (_stable_u64(g.encode()) & _MERSENNE for g in grams)
    else:
        if len(cache) > 4_000_000:  # bound actor memory
            cache.clear()
        def _h(g):
            v = cache.get(g)
            if v is None:
                v = _stable_u64(g.encode()) & _MERSENNE
                cache[g] = v
            return v
        it = (_h(g) for g in grams)
    return np.unique(np.fromiter(it, dtype=np.uint64, count=len(grams)))


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


def lsh_candidate_pairs(sig_ds, *, bands: int = 16, id_col: str = "doc_id"):
    """signatures -> banded buckets -> unique candidate pairs (a < b)."""

    def _bands(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_pylist()
        sigs = b["minhash"].to_pylist()
        out_band, out_hash, out_id = [], [], []
        for i, sig in enumerate(sigs):
            r = len(sig) // bands
            for bi in range(bands):
                h = hashlib.blake2b(
                    np.asarray(sig[bi * r : (bi + 1) * r], dtype=np.uint64)
                    .tobytes(), digest_size=8).hexdigest()
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
        ids = sorted(g[id_col].to_pylist())
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
        return pa.table({"a": pa.array(a), "b": pa.array(b)})

    pairs = banded.groupby(["band", "band_hash"]).map_groups(
        _pairs, batch_format="pyarrow")

    # dedupe pairs produced by multiple bands. Candidate pairs are orders of
    # magnitude fewer than rows, so a coalesced Arrow distinct beats a second
    # sort-shuffle; pair_dedup="shuffle" remains for pathological candidate
    # explosions.
    def _distinct(b: pa.Table) -> pa.Table:
        return b.group_by(["a", "b"]).aggregate([]).rename_columns(["a", "b"])

    return pairs.repartition(1).map_batches(_distinct, batch_format="pyarrow")


def verify_jaccard_pairs(pairs_ds, texts_ref, *, shingle_w: int = 3,
                         threshold: float = 0.8):
    """Exact-Jaccard verification of candidate pairs. ``texts_ref`` is a
    ``ray.put`` handle of {id: text} (broadcast small side; at corpus scale
    replace with a hash-partitioned join on id)."""
    import ray

    class _Verify:
        def __init__(self):
            self.texts = ray.get(texts_ref)  # once per actor
            self.cache: dict = {}

        def _sh(self, i):
            if i not in self.cache:
                self.cache[i] = word_shingles(self.texts[i], shingle_w)
            return self.cache[i]

        def __call__(self, b: pa.Table) -> pa.Table:
            a_ids = b["a"].to_pylist()
            b_ids = b["b"].to_pylist()
            js = [jaccard(self._sh(x), self._sh(y))
                  for x, y in zip(a_ids, b_ids)]
            out = b.append_column("jaccard", pa.array(js, pa.float64()))
            return out.filter(pc.greater_equal(out["jaccard"], threshold))

    return pairs_ds.map_batches(_Verify, batch_format="pyarrow", concurrency=(1, 8))


def near_dup_pairs(ds, texts_ref, *, id_col: str = "doc_id",
                   num_perm: int = 128, bands: int = 16, shingle_w: int = 3,
                   threshold: float = 0.8):
    sigs = minhash_signatures(ds, num_perm=num_perm, shingle_w=shingle_w,
                              id_col=id_col)
    cands = lsh_candidate_pairs(sigs, bands=bands, id_col=id_col)
    return verify_jaccard_pairs(cands, texts_ref, shingle_w=shingle_w,
                                threshold=threshold)


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
