"""Round-5 session-3 wave, part 2: RLE codec stats (the run-length
member of the codec family), near-dup cluster SURVIVOR selection (the
canonical-document policy step every dedup pipeline needs after
clustering), and per-document n-gram novelty (the per-doc sibling of
the corpus-level Heaps'-law curve).

Catalog contract as everywhere: Ray-Data-first shapes documented in
place, integer-exact arithmetic, column names matched to the DuckDB
oracles.
"""
from __future__ import annotations

import numpy as np

from ._shared import _read_parquet_clean, pa, pc

_PACK_LEN = 1 << 20          # n_chars upper bound for the survivor pack
_PACK_ID = 1 << 40           # doc_id radix in the packed argmin


def q_rle_roundtrip_events(sf_dir: str):
    """Run-length encoding stats per event-type series over
    dollar-decile-quantized cents (``cents // 1000``; cents are
    strictly positive in this corpus so truncation == floor ==
    SQL ``//``): per series ``(n_points, n_runs, max_run,
    head_checksum)`` with the position-sensitive checksum
    ``sum(run_value * run_index)``. The stage re-expands every run
    (``np.repeat``) and asserts byte-equality with the sorted input —
    the same roundtrip discipline as the gorilla/FOR/varint codecs."""
    from .downsample_core import _events_cents
    from ...stages.compress import rle_stats_per_series

    ev = _events_cents(sf_dir)

    def _series(b: pa.Table) -> pa.Table:
        return pa.table({
            "series_id": b["event_type"], "x": b["ts_us"],
            "event_id": b["event_id"],
            "y": pc.divide(b["cents"], pa.scalar(1000, pa.int64())),
        })

    ds = ev.map_batches(_series, batch_format="pyarrow")
    return rle_stats_per_series(ds, tiebreak_col="event_id",
                                num_partitions=2)


RLE_SQL = """
WITH e AS (
    SELECT event_type AS series_id, epoch_us(ts) AS t, event_id,
           CAST(round(value * 100) AS BIGINT) // 1000 AS q
    FROM events
),
r AS (
    SELECT series_id, t, event_id, q,
           CASE WHEN lag(q) OVER w IS DISTINCT FROM q THEN 1 ELSE 0 END
               AS brk
    FROM e WINDOW w AS (PARTITION BY series_id ORDER BY t, event_id)
),
ri AS (
    SELECT series_id, q,
           sum(brk) OVER (PARTITION BY series_id ORDER BY t, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT
                          ROW) AS run_idx
    FROM r
),
runs AS (
    SELECT series_id, run_idx, min(q) AS run_val,
           count(*) AS run_len
    FROM ri GROUP BY 1, 2
)
SELECT series_id,
       CAST(sum(run_len) AS BIGINT) AS n_points,
       CAST(count(*) AS BIGINT) AS n_runs,
       CAST(max(run_len) AS BIGINT) AS max_run,
       CAST(sum(run_val * run_idx) AS BIGINT) AS head_checksum
FROM runs GROUP BY 1
"""


def q_canonical_docs(sf_dir: str):
    """Near-dup cluster SURVIVOR selection — the canonicalization step
    after duplicate clustering: exact char-5-gram Jaccard pairs at
    t=0.5 (lossless prefix filter, ``stages/dedup.py:
    ngram_jaccard_pairs``) -> min-label connected components
    (``stages/components.py``) -> per cluster keep the LONGEST doc,
    ties to the smallest doc_id. The survivor policy is ONE packed
    grouped argmin — ``min((maxlen - n_chars) * 2^40 + doc_id)`` — so
    no per-cluster sort or join-back happens; cluster size rides the
    same reduction. Output: (component, survivor_doc_id,
    survivor_n_chars, cluster_size) for every multi-doc component."""
    from ...stages.components import connected_components
    from ...stages.dedup import ngram_jaccard_pairs
    from ...stages.joins import hash_inner_join
    from ...stages.rollup import grouped_min_parts

    docs = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "n_chars"])
    pairs = ngram_jaccard_pairs(
        docs.map_batches(lambda b: b.select(["doc_id", "text"]),
                         batch_format="pyarrow"),
        id_col="doc_id", text_col="text", n=5, threshold=0.5,
        num_partitions=4)
    edges = pairs.map_batches(lambda b: b.select(["a", "b"]),
                              batch_format="pyarrow")
    labels = connected_components(edges, a_col="a", b_col="b",
                                  num_partitions=4)

    def _lab(b: pa.Table) -> pa.Table:
        return pa.table({"doc_id": b["node"].cast(pa.int64()),
                         "component": b["component"].cast(pa.int64())})

    lengths = docs.map_batches(
        lambda b: b.select(["doc_id", "n_chars"]), batch_format="pyarrow")
    j = hash_inner_join(labels.map_batches(_lab, batch_format="pyarrow"),
                        lengths, on="doc_id", num_partitions=4)

    def _pack(b: pa.Table) -> pa.Table:
        nch = b["n_chars"]
        mx = pc.max(nch).as_py()
        if mx is not None and mx >= _PACK_LEN:
            raise ValueError(f"n_chars {mx} overflows the survivor pack")
        mid = pc.max(b["doc_id"]).as_py()
        if mid is not None and mid >= _PACK_ID:
            raise ValueError(f"doc_id {mid} overflows the survivor pack")
        packed = pc.add(
            pc.multiply(pc.subtract(pa.scalar(_PACK_LEN, pa.int64()), nch),
                        pa.scalar(_PACK_ID, pa.int64())), b["doc_id"])
        ones = pa.array(np.ones(b.num_rows, np.int64))
        return pa.table({"component": b["component"], "packed": packed,
                         "one": ones})

    packed = j.map_batches(_pack, batch_format="pyarrow").materialize()
    # materialized: consumed by BOTH the argmin and the size count —
    # unmaterialized, the docs read + labels join would execute twice
    mins = grouped_min_parts(packed, ["component"], ["packed"], fanin=4)

    from ...stages.graph import grouped_sum_parts

    sizes = grouped_sum_parts(
        packed.map_batches(lambda b: b.select(["component", "one"]),
                           batch_format="pyarrow"),
        ["component"], ["one"], count_col=None, fanin=4)

    def _sz(b: pa.Table) -> pa.Table:
        return b.rename_columns(["component", "cluster_size"])

    out = hash_inner_join(mins, sizes.map_batches(_sz,
                                                  batch_format="pyarrow"),
                          on="component", num_partitions=4)

    def _unpack(b: pa.Table) -> pa.Table:
        hi = pc.divide(b["packed"], pa.scalar(_PACK_ID, pa.int64()))
        doc = pc.subtract(b["packed"],
                          pc.multiply(hi, pa.scalar(_PACK_ID, pa.int64())))
        return pa.table({
            "component": b["component"],
            "survivor_doc_id": doc,
            "survivor_n_chars": pc.subtract(
                pa.scalar(_PACK_LEN, pa.int64()), hi),
            "cluster_size": b["cluster_size"]})

    return out.map_batches(_unpack, batch_format="pyarrow")


CANONICAL_DOCS_SQL = f"""
WITH RECURSIVE g AS MATERIALIZED (
    SELECT doc_id, unnest(list_distinct(list_transform(
               range(1, length(text) - 3),
               i -> substring(text, i, 5)))) AS gram
    FROM documents
),
sz AS MATERIALIZED (
    SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id
),
inter AS MATERIALIZED (
    SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS n_inter
    FROM g x JOIN g y ON x.gram = y.gram AND x.doc_id < y.doc_id
    GROUP BY x.doc_id, y.doc_id
),
pr AS (
    SELECT i.a, i.b FROM inter i
    JOIN sz sa ON sa.doc_id = i.a JOIN sz sb ON sb.doc_id = i.b
    WHERE CAST(i.n_inter AS DOUBLE) >= 0.5 * (sa.n + sb.n - i.n_inter)
),
ed AS (SELECT a AS src, b AS dst FROM pr
       UNION ALL SELECT b, a FROM pr),
reach(node, lbl) AS (
    SELECT DISTINCT src, src FROM ed
    UNION
    SELECT ed.dst, r.lbl FROM reach r JOIN ed ON ed.src = r.node
),
comp AS (SELECT node, min(lbl) AS component FROM reach GROUP BY node),
m AS (
    SELECT component,
           min(({_PACK_LEN} - n_chars) * {_PACK_ID} + node) AS mp,
           CAST(count(*) AS BIGINT) AS cluster_size
    FROM comp JOIN documents ON node = doc_id GROUP BY 1
)
SELECT component, CAST(mp % {_PACK_ID} AS BIGINT) AS survivor_doc_id,
       CAST({_PACK_LEN} - mp // {_PACK_ID} AS BIGINT)
           AS survivor_n_chars,
       cluster_size
FROM m
"""


def q_novelty_docs(sf_dir: str):
    """Per-document n-gram NOVELTY — of each doc's distinct char-5-
    grams, how many appear in NO earlier doc (doc_id order): the
    per-doc sibling of the corpus-level Heaps' curve, and the score a
    curation pipeline uses to drop late boilerplate-heavy crawls.
    Shape: one (gram int64, doc_id) emission over the lossless packed
    gram codes, a hashpart grouped-min per gram for the first-seeing
    doc, then BOTH per-doc totals and novelty counts meet in one
    union + grouped-sum — no doc-keyed join, and nothing driver-side.
    Docs whose grams all appeared earlier surface with n_novel = 0
    through the union's zero rows."""
    from ...stages.dedup import char_ngram_codes
    from ...stages.graph import grouped_sum_parts
    from ...stages.rollup import grouped_min_parts

    docs = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"]).repartition(8)

    def _emit(b: pa.Table) -> pa.Table:
        texts = b["text"].to_pylist()
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sets = char_ngram_codes(texts, 5)
        lens = np.fromiter((len(s) for s in sets), np.int64, len(sets))
        grams = (np.concatenate(sets) if len(sets) else
                 np.empty(0, np.uint64)).astype(np.int64)
        return pa.table({"gram": pa.array(grams),
                         "doc_id": pa.array(np.repeat(ids, lens))})

    emitted = docs.map_batches(_emit, batch_format="pyarrow")
    firsts = grouped_min_parts(emitted, ["gram"], ["doc_id"], fanin=4)

    def _tot(b: pa.Table) -> pa.Table:
        # per-block per-doc gram totals (docs never split: one row in)
        g = b.group_by(["doc_id"]).aggregate([("gram", "count")])
        n = g["gram_count"].cast(pa.int64())
        return pa.table({"doc_id": g["doc_id"], "n_grams": n,
                         "n_novel": pa.nulls(len(n), pa.int64()).fill_null(
                             0)})

    def _nov(b: pa.Table) -> pa.Table:
        g = b.group_by(["doc_id"]).aggregate([("gram", "count")])
        n = g["gram_count"].cast(pa.int64())
        return pa.table({"doc_id": g["doc_id"],
                         "n_grams": pa.nulls(len(n), pa.int64()).fill_null(
                             0),
                         "n_novel": n})

    both = emitted.map_batches(_tot, batch_format="pyarrow").union(
        firsts.map_batches(_nov, batch_format="pyarrow"))
    return grouped_sum_parts(both, ["doc_id"], ["n_grams", "n_novel"],
                             count_col=None, fanin=4)


NOVELTY_SQL = """
WITH g AS MATERIALIZED (
    SELECT doc_id, unnest(list_distinct(list_transform(
               range(1, length(text) - 3),
               i -> substring(text, i, 5)))) AS gram
    FROM documents
),
f AS (SELECT gram, min(doc_id) AS first_doc FROM g GROUP BY 1),
tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams
        FROM g GROUP BY 1),
nov AS (SELECT first_doc AS doc_id, CAST(count(*) AS BIGINT) AS n_novel
        FROM f GROUP BY 1)
SELECT tot.doc_id, n_grams,
       CAST(coalesce(n_novel, 0) AS BIGINT) AS n_novel
FROM tot LEFT JOIN nov ON tot.doc_id = nov.doc_id
"""
