"""Common-Crawl-style page corpus (BASELINE.json input_hint schema).

Schema: ``(url: string, warc_ts: timestamp[us], html: binary, text: string,
lang: string)``.

Pages are synthesized DETERMINISTICALLY from the driver's ``documents``
table (TESTDATA.md): each document becomes ``snapshots`` crawl snapshots of
the same url at a fixed per-domain cadence. Every derived column is a pure
function of ``(doc_id, source, text, lang, k)``, so a DuckDB oracle can
reproduce the corpus exactly from the same parquet (see
``__ray_entry__.oracle_sql``):

- ``domain  = source || '.example.com'``
- ``url     = 'https://' || domain || '/doc/' || doc_id``
- ``warc_ts = TIMESTAMP '2025-01-01' + (doc_id*37 + k*971) seconds``
- ``html    = HTML_PREFIX || text || HTML_SUFFIX`` (fixed-length wrapper so
  extraction is an exact inverse — the byte-identical-text invariant)

At bench scale ``snapshots`` is raised to amplify the corpus
deterministically (same generator, more rows per doc); hot-domain skew can
be injected via ``hot_domain_factor`` which gives domain src0 extra
snapshots (Zipf-ish head, exercises salting).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

HTML_PREFIX = b'<html><head><meta charset="utf-8"></head><body>'
HTML_SUFFIX = b"</body></html>"
BASE_EPOCH_S = 1735689600  # 2025-01-01T00:00:00Z
DOC_CADENCE_S = 37  # seconds between consecutive doc_ids' first crawl
SNAPSHOT_CADENCE_S = 971  # seconds between snapshots of one url

__all__ = [
    "HTML_PREFIX", "HTML_SUFFIX", "BASE_EPOCH_S",
    "DOC_CADENCE_S", "SNAPSHOT_CADENCE_S",
    "read_pages", "expand_documents_to_pages",
]


def expand_documents_to_pages(batch: pa.Table, *, snapshots: int = 3,
                              hot_domain_factor: int = 1) -> pa.Table:
    """documents rows -> pages rows (vectorized Arrow; one input row ->
    ``snapshots`` output rows, ``snapshots*hot_domain_factor`` for src0)."""
    n = batch.num_rows
    doc_id = batch["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
    source = batch["source"]
    if isinstance(source, pa.ChunkedArray):
        source = source.combine_chunks()

    per_row = np.full(n, snapshots, dtype=np.int64)
    if hot_domain_factor > 1:
        hot = pc.equal(source, "src0").to_numpy(zero_copy_only=False)
        per_row[hot] = snapshots * hot_domain_factor
    row_idx = np.repeat(np.arange(n), per_row)
    k = np.concatenate([np.arange(c) for c in per_row]) if n else np.empty(0, np.int64)

    rep = batch.take(pa.array(row_idx))
    doc_rep = doc_id[row_idx]
    ts_us = (BASE_EPOCH_S + doc_rep * DOC_CADENCE_S + k * SNAPSHOT_CADENCE_S) * 1_000_000
    warc_ts = pa.array(ts_us, type=pa.int64()).cast(pa.timestamp("us"))

    src_rep = rep["source"]
    if isinstance(src_rep, pa.ChunkedArray):
        src_rep = src_rep.combine_chunks()
    doc_str = pc.cast(pa.array(doc_rep), pa.string())
    domain = pc.binary_join_element_wise(src_rep, ".example.com", "")
    url = pc.binary_join_element_wise("https://", domain, "/doc/", doc_str, "")

    text = rep["text"]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    html = pc.binary_join_element_wise(
        pa.scalar(HTML_PREFIX, type=pa.binary()),
        text.cast(pa.binary()),
        pa.scalar(HTML_SUFFIX, type=pa.binary()),
        pa.scalar(b"", type=pa.binary()),
    )

    return pa.table(
        {
            "url": url,
            "warc_ts": warc_ts,
            "html": html,
            "text": text,
            "lang": rep["lang"],
        }
    )


def read_pages(sf_dir: str, *, snapshots: int = 3, hot_domain_factor: int = 1,
               columns: list | None = None):
    """Dataset of synthetic pages derived from ``{sf_dir}/documents.parquet``.

    ``columns`` prunes the OUTPUT page columns; the read itself only loads
    the document columns actually needed (prune-at-the-read).
    """
    import ray.data as rd

    need = {"doc_id", "source"}
    out_cols = columns or ["url", "warc_ts", "html", "text", "lang"]
    if "text" in out_cols or "html" in out_cols:
        need.add("text")
    if "lang" in out_cols:
        need.add("lang")
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=sorted(need))

    def _expand(batch: pa.Table) -> pa.Table:
        if "text" not in batch.column_names:  # html/text pruned at the read
            batch = batch.append_column("text", pa.array([""] * batch.num_rows))
        if "lang" not in batch.column_names:
            batch = batch.append_column("lang", pa.array([""] * batch.num_rows))
        out = expand_documents_to_pages(
            batch, snapshots=snapshots, hot_domain_factor=hot_domain_factor
        )
        return out.select(out_cols)

    return ds.map_batches(_expand, batch_format="pyarrow")
