"""Archive ingestion formats: gzip-compressed text columns and WARC
(ISO 28500) record extraction — the containers web-scale text corpora
actually arrive in (Common-Crawl WET/WARC files are gzipped WARC).

Both are REAL decoders built on the stdlib:

- ``gunzip_batch`` inflates a binary column with ``zlib`` (gzip/zlib/raw
  autodetected via wbits=47). Per-payload C inflate — the per-row Python
  is one call per document, inherent to per-record codecs (same status
  as the md5 digests in dedup).
- ``parse_warc`` walks a WARC file's records via each record's
  ``Content-Length`` header (the spec's framing — no payload guessing),
  returning (type, uri, payload) per record; ``WarcRecordExtractor`` is
  the Dataset stage: archive blobs in, one row per contained record out
  (a flat_map realized as ``map_batches`` so record rows stay batched).

Scale shape: pure map-side; an archive blob expands into its records
inside one task, so block sizes should budget for the expansion factor
(callers pass smaller ``batch_size`` for fat archives — same contract as
the multimodal stages).
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

__all__ = ["gzip_bytes", "gunzip_bytes", "gunzip_batch",
           "build_warc", "parse_warc", "WarcRecordExtractor"]


def gzip_bytes(data: bytes, level: int = 6) -> bytes:
    """gzip-container compression (wbits=31): stdlib zlib."""
    c = zlib.compressobj(level, zlib.DEFLATED, 31)
    return c.compress(data) + c.flush()


def gunzip_bytes(payload: bytes) -> bytes:
    """Inflate gzip/zlib/raw-deflate (wbits=47 autodetects the header)."""
    return zlib.decompress(payload, 47)


def gunzip_batch(batch: pa.Table, *, payload_col: str = "payload",
                 out_col: str = "text") -> pa.Table:
    """binary gzip column -> utf-8 text column (payload column dropped)."""
    out = [gunzip_bytes(p).decode() for p in batch[payload_col]
           .to_pylist()]
    t = batch.drop_columns([payload_col])
    return t.append_column(out_col, pa.array(out, pa.string()))


_CRLF = b"\r\n"


def build_warc(records) -> bytes:
    """(uri, payload-bytes) pairs -> one WARC/1.0 file (response records,
    Content-Length framing per ISO 28500). Fixture/writer helper."""
    out = []
    for uri, payload in records:
        hdr = (b"WARC/1.0\r\n"
               b"WARC-Type: response\r\n"
               b"WARC-Target-URI: " + uri.encode() + _CRLF +
               b"Content-Length: " + str(len(payload)).encode() + _CRLF +
               _CRLF)
        out.append(hdr + payload + _CRLF + _CRLF)
    return b"".join(out)


def parse_warc(payload: bytes):
    """WARC file bytes -> list of (warc_type, uri, record_payload),
    framed by each record's Content-Length (never by scanning payload
    bytes for separators — payloads may contain anything)."""
    recs = []
    pos = 0
    n = len(payload)
    while pos < n:
        if payload[pos:pos + 5] != b"WARC/":
            raise ValueError(f"bad WARC record header at byte {pos}")
        hdr_end = payload.index(b"\r\n\r\n", pos)
        headers = {}
        for line in payload[pos:hdr_end].split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower()] = v.strip()
        length = int(headers[b"content-length"])
        body_start = hdr_end + 4
        recs.append((
            headers.get(b"warc-type", b"").decode(),
            headers.get(b"warc-target-uri", b"").decode(),
            payload[body_start:body_start + length],
        ))
        pos = body_start + length + 4  # record payload + \r\n\r\n
    return recs


class WarcRecordExtractor:
    """Archive blobs -> one row per contained WARC record
    (archive_id, warc_type, uri, record payload). Stateless map stage;
    use small batch_size for fat archives (expansion happens in-task)."""

    def __init__(self, payload_col: str = "payload",
                 id_col: str = "archive_id"):
        self.payload_col = payload_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, types, uris, payloads = [], [], [], []
        arch_ids = batch[self.id_col].to_pylist()
        for aid, blob in zip(arch_ids, batch[self.payload_col].to_pylist()):
            for wtype, uri, body in parse_warc(blob):
                ids.append(aid)
                types.append(wtype)
                uris.append(uri)
                payloads.append(body)
        return pa.table({
            self.id_col: pa.array(ids,
                                  batch[self.id_col].type),
            "warc_type": pa.array(types, pa.string()),
            "uri": pa.array(uris, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
        })
