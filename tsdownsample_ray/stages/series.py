"""Per-domain time-series derivation from pages.

pages ``(url, warc_ts, text, ...)`` -> long-format series rows
``(series_id, x, y)`` where ``series_id`` = the url's domain, ``x`` =
``warc_ts`` as int64 epoch-microseconds, and ``y`` = page length in
characters (the page-length series; the crawl-rate series is the per-bucket
COUNT produced by the rollup stage over these same rows).

Stateless, fully vectorized (one regex-extract + one utf8_length per
batch); no shuffle — the shuffle happens at the downstream rollup groupby
keyed on ``(series_id, bucket)``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["derive_series_batch", "derive_series"]

_DOMAIN_PATTERN = r"^https?://(?P<domain>[^/]+)"


def derive_series_batch(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    url = batch["url"]
    if isinstance(url, pa.ChunkedArray):
        url = url.combine_chunks()
    domain = pc.struct_field(pc.extract_regex(url, _DOMAIN_PATTERN), "domain")
    x = batch["warc_ts"].cast(pa.int64())  # epoch microseconds
    y = pc.utf8_length(batch[text_col])  # characters, == DuckDB length()
    return pa.table({"series_id": domain, "x": x, "y": pc.cast(y, pa.int64())})


def derive_series(pages_ds, *, text_col: str = "text"):
    return pages_ds.map_batches(
        lambda b: derive_series_batch(b, text_col=text_col), batch_format="pyarrow"
    )
