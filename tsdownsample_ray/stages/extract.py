"""HTML -> text extraction stage.

The engine's per-row invariant (BASELINE.json input_hint): extracted text
must be BYTE-IDENTICAL per url to the corpus ground truth. The synthetic
corpus wraps text in a fixed-length wrapper (``sources/corpus.py``), so the
fast path is a fully vectorized ``pc.binary_slice``; a compiled-regex
fallback handles arbitrary ``<body>...</body>`` payloads row-wise.

Shaped as a callable class for ``map_batches(HtmlTextExtractor,
concurrency=N)`` — the stage is where a real pipeline would hold a parser /
boilerplate model, so it is an actor pool with one-time ``__init__`` setup.
Drops ``html`` from the output immediately: wide binary columns must not
travel further than necessary (SURVEY.md §7.4).
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

from ..sources.corpus import HTML_PREFIX, HTML_SUFFIX

__all__ = ["HtmlTextExtractor", "extract_text_batch"]


class HtmlTextExtractor:
    def __init__(self):
        # one-time setup per actor (pattern compile stands in for parser init)
        self._body_re = re.compile(rb"<body[^>]*>([\s\S]*)</body>")
        self._prefix = HTML_PREFIX
        self._suffix = HTML_SUFFIX

    def __call__(self, batch: pa.Table) -> pa.Table:
        html = batch["html"]
        if isinstance(html, pa.ChunkedArray):
            html = html.combine_chunks()

        starts = pc.binary_slice(html, 0, len(self._prefix))
        template = pc.all(pc.equal(starts, self._prefix)).as_py()
        if template:
            text = pc.binary_slice(html, len(self._prefix), -len(self._suffix))
            text = text.cast(pa.string())
        else:  # row-wise fallback for non-template html
            out = []
            for v in html:
                m = self._body_re.search(v.as_py())
                out.append(m.group(1).decode("utf-8", "replace") if m else "")
            text = pa.array(out, type=pa.string())

        cols = {name: batch[name] for name in batch.column_names if name != "html"}
        cols["extracted_text"] = text
        return pa.table(cols)


def extract_text_batch(batch: pa.Table) -> pa.Table:
    """Stateless function form (template fast path only) for small pipelines."""
    return HtmlTextExtractor()(batch)
