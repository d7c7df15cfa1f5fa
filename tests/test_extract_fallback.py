"""Extraction fallback: non-template html goes through the compiled-regex
row-wise path and still recovers the body."""

import pyarrow as pa

from tsdownsample_ray.stages.extract import HtmlTextExtractor


def test_template_fast_path():
    from tsdownsample_ray.sources.corpus import HTML_PREFIX, HTML_SUFFIX

    html = HTML_PREFIX + b"hello world" + HTML_SUFFIX
    t = pa.table({"html": pa.array([html], pa.binary()), "url": ["u"]})
    out = HtmlTextExtractor()(t)
    assert out["extracted_text"][0].as_py() == "hello world"
    assert "html" not in out.column_names  # wide binary dropped immediately


def test_regex_fallback_messy_html():
    rows = [
        b'<html><head><title>t</title></head><body class="x">real body</body></html>',
        b"<HTML><body>\nmulti\nline\n</body></html>",
        b"no body tag at all",
    ]
    t = pa.table({"html": pa.array(rows, pa.binary()), "url": ["a", "b", "c"]})
    out = HtmlTextExtractor()(t)["extracted_text"].to_pylist()
    assert out[0] == "real body"
    assert out[1] == "\nmulti\nline\n"
    assert out[2] == ""


def test_mixed_batch_uses_fallback():
    from tsdownsample_ray.sources.corpus import HTML_PREFIX, HTML_SUFFIX

    rows = [
        HTML_PREFIX + b"templated" + HTML_SUFFIX,
        b"<html><body>custom</body></html>",
    ]
    t = pa.table({"html": pa.array(rows, pa.binary())})
    out = HtmlTextExtractor()(t)["extracted_text"].to_pylist()
    assert out == ["templated", "custom"]
