"""KWIC concordance (stages/textstats.py:kwic): scalar-slice window
assembly vs a Python replay; edge positions, non-ASCII context,
multiple occurrences (first wins), null text."""

import pyarrow as pa
import pytest

from tsdownsample_ray.stages.textstats import kwic

ray = pytest.importorskip("ray")
import ray.data as rd  # noqa: E402


def _brute(docs, term, ctx):
    out = {}
    for i, t in docs:
        if t is None or term not in t:
            continue
        p = t.index(term)
        out[i] = (p + 1, t[max(p - ctx, 0):p] + term
                  + t[p + len(term):p + len(term) + ctx])
    return out


def test_kwic_matches_replay(ray_session):
    docs = [
        (0, "hello data world"),
        (1, "data at the very start"),
        (2, "ends with data"),
        (3, "no match here"),
        (4, "data data twice data"),          # first occurrence only
        (5, "éé unicode context data ññ tail"),
        (6, None),
        (7, "d"),
    ]
    exp = _brute(docs, "data", 6)
    t = pa.table({"doc_id": [d[0] for d in docs],
                  "text": pa.array([d[1] for d in docs], pa.string())})
    got = kwic(rd.from_arrow(t).repartition(3), term="data",
               ctx=6).to_pandas()
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        assert (r["char_pos"], r["snippet"]) == exp[r["doc_id"]], \
            r["doc_id"]


def test_kwic_empty_term_rejected(ray_session):
    t = pa.table({"doc_id": [1], "text": ["x"]})
    with pytest.raises(ValueError):
        kwic(rd.from_arrow(t), term="", ctx=3)
