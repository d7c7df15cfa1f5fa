"""Inverted-index build (stages/postings.py) vs a Python replay,
including cross-block (token, doc) merging and the max_df cap."""

import pyarrow as pa
import pytest

from tsdownsample_ray.stages.postings import build_postings

ray = pytest.importorskip("ray")
import ray.data as rd  # noqa: E402


DOCS = {
    1: "a b a c",
    2: "b b d",
    3: "a d d e",
    4: "e",
}


def _brute(docs):
    inv = {}
    for d, text in docs.items():
        for w in text.split(" "):
            if w:
                inv.setdefault(w, {}).setdefault(d, 0)
                inv[w][d] += 1
    return {t: (len(m), sum(m.values()),
                ",".join(str(d) for d in sorted(m)))
            for t, m in inv.items()}


@pytest.mark.parametrize("nparts", [1, 3])
def test_postings_matches(ray_session, nparts):
    t = pa.table({"doc_id": list(DOCS), "text": list(DOCS.values())})
    ds = rd.from_arrow(t).repartition(nparts)
    out = build_postings(ds, num_partitions=2).to_pandas()
    exp = _brute(DOCS)
    assert len(out) == len(exp)
    for _, r in out.iterrows():
        assert exp[r["token"]] == (r["df"], r["tf_total"], r["posting"])


def test_postings_max_df(ray_session):
    t = pa.table({"doc_id": list(DOCS), "text": list(DOCS.values())})
    out = build_postings(rd.from_arrow(t), num_partitions=2,
                         max_df=2).to_pandas()
    exp = {k: v for k, v in _brute(DOCS).items() if v[0] <= 2}
    assert set(out["token"]) == set(exp)
