"""Chunking and sequence packing: window math edge cases, the
distributed prefix sum vs a pandas oracle, partition invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from tsdownsample_ray.stages.packing import chunk_documents, pack_sequences


@pytest.fixture
def rd(ray_session):
    import ray.data as rd

    return rd


def test_chunk_documents_windows(rd):
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            " ".join(f"t{i}" for i in range(10)),   # 10 toks: chunks @0,5
            " ".join(f"u{i}" for i in range(4)),    # 4 toks (< chunk)
            " ".join(f"v{i}" for i in range(13)),   # 13 toks: chunks @0,5,10
        ]),
    })
    out = chunk_documents(rd.from_arrow(t), chunk_tokens=8,
                          overlap=3).to_pandas()
    out = out.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    by = out.groupby("doc_id")
    assert list(by.size()) == [2, 1, 2]
    d3 = out[out["doc_id"] == 3]
    assert list(d3["chunk_text"]) == [
        " ".join(f"v{i}" for i in range(8)),
        " ".join(f"v{i}" for i in range(5, 13)),
    ]
    assert list(d3["n_chunk_tokens"]) == [8, 8]
    # overlap: last 3 tokens of chunk 0 == first 3 of chunk 1
    c0, c1 = d3["chunk_text"].tolist()
    assert c0.split(" ")[-3:] == c1.split(" ")[:3]
    with pytest.raises(ValueError):
        chunk_documents(rd.from_arrow(t), chunk_tokens=5, overlap=5)


def test_chunk_exact_multiple_no_empty_tail(rd):
    """n == chunk + k*stride exactly: the last chunk is full, no empty
    trailing chunk is emitted."""
    t = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "text": pa.array([" ".join("x" * 1 for _ in range(11))])})
    # chunk 5, stride 3: tokens 11 -> chunks @0,3,6 (last covers 6..10)
    out = chunk_documents(rd.from_arrow(t), chunk_tokens=5,
                          overlap=2).to_pandas()
    assert len(out) == 3
    assert out["n_chunk_tokens"].tolist() == [5, 5, 5]


def test_pack_sequences_vs_pandas(rd):
    rng = np.random.default_rng(3)
    n = 700
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype="int64"),
        "n_tokens": rng.integers(1, 200, size=n).astype("int64"),
    })
    out = pack_sequences(rd.from_pandas(df).repartition(9), 500,
                         bucket_size=37, num_partitions=4).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    start = np.concatenate([[0], np.cumsum(df["n_tokens"])[:-1]])
    assert (out["token_start"].to_numpy() == start).all()
    assert (out["first_pack"].to_numpy() == start // 500).all()
    assert (out["last_pack"].to_numpy()
            == (start + df["n_tokens"].to_numpy() - 1) // 500).all()
    # packing is partition-invariant
    out2 = pack_sequences(rd.from_pandas(df).repartition(2), 500,
                          bucket_size=37, num_partitions=4).to_pandas()
    out2 = out2.sort_values("doc_id").reset_index(drop=True)
    assert (out2["token_start"].to_numpy()
            == out["token_start"].to_numpy()).all()
