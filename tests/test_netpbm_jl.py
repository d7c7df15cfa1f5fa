"""netpbm codec roundtrip/grammar and the JL projection audit."""

import numpy as np
import pytest

from tsdownsample_ray.functions.netpbm import (decode_netpbm, encode_pgm,
                                               encode_ppm)


def test_ppm_roundtrip():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (13, 8, 3), dtype=np.uint8)
    assert np.array_equal(decode_netpbm(encode_ppm(img)), img)


def test_pgm_roundtrip():
    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, (5, 17), dtype=np.uint8)
    assert np.array_equal(decode_netpbm(encode_pgm(img)), img)


def test_netpbm_header_grammar():
    img = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    # multiple comments, tabs, CRLF, multi-space separators
    raster = img.tobytes()
    buf = b"P6 # c1\n\t#c2 again\r\n  4\t2 # trailing\n255\n" + raster
    assert np.array_equal(decode_netpbm(buf), img)


def test_netpbm_rejects_deep_and_truncated():
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    deep = encode_ppm(img).replace(b"255\n", b"65535\n")
    with pytest.raises(NotImplementedError):
        decode_netpbm(deep)
    with pytest.raises(ValueError):
        decode_netpbm(encode_ppm(img)[:-5])
    with pytest.raises(ValueError):
        decode_netpbm(b"P3\n1 1\n255\n0 0 0")  # ASCII variant: unsupported


def test_decode_image_dispatches_netpbm():
    import pyarrow as pa

    from tsdownsample_ray.stages.multimodal import DecodeImage

    img = np.random.default_rng(3).integers(0, 256, (4, 8, 3), np.uint8)
    batch = pa.table({"media_id": pa.array([1], pa.int64()),
                      "payload": pa.array([encode_ppm(img)], pa.binary()),
                      "height": pa.array([4], pa.int32()),
                      "width": pa.array([8], pa.int32())})
    out = DecodeImage()(batch)
    flat = out["pixels"][0].as_py()
    assert np.array_equal(np.array(flat, np.uint8),
                          img.reshape(-1))


def test_jl_sign_matrix_is_full_rank():
    """Regression: a linear parity with odd coefficients collapses to a
    rank-1 checkerboard (every projected dim a sign-copy of one
    functional). The shipped multiplicative-hash matrix must keep all
    16 output dims independent."""
    from tsdownsample_ray.pipelines.queries.ext_round5h import (_JL_K,
                                                                _jl_signs)

    S = _jl_signs()
    assert set(np.unique(S)) == {-1, 1}
    assert np.linalg.matrix_rank(S) == _JL_K
    # roughly balanced signs (a constant-ish matrix is rank-full but
    # useless): mean well inside (-0.5, 0.5)
    assert abs(S.mean()) < 0.5


def test_jl_distortion_exact_and_centered(ray_session):
    from tsdownsample_ray.pipelines.queries import QUERIES
    from tsdownsample_ray.pipelines.queries.ext_round5h import (_JL_K,
                                                                _jl_signs)

    out = QUERIES["jl_distortion_embeddings"](
        "/root/testdata/sf0.001").to_pandas()
    assert len(out) == 32 * 31 // 2
    # brute-force replay for the first few pairs
    import duckdb

    emb = duckdb.sql("""
        SELECT vec_id, embedding
        FROM '/root/testdata/sf0.001/embeddings.parquet'
        WHERE vec_id < 32 ORDER BY vec_id""").fetchall()
    Q = np.clip(np.trunc(np.array([e for _, e in emb], np.float64) * 127),
                -127, 127).astype(np.int64)
    P = Q @ _jl_signs()
    row = out[(out.a == 0) & (out.b == 1)].iloc[0]
    assert row.d2_orig == int(((Q[0] - Q[1]) ** 2).sum())
    assert row.d2_proj == int(((P[0] - P[1]) ** 2).sum())
    # JL with +-1 entries: E[d2_proj] = K * d2_orig -> distortion ~ 1
    m = out.distortion.dropna().mean()
    assert 0.7 < m < 1.3, m
