"""Round-5 session-3 wave, part 3: Johnson-Lindenstrauss projection
distortion audit (the dimensionality-reduction scale path for
embedding pipelines) and netpbm (PPM P6) decode features (the
plain-text-header member of the REAL image codec family).
"""
from __future__ import annotations

import numpy as np

from ._shared import _read_parquet_clean, pa, pc

_JL_D = 64    # source dims (embeddings schema)
_JL_K = 16    # projected dims
_JL_NQ = 32   # audited vector subset


def _jl_signs() -> np.ndarray:
    """The deterministic ±1 projection matrix, replayed verbatim in the
    SQL oracle through a two-step multiplicative hash:
    ``h = (i*73856093 + j*19349663) % 83492791`` then the top bit of
    the 32-bit product ``h * 2654435761``. A plain linear parity like
    ``(a*i + b*j) % 2`` with odd coefficients collapses to
    ``(-1)^(i+j)`` — a RANK-1 checkerboard whose 16 output dims are
    sign-copies of one functional (caught in review; this matrix is
    verified full-rank in tests). All intermediates stay under 2^58 so
    both int64 sides are exact."""
    i = np.arange(_JL_D)[:, None]
    j = np.arange(_JL_K)[None, :]
    h = (i * 73856093 + j * 19349663) % 83492791
    bit = (h * 2654435761 % 4294967296) // 2147483648
    return (1 - 2 * bit).astype(np.int64)


def q_jl_distortion_embeddings(sf_dir: str):
    """Johnson-Lindenstrauss ±1 random-projection distortion audit:
    embeddings are int8-quantized (the ``quantized_knn_recall``
    convention: ``clamp(trunc(v*127), -127, 127)``) and projected
    64 -> 16 dims through a deterministic ±1 sign matrix — the
    dimensionality-reduction step a 100 TB embedding pipeline runs
    before LSH/IVF indexing, where shipping 4x fewer bytes through
    every shuffle is the point. The projection itself is the
    DISTRIBUTED stage (one (batch x 64) @ (64 x 16) int matmul per
    Arrow batch, the sign matrix a broadcast closure); the audit then
    compares exact squared distances before/after over all pairs of
    the first 32 vectors (a documented bounded read: 32 x 64 ints).
    Output per pair: (a, b, d2_orig, d2_proj, distortion) where
    distortion = d2_proj / (K * d2_orig) in one f64 division (JL with
    ±1 entries: E[d2_proj] = K * d2_orig), NULL for identical
    vectors."""
    S = _jl_signs()

    ds = _read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding"])

    def _project(b: pa.Table) -> pa.Table:
        emb = b["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        flat = emb.values.to_numpy(zero_copy_only=False)
        m = flat.reshape(-1, _JL_D).astype(np.float64)
        q8 = np.clip(np.trunc(m * 127), -127, 127).astype(np.int64)
        proj = q8 @ S
        return pa.table({
            "vec_id": b["vec_id"],
            "q8": pa.array(list(q8), pa.list_(pa.int64())),
            "p": pa.array(list(proj), pa.list_(pa.int64())),
        })

    projected = ds.map_batches(_project, batch_format="pyarrow")
    audit = projected.filter(expr=f"vec_id < {_JL_NQ}")
    # bounded driver read by construction: _JL_NQ rows x (64+16) ints
    rows = audit.take_all()
    rows.sort(key=lambda r: r["vec_id"])
    ids = np.array([r["vec_id"] for r in rows], np.int64)
    Q = np.array([r["q8"] for r in rows], np.int64)
    P = np.array([r["p"] for r in rows], np.int64)
    a_l, b_l, d2o, d2p = [], [], [], []
    for x in range(len(ids)):
        dq = Q[x + 1:] - Q[x]
        dp = P[x + 1:] - P[x]
        a_l.extend([int(ids[x])] * (len(ids) - x - 1))
        b_l.extend(ids[x + 1:].tolist())
        d2o.extend((dq * dq).sum(axis=1).tolist())
        d2p.extend((dp * dp).sum(axis=1).tolist())
    d2o = np.array(d2o, np.int64)
    d2p = np.array(d2p, np.int64)
    dist = np.where(d2o > 0, d2p / (float(_JL_K) * d2o), np.nan)
    return pa.table({
        "a": pa.array(a_l, pa.int64()), "b": pa.array(b_l, pa.int64()),
        "d2_orig": pa.array(d2o), "d2_proj": pa.array(d2p),
        "distortion": pa.array(
            [None if d2o[i] == 0 else float(dist[i])
             for i in range(len(d2o))], pa.float64()),
    })


JL_DISTORTION_SQL = f"""
WITH q AS (
    SELECT vec_id, list_transform(embedding,
               v -> CAST(greatest(least(trunc(v * 127), 127), -127)
                         AS BIGINT)) AS q8
    FROM embeddings WHERE vec_id < {_JL_NQ}
),
pr AS (
    SELECT vec_id, j,
           sum(q8[i + 1] * (1 - 2 * (((i * 73856093 + j * 19349663)
                                      % 83492791) * 2654435761
                                     % 4294967296 // 2147483648))) AS p
    FROM q, unnest(range({_JL_D})) r(i), unnest(range({_JL_K})) s(j)
    GROUP BY 1, 2
),
po AS (
    SELECT x.vec_id AS a, y.vec_id AS b,
           CAST(sum((x.p - y.p) * (x.p - y.p)) AS BIGINT) AS d2_proj
    FROM pr x JOIN pr y ON x.j = y.j AND x.vec_id < y.vec_id
    GROUP BY 1, 2
),
oo AS (
    SELECT x.vec_id AS a, y.vec_id AS b,
           CAST(sum((x.v - y.v) * (x.v - y.v)) AS BIGINT) AS d2_orig
    FROM (SELECT vec_id, i, q8[i + 1] AS v
          FROM q, unnest(range({_JL_D})) r(i)) x
    JOIN (SELECT vec_id, i, q8[i + 1] AS v
          FROM q, unnest(range({_JL_D})) r(i)) y
      ON x.i = y.i AND x.vec_id < y.vec_id
    GROUP BY 1, 2
)
SELECT oo.a, oo.b, d2_orig, d2_proj,
       CASE WHEN d2_orig = 0 THEN NULL
            ELSE d2_proj / ({_JL_K}.0 * d2_orig) END AS distortion
FROM oo JOIN po ON oo.a = po.a AND oo.b = po.b
"""


def q_image_features_ppm(sf_dir: str):
    """REAL netpbm (PPM P6) decode through the actor-pool image stage:
    8xH RGB rasters whose pixel bytes ARE the documents' own bytes
    (zero-padded to whole pixels), wrapped in a REAL P6 header WITH a
    comment line — every decode exercises the whitespace/comment
    header grammar (``functions/netpbm.py``) — then an exact 8-bin
    brightness histogram per image. Padding bytes land in bin 0, which
    the SQL replay accounts for explicitly (same ASCII corpus contract
    as every multimodal oracle here: the SQL side counts code points /
    char lengths, identical to the engine's UTF-8 bytes only while the
    corpus is ASCII — as the BMP/WAV siblings document)."""
    from ...functions.netpbm import encode_ppm
    from ...stages.multimodal import DecodeImage, image_brightness_hist

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"])

    def _media(b: pa.Table) -> pa.Table:
        payloads, hs = [], []
        for t in b["text"].to_pylist():
            raw = t.encode()
            h = max(1, -(-len(raw) // 24))
            buf = np.zeros(h * 24, dtype=np.uint8)
            buf[: len(raw)] = np.frombuffer(raw, np.uint8)
            payloads.append(encode_ppm(buf.reshape(h, 8, 3)))
            hs.append(h)
        return pa.table({
            "media_id": b["doc_id"],
            "payload": pa.array(payloads, pa.binary()),
            "height": pa.array(hs, pa.int32()),
            "width": pa.array([8] * b.num_rows, pa.int32()),
        })

    media = ds.map_batches(_media, batch_format="pyarrow", batch_size=64)
    dec = media.map_batches(DecodeImage, batch_format="pyarrow",
                            batch_size=64, concurrency=(1, 8))
    return image_brightness_hist(dec, bins=8)


_PPM_BIN = """COALESCE(list_sum(list_transform(
               range(1, length(text) + 1),
               i -> CASE WHEN unicode(substring(text, i, 1)) // 32 = {j}
                    THEN 1 ELSE 0 END)), 0)"""

IMAGE_FEATURES_PPM_SQL = f"""
WITH base AS (
    SELECT doc_id,
           24 * greatest(1, CAST(ceil(length(text) / 24.0) AS BIGINT))
               AS n_bytes,
           CAST(length(text) AS BIGINT) AS n_txt,
           {", ".join(_PPM_BIN.format(j=j) + f" AS t{j}"
                      for j in range(8))}
    FROM documents
)
SELECT doc_id AS media_id, n_bytes,
       CAST(t0 + (n_bytes - n_txt) AS BIGINT) AS b0,
       {", ".join(f"CAST(t{j} AS BIGINT) AS b{j}" for j in range(1, 8))}
FROM base
"""
