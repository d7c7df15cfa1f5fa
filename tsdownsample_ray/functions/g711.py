"""G.711 mu-law / A-law audio codec and the Sun AU container — real,
dependency-free compressed-audio support for the multimodal stages.

G.711 is the ITU-T telephony codec: 8-bit logarithmic companding of
16-bit PCM. Both directions are pure integer arithmetic, implemented
here fully vectorized over NumPy uint8/int16 arrays (no per-sample
Python), and pytest-verified against the stdlib ``audioop`` C
implementation for every 16-bit input. The AU (".snd") container is the
classic carrier for G.711 payloads (encoding 1 = mu-law, 27 = A-law,
3 = 16-bit linear PCM big-endian).

The positive-sample decode arithmetic is restated verbatim in the driver
oracle SQL (queries.py), which is what makes ``multimodal_mulaw_decode``
hash-verifiable end to end.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "mulaw_encode", "mulaw_decode", "alaw_encode", "alaw_decode",
    "encode_au", "decode_au", "AU_MAGIC",
]

AU_MAGIC = 0x2E736E64  # ".snd"
_BIAS = 0x84  # 132
_CLIP = 32635


def mulaw_encode(pcm: np.ndarray) -> np.ndarray:
    """int16 PCM -> 8-bit mu-law, vectorized.

    The 14-bit-input variant (input >> 2, 14-bit CLIP 8159, BIAS 33) —
    bit-identical to the stdlib ``audioop.lin2ulaw`` / Sun
    ``st_14linear2ulaw`` reference for every 16-bit input
    (pytest-exhaustive)."""
    x = np.asarray(pcm, dtype=np.int32) >> 2
    mask = np.where(x < 0, 0x7F, 0xFF).astype(np.int32)
    mag = np.minimum(np.abs(x), 8159) + (_BIAS >> 2)
    seg = np.zeros(len(mag), dtype=np.int32)
    for t in (0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF):
        seg += (mag > t).astype(np.int32)
    uval = np.where(seg >= 8, 0x7F,
                    (seg << 4) | ((mag >> (seg + 1)) & 0x0F))
    return ((uval ^ mask) & 0xFF).astype(np.uint8)


def mulaw_decode(b: np.ndarray) -> np.ndarray:
    """8-bit mu-law -> int16 PCM (ITU-T G.711), vectorized."""
    u = ~np.asarray(b, dtype=np.uint8).astype(np.int32) & 0xFF
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = (((mant << 3) + _BIAS) << exp) - _BIAS
    return np.where(u & 0x80, -mag, mag).astype(np.int16)


def alaw_encode(pcm: np.ndarray) -> np.ndarray:
    """int16 PCM -> 8-bit A-law (ITU-T G.711), vectorized."""
    x = np.asarray(pcm, dtype=np.int32)
    sign = np.where(x >= 0, 0x80, 0).astype(np.int32)
    mag = np.minimum(np.where(x >= 0, x, -x - 1), 0x7FFF) >> 3  # 13-bit
    exp = np.zeros(len(mag), dtype=np.int32)
    for e in range(1, 8):
        exp += (mag >= (1 << (4 + e))).astype(np.int32)
    mant = np.where(exp == 0, (mag >> 1) & 0x0F,
                    (mag >> exp) & 0x0F)
    return ((sign | (exp << 4) | mant) ^ 0x55).astype(np.uint8)


def alaw_decode(b: np.ndarray) -> np.ndarray:
    """8-bit A-law -> int16 PCM (ITU-T G.711), vectorized."""
    u = (np.asarray(b, dtype=np.uint8).astype(np.int32)) ^ 0x55
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = np.where(exp == 0, (mant << 4) + 8,
                   ((mant << 4) + 0x108) << (exp - 1))
    return np.where(u & 0x80, mag, -mag).astype(np.int16)


_AU_ENCODINGS = {"mulaw": 1, "pcm16": 3, "alaw": 27}


def encode_au(samples_i16: np.ndarray, rate: int = 8_000,
              encoding: str = "mulaw") -> bytes:
    """int16 mono samples -> Sun AU bytes with the requested G.711
    companding (or big-endian linear PCM)."""
    code = _AU_ENCODINGS[encoding]
    s = np.asarray(samples_i16, dtype=np.int16)
    if encoding == "mulaw":
        data = mulaw_encode(s).tobytes()
    elif encoding == "alaw":
        data = alaw_encode(s).tobytes()
    else:
        data = s.astype(">i2").tobytes()
    hdr = struct.pack(">IIIIII", AU_MAGIC, 24, len(data), code, rate, 1)
    return hdr + data


def decode_au(payload: bytes) -> tuple:
    """Sun AU bytes -> (mono float32 samples in [-1, 1], sample_rate).

    Real decode for mu-law (1), A-law (27) and 16-bit linear PCM (3);
    other encodings (ADPCM, float) raise ``NotImplementedError``."""
    if len(payload) < 24:
        raise ValueError("truncated AU header")
    magic, hdr_size, data_size, code, rate, nch = struct.unpack(
        ">IIIIII", payload[:24])
    if magic != AU_MAGIC:
        raise ValueError("not an AU payload (bad magic)")
    end = (len(payload) if data_size == 0xFFFFFFFF
           else min(len(payload), hdr_size + data_size))
    data = payload[hdr_size:end]
    if code == 1:
        pcm = mulaw_decode(np.frombuffer(data, dtype=np.uint8))
    elif code == 27:
        pcm = alaw_decode(np.frombuffer(data, dtype=np.uint8))
    elif code == 3:
        pcm = np.frombuffer(data[: len(data) // 2 * 2], dtype=">i2") \
                .astype(np.int16)
    else:
        raise NotImplementedError(
            f"AU encoding {code} (ADPCM/float) needs an audio lib")
    s = pcm.astype(np.float32) / 32768.0
    if nch > 1:
        s = s[: len(s) // nch * nch].reshape(-1, nch).mean(axis=1)
    return s, rate
