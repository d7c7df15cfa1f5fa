"""IMA/DVI ADPCM audio codec (WAV format tag 0x11) — real, dependency-
free STATEFUL compressed-audio support for the multimodal stages,
complementing the stateless G.711 companding in ``g711.py``.

IMA ADPCM (IMA Digital Audio Pack, 1992; the `ima4`/DVI codec carried
by WAV fmt 0x0011) codes each 16-bit sample as a 4-bit nibble against a
(predictor, step-index) state machine: the quantized difference updates
the predictor, and the nibble's magnitude bits move the step index
through an 89-entry step table. Encode and decode predictors stay in
LOCKSTEP — the decoded sample *is* the encoder's updated predictor — so
the whole encode->decode roundtrip is a pure int recursion that a
recursive-CTE SQL oracle replays bit-identically.

Container: a minimal-but-real RIFF/WAVE mono stream, fmt tag 0x11 with
ONE data block whose 4-byte header carries the initial state
``(predictor:int16=0, index:u8=0, reserved:u8)`` followed by packed
nibbles (low nibble first, odd tail padded). Single-block streams keep
the state chain unbroken, which is what the SQL replay pins.

The per-sample loops are inherent codec chains (same contract as the
GIF LZW codec in ``gif.py``): bounded by payload size, run inside the
actor-pool decode stage, never on the driver.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["STEP_TABLE", "INDEX_TABLE", "ima_encode", "ima_decode",
           "encode_wav_ima", "decode_wav_ima"]

# ITU/IMA reference tables (public: IMA ADPCM spec, 1992)
STEP_TABLE = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767], dtype=np.int64)
INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int64)


def ima_encode(pcm: np.ndarray, pred: int = 0,
               index: int = 0) -> np.ndarray:
    """int16 PCM -> one uint8 nibble per sample (UNPACKED), from
    initial state ``(pred, index)``. Sequential by construction (the
    predictor feeds back); python-int loop, exact int16 clamp."""
    samples = np.asarray(pcm, dtype=np.int64).tolist()
    steps = STEP_TABLE.tolist()
    itab = INDEX_TABLE.tolist()
    out = []
    for s in samples:
        step = steps[index]
        diff = s - pred
        sign = 8 if diff < 0 else 0
        ad = -diff if diff < 0 else diff
        b2 = 1 if ad >= step else 0
        ad -= b2 * step
        h1 = step >> 1
        b1 = 1 if ad >= h1 else 0
        ad -= b1 * h1
        h2 = step >> 2
        b0 = 1 if ad >= h2 else 0
        mag = (b2 << 2) | (b1 << 1) | b0
        vpdiff = (step >> 3) + b2 * step + b1 * h1 + b0 * h2
        pred = pred - vpdiff if sign else pred + vpdiff
        pred = -32768 if pred < -32768 else (32767 if pred > 32767
                                             else pred)
        index += itab[mag]
        index = 0 if index < 0 else (88 if index > 88 else index)
        out.append(sign | mag)
    return np.array(out, dtype=np.uint8)


def ima_decode(nibbles: np.ndarray, pred: int = 0,
               index: int = 0) -> np.ndarray:
    """uint8 nibbles (UNPACKED) -> int16 PCM from initial state —
    the exact mirror of :func:`ima_encode`'s state updates."""
    nibs = np.asarray(nibbles, dtype=np.int64).tolist()
    steps = STEP_TABLE.tolist()
    itab = INDEX_TABLE.tolist()
    out = []
    for nib in nibs:
        step = steps[index]
        mag = nib & 7
        vpdiff = ((step >> 3) + (step if mag & 4 else 0)
                  + ((step >> 1) if mag & 2 else 0)
                  + ((step >> 2) if mag & 1 else 0))
        pred = pred - vpdiff if nib & 8 else pred + vpdiff
        pred = -32768 if pred < -32768 else (32767 if pred > 32767
                                             else pred)
        index += itab[mag]
        index = 0 if index < 0 else (88 if index > 88 else index)
        out.append(pred)
    return np.array(out, dtype=np.int16)


def encode_wav_ima(pcm: np.ndarray, rate: int = 8000) -> bytes:
    """int16 PCM -> mono RIFF/WAVE, fmt tag 0x0011 (IMA ADPCM), ONE
    data block: ``[pred:int16=0][index:u8=0][reserved:u8=0]`` + packed
    nibbles (low nibble first; odd tail padded with 0)."""
    nib = ima_encode(pcm)
    n = len(nib)
    if n % 2:
        nib = np.append(nib, np.uint8(0))
    packed = (nib[0::2] | (nib[1::2] << 4)).astype(np.uint8).tobytes()
    block = struct.pack("<hBB", 0, 0, 0) + packed
    block_align = len(block)
    # fmt chunk: tag 0x11, 1 channel, cbSize=2 extension carrying
    # samples-per-block; fact chunk carries the true sample count
    fmt = struct.pack("<HHIIHHHH", 0x11, 1, rate,
                      rate * block_align // max(n, 1) if n else rate,
                      block_align, 4, 2, n)
    fact = struct.pack("<I", n)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"fact" + struct.pack("<I", len(fact)) + fact
            + b"data" + struct.pack("<I", len(block)) + block)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_ima(payload: bytes):
    """RIFF/WAVE fmt-0x11 mono single-block stream -> (int16 PCM,
    rate). Walks the chunk list; honors the fact-chunk sample count
    (drops the odd-tail pad nibble)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, n_samples, data = 12, 8000, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (sz,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8: pos + 8 + sz]
        if cid == b"fmt ":
            tag, ch, rate = struct.unpack_from("<HHI", body, 0)
            if tag != 0x11 or ch != 1:
                raise ValueError(
                    f"not mono IMA ADPCM (tag={tag:#x}, ch={ch})")
        elif cid == b"fact":
            (n_samples,) = struct.unpack_from("<I", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)  # RIFF word padding
    if data is None:
        raise ValueError("no data chunk")
    pred, index, _ = struct.unpack_from("<hBB", data, 0)
    packed = np.frombuffer(data[4:], dtype=np.uint8)
    nib = np.empty(2 * len(packed), dtype=np.uint8)
    nib[0::2] = packed & 0x0F
    nib[1::2] = packed >> 4
    if n_samples is not None:
        nib = nib[:n_samples]
    return ima_decode(nib, pred, index), rate
