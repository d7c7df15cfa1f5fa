"""Binary netpbm (PPM P6 / PGM P5) codec — the simplest REAL raster
container, kept here so the multimodal decode stage covers the
plain-header end of the format spectrum alongside BMP's fixed struct
and PNG/JPEG/GIF's compressed bitstreams.

Grammar (netpbm spec): magic, then whitespace-separated header tokens
(width, height, maxval), where any ``#`` starts a comment running to
end-of-line and arbitrary whitespace separates tokens; ONE single
whitespace byte after maxval, then the raw raster (RGB triplets for
P6, single samples for P5). Encoder emits a comment line on purpose so
every decode exercises the comment path. Maxval must be 255 (1-byte
samples) — multi-byte rasters raise, honestly, like every other scope
limit in the codec family.
"""
from __future__ import annotations

import numpy as np


def encode_ppm(img: np.ndarray, comment: str = "tsdownsample-ray") -> bytes:
    """(h, w, 3) uint8 RGB -> binary PPM (P6, maxval 255)."""
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_ppm expects (h, w, 3) RGB")
    h, w = img.shape[:2]
    header = f"P6\n# {comment}\n{w} {h}\n255\n".encode()
    return header + np.ascontiguousarray(img, dtype=np.uint8).tobytes()


def encode_pgm(img: np.ndarray, comment: str = "tsdownsample-ray") -> bytes:
    """(h, w) uint8 grayscale -> binary PGM (P5, maxval 255)."""
    if img.ndim != 2:
        raise ValueError("encode_pgm expects (h, w) grayscale")
    h, w = img.shape
    header = f"P5\n# {comment}\n{w} {h}\n255\n".encode()
    return header + np.ascontiguousarray(img, dtype=np.uint8).tobytes()


def _header_tokens(buf: bytes, start: int, count: int):
    """Parse ``count`` whitespace/comment-separated ASCII integers from
    ``buf`` beginning at ``start``; returns (values, offset past the
    single whitespace byte that terminates the last token)."""
    vals = []
    i = start
    n = len(buf)
    while len(vals) < count:
        # skip whitespace and comments
        while i < n:
            c = buf[i]
            if c == 0x23:  # '#'
                while i < n and buf[i] not in (0x0A, 0x0D):
                    i += 1
            elif c in (0x20, 0x09, 0x0A, 0x0D, 0x0B, 0x0C):
                i += 1
            else:
                break
        j = i
        while j < n and 0x30 <= buf[j] <= 0x39:
            j += 1
        if j == i:
            raise ValueError("netpbm: malformed header integer")
        vals.append(int(buf[i:j]))
        i = j
    # exactly ONE whitespace byte after the last header token (spec)
    if i >= n or buf[i] not in (0x20, 0x09, 0x0A, 0x0D, 0x0B, 0x0C):
        raise ValueError("netpbm: missing raster separator")
    return vals, i + 1


def decode_netpbm(buf: bytes) -> np.ndarray:
    """Binary PPM (P6) -> (h, w, 3) uint8; binary PGM (P5) -> (h, w)."""
    magic = bytes(buf[:2])
    if magic not in (b"P6", b"P5"):
        raise ValueError(f"netpbm: unsupported magic {magic!r}")
    (w, h, maxval), off = _header_tokens(buf, 2, 3)
    if maxval != 255:
        raise NotImplementedError(
            "netpbm: only maxval 255 (1-byte samples) is implemented; "
            "2-byte rasters raise rather than mis-decode")
    ch = 3 if magic == b"P6" else 1
    need = w * h * ch
    if len(buf) - off < need:
        raise ValueError("netpbm: truncated raster")
    raster = np.frombuffer(buf, np.uint8, count=need, offset=off)
    img = raster.reshape(h, w, ch)
    return img if ch == 3 else img[:, :, 0]
