"""From-scratch GIF87a codec: real LZW (variable code width, dictionary
growth, clear/EOI, the KwKwK case) over a 256-entry grayscale palette.

Scope: single-image GIF87a, 8-bit palette, no interlace, no extensions —
the deterministic fixture format for the multimodal decode stage (like
``functions/jpeg.py`` for JPEG; the reference repo contains no image
code — this is engine-level corpus plumbing, SURVEY.md §2.5).

Encoder emits a REAL adaptive LZW stream (initial clear, dictionary up
to 4096 then clear+reset) so the decoder's growth/reset paths are
exercised by every fixture, not just the trivial literal path.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_gif", "decode_gif"]

_GIF_SIG = b"GIF87a"
_MIN_CODE_SIZE = 8  # 256-entry palette
_CLEAR = 1 << _MIN_CODE_SIZE          # 256
_EOI = _CLEAR + 1                     # 257
_MAX_CODE = 4096


class _BitWriter:
    """LSB-first bit packer (the GIF LZW byte order)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int):
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def _lzw_encode(data: bytes) -> bytes:
    w = _BitWriter()
    width = _MIN_CODE_SIZE + 1
    table = {bytes([i]): i for i in range(1 << _MIN_CODE_SIZE)}
    next_code = _EOI + 1
    w.write(_CLEAR, width)
    prefix = b""
    for b in data:
        cand = prefix + bytes([b])
        if cand in table:
            prefix = cand
            continue
        w.write(table[prefix], width)
        table[cand] = next_code
        next_code += 1
        # width grows AFTER the code that fills the current range
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code >= _MAX_CODE:
            w.write(_CLEAR, width)
            table = {bytes([i]): i for i in range(1 << _MIN_CODE_SIZE)}
            next_code = _EOI + 1
            width = _MIN_CODE_SIZE + 1
        prefix = bytes([b])
    if prefix:
        w.write(table[prefix], width)
    w.write(_EOI, width)
    return w.flush()


def _lzw_decode(data: bytes, n_expected: int) -> bytes:
    out = bytearray()
    width = _MIN_CODE_SIZE + 1
    table = [bytes([i]) for i in range(1 << _MIN_CODE_SIZE)] + [b"", b""]
    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("GIF LZW stream truncated (no EOI)")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == _CLEAR:
            table = table[: _EOI + 1]
            width = _MIN_CODE_SIZE + 1
            prev = None
            continue
        if code == _EOI:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"GIF LZW code {code} out of range")
        out += entry
        if prev is not None and len(table) == (1 << width) and width < 12:
            # decoder grows width when the NEXT append would overflow —
            # mirrors the encoder's grow-after-fill rule
            width += 1
        prev = entry
        if len(out) > n_expected:
            raise ValueError("GIF LZW produced more pixels than h*w")
    return bytes(out)


def encode_gif(img: np.ndarray) -> bytes:
    """(h, w) uint8 grayscale (palette-index) image -> GIF87a bytes."""
    if img.ndim != 2 or img.dtype != np.uint8:
        raise ValueError("encode_gif expects a (h, w) uint8 array")
    h, w = img.shape
    out = bytearray(_GIF_SIG)
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)  # screen descriptor
    pal = np.repeat(np.arange(256, dtype=np.uint8), 3)  # gray i,i,i
    out += pal.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)  # image descriptor
    out.append(_MIN_CODE_SIZE)
    stream = _lzw_encode(img.tobytes())
    for i in range(0, len(stream), 255):
        chunk = stream[i: i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)      # block terminator
    out.append(0x3B)   # trailer
    return bytes(out)


def decode_gif(payload: bytes) -> np.ndarray:
    """GIF87a bytes -> (h, w, 3) uint8 RGB via the embedded palette."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    pal = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        pal = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(payload):
        b = payload[pos]
        if b == 0x2C:  # image descriptor
            _l, _t, w, h, ipacked = struct.unpack_from("<HHHHB",
                                                       payload, pos + 1)
            pos += 10
            if ipacked & 0x40:
                raise NotImplementedError("interlaced GIF not supported")
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                pal = np.frombuffer(payload, np.uint8,
                                    n * 3, pos).reshape(n, 3)
                pos += n * 3
            min_code = payload[pos]
            if min_code != _MIN_CODE_SIZE:
                raise NotImplementedError(
                    f"only 8-bit GIF palettes supported, got {min_code}")
            pos += 1
            stream = bytearray()
            while True:
                ln = payload[pos]
                pos += 1
                if ln == 0:
                    break
                stream += payload[pos: pos + ln]
                pos += ln
            idx = np.frombuffer(_lzw_decode(bytes(stream), h * w),
                                np.uint8)
            if len(idx) != h * w:
                raise ValueError("GIF pixel count mismatch")
            if pal is None:
                raise ValueError("GIF image without a palette")
            return pal[idx.reshape(h, w)]
        if b == 0x21:  # extension: skip sub-blocks
            pos += 2
            while payload[pos] != 0:
                pos += payload[pos] + 1
            pos += 1
            continue
        if b == 0x3B:
            break
        raise ValueError(f"unexpected GIF block 0x{b:02x}")
    raise ValueError("GIF contains no image data")
