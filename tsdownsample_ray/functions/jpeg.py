"""Baseline JPEG codec in pure NumPy + stdlib — no PIL/libjpeg.

Real, general-purpose baseline sequential JPEG (ITU-T T.81): marker
parsing, DQT/DHT table handling, canonical Huffman entropy coding, DC
prediction, run-length AC coding with ZRL/EOB, dequantization, a
vectorized whole-image 8x8 IDCT (one einsum over every block at once),
restart-marker handling, and JFIF YCbCr<->RGB for 3-component images.
Scope limits (raise ``NotImplementedError``, never silently wrong):
progressive (SOF2), arithmetic coding, chroma subsampling != 1x1, and
12-bit precision.

Why it exists (SURVEY.md §2 multimodal row): the container has no image
codec library, but a training-data engine must decode real compressed
payloads inside ``map_batches`` actor stages. BMP/PNG/WAV decoders are
already real; this closes the JPEG gap with an actual entropy-coded DCT
codec rather than a ``fake=True`` stub. The reference
(predict-idlab/tsdownsample) has no multimodal counterpart — this layer
is brief-mandated, not reference parity.

Exactness note for oracles: JPEG is lossy, but an image whose 8x8 blocks
are each CONSTANT has only a DC coefficient (AC are exactly zero), and
with the DC quantizer set to 8 the quantized DC is exactly ``v - 128``
— so decode returns the source byte exactly and the full encode->decode
pipeline is restatable in ANSI SQL (see ``q_multimodal_jpeg_decode``).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_jpeg", "decode_jpeg", "STD_QUANT_LUMA",
           "STD_QUANT_CHROMA", "dc_exact_quant"]

# --- constants (public T.81 Annex K tables) --------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

STD_QUANT_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], dtype=np.int64)

STD_QUANT_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99]], dtype=np.int64)

# (bits[1..16], values) — canonical Huffman specs, T.81 Annex K.3
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

# orthonormal 8x8 DCT basis: F = M @ f @ M.T, f = M.T @ F @ M
_k = np.arange(8)
_M = np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16) / 2.0
_M[0, :] = 1.0 / (2.0 * np.sqrt(2.0))


def dc_exact_quant() -> np.ndarray:
    """Quant table whose DC step is 8: constant 8x8 blocks survive the
    encode->decode roundtrip EXACTLY (qDC = round(8*(v-128)/8) = v-128,
    reconstruction = qDC*8/8 + 128 = v). AC entries keep the standard
    luminance values — irrelevant for constant blocks (AC == 0) but
    realistic for table-parsing coverage."""
    q = STD_QUANT_LUMA.copy()
    q[0, 0] = 8
    return q


def _canonical_codes(bits, values):
    """(bits, values) -> {value: (code, length)} canonical Huffman."""
    out, code = {}, 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


class _BitWriter:
    """MSB-first bit accumulation with 0xFF byte stuffing."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            self.write(0x7F, 8 - self.nbits)  # pad with 1-bits


def _magnitude(v: int):
    """JPEG magnitude coding: (category, extra-bit pattern)."""
    if v == 0:
        return 0, 0
    a = v if v > 0 else -v
    cat = a.bit_length()
    bits = v if v > 0 else v + (1 << cat) - 1
    return cat, bits


def _pack_bits(vals: np.ndarray, lens: np.ndarray) -> bytearray:
    """Vectorized MSB-first bit packing + 0xFF stuffing + 1-bit padding.

    Each vals[i]'s low lens[i] bits are emitted in order — the whole
    entropy stream in a handful of NumPy calls instead of a Python loop
    per symbol (the DC-only encoder fast path)."""
    lens = lens.astype(np.int64)
    width = int(lens.max()) if len(lens) else 0
    jj = np.arange(width)
    shift = lens[:, None] - 1 - jj[None, :]
    bits = ((vals[:, None] >> np.maximum(shift, 0)) & 1).astype(np.uint8)
    flat = bits[shift >= 0]                      # row-major, MSB-first
    pad = (-len(flat)) % 8
    if pad:
        flat = np.concatenate([flat, np.ones(pad, np.uint8)])
    packed = np.packbits(flat)
    stuffed = np.flatnonzero(packed == 0xFF)
    if len(stuffed):
        packed = np.insert(packed, stuffed + 1, 0)
    return bytearray(packed.tobytes())


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r, g, b = (img[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.clip(np.rint(np.stack([y, cb, cr], axis=-1)), 0, 255)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = (ycc[..., i] for i in range(3))
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.rint(np.stack([r, g, b], axis=-1)), 0, 255
                   ).astype(np.uint8)


def _blockify(plane: np.ndarray) -> np.ndarray:
    """(H, W) multiple-of-8 plane -> (nblocks, 8, 8) raster block order."""
    h, w = plane.shape
    return (plane.reshape(h // 8, 8, w // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8))


def _pad8(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def encode_jpeg(img: np.ndarray, quant: np.ndarray | None = None,
                restart_interval: int = 0) -> bytes:
    """uint8 (h, w) grayscale or (h, w, 3) RGB -> baseline JFIF bytes.

    4:4:4 (no subsampling); standard Annex-K Huffman tables; image padded
    to whole blocks by edge replication (decoder crops to the SOF size).
    Vectorized DCT + quantization over every block at once; the entropy
    coder visits only each block's nonzero AC positions.
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    that many MCUs (resync points for corrupted-stream recovery)."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise ValueError("encode_jpeg expects uint8 input")
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise ValueError("expected (h, w) or (h, w, 3)")
    h, w = img.shape[:2]
    if not (0 < h <= 65535 and 0 < w <= 65535):
        raise ValueError("image dimensions out of JPEG range")

    ql = (quant if quant is not None else STD_QUANT_LUMA).astype(np.int64)
    qc = STD_QUANT_CHROMA
    planes = ([img.astype(np.float64)] if gray else
              [p for p in np.moveaxis(_rgb_to_ycbcr(img), -1, 0)])
    tables = [(ql, _DC_LUMA, _AC_LUMA)] + [
        (qc, _DC_CHROMA, _AC_CHROMA)] * (0 if gray else 2)

    out = bytearray(b"\xff\xd8")  # SOI
    out += (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
            + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0]))
    # DQT (one segment per table)
    for tq, q in enumerate([ql] if gray else [ql, qc]):
        out += (b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq])
                + bytes(q.reshape(-1)[ZIGZAG].astype(np.uint8)))
    # SOF0
    ncomp = 1 if gray else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci in range(ncomp):
        out += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    # DHT
    dht_specs = ([(0x00, _DC_LUMA), (0x10, _AC_LUMA)] if gray else
                 [(0x00, _DC_LUMA), (0x10, _AC_LUMA),
                  (0x01, _DC_CHROMA), (0x11, _AC_CHROMA)])
    for tc_th, (bits, vals) in dht_specs:
        out += (b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
                + bytes([tc_th]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        out += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    out += bytes([0, 63, 0])

    # per-component quantized coefficients, all blocks vectorized
    comp_coefs = []
    for plane, (q, _, _) in zip(planes, tables):
        blocks = _blockify(_pad8(plane)) - 128.0
        coef = _M @ blocks @ _M.T     # batched over (n, 8, 8) blocks
        comp_coefs.append(np.rint(coef / q).astype(np.int64))

    dc_codes = [_canonical_codes(*t[1]) for t in tables]
    ac_codes = [_canonical_codes(*t[2]) for t in tables]
    nblocks = comp_coefs[0].shape[0]
    # zigzag every component once (vectorized), then entropy-code
    zz = [c.reshape(-1, 64)[:, ZIGZAG] for c in comp_coefs]

    if restart_interval == 0 and all(not z[:, 1:].any() for z in zz):
        # DC-only fast path (e.g. constant blocks): per block+component
        # the stream is exactly DC-huffman + magnitude bits + EOB — one
        # int64 (value, length) pair each, packed vectorized.
        vals_c, lens_c = [], []
        for ci in range(ncomp):
            dc = zz[ci][:, 0]
            diffs = np.diff(dc, prepend=0)
            _, cats = np.frexp(np.abs(diffs).astype(np.float64))
            cats = cats.astype(np.int64)  # == bit_length(|diff|), 0 at 0
            bits = np.where(diffs >= 0, diffs,
                            diffs + (np.int64(1) << cats) - 1)
            code_a = np.array([dc_codes[ci][c][0] for c in range(12)],
                              np.int64)
            len_a = np.array([dc_codes[ci][c][1] for c in range(12)],
                             np.int64)
            eob_code, eob_len = ac_codes[ci][0x00]
            v = ((code_a[cats] << cats) | bits)
            v = (v << eob_len) | eob_code
            vals_c.append(v)
            lens_c.append(len_a[cats] + cats + eob_len)
        vals = np.stack(vals_c, axis=1).reshape(-1)
        lens = np.stack(lens_c, axis=1).reshape(-1)
        out += _pack_bits(vals, lens)
        out += b"\xff\xd9"
        return bytes(out)

    bw = _BitWriter()
    pred = [0] * ncomp
    for bi in range(nblocks):
        if restart_interval and bi and bi % restart_interval == 0:
            bw.flush()
            out += bw.buf
            out += bytes([0xFF, 0xD0 + ((bi // restart_interval - 1) % 8)])
            bw = _BitWriter()
            pred = [0] * ncomp
        for ci in range(ncomp):
            v = zz[ci][bi]
            diff = int(v[0]) - pred[ci]
            pred[ci] = int(v[0])
            cat, bits = _magnitude(diff)
            code, ln = dc_codes[ci][cat]
            bw.write(code, ln)
            if cat:
                bw.write(bits, cat)
            nz = np.nonzero(v[1:])[0] + 1
            prev = 0
            for pos in nz:
                run = int(pos) - prev - 1
                while run >= 16:
                    code, ln = ac_codes[ci][0xF0]  # ZRL
                    bw.write(code, ln)
                    run -= 16
                cat, bits = _magnitude(int(v[pos]))
                code, ln = ac_codes[ci][(run << 4) | cat]
                bw.write(code, ln)
                bw.write(bits, cat)
                prev = int(pos)
            if prev != 63:
                code, ln = ac_codes[ci][0x00]  # EOB
                bw.write(code, ln)
    bw.flush()
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _FastBits:
    """MSB-first bit cursor over a pre-un-stuffed entropy segment. The
    4-byte 0xFF tail lets ``peek16`` run safely past the final symbol
    (trailing pad bits are 1s per T.81 F.2.2.5)."""

    __slots__ = ("b", "pos")

    def __init__(self, data: bytes):
        self.b = data + b"\xff\xff\xff\xff"
        self.pos = 0

    def peek16(self) -> int:
        i, r = divmod(self.pos, 8)
        return (int.from_bytes(self.b[i:i + 4], "big") >> (16 - r)) & 0xFFFF

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        i, r = divmod(self.pos, 8)
        self.pos += n
        return ((int.from_bytes(self.b[i:i + 4], "big") >> (32 - r - n))
                & ((1 << n) - 1))


class _HuffDecode:
    """Canonical Huffman decode via a flat 16-bit lookup table: one array
    index per symbol instead of a bit-by-bit tree walk (codes are <= 16
    bits, so every 16-bit window maps to exactly one (value, length))."""

    def __init__(self, bits, values):
        self.lut_val = np.zeros(65536, np.int16)
        self.lut_len = np.zeros(65536, np.uint8)  # 0 == invalid window
        code, i = 0, 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                base = code << (16 - length)
                span = 1 << (16 - length)
                self.lut_val[base: base + span] = values[i]
                self.lut_len[base: base + span] = length
                code += 1
                i += 1
            code <<= 1

    def decode(self, fb: _FastBits) -> int:
        w = fb.peek16()
        ln = self.lut_len[w]
        if ln == 0:
            raise ValueError("corrupt Huffman stream")
        fb.pos += ln
        return int(self.lut_val[w])


_HUFF_CACHE: dict = {}


def _huff_table(bits, values) -> _HuffDecode:
    """Memoized decode-table build: corpora re-use the same DHT contents
    (e.g. the Annex-K standard tables) across millions of payloads, and
    the 64 Ki LUT fill is ~1 ms — far more than decoding a small image."""
    key = (bytes(bits), bytes(values))
    t = _HUFF_CACHE.get(key)
    if t is None:
        if len(_HUFF_CACHE) > 64:  # unbounded growth guard
            _HUFF_CACHE.clear()
        t = _HUFF_CACHE[key] = _HuffDecode(bits, values)
    return t


def _entropy_segments(d: bytes, pos: int) -> list:
    """Split the scan's entropy-coded data into restart segments, each
    with 0xFF00 stuffing removed — all marker/stuffing scanning done
    vectorized up front so the symbol loop never inspects raw bytes."""
    tail = np.frombuffer(d, np.uint8)[pos:]
    ffp = np.flatnonzero(tail[:-1] == 0xFF)
    nxt = tail[ffp + 1]
    is_stuff = nxt == 0x00
    is_rst = (nxt >= 0xD0) & (nxt <= 0xD7)
    term = ffp[~is_stuff & ~is_rst]
    end = int(term[0]) if len(term) else len(tail)
    segments, start = [], 0
    for r in ffp[is_rst & (ffp < end)]:
        segments.append((start, int(r)))
        start = int(r) + 2
    segments.append((start, end))
    out = []
    for a, b in segments:
        seg = tail[a:b]
        sp = np.flatnonzero((seg[:-1] == 0xFF) & (seg[1:] == 0x00)) + 1
        out.append(np.delete(seg, sp).tobytes() if len(sp)
                   else seg.tobytes())
    return out


def _extend(bits: int, cat: int) -> int:
    if cat == 0:
        return 0
    return bits if bits >= (1 << (cat - 1)) else bits - (1 << cat) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> uint8 (h, w) grayscale or (h, w, 3) RGB.

    General baseline decoder: any DQT/DHT tables carried in the stream,
    DRI/RSTn restart intervals, 1- or 3-component 4:4:4 scans. Raises
    ``NotImplementedError`` for progressive/arithmetic/subsampled files
    rather than decoding them wrongly."""
    d = payload
    if d[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffDecode] = {}
    huff_ac: dict[int, _HuffDecode] = {}
    frame = None
    restart_interval = 0
    while True:
        if d[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = d[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            raise ValueError("EOI before SOS — no image data")
        seg_len = struct.unpack_from(">H", d, pos)[0]
        body = d[pos + 2: pos + seg_len]
        pos += seg_len
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0x0F
                off += 1
                if pq == 0:
                    tbl = np.frombuffer(body, np.uint8, 64, off
                                        ).astype(np.int64)
                    off += 64
                else:
                    tbl = np.frombuffer(body, ">u2", 64, off
                                        ).astype(np.int64)
                    off += 128
                quant[tq] = tbl[UNZIGZAG].reshape(8, 8)
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0x0F
                bits = list(body[off + 1: off + 17])
                nv = sum(bits)
                vals = list(body[off + 17: off + 17 + nv])
                (huff_dc if tc == 0 else huff_ac)[th] = _huff_table(
                    bits, vals)
                off += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            comps = []
            for ci in range(nc):
                cid, samp, tq = body[6 + 3 * ci: 9 + 3 * ci]
                if samp != 0x11:
                    raise NotImplementedError(
                        "chroma subsampling != 1x1 needs a codec library")
                comps.append((cid, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "progressive/extended/arithmetic JPEG needs a codec library")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []
            for si in range(ns):
                cs, tt = body[1 + 2 * si: 3 + 2 * si]
                scan.append((cs, tt >> 4, tt & 0x0F))
            break
        # APPn / COM / anything else: skipped via seg_len

    h, w, comps = frame
    bw_, bh_ = -(-w // 8), -(-h // 8)
    nblocks = bw_ * bh_
    ncomp = len(comps)
    coefs = np.zeros((ncomp, nblocks, 64), dtype=np.int64)
    cid_to_idx = {cid: i for i, (cid, _) in enumerate(comps)}
    order = [(cid_to_idx[cs], huff_dc[td], huff_ac[ta])
             for cs, td, ta in scan]

    segments = _entropy_segments(d, pos)
    seg_idx = 0
    fb = _FastBits(segments[0])
    pred = [0] * ncomp
    for bi in range(nblocks):
        if restart_interval and bi and bi % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ValueError("missing restart marker")
            fb = _FastBits(segments[seg_idx])
            pred = [0] * ncomp
        for ci, hdc, hac in order:
            cat = hdc.decode(fb)
            diff = _extend(fb.read(cat), cat)
            pred[ci] += diff
            blk = coefs[ci, bi]
            blk[0] = pred[ci]
            k = 1
            while k < 64:
                rs = hac.decode(fb)
                run, cat = rs >> 4, rs & 0x0F
                if cat == 0:
                    if run == 15:  # ZRL
                        k += 16
                        continue
                    break  # EOB
                k += run
                if k > 63:
                    raise ValueError("AC run past block end")
                blk[k] = _extend(fb.read(cat), cat)
                k += 1

    # vectorized dequant + IDCT over every block of every component
    planes = []
    for i, (_, tq) in enumerate(comps):
        deq = (coefs[i][:, UNZIGZAG].reshape(-1, 8, 8)
               * quant[tq][None, :, :]).astype(np.float64)
        spatial = _M.T @ deq @ _M + 128.0  # batched over (n, 8, 8)
        plane = (spatial.reshape(bh_, bw_, 8, 8).transpose(0, 2, 1, 3)
                 .reshape(bh_ * 8, bw_ * 8))
        planes.append(np.clip(np.rint(plane), 0, 255)[:h, :w])
    if ncomp == 1:
        return planes[0].astype(np.uint8)
    if ncomp == 3:
        return _ycbcr_to_rgb(np.stack(planes, axis=-1))
    raise NotImplementedError(f"{ncomp}-component JPEG")
