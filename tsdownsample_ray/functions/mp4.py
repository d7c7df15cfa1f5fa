"""ISO BMFF (MP4) container codec — pure stdlib/NumPy, no ffmpeg.

Real container-level support: a writer that produces a valid minimal
single-track MP4 (ftyp / mdat / moov with the full stbl sample tables)
and a parser that walks the box tree and reconstructs the per-sample
byte ranges and timestamps from ``stsz`` / ``stco``(+``co64``) /
``stsc`` / ``stts`` / ``mdhd`` — which is exactly what frame *sampling*
needs: picking every-nth frame and extracting its bytes is a sample-table
operation, not a bitstream decode. Decoding the frame payloads themselves
(H.264 etc.) genuinely needs a codec library and stays stubbed in
``stages/multimodal.py``.

No reference counterpart (the reference is a downsampling kernel
library); this is the brief-mandated multimodal layer.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_mp4", "mp4_sample_table", "mp4_extract_samples"]

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts",
               b"dinf", b"udta"}


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _full(btype: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(btype, struct.pack(">B3s", version,
                                   flags.to_bytes(3, "big")) + payload)


_IDENTITY_MATRIX = struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0,
                               0, 0, 0x40000000)


def encode_mp4(frames: list, fps: int = 25, timescale: int = 1000,
               width: int = 64, height: int = 64) -> bytes:
    """Frame payloads -> minimal valid single-track MP4.

    One chunk holding every sample (``stsc`` = one run), explicit
    per-sample sizes (``stsz``), constant frame duration
    ``timescale // fps`` (``stts`` = one run). The mdat precedes moov so
    chunk offsets are known without a second pass."""
    if not frames:
        raise ValueError("need at least one frame")
    delta = timescale // fps
    n = len(frames)
    duration = n * delta

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mdat_payload = b"".join(frames)
    mdat = _box(b"mdat", mdat_payload)
    mdat_offset = len(ftyp) + 8  # first sample's file offset

    stsd_entry = _box(b"mp4v", b"\x00" * 6 + struct.pack(">H", 1)
                      + b"\x00" * 16
                      + struct.pack(">HH", width, height)
                      + struct.pack(">II", 0x00480000, 0x00480000)
                      + b"\x00" * 4 + struct.pack(">H", 1)
                      + b"\x00" * 32
                      + struct.pack(">Hh", 24, -1))
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + stsd_entry)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, delta))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full(b"stsz", 0, 0, struct.pack(">II", 0, n)
                 + b"".join(struct.pack(">I", len(f)) for f in frames))
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, mdat_offset))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)

    url = _full(b"url ", 0, 1, b"")  # flag 1: media in this file
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + url)
    dinf = _box(b"dinf", dref)
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    minf = _box(b"minf", vmhd + dinf + stbl)

    mdhd = _full(b"mdhd", 0, 0, struct.pack(">IIIIHH", 0, 0, timescale,
                                            duration, 0x55C4, 0))
    hdlr = _full(b"hdlr", 0, 0, struct.pack(">I", 0) + b"vide"
                 + b"\x00" * 12 + b"VideoHandler\x00")
    mdia = _box(b"mdia", mdhd + hdlr + minf)

    tkhd = _full(b"tkhd", 0, 7, struct.pack(">IIII", 0, 0, 1, 0)
                 + struct.pack(">I", duration) + b"\x00" * 8
                 + struct.pack(">hhhh", 0, 0, 0, 0) + _IDENTITY_MATRIX
                 + struct.pack(">II", width << 16, height << 16))
    trak = _box(b"trak", tkhd + mdia)

    mvhd = _full(b"mvhd", 0, 0, struct.pack(">IIII", 0, 0, timescale,
                                            duration)
                 + struct.pack(">IHH", 0x00010000, 0x0100, 0)
                 + b"\x00" * 8 + _IDENTITY_MATRIX + b"\x00" * 24
                 + struct.pack(">I", 2))
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _iter_boxes(buf: memoryview, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        size = struct.unpack_from(">I", buf, pos)[0]
        btype = bytes(buf[pos + 4: pos + 8])
        body = pos + 8
        if size == 1:  # 64-bit largesize
            size = struct.unpack_from(">Q", buf, pos + 8)[0]
            body = pos + 16
        elif size == 0:  # box extends to end of file
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError("corrupt MP4 box structure")
        yield btype, body, pos + size
        pos += size


def _find_boxes(buf: memoryview, start: int, end: int, path: list) -> list:
    """Collect (body_start, body_end) of every box matching ``path``."""
    if not path:
        return [(start, end)]
    out = []
    for btype, body, nxt in _iter_boxes(buf, start, end):
        if btype == path[0]:
            out.extend(_find_boxes(buf, body, nxt, path[1:]))
    return out


def mp4_sample_table(payload: bytes) -> dict:
    """Parse the first video track's sample table.

    Returns ``{"offsets", "sizes", "ts_ms", "timescale"}`` — per-sample
    file byte ranges (NumPy int64) and decode timestamps in ms, derived
    from stsz / stco / co64 / stsc / stts / mdhd exactly as a demuxer
    would."""
    buf = memoryview(payload)
    stbls = _find_boxes(buf, 0, len(buf),
                        [b"moov", b"trak", b"mdia", b"minf", b"stbl"])
    if not stbls:
        raise ValueError("no sample table (moov/trak/mdia/minf/stbl)")
    a, b = stbls[0]
    boxes = {t: (s, e) for t, s, e in _iter_boxes(buf, a, b)}

    def full_body(btype):
        s, e = boxes[btype]
        return buf[s + 4: e]  # skip version/flags

    # sizes
    if b"stsz" in boxes:
        body = full_body(b"stsz")
        fixed, n = struct.unpack_from(">II", body, 0)
        if fixed:
            sizes = np.full(n, fixed, np.int64)
        else:
            sizes = np.frombuffer(body, ">u4", n, 8).astype(np.int64)
    else:
        raise ValueError("missing stsz")
    # chunk offsets
    if b"stco" in boxes:
        body = full_body(b"stco")
        nch = struct.unpack_from(">I", body, 0)[0]
        chunk_off = np.frombuffer(body, ">u4", nch, 4).astype(np.int64)
    elif b"co64" in boxes:
        body = full_body(b"co64")
        nch = struct.unpack_from(">I", body, 0)[0]
        chunk_off = np.frombuffer(body, ">u8", nch, 4).astype(np.int64)
    else:
        raise ValueError("missing stco/co64")
    # samples per chunk (stsc runs -> dense per-chunk array)
    body = full_body(b"stsc")
    nruns = struct.unpack_from(">I", body, 0)[0]
    runs = np.frombuffer(body, ">u4", nruns * 3, 4).astype(
        np.int64).reshape(-1, 3)
    first_chunks = runs[:, 0] - 1                  # 0-based
    run_end = np.concatenate([first_chunks[1:], [nch]])
    spc = np.repeat(runs[:, 1], run_end - first_chunks)
    if spc.sum() != len(sizes):
        spc = spc[: np.searchsorted(np.cumsum(spc), len(sizes)) + 1]
    # per-sample chunk index + offset within chunk
    chunk_of = np.repeat(np.arange(len(spc)), spc)[: len(sizes)]
    cs = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    chunk_first = np.concatenate([[0], np.cumsum(spc)[:-1]])
    offsets = chunk_off[chunk_of] + (cs - cs[chunk_first[chunk_of]])
    # timestamps
    body = full_body(b"stts")
    nruns = struct.unpack_from(">I", body, 0)[0]
    tt = np.frombuffer(body, ">u4", nruns * 2, 4).astype(
        np.int64).reshape(-1, 2)
    deltas = np.repeat(tt[:, 1], tt[:, 0])[: len(sizes)]
    ts = np.concatenate([[0], np.cumsum(deltas)[:-1]])
    mdhds = _find_boxes(buf, 0, len(buf), [b"moov", b"trak", b"mdia"])
    timescale = 1000
    for s, e in mdhds:
        for t, bs, be in _iter_boxes(buf, s, e):
            if t == b"mdhd":
                version = buf[bs]
                timescale = struct.unpack_from(
                    ">I", buf, bs + (20 if version else 12))[0]
                break
        break
    ts_ms = (ts * 1000) // timescale
    return {"offsets": offsets, "sizes": sizes, "ts_ms": ts_ms,
            "timescale": timescale}


def mp4_extract_samples(payload: bytes, indices: np.ndarray) -> list:
    """Byte payloads of the selected samples (frame extraction without
    decoding — the demuxer half of frame sampling)."""
    t = mp4_sample_table(payload)
    out = []
    for i in np.asarray(indices, dtype=np.int64):
        o, s = int(t["offsets"][i]), int(t["sizes"][i])
        out.append(payload[o: o + s])
    return out
