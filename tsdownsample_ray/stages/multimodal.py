"""Multimodal columns: opaque ``binary`` payloads + typed metadata, with
decode / feature-extract / resize / frame-sample as actor-pool stages.

The container has no image/audio libraries, so the DECODE KERNELS ARE
STUBS: ``DecodeImage(fake=False)`` raises ``NotImplementedError`` at actor
construction (where a real build would import PIL/ffmpeg); ``fake=True``
substitutes a deterministic pseudo-decoder so the Ray-side plumbing —
schema, batch sizing, actor signature, output layout — is real and tested.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

__all__ = ["media_schema", "DecodeImage", "DecodeAudio", "ResizeImage",
           "SampleFrames"]


def media_schema() -> pa.Schema:
    """Canonical multimodal table schema: payloads stay opaque binary with
    typed metadata columns alongside (small batches upstream — a 100 KB
    payload x 4096-row default batch would blow worker heaps; callers pass
    batch_size<=256 for media stages)."""
    return pa.schema([
        ("media_id", pa.int64()),
        ("kind", pa.string()),            # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ])


def _pseudo_pixels(payload: bytes, h: int, w: int, c: int = 3) -> np.ndarray:
    """Deterministic fake decode: payload-seeded uint8 tensor."""
    seed = int.from_bytes(hashlib.blake2b(payload, digest_size=8).digest(), "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)


class DecodeImage:
    """binary payload -> flat uint8 pixel tensor + shape columns.

    Actor-pool stage: ``map_batches(DecodeImage(fake=True), batch_size=64,
    concurrency=N)``. Real decode would live in ``__init__``/``__call__``
    with the same signature.
    """

    def __init__(self, fake: bool = False):
        if not fake:
            raise NotImplementedError(
                "image decoding requires PIL/opencv, not present in this "
                "container — construct with fake=True for the deterministic "
                "stub decoder")
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        hs = batch["height"].to_pylist()
        ws = batch["width"].to_pylist()
        pixels = [
            _pseudo_pixels(p, h or 8, w or 8).reshape(-1)
            for p, h, w in zip(payloads, hs, ws)
        ]
        out = {n: batch[n] for n in batch.column_names if n != "payload"}
        out["pixels"] = pa.array([px.tolist() for px in pixels],
                                 type=pa.list_(pa.uint8()))
        return pa.table(out)


class ResizeImage:
    """Nearest-neighbor resize over the decoded pixel tensor (pure NumPy —
    real, not stubbed; operates on DecodeImage output)."""

    def __init__(self, out_h: int = 32, out_w: int = 32):
        self.out_h, self.out_w = out_h, out_w

    def __call__(self, batch: pa.Table) -> pa.Table:
        hs = batch["height"].to_pylist()
        ws = batch["width"].to_pylist()
        pix = batch["pixels"].to_pylist()
        out = []
        for h, w, p in zip(hs, ws, pix):
            h, w = h or 8, w or 8
            img = np.asarray(p, dtype=np.uint8).reshape(h, w, 3)
            yi = (np.arange(self.out_h) * h // self.out_h)
            xi = (np.arange(self.out_w) * w // self.out_w)
            out.append(img[yi][:, xi].reshape(-1).tolist())
        cols = {n: batch[n] for n in batch.column_names if n != "pixels"}
        cols["pixels"] = pa.array(out, type=pa.list_(pa.uint8()))
        cols = dict(cols, width=pa.array([self.out_w] * batch.num_rows, pa.int32()),
                    height=pa.array([self.out_h] * batch.num_rows, pa.int32()))
        return pa.table(cols)


class DecodeAudio:
    """binary payload -> mono f32 sample tensor + sample-rate metadata.
    Stubbed like DecodeImage (no audio libs in this container); the fake
    decoder is deterministic in the payload. Feature extraction downstream
    (e.g. the downsample kernels over the waveform) is real."""

    def __init__(self, fake: bool = False, sample_rate: int = 16_000):
        if not fake:
            raise NotImplementedError(
                "audio decoding requires soundfile/ffmpeg, not present in "
                "this container — construct with fake=True")
        self.sample_rate = sample_rate

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        durs = batch["duration_ms"].to_pylist()
        out = []
        for p, d in zip(payloads, durs):
            n = max(1, (d or 100) * self.sample_rate // 1000)
            n = min(n, 160_000)  # cap fake waveforms at 10 s
            seed = int.from_bytes(
                hashlib.blake2b(p, digest_size=8).digest(), "big")
            rng = np.random.default_rng(seed)
            out.append(rng.standard_normal(n).astype(np.float32).tolist())
        cols = {c: batch[c] for c in batch.column_names if c != "payload"}
        cols["samples"] = pa.array(out, type=pa.list_(pa.float32()))
        cols["sample_rate"] = pa.array([self.sample_rate] * batch.num_rows,
                                       pa.int32())
        return pa.table(cols)


class SampleFrames:
    """video payload -> every-nth frame timestamps (EveryNth over the time
    axis — the downsample kernels applied to media). Decode itself stubbed."""

    def __init__(self, n_frames: int = 16, fake: bool = False):
        if not fake:
            raise NotImplementedError(
                "video decoding requires ffmpeg, not present in this "
                "container — construct with fake=True")
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..kernels import everynth

        out = []
        for dur in batch["duration_ms"].to_pylist():
            ts = np.arange(0, max(dur or 0, 1), 40)  # 25 fps timeline
            idx = everynth(None, ts, self.n_frames)
            out.append(ts[idx.astype(np.intp)].tolist())
        cols = {n: batch[n] for n in batch.column_names if n != "payload"}
        cols["frame_ts_ms"] = pa.array(out, type=pa.list_(pa.int64()))
        return pa.table(cols)
