"""Chunk compression stage: rolled-up tier rows -> Gorilla-compressed chunk
rows, and back.

Actor-pool ``map_batches`` stages (state: codec config; at real scale an
actor would also hold open chunk buffers per partition — here chunks close
at batch boundaries, which keeps the stage deterministic and restartable:
a chunk is a function of its input batch alone).

Chunk row schema:
  (series_id, start_bucket, n_points, ts_blob, blob_<col>...)

Bucket timestamps use delta-of-delta (regular windows -> ~1 bit/point);
value columns use XOR compression of their raw 64-bit words (int64 and
float64 both bit-exact). Partitioning assumption: input batches arrive
grouped (or at least runs-sorted) by series — the compressor sorts its
batch by (series_id, bucket) and emits one chunk run per batch-local
series segment.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..arrow_utils import group_codes, make_add_part
from ..functions.gorilla import (
    decode_timestamps,
    decode_values,
    encode_timestamps,
    encode_values,
)

__all__ = ["ChunkCompressor", "ChunkDecompressor",
           "compress_chunks_per_series", "deadband_filter",
           "simple8b_pack", "S8B_COUNTS", "mtf_score", "bwt_stats"]

_F64 = "f8"
_I64 = "i8"


def _as_words(arr: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(arr).view(np.uint64)


class ChunkCompressor:
    def __init__(self, value_cols: dict[str, str] | None = None,
                 *, series_col: str = "series_id", x_col: str = "bucket",
                 chunk_size: int = 1024):
        # value_cols: name -> 'i8' | 'f8' (decode dtype)
        self.value_cols = value_cols or {"min_y": _I64, "max_y": _I64,
                                         "sum_y": _I64, "n": _I64,
                                         "mean_y": _F64}
        self.series_col = series_col
        self.x_col = x_col
        self.chunk_size = chunk_size

    def __call__(self, batch: pa.Table) -> pa.Table:
        idx = pc.sort_indices(batch, sort_keys=[(self.series_col, "ascending"),
                                                (self.x_col, "ascending")])
        batch = batch.take(idx)
        series = batch[self.series_col].to_numpy(zero_copy_only=False)
        x = batch[self.x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        vals = {
            c: batch[c].to_numpy(zero_copy_only=False).astype(
                np.int64 if dt == _I64 else np.float64
            )
            for c, dt in self.value_cols.items()
        }

        out = {
            "series_id": [], "start_bucket": [], "n_points": [], "ts_blob": [],
        }
        for c in self.value_cols:
            out[f"blob_{c}"] = []

        # series run boundaries within the sorted batch
        change = np.flatnonzero(series[1:] != series[:-1]) + 1
        run_starts = np.concatenate(([0], change, [len(series)]))
        for a, b in zip(run_starts[:-1], run_starts[1:]):
            for lo in range(a, b, self.chunk_size):
                hi = min(lo + self.chunk_size, b)
                out["series_id"].append(series[lo])
                out["start_bucket"].append(int(x[lo]))
                out["n_points"].append(hi - lo)
                out["ts_blob"].append(encode_timestamps(x[lo:hi]))
                for c in self.value_cols:
                    out[f"blob_{c}"].append(encode_values(_as_words(vals[c][lo:hi])))

        return pa.table({
            "series_id": pa.array(out["series_id"], pa.string()),
            "start_bucket": pa.array(out["start_bucket"], pa.int64()),
            "n_points": pa.array(out["n_points"], pa.int32()),
            "ts_blob": pa.array(out["ts_blob"], pa.binary()),
            **{f"blob_{c}": pa.array(out[f"blob_{c}"], pa.binary())
               for c in self.value_cols},
        })


def compress_chunks_per_series(ds, value_cols: dict[str, str] | None = None,
                               *, series_col: str = "series_id",
                               x_col: str = "bucket", chunk_size: int = 1024):
    """CANONICAL chunking: group by series first, then chunk each whole
    series in fixed ``chunk_size`` runs. Unlike the batch-local compressor,
    the chunk layout is a pure function of the DATA (not of block
    boundaries), so a resumed or re-partitioned run reproduces byte-
    identical chunk rows — the strongest idempotence story for the chunk
    store. Costs one series-keyed shuffle; used on rolled-up tier rows
    where that shuffle is tiny."""
    comp = ChunkCompressor(value_cols, series_col=series_col, x_col=x_col,
                           chunk_size=chunk_size)

    def _compress_group(g: pa.Table) -> pa.Table:
        return comp(g)

    return ds.groupby(series_col).map_groups(_compress_group,
                                             batch_format="pyarrow")


class ChunkDecompressor:
    def __init__(self, value_cols: dict[str, str] | None = None,
                 *, series_col: str = "series_id", x_col: str = "bucket"):
        self.value_cols = value_cols or {"min_y": _I64, "max_y": _I64,
                                         "sum_y": _I64, "n": _I64,
                                         "mean_y": _F64}
        self.series_col = series_col
        self.x_col = x_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        series_out, x_out = [], []
        val_out = {c: [] for c in self.value_cols}
        sids = batch["series_id"].to_pylist()
        ts_blobs = batch["ts_blob"].to_pylist()
        for i, sid in enumerate(sids):
            ts = decode_timestamps(ts_blobs[i])
            x_out.append(ts)
            series_out.extend([sid] * len(ts))
            for c, dt in self.value_cols.items():
                words = decode_values(batch[f"blob_{c}"][i].as_py())
                val_out[c].append(words.view(np.int64 if dt == _I64 else np.float64))
        x_all = np.concatenate(x_out) if x_out else np.empty(0, np.int64)
        cols = {
            self.series_col: pa.array(series_out, pa.string()),
            self.x_col: pa.array(x_all, pa.int64()),
        }
        for c, dt in self.value_cols.items():
            v = np.concatenate(val_out[c]) if val_out[c] else np.empty(
                0, np.int64 if dt == _I64 else np.float64)
            cols[c] = pa.array(v)
        return pa.table(cols)


def compact_chunks(chunks_ds, value_cols: dict[str, str] | None = None,
                   *, series_col: str = "series_id", x_col: str = "bucket",
                   chunk_size: int = 4096, num_partitions: int = 8):
    """Chunk-store compaction: many small chunks per series (the natural
    output of batch-boundary closes and incremental backfills) -> few
    ``chunk_size``-point chunks, losslessly. The maintenance job every
    Gorilla-style store runs continuously.

    Scale shape: ONE hash(series) shuffle, then per partition decode ->
    sort by (series, bucket) -> re-encode with the canonical fixed-run
    chunker; Python cost is per CHUNK (codec framing), never per point
    (the bit codecs are vectorized). Output layout is a pure function of
    the data (same idempotence contract as
    ``compress_chunks_per_series``), so re-running compaction is a
    no-op byte-for-byte."""
    from ..arrow_utils import stable_part_codes

    mod = num_partitions * 64
    dec = ChunkDecompressor(value_cols, series_col=series_col, x_col=x_col)
    comp = ChunkCompressor(value_cols, series_col=series_col, x_col=x_col,
                           chunk_size=chunk_size)

    _add_part = make_add_part(series_col, mod)

    def _compact(g: pa.Table) -> pa.Table:
        # empty groups flow through the codec pair as typed empties
        return comp(dec(g.drop_columns(["__part"])))

    parted = chunks_ds.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _compact, batch_format="pyarrow")


def deadband_filter(ds, *, delta: int, series_col: str = "series_id",
                    x_col: str = "x", y_col: str = "y",
                    order_cols: tuple = ("x",), num_partitions: int = 8):
    """Dead-band / report-by-exception compression (the industrial
    historian's ingest filter, e.g. PI compression's simpler cousin):
    per series in time order, a point is EMITTED iff its value differs
    from the LAST EMITTED value by more than ``delta`` (the first point
    always emits). The emitted subset reconstructs the series within a
    +-delta band under last-observation-carried-forward.

    The recurrence's state (last emitted value) jumps data-dependently,
    so unlike ``clamped_balance``/``token_bucket`` there is no prefix
    identity — the per-series pass advances emission-to-emission, each
    hop one vectorized scan of the remaining tail (O(n * emitted); cheap
    exactly when compression is effective, and bounded by the tier-row
    per-series contract). Parallel across series via one hash shuffle.

    Output: the emitted rows ``(series_id, x, y)`` — exact int64,
    SQL-replayable by a recursive CTE walking each series row by row.
    """
    from ..arrow_utils import stable_part_codes

    mod = num_partitions * 64

    _add_part = make_add_part(series_col, mod)

    def _emit_mask(y: np.ndarray) -> np.ndarray:
        n = len(y)
        keep = np.zeros(n, dtype=bool)
        if n == 0:
            return keep
        keep[0] = True
        e = 0
        while True:
            tail = np.abs(y[e + 1:] - y[e]) > delta
            hit = int(np.argmax(tail)) if tail.any() else -1
            if hit < 0:
                return keep
            e = e + 1 + hit
            keep[e] = True

    def _filter(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        s_type = t[series_col].type
        empty = pa.table({"series_id": pa.array([], s_type),
                          "x": pa.array([], pa.int64()),
                          "y": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        sort_keys = [(series_col, "ascending")] + [
            (c, "ascending") for c in order_cols]
        t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
        sid = t[series_col]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = group_codes(sid)
        x = t[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        heads = np.ones(len(codes), dtype=bool)
        heads[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(heads)
        ends = np.r_[starts[1:], len(codes)]
        keep = np.zeros(len(codes), dtype=bool)
        for f, l in zip(starts, ends):  # series loop
            keep[f:l] = _emit_mask(y[f:l])
        idx = pa.array(np.flatnonzero(keep))
        return pa.table({"series_id": sid.take(idx),
                         "x": pa.array(x[keep]),
                         "y": pa.array(y[keep])})

    parted = ds.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _filter, batch_format="pyarrow")


def sdt_compress(ds, *, dev: int, series_col: str = "series_id",
                 x_col: str = "x", y_col: str = "y", x_div: int = 1,
                 num_partitions: int = 8):
    """Swinging-door trending (SDT) compression — the classic
    industrial-historian codec (Bristol, ISA 1990; OSIsoft PI's
    compression step; the stateful big sibling of
    :func:`deadband_filter`): per series in time order, a point is
    RETAINED when the swinging doors collapse. The doors are the
    running max of the lower-pivot slopes ``(y_i - dev - a_y)/(x_i -
    a_x)`` and the running min of the upper-pivot slopes ``(y_i + dev
    - a_y)/(x_i - a_x)`` since the current anchor ``a``; when max-low
    exceeds min-high, no single segment from the anchor can cover every
    point within ``+-dev``, so the PREVIOUS point is emitted as the new
    anchor and the doors reset against it from the current point. The
    first and last points of every series always emit. Guarantee (the
    classic emit-actual-points PI variant): while the doors stay open,
    SOME line from the anchor passes within ``+-dev`` of every covered
    point; interpolating between the retained points themselves is
    within ``dev + 2*dev*(dx_j/dx_prev) < 3*dev`` of every original
    sample (both slopes sit in the prev point's door interval of width
    ``2*dev/dx_prev``).

    All comparisons are EXACT integer cross-multiplications of slope
    rationals (denominators positive since x strictly increases per
    series) — no floats, so a recursive-CTE DuckDB oracle replays the
    walk bit-identically. Slopes are computed on ``x // x_div`` (pass
    ``x_div=1_000_000`` to compare on whole seconds when x is in
    microseconds: 15-minute buckets are exact second multiples, and it
    keeps every cross product |y +- dev - a_y| * (x - a_x) far inside
    int64). Overflow contract: ``max|y - a_y + dev| * max(x_span //
    x_div)`` must fit int64.

    Scale shape: ONE hash(series) shuffle, per-partition sort, then a
    sequential per-series walk over TIER rows only (the recurrence's
    door state jumps data-dependently — same inherent-chain contract
    as ``deadband_filter`` / ``holt_winters_fixed_point``). Output:
    the retained rows ``(series_id, x, y)`` with x in original units.
    """
    mod = num_partitions * 64
    _add_part = make_add_part(series_col, mod)

    def _walk(xs: list, ys: list, keep: np.ndarray, base: int) -> None:
        n = len(xs)
        keep[base] = True
        if n <= 1:
            return
        ax, ay = xs[0], ys[0]
        lo_n = lo_d = hi_n = hi_d = 0
        fresh = True
        for i in range(1, n):
            d = xs[i] - ax
            nlo = ys[i] - dev - ay
            nhi = ys[i] + dev - ay
            if fresh:
                lo_n, lo_d, hi_n, hi_d = nlo, d, nhi, d
                fresh = False
            else:
                if nlo * lo_d > lo_n * d:
                    lo_n, lo_d = nlo, d
                if nhi * hi_d < hi_n * d:
                    hi_n, hi_d = nhi, d
                if lo_n * hi_d > hi_n * lo_d:  # doors collapsed
                    keep[base + i - 1] = True
                    ax, ay = xs[i - 1], ys[i - 1]
                    d = xs[i] - ax
                    lo_n, lo_d = ys[i] - dev - ay, d
                    hi_n, hi_d = ys[i] + dev - ay, d
        keep[base + n - 1] = True

    def _filter(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        s_type = t[series_col].type
        empty = pa.table({"series_id": pa.array([], s_type),
                          "x": pa.array([], pa.int64()),
                          "y": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        t = t.take(pc.sort_indices(t, sort_keys=[
            (series_col, "ascending"), (x_col, "ascending")]))
        sid = t[series_col]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = group_codes(sid)
        x = t[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        xs_div = (x // x_div).tolist()  # python ints for the walk
        ys = y.tolist()
        heads = np.ones(len(codes), dtype=bool)
        heads[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(heads)
        ends = np.r_[starts[1:], len(codes)]
        keep = np.zeros(len(codes), dtype=bool)
        for f, l in zip(starts, ends):  # series loop
            _walk(xs_div[f:l], ys[f:l], keep, int(f))
        idx = pa.array(np.flatnonzero(keep))
        return pa.table({"series_id": sid.take(idx),
                         "x": pa.array(x[keep]),
                         "y": pa.array(y[keep])})

    parted = ds.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _filter, batch_format="pyarrow")


def for_bitpack_frames(rolled, *, frame: int = 128,
                       series_col: str = "series_id",
                       order_col: str = "bucket",
                       value_col: str = "sum_y",
                       num_partitions: int = 8):
    """Frame-of-reference (FOR) bit-packing audit over tier values —
    the classic columnar integer codec (Parquet/ORC/Gorilla-adjacent):
    per ``frame`` consecutive buckets of a series, values re-base to
    the frame minimum and pack at ``bits = bit_length(max - min)``
    (1 for an all-constant frame, matching SQL ``length(bin(x))``).
    Each frame is REALLY packed and unpacked (np shift matrix ->
    ``packbits`` -> decode) and the roundtrip is asserted inside the
    task — the emitted manifest row (n, min_v, bits, packed_bytes,
    sum_delta) is what a chunk-store write-path would persist.

    Scale shape: ONE hash(series) shuffle, per-partition sort, all
    frames of all series in one vectorized pass (frame ids from
    per-series ranks; per-frame min/max/sum via ``np.minimum.at`` /
    reduceat-free scatters). Only manifest rows leave the task."""
    from ..arrow_utils import group_codes, make_add_part

    if frame < 1:
        raise ValueError(f"frame must be >= 1, got {frame}")
    mod = num_partitions * 64
    _add_part = make_add_part(series_col, mod)

    def _frames(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        s_type = t[series_col].type
        if t.num_rows == 0:
            return pa.table({"series_id": pa.array([], s_type),
                             "frame": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "min_v": pa.array([], pa.int64()),
                             "bits": pa.array([], pa.int64()),
                             "packed_bytes": pa.array([], pa.int64()),
                             "sum_delta": pa.array([], pa.int64())})
        t = t.take(pc.sort_indices(t, sort_keys=[
            (series_col, "ascending"), (order_col, "ascending")]))
        sid = t[series_col]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = group_codes(sid)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(v)
        i = np.arange(n)
        brk = np.ones(n, dtype=bool)
        brk[1:] = codes[1:] != codes[:-1]
        ser_start = np.maximum.accumulate(np.where(brk, i, 0))
        fr = (i - ser_start) // frame
        # dense frame key: new key wherever series or frame changes
        newk = brk.copy()
        newk[1:] |= fr[1:] != fr[:-1]
        key = np.cumsum(newk) - 1
        n_keys = int(key[-1]) + 1
        cnt = np.bincount(key, minlength=n_keys)
        mn = np.full(n_keys, np.iinfo(np.int64).max, np.int64)
        np.minimum.at(mn, key, v)
        mx = np.full(n_keys, np.iinfo(np.int64).min, np.int64)
        np.maximum.at(mx, key, v)
        sm = np.zeros(n_keys, np.int64)
        np.add.at(sm, key, v)
        width = mx - mn
        bits = np.maximum(1, np.frexp(width.astype(np.float64))[1])
        # frexp's float exponent can round a 2^k - 1 boundary up; pin
        # exactly like the HLL rank fix: bits is the smallest b with
        # width < 2^b (width >> b == 0), floor-corrected by shift check
        over = (width >> np.minimum(bits, 63).astype(np.int64)) != 0
        bits[over] += 1
        under = (bits > 1) & ((width >> (bits - 1)) == 0)
        bits[under] -= 1
        bits = np.maximum(1, bits).astype(np.int64)
        packed_bytes = (cnt * bits + 7) // 8
        # REAL roundtrip on the partition's deltas, all frames at once:
        # delta -> (n, 64) bit matrix -> slice each row to its frame's
        # bit width via a mask gather -> packbits -> decode -> compare
        delta = v - mn[key]
        rb = bits[key]
        bitmat = ((delta[:, None] >> np.arange(63, -1, -1)[None, :])
                  & 1).astype(np.uint8)
        keep = np.arange(64)[None, :] >= (64 - rb)[:, None]
        stream = bitmat[keep]  # concatenated big-endian fields
        packed = np.packbits(stream)  # the actual byte stream
        stream = np.unpackbits(packed)[:len(stream)]
        ends = np.cumsum(rb)
        starts = ends - rb
        w = np.arange(64)
        gath = starts[:, None] + w[None, :]
        valid = w[None, :] < rb[:, None]
        fields = np.zeros((n, 64), np.uint8)
        fields[valid] = stream[gath[valid]]
        dec = (fields.astype(np.int64)
               * (np.int64(1) << np.maximum(rb[:, None] - 1 - w, 0))
               * valid).sum(axis=1)
        if not np.array_equal(dec, delta):
            raise AssertionError("FOR bit-pack roundtrip mismatch")
        firsts = np.flatnonzero(newk)
        return pa.table({
            "series_id": sid.take(pa.array(firsts)),
            "frame": pa.array(fr[firsts]),
            "n": pa.array(cnt.astype(np.int64)),
            "min_v": pa.array(mn),
            "bits": pa.array(bits),
            "packed_bytes": pa.array(packed_bytes.astype(np.int64)),
            "sum_delta": pa.array(sm - cnt * mn)})

    parted = rolled.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _frames, batch_format="pyarrow")


def rle_stats_per_series(ds, *, series_col: str = "series_id",
                         x_col: str = "x", y_col: str = "y",
                         tiebreak_col: str | None = None,
                         num_partitions: int = 8):
    """Run-length encode each series' value stream (ordered by
    ``x_col`` then ``tiebreak_col``) and emit per-series codec stats —
    the RLE member of the codec family (gorilla XOR, delta-of-delta,
    FOR bit-pack, varint, huffman all live on their own rows):

        (series_id, n_points, n_runs, max_run, head_checksum)

    ``head_checksum = sum(run_value * run_index)`` (1-based run index)
    is position-sensitive, so any reordering or mis-split of runs
    changes it. The encode is verified in-stage: ``np.repeat(values,
    lengths)`` must reproduce the sorted input exactly (roundtrip
    assert, same discipline as the gorilla/FOR stages).

    Scale shape: ONE hash(series) shuffle; runs are found with one
    vectorized boundary diff over the partition's concatenated series
    (series heads always open a run)."""
    mod = num_partitions * 64
    _add_part = make_add_part(series_col, mod)

    def _rle(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        s_type = t[series_col].type
        if t.num_rows == 0:
            return pa.table({
                "series_id": pa.array([], s_type),
                "n_points": pa.array([], pa.int64()),
                "n_runs": pa.array([], pa.int64()),
                "max_run": pa.array([], pa.int64()),
                "head_checksum": pa.array([], pa.int64())})
        keys = [(series_col, "ascending"), (x_col, "ascending")]
        if tiebreak_col:
            keys.append((tiebreak_col, "ascending"))
        t = t.take(pc.sort_indices(t, sort_keys=keys))
        sid = t[series_col]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = group_codes(sid)
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(y)
        head = np.ones(n, dtype=bool)
        head[1:] = (codes[1:] != codes[:-1]) | (y[1:] != y[:-1])
        starts = np.flatnonzero(head)
        run_len = np.diff(np.r_[starts, n])
        run_val = y[starts]
        if not np.array_equal(np.repeat(run_val, run_len), y):
            raise AssertionError("RLE roundtrip mismatch")
        run_sid = codes[starts]
        shead = np.ones(len(starts), dtype=bool)
        shead[1:] = run_sid[1:] != run_sid[:-1]
        # 1-based run index within each series
        gidx = np.arange(len(starts), dtype=np.int64)
        base = np.maximum.accumulate(np.where(shead, gidx, -1))
        ridx = gidx - base + 1
        sfirst = np.flatnonzero(shead)
        per = np.diff(np.r_[sfirst, len(starts)])
        seg = np.repeat(np.arange(len(sfirst)), per)
        n_runs = per.astype(np.int64)
        n_points = np.zeros(len(sfirst), np.int64)
        np.add.at(n_points, seg, run_len)
        max_run = np.zeros(len(sfirst), np.int64)
        np.maximum.at(max_run, seg, run_len)
        checksum = np.zeros(len(sfirst), np.int64)
        np.add.at(checksum, seg, run_val * ridx)
        return pa.table({
            "series_id": sid.take(pa.array(starts[sfirst])),
            "n_points": pa.array(n_points),
            "n_runs": pa.array(n_runs),
            "max_run": pa.array(max_run),
            "head_checksum": pa.array(checksum)})

    parted = ds.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _rle, batch_format="pyarrow")


# Simple8b selector ladder (count, bits = 60 // count): greedy
# largest-count-first packing of zigzag deltas into 60-bit payloads.
# The 240/120 all-zero run selectors of the original are omitted
# (bits >= 1 here) so every value occupies at least one bit — a
# documented simplification that keeps the SQL replay a pure
# window-max + recursive walk.
S8B_COUNTS = (60, 30, 20, 15, 12, 10, 8, 7, 6, 5, 4, 3, 2, 1)


def simple8b_pack(rolled, *, series_col: str = "series_id",
                  order_col: str = "bucket", value_col: str = "sum_y",
                  num_partitions: int = 8):
    """Simple8b-style integer packing of each series' zigzag deltas
    (Anh & Moffat 2010; the codec behind InfluxDB/Prometheus integer
    blocks): per series ordered by ``order_col``, ``d_i = y_i -
    y_{i-1}`` (first delta vs 0), ``v_i = zigzag(d_i)``, then greedy
    largest-count-first packing — a word takes the biggest selector
    count ``c`` (ladder :data:`S8B_COUNTS`) such that ``c`` values
    remain and they all fit ``60 // c`` bits. Values >= 2^60 raise
    (out of the codec's domain).

    Every word is decode-verified in the task (shift/mask extraction
    must reproduce the values) before it is emitted — the same
    roundtrip-inside-the-task contract as the Gorilla and FOR-bitpack
    stages. Output per word: ``(series_id, word_idx, start_pos, cnt,
    bits, payload)`` — all exact int64 (payload < 2^60), replayed in
    SQL by 14 window maxima + one recursive walk.

    Scale shape: ONE hash(series) shuffle, per-partition sort; the 14
    sliding-window maxima are vectorized; the only Python loop is the
    per-WORD greedy walk (output-sized, ~n/avg_count iterations)."""
    mod = num_partitions * 64

    _add_part = make_add_part(series_col, mod)

    counts = S8B_COUNTS
    bits_of = {c: 60 // c for c in counts}
    lim_of = {c: np.int64(1) << np.int64(60 // c) for c in counts}

    def _pack(g: pa.Table) -> pa.Table:
        sid_type = g[series_col].type
        empty = pa.table({"series_id": pa.array([], sid_type),
                          "word_idx": pa.array([], pa.int64()),
                          "start_pos": pa.array([], pa.int64()),
                          "cnt": pa.array([], pa.int64()),
                          "bits": pa.array([], pa.int64()),
                          "payload": pa.array([], pa.int64())})
        t = g.drop_columns(["__part"])
        if t.num_rows == 0:
            return empty
        t = t.take(pc.sort_indices(t, sort_keys=[
            (series_col, "ascending"), (order_col, "ascending")]))
        sid = t[series_col]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = group_codes(sid)
        y = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(y)
        change = np.ones(n, dtype=bool)
        change[1:] = codes[1:] != codes[:-1]
        seg_first = np.flatnonzero(change)
        seg_len = np.diff(np.r_[seg_first, n])
        out = {k: [] for k in ("sid", "w", "s", "c", "b", "p")}
        for si, f0 in enumerate(seg_first):
            m = int(seg_len[si])
            ys = y[f0:f0 + m]
            d = np.empty(m, np.int64)
            d[0] = ys[0]
            d[1:] = ys[1:] - ys[:-1]
            v = np.where(d >= 0, 2 * d, -2 * d - 1).astype(np.int64)
            if (v < 0).any() or (v >= (np.int64(1) << np.int64(60))).any():
                raise ValueError("simple8b: value out of 60-bit domain")
            # sliding-window maxima per selector count (vectorized)
            wmax = {}
            for c in counts:
                if c <= m:
                    wmax[c] = np.max(
                        np.lib.stride_tricks.sliding_window_view(v, c),
                        axis=1)
            pos, widx = 0, 0
            svec = sid[int(f0)].as_py()
            while pos < m:
                for c in counts:
                    if pos + c <= m and wmax[c][pos] < lim_of[c]:
                        break
                else:
                    c = 1  # unreachable: c=1 always fits (v < 2^60)
                b = bits_of[c]
                chunk = v[pos:pos + c]
                shifts = (b * np.arange(c, dtype=np.int64))
                payload = int((chunk << shifts).sum())
                # decode-verify: shift/mask must reproduce the chunk
                mask = (1 << b) - 1
                back = (payload >> shifts) & mask
                if not np.array_equal(back, chunk):
                    raise AssertionError("simple8b roundtrip failed")
                out["sid"].append(svec)
                out["w"].append(widx)
                out["s"].append(pos + 1)   # 1-based, matching the SQL
                out["c"].append(c)
                out["b"].append(b)
                out["p"].append(payload)
                pos += c
                widx += 1
        return pa.table({
            "series_id": pa.array(out["sid"], sid_type),
            "word_idx": pa.array(out["w"], pa.int64()),
            "start_pos": pa.array(out["s"], pa.int64()),
            "cnt": pa.array(out["c"], pa.int64()),
            "bits": pa.array(out["b"], pa.int64()),
            "payload": pa.array(out["p"], pa.int64())})

    parted = rolled.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _pack, batch_format="pyarrow")


def mtf_score(ds, alphabet: list, *, key_col: str = "user_id",
              sym_col: str = "sym", order_cols: tuple = ("x", "tie"),
              num_partitions: int = 8):
    """Move-to-front coding score per key (Bentley et al. 1986 — the
    BWT/bzip2 second stage): the symbol list starts as the sorted
    ``alphabet``; each symbol in the key's ordered sequence emits its
    current 0-based list position and moves to front. Lower total =
    more clustered symbol usage. Output per key:
    ``(key, n, mtf_sum, mtf_max)`` — all exact int64.

    ``alphabet`` must cover every symbol (the caller derives it from a
    bounded global distinct — the event-type domain). Per-key the
    codec is inherently sequential (list state), like the ADPCM /
    Gorilla walks: a per-ROW Python loop over a small-int codes array
    with an O(|alphabet|) list update — run it on bounded sequences
    and a bounded alphabet. ONE hash(key) shuffle."""
    from ..arrow_utils import group_codes

    mod = num_partitions * 64
    alpha = sorted(alphabet)
    sym_to_code = {s: i for i, s in enumerate(alpha)}

    _add_part = make_add_part(key_col, mod)

    def _mtf(g: pa.Table) -> pa.Table:
        key_type = g[key_col].type
        empty = pa.table({key_col: pa.array([], key_type),
                          "n": pa.array([], pa.int64()),
                          "mtf_sum": pa.array([], pa.int64()),
                          "mtf_max": pa.array([], pa.int64())})
        t = g.drop_columns(["__part"])
        if t.num_rows == 0:
            return empty
        sort_keys = [(key_col, "ascending")] + [
            (c, "ascending") for c in order_cols]
        t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
        keys = t[key_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        codes = group_codes(keys)
        syms = t[sym_col].to_pylist()
        n = len(syms)
        change = np.ones(n, dtype=bool)
        change[1:] = codes[1:] != codes[:-1]
        seg_first = np.flatnonzero(change)
        seg_len = np.diff(np.r_[seg_first, n])
        out = {k: [] for k in ("key", "n", "s", "m")}
        for si, f0 in enumerate(seg_first):
            m = int(seg_len[si])
            lst = list(range(len(alpha)))
            tot = 0
            mx = 0
            for sym in syms[f0:f0 + m]:
                c = sym_to_code[sym]
                pos = lst.index(c)
                tot += pos
                if pos > mx:
                    mx = pos
                if pos:
                    del lst[pos]
                    lst.insert(0, c)
            out["key"].append(keys[int(f0)].as_py())
            out["n"].append(m)
            out["s"].append(tot)
            out["m"].append(mx)
        return pa.table({key_col: pa.array(out["key"], key_type),
                         "n": pa.array(out["n"], pa.int64()),
                         "mtf_sum": pa.array(out["s"], pa.int64()),
                         "mtf_max": pa.array(out["m"], pa.int64())})

    parted = ds.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _mtf, batch_format="pyarrow")


def bwt_stats(ds, *, id_col: str = "doc_id", text_col: str = "text",
              sentinel: str = "~", max_chars: int = 400,
              modulus: int = 7, num_partitions: int = 8):
    """Burrows-Wheeler transform statistics per document (Burrows &
    Wheeler 1994 — the bzip2 first stage; with the catalog's
    ``mtf_score`` this completes the BWT->MTF->RLE story): for every
    selected doc (deterministic subset ``doc_id % modulus == 0`` and
    length <= ``max_chars`` — the rotation sort is O(n^2 log n) BY
    DEFINITION, so the contract bounds n), append the sentinel, sort
    all rotations (codepoint order — UTF-8 byte order, identical in
    numpy/Python/DuckDB), take the last column. Output per doc:
    ``(doc_id, n, bwt_hash, runs_text, runs_bwt)`` — the md5-u64
    fingerprint of the transform (KMV storage convention) and the
    run-count drop that makes BWT compress (runs_bwt <= runs_text on
    clustered text). Contract: ``sentinel`` must not occur in the
    text (validated; raises).

    Scale shape: embarrassingly parallel per doc — no shuffle at all;
    the bounded-length subset keeps per-doc work constant."""
    from .dedup import _stable_u64

    def _bwt(b: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64()),
                          "bwt_hash": pa.array([], pa.int64()),
                          "runs_text": pa.array([], pa.int64()),
                          "runs_bwt": pa.array([], pa.int64())})
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = b[text_col].to_pylist()
        out = {k: [] for k in ("id", "n", "h", "rt", "rb")}
        for d, s in zip(ids, texts):
            if d % modulus != 0 or s is None or len(s) > max_chars:
                continue
            if sentinel in s:
                raise ValueError("bwt_stats: sentinel occurs in text")
            s2 = s + sentinel
            n = len(s2)
            order = sorted(range(n), key=lambda i: s2[i:] + s2[:i])
            bwt = "".join(s2[(i - 1) % n] for i in order)
            rt = 1 + sum(1 for j in range(1, len(s2))
                         if s2[j] != s2[j - 1]) if len(s2) else 0
            rb = 1 + sum(1 for j in range(1, n) if bwt[j] != bwt[j - 1])
            out["id"].append(int(d))
            out["n"].append(n)
            out["h"].append(_stable_u64(bwt.encode()) - (1 << 63))
            out["rt"].append(rt)
            out["rb"].append(rb)
        if not out["id"]:
            return empty
        return pa.table({"doc_id": pa.array(out["id"], pa.int64()),
                         "n": pa.array(out["n"], pa.int64()),
                         "bwt_hash": pa.array(out["h"], pa.int64()),
                         "runs_text": pa.array(out["rt"], pa.int64()),
                         "runs_bwt": pa.array(out["rb"], pa.int64())})

    return ds.map_batches(_bwt, batch_format="pyarrow")
