"""SAX-style symbolic series representation: PAA (piecewise aggregate
approximation — fixed time windows, exact rational segment means) plus a
per-series integer-quartile alphabet. Each series becomes a short
string like ``"abddca"`` — the classic index/motif/similarity key for
time series (Lin et al., "Experiencing SAX", DMKD 2007).

The classic SAX z-normalizes and uses Gaussian breakpoints (floats);
this variant keeps every comparison in EXACT integer arithmetic so any
partitioning — and the SQL oracle — is bit-identical: with segment sum
``s`` over ``n`` points and the series' raw min/max ``gmin``/``gmax``,
the symbol is ``#{q in 1..A-1 : A·s >= (A·gmin + q·(gmax−gmin))·n}``
(i.e. which range-quantile band the rational mean ``s/n`` falls in,
decided by cross-multiplication). Bounds: ``A·max|y|·n`` per segment
must fit int64 — fine for cents-scale values up to ~1e14 point-window
products.

No counterpart in the reference (kernel library; SURVEY.md §2.4) — the
natural companion to its visual downsamplers for similarity search.

Scale shape: ONE hash(series) shuffle; each partition handles ALL its
series in one sorted vectorized pass (segment sums via reduceat,
per-series min/max via reduceat, symbol comparisons vectorized over
segments, and the output strings built ZERO-COPY — one byte per
segment, per-series offsets — via ``pa.StringArray.from_buffers``).
Assumes one series' rows fit a partition (the engine's per-series
contract).

SQL restatement: two GROUP BYs + the same integer comparisons +
``string_agg(chr(97+q), '' ORDER BY bucket)``."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ..arrow_utils import group_codes, make_add_part

__all__ = ["sax_symbols", "ordinal_patterns"]


def sax_symbols(ds, window_us: int, *, alphabet: int = 4,
                series_col: str = "series_id", x_col: str = "x",
                y_col: str = "y", num_partitions: int = 16):
    """Per series: ``(series_id, n_segments, sax)`` where ``sax`` is the
    window-ordered symbol string (alphabet 'a'… of size ``alphabet``,
    2..26). Empty windows simply don't appear (gap semantics match the
    no-interpolation SQL restatement)."""
    from ..arrow_utils import stable_part_codes

    if not 2 <= alphabet <= 26:
        raise ValueError("alphabet must be in [2, 26]")
    mod = num_partitions * 64
    a = int(alphabet)

    _add_part = make_add_part(series_col, mod)

    def _sax(g: pa.Table) -> pa.Table:
        sid_type = g[series_col].type
        empty = pa.table({
            "series_id": pa.array([], sid_type),
            "n_segments": pa.array([], pa.int64()),
            "sax": pa.array([], pa.string()),
        })
        if g.num_rows == 0:
            return empty
        t = g.take(pc.sort_indices(g, sort_keys=[
            (series_col, "ascending"), (x_col, "ascending")]))
        sid = t[series_col]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        enc = sid.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        x = t[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(y)
        bucket = (x // window_us) * window_us
        sheads = np.ones(n, dtype=bool)
        sheads[1:] = codes[1:] != codes[:-1]
        sstarts = np.flatnonzero(sheads)
        gmin = np.minimum.reduceat(y, sstarts)
        gmax = np.maximum.reduceat(y, sstarts)
        # segment (series, bucket) boundaries — buckets ascend in-series
        segheads = sheads.copy()
        segheads[1:] |= bucket[1:] != bucket[:-1]
        segstarts = np.flatnonzero(segheads)
        s = np.add.reduceat(y, segstarts)
        seg_n = np.diff(np.append(segstarts, n))
        # series index of each segment (series heads are segment heads)
        seg_series = np.cumsum(sheads[segstarts]) - 1
        lo = gmin[seg_series]
        rng = gmax[seg_series] - lo
        q = np.zeros(len(segstarts), dtype=np.int64)
        for k in range(1, a):
            q += (a * s >= (a * lo + k * rng) * seg_n).astype(np.int64)
        chars = (97 + q).astype(np.uint8)
        # zero-copy per-series strings: one byte per segment, offsets at
        # series boundaries over the segment-level array
        seg_sheads = np.ones(len(segstarts), dtype=bool)
        seg_sheads[1:] = seg_series[1:] != seg_series[:-1]
        ser_starts = np.flatnonzero(seg_sheads)
        n_segments = np.diff(np.append(ser_starts, len(segstarts)))
        offsets = np.append(ser_starts,
                            len(segstarts)).astype(np.int32)
        sax = pa.StringArray.from_buffers(
            len(ser_starts), pa.py_buffer(offsets.tobytes()),
            pa.py_buffer(chars.tobytes()))
        return pa.table({
            "series_id": enc.dictionary.take(
                pa.array(codes[segstarts[ser_starts]])),
            "n_segments": pa.array(n_segments),
            "sax": sax,
        })

    parted = ds.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _sax, batch_format="pyarrow")


def ordinal_patterns(rolled, *, series_col: str = "series_id",
                     bucket_col: str = "bucket", value_col: str = "sum_y",
                     num_partitions: int = 8):
    """Ordinal-pattern (permutation-entropy) histogram, order m = 3: for
    every run of three CONSECUTIVE rows of a series (in bucket order —
    calendar gaps do not break runs; gap-sensitive callers gap-fill
    first), the rank pattern of ``(v0, v1, v2)`` with ties broken by
    position (earlier index outranks on equality — the stable-argsort
    convention of Bandt & Pompe, PRL 88:174102 (2002)). Encoded as three
    comparison bits, each "is the earlier value <= the later" (the
    stable tie rule makes <= the exact ordering predicate):

        code = 4*(v0 <= v1) + 2*(v0 <= v2) + (v1 <= v2)   in {0..7}

    (codes 2 and 5 are excluded by transitivity — 6 reachable patterns,
    the 3! permutations). Output: one row per (series, code) with the
    exact int64 count ``n`` — the permutation-entropy histogram; the
    float entropy, if wanted, is one expression over it. Exact integers
    make any partitioning bit-identical, and the SQL replay is two
    ``lead()`` windows + the same three comparisons.

    Scale shape: ONE hash(series) shuffle; each partition sorts once by
    (series, bucket) and computes every window's code in one vectorized
    shift pass (series boundaries masked), then collapses to (series,
    code) counts with an Arrow group_by. Assumes one series' rollup rows
    fit a partition (the engine's per-series contract)."""
    from ..arrow_utils import stable_part_codes

    mod = num_partitions * 64

    _add_part = make_add_part(series_col, mod)

    def _patterns(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__part"])
        s_type = t[series_col].type
        empty = pa.table({series_col: pa.array([], s_type),
                          "pattern": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        if t.num_rows < 3:
            return empty
        t = t.take(pc.sort_indices(t, sort_keys=[
            (series_col, "ascending"), (bucket_col, "ascending")]))
        sid = t[series_col]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = group_codes(sid)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v0, v1, v2 = v[:-2], v[1:-1], v[2:]
        same = (codes[:-2] == codes[2:])  # run fully inside one series
        code = (4 * (v0 <= v1).astype(np.int64)
                + 2 * (v0 <= v2).astype(np.int64)
                + (v1 <= v2).astype(np.int64))
        keep = np.flatnonzero(same)
        if len(keep) == 0:
            return empty
        win = pa.table({series_col: sid.take(pa.array(keep)),
                        "pattern": pa.array(code[keep])})
        agg = win.group_by([series_col, "pattern"]).aggregate(
            [([], "count_all")])
        return pa.table({series_col: agg[series_col],
                         "pattern": agg["pattern"],
                         "n": pc.cast(agg["count_all"], pa.int64())})

    parted = rolled.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby(
        "__part").map_groups(_patterns, batch_format="pyarrow")
