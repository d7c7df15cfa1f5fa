"""Streaming-shaped ingestion: stateful rollup over an ordered event log.

Ray Data is a batch engine with no event-time/watermark machinery, and a
``map_batches`` actor pool gives no ordering guarantee across batches. For
stream-shaped sources the guide's pattern applies: ONE raw Ray actor per
key-hash partition, fed batches in timestamp order; each actor keeps the
OPEN windows for its partition and emits a window only when the watermark
(max seen ts - allowed lateness) passes the window end. ``flush()`` at
end-of-stream emits the remainder.

This is the engine's raw-``@ray.remote`` exception (SURVEY §2.4: "drop to
raw actors only where the Dataset API can't express the semantics" —
ordered stateful consumption is exactly that case). The batch rollup and
this streaming rollup are equivalence-tested: same input, same aggregate
rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .stages.rollup import partial_rollup_batch

__all__ = ["StreamingRollup"]


def _actor_cls():
    import ray

    @ray.remote
    class _PartitionRollup:
        """Open-bucket state for one key-hash partition."""

        def __init__(self, window_us: int, lateness_us: int):
            self.window = window_us
            self.lateness = lateness_us
            self.open: dict = {}  # (series, bucket) -> [min,max,sum,n]
            self.max_ts = -(1 << 62)
            self.emitted = []
            # pinned by the first ingest (sum may widen vs min/max)
            self.val_types = {"min_y": pa.int64(), "max_y": pa.int64(),
                              "sum_y": pa.int64()}

        def ingest(self, batch: pa.Table) -> int:
            """Merge one (ts-ordered) chunk; emit buckets passed by the
            watermark. Returns number of rows emitted so far."""
            part = partial_rollup_batch(batch, self.window)
            self.val_types = {c: part.schema.field(c).type
                              for c in ("min_y", "max_y", "sum_y")}
            series = part["series_id"].to_pylist()
            buckets = part["bucket"].to_pylist()
            mn = part["min_y"].to_pylist()
            mx = part["max_y"].to_pylist()
            sm = part["sum_y"].to_pylist()
            n = part["n"].to_pylist()
            for i in range(part.num_rows):
                k = (series[i], buckets[i])
                st = self.open.get(k)
                if st is None:
                    self.open[k] = [mn[i], mx[i], sm[i], n[i]]
                else:
                    st[0] = min(st[0], mn[i])
                    st[1] = max(st[1], mx[i])
                    st[2] += sm[i]
                    st[3] += n[i]
            x = batch["x"].to_numpy(zero_copy_only=False)
            if len(x):
                self.max_ts = max(self.max_ts, int(x.max()))
            self._emit_closed()
            return len(self.emitted)

        def _emit_closed(self):
            watermark = self.max_ts - self.lateness
            done = [k for k in self.open if k[1] + self.window <= watermark]
            for k in sorted(done):
                st = self.open.pop(k)
                self.emitted.append((k[0], k[1], st[0], st[1], st[2], st[3]))

        def flush(self) -> pa.Table:
            for k in sorted(self.open):
                st = self.open.pop(k)
                self.emitted.append((k[0], k[1], st[0], st[1], st[2], st[3]))
            cols = list(zip(*self.emitted)) if self.emitted else [[]] * 6
            # value arrays get EXPLICIT types: an empty flush must share the
            # non-empty schema (pa.array([]) would infer null type and break
            # concat / parquet append downstream)
            return pa.table({
                "series_id": pa.array(cols[0], pa.string()),
                "bucket": pa.array(cols[1], pa.int64()),
                "min_y": pa.array(cols[2], self.val_types["min_y"]),
                "max_y": pa.array(cols[3], self.val_types["max_y"]),
                "sum_y": pa.array(cols[4], self.val_types["sum_y"]),
                "n": pa.array(cols[5], pa.int64()),
            })

    return _PartitionRollup


class StreamingRollup:
    """Driver-side coordinator: hash-routes ordered chunks to partition
    actors, collects finalized buckets at flush."""

    def __init__(self, window_us: int, *, partitions: int = 4,
                 lateness_us: int = 0):
        cls = _actor_cls()
        self.actors = [cls.remote(window_us, lateness_us)
                       for _ in range(partitions)]
        self.partitions = partitions

    def _route(self, batch: pa.Table):
        from .arrow_utils import stable_part_codes

        # stable crc32 hash (not PYTHONHASHSEED-randomized) -> reproducible
        # routing; str() admits non-string series keys; null-safe;
        # dictionary-encoded so only UNIQUE keys are hashed
        part = stable_part_codes(batch["series_id"], self.partitions)
        for p in range(self.partitions):
            mask = part == p
            if mask.any():
                yield p, batch.filter(pa.array(mask))

    def ingest(self, batch: pa.Table):
        import ray

        refs = [self.actors[p].ingest.remote(sub)
                for p, sub in self._route(batch)]
        ray.get(refs)  # preserve per-actor chunk ordering

    def flush(self) -> pa.Table:
        import ray

        tables = ray.get([a.flush.remote() for a in self.actors])
        non_empty = [t for t in tables if t.num_rows]
        # empty stream -> empty table with the schema, not a concat error
        return pa.concat_tables(non_empty) if non_empty else tables[0]
