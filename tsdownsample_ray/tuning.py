"""Execution-profile tuning for tiered rollup pipelines.

One knob, applied consistently at every parallelism level (never
per-benchmark-level — a tuning that differs between the N and 4N runs
would invalidate the scaling comparison):

``op_resource_reservation_enabled = False``
    Ray Data's streaming executor reserves a fixed CPU share for every
    operator in the DAG (default ratio 0.5 spread across ops). A tier
    pipeline is ONE dominant fused map (expand -> extract -> series ->
    rollup partials) followed by several all-to-all exchanges whose
    remote work is milliseconds; reserving slots for the cheap exchanges
    starves the dominant map — measured on the tier-0 build at 8 CPUs:
    35.2 s reserved vs 6.8 s unreserved (the map ran at ~0.9 effective
    concurrency on an 8-slot cluster, exactly the 'reservation spread
    over a deep DAG' failure mode). Output blocks here are tiny (~4 MB
    rollup partials), so the backpressure the reservation exists to
    provide is irrelevant for this DAG shape.
"""

from __future__ import annotations

__all__ = ["tune_data_context"]


def tune_data_context(ctx=None):
    """Apply the engine's DataContext profile; returns the context.
    Safe to call repeatedly; call AFTER ray.init (the context is
    created lazily per driver)."""
    if ctx is None:
        from ray.data import DataContext

        ctx = DataContext.get_current()
    ctx.op_resource_reservation_enabled = False
    # pre-import the module Ray's write-path filesystem check pulls in
    # lazily (`path_util._is_http_filesystem`): two driver threads writing
    # concurrently (the retention pipeline's overlapped tier sinks) can
    # race the import and one sees a partially-initialized module —
    # an intermittent "cannot import name 'HTTPFileSystem'" crash.
    # Importing once here, before any threads spawn, removes the race.
    try:
        import fsspec.implementations.http  # noqa: F401
    except Exception:
        pass  # no fsspec/aiohttp -> Ray's check raises ImportError itself
    return ctx
