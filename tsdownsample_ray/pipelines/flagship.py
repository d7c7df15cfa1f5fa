"""Flagship pipeline: pages -> extract -> per-domain series -> rollup tiers
-> per-series visualization downsample.

``flagship_dataset`` returns the lazy Dataset of downsampled points (the
driver smoke-check); ``run_retention_pipeline`` (see ``retention.py``) is
the full checkpointed multi-tier run with compression and manifests.
"""

from __future__ import annotations

from ..stages.downsample import downsample_dataset
from ..stages.rollup import finalize_mean, rollup
from ..stages.series import derive_series
from ..sources.corpus import (estimate_rollup_keys,
                              read_pages_sliced)

US = 1_000_000


def flagship_dataset(sf_dir: str, *, snapshots: int = 3,
                     window_us: int = 900 * US, n_out: int = 100,
                     kernel: str = "minmaxlttb"):
    # time-sliced expansion: blocks cover few buckets x all docs, so
    # the rollup's map-side partials collapse across docs and the
    # combine moves ~|keys| rows (see read_pages_sliced)
    pages = read_pages_sliced(sf_dir, snapshots=snapshots,
                              columns=["url", "warc_ts", "text"])
    series = derive_series(pages)
    # tight |domains| x |buckets| key estimate (estimate_rollup_keys —
    # the pages bound overestimates by orders of magnitude and flips
    # combine="auto" to the 2x-slower hashpart merge at toy key counts;
    # a genuinely huge key space still selects hashpart)
    est = estimate_rollup_keys(sf_dir, window_us, snapshots=snapshots)
    tier0 = finalize_mean(rollup(series, window_us, est_keys=est))
    return downsample_dataset(
        tier0, kernel=kernel, n_out=n_out, x_col="bucket", y_col="mean_y"
    )
