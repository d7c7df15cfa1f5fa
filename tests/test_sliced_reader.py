"""read_pages_sliced: time-sliced expansion must emit EXACTLY the rows
of the doc-sliced read_pages (the snapshot index enters row construction
only through first_snapshot), while bounding each block's bucket span so
rollup partials collapse across docs."""

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _sorted(df):
    return df.sort_values(["url", "warc_ts"]).reset_index(drop=True)


def test_sliced_identity_all_columns(ray_session):
    from tsdownsample_ray.sources.corpus import read_pages, read_pages_sliced

    a = read_pages(SF, snapshots=7).to_pandas()
    b = read_pages_sliced(SF, snapshots=7, slice_snapshots=3).to_pandas()
    pd.testing.assert_frame_equal(_sorted(a), _sorted(b))


def test_sliced_identity_doc_range_and_uneven_tail(ray_session):
    from tsdownsample_ray.sources.corpus import read_pages, read_pages_sliced

    a = read_pages(SF, snapshots=5, columns=["url", "warc_ts", "text"],
                   doc_range=(10, 60)).to_pandas()
    b = read_pages_sliced(SF, snapshots=5, slice_snapshots=2,
                          columns=["url", "warc_ts", "text"],
                          doc_range=(10, 60)).to_pandas()
    pd.testing.assert_frame_equal(_sorted(a), _sorted(b))


def test_sliced_rollup_equals_docsliced_rollup(ray_session):
    # the consumer contract: identical tier-0 rows either way
    from tsdownsample_ray.sources.corpus import read_pages, read_pages_sliced
    from tsdownsample_ray.stages.rollup import rollup
    from tsdownsample_ray.stages.series import derive_series

    def tier(pages):
        return rollup(derive_series(pages), 900_000_000).to_pandas() \
            .sort_values(["series_id", "bucket"]).reset_index(drop=True)

    a = tier(read_pages(SF, snapshots=9,
                        columns=["url", "warc_ts", "text"]))
    b = tier(read_pages_sliced(SF, snapshots=9, slice_snapshots=4,
                               columns=["url", "warc_ts", "text"]))
    pd.testing.assert_frame_equal(a, b)


def test_sliced_partials_collapse(ray_session):
    # the point of the shape: a slice block covers slice_snapshots
    # buckets per domain, so partial rows per block are bounded by
    # |domains| x slice_snapshots regardless of doc count
    import pyarrow as pa

    from tsdownsample_ray.sources.corpus import read_pages_sliced
    from tsdownsample_ray.stages.rollup import partial_rollup_batch
    from tsdownsample_ray.stages.series import derive_series

    pages = read_pages_sliced(SF, snapshots=8, slice_snapshots=2,
                              columns=["url", "warc_ts", "text"])
    series = derive_series(pages)

    def _partial(b: pa.Table) -> pa.Table:
        out = partial_rollup_batch(b, 900_000_000)
        assert out.num_rows <= b.num_rows
        # a slice's time span = doc-cadence spread (500 docs x 37 s)
        # plus 2 snapshots x 971 s -> ~23 15m buckets; keys bounded by
        # |domains| x span regardless of doc count
        span = (500 * 37 + 2 * 971) // 900 + 3
        assert out.num_rows <= 20 * span
        return out

    n = series.map_batches(_partial, batch_format="pyarrow").count()
    assert n > 0
