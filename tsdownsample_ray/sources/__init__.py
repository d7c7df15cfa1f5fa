"""Dataset sources: Parquet readers and the deterministic synthetic
Common-Crawl-style page corpus."""


def read_parquet_clean(paths, **kwargs):
    """``ray.data.read_parquet`` + schema-metadata strip (zero-copy, fuses
    with the read task).

    Parquet files written by pandas/duckdb carry a ``pandas`` schema
    metadata blob; a metadata-bearing ``pyarrow.Schema`` is UNHASHABLE
    ("unhashable type: 'dict'"), so every downstream shuffle's
    ``unify_schemas`` logs a "Failed to hash the schemas" warning per
    reduce task and loses its dedup fast path. The engine never consumes
    that metadata — drop it at the boundary."""
    import ray.data as rd

    ds = rd.read_parquet(paths, **kwargs)
    return ds.map_batches(lambda b: b.replace_schema_metadata(None),
                          batch_format="pyarrow")
