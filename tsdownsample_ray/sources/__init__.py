"""Dataset sources: Parquet readers and the deterministic synthetic
Common-Crawl-style page corpus."""


def read_parquet_clean(paths, **kwargs):
    """``ray.data.read_parquet`` with the schema metadata stripped.

    Parquet files written by pandas/duckdb carry a ``pandas`` schema
    metadata blob; a metadata-bearing ``pyarrow.Schema`` is UNHASHABLE
    ("unhashable type: 'dict'"), so every downstream shuffle's
    ``unify_schemas`` logs a "Failed to hash the schemas" warning per
    reduce task and loses its dedup fast path. The engine never consumes
    that metadata — drop it at the boundary.

    Single-file reads pass a metadata-free ``schema=`` straight to the
    reader (zero extra stages); directory reads fall back to a strip
    ``map_batches`` (the read emits many blocks there and the map fuses
    with downstream work)."""
    import ray.data as rd

    if ("schema" not in kwargs and isinstance(paths, str)
            and paths.endswith(".parquet")):
        import pyarrow.parquet as pq

        s = pq.read_schema(paths)
        cols = kwargs.get("columns")
        if cols:
            s = __import__("pyarrow").schema(
                [s.field(c) for c in cols])
        return rd.read_parquet(paths, schema=s.remove_metadata(), **kwargs)
    ds = rd.read_parquet(paths, **kwargs)
    return ds.map_batches(lambda b: b.replace_schema_metadata(None),
                          batch_format="pyarrow")
