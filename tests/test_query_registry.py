"""The queries package split (r4 verdict next-round #5) must preserve the
driver-facing surface exactly: full QUERIES/ORACLE_SQL catalogs assembled
in the package, every name importable from the package root as it was from
the former single-module queries.py."""


def test_catalog_sizes_and_pairing():
    from tsdownsample_ray.pipelines.queries import ORACLE_SQL, QUERIES

    assert len(QUERIES) >= 252
    # every query except the float-ANN rows-only one has an exact oracle
    rows_only = {"embedding_near_dups"}
    assert set(QUERIES) - set(ORACLE_SQL) == rows_only
    assert set(ORACLE_SQL) <= set(QUERIES)
    for name, fn in QUERIES.items():
        assert callable(fn), name
    for name, sql in ORACLE_SQL.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_package_reexports_flat_namespace():
    # the pre-split import styles all keep working
    import tsdownsample_ray.pipelines.queries as Q
    from tsdownsample_ray.pipelines.queries import (
        US,
        W1H,
        _pages_with_pid,
        q_cdc_chunk_docs_utf8,
        q_minmax_events,
        q_sax_events,
        q_token_bucket_events,
    )

    assert US == 1_000_000 and W1H == 3600 * US
    for fn in (q_minmax_events, q_sax_events, q_token_bucket_events,
               q_cdc_chunk_docs_utf8, _pages_with_pid):
        assert callable(fn)
    assert Q.QUERIES["minmax_events"] is q_minmax_events


def test_registry_entries_resolve_to_family_modules():
    """Every catalog entry is a function defined in a module of the
    queries package (no stale references to the removed monolith)."""
    from tsdownsample_ray.pipelines.queries import QUERIES

    for name, fn in QUERIES.items():
        mod = getattr(fn, "__module__", "")
        assert mod.startswith("tsdownsample_ray.pipelines.queries."), (
            name, mod)
