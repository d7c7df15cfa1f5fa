"""Local stand-in for the grading driver: run every queries() entry at a
given sf and compare to oracle_sql() via DuckDB (row count, schema names,
order-insensitive exact values). Usage:

    python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        problems.append(f"schema mismatch: ray={sorted(ray_df.columns)} sql={sorted(sql_df.columns)}")
        return problems
    if len(ray_df) != len(sql_df):
        problems.append(f"row count mismatch: ray={len(ray_df)} sql={len(sql_df)}")
    a, b = normalize(ray_df), normalize(sql_df)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            # The grading driver hashes the pandas values dtype-sensitively:
            # an int64 engine column vs a float64 oracle column (e.g. an
            # uncast HUGEINT sum) hash-mismatches even when every value is
            # numerically equal. Mirror that here instead of funnelling
            # both sides through float64 (the round-3 blind spot).
            if av.dtype != bv.dtype:
                problems.append(
                    f"col {c}: dtype mismatch ray={av.dtype} "
                    f"sql={bv.dtype} (driver hash is dtype-sensitive)")
                continue
            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                eq = np.array_equal(av.astype(np.float64), bv.astype(np.float64), equal_nan=True)
                if not eq:
                    d = np.nanmax(np.abs(av.astype(np.float64) - bv.astype(np.float64)))
                    problems.append(f"col {c}: float mismatch (max abs diff {d:.3e})")
            else:
                if not np.array_equal(av, bv):
                    n_bad = int((av != bv).sum())
                    ex = [(x, y) for x, y in zip(av, bv) if x != y][:3]
                    problems.append(f"col {c}: {n_bad} value mismatches, e.g. {ex}")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0

    # Static type audit over ALL oracles (binding only, no execution): a
    # HUGEINT output column becomes float64 in pandas while the engine
    # emits int64 — the driver's dtype-sensitive hash then mismatches even
    # on exactly-equal values. Catch the class before running anything.
    n_type_bad = 0
    for name, sql in oracles.items():
        try:
            rel = con.sql(sql)
        except Exception as e:
            print(f"✗ type-audit {name}: oracle does not bind: {e}")
            n_type_bad += 1
            continue
        for col, typ in zip(rel.columns, rel.types):
            if str(typ) in ("HUGEINT", "UHUGEINT"):
                print(f"✗ type-audit {name}: column {col} is {typ} "
                      f"(pandas→float64; cast to BIGINT in the SQL)")
                n_type_bad += 1
    if n_type_bad:
        print(f"type audit: {n_type_bad} HUGEINT/unbound oracle columns — "
              f"fix before sweeping")
    else:
        print(f"type audit: {len(oracles)} oracles, 0 HUGEINT output columns")
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception:
            print(f"✗ {name}: query RAISED\n{traceback.format_exc()}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"~ {name}: rows-only ({len(ray_df)} rows, {dt:.1f}s)")
            n_rowsonly += 1
            continue
        try:
            sql_df = con.sql(oracles[name]).df()
        except Exception:
            print(f"✗ {name}: ORACLE SQL RAISED\n{traceback.format_exc()}")
            n_fail += 1
            continue
        problems = compare(name, ray_df, sql_df)
        if problems:
            print(f"✗ {name} ({len(ray_df)} vs {len(sql_df)} rows, {dt:.1f}s)")
            for p in problems:
                print(f"    {p}")
            n_fail += 1
        else:
            print(f"✓ {name} ({len(ray_df)} rows, {dt:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only, "
          f"{n_type_bad} type-audit flags")
    ray.shutdown()
    sys.exit(1 if (n_fail or n_type_bad) else 0)


if __name__ == "__main__":
    main()
