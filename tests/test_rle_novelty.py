"""Batch-B round-5 ops: RLE per-series stats vs a brute-force encoder,
the survivor-pack policy property, and per-doc novelty vs DuckDB."""

import duckdb
import numpy as np
import pandas as pd


def _rle_ref(y):
    runs = []
    for v in y:
        if runs and runs[-1][0] == v:
            runs[-1][1] += 1
        else:
            runs.append([v, 1])
    return runs


def test_rle_stats_match_bruteforce(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.compress import rle_stats_per_series

    rng = np.random.default_rng(31)
    frames = []
    for s in range(6):
        n = int(rng.integers(1, 400))
        frames.append(pd.DataFrame({
            "series_id": f"s{s}",
            "x": np.sort(rng.choice(100_000, n, replace=False)),
            "y": rng.integers(0, 4, n),  # small alphabet -> long runs
        }))
    df = pd.concat(frames).sample(frac=1.0, random_state=3)
    ds = rd.from_pandas(df.reset_index(drop=True)).repartition(7)
    out = rle_stats_per_series(ds, num_partitions=3).to_pandas() \
        .set_index("series_id").sort_index()

    for s, g in df.sort_values(["series_id", "x"]).groupby("series_id"):
        runs = _rle_ref(g.y.to_numpy())
        row = out.loc[s]
        assert row.n_points == len(g)
        assert row.n_runs == len(runs)
        assert row.max_run == max(r[1] for r in runs)
        assert row.head_checksum == sum(
            v * (i + 1) for i, (v, _) in enumerate(runs))


def test_rle_single_value_series(ray_session):
    import ray.data as rd

    from tsdownsample_ray.stages.compress import rle_stats_per_series

    df = pd.DataFrame({"series_id": "only", "x": np.arange(50),
                       "y": np.full(50, 7)})
    out = rle_stats_per_series(
        rd.from_pandas(df).repartition(3), num_partitions=2).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r.n_points, r.n_runs, r.max_run, r.head_checksum) \
        == (50, 1, 50, 7)


def test_survivor_pack_prefers_longest_then_smallest_id(ray_session):
    """The canonical_docs pack: min((L - n_chars) * 2^40 + doc_id)
    == ORDER BY n_chars DESC, doc_id ASC LIMIT 1 per component."""
    import ray.data as rd

    from tsdownsample_ray.stages.rollup import grouped_min_parts

    rng = np.random.default_rng(5)
    n = 3000
    df = pd.DataFrame({
        "component": rng.integers(0, 40, n),
        "n_chars": rng.integers(10, 50, n),  # ties guaranteed
        "doc_id": rng.choice(10**6, n, replace=False),
    })
    L, K = 1 << 20, 1 << 40
    df["packed"] = (L - df.n_chars) * K + df.doc_id
    out = grouped_min_parts(
        rd.from_pandas(df[["component", "packed"]]).repartition(5),
        ["component"], ["packed"], fanin=3).to_pandas()
    out["doc_id"] = out.packed % K
    exp = df.sort_values(["component", "n_chars", "doc_id"],
                         ascending=[True, False, True]) \
        .groupby("component", as_index=False).first()
    m = out.merge(exp, on="component", suffixes=("", "_exp"))
    assert (m.doc_id == m.doc_id_exp).all()


def test_novelty_docs_vs_duckdb(ray_session):
    from tsdownsample_ray.pipelines.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    out = QUERIES["novelty_docs"](sf).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    exp = duckdb.sql(f"""
        WITH g AS (
            SELECT doc_id, unnest(list_distinct(list_transform(
                       range(1, length(text) - 3),
                       i -> substring(text, i, 5)))) AS gram
            FROM '{sf}/documents.parquet'
        ),
        f AS (SELECT gram, min(doc_id) AS fd FROM g GROUP BY 1)
        SELECT g.doc_id, count(*) AS n_grams,
               sum(CASE WHEN f.fd = g.doc_id THEN 1 ELSE 0 END)
                   AS n_novel
        FROM g JOIN f USING (gram) GROUP BY 1 ORDER BY 1
    """).df()
    assert len(out) == len(exp)
    for c in ("n_grams", "n_novel"):
        assert (out[c].to_numpy().astype(np.int64)
                == exp[c].to_numpy().astype(np.int64)).all(), c
    # the first doc is 100% novel by definition
    first = out.iloc[0]
    assert first.n_novel == first.n_grams
