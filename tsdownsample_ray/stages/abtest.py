"""Mann-Whitney U (Wilcoxon rank-sum) A/B comparison per key — the
nonparametric "did cohort A's values shift vs cohort B" test, computed
in EXACT integer arithmetic: tie-averaged ranks are half-integers, so
everything carries a factor of 2 (``r2_a`` = 2·(rank sum of side A),
``u2_a`` = 2·U_A = r2_a − n_a·(n_a+1)) and stays int64. The common-
language effect size ``u_over_nanb = (u2_a/2) / (n_a·n_b)`` is the one
pinned IEEE division. Keys missing a side report null effect (U is
still defined, trivially 0 when n_b = 0? no — a side with zero rows
yields u2_a of a one-sample ranking; we omit keys that lack either
side, matching the SQL inner grouping).

No counterpart in the reference (kernel library; SURVEY.md §2.4) —
the cohort-comparison primitive for curation experiments (does source
A produce longer documents than source B?) and metric shift detection.

Scale shape: ONE hash(key) shuffle; each partition sorts once by
(key, value) and derives every key's tie blocks, doubled average ranks
(2·first_rank + ties − 1, a reduceat/broadcast pass) and side-A sums —
no per-key Python.

SQL restatement: ``rank()`` + per-(key, value) tie counts + the same
doubled-rank sums."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..arrow_utils import make_add_part
import pyarrow.compute as pc

__all__ = ["mann_whitney", "chi2_contingency",
           "wilcoxon_signed", "runs_test", "lz76_complexity",
           "wilson_interval", "sprt_decide"]


def mann_whitney(ds, *, key_col: str = "series_id",
                 side_col: str = "side", val_col: str = "y",
                 num_partitions: int = 16):
    """``side`` is int (1 = cohort A, 0 = cohort B). Output one row per
    key having BOTH sides: ``(series_id, n_a, n_b, r2_a, u2_a,
    u_over_nanb)``."""
    from ..arrow_utils import col_type, stable_part_codes

    mod = num_partitions * 64

    _add_part = make_add_part(key_col, mod)

    def _test(g: pa.Table) -> pa.Table:
        kt = col_type(g, key_col)
        empty = pa.table({
            "series_id": pa.array([], kt),
            "n_a": pa.array([], pa.int64()),
            "n_b": pa.array([], pa.int64()),
            "r2_a": pa.array([], pa.int64()),
            "u2_a": pa.array([], pa.int64()),
            "u_over_nanb": pa.array([], pa.float64()),
        })
        if g.num_rows == 0:
            return empty
        t = pa.table({"k": g[key_col],
                      "v": pc.cast(g[val_col], pa.int64()),
                      "s": pc.cast(g[side_col], pa.int64())})
        t = t.take(pc.sort_indices(
            t, sort_keys=[("k", "ascending"), ("v", "ascending")]))
        k = t["k"]
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        enc = k.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        v = t["v"].to_numpy(zero_copy_only=False)
        s = t["s"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = len(v)
        kheads = np.ones(m, dtype=bool)
        kheads[1:] = codes[1:] != codes[:-1]
        kstarts = np.flatnonzero(kheads)
        kseg = np.cumsum(kheads) - 1
        # tie blocks: same key AND same value
        theads = kheads.copy()
        theads[1:] |= v[1:] != v[:-1]
        tstarts = np.flatnonzero(theads)
        tseg = np.cumsum(theads) - 1
        ties = np.diff(np.append(tstarts, m))
        # 1-based first rank of each tie block within its key
        first_rank = tstarts - kstarts[kseg[tstarts]] + 1
        rank2 = (2 * first_rank + ties - 1)[tseg]  # doubled avg rank
        # per-key side sums
        n_a = np.add.reduceat(s, kstarts)
        n_tot = np.diff(np.append(kstarts, m))
        n_b = n_tot - n_a
        r2_a = np.add.reduceat(rank2 * s, kstarts)
        u2_a = r2_a - n_a * (n_a + 1)
        both = (n_a > 0) & (n_b > 0)
        if not both.any():
            return empty
        eff = np.where(both, u2_a / (2.0 * np.where(both, n_a * n_b, 1)),
                       np.nan)
        sel = np.flatnonzero(both)
        return pa.table({
            "series_id": enc.dictionary.take(
                pa.array(codes[kstarts[sel]])),
            "n_a": pa.array(n_a[sel]),
            "n_b": pa.array(n_b[sel]),
            "r2_a": pa.array(r2_a[sel]),
            "u2_a": pa.array(u2_a[sel]),
            "u_over_nanb": pa.array(eff[sel]),
        })

    parted = ds.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _test, batch_format="pyarrow")


def chi2_contingency(ds, *, row_col: str, col_col: str, fanin: int = 8,
                     scale: int = 10 ** 6):
    """Pearson chi-square test of independence over a two-way contingency
    table, in EXACT integer arithmetic: with observed cell counts ``o``,
    margins ``r``/``c`` and total ``N``, each of the R x C cells (ZERO
    cells included — they contribute their expectation) adds

        term = ((o*N - r*c)^2 * scale) // (N * r * c)

    to ``chi2_e6 = sum(term)`` — the floor-per-cell convention makes the
    scaled statistic deterministic under any partitioning and replayable
    verbatim in SQL (HUGEINT intermediates; the final sum fits BIGINT).
    Cramer's V is the ONE pinned float expression
    ``sqrt((chi2_e6/scale) / (N * (min(R,C)-1)))``. Output: one row
    ``(n, n_rows, n_cols, dof, chi2_e6, cramers_v)``.

    Scale shape: one hashpart grouped count by (row, col) — the only
    shuffle touching data volume; the cell table is bounded by the
    category cross product (documented driver-side contract, like the
    CMS grid), so the finalize is a single bounded block."""
    import numpy as np
    import pyarrow as pa

    from .graph import grouped_sum_parts

    def _kv(b: pa.Table) -> pa.Table:
        return pa.table({"__r": b[row_col], "__c": b[col_col]})

    cells = grouped_sum_parts(
        ds.map_batches(_kv, batch_format="pyarrow"),
        ["__r", "__c"], [], count_col="o", fanin=fanin)

    def _finalize(b: pa.Table) -> pa.Table:
        import math

        r_lab = b["__r"].to_pylist()
        c_lab = b["__c"].to_pylist()
        o = b["o"].to_numpy(zero_copy_only=False).astype(np.int64)
        rows = sorted(set(r_lab))
        colsv = sorted(set(c_lab))
        obs = {(a, bb): int(v) for a, bb, v in zip(r_lab, c_lab, o)}
        r_tot = {a: 0 for a in rows}
        c_tot = {bb: 0 for bb in colsv}
        for (a, bb), v in obs.items():
            r_tot[a] += v
            c_tot[bb] += v
        N = int(o.sum())
        chi2_e = 0
        for a in rows:
            for bb in colsv:
                ov = obs.get((a, bb), 0)
                rc = r_tot[a] * c_tot[bb]
                num = ov * N - rc
                chi2_e += (num * num * scale) // (N * rc)
        dof = (len(rows) - 1) * (len(colsv) - 1)
        mind = min(len(rows), len(colsv)) - 1
        v = (math.sqrt((chi2_e / scale) / (N * mind))
             if N > 0 and mind > 0 else None)
        return pa.table({
            "n": pa.array([N], pa.int64()),
            "n_rows": pa.array([len(rows)], pa.int64()),
            "n_cols": pa.array([len(colsv)], pa.int64()),
            "dof": pa.array([dof], pa.int64()),
            "chi2_e6": pa.array([chi2_e], pa.int64()),
            "cramers_v": pa.array([v], pa.float64()),
        })

    return cells.repartition(1).map_batches(_finalize,
                                            batch_format="pyarrow")


def wilcoxon_signed(ds, *, key_col: str = "pair", d_col: str = "d",
                    num_partitions: int = 8):
    """Wilcoxon SIGNED-RANK test per key over paired integer
    differences (the paired companion to :func:`mann_whitney`): zeros
    drop, |d| gets tie-averaged ranks — doubled (``d2 = 2*cnt_lt +
    cnt_eq + 1``) so everything stays exact int64 — and the statistic
    splits into ``w2_pos``/``w2_neg`` (doubled rank sums of the
    positive / negative sides; ``w2_pos + w2_neg = n(n+1)`` is the
    invariant). The normal-approximation ``z`` (no tie correction —
    documented simplification) is the one pinned IEEE expression:
    ``z = (W+ - n(n+1)/4) / sqrt(n(n+1)(2n+1)/24)`` with ``W+ =
    w2_pos/2``, 0.0 when the variance vanishes (n < 2).

    Output per key with >= 1 nonzero difference:
    ``(key, n_nz, w2_pos, w2_neg, z)``.

    Scale shape: ONE hash(key) shuffle; per partition one sort by
    (key, |d|) and vectorized tie-block doubled ranks — no per-key
    Python beyond the bounded segment walk."""
    import math

    from ..arrow_utils import group_codes

    mod = num_partitions * 64

    _add_part = make_add_part(key_col, mod)

    def _wsr(g: pa.Table) -> pa.Table:
        key_type = g[key_col].type
        empty = pa.table({key_col: pa.array([], key_type),
                          "n_nz": pa.array([], pa.int64()),
                          "w2_pos": pa.array([], pa.int64()),
                          "w2_neg": pa.array([], pa.int64()),
                          "z": pa.array([], pa.float64())})
        t = g.drop_columns(["__part"])
        t = t.filter(pc.not_equal(t[d_col], pa.scalar(0, t[d_col].type)))
        if t.num_rows == 0:
            return empty
        d = t[d_col].to_numpy(zero_copy_only=False).astype(np.int64)
        t = t.append_column("__ad", pa.array(np.abs(d)))
        t = t.take(pc.sort_indices(t, sort_keys=[
            (key_col, "ascending"), ("__ad", "ascending")]))
        keys = t[key_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        codes = group_codes(keys)
        d = t[d_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ad = t["__ad"].to_numpy(zero_copy_only=False)
        n = len(d)
        kchange = np.ones(n, dtype=bool)
        kchange[1:] = codes[1:] != codes[:-1]
        seg_first = np.flatnonzero(kchange)
        seg_len = np.diff(np.r_[seg_first, n])
        # doubled midranks within key over |d| (sorted): tie blocks
        tchange = kchange.copy()
        tchange[1:] |= ad[1:] != ad[:-1]
        tie_first = np.flatnonzero(tchange)
        tie_len = np.diff(np.r_[tie_first, n])
        pos_in_key = np.arange(n) - np.repeat(seg_first, seg_len)
        first_rank = pos_in_key[np.repeat(tie_first, tie_len)] + 1
        d2 = 2 * first_rank + np.repeat(tie_len, tie_len) - 1
        pos_mask = d > 0
        out = {k: [] for k in ("key", "n", "wp", "wn", "z")}
        for si, f0 in enumerate(seg_first):
            m = int(seg_len[si])
            sl = slice(f0, f0 + m)
            wp = int(d2[sl][pos_mask[sl]].sum())
            wn = int(d2[sl][~pos_mask[sl]].sum())
            nf = float(m)
            var = nf * (nf + 1.0) * (2.0 * nf + 1.0) / 24.0
            if var > 0.0:
                z = ((wp / 2.0) - nf * (nf + 1.0) / 4.0) / math.sqrt(var)
            else:
                z = 0.0
            out["key"].append(keys[int(f0)].as_py())
            out["n"].append(m)
            out["wp"].append(wp)
            out["wn"].append(wn)
            out["z"].append(z)
        return pa.table({key_col: pa.array(out["key"], key_type),
                         "n_nz": pa.array(out["n"], pa.int64()),
                         "w2_pos": pa.array(out["wp"], pa.int64()),
                         "w2_neg": pa.array(out["wn"], pa.int64()),
                         "z": pa.array(out["z"], pa.float64())})

    parted = ds.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _wsr, batch_format="pyarrow")


def runs_test(rolled, *, series_col: str = "series_id",
              order_col: str = "bucket", value_col: str = "sum_y",
              num_partitions: int = 8):
    """Wald-Wolfowitz runs test per series against its LOWER MEDIAN:
    values equal to the median drop, the remainder binarizes to
    above/below, and the run count tests randomness of the sequence.
    All counts exact int64 (the lower median is the 0-based
    ``(n-1)//2``-th order statistic — deterministic under ties, the
    ``quantile_disc(0.5)`` element); the normal-approximation ``z`` is
    the one pinned IEEE expression
    ``(R - mu) / sqrt(var)``, ``mu = 2ab/(a+b) + 1``,
    ``var = 2ab(2ab-a-b) / ((a+b)^2 (a+b-1))``, 0.0 when degenerate.

    Output per series: ``(series_id, n, med, n_above, n_below, runs,
    z)``.

    Scale shape: ONE hash(series) shuffle, per-partition sort + one
    vectorized pass (median via partition, runs via sign-change
    count)."""
    import math

    from ..arrow_utils import group_codes

    mod = num_partitions * 64

    _add_part = make_add_part(series_col, mod)

    def _runs(g: pa.Table) -> pa.Table:
        sid_type = g[series_col].type
        empty = pa.table({"series_id": pa.array([], sid_type),
                          "n": pa.array([], pa.int64()),
                          "med": pa.array([], pa.int64()),
                          "n_above": pa.array([], pa.int64()),
                          "n_below": pa.array([], pa.int64()),
                          "runs": pa.array([], pa.int64()),
                          "z": pa.array([], pa.float64())})
        t = g.drop_columns(["__part"])
        if t.num_rows == 0:
            return empty
        t = t.take(pc.sort_indices(t, sort_keys=[
            (series_col, "ascending"), (order_col, "ascending")]))
        sid = t[series_col]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = group_codes(sid)
        y = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(y)
        change = np.ones(n, dtype=bool)
        change[1:] = codes[1:] != codes[:-1]
        seg_first = np.flatnonzero(change)
        seg_len = np.diff(np.r_[seg_first, n])
        out = {k: [] for k in ("sid", "n", "med", "a", "b", "r", "z")}
        for si, f0 in enumerate(seg_first):
            m = int(seg_len[si])
            ys = y[f0:f0 + m]
            med = int(np.partition(ys, (m - 1) // 2)[(m - 1) // 2])
            s = ys[ys != med] > med
            a = int(s.sum())
            b = int(len(s) - a)
            if len(s) == 0:
                runs = 0
            else:
                runs = 1 + int((s[1:] != s[:-1]).sum())
            af, bf = float(a), float(b)
            tot = af + bf
            if a > 0 and b > 0 and tot > 1.0:
                mu = 2.0 * af * bf / tot + 1.0
                var = (2.0 * af * bf * (2.0 * af * bf - af - bf)
                       / (tot * tot * (tot - 1.0)))
                z = (float(runs) - mu) / math.sqrt(var) if var > 0.0 \
                    else 0.0
            else:
                z = 0.0
            out["sid"].append(sid[int(f0)].as_py())
            out["n"].append(m)
            out["med"].append(med)
            out["a"].append(a)
            out["b"].append(b)
            out["r"].append(runs)
            out["z"].append(z)
        return pa.table({"series_id": pa.array(out["sid"], sid_type),
                         "n": pa.array(out["n"], pa.int64()),
                         "med": pa.array(out["med"], pa.int64()),
                         "n_above": pa.array(out["a"], pa.int64()),
                         "n_below": pa.array(out["b"], pa.int64()),
                         "runs": pa.array(out["r"], pa.int64()),
                         "z": pa.array(out["z"], pa.float64())})

    parted = rolled.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _runs, batch_format="pyarrow")


def lz76_complexity(rolled, *, series_col: str = "series_id",
                    order_col: str = "bucket", value_col: str = "sum_y",
                    num_partitions: int = 8):
    """Lempel-Ziv (LZ76) sequence complexity per series: binarize the
    ordered values against the series' LOWER MEDIAN (``bit = 1`` iff
    ``y > med``; the deterministic ``(n-1)//2``-th order statistic),
    then count the exhaustive-history phrases of the Kaspar-Schuster
    parse — at each position take the LONGEST prefix of the remainder
    that occurs starting earlier in the string (overlap allowed), plus
    one innovation character; the trailing phrase counts even when
    fully reproducible. The classic randomness/compressibility score
    (Lempel & Ziv 1976; Kaspar & Schuster 1987). Pure integers —
    trivially exact; the SQL oracle replays the parse with one
    recursive walk over ``strpos`` probes.

    Output per series: ``(series_id, n, med, c_phrases)``.

    Scale shape: ONE hash(series) shuffle; per series the parse is a
    per-PHRASE Python loop (phrase count is O(n / log n)) whose inner
    search is C-speed ``str.find`` — run it on bounded rollup tiers
    like the other per-series sequential codecs."""
    from ..arrow_utils import group_codes

    mod = num_partitions * 64

    _add_part = make_add_part(series_col, mod)

    def _lz(g: pa.Table) -> pa.Table:
        sid_type = g[series_col].type
        empty = pa.table({"series_id": pa.array([], sid_type),
                          "n": pa.array([], pa.int64()),
                          "med": pa.array([], pa.int64()),
                          "c_phrases": pa.array([], pa.int64())})
        t = g.drop_columns(["__part"])
        if t.num_rows == 0:
            return empty
        t = t.take(pc.sort_indices(t, sort_keys=[
            (series_col, "ascending"), (order_col, "ascending")]))
        sid = t[series_col]
        if isinstance(sid, pa.ChunkedArray):
            sid = sid.combine_chunks()
        codes = group_codes(sid)
        y = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(y)
        change = np.ones(n, dtype=bool)
        change[1:] = codes[1:] != codes[:-1]
        seg_first = np.flatnonzero(change)
        seg_len = np.diff(np.r_[seg_first, n])
        out = {k: [] for k in ("sid", "n", "med", "c")}
        for si, f0 in enumerate(seg_first):
            m = int(seg_len[si])
            ys = y[f0:f0 + m]
            med = int(np.partition(ys, (m - 1) // 2)[(m - 1) // 2])
            s = "".join("1" if v > med else "0" for v in ys)
            c = 0
            pos = 0
            while pos < m:
                ln = 1
                # longest reproducible prefix of the remainder: the
                # occurrence may start anywhere before pos (overlap ok)
                while pos + ln <= m and \
                        s.find(s[pos:pos + ln], 0, pos + ln - 1) != -1:
                    ln += 1
                # phrase = reproducible part + 1 innovation char,
                # clamped at the end of the string
                pos += ln
                c += 1
            out["sid"].append(sid[int(f0)].as_py())
            out["n"].append(m)
            out["med"].append(med)
            out["c"].append(c)
        return pa.table({"series_id": pa.array(out["sid"], sid_type),
                         "n": pa.array(out["n"], pa.int64()),
                         "med": pa.array(out["med"], pa.int64()),
                         "c_phrases": pa.array(out["c"], pa.int64())})

    parted = rolled.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _lz, batch_format="pyarrow")


def wilson_interval(ds, *, key_col: str, flag_col: str, z: float = 1.96,
                    fanin: int = 8):
    """Wilson score confidence interval for a per-key proportion
    (Wilson 1927 — the binomial interval that behaves at small n and
    extreme p, unlike the Wald interval): exact int64 ``(n, s)``
    counts from mergeable partials, then center and half-width as ONE
    pinned IEEE expression chain each (z fixed, replayed term by term
    in SQL). Output per key: ``(key, n, s, p_hat, lo, hi)``.

    Scale shape: map-side (key -> n, s) partials, ONE hash(key)
    grouped sum, tiny per-key float finish."""
    import math

    from .graph import grouped_sum_parts

    def _partial(b: pa.Table) -> pa.Table:
        t = pa.table({key_col: b[key_col],
                      "s": pc.cast(b[flag_col], pa.int64())})
        g = t.group_by([key_col]).aggregate([("s", "sum"), ("s", "count")])
        from ..arrow_utils import rename_agg

        return rename_agg(g, {key_col: key_col, "s_sum": "s",
                              "s_count": "n"})

    summed = grouped_sum_parts(ds.map_batches(_partial,
                                              batch_format="pyarrow"),
                               [key_col], ["s", "n"], count_col=None,
                               fanin=fanin)
    zf = float(z)

    def _finish(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = b["s"].to_numpy(zero_copy_only=False).astype(np.int64)
        nf = n.astype(np.float64)
        p = s.astype(np.float64) / nf
        z2 = zf * zf
        denom = 1.0 + z2 / nf
        center = (p + z2 / (2.0 * nf)) / denom
        half = zf * np.sqrt(p * (1.0 - p) / nf
                            + z2 / (4.0 * nf * nf)) / denom
        return pa.table({key_col: b[key_col],
                         "n": pa.array(n), "s": pa.array(s),
                         "p_hat": pa.array(p, pa.float64()),
                         "lo": pa.array(center - half, pa.float64()),
                         "hi": pa.array(center + half, pa.float64())})

    return summed.map_batches(_finish, batch_format="pyarrow")


def sprt_decide(ds, *, key_col: str, flag_col: str, order_cols: tuple,
                p0: float = 0.4, p1: float = 0.6,
                alpha: float = 0.05, beta: float = 0.05,
                num_partitions: int = 8):
    """Wald's Sequential Probability Ratio Test per key (Wald 1945 —
    the earliest-stopping A/B decision rule): over the key's ordered
    Bernoulli stream, the log-likelihood ratio after t trials with s
    successes is the CLOSED FORM ``llr = s*c1 + (t-s)*c0`` (``c1 =
    ln(p1/p0)``, ``c0 = ln((1-p1)/(1-p0))`` — per-row pinned
    expressions of exact integer s/t, no running float sum anywhere);
    the decision is the first t where llr >= ln((1-beta)/alpha)
    (accept H1) or <= ln(beta/(1-alpha)) (accept H0), else
    ``continue``. Output per key:
    ``(key, n, s_total, decision, t_decide, s_decide)`` with
    ``t_decide/s_decide = 0`` for ``continue``.

    Scale shape: ONE hash(key) shuffle, per-partition sort + integer
    cumsums; the float comparisons are per-row pinned chains replayed
    identically in SQL (ln literals CAST to DOUBLE — the Wilson
    DECIMAL-folding lesson)."""
    import math

    from ..arrow_utils import group_codes, make_add_part

    mod = num_partitions * 64
    c1 = math.log(p1 / p0)
    c0 = math.log((1.0 - p1) / (1.0 - p0))
    up = math.log((1.0 - beta) / alpha)
    lo = math.log(beta / (1.0 - alpha))

    _add_part = make_add_part(key_col, mod)

    sort_keys = [(key_col, "ascending")] + [
        (c, "ascending") for c in order_cols]

    def _sprt(g: pa.Table) -> pa.Table:
        key_type = g[key_col].type
        empty = pa.table({key_col: pa.array([], key_type),
                          "n": pa.array([], pa.int64()),
                          "s_total": pa.array([], pa.int64()),
                          "decision": pa.array([], pa.string()),
                          "t_decide": pa.array([], pa.int64()),
                          "s_decide": pa.array([], pa.int64())})
        t = g.drop_columns(["__part"])
        if t.num_rows == 0:
            return empty
        t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
        keys = t[key_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        codes = group_codes(keys)
        x = t[flag_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(x)
        change = np.ones(n, dtype=bool)
        change[1:] = codes[1:] != codes[:-1]
        seg_first = np.flatnonzero(change)
        seg_len = np.diff(np.r_[seg_first, n])
        out = {k: [] for k in ("key", "n", "st", "d", "td", "sd")}
        for si, f0 in enumerate(seg_first):
            m = int(seg_len[si])
            xs = x[f0:f0 + m]
            s = np.cumsum(xs)
            tt = np.arange(1, m + 1, dtype=np.int64)
            llr = s.astype(np.float64) * c1 \
                + (tt - s).astype(np.float64) * c0
            hit_up = llr >= up
            hit_lo = llr <= lo
            hit = hit_up | hit_lo
            if hit.any():
                i = int(np.argmax(hit))
                dec = "accept_h1" if hit_up[i] else "accept_h0"
                td, sd = int(tt[i]), int(s[i])
            else:
                dec, td, sd = "continue", 0, 0
            out["key"].append(keys[int(f0)].as_py())
            out["n"].append(m)
            out["st"].append(int(s[-1]))
            out["d"].append(dec)
            out["td"].append(td)
            out["sd"].append(sd)
        return pa.table({key_col: pa.array(out["key"], key_type),
                         "n": pa.array(out["n"], pa.int64()),
                         "s_total": pa.array(out["st"], pa.int64()),
                         "decision": pa.array(out["d"], pa.string()),
                         "t_decide": pa.array(out["td"], pa.int64()),
                         "s_decide": pa.array(out["sd"], pa.int64())})

    parted = ds.map_batches(_add_part, batch_format="pyarrow")
    return parted.repartition(num_partitions).groupby("__part").map_groups(
        _sprt, batch_format="pyarrow")
