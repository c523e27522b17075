"""Fused single-pass column profiler (north-rule requirement).

One `df.agg()` carries, per profiled column: row count, null count,
min, max, HyperLogLog distinct (approx_count_distinct) and optional
fixed-bin histogram counts — a single job, single scan, map-side
partial aggregation, no Python in the hot path (SURVEY.md §4 custom
item 1). The reference has no profiler; this feeds the Drift checks
and the baseline_profile fixture (FIXTURES.md §3).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from functools import reduce
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


@dataclass(frozen=True)
class HistSpec:
    """Fixed equi-width bins [lo, hi) with an underflow and an overflow
    bucket; bins are fixed up front so profiling stays single-pass and
    drift statistics are deterministic."""

    lo: float
    hi: float
    bins: int = 64


@dataclass(frozen=True)
class ProfileSpec:
    name: str
    expression: Optional[str] = None  # SQL expr; defaults to the column itself
    hist: Optional[HistSpec] = None
    rsd: float = 0.05  # HLL relative standard deviation

    def expr_sql(self) -> str:
        return self.expression or f"`{self.name}`"


def _bucket_col(e, h: HistSpec):
    width = (h.hi - h.lo) / h.bins
    return (
        F.when(e.isNull(), F.lit(None))
        .when(e < F.lit(h.lo), F.lit(-1))
        .when(e >= F.lit(h.hi), F.lit(h.bins))
        .otherwise(F.floor((e - F.lit(h.lo)) / F.lit(width)).cast("int"))
    )


def profile(df: DataFrame, specs: Sequence[ProfileSpec]) -> dict:
    """Profile columns in ONE aggregation pass.

    Returns {name: {count, nulls, min, max, approx_distinct,
    hist: [underflow, b0..b(n-1), overflow] or None, hist_spec}}.
    """
    aggs = [F.count(F.lit(1)).alias("_total")]
    for i, s in enumerate(specs):
        e = F.expr(s.expr_sql())
        aggs.append(F.count(e).alias(f"_c{i}"))
        aggs.append(F.min(e).cast("string").alias(f"_min{i}"))
        aggs.append(F.max(e).cast("string").alias(f"_max{i}"))
        aggs.append(F.approx_count_distinct(e, rsd=s.rsd).alias(f"_d{i}"))
        if s.hist:
            b = _bucket_col(e, s.hist)
            for j in range(-1, s.hist.bins + 1):
                aggs.append(F.count(F.when(b == F.lit(j), 1)).alias(f"_h{i}_{j + 1}"))
    row = df.agg(*aggs).collect()[0].asDict()

    out = {}
    total = row["_total"]
    for i, s in enumerate(specs):
        non_null = row[f"_c{i}"]
        rec = {
            "count": total,
            "non_null": non_null,
            "nulls": total - non_null,
            "min": row[f"_min{i}"],
            "max": row[f"_max{i}"],
            "approx_distinct": row[f"_d{i}"],
            "hist": None,
            "hist_spec": None,
        }
        if s.hist:
            rec["hist"] = [
                row[f"_h{i}_{j + 1}"] for j in range(-1, s.hist.bins + 1)
            ]
            rec["hist_spec"] = {
                "lo": s.hist.lo,
                "hi": s.hist.hi,
                "bins": s.hist.bins,
            }
        out[s.name] = rec
    return out


def _explode_cells(row: DataFrame, structs: Sequence[Column]) -> DataFrame:
    """Pivot a one-row fused-agg result into a relation: one output row
    per struct, keeping everything a DataFrame plan (shared by every
    *_relation profiler below)."""
    return row.select(F.explode(F.array(*structs)).alias("_p")).select("_p.*")


def profile_relation(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """Per-column stats as a RELATION (one row per column), for numeric
    columns: (column, n_rows, n_nulls, min_value, max_value, n_distinct).

    Same single-pass fused-agg design as `profile`, reshaped via an
    array-of-structs explode so the result stays a DataFrame plan.
    Distinct counts are EXACT here (count_distinct) so a SQL oracle can
    reproduce them; the dict-returning `profile` uses HLL
    (approx_count_distinct) for the 100 TB path — swap deliberately.
    """
    aggs = [F.count(F.lit(1)).alias("_total")]
    for i, c in enumerate(columns):
        e = F.col(c)
        aggs.append(F.count(e).alias(f"_c{i}"))
        aggs.append(F.min(e).cast("double").alias(f"_min{i}"))
        aggs.append(F.max(e).cast("double").alias(f"_max{i}"))
        aggs.append(F.count_distinct(e).alias(f"_d{i}"))
    row = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("_total").alias("n_rows"),
            (F.col("_total") - F.col(f"_c{i}")).alias("n_nulls"),
            F.col(f"_min{i}").alias("min_value"),
            F.col(f"_max{i}").alias("max_value"),
            F.col(f"_d{i}").alias("n_distinct"),
        )
        for i, c in enumerate(columns)
    ]
    return _explode_cells(row, structs)


def top_values(df: DataFrame, columns: Sequence[str], k: int = 10) -> DataFrame:
    """Heavy hitters per column: (column, value, n, rank) for the k most
    frequent non-null values, ties broken by value ascending.

    Plan: one grouped count per column (map-side partial agg absorbs hot
    keys, so skew is bounded by the distinct-value count per partition),
    then a per-column distributed top-k (orderBy+limit ->
    TakeOrderedAndProject: per-task k-row heaps merged on the driver)
    BEFORE the union. A high-cardinality column therefore never funnels
    its full distinct-value relation through one window task — the rank
    window runs over the unioned k*|columns|-row result only. Guarded in
    tests/test_plans_salt.py. For low-cardinality columns this is the
    exact complement of the HLL sketches in `profile`."""
    per_col = []
    for c in columns:
        per_col.append(
            df.where(F.col(c).isNotNull())
            .groupBy(F.col(c).cast("string").alias("value"))
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.col("n").desc(), F.col("value").asc())
            .limit(k)
            .select(F.lit(c).alias("column"), "value", "n")
        )
    counts = reduce(DataFrame.unionByName, per_col)
    w = Window.partitionBy("column").orderBy(F.col("n").desc(), F.col("value").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("int"))
        .select("column", "value", "n", "rank")
    )


def _percentile_from_sorted(values, cum, q: float):
    """Value of the exact interpolated percentile given the SORTED
    distinct values of a column and their cumulative counts —
    a faithful replica of Spark's Percentile.getPercentile so the
    two paths produce bit-identical doubles: position = q * (N - 1)
    (0-based), lower/higher = floor/ceil, value lookup = first index
    whose cumulative count reaches position+1, and the interpolation
    (higher - p) * v_lo + (p - lower) * v_hi evaluated in that exact
    double-op order (with Spark's two early returns: no fraction, and
    equal bounding values)."""
    import math

    import numpy as np

    n = int(cum[-1])
    p = q * (n - 1)
    lower = math.floor(p)
    higher = math.ceil(p)
    v_lo = float(values[np.searchsorted(cum, lower + 1, side="left")])
    if higher == lower:
        return v_lo
    v_hi = float(values[np.searchsorted(cum, higher + 1, side="left")])
    if v_hi == v_lo:
        return v_lo
    return (higher - p) * v_lo + (p - lower) * v_hi


def _value_counts_cells(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """(column, v, c) distinct-value counts for every requested column
    in ONE scan: inline a (column, value) struct array, drop nulls,
    and run a codegen'd map-side-combined hash agg — the parallel
    replacement for feeding raw rows to the exact `percentile`
    buffer's boxed per-row map (measured 25x slower per row, see
    OPTIMIZATION_r06.md)."""
    cells = df.select(
        F.inline(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("double").alias("v"),
                    )
                    # unique: a column listed twice must not double its
                    # value counts (the grid join re-emits duplicates)
                    for c in dict.fromkeys(columns)
                ]
            )
        )
    ).where(F.col("v").isNotNull())
    return cells.groupBy("column", "v").agg(F.count(F.lit(1)).alias("c"))


def _qgrid_literal(spark, columns, rows, schema: str) -> DataFrame:
    return spark.createDataFrame(rows, schema)


def quantiles_relation(
    df: DataFrame, columns: Sequence[str], qs: Sequence[float] = (0.25, 0.5, 0.75)
) -> DataFrame:
    """Exact interpolated quantiles per column as a relation
    (column, q, quantile) — same semantics as ANSI quantile_cont /
    Spark's exact `percentile` (position q*(n-1), linear
    interpolation), computed scalably in two keyed stages instead of
    one giant aggregation buffer:

    1. (column, value) distinct counts: one scan, one codegen'd
       map-side-combined hash agg (`_value_counts_cells`). This is the
       only corpus-sized shuffle, and it moves distinct values, not
       rows.
    2. per-column quantile assembly: one applyInPandas group per
       column sorts its DISTINCT values in numpy and replicates
       Spark's Percentile.getPercentile arithmetic bit-for-bit
       (`_percentile_from_sorted`).

    The old single `percentile(col, array(qs))` agg fed every raw row
    through a boxed value->count map in ONE task (sf1.0 measured:
    17.7 s for one 4.6M-distinct column; this path: < 3 s for three).
    Columns with no non-null values surface as NULL quantiles via the
    literal (column, q) grid left join — the same rows the old plan
    emitted."""
    spark = df.sparkSession
    q_list = [float(q) for q in qs]

    def _quants(pdf):
        import numpy as np
        import pandas as pd

        col = pdf["column"].iloc[0]
        v = pdf["v"].to_numpy(dtype="float64")
        c = pdf["c"].to_numpy(dtype="int64")
        order = np.argsort(v, kind="stable")
        v = v[order]
        cum = np.cumsum(c[order])
        return pd.DataFrame(
            {
                "column": [col] * len(q_list),
                "q": np.array(q_list, dtype="float64"),
                "quantile": [
                    _percentile_from_sorted(v, cum, q) for q in q_list
                ],
            }
        )

    computed = _value_counts_cells(df, columns).groupBy("column").applyInPandas(
        _quants, schema="column string, q double, quantile double"
    )
    grid = _qgrid_literal(
        spark,
        columns,
        [(c, q) for c in columns for q in q_list],
        "column string, q double",
    )
    return grid.join(computed, ["column", "q"], "left")


def approx_quantiles_relation(
    df: DataFrame,
    columns: Sequence[str],
    qs: Sequence[float] = (0.25, 0.5, 0.75),
    accuracy: int = 10_000,
) -> DataFrame:
    """The 100 TB quantile path: same (column, q, quantile) relation as
    :func:`quantiles_relation` but computed with `approx_percentile`
    (KLL-style sketch, rank error <= 1/accuracy) — constant memory per
    column instead of the exact percentile's full value-count map, and
    the same single fused-agg plan shape. Returned quantiles are actual
    data values (no interpolation)."""
    q_arr = F.array(*[F.lit(float(q)) for q in qs])
    aggs = [
        F.approx_percentile(
            F.col(c).cast("double"), q_arr, F.lit(accuracy)
        ).alias(f"_q{i}")
        for i, c in enumerate(columns)
    ]
    row = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("column"),
            F.lit(float(q)).alias("q"),
            F.col(f"_q{i}").getItem(j).alias("quantile"),
        )
        for i, c in enumerate(columns)
        for j, q in enumerate(qs)
    ]
    return _explode_cells(row, structs)


def quantiles_error_bound_relation(
    df: DataFrame,
    columns: Sequence[str],
    qs: Sequence[float] = (0.25, 0.5, 0.75),
    accuracy: int = 10_000,
    rank_margin: float = 0.01,
) -> DataFrame:
    """Exact + approx quantiles with the sketch's rank guarantee turned
    into a CHECKED relation: (column, q, exact_q, within_bound), where
    within_bound is `exact(q - m) <= approx(q) <= exact(q + m)` with
    m = rank_margin. approx_percentile returns a data value whose rank
    is within N/accuracy of qN, and exact quantile_cont values are
    monotone in q, so any margin m > 1/accuracy makes the predicate a
    sound consequence of the sketch guarantee (default: 100x slack).

    ONE fused aggregation computes, per column, exact percentiles over
    the [q-m, q, q+m] grid (one shared sort-based buffer) AND the
    approx sketch — a single pass, so the driver oracle can assert the
    bound holds without a second scan.

    Small-input soundness: the value-space bound follows from the rank
    guarantee only when the margin buys at least one whole row past the
    sketch's rank error AND quantile_cont's interpolation ceiling, i.e.
    (N-1)*m - N/accuracy >= 1. Below that resolution (tiny or heavily
    filtered inputs, where the sketch is exact anyway) within_bound is
    vacuously true rather than spuriously red."""
    if rank_margin <= 1.0 / accuracy:
        raise ValueError("rank_margin must exceed 1/accuracy for a sound bound")
    spark = df.sparkSession
    grid = []  # per q: (lo, q, hi), clamped
    for q in qs:
        grid.append(
            (max(0.0, float(q) - rank_margin), float(q),
             min(1.0, float(q) + rank_margin))
        )

    # exact side: the scalable two-stage exact-quantile path (see
    # quantiles_relation) — per column, one pandas group emits the
    # whole [q-m, q, q+m] grid plus the non-null count N from the
    # same sorted distinct-value array
    def _quants(pdf):
        import numpy as np
        import pandas as pd

        col = pdf["column"].iloc[0]
        v = pdf["v"].to_numpy(dtype="float64")
        c = pdf["c"].to_numpy(dtype="int64")
        order = np.argsort(v, kind="stable")
        v = v[order]
        cum = np.cumsum(c[order])
        n = int(cum[-1])
        return pd.DataFrame(
            {
                "column": [col] * len(grid),
                "q": np.array([t[1] for t in grid], dtype="float64"),
                "_lo": [_percentile_from_sorted(v, cum, t[0]) for t in grid],
                "_ex": [_percentile_from_sorted(v, cum, t[1]) for t in grid],
                "_hi": [_percentile_from_sorted(v, cum, t[2]) for t in grid],
                "_n": np.array([n] * len(grid), dtype="int64"),
            }
        )

    exact = _value_counts_cells(df, columns).groupBy("column").applyInPandas(
        _quants,
        schema=(
            "column string, q double, _lo double, _ex double, "
            "_hi double, _n bigint"
        ),
    )
    lit_grid = _qgrid_literal(
        spark,
        columns,
        [(c, t[1]) for c in columns for t in grid],
        "column string, q double",
    )
    # approx side: one fused sketch agg over the raw table (constant
    # memory per column); its single row broadcast-joins to the
    # grid-sized exact relation
    uniq = list(dict.fromkeys(columns))
    sk_row = df.agg(
        *[
            F.approx_percentile(
                F.col(c).cast("double"),
                F.array(*[F.lit(float(q)) for q in qs]),
                F.lit(accuracy),
            ).alias(f"_a{i}")
            for i, c in enumerate(uniq)
        ]
    )
    joined = lit_grid.join(exact, ["column", "q"], "left").join(
        F.broadcast(sk_row)
    )
    q_index = F.array(*[F.lit(float(q)) for q in qs])
    ap_by_col = None
    for i, c in enumerate(uniq):
        sk = F.col(f"_a{i}").getItem(
            F.array_position(q_index, F.col("q")).cast("int") - 1
        ).cast("double")
        cond = F.col("column") == c
        ap_by_col = (
            F.when(cond, sk) if ap_by_col is None
            else ap_by_col.when(cond, sk)
        )
    n = F.coalesce(F.col("_n"), F.lit(0).cast("bigint"))
    # resolution guard (docstring): the check binds only when
    # (N-1)*m - N/accuracy >= 1; under that it is vacuous-true
    resolvable = (
        (n - 1) * F.lit(rank_margin) - n / F.lit(float(accuracy))
    ) >= 1
    ap = ap_by_col
    return joined.select(
        "column",
        "q",
        F.col("_ex").alias("exact_q"),
        (
            ~resolvable | ((ap >= F.col("_lo")) & (ap <= F.col("_hi")))
        ).alias("within_bound"),
    )


def entropy_relation(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """Shannon entropy (nats) + distinctness of each column's non-null
    value distribution — the Deequ analyzer pair the fused min/max/HLL
    profiler can't express (entropy needs per-VALUE counts).

    Plan: ONE stacked scan (explode of a per-row column->value map, so
    N columns still read the input once) -> ONE (column, value) hash
    aggregation (map-side combined — a hot value pre-reduces per
    partition) -> a per-column rollup over the DISTINCT-value relation,
    which is cardinality-sized, not row-count-sized. No window, no
    sort, no Python. entropy = ln(n) - sum(c*ln c)/n, rounded to 6
    decimals because the sum over distinct values is
    floating-point-order-dependent (same canonicalization as
    text.unigram_logprob); distinctness = n_distinct/n divides exact
    longs. Columns with zero non-null values emit no row."""
    kv = []
    for c in columns:
        kv.append(F.lit(c))
        kv.append(F.col(c).cast("string"))
    stacked = df.select(
        F.explode(F.create_map(*kv)).alias("col_name", "value")
    ).where(F.col("value").isNotNull())
    vc = stacked.groupBy("col_name", "value").agg(
        F.count(F.lit(1)).alias("c")
    )
    cd = F.col("c").cast("double")
    per = vc.groupBy("col_name").agg(
        F.sum("c").alias("n_values"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(cd * F.log(cd)).alias("_s"),
    )
    n_d = F.col("n_values").cast("double")
    return per.select(
        "col_name",
        "n_values",
        "n_distinct",
        (F.col("n_distinct").cast("double") / n_d).alias("distinctness"),
        F.round(F.log(n_d) - F.col("_s") / n_d, 6).alias("entropy"),
    )


def correlation_relation(
    df: DataFrame, pairs: Sequence[tuple]
) -> DataFrame:
    """Pearson correlation per (x, y) numeric column pair — Deequ's
    Correlation analyzer. ONE fused aggregation carries five sums per
    pair (n, Σx, Σy, Σxy, Σx², Σy²) over rows where BOTH sides are
    non-null (pairwise deletion), and r is assembled from the sums with
    the textbook formula — NOT the engine's built-in corr(), whose
    accumulation scheme differs between engines — then rounded to 6
    decimals (FP-order-dependent sums; unigram_logprob precedent). NULL
    when either side is constant (zero variance) or fewer than 2 pairs.
    Scale shape: one scan, map-side combined partial sums, a 1-row
    result — the same job regardless of row count."""
    aggs = []
    for i, (x, y) in enumerate(pairs):
        both = F.col(x).isNotNull() & F.col(y).isNotNull()
        xd = F.when(both, F.col(x).cast("double"))
        yd = F.when(both, F.col(y).cast("double"))
        aggs += [
            F.count(F.when(both, 1)).alias(f"_n{i}"),
            F.sum(xd).alias(f"_sx{i}"),
            F.sum(yd).alias(f"_sy{i}"),
            F.sum(xd * yd).alias(f"_sxy{i}"),
            F.sum(xd * xd).alias(f"_sxx{i}"),
            F.sum(yd * yd).alias(f"_syy{i}"),
        ]
    row = df.agg(*aggs)
    structs = []
    for i, (x, y) in enumerate(pairs):
        n = F.col(f"_n{i}").cast("double")
        sx, sy = F.col(f"_sx{i}"), F.col(f"_sy{i}")
        sxy, sxx, syy = F.col(f"_sxy{i}"), F.col(f"_sxx{i}"), F.col(f"_syy{i}")
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        r = F.when(
            (n >= 2) & (vx > 0) & (vy > 0),
            F.round((n * sxy - sx * sy) / F.sqrt(vx * vy), 6),
        )
        structs.append(
            F.struct(
                F.lit(x).alias("x"),
                F.lit(y).alias("y"),
                F.col(f"_n{i}").alias("n_pairs"),
                r.alias("corr"),
            )
        )
    return _explode_cells(row, structs)


def mutual_information_relation(
    df: DataFrame, x: str, y: str
) -> DataFrame:
    """Mutual information (nats) between two categorical columns —
    Deequ's MutualInformation analyzer. MI = Σ_xy p_xy·ln(n·c_xy /
    (c_x·c_y)); rows with a NULL on either side are excluded.

    Plan: ONE (x, y) hash aggregation over the fact table (the only
    row-count-sized shuffle, map-side combined), then BOTH marginals
    derived from the pair relation itself — c_x = Σ_y c_xy — so the
    fact table is scanned once and everything downstream is
    pair-cardinality-sized: two tiny aggs broadcast-joined back, one
    term sum. Result rounded to 6 decimals (FP-order-dependent term
    sum; unigram_logprob precedent). Returns 1 row (x, y, n_pairs,
    mi); mi is NULL when no co-occurring rows exist. MI >= 0 up to
    rounding; equals 0 iff independent."""
    both = F.col(x).isNotNull() & F.col(y).isNotNull()
    pairs = (
        df.where(both)
        .groupBy(F.col(x).alias("_x"), F.col(y).alias("_y"))
        .agg(F.count(F.lit(1)).alias("_cxy"))
    )
    mx = pairs.groupBy("_x").agg(F.sum("_cxy").alias("_cx"))
    my = pairs.groupBy("_y").agg(F.sum("_cxy").alias("_cy"))
    tot = pairs.agg(F.sum("_cxy").alias("_n"))
    joined = (
        pairs.join(F.broadcast(mx), "_x")
        .join(F.broadcast(my), "_y")
        .crossJoin(F.broadcast(tot))
    )
    n = F.col("_n").cast("double")
    terms = joined.select(
        F.col("_cxy"),
        (
            (F.col("_cxy").cast("double") / n)
            * F.log(
                n
                * F.col("_cxy").cast("double")
                / (F.col("_cx").cast("double") * F.col("_cy").cast("double"))
            )
        ).alias("_t"),
    )
    out = terms.agg(
        F.sum("_cxy").alias("n_pairs"), F.round(F.sum("_t"), 6).alias("mi")
    )
    return out.select(
        F.lit(x).alias("x"), F.lit(y).alias("y"), "n_pairs", "mi"
    )


def save_baseline(path: str, prof: dict) -> None:
    with open(path, "w") as f:
        json.dump(prof, f, sort_keys=True)


def load_baseline(path: str) -> dict:
    with open(path) as f:
        return json.load(f)
