"""Distribution-drift statistics over merged histogram bins.

The expensive part (per-bin counts) runs as one fused Spark aggregation
(see compiler._compile_drift_checks / profiler.profile); these finals
run on the driver over tiny arrays. Deterministic given fixed bins
(SURVEY.md §4 custom item 2). The reference has no drift checks — this
is a north-rule addition (BASELINE.json north_star).
"""

from __future__ import annotations

import math
from typing import Sequence


def _proportions(counts: Sequence[float], eps: float) -> list[float]:
    total = float(sum(counts))
    if total <= 0:
        return [eps] * len(counts)
    return [max(c / total, eps) for c in counts]


def psi_statistic(
    baseline: Sequence[float], current: Sequence[float], eps: float = 1e-6
) -> float:
    """Population Stability Index: sum (p_i - q_i) * ln(p_i / q_i).

    Conventional read: <0.1 stable, 0.1-0.2 moderate, >0.2 drifted.
    Small-count bins are floored at eps to keep the statistic finite.
    """
    if len(baseline) != len(current):
        raise ValueError("bin count mismatch")
    p = _proportions(current, eps)
    q = _proportions(baseline, eps)
    return float(sum((pi - qi) * math.log(pi / qi) for pi, qi in zip(p, q)))


def ks_statistic(
    baseline: Sequence[float], current: Sequence[float]
) -> float:
    """Two-sample Kolmogorov-Smirnov statistic approximated on shared
    fixed bins: max |ECDF_current - ECDF_baseline| over bin edges."""
    if len(baseline) != len(current):
        raise ValueError("bin count mismatch")
    tb = float(sum(baseline)) or 1.0
    tc = float(sum(current)) or 1.0
    cb = cc = 0.0
    gap = 0.0
    for b, c in zip(baseline, current):
        cb += b / tb
        cc += c / tc
        gap = max(gap, abs(cc - cb))
    return float(gap)


def bin_index(col, lo: float, width: float, nbins: int):
    """Fixed-bin histogram index as a Spark Column:
    clamp(floor((col - lo) / width), 0, nbins - 1). The ONE definition
    shared by the batch profiler baseline and streaming.windowed_drift —
    baseline and live windows must bin a value identically or PSI
    measures the binning skew, not drift."""
    from pyspark.sql import functions as F

    return F.least(
        F.greatest(
            F.floor((col - F.lit(float(lo))) / F.lit(float(width))).cast("int"),
            F.lit(0),
        ),
        F.lit(nbins - 1),
    )


def two_sample_drift(
    df_a,
    df_b,
    expression: str,
    lo: float,
    hi: float,
    bins: int = 64,
    eps: float = 1e-6,
):
    """Two-sample PSI + KS between the distributions of `expression` in
    df_a (baseline side, e.g. the training corpus) and df_b (current
    side, e.g. this week's ingest) over shared fixed equi-width bins
    with underflow/overflow buckets — the train-vs-prod counterpart of
    the stored-baseline Drift constraint.

    Plan: tag-union the two (bucket) projections and run ONE global
    hash aggregation with 2*(bins+2) conditional count sums (map-side
    partials; the shuffle carries one row of ints per map partition) —
    a single pass over both inputs, no groupBy key, no collect. The
    statistics are then column expressions over the one-row result, so
    the whole check is one job whose output is the tiny (stat, value)
    relation. Formulas mirror psi_statistic / ks_statistic exactly
    (eps-floored proportions; ECDF max-gap on bin edges), and term
    order is fixed so an ANSI-SQL oracle reproduces the doubles."""
    from pyspark.sql import functions as F

    width = (hi - lo) / bins

    def _bucket(df, tag):
        proj = df.select(
            F.expr(expression).cast("double").alias("_v")
        ).where(F.col("_v").isNotNull())
        v = F.col("_v")
        b = (
            F.when(v < F.lit(float(lo)), F.lit(-1))
            .when(v >= F.lit(float(hi)), F.lit(bins))
            .otherwise(F.floor((v - F.lit(float(lo))) / F.lit(width)).cast("int"))
        )
        return proj.select(b.alias("_b"), F.lit(tag).alias("_t"))

    u = _bucket(df_a, 0).unionByName(_bucket(df_b, 1))
    n = bins + 2  # underflow + bins + overflow
    aggs = []
    for side in (0, 1):
        for j in range(n):
            aggs.append(
                F.sum(
                    ((F.col("_t") == side) & (F.col("_b") == j - 1)).cast("long")
                ).alias(f"_c{side}_{j}")
            )
    row = u.agg(*aggs)

    def _props(side):
        total = None
        for j in range(n):
            c = F.col(f"_c{side}_{j}")
            total = c if total is None else total + c
        out = []
        for j in range(n):
            c = F.col(f"_c{side}_{j}").cast("double")
            out.append(
                F.when(
                    total > 0, F.greatest(c / total.cast("double"), F.lit(eps))
                ).otherwise(F.lit(eps))
            )
        return out, total

    q, ta = _props(0)  # baseline proportions
    p, tb = _props(1)  # current proportions
    psi = None
    for pj, qj in zip(p, q):
        term = (pj - qj) * F.log(pj / qj)
        psi = term if psi is None else psi + term
    # KS over raw counts (ks_statistic: totals floored at 1.0, no eps)
    ta_d = F.when(ta > 0, ta.cast("double")).otherwise(F.lit(1.0))
    tb_d = F.when(tb > 0, tb.cast("double")).otherwise(F.lit(1.0))
    gap = None
    ca = cb = None
    for j in range(n):
        a_j = F.col(f"_c0_{j}").cast("double") / ta_d
        b_j = F.col(f"_c1_{j}").cast("double") / tb_d
        ca = a_j if ca is None else ca + a_j
        cb = b_j if cb is None else cb + b_j
        g = F.abs(cb - ca)
        gap = g if gap is None else F.greatest(gap, g)
    structs = F.array(
        F.struct(F.lit("psi").alias("stat"), psi.alias("value")),
        F.struct(F.lit("ks").alias("stat"), gap.alias("value")),
    )
    return row.select(F.explode(structs).alias("_s")).select("_s.*")
