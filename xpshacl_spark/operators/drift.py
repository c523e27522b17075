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
    one-row result then explodes into a (bin, ca, cb) relation of
    bins+2 rows, over which totals / eps-floored proportions /
    cumulative ECDFs are window + aggregate expressions: every
    subexpression is computed once per bin row, keeping the Catalyst
    tree O(bins) (the all-in-one-expression form duplicates the
    (bins+2)-term total inside every cumulative term — O(bins^3) nodes
    at the 64-bin default, past the 64 KB codegen limit). The final
    stats aggregate one 66-row partition; the heavy work stays in the
    first fused agg. Formulas mirror psi_statistic / ks_statistic
    exactly (accumulation in bin order, as a left-associated sum), so
    an ANSI-SQL oracle reproduces the doubles. In-range values are
    floor-binned with a clamp to bins-1 (width = (hi-lo)/bins is
    inexact in doubles; an unclamped floor can emit `bins` for a value
    just under hi, misfiling it as overflow)."""
    from pyspark.sql import Window
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
            .otherwise(
                F.least(
                    F.floor((v - F.lit(float(lo))) / F.lit(width)).cast("int"),
                    F.lit(bins - 1),
                )
            )
        )
        return proj.select(b.alias("_b"), F.lit(tag).alias("_t"))

    u = _bucket(df_a, 0).unionByName(_bucket(df_b, 1))
    n = bins + 2  # underflow + bins + overflow
    aggs = []
    for side in (0, 1):
        for j in range(n):
            aggs.append(
                F.coalesce(  # empty union: 0 counts, not NULL
                    F.sum(
                        (
                            (F.col("_t") == side) & (F.col("_b") == j - 1)
                        ).cast("long")
                    ),
                    F.lit(0),
                ).alias(f"_c{side}_{j}")
            )
    row = u.agg(*aggs)
    cells = row.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        F.col(f"_c0_{j}").alias("ca"),
                        F.col(f"_c1_{j}").alias("cb"),
                    )
                    for j in range(n)
                ]
            )
        ).alias("_x")
    ).select("_x.*")
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_cum = Window.partitionBy().orderBy("j").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # totals once per row; proportions floored at eps (psi_statistic's
    # _proportions: an empty side is all-eps)
    staged = cells.select(
        "j",
        "ca",
        "cb",
        F.sum("ca").over(w_all).alias("ta"),
        F.sum("cb").over(w_all).alias("tb"),
    )

    def _prop(c, total):
        return F.when(
            total > 0,
            F.greatest(c.cast("double") / total.cast("double"), F.lit(eps)),
        ).otherwise(F.lit(eps))

    q = _prop(F.col("ca"), F.col("ta"))  # baseline
    p = _prop(F.col("cb"), F.col("tb"))  # current
    ta_d = F.when(F.col("ta") > 0, F.col("ta").cast("double")).otherwise(
        F.lit(1.0)
    )
    tb_d = F.when(F.col("tb") > 0, F.col("tb").cast("double")).otherwise(
        F.lit(1.0)
    )
    terms = staged.select(
        ((p - q) * F.log(p / q)).alias("_psi_term"),
        F.abs(
            F.sum(F.col("cb").cast("double") / tb_d).over(w_cum)
            - F.sum(F.col("ca").cast("double") / ta_d).over(w_cum)
        ).alias("_gap"),
    )
    out = terms.agg(
        F.sum("_psi_term").alias("_psi"), F.max("_gap").alias("_ks")
    )
    structs = F.array(
        F.struct(F.lit("psi").alias("stat"), F.col("_psi").alias("value")),
        F.struct(F.lit("ks").alias("stat"), F.col("_ks").alias("value")),
    )
    return out.select(F.explode(structs).alias("_s")).select("_s.*")
