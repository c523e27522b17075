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
