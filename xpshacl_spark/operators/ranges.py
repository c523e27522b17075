"""Range (interval containment) joins without a cross join.

Spark has no native range-join optimization for `point BETWEEN start
AND end` predicates — naively they plan as BroadcastNestedLoop or a
cartesian product. The scalable composition: discretize the time axis
into fixed bins, explode each interval into the bins it covers, tag
each point with its bin, equi-join on (key..., bin), then apply the
exact containment filter. Join fan-out is bounded by interval length /
bin width; each (point, interval) pair meets at most once because a
point lives in exactly one bin.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    keys: Sequence[str] = (),
    bin_width: str = "1 hour",
) -> DataFrame:
    """Inner-join each point row to every interval row containing it
    (inclusive bounds), optionally also matching on `keys`.

    All time math stays in timestamp/interval space (no epoch casts —
    TIMESTAMP_NTZ-safe and engine-agnostic). Pick bin_width on the
    order of the typical interval length: wider bins shrink the explode
    factor, narrower bins shrink per-bin candidates."""
    step = F.expr(f"INTERVAL {bin_width}")
    trunc_unit = bin_width.strip().split()[-1].rstrip("s")
    bins = F.sequence(
        F.date_trunc(trunc_unit, F.col(start_ts)),
        F.date_trunc(trunc_unit, F.col(end_ts)),
        step,
    )
    tagged_i = intervals.withColumn("_bin", F.explode(bins))
    tagged_p = points.withColumn(
        "_bin", F.date_trunc(trunc_unit, F.col(point_ts))
    )
    on = [*keys, "_bin"]
    return (
        tagged_p.join(tagged_i, on)
        .where(
            (F.col(point_ts) >= F.col(start_ts))
            & (F.col(point_ts) <= F.col(end_ts))
        )
        .drop("_bin")
    )
