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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_UNIT_SECONDS = {
    "second": 1,
    "minute": 60,
    "hour": 3600,
    "day": 86400,
    "week": 604800,
}


def _parse_bin_width(bin_width: str) -> tuple[int, str]:
    parts = bin_width.strip().split()
    if len(parts) == 1:
        count, unit = 1, parts[0]
    elif len(parts) == 2:
        count, unit = int(parts[0]), parts[1]
    else:
        raise ValueError(f"bin_width must be '[N] unit', got {bin_width!r}")
    unit = unit.lower().rstrip("s")
    if count < 1:
        raise ValueError(f"bin_width count must be >= 1, got {bin_width!r}")
    return count, unit


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

    Bins are computed ARITHMETICALLY for fixed-width units: bucket =
    floor(epoch_seconds / width_seconds) on both sides, so any 'N unit'
    width ('2 hours', '30 minutes', ...) aligns point bins with interval
    bins and the interval's bin sequence covers its full [start, end]
    span. (The earlier date_trunc formulation silently dropped matches
    for N != 1: point bins only landed on interval bins when the step
    equaled one trunc unit, and sequence() stopped short of end.)
    Both sides pass through the same monotonic epoch mapping, so bucket
    membership is consistent regardless of session timezone; the exact
    BETWEEN filter then restores precise semantics. Calendar units
    (month/year) have no fixed width — they use date_trunc stepping and
    only allow count == 1.

    Pick bin_width on the order of the typical interval length: wider
    bins shrink the explode factor, narrower bins shrink per-bin
    candidates."""
    count, unit = _parse_bin_width(bin_width)
    if unit in _UNIT_SECONDS:
        width = count * _UNIT_SECONDS[unit]

        def _bucket(c: str) -> Column:
            # cast -> epoch seconds (monotonic; truncation is fine
            # because the exact containment filter runs after the join)
            return F.floor(F.col(c).cast("timestamp").cast("long") / width)

        bins = F.sequence(_bucket(start_ts), _bucket(end_ts))
        point_bin = _bucket(point_ts)
    elif unit in ("month", "year"):
        if count != 1:
            raise ValueError(
                f"calendar unit bins support only count 1, got {bin_width!r}"
            )
        bins = F.sequence(
            F.date_trunc(unit, F.col(start_ts)),
            F.date_trunc(unit, F.col(end_ts)),
            F.expr(f"INTERVAL 1 {unit}"),
        )
        point_bin = F.date_trunc(unit, F.col(point_ts))
    else:
        raise ValueError(f"unsupported bin_width unit in {bin_width!r}")
    tagged_i = intervals.withColumn("_bin", F.explode(bins))
    tagged_p = points.withColumn("_bin", point_bin)
    on = [*keys, "_bin"]
    return (
        tagged_p.join(tagged_i, on)
        .where(
            (F.col(point_ts) >= F.col(start_ts))
            & (F.col(point_ts) <= F.col(end_ts))
        )
        .drop("_bin")
    )
