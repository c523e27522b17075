"""Event-time sessionization and as-of joins over ordered streams.

Neither exists in the reference (SURVEY.md §2E: no window functions at
all); both are table-stakes for transcript/event analytics at scale and
compile to ONE shuffle+sort per (partition key, order) spec — the same
window Spark already materializes for the Monotonic ordering check, so
a suite using all three shares it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    order_cols: Sequence[str] = (),
    gap_seconds: int = 1800,
) -> DataFrame:
    """Assign a session index per key: a new session starts at the first
    event and whenever the gap to the previous event exceeds
    `gap_seconds`. Classic lag + running-sum-of-boundaries — one
    shuffle on the key, one sort, no Python.

    Ordering is (ts, *order_cols) so ties are deterministic. Returns the
    input plus `session_idx` (1-based int per key)."""
    keys = [F.col(k) for k in key_cols]
    order = [F.col(ts_col)] + [F.col(c) for c in order_cols]
    w = Window.partitionBy(*keys).orderBy(*order)
    prev = F.lag(F.col(ts_col)).over(w)
    # interval comparison, not epoch casts: TIMESTAMP_NTZ does not cast
    # to long in Spark 4, and ts - prev > INTERVAL is tz-agnostic
    gap = F.expr(f"INTERVAL {int(gap_seconds)} SECOND")
    is_new = F.when(
        prev.isNull() | ((F.col(ts_col) - prev) > gap),
        F.lit(1),
    ).otherwise(F.lit(0))
    run = Window.partitionBy(*keys).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("session_idx", F.sum(is_new).over(run).cast("int"))


def session_summary(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    order_cols: Sequence[str] = (),
    gap_seconds: int = 1800,
) -> DataFrame:
    """(key..., session_idx, n_events, session_start, session_end):
    the per-session rollup of `sessionize` — the hypertable-style
    "collapse events into visits" aggregation."""
    s = sessionize(df, key_cols, ts_col, order_cols, gap_seconds)
    return s.groupBy(*key_cols, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_col: str,
    alias: str = "asof_value",
) -> DataFrame:
    """Two-table as-of join: every left row enriched with `value_col`
    from the right row having the greatest right_ts <= left_ts within
    the key (ANSI/DuckDB ASOF JOIN semantics, inclusive bound); NULL
    when no right row precedes.

    No range join, no per-key cross join: union-tag both sides, sort by
    (key, ts, side) with right rows ordered BEFORE left rows at equal
    ts (inclusive), and carry the last matched right ROW forward (as a
    struct, so a NULL value in the matched row surfaces as NULL —
    ANSI/DuckDB ASOF semantics — instead of being skipped in favor of
    an older non-null reading) — one shuffle+sort over
    |left| + |right| rows total.

    The right side must be unique per (key, ts) — pre-aggregate
    otherwise — or the carried value at a tied ts is nondeterministic.
    """
    keys = list(key_cols)
    rv_struct = f"struct<v:{right.schema[value_col].dataType.simpleString()}>"
    l_tag = left.select(
        *keys,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(rv_struct).alias("_rv"),
        F.struct(*left.columns).alias("_lrow"),
    )
    r_tag = right.select(
        *keys,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        # struct wrapper: non-null for EVERY matched right row, so
        # ignorenulls tracks row presence, not value non-nullness
        F.struct(F.col(value_col).alias("v")).alias("_rv"),
        F.lit(None)
        .cast(l_tag.schema["_lrow"].dataType)
        .alias("_lrow"),
    )
    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(F.col("_ts"), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = l_tag.unionByName(r_tag).withColumn(
        "_last", F.last(F.col("_rv"), ignorenulls=True).over(w)
    )
    return (
        merged.where(F.col("_side") == 1)
        .select("_lrow.*", F.col("_last.v").alias(alias))
    )


def asof_lookup(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    order_cols: Sequence[str],
    value_col: Column,
    alias: str = "asof_value",
) -> DataFrame:
    """For every row, the most recent STRICTLY PRIOR non-null
    `value_col` within the key — the single-table as-of join
    (event enriched with the last reading/state before it).

    Implemented as last(value, ignorenulls) over ROWS BETWEEN UNBOUNDED
    PRECEDING AND 1 PRECEDING: no self-join, no range join — the same
    one shuffle+sort as any other window on (key, order). A two-table
    as-of is this after a unionByName of the tagged inputs."""
    order = [F.col(ts_col)] + [F.col(c) for c in order_cols]
    w = (
        Window.partitionBy(*[F.col(k) for k in key_cols])
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return df.withColumn(alias, F.last(value_col, ignorenulls=True).over(w))
