"""Structured Streaming validation path.

The north rule is batch-with-checkpoint (SURVEY.md §2E declares
streaming out of the reference's scope), but transcript tables are
typically FED by a stream, so the engine exposes the subset of checks
whose semantics survive unbounded input:

* row-level constraints — stateless map/filter, identical plan to the
  batch fused scan (same compiler code path);
* referential checks — stream-static broadcast LEFT ANTI joins
  (supported by Structured Streaming);
* cardinality per event-time window — `windowed_min_count` /
  `windowed_max_count`: watermarked tumbling-window counts emitted in
  append mode once the watermark closes the window.

Whole-table constraints (global uniqueness, cross-row ordering,
distribution drift) need either retractions or a bounded key horizon;
they stay batch/checkpoint concerns — `validate_stream` raises on them
rather than silently computing something weaker.
"""

from __future__ import annotations

from functools import reduce
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from xpshacl_spark.compiler import ValidationEngine, _violation_struct
from xpshacl_spark.shapes import (
    ForeignKey,
    GroupMaxCount,
    GroupMinCount,
    RowConstraint,
    Shape,
)


def validate_stream(
    stream_df: DataFrame,
    shapes: Sequence[Shape],
    key_cols: Sequence[str],
    dims: Optional[dict] = None,
) -> DataFrame:
    """Compile streaming-safe shapes against a streaming DataFrame.

    Returns a STREAMING violations DataFrame with the same schema as
    the batch engine (key cols, focus_node, §1.3 columns) — wire it to
    any sink with .writeStream. Raises ValueError when a shape carries
    a constraint whose semantics do not stream."""
    if not stream_df.isStreaming:
        raise ValueError("validate_stream expects a streaming DataFrame")
    bad = [
        (s.shape_id, type(c).__name__)
        for s in shapes
        for c in s.constraints
        if not isinstance(c, (RowConstraint, ForeignKey))
    ]
    if bad:
        raise ValueError(
            f"constraints not streamable (use the batch engine or "
            f"windowed_min_count/windowed_max_count): {bad}"
        )
    key_cols = list(key_cols)
    engine = ValidationEngine(stream_df.sparkSession, dims=dims or {})
    parts: list[DataFrame] = []
    row_df = engine._compile_row_checks(stream_df, shapes, key_cols)
    if row_df is not None:
        parts.append(row_df)
    parts.extend(engine._compile_fk_checks(stream_df, shapes, key_cols))
    if not parts:
        raise ValueError("no streamable constraints in the given shapes")
    violations = reduce(lambda a, b: a.unionByName(b), parts)
    return engine._with_focus_node(violations, key_cols)


def _windowed_counts(
    stream_df: DataFrame,
    group_by: Sequence[str],
    ts_col: str,
    window_duration: str,
    watermark: str,
    where: Optional[str],
) -> DataFrame:
    cond = (
        F.coalesce(F.expr(where), F.lit(False)) if where else F.lit(True)
    )
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_duration).alias("_w"), *group_by)
        .agg(
            F.count(F.when(cond, 1)).alias("_n"),
            F.count(F.lit(1)).alias("_total"),
        )
    )


def _windowed_violations(
    counts: DataFrame,
    shape: Shape,
    c,
    violated: Column,
    group_by: Sequence[str],
    bound_key: str,
    bound_val: int,
) -> DataFrame:
    ctx = F.create_map(
        F.lit(bound_key), F.lit(str(bound_val)),
        F.lit("actualCount"), F.col("_n").cast("string"),
        F.lit("windowStart"), F.col("_w.start").cast("string"),
        F.lit("windowEnd"), F.col("_w.end").cast("string"),
    )
    v = _violation_struct(shape, c, F.col("_n").cast("string"), ctx)
    out = counts.where(violated).select(
        *group_by,
        F.col("_w.start").alias("window_start"),
        v.alias("_v"),
    )
    return out.select(*group_by, "window_start", "_v.*")


def windowed_min_count(
    stream_df: DataFrame,
    shape: Shape,
    ts_col: str = "ts",
    window_duration: str = "10 minutes",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Event-time windowed sh:minCount: within each (group, tumbling
    window) that received ANY row, at least min_count rows must match
    the constraint's `where`. Emitted in append mode once the watermark
    closes the window.

    Caveat (inherent to streaming): a (group, window) with ZERO rows at
    all never materializes — absent-group detection stays a batch
    concern (GroupMinCount + key universe)."""
    cs = [c for c in shape.group_constraints() if isinstance(c, GroupMinCount)]
    if len(cs) != 1:
        raise ValueError("shape must carry exactly one GroupMinCount")
    c = cs[0]
    counts = _windowed_counts(
        stream_df, c.group_by, ts_col, window_duration, watermark, c.where
    )
    return _windowed_violations(
        counts, shape, c, F.col("_n") < F.lit(c.min_count), c.group_by,
        "minCount", c.min_count,
    )


def windowed_max_count(
    stream_df: DataFrame,
    shape: Shape,
    ts_col: str = "ts",
    window_duration: str = "10 minutes",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Event-time windowed sh:maxCount (rate-limit-style check)."""
    cs = [c for c in shape.group_constraints() if isinstance(c, GroupMaxCount)]
    if len(cs) != 1:
        raise ValueError("shape must carry exactly one GroupMaxCount")
    c = cs[0]
    counts = _windowed_counts(
        stream_df, c.group_by, ts_col, window_duration, watermark, c.where
    )
    return _windowed_violations(
        counts, shape, c, F.col("_n") > F.lit(c.max_count), c.group_by,
        "maxCount", c.max_count,
    )
