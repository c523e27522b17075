"""Cross-table row parity checks (input_hint: per-turn text equality
under stable (conv_id, turn_idx) ordering).

Compares two relations of the same shape — e.g. this engine's input
snapshot vs the reference system's — and emits one violation row per
key whose payload differs or that exists on only one side. Spark gives
no implicit row order, so identity is the KEY, never the position:
the stable-ordering requirement is satisfied by joining on the full
ordering key (conv_id, turn_idx) rather than sorting and zipping.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def text_parity_violations(
    a: DataFrame,
    b: DataFrame,
    key_cols: Sequence[str],
    text_col: str = "text",
) -> DataFrame:
    """(key..., value_a, value_b, mismatch_kind) for every key where the
    text differs between a and b, or the row is missing on either side.

    Plan: one full-outer shuffle join on the key (both sides hashed on
    the same key, so co-partitioning/bucketing by the key makes this
    shuffle-free at scale), then a null-safe equality filter. An empty
    result IS the parity assertion."""
    keys = list(key_cols)
    left = a.select(
        *keys, F.col(text_col).alias("_va"), F.lit(True).alias("_pa")
    )
    right = b.select(
        *keys, F.col(text_col).alias("_vb"), F.lit(True).alias("_pb")
    )
    joined = left.join(right, keys, "full_outer")
    kind = (
        F.when(F.col("_pa").isNull(), F.lit("missing_in_a"))
        .when(F.col("_pb").isNull(), F.lit("missing_in_b"))
        .otherwise(F.lit("text_mismatch"))
    )
    return (
        joined.where(
            F.col("_pa").isNull()
            | F.col("_pb").isNull()
            | ~F.col("_va").eqNullSafe(F.col("_vb"))
        )
        .select(
            *keys,
            F.col("_va").alias("value_a"),
            F.col("_vb").alias("value_b"),
            kind.alias("mismatch_kind"),
        )
    )


def assert_text_parity(
    a: DataFrame, b: DataFrame, key_cols: Sequence[str], text_col: str = "text"
) -> None:
    """Raise AssertionError with a small sample of mismatches unless the
    two relations agree on text for every key."""
    bad = text_parity_violations(a, b, key_cols, text_col)
    sample = bad.limit(5).collect()
    if sample:
        raise AssertionError(
            f"text parity violated; first mismatches: {sample}"
        )
