"""Sequence packing: assign documents to fixed-token-budget training
packs (concat-and-chunk, the standard LLM pretraining layout).

Each document is placed at the global running token offset of all
documents before it (in `id_col` order); its pack is the chunk its
first token lands in. The core primitive is a GLOBAL prefix sum —
naively a window over `ORDER BY id` with no partition, which Spark
executes as a single-task sort (the exact anti-pattern the vocabulary
fix removed). This module uses the classic scalable decomposition:

1. range-repartition by id (so partition i holds an ascending id range),
2. ONE small aggregation: per-partition token totals (N rows, N =
   number of partitions),
3. driver-side exclusive prefix over those N numbers (trivially cheap),
4. broadcast the per-partition offsets back and finish with a window
   PARTITIONED by partition id — every partition computes its local
   cumulative sum in parallel and adds its offset.

The result is byte-identical to the global window (prefix sums don't
care where the partition boundaries fall) but the plan is two narrow
shuffles and a broadcast instead of a one-task global sort. Oracled
against DuckDB's global-window form in __spark_entry__.q_pack_documents.

The reference has no notion of this operator (it is an LLM-pipeline
addition per SURVEY.md §2E); packing semantics follow the
concat-and-chunk scheme used by GPT-style pretraining data loaders.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int,
    n_partitions: Optional[int] = None,
) -> DataFrame:
    """Return (id_col, n_tokens, pack_id, pack_offset) where pack_id =
    floor(running_offset / budget) and pack_offset = running_offset %
    budget, with running_offset the exclusive prefix sum of
    `tokens_col` in ascending `id_col` order.

    Rows with NULL id or NULL/negative token counts are excluded (a
    document with no tokens occupies no space but would make offsets
    ambiguous; filter upstream if they must be kept).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    spark = df.sparkSession
    if n_partitions is None:
        n_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    base = df.select(
        F.col(id_col), F.col(tokens_col).cast("long").alias("n_tokens")
    ).where(F.col(id_col).isNotNull() & (F.col("n_tokens") >= 0))

    # 1. ascending id ranges per partition; cache so the totals pass and
    # the final pass see the SAME partitioning without recomputing the
    # (possibly expensive) upstream plan twice. localCheckpoint holds
    # the (id, n_tokens) projection in executor storage — two narrow
    # longs per row, ~16 bytes/doc, so even 10^10 docs fit a modest
    # cluster; for larger-than-memory safety swap in a parquet
    # write/read round-trip at the same point.
    ranged = (
        base.repartitionByRange(n_partitions, F.col(id_col))
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )

    # 2.+3. tiny driver-side exclusive prefix over per-partition totals
    totals = ranged.groupBy("_pid").agg(F.sum("n_tokens").alias("_t")).collect()
    offsets = []
    run = 0
    for row in sorted(totals, key=lambda r: r["_pid"]):
        offsets.append((row["_pid"], run))
        run += row["_t"]
    if not offsets:
        # preserve the INPUT id type in the empty result (a hardcoded
        # type would break unionByName with a non-empty run's output)
        from pyspark.sql import types as T

        id_field = base.schema[id_col]
        return spark.createDataFrame(
            [],
            T.StructType(
                [
                    T.StructField(id_col, id_field.dataType, id_field.nullable),
                    T.StructField("n_tokens", T.LongType()),
                    T.StructField("pack_id", T.LongType()),
                    T.StructField("pack_offset", T.LongType()),
                ]
            ),
        )
    off_df = F.broadcast(
        spark.createDataFrame(offsets, "_pid int, _part_off long")
    )

    # 4. per-partition (parallel) local cumulative sums + the offset
    w = (
        Window.partitionBy("_pid")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_before: Column = (
        F.sum("n_tokens").over(w) - F.col("n_tokens") + F.col("_part_off")
    )
    # exact LONG arithmetic for both outputs: `/` on longs is DOUBLE
    # division in Spark, and beyond ~2^53 cumulative tokens its rounded
    # floor can disagree with the exact `%` — SQL `div` is integral
    # division on longs, keeping pack_id*budget + pack_offset == offset
    # at any corpus size
    return (
        ranged.join(off_df, "_pid")
        .select(
            F.col(id_col),
            F.col("n_tokens"),
            cum_before.alias("_cumb"),
        )
        .select(
            id_col,
            "n_tokens",
            F.expr(f"_cumb div {int(budget)}").alias("pack_id"),
            (F.col("_cumb") % F.lit(budget)).alias("pack_offset"),
        )
    )
