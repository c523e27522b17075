"""Bucketed (pre-shuffled) storage for co-located joins.

At 100 TB the expensive validations are the join-shaped ones: FK checks
against a dimension too big to broadcast, signature fan-out joins, and
pair-generation self-joins. Each of those shuffles BOTH sides on the
join key every run. Bucketing pays that shuffle ONCE at write time:
`df.write.bucketBy(n, key)` hash-partitions the files by key and
records the layout in the catalog, so every later equi-join or groupBy
on that key reads co-located buckets and skips the Exchange entirely
(Spark's bucketed scan sets outputPartitioning = HashPartitioning(key)).

This is the standard warehouse pattern (Spark SQL bucketing, Hive
bucketed tables); the reference has no storage layer at all — rdflib
holds the whole graph in memory — so this module is part of the
north-rule scale story, not a port. Verified by plan-regression tests:
same-bucket-count joins and groupBys over bucketed tables must show
zero shuffle exchanges (tests/test_bucketing.py).

Notes for real clusters:
* bucket counts must MATCH on both sides (or be a multiple with
  `spark.sql.bucketing.coalesceBucketsInJoin.enabled`) to avoid a
  shuffle on the mismatched side;
* `sortBy` on the bucket key additionally removes the sort before a
  sort-merge join;
* one file per bucket per writing task — repartition by the bucket key
  before writing to keep file counts = n_buckets.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Optional[Sequence[str]] = None,
    path: Optional[str] = None,
    mode: str = "overwrite",
    single_file_per_bucket: bool = True,
) -> DataFrame:
    """Persist `df` hash-bucketed by `bucket_cols` into catalog table
    `table` (external at `path` when given) and return the bucketed
    relation. One shuffle now, zero shuffles for every later equi-join
    or aggregation on the bucket key.

    single_file_per_bucket repartitions to exactly n_buckets write
    tasks, so file count = n_buckets instead of (tasks x buckets) —
    at 1000 writing tasks and 1024 buckets that is 1024 files vs a
    million. It also makes each bucket ONE task's write: size
    n_buckets so table_bytes / n_buckets stays in the low GBs, or pass
    False to let every input task write its own per-bucket files
    (more files, but bounded task sizes when n_buckets must stay small
    to match an existing table's layout).
    """
    bucket_cols = list(bucket_cols)
    src = (
        df.repartition(n_buckets, *[F.col(c) for c in bucket_cols])
        if single_file_per_bucket
        else df
    )
    writer = (
        src.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*list(sort_cols))
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
    return df.sparkSession.table(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two tables previously written with the SAME bucket spec on
    the join key. The plan is a zero-Exchange sort-merge join (each
    task reads bucket i of both sides); plan shape is pinned in
    tests/test_bucketing.py."""
    return spark.table(left_table).join(spark.table(right_table), list(on), how)
