"""Bucketed-storage plan regressions: the write-once-shuffle-never
story must actually hold in the physical plan."""

import os
import sys

import pytest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from pyspark.sql import functions as F

from xpshacl_spark.operators.bucketing import colocated_join, write_bucketed


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    docs = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("grp")
    )
    meta = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"), (F.col("id") * 3).alias("score")
    )
    write_bucketed(docs, "b_docs", ["doc_id"], 8, sort_cols=["doc_id"],
                   path=str(tmp_path / "b_docs"))
    write_bucketed(meta, "b_meta", ["doc_id"], 8, sort_cols=["doc_id"],
                   path=str(tmp_path / "b_meta"))
    yield "b_docs", "b_meta"
    spark.sql("DROP TABLE IF EXISTS b_docs")
    spark.sql("DROP TABLE IF EXISTS b_meta")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    left, right = bucketed_pair
    # forbid broadcast so the join would otherwise require a shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = colocated_join(spark, left, right, ["doc_id"])
        plan = _plan(j)
        assert "Exchange" not in plan, plan
        assert j.count() == 2000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_groupby_has_no_exchange(spark, bucketed_pair):
    left, _ = bucketed_pair
    agg = spark.table(left).groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    plan = _plan(agg)
    assert "Exchange" not in plan, plan
    assert agg.count() == 2000


def test_unbucketed_baseline_does_shuffle(spark, bucketed_pair, tmp_path):
    """Control: the same join over plain parquet DOES shuffle — proving
    the bucketed plans above are the bucketing's doing."""
    left, right = bucketed_pair
    spark.table(left).write.mode("overwrite").parquet(str(tmp_path / "plain_l"))
    spark.table(right).write.mode("overwrite").parquet(str(tmp_path / "plain_r"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.read.parquet(str(tmp_path / "plain_l")).join(
            spark.read.parquet(str(tmp_path / "plain_r")), ["doc_id"]
        )
        assert "Exchange" in _plan(j)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_one_file_per_bucket(spark, bucketed_pair, tmp_path):
    files = [
        f for f in os.listdir(str(tmp_path / "b_docs")) if f.endswith(".parquet")
    ]
    assert len(files) == 8  # repartition-before-write keeps 1 file/bucket
