"""Driver contract for the spark-graft builder (PySpark target).

Every query routes through the xpshacl_spark ValidationEngine (shape
compilation -> violations DataFrame), exercising one operator class
from SURVEY.md §2 each, with an equivalent DuckDB oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xpshacl_spark.compiler import ValidationEngine
from xpshacl_spark.shapes import (
    Expr,
    ForeignKey,
    GroupMinCount,
    MaxInclusive,
    MinInclusive,
    Monotonic,
    Not,
    Or,
    Pattern,
    Shape,
    Unique,
    Xone,
)

SF0001 = "/root/testdata/sf0.001"


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _one_shape_violations(
    spark: SparkSession,
    df: DataFrame,
    shape: Shape,
    key_cols: list[str],
    dims: dict | None = None,
) -> DataFrame:
    engine = ValidationEngine(spark, dims=dims or {})
    rep = engine.validate(df, [shape], key_cols=key_cols)
    return rep.violations


# ---------------------------------------------------------------------------
# queries — each exercises one operator class (SURVEY.md §2A/§2C)
# ---------------------------------------------------------------------------


def q_range_lineitem_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sh:maxInclusive (SURVEY.md §2A #7) compiled to a filter."""
    li = _load(spark, sf_dir, "lineitem")
    shape = Shape("qty_shape", (MaxInclusive("l_quantity", 30),))
    v = _one_shape_violations(spark, li, shape, ["l_orderkey", "l_linenumber"])
    return v.select(
        "l_orderkey",
        "l_linenumber",
        F.col("value").cast("double").alias("qty"),
        "constraint_component",
    )


def q_range_customer_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sh:minInclusive (SURVEY.md §2A #6; reference worked example
    README.md:176-210 — negative value vs minInclusive 0)."""
    c = _load(spark, sf_dir, "customer")
    shape = Shape("acctbal_shape", (MinInclusive("c_acctbal", 0.0),))
    v = _one_shape_violations(spark, c, shape, ["c_custkey"])
    return v.select(
        "c_custkey",
        F.col("value").cast("double").alias("acctbal"),
        "violation_type",
    )


def q_pattern_part_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sh:pattern (SURVEY.md §2A #10) via rlike."""
    p = _load(spark, sf_dir, "part")
    shape = Shape("pname_shape", (Pattern("p_name", "^[a-z]+( [a-z]+)*$"),))
    v = _one_shape_violations(spark, p, shape, ["p_partkey"])
    return v.select("p_partkey", F.col("value").alias("pname"))


def q_fk_orders_custkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential integrity via broadcast LEFT ANTI join
    (sh:class semantics, SURVEY.md §2A #4)."""
    o = _load(spark, sf_dir, "orders")
    cust = _load(spark, sf_dir, "customer")
    shape = Shape(
        "orders_fk_shape",
        (ForeignKey(("o_custkey",), "customer", ("c_custkey",)),),
    )
    v = _one_shape_violations(
        spark, o, shape, ["o_orderkey"], dims={"customer": cust}
    )
    return v.select("o_orderkey", F.col("value").alias("custkey"))


def q_unique_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniqueness check / exact dedup (north rule; sh:uniqueLang
    template, SURVEY.md §2A #12): duplicated document texts."""
    d = _load(spark, sf_dir, "documents")
    shape = Shape("doc_dup_shape", (Unique(("text",)),))
    engine = ValidationEngine(spark)
    rep = engine.validate(d, [shape], key_cols=["doc_id"])
    return rep.violations.select(
        F.col("value").alias("dup_text"),
        F.element_at(F.col("context"), "actualCount").cast("int").alias("n_dups"),
    )


def q_card_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-scope sh:minCount with key universe (SURVEY.md §2A #1 +
    §7.3 empty-group trap): customers with zero orders."""
    o = _load(spark, sf_dir, "orders")
    cust = _load(spark, sf_dir, "customer")
    shape = Shape(
        "cust_orders_shape",
        (GroupMinCount(("o_custkey",), 1, universe="cust_keys", column="o_orderkey"),),
    )
    engine = ValidationEngine(
        spark,
        dims={"cust_keys": cust.select(F.col("c_custkey").alias("o_custkey"))},
    )
    rep = engine.validate(o, [shape], key_cols=["o_orderkey", "o_custkey"])
    return rep.violations.select(
        F.col("o_custkey").alias("custkey"),
        F.element_at(F.col("context"), "actualCount").cast("int").alias("n_orders"),
    )


def q_monotonic_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordering constraint via lag() window (sh:lessThanOrEquals analog,
    SURVEY.md §2A #16): ts regressions per user in event_id order."""
    e = _load(spark, sf_dir, "events")
    shape = Shape("events_order_shape", (Monotonic(("user_id",), "event_id", "ts"),))
    v = _one_shape_violations(spark, e, shape, ["event_id", "user_id"])
    return v.select("event_id", "user_id", "violation_type")


def q_logical_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logical composition sh:or + sh:not (SURVEY.md §2A #17-#19)."""
    o = _load(spark, sf_dir, "orders")
    shape = Shape(
        "orders_logic_shape",
        (
            Or(
                (
                    Expr("o_orderstatus = 'F'"),
                    Expr("o_totalprice < 50000.0"),
                ),
                column="o_orderstatus",
            ),
            Not(Expr("o_orderpriority = '9-IMPOSSIBLE'"), column="o_orderpriority"),
        ),
    )
    v = _one_shape_violations(spark, o, shape, ["o_orderkey"])
    return v.select("o_orderkey", "constraint_component")


def q_xone_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sh:xone — exactly one of two predicates (SURVEY.md §2A #20)."""
    o = _load(spark, sf_dir, "orders")
    shape = Shape(
        "orders_xone_shape",
        (
            Xone(
                (
                    Expr("o_totalprice > 100000.0"),
                    Expr("o_orderstatus = 'O'"),
                ),
                column="o_totalprice",
            ),
        ),
    )
    v = _one_shape_violations(spark, o, shape, ["o_orderkey"])
    return v.select("o_orderkey", "constraint_component")


def q_violation_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union of per-shape plans + group-by-signature counting
    (SURVEY.md §2C union + dedup)."""
    li = _load(spark, sf_dir, "lineitem")
    shapes = [
        Shape("li_qty", (MaxInclusive("l_quantity", 30),)),
        Shape("li_disc", (MaxInclusive("l_discount", 0.08),)),
        Shape("li_tax", (MinInclusive("l_tax", 0.02),)),
    ]
    engine = ValidationEngine(spark)
    rep = engine.validate(li, shapes, key_cols=["l_orderkey", "l_linenumber"])
    return rep.counts()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: multi-shape validation summary on sf0.001."""
    return q_violation_summary(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q_range_lineitem_qty": q_range_lineitem_qty,
        "q_range_customer_acctbal": q_range_customer_acctbal,
        "q_pattern_part_name": q_pattern_part_name,
        "q_fk_orders_custkey": q_fk_orders_custkey,
        "q_unique_documents": q_unique_documents,
        "q_card_customer_orders": q_card_customer_orders,
        "q_monotonic_events": q_monotonic_events,
        "q_logical_orders": q_logical_orders,
        "q_xone_orders": q_xone_orders,
        "q_violation_summary": q_violation_summary,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "q_range_lineitem_qty": (
            "SELECT l_orderkey, l_linenumber, l_quantity AS qty, "
            "'MaxInclusiveConstraintComponent' AS constraint_component "
            "FROM lineitem WHERE l_quantity > 30"
        ),
        "q_range_customer_acctbal": (
            "SELECT c_custkey, c_acctbal AS acctbal, 'value_range' AS violation_type "
            "FROM customer WHERE c_acctbal < 0.0"
        ),
        "q_pattern_part_name": (
            "SELECT p_partkey, p_name AS pname FROM part "
            "WHERE p_name IS NOT NULL AND NOT regexp_matches(p_name, '^[a-z]+( [a-z]+)*$')"
        ),
        "q_fk_orders_custkey": (
            "SELECT o_orderkey, CAST(o_custkey AS VARCHAR) AS custkey FROM orders o "
            "WHERE o_custkey IS NOT NULL AND NOT EXISTS "
            "(SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)"
        ),
        "q_unique_documents": (
            "SELECT text AS dup_text, CAST(count(*) AS INT) AS n_dups "
            "FROM documents GROUP BY text HAVING count(*) > 1"
        ),
        "q_card_customer_orders": (
            "SELECT c_custkey AS custkey, 0 AS n_orders FROM customer c "
            "WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)"
        ),
        "q_monotonic_events": (
            "SELECT event_id, user_id, 'property_pair' AS violation_type FROM "
            "(SELECT event_id, user_id, ts, lag(ts) OVER "
            "(PARTITION BY user_id ORDER BY event_id) AS p FROM events) "
            "WHERE p IS NOT NULL AND ts IS NOT NULL AND ts < p"
        ),
        "q_logical_orders": (
            "SELECT o_orderkey, 'OrConstraintComponent' AS constraint_component "
            "FROM orders WHERE NOT (o_orderstatus = 'F' OR o_totalprice < 50000.0) "
            "UNION ALL "
            "SELECT o_orderkey, 'NotConstraintComponent' FROM orders "
            "WHERE o_orderpriority = '9-IMPOSSIBLE'"
        ),
        "q_xone_orders": (
            "SELECT o_orderkey, 'XoneConstraintComponent' AS constraint_component "
            "FROM orders WHERE (CAST(o_totalprice > 100000.0 AS INT) + "
            "CAST(o_orderstatus = 'O' AS INT)) <> 1"
        ),
        "q_violation_summary": (
            "SELECT * FROM ("
            "SELECT 'li_qty' AS shape_id, 'MaxInclusiveConstraintComponent' AS "
            "constraint_component, 'value_range' AS violation_type, "
            "count(*) AS n_violations FROM lineitem WHERE l_quantity > 30 "
            "UNION ALL SELECT 'li_disc', 'MaxInclusiveConstraintComponent', "
            "'value_range', count(*) FROM lineitem WHERE l_discount > 0.08 "
            "UNION ALL SELECT 'li_tax', 'MinInclusiveConstraintComponent', "
            "'value_range', count(*) FROM lineitem WHERE l_tax < 0.02"
            ") WHERE n_violations > 0"
        ),
    }
