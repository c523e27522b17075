"""Physical-schema validation (schema_check.py): metadata-only
expected-vs-actual column/type comparison and its violation-report
adapter."""

import os
import sys

import pytest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from xpshacl_spark.schema_check import (
    ColumnSpec,
    schema_violation_report,
    schema_violations,
)


def _df(spark):
    return spark.createDataFrame(
        [(1, "a", 2.0)], "id bigint, name string, score double"
    )


def test_conforming_schema_is_empty(spark):
    out = schema_violations(
        spark,
        _df(spark),
        [
            ColumnSpec("id", "bigint"),
            ColumnSpec("name", "string"),
            ColumnSpec("score", "double"),
        ],
    )
    assert out.columns == ["column_name", "issue", "expected_type", "actual_type"]
    assert out.count() == 0


def test_missing_mismatch_unexpected(spark):
    rows = schema_violations(
        spark,
        _df(spark),
        [
            ColumnSpec("id", "int"),        # mismatch: actual bigint
            ColumnSpec("name", "string"),   # ok
            ColumnSpec("created", "timestamp"),  # missing
        ],
    ).collect()
    got = {(r.column_name, r.issue, r.expected_type, r.actual_type) for r in rows}
    assert got == {
        ("created", "missing_column", "timestamp", None),
        ("id", "type_mismatch", "int", "bigint"),
        ("score", "unexpected_column", None, "double"),
    }


def test_allow_extra_and_optional(spark):
    # open shape: extras tolerated; optional column absent -> no issue,
    # but its TYPE is still checked when present
    out = schema_violations(
        spark,
        _df(spark),
        [
            ColumnSpec("id", "bigint"),
            ColumnSpec("created", "timestamp", required=False),
            ColumnSpec("score", "string", required=False),  # present, wrong type
        ],
        allow_extra=True,
    ).collect()
    assert [(r.column_name, r.issue) for r in out] == [("score", "type_mismatch")]


def test_complex_types_and_zero_scan(spark):
    df = spark.createDataFrame(
        [(1, [1.0])], "vec_id bigint, embedding array<float>"
    ).selectExpr("vec_id", "cast(embedding as array<float>) as embedding")
    out = schema_violations(
        spark, df, [ColumnSpec("vec_id", "bigint"),
                    ColumnSpec("embedding", "array<float>")]
    )
    assert out.count() == 0
    # metadata-only: the result plan must not reference the input table
    # at all (no scan/project of df — just the local result rows)
    plan = out._jdf.queryExecution().logical().toString()
    assert "embedding" not in plan


def test_duplicate_spec_raises(spark):
    with pytest.raises(ValueError, match="duplicate"):
        schema_violations(
            spark, _df(spark),
            [ColumnSpec("id", "bigint"), ColumnSpec("id", "int")],
        )


def test_violation_report_shape(spark):
    rep = schema_violation_report(
        spark,
        _df(spark),
        [ColumnSpec("id", "int"), ColumnSpec("name", "string"),
         ColumnSpec("score", "double")],
        shape_id="doc_schema",
    ).collect()
    (r,) = rep
    assert r.focus_node == "id" and r.shape_id == "doc_schema"
    assert r.constraint_component == "SchemaConstraintComponent"
    assert r.violation_type == "type_mismatch"
    assert r.value == "bigint"
    assert "expected int" in r.message and "actual bigint" in r.message
    assert r.severity == "Violation"
