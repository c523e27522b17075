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
    # taxonomy-consistent: classify() value, not the raw issue string
    from xpshacl_spark.model import classify

    assert r.violation_type == classify("SchemaConstraintComponent") == "schema"
    assert r.value == "bigint"
    assert "expected int" in r.message and "actual bigint" in r.message
    assert r.severity == "Violation"
    assert dict(r.context) == {
        "issue": "type_mismatch",
        "expectedType": "int",
        "actualType": "bigint",
    }


def test_report_has_canonical_columns_and_feeds_signatures(spark):
    """The report adapter must carry every model.VIOLATION_COLUMNS
    field (notably context) so it flows through the explanation
    pipeline's signature dedup like any other violations relation."""
    from xpshacl_spark.explain.signature import signature_id_col
    from xpshacl_spark.model import VIOLATION_COLUMNS

    rep = schema_violation_report(
        spark, _df(spark), [ColumnSpec("id", "int")], allow_extra=True
    )
    for c in VIOLATION_COLUMNS:
        assert c in rep.columns, c
    sigs = rep.select(signature_id_col().alias("sig")).collect()
    assert len(sigs) == 1 and len(sigs[0].sig) == 32


def test_case_insensitive_matching_follows_session_conf(spark):
    """Under the spark.sql.caseSensitive=false default, a spec matches
    a differently-cased actual column (no false missing/unexpected
    pair); the type is still checked."""
    df = spark.createDataFrame([(1,)], "ID bigint")
    ok = schema_violations(spark, df, [ColumnSpec("id", "bigint")])
    assert ok.count() == 0
    bad = schema_violations(spark, df, [ColumnSpec("id", "int")]).collect()
    assert [(r.issue, r.actual_type) for r in bad] == [("type_mismatch", "bigint")]
    saved = spark.conf.get("spark.sql.caseSensitive", "false")
    try:
        spark.conf.set("spark.sql.caseSensitive", "true")
        strict = schema_violations(spark, df, [ColumnSpec("id", "bigint")])
        assert {r.issue for r in strict.collect()} == {
            "missing_column", "unexpected_column",
        }
    finally:
        spark.conf.set("spark.sql.caseSensitive", saved)


def test_duplicate_actual_columns_each_checked(spark):
    """Duplicate column names (legal post-join) must each be checked —
    a type conflict between duplicates is reported, not silently
    overwritten."""
    a = spark.createDataFrame([(1, 2)], "id bigint, x int")
    b = spark.createDataFrame([(1.0, 2)], "id double, y int")
    j = a.crossJoin(b)  # two 'id' columns: bigint and double
    rows = schema_violations(
        spark, j,
        [ColumnSpec("id", "bigint"), ColumnSpec("x", "int"),
         ColumnSpec("y", "int")],
    ).collect()
    assert [(r.column_name, r.issue, r.actual_type) for r in rows] == [
        ("id", "type_mismatch", "double")
    ]
