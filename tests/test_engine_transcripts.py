"""End-to-end: deterministic transcript generation -> engine validation
-> per-rule violation counts checked against an independent DuckDB
oracle over the very same parquet (the reference's count-parity idea,
/root/reference/data/shark_tests.py:116-141, made exact)."""

import duckdb
import pytest

from xpshacl_spark.compiler import ValidationEngine
from xpshacl_spark.datagen import ROLES, TOOLS, roles_dim, tools_dim, transcripts
from xpshacl_spark.suites import transcript_shapes

N_CONVS = 300


@pytest.fixture(scope="module")
def tdata(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("transcripts") / "t.parquet")
    df = transcripts(spark, n_convs=N_CONVS, seed=42)
    df.write.mode("overwrite").parquet(path)
    return path


@pytest.fixture(scope="module")
def report(spark, tdata):
    df = spark.read.parquet(tdata)
    engine = ValidationEngine(
        spark, dims={"roles": roles_dim(spark), "tools": tools_dim(spark)}
    )
    return engine.validate(df, transcript_shapes(), key_cols=["conv_id", "turn_idx"])


@pytest.fixture(scope="module")
def counts(report):
    rows = report.counts().collect()
    return {
        (r["shape_id"].split("#")[-1], r["constraint_component"]): r["n_violations"]
        for r in rows
    }


def _duck(tdata, sql, **kw):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM read_parquet('{tdata}/*.parquet')")
    return con.execute(sql).fetchone()[0]


def test_range_violations(tdata, counts):
    exp = _duck(tdata, "SELECT count(*) FROM t WHERE turn_idx < 0")
    assert exp > 0
    assert counts[("TurnRowShape", "MinInclusiveConstraintComponent")] == exp


def test_datatype_ts_violations(tdata, counts):
    exp = _duck(tdata, "SELECT count(*) FROM t WHERE ts IS NULL")
    assert exp > 0
    assert counts[("TurnRowShape", "DatatypeConstraintComponent")] == exp


def test_pattern_violations(tdata, counts):
    exp = _duck(
        tdata,
        "SELECT count(*) FROM t WHERE role IS NOT NULL AND NOT regexp_matches(role, '^[a-z]+$')",
    )
    assert exp > 0
    assert counts[("TurnRowShape", "PatternConstraintComponent")] == exp


def test_maxlength_violations(tdata, counts):
    exp = _duck(tdata, "SELECT count(*) FROM t WHERE length(text) > 4000")
    assert exp > 0
    assert counts[("TurnRowShape", "MaxLengthConstraintComponent")] == exp


def test_notnull_text_violations(tdata, counts):
    exp = _duck(tdata, "SELECT count(*) FROM t WHERE text IS NULL")
    assert exp > 0
    assert counts[("TurnRowShape", "MinCountConstraintComponent")] == exp


def test_fk_tool_violations(tdata, counts):
    tools = ", ".join(f"'{x}'" for x in TOOLS)
    exp = _duck(
        tdata,
        f"SELECT count(*) FROM t WHERE tool IS NOT NULL AND tool NOT IN ({tools})",
    )
    assert exp > 0
    assert counts[("ToolRefShape", "ClassConstraintComponent")] == exp


def test_fk_role_violations(tdata, counts):
    roles = ", ".join(f"'{x}'" for x in ROLES)
    exp = _duck(
        tdata,
        f"SELECT count(*) FROM t WHERE role IS NOT NULL AND role NOT IN ({roles})",
    )
    assert exp > 0
    assert counts[("RoleRefShape", "ClassConstraintComponent")] == exp


def test_unique_violations(tdata, counts):
    exp = _duck(
        tdata,
        "SELECT count(*) FROM (SELECT conv_id, turn_idx FROM t "
        "GROUP BY 1, 2 HAVING count(*) > 1)",
    )
    assert exp > 0
    assert counts[("TurnKeyShape", "UniquenessConstraintComponent")] == exp


def test_monotonic_violations(tdata, counts):
    exp = _duck(
        tdata,
        "SELECT count(*) FROM (SELECT ts, lag(ts) OVER "
        "(PARTITION BY conv_id ORDER BY turn_idx) AS p FROM t) "
        "WHERE p IS NOT NULL AND ts IS NOT NULL AND ts < p",
    )
    assert exp > 0
    assert (
        counts[("TsOrderShape", "LessThanOrEqualsConstraintComponent")] == exp
    )


def test_dense_index_violations(tdata, counts):
    # density: wrong first index, gaps (negative-corrupted rows vacate
    # their slot), and repeats (injected duplicate turns) all violate
    exp = _duck(
        tdata,
        "SELECT count(*) FROM (SELECT turn_idx, lag(turn_idx) OVER "
        "(PARTITION BY conv_id ORDER BY turn_idx) AS p FROM t) "
        "WHERE (p IS NULL AND turn_idx <> 0) "
        "OR (p IS NOT NULL AND turn_idx <> p + 1)",
    )
    assert exp > 0
    assert counts[("TurnSeqShape", "DenseIndexConstraintComponent")] == exp


def test_transition_violations(tdata, counts):
    # role grammar: assistant may only follow user/system/tool (the
    # uppercase-corrupted roles break this), and the opening turn must
    # be a lowercase non-assistant role
    exp = _duck(
        tdata,
        "SELECT count(*) FROM (SELECT role, lag(role) OVER "
        "(PARTITION BY conv_id ORDER BY turn_idx) AS p FROM t) "
        "WHERE (p IS NOT NULL AND role = 'assistant' "
        "AND p NOT IN ('user', 'system', 'tool')) "
        "OR (p IS NULL AND role IS NOT NULL "
        "AND role NOT IN ('user', 'system', 'tool'))",
    )
    assert exp > 0
    assert counts[("TurnSeqShape", "TransitionConstraintComponent")] == exp


def test_cardinality_violations(tdata, counts):
    exp = _duck(
        tdata,
        "SELECT count(*) FROM (SELECT conv_id FROM t GROUP BY conv_id "
        "HAVING count(*) FILTER (WHERE role = 'assistant') = 0)",
    )
    assert exp > 0
    assert (
        counts[("AssistantCardShape", "MinCountConstraintComponent")] == exp
    )


def test_clean_data_conforms(spark):
    df = transcripts(spark, n_convs=50, seed=42, inject=False)
    engine = ValidationEngine(
        spark, dims={"roles": roles_dim(spark), "tools": tools_dim(spark)}
    )
    rep = engine.validate(df, transcript_shapes(), key_cols=["conv_id", "turn_idx"])
    assert rep.conforms


def test_violation_schema(report):
    cols = report.violations.columns
    assert cols == [
        "conv_id",
        "turn_idx",
        "focus_node",
        "shape_id",
        "constraint_component",
        "violation_type",
        "property_path",
        "value",
        "message",
        "severity",
        "context",
    ]


def test_deterministic_generation(spark):
    a = transcripts(spark, n_convs=40, seed=7).orderBy("conv_id", "turn_idx", "role").collect()
    b = transcripts(spark, n_convs=40, seed=7).orderBy("conv_id", "turn_idx", "role").collect()
    assert a == b
