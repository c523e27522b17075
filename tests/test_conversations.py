"""Conversation assembly: ordered transcript rebuild, duration, and
conversation-level dedup semantics + plan shape."""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import datetime

from xpshacl_spark.operators.conversations import (
    assemble_conversations,
    conversation_duplicates,
)


def _ts(s):
    return datetime.datetime(2024, 1, 1, 0, 0, s)


def test_assembly_restores_turn_order_and_duration(spark):
    """Turns arrive shuffled; the transcript must come out in
    (turn_idx) order, NULL text renders empty, duration is the exact
    microsecond span."""
    rows = [
        ("c1", 2, "assistant", "hi there", _ts(20)),
        ("c1", 1, "user", "hello", _ts(10)),
        ("c1", 3, "user", None, _ts(35)),
        ("c2", 1, "user", "solo", _ts(5)),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, ts timestamp"
    )
    out = {
        r.conv_id: r
        for r in assemble_conversations(
            df, ["conv_id"], ["turn_idx"], "role", "text", ts_col="ts"
        ).collect()
    }
    assert out["c1"].transcript == "user: hello\nassistant: hi there\nuser: "
    assert out["c1"].n_turns == 3
    assert out["c1"].duration_us == 25_000_000
    assert out["c2"].n_turns == 1 and out["c2"].duration_us == 0


def test_conversation_duplicates_survivor_rule(spark):
    """Identical transcripts (same turns, same order) group together;
    the min conv key survives; a reordered transcript is NOT a dup."""
    rows = [
        ("a", 1, "u", "x"), ("a", 2, "v", "y"),
        ("b", 1, "u", "x"), ("b", 2, "v", "y"),   # dup of a
        ("c", 1, "v", "y"), ("c", 2, "u", "x"),   # same turns, other order
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    conv = assemble_conversations(df, ["conv_id"], ["turn_idx"], "role", "text")
    out = {
        r.conv_id: (r.n_same_transcript, r.keep)
        for r in conversation_duplicates(conv, ["conv_id"]).collect()
    }
    assert out == {"a": (2, True), "b": (2, False), "c": (1, True)}


def test_assembly_plan_one_agg_no_window(spark):
    """Assembly must be ONE grouped aggregation — no window (which
    would sort the full turn relation) and no join."""
    df = spark.createDataFrame(
        [("a", 1, "u", "x")], "conv_id string, turn_idx int, role string, text string"
    )
    plan = (
        assemble_conversations(df, ["conv_id"], ["turn_idx"], "role", "text")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan, plan
    assert "Join" not in plan, plan


def test_duplicates_single_assembly_pass(spark):
    """conversation_duplicates must NOT re-assemble: exactly one
    collect_list aggregation (partial+final) in the whole plan — the
    md5 grouping is a window over the conversation-level relation."""
    df = spark.createDataFrame(
        [("a", 1, "u", "x"), ("b", 1, "u", "x")],
        "conv_id string, turn_idx int, role string, text string",
    )
    conv = assemble_conversations(df, ["conv_id"], ["turn_idx"], "role", "text")
    plan = (
        conversation_duplicates(conv, ["conv_id"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("collect_list") <= 2, plan  # one partial + one final
    assert "Join" not in plan, plan


def test_null_order_cols_sort_last_matching_sql(spark):
    """NULL order-col values must sort LAST (SQL NULLS LAST), not first
    as bare Spark struct ordering would — otherwise the same data
    renders two different transcripts/md5s across engines."""
    rows = [
        ("c1", None, "system", "late-null"),
        ("c1", 1, "user", "first"),
        ("c1", 2, "assistant", "second"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    out = assemble_conversations(
        df, ["conv_id"], ["turn_idx"], "role", "text"
    ).collect()[0]
    assert out.transcript == "user: first\nassistant: second\nsystem: late-null"
    # cross-engine check: DuckDB's default ORDER BY (NULLS LAST) over
    # the same rows renders the identical transcript
    import duckdb

    sql = (
        "SELECT string_agg(role || ': ' || text, chr(10) ORDER BY turn_idx) "
        "FROM (VALUES ('c1', NULL, 'system', 'late-null'),"
        "('c1', 1, 'user', 'first'),('c1', 2, 'assistant', 'second'))"
        " t(conv_id, turn_idx, role, text) GROUP BY conv_id"
    )
    assert duckdb.sql(sql).fetchone()[0] == out.transcript
