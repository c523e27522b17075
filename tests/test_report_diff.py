"""Cross-run violation diff (report_diff.py) + BPE merge candidates."""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from pyspark.sql import functions as F

from xpshacl_spark.compiler import ValidationEngine
from xpshacl_spark.report_diff import diff_counts, violation_diff
from xpshacl_spark.shapes import MaxInclusive, Shape


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_violation_diff_new_resolved_unchanged(spark):
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 50).cast("double").alias("v")
    )
    engine = ValidationEngine(spark)
    # prev: v<=45 (violations: v in 46..49 -> ids with id%50 in 46..49)
    # cur:  v<=40 (violations: v in 41..49) -> new = 41..45, rest unchanged
    prev = engine.validate(
        df, [Shape("s", (MaxInclusive("v", 45.0),))], key_cols=["k"]
    ).violations
    cur = engine.validate(
        df, [Shape("s", (MaxInclusive("v", 40.0),))], key_cols=["k"]
    ).violations
    out = violation_diff(cur, prev, key_cols=["k"]).collect()
    by_status = {}
    for r in out:
        by_status.setdefault(r.status, set()).add(r.k)
    assert set(by_status) == {"new"}  # nothing resolved, unchanged absent
    assert by_status["new"] == {
        i for i in range(100) if 41 <= i % 50 <= 45
    }
    # every row carries the identity columns
    assert out[0].shape_id == "s"
    assert out[0].constraint_component == "MaxInclusiveConstraintComponent"


def test_violation_diff_resolved_and_counts(spark):
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "shape_id string, constraint_component string, k bigint"
    )
    prev = mk([("s1", "C", 1), ("s1", "C", 2), ("s2", "C", 1)])
    cur = mk([("s1", "C", 2), ("s1", "C", 3)])
    d = violation_diff(cur, prev, key_cols=["k"])
    got = {(r.shape_id, r.k, r.status) for r in d.collect()}
    assert got == {
        ("s1", 1, "resolved"),
        ("s2", 1, "resolved"),
        ("s1", 3, "new"),
    }
    counts = {
        r.shape_id: (r.n_new, r.n_resolved) for r in diff_counts(d).collect()
    }
    assert counts == {"s1": (1, 1), "s2": (0, 1)}
    # set semantics: duplicate identity rows collapse
    dup = mk([("s1", "C", 9), ("s1", "C", 9)])
    d2 = violation_diff(dup, mk([]), key_cols=["k"])
    assert d2.count() == 1


def test_violation_diff_is_single_exchange_agg(spark):
    """r06 plan shape: the diff is a union + ONE hash aggregation on
    the identity columns (replacing two dropDuplicates exchanges + a
    full-outer join) — no join operator of any kind, exactly one
    exchange, and never a cartesian."""
    mk = lambda n: spark.range(n).select(  # noqa: E731
        F.lit("s").alias("shape_id"),
        F.lit("C").alias("constraint_component"),
        F.col("id").alias("k"),
    )
    plan = _plan(violation_diff(mk(100), mk(80), key_cols=["k"]))
    assert "Join" not in plan
    assert plan.count("Exchange") == 1
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bpe_merge_candidates_exact(spark):
    from xpshacl_spark.operators.text import bpe_merge_candidates

    df = spark.createDataFrame(
        [("abab ab",), ("Ab! cd",), ("x",)], "text string"
    )
    # normalized tokens: [abab, ab], [ab, cd], [x -> dropped (len 1)]
    # pairs: abab -> ab, ba, ab; ab -> ab; ab -> ab; cd -> cd
    out = [(r.pair, r.n_pairs) for r in bpe_merge_candidates(df).collect()]
    assert out == [("ab", 4), ("ba", 1), ("cd", 1)]  # ties: pair asc


def test_bpe_merge_candidates_topk_is_distributed(spark):
    from xpshacl_spark.operators.text import bpe_merge_candidates

    df = spark.range(200).select(
        F.concat(F.lit("word"), F.col("id")).alias("text")
    )
    plan = _plan(bpe_merge_candidates(df, k=5))
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan  # no global rank window
