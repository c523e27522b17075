"""Data-quality constraint family added in r04: MaxGap (latency bound
in the shared sequence window), FunctionalDependency (determinant ->
single dependent value), and DatasetMetric (Deequ-style assertions on
aggregates of the target population — a constraint SCOPE the
reference's per-focus-node SHACL model has no analog for)."""

import datetime as dt
import os
import sys

import pytest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from pyspark.sql import functions as F

from xpshacl_spark.compiler import ValidationEngine
from xpshacl_spark.shapes import (
    DatasetMetric,
    DenseIndex,
    FunctionalDependency,
    MaxGap,
    Monotonic,
    Shape,
    Transition,
)
from xpshacl_spark.shapes_io import shapes_from_json, shapes_to_json


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def turns(spark):
    rows = [
        # conv 1: 5s gap then a 2h gap; model flips mid-conversation
        (1, 0, dt.datetime(2026, 1, 1, 0, 0, 0), "user", "m1"),
        (1, 1, dt.datetime(2026, 1, 1, 0, 0, 5), "assistant", "m1"),
        (1, 2, dt.datetime(2026, 1, 1, 2, 0, 0), "user", "m2"),
        # conv 2: tight, single model, NULL role on first turn
        (2, 0, dt.datetime(2026, 1, 1, 0, 0, 0), None, "m3"),
        (2, 1, dt.datetime(2026, 1, 1, 0, 0, 1), "assistant", "m3"),
        # conv 3: NULL ts endpoint -> gap passes vacuously
        (3, 0, dt.datetime(2026, 1, 1, 0, 0, 0), "user", None),
        (3, 1, None, "assistant", None),
    ]
    return spark.createDataFrame(
        rows, "conv_id int, turn_idx int, ts timestamp, role string, model string"
    )


# ---------------------------------------------------------------------------
# MaxGap
# ---------------------------------------------------------------------------


def test_max_gap_flags_slow_turn_only(spark, turns):
    shape = Shape("gap", (MaxGap(("conv_id",), "turn_idx", "ts", 3600.0),))
    rep = ValidationEngine(spark).validate(
        turns, [shape], key_cols=["conv_id", "turn_idx"]
    )
    rows = rep.violations.collect()
    assert [(r["conv_id"], r["turn_idx"]) for r in rows] == [(1, 2)]
    assert float(rows[0]["context"]["delta"]) == pytest.approx(7195.0)
    assert rows[0]["violation_type"] == "sequence"


def test_max_gap_rides_the_shared_window(spark, turns):
    """Adding MaxGap to a shape set that already orders by
    (conv_id, turn_idx) must NOT add a Window or an Exchange."""
    shapes = [
        Shape("ord", (Monotonic(("conv_id",), "turn_idx", "ts"),)),
        Shape(
            "seq",
            (
                DenseIndex(("conv_id",), "turn_idx", "turn_idx"),
                Transition(
                    ("conv_id",),
                    "turn_idx",
                    "role",
                    allowed_prev=(("assistant", ("user", "system", "tool")),),
                ),
                MaxGap(("conv_id",), "turn_idx", "ts", 3600.0),
            ),
        ),
    ]
    rep = ValidationEngine(spark).validate(
        turns, shapes, key_cols=["conv_id", "turn_idx"]
    )
    assert rep.metrics["n_plan_parts"] == 1
    plan = _plan(rep.violations)
    assert plan.count("Window") == 1
    assert plan.count("Exchange") == 1


# ---------------------------------------------------------------------------
# FunctionalDependency
# ---------------------------------------------------------------------------


def test_fd_flags_conflicting_group(spark, turns):
    shape = Shape("fd", (FunctionalDependency(("conv_id",), "model"),))
    rep = ValidationEngine(spark).validate(
        turns, [shape], key_cols=["conv_id", "turn_idx"]
    )
    rows = rep.violations.collect()
    assert [(r["conv_id"], r["turn_idx"]) for r in rows] == [(1, None)]
    assert rows[0]["context"] == {
        "dependent": "model", "nDistinct": "2", "det:conv_id": "1",
    }
    assert rows[0]["violation_type"] == "dependency"


def test_fd_null_dependents_never_conflict(spark, turns):
    # conv 3 has only NULL models: zero distinct non-null values -> pass
    shape = Shape(
        "fd", (FunctionalDependency(("conv_id",), "model"),), target="conv_id = 3"
    )
    rep = ValidationEngine(spark).validate(
        turns, [shape], key_cols=["conv_id", "turn_idx"]
    )
    assert rep.violations.count() == 0


def test_fds_sharing_determinant_fuse_into_one_agg(spark, turns):
    shapes = [
        Shape(
            "fd2",
            (
                FunctionalDependency(("conv_id",), "model"),
                FunctionalDependency(("conv_id",), "role"),
            ),
        )
    ]
    rep = ValidationEngine(spark).validate(
        turns, shapes, key_cols=["conv_id", "turn_idx"]
    )
    assert rep.metrics["n_plan_parts"] == 1
    # role varies in convs 1 and 3; conv 2's NULL role is ignored so its
    # single non-null value passes; model conflicts only in conv 1
    got = sorted(
        (r["conv_id"], r["context"]["dependent"])
        for r in rep.violations.collect()
    )
    assert got == [(1, "model"), (1, "role"), (3, "role")]


# ---------------------------------------------------------------------------
# DatasetMetric
# ---------------------------------------------------------------------------


def test_dataset_metrics_mixed_pass_fail(spark, turns):
    shape = Shape(
        "ds",
        (
            DatasetMetric("completeness", "role", min_value=0.99),  # 6/7 fails
            DatasetMetric("row_count", min_value=1),  # passes
            DatasetMetric("mean", "turn_idx", min_value=0.0, max_value=2.0),  # passes
            DatasetMetric("distinctness", "model", max_value=0.2),  # 3/5 fails
        ),
    )
    rep = ValidationEngine(spark).validate(
        turns, [shape], key_cols=["conv_id", "turn_idx"]
    )
    rows = {r["context"]["metric"]: r for r in rep.violations.collect()}
    assert set(rows) == {"completeness", "distinctness"}
    assert float(rows["completeness"]["context"]["observed"]) == pytest.approx(6 / 7)
    assert float(rows["distinctness"]["context"]["observed"]) == pytest.approx(3 / 5)
    assert all(r["conv_id"] is None and r["turn_idx"] is None for r in rows.values())
    assert all(r["violation_type"] == "dataset" for r in rows.values())


def test_dataset_metric_target_and_where_refine_population(spark, turns):
    # completeness of ts among conv 3 rows = 1/2 -> fails the bound;
    # the same metric over the whole table (6/7) would pass it
    shape = Shape(
        "ds",
        (DatasetMetric("completeness", "ts", min_value=0.6),),
        target="conv_id = 3",
    )
    rep = ValidationEngine(spark).validate(
        turns, [shape], key_cols=["conv_id", "turn_idx"]
    )
    rows = rep.violations.collect()
    assert len(rows) == 1
    assert float(rows[0]["context"]["observed"]) == pytest.approx(0.5)


def test_dataset_metric_empty_population_violates(spark, turns):
    shape = Shape(
        "ds",
        (DatasetMetric("mean", "turn_idx", min_value=0.0),),
        target="conv_id = 999",
    )
    rep = ValidationEngine(spark).validate(
        turns, [shape], key_cols=["conv_id", "turn_idx"]
    )
    rows = rep.violations.collect()
    assert len(rows) == 1 and rows[0]["value"] is None


def test_dataset_metric_validation_errors(spark, turns):
    eng = ValidationEngine(spark)
    with pytest.raises(ValueError, match="asserts nothing"):
        eng.validate(
            turns,
            [Shape("x", (DatasetMetric("mean", "turn_idx"),))],
            key_cols=["conv_id"],
        )
    with pytest.raises(ValueError, match="unknown dataset metric"):
        eng.validate(
            turns,
            [Shape("x", (DatasetMetric("median", "turn_idx", min_value=0),))],
            key_cols=["conv_id"],
        )
    with pytest.raises(ValueError, match="requires a column"):
        eng.validate(
            turns,
            [Shape("x", (DatasetMetric("mean", min_value=0),))],
            key_cols=["conv_id"],
        )


def test_dataset_metrics_fuse_into_one_aggregate(spark, turns):
    """All dataset metrics across all shapes (including differing
    targets) must compile into ONE global aggregation — the executed
    plan of the metrics fragment carries exactly one HashAggregate
    pair (partial + final) and no join."""
    shapes = [
        Shape("a", (DatasetMetric("completeness", "role", min_value=2.0),)),
        Shape(
            "b",
            (DatasetMetric("mean", "turn_idx", max_value=-1.0),),
            target="conv_id = 1",
        ),
    ]
    rep = ValidationEngine(spark).validate(
        turns, shapes, key_cols=["conv_id", "turn_idx"]
    )
    assert rep.metrics["n_plan_parts"] == 1
    assert rep.violations.count() == 2  # both impossible bounds violate
    plan = _plan(rep.violations)
    assert "Join" not in plan


# ---------------------------------------------------------------------------
# per-group conformance rollup
# ---------------------------------------------------------------------------


def test_conformance_by_group(spark, turns):
    shapes = [
        Shape("gap", (MaxGap(("conv_id",), "turn_idx", "ts", 3600.0),)),
        Shape("fd", (FunctionalDependency(("conv_id",), "model"),)),
        # dataset-scope row has NULL keys -> must be excluded from the rollup
        Shape("ds", (DatasetMetric("completeness", "role", min_value=2.0),)),
    ]
    rep = ValidationEngine(spark).validate(
        turns, shapes, key_cols=["conv_id", "turn_idx"]
    )
    got = {
        r["conv_id"]: (r["n_violations"], r["n_components"], r["conforms"])
        for r in rep.conformance_by_group(turns, ["conv_id"]).collect()
    }
    # conv 1: one gap violation + one FD violation; convs 2 and 3 clean —
    # and PRESENT (the universe join proves clean groups clean)
    assert got == {1: (2, 2, False), 2: (0, 0, True), 3: (0, 0, True)}


# ---------------------------------------------------------------------------
# JSON round-trip
# ---------------------------------------------------------------------------


def test_new_kinds_json_roundtrip():
    shapes = [
        Shape(
            "rt",
            (
                MaxGap(("conv_id",), "turn_idx", "ts", 120.5),
                FunctionalDependency(("conv_id", "turn_idx"), "model"),
                DatasetMetric(
                    "completeness", "tool", min_value=0.9, where="role = 'tool'"
                ),
            ),
        )
    ]
    back = shapes_from_json(shapes_to_json(shapes))
    assert back == shapes


def test_suite_optional_latency_shape(spark):
    """transcript_shapes(max_gap_seconds=...) appends LatencyShape; the
    default suite is unchanged; and the added check rides the suite's
    existing (conv_id, turn_idx) window (no extra Window/Exchange)."""
    from xpshacl_spark.datagen import roles_dim, tools_dim, transcripts
    from xpshacl_spark.suites import transcript_shapes

    base = transcript_shapes()
    with_gap = transcript_shapes(max_gap_seconds=3600.0)
    assert len(with_gap) == len(base) + 1
    assert with_gap[-1].name == "LatencyShape"

    df = transcripts(spark, n_convs=40)
    eng = ValidationEngine(
        spark, dims={"roles": roles_dim(spark), "tools": tools_dim(spark)}
    )

    def _counts(shapes):
        plan = eng.validate(
            df, shapes, key_cols=["conv_id", "turn_idx"]
        ).violations._jdf.queryExecution().executedPlan().toString()
        return plan.count("Window"), plan.count("Exchange")

    assert _counts(with_gap) == _counts(base)


def test_transition_null_predecessor_is_not_an_opener(spark):
    """A mid-sequence row whose PREDECESSOR value is NULL must not be
    treated as the group opener: only row 1 is checked against
    `initial`, a NULL opener passes vacuously, and the pair rule stays
    vacuous across a NULL predecessor."""
    rows = [
        ("c1", 0, None),          # NULL opener: passes vacuously
        ("c1", 1, "assistant"),   # after NULL: NOT an opener, no pair check
        ("c2", 0, "assistant"),   # real opener violating initial
        ("c2", 1, "user"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string")
    shape = Shape(
        "grammar",
        (
            Transition(
                ("conv_id",),
                "turn_idx",
                "role",
                allowed_prev=(("assistant", ("user", "tool")),),
                initial=("user", "system"),
            ),
        ),
    )
    rep = ValidationEngine(spark).validate(
        df, [shape], key_cols=["conv_id", "turn_idx"]
    )
    v = {(r.conv_id, r.turn_idx) for r in rep.violations.collect()}
    assert v == {("c2", 0)}


def test_dense_index_repeat_of_start_after_null_violates(spark):
    """After a NULL index the sequence is broken: the successor
    violates even when its value coincidentally equals `start` (the
    old lag-IS-NULL form re-opened the sequence and passed it)."""
    rows = [("c1", 0, 0), ("c1", 1, None), ("c1", 2, 0)]
    df = spark.createDataFrame(
        rows, "conv_id string, ord int, turn_idx int"
    )
    shape = Shape(
        "dense", (DenseIndex(("conv_id",), "ord", "turn_idx", start=0),)
    )
    rep = ValidationEngine(spark).validate(df, [shape], key_cols=["conv_id", "ord"])
    v = {r.ord for r in rep.violations.collect()}
    assert v == {1, 2}  # the NULL itself and its successor


def test_fd_context_carries_determinant_values(spark):
    """When the FD determinant is not among key_cols, the violating
    determinant VALUES must survive in context (the aligned keys are
    NULL, so without them distinct violating groups are
    indistinguishable)."""
    rows = [
        ("k1", 1, "cust_a", "east"), ("k2", 2, "cust_a", "west"),
        ("k3", 3, "cust_b", "east"), ("k4", 4, "cust_b", "east"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, customer string, region string"
    )
    shape = Shape(
        "fd", (FunctionalDependency(("customer",), "region"),)
    )
    rep = ValidationEngine(spark).validate(
        df, [shape], key_cols=["conv_id", "turn_idx"]
    )
    v = rep.violations.collect()
    assert len(v) == 1
    ctx = dict(v[0].context)
    assert ctx["det:customer"] == "cust_a"
    assert ctx["nDistinct"] == "2"
