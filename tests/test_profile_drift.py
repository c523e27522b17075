"""Fused profiler + KS/PSI drift statistics + Drift constraint e2e."""

import pytest
from pyspark.sql import functions as F

from xpshacl_spark.compiler import ValidationEngine
from xpshacl_spark.operators.drift import ks_statistic, psi_statistic
from xpshacl_spark.operators.profile import HistSpec, ProfileSpec, profile
from xpshacl_spark.shapes import Drift, Shape


def test_profile_single_pass_stats(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c"), (None, "d"), (10, "e")],
        "x int, s string",
    )
    prof = profile(
        df,
        [
            ProfileSpec("x", hist=HistSpec(0.0, 10.0, 5)),
            ProfileSpec("s"),
            ProfileSpec("xlen", expression="x * 2"),
        ],
    )
    px = prof["x"]
    assert px["count"] == 5
    assert px["non_null"] == 4
    assert px["nulls"] == 1
    assert px["min"] == "1"
    assert px["max"] == "10"
    # bins of width 2 over [0,10): 1->b0, 2->b1, 3->b1, 10->overflow
    assert px["hist"] == [0, 1, 2, 0, 0, 0, 1]
    ps = prof["s"]
    assert ps["nulls"] == 1 and ps["min"] == "a" and ps["max"] == "e"
    assert prof["xlen"]["max"] == "20"


def test_profile_distinct_hll(spark):
    df = spark.range(10000).select((F.col("id") % 100).alias("k"))
    prof = profile(df, [ProfileSpec("k", rsd=0.02)])
    assert abs(prof["k"]["approx_distinct"] - 100) <= 5


def test_ks_psi_identical_is_zero():
    h = [10, 20, 30, 20, 10]
    assert ks_statistic(h, h) == 0.0
    assert psi_statistic(h, h) == pytest.approx(0.0, abs=1e-9)


def test_ks_disjoint_is_one():
    assert ks_statistic([100, 0, 0, 0], [0, 0, 0, 100]) == pytest.approx(1.0)


def test_psi_shift_detects():
    base = [100, 100, 100, 0, 0]
    cur = [0, 0, 100, 100, 100]
    assert psi_statistic(base, cur) > 0.5
    near = [95, 105, 100, 0, 0]
    assert psi_statistic(base, near) < 0.05


def test_drift_constraint_end_to_end(spark):
    base_df = spark.range(5000).select((F.col("id") % 1000).alias("v"))
    cur_df = spark.range(5000).select((F.col("id") % 1000 + 500).alias("v"))

    # build the baseline histogram with the profiler (same binning)
    from xpshacl_spark.operators.profile import profile as prof_fn

    spec = ProfileSpec("v", hist=HistSpec(0.0, 2000.0, 32))
    base_hist = prof_fn(base_df, [spec])["v"]["hist"]

    engine = ValidationEngine(spark)
    shape_drift = Shape(
        "drift_shape",
        (
            Drift(
                "v",
                lo=0.0,
                hi=2000.0,
                bins=32,
                stat="psi",
                threshold=0.2,
                baseline=tuple(base_hist),
            ),
        ),
    )
    # shifted data violates
    rep = engine.validate(cur_df.withColumn("id2", F.col("v")), [shape_drift], ["id2"])
    rows = rep.violations.collect()
    assert len(rows) == 1
    assert rows[0]["constraint_component"] == "DistributionConstraintComponent"
    assert rows[0]["violation_type"] == "distribution"
    assert float(rows[0]["value"]) > 0.2

    # same-distribution data conforms
    rep2 = engine.validate(
        base_df.withColumn("id2", F.col("v")), [shape_drift], ["id2"]
    )
    assert rep2.conforms


def test_drift_ks_variant(spark):
    base_df = spark.range(4000).select((F.col("id") % 100).alias("v"))
    cur_df = spark.range(4000).select((F.col("id") % 100 + 50).alias("v"))
    spec = ProfileSpec("v", hist=HistSpec(0.0, 200.0, 20))
    base_hist = profile(base_df, [spec])["v"]["hist"]
    shape = Shape(
        "ks_shape",
        (
            Drift(
                "v",
                lo=0.0,
                hi=200.0,
                bins=20,
                stat="ks",
                threshold=0.1,
                baseline=tuple(base_hist),
            ),
        ),
    )
    engine = ValidationEngine(spark)
    rep = engine.validate(cur_df.withColumn("k", F.col("v")), [shape], ["k"])
    assert rep.violations.count() == 1


def test_approx_quantiles_relation_shape_and_bound(spark):
    """approx_quantiles_relation matches quantiles_relation's relation
    shape, its values are actual data values within the sketch's rank
    bound, and the error-bound variant keeps the r6 shape: the exact
    side is the distributed histogram rank selection (never Spark's
    raw-row exact `percentile` buffer, and no single-task per-column
    pandas stage), while the approx sketch rides the same fused
    bounds agg."""
    from xpshacl_spark.operators.profile import (
        approx_quantiles_relation,
        quantiles_error_bound_relation,
        quantiles_relation,
    )

    df = spark.range(10_000).select(
        F.col("id").cast("double").alias("x"),
        (F.col("id") * 2).cast("double").alias("y"),
    )
    approx = approx_quantiles_relation(df, ["x", "y"], (0.25, 0.5, 0.75))
    exact = quantiles_relation(df, ["x", "y"], (0.25, 0.5, 0.75))
    assert approx.columns == exact.columns
    a = {(r["column"], r.q): r.quantile for r in approx.collect()}
    e = {(r["column"], r.q): r.quantile for r in exact.collect()}
    for k in e:
        # rank error 1e-4 over 10k uniform rows => value error ~ O(1)
        assert abs(a[k] - e[k]) <= (4 if k[0] == "x" else 8)

    checked = quantiles_error_bound_relation(df, ["x", "y"], (0.25, 0.5, 0.75))
    rows = checked.collect()
    assert len(rows) == 6
    assert all(r.within_bound for r in rows)
    assert {(r["column"], r.q): r.exact_q for r in rows} == e
    plan = checked._jdf.queryExecution().executedPlan().toString()
    # the returned relation is assembled from the distributed rank
    # selection: no raw-row exact percentile aggregation buffer and no
    # single-task per-column pandas group anywhere in the final plan
    assert "percentile(" not in plan.replace("approx_percentile(", "")
    assert "FlatMapGroupsInPandas" not in plan

    with pytest.raises(ValueError, match="rank_margin"):
        quantiles_error_bound_relation(
            df, ["x"], (0.5,), accuracy=100, rank_margin=0.005
        )


def test_exact_quantile_state_matches_sorted_oracle(spark):
    """Randomized parity for the distributed histogram rank selection:
    for adversarial value distributions (heavy duplicates, a hot
    point mass that forces a refinement level, negatives, huge
    magnitudes), _exact_quantile_state's (N, value-at-rank) must equal
    a full driver-side sort + _percentile_from_sorted lookups, and
    quantiles_relation must equal Spark's exact percentile bit-for-bit."""
    import random

    import numpy as np

    from xpshacl_spark.operators.profile import (
        _exact_quantile_state,
        _percentile_from_sorted,
        _rank_targets,
        quantiles_relation,
    )

    rng = random.Random(60_601)
    qs = (0.1, 0.25, 0.5, 0.75, 0.9)
    for trial, pool in enumerate(
        [
            [rng.uniform(-1e9, 1e9) for _ in range(500)],
            [float(rng.randint(0, 8)) for _ in range(500)],
            # point mass: 90% identical values in one tiny bucket
            [3.25] * 450 + [rng.uniform(3.0, 3.5) for _ in range(50)],
        ]
    ):
        rng.shuffle(pool)
        df = spark.createDataFrame([(v,) for v in pool], "x double")
        n_by, val_at, _ = _exact_quantile_state(
            df, ["x"], list(qs), bucket_count=4, candidate_limit=64,
            max_depth=4,
        )
        assert n_by["x"] == len(pool)
        v = np.sort(np.array(pool, dtype="float64"))
        distinct, counts = np.unique(v, return_counts=True)
        cum = np.cumsum(counts)
        for rank in _rank_targets(len(pool), qs):
            idx = int(np.searchsorted(cum, rank, side="left"))
            assert val_at[("x", rank)] == float(distinct[idx]), (
                trial, rank,
            )
        got = {
            r.q: r.quantile
            for r in quantiles_relation(df, ["x"], qs).collect()
        }
        want = {q: _percentile_from_sorted(distinct, cum, q) for q in qs}
        assert got == want, trial


def test_error_bound_vacuous_below_resolution(spark):
    """Small-N soundness: with 2 rows the rank margin buys < 1 row of
    slack, so the sketch (which must return a data value) could sit
    outside the interpolated [q-m, q+m] band while meeting its rank
    guarantee — within_bound must be vacuously TRUE there, and the
    exact_q column still exact."""
    from xpshacl_spark.operators.profile import quantiles_error_bound_relation

    df = spark.createDataFrame([(0.0,), (100.0,)], "x double")
    rows = quantiles_error_bound_relation(df, ["x"], (0.5,)).collect()
    assert len(rows) == 1
    assert rows[0].within_bound is True
    assert rows[0].exact_q == 50.0


def test_two_sample_drift_matches_python_stats(spark):
    """two_sample_drift's in-plan PSI/KS must equal psi_statistic /
    ks_statistic over the same bin counts, and identical distributions
    must score PSI ~ 0 / KS = 0."""
    from xpshacl_spark.operators.drift import (
        ks_statistic,
        psi_statistic,
        two_sample_drift,
    )

    a = spark.createDataFrame([(float(i % 10),) for i in range(100)], "x double")
    b = spark.createDataFrame([(float(i % 5),) for i in range(80)], "x double")
    got = {r.stat: r.value for r in
           two_sample_drift(a, b, "x", 0.0, 10.0, bins=5).collect()}
    # recompute bin counts in python: bucket width 2, underflow/overflow 0
    import collections
    ca = collections.Counter(int((i % 10) // 2) for i in range(100))
    cb = collections.Counter(int((i % 5) // 2) for i in range(80))
    base = [0] + [ca.get(j, 0) for j in range(5)] + [0]
    cur = [0] + [cb.get(j, 0) for j in range(5)] + [0]
    assert abs(got["psi"] - psi_statistic(base, cur)) < 1e-12
    assert abs(got["ks"] - ks_statistic(base, cur)) < 1e-12

    same = {r.stat: r.value for r in
            two_sample_drift(a, a, "x", 0.0, 10.0, bins=5).collect()}
    assert abs(same["psi"]) < 1e-12 and same["ks"] == 0.0

    # single pass: one aggregate over the union, no join
    plan = two_sample_drift(a, b, "x", 0.0, 10.0, bins=5)
    s = plan._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in s
    assert s.count("Union") == 1


def test_two_sample_drift_empty_and_default_bins(spark):
    """Empty inputs yield psi 0.0 / ks 0.0 (never NULL — coalesced
    counts), and the default 64-bin form executes with a bounded plan
    (the staged cell relation keeps the expression tree O(bins))."""
    from xpshacl_spark.operators.drift import two_sample_drift

    empty = spark.createDataFrame([], "x double")
    got = {r.stat: r.value for r in
           two_sample_drift(empty, empty, "x", 0.0, 10.0, bins=5).collect()}
    assert got == {"psi": 0.0, "ks": 0.0}

    a = spark.range(2000).select((F.col("id") % 97).cast("double").alias("x"))
    b = spark.range(2000).select((F.col("id") % 89).cast("double").alias("x"))
    full = {r.stat: r.value for r in
            two_sample_drift(a, b, "x", 0.0, 100.0).collect()}  # bins=64
    assert full["ks"] is not None and 0.0 <= full["ks"] <= 1.0
    assert full["psi"] is not None and full["psi"] >= 0.0


def test_two_sample_drift_clamps_inexact_width_edge(spark):
    """width=(hi-lo)/bins inexact in doubles: a value just below hi
    whose floor((v-lo)/width) rounds to `bins` must be counted in the
    LAST in-range bin, not overflow (clamp pinned by exact counts)."""
    from xpshacl_spark.operators.drift import two_sample_drift

    import math

    # width = 0.9/3 = 0.30000000000000004; v = nextafter(0.9, -inf) is
    # < 0.9 yet floor(v/width) == 3 == bins
    v = 0.8999999999999999
    assert v < 0.9 and math.floor(v / (0.9 / 3)) == 3
    a = spark.createDataFrame([(v,)], "x double")
    b = spark.createDataFrame([(0.05,)], "x double")
    got = {r.stat: r.value for r in
           two_sample_drift(a, b, "x", 0.0, 0.9, bins=3).collect()}
    # both singletons fully in-range: totals 1 and 1 -> KS gap 1.0 at
    # the first bin edge (b all in bin 0, a clamped into bin 2)
    assert got["ks"] == 1.0


def test_entropy_relation_values_and_plan(spark):
    """entropy_relation: hand-computed entropy/distinctness on a tiny
    distribution; NULLs excluded; all-null columns emit no row; and the
    plan is pure hash aggregation — no Window, no Sort, no join."""
    import math

    from xpshacl_spark.operators.profile import entropy_relation

    rows = [("a", "x", None), ("a", "y", None), ("b", "x", None), ("b", "x", None)]
    df = spark.createDataFrame(rows, "u string, v string, w string")
    out = entropy_relation(df, ["u", "v", "w"])
    got = {r["col_name"]: r for r in out.collect()}
    assert set(got) == {"u", "v"}  # w is all-null
    # u: counts (2,2) -> entropy ln2; v: (3,1) -> ln4 - (3 ln3)/4
    assert got["u"]["n_values"] == 4 and got["u"]["n_distinct"] == 2
    assert got["u"]["entropy"] == pytest.approx(math.log(2), abs=1e-6)
    assert got["u"]["distinctness"] == pytest.approx(0.5)
    assert got["v"]["entropy"] == pytest.approx(
        math.log(4) - 3 * math.log(3) / 4, abs=1e-6
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan and "Sort" not in plan and "Join" not in plan


def test_correlation_relation(spark):
    """correlation_relation: exact r on a hand-checkable set, pairwise
    null deletion, NULL for constant columns, and a pure-aggregate plan
    (no window/sort/join)."""
    from xpshacl_spark.operators.profile import correlation_relation

    rows = [
        (1.0, 2.0, 5.0, 1.0),
        (2.0, 4.0, 4.0, 1.0),
        (3.0, 6.0, 3.0, 1.0),
        (4.0, None, 2.0, 1.0),  # dropped pairwise for (x,y) only
    ]
    df = spark.createDataFrame(rows, "x double, y double, z double, c double")
    out = correlation_relation(df, [("x", "y"), ("x", "z"), ("x", "c")])
    got = {(r["x"], r["y"]): r for r in out.collect()}
    assert got[("x", "y")]["n_pairs"] == 3
    assert got[("x", "y")]["corr"] == pytest.approx(1.0)
    assert got[("x", "z")]["n_pairs"] == 4
    assert got[("x", "z")]["corr"] == pytest.approx(-1.0)
    assert got[("x", "c")]["corr"] is None  # zero variance
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan and "Join" not in plan


def test_mutual_information_relation(spark):
    """mutual_information_relation: MI=0 for independent columns,
    ln(2) for a deterministic 1-1 mapping of two equiprobable values,
    and the fact table is scanned once (single Scan in the plan)."""
    import math

    from xpshacl_spark.operators.profile import mutual_information_relation

    # deterministic bijection: MI = H(X) = ln 2
    rows = [("a", "p"), ("a", "p"), ("b", "q"), ("b", "q")]
    df = spark.createDataFrame(rows, "x string, y string")
    r = mutual_information_relation(df, "x", "y").collect()[0]
    assert r["n_pairs"] == 4
    assert r["mi"] == pytest.approx(math.log(2), abs=1e-6)

    # independent: every (x,y) combination equally likely -> MI 0
    rows2 = [(a, b) for a in "ab" for b in "pq"]
    df2 = spark.createDataFrame(rows2, "x string, y string")
    r2 = mutual_information_relation(df2, "x", "y").collect()[0]
    assert r2["mi"] == pytest.approx(0.0, abs=1e-6)

    out = mutual_information_relation(df, "x", "y")
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    # marginals + total derive from the pair relation: the pair-agg
    # exchange is computed ONCE and the three derived branches attach
    # as ReusedExchange — the fact table is scanned once
    assert plan.count("ReusedExchange") == 3
    assert "Window" not in plan
