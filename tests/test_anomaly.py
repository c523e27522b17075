"""Metric-history anomaly detection (operators/anomaly.py)."""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import pytest
from pyspark.sql import functions as F

from xpshacl_spark.operators.anomaly import (
    history_from_manifests,
    metric_anomalies,
)


def _hist(spark, values, metric="m"):
    return spark.createDataFrame(
        [(metric, float(i), float(v)) for i, v in enumerate(values)],
        "metric string, run_order double, value double",
    )


def test_spike_flagged_with_exact_baseline(spark):
    # stable 10s then a 3x spike at index 5
    out = metric_anomalies(
        _hist(spark, [10, 10, 10, 10, 10, 30, 10]), window=7, threshold=0.5
    ).collect()
    assert [(r.run_order, r.value) for r in out] == [(5.0, 30.0)]
    r = out[0]
    assert r.baseline_mean == 10.0 and r.n_history == 5
    assert r.deviation_ratio == 2.0


def test_warmup_and_window_exclusion(spark):
    # first min_history points can never be flagged; the spike itself is
    # NOT in its own baseline; post-spike rows compare against a
    # baseline that contains the spike but stay under threshold
    out = metric_anomalies(
        _hist(spark, [100, 1, 1, 1]), window=7, threshold=0.5, min_history=3
    ).collect()
    # index 3: baseline mean(100,1,1)=34 -> |1-34|=33 > 17 -> flagged
    assert [(r.run_order, r.value) for r in out] == [(3.0, 1.0)]
    # nothing flagged during warmup even though index 0 is extreme
    out2 = metric_anomalies(
        _hist(spark, [100, 1]), window=7, threshold=0.5, min_history=3
    ).collect()
    assert out2 == []


def test_per_metric_partitioning_and_zero_baseline(spark):
    two = _hist(spark, [5, 5, 5, 5, 50]).union(
        _hist(spark, [0, 0, 0, 0, 9], metric="z")
    )
    out = metric_anomalies(two, window=4, threshold=0.5).collect()
    # metric z's baseline mean is 0 and its value positive -> flagged
    # with a NULL ratio (no division blowup); m's spike independently
    got = {(r.metric, r.value): r.deviation_ratio for r in out}
    assert set(got) == {("m", 50.0), ("z", 9.0)}
    assert got[("z", 9.0)] is None and got[("m", 50.0)] == 9.0


def test_param_validation(spark):
    with pytest.raises(ValueError):
        metric_anomalies(_hist(spark, [1]), window=0)
    with pytest.raises(ValueError):
        metric_anomalies(_hist(spark, [1]), window=3, min_history=4)


def test_single_partitioned_window_plan(spark):
    plan = (
        metric_anomalies(_hist(spark, [1, 2, 3]))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Window") == 1
    assert "partitionBy" not in plan.lower().replace("window", "")  # sanity
    # partitioned window: the exchange is hashpartitioning on metric,
    # never a single-partition global sort
    assert "SinglePartition" not in plan


def test_history_from_manifests_cross_run(spark, tmp_path):
    from xpshacl_spark.checkpoint import CheckpointedRunner
    from xpshacl_spark.compiler import ValidationEngine
    from xpshacl_spark.shapes import MaxInclusive, Shape

    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 10).cast("double").alias("v")
    )
    engine = ValidationEngine(spark)
    dirs = []
    for i, bound in enumerate([8.0, 5.0]):
        out = str(tmp_path / f"run{i}")
        CheckpointedRunner(engine, out, run_id=f"r{i}").run(
            df, [Shape("s", (MaxInclusive("v", bound),))], key_cols=["k"]
        )
        dirs.append(out)
    hist = history_from_manifests(spark, dirs)
    rows = sorted(
        (r.run_id, r.metric, r.value) for r in hist.collect()
    )
    assert rows == [
        ("r0", "n_violations/s", 10.0),
        ("r1", "n_violations/s", 40.0),
    ]
    with pytest.raises(FileNotFoundError):
        history_from_manifests(spark, [str(tmp_path / "nope")])


def test_rate_of_change_flags_both_directions(spark):
    """3x spike then recovery: the up-leg (rate 3) and down-leg
    (rate 1/3) both fire; steady points and the no-prior first point
    never do; a zero previous value yields no ratio, not a flag."""
    from xpshacl_spark.operators.anomaly import rate_of_change_anomalies

    hist = spark.createDataFrame(
        [("m", 1.0, 100.0), ("m", 2.0, 100.0), ("m", 3.0, 300.0),
         ("m", 4.0, 100.0), ("z", 1.0, 0.0), ("z", 2.0, 50.0)],
        "metric string, run_order double, value double",
    )
    out = {
        (r.metric, r.run_order): r.rate
        for r in rate_of_change_anomalies(hist).collect()
    }
    assert out == {("m", 3.0): 3.0, ("m", 4.0): 100.0 / 300.0}


def test_zscore_textbook_variance_and_warmup(spark):
    """Constant history has std 0 -> never flagged (no division blowup);
    a varied history flags only the 3-sigma outlier; fewer than
    min_history prior points never flag."""
    from xpshacl_spark.operators.anomaly import zscore_anomalies

    rows = [("m", float(i), v) for i, v in enumerate(
        [10.0, 12.0, 11.0, 10.0, 11.0, 12.0, 11.0, 60.0]
    )] + [("c", float(i), 5.0) for i in range(8)]
    hist = spark.createDataFrame(
        rows, "metric string, run_order double, value double"
    )
    out = zscore_anomalies(hist, window=7, z=3.0, min_history=3).collect()
    assert [(r.metric, r.run_order, r.value) for r in out] == [("m", 7.0, 60.0)]
    r = out[0]
    import statistics
    prior = [10.0, 12.0, 11.0, 10.0, 11.0, 12.0, 11.0]
    assert r.baseline_mean == round(sum(prior) / 7, 6)
    assert abs(r.baseline_std - statistics.stdev(prior)) < 1e-6
    assert r.n_history == 7


def test_zscore_param_validation(spark):
    from xpshacl_spark.operators.anomaly import zscore_anomalies

    hist = spark.createDataFrame(
        [("m", 1.0, 1.0)], "metric string, run_order double, value double"
    )
    with pytest.raises(ValueError):
        zscore_anomalies(hist, window=1)
    with pytest.raises(ValueError):
        zscore_anomalies(hist, window=5, min_history=6)


def test_zero_baseline_spike_is_flagged(spark):
    """History 0,0,0 then a spike: the zero trailing mean must NOT
    suppress the page (deviation_ratio is NULL — no finite ratio);
    an all-zero continuation stays quiet."""
    hist = _hist(spark, [0, 0, 0, 1_000_000, 0])
    out = metric_anomalies(hist, window=7, threshold=0.5, min_history=3)
    rows = sorted(out.collect(), key=lambda r: r.run_order)
    # the spike pages (NULL ratio: zero baseline), and the drop back to
    # 0 pages too (now baselined by the spike, ratio -1)
    assert [(r.run_order, r.value) for r in rows] == [
        (3.0, 1_000_000.0), (4.0, 0.0),
    ]
    assert rows[0].deviation_ratio is None
    assert rows[1].deviation_ratio == -1.0
