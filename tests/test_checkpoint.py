"""Checkpoint/resume invariants (north rule): kill after k shapes,
resume, identical final relation; manifest carries lineage + metrics.
Plus shapes JSON round-trip."""

import json
import os

import pytest

from xpshacl_spark.checkpoint import CheckpointedRunner
from xpshacl_spark.compiler import ValidationEngine
from xpshacl_spark.datagen import roles_dim, tools_dim, transcripts
from xpshacl_spark.shapes_io import load_shapes, save_shapes, shapes_from_json, shapes_to_json
from xpshacl_spark.suites import transcript_shapes


@pytest.fixture(scope="module")
def tdf(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ckpt") / "t.parquet")
    transcripts(spark, n_convs=120, seed=11).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def _engine(spark):
    return ValidationEngine(
        spark, dims={"roles": roles_dim(spark), "tools": tools_dim(spark)}
    )


def _rows(report):
    return sorted(
        (tuple(str(x) for x in r) for r in report.violations.drop("context").collect()),
    )


def test_kill_and_resume_identical(spark, tdf, tmp_path):
    shapes = transcript_shapes()
    keys = ["conv_id", "turn_idx"]

    # uninterrupted reference run
    full_dir = str(tmp_path / "full")
    ref = CheckpointedRunner(_engine(spark), full_dir).run(tdf, shapes, keys)
    ref_rows = _rows(ref)
    assert len(ref_rows) > 0

    # interrupted run: fail after 2 shapes, then resume
    part_dir = str(tmp_path / "partial")
    runner = CheckpointedRunner(_engine(spark), part_dir)
    with pytest.raises(RuntimeError, match="simulated failure"):
        runner.run(tdf, shapes, keys, fail_after=2)
    assert len(runner.completed()) == 2

    resumed = CheckpointedRunner(_engine(spark), part_dir).run(tdf, shapes, keys)
    assert _rows(resumed) == ref_rows


def test_resume_skips_completed(spark, tdf, tmp_path):
    shapes = transcript_shapes()[:3]
    keys = ["conv_id", "turn_idx"]
    out = str(tmp_path / "skip")
    r1 = CheckpointedRunner(_engine(spark), out)
    r1.run(tdf, shapes, keys)
    done = r1.completed()
    stamps = {k: v["finished_unix"] for k, v in done.items()}
    # second run must not recompute anything
    r2 = CheckpointedRunner(_engine(spark), out)
    r2.run(tdf, shapes, keys)
    stamps2 = {k: v["finished_unix"] for k, v in r2.completed().items()}
    assert stamps == stamps2


def test_manifest_lineage_and_metrics(spark, tdf, tmp_path):
    shapes = transcript_shapes()[:1]
    out = str(tmp_path / "lineage")
    runner = CheckpointedRunner(_engine(spark), out)
    runner.run(tdf, shapes, ["conv_id", "turn_idx"])
    rec = list(runner.completed().values())[0]
    assert rec["status"] == "completed"
    assert rec["n_violations"] > 0
    assert rec["n_input_partitions"] > 0
    assert any(f.endswith(".parquet") or "part-" in f for f in rec["input_files"])
    assert rec["wall_sec"] > 0
    assert os.path.isdir(rec["output_path"])


def test_shapes_json_roundtrip(tmp_path):
    shapes = transcript_shapes()
    text = shapes_to_json(shapes)
    back = shapes_from_json(text)
    assert back == shapes
    p = str(tmp_path / "shapes.json")
    save_shapes(p, shapes)
    assert load_shapes(p) == shapes
    # sanity: the JSON mentions every constraint kind used
    doc = json.loads(text)
    kinds = {
        c["kind"] for s in doc["shapes"] for c in s["constraints"]
    }
    assert {"MinInclusive", "Pattern", "ForeignKey", "Unique", "Monotonic"} <= kinds


def test_incremental_delta_run(spark, tmp_path):
    """Append-only delta mode: after a full run, adding new input files
    re-validates ONLY those files, and the assembled relation equals a
    from-scratch validation of the whole table."""
    from xpshacl_spark.checkpoint import CheckpointedRunner
    from xpshacl_spark.compiler import ValidationEngine
    from xpshacl_spark.datagen import transcripts
    from xpshacl_spark.shapes import MinInclusive, NotNull, Shape

    inp = str(tmp_path / "inc.parquet")
    a = transcripts(spark, n_convs=40, seed=1)
    a.coalesce(1).write.mode("append").parquet(inp)

    shapes = [Shape("inc_row", (MinInclusive("turn_idx", 0), NotNull("text")))]
    keys = ["conv_id", "turn_idx"]
    out = str(tmp_path / "out")
    eng = ValidationEngine(spark)
    CheckpointedRunner(eng, out).run(spark.read.parquet(inp), shapes, keys)
    n_before = json.load(
        open(f"{out}/manifest/inc_row.json")
    )["n_violations"]

    # append a second batch of files (different seed => new conv block)
    transcripts(spark, n_convs=25, seed=2).coalesce(1).write.mode(
        "append"
    ).parquet(inp)

    runner2 = CheckpointedRunner(ValidationEngine(spark), out)
    rep = runner2.run_incremental(inp, shapes, keys)
    rec = json.load(open(f"{out}/manifest/inc_row.json"))
    assert rec["deltas"] and rec["deltas"][0]["n_files"] == 1  # only the new file
    assert rec["n_violations"] >= n_before

    full = ValidationEngine(spark).validate(
        spark.read.parquet(inp), shapes, key_cols=keys
    )
    assert sorted(map(repr, rep.violations.collect())) == sorted(
        map(repr, full.violations.collect())
    )

    # idempotence: nothing new -> no further deltas, same relation
    rep2 = runner2.run_incremental(inp, shapes, keys)
    assert rep2.violations.count() == rep.violations.count()
    assert len(json.load(open(f"{out}/manifest/inc_row.json"))["deltas"]) == 1


def test_incremental_orphan_delta_pruned(spark, tmp_path):
    """A delta directory written by a run killed BEFORE its manifest
    publish must not double-count its files: the next incremental run
    prunes unrecorded delta_* dirs, and the assembled relation equals a
    from-scratch validation (ADVICE r01: retry delta re-covers the
    orphan's files when more files landed in between)."""
    import shutil

    from xpshacl_spark.shapes import MinInclusive, NotNull, Shape

    inp = str(tmp_path / "in.parquet")
    out = str(tmp_path / "out")
    shapes = [Shape("inc_row", (MinInclusive("turn_idx", 0), NotNull("text")))]
    keys = ["conv_id", "turn_idx"]

    transcripts(spark, n_convs=30, seed=1).coalesce(1).write.mode(
        "append"
    ).parquet(inp)
    runner = CheckpointedRunner(ValidationEngine(spark), out)
    runner.run(spark.read.parquet(inp), shapes, keys)

    # batch B lands; simulate the crash: its delta is on disk but the
    # manifest never learned about it (clone a real delta to an
    # unrecorded id, as if the recorded one were the later retry)
    transcripts(spark, n_convs=20, seed=2).coalesce(1).write.mode(
        "append"
    ).parquet(inp)
    runner.run_incremental(inp, shapes, keys)
    bucket = f"{out}/violations/shape_bucket=inc_row"
    recorded = [d for d in os.listdir(bucket) if d.startswith("delta_")]
    assert len(recorded) == 1
    orphan = os.path.join(bucket, "delta_deadbeefcafe")
    shutil.copytree(os.path.join(bucket, recorded[0]), orphan)
    wall_after_first = json.load(open(f"{out}/manifest/inc_row.json"))["wall_sec"]

    # batch C lands; the next incremental run must prune the orphan
    transcripts(spark, n_convs=10, seed=3).coalesce(1).write.mode(
        "append"
    ).parquet(inp)
    rep = runner.run_incremental(inp, shapes, keys)
    assert not os.path.exists(orphan)

    full = ValidationEngine(spark).validate(
        spark.read.parquet(inp), shapes, key_cols=keys
    )
    assert sorted(map(repr, rep.violations.collect())) == sorted(
        map(repr, full.violations.collect())
    )
    # wall_sec accumulates across deltas instead of being overwritten
    rec = json.load(open(f"{out}/manifest/inc_row.json"))
    assert rec["wall_sec"] > wall_after_first
    assert len(rec["deltas"]) == 2


def test_incremental_keeps_partition_columns(spark, tmp_path):
    """Delta reads go through basePath so hive-style partition columns
    survive — a shape referencing the partition column must validate
    identically in incremental mode (ADVICE r01: leaf-file reads drop
    partition columns)."""
    from pyspark.sql import functions as F

    from xpshacl_spark.shapes import Pattern, Shape

    inp = str(tmp_path / "part.parquet")
    out = str(tmp_path / "out")
    # partition the layout by a derived column the shape will validate
    transcripts(spark, n_convs=30, seed=1).withColumn(
        "shard", F.concat(F.lit("s"), (F.crc32("conv_id") % 3).cast("string"))
    ).write.partitionBy("shard").mode("append").parquet(inp)

    shapes = [Shape("shard_fmt", (Pattern("shard", r"^s[01]$"),))]
    keys = ["conv_id", "turn_idx"]
    runner = CheckpointedRunner(ValidationEngine(spark), out)
    runner.run(spark.read.parquet(inp), shapes, keys)

    transcripts(spark, n_convs=20, seed=2).withColumn(
        "shard", F.concat(F.lit("t"), (F.crc32("conv_id") % 2).cast("string"))
    ).write.partitionBy("shard").mode("append").parquet(inp)
    rep = runner.run_incremental(inp, shapes, keys)

    full = ValidationEngine(spark).validate(
        spark.read.parquet(inp), shapes, key_cols=keys
    )
    assert full.violations.count() > 0
    assert sorted(map(repr, rep.violations.collect())) == sorted(
        map(repr, full.violations.collect())
    )


def test_incremental_rejects_group_shapes(spark, tmp_path):
    from xpshacl_spark.checkpoint import CheckpointedRunner
    from xpshacl_spark.compiler import ValidationEngine
    from xpshacl_spark.datagen import transcripts
    from xpshacl_spark.shapes import Shape, Unique

    inp = str(tmp_path / "g.parquet")
    transcripts(spark, n_convs=10).write.parquet(inp)
    r = CheckpointedRunner(ValidationEngine(spark), str(tmp_path / "o"))
    with pytest.raises(ValueError, match="delta-safe"):
        r.run_incremental(
            inp, [Shape("u", (Unique(("conv_id", "turn_idx")),))],
            ["conv_id", "turn_idx"],
        )


def test_runner_cli_incremental(spark, tmp_path):
    """runner.main --incremental end to end: second invocation after an
    append validates only the new files and exits with the same code
    semantics."""
    from xpshacl_spark import runner
    from xpshacl_spark.datagen import transcripts
    from xpshacl_spark.shapes_io import save_shapes
    from xpshacl_spark.shapes import MinInclusive, NotNull, Shape

    inp = str(tmp_path / "in.parquet")
    out = str(tmp_path / "out")
    shp = str(tmp_path / "shapes.json")
    save_shapes(shp, [Shape("r", (MinInclusive("turn_idx", 0), NotNull("text")))])

    transcripts(spark, n_convs=30, seed=1).coalesce(1).write.mode(
        "append"
    ).parquet(inp)
    rc = runner.main(
        ["--input", inp, "--output", out, "--shapes", shp, "--incremental"]
    )
    assert rc == 3
    transcripts(spark, n_convs=20, seed=2).coalesce(1).write.mode(
        "append"
    ).parquet(inp)
    rc2 = runner.main(
        ["--input", inp, "--output", out, "--shapes", shp, "--incremental"]
    )
    assert rc2 == 3
    rec = json.load(open(f"{out}/manifest/r.json"))
    assert len(rec["deltas"]) == 2 and rec["deltas"][-1]["n_files"] == 1


def test_token_collision_distinct_buckets():
    from xpshacl_spark.checkpoint import _token

    assert _token("a b") != _token("a/b")
    assert _token("plain_id-1.x") == "plain_id-1.x"  # safe ids unchanged


def test_run_raises_on_stale_lineage(spark, tmp_path):
    """Resuming against CHANGED input must not silently serve the old
    run's violations: same shape_id + different file lineage raises."""
    from xpshacl_spark.checkpoint import CheckpointedRunner
    from xpshacl_spark.compiler import ValidationEngine
    from xpshacl_spark.shapes import MinInclusive, Shape

    p1, p2 = str(tmp_path / "in1"), str(tmp_path / "in2")
    spark.createDataFrame([(1, -5)], "id long, v long").write.parquet(p1)
    spark.createDataFrame([(1, -5), (2, 3)], "id long, v long").write.parquet(p2)
    shape = Shape("s", (MinInclusive("v", 0),))
    runner = CheckpointedRunner(
        ValidationEngine(spark), str(tmp_path / "out"), run_id="r1"
    )
    runner.run(spark.read.parquet(p1), [shape], key_cols=["id"])
    import pytest as _pt

    with _pt.raises(ValueError, match="different input lineage"):
        runner.run(spark.read.parquet(p2), [shape], key_cols=["id"])
    # identical lineage still resumes (skip) cleanly
    rep = runner.run(spark.read.parquet(p1), [shape], key_cols=["id"])
    assert rep.violations.count() == 1


def test_incremental_refuses_unknown_lineage(spark, tmp_path):
    """A full run whose input had no file lineage (in-memory df) must
    not be silently re-covered by run_incremental (it would re-validate
    and double-count everything)."""
    from xpshacl_spark.checkpoint import CheckpointedRunner
    from xpshacl_spark.compiler import ValidationEngine
    from xpshacl_spark.shapes import MinInclusive, Shape

    shape = Shape("s", (MinInclusive("v", 0),))
    runner = CheckpointedRunner(
        ValidationEngine(spark), str(tmp_path / "out2"), run_id="r1"
    )
    mem_df = spark.createDataFrame([(1, -5)], "id long, v long")
    runner.run(mem_df, [shape], key_cols=["id"])
    p = str(tmp_path / "in3")
    mem_df.write.parquet(p)
    import pytest as _pt

    with _pt.raises(ValueError, match="without input-file lineage"):
        runner.run_incremental(p, [shape], key_cols=["id"])


def test_legacy_token_checkpoint_resumes_in_place(spark, tmp_path):
    """A checkpoint written BEFORE _token gained its md5 suffix (unsafe
    shape_id stored under the plain sanitized token) must be extended in
    place on resume — not forked into a second manifest + bucket pair."""
    from xpshacl_spark.checkpoint import CheckpointedRunner, _sanitize, _token
    from xpshacl_spark.compiler import ValidationEngine
    from xpshacl_spark.shapes import MinInclusive, Shape

    sid = "range check v/1"  # needs sanitization -> md5-suffixed today
    assert _token(sid) != _sanitize(sid)
    p = str(tmp_path / "in")
    spark.createDataFrame([(1, -5), (2, 3)], "id long, v long").write.parquet(p)
    df = spark.read.parquet(p)
    shape = Shape(sid, (MinInclusive("v", 0),))
    out = str(tmp_path / "out")
    runner = CheckpointedRunner(ValidationEngine(spark), out, run_id="r1")
    runner.run(df, [shape], key_cols=["id"])

    # rewrite the checkpoint to the legacy layout: plain-token manifest
    # + plain-token violations bucket, as the pre-suffix code wrote it
    legacy, new = _sanitize(sid), _token(sid)
    man_dir = os.path.join(out, "manifest")
    vio_dir = os.path.join(out, "violations")
    with open(os.path.join(man_dir, f"{new}.json")) as f:
        rec = json.load(f)
    rec["output_path"] = os.path.join(vio_dir, f"shape_bucket={legacy}")
    os.rename(
        os.path.join(vio_dir, f"shape_bucket={new}"), rec["output_path"]
    )
    os.remove(os.path.join(man_dir, f"{new}.json"))
    with open(os.path.join(man_dir, f"{legacy}.json"), "w") as f:
        json.dump(rec, f)

    resumed = CheckpointedRunner(ValidationEngine(spark), out, run_id="r2")
    # full-run resume skips via shape_id and reads the legacy bucket
    rep = resumed.run(df, [shape], key_cols=["id"])
    assert rep.violations.count() == 1
    # incremental delta extends the LEGACY manifest/bucket, no fork
    p2 = str(tmp_path / "in" )
    spark.createDataFrame([(9, -7)], "id long, v long").write.mode(
        "append"
    ).parquet(p2)
    rep2 = resumed.run_incremental(p2, [shape], key_cols=["id"])
    assert rep2.violations.count() == 2
    manifests = [f for f in os.listdir(man_dir) if f.endswith(".json")]
    assert manifests == [f"{legacy}.json"]
    assert not os.path.isdir(os.path.join(vio_dir, f"shape_bucket={new}"))


def test_completed_raises_on_duplicate_shape_id(spark, tmp_path):
    """Two manifests claiming one shape_id = two buckets, and report()
    would silently read only one — completed() must fail loudly."""
    from xpshacl_spark.checkpoint import CheckpointedRunner
    from xpshacl_spark.compiler import ValidationEngine

    out = str(tmp_path / "out")
    runner = CheckpointedRunner(ValidationEngine(spark), out, run_id="r1")
    for fn in ("a.json", "b.json"):
        with open(os.path.join(out, "manifest", fn), "w") as f:
            json.dump({"shape_id": "s", "output_path": "x"}, f)
    with pytest.raises(RuntimeError, match="duplicate checkpoint manifests"):
        runner.completed()


def test_hard_kill_resume_end_to_end(spark, tmp_path):
    """The north rule's resumability criterion, end to end over the
    full transcript suite with a REAL kill: a separate runner process
    is SIGKILLed mid-suite (after >= 3 of the shapes checkpoint), a
    second process resumes from the manifest, and the assembled
    violations relation is identical to an uninterrupted run's."""
    import signal
    import subprocess
    import sys
    import time as _time

    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    inp = str(tmp_path / "in.parquet")
    transcripts(spark, n_convs=150, seed=23).write.parquet(inp)
    killed_out = str(tmp_path / "killed")
    clean_out = str(tmp_path / "clean")
    env = dict(os.environ, PYTHONPATH=repo)

    def _launch(out_dir):
        return subprocess.Popen(
            [
                sys.executable, "-m", "xpshacl_spark.runner",
                "--input", inp, "--output", out_dir, "--master", "local[4]",
            ],
            cwd=repo, env=env, start_new_session=True,
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        )

    # run 1: SIGKILL the whole process group once >= 3 shapes checkpoint
    proc = _launch(killed_out)
    man = os.path.join(killed_out, "manifest")
    deadline = _time.monotonic() + 420
    try:
        while _time.monotonic() < deadline:
            # count only PUBLISHED manifests (.json): an in-flight
            # .json.tmp would otherwise trip the kill one shape early
            n = len(
                [f for f in os.listdir(man) if f.endswith(".json")]
                if os.path.isdir(man)
                else []
            )
            if n >= 3:
                os.killpg(proc.pid, signal.SIGKILL)
                break
            if proc.poll() is not None:
                raise AssertionError(
                    "runner finished before the kill could land — "
                    "input too small for this e2e"
                )
            _time.sleep(0.2)
        else:
            raise AssertionError("runner never checkpointed 3 shapes")
    finally:
        if proc.poll() is None:
            os.killpg(proc.pid, signal.SIGKILL)
        proc.wait()
    n_killed = len([f for f in os.listdir(man) if f.endswith(".json")])
    assert 3 <= n_killed < 11, n_killed  # died mid-suite, not at the end

    # run 2: resume in a fresh process; must complete cleanly
    proc2 = _launch(killed_out)
    out2, _ = proc2.communicate(timeout=600)
    # exit 3 = completed, violations found (expected on this data)
    assert proc2.returncode in (0, 3), out2
    resumed_summary = json.loads(out2.strip().splitlines()[-1])

    # reference: one uninterrupted run in another fresh process
    proc3 = _launch(clean_out)
    out3, _ = proc3.communicate(timeout=600)
    assert proc3.returncode == proc2.returncode, out3
    clean_summary = json.loads(out3.strip().splitlines()[-1])

    assert resumed_summary["by_shape"] == clean_summary["by_shape"]
    assert resumed_summary["n_violations"] == clean_summary["n_violations"]

    def _all_rows(out_dir):
        df = spark.read.option("recursiveFileLookup", "true").parquet(
            os.path.join(out_dir, "violations")
        ).drop("context")
        return sorted(tuple(str(x) for x in r) for r in df.collect())

    assert _all_rows(killed_out) == _all_rows(clean_out)
