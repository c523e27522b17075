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

import hashlib
import json
import os
import re
import time
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xpshacl_spark.compiler import ValidationEngine, ValidationReport
from xpshacl_spark.shapes import Shape


def _sanitize(shape_id: str) -> str:
    return re.sub(r"[^A-Za-z0-9_.\-]+", "_", shape_id)


def _token(shape_id: str) -> str:
    """Filesystem-safe token, COLLISION-FREE across distinct shape_ids:
    when sanitization had to rewrite anything, an md5 suffix of the raw
    id disambiguates ('a b' and 'a/b' must not share one manifest file
    and clobber each other's violations bucket). Ids that are already
    safe keep their plain token (existing checkpoints stay valid).

    Checkpoints written BEFORE the md5 suffix existed used the plain
    sanitized token for unsafe ids too; `CheckpointedRunner._resolve_token`
    detects such a legacy manifest for the same shape_id and keeps using
    its token, so a resume extends the original manifest + violations
    bucket instead of forking a second pair under the new token."""
    safe = _sanitize(shape_id)
    if safe != shape_id:
        safe = f"{safe}_{hashlib.md5(shape_id.encode()).hexdigest()[:8]}"
    return safe


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
        out: dict[str, dict] = {}
        owner: dict[str, str] = {}
        for fn in sorted(os.listdir(self.manifest_dir)):
            if fn.endswith(".json"):
                with open(os.path.join(self.manifest_dir, fn)) as f:
                    rec = json.load(f)
                sid = rec["shape_id"]
                if sid in out:
                    # one shape_id owning two manifests means two
                    # violations buckets exist and report() would read
                    # only one of them — fail loudly instead of letting
                    # listdir order pick a winner
                    raise RuntimeError(
                        f"duplicate checkpoint manifests for shape_id "
                        f"{sid!r}: {owner[sid]} and {fn}; delete the "
                        "stale one (and its violations bucket) or use a "
                        "fresh output_dir"
                    )
                out[sid] = rec
                owner[sid] = fn
        return out

    def _resolve_token(self, shape_id: str) -> str:
        """Canonical token for this shape_id, honoring a pre-existing
        legacy-token checkpoint (written before _token gained the md5
        suffix): if `<sanitized>.json` exists and records THIS shape_id,
        keep using that token so resume extends the original manifest +
        bucket instead of creating a duplicate pair under the new token."""
        token = _token(shape_id)
        legacy = _sanitize(shape_id)
        if legacy != token:
            legacy_manifest = os.path.join(self.manifest_dir, f"{legacy}.json")
            if os.path.exists(legacy_manifest):
                with open(legacy_manifest) as f:
                    rec = json.load(f)
                if rec.get("shape_id") == shape_id:
                    return legacy
        return token

    def _prune_orphan_deltas(self, token: str, recorded: set[str]) -> None:
        """Delete delta_* subdirs of a shape bucket that the manifest
        does not record — leftovers of a run killed between the delta
        write and its manifest publish. Their files will be re-covered
        by the next delta; leaving them would double-count violations in
        report() (which reads the bucket recursively)."""
        import shutil

        bucket = os.path.join(self.violations_dir, f"shape_bucket={token}")
        if not os.path.isdir(bucket):
            return
        for fn in os.listdir(bucket):
            path = os.path.join(bucket, fn)
            if (
                fn.startswith("delta_")
                and os.path.isdir(path)
                and fn[len("delta_"):] not in recorded
            ):
                shutil.rmtree(path)

    def _write_manifest(self, rec: dict, token: Optional[str] = None) -> None:
        token = token if token is not None else self._resolve_token(rec["shape_id"])
        path = os.path.join(self.manifest_dir, f"{token}.json")
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
            # None (JSON null), not []: "lineage unavailable" must stay
            # distinguishable from "no files" — run_incremental refuses
            # to delta against an unknown-lineage checkpoint instead of
            # treating every current file as new (double-counting)
            lineage = sorted(df.inputFiles()) or None
        except Exception:
            lineage = None
        n_input_parts = df.rdd.getNumPartitions()
        completed_now = 0

        for shape in shapes:
            rec = done.get(shape.shape_id)
            if rec is not None:
                recorded = rec.get("input_files")
                if recorded and lineage and sorted(recorded) != lineage:
                    # skipping here would serve the OLD run's violations
                    # as if they covered the new input
                    raise ValueError(
                        f"shape {shape.shape_id!r} is checkpointed against "
                        f"different input lineage ({len(recorded)} recorded "
                        f"vs {len(lineage)} current files); use "
                        "run_incremental() for appended files, or a fresh "
                        "output_dir for a changed input"
                    )
                continue
            t0 = time.monotonic()
            rep = self.engine.validate(df, [shape], key_cols=key_cols)
            token = self._resolve_token(shape.shape_id)
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
                },
                token=token,
            )
            completed_now += 1
            if fail_after is not None and completed_now >= fail_after:
                raise RuntimeError(f"simulated failure after {fail_after} shapes")

        return self.report(key_cols)

    def run_incremental(
        self,
        input_path: str,
        shapes: Sequence[Shape],
        key_cols: Sequence[str],
        force: bool = False,
    ) -> ValidationReport:
        """Validate only input files NOT yet in each shape's manifest
        lineage — the delta mode for append-only tables (a new ingest
        drops new files/partitions; old ones are immutable).

        Only row-level and referential constraints are delta-safe: a
        group/window/uniqueness check over part of a group is wrong when
        the group spans old and new files. Those shapes raise unless
        force=True (legitimate when the table layout guarantees group
        locality per file, e.g. writes bucketed by conv_id).

        Each delta writes to its own subdirectory of the shape bucket
        (overwrite-idempotent per delta; a kill re-runs just the delta)
        and the manifest entry's lineage/metrics are extended — so
        `report()` still assembles the complete relation.

        Crash safety: the manifest is the source of truth. A kill
        between a delta write and its manifest publish leaves an ORPHAN
        delta directory whose files the retry will re-cover (the retry's
        new-file set, and hence its delta_id, may differ if more files
        landed meanwhile) — so before writing, any delta_* subdirectory
        not recorded in the manifest's `deltas` list is deleted. That
        restores the run()-level invariant: a kill at any point leaves
        either no trace or a complete manifest entry, never a
        double-counted file.
        """
        from xpshacl_spark.shapes import non_streamable_constraints

        if not force:
            bad = non_streamable_constraints(shapes)
            if bad:
                raise ValueError(
                    "constraints not delta-safe (groups may span old and "
                    f"new files; pass force=True if layout guarantees "
                    f"group-per-file locality): {bad}"
                )

        import hashlib

        current = sorted(self.spark.read.parquet(input_path).inputFiles())
        done = self.completed()
        for shape in shapes:
            rec = done.get(shape.shape_id)
            if rec is not None and not rec.get("input_files"):
                raise ValueError(
                    f"shape {shape.shape_id!r} was checkpointed without "
                    "input-file lineage (non-file source); a delta cannot "
                    "determine which files are new and would re-validate "
                    "(and double-count) everything — rerun run() on a "
                    "file-backed input or use a fresh output_dir"
                )
            seen = set(rec.get("input_files", [])) if rec else set()
            new = [f for f in current if f not in seen]
            if not new:
                continue
            token = self._resolve_token(shape.shape_id)
            self._prune_orphan_deltas(
                token, {d["delta_id"] for d in (rec or {}).get("deltas", [])}
            )
            t0 = time.monotonic()
            # basePath keeps hive-style partition columns that a plain
            # leaf-file read would drop (shapes may reference them)
            delta_df = (
                self.spark.read.option("basePath", input_path).parquet(*new)
            )
            rep = self.engine.validate(delta_df, [shape], key_cols=key_cols)
            delta_id = hashlib.md5("|".join(new).encode()).hexdigest()[:12]
            # plain subdir name (no '='): the shape bucket must not look
            # like a partitioned layout — report() reads it with
            # recursiveFileLookup, which skips partition discovery
            out_path = os.path.join(
                self.violations_dir, f"shape_bucket={token}", f"delta_{delta_id}"
            )
            rep.violations.write.mode("overwrite").parquet(out_path)
            n = self.spark.read.parquet(out_path).count()
            deltas = (rec.get("deltas", []) if rec else []) + [
                {
                    "delta_id": delta_id,
                    "n_files": len(new),
                    "n_violations": n,
                    "wall_sec": round(time.monotonic() - t0, 3),
                }
            ]
            self._write_manifest(
                {
                    "run_id": self.run_id,
                    "shape_id": shape.shape_id,
                    "status": "completed",
                    "n_violations": (rec["n_violations"] if rec else 0) + n,
                    "n_input_partitions": delta_df.rdd.getNumPartitions(),
                    "input_files": sorted(seen | set(new)),
                    "deltas": deltas,
                    # cumulative across deltas (per-delta time is in
                    # the deltas list), plus the initial full run if any
                    "wall_sec": round(
                        (rec.get("wall_sec", 0.0) if rec else 0.0)
                        + (time.monotonic() - t0),
                        3,
                    ),
                    "output_path": os.path.join(
                        self.violations_dir, f"shape_bucket={token}"
                    ),
                    "finished_unix": time.time(),
                },
                token=token,
            )
        return self.report(key_cols)

    def report(self, key_cols: Sequence[str]) -> ValidationReport:
        """Assemble the full violations relation from checkpointed parts."""
        done = self.completed()
        if not done:
            raise RuntimeError("no completed shapes in checkpoint")
        paths = [rec["output_path"] for rec in done.values()]
        df = (
            self.spark.read.option("mergeSchema", "false")
            # full-run files sit at the bucket root and incremental
            # deltas in delta_* subdirs; recursive lookup reads both and
            # disables partition discovery over the subdir names
            .option("recursiveFileLookup", "true")
            .parquet(*paths)
        )
        metrics = {
            "n_shapes_completed": len(done),
            "total_violations": sum(r["n_violations"] for r in done.values()),
        }
        return ValidationReport(df, list(key_cols), metrics)
