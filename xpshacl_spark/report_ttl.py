"""Standard SHACL validation-report (Turtle) ingestion.

The reference's ``--input_report`` mode skips validation and replays an
EXISTING report graph — e.g. produced by pyshacl or any conformant
validator — through the explanation pipeline
(/root/reference/src/main.py:75-114; result extraction
extended_shacl_validator.py:183-282). This module is that on-ramp for
the engine: parse ``sh:ValidationResult`` nodes from a report Turtle
file into the engine's violations relation (focus_node +
VIOLATION_COLUMNS), so justification trees / context / cached
explanations run over third-party reports, not only our own outputs.

Mirrors the reference's extraction semantics:

* results are found by ``a sh:ValidationResult`` — standalone subjects,
  blank-node subjects (``[] a sh:ValidationReport ; sh:result [...]``),
  and results nested under ``sh:result`` all work;
* a result without focusNode / sourceShape / sourceConstraintComponent
  is SKIPPED with a recorded reason (the reference logs-and-drops,
  :204-221);
* violation_type is classified from the component name via the same
  mapping the engine compiles with (model.COMPONENT_VIOLATION_TYPE —
  the reference's regex classifier :260-285 agrees on the shared set);
* focus node / shape / component / path / value serialize as strings
  (components and severities reduce to their local names, matching the
  engine's column conventions).
"""

from __future__ import annotations

import os
from typing import Optional

from xpshacl_spark.model import (
    VIOLATION_COLUMNS,
    COMPONENT_VIOLATION_TYPE,
    ViolationType,
)
from xpshacl_spark.shapes_ttl import (
    Blank,
    Literal,
    _Parser,
    _tokenize,
    local_name,
)

SH = "http://www.w3.org/ns/shacl#"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def _parse_statements(text: str) -> list[tuple[Optional[str], list]]:
    """Like shapes_ttl._Parser.parse but also accepts BLANK-NODE
    subjects (``[] a ...`` / ``[ ... ] .``), which rdflib-serialized
    validation reports use for the report node."""
    p = _Parser(_tokenize(text))
    statements: list[tuple[Optional[str], list]] = []
    while p._peek() is not None:
        t = p._peek()
        if t in ("@prefix", "@base", "PREFIX", "BASE"):
            p._parse_prefix()
            continue
        if t == "[":
            p._next()
            props = p._parse_predicate_object_list(stop_at_dot=False)
            if p._peek() == "]":
                p._next()
            props += p._parse_predicate_object_list(stop_at_dot=True)
            if p._peek() == ".":
                p._next()
            statements.append((None, props))
            continue
        subj = p.expand(p._next())
        props = p._parse_predicate_object_list(stop_at_dot=True)
        if p._peek() == ".":
            p._next()
        statements.append((subj, props))
    return statements


def _sval(node) -> Optional[str]:
    if node is None:
        return None
    if isinstance(node, Literal):
        return node.value
    return str(node)


def _result_row(res: Blank, skipped: list) -> Optional[dict]:
    focus = _sval(res.first(SH + "focusNode"))
    shape = _sval(res.first(SH + "sourceShape"))
    comp = _sval(res.first(SH + "sourceConstraintComponent"))
    # required triple per the reference (:204-221): log-and-drop
    for name, v in (("focusNode", focus), ("sourceShape", shape),
                    ("sourceConstraintComponent", comp)):
        if v is None:
            skipped.append((f"sh:{name}", "missing on validation result"))
            return None
    comp_local = local_name(comp)
    severity = res.first(SH + "resultSeverity")
    return {
        "focus_node": focus,
        "shape_id": shape,
        "constraint_component": comp_local,
        "violation_type": COMPONENT_VIOLATION_TYPE.get(
            comp_local, ViolationType.OTHER
        ),
        "property_path": _sval(res.first(SH + "resultPath")),
        "value": _sval(res.first(SH + "value")),
        "message": _sval(res.first(SH + "resultMessage")),
        "severity": local_name(_sval(severity)) if severity else "Violation",
        "context": {},
    }


def violations_from_report_ttl(source: str) -> tuple[list[dict], list]:
    """Parse a SHACL report Turtle file (path or literal text) into
    violation dicts (focus_node + VIOLATION_COLUMNS) + a skip report."""
    if "\n" not in source and " " not in source:
        with open(source, encoding="utf-8") as f:
            text = f.read()
    else:
        text = source
    statements = _parse_statements(text)
    skipped: list = []
    rows: list[dict] = []
    seen: set[int] = set()

    def _consume(res: Blank):
        if id(res) in seen:
            return
        seen.add(id(res))
        row = _result_row(res, skipped)
        if row is not None:
            rows.append(row)

    for subj, props in statements:
        blank = Blank(props)
        types = [str(t) for t in blank.objects(RDF_TYPE)]
        if SH + "ValidationResult" in types:
            _consume(blank)
        for obj in blank.objects(SH + "result"):
            if isinstance(obj, Blank):
                _consume(obj)
    return rows, skipped


def report_violations_df(spark, source: str):
    """The parsed report as a violations DataFrame in the engine's
    column order (focus_node first, context as an empty map — report
    graphs don't carry the engine's context key/values)."""
    from pyspark.sql import types as T

    rows, _ = violations_from_report_ttl(source)
    schema = T.StructType(
        [T.StructField("focus_node", T.StringType(), True)]
        + [
            T.StructField(c, T.StringType(), True)
            for c in VIOLATION_COLUMNS
            if c != "context"
        ]
        + [
            T.StructField(
                "context", T.MapType(T.StringType(), T.StringType()), True
            )
        ]
    )
    ordered = [
        {
            "focus_node": r["focus_node"],
            **{c: r[c] for c in VIOLATION_COLUMNS if c != "context"},
            "context": r["context"],
        }
        for r in rows
    ]
    return spark.createDataFrame(ordered, schema)
