"""JSON (de)serialization for shapes.

The reference parses an RDF shapes graph (/root/reference/src/main.py:55);
our declarative analog is a JSON document, so shape suites can ship to
a cluster alongside `spark-submit --py-files` without code changes.

Format:
{
  "shapes": [
    {"shape_id": "...", "target": "role = 'assistant'",
     "severity": "Violation", "message": null,
     "name": "...", "description": "...",
     "constraints": [
        {"kind": "MinInclusive", "column": "turn_idx", "bound": 0},
        {"kind": "Or", "children": [{"kind": "Expr", ...}, ...]},
        ...
     ]}
  ]
}
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any

from xpshacl_spark import shapes as S

_CONSTRAINTS = {
    name: cls
    for name, cls in vars(S).items()
    if isinstance(cls, type)
    and dataclasses.is_dataclass(cls)
    and issubclass(cls, S.Constraint)
    and cls not in (S.Constraint, S.RowConstraint)
}

_NESTED_FIELDS = {"inner"}
_NESTED_LIST_FIELDS = {"children"}
_NESTED_SHAPE_FIELDS = {"shape"}  # NodeRef carries a whole referenced Shape
_TUPLE_FIELDS = {
    "columns",
    "determinant",
    "group_by",
    "ref_columns",
    "values",
    "baseline",
    "children",
    "declared",
    "ignored",
    "initial",
}

#: fields holding a tuple of (value, tuple) pairs (Transition.allowed_prev)
_PAIR_TUPLE_FIELDS = {"allowed_prev"}


def constraint_to_dict(c: S.Constraint) -> dict:
    d: dict[str, Any] = {"kind": type(c).__name__}
    for f in dataclasses.fields(c):
        v = getattr(c, f.name)
        if f.name in _NESTED_FIELDS and v is not None:
            v = constraint_to_dict(v)
        elif f.name in _NESTED_LIST_FIELDS and v is not None:
            v = [constraint_to_dict(x) for x in v]
        elif f.name in _NESTED_SHAPE_FIELDS and v is not None:
            v = shape_to_dict(v)
        elif isinstance(v, tuple):
            v = list(v)
        d[f.name] = v
    return d


def constraint_from_dict(d: dict) -> S.Constraint:
    d = dict(d)
    kind = d.pop("kind")
    cls = _CONSTRAINTS[kind]
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in d:
            continue
        v = d[f.name]
        if f.name in _NESTED_FIELDS and isinstance(v, dict):
            v = constraint_from_dict(v)
        elif f.name in _NESTED_LIST_FIELDS and isinstance(v, list):
            v = tuple(constraint_from_dict(x) for x in v)
        elif f.name in _NESTED_SHAPE_FIELDS and isinstance(v, dict):
            v = shape_from_dict(v)
        elif f.name in _PAIR_TUPLE_FIELDS and isinstance(v, list):
            v = tuple((x[0], tuple(x[1])) for x in v)
        elif f.name in _TUPLE_FIELDS and isinstance(v, list):
            v = tuple(v)
        kwargs[f.name] = v
    return cls(**kwargs)


def shape_to_dict(s: S.Shape) -> dict:
    return {
        "shape_id": s.shape_id,
        "target": s.target,
        "severity": s.severity,
        "message": s.message,
        "name": s.name,
        "description": s.description,
        "constraints": [constraint_to_dict(c) for c in s.constraints],
    }


def shape_from_dict(d: dict) -> S.Shape:
    return S.Shape(
        shape_id=d["shape_id"],
        constraints=tuple(constraint_from_dict(c) for c in d["constraints"]),
        target=d.get("target"),
        severity=d.get("severity", "Violation"),
        message=d.get("message"),
        name=d.get("name"),
        description=d.get("description"),
    )


def shapes_to_json(shapes: list[S.Shape]) -> str:
    return json.dumps({"shapes": [shape_to_dict(s) for s in shapes]}, indent=2)


def shapes_from_json(text: str) -> list[S.Shape]:
    return [shape_from_dict(d) for d in json.loads(text)["shapes"]]


def load_shapes(path: str, **ttl_kwargs) -> list[S.Shape]:
    """Load shapes from JSON, or from Turtle when the path ends in
    .ttl/.turtle (the reference's shapes-graph format — see shapes_ttl
    for the recognized predicate subset and tabular conventions)."""
    with open(path) as f:
        text = f.read()
    if path.endswith((".ttl", ".turtle")):
        from xpshacl_spark.shapes_ttl import shapes_from_ttl

        return shapes_from_ttl(text, **ttl_kwargs)
    if ttl_kwargs:
        raise TypeError(
            f"{sorted(ttl_kwargs)} only apply to Turtle inputs; "
            f"'{path}' is JSON"
        )
    return shapes_from_json(text)


def save_shapes(path: str, shapes: list[S.Shape]) -> None:
    with open(path, "w") as f:
        f.write(shapes_to_json(shapes))
