"""Justification-tree templates.

Deterministic, fixed-depth trees (root conclusion + flat premise /
observation / inference children) reproducing the reference builder's
grammar and exact phrasings
(/root/reference/src/justification_tree_builder.py:63-612), including
the phrasings its unit tests assert on
(tests/test_justification_tree_builder.py:68-156): "has N values",
"N < at least K", "is not an instance", the pattern + flags lines, and
the negated-shape sentence.

Where the reference defines _build_property_pair_justification twice
(justification_tree_builder.py:380 and :475 — Python keeps the second),
we reproduce the *live* second definition (SURVEY.md §7.3).

Input is one violation record (a dict with the violations-table columns
plus the shape's constraint params); output is a plain dict matching
JustificationTree.to_dict() (xpshacl_architecture.py:128-133).
"""

from __future__ import annotations

from typing import Optional


def _format_uri(uri: Optional[str]) -> str:
    """justification_tree_builder.py:614-621."""
    if uri is None:
        return "None"
    if uri.startswith("http://") or uri.startswith("https://"):
        return f"<{uri}>"
    return uri


def _node(statement: str, type_: str, evidence: Optional[str] = None) -> dict:
    return {"statement": statement, "type": type_, "evidence": evidence, "children": []}


def _shape_constraint_text(v: dict) -> str:
    """justification_tree_builder.py:623-640."""
    cv = v.get("constraint_value")
    if cv is not None:
        return (
            f"The shape {_format_uri(v['shape_id'])} has a constraint "
            f"{_format_uri(v['constraint_component'])} with value {cv}."
        )
    return (
        f"The shape {_format_uri(v['shape_id'])} has a constraint "
        f"{_format_uri(v['constraint_component'])}."
    )


def _premise(v: dict) -> dict:
    return _node(
        _shape_constraint_text(v),
        "premise",
        evidence=f"From shape definition: {v['shape_id']}",
    )


def _data_evidence(v: dict) -> str:
    """Evidence rendering: the focus row's (key, path, value) fact in a
    triple-like line (analog of the N3 dump at
    justification_tree_builder.py:654-664)."""
    focus = v.get("focus_node") or "unknown"
    path = v.get("property_path") or "value"
    value = v.get("value")
    return f"{focus} {path} {value} .\n"


def build_justification_tree(v: dict) -> dict:
    """violation record -> {"violation": {...}, "justification": {...}}.

    v keys: focus_node, shape_id, constraint_component, violation_type,
    property_path, value, message, severity, context (dict), plus
    optional constraint_value / params extracted from the shape spec.
    """
    root = _node(
        f"Node {_format_uri(v.get('focus_node'))} fails to conform to "
        f"shape {_format_uri(v['shape_id'])}",
        "conclusion",
    )
    vtype = v.get("violation_type")
    builder = {
        "cardinality": _cardinality,
        "value_type": _value_type,
        "value_range": _value_range,
        "pattern": _pattern,
        "property_pair": _property_pair,
        "logical": _logical,
        "uniqueness": _uniqueness,
        "referential": _referential,
        "distribution": _distribution,
    }.get(vtype, _generic)
    builder(v, root)
    return {
        "violation": {
            "focus_node": v.get("focus_node"),
            "shape_id": v.get("shape_id"),
            "constraint_id": v.get("constraint_component"),
            "violation_type": vtype,
            "property_path": v.get("property_path"),
            "value": v.get("value"),
            "message": v.get("message"),
            "severity": v.get("severity"),
            "context": v.get("context") or {},
        },
        "justification": root,
    }


def _cardinality(v: dict, root: dict) -> None:
    """justification_tree_builder.py:100-185."""
    path = v.get("property_path")
    if not path:
        root["children"].append(
            _node(
                "Missing property path information for cardinality constraint",
                "error",
            )
        )
        return
    root["children"].append(_premise(v))
    ctx = v.get("context") or {}
    comp = v["constraint_component"]
    if "MinCountConstraintComponent" in comp:
        min_count = ctx.get("minCount", "at least 1")
        actual = ctx.get("actualCount", v.get("value"))
        root["children"].append(
            _node(
                f"The data shows that node {_format_uri(v.get('focus_node'))} "
                f"has {actual} values for property {_format_uri(path)}",
                "observation",
                evidence=_data_evidence(v),
            )
        )
        root["children"].append(
            _node(
                f"Since {actual} < at least {min_count}, the node violates the "
                f"minimum cardinality constraint of the shape",
                "inference",
            )
        )
    elif "MaxCountConstraintComponent" in comp:
        max_count = ctx.get("maxCount", "at most 1")
        actual = ctx.get("actualCount", v.get("value"))
        root["children"].append(
            _node(
                f"The data shows that node {_format_uri(v.get('focus_node'))} "
                f"has {actual} values for property {_format_uri(path)}",
                "observation",
                evidence=_data_evidence(v),
            )
        )
        root["children"].append(
            _node(
                f"Since {actual} > at most {max_count}, the node violates the "
                f"maximum cardinality constraint of the shape",
                "inference",
            )
        )


def _value_type(v: dict, root: dict) -> None:
    """justification_tree_builder.py:187-244."""
    path = v.get("property_path") or "this node"
    root["children"].append(_premise(v))
    value = v.get("value")
    comp = v["constraint_component"]
    if not value and "ClassConstraintComponent" in comp:
        stmt = (
            f"The node {_format_uri(v.get('focus_node'))} is not an instance "
            f"of the required class"
        )
    else:
        stmt = (
            f"The value {_format_uri(value) if value else value} for property "
            f"{_format_uri(path)} of node {_format_uri(v.get('focus_node'))} "
            f"has an incompatible type"
        )
    root["children"].append(_node(stmt, "observation", evidence=_data_evidence(v)))
    params = v.get("params") or {}
    if "DatatypeConstraintComponent" in comp and params.get("datatype"):
        root["children"].append(
            _node(
                f"The value does not match the required datatype "
                f"{_format_uri(str(params['datatype']))}",
                "inference",
            )
        )
    elif "ClassConstraintComponent" in comp and params.get("refTable"):
        root["children"].append(
            _node(
                f"The value is not an instance of the required class "
                f"{_format_uri(str(params['refTable']))}",
                "inference",
            )
        )


def _value_range(v: dict, root: dict) -> None:
    """justification_tree_builder.py:246-325."""
    path = v.get("property_path")
    if not path:
        root["children"].append(
            _node(
                "Missing property path information for value range constraint",
                "error",
            )
        )
        return
    root["children"].append(_premise(v))
    root["children"].append(
        _node(
            f"The data shows that property {_format_uri(path)} of node "
            f"{_format_uri(v.get('focus_node'))} has value {v.get('value')}",
            "observation",
            evidence=_data_evidence(v),
        )
    )
    params = v.get("params") or {}
    comp = v["constraint_component"]
    bound = None
    kind = None
    if "MinExclusiveConstraintComponent" in comp:
        bound, kind = params.get("minExclusive"), "minimum"
    elif "MinInclusiveConstraintComponent" in comp:
        bound, kind = params.get("minInclusive"), "minimum"
    elif "MaxExclusiveConstraintComponent" in comp:
        bound, kind = params.get("maxExclusive"), "maximum"
    elif "MaxInclusiveConstraintComponent" in comp:
        bound, kind = params.get("maxInclusive"), "maximum"
    if bound is not None:
        root["children"].append(
            _node(
                f"The value provided does not comply with the {kind} value "
                f"restriction {bound}",
                "inference",
            )
        )


def _pattern(v: dict, root: dict) -> None:
    """justification_tree_builder.py:327-378."""
    root["children"].append(_premise(v))
    path, value = v.get("property_path"), v.get("value")
    if path and value:
        root["children"].append(
            _node(
                f"The data shows that node {_format_uri(v.get('focus_node'))} "
                f"has value {value} for property {_format_uri(path)}.",
                "observation",
                evidence=_data_evidence(v),
            )
        )
    params = v.get("params") or {}
    if "PatternConstraintComponent" in v["constraint_component"]:
        pattern = params.get("pattern")
        if pattern:
            root["children"].append(
                _node(
                    f"The value provided does not comply with the pattern {pattern}.",
                    "inference",
                )
            )
        flags = params.get("flags")
        if flags:
            root["children"].append(
                _node(f"The pattern uses flags {flags}.", "inference")
            )


def _property_pair(v: dict, root: dict) -> None:
    """Live (second) definition, justification_tree_builder.py:475-545."""
    root["children"].append(_premise(v))
    path, value = v.get("property_path"), v.get("value")
    if path and value:
        root["children"].append(
            _node(
                f"The data shows that node {_format_uri(v.get('focus_node'))} "
                f"has value {value} for property {_format_uri(path)}.",
                "observation",
                evidence=_data_evidence(v),
            )
        )
    params = v.get("params") or {}
    comp = v["constraint_component"]
    if "EqualsConstraintComponent" in comp and params.get("equals"):
        root["children"].append(
            _node(
                f"The shape states that property {_format_uri(path)} must have "
                f"the same values as {_format_uri(params['equals'])}.",
                "inference",
            )
        )
    elif "DisjointConstraintComponent" in comp and params.get("disjoint"):
        root["children"].append(
            _node(
                f"The shape states that property {_format_uri(path)} must not "
                f"have any of the same values as {_format_uri(params['disjoint'])}.",
                "inference",
            )
        )
    elif "LessThanConstraintComponent" in comp and params.get("lessThan"):
        root["children"].append(
            _node(
                f"The shape states that the value of property {_format_uri(path)} "
                f"must be less than the value of {_format_uri(params['lessThan'])}.",
                "inference",
            )
        )
    elif "LessThanOrEqualsConstraintComponent" in comp:
        other = params.get("lessThanOrEquals") or params.get("orderBy")
        if other:
            root["children"].append(
                _node(
                    f"The shape states that the value of property "
                    f"{_format_uri(path)} must be less than or equal to the "
                    f"value of {_format_uri(other)}.",
                    "inference",
                )
            )


def _logical(v: dict, root: dict) -> None:
    """justification_tree_builder.py:547-600."""
    root["children"].append(_premise(v))
    params = v.get("params") or {}
    comp = v["constraint_component"]
    sid = _format_uri(v["shape_id"])
    if "NotConstraintComponent" in comp:
        inner = _format_uri(str(params.get("not")))
        root["children"].append(
            _node(
                f"The shape {sid} includes a negation of the shape {inner}. "
                f"This means that, for the resource to be valid, it cannot "
                f"comply with the rules of the shape {inner}",
                "inference",
            )
        )
    elif "AndConstraintComponent" in comp:
        lst = _format_uri(str(params.get("and")))
        root["children"].append(
            _node(
                f"The shape {sid} includes a conjunction of the shapes listed "
                f"in {lst}. This means that, for the resource to be valid, it "
                f"must comply with all rules of the shapes listed in {lst}",
                "inference",
            )
        )
    elif "OrConstraintComponent" in comp:
        lst = _format_uri(str(params.get("or")))
        root["children"].append(
            _node(
                f"The shape {sid} includes a disjunction of the shapes listed "
                f"in {lst}. This means that, for the resource to be valid, it "
                f"must comply with at least one of the shapes listed in {lst}",
                "inference",
            )
        )
    elif "XoneConstraintComponent" in comp:
        lst = _format_uri(str(params.get("xone")))
        root["children"].append(
            _node(
                f"The shape {sid} includes an exclusive disjunction of the "
                f"shapes listed in {lst}. This means that, for the resource to "
                f"be valid, it must comply with exactly one of the shapes "
                f"listed in {lst}",
                "inference",
            )
        )


def _uniqueness(v: dict, root: dict) -> None:
    """North-rule extension; follows the cardinality grammar."""
    root["children"].append(_premise(v))
    ctx = v.get("context") or {}
    actual = ctx.get("actualCount", "multiple")
    root["children"].append(
        _node(
            f"The data shows that key {v.get('value')} identifies {actual} rows "
            f"for columns {_format_uri(v.get('property_path'))}",
            "observation",
            evidence=_data_evidence(v),
        )
    )
    root["children"].append(
        _node(
            f"Since {actual} > 1, the key violates the uniqueness constraint "
            f"of the shape",
            "inference",
        )
    )


def _referential(v: dict, root: dict) -> None:
    """North-rule extension; follows the value_type/class grammar."""
    root["children"].append(_premise(v))
    ctx = v.get("context") or {}
    ref = ctx.get("refTable", "the referenced table")
    root["children"].append(
        _node(
            f"The node {_format_uri(v.get('focus_node'))} is not an instance "
            f"of the required class",
            "observation",
            evidence=_data_evidence(v),
        )
    )
    root["children"].append(
        _node(
            f"The value {v.get('value')} does not exist in {ref}",
            "inference",
        )
    )


def _distribution(v: dict, root: dict) -> None:
    """North-rule extension: drift statistic exceeded its threshold."""
    root["children"].append(_premise(v))
    ctx = v.get("context") or {}
    root["children"].append(
        _node(
            f"The data shows that expression {_format_uri(v.get('property_path'))} "
            f"has {ctx.get('stat', 'drift')} statistic {v.get('value')}",
            "observation",
        )
    )
    root["children"].append(
        _node(
            f"Since {v.get('value')} > threshold {ctx.get('threshold')}, the "
            f"distribution has drifted from the baseline",
            "inference",
        )
    )


def _generic(v: dict, root: dict) -> None:
    """justification_tree_builder.py:602-612."""
    root["children"].append(
        _node(
            f"Generic justification for violation: "
            f"{v.get('message') or 'Unknown violation'}",
            "unknown",
        )
    )
