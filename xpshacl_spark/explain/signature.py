"""Violation signatures: the identity of a violation *type* independent
of the focus row.

Byte-for-byte parity with the reference's md5 signature key
(/root/reference/src/violation_kg.py:88-102): the signature string is
``f"{constraint_id}|{property_path}|{violation_type}|{sorted_params}"``
where missing path/type render as the literal "None", params render as
the Python repr of the sorted (key, value) tuple list, and the URI is
``http://xpshacl.org/#sig_<md5hex>``.

Two implementations that must agree: a driver-side pure function and a
Spark Column expression for computing signature ids over the violations
DataFrame (F.md5 over concat_ws).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field
from typing import Dict, Optional

from pyspark.sql import Column
from pyspark.sql import functions as F

XSH = "http://xpshacl.org/#"


@dataclass(frozen=True)
class ViolationSignature:
    """Mirrors /root/reference/src/violation_signature.py:5-31; the
    factory always leaves constraint_params empty
    (/root/reference/src/violation_signature_factory.py:7-16)."""

    constraint_id: str
    property_path: Optional[str]
    violation_type: Optional[str] = None
    constraint_params: Dict[str, str] = field(default_factory=dict)

    def __hash__(self):
        sorted_params = tuple(sorted(self.constraint_params.items()))
        return hash(
            (self.constraint_id, self.property_path, self.violation_type, sorted_params)
        )

    def __eq__(self, other):
        if not isinstance(other, ViolationSignature):
            return False
        return (
            self.constraint_id == other.constraint_id
            and self.property_path == other.property_path
            and self.violation_type == other.violation_type
            and dict(self.constraint_params) == dict(other.constraint_params)
        )


def signature_string(sig: ViolationSignature) -> str:
    """Reference algorithm, violation_kg.py:88-99."""
    params = sig.constraint_params if sig.constraint_params else {}
    sorted_params = sorted(params.items())
    property_path_str = str(sig.property_path) if sig.property_path else "None"
    violation_type_str = str(sig.violation_type) if sig.violation_type else "None"
    return (
        f"{sig.constraint_id}|{property_path_str}|{violation_type_str}|{sorted_params}"
    )


def signature_hash(sig: ViolationSignature) -> str:
    return hashlib.md5(signature_string(sig).encode("utf-8")).hexdigest()


def signature_to_uri(sig: ViolationSignature) -> str:
    """violation_kg.py:101-102 — xsh:sig_<md5hex>."""
    return f"{XSH}sig_{signature_hash(sig)}"


def signature_id_col(
    component: Column | str = "constraint_component",
    property_path: Column | str = "property_path",
    violation_type: Column | str = "violation_type",
    params_repr: str = "[]",
    enum_repr: bool = True,
) -> Column:
    """Spark expression computing the same md5 hex over violation rows.

    The violations table carries no constraint params (matching the
    reference factory, which always passes {}), so params render as the
    Python repr of an empty sorted list: "[]".

    enum_repr=True reproduces the reference *runtime* exactly: the
    factory passes the ViolationType ENUM into the signature, and
    str(enum) renders as "ViolationType.VALUE_RANGE"
    (violation_signature_factory.py:11-16 + violation_kg.py:96), so the
    md5 input uses that form rather than the bare value.
    """
    comp = F.col(component) if isinstance(component, str) else component
    path = F.col(property_path) if isinstance(property_path, str) else property_path
    vtype = (
        F.col(violation_type) if isinstance(violation_type, str) else violation_type
    )
    if enum_repr:
        vtype = F.concat(F.lit("ViolationType."), F.upper(vtype))
    s = F.concat_ws(
        "|",
        comp,
        F.coalesce(path, F.lit("None")),
        F.coalesce(vtype, F.lit("None")),
        F.lit(params_repr),
    )
    return F.md5(s)
