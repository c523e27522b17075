"""Explanation pipeline: signature dedup, justification trees, context,
persistent cache, and fan-out back to violation instances."""

from xpshacl_spark.explain.signature import (
    ViolationSignature,
    signature_string,
    signature_to_uri,
    signature_id_col,
)
from xpshacl_spark.explain.cache import ExplanationCache
from xpshacl_spark.explain.pipeline import Explainer

__all__ = [
    "ViolationSignature",
    "signature_string",
    "signature_to_uri",
    "signature_id_col",
    "ExplanationCache",
    "Explainer",
]
