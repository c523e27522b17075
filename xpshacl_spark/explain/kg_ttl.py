"""Violation-KG Turtle export/import.

The reference persists its violation knowledge graph as Turtle
(/root/reference/src/violation_kg.py:59-66 ``save_kg`` via rdflib, node
layout built in ``add_violation`` :208-284, ontology
``data/xpshacl_ontology.ttl``).  The engine's cache is a Parquet table
(``explain/cache.py``); this module is the missing round-trip with
reference tooling: serialize the cache to the reference's exact triple
shape and parse such a file back into a cache — the inverse of the
existing Turtle ingestion (``shapes_ttl.py``), whose tokenizer/parser it
reuses.

Triple layout per signature (violation_kg.py:219-284):

    xsh:sig_<md5>  a xsh:ViolationSignature ;
        xsh:hasExplanation xsh:sig_<md5>_explanation ;
        xsh:constraintComponent "..." ;
        xsh:propertyPath "..." ;          # if present
        xsh:violationType "..." ;         # if present
        xsh:constraintParams "{...}" .    # sorted-keys JSON, if present
    xsh:sig_<md5>_explanation  a xsh:Explanation ;
        xsh:naturalLanguageText "..."@en ;     # one per language
        xsh:correctionSuggestions "..."@en ;   # combined with \\n\\n
        xsh:providedByModel "..." ;            # single value (last wins)
        xsh:violation "{...}" ;                # JSON, once per node
        xsh:justificationTree "{...}" ;
        xsh:retrievedContext "{...}" .

providedByModel and the three JSON blobs are expl-NODE-level facts in
the reference (model is overwritten on re-add, JSON stored only on node
creation), so export flattens them to one triple each; import attaches
them to the lexicographically-first language row, which preserves the
emulated-fact count (``cache.size()``) across repeated round trips.
"""

from __future__ import annotations

import os
from typing import Iterable, Optional

import pandas as pd

from xpshacl_spark.explain.cache import _COLUMNS, ExplanationCache
from xpshacl_spark.shapes_ttl import Literal, _Parser, _tokenize

XSH = "http://xpshacl.org/#"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

_HEADER = (
    "@prefix xsh: <http://xpshacl.org/#> .\n"
    "@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .\n"
)


def _esc(s: str) -> str:
    return (
        str(s)
        .replace("\\", "\\\\")
        .replace('"', '\\"')
        .replace("\n", "\\n")
        .replace("\r", "\\r")
        .replace("\t", "\\t")
    )


def _lit(s: str, lang: Optional[str] = None) -> str:
    out = f'"{_esc(s)}"'
    return f"{out}@{lang}" if lang else out


def _pn(uri: str) -> str:
    """Prefixed name for a full xsh URI."""
    if uri.startswith(XSH):
        return "xsh:" + uri[len(XSH):]
    return f"<{uri}>"


def _notna(v) -> bool:
    return v is not None and not (isinstance(v, float) and pd.isna(v))


def kg_to_turtle(cache: ExplanationCache) -> str:
    """Serialize the cache to the reference's KG Turtle layout."""
    chunks = [_HEADER]
    df = cache._df
    for sig_uri, grp in df.groupby("signature_id", sort=True):
        first = grp.iloc[0]
        expl_uri = str(sig_uri) + "_explanation"
        sig_lines = [
            f"{_pn(str(sig_uri))} a xsh:ViolationSignature",
            f"    xsh:hasExplanation {_pn(expl_uri)}",
            f"    xsh:constraintComponent {_lit(first['constraint_component'])}",
        ]
        for pred, col in (
            ("xsh:propertyPath", "property_path"),
            ("xsh:violationType", "violation_type"),
            ("xsh:constraintParams", "constraint_params"),
        ):
            if _notna(first[col]):
                sig_lines.append(f"    {pred} {_lit(first[col])}")
        chunks.append(" ;\n".join(sig_lines) + " .\n")

        expl_lines = [f"{_pn(expl_uri)} a xsh:Explanation"]
        for _, row in grp.sort_values("language").iterrows():
            lang = row["language"]
            if _notna(row["natural_language_explanation"]):
                expl_lines.append(
                    "    xsh:naturalLanguageText "
                    + _lit(row["natural_language_explanation"], lang)
                )
            if _notna(row["correction_suggestions"]):
                expl_lines.append(
                    "    xsh:correctionSuggestions "
                    + _lit(row["correction_suggestions"], lang)
                )
        # expl-node-level facts: model = last non-null (reference
        # overwrites on re-add); JSON = the single non-null per column
        models = [m for m in grp["provided_by_model"] if _notna(m)]
        if models:
            expl_lines.append(f"    xsh:providedByModel {_lit(models[-1])}")
        for pred, col in (
            ("xsh:violation", "violation_json"),
            ("xsh:justificationTree", "justification_tree_json"),
            ("xsh:retrievedContext", "retrieved_context_json"),
        ):
            vals = [v for v in grp[col] if _notna(v)]
            if vals:
                expl_lines.append(f"    {pred} {_lit(vals[0])}")
        chunks.append(" ;\n".join(expl_lines) + " .\n")
    return "\n".join(chunks)


def save_kg_turtle(cache: ExplanationCache, path: str) -> None:
    """violation_kg.py:59-66 analog: write the KG Turtle file."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        f.write(kg_to_turtle(cache))


def _first_of(props: dict, pred: str):
    objs = props.get(pred, [])
    return objs[0] if objs else None


def kg_from_turtle(
    source: str, cache_path: Optional[str] = None
) -> ExplanationCache:
    """Parse a reference-layout KG Turtle file (path or literal text)
    back into an ExplanationCache — inverse of :func:`kg_to_turtle`,
    also accepts rdflib-serialized files from the reference itself
    (any statement order, prefixed or full IRIs)."""
    if os.path.exists(source) or "\n" not in source:
        # an existing path wins outright (even one containing spaces —
        # mirroring report_ttl.report_violations_df); otherwise any
        # single-line string is a file path — every serialized KG
        # contains newlines (prefix block + one line per statement), so
        # a missing file ALWAYS raises instead of silently parsing the
        # path string into an empty cache. Literal Turtle text must
        # therefore contain a newline (append one if hand-built).
        with open(source, encoding="utf-8") as f:
            text = f.read()
    else:
        text = source
    parser = _Parser(_tokenize(text))
    # subject -> {pred: [objects]}; statements for one subject may repeat
    subjects: dict[str, dict[str, list]] = {}
    for subj, props in parser.parse():
        if subj is None:
            continue  # KG nodes are always IRIs (xsh:sig_... / _explanation)
        acc = subjects.setdefault(subj, {})
        for pred, objs in props:
            acc.setdefault(pred, []).extend(objs)

    rows = []
    for subj, props in subjects.items():
        types = props.get(RDF_TYPE, [])
        if XSH + "ViolationSignature" not in types:
            continue
        expl_ref = _first_of(props, XSH + "hasExplanation")
        expl = subjects.get(expl_ref, {}) if isinstance(expl_ref, str) else {}

        def _sval(node) -> Optional[str]:
            if node is None:
                return None
            return node.value if isinstance(node, Literal) else str(node)

        base = {
            "signature_id": subj,
            "constraint_component": _sval(
                _first_of(props, XSH + "constraintComponent")
            ),
            "property_path": _sval(_first_of(props, XSH + "propertyPath")),
            "violation_type": _sval(_first_of(props, XSH + "violationType")),
            "constraint_params": _sval(
                _first_of(props, XSH + "constraintParams")
            ),
        }
        by_lang: dict[str, dict] = {}
        for pred, col in (
            (XSH + "naturalLanguageText", "natural_language_explanation"),
            (XSH + "correctionSuggestions", "correction_suggestions"),
        ):
            for obj in expl.get(pred, []):
                if isinstance(obj, Literal):
                    lang = obj.lang or "en"
                    by_lang.setdefault(lang, {})[col] = obj.value
        model = _sval(_first_of(expl, XSH + "providedByModel"))
        node_level = {
            "violation_json": _sval(_first_of(expl, XSH + "violation")),
            "justification_tree_json": _sval(
                _first_of(expl, XSH + "justificationTree")
            ),
            "retrieved_context_json": _sval(
                _first_of(expl, XSH + "retrievedContext")
            ),
        }
        for i, lang in enumerate(sorted(by_lang)):
            row = dict(base)
            row["language"] = lang
            row["natural_language_explanation"] = by_lang[lang].get(
                "natural_language_explanation"
            )
            row["correction_suggestions"] = by_lang[lang].get(
                "correction_suggestions"
            )
            row["provided_by_model"] = model if i == 0 else None
            for col, val in node_level.items():
                row[col] = val if i == 0 else None
            rows.append(row)

    cache = ExplanationCache(path=None)
    cache.path = cache_path
    if rows:
        df = pd.DataFrame(rows)
        # stable column order + deterministic row order
        cache._df = df[_COLUMNS].sort_values(
            ["signature_id", "language"], ignore_index=True
        )
    return cache
