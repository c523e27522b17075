"""Domain-context retrieval for explanations.

Re-expresses the reference's ContextRetriever
(/root/reference/src/context_retriever.py:22-186) over DataFrames:

* ontology fragments -> the focus row's columns rendered as fact lines
  (:40-56 renders all triples about the focus node);
* shape documentation -> shape description + "Shape Name: {name}"
  (:58-66, format asserted in tests/test_context_retriever.py:75-83);
* similar cases -> the ANTI-JOIN: rows in the same target population
  that LACK the violated property (:68-135; test :85-102 pins "node2
  in, node3 out" semantics);
* domain rules -> small lookup rendered "Rule <uri> (label): comment"
  (:138-186; format asserted in test :105-119).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class DomainRule:
    """Analog of the xsh:appliesToProperty ontology entries
    (/root/reference/data/xpshacl_ontology.ttl:26-36)."""

    uri: str
    applies_to: str  # property/column name
    label: Optional[str] = None
    comment: Optional[str] = None

    def render(self) -> str:
        """context_retriever.py:170-178 formatting."""
        text = f"Rule <{self.uri}>"
        if self.label:
            text += f" ({self.label})"
        if self.comment:
            text += f": {self.comment}"
        elif not self.label:
            text += ": Applies to this property."
        return text


def shape_documentation(shape) -> list[str]:
    """context_retriever.py:58-66: comments then 'Shape Name: X'."""
    docs: list[str] = []
    if getattr(shape, "description", None):
        docs.append(shape.description)
    if getattr(shape, "name", None):
        docs.append(f"Shape Name: {shape.name}")
    return docs


def ontology_fragments(row: dict, key_cols: Sequence[str]) -> list[str]:
    """Render the focus row's properties as fact lines (analog of the
    N3 triple dump, context_retriever.py:40-56)."""
    focus = ";".join(f"{k}={row.get(k)}" for k in key_cols if row.get(k) is not None)
    frags = []
    for k, val in row.items():
        if k in key_cols:
            continue
        frags.append(f'{focus} {k} "{val}" .')
    return frags


def _case_candidates(
    df: DataFrame, property_path: str, target: Optional[str]
) -> DataFrame:
    """The shared anti-join filter: same-population rows LACKING the
    violated property (context_retriever.py:68-135). Single definition
    so the one-shot and batch retrievals cannot drift."""
    cand = df
    if target:
        cand = cand.where(F.expr(target))
    return cand.where(F.col(property_path).isNull())


def _render_nodes(rows, key_cols: Sequence[str], node_type: str) -> list[dict]:
    return [
        {
            "node": ";".join(f"{k}={r[k]}" for k in key_cols),
            "node_type": node_type,
        }
        for r in rows
    ]


def similar_cases(
    df: DataFrame,
    property_path: Optional[str],
    key_cols: Sequence[str],
    target: Optional[str] = None,
    exclude: Optional[dict] = None,
    limit: int = 5,
) -> list[dict]:
    """The similar-cases anti-join, one retrieval (the batch form is
    similar_cases_batch). Returns [{node, node_type}] dicts mirroring
    the reference output shape."""
    if property_path is None or property_path not in df.columns:
        return []
    cand = _case_candidates(df, property_path, target)
    if exclude:
        keep = F.lit(False)
        for k, v in exclude.items():
            keep = keep | (~F.col(k).eqNullSafe(F.lit(v)))
        cand = cand.where(keep)
    rows = (
        cand.select(*key_cols)
        .orderBy(*key_cols)  # deterministic selection
        .limit(limit)
        .collect()
    )
    return _render_nodes(rows, key_cols, target or "row")


def similar_cases_batch(
    df: DataFrame,
    specs: Sequence[dict],
    key_cols: Sequence[str],
    limit: int = 5,
) -> list[list[dict]]:
    """Every signature's similar-cases retrieval in ONE Spark action.

    specs: [{property_path, target}] — one entry per distinct retrieval.
    Returns a list parallel to specs, each element the same
    [{node, node_type}] list `similar_cases` would produce.

    Plan: one tagged orderBy(keys).limit(limit) branch per spec
    (TakeOrderedAndProject — per-task heaps, never a global sort),
    unioned and collected once. Each branch pushes its own filters to
    the scan, and the collected relation is <= limit * |specs| rows. A
    thousand-signature suite is one job instead of a thousand
    (VERDICT r01 item 4)."""
    from functools import reduce

    out: list[list[dict]] = [[] for _ in specs]
    branches = []
    for i, spec in enumerate(specs):
        pp = spec.get("property_path")
        if pp is None or pp not in df.columns:
            continue
        cand = _case_candidates(df, pp, spec.get("target"))
        branches.append(
            cand.select(F.lit(i).alias("_spec"), *key_cols)
            .orderBy(*key_cols)
            .limit(limit)
        )
    if not branches:
        return out
    by_spec: dict[int, list] = {}
    for r in reduce(DataFrame.unionByName, branches).collect():
        by_spec.setdefault(r["_spec"], []).append(r)
    for i, rows in by_spec.items():
        # Spark's ascending orderBy is NULLS FIRST — mirror it exactly so
        # the batch path returns the same ordering as similar_cases
        rows.sort(key=lambda r: tuple((r[k] is not None, r[k]) for k in key_cols))
        out[i] = _render_nodes(rows, key_cols, specs[i].get("target") or "row")
    return out


def domain_rules(
    rules: Sequence[DomainRule], property_path: Optional[str]
) -> list[str]:
    """context_retriever.py:138-186: rules applying to the violated
    property, human-rendered."""
    if not property_path:
        return []
    return [r.render() for r in rules if r.applies_to == property_path]


def retrieve_context(
    violation: dict,
    shape,
    df: Optional[DataFrame],
    key_cols: Sequence[str],
    rules: Sequence[DomainRule] = (),
    similar_limit: int = 5,
    similar: Optional[list] = None,
) -> dict:
    """Assemble the DomainContext struct (context_retriever.py:29-38;
    xpshacl_architecture.py:144-163). Pass `similar` (precomputed via
    similar_cases_batch) to avoid a per-signature Spark job."""
    frag_row = {
        k: violation.get(k)
        for k in list(key_cols) + ["property_path", "value"]
        if violation.get(k) is not None
    }
    if similar is not None:
        sims = similar
    elif df is not None:
        sims = similar_cases(
            df,
            violation.get("property_path"),
            key_cols,
            target=getattr(shape, "target", None),
            limit=similar_limit,
        )
    else:
        sims = []
    return {
        "ontology_fragments": ontology_fragments(frag_row, key_cols),
        "shape_documentation": shape_documentation(shape) if shape else [],
        "similar_cases": sims,
        "domain_rules": domain_rules(rules, violation.get("property_path")),
    }
