"""Turtle (.ttl) shapes importer for the reference's recognized
SHACL predicate subset.

The reference's entry point parses a Turtle shapes graph
(/root/reference/src/main.py:55) and indexes the predicates listed in
extended_shacl_validator.py:88-107 (minCount, maxCount, datatype,
value-range, pattern/flags, property pairs, nodeKind, targets,
message/severity, rdfs:comment). This module gives users holding
existing .ttl shape files (e.g. the reference's example_shapes.ttl /
shark_shapes.ttl) an on-ramp into the engine's tabular Shape model
without an RDF library: a small hand-rolled Turtle subset parser
(prefixes, statements, blank-node property blocks, literals with
datatype/lang suffixes, collections, triple-quoted strings) feeds a
predicate->Constraint mapping.

Tabular projection conventions (documented, overridable):

* a property URI maps to the column named by its local name
  (``ex:hasAge`` -> ``hasAge``); override per-URI with ``column_map``;
* ``sh:targetClass ex:Person`` maps to the row filter
  ``rdf_type = 'Person'`` — the standard flat projection of RDF
  instances keyed by an ``rdf_type`` column; override with
  ``target_map`` (class URI or local name -> SQL predicate);
* row-scoped ``sh:minCount >= 1`` becomes NotNull (a flat column holds
  at most one value per row, so maxCount >= 1 is vacuous and skipped);
* predicates outside the recognized subset (e.g. sh:sparql SPARQL
  bodies, sh:uniqueLang over flat columns, sh:declare) are skipped and
  reported in ``TtlImport.skipped`` rather than failing the load.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Optional, Sequence, Union

from xpshacl_spark import shapes as S

# ---------------------------------------------------------------------------
# tokenizer / parser for the Turtle subset
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r'"""(?:[^"\\]|\\.|"(?!""))*"""'  # triple-quoted string
    r'|"(?:[^"\\\n]|\\.)*"'  # quoted string
    r"|<[^>]*>"  # IRI
    r"|\^\^"  # datatype suffix marker
    r"|@[A-Za-z][A-Za-z0-9-]*"  # @prefix / @base / langtag
    r"|[\[\]();,]"  # punctuation
    r"|[^\s\[\]();,]+"  # prefixed names, numbers, keywords, '.'
)

_COMMENT_RE = re.compile(r'#[^\n]*')


def _strip_comments(text: str) -> str:
    """Remove # comments outside of string literals."""
    out = []
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if ch == '"':
            m = _TOKEN_RE.match(text, i)
            if m:
                out.append(m.group(0))
                i = m.end()
                continue
        if ch == "<":
            j = text.find(">", i)
            if j != -1:
                out.append(text[i : j + 1])
                i = j + 1
                continue
        if ch == "#":
            j = text.find("\n", i)
            i = n if j == -1 else j
            continue
        out.append(ch)
        i += 1
    return "".join(out)


def _tokenize(text: str) -> list[str]:
    toks = []
    for m in _TOKEN_RE.finditer(_strip_comments(text)):
        t = m.group(0)
        # split a trailing statement '.' off prefixed-name tokens
        # (written 'ex:Person.'), but keep decimal numbers intact
        while (
            t.endswith(".")
            and t != "."
            and not re.fullmatch(r"[+-]?\d+\.\d*", t)
        ):
            toks.append(t[:-1])
            t = "."
            break
        toks.append(t)
    return [t for t in toks if t]


@dataclass
class Literal:
    value: str
    datatype: Optional[str] = None  # expanded datatype IRI
    lang: Optional[str] = None


@dataclass
class Blank:
    """Anonymous blank node: list of (predicate, [objects])."""

    props: list = field(default_factory=list)

    def objects(self, pred: str) -> list:
        return [o for p, objs in self.props for o in objs if p == pred]

    def first(self, pred: str):
        objs = self.objects(pred)
        return objs[0] if objs else None


Node = Union[str, Literal, Blank, list]


class _Parser:
    def __init__(self, tokens: list[str]):
        self.toks = tokens
        self.i = 0
        self.prefixes: dict[str, str] = {}

    def _peek(self) -> Optional[str]:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def _next(self) -> str:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expand(self, tok: str) -> str:
        if tok.startswith("<") and tok.endswith(">"):
            return tok[1:-1]
        if tok == "a":
            return "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
        if ":" in tok:
            pfx, local = tok.split(":", 1)
            base = self.prefixes.get(pfx)
            if base is not None:
                return base + local
        return tok

    def parse(self) -> list[tuple[Optional[str], list]]:
        """Returns [(subject_iri_or_None, [(pred_iri, [objects])])].

        A BLANK-NODE subject (``[] a ...`` / ``[ ... ] .`` — the form
        rdflib uses for e.g. validation-report nodes) yields subject
        None with the merged property list."""
        statements = []
        while self._peek() is not None:
            t = self._peek()
            if t in ("@prefix", "@base", "PREFIX", "BASE"):
                self._parse_prefix()
                continue
            if t == "[":
                self._next()
                props = self._parse_predicate_object_list(stop_at_dot=False)
                if self._peek() == "]":
                    self._next()
                props += self._parse_predicate_object_list(stop_at_dot=True)
                if self._peek() == ".":
                    self._next()
                statements.append((None, props))
                continue
            subj = self.expand(self._next())
            props = self._parse_predicate_object_list(stop_at_dot=True)
            if self._peek() == ".":
                self._next()
            statements.append((subj, props))
        return statements

    def _parse_prefix(self) -> None:
        kw = self._next()
        if kw in ("@base", "BASE"):
            self._next()  # IRI, unused
        else:
            pfx = self._next().rstrip(":")
            iri = self._next()
            self.prefixes[pfx] = iri[1:-1] if iri.startswith("<") else iri
        if self._peek() == ".":
            self._next()

    def _parse_predicate_object_list(self, stop_at_dot: bool) -> list:
        props = []
        while True:
            t = self._peek()
            if t is None or t == "]" or (stop_at_dot and t == "."):
                return props
            pred = self.expand(self._next())
            objs = [self._parse_object()]
            while self._peek() == ",":
                self._next()
                objs.append(self._parse_object())
            props.append((pred, objs))
            if self._peek() == ";":
                self._next()
                # tolerate trailing ';' before ']' or '.'
                continue
            # no separator: list ends at ']' / '.'

    def _parse_object(self) -> Node:
        t = self._next()
        if t == "[":
            props = self._parse_predicate_object_list(stop_at_dot=False)
            if self._peek() == "]":
                self._next()
            return Blank(props)
        if t == "(":
            items = []
            while self._peek() not in (")", None):
                items.append(self._parse_object())
            if self._peek() == ")":
                self._next()
            return items
        if t.startswith('"'):
            value = t[3:-3] if t.startswith('"""') else t[1:-1]
            # single-pass unescape: sequential .replace() corrupts
            # escaped backslashes ("a\\nb" — backslash, n — must stay
            # a literal backslash + n, not become a newline)
            value = re.sub(
                r"\\(.)",
                lambda m: {"n": "\n", "t": "\t", "r": "\r"}.get(
                    m.group(1), m.group(1)
                ),
                value,
            )
            datatype = lang = None
            if self._peek() == "^^":
                self._next()
                datatype = self.expand(self._next())
            elif (nxt := self._peek()) and nxt.startswith("@") and nxt not in (
                "@prefix",
                "@base",
            ):
                lang = self._next()[1:]
            return Literal(value, datatype, lang)
        if re.fullmatch(r"[+-]?\d+", t):
            return Literal(t, "http://www.w3.org/2001/XMLSchema#integer")
        if re.fullmatch(r"[+-]?\d*\.\d+(?:[eE][+-]?\d+)?", t):
            return Literal(t, "http://www.w3.org/2001/XMLSchema#decimal")
        if t in ("true", "false"):
            return Literal(t, "http://www.w3.org/2001/XMLSchema#boolean")
        return self.expand(t)


# ---------------------------------------------------------------------------
# SHACL subset -> Shape mapping
# ---------------------------------------------------------------------------

SH = "http://www.w3.org/ns/shacl#"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDFS_COMMENT = "http://www.w3.org/2000/01/rdf-schema#comment"
RDFS_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"
RDFS_SUBCLASS = "http://www.w3.org/2000/01/rdf-schema#subClassOf"
RDFS_SUBPROP = "http://www.w3.org/2000/01/rdf-schema#subPropertyOf"
RDFS_DOMAIN = "http://www.w3.org/2000/01/rdf-schema#domain"


def _down_closure(statements, pred_uri: str) -> dict:
    """node -> all (transitive) descendants under `pred_uri`
    (rdfs:subClassOf / rdfs:subPropertyOf), cycle-safe DFS."""
    parents: dict[str, set] = {}
    for subj, props in statements:
        if subj is None:  # blank-node subject: nothing to subsume
            continue
        for pred, objs in props:
            if pred == pred_uri:
                for o in objs:
                    if isinstance(o, str):
                        parents.setdefault(subj, set()).add(o)
    down: dict[str, set] = {}
    for child, sups in parents.items():
        for sup in sups:
            down.setdefault(sup, set()).add(child)
    closure: dict[str, set] = {}

    def walk(c, seen):
        for ch in down.get(c, ()):
            if ch not in seen:
                seen.add(ch)
                walk(ch, seen)
        return seen

    for c in down:
        closure[c] = walk(c, set())
    return closure


def _domain_index(statements) -> dict:
    """predicate -> set of rdfs:domain classes (OWL-RL rule prp-dom /
    RDFS rule rdfs2: a triple (s P o) with domain(P)=C entails
    s rdf:type C — in tabular form, a non-NULL column mapped from P
    types the row)."""
    domains: dict[str, set] = {}
    for subj, props in statements:
        if subj is None:
            continue
        for pred, objs in props:
            if pred == RDFS_DOMAIN:
                for o in objs:
                    if isinstance(o, str):
                        domains.setdefault(subj, set()).add(o)
    return domains


def _subclass_closure(statements) -> dict:
    """class -> all (transitive) subclasses, from rdfs:subClassOf
    triples in the same document (or a merged ontology document).
    Reference parity: pyshacl's inference="rdfs" pre-materializes
    subclass entailment so sh:targetClass also targets instances of
    subclasses (main.py --inference; here scoped to the one entailment
    rule that affects tabular target selection)."""
    return _down_closure(statements, RDFS_SUBCLASS)

_XSD_TO_SPARK = {
    "integer": "int",
    "int": "int",
    "long": "bigint",
    "nonNegativeInteger": "int",
    "decimal": "double",
    "double": "double",
    "float": "double",
    "boolean": "boolean",
    "date": "date",
    "dateTime": "timestamp",
    "string": "string",
    "langString": "string",  # rdf:langString: plain string column
    "anyURI": "string",
}


def local_name(uri: str) -> str:
    """Fragment / last path segment of a URI (ex:hasAge -> hasAge)."""
    for sep in ("#", "/", ":"):
        if sep in uri:
            uri = uri.rsplit(sep, 1)[1]
            break
    return uri


def _py_value(obj: Node):
    if isinstance(obj, Literal):
        dt = local_name(obj.datatype) if obj.datatype else None
        if dt in ("integer", "int", "long", "nonNegativeInteger"):
            return int(obj.value)
        if dt in ("decimal", "double", "float"):
            return float(obj.value)
        if dt == "boolean":
            return obj.value == "true"
        return obj.value
    return obj


def _cell_value(obj: Node, column_map: dict):
    """Value of a constraint object as it appears in a table CELL:
    literals keep their typed value; IRI objects follow the module's
    tabular convention (targetClass, paths) and project to the mapped
    or local name — 'sh:hasValue ex:Male' must compare against 'Male',
    not 'http://example.org/Male'."""
    if isinstance(obj, Literal):
        return _py_value(obj)
    if isinstance(obj, str):
        return _map_name(obj, column_map)
    return obj


@dataclass
class TtlImport:
    shapes: list
    skipped: list  # [(shape_id, predicate, reason)]


def _child_constraint(
    obj, col: str, column_map: dict, skipped: list, shape_id: str,
    pred: str,
):
    """One child of a logical list: a blank shape block, compiled over
    its own sh:path if present else the enclosing column. Multiple
    predicates in one child AND together (SHACL: a shape conforms when
    ALL its constraints hold)."""
    if not isinstance(obj, Blank):
        skipped.append((shape_id, pred, "non-blank logical child"))
        return None
    child_path = obj.first(SH + "path")
    if isinstance(child_path, str):
        child_col = _map_name(child_path, column_map)
    else:
        child_col = col
    cs = [
        c
        for c in _block_constraints(obj, child_col, column_map, skipped, shape_id)
        if isinstance(c, S.RowConstraint)
    ]
    if not cs:
        return None
    return cs[0] if len(cs) == 1 else S.And(tuple(cs), column=child_col)


def _map_name(uri: str, column_map: dict) -> str:
    return column_map.get(uri, column_map.get(local_name(uri), local_name(uri)))


def _property_constraints(
    block: Blank,
    column_map: dict,
    skipped: list,
    shape_id: str,
    path_dims: Optional[dict] = None,
) -> list:
    path = block.first(SH + "path")
    if isinstance(path, list):
        # SEQUENCE path `sh:path (ex:fk ex:attr)` (SHACL property
        # paths): importable as PathValue when the caller maps the FK
        # step to a registered dim via path_dims={fk: (dim, ref_col)}.
        # The value constraints in the block then apply to the dim
        # attribute through the broadcast join (shapes.PathValue).
        if len(path) == 2 and all(isinstance(p, str) for p in path):
            fk = _map_name(path[0], column_map)
            mapping = (path_dims or {}).get(fk) or (path_dims or {}).get(
                local_name(path[0])
            )
            if mapping:
                dim_name, ref_col = mapping
                attr = _map_name(path[1], column_map)
                inner = _block_constraints(
                    block, attr, column_map, skipped, shape_id
                )
                out = []
                for rc in inner:
                    # ONLY single-column value tests over the dim
                    # attribute are wrappable. NotNull (sh:minCount)
                    # would INVERT semantics (a NULL/dangling FK is a
                    # missing value node = violation, but the PathValue
                    # join passes it vacuously); pair predicates and
                    # logical combinators may reference focus-row
                    # columns absent from the join projection.
                    if isinstance(rc, (S.ValueConstraint, S.Datatype)):
                        out.append(
                            S.PathValue((fk,), dim_name, (ref_col,), rc)
                        )
                    else:
                        skipped.append(
                            (shape_id, SH + "path",
                             f"sequence path cannot wrap {type(rc).__name__}"
                             " (only single-column value tests on the dim"
                             " attribute)")
                        )
                if not out:
                    skipped.append(
                        (shape_id, SH + "path",
                         "sequence path produced no importable constraints")
                    )
                return out
        skipped.append(
            (shape_id, SH + "path",
             "sequence path not mapped (pass path_dims={fk: (dim, ref_col)}) "
             "or unsupported form")
        )
        return []
    if not isinstance(path, str):
        skipped.append((shape_id, SH + "path", "missing or non-IRI sh:path"))
        return []
    col = _map_name(path, column_map)
    return _block_constraints(block, col, column_map, skipped, shape_id)


def _block_constraints(
    block: Blank, col: str, column_map: dict, skipped: list, shape_id: str
) -> list:
    deact = block.first(SH + "deactivated")
    if isinstance(deact, Literal) and _py_value(deact) is True:
        # sh:deactivated on a property shape (or logical child): the
        # whole block produces no validation results (SHACL core)
        skipped.append((shape_id, SH + "deactivated", "property shape deactivated"))
        return []
    out: list = []
    pairs = {  # property-pair predicates -> constraint class
        SH + "equals": S.Equals,
        SH + "disjoint": S.Disjoint,
        SH + "lessThan": S.LessThan,
        SH + "lessThanOrEquals": S.LessThanOrEquals,
    }
    logical = {  # list-valued logical predicates -> constraint class
        SH + "or": S.Or,
        SH + "and": S.And,
        SH + "xone": S.Xone,
    }
    flags = None
    fl = block.first(SH + "flags")
    if isinstance(fl, Literal):
        flags = fl.value
    for pred, objs in block.props:
        for obj in objs:
            if pred == SH + "path" or pred == SH + "flags":
                continue
            if pred in logical and isinstance(obj, list):
                children = tuple(
                    c
                    for c in (
                        _child_constraint(o, col, column_map, skipped, shape_id, pred)
                        for o in obj
                    )
                    if c is not None
                )
                if children:
                    cls = logical[pred]
                    if cls is S.Xone:
                        # SHACL parity: zero value nodes conform
                        out.append(cls(children, column=col, vacuous_on_null=True))
                    else:
                        out.append(cls(children, column=col))
                else:
                    skipped.append((shape_id, pred, "no importable children"))
                continue
            if pred == SH + "not":
                inner = _child_constraint(
                    obj, col, column_map, skipped, shape_id, SH + "not"
                )
                if inner is not None:
                    # SHACL parity: with no value nodes sh:not is
                    # vacuously satisfied (the inner vacuous pass must
                    # not invert into a violation)
                    out.append(S.Not(inner, column=col, vacuous_on_null=True))
                else:
                    skipped.append((shape_id, pred, "no importable inner shape"))
                continue
            if pred == SH + "minCount":
                n_min = int(_py_value(obj))
                if n_min >= 1:
                    out.append(S.NotNull(col))
                if n_min >= 2:
                    # a flat column holds <= 1 value per row, so
                    # minCount N>=2 can never be satisfied; pyshacl
                    # would flag every focus node. Import the
                    # satisfiable part (presence) and REPORT the
                    # weakening — silently narrowing to NotNull hid an
                    # under-validation (use ArrayMinCount on an array
                    # column for true multi-valued cardinality).
                    skipped.append(
                        (
                            shape_id,
                            pred,
                            f"minCount {n_min} > 1 unsatisfiable on a flat "
                            "column; weakened to NotNull (map the property "
                            "to an array column + ArrayMinCount for "
                            "multi-valued cardinality)",
                        )
                    )
            elif pred == SH + "maxCount":
                # a flat column holds <= 1 value per row: vacuous
                skipped.append((shape_id, pred, "maxCount vacuous on flat column"))
            elif pred == SH + "uniqueLang":
                skipped.append(
                    (shape_id, pred, "uniqueLang vacuous on flat column")
                )
            elif pred in (SH + "datatype", SH + "dataType"):
                xsd = local_name(obj if isinstance(obj, str) else str(obj))
                spark_dt = _XSD_TO_SPARK.get(xsd)
                if spark_dt:
                    # required=False: presence is minCount's job in SHACL
                    out.append(S.Datatype(col, spark_dt, required=False))
                else:
                    skipped.append((shape_id, pred, f"unmapped xsd type {xsd}"))
            elif pred == SH + "minInclusive":
                out.append(S.MinInclusive(col, _py_value(obj)))
            elif pred == SH + "maxInclusive":
                out.append(S.MaxInclusive(col, _py_value(obj)))
            elif pred == SH + "minExclusive":
                out.append(S.MinExclusive(col, _py_value(obj)))
            elif pred == SH + "maxExclusive":
                out.append(S.MaxExclusive(col, _py_value(obj)))
            elif pred == SH + "pattern":
                out.append(S.Pattern(col, _py_value(obj), flags=flags))
            elif pred == SH + "minLength":
                out.append(S.MinLength(col, int(_py_value(obj))))
            elif pred == SH + "maxLength":
                out.append(S.MaxLength(col, int(_py_value(obj))))
            elif pred == SH + "in" and isinstance(obj, list):
                out.append(
                    S.InSet(col, tuple(_cell_value(o, column_map) for o in obj))
                )
            elif pred == SH + "hasValue":
                out.append(S.HasValue(col, _cell_value(obj, column_map)))
            elif pred == SH + "languageIn" and isinstance(obj, list):
                out.append(
                    S.InSet(
                        col,
                        tuple(_py_value(o) for o in obj),
                        language_in=True,
                    )
                )
            elif pred == SH + "nodeKind":
                out.append(S.NodeKind(col, kind=local_name(str(obj))))
            elif pred in pairs:
                other_uri = obj if isinstance(obj, str) else str(obj)
                other = _map_name(other_uri, column_map)
                out.append(pairs[pred](col, other))
            elif pred in (SH + "message", SH + "name", SH + "description",
                          RDFS_COMMENT, SH + "severity", SH + "deactivated"):
                pass  # metadata handled at shape/block level
            else:
                skipped.append((shape_id, pred, "unrecognized predicate"))
    return out


def import_ttl(
    text: str,
    target_map: Optional[dict] = None,
    column_map: Optional[dict] = None,
    type_column: str = "rdf_type",
    path_dims: Optional[dict] = None,
    inference: str = "none",
    ontology_text: Optional[str] = None,
) -> TtlImport:
    """Parse a Turtle shapes document into engine Shapes + skip report.

    inference="rdfs" (reference main.py --inference): sh:targetClass X
    also targets instances of X's rdfs:subClassOf descendants — the one
    RDFS entailment that affects tabular target selection. Subclass
    triples are read from the shapes document itself and, when given,
    from `ontology_text` (a separate ontology .ttl).

    inference="owlrl" adds the remaining OWL-RL/RDFS entailments with a
    tabular-target residue (the reference forwards --inference straight
    to pyshacl, extended_shacl_validator.py:36-39):
    - rdfs:subPropertyOf (rules rdfs5/7 / OWL-RL prp-spo1):
      sh:targetSubjectsOf/ObjectsOf P also targets the mapped row sets
      of every subproperty of P — their target_map filters are OR-ed.
    - rdfs:domain (rule rdfs2 / prp-dom): sh:targetClass C also targets
      rows with a non-NULL column mapped from any predicate whose
      domain is C or a subclass of C (a P-triple types its subject).
    rdfs:range (rdfs3 / prp-rng) types OBJECT nodes; in the tabular
    projection objects are attribute VALUES, not focus rows, so range
    has no target residue here (see COVERAGE.md)."""
    target_map = dict(target_map or {})
    column_map = dict(column_map or {})
    statements = _Parser(_tokenize(text)).parse()
    subclasses: dict = {}
    subprops: dict = {}
    domains: dict = {}
    if inference in ("rdfs", "owlrl"):
        onto_statements = list(statements)
        if ontology_text:
            onto_statements += _Parser(_tokenize(ontology_text)).parse()
        subclasses = _subclass_closure(onto_statements)
        if inference == "owlrl":
            subprops = _down_closure(onto_statements, RDFS_SUBPROP)
            domains = _domain_index(onto_statements)
    elif inference != "none":
        raise ValueError(
            f"unsupported inference {inference!r} (none, rdfs, or owlrl)"
        )
    # predicates used as sh:path anywhere in this document: these are
    # materialized columns of the tabular projection by construction,
    # so owlrl domain-derived typing may reference them without an
    # explicit column_map entry
    doc_path_preds: set = set()
    if domains:

        def _collect_paths(props):
            for pred, objs in props:
                for o in objs:
                    if isinstance(o, Blank):
                        _collect_paths(o.props)
                    elif pred == SH + "path" and isinstance(o, str):
                        doc_path_preds.add(o)

        for _subj, _props in statements:
            _collect_paths(_props)
    shapes = []
    skipped: list = []
    for i, (subj, props) in enumerate(statements):
        if subj is None:
            subj = f"_:blank{i}"  # stable synthetic id per document order
        blank = Blank(props)
        types = [str(t) for t in blank.objects(RDF_TYPE)]
        is_shape = (
            any(t in (SH + "NodeShape", SH + "PropertyShape", SH + "Shape") for t in types)
            or blank.first(SH + "property") is not None
            or blank.first(SH + "path") is not None
        )
        if not is_shape:
            continue
        deact = blank.first(SH + "deactivated")
        if isinstance(deact, Literal) and _py_value(deact) is True:
            # sh:deactivated true: the shape exists but must not be
            # validated (SHACL core) — recorded, not compiled
            skipped.append((subj, SH + "deactivated", "shape deactivated"))
            continue
        # target
        target = None
        tc = blank.first(SH + "targetClass")
        if isinstance(tc, str):
            mapped = target_map.get(tc, target_map.get(local_name(tc)))
            if mapped:
                target = mapped
            else:
                classes = [local_name(tc)] + sorted(
                    local_name(c) for c in subclasses.get(tc, ())
                )
                if len(classes) == 1:
                    target = f"{type_column} = '{classes[0]}'"
                else:
                    quoted = ", ".join(f"'{c}'" for c in classes)
                    target = f"{type_column} IN ({quoted})"
            if domains:
                # owlrl domain-derived typing (rdfs2/prp-dom): a
                # non-NULL column mapped from a predicate whose
                # rdfs:domain is tc (or a subclass — instances of a
                # subclass are instances of tc) types the row. The
                # domain predicate's rdfs:subPropertyOf descendants
                # type it too (prp-spo1 composed with prp-dom: a
                # Q-triple with Q <= P entails the P-triple that
                # carries P's domain). Applied whether or not the
                # class has an explicit target_map row filter — the
                # mapping says where rdf:type lives, it does not
                # retract the entailment (same rule as the
                # targetSubjectsOf OR-union below). Only predicates
                # PROVEN to be materialized columns participate — an
                # explicit column_map entry, or use as a sh:path in
                # this document (the projection materializes its own
                # paths); a real ontology routinely declares domains
                # for predicates outside the projected schema, and
                # OR-ing a nonexistent column would crash validate().
                # Unmaterialized domain predicates land in the skip
                # report instead.
                tc_and_subs = {tc} | set(subclasses.get(tc, ()))
                preds = set()
                for p, cs in domains.items():
                    if cs & tc_and_subs:
                        preds.add(p)
                        preds.update(subprops.get(p, ()))
                cols = set()
                for p in sorted(preds):
                    m = column_map.get(p, column_map.get(local_name(p)))
                    if m:
                        cols.add(m)
                    elif p in doc_path_preds:
                        cols.add(local_name(p))
                    else:
                        skipped.append(
                            (subj, p,
                             "owlrl domain predicate not a materialized "
                             "column (no column_map entry / sh:path use) "
                             "— not OR-ed into target")
                        )
                for col in sorted(cols):
                    target = f"({target}) OR ({col} IS NOT NULL)"
        unmapped_target = None
        # SHACL focus nodes are the UNION of ALL target declarations:
        # a second target kind present alongside targetClass must be
        # OR-ed into the filter, not silently dropped (silent drop =
        # under-validation reported as conformance). An unmappable
        # ADDITIONAL kind is skip-reported; only a shape with no
        # mappable target at all is skipped outright.
        extra_tc = [t for t in blank.objects(SH + "targetClass")][1:]
        if extra_tc:
            skipped.append(
                (subj, SH + "targetClass",
                 "additional sh:targetClass values not imported — only "
                 "the first is; focus-set union incomplete")
            )
        for pred in ("targetNode", "targetSubjectsOf", "targetObjectsOf"):
            tn = blank.first(SH + pred)
            if tn is None:
                continue
            if True:
                parent = target_map.get(
                    str(tn), target_map.get(local_name(str(tn)))
                )
                if parent is None:
                    # the PARENT property itself must be mapped —
                    # OR-ing only mapped subproperties would silently
                    # validate a subset of the entailed target and
                    # report full coverage
                    if target is None:
                        unmapped_target = SH + pred
                    else:
                        skipped.append(
                            (subj, SH + pred,
                             "additional target kind not mapped (pass "
                             "target_map=) — NOT OR-ed into the focus "
                             "set; union incomplete")
                        )
                else:
                    filters = [parent]
                    if pred != "targetNode" and subprops:
                        # owlrl subPropertyOf targeting (rdfs5/7/
                        # prp-spo1): a Q-triple with Q <= P entails a
                        # P-triple, so targetSubjectsOf/ObjectsOf P
                        # also covers every subproperty's mapped row
                        # set, OR-ed onto the parent's filter
                        for p in sorted(subprops.get(str(tn), ())):
                            m = target_map.get(
                                p, target_map.get(local_name(p))
                            )
                            if m:
                                if m not in filters:
                                    filters.append(m)
                            else:
                                # coverage loss must be visible: an
                                # unmapped subproperty's entailed rows
                                # cannot be targeted
                                skipped.append(
                                    (subj, p,
                                     "owlrl subproperty not target-"
                                     "mapped — its rows not OR-ed "
                                     "into the target")
                                )
                    kind_filter = (
                        filters[0]
                        if len(filters) == 1
                        else " OR ".join(f"({f})" for f in filters)
                    )
                    target = (
                        kind_filter
                        if target is None
                        else f"({target}) OR ({kind_filter})"
                    )
        if unmapped_target and target is None:
            # a targeted shape without a row mapping must NOT silently
            # validate every row — skip it and say so
            skipped.append(
                (subj, unmapped_target,
                 "target kind not mapped (pass target_map=) — shape skipped")
            )
            continue
        # metadata
        message = None
        msg = blank.first(SH + "message")
        if isinstance(msg, Literal):
            message = msg.value
        severity = "Violation"
        sev = blank.first(SH + "severity")
        if isinstance(sev, str):
            severity = local_name(sev)
        description = None
        cmt = blank.first(RDFS_COMMENT) or blank.first(SH + "description")
        if isinstance(cmt, Literal):
            description = cmt.value
        name = None
        nm = blank.first(SH + "name") or blank.first(RDFS_LABEL)
        if isinstance(nm, Literal):
            name = nm.value

        constraints: list = []
        for obj in blank.objects(SH + "property"):
            if isinstance(obj, Blank):
                constraints.extend(
                    _property_constraints(
                        obj, column_map, skipped, subj, path_dims
                    )
                )
            else:
                skipped.append((subj, SH + "property", "non-blank property shape"))
        if blank.first(SH + "path") is not None:
            # standalone PropertyShape: the statement itself is the block
            constraints.extend(
                _property_constraints(
                    blank, column_map, skipped, subj, path_dims
                )
            )
        for pred, objs in props:
            if pred == SH + "sparql":
                skipped.append((subj, pred, "SPARQL constraint not imported"))
        if not constraints:
            skipped.append((subj, "", "shape produced no constraints"))
            continue
        shapes.append(
            S.Shape(
                shape_id=subj,
                constraints=tuple(constraints),
                target=target,
                severity=severity,
                message=message,
                name=name or local_name(subj),
                description=description,
            )
        )
    return TtlImport(shapes=shapes, skipped=skipped)


def shapes_from_ttl(
    text: str,
    target_map: Optional[dict] = None,
    column_map: Optional[dict] = None,
    type_column: str = "rdf_type",
    path_dims: Optional[dict] = None,
    inference: str = "none",
    ontology_text: Optional[str] = None,
) -> list:
    return import_ttl(
        text, target_map, column_map, type_column, path_dims,
        inference, ontology_text,
    ).shapes
