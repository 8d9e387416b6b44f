"""SHACL-lite validation over the triple table.

The W3C Shapes Constraint Language core subset that covers the
overwhelming majority of real-world shapes files: node shapes with
``sh:targetClass``, property shapes (``sh:property``/``sh:path``,
IRI paths only) carrying ``sh:minCount`` / ``sh:maxCount`` /
``sh:datatype`` / ``sh:nodeKind`` / ``sh:class`` / ``sh:in`` /
``sh:pattern`` / ``sh:minLength`` / ``sh:maxLength``.  The shapes
graph is RDF — parsed with this repo's OWN Turtle parser
(dogfooding), walked driver-side (a shapes file is KBs), and
compiled into one declarative Spark plan per constraint.

Execution shape at 100 TB:

- focus-node sets are a FILTER on the type triples (predicate +
  class constants pushed to the scan), never a full-table pass per
  shape;
- value sets are one equi-join per property shape on the subject
  column — the join the subject-hash bucketing exists for;
- ``minCount``/``maxCount`` are a per-focus hash aggregate with
  map-side combine (counts, not rows, cross the shuffle);
- ``sh:class`` is a left-anti join against the class's type-triple
  set; every other value constraint is row-local whole-stage
  codegen (no Python anywhere);
- the shapes themselves are driver constants folded into the plan —
  nothing is broadcast because nothing needs to move.

``sh:pattern`` regexes must stay in the Java∩RE2 subset (the repo's
cross-engine rule) — validation rejects lookarounds/backrefs loudly
rather than producing engine-dependent reports.
"""

from __future__ import annotations

import re
from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from serd_spark.rdf.model import IRI, LITERAL, RDF_NS, XSD_NS, Statement

SH = "http://www.w3.org/ns/shacl#"
RDF_TYPE = RDF_NS + "type"

# Java regex constructs RE2 (the DuckDB oracle engine) cannot run —
# reject at shape-compile time, not at report-diff time
_NON_RE2 = re.compile(r"\(\?[<=!]|\\[0-9]")

REPORT_SCHEMA = (
    "focus string, shape string, path string, "
    "constraint string, value string"
)


class PropertyShape(NamedTuple):
    path: str
    min_count: int | None = None
    max_count: int | None = None
    datatype: str | None = None
    node_kind: str | None = None   # sh:IRI / sh:Literal / sh:BlankNode
    cls: str | None = None
    in_values: tuple[str, ...] | None = None
    pattern: str | None = None
    min_length: int | None = None
    max_length: int | None = None


class NodeShape(NamedTuple):
    iri: str
    target_class: str
    properties: tuple[PropertyShape, ...]


def parse_shapes(statements: list[Statement]) -> list[NodeShape]:
    """Walk a shapes graph (as parsed statements) into NodeShapes.
    Driver-side: shapes files are human-written KBs.  Unsupported
    SHACL vocabulary raises ``ValueError`` loudly — a silently
    ignored constraint is a report that lies."""
    by_s: dict[str, list[Statement]] = {}
    for st in statements:
        by_s.setdefault(st.subject.value, []).append(st)

    def _objs(s: str, p: str) -> list[Statement]:
        return [st for st in by_s.get(s, []) if st.predicate.value == p]

    def _one(s: str, p: str) -> Statement | None:
        got = _objs(s, p)
        if len(got) > 1:
            raise ValueError(f"shape {s}: multiple {p}")
        return got[0] if got else None

    def _rdf_list(head: str) -> list[str]:
        out: list[str] = []
        seen = set()
        while head != RDF_NS + "nil":
            if head in seen:
                raise ValueError("cyclic rdf:List in shapes graph")
            seen.add(head)
            first = _one(head, RDF_NS + "first")
            rest = _one(head, RDF_NS + "rest")
            if first is None or rest is None:
                raise ValueError("malformed rdf:List in shapes graph")
            out.append(first.object.value)
            head = rest.object.value
        return out

    shapes: list[NodeShape] = []
    node_shape_ids = [
        st.subject.value
        for st in statements
        if st.predicate.value == RDF_TYPE
        and st.object.value == SH + "NodeShape"
    ]
    for sid in sorted(set(node_shape_ids)):
        tc = _one(sid, SH + "targetClass")
        if tc is None:
            raise ValueError(f"shape {sid}: sh:targetClass required")
        props: list[PropertyShape] = []
        for pst in _objs(sid, SH + "property"):
            ps = pst.object.value
            path = _one(ps, SH + "path")
            if path is None or path.object.kind != IRI:
                raise ValueError(f"property shape {ps}: IRI sh:path required")
            known = {
                SH + "path", SH + "minCount", SH + "maxCount",
                SH + "datatype", SH + "nodeKind", SH + "class",
                SH + "in", SH + "pattern", SH + "minLength",
                SH + "maxLength",
            }
            for st in by_s.get(ps, []):
                if st.predicate.value not in known:
                    raise ValueError(
                        f"property shape {ps}: unsupported "
                        f"{st.predicate.value}"
                    )

            def _int(p: str) -> int | None:
                st = _one(ps, p)
                return int(st.object.value) if st else None

            def _iri(p: str) -> str | None:
                st = _one(ps, p)
                return st.object.value if st else None

            pattern = _one(ps, SH + "pattern")
            if pattern is not None and _NON_RE2.search(pattern.object.value):
                raise ValueError(
                    f"property shape {ps}: sh:pattern uses non-RE2 syntax"
                )
            in_st = _one(ps, SH + "in")
            props.append(
                PropertyShape(
                    path=path.object.value,
                    min_count=_int(SH + "minCount"),
                    max_count=_int(SH + "maxCount"),
                    datatype=_iri(SH + "datatype"),
                    node_kind=_iri(SH + "nodeKind"),
                    cls=_iri(SH + "class"),
                    in_values=tuple(_rdf_list(in_st.object.value))
                    if in_st
                    else None,
                    pattern=pattern.object.value if pattern else None,
                    min_length=_int(SH + "minLength"),
                    max_length=_int(SH + "maxLength"),
                )
            )
        shapes.append(
            NodeShape(iri=sid, target_class=tc.object.value,
                      properties=tuple(sorted(props, key=lambda p: p.path)))
        )
    return shapes


def parse_shapes_turtle(text: str, base_iri: str = "") -> list[NodeShape]:
    from serd_spark.rdf.turtle import parse_turtle

    stmts, errs = parse_turtle(text, base_iri)
    if errs:
        raise ValueError(f"shapes graph parse errors: {errs}")
    return parse_shapes(stmts)


def _value_violations(
    vals: DataFrame, shape: NodeShape, ps: PropertyShape
) -> list[DataFrame]:
    """Row-local constraint checks over the (focus, o, o_kind, o_dt,
    o_lang) value table — all codegen expressions."""
    out: list[DataFrame] = []

    def emit(cond, constraint: str) -> None:
        out.append(
            vals.filter(cond).select(
                F.col("focus"),
                F.lit(shape.iri).alias("shape"),
                F.lit(ps.path).alias("path"),
                F.lit(constraint).alias("constraint"),
                F.col("o").alias("value"),
            )
        )

    if ps.datatype is not None:
        ok = (F.col("o_kind") == LITERAL)
        if ps.datatype == XSD_NS + "string":
            # plain literals are xsd:string in RDF 1.1
            ok = ok & F.col("o_dt").isin("", XSD_NS + "string") & (
                F.col("o_lang") == ""
            )
        elif ps.datatype == RDF_NS + "langString":
            ok = ok & (F.col("o_lang") != "")
        else:
            ok = ok & (F.col("o_dt") == ps.datatype)
        emit(~ok, "datatype")
    if ps.node_kind is not None:
        want = {SH + "IRI": 0, SH + "Literal": 1, SH + "BlankNode": 2}.get(
            ps.node_kind
        )
        if want is None:
            raise ValueError(f"unsupported sh:nodeKind {ps.node_kind}")
        emit(F.col("o_kind") != want, "nodeKind")
    if ps.in_values is not None:
        emit(~F.col("o").isin(*ps.in_values), "in")
    if ps.pattern is not None:
        emit(
            (F.col("o_kind") != LITERAL)
            | ~F.col("o").rlike(ps.pattern),
            "pattern",
        )
    if ps.min_length is not None:
        emit(F.length("o") < ps.min_length, "minLength")
    if ps.max_length is not None:
        emit(F.length("o") > ps.max_length, "maxLength")
    return out


def validate(triples: DataFrame, shapes: list[NodeShape]) -> DataFrame:
    """→ violation report (focus, shape, path, constraint, value);
    conforming data produces zero rows.  ``value`` is '' for
    cardinality violations (they are about the set, not one value)."""
    t = triples.select("s", "p", "o", "o_kind", "o_dt", "o_lang")
    reports: list[DataFrame] = []
    for shape in shapes:
        focus = (
            t.filter(
                (F.col("p") == RDF_TYPE) & (F.col("o") == shape.target_class)
            )
            .select(F.col("s").alias("focus"))
            .distinct()
        )
        for ps in shape.properties:
            vals = focus.join(
                t.filter(F.col("p") == ps.path).select(
                    F.col("s").alias("focus"), "o", "o_kind", "o_dt", "o_lang"
                ),
                "focus",
            )
            reports.extend(_value_violations(vals, shape, ps))
            if ps.cls is not None:
                instances = (
                    t.filter(
                        (F.col("p") == RDF_TYPE) & (F.col("o") == ps.cls)
                    )
                    .select(F.col("s").alias("o"))
                    .distinct()
                )
                reports.append(
                    vals.filter(F.col("o_kind") != LITERAL)
                    .join(instances, "o", "left_anti")
                    .select(
                        "focus",
                        F.lit(shape.iri).alias("shape"),
                        F.lit(ps.path).alias("path"),
                        F.lit("class").alias("constraint"),
                        F.col("o").alias("value"),
                    )
                )
            if ps.min_count is not None or ps.max_count is not None:
                counts = focus.join(
                    vals.groupBy("focus").agg(
                        F.count(F.lit(1)).alias("_n")
                    ),
                    "focus",
                    "left",
                ).select(
                    "focus", F.coalesce("_n", F.lit(0)).alias("_n")
                )
                if ps.min_count is not None:
                    reports.append(
                        counts.filter(F.col("_n") < ps.min_count).select(
                            "focus",
                            F.lit(shape.iri).alias("shape"),
                            F.lit(ps.path).alias("path"),
                            F.lit("minCount").alias("constraint"),
                            F.lit("").alias("value"),
                        )
                    )
                if ps.max_count is not None:
                    reports.append(
                        counts.filter(F.col("_n") > ps.max_count).select(
                            "focus",
                            F.lit(shape.iri).alias("shape"),
                            F.lit(ps.path).alias("path"),
                            F.lit("maxCount").alias("constraint"),
                            F.lit("").alias("value"),
                        )
                    )
    if not reports:
        spark = triples.sparkSession
        return spark.createDataFrame([], REPORT_SCHEMA)
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out
