"""RDF terms and statements.

Reference data model: ``SerdNode { buf, n_bytes, n_chars, flags,
type }`` with ``SerdType ∈ {SERD_NOTHING, SERD_LITERAL, SERD_URI,
SERD_CURIE, SERD_BLANK}`` and the 7-field statement callback
``SerdStatementSink(flags, graph, subject, predicate, object,
object_datatype, object_lang)`` (ref: serd/serd.h#SerdNode,
#SerdStatementSink — see SURVEY.md §1.1).

Differences by design (Spark-first):

- CURIEs never escape this layer: they are expanded to absolute IRIs
  at parse time (``SerdEnv``-equivalent lives in
  :mod:`serd_spark.rdf.env`), so downstream Spark columns only ever
  hold kinds {IRI, LITERAL, BLANK}.
- Statements are plain tuples (slots dataclass) — one DataFrame row
  each — instead of a callback stream.
"""

from __future__ import annotations

from typing import NamedTuple

# Term kinds — small ints so they pack into a ByteType Spark column.
IRI = 0
LITERAL = 1
BLANK = 2

KIND_NAMES = {IRI: "iri", LITERAL: "literal", BLANK: "blank"}

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XSD_NS = "http://www.w3.org/2001/XMLSchema#"

RDF_TYPE = RDF_NS + "type"
RDF_FIRST = RDF_NS + "first"
RDF_REST = RDF_NS + "rest"
RDF_NIL = RDF_NS + "nil"
XSD_INTEGER = XSD_NS + "integer"
XSD_DECIMAL = XSD_NS + "decimal"
XSD_DOUBLE = XSD_NS + "double"
XSD_BOOLEAN = XSD_NS + "boolean"
XSD_STRING = XSD_NS + "string"
RDF_LANGSTRING = RDF_NS + "langString"


class Term(NamedTuple):
    """One RDF term: an IRI, a literal, or a blank node.

    ``value`` is the lexical form (IRI string, literal text, or blank
    label without the ``_:`` prefix). ``datatype``/``lang`` are only
    meaningful for literals; exactly like the reference, values are
    *not* interpreted — a literal stays a lexical form + datatype IRI
    + language tag (ref: serd/serd.h literal semantics, SURVEY.md
    §1.2).

    NamedTuple rather than a frozen dataclass: terms are constructed
    tens of millions of times per task in the parse hot path, and
    frozen-dataclass ``__init__`` (object.__setattr__ per field) is
    ~2.4× slower; both are immutable and hashable.
    """

    kind: int
    value: str
    datatype: str = ""
    lang: str = ""

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        if self.kind == IRI:
            return f"<{self.value}>"
        if self.kind == BLANK:
            return f"_:{self.value}"
        out = f'"{self.value}"'
        if self.lang:
            out += f"@{self.lang}"
        elif self.datatype:
            out += f"^^<{self.datatype}>"
        return out


def iri(value: str) -> Term:
    return Term(IRI, value)


def blank(label: str) -> Term:
    return Term(BLANK, label)


def literal(value: str, datatype: str = "", lang: str = "") -> Term:
    return Term(LITERAL, value, datatype, lang)


class Statement(NamedTuple):
    """One RDF statement (triple or quad; ``graph`` empty = default
    graph). Replaces the reference's statement callback tuple."""

    subject: Term
    predicate: Term
    object: Term
    graph: Term | None = None

    def as_row(self) -> tuple:
        """Flatten to the ``triples`` table row layout (SURVEY.md
        §1.4): (g, s, s_kind, p, o, o_kind, o_dt, o_lang)."""
        g = self.graph.value if self.graph is not None else ""
        o = self.object
        return (
            g,
            self.subject.value,
            self.subject.kind,
            self.predicate.value,
            o.value,
            o.kind,
            o.datatype,
            o.lang,
        )


class ParseError(Exception):
    """Syntax error with position — equivalent of the reference's
    ``SerdError{status, line, col, fmt}`` delivered to the error sink
    (ref: serd/serd.h#SerdError)."""

    def __init__(self, message: str, line: int, col: int):
        super().__init__(f"{line}:{col}: {message}")
        self.message = message
        self.line = line
        self.col = col
