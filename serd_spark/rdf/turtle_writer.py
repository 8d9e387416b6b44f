"""Abbreviating Turtle / TriG writer — the Spark-side expression of
the reference's pretty writer (ref: src/writer.c context stack +
src/env.c#serd_env_qualify; SURVEY.md §2A op-12).

The reference abbreviates *while streaming*, driven by the reader's
anonymous/list statement flags. Our triples live in a table with no
flags, so abbreviation structure is *recomputed* per document from
the statement set itself (SURVEY.md §1.1 "recomputed by the
abbreviating writer"):

- same-subject grouping with ``;``, same-predicate grouping with
  ``,`` (order = first appearance, deterministic);
- ``a`` for rdf:type;
- CURIE re-qualification via the longest-namespace-match
  ``Env.qualify`` (≙ serd_env_qualify);
- inline anonymous blanks ``[ … ]`` for blank objects referenced
  exactly once and never used as a subject elsewhere than their own
  property block;
- collections ``( … )`` for well-formed rdf:first/rdf:rest/rdf:nil
  chains (≙ read_collection's inverse);
- numeric / boolean literal sugar when the lexical form is valid
  Turtle (integer / decimal / double / boolean — matching the
  reference's writer which only drops quotes when the datatype's
  grammar accepts the exact lexical form);
- long-string quoting (``\"\"\"``) when the value contains newlines
  (≙ SERD_HAS_NEWLINE content flag from serd_strlen).

Everything is deterministic: iteration order is document order of
first appearance, so the output is stable across runs/retries.
"""

from __future__ import annotations

import re

from serd_spark.rdf.env import Env
from serd_spark.rdf.model import (
    BLANK,
    IRI,
    LITERAL,
    RDF_FIRST,
    RDF_NIL,
    RDF_REST,
    RDF_TYPE,
    XSD_BOOLEAN,
    XSD_DECIMAL,
    XSD_DOUBLE,
    XSD_INTEGER,
    Statement,
    Term,
)
from serd_spark.rdf.ntriples import _escape_iri, _escape_literal

_INTEGER_RE = re.compile(r"[+-]?[0-9]+\Z")
_DECIMAL_RE = re.compile(r"[+-]?[0-9]*\.[0-9]+\Z")
_DOUBLE_RE = re.compile(
    r"[+-]?(?:[0-9]+\.[0-9]*|\.[0-9]+|[0-9]+)[eE][+-]?[0-9]+\Z"
)
# PN_LOCAL safe subset for qualification (conservative: avoid the
# escape machinery; fall back to <IRI> when the suffix needs escapes)
_SAFE_LOCAL = re.compile(r"(?:[A-Za-z_][A-Za-z0-9_.\-]*)?\Z")
_SAFE_PREFIX = re.compile(r"(?:[A-Za-z][A-Za-z0-9_.\-]*)?\Z")
# emitted-label safety: ASCII subset of BLANK_NODE_LABEL with no
# leading/trailing '.'
_SAFE_BLANK = re.compile(r"[A-Za-z0-9_](?:[A-Za-z0-9_.\-]*[A-Za-z0-9_\-])?\Z")


class TurtleWriter:
    def __init__(self, env: Env | None = None):
        self.env = env or Env()

    # ---------------------------------------------------------- terms

    def _qname(self, iri_str: str) -> str | None:
        q = self.env.qualify(iri_str)
        if q is None:
            return None
        prefix, local = q
        if not _SAFE_PREFIX.match(prefix) or not _SAFE_LOCAL.match(local):
            return None
        if local.endswith("."):
            return None
        return f"{prefix}:{local}"

    def _iri(self, value: str) -> str:
        return self._qname(value) or f"<{_escape_iri(value)}>"

    def _literal(self, t: Term) -> str:
        if not t.lang:
            if t.datatype == XSD_INTEGER and _INTEGER_RE.match(t.value):
                return t.value
            if t.datatype == XSD_DECIMAL and _DECIMAL_RE.match(t.value):
                return t.value
            if t.datatype == XSD_DOUBLE and _DOUBLE_RE.match(t.value):
                return t.value
            if t.datatype == XSD_BOOLEAN and t.value in ("true", "false"):
                return t.value
        if "\n" in t.value or "\r" in t.value:
            # long string: escape backslashes and EVERY quote — runs
            # of quotes otherwise form an early terminator (a bare
            # '"""' replace mishandles 4+ consecutive quotes)
            body = t.value.replace("\\", "\\\\").replace('"', '\\"')
            s = f'"""{body}"""'
        else:
            s = f'"{_escape_literal(t.value)}"'
        if t.lang:
            return f"{s}@{t.lang}"
        if t.datatype:
            return f"{s}^^{self._iri(t.datatype)}"
        return s

    # ------------------------------------------------------- document

    # nested [ … ] / ( … ) blocks recurse through Python frames; flat
    # blank chains from adversarial NT input would otherwise blow the
    # stack (the PARSER caps nesting at 128 for the same reason) —
    # beyond this depth the node is referenced by label and emitted as
    # its own top-level block by the catch-all pass
    MAX_INLINE_DEPTH = 64

    @staticmethod
    def relabel_unsafe(statements: list[Statement]) -> list[Statement]:
        """Emitted blank labels must be valid BLANK_NODE_LABELs —
        parser-generated anon labels contain '=' (deliberately not a
        PN char); relabel anything unsafe (in subject, object AND
        graph position) to a fresh gN label."""
        relabel: dict[str, str] = {}
        existing = set()
        for st in statements:
            for t in (st.subject, st.object, st.graph):
                if t is not None and t.kind == BLANK:
                    existing.add(t.value)
        n = 0
        for label in sorted(existing):
            if not _SAFE_BLANK.match(label):
                while True:
                    n += 1
                    fresh = f"g{n}"
                    if fresh not in existing:
                        break
                relabel[label] = fresh
        if not relabel:
            return statements

        def fix(t: Term | None) -> Term | None:
            if t is not None and t.kind == BLANK and t.value in relabel:
                return Term(BLANK, relabel[t.value])
            return t

        return [
            Statement(
                fix(st.subject), st.predicate, fix(st.object), fix(st.graph)
            )
            for st in statements
        ]

    def write(
        self, statements: list[Statement], emit_prefixes: bool = True
    ) -> str:
        """Serialize one document's statements (single graph) as
        abbreviated Turtle."""
        statements = self.relabel_unsafe(statements)
        self._depth = 0

        by_subject: dict[tuple, list[Statement]] = {}
        subj_order: list[tuple] = []
        obj_refs: dict[str, int] = {}
        blank_is_subject: set[str] = set()
        for st in statements:
            key = (st.subject.kind, st.subject.value)
            if key not in by_subject:
                by_subject[key] = []
                subj_order.append(key)
            by_subject[key].append(st)
            if st.subject.kind == BLANK:
                blank_is_subject.add(st.subject.value)
            if st.object.kind == BLANK:
                obj_refs[st.object.value] = obj_refs.get(st.object.value, 0) + 1

        # blanks inlinable as [ … ] or ( … ): exactly one object
        # reference, and they have their own property block
        inlinable = {
            label
            for label, n in obj_refs.items()
            if n == 1 and label in blank_is_subject
        }
        lists = self._well_formed_lists(by_subject, inlinable)

        self._by_subject = by_subject
        self._inlinable = inlinable
        self._lists = lists
        self._emitted: set[tuple] = set()

        out: list[str] = []
        if emit_prefixes and self.env.prefixes:
            for name, ns in self.env.prefixes.items():
                out.append(f"@prefix {name}: <{_escape_iri(ns)}> .")
            out.append("")
        for key in subj_order:
            if key in self._emitted:
                continue
            kind, value = key
            if kind == BLANK and (value in inlinable):
                continue  # emitted inline at its reference site
            out.append(self._subject_block(key))
        # catch-all: blanks marked inlinable but never reached from a
        # non-blank root (self-loops, blank-only cycles, orphan
        # chains) still own statements — emit them as labeled blocks
        # so no statement is ever lost
        for key in subj_order:
            if key not in self._emitted:
                out.append(self._subject_block(key))
        return "\n".join(out) + ("\n" if out else "")

    def _well_formed_lists(
        self, by_subject: dict, inlinable: set[str]
    ) -> dict[str, tuple[Term, str | None]]:
        """label → (first-element, next-label|None) for blank nodes
        that are proper list cells: exactly {rdf:first, rdf:rest}."""
        cells: dict[str, tuple[Term, str | None]] = {}
        for (kind, value), stmts in by_subject.items():
            if kind != BLANK or value not in inlinable:
                continue
            preds = sorted(st.predicate.value for st in stmts)
            if len(stmts) == 2 and preds == sorted([RDF_FIRST, RDF_REST]):
                first = next(
                    st.object for st in stmts if st.predicate.value == RDF_FIRST
                )
                rest = next(
                    st.object for st in stmts if st.predicate.value == RDF_REST
                )
                if rest.kind == IRI and rest.value == RDF_NIL:
                    cells[value] = (first, None)
                elif rest.kind == BLANK:
                    cells[value] = (first, rest.value)
        # a cell is usable only if its whole tail is made of cells —
        # memoized so the total walk is O(n), not O(n²) per-cell
        # re-walks (a single 100k-element collection would otherwise
        # hang the writer)
        state: dict[str, bool] = {}

        def tail_ok(start: str) -> bool:
            path: list[str] = []
            on_path: set[str] = set()
            label: str | None = start
            while True:
                if label is None:
                    result = True
                    break
                if label in state:
                    result = state[label]
                    break
                if label in on_path or label not in cells:
                    result = False  # cycle or broken tail
                    break
                path.append(label)
                on_path.add(label)
                label = cells[label][1]
            for p in path:
                state[p] = result
            return result

        return {lab: cell for lab, cell in cells.items() if tail_ok(lab)}

    def _subject_block(self, key: tuple) -> str:
        kind, value = key
        subj = (
            self._iri(value) if kind == IRI else f"_:{value}"
        )
        body = self._predicate_object_list(key, indent="  ")
        return f"{subj} {body} ."

    def _predicate_object_list(self, key: tuple, indent: str) -> str:
        stmts = self._by_subject[key]
        self._emitted.add(key)
        groups: dict[str, list[Term]] = {}
        order: list[str] = []
        for st in stmts:
            p = st.predicate.value
            if p not in groups:
                groups[p] = []
                order.append(p)
            groups[p].append(st.object)
        parts: list[str] = []
        for p in order:
            pv = "a" if p == RDF_TYPE else self._iri(p)
            objs = ", ".join(
                self._object(o, indent + "  ") for o in groups[p]
            )
            parts.append(f"{pv} {objs}")
        sep = f" ;\n{indent}"
        return sep.join(parts)

    def _object(self, o: Term, indent: str) -> str:
        if o.kind == LITERAL:
            return self._literal(o)
        if o.kind == IRI:
            return self._iri(o.value)
        # blank node object; past the depth cap, reference by label —
        # the catch-all pass emits the node as a top-level block
        if self._depth >= self.MAX_INLINE_DEPTH:
            return f"_:{o.value}"
        if o.value in self._lists and (BLANK, o.value) not in self._emitted:
            return self._collection(o.value)
        if (
            o.value in self._inlinable
            and (BLANK, o.value) in self._by_subject
            and (BLANK, o.value) not in self._emitted
        ):
            self._depth += 1
            try:
                inner = self._predicate_object_list((BLANK, o.value), indent)
            finally:
                self._depth -= 1
            return f"[ {inner} ]"
        return f"_:{o.value}"

    def _collection(self, label: str) -> str:
        items: list[str] = []
        cur: str | None = label
        self._depth += 1
        try:
            while cur is not None:
                self._emitted.add((BLANK, cur))
                first, nxt = self._lists[cur]
                items.append(self._object(first, "  "))
                cur = nxt
        finally:
            self._depth -= 1
        return "( " + " ".join(items) + " )"


def write_turtle(
    statements: list[Statement], env: Env | None = None
) -> str:
    return TurtleWriter(env).write(statements)


def write_trig(
    statements: list[Statement], env: Env | None = None
) -> str:
    """TriG: default-graph statements at top level, named graphs in
    ``<g> { … }`` blocks (graph order = first appearance)."""
    # sanitize unsafe blank labels ONCE across the whole document
    # (graph position included) — per-graph write() calls would
    # otherwise relabel bodies while the graph HEADER kept the raw
    # label (e.g. '_:j=1 {', which does not re-parse)
    statements = TurtleWriter.relabel_unsafe(statements)
    by_graph: dict[str | None, list[Statement]] = {}
    order: list[str | None] = []
    for st in statements:
        g = None
        if st.graph is not None:
            g = (
                "_:" + st.graph.value
                if st.graph.kind == BLANK
                else st.graph.value
            )
        if g not in by_graph:
            by_graph[g] = []
            order.append(g)
        by_graph[g].append(st)

    w = TurtleWriter(env)
    out: list[str] = []
    for name, ns in w.env.prefixes.items():
        out.append(f"@prefix {name}: <{_escape_iri(ns)}> .")
    if w.env.prefixes:
        out.append("")
    for g in order:
        doc = TurtleWriter(Env())
        doc.env.prefixes = dict(w.env.prefixes)
        # header suppressed (emitted once above); the body is used
        # VERBATIM — no line-level stripping or re-indentation, which
        # would corrupt multi-line literal content
        body = doc.write(by_graph[g], emit_prefixes=False)
        if g is None:
            out.append(body.rstrip("\n"))
        else:
            gterm = g if g.startswith("_:") else doc._iri(g)
            out.append(gterm + " {")
            out.append(body.rstrip("\n"))
            out.append("}")
    return "\n".join(out) + ("\n" if out else "")
