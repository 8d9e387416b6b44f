"""N-Triples / N-Quads parser and deterministic writer.

Parser: line-oriented restriction of the Turtle grammar (ref:
src/n3.c#read_nquadsDoc; W3C RDF 1.1 N-Triples/N-Quads grammars).

Writer: equivalent of the reference's flat writer path (ref:
src/writer.c#serd_writer_write_statement, escape rules
#write_text) — one statement per line, full IRIs, canonical
escaping, **stable blank-node numbering**: every blank node is
relabeled ``b1, b2, …`` in order of first appearance in the
statement stream, which makes output a pure deterministic function
of the parsed document (the BASELINE.md round-trip + golden-file
requirement).
"""

from __future__ import annotations

import re

from serd_spark.rdf.model import (
    BLANK,
    IRI,
    LITERAL,
    ParseError,
    Statement,
    Term,
)
from serd_spark.rdf.turtle import (
    _BNODE_LABEL,
    _LANGTAG,
    _unescape_string,
    _unescape_uchar_only,
)

__all__ = [
    "parse_ntriples",
    "parse_nquads",
    "write_ntriples",
    "write_nquads",
    "format_term",
    "canonical_blank_relabel",
]

_IRIREF_L = re.compile(
    r'<((?:[^\x00-\x20<>"{}|^`\\]|\\u[0-9A-Fa-f]{4}|\\U[0-9A-Fa-f]{8})*)>'
)
_STRING_L = re.compile(r'"((?:[^"\\\n\r]|\\.)*)"')

# fast path: the overwhelmingly common line shape — IRI subject/
# predicate, escape-free IRI or escape-free literal object, optional
# escape-free IRI graph term. Anything else (escapes, blank nodes,
# comments mid-line, errors) falls back to the exact per-term parser.
_FAST_IRI = r'<([^\x00-\x20<>"{}|^`\\]*)>'
_FAST_LINE = re.compile(
    r"[ \t]*" + _FAST_IRI +                      # subject
    r"[ \t]+" + _FAST_IRI +                      # predicate
    r"[ \t]+(?:" + _FAST_IRI +                   # object iri
    r'|"([^"\\\n\r]*)"'                          # or literal (no escapes)
    r"(?:\^\^" + _FAST_IRI + r"|@([A-Za-z]+(?:-[A-Za-z0-9]+)*))?"
    r")"
    r"(?:[ \t]+" + _FAST_IRI + r")?"             # optional graph (NQ)
    r"[ \t]*\.[ \t]*\Z"
)


class _LineParser:
    """One N-Triples/N-Quads statement line."""

    def __init__(self, line: str, lineno: int):
        self.s = line
        self.pos = 0
        self.n = len(line)
        self.lineno = lineno

    def err(self, msg: str):
        raise ParseError(msg, self.lineno, self.pos + 1)

    def skip_ws(self) -> None:
        s, n = self.s, self.n
        p = self.pos
        while p < n and s[p] in " \t":
            p += 1
        self.pos = p

    def at_end_or_comment(self) -> bool:
        self.skip_ws()
        return self.pos >= self.n or self.s[self.pos] == "#"

    def read_term(self, allow_literal: bool) -> Term:
        self.skip_ws()
        if self.pos >= self.n:
            self.err("unexpected end of line")
        c = self.s[self.pos]
        if c == "<":
            m = _IRIREF_L.match(self.s, self.pos)
            if not m:
                self.err("bad IRI")
            self.pos = m.end()
            return Term(IRI, _unescape_uchar_only(m.group(1), self.err))
        if c == "_":
            m = _BNODE_LABEL.match(self.s, self.pos)
            if not m:
                self.err("bad blank node label")
            self.pos = m.end()
            return Term(BLANK, m.group(0)[2:])
        if c == '"':
            if not allow_literal:
                self.err("literal not allowed here")
            m = _STRING_L.match(self.s, self.pos)
            if not m:
                self.err("unterminated or bad string")
            self.pos = m.end()
            value = _unescape_string(m.group(1), self.err)
            if self.s.startswith("^^", self.pos):
                self.pos += 2
                md = _IRIREF_L.match(self.s, self.pos)
                if not md:
                    self.err("bad datatype IRI")
                self.pos = md.end()
                return Term(
                    LITERAL, value, _unescape_uchar_only(md.group(1), self.err)
                )
            if self.s.startswith("@", self.pos):
                ml = _LANGTAG.match(self.s, self.pos)
                if not ml:
                    self.err("bad language tag")
                self.pos = ml.end()
                return Term(LITERAL, value, "", ml.group(1))
            return Term(LITERAL, value)
        self.err(f"unexpected character {c!r}")


def _parse_lines(
    text: str, quads: bool, lax: bool
) -> tuple[list[Statement], list[tuple[int, int, str]]]:
    statements: list[Statement] = []
    errors: list[tuple[int, int, str]] = []
    for lineno, line in enumerate(text.split("\n"), start=1):
        # EOL is [#xD#xA]+ — CRLF files are everywhere on the web;
        # without this every line of a CRLF document fails on '\r'
        if line.endswith("\r"):
            line = line[:-1]
        fm = _FAST_LINE.match(line)
        if fm is not None and (quads or fm.group(7) is None):
            s_v, p_v, oi, lit, dt, lang, g_v = fm.groups()
            if oi is not None:
                obj = Term(IRI, oi)
            else:
                obj = Term(LITERAL, lit, dt or "", lang or "")
            statements.append(
                Statement(
                    Term(IRI, s_v),
                    Term(IRI, p_v),
                    obj,
                    Term(IRI, g_v) if g_v is not None else None,
                )
            )
            continue
        lp = _LineParser(line, lineno)
        if lp.at_end_or_comment():
            continue
        try:
            s = lp.read_term(allow_literal=False)
            p = lp.read_term(allow_literal=False)
            if p.kind != IRI:
                lp.err("predicate must be an IRI")
            o = lp.read_term(allow_literal=True)
            g: Term | None = None
            lp.skip_ws()
            if quads and lp.pos < lp.n and lp.s[lp.pos] != ".":
                g = lp.read_term(allow_literal=False)
                lp.skip_ws()
            if lp.pos >= lp.n or lp.s[lp.pos] != ".":
                lp.err("expected '.'")
            lp.pos += 1
            if not lp.at_end_or_comment():
                lp.err("trailing content after '.'")
            statements.append(Statement(s, p, o, g))
        except ParseError as e:
            if not lax:
                raise
            errors.append((e.line, e.col, e.message))
    return statements, errors


def parse_ntriples(
    text: str, base_iri: str = "", lax: bool = False
) -> tuple[list[Statement], list[tuple[int, int, str]]]:
    """``base_iri`` is accepted for signature parity but unused: the
    N-Triples grammar has no relative IRIs."""
    return _parse_lines(text, quads=False, lax=lax)


def parse_nquads(
    text: str, base_iri: str = "", lax: bool = False
) -> tuple[list[Statement], list[tuple[int, int, str]]]:
    return _parse_lines(text, quads=True, lax=lax)


# --- writer ---------------------------------------------------------------

# Escape table per the reference's write_text rules: ECHAR for the
# canonical five, \\u for remaining C0 controls + DEL.
_ESCAPES = {
    "\\": "\\\\",
    '"': '\\"',
    "\n": "\\n",
    "\r": "\\r",
    "\t": "\\t",
}
for _cp in list(range(0x00, 0x20)) + [0x7F]:
    _ESCAPES.setdefault(chr(_cp), f"\\u{_cp:04X}")

_ESCAPE_RE = re.compile(r'[\x00-\x1f"\\\x7f]')
_IRI_ESCAPE_RE = re.compile(r'[\x00-\x20<>"{}|^`\\\x7f]')


def _u_escape(cp: int) -> str:
    return f"\\u{cp:04X}" if cp <= 0xFFFF else f"\\U{cp:08X}"


def _escape_literal(s: str, ascii_only: bool = False) -> str:
    s = _ESCAPE_RE.sub(lambda m: _ESCAPES[m.group(0)], s)
    if ascii_only:
        s = "".join(
            c if ord(c) < 0x80 else _u_escape(ord(c)) for c in s
        )
    return s


def _escape_iri(s: str, ascii_only: bool = False) -> str:
    s = _IRI_ESCAPE_RE.sub(lambda m: f"\\u{ord(m.group(0)):04X}", s)
    if ascii_only:
        s = "".join(
            c if ord(c) < 0x80 else _u_escape(ord(c)) for c in s
        )
    return s


def format_term(
    t: Term,
    blank_map: dict[str, str] | None = None,
    ascii_only: bool = False,
) -> str:
    """``ascii_only`` ≙ the reference's SERD_STYLE_ASCII (serdi -a):
    non-ASCII codepoints become \\u/\\U escapes."""
    if t.kind == IRI:
        return f"<{_escape_iri(t.value, ascii_only)}>"
    if t.kind == BLANK:
        label = blank_map[t.value] if blank_map is not None else t.value
        return f"_:{label}"
    out = f'"{_escape_literal(t.value, ascii_only)}"'
    if t.lang:
        return f"{out}@{t.lang}"
    if t.datatype:
        return f"{out}^^<{_escape_iri(t.datatype, ascii_only)}>"
    return out


def canonical_blank_relabel(statements: list[Statement]) -> dict[str, str]:
    """Stable blank-node numbering: first appearance in the statement
    stream → ``b1, b2, …``."""
    m: dict[str, str] = {}
    for st in statements:
        for t in (st.subject, st.object, st.graph):
            if t is not None and t.kind == BLANK and t.value not in m:
                m[t.value] = f"b{len(m) + 1}"
    return m


def write_ntriples(
    statements: list[Statement],
    relabel: bool = True,
    ascii_only: bool = False,
) -> str:
    """Serialize to N-Triples, one statement per line, trailing
    newline iff non-empty (graph components are dropped — use
    :func:`write_nquads` to keep them). ``ascii_only`` ≙ serdi -a."""
    bm = canonical_blank_relabel(statements) if relabel else None
    lines = [
        f"{format_term(st.subject, bm, ascii_only)} "
        f"{format_term(st.predicate, None, ascii_only)} "
        f"{format_term(st.object, bm, ascii_only)} ."
        for st in statements
    ]
    return "\n".join(lines) + ("\n" if lines else "")


def write_nquads(
    statements: list[Statement],
    relabel: bool = True,
    ascii_only: bool = False,
) -> str:
    bm = canonical_blank_relabel(statements) if relabel else None
    lines = []
    for st in statements:
        parts = [
            format_term(st.subject, bm, ascii_only),
            format_term(st.predicate, None, ascii_only),
            format_term(st.object, bm, ascii_only),
        ]
        if st.graph is not None:
            parts.append(format_term(st.graph, bm, ascii_only))
        parts.append(".")
        lines.append(" ".join(parts))
    return "\n".join(lines) + ("\n" if lines else "")
