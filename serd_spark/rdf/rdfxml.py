"""RDF/XML parser and deterministic writer.

The fourth concrete RDF syntax (after Turtle/TriG, N-Triples/
N-Quads, and the three HTML-embedded syntaxes): the W3C RDF/XML
grammar (rdf-syntax-grammar, 2014) that standalone ``.rdf`` files,
FOAF profiles, and RSS 1.0 feeds on the web use.  The reference
(serd) deliberately does NOT parse RDF/XML — this module extends the
pipeline past the reference surface the same way the JSON-LD /
microdata / RDFa extractors do.

Supported grammar (the complete modern core):

- ``rdf:RDF`` root or a bare node element; nested node elements
- ``rdf:about`` / ``rdf:ID`` / ``rdf:nodeID`` subjects, typed node
  elements (``<foaf:Person>`` ≡ ``rdf:type``), property attributes
- property elements with ``rdf:resource`` / ``rdf:nodeID`` /
  ``rdf:datatype`` / ``xml:lang`` / text content / one nested node
  element
- ``rdf:parseType="Resource"`` (anonymous struct),
  ``"Collection"`` (rdf:first/rest list), ``"Literal"`` (and any
  unknown parseType, per spec) → ``rdf:XMLLiteral``
- ``rdf:li`` → ``rdf:_1, rdf:_2, …`` container membership
  (per-node-element counter, as the spec requires)
- ``rdf:ID`` on a property element → standard reification quad
  (rdf:Statement / subject / predicate / object)
- ``xml:base`` and ``xml:lang`` scoping (RFC 3986 resolution via
  :mod:`serd_spark.rdf.uri`)

Deliberate divergences, documented:

- Documents carrying a DTD (``<!DOCTYPE``) are rejected outright —
  the standard entity-expansion-bomb guard (the same
  bound-work-before-looping rule every codec in this repo follows);
  real-web RDF/XML essentially never carries an internal DTD.
- ``rdf:parseType="Literal"`` values are the ElementTree
  serialization of the inner XML, not exclusive canonical XML —
  deterministic (same bytes in → same string out) but not
  c14n-normalized.
- RDF 1.0 relics ``rdf:aboutEach`` / ``rdf:aboutEachPrefix`` /
  ``rdf:bagID`` are errors, as in RDF 1.1.

Writer: flat ``rdf:Description`` form (no typed-node or container
sugar), one block per subject in first-appearance order, blank
labels relabeled ``b1, b2, …`` (NCName-safe — internal labels may
contain ``=`` which XML forbids), namespaces collected and numbered
deterministically.  Statements a writer literally cannot express —
named graphs, predicates whose IRI has no NCName suffix, literals
containing XML-1.0-invalid control characters — raise ``ValueError``
loudly rather than emitting broken XML.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

from serd_spark.rdf.model import (
    BLANK,
    IRI,
    LITERAL,
    RDF_NS,
    ParseError,
    Statement,
    Term,
    blank,
    iri,
    literal,
)
from serd_spark.rdf.uri import resolve

__all__ = ["parse_rdfxml", "write_rdfxml"]

_XML_NS = "http://www.w3.org/XML/1998/namespace"
_XML_LANG = "{%s}lang" % _XML_NS
_XML_BASE = "{%s}base" % _XML_NS
_XML_SPACE = "{%s}space" % _XML_NS
_XML_ID = "{%s}id" % _XML_NS

_RDF = "{%s}" % RDF_NS
_RDF_RDF = _RDF + "RDF"
_RDF_DESCRIPTION = _RDF + "Description"
_RDF_ABOUT = _RDF + "about"
_RDF_ID = _RDF + "ID"
_RDF_NODEID = _RDF + "nodeID"
_RDF_RESOURCE = _RDF + "resource"
_RDF_DATATYPE = _RDF + "datatype"
_RDF_PARSETYPE = _RDF + "parseType"
_RDF_LI = _RDF + "li"
_RDF_TYPE_ATTR = _RDF + "type"

RDF_XMLLITERAL = RDF_NS + "XMLLiteral"

# RDF 1.0 relics — errors in RDF 1.1
_OLD_TERMS = {_RDF + "aboutEach", _RDF + "aboutEachPrefix", _RDF + "bagID"}

# names that cannot be node elements (spec: coreSyntaxTerms ∪
# {rdf:li, relics}; rdf:Description IS allowed)
_BAD_NODE_NAMES = {
    _RDF_RDF, _RDF_ID, _RDF_ABOUT, _RDF_PARSETYPE, _RDF_RESOURCE,
    _RDF_NODEID, _RDF_LI, _RDF_DATATYPE,
} | _OLD_TERMS

# names that cannot be property elements (rdf:li IS allowed)
_BAD_PROP_NAMES = {
    _RDF_RDF, _RDF_ID, _RDF_ABOUT, _RDF_PARSETYPE, _RDF_RESOURCE,
    _RDF_NODEID, _RDF_DESCRIPTION, _RDF_DATATYPE,
} | _OLD_TERMS

# syntax attributes never emitted as property attributes
_SYNTAX_ATTRS = {
    _RDF_ABOUT, _RDF_ID, _RDF_NODEID, _RDF_RESOURCE, _RDF_DATATYPE,
    _RDF_PARSETYPE, _XML_LANG, _XML_BASE, _XML_SPACE, _XML_ID,
}

_DOCTYPE_RE = re.compile(rb"<!DOCTYPE", re.IGNORECASE)
_NCNAME_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_.\-]*\Z")
# XML 1.0 forbids all C0 controls except TAB/LF/CR
_BAD_XML_CHARS = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f]")

_MAX_DEPTH = 200


def _split_tag(tag: str) -> tuple[str, str]:
    """ElementTree ``{ns}local`` → (ns, local)."""
    if tag.startswith("{"):
        ns, _, local = tag[1:].partition("}")
        return ns, local
    return "", tag


class _RdfXmlParser:
    def __init__(self, base_iri: str, lax: bool):
        self.base = base_iri
        self.lax = lax
        self.statements: list[Statement] = []
        self.errors: list[tuple[int, int, str]] = []
        self.blank_n = 0
        self.seen_ids: set[str] = set()

    # -- helpers ---------------------------------------------------------

    def _err(self, msg: str) -> None:
        """Strict: raise.  Lax: record (positions are not tracked
        through ElementTree, so lax errors report 0:0) and skip the
        offending construct."""
        if self.lax:
            self.errors.append((0, 0, msg))
        else:
            raise ParseError(msg, 0, 0)

    def _new_blank(self) -> Term:
        # '=' is not an XML NCName char nor a Turtle PN_CHAR → cannot
        # collide with explicit rdf:nodeID labels (same convention as
        # TurtleParser._new_blank's 'a=' namespace)
        self.blank_n += 1
        return Term(BLANK, f"x={self.blank_n}")

    def _emit(self, s: Term, p: Term, o: Term) -> None:
        self.statements.append(Statement(s, p, o, None))

    def _scope(self, el: ET.Element, base: str, lang: str) -> tuple[str, str]:
        b = el.get(_XML_BASE)
        if b is not None:
            base = resolve(base, b) if base else b
        lg = el.get(_XML_LANG)
        if lg is not None:
            lang = lg
        return base, lang

    def _resolve_id(self, el: ET.Element, val: str, base: str) -> str | None:
        if not _NCNAME_RE.match(val):
            self._err(f"rdf:ID {val!r} is not an NCName")
            return None
        key = f"{base}#{val}"
        if key in self.seen_ids:
            self._err(f"duplicate rdf:ID {val!r} for base {base!r}")
            return None
        self.seen_ids.add(key)
        return resolve(base, "#" + val) if base else "#" + val

    def _tag_iri(self, el: ET.Element) -> str | None:
        ns, local = _split_tag(el.tag)
        if not ns:
            self._err(f"element {local!r} has no namespace")
            return None
        return ns + local

    # -- grammar ---------------------------------------------------------

    def parse_root(self, root: ET.Element) -> None:
        base, lang = self._scope(root, self.base, "")
        if root.tag == _RDF_RDF:
            for child in root:
                self.node_element(child, base, lang, 1)
        else:
            self.node_element(root, base, lang, 1)

    def node_element(
        self, el: ET.Element, base: str, lang: str, depth: int
    ) -> Term | None:
        if depth > _MAX_DEPTH:
            raise ParseError("RDF/XML nesting too deep", 0, 0)
        base, lang = self._scope(el, base, lang)
        name = self._tag_iri(el)
        if name is None:
            return None
        if el.tag in _BAD_NODE_NAMES:
            self._err(f"{el.tag} is not allowed as a node element")
            return None

        about = el.get(_RDF_ABOUT)
        rid = el.get(_RDF_ID)
        nodeid = el.get(_RDF_NODEID)
        if sum(v is not None for v in (about, rid, nodeid)) > 1:
            self._err("at most one of rdf:about/rdf:ID/rdf:nodeID")
            return None
        if about is not None:
            subj = iri(resolve(base, about) if base else about)
        elif rid is not None:
            expanded = self._resolve_id(el, rid, base)
            if expanded is None:
                return None
            subj = iri(expanded)
        elif nodeid is not None:
            if not _NCNAME_RE.match(nodeid):
                self._err(f"rdf:nodeID {nodeid!r} is not an NCName")
                return None
            subj = blank(nodeid)
        else:
            subj = self._new_blank()

        if el.tag != _RDF_DESCRIPTION:
            self._emit(subj, iri(RDF_NS + "type"), iri(name))

        # property attributes
        for attr, val in sorted(el.attrib.items()):
            if attr in _SYNTAX_ATTRS or attr in (_RDF_ABOUT, _RDF_ID, _RDF_NODEID):
                continue
            ns, local = _split_tag(attr)
            if not ns:
                self._err(f"unqualified attribute {local!r}")
                continue
            if attr in _OLD_TERMS or attr == _RDF_LI:
                self._err(f"{attr} is not allowed as a property attribute")
                continue
            if attr == _RDF_TYPE_ATTR:
                self._emit(
                    subj, iri(RDF_NS + "type"),
                    iri(resolve(base, val) if base else val),
                )
            else:
                self._emit(subj, iri(ns + local), literal(val, "", lang))

        li_n = 0
        for child in el:
            li_n = self.property_element(subj, child, base, lang, li_n, depth + 1)
        return subj

    def property_element(
        self,
        subj: Term,
        el: ET.Element,
        base: str,
        lang: str,
        li_n: int,
        depth: int,
    ) -> int:
        if depth > _MAX_DEPTH:
            raise ParseError("RDF/XML nesting too deep", 0, 0)
        base, lang = self._scope(el, base, lang)
        if el.tag in _BAD_PROP_NAMES:
            self._err(f"{el.tag} is not allowed as a property element")
            return li_n
        if el.tag == _RDF_LI:
            li_n += 1
            pred = iri(RDF_NS + f"_{li_n}")
        else:
            name = self._tag_iri(el)
            if name is None:
                return li_n
            pred = iri(name)

        parse_type = el.get(_RDF_PARSETYPE)
        resource = el.get(_RDF_RESOURCE)
        nodeid = el.get(_RDF_NODEID)
        datatype = el.get(_RDF_DATATYPE)
        reify_id = el.get(_RDF_ID)
        children = list(el)
        text = el.text or ""
        prop_attrs = [
            (a, v)
            for a, v in sorted(el.attrib.items())
            if a not in _SYNTAX_ATTRS
            and a not in (_RDF_ID,)
            and _split_tag(a)[0] not in ("", _XML_NS)
        ]

        obj: Term | None = None
        if parse_type == "Resource":
            if resource is not None or nodeid is not None or datatype is not None:
                self._err("parseType=Resource excludes resource/nodeID/datatype")
                return li_n
            obj = self._new_blank()
            self._emit(subj, pred, obj)
            inner_li = 0
            for child in children:
                inner_li = self.property_element(
                    obj, child, base, lang, inner_li, depth + 1
                )
        elif parse_type == "Collection":
            if resource is not None or nodeid is not None or datatype is not None:
                self._err("parseType=Collection excludes resource/nodeID/datatype")
                return li_n
            nodes = []
            for child in children:
                n = self.node_element(child, base, lang, depth + 1)
                if n is not None:
                    nodes.append(n)
            if not nodes:
                obj = iri(RDF_NS + "nil")
                self._emit(subj, pred, obj)
            else:
                cells = [self._new_blank() for _ in nodes]
                obj = cells[0]
                self._emit(subj, pred, obj)
                for i, (cell, n) in enumerate(zip(cells, nodes)):
                    self._emit(cell, iri(RDF_NS + "first"), n)
                    rest = (
                        cells[i + 1]
                        if i + 1 < len(cells)
                        else iri(RDF_NS + "nil")
                    )
                    self._emit(cell, iri(RDF_NS + "rest"), rest)
        elif parse_type is not None:
            # "Literal" and, per spec, ANY other value → XML literal
            parts = [text] + [
                ET.tostring(c, encoding="unicode") for c in children
            ]
            obj = literal("".join(parts), RDF_XMLLITERAL, "")
            self._emit(subj, pred, obj)
        elif children:
            if text.strip():
                self._err("mixed text and element content in property element")
                return li_n
            if len(children) > 1:
                self._err("property element with more than one node element")
                return li_n
            if resource is not None or nodeid is not None or datatype is not None:
                self._err("nested node element excludes resource/nodeID/datatype")
                return li_n
            obj = self.node_element(children[0], base, lang, depth + 1)
            if obj is None:
                return li_n
            self._emit(subj, pred, obj)
        elif resource is not None or nodeid is not None or prop_attrs:
            if resource is not None and nodeid is not None:
                self._err("both rdf:resource and rdf:nodeID")
                return li_n
            if text.strip():
                self._err("text content on an empty property element")
                return li_n
            if resource is not None:
                obj = iri(resolve(base, resource) if base else resource)
            elif nodeid is not None:
                if not _NCNAME_RE.match(nodeid):
                    self._err(f"rdf:nodeID {nodeid!r} is not an NCName")
                    return li_n
                obj = blank(nodeid)
            else:
                obj = self._new_blank()
            self._emit(subj, pred, obj)
            for attr, val in prop_attrs:
                ns, local = _split_tag(attr)
                if attr in _OLD_TERMS or attr == _RDF_LI:
                    self._err(f"{attr} is not allowed as a property attribute")
                    continue
                if attr == _RDF_TYPE_ATTR:
                    self._emit(
                        obj, iri(RDF_NS + "type"),
                        iri(resolve(base, val) if base else val),
                    )
                else:
                    self._emit(obj, iri(ns + local), literal(val, "", lang))
        else:
            if datatype is not None:
                obj = literal(text, datatype, "")
            else:
                obj = literal(text, "", lang)
            self._emit(subj, pred, obj)

        if reify_id is not None and obj is not None:
            stmt_iri = self._resolve_id(el, reify_id, base)
            if stmt_iri is not None:
                r = iri(stmt_iri)
                self._emit(r, iri(RDF_NS + "type"), iri(RDF_NS + "Statement"))
                self._emit(r, iri(RDF_NS + "subject"), subj)
                self._emit(r, iri(RDF_NS + "predicate"), pred)
                self._emit(r, iri(RDF_NS + "object"), obj)
        return li_n


def parse_rdfxml(
    text: str | bytes, base_iri: str = "", lax: bool = False
) -> tuple[list[Statement], list[tuple[int, int, str]]]:
    """Parse an RDF/XML document → (statements, lax-mode errors).

    Same contract as ``parse_turtle`` / ``parse_ntriples``: strict
    mode raises :class:`ParseError` on the first violation; lax mode
    records (line, col, message) tuples and keeps going.  XML
    *syntax* errors are always fatal (there is no resynchronization
    point inside broken XML), as are DTDs (entity-bomb guard).
    """
    data = text.encode("utf-8") if isinstance(text, str) else text
    if _DOCTYPE_RE.search(data):
        raise ParseError("DTD in RDF/XML input is not supported", 0, 0)
    try:
        root = ET.fromstring(data)
    except ET.ParseError as e:
        line, col = e.position
        raise ParseError(f"XML syntax: {e.msg.split(':')[0]}", line, col + 1)
    p = _RdfXmlParser(base_iri, lax)
    p.parse_root(root)
    return p.statements, p.errors


# ---------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------

def _xml_escape(s: str, attr: bool = False) -> str:
    bad = _BAD_XML_CHARS.search(s)
    if bad:
        raise ValueError(
            f"character U+{ord(bad.group()):04X} cannot be written in XML 1.0"
        )
    s = s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    if attr:
        s = s.replace('"', "&quot;").replace("\n", "&#10;").replace(
            "\t", "&#9;"
        ).replace("\r", "&#13;")
    else:
        s = s.replace("\r", "&#13;")
    return s


def _split_predicate(p: str) -> tuple[str, str]:
    """Longest NCName suffix split — the only form XML can express.
    Scans left-to-right for the FIRST position whose suffix is an
    NCName (a right-to-left extension would stop early on suffixes
    like ``_1`` whose shorter tails start with a digit)."""
    for i in range(len(p)):
        if _NCNAME_RE.match(p[i:]):
            if i == 0:
                break
            return p[:i], p[i:]
    raise ValueError(f"predicate {p!r} has no XML-expressible NCName suffix")


def write_rdfxml(statements: list[Statement]) -> str:
    """Deterministic flat RDF/XML: one rdf:Description per subject in
    first-appearance order, blanks relabeled ``b1, b2, …`` (the
    NT-writer convention — internal labels may contain NCName-illegal
    chars), namespaces numbered by first appearance.  Raises
    ``ValueError`` on statements RDF/XML cannot express (named
    graphs, unsplittable predicates, control characters)."""
    for st in statements:
        if st.graph is not None and st.graph.value:
            raise ValueError("RDF/XML has no named-graph form")

    # stable blank relabel (first appearance over the statement stream)
    bmap: dict[str, str] = {}

    def _b(label: str) -> str:
        if label not in bmap:
            bmap[label] = f"b{len(bmap) + 1}"
        return bmap[label]

    # group by subject, preserving first-appearance order
    order: list[tuple[int, str]] = []
    groups: dict[tuple[int, str], list[Statement]] = {}
    for st in statements:
        key = (st.subject.kind, st.subject.value)
        if key not in groups:
            groups[key] = []
            order.append(key)
        groups[key].append(st)

    ns_ids: dict[str, str] = {RDF_NS: "rdf"}

    def _ns(ns: str) -> str:
        if ns not in ns_ids:
            ns_ids[ns] = f"ns{len(ns_ids)}"
        return ns_ids[ns]

    body: list[str] = []
    for key in order:
        kind, value = key
        if kind == BLANK:
            subj_attr = f' rdf:nodeID="{_xml_escape(_b(value), attr=True)}"'
        else:
            subj_attr = f' rdf:about="{_xml_escape(value, attr=True)}"'
        body.append(f"  <rdf:Description{subj_attr}>")
        for st in groups[key]:
            ns, local = _split_predicate(st.predicate.value)
            tag = f"{_ns(ns)}:{local}"
            o = st.object
            if o.kind == IRI:
                body.append(
                    f'    <{tag} rdf:resource="{_xml_escape(o.value, attr=True)}"/>'
                )
            elif o.kind == BLANK:
                body.append(
                    f'    <{tag} rdf:nodeID="{_xml_escape(_b(o.value), attr=True)}"/>'
                )
            else:
                attrs = ""
                if o.lang:
                    attrs = f' xml:lang="{_xml_escape(o.lang, attr=True)}"'
                elif o.datatype:
                    attrs = f' rdf:datatype="{_xml_escape(o.datatype, attr=True)}"'
                body.append(
                    f"    <{tag}{attrs}>{_xml_escape(o.value)}</{tag}>"
                )
        body.append("  </rdf:Description>")

    decls = "".join(
        f'\n    xmlns:{pid}="{_xml_escape(ns, attr=True)}"'
        for ns, pid in ns_ids.items()
    )
    return (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        f"<rdf:RDF{decls}>\n" + "\n".join(body) + "\n</rdf:RDF>\n"
    )
