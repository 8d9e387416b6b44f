"""HTML microdata → RDF statements.

Implements the W3C "Microdata to RDF" mapping (public Note) over a
light DOM built with the stdlib ``html.parser`` (lxml is not
available offline — SURVEY.md §7 M3):

- top-level items: elements with ``itemscope`` and no ``itemprop``;
- subject: resolved ``itemid`` if present, else a fresh blank node
  (labels ``m=1, m=2, …``, collision-free with explicit labels);
- ``itemtype`` values → rdf:type; the first type's vocabulary
  (itemtype up to and including the last ``#`` or ``/``) prefixes
  non-IRI property names;
- property values per element kind: ``meta`` → @content;
  ``audio/embed/iframe/img/source/track/video`` → @src;
  ``a/area/link`` → @href; ``object`` → @data; ``data/meter`` →
  @value; ``time`` → @datetime else text; anything else → its text
  content. URL-valued attributes resolve against the document base.
- nested ``itemscope`` elements become the value of their
  ``itemprop`` and their own properties do not leak outward.

``itemref`` follows the WHATWG crawl: each id listed on an item pulls
the referenced element (itself, if it bears ``itemprop``, plus its
subtree) into the item's property crawl; duplicate references are
applied once per item and circular reference chains are broken (the
spec calls them a "microdata error" — we emit the item without the
looping branch rather than failing the document).
"""

from __future__ import annotations

from html.parser import HTMLParser

from serd_spark.rdf import uri as urimod
from serd_spark.rdf.model import BLANK, IRI, LITERAL, RDF_TYPE, Statement, Term

__all__ = ["parse_microdata"]

_VOID = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}

_URL_ATTR = {
    "a": "href", "area": "href", "link": "href",
    "audio": "src", "embed": "src", "iframe": "src", "img": "src",
    "source": "src", "track": "src", "video": "src",
    "object": "data",
}


class _El:
    __slots__ = ("tag", "attrs", "children")

    def __init__(self, tag: str, attrs: dict[str, str]):
        self.tag = tag
        self.attrs = attrs
        self.children: list = []  # _El | str


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _El("#root", {})
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        el = _El(tag, {k: (v if v is not None else "") for k, v in attrs})
        self.stack[-1].children.append(el)
        if tag not in _VOID:
            self.stack.append(el)

    def handle_startendtag(self, tag, attrs):
        el = _El(tag, {k: (v if v is not None else "") for k, v in attrs})
        self.stack[-1].children.append(el)

    def handle_endtag(self, tag):
        # close the nearest matching open element (tolerant of
        # misnesting, like browsers)
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


def _text_content(el: _El) -> str:
    out: list[str] = []
    stack = list(reversed(el.children))
    while stack:
        c = stack.pop()
        if isinstance(c, str):
            out.append(c)
        elif c.tag not in ("script", "style"):
            stack.extend(reversed(c.children))
    return "".join(out)


class _MicrodataToRdf:
    def __init__(self, base_iri: str):
        self.base = base_iri
        self.blank_n = 0
        self.statements: list[Statement] = []
        self.id_index: dict[str, _El] = {}
        self._visiting: set[int] = set()  # itemref cycle guard

    def _new_blank(self) -> Term:
        self.blank_n += 1
        return Term(BLANK, f"m={self.blank_n}")

    def _resolve(self, ref: str) -> str:
        return urimod.resolve(self.base, ref) if self.base else ref

    def run(self, root: _El) -> list[Statement]:
        self._index_ids(root)
        for el in self._find_items(root, top_level=True):
            self._item(el)
        return self.statements

    def _index_ids(self, el: _El) -> None:
        """id → element map for itemref resolution (whole document;
        first occurrence of a duplicated id wins, as in browsers)."""
        for c in el.children:
            if isinstance(c, str):
                continue
            eid = c.attrs.get("id")
            if eid and eid not in self.id_index:
                self.id_index[eid] = c
            self._index_ids(c)

    def _find_items(self, el: _El, top_level: bool) -> list[_El]:
        """Elements with itemscope (top_level: and no itemprop),
        without descending into nested itemscopes."""
        found: list[_El] = []
        for c in el.children:
            if isinstance(c, str):
                continue
            is_item = "itemscope" in c.attrs
            if is_item and (not top_level or "itemprop" not in c.attrs):
                found.append(c)
            if not is_item or top_level:
                found.extend(self._find_items(c, top_level))
        return found

    def _item(self, el: _El) -> Term:
        if id(el) in self._visiting:
            # circular itemref chain reached this item again — the
            # spec calls this a microdata error; break the loop with
            # a fresh blank (no properties) instead of recursing
            return self._new_blank()
        self._visiting.add(id(el))
        try:
            itemid = el.attrs.get("itemid", "").strip()
            subj = (
                Term(IRI, self._resolve(itemid)) if itemid
                else self._new_blank()
            )
            types = [t for t in el.attrs.get("itemtype", "").split() if t]
            vocab = ""
            if types:
                first = types[0]
                cut = max(first.rfind("#"), first.rfind("/"))
                vocab = first[: cut + 1] if cut >= 0 else first
                for t in types:
                    self.statements.append(
                        Statement(subj, Term(IRI, RDF_TYPE), Term(IRI, t))
                    )
            # per-item crawl memory (WHATWG: an element reached twice
            # in one item's crawl is a microdata error, applied once):
            # covers duplicate itemref ids AND refs pointing into the
            # item's own subtree or into another ref's subtree
            memory: set[int] = set()
            self._props(el, subj, vocab, memory)
            # itemref: pull each referenced element (itself + subtree)
            # into this item's property crawl; a pseudo-parent lets
            # _props treat the target like a child, so an itemprop ON
            # the target is honored too
            for r in el.attrs.get("itemref", "").split():
                target = self.id_index.get(r)
                if target is None:
                    continue
                pseudo = _El("#ref", {})
                pseudo.children = [target]
                self._props(pseudo, subj, vocab, memory)
            return subj
        finally:
            self._visiting.discard(id(el))

    def _props(
        self, el: _El, subj: Term, vocab: str,
        memory: set[int] | None = None,
    ) -> None:
        for c in el.children:
            if isinstance(c, str):
                continue
            if memory is not None:
                if id(c) in memory:
                    continue  # already crawled for this item
                memory.add(id(c))
            names = [n for n in c.attrs.get("itemprop", "").split() if n]
            if names:
                if "itemscope" in c.attrs:
                    value: Term = self._item(c)
                else:
                    value = self._prop_value(c)
                for name in names:
                    if ":" in name or name.startswith("http"):
                        pred = name
                    elif vocab:
                        pred = vocab + name
                    else:
                        # untyped item, bare name: predicates must be
                        # ABSOLUTE IRIs (a bare 'name' would serialize
                        # as the invalid '<name>'), so anchor them in
                        # the document: <base#name>, falling back to a
                        # urn: namespace when no base exists —
                        # deterministic per (url, name) either way
                        pred = (
                            self._resolve("#" + name)
                            if self.base
                            else "urn:md:prop:" + name
                        )
                    if pred:
                        self.statements.append(
                            Statement(subj, Term(IRI, pred), value)
                        )
            if "itemscope" not in c.attrs:
                self._props(c, subj, vocab, memory)

    def _prop_value(self, el: _El) -> Term:
        tag = el.tag
        if tag == "meta":
            return Term(LITERAL, el.attrs.get("content", ""))
        url_attr = _URL_ATTR.get(tag)
        if url_attr is not None:
            return Term(IRI, self._resolve(el.attrs.get(url_attr, "")))
        if tag in ("data", "meter"):
            return Term(LITERAL, el.attrs.get("value", ""))
        if tag == "time":
            dt = el.attrs.get("datetime")
            return Term(LITERAL, dt if dt is not None else _text_content(el))
        return Term(LITERAL, _text_content(el))


def build_tree(html_text: str) -> _El:
    """Parse HTML into the light DOM shared by the microdata and RDFa
    extractors — callers holding both gates build it ONCE."""
    tb = _TreeBuilder()
    tb.feed(html_text)
    tb.close()
    return tb.root


def parse_microdata(
    html_text: str, base_iri: str = "", lax: bool = False,
    tree: _El | None = None,
) -> tuple[list[Statement], list[tuple[int, int, str]]]:
    """Extract microdata items from an HTML document string.

    Cheap pre-filter: documents without the ``itemscope`` substring
    never build a DOM (the common case at web scale). ``tree`` lets a
    caller that already built the shared DOM skip the re-parse."""
    if "itemscope" not in html_text:
        return [], []
    conv = _MicrodataToRdf(base_iri)
    return conv.run(tree if tree is not None else build_tree(html_text)), []
