"""Locate embedded RDF islands in an HTML page.

Per ``BASELINE.json:north_star`` a page may embed Turtle / TriG /
N-Triples / N-Quads / JSON-LD in MIME-typed ``<script>`` tags plus
microdata attributes. Script content is CDATA-like in HTML, so a
compiled-regex scan (C speed) is both correct and fast for the
script islands; microdata goes through the DOM-based extractor
(:mod:`serd_spark.rdf.microdata`), gated on a substring pre-filter.

Also resolves the per-document base IRI: ``<base href>`` wins over
the page URL (HTML semantics), matching how a browser-equivalent
reference harness would resolve relative IRIs per document.
"""

from __future__ import annotations

import re
from collections.abc import Callable

from serd_spark.rdf.jsonld import parse_jsonld
from serd_spark.rdf.microdata import build_tree, parse_microdata
from serd_spark.rdf.rdfa import has_rdfa_markers, parse_rdfa
from serd_spark.rdf.model import BLANK, ParseError, Statement, Term
from serd_spark.rdf.ntriples import parse_nquads, parse_ntriples
from serd_spark.rdf.rdfxml import parse_rdfxml
from serd_spark.rdf.turtle import parse_trig, parse_turtle

__all__ = ["MIME_SYNTAX", "PARSERS", "find_islands", "extract_document"]

MIME_SYNTAX = {
    "text/turtle": "turtle",
    "application/trig": "trig",
    "application/n-triples": "ntriples",
    "application/n-quads": "nquads",
    "application/ld+json": "jsonld",
    "application/rdf+xml": "rdfxml",
}

ParserFn = Callable[..., tuple[list[Statement], list[tuple[int, int, str]]]]

PARSERS: dict[str, ParserFn] = {
    "turtle": parse_turtle,
    "trig": parse_trig,
    "ntriples": parse_ntriples,
    "nquads": parse_nquads,
    "jsonld": parse_jsonld,
    "rdfxml": parse_rdfxml,
}

def parse_one(
    syntax: str,
    content: str,
    base: str,
    lax: bool,
    jsonld_context_loader=None,
) -> tuple[list[Statement], list[tuple[int, int, str]]]:
    """Parse one document/island of a known syntax with the SHARED
    lax/strict containment contract (used by the island loop below
    and by the raw-file path in operators/extract.py — one harness,
    so the two cannot drift):

    - unknown/None syntax: lax records one error, strict raises
    - ParseError: lax records it, strict propagates
    - RecursionError (adversarially nested JSON-LD): lax contains it
    """
    parser = PARSERS.get(syntax)
    if parser is None:
        if not lax:
            raise ParseError(f"unsupported syntax {syntax!r}", 0, 0)
        return [], [(0, 0, f"unsupported syntax {syntax!r}")]
    kwargs: dict = {"lax": lax}
    if syntax == "jsonld" and jsonld_context_loader is not None:
        kwargs["context_loader"] = jsonld_context_loader
    try:
        return parser(content, base, **kwargs)
    except ParseError as e:
        if not lax:
            raise  # strict mode aborts the document (≙ serdi default)
        return [], [(e.line, e.col, e.message)]
    except RecursionError:
        # can exhaust the Python stack inside json.loads/_node before
        # any depth guard — contain it, never kill the batch
        if not lax:
            raise
        return [], [(0, 0, "nesting depth exceeded")]


_SCRIPT = re.compile(
    r"<script\b([^>]*)>(.*?)</script\s*>", re.IGNORECASE | re.DOTALL
)
_TYPE_ATTR = re.compile(
    r"""\btype\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""", re.IGNORECASE
)
_BASE_TAG = re.compile(r"<base\b([^>]*)>", re.IGNORECASE)
_HREF_ATTR = re.compile(
    r"""\bhref\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""", re.IGNORECASE
)


def find_islands(html_text: str) -> list[tuple[str, str]]:
    """→ [(syntax, raw_content)] for every MIME-typed script island,
    in document order."""
    out: list[tuple[str, str]] = []
    for m in _SCRIPT.finditer(html_text):
        ta = _TYPE_ATTR.search(m.group(1))
        if not ta:
            continue
        mime = (ta.group(1) or ta.group(2) or ta.group(3) or "").strip().lower()
        mime = mime.split(";")[0].strip()
        syntax = MIME_SYNTAX.get(mime)
        if syntax is not None:
            out.append((syntax, m.group(2)))
    return out


def document_base(html_text: str, url: str) -> str:
    """Per-document base IRI: first ``<base href>`` resolved against
    the page URL, else the page URL."""
    m = _BASE_TAG.search(html_text)
    if m:
        h = _HREF_ATTR.search(m.group(1))
        if h:
            href = (h.group(1) or h.group(2) or h.group(3) or "").strip()
            if href:
                from serd_spark.rdf import uri as urimod

                return urimod.resolve(url, href) if url else href
    return url


def extract_document(
    html_text: str, url: str, lax: bool = True,
    jsonld_context_loader=None,
) -> tuple[
    list[tuple[int, str, Statement]],
    list[tuple[int, str, int, int, str]],
]:
    """Extract all RDF from one HTML document.

    Returns ``(triples, errors)`` where triples are
    ``(island_ord, syntax, Statement)`` in document/streaming order
    and errors are ``(island_ord, syntax, line, col, message)``.

    ``jsonld_context_loader`` (see ``jsonld.dir_context_loader``)
    resolves remote ``@context`` references from an offline snapshot;
    without one they stay per-island errors.

    Blank-node labels are made island-unique by prefixing the island
    ordinal (``{ord}~{label}`` — '~' is not in PN_CHARS); URL-level
    namespacing happens in the Spark extract stage so this function
    stays pure per-document.
    """
    triples: list[tuple[int, str, Statement]] = []
    errors: list[tuple[int, str, int, int, str]] = []
    base = document_base(html_text, url)

    def scoped(st: Statement, ord_: int) -> Statement:
        # island-unique blank labels as documented: two islands both
        # emitting 'a=1' are DISTINCT nodes; without the prefix any
        # direct caller silently merges them (the Spark extract stage
        # additionally namespaces by url)
        def fix(t: Term | None) -> Term | None:
            if t is not None and t.kind == BLANK:
                return Term(BLANK, f"{ord_}~{t.value}")
            return t

        if (
            st.subject.kind != BLANK
            and st.object.kind != BLANK
            and (st.graph is None or st.graph.kind != BLANK)
        ):
            return st
        return Statement(
            fix(st.subject), st.predicate, fix(st.object), fix(st.graph)
        )

    islands = find_islands(html_text)
    for ord_, (syntax, content) in enumerate(islands):
        stmts, errs = parse_one(
            syntax, content, base, lax,
            jsonld_context_loader=jsonld_context_loader,
        )
        for le in errs:
            errors.append((ord_, syntax, le[0], le[1], le[2]))
        triples.extend((ord_, syntax, scoped(st, ord_)) for st in stmts)

    # microdata + RDFa share ONE light-DOM build (the expensive part);
    # each gate is a substring check so RDF-free pages skip all of it
    md_ord = len(islands)
    ra_ord = md_ord + 1
    need_md = "itemscope" in html_text
    need_ra = has_rdfa_markers(html_text)
    tree = None
    if need_md or need_ra:
        try:
            tree = build_tree(html_text)
        except RecursionError:  # pragma: no cover - adversarial depth
            if not lax:
                raise
            # attribute the failure to every extractor whose gate
            # fired — a 'typeof' page with no 'itemscope' must not log
            # a microdata error it never attempted
            if need_md:
                errors.append(
                    (md_ord, "microdata", 0, 0, "DOM nesting depth exceeded")
                )
            if need_ra:
                errors.append(
                    (ra_ord, "rdfa", 0, 0, "DOM nesting depth exceeded")
                )
            need_md = need_ra = False
    for needed, ord_, syntax, parse in (
        (need_md, md_ord, "microdata", parse_microdata),
        (need_ra, ra_ord, "rdfa", parse_rdfa),
    ):
        if not needed:
            continue
        try:
            stmts, errs = parse(html_text, base, lax=lax, tree=tree)
        except ParseError as e:  # pragma: no cover - defensive
            stmts, errs = [], [(e.line, e.col, e.message)]
        except RecursionError:  # pragma: no cover - adversarial depth
            if not lax:
                raise
            stmts, errs = [], [(0, 0, "DOM nesting depth exceeded")]
        for le in errs:
            errors.append((ord_, syntax, le[0], le[1], le[2]))
        triples.extend((ord_, syntax, scoped(st, ord_)) for st in stmts)
    return triples, errors
