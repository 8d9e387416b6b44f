"""HTML+RDFa Lite → RDF statements.

Implements the RDFa Lite 1.1 attribute set (``vocab``, ``prefix``,
``typeof``, ``property``, ``resource`` — W3C Rec) plus the RDFa Core
attributes real-world markup leans on (``about``, ``content``,
``datatype``, ``href``/``src`` as object sources, ``lang``/
``xml:lang``), over the same stdlib DOM as ``microdata.py``. This is
the third structured-data-in-HTML syntax next to JSON-LD and
microdata — Open Graph ``<meta property="og:...">`` tags and
schema.org-in-RDFa both land here.

Subset of the Core processing rules (documented divergences):
- ``@rel``/``@rev`` chaining INCLUDING incomplete triples: with an
  object resource on the same element (``@resource``/``@href``/
  ``@src``) the link triples emit immediately and the object becomes
  the descendants' subject; without one, the pending rel/rev links
  complete at EACH descendant branch's first element that establishes
  a node (``@about``, ``@typeof``, ``@resource``/``@href``/``@src``,
  or ``property``+``typeof``) — elements that merely inherit pass
  them through. Divergences from Core §7.5: an element with only
  ``@rel``/``@rev`` does not itself complete its parent's pending
  links (Core's step-10 self-completion yields degenerate
  ``(gp, rel, parent)`` triples real markup never wants), and when
  ``@property`` coexists, bare (non-CURIE) rel/rev terms are ignored
  (the RDFa 1.1 rule) while ``@resource``/``@href``/``@src`` feed the
  rel/rev links and ``@property`` takes the literal path;
- property-value precedence follows Core §7.5 step 11: non-empty
  ``@datatype`` → typed literal; ``@content`` → plain literal;
  ``@resource``/``@href``/``@src`` → IRI; ``@typeof`` (no ``@about``)
  → new typed blank/resource node; else the element's text content as
  a (language-tagged) plain literal;
- ``@vocab`` sets the term vocabulary for descendants (empty value
  resets it); ``@prefix`` declares CURIE mappings; a small fixed
  subset of the W3C RDFa initial context (schema, og, dc, foaf, …) is
  predeclared;
- bare terms with no in-scope ``@vocab`` are ignored (per Core);
- elements whose property value is an IRI (or a typed node) pass that
  node to their descendants as the new subject, so nested
  ``resource``/``typeof`` markup chains the way publishers expect;
- ``@about``/``@resource`` take the full SafeCURIEorCURIEorIRI
  grammar (Core §5): safe CURIEs unwrap (unknown-prefix safe CURIEs
  ignore the attribute, per Core), CURIEs with declared prefixes
  expand, ``_:label`` names document-scoped blank nodes, anything
  else resolves as an IRI reference; ``@href``/``@src`` stay
  IRI-only per their host-language definitions.

Explicitly out of scope (not divergences — unimplemented Core
features no mainstream publisher markup uses): ``@inlist``
(rdf:List generation), ``rdf:XMLLiteral`` datatypes (XML content is
flattened to text), RDFa 1.0 ``@xmlns:*`` prefix declarations, and
the HTML+RDFa host-language rule that hoists ``@about`` from
``<html>`` onto ``<head>``/``<body>``.

Blank labels are ``r=1, r=2, …`` — disjoint from the parser labels
and microdata's ``m=…`` by construction; the caller island-scopes
them (html_islands.extract_document).
"""

from __future__ import annotations

from serd_spark.rdf import uri as urimod
from serd_spark.rdf.microdata import _El, _text_content, _TreeBuilder
from serd_spark.rdf.model import BLANK, IRI, LITERAL, RDF_TYPE, Statement, Term

__all__ = ["parse_rdfa"]

# Subset of the published W3C RDFa 1.1 initial context — the
# vocabularies that dominate real deployments (Open Graph meta tags,
# Dublin Core, schema.org-in-RDFa).
INITIAL_PREFIXES: dict[str, str] = {
    "dc": "http://purl.org/dc/terms/",
    "dcterms": "http://purl.org/dc/terms/",
    "foaf": "http://xmlns.com/foaf/0.1/",
    "og": "http://ogp.me/ns#",
    "prov": "http://www.w3.org/ns/prov#",
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "schema": "http://schema.org/",
    "sioc": "http://rdfs.org/sioc/ns#",
    "skos": "http://www.w3.org/2004/02/skos/core#",
    "vcard": "http://www.w3.org/2006/vcard/ns#",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
}


class _RdfaToRdf:
    def __init__(self, base_iri: str):
        self.base = base_iri
        self.blank_n = 0
        self.named_blanks: dict[str, Term] = {}
        self.statements: list[Statement] = []

    def _new_blank(self) -> Term:
        self.blank_n += 1
        return Term(BLANK, f"r={self.blank_n}")

    def _resolve(self, ref: str) -> str:
        return urimod.resolve(self.base, ref) if self.base else ref

    def _node_ref(
        self, value: str, prefixes: dict[str, str]
    ) -> Term | None:
        """SafeCURIEorCURIEorIRI (Core §5, @about/@resource): safe
        CURIEs unwrap (unknown safe-CURIE prefix ⇒ the attribute is
        ignored, per Core — returns None), ``_:label`` names a
        document-scoped blank node (mapped onto the parser's own
        ``r=N`` labels so island scoping stays uniform), a known
        CURIE prefix expands, anything else resolves as an IRI ref."""
        v = value.strip()
        safe = v.startswith("[") and v.endswith("]")
        if safe:
            v = v[1:-1].strip()
        if v.startswith("_:"):
            t = self.named_blanks.get(v)
            if t is None:
                t = self._new_blank()
                self.named_blanks[v] = t
            return t
        if ":" in v:
            pfx, rest = v.split(":", 1)
            if not rest.startswith("//") and pfx in prefixes:
                return Term(IRI, prefixes[pfx] + rest)
            if safe:
                return None  # unknown prefix in a safe CURIE: ignored
        return Term(IRI, self._resolve(v))

    def _obj_node(
        self, a: dict[str, str], prefixes: dict[str, str]
    ) -> Term | None:
        """The element's object resource: @resource (full
        SafeCURIEorCURIEorIRI) wins over @href/@src (IRI-only, per
        their host-language definitions)."""
        if "resource" in a:
            return self._node_ref(a["resource"], prefixes)
        for k in ("href", "src"):
            if k in a:
                return Term(IRI, self._resolve(a[k]))
        return None

    def _expand(
        self, term: str, vocab: str, prefixes: dict[str, str]
    ) -> str | None:
        """CURIE/term → IRI. Safe CURIEs unwrap; unknown prefixes fall
        through as-is when the value already looks like an IRI
        (``mailto:x``, ``http://…``); bare terms need @vocab."""
        term = term.strip()
        if not term:
            return None
        if term.startswith("[") and term.endswith("]"):
            term = term[1:-1].strip()
        if ":" in term:
            pfx, rest = term.split(":", 1)
            if rest.startswith("//"):
                return term
            if pfx in prefixes:
                return prefixes[pfx] + rest
            return term
        if vocab:
            return vocab + term
        return None

    @staticmethod
    def _parse_prefix_attr(
        value: str, prefixes: dict[str, str]
    ) -> dict[str, str]:
        """``prefix="p1: uri1 p2: uri2"`` → updated copy."""
        toks = value.split()
        out = dict(prefixes)
        i = 0
        while i + 1 < len(toks):
            name = toks[i]
            if name.endswith(":"):
                out[name[:-1]] = toks[i + 1]
                i += 2
            else:
                i += 1  # malformed pair: skip token, stay in sync
        return out

    def run(self, root: _El) -> list[Statement]:
        doc_subj = (
            Term(IRI, self.base) if self.base else self._new_blank()
        )
        for c in root.children:
            if isinstance(c, _El):
                self._walk(c, doc_subj, "", dict(INITIAL_PREFIXES), "")
        return self.statements

    def _walk(
        self,
        el: _El,
        subj: Term,
        vocab: str,
        prefixes: dict[str, str],
        lang: str,
        pending: tuple[list[str], list[str], Term] | None = None,
    ) -> None:
        a = el.attrs
        if "vocab" in a:
            vocab = a["vocab"].strip()
        if "prefix" in a:
            prefixes = self._parse_prefix_attr(a["prefix"], prefixes)
        lang = a.get("lang", a.get("xml:lang", lang)) or ""

        props = [
            p
            for t in a.get("property", "").split()
            if (p := self._expand(t, vocab, prefixes))
        ]
        types = [
            t2
            for t in a.get("typeof", "").split()
            if (t2 := self._expand(t, vocab, prefixes))
        ]
        obj_node = self._obj_node(a, prefixes)
        about_t = (
            self._node_ref(a["about"], prefixes) if "about" in a else None
        )
        has_about = about_t is not None

        # rel/rev links (Core). The RDFa 1.1 rule: bare terms in
        # @rel/@rev are IGNORED when @property coexists — it exists
        # precisely so <link property=… rel=stylesheet> noise never
        # mints vocab+stylesheet predicates.
        def _links(attr: str) -> list[str]:
            out = []
            for t in a.get(attr, "").split():
                if props and ":" not in t:
                    continue
                if x := self._expand(t, vocab, prefixes):
                    out.append(x)
            return out

        rels, revs = _links("rel"), _links("rev")

        cur_subj = about_t if has_about else subj
        new_subj = cur_subj

        if rels or revs:
            self._walk_linking(
                el, a, cur_subj, has_about, props, types, obj_node,
                rels, revs, vocab, prefixes, lang, pending,
            )
            return

        if props:
            if types and not has_about:
                # property + typeof: the value is a NEW typed node
                node = (
                    obj_node if obj_node is not None else self._new_blank()
                )
                for p in props:
                    self.statements.append(
                        Statement(cur_subj, Term(IRI, p), node)
                    )
                for t in types:
                    self.statements.append(
                        Statement(node, Term(IRI, RDF_TYPE), Term(IRI, t))
                    )
                new_subj = node
            else:
                value, is_iri = self._prop_value(
                    el, a, obj_node, vocab, prefixes, lang
                )
                for p in props:
                    self.statements.append(
                        Statement(cur_subj, Term(IRI, p), value)
                    )
                for t in types:  # about + typeof (+ property)
                    self.statements.append(
                        Statement(cur_subj, Term(IRI, RDF_TYPE), Term(IRI, t))
                    )
                if is_iri:
                    # IRI-valued property chains the object to the
                    # descendants (nested resource markup)
                    new_subj = value
        elif types:
            node = (
                cur_subj
                if has_about
                else (
                    obj_node if obj_node is not None else self._new_blank()
                )
            )
            for t in types:
                self.statements.append(
                    Statement(node, Term(IRI, RDF_TYPE), Term(IRI, t))
                )
            new_subj = node
        elif has_about:
            new_subj = cur_subj
        elif "resource" in a and obj_node is not None:
            # bare @resource re-points the subject for descendants
            new_subj = obj_node

        # a node established here completes the nearest ancestor's
        # pending @rel/@rev links (one completion per descendant
        # branch: siblings each receive their own copy)
        if pending is not None and (has_about or new_subj != subj):
            p_rels, p_revs, p_subj = pending
            for r in p_rels:
                self.statements.append(
                    Statement(p_subj, Term(IRI, r), new_subj)
                )
            for r in p_revs:
                self.statements.append(
                    Statement(new_subj, Term(IRI, r), p_subj)
                )
            pending = None

        for c in el.children:
            if isinstance(c, _El):
                self._walk(c, new_subj, vocab, prefixes, lang, pending)

    def _walk_linking(
        self,
        el: _El,
        a: dict[str, str],
        cur_subj: Term,
        has_about: bool,
        props: list[str],
        types: list[str],
        obj: Term | None,
        rels: list[str],
        revs: list[str],
        vocab: str,
        prefixes: dict[str, str],
        lang: str,
        pending: tuple[list[str], list[str], Term] | None,
    ) -> None:
        """@rel/@rev element: the object resource (if any) takes the
        link triples and becomes the descendants' subject; otherwise
        the links go pending until a descendant establishes a node.
        @property on the same element takes the literal path (the
        resource is consumed by the links)."""
        if obj is None and types and not has_about:
            # @typeof with no @about and no resource: the typed blank
            # node is the links' object (Core's "typed resource")
            obj = self._new_blank()

        # a node established HERE — @about names a fresh subject, or
        # the element's object resource / typed node exists — also
        # completes an ANCESTOR's pending links, targeting that node
        # (the module docstring's rule, applied uniformly: on a
        # linking element the established node IS the link object). A
        # rel/rev element with NO established node inherits its
        # subject; completing there would mint degenerate
        # (gp, rel, parent) triples — the Core step-10 behavior this
        # parser diverges from.
        if pending is not None and (has_about or obj is not None):
            p_rels, p_revs, p_subj = pending
            target = cur_subj if has_about else obj
            for r in p_rels:
                self.statements.append(
                    Statement(p_subj, Term(IRI, r), target)
                )
            for r in p_revs:
                self.statements.append(
                    Statement(target, Term(IRI, r), p_subj)
                )

        type_target = cur_subj if has_about else obj
        if type_target is not None:
            for t in types:
                self.statements.append(
                    Statement(type_target, Term(IRI, RDF_TYPE), Term(IRI, t))
                )
        if props:
            # literal path only: the object resource belongs to the links
            value, _ = self._prop_value(
                el, a, None, vocab, prefixes, lang
            )
            for p in props:
                self.statements.append(
                    Statement(cur_subj, Term(IRI, p), value)
                )

        if obj is not None:
            for r in rels:
                self.statements.append(Statement(cur_subj, Term(IRI, r), obj))
            for r in revs:
                self.statements.append(Statement(obj, Term(IRI, r), cur_subj))
            new_subj, child_pending = obj, None
        else:
            new_subj, child_pending = cur_subj, (rels, revs, cur_subj)

        for c in el.children:
            if isinstance(c, _El):
                self._walk(c, new_subj, vocab, prefixes, lang, child_pending)

    def _prop_value(
        self,
        el: _El,
        a: dict[str, str],
        obj: Term | None,
        vocab: str,
        prefixes: dict[str, str],
        lang: str,
    ) -> tuple[Term, bool]:
        """Core §7.5 step-11 precedence; returns (term, is_iri)."""
        dt_attr = a.get("datatype")
        if dt_attr is not None and dt_attr.strip():
            dt = self._expand(dt_attr, vocab, prefixes)
            lex = a.get("content", _text_content(el))
            if dt:
                return Term(LITERAL, lex, datatype=dt), False
            return Term(LITERAL, lex, lang=lang), False
        if dt_attr is not None:  # datatype="" forces a plain literal
            return (
                Term(LITERAL, a.get("content", _text_content(el)), lang=lang),
                False,
            )
        if "content" in a:
            return Term(LITERAL, a["content"], lang=lang), False
        if obj is not None:
            return obj, True
        return Term(LITERAL, _text_content(el), lang=lang), False


def has_rdfa_markers(html_text: str) -> bool:
    """Cheap substring gate (the web-scale common case: False, and no
    DOM is ever built). All markers require the '=' — a bare
    'typeof' would match virtually every page with inline JavaScript
    (the JS `typeof` operator) and defeat the fast path on the
    extraction hot loop; the cost is missing the rare
    whitespace-around-'=' attribute spelling. ``rel=`` is
    deliberately NOT a marker (every stylesheet link has one), so
    rel/rev-only RDFa that also lacks vocab/prefix/property/typeof
    goes undetected here — such documents can't mint predicates
    anyway except through full-IRI CURIEs, a corpus-negligible case."""
    return (
        "property=" in html_text
        or "typeof=" in html_text
        or "vocab=" in html_text
        or "prefix=" in html_text
    )


def parse_rdfa(
    html_text: str, base_iri: str = "", lax: bool = False,
    tree: "_El | None" = None,
) -> tuple[list[Statement], list[tuple[int, int, str]]]:
    """Extract RDFa Lite statements from an HTML document string.
    ``tree`` lets a caller that already built the shared DOM (see
    ``microdata.build_tree``) skip the re-parse."""
    if not has_rdfa_markers(html_text):
        return [], []
    from serd_spark.rdf.microdata import build_tree

    conv = _RdfaToRdf(base_iri)
    return conv.run(tree if tree is not None else build_tree(html_text)), []
