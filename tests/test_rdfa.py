"""RDFa Lite extraction (rdf/rdfa.py) — attribute semantics, CURIE
expansion, precedence rules, and the extract_document integration."""

from serd_spark.rdf.model import BLANK, IRI, LITERAL, RDF_TYPE
from serd_spark.rdf.rdfa import parse_rdfa

BASE = "https://page.example/dir/page"


def _set(stmts):
    return {
        (
            (s.subject.kind, s.subject.value),
            s.predicate.value,
            (s.object.kind, s.object.value, s.object.datatype, s.object.lang),
        )
        for s in stmts
    }


def test_vocab_typeof_property_about():
    html = (
        '<div vocab="http://schema.org/" about="#it" typeof="Thing">'
        '<span property="name">X</span>'
        '<a property="url" href="/y">y</a></div>'
    )
    stmts, errs = parse_rdfa(html, BASE)
    assert errs == []
    got = _set(stmts)
    it = (IRI, BASE + "#it")
    assert (it, RDF_TYPE, (IRI, "http://schema.org/Thing", "", "")) in got
    assert (it, "http://schema.org/name", (LITERAL, "X", "", "")) in got
    assert (
        it,
        "http://schema.org/url",
        (IRI, "https://page.example/y", "", ""),
    ) in got


def test_open_graph_meta_initial_context():
    html = (
        "<head>"
        '<meta property="og:title" content="The Title"/>'
        '<meta property="og:type" content="article"/>'
        "</head>"
    )
    stmts, _ = parse_rdfa(html, BASE)
    got = _set(stmts)
    doc = (IRI, BASE)
    assert (doc, "http://ogp.me/ns#title", (LITERAL, "The Title", "", "")) in got
    assert (doc, "http://ogp.me/ns#type", (LITERAL, "article", "", "")) in got


def test_prefix_attr_and_unknown_prefix():
    html = (
        '<div prefix="ex: http://ex.org/ns#">'
        '<span property="ex:p">v</span>'
        '<span property="mailto:bob@x.example">w</span>'
        '<span property="bare">ignored: no vocab</span></div>'
    )
    stmts, _ = parse_rdfa(html, BASE)
    got = _set(stmts)
    preds = {p for _, p, _ in got}
    assert "http://ex.org/ns#p" in preds
    assert "mailto:bob@x.example" in preds  # unknown prefix: IRI as-is
    assert not any(p.endswith("bare") for p in preds)  # bare term dropped


def test_property_typeof_creates_typed_bnode():
    html = (
        '<div vocab="http://schema.org/" about="#it">'
        '<div property="author" typeof="Person">'
        '<span property="name">Ada</span></div></div>'
    )
    stmts, _ = parse_rdfa(html, BASE)
    got = _set(stmts)
    # find the bnode that is the author
    nodes = [
        o for s, p, o in got
        if p == "http://schema.org/author" and o[0] == BLANK
    ]
    assert len(nodes) == 1
    bn = nodes[0][:2]
    assert (bn, RDF_TYPE, (IRI, "http://schema.org/Person", "", "")) in got
    # the nested name attaches to the bnode, not the outer subject
    assert (bn, "http://schema.org/name", (LITERAL, "Ada", "", "")) in got


def test_content_datatype_lang_precedence():
    html = (
        '<div vocab="http://schema.org/" about="#it" lang="en">'
        '<span property="a" content="c">text</span>'
        '<span property="b" datatype="xsd:integer">7</span>'
        '<span property="c" datatype="">plain</span>'
        '<span property="d">tagged</span>'
        '<span property="e" content="c2" resource="#r">x</span></div>'
    )
    stmts, _ = parse_rdfa(html, BASE)
    by_pred = {p.rsplit("/", 1)[-1]: o for _, p, o in _set(stmts)}
    assert by_pred["a"] == (LITERAL, "c", "", "en")
    assert by_pred["b"] == (
        LITERAL, "7", "http://www.w3.org/2001/XMLSchema#integer", "",
    )
    assert by_pred["c"] == (LITERAL, "plain", "", "en")
    assert by_pred["d"] == (LITERAL, "tagged", "", "en")
    assert by_pred["e"] == (LITERAL, "c2", "", "en")  # content beats resource


def test_resource_chains_subject():
    html = (
        '<div vocab="http://schema.org/" about="#it">'
        '<div property="publisher" resource="#org">'
        '<span property="name">Acme</span></div></div>'
    )
    stmts, _ = parse_rdfa(html, BASE)
    got = _set(stmts)
    org = (IRI, BASE + "#org")
    assert (
        (IRI, BASE + "#it"),
        "http://schema.org/publisher",
        (*org, "", ""),
    ) in got
    assert (org, "http://schema.org/name", (LITERAL, "Acme", "", "")) in got


def test_prefilter_and_plain_page():
    assert parse_rdfa("<html><body><p>hi</p></body></html>", BASE) == ([], [])


def test_extract_document_integration():
    from serd_spark.rdf.html_islands import extract_document

    html = (
        "<html><head>"
        '<script type="application/ld+json">'
        '{"@id":"https://e.org/a","https://e.org/p":"v"}</script>'
        "</head><body>"
        '<div vocab="http://schema.org/" typeof="Thing" about="#t">'
        '<span property="name">N</span></div>'
        "</body></html>"
    )
    triples, errors = extract_document(html, BASE, lax=True)
    assert errors == []
    syntaxes = {t[1] for t in triples}
    assert syntaxes == {"jsonld", "rdfa"}
    rdfa = [st for _, syn, st in triples if syn == "rdfa"]
    assert len(rdfa) == 2  # type + name


def test_prefilter_ignores_js_typeof_operator():
    html = '<script>if (typeof window !== "undefined") { x(); }</script>'
    assert parse_rdfa(html, BASE) == ([], [])
    # but the attribute spelling still gates in
    html2 = '<div vocab="http://s.org/" typeof="T"></div>'
    stmts, _ = parse_rdfa(html2, BASE)
    assert len(stmts) == 1


def test_rdfa_fuzz_never_raises():
    """Adversarial/malformed HTML must never raise out of the lax
    extraction path (it runs inside the fused UDF over every page)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from serd_spark.rdf.html_islands import extract_document

    frag = st.sampled_from([
        "<div", ">", 'typeof="', 'property=', 'vocab=""', "</span>",
        '<span property="a:b"', '<meta content="x"', "&", "&#x41;",
        'prefix="p: q:"', 'about="%zz"', "<p>", "</p>", '"', "'",
        'datatype="x"', "resource=", '<a href="h t">', "\x00", "é",
        '<div typeof="A B" property="c d">',
    ])

    @settings(max_examples=150, deadline=None)
    @given(st.lists(frag, min_size=0, max_size=12))
    def run(parts):
        html = "".join(parts)
        triples, errors = extract_document(html, "https://f.example/x", lax=True)
        for _, syn, stmt in triples:
            assert stmt.subject is not None and stmt.predicate is not None

    run()


def test_rdfa_deep_nesting_is_error_not_crash():
    from serd_spark.rdf.html_islands import extract_document

    import pytest

    html = '<div typeof="T" vocab="http://s.org/">' * 20000
    triples, errors = extract_document(html, "https://f.example/x", lax=True)
    # lax: one depth error, attributed to the extractor whose gate
    # fired (rdfa — there is no itemscope on this page)
    assert [(e[1], e[4]) for e in errors] == [
        ("rdfa", "DOM nesting depth exceeded")
    ]
    assert triples == []
    with pytest.raises(RecursionError):
        extract_document(html, "https://f.example/x", lax=False)


def test_rel_with_href_links_and_chains():
    html = (
        '<div vocab="http://schema.org/" about="#me">'
        '<a rel="author" href="/alice">'
        '<span property="name">Alice</span></a></div>'
    )
    stmts, _ = parse_rdfa(html, BASE)
    got = _set(stmts)
    me = (IRI, BASE + "#me")
    alice = (IRI, "https://page.example/alice")
    assert (me, "http://schema.org/author", alice + ("", "")) in got
    # the object resource becomes the descendants' subject
    assert (alice, "http://schema.org/name", (LITERAL, "Alice", "", "")) in got


def test_rev_reverses_subject_and_object():
    html = (
        '<div about="#paper" prefix="dc: http://purl.org/dc/terms/">'
        '<span rev="dc:creator" resource="#me"></span></div>'
    )
    stmts, _ = parse_rdfa(html, BASE)
    got = _set(stmts)
    assert (
        (IRI, BASE + "#me"),
        "http://purl.org/dc/terms/creator",
        (IRI, BASE + "#paper", "", ""),
    ) in got


def test_incomplete_triples_complete_per_branch():
    # @rel with no object: each child branch establishing a node
    # completes the pending link once
    html = (
        '<div vocab="http://xmlns.com/foaf/0.1/" about="#me" rel="knows">'
        '<span about="#alice">a</span>'
        '<span about="#bob">b</span></div>'
    )
    stmts, _ = parse_rdfa(html, BASE)
    got = _set(stmts)
    me = (IRI, BASE + "#me")
    knows = "http://xmlns.com/foaf/0.1/knows"
    assert (me, knows, (IRI, BASE + "#alice", "", "")) in got
    assert (me, knows, (IRI, BASE + "#bob", "", "")) in got
    assert len(stmts) == 2


def test_incomplete_completes_at_typed_blank_node():
    html = (
        '<div vocab="http://schema.org/" about="#post" rel="author">'
        '<span typeof="Person"><span property="name">X</span></span>'
        "</div>"
    )
    stmts, _ = parse_rdfa(html, BASE)
    got = _set(stmts)
    bnodes = {s.object.value for s in stmts if s.object.kind == BLANK}
    assert len(bnodes) == 1
    b = bnodes.pop()
    assert ((IRI, BASE + "#post"), "http://schema.org/author",
            (BLANK, b, "", "")) in got
    assert ((BLANK, b), RDF_TYPE,
            (IRI, "http://schema.org/Person", "", "")) in got
    assert ((BLANK, b), "http://schema.org/name",
            (LITERAL, "X", "", "")) in got


def test_pending_not_reused_below_completing_node():
    # the inner @about completes the pending link; a deeper node must
    # NOT complete it again
    html = (
        '<div vocab="http://xmlns.com/foaf/0.1/" about="#me" rel="knows">'
        '<div about="#alice"><span about="#deep">d</span></div></div>'
    )
    stmts, _ = parse_rdfa(html, BASE)
    knows = [s for s in stmts if s.predicate.value.endswith("knows")]
    assert len(knows) == 1
    assert knows[0].object.value == BASE + "#alice"


def test_rel_and_property_share_an_element():
    # the resource feeds @rel; @property takes the literal path
    html = (
        '<div vocab="http://xmlns.com/foaf/0.1/" about="#me">'
        '<a rel="foaf:knows" property="foaf:nick" href="/bob">Bobby</a>'
        "</div>"
    )
    stmts, _ = parse_rdfa(html, BASE)
    got = _set(stmts)
    me = (IRI, BASE + "#me")
    assert (me, "http://xmlns.com/foaf/0.1/knows",
            (IRI, "https://page.example/bob", "", "")) in got
    assert (me, "http://xmlns.com/foaf/0.1/nick",
            (LITERAL, "Bobby", "", "")) in got


def test_bare_rel_terms_ignored_when_property_present():
    # rel=stylesheet next to a property must not mint vocab+stylesheet
    html = (
        '<div vocab="http://schema.org/">'
        '<link property="url" rel="stylesheet" href="/style.css"/></div>'
    )
    stmts, _ = parse_rdfa(html, BASE)
    preds = {s.predicate.value for s in stmts}
    assert preds == {"http://schema.org/url"}
    # without @property the bare term expands through @vocab (Core)
    html2 = (
        '<div vocab="http://xmlns.com/foaf/0.1/" about="#me">'
        '<a rel="knows" href="/bob">b</a></div>'
    )
    stmts2, _ = parse_rdfa(html2, BASE)
    assert {s.predicate.value for s in stmts2} == {
        "http://xmlns.com/foaf/0.1/knows"
    }


def test_rel_without_vocab_or_prefix_is_inert():
    # plain HTML link types never become triples without a vocab
    html = '<div about="#x"><a rel="stylesheet next" href="/s.css">s</a></div>'
    stmts, _ = parse_rdfa(html, BASE)
    assert stmts == []


def test_pending_completes_at_linking_descendant_object():
    # a descendant that itself carries @rel + an object resource
    # establishes that object — the ancestor's pending link completes
    # at it instead of being silently dropped
    html = (
        '<div vocab="http://xmlns.com/foaf/0.1/" about="#me" rel="knows">'
        '<a rel="homepage" href="/bob">b</a></div>'
    )
    stmts, _ = parse_rdfa(html, BASE)
    got = _set(stmts)
    me = (IRI, BASE + "#me")
    bob = (IRI, "https://page.example/bob", "", "")
    assert (me, "http://xmlns.com/foaf/0.1/knows", bob) in got
    assert (me, "http://xmlns.com/foaf/0.1/homepage", bob) in got
    assert len(stmts) == 2


def test_about_and_resource_take_curies():
    """Core §5 SafeCURIEorCURIEorIRI on @about/@resource: plain
    CURIEs with declared prefixes expand; @href stays IRI-only."""
    html = (
        '<div prefix="ex: http://ex.org/ns#" about="ex:alice">'
        '<span property="ex:knows" resource="ex:bob"></span></div>'
    )
    stmts, _ = parse_rdfa(html, BASE)
    got = _set(stmts)
    assert (
        (IRI, "http://ex.org/ns#alice"),
        "http://ex.org/ns#knows",
        (IRI, "http://ex.org/ns#bob", "", ""),
    ) in got


def test_safe_curie_unwraps_and_unknown_prefix_ignored():
    html = (
        '<div prefix="ex: http://ex.org/ns#" about="[ex:a]">'
        '<span property="ex:p" resource="[nope:b]">text</span></div>'
    )
    stmts, _ = parse_rdfa(html, BASE)
    got = _set(stmts)
    # subject is the unwrapped safe CURIE; the unknown-prefix safe
    # CURIE resource is IGNORED, so the property falls back to the
    # text-content literal (step-11 precedence with no resource)
    assert (
        (IRI, "http://ex.org/ns#a"),
        "http://ex.org/ns#p",
        (LITERAL, "text", "", ""),
    ) in got


def test_blank_node_about_and_resource_are_scoped():
    html = (
        '<div prefix="ex: http://ex.org/ns#" about="_:n1">'
        '<span property="ex:p" resource="_:n2"></span>'
        '<span property="ex:q" resource="_:n1"></span></div>'
    )
    stmts, _ = parse_rdfa(html, BASE)
    by_pred = {s.predicate.value: s for s in stmts}
    p = by_pred["http://ex.org/ns#p"]
    q = by_pred["http://ex.org/ns#q"]
    assert p.subject.kind == BLANK and p.object.kind == BLANK
    # _:n1 maps to ONE parser blank label wherever it appears …
    assert q.object.value == p.subject.value == q.subject.value
    # … distinct from _:n2's
    assert p.object.value != p.subject.value
    # labels use the parser's own r=N family (island scoping intact)
    assert p.subject.value.startswith("r=")
