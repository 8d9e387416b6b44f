"""Turtle grammar edge cases (conformance-breadth regression suite —
the tricky terminals SURVEY.md §7 names as where P/R is won or lost:
PN_LOCAL escapes/percents/dots, \\u escapes, unicode PN_CHARS,
numeric forms, long strings, comments, case sensitivity)."""

import pytest

from serd_spark.rdf.turtle import parse_turtle

GOOD = [
    ("unicode-escape-iri", r"<http://e/é> <http://p> <http://o> .",
     lambda s: s[0].subject.value == "http://e/é"),
    ("long-escape-iri", r"<http://e/\U0001F600> <http://p> <http://o> .",
     lambda s: s[0].subject.value == "http://e/\U0001F600"),
    ("pn-local-escapes", r"@prefix e: <http://e/> . e:a\~b e:p e:o .",
     lambda s: s[0].subject.value == "http://e/a~b"),
    ("pn-local-pct", "@prefix e: <http://e/> . e:x%20y e:p e:o .",
     lambda s: s[0].subject.value == "http://e/x%20y"),
    ("pn-local-dots", "@prefix e: <http://e/> . e:a.b.c e:p e:o .",
     lambda s: s[0].subject.value == "http://e/a.b.c"),
    ("unicode-pn-chars", "@prefix e: <http://e/> . e:café e:p e:o .",
     lambda s: s[0].subject.value == "http://e/café"),
    ("numeric-forms", "<http://s> <http://p> 1.5e0, -.5, +7, 00 .",
     lambda s: [t.object.value for t in s] == ["1.5e0", "-.5", "+7", "00"]),
    ("comment-mid-stmt", "<http://s> # cmt\n <http://p> # c2\n <http://o> .",
     lambda s: len(s) == 1),
    ("empty-prefix-redefine",
     "@prefix : <http://a/> . :x :y :z . @prefix : <http://b/> . :x :y :z .",
     lambda s: (s[0].subject.value, s[1].subject.value)
     == ("http://a/x", "http://b/x")),
    ("string-escapes", '<http://s> <http://p> "a\\tb\\u0041\\\\" .',
     lambda s: s[0].object.value == "a\tbA\\"),
    ("long-string-quotes", '<http://s> <http://p> """a"b""c\nd""" .',
     lambda s: s[0].object.value == 'a"b""c\nd'),
    ("single-quotes", "<http://s> <http://p> 'sq' , '''lsq''' .",
     lambda s: [t.object.value for t in s] == ["sq", "lsq"]),
    ("anon-subject", "[] <http://p> <http://o> .", lambda s: len(s) == 1),
    ("anon-both",
     "[ <http://p1> <http://o1> ] <http://p> [ <http://q> 'v' ] .",
     lambda s: len(s) == 3),
    ("nested-collection", "<http://s> <http://p> (1 (2 3) ()) .",
     lambda s: len(s) > 5),
    ("blank-label-dots", "_:a.b <http://p> <http://o> .",
     lambda s: s[0].subject.value == "a.b"),
    ("lang-subtags", '<http://s> <http://p> "x"@en-US-x-private .',
     lambda s: s[0].object.lang == "en-US-x-private"),
    ("base-then-prefix-rel",
     "@base <http://h/dir/> . @prefix r: <rel/> . r:x <p> r:y .",
     lambda s: s[0].subject.value == "http://h/dir/rel/x"),
    ("sparql-case-insensitive", "pReFiX e: <http://e/>\ne:s e:p e:o .",
     lambda s: s[0].subject.value == "http://e/s"),
    ("true-false-objects", "<http://s> <http://p> true, false .",
     lambda s: [t.object.value for t in s] == ["true", "false"]),
    ("iri-with-query", "<http://e/x?a=1&b=2#f> <http://p> <http://o> .",
     lambda s: s[0].subject.value == "http://e/x?a=1&b=2#f"),
    # PNAME_NS alone is a valid term (empty prefix AND empty local)
    ("colon-only-pname", "@prefix : <http://e/> . :s :p : .",
     lambda s: s[0].object.value == "http://e/"),
    ("digit-start-local", "@prefix e: <http://e/> . e:123 e:p e:o .",
     lambda s: s[0].subject.value == "http://e/123"),
    # "1." lexes as INTEGER 1 + statement terminator
    ("integer-then-dot", "<http://s> <http://p> 1.",
     lambda s: s[0].object.value == "1"),
    ("prefixed-datatype",
     '@prefix x: <http://www.w3.org/2001/XMLSchema#> . '
     '<http://s> <http://p> "1"^^x:int .',
     lambda s: s[0].object.datatype
     == "http://www.w3.org/2001/XMLSchema#int"),
]

BAD = [
    ("turtle-keyword-case", "@PREFIX e: <http://e/> . e:s e:p e:o ."),
    ("pn-local-trailing-dot", "@prefix e: <http://e/> . e:a. e:p e:o ."),
    ("dot-only", "."),
    ("unclosed-string", '<http://s> <http://p> "x .'),
    ("double-dot-number", "<http://s> <http://p> 1.2.3 ."),
    ("undefined-prefix", "e:s <http://p> <http://o> ."),
    # sparqlPrefix takes NO trailing dot — the '.' is then a bare
    # statement terminator, which is a syntax error
    ("sparql-prefix-with-dot", "PREFIX e: <http://e/> .\ne:s e:p e:o ."),
    ("dangling-datatype-carets", '<http://s> <http://p> "x"^^ .'),
    ("empty-object-item", "<http://s> <http://p> <http://o> ,, ."),
    ("anon-as-predicate",
     "[ <http://p> <http://o> ] [ <http://q> 1 ] <http://o2> ."),
    ("dangling-langtag", '<http://s> <http://p> "x"@ .'),
]


@pytest.mark.parametrize("name,doc,check", GOOD, ids=[c[0] for c in GOOD])
def test_edge_good(name, doc, check):
    stmts, errs = parse_turtle(doc, "http://base/")
    assert errs == []
    assert check(stmts)


@pytest.mark.parametrize("name,doc", BAD, ids=[c[0] for c in BAD])
def test_edge_bad(name, doc):
    stmts, errs = parse_turtle(doc, "http://base/", lax=True)
    assert errs, f"{name} should have been rejected"
