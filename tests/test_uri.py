"""RFC 3986 resolution/normalization — SURVEY.md §5.2 layer 1.

Covers the full RFC 3986 §5.4.1 (normal) and §5.4.2 (abnormal)
example sets against base ``http://a/b/c/d;p?q`` (the behavior of
the reference's serd_uri_resolve is this algorithm — ref:
src/uri.c#serd_uri_resolve).
"""

import pytest

from serd_spark.rdf import uri

BASE = "http://a/b/c/d;p?q"

NORMAL = [
    ("g:h", "g:h"),
    ("g", "http://a/b/c/g"),
    ("./g", "http://a/b/c/g"),
    ("g/", "http://a/b/c/g/"),
    ("/g", "http://a/g"),
    ("//g", "http://g"),
    ("?y", "http://a/b/c/d;p?y"),
    ("g?y", "http://a/b/c/g?y"),
    ("#s", "http://a/b/c/d;p?q#s"),
    ("g#s", "http://a/b/c/g#s"),
    ("g?y#s", "http://a/b/c/g?y#s"),
    (";x", "http://a/b/c/;x"),
    ("g;x", "http://a/b/c/g;x"),
    ("g;x?y#s", "http://a/b/c/g;x?y#s"),
    ("", "http://a/b/c/d;p?q"),
    (".", "http://a/b/c/"),
    ("./", "http://a/b/c/"),
    ("..", "http://a/b/"),
    ("../", "http://a/b/"),
    ("../g", "http://a/b/g"),
    ("../..", "http://a/"),
    ("../../", "http://a/"),
    ("../../g", "http://a/g"),
]

ABNORMAL = [
    ("../../../g", "http://a/g"),
    ("../../../../g", "http://a/g"),
    ("/./g", "http://a/g"),
    ("/../g", "http://a/g"),
    ("g.", "http://a/b/c/g."),
    (".g", "http://a/b/c/.g"),
    ("g..", "http://a/b/c/g.."),
    ("..g", "http://a/b/c/..g"),
    ("./../g", "http://a/b/g"),
    ("./g/.", "http://a/b/c/g/"),
    ("g/./h", "http://a/b/c/g/h"),
    ("g/../h", "http://a/b/c/h"),
    ("g;x=1/./y", "http://a/b/c/g;x=1/y"),
    ("g;x=1/../y", "http://a/b/c/y"),
    ("g?y/./x", "http://a/b/c/g?y/./x"),
    ("g?y/../x", "http://a/b/c/g?y/../x"),
    ("g#s/./x", "http://a/b/c/g#s/./x"),
    ("g#s/../x", "http://a/b/c/g#s/../x"),
    ("http:g", "http:g"),  # strict parser behavior
]


@pytest.mark.parametrize("ref,expected", NORMAL + ABNORMAL)
def test_rfc3986_examples(ref, expected):
    assert uri.resolve(BASE, ref) == expected


def test_resolve_no_base_passthrough():
    assert uri.resolve("", "rel/x") == "rel/x"
    assert uri.resolve("not-absolute", "rel/x") == "rel/x"


def test_resolve_against_urljoin_subset():
    """Cross-check against the stdlib on the overlapping subset."""
    from urllib.parse import urljoin

    bases = ["http://h/p/q", "https://h:8080/a/b?x=1", "http://h"]
    refs = ["x", "./x", "../x", "/x", "//other/x", "?q", "#f", "x/y/../z", ""]
    for b in bases:
        for r in refs:
            assert uri.resolve(b, r) == urljoin(b, r), (b, r)


@pytest.mark.parametrize(
    "raw,norm",
    [
        ("HTTP://Example.COM:80/a/./b/../c", "http://example.com/a/c"),
        ("https://Example.com:443/", "https://example.com/"),
        ("http://example.com", "http://example.com/"),
        ("http://example.com:8080/x", "http://example.com:8080/x"),
        ("http://ex.com/%7euser/%41", "http://ex.com/~user/A"),
        ("http://ex.com/a%2fb", "http://ex.com/a%2Fb"),
        ("http://ex.com/?q=%42#f%7e", "http://ex.com/?q=B#f~"),
        ("http://u:p@Ex.com/", "http://u:p@ex.com/"),
        ("ftp://Ex.com:21/f", "ftp://ex.com/f"),
        ("urn:ex:abc", "urn:ex:abc"),
    ],
)
def test_normalize(raw, norm):
    assert uri.normalize(raw) == norm


def test_normalize_idempotent():
    cases = [
        "HTTP://Example.COM:80/a/./b/../c",
        "http://ex.com/%7e%2f%41?x=%5a",
        "https://h/a//b///c",
    ]
    for c in cases:
        once = uri.normalize(c)
        assert uri.normalize(once) == once


def test_remove_dot_segments():
    assert uri.remove_dot_segments("/a/b/c/./../../g") == "/a/g"
    assert uri.remove_dot_segments("mid/content=5/../6") == "mid/6"


def test_fast_path_dot_segments_before_query_fragment():
    """Review finding: '/a/..#f' slipped past the fast-path guards."""
    from serd_spark.rdf.uri import normalize, resolve

    assert resolve("http://b/x", "http://e.com/a/..#f") == "http://e.com/#f"
    assert resolve("http://b/x", "http://e.com/a/.?q") == "http://e.com/a/?q"
    assert normalize("http://e.com/a/..#f") == "http://e.com/#f"
    assert normalize("http://e.com/a/.?q") == "http://e.com/a/?q"
