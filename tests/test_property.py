"""Property-based tests (SURVEY.md §5.2 layer 4) — substitute for
the reference's fuzzing harness (upstream fuzzes the reader via
OSS-Fuzz; we use Hypothesis offline)."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from serd_spark.rdf import uri
from serd_spark.rdf.model import BLANK, IRI, LITERAL, Statement, Term
from serd_spark.rdf.ntriples import parse_ntriples, write_ntriples
from serd_spark.rdf.turtle import parse_turtle

# text without surrogates (not encodable) — everything else must
# survive a write→parse round trip byte-exactly
_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=80
)
_iri_chars = st.text(
    alphabet=string.ascii_letters + string.digits + "/._-~%",
    min_size=1,
    max_size=30,
)
_label = st.from_regex(r"[A-Za-z][A-Za-z0-9]{0,10}", fullmatch=True)
_lang = st.from_regex(r"[a-z]{2}(-[A-Za-z0-9]{1,4})?", fullmatch=True)


@st.composite
def terms(draw, allow_literal=True):
    kind = draw(
        st.sampled_from([IRI, BLANK, LITERAL] if allow_literal else [IRI, BLANK])
    )
    if kind == IRI:
        return Term(IRI, "http://h/" + draw(_iri_chars))
    if kind == BLANK:
        return Term(BLANK, draw(_label))
    which = draw(st.integers(0, 2))
    value = draw(_text)
    if which == 0:
        return Term(LITERAL, value)
    if which == 1:
        return Term(LITERAL, value, "", draw(_lang))
    return Term(LITERAL, value, "http://dt/" + draw(_iri_chars), "")


@st.composite
def statements(draw):
    return Statement(
        draw(terms(allow_literal=False)),
        Term(IRI, "http://p/" + draw(_iri_chars)),
        draw(terms()),
    )


@given(st.lists(statements(), max_size=12))
@settings(max_examples=150, deadline=None)
def test_nt_write_parse_round_trip(stmts):
    out = write_ntriples(stmts)
    parsed, errs = parse_ntriples(out)
    assert errs == []
    # fixpoint: writing the parse of the output reproduces it
    assert write_ntriples(parsed) == out
    # and values survive (blank labels are canonicalized on write —
    # compare them by kind only, everything else byte-exact)
    def shape(s):
        o = s.object
        return (
            s.subject.kind,
            s.predicate.value,
            o.kind,
            o.value if o.kind != BLANK else None,
            o.datatype,
            o.lang,
        )

    assert [shape(s) for s in stmts] == [shape(s) for s in parsed]


@given(st.lists(statements(), min_size=1, max_size=8))
@settings(max_examples=80, deadline=None)
def test_nt_output_reparses_as_turtle(stmts):
    """N-Triples is a subset of Turtle — our Turtle parser must
    accept everything our NT writer produces."""
    out = write_ntriples(stmts)
    t_stmts, errs = parse_turtle(out)
    assert errs == []
    assert len(t_stmts) == len(stmts)


_scheme = st.sampled_from(["http", "https"])
_host = st.from_regex(r"[a-z][a-z0-9.-]{0,15}", fullmatch=True)
# non-empty path segments only: urljoin collapses "//" inside paths,
# the RFC algorithm (and we) preserve them — out of the overlap set
_path = st.from_regex(r"(/[A-Za-z0-9._~-]{1,6}){0,4}", fullmatch=True)
_ref = st.from_regex(
    r"((\.\./|\./)?[A-Za-z0-9._~-]{0,8}(/[A-Za-z0-9._~-]{0,5}){0,3}"
    r"(\?[a-z0-9=&]{0,8})?(#[a-z0-9]{0,5})?)",
    fullmatch=True,
)


@given(_scheme, _host, _path, _ref)
@settings(max_examples=200, deadline=None)
def test_resolve_matches_urljoin(scheme, host, path, ref):
    if ref.endswith(("#", "?")) or "?#" in ref or "//" in ref:
        # out of the overlap set: empty trailing fragment/query (we
        # keep it per RFC 3986 — empty ≠ absent; urljoin drops it)
        # and empty path segments (urljoin collapses "//", the RFC
        # algorithm preserves them)
        return
    base = f"{scheme}://{host}{path}"
    assert uri.resolve(base, ref) == __import__("urllib.parse", fromlist=["x"]).urljoin(
        base, ref
    )


@given(st.text(max_size=60))
@settings(max_examples=100, deadline=None)
def test_normalize_idempotent(s):
    try:
        once = uri.normalize(s)
    except Exception:  # pragma: no cover
        raise AssertionError(f"normalize raised on {s!r}")
    assert uri.normalize(once) == once
