"""RDF/XML parser + writer (rdf/rdfxml.py)."""

import pytest

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
from serd_spark.rdf.ntriples import write_ntriples
from serd_spark.rdf.rdfxml import parse_rdfxml, write_rdfxml

EX = "http://example.org/"
S = "http://schema.org/"


def _set(stmts):
    return set(write_ntriples(stmts).splitlines())


def test_basic_description_and_typed_node():
    doc = f"""<?xml version="1.0"?>
    <rdf:RDF xmlns:rdf="{RDF_NS}" xmlns:s="{S}">
      <rdf:Description rdf:about="{EX}a">
        <s:name>Alice</s:name>
      </rdf:Description>
      <s:Person rdf:about="{EX}b">
        <s:age rdf:datatype="http://www.w3.org/2001/XMLSchema#integer">7</s:age>
      </s:Person>
    </rdf:RDF>"""
    stmts, errs = parse_rdfxml(doc)
    assert errs == []
    assert set(stmts) == {
        Statement(iri(EX + "a"), iri(S + "name"), literal("Alice")),
        Statement(iri(EX + "b"), iri(RDF_NS + "type"), iri(S + "Person")),
        Statement(
            iri(EX + "b"), iri(S + "age"),
            literal("7", "http://www.w3.org/2001/XMLSchema#integer"),
        ),
    }


def test_property_attributes_and_lang():
    doc = f"""<rdf:RDF xmlns:rdf="{RDF_NS}" xmlns:s="{S}">
      <rdf:Description rdf:about="{EX}a" s:name="Chat" xml:lang="fr"
                       rdf:type="{S}Thing"/>
    </rdf:RDF>"""
    stmts, _ = parse_rdfxml(doc)
    assert set(stmts) == {
        Statement(iri(EX + "a"), iri(S + "name"), literal("Chat", "", "fr")),
        Statement(iri(EX + "a"), iri(RDF_NS + "type"), iri(S + "Thing")),
    }


def test_nested_resource_nodeid_and_blank():
    doc = f"""<rdf:RDF xmlns:rdf="{RDF_NS}" xmlns:s="{S}">
      <rdf:Description rdf:about="{EX}a">
        <s:knows rdf:resource="{EX}b"/>
        <s:knows rdf:nodeID="n1"/>
        <s:address s:postalCode="12345"/>
        <s:spouse><s:Person rdf:about="{EX}c"/></s:spouse>
      </rdf:Description>
    </rdf:RDF>"""
    stmts, _ = parse_rdfxml(doc)
    st = set(stmts)
    assert Statement(iri(EX + "a"), iri(S + "knows"), iri(EX + "b")) in st
    assert Statement(iri(EX + "a"), iri(S + "knows"), blank("n1")) in st
    assert Statement(iri(EX + "a"), iri(S + "spouse"), iri(EX + "c")) in st
    assert Statement(iri(EX + "c"), iri(RDF_NS + "type"), iri(S + "Person")) in st
    # the omitted-blank address node carries the property attribute
    addr = [x for x in stmts if x.predicate.value == S + "address"]
    assert len(addr) == 1 and addr[0].object.kind == BLANK
    b = addr[0].object
    assert Statement(b, iri(S + "postalCode"), literal("12345")) in st


def test_rdf_id_and_base_scoping():
    doc = f"""<rdf:RDF xmlns:rdf="{RDF_NS}" xmlns:s="{S}"
                 xml:base="http://example.org/dir/doc">
      <rdf:Description rdf:ID="frag"><s:name>X</s:name></rdf:Description>
      <rdf:Description rdf:about="rel"><s:name>Y</s:name></rdf:Description>
    </rdf:RDF>"""
    stmts, _ = parse_rdfxml(doc)
    subjects = {x.subject.value for x in stmts}
    assert subjects == {
        "http://example.org/dir/doc#frag",
        "http://example.org/dir/rel",
    }


def test_duplicate_rdf_id_rejected():
    doc = f"""<rdf:RDF xmlns:rdf="{RDF_NS}" xmlns:s="{S}" xml:base="{EX}d">
      <rdf:Description rdf:ID="x"><s:a>1</s:a></rdf:Description>
      <rdf:Description rdf:ID="x"><s:a>2</s:a></rdf:Description>
    </rdf:RDF>"""
    with pytest.raises(ParseError):
        parse_rdfxml(doc)
    stmts, errs = parse_rdfxml(doc, lax=True)
    assert len(errs) == 1 and "duplicate" in errs[0][2]


def test_li_containers():
    doc = f"""<rdf:RDF xmlns:rdf="{RDF_NS}" xmlns:s="{S}">
      <rdf:Description rdf:about="{EX}bag">
        <rdf:li>one</rdf:li>
        <rdf:li>two</rdf:li>
      </rdf:Description>
    </rdf:RDF>"""
    stmts, _ = parse_rdfxml(doc)
    assert set(stmts) == {
        Statement(iri(EX + "bag"), iri(RDF_NS + "_1"), literal("one")),
        Statement(iri(EX + "bag"), iri(RDF_NS + "_2"), literal("two")),
    }


def test_parsetype_resource_collection_literal():
    doc = f"""<rdf:RDF xmlns:rdf="{RDF_NS}" xmlns:s="{S}">
      <rdf:Description rdf:about="{EX}a">
        <s:addr rdf:parseType="Resource">
          <s:city>Oz</s:city>
        </s:addr>
        <s:items rdf:parseType="Collection">
          <rdf:Description rdf:about="{EX}i1"/>
          <rdf:Description rdf:about="{EX}i2"/>
        </s:items>
        <s:xml rdf:parseType="Literal"><b>bold</b> tail</s:xml>
        <s:empty rdf:parseType="Collection"/>
      </rdf:Description>
    </rdf:RDF>"""
    stmts, _ = parse_rdfxml(doc)
    st = set(stmts)
    # Resource: anonymous struct
    addr = next(x for x in stmts if x.predicate.value == S + "addr")
    assert addr.object.kind == BLANK
    assert Statement(addr.object, iri(S + "city"), literal("Oz")) in st
    # Collection: first/rest chain ending in nil
    head = next(x for x in stmts if x.predicate.value == S + "items").object
    firsts = {
        x.subject: x.object for x in stmts
        if x.predicate.value == RDF_NS + "first"
    }
    rests = {
        x.subject: x.object for x in stmts
        if x.predicate.value == RDF_NS + "rest"
    }
    assert firsts[head].value == EX + "i1"
    second = rests[head]
    assert firsts[second].value == EX + "i2"
    assert rests[second].value == RDF_NS + "nil"
    # Literal: XML literal with serialized children
    lit = next(x for x in stmts if x.predicate.value == S + "xml").object
    assert lit.datatype == RDF_NS + "XMLLiteral"
    assert "bold" in lit.value and "tail" in lit.value
    # empty collection → rdf:nil directly
    empty = next(x for x in stmts if x.predicate.value == S + "empty").object
    assert empty == iri(RDF_NS + "nil")


def test_reification():
    doc = f"""<rdf:RDF xmlns:rdf="{RDF_NS}" xmlns:s="{S}" xml:base="{EX}d">
      <rdf:Description rdf:about="{EX}a">
        <s:name rdf:ID="st1">Alice</s:name>
      </rdf:Description>
    </rdf:RDF>"""
    stmts, _ = parse_rdfxml(doc)
    r = iri(EX + "d#st1")
    st = set(stmts)
    assert Statement(iri(EX + "a"), iri(S + "name"), literal("Alice")) in st
    assert Statement(r, iri(RDF_NS + "type"), iri(RDF_NS + "Statement")) in st
    assert Statement(r, iri(RDF_NS + "subject"), iri(EX + "a")) in st
    assert Statement(r, iri(RDF_NS + "predicate"), iri(S + "name")) in st
    assert Statement(r, iri(RDF_NS + "object"), literal("Alice")) in st


def test_doctype_and_syntax_errors():
    with pytest.raises(ParseError, match="DTD"):
        parse_rdfxml('<!DOCTYPE foo [<!ENTITY a "b">]><x/>')
    with pytest.raises(ParseError) as ei:
        parse_rdfxml("<rdf:RDF xmlns:rdf='%s'><broken" % RDF_NS)
    assert ei.value.line >= 1


def test_old_terms_and_strict_lax():
    doc = f"""<rdf:RDF xmlns:rdf="{RDF_NS}" xmlns:s="{S}">
      <rdf:Description rdf:about="{EX}a" rdf:bagID="z">
        <s:name>A</s:name>
      </rdf:Description>
    </rdf:RDF>"""
    with pytest.raises(ParseError):
        parse_rdfxml(doc)
    stmts, errs = parse_rdfxml(doc, lax=True)
    assert len(errs) == 1
    # lax skips the bad attribute but keeps the rest of the node
    assert Statement(iri(EX + "a"), iri(S + "name"), literal("A")) in stmts


def test_mixed_content_rejected():
    doc = f"""<rdf:RDF xmlns:rdf="{RDF_NS}" xmlns:s="{S}">
      <rdf:Description rdf:about="{EX}a">
        <s:p>text<rdf:Description rdf:about="{EX}b"/></s:p>
      </rdf:Description>
    </rdf:RDF>"""
    with pytest.raises(ParseError, match="mixed"):
        parse_rdfxml(doc)


def test_writer_round_trip():
    stmts = [
        Statement(iri(EX + "a"), iri(S + "name"), literal("Al & <ice>")),
        Statement(iri(EX + "a"), iri(S + "note"), literal("bonjour", "", "fr")),
        Statement(
            iri(EX + "a"), iri(S + "age"),
            literal("41", "http://www.w3.org/2001/XMLSchema#integer"),
        ),
        Statement(iri(EX + "a"), iri(S + "knows"), blank("inner=1")),
        Statement(blank("inner=1"), iri(S + "name"), literal("Bob")),
        Statement(iri(EX + "a"), iri(S + "link"), iri(EX + "b?x=1&y=2")),
    ]
    xml = write_rdfxml(stmts)
    back, errs = parse_rdfxml(xml)
    assert errs == []
    assert _set(back) == _set(stmts)


def test_writer_rejects_inexpressible():
    with pytest.raises(ValueError, match="named-graph"):
        write_rdfxml([
            Statement(iri(EX + "a"), iri(S + "p"), literal("x"), iri(EX + "g")),
        ])
    with pytest.raises(ValueError, match="NCName"):
        write_rdfxml([
            Statement(iri(EX + "a"), iri("http://x.org/p/"), literal("x")),
        ])
    with pytest.raises(ValueError, match="U\\+0001"):
        write_rdfxml([
            Statement(iri(EX + "a"), iri(S + "p"), literal("a\x01b")),
        ])


def test_depth_bound():
    open_tags = "".join(
        f'<s:p{i} rdf:parseType="Resource">' for i in range(300)
    )
    close_tags = "".join(f"</s:p{i}>" for i in reversed(range(300)))
    doc = (
        f'<rdf:RDF xmlns:rdf="{RDF_NS}" xmlns:s="{S}">'
        f'<rdf:Description rdf:about="{EX}a">{open_tags}{close_tags}'
        f"</rdf:Description></rdf:RDF>"
    )
    with pytest.raises(ParseError, match="deep"):
        parse_rdfxml(doc)


def test_html_island_extraction():
    from serd_spark.rdf.html_islands import extract_document

    html = f"""<html><head>
    <script type="application/rdf+xml">
    <rdf:RDF xmlns:rdf="{RDF_NS}" xmlns:s="{S}">
      <rdf:Description rdf:about="{EX}a"><s:name>A</s:name></rdf:Description>
    </rdf:RDF>
    </script></head><body/></html>"""
    triples, errs = extract_document(html, EX + "page", lax=True)
    assert errs == []
    assert [(i, syn, st) for i, syn, st in triples] == [
        (0, "rdfxml",
         Statement(iri(EX + "a"), iri(S + "name"), literal("A"))),
    ]


def test_relative_resolution_against_page_base():
    # rdf:about/rdf:resource resolve against the passed base
    doc = f"""<rdf:RDF xmlns:rdf="{RDF_NS}" xmlns:s="{S}">
      <rdf:Description rdf:about="x"><s:p rdf:resource="y"/></rdf:Description>
    </rdf:RDF>"""
    stmts, _ = parse_rdfxml(doc, base_iri="http://h.example/dir/page")
    assert len(stmts) == 1
    st = stmts[0]
    assert st.subject.value == "http://h.example/dir/x"
    assert st.object.value == "http://h.example/dir/y"
