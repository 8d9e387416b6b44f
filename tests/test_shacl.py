"""SHACL-lite validation (operators/shacl.py)."""

import pytest

from serd_spark.operators.shacl import (
    SH,
    NodeShape,
    PropertyShape,
    parse_shapes_turtle,
    validate,
)

S = "http://schema.org/"
EX = "http://example.org/"

SHAPES_TTL = f"""
@prefix sh: <{SH}> .
@prefix s: <{S}> .
@prefix ex: <{EX}> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .

ex:PersonShape a sh:NodeShape ;
  sh:targetClass s:Person ;
  sh:property [
    sh:path s:name ; sh:minCount 1 ; sh:maxCount 1 ;
    sh:datatype xsd:string ; sh:minLength 2 ; sh:maxLength 30 ;
  ] ;
  sh:property [
    sh:path s:age ; sh:datatype xsd:integer ; sh:pattern "^[0-9]+$" ;
  ] ;
  sh:property [
    sh:path s:knows ; sh:nodeKind sh:IRI ; sh:class s:Person ;
  ] ;
  sh:property [
    sh:path s:gender ; sh:in ( "m" "f" "x" ) ;
  ] .
"""


def test_parse_shapes():
    shapes = parse_shapes_turtle(SHAPES_TTL)
    assert len(shapes) == 1
    sh = shapes[0]
    assert sh.target_class == S + "Person"
    by_path = {p.path: p for p in sh.properties}
    assert by_path[S + "name"].min_count == 1
    assert by_path[S + "name"].max_count == 1
    assert by_path[S + "age"].pattern == "^[0-9]+$"
    assert by_path[S + "knows"].node_kind == SH + "IRI"
    assert by_path[S + "knows"].cls == S + "Person"
    assert by_path[S + "gender"].in_values == ("m", "f", "x")


def test_parse_rejects_unsupported():
    bad = f"""
    @prefix sh: <{SH}> .
    @prefix s: <{S}> .
    @prefix ex: <{EX}> .
    ex:X a sh:NodeShape ; sh:targetClass s:Person ;
      sh:property [ sh:path s:name ; sh:uniqueLang true ] .
    """
    with pytest.raises(ValueError, match="unsupported"):
        parse_shapes_turtle(bad)
    with pytest.raises(ValueError, match="non-RE2"):
        parse_shapes_turtle(f"""
        @prefix sh: <{SH}> .
        @prefix s: <{S}> .
        @prefix ex: <{EX}> .
        ex:X a sh:NodeShape ; sh:targetClass s:Person ;
          sh:property [ sh:path s:name ; sh:pattern "(?=a)b" ] .
        """)


def _triples_df(spark, rows):
    # rows: (s, p, o, o_kind, o_dt, o_lang)
    return spark.createDataFrame(
        rows,
        "s string, p string, o string, o_kind tinyint, "
        "o_dt string, o_lang string",
    )


RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"


def test_validate_report(spark):
    shapes = parse_shapes_turtle(SHAPES_TTL)
    rows = [
        # a: conforming
        (EX + "a", RDF_TYPE, S + "Person", 0, "", ""),
        (EX + "a", S + "name", "Alice", 1, "", ""),
        (EX + "a", S + "age", "41", 1, XSD_INT, ""),
        (EX + "a", S + "knows", EX + "b", 0, "", ""),
        (EX + "a", S + "gender", "f", 1, "", ""),
        # b: missing name (minCount), bad age pattern, knows literal
        (EX + "b", RDF_TYPE, S + "Person", 0, "", ""),
        (EX + "b", S + "age", "forty", 1, XSD_INT, ""),
        (EX + "b", S + "knows", "Bob", 1, "", ""),
        # c: two names (maxCount), name too short, knows non-Person
        (EX + "c", RDF_TYPE, S + "Person", 0, "", ""),
        (EX + "c", S + "name", "C", 1, "", ""),
        (EX + "c", S + "name", "Carol", 1, "", ""),
        (EX + "c", S + "knows", EX + "zzz", 0, "", ""),
        (EX + "c", S + "gender", "q", 1, "", ""),
        # non-target node: ignored entirely
        (EX + "d", S + "age", "oops", 1, "", ""),
    ]
    report = validate(_triples_df(spark, rows), shapes)
    got = {
        (r.focus, r.constraint, r.value)
        for r in report.collect()
    }
    assert got == {
        (EX + "b", "minCount", ""),
        (EX + "b", "pattern", "forty"),
        (EX + "b", "nodeKind", "Bob"),
        # literal 'Bob' is skipped by class check (kind filter) but
        # fails nodeKind; IRI zzz fails class
        (EX + "c", "maxCount", ""),
        (EX + "c", "minLength", "C"),
        (EX + "c", "class", EX + "zzz"),
        (EX + "c", "in", "q"),
    }


def test_validate_conforming_is_empty(spark):
    shapes = parse_shapes_turtle(SHAPES_TTL)
    rows = [
        (EX + "a", RDF_TYPE, S + "Person", 0, "", ""),
        (EX + "a", S + "name", "Alice", 1, "", ""),
    ]
    assert validate(_triples_df(spark, rows), shapes).count() == 0


def test_datatype_string_and_langstring(spark):
    shapes = [
        NodeShape(
            iri=EX + "S",
            target_class=S + "Person",
            properties=(
                PropertyShape(
                    path=S + "name",
                    datatype="http://www.w3.org/2001/XMLSchema#string",
                ),
            ),
        )
    ]
    rows = [
        (EX + "a", RDF_TYPE, S + "Person", 0, "", ""),
        (EX + "a", S + "name", "plain", 1, "", ""),             # ok
        (EX + "a", S + "name", "typed", 1,
         "http://www.w3.org/2001/XMLSchema#string", ""),        # ok
        (EX + "a", S + "name", "tagged", 1, "", "en"),          # violation
        (EX + "a", S + "name", "42", 1, XSD_INT, ""),           # violation
    ]
    report = validate(_triples_df(spark, rows), shapes)
    assert {r.value for r in report.collect()} == {"tagged", "42"}
