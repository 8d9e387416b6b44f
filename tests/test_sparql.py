"""Mini-SPARQL compiler — parse/compile semantics on a hand-built
triple table."""

import pytest

from serd_spark.plans.sparql import SparqlError, parse_sparql, sparql_query

T = [
    ("e:a", "rdf:type", "e:Dog"),
    ("e:b", "rdf:type", "e:Cat"),
    ("e:a", "e:name", "rex"),
    ("e:b", "e:name", "tom"),
    ("e:a", "e:likes", "e:b"),
    ("e:b", "e:likes", "e:b"),  # self-loop for the repeated-var case
]


def _triples(spark):
    rows = [
        tuple(
            x.replace("e:", "http://ex.org/").replace(
                "rdf:type", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
            )
            for x in t
        )
        for t in T
    ]
    return spark.createDataFrame(rows, "s string, p string, o string")


def test_single_pattern_constant_pushdown(spark):
    df = sparql_query(
        _triples(spark),
        'PREFIX e: <http://ex.org/> SELECT ?x WHERE { ?x e:name "rex" }',
    )
    assert [r.x for r in df.collect()] == ["http://ex.org/a"]


def test_star_and_chain_join(spark):
    q = """
    PREFIX e: <http://ex.org/>
    SELECT ?x ?n ?m WHERE {
      ?x e:likes ?y .
      ?x e:name ?n .
      ?y e:name ?m .
    } ORDER BY ?x
    """
    got = [(r.x, r.n, r.m) for r in sparql_query(_triples(spark), q).collect()]
    assert got == [
        ("http://ex.org/a", "rex", "tom"),
        ("http://ex.org/b", "tom", "tom"),
    ]


def test_a_shorthand_and_select_star(spark):
    q = "PREFIX e: <http://ex.org/> SELECT * WHERE { ?x a e:Dog }"
    df = sparql_query(_triples(spark), q)
    assert df.columns == ["x"]
    assert [r.x for r in df.collect()] == ["http://ex.org/a"]


def test_repeated_variable_in_one_pattern(spark):
    q = "PREFIX e: <http://ex.org/> SELECT ?x WHERE { ?x e:likes ?x }"
    assert [r.x for r in sparql_query(_triples(spark), q).collect()] == [
        "http://ex.org/b"
    ]


def test_filter_and_limit(spark):
    q = """
    PREFIX e: <http://ex.org/>
    SELECT ?x ?n WHERE { ?x e:name ?n . FILTER (?n != "tom") } LIMIT 1
    """
    got = sparql_query(_triples(spark), q).collect()
    assert len(got) == 1 and got[0].n == "rex"


def test_disconnected_patterns_cartesian(spark):
    q = """
    PREFIX e: <http://ex.org/>
    SELECT ?x ?y WHERE { ?x a e:Dog . ?y a e:Cat }
    """
    got = [(r.x, r.y) for r in sparql_query(_triples(spark), q).collect()]
    assert got == [("http://ex.org/a", "http://ex.org/b")]


def test_parse_errors():
    with pytest.raises(SparqlError, match="undeclared prefix"):
        parse_sparql("SELECT ?x WHERE { ?x e:name ?n }")
    with pytest.raises(SparqlError, match="not bound"):
        parse_sparql("SELECT ?z WHERE { ?x <http://p> ?y }")
    with pytest.raises(SparqlError, match="empty WHERE"):
        parse_sparql("SELECT ?x WHERE { }")
    # '<' comparator is now supported — it must parse cleanly
    parse_sparql(
        'SELECT ?x WHERE { ?x <http://p> ?y . FILTER (?y < "3") }'
    )
    with pytest.raises(SparqlError, match="unsupported FILTER"):
        parse_sparql(
            'SELECT ?x WHERE { ?x <http://p> ?y . FILTER (?y . "3") }'
        )


def test_optional_left_join(spark):
    # every ?x with a name; type only where present — e:c has a name
    # but no type row, so ?t must come back NULL for it
    q = """
    PREFIX e: <http://ex.org/>
    SELECT ?x ?n ?t WHERE {
      ?x e:name ?n .
      OPTIONAL { ?x a ?t . }
    } ORDER BY ?x
    """
    extra = spark.createDataFrame(
        [("http://ex.org/c", "http://ex.org/name", "ann")],
        "s string, p string, o string",
    )
    got = [
        (r.x, r.n, r.t)
        for r in sparql_query(_triples(spark).union(extra), q).collect()
    ]
    assert got == [
        ("http://ex.org/a", "rex", "http://ex.org/Dog"),
        ("http://ex.org/b", "tom", "http://ex.org/Cat"),
        ("http://ex.org/c", "ann", None),
    ]


def test_optional_filter_on_unbound_drops_row(spark):
    # SPARQL: FILTER on an unbound var is a type error -> false;
    # Spark: NULL comparison -> NULL -> dropped. Must agree.
    q = """
    PREFIX e: <http://ex.org/>
    SELECT ?x ?t WHERE {
      ?x e:name ?n .
      OPTIONAL { ?x a ?t . }
      FILTER (?t != e:Cat)
    } ORDER BY ?x
    """
    extra = spark.createDataFrame(
        [("http://ex.org/c", "http://ex.org/name", "ann")],
        "s string, p string, o string",
    )
    got = [
        (r.x, r.t)
        for r in sparql_query(_triples(spark).union(extra), q).collect()
    ]
    assert got == [("http://ex.org/a", "http://ex.org/Dog")]


def test_union_bag_semantics_and_distinct(spark):
    # e:b likes e:b and is also a Cat -> bag union keeps both rows;
    # DISTINCT collapses them
    q_bag = """
    PREFIX e: <http://ex.org/>
    SELECT ?x WHERE {
      { ?x e:likes ?y . } UNION { ?x a ?y . }
    } ORDER BY ?x
    """
    bag = [r.x for r in sparql_query(_triples(spark), q_bag).collect()]
    assert bag == ["http://ex.org/a"] * 2 + ["http://ex.org/b"] * 2
    q_dis = q_bag.replace("SELECT ?x", "SELECT DISTINCT ?x")
    dis = [r.x for r in sparql_query(_triples(spark), q_dis).collect()]
    assert dis == ["http://ex.org/a", "http://ex.org/b"]


def test_union_joins_with_following_pattern(spark):
    q = """
    PREFIX e: <http://ex.org/>
    SELECT ?x ?n WHERE {
      { ?x a e:Dog . } UNION { ?x a e:Cat . }
      ?x e:name ?n .
    } ORDER BY ?x
    """
    got = [(r.x, r.n) for r in sparql_query(_triples(spark), q).collect()]
    assert got == [("http://ex.org/a", "rex"), ("http://ex.org/b", "tom")]


def test_compound_scope_errors():
    pre = "PREFIX e: <http://ex.org/> "
    with pytest.raises(SparqlError, match="cannot be the first"):
        parse_sparql(pre + "SELECT ?x WHERE { OPTIONAL { ?x a e:D . } }")
    with pytest.raises(SparqlError, match="shares no variable"):
        parse_sparql(
            pre + "SELECT ?x WHERE { ?x a e:D . OPTIONAL { ?y a e:C . } }"
        )
    with pytest.raises(SparqlError, match="later pattern"):
        parse_sparql(
            pre
            + "SELECT ?x WHERE { ?x a e:D . "
            + "OPTIONAL { ?x e:name ?n . } ?n a e:N . }"
        )
    with pytest.raises(SparqlError, match="same variables"):
        parse_sparql(
            pre + "SELECT ?x WHERE { { ?x a e:D . } UNION { ?y a e:C . } }"
        )
    with pytest.raises(SparqlError, match="nested OPTIONAL"):
        parse_sparql(
            pre
            + "SELECT ?x WHERE { ?x a e:D . "
            + "OPTIONAL { OPTIONAL { ?x a ?t . } } }"
        )
    with pytest.raises(SparqlError, match="block itself binds"):
        parse_sparql(
            pre
            + "SELECT ?x WHERE { ?x e:name ?n . "
            + 'OPTIONAL { ?x a ?t . FILTER (?n != "x") } }'
        )


def test_path_sequence_and_inverse(spark):
    # ?x e:likes/e:name ?m — who ?x likes, by name; ^e:likes inverts
    q = """
    PREFIX e: <http://ex.org/>
    SELECT ?x ?m WHERE { ?x e:likes/e:name ?m . } ORDER BY ?x
    """
    got = [(r.x, r.m) for r in sparql_query(_triples(spark), q).collect()]
    assert got == [("http://ex.org/a", "tom"), ("http://ex.org/b", "tom")]
    # ?s ^p ?o  ==  ?o p ?s: "e:a ^e:likes ?y" asks who likes a
    q_inv = """
    PREFIX e: <http://ex.org/>
    SELECT ?y WHERE { e:a ^e:likes ?y . }
    """
    assert sparql_query(_triples(spark), q_inv).count() == 0  # no one likes a
    q_inv2 = """
    PREFIX e: <http://ex.org/>
    SELECT ?y WHERE { e:b ^e:likes ?y . } ORDER BY ?y
    """
    assert [r.y for r in sparql_query(_triples(spark), q_inv2).collect()] == [
        "http://ex.org/a", "http://ex.org/b",
    ]


def test_path_alternation_bag(spark):
    q = """
    PREFIX e: <http://ex.org/>
    SELECT ?x ?v WHERE { ?x e:name|e:likes ?v . } ORDER BY ?x ?v
    """
    got = [(r.x, r.v) for r in sparql_query(_triples(spark), q).collect()]
    assert got == [
        ("http://ex.org/a", "http://ex.org/b"),
        ("http://ex.org/a", "rex"),
        ("http://ex.org/b", "http://ex.org/b"),
        ("http://ex.org/b", "tom"),
    ]


def test_path_plus_deep_chain(spark):
    # a 100-node chain: closure from node 0 must reach all 100
    # successors in O(log d) squaring rounds, not 100 joins
    chain = [
        (f"http://c.org/{i}", "http://c.org/next", f"http://c.org/{i+1}")
        for i in range(100)
    ]
    t = spark.createDataFrame(chain, "s string, p string, o string")
    q = """
    PREFIX c: <http://c.org/>
    SELECT ?y WHERE { c:0 c:next+ ?y . }
    """
    got = sorted(
        int(r.y.rsplit("/", 1)[1]) for r in sparql_query(t, q).collect()
    )
    assert got == list(range(1, 101))


def test_path_plus_cycle_terminates(spark):
    # closure over a 3-cycle: every node reaches every node (incl.
    # itself) and the fixpoint detection stops the squaring loop
    cyc = [
        ("http://c.org/a", "http://c.org/n", "http://c.org/b"),
        ("http://c.org/b", "http://c.org/n", "http://c.org/c"),
        ("http://c.org/c", "http://c.org/n", "http://c.org/a"),
    ]
    t = spark.createDataFrame(cyc, "s string, p string, o string")
    q = "PREFIX c: <http://c.org/> SELECT ?x ?y WHERE { ?x c:n+ ?y . }"
    assert sparql_query(t, q).count() == 9


def test_path_grouped_alt_then_seq(spark):
    # (e:likes|e:name) composed with closure grouping parses; the
    # seq of an alt: ?x (e:likes/e:name)|e:name ?v
    q = """
    PREFIX e: <http://ex.org/>
    SELECT DISTINCT ?v WHERE { e:a (e:likes/e:name)|e:name ?v . }
    ORDER BY ?v
    """
    got = [r.v for r in sparql_query(_triples(spark), q).collect()]
    assert got == ["rex", "tom"]


def test_group_by_count(spark):
    q = """
    PREFIX e: <http://ex.org/>
    SELECT ?y (COUNT(?x) AS ?n) WHERE { ?x e:likes ?y . }
    GROUP BY ?y ORDER BY ?y
    """
    got = [(r.y, r.n) for r in sparql_query(_triples(spark), q).collect()]
    assert got == [("http://ex.org/b", 2)]


def test_global_aggregate_count_star_min_max(spark):
    q = """
    PREFIX e: <http://ex.org/>
    SELECT (COUNT(*) AS ?n) (MIN(?m) AS ?lo) (MAX(?m) AS ?hi)
    WHERE { ?x e:name ?m . }
    """
    r = sparql_query(_triples(spark), q).collect()[0]
    assert (r.n, r.lo, r.hi) == (2, "rex", "tom")


def test_count_distinct(spark):
    q = """
    PREFIX e: <http://ex.org/>
    SELECT (COUNT(DISTINCT ?y) AS ?n) WHERE { ?x e:likes ?y . }
    """
    assert sparql_query(_triples(spark), q).collect()[0].n == 1


def test_aggregate_scope_errors():
    pre = "PREFIX e: <http://ex.org/> "
    with pytest.raises(SparqlError, match="GROUP BY or an aggregate"):
        parse_sparql(
            pre + "SELECT ?x (COUNT(*) AS ?n) WHERE { ?x a e:D . }"
        )
    with pytest.raises(SparqlError, match="requires an aggregate"):
        parse_sparql(
            pre + "SELECT ?x WHERE { ?x a e:D . } GROUP BY ?x"
        )
    with pytest.raises(SparqlError, match="shadows"):
        parse_sparql(
            pre + "SELECT (COUNT(?x) AS ?x) WHERE { ?x a e:D . }"
        )
    with pytest.raises(SparqlError, match="unsupported aggregate"):
        parse_sparql(
            pre + "SELECT (MEDIAN(?x) AS ?s) WHERE { ?x a e:D . }"
        )


def test_construct_emits_triple_set(spark):
    # rewrite likes-edges as schema.org knows + a constant type triple;
    # distinct collapses the duplicate type row for e:a/e:b subjects
    q = """
    PREFIX e: <http://ex.org/>
    CONSTRUCT {
      ?x <http://schema.org/knows> ?y .
      ?x a <http://schema.org/Person> .
    } WHERE { ?x e:likes ?y . }
    """
    out = sparql_query(_triples(spark), q)
    assert out.columns == ["s", "p", "o"]
    rows = {(r.s, r.p, r.o) for r in out.collect()}
    assert rows == {
        ("http://ex.org/a", "http://schema.org/knows", "http://ex.org/b"),
        ("http://ex.org/b", "http://schema.org/knows", "http://ex.org/b"),
        (
            "http://ex.org/a",
            "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
            "http://schema.org/Person",
        ),
        (
            "http://ex.org/b",
            "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
            "http://schema.org/Person",
        ),
    }
    assert out.count() == 4  # the distinct graph, not a 2x2 bag


def test_construct_errors():
    pre = "PREFIX e: <http://ex.org/> "
    with pytest.raises(SparqlError, match="template variable"):
        parse_sparql(
            pre + "CONSTRUCT { ?z a e:T . } WHERE { ?x a e:D . }"
        )
    with pytest.raises(SparqlError, match="empty CONSTRUCT"):
        parse_sparql(pre + "CONSTRUCT { } WHERE { ?x a e:D . }")


def test_order_desc(spark):
    q = """
    PREFIX e: <http://ex.org/>
    SELECT ?n WHERE { ?x e:name ?n } ORDER BY DESC(?n)
    """
    assert [r.n for r in sparql_query(_triples(spark), q).collect()] == [
        "tom", "rex",
    ]


def test_filter_comparisons_string_and_numeric(spark):
    tri = spark.createDataFrame(
        [("e:a", "e:n", "5"), ("e:b", "e:n", "12"),
         ("e:c", "e:n", "oops")],
        "s string, p string, o string",
    )
    pre = "PREFIX e: <http://ex.org/> "
    # numeric: "12" > 5 numerically (lexically it is not); the
    # non-numeric row drops (SPARQL type error == failed-cast NULL)
    q = pre.replace("http://ex.org/", "e:") if False else (
        'PREFIX e: <e:> SELECT ?x WHERE { ?x <e:n> ?v . '
        "FILTER (?v > 5) } ORDER BY ?x"
    )
    got = [r.x for r in sparql_query(tri, q).collect()]
    assert got == ["e:b"]
    q2 = 'SELECT ?x WHERE { ?x <e:n> ?v . FILTER (?v >= "5") } ORDER BY ?x'
    # string compare: "5" >= "5", "oops" >= "5"; "12" < "5" lexically
    got2 = [r.x for r in sparql_query(tri, q2).collect()]
    assert got2 == ["e:a", "e:c"]


def test_filter_regex(spark):
    q = """
    PREFIX e: <http://ex.org/>
    SELECT ?x WHERE { ?x e:name ?n . FILTER (regex(?n, "^t.m$")) }
    """
    got = [r.x for r in sparql_query(_triples(spark), q).collect()]
    assert got == ["http://ex.org/b"]


def test_values_inline_data(spark):
    q = """
    PREFIX e: <http://ex.org/>
    SELECT ?x ?n WHERE {
      ?x e:name ?n .
      VALUES ?n { "rex" "nobody" }
    }
    """
    got = [(r.x, r.n) for r in sparql_query(_triples(spark), q).collect()]
    assert got == [("http://ex.org/a", "rex")]


def test_values_errors():
    pre = "PREFIX e: <http://ex.org/> "
    with pytest.raises(SparqlError, match="not bound"):
        parse_sparql(pre + 'SELECT ?x WHERE { ?x a e:Dog . '
                           'VALUES ?z { "v" } }')
    with pytest.raises(SparqlError, match="empty VALUES"):
        parse_sparql(pre + "SELECT ?x WHERE { ?x a e:Dog . "
                           "VALUES ?x { } }")
    with pytest.raises(SparqlError, match="inside OPTIONAL"):
        parse_sparql(pre + 'SELECT ?x WHERE { ?x a e:Dog . '
                           'OPTIONAL { ?x e:name ?n . '
                           'VALUES ?n { "v" } } }')


def test_offset_pagination(spark):
    q = """
    PREFIX e: <http://ex.org/>
    SELECT ?n WHERE { ?x e:name ?n . } ORDER BY ?n LIMIT 1 OFFSET 1
    """
    assert [r.n for r in sparql_query(_triples(spark), q).collect()] == [
        "tom"
    ]


def test_offset_requires_order():
    with pytest.raises(SparqlError, match="OFFSET requires"):
        parse_sparql(
            "PREFIX e: <http://ex.org/> "
            "SELECT ?x WHERE { ?x a e:Dog . } OFFSET 2"
        )


def test_ask_form(spark):
    tri = _triples(spark)
    pre = "PREFIX e: <http://ex.org/> "
    assert sparql_query(tri, pre + "ASK { ?x e:likes ?x . }").collect()[
        0
    ].ask is True  # the self-loop
    assert sparql_query(
        tri, pre + 'ASK WHERE { ?x e:name "nobody" . }'
    ).collect()[0].ask is False
    with pytest.raises(SparqlError, match="plain group"):
        parse_sparql(pre + "ASK { ?x a e:Dog . } LIMIT 3")


def test_minus_anti_join(spark):
    q = """
    PREFIX e: <http://ex.org/>
    SELECT ?x ?n WHERE {
      ?x e:name ?n .
      MINUS { ?x a e:Cat . }
    } ORDER BY ?x
    """
    got = [(r.x, r.n) for r in sparql_query(_triples(spark), q).collect()]
    assert got == [("http://ex.org/a", "rex")]  # the cat is removed


def test_minus_block_vars_stay_internal(spark):
    # ?t exists only inside MINUS: usable there, not projectable
    q = """
    PREFIX e: <http://ex.org/>
    SELECT ?x WHERE {
      ?x e:name ?n .
      MINUS { ?x a ?t . FILTER (?t = e:Cat) }
    } ORDER BY ?x
    """
    got = [r.x for r in sparql_query(_triples(spark), q).collect()]
    assert got == ["http://ex.org/a"]
    with pytest.raises(SparqlError, match="not bound"):
        parse_sparql(
            "PREFIX e: <http://ex.org/> SELECT ?t WHERE { "
            "?x e:name ?n . MINUS { ?x a ?t . } }"
        )


def test_minus_scope_errors():
    pre = "PREFIX e: <http://ex.org/> "
    with pytest.raises(SparqlError, match="first pattern"):
        parse_sparql(pre + "SELECT ?x WHERE { MINUS { ?x a e:C . } "
                           "?x e:name ?n . }")
    with pytest.raises(SparqlError, match="shares no variable"):
        parse_sparql(pre + "SELECT ?x WHERE { ?x e:name ?n . "
                           "MINUS { ?y a e:C . } }")
    with pytest.raises(SparqlError, match="bound in OPTIONAL"):
        parse_sparql(pre + "SELECT ?x WHERE { ?x e:name ?n . "
                           "OPTIONAL { ?x a ?t . } "
                           "MINUS { ?z a ?t . ?x e:likes ?z . } }")


def test_bind_arithmetic(spark):
    # numeric table: rating strings; x2 + 1 computed per row
    rows = [("e1", "e:r", "2.5"), ("e2", "e:r", "4.0"), ("e3", "e:r", "x")]
    t = spark.createDataFrame(
        [(s, "http://ex.org/r", o) for s, _, o in rows],
        "s string, p string, o string",
    )
    q = """
    PREFIX e: <http://ex.org/>
    SELECT ?x ?twice WHERE {
      ?x e:r ?r .
      BIND (?r * 2 + 1 AS ?twice)
    } ORDER BY ?x
    """
    got = [(r.x, r.twice) for r in sparql_query(t, q).collect()]
    # non-numeric 'x' -> type error -> unbound (NULL), row kept
    assert got == [("e1", 6.0), ("e2", 9.0), ("e3", None)]


def test_bind_minus_and_division(spark):
    t = spark.createDataFrame(
        [("e1", "http://ex.org/r", "10")], "s string, p string, o string"
    )
    q = """
    PREFIX e: <http://ex.org/>
    SELECT ?v WHERE { ?x e:r ?r . BIND (?r / 4 - 2 AS ?v) }
    """
    assert [r.v for r in sparql_query(t, q).collect()] == [0.5]


def test_bind_strings(spark):
    q = """
    PREFIX e: <http://ex.org/>
    SELECT ?label ?len WHERE {
      ?x e:name ?n .
      BIND (CONCAT(UCASE(?n), "!") AS ?label)
      BIND (STRLEN(?n) AS ?len)
    } ORDER BY ?label
    """
    got = [(r.label, r.len) for r in sparql_query(_triples(spark), q).collect()]
    assert got == [("REX!", 3), ("TOM!", 3)]


def test_bind_used_by_later_filter_and_order(spark):
    q = """
    PREFIX e: <http://ex.org/>
    SELECT ?x ?u WHERE {
      ?x e:name ?n .
      BIND (UCASE(?n) AS ?u)
      FILTER (?u = "REX")
    }
    """
    got = [(r.x, r.u) for r in sparql_query(_triples(spark), q).collect()]
    assert got == [("http://ex.org/a", "REX")]


def test_bind_scope_errors():
    base = "PREFIX e: <http://ex.org/> SELECT ?x WHERE { %s }"
    with pytest.raises(SparqlError, match="first pattern"):
        parse_sparql(base % 'BIND (1 + 1 AS ?x)')
    with pytest.raises(SparqlError, match="already bound"):
        parse_sparql(base % '?x e:name ?n . BIND (2 AS ?n)')
    with pytest.raises(SparqlError, match="unbound"):
        parse_sparql(base % '?x e:name ?n . BIND (?zz * 2 AS ?y)')
    with pytest.raises(SparqlError, match="target must be"):
        parse_sparql(base % '?x e:name ?n . BIND (2 AS "lit")')


def test_describe_var(spark):
    q = """
    PREFIX e: <http://ex.org/>
    DESCRIBE ?x WHERE { ?x e:name "rex" }
    """
    got = sorted(
        (r.s, r.p, r.o) for r in sparql_query(_triples(spark), q).collect()
    )
    assert got == [
        ("http://ex.org/a", "http://ex.org/likes", "http://ex.org/b"),
        ("http://ex.org/a", "http://ex.org/name", "rex"),
        (
            "http://ex.org/a",
            "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
            "http://ex.org/Dog",
        ),
    ]


def test_describe_bare_iri(spark):
    q = "DESCRIBE <http://ex.org/b>"
    got = sorted(
        (r.p, r.o) for r in sparql_query(_triples(spark), q).collect()
    )
    assert got == [
        ("http://ex.org/likes", "http://ex.org/b"),
        ("http://ex.org/name", "tom"),
        (
            "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
            "http://ex.org/Cat",
        ),
    ]


def test_describe_errors():
    with pytest.raises(SparqlError, match="not bound"):
        parse_sparql(
            "PREFIX e: <http://ex.org/> DESCRIBE ?z WHERE { ?x e:name ?n }"
        )
    with pytest.raises(SparqlError, match="plain group pattern"):
        parse_sparql(
            "PREFIX e: <http://ex.org/> DESCRIBE ?x WHERE "
            "{ ?x e:name ?n } LIMIT 5"
        )


# ---- round-4 session-10 additions: SUM/AVG/SAMPLE/GROUP_CONCAT,
# ---- HAVING, FILTER (NOT) EXISTS

N = [  # numeric objects for the arithmetic aggregates
    ("e:r1", "e:score", "2"),
    ("e:r1", "e:score", "3.5"),
    ("e:r1", "e:score", "3.5"),
    ("e:r2", "e:score", "4"),
    ("e:r2", "e:score", "oops"),  # non-numeric: skipped (documented)
]


def _ntriples(spark):
    rows = [
        tuple(x.replace("e:", "http://ex.org/") for x in t) for t in N
    ]
    return spark.createDataFrame(rows, "s string, p string, o string")


def test_sum_avg_micros(spark):
    q = """
    PREFIX e: <http://ex.org/>
    SELECT ?s (SUM(?v) AS ?total) (AVG(?v) AS ?mean)
    WHERE { ?s e:score ?v } GROUP BY ?s ORDER BY ?s
    """
    got = [
        (r.s.split("/")[-1], r.total, r.mean)
        for r in sparql_query(_ntriples(spark), q).collect()
    ]
    # r1: 2 + 3.5 + 3.5 = 9.0; mean floor(9e6/3)/1e6 = 3.0
    # r2: 'oops' skipped → total 4.0 over ONE non-null value
    assert got == [("r1", 9.0, 3.0), ("r2", 4.0, 4.0)]


def test_sum_distinct(spark):
    q = """
    PREFIX e: <http://ex.org/>
    SELECT ?s (SUM(DISTINCT ?v) AS ?total)
    WHERE { ?s e:score ?v } GROUP BY ?s ORDER BY ?s
    """
    got = [r.total for r in sparql_query(_ntriples(spark), q).collect()]
    assert got == [5.5, 4.0]  # r1 dedups the double 3.5


def test_avg_inexact_division_floors(spark):
    rows = [("a", "p", "1"), ("a", "p", "2")]
    df = spark.createDataFrame(rows, "s string, p string, o string")
    q = "SELECT (AVG(?v) AS ?m) WHERE { ?s <p> ?v }"
    # floor(3e6 / 2) = 1_500_000 → 1.5
    assert sparql_query(df, q).collect()[0].m == 1.5


def test_group_concat_sorted_and_separator(spark):
    q = """
    PREFIX e: <http://ex.org/>
    SELECT ?s (GROUP_CONCAT(?v; SEPARATOR="|") AS ?vals)
    WHERE { ?s e:score ?v } GROUP BY ?s ORDER BY ?s
    """
    got = [r.vals for r in sparql_query(_ntriples(spark), q).collect()]
    # lexicographic sort of the lexical forms, deterministic
    assert got == ["2|3.5|3.5", "4|oops"]


def test_group_concat_distinct_default_sep(spark):
    q = """
    PREFIX e: <http://ex.org/>
    SELECT ?s (GROUP_CONCAT(DISTINCT ?v) AS ?vals)
    WHERE { ?s e:score ?v } GROUP BY ?s ORDER BY ?s
    """
    got = [r.vals for r in sparql_query(_ntriples(spark), q).collect()]
    assert got == ["2 3.5", "4 oops"]


def test_sample_is_min(spark):
    q = """
    PREFIX e: <http://ex.org/>
    SELECT ?s (SAMPLE(?v) AS ?one)
    WHERE { ?s e:score ?v } GROUP BY ?s ORDER BY ?s
    """
    got = [r.one for r in sparql_query(_ntriples(spark), q).collect()]
    assert got == ["2", "4"]


def test_having_filters_groups(spark):
    q = """
    PREFIX e: <http://ex.org/>
    SELECT ?s (COUNT(*) AS ?n)
    WHERE { ?s e:score ?v } GROUP BY ?s HAVING (?n >= 2) ORDER BY ?s
    """
    got = [
        (r.s.split("/")[-1], r.n)
        for r in sparql_query(_ntriples(spark), q).collect()
    ]
    assert got == [("r1", 3), ("r2", 2)]
    q2 = q.replace("?n >= 2", "?n >= 3")
    got2 = [
        (r.s.split("/")[-1], r.n)
        for r in sparql_query(_ntriples(spark), q2).collect()
    ]
    assert got2 == [("r1", 3)]


def test_having_requires_alias_or_key(spark):
    q = """
    PREFIX e: <http://ex.org/>
    SELECT ?s (COUNT(*) AS ?n)
    WHERE { ?s e:score ?v } GROUP BY ?s HAVING (?v > 1)
    """
    with pytest.raises(SparqlError, match="HAVING variable"):
        parse_sparql(q)


def test_having_without_aggregates_rejected(spark):
    q = """
    PREFIX e: <http://ex.org/>
    SELECT ?s WHERE { ?s e:score ?v } HAVING (?s > 1)
    """
    with pytest.raises(SparqlError, match="HAVING requires"):
        parse_sparql(q)


def test_filter_exists(spark):
    # subjects with a name that also like something
    q = """
    PREFIX e: <http://ex.org/>
    SELECT ?x ?n WHERE {
      ?x e:name ?n .
      FILTER EXISTS { ?x e:likes ?y . }
    } ORDER BY ?x
    """
    got = [r.n for r in sparql_query(_triples(spark), q).collect()]
    assert got == ["rex", "tom"]
    # constrain the EXISTS side: only self-likers
    q2 = """
    PREFIX e: <http://ex.org/>
    SELECT ?x ?n WHERE {
      ?x e:name ?n .
      FILTER EXISTS { ?x e:likes e:b . }
    } ORDER BY ?x
    """
    got2 = [r.n for r in sparql_query(_triples(spark), q2).collect()]
    assert got2 == ["rex", "tom"]


def test_filter_not_exists(spark):
    # typed subjects nobody likes: e:a (only e:b is liked)
    q = """
    PREFIX e: <http://ex.org/>
    SELECT ?x WHERE {
      ?x a ?t .
      FILTER NOT EXISTS { ?y e:likes ?x . }
    } ORDER BY ?x
    """
    got = [r.x for r in sparql_query(_triples(spark), q).collect()]
    assert got == ["http://ex.org/a"]


def test_exists_semi_join_no_duplication(spark):
    # e:b is liked TWICE — EXISTS must not duplicate the outer row
    q = """
    PREFIX e: <http://ex.org/>
    SELECT ?x WHERE {
      ?x e:name ?n .
      FILTER EXISTS { ?y e:likes ?x . }
    }
    """
    got = [r.x for r in sparql_query(_triples(spark), q).collect()]
    assert got == ["http://ex.org/b"]


def test_exists_scope_rejections(spark):
    with pytest.raises(SparqlError, match="cannot be the first"):
        parse_sparql(
            "PREFIX e: <http://ex.org/> SELECT ?x WHERE "
            "{ FILTER EXISTS { ?x e:likes ?y . } ?x e:name ?n . }"
        )
    with pytest.raises(SparqlError, match="shares no variable"):
        parse_sparql(
            "PREFIX e: <http://ex.org/> SELECT ?x WHERE "
            "{ ?x e:name ?n . FILTER NOT EXISTS { ?a e:likes ?b . } }"
        )
    with pytest.raises(SparqlError, match="bound in OPTIONAL"):
        parse_sparql(
            "PREFIX e: <http://ex.org/> SELECT ?x WHERE "
            "{ ?x e:name ?n . OPTIONAL { ?x e:likes ?y . } "
            "FILTER EXISTS { ?y e:name ?m . } }"
        )


def test_separator_on_non_group_concat_rejected(spark):
    with pytest.raises(SparqlError, match="SEPARATOR"):
        parse_sparql(
            'PREFIX e: <http://ex.org/> '
            'SELECT (SUM(?v; SEPARATOR="|") AS ?t) '
            "WHERE { ?s e:score ?v }"
        )


def _mk(spark, rows):
    rows = [
        tuple(x.replace("e:", "http://e/") for x in t) for t in rows
    ]
    return spark.createDataFrame(rows, "s string, p string, o string")


def test_path_zero_or_more(spark):
    t = _mk(spark, [
        ("e:a", "e:knows", "e:b"),
        ("e:b", "e:knows", "e:c"),
        ("e:d", "e:name", "solo"),
    ])
    out = sparql_query(t, """
    PREFIX e: <http://e/>
    SELECT ?x ?y WHERE { ?x e:knows* ?y . } ORDER BY ?x ?y
    """)
    got = {(r.x, r.y) for r in out.collect()}
    closure = {
        ("http://e/a", "http://e/b"),
        ("http://e/a", "http://e/c"),
        ("http://e/b", "http://e/c"),
    }
    # identity over EVERY graph node — subjects, objects, literals
    nodes = {
        "http://e/a", "http://e/b", "http://e/c", "http://e/d", "solo",
    }
    assert got == closure | {(n, n) for n in nodes}


def test_path_zero_or_one(spark):
    t = _mk(spark, [
        ("e:a", "e:knows", "e:b"),
        ("e:b", "e:knows", "e:c"),
    ])
    out = sparql_query(t, """
    PREFIX e: <http://e/>
    SELECT ?x ?y WHERE { ?x e:knows? ?y . } ORDER BY ?x ?y
    """)
    got = {(r.x, r.y) for r in out.collect()}
    nodes = {"http://e/a", "http://e/b", "http://e/c"}
    assert got == {
        ("http://e/a", "http://e/b"),
        ("http://e/b", "http://e/c"),
    } | {(n, n) for n in nodes}


def test_path_star_with_constant_endpoint(spark):
    t = _mk(spark, [
        ("e:a", "e:knows", "e:b"),
        ("e:x", "e:other", "e:y"),
    ])
    out = sparql_query(t, """
    PREFIX e: <http://e/>
    SELECT ?y WHERE { e:x e:knows* ?y . } ORDER BY ?y
    """)
    # e:x has no knows edge but IS a node → zero-length match only
    assert [r.y for r in out.collect()] == ["http://e/x"]


def test_negated_property_set_forward(spark):
    # everything EXCEPT likes-edges: the two type edges + two names
    q = """PREFIX e: <http://ex.org/>
           SELECT ?x ?y WHERE { ?x !e:likes ?y }"""
    got = {(r.x, r.y) for r in sparql_query(_triples(spark), q).collect()}
    assert ("http://ex.org/a", "http://ex.org/b") not in got
    assert ("http://ex.org/a", "rex") in got
    assert ("http://ex.org/a", "e:Dog".replace("e:", "http://ex.org/")) in got
    assert len(got) == 4


def test_negated_property_set_grouped_and_a(spark):
    # exclude both rdf:type (via 'a') and name: only likes survives
    q = """PREFIX e: <http://ex.org/>
           SELECT ?x ?y WHERE { ?x !(a|e:name) ?y }"""
    got = {(r.x, r.y) for r in sparql_query(_triples(spark), q).collect()}
    assert got == {
        ("http://ex.org/a", "http://ex.org/b"),
        ("http://ex.org/b", "http://ex.org/b"),
    }


def test_negated_property_set_reverse_member(spark):
    # !(^e:likes): REVERSED edges whose p is not likes — all of
    # type/name reversed; no forward edge appears
    q = """PREFIX e: <http://ex.org/>
           SELECT ?x ?y WHERE { ?x !(^e:likes) ?y }"""
    got = {(r.x, r.y) for r in sparql_query(_triples(spark), q).collect()}
    assert ("rex", "http://ex.org/a") in got
    assert ("http://ex.org/a", "rex") not in got
    assert len(got) == 4


def test_negated_property_set_mixed(spark):
    # forward component excludes name; reverse component excludes
    # type and name: reverse contributes only reversed likes-edges
    q = """PREFIX e: <http://ex.org/>
           SELECT ?x ?y WHERE { ?x !(e:name|^a|^e:name) ?y }"""
    got = {(r.x, r.y) for r in sparql_query(_triples(spark), q).collect()}
    # forward: 2 type edges + 2 likes edges; reverse: 2 likes edges
    assert ("http://ex.org/b", "http://ex.org/a") in got  # reversed likes a->b
    assert ("http://ex.org/a", "rex") not in got


def test_subselect_grouped_join(spark):
    # inner aggregate per subject, natural-joined to the outer name
    # pattern on ?x — the aggregate-then-join shape
    q = """PREFIX e: <http://ex.org/>
    SELECT ?n ?cnt WHERE {
      ?x e:name ?n .
      { SELECT ?x (COUNT(?y) AS ?cnt) WHERE { ?x e:likes ?y } GROUP BY ?x }
    } ORDER BY ?n"""
    got = [(r.n, r.cnt) for r in sparql_query(_triples(spark), q).collect()]
    assert got == [("rex", 1), ("tom", 1)]


def test_subselect_scalar_cross(spark):
    # no shared variable: the 1-row aggregate cross-joins every
    # outer solution (SPARQL join on disjoint domains = product)
    q = """PREFIX e: <http://ex.org/>
    SELECT ?n ?total WHERE {
      ?x e:name ?n .
      { SELECT (COUNT(*) AS ?total) WHERE { ?s e:likes ?o } }
    } ORDER BY ?n"""
    got = [(r.n, r.total) for r in sparql_query(_triples(spark), q).collect()]
    assert got == [("rex", 2), ("tom", 2)]


def test_subselect_with_inner_limit(spark):
    # inner ORDER BY + LIMIT applies before the outer join
    q = """PREFIX e: <http://ex.org/>
    SELECT ?x ?n WHERE {
      ?x e:name ?n .
      { SELECT ?x WHERE { ?x a e:Dog } ORDER BY ?x LIMIT 1 }
    }"""
    got = [(r.x, r.n) for r in sparql_query(_triples(spark), q).collect()]
    assert got == [("http://ex.org/a", "rex")]


def test_subselect_inherits_outer_prefixes(spark):
    # the e: prefix is declared only on the OUTER query
    q = """PREFIX e: <http://ex.org/>
    SELECT ?x WHERE {
      { SELECT ?x WHERE { ?x e:likes ?x } }
    }"""
    got = [r.x for r in sparql_query(_triples(spark), q).collect()]
    assert got == ["http://ex.org/b"]


def test_sparql_update_delete_insert(spark):
    from serd_spark.plans.sparql import SparqlError, sparql_update

    store = spark.createDataFrame(
        [
            ("a", "http://x/rel", "b"),
            ("a", "http://x/name", "A"),
            ("c", "http://x/rel", "d"),
            # pre-existing seeAlso: insert must not duplicate it
            ("a", "http://x/see", "b"),
        ],
        "s string, p string, o string",
    )
    q = """
    DELETE { ?x <http://x/rel> ?y }
    INSERT { ?x <http://x/see> ?y }
    WHERE { ?x <http://x/rel> ?y }
    """
    got = sorted(map(tuple, sparql_update(store, q).collect()))
    assert got == sorted(
        [
            ("a", "http://x/name", "A"),
            ("a", "http://x/see", "b"),
            ("c", "http://x/see", "d"),
        ]
    )
    # DELETE-only and INSERT-only forms
    only_del = sparql_update(
        store, "DELETE { ?x <http://x/rel> ?y } WHERE { ?x <http://x/rel> ?y }"
    )
    assert only_del.count() == 2
    only_ins = sparql_update(
        store, "INSERT { ?y <http://x/invrel> ?x } WHERE { ?x <http://x/rel> ?y }"
    )
    assert only_ins.count() == 6
    # WHERE evaluated against the ORIGINAL graph: a delete that would
    # erase its own WHERE matches still applies to all of them
    import pytest

    with pytest.raises(SparqlError):
        sparql_update(store, "WHERE { ?x ?p ?y }")


def test_sparql_update_where_features_compose(spark):
    from serd_spark.plans.sparql import sparql_update

    store = spark.createDataFrame(
        [
            ("a", "http://x/rel", "b"),
            ("b", "http://x/flag", "1"),
            ("c", "http://x/rel", "d"),
        ],
        "s string, p string, o string",
    )
    # FILTER/second-pattern constraints flow through: only edges whose
    # target carries the flag are rewritten
    q = """
    DELETE { ?x <http://x/rel> ?y }
    INSERT { ?x <http://x/frel> ?y }
    WHERE { ?x <http://x/rel> ?y . ?y <http://x/flag> ?f }
    """
    got = sorted(map(tuple, sparql_update(store, q).collect()))
    assert got == sorted(
        [
            ("a", "http://x/frel", "b"),
            ("b", "http://x/flag", "1"),
            ("c", "http://x/rel", "d"),
        ]
    )
