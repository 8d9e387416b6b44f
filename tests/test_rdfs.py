"""rdfs_entail / subclass_closure — hand-computed expectations for
the four RDFS rules (domain, range, type propagation, subClassOf
transitivity) on tiny graphs."""

from serd_spark.operators.rdfs import RDF_TYPE, rdfs_entail, subclass_closure


def _triples(spark, rows):
    return spark.createDataFrame(rows, "s string, p string, o string")


# ------------------------------------------------------------ closure

def test_closure_chain_is_transitive():
    got = subclass_closure([("A", "B"), ("B", "C"), ("C", "D")])
    assert got == sorted(
        [("A", "B"), ("A", "C"), ("A", "D"), ("B", "C"), ("B", "D"), ("C", "D")]
    )


def test_closure_ignores_reflexive_axioms():
    assert subclass_closure([("A", "A"), ("A", "B")]) == [("A", "B")]


def test_closure_deep_chain_needs_enough_rounds():
    chain = [(f"c{i}", f"c{i+1}") for i in range(6)]
    full = subclass_closure(chain, n_rounds=4)
    assert ("c0", "c6") in full
    assert len(full) == 6 * 7 // 2


def test_closure_cycle_never_emits_reflexive():
    got = subclass_closure([("A", "B"), ("B", "A")])
    assert got == [("A", "B"), ("B", "A")]


# ---------------------------------------------------------- entailment

def test_asserted_type_propagates_up_hierarchy(spark):
    t = _triples(spark, [("n1", RDF_TYPE, "Dog")])
    got = {
        (r.node, r.cls, r.asserted)
        for r in rdfs_entail(
            t, [("Dog", "Animal"), ("Animal", "Thing")]
        ).collect()
    }
    assert got == {
        ("n1", "Dog", 1),
        ("n1", "Animal", 0),
        ("n1", "Thing", 0),
    }


def test_domain_and_range_rules(spark):
    t = _triples(spark, [("alice", "owns", "rex")])
    got = {
        (r.node, r.cls)
        for r in rdfs_entail(
            t,
            subclass=[],
            domains=[("owns", "Person")],
            ranges=[("owns", "Pet")],
        ).collect()
    }
    assert got == {("alice", "Person"), ("rex", "Pet")}


def test_range_inference_chains_into_closure(spark):
    # range gives rex:Dog, closure lifts it to Animal — rules compose
    t = _triples(spark, [("alice", "owns", "rex")])
    got = {
        (r.node, r.cls, r.asserted)
        for r in rdfs_entail(
            t, [("Dog", "Animal")], ranges=[("owns", "Dog")]
        ).collect()
    }
    assert got == {("rex", "Dog", 0), ("rex", "Animal", 0)}


def test_inferred_duplicate_of_asserted_keeps_flag(spark):
    # n1's Animal is both asserted and derivable — one row, asserted=1
    t = _triples(
        spark,
        [("n1", RDF_TYPE, "Dog"), ("n1", RDF_TYPE, "Animal")],
    )
    rows = rdfs_entail(t, [("Dog", "Animal")]).collect()
    got = {(r.node, r.cls): r.asserted for r in rows}
    assert got == {("n1", "Dog"): 1, ("n1", "Animal"): 1}
    assert len(rows) == 2


def test_non_type_predicates_untouched_without_axioms(spark):
    t = _triples(spark, [("a", "likes", "b")])
    assert rdfs_entail(t, [("X", "Y")]).count() == 0


# ------------------------------------------------- sameAs canonicalize

from serd_spark.operators.rdfs import OWL_SAMEAS, sameas_canonicalize

_FULL_SCHEMA = (
    "url string, island int, stmt_ord int, syntax string, "
    "g string, s string, s_kind tinyint, p string, "
    "o string, o_kind tinyint, o_dt string, o_lang string"
)


def _row(s, s_kind, p, o, o_kind, url="u", ord_=0):
    return (url, 0, ord_, "x", "", s, s_kind, p, o, o_kind, "", "")


def _full(spark, rows):
    return spark.createDataFrame(rows, _FULL_SCHEMA)


def test_sameas_chain_collapses_to_min_id(spark):
    t = _full(spark, [
        _row("e:z", 0, OWL_SAMEAS, "e:a", 0),
        _row("e:m", 0, OWL_SAMEAS, "e:z", 0),
        _row("e:m", 0, "e:p", "v", 1, ord_=1),
        _row("e:x", 0, "e:q", "e:z", 0, ord_=2),
    ])
    out, ents = sameas_canonicalize(t)
    rows = {(r.s, r.p, r.o) for r in out.collect()}
    # sameAs triples dropped; s and IRI-o both rewritten to e:a
    assert rows == {("e:a", "e:p", "v"), ("e:x", "e:q", "e:a")}
    canon = {r.entity: r.canon for r in ents.collect()}
    assert canon["e:m"] == "e:a" and canon["e:z"] == "e:a"


def test_sameas_ignores_non_iri_terms(spark):
    t = _full(spark, [
        # literal object: invalid OWL — no edge, but still dropped
        _row("e:a", 0, OWL_SAMEAS, "lit", 1),
        # blank-node subject in a data triple passes through untouched
        _row("b0", 2, "e:p", "e:a", 0, ord_=1),
        _row("e:a", 0, "e:p", "v", 1, ord_=2),
    ])
    out, _ = sameas_canonicalize(t)
    rows = {(r.s, r.s_kind, r.p, r.o) for r in out.collect()}
    assert rows == {("b0", 2, "e:p", "e:a"), ("e:a", 0, "e:p", "v")}


def test_sameas_graph_projection_dedups_merged_rows(spark):
    t = _full(spark, [
        _row("e:b", 0, OWL_SAMEAS, "e:a", 0),
        # same logical triple from two docs, one via the alias
        _row("e:a", 0, "e:p", "v", 1, url="u1", ord_=1),
        _row("e:b", 0, "e:p", "v", 1, url="u2", ord_=1),
    ])
    bag, _ = sameas_canonicalize(t)
    assert bag.count() == 2  # provenance rows kept
    graph, _ = sameas_canonicalize(t, project_graph=True)
    got = [(r.s, r.p, r.o) for r in graph.collect()]
    assert got == [("e:a", "e:p", "v")]  # the SET collapses them


# ---------------------------------------------------------- VoID stats

def test_void_describe(spark):
    from serd_spark.operators.void_stats import RDF_TYPE, VOID, void_describe

    t = spark.createDataFrame(
        [
            ("e:a", RDF_TYPE, "e:Dog"),
            ("e:b", RDF_TYPE, "e:Dog"),
            ("e:a", "e:name", "rex"),
        ],
        "s string, p string, o string",
    )
    g = {(r.s, r.p, r.o) for r in void_describe(t, "e:ds").collect()}
    assert ("e:ds", RDF_TYPE, VOID + "Dataset") in g
    assert ("e:ds", VOID + "triples", "3") in g
    assert ("e:ds", VOID + "distinctSubjects", "2") in g
    assert ("e:ds", VOID + "distinctObjects", "2") in g
    assert ("e:ds", VOID + "properties", "2") in g
    assert ("e:ds", VOID + "classes", "1") in g
    # two property partitions, each with its predicate + count
    import hashlib
    h = hashlib.md5(RDF_TYPE.encode()).hexdigest()
    part = "e:ds/prop/" + h
    assert ("e:ds", VOID + "propertyPartition", part) in g
    assert (part, VOID + "property", RDF_TYPE) in g
    assert (part, VOID + "triples", "2") in g
    assert len(g) == 6 + 2 * 3


def test_void_empty_graph_has_no_type_row(spark):
    from serd_spark.operators.void_stats import void_describe

    t = spark.createDataFrame([], "s string, p string, o string")
    rows = void_describe(t, "e:ds").collect()
    # totals still aggregate (zeros), but no Dataset type row and no
    # partitions for an empty graph
    assert all(r.p.endswith(("triples", "distinctSubjects",
                             "distinctObjects", "properties",
                             "classes")) for r in rows)


# --- owl_property_entail -------------------------------------------------


def test_owl_symmetric_and_inverse(spark):
    from serd_spark.operators.rdfs import owl_property_entail

    t = _triples(
        spark,
        [
            ("a", "adjacentTo", "b"),
            ("c", "ownedBy", "d"),
        ],
    )
    out = {
        (r.s, r.p, r.o): r.asserted
        for r in owl_property_entail(
            t,
            inverse_of=[("ownedBy", "owns")],
            symmetric=["adjacentTo"],
        ).collect()
    }
    assert out[("b", "adjacentTo", "a")] == 0
    assert out[("d", "owns", "c")] == 0
    assert out[("a", "adjacentTo", "b")] == 1
    # inverse applies in BOTH directions
    t2 = _triples(spark, [("x", "owns", "y")])
    out2 = {
        (r.s, r.p, r.o)
        for r in owl_property_entail(
            t2, inverse_of=[("ownedBy", "owns")]
        ).collect()
    }
    assert ("y", "ownedBy", "x") in out2


def test_owl_transitive_chain_closes(spark):
    from serd_spark.operators.rdfs import owl_property_entail

    edges = [(f"n{i}", "partOf", f"n{i+1}") for i in range(6)]
    t = _triples(spark, edges)
    out = {
        (r.s, r.o)
        for r in owl_property_entail(t, transitive=["partOf"]).collect()
    }
    # full closure of the 7-node chain: 21 pairs
    assert len(out) == 21
    assert ("n0", "n6") in out


def test_owl_inverse_of_transitive_closure(spark):
    from serd_spark.operators.rdfs import owl_property_entail

    edges = [("a", "partOf", "b"), ("b", "partOf", "c")]
    out = {
        (r.s, r.p, r.o)
        for r in owl_property_entail(
            _triples(spark, edges),
            inverse_of=[("partOf", "hasPart")],
            transitive=["partOf"],
        ).collect()
    }
    # hasPart mirrors the CLOSED partOf relation (a,c) too
    assert ("c", "hasPart", "a") in out
    # but hasPart itself was not declared transitive — no extra rows
    assert ("a", "partOf", "c") in out


def test_owl_untouched_predicates_pass_through(spark):
    from serd_spark.operators.rdfs import owl_property_entail

    t = _triples(spark, [("a", "name", "b"), ("a", "name", "b")])
    rows = owl_property_entail(t, symmetric=["other"]).collect()
    assert len(rows) == 1 and rows[0].asserted == 1
