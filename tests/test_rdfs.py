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
