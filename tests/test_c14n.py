"""RDFC-1.0 canonicalization (rdf/c14n.py): isomorphism invariance,
determinism, automorphic structures, quad graphs, and the
adversarial work bounds."""

import hashlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from serd_spark.rdf.c14n import (
    C14nLimitError,
    canonical_label_map,
    canonical_nquads,
)
from serd_spark.rdf.model import Statement, blank, iri, literal


def _relabel(statements, mapping):
    def m(t):
        if t is None:
            return None
        if t.kind == 2:  # BLANK
            return blank(mapping.get(t.value, t.value))
        return t

    return [
        Statement(m(s.subject), s.predicate, m(s.object), m(s.graph))
        for s in statements
    ]


P = iri("http://ex/p")
Q = iri("http://ex/q")


def test_no_blanks():
    sts = [Statement(iri("http://a"), P, literal("x"))]
    assert canonical_label_map(sts) == {}
    assert canonical_nquads(sts) == ['<http://a> <http://ex/p> "x" .']


def test_chain_labels_stable_under_relabel_and_reorder():
    sts = [
        Statement(blank("x"), P, blank("y")),
        Statement(blank("y"), P, blank("z")),
        Statement(blank("z"), P, literal("end")),
    ]
    perm = _relabel(sts, {"x": "zz", "y": "aa", "z": "mm"})[::-1]
    assert canonical_nquads(sts) == canonical_nquads(perm)
    # three distinguishable nodes -> three distinct canonical labels
    assert sorted(canonical_label_map(sts).values()) == [
        "c14n0", "c14n1", "c14n2",
    ]


def test_symmetric_two_cycle():
    # b1 <-> b2: automorphic pair, needs the N-degree stage
    sts = [
        Statement(blank("b1"), P, blank("b2")),
        Statement(blank("b2"), P, blank("b1")),
    ]
    labels = canonical_label_map(sts)
    assert sorted(labels.values()) == ["c14n0", "c14n1"]
    perm = _relabel(sts, {"b1": "q9", "b2": "q1"})[::-1]
    assert canonical_nquads(sts) == canonical_nquads(perm)


def test_automorphic_square():
    # 4-cycle of blanks: every node's first-degree hash ties; the
    # canonical FORM must still be rotation/relabel invariant
    names = ["a", "b", "c", "d"]
    sts = [
        Statement(blank(names[i]), P, blank(names[(i + 1) % 4]))
        for i in range(4)
    ]
    rot = _relabel(sts, {"a": "c", "b": "d", "c": "a", "d": "b"})
    ren = _relabel(sts, {"a": "n3", "b": "n0", "c": "n2", "d": "n1"})
    base = canonical_nquads(sts)
    assert canonical_nquads(rot) == base
    assert canonical_nquads(ren) == base
    assert len(base) == 4


def test_two_disjoint_doubletons_distinguished_by_leaf():
    # {x -p-> "1", x -p-> y} vs {u -p-> "2", u -p-> v}: the literal
    # distinguishes the pairs; labels must not cross-assign
    sts = [
        Statement(blank("x"), P, literal("1")),
        Statement(blank("x"), Q, blank("y")),
        Statement(blank("u"), P, literal("2")),
        Statement(blank("u"), Q, blank("v")),
    ]
    perm = _relabel(sts, {"x": "u0", "u": "x0", "y": "v0", "v": "y0"})
    assert canonical_nquads(sts) == canonical_nquads(perm)


def test_graph_position_blank():
    sts = [
        Statement(iri("http://s"), P, literal("o"), blank("g1")),
        Statement(blank("g1"), Q, literal("meta")),
    ]
    labels = canonical_label_map(sts)
    assert labels["g1"] == "c14n0"
    lines = canonical_nquads(sts)
    assert '<http://s> <http://ex/p> "o" _:c14n0 .' in lines


def test_duplicate_quads_collapse():
    sts = [
        Statement(blank("b"), P, literal("x")),
        Statement(blank("b"), P, literal("x")),
    ]
    assert len(canonical_nquads(sts)) == 1


def test_ascii_escaping_in_canonical_lines():
    sts = [Statement(blank("b"), P, literal("héllo\n"))]
    (line,) = canonical_nquads(sts)
    assert all(ord(c) < 128 for c in line)
    assert "\\u00E9" in line and "\\n" in line


def test_poison_clique_bounded():
    # K8 directed clique of indistinguishable blanks: every node
    # relates to 7 peers under one tied hash -> the permutation
    # group cap must fire, not a factorial burn
    n = 8
    sts = [
        Statement(blank(f"n{i}"), P, blank(f"n{j}"))
        for i in range(n)
        for j in range(n)
        if i != j
    ]
    with pytest.raises(C14nLimitError):
        canonical_label_map(sts)


def test_content_address_changes_with_structure():
    a = canonical_nquads([Statement(blank("b"), P, blank("c"))])
    b = canonical_nquads([Statement(blank("b"), P, blank("b"))])
    ha = hashlib.sha256("\n".join(a).encode()).hexdigest()
    hb = hashlib.sha256("\n".join(b).encode()).hexdigest()
    assert ha != hb


_label_s = st.from_regex(r"[A-Za-z][A-Za-z0-9]{0,6}", fullmatch=True)


@st.composite
def _graphs(draw):
    n = draw(st.integers(1, 6))
    nodes = [f"b{i}" for i in range(n)]
    n_edges = draw(st.integers(1, 10))
    sts = []
    for _ in range(n_edges):
        s = draw(st.sampled_from(nodes))
        pred = draw(st.sampled_from([P, Q]))
        if draw(st.booleans()):
            o = blank(draw(st.sampled_from(nodes)))
        else:
            o = literal(draw(st.sampled_from(["v1", "v2"])))
        sts.append(Statement(blank(s), pred, o))
    return nodes, sts


@given(_graphs(), st.randoms())
@settings(max_examples=120, deadline=None)
def test_isomorphism_invariance_random(graph, rnd):
    nodes, sts = graph
    fresh = [f"z{i}x{rnd.randrange(10**6)}" for i, _ in enumerate(nodes)]
    mapping = dict(zip(nodes, fresh))
    perm = _relabel(sts, mapping)
    rnd.shuffle(perm)
    try:
        base = canonical_nquads(sts)
    except C14nLimitError:
        # permuted copy must hit the same bound (determinism of the
        # failure is part of the contract)
        with pytest.raises(C14nLimitError):
            canonical_nquads(perm)
        return
    assert canonical_nquads(perm) == base
