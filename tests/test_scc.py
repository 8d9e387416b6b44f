"""Strongly connected components (operators/graph.py::scc): hand
graphs, DAG/self-loop edges, and randomized comparison against an
independent Tarjan implementation."""

import random

import pytest

from serd_spark.operators.graph import scc


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {int(r.node): int(r.scc) for r in scc(df, **kw).collect()}


def _tarjan(edges):
    """Reference SCC (iterative Tarjan), scc id = min member."""
    adj: dict[int, list[int]] = {}
    nodes = set()
    for s, d in edges:
        nodes.update((s, d))
        if s != d:
            adj.setdefault(s, []).append(d)
    index = {}
    low = {}
    on_stack = set()
    stack = []
    comp = {}
    counter = [0]

    def strongconnect(v0):
        work = [(v0, 0)]
        while work:
            v, pi = work.pop()
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack.add(v)
            recurse = False
            succ = adj.get(v, [])
            for i in range(pi, len(succ)):
                w = succ[i]
                if w not in index:
                    work.append((v, i + 1))
                    work.append((w, 0))
                    recurse = True
                    break
                if w in on_stack:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                members = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    members.append(w)
                    if w == v:
                        break
                m = min(members)
                for w in members:
                    comp[w] = m
            if work:
                pv = work[-1][0]
                low[pv] = min(low[pv], low[v])

    for v in sorted(nodes):
        if v not in index:
            strongconnect(v)
    return comp


def test_two_cycles_and_tail(spark):
    edges = [
        (0, 1), (1, 2), (2, 0),        # 3-cycle {0,1,2}
        (2, 10), (10, 11), (11, 10),   # DAG edge into 2-cycle {10,11}
        (11, 20), (20, 21),            # tail path 20 -> 21
    ]
    got = _run(spark, edges)
    assert got == {0: 0, 1: 0, 2: 0, 10: 10, 11: 10, 20: 20, 21: 21}
    assert got == _tarjan(edges)


def test_pure_dag_all_singletons(spark):
    edges = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)]
    got = _run(spark, edges)
    assert got == {i: i for i in range(5)}


def test_self_loop_and_isolated_pair(spark):
    edges = [(5, 5), (7, 8)]
    got = _run(spark, edges)
    assert got == {5: 5, 7: 7, 8: 8}


def test_single_giant_cycle(spark):
    n = 12
    edges = [(i, (i + 1) % n) for i in range(n)]
    got = _run(spark, edges)
    assert got == {i: 0 for i in range(n)}


def test_nested_structure_matches_tarjan(spark):
    # cycle with an internal chord plus an appendix cycle
    edges = [
        (0, 1), (1, 2), (2, 3), (3, 0), (1, 3),
        (3, 4), (4, 5), (5, 4), (5, 6),
    ]
    assert _run(spark, edges) == _tarjan(edges)


@pytest.mark.parametrize("seed", [1, 7])
def test_random_graphs_match_tarjan(spark, seed):
    rnd = random.Random(seed)
    n = 24
    edges = sorted(
        {(rnd.randrange(n), rnd.randrange(n)) for _ in range(60)}
    )
    got = _run(spark, edges, max_outer=30, max_prop=80)
    assert got == _tarjan(edges)


def test_round_cap_raises(spark):
    # chain of 2-cycles: condensation depth 5 > max_outer 2
    edges = []
    for g in range(5):
        a, b = 2 * g, 2 * g + 1
        edges += [(a, b), (b, a)]
        if g:
            edges.append((a - 2, a))
    with pytest.raises(ValueError, match="condensation depth"):
        _run(spark, edges, max_outer=2)
