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


# ---- ANF / neighborhood function -----------------------------------

import hashlib

from serd_spark.operators.graph import (
    _ANF_LIN,
    _ANF_M,
    _ANF_NUM,
    neighborhood_function,
)


def _anf_py(edges, n_rounds):
    """Independent replay: EXACT balls per node, sketched and
    estimated with the identical md5/bucket/rho/denom arithmetic —
    the iterated max-merge must equal the sketch of the exact ball
    (HLL merge distributes over union)."""
    adj = {}
    nodes = set()
    for s, d in edges:
        nodes.update((s, d))
        if s != d:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)

    def ball(v, t):
        cur = {v}
        for _ in range(t):
            cur = cur | {w for u in cur for w in adj.get(u, ())}
        return cur

    def est(vals):
        regs = {}
        for v in vals:
            h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
            b = h >> 56
            w = h & ((1 << 56) - 1)
            rho = 57 - w.bit_length() if w else 57
            regs[b] = max(regs.get(b, 0), rho)
        denom = sum(1 << (57 - r) for r in regs.values())
        denom += (_ANF_M - len(regs)) * (1 << 57)
        zero = _ANF_M - len(regs)
        raw = _ANF_NUM / denom
        if zero > 0 and raw <= 2.5 * _ANF_M:
            return _ANF_LIN[zero]
        return int(raw)

    return {
        t: (len(nodes), sum(est(ball(v, t)) for v in nodes))
        for t in range(n_rounds + 1)
    }


def test_anf_matches_exact_ball_replay(spark):
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0), (2, 5), (6, 7)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.t: (r.n_nodes, r.pairs_est)
        for r in neighborhood_function(df, n_rounds=3).collect()
    }
    assert got == _anf_py(edges, 3)


def test_anf_monotone_and_saturates(spark):
    n = 10
    edges = [(i, (i + 1) % n) for i in range(n)]
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = sorted(
        (r.t, r.pairs_est)
        for r in neighborhood_function(df, n_rounds=6).collect()
    )
    vals = [v for _, v in rows]
    assert all(a <= b for a, b in zip(vals, vals[1:]))
    # cycle of 10: balls saturate at t=5; t=5 == t=6
    assert vals[5] == vals[6]


def test_anf_directed_balls(spark):
    # directed path: node 0 reaches all, node 2 reaches only itself
    edges = [(0, 1), (1, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.t: r.pairs_est
        for r in neighborhood_function(
            df, n_rounds=2, undirected=False
        ).collect()
    }
    # replay with directed balls
    import hashlib as _h

    def est_set(vals):
        regs = {}
        for v in vals:
            h = int(_h.md5(str(v).encode()).hexdigest()[:15], 16)
            b, w = h >> 56, h & ((1 << 56) - 1)
            rho = 57 - w.bit_length() if w else 57
            regs[b] = max(regs.get(b, 0), rho)
        denom = sum(1 << (57 - r) for r in regs.values()) + (
            _ANF_M - len(regs)
        ) * (1 << 57)
        zero = _ANF_M - len(regs)
        raw = _ANF_NUM / denom
        return _ANF_LIN[zero] if zero and raw <= 40.0 else int(raw)

    balls = {0: [{0}, {0, 1}, {0, 1, 2}], 1: [{1}, {1, 2}, {1, 2}],
             2: [{2}, {2}, {2}]}
    for t in range(3):
        assert got[t] == sum(est_set(balls[v][t]) for v in balls)
