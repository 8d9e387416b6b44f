"""bfs_distance / random_walks / link_predict — hand-computed
expectations on tiny graphs, plus the determinism properties the
cross-engine oracles rely on."""

import hashlib

from serd_spark.operators.graph import bfs_distance, link_predict, random_walks


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _seeds(spark, nodes):
    return spark.createDataFrame([(n,) for n in nodes], "node long")


# ---------------------------------------------------------------- BFS

def test_bfs_path_graph_hop_distances(spark):
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    got = dict(
        bfs_distance(e, _seeds(spark, [1]), n_rounds=4).collect()
    )
    assert got == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4}


def test_bfs_multi_seed_takes_min_distance(spark):
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    got = dict(
        bfs_distance(e, _seeds(spark, [1, 5]), n_rounds=4).collect()
    )
    assert got == {1: 0, 5: 0, 2: 1, 4: 1, 3: 2}


def test_bfs_rounds_cap_limits_reach(spark):
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    got = dict(
        bfs_distance(e, _seeds(spark, [1]), n_rounds=2).collect()
    )
    assert got == {1: 0, 2: 1, 3: 2}


def test_bfs_directed_respects_edge_direction(spark):
    e = _edges(spark, [(1, 2), (2, 3)])
    got = dict(
        bfs_distance(
            e, _seeds(spark, [2]), n_rounds=3, undirected=False
        ).collect()
    )
    assert got == {2: 0, 3: 1}


def test_bfs_extra_rounds_are_noops(spark):
    e = _edges(spark, [(1, 2), (2, 3)])
    a = dict(bfs_distance(e, _seeds(spark, [1]), n_rounds=2).collect())
    b = dict(bfs_distance(e, _seeds(spark, [1]), n_rounds=6).collect())
    assert a == b == {1: 0, 2: 1, 3: 2}


# -------------------------------------------------------------- walks

def _md5_pick(start, w, t, deg):
    h = hashlib.md5(f"{start}#{w}#{t}".encode()).hexdigest()
    return int(h[:8], 16) % deg + 1


def test_random_walks_match_reference_replay(spark):
    # triangle 1-2-3, mirrored: every node's neighbors sorted asc
    e = _edges(spark, [(1, 2), (2, 3), (1, 3)])
    nbrs = {1: [2, 3], 2: [1, 3], 3: [1, 2]}
    got = {
        (r.start, r.w, r.step): r.node
        for r in random_walks(e, walk_len=2, walks_per_node=2).collect()
    }
    for start in (1, 2, 3):
        for w in (0, 1):
            cur = start
            assert got[(start, w, 0)] == start
            for t in (1, 2):
                cur = nbrs[cur][_md5_pick(start, w, t, 2) - 1]
                assert got[(start, w, t)] == cur
    assert len(got) == 3 * 2 * 3  # nodes × replicas × (walk_len + 1)


def test_random_walks_deterministic_across_runs(spark):
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)])
    a = sorted(map(tuple, random_walks(e, 3, 1).collect()))
    b = sorted(map(tuple, random_walks(e, 3, 1).collect()))
    assert a == b and len(a) == 4 * 4


def test_random_walks_steps_follow_edges(spark):
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 1)])
    adj = {1: {2, 4}, 2: {1, 3}, 3: {2, 4}, 4: {1, 3}}
    rows = random_walks(e, walk_len=3, walks_per_node=1).collect()
    pos = {(r.start, r.step): r.node for r in rows}
    for start in (1, 2, 3, 4):
        for t in (1, 2, 3):
            assert pos[(start, t)] in adj[pos[(start, t - 1)]]


# ------------------------------------------------------- link predict

AA2 = 10**12 // 693147  # AA micros of one deg-2 center: 1e12 div ln(2)e6


def test_link_predict_cycle4_hand_computed(spark):
    # cycle 1-2-3-4: non-adjacent pairs (1,3) and (2,4), cn=2 each,
    # every center deg 2
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 1)])
    got = sorted(
        (r.a, r.b, r.cn, r.aa_micros)
        for r in link_predict(e, min_cn=2).collect()
    )
    assert got == [(1, 3, 2, 2 * AA2), (2, 4, 2, 2 * AA2)]


def test_link_predict_excludes_existing_edges(spark):
    # triangle + pendant: all 2-hop pairs among {1,2,3} are adjacent
    e = _edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
    got = {(r.a, r.b) for r in link_predict(e, min_cn=1).collect()}
    assert (1, 2) not in got and (2, 3) not in got and (1, 3) not in got
    assert got == {(1, 4), (2, 4)}  # via center 3


def test_link_predict_hub_cap_drops_mega_center(spark):
    # star center 0 with 5 leaves: with the cap below 5 no wedge
    # survives; without it every leaf pair scores
    star = [(0, i) for i in range(1, 6)]
    e = _edges(spark, star)
    assert link_predict(e, max_center_deg=4, min_cn=1).count() == 0
    assert link_predict(e, max_center_deg=5, min_cn=1).count() == 10


def test_link_predict_topk_total_order(spark):
    # two wedges: pair (1,3) via two centers beats (4,6) via one
    e = _edges(spark, [(1, 2), (2, 3), (1, 7), (7, 3), (4, 5), (5, 6)])
    rows = link_predict(e, min_cn=1, top_k=1).collect()
    assert [(r.a, r.b, r.cn) for r in rows] == [(1, 3, 2)]


def test_sssp_prefers_light_multi_hop(spark):
    from serd_spark.operators.graph import sssp

    edges = spark.createDataFrame(
        [(0, 1, 10), (0, 2, 1), (2, 1, 2), (1, 3, 1), (0, 3, 100),
         (4, 5, 7), (3, 3, 0), (0, 2, 5)],
        "src long, dst long, w long",
    )
    seeds = spark.createDataFrame([(0,)], "node long")
    out = {r.node: r.dist for r in sssp(edges, seeds, n_rounds=4).collect()}
    # 0->2->1 (3) beats the direct edge (10); 0->2->1->3 (4) beats
    # 0->3 (100); nodes 4,5 unreachable and absent; parallel edge
    # (0,2,5) min-collapsed under (0,2,1)
    assert out == {0: 0, 1: 3, 2: 1, 3: 4}


def test_sssp_round_cap_limits_hops(spark):
    from serd_spark.operators.graph import sssp

    edges = spark.createDataFrame(
        [(0, 1, 10), (0, 2, 1), (2, 1, 2), (1, 3, 1)],
        "src long, dst long, w long",
    )
    seeds = spark.createDataFrame([(0,)], "node long")
    out = {r.node: r.dist for r in sssp(edges, seeds, n_rounds=2).collect()}
    # within 2 hops the best route to 3 is 0->1->3 = 11; the cheaper
    # 3-hop route is out of budget
    assert out == {0: 0, 1: 3, 2: 1, 3: 11}


def test_sssp_multi_source_and_negative_filtered(spark):
    from serd_spark.operators.graph import sssp

    edges = spark.createDataFrame(
        [(0, 1, 4), (9, 1, 1), (1, 2, -5)],
        "src long, dst long, w long",
    )
    seeds = spark.createDataFrame([(0,), (9,)], "node long")
    out = {r.node: r.dist for r in sssp(edges, seeds, n_rounds=3).collect()}
    # nearest seed wins; the negative edge is dropped, not traversed
    assert out == {0: 0, 9: 0, 1: 1}


def test_assortativity_known_graphs(spark):
    from serd_spark.operators.graph import assortativity

    # star graph: hub degree 4, leaves degree 1 -> strongly negative
    star = spark.createDataFrame(
        [(0, i) for i in range(1, 5)], "src long, dst long"
    )
    r = assortativity(star).collect()[0]
    assert r["n"] == 8 and r["r_micro"] == -1_000_000
    # two disjoint equal-degree cliques (triangles): every endpoint
    # degree equal -> zero variance -> r undefined (null)
    tri = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3)],
        "src long, dst long",
    )
    r2 = assortativity(tri).collect()[0]
    assert r2["r_micro"] is None and r2["n"] == 12
    # python replay on a mixed graph
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (3, 4), (4, 5)]
    mixed = spark.createDataFrame(edges, "src long, dst long")
    got = assortativity(mixed).collect()[0]
    und = edges + [(b, a) for a, b in edges]
    from collections import Counter

    deg = Counter(a for a, _ in und)
    xs = [deg[a] for a, b in und]
    ys = [deg[b] for a, b in und]
    n = len(und)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx, syy = sum(x * x for x in xs), sum(y * y for y in ys)
    num = n * sxy - sx * sy
    den = ((n * sxx - sx * sx) ** 0.5) * ((n * syy - sy * sy) ** 0.5)
    assert got["r_micro"] == round(num / den * 1e6)
    assert (got["sx"], got["sxy"], got["sxx"]) == (sx, sxy, sxx)
