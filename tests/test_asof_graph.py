"""as-of join (operators/asof.py) and integer PageRank
(operators/graph.py)."""

import pytest
from datetime import datetime

from serd_spark.operators.asof import asof_join
from serd_spark.operators.graph import pagerank


def _ts(s):
    return datetime.fromisoformat(s)


def _events(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long, v string")


def test_asof_basic_latest_at_or_before(spark):
    left = _events(
        spark,
        [
            (1, _ts("2024-01-01 10:00:05"), 100, "c1"),
            (1, _ts("2024-01-01 10:00:01"), 101, "c2"),
            (2, _ts("2024-01-01 09:00:00"), 102, "c3"),  # no prior right
        ],
    )
    right = _events(
        spark,
        [
            (1, _ts("2024-01-01 10:00:00"), 200, "v1"),
            (1, _ts("2024-01-01 10:00:03"), 201, "v2"),
            (2, _ts("2024-01-01 09:30:00"), 202, "v3"),  # after the click
        ],
    )
    out = {
        r["event_id"]: r
        for r in asof_join(left, right, on="user_id", ts="ts", tie_col="event_id").collect()
    }
    assert out[100]["event_id_r"] == 201 and out[100]["v_r"] == "v2"
    assert out[101]["event_id_r"] == 200
    assert out[102]["event_id_r"] is None and out[102]["ts_r"] is None


def test_asof_equal_ts_inclusive_and_tiebreak(spark):
    t = _ts("2024-01-01 12:00:00")
    left = _events(spark, [(1, t, 100, "c")])
    right = _events(spark, [(1, t, 200, "a"), (1, t, 201, "b")])
    out = asof_join(left, right, on="user_id", ts="ts", tie_col="event_id").collect()
    # same-instant rows are eligible; max event_id wins the tie
    assert out[0]["event_id_r"] == 201 and out[0]["v_r"] == "b"


def test_asof_carried_columns_not_torn(spark):
    # the LATEST right row has a NULL payload column: the match must
    # carry (event_id=201, v=None) — not event_id from row 201 with v
    # backfilled from row 200.
    left = _events(spark, [(1, _ts("2024-01-01 12:00:10"), 100, "c")])
    right = _events(
        spark,
        [
            (1, _ts("2024-01-01 12:00:01"), 200, "keep"),
            (1, _ts("2024-01-01 12:00:02"), 201, None),
        ],
    )
    out = asof_join(left, right, on="user_id", ts="ts", tie_col="event_id").collect()
    assert out[0]["event_id_r"] == 201 and out[0]["v_r"] is None


def _pagerank_py(edges, n_iter=5, damping_pct=85):
    """Independent integer replay of the documented arithmetic."""
    und = set()
    for s, d in edges:
        und.add((s, d))
        und.add((d, s))
    nodes = sorted({s for s, _ in und} | {d for _, d in und})
    deg = {}
    for s, _ in und:
        deg[s] = deg.get(s, 0) + 1
    n = len(nodes)
    base = (1_000_000 * (100 - damping_pct)) // (100 * n)
    r = {v: 1_000_000 // n for v in nodes}
    for _ in range(n_iter):
        inflow = {v: 0 for v in nodes}
        for s, d in und:
            inflow[d] += r[s] // deg[s]
        r = {v: base + (damping_pct * inflow[v]) // 100 for v in nodes}
    return r


def test_pagerank_matches_independent_integer_replay(spark):
    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (5, 6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank_micros"] for r in pagerank(df, n_iter=5).collect()}
    assert got == _pagerank_py(edges, n_iter=5)


def test_pagerank_star_center_dominates(spark):
    edges = [(0, i) for i in range(1, 6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank_micros"] for r in pagerank(df, n_iter=3).collect()}
    assert got[0] > max(got[i] for i in range(1, 6))
    # leaves are symmetric
    assert len({got[i] for i in range(1, 6)}) == 1


def test_pagerank_directed_keeps_sink_nodes(spark):
    # 3 is a pure sink (dst-only): it must still be ranked, and rank
    # higher than the symmetric sources feeding it
    edges = [(1, 3), (2, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["rank_micros"]
        for r in pagerank(df, n_iter=3, undirected=False).collect()
    }
    assert set(got) == {1, 2, 3}
    assert got[3] > got[1] == got[2]
    # sink mass is not redistributed: total strictly under one unit
    assert sum(got.values()) < 1_000_000


def test_asof_null_right_ts_never_matches(spark):
    left = _events(spark, [(1, _ts("2024-01-01 10:00:00"), 1, "c")])
    right = spark.createDataFrame(
        [(1, None, 9, "v")], "user_id long, ts timestamp, event_id long, v string"
    )
    out = asof_join(left, right, on="user_id", ts="ts", tie_col="event_id").collect()
    assert len(out) == 1 and out[0]["event_id_r"] is None


def test_pagerank_empty_edges(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert pagerank(df, n_iter=2).count() == 0


def test_triangle_count_known_graphs(spark):
    from serd_spark.operators.graph import triangle_count

    # K4 (4 triangles) + a disjoint path a-b-c (0), duplicate and
    # reversed edges and a self-loop must not change the count
    k4 = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    noise = [(1, 0), (2, 2), (3, 2)]  # reversed dup, self-loop, dup
    path = [(10, 11), (11, 12)]
    df = spark.createDataFrame(k4 + noise + path, ["src", "dst"])
    row = triangle_count(df).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_triangles) == (7, 8, 4)

    # triangle + pendant: exactly one triangle, hub degree handled
    tri = [(0, 1), (1, 2), (0, 2), (2, 3), (2, 4), (2, 5)]
    row = triangle_count(
        spark.createDataFrame(tri, ["src", "dst"])
    ).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_triangles) == (6, 6, 1)

    # empty graph
    empty = spark.createDataFrame([], "src long, dst long")
    row = triangle_count(empty).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_triangles) == (0, 0, 0)


def test_k_core_peels_to_fixpoint(spark):
    from serd_spark.operators.graph import k_core

    # K4 (every node degree 3) + a tail 3-4-5 hanging off node 3's
    # twin: tail nodes peel away under k=2 in cascading rounds
    k4 = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    tail = [(3, 10), (10, 11), (11, 12)]
    df = spark.createDataFrame(k4 + tail, ["src", "dst"])
    core = {r.node: r.deg for r in k_core(df, k=2, n_rounds=6).collect()}
    assert core == {0: 3, 1: 3, 2: 3, 3: 3}  # only K4 survives k=2
    # k=4 empties K4 entirely
    assert k_core(df, k=4, n_rounds=6).count() == 0
    # fixpoint: extra rounds change nothing
    more = {r.node: r.deg for r in k_core(df, k=2, n_rounds=12).collect()}
    assert more == core
    # a cycle is exactly its own 2-core, tail gone
    cyc = [(0, 1), (1, 2), (2, 0), (0, 9)]
    got = {r.node: r.deg for r in
           k_core(spark.createDataFrame(cyc, ["src", "dst"]),
                  k=2, n_rounds=4).collect()}
    assert got == {0: 2, 1: 2, 2: 2}


def test_label_propagation_two_cliques(spark):
    from serd_spark.operators.graph import label_propagation

    # two K4 cliques joined by one bridge edge: each clique converges
    # to its own min label; the bridge does not merge them
    a = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    b = [(i + 10, j + 10) for i, j in a]
    df = spark.createDataFrame(a + b + [(3, 10)], ["src", "dst"])
    lab = {r.node: r.label for r in label_propagation(df, n_iter=5).collect()}
    assert {lab[i] for i in range(4)} == {0}
    assert {lab[i + 10] for i in range(4)} == {10}
    # deterministic under re-run
    lab2 = {r.node: r.label for r in label_propagation(df, n_iter=5).collect()}
    assert lab2 == lab


def _hits_py(edges, n_iter=3):
    """Independent integer replay of graph.py::hits' documented
    arithmetic: quantized-L1 normalization — floor-divide each raw
    vector by greatest(1, sum // 1e6)."""
    e = {(s, d) for s, d in edges if s != d}
    nodes = sorted({s for s, _ in e} | {d for _, d in e})
    hub = {v: 1_000_000 for v in nodes}

    def _norm(raw):
        div = max(1, sum(raw.values()) // 1_000_000)
        return {v: raw.get(v, 0) // div for v in nodes}

    for _ in range(n_iter):
        a_raw = {}
        for s, d in e:
            a_raw[d] = a_raw.get(d, 0) + hub[s]
        auth = _norm(a_raw)
        h_raw = {}
        for s, d in e:
            h_raw[s] = h_raw.get(s, 0) + auth[d]
        hub = _norm(h_raw)
    return hub, auth


def test_hits_matches_independent_integer_replay(spark):
    from serd_spark.operators.graph import hits

    edges = [(1, 2), (1, 3), (4, 3), (4, 2), (2, 5), (3, 5), (6, 7)]
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = hits(df, n_iter=3).collect()
    got_h = {r["node"]: r["hub_micros"] for r in rows}
    got_a = {r["node"]: r["auth_micros"] for r in rows}
    exp_h, exp_a = _hits_py(edges, n_iter=3)
    assert got_h == exp_h and got_a == exp_a


def test_hits_bipartite_hub_authority_asymmetry(spark):
    from serd_spark.operators.graph import hits

    # directory pages 0,1 each link to content pages 10..13: the
    # directories must score as hubs (0 authority), the content as
    # authorities (0 hub) — the asymmetry PageRank can't express
    edges = [(h, a) for h in (0, 1) for a in (10, 11, 12, 13)]
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = hits(df, n_iter=3).collect()
    hub = {r["node"]: r["hub_micros"] for r in rows}
    auth = {r["node"]: r["auth_micros"] for r in rows}
    assert hub[0] == hub[1] > 0 and auth[0] == auth[1] == 0
    assert auth[10] == auth[13] > 0 and hub[10] == 0
    # self-loops and duplicate edges are ignored
    df2 = spark.createDataFrame(edges + [(0, 0), (0, 10)], "src long, dst long")
    rows2 = hits(df2, n_iter=3).collect()
    assert {(r["node"], r["hub_micros"], r["auth_micros"]) for r in rows2} == {
        (r["node"], r["hub_micros"], r["auth_micros"]) for r in rows
    }


def test_hits_empty_edges(spark):
    from serd_spark.operators.graph import hits

    df = spark.createDataFrame([], "src long, dst long")
    assert hits(df, n_iter=2).count() == 0


def test_negative_samples_deterministic_and_flagged(spark):
    import hashlib

    from pyspark.sql import functions as F

    from serd_spark.operators.graph import negative_samples

    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("d", "b")], "src string, dst string"
    )
    out = negative_samples(edges, n_neg=2, n_buckets=4).collect()
    assert len(out) == 6  # fixed x2 explode

    def bucket(x):
        return int(hashlib.md5(x.encode()).hexdigest()[:8], 16) % 4

    reps = {}
    for n in ["a", "b", "c", "d"]:
        b = bucket(n)
        reps[b] = min(reps.get(b, n), n)
    for r in out:
        b = bucket(f"{r['src']}|{r['dst']}#{r['j']}")
        expect = reps.get(b, "a")  # global min fallback
        assert r["neg_dst"] == expect
        assert r["is_self"] == int(r["neg_dst"] == r["dst"])
    # identical call → identical rows (pure function of the edge set)
    again = negative_samples(edges, n_neg=2, n_buckets=4).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


# ---- personalized PageRank / TrustRank ------------------------------


def _ppr_py(edges, seeds, n_iter=5, damping_pct=85):
    """Independent integer replay of graph.py::personalized_pagerank
    (directed, seeded teleport)."""
    e = sorted(set(edges))
    nodes = sorted({s for s, _ in e} | {d for _, d in e})
    seeds = sorted(set(seeds) & set(nodes))
    deg = {}
    for s, _ in e:
        deg[s] = deg.get(s, 0) + 1
    base = (1_000_000 * (100 - damping_pct)) // (100 * len(seeds))
    r = {v: (1_000_000 // len(seeds) if v in seeds else 0) for v in nodes}
    for _ in range(n_iter):
        inflow = {v: 0 for v in nodes}
        for s, d in e:
            inflow[d] += r[s] // deg[s]
        r = {
            v: (base if v in seeds else 0)
            + (damping_pct * inflow[v]) // 100
            for v in nodes
        }
    return r


def test_ppr_matches_independent_integer_replay(spark):
    from serd_spark.operators.graph import personalized_pagerank

    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 4), (6, 1)]
    seeds = [1, 6]
    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame([(x,) for x in seeds], "node long")
    got = {
        r["node"]: r["rank_micros"]
        for r in personalized_pagerank(e, s, n_iter=5).collect()
    }
    assert got == _ppr_py(edges, seeds, n_iter=5)


def test_ppr_trust_decays_with_distance_and_spam_scores_zero(spark):
    from serd_spark.operators.graph import personalized_pagerank

    # chain from the seed + a disconnected 2-cycle "link farm"
    edges = [(0, 1), (1, 2), (2, 3), (10, 11), (11, 10)]
    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame([(0,)], "node long")
    got = {
        r["node"]: r["rank_micros"]
        for r in personalized_pagerank(e, s, n_iter=6).collect()
    }
    assert got[0] > got[1] > got[2] > got[3]
    # unreachable from any seed: exactly zero trust, however cyclic
    assert got[10] == 0 and got[11] == 0


def test_ppr_seed_outside_graph_dropped_and_empty_seeds_raise(spark):
    from serd_spark.operators.graph import personalized_pagerank

    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    s = spark.createDataFrame([(1,), (99,)], "node long")
    got = {
        r["node"]: r["rank_micros"]
        for r in personalized_pagerank(e, s, n_iter=2).collect()
    }
    # 99 is not a graph node: teleport mass goes wholly to node 1
    assert set(got) == {1, 2} and got[1] > 0
    s_bad = spark.createDataFrame([(99,)], "node long")
    with pytest.raises(ValueError, match="no seed"):
        personalized_pagerank(e, s_bad, n_iter=1)
