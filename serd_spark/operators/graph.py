"""Iterative graph ranking over an edge table — hub-entity scoring
for the constructed KG (which entities dominate the link graph), the
same shape GraphX/Pregel jobs use, re-expressed as DataFrame joins so
it runs on plain Spark SQL with AQE.

Determinism across engines: PageRank is a float fixpoint, and float
summation order differs between Spark and any mirror — so every
quantity here is INTEGER MICROS with floor division at each step
(contribution = r // deg, damping = (d_pct * inflow) // 100). Integer
sums are associative, so the DuckDB oracle replaying the same
iterations over the same parquet matches bit-for-bit. The floor bias
(< 1 micro per step) is irrelevant for a ranking signal.

Scale shape: the degree-annotated edge table is built ONCE and
localCheckpointed; each iteration is one hash join (ranks × edges on
src — ranks is nodes-sized, i.e. tiny next to edges, so AQE
broadcasts it when it fits) plus one partial-combining aggregate on
dst. Lineage is cut every ``checkpoint_every`` iterations so the plan
stays bounded at any iteration count without paying a per-iteration
materialization barrier. No driver-side collect anywhere: the only
scalar is the node count (one agg job).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RANK_UNIT = 1_000_000  # total rank mass of 1.0, in micros


def pagerank(
    edges: DataFrame,
    n_iter: int = 5,
    damping_pct: int = 85,
    undirected: bool = True,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 8,
) -> DataFrame:
    """PageRank over an edge list; returns (node, rank_micros).

    ``edges`` — (src, dst) pairs; parallel edges are collapsed.
    ``undirected=True`` mirrors every edge (the entity-link graph is
    symmetric). ``damping_pct`` is the damping factor in percent so
    the arithmetic stays integral. Isolated nodes never appear (an
    edge list has no degree-0 nodes once mirrored); dangling nodes
    cannot exist in an undirected graph, so no dangling-mass term.
    With ``undirected=False`` sink nodes (dst-only) are ranked but
    their mass is not redistributed — the common simplification;
    ranks then sum to less than RANK_UNIT.

    ``checkpoint_every``: lineage is cut every K iterations, not every
    iteration — a localCheckpoint is an RDD materialization barrier
    and MEASURED 2.4× slower end-to-end when taken per iteration at
    sf0.1 (6.62 s → 2.78 s with no mid-loop cuts for n_iter=5); a
    handful of nested join+agg rounds is nothing to the optimizer,
    so cuts only pay for themselves on LONG runs where the plan would
    otherwise grow unboundedly. 0 disables mid-loop cuts entirely.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if undirected:
        e = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    e = e.distinct()

    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # one wide table reused every iteration: (src, dst, deg)
    edges_deg = e.join(deg, "src").localCheckpoint(eager=False)
    # mirrored edges put every node in src; a DIRECTED graph also has
    # sink nodes that only ever appear as dst — they must still hold
    # rank mass (their absent out-edges leak mass, the standard
    # no-dangling-redistribution simplification; documented).
    nodes_col = e.select(F.col("src").alias("node"))
    if not undirected:
        nodes_col = nodes_col.unionByName(e.select(F.col("dst").alias("node")))
    nodes = nodes_col.distinct().localCheckpoint(eager=False)

    n = nodes.count()
    if n == 0:  # empty edge table: empty ranks, not ZeroDivisionError
        return nodes.withColumn("rank_micros", F.lit(0).cast("long"))
    base = (RANK_UNIT * (100 - damping_pct)) // (100 * n)
    ranks = nodes.withColumn("rank_micros", F.lit(RANK_UNIT // n).cast("long"))

    for it in range(n_iter):
        contrib = edges_deg.join(
            ranks.withColumnRenamed("node", "src"), "src"
        ).select(
            F.col("dst").alias("node"),
            F.floor(F.col("rank_micros") / F.col("deg")).cast("long").alias("c"),
        )
        inflow = contrib.groupBy("node").agg(F.sum("c").alias("inflow"))
        ranks = nodes.join(inflow, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.floor(
                    F.lit(damping_pct) * F.coalesce(F.col("inflow"), F.lit(0)) / 100
                )
            )
            .cast("long")
            .alias("rank_micros"),
        )
        if checkpoint_every and (it + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    n_iter: int = 5,
    damping_pct: int = 85,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "node",
    checkpoint_every: int = 8,
) -> DataFrame:
    """Personalized PageRank / TrustRank: PageRank with the teleport
    vector restricted to a trusted SEED set — the web-spam-demotion
    and topic-sensitive-ranking primitive (trust mass can only enter
    at seeds and flows along out-links, so link farms far from any
    seed score ~0 however densely they interlink).

    Same integer-micros discipline and per-iteration shape as
    ``pagerank`` (one hash join + one partial-combining aggregate per
    round; ranks is nodes-sized so AQE broadcasts it): seeds start
    with ``RANK_UNIT // n_seeds`` micros, non-seeds with 0; each round
    every node keeps ``floor(damping_pct * inflow / 100)`` and seeds
    additionally get the teleport term
    ``(RANK_UNIT * (100 - damping_pct)) // (100 * n_seeds)``. The
    graph is DIRECTED (trust flows along link direction); sink-node
    mass leaks, the same no-dangling-redistribution simplification as
    ``pagerank(undirected=False)``, documented there. Seeds not
    present in the edge set are dropped (they could neither receive
    nor forward mass). Pure integer arithmetic — bit-exact across
    engines, oracle-replayable as chained CTEs.

    Returns (node, rank_micros) for every graph node.
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    edges_deg = e.join(deg, "src").localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    seed_nodes = (
        seeds.select(F.col(seed_col).alias("node")).distinct().join(
            nodes, "node"
        )
    )
    # one flagged node table reused every iteration (seed membership
    # decides who receives teleport mass)
    flagged = nodes.join(
        seed_nodes.withColumn("is_seed", F.lit(True)), "node", "left"
    ).select(
        "node", F.coalesce("is_seed", F.lit(False)).alias("is_seed")
    ).localCheckpoint(eager=False)

    n_seeds = seed_nodes.count()
    if n_seeds == 0:
        raise ValueError(
            "personalized_pagerank: no seed appears in the edge set"
        )
    base = (RANK_UNIT * (100 - damping_pct)) // (100 * n_seeds)
    r0 = RANK_UNIT // n_seeds
    ranks = flagged.select(
        "node",
        F.when(F.col("is_seed"), F.lit(r0))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("rank_micros"),
    )
    for it in range(n_iter):
        contrib = edges_deg.join(
            ranks.withColumnRenamed("node", "src"), "src"
        ).select(
            F.col("dst").alias("node"),
            F.floor(F.col("rank_micros") / F.col("deg"))
            .cast("long")
            .alias("c"),
        )
        inflow = contrib.groupBy("node").agg(F.sum("c").alias("inflow"))
        ranks = flagged.join(inflow, "node", "left").select(
            "node",
            (
                F.when(F.col("is_seed"), F.lit(base)).otherwise(F.lit(0))
                + F.floor(
                    F.lit(damping_pct)
                    * F.coalesce(F.col("inflow"), F.lit(0))
                    / 100
                )
            )
            .cast("long")
            .alias("rank_micros"),
        )
        if checkpoint_every and (it + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Exact global triangle count via DEGREE-ORDERED ORIENTATION —
    the standard trick that keeps the wedge join near m^1.5 instead
    of sum(degree^2): canonicalize to undirected distinct edges,
    orient every edge from the (degree, id)-smaller endpoint to the
    larger, and count wedges (u→x, u→y with x before y in the same
    order) closed by an oriented edge x→y. Under that total order a
    triangle p<q<r orients p→q, p→r, q→r and is counted exactly once
    (the wedge at p). Hub nodes get LOW out-degree (≤ O(sqrt m)), so
    the self-join on the wedge source never explodes on skew — at
    100 TB this is the difference between a runnable job and a
    quadratic one. Everything is JVM joins/aggregates; AQE picks
    broadcast for the degree table when it fits.

    Returns one row: (n_nodes, n_edges, n_triangles).
    """
    und = (
        edges.select(
            F.least(src, dst).alias("a"), F.greatest(src, dst).alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("n"))
        .unionAll(und.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    e = und.join(
        deg.select(F.col("n").alias("a"), F.col("d").alias("da")), "a"
    ).join(deg.select(F.col("n").alias("b"), F.col("d").alias("db")), "b")
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = e.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
    ).localCheckpoint(eager=False)  # feeds the wedge join twice + close
    e1 = oriented.select(
        "u", F.col("v").alias("x"), F.col("dv").alias("dx")
    )
    e2 = oriented.select(
        "u", F.col("v").alias("y"), F.col("dv").alias("dy")
    )
    wedges = (
        e1.join(e2, "u")
        .filter(
            (F.col("dx") < F.col("dy"))
            | ((F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y")))
        )
        .select(F.col("x").alias("u"), F.col("y").alias("v"))
    )
    tri = wedges.join(oriented.select("u", "v"), ["u", "v"]).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    return (
        deg.agg(F.count(F.lit(1)).alias("n_nodes"))
        .crossJoin(und.agg(F.count(F.lit(1)).alias("n_edges")))
        .crossJoin(tri)
    )


def k_core(
    edges: DataFrame,
    k: int = 3,
    n_rounds: int = 8,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 4,
) -> DataFrame:
    """k-core subgraph via ``n_rounds`` of SYNCHRONOUS peeling: each
    round computes degrees over the surviving edge set and drops every
    node (with its incident edges) of degree < k. The round count is
    FIXED, not data-dependent — determinism across engines requires
    the mirror to replay the identical number of rounds, and a
    converged peel is a fixpoint, so extra rounds are no-ops (tests
    pin convergence by checking round n == round n+1). Peeling depth
    in web-scale graphs is small (degeneracy ordering removes whole
    shells per round); at 100 TB each round is one hash aggregate plus
    two semi-joins against a node set that only shrinks, and lineage
    is cut every ``checkpoint_every`` rounds (cf. ``pagerank``).

    Returns (node, deg): degrees over the edge set that survives all
    rounds (== the k-core when converged).
    """
    e = edges.select(
        F.least(src, dst).alias("a"), F.greatest(src, dst).alias("b")
    ).filter(
        (F.col("a") != F.col("b"))
        & F.col("a").isNotNull() & F.col("b").isNotNull()
    ).distinct()
    e = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=False)

    for r in range(n_rounds):
        deg = e.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
        keep = deg.filter(F.col("deg") >= k).select("a")
        e = (
            e.join(keep, "a", "left_semi")
            .join(keep.withColumnRenamed("a", "b"), "b", "left_semi")
            .select("a", "b")
        )
        if checkpoint_every and (r + 1) % checkpoint_every == 0:
            e = e.localCheckpoint(eager=False)
    return e.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )


def label_propagation(
    edges: DataFrame,
    n_iter: int = 5,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 4,
) -> DataFrame:
    """Community detection by synchronous label propagation: every
    node starts labeled with its own id; each iteration relabels every
    node with the MODE of its neighbors' labels, ties broken by the
    smallest label — a total order, so the result is a pure function
    of the edge set (classic LPA randomizes update order; that is
    unreproducible across engines and retries, so this is the
    deterministic synchronous variant — its known oscillation risk on
    bipartite structure is the caller's concern and irrelevant to
    determinism at a fixed iteration count).

    Scale shape: per iteration, one join (labels × edges on src —
    labels is nodes-sized, AQE broadcasts when it fits), one
    partial-combining (node, label) count aggregate, and the per-node
    argmax as a ``max_by(label, (cnt, -label))`` HASH aggregate —
    max of (cnt, -label) is exactly "count DESC, label ASC", and a
    hash agg with map-side partials beats a per-node sort-shuffle
    window (the repo's latest_crawl lesson). Lineage cut every
    ``checkpoint_every`` iterations.

    Returns (node, label).
    """
    e = edges.select(
        F.least(src, dst).alias("a"), F.greatest(src, dst).alias("b")
    ).filter(
        (F.col("a") != F.col("b"))
        & F.col("a").isNotNull() & F.col("b").isNotNull()
    ).distinct()
    e = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=False)

    labels = e.select(F.col("a").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    for it in range(n_iter):
        msgs = e.join(
            labels.withColumnRenamed("node", "a"), "a"
        ).select(F.col("b").alias("node"), "label")
        counts = msgs.groupBy("node", "label").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        labels = counts.groupBy("node").agg(
            F.max_by(
                "label", F.struct(F.col("cnt"), (-F.col("label")).alias("nl"))
            ).alias("label")
        )
        if checkpoint_every and (it + 1) % checkpoint_every == 0:
            labels = labels.localCheckpoint(eager=False)
    return labels


def hits(
    edges: DataFrame,
    n_iter: int = 3,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 4,
) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999) over a DIRECTED edge
    table; returns (node, hub_micros, auth_micros). The complement to
    ``pagerank`` for a web link graph: authorities are pages pointed
    AT by good hubs (content), hubs point TO good authorities
    (directories) — the asymmetry PageRank's single score collapses.

    Determinism across engines (same discipline as ``pagerank``):
    everything is integer micros. Classic HITS L2-normalizes each
    vector — a float sqrt no two engines sum identically — so this
    uses QUANTIZED L1 normalization: after each update the vector is
    floor-divided by ``greatest(1, sum div 1e6)``, bringing its total
    mass back to ~1e6 micros. One integer division per node by a
    global scalar — order-independent, replayable bit-for-bit, and
    overflow-safe without double-width products (raw values are
    bounded by 1e6 × max-degree, never multiplied up). Relative
    ranking — the thing HITS is for — is unaffected by the norm
    choice.

    Scale shape: per iteration two hash joins (the score table is
    nodes-sized — AQE broadcasts it when it fits) + two
    partial-combining aggregates + one single-row sum (broadcast back
    as a scalar). Lineage cut every ``checkpoint_every`` iterations;
    no driver collect anywhere.
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(
            F.col("src").isNotNull()
            & F.col("dst").isNotNull()
            & (F.col("src") != F.col("dst"))
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )

    def _normalized(raw: DataFrame, col: str) -> DataFrame:
        # quantized-L1: floor-divide by greatest(1, total div 1e6) so
        # the vector's mass returns to ~RANK_UNIT micros
        total = raw.agg(
            F.greatest(
                F.lit(1).cast("long"),
                F.expr(f"sum({col}) div {RANK_UNIT}").cast("long"),
            ).alias("_div")
        )
        return (
            nodes.join(raw, "node", "left")
            .join(F.broadcast(total))
            .select(
                "node",
                F.expr(f"coalesce({col}, 0L) div _div")
                .cast("long")
                .alias(col),
            )
        )

    hubs = nodes.withColumn("hub", F.lit(RANK_UNIT).cast("long"))
    auth = nodes.withColumn("auth", F.lit(0).cast("long"))
    for it in range(n_iter):
        a_raw = (
            e.join(hubs.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("hub").cast("long").alias("auth"))
        )
        auth = _normalized(a_raw, "auth")
        h_raw = (
            e.join(auth.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("auth").cast("long").alias("hub"))
        )
        hubs = _normalized(h_raw, "hub")
        if checkpoint_every and (it + 1) % checkpoint_every == 0:
            hubs = hubs.localCheckpoint(eager=False)
            auth = auth.localCheckpoint(eager=False)
    return hubs.join(auth, "node").select(
        "node",
        F.col("hub").alias("hub_micros"),
        F.col("auth").alias("auth_micros"),
    )


def _md5_bucket(col, salt: str, n: int):
    """md5-hex-prefix bucket in [0, n) — the repo's engine-neutral
    hash (CAST('0x'||substr(md5(x),1,8) AS BIGINT) % n in SQL)."""
    base = F.concat(col, F.lit(salt)) if salt else col
    return (
        F.conv(F.substring(F.md5(base), 1, 8), 16, 10).cast("long")
        % F.lit(int(n)).cast("long")
    )


def negative_samples(
    edges: DataFrame,
    n_neg: int = 2,
    n_buckets: int = 32,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Deterministic tail-corruption negative sampling — the
    KG-embedding training-data step (TransE-family models train on
    (s, o) positives against (s, o') corruptions; at corpus scale the
    sampler must be a pure function of the edge, not an RNG, or
    retries/shards silently change the training set).

    Scheme: every node gets an md5 bucket in [0, n_buckets); each
    bucket is represented by its MIN node id. Negative j of edge
    (s, o) is the representative of bucket md5(s '|' o '#' j) — a
    deterministic draw from the node set. An empty bucket falls back
    to the GLOBAL min node (pinned, engine-replayable); a corruption
    that lands on the true tail is kept but flagged ``is_self`` so
    the trainer can drop or resample it.

    Shape (100 TB): one distinct-node aggregate (node-table-sized),
    an n_buckets-row representative table + 1-row global-min —
    both broadcast — and a fixed ×n_neg explode of the edge table.
    No RNG, no window, no self-join.

    Returns (src, dst, j, neg_dst, is_self)."""
    if n_neg < 1 or n_buckets < 1:
        raise ValueError("need n_neg >= 1 and n_buckets >= 1")
    s, o = F.col(src), F.col(dst)
    nodes = (
        edges.select(s.alias("n"))
        .union(edges.select(o.alias("n")))
        .distinct()
    )
    reps = (
        nodes.groupBy(_md5_bucket(F.col("n"), "", n_buckets).alias("b"))
        .agg(F.min("n").alias("rep"))
    )
    gmin = nodes.agg(F.min("n").alias("gmin"))
    tagged = edges.select(s.alias(src), o.alias(dst)).withColumn(
        "j", F.explode(F.array(*[F.lit(j) for j in range(n_neg)]))
    )
    tb = _md5_bucket(
        F.concat(F.col(src), F.lit("|"), F.col(dst), F.lit("#"),
                 F.col("j").cast("string")),
        "",
        n_buckets,
    )
    return (
        tagged.withColumn("b", tb)
        .join(F.broadcast(reps), "b", "left")
        .crossJoin(F.broadcast(gmin))
        .select(
            src,
            dst,
            F.col("j").cast("int").alias("j"),
            F.coalesce(F.col("rep"), F.col("gmin")).alias("neg_dst"),
        )
        .withColumn(
            "is_self", (F.col("neg_dst") == F.col(dst)).cast("int")
        )
    )


def bfs_distance(
    edges: DataFrame,
    seeds: DataFrame,
    n_rounds: int = 4,
    undirected: bool = True,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "node",
) -> DataFrame:
    """Multi-source BFS hop distance — crawl depth from a seed set,
    the frontier-expansion step behind focused crawling, seed-biased
    corpus selection, and KG neighborhood extraction.

    FRONTIER-ONLY propagation (the BSP BFS every Pregel system runs):
    round r joins only the nodes settled in round r-1 against the
    edge table, then anti-joins the already-settled set — so total
    work across all rounds is one traversal of each reachable edge,
    not rounds × |E|. A naive "relax the whole distance table each
    round" re-sends every settled node per round and is the shape
    that dies at 100 TB.

    ``n_rounds`` is FIXED, not convergence-tested (determinism across
    engines: the mirror replays the identical round count; once the
    frontier empties further rounds are no-ops). Integer hop counts —
    nothing float anywhere. Each frontier is localCheckpointed: it
    feeds BOTH the next expansion join and the settled anti-join,
    and the cut keeps the per-round plan flat.

    Returns (node, dist) for every node within ``n_rounds`` hops of
    any seed; unreached nodes are absent (the caller left-joins if it
    wants NULL = unreachable).
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).filter(
        F.col("src").isNotNull() & F.col("dst").isNotNull()
    )
    if undirected:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    e = e.distinct().localCheckpoint(eager=False)

    frontier = (
        seeds.select(F.col(seed_col).alias("node"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    dist = frontier.withColumn("dist", F.lit(0).cast("int"))
    for r in range(1, n_rounds + 1):
        reached = (
            frontier.join(e, frontier.node == e.src)
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        frontier = reached.join(
            dist.select("node"), "node", "left_anti"
        ).localCheckpoint(eager=False)
        dist = dist.unionByName(
            frontier.withColumn("dist", F.lit(r).cast("int"))
        )
    return dist


def sssp(
    edges: DataFrame,
    seeds: DataFrame,
    n_rounds: int = 6,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    seed_col: str = "node",
) -> DataFrame:
    """Multi-source WEIGHTED shortest paths — Bellman-Ford with
    frontier-active relaxation (the Pregel SSSP): link-distance
    scoring from trusted seeds, weighted crawl-depth budgets, KG
    path-cost neighborhoods — the weighted sibling of
    ``bfs_distance`` (which this reduces to when every w = 1).

    Per round, ONLY nodes whose distance improved in the previous
    round relax their out-edges (frontier join → per-target min
    partial-agg), then a full-outer merge against the settled table
    keeps the elementwise minimum. Work per round is proportional to
    the improving frontier, not |V| — the "relax every node every
    round" textbook loop re-sends the whole distance table per round
    and is the shape that dies at 100 TB. Parallel edges are
    min-collapsed up front; weights must be non-negative integers
    (with negative edges Bellman-Ford needs |V|−1 full-relax rounds
    and the frontier shortcut is unsound — out of scope).

    ``n_rounds`` is FIXED (bfs_distance's determinism discipline: the
    cross-engine mirror replays the identical round count; once no
    distance improves further rounds are no-ops). A path using more
    than ``n_rounds`` edges is not discovered — callers size rounds
    to the hop diameter they care about. Integer arithmetic only.

    Returns (node, dist) for nodes reachable within ``n_rounds``
    hops; unreached nodes are absent.
    """
    e = (
        edges.select(
            F.col(src).alias("src"),
            F.col(dst).alias("dst"),
            F.col(weight).cast("long").alias("w"),
        )
        .filter(
            F.col("src").isNotNull()
            & F.col("dst").isNotNull()
            & (F.col("w") >= 0)
        )
        .groupBy("src", "dst")
        .agg(F.min("w").alias("w"))
        .localCheckpoint(eager=False)
    )
    dist = (
        seeds.select(F.col(seed_col).alias("node"))
        .distinct()
        .withColumn("dist", F.lit(0).cast("long"))
        .localCheckpoint(eager=False)
    )
    frontier = dist
    for _ in range(n_rounds):
        best = (
            frontier.join(e, frontier.node == e.src)
            .select(
                F.col("dst").alias("node"),
                (F.col("dist") + F.col("w")).alias("d"),
            )
            .groupBy("node")
            .agg(F.min("d").alias("d"))
        )
        merged = dist.join(best, "node", "full_outer").select(
            "node",
            F.col("dist").alias("_old"),
            F.col("d").alias("_new"),
        )
        # Spark least() skips NULLs (returns the least non-null), so
        # the full-outer merge needs no coalesce; _improved must pin
        # the NULL cases explicitly since < is NULL-propagating
        merged = merged.select(
            "node",
            F.least("_old", "_new").alias("dist"),
            (
                F.col("_new").isNotNull()
                & (
                    F.col("_old").isNull()
                    | (F.col("_new") < F.col("_old"))
                )
            ).alias("_improved"),
        ).localCheckpoint(eager=False)
        frontier = merged.filter("_improved").select("node", "dist")
        dist = merged.select("node", "dist")
    return dist


def random_walks(
    edges: DataFrame,
    walk_len: int = 3,
    walks_per_node: int = 1,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Deterministic uniform random walks — the DeepWalk/node2vec
    training-data generator (walks become "sentences" for a skip-gram
    embedder). At corpus scale the walker must be a pure function of
    (start, replica, step), NOT an RNG: retries, shard re-runs, and
    the cross-engine mirror all have to reproduce the identical walk
    (same discipline as ``negative_samples``).

    Step rule: at step t the walk (start s, replica w) sitting on
    node v moves to neighbor number ``md5(s '#' w '#' t) % deg(v)``
    in the (src, dst-ascending) indexed adjacency — an md5 draw the
    DuckDB mirror replays byte-for-byte.

    Scale shape: the indexed adjacency is built ONCE with a
    row_number window partitioned by src (one sort shuffle of the
    edge table — the standard adjacency-build cost) and
    localCheckpointed; the degree table is nodes-sized (AQE
    broadcasts it when it fits). Each step is then one join against
    deg (computes the pick) plus one EQUI-join on (src, idx) — never
    an explode of state × neighborhood, so hub nodes cost nothing
    extra. Mirrored-undirected adjacency means every node has deg ≥ 1:
    no dead ends, no dangling branch.

    Returns (start, w, step, node) — step 0 is the start node itself.
    """
    from pyspark.sql import Window

    if walk_len < 1 or walks_per_node < 1:
        raise ValueError("need walk_len >= 1 and walks_per_node >= 1")
    und = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).filter(
        F.col("src").isNotNull()
        & F.col("dst").isNotNull()
        & (F.col("src") != F.col("dst"))
    )
    und = und.unionByName(
        und.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    adj = und.withColumn(
        "idx", F.row_number().over(Window.partitionBy("src").orderBy("dst"))
    ).localCheckpoint(eager=False)
    deg = adj.groupBy("src").agg(F.max("idx").alias("deg"))

    state = (
        adj.select(F.col("src").alias("start"))
        .distinct()
        .withColumn(
            "w", F.explode(F.array(*[F.lit(j) for j in range(walks_per_node)]))
        )
        .withColumn("cur", F.col("start"))
    )
    out = state.select(
        "start", "w", F.lit(0).alias("step"), F.col("cur").alias("node")
    )
    for t in range(1, walk_len + 1):
        pick = (
            _md5_bucket(
                F.concat(
                    F.col("start").cast("string"),
                    F.lit("#"),
                    F.col("w").cast("string"),
                    F.lit("#"),
                    F.lit(str(t)),
                ),
                "",
                1 << 62,
            )
            % F.col("deg")
            + F.lit(1)
        )
        stepped = (
            state.join(deg, state.cur == deg.src)
            .withColumn("pick", pick)
            .select("start", "w", F.col("cur").alias("jsrc"), "pick")
        )
        state = (
            stepped.join(
                adj,
                (stepped.jsrc == adj.src) & (stepped.pick == adj.idx),
            )
            .select("start", "w", F.col("dst").alias("cur"))
            .localCheckpoint(eager=False)
        )
        out = out.unionByName(
            state.select(
                "start", "w", F.lit(t).alias("step"), F.col("cur").alias("node")
            )
        )
    return out.select(
        "start",
        F.col("w").cast("int").alias("w"),
        F.col("step").cast("int").alias("step"),
        "node",
    )


def link_predict(
    edges: DataFrame,
    max_center_deg: int = 64,
    min_cn: int = 2,
    top_k: int = 100,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Link prediction by common-neighbors + Adamic–Adar over the
    2-hop neighborhood — the KG-completion candidate generator
    (which unlinked pairs are most likely to be the same entity /
    a missing edge).

    Wedge enumeration through a center u costs C(deg(u), 2), so hub
    centers are CAPPED at ``max_center_deg``: a node linked to
    everything contributes no discriminative signal (its AA weight
    ~1/ln(deg) → 0 anyway) but would quadratically explode the join —
    the standard production mitigation, and the difference between a
    runnable and a quadratic job at 100 TB. Degrees are computed over
    the FULL graph; only wedge centers are filtered.

    Adamic–Adar in integers: each center contributes
    ``10^12 div round(ln(deg(u)) * 10^6)`` micros — ln pinned to
    integer micros per term before the sum (the ``dsir_weights``
    discipline), so the cross-center sum is associative and the
    DuckDB mirror matches bit-for-bit. A wedge center has deg ≥ 2 by
    construction, so ln ≥ ln 2 and the divisor is never 0.

    Returns the ``top_k`` non-adjacent pairs (a, b, cn,
    aa_micros) by (cn DESC, aa_micros DESC, a ASC, b ASC) — explicit
    total order, TakeOrderedAndProject plan.
    """
    und = (
        edges.select(
            F.least(src, dst).alias("a"), F.greatest(src, dst).alias("b")
        )
        .filter(
            (F.col("a") != F.col("b"))
            & F.col("a").isNotNull()
            & F.col("b").isNotNull()
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    m = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).select(F.col("a").alias("u"), F.col("b").alias("v"))
    deg = m.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    centers = (
        # deg >= 2: a deg-1 node can't center a wedge, and ln(1) = 0
        # would zero the AA divisor (ANSI divide-by-zero)
        deg.filter((F.col("deg") <= max_center_deg) & (F.col("deg") >= 2))
        .withColumn(
            "aa_term",
            F.expr(
                "cast(1000000000000 div "
                "cast(round(ln(deg) * 1000000) as bigint) as bigint)"
            ),
        )
        .select("u", "aa_term")
    )
    mm = m.join(centers, "u").localCheckpoint(eager=False)
    wedges = (
        mm.select("u", F.col("v").alias("x"), "aa_term")
        .join(mm.select("u", F.col("v").alias("y")), "u")
        .filter(F.col("x") < F.col("y"))
    )
    pairs = wedges.groupBy(
        F.col("x").alias("a"), F.col("y").alias("b")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("cn"),
        F.sum("aa_term").cast("long").alias("aa_micros"),
    )
    return (
        pairs.join(und, ["a", "b"], "left_anti")
        .filter(F.col("cn") >= min_cn)
        .orderBy(
            F.desc("cn"), F.desc("aa_micros"), F.col("a"), F.col("b")
        )
        .limit(top_k)
    )


_ANF_P = 4  # 16 registers per node — the ANF accuracy/width trade
_ANF_WBITS = 60 - _ANF_P
_ANF_SCALE = _ANF_WBITS + 1
_ANF_M = 1 << _ANF_P
# alpha(16) * m^2 * 2^scale — the HLL numerator as one float literal,
# injected verbatim into both engines
_ANF_NUM = 0.673 * _ANF_M * _ANF_M * float(1 << _ANF_SCALE)
# linear-counting branch, PRE-FLOORED in Python: floor(m*ln(m/V)) for
# every possible zero-register count V — the per-node estimate then
# needs no runtime transcendental at all, so no libm ulp difference
# between engines can ever flip a floor
_ANF_LIN = {v: int(_ANF_M * math.log(_ANF_M / v))
            for v in range(1, _ANF_M)}


def _anf_est_expr() -> str:
    """Per-node estimate from (n_regs, denom) — shared Spark/DuckDB
    SQL text (both parse the identical expression)."""
    cases = " ".join(
        f"WHEN {v} THEN {e}" for v, e in sorted(_ANF_LIN.items())
    )
    return (
        f"CAST(CASE WHEN ({_ANF_M} - n_regs) > 0 "
        f"AND {_ANF_NUM!r} / denom <= {2.5 * _ANF_M!r} "
        f"THEN CASE ({_ANF_M} - n_regs) {cases} END "
        f"ELSE floor({_ANF_NUM!r} / denom) END AS BIGINT)"
    )


def neighborhood_function(
    edges: DataFrame,
    n_rounds: int = 4,
    undirected: bool = True,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """ANF / HyperANF (Palmer et al. 2002, Boldi et al. 2011): the
    neighborhood function N(t) = Σ_v |ball(v, t)| — reachable pairs
    within t hops — estimated with one 16-register HLL sketch per
    node. THE web-graph distance-distribution primitive (effective
    diameter, bow-tie studies): exact N(t) needs n BFS runs, this
    needs ``n_rounds`` rounds of one join + one max-aggregate.

    Round shape: R_t(v) = R_{t-1}(v) ∪max ⋃_{v→w} R_{t-1}(w) as a
    (node, bucket, rho) row table — the union is a groupBy(node,
    bucket).max(rho), partial-combining, never wider than m rows per
    node, all JVM codegen. Register init reuses stats.py's hll_sketch
    hash discipline (md5 → 60-bit int → bucket/rho via bin()), so
    everything is bit-exactly replayable cross-engine; per-node
    estimates use an exact-integer harmonic denominator and a
    PRE-FLOORED linear-counting lookup (_ANF_LIN) — zero runtime
    transcendentals — then sum as bigints.

    At 100 TB: per round one shuffle of an ≤ m×|V| row table plus the
    edge join; lineage cut per round. Accuracy is the standard
    m=16 HLL ±26% per node (sums concentrate much tighter) — this is
    an ESTIMATOR; exactness here means determinism, not truth.

    Returns (t, n_nodes, pairs_est) for t = 0..n_rounds.
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
    )
    if undirected:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    e = e.filter(F.col("src") != F.col("dst")).distinct().localCheckpoint(
        eager=False
    )
    nodes_col = e.select(F.col("src").alias("node"))
    if not undirected:
        nodes_col = nodes_col.unionByName(
            e.select(F.col("dst").alias("node"))
        )
    nodes = nodes_col.distinct()
    # singleton sketch per node: one register row
    h = F.conv(
        F.substring(
            F.md5(F.encode(F.col("node").cast("string"), "UTF-8")), 1, 15
        ),
        16,
        10,
    ).cast("long")
    w = h.bitwiseAND(F.lit((1 << _ANF_WBITS) - 1))
    regs = nodes.select(
        "node",
        F.shiftright(h, _ANF_WBITS).alias("bucket"),
        F.when(w == 0, F.lit(_ANF_WBITS + 1))
        .otherwise(F.lit(_ANF_WBITS + 1) - F.length(F.bin(w)))
        .cast("int")
        .alias("rho"),
    ).localCheckpoint(eager=False)

    def est(r: DataFrame, t: int) -> DataFrame:
        per_node = r.groupBy("node").agg(
            F.count(F.lit(1)).alias("n_regs"),
            F.sum(
                F.expr(
                    f"shiftleft(CAST(1 AS BIGINT), {_ANF_SCALE} - rho)"
                )
            ).alias("used"),
        ).select(
            "n_regs",
            (
                F.col("used")
                + (F.lit(_ANF_M) - F.col("n_regs"))
                * F.lit(1 << _ANF_SCALE)
            ).cast("long").alias("denom"),
        )
        return per_node.agg(
            F.lit(t).cast("int").alias("t"),
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.coalesce(F.sum(F.expr(_anf_est_expr())), F.lit(0))
            .cast("long")
            .alias("pairs_est"),
        )

    out = est(regs, 0)
    for t in range(1, n_rounds + 1):
        merged = regs.unionByName(
            e.join(regs.withColumnRenamed("node", "dst"), "dst").select(
                F.col("src").alias("node"), "bucket", "rho"
            )
        )
        regs = (
            merged.groupBy("node", "bucket")
            .agg(F.max("rho").alias("rho"))
            .localCheckpoint(eager=False)
        )
        out = out.unionByName(est(regs, t))
    return out


def scc(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_outer: int = 12,
    trim_rounds: int = 10,
    max_prop: int = 64,
) -> DataFrame:
    """Strongly connected components of a directed graph — the
    web-graph structure primitive CC cannot give (mutual
    reachability: link rings, citation cycles, the SCC "bow-tie" core
    of the web).

    Algorithm: iterative trim + forward-min-label coloring + backward
    closure (the classic distributed SCC shape, cf. Orzan's coloring
    / FW-BW):

    1. TRIM — nodes with no in-edge or no out-edge inside the active
       subgraph are singleton SCCs (they cannot sit on a cycle);
       repeated, this eats DAG tendrils endpoint-inward.
    2. COLOR — propagate min(node id) along edge direction to
       fixpoint: color(v) = min id that reaches v within the active
       subgraph.
    3. ROOTS — nodes with color(v) == v. The SCC of root r is exactly
       the set of v with color(v) == r that can REACH r, so a
       frontier-only backward walk over reversed edges, constrained
       to same-colored nodes, collects every root's SCC
       simultaneously (colors keep regions disjoint).
    4. Assign, remove, repeat on the remainder.

    Determinism: min-label and set algebra only — no randomized
    pivots; output is a pure function of the edge set.

    Scale + bounds (stated honestly): every step is joins/aggregates
    over (node, color) tables — nothing wider crosses a shuffle, and
    the backward walk is frontier-only (each edge contributes once
    per collected member, the bfs_distance discipline). But SCC has
    no polylog-round distributed algorithm in the general case: each
    outer round peels the condensation-DAG frontier, so a long chain
    of SCCs needs as many outer rounds and a deep color region as
    many propagation rounds as its diameter. The caps (``max_outer``,
    ``max_prop``) bound cluster time; hitting one raises ValueError
    rather than silently mislabeling — real web graphs resolve in a
    handful of rounds (shallow condensation + giant core). Lineage is
    cut via localCheckpoint every materialization (every inner round
    performs an action anyway, the fixpoint test).

    Returns (node, scc) with scc = min node id of the component.
    """
    e_all = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
    )
    nodes = (
        e_all.select(F.col("src").alias("node"))
        .unionByName(e_all.select(F.col("dst").alias("node")))
        .distinct()
    )
    # self-loops never change membership; drop from the walk graph
    active_e = e_all.filter(F.col("src") != F.col("dst")).localCheckpoint(
        eager=False
    )
    remaining = nodes.localCheckpoint(eager=False)
    assigned: DataFrame | None = None

    def _accumulate(acc, part):
        return part if acc is None else acc.unionByName(part)

    for _outer in range(max_outer):
        if remaining.isEmpty():
            break
        # -- 1. trim ---------------------------------------------------
        for _t in range(trim_rounds):
            srcs = active_e.select(F.col("src").alias("node")).distinct()
            dsts = active_e.select(F.col("dst").alias("node")).distinct()
            both = srcs.join(dsts, "node").localCheckpoint(eager=False)
            trimmed = remaining.join(both, "node", "left_anti")
            if trimmed.isEmpty():
                break
            assigned = _accumulate(
                assigned, trimmed.select("node", F.col("node").alias("scc"))
            )
            remaining = remaining.join(both, "node").localCheckpoint(
                eager=False
            )
            active_e = (
                active_e.join(
                    remaining.withColumnRenamed("node", "src"), "src"
                )
                .join(remaining.withColumnRenamed("node", "dst"), "dst")
                .localCheckpoint(eager=False)
            )
        if remaining.isEmpty():
            break
        # -- 2. forward min-label coloring to fixpoint -------------------
        colors = remaining.withColumn("color", F.col("node"))
        for _p in range(max_prop):
            msgs = (
                active_e.join(
                    colors.select(
                        F.col("node").alias("src"),
                        F.col("color").alias("c_src"),
                    ),
                    "src",
                )
                .groupBy(F.col("dst").alias("node"))
                .agg(F.min("c_src").alias("cand"))
            )
            new = (
                colors.join(msgs, "node", "left")
                .select(
                    "node",
                    F.least(
                        "color", F.coalesce("cand", "color")
                    ).alias("color"),
                )
                .localCheckpoint(eager=False)
            )
            changed = (
                new.alias("n")
                .join(colors.alias("o"), "node")
                .filter(F.col("n.color") != F.col("o.color"))
            )
            stable = changed.isEmpty()
            colors = new
            if stable:
                break
        else:
            raise ValueError(
                f"scc: color propagation exceeded {max_prop} rounds "
                "(color-region diameter too deep)"
            )
        # -- 3. backward closure from roots, within color ----------------
        in_scc = colors.filter(F.col("color") == F.col("node")).select(
            "node", "color"
        ).localCheckpoint(eager=False)
        frontier = in_scc
        for _p in range(max_prop):
            cand = (
                active_e.join(
                    frontier.select(
                        F.col("node").alias("dst"),
                        F.col("color").alias("c"),
                    ),
                    "dst",
                )
                .select(F.col("src").alias("node"), F.col("c"))
                .distinct()
            )
            grown = (
                cand.join(colors, "node")
                .filter(F.col("color") == F.col("c"))
                .select("node", "color")
                .join(in_scc.select("node"), "node", "left_anti")
                .localCheckpoint(eager=False)
            )
            if grown.isEmpty():
                break
            in_scc = in_scc.unionByName(grown).localCheckpoint(eager=False)
            frontier = grown
        else:
            raise ValueError(
                f"scc: backward walk exceeded {max_prop} rounds"
            )
        assigned = _accumulate(
            assigned, in_scc.select("node", F.col("color").alias("scc"))
        )
        remaining = remaining.join(
            in_scc.select("node"), "node", "left_anti"
        ).localCheckpoint(eager=False)
        active_e = (
            active_e.join(remaining.withColumnRenamed("node", "src"), "src")
            .join(remaining.withColumnRenamed("node", "dst"), "dst")
            .localCheckpoint(eager=False)
        )
    else:
        if not remaining.isEmpty():
            raise ValueError(
                f"scc: condensation depth exceeded {max_outer} rounds"
            )
    if assigned is None:
        return nodes.select("node", F.col("node").alias("scc")).limit(0)
    return assigned


def assortativity(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    undirected: bool = True,
) -> DataFrame:
    """Degree assortativity (Newman 2002): Pearson correlation of the
    endpoint degrees over all edges — do hubs link hubs (r > 0, e.g.
    collaboration graphs) or leaves (r < 0, the web's typical shape)?

    Exact-integer discipline: the five Pearson moments (Σx, Σy, Σxy,
    Σx², Σy²) are accumulated as BIGINT sums of exact degree
    products, so both engines agree bit-for-bit regardless of
    aggregation order; the only float step is the one final Pearson
    division on identical operands, rounded to micros. Returned
    alongside r so the certificate pins the exact moments, not just
    the rounded ratio.

    Plan at scale: one hash-agg degree table (map-side combine),
    joined to the edge list on each endpoint — co-partitioned equi
    joins, AQE broadcasts the degree table when small — and ONE final
    aggregate. Parallel edges count once per occurrence (multigraph
    semantics, the standard convention). ``undirected`` mirrors every
    edge so (x, y) and (y, x) both contribute and r is symmetric.
    """
    e = edges.select(src, dst)
    if undirected:
        e = e.unionByName(
            edges.select(
                F.col(dst).alias(src), F.col(src).alias(dst)
            )
        )
    # endpoint-degree tables: with the undirected mirror both equal
    # the full degree; directed keeps the standard out→in convention
    deg_x = e.groupBy(src).agg(
        F.count(F.lit(1)).cast("long").alias("dx")
    ).withColumnRenamed(src, "_sn")
    deg_y = e.groupBy(dst).agg(
        F.count(F.lit(1)).cast("long").alias("dy")
    ).withColumnRenamed(dst, "_dn")
    paired = (
        e.join(deg_x, F.col(src) == F.col("_sn"))
        .drop("_sn")
        .join(deg_y, F.col(dst) == F.col("_dn"))
        .drop("_dn")
    )
    m = paired.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("dx").cast("long").alias("sx"),
        F.sum("dy").cast("long").alias("sy"),
        F.sum(F.col("dx") * F.col("dy")).cast("long").alias("sxy"),
        F.sum(F.col("dx") * F.col("dx")).cast("long").alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).cast("long").alias("syy"),
    )
    n = F.col("n").cast("double")
    num = n * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    varx = n * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    vary = n * F.col("syy") - F.col("sy").cast("double") * F.col("sy")
    return m.select(
        "n",
        "sx",
        "sy",
        "sxy",
        "sxx",
        "syy",
        F.when(
            (varx > 0) & (vary > 0),
            F.round(num / (F.sqrt(varx) * F.sqrt(vary)) * 1e6),
        )
        .otherwise(F.lit(None))
        .cast("long")
        .alias("r_micro"),
    )
