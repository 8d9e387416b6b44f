"""DuckDB oracle mirrors for the driver contract (split out of
__spark_entry__.py)."""

from serd_spark.contract.helpers import *  # noqa: F401,F403
from serd_spark.contract.q_core import *  # noqa: F401,F403
from serd_spark.contract.q_batch1 import *  # noqa: F401,F403
from serd_spark.contract.q_sparql import *  # noqa: F401,F403
from serd_spark.contract.q_corpus1 import *  # noqa: F401,F403
from serd_spark.contract.q_batch2 import *  # noqa: F401,F403
from serd_spark.contract.q_streams2 import *  # noqa: F401,F403


def _lang_case_sql() -> str:
    def n(lang: str) -> str:
        pat = "(?i)\\b(" + "|".join(LANGS[lang]) + ")\\b"
        return f"len(regexp_extract_all(text, '{pat}'))"

    en, fr, es, de = n("en"), n("fr"), n("es"), n("de")
    return f"""
        CASE
          WHEN {en} > 0 AND {en} >= {fr} AND {en} >= {es} AND {en} >= {de} THEN 'en'
          WHEN {fr} > {en} AND {fr} >= {es} AND {fr} >= {de} THEN 'fr'
          WHEN {es} > {en} AND {es} > {fr} AND {es} >= {de} THEN 'es'
          WHEN {de} > {en} AND {de} > {fr} AND {de} > {es} THEN 'de'
          ELSE 'und'
        END
    """


_TRADE_DIR_EDGES_SQL = """
          SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey"""


def _hll_rollup_oracle_sql() -> str:
    """Replays q_hll_rollup: hourly registers, register-max merge,
    and the direct sketch — the q_hll estimate arithmetic applied
    once per grain (p=8 → wbits=52, scale=53, m=256)."""

    def est(regs: str, grain: str) -> str:
        return f"""
              SELECT {grain} AS grain, CAST(256 AS BIGINT) AS m,
                     CAST(COUNT(*) AS BIGINT) AS n_regs,
                     CAST(256 - COUNT(*) AS BIGINT) AS zero_regs,
                     CAST(SUM(1::BIGINT << CAST(53 - rho AS INTEGER))
                          + (256 - COUNT(*)) * (1::BIGINT << 53)
                          AS BIGINT) AS denom
              FROM {regs} {'GROUP BY grain' if 'hour' in grain else ''}"""

    finish = """
              SELECT grain, m, n_regs, zero_regs, denom,
                     CAST(round(CASE
                       WHEN ((0.7213 / (1.0 + 1.079 / 256.0)) * 256.0
                             * 256.0 * 9007199254740992.0 / denom)
                            <= 640.0 AND zero_regs > 0
                       THEN 256.0 * ln(256.0 / zero_regs)
                       ELSE (0.7213 / (1.0 + 1.079 / 256.0)) * 256.0
                            * 256.0 * 9007199254740992.0 / denom
                       END, 0) AS BIGINT) AS hll_est"""
    return f"""
            WITH e AS (
              SELECT strftime(ts, '%Y-%m-%d %H') AS hour,
                     CAST(user_id AS VARCHAR) || '|' || event_type AS v
              FROM events
            ), h AS (
              SELECT hour,
                     CAST('0x' || substr(md5(v), 1, 15) AS BIGINT) AS h
              FROM e
            ), hr AS (
              SELECT hour, h >> 52 AS bucket,
                     MAX(CASE WHEN (h & ((1::BIGINT << 52) - 1)) = 0
                              THEN 53
                              ELSE 53 - length(bin(
                                h & ((1::BIGINT << 52) - 1)))
                         END) AS rho
              FROM h GROUP BY hour, bucket
            ), mr AS (
              SELECT bucket, MAX(rho) AS rho FROM hr GROUP BY bucket
            ), s AS (
              {est('hr', 'hour')}
              UNION ALL
              {est('mr', "'zz:merged'")}
              UNION ALL
              {est('mr', "'zz:direct'")}
            )
            {finish} FROM s ORDER BY grain
        """


def _pagerank_oracle_sql(
    n_iter: int = 5,
    damping_pct: int = 85,
    dir_edges_sql: str = _TRADE_DIR_EDGES_SQL,
    undirected: bool = True,
) -> str:
    """Replays operators/graph.py's integer-micros PageRank as chained
    CTEs — one per iteration, identical floor-division arithmetic, so
    the match is bit-exact (integer sums are order-independent).
    ``dir_edges_sql`` supplies the (src, dst) edge derivation;
    ``undirected`` mirrors the operator's flag (mirrored edges vs
    directed-with-sink-nodes)."""
    if undirected:
        edges_nodes = """
        ), edges AS (
          SELECT src, dst FROM dir_edges
          UNION
          SELECT dst AS src, src AS dst FROM dir_edges
        ), deg AS (
          SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY src
        ), nodes AS (
          SELECT DISTINCT src AS node FROM edges"""
    else:
        edges_nodes = """
        ), edges AS (
          SELECT DISTINCT src, dst FROM dir_edges
        ), deg AS (
          SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY src
        ), nodes AS (
          SELECT src AS node FROM edges
          UNION
          SELECT dst AS node FROM edges"""
    head = f"""
        WITH dir_edges AS ({dir_edges_sql}{edges_nodes}
        ), params AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST((1000000 * {100 - damping_pct}) // (100 * COUNT(*))
                      AS BIGINT) AS base,
                 CAST(1000000 // COUNT(*) AS BIGINT) AS r0
          FROM nodes
        ), r0 AS (
          SELECT node, (SELECT r0 FROM params) AS rank_micros FROM nodes
        )"""
    iters = []
    for i in range(1, n_iter + 1):
        iters.append(f""", r{i} AS (
          SELECT nd.node,
                 CAST((SELECT base FROM params)
                      + ({damping_pct} * COALESCE(infl.s, 0)) // 100
                      AS BIGINT) AS rank_micros
          FROM nodes nd LEFT JOIN (
            SELECT e.dst AS node,
                   CAST(SUM(r.rank_micros // d.deg) AS BIGINT) AS s
            FROM r{i - 1} r
            JOIN edges e ON e.src = r.node
            JOIN deg d ON d.src = e.src
            GROUP BY e.dst
          ) infl ON infl.node = nd.node
        )""")
    return head + "".join(iters) + f"\n        SELECT node, rank_micros FROM r{n_iter}"


def _ppr_oracle_sql(
    n_iter: int,
    seed_where: str,
    dir_edges_sql: str,
    damping_pct: int = 85,
) -> str:
    """Replays operators/graph.py's personalized_pagerank as chained
    CTEs — directed edges, seeds = nodes matching ``seed_where``,
    seeded base/init terms, identical floor-division arithmetic —
    bit-exact (integer sums are order-independent)."""
    head = f"""
        WITH dir_edges AS ({dir_edges_sql}
        ), edges AS (
          SELECT DISTINCT src, dst FROM dir_edges
          WHERE src IS NOT NULL AND dst IS NOT NULL
        ), deg AS (
          SELECT src, CAST(COUNT(*) AS BIGINT) AS deg
          FROM edges GROUP BY src
        ), nodes AS (
          SELECT src AS node FROM edges
          UNION
          SELECT dst AS node FROM edges
        ), seeds AS (
          SELECT node FROM nodes WHERE {seed_where}
        ), params AS (
          SELECT CAST((1000000 * {100 - damping_pct})
                      // (100 * COUNT(*)) AS BIGINT) AS base,
                 CAST(1000000 // COUNT(*) AS BIGINT) AS r0
          FROM seeds
        ), r0 AS (
          SELECT n.node,
                 CASE WHEN s.node IS NOT NULL
                      THEN (SELECT r0 FROM params)
                      ELSE CAST(0 AS BIGINT) END AS rank_micros
          FROM nodes n LEFT JOIN seeds s ON s.node = n.node
        )"""
    iters = []
    for i in range(1, n_iter + 1):
        iters.append(f""", r{i} AS (
          SELECT nd.node,
                 CAST(CASE WHEN sd.node IS NOT NULL
                           THEN (SELECT base FROM params)
                           ELSE 0 END
                      + ({damping_pct} * COALESCE(infl.s, 0)) // 100
                      AS BIGINT) AS rank_micros
          FROM nodes nd
          LEFT JOIN seeds sd ON sd.node = nd.node
          LEFT JOIN (
            SELECT e.dst AS node,
                   CAST(SUM(r.rank_micros // d.deg) AS BIGINT) AS s
            FROM r{i - 1} r
            JOIN edges e ON e.src = r.node
            JOIN deg d ON d.src = e.src
            GROUP BY e.dst
          ) infl ON infl.node = nd.node
        )""")
    return (
        head + "".join(iters)
        + f"\n        SELECT node, rank_micros FROM r{n_iter}"
    )


def _anf_oracle_sql(n_rounds: int, dir_edges_sql: str) -> str:
    """Replays operators/graph.py's neighborhood_function (undirected
    form) as chained CTEs: md5→bucket/rho register init, one
    max-merge register CTE per round, per-node exact-integer
    denominators, and the shared _anf_est_expr() estimate text —
    bit-exact."""
    from serd_spark.operators.graph import _anf_est_expr

    head = f"""
        WITH dir_edges AS ({dir_edges_sql}
        ), edges AS (
          SELECT DISTINCT src, dst FROM (
            SELECT src, dst FROM dir_edges
            UNION ALL
            SELECT dst AS src, src AS dst FROM dir_edges
          ) m
          WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst
        ), nodes AS (
          SELECT DISTINCT src AS node FROM edges
        ), hh AS (
          SELECT node,
                 CAST('0x' || substr(md5(CAST(node AS VARCHAR)), 1, 15)
                      AS BIGINT) AS h
          FROM nodes
        ), r0 AS (
          SELECT node, h >> 56 AS bucket,
                 CASE WHEN (h & ((1::BIGINT << 56) - 1)) = 0 THEN 57
                      ELSE 57 - length(bin(h & ((1::BIGINT << 56) - 1)))
                 END AS rho
          FROM hh
        )"""
    parts = []
    for t in range(1, n_rounds + 1):
        parts.append(f""", r{t} AS (
          SELECT node, bucket, MAX(rho) AS rho FROM (
            SELECT node, bucket, rho FROM r{t - 1}
            UNION ALL
            SELECT e.src AS node, r.bucket, r.rho
            FROM r{t - 1} r JOIN edges e ON e.dst = r.node
          ) u GROUP BY node, bucket
        )""")
    for t in range(n_rounds + 1):
        parts.append(f""", est{t} AS (
          SELECT CAST({t} AS INT) AS t,
                 CAST(COUNT(*) AS BIGINT) AS n_nodes,
                 CAST(COALESCE(SUM({_anf_est_expr()}), 0) AS BIGINT)
                   AS pairs_est
          FROM (
            SELECT node, CAST(COUNT(*) AS BIGINT) AS n_regs,
                   CAST(SUM(1::BIGINT << CAST(57 - rho AS INTEGER))
                        + (16 - COUNT(*)) * (1::BIGINT << 57)
                        AS BIGINT) AS denom
            FROM r{t} GROUP BY node
          ) d
        )""")
    union = "\n          UNION ALL ".join(
        f"SELECT * FROM est{t}" for t in range(n_rounds + 1)
    )
    return head + "".join(parts) + f"\n        {union}"


def _hits_oracle_sql(n_iter: int, dir_edges_sql: str) -> str:
    """Replays operators/graph.py's integer-micros HITS as chained
    CTEs — per iteration: authority inflow sum, quantized-L1 divisor
    ``greatest(1, sum div 1e6)``, floor-divided normalize, then the
    same for hubs. Integer arithmetic throughout, so the match is
    bit-exact."""
    head = f"""
        WITH dir_edges AS ({dir_edges_sql}
        ), edges AS (
          SELECT DISTINCT src, dst FROM dir_edges
          WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst
        ), nodes AS (
          SELECT src AS node FROM edges
          UNION
          SELECT dst AS node FROM edges
        ), h0 AS (
          SELECT node, CAST(1000000 AS BIGINT) AS hub FROM nodes
        )"""
    iters = []
    for i in range(1, n_iter + 1):
        iters.append(f""", a{i}_raw AS (
          SELECT e.dst AS node, CAST(SUM(h.hub) AS BIGINT) AS raw
          FROM h{i - 1} h JOIN edges e ON e.src = h.node
          GROUP BY e.dst
        ), a{i}_div AS (
          SELECT greatest(1, CAST(COALESCE(SUM(raw), 0) // 1000000
                               AS BIGINT)) AS d
          FROM a{i}_raw
        ), a{i} AS (
          SELECT nd.node,
                 CAST(COALESCE(r.raw, 0) // (SELECT d FROM a{i}_div)
                      AS BIGINT) AS auth
          FROM nodes nd LEFT JOIN a{i}_raw r ON r.node = nd.node
        ), h{i}_raw AS (
          SELECT e.src AS node, CAST(SUM(a.auth) AS BIGINT) AS raw
          FROM a{i} a JOIN edges e ON e.dst = a.node
          GROUP BY e.src
        ), h{i}_div AS (
          SELECT greatest(1, CAST(COALESCE(SUM(raw), 0) // 1000000
                               AS BIGINT)) AS d
          FROM h{i}_raw
        ), h{i} AS (
          SELECT nd.node,
                 CAST(COALESCE(r.raw, 0) // (SELECT d FROM h{i}_div)
                      AS BIGINT) AS hub
          FROM nodes nd LEFT JOIN h{i}_raw r ON r.node = nd.node
        )""")
    tail = f"""
        SELECT h.node, h.hub AS hub_micros, a.auth AS auth_micros
        FROM h{n_iter} h JOIN a{n_iter} a USING (node)"""
    return head + "".join(iters) + tail


# Directed host→host link edges re-derived from raw page bytes —
# shared by the q_host_rank (PageRank) and q_hits (HITS) oracles so
# both replay the identical edge extraction.
_HOST_DIR_EDGES_SQL = f"""
          SELECT src_host AS src, dst_host AS dst FROM (
            SELECT a.src_host,
                   lower(regexp_extract(a.href,
                     '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)', 1))
                     AS dst_host
            FROM (
              SELECT lower(regexp_extract(url,
                       '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)', 1))
                       AS src_host,
                     unnest(regexp_extract_all(decode(html),
                       'href="([^"]*)"', 1)) AS href
              FROM read_parquet('{ORACLE_DIR}/sf0.01/pages_meta/*.parquet')
            ) a
          ) WHERE src_host <> '' AND dst_host <> ''"""


_TRADE_EDGES_SQL = """
        WITH und AS (
          SELECT DISTINCT
                 least(o_custkey % 9973, l_suppkey % 9973) AS a,
                 greatest(o_custkey % 9973, l_suppkey % 9973) AS b
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey
          WHERE o_custkey % 9973 <> l_suppkey % 9973
        ), e0 AS (
          SELECT a, b FROM und UNION ALL SELECT b AS a, a AS b FROM und
        )"""


def _kmeans_oracle_sql(n_iter: int, k: int, dim: int = 64) -> str:
    """Replays operators/clustering.py's exact Lloyd iterations as
    chained CTEs: per round, the (dist ASC, cid ASC) argmin assignment
    window and the truncating-division centroid update (DuckDB // ==
    the operator's sign*(abs//n)), with empty clusters carried via
    COALESCE. Quantization floor(v * 2^20) is exact in double on both
    engines — no rounding mode in play."""
    head = f"""
        WITH base AS (SELECT vec_id, embedding FROM embeddings),
        vm AS (
          SELECT vec_id, i - 1 AS d,
                 CAST(floor(embedding[i]::DOUBLE * 1048576) AS BIGINT) AS v
          FROM (SELECT vec_id, embedding,
                       unnest(generate_series(1, {dim})) AS i FROM base)
        ), seeds AS (
          SELECT vec_id FROM base
          ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {k}
        ), seedc AS (
          SELECT vec_id, row_number() OVER (
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cid
          FROM seeds
        ), c0 AS (
          SELECT s.cid, vm.d, vm.v AS cv FROM seedc s JOIN vm USING (vec_id)
        )"""
    its = []
    for i in range(1, n_iter + 1):
        its.append(f""", a{i} AS (
          SELECT vec_id, cid FROM (
            SELECT vm.vec_id, c.cid,
                   row_number() OVER (PARTITION BY vm.vec_id
                     ORDER BY SUM((vm.v - c.cv) * (vm.v - c.cv)) ASC,
                              c.cid ASC) AS rn
            FROM vm JOIN c{i - 1} c ON c.d = vm.d
            GROUP BY vm.vec_id, c.cid
          ) WHERE rn = 1
        ), c{i} AS (
          SELECT p.cid, p.d, COALESCE(m.mv, p.cv) AS cv
          FROM c{i - 1} p LEFT JOIN (
            SELECT a.cid, vm.d,
                   CAST(SUM(vm.v) // COUNT(*) AS BIGINT) AS mv
            FROM a{i} a JOIN vm USING (vec_id)
            GROUP BY a.cid, vm.d
          ) m ON m.cid = p.cid AND m.d = p.d
        )""")
    tail = f"""
        SELECT vec_id, CAST(cid AS INTEGER) AS cluster, dist FROM (
          SELECT vm.vec_id, c.cid,
                 CAST(SUM((vm.v - c.cv) * (vm.v - c.cv)) AS BIGINT) AS dist,
                 row_number() OVER (PARTITION BY vm.vec_id
                   ORDER BY SUM((vm.v - c.cv) * (vm.v - c.cv)) ASC,
                            c.cid ASC) AS rn
          FROM vm JOIN c{n_iter} c ON c.d = vm.d
          GROUP BY vm.vec_id, c.cid
        ) WHERE rn = 1"""
    return head + "".join(its) + tail


def _pq_oracle_sql(
    n_iter: int, k: int, m: int = 8, dim: int = 64, top_k: int = 10
) -> str:
    """Replays the WHOLE product-quantization pipeline from raw
    parquet: all m codebook trainings share one CTE chain (the
    assignment window partitions by (vec, sub) and the update groups
    by (sub, cid, d) — each dimension belongs to exactly one
    subspace, so one join drives all subspaces at once), then the
    encoding pass and the ADC search. DuckDB's // truncation matches
    the operator's sign*(abs//n) update exactly."""
    dsub = dim // m
    head = f"""
        WITH base AS (SELECT vec_id, embedding FROM embeddings),
        vm AS (
          SELECT vec_id, i - 1 AS d,
                 CAST(floor(embedding[i]::DOUBLE * 1048576) AS BIGINT) AS v
          FROM (SELECT vec_id, embedding,
                       unnest(generate_series(1, {dim})) AS i FROM base)
        ), seedc AS (
          SELECT vec_id, row_number() OVER (
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cid
          FROM (SELECT vec_id FROM base
                ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {k})
        ), c0 AS (
          SELECT s.cid, vm.d // {dsub} AS sub, vm.d, vm.v AS cv
          FROM seedc s JOIN vm USING (vec_id)
        )"""
    its = []
    for i in range(1, n_iter + 1):
        its.append(f""", a{i} AS (
          SELECT vec_id, sub, cid FROM (
            SELECT vm.vec_id, c.sub, c.cid,
                   row_number() OVER (PARTITION BY vm.vec_id, c.sub
                     ORDER BY SUM((vm.v - c.cv) * (vm.v - c.cv)) ASC,
                              c.cid ASC) AS rn
            FROM vm JOIN c{i - 1} c ON c.d = vm.d
            GROUP BY vm.vec_id, c.sub, c.cid
          ) WHERE rn = 1
        ), c{i} AS (
          SELECT p.sub, p.cid, p.d, COALESCE(m.mv, p.cv) AS cv
          FROM c{i - 1} p LEFT JOIN (
            SELECT a.sub, a.cid, vm.d,
                   CAST(SUM(vm.v) // COUNT(*) AS BIGINT) AS mv
            FROM a{i} a JOIN vm ON vm.vec_id = a.vec_id
                               AND vm.d // {dsub} = a.sub
            GROUP BY a.sub, a.cid, vm.d
          ) m ON m.sub = p.sub AND m.cid = p.cid AND m.d = p.d
        )""")
    tail = f""", codes AS (
          SELECT vec_id, sub, cid FROM (
            SELECT vm.vec_id, c.sub, c.cid,
                   row_number() OVER (PARTITION BY vm.vec_id, c.sub
                     ORDER BY SUM((vm.v - c.cv) * (vm.v - c.cv)) ASC,
                              c.cid ASC) AS rn
            FROM vm JOIN c{n_iter} c ON c.d = vm.d
            GROUP BY vm.vec_id, c.sub, c.cid
          ) WHERE rn = 1
        ), qsub AS (
          SELECT d, v FROM vm WHERE vec_id = 0
        ), adct AS (
          SELECT c.sub, c.cid,
                 CAST(SUM((c.cv - q.v) * (c.cv - q.v)) AS BIGINT) AS dist
          FROM c{n_iter} c JOIN qsub q ON q.d = c.d
          GROUP BY c.sub, c.cid
        )
        SELECT e.vec_id, CAST(SUM(t.dist) AS BIGINT) AS adc
        FROM codes e JOIN adct t ON t.sub = e.sub AND t.cid = e.cid
        GROUP BY e.vec_id
        ORDER BY adc ASC, vec_id ASC LIMIT {top_k}"""
    return head + "".join(its) + tail


def _pca_oracle_sql(n_iter: int = 8, dim: int = 64) -> str:
    """Replays operators/pca.py end-to-end: quantization, truncating
    integer means, the centered covariance cells, the covariance
    rescale, every power-iteration matvec + rescale round (DuckDB //
    is the operator's tdiv), and the final projections."""
    q = 1 << 20
    head = f"""
        WITH base AS (SELECT vec_id, embedding FROM embeddings),
        vm AS (
          SELECT vec_id, i - 1 AS d,
                 CAST(floor(embedding[i]::DOUBLE * {q}) AS BIGINT) AS v
          FROM (SELECT vec_id, embedding,
                       unnest(generate_series(1, {dim})) AS i FROM base)
        ), mn AS (
          SELECT d, CAST(SUM(v) AS BIGINT) // CAST(COUNT(*) AS BIGINT)
                   AS m
          FROM vm GROUP BY d
        ), c AS MATERIALIZED (
          SELECT vec_id, vm.d, v - m AS c FROM vm JOIN mn USING (d)
        ), cells AS MATERIALIZED (
          SELECT a.d AS i, b.d AS j,
                 CAST(SUM(a.c * b.c) AS BIGINT) AS s
          FROM c a JOIN c b USING (vec_id) GROUP BY 1, 2
        ), cdiv AS (
          SELECT greatest(1, greatest(1, MAX(abs(s))) // {q}) AS d0
          FROM cells
        ), cn AS MATERIALIZED (
          SELECT i, j, s // (SELECT d0 FROM cdiv) AS s FROM cells
        ), w0 AS (
          SELECT unnest(generate_series(0, {dim - 1})) AS d,
                 CAST({q} AS BIGINT) AS x
        )"""
    its = []
    for t in range(1, n_iter + 1):
        its.append(f""", u{t} AS MATERIALIZED (
          SELECT cn.i AS d, CAST(SUM(cn.s * w.x) AS BIGINT) AS u
          FROM cn JOIN w{t - 1} w ON cn.j = w.d GROUP BY 1
        ), ud{t} AS (
          SELECT greatest(1, greatest(1, MAX(abs(u))) // {q}) AS du
          FROM u{t}
        ), w{t} AS MATERIALIZED (
          SELECT d, u // (SELECT du FROM ud{t}) AS x FROM u{t}
        )""")
    tail = f"""
        SELECT c.vec_id, CAST(SUM(c.c * w.x) AS BIGINT) AS proj
        FROM c JOIN w{n_iter} w ON c.d = w.d
        GROUP BY 1 ORDER BY vec_id"""
    return head + "".join(its) + tail


def _kcore_oracle_sql(k: int, n_rounds: int) -> str:
    """Replays operators/graph.py's fixed-round synchronous peel as
    chained CTEs — one (keep-set, filtered-edges) pair per round over
    the identically derived mirrored trade graph."""
    parts = [_TRADE_EDGES_SQL]
    for r in range(1, n_rounds + 1):
        parts.append(f""", k{r} AS (
          SELECT a FROM e{r - 1} GROUP BY a HAVING COUNT(*) >= {k}
        ), e{r} AS (
          SELECT e.a, e.b FROM e{r - 1} e
          JOIN k{r} x ON e.a = x.a
          JOIN k{r} y ON e.b = y.a
        )""")
    parts.append(f"""
        SELECT a AS node, CAST(COUNT(*) AS BIGINT) AS deg
        FROM e{n_rounds} GROUP BY a""")
    return "".join(parts)


def _lpa_oracle_sql(n_iter: int) -> str:
    """Replays the synchronous label-propagation iterations: per
    round, neighbor-label counts and the (count DESC, label ASC)
    argmax window, identical to operators/graph.py."""
    parts = [_TRADE_EDGES_SQL, """, l0 AS (
          SELECT DISTINCT a AS node, a AS label FROM e0
        )"""]
    for i in range(1, n_iter + 1):
        parts.append(f""", l{i} AS (
          SELECT node, label FROM (
            SELECT e.b AS node, l.label, COUNT(*) AS cnt,
                   row_number() OVER (
                     PARTITION BY e.b
                     ORDER BY COUNT(*) DESC, l.label ASC
                   ) AS rn
            FROM e0 e JOIN l{i - 1} l ON l.node = e.a
            GROUP BY e.b, l.label
          ) WHERE rn = 1
        )""")
    parts.append(f"\n        SELECT node, label FROM l{n_iter}")
    return "".join(parts)


# Mirrored trade adjacency for the BFS oracle — DIRECTED edges
# mirrored then deduped, self-loops kept (bfs_distance keeps them;
# they are no-ops under the settled anti-join on both engines).
_TRADE_MIRROR_EDGES_SQL = """
        WITH dir AS (
          SELECT o_custkey % 9973 AS src, l_suppkey % 9973 AS dst
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        ), e0 AS (
          SELECT DISTINCT src AS a, dst AS b FROM (
            SELECT src, dst FROM dir
            UNION ALL SELECT dst AS src, src AS dst FROM dir
          )
        )"""


def _bfs_oracle_sql(n_rounds: int) -> str:
    """Replays graph.py::bfs_distance's frontier-only rounds as
    chained CTEs: per round, the distinct neighbor expansion of the
    previous frontier anti-joined against the settled set — identical
    to the Spark loop, so a wrong frontier in any round diverges."""
    parts = [_TRADE_MIRROR_EDGES_SQL, """, seeds AS (
          SELECT DISTINCT a AS node FROM e0 WHERE a % 997 = 0
        ), d0 AS (
          SELECT node, 0 AS dist FROM seeds
        ), f0 AS (SELECT node FROM seeds)"""]
    for r in range(1, n_rounds + 1):
        parts.append(f""", f{r} AS (
          SELECT DISTINCT e.b AS node
          FROM e0 e JOIN f{r - 1} f ON e.a = f.node
          WHERE NOT EXISTS (
            SELECT 1 FROM d{r - 1} d WHERE d.node = e.b)
        ), d{r} AS (
          SELECT node, dist FROM d{r - 1}
          UNION ALL SELECT node, {r} AS dist FROM f{r}
        )""")
    parts.append(f"""
        SELECT node, CAST(dist AS INT) AS dist
        FROM d{n_rounds} ORDER BY node""")
    return "".join(parts)


def _walks_oracle_sql(walk_len: int, walks_per_node: int) -> str:
    """Replays graph.py::random_walks step by step: the same
    (src, dst-ascending) row_number adjacency index, and per step the
    md5(start '#' w '#' t) % deg + 1 neighbor pick — any divergence
    in adjacency order, degree, or hash arithmetic desynchronizes the
    rest of the walk."""
    head = f"""
        WITH dir AS (
          SELECT o_custkey % 9973 AS src, l_suppkey % 9973 AS dst
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        ), und AS (
          SELECT DISTINCT src, dst FROM (
            SELECT src, dst FROM dir WHERE src <> dst
            UNION ALL SELECT dst AS src, src AS dst FROM dir
            WHERE src <> dst
          )
        ), adj AS (
          SELECT src, dst,
                 row_number() OVER (PARTITION BY src ORDER BY dst)
                   AS idx
          FROM und
        ), deg AS (
          SELECT src, MAX(idx) AS deg FROM adj GROUP BY src
        ), starts AS (
          SELECT DISTINCT src AS start FROM adj
        ), s0 AS (
          SELECT start, jj.j AS w, start AS cur
          FROM starts, LATERAL (
            SELECT unnest(range(0, {walks_per_node})) AS j) jj
        )"""
    steps = []
    for t in range(1, walk_len + 1):
        steps.append(f""", s{t} AS (
          SELECT p.start, p.w, a.dst AS cur
          FROM (
            SELECT s.start, s.w, s.cur,
                   CAST('0x' || substr(md5(
                     CAST(s.start AS VARCHAR) || '#' ||
                     CAST(s.w AS VARCHAR) || '#' || '{t}'), 1, 8)
                     AS BIGINT) % d.deg + 1 AS pick
            FROM s{t - 1} s JOIN deg d ON d.src = s.cur
          ) p JOIN adj a ON a.src = p.cur AND a.idx = p.pick
        )""")
    union = "\n          UNION ALL ".join(
        f"SELECT start, w, {t} AS step, cur AS node FROM s{t}"
        for t in range(walk_len + 1)
    )
    tail = f"""
        SELECT start, CAST(w AS INT) AS w, CAST(step AS INT) AS step,
               node
        FROM ({union})
        ORDER BY start, w, step"""
    return head + "".join(steps) + tail


def _link_predict_oracle_sql(
    max_center_deg: int, min_cn: int, top_k: int
) -> str:
    """Replays graph.py::link_predict: full-graph degrees, the
    deg-capped wedge self-join, integer-micros Adamic–Adar terms
    (1e12 div round(ln(deg) * 1e6) — pinned parenthesization), the
    existing-edge anti-join and the explicit total order."""
    return f"""
        WITH dir AS (
          SELECT o_custkey % 9973 AS src, l_suppkey % 9973 AS dst
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        ), und AS (
          SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
          FROM dir WHERE src <> dst
        ), m AS (
          SELECT a AS u, b AS v FROM und
          UNION ALL SELECT b AS u, a AS v FROM und
        ), deg AS (
          SELECT u, COUNT(*) AS deg FROM m GROUP BY u
        ), centers AS (
          SELECT u, CAST(1000000000000 //
                   CAST(round(ln(deg) * 1000000) AS BIGINT)
                   AS BIGINT) AS aa_term
          FROM deg WHERE deg <= {max_center_deg} AND deg >= 2
        ), mm AS (
          SELECT m.u, m.v, c.aa_term FROM m JOIN centers c USING (u)
        ), pairs AS (
          SELECT x.v AS a, y.v AS b,
                 CAST(COUNT(*) AS BIGINT) AS cn,
                 CAST(SUM(x.aa_term) AS BIGINT) AS aa_micros
          FROM mm x JOIN mm y ON x.u = y.u
          WHERE x.v < y.v
          GROUP BY x.v, y.v
        )
        SELECT p.a, p.b, p.cn, p.aa_micros
        FROM pairs p LEFT JOIN und e ON p.a = e.a AND p.b = e.b
        WHERE e.a IS NULL AND p.cn >= {min_cn}
        ORDER BY p.cn DESC, p.aa_micros DESC, p.a, p.b
        LIMIT {top_k}"""


def _rdfs_oracle_sql(n_rounds: int = 4) -> str:
    """Replays operators/rdfs.py end-to-end: the doubling subclass-
    closure rounds over the literal axioms, the domain/range/type
    rule scans, the one distinct, and the asserted flag — any rule or
    closure divergence shows as a row or flag mismatch."""
    from serd_spark.operators.rdfs import RDF_TYPE

    def values(rows):
        return ", ".join(f"('{a}', '{b}')" for a, b in rows)

    parts = [f"""
        WITH ax(sub, sup) AS (VALUES {values(_SCHEMA_SUBCLASS)}),
        dom(pred, cls) AS (VALUES {values(_SCHEMA_DOMAINS)}),
        rng(pred, cls) AS (VALUES {values(_SCHEMA_RANGES)}),
        c0 AS (SELECT DISTINCT sub, sup FROM ax WHERE sub <> sup)"""]
    for r in range(1, n_rounds + 1):
        parts.append(f""", c{r} AS (
          SELECT DISTINCT sub, sup FROM (
            SELECT sub, sup FROM c{r - 1}
            UNION ALL
            SELECT a.sub, b.sup FROM c{r - 1} a JOIN c{r - 1} b
            ON a.sup = b.sub WHERE a.sub <> b.sup
          )
        )""")
    parts.append(f""", t AS (
          SELECT s, p, o
          FROM read_parquet('{ORACLE_DIR}/sf0.01/triples/*.parquet')
        ), asserted AS (
          SELECT DISTINCT s AS node, o AS cls FROM t
          WHERE p = '{RDF_TYPE}'
        ), base AS (
          SELECT s AS node, o AS cls FROM t WHERE p = '{RDF_TYPE}'
          UNION ALL
          SELECT t.s AS node, d.cls FROM t JOIN dom d ON t.p = d.pred
          UNION ALL
          SELECT t.o AS node, r.cls FROM t JOIN rng r ON t.p = r.pred
        ), allt AS (
          SELECT DISTINCT node, cls FROM (
            SELECT node, cls FROM base
            UNION ALL
            SELECT b.node, c.sup AS cls
            FROM base b JOIN c{n_rounds} c ON b.cls = c.sub
          )
        )
        SELECT a.node, a.cls,
               CAST(CASE WHEN x.node IS NOT NULL THEN 1 ELSE 0 END
                    AS INT) AS asserted
        FROM allt a
        LEFT JOIN asserted x ON a.node = x.node AND a.cls = x.cls
        ORDER BY a.node, a.cls""")
    return "".join(parts)


def _bpe_oracle_sql(n_merges: int) -> str:
    """Replays every BPE training iteration independently: for each
    rank i, DuckDB recomputes the weighted adjacent-pair counts over
    the materialized symbolization table w{i} (the state BEFORE merge
    i) and takes the argmax under the same total tie-break
    (count DESC, left ASC, right ASC). A wrong fold, count, or pick on
    the Spark side desynchronizes every later iteration."""
    parts = []
    for i in range(n_merges):
        parts.append(f"""
            SELECT CAST({i} AS INTEGER) AS rank, l AS merge_left,
                   r AS merge_right, cnt AS pair_count
            FROM (
              SELECT syms[i] AS l, syms[i + 1] AS r,
                     CAST(SUM(freq) AS BIGINT) AS cnt
              FROM (
                SELECT freq, syms,
                       unnest(generate_series(1, len(syms) - 1)) AS i
                FROM read_parquet('{ORACLE_DIR}/sf0.01/bpe/w{i}/*.parquet')
              )
              GROUP BY 1, 2
              ORDER BY cnt DESC, l ASC, r ASC
              LIMIT 1
            )""")
        # the per-iteration LIMIT must bind inside each branch, so each
        # SELECT wraps its own ordered subquery before the UNION ALL
    return " UNION ALL ".join(parts)


_FUSION_CLAIMS_SQL = """
          SELECT DISTINCT
                 'src' || CAST(l_suppkey % 23 AS VARCHAR) AS src,
                 'e' || CAST(l_orderkey % 499 AS VARCHAR) AS subj,
                 'p' || CAST(l_linenumber % 3 AS VARCHAR) AS pred,
                 'o' || CAST(l_partkey % 7 AS VARCHAR) AS obj
          FROM lineitem"""


def _fusion_oracle_sql(n_iter: int, final: str) -> str:
    """Replays operators/fusion.py round by round as chained CTEs —
    votes from the previous trust table, the GREATEST(tot, 1) guard,
    both floor divisions (// mirrors Spark DIV on non-negative
    BIGINTs) — bit-exact. ``final`` picks the winner select
    (fact_fusion) or the converged trust table (source_trust)."""
    head = f"""
        WITH raw AS ({_FUSION_CLAIMS_SQL}
        ), src_n AS (
          SELECT src, CAST(COUNT(*) AS BIGINT) AS n_claims
          FROM raw GROUP BY src
        ), t0 AS (
          SELECT src, CAST(500000 AS BIGINT) AS trust FROM src_n
        )"""
    rounds = []
    for i in range(1, n_iter + 1):
        rounds.append(f""", v{i} AS (
          SELECT subj, pred, obj, CAST(SUM(t.trust) AS BIGINT) AS vote
          FROM raw c JOIN t{i - 1} t USING (src)
          GROUP BY subj, pred, obj
        ), g{i} AS (
          SELECT subj, pred,
                 GREATEST(CAST(SUM(vote) AS BIGINT), 1) AS tot
          FROM v{i} GROUP BY subj, pred
        ), c{i} AS (
          SELECT v.subj, v.pred, v.obj,
                 CAST((v.vote * 1000000) // g.tot AS BIGINT) AS conf
          FROM v{i} v JOIN g{i} g USING (subj, pred)
        ), t{i} AS (
          SELECT c.src,
                 CAST(CAST(SUM(k.conf) AS BIGINT) // n.n_claims
                      AS BIGINT) AS trust
          FROM raw c
          JOIN c{i} k USING (subj, pred, obj)
          JOIN src_n n USING (src)
          GROUP BY c.src, n.n_claims
        )""")
    if final == "trust":
        tail = f"""
        SELECT src, trust AS trust_micros FROM t{n_iter}"""
    else:
        tail = f""", n_src AS (
          SELECT subj, pred, obj, CAST(COUNT(*) AS BIGINT) AS n_src
          FROM raw GROUP BY subj, pred, obj
        ), ranked AS (
          SELECT c.subj, c.pred, c.obj, c.conf AS conf_micros, n.n_src,
                 row_number() OVER (
                   PARTITION BY c.subj, c.pred
                   ORDER BY c.conf DESC, c.obj ASC
                 ) AS rn
          FROM c{n_iter} c JOIN n_src n USING (subj, pred, obj)
        )
        SELECT subj, pred, obj, conf_micros, n_src
        FROM ranked WHERE rn = 1"""
    return head + "".join(rounds) + tail


_OWL_EDGES_SQL = """
          SELECT 'm' || CAST(x AS VARCHAR) AS s, 'partOf' AS p,
                 'm' || CAST(x // 3 AS VARCHAR) AS o
          FROM (SELECT l_partkey % 211 AS x FROM lineitem) WHERE x > 0
          UNION ALL
          SELECT 'h' || CAST(l_orderkey % 53 AS VARCHAR), 'adjacentTo',
                 'h' || CAST(l_suppkey % 53 AS VARCHAR)
          FROM lineitem
          UNION ALL
          SELECT 'c' || CAST(l_orderkey % 97 AS VARCHAR), 'ownedBy',
                 's' || CAST(l_suppkey % 61 AS VARCHAR)
          FROM lineitem"""


def _owl_oracle_sql(n_rounds: int) -> str:
    """Replays operators/rdfs.py::owl_property_entail as ``n_rounds``
    fixed union+DISTINCT rounds (inverse map join, symmetric swap,
    transitive self-join — iterated squaring, so round k covers
    partOf paths up to 2^k). Spark early-exits at its fixpoint;
    rounds past the fixpoint are no-ops, so a fixed count ≥ the
    convergence round matches bit-for-bit."""
    head = f"""
        WITH base AS ({_OWL_EDGES_SQL}
        ), invmap AS (
          SELECT * FROM (VALUES ('ownedBy', 'owns'), ('owns', 'ownedBy'))
            m(p, q)
        ), r0 AS MATERIALIZED (
          SELECT DISTINCT s, p, o FROM base
        )"""
    rounds = []
    for i in range(1, n_rounds + 1):
        # MATERIALIZED: each round references the previous one 4×
        # (identity, inverse, symmetric, transitive self-join) — an
        # inlined CTE chain re-evaluates 4^n times and exhausts file
        # handles on the parquet scan; materializing makes the oracle
        # replay linear in rounds, like Spark's localCheckpoint.
        rounds.append(f""", r{i} AS MATERIALIZED (
          SELECT DISTINCT s, p, o FROM (
            SELECT s, p, o FROM r{i - 1}
            UNION ALL
            SELECT t.o AS s, m.q AS p, t.s AS o
            FROM r{i - 1} t JOIN invmap m ON t.p = m.p
            UNION ALL
            SELECT o AS s, p, s AS o FROM r{i - 1}
            WHERE p IN ('adjacentTo')
            UNION ALL
            SELECT a.s, a.p, b.o
            FROM r{i - 1} a JOIN r{i - 1} b
              ON a.p = b.p AND a.o = b.s
            WHERE a.p IN ('partOf')
          )
        )""")
    tail = f"""
        SELECT c.s, c.p, c.o,
               CAST(CASE WHEN b.s IS NOT NULL THEN 1 ELSE 0 END AS INT)
                 AS asserted
        FROM r{n_rounds} c
        LEFT JOIN r0 b ON b.s = c.s AND b.p = c.p AND b.o = c.o"""
    return head + "".join(rounds) + tail


def oracle_sql() -> dict[str, str]:
    from serd_spark.operators.corpus import _rate_hex

    # Mirrors that read ORACLE_DIR parquet depend on their Spark query
    # having run first in this process (each query fn materializes its
    # own oracle inputs before returning its DataFrame). Any driver
    # that evaluates the Spark side before the SQL side — per query or
    # in bulk — satisfies this; tools/check_oracles.py replicates it.
    grams_cte = """
        WITH norm AS (
          SELECT doc_id,
                 lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t
          FROM documents
        ), expanded AS (
          SELECT doc_id, t, unnest(generate_series(1, length(t) - 2)) AS i
          FROM norm WHERE length(t) >= 3
        ), grams AS (
          -- mirror Spark char_ngrams: a doc shorter than n yields the
          -- whole (possibly empty) string as its single gram
          SELECT doc_id, list(DISTINCT substring(t, i::INT, 3)) AS gr
          FROM expanded GROUP BY doc_id
          UNION ALL
          SELECT doc_id, [t] AS gr FROM norm WHERE length(t) < 3
        )
    """
    return {
        "kg_extract": f"""
            SELECT syntax, rec, COUNT(*) AS n
            FROM read_parquet('{ORACLE_DIR}/sf0.01/extract/*.parquet')
            GROUP BY syntax, rec
            ORDER BY syntax NULLS FIRST, rec NULLS FIRST
        """,
        "kg_bad_docs": f"""
            SELECT syntax, COUNT(*) AS n_errors,
                   COUNT(DISTINCT url) AS n_docs
            FROM read_parquet('{ORACLE_DIR}/sf0.01/extract/*.parquet')
            WHERE rec = 'e'
            GROUP BY syntax ORDER BY syntax
        """,
        "kg_predicates": f"""
            SELECT p, COUNT(*) AS n_triples,
                   COUNT(DISTINCT s) AS n_subjects
            FROM read_parquet('{ORACLE_DIR}/sf0.01/triples/*.parquet')
            GROUP BY p
            ORDER BY n_triples DESC, p
            LIMIT 20
        """,
        # Negative sampling: nodes, md5 buckets, min representatives,
        # global-min fallback and self flags replayed wholesale.
        "q_kg_negatives": f"""
            WITH e AS (
              SELECT DISTINCT s AS src, o AS dst
              FROM read_parquet('{ORACLE_DIR}/sf0.01/triples/*.parquet')
              WHERE p = 'http://schema.org/relatedLink'
            ), nodes AS (
              SELECT src AS n FROM e UNION SELECT dst FROM e
            ), reps AS (
              SELECT CAST('0x' || substr(md5(n), 1, 8) AS BIGINT) % 32
                       AS b,
                     MIN(n) AS rep
              FROM nodes GROUP BY 1
            ), gmin AS (
              SELECT MIN(n) AS gmin FROM nodes
            ), tagged AS (
              SELECT src, dst, jj.j
              FROM e, LATERAL (SELECT unnest(range(0, 2)) AS j) jj
            )
            SELECT t.src, t.dst, CAST(t.j AS INT) AS j,
                   COALESCE(r.rep, g.gmin) AS neg_dst,
                   CAST(CASE WHEN COALESCE(r.rep, g.gmin) = t.dst
                             THEN 1 ELSE 0 END AS INT) AS is_self
            FROM tagged t
            LEFT JOIN reps r
              ON r.b = CAST('0x' || substr(md5(t.src || '|' || t.dst ||
                   '#' || CAST(t.j AS VARCHAR)), 1, 8) AS BIGINT) % 32
            CROSS JOIN gmin g
        """,
        "q_rdfs_entail": _rdfs_oracle_sql(n_rounds=4),
        # Mini-SPARQL: the compiled BGP replayed as a hand-written
        # relational join over the materialized triples.
        "q_sparql": f"""
            WITH t AS (
              SELECT s, p, o
              FROM read_parquet('{ORACLE_DIR}/sf0.01/triples/*.parquet')
            )
            SELECT n.s AS page, n.o AS name, a.o AS author,
                   v.o AS rating
            FROM t n
            JOIN t r ON r.s = n.s
            JOIN t a ON a.s = r.o
            JOIN t v ON v.s = n.s
            WHERE n.p = 'http://schema.org/name'
              AND r.p = 'http://schema.org/review'
              AND a.p = 'http://schema.org/author'
              AND v.p = 'http://schema.org/ratingValue'
            ORDER BY page LIMIT 300
        """,
        # SPARQL compound patterns: UNION ALL (bag) + LEFT JOIN
        # (OPTIONAL) + DISTINCT, replayed relationally.
        "q_sparql_opt": f"""
            WITH t AS (
              SELECT s, p, o
              FROM read_parquet('{ORACLE_DIR}/sf0.01/triples/*.parquet')
            ),
            u AS (
              SELECT s AS page, o AS link FROM t
              WHERE p = 'http://schema.org/relatedLink'
              UNION ALL
              SELECT s AS page, o AS link FROM t
              WHERE p = 'http://schema.org/review'
            )
            SELECT DISTINCT u.page AS page, u.link AS link,
                   v.o AS rating
            FROM u
            JOIN t n ON n.s = u.page
                    AND n.p = 'http://schema.org/name'
            LEFT JOIN t v ON v.s = u.page
                         AND v.p = 'http://schema.org/ratingValue'
            ORDER BY page, link LIMIT 500
        """,
        # Property paths: closure as a recursive CTE (UNION =
        # distinct pairs = SPARQL OneOrMorePath), sequence as a join.
        "q_sparql_path": f"""
            WITH RECURSIVE t AS (
              SELECT s, p, o
              FROM read_parquet('{ORACLE_DIR}/sf0.01/triples/*.parquet')
            ),
            e AS (
              SELECT s, o FROM t
              WHERE p = 'http://schema.org/relatedLink'
            ),
            c AS (
              SELECT s AS x, o AS y FROM e
              UNION
              SELECT c.x, e.o FROM c JOIN e ON c.y = e.s
            ),
            ra AS (
              SELECT r.s AS x, a.o AS auth
              FROM t r JOIN t a ON a.s = r.o
                   AND a.p = 'http://schema.org/author'
              WHERE r.p = 'http://schema.org/review'
            )
            SELECT c.x AS x, c.y AS y,
                   COALESCE(ra.auth, '') AS auth
            FROM c LEFT JOIN ra ON ra.x = c.x
            ORDER BY x, y LIMIT 600
        """,
        # SPARQL ZeroOrMorePath: recursive-CTE closure UNION the
        # identity over subjects∪objects, restricted to review
        # subjects — zero-length-path semantics certified against an
        # independent recursive evaluation.
        "q_sparql_star": f"""
            WITH RECURSIVE t AS (
              SELECT s, p, o
              FROM read_parquet('{ORACLE_DIR}/sf0.01/triples/*.parquet')
            ),
            e AS (
              SELECT s, o FROM t
              WHERE p = 'http://schema.org/relatedLink'
            ),
            c AS (
              SELECT s AS x, o AS y FROM e
              UNION
              SELECT c.x, e.o FROM c JOIN e ON c.y = e.s
            ),
            nodes AS (
              -- explicit DISTINCT: inside a WITH RECURSIVE block
              -- DuckDB gives plain UNION CTEs append semantics
              SELECT DISTINCT n FROM (
                SELECT s AS n FROM t UNION ALL SELECT o AS n FROM t
              )
            ),
            cz AS (
              SELECT DISTINCT x, y FROM (
                SELECT x, y FROM c
                UNION ALL
                SELECT n, n FROM nodes
              )
            ),
            rev AS (
              SELECT DISTINCT s FROM t
              WHERE p = 'http://schema.org/review'
            )
            SELECT cz.x AS x, cz.y AS y
            FROM cz JOIN rev ON rev.s = cz.x
            ORDER BY x, y LIMIT 600
        """,
        # SPARQL aggregates: the compiled groupBy().agg() replayed as
        # a plain DuckDB aggregate (COUNT is BIGINT on both sides;
        # MIN/MAX on strings memcmp UTF-8 bytes on both engines).
        "q_sparql_agg": f"""
            WITH t AS (
              SELECT s, p, o
              FROM read_parquet('{ORACLE_DIR}/sf0.01/triples/*.parquet')
            )
            SELECT p, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(COUNT(DISTINCT s) AS BIGINT) AS n_subj,
                   MIN(o) AS lo, MAX(o) AS hi
            FROM t GROUP BY p ORDER BY p
        """,
        # SPARQL HAVING + arithmetic aggregates: the micros
        # quantization floor(try_cast(v)*1e6), the exact integer SUM
        # (CAST AS BIGINT guards DuckDB's HUGEINT promotion), the
        # floor-divided mean, and the ORDER BY-pinned string_agg all
        # replayed; one final /1e6 division of identical integers
        # makes the doubles bit-equal across engines.
        "q_sparql_having": f"""
            WITH t AS (
              SELECT s, p, o
              FROM read_parquet('{ORACLE_DIR}/sf0.01/triples/*.parquet')
            ), r AS (
              SELECT a.o AS auth, v.o AS lex,
                     CAST(floor(try_cast(v.o AS DOUBLE) * 1000000)
                          AS BIGINT) AS q
              FROM t rv
              JOIN t a ON a.s = rv.o
                   AND a.p = 'http://schema.org/author'
              JOIN t v ON v.s = rv.s
                   AND v.p = 'http://schema.org/ratingValue'
              WHERE rv.p = 'http://schema.org/review'
            ), g AS (
              SELECT auth,
                     CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(q) AS BIGINT) AS sq,
                     CAST(COUNT(q) AS BIGINT) AS cq,
                     string_agg(lex, '|' ORDER BY lex) AS vals
              FROM r GROUP BY auth
            )
            SELECT auth, n,
                   sq / 1000000.0 AS total,
                   CAST(floor(sq / cq) AS BIGINT) / 1000000.0 AS mean,
                   vals
            FROM g WHERE n >= 2 ORDER BY auth
        """,
        # SPARQL FILTER EXISTS / NOT EXISTS: DuckDB's correlated
        # EXISTS subqueries — a different semi/anti formulation that
        # must pick the identical rows.
        "q_sparql_exists": f"""
            WITH t AS (
              SELECT s, p, o
              FROM read_parquet('{ORACLE_DIR}/sf0.01/triples/*.parquet')
            )
            SELECT n.s AS subj, n.o AS name
            FROM t n
            WHERE n.p = 'http://schema.org/name'
              AND EXISTS (
                SELECT 1 FROM t l
                WHERE l.s = n.s
                  AND l.p = 'http://schema.org/relatedLink'
              )
              AND NOT EXISTS (
                SELECT 1 FROM t r
                WHERE r.s = n.s AND r.p = 'http://schema.org/review'
              )
            ORDER BY subj, name
        """,
        # SPARQL CONSTRUCT: template instantiation replayed as two
        # projections UNION'd with set semantics (an RDF graph is a
        # set of triples).
        "q_sparql_construct": f"""
            WITH t AS (
              SELECT s, p, o
              FROM read_parquet('{ORACLE_DIR}/sf0.01/triples/*.parquet')
            ),
            ra AS (
              SELECT r.s AS page, a.o AS auth
              FROM t r JOIN t a ON a.s = r.o
                   AND a.p = 'http://schema.org/author'
              WHERE r.p = 'http://schema.org/review'
            )
            SELECT DISTINCT s, p, o FROM (
              SELECT page AS s,
                     'http://ex.org/kg/hasAuthor' AS p,
                     auth AS o
              FROM ra
              UNION ALL
              SELECT auth AS s,
                     'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
                       AS p,
                     'http://ex.org/kg/Author' AS o
              FROM ra
            )
        """,
        # owl:sameAs canonicalization: perturbation (md5-prefix alias
        # chains), component closure (recursive-CTE min label — the
        # kg_linking idiom) and the kind-guarded rewrite all replayed
        # independently; restoring the original graph is the operator
        # contract, certified by counts + the md5-derived content pin.
        "q_sameas": f"""
            WITH RECURSIVE t AS (
              SELECT * FROM
                read_parquet('{ORACLE_DIR}/sf0.01/triples/*.parquet')
            ), d AS (
              SELECT g,
                CASE WHEN s_kind = 0 AND substr(md5(s),1,4) < '2aaa'
                       THEN s || '#sa2'
                     WHEN s_kind = 0 AND substr(md5(s),1,4) < '5555'
                       THEN s || '#sa1'
                     ELSE s END AS s,
                s_kind, p,
                CASE WHEN o_kind = 0 AND substr(md5(o),1,4) < '2aaa'
                       THEN o || '#sa2'
                     WHEN o_kind = 0 AND substr(md5(o),1,4) < '5555'
                       THEN o || '#sa1'
                     ELSE o END AS o,
                o_kind, o_dt, o_lang
              FROM t
            ), nodes AS (
              SELECT DISTINCT x FROM (
                SELECT s AS x FROM t WHERE s_kind = 0
                UNION
                SELECT o AS x FROM t WHERE o_kind = 0
              ) WHERE substr(md5(x),1,4) < '5555'
            ), sa AS (
              SELECT x || '#sa1' AS a, x AS b FROM nodes
              UNION ALL
              SELECT x || '#sa2' AS a, x || '#sa1' AS b FROM nodes
              WHERE substr(md5(x),1,4) < '2aaa'
            ), edges AS (
              SELECT a, b FROM sa UNION SELECT b, a FROM sa
            ), reach(entity, r) AS (
              SELECT DISTINCT a, a FROM edges
              UNION
              SELECT e.a, reach.r FROM edges e
              JOIN reach ON reach.entity = e.b
            ), labels AS (
              SELECT entity, MIN(r) AS canon FROM reach GROUP BY entity
            ), rew AS (
              SELECT DISTINCT d.g,
                CASE WHEN d.s_kind = 0 THEN COALESCE(ls.canon, d.s)
                     ELSE d.s END AS s,
                d.s_kind, d.p,
                CASE WHEN d.o_kind = 0 THEN COALESCE(lo.canon, d.o)
                     ELSE d.o END AS o,
                d.o_kind, d.o_dt, d.o_lang
              FROM d
              LEFT JOIN labels ls ON ls.entity = d.s
              LEFT JOIN labels lo ON lo.entity = d.o
            )
            SELECT p, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(COUNT(DISTINCT s) AS BIGINT) AS n_subj,
                   CAST(SUM(CAST('0x' || substr(md5(s || chr(1) || p || chr(1) || o), 1, 10)
                                 AS BIGINT)) AS BIGINT) AS pin
            FROM rew GROUP BY p ORDER BY p
        """,
        # Named-graph semantics: the quad aggregate replayed over the
        # materialized triples (g participates in the content pin).
        "q_graphs": f"""
            SELECT (g <> '') AS is_named,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(COUNT(DISTINCT g) AS BIGINT) AS n_graphs,
                   CAST(COUNT(DISTINCT s) AS BIGINT) AS n_subj,
                   CAST(SUM(CAST('0x' || substr(md5(
                     g || chr(1) || s || chr(1) || p || chr(1) || o),
                     1, 10) AS BIGINT)) AS BIGINT) AS pin
            FROM read_parquet('{ORACLE_DIR}/sf0.01/triples/*.parquet')
            GROUP BY 1 ORDER BY 1
        """,
        # Recrawl scheduler: fetch synthesis, the integer interval
        # estimator, and BOTH window passes (slot, then the
        # running-max queue decomposition) replayed from the
        # materialized fetch log.
        "q_frontier": f"""
            WITH raw AS (
              SELECT url, CAST(epoch(warc_ts) AS BIGINT) AS ts0
              FROM read_parquet('{ORACLE_DIR}/sf0.01/pages_crawl/*.parquet')
            ), ex AS (
              SELECT url, ts0 + 3600 * k AS ts
              FROM raw, LATERAL (
                SELECT unnest(generate_series(0,
                  CAST('0x' || substr(md5(url), 3, 2) AS BIGINT) % 4))
                  AS k) s
            ), f AS (
              SELECT url,
                regexp_extract(url,
                  '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1) AS host,
                ts,
                CASE WHEN substr(md5(url), 1, 2) < '55'
                     THEN substr(md5(url || CAST(ts AS VARCHAR)), 1, 4)
                     ELSE 'v0' END AS version
              FROM ex
            ), pu AS (
              SELECT host, url,
                     CAST(COUNT(*) AS BIGINT) AS n_fetches,
                     CAST(COUNT(DISTINCT version) AS BIGINT)
                       AS n_versions,
                     MAX(ts) AS last_ts
              FROM f GROUP BY host, url
            ), iv AS (
              SELECT host, url, n_fetches, n_versions,
                CAST(CASE WHEN n_fetches = 1 THEN 86400
                     ELSE least(172800, greatest(86400,
                          CAST(86400 AS BIGINT) * (n_fetches - 1)
                          // greatest(1, n_versions - 1)))
                END AS BIGINT) AS interval_s,
                last_ts
              FROM pu
            ), due AS (
              SELECT *, last_ts + interval_s AS next_due FROM iv
            ), q1 AS (
              SELECT *, CAST(ROW_NUMBER() OVER (
                  PARTITION BY host ORDER BY next_due, url)
                - 1 AS BIGINT) AS slot
              FROM due
            ), q2 AS (
              SELECT *, MAX(next_due - 5 * slot) OVER (
                  PARTITION BY host ORDER BY next_due, url
                  ROWS UNBOUNDED PRECEDING) AS mx
              FROM q1
            )
            SELECT host, url, n_fetches, n_versions, interval_s,
                   next_due, slot, 5 * slot + mx AS sched_ts
            FROM q2
            WHERE substr(md5(host), 1, 2) < '40'
            ORDER BY host, slot
        """,
        # Sitemap ingestion: XML synthesis (string_agg ORDER BY ==
        # sort_array), block regexes, field extraction and the entity
        # replace chain all replayed in DuckDB/RE2.
        "q_sitemap": f"""
            WITH u AS (
              SELECT DISTINCT url FROM
                read_parquet('{ORACLE_DIR}/sf0.01/pages_meta/*.parquet')
            ), e AS (
              SELECT regexp_extract(url,
                       '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1) AS host,
                     CAST(CAST('0x' || substr(md5(url), 5, 2) AS BIGINT)
                          % 10 AS VARCHAR) AS d,
                     url
              FROM u
            ), entry AS (
              SELECT host,
                '  <url>' || chr(10) || '    <loc>' ||
                replace(url || '?ref=sitemap&id=' || d, '&', '&amp;')
                || '</loc>' || chr(10) || '    <lastmod>2026-01-1'
                || d || '</lastmod>' || chr(10) ||
                CASE WHEN d < '5'
                     THEN '    <priority>0.' || d || '</priority>'
                          || chr(10)
                     ELSE '' END ||
                '  </url>' AS entry
              FROM e
            ), xs AS (
              SELECT 'https://' || host || '/sitemap.xml'
                       AS sitemap_url,
                '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
                || chr(10) || string_agg(entry, chr(10) ORDER BY entry)
                || chr(10) || '</urlset>' AS xml
              FROM entry GROUP BY host
            ), xi AS (
              SELECT 'https://' || host || '/sitemap_index.xml'
                       AS sitemap_url,
                '<sitemapindex>' || chr(10) || '  <sitemap>' || chr(10)
                || '    <loc>https://' || host || '/sitemap.xml</loc>'
                || chr(10) || '    <lastmod>2026-02-01</lastmod>'
                || chr(10) || '  </sitemap>' || chr(10)
                || '</sitemapindex>' AS xml
              FROM (SELECT DISTINCT host FROM e)
              WHERE substr(md5(host), 1, 2) < '40'
            ), blocks AS (
              SELECT 'url' AS kind, b
              FROM xs, LATERAL (SELECT unnest(regexp_extract_all(
                xml, '(?s)<url\\b[^>]*>(.*?)</url>', 1)) AS b) s
              UNION ALL
              SELECT 'sitemap' AS kind, b
              FROM xi, LATERAL (SELECT unnest(regexp_extract_all(
                xml, '(?s)<sitemap\\b[^>]*>(.*?)</sitemap>', 1)) AS b) s
            ), fields AS (
              SELECT kind,
                NULLIF(regexp_extract(b,
                  '(?s)<loc\\b[^>]*>\\s*(.*?)\\s*</loc>', 1), '')
                  AS loc0,
                NULLIF(regexp_extract(b,
                  '(?s)<lastmod\\b[^>]*>\\s*(.*?)\\s*</lastmod>', 1), '')
                  AS lastmod,
                NULLIF(regexp_extract(b,
                  '(?s)<priority\\b[^>]*>\\s*(.*?)\\s*</priority>', 1),
                  '') AS priority
              FROM blocks
            ), fin AS (
              SELECT kind,
                replace(replace(replace(replace(replace(loc0,
                  '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                  '&apos;', ''''), '&amp;', '&') AS loc,
                lastmod, priority
              FROM fields WHERE loc0 IS NOT NULL
            )
            SELECT kind, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(COUNT(DISTINCT loc) AS BIGINT) AS n_locs,
                   CAST(COUNT(lastmod) AS BIGINT) AS n_lastmod,
                   CAST(COUNT(priority) AS BIGINT) AS n_priority,
                   CAST(SUM(CAST('0x' || substr(md5(loc), 1, 10)
                                 AS BIGINT)) AS BIGINT) AS pin
            FROM fin GROUP BY kind ORDER BY kind
        """,
        # The cascade replayed as chained CTEs: daily FROM hourly,
        # weekly FROM daily — never from raw twice.
        "q_rollup_cascade": """
            WITH h AS (
              SELECT date_trunc('hour', ts) AS b, event_type,
                     CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(CAST(round(value * 100) AS BIGINT))
                          AS BIGINT) AS v
              FROM events GROUP BY 1, 2
            ), d AS (
              SELECT date_trunc('day', b) AS b, event_type,
                     CAST(SUM(n) AS BIGINT) AS n,
                     CAST(SUM(v) AS BIGINT) AS v
              FROM h GROUP BY 1, 2
            ), wk AS (
              SELECT date_trunc('week', b) AS b, event_type,
                     CAST(SUM(n) AS BIGINT) AS n,
                     CAST(SUM(v) AS BIGINT) AS v
              FROM d GROUP BY 1, 2
            ), unioned AS (
              SELECT 'hour' AS grain, b, event_type, n, v FROM h
              UNION ALL
              SELECT 'day', b, event_type, n, v FROM d
              UNION ALL
              SELECT 'week', b, event_type, n, v FROM wk
            )
            SELECT grain,
                   strftime(b, '%Y-%m-%d %H:%M:%S') AS bucket_start,
                   event_type,
                   n AS n_events,
                   v AS value
            FROM unioned ORDER BY grain, bucket_start, event_type
        """,
        # Priority arithmetic + per-stratum rank replayed with
        # DuckDB's own window.
        "q_priority_sample": """
            WITH d AS (
              SELECT doc_id, lang,
                     CAST(length(text) + 1 AS BIGINT) AS w
              FROM documents
            ), p AS (
              SELECT doc_id, lang, w,
                     CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                          1, 15) AS BIGINT) // w AS prio
              FROM d WHERE w > 0
            ), r AS (
              SELECT *, ROW_NUMBER() OVER (
                PARTITION BY lang ORDER BY prio, doc_id) AS rn
              FROM p
            )
            SELECT lang, doc_id, w FROM r WHERE rn <= 5
            ORDER BY lang, doc_id
        """,
        # Variants regenerated and the segment classifier replayed
        # with DuckDB's own list_transform + regexp_matches — same
        # anchored Java∩RE2 patterns, same sorted query names.
        "q_url_templates": f"""
            WITH u AS (
              SELECT DISTINCT url FROM read_parquet(
                '{ORACLE_DIR}/sf0.01/pages_meta/*.parquet')
            ), allu AS (
              SELECT url FROM u
              UNION ALL
              SELECT url || '/blob/' || substr(md5(url), 1, 12) FROM u
              UNION ALL
              SELECT url || '/u/' || substr(md5(url), 1, 8) || '-'
                     || substr(md5(url), 9, 4) || '-'
                     || substr(md5(url), 13, 4) || '-'
                     || substr(md5(url), 17, 4) || '-'
                     || substr(md5(url), 21, 12) FROM u
              UNION ALL
              SELECT url || '?session=' || substr(md5(url), 1, 6)
                     || '&ref=x' FROM u
            ), parts AS (
              SELECT url,
                regexp_extract(url,
                  '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)', 1) AS host,
                regexp_extract(url,
                  '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1)
                  AS path,
                regexp_extract(url, '\\?([^#]*)', 1) AS q
              FROM allu
            ), tpl AS (
              SELECT url, host,
                array_to_string(list_transform(
                  string_split(path, '/'),
                  s -> CASE
                    WHEN regexp_matches(s,
                      '(?i)^[0-9a-f]{{8}}-[0-9a-f]{{4}}-[0-9a-f]{{4}}-[0-9a-f]{{4}}-[0-9a-f]{{12}}$')
                      THEN '{{uuid}}'
                    WHEN regexp_matches(s, '^[0-9]+$') THEN '{{n}}'
                    WHEN regexp_matches(s, '(?i)^[0-9a-f]{{8,}}$')
                         AND regexp_matches(s, '(?i)[a-f]')
                         AND regexp_matches(s, '[0-9]')
                      THEN '{{hex}}'
                    ELSE s END), '/') AS tpath,
                array_to_string(list_sort(regexp_extract_all(
                  q, '(?:^|&)([^&=]+)=', 1)), '&') AS qnames
              FROM parts
            ), named AS (
              SELECT host || tpath ||
                     CASE WHEN qnames <> '' THEN '?' || qnames
                          ELSE '' END AS template,
                     url
              FROM tpl WHERE host <> ''
            )
            SELECT template,
                   CAST(COUNT(*) AS BIGINT) AS n_urls,
                   CAST(COUNT(DISTINCT url) AS BIGINT) AS n_distinct,
                   MIN(url) AS example
            FROM named GROUP BY template ORDER BY template
        """,
        # Declared-formula ground truth: flags and counts recomputed
        # from the md5 classes without parsing a byte of HTML.
        "q_page_directives": f"""
            WITH u AS (
              SELECT DISTINCT url FROM read_parquet(
                '{ORACLE_DIR}/sf0.01/pages_meta/*.parquet')
            ), c AS (
              SELECT CAST('0x' || substr(md5(url), 3, 2) AS BIGINT) % 4
                       AS d2,
                     CAST('0x' || substr(md5(url), 7, 2) AS BIGINT) % 3
                       AS nlinks
              FROM u
            ), f AS (
              SELECT d2 IN (0, 2) AS noindex,
                     d2 IN (1, 2) AS nofollow,
                     nlinks
              FROM c
            )
            SELECT noindex, nofollow,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(nlinks) AS BIGINT) AS n_links
            FROM f GROUP BY noindex, nofollow
            ORDER BY noindex, nofollow
        """,
        # Hamilton largest-remainder replayed with a PLAIN global
        # ROW_NUMBER over (rem DESC, host) — vs the operator's
        # two-level blocked rank; same +1 recipients required.
        "q_apportion": f"""
            WITH w AS (
              SELECT regexp_extract(url,
                       '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1) AS host,
                     CAST(COUNT(DISTINCT url) AS BIGINT) AS w
              FROM read_parquet(
                '{ORACLE_DIR}/sf0.01/pages_meta/*.parquet')
              GROUP BY host
            ), t AS (
              SELECT CAST(SUM(w) AS BIGINT) AS wtot FROM w
            ), j AS (
              SELECT host, w,
                     (997 * w) // wtot AS base,
                     (997 * w) % wtot AS rem
              FROM w CROSS JOIN t
            ), r AS (
              SELECT 997 - CAST(SUM(base) AS BIGINT) AS extras FROM j
            ), ranked AS (
              SELECT host, w, base,
                     ROW_NUMBER() OVER (ORDER BY rem DESC, host ASC)
                       AS rk
              FROM j
            )
            SELECT host, w,
                   CAST(base + CASE WHEN rk <= (SELECT extras FROM r)
                                    THEN 1 ELSE 0 END AS BIGINT)
                     AS alloc
            FROM ranked ORDER BY host
        """,
        # Identical XML rebuilt in SQL, re-extracted with the same
        # block/field regexes and entity replace chain (q_sitemap
        # discipline for the feed channel).
        "q_feeds": f"""
            WITH u AS (
              SELECT DISTINCT url FROM
                read_parquet('{ORACLE_DIR}/sf0.01/pages_meta/*.parquet')
            ), e AS (
              SELECT regexp_extract(url,
                       '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1) AS host,
                     CAST(CAST('0x' || substr(md5(url), 5, 2) AS BIGINT)
                          % 10 AS VARCHAR) AS d,
                     url
              FROM u
            ), marked AS (
              SELECT host, substr(md5(host), 1, 2) < '80' AS is_rss,
                     d, url,
                     replace(url || '?ref=feed&id=' || d, '&', '&amp;')
                       AS esc
              FROM e
            ), entry AS (
              SELECT host, is_rss,
                CASE WHEN is_rss THEN
                  '  <item>' || chr(10) || '    <title>Page ' || d
                  || '</title>' || chr(10) || '    <link>' || esc
                  || '</link>' || chr(10) || '    <guid>' || url
                  || '</guid>' || chr(10) ||
                  CASE WHEN d < '5'
                       THEN '    <pubDate>Mon, 0' || d
                            || ' Jan 2026</pubDate>' || chr(10)
                       ELSE '' END ||
                  '  </item>'
                ELSE
                  '  <entry>' || chr(10) || '    <title>Page ' || d
                  || '</title>' || chr(10) || '    <link href="' || esc
                  || '"/>' || chr(10) || '    <id>' || url
                  || '</id>' || chr(10) ||
                  CASE WHEN d < '5'
                       THEN '    <updated>2026-01-1' || d
                            || '</updated>' || chr(10)
                       ELSE '' END ||
                  '  </entry>'
                END AS entry
              FROM marked
            ), feeds AS (
              SELECT is_rss,
                CASE WHEN is_rss
                     THEN '<rss version="2.0"><channel>' || chr(10)
                     ELSE '<feed xmlns="http://www.w3.org/2005/Atom">'
                          || chr(10) END
                || string_agg(entry, chr(10) ORDER BY entry)
                || CASE WHEN is_rss
                        THEN chr(10) || '</channel></rss>'
                        ELSE chr(10) || '</feed>' END AS xml
              FROM entry GROUP BY host, is_rss
            ), blocks AS (
              SELECT 'rss' AS kind, b
              FROM feeds, LATERAL (SELECT unnest(regexp_extract_all(
                xml, '(?s)<item\\b[^>]*>(.*?)</item>', 1)) AS b) s
              UNION ALL
              SELECT 'atom' AS kind, b
              FROM feeds, LATERAL (SELECT unnest(regexp_extract_all(
                xml, '(?s)<entry\\b[^>]*>(.*?)</entry>', 1)) AS b) s
            ), fields AS (
              SELECT kind,
                NULLIF(CASE WHEN kind = 'rss'
                  THEN regexp_extract(b,
                    '(?s)<link\\b[^>]*>\\s*(.*?)\\s*</link>', 1)
                  ELSE regexp_extract(b,
                    '(?s)<link\\b[^>]*href\\s*=\\s*"([^"]*)"', 1)
                  END, '') AS link0,
                NULLIF(regexp_extract(b,
                  '(?s)<title\\b[^>]*>\\s*(.*?)\\s*</title>', 1), '')
                  AS title,
                NULLIF(CASE WHEN kind = 'rss'
                  THEN regexp_extract(b,
                    '(?s)<guid\\b[^>]*>\\s*(.*?)\\s*</guid>', 1)
                  ELSE regexp_extract(b,
                    '(?s)<id\\b[^>]*>\\s*(.*?)\\s*</id>', 1)
                  END, '') AS entry_id,
                NULLIF(CASE WHEN kind = 'rss'
                  THEN regexp_extract(b,
                    '(?s)<pubDate\\b[^>]*>\\s*(.*?)\\s*</pubDate>', 1)
                  ELSE regexp_extract(b,
                    '(?s)<updated\\b[^>]*>\\s*(.*?)\\s*</updated>', 1)
                  END, '') AS published
              FROM blocks
            ), fin AS (
              SELECT kind,
                replace(replace(replace(replace(replace(link0,
                  '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                  '&apos;', ''''), '&amp;', '&') AS link,
                title, entry_id, published
              FROM fields WHERE link0 IS NOT NULL
            )
            SELECT kind, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(COUNT(DISTINCT link) AS BIGINT) AS n_links,
                   CAST(COUNT(title) AS BIGINT) AS n_titles,
                   CAST(COUNT(entry_id) AS BIGINT) AS n_ids,
                   CAST(COUNT(published) AS BIGINT) AS n_pub,
                   CAST(SUM(CAST('0x' || substr(md5(link), 1, 10)
                                 AS BIGINT)) AS BIGINT) AS pin
            FROM fin GROUP BY kind ORDER BY kind
        """,
        # SPARQL filter surface: VALUES/IN, numeric TRY_CAST compare,
        # regexp_matches, LIMIT-OFFSET pagination — each predicate
        # replayed with DuckDB's own machinery.
        "q_sparql_filter": f"""
            WITH t AS (
              SELECT s, p, o FROM
                read_parquet('{ORACLE_DIR}/sf0.01/triples/*.parquet')
            )
            SELECT n.s AS page, n.o AS name, r.o AS rating
            FROM t n JOIN t r ON r.s = n.s
            WHERE n.p = 'http://schema.org/name'
              AND r.p = 'http://schema.org/ratingValue'
              AND r.o IN ('2.0','2.2','2.4','2.6','2.8','3.0','3.2','3.4')
              AND TRY_CAST(r.o AS DOUBLE) >= 2.2
              AND regexp_matches(n.o, '[24680]»$')
            ORDER BY page, rating LIMIT 200 OFFSET 10
        """,
        # NFC: the same synthetic decomposed corpus rebuilt with
        # chr() formulas and normalized by DuckDB's OWN
        # nfc_normalize — two independent UAX #15 implementations
        # must produce identical lengths, flags, and text pins.
        "q_nfc": f"""
            WITH ids AS (
              SELECT unnest(generate_series(
                0, {max(200, int(200_000 * 0.01)) - 1})) AS i
            ), t AS (
              SELECT i,
                'w' || chr(CAST(97 + i % 26 AS INTEGER)) ||
                CASE WHEN i % 3 > 0
                     THEN chr(CAST(768 + i % 5 AS INTEGER))
                     ELSE '' END || ' ' ||
                CASE WHEN i % 3 > 0
                     THEN chr(CAST(4352 + i % 19 AS INTEGER)) ||
                          chr(CAST(4449 + i % 21 AS INTEGER))
                     ELSE 'xy' END || ' q' ||
                CASE WHEN i % 2 = 1 THEN chr(807) ELSE '' END AS text
              FROM ids
            ), nn AS (
              SELECT i, text, nfc_normalize(text) AS nfc FROM t
            )
            SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(CASE WHEN text <> nfc THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_changed,
                   CAST(SUM(length(text)) AS BIGINT) AS len_before,
                   CAST(SUM(length(nfc)) AS BIGINT) AS len_after,
                   CAST(SUM(CAST('0x' || substr(md5(
                     CAST(i AS VARCHAR) || chr(1) || nfc), 1, 10)
                     AS BIGINT)) AS BIGINT) AS pin
            FROM nn
        """,
        # Anchor text: the synthesized (dst, anchor) pair set
        # regenerated from the (id, k) formulas, counted, and
        # top-3-ranked with the same (n DESC, anchor) tie-break.
        "q_anchor_text": f"""
            WITH ids AS (
              SELECT unnest(generate_series(
                0, {max(200, int(200_000 * 0.01)) - 1})) AS i
            ), ks AS (
              SELECT unnest(generate_series(0, 4)) AS k
            ), pairs AS (
              SELECT
                'http://site' || CAST((i*5+k) % 23 AS VARCHAR) ||
                '.example/page/' || CAST((i*5+k) % 51 AS VARCHAR)
                  AS dst,
                'term' || CAST((i*5+k) % 11 AS VARCHAR) ||
                ' w' || CAST((i*5+k) % 13 AS VARCHAR) AS anchor
              FROM ids, ks
            ), counts AS (
              SELECT dst, anchor, CAST(COUNT(*) AS BIGINT) AS n
              FROM pairs GROUP BY dst, anchor
            ), ranked AS (
              SELECT dst, anchor, n,
                     ROW_NUMBER() OVER (
                       PARTITION BY dst ORDER BY n DESC, anchor
                     ) AS rank
              FROM counts
            )
            SELECT dst, anchor, n, CAST(rank AS INTEGER) AS rank
            FROM ranked WHERE rank <= 3 ORDER BY dst, rank
        """,
        # EXIF certificate: every expected (media_id, ifd, name,
        # value) row regenerated from the generator's closed-form
        # formulas over generate_series — no payload byte read — and
        # SHACL report: every constraint replayed relationally over
        # the DISTINCT materialized triple set — focus filter,
        # per-path value joins, cardinality counts, datatype/
        # nodeKind/length/pattern row checks, NOT-IN class check —
        # with the same per-violation (focus, value) md5 pin.
        "q_shacl": f"""
            WITH t AS (
              SELECT DISTINCT s, p, o, o_kind, o_dt, o_lang
              FROM read_parquet('{ORACLE_DIR}/sf0.01/triples/*.parquet')
            ), focus AS (
              SELECT DISTINCT s FROM t
              WHERE p = 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
                AND o = 'http://schema.org/Thing'
            ), name_vals AS (
              SELECT f.s AS focus, t.o, t.o_kind, t.o_dt, t.o_lang
              FROM focus f
              JOIN t ON t.s = f.s AND t.p = 'http://schema.org/name'
            ), link_vals AS (
              SELECT f.s AS focus, t.o, t.o_kind
              FROM focus f
              JOIN t ON t.s = f.s AND t.p = 'http://schema.org/relatedLink'
            ), review_vals AS (
              SELECT f.s AS focus, t.o, t.o_kind
              FROM focus f
              JOIN t ON t.s = f.s AND t.p = 'http://schema.org/review'
            ), rating_vals AS (
              SELECT f.s AS focus, t.o, t.o_kind
              FROM focus f
              JOIN t ON t.s = f.s AND t.p = 'http://schema.org/ratingValue'
            ), viol AS (
              SELECT f.s AS focus, 'minCount' AS con,
                     'http://schema.org/name' AS path, '' AS value
              FROM focus f LEFT JOIN (
                SELECT focus, COUNT(*) AS n FROM name_vals GROUP BY focus
              ) c ON c.focus = f.s
              WHERE COALESCE(c.n, 0) < 1
              UNION ALL
              SELECT focus, 'maxCount', 'http://schema.org/name', ''
              FROM (
                SELECT focus, COUNT(*) AS n FROM name_vals GROUP BY focus
              ) WHERE n > 1
              UNION ALL
              SELECT focus, 'datatype', 'http://schema.org/name', o
              FROM name_vals
              WHERE NOT (o_kind = 1
                AND o_dt IN ('', 'http://www.w3.org/2001/XMLSchema#string')
                AND o_lang = '')
              UNION ALL
              SELECT focus, 'maxLength', 'http://schema.org/name', o
              FROM name_vals WHERE length(o) > 18
              UNION ALL
              SELECT focus, 'nodeKind', 'http://schema.org/relatedLink', o
              FROM link_vals WHERE o_kind <> 0
              UNION ALL
              SELECT focus, 'class', 'http://schema.org/relatedLink', o
              FROM link_vals
              WHERE o_kind <> 1 AND o NOT IN (SELECT s FROM focus)
              UNION ALL
              SELECT focus, 'nodeKind', 'http://schema.org/review', o
              FROM review_vals WHERE o_kind <> 2
              UNION ALL
              SELECT focus, 'pattern', 'http://schema.org/ratingValue', o
              FROM rating_vals
              WHERE o_kind <> 1
                 OR NOT regexp_matches(o, '^[0-9]+\\.[0-9]$')
            )
            SELECT con AS "constraint", path,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(COUNT(DISTINCT focus) AS BIGINT) AS n_focus,
                   CAST(SUM(CAST('0x' || substr(md5(
                     focus || chr(1) || value), 1, 10) AS BIGINT))
                     AS BIGINT) AS pin
            FROM viol GROUP BY con, path ORDER BY con, path
        """,
        # RDF/XML certificate: every expected canonical N-Triples
        # line regenerated closed-form from the doc id (typed node,
        # lang literal, typed literal, resource link, rdf:_n
        # container rows, property-attribute blank) — sorted and
        # md5-pinned exactly as the Spark side does. rt_ok is the
        # writer→reparse fixpoint, always 1 by construction.
        "q_rdfxml": f"""
            WITH ids AS (
              SELECT unnest(range(0,
                {max(64, int(200_000 * 0.01) // 8)})) AS i
            ), lines AS (
              SELECT i, '<http://ex.org/item/' || CAST(i AS VARCHAR)
                || '> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type>'
                || ' <http://schema.org/Thing> .' AS line
              FROM ids WHERE i % 2 = 0
              UNION ALL
              SELECT i, '<http://ex.org/item/' || CAST(i AS VARCHAR)
                || '> <http://schema.org/name> "Item '
                || CAST(i AS VARCHAR) || '"@en .' FROM ids
              UNION ALL
              SELECT i, '<http://ex.org/item/' || CAST(i AS VARCHAR)
                || '> <http://schema.org/age> "' || CAST(i AS VARCHAR)
                || '"^^<http://www.w3.org/2001/XMLSchema#integer> .'
              FROM ids
              UNION ALL
              SELECT i, '<http://ex.org/item/' || CAST(i AS VARCHAR)
                || '> <http://schema.org/knows> <http://ex.org/item/'
                || CAST((i * 7) % {max(64, int(200_000 * 0.01) // 8)}
                        AS VARCHAR)
                || '> .' FROM ids
              UNION ALL
              SELECT i, '<http://ex.org/item/' || CAST(i AS VARCHAR)
                || '> <http://www.w3.org/1999/02/22-rdf-syntax-ns#_'
                || CAST(j.j AS VARCHAR) || '> "v' || CAST(j.j AS VARCHAR)
                || '" .'
              FROM ids, LATERAL (
                SELECT unnest(range(1, 2 + i % 3)) AS j) j
              UNION ALL
              SELECT i, '<http://ex.org/item/' || CAST(i AS VARCHAR)
                || '> <http://schema.org/address> _:b1 .'
              FROM ids WHERE i % 4 = 0
              UNION ALL
              SELECT i, '_:b1 <http://schema.org/postalCode> "'
                || CAST(10000 + i AS VARCHAR) || '" .'
              FROM ids WHERE i % 4 = 0
            ), doc AS (
              SELECT i, CAST(COUNT(*) AS BIGINT) AS n_triples,
                     md5(string_agg(line, chr(10) ORDER BY line))
                       AS nt_md5
              FROM lines GROUP BY i
            )
            SELECT CAST(i AS BIGINT) AS doc_id, n_triples,
                   CAST(CASE WHEN i % 4 = 0 THEN 1 ELSE 0 END
                        AS BIGINT) AS n_blanks,
                   CAST(1 AS INTEGER) AS rt_ok, nt_md5
            FROM doc ORDER BY doc_id
        """,
        # PDF text extraction: every document's pages regenerated
        # closed-form from the row id (the writer/parser pair is the
        # unit under test — encode→decode must land exactly on this
        # formula), full text re-joined with chr(10), md5-pinned.
        "q_pdf_text": f"""
            WITH ids AS (
              SELECT unnest(range(0,
                {max(64, int(200_000 * 0.01) // 8)})) AS id
            ), pg AS (
              SELECT id, pp.p AS p,
                     'Doc ' || CAST(id AS VARCHAR) || ' page '
                     || CAST(pp.p AS VARCHAR) || ': '
                     || repeat('word ', CAST(1 + (id + pp.p) % 4 AS INT))
                     || '(' || chr(233) || ')\\.' AS t
              FROM ids, LATERAL (
                SELECT unnest(range(0, 1 + id % 3)) AS p) pp
            ), doc AS (
              SELECT id, CAST(COUNT(*) AS INT) AS n_pages,
                     string_agg(t, chr(10) ORDER BY p) AS full_text
              FROM pg GROUP BY id
            )
            SELECT CAST(id AS BIGINT) AS media_id, n_pages,
                   CAST(length(full_text) AS INT) AS n_chars,
                   md5(full_text) AS text_md5
            FROM doc
        """,
        # aggregated identically (per-row md5 pin over
        # media_id||chr(1)||value).
        "q_mm_exif": f"""
            WITH ids AS (
              SELECT unnest(generate_series(
                0, {max(64, int(200_000 * 0.01) // 64) - 1})) AS i
            ), rows_ AS (
              SELECT i AS media_id, 'ifd0' AS ifd, 'Make' AS name,
                     'Cam' || CAST(i % 7 AS VARCHAR) AS value FROM ids
              UNION ALL
              SELECT i, 'ifd0', 'Model',
                     'M' || CAST(i % 13 AS VARCHAR) FROM ids
              UNION ALL
              SELECT i, 'ifd0', 'Orientation',
                     CAST(1 + i % 8 AS VARCHAR) FROM ids
              UNION ALL
              SELECT i, 'ifd0', 'XResolution',
                     CAST(72 + (i % 4) * 24 AS VARCHAR) || '/1' FROM ids
              UNION ALL
              SELECT i, 'ifd0', 'DateTime',
                     '2020:01:' ||
                     lpad(CAST(1 + i % 28 AS VARCHAR), 2, '0') ||
                     ' 12:' || lpad(CAST(i % 60 AS VARCHAR), 2, '0') ||
                     ':00' FROM ids
              UNION ALL
              SELECT i, 'exif', 'ExposureTime',
                     '1/' || CAST(30 + i % 30 AS VARCHAR) FROM ids
              UNION ALL
              SELECT i, 'exif', 'ISOSpeedRatings',
                     CAST(100 + (i % 8) * 50 AS VARCHAR) FROM ids
              UNION ALL
              SELECT i, 'exif', 'PixelXDimension',
                     CAST(8 + (i * 37) % 24 AS VARCHAR) FROM ids
            )
            SELECT ifd, name, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(COUNT(DISTINCT value) AS BIGINT) AS n_vals,
                   CAST(SUM(CAST('0x' || substr(md5(
                     CAST(media_id AS VARCHAR) || chr(1) || value),
                     1, 10) AS BIGINT)) AS BIGINT) AS pin
            FROM rows_ GROUP BY ifd, name ORDER BY ifd, name
        """,
        # SPARQL BIND: the computed columns (string pipeline +
        # arithmetic rescale) and the bind-fed filter replayed in
        # SQL. Floats cross as round(x, 6); the filter applies to
        # the UNROUNDED value on both engines.
        "q_sparql_bind": f"""
            WITH t AS (
              SELECT s, p, o
              FROM read_parquet('{ORACLE_DIR}/sf0.01/triples/*.parquet')
            )
            SELECT n.s AS page,
                   upper(n.o) || '!' AS shout,
                   ROUND(TRY_CAST(v.o AS DOUBLE) * 10 - 5, 6) AS score
            FROM t n
            JOIN t v ON v.s = n.s
            WHERE n.p = 'http://schema.org/name'
              AND v.p = 'http://schema.org/ratingValue'
              AND (TRY_CAST(v.o AS DOUBLE) * 10 - 5) >= 20
            ORDER BY page LIMIT 300
        """,
        # SPARQL DESCRIBE: the distinct described-resource set
        # joined back as subject, replayed as a semi-join.
        "q_sparql_describe": f"""
            WITH t AS (
              SELECT s, p, o
              FROM read_parquet('{ORACLE_DIR}/sf0.01/triples/*.parquet')
            )
            SELECT s, p, o FROM t
            WHERE s IN (
              SELECT DISTINCT s FROM t
              WHERE p = 'http://schema.org/ratingValue'
                AND TRY_CAST(o AS DOUBLE) >= 4.5
            )
            ORDER BY s, p, o
        """,
        # Skolemization: the kind-guarded genid prefix concat
        # replayed over the materialized triples.
        "q_skolem": f"""
            WITH t AS (
              SELECT * FROM
                read_parquet('{ORACLE_DIR}/sf0.01/triples/*.parquet')
            ), sk AS (
              SELECT
                CASE WHEN s_kind = 2 THEN
                  'https://serd-spark.invalid/.well-known/genid/' || s
                ELSE s END AS s,
                CAST(CASE WHEN s_kind = 2 THEN 0 ELSE s_kind END
                     AS INTEGER) AS sk,
                CASE WHEN o_kind = 2 THEN
                  'https://serd-spark.invalid/.well-known/genid/' || o
                ELSE o END AS o,
                CAST(CASE WHEN o_kind = 2 THEN 0 ELSE o_kind END
                     AS INTEGER) AS ok
              FROM t
            )
            SELECT sk, ok, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(COUNT(DISTINCT s) AS BIGINT) AS n_subj,
                   CAST(SUM(CAST('0x' || substr(md5(
                     s || chr(1) || o), 1, 10) AS BIGINT)) AS BIGINT)
                     AS pin
            FROM sk GROUP BY sk, ok ORDER BY sk, ok
        """,
        # RDFC-1.0 certificate: per-document run hashes and the
        # isomorphism verdict recomputed from the materialized
        # canonical lines (ASCII-only, so binary UTF-8 ORDER BY here
        # equals Spark's array_sort ordering byte-for-byte).
        "q_c14n": f"""
            WITH l AS (
              SELECT * FROM
                read_parquet('{ORACLE_DIR}/sf0.01/c14n_lines/*.parquet')
            ), g AS (
              SELECT url,
                CAST(COUNT(*) FILTER (WHERE run = 'o') AS BIGINT) AS n_o,
                CAST(COUNT(*) FILTER (WHERE run = 'p') AS BIGINT) AS n_p,
                md5(COALESCE(string_agg(line, chr(10) ORDER BY line)
                    FILTER (WHERE run = 'o'), '')) AS h_o,
                md5(COALESCE(string_agg(line, chr(10) ORDER BY line)
                    FILTER (WHERE run = 'p'), '')) AS h_p
              FROM l GROUP BY url
            )
            SELECT url, n_o, n_p, h_o, h_p,
                   CAST(CASE WHEN h_o = h_p THEN 1 ELSE 0 END
                        AS INTEGER) AS iso
            FROM g ORDER BY url
        """,
        # VoID description: every statistic and partition triple
        # rebuilt from the materialized triples with DuckDB's own
        # aggregates.
        "q_void": f"""
            WITH t AS (
              SELECT s, p, o FROM
                read_parquet('{ORACLE_DIR}/sf0.01/triples/*.parquet')
            ), ds AS (SELECT 'https://serd-spark.invalid/kg' AS d)
            SELECT s, p, o FROM (
              SELECT d AS s,
                'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS p,
                'http://rdfs.org/ns/void#Dataset' AS o
              FROM ds WHERE EXISTS (SELECT 1 FROM t)
              UNION ALL
              SELECT d, 'http://rdfs.org/ns/void#triples',
                     CAST(COUNT(*) AS VARCHAR) FROM t, ds GROUP BY d
              UNION ALL
              SELECT d, 'http://rdfs.org/ns/void#distinctSubjects',
                     CAST(COUNT(DISTINCT s) AS VARCHAR)
              FROM t, ds GROUP BY d
              UNION ALL
              SELECT d, 'http://rdfs.org/ns/void#distinctObjects',
                     CAST(COUNT(DISTINCT o) AS VARCHAR)
              FROM t, ds GROUP BY d
              UNION ALL
              SELECT d, 'http://rdfs.org/ns/void#properties',
                     CAST(COUNT(DISTINCT p) AS VARCHAR)
              FROM t, ds GROUP BY d
              UNION ALL
              SELECT d, 'http://rdfs.org/ns/void#classes',
                     CAST(COUNT(DISTINCT o) AS VARCHAR)
              FROM t, ds
              WHERE p =
                'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
              GROUP BY d
              UNION ALL
              SELECT d, 'http://rdfs.org/ns/void#propertyPartition',
                     d || '/prop/' || md5(p)
              FROM t, ds GROUP BY d, p
              UNION ALL
              SELECT d || '/prop/' || md5(p),
                     'http://rdfs.org/ns/void#property', p
              FROM t, ds GROUP BY d, p
              UNION ALL
              SELECT d || '/prop/' || md5(p),
                     'http://rdfs.org/ns/void#triples',
                     CAST(COUNT(*) AS VARCHAR)
              FROM t, ds GROUP BY d, p
            )
            ORDER BY s, p, o
        """,
        # SPARQL MINUS: the anti join replayed as NOT EXISTS.
        "q_sparql_minus": f"""
            WITH t AS (
              SELECT s, p, o FROM
                read_parquet('{ORACLE_DIR}/sf0.01/triples/*.parquet')
            )
            SELECT n.s AS page, n.o AS name
            FROM t n
            WHERE n.p = 'http://schema.org/name'
              AND NOT EXISTS (
                SELECT 1 FROM t r
                WHERE r.p = 'http://schema.org/review' AND r.s = n.s
              )
            ORDER BY page LIMIT 400
        """,
        # robots.txt compliance: the URL-side match replayed as a
        # LIKE join (same escape discipline as the Spark patterns)
        # + the numeric precedence argmax over the materialized rules
        # table; the parse layer is pinned by unit tests.
        "q_robots": f"""
            WITH u AS (
              SELECT DISTINCT url FROM
                read_parquet('{ORACLE_DIR}/sf0.01/pages_meta/*.parquet')
            ), up AS (
              SELECT url,
                regexp_extract(url,
                  '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1) AS host,
                CASE WHEN regexp_extract(url,
                       '^[a-z][a-z0-9+.-]*://[^/?#]+([^?#]*)', 1) = ''
                     THEN '/'
                     ELSE regexp_extract(url,
                       '^[a-z][a-z0-9+.-]*://[^/?#]+([^?#]*)', 1)
                END AS path
              FROM u
            ), r AS (
              SELECT host, allow, like_pat, pat_len FROM
                read_parquet('{ORACLE_DIR}/sf0.01/robots_rules/*.parquet')
            ), sel AS (
              SELECT up.url, up.host, rr.pat_len * 2 + rr.allow AS k
              FROM up LEFT JOIN r rr
                ON rr.host = up.host
               AND up.path LIKE rr.like_pat ESCAPE '\\'
            ), best AS (
              SELECT url, host, MAX(k) AS k FROM sel GROUP BY url, host
            )
            SELECT (k IS NULL OR k % 2 = 1) AS allowed,
                   CAST(COUNT(*) AS BIGINT) AS n_urls,
                   CAST(COUNT(DISTINCT host) AS BIGINT) AS n_hosts,
                   CAST(SUM(CAST('0x' || substr(md5(url), 1, 10)
                                 AS BIGINT)) AS BIGINT) AS pin
            FROM best GROUP BY 1 ORDER BY 1
        """,
        # Compaction content certificate: the per-bucket aggregate of
        # the post-compaction table replayed from raw lineitem.
        "q_compact": """
            WITH li AS (
              SELECT l_orderkey * 10 + l_linenumber AS k,
                     CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
              FROM lineitem
            )
            SELECT CAST(CAST('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 8)
                        AS BIGINT) % 16 AS INT) AS kbucket,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(cents) AS BIGINT) AS sum_cents,
                   CAST(MIN(k) AS BIGINT) AS k_min,
                   CAST(MAX(k) AS BIGINT) AS k_max
            FROM li GROUP BY 1 ORDER BY kbucket
        """,
        # Keyed-table MERGE: update/insert/delete semantics and the
        # md5 storage bucketing replayed from raw orders.
        "q_upsert": """
            WITH o AS (
              SELECT o_orderkey AS k,
                     CAST(round(o_totalprice * 100) AS BIGINT) AS cents
              FROM orders
            ), upd AS (
              SELECT k, cents + 111 AS cents FROM o WHERE k % 7 = 0
              UNION ALL
              SELECT k + 100000000 AS k, k AS cents FROM o
              WHERE k % 97 = 0
            ), dels AS (
              SELECT k FROM o WHERE k % 13 = 0 AND k % 7 <> 0
            ), merged AS (
              SELECT k, cents FROM upd
              UNION ALL
              SELECT o.k, o.cents FROM o
              WHERE o.k NOT IN (SELECT k FROM upd)
                AND o.k NOT IN (SELECT k FROM dels)
            )
            SELECT CAST(CAST('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 8)
                        AS BIGINT) % 16 AS INT) AS kbucket,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(cents) AS BIGINT) AS sum_cents,
                   CAST(MIN(k) AS BIGINT) AS k_min,
                   CAST(MAX(k) AS BIGINT) AS k_max
            FROM merged GROUP BY 1 ORDER BY kbucket
        """,
        # Stream-stream interval join: wide watermark makes the
        # availableNow result exactly the batch inequality join.
        "stream_join": """
            SELECT c.event_id AS click_id,
                   CAST(COUNT(*) AS BIGINT) AS n_views,
                   CAST(MAX(v.event_id) AS BIGINT) AS last_view_id
            FROM events c JOIN events v
              ON v.user_id = c.user_id
             AND v.ts >= c.ts - INTERVAL 14400 SECOND AND v.ts <= c.ts
            WHERE c.event_type = 'click' AND v.event_type = 'view'
            GROUP BY c.event_id
            ORDER BY click_id
        """,
        # WARC fixpoint: the roundtrip aggregate recomputed from the
        # materialized source parquet — equality proves the sink and
        # scanner preserve every byte, record and timestamp.
        "q_assortativity": """
            WITH e0 AS (
              SELECT o_custkey % 9973 AS src, l_suppkey % 9973 AS dst
              FROM orders JOIN lineitem ON o_orderkey = l_orderkey
            ), e AS (
              SELECT src, dst FROM e0
              UNION ALL
              SELECT dst AS src, src AS dst FROM e0
            ), degx AS (
              SELECT src AS n_, CAST(COUNT(*) AS BIGINT) AS dx
              FROM e GROUP BY src
            ), degy AS (
              SELECT dst AS n_, CAST(COUNT(*) AS BIGINT) AS dy
              FROM e GROUP BY dst
            ), p AS (
              SELECT dx, dy FROM e
              JOIN degx ON e.src = degx.n_
              JOIN degy ON e.dst = degy.n_
            ), m AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(dx) AS BIGINT) AS sx,
                     CAST(SUM(dy) AS BIGINT) AS sy,
                     CAST(SUM(dx * dy) AS BIGINT) AS sxy,
                     CAST(SUM(dx * dx) AS BIGINT) AS sxx,
                     CAST(SUM(dy * dy) AS BIGINT) AS syy
              FROM p
            )
            SELECT n, sx, sy, sxy, sxx, syy,
                   CAST(round(
                     (n::DOUBLE * sxy::DOUBLE
                      - sx::DOUBLE * sy::DOUBLE)
                     / (sqrt(n::DOUBLE * sxx::DOUBLE
                             - sx::DOUBLE * sx::DOUBLE)
                        * sqrt(n::DOUBLE * syy::DOUBLE
                               - sy::DOUBLE * sy::DOUBLE))
                     * 1e6) AS BIGINT) AS r_micro
            FROM m
        """,
        "stream_funnel": """
            WITH e AS (
              SELECT user_id, ts, event_type FROM events
              WHERE event_type IN ('view', 'click', 'purchase')
            ), s1 AS (
              SELECT user_id, min(ts) AS t1 FROM e
              WHERE event_type = 'view' GROUP BY user_id
            ), s2 AS (
              SELECT e.user_id, min(e.ts) AS t2 FROM e
              JOIN s1 USING (user_id)
              WHERE e.event_type = 'click' AND e.ts > s1.t1
              GROUP BY e.user_id
            ), s3 AS (
              SELECT e.user_id, min(e.ts) AS t3 FROM e
              JOIN s2 USING (user_id)
              WHERE e.event_type = 'purchase' AND e.ts > s2.t2
              GROUP BY e.user_id
            )
            SELECT s1.user_id,
                   strftime(t1, '%Y-%m-%d %H:%M:%S.%f') AS t1,
                   strftime(t2, '%Y-%m-%d %H:%M:%S.%f') AS t2,
                   strftime(t3, '%Y-%m-%d %H:%M:%S.%f') AS t3
            FROM s1 JOIN s2 USING (user_id) JOIN s3 USING (user_id)
            ORDER BY user_id
        """,
        "q_length_batches": """
            WITH t AS (
              SELECT doc_id,
                     CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(regexp_split_to_array(trim(text),
                                                         '\\s+'))
                     END AS BIGINT) AS n_tokens
              FROM documents
            ), b AS (
              SELECT doc_id, n_tokens, n_tokens // 16 AS bucket,
                     (row_number() OVER (
                        PARTITION BY n_tokens // 16
                        ORDER BY n_tokens, doc_id) - 1) // 8
                       AS batch_idx
              FROM t
            )
            SELECT bucket, batch_idx,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(MAX(n_tokens) AS BIGINT) AS max_tok,
                   CAST(SUM(n_tokens) AS BIGINT) AS sum_tok,
                   CAST(MAX(n_tokens) * COUNT(*) - SUM(n_tokens)
                     AS BIGINT) AS padding_waste
            FROM b GROUP BY bucket, batch_idx
            ORDER BY bucket, batch_idx
        """,
        "q_c4_filters": f"""
            WITH p AS (
              SELECT url, string_split(text, chr(10)) AS lines
              FROM read_parquet('{ORACLE_DIR}/sf0.01/pages_text_latest/*.parquet')
            ), k AS (
              SELECT url, lines,
                     list_filter(lines, x ->
                       regexp_matches(trim(x), '[.!?"]$')
                       AND len(regexp_split_to_array(trim(x),
                                                     '\\s+')) >= 3
                       AND NOT contains(trim(x), '{{')
                       AND NOT contains(trim(x), '}}')
                       AND NOT contains(lower(trim(x)), 'lorem ipsum')
                     ) AS kept
              FROM p
            )
            SELECT url, CAST(len(lines) AS BIGINT) AS n_lines,
                   CAST(len(kept) AS BIGINT) AS n_kept,
                   md5(array_to_string(
                     list_transform(kept, x -> trim(x)), chr(10)))
                     AS kept_md5
            FROM k ORDER BY url
        """,
        "q_readability": """
            WITH f AS (
              SELECT doc_id,
                     CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(regexp_split_to_array(trim(text),
                                                         '\\s+'))
                     END AS BIGINT) AS words,
                     greatest(1::BIGINT, CAST(len(regexp_extract_all(
                       text, '[.!?]+')) AS BIGINT)) AS sentences,
                     CAST(len(regexp_extract_all(lower(text),
                       '[aeiouy]+')) AS BIGINT) AS vruns
              FROM documents
            ), s AS (
              SELECT doc_id, words, sentences,
                     greatest(words, vruns) AS syllables
              FROM f
            )
            SELECT doc_id, words, sentences, syllables,
                   CAST(206835000 - (1015000 * words) // sentences
                        - (84600000 * syllables)
                          // greatest(words, 1::BIGINT)
                     AS BIGINT) AS flesch_u,
                   CAST((390000 * words) // sentences
                        + (11800000 * syllables)
                          // greatest(words, 1::BIGINT)
                        - 15590000 AS BIGINT) AS grade_u
            FROM s ORDER BY doc_id
        """,
        "stream_upsert": f"""
            SELECT url, ts, hmd5 FROM (
              SELECT url,
                     strftime(warc_ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
                     hmd5,
                     row_number() OVER (
                       PARTITION BY url ORDER BY warc_ts DESC, _h DESC
                     ) AS rn
              FROM read_parquet(
                '{ORACLE_DIR}/sf0.01/upsert_raw_pages_h/*.parquet')
            ) WHERE rn = 1 ORDER BY url
        """,
        "q_sparql_update": f"""
            WITH store AS (
              SELECT DISTINCT s, p, o
              FROM read_parquet('{ORACLE_DIR}/sf0.01/triples/*.parquet')
            ), sol AS (
              SELECT s AS x, o AS y FROM store
              WHERE p = 'http://schema.org/relatedLink'
            ), kept AS (
              SELECT st.s, st.p, st.o FROM store st
              WHERE NOT EXISTS (
                SELECT 1 FROM sol
                WHERE st.s = sol.x
                  AND st.p = 'http://schema.org/relatedLink'
                  AND st.o = sol.y
              )
            ), ins AS (
              SELECT DISTINCT x AS s,
                     'http://www.w3.org/2000/01/rdf-schema#seeAlso'
                       AS p,
                     y AS o
              FROM sol
            ), fresh AS (
              SELECT i.s, i.p, i.o FROM ins i
              WHERE NOT EXISTS (
                SELECT 1 FROM kept k
                WHERE k.s = i.s AND k.p = i.p AND k.o = i.o
              )
            ), updated AS (
              SELECT * FROM kept UNION ALL SELECT * FROM fresh
            )
            SELECT p, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST('0x' || substr(md5(
                     concat_ws(chr(1), s, o)), 1, 10) AS BIGINT))
                     AS BIGINT) AS pin
            FROM updated GROUP BY p ORDER BY p
        """,
        "q_wat": f"""
            SELECT url, CAST(COUNT(*) AS BIGINT) AS n,
                   MIN(md5(wat)) AS h_min,
                   MAX(md5(wat)) AS h_max,
                   CAST(SUM(len(CAST(
                     json_extract(wat, '$.links') AS VARCHAR[]
                   ))) AS BIGINT) AS n_links
            FROM read_parquet('{ORACLE_DIR}/sf0.01/wat_src/*.parquet')
            GROUP BY url ORDER BY url
        """,
        "q_wet": f"""
            SELECT url, CAST(COUNT(*) AS BIGINT) AS n,
                   strftime(MAX(warc_ts), '%Y-%m-%d %H:%M:%S.%f')
                     AS ts_max,
                   MIN(md5(text)) AS h_min,
                   MAX(md5(text)) AS h_max
            FROM read_parquet('{ORACLE_DIR}/sf0.01/wet_src/*.parquet')
            GROUP BY url ORDER BY url
        """,
        "q_warc_roundtrip": f"""
            SELECT url, CAST(COUNT(*) AS BIGINT) AS n,
                   strftime(MAX(warc_ts), '%Y-%m-%d %H:%M:%S.%f')
                     AS ts_max,
                   MIN(md5(decode(html))) AS h_min,
                   MAX(md5(decode(html))) AS h_max
            FROM read_parquet('{ORACLE_DIR}/sf0.01/warc_src/*.parquet')
            GROUP BY url ORDER BY url
        """,
        # JSON props: DuckDB's own JSON engine re-extracts $.k — two
        # independent parsers must agree on every value.
        "q_json_props": """
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(json_extract_string(props, '$.k')
                                 AS BIGINT)) AS BIGINT) AS sum_k,
                   CAST(MIN(CAST(json_extract_string(props, '$.k')
                                 AS BIGINT)) AS BIGINT) AS min_k,
                   CAST(MAX(CAST(json_extract_string(props, '$.k')
                                 AS BIGINT)) AS BIGINT) AS max_k
            FROM events
            GROUP BY event_type
            ORDER BY event_type
        """,
        # 2-hop graph pattern: the BGP self-join replayed over the
        # materialized canonical triples.
        "q_kg_twohop": f"""
            WITH e AS (
              SELECT DISTINCT s, o
              FROM read_parquet('{ORACLE_DIR}/sf0.01/triples/*.parquet')
              WHERE p = 'http://schema.org/relatedLink'
            )
            SELECT a.s,
                   CAST(COUNT(*) AS BIGINT) AS n_paths,
                   CAST(COUNT(DISTINCT b.o) AS BIGINT) AS n_targets
            FROM e a JOIN e b ON a.o = b.s
            GROUP BY a.s
            ORDER BY n_paths DESC, a.s ASC
            LIMIT 50
        """,
        # Replay the curation funnel: lang filter, quality filter and
        # exact dedup recomputed INDEPENDENTLY in SQL; the near-dup
        # stage subtracts the materialized LSH loser set.
        "curate_metrics": f"""
            WITH lang_keep AS (
              SELECT doc_id, text FROM documents
              WHERE {_lang_case_sql()} = 'en'
            ), q AS (
              SELECT doc_id, text,
                     CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                     END AS q_tokens,
                     round(
                       (length(text) - length(regexp_replace(text,
                           '[^\\s\\p{{L}}\\p{{N}}]', '', 'g')))
                       / greatest(length(text), 1)::DOUBLE, 6)
                       AS q_punct_ratio,
                     round(
                       length(regexp_replace(text, '\\s+', '', 'g'))
                       / greatest(CASE WHEN length(trim(text)) = 0 THEN 0
                            ELSE len(regexp_split_to_array(trim(text),
                                                           '\\s+'))
                          END, 1)::DOUBLE, 6) AS q_mean_word_len
              FROM lang_keep
            ), quality_keep AS (
              SELECT doc_id, text FROM q
              WHERE q_tokens >= 5 AND q_mean_word_len <= 20.0
                AND q_punct_ratio <= 0.3
            ), exact_keep AS (
              SELECT doc_id FROM quality_keep
              WHERE doc_id IN (
                SELECT MIN(doc_id) FROM quality_keep
                GROUP BY md5(lower(regexp_replace(trim(text), '\\s+',
                                                  ' ', 'g')))
              )
            ), losers AS (
              SELECT doc_id
              FROM read_parquet('{ORACLE_DIR}/sf0.01/curate_losers/*.parquet')
            )
            SELECT 'input' AS stage,
                   (SELECT COUNT(*) FROM documents) AS n_docs
            UNION ALL SELECT 'lang_filter', COUNT(*) FROM lang_keep
            UNION ALL SELECT 'quality_filter', COUNT(*) FROM quality_keep
            UNION ALL SELECT 'exact_dedup', COUNT(*) FROM exact_keep
            UNION ALL SELECT 'near_dup_removal',
              (SELECT COUNT(*) FROM exact_keep
               WHERE doc_id NOT IN (SELECT doc_id FROM losers))
        """,
        # The 7-stage funnel: every filter stage replayed in SQL —
        # lang CASE, quality features, the unigram LM fit on the
        # post-quality survivors, exact dedup, the span frequency
        # table over the post-exact survivors — with only the LSH
        # loser set read from materialized parquet.
        "curate_metrics_full": f"""
            WITH lang_keep AS (
              SELECT doc_id, text FROM documents
              WHERE {_lang_case_sql()} = 'en'
            ), q AS (
              SELECT doc_id, text,
                     CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                     END AS q_tokens,
                     round(
                       (length(text) - length(regexp_replace(text,
                           '[^\\s\\p{{L}}\\p{{N}}]', '', 'g')))
                       / greatest(length(text), 1)::DOUBLE, 6)
                       AS q_punct_ratio,
                     round(
                       length(regexp_replace(text, '\\s+', '', 'g'))
                       / greatest(CASE WHEN length(trim(text)) = 0 THEN 0
                            ELSE len(regexp_split_to_array(trim(text),
                                                           '\\s+'))
                          END, 1)::DOUBLE, 6) AS q_mean_word_len
              FROM lang_keep
            ), quality_keep AS (
              SELECT doc_id, text FROM q
              WHERE q_tokens >= 5 AND q_mean_word_len <= 20.0
                AND q_punct_ratio <= 0.3
            ), lm_w2 AS (
              SELECT doc_id, w FROM (
                SELECT doc_id,
                       unnest(string_split(lower(regexp_replace(
                         trim(text), '\\s+', ' ', 'g')), ' ')) AS w
                FROM quality_keep
              ) WHERE w <> ''
            ), lm_counts AS (
              SELECT w, COUNT(*) AS cnt FROM lm_w2 GROUP BY w
            ), lm_tot AS (
              SELECT CAST(SUM(cnt) AS DOUBLE) AS total FROM lm_counts
            ), lm_vocab AS (
              SELECT w, CAST(round(ln(cnt / total) * 1000000) AS BIGINT)
                       AS lp
              FROM lm_counts, lm_tot
              ORDER BY cnt DESC, w ASC LIMIT 65536
            ), lm_oov AS (
              SELECT CAST(round(ln(0.5 / total) * 1000000) AS BIGINT)
                       AS oov
              FROM lm_tot
            ), lm_score AS (
              SELECT d.doc_id,
                     CAST(floor(SUM(COALESCE(v.lp, o.oov)) / COUNT(*))
                          AS BIGINT) AS lp_mean
              FROM lm_w2 d
              LEFT JOIN lm_vocab v USING (w)
              CROSS JOIN lm_oov o
              GROUP BY d.doc_id
            ), lm_keep AS (
              SELECT k.doc_id, k.text FROM quality_keep k
              JOIN lm_score s USING (doc_id)
              WHERE s.lp_mean >= -3450000
            ), exact_keep AS (
              SELECT doc_id, text FROM lm_keep
              WHERE doc_id IN (
                SELECT MIN(doc_id) FROM lm_keep
                GROUP BY md5(lower(regexp_replace(trim(text), '\\s+',
                                                  ' ', 'g')))
              )
            ), sp_toks AS (
              SELECT doc_id,
                     lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))
                       AS t,
                     string_split(lower(regexp_replace(trim(text),
                       '\\s+', ' ', 'g')), ' ') AS w
              FROM exact_keep
            ), sp_exp AS (
              SELECT doc_id, w,
                     unnest(generate_series(1, len(w) - 9)) AS i
              FROM sp_toks WHERE len(w) >= 10
            ), sp_spans AS (
              SELECT doc_id, array_to_string(w[i : i + 9], ' ') AS span
              FROM sp_exp
              UNION ALL
              SELECT doc_id, t AS span FROM sp_toks WHERE len(w) < 10
            ), sp_tot AS (
              SELECT span, COUNT(*) AS tot FROM sp_spans GROUP BY span
            ), sp_frac AS (
              SELECT s.doc_id,
                     round(SUM(CASE WHEN t.tot > 1 THEN 1 ELSE 0 END)
                           / COUNT(*)::DOUBLE, 6) AS f
              FROM sp_spans s JOIN sp_tot t USING (span)
              GROUP BY s.doc_id
            ), span_keep AS (
              SELECT e.doc_id FROM exact_keep e
              JOIN sp_frac USING (doc_id) WHERE f <= 0.5
            ), losers AS (
              SELECT doc_id FROM read_parquet(
                '{ORACLE_DIR}/sf0.01/curate_full_losers/*.parquet')
            )
            SELECT 'input' AS stage,
                   (SELECT COUNT(*) FROM documents) AS n_docs
            UNION ALL SELECT 'lang_filter', COUNT(*) FROM lang_keep
            UNION ALL SELECT 'quality_filter', COUNT(*) FROM quality_keep
            UNION ALL SELECT 'lm_filter', COUNT(*) FROM lm_keep
            UNION ALL SELECT 'exact_dedup', COUNT(*) FROM exact_keep
            UNION ALL SELECT 'span_filter', COUNT(*) FROM span_keep
            UNION ALL SELECT 'near_dup_removal',
              (SELECT COUNT(*) FROM span_keep
               WHERE doc_id NOT IN (SELECT doc_id FROM losers))
        """,
        # Rerun the IVF probe search independently: candidates from
        # the materialized (assignment ∈ probes) filter, exact cosine
        # + top-k with the id tie-break, all in SQL.
        "ann_ivf": f"""
            WITH probes AS (
              SELECT centroid
              FROM read_parquet('{ORACLE_DIR}/sf0.01/ann_probes/*.parquet')
            ), assign AS (
              SELECT vec_id, centroid
              FROM read_parquet('{ORACLE_DIR}/sf0.01/ann_assign/*.parquet')
            ), q AS (
              SELECT embedding::DOUBLE[] AS qv FROM embeddings
              WHERE vec_id = 0
            ), cand AS (
              SELECT e.vec_id, e.embedding::DOUBLE[] AS v
              FROM embeddings e
              JOIN assign a USING (vec_id)
              JOIN probes p ON a.centroid = p.centroid
            )
            SELECT vec_id,
                   round(list_dot_product(v, qv)
                         / (sqrt(list_dot_product(v, v))
                            * sqrt(list_dot_product(qv, qv))), 6) AS cos
            FROM cand, q
            ORDER BY cos DESC, vec_id
            LIMIT 10
        """,
        # Streaming-vs-batch equivalence: the Spark side went through
        # availableNow micro-batches + checkpointed foreachBatch; the
        # oracle re-extracts the same pages in ONE batch pass and
        # re-aggregates in DuckDB.
        # Replay the stateful streaming dedup's winner selection
        # independently: per-url arg_max on warc_ts over the RAW
        # (duplicate-bearing) pages the stream consumed. warc_ts is
        # unique per url by construction, so the (warc_ts, xxhash64)
        # tie-break never fires and max-ts is the full key.
        "stream_dedup_pages": f"""
            WITH w AS (
              SELECT url, MAX(warc_ts) AS ts,
                     ARG_MAX(text, warc_ts) AS text
              FROM read_parquet(
                '{ORACLE_DIR}/sf0.01/stream_raw_pages/*.parquet')
              GROUP BY url
            )
            SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(COUNT(DISTINCT url) AS BIGINT) AS n_urls,
                   CAST(SUM(CAST(epoch(ts) AS BIGINT)) AS BIGINT) AS sum_ts,
                   CAST(SUM(length(text)) AS BIGINT) AS total_len
            FROM w
        """,
        # Rebuild the node-constructor lexical forms in SQL: integer
        # canonical form, fixed-point decimal with trailing-zero trim
        # (keeping one fractional digit), std-alphabet base64 of the
        # first 8 chars, and the percent-escaped file URIs.
        "kg_node_ctors": """
            SELECT doc_id,
                   CAST(doc_id AS VARCHAR) AS int_lex,
                   CASE WHEN s LIKE '%.'
                        THEN s || '0' ELSE s END AS dec_lex,
                   base64(encode(substr(coalesce(text, ''), 1, 8))) AS b64,
                   'file:///data/doc%20' || doc_id || '.nt' AS file_uri,
                   'file://host.example/data/doc%20' || doc_id || '.nt'
                     AS file_uri_host
            FROM (
              SELECT doc_id, text,
                     regexp_replace(printf('%.2f', doc_id * 0.25),
                                    '0+$', '') AS s
              FROM documents
            )
            ORDER BY doc_id
        """,
        "stream_extract_counts": f"""
            SELECT syntax, rec, COUNT(*) AS n
            FROM read_parquet(
              '{ORACLE_DIR}/sf0.01/stream_batch_extract/*.parquet')
            GROUP BY syntax, rec
            ORDER BY syntax NULLS FIRST, rec NULLS FIRST
        """,
        "q_mm_vp8": f"""
            SELECT qi,
                   COUNT(*) AS n_media,
                   CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
                   CAST(SUM(CASE WHEN dec_sum = exp_sum THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_exact,
                   CAST(SUM(dec_sum) AS BIGINT) AS sum_pixels
            FROM read_parquet('{ORACLE_DIR}/sf0.01/mm_vp8/*.parquet')
            GROUP BY qi
            ORDER BY qi
        """,
        "mm_features": f"""
            SELECT COUNT(*) AS n_media,
                   CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
                   CAST(SUM(CAST(round(feature[1]::DOUBLE * 1000000)
                       AS BIGINT)) AS BIGINT) AS f0_millionths
            FROM read_parquet('{ORACLE_DIR}/sf0.01/mm_features/*.parquet')
        """,
        # Rebuild the probe aggregates from DECLARED metadata (columns
        # that never touched the payload bytes): image dims from the
        # table, MP4 dims/tracks from the synthesis formulas, WAV
        # duration from the integer sample math (n = 8*dur//50 samples
        # at 8 kHz → probed ms = n//8).
        # The entire AllPairs pipeline replayed: shingling, global
        # (df, token) canonical order, per-set integer prefix length,
        # size bound, and DuckDB's own list_intersect verify.
        "q_setsim": """
            WITH d AS (
              SELECT CAST(doc_id AS BIGINT) AS id, text FROM documents
              UNION ALL
              SELECT CAST(doc_id AS BIGINT) + 1000000,
                     text || ' mut alpha beta gama'
              FROM documents WHERE doc_id % 7 = 0
            ), tok AS (
              SELECT id, list_filter(string_split(
                       lower(regexp_replace(trim(text), '\\s+', ' ', 'g')),
                       ' '), x -> x <> '') AS arr
              FROM d
            ), grams AS (
              SELECT id, list_distinct(list_transform(
                       range(1, len(arr) - 1),
                       i -> arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2]))
                       AS st
              FROM tok WHERE len(arr) >= 3
            ), tokx AS (
              SELECT id, unnest(st) AS tk FROM grams
            ), freq AS (
              SELECT tk, CAST(COUNT(*) AS BIGINT) AS c
              FROM tokx GROUP BY tk
            ), ordered AS (
              SELECT id, list(tk ORDER BY c, tk) AS arr,
                     CAST(COUNT(*) AS BIGINT) AS n
              FROM tokx JOIN freq USING (tk) GROUP BY id
            ), pref AS (
              SELECT id, n,
                     unnest(list_slice(arr, 1,
                       CAST(n - ((800 * n + 999) // 1000) + 1 AS INT)))
                       AS tk
              FROM ordered
            ), cand AS (
              SELECT a.id AS id_a, b.id AS id_b,
                     MIN(a.n) AS na, MIN(b.n) AS nb
              FROM pref a JOIN pref b
                ON a.tk = b.tk AND a.id < b.id
              WHERE 1000 * LEAST(a.n, b.n) >= 800 * GREATEST(a.n, b.n)
              GROUP BY a.id, b.id
            ), ver AS (
              SELECT id_a, id_b,
                     CAST(len(list_intersect(oa.arr, ob.arr)) AS BIGINT)
                       AS inter,
                     na, nb
              FROM cand
              JOIN ordered oa ON oa.id = cand.id_a
              JOIN ordered ob ON ob.id = cand.id_b
            )
            SELECT id_a, id_b, inter,
                   na + nb - inter AS uni,
                   CAST(floor(CAST(1000 * inter AS DOUBLE)
                        / (na + nb - inter)) AS BIGINT) AS jac_permille
            FROM ver
            WHERE 1000 * inter >= 800 * (na + nb - inter)
            ORDER BY id_a, id_b
        """,
        # Snippet slices rebuilt with list_slice over the same token
        # arrays (inclusive-end vs Spark's start+length — same span).
        "q_snippets": """
            WITH tok AS (
              SELECT doc_id, list_filter(string_split(
                       lower(regexp_replace(trim(text), '\\s+', ' ', 'g')),
                       ' '), x -> x <> '') AS arr
              FROM documents
            ), m AS (
              SELECT doc_id, arr,
                     list_filter(range(1, len(arr)),
                       i -> arr[i] = 'table' AND arr[i+1] = 'hash')
                       AS hits
              FROM tok WHERE len(arr) >= 2
            )
            SELECT doc_id,
                   CAST(hits[1] AS BIGINT) AS first_pos,
                   array_to_string(list_slice(arr,
                     GREATEST(hits[1] - 3, 1), hits[1] + 4), ' ')
                     AS snippet
            FROM m WHERE len(hits) > 0
            ORDER BY doc_id
        """,
        # Token array + start-offset filter replayed with list ops —
        # same 1-based positions, same overlapping-match semantics.
        "q_phrase": """
            WITH tok AS (
              SELECT doc_id, list_filter(string_split(
                       lower(regexp_replace(trim(text), '\\s+', ' ', 'g')),
                       ' '), x -> x <> '') AS arr
              FROM documents
            ), m AS (
              SELECT doc_id,
                     list_filter(range(1, len(arr)),
                       i -> arr[i] = 'table' AND arr[i+1] = 'hash')
                       AS hits
              FROM tok WHERE len(arr) >= 2
            )
            SELECT doc_id,
                   CAST(len(hits) AS BIGINT) AS n_matches,
                   CAST(hits[1] AS BIGINT) AS first_pos
            FROM m WHERE len(hits) > 0
            ORDER BY doc_id
        """,
        # Full replay of the edit-distance join: same generated names,
        # same deletion-neighborhood blocking, DuckDB's OWN levenshtein
        # — an independent implementation of both stages.
        "q_fuzzy_join": """
            WITH base AS (
              SELECT CAST(c_custkey AS BIGINT) AS id,
                     lower(c_mktsegment) || ' ' ||
                       substr(md5(c_name), 1, 12) AS name
              FROM customer
            ), t AS (
              SELECT id + 1000000 AS tid,
                     CAST(id % 8 + 3 AS INT) AS pos, name
              FROM base WHERE id % 5 = 0
            ), twins AS (
              SELECT tid AS id,
                     substr(name, 1, pos - 1) || substr(name, pos + 1)
                       AS name
              FROM t
            ), names AS (
              SELECT * FROM base UNION ALL SELECT * FROM twins
            ), vars AS (
              SELECT id, name,
                     unnest(list_transform(
                       range(0, length(name) + 1),
                       i -> CASE WHEN i = 0 THEN name
                                 ELSE substr(name, 1, CAST(i AS INT) - 1)
                                      || substr(name, CAST(i AS INT) + 1)
                            END)) AS v
              FROM names
            ), pairs AS (
              SELECT a.id AS id_a, b.id AS id_b,
                     MIN(a.name) AS name_a, MIN(b.name) AS name_b
              FROM vars a JOIN vars b ON a.v = b.v AND a.id < b.id
              GROUP BY a.id, b.id
            )
            SELECT id_a, id_b, name_a, name_b,
                   CAST(levenshtein(name_a, name_b) AS INT) AS dist
            FROM pairs
            WHERE levenshtein(name_a, name_b) <= 1
            ORDER BY id_a, id_b
        """,
        # Declared (charset, text) only — n_exact == n asserts the
        # transcoder recovers the generator's character content on
        # every row; the md5 pin binds the actual string values.
        "q_transcode": f"""
            SELECT charset,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(COUNT(text) AS BIGINT) AS n_text,
                   CAST(COUNT(*) AS BIGINT) AS n_exact,
                   CAST(SUM(CAST('0x' || substr(md5(text), 1, 10)
                                 AS BIGINT)) AS BIGINT) AS pin
            FROM read_parquet('{ORACLE_DIR}/sf0.01/sniff_text/*.parquet')
            GROUP BY charset
            ORDER BY charset
        """,
        # Declared ground truth only — the meta parquet carries zero
        # payload bytes, so matching n_exact == n certifies the
        # byte-level sniffer against the generator on every row.
        "q_sniff": f"""
            SELECT mime, charset,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(COUNT(*) AS BIGINT) AS n_exact
            FROM read_parquet('{ORACLE_DIR}/sf0.01/sniff_meta/*.parquet')
            GROUP BY mime, charset
            ORDER BY mime, charset
        """,
        "mm_probe": f"""
            WITH m AS (
              SELECT media_id,
                     CASE mime WHEN 'image/bmp' THEN 'bmp'
                               WHEN 'image/png' THEN 'png'
                               WHEN 'image/gif' THEN 'gif'
                               WHEN 'image/jpeg' THEN 'jpeg'
                               WHEN 'image/webp' THEN 'webp'
                               WHEN 'audio/wav' THEN 'wav'
                               WHEN 'video/mp4' THEN 'mp4' END AS container,
                     CASE WHEN mime LIKE 'image/%' THEN width
                          WHEN mime = 'video/mp4'
                            THEN 320 + (media_id % 8) * 16 END AS pw,
                     CASE WHEN mime LIKE 'image/%' THEN height
                          WHEN mime = 'video/mp4'
                            THEN 240 + (media_id % 8) * 8 END AS ph,
                     CASE WHEN mime = 'video/mp4' THEN duration_ms
                          WHEN mime = 'audio/wav'
                            THEN ((8 * duration_ms) // 50) // 8
                          END AS pdur,
                     CASE WHEN mime = 'video/mp4'
                            THEN 1 + CASE WHEN media_id % 8 = 0
                                          THEN 0 ELSE 1 END
                          ELSE 1 END AS ptracks
              FROM read_parquet(
                '{ORACLE_DIR}/sf0.01/mm_media_meta/*.parquet')
            )
            SELECT container,
                   CAST(COUNT(*) AS BIGINT) AS n_media,
                   CAST(SUM(pw) AS BIGINT) AS sum_w,
                   CAST(SUM(ph) AS BIGINT) AS sum_h,
                   CAST(SUM(pdur) AS BIGINT) AS sum_dur,
                   CAST(SUM(ptracks) AS BIGINT) AS sum_tracks
            FROM m GROUP BY container ORDER BY container
        """,
        # Rebuild the video sample layout from DECLARED metadata only:
        # 10 fps (100 ms deltas), size_k = 500 + ((id*7 + k*13) % 200),
        # contiguous offsets from 4096 — the generator's ground truth,
        # recomputed without reading a single payload byte. The Spark
        # side recovers the same numbers from stts/stsz/stsc/stco.
        "mm_frames": f"""
            WITH v AS (
              SELECT media_id AS id, duration_ms // 100 AS n
              FROM read_parquet(
                '{ORACLE_DIR}/sf0.01/mm_media_meta/*.parquet')
              WHERE kind = 'video'
            ), frames AS (
              SELECT id, unnest(generate_series(0, n - 1)) AS k FROM v
            ), sized AS (
              SELECT id, k,
                     500 + ((id * 7 + k * 13) % 200) AS sz
              FROM frames
            ), offs AS (
              SELECT id, k, sz,
                     4096 + CAST(COALESCE(SUM(sz) OVER (
                       PARTITION BY id ORDER BY k
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), 0) AS BIGINT) AS off
              FROM sized
            ), sampled AS (
              SELECT id,
                     unnest(generate_series(0, (n - 1) * 100, 1000))
                       // 100 AS k
              FROM v
            )
            SELECT s.id AS media_id,
                   CAST(COUNT(*) AS BIGINT) AS n_sampled,
                   CAST(MAX(s.k) AS BIGINT) AS max_frame,
                   CAST(SUM(o.sz) AS BIGINT) AS sum_bytes,
                   CAST(MAX(o.off + o.sz) AS BIGINT) AS max_end_off
            FROM sampled s
            JOIN offs o ON o.id = s.id AND o.k = s.k
            GROUP BY s.id
        """,
        # Frame DECODE: structure (how many instants sample which
        # frame at what dimensions) recomputed from the generator
        # formulas alone — 4+id%5 frames at 200 ms deltas sampled
        # every 300 ms, dims 16+(id%3)*8 × 16+(id%2)*8 — while the
        # luminance sums re-aggregate the materialized per-frame rows
        # (pixel truth has no SQL formula; determinism is the claim).
        "mm_frame_decode": f"""
            WITH f AS (
              SELECT media_id,
                     CAST(SUM(lum_mean_u) AS BIGINT) AS sum_lum_mean_u,
                     CAST(SUM(lum_std_u) AS BIGINT) AS sum_lum_std_u
              FROM read_parquet(
                '{ORACLE_DIR}/sf0.01/mm_frame_decode/*.parquet')
              GROUP BY media_id
            ), m AS (
              SELECT media_id, 4 + media_id % 5 AS n_f FROM f
            )
            SELECT m.media_id,
                   CAST((200 * (n_f - 1)) // 300 + 1 AS BIGINT)
                     AS n_sampled,
                   CAST((300 * ((200 * (n_f - 1)) // 300)) // 200
                     AS BIGINT) AS max_frame,
                   CAST(16 + (m.media_id % 3) * 8 AS BIGINT) AS fw,
                   CAST(16 + (m.media_id % 2) * 8 AS BIGINT) AS fh,
                   f.sum_lum_mean_u, f.sum_lum_std_u
            FROM m JOIN f USING (media_id)
        """,
        # Round-trip INVARIANT oracles: the writer→parser fixpoint must
        # hold for EVERY statement/document, so the expected counts are
        # exactly the triple-table counts DuckDB derives independently —
        # one lost or mutated statement breaks the hash compare.
        "kg_roundtrip": f"""
            SELECT COUNT(*) AS n_lines, COUNT(*) AS n_roundtrip
            FROM read_parquet('{ORACLE_DIR}/sf0.01/triples/*.parquet')
        """,
        "kg_turtle": f"""
            SELECT COUNT(DISTINCT url) AS n_docs,
                   COUNT(DISTINCT url) AS n_roundtrip
            FROM read_parquet('{ORACLE_DIR}/sf0.01/triples/*.parquet')
        """,
        # Independent connected-components over the materialized
        # verified-link edges: reachability closure via recursive CTE,
        # canon = min reachable node — must equal Spark's union-find /
        # pointer-jumping label propagation exactly.
        "kg_linking": f"""
            WITH RECURSIVE l AS (
              SELECT entity_a, entity_b
              FROM read_parquet('{ORACLE_DIR}/sf0.01/links/*.parquet')
            ), edges AS (
              SELECT entity_a AS a, entity_b AS b FROM l
              UNION
              SELECT entity_b AS a, entity_a AS b FROM l
            ), reach(entity, r) AS (
              SELECT DISTINCT a, a FROM edges
              UNION
              SELECT e.a, reach.r FROM edges e
              JOIN reach ON reach.entity = e.b
            ), labels AS (
              SELECT entity, MIN(r) AS canon FROM reach GROUP BY entity
            )
            SELECT canon, COUNT(*) AS n_members
            FROM labels GROUP BY canon
            HAVING COUNT(*) > 1
            ORDER BY n_members DESC, canon
            LIMIT 50
        """,
        # Same closure, over the edge list the distributed-CC run
        # materialized — certifies linking.py's pointer-jumping path.
        "kg_linking_dist": f"""
            WITH RECURSIVE l AS (
              SELECT entity_a, entity_b
              FROM read_parquet('{ORACLE_DIR}/sf0.01/links_dist/*.parquet')
            ), edges AS (
              SELECT entity_a AS a, entity_b AS b FROM l
              UNION
              SELECT entity_b AS a, entity_a AS b FROM l
            ), reach(entity, r) AS (
              SELECT DISTINCT a, a FROM edges
              UNION
              SELECT e.a, reach.r FROM edges e
              JOIN reach ON reach.entity = e.b
            ), labels AS (
              SELECT entity, MIN(r) AS canon FROM reach GROUP BY entity
            )
            SELECT canon, COUNT(*) AS n_members
            FROM labels GROUP BY canon
            HAVING COUNT(*) > 1
            ORDER BY n_members DESC, canon
            LIMIT 50
        """,
        "kg_hub_salting": f"""
            SELECT (salt > 0) AS is_salted, COUNT(*) AS n_rows,
                   COUNT(DISTINCT salt) AS n_salts,
                   COUNT(DISTINCT subj_bucket) AS n_buckets
            FROM read_parquet('{ORACLE_DIR}/sf0.01/bucketed/*.parquet')
            GROUP BY 1 ORDER BY 1
        """,
        # Replay the full MinHash+LSH candidate pipeline from the
        # materialized signatures/band hashes: bucket-cap pruning
        # (max_bucket=1024), band equi-join, exact signature-agreement
        # Jaccard estimate, threshold 0.5 — all independently in SQL.
        "dedup_minhash_lsh": f"""
            WITH bands AS (
              SELECT entity, band, band_hash
              FROM read_parquet('{ORACLE_DIR}/sf0.01/minhash/bands/*.parquet')
            ), sigs AS (
              SELECT entity, sig
              FROM read_parquet('{ORACLE_DIR}/sf0.01/minhash/sigs/*.parquet')
            ), counts AS (
              SELECT band, band_hash, COUNT(*) AS m
              FROM bands GROUP BY band, band_hash
            ), pruned AS (
              SELECT b.entity, b.band, b.band_hash
              FROM bands b JOIN counts c USING (band, band_hash)
              WHERE c.m <= 1024
            ), pairs AS (
              SELECT DISTINCT a.entity AS entity_a, b.entity AS entity_b
              FROM pruned a JOIN pruned b USING (band, band_hash)
              WHERE a.entity < b.entity
            )
            SELECT p.entity_a, p.entity_b,
                   len(list_filter(list_zip(sa.sig, sb.sig),
                                   x -> x[1] = x[2])) / 64.0 AS jaccard_est
            FROM pairs p
            JOIN sigs sa ON sa.entity = p.entity_a
            JOIN sigs sb ON sb.entity = p.entity_b
            WHERE len(list_filter(list_zip(sa.sig, sb.sig),
                                  x -> x[1] = x[2])) / 64.0 >= 0.5
            ORDER BY entity_a, entity_b
        """,
        # Token entropy: (doc, token) counts, per-term micro rounding,
        # integer-div floor — all from raw text.
        "q_entropy": """
            WITH w AS (
              SELECT doc_id, unnest(list_filter(string_split(
                       lower(regexp_replace(trim(text), '\\s+', ' ', 'g')),
                       ' '), x -> x <> '')) AS w
              FROM documents
            ), counts AS (
              SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS c
              FROM w GROUP BY doc_id, w
            ), totals AS (
              SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_toks,
                     CAST(COUNT(*) AS BIGINT) AS n_types
              FROM counts GROUP BY doc_id
            ), terms AS (
              SELECT c.doc_id, t.n_toks, t.n_types,
                     CAST(round(CAST(c.c AS DOUBLE)
                                * ln(CAST(t.n_toks AS DOUBLE)
                                     / CAST(c.c AS DOUBLE))
                                * 1000000) AS BIGINT) AS term
              FROM counts c JOIN totals t USING (doc_id)
            )
            SELECT doc_id, n_toks, n_types,
                   CAST(CAST(SUM(term) AS BIGINT) // n_toks AS BIGINT)
                     AS entropy_micros
            FROM terms GROUP BY doc_id, n_toks, n_types
        """,
        # Blocklist filter: gazetteer-style matching + token counts +
        # the integer div density and flag, all replayed.
        "q_blocklist": f"""
            WITH tok AS (
              SELECT doc_id,
                     list_filter(string_split(
                       lower(regexp_replace(trim(text), '\\s+', ' ', 'g')),
                       ' '), x -> x <> '') AS arr
              FROM documents
            ), n AS (
              SELECT doc_id, CAST(len(arr) AS BIGINT) AS n_toks
              FROM tok WHERE len(arr) >= 1
            ), uni AS (
              SELECT doc_id, unnest(arr) AS g FROM tok
            ), bi AS (
              SELECT doc_id, arr[i.x] || ' ' || arr[i.x + 1] AS g
              FROM tok, LATERAL (
                SELECT unnest(range(1, len(arr))) AS x) i
            ), cand AS (
              SELECT doc_id, g FROM uni
              UNION ALL SELECT doc_id, g FROM bi
            ), dict(entity) AS (
              VALUES {", ".join("('" + e + "')" for e in _BLOCKLIST)}
            ), hits AS (
              SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
              FROM cand c JOIN dict d ON c.g = d.entity
              GROUP BY c.doc_id
            )
            SELECT n.doc_id, n.n_toks,
                   CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
                   CAST((COALESCE(h.n_hits, 0) * 1000000) // n.n_toks
                        AS BIGINT) AS hits_ppm,
                   CAST(CASE WHEN (COALESCE(h.n_hits, 0) * 1000000)
                                  // n.n_toks > 60000
                             THEN 1 ELSE 0 END AS INT) AS dropped
            FROM n LEFT JOIN hits h USING (doc_id)
        """,
        # Rare-token masking: keep-vocab, positional re-mask, and the
        # order-pinned string_agg md5 all rebuilt from raw text.
        "q_rare_mask": """
            WITH tok AS (
              SELECT doc_id,
                     list_filter(string_split(
                       lower(regexp_replace(trim(text), '\\s+', ' ', 'g')),
                       ' '), x -> x <> '') AS arr
              FROM documents
            ), pos AS (
              SELECT doc_id, i.x - 1 AS pos, arr[i.x] AS w
              FROM tok, LATERAL (
                SELECT unnest(range(1, len(arr) + 1)) AS x) i
            ), keep AS (
              SELECT w FROM pos GROUP BY w HAVING COUNT(*) >= 30
            ), m AS (
              SELECT p.doc_id, p.pos,
                     CASE WHEN k.w IS NOT NULL THEN p.w
                          ELSE '<unk>' END AS mw,
                     CASE WHEN k.w IS NULL THEN 1 ELSE 0 END AS is_m
              FROM pos p LEFT JOIN keep k ON p.w = k.w
            )
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_toks,
                   CAST(SUM(is_m) AS BIGINT) AS n_masked,
                   md5(string_agg(mw, ' ' ORDER BY pos)) AS masked_md5
            FROM m GROUP BY doc_id
        """,
        # Crawl stats: per-url fetch log collapsed, host re-derived
        # with the shared pattern, both aggregate levels replayed;
        # timestamps compared as integer epoch seconds.
        "q_crawl": f"""
            WITH per_url AS (
              SELECT url,
                     CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(MIN(epoch(warc_ts)) AS BIGINT) AS t0,
                     CAST(MAX(epoch(warc_ts)) AS BIGINT) AS t1
              FROM read_parquet('{ORACLE_DIR}/sf0.01/pages_crawl/*.parquet')
              GROUP BY url
            )
            SELECT lower(regexp_extract(url,
                     '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)', 1)) AS host,
                   CAST(COUNT(*) AS BIGINT) AS n_urls,
                   CAST(SUM(n) AS BIGINT) AS n_fetches,
                   CAST(SUM(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_refetched,
                   CAST(SUM(t1 - t0) AS BIGINT) AS sum_gap_sec
            FROM per_url GROUP BY host
        """,
        # Pair mining: the dedup_minhash_lsh replay with a lower
        # verify floor and the pos/hard_neg label CASE.
        "q_pair_mining": f"""
            WITH bands AS (
              SELECT entity, band, band_hash
              FROM read_parquet('{ORACLE_DIR}/sf0.01/minhash/bands/*.parquet')
            ), sigs AS (
              SELECT entity, sig
              FROM read_parquet('{ORACLE_DIR}/sf0.01/minhash/sigs/*.parquet')
            ), counts AS (
              SELECT band, band_hash, COUNT(*) AS m
              FROM bands GROUP BY band, band_hash
            ), pruned AS (
              SELECT b.entity, b.band, b.band_hash
              FROM bands b JOIN counts c USING (band, band_hash)
              WHERE c.m <= 1024
            ), pairs AS (
              SELECT DISTINCT a.entity AS entity_a, b.entity AS entity_b
              FROM pruned a JOIN pruned b USING (band, band_hash)
              WHERE a.entity < b.entity
            ), est AS (
              SELECT p.entity_a, p.entity_b,
                     len(list_filter(list_zip(sa.sig, sb.sig),
                                     x -> x[1] = x[2])) / 64.0 AS j
              FROM pairs p
              JOIN sigs sa ON sa.entity = p.entity_a
              JOIN sigs sb ON sb.entity = p.entity_b
            )
            SELECT CAST(entity_a AS BIGINT) AS id_a,
                   CAST(entity_b AS BIGINT) AS id_b,
                   j AS jaccard_est,
                   CASE WHEN j >= 0.5 THEN 'pos'
                        ELSE 'hard_neg' END AS label
            FROM est WHERE j >= 0.25
        """,
        # Heavy hitters: the oracle is the NAIVE exact aggregate the
        # sketch-filtered two-pass plan must equal (no false negatives
        # by est >= exact; false positives removed by the exact pass).
        "q_heavy_hitters": """
            WITH w AS (
              SELECT unnest(string_split(
                lower(regexp_replace(trim(text), '\\s+', ' ', 'g')),
                ' ')) AS w
              FROM documents
            )
            SELECT w, CAST(COUNT(*) AS BIGINT) AS n
            FROM w WHERE w <> ''
            GROUP BY w HAVING COUNT(*) >= 500
            ORDER BY n DESC, w ASC
        """,
        # Audio energy: every PCM sample regenerated from the integer
        # sawtooth formula with generate_series, then re-windowed —
        # the Spark side got them through real WAV bytes.
        "q_mm_audio": f"""
            WITH m AS (
              SELECT i AS media_id, 400 + (i * 37) % 800 AS n,
                     1 + i % 7 AS step, i % 100 AS phase
              FROM (SELECT unnest(generate_series(
                     0, {max(16, _n_pages("sf0.01") // 64) - 1})) AS i)
            ), s AS (
              SELECT media_id, jj.j,
                     ((phase + jj.j * step) * 97) % 24001 - 12000 AS v
              FROM m, LATERAL (
                SELECT unnest(generate_series(0, n - 1)) AS j) jj
            )
            SELECT media_id, CAST(j // 100 AS BIGINT) AS win,
                   CAST(COUNT(*) AS BIGINT) AS n_samples,
                   CAST(SUM(v * v) AS BIGINT) AS energy
            FROM s GROUP BY media_id, (j // 100)
        """,
        # Image dHash groups: pivot + xor/bit_count replayed from the
        # materialized per-image hashes (the hash layer is certified
        # by unit tests + the cross-format lossless_match itself).
        "q_mm_dhash": f"""
            WITH d AS (
              SELECT media_id, dhash
              FROM read_parquet('{ORACLE_DIR}/sf0.01/mm_dhash/*.parquet')
            ), g AS (
              SELECT media_id // 4 AS group_id, media_id % 4 AS v, dhash
              FROM d
            ), p AS (
              SELECT group_id,
                     MAX(CASE WHEN v = 0 THEN dhash END) AS h0,
                     MAX(CASE WHEN v = 1 THEN dhash END) AS h1,
                     MAX(CASE WHEN v = 2 THEN dhash END) AS h2,
                     MAX(CASE WHEN v = 3 THEN dhash END) AS h3
              FROM g GROUP BY group_id
            )
            SELECT group_id,
                   CAST(CASE WHEN h0 = h1 THEN 1 ELSE 0 END AS INT)
                     AS lossless_match,
                   CAST(bit_count(xor(h0, h2)) AS BIGINT) AS jpeg_hamming,
                   CAST(bit_count(xor(h0, h3)) AS BIGINT)
                     AS control_hamming
            FROM p
        """,
        # Dup clusters: LSH pair replay (as dedup_minhash_lsh) closed
        # by the recursive reachability CTE, min-STRING canon (the
        # linking contract), singleton rejoin, sizes and flags.
        "q_dup_clusters": f"""
            WITH RECURSIVE bands AS (
              SELECT entity, band, band_hash
              FROM read_parquet('{ORACLE_DIR}/sf0.01/minhash/bands/*.parquet')
            ), sigs AS (
              SELECT entity, sig
              FROM read_parquet('{ORACLE_DIR}/sf0.01/minhash/sigs/*.parquet')
            ), counts AS (
              SELECT band, band_hash, COUNT(*) AS m
              FROM bands GROUP BY band, band_hash
            ), pruned AS (
              SELECT b.entity, b.band, b.band_hash
              FROM bands b JOIN counts c USING (band, band_hash)
              WHERE c.m <= 1024
            ), vp AS (
              SELECT DISTINCT a.entity AS entity_a, b.entity AS entity_b
              FROM pruned a JOIN pruned b USING (band, band_hash)
              WHERE a.entity < b.entity
            ), verified AS (
              SELECT p.entity_a, p.entity_b
              FROM vp p
              JOIN sigs sa ON sa.entity = p.entity_a
              JOIN sigs sb ON sb.entity = p.entity_b
              WHERE len(list_filter(list_zip(sa.sig, sb.sig),
                                    x -> x[1] = x[2])) / 64.0 >= 0.5
            ), edges AS (
              SELECT entity_a AS a, entity_b AS b FROM verified
              UNION
              SELECT entity_b AS a, entity_a AS b FROM verified
            ), reach(entity, r) AS (
              SELECT DISTINCT a, a FROM edges
              UNION
              SELECT e.a, reach.r FROM edges e
              JOIN reach ON reach.entity = e.b
            ), labels AS (
              SELECT entity, MIN(r) AS canon FROM reach GROUP BY entity
            ), asg AS (
              SELECT d.doc_id,
                     CAST(COALESCE(l.canon, CAST(d.doc_id AS VARCHAR))
                          AS BIGINT) AS canon_id
              FROM documents d
              LEFT JOIN labels l ON l.entity = CAST(d.doc_id AS VARCHAR)
            ), sizes AS (
              SELECT canon_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
              FROM asg GROUP BY canon_id
            )
            SELECT a.doc_id, a.canon_id, s.cluster_size,
                   CAST(CASE WHEN a.doc_id = a.canon_id THEN 1 ELSE 0 END
                        AS INT) AS is_canonical
            FROM asg a JOIN sizes s USING (canon_id)
        """,
        "q_domain_cap": """
            SELECT doc_id, source, n_chars, CAST(rank AS INTEGER) AS rank
            FROM (
              SELECT doc_id, source, n_chars,
                     row_number() OVER (
                       PARTITION BY source
                       ORDER BY n_chars DESC, doc_id ASC) AS rank
              FROM documents
            ) WHERE rank <= 10
        """,
        # Line-level boilerplate removal replay: re-split the
        # materialized (url, text) by chr(10), count (host, RAW line)
        # document frequencies (Spark keys on xxhash64 — identical
        # absent collisions, absent at oracle scale), rebuild each
        # cleaned document with an ordered string_agg. COALESCE('')
        # matches Spark's md5 of the empty join when nothing survives.
        "q_line_dedup": f"""
            WITH pt AS (
              SELECT url,
                     lower(regexp_extract(url,
                       '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)', 1)) AS host,
                     string_split(text, chr(10)) AS ls
              FROM read_parquet('{ORACLE_DIR}/sf0.01/pages_text/*.parquet')
            ), lines AS (
              SELECT url, host, i - 1 AS pos, ls[i] AS line
              FROM (SELECT url, host, ls,
                           unnest(generate_series(1, len(ls))) AS i
                    FROM pt)
            ), hot AS (
              SELECT host, line FROM lines
              GROUP BY host, line HAVING COUNT(DISTINCT url) > 2
            ), flagged AS (
              SELECT l.url, l.pos, l.line,
                     (h.line IS NOT NULL) AS is_hot
              FROM lines l LEFT JOIN hot h
                ON h.host = l.host AND h.line = l.line
            )
            SELECT url, CAST(COUNT(*) AS BIGINT) AS n_lines,
                   CAST(SUM(CASE WHEN is_hot THEN 0 ELSE 1 END) AS BIGINT)
                     AS n_kept,
                   md5(COALESCE(string_agg(
                     CASE WHEN is_hot THEN NULL ELSE line END,
                     chr(10) ORDER BY pos), '')) AS kept_md5
            FROM flagged GROUP BY url
        """,
        # Cross-snapshot incremental dedup: the exact stage is replayed
        # from raw text (md5 fingerprints); the near stage from the
        # materialized signatures/bands — hot-bucket prune (counted
        # AFTER removing exact-dup new docs, as the operator never
        # signs them), NEW x OLD band join, agreement verify, and the
        # (jaccard DESC, old id ASC) best-match window. agree/64 is a
        # power-of-two fraction: exact in double on both engines.
        "q_dedup_incremental": f"""
            WITH newd AS (
              SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
              UNION ALL
              SELECT doc_id + 100000 AS doc_id, text FROM documents
              WHERE doc_id % 3 <> 0 AND doc_id % 17 = 1
            ), oldd AS (
              SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0
            ), fp_new AS (
              SELECT doc_id,
                     md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))
                       AS fp
              FROM newd
            ), fp_old AS (
              SELECT md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))
                       AS fp,
                     MIN(doc_id) AS exact_id
              FROM oldd GROUP BY 1
            ), exact AS (
              SELECT n.doc_id, o.exact_id FROM fp_new n JOIN fp_old o USING (fp)
            ), bn0 AS (
              SELECT b.entity, b.band, b.band_hash
              FROM read_parquet('{ORACLE_DIR}/sf0.01/inc/bands_new/*.parquet') b
              WHERE CAST(b.entity AS BIGINT) NOT IN (SELECT doc_id FROM exact)
            ), bo0 AS (
              SELECT entity, band, band_hash
              FROM read_parquet('{ORACLE_DIR}/sf0.01/inc/bands_old/*.parquet')
            ), bn AS (
              SELECT b.* FROM bn0 b JOIN (
                SELECT band, band_hash FROM bn0 GROUP BY 1, 2
                HAVING COUNT(*) <= 1024
              ) k USING (band, band_hash)
            ), bo AS (
              SELECT b.* FROM bo0 b JOIN (
                SELECT band, band_hash FROM bo0 GROUP BY 1, 2
                HAVING COUNT(*) <= 1024
              ) k USING (band, band_hash)
            ), cand AS (
              SELECT DISTINCT n.entity, o.entity AS entity_old
              FROM bn n JOIN bo o USING (band, band_hash)
            ), near0 AS (
              SELECT CAST(c.entity AS BIGINT) AS doc_id,
                     CAST(c.entity_old AS BIGINT) AS oid,
                     len(list_filter(list_zip(a.sig, b.sig),
                                     x -> x[1] = x[2])) / 64.0 AS j
              FROM cand c
              JOIN read_parquet('{ORACLE_DIR}/sf0.01/inc/sigs_new/*.parquet') a
                ON a.entity = c.entity
              JOIN read_parquet('{ORACLE_DIR}/sf0.01/inc/sigs_old/*.parquet') b
                ON b.entity = c.entity_old
            ), near AS (
              SELECT doc_id, oid, j FROM (
                SELECT *, row_number() OVER (
                  PARTITION BY doc_id ORDER BY j DESC, oid ASC) AS rn
                FROM near0 WHERE j >= 0.5
              ) WHERE rn = 1
            )
            SELECT n.doc_id,
                   CASE WHEN e.exact_id IS NOT NULL THEN 'exact'
                        WHEN nr.oid IS NOT NULL THEN 'near'
                        ELSE 'kept' END AS status,
                   COALESCE(e.exact_id, nr.oid) AS match_id,
                   CASE WHEN e.exact_id IS NULL THEN nr.j END AS jaccard_est
            FROM newd n
            LEFT JOIN exact e ON e.doc_id = n.doc_id
            LEFT JOIN near nr ON nr.doc_id = n.doc_id
        """,
        # Replay the hyperplane-LSH bucket join + exact cosine over the
        # materialized bucket assignment (planes are seed-deterministic,
        # so the Spark recompute must land in the same buckets).
        "dedup_embedding": f"""
            WITH bk AS (
              SELECT vec_id, bucket
              FROM read_parquet('{ORACLE_DIR}/sf0.01/emb_buckets/*.parquet')
            ), e AS (
              SELECT em.vec_id, bk.bucket, em.embedding::DOUBLE[] AS v
              FROM embeddings em JOIN bk USING (vec_id)
            )
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(
                     list_dot_product(a.v, b.v)
                     / (sqrt(list_dot_product(a.v, a.v))
                        * sqrt(list_dot_product(b.v, b.v))), 6) AS cos
            FROM e a JOIN e b ON a.bucket = b.bucket
                             AND a.vec_id < b.vec_id
            WHERE round(
                    list_dot_product(a.v, b.v)
                    / (sqrt(list_dot_product(a.v, a.v))
                       * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.4
            ORDER BY id_a, id_b
        """,
        # Brute-force all-pairs Hamming over the materialized SimHash
        # signatures: independently certifies that the Spark chunk-LSH
        # join recovers EVERY Hamming-<=3 pair (recall guarantee).
        "dedup_simhash": f"""
            WITH s AS (
              SELECT doc_id, simhash
              FROM read_parquet('{ORACLE_DIR}/sf0.01/simhash_sigs/*.parquet')
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER)
                     AS hamming
            FROM s a JOIN s b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
            ORDER BY id_a, id_b
        """,
        "q_filter_project": """
            SELECT l_orderkey, l_linenumber,
                   CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
                     AS gross_cents
            FROM lineitem
            WHERE l_quantity > 45 AND l_shipdate >= TIMESTAMP '1995-01-01'
        """,
        "q_agg_pricing": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                   CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                     AS sum_base_cents,
                   CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
                     AS BIGINT) AS sum_disc_cents,
                   COUNT(*) AS count_order
            FROM lineitem
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "q_join_agg": """
            SELECT c_mktsegment,
                   COUNT(*) AS n_orders,
                   CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                     AS revenue_cents
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment ORDER BY c_mktsegment
        """,
        "q_multi_join": """
            SELECT r_name, n_name,
                   CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                     AS BIGINT)) AS BIGINT) AS revenue_cents
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation   ON c_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            GROUP BY r_name, n_name ORDER BY r_name, n_name
        """,
        "q_window_toporder": """
            SELECT o_custkey, o_orderkey,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS top_cents
            FROM (
              SELECT *, row_number() OVER (
                PARTITION BY o_custkey
                ORDER BY o_totalprice DESC, o_orderkey
              ) AS rn FROM orders
            ) WHERE rn = 1
        """,
        "q_topk_orders": """
            SELECT o_orderkey,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
            FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
        """,
        "q_set_ops": """
            SELECT 'no_orders' AS tag, c_custkey FROM (
              SELECT c_custkey FROM customer
              EXCEPT SELECT o_custkey AS c_custkey FROM orders
            )
            UNION ALL
            SELECT 'has_orders' AS tag, c_custkey FROM (
              SELECT c_custkey FROM customer
              INTERSECT SELECT o_custkey AS c_custkey FROM orders
            )
        """,
        "q_rollup": """
            SELECT o_orderpriority, o_orderstatus,
                   COUNT(*) AS n_orders,
                   CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                     AS sum_cents
            FROM orders
            GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
            ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST
        """,
        "q_events_hourly": """
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
                     AS hour_start,
                   event_type,
                   COUNT(*) AS n_events,
                   CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                     AS value_cents
            FROM events
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "q_events_latest": """
            SELECT user_id, event_id,
                   strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str
            FROM (
              SELECT *, row_number() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC
              ) AS rn FROM events
            ) WHERE rn = 1
        """,
        "q_sessionize": """
            SELECT user_id,
                   CAST(SUM(CASE WHEN prev_us IS NULL
                             OR epoch_us(ts) - prev_us > 1800 * 1000000
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
                   COUNT(*) AS n_events
            FROM (
              SELECT user_id, ts,
                     lag(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts
                     ) AS prev_us
              FROM events
            )
            GROUP BY user_id ORDER BY user_id
        """,
        "q_dedup_exact": """
            SELECT md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp,
                   MIN(doc_id) AS rep_id,
                   COUNT(*) AS n_dups
            FROM documents GROUP BY 1 ORDER BY 1
        """,
        "q_token_stats": """
            SELECT doc_id,
                   CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                   END AS n_tokens,
                   len(regexp_extract_all(text,
                       '[A-Za-z]+|[0-9]+|[^\\sA-Za-z0-9]')) AS n_pieces,
                   length(trim(text)) AS n_chars_trim
            FROM documents
        """,
        "q_lang_id": f"""
            SELECT doc_id, {_lang_case_sql()} AS lang_pred FROM documents
        """,
        "q_quality": """
            SELECT doc_id,
                   length(text) AS q_chars,
                   CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                   END AS q_tokens,
                   round(
                     (length(text) - length(regexp_replace(text,
                         '[^\\s\\p{L}\\p{N}]', '', 'g')))
                     / greatest(length(text), 1)::DOUBLE, 6) AS q_punct_ratio,
                   round(
                     len(regexp_extract_all(text, '(?i)\\b(the|and|of|to|is)\\b'))
                     / greatest(CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                        END, 1)::DOUBLE, 6) AS q_stopword_ratio,
                   round(
                     length(regexp_replace(text, '\\s+', '', 'g'))
                     / greatest(CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                        END, 1)::DOUBLE, 6) AS q_mean_word_len
            FROM documents
        """,
        "q_fingerprint": """
            SELECT doc_id,
                   md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))
                     AS fp_md5
            FROM documents
        """,
        "q_repetition": """
            WITH base AS (
              SELECT doc_id,
                     CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                     END AS n,
                     regexp_split_to_array(trim(text), '\\s+') AS t,
                     string_split(text, chr(10)) AS lines
              FROM documents
            ), g AS (
              SELECT doc_id, n, t, lines,
                     CASE WHEN n >= 2 THEN list_transform(range(1, n),
                         i -> t[i] || ' ' || t[i+1]) ELSE [] END AS g2,
                     CASE WHEN n >= 3 THEN list_transform(range(1, n - 1),
                         i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                        ELSE [] END AS g3
              FROM base
            ), top2 AS (
              -- most-frequent-2-gram multiplicity, replayed the
              -- relational way (unnest + group) rather than Spark's
              -- sorted-array fold — independent formulation, same value
              SELECT doc_id, max(c) AS mx FROM (
                SELECT doc_id, gram, count(*) AS c
                FROM (SELECT doc_id, unnest(g2) AS gram FROM g)
                GROUP BY 1, 2
              ) GROUP BY 1
            )
            SELECT g.doc_id,
                   CAST(n AS BIGINT) AS r_tokens,
                   CASE WHEN n = 0 THEN 0.0
                        ELSE round(len(list_distinct(t)) / n::DOUBLE, 6)
                   END AS r_ttr,
                   round(coalesce(top2.mx, 0)
                         / greatest(len(g2), 1)::DOUBLE, 6) AS r_top2gram_frac,
                   round((len(g3) - len(list_distinct(g3)))
                         / greatest(len(g3), 1)::DOUBLE, 6) AS r_dup3gram_frac,
                   round((len(lines) - len(list_distinct(lines)))
                         / greatest(len(lines), 1)::DOUBLE, 6) AS r_dup_line_frac
            FROM g LEFT JOIN top2 ON top2.doc_id = g.doc_id
        """,
        "q_pii": """
            WITH aug AS (
              SELECT doc_id,
                     text || ' contact user' || CAST(doc_id AS VARCHAR)
                          || '@mail.example.com or 415-555-'
                          || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                          || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                          || '.7' AS t
              FROM documents
            )
            SELECT doc_id,
                   CAST(len(regexp_extract_all(t,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
                     AS BIGINT) AS pii_email,
                   CAST(len(regexp_extract_all(t,
                     '\\b\\d{3}-\\d{3}-\\d{4}\\b')) AS BIGINT) AS pii_phone,
                   CAST(len(regexp_extract_all(t,
                     '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b'))
                     AS BIGINT) AS pii_ipv4,
                   CAST(length(regexp_replace(regexp_replace(regexp_replace(t,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                     '<EMAIL>', 'g'),
                     '\\b\\d{3}-\\d{3}-\\d{4}\\b', '<PHONE>', 'g'),
                     '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b',
                     '<IP>', 'g')) AS BIGINT) AS redacted_len
            FROM aug
        """,
        "q_ngram_jaccard": grams_cte + """
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   round(len(list_intersect(a.gr, b.gr))
                         / len(list_distinct(list_concat(a.gr, b.gr)))::DOUBLE,
                         6) AS jaccard
            FROM grams a JOIN grams b ON b.doc_id = a.doc_id + 1
            ORDER BY a.doc_id
        """,
        "q_minhash_md5": """
            WITH norm AS (
              SELECT doc_id,
                     lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t
              FROM documents
            ), expanded AS (
              SELECT doc_id, t, unnest(generate_series(1, length(t) - 2)) AS i
              FROM norm WHERE length(t) >= 3
            ), grams AS (
              SELECT doc_id, substring(t, i::INT, 3) AS gram FROM expanded
              UNION ALL
              -- mirror Spark char_ngrams' short-text case (whole string)
              SELECT doc_id, t AS gram FROM norm WHERE length(t) < 3
            )
            SELECT doc_id,
                   MIN(md5(gram || '0')) AS h0,
                   MIN(md5(gram || '1')) AS h1,
                   MIN(md5(gram || '2')) AS h2,
                   MIN(md5(gram || '3')) AS h3
            FROM grams GROUP BY doc_id ORDER BY doc_id
        """,
        "q_cosine_topk": """
            WITH q AS (
              SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0
            )
            SELECT e.vec_id,
                   round(
                     list_dot_product(e.embedding::DOUBLE[], q.qv)
                     / (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                              e.embedding::DOUBLE[]))
                        * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos
            FROM embeddings e, q
            ORDER BY cos DESC, e.vec_id LIMIT 10
        """,
        "q_embedding_dups": """
            WITH e AS (
              SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
            )
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(
                     list_dot_product(a.v, b.v)
                     / (sqrt(list_dot_product(a.v, a.v))
                        * sqrt(list_dot_product(b.v, b.v))), 6) AS cos
            FROM e a, e b
            WHERE a.vec_id < b.vec_id
              AND round(
                    list_dot_product(a.v, b.v)
                    / (sqrt(list_dot_product(a.v, a.v))
                       * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.45
        """,
        "q_knn_join": """
            WITH qs AS (
              SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv
              FROM embeddings WHERE vec_id < 5
            ), scored AS (
              SELECT qs.q_id, e.vec_id AS n_id,
                     round(
                       list_dot_product(e.embedding::DOUBLE[], qs.qv)
                       / (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                                e.embedding::DOUBLE[]))
                          * sqrt(list_dot_product(qs.qv, qs.qv))), 6) AS cos
              FROM qs, embeddings e WHERE e.vec_id != qs.q_id
            )
            SELECT q_id, n_id, cos FROM (
              SELECT *, row_number() OVER (
                PARTITION BY q_id ORDER BY cos DESC, n_id
              ) AS rn FROM scored
            ) WHERE rn <= 3
        """,
        # Re-shingle the corpus and rebuild the span frequency table
        # INDEPENDENTLY (DuckDB list slicing vs Spark transform/slice).
        # The mirror keys spans by their raw gram TEXT while Spark keys
        # by xxhash64 — equivalent counts absent hash collisions, which
        # are provably absent at oracle scale (see corpus.span_hashes).
        # Exact-substring removal: winner-keeps semantics replayed on
        # raw grams — per-span (count, first-occurrence) via windows,
        # k-wide coverage expansion per removed occurrence, distinct
        # union, anti-join, ORDER BY-pinned reassembly + md5.
        "q_span_strip": """
            WITH norm AS (
              SELECT doc_id,
                     lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t
              FROM documents
            ), toks AS (
              SELECT doc_id, t, string_split(t, ' ') AS w FROM norm
            ), expanded AS (
              SELECT doc_id, w,
                     unnest(generate_series(1, len(w) - 9)) AS i
              FROM toks WHERE len(w) >= 10
            ), occ AS (
              SELECT doc_id, i,
                     array_to_string(w[i : i + 9], ' ') AS span
              FROM expanded
              UNION ALL
              SELECT doc_id, 1 AS i, t AS span FROM toks WHERE len(w) < 10
            ), ranked AS (
              SELECT doc_id, i,
                     COUNT(*) OVER (PARTITION BY span) AS tot,
                     ROW_NUMBER() OVER (
                       PARTITION BY span ORDER BY doc_id, i) AS rn
              FROM occ
            ), removal AS (
              SELECT doc_id, i FROM ranked WHERE tot > 1 AND rn > 1
            ), covered AS (
              SELECT DISTINCT doc_id, idx FROM (
                SELECT doc_id,
                       unnest(generate_series(i, i + 9)) AS idx
                FROM removal)
            ), tokens AS (
              SELECT t.doc_id, ix.idx AS idx, t.w[ix.idx] AS tok
              FROM toks t, LATERAL (
                SELECT unnest(generate_series(1, len(t.w))) AS idx) ix
            ), kept AS (
              SELECT tk.doc_id,
                     string_agg(tk.tok, ' ' ORDER BY tk.idx) AS s,
                     COUNT(*) AS nk
              FROM tokens tk
              LEFT JOIN covered c
                ON c.doc_id = tk.doc_id AND c.idx = tk.idx
              WHERE c.doc_id IS NULL
              GROUP BY tk.doc_id
            )
            SELECT t.doc_id,
                   CAST(len(t.w) AS BIGINT) AS n_tokens,
                   CAST(len(t.w) - COALESCE(k.nk, 0) AS BIGINT)
                     AS n_removed,
                   md5(COALESCE(k.s, '')) AS kept_md5
            FROM toks t LEFT JOIN kept k USING (doc_id)
            ORDER BY t.doc_id
        """,
        "q_span_dedup": """
            WITH norm AS (
              SELECT doc_id,
                     lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t
              FROM documents
            ), toks AS (
              SELECT doc_id, t, string_split(t, ' ') AS w FROM norm
            ), expanded AS (
              SELECT doc_id, w,
                     unnest(generate_series(1, len(w) - 9)) AS i
              FROM toks WHERE len(w) >= 10
            ), spans AS (
              SELECT doc_id,
                     array_to_string(w[i : i + 9], ' ') AS span
              FROM expanded
              UNION ALL
              -- mirror Spark span_hashes: a doc shorter than k tokens
              -- contributes its whole normalized text as one span
              SELECT doc_id, t AS span FROM toks WHERE len(w) < 10
            ), tot AS (
              SELECT span, COUNT(*) AS tot FROM spans GROUP BY span
            )
            SELECT s.doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_spans,
                   CAST(SUM(CASE WHEN t.tot > 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_dup_spans,
                   round(SUM(CASE WHEN t.tot > 1 THEN 1 ELSE 0 END)
                         / COUNT(*)::DOUBLE, 6) AS dup_frac
            FROM spans s JOIN tot t USING (span)
            GROUP BY s.doc_id
        """,
        # Rebuild the unigram model (counts, top-32 vocab cut with the
        # same (cnt DESC, w ASC) tie-break, OOV price) and re-score.
        "q_unigram_lm": """
            WITH norm AS (
              SELECT doc_id,
                     lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t
              FROM documents
            ), words AS (
              SELECT doc_id, unnest(string_split(t, ' ')) AS w FROM norm
            ), words2 AS (
              SELECT doc_id, w FROM words WHERE w <> ''
            ), counts AS (
              SELECT w, COUNT(*) AS cnt FROM words2 GROUP BY w
            ), tot AS (
              SELECT CAST(SUM(cnt) AS DOUBLE) AS total FROM counts
            ), vocab AS (
              SELECT w,
                     CAST(round(ln(cnt / total) * 1000000) AS BIGINT)
                       AS lp_micros
              FROM counts, tot
              ORDER BY cnt DESC, w ASC LIMIT 32
            ), oov AS (
              SELECT CAST(round(ln(0.5 / total) * 1000000) AS BIGINT)
                       AS oov_micros
              FROM tot
            )
            SELECT d.doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_toks,
                   CAST(SUM(COALESCE(v.lp_micros, o.oov_micros))
                        AS BIGINT) AS lp_sum_micros,
                   CAST(floor(SUM(COALESCE(v.lp_micros, o.oov_micros))
                              / COUNT(*)) AS BIGINT) AS lp_mean_micros
            FROM words2 d
            LEFT JOIN vocab v USING (w)
            CROSS JOIN oov o
            GROUP BY d.doc_id
        """,
        # Winnowing: DuckDB replays the min-of-w-window fingerprint
        # selection + distinct + xor pin from the materialized
        # positioned span hashes (pos is 0-based from posexplode).
        "q_winnow": f"""
            WITH s AS (
              SELECT doc_id, pos, h,
                     COUNT(*) OVER (PARTITION BY doc_id) AS n,
                     MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                                  ROWS BETWEEN CURRENT ROW
                                  AND 3 FOLLOWING) AS wmin,
                     MIN(h) OVER (PARTITION BY doc_id) AS gmin
              FROM read_parquet('{ORACLE_DIR}/sf0.01/winnow_spans/*.parquet')
            ), fp AS (
              SELECT DISTINCT doc_id,
                     CASE WHEN n <= 4 THEN gmin ELSE wmin END AS f
              FROM s WHERE n <= 4 OR pos <= n - 4
            ), agg AS (
              SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_fp,
                     CAST(bit_xor(f) AS BIGINT) AS fp_xor
              FROM fp GROUP BY doc_id
            ), nn AS (
              SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans
              FROM read_parquet('{ORACLE_DIR}/sf0.01/winnow_spans/*.parquet')
              GROUP BY doc_id
            )
            SELECT nn.doc_id, nn.n_spans, agg.n_fp, agg.fp_xor
            FROM nn JOIN agg USING (doc_id)
        """,
        # Winnow pairs: hot-bucket prune + fingerprint self-join +
        # shared-count replayed from the materialized (doc_id, f).
        "q_winnow_pairs": f"""
            WITH fps AS (
              SELECT doc_id, f
              FROM read_parquet('{ORACLE_DIR}/sf0.01/winnow_pair_fps/*.parquet')
            ), hot AS (
              SELECT f FROM fps GROUP BY f HAVING COUNT(*) > 32
            ), kept AS (
              SELECT doc_id, f FROM fps
              WHERE f NOT IN (SELECT f FROM hot)
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(COUNT(*) AS BIGINT) AS n_shared
            FROM kept a JOIN kept b
              ON a.f = b.f AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        """,
        # URL canonicalization: the messy URLs are re-synthesized from
        # doc_id and re-canonicalized with DuckDB's own regex chain
        # (RE2, \\1 replacements, explicit 'g') — semantics shared,
        # code not.
        "q_url_canon": r"""
            WITH raw AS (
              SELECT doc_id,
                CASE CAST(doc_id % 6 AS INTEGER)
                  WHEN 0 THEN 'HTTPS://' || upper('site' || (doc_id % 20))
                       || '.Example.COM:443/p/' || (doc_id % 100)
                       || '?utm_source=x&id=' || (doc_id % 50)
                  WHEN 1 THEN 'https://site' || (doc_id % 20)
                       || '.example.com/p/' || (doc_id % 100)
                       || '?id=' || (doc_id % 50)
                  WHEN 2 THEN 'http://site' || (doc_id % 20)
                       || '.example.com:80/p/' || (doc_id % 100) || '#sec'
                  WHEN 3 THEN 'https://site' || (doc_id % 20)
                       || '.example.com/p/' || (doc_id % 100)
                       || '?fbclid=ABC' || (doc_id % 50)
                  WHEN 4 THEN 'https://site' || (doc_id % 20)
                       || '.example.com/p/' || (doc_id % 100)
                       || '?gclid=1&id=' || (doc_id % 50) || '&utm_medium=m'
                  ELSE 'http://site' || (doc_id % 20)
                       || '.example.com/p/' || (doc_id % 100)
                END AS url
              FROM documents
            ), parts AS (
              SELECT doc_id, url,
                lower(regexp_extract(url,
                  '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
                lower(regexp_extract(url,
                  '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS hp,
                regexp_extract(url,
                  '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)', 1) AS rest
              FROM raw
            ), cleaned AS (
              SELECT doc_id, url, scheme,
                CASE WHEN scheme = 'http'
                       THEN regexp_replace(hp, ':80$', '')
                     WHEN scheme = 'https'
                       THEN regexp_replace(hp, ':443$', '')
                     ELSE hp END AS hp,
                regexp_replace(regexp_replace(regexp_replace(
                  regexp_replace(rest,
                    '([?&])(utm_[^=&#]*|fbclid|gclid)=[^&#]*', '\1', 'g'),
                  '&{2,}', '&', 'g'), '\?&', '?', 'g'),
                  '[?&]$', '', 'g') AS rest
              FROM parts
            ), canon AS (
              SELECT doc_id, url,
                CASE WHEN scheme = '' THEN trim(url)
                     ELSE scheme || '://' || hp || rest END AS canon
              FROM cleaned
            )
            SELECT doc_id, url, canon,
                   CAST(COUNT(*) OVER (PARTITION BY canon) AS BIGINT)
                     AS n_variants
            FROM canon
        """,
        # Bigram LM: the whole model rebuilt from raw text with a
        # structurally different pair derivation (positional lateral
        # unnest), then the identical conditional + OOV pricing.
        "q_bigram_lm": """
            WITH norm AS (
              SELECT doc_id,
                     lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t
              FROM documents
            ), tok AS (
              SELECT doc_id,
                     list_filter(string_split(t, ' '), x -> x <> '') AS arr
              FROM norm
            ), pairs AS (
              SELECT doc_id, arr[i.x] AS prev, arr[i.x + 1] AS w
              FROM tok, LATERAL (
                SELECT unnest(range(1, len(arr))) AS x
              ) i
            ), pc AS (
              SELECT prev, w, COUNT(*) AS cnt FROM pairs GROUP BY prev, w
            ), ctx AS (
              SELECT prev, SUM(cnt) AS ctx_cnt FROM pc GROUP BY prev
            ), tot AS (
              SELECT CAST(SUM(cnt) AS DOUBLE) AS total FROM pc
            ), vocab AS (
              SELECT pc.prev, pc.w,
                     CAST(round(ln(pc.cnt / ctx.ctx_cnt) * 1000000)
                          AS BIGINT) AS lp_micros
              FROM pc JOIN ctx USING (prev)
              ORDER BY pc.cnt DESC, pc.prev ASC, pc.w ASC LIMIT 32
            ), oov AS (
              SELECT CAST(round(ln(0.5 / total) * 1000000) AS BIGINT)
                       AS oov_micros
              FROM tot
            )
            SELECT p.doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_bigrams,
                   CAST(SUM(COALESCE(v.lp_micros, o.oov_micros))
                        AS BIGINT) AS lp_sum_micros,
                   CAST(floor(SUM(COALESCE(v.lp_micros, o.oov_micros))
                              / COUNT(*)) AS BIGINT) AS lp_mean_micros
            FROM pairs p
            LEFT JOIN vocab v ON p.prev = v.prev AND p.w = v.w
            CROSS JOIN oov o
            GROUP BY p.doc_id
        """,
        # Host/tld re-derived from the materialized (url, html) parquet
        # with the same RE2-safe pattern; byte lengths recomputed from
        # the BLOB by DuckDB itself.
        # Host link graph: every href re-extracted from the raw page
        # bytes with the identical RE2∩Java-regex pattern, hosts
        # re-derived with the shared absolute-URL pattern, weights
        # re-aggregated.
        "q_host_graph": f"""
            WITH a AS (
              SELECT lower(regexp_extract(url,
                       '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)', 1))
                       AS src_host,
                     unnest(regexp_extract_all(decode(html),
                       'href="([^"]*)"', 1)) AS href
              FROM read_parquet('{ORACLE_DIR}/sf0.01/pages_meta/*.parquet')
            ), e AS (
              SELECT src_host,
                     lower(regexp_extract(href,
                       '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)', 1))
                       AS dst_host
              FROM a
            )
            SELECT src_host, dst_host,
                   CAST(COUNT(*) AS BIGINT) AS n_links
            FROM e
            WHERE src_host <> '' AND dst_host <> ''
            GROUP BY src_host, dst_host
        """,
        # SCC by a COMPLETELY different formulation: full transitive
        # closure via recursive CTE, then scc(v) = min over v and all
        # u mutually reachable with v. The Spark side runs trim +
        # forward-min coloring + backward closure — any membership
        # error in any phase diverges. Edge set regenerated closed-form
        # (same arithmetic as q_scc's in-plan synthesis at sf0.01).
        "q_scc": f"""
            WITH RECURSIVE ids AS (
              SELECT unnest(range(0, {max(8, _n_pages("sf0.01") // 128) * 8}))
                     AS id
            ), e AS (
              SELECT id AS src,
                     (id - id % 8) + ((id % 8 + 1) % 8) AS dst
              FROM ids
              UNION
              SELECT g * 8 AS src, 0 AS dst
              FROM (SELECT unnest(range(3,
                     {max(8, _n_pages("sf0.01") // 128)})) AS g)
              UNION
              SELECT src, dst FROM (VALUES
                (0, 8), (8, 16),
                (16, {max(8, _n_pages("sf0.01") // 128) * 8})) t(src, dst)
              UNION
              SELECT {max(8, _n_pages("sf0.01") // 128) * 8} + i AS src,
                     {max(8, _n_pages("sf0.01") // 128) * 8} + i + 1 AS dst
              FROM (SELECT unnest(range(0, 4)) AS i)
            ), nodes AS (
              SELECT src AS node FROM e UNION SELECT dst FROM e
            ), reach AS (
              SELECT src AS a, dst AS b FROM e
              UNION
              SELECT r.a, e.dst AS b FROM reach r JOIN e ON e.src = r.b
            ), mutual AS (
              SELECT r1.a AS u, r1.b AS v
              FROM reach r1 JOIN reach r2
                ON r1.a = r2.b AND r1.b = r2.a
            ), comp AS (
              SELECT n.node,
                     least(n.node, coalesce(min(m.u), n.node)) AS scc
              FROM nodes n LEFT JOIN mutual m ON m.v = n.node
              GROUP BY n.node
            )
            SELECT CAST(scc AS BIGINT) AS scc,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(MAX(node) AS BIGINT) AS max_node
            FROM comp GROUP BY scc ORDER BY scc
        """,
        "q_domain_stats": f"""
            WITH p AS (
              SELECT lower(regexp_extract(url,
                       '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)', 1)) AS host,
                     url, octet_length(html) AS b
              FROM read_parquet('{ORACLE_DIR}/sf0.01/pages_meta/*.parquet')
            )
            SELECT host,
                   regexp_extract(host, '([^.]+)$', 1) AS tld,
                   CAST(COUNT(*) AS BIGINT) AS n_pages,
                   CAST(COUNT(DISTINCT url) AS BIGINT) AS n_urls,
                   CAST(SUM(b) AS BIGINT) AS sum_bytes,
                   CAST(floor(SUM(b) / COUNT(*)) AS BIGINT) AS mean_bytes
            FROM p GROUP BY host
        """,
        # Z-order key: the clamp + bit-interleave expression is
        # regenerated term-by-term for DuckDB by _zorder_sql_expr —
        # the engines share the formula by construction, so any
        # disagreement is an arithmetic-semantics divergence.
        "q_zorder": f"""
            SELECT l_orderkey,
                   CAST(l_linenumber AS INTEGER) AS l_linenumber,
                   CAST({_zorder_sql_expr('l_partkey', 'l_suppkey')}
                        AS BIGINT) AS zkey
            FROM lineitem
        """,
        # The bucketed join's RESULT must equal a plain relational
        # join — bucketing is a physical-layout property only.
        "q_bucketed_join": """
            SELECT c.c_mktsegment,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS sum_cents
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_mktsegment
        """,
        # Byte-identical md5-hex threshold comparison: fixed-width
        # lowercase hex strings order exactly like the 32-bit cut
        # values they spell, so string < string IS the numeric test.
        "q_stratified_sample": f"""
            WITH s AS (
              SELECT doc_id, lang,
                     substring(md5(doc_id::VARCHAR), 1, 8) AS b,
                     CASE lang
                       WHEN 'en' THEN '{_rate_hex(_SAMPLE_RATES["en"])}'
                       WHEN 'es' THEN '{_rate_hex(_SAMPLE_RATES["es"])}'
                       WHEN 'zh' THEN '{_rate_hex(_SAMPLE_RATES["zh"])}'
                       ELSE '{_rate_hex(_SAMPLE_DEFAULT)}'
                     END AS thr
              FROM documents
            )
            SELECT lang,
                   CAST(COUNT(*) AS BIGINT) AS n_kept,
                   CAST(SUM(doc_id) AS BIGINT) AS sum_ids
            FROM s WHERE b < thr GROUP BY lang
        """,
        # The identical SQL text modulo view names — two engines, one
        # query, per-row integer cents.
        "q_sql_q3": """
            SELECT l_orderkey,
                   CAST(SUM(CAST(ROUND(l_extendedprice
                        * (1 - l_discount) * 100) AS BIGINT))
                     AS BIGINT) AS revenue_cents,
                   strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
                   o_orderpriority
            FROM customer
            JOIN orders   ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate <  TIMESTAMP '1997-06-01 00:00:00'
              AND l_shipdate  >= TIMESTAMP '1997-06-01 00:00:00'
            GROUP BY l_orderkey, o_orderdate, o_orderpriority
            ORDER BY revenue_cents DESC, l_orderkey
            LIMIT 10
        """,
        "q_sql_q5": """
            SELECT n_name,
                   CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
                        * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
                   COUNT(*) AS n_items
            FROM customer
            JOIN orders   ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
                         AND c_nationkey = s_nationkey
            JOIN nation   ON s_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
            GROUP BY n_name
            ORDER BY revenue_cents DESC, n_name
        """,
        # Replays the FULL OUTER join + classification over the two
        # materialized (url, md5) tables.
        "q_crawl_delta": f"""
            WITH j AS (
              SELECT COALESCE(a.url, b.url) AS url,
                     CASE WHEN a.url IS NULL THEN 'added'
                          WHEN b.url IS NULL THEN 'removed'
                          WHEN a.h = b.h THEN 'unchanged'
                          ELSE 'changed' END AS status
              FROM read_parquet('{ORACLE_DIR}/sf0.01/crawl_a/*.parquet') a
              FULL OUTER JOIN
                   read_parquet('{ORACLE_DIR}/sf0.01/crawl_b/*.parquet') b
                ON a.url = b.url
            )
            SELECT status,
                   CAST(COUNT(*) AS BIGINT) AS n_urls,
                   CAST(SUM(length(url)) AS BIGINT) AS sum_len
            FROM j GROUP BY status ORDER BY status
        """,
        # Per-column UNION ALL aggregates with the same normalization
        # (micros for doubles, strftime for timestamps).
        "q_profile": """
            WITH p AS (
              SELECT 'event_id' AS "column", COUNT(*) AS n_total,
                     COUNT(event_id) AS n_nonnull,
                     COUNT(DISTINCT event_id) AS n_distinct,
                     CAST(MIN(event_id) AS VARCHAR) AS min_norm,
                     CAST(MAX(event_id) AS VARCHAR) AS max_norm
              FROM events
              UNION ALL
              SELECT 'ts', COUNT(*), COUNT(ts), COUNT(DISTINCT ts),
                     strftime(MIN(ts), '%Y-%m-%d %H:%M:%S'),
                     strftime(MAX(ts), '%Y-%m-%d %H:%M:%S')
              FROM events
              UNION ALL
              SELECT 'user_id', COUNT(*), COUNT(user_id),
                     COUNT(DISTINCT user_id),
                     CAST(MIN(user_id) AS VARCHAR),
                     CAST(MAX(user_id) AS VARCHAR)
              FROM events
              UNION ALL
              SELECT 'event_type', COUNT(*), COUNT(event_type),
                     COUNT(DISTINCT event_type),
                     MIN(event_type), MAX(event_type)
              FROM events
              UNION ALL
              SELECT 'value', COUNT(*), COUNT(value),
                     COUNT(DISTINCT value),
                     CAST(CAST(round(MIN(value) * 1000000) AS BIGINT)
                          AS VARCHAR),
                     CAST(CAST(round(MAX(value) * 1000000) AS BIGINT)
                          AS VARCHAR)
              FROM events
              UNION ALL
              SELECT 'props', COUNT(*), COUNT(props),
                     COUNT(DISTINCT props), MIN(props), MAX(props)
              FROM events
            )
            SELECT "column",
                   CAST(n_total AS BIGINT) AS n_total,
                   CAST(n_nonnull AS BIGINT) AS n_nonnull,
                   CAST(n_distinct AS BIGINT) AS n_distinct,
                   min_norm, max_norm
            FROM p ORDER BY "column"
        """,
        # Batch replay of the stream-static join: the dimension is a
        # pure function of event_type, the weighted sum is per-row
        # integer micros (order-insensitive).
        "stream_enrich": """
            SELECT substring(event_type, 1, 1) AS category,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(CAST(round(value * 1000000) AS BIGINT)
                        * length(event_type)) AS BIGINT) AS sum_wv_micros
            FROM events
            GROUP BY 1 ORDER BY category
        """,
        # Full detect+strip replay: same normalization, k=8 token
        # prefixes, integer-permille share cut, (host, own-prefix)
        # equality join and substring/ltrim arithmetic.
        "q_boilerplate": f"""
            WITH d AS (
              SELECT doc_id, source,
                     trim(regexp_replace(
                       text, '[ \\t\\n\\r\\f\\x0B]+', ' ', 'g')) AS norm
              FROM read_parquet(
                '{ORACLE_DIR}/sf0.01/boilerplate_docs/*.parquet')
            ), tk AS (
              SELECT *,
                     array_to_string(
                       string_split(norm, ' ')[1:8], ' ') AS prefix
              FROM d
            ), pp AS (
              SELECT source, prefix, COUNT(*) AS n_docs
              FROM tk WHERE prefix <> '' GROUP BY source, prefix
            ), ph AS (
              SELECT source, COUNT(*) AS host_docs
              FROM tk WHERE prefix <> '' GROUP BY source
            ), bp AS (
              SELECT pp.source, pp.prefix
              FROM pp JOIN ph USING (source)
              WHERE pp.n_docs >= 2
                AND pp.n_docs * 1000 // ph.host_docs >= 400
            ), st AS (
              SELECT tk.source,
                     CASE WHEN bp.prefix IS NOT NULL THEN 1 ELSE 0 END
                       AS stripped,
                     CASE WHEN bp.prefix IS NOT NULL
                          THEN ltrim(substring(
                            tk.norm, length(bp.prefix) + 1))
                          ELSE tk.norm END AS text2
              FROM tk LEFT JOIN bp
                ON tk.source = bp.source AND tk.prefix = bp.prefix
            )
            SELECT source,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(stripped) AS BIGINT) AS n_stripped,
                   CAST(SUM(length(text2)) AS BIGINT) AS sum_len_after
            FROM st GROUP BY source ORDER BY source
        """,
        # Identical total order, microsecond gap rule and virtual
        # __start__ state replayed with DuckDB windows.
        "q_transitions": """
            WITH o AS (
              SELECT event_type,
                     epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap,
                     lag(event_type) OVER w AS prev_raw
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            )
            SELECT CASE WHEN gap IS NULL OR gap > 1800 * 1000000
                        THEN '__start__' ELSE prev_raw END AS prev_state,
                   event_type AS next_state,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM o
            GROUP BY 1, 2
            ORDER BY prev_state, next_state
        """,
        # Re-scores the materialized corrupted table with the VERBATIM
        # signature pattern (pure literal alternation, identical in
        # Java regex and RE2; alternatives are mutually exclusive at
        # any position so leftmost-first vs leftmost-longest cannot
        # diverge).
        "q_mojibake": f"""
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text, 'Ã©|Ã¨|Ã¼|Ã¶|Ã¤|Ã±|Ã§|Ã |Â«|Â»|Â°|Â |â|â|â|â|â|â¦|ï»¿'))
                        AS BIGINT) AS mojibake_hits,
                   CAST(len(regexp_extract_all(text, '\ufffd'))
                        AS BIGINT) AS replacement_chars,
                   CAST(len(regexp_extract_all(text, '[^\\x00-\\x7f]'))
                        AS BIGINT) AS non_ascii_chars,
                   CAST(CASE WHEN len(regexp_extract_all(
                        text, 'Ã©|Ã¨|Ã¼|Ã¶|Ã¤|Ã±|Ã§|Ã |Â«|Â»|Â°|Â |â|â|â|â|â|â¦|ï»¿')) > 0
                        THEN 1 ELSE 0 END AS INT) AS flagged
            FROM read_parquet('{ORACLE_DIR}/sf0.01/mojibake_docs/*.parquet')
            ORDER BY doc_id
        """,
        # Same normalize→split tokenization, stride-24 window starts via
        # generate_series, 1-based inclusive list slicing, and the
        # dense chunk_idx from the start order.
        "q_chunking": """
            WITH toks AS (
              SELECT doc_id,
                     string_split(
                       trim(regexp_replace(
                         text, '[ \\t\\n\\r\\f\\x0B]+', ' ', 'g')),
                       ' '
                     ) AS t
              FROM documents
            ), nz AS (
              SELECT doc_id, t, len(t) AS n
              FROM toks WHERE len(t) > 0 AND t[1] <> ''
            ), st AS (
              SELECT doc_id, t, n,
                     unnest(generate_series(0, n - 1, 24)) AS start_
              FROM nz
            ), stf AS (
              SELECT * FROM st WHERE start_ = 0 OR start_ + 8 < n
            ), s AS (
              SELECT *,
                     CAST(row_number() OVER (
                       PARTITION BY doc_id ORDER BY start_) - 1 AS INT)
                       AS chunk_idx
              FROM stf
            )
            SELECT doc_id, chunk_idx,
                   array_to_string(t[start_ + 1 : start_ + 32], ' ')
                     AS chunk_text,
                   CAST(LEAST(32, n - start_) AS INT) AS n_tokens
            FROM s
            ORDER BY doc_id, chunk_idx
        """,
        # Byte-identical md5-hex split thresholds on the SOURCE key.
        "q_leakage_split": """
            WITH s AS (
              SELECT *,
                     CASE
                       WHEN substring(md5(source), 1, 8) < 'cccccccd'
                         THEN 'train'
                       WHEN substring(md5(source), 1, 8) < 'e6666666'
                         THEN 'valid'
                       ELSE 'test'
                     END AS split
              FROM documents
            )
            SELECT split,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(COUNT(DISTINCT source) AS BIGINT) AS n_keys,
                   CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars
            FROM s GROUP BY split ORDER BY split
        """,
        # Rebuild TF, DF, integer-micros IDF and the per-doc top-3
        # with the same (score DESC, term ASC) tie-break.
        "q_tfidf": """
            WITH norm AS (
              SELECT doc_id,
                     lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t
              FROM documents
            ), words AS (
              SELECT doc_id, unnest(string_split(t, ' ')) AS w FROM norm
            ), w2 AS (
              SELECT doc_id, w FROM words WHERE w <> ''
            ), tf AS (
              SELECT doc_id, w, COUNT(*) AS tf
              FROM w2 GROUP BY doc_id, w
            ), nd AS (
              SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents
            ), idf AS (
              SELECT w,
                     CAST(round(ln(n_docs / df) * 1000000) AS BIGINT)
                       AS idf_micros
              FROM (
                SELECT w, COUNT(*) AS df FROM tf GROUP BY w
                ORDER BY df DESC, w ASC LIMIT 262144
              ), nd
            ), scored AS (
              SELECT tf.doc_id, tf.w AS term,
                     CAST(tf.tf AS BIGINT) AS tf,
                     CAST(tf.tf * idf_micros AS BIGINT) AS score_micros
              FROM tf JOIN idf USING (w)
            )
            SELECT doc_id, term, tf, score_micros FROM (
              SELECT *, row_number() OVER (
                PARTITION BY doc_id
                ORDER BY score_micros DESC, term ASC
              ) AS rn FROM scored
            ) WHERE rn <= 3
        """,
        "q_keyword_search": """
            WITH norm AS (
              SELECT doc_id,
                     lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t
              FROM documents
            ), words AS (
              SELECT doc_id, unnest(string_split(t, ' ')) AS w FROM norm
            )
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
            FROM words WHERE w IN ('spark', 'query')
            GROUP BY doc_id
            HAVING COUNT(DISTINCT w) = 2
        """,
        # Full BM25 replay: tf/df/idf/dl/avgdl rebuilt from raw text,
        # and the identical pinned integer-micros DIV chain (DuckDB //
        # == Spark DIV on the all-positive operands here). The one
        # float op, ln() for idf, is rounded to micros per TERM on
        # both engines — same discipline as q_tfidf.
        "q_bm25": """
            WITH norm AS (
              SELECT doc_id,
                     lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t
              FROM documents
            ), words AS (
              SELECT doc_id, unnest(string_split(t, ' ')) AS w FROM norm
            ), w2 AS (
              SELECT doc_id, w FROM words WHERE w <> ''
            ), dl AS (
              SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
              FROM w2 GROUP BY doc_id
            ), stats AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                     greatest((CAST(SUM(dl) AS BIGINT) * 1000000)
                              // greatest(COUNT(*), 1), 1) AS avgdl_micros
              FROM dl
            ), tf AS (
              SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf
              FROM w2 WHERE w IN ('data', 'query', 'spark')
              GROUP BY doc_id, w
            ), idf AS (
              SELECT w,
                     CAST(round(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
                                * 1000000) AS BIGINT) AS idf_micros
              FROM (
                SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY w
              ), stats
            ), scored AS (
              SELECT tf.doc_id,
                     idf_micros * (
                       tf * 220 * 10000000000 // (
                         tf * 1000000 + 120 * (
                           250000
                           + 75 * (dl.dl * 1000000000000 // avgdl_micros)
                             // 100
                         ) // 100
                       )
                     ) // 1000000 AS s_micros
              FROM tf JOIN idf USING (w) JOIN dl USING (doc_id), stats
            )
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms,
                   CAST(SUM(s_micros) AS BIGINT) AS score_micros
            FROM scored GROUP BY doc_id
            ORDER BY score_micros DESC, doc_id ASC LIMIT 20
        """,
        # Re-shingle 13-grams and replay the benchmark overlap with
        # raw gram TEXT keys (Spark keys by xxhash64 — identical
        # counts absent collisions, which are absent at oracle scale).
        "q_decontaminate": """
            WITH norm AS (
              SELECT doc_id,
                     lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t
              FROM documents
            ), toks AS (
              SELECT doc_id, t, string_split(t, ' ') AS w FROM norm
            ), spans AS (
              SELECT doc_id, array_to_string(w[i : i + 12], ' ') AS span
              FROM (SELECT doc_id, w,
                           unnest(generate_series(1, len(w) - 12)) AS i
                    FROM toks WHERE len(w) >= 13)
              UNION ALL
              SELECT doc_id, t AS span FROM toks WHERE len(w) < 13
            ), bench AS (
              SELECT DISTINCT span, 1 AS hit FROM spans WHERE doc_id % 37 = 0
            )
            SELECT s.doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_spans,
                   CAST(SUM(COALESCE(b.hit, 0)) AS BIGINT) AS n_hit,
                   round(SUM(COALESCE(b.hit, 0)) / COUNT(*)::DOUBLE, 6)
                     AS hit_frac
            FROM spans s LEFT JOIN bench b USING (span)
            GROUP BY s.doc_id
        """,
        # Replay the as-of match as an inequality join + argmax —
        # fine at oracle scale, exactly the blowup the Spark
        # union+window shape avoids. Same (ts DESC, id DESC) winner.
        "q_asof_join": """
            WITH clicks AS (
              SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'click'
            ), views AS (
              SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'view'
            ), pairs AS (
              SELECT c.event_id AS click_id, c.user_id,
                     c.ts AS cts, v.event_id AS view_id, v.ts AS vts,
                     row_number() OVER (
                       PARTITION BY c.event_id
                       ORDER BY v.ts DESC NULLS LAST,
                                v.event_id DESC NULLS LAST
                     ) AS rn
              FROM clicks c LEFT JOIN views v
                ON v.user_id = c.user_id AND v.ts <= c.ts
            )
            SELECT click_id, user_id,
                   strftime(cts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
                   view_id,
                   strftime(vts, '%Y-%m-%d %H:%M:%S.%f') AS view_ts,
                   CAST(FLOOR(epoch(cts)) - FLOOR(epoch(vts)) AS BIGINT)
                     AS gap_s
            FROM pairs WHERE rn = 1
        """,
        "q_hll_rollup": _hll_rollup_oracle_sql(),
        "q_bitext": f"""
            WITH ap AS (
              SELECT a_id, centroid
              FROM read_parquet('{ORACLE_DIR}/sf0.01/bitext_probes/*.parquet')
            ), ba AS (
              SELECT b_id, centroid
              FROM read_parquet('{ORACLE_DIR}/sf0.01/bitext_assign/*.parquet')
            ), av AS (
              SELECT vec_id AS a_id, embedding::DOUBLE[] AS v
              FROM embeddings WHERE vec_id % 2 = 0
            ), bv AS (
              SELECT vec_id AS b_id, embedding::DOUBLE[] AS v
              FROM embeddings WHERE vec_id % 2 = 1
            ), cand AS (
              SELECT ap.a_id, ba.b_id,
                     CAST(round(
                       list_dot_product(av.v, bv.v)
                       / (sqrt(list_dot_product(av.v, av.v))
                          * sqrt(list_dot_product(bv.v, bv.v)))
                       * 1000000) AS BIGINT) AS cos_u
              FROM ap
              JOIN ba USING (centroid)
              JOIN av USING (a_id)
              JOIN bv USING (b_id)
            ), pos AS (
              SELECT * FROM cand WHERE cos_u > 0
            ), ranked AS (
              SELECT a_id, b_id, cos_u,
                     row_number() OVER (
                       PARTITION BY a_id ORDER BY cos_u DESC, b_id
                     ) AS ra,
                     row_number() OVER (
                       PARTITION BY b_id ORDER BY cos_u DESC, a_id
                     ) AS rb
              FROM pos
            ), sa AS (
              SELECT a_id, CAST(SUM(cos_u) AS BIGINT) AS da,
                     CAST(COUNT(*) AS BIGINT) AS na
              FROM ranked WHERE ra <= 4 GROUP BY a_id
            ), sb AS (
              SELECT b_id, CAST(SUM(cos_u) AS BIGINT) AS db,
                     CAST(COUNT(*) AS BIGINT) AS nb
              FROM ranked WHERE rb <= 4 GROUP BY b_id
            ), scored AS (
              SELECT r.a_id, r.b_id, r.cos_u,
                     CAST((2 * r.cos_u * 1000000 * sa.na * sb.nb)
                          // (sa.da * sb.nb + sb.db * sa.na)
                          AS BIGINT) AS margin_u
              FROM ranked r
              JOIN sa USING (a_id)
              JOIN sb USING (b_id)
            ), best AS (
              SELECT *, row_number() OVER (
                PARTITION BY a_id
                ORDER BY margin_u DESC, cos_u DESC, b_id
              ) AS rbest
              FROM scored
            )
            SELECT a_id, b_id, cos_u, margin_u FROM best
            WHERE rbest = 1 AND margin_u >= 1020000
            ORDER BY a_id
        """,
        "q_tables": f"""
            SELECT variant, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(COUNT(*) AS BIGINT) AS n_exact,
                   CAST(SUM(n_cells) AS BIGINT) AS cells
            FROM read_parquet('{ORACLE_DIR}/sf0.01/tables_meta/*.parquet')
            GROUP BY variant
            ORDER BY variant
        """,
        "q_kg_diff": f"""
            WITH tr AS (
              SELECT url, g, s, p, o, o_kind, o_dt, o_lang,
                     CAST('0x' || substr(md5(url), 1, 4) AS BIGINT)
                       % 10 AS cls
              FROM read_parquet('{ORACLE_DIR}/sf0.01/triples/*.parquet')
            ), old AS (
              SELECT g, s, p,
                     CASE WHEN cls = 1
                               AND p = 'http://schema.org/name'
                               AND o_kind = 1
                          THEN o || ' (stale)' ELSE o END AS o,
                     o_kind, o_dt, o_lang
              FROM tr
              WHERE NOT (cls = 0
                         AND p = 'http://schema.org/relatedLink')
            ), new AS (
              SELECT g, s, p, o, o_kind, o_dt, o_lang FROM tr
            ), merged AS (
              SELECT g, s, p, o, o_kind, o_dt, o_lang,
                     max(so) AS _o, max(sn) AS _n
              FROM (
                SELECT *, 1 AS so, 0 AS sn FROM old
                UNION ALL
                SELECT *, 0 AS so, 1 AS sn FROM new
              )
              GROUP BY g, s, p, o, o_kind, o_dt, o_lang
            )
            SELECT p,
                   CASE WHEN _n = 1 THEN 'added'
                        ELSE 'removed' END AS change,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST('0x' || substr(md5(
                     concat_ws(chr(1), g, s, p, o)), 1, 10) AS BIGINT))
                     AS BIGINT) AS pin
            FROM merged WHERE _o <> _n
            GROUP BY p, change
            ORDER BY p, change
        """,
        "q_funnel": """
            WITH e AS (
              SELECT user_id, ts, event_type FROM events
              WHERE event_type IN ('view', 'click', 'purchase')
            ), s1 AS (
              SELECT user_id, min(ts) AS t1 FROM e
              WHERE event_type = 'view' GROUP BY user_id
            ), s2 AS (
              SELECT e.user_id, min(e.ts) AS t2 FROM e
              JOIN s1 USING (user_id)
              WHERE e.event_type = 'click' AND e.ts > s1.t1
              GROUP BY e.user_id
            ), s3 AS (
              SELECT e.user_id, min(e.ts) AS t3 FROM e
              JOIN s2 USING (user_id)
              WHERE e.event_type = 'purchase' AND e.ts > s2.t2
              GROUP BY e.user_id
            ), u AS (SELECT DISTINCT user_id FROM e)
            SELECT u.user_id,
                   CAST(CASE WHEN t3 IS NOT NULL THEN 3
                             WHEN t2 IS NOT NULL THEN 2
                             WHEN t1 IS NOT NULL THEN 1
                             ELSE 0 END AS INT) AS steps_completed,
                   COALESCE(strftime(t1, '%Y-%m-%d %H:%M:%S.%f'), '')
                     AS t1,
                   COALESCE(strftime(t2, '%Y-%m-%d %H:%M:%S.%f'), '')
                     AS t2,
                   COALESCE(strftime(t3, '%Y-%m-%d %H:%M:%S.%f'), '')
                     AS t3
            FROM u
            LEFT JOIN s1 USING (user_id)
            LEFT JOIN s2 USING (user_id)
            LEFT JOIN s3 USING (user_id)
            ORDER BY user_id
        """,
        "q_skyline": """
            WITH p AS (
              SELECT p_partkey,
                     CAST(round(p_retailprice * 100) AS BIGINT)
                       AS price_c,
                     CAST(p_size AS BIGINT) AS size
              FROM part
            )
            SELECT p_partkey, price_c, size FROM p a
            WHERE NOT EXISTS (
              SELECT 1 FROM p b
              WHERE b.price_c <= a.price_c AND b.size >= a.size
                AND (b.price_c < a.price_c OR b.size > a.size)
            )
            ORDER BY p_partkey
        """,
        "q_pagerank": _pagerank_oracle_sql(n_iter=5),
        "q_trustrank": _ppr_oracle_sql(
            n_iter=5,
            seed_where="node % 50 = 0",
            dir_edges_sql="""
          SELECT o_custkey % 9973 AS src, l_suppkey % 9973 AS dst
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey""",
        ),
        "q_anf": _anf_oracle_sql(
            n_rounds=3,
            dir_edges_sql="""
          SELECT o_custkey % 9973 AS src, l_suppkey % 9973 AS dst
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey""",
        ),
        # Host centrality: edges re-derived from raw page bytes, all
        # rank iterations replayed — both pipeline stages certified.
        "q_host_rank": _pagerank_oracle_sql(
            n_iter=3,
            undirected=False,
            dir_edges_sql=_HOST_DIR_EDGES_SQL,
        ),
        # HITS over the same re-derived host edges: both score
        # vectors replayed through all iterations with the identical
        # quantized-L1 integer normalization.
        "q_hits": _hits_oracle_sql(n_iter=3, dir_edges_sql=_HOST_DIR_EDGES_SQL),
        "q_pca": _pca_oracle_sql(n_iter=8, dim=64),
        "q_kcore": _kcore_oracle_sql(k=35, n_rounds=4),
        "q_label_prop": _lpa_oracle_sql(n_iter=5),
        "q_bfs_hops": _bfs_oracle_sql(n_rounds=3),
        # FULL-relax Bellman-Ford rounds (vs the operator's
        # frontier-active rounds): after r rounds both equal the min
        # cost over ≤ r-edge paths, so identical rows certify the
        # frontier optimization. MATERIALIZED: each round references
        # the previous twice (owl_entail discipline).
        "q_sssp": """
            WITH e AS MATERIALIZED (
              SELECT src, dst, MIN(w) AS w FROM (
                SELECT o_custkey % 9973 AS src,
                       l_suppkey % 9973 AS dst,
                       1 + ((o_custkey % 9973) * 7
                            + (l_suppkey % 9973) * 13) % 9 AS w
                FROM orders JOIN lineitem ON o_orderkey = l_orderkey
              ) GROUP BY src, dst
            ), d0 AS MATERIALIZED (
              SELECT node, CAST(0 AS BIGINT) AS dist FROM (
                SELECT DISTINCT node FROM (
                  SELECT src AS node FROM e
                  UNION SELECT dst FROM e)
                WHERE node % 997 = 0)
            ), d1 AS MATERIALIZED (
              SELECT node, MIN(dist) AS dist FROM (
                SELECT node, dist FROM d0
                UNION ALL
                SELECT e.dst, d0.dist + e.w FROM d0
                JOIN e ON d0.node = e.src
              ) GROUP BY node
            ), d2 AS MATERIALIZED (
              SELECT node, MIN(dist) AS dist FROM (
                SELECT node, dist FROM d1
                UNION ALL
                SELECT e.dst, d1.dist + e.w FROM d1
                JOIN e ON d1.node = e.src
              ) GROUP BY node
            ), d3 AS MATERIALIZED (
              SELECT node, MIN(dist) AS dist FROM (
                SELECT node, dist FROM d2
                UNION ALL
                SELECT e.dst, d2.dist + e.w FROM d2
                JOIN e ON d2.node = e.src
              ) GROUP BY node
            )
            SELECT node, dist FROM d3 ORDER BY node
        """,
        "q_walks": _walks_oracle_sql(walk_len=3, walks_per_node=2),
        "q_link_predict": _link_predict_oracle_sql(
            max_center_deg=64, min_cn=2, top_k=50
        ),
        "q_kmeans": _kmeans_oracle_sql(n_iter=5, k=8),
        # SemDeDup: the k-means assignment (certified end-to-end by
        # q_kmeans's iteration replay) is materialized; DuckDB then
        # independently replays the within-cluster cosine join and
        # the smallest-smaller-id verdict over the raw embeddings.
        "q_semdedup": f"""
            WITH asg AS (
              SELECT vec_id, cluster
              FROM read_parquet('{ORACLE_DIR}/sf0.01/semdedup_assign/*.parquet')
            ), e AS (
              SELECT a.vec_id, a.cluster, em.embedding::DOUBLE[] AS v
              FROM asg a JOIN embeddings em USING (vec_id)
            ), dups AS (
              SELECT a.vec_id, MIN(b.vec_id) AS dup_of
              FROM e a JOIN e b ON a.cluster = b.cluster
                               AND b.vec_id < a.vec_id
              WHERE round(
                      list_dot_product(a.v, b.v)
                      / (sqrt(list_dot_product(a.v, a.v))
                         * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.4
              GROUP BY a.vec_id
            )
            SELECT asg.vec_id, asg.cluster,
                   dups.dup_of IS NULL AS kept,
                   CAST(COALESCE(dups.dup_of, -1) AS BIGINT) AS dup_of
            FROM asg LEFT JOIN dups USING (vec_id)
        """,
        "q_pq_search": _pq_oracle_sql(n_iter=3, k=16),
        # Replays the ENTIRE SQ8 pipeline from raw parquet: floor(v *
        # 2^20) quantization, per-dimension min/max, the 255-level
        # code rule, the query's own codes, and the span-scaled
        # integer distance — all operands non-negative at the
        # divisions, so //, div and numpy floor-div agree.
        "q_sq8": """
            WITH vm AS (
              SELECT vec_id, i - 1 AS d,
                     CAST(floor(embedding[i]::DOUBLE * 1048576) AS BIGINT)
                       AS q
              FROM (SELECT vec_id, embedding,
                           unnest(generate_series(1, 64)) AS i
                    FROM embeddings)
            ), st AS (
              SELECT d, MIN(q) AS lo, MAX(q) AS hi FROM vm GROUP BY d
            ), codes AS (
              SELECT vm.vec_id, vm.d,
                     CASE WHEN st.hi = st.lo THEN 0
                          ELSE CAST(((vm.q - st.lo) * 255)
                                    // (st.hi - st.lo) AS BIGINT)
                     END AS c
              FROM vm JOIN st USING (d)
            ), qc AS (
              SELECT d, c AS qcode FROM codes WHERE vec_id = 0
            ), dist AS (
              SELECT codes.vec_id,
                     CAST(SUM(
                       ((abs(codes.c - qc.qcode) * (st.hi - st.lo)) // 255)
                       * ((abs(codes.c - qc.qcode) * (st.hi - st.lo)) // 255)
                     ) AS BIGINT) AS sq_dist
              FROM codes JOIN qc USING (d) JOIN st USING (d)
              GROUP BY codes.vec_id
            )
            SELECT vec_id, sq_dist FROM dist
            ORDER BY sq_dist ASC, vec_id ASC LIMIT 10
        """,
        # Brute-force canonical a<b<c three-way self-join — the exact
        # count the degree-oriented wedge join must reproduce.
        "q_triangles": """
            WITH raw AS (
              SELECT DISTINCT (o.o_custkey % 9973) AS x,
                              (l.l_suppkey % 9973) AS y
              FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            ), e AS (
              SELECT DISTINCT least(x, y) AS a, greatest(x, y) AS b
              FROM raw WHERE x <> y
            ), nodes AS (
              SELECT a AS n FROM e UNION SELECT b FROM e
            )
            SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM nodes)
                     AS n_nodes,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
                   (SELECT CAST(COUNT(*) AS BIGINT)
                    FROM e e1
                    JOIN e e2 ON e2.a = e1.b
                    JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
                     AS n_triangles
        """,
        # Replay the range join as the naive inequality join the Spark
        # shape deliberately avoids; BETWEEN is inclusive on both ends,
        # matching range_join's [ts - before, ts + after].
        "q_range_join": """
            WITH clicks AS (
              SELECT event_id AS click_id, user_id, ts FROM events
              WHERE event_type = 'click'
            ), views AS (
              SELECT event_id AS view_id, user_id, ts FROM events
              WHERE event_type = 'view'
            )
            SELECT c.click_id, c.user_id,
                   CAST(COUNT(v.view_id) AS BIGINT) AS n_views_10m,
                   MAX(v.view_id) AS last_view_id
            FROM clicks c LEFT JOIN views v
              ON v.user_id = c.user_id
             AND v.ts BETWEEN c.ts - INTERVAL 600 SECOND AND c.ts
            GROUP BY c.click_id, c.user_id
        """,
        # Replay the percentile_disc rule itself (window cumsum over
        # the distinct-value table, rank = ceil(q*n/1000) in integer
        # arithmetic) — NOT quantile_disc(), whose interpolation rule
        # needn't match bit-for-bit.
        "q_quantiles": """
            WITH cents AS (
              SELECT l_returnflag,
                     CAST(round(l_extendedprice * 100) AS BIGINT) AS c
              FROM lineitem
            ), counts AS (
              SELECT l_returnflag, c, COUNT(*) AS cnt
              FROM cents GROUP BY 1, 2
            ), cum AS (
              SELECT l_returnflag, c,
                     SUM(cnt) OVER (PARTITION BY l_returnflag
                                    ORDER BY c) AS cu,
                     SUM(cnt) OVER (PARTITION BY l_returnflag) AS n
              FROM counts
            ), qs AS (
              SELECT unnest([10, 250, 500, 750, 990]) AS q_permille
            )
            SELECT l_returnflag, CAST(q_permille AS INTEGER) AS q_permille,
                   CAST(MIN(c) AS BIGINT) AS value
            FROM cum, qs
            WHERE cu >= (q_permille * n + 999) // 1000
            GROUP BY 1, 2
        """,
        # Identical hex-prefix sampling rule on both engines: a
        # fixed-width md5 PREFIX compare equals a numeric threshold
        # on the hash, with no integer conversion to disagree on.
        "q_distinct_sketch": """
            SELECT lang,
                   CAST(COUNT(DISTINCT text) AS BIGINT) AS n_kept,
                   CAST(COUNT(DISTINCT text) * 16 AS BIGINT)
                     AS distinct_est
            FROM documents
            WHERE text IS NOT NULL
              AND substring(md5(text), 1, 1) = '0'
            GROUP BY lang
        """,
        # Replays the ENTIRE HyperLogLog independently: same 60-bit
        # md5 hash, top-8-bit bucket, bin()-length rho (never
        # floor(log2)), exact-integer harmonic denominator, and the
        # identical left-associated double arithmetic for the
        # bias-corrected / linear-counting estimate.
        "q_hll": """
            WITH d AS (
              SELECT lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))
                       AS t
              FROM documents
            ), w AS (
              SELECT unnest(string_split(t, ' ')) AS w FROM d
            ), tok AS (
              SELECT w FROM w WHERE w <> ''
            ), h AS (
              SELECT CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) AS h
              FROM tok
            ), r AS (
              SELECT h >> 52 AS bucket,
                     MAX(CASE WHEN (h & ((1::BIGINT << 52) - 1)) = 0
                              THEN 53
                              ELSE 53 - length(bin(h & ((1::BIGINT << 52) - 1)))
                         END) AS rho
              FROM h GROUP BY bucket
            ), a AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n_regs,
                     CAST(SUM(1::BIGINT << CAST(53 - rho AS INTEGER))
                          AS BIGINT) AS denom_used
              FROM r
            ), s AS (
              SELECT CAST(256 AS BIGINT) AS m, n_regs,
                     CAST(256 - n_regs AS BIGINT) AS zero_regs,
                     CAST(denom_used + (256 - n_regs) * (1::BIGINT << 53)
                          AS BIGINT) AS denom
              FROM a
            ), e AS (
              SELECT m, n_regs, zero_regs, denom,
                     ((0.7213 / (1.0 + 1.079 / 256.0)) * 256.0 * 256.0)
                       * 9007199254740992.0 / denom AS raw
              FROM s
            )
            SELECT e.m, e.n_regs, e.zero_regs, e.denom,
                   CAST(round(CASE WHEN raw <= 640.0 AND zero_regs > 0
                                   THEN 256.0 * ln(256.0 / zero_regs)
                                   ELSE raw END, 0) AS BIGINT) AS hll_est,
                   (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) FROM tok)
                     AS exact_distinct
            FROM e
        """,
        # Replays the mixture pipeline end-to-end: token counts, the
        # per-domain aggregate, the overflow-safe two-step rate
        # division, and the (u32*1e6)>>32 membership rule.
        "q_mix": """
            WITH toks AS (
              SELECT lang AS stratum, doc_id,
                     CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                     END AS BIGINT) AS n_toks
              FROM documents
            ), dom AS (
              SELECT stratum, CAST(COUNT(*) AS BIGINT) AS total_docs,
                     CAST(SUM(n_toks) AS BIGINT) AS total_toks
              FROM toks GROUP BY stratum
            ), tot AS (
              SELECT CAST(SUM(total_toks) AS BIGINT) AS corpus_toks FROM dom
            ), w AS (
              SELECT * FROM (VALUES ('en', 300), ('zh', 250), ('es', 200),
                                    ('de', 150), ('fr', 100))
                     AS t(stratum, w_milli)
            ), rates AS (
              SELECT d.stratum,
                     CAST(COALESCE(w.w_milli, 0) AS BIGINT) AS w_milli,
                     d.total_docs, d.total_toks,
                     CAST(CASE WHEN d.total_toks = 0 THEN 0
                          ELSE least(1000000,
                            (((tot.corpus_toks * 4) // 5)
                              * COALESCE(w.w_milli, 0))
                              // d.total_toks * 1000
                            + ((((tot.corpus_toks * 4) // 5)
                              * COALESCE(w.w_milli, 0))
                              % d.total_toks) * 1000 // d.total_toks)
                     END AS BIGINT) AS rate_ppm
              FROM dom d LEFT JOIN w USING (stratum), tot
            ), kept AS (
              SELECT t.stratum, CAST(COUNT(*) AS BIGINT) AS kept_docs,
                     CAST(SUM(t.n_toks) AS BIGINT) AS kept_toks
              FROM toks t JOIN rates r USING (stratum)
              WHERE (CAST('0x' || substr(md5(CAST(t.doc_id AS VARCHAR)), 1, 8)
                          AS BIGINT) * 1000000) >> 32 < r.rate_ppm
              GROUP BY t.stratum
            )
            SELECT r.stratum, r.w_milli, r.total_docs, r.total_toks,
                   r.rate_ppm,
                   CAST(COALESCE(k.kept_docs, 0) AS BIGINT) AS kept_docs,
                   CAST(COALESCE(k.kept_toks, 0) AS BIGINT) AS kept_toks
            FROM rates r LEFT JOIN kept k USING (stratum)
        """,
        # Replays the ENTIRE log-linear sketch independently: same
        # clamped-and-self-corrected exponent (integer-shift compares
        # make the bucket float-proof), same pure-shift sub-bucket,
        # same rank rule and lower-bound estimate — bit-exact by
        # construction, not by luck.
        "q_sketch_quantiles": """
            WITH v AS (
              SELECT o_orderpriority AS grp,
                     CAST(round(o_totalprice * 100) AS BIGINT) AS v
              FROM orders
              WHERE CAST(round(o_totalprice * 100) AS BIGINT) >= 1
            ), e0 AS (
              SELECT grp, v,
                     LEAST(GREATEST(
                       CAST(floor(log2(v)) AS INTEGER), 0), 62) AS e0
              FROM v
            ), ec AS (
              SELECT grp, v,
                     CASE
                       WHEN e0 < 62
                            AND (CAST(1 AS BIGINT) << (e0 + 1)) <= v
                         THEN e0 + 1
                       WHEN (CAST(1 AS BIGINT) << e0) > v THEN e0 - 1
                       ELSE e0
                     END AS e
              FROM e0
            ), bk AS (
              SELECT grp,
                     CAST(e AS BIGINT) * 16 +
                     CASE WHEN e >= 4
                          THEN (v - (CAST(1 AS BIGINT) << e)) >> (e - 4)
                          ELSE (v - (CAST(1 AS BIGINT) << e)) << (4 - e)
                     END AS bucket
              FROM ec
            ), sk AS (
              SELECT grp, bucket, COUNT(*) AS cnt FROM bk GROUP BY 1, 2
            ), cum AS (
              SELECT grp, bucket,
                     SUM(cnt) OVER (PARTITION BY grp
                                    ORDER BY bucket) AS cu,
                     SUM(cnt) OVER (PARTITION BY grp) AS n
              FROM sk
            ), qs AS (
              SELECT unnest([500, 900, 990]) AS q_permille
            ), picked AS (
              SELECT grp, q_permille, MIN(bucket) AS b,
                     CAST(MAX(n) AS BIGINT) AS n
              FROM cum, qs
              WHERE cu >= (q_permille * n + 999) // 1000
              GROUP BY 1, 2
            )
            SELECT grp AS o_orderpriority,
                   CAST(q_permille AS INTEGER) AS q_permille,
                   CAST((CAST(1 AS BIGINT) << CAST(b // 16 AS INTEGER)) +
                        CASE WHEN b // 16 >= 4
                             THEN (b % 16) << CAST(b // 16 - 4 AS INTEGER)
                             ELSE (b % 16) >> CAST(4 - b // 16 AS INTEGER)
                        END AS BIGINT) AS est,
                   n
            FROM picked
        """,
        # Rebuilds both DSIR distributions and every document weight
        # from raw text: positional lateral unnest for the bigrams
        # (vs Spark's shifted-array transform), DuckDB's own hex→int
        # cast for the feature bucket, per-ln-term micro rounding so
        # the cross-bucket sum is integer on both engines.
        "q_dsir": """
            WITH d AS (
              SELECT doc_id, lang = 'en' AS is_t,
                     list_filter(string_split(
                       lower(regexp_replace(trim(text), '\\s+', ' ', 'g')),
                       ' '), x -> x <> '') AS ws
              FROM documents
            ), feats AS (
              SELECT doc_id, is_t,
                     CAST('0x' ||
                          substr(md5(ws[i] || ' ' || ws[i + 1]), 1, 8)
                          AS BIGINT) % 512 AS b
              FROM d, LATERAL (
                SELECT unnest(generate_series(1, len(ws) - 1)) AS i) s
              WHERE len(ws) >= 2
            ), bc AS (
              SELECT b, COUNT(*) AS cr,
                     SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS ct
              FROM feats GROUP BY b
            ), tot AS (
              SELECT CAST(SUM(cr) AS DOUBLE) AS tr,
                     CAST(SUM(ct) AS DOUBLE) AS tt
              FROM bc
            ), ratios AS (
              SELECT b,
                     CAST(round(ln((ct + 1.0) / (tt + 512)) * 1e6)
                          AS BIGINT)
                     - CAST(round(ln((cr + 1.0) / (tr + 512)) * 1e6)
                            AS BIGINT) AS lr
              FROM bc, tot
            )
            SELECT f.doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_feats,
                   CAST(SUM(r.lr) AS BIGINT) AS logw_micros,
                   CAST(SUM(r.lr) AS BIGINT) > 0 AS selected
            FROM feats f JOIN ratios r USING (b)
            GROUP BY f.doc_id
        """,
        # Naive Bayes quality classifier: class-conditional counts,
        # totals, vocabulary size, add-1 log terms (each rounded to
        # micros BEFORE the per-doc sum), doc prior, and every score
        # rebuilt from raw text + the same weak-label rule.
        "q_nb_quality": """
            WITH d AS (
              SELECT doc_id,
                     CASE WHEN source IN ('src0','src1','src2','src3')
                          THEN 1 ELSE 0 END AS y,
                     lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))
                       AS t
              FROM documents
            ), words AS (
              SELECT doc_id, y, unnest(string_split(t, ' ')) AS w FROM d
            ), words2 AS (
              SELECT doc_id, y, w FROM words WHERE w <> ''
            ), counts AS (
              SELECT w, CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(y) AS BIGINT) AS c_pos
              FROM words2 GROUP BY w
            ), tot AS (
              SELECT CAST(SUM(c_pos) AS BIGINT) AS t_pos,
                     CAST(SUM(n - c_pos) AS BIGINT) AS t_neg,
                     CAST(COUNT(*) AS BIGINT) AS v
              FROM counts
            ), model AS (
              SELECT w,
                     CAST(round(ln((c_pos + 1)
                                   / CAST(t_pos + v AS DOUBLE)) * 1000000)
                          AS BIGINT)
                   - CAST(round(ln((n - c_pos + 1)
                                   / CAST(t_neg + v AS DOUBLE)) * 1000000)
                          AS BIGINT) AS llr_micros
              FROM counts, tot
            ), prior AS (
              SELECT CAST(round(ln((SUM(y) + 1)
                                   / CAST(SUM(1 - y) + 1 AS DOUBLE))
                                * 1000000) AS BIGINT) AS prior_micros
              FROM d
            ), score AS (
              SELECT s.doc_id,
                     CAST(COUNT(*) AS BIGINT) AS n_toks,
                     CAST(SUM(m.llr_micros) AS BIGINT) AS llr_sum_micros
              FROM words2 s JOIN model m USING (w)
              GROUP BY s.doc_id
            )
            SELECT doc_id, n_toks, llr_sum_micros,
                   CAST(llr_sum_micros + p.prior_micros AS BIGINT)
                     AS score_micros,
                   CAST(CASE WHEN llr_sum_micros + p.prior_micros > 0
                             THEN 1 ELSE 0 END AS INT) AS pred
            FROM score CROSS JOIN prior p
        """,
        # Gazetteer mentions: unigram + bigram candidates re-derived
        # with a positional lateral unnest, joined to the VALUES
        # dictionary generated from the SAME Python list as the Spark
        # query (a unigram never contains a space, so string equality
        # alone cannot cross arities).
        "q_gazetteer": f"""
            WITH tok AS (
              SELECT doc_id,
                     list_filter(string_split(
                       lower(regexp_replace(trim(text), '\\s+', ' ', 'g')),
                       ' '), x -> x <> '') AS arr
              FROM documents
            ), uni AS (
              SELECT doc_id, unnest(arr) AS g FROM tok
            ), bi AS (
              SELECT doc_id, arr[i.x] || ' ' || arr[i.x + 1] AS g
              FROM tok, LATERAL (
                SELECT unnest(range(1, len(arr))) AS x) i
            ), cand AS (
              SELECT doc_id, g FROM uni
              UNION ALL SELECT doc_id, g FROM bi
            ), dict(entity) AS (
              VALUES {", ".join("('" + e + "')" for e in _GAZETTEER)}
            )
            SELECT c.doc_id, d.entity,
                   CAST(COUNT(*) AS BIGINT) AS n_mentions
            FROM cand c JOIN dict d ON c.g = d.entity
            GROUP BY c.doc_id, d.entity
        """,
        # PMI collocations: unigram + adjacent-pair counts, the pinned
        # double parenthesization of the PMI argument, micro rounding,
        # min-count guard and (pmi DESC, a, b) cut all replayed.
        "q_collocations": """
            WITH tok AS (
              SELECT list_filter(string_split(
                       lower(regexp_replace(trim(text), '\\s+', ' ', 'g')),
                       ' '), x -> x <> '') AS arr
              FROM documents
            ), words AS (
              SELECT unnest(arr) AS w FROM tok
            ), uc AS (
              SELECT w, CAST(COUNT(*) AS BIGINT) AS c_w
              FROM words GROUP BY w
            ), pairs AS (
              SELECT arr[i.x] AS a, arr[i.x + 1] AS b
              FROM tok, LATERAL (
                SELECT unnest(range(1, len(arr))) AS x) i
            ), pc AS (
              SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n_pair
              FROM pairs GROUP BY a, b
            ), tot AS (
              SELECT (SELECT CAST(SUM(c_w) AS BIGINT) FROM uc) AS n_toks,
                     (SELECT CAST(SUM(n_pair) AS BIGINT) FROM pc) AS n_pairs
            )
            SELECT pc.a, pc.b, pc.n_pair,
                   CAST(round(ln(
                     ((CAST(pc.n_pair AS DOUBLE) * CAST(t.n_toks AS DOUBLE))
                        / CAST(t.n_pairs AS DOUBLE))
                     * (CAST(t.n_toks AS DOUBLE)
                        / (CAST(ua.c_w AS DOUBLE) * CAST(ub.c_w AS DOUBLE)))
                   ) * 1000000) AS BIGINT) AS pmi_micros
            FROM pc
            JOIN uc ua ON pc.a = ua.w
            JOIN uc ub ON pc.b = ub.w
            CROSS JOIN tot t
            WHERE pc.n_pair >= 5
            ORDER BY pmi_micros DESC, pc.a ASC, pc.b ASC
            LIMIT 40
        """,
        # CCNet buckets: the q_bigram_lm model CTEs (independent pair
        # derivation), per-lang distinct-score cumsum, the identical
        # ceil((q*n)/1000) rank rule, and the tie-promoting CASE.
        "q_ccnet": """
            WITH norm AS (
              SELECT doc_id,
                     lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t
              FROM documents
            ), tok AS (
              SELECT doc_id,
                     list_filter(string_split(t, ' '), x -> x <> '') AS arr
              FROM norm
            ), pairs AS (
              SELECT doc_id, arr[i.x] AS prev, arr[i.x + 1] AS w
              FROM tok, LATERAL (
                SELECT unnest(range(1, len(arr))) AS x
              ) i
            ), pc AS (
              SELECT prev, w, COUNT(*) AS cnt FROM pairs GROUP BY prev, w
            ), ctx AS (
              SELECT prev, SUM(cnt) AS ctx_cnt FROM pc GROUP BY prev
            ), tot AS (
              SELECT CAST(SUM(cnt) AS DOUBLE) AS total FROM pc
            ), vocab AS (
              SELECT pc.prev, pc.w,
                     CAST(round(ln(pc.cnt / ctx.ctx_cnt) * 1000000)
                          AS BIGINT) AS lp_micros
              FROM pc JOIN ctx USING (prev)
              ORDER BY pc.cnt DESC, pc.prev ASC, pc.w ASC LIMIT 32
            ), oov AS (
              SELECT CAST(round(ln(0.5 / total) * 1000000) AS BIGINT)
                       AS oov_micros
              FROM tot
            ), scores AS (
              SELECT p.doc_id,
                     CAST(floor(SUM(COALESCE(v.lp_micros, o.oov_micros))
                                / COUNT(*)) AS BIGINT) AS lp
              FROM pairs p
              LEFT JOIN vocab v ON p.prev = v.prev AND p.w = v.w
              CROSS JOIN oov o
              GROUP BY p.doc_id
            ), sl AS (
              SELECT s.doc_id, d.lang, s.lp
              FROM scores s JOIN documents d USING (doc_id)
            ), cnt AS (
              SELECT lang, lp, COUNT(*) AS c FROM sl GROUP BY lang, lp
            ), cum AS (
              SELECT lang, lp,
                     SUM(c) OVER (PARTITION BY lang ORDER BY lp) AS cum,
                     SUM(c) OVER (PARTITION BY lang) AS n
              FROM cnt
            ), cuts AS (
              SELECT lang,
                     MIN(CASE WHEN cum >= (333 * n + 999) // 1000
                              THEN lp END) AS c_lo,
                     MIN(CASE WHEN cum >= (667 * n + 999) // 1000
                              THEN lp END) AS c_hi
              FROM cum GROUP BY lang
            )
            SELECT sl.doc_id, sl.lang, sl.lp AS lp_mean_micros,
                   CASE WHEN sl.lp >= c.c_hi THEN 'head'
                        WHEN sl.lp >= c.c_lo THEN 'middle'
                        ELSE 'tail' END AS bucket
            FROM sl JOIN cuts c USING (lang)
        """,
        # Semantic decontamination: every corpus-vs-benchmark pair
        # cosine (6 dp → micros, the q_cosine_topk discipline), the
        # max / hit-count aggregates and the flag replayed.
        "q_sem_decon": """
            WITH b AS (
              SELECT embedding::DOUBLE[] AS bv FROM embeddings
              WHERE vec_id % 37 = 0
            ), c AS (
              SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
              WHERE NOT (vec_id % 37 = 0)
            ), p AS (
              SELECT c.vec_id,
                     CAST(round(round(
                       list_dot_product(c.v, b.bv)
                       / (sqrt(list_dot_product(c.v, c.v))
                          * sqrt(list_dot_product(b.bv, b.bv))), 6)
                       * 1000000) AS BIGINT) AS cm
              FROM c, b
            )
            SELECT vec_id,
                   CAST(MAX(cm) AS BIGINT) AS max_cos_micros,
                   CAST(SUM(CASE WHEN cm >= 450000 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_hits,
                   CAST(CASE WHEN MAX(cm) >= 450000 THEN 1 ELSE 0 END
                        AS INT) AS contaminated
            FROM p GROUP BY vec_id
        """,
        # Weighted-minhash signature replayed wholesale: tokenize →
        # per-(doc, word) tf capped at 8 → generate_series replicas →
        # min over md5 hex strings (fixed-width hex compare = numeric
        # compare, the q_minhash_md5 discipline).
        "q_wminhash": """
            WITH d AS (
              SELECT doc_id,
                     lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))
                       AS t
              FROM documents
            ), w AS (
              SELECT doc_id, unnest(string_split(t, ' ')) AS w FROM d
            ), wf AS (
              SELECT doc_id, w, LEAST(COUNT(*), 8) AS tf
              FROM w WHERE w <> '' GROUP BY 1, 2
            ), r AS (
              SELECT doc_id, w,
                     unnest(generate_series(1, CAST(tf AS BIGINT))) AS r
              FROM wf
            )
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_replicas,
                   MIN(md5(w || '#' || CAST(r AS VARCHAR) || '#0')) AS h0,
                   MIN(md5(w || '#' || CAST(r AS VARCHAR) || '#1')) AS h1,
                   MIN(md5(w || '#' || CAST(r AS VARCHAR) || '#2')) AS h2,
                   MIN(md5(w || '#' || CAST(r AS VARCHAR) || '#3')) AS h3
            FROM r GROUP BY doc_id
        """,
        "q_shard": """
            SELECT doc_id,
                   CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                        AS BIGINT) % 8 AS shard,
                   CAST(ROW_NUMBER() OVER (
                     PARTITION BY CAST('0x' ||
                       substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                       AS BIGINT) % 8
                     ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ) AS BIGINT) AS pos
            FROM documents
        """,
        # Both rankers replayed end-to-end (the BM25 CTE chain is the
        # q_bm25 oracle verbatim; the cosine list the q_cosine_topk
        # one), then the RRF integer arithmetic on top.
        "q_rrf_fusion": """
            WITH norm AS (
              SELECT doc_id,
                     lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t
              FROM documents
            ), words AS (
              SELECT doc_id, unnest(string_split(t, ' ')) AS w FROM norm
            ), w2 AS (
              SELECT doc_id, w FROM words WHERE w <> ''
            ), dl AS (
              SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
              FROM w2 GROUP BY doc_id
            ), stats AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                     greatest((CAST(SUM(dl) AS BIGINT) * 1000000)
                              // greatest(COUNT(*), 1), 1) AS avgdl_micros
              FROM dl
            ), tf AS (
              SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf
              FROM w2 WHERE w IN ('data', 'query', 'spark')
              GROUP BY doc_id, w
            ), idf AS (
              SELECT w,
                     CAST(round(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
                                * 1000000) AS BIGINT) AS idf_micros
              FROM (
                SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY w
              ), stats
            ), scored AS (
              SELECT tf.doc_id,
                     idf_micros * (
                       tf * 220 * 10000000000 // (
                         tf * 1000000 + 120 * (
                           250000
                           + 75 * (dl.dl * 1000000000000 // avgdl_micros)
                             // 100
                         ) // 100
                       )
                     ) // 1000000 AS s_micros
              FROM tf JOIN idf USING (w) JOIN dl USING (doc_id), stats
            ), bmtop AS (
              SELECT doc_id,
                     ROW_NUMBER() OVER (ORDER BY score_micros DESC,
                                        doc_id ASC) AS rank
              FROM (
                SELECT doc_id, SUM(s_micros) AS score_micros
                FROM scored GROUP BY doc_id
                ORDER BY score_micros DESC, doc_id ASC LIMIT 20
              )
            ), q AS (
              SELECT embedding::DOUBLE[] AS qv FROM embeddings
              WHERE vec_id = 0
            ), costop AS (
              SELECT doc_id,
                     ROW_NUMBER() OVER (ORDER BY cos DESC,
                                        doc_id ASC) AS rank
              FROM (
                SELECT e.vec_id AS doc_id,
                       round(
                         list_dot_product(e.embedding::DOUBLE[], q.qv)
                         / (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                                  e.embedding::DOUBLE[]))
                            * sqrt(list_dot_product(q.qv, q.qv))), 6)
                         AS cos
                FROM embeddings e, q
                ORDER BY cos DESC, e.vec_id LIMIT 20
              )
            ), u AS (
              SELECT doc_id, 1000000 // (60 + rank) AS c FROM bmtop
              UNION ALL
              SELECT doc_id, 1000000 // (60 + rank) AS c FROM costop
            )
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lists,
                   CAST(SUM(c) AS BIGINT) AS rrf_micros
            FROM u GROUP BY doc_id
        """,
        # Bloom decontamination replayed bit-exactly — INCLUDING the
        # deterministic false positives: set bits and the 4-way
        # membership test rebuilt from raw text with DuckDB's own
        # hex→int cast; span derivation mirrors q_span_dedup's.
        "q_bloom_decon": """
            WITH norm AS (
              SELECT doc_id,
                     lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t
              FROM documents
            ), toks AS (
              SELECT doc_id, t, string_split(t, ' ') AS w FROM norm
            ), expanded AS (
              SELECT doc_id, w,
                     unnest(generate_series(1, len(w) - 12)) AS i
              FROM toks WHERE len(w) >= 13
            ), spans AS (
              SELECT doc_id, array_to_string(w[i : i + 12], ' ') AS g
              FROM expanded
              UNION ALL
              SELECT doc_id, t AS g FROM toks WHERE len(w) < 13
            ), bits AS (
              SELECT DISTINCT
                     CAST('0x' || substr(md5(s.g || '#' ||
                          CAST(j.j AS VARCHAR)), 1, 8) AS BIGINT)
                       % 65536 AS pos
              FROM spans s, (SELECT unnest([0, 1, 2, 3]) AS j) j
              WHERE s.doc_id % 23 = 0
            ), probed AS (
              SELECT doc_id,
                CAST('0x' || substr(md5(g || '#0'), 1, 8) AS BIGINT)
                  % 65536 AS p0,
                CAST('0x' || substr(md5(g || '#1'), 1, 8) AS BIGINT)
                  % 65536 AS p1,
                CAST('0x' || substr(md5(g || '#2'), 1, 8) AS BIGINT)
                  % 65536 AS p2,
                CAST('0x' || substr(md5(g || '#3'), 1, 8) AS BIGINT)
                  % 65536 AS p3
              FROM spans
            ), flagged AS (
              SELECT doc_id,
                     CASE WHEN p0 IN (SELECT pos FROM bits)
                           AND p1 IN (SELECT pos FROM bits)
                           AND p2 IN (SELECT pos FROM bits)
                           AND p3 IN (SELECT pos FROM bits)
                          THEN 1 ELSE 0 END AS hit
              FROM probed
            )
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_spans,
                   CAST(SUM(hit) AS BIGINT) AS n_hits,
                   round(SUM(hit) / COUNT(*)::DOUBLE, 6) AS hit_frac
            FROM flagged
            GROUP BY doc_id
        """,
        # Count-min cells, probes, and the min rule all replayed; the
        # LEFT JOIN + COALESCE(0) mirrors the absent-cell-reads-zero
        # convention.
        "q_countmin": """
            WITH d AS (
              SELECT lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))
                       AS t
              FROM documents
            ), w AS (
              SELECT unnest(string_split(t, ' ')) AS w FROM d
            ), wf AS (
              SELECT w, COUNT(*) AS exact_cnt FROM w
              WHERE w <> '' GROUP BY w
            ), top AS (
              SELECT w, CAST(exact_cnt AS BIGINT) AS exact_cnt
              FROM wf ORDER BY exact_cnt DESC, w ASC LIMIT 20
            ), cells AS (
              SELECT j.j AS row,
                     CAST('0x' || substr(md5(w.w || '#' ||
                          CAST(j.j AS VARCHAR)), 1, 8) AS BIGINT)
                       % 64 AS col,
                     COUNT(*) AS cnt
              FROM w, (SELECT unnest([0, 1, 2, 3]) AS j) j
              WHERE w.w <> ''
              GROUP BY 1, 2
            ), probe AS (
              SELECT t.w, t.exact_cnt, j.j AS row,
                     CAST('0x' || substr(md5(t.w || '#' ||
                          CAST(j.j AS VARCHAR)), 1, 8) AS BIGINT)
                       % 64 AS col
              FROM top t, (SELECT unnest([0, 1, 2, 3]) AS j) j
            )
            SELECT p.w, p.exact_cnt,
                   CAST(MIN(COALESCE(c.cnt, 0)) AS BIGINT) AS cms_est
            FROM probe p LEFT JOIN cells c USING (row, col)
            GROUP BY p.w, p.exact_cnt
        """,
        # Streaming-vs-batch equivalence for the windowed HDR sketch:
        # DuckDB rebuilds the day windows, the watermark eviction cut
        # (window_end <= max(ts) - 2h over the FILTERED rows — the
        # filter precedes the watermark in the stream too), the
        # clamped/self-corrected bucket math, and the quantile
        # extraction — all from raw events.
        # Streaming count-min: day windows, the eviction cut, the md5
        # cells, the three probes and the min-with-absent-cell=0 rule
        # all rebuilt from raw events.
        "stream_countmin": f"""
            WITH ev AS (
              SELECT CAST(user_id AS VARCHAR) AS uid, ts FROM events
            ), mx AS (
              SELECT max(ts) AS mts FROM ev
            ), kept AS (
              SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                     uid
              FROM ev, mx
              WHERE date_trunc('day', ts) + INTERVAL 1 DAY
                    <= mts - INTERVAL 2 HOUR
            ), cells AS (
              SELECT day, i.r AS row,
                     CAST('0x' || substr(md5(uid || '#' ||
                          CAST(i.r AS VARCHAR)), 1, 8) AS BIGINT) % 64
                       AS col,
                     CAST(COUNT(*) AS BIGINT) AS cnt
              FROM kept, LATERAL (
                SELECT unnest(range(0, 4)) AS r) i
              GROUP BY 1, 2, 3
            ), probes AS (
              SELECT d.day, u.uid, i.r AS row,
                     CAST('0x' || substr(md5(u.uid || '#' ||
                          CAST(i.r AS VARCHAR)), 1, 8) AS BIGINT) % 64
                       AS col
              FROM (SELECT DISTINCT day FROM kept) d
              CROSS JOIN (SELECT unnest([{", ".join("'" + u + "'" for u in _CM_PROBE_UIDS)}]) AS uid) u
              CROSS JOIN (SELECT unnest(range(0, 4)) AS r) i
            )
            SELECT p.day, p.uid,
                   CAST(MIN(COALESCE(c.cnt, 0)) AS BIGINT) AS cms_est
            FROM probes p
            LEFT JOIN cells c
              ON c.day = p.day AND c.row = p.row AND c.col = p.col
            GROUP BY p.day, p.uid
            ORDER BY p.day, p.uid
        """,
        # Streaming HLL: registers, eviction cut, exact-integer
        # denominators and the estimate arithmetic all replayed from
        # raw events (the q_hll discipline, per closed day).
        "stream_hll": """
            WITH ev AS (
              SELECT CAST(user_id AS VARCHAR) AS uid, ts FROM events
            ), mx AS (
              SELECT max(ts) AS mts FROM ev
            ), kept AS (
              SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                     uid
              FROM ev, mx
              WHERE date_trunc('day', ts) + INTERVAL 1 DAY
                    <= mts - INTERVAL 2 HOUR
            ), h AS (
              SELECT day,
                     CAST('0x' || substr(md5(uid), 1, 15) AS BIGINT) AS h
              FROM kept
            ), r AS (
              SELECT day, h >> 54 AS bucket,
                     MAX(CASE WHEN (h & ((1::BIGINT << 54) - 1)) = 0
                              THEN 55
                              ELSE 55 - length(bin(h & ((1::BIGINT << 54) - 1)))
                         END) AS rho
              FROM h GROUP BY day, bucket
            ), a AS (
              SELECT day, CAST(COUNT(*) AS BIGINT) AS n_regs,
                     CAST(SUM(1::BIGINT << CAST(55 - rho AS INTEGER))
                          AS BIGINT) AS denom_used
              FROM r GROUP BY day
            ), s AS (
              SELECT day, n_regs,
                     CAST(64 - n_regs AS BIGINT) AS zero_regs,
                     CAST(denom_used + (64 - n_regs) * (1::BIGINT << 55)
                          AS BIGINT) AS denom
              FROM a
            ), e AS (
              SELECT day, n_regs, zero_regs, denom,
                     CAST(0.709 AS DOUBLE) * 64.0 * 64.0
                       * 36028797018963968.0 / denom AS raw
              FROM s
            )
            SELECT day, n_regs, zero_regs, denom,
                   CAST(round(CASE WHEN raw <= 160.0 AND zero_regs > 0
                                   THEN 64.0 * ln(64.0 / zero_regs)
                                   ELSE raw END, 0) AS BIGINT) AS hll_est
            FROM e ORDER BY day
        """,
        "stream_quantiles": """
            WITH ev AS (
              SELECT event_type, ts,
                     CAST(round(value * 100) AS BIGINT) AS v
              FROM events
              WHERE CAST(round(value * 100) AS BIGINT) >= 1
            ), mx AS (
              SELECT max(ts) AS mts FROM ev
            ), kept AS (
              SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                     event_type, v
              FROM ev, mx
              WHERE date_trunc('day', ts) + INTERVAL 1 DAY
                    <= mts - INTERVAL 2 HOUR
            ), e0 AS (
              SELECT day, event_type, v,
                     LEAST(GREATEST(
                       CAST(floor(log2(v)) AS INTEGER), 0), 62) AS e0
              FROM kept
            ), ec AS (
              SELECT day, event_type, v,
                     CASE
                       WHEN e0 < 62
                            AND (CAST(1 AS BIGINT) << (e0 + 1)) <= v
                         THEN e0 + 1
                       WHEN (CAST(1 AS BIGINT) << e0) > v THEN e0 - 1
                       ELSE e0
                     END AS e
              FROM e0
            ), bk AS (
              SELECT day, event_type,
                     CAST(e AS BIGINT) * 16 +
                     CASE WHEN e >= 4
                          THEN (v - (CAST(1 AS BIGINT) << e)) >> (e - 4)
                          ELSE (v - (CAST(1 AS BIGINT) << e)) << (4 - e)
                     END AS bucket
              FROM ec
            ), sk AS (
              SELECT day, event_type, bucket, COUNT(*) AS cnt
              FROM bk GROUP BY 1, 2, 3
            ), cum AS (
              SELECT day, event_type, bucket,
                     SUM(cnt) OVER (PARTITION BY day, event_type
                                    ORDER BY bucket) AS cu,
                     SUM(cnt) OVER (PARTITION BY day, event_type) AS n
              FROM sk
            ), qs AS (
              SELECT unnest([500, 950]) AS q_permille
            ), picked AS (
              SELECT day, event_type, q_permille, MIN(bucket) AS b,
                     CAST(MAX(n) AS BIGINT) AS n
              FROM cum, qs
              WHERE cu >= (q_permille * n + 999) // 1000
              GROUP BY 1, 2, 3
            )
            SELECT day, event_type,
                   CAST(q_permille AS INTEGER) AS q_permille,
                   CAST((CAST(1 AS BIGINT) << CAST(b // 16 AS INTEGER)) +
                        CASE WHEN b // 16 >= 4
                             THEN (b % 16) << CAST(b // 16 - 4 AS INTEGER)
                             ELSE (b % 16) >> CAST(4 - b // 16 AS INTEGER)
                        END AS BIGINT) AS est,
                   n
            FROM picked
        """,
        "q_bpe_train": _bpe_oracle_sql(BPE_MERGES),
        # bpe_words recomputed from raw text with the identical
        # Java-whitespace rule (the class is embedded as RAW control
        # characters, so both engines see the same bytes); bpe_tokens
        # re-aggregated from the materialized per-doc counts.
        "q_bpe_tokenize": f"""
            WITH m AS (
              SELECT doc_id, bpe_tokens
              FROM read_parquet(
                '{ORACLE_DIR}/sf0.01/bpe_tokenized/*.parquet')
            )
            SELECT d.doc_id,
                   CAST(CASE WHEN d.text IS NULL
                               OR length(trim(d.text, ' \t\n\x0b\f\r')) = 0
                             THEN 0
                        ELSE len(regexp_split_to_array(
                               trim(d.text, ' \t\n\x0b\f\r'),
                               '[ \t\n\x0b\f\r]+'))
                        END AS BIGINT) AS bpe_words,
                   m.bpe_tokens
            FROM documents d JOIN m USING (doc_id)
            ORDER BY doc_id
        """,
        # The two-level prefix sum must equal the plain global window
        # cumsum it decomposes; same token rule as q_token_stats.
        "q_pack_sequences": """
            WITH counted AS (
              SELECT doc_id,
                     CAST(CASE WHEN text IS NULL OR length(trim(text)) = 0
                               THEN 0
                               ELSE len(regexp_split_to_array(trim(text),
                                                              '\\s+'))
                          END AS BIGINT) AS n_tokens
              FROM documents
            ), cum AS (
              SELECT doc_id, n_tokens,
                     CAST(COALESCE(SUM(n_tokens) OVER (
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0) AS BIGINT) AS tok_offset
              FROM counted
            )
            SELECT doc_id, n_tokens, tok_offset,
                   tok_offset // 2048 AS seq_first,
                   greatest(tok_offset, tok_offset + n_tokens - 1) // 2048
                     AS seq_last
            FROM cum
        """,
        # Gaps-and-islands replay of Spark's native session_window:
        # a new island when the inter-event gap >= 30 min (an event at
        # exactly start+gap starts a NEW session); end = last + 30 min.
        "q_session_window": """
            WITH ordered AS (
              SELECT user_id, ts,
                     CASE WHEN ts - lag(ts) OVER (
                            PARTITION BY user_id ORDER BY ts
                          ) >= INTERVAL 30 MINUTE
                          OR lag(ts) OVER (
                            PARTITION BY user_id ORDER BY ts
                          ) IS NULL
                          THEN 1 ELSE 0 END AS boundary
              FROM events
            ), islands AS (
              SELECT user_id, ts,
                     SUM(boundary) OVER (
                       PARTITION BY user_id ORDER BY ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                     ) AS island
              FROM ordered
            )
            SELECT user_id,
                   strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS sess_start,
                   strftime(MAX(ts) + INTERVAL 30 MINUTE,
                            '%Y-%m-%d %H:%M:%S.%f') AS sess_end,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM islands
            GROUP BY user_id, island
        """,
        # Same islands rebuild as q_session_window, PLUS the streaming
        # eviction cut: only sessions whose end (last + 30 min) is at
        # or before the final watermark max(ts) - 2 h were emitted
        # (boundary included — pinned empirically).
        # Streaming-vs-batch equivalence for near-dup suppression:
        # the stream feeds id-ordered slices, so "best earlier doc"
        # is brute-forceable as min (hamming, then id) over all
        # smaller-id docs within Hamming 3 — from signatures
        # materialized by an independent BATCH run of the same UDF.
        "stream_near_dups": f"""
            WITH s AS (
              SELECT doc_id, simhash
              FROM read_parquet(
                '{ORACLE_DIR}/sf0.01/stream_simhash_sigs/*.parquet')
            ), pairs AS (
              SELECT b.doc_id AS doc_id, a.doc_id AS dup_of,
                     CAST(bit_count(xor(a.simhash, b.simhash))
                          AS INTEGER) AS hamming
              FROM s a JOIN s b ON a.doc_id < b.doc_id
              WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
            ), ranked AS (
              SELECT doc_id, dup_of, hamming,
                     row_number() OVER (PARTITION BY doc_id
                                        ORDER BY hamming, dup_of) AS rn
              FROM pairs
            )
            SELECT doc_id, CAST(dup_of AS BIGINT) AS dup_of, hamming
            FROM ranked WHERE rn = 1 ORDER BY doc_id
        """,
        "stream_sessions": """
            WITH ordered AS (
              SELECT user_id, ts,
                     CASE WHEN ts - lag(ts) OVER (
                            PARTITION BY user_id ORDER BY ts
                          ) >= INTERVAL 30 MINUTE
                          OR lag(ts) OVER (
                            PARTITION BY user_id ORDER BY ts
                          ) IS NULL
                          THEN 1 ELSE 0 END AS boundary
              FROM events
            ), islands AS (
              SELECT user_id, ts,
                     SUM(boundary) OVER (
                       PARTITION BY user_id ORDER BY ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                     ) AS island
              FROM ordered
            ), sess AS (
              SELECT user_id,
                     MIN(ts) AS s,
                     MAX(ts) + INTERVAL 30 MINUTE AS e,
                     CAST(COUNT(*) AS BIGINT) AS n_events
              FROM islands
              GROUP BY user_id, island
            )
            SELECT user_id,
                   strftime(s, '%Y-%m-%d %H:%M:%S.%f') AS sess_start,
                   strftime(e, '%Y-%m-%d %H:%M:%S.%f') AS sess_end,
                   n_events
            FROM sess
            WHERE e <= (SELECT MAX(ts) FROM events) - INTERVAL 2 HOUR
        """,
        "q_fact_fusion": _fusion_oracle_sql(n_iter=3, final="winners"),
        "q_source_trust": _fusion_oracle_sql(n_iter=3, final="trust"),
        "q_owl_entail": _owl_oracle_sql(n_rounds=6),
        # negated property set: both components as NOT-IN scans,
        # DISTINCT + full-order LIMIT for a unique cut
        "q_sparql_npath": f"""
            WITH t AS (
              SELECT s, p, o
              FROM read_parquet('{ORACLE_DIR}/sf0.01/triples/*.parquet')
            ), u AS (
              SELECT s AS x, o AS y FROM t
              WHERE p NOT IN ('http://schema.org/name',
                              'http://schema.org/relatedLink')
              UNION ALL
              SELECT o AS x, s AS y FROM t
              WHERE p NOT IN ('http://schema.org/author')
            )
            SELECT DISTINCT x, y FROM u ORDER BY x, y LIMIT 600
        """,
        # SPARQL subselect: the inner grouped aggregate as a plain
        # subquery joined on the projected variable.
        "q_sparql_subselect": f"""
            WITH t AS (
              SELECT s, p, o
              FROM read_parquet('{ORACLE_DIR}/sf0.01/triples/*.parquet')
            ), sub AS (
              SELECT s AS x, CAST(COUNT(o) AS BIGINT) AS n
              FROM t WHERE p = 'http://schema.org/relatedLink'
              GROUP BY s
            )
            SELECT nm.s AS x, nm.o AS name, sub.n
            FROM t nm JOIN sub ON sub.x = nm.s
            WHERE nm.p = 'http://schema.org/name'
            ORDER BY x, name LIMIT 400
        """,
        # SURT keys: the synthesis re-derived from doc_id and every
        # rule replayed with DuckDB's own string/list functions.
        "q_surt": r"""
            WITH raw AS (
              SELECT doc_id,
                CASE CAST(doc_id % 5 AS INTEGER)
                  WHEN 0 THEN 'https://WWW.Site' || (doc_id % 20)
                       || '.Example.COM/p/' || (doc_id % 100)
                       || '?b=' || (doc_id % 9) || '&a=1'
                  WHEN 1 THEN 'http://site' || (doc_id % 20)
                       || '.example.com:80/p/' || (doc_id % 100)
                  WHEN 2 THEN 'https://site' || (doc_id % 20)
                       || '.example.com:8443/P/' || (doc_id % 100)
                       || '#frag'
                  WHEN 3 THEN 'http://www2.files.site' || (doc_id % 20)
                       || '.example.net'
                  ELSE 'relative/path/' || (doc_id % 100)
                END AS url
              FROM documents
            ), parts AS (
              SELECT doc_id, url,
                lower(regexp_extract(url,
                  '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
                lower(regexp_extract(url,
                  '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS hp,
                regexp_extract(url,
                  '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS pth,
                regexp_extract(url, '\?([^#]*)', 1) AS qry
              FROM raw
            ), norm AS (
              SELECT doc_id, url, scheme,
                regexp_replace(regexp_extract(hp, '^([^:]*)', 1),
                               '^www[0-9]*\.', '') AS host,
                CASE WHEN (scheme = 'http'
                           AND regexp_extract(hp, ':([0-9]+)$', 1) = '80')
                       OR (scheme = 'https'
                           AND regexp_extract(hp, ':([0-9]+)$', 1) = '443')
                     THEN ''
                     ELSE regexp_extract(hp, ':([0-9]+)$', 1) END AS port,
                CASE WHEN pth = '' THEN '/' ELSE pth END AS pth,
                qry
              FROM parts
            )
            SELECT doc_id, url,
              CASE WHEN scheme = '' THEN NULL
                ELSE array_to_string(list_reverse(string_split(host, '.')),
                                     ',')
                  || CASE WHEN port = '' THEN '' ELSE ':' || port END
                  || ')' || pth
                  || CASE WHEN qry = '' THEN ''
                     ELSE '?' || array_to_string(
                            list_sort(string_split(qry, '&')), '&') END
              END AS surt
            FROM norm
        """,
        # CDX index: every column recomputed from the materialized
        # (url, warc_ts, html) parquet — DuckDB's own SURT chain,
        # strftime, md5, octet_length. Row order is not compared
        # (the driver sorts), only the exact row set.
        "q_cdx": f"""
            WITH p AS (
              SELECT url, warc_ts, html
              FROM read_parquet('{ORACLE_DIR}/sf0.01/warc_src/*.parquet')
            ), parts AS (
              SELECT url, warc_ts, html,
                lower(regexp_extract(url,
                  '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
                lower(regexp_extract(url,
                  '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS hp,
                regexp_extract(url,
                  '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS pth,
                regexp_extract(url, '\\?([^#]*)', 1) AS qry
              FROM p
            ), norm AS (
              SELECT url, warc_ts, html, scheme,
                regexp_replace(regexp_extract(hp, '^([^:]*)', 1),
                               '^www[0-9]*\\.', '') AS host,
                CASE WHEN (scheme = 'http'
                           AND regexp_extract(hp, ':([0-9]+)$', 1) = '80')
                       OR (scheme = 'https'
                           AND regexp_extract(hp, ':([0-9]+)$', 1) = '443')
                     THEN ''
                     ELSE regexp_extract(hp, ':([0-9]+)$', 1) END AS port,
                CASE WHEN pth = '' THEN '/' ELSE pth END AS pth,
                qry
              FROM parts
            )
            SELECT
              array_to_string(list_reverse(string_split(host, '.')), ',')
                || CASE WHEN port = '' THEN '' ELSE ':' || port END
                || ')' || pth
                || CASE WHEN qry = '' THEN ''
                   ELSE '?' || array_to_string(
                          list_sort(string_split(qry, '&')), '&') END
                AS surt,
              strftime(warc_ts, '%Y%m%d%H%M%S') AS ts,
              url,
              md5(decode(html)) AS digest,
              CAST(octet_length(html) AS BIGINT) AS length
            FROM norm
            WHERE scheme <> ''
        """,
        # Redirect resolution: hop-at-a-time recursive CTE bounded at
        # max_hops — a structurally different formulation than the
        # Spark pointer doubling; terminal states must coincide.
        "q_redirects": """
            WITH RECURSIVE raw AS (
              SELECT 'u' || CAST(doc_id % 311 AS VARCHAR) AS src,
                     'u' || CAST((doc_id % 311) // 2 AS VARCHAR) AS dst
              FROM documents WHERE doc_id % 311 > 0
              UNION ALL
              SELECT 'c' || CAST(doc_id % 13 AS VARCHAR),
                     'c' || CAST((doc_id % 13 + 1) % 13 AS VARCHAR)
              FROM documents
              UNION ALL
              SELECT 'm' || CAST(doc_id % 5 AS VARCHAR),
                     CASE WHEN doc_id % 2 = 0
                          THEN 'u' || CAST(doc_id % 5 AS VARCHAR)
                          ELSE 't' || CAST(doc_id % 5 AS VARCHAR) END
              FROM documents
            ), edges AS (
              SELECT src, MIN(dst) AS dst FROM raw GROUP BY src
            ), walk(src, cur, dist) AS (
              SELECT src, dst, 1 FROM edges
              UNION ALL
              SELECT w.src, e.dst, w.dist + 1
              FROM walk w JOIN edges e ON e.src = w.cur
              WHERE w.dist < 20
            ), resolved AS (
              SELECT w.src, w.cur AS final, CAST(w.dist AS BIGINT) AS hops
              FROM walk w
              LEFT JOIN edges e ON e.src = w.cur
              WHERE e.src IS NULL
            )
            SELECT s.src,
                   COALESCE(r.final, '') AS final,
                   CAST(COALESCE(r.hops, -1) AS BIGINT) AS hops,
                   CASE WHEN r.src IS NULL THEN 'unresolved'
                        ELSE 'ok' END AS status
            FROM (SELECT DISTINCT src FROM edges) s
            LEFT JOIN resolved r ON r.src = s.src
        """,
    }

__all__ = ['oracle_sql']
