"""URL frontier / recrawl scheduling — turns the crawl fetch log into
the next crawl round's per-host FIFO queues (the scheduler beside
corpus.crawl_stats' roll-up and robots.py's compliance gate).

Two classic pieces, both in exact integer-seconds arithmetic:

1. **Adaptive revisit interval** (Cho & Garcia-Molina's uniform
   change-rate estimator, simplified to integers): a URL observed
   ``n`` times with ``v`` distinct content versions changed ``v-1``
   times over ``n-1`` revisit gaps, so the estimated stable gap is
   ``(n-1) // max(1, v-1)`` base intervals — clamped to
   [min_interval, max_interval]; a URL seen once gets min_interval
   (no evidence yet → check soon).

2. **Exact per-host politeness queue**: fetches within a host are
   serialized ``delay`` seconds apart, each no earlier than its due
   time — the recurrence t_i = max(due_i, t_{i-1} + delay) over the
   host's queue ordered by (due, url). That recurrence LOOKS
   sequential but unrolls to
   t_i = delay*i + max_{j<=i}(due_j - delay*j),
   a RUNNING MAX — one window over (host) ordered by (due, url),
   no iteration, no UDF. (Unrolling: t_i - delay*i =
   max(due_i - delay*i, t_{i-1} - delay*(i-1)) is a prefix max.)

100 TB shape: one map-side-combining hash aggregate collapses the
fetch log to per-URL rows (the only corpus-sized shuffle), then one
window shuffle keyed by host. A host's queue is inherently sequential
— real frontiers shard by host for exactly this reason — so the
per-host sort is the honest cost; there is nothing to salt without
changing the schedule. All outputs are pure integer functions of the
fetch log: deterministic, retry/layout-invariant, DuckDB-replayable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def recrawl_schedule(
    fetches: DataFrame,
    min_interval: int = 86_400,
    max_interval: int = 86_400 * 32,
    politeness_delay: int = 5,
) -> DataFrame:
    """``fetches``: (url, host, ts, version) — one row per fetch,
    ``ts`` integer epoch seconds, ``version`` any content identity
    (hash) string. Returns one row per URL: (host, url, n_fetches,
    n_versions, interval_s, next_due, slot, sched_ts)."""
    per_url = fetches.groupBy("host", "url").agg(
        F.count(F.lit(1)).alias("n_fetches"),
        F.count_distinct("version").alias("n_versions"),
        F.max("ts").alias("last_ts"),
    )
    # truncating integer DIV on both engines — never float division
    est = F.expr(
        f"CAST({min_interval} AS BIGINT) * (n_fetches - 1)"
        " DIV greatest(1, n_versions - 1)"
    )
    interval = F.when(
        F.col("n_fetches") == 1, F.lit(min_interval).cast("long")
    ).otherwise(
        F.least(
            F.lit(max_interval).cast("long"),
            F.greatest(F.lit(min_interval).cast("long"), est),
        )
    )
    due = per_url.withColumn("interval_s", interval).withColumn(
        "next_due", F.col("last_ts") + F.col("interval_s")
    )
    order = Window.partitionBy("host").orderBy("next_due", "url")
    run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    slot = (F.row_number().over(order) - F.lit(1)).cast("long")
    return (
        due.withColumn("slot", slot)
        .withColumn(
            "_adj", F.col("next_due") - F.lit(politeness_delay) * F.col("slot")
        )
        .withColumn(
            "sched_ts",
            F.lit(politeness_delay) * F.col("slot") + F.max("_adj").over(run),
        )
        .drop("last_ts", "_adj")
    )


def resolve_redirects(
    redirects: DataFrame,
    max_hops: int = 20,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Redirect-chain resolution — collapse the crawl's HTTP 3xx map
    (src → dst, one Location per fetched URL) to each source's FINAL
    destination, the canonical identity a crawler stores and a dedup
    pass keys on. Returns one row per distinct redirecting source:
    (src, final, hops, status) with status 'ok' (terminal reached in
    ≤ max_hops) or 'unresolved' (redirect loop OR chain longer than
    max_hops — crawlers abort both identically, as browsers do around
    20 hops); unresolved rows carry NULL final/hops so no fabricated
    destination leaks downstream.

    Dirty data pin: a source asserting several Locations (re-crawls
    disagreeing over time) keeps the lexicographically smallest dst —
    a deterministic choice, documented rather than engine-dependent.

    Scale shape (100 TB): pointer DOUBLING — each round joins the
    chain map with itself, so covered path length doubles per round
    and ceil(log2(max_hops)) + 1 rounds suffice for every chain the
    hop cap admits; each round is one self equi-join + localCheckpoint
    (lineage cut), the kg_linking CC discipline. Hop counts ride the
    pointers (dist_a + dist_b) so no per-hop walk ever happens; loops
    simply never terminate and fall out as 'unresolved' at the cap.
    The DuckDB oracle is a structurally different formulation — a
    hop-AT-A-TIME recursive CTE bounded at max_hops — that must land
    on identical rows."""
    import math

    edges = (
        redirects.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .where(F.col("s").isNotNull() & F.col("d").isNotNull())
        .groupBy("s")
        .agg(F.min("d").alias("d"))
        .localCheckpoint(eager=False)
    )
    # ptr: s reaches cur in dist hops, following the chain map
    ptr = edges.select("s", F.col("d").alias("cur"), F.lit(1).cast("long").alias("dist"))
    rounds = max(1, math.ceil(math.log2(max_hops)) + 1)
    for _ in range(rounds):
        b = ptr.select(
            F.col("s").alias("b_s"),
            F.col("cur").alias("b_cur"),
            F.col("dist").alias("b_dist"),
        )
        ptr = (
            ptr.join(b, ptr["cur"] == b["b_s"], "left")
            .select(
                "s",
                F.coalesce("b_cur", "cur").alias("cur"),
                (
                    F.col("dist")
                    + F.coalesce(F.col("b_dist"), F.lit(0).cast("long"))
                ).alias("dist"),
            )
            # a doubled pointer can only exceed the cap further: clamp
            # the carried distance so loop rows cannot overflow after
            # many doublings (2^rounds is fine, but the clamp keeps the
            # invariant obvious and the column small)
            .withColumn(
                "dist",
                F.least(F.col("dist"), F.lit(max_hops + 1).cast("long")),
            )
            .localCheckpoint(eager=False)
        )
    # terminal = current target has no outgoing redirect
    srcs = edges.select(F.col("s").alias("t"))
    out = ptr.join(srcs, ptr["cur"] == srcs["t"], "left").select(
        "s",
        F.col("cur"),
        "dist",
        F.col("t").isNotNull().alias("_still"),
    )
    ok = (~F.col("_still")) & (F.col("dist") <= max_hops)
    return out.select(
        F.col("s").alias("src"),
        F.when(ok, F.col("cur")).alias("final"),
        F.when(ok, F.col("dist")).alias("hops"),
        F.when(ok, F.lit("ok")).otherwise(F.lit("unresolved")).alias("status"),
    )


def apportion_budget(
    weights: DataFrame,
    total: int,
    key_col: str = "host",
    weight_col: str = "w",
    rank_blocks: int = 4096,
) -> DataFrame:
    """Exact integer apportionment of a crawl budget across hosts —
    Hamilton's largest-remainder method (the apportionment scheme
    with zero systematic size bias): host i gets
    ``base_i = (total * w_i) div W`` fetches plus one extra for the
    ``r = total - Σ base_i`` largest division remainders
    (ties broken by key ascending). Guarantees Σ alloc == total
    exactly and every alloc within 1 of the exact proportional share
    — the property a fetch planner needs so shard budgets sum to the
    fleet budget with no drift.

    All arithmetic is integer: remainders are compared as
    ``(total*w) mod W`` values directly, never as floats. The
    remainder RANK is computed with the two-level scan (packing.py
    discipline): block by remainder range, count per block, prefix
    over the tiny block table, row_number only WITHIN a block — no
    single-partition global window however many hosts there are.

    Rows with non-positive or null weight get alloc 0 (kept in the
    output — a planner needs the explicit zero). Returns
    (key_col, weight_col, alloc).
    """
    if total < 0:
        raise ValueError("total must be >= 0")
    pos = weights.select(
        F.col(key_col).alias("_k"),
        F.col(weight_col).cast("long").alias("_w"),
    ).withColumn(
        "_wp",
        F.when(F.col("_w") > 0, F.col("_w")).otherwise(F.lit(0)),
    )
    tot = pos.agg(F.sum("_wp").alias("_wtot"))
    j = pos.crossJoin(F.broadcast(tot)).select(
        "_k",
        "_w",
        "_wtot",
        F.when(
            F.col("_wtot") > 0,
            F.expr(f"({total} * _wp) div _wtot"),
        )
        .otherwise(F.lit(0))
        .alias("_base"),
        F.when(
            F.col("_wtot") > 0,
            F.expr(f"({total} * _wp) % _wtot"),
        )
        .otherwise(F.lit(0))
        .alias("_rem"),
    )
    rdf = j.agg(F.coalesce(F.sum("_base"), F.lit(0)).alias("_sb"))
    j = (
        j.crossJoin(F.broadcast(rdf))
        .withColumn(
            # W == 0 (no positive weights) must hand out NO extras
            "_r",
            F.when(
                F.col("_wtot") > 0, F.lit(int(total)) - F.col("_sb")
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "_blk", F.expr(f"_rem div greatest(1, _wtot div {rank_blocks})")
        )
    )
    blk_counts = j.groupBy("_blk").agg(F.count(F.lit(1)).alias("_bc"))
    wb = Window.orderBy(F.desc("_blk")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    blk_off = blk_counts.select(
        "_blk",
        F.coalesce(F.sum("_bc").over(wb), F.lit(0)).alias("_boff"),
    )
    wd = Window.partitionBy("_blk").orderBy(F.desc("_rem"), F.asc("_k"))
    out = (
        j.join(F.broadcast(blk_off), "_blk")
        .withColumn("_rank", F.col("_boff") + F.row_number().over(wd))
        .select(
            F.col("_k").alias(key_col),
            F.col("_w").alias(weight_col),
            (
                F.col("_base")
                + F.when(
                    F.col("_rank") <= F.col("_r"), F.lit(1)
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("alloc"),
        )
    )
    return out
