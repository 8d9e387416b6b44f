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
