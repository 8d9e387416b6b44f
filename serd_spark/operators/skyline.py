"""Skyline (Pareto frontier) — the classic "not dominated in any
dimension" OLAP operator, for 2-D minimize/maximize criteria (e.g.
cheapest part for its size: minimize price, maximize size).

A row ``b`` is dominated iff some row ``a`` is no worse in both
dimensions and strictly better in at least one. Duplicated points
(equal in both dims) do not dominate each other — all survive, and
the DuckDB ``NOT EXISTS`` oracle states exactly that definition, so
the mirror is a fully independent formulation.

The naive plan is a window over the GLOBAL price order — a single
partition at scale. This is instead the two-level scan discipline
(``packing.pack_sequences``): fixed-width value buckets on the
minimized dimension make cross-bucket dominance a strict-price
relation, so the global step collapses to a prefix-max over the tiny
bucket table:

  1. bucket = price div W (no global sort — value buckets, not
     ntile, so the layout is deterministic and shuffle-free);
  2. per-bucket LOCAL skyline via one window partitioned by bucket:
     with rows ordered by price, a row survives locally iff its size
     strictly exceeds every strictly-cheaper row's size (RANGE frame
     to -1) and no same-price row has a strictly larger size (RANGE
     frame to CURRENT ROW folds both tests into one max);
  3. per-bucket max size → prefix max over STRICTLY earlier buckets
     (window over the bucket table — thousands of rows at 100 TB),
     broadcast back: earlier bucket ⇒ strictly cheaper, so a local
     survivor is global iff its size strictly exceeds that prefix
     max.

One hash-partitioned window shuffle + one broadcast; nothing global.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline2d(
    df: DataFrame,
    min_col: str,
    max_col: str,
    bucket_width: int,
) -> DataFrame:
    """Rows of ``df`` on the Pareto frontier for (minimize
    ``min_col``, maximize ``max_col``); both must be integer-typed
    (money as cents per the cross-engine rule). Returns the input
    rows unchanged. ``bucket_width`` is the value width of the
    coarse buckets on ``min_col`` — pick so the expected domain
    spans hundreds-to-thousands of buckets at scale.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")

    b = df.withColumn(
        "_blk", F.expr(f"{min_col} div {bucket_width}")
    )
    w_lt = (
        Window.partitionBy("_blk")
        .orderBy(min_col)
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_le = (
        Window.partitionBy("_blk")
        .orderBy(min_col)
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = (
        b.withColumn("_max_lt", F.max(max_col).over(w_lt))
        .withColumn("_max_le", F.max(max_col).over(w_le))
        .filter(
            (
                F.col("_max_lt").isNull()
                | (F.col(max_col) > F.col("_max_lt"))
            )
            & (F.col(max_col) == F.col("_max_le"))
        )
    )
    blk_max = b.groupBy("_blk").agg(F.max(max_col).alias("_bmax"))
    w_blk = Window.orderBy("_blk").rowsBetween(
        Window.unboundedPreceding, -1
    )
    blk_prefix = blk_max.select(
        "_blk", F.max("_bmax").over(w_blk).alias("_pmax")
    )
    return (
        local.join(F.broadcast(blk_prefix), "_blk")
        .filter(
            F.col("_pmax").isNull()
            | (F.col(max_col) > F.col("_pmax"))
        )
        .drop("_blk", "_max_lt", "_max_le", "_pmax")
    )
