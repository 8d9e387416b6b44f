"""KG snapshot diff — set-level delta between two triple tables
(the incremental-maintenance primitive: what did this crawl add to /
remove from the graph?).

Semantics are set difference on the statement identity
``(g, s, p, o, o_kind, o_dt, o_lang)``: a statement is *added* when
the new snapshot contains it and the old one doesn't, *removed* for
the converse; multiplicity (the same statement extracted from many
documents) never shows up in a diff. ``s_kind`` is implied by the
``s`` spelling (blank labels are ``_:``-free strings only for
``s_kind=2``; IRIs otherwise) and carried along via ``max`` for the
output rows.

Plan shape at 100 TB: tag each side, union, ONE hash aggregate on
the statement key computing per-side presence flags (map-side
combine collapses per-document duplicates before the shuffle), then
a codegen filter keeps only asymmetric rows. No join, no distinct
pre-passes (the groupBy IS the distinct — the dropped-distinct
discipline from CLAUDE.md), no driver-side state. Snapshots land
co-partitioned if both sides come from the same bucketed triple
store, in which case AQE sees a shuffle-free aggregate.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KEY_COLS: tuple[str, ...] = (
    "g", "s", "p", "o", "o_kind", "o_dt", "o_lang"
)


def triple_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str] = KEY_COLS,
) -> DataFrame:
    """Asymmetric statements between ``old`` and ``new`` triple
    tables: one row per statement present in exactly one side, with
    ``change ∈ {'added', 'removed'}`` (added = new-only)."""
    keys = list(keys)
    o = old.select(*keys).withColumn("_o", F.lit(1)).withColumn(
        "_n", F.lit(0)
    )
    n = new.select(*keys).withColumn("_o", F.lit(0)).withColumn(
        "_n", F.lit(1)
    )
    merged = (
        o.unionByName(n)
        .groupBy(*keys)
        .agg(F.max("_o").alias("_o"), F.max("_n").alias("_n"))
    )
    return (
        merged.filter(F.col("_o") != F.col("_n"))
        .withColumn(
            "change",
            F.when(F.col("_n") == 1, F.lit("added")).otherwise(
                F.lit("removed")
            ),
        )
        .drop("_o", "_n")
    )
