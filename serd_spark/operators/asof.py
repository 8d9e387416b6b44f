"""Point-in-time (as-of) join — the time-series primitive Spark's
DataFrame API lacks: each left row is matched to the single latest
right row with ``right.ts <= left.ts`` within the same key.

Shape chosen for 100 TB: the naive formulation is an inequality join
(``l.key = r.key AND r.ts <= l.ts`` + argmax), which Catalyst plans as
a sort-merge join that DUPLICATES every left row once per earlier
right row — O(n·m) per key, quadratic on active keys. Instead both
sides are tagged and UNIONED, shuffled ONCE on the key, locally
sorted by (ts, side, tie), and the match is a running
``last(..., ignorenulls)`` window — O((n+m) log(n+m)) per partition,
one exchange total, no row duplication. This is the classic
union-scan formulation pandas ``merge_asof`` uses, re-expressed as a
Spark window so it distributes.

Determinism: right rows sort BEFORE left rows at equal ts (so
``<=`` includes same-instant rows), and ties among right rows at the
same (key, ts) are broken by ``tie_col`` ascending — the LAST one in
frame order (i.e. the max tie) wins, mirroring ``ORDER BY ts DESC,
tie DESC LIMIT 1``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    right_cols: list[str] | None = None,
    tie_col: str | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """For each left row, attach the latest right row at-or-before its
    timestamp with the same ``on`` key (NULLs when no right row
    precedes it).

    ``right_cols`` — right columns to carry (default: all but the key
    and timestamp), each emitted as ``<name><suffix>`` plus the match
    timestamp as ``<ts><suffix>``. ``tie_col`` — a right column that
    makes the winner unique among equal-timestamp right rows (e.g. an
    event id); REQUIRED when right may hold duplicate (key, ts) pairs,
    else the match is nondeterministic under retries/splits.

    The carried columns travel as ONE struct through the window, so
    they always come from the SAME right row — per-column
    ``last(ignorenulls)`` would tear the match whenever a later right
    row holds a NULL in one carried column but not another.
    """
    # a NULL right timestamp must never match (SQL: `r.ts <= l.ts` is
    # unknown) — without this filter NULLs sort FIRST under the
    # ascending window order and would seed last(ignorenulls) as an
    # infinitely-old row
    right = right.filter(F.col(ts).isNotNull())
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, ts)]
    carried = [ts] + [c for c in right_cols if c != ts]
    left_payload = [c for c in left.columns if c not in (on, ts)]

    tie_type = right.schema[tie_col].dataType if tie_col else None
    lhs = left.select(
        F.col(on),
        F.col(ts),
        F.lit(1).alias("_side"),
        (F.lit(None).cast(tie_type) if tie_col else F.lit(0)).alias("_tie"),
        *[F.col(c) for c in left_payload],
        F.lit(None)
        .cast(
            "struct<"
            + ",".join(f"{c}:{right.schema[c].dataType.simpleString()}" for c in carried)
            + ">"
        )
        .alias("_m"),
    )
    rhs = right.select(
        F.col(on),
        F.col(ts),
        F.lit(0).alias("_side"),
        (F.col(tie_col) if tie_col else F.lit(0)).alias("_tie"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
        F.struct(*[F.col(c) for c in carried]).alias("_m"),
    )
    # one exchange: hash on the key; the sort is per-partition, never
    # global. ROWS frame + (ts, side, tie) order => every left row's
    # frame holds exactly the right rows at-or-before it, latest last.
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).asc(), F.col("_side").asc(), F.col("_tie").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        lhs.unionByName(rhs)
        .withColumn("_m", F.last("_m", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    return out.select(
        on,
        ts,
        *left_payload,
        *[F.col(f"_m.{c}").alias(f"{c}{suffix}") for c in carried],
    )
