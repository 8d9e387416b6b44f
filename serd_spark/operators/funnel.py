"""Ordered-step funnel analysis over an event stream — "how many
users completed view → click → purchase, in order, and when".

Semantics are the chained-earliest rule used by the analytics-DB
funnel operators (ClickHouse ``windowFunnel``, Amplitude funnels):
``t1`` is the user's earliest step-1 event, ``t2`` the earliest
step-2 event STRICTLY after ``t1``, and so on. Chained-earliest is
identical to a greedy scan of the user's events in time order, and —
unlike "any subsequence" matching — is expressible as plain nested
min/filter logic on BOTH engines, so the DuckDB oracle can replay it
with three chained aggregate CTEs.

Plan shape at 100 TB: filter to the funnel's event types (pushed to
the scan — typically a small fraction of the stream), ONE shuffle to
group by user, then the per-user chain is computed row-locally over
the collected (ts, step) array. No joins, no windows, no second pass
over the event table; the alternative 3-chained-aggregation
formulation shuffles the event table once per step. Per-user arrays
are bounded by per-user event counts over the funnel types; a
pathological power user is one fat row, not a skewed join.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user funnel completion: ``(user_col, steps_completed,
    t_1 .. t_len(steps))`` where ``t_k`` is the chained-earliest
    timestamp of step ``k`` (null once the chain breaks) and
    ``steps_completed`` counts the non-null prefix.

    Strictly-after chaining: ``t_k > t_{k-1}``; two steps sharing a
    timestamp do NOT advance the funnel (tie rule pinned so the
    cross-engine mirror is exact).
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    step_idx = {s: k for k, s in enumerate(steps)}
    if len(step_idx) != len(steps):
        raise ValueError("steps must be distinct")

    idx = F.lit(None).cast("int")
    for s, k in step_idx.items():
        idx = F.when(F.col(type_col) == s, F.lit(k)).otherwise(idx)

    grouped = (
        events.filter(F.col(type_col).isin(list(steps)))
        .select(
            F.col(user_col),
            F.struct(
                F.col(ts_col).alias("ts"), idx.alias("k")
            ).alias("ev"),
        )
        .groupBy(user_col)
        .agg(F.collect_list("ev").alias("evs"))
    )

    def earliest(k: int, after: Column | None) -> Column:
        # min ts among events of step k (strictly after `after`);
        # row-local array scan — interpreted HOF, but over one
        # user's events, never the corpus.
        cond = lambda e: e["k"] == F.lit(k)  # noqa: E731
        if after is not None:
            prev = after
            cond = lambda e: (e["k"] == F.lit(k)) & (  # noqa: E731
                e["ts"] > prev
            )
        return F.array_min(
            F.transform(F.filter(F.col("evs"), cond), lambda e: e["ts"])
        )

    out = grouped
    prev_col: Column | None = None
    for k in range(len(steps)):
        out = out.withColumn(f"t_{k + 1}", earliest(k, prev_col))
        prev_col = F.col(f"t_{k + 1}")

    completed = F.lit(0).cast("int")
    # non-null prefix length: t_k is null ⇒ t_{k+1} null by chaining
    for k in range(len(steps)):
        completed = F.when(
            F.col(f"t_{k + 1}").isNotNull(), F.lit(k + 1)
        ).otherwise(completed)

    return out.select(
        user_col,
        completed.alias("steps_completed"),
        *[f"t_{k + 1}" for k in range(len(steps))],
    )
