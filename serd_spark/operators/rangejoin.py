"""Range (interval) join — match each left row to every right row
whose timestamp falls in a window around the left timestamp, within
the same key. The second time-series primitive Spark's DataFrame API
lacks (``operators/asof.py`` is the first): Catalyst plans
``l.key = r.key AND r.ts BETWEEN l.ts - a AND l.ts + b`` as a
sort-merge join on the key alone with the range as a post-join
filter, so every left row pairs with EVERY right row of its key
before filtering — O(n·m) per key, quadratic on active keys.

Shape chosen for 100 TB (the bucketized-equi-join formulation used
by Databricks' range-join optimization and Flink's interval join):
time is cut into buckets of exactly the window width W; a right row
can only match left rows whose window overlaps its bucket, so the
LEFT side is replicated into the ≤ 2 buckets its window spans (a
window of width W overlaps at most 2 W-aligned buckets) and joined
EQUI on (key, bucket), then refined with the exact range predicate.
The blowup is a fixed ×2 on the smaller-payload side instead of
per-key quadratic, the join is a plain hash/sort-merge equi-join
(AQE-broadcastable, skew-splittable), and the refine filter runs
inside WholeStageCodegen.

Bucket arithmetic is integer microseconds (``F.unix_micros``) with
floor division — exact, no float time anywhere, and replayable
bit-for-bit by a DuckDB mirror using ``epoch_us``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _us(col: Column) -> Column:
    """Epoch microseconds for TIMESTAMP or TIMESTAMP_NTZ columns.
    ``unix_micros`` rejects NTZ; the cast resolves it through the
    session timezone, which this repo pins to UTC (session.py), so
    naive wall-clock arithmetic and epoch arithmetic coincide."""
    return F.unix_micros(col.cast("timestamp"))


def _fdiv(x: Column, d: int) -> Column:
    """Exact floor division of a long column by a positive literal.
    ``floor(x / d)`` routes through double division, whose 2^-53
    relative error can misplace values sitting exactly on a bucket
    boundary at microsecond magnitudes (~1e15); subtracting the
    positive mod first makes the numerator divisible, so the double
    quotient is an exact integer for |x| < 2^53."""
    return ((x - F.pmod(x, F.lit(d))) / F.lit(d)).cast("long")


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    before_s: float = 0.0,
    after_s: float = 0.0,
    how: str = "inner",
) -> DataFrame:
    """Pairs (l, r) with ``l.key = r.key`` and
    ``l.ts - before_s <= r.ts <= l.ts + after_s``.

    ``before_s``/``after_s`` are seconds (fractions allowed — they are
    converted once to integer microseconds). Columns common to both
    sides other than ``on`` must be disambiguated by the caller; the
    right timestamp is emitted as ``<right_ts>_r`` if the names clash.

    ``how='inner'`` emits only matched pairs; ``'left'`` keeps
    unmatched left rows with NULL right columns (dedup of the ×2
    bucket replication happens BEFORE the outer join resolution, so
    left rows are never duplicated in the output).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    lo = int(round(before_s * 1_000_000))
    hi = int(round(after_s * 1_000_000))
    if lo + hi <= 0:
        raise ValueError("window width must be positive")
    width = lo + hi

    rts_out = f"{right_ts}_r" if right_ts in left.columns else right_ts
    r_payload = [c for c in right.columns if c not in (on, right_ts)]

    l_us = _us(F.col(left_ts))
    r_us = _us(F.col(right_ts))

    # left window [ts-lo, ts+hi] spans exactly the W-aligned buckets
    # floor((ts-lo)/W) .. floor((ts+hi)/W) — at most 2 since hi+lo=W.
    lhs = left.withColumn(
        "_b",
        F.explode(
            F.array_distinct(
                F.array(
                    _fdiv(l_us - F.lit(lo), width),
                    _fdiv(l_us + F.lit(hi), width),
                )
            )
        ),
    )
    rhs = right.select(
        F.col(on),
        _fdiv(r_us, width).alias("_b"),
        F.col(right_ts).alias(rts_out),
        *[F.col(c) for c in r_payload],
    )
    refine = (_us(F.col(rts_out)) >= l_us - F.lit(lo)) & (
        _us(F.col(rts_out)) <= l_us + F.lit(hi)
    )
    if how == "inner":
        return lhs.join(rhs, [on, "_b"]).filter(refine).drop("_b")
    # left outer: resolve matches first (inner on the replicated side,
    # so no synthetic NULL rows from the empty bucket), then re-attach
    # unmatched left rows exactly once via anti-join on the original.
    matched = lhs.join(rhs, [on, "_b"]).filter(refine).drop("_b")
    l_cols = left.columns
    # null-SAFE anti-join: with plain equality a matched left row
    # holding a NULL in any column would fail to match itself here and
    # be re-emitted as a spurious unmatched row. (Fully duplicate left
    # rows are treated as one group either way — documented.)
    m_sel = matched.select(*l_cols).distinct()
    cond = [left[c].eqNullSafe(m_sel[c]) for c in l_cols]
    unmatched = left.join(m_sel, cond, "left_anti")
    for c in [rts_out, *r_payload]:
        unmatched = unmatched.withColumn(c, F.lit(None).cast(matched.schema[c].dataType))
    return matched.unionByName(unmatched)
