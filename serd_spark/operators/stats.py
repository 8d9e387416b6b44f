"""Distributed statistics: exact `percentile_disc`-style quantiles
without a global sort, and a deterministic distinct-count sketch
(fixed-threshold hash sampling).

Spark's built-ins offer `percentile_approx` (sketch, not exact) or
`percentile` (exact but funnels values through a single aggregation
buffer per group). Neither is the shape you want on 100 TB when the
value DOMAIN is bounded (lengths, scores, integer cents): aggregate
to a (value, count) table first — the map-side combine collapses the
row count to the number of DISTINCT values — then run the rank
selection over that small table. One shuffle keyed by value, heavy
partial aggregation, and the only ordered pass is a window over
distinct values (thousands of rows), never over the data.

Semantics pinned for cross-engine replay: quantile q (permille, an
integer — no float thresholds anywhere) selects the value at
1-indexed rank ceil(q * n / 1000) of the sorted multiset, i.e. the
smallest value whose running count reaches the rank — exactly SQL's
`percentile_disc`. All arithmetic is integer, so a DuckDB mirror
replaying the same window-cumsum rule matches bit-for-bit.

For continuous domains (floats with ~n distinct values) bin or round
first — the (value, count) table is only small when the domain is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sketch_distinct(
    df: DataFrame,
    value_col: str,
    by: list[str] | None = None,
    prefix_zeros: int = 2,
) -> DataFrame:
    """Distinct-count ESTIMATE via fixed-threshold hash sampling (the
    bottom-theta / KMV family): keep a value iff its md5 hex digest
    starts with ``prefix_zeros`` zeros (a deterministic
    16^-prefix_zeros Bernoulli sample of the DISTINCT DOMAIN —
    duplicates share their value's hash, so the keep/drop decision is
    per distinct value, not per row), count the distinct survivors
    exactly, and scale back up.

    Why this shape at 100 TB: exact ``countDistinct`` shuffles every
    distinct value; the hash-prefix filter drops (1 - 16^-z) of the
    domain BEFORE the shuffle — a plain predicate, fully map-side —
    so the distinct aggregation runs over a table 16^z times smaller.
    Standard error ≈ 1/sqrt(n_kept) (binomial). Deterministic (md5 of
    the UTF-8 bytes, no RNG, retry-invariant) and exactly replayable
    in any engine with md5: comparing a fixed-width hex PREFIX equals
    comparing the hash numerically, so the DuckDB mirror is
    ``substring(md5(x), 1, z) = '00…'`` — no integer conversion to
    disagree on.

    Returns ``(*by, n_kept, distinct_est)`` with
    ``distinct_est = n_kept * 16^prefix_zeros``.
    """
    if not (1 <= prefix_zeros <= 8):
        raise ValueError("prefix_zeros must be in [1, 8]")
    by = list(by or [])
    zeros = "0" * prefix_zeros
    kept = df.filter(F.col(value_col).isNotNull()).filter(
        F.substring(
            F.md5(F.encode(F.col(value_col), "UTF-8")), 1, prefix_zeros
        )
        == zeros
    )
    scale = 16 ** prefix_zeros
    agg = kept.groupBy(*by).agg(
        F.countDistinct(value_col).alias("n_kept")
    )
    return agg.select(
        *by,
        "n_kept",
        (F.col("n_kept") * F.lit(scale)).cast("long").alias("distinct_est"),
    )


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    qs_permille: list[int],
    by: list[str] | None = None,
) -> DataFrame:
    """Exact quantiles of ``value_col``, optionally per group.

    Returns one row per (group ×) requested quantile:
    ``(*by, q_permille, value)`` where ``value`` is the smallest value
    whose cumulative count ≥ ceil(q_permille * n / 1000).

    Shape: groupBy(value) count → per-group window cumsum over the
    distinct-value table → explode the (tiny, literal) quantile list →
    min value clearing each rank. The window partitions by ``by``
    (single-partition only in the global case, where its input is the
    distinct-value table, not the data).
    """
    if not qs_permille:
        raise ValueError("qs_permille must be non-empty")
    if any(q < 1 or q > 1000 for q in qs_permille):
        raise ValueError("quantiles are integer permille in [1, 1000]")
    by = list(by or [])

    # percentile_disc ignores NULLs; without the filter a NULL group
    # would sort first and win every MIN(value) selection
    counts = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*by, value_col)
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    w = Window.partitionBy(*by).orderBy(F.col(value_col))
    cum = counts.select(
        *by,
        F.col(value_col),
        F.sum("_c").over(w).alias("_cum"),
        F.sum("_c").over(Window.partitionBy(*by)).alias("_n"),
    )
    qlit = F.explode(
        F.array(*[F.lit(int(q)) for q in sorted(set(qs_permille))])
    ).alias("q_permille")
    # rank = ceil(q*n/1000); `div` keeps it in long arithmetic (a
    # double division would lose exactness once q*n nears 2^53)
    rank = F.expr("(q_permille * _n + 999) div 1000")
    return (
        cum.select(*by, value_col, "_cum", "_n", qlit)
        .filter(F.col("_cum") >= rank)
        .groupBy(*by, "q_permille")
        .agg(F.min(value_col).alias("value"))
    )
