"""Graph materialization: subject-hash bucketing + explicit hub-entity
skew salting (``BASELINE.json:north_star`` "partitioned … triple
tables bucketed by subject hash with explicit skew-salting for hub
entities"; SURVEY.md §4.2).

Design at 10^12 documents:

- ``subj_bucket = pmod(xxhash64(s), B)`` gives subject-local storage:
  every downstream per-entity operation (entity linking candidate
  generation, star-query assembly, incremental merge) reads one
  bucket instead of the whole table, and two tables bucketed the
  same way join without a shuffle.
- hub entities (the handful of IRIs referenced by a large fraction
  of the web) would make single buckets/tasks giant. We detect them
  with one cheap aggregation (top-K by reference count — K is tiny),
  broadcast the hub set, and give hub rows a ``salt`` derived from
  the *other* columns so their rows spread over S sub-buckets.
  Non-hub rows get salt 0, so salting is a no-op for 99.99% of data.
- all columns of the salt/bucket are pure functions of row content —
  deterministic under task retries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 64
DEFAULT_SALTS = 16


def detect_hubs(triples: DataFrame, top_k: int = 64) -> DataFrame:
    """Top-K most-referenced subjects → tiny hub DataFrame (collect →
    broadcast is fine: K rows). The count agg has map-side partial
    aggregation; AQE coalesces the shuffle."""
    return (
        triples.groupBy("s")
        .agg(F.count(F.lit(1)).alias("ref_count"))
        # tie-break on s: limit() over equal counts is otherwise
        # nondeterministic across runs/retries
        .orderBy(F.desc("ref_count"), F.col("s"))
        .limit(top_k)
        .select("s", "ref_count")
    )


def bucket_and_salt(
    triples: DataFrame,
    hubs: DataFrame | None = None,
    n_buckets: int = DEFAULT_BUCKETS,
    n_salts: int = DEFAULT_SALTS,
    min_hub_refs: int = 10_000,
) -> DataFrame:
    """Add ``subj_bucket`` and ``salt`` columns.

    ``hubs`` is broadcast (tiny); subjects whose reference count
    exceeds ``min_hub_refs`` get a content-derived salt, everything
    else salt 0.
    """
    out = triples.withColumn(
        "subj_bucket",
        F.pmod(F.xxhash64(F.col("s")), F.lit(n_buckets)).cast("int"),
    )
    if hubs is None:
        return out.withColumn("salt", F.lit(0).cast("tinyint"))
    hub_set = F.broadcast(
        hubs.filter(F.col("ref_count") >= min_hub_refs).select(
            F.col("s").alias("_hub_s")
        )
    )
    out = out.join(hub_set, out["s"] == hub_set["_hub_s"], "left")
    return out.withColumn(
        "salt",
        F.when(
            F.col("_hub_s").isNotNull(),
            F.pmod(F.xxhash64("p", "o", "url"), F.lit(n_salts)).cast("tinyint"),
        ).otherwise(F.lit(0).cast("tinyint")),
    ).drop("_hub_s")


def write_triples(
    triples_with_bucket: DataFrame, path: str, mode: str = "overwrite"
) -> None:
    """Materialize: directory-partitioned by subject bucket (the
    parquet stand-in for an Iceberg bucket transform — SURVEY.md §7
    risk R4), sorted within partitions by subject so per-entity scans
    are contiguous and RLE/dictionary encoding bites."""
    (
        triples_with_bucket.repartition("subj_bucket", "salt")
        .sortWithinPartitions("s", "p", "o")
        .write.mode(mode)
        .partitionBy("subj_bucket")
        .parquet(path)
    )


def write_bucketed_table(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 16,
    path: str | None = None,
) -> None:
    """Catalog-registered Hive-style bucketed table (``bucketBy`` +
    ``sortBy`` + ``saveAsTable``): unlike the directory-bucketed
    parquet above, the bucketing METADATA lives in the catalog, so
    Spark's planner proves co-location and elides the shuffle when two
    tables bucketed on the same key with the same count are joined —
    the dominant-join killer at 100 TB (a fact table joined on its
    bucket key shuffles ZERO bytes; only the probe side's map-side
    work remains). ``path`` makes it an external table (default:
    session warehouse dir)."""
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, key)
        .sortBy(key)
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def zorder_key(x, y, bits: int = 16):
    """Morton / Z-order key of two integer columns — bit-interleaved
    so rows close in BOTH dimensions get close keys. ``bits`` low
    bits of each input are used after clamping to [0, 2^bits-1]
    (negative or overflowing values saturate, they never wrap into a
    foreign cell). The expression is a pure shift/mask fold — fully
    whole-stage-codegen, no UDF — and is mirrored verbatim by the
    DuckDB oracle (``__spark_entry__._zorder_sql_expr``)."""
    lim = F.lit((1 << bits) - 1)

    def clamp(c):
        return F.least(F.greatest(c.cast("long"), F.lit(0).cast("long")), lim)

    xs, ys = clamp(x), clamp(y)
    key = F.lit(0).cast("long")
    one = F.lit(1)
    for b in range(bits):
        key = key.bitwiseOR(
            F.shiftleft(F.shiftright(xs, b).bitwiseAND(one), 2 * b + 1)
        )
        key = key.bitwiseOR(
            F.shiftleft(F.shiftright(ys, b).bitwiseAND(one), 2 * b)
        )
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    n_files: int = 16,
    bits: int = 16,
) -> None:
    """Z-order-clustered parquet layout: range-partition on the
    Morton key, sort within partitions, write.

    Why this matters at 100 TB: parquet scans skip files/row-groups
    whose column min/max stats exclude the predicate — but a layout
    sorted by ONE column gives tight stats on that column only; every
    file spans the full range of the other, so predicates on it skip
    nothing. A contiguous Z-range is a small bounding box in BOTH
    dimensions, so point/range predicates on EITHER column prune most
    files (the Delta/Iceberg OPTIMIZE ZORDER design, built here from
    primitives: repartitionByRange → sortWithinPartitions → write).
    The key never lands in the data — layout is physical only."""
    keyed = df.withColumn("_z", zorder_key(F.col(x_col), F.col(y_col), bits))
    (
        keyed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
