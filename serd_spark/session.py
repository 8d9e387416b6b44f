"""SparkSession factory (SURVEY.md §7 M0).

One place for every conf that matters at 100 TB, so jobs, tests and
bench all run the same engine configuration:

- AQE on (runtime shuffle-partition coalescing, skew-join splitting
  — ``BASELINE.json:north_rule`` "AQE-managed shuffle partitioning");
- Arrow on with a pinned batch size (our Python stages are all
  Arrow-vectorized; the batch is the unit of streaming, ≙ the
  reference's 4096-byte page in spirit — SURVEY.md §1.1);
- sane local defaults that scale by core count rather than a
  hard-coded shuffle partition count.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "serd_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (all cores if
    unset) for local runs; on a real cluster the job is launched via
    ``spark-submit --py-files`` and ``master`` is left to the
    launcher.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # local mode: one shuffle partition per core keeps every core
        # busy without tiny-partition overhead. Cluster mode would
        # rely on AQE coalescing from a higher initial value.
        cpus_s = master[master.find("[") + 1 : master.find("]")] if "[" in master else "*"
        shuffle_partitions = 2 * os.cpu_count() if cpus_s == "*" else 2 * int(cpus_s)

    b = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE coalesces post-shuffle partitions by SHUFFLE BYTES, but
        # the Python stages downstream (minhash signatures, extraction
        # after latest_crawl) cost per ROW — the 1 MB default floor
        # collapses a small shuffle to 1-4 partitions and serializes
        # the UDF (measured: kg_linking 9.8 s → 4.8 s at sf0.1 with
        # the floor at 64k). At cluster scale partitions are ≫64k, so
        # this only changes small-intermediate behavior.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        # pages rows are wide (html binary): keep scan splits moderate
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if master:
        b = b.master(master)
    if extra_conf:
        for k, v in extra_conf.items():
            b = b.config(k, v)
    return b.getOrCreate()
