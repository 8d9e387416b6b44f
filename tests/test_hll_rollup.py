"""HLL grouped sketch + register-max merge (operators/stats.py):
the merge law — sketches built over ANY partitioning of the rows
merge to exactly the direct sketch's register table."""

from pyspark.sql import functions as F

from serd_spark.operators.stats import hll_estimate, hll_merge, hll_sketch


def test_merge_of_grouped_sketches_equals_direct(spark):
    df = spark.range(0, 3000).select(
        (F.col("id") % 7).cast("string").alias("grp"),
        # ~600 distinct values, repeated across groups
        F.concat(F.lit("v"), (F.col("id") % 601)).alias("v"),
    )
    grouped = hll_sketch(df, "v", p=6, by=("grp",))
    merged = hll_merge(grouped)
    direct = hll_sketch(df, "v", p=6)
    m = {(r["bucket"], r["rho"]) for r in merged.collect()}
    d = {(r["bucket"], r["rho"]) for r in direct.collect()}
    assert m == d and len(d) > 10

    est_m = hll_estimate(merged, p=6).collect()[0]
    est_d = hll_estimate(direct, p=6).collect()[0]
    assert est_m["hll_est"] == est_d["hll_est"]
    # estimate should be in the right ballpark for 601 distinct
    assert 450 <= est_m["hll_est"] <= 750


def test_grouped_estimate_one_row_per_group(spark):
    df = spark.range(0, 500).select(
        (F.col("id") % 3).cast("string").alias("grp"),
        F.col("id").cast("string").alias("v"),
    )
    out = hll_estimate(
        hll_sketch(df, "v", p=6, by=("grp",)), p=6, by=("grp",)
    )
    rows = {r["grp"]: r["hll_est"] for r in out.collect()}
    assert set(rows) == {"0", "1", "2"}
    for est in rows.values():
        # each group holds ~167 distinct values
        assert 120 <= est <= 220
