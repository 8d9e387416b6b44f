"""Physical-plan hygiene assertions (SURVEY.md §4): pushdown,
pruning, broadcast, partial aggregation must survive refactors —
these tests freeze the plan properties the 100 TB design relies on."""

import contextlib
import io

import pytest
from pyspark.sql import functions as F


def plan_of(df, mode="formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


@pytest.fixture(scope="module")
def sf(tmp_path_factory):
    return "/root/testdata/sf0.001"


def test_filter_pushdown_and_pruning(spark, sf):
    import __spark_entry__ as em

    p = plan_of(em.q_filter_project(spark, sf))
    assert "PushedFilters" in p and "GreaterThan(l_quantity,45.0)" in p
    read = [l for l in p.splitlines() if "ReadSchema" in l][0]
    # only referenced columns reach the scan
    assert "l_comment" not in read and "l_returnflag" not in read


def test_extraction_scan_prunes_under_udf_barrier(spark, tmp_path):
    from serd_spark.operators.extract import extract_triples
    from serd_spark.sources.pages import synthesize_pages

    d = str(tmp_path / "pages")
    synthesize_pages(spark, 20, seed=42).write.mode("overwrite").parquet(d)
    p = plan_of(
        extract_triples(spark.read.parquet(d), canonicalize=True, dedup=True)
    )
    read = [l for l in p.splitlines() if "ReadSchema" in l][0]
    assert "url" in read and "html" in read
    assert "text" not in read and "warc_ts" not in read and "lang" not in read


def test_broadcast_join_for_small_dim(spark, sf):
    import __spark_entry__ as em

    assert "BroadcastHashJoin" in plan_of(em.q_join_agg(spark, sf))


def test_partial_aggregation(spark, sf):
    import __spark_entry__ as em

    p = plan_of(em.q_agg_pricing(spark, sf))
    # partial + final pair
    assert p.count("HashAggregate") >= 2


def test_topk_uses_take_ordered(spark, sf):
    import __spark_entry__ as em

    assert "TakeOrderedAndProject" in plan_of(em.q_topk_orders(spark, sf))


def test_text_ops_stay_in_codegen(spark, sf):
    import __spark_entry__ as em

    p = plan_of(em.q_quality(spark, sf), mode="simple")
    assert "*(" in p  # WholeStageCodegen span
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_extraction_is_shuffle_free(spark, tmp_path):
    from serd_spark.operators.extract import extract_triples, triples_only
    from serd_spark.sources.pages import synthesize_pages

    d = str(tmp_path / "pages2")
    synthesize_pages(spark, 20, seed=42).write.mode("overwrite").parquet(d)
    p = plan_of(
        triples_only(
            extract_triples(
                spark.read.parquet(d), canonicalize=True, dedup=True
            )
        )
    )
    assert "Exchange" not in p  # the fused pipeline has no shuffle


def test_bucketed_join_elides_shuffle(spark, tmp_path):
    """Two tables bucketed+sorted on the join key with equal bucket
    counts must join WITHOUT an Exchange (co-location proven by
    catalog metadata) — the raw-parquet join of the same data keeps
    its shuffles."""
    from serd_spark.operators.materialize import write_bucketed_table

    sf = "/root/testdata/sf0.001"
    orders = spark.read.parquet(f"{sf}/orders.parquet").select(
        "o_custkey", "o_totalprice"
    )
    customer = spark.read.parquet(f"{sf}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    )
    write_bucketed_table(
        orders, "tp_bt_orders", "o_custkey", 4,
        path=str(tmp_path / "orders"),
    )
    write_bucketed_table(
        customer, "tp_bt_customer", "c_custkey", 4,
        path=str(tmp_path / "customer"),
    )
    old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        # disable broadcast + AQE so the plan shows the raw strategy
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        bo = spark.table("tp_bt_orders")
        bc = spark.table("tp_bt_customer")
        bucketed = bo.join(bc, bo.o_custkey == bc.c_custkey)
        plan_b = bucketed._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan_b, plan_b
        plain = orders.join(customer,
                            orders.o_custkey == customer.c_custkey)
        plan_p = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan_p
        # physical layout must not change the answer
        assert bucketed.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)


def _py_zorder(x, y, bits=16):
    lim = (1 << bits) - 1
    x = min(max(int(x), 0), lim)
    y = min(max(int(y), 0), lim)
    k = 0
    for b in range(bits):
        k |= ((x >> b) & 1) << (2 * b + 1)
        k |= ((y >> b) & 1) << (2 * b)
    return k


def test_zorder_key_matches_python_reference(spark):
    from serd_spark.operators.materialize import zorder_key
    from pyspark.sql import functions as F

    vals = [(-5, 3), (0, 0), (1, 2), (65535, 65535), (70000, -1),
            (12345, 54321), (7, 65536), (2**40, 2**40)]
    df = spark.createDataFrame(vals, "x long, y long")
    got = [r.z for r in df.select(
        zorder_key(F.col("x"), F.col("y")).alias("z"), "x", "y"
    ).orderBy("x", "y").collect()]
    want = [_py_zorder(x, y) for x, y in sorted(vals)]
    assert got == want


def test_write_zordered_files_bound_both_dims(spark, tmp_path):
    from serd_spark.operators.materialize import write_zordered
    import pyarrow.parquet as pq
    import glob
    import os

    # 64x64 grid; 8 z-range files => each file is a contiguous slice
    # of the z-curve, i.e. a small bounding box in BOTH dims (at most
    # a couple of straddlers at quadrant boundaries)
    rows = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(rows, "x long, y long")
    out = os.path.join(str(tmp_path), "z")
    write_zordered(df, out, "x", "y", n_files=8, bits=6)
    spans = []
    for f in glob.glob(os.path.join(out, "*.parquet")):
        t = pq.read_table(f)
        xs, ys = t.column("x").to_pylist(), t.column("y").to_pylist()
        if xs:
            spans.append((max(xs) - min(xs), max(ys) - min(ys)))
    assert len(spans) >= 4
    # a single-column sort would give span 63 on the other dim in
    # EVERY file; z-order bounds both dims on most files
    tight = [s for s in spans if s[0] <= 32 and s[1] <= 32]
    assert len(tight) >= len(spans) // 2, spans
    # and the layout never loses rows
    back = spark.read.parquet(out)
    assert back.count() == len(rows)


def test_sketch_ops_plan_shapes(spark, sf):
    """The round-4 sketch family's load-bearing plan properties:
    partial (map-side) aggregation on every sketch build, a single
    broadcast join in the count-min lookup, no Python stage
    anywhere, and no sort over anything but the tiny bucket table."""
    import __spark_entry__ as em

    # hdr sketch: map-side partial agg; window sort only downstream
    # of the bucket agg
    p = plan_of(em.q_sketch_quantiles(spark, sf))
    assert "partial_count" in p
    assert "Python" not in p and "Arrow" not in p

    # join counts use the simple tree ("formatted" prints every
    # operator twice: once in the tree, once in the details section)
    # count-min estimate: exactly ONE broadcast join for the lookup
    p = plan_of(em.q_countmin(spark, sf), "simple")
    assert p.count("BroadcastHashJoin") == 1
    assert "SortMergeJoin" not in p
    p = plan_of(em.q_countmin(spark, sf))
    assert "partial_count" in p
    assert "Python" not in p and "Arrow" not in p

    # dsir: ratio + totals joins are broadcasts (the corpus-side
    # scoring pass must stay shuffle-free up to the per-doc agg)
    p = plan_of(em.q_dsir(spark, sf), "simple")
    # ratio lookup is a keyed broadcast; the single-row totals join
    # is a broadcast nested-loop (cross) join — nothing sort-merge
    assert p.count("BroadcastHashJoin") >= 1
    assert p.count("BroadcastNestedLoopJoin") >= 1
    assert "SortMergeJoin" not in p
    p = plan_of(em.q_dsir(spark, sf))
    assert "Python" not in p and "Arrow" not in p

    # bloom: all four membership joins are broadcast, none sort-merge
    p = plan_of(em.q_bloom_decon(spark, sf), "simple")
    assert p.count("BroadcastHashJoin") == 4
    assert "SortMergeJoin" not in p
    p = plan_of(em.q_bloom_decon(spark, sf))
    assert "Python" not in p and "Arrow" not in p


def test_sparql_star_join_over_bucketed_store_is_shuffle_free(
    spark, tmp_path
):
    """The SPARQL compiler's s-s star joins over the subject-bucketed
    catalog table must plan with ZERO Exchange — the 100 TB claim in
    plans/sparql.py's module docstring, proven end to end: SPARQL
    text → BGP compile → bucketed-scan join, no shuffle."""
    from serd_spark.operators.materialize import write_bucketed_table
    from serd_spark.plans.sparql import sparql_query

    rows = [
        (f"e:s{i}", p, f"v{i}-{p[-1]}")
        for i in range(200)
        for p in ("e:name", "e:rating")
    ]
    t = spark.createDataFrame(rows, "s string, p string, o string")
    write_bucketed_table(
        t, "tp_bt_triples", "s", 4, path=str(tmp_path / "triples")
    )
    old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        q = """
        PREFIX e: <e:>
        SELECT ?x ?n ?r WHERE {
          ?x <e:name> ?n .
          ?x <e:rating> ?r .
        }
        """
        out = sparql_query(spark.table("tp_bt_triples"), q)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert out.count() == 200
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
