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
