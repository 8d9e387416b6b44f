"""Corpus-curation pipeline (plans/curate.py)."""

import pytest
from pyspark.sql import functions as F

from serd_spark.plans.curate import curate_documents, metrics_df


@pytest.fixture()
def docs(spark):
    rows = [
        (0, "the cat and the hat is on the mat and the dog is here", "x"),
        (1, "The cat and the hat  is on the mat and the dog is here", "x"),
        (2, "the cat and the hat is on the mat and the dog is there", "x"),
        (3, "le chat et les chapeaux le la et des rues", "x"),
        (4, "the!!! cat??? ... ;;; ### $$$ %%% the and of", "x"),
        (5, "of to is", "x"),
        (6, "this is a perfectly normal english sentence about the weather and the sea", "x"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "source"])


def test_curate_stages(spark, docs):
    res = curate_documents(
        docs, keep_langs=("en",), min_tokens=5,
        max_punct_ratio=0.2, near_dup_threshold=0.5,
    )
    m = dict(res.metrics)
    assert m["input"] == 7
    # french doc 3 dropped by lang filter
    assert m["lang_filter"] == 6
    # punct-heavy 4 and too-short 5 dropped by quality
    assert m["quality_filter"] == 4
    # 1 is an exact (normalized) dup of 0
    assert m["exact_dedup"] == 3
    # 2 is a near dup of 0 → min id 0 survives
    kept = {r.doc_id for r in res.curated.collect()}
    assert kept == {0, 6}
    assert m["near_dup_removal"] == 2

    mdf = metrics_df(spark, res)
    assert mdf.columns == ["stage", "n_docs"]
    assert mdf.count() == 5


def test_curate_on_testdata(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    res = curate_documents(docs, keep_langs=("en",), near_dup_threshold=0.9)
    m = dict(res.metrics)
    assert 0 < m["near_dup_removal"] <= m["input"]
    # survivors are a subset of the input ids
    n_bad = res.curated.join(
        docs.select("doc_id"), "doc_id", "left_anti"
    ).count()
    assert n_bad == 0


def test_near_dup_survivor_is_numeric_min(spark):
    # ids straddling the string-vs-numeric ordering boundary: as
    # strings '10' < '9', numerically 9 < 10 — the numerically
    # smaller doc must survive (regression: LSH machinery compares
    # ids lexicographically after the string cast)
    text = "an identical english document about the weather and the sea"
    rows = [(9, text, "x"), (10, text + " extra", "x")]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    res = curate_documents(
        docs, keep_langs=("en",), min_tokens=3, near_dup_threshold=0.5
    )
    kept = {r.doc_id for r in res.curated.collect()}
    assert kept == {9}


def test_curate_optional_lm_and_span_stages(spark, docs):
    # both optional stages on, with thresholds chosen so each stage
    # verifiably acts: a permissive LM floor keeps everything (the
    # stage still runs and reports), while the span cap at k=10
    # removes the doc whose spans all recur in another doc
    res = curate_documents(
        docs, keep_langs=("en",), min_tokens=5,
        max_punct_ratio=0.2, near_dup_threshold=0.999,
        min_lp_mean_micros=-100_000_000, max_dup_span_frac=0.4,
    )
    m = dict(res.metrics)
    assert m["lm_filter"] == m["quality_filter"]  # permissive floor
    stages = [s for s, _ in res.metrics]
    assert stages.index("lm_filter") < stages.index("exact_dedup")
    assert stages.index("exact_dedup") < stages.index("span_filter")
    # docs 0 and 2 share their first 10-token span ("the cat ... dog")
    # → both exceed a 0.4 dup-span cap; 6 is span-unique
    assert m["span_filter"] < m["exact_dedup"]
    kept = {r.doc_id for r in res.curated.collect()}
    assert 6 in kept and 2 not in kept

    # a harsh LM floor drops everything downstream
    res2 = curate_documents(
        docs, keep_langs=("en",), min_tokens=5,
        max_punct_ratio=0.2, min_lp_mean_micros=0,
    )
    assert dict(res2.metrics)["lm_filter"] == 0


def test_curate_decontaminate_stage(spark, docs):
    # benchmark shares doc 6's exact sentence; doc 6 must be dropped
    bench = spark.createDataFrame(
        [(100, "this is a perfectly normal english sentence about the weather and the sea")],
        ["doc_id", "text"],
    )
    res = curate_documents(
        docs, keep_langs=("en",), min_tokens=5,
        max_punct_ratio=0.2, near_dup_threshold=0.5,
        benchmark=bench, max_hit_frac=0.0,
    )
    m = dict(res.metrics)
    kept = {r.doc_id for r in res.curated.collect()}
    assert 6 not in kept
    assert "decontaminate" in m
    # without the stage, doc 6 survives
    res2 = curate_documents(
        docs, keep_langs=("en",), min_tokens=5,
        max_punct_ratio=0.2, near_dup_threshold=0.5,
    )
    assert 6 in {r.doc_id for r in res2.curated.collect()}
