"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG-construction pipeline on a
deterministic synthesized pages corpus; ``queries()`` exposes every
operator family from SURVEY.md §2 (plus the training-data ops) as
(spark, sf_dir) → DataFrame callables; ``oracle_sql()`` gives the
DuckDB-checkable ANSI-SQL mirror for every SQL-expressible one.

Cross-engine determinism rules used throughout (so the driver's
value-hash compare is exact, not approximate):

- money aggregates go through integer cents
  (``cast(round(x*100) as bigint)`` per row, summed exactly) —
  float summation order never matters;
- per-row float arithmetic (ratios, cosines) is identical IEEE ops
  in both engines on identical inputs, rounded to 6 dp in BOTH;
- timestamps are emitted as formatted strings (no session-TZ or
  type-mapping ambiguity);
- every computed column is aliased identically in Spark and SQL.
"""

from __future__ import annotations

import os
import re
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

LANGS = {
    "en": ["the", "and", "of", "to", "is"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "de", "que", "los", "una"],
    "de": ["der", "die", "und", "das", "ist"],
}


_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _pkg_hash() -> str:
    """Content hash of the serd_spark source tree, so the shipped zip
    is invalidated the moment any module changes (a fixed /tmp path
    would keep shadowing executors with stale code after edits)."""
    import hashlib

    h = hashlib.blake2b(digest_size=6)
    pkg = os.path.join(_REPO, "serd_spark")
    paths = []
    for root, dirs, files in os.walk(pkg):
        # prune in place BEFORE the walk descends (sorted(os.walk(...))
        # would exhaust the generator first, making pruning a no-op)
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        paths.extend(
            os.path.join(root, fn) for fn in files if fn.endswith(".py")
        )
    for p in sorted(paths):
        h.update(os.path.relpath(p, pkg).encode())
        with open(p, "rb") as f:
            h.update(f.read())
    return h.hexdigest()


def _ensure_shipped(spark: SparkSession) -> None:
    """Ship serd_spark to Python workers regardless of the driver
    process's cwd/PYTHONPATH (no-op when already importable there).
    The zip is keyed by a content hash of the package, so executors
    always see the current code and concurrent sessions never race on
    one shared file."""
    try:
        import shutil

        zip_path = f"/tmp/serd_spark_pkg_{_pkg_hash()}.zip"
        if not os.path.exists(zip_path):
            tmp = f"{zip_path}.{os.getpid()}.tmp"
            shutil.make_archive(tmp, "zip", root_dir=_REPO,
                                base_dir="serd_spark")
            os.replace(f"{tmp}.zip", zip_path)
        spark.sparkContext.addPyFile(zip_path)
    except Exception:
        pass  # already added, or local path import suffices


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", os.path.basename(os.path.normpath(sf_dir)))
    return float(m.group(1)) if m else 0.01


def _n_pages(sf_dir: str) -> int:
    # 200 pages at sf0.001 → 20k at sf0.1; extraction cost ∝ pages
    return max(200, int(200_000 * _sf_of(sf_dir)))


def _cents(col) -> F.Column:
    return F.round(col * 100).cast("long")


def _pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    from serd_spark.sources.pages import synthesize_pages

    _ensure_shipped(spark)
    return synthesize_pages(spark, _n_pages(sf_dir), seed=42)


def _kg_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extraction with canonicalization+dedup fused into the one
    Python stage (shuffle-free; equivalent to the unfused
    canonicalize_triples∘dedup_triples — see extract.py)."""
    from serd_spark.operators.extract import extract_triples, triples_only
    from serd_spark.sources.pages import latest_crawl

    pages = latest_crawl(_pages(spark, sf_dir))
    return triples_only(
        extract_triples(pages, lax=True, canonicalize=True, dedup=True)
    )


# ---------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: synthesize pages → extract RDF islands → canonicalize
    → dedup → per-predicate triple counts (the KG-construction core,
    end to end)."""
    triples = _kg_triples(spark, "/root/testdata/sf0.001")
    return (
        triples.groupBy("p")
        .agg(F.count(F.lit(1)).alias("n_triples"))
        .orderBy(F.desc("n_triples"), F.col("p"))
    )


# ---------------------------------------------------------------------
# KG pipeline queries
#
# The extraction/canonicalization output is ALSO materialized to
# parquet under ORACLE_DIR so DuckDB can independently re-aggregate it:
# the Spark side of each query recomputes from the source pages (a
# second, fresh extraction run), so a hash match proves both (a) the
# extraction is deterministic across executions and (b) the Spark
# aggregation agrees with an independent SQL engine over the same rows.
# ---------------------------------------------------------------------

ORACLE_DIR = "/tmp/serd_spark_oracle"
_MATERIALIZED: set[str] = set()


def _oracle_path(sf_dir: str, what: str) -> str:
    base = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(ORACLE_DIR, base, what)


def _materialize(sf_dir: str, what: str, df_fn) -> None:
    """Write ``df_fn()`` to the oracle dir, once per process, and only
    at the driver's correctness scale (sf0.01) — bench runs the same
    queries at sf0.1 and must not pay the extra write job."""
    if os.path.basename(os.path.normpath(sf_dir)) != "sf0.01":
        return
    out = _oracle_path(sf_dir, what)
    if out not in _MATERIALIZED:
        df_fn().write.mode("overwrite").parquet(out)
        _MATERIALIZED.add(out)


def _materialize_extraction(spark: SparkSession, sf_dir: str) -> None:
    """Write one fresh raw-extraction run (triple rows rec='t' + error
    rows rec='e') where the DuckDB oracle can read it.  Overwritten on
    the first use per process so oracles never see stale rounds."""
    from serd_spark.operators.extract import extract_triples

    _materialize(
        sf_dir, "extract",
        lambda: extract_triples(_pages(spark, sf_dir), lax=True),
    )


def _materialize_triples(spark: SparkSession, sf_dir: str) -> None:
    """Same, for the canonicalized+deduped triple table."""
    _materialize(sf_dir, "triples", lambda: _kg_triples(spark, sf_dir))


def kg_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from serd_spark.operators.extract import extract_triples

    _materialize_extraction(spark, sf_dir)
    ext = extract_triples(_pages(spark, sf_dir), lax=True)
    return (
        ext.groupBy("syntax", "rec")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("syntax", "rec")
    )


def kg_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    _materialize_triples(spark, sf_dir)
    return (
        _kg_triples(spark, sf_dir)
        .groupBy("p")
        .agg(
            F.count(F.lit(1)).alias("n_triples"),
            F.count_distinct("s").alias("n_subjects"),
        )
        .orderBy(F.desc("n_triples"), "p")
        .limit(20)
    )


def kg_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serialize every extracted triple to N-Triples, reparse the
    lines, count exact statement matches — the serd_writer round-trip
    invariant at corpus scale. Fused write+parse, one Python crossing
    (serialize.roundtrip_check)."""
    from serd_spark.operators.serialize import roundtrip_check

    _materialize_triples(spark, sf_dir)
    triples = _kg_triples(spark, sf_dir)
    per_batch = roundtrip_check(triples)
    return per_batch.agg(
        F.sum("n_lines").alias("n_lines"),
        F.sum("n_roundtrip").alias("n_roundtrip"),
    )


def kg_linking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minhash entity linking over the extracted graph: component
    sizes of linked surface IRIs."""
    from serd_spark.operators.linking import link_entities

    links, entities = link_entities(
        _kg_triples(spark, sf_dir), threshold=0.6
    )
    # Materialize the verified-link edge list: DuckDB recomputes the
    # connected components (recursive-CTE reachability closure + min
    # label) independently of Spark's union-find / label propagation.
    _materialize(
        sf_dir, "links", lambda: links.select("entity_a", "entity_b")
    )
    return (
        entities.groupBy("canon")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .filter(F.col("n_members") > 1)
        .orderBy(F.desc("n_members"), "canon")
        .limit(50)
    )


def kg_linking_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same linking stage forced down the DISTRIBUTED
    pointer-jumping connected-components path (driver_threshold=0 —
    the code that actually runs on a 100 TB link graph, linking.py
    label-propagation loop).  The DuckDB oracle recomputes the
    components with a recursive-CTE reachability closure over the
    independently-materialized edge list, so a hash match certifies
    the distributed path, not just the driver union-find."""
    from serd_spark.operators.linking import link_entities

    links, entities = link_entities(
        _kg_triples(spark, sf_dir), threshold=0.6, driver_threshold=0
    )
    _materialize(
        sf_dir, "links_dist", lambda: links.select("entity_a", "entity_b")
    )
    return (
        entities.groupBy("canon")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .filter(F.col("n_members") > 1)
        .orderBy(F.desc("n_members"), "canon")
        .limit(50)
    )


def kg_bad_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lax-mode side output: malformed-island counts by syntax
    (≙ serdi -l skip-and-count)."""
    from serd_spark.operators.extract import errors_only, extract_triples

    _materialize_extraction(spark, sf_dir)
    ext = extract_triples(_pages(spark, sf_dir), lax=True)
    return (
        errors_only(ext)
        .groupBy("syntax")
        .agg(
            F.count(F.lit(1)).alias("n_errors"),
            F.count_distinct("url").alias("n_docs"),
        )
        .orderBy("syntax")
    )


def kg_turtle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Abbreviating Turtle writer (serd op-12): serialize each
    document, reparse, prove statement-count fixpoint."""
    from collections.abc import Iterator

    import pandas as pd

    from serd_spark.operators.serialize import serialize_turtle_documents
    from serd_spark.rdf.turtle import parse_turtle

    _materialize_triples(spark, sf_dir)
    docs = serialize_turtle_documents(
        _kg_triples(spark, sf_dir), prefixes={"s": "http://schema.org/"}
    )

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ok = 0
            for turtle, n in zip(pdf["turtle"], pdf["n_statements"]):
                stmts, errs = parse_turtle(turtle, "")
                if not errs and len(stmts) == n:
                    ok += 1
            yield pd.DataFrame(
                {"n_docs": [len(pdf)], "n_roundtrip": [ok]}
            )

    return docs.mapInPandas(
        verify, schema="n_docs long, n_roundtrip long"
    ).agg(
        F.sum("n_docs").alias("n_docs"),
        F.sum("n_roundtrip").alias("n_roundtrip"),
    )


def kg_hub_salting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew handling: hub detection + content-derived salting; output
    = per-salt row counts for the detected hub subjects (must spread
    across salts, non-hubs all salt 0)."""
    from serd_spark.operators.materialize import bucket_and_salt, detect_hubs

    triples = _kg_triples(spark, sf_dir)
    # sf-proportional threshold: ~1% of pages reference a hub, so a
    # few refs each at sf0.01 — production uses min_hub_refs=10_000
    hubs = detect_hubs(triples, top_k=8)
    bucketed = bucket_and_salt(triples, hubs, min_hub_refs=2)
    # Materialize the salted/bucketed table: the fresh Spark recompute
    # below must agree with DuckDB's re-aggregation of this file
    # (determinism of xxhash64 bucketing + content-derived salts).
    _materialize(
        sf_dir, "bucketed",
        lambda: bucketed.select("s", "subj_bucket", "salt"),
    )
    return (
        bucketed.groupBy((F.col("salt") > 0).alias("is_salted"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct("salt").alias("n_salts"),
            F.count_distinct("subj_bucket").alias("n_buckets"),
        )
        .orderBy("is_salted")
    )


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from serd_spark.operators.dedup import (
        simhash_near_dups,
        simhash_signatures,
    )

    docs = _t(spark, sf_dir, "documents")
    # Materialize per-doc signatures so DuckDB can BRUTE-FORCE the
    # Hamming-≤3 pair set independently — a genuine oracle for the
    # chunk-LSH recall guarantee (4×16-bit chunks cover Hamming ≤3
    # fully by pigeonhole), not just a re-aggregation.
    _materialize(sf_dir, "simhash_sigs", lambda: simhash_signatures(docs))
    # max_hamming=3 is the chunk-LSH recall guarantee (4×16-bit
    # chunks cover Hamming ≤3 fully; beyond that recall is partial).
    # max_bucket=None: the DuckDB brute-force oracle expects the
    # COMPLETE pair set; the production default caps degenerate
    # buckets (tested separately in test_textops).
    return simhash_near_dups(docs, max_hamming=3, max_bucket=None).orderBy(
        "id_a", "id_b"
    )


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from serd_spark.operators.dedup import minhash_near_dups
    from serd_spark.operators.linking import lsh_bands, signatures

    docs = _t(spark, sf_dir, "documents")
    # Materialize signatures + band hashes so DuckDB can replay the
    # ENTIRE candidate pipeline (bucket-cap pruning → band equi-join →
    # signature-agreement verify) independently.
    named = docs.select(
        F.col("doc_id").cast("string").alias("entity"),
        F.col("text").alias("name"),
    )
    _materialize(sf_dir, "minhash/sigs", lambda: signatures(named))
    _materialize(
        sf_dir, "minhash/bands",
        lambda: lsh_bands(
            spark.read.parquet(_oracle_path(sf_dir, "minhash/sigs"))
        ),
    )
    return minhash_near_dups(docs, threshold=0.5).orderBy(
        "entity_a", "entity_b"
    )


def dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    from serd_spark.operators.dedup import (
        embedding_near_dups,
        hyperplane_buckets,
    )

    emb = _t(spark, sf_dir, "embeddings")
    # Materialize the LSH bucket assignment so DuckDB can replay the
    # bucket join + exact cosine independently (same plane seed).
    _materialize(
        sf_dir, "emb_buckets",
        lambda: hyperplane_buckets(emb, dim=64, n_planes=4).select(
            "vec_id", "bucket"
        ),
    )
    # testdata embeddings are near-random (max pairwise cos ≈ 0.51):
    # threshold 0.4 + 4 planes yields a non-trivial pair set
    return embedding_near_dups(emb, dim=64, threshold=0.4, n_planes=4).orderBy(
        "id_a", "id_b"
    )


def ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from serd_spark.operators.similarity import (
        assign_centroids,
        ivf_topk,
        probe_ids,
        train_centroids,
    )

    emb = _t(spark, sf_dir, "embeddings")
    cents = train_centroids(emb, n_centroids=16)
    assigned = assign_centroids(emb, cents)
    q = emb.filter(F.col("vec_id") == 0).first().embedding
    # Materialize the centroid assignment and probe list: DuckDB then
    # independently reruns the probe-filtered exact top-k search.
    _materialize(
        sf_dir, "ann_assign", lambda: assigned.select("vec_id", "centroid")
    )
    _materialize(
        sf_dir, "ann_probes",
        lambda: spark.createDataFrame(
            [(c,) for c in probe_ids(cents, list(q), 4)], "centroid int"
        ),
    )
    return ivf_topk(assigned, cents, list(q), k=10, n_probe=4)


def curate_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation (lang → quality → exact dedup →
    near-dup removal) with per-stage survivor counts."""
    from serd_spark.plans.curate import curate_documents, metrics_df

    docs = _t(spark, sf_dir, "documents")
    res = curate_documents(docs, keep_langs=("en",), near_dup_threshold=0.9)
    # The filter stages (lang, quality, exact dedup) are replayed
    # fully independently in the DuckDB mirror; only the LSH loser set
    # (non-SQL minhash) is materialized for the final subtraction.
    _materialize(sf_dir, "curate_losers", lambda: res.losers)
    return metrics_df(spark, res)


def curate_metrics_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 7-stage curation funnel: lang → quality → unigram-LM floor
    → exact dedup → duplicated-span cap → near-dup removal. The DuckDB
    mirror replays ALL filter stages independently (including the LM
    model fit on the post-quality corpus and the span frequency table
    over the post-exact corpus); only the LSH loser set is
    materialized."""
    from serd_spark.plans.curate import curate_documents, metrics_df

    docs = _t(spark, sf_dir, "documents")
    res = curate_documents(
        docs,
        keep_langs=("en",),
        near_dup_threshold=0.9,
        min_lp_mean_micros=-3_450_000,
        max_dup_span_frac=0.5,
    )
    _materialize(sf_dir, "curate_full_losers", lambda: res.losers)
    return metrics_df(spark, res)


def stream_extract_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming end-to-end check: pages parquet dir →
    availableNow micro-batched extraction (maxFilesPerTrigger=2, so
    the corpus really flows through MULTIPLE batches + the streaming
    checkpoint/foreachBatch sink) → per-(syntax, rec) counts. The
    DuckDB oracle aggregates a BATCH extraction of the same pages —
    streaming-vs-batch equivalence, verified cross-engine."""
    import shutil

    from serd_spark.operators.extract import extract_triples
    from serd_spark.sources.pages import latest_crawl, synthesize_pages
    from serd_spark.streaming.incremental import run_incremental

    n = max(100, _n_pages(sf_dir) // 4)
    base = os.path.join(
        "/tmp/serd_spark_stream", os.path.basename(os.path.normpath(sf_dir))
    )
    pages_dir = os.path.join(base, "pages")
    out_dir = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")
    shutil.rmtree(base, ignore_errors=True)
    _ensure_shipped(spark)
    latest_crawl(synthesize_pages(spark, n, seed=42)).repartition(
        6
    ).write.parquet(pages_dir)
    q = run_incremental(
        spark, pages_dir, out_dir, ckpt, max_files_per_trigger=2
    )
    q.awaitTermination()
    _materialize(
        sf_dir, "stream_batch_extract",
        lambda: extract_triples(
            spark.read.parquet(pages_dir),
            lax=True, canonicalize=True, dedup=True,
        ),
    )
    return (
        spark.read.parquet(out_dir)
        .groupBy("syntax", "rec")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("syntax", "rec")
    )


def stream_dedup_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful-streaming url dedup (applyInPandasWithState) driven
    end-to-end: raw pages (WITH re-crawl duplicates) flow through a
    multi-batch availableNow stream; the stateful operator keeps the
    deterministic (warc_ts, xxhash64(html))-max winner per url.  Files
    are url-partitioned so each url's rows land in ONE micro-batch —
    making the stream's output equal batch ``latest_crawl``, which the
    DuckDB oracle replays independently (arg_max per url over the
    materialized raw pages)."""
    import shutil

    from serd_spark.sources.pages import synthesize_pages
    from serd_spark.streaming.incremental import (
        stream_dedup_urls,
        stream_pages,
    )

    n = max(100, _n_pages(sf_dir) // 4)
    base = os.path.join(
        "/tmp/serd_spark_stream_dedup",
        os.path.basename(os.path.normpath(sf_dir)),
    )
    pages_dir = os.path.join(base, "pages")
    out_dir = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")
    shutil.rmtree(base, ignore_errors=True)
    _ensure_shipped(spark)
    # NO latest_crawl here — the duplicates are the point; url-hash
    # partitioning colocates every url's re-crawls in one file
    synthesize_pages(spark, n, seed=42).repartition(6, "url").write.parquet(
        pages_dir
    )

    ded = stream_dedup_urls(
        stream_pages(spark, pages_dir, max_files_per_trigger=2)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={batch_id}")
        )

    q = (
        ded.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    _materialize(
        sf_dir, "stream_raw_pages",
        lambda: spark.read.parquet(pages_dir).select(
            "url", "warc_ts", "text"
        ),
    )
    out = spark.read.parquet(out_dir)
    return out.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("url").alias("n_urls"),
        F.sum(F.unix_timestamp("warc_ts")).alias("sum_ts"),
        F.sum(F.length("text")).alias("total_len"),
    )


def stream_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming near-duplicate detection (applyInPandasWithState over
    SimHash chunk buckets) driven end-to-end: the documents table is
    staged as FOUR doc_id-ordered slice files written in mtime order,
    so arrival order == id order and the stream's "dup of the best
    earlier doc" rule equals the batch rule "dup of the (min hamming,
    then min id) doc with a smaller id" — which the DuckDB oracle
    brute-forces from independently materialized signatures. Recall
    below the state cap is exact (4×16-bit chunks cover Hamming ≤ 3
    by pigeonhole; sf0.01's 500 docs sit far below the cap)."""
    import shutil
    import time as _time

    from serd_spark.operators.dedup import simhash_signatures
    from serd_spark.streaming.incremental import stream_near_dup_docs

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    base = os.path.join(
        "/tmp/serd_spark_stream_neardup",
        os.path.basename(os.path.normpath(sf_dir)),
    )
    docs_dir = os.path.join(base, "docs")
    out_dir = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")
    shutil.rmtree(base, ignore_errors=True)
    _ensure_shipped(spark)
    # four id-range slices, written sequentially: the file source
    # processes oldest-mtime first, making arrival order = id order
    bounds = docs.agg(
        F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
    ).collect()[0]
    lo, hi = int(bounds.lo), int(bounds.hi)
    step = max(1, (hi - lo + 1) // 4)
    for k in range(4):
        a = lo + k * step
        b = hi + 1 if k == 3 else lo + (k + 1) * step
        sl = docs.filter((F.col("doc_id") >= a) & (F.col("doc_id") < b))
        if k:
            _time.sleep(1.05)  # distinct mtimes: deterministic order
        sl.coalesce(1).write.mode("append").parquet(docs_dir)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_dir)
    )
    ded = stream_near_dup_docs(stream)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={batch_id}")
        )

    q = (
        ded.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    _materialize(
        sf_dir, "stream_simhash_sigs", lambda: simhash_signatures(docs)
    )
    # explicit schema: a corpus with NO near-dups leaves every batch
    # dir holding only _SUCCESS, and schema inference would raise
    out = spark.read.schema("doc_id long, dup_of long, hamming int").parquet(
        out_dir
    )
    return (
        out.groupBy("doc_id")
        .agg(F.min(F.struct("hamming", "dup_of")).alias("m"))
        .select(
            "doc_id",
            F.col("m.dup_of").alias("dup_of"),
            F.col("m.hamming").alias("hamming"),
        )
        .orderBy("doc_id")
    )


def kg_node_ctors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver exposure for the node constructors and the file-URI
    bridge (SURVEY §2A rows 8/15 — serd_node_new_integer/decimal/blob,
    serd_node_new_file_uri/serd_file_uri_parse equivalents): per-doc
    lexical forms computed by the Python ctors inside an Arrow batch,
    round-tripped in-process (parse(new_file_uri)==path,
    blob_decode(new_blob)==bytes — any violation raises and fails the
    query), then value-compared against a DuckDB mirror that rebuilds
    the same lexical forms in SQL."""
    from collections.abc import Iterator

    import pandas as pd

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from serd_spark.rdf.nodes import (
            blob_decode,
            file_uri_parse,
            new_blob,
            new_decimal,
            new_file_uri,
            new_integer,
            uri_to_path,
        )

        for pdf in batches:
            ids, int_lex, dec_lex, b64, furi, furi_host = (
                [], [], [], [], [], []
            )
            for i, text in zip(pdf["doc_id"], pdf["text"]):
                i = int(i)
                raw = (text or "")[:8].encode("utf-8")
                blob = new_blob(raw)
                if blob_decode(blob) != raw:
                    raise AssertionError("blob round-trip failed")
                path = f"/data/doc {i}.nt"
                uri = new_file_uri(path)
                if file_uri_parse(uri) != (path, ""):
                    raise AssertionError("file URI round-trip failed")
                uri_h = new_file_uri(path, hostname="host.example")
                if file_uri_parse(uri_h) != (path, "host.example"):
                    raise AssertionError("hosted file URI round-trip failed")
                if uri_to_path(uri_h) != path:
                    raise AssertionError("uri_to_path mismatch")
                ids.append(i)
                int_lex.append(new_integer(i).value)
                dec_lex.append(new_decimal(i * 0.25, 2).value)
                b64.append(blob.value)
                furi.append(uri)
                furi_host.append(uri_h)
            yield pd.DataFrame(
                {
                    "doc_id": ids, "int_lex": int_lex, "dec_lex": dec_lex,
                    "b64": b64, "file_uri": furi, "file_uri_host": furi_host,
                }
            )

    _ensure_shipped(spark)
    return d.mapInPandas(
        run,
        schema=(
            "doc_id long, int_lex string, dec_lex string, b64 string, "
            "file_uri string, file_uri_host string"
        ),
    ).orderBy("doc_id")


def mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from serd_spark.operators.multimodal import (
        extract_features,
        synthesize_media,
    )

    media = synthesize_media(spark, max(64, _n_pages(sf_dir) // 8))
    feats = extract_features(media)
    _materialize(sf_dir, "mm_features", lambda: extract_features(media))
    # f0 summed in integer millionths (per-row round, then exact
    # integer sum) so the cross-engine compare is order-insensitive
    return feats.agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum("n_bytes").alias("total_bytes"),
        F.sum(
            F.round(F.element_at("feature", 1).cast("double") * 1000000)
            .cast("long")
        ).alias("f0_millionths"),
    )


# ---------------------------------------------------------------------
# SQL-expressible queries (DuckDB-oracled)
# ---------------------------------------------------------------------

def mm_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Container-metadata probing WITHOUT decode: per-payload byte
    parsing (BMP/PNG/JPEG headers, WAV sample math, MP4 moov boxes)
    aggregated per container.  The DuckDB oracle recomputes the same
    aggregates from the media table's DECLARED metadata columns —
    which never touched the payload bytes — so a hash match proves
    byte-level probing reproduces the generator's ground truth."""
    from serd_spark.operators.multimodal import (
        probe_media,
        synthesize_media,
    )

    media = synthesize_media(spark, max(64, _n_pages(sf_dir) // 8))
    _materialize(
        sf_dir, "mm_media_meta",
        lambda: media.select(
            "media_id", "kind", "mime", "width", "height", "duration_ms"
        ),
    )
    return (
        probe_media(media)
        .groupBy("container")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum("width").alias("sum_w"),
            F.sum("height").alias("sum_h"),
            F.sum("duration_ms").alias("sum_dur"),
            F.sum("n_tracks").alias("sum_tracks"),
        )
        .orderBy("container")
    )


def mm_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-range video frame sampling over REAL parsed MP4 sample
    tables (stts/stsz/stsc/stco). The DuckDB oracle rebuilds the whole
    sample layout — 10 fps schedule, per-sample size formula,
    contiguous chunk offsets from 4096 — from DECLARED metadata that
    never touched the payload bytes, so a hash match proves the box
    parser recovers the generator's ground-truth byte ranges."""
    from serd_spark.operators.multimodal import (
        sample_frames,
        synthesize_media,
    )

    media = synthesize_media(spark, max(64, _n_pages(sf_dir) // 8))
    _materialize(
        sf_dir, "mm_media_meta",
        lambda: media.select(
            "media_id", "kind", "mime", "width", "height", "duration_ms"
        ),
    )
    return sample_frames(media, every_ms=1000).groupBy("media_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_sampled"),
        F.max("frame_idx").cast("long").alias("max_frame"),
        F.sum("n_bytes").cast("long").alias("sum_bytes"),
        F.max(F.col("byte_off") + F.col("n_bytes"))
        .cast("long")
        .alias("max_end_off"),
    )


def mm_frame_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling that ends in PIXELS: MJPEG-in-MP4 payloads
    (every mdat sample a real baseline JPEG) → sample table parse →
    ranged slice → JPEG decode → per-frame luminance features. The
    oracle is hybrid: the STRUCTURE columns (n_sampled, max_frame,
    frame dims) are recomputed by DuckDB from the generator formulas
    alone — no payload bytes — while the luminance sums re-aggregate
    the materialized per-frame rows (mm_features pattern: the Spark
    side decodes from scratch, so a hash match proves deterministic
    decode + structural agreement with declared ground truth)."""
    from serd_spark.operators.multimodal import (
        decode_frames,
        synthesize_mjpeg_media,
    )

    media = synthesize_mjpeg_media(spark, max(32, _n_pages(sf_dir) // 64))
    _materialize(
        sf_dir, "mm_frame_decode",
        lambda: decode_frames(media, every_ms=300),
    )
    return decode_frames(media, every_ms=300).groupBy("media_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_sampled"),
        F.max("frame_idx").cast("long").alias("max_frame"),
        F.max("fw").cast("long").alias("fw"),
        F.max("fh").cast("long").alias("fh"),
        F.sum("lum_mean_u").cast("long").alias("sum_lum_mean_u"),
        F.sum("lum_std_u").cast("long").alias("sum_lum_std_u"),
    )


def q_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIME + charset sniffing from payload BYTES alone (magic numbers,
    BOMs, WHATWG control-byte rule, ASCII meta/encoding declarations —
    one pure-JVM codegen projection, serd's choose_syntax role widened
    to web containers). Grouped by the generator's DECLARED ground
    truth with an exact-match counter: the DuckDB oracle aggregates the
    declared columns (never touching a payload byte) and asserts
    n_exact == n, so a hash match proves the sniffer recovers the
    ground truth on EVERY row of all 18 variants."""
    from serd_spark.operators.sniff import (
        sniff_responses,
        synthesize_responses,
    )

    resp = synthesize_responses(spark, max(72, _n_pages(sf_dir) // 8))
    _materialize(
        sf_dir, "sniff_meta",
        lambda: resp.select("resp_id", "mime", "charset"),
    )
    return (
        sniff_responses(resp)
        .groupBy("mime", "charset")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(
                (
                    (F.col("sniffed_mime") == F.col("mime"))
                    & (F.col("sniffed_charset") == F.col("charset"))
                ).cast("long")
            ).alias("n_exact"),
        )
        .orderBy("mime", "charset")
    )


def q_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional phrase search for "table hash" — consecutive-token
    matching, row-local (no explode/join/shuffle on the corpus side;
    corpus.py::phrase_search). Emits per-doc match count and the
    1-based first position; the oracle replays the token array and
    the start-offset filter with DuckDB list ops."""
    from serd_spark.operators.corpus import phrase_search

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return phrase_search(d, "table hash").orderBy("doc_id")


def q_setsim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Jaccard≥0.8 similarity self-join (prefix filtering, no
    LSH approximation, no cartesian — fuzzy.py::set_similarity_join)
    over word-3-gram shingle sets: documents plus an appended-token
    twin for every 7th doc. The oracle replays shingling, the global
    (df, token) order, per-set prefix math, the size bound and its
    own list_intersect verify — the whole AllPairs pipeline twice."""
    from serd_spark.operators.fuzzy import set_similarity_join

    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("id"), "text"
    )
    twins = d.filter(F.col("id") % 7 == 0).select(
        (F.col("id") + 1000000).alias("id"),
        F.concat(F.col("text"), F.lit(" mut alpha beta gama")).alias(
            "text"
        ),
    )
    arr = F.split(
        F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")),
        " ",
    )
    # BOUND-COLUMN staging (the winnow-HOF discipline, CLAUDE.md):
    # element_at over the inline `arr` expression re-evaluates the
    # whole split per lambda element — quadratic per document.
    # Materializing the token array as a column first, then building
    # grams over the bound column, dropped the shingle stage from
    # ~26 s to ~2 s at sf0.1.
    a = F.col("_a")
    grams = F.when(
        F.size(a) >= 3,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(a) - 2),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(a, i),
                    F.element_at(a, i + 1),
                    F.element_at(a, i + 2),
                ),
            )
        ),
    )
    # the 2 MB split cap leaves this small parquet on ~2 input
    # splits — spread the (interpreted) shingle HOF across ALL cores
    # (cores-derived, not a baked local constant: 2× parallelism is
    # the floor that keeps every core busy through the stragglers)
    # and pin the arrays ONCE for the join's multiple consumers
    n_parts = 2 * spark.sparkContext.defaultParallelism
    sets = (
        d.unionAll(twins)
        .repartition(n_parts, "id")
        .select("id", arr.alias("_a"))
        .select("id", grams.alias("toks"))
        .filter(F.col("toks").isNotNull())
        .localCheckpoint()
    )
    assert sets.rdd.getNumPartitions() >= (
        spark.sparkContext.defaultParallelism
    ), "shingle stage must not collapse below one partition per core"
    return set_similarity_join(sets, t_permille=800).orderBy(
        "id_a", "id_b"
    )


def q_transcode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Charset transcoding to UTF-8 character text driven by the
    SNIFFED charset (sniff.py::transcode_text — total, pure JVM):
    per declared charset, how many payloads decode and how many
    recover the generator's declared text EXACTLY (null-safe
    equality), plus an md5 content pin over the recovered text. The
    oracle reads only declared columns and asserts n_exact == n — a
    hash match proves byte→character recovery is exact on every text
    variant (utf-8, BOM'd, latin-1, utf-16le/be) and null on every
    binary one."""
    from serd_spark.operators.sniff import (
        sniff_responses,
        synthesize_responses,
        transcode_text,
    )

    resp = synthesize_responses(spark, max(72, _n_pages(sf_dir) // 8))
    _materialize(
        sf_dir, "sniff_text",
        lambda: resp.select("resp_id", "charset", "text"),
    )
    out = sniff_responses(resp).withColumn(
        "rec", transcode_text(F.col("payload"), F.col("sniffed_charset"))
    )
    pin = F.conv(F.substring(F.md5("rec"), 1, 10), 16, 10).cast("long")
    return (
        out.groupBy("charset")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("rec").alias("n_text"),
            F.sum(
                F.col("rec").eqNullSafe(F.col("text")).cast("long")
            ).alias("n_exact"),
            F.sum(pin).alias("pin"),
        )
        .orderBy("charset")
    )


def q_snippets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KWIC snippets for the phrase "table hash", 3 context tokens
    each side (corpus.py::phrase_snippets — row-local, bounded
    output). The oracle rebuilds each snippet with list_slice over
    the same token arrays."""
    from serd_spark.operators.corpus import phrase_snippets

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return phrase_snippets(d, "table hash", window=3).orderBy("doc_id")


def q_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance-1 similarity join WITHOUT a cartesian product:
    SymSpell deletion-neighborhood blocking (exact recall at k=1 by
    the pigeonhole argument — fuzzy.py) + JVM levenshtein verify.
    Input: md5-prefix names from customer plus a mutated twin (one
    char deleted at a closed-form position) for every 5th row; the
    oracle replays the generation, the blocking (DuckDB
    list_transform range-deletes) and its own levenshtein end to end,
    so matching rows certify recall AND precision of the whole join."""
    from serd_spark.operators.fuzzy import fuzzy_join

    base = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("id"),
        F.concat(
            F.lower("c_mktsegment"),
            F.lit(" "),
            F.substring(F.md5("c_name"), 1, 12),
        ).alias("name"),
    )
    t = base.filter(F.col("id") % 5 == 0).withColumn(
        "pos", (F.col("id") % 8 + 3).cast("int")
    )
    twins = t.select(
        (F.col("id") + 1000000).alias("id"),
        F.concat(
            F.substring(F.col("name"), F.lit(1), F.col("pos") - 1),
            F.substring(
                F.col("name"), F.col("pos") + 1, F.length("name")
            ),
        ).alias("name"),
    )
    return fuzzy_join(base.unionAll(twins)).orderBy("id_a", "id_b")


def q_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") > 45)
        & (F.col("l_shipdate") >= F.lit("1995-01-01"))
    ).select(
        "l_orderkey",
        "l_linenumber",
        _cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "gross_cents"
        ),
    )


def q_agg_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.sum(_cents(F.col("l_extendedprice"))).alias("sum_base_cents"),
            F.sum(
                _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("sum_disc_cents"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_cents(F.col("o_totalprice"))).alias("revenue_cents"),
        )
        .orderBy("c_mktsegment")
    )


def q_multi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(
                _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue_cents")
        )
        .orderBy("r_name", "n_name")
    )


def q_window_toporder(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            "o_orderkey",
            _cents(F.col("o_totalprice")).alias("top_cents"),
        )
    )


def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.col("o_orderkey"))
        .limit(100)
        .select("o_orderkey", _cents(F.col("o_totalprice")).alias("price_cents"))
    )


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    no_orders = c.subtract(o).withColumn("tag", F.lit("no_orders"))
    has_orders = c.intersect(o).withColumn("tag", F.lit("has_orders"))
    return no_orders.union(has_orders).select("tag", "c_custkey")


def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_cents(F.col("o_totalprice"))).alias("sum_cents"),
        )
        .orderBy("o_orderpriority", "o_orderstatus")
    )


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "hour_start"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_cents(F.col("value"))).alias("value_cents"),
        )
        .orderBy("hour_start", "event_type")
    )


def q_events_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_str"),
        )
    )


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    # events.ts is TIMESTAMP_NTZ in the parquet; unix_micros wants TIMESTAMP
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.lag(us).over(w)
    boundary = F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
    return (
        e.withColumn("boundary", boundary)
        .groupBy("user_id")
        .agg(
            F.sum("boundary").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from serd_spark.operators.dedup import exact_dedup

    return exact_dedup(_t(spark, sf_dir, "documents")).orderBy("fp")


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from serd_spark.operators.text import bpe_ish_token_count, token_count

    d = _t(spark, sf_dir, "documents")
    # Counts cast to LONG so the Arrow dtype matches DuckDB's BIGINT
    # (the driver compare is representation-sensitive).
    return d.select(
        "doc_id",
        token_count(F.col("text")).cast("long").alias("n_tokens"),
        bpe_ish_token_count(F.col("text")).cast("long").alias("n_pieces"),
        F.length(F.trim(F.col("text"))).cast("long").alias("n_chars_trim"),
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from serd_spark.operators.text import lang_id

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", lang_id(F.col("text")).alias("lang_pred"))


def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from serd_spark.operators.text import quality_features

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = quality_features(d).drop("text")
    # Integer feature columns → LONG to match DuckDB BIGINT in the oracle.
    return out.select(
        *[
            F.col(c).cast("long").alias(c)
            if t in ("int", "smallint", "tinyint")
            else F.col(c)
            for c, t in out.dtypes
        ]
    )


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from serd_spark.operators.text import fingerprint

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", fingerprint(F.col("text")).alias("fp_md5"))


def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per document (type-token ratio,
    top-2-gram fraction, duplicate-3-gram fraction, duplicate-line
    fraction) — pure built-ins; the per-doc mode is a JVM fold over
    the sorted shingle array, no explode/groupBy shuffle."""
    from serd_spark.operators.text import repetition_features

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return repetition_features(d).drop("text")


def q_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII flag + redaction counts. The synthetic documents carry no
    contact spans, so the query first derives a text that provably
    does — a deterministic pure function of (doc_id, text), built
    identically in the SQL mirror — then counts and redacts."""
    from serd_spark.operators.text import pii_counts, redact_pii

    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    c = F.concat(
        F.col("text"),
        F.lit(" contact user"), did, F.lit("@mail.example.com or 415-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" from 10.0."), (F.col("doc_id") % 256).cast("string"),
        F.lit(".7"),
    )
    return d.select(
        "doc_id",
        *[cnt.cast("long").alias(f"pii_{kind}") for kind, cnt in pii_counts(c)],
        F.length(redact_pii(c)).cast("long").alias("redacted_len"),
    )


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from serd_spark.operators.dedup import ngram_jaccard_pairs

    d = _t(spark, sf_dir, "documents")
    ids = d.select(F.col("doc_id").alias("id_a"))
    pairs = ids.withColumn("id_b", F.col("id_a") + 1).join(
        d.select(F.col("doc_id").alias("id_b")), "id_b", "left_semi"
    )
    return ngram_jaccard_pairs(pairs, d).orderBy("id_a")


def q_minhash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-mirrorable minhash: per-doc min of md5(3-gram ‖ seed) for
    4 seeds — the signature construction the LSH path vectorizes with
    numpy, here in pure built-ins so DuckDB can verify it."""
    from serd_spark.operators.dedup import char_ngrams

    d = _t(spark, sf_dir, "documents")
    # min-per-seed computed with array_min over a transform of the
    # per-row gram array: shuffle-free (no explode + groupBy), same
    # result as the grouped form the oracle uses
    grams = char_ngrams(F.col("text"), 3)
    return d.select(
        "doc_id",
        *[
            F.array_min(
                F.transform(grams, lambda g: F.md5(F.concat(g, F.lit(str(s)))))
            ).alias(f"h{s}")
            for s in range(4)
        ],
    ).orderBy("doc_id")


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from serd_spark.operators.similarity import brute_force_topk

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).first().embedding
    return brute_force_topk(emb, list(q), k=10)


# Brute-force certification queries are capped: a crossJoin over the
# embeddings table is O(n²) by construction and exists ONLY to certify
# the bucketed scale paths (dedup_embedding / ann_ivf) at oracle scale.
# Above this many rows the guard refuses rather than silently launching
# a cartesian product that would never finish at 100 TB.
_BRUTE_FORCE_ROW_CAP = 100_000


def _assert_brute_force_scale(df: DataFrame, name: str) -> None:
    """Refuse to run a brute-force O(n²) certification query on an
    input too large for it. ``limit(cap+1).count()`` short-circuits the
    scan, so the guard itself is cheap even over a huge table."""
    n = df.limit(_BRUTE_FORCE_ROW_CAP + 1).count()
    if n > _BRUTE_FORCE_ROW_CAP:
        raise ValueError(
            f"{name} is a brute-force O(n²) certification baseline and is "
            f"capped at {_BRUTE_FORCE_ROW_CAP} input rows (got >{n - 1}); "
            "use the bucketed scale path (dedup_embedding / ann_ivf) for "
            "real workloads"
        )


def q_embedding_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact embedding near-dup pairs (cos ≥ 0.45, brute force) —
    the DuckDB-checkable baseline for the LSH-bucketed
    ``dedup_embedding`` scale path. Guarded: refuses inputs past
    ``_BRUTE_FORCE_ROW_CAP`` rows instead of going O(n²) at scale."""
    from serd_spark.operators.dedup import cosine

    emb = _t(spark, sf_dir, "embeddings")
    _assert_brute_force_scale(emb, "q_embedding_dups")
    a = emb.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("vec_a")
    )
    b = emb.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("vec_b")
    )
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", F.round(cosine(F.col("vec_a"), F.col("vec_b")), 6))
        .filter(F.col("cos") >= 0.45)
        .select("id_a", "id_b", "cos")
    )


def q_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact kNN join for 5 query vectors (brute force) — the
    DuckDB-checkable baseline for the IVF-pruned ``ann_ivf`` scale
    path. Guarded like ``q_embedding_dups``."""
    from serd_spark.operators.dedup import cosine

    emb = _t(spark, sf_dir, "embeddings")
    _assert_brute_force_scale(emb, "q_knn_join")
    qs = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    pairs = qs.crossJoin(emb).filter(F.col("vec_id") != F.col("q_id"))
    scored = pairs.select(
        "q_id",
        F.col("vec_id").alias("n_id"),
        F.round(cosine(F.col("q_vec"), F.col("embedding")), 6).alias("cos"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.col("n_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("q_id", "n_id", "cos")
    )


def q_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-duplicated k-token span statistics per document (the
    exact-substring dedup signal). The DuckDB mirror re-shingles the
    corpus and recomputes the span frequency table independently."""
    from serd_spark.operators.corpus import span_dedup_stats

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return span_dedup_stats(d, k=10)


def q_span_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring REMOVAL (corpus.py::strip_duplicated_spans —
    Lee et al. 2022): every corpus-duplicated 10-token span keeps its
    globally-first (doc_id, pos) occurrence, all other occurrences'
    tokens are removed with overlaps unioned, and each document's
    surviving text is rebuilt in ONE numpy mapInPandas crossing
    (O(n) diff/cumsum interval union). The oracle replays the whole
    pass on raw grams: positioned shingles, per-span (count, first)
    via windows, coverage expansion, anti-join, ORDER-pinned
    reassembly and md5."""
    from serd_spark.operators.corpus import strip_duplicated_spans

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = strip_duplicated_spans(d, k=10)
    return out.select(
        "doc_id",
        "n_tokens",
        "n_removed",
        F.md5("kept_text").alias("kept_md5"),
    ).orderBy("doc_id")


def q_unigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-derived unigram LM score per document. vocab_size=32 is
    deliberately below the corpus vocabulary so the out-of-vocabulary
    pricing path is exercised and cross-checked too."""
    from serd_spark.operators.corpus import unigram_logprob

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return unigram_logprob(d, vocab_size=32)


def q_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS-style winnowing fingerprints (corpus.py::winnow_stats,
    k=10 w=4): per-doc span count, fingerprint count (~2/(w+1)
    compression), and the XOR of the distinct fingerprint set — an
    order-independent value pin. The positioned span hashes are
    materialized; DuckDB replays the winnow itself (per-position
    w-window MIN → distinct → count/xor) independently. The hash
    layer below is certified separately by q_span_dedup's raw-gram
    oracle."""
    from serd_spark.operators.corpus import span_hashes, winnow_stats

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    _materialize(
        sf_dir, "winnow_spans",
        lambda: d.select(
            "doc_id",
            F.posexplode(span_hashes(F.col("text"), 10)).alias("pos", "h"),
        ),
    )
    return winnow_stats(d, k=10, w=4)


def q_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate near-dup pairs from SHARED winnowing fingerprints —
    the MOSS end use of q_winnow's fingerprint sets: docs that share
    a min-window fingerprint are exact-overlap candidates, with
    n_shared as the match-strength signal. k=3 spans (short, so the
    synthetic 40-word-vocabulary corpus genuinely collides — real
    text uses k=8-10, where winnowed collisions mean real overlap;
    at sf0.1 this deliberate miscalibration yields 337k candidate
    pairs from 5k docs, which is the corpus's property, not the
    plan's), w=4 windows; fingerprint
    buckets larger than 32 docs are pruned before the self-join
    (boilerplate guard — the linking.candidate_pairs shape; a no-op
    at this scale, load-bearing at 100 TB). The oracle replays prune
    + join + count from the materialized (doc_id, f) table; the
    winnow derivation itself is pinned by q_winnow's XOR oracle and
    the unit reference."""
    from serd_spark.operators.corpus import (
        _min_parallelism,
        span_hashes,
        winnow_from_spans,
    )

    d = _min_parallelism(
        _t(spark, sf_dir, "documents").select("doc_id", "text")
    )
    fps = (
        d.select("doc_id", span_hashes(F.col("text"), 3).alias("_spans"))
        .select(
            "doc_id",
            F.explode(winnow_from_spans(F.col("_spans"), 4)).alias("f"),
        )
        .distinct()
    )
    _materialize(sf_dir, "winnow_pair_fps", lambda: fps)
    hot = (
        fps.groupBy("f")
        .agg(F.count(F.lit(1)).alias("_m"))
        .filter(F.col("_m") > 32)
    )
    kept = fps.join(F.broadcast(hot), "f", "left_anti")
    a = kept.select(F.col("f"), F.col("doc_id").alias("id_a"))
    b = kept.select(F.col("f"), F.col("doc_id").alias("id_b"))
    return (
        a.join(b, "f")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )


def q_url_canon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization (corpus.py::canonical_url — JVM regex
    only) over messy URLs synthesized deterministically from doc_id
    on BOTH engines (the PII-op precedent): six junk classes (upper
    case, default ports, fragments, utm_*/fbclid/gclid params).
    n_variants counts how many raw variants collapse onto each
    canonical key — the crawl-dedup use. The oracle re-synthesizes
    the URLs and re-canonicalizes with its own regex chain."""
    from pyspark.sql import Window
    from serd_spark.operators.corpus import canonical_url

    d = _t(spark, sf_dir, "documents").select("doc_id")
    c = F.col("doc_id")
    site = F.concat(F.lit("site"), (c % 20).cast("string"))
    pid = (c % 100).cast("string")
    qid = (c % 50).cast("string")
    u = (
        F.when(c % 6 == 0, F.concat(
            F.lit("HTTPS://"), F.upper(site),
            F.lit(".Example.COM:443/p/"), pid,
            F.lit("?utm_source=x&id="), qid))
        .when(c % 6 == 1, F.concat(
            F.lit("https://"), site, F.lit(".example.com/p/"), pid,
            F.lit("?id="), qid))
        .when(c % 6 == 2, F.concat(
            F.lit("http://"), site, F.lit(".example.com:80/p/"), pid,
            F.lit("#sec")))
        .when(c % 6 == 3, F.concat(
            F.lit("https://"), site, F.lit(".example.com/p/"), pid,
            F.lit("?fbclid=ABC"), qid))
        .when(c % 6 == 4, F.concat(
            F.lit("https://"), site, F.lit(".example.com/p/"), pid,
            F.lit("?gclid=1&id="), qid, F.lit("&utm_medium=m")))
        .otherwise(F.concat(
            F.lit("http://"), site, F.lit(".example.com/p/"), pid))
    )
    out = d.select("doc_id", u.alias("url")).withColumn(
        "canon", canonical_url(F.col("url"))
    )
    return out.withColumn(
        "n_variants",
        F.count(F.lit(1)).over(Window.partitionBy("canon")).cast("long"),
    )


def q_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-derived BIGRAM LM score per document
    (corpus.py::bigram_logprob — conditional ln(c(prev,w)/c(prev)) in
    integer micros, the KenLM-shaped transition-fluency signal).
    vocab_size=32 is deliberately below the corpus pair vocabulary so
    the OOV pricing path is exercised; the oracle rebuilds the whole
    model from raw text with a structurally DIFFERENT pair derivation
    (positional lateral unnest vs Spark's shifted-array transform)."""
    from serd_spark.operators.corpus import bigram_logprob

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return bigram_logprob(d, vocab_size=32)


def q_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (corpus.py::dsir_weights — hashed
    word-bigram features, add-1-smoothed target/raw bucket
    distributions, per-term integer-micros ln ratios). Target
    distribution = English documents; selected ⇔ more target-like
    than raw-like. The oracle rebuilds BOTH distributions and every
    document weight from raw text with its own bigram derivation
    (positional lateral unnest vs Spark's shifted-array transform)
    and DuckDB's own hex→int bucket cast."""
    from serd_spark.operators.corpus import dsir_weights

    d = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    return dsir_weights(d, F.col("lang") == "en", n_buckets=512)


def q_nb_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-3/PaLM-style weak-label quality classifier
    (classify.py::nb_quality): multinomial Naive Bayes trained in one
    hash aggregate on "source is in the trusted set" labels, then
    every document scored by a broadcast-model join — the classifier
    family whose training IS a groupBy, so the whole fit+score is
    SQL-replayable. All log terms integer micros; pred = keep
    decision. The oracle rebuilds counts, totals, vocabulary size,
    prior and every document score from raw text."""
    from serd_spark.operators.classify import nb_quality

    d = _t(spark, sf_dir, "documents").select("doc_id", "text", "source")
    return nb_quality(
        d, F.col("source").isin("src0", "src1", "src2", "src3")
    )


# shared by the Spark query and the DuckDB oracle so the two engines
# can never disagree on the dictionary (the SQL VALUES list is
# generated from this exact list)
_GAZETTEER = ["spark", "hash join", "sort merge", "data stream", "window"]


def q_gazetteer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dictionary-based entity-mention extraction
    (classify.py::gazetteer_mentions) — the FlashText/gazetteer step
    that seeds KG entity linking: a broadcast dictionary of 1- and
    2-token surface forms matched against every document's token
    stream (bigrams formed from the shifted token array, never a
    positional self-join). The oracle re-derives unigram and bigram
    candidates with a positional lateral unnest and joins the same
    VALUES dictionary."""
    from serd_spark.operators.classify import gazetteer_mentions

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return gazetteer_mentions(d, _GAZETTEER)


def q_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI collocation mining (corpus.py::pmi_collocations — the
    word2vec-phrases / Church-&-Hanks pass): adjacent-pair PMI over
    the corpus with a min-count guard and a (pmi DESC, pair ASC)
    top-k via TakeOrderedAndProject. The PMI argument is a pinned
    DOUBLE parenthesization over exact integer counts, ln'd and
    rounded to micros — the oracle replays counts, the identical
    float expression, and the cut."""
    from serd_spark.operators.corpus import pmi_collocations

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return pmi_collocations(d, top_k=40, min_count=5)


def q_sem_decon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space benchmark decontamination
    (similarity.py::semantic_decontaminate): vec_id % 37 == 0 plays
    the benchmark set (broadcast), every other vector is corpus; per
    corpus vector the max 6-dp cosine in integer micros, the count of
    benchmark items above threshold, and the contamination flag —
    the semantic complement to q_decontaminate's exact 13-gram rule.
    The oracle replays every pair cosine, the micro scaling, and both
    aggregates."""
    from serd_spark.operators.similarity import semantic_decontaminate

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return semantic_decontaminate(
        emb, F.col("vec_id") % 37 == 0, threshold_micros=450_000
    )


def q_ccnet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet perplexity bucketing (corpus.py::ccnet_buckets):
    per-language head/middle/tail thirds by bigram-LM mean log-prob
    (vocab 32 so the OOV path is exercised, as in q_bigram_lm), cuts
    at permille 333/667 via exact_quantiles' rank rule. Composition
    certificate: the oracle rebuilds the bigram model (its own pair
    derivation), the per-lang distinct-value cumsum, the ceil rank
    rule, and the bucket CASE."""
    from serd_spark.operators.corpus import ccnet_buckets

    d = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    return ccnet_buckets(d, vocab_size=32)


def q_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate document clusters with a canonical survivor
    (dedup.py::dup_clusters): the LSH pair set closed transitively by
    connected components, min-string-id canon per cluster, singletons
    rejoined — "drop the non-canonical rows" as one filter. The
    oracle replays the ENTIRE chain from the materialized
    signatures/bands: bucket-cap prune, band join, agreement verify
    (threshold 0.5 — same contract as dedup_minhash_lsh), recursive-
    CTE reachability closure, canon labels, sizes, and flags."""
    from serd_spark.operators.dedup import dup_clusters
    from serd_spark.operators.linking import lsh_bands, signatures

    docs = _t(spark, sf_dir, "documents")
    named = docs.select(
        F.col("doc_id").cast("string").alias("entity"),
        F.col("text").alias("name"),
    )
    _materialize(sf_dir, "minhash/sigs", lambda: signatures(named))
    _materialize(
        sf_dir, "minhash/bands",
        lambda: lsh_bands(
            spark.read.parquet(_oracle_path(sf_dir, "minhash/sigs"))
        ),
    )
    return dup_clusters(docs, threshold=0.5)


def q_mm_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image perceptual-hash dedup (multimodal.py::dhash64 /
    image_dhash — the LAION-style multimodal near-dup primitive) over
    synthesized variant groups: the same pixels as BMP and PNG/VP8L
    must hash IDENTICALLY (lossless_match certifies real cross-format
    decode + the pinned integer dHash), the q92 JPEG re-encode of the
    same pixels reports its Hamming distance, and an unrelated
    control image anchors the far field. The oracle replays the group
    pivot and xor/bit_count arithmetic from the materialized
    (media_id, dhash) table; the hash layer itself is certified by
    the independent-reference unit tests and the cross-format match
    this query asserts."""
    from serd_spark.operators.multimodal import (
        image_dhash,
        synthesize_image_variants,
    )

    media = synthesize_image_variants(spark, max(16, _n_pages(sf_dir) // 64))
    _materialize(sf_dir, "mm_dhash", lambda: image_dhash(media))
    g = image_dhash(media).select(
        F.expr("media_id div 4").alias("group_id"),
        (F.col("media_id") % 4).alias("v"),
        "dhash",
    )
    p = g.groupBy("group_id").agg(
        *[
            F.max(F.when(F.col("v") == i, F.col("dhash"))).alias(f"h{i}")
            for i in range(4)
        ]
    )
    return p.select(
        "group_id",
        (F.col("h0") == F.col("h1")).cast("int").alias("lossless_match"),
        F.bit_count(F.col("h0").bitwiseXOR(F.col("h2")))
        .cast("long")
        .alias("jpeg_hamming"),
        F.bit_count(F.col("h0").bitwiseXOR(F.col("h3")))
        .cast("long")
        .alias("control_hamming"),
    )


def q_mm_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio energy windowing (multimodal.py::audio_energy — the
    VAD/silence-segmentation primitive) over integer-sawtooth WAVs
    whose every sample is a pure integer function of
    (media_id, index). End-to-end certificate: Spark goes
    bytes → wave decode → numpy windowed sum-of-squares; the oracle
    REGENERATES every raw sample with generate_series and re-windows
    — a divergence anywhere in the PCM path (byte order, truncation,
    window edges) breaks the hash."""
    from serd_spark.operators.multimodal import (
        audio_energy,
        synthesize_audio_saw,
    )

    media = synthesize_audio_saw(spark, max(16, _n_pages(sf_dir) // 64))
    return audio_energy(media, window_samples=100)


def q_mm_vp8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lossy-WebP decode certificate (vp8_codec.py — intra VP8
    keyframes, the dominant web image payload after JPEG). The synth
    table sweeps every prediction path (16x16 DC/V/H/TM + B_PRED with
    all ten 4x4 submodes) and three quantizer levels; ``exp_sum`` is
    the encoder's closed-loop integer pixel sum, so
    ``dec_sum == exp_sum`` per row certifies the FULL decode chain
    (bool decoder → token trees → dequant → inverse DCT/WHT → intra
    prediction → YUV→RGB) bit-exactly inside Spark. The oracle
    replays the per-qi aggregation from the materialized per-row
    stats; n_exact == n_media is the in-band proof."""
    from serd_spark.operators.multimodal import (
        synthesize_webp_vp8,
        vp8_decode_stats,
    )

    media = synthesize_webp_vp8(spark, max(16, _n_pages(sf_dir) // 128))
    _materialize(sf_dir, "mm_vp8", lambda: vp8_decode_stats(media))
    return (
        vp8_decode_stats(media)
        .groupBy("qi")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum("n_bytes").alias("total_bytes"),
            F.sum((F.col("dec_sum") == F.col("exp_sum")).cast("long"))
            .alias("n_exact"),
            F.sum("dec_sum").alias("sum_pixels"),
        )
        .orderBy("qi")
    )


def q_pdf_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PDF text extraction (operators/pdf_codec.py): real classic
    PDFs synthesized per row — page tree, xref, Flate streams, and
    the three text-show encodings (literal-with-escapes / hex / TJ
    kerning array) rotating by id — decoded back strict through the
    bounded parser. Page text is closed-form in (id, page), so the
    oracle regenerates every document's full text, page count, char
    count and md5 from range() without reading a payload byte: a
    complete encode→parse certificate over the object scanner, page
    walk, bounded inflate, string escapes and the TJ space rule.
    One mapInPandas crossing each way, row-local, no shuffle."""
    from serd_spark.operators.pdf_codec import pdf_text, synthesize_pdfs

    media = synthesize_pdfs(spark, max(64, _n_pages(sf_dir) // 8))
    out = pdf_text(media, strict=True)
    return out.select(
        "media_id",
        "n_pages",
        "n_chars",
        F.md5("text").alias("text_md5"),
    )


def q_rdfxml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RDF/XML — the fourth concrete RDF syntax (rdf/rdfxml.py):
    formula-derived documents exercising typed nodes, xml:lang,
    rdf:datatype, rdf:resource, rdf:li containers, and
    property-attribute blank nodes are parsed strict; per document
    the triple count, blank count, md5 over the sorted canonical
    N-Triples lines, AND a write_rdfxml→reparse round-trip verdict
    are emitted. The oracle regenerates every expected N-Triples
    line closed-form from the doc id — a complete parse certificate
    without an XML engine on the oracle side. One mapInPandas
    crossing, document-scoped, no shuffle (the 100 TB shape)."""
    from serd_spark.operators.serialize import rdfxml_certificate

    n = max(64, _n_pages(sf_dir) // 8)
    return rdfxml_certificate(spark, n).orderBy("doc_id")


_SHACL_SHAPES_TTL = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix s: <http://schema.org/> .
@prefix ex: <http://example.org/shapes/> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .

ex:ThingShape a sh:NodeShape ;
  sh:targetClass s:Thing ;
  sh:property [ sh:path s:name ; sh:minCount 1 ; sh:maxCount 1 ;
                sh:datatype xsd:string ; sh:maxLength 18 ] ;
  sh:property [ sh:path s:relatedLink ; sh:nodeKind sh:IRI ;
                sh:class s:Thing ] ;
  sh:property [ sh:path s:review ; sh:nodeKind sh:BlankNode ] ;
  sh:property [ sh:path s:ratingValue ; sh:pattern "^[0-9]+\\\\.[0-9]$" ] .
"""


def q_shacl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHACL-lite validation (operators/shacl.py) over the REAL
    extracted KG: the shapes graph is Turtle parsed by this repo's
    own parser, compiled driver-side, and executed as declarative
    plans — focus filter on the type triples, one subject equi-join
    per property shape, per-focus hash-agg cardinality, row-local
    codegen value checks, left-anti class check. The report is
    aggregated per (constraint, path) with focus/value pins; the
    oracle replays every constraint relationally over the
    materialized triple table. Validation runs on the DISTINCT
    triple set (SHACL is graph semantics — a graph is a set)."""
    from serd_spark.operators.shacl import parse_shapes_turtle, validate

    _materialize_triples(spark, sf_dir)
    shapes = parse_shapes_turtle(_SHACL_SHAPES_TTL)
    graph = (
        _kg_triples(spark, sf_dir)
        .select("s", "p", "o", "o_kind", "o_dt", "o_lang")
        .distinct()
    )
    report = validate(graph, shapes)
    pin = F.conv(
        F.substring(
            F.md5(F.concat_ws("\u0001", "focus", "value")), 1, 10
        ),
        16, 10,
    ).cast("long")
    return (
        report.groupBy("constraint", "path")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("focus").alias("n_focus"),
            F.sum(pin).alias("pin"),
        )
        .orderBy("constraint", "path")
    )


def q_mm_exif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXIF metadata extraction (operators/exif_codec.py): real APP1
    segments (TIFF IFD0 + Exif sub-IFD, alternating II/MM byte
    order) spliced into real JPEGs, parsed back byte-level by the
    bounded IFD walker, aggregated per tag with a per-row
    (media_id, value) content pin. Every tag value is closed-form in
    the media id, so the oracle regenerates ALL expected rows from
    generate_series without touching a payload byte — a full
    encode→parse certificate. Map-side only until the bounded-key
    tag aggregation."""
    from serd_spark.operators.multimodal import (
        exif_tags,
        synthesize_media_exif,
    )

    media = synthesize_media_exif(
        spark, max(64, _n_pages(sf_dir) // 64)
    )
    tags = exif_tags(media)
    pin = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "\u0001",
                    F.col("media_id").cast("string"), "value"
                )
            ),
            1, 10,
        ),
        16, 10,
    ).cast("long")
    return (
        tags.groupBy("ifd", "name")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("value").alias("n_vals"),
            F.sum(pin).alias("pin"),
        )
        .orderBy("ifd", "name")
    )


def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters without a full-vocabulary shuffle
    (stats.py::heavy_hitters): a count-min pass finds candidate
    cells, the row stream is filtered map-side with per-depth
    IN-lists (est >= exact ⇒ no false negatives), and only candidate
    rows reach the exact aggregate. The oracle is the NAIVE full
    GROUP BY ... HAVING — equality proves the sketch path drops
    nothing and invents nothing."""
    from serd_spark.operators.stats import heavy_hitters

    d = _t(spark, sf_dir, "documents")
    words = d.select(
        F.explode(
            F.filter(
                F.split(
                    F.lower(F.regexp_replace(F.trim("text"), r"\s+", " ")),
                    " ",
                ),
                lambda x: x != "",
            )
        ).alias("w")
    )
    return heavy_hitters(words, "w", min_count=500)


def q_pair_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive training-pair mining
    (dedup.py::mine_training_pairs): LSH candidates verified into
    POSITIVES (est >= 0.5) and HARD NEGATIVES (0.25 <= est < 0.5 —
    same-bucket mates, the negatives in-batch sampling can't
    produce). Same plan shape as dedup_minhash_lsh; the oracle
    replays prune → band join → agreement verify → label CASE from
    the materialized signatures/bands."""
    from serd_spark.operators.dedup import mine_training_pairs
    from serd_spark.operators.linking import lsh_bands, signatures

    docs = _t(spark, sf_dir, "documents")
    named = docs.select(
        F.col("doc_id").cast("string").alias("entity"),
        F.col("text").alias("name"),
    )
    _materialize(sf_dir, "minhash/sigs", lambda: signatures(named))
    _materialize(
        sf_dir, "minhash/bands",
        lambda: lsh_bands(
            spark.read.parquet(_oracle_path(sf_dir, "minhash/sigs"))
        ),
    )
    return mine_training_pairs(docs, pos_threshold=0.5, neg_floor=0.25)


def q_crawl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-freshness roll-up (corpus.py::crawl_stats): per host —
    URLs, fetches, refetched URLs, total first-to-last fetch span in
    epoch seconds — the recrawl-scheduler's input table. The oracle
    re-derives hosts and re-aggregates both levels from the
    materialized (url, warc_ts) fetch log."""
    from serd_spark.operators.corpus import crawl_stats

    pages = _pages(spark, sf_dir)
    _materialize(
        sf_dir, "pages_crawl",
        lambda: _pages(spark, sf_dir).select("url", "warc_ts"),
    )
    return crawl_stats(pages)


def q_rare_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rare-token scrubbing (corpus.py::mask_rare_tokens — the
    memorization-mitigation rewrite): tokens under the corpus count
    floor become <unk>; per doc the masked count and an md5 pinning
    the full rewritten text content AND order. The oracle rebuilds
    the keep-vocabulary, re-masks every position, and re-assembles
    the string with an order-pinned string_agg."""
    from serd_spark.operators.corpus import mask_rare_tokens

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return mask_rare_tokens(d, min_count=30)


# shared Spark-query/oracle blocklist (same one-list discipline as
# _GAZETTEER)
_BLOCKLIST = ["slow", "big table", "value"]


def q_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-blocklist filtering (classify.py::blocklist_stats — the
    C4/FineWeb "bad words" pass): per-doc hit counts against a
    broadcast 1-/2-token blocklist, DENSITY in integer ppm of the
    token count (a single incidental hit must not kill a long
    document), and the drop flag. The oracle replays matching
    (positional lateral unnest + the same VALUES list), token counts,
    and the exact div arithmetic."""
    from serd_spark.operators.classify import blocklist_stats

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return blocklist_stats(d, _BLOCKLIST, max_hits_ppm=60_000)


def q_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-distribution Shannon entropy per document
    (corpus.py::token_entropy — the frequency-weighted
    vocabulary-diversity signal beside repetition_features' TTR).
    Each (doc, token) term micro-rounded before the per-doc sum; the
    oracle rebuilds counts, totals, every term and the integer-div
    floor from raw text."""
    from serd_spark.operators.corpus import token_entropy

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return token_entropy(d)


def q_kg_twohop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL-shaped graph-pattern query over the EXTRACTED triple
    graph: the 2-hop relatedLink closure ?s →(relatedLink) ?m
    →(relatedLink) ?t — a basic-graph-pattern self-join on the triple
    table (the KG-query surface, beside the host-graph analytics) —
    with per-source distinct-target and path counts, top-k by
    (paths DESC, s ASC). Edges are the deduped canonical triples, so
    the self-join keys on fixed-width IRIs; at 100 TB this is the
    (o = s) sort-merge/bucket join the subject-hash bucketing in
    materialize.py exists for. The oracle replays the join over the
    materialized triple table."""
    _materialize_triples(spark, sf_dir)
    rel = "http://schema.org/relatedLink"
    e = (
        _kg_triples(spark, sf_dir)
        .filter(F.col("p") == rel)
        .select("s", "o")
        .distinct()
    )
    a, b = e.alias("a"), e.alias("b")
    return (
        a.join(b, F.col("a.o") == F.col("b.s"))
        .groupBy(F.col("a.s").alias("s"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_paths"),
            F.count_distinct(F.col("b.o")).cast("long").alias("n_targets"),
        )
        .orderBy(F.desc("n_paths"), F.asc("s"))
        .limit(50)
    )


def q_kg_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for KG-embedding training
    (graph.py::negative_samples): tail corruptions of the extracted
    relatedLink edges drawn via md5 buckets over the node set — a
    pure function of the edge set (no RNG: retries and shards can
    never change the training data), empty buckets pinned to the
    global min node, self-corruptions flagged. The oracle replays
    nodes, buckets, representatives, fallback and flags over the
    materialized triples."""
    from serd_spark.operators.graph import negative_samples

    _materialize_triples(spark, sf_dir)
    rel = "http://schema.org/relatedLink"
    e = (
        _kg_triples(spark, sf_dir)
        .filter(F.col("p") == rel)
        .select(F.col("s").alias("src"), F.col("o").alias("dst"))
        .distinct()
    )
    return negative_samples(e, n_neg=2, n_buckets=32)


def q_sparql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mini-SPARQL BGP compiler (plans/sparql.py): a 4-pattern
    star+chain SELECT — page name, its review's author (a blank-node
    hop), its rating — parsed from SPARQL text and compiled to
    constant-pushdown scans + shared-variable joins over the
    extracted triple table. The oracle hand-writes the equivalent
    relational join, so parser, compiler and join semantics are all
    under the hash."""
    from serd_spark.plans.sparql import sparql_query

    _materialize_triples(spark, sf_dir)
    q = """
    PREFIX s: <http://schema.org/>
    SELECT ?page ?name ?author ?rating WHERE {
      ?page s:name ?name .
      ?page s:review ?rev .
      ?rev s:author ?author .
      ?page s:ratingValue ?rating .
    } ORDER BY ?page LIMIT 300
    """
    return sparql_query(_kg_triples(spark, sf_dir), q)


def q_sparql_opt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL compound graph patterns (plans/sparql.py): a UNION of
    two link predicates (bag semantics), joined to the name pattern,
    with the rating attached via OPTIONAL (left join — only ~16% of
    pages carry a rating, the rest must surface as NULL). DISTINCT +
    ORDER + LIMIT on top. The oracle replays it as UNION ALL +
    LEFT JOIN, so the left-join null semantics and the bag/distinct
    distinction are both under the hash."""
    from serd_spark.plans.sparql import sparql_query

    _materialize_triples(spark, sf_dir)
    q = """
    PREFIX s: <http://schema.org/>
    SELECT DISTINCT ?page ?link ?rating WHERE {
      { ?page s:relatedLink ?link . } UNION { ?page s:review ?link . }
      ?page s:name ?name .
      OPTIONAL { ?page s:ratingValue ?rating . }
    } ORDER BY ?page ?link LIMIT 500
    """
    return sparql_query(_kg_triples(spark, sf_dir), q)


def q_sparql_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL property paths (plans/sparql.py): transitive closure
    relatedLink+ (iterated squaring, O(log d) rounds), with the
    review author attached through a sequence path review/author
    under OPTIONAL. The oracle replays the closure as a DuckDB
    recursive CTE (UNION = distinct-pair semantics, exactly SPARQL's
    OneOrMorePath) and the sequence as a two-table join, so the
    squaring loop's fixpoint is certified against an independent
    recursive evaluation."""
    from serd_spark.plans.sparql import sparql_query

    _materialize_triples(spark, sf_dir)
    q = """
    PREFIX s: <http://schema.org/>
    SELECT ?x ?y ?auth WHERE {
      ?x s:relatedLink+ ?y .
      OPTIONAL { ?x s:review/s:author ?auth . }
    } ORDER BY ?x ?y LIMIT 600
    """
    out = sparql_query(_kg_triples(spark, sf_dir), q)
    # '' for no-author: 'auth' sorts first in the driver's
    # column-name-ordered row compare, so a NULL there would hit the
    # comparer's mixed-type row sort (q_sparql_opt keeps raw NULLs —
    # its nullable column sorts last behind a unique key)
    return out.select(
        "x", "y", F.coalesce(F.col("auth"), F.lit("")).alias("auth")
    )


def q_sparql_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL ZeroOrMorePath (plans/sparql.py): relatedLink* from
    review-carrying pages — the OneOrMorePath closure UNIONED with
    the identity relation over the graph nodes (SPARQL 1.1
    zero-length-path semantics), so every x appears paired with
    itself as well as its closure. The oracle replays the closure as
    a recursive CTE, the node set as subjects∪objects, and the same
    review-subject restriction."""
    from serd_spark.plans.sparql import sparql_query

    _materialize_triples(spark, sf_dir)
    q = """
    PREFIX s: <http://schema.org/>
    SELECT ?x ?y WHERE {
      ?x s:review ?rev .
      ?x s:relatedLink* ?y .
    } ORDER BY ?x ?y LIMIT 600
    """
    return sparql_query(_kg_triples(spark, sf_dir), q)


def q_sparql_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL aggregates (plans/sparql.py): GROUP BY predicate with
    COUNT(*), COUNT(DISTINCT subject), and MIN/MAX object — parsed
    from SPARQL text and compiled to groupBy().agg(). The oracle
    replays the same aggregate in DuckDB, so aggregate scoping, the
    exact distinct count, and string-ordered MIN/MAX (both engines
    memcmp UTF-8 bytes) all sit under the hash."""
    from serd_spark.plans.sparql import sparql_query

    _materialize_triples(spark, sf_dir)
    q = """
    SELECT ?p (COUNT(*) AS ?n) (COUNT(DISTINCT ?subj) AS ?n_subj)
           (MIN(?o) AS ?lo) (MAX(?o) AS ?hi)
    WHERE { ?subj ?p ?o . } GROUP BY ?p ORDER BY ?p
    """
    return sparql_query(_kg_triples(spark, sf_dir), q)


def q_sparql_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL arithmetic aggregates + HAVING (plans/sparql.py): per
    review-author rating stats — COUNT, micros-quantized exact-integer
    SUM/AVG, and lexicographically-sorted GROUP_CONCAT — with HAVING
    pruning singleton groups post-aggregate. The oracle replays the
    join, the floor(x*1e6) quantization, the floor-divided mean, and
    the ORDER BY-pinned string_agg in DuckDB, so the whole
    determinism discipline (integer sums + one final division) sits
    under the hash."""
    from serd_spark.plans.sparql import sparql_query

    _materialize_triples(spark, sf_dir)
    q = """
    PREFIX s: <http://schema.org/>
    SELECT ?auth (COUNT(*) AS ?n) (SUM(?v) AS ?total) (AVG(?v) AS ?mean)
           (GROUP_CONCAT(?v; SEPARATOR="|") AS ?vals)
    WHERE {
      ?page s:review ?rev .
      ?rev s:author ?auth .
      ?page s:ratingValue ?v .
    }
    GROUP BY ?auth HAVING (?n >= 2) ORDER BY ?auth
    """
    return sparql_query(_kg_triples(spark, sf_dir), q)


def q_sparql_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL FILTER EXISTS / NOT EXISTS (plans/sparql.py): named
    things that carry a relatedLink but no review — a semi join plus
    an anti join at their written positions. The oracle uses DuckDB's
    own correlated EXISTS subqueries, a different anti/semi
    formulation that must select the identical rows."""
    from serd_spark.plans.sparql import sparql_query

    _materialize_triples(spark, sf_dir)
    q = """
    PREFIX s: <http://schema.org/>
    SELECT ?subj ?name WHERE {
      ?subj s:name ?name .
      FILTER EXISTS { ?subj s:relatedLink ?l . }
      FILTER NOT EXISTS { ?subj s:review ?r . }
    } ORDER BY ?subj ?name
    """
    return sparql_query(_kg_triples(spark, sf_dir), q)


def q_sparql_construct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL CONSTRUCT (plans/sparql.py): rewrite review→author
    chains as direct hasAuthor edges plus one type triple per author.
    CONSTRUCT instantiates each template triple per solution and
    distinct-unions them (an RDF graph is a SET — the type triple
    would otherwise appear once per review), yielding a triple
    DataFrame the NT/Turtle writers can serialize directly. Oracle:
    the same two projections UNION'd (distinct) in DuckDB."""
    from serd_spark.plans.sparql import sparql_query

    _materialize_triples(spark, sf_dir)
    q = """
    PREFIX s: <http://schema.org/>
    CONSTRUCT {
      ?page <http://ex.org/kg/hasAuthor> ?auth .
      ?auth a <http://ex.org/kg/Author> .
    } WHERE { ?page s:review ?rev . ?rev s:author ?auth . }
    """
    return sparql_query(_kg_triples(spark, sf_dir), q)


def q_sparql_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL 1.1 Update (plans/sparql.py::sparql_update): rename
    every relatedLink edge to seeAlso in one DELETE/INSERT/WHERE —
    WHERE solutions instantiate both templates via the CONSTRUCT
    machinery (evaluated against the ORIGINAL graph, per spec), then
    one anti-join removes the delete set and one dedup'd union
    appends the inserts. Output is the updated store's per-predicate
    counts + content pin; the oracle replays the whole rewrite
    set-wise in SQL from the materialized triples."""
    from serd_spark.plans.sparql import sparql_update

    _materialize_triples(spark, sf_dir)
    store = _kg_triples(spark, sf_dir).select("s", "p", "o").distinct()
    q = """
    PREFIX s: <http://schema.org/>
    DELETE { ?x s:relatedLink ?y }
    INSERT { ?x <http://www.w3.org/2000/01/rdf-schema#seeAlso> ?y }
    WHERE { ?x s:relatedLink ?y }
    """
    out = sparql_update(store, q)
    pin = F.conv(
        F.substring(F.md5(F.concat_ws("\u0001", "s", "o")), 1, 10),
        16,
        10,
    ).cast("long")
    return (
        out.groupBy("p")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(pin).cast("long").alias("pin"),
        )
        .orderBy("p")
    )


def q_graphs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-graph (quad) semantics: TriG islands put their triples
    in per-document named graphs while every other syntax lands in
    the default graph — the g column is part of the canonical
    encoding end to end (extraction, dedup, NQ writer). Output: per
    graph-kind row counts, distinct graphs/subjects, and an
    md5-derived content pin over the full (g, s, p, o) quad — so a
    graph label lost or leaked between islands breaks the hash. The
    oracle replays the same aggregate over the materialized quads."""
    _materialize_triples(spark, sf_dir)
    t = _kg_triples(spark, sf_dir)
    pin = F.conv(
        F.substring(
            F.md5(F.concat_ws("\u0001", "g", "s", "p", "o")), 1, 10
        ),
        16, 10,
    ).cast("long")
    return (
        t.groupBy((F.col("g") != "").alias("is_named"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("g").alias("n_graphs"),
            F.count_distinct("s").alias("n_subj"),
            F.sum(pin).alias("pin"),
        )
        .orderBy("is_named")
    )


def q_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recrawl scheduler / URL frontier (operators/frontier.py): the
    fetch log (with synthetic extra fetches and a deterministic
    change signal, both pure md5 functions of (url, ts) since the
    corpus's own recrawls are byte-stable) collapses to per-URL
    revisit intervals — the integer Cho/Garcia-Molina estimator with
    both clamps exercised — then each host's FIFO politeness queue is
    scheduled EXACTLY via the running-max decomposition
    t_i = delay*i + cummax(due_i - delay*i). The oracle replays the
    fetch synthesis, the estimator arithmetic (truncating DIV), and
    both window passes from the materialized (url, warc_ts) log; an
    md5 quarter of hosts keeps the row-level output bounded."""
    from serd_spark.operators.frontier import recrawl_schedule

    pages = _pages(spark, sf_dir)
    _materialize(
        sf_dir, "pages_crawl",
        lambda: _pages(spark, sf_dir).select("url", "warc_ts"),
    )
    base = pages.select(
        "url", F.col("warc_ts").cast("long").alias("ts0")
    )
    # 1 + (md5(url) % 4) fetches per log row, one hour apart
    k_max = (
        F.conv(F.substring(F.md5("url"), 3, 2), 16, 10).cast("long") % 4
    )
    ex = base.withColumn(
        "k", F.explode(F.sequence(F.lit(0).cast("long"), k_max))
    ).select("url", (F.col("ts0") + 3600 * F.col("k")).alias("ts"))
    host = F.regexp_extract("url", r"^[a-z][a-z0-9+.-]*://([^/?#]+)", 1)
    version = F.when(
        F.substring(F.md5("url"), 1, 2) < "55",
        F.substring(
            F.md5(F.concat(F.col("url"), F.col("ts").cast("string"))), 1, 4
        ),
    ).otherwise(F.lit("v0"))
    fetches = ex.select(
        "url", host.alias("host"), "ts", version.alias("version")
    )
    out = recrawl_schedule(
        fetches,
        min_interval=86_400,
        max_interval=86_400 * 2,
        politeness_delay=5,
    )
    return (
        out.filter(F.substring(F.md5("host"), 1, 2) < "40")
        .select(
            "host", "url", "n_fetches", "n_versions", "interval_s",
            "next_due", "slot", "sched_ts",
        )
        .orderBy("host", "slot")
    )


def q_sitemap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap ingestion (operators/sitemap.py): per-host <urlset>
    XML is synthesized in-plan from the page URLs (entity-escaped
    query strings, md5-derived lastmod, priority present on only an
    md5 half of entries) plus <sitemapindex> pointers for an md5
    quarter of hosts; parse_sitemaps recovers every entry with pure
    JVM regex + entity decoding. The oracle rebuilds the identical
    XML strings in SQL (string_agg ORDER BY = sort_array) and
    re-extracts with the same (?s)/lazy/\\b patterns and the same
    replace chain — two regex engines, one entry table."""
    from serd_spark.operators.sitemap import parse_sitemaps

    pages = _pages(spark, sf_dir)
    _materialize(
        sf_dir, "pages_meta", lambda: _pages(spark, sf_dir).select("url", "html")
    )
    urls = pages.select("url").distinct()
    host = F.regexp_extract("url", r"^[a-z][a-z0-9+.-]*://([^/?#]+)", 1)
    digit = (
        F.conv(F.substring(F.md5("url"), 5, 2), 16, 10).cast("long") % 10
    ).cast("string")
    loc_raw = F.concat(F.col("url"), F.lit("?ref=sitemap&id="), digit)
    esc = F.replace(loc_raw, F.lit("&"), F.lit("&amp;"))
    entry = F.concat(
        F.lit("  <url>\n    <loc>"), esc,
        F.lit("</loc>\n    <lastmod>2026-01-1"), digit,
        F.lit("</lastmod>\n"),
        F.when(
            digit < "5",
            F.concat(F.lit("    <priority>0."), digit,
                     F.lit("</priority>\n")),
        ).otherwise(F.lit("")),
        F.lit("  </url>"),
    )
    urlsets = (
        urls.select(host.alias("host"), entry.alias("entry"))
        .groupBy("host")
        .agg(
            F.concat(
                F.lit('<urlset xmlns="http://www.sitemaps.org/'
                      'schemas/sitemap/0.9">\n'),
                F.array_join(F.sort_array(F.collect_list("entry")), "\n"),
                F.lit("\n</urlset>"),
            ).alias("xml")
        )
        .select(
            F.concat(F.lit("https://"), "host",
                     F.lit("/sitemap.xml")).alias("sitemap_url"),
            "xml",
        )
    )
    hosts = urls.select(host.alias("host")).distinct()
    indexes = hosts.filter(F.substring(F.md5("host"), 1, 2) < "40").select(
        F.concat(F.lit("https://"), "host",
                 F.lit("/sitemap_index.xml")).alias("sitemap_url"),
        F.concat(
            F.lit("<sitemapindex>\n  <sitemap>\n    <loc>https://"),
            "host",
            F.lit("/sitemap.xml</loc>\n    <lastmod>2026-02-01"
                  "</lastmod>\n  </sitemap>\n</sitemapindex>"),
        ).alias("xml"),
    )
    parsed = parse_sitemaps(urlsets.unionByName(indexes))
    pin = F.conv(F.substring(F.md5("loc"), 1, 10), 16, 10).cast("long")
    return (
        parsed.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("loc").alias("n_locs"),
            F.count("lastmod").alias("n_lastmod"),
            F.count("priority").alias("n_priority"),
            F.sum(pin).alias("pin"),
        )
        .orderBy("kind")
    )


def q_feeds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RSS/Atom feed-item extraction (operators/sitemap.py::
    parse_feeds): per-host feeds synthesized in-plan from the page
    URLs — hosts are split RSS vs Atom by an md5 bit, links carry
    entity-escaped query strings, pubDate/updated present on only an
    md5 half of entries, Atom links in attribute form. The oracle
    rebuilds the identical XML in SQL and re-extracts with the same
    block/field regexes and replace chain — two regex engines, one
    item table (the q_sitemap discipline for the second discovery
    channel)."""
    from serd_spark.operators.sitemap import parse_feeds

    pages = _pages(spark, sf_dir)
    _materialize(
        sf_dir, "pages_meta",
        lambda: _pages(spark, sf_dir).select("url", "html"),
    )
    urls = pages.select("url").distinct()
    host = F.regexp_extract("url", r"^[a-z][a-z0-9+.-]*://([^/?#]+)", 1)
    d = (
        F.conv(F.substring(F.md5("url"), 5, 2), 16, 10).cast("long") % 10
    ).cast("string")
    esc = F.replace(
        F.concat(F.col("url"), F.lit("?ref=feed&id="), d),
        F.lit("&"),
        F.lit("&amp;"),
    )
    rss_item = F.concat(
        F.lit("  <item>\n    <title>Page "), d,
        F.lit("</title>\n    <link>"), esc,
        F.lit("</link>\n    <guid>"), F.col("url"),
        F.lit("</guid>\n"),
        F.when(
            d < "5",
            F.concat(F.lit("    <pubDate>Mon, 0"), d,
                     F.lit(" Jan 2026</pubDate>\n")),
        ).otherwise(F.lit("")),
        F.lit("  </item>"),
    )
    atom_entry = F.concat(
        F.lit("  <entry>\n    <title>Page "), d,
        F.lit('</title>\n    <link href="'), esc,
        F.lit('"/>\n    <id>'), F.col("url"),
        F.lit("</id>\n"),
        F.when(
            d < "5",
            F.concat(F.lit("    <updated>2026-01-1"), d,
                     F.lit("</updated>\n")),
        ).otherwise(F.lit("")),
        F.lit("  </entry>"),
    )
    is_rss = F.substring(F.md5(host), 1, 2) < "80"
    feeds = (
        urls.select(
            host.alias("host"),
            is_rss.alias("is_rss"),
            F.when(is_rss, rss_item).otherwise(atom_entry).alias("entry"),
        )
        .groupBy("host", "is_rss")
        .agg(
            F.concat(
                F.when(
                    F.col("is_rss"),
                    F.lit('<rss version="2.0"><channel>\n'),
                ).otherwise(
                    F.lit('<feed xmlns="http://www.w3.org/2005/Atom">\n')
                ),
                F.array_join(F.sort_array(F.collect_list("entry")), "\n"),
                F.when(
                    F.col("is_rss"), F.lit("\n</channel></rss>")
                ).otherwise(F.lit("\n</feed>")),
            ).alias("xml")
        )
        .select(
            F.concat(F.lit("https://"), "host", F.lit("/feed")).alias(
                "feed_url"
            ),
            "xml",
        )
    )
    parsed = parse_feeds(feeds)
    pin = F.conv(F.substring(F.md5("link"), 1, 10), 16, 10).cast("long")
    return (
        parsed.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("link").alias("n_links"),
            F.count("title").alias("n_titles"),
            F.count("entry_id").alias("n_ids"),
            F.count("published").alias("n_pub"),
            F.sum(pin).alias("pin"),
        )
        .orderBy("kind")
    )


def q_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate cascade (stats.py::rollup_cascade):
    hourly from raw events (the only full scan), daily from hourly,
    weekly from daily — decomposable count/integer-cents measures, so
    the cascade is exactly the direct aggregate at every grain. The
    oracle derives each grain from the PREVIOUS one with chained
    CTEs, replaying the cascade itself."""
    from serd_spark.operators.stats import rollup_cascade

    e = _t(spark, sf_dir, "events").select(
        "ts", "event_type", _cents(F.col("value")).alias("value_cents")
    )
    return rollup_cascade(e).orderBy(
        "grain", "bucket_start", "event_type"
    )


def q_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-biased deterministic top-k sampling per language
    (corpus.py::priority_sample — integer md5-priority div weight,
    the quality-aware sibling of q_stratified_sample). Weight =
    character length + 1. The oracle replays the priority arithmetic
    and the per-stratum rank with its own window."""
    from serd_spark.operators.corpus import priority_sample

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", (F.length("text") + 1).cast("long").alias("w")
    )
    return (
        priority_sample(d, 5, "w", stratum_col="lang")
        .select("lang", "doc_id", "w")
        .orderBy("lang", "doc_id")
    )


def q_url_templates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL path-template mining (corpus.py::url_template_stats —
    segment-level {n}/{uuid}/{hex} classification + sorted query
    parameter names, all Java∩RE2 full-segment regexes in a JVM
    transform). Input: the page URLs plus md5-derived hex / uuid /
    query variants so every rule fires. The oracle regenerates the
    variants and replays the classifier with DuckDB's own
    list_transform + regexp_matches."""
    from serd_spark.operators.corpus import url_template_stats

    pages = _pages(spark, sf_dir)
    _materialize(
        sf_dir, "pages_meta",
        lambda: _pages(spark, sf_dir).select("url", "html"),
    )
    u = pages.select("url").distinct()
    h = F.md5("url")
    hexv = u.select(
        F.concat("url", F.lit("/blob/"), F.substring(h, 1, 12)).alias(
            "url"
        )
    )
    uuidv = u.select(
        F.concat(
            "url", F.lit("/u/"),
            F.substring(h, 1, 8), F.lit("-"),
            F.substring(h, 9, 4), F.lit("-"),
            F.substring(h, 13, 4), F.lit("-"),
            F.substring(h, 17, 4), F.lit("-"),
            F.substring(h, 21, 12),
        ).alias("url")
    )
    qv = u.select(
        F.concat(
            "url", F.lit("?session="), F.substring(h, 1, 6),
            F.lit("&ref=x"),
        ).alias("url")
    )
    allu = u.unionAll(hexv).unionAll(uuidv).unionAll(qv)
    return url_template_stats(allu).orderBy("template")


def q_page_directives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-page robots directives (robots.py::page_directives): HTML
    synthesized in-plan from the page URLs — meta robots class and
    nofollow-anchor count both md5-derived — then parsed back by the
    operator's regexes. The oracle never parses HTML: it recomputes
    the expected flags and counts from the md5 FORMULAS alone, so a
    hash match certifies the extractor against declared ground
    truth."""
    from serd_spark.operators.robots import page_directives

    pages = _pages(spark, sf_dir)
    _materialize(
        sf_dir, "pages_meta",
        lambda: _pages(spark, sf_dir).select("url", "html"),
    )
    u = pages.select("url").distinct()
    d2 = F.conv(F.substring(F.md5("url"), 3, 2), 16, 10).cast("long") % 4
    nlinks = (
        F.conv(F.substring(F.md5("url"), 7, 2), 16, 10).cast("long") % 3
    )
    meta = (
        F.when(d2 == 0, F.lit('<meta name="robots" content="noindex">'))
        .when(
            d2 == 1,
            F.lit('<meta name="robots" content="nofollow, noarchive">'),
        )
        .when(d2 == 2, F.lit('<meta name="robots" content="none">'))
        .otherwise(F.lit('<meta name="viewport" content="x">'))
    )
    anchors = F.concat(
        F.repeat(F.lit('<a href="/l" rel="nofollow">x</a>'), nlinks.cast("int")),
        F.lit('<a href="/plain">y</a>'),
    )
    html = F.concat(F.lit("<html>"), meta, anchors, F.lit("</html>"))
    out = page_directives(
        u.select("url", html.alias("html")), html_col="html"
    )
    return (
        out.groupBy("noindex", "nofollow")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("n_nofollow_links").cast("long")).alias(
                "n_links"
            ),
        )
        .orderBy("noindex", "nofollow")
    )


def q_apportion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-budget apportionment (frontier.py::apportion_budget —
    Hamilton largest-remainder, all-integer, remainder rank via the
    two-level scan so there is no single-partition global window).
    Weights = distinct-URL counts per host; total = 997 (prime, so
    remainders are exercised). The oracle replays the method with a
    PLAIN global ROW_NUMBER — a structurally different rank
    formulation that must hand the same hosts their +1."""
    from serd_spark.operators.frontier import apportion_budget

    pages = _pages(spark, sf_dir)
    _materialize(
        sf_dir, "pages_meta",
        lambda: _pages(spark, sf_dir).select("url", "html"),
    )
    host = F.regexp_extract("url", r"^[a-z][a-z0-9+.-]*://([^/?#]+)", 1)
    w = (
        pages.select(host.alias("host"), "url")
        .groupBy("host")
        .agg(F.count_distinct("url").alias("w"))
    )
    return apportion_budget(w, total=997).orderBy("host")


def q_sparql_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL filter surface (plans/sparql.py): VALUES inline data
    (map-side IN), numeric comparison (bare-number literal → try_cast
    double, SPARQL's type-error-drops-row ≡ failed-cast NULL), regex
    FILTER (Java∩RE2 pattern), and ORDER BY + LIMIT + OFFSET
    pagination. The oracle replays every predicate with DuckDB's own
    IN / TRY_CAST / regexp_matches / LIMIT-OFFSET — two engines, one
    row set."""
    from serd_spark.plans.sparql import sparql_query

    _materialize_triples(spark, sf_dir)
    q = """
    PREFIX s: <http://schema.org/>
    SELECT ?page ?name ?rating WHERE {
      ?page s:name ?name .
      ?page s:ratingValue ?rating .
      VALUES ?rating { "2.0" "2.2" "2.4" "2.6" "2.8" "3.0" "3.2" "3.4" }
      FILTER (?rating >= 2.2)
      FILTER (regex(?name, "[24680]»$"))
    } ORDER BY ?page ?rating LIMIT 200 OFFSET 10
    """
    return sparql_query(_kg_triples(spark, sf_dir), q)


def q_sparql_minus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL MINUS (plans/sparql.py): pages with a name but no
    review — compiled to a LEFT ANTI join on the shared variable
    (exact under the static scope rules: ≥1 shared hard-bound var,
    no OPTIONAL-introduced vars). The oracle replays it as NOT
    EXISTS — two different anti-join formulations, one row set."""
    from serd_spark.plans.sparql import sparql_query

    _materialize_triples(spark, sf_dir)
    q = """
    PREFIX s: <http://schema.org/>
    SELECT ?page ?name WHERE {
      ?page s:name ?name .
      MINUS { ?page s:review ?rev . }
    } ORDER BY ?page LIMIT 400
    """
    return sparql_query(_kg_triples(spark, sf_dir), q)


def q_sparql_bind(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL BIND (plans/sparql.py): computed columns at their
    written position — a string pipeline (CONCAT/UCASE over the
    name) and an arithmetic rescale of the rating (try_cast double,
    so a non-numeric rating unbinds rather than erroring, matching
    SPARQL). Both BIND targets feed the SELECT list and the rescale
    feeds a later FILTER, proving bind→filter written-order scope.
    Floats cross engines as round(x, 6) per the repo float
    discipline; the oracle replays the expressions in SQL."""
    from serd_spark.plans.sparql import sparql_query

    _materialize_triples(spark, sf_dir)
    q = """
    PREFIX s: <http://schema.org/>
    SELECT ?page ?shout ?score WHERE {
      ?page s:name ?name .
      ?page s:ratingValue ?rating .
      BIND (CONCAT(UCASE(?name), "!") AS ?shout)
      BIND (?rating * 10 - 5 AS ?score)
      FILTER (?score >= 20)
    } ORDER BY ?page LIMIT 300
    """
    out = sparql_query(_kg_triples(spark, sf_dir), q)
    return out.withColumn("score", F.round("score", 6))


def q_sparql_describe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL DESCRIBE (plans/sparql.py): the concise subject
    description of every page rated ≥ 4.5 — the solution projection
    is a distinct page set joined back as subject against the whole
    triple table (broadcast-sized build side). The oracle replays it
    as a semi-join; ordering pinned in both engines."""
    from serd_spark.plans.sparql import sparql_query

    _materialize_triples(spark, sf_dir)
    q = """
    PREFIX s: <http://schema.org/>
    DESCRIBE ?page WHERE {
      ?page s:ratingValue ?r .
      FILTER (?r >= 4.5)
    }
    """
    return sparql_query(_kg_triples(spark, sf_dir), q).orderBy(
        "s", "p", "o"
    )


def q_skolem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skolemization (operators/serialize.py::skolemize — RDF 1.1
    §3.5): every blank node becomes a well-known genid IRI in one
    row-local SELECT (no shuffle). Output: counts by (s_kind, o_kind)
    plus an md5 content pin over the rewritten (s, o), so a label
    mangled, double-prefixed or left un-skolemized breaks the hash.
    The oracle replays the kind-guarded prefix concat from the
    materialized triples."""
    from serd_spark.operators.serialize import skolemize

    _materialize_triples(spark, sf_dir)
    out = skolemize(_kg_triples(spark, sf_dir))
    pin = F.conv(
        F.substring(F.md5(F.concat_ws("\u0001", "s", "o")), 1, 10),
        16, 10,
    ).cast("long")
    return (
        out.groupBy(
            F.col("s_kind").cast("int").alias("sk"),
            F.col("o_kind").cast("int").alias("ok"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("s").alias("n_subj"),
            F.sum(pin).alias("pin"),
        )
        .orderBy("sk", "ok")
    )


def q_c14n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RDF dataset canonicalization (RDFC-1.0, rdf/c14n.py) as a
    perturb-and-restore certificate: each document's statements are
    canonicalized twice — as parsed, and as an isomorphic copy with
    every blank label md5-renamed and statement order reversed — and
    the canonical N-Quads line sets must be byte-identical. Spark
    emits per-document line counts, both run hashes, and the
    isomorphism verdict; the oracle recomputes all of it from the
    materialized lines (ASCII-escaped, so both engines' orderings
    agree byte-for-byte). One fused Python crossing, no shuffle
    before the per-url aggregation — blank scope is the document,
    the exact 100 TB shape."""
    from serd_spark.operators.serialize import c14n_lines
    from serd_spark.sources.pages import latest_crawl

    lines = c14n_lines(latest_crawl(_pages(spark, sf_dir)))
    _materialize(sf_dir, "c14n_lines", lambda: lines)

    def run_hash(tag: str):
        return F.md5(
            # "\n" separator: canonical lines are ASCII-escaped (a raw
            # newline cannot occur inside one), so the join is
            # unambiguous; DuckDB mirrors with chr(10)
            F.concat_ws(
                "\n",
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("run") == tag, F.col("line"))
                    )
                ),
            )
        )

    g = lines.groupBy("url").agg(
        F.sum(F.when(F.col("run") == "o", 1).otherwise(0))
        .cast("long").alias("n_o"),
        F.sum(F.when(F.col("run") == "p", 1).otherwise(0))
        .cast("long").alias("n_p"),
        run_hash("o").alias("h_o"),
        run_hash("p").alias("h_p"),
    )
    return g.select(
        "url", "n_o", "n_p", "h_o", "h_p",
        (F.col("h_o") == F.col("h_p")).cast("int").alias("iso"),
    ).orderBy("url")


def q_void(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VoID dataset description (operators/void_stats.py): the
    self-describing statistics graph of the extracted KG — dataset
    totals, class count, and one propertyPartition per predicate,
    all as canonical RDF the writers/SPARQL layer can consume. The
    oracle rebuilds every statistic and partition triple from the
    materialized triple table with its own aggregates."""
    from serd_spark.operators.void_stats import void_describe

    _materialize_triples(spark, sf_dir)
    g = void_describe(
        _kg_triples(spark, sf_dir), "https://serd-spark.invalid/kg"
    )
    return g.orderBy("s", "p", "o")


def q_sameas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """owl:sameAs canonicalization (operators/rdfs.py) as a
    perturb-then-restore certificate: a deterministic md5-prefix rule
    aliases ~1/3 of the graph's IRIs (a ~1/6 subset gets a TWO-hop
    alias chain, so the component closure — not just single edges —
    is exercised), every data triple is rewritten onto the aliases,
    and the matching owl:sameAs chains are unioned in.
    sameas_canonicalize must collapse each component to its
    min-string-id member — the original IRI, a strict prefix of its
    aliases — and drop the sameAs statements, restoring the original
    canonical graph. Output: per-predicate counts, distinct subjects,
    and an md5-derived integer content pin over the restored
    (s, p, o) set. The oracle replays perturbation, closure
    (recursive CTE min-label, the kg_linking idiom) and rewrite
    independently in SQL. 100 TB shape: declared identities are
    structured-data-sized, so components take the CC hybrid and the
    rewrite is two broadcast joins — the corpus never shuffles until
    the graph-projection distinct."""
    from serd_spark.operators.rdfs import OWL_SAMEAS, sameas_canonicalize

    _materialize_triples(spark, sf_dir)
    t = _kg_triples(spark, sf_dir)

    def sel(col, cut):  # md5-hex prefix rule, byte-identical in DuckDB
        return F.substring(F.md5(col), 1, 4) < cut

    def aliased(col, kind):
        c = F.col(col)
        return (
            F.when((F.col(kind) == 0) & sel(c, "2aaa"),
                   F.concat(c, F.lit("#sa2")))
            .when((F.col(kind) == 0) & sel(c, "5555"),
                  F.concat(c, F.lit("#sa1")))
            .otherwise(c)
        )

    data = t.withColumn("s", aliased("s", "s_kind")).withColumn(
        "o", aliased("o", "o_kind")
    )
    nodes = (
        t.filter(F.col("s_kind") == 0).select(F.col("s").alias("x"))
        .unionByName(
            t.filter(F.col("o_kind") == 0).select(F.col("o").alias("x"))
        )
        .filter(sel(F.col("x"), "5555"))
        .distinct()
    )

    def edge_rows(src, dst):
        return nodes.filter(
            F.lit(True) if src == "#sa1" else sel(F.col("x"), "2aaa")
        ).select(
            F.lit("synthetic:sameas").alias("url"),
            F.lit(0).alias("island"),
            F.lit(0).alias("stmt_ord"),
            F.lit("x").alias("syntax"),
            F.lit("").alias("g"),
            F.concat(F.col("x"), F.lit(src)).alias("s"),
            F.lit(0).cast("tinyint").alias("s_kind"),
            F.lit(OWL_SAMEAS).alias("p"),
            (
                F.concat(F.col("x"), F.lit(dst)) if dst else F.col("x")
            ).alias("o"),
            F.lit(0).cast("tinyint").alias("o_kind"),
            F.lit("").alias("o_dt"),
            F.lit("").alias("o_lang"),
        )

    perturbed = (
        data.select(
            "url", "island", "stmt_ord", "syntax", "g", "s", "s_kind",
            "p", "o", "o_kind", "o_dt", "o_lang"
        )
        .unionByName(edge_rows("#sa1", None))
        .unionByName(edge_rows("#sa2", "#sa1"))
    )
    graph, _ = sameas_canonicalize(perturbed, project_graph=True)
    pin = F.conv(
        F.substring(F.md5(F.concat_ws("\u0001", "s", "p", "o")), 1, 10),
        16, 10,
    ).cast("long")
    return (
        graph.groupBy("p")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("s").alias("n_subj"),
            F.sum(pin).alias("pin"),
        )
        .orderBy("p")
    )


def q_robots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt compliance filter (operators/robots.py, RFC 9309
    subset). Per-host robots.txt bodies are synthesized in-plan — an
    md5-prefix third of hosts carries a crawler-specific ``serd``
    group that must FULLY override the ``*`` group (RFC group
    selection), and the rules exercise prefix, mid-pattern ``*``
    wildcard, ``$`` anchor, and longest-match/allow-wins precedence.
    The parse layer (the one Python crossing, over the 97-row host
    table) is pinned by unit tests and materialized as the rules
    table; the oracle independently replays the URL-side match — the
    at-scale path — as LIKE joins + the numeric precedence argmax
    (pat_len*2+allow, lexicographic (len, allow) for allow∈{0,1}).
    100 TB shape: rules BROADCAST, corpus side one regexp split + one
    row-local HOF filter/argmax, zero shuffles before the final
    bounded-key aggregate."""
    from serd_spark.operators.robots import robots_filter, robots_rules

    pages = _pages(spark, sf_dir)
    _materialize(
        sf_dir, "pages_meta", lambda: _pages(spark, sf_dir).select("url", "html")
    )
    urls = pages.select("url").distinct()
    host = F.regexp_extract("url", r"^[a-z][a-z0-9+.-]*://([^/?#]+)", 1)
    hosts = urls.select(host.alias("host")).distinct()
    base = (
        "# synthetic politeness file\n"
        "User-agent: other\nDisallow: /\n\n"
        "User-agent: *\n"
        "Disallow: /page/1\n"
        "Allow: /page/1*3$\n"
        "Disallow: /page/*7$\n"
    )
    serd_extra = (
        "\nUser-agent: serd\n"
        "Disallow: /page/2\n"
        "Allow: /page/22*\n"
        "Disallow: /page/*9$\n"
    )
    robots = hosts.select(
        "host",
        F.concat(
            F.lit(base),
            F.when(
                F.substring(F.md5("host"), 1, 4) < "5555",
                F.lit(serd_extra),
            ).otherwise(F.lit("")),
        ).alias("robots_txt"),
    )
    rules = robots_rules(robots, agent="serd")
    _materialize(sf_dir, "robots_rules", lambda: rules)
    out = robots_filter(urls, rules)
    pin = F.conv(F.substring(F.md5("url"), 1, 10), 16, 10).cast("long")
    return (
        out.groupBy("allowed")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.count_distinct("host").alias("n_hosts"),
            F.sum(pin).alias("pin"),
        )
        .orderBy("allowed")
    )


# schema.org-subset ontology shared verbatim by q_rdfs_entail's Spark
# side and its DuckDB mirror (axioms are public schema.org hierarchy)
_SCHEMA_SUBCLASS = [
    ("http://schema.org/Review", "http://schema.org/CreativeWork"),
    ("http://schema.org/CreativeWork", "http://schema.org/Thing"),
    ("http://schema.org/Person", "http://schema.org/Thing"),
    ("http://schema.org/Rating", "http://schema.org/Intangible"),
    ("http://schema.org/Intangible", "http://schema.org/Thing"),
]
_SCHEMA_DOMAINS = [
    ("http://schema.org/review", "http://schema.org/CreativeWork"),
    ("http://schema.org/ratingValue", "http://schema.org/Rating"),
]
_SCHEMA_RANGES = [
    ("http://schema.org/review", "http://schema.org/Review"),
    ("http://schema.org/author", "http://schema.org/Person"),
]


def q_rdfs_entail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RDFS forward-chaining entailment (operators/rdfs.py) over the
    extracted triples under a schema.org-subset ontology: domain and
    range rules seed types (review→Review, author→Person,
    ratingValue subjects→Rating), then the driver-side subClassOf
    closure lifts them (Review⊑CreativeWork⊑Thing, Rating⊑Intangible⊑
    Thing) — multi-hop inference chains from raw markup. The oracle
    replays closure rounds, all three rule scans, and the asserted
    flag from the materialized triples."""
    from serd_spark.operators.rdfs import rdfs_entail

    _materialize_triples(spark, sf_dir)
    return rdfs_entail(
        _kg_triples(spark, sf_dir),
        _SCHEMA_SUBCLASS,
        domains=_SCHEMA_DOMAINS,
        ranges=_SCHEMA_RANGES,
    ).orderBy("node", "cls")


def q_warc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC sink→source fixpoint (sources/warc.py): the pages corpus
    is written as sharded ISO-28500 WARC files (deterministic md5-url
    shards, warcinfo heads, HTTP envelopes) and read back with the
    by-file binaryFile scanner; per-url record counts, formatted
    max timestamp and content md5s must equal the ORIGINAL table —
    the oracle computes the same aggregate straight from the
    materialized (url, warc_ts, html) parquet, so a single corrupted
    byte, lost record, or timestamp drift anywhere in the
    writer/parser fails the hash."""
    import shutil

    from serd_spark.sources.warc import read_warc, write_warc

    src = _pages(spark, sf_dir).select("url", "warc_ts", "html")
    _materialize(sf_dir, "warc_src", lambda: src)
    out = os.path.join(
        "/tmp/serd_spark_warc", os.path.basename(os.path.normpath(sf_dir))
    )
    shutil.rmtree(out, ignore_errors=True)
    write_warc(src, out, n_files=8).collect()  # 8-row manifest action
    return (
        read_warc(spark, out + "/*.warc")
        .groupBy("url")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.date_format(
                F.max("warc_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"
            ).alias("ts_max"),
            F.min(F.md5("html")).alias("h_min"),
            F.max(F.md5("html")).alias("h_max"),
        )
        .orderBy("url")
    )


def q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON property extraction over the events
    table's ``props`` column (the schema-flexible event-payload
    pattern): get_json_object pulls $.k as an integer JVM-side — the
    scan prunes to (event_type, props), no UDF — then a bounded-key
    hash aggregate per event type (count, sum, min, max). The oracle
    re-extracts with DuckDB's own JSON engine — two independent JSON
    parsers must agree on every value."""
    ev = _t(spark, sf_dir, "events").select("event_type", "props")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("k").cast("long").alias("sum_k"),
            F.min("k").cast("long").alias("min_k"),
            F.max("k").cast("long").alias("max_k"),
        )
        .orderBy("event_type")
    )


def q_sketch_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable log-linear quantile sketch (stats.py::hdr_sketch /
    hdr_quantiles — the DDSketch/HDR family): per-priority order-value
    quantile ESTIMATES with ≤ 2^-4 relative error from a bucket table
    that map-side-combines to ~1k rows per group regardless of input
    scale — the 100 TB path where q_quantiles' distinct-value table
    stops being small. The bucket exponent is float-log2-derived but
    self-corrected with exact integer shifts, so the DuckDB oracle
    replays bucket ids AND estimates bit-for-bit."""
    from serd_spark.operators.stats import hdr_quantiles, hdr_sketch

    o = _t(spark, sf_dir, "orders").select(
        "o_orderpriority", _cents(F.col("o_totalprice")).alias("cents")
    )
    sk = hdr_sketch(o, "cents", by=["o_orderpriority"], sub_bits=4)
    return hdr_quantiles(
        sk, [500, 900, 990], by=["o_orderpriority"], sub_bits=4
    )


def q_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic shuffle-and-shard (corpus.py::shard_corpus): the
    reproducible global permutation + N-way sharding every
    pretraining run applies before writing shard files — md5-derived
    shard and within-shard order, no RNG, layout/retry-invariant.
    The oracle replays the hash, the modulus, and the rank rule."""
    from serd_spark.operators.corpus import shard_corpus

    d = _t(spark, sf_dir, "documents").select("doc_id")
    return shard_corpus(d, n_shards=8)


def q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 top-20 (['spark','query','data']) fused
    with embedding-cosine top-20 (query = vec 0) by reciprocal-rank
    fusion (corpus.py::rrf_fuse, k=60, integer truncating div).
    Ranks are derived from the two certified rankers with the same
    total orders their own oracles pin (score DESC / cos DESC, id
    ASC); the rank windows run over 20-row lists, never the corpus.
    The oracle replays BOTH rankers end-to-end AND the fusion
    arithmetic."""
    from serd_spark.operators.corpus import bm25_search, rrf_fuse
    from serd_spark.operators.similarity import brute_force_topk
    from pyspark.sql import Window

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    bm = bm25_search(d, ["spark", "query", "data"], top_k=20)
    w_bm = Window.orderBy(F.desc("score_micros"), F.asc("doc_id"))
    bm_r = bm.select("doc_id", F.row_number().over(w_bm).alias("rank"))

    emb = _t(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).first().embedding
    cos = brute_force_topk(emb, list(qv), k=20)
    w_cos = Window.orderBy(F.desc("cos"), F.asc("vec_id"))
    cos_r = cos.select(
        F.col("vec_id").alias("doc_id"),
        F.row_number().over(w_cos).alias("rank"),
    )
    return rrf_fuse([bm_r, cos_r], "doc_id", k_const=60)


def q_bloom_decon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination through a fixed-size Bloom filter
    (corpus.py::bloom_decontaminate) — the broadcast object stays m
    bits no matter how many benchmarks are unioned in, vs
    q_decontaminate's exact span set that grows with the benchmark.
    Same deterministic benchmark-slice trick (doc_id % 23 == 0), so
    true contamination provably exists; the md5 bit positions make
    the FALSE POSITIVES deterministic too, and the oracle replays
    them bit-exactly (set-bit derivation + 4-way membership test
    rebuilt from raw text)."""
    from serd_spark.operators.corpus import bloom_decontaminate

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    bench = d.filter(F.col("doc_id") % 23 == 0)
    return bloom_decontaminate(d, bench, k=13, m_bits=65536, n_hashes=4)


def q_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min frequency sketch (stats.py::countmin_sketch /
    countmin_estimate) certified against exact counts: sketch the
    full token stream into 4×64 cells, then estimate the top-20
    tokens (exact count DESC, token ASC tie-break — a
    TakeOrderedAndProject) and emit exact vs estimate side by side.
    width=64 is deliberately below the corpus vocabulary so real
    collisions exercise the over-estimate path (est >= exact always;
    the oracle replays cells, probes, and the min rule)."""
    from serd_spark.operators.corpus import _min_parallelism
    from serd_spark.operators.stats import countmin_estimate, countmin_sketch

    d = _min_parallelism(_t(spark, sf_dir, "documents").select("text"))
    words = d.select(
        F.explode(
            F.split(
                F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")),
                " ",
            )
        ).alias("w")
    ).filter(F.col("w") != "")
    sketch = countmin_sketch(words, "w", depth=4, width=64)
    top = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), F.asc("w"))
        .limit(20)
    )
    return countmin_estimate(sketch, top, "w", depth=4, width=64)


def q_wminhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted MinHash signatures (dedup.py::wminhash_signatures_md5
    — integer-weight replica expansion, tf capped at 8): the
    tf-weighted upgrade of q_minhash_md5 for near-dup detection where
    documents differ in term EMPHASIS, not term set. min over
    fixed-width md5 hex strings, so DuckDB replays the entire
    signature (unnest → tf → generate_series replicas → min md5)
    with no integer conversion involved."""
    from serd_spark.operators.dedup import wminhash_signatures_md5

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return wminhash_signatures_md5(d, n_seeds=4, weight_cap=8)


def q_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain roll-up over the synthesized pages corpus. The
    oracle re-derives host/tld from the materialized (url, html)
    parquet with the same RE2-safe pattern and re-aggregates."""
    from serd_spark.operators.corpus import domain_stats

    pages = _pages(spark, sf_dir)
    _materialize(
        sf_dir, "pages_meta", lambda: _pages(spark, sf_dir).select("url", "html")
    )
    return domain_stats(pages)


def q_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quota: keep the best 10 docs per source by
    (n_chars DESC, doc_id ASC) — corpus.py::cap_per_domain. The plan
    relies on Catalyst's rank-limit pushdown (map-side Partial
    WindowGroupLimit before the exchange), so a mega-host never sends
    more than cap rows per map task; plan-audited, see the operator
    docstring. The oracle replays the same rank window in SQL."""
    from serd_spark.operators.corpus import cap_per_domain

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    return cap_per_domain(d, cap=10).select(
        "doc_id", "source", "n_chars", F.col("rank").cast("int").alias("rank")
    )


def q_nfc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization (operators/text.py::nfc_normalize,
    UAX #15): decomposed letter+combining-mark pairs and Hangul jamo
    sequences fold to precomposed forms. Two INDEPENDENT Unicode
    implementations under one hash: Spark normalizes with Python's
    unicodedata, the oracle rebuilds the same synthetic corpus with
    chr() formulas and normalizes with DuckDB's own nfc_normalize —
    lengths, changed-flags, and a per-row pin over the normalized
    text must all agree. Inputs are closed-form in the doc id; the
    i%3==0 rows compose to nothing new (never-composing q+cedilla
    only), so the changed flag is exercised both ways."""
    import pandas as pd

    from serd_spark.operators.text import nfc_normalize

    n = max(200, _n_pages(sf_dir))
    base = spark.range(0, n, 1, 32)

    def gen(batches):
        for pdf in batches:
            ids = [int(i) for i in pdf["id"]]
            texts = []
            for i in ids:
                mark = chr(0x300 + i % 5) if i % 3 else ""
                mid = (
                    f"{chr(0x1100 + i % 19)}{chr(0x1161 + i % 21)}"
                    if i % 3 else "xy"
                )
                texts.append(
                    f"w{chr(97 + i % 26)}{mark} {mid} q"
                    + chr(0x327) * (i % 2)
                )
            yield pd.DataFrame({"id": ids, "text": texts})

    docs = base.mapInPandas(gen, "id long, text string")
    out = nfc_normalize(docs)
    pin = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "\u0001",
                    F.col("id").cast("string"), "text_nfc",
                )
            ),
            1, 10,
        ),
        16, 10,
    ).cast("long")
    return out.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            (F.col("text") != F.col("text_nfc")).cast("int")
        ).cast("long").alias("n_changed"),
        F.sum(F.length("text")).cast("long").alias("len_before"),
        F.sum(F.length("text_nfc")).cast("long").alias("len_after"),
        F.sum(pin).alias("pin"),
    )


def q_anchor_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor-text aggregation (operators/corpus.py::anchor_text):
    what other pages call a URL — per-target anchor phrase counts
    with a deterministic top-3 rank (WindowGroupLimit map-side cap).
    The link corpus is synthesized in-plan from doc ids (the
    q_url_canon precedent): 5 anchors per doc with Mixed-Case text,
    every value closed-form in (id, k) so the oracle regenerates the
    whole pair set in SQL. Extraction is pure JVM regex; only
    (dst, anchor, count) rows cross a shuffle."""
    from serd_spark.operators.corpus import anchor_text

    n = max(200, _n_pages(sf_dir))
    base = spark.range(0, n, 1, 32)
    parts = []
    for k in range(5):
        j = F.col("id") * 5 + F.lit(k)
        parts.append(
            F.format_string(
                '<a class="x" href="http://site%d.example/page/%d">'
                "Term%d W%d</a>",
                j % 23, j % 51, j % 11, j % 13,
            )
        )
    docs = base.select(
        "id",
        F.concat(F.lit("<html>"), *parts, F.lit("</html>")).alias("html"),
    )
    return anchor_text(docs, html_col="html", top_k=3).orderBy(
        "dst", "rank"
    )


def q_scc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strongly connected components (operators/graph.py::scc — trim
    + forward-min coloring + backward closure, all caps documented).
    The graph is synthesized in-plan from closed-form edges: Gn
    8-cycles (one SCC each), a 3-group condensation chain (exercises
    multiple outer rounds), a star of back-edges into group 0 (many
    roots extracted in ONE round), and a 5-node DAG tail (trim
    food). The oracle computes mutual reachability with a recursive
    CTE — a completely different SCC formulation — and must produce
    identical (scc, size, max member) rows."""
    from serd_spark.operators.graph import scc

    gn = max(8, _n_pages(sf_dir) // 128)
    n_core = gn * 8
    ids = spark.range(0, n_core, 1, 16)
    cycles = ids.select(
        F.col("id").alias("src"),
        (
            (F.col("id") - F.col("id") % 8)
            + ((F.col("id") % 8 + 1) % 8)
        ).alias("dst"),
    )
    star = spark.range(3, gn).select(
        (F.col("id") * 8).alias("src"), F.lit(0).cast("long").alias("dst")
    )
    chain = spark.createDataFrame(
        [(0, 8), (8, 16), (16, n_core)], "src long, dst long"
    )
    path = spark.range(0, 4).select(
        (F.col("id") + n_core).alias("src"),
        (F.col("id") + n_core + 1).alias("dst"),
    )
    edges = cycles.unionByName(star).unionByName(chain).unionByName(path)
    comp = scc(edges)
    return (
        comp.groupBy("scc")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.max("node").alias("max_node"),
        )
        .orderBy("scc")
    )


def q_host_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-level web link graph (corpus.py::host_graph): anchor
    hrefs extracted with one codegen'd regexp_extract_all over the
    page bytes, exploded, host-mapped, and rolled up to weighted
    (src_host, dst_host) edges — the web-graph construction step
    ahead of host centrality. The oracle re-extracts every href from
    the materialized (url, html) parquet with the same RE2∩Java
    pattern and re-aggregates."""
    from serd_spark.operators.corpus import host_graph

    pages = _pages(spark, sf_dir)
    _materialize(
        sf_dir, "pages_meta", lambda: _pages(spark, sf_dir).select("url", "html")
    )
    return host_graph(pages).orderBy("src_host", "dst_host")


def q_host_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host centrality: integer-micros PageRank (graph.py::pagerank,
    directed — sink hosts hold rank but leak their mass, the standard
    simplification) over the anchor-href host graph of q_host_graph.
    Composition certificate: the oracle re-derives the edge set from
    the raw page bytes AND replays all 3 rank iterations as chained
    CTEs, so a divergence in either stage surfaces."""
    from serd_spark.operators.corpus import host_graph
    from serd_spark.operators.graph import pagerank

    pages = _pages(spark, sf_dir)
    _materialize(
        sf_dir, "pages_meta", lambda: _pages(spark, sf_dir).select("url", "html")
    )
    edges = host_graph(pages).select(
        F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
    )
    return pagerank(edges, n_iter=3, undirected=False).orderBy("node")


def q_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs/authorities (graph.py::hits) over the anchor-href
    host graph — the directed complement to q_host_rank's PageRank:
    hub scores reward pages that point AT authorities, authority
    scores reward being pointed at by hubs. Integer micros with
    quantized-L1 normalization (one floor division by a global
    scalar per update — no L2 sqrt to disagree on). The oracle
    re-derives the edges from raw page bytes AND replays both score
    vectors through all iterations."""
    from serd_spark.operators.corpus import host_graph
    from serd_spark.operators.graph import hits

    pages = _pages(spark, sf_dir)
    _materialize(
        sf_dir, "pages_meta", lambda: _pages(spark, sf_dir).select("url", "html")
    )
    edges = host_graph(pages).select(
        F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
    )
    return hits(edges, n_iter=3).orderBy("node")


def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style per-host line-level boilerplate removal over the
    synthesized pages corpus (corpus.py::line_dedup_stats): a line is
    dropped when it appears in more than 2 distinct documents of its
    host. The corpus plants exactly this structure — one line shared
    by every page, one mid-frequency, one unique. kept_md5 pins the
    exact content AND order of every cleaned document; the oracle
    re-splits the materialized (url, text) parquet, counts (host,
    raw-line) frequencies, and rebuilds the kept text in SQL."""
    from serd_spark.operators.corpus import line_dedup_stats

    pages = _pages(spark, sf_dir)
    _materialize(
        sf_dir, "pages_text", lambda: _pages(spark, sf_dir).select("url", "text")
    )
    return line_dedup_stats(pages, max_docs=2)


_SAMPLE_RATES = {"en": 0.5, "es": 0.25, "zh": 0.1}
_SAMPLE_DEFAULT = 0.05


def _zorder_sql_expr(xcol: str, ycol: str, bits: int = 16) -> str:
    """The DuckDB mirror of materialize.zorder_key: identical clamp +
    shift/mask interleave, generated term-by-term so the two engines
    share the formula by construction."""
    xc = f"LEAST(GREATEST(CAST({xcol} AS BIGINT), 0), {(1 << bits) - 1})"
    yc = f"LEAST(GREATEST(CAST({ycol} AS BIGINT), 0), {(1 << bits) - 1})"
    terms = []
    for b in range(bits):
        terms.append(f"((({xc} >> {b}) & 1) << {2 * b + 1})")
        terms.append(f"((({yc} >> {b}) & 1) << {2 * b})")
    return "(" + " | ".join(terms) + ")"


def q_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton / Z-order key (materialize.py::zorder_key) over
    lineitem (l_partkey, l_suppkey) — the multi-column clustering key
    behind write_zordered's file-skipping layout. Pure shift/mask
    codegen, no UDF; the oracle regenerates the identical
    clamp+interleave expression term-by-term (_zorder_sql_expr). The
    layout/pruning property itself is pinned by test_plans-style
    per-file bounding-box tests in test_materialize."""
    from serd_spark.operators.materialize import zorder_key

    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey"),
        F.col("l_linenumber").cast("int").alias("l_linenumber"),
        zorder_key(F.col("l_partkey"), F.col("l_suppkey")).alias("zkey"),
    )


def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located join via catalog-registered bucketed tables: orders
    and customer are bucketed+sorted on custkey with the same bucket
    count, so the join plan proves co-location and elides the shuffle
    (asserted by test_plans; the oracle checks the RESULT against a
    plain SQL join). At 100 TB this is the difference between
    re-shuffling the fact table per query and reading it in place."""
    from serd_spark.operators.materialize import write_bucketed_table

    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    base = f"/tmp/serd_spark_bucketed/{tag}"
    write_bucketed_table(
        _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice"),
        f"bt_orders_{tag}", "o_custkey", 8, path=f"{base}/orders",
    )
    write_bucketed_table(
        _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment"),
        f"bt_customer_{tag}", "c_custkey", 8, path=f"{base}/customer",
    )
    bo = spark.table(f"bt_orders_{tag}")
    bc = spark.table(f"bt_customer_{tag}")
    return (
        bo.join(bc, bo.o_custkey == bc.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(_cents(F.col("o_totalprice"))).cast("long")
            .alias("sum_cents"),
        )
    )


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language hash-threshold sampling. sum(doc_id)
    pins the exact membership of the kept set, not just its size; the
    DuckDB mirror evaluates the byte-identical md5-hex comparison."""
    from serd_spark.operators.corpus import stratified_sample

    d = _t(spark, sf_dir, "documents")
    kept = stratified_sample(
        d, _SAMPLE_RATES, default_rate=_SAMPLE_DEFAULT
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.sum("doc_id").cast("long").alias("sum_ids"),
    )


def q_crawl_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl snapshot diff (corpus.py::crawl_delta — the
    delta-only-reprocessing planner). Snapshots are url-UNIQUE by
    construction (the operator's precondition): one latest_crawl
    pass over the synthesized fetch log, then crawl B is carved IN
    the plan with known edits — urls with id % 10 == 0 dropped
    (removed), id % 10 == 1 get a byte appended (changed), ids >= n
    appear only in B (added). The FULL OUTER md5 diff must recover
    exactly those classes; the oracle replays the join and
    classification from the two materialized (url, hash) tables.
    sum_len pins membership."""
    from serd_spark.operators.corpus import crawl_delta
    from serd_spark.sources.pages import latest_crawl, synthesize_pages

    _ensure_shipped(spark)
    n = max(200, _n_pages(sf_dir) // 4)
    extra = max(20, n // 10)
    snap = (
        latest_crawl(synthesize_pages(spark, n + extra, seed=42))
        .withColumn("_id", F.regexp_extract("url", r"/(\d+)$", 1)
                    .cast("long"))
        .select("_id", "url", "html")
    )
    a = snap.filter(F.col("_id") < n).select("url", "html")
    b = (
        snap.filter(
            (F.col("_id") >= n)
            | ((F.col("_id") < n) & (F.col("_id") % 10 != 0))
        )
        .select(
            "url",
            F.when(
                (F.col("_id") < n) & (F.col("_id") % 10 == 1),
                F.concat(F.col("html"), F.lit(b"!")),
            ).otherwise(F.col("html")).alias("html"),
        )
    )
    _materialize(
        sf_dir, "crawl_a",
        lambda: a.select("url", F.md5("html").alias("h")),
    )
    _materialize(
        sf_dir, "crawl_b",
        lambda: b.select("url", F.md5("html").alias("h")),
    )
    d = crawl_delta(a, b)
    return d.groupBy("status").agg(
        F.count(F.lit(1)).cast("long").alias("n_urls"),
        F.sum(F.length("url")).cast("long").alias("sum_len"),
    ).orderBy("status")


def q_sql_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority) through the spark.sql entry
    point: top-10 highest-revenue orders not yet fully shipped as of
    the cutoff for one market segment. The canonical
    filter-join-aggregate-topk SQL shape: segment and date predicates
    push to the scans, the orders→lineitem join shuffles only
    filtered fact rows, and the ORDER BY + LIMIT compiles to
    TakeOrderedAndProject. Money in integer cents; explicit
    (revenue DESC, orderkey) tie-break so top-10 is total-ordered."""
    for t in ("customer", "orders", "lineitem"):
        _t(spark, sf_dir, t).createOrReplaceTempView(f"v_{t}")
    return spark.sql("""
        SELECT l_orderkey,
               CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
                    * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
               date_format(o_orderdate, 'yyyy-MM-dd') AS orderdate,
               o_orderpriority
        FROM v_customer
        JOIN v_orders   ON c_custkey = o_custkey
        JOIN v_lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate <  TIMESTAMP '1997-06-01 00:00:00'
          AND l_shipdate  >= TIMESTAMP '1997-06-01 00:00:00'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue_cents DESC, l_orderkey
        LIMIT 10
    """)


def q_sql_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local-supplier volume) expressed through the
    spark.sql ENTRY POINT over temp views — the SQL-API surface of
    the engine, and the only contract query touching supplier. Six-
    way star join with the c_nationkey = s_nationkey locality
    predicate; revenue in per-row integer cents (the q_agg_pricing
    money discipline). Catalyst broadcast-joins the dimension chain
    (region → nation → supplier/customer) and shuffles only the two
    fact tables — at 100 TB the same plan holds with lineitem/orders
    co-bucketed on orderkey."""
    for t in ("region", "nation", "customer", "orders", "lineitem",
              "supplier"):
        _t(spark, sf_dir, t).createOrReplaceTempView(f"v_{t}")
    return spark.sql("""
        SELECT n_name,
               CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
                    * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
               COUNT(*) AS n_items
        FROM v_customer
        JOIN v_orders   ON c_custkey = o_custkey
        JOIN v_lineitem ON l_orderkey = o_orderkey
        JOIN v_supplier ON l_suppkey = s_suppkey
                       AND c_nationkey = s_nationkey
        JOIN v_nation   ON s_nationkey = n_nationkey
        JOIN v_region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n_name
        ORDER BY revenue_cents DESC, n_name
    """)


def q_crawl_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl snapshot diff (corpus.py::crawl_delta — the
    delta-only-reprocessing planner). Crawl A is the synthesized
    pages corpus; crawl B is built IN the plan with known edits:
    urls with id % 10 == 0 dropped (removed), id % 10 == 1 get a
    byte appended (changed), and a shifted id range appears only in
    B (added). The FULL OUTER md5 diff must recover exactly those
    classes; the oracle replays the join and classification from the
    two materialized (url, hash) tables. sum_len pins membership."""
    from serd_spark.operators.corpus import crawl_delta
    from serd_spark.sources.pages import synthesize_pages

    _ensure_shipped(spark)
    n = max(200, _n_pages(sf_dir) // 4)
    a = synthesize_pages(spark, n, seed=42).select("url", "html")
    b_mod = (
        synthesize_pages(spark, n, seed=42)
        .withColumn("_id", F.regexp_extract("url", r"/(\d+)$", 1)
                    .cast("long"))
        .filter(F.col("_id") % 10 != 0)
        .select(
            "url",
            F.when(
                F.col("_id") % 10 == 1,
                F.concat(F.col("html"), F.lit(b"!")),
            ).otherwise(F.col("html")).alias("html"),
        )
    )
    b_new = (
        synthesize_pages(spark, n + max(20, n // 10), seed=42)
        .withColumn("_id", F.regexp_extract("url", r"/(\d+)$", 1)
                    .cast("long"))
        .filter(F.col("_id") >= n)
        .select("url", "html")
    )
    b = b_mod.unionByName(b_new)
    _materialize(
        sf_dir, "crawl_a",
        lambda: a.select("url", F.md5("html").alias("h")),
    )
    _materialize(
        sf_dir, "crawl_b",
        lambda: b.select("url", F.md5("html").alias("h")),
    )
    d = crawl_delta(a, b)
    return d.groupBy("status").agg(
        F.count(F.lit(1)).cast("long").alias("n_urls"),
        F.sum(F.length("url")).cast("long").alias("sum_len"),
    ).orderBy("status")


def q_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-column data profile of the events table
    (stats.py::profile_table — the ingest data-quality pass).
    Min/max computed on native types and normalized only at the edge
    (doubles → integer micros, timestamps → formatted strings); the
    oracle rebuilds every row with per-column UNION ALL aggregates."""
    from serd_spark.operators.stats import profile_table

    e = _t(spark, sf_dir, "events")
    return profile_table(e).orderBy("column")


def stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join driven end-to-end (streaming/
    incremental.py::streaming_enrich): the events table flows through
    an availableNow MULTI-batch stream (maxFilesPerTrigger=2 over 6
    files), each micro-batch broadcast-joins a static category
    dimension derived from event_type, the enriched rows append to a
    parquet sink, and the final aggregate reads the sink. Because
    enrichment is row-local the result is batch-split-invariant, and
    the DuckDB oracle replays the join + money-disciplined weighted
    sum directly over the batch events table — streaming-vs-batch
    equivalence, cross-engine."""
    import shutil

    from serd_spark.streaming.incremental import streaming_enrich

    base = os.path.join(
        "/tmp/serd_spark_stream_enrich",
        os.path.basename(os.path.normpath(sf_dir)),
    )
    in_dir = os.path.join(base, "events")
    out_dir = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")
    shutil.rmtree(base, ignore_errors=True)
    _ensure_shipped(spark)
    ev_batch = _t(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    ev_batch.repartition(6).write.parquet(in_dir)

    # static dimension: a pure function of event_type so the SQL
    # oracle can rebuild it without another materialization
    dim = (
        ev_batch.select("event_type").distinct()
        .select(
            "event_type",
            F.substring("event_type", 1, 1).alias("category"),
            F.length("event_type").cast("long").alias("weight"),
        )
    )
    ev = (
        spark.readStream.schema(
            "event_id long, event_type string, value double"
        )
        .option("maxFilesPerTrigger", 2)
        .parquet(in_dir)
    )
    enriched = streaming_enrich(ev, dim, "event_type").select(
        "event_id",
        "category",
        (F.round(F.col("value") * 1_000_000).cast("long")
         * F.col("weight")).alias("wv_micros"),
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={batch_id}")
        )

    q = (
        enriched.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.read.option("basePath", out_dir).parquet(out_dir)
        .groupBy("category")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("wv_micros").cast("long").alias("sum_wv_micros"),
        )
        .orderBy("category")
    )


def stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join driven end-to-end (streaming/
    incremental.py::streaming_interval_join): clicks and views flow
    as two availableNow multi-batch file streams (maxFilesPerTrigger=
    2 over 6 files each, unordered split), the join matches each
    click to the same user's views in the preceding 4 hours with
    cross-batch state, and the appended pair sink is re-aggregated
    per click. The watermark is wider than the input's span, so
    nothing is evicted or late-dropped and the result is EXACTLY the
    batch interval join — which the DuckDB oracle replays as the
    naive inequality join over the batch events table (eviction
    timing itself is pinned by the controlled-arrival unit test)."""
    import shutil

    from serd_spark.streaming.incremental import streaming_interval_join

    base = os.path.join(
        "/tmp/serd_spark_stream_join",
        os.path.basename(os.path.normpath(sf_dir)),
    )
    in_dir = os.path.join(base, "events")
    out_dir = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")
    shutil.rmtree(base, ignore_errors=True)
    _ensure_shipped(spark)
    _t(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    ).repartition(6).write.parquet(in_dir)

    def src() -> DataFrame:
        return (
            spark.readStream.schema(
                "event_id long, ts timestamp, user_id long, "
                "event_type string"
            )
            .option("maxFilesPerTrigger", 2)
            .parquet(in_dir)
        )

    clicks = src().filter(F.col("event_type") == "click").drop("event_type")
    views = src().filter(F.col("event_type") == "view").drop("event_type")
    pairs = streaming_interval_join(
        clicks, views, key="user_id", lookback_s=14400, watermark="3650 days"
    ).select(
        F.col("event_id").alias("click_id"),
        F.col("r_event_id").alias("view_id"),
    )
    q = (
        pairs.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.read.parquet(out_dir)
        .groupBy("click_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_views"),
            F.max("view_id").cast("long").alias("last_view_id"),
        )
        .orderBy("click_id")
    )


def q_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-sized keyed-table MERGE (operators/materialize.py::
    upsert_keyed_table): orders lands as an md5-bucket-partitioned
    table, then one merge applies updates (keys %7==0, +111 cents),
    inserts (re-keyed %97==0 rows) and deletes (%13==0, minus the
    update overlap) touching ONLY affected bucket directories —
    including the all-rows-deleted-bucket cleanup dynamic overwrite
    misses. The returned per-bucket aggregate covers the WHOLE final
    table, so a stale file, lost survivor, or wrong bucket anywhere
    breaks the compare; the oracle recomputes the merge and the md5
    bucketing from raw orders."""
    import shutil

    from serd_spark.operators.materialize import (
        upsert_keyed_table,
        write_keyed_table,
    )

    base_dir = os.path.join(
        "/tmp/serd_spark_upsert", os.path.basename(os.path.normpath(sf_dir))
    )
    shutil.rmtree(base_dir, ignore_errors=True)
    path = os.path.join(base_dir, "orders_kv")
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    write_keyed_table(o, path, "k", n_buckets=16)
    updates = (
        o.filter(F.col("k") % 7 == 0)
        .select("k", (F.col("cents") + 111).alias("cents"))
        .unionByName(
            o.filter(F.col("k") % 97 == 0).select(
                (F.col("k") + 100000000).alias("k"),
                F.col("k").alias("cents"),
            )
        )
    )
    deletes = o.filter(
        (F.col("k") % 13 == 0) & (F.col("k") % 7 != 0)
    ).select("k")
    upsert_keyed_table(spark, path, updates, "k", n_buckets=16,
                       deletes=deletes)
    return (
        spark.read.parquet(path)
        .groupBy(F.col("kbucket").cast("int").alias("kbucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("sum_cents"),
            F.min("k").cast("long").alias("k_min"),
            F.max("k").cast("long").alias("k_max"),
        )
        .orderBy("kbucket")
    )


def q_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction (materialize.py::compact_keyed_table):
    lineitem lands in three micro-batch appends (3+ files per bucket
    — the streaming-ingest fragmentation), compaction rewrites every
    fragmented bucket down to one sorted file, and the returned
    per-bucket aggregate is computed from the POST-compaction files —
    so any row lost, duplicated or mis-bucketed by the rewrite breaks
    the compare against the oracle's replay from raw lineitem.
    File-count and healthy-bucket-untouched invariants are pinned by
    the unit tests."""
    import shutil

    from serd_spark.operators.materialize import (
        append_keyed_table,
        compact_keyed_table,
        write_keyed_table,
    )

    base_dir = os.path.join(
        "/tmp/serd_spark_compact", os.path.basename(os.path.normpath(sf_dir))
    )
    shutil.rmtree(base_dir, ignore_errors=True)
    path = os.path.join(base_dir, "li_kv")
    li = _t(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("k"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    write_keyed_table(li.filter(F.col("k") % 3 == 0), path, "k",
                      n_buckets=16)
    append_keyed_table(li.filter(F.col("k") % 3 == 1), path, "k",
                       n_buckets=16)
    append_keyed_table(li.filter(F.col("k") % 3 == 2), path, "k",
                       n_buckets=16)
    compact_keyed_table(spark, path, "k", max_files=1)
    return (
        spark.read.parquet(path)
        .groupBy(F.col("kbucket").cast("int").alias("kbucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("sum_cents"),
            F.min("k").cast("long").alias("k_min"),
            F.max("k").cast("long").alias("k_max"),
        )
        .orderBy("kbucket")
    )


def q_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared-prefix boilerplate detection + stripping (corpus.py::
    host_boilerplate / strip_boilerplate — the cookie-banner removal
    step in crawl curation). The fixture is built IN the plan: every
    even doc_id gets a per-source banner prepended JVM-side, the
    detector must rediscover exactly those (k=8-token prefixes,
    integer-permille share threshold), and the stripper must remove
    them via the exact (host, own-prefix) broadcast equality join.
    The oracle replays detection AND stripping in SQL from the
    materialized decorated table — every threshold, join and
    substring arithmetic is cross-engine exact."""
    from serd_spark.operators.corpus import (
        host_boilerplate,
        strip_boilerplate,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    banner = F.concat(
        F.lit("Cookie notice for "), F.col("source"),
        F.lit(" please accept tracking to continue "),
    )
    tbl = d.select(
        "doc_id",
        "source",
        F.when(F.col("doc_id") % 2 == 0, F.concat(banner, F.col("text")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    _materialize(sf_dir, "boilerplate_docs", lambda: tbl)
    bp = host_boilerplate(tbl, k=8, min_share_permille=400)
    out = strip_boilerplate(tbl, bp, k=8)
    return out.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("stripped").cast("long").alias("n_stripped"),
        F.sum(F.length("text")).cast("long").alias("sum_len_after"),
    ).orderBy("source")


def q_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-aware Markov transition counts over the events table
    (stats.py::transition_counts): per-user total order (ts,
    event_id), 30-min session cuts, virtual __start__ state per
    session. One window shuffle then a bounded-keyspace hash agg;
    the oracle replays the identical window + lag + gap rule."""
    from serd_spark.operators.stats import transition_counts

    e = _t(spark, sf_dir, "events")
    return transition_counts(e).orderBy("prev_state", "next_state")


def q_mojibake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding-hygiene filter (text.py::encoding_features — the
    drop/repair signal for double-encoded crawl text). The corpus is
    all-ASCII, so the query builds the fixture IN the plan: every
    third document is decorated with genuine UTF-8 punctuation and
    re-decoded as Latin-1 entirely JVM-side (encode → decode — the
    exact corruption web pipelines see), then the three codegen'd
    regexp counters score every row. The oracle re-scores the
    MATERIALIZED corrupted table with the verbatim-shared signature
    pattern in RE2, so detection itself is independently replayed;
    flagged == (doc_id % 3 == 0) for every row is the in-band
    proof that corruption and detection line up."""
    from serd_spark.operators.text import encoding_features

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    decorated = F.concat(
        F.lit("\u00ab "), F.col("text"),
        F.lit(" \u00bb \u2014 caf\u00e9\u2026"),
    )
    corrupted = F.decode(F.encode(decorated, "UTF-8"), "ISO-8859-1")
    tbl = d.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, corrupted)
        .otherwise(F.col("text"))
        .alias("text"),
    )
    _materialize(sf_dir, "mojibake_docs", lambda: tbl)
    return encoding_features(tbl).orderBy("doc_id")


def q_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (corpus.py::chunk_documents
    — the RAG / embedding-prep fan-out). Returns the chunk rows
    themselves: (doc_id, chunk_idx, chunk_text, n_tokens), so the
    oracle certifies every window boundary, overlap and join-back of
    every chunk string, not just counts. Pure JVM (normalize → split
    → sequence/posexplode → slice/array_join); zero shuffle."""
    from serd_spark.operators.corpus import chunk_documents

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return chunk_documents(d, chunk_tokens=32, overlap=8).orderBy(
        "doc_id", "chunk_idx"
    )


def q_leakage_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/valid/test split (corpus.py::split_by_key):
    all documents of one ``source`` land in the same split via the
    md5-hex threshold, so site-level near-dups can never straddle the
    eval boundary. sum_ids pins exact membership per split; n_keys
    counts the sources per split (the leak-free invariant — each key
    in exactly one split — is structural and unit-tested)."""
    from serd_spark.operators.corpus import split_by_key

    d = _t(spark, sf_dir, "documents")
    s = split_by_key(d, train=0.8, valid=0.1, key_col="source")
    return s.groupBy("split").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("source").cast("long").alias("n_keys"),
        F.sum("doc_id").cast("long").alias("sum_ids"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
    ).orderBy("split")


def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document; integer-micros scoring makes
    the (score DESC, term ASC) top-k exactly reproducible in SQL."""
    from serd_spark.operators.corpus import tfidf_top_terms

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return tfidf_top_terms(d, top_k=3)


def q_keyword_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive posting-list retrieval for ['spark', 'query']."""
    from serd_spark.operators.corpus import keyword_search

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return keyword_search(d, ["spark", "query"])


def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval for ['spark', 'query', 'data'] — the
    ranking sibling of q_keyword_search. Integer-micros saturation
    arithmetic (operators/corpus.py::bm25_search) makes the top-20
    (score DESC, doc_id ASC) bit-exact across engines; the oracle
    replays tf/df/idf/dl/avgdl and the pinned DIV chain in SQL."""
    from serd_spark.operators.corpus import bm25_search

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return bm25_search(d, ["spark", "query", "data"], top_k=20)


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark 13-gram decontamination. The "benchmark" is a
    deterministic slice of the corpus itself (doc_id % 37 == 0), so
    contamination provably exists: those docs self-hit at 1.0 and any
    cross-doc shared 13-gram surfaces. The benchmark span set is
    broadcast; the corpus side never shuffles text."""
    from serd_spark.operators.corpus import decontaminate

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    bench = d.filter(F.col("doc_id") % 37 == 0)
    return decontaminate(d, bench, k=13)


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join: each click matched to the user's latest
    view at-or-before it — the union+window as-of shape (ONE shuffle
    on user_id, no inequality-join row blowup). Ties on (user, ts)
    break by max view event_id; timestamps emitted as formatted
    strings and the gap in whole seconds for cross-engine equality."""
    from serd_spark.operators.asof import asof_join

    e = _t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    views = e.filter(F.col("event_type") == "view").select("user_id", "ts", "event_id")
    out = asof_join(clicks, views, on="user_id", ts="ts", tie_col="event_id")
    return out.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("click_ts"),
        F.col("event_id_r").alias("view_id"),
        F.date_format("ts_r", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("view_ts"),
        (F.unix_timestamp("ts") - F.unix_timestamp("ts_r")).cast("long").alias("gap_s"),
    )


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-micros PageRank over the customer–supplier bipartite
    graph (distinct (o_custkey, l_suppkey) trade pairs, mirrored to
    undirected; node ids disjoint via 2k / 2k+1). 5 iterations of
    join+aggregate with per-iteration lineage cuts — the KG
    hub-entity scoring shape."""
    from serd_spark.operators.graph import pagerank

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    return pagerank(edges, n_iter=5)


def q_trustrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank / TrustRank (operators/graph.py::
    personalized_pagerank): teleport restricted to a seed set over
    the hash-folded DIRECTED trade graph (keys mod 9973 so nodes act
    as both source and target — multi-hop trust paths exist). Seeds
    are the closed-form node % 50 == 0 slice; seeds outside the graph
    are dropped by the operator. Integer micros throughout — the
    oracle replays every iteration (seeded base term, floor-divided
    contributions) as chained CTEs, bit-exact."""
    from serd_spark.operators.graph import personalized_pagerank

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = o.join(li, o.o_orderkey == li.l_orderkey).select(
        (F.col("o_custkey") % 9973).alias("src"),
        (F.col("l_suppkey") % 9973).alias("dst"),
    )
    seeds = spark.range(0, 9973, 50).select(F.col("id").alias("node"))
    return personalized_pagerank(edges, seeds, n_iter=5)


def q_anf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANF / HyperANF neighborhood function (operators/graph.py::
    neighborhood_function): reachable-pairs-within-t-hops over the
    hash-folded undirected trade graph — per-node 16-register HLL
    sketches max-merged along edges each round, exact-integer
    harmonic denominators, pre-floored linear-counting lookup (no
    runtime transcendentals). The oracle replays the register tables
    round by round and every per-node estimate as chained CTEs —
    bit-exact, the determinism certificate for the distance-
    distribution estimator."""
    from serd_spark.operators.graph import neighborhood_function

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = o.join(li, o.o_orderkey == li.l_orderkey).select(
        (F.col("o_custkey") % 9973).alias("src"),
        (F.col("l_suppkey") % 9973).alias("dst"),
    )
    return neighborhood_function(edges, n_rounds=3)


def q_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count (operators/graph.py triangle_count) over
    a hash-folded trade graph (customer/supplier keys folded into one
    id space mod 9973, so the bipartite structure closes into
    triangles). Degree-ordered orientation keeps the wedge join near
    m^1.5 — hub nodes get LOW out-degree. The DuckDB oracle
    brute-forces the count with a canonical a<b<c three-way
    self-join over the identically derived edge set."""
    from serd_spark.operators.graph import triangle_count

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = o.join(li, o.o_orderkey == li.l_orderkey).select(
        (F.col("o_custkey") % 9973).alias("src"),
        (F.col("l_suppkey") % 9973).alias("dst"),
    )
    return triangle_count(edges)


def _inc_split(spark: SparkSession, sf_dir: str):
    """old = two thirds of the corpus; new = the other third PLUS
    re-keyed copies (id + 100000) of every old doc with id % 17 == 1,
    so exact cross-snapshot duplicates provably exist (the corpus has
    no natural byte-dups — same trick as q_decontaminate's planted
    benchmark)."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    old = d.filter(F.col("doc_id") % 3 != 0)
    new = d.filter(F.col("doc_id") % 3 == 0).unionByName(
        old.filter(F.col("doc_id") % 17 == 1).select(
            (F.col("doc_id") + 100000).alias("doc_id"), "text"
        )
    )
    return new, old


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-snapshot incremental dedup (operators/dedup.py::
    incremental_dedup): the new-crawl increment deduped against the
    existing corpus — exact fingerprint stage first, then NEW × OLD
    LSH band join only (never new×new), best old match per new doc.
    Signatures/bands for both sides are materialized so DuckDB
    replays the band join, the agreement verify, the (jaccard DESC,
    old id ASC) argmax, and the three-way status CASE."""
    from serd_spark.operators.dedup import incremental_dedup
    from serd_spark.operators.linking import lsh_bands, signatures

    new, old = _inc_split(spark, sf_dir)
    for tag, side in (("new", new), ("old", old)):
        named = side.select(
            F.col("doc_id").cast("string").alias("entity"),
            F.col("text").alias("name"),
        )
        _materialize(sf_dir, f"inc/sigs_{tag}", lambda n=named: signatures(n))
        _materialize(
            sf_dir, f"inc/bands_{tag}",
            lambda t=tag: lsh_bands(
                spark.read.parquet(_oracle_path(sf_dir, f"inc/sigs_{t}"))
            ),
        )
    return incremental_dedup(new, old, threshold=0.5)


def q_pq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (operators/pq.py): 8 subspaces × 16
    codes trained with 3 exact-integer Lloyd rounds, vectors encoded
    to 8 codes, and the vec-0 query answered by ADC — the m × k
    lookup table folded into codegen as literal arrays. The oracle
    replays the ENTIRE pipeline (all subspace trainings iteration by
    iteration, the encoding, and the ADC search) from raw parquet —
    no materialized intermediate, bit-exact."""
    from serd_spark.operators.pq import pq_encode, pq_topk, pq_train

    emb = _t(spark, sf_dir, "embeddings")
    books = pq_train(emb, m=8, k=16, n_iter=3)
    enc = pq_encode(emb, books)
    q = list(emb.filter(F.col("vec_id") == 0).first().embedding)
    return pq_topk(enc, books, q, top_k=10)


def q_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8 quantization + quantized-L2 top-k
    (operators/quant.py): per-dimension min/max stats (one dim-keyed
    aggregate), a shuffle-free encode to one byte per dimension (4×
    smaller vector storage at 100 TB), and the vec-0 query answered
    with pure-integer codegen arithmetic — query codes and spans fold
    in as literals, like q_pq_search's ADC table. The oracle replays
    stats → codes → distance → top-k from raw parquet with identical
    non-negative integer division everywhere."""
    from serd_spark.operators.quant import sq_encode, sq_stats, sq_topk

    emb = _t(spark, sf_dir, "embeddings")
    lo, hi = sq_stats(emb)
    q = list(emb.filter(F.col("vec_id") == 0).first().embedding)
    return sq_topk(sq_encode(emb, lo, hi), lo, hi, q, top_k=10)


def q_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-table exact k-means (k=8, 5 Lloyd rounds) over the
    embeddings table — operators/clustering.py. Power-of-two
    quantization (floor(v * 2^20): exact in IEEE double, no rounding
    mode to disagree on), md5-ordered seeding, truncating-division
    centroid updates. The oracle replays every iteration as chained
    CTEs; (vec_id, cluster, dist) pins each assignment AND the exact
    integer distance to the final centroid."""
    from serd_spark.operators.clustering import kmeans

    emb = _t(spark, sf_dir, "embeddings")
    return kmeans(emb, k=8, n_iter=5)


def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (clustering.py::semdedup): exact
    k-means partitions the embedding space, then a vector is dropped
    iff a SMALLER-id vector in its cluster has cosine >= 0.4 (6 dp,
    the repo's cross-engine float rule) — so exactly the smallest id
    of each in-cluster duplicate group survives. The k-means pipeline
    itself is certified by q_kmeans; here the deterministic
    assignment is materialized and DuckDB independently replays the
    within-cluster cosine join + id-argmin verdict. dup_of = -1
    sentinel when kept (never NULL)."""
    from serd_spark.operators.clustering import kmeans, semdedup

    emb = _t(spark, sf_dir, "embeddings")
    _materialize(
        sf_dir, "semdedup_assign",
        lambda: kmeans(emb, k=8, n_iter=2).select("vec_id", "cluster"),
    )
    return semdedup(emb, k=8, n_iter=2, threshold=0.4).orderBy("vec_id")


def q_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-integer PCA (operators/pca.py): top principal component
    of the embeddings table by power iteration on a quantized,
    mean-centered integer covariance — two tree-aggregate Arrow
    passes (dim and dim² partial rows per task), a 4096-cell driver
    iteration, one projection pass. Everything truncating-division
    deterministic, so the oracle replays quantization, means,
    covariance, all 8 matvec+rescale rounds AND the projections —
    any float leak or division-sign slip desynchronizes it."""
    from serd_spark.operators.pca import pca_power_iteration

    emb = _t(spark, sf_dir, "embeddings")
    proj, _w = pca_power_iteration(emb, n_iter=8, dim=64)
    return proj.orderBy("vec_id")


def q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition (k=35, 4 synchronous peel rounds — the
    sf0.01 graph reaches its fixpoint in 2) over the same hash-folded
    trade graph as q_triangles. The oracle replays the identical
    rounds as chained CTEs; the fixed round count is what makes the
    data-dependent peel cross-engine deterministic."""
    from serd_spark.operators.graph import k_core

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = o.join(li, o.o_orderkey == li.l_orderkey).select(
        (F.col("o_custkey") % 9973).alias("src"),
        (F.col("l_suppkey") % 9973).alias("dst"),
    )
    return k_core(edges, k=35, n_rounds=4)


def q_label_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label propagation (5 iterations, mode-of-neighbor
    labels, min-label tie-break) over the hash-folded trade graph —
    the deterministic LPA variant (operators/graph.py). Returns the
    full (node, label) table so the oracle pins every assignment, not
    just community sizes."""
    from serd_spark.operators.graph import label_propagation

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = o.join(li, o.o_orderkey == li.l_orderkey).select(
        (F.col("o_custkey") % 9973).alias("src"),
        (F.col("l_suppkey") % 9973).alias("dst"),
    )
    return label_propagation(edges, n_iter=5)


def _trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hash-folded trade graph shared by the graph family
    (q_triangles/q_kcore/q_label_prop and the walk/BFS/link-predict
    queries): customer and supplier keys folded into one id space mod
    9973 so the bipartite structure closes into wedges and cycles."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    return o.join(li, o.o_orderkey == li.l_orderkey).select(
        (F.col("o_custkey") % 9973).alias("src"),
        (F.col("l_suppkey") % 9973).alias("dst"),
    )


def q_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted multi-source shortest paths (graph.py::sssp —
    frontier-active Bellman-Ford, integer weights derived closed-form
    from the edge endpoints) over the hash-folded trade graph, seeds
    node % 997 == 0, 3 rounds. The oracle replays the rounds as
    FULL-relax chained CTEs — a structurally different formulation
    whose r-round invariant (min cost over ≤ r-edge paths) provably
    coincides with the frontier version's, so matching rows certify
    the frontier optimization preserved semantics."""
    from serd_spark.operators.graph import sssp

    e = _trade_edges(spark, sf_dir).select(
        "src",
        "dst",
        (1 + (F.col("src") * 7 + F.col("dst") * 13) % 9).alias("w"),
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    seeds = nodes.filter(F.col("node") % 997 == 0)
    return (
        sssp(e, seeds, n_rounds=3)
        .select("node", F.col("dist").cast("long").alias("dist"))
        .orderBy("node")
    )


def q_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS hop distance (graph.py::bfs_distance) from a
    deterministic seed set (node % 997 == 0) over the hash-folded
    trade graph — frontier-only propagation, so each reachable edge
    is traversed once across all rounds, not once per round. The
    oracle replays all 3 frontier/settled rounds as chained CTEs with
    the identical anti-join."""
    from serd_spark.operators.graph import bfs_distance

    edges = _trade_edges(spark, sf_dir)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    seeds = nodes.filter(F.col("node") % 997 == 0)
    return (
        bfs_distance(edges, seeds, n_rounds=3, undirected=True)
        .select("node", F.col("dist").cast("int").alias("dist"))
        .orderBy("node")
    )


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-step funnel view → click → purchase per user
    (funnel.py::funnel): chained-earliest semantics (each step's
    timestamp is the earliest occurrence STRICTLY after the previous
    step), computed with ONE shuffle — filter to the funnel types,
    group by user, row-local array scan. The oracle replays the
    chain as three chained min-aggregate CTEs with the identical
    strict-> tie rule; timestamps emitted as formatted strings with
    the null chain tail pinned to '' (driver NULL sort rule)."""
    from serd_spark.operators.funnel import funnel

    e = _t(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    out = funnel(e, ["view", "click", "purchase"])
    fmt = lambda c, a: F.coalesce(  # noqa: E731
        F.date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS"), F.lit("")
    ).alias(a)
    return out.select(
        "user_id",
        "steps_completed",
        fmt("t_1", "t1"),
        fmt("t_2", "t2"),
        fmt("t_3", "t3"),
    ).orderBy("user_id")


def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline of parts — Pareto frontier for (minimize price,
    maximize size), i.e. "no other part is at least as big for less"
    (skyline.py::skyline2d). Two-level plan: fixed-width price
    buckets, per-bucket local skyline via one RANGE-framed window,
    then a prefix-max over the tiny bucket table broadcast back — no
    global-order window anywhere. Money as integer cents per row.
    The oracle is the dominance definition itself: NOT EXISTS a
    strictly-better row — a fully independent formulation."""
    from serd_spark.operators.skyline import skyline2d

    p = _t(spark, sf_dir, "part").select(
        "p_partkey",
        _cents(F.col("p_retailprice")).alias("price_c"),
        F.col("p_size").cast("long").alias("size"),
    )
    return skyline2d(p, "price_c", "size", bucket_width=5000).orderBy(
        "p_partkey"
    )


def q_kg_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KG snapshot diff (diff.py::triple_diff) certified by a
    perturb-and-diff harness: the "old" snapshot is derived from the
    freshly-extracted triple table by two md5-url-class mutations —
    class-0 urls lose their relatedLink statements (diff must report
    them ADDED) and class-1 urls get their name literals rewritten to
    a stale spelling (diff must report the stale form REMOVED and the
    current form ADDED). One union+groupBy pass, no joins. The oracle
    replays the class rules, the mutation, and the set diff wholesale
    from the materialized triple parquet."""
    from serd_spark.operators.diff import triple_diff

    _materialize_triples(spark, sf_dir)
    t = _kg_triples(spark, sf_dir)
    cls = (
        F.conv(F.substring(F.md5("url"), 1, 4), 16, 10).cast("long") % 10
    )
    rel_p = "http://schema.org/relatedLink"
    name_p = "http://schema.org/name"
    old = (
        t.withColumn("_cls", cls)
        .filter(~((F.col("_cls") == 0) & (F.col("p") == rel_p)))
        .withColumn(
            "o",
            F.when(
                (F.col("_cls") == 1)
                & (F.col("p") == name_p)
                & (F.col("o_kind") == 1),
                F.concat(F.col("o"), F.lit(" (stale)")),
            ).otherwise(F.col("o")),
        )
        .drop("_cls")
    )
    d = triple_diff(old, t)
    pin = F.conv(
        F.substring(
            F.md5(F.concat_ws("\u0001", "g", "s", "p", "o")), 1, 10
        ),
        16,
        10,
    ).cast("long")
    return (
        d.groupBy("p", "change")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(pin).cast("long").alias("pin"),
        )
        .orderBy("p", "change")
    )


def q_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (graph.py::assortativity) over the
    undirected hash-folded trade graph — exact-integer Pearson
    moments (the certificate pins all five sums, not just the
    rounded ratio; the one float division runs on identical operands
    in both engines). One degree hash-agg + two co-partitioned
    joins + one final aggregate."""
    from serd_spark.operators.graph import assortativity

    return assortativity(
        _trade_edges(spark, sf_dir), undirected=True
    )


def stream_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING funnel driven end-to-end: events flow through an
    availableNow stream into the chained-earliest funnel state
    (streaming/incremental.streaming_funnel); a user's completion
    row is emitted exactly once, in the batch where the purchase
    fires. One data batch by design (the stream_sessions argument:
    multi-file batch assignment is not event-time-ordered, and the
    operator's exactness premise is in-order arrival — cross-batch
    chaining is certified by a controlled-arrival-order unit test).
    The oracle replays the chain as q_funnel's min-aggregate CTEs
    restricted to completed users."""
    import shutil

    from serd_spark.streaming.incremental import streaming_funnel

    base = os.path.join(
        "/tmp/serd_spark_stream_funnel",
        os.path.basename(os.path.normpath(sf_dir)),
    )
    in_dir = os.path.join(base, "events")
    out_dir = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")
    shutil.rmtree(base, ignore_errors=True)
    _ensure_shipped(spark)
    _t(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "event_type",
    ).repartition(6).write.parquet(in_dir)

    ev = spark.readStream.schema(
        "user_id long, ts timestamp, event_type string"
    ).parquet(in_dir)
    fun = streaming_funnel(ev, ["view", "click", "purchase"])

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={batch_id}")
        )

    q = (
        fun.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir).select(
        "user_id",
        F.date_format("t_1", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("t1"),
        F.date_format("t_2", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("t2"),
        F.date_format("t_3", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("t3"),
    ).orderBy("user_id")


def stream_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING MERGE driven end-to-end
    (streaming/incremental.streaming_upsert_sink): raw pages with
    re-crawl duplicates flow through a multi-batch availableNow
    stream whose foreachBatch body upserts latest-wins winners into
    a bucket-partitioned keyed table. Files are NOT url-colocated —
    a url's re-crawls may land in different micro-batches in either
    order, and the conditional merge (max (warc_ts, xxhash64) over
    existing ∪ batch) makes the final table equal batch latest_crawl
    anyway. The oracle replays arg_max per url over the materialized
    raw pages."""
    import shutil

    from serd_spark.sources.pages import synthesize_pages
    from serd_spark.streaming.incremental import (
        stream_pages,
        streaming_upsert_sink,
    )

    n = max(100, _n_pages(sf_dir) // 4)
    base = os.path.join(
        "/tmp/serd_spark_stream_upsert",
        os.path.basename(os.path.normpath(sf_dir)),
    )
    pages_dir = os.path.join(base, "pages")
    tbl = os.path.join(base, "tbl")
    ckpt = os.path.join(base, "ckpt")
    shutil.rmtree(base, ignore_errors=True)
    _ensure_shipped(spark)
    synthesize_pages(spark, n, seed=42).repartition(6).write.parquet(
        pages_dir
    )

    src = stream_pages(
        spark, pages_dir, max_files_per_trigger=2
    ).withColumn("_h", F.xxhash64("html"))
    sink = streaming_upsert_sink(
        spark, tbl, key="url", order_cols=["warc_ts", "_h"], n_buckets=8
    )
    q = (
        src.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # _h (xxhash64, JVM-only) is materialized so the oracle can mirror
    # the sink's FULL (warc_ts, _h) tie-break — ARG_MAX(hmd5, warc_ts)
    # alone is nondeterministic if two crawls of one url ever share a
    # timestamp (ADVICE r4). Fresh name: the deriving lambda changed.
    _materialize(
        sf_dir, "upsert_raw_pages_h",
        lambda: spark.read.parquet(pages_dir).select(
            "url", "warc_ts", F.xxhash64("html").alias("_h"),
            F.md5("html").alias("hmd5"),
        ),
    )
    return (
        spark.read.parquet(tbl)
        .select(
            "url",
            F.date_format("warc_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "ts"
            ),
            F.md5("html").alias("hmd5"),
        )
        .orderBy("url")
    )


def q_length_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching (packing.py::length_batches): docs
    grouped into fixed-count batches of similar token length so
    padding-to-batch-max stays small; rank windows are PARTITIONED
    by length bucket, never global. Output is per-batch padding
    accounting; the oracle replays the bucket/rank/batch derivation
    with a plain SQL window and the identical (n_tokens, doc_id)
    tie-break."""
    from serd_spark.operators.packing import length_batches

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    lb = length_batches(d, batch_size=8, bucket_width=16)
    return (
        lb.groupBy("bucket", "batch_idx")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.max("n_tokens").cast("long").alias("max_tok"),
            F.sum("n_tokens").cast("long").alias("sum_tok"),
        )
        .withColumn(
            "padding_waste",
            (F.col("max_tok") * F.col("n_docs") - F.col("sum_tok"))
            .cast("long"),
        )
        .orderBy("bucket", "batch_idx")
    )


def q_c4_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style line-level cleaning (corpus.py::c4_line_filters —
    terminal punctuation, min-words, curly braces, lorem ipsum) over
    the latest-crawl page text, entirely row-local (split + HOF
    filter + re-join, no explode/shuffle). The oracle replays every
    predicate with DuckDB list_filter lambdas over the materialized
    page text and pins the kept text by md5."""
    from serd_spark.operators.corpus import c4_line_filters
    from serd_spark.sources.pages import latest_crawl

    p = latest_crawl(_pages(spark, sf_dir)).select("url", "text")
    _materialize(sf_dir, "pages_text_latest", lambda: p)
    out = c4_line_filters(p, text_col="text", id_col="url")
    return out.select(
        "url",
        "n_lines",
        "n_kept",
        F.md5("kept_text").alias("kept_md5"),
    ).orderBy("url")


def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch / Flesch–Kincaid readability per document
    (text.py::readability) — integer-micros formulas over pinned
    word/sentence/syllable heuristics, pure JVM map-only. The oracle
    recomputes every row from the documents table with the identical
    regex counts and integer divisions."""
    from serd_spark.operators.text import readability

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return readability(d).orderBy("doc_id")


def q_wet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WET derivation fixpoint (sources/warc.py::write_wet/read_wet):
    the pages corpus' EXTRACTED TEXT is written as Common-Crawl-style
    .wet conversion shards and read back; per-url record counts,
    formatted max timestamp and text md5s must equal the original
    table — the archival face of the north-star byte-identical-text
    invariant (one mangled byte anywhere in the record writer, the
    parser, or the UTF-8 round trip fails the hash)."""
    import shutil

    from serd_spark.sources.warc import read_wet, write_wet

    src = _pages(spark, sf_dir).select("url", "warc_ts", "text")
    _materialize(sf_dir, "wet_src", lambda: src)
    out = os.path.join(
        "/tmp/serd_spark_wet", os.path.basename(os.path.normpath(sf_dir))
    )
    shutil.rmtree(out, ignore_errors=True)
    write_wet(src, out, n_files=8).collect()
    return (
        read_wet(spark, out + "/*.wet")
        .groupBy("url")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.date_format(
                F.max("warc_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"
            ).alias("ts_max"),
            F.min(F.md5(F.encode("text", "UTF-8"))).alias("h_min"),
            F.max(F.md5(F.encode("text", "UTF-8"))).alias("h_max"),
        )
        .orderBy("url")
    )


def q_wat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WAT derivation fixpoint (sources/warc.py::wat_payload +
    write_wat/read_wat): per-page metadata JSON — url, title, href
    links — derived entirely JVM-side, written as Common-Crawl-style
    .wat metadata shards and read back. Per url the round-tripped
    JSON must md5-match the freshly-derived table (determinism +
    writer/parser integrity) and re-parse as JSON with the declared
    shape (links count extracted via from_json)."""
    import shutil

    from serd_spark.sources.warc import read_wat, wat_payload, write_wat

    src = _pages(spark, sf_dir).select(
        "url", "warc_ts", wat_payload().alias("wat")
    )
    _materialize(sf_dir, "wat_src", lambda: src)
    out = os.path.join(
        "/tmp/serd_spark_wat", os.path.basename(os.path.normpath(sf_dir))
    )
    shutil.rmtree(out, ignore_errors=True)
    write_wat(src, out, n_files=8).collect()
    back = read_wat(spark, out + "/*.wat")
    links = F.from_json(
        "wat", "struct<url:string,title:string,links:array<string>>"
    )["links"]
    return (
        back.groupBy("url")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min(F.md5(F.encode("wat", "UTF-8"))).alias("h_min"),
            F.max(F.md5(F.encode("wat", "UTF-8"))).alias("h_max"),
            F.sum(F.size(links)).cast("long").alias("n_links"),
        )
        .orderBy("url")
    )


def q_bitext(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based bitext mining (bitext.py::bitext_mine — the
    LASER/CCMatrix ratio-margin recipe) across the even/odd halves of
    the embedding table: coarse-quantizer cells, query-side
    multi-probe, cell-equi-join candidates (never all-pairs), and
    exact integer-micros margin scoring. The probe/assignment tables
    are materialized; the oracle rebuilds candidates from them and
    replays cosines, both neighborhood rankings, the margin division
    and the forward-best rule in SQL."""
    from serd_spark.operators.bitext import bitext_mine

    emb = _t(spark, sf_dir, "embeddings")
    a = emb.filter(F.col("vec_id") % 2 == 0)
    b = emb.filter(F.col("vec_id") % 2 == 1)
    # IVF discipline: cells scale with the table (~64 vectors/cell)
    # so candidate volume stays ~n·n_probe·cell, linear in n — at
    # sf0.01 this resolves to the 16 cells the oracle replays
    n_cells = max(16, emb.count() // 64)
    pairs, a_probed, b_assigned = bitext_mine(
        a, b, n_centroids=n_cells, n_probe=3, k=4,
        margin_threshold_micros=1_020_000,
    )
    _materialize(
        sf_dir, "bitext_probes",
        lambda: a_probed.select("a_id", "centroid"),
    )
    _materialize(
        sf_dir, "bitext_assign",
        lambda: b_assigned.select("b_id", "centroid"),
    )
    return pairs.orderBy("a_id")


def q_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML <table> extraction to (page, table, row, col, cell) long
    form (tables.py::extract_tables — three chained regex+posexplode
    stages, pure JVM, map-only). Certified by declared ground truth:
    the generator renders 7 markup variants to match per-page
    table/row/cell counts and an md5 cell-content pin; the Spark side
    recovers all four from markup alone and counts exact matches,
    while the oracle aggregates only declared columns and asserts
    n_exact == n per variant."""
    from serd_spark.operators.tables import (
        cells_pin,
        extract_tables,
        synthesize_table_pages,
    )

    src = synthesize_table_pages(spark, max(70, _n_pages(sf_dir) // 8))
    _materialize(
        sf_dir, "tables_meta",
        lambda: src.select(
            "tbl_id", "variant", "n_tables", "n_rows", "n_cells", "pin"
        ),
    )
    ex = extract_tables(src)
    agg = ex.groupBy("tbl_id").agg(
        (F.max("t_idx") + 1).cast("long").alias("x_tables"),
        F.count_distinct(F.struct("t_idx", "r_idx"))
        .cast("long")
        .alias("x_rows"),
        F.count(F.lit(1)).cast("long").alias("x_cells"),
        cells_pin(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct("t_idx", "r_idx", "c_idx", "cell")
                    )
                ),
                lambda s: s["cell"],
            )
        ).alias("x_pin"),
    )
    j = src.join(agg, "tbl_id", "left")
    exact = (
        (F.coalesce(F.col("x_tables"), F.lit(0)) == F.col("n_tables"))
        & (F.coalesce(F.col("x_rows"), F.lit(0)) == F.col("n_rows"))
        & (F.coalesce(F.col("x_cells"), F.lit(0)) == F.col("n_cells"))
        & F.col("x_pin").eqNullSafe(F.col("pin"))
    )
    return (
        j.groupBy("variant")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(exact.cast("long")).cast("long").alias("n_exact"),
            F.sum("n_cells").cast("long").alias("cells"),
        )
        .orderBy("variant")
    )


def q_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup (stats.py::hll_sketch/hll_merge):
    per-hour HLL register tables over distinct (user, event_type),
    rolled up to an all-time estimate by register-wise MAX — raw
    events are NEVER rescanned for the coarse grain. The final rows
    pit the merged estimate against a direct full-scan sketch; max's
    associativity makes them identical, and the oracle replays hourly
    registers, the merge, and the direct sketch independently (the
    q_hll exact-integer harmonic arithmetic per grain)."""
    from serd_spark.operators.stats import (
        hll_estimate,
        hll_merge,
        hll_sketch,
    )

    e = _t(spark, sf_dir, "events").select(
        F.date_format("ts", "yyyy-MM-dd HH").alias("hour"),
        F.concat_ws("|", F.col("user_id"), F.col("event_type")).alias(
            "v"
        ),
    )
    # the register table is hours × 256 rows — checkpoint so the
    # per-hour and merged branches reuse one events scan
    hourly = hll_sketch(e, "v", p=8, by=("hour",)).localCheckpoint()
    tail = ["m", "n_regs", "zero_regs", "denom", "hll_est"]
    per_hour = hll_estimate(hourly, p=8, by=("hour",)).select(
        F.col("hour").alias("grain"), *tail
    )
    merged = hll_estimate(hll_merge(hourly), p=8).select(
        F.lit("zz:merged").alias("grain"), *tail
    )
    direct = hll_estimate(hll_sketch(e, "v", p=8), p=8).select(
        F.lit("zz:direct").alias("grain"), *tail
    )
    return (
        per_hour.unionByName(merged)
        .unionByName(direct)
        .orderBy("grain")
    )


def q_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic uniform random walks (graph.py::random_walks,
    the DeepWalk/node2vec corpus generator) over the hash-folded
    trade graph: 2 replicas per start node, 3 steps, every draw an
    md5 pure function of (start, replica, step). The oracle rebuilds
    the (src, dst-ascending) indexed adjacency with the same window
    and replays every step join byte-for-byte."""
    from serd_spark.operators.graph import random_walks

    edges = _trade_edges(spark, sf_dir)
    return random_walks(edges, walk_len=3, walks_per_node=2).orderBy(
        "start", "w", "step"
    )


def q_link_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction (graph.py::link_predict): common-neighbors +
    integer-micros Adamic–Adar over 2-hop wedges of the trade graph,
    hub centers capped at deg 64 (the quadratic-blowup guard), top 50
    non-adjacent pairs under an explicit total order. The oracle
    replays degrees, the capped wedge self-join, the integer AA terms
    and the anti-join independently."""
    from serd_spark.operators.graph import link_predict

    edges = _trade_edges(spark, sf_dir)
    return link_predict(edges, max_center_deg=64, min_cn=2, top_k=50)


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: per click, the count and latest id of the same
    user's views in the preceding 10 minutes (inclusive both ends) —
    the bucketized-equi-join range join (operators/rangejoin.py), left
    outer so zero-view clicks appear. The oracle replays it as the
    naive inequality join, affordable at oracle scale."""
    from serd_spark.operators.rangejoin import range_join

    e = _t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_id")
    )
    out = range_join(clicks, views, on="user_id", before_s=600, after_s=0, how="left")
    return out.groupBy("click_id", "user_id").agg(
        F.count("view_id").cast("long").alias("n_views_10m"),
        F.max("view_id").alias("last_view_id"),
    )


def q_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group percentile_disc quantiles of order value in
    integer cents (operators/stats.py): groupBy(value) first, rank
    selection over the distinct-value table — no global sort, no
    sketch approximation."""
    from serd_spark.operators.stats import exact_quantiles

    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag", _cents(F.col("l_extendedprice")).alias("price_cents")
    )
    return exact_quantiles(
        li, "price_cents", [10, 250, 500, 750, 990], by=["l_returnflag"]
    )


def q_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-count sketch (operators/stats.py sketch_distinct):
    per-language estimate of distinct document texts via md5-prefix
    threshold sampling — the keep/drop predicate runs map-side BEFORE
    the shuffle, so at 100 TB the distinct agg sees a 16^z-times-
    smaller table. The DuckDB oracle replays the identical hex-prefix
    rule, so counts AND estimates match bit-for-bit."""
    from serd_spark.operators.stats import sketch_distinct

    docs = _t(spark, sf_dir, "documents").select("lang", "text")
    return sketch_distinct(docs, "text", by=["lang"], prefix_zeros=1)


def q_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-count (stats.py::hll_sketch/hll_estimate)
    over the corpus token stream, certified against the exact
    countDistinct. The register table is ONE hash aggregate bounded at
    m=256 rows whatever the cardinality (the mergeable complement to
    q_distinct_sketch's KMV sampling); the harmonic denominator is an
    exact bigint (order-independent), so the DuckDB oracle replays
    hash → bucket → rho → registers → estimate bit-for-bit. The final
    join is 1 row × 1 row (two single-row aggregates), not a data
    cross product."""
    from serd_spark.operators.corpus import _min_parallelism
    from serd_spark.operators.stats import hll_estimate, hll_sketch

    d = _min_parallelism(_t(spark, sf_dir, "documents").select("text"))
    words = d.select(
        F.explode(
            F.split(
                F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")),
                " ",
            )
        ).alias("w")
    ).filter(F.col("w") != "")
    est = hll_estimate(hll_sketch(words, "w", p=8), p=8)
    exact = words.agg(
        F.countDistinct("w").cast("long").alias("exact_distinct")
    )
    return est.join(F.broadcast(exact))


MIX_WEIGHTS = {"en": 300, "zh": 250, "es": 200, "de": 150, "fr": 100}


def q_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture resampling (corpus.py::mix_domains): derive each
    language's keep-rate from target per-mille shares + an 80% token
    budget, then md5-threshold sample to hit the mixture. zh's target
    exceeds its corpus share, so its rate caps at 1e6 ppm — both the
    capped and proportional branches are exercised. The oracle replays
    token counts, the overflow-safe two-step rate division, and the
    (u32*1e6)>>32 membership rule."""
    from serd_spark.operators.corpus import _min_parallelism, mix_domains

    docs = _min_parallelism(
        _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    )
    return mix_domains(docs, MIX_WEIGHTS, budget_num=4, budget_den=5)


BPE_MERGES = 6


def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training (operators/bpe.py): the
    corpus collapses to a word-frequency table in one pass, then each
    merge is a weighted pair-count aggregate + total-tie-break argmax
    + JVM-side greedy fold. The per-iteration symbolization tables are
    materialized at oracle scale; DuckDB independently recomputes every
    iteration's pair counts and argmax from them (the fold itself is
    pinned by tests/test_bpe.py against a pure-Python reference)."""
    from serd_spark.operators.bpe import train_bpe

    d = _t(spark, sf_dir, "documents").select("text")

    def hook(rank: int, syms_df: DataFrame) -> None:
        _materialize(sf_dir, f"bpe/w{rank}", lambda: syms_df)

    # min_pair_count=1: the oracle replays exactly BPE_MERGES fixed
    # iterations (one CTE branch per materialized table), so training
    # must not early-stop at sf0.01 — any non-degenerate corpus has a
    # surviving pair at every rank here
    merges = train_bpe(
        d, n_merges=BPE_MERGES, min_pair_count=1, on_iteration=hook
    )
    return spark.createDataFrame(
        [(m.rank, m.left, m.right, m.pair_count) for m in merges],
        "rank int, merge_left string, merge_right string, pair_count long",
    )


def q_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tokenizer SIDE of BPE (operators/bpe.py tokenize_bpe):
    train the same BPE_MERGES merges as q_bpe_train, then tokenize
    every document (Arrow-batched, per-worker word→length memo).
    Hybrid oracle: bpe_words is recomputed by DuckDB from the raw
    text with the identical Java-whitespace split rule, while
    bpe_tokens re-aggregates the materialized per-doc counts (greedy
    rank-order merge application has no SQL formula; the fold is
    pinned by tests/test_bpe.py against the pure-Python reference) —
    the Spark side recomputes BOTH from scratch, so a hash match
    proves deterministic training+tokenization and word-rule parity."""
    from serd_spark.operators.bpe import tokenize_bpe, train_bpe

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    merges = train_bpe(
        docs.select("text"), n_merges=BPE_MERGES, min_pair_count=1
    )
    _materialize(
        sf_dir, "bpe_tokenized",
        lambda: tokenize_bpe(docs, merges).select("doc_id", "bpe_tokens"),
    )
    return (
        tokenize_bpe(docs, merges)
        .select("doc_id", "bpe_words", "bpe_tokens")
        .orderBy("doc_id")
    )


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing (operators/packing.py): global token
    offsets via a distributed two-level prefix sum (per-block sums +
    block-offset window over the tiny block table), then budget cuts —
    no global-order window over the data."""
    from serd_spark.operators.packing import pack_sequences

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return pack_sequences(d, budget_tokens=2048)


def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE session_window (the streaming-capable session
    operator — the same expression works under a watermark in
    Structured Streaming) certified against an independent
    gaps-and-islands mirror. Semantics pinned: an event at exactly
    start+gap does NOT extend the session (new session when the
    inter-event gap is >= 30 min), and the session end is
    last_event_ts + gap."""
    e = _t(spark, sf_dir, "events")
    sw = F.session_window(F.col("ts").cast("timestamp"), "30 minutes")
    return (
        e.groupBy("user_id", sw)
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .select(
            "user_id",
            F.date_format("session_window.start", "yyyy-MM-dd HH:mm:ss.SSSSSS")
            .alias("sess_start"),
            F.date_format("session_window.end", "yyyy-MM-dd HH:mm:ss.SSSSSS")
            .alias("sess_end"),
            "n_events",
        )
    )


def stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING session windows driven end-to-end: the events table
    flows through an availableNow stream into the session-window
    state store under a 2 h watermark; the no-data flush batch then
    evicts every session whose end <= max(ts) - 2 h (boundary
    INCLUDED — semantics pinned empirically, see
    streaming/incremental.streaming_sessions). One data batch by
    design: with multi-file triggers the file→batch assignment is
    not event-time-ordered, so intermediate watermarks would drop
    late events nondeterministically and no engine-independent
    oracle could mirror the output (the multi-batch cross-batch
    session MERGE is certified by tests/test_streaming.py instead).
    The DuckDB oracle rebuilds the sessions as gaps-and-islands and
    applies the same eviction cut."""
    import shutil

    from serd_spark.streaming.incremental import streaming_sessions

    base = os.path.join(
        "/tmp/serd_spark_stream_sessions",
        os.path.basename(os.path.normpath(sf_dir)),
    )
    in_dir = os.path.join(base, "events")
    out_dir = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")
    shutil.rmtree(base, ignore_errors=True)
    _ensure_shipped(spark)
    _t(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    ).repartition(6).write.parquet(in_dir)

    ev = spark.readStream.schema("user_id long, ts timestamp").parquet(in_dir)
    agg = streaming_sessions(ev, gap="30 minutes", watermark="2 hours")

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={batch_id}")
        )

    q = (
        agg.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir).select(
        "user_id",
        F.date_format("session_window.start", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .alias("sess_start"),
        F.date_format("session_window.end", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .alias("sess_end"),
        "n_events",
    )


def stream_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING per-day quantile sketches driven end-to-end: event
    values flow through an availableNow stream into a tumbling-window
    HDR sketch (streaming/incremental.streaming_hdr_sketch) under a
    2 h watermark — the sketch IS the windowed state, a bounded
    bucket histogram per (day, event_type) — then the emitted bucket
    table is finished by the BATCH quantile extractor
    (stats.hdr_quantiles). Append mode emits each day exactly once
    when the watermark passes its end; the trailing open day stays in
    state (same eviction cut as stream_sessions:
    window_end <= max(ts) - 2 h over the FILTERED rows — the cents>=1
    filter runs before the watermark on both engines). One data batch
    by design, as in stream_sessions. The DuckDB oracle rebuilds the
    whole thing from raw events: filter, day windows, the
    clamped/self-corrected bucket math, the eviction cut, and the
    rank rule + lower-bound estimate."""
    import shutil

    from serd_spark.operators.stats import hdr_quantiles
    from serd_spark.streaming.incremental import streaming_hdr_sketch

    base = os.path.join(
        "/tmp/serd_spark_stream_quant",
        os.path.basename(os.path.normpath(sf_dir)),
    )
    in_dir = os.path.join(base, "events")
    out_dir = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")
    shutil.rmtree(base, ignore_errors=True)
    _ensure_shipped(spark)
    _t(spark, sf_dir, "events").select(
        "event_type",
        F.col("ts").cast("timestamp").alias("ts"),
        _cents(F.col("value")).alias("value_long"),
    ).repartition(6).write.parquet(in_dir)

    ev = spark.readStream.schema(
        "event_type string, ts timestamp, value_long long"
    ).parquet(in_dir)
    sk = streaming_hdr_sketch(
        ev, "value_long", by=["event_type"], window="1 day",
        watermark="2 hours", sub_bits=4,
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={batch_id}")
        )

    q = (
        sk.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = spark.read.parquet(out_dir).select(
        F.date_format("window.start", "yyyy-MM-dd").alias("day"),
        "event_type",
        "bucket",
        "cnt",
    )
    return hdr_quantiles(
        emitted, [500, 950], by=["day", "event_type"], sub_bits=4
    )


_CM_PROBE_UIDS = ["3", "46", "999"]  # 999 absent → missing-cell path


def stream_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING per-day count-min frequency sketch driven
    end-to-end (streaming/incremental.streaming_countmin): user-id
    events flow through an availableNow stream into tumbling-day
    4×64 cell counts under a 2 h watermark — the SKETCH is the
    windowed state, depth×width cells per day no matter how many
    distinct users exist — then a BATCH pass estimates three probe
    users per emitted day (min over depth cells, absent cell = 0;
    width 64 < 150 users so collisions are real, and probe '999'
    never occurs so the missing-cell path is exercised). Append mode
    emits each day exactly once at the standard eviction cut. The
    oracle rebuilds cells, cut, probes and the min rule from raw
    events."""
    import shutil

    from serd_spark.operators.stats import _cm_col
    from serd_spark.streaming.incremental import streaming_countmin

    base = os.path.join(
        "/tmp/serd_spark_stream_cm",
        os.path.basename(os.path.normpath(sf_dir)),
    )
    in_dir = os.path.join(base, "events")
    out_dir = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")
    shutil.rmtree(base, ignore_errors=True)
    _ensure_shipped(spark)
    _t(spark, sf_dir, "events").select(
        F.col("ts").cast("timestamp").alias("ts"),
        F.col("user_id").cast("string").alias("uid"),
    ).repartition(6).write.parquet(in_dir)

    ev = spark.readStream.schema("ts timestamp, uid string").parquet(in_dir)
    sk = streaming_countmin(
        ev, "uid", window="1 day", watermark="2 hours", depth=4, width=64
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={batch_id}")
        )

    q = (
        sk.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    cells = spark.read.parquet(out_dir).select(
        F.date_format("window.start", "yyyy-MM-dd").alias("day"),
        "row",
        "col",
        "cnt",
    )
    probes = (
        cells.select("day")
        .distinct()
        .crossJoin(
            spark.createDataFrame(
                [(u,) for u in _CM_PROBE_UIDS], "uid string"
            )
        )
    )
    pairs = probes.select(
        "day",
        "uid",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        _cm_col(F.col("uid"), i, 64).alias("col"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("_rc"),
    ).select(
        "day", "uid",
        F.col("_rc.row").alias("row"), F.col("_rc.col").alias("col"),
    )
    return (
        pairs.join(cells, ["day", "row", "col"], "left")
        .groupBy("day", "uid")
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long")))
            .cast("long")
            .alias("cms_est")
        )
        .orderBy("day", "uid")
    )


def stream_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING per-day HyperLogLog distinct-user count driven
    end-to-end (streaming/incremental.streaming_hll): user-id events
    flow through an availableNow stream into tumbling-day register
    tables under a 2 h watermark — the REGISTER TABLE is the windowed
    state, at most m=64 rows per day no matter the user count, late
    data max-merging under the watermark — then a BATCH pass runs
    the hll_estimate arithmetic per emitted day (exact-integer
    harmonic denominator, one float division, linear-counting small
    branch). Append mode emits each day once at the standard
    eviction cut; the oracle rebuilds registers, cut, denominators
    and estimates from raw events."""
    import shutil

    from serd_spark.operators.stats import _shl, hll_alpha
    from serd_spark.streaming.incremental import streaming_hll

    p, m, scale = 6, 64, 55
    base = os.path.join(
        "/tmp/serd_spark_stream_hll",
        os.path.basename(os.path.normpath(sf_dir)),
    )
    in_dir = os.path.join(base, "events")
    out_dir = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")
    shutil.rmtree(base, ignore_errors=True)
    _ensure_shipped(spark)
    _t(spark, sf_dir, "events").select(
        F.col("ts").cast("timestamp").alias("ts"),
        F.col("user_id").cast("string").alias("uid"),
    ).repartition(6).write.parquet(in_dir)

    ev = spark.readStream.schema("ts timestamp, uid string").parquet(in_dir)
    regs = streaming_hll(
        ev, "uid", window="1 day", watermark="2 hours", p=p
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={batch_id}")
        )

    q = (
        regs.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    day_regs = spark.read.parquet(out_dir).select(
        F.date_format("window.start", "yyyy-MM-dd").alias("day"),
        "bucket",
        "rho",
    )
    num = hll_alpha(m) * m * m * float(1 << scale)
    staged = (
        day_regs.groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_regs"),
            F.sum(
                _shl(F.lit(1).cast("long"), F.lit(scale) - F.col("rho"))
            )
            .cast("long")
            .alias("denom_used"),
        )
        .select(
            "day",
            "n_regs",
            (F.lit(m) - F.col("n_regs")).cast("long").alias("zero_regs"),
            (
                F.col("denom_used")
                + (F.lit(m) - F.col("n_regs")) * F.lit(1 << scale)
            )
            .cast("long")
            .alias("denom"),
        )
    )
    raw = F.lit(num) / F.col("denom")
    small = (raw <= F.lit(2.5 * m)) & (F.col("zero_regs") > 0)
    linear = F.lit(float(m)) * F.log(
        F.lit(float(m)) / F.col("zero_regs")
    )
    return staged.select(
        "day",
        "n_regs",
        "zero_regs",
        "denom",
        F.round(F.when(small, linear).otherwise(raw), 0)
        .cast("long")
        .alias("hll_est"),
    ).orderBy("day")


def _fusion_claims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic multi-source claim table from lineitem: 23
    sources each asserting objects for (entity, predicate) slots —
    conflict-rich (7 possible objects per slot), pure modular
    arithmetic, identical derivation in the oracle."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_linenumber", "l_partkey"
    )
    return li.select(
        F.concat(F.lit("src"), (F.col("l_suppkey") % 23).cast("string")).alias(
            "source"
        ),
        F.concat(F.lit("e"), (F.col("l_orderkey") % 499).cast("string")).alias(
            "subj"
        ),
        F.concat(F.lit("p"), (F.col("l_linenumber") % 3).cast("string")).alias(
            "pred"
        ),
        F.concat(F.lit("o"), (F.col("l_partkey") % 7).cast("string")).alias(
            "obj"
        ),
    )


def q_fact_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truth discovery / fact fusion (operators/fusion.py): 3
    TruthFinder rounds of integer-micros trust↔confidence
    reinforcement over the 23-source claim table, then the
    max-confidence object per (subj, pred) with the min-obj
    tie-break. The oracle replays every round as chained CTEs —
    votes, GREATEST(tot,1) guard, both floor divisions — bit-exact,
    plus the same row_number winner select."""
    from serd_spark.operators.fusion import fact_fusion

    return fact_fusion(_fusion_claims(spark, sf_dir), n_iter=3)


def q_source_trust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The converged per-source reliability table from the same
    fusion rounds (operators/fusion.py::source_trust) — the
    source-quality signal a crawler feeds back into scheduling.
    Same chained-CTE replay, final trust table instead of winners."""
    from serd_spark.operators.fusion import source_trust

    return source_trust(_fusion_claims(spark, sf_dir), n_iter=3)


_OWL_INVERSE = [("ownedBy", "owns")]
_OWL_SYMMETRIC = ["adjacentTo"]
_OWL_TRANSITIVE = ["partOf"]


def _owl_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic property-graph edges from lineitem: a partOf
    forest (x → x DIV 3, depth ≈ log₃ 211 ≈ 5), an adjacentTo
    relation over 53 hubs, and an ownedBy bipartite relation —
    one scan, three modular projections, identical in the oracle."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_partkey"
    )
    part = (
        li.select((F.col("l_partkey") % 211).alias("x"))
        .where(F.col("x") > 0)
        .select(
            F.concat(F.lit("m"), F.col("x").cast("string")).alias("s"),
            F.lit("partOf").alias("p"),
            F.concat(F.lit("m"), F.expr("x DIV 3").cast("string")).alias("o"),
        )
    )
    adj = li.select(
        F.concat(F.lit("h"), (F.col("l_orderkey") % 53).cast("string")).alias(
            "s"
        ),
        F.lit("adjacentTo").alias("p"),
        F.concat(F.lit("h"), (F.col("l_suppkey") % 53).cast("string")).alias(
            "o"
        ),
    )
    own = li.select(
        F.concat(F.lit("c"), (F.col("l_orderkey") % 97).cast("string")).alias(
            "s"
        ),
        F.lit("ownedBy").alias("p"),
        F.concat(F.lit("s"), (F.col("l_suppkey") % 61).cast("string")).alias(
            "o"
        ),
    )
    return part.unionByName(adj).unionByName(own)


def q_sparql_npath(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL negated property set (plans/sparql.py §9.1): a mixed
    set — forward edges with predicate ∉ {name, relatedLink} UNION
    reversed edges with predicate ∉ {author} — compiled to NOT-IN
    filters pushed to the triple scan (no join). DISTINCT + full
    (x, y) ORDER gives a unique LIMIT cut; the oracle mirrors both
    components as NOT IN scans."""
    from serd_spark.plans.sparql import sparql_query

    _materialize_triples(spark, sf_dir)
    q = """
    PREFIX s: <http://schema.org/>
    SELECT DISTINCT ?x ?y WHERE {
      ?x !(s:name|s:relatedLink|^s:author) ?y .
    } ORDER BY ?x ?y LIMIT 600
    """
    return sparql_query(_kg_triples(spark, sf_dir), q)


def q_sparql_subselect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL subselect (plans/sparql.py): a grouped inner
    { SELECT ?x (COUNT(?l) AS ?n) … GROUP BY ?x } natural-joined to
    the outer name pattern on ?x — the aggregate-then-join shape
    (the aggregate side is group-count-sized so AQE broadcasts it).
    Outer prefixes are re-declared into the inner text. The oracle
    replays the same aggregate as a plain subquery join; the full
    (x, name) ORDER makes the LIMIT cut unique."""
    from serd_spark.plans.sparql import sparql_query

    _materialize_triples(spark, sf_dir)
    q = """
    PREFIX s: <http://schema.org/>
    SELECT ?x ?name ?n WHERE {
      ?x s:name ?name .
      { SELECT ?x (COUNT(?l) AS ?n) WHERE { ?x s:relatedLink ?l }
        GROUP BY ?x }
    } ORDER BY ?x ?name LIMIT 400
    """
    return sparql_query(_kg_triples(spark, sf_dir), q)


def q_surt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURT archive keys (corpus.py::surt_key — JVM regex/array
    built-ins only) over messy URLs synthesized deterministically
    from doc_id on BOTH engines (the q_url_canon precedent): five
    classes covering every rule — www/wwwN strip + case fold +
    query-param sorting, default-port drop, non-default port kept,
    bare host → '/' path + fragment drop, and a non-absolute input
    that must yield NULL (no fabricated archive key). The oracle
    re-synthesizes the URLs and replays each rule with DuckDB's own
    string/list functions (list_reverse / list_sort vs Spark's
    reverse / array_sort — two engines' sort and reversal under one
    hash)."""
    from serd_spark.operators.corpus import surt_key

    d = _t(spark, sf_dir, "documents").select("doc_id")
    c = F.col("doc_id")
    site = (c % 20).cast("string")
    pid = (c % 100).cast("string")
    qv = (c % 9).cast("string")
    u = (
        F.when(c % 5 == 0, F.concat(
            F.lit("https://WWW.Site"), site,
            F.lit(".Example.COM/p/"), pid,
            F.lit("?b="), qv, F.lit("&a=1")))
        .when(c % 5 == 1, F.concat(
            F.lit("http://site"), site,
            F.lit(".example.com:80/p/"), pid))
        .when(c % 5 == 2, F.concat(
            F.lit("https://site"), site,
            F.lit(".example.com:8443/P/"), pid, F.lit("#frag")))
        .when(c % 5 == 3, F.concat(
            F.lit("http://www2.files.site"), site, F.lit(".example.net")))
        .otherwise(F.concat(F.lit("relative/path/"), pid))
    )
    return d.select(
        "doc_id", u.alias("url"), surt_key(u).alias("surt")
    )


def q_cdx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDX capture index (corpus.py::cdx_index) over the crawled
    corpus: (SURT key, 14-digit timestamp)-ordered rows with payload
    md5 and octet length — the archive lookup index beside the WARC
    sink. Global order ships as range-partitioned sorted shards
    (repartitionByRange + sortWithinPartitions), never a single-task
    sort. The oracle recomputes every column from the same
    materialized (url, warc_ts, html) parquet q_warc_roundtrip uses —
    its own SURT derivation, strftime, md5 and octet_length."""
    from serd_spark.operators.corpus import cdx_index

    src = _pages(spark, sf_dir).select("url", "warc_ts", "html")
    _materialize(sf_dir, "warc_src", lambda: src)
    return cdx_index(src)


def q_redirects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redirect-chain resolution (frontier.py::resolve_redirects —
    pointer doubling, O(log max_hops) self-joins) over a synthetic
    3xx map derived from doc_id on both engines: a halving forest
    u_x → u_{x DIV 2} (chains up to ~9 hops, all terminating at u0),
    a 13-cycle c_y → c_{y+1 mod 13} (every member must come back
    'unresolved' with NULL final/hops), and conflicting-Location
    sources m_z asserting both t_z and u_z (the lexicographic min
    pin keeps t_z — terminal in one hop). The oracle is a
    structurally different formulation: a hop-at-a-time recursive
    CTE bounded at max_hops whose terminal states must land on the
    identical rows. The operator's NULL final/hops for unresolved
    rows are pinned to ''/-1 here only because the driver's row
    sorter orders tuples by the alphabetically-first column (final)
    and None is unordered against str in Python — a compare-harness
    constraint, not a semantics change (status still says
    'unresolved')."""
    from serd_spark.operators.frontier import resolve_redirects

    d = _t(spark, sf_dir, "documents").select("doc_id")
    a = d.where("doc_id % 311 > 0").selectExpr(
        "'u' || CAST(doc_id % 311 AS STRING) AS src",
        "'u' || CAST((doc_id % 311) DIV 2 AS STRING) AS dst",
    )
    b = d.selectExpr(
        "'c' || CAST(doc_id % 13 AS STRING) AS src",
        "'c' || CAST((doc_id % 13 + 1) % 13 AS STRING) AS dst",
    )
    m = d.selectExpr(
        "'m' || CAST(doc_id % 5 AS STRING) AS src",
        "CASE WHEN doc_id % 2 = 0 THEN 'u' || CAST(doc_id % 5 AS STRING)"
        "     ELSE 't' || CAST(doc_id % 5 AS STRING) END AS dst",
    )
    res = resolve_redirects(a.unionByName(b).unionByName(m), max_hops=20)
    return res.select(
        "src",
        F.coalesce("final", F.lit("")).alias("final"),
        F.coalesce("hops", F.lit(-1).cast("long")).alias("hops"),
        "status",
    )


def q_owl_entail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OWL RL property-characteristic closure (operators/rdfs.py::
    owl_property_entail): owl:inverseOf both ways (ownedBy↔owns),
    owl:SymmetricProperty (adjacentTo), owl:TransitiveProperty
    (partOf over the DIV-3 forest, closed by iterated squaring) —
    including the interplay row class (inverses OF transitively
    derived edges). Spark early-exits at the fixpoint; the oracle
    replays 6 fixed union+DISTINCT rounds (post-fixpoint rounds are
    no-ops), so both engines materialize the identical closure."""
    from serd_spark.operators.rdfs import owl_property_entail

    return owl_property_entail(
        _owl_edges(spark, sf_dir),
        inverse_of=_OWL_INVERSE,
        symmetric=_OWL_SYMMETRIC,
        transitive=_OWL_TRANSITIVE,
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # KG-construction pipeline (rows-only: non-SQL-expressible)
        "kg_extract": kg_extract,
        "kg_predicates": kg_predicates,
        "kg_roundtrip": kg_roundtrip,
        "kg_linking": kg_linking,
        "kg_linking_dist": kg_linking_dist,
        "kg_bad_docs": kg_bad_docs,
        "kg_turtle": kg_turtle,
        "kg_hub_salting": kg_hub_salting,
        "dedup_simhash": dedup_simhash,
        "dedup_minhash_lsh": dedup_minhash_lsh,
        "dedup_embedding": dedup_embedding,
        "ann_ivf": ann_ivf,
        "curate_metrics": curate_metrics,
        "curate_metrics_full": curate_metrics_full,
        "stream_extract_counts": stream_extract_counts,
        "stream_dedup_pages": stream_dedup_pages,
        "stream_near_dups": stream_near_dups,
        "kg_node_ctors": kg_node_ctors,
        "mm_features": mm_features,
        "mm_probe": mm_probe,
        "mm_frames": mm_frames,
        "mm_frame_decode": mm_frame_decode,
        "q_sniff": q_sniff,
        "q_fuzzy_join": q_fuzzy_join,
        "q_phrase": q_phrase,
        "q_setsim": q_setsim,
        "q_sssp": q_sssp,
        "q_transcode": q_transcode,
        "q_funnel": q_funnel,
        "q_skyline": q_skyline,
        "q_kg_diff": q_kg_diff,
        "q_hll_rollup": q_hll_rollup,
        "q_tables": q_tables,
        "q_bitext": q_bitext,
        "q_wet": q_wet,
        "q_readability": q_readability,
        "q_c4_filters": q_c4_filters,
        "q_length_batches": q_length_batches,
        "stream_funnel": stream_funnel,
        "q_assortativity": q_assortativity,
        "q_wat": q_wat,
        "q_sparql_update": q_sparql_update,
        "stream_upsert": stream_upsert,
        # SQL-oracled relational + training-data ops
        "q_filter_project": q_filter_project,
        "q_agg_pricing": q_agg_pricing,
        "q_join_agg": q_join_agg,
        "q_multi_join": q_multi_join,
        "q_window_toporder": q_window_toporder,
        "q_topk_orders": q_topk_orders,
        "q_set_ops": q_set_ops,
        "q_rollup": q_rollup,
        "q_events_hourly": q_events_hourly,
        "q_events_latest": q_events_latest,
        "q_sessionize": q_sessionize,
        "q_dedup_exact": q_dedup_exact,
        "q_token_stats": q_token_stats,
        "q_lang_id": q_lang_id,
        "q_quality": q_quality,
        "q_fingerprint": q_fingerprint,
        "q_repetition": q_repetition,
        "q_pii": q_pii,
        "q_ngram_jaccard": q_ngram_jaccard,
        "q_minhash_md5": q_minhash_md5,
        "q_cosine_topk": q_cosine_topk,
        "q_embedding_dups": q_embedding_dups,
        "q_knn_join": q_knn_join,
        "q_span_dedup": q_span_dedup,
        "q_span_strip": q_span_strip,
        "q_unigram_lm": q_unigram_lm,
        "q_bigram_lm": q_bigram_lm,
        "q_url_canon": q_url_canon,
        "q_winnow": q_winnow,
        "q_winnow_pairs": q_winnow_pairs,
        "q_domain_stats": q_domain_stats,
        "q_bucketed_join": q_bucketed_join,
        "q_zorder": q_zorder,
        "q_stratified_sample": q_stratified_sample,
        "q_sql_q5": q_sql_q5,
        "q_sql_q3": q_sql_q3,
        "q_crawl_delta": q_crawl_delta,
        "q_profile": q_profile,
        "stream_enrich": stream_enrich,
        "stream_join": stream_join,
        "q_upsert": q_upsert,
        "q_compact": q_compact,
        "q_boilerplate": q_boilerplate,
        "q_transitions": q_transitions,
        "q_mojibake": q_mojibake,
        "q_chunking": q_chunking,
        "q_leakage_split": q_leakage_split,
        "q_tfidf": q_tfidf,
        "q_keyword_search": q_keyword_search,
        "q_bm25": q_bm25,
        "q_decontaminate": q_decontaminate,
        "q_asof_join": q_asof_join,
        "q_pagerank": q_pagerank,
        "q_trustrank": q_trustrank,
        "q_anf": q_anf,
        "q_triangles": q_triangles,
        "q_pca": q_pca,
        "q_kcore": q_kcore,
        "q_label_prop": q_label_prop,
        "q_bfs_hops": q_bfs_hops,
        "q_walks": q_walks,
        "q_link_predict": q_link_predict,
        "q_kmeans": q_kmeans,
        "q_semdedup": q_semdedup,
        "q_pq_search": q_pq_search,
        "q_sq8": q_sq8,
        "q_dedup_incremental": q_dedup_incremental,
        "q_line_dedup": q_line_dedup,
        "q_host_graph": q_host_graph,
        "q_scc": q_scc,
        "q_anchor_text": q_anchor_text,
        "q_nfc": q_nfc,
        "q_rdfxml": q_rdfxml,
        "q_shacl": q_shacl,
        "q_host_rank": q_host_rank,
        "q_hits": q_hits,
        "q_domain_cap": q_domain_cap,
        "q_range_join": q_range_join,
        "q_quantiles": q_quantiles,
        "q_distinct_sketch": q_distinct_sketch,
        "q_hll": q_hll,
        "q_mix": q_mix,
        "q_bpe_train": q_bpe_train,
        "q_bpe_tokenize": q_bpe_tokenize,
        "q_pack_sequences": q_pack_sequences,
        "q_session_window": q_session_window,
        "stream_sessions": stream_sessions,
        "q_dsir": q_dsir,
        "q_sketch_quantiles": q_sketch_quantiles,
        "q_wminhash": q_wminhash,
        "q_bloom_decon": q_bloom_decon,
        "q_countmin": q_countmin,
        "q_rrf_fusion": q_rrf_fusion,
        "q_shard": q_shard,
        "q_nb_quality": q_nb_quality,
        "q_gazetteer": q_gazetteer,
        "q_collocations": q_collocations,
        "q_sem_decon": q_sem_decon,
        "q_ccnet": q_ccnet,
        "q_dup_clusters": q_dup_clusters,
        "q_mm_dhash": q_mm_dhash,
        "q_mm_vp8": q_mm_vp8,
        "q_mm_audio": q_mm_audio,
        "q_mm_exif": q_mm_exif,
        "q_pdf_text": q_pdf_text,
        "q_heavy_hitters": q_heavy_hitters,
        "q_pair_mining": q_pair_mining,
        "q_crawl": q_crawl,
        "q_rare_mask": q_rare_mask,
        "q_blocklist": q_blocklist,
        "q_entropy": q_entropy,
        "q_kg_twohop": q_kg_twohop,
        "q_kg_negatives": q_kg_negatives,
        "q_rdfs_entail": q_rdfs_entail,
        "q_sparql": q_sparql,
        "q_sparql_opt": q_sparql_opt,
        "q_sparql_path": q_sparql_path,
        "q_sparql_star": q_sparql_star,
        "q_sparql_agg": q_sparql_agg,
        "q_sparql_having": q_sparql_having,
        "q_sparql_exists": q_sparql_exists,
        "q_sparql_construct": q_sparql_construct,
        "q_sameas": q_sameas,
        "q_robots": q_robots,
        "q_sparql_filter": q_sparql_filter,
        "q_sparql_minus": q_sparql_minus,
        "q_sparql_bind": q_sparql_bind,
        "q_sparql_describe": q_sparql_describe,
        "q_skolem": q_skolem,
        "q_c14n": q_c14n,
        "q_void": q_void,
        "q_frontier": q_frontier,
        "q_sitemap": q_sitemap,
        "q_feeds": q_feeds,
        "q_apportion": q_apportion,
        "q_url_templates": q_url_templates,
        "q_priority_sample": q_priority_sample,
        "q_rollup_cascade": q_rollup_cascade,
        "q_snippets": q_snippets,
        "q_page_directives": q_page_directives,
        "q_graphs": q_graphs,
        "q_warc_roundtrip": q_warc_roundtrip,
        "q_json_props": q_json_props,
        "stream_countmin": stream_countmin,
        "stream_hll": stream_hll,
        "stream_quantiles": stream_quantiles,
        "q_fact_fusion": q_fact_fusion,
        "q_source_trust": q_source_trust,
        "q_owl_entail": q_owl_entail,
        "q_sparql_npath": q_sparql_npath,
        "q_sparql_subselect": q_sparql_subselect,
        "q_surt": q_surt,
        "q_cdx": q_cdx,
        "q_redirects": q_redirects,
    }


def _lang_case_sql() -> str:
    def n(lang: str) -> str:
        pat = "(?i)\\b(" + "|".join(LANGS[lang]) + ")\\b"
        return f"len(regexp_extract_all(text, '{pat}'))"

    en, fr, es, de = n("en"), n("fr"), n("es"), n("de")
    return f"""
        CASE
          WHEN {en} > 0 AND {en} >= {fr} AND {en} >= {es} AND {en} >= {de} THEN 'en'
          WHEN {fr} > {en} AND {fr} >= {es} AND {fr} >= {de} THEN 'fr'
          WHEN {es} > {en} AND {es} > {fr} AND {es} >= {de} THEN 'es'
          WHEN {de} > {en} AND {de} > {fr} AND {de} > {es} THEN 'de'
          ELSE 'und'
        END
    """


_TRADE_DIR_EDGES_SQL = """
          SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey"""


def _hll_rollup_oracle_sql() -> str:
    """Replays q_hll_rollup: hourly registers, register-max merge,
    and the direct sketch — the q_hll estimate arithmetic applied
    once per grain (p=8 → wbits=52, scale=53, m=256)."""

    def est(regs: str, grain: str) -> str:
        return f"""
              SELECT {grain} AS grain, CAST(256 AS BIGINT) AS m,
                     CAST(COUNT(*) AS BIGINT) AS n_regs,
                     CAST(256 - COUNT(*) AS BIGINT) AS zero_regs,
                     CAST(SUM(1::BIGINT << CAST(53 - rho AS INTEGER))
                          + (256 - COUNT(*)) * (1::BIGINT << 53)
                          AS BIGINT) AS denom
              FROM {regs} {'GROUP BY grain' if 'hour' in grain else ''}"""

    finish = """
              SELECT grain, m, n_regs, zero_regs, denom,
                     CAST(round(CASE
                       WHEN ((0.7213 / (1.0 + 1.079 / 256.0)) * 256.0
                             * 256.0 * 9007199254740992.0 / denom)
                            <= 640.0 AND zero_regs > 0
                       THEN 256.0 * ln(256.0 / zero_regs)
                       ELSE (0.7213 / (1.0 + 1.079 / 256.0)) * 256.0
                            * 256.0 * 9007199254740992.0 / denom
                       END, 0) AS BIGINT) AS hll_est"""
    return f"""
            WITH e AS (
              SELECT strftime(ts, '%Y-%m-%d %H') AS hour,
                     CAST(user_id AS VARCHAR) || '|' || event_type AS v
              FROM events
            ), h AS (
              SELECT hour,
                     CAST('0x' || substr(md5(v), 1, 15) AS BIGINT) AS h
              FROM e
            ), hr AS (
              SELECT hour, h >> 52 AS bucket,
                     MAX(CASE WHEN (h & ((1::BIGINT << 52) - 1)) = 0
                              THEN 53
                              ELSE 53 - length(bin(
                                h & ((1::BIGINT << 52) - 1)))
                         END) AS rho
              FROM h GROUP BY hour, bucket
            ), mr AS (
              SELECT bucket, MAX(rho) AS rho FROM hr GROUP BY bucket
            ), s AS (
              {est('hr', 'hour')}
              UNION ALL
              {est('mr', "'zz:merged'")}
              UNION ALL
              {est('mr', "'zz:direct'")}
            )
            {finish} FROM s ORDER BY grain
        """


def _pagerank_oracle_sql(
    n_iter: int = 5,
    damping_pct: int = 85,
    dir_edges_sql: str = _TRADE_DIR_EDGES_SQL,
    undirected: bool = True,
) -> str:
    """Replays operators/graph.py's integer-micros PageRank as chained
    CTEs — one per iteration, identical floor-division arithmetic, so
    the match is bit-exact (integer sums are order-independent).
    ``dir_edges_sql`` supplies the (src, dst) edge derivation;
    ``undirected`` mirrors the operator's flag (mirrored edges vs
    directed-with-sink-nodes)."""
    if undirected:
        edges_nodes = """
        ), edges AS (
          SELECT src, dst FROM dir_edges
          UNION
          SELECT dst AS src, src AS dst FROM dir_edges
        ), deg AS (
          SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY src
        ), nodes AS (
          SELECT DISTINCT src AS node FROM edges"""
    else:
        edges_nodes = """
        ), edges AS (
          SELECT DISTINCT src, dst FROM dir_edges
        ), deg AS (
          SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY src
        ), nodes AS (
          SELECT src AS node FROM edges
          UNION
          SELECT dst AS node FROM edges"""
    head = f"""
        WITH dir_edges AS ({dir_edges_sql}{edges_nodes}
        ), params AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST((1000000 * {100 - damping_pct}) // (100 * COUNT(*))
                      AS BIGINT) AS base,
                 CAST(1000000 // COUNT(*) AS BIGINT) AS r0
          FROM nodes
        ), r0 AS (
          SELECT node, (SELECT r0 FROM params) AS rank_micros FROM nodes
        )"""
    iters = []
    for i in range(1, n_iter + 1):
        iters.append(f""", r{i} AS (
          SELECT nd.node,
                 CAST((SELECT base FROM params)
                      + ({damping_pct} * COALESCE(infl.s, 0)) // 100
                      AS BIGINT) AS rank_micros
          FROM nodes nd LEFT JOIN (
            SELECT e.dst AS node,
                   CAST(SUM(r.rank_micros // d.deg) AS BIGINT) AS s
            FROM r{i - 1} r
            JOIN edges e ON e.src = r.node
            JOIN deg d ON d.src = e.src
            GROUP BY e.dst
          ) infl ON infl.node = nd.node
        )""")
    return head + "".join(iters) + f"\n        SELECT node, rank_micros FROM r{n_iter}"


def _ppr_oracle_sql(
    n_iter: int,
    seed_where: str,
    dir_edges_sql: str,
    damping_pct: int = 85,
) -> str:
    """Replays operators/graph.py's personalized_pagerank as chained
    CTEs — directed edges, seeds = nodes matching ``seed_where``,
    seeded base/init terms, identical floor-division arithmetic —
    bit-exact (integer sums are order-independent)."""
    head = f"""
        WITH dir_edges AS ({dir_edges_sql}
        ), edges AS (
          SELECT DISTINCT src, dst FROM dir_edges
          WHERE src IS NOT NULL AND dst IS NOT NULL
        ), deg AS (
          SELECT src, CAST(COUNT(*) AS BIGINT) AS deg
          FROM edges GROUP BY src
        ), nodes AS (
          SELECT src AS node FROM edges
          UNION
          SELECT dst AS node FROM edges
        ), seeds AS (
          SELECT node FROM nodes WHERE {seed_where}
        ), params AS (
          SELECT CAST((1000000 * {100 - damping_pct})
                      // (100 * COUNT(*)) AS BIGINT) AS base,
                 CAST(1000000 // COUNT(*) AS BIGINT) AS r0
          FROM seeds
        ), r0 AS (
          SELECT n.node,
                 CASE WHEN s.node IS NOT NULL
                      THEN (SELECT r0 FROM params)
                      ELSE CAST(0 AS BIGINT) END AS rank_micros
          FROM nodes n LEFT JOIN seeds s ON s.node = n.node
        )"""
    iters = []
    for i in range(1, n_iter + 1):
        iters.append(f""", r{i} AS (
          SELECT nd.node,
                 CAST(CASE WHEN sd.node IS NOT NULL
                           THEN (SELECT base FROM params)
                           ELSE 0 END
                      + ({damping_pct} * COALESCE(infl.s, 0)) // 100
                      AS BIGINT) AS rank_micros
          FROM nodes nd
          LEFT JOIN seeds sd ON sd.node = nd.node
          LEFT JOIN (
            SELECT e.dst AS node,
                   CAST(SUM(r.rank_micros // d.deg) AS BIGINT) AS s
            FROM r{i - 1} r
            JOIN edges e ON e.src = r.node
            JOIN deg d ON d.src = e.src
            GROUP BY e.dst
          ) infl ON infl.node = nd.node
        )""")
    return (
        head + "".join(iters)
        + f"\n        SELECT node, rank_micros FROM r{n_iter}"
    )


def _anf_oracle_sql(n_rounds: int, dir_edges_sql: str) -> str:
    """Replays operators/graph.py's neighborhood_function (undirected
    form) as chained CTEs: md5→bucket/rho register init, one
    max-merge register CTE per round, per-node exact-integer
    denominators, and the shared _anf_est_expr() estimate text —
    bit-exact."""
    from serd_spark.operators.graph import _anf_est_expr

    head = f"""
        WITH dir_edges AS ({dir_edges_sql}
        ), edges AS (
          SELECT DISTINCT src, dst FROM (
            SELECT src, dst FROM dir_edges
            UNION ALL
            SELECT dst AS src, src AS dst FROM dir_edges
          ) m
          WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst
        ), nodes AS (
          SELECT DISTINCT src AS node FROM edges
        ), hh AS (
          SELECT node,
                 CAST('0x' || substr(md5(CAST(node AS VARCHAR)), 1, 15)
                      AS BIGINT) AS h
          FROM nodes
        ), r0 AS (
          SELECT node, h >> 56 AS bucket,
                 CASE WHEN (h & ((1::BIGINT << 56) - 1)) = 0 THEN 57
                      ELSE 57 - length(bin(h & ((1::BIGINT << 56) - 1)))
                 END AS rho
          FROM hh
        )"""
    parts = []
    for t in range(1, n_rounds + 1):
        parts.append(f""", r{t} AS (
          SELECT node, bucket, MAX(rho) AS rho FROM (
            SELECT node, bucket, rho FROM r{t - 1}
            UNION ALL
            SELECT e.src AS node, r.bucket, r.rho
            FROM r{t - 1} r JOIN edges e ON e.dst = r.node
          ) u GROUP BY node, bucket
        )""")
    for t in range(n_rounds + 1):
        parts.append(f""", est{t} AS (
          SELECT CAST({t} AS INT) AS t,
                 CAST(COUNT(*) AS BIGINT) AS n_nodes,
                 CAST(COALESCE(SUM({_anf_est_expr()}), 0) AS BIGINT)
                   AS pairs_est
          FROM (
            SELECT node, CAST(COUNT(*) AS BIGINT) AS n_regs,
                   CAST(SUM(1::BIGINT << CAST(57 - rho AS INTEGER))
                        + (16 - COUNT(*)) * (1::BIGINT << 57)
                        AS BIGINT) AS denom
            FROM r{t} GROUP BY node
          ) d
        )""")
    union = "\n          UNION ALL ".join(
        f"SELECT * FROM est{t}" for t in range(n_rounds + 1)
    )
    return head + "".join(parts) + f"\n        {union}"


def _hits_oracle_sql(n_iter: int, dir_edges_sql: str) -> str:
    """Replays operators/graph.py's integer-micros HITS as chained
    CTEs — per iteration: authority inflow sum, quantized-L1 divisor
    ``greatest(1, sum div 1e6)``, floor-divided normalize, then the
    same for hubs. Integer arithmetic throughout, so the match is
    bit-exact."""
    head = f"""
        WITH dir_edges AS ({dir_edges_sql}
        ), edges AS (
          SELECT DISTINCT src, dst FROM dir_edges
          WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst
        ), nodes AS (
          SELECT src AS node FROM edges
          UNION
          SELECT dst AS node FROM edges
        ), h0 AS (
          SELECT node, CAST(1000000 AS BIGINT) AS hub FROM nodes
        )"""
    iters = []
    for i in range(1, n_iter + 1):
        iters.append(f""", a{i}_raw AS (
          SELECT e.dst AS node, CAST(SUM(h.hub) AS BIGINT) AS raw
          FROM h{i - 1} h JOIN edges e ON e.src = h.node
          GROUP BY e.dst
        ), a{i}_div AS (
          SELECT greatest(1, CAST(COALESCE(SUM(raw), 0) // 1000000
                               AS BIGINT)) AS d
          FROM a{i}_raw
        ), a{i} AS (
          SELECT nd.node,
                 CAST(COALESCE(r.raw, 0) // (SELECT d FROM a{i}_div)
                      AS BIGINT) AS auth
          FROM nodes nd LEFT JOIN a{i}_raw r ON r.node = nd.node
        ), h{i}_raw AS (
          SELECT e.src AS node, CAST(SUM(a.auth) AS BIGINT) AS raw
          FROM a{i} a JOIN edges e ON e.dst = a.node
          GROUP BY e.src
        ), h{i}_div AS (
          SELECT greatest(1, CAST(COALESCE(SUM(raw), 0) // 1000000
                               AS BIGINT)) AS d
          FROM h{i}_raw
        ), h{i} AS (
          SELECT nd.node,
                 CAST(COALESCE(r.raw, 0) // (SELECT d FROM h{i}_div)
                      AS BIGINT) AS hub
          FROM nodes nd LEFT JOIN h{i}_raw r ON r.node = nd.node
        )""")
    tail = f"""
        SELECT h.node, h.hub AS hub_micros, a.auth AS auth_micros
        FROM h{n_iter} h JOIN a{n_iter} a USING (node)"""
    return head + "".join(iters) + tail


# Directed host→host link edges re-derived from raw page bytes —
# shared by the q_host_rank (PageRank) and q_hits (HITS) oracles so
# both replay the identical edge extraction.
_HOST_DIR_EDGES_SQL = f"""
          SELECT src_host AS src, dst_host AS dst FROM (
            SELECT a.src_host,
                   lower(regexp_extract(a.href,
                     '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)', 1))
                     AS dst_host
            FROM (
              SELECT lower(regexp_extract(url,
                       '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)', 1))
                       AS src_host,
                     unnest(regexp_extract_all(decode(html),
                       'href="([^"]*)"', 1)) AS href
              FROM read_parquet('{ORACLE_DIR}/sf0.01/pages_meta/*.parquet')
            ) a
          ) WHERE src_host <> '' AND dst_host <> ''"""


_TRADE_EDGES_SQL = """
        WITH und AS (
          SELECT DISTINCT
                 least(o_custkey % 9973, l_suppkey % 9973) AS a,
                 greatest(o_custkey % 9973, l_suppkey % 9973) AS b
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey
          WHERE o_custkey % 9973 <> l_suppkey % 9973
        ), e0 AS (
          SELECT a, b FROM und UNION ALL SELECT b AS a, a AS b FROM und
        )"""


def _kmeans_oracle_sql(n_iter: int, k: int, dim: int = 64) -> str:
    """Replays operators/clustering.py's exact Lloyd iterations as
    chained CTEs: per round, the (dist ASC, cid ASC) argmin assignment
    window and the truncating-division centroid update (DuckDB // ==
    the operator's sign*(abs//n)), with empty clusters carried via
    COALESCE. Quantization floor(v * 2^20) is exact in double on both
    engines — no rounding mode in play."""
    head = f"""
        WITH base AS (SELECT vec_id, embedding FROM embeddings),
        vm AS (
          SELECT vec_id, i - 1 AS d,
                 CAST(floor(embedding[i]::DOUBLE * 1048576) AS BIGINT) AS v
          FROM (SELECT vec_id, embedding,
                       unnest(generate_series(1, {dim})) AS i FROM base)
        ), seeds AS (
          SELECT vec_id FROM base
          ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {k}
        ), seedc AS (
          SELECT vec_id, row_number() OVER (
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cid
          FROM seeds
        ), c0 AS (
          SELECT s.cid, vm.d, vm.v AS cv FROM seedc s JOIN vm USING (vec_id)
        )"""
    its = []
    for i in range(1, n_iter + 1):
        its.append(f""", a{i} AS (
          SELECT vec_id, cid FROM (
            SELECT vm.vec_id, c.cid,
                   row_number() OVER (PARTITION BY vm.vec_id
                     ORDER BY SUM((vm.v - c.cv) * (vm.v - c.cv)) ASC,
                              c.cid ASC) AS rn
            FROM vm JOIN c{i - 1} c ON c.d = vm.d
            GROUP BY vm.vec_id, c.cid
          ) WHERE rn = 1
        ), c{i} AS (
          SELECT p.cid, p.d, COALESCE(m.mv, p.cv) AS cv
          FROM c{i - 1} p LEFT JOIN (
            SELECT a.cid, vm.d,
                   CAST(SUM(vm.v) // COUNT(*) AS BIGINT) AS mv
            FROM a{i} a JOIN vm USING (vec_id)
            GROUP BY a.cid, vm.d
          ) m ON m.cid = p.cid AND m.d = p.d
        )""")
    tail = f"""
        SELECT vec_id, CAST(cid AS INTEGER) AS cluster, dist FROM (
          SELECT vm.vec_id, c.cid,
                 CAST(SUM((vm.v - c.cv) * (vm.v - c.cv)) AS BIGINT) AS dist,
                 row_number() OVER (PARTITION BY vm.vec_id
                   ORDER BY SUM((vm.v - c.cv) * (vm.v - c.cv)) ASC,
                            c.cid ASC) AS rn
          FROM vm JOIN c{n_iter} c ON c.d = vm.d
          GROUP BY vm.vec_id, c.cid
        ) WHERE rn = 1"""
    return head + "".join(its) + tail


def _pq_oracle_sql(
    n_iter: int, k: int, m: int = 8, dim: int = 64, top_k: int = 10
) -> str:
    """Replays the WHOLE product-quantization pipeline from raw
    parquet: all m codebook trainings share one CTE chain (the
    assignment window partitions by (vec, sub) and the update groups
    by (sub, cid, d) — each dimension belongs to exactly one
    subspace, so one join drives all subspaces at once), then the
    encoding pass and the ADC search. DuckDB's // truncation matches
    the operator's sign*(abs//n) update exactly."""
    dsub = dim // m
    head = f"""
        WITH base AS (SELECT vec_id, embedding FROM embeddings),
        vm AS (
          SELECT vec_id, i - 1 AS d,
                 CAST(floor(embedding[i]::DOUBLE * 1048576) AS BIGINT) AS v
          FROM (SELECT vec_id, embedding,
                       unnest(generate_series(1, {dim})) AS i FROM base)
        ), seedc AS (
          SELECT vec_id, row_number() OVER (
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cid
          FROM (SELECT vec_id FROM base
                ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {k})
        ), c0 AS (
          SELECT s.cid, vm.d // {dsub} AS sub, vm.d, vm.v AS cv
          FROM seedc s JOIN vm USING (vec_id)
        )"""
    its = []
    for i in range(1, n_iter + 1):
        its.append(f""", a{i} AS (
          SELECT vec_id, sub, cid FROM (
            SELECT vm.vec_id, c.sub, c.cid,
                   row_number() OVER (PARTITION BY vm.vec_id, c.sub
                     ORDER BY SUM((vm.v - c.cv) * (vm.v - c.cv)) ASC,
                              c.cid ASC) AS rn
            FROM vm JOIN c{i - 1} c ON c.d = vm.d
            GROUP BY vm.vec_id, c.sub, c.cid
          ) WHERE rn = 1
        ), c{i} AS (
          SELECT p.sub, p.cid, p.d, COALESCE(m.mv, p.cv) AS cv
          FROM c{i - 1} p LEFT JOIN (
            SELECT a.sub, a.cid, vm.d,
                   CAST(SUM(vm.v) // COUNT(*) AS BIGINT) AS mv
            FROM a{i} a JOIN vm ON vm.vec_id = a.vec_id
                               AND vm.d // {dsub} = a.sub
            GROUP BY a.sub, a.cid, vm.d
          ) m ON m.sub = p.sub AND m.cid = p.cid AND m.d = p.d
        )""")
    tail = f""", codes AS (
          SELECT vec_id, sub, cid FROM (
            SELECT vm.vec_id, c.sub, c.cid,
                   row_number() OVER (PARTITION BY vm.vec_id, c.sub
                     ORDER BY SUM((vm.v - c.cv) * (vm.v - c.cv)) ASC,
                              c.cid ASC) AS rn
            FROM vm JOIN c{n_iter} c ON c.d = vm.d
            GROUP BY vm.vec_id, c.sub, c.cid
          ) WHERE rn = 1
        ), qsub AS (
          SELECT d, v FROM vm WHERE vec_id = 0
        ), adct AS (
          SELECT c.sub, c.cid,
                 CAST(SUM((c.cv - q.v) * (c.cv - q.v)) AS BIGINT) AS dist
          FROM c{n_iter} c JOIN qsub q ON q.d = c.d
          GROUP BY c.sub, c.cid
        )
        SELECT e.vec_id, CAST(SUM(t.dist) AS BIGINT) AS adc
        FROM codes e JOIN adct t ON t.sub = e.sub AND t.cid = e.cid
        GROUP BY e.vec_id
        ORDER BY adc ASC, vec_id ASC LIMIT {top_k}"""
    return head + "".join(its) + tail


def _pca_oracle_sql(n_iter: int = 8, dim: int = 64) -> str:
    """Replays operators/pca.py end-to-end: quantization, truncating
    integer means, the centered covariance cells, the covariance
    rescale, every power-iteration matvec + rescale round (DuckDB //
    is the operator's tdiv), and the final projections."""
    q = 1 << 20
    head = f"""
        WITH base AS (SELECT vec_id, embedding FROM embeddings),
        vm AS (
          SELECT vec_id, i - 1 AS d,
                 CAST(floor(embedding[i]::DOUBLE * {q}) AS BIGINT) AS v
          FROM (SELECT vec_id, embedding,
                       unnest(generate_series(1, {dim})) AS i FROM base)
        ), mn AS (
          SELECT d, CAST(SUM(v) AS BIGINT) // CAST(COUNT(*) AS BIGINT)
                   AS m
          FROM vm GROUP BY d
        ), c AS MATERIALIZED (
          SELECT vec_id, vm.d, v - m AS c FROM vm JOIN mn USING (d)
        ), cells AS MATERIALIZED (
          SELECT a.d AS i, b.d AS j,
                 CAST(SUM(a.c * b.c) AS BIGINT) AS s
          FROM c a JOIN c b USING (vec_id) GROUP BY 1, 2
        ), cdiv AS (
          SELECT greatest(1, greatest(1, MAX(abs(s))) // {q}) AS d0
          FROM cells
        ), cn AS MATERIALIZED (
          SELECT i, j, s // (SELECT d0 FROM cdiv) AS s FROM cells
        ), w0 AS (
          SELECT unnest(generate_series(0, {dim - 1})) AS d,
                 CAST({q} AS BIGINT) AS x
        )"""
    its = []
    for t in range(1, n_iter + 1):
        its.append(f""", u{t} AS MATERIALIZED (
          SELECT cn.i AS d, CAST(SUM(cn.s * w.x) AS BIGINT) AS u
          FROM cn JOIN w{t - 1} w ON cn.j = w.d GROUP BY 1
        ), ud{t} AS (
          SELECT greatest(1, greatest(1, MAX(abs(u))) // {q}) AS du
          FROM u{t}
        ), w{t} AS MATERIALIZED (
          SELECT d, u // (SELECT du FROM ud{t}) AS x FROM u{t}
        )""")
    tail = f"""
        SELECT c.vec_id, CAST(SUM(c.c * w.x) AS BIGINT) AS proj
        FROM c JOIN w{n_iter} w ON c.d = w.d
        GROUP BY 1 ORDER BY vec_id"""
    return head + "".join(its) + tail


def _kcore_oracle_sql(k: int, n_rounds: int) -> str:
    """Replays operators/graph.py's fixed-round synchronous peel as
    chained CTEs — one (keep-set, filtered-edges) pair per round over
    the identically derived mirrored trade graph."""
    parts = [_TRADE_EDGES_SQL]
    for r in range(1, n_rounds + 1):
        parts.append(f""", k{r} AS (
          SELECT a FROM e{r - 1} GROUP BY a HAVING COUNT(*) >= {k}
        ), e{r} AS (
          SELECT e.a, e.b FROM e{r - 1} e
          JOIN k{r} x ON e.a = x.a
          JOIN k{r} y ON e.b = y.a
        )""")
    parts.append(f"""
        SELECT a AS node, CAST(COUNT(*) AS BIGINT) AS deg
        FROM e{n_rounds} GROUP BY a""")
    return "".join(parts)


def _lpa_oracle_sql(n_iter: int) -> str:
    """Replays the synchronous label-propagation iterations: per
    round, neighbor-label counts and the (count DESC, label ASC)
    argmax window, identical to operators/graph.py."""
    parts = [_TRADE_EDGES_SQL, """, l0 AS (
          SELECT DISTINCT a AS node, a AS label FROM e0
        )"""]
    for i in range(1, n_iter + 1):
        parts.append(f""", l{i} AS (
          SELECT node, label FROM (
            SELECT e.b AS node, l.label, COUNT(*) AS cnt,
                   row_number() OVER (
                     PARTITION BY e.b
                     ORDER BY COUNT(*) DESC, l.label ASC
                   ) AS rn
            FROM e0 e JOIN l{i - 1} l ON l.node = e.a
            GROUP BY e.b, l.label
          ) WHERE rn = 1
        )""")
    parts.append(f"\n        SELECT node, label FROM l{n_iter}")
    return "".join(parts)


# Mirrored trade adjacency for the BFS oracle — DIRECTED edges
# mirrored then deduped, self-loops kept (bfs_distance keeps them;
# they are no-ops under the settled anti-join on both engines).
_TRADE_MIRROR_EDGES_SQL = """
        WITH dir AS (
          SELECT o_custkey % 9973 AS src, l_suppkey % 9973 AS dst
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        ), e0 AS (
          SELECT DISTINCT src AS a, dst AS b FROM (
            SELECT src, dst FROM dir
            UNION ALL SELECT dst AS src, src AS dst FROM dir
          )
        )"""


def _bfs_oracle_sql(n_rounds: int) -> str:
    """Replays graph.py::bfs_distance's frontier-only rounds as
    chained CTEs: per round, the distinct neighbor expansion of the
    previous frontier anti-joined against the settled set — identical
    to the Spark loop, so a wrong frontier in any round diverges."""
    parts = [_TRADE_MIRROR_EDGES_SQL, """, seeds AS (
          SELECT DISTINCT a AS node FROM e0 WHERE a % 997 = 0
        ), d0 AS (
          SELECT node, 0 AS dist FROM seeds
        ), f0 AS (SELECT node FROM seeds)"""]
    for r in range(1, n_rounds + 1):
        parts.append(f""", f{r} AS (
          SELECT DISTINCT e.b AS node
          FROM e0 e JOIN f{r - 1} f ON e.a = f.node
          WHERE NOT EXISTS (
            SELECT 1 FROM d{r - 1} d WHERE d.node = e.b)
        ), d{r} AS (
          SELECT node, dist FROM d{r - 1}
          UNION ALL SELECT node, {r} AS dist FROM f{r}
        )""")
    parts.append(f"""
        SELECT node, CAST(dist AS INT) AS dist
        FROM d{n_rounds} ORDER BY node""")
    return "".join(parts)


def _walks_oracle_sql(walk_len: int, walks_per_node: int) -> str:
    """Replays graph.py::random_walks step by step: the same
    (src, dst-ascending) row_number adjacency index, and per step the
    md5(start '#' w '#' t) % deg + 1 neighbor pick — any divergence
    in adjacency order, degree, or hash arithmetic desynchronizes the
    rest of the walk."""
    head = f"""
        WITH dir AS (
          SELECT o_custkey % 9973 AS src, l_suppkey % 9973 AS dst
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        ), und AS (
          SELECT DISTINCT src, dst FROM (
            SELECT src, dst FROM dir WHERE src <> dst
            UNION ALL SELECT dst AS src, src AS dst FROM dir
            WHERE src <> dst
          )
        ), adj AS (
          SELECT src, dst,
                 row_number() OVER (PARTITION BY src ORDER BY dst)
                   AS idx
          FROM und
        ), deg AS (
          SELECT src, MAX(idx) AS deg FROM adj GROUP BY src
        ), starts AS (
          SELECT DISTINCT src AS start FROM adj
        ), s0 AS (
          SELECT start, jj.j AS w, start AS cur
          FROM starts, LATERAL (
            SELECT unnest(range(0, {walks_per_node})) AS j) jj
        )"""
    steps = []
    for t in range(1, walk_len + 1):
        steps.append(f""", s{t} AS (
          SELECT p.start, p.w, a.dst AS cur
          FROM (
            SELECT s.start, s.w, s.cur,
                   CAST('0x' || substr(md5(
                     CAST(s.start AS VARCHAR) || '#' ||
                     CAST(s.w AS VARCHAR) || '#' || '{t}'), 1, 8)
                     AS BIGINT) % d.deg + 1 AS pick
            FROM s{t - 1} s JOIN deg d ON d.src = s.cur
          ) p JOIN adj a ON a.src = p.cur AND a.idx = p.pick
        )""")
    union = "\n          UNION ALL ".join(
        f"SELECT start, w, {t} AS step, cur AS node FROM s{t}"
        for t in range(walk_len + 1)
    )
    tail = f"""
        SELECT start, CAST(w AS INT) AS w, CAST(step AS INT) AS step,
               node
        FROM ({union})
        ORDER BY start, w, step"""
    return head + "".join(steps) + tail


def _link_predict_oracle_sql(
    max_center_deg: int, min_cn: int, top_k: int
) -> str:
    """Replays graph.py::link_predict: full-graph degrees, the
    deg-capped wedge self-join, integer-micros Adamic–Adar terms
    (1e12 div round(ln(deg) * 1e6) — pinned parenthesization), the
    existing-edge anti-join and the explicit total order."""
    return f"""
        WITH dir AS (
          SELECT o_custkey % 9973 AS src, l_suppkey % 9973 AS dst
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        ), und AS (
          SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
          FROM dir WHERE src <> dst
        ), m AS (
          SELECT a AS u, b AS v FROM und
          UNION ALL SELECT b AS u, a AS v FROM und
        ), deg AS (
          SELECT u, COUNT(*) AS deg FROM m GROUP BY u
        ), centers AS (
          SELECT u, CAST(1000000000000 //
                   CAST(round(ln(deg) * 1000000) AS BIGINT)
                   AS BIGINT) AS aa_term
          FROM deg WHERE deg <= {max_center_deg} AND deg >= 2
        ), mm AS (
          SELECT m.u, m.v, c.aa_term FROM m JOIN centers c USING (u)
        ), pairs AS (
          SELECT x.v AS a, y.v AS b,
                 CAST(COUNT(*) AS BIGINT) AS cn,
                 CAST(SUM(x.aa_term) AS BIGINT) AS aa_micros
          FROM mm x JOIN mm y ON x.u = y.u
          WHERE x.v < y.v
          GROUP BY x.v, y.v
        )
        SELECT p.a, p.b, p.cn, p.aa_micros
        FROM pairs p LEFT JOIN und e ON p.a = e.a AND p.b = e.b
        WHERE e.a IS NULL AND p.cn >= {min_cn}
        ORDER BY p.cn DESC, p.aa_micros DESC, p.a, p.b
        LIMIT {top_k}"""


def _rdfs_oracle_sql(n_rounds: int = 4) -> str:
    """Replays operators/rdfs.py end-to-end: the doubling subclass-
    closure rounds over the literal axioms, the domain/range/type
    rule scans, the one distinct, and the asserted flag — any rule or
    closure divergence shows as a row or flag mismatch."""
    from serd_spark.operators.rdfs import RDF_TYPE

    def values(rows):
        return ", ".join(f"('{a}', '{b}')" for a, b in rows)

    parts = [f"""
        WITH ax(sub, sup) AS (VALUES {values(_SCHEMA_SUBCLASS)}),
        dom(pred, cls) AS (VALUES {values(_SCHEMA_DOMAINS)}),
        rng(pred, cls) AS (VALUES {values(_SCHEMA_RANGES)}),
        c0 AS (SELECT DISTINCT sub, sup FROM ax WHERE sub <> sup)"""]
    for r in range(1, n_rounds + 1):
        parts.append(f""", c{r} AS (
          SELECT DISTINCT sub, sup FROM (
            SELECT sub, sup FROM c{r - 1}
            UNION ALL
            SELECT a.sub, b.sup FROM c{r - 1} a JOIN c{r - 1} b
            ON a.sup = b.sub WHERE a.sub <> b.sup
          )
        )""")
    parts.append(f""", t AS (
          SELECT s, p, o
          FROM read_parquet('{ORACLE_DIR}/sf0.01/triples/*.parquet')
        ), asserted AS (
          SELECT DISTINCT s AS node, o AS cls FROM t
          WHERE p = '{RDF_TYPE}'
        ), base AS (
          SELECT s AS node, o AS cls FROM t WHERE p = '{RDF_TYPE}'
          UNION ALL
          SELECT t.s AS node, d.cls FROM t JOIN dom d ON t.p = d.pred
          UNION ALL
          SELECT t.o AS node, r.cls FROM t JOIN rng r ON t.p = r.pred
        ), allt AS (
          SELECT DISTINCT node, cls FROM (
            SELECT node, cls FROM base
            UNION ALL
            SELECT b.node, c.sup AS cls
            FROM base b JOIN c{n_rounds} c ON b.cls = c.sub
          )
        )
        SELECT a.node, a.cls,
               CAST(CASE WHEN x.node IS NOT NULL THEN 1 ELSE 0 END
                    AS INT) AS asserted
        FROM allt a
        LEFT JOIN asserted x ON a.node = x.node AND a.cls = x.cls
        ORDER BY a.node, a.cls""")
    return "".join(parts)


def _bpe_oracle_sql(n_merges: int) -> str:
    """Replays every BPE training iteration independently: for each
    rank i, DuckDB recomputes the weighted adjacent-pair counts over
    the materialized symbolization table w{i} (the state BEFORE merge
    i) and takes the argmax under the same total tie-break
    (count DESC, left ASC, right ASC). A wrong fold, count, or pick on
    the Spark side desynchronizes every later iteration."""
    parts = []
    for i in range(n_merges):
        parts.append(f"""
            SELECT CAST({i} AS INTEGER) AS rank, l AS merge_left,
                   r AS merge_right, cnt AS pair_count
            FROM (
              SELECT syms[i] AS l, syms[i + 1] AS r,
                     CAST(SUM(freq) AS BIGINT) AS cnt
              FROM (
                SELECT freq, syms,
                       unnest(generate_series(1, len(syms) - 1)) AS i
                FROM read_parquet('{ORACLE_DIR}/sf0.01/bpe/w{i}/*.parquet')
              )
              GROUP BY 1, 2
              ORDER BY cnt DESC, l ASC, r ASC
              LIMIT 1
            )""")
        # the per-iteration LIMIT must bind inside each branch, so each
        # SELECT wraps its own ordered subquery before the UNION ALL
    return " UNION ALL ".join(parts)


_FUSION_CLAIMS_SQL = """
          SELECT DISTINCT
                 'src' || CAST(l_suppkey % 23 AS VARCHAR) AS src,
                 'e' || CAST(l_orderkey % 499 AS VARCHAR) AS subj,
                 'p' || CAST(l_linenumber % 3 AS VARCHAR) AS pred,
                 'o' || CAST(l_partkey % 7 AS VARCHAR) AS obj
          FROM lineitem"""


def _fusion_oracle_sql(n_iter: int, final: str) -> str:
    """Replays operators/fusion.py round by round as chained CTEs —
    votes from the previous trust table, the GREATEST(tot, 1) guard,
    both floor divisions (// mirrors Spark DIV on non-negative
    BIGINTs) — bit-exact. ``final`` picks the winner select
    (fact_fusion) or the converged trust table (source_trust)."""
    head = f"""
        WITH raw AS ({_FUSION_CLAIMS_SQL}
        ), src_n AS (
          SELECT src, CAST(COUNT(*) AS BIGINT) AS n_claims
          FROM raw GROUP BY src
        ), t0 AS (
          SELECT src, CAST(500000 AS BIGINT) AS trust FROM src_n
        )"""
    rounds = []
    for i in range(1, n_iter + 1):
        rounds.append(f""", v{i} AS (
          SELECT subj, pred, obj, CAST(SUM(t.trust) AS BIGINT) AS vote
          FROM raw c JOIN t{i - 1} t USING (src)
          GROUP BY subj, pred, obj
        ), g{i} AS (
          SELECT subj, pred,
                 GREATEST(CAST(SUM(vote) AS BIGINT), 1) AS tot
          FROM v{i} GROUP BY subj, pred
        ), c{i} AS (
          SELECT v.subj, v.pred, v.obj,
                 CAST((v.vote * 1000000) // g.tot AS BIGINT) AS conf
          FROM v{i} v JOIN g{i} g USING (subj, pred)
        ), t{i} AS (
          SELECT c.src,
                 CAST(CAST(SUM(k.conf) AS BIGINT) // n.n_claims
                      AS BIGINT) AS trust
          FROM raw c
          JOIN c{i} k USING (subj, pred, obj)
          JOIN src_n n USING (src)
          GROUP BY c.src, n.n_claims
        )""")
    if final == "trust":
        tail = f"""
        SELECT src, trust AS trust_micros FROM t{n_iter}"""
    else:
        tail = f""", n_src AS (
          SELECT subj, pred, obj, CAST(COUNT(*) AS BIGINT) AS n_src
          FROM raw GROUP BY subj, pred, obj
        ), ranked AS (
          SELECT c.subj, c.pred, c.obj, c.conf AS conf_micros, n.n_src,
                 row_number() OVER (
                   PARTITION BY c.subj, c.pred
                   ORDER BY c.conf DESC, c.obj ASC
                 ) AS rn
          FROM c{n_iter} c JOIN n_src n USING (subj, pred, obj)
        )
        SELECT subj, pred, obj, conf_micros, n_src
        FROM ranked WHERE rn = 1"""
    return head + "".join(rounds) + tail


_OWL_EDGES_SQL = """
          SELECT 'm' || CAST(x AS VARCHAR) AS s, 'partOf' AS p,
                 'm' || CAST(x // 3 AS VARCHAR) AS o
          FROM (SELECT l_partkey % 211 AS x FROM lineitem) WHERE x > 0
          UNION ALL
          SELECT 'h' || CAST(l_orderkey % 53 AS VARCHAR), 'adjacentTo',
                 'h' || CAST(l_suppkey % 53 AS VARCHAR)
          FROM lineitem
          UNION ALL
          SELECT 'c' || CAST(l_orderkey % 97 AS VARCHAR), 'ownedBy',
                 's' || CAST(l_suppkey % 61 AS VARCHAR)
          FROM lineitem"""


def _owl_oracle_sql(n_rounds: int) -> str:
    """Replays operators/rdfs.py::owl_property_entail as ``n_rounds``
    fixed union+DISTINCT rounds (inverse map join, symmetric swap,
    transitive self-join — iterated squaring, so round k covers
    partOf paths up to 2^k). Spark early-exits at its fixpoint;
    rounds past the fixpoint are no-ops, so a fixed count ≥ the
    convergence round matches bit-for-bit."""
    head = f"""
        WITH base AS ({_OWL_EDGES_SQL}
        ), invmap AS (
          SELECT * FROM (VALUES ('ownedBy', 'owns'), ('owns', 'ownedBy'))
            m(p, q)
        ), r0 AS MATERIALIZED (
          SELECT DISTINCT s, p, o FROM base
        )"""
    rounds = []
    for i in range(1, n_rounds + 1):
        # MATERIALIZED: each round references the previous one 4×
        # (identity, inverse, symmetric, transitive self-join) — an
        # inlined CTE chain re-evaluates 4^n times and exhausts file
        # handles on the parquet scan; materializing makes the oracle
        # replay linear in rounds, like Spark's localCheckpoint.
        rounds.append(f""", r{i} AS MATERIALIZED (
          SELECT DISTINCT s, p, o FROM (
            SELECT s, p, o FROM r{i - 1}
            UNION ALL
            SELECT t.o AS s, m.q AS p, t.s AS o
            FROM r{i - 1} t JOIN invmap m ON t.p = m.p
            UNION ALL
            SELECT o AS s, p, s AS o FROM r{i - 1}
            WHERE p IN ('adjacentTo')
            UNION ALL
            SELECT a.s, a.p, b.o
            FROM r{i - 1} a JOIN r{i - 1} b
              ON a.p = b.p AND a.o = b.s
            WHERE a.p IN ('partOf')
          )
        )""")
    tail = f"""
        SELECT c.s, c.p, c.o,
               CAST(CASE WHEN b.s IS NOT NULL THEN 1 ELSE 0 END AS INT)
                 AS asserted
        FROM r{n_rounds} c
        LEFT JOIN r0 b ON b.s = c.s AND b.p = c.p AND b.o = c.o"""
    return head + "".join(rounds) + tail


def oracle_sql() -> dict[str, str]:
    from serd_spark.operators.corpus import _rate_hex

    # Mirrors that read ORACLE_DIR parquet depend on their Spark query
    # having run first in this process (each query fn materializes its
    # own oracle inputs before returning its DataFrame). Any driver
    # that evaluates the Spark side before the SQL side — per query or
    # in bulk — satisfies this; tools/check_oracles.py replicates it.
    grams_cte = """
        WITH norm AS (
          SELECT doc_id,
                 lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t
          FROM documents
        ), expanded AS (
          SELECT doc_id, t, unnest(generate_series(1, length(t) - 2)) AS i
          FROM norm WHERE length(t) >= 3
        ), grams AS (
          -- mirror Spark char_ngrams: a doc shorter than n yields the
          -- whole (possibly empty) string as its single gram
          SELECT doc_id, list(DISTINCT substring(t, i::INT, 3)) AS gr
          FROM expanded GROUP BY doc_id
          UNION ALL
          SELECT doc_id, [t] AS gr FROM norm WHERE length(t) < 3
        )
    """
    return {
        "kg_extract": f"""
            SELECT syntax, rec, COUNT(*) AS n
            FROM read_parquet('{ORACLE_DIR}/sf0.01/extract/*.parquet')
            GROUP BY syntax, rec
            ORDER BY syntax NULLS FIRST, rec NULLS FIRST
        """,
        "kg_bad_docs": f"""
            SELECT syntax, COUNT(*) AS n_errors,
                   COUNT(DISTINCT url) AS n_docs
            FROM read_parquet('{ORACLE_DIR}/sf0.01/extract/*.parquet')
            WHERE rec = 'e'
            GROUP BY syntax ORDER BY syntax
        """,
        "kg_predicates": f"""
            SELECT p, COUNT(*) AS n_triples,
                   COUNT(DISTINCT s) AS n_subjects
            FROM read_parquet('{ORACLE_DIR}/sf0.01/triples/*.parquet')
            GROUP BY p
            ORDER BY n_triples DESC, p
            LIMIT 20
        """,
        # Negative sampling: nodes, md5 buckets, min representatives,
        # global-min fallback and self flags replayed wholesale.
        "q_kg_negatives": f"""
            WITH e AS (
              SELECT DISTINCT s AS src, o AS dst
              FROM read_parquet('{ORACLE_DIR}/sf0.01/triples/*.parquet')
              WHERE p = 'http://schema.org/relatedLink'
            ), nodes AS (
              SELECT src AS n FROM e UNION SELECT dst FROM e
            ), reps AS (
              SELECT CAST('0x' || substr(md5(n), 1, 8) AS BIGINT) % 32
                       AS b,
                     MIN(n) AS rep
              FROM nodes GROUP BY 1
            ), gmin AS (
              SELECT MIN(n) AS gmin FROM nodes
            ), tagged AS (
              SELECT src, dst, jj.j
              FROM e, LATERAL (SELECT unnest(range(0, 2)) AS j) jj
            )
            SELECT t.src, t.dst, CAST(t.j AS INT) AS j,
                   COALESCE(r.rep, g.gmin) AS neg_dst,
                   CAST(CASE WHEN COALESCE(r.rep, g.gmin) = t.dst
                             THEN 1 ELSE 0 END AS INT) AS is_self
            FROM tagged t
            LEFT JOIN reps r
              ON r.b = CAST('0x' || substr(md5(t.src || '|' || t.dst ||
                   '#' || CAST(t.j AS VARCHAR)), 1, 8) AS BIGINT) % 32
            CROSS JOIN gmin g
        """,
        "q_rdfs_entail": _rdfs_oracle_sql(n_rounds=4),
        # Mini-SPARQL: the compiled BGP replayed as a hand-written
        # relational join over the materialized triples.
        "q_sparql": f"""
            WITH t AS (
              SELECT s, p, o
              FROM read_parquet('{ORACLE_DIR}/sf0.01/triples/*.parquet')
            )
            SELECT n.s AS page, n.o AS name, a.o AS author,
                   v.o AS rating
            FROM t n
            JOIN t r ON r.s = n.s
            JOIN t a ON a.s = r.o
            JOIN t v ON v.s = n.s
            WHERE n.p = 'http://schema.org/name'
              AND r.p = 'http://schema.org/review'
              AND a.p = 'http://schema.org/author'
              AND v.p = 'http://schema.org/ratingValue'
            ORDER BY page LIMIT 300
        """,
        # SPARQL compound patterns: UNION ALL (bag) + LEFT JOIN
        # (OPTIONAL) + DISTINCT, replayed relationally.
        "q_sparql_opt": f"""
            WITH t AS (
              SELECT s, p, o
              FROM read_parquet('{ORACLE_DIR}/sf0.01/triples/*.parquet')
            ),
            u AS (
              SELECT s AS page, o AS link FROM t
              WHERE p = 'http://schema.org/relatedLink'
              UNION ALL
              SELECT s AS page, o AS link FROM t
              WHERE p = 'http://schema.org/review'
            )
            SELECT DISTINCT u.page AS page, u.link AS link,
                   v.o AS rating
            FROM u
            JOIN t n ON n.s = u.page
                    AND n.p = 'http://schema.org/name'
            LEFT JOIN t v ON v.s = u.page
                         AND v.p = 'http://schema.org/ratingValue'
            ORDER BY page, link LIMIT 500
        """,
        # Property paths: closure as a recursive CTE (UNION =
        # distinct pairs = SPARQL OneOrMorePath), sequence as a join.
        "q_sparql_path": f"""
            WITH RECURSIVE t AS (
              SELECT s, p, o
              FROM read_parquet('{ORACLE_DIR}/sf0.01/triples/*.parquet')
            ),
            e AS (
              SELECT s, o FROM t
              WHERE p = 'http://schema.org/relatedLink'
            ),
            c AS (
              SELECT s AS x, o AS y FROM e
              UNION
              SELECT c.x, e.o FROM c JOIN e ON c.y = e.s
            ),
            ra AS (
              SELECT r.s AS x, a.o AS auth
              FROM t r JOIN t a ON a.s = r.o
                   AND a.p = 'http://schema.org/author'
              WHERE r.p = 'http://schema.org/review'
            )
            SELECT c.x AS x, c.y AS y,
                   COALESCE(ra.auth, '') AS auth
            FROM c LEFT JOIN ra ON ra.x = c.x
            ORDER BY x, y LIMIT 600
        """,
        # SPARQL ZeroOrMorePath: recursive-CTE closure UNION the
        # identity over subjects∪objects, restricted to review
        # subjects — zero-length-path semantics certified against an
        # independent recursive evaluation.
        "q_sparql_star": f"""
            WITH RECURSIVE t AS (
              SELECT s, p, o
              FROM read_parquet('{ORACLE_DIR}/sf0.01/triples/*.parquet')
            ),
            e AS (
              SELECT s, o FROM t
              WHERE p = 'http://schema.org/relatedLink'
            ),
            c AS (
              SELECT s AS x, o AS y FROM e
              UNION
              SELECT c.x, e.o FROM c JOIN e ON c.y = e.s
            ),
            nodes AS (
              -- explicit DISTINCT: inside a WITH RECURSIVE block
              -- DuckDB gives plain UNION CTEs append semantics
              SELECT DISTINCT n FROM (
                SELECT s AS n FROM t UNION ALL SELECT o AS n FROM t
              )
            ),
            cz AS (
              SELECT DISTINCT x, y FROM (
                SELECT x, y FROM c
                UNION ALL
                SELECT n, n FROM nodes
              )
            ),
            rev AS (
              SELECT DISTINCT s FROM t
              WHERE p = 'http://schema.org/review'
            )
            SELECT cz.x AS x, cz.y AS y
            FROM cz JOIN rev ON rev.s = cz.x
            ORDER BY x, y LIMIT 600
        """,
        # SPARQL aggregates: the compiled groupBy().agg() replayed as
        # a plain DuckDB aggregate (COUNT is BIGINT on both sides;
        # MIN/MAX on strings memcmp UTF-8 bytes on both engines).
        "q_sparql_agg": f"""
            WITH t AS (
              SELECT s, p, o
              FROM read_parquet('{ORACLE_DIR}/sf0.01/triples/*.parquet')
            )
            SELECT p, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(COUNT(DISTINCT s) AS BIGINT) AS n_subj,
                   MIN(o) AS lo, MAX(o) AS hi
            FROM t GROUP BY p ORDER BY p
        """,
        # SPARQL HAVING + arithmetic aggregates: the micros
        # quantization floor(try_cast(v)*1e6), the exact integer SUM
        # (CAST AS BIGINT guards DuckDB's HUGEINT promotion), the
        # floor-divided mean, and the ORDER BY-pinned string_agg all
        # replayed; one final /1e6 division of identical integers
        # makes the doubles bit-equal across engines.
        "q_sparql_having": f"""
            WITH t AS (
              SELECT s, p, o
              FROM read_parquet('{ORACLE_DIR}/sf0.01/triples/*.parquet')
            ), r AS (
              SELECT a.o AS auth, v.o AS lex,
                     CAST(floor(try_cast(v.o AS DOUBLE) * 1000000)
                          AS BIGINT) AS q
              FROM t rv
              JOIN t a ON a.s = rv.o
                   AND a.p = 'http://schema.org/author'
              JOIN t v ON v.s = rv.s
                   AND v.p = 'http://schema.org/ratingValue'
              WHERE rv.p = 'http://schema.org/review'
            ), g AS (
              SELECT auth,
                     CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(q) AS BIGINT) AS sq,
                     CAST(COUNT(q) AS BIGINT) AS cq,
                     string_agg(lex, '|' ORDER BY lex) AS vals
              FROM r GROUP BY auth
            )
            SELECT auth, n,
                   sq / 1000000.0 AS total,
                   CAST(floor(sq / cq) AS BIGINT) / 1000000.0 AS mean,
                   vals
            FROM g WHERE n >= 2 ORDER BY auth
        """,
        # SPARQL FILTER EXISTS / NOT EXISTS: DuckDB's correlated
        # EXISTS subqueries — a different semi/anti formulation that
        # must pick the identical rows.
        "q_sparql_exists": f"""
            WITH t AS (
              SELECT s, p, o
              FROM read_parquet('{ORACLE_DIR}/sf0.01/triples/*.parquet')
            )
            SELECT n.s AS subj, n.o AS name
            FROM t n
            WHERE n.p = 'http://schema.org/name'
              AND EXISTS (
                SELECT 1 FROM t l
                WHERE l.s = n.s
                  AND l.p = 'http://schema.org/relatedLink'
              )
              AND NOT EXISTS (
                SELECT 1 FROM t r
                WHERE r.s = n.s AND r.p = 'http://schema.org/review'
              )
            ORDER BY subj, name
        """,
        # SPARQL CONSTRUCT: template instantiation replayed as two
        # projections UNION'd with set semantics (an RDF graph is a
        # set of triples).
        "q_sparql_construct": f"""
            WITH t AS (
              SELECT s, p, o
              FROM read_parquet('{ORACLE_DIR}/sf0.01/triples/*.parquet')
            ),
            ra AS (
              SELECT r.s AS page, a.o AS auth
              FROM t r JOIN t a ON a.s = r.o
                   AND a.p = 'http://schema.org/author'
              WHERE r.p = 'http://schema.org/review'
            )
            SELECT DISTINCT s, p, o FROM (
              SELECT page AS s,
                     'http://ex.org/kg/hasAuthor' AS p,
                     auth AS o
              FROM ra
              UNION ALL
              SELECT auth AS s,
                     'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
                       AS p,
                     'http://ex.org/kg/Author' AS o
              FROM ra
            )
        """,
        # owl:sameAs canonicalization: perturbation (md5-prefix alias
        # chains), component closure (recursive-CTE min label — the
        # kg_linking idiom) and the kind-guarded rewrite all replayed
        # independently; restoring the original graph is the operator
        # contract, certified by counts + the md5-derived content pin.
        "q_sameas": f"""
            WITH RECURSIVE t AS (
              SELECT * FROM
                read_parquet('{ORACLE_DIR}/sf0.01/triples/*.parquet')
            ), d AS (
              SELECT g,
                CASE WHEN s_kind = 0 AND substr(md5(s),1,4) < '2aaa'
                       THEN s || '#sa2'
                     WHEN s_kind = 0 AND substr(md5(s),1,4) < '5555'
                       THEN s || '#sa1'
                     ELSE s END AS s,
                s_kind, p,
                CASE WHEN o_kind = 0 AND substr(md5(o),1,4) < '2aaa'
                       THEN o || '#sa2'
                     WHEN o_kind = 0 AND substr(md5(o),1,4) < '5555'
                       THEN o || '#sa1'
                     ELSE o END AS o,
                o_kind, o_dt, o_lang
              FROM t
            ), nodes AS (
              SELECT DISTINCT x FROM (
                SELECT s AS x FROM t WHERE s_kind = 0
                UNION
                SELECT o AS x FROM t WHERE o_kind = 0
              ) WHERE substr(md5(x),1,4) < '5555'
            ), sa AS (
              SELECT x || '#sa1' AS a, x AS b FROM nodes
              UNION ALL
              SELECT x || '#sa2' AS a, x || '#sa1' AS b FROM nodes
              WHERE substr(md5(x),1,4) < '2aaa'
            ), edges AS (
              SELECT a, b FROM sa UNION SELECT b, a FROM sa
            ), reach(entity, r) AS (
              SELECT DISTINCT a, a FROM edges
              UNION
              SELECT e.a, reach.r FROM edges e
              JOIN reach ON reach.entity = e.b
            ), labels AS (
              SELECT entity, MIN(r) AS canon FROM reach GROUP BY entity
            ), rew AS (
              SELECT DISTINCT d.g,
                CASE WHEN d.s_kind = 0 THEN COALESCE(ls.canon, d.s)
                     ELSE d.s END AS s,
                d.s_kind, d.p,
                CASE WHEN d.o_kind = 0 THEN COALESCE(lo.canon, d.o)
                     ELSE d.o END AS o,
                d.o_kind, d.o_dt, d.o_lang
              FROM d
              LEFT JOIN labels ls ON ls.entity = d.s
              LEFT JOIN labels lo ON lo.entity = d.o
            )
            SELECT p, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(COUNT(DISTINCT s) AS BIGINT) AS n_subj,
                   CAST(SUM(CAST('0x' || substr(md5(s || chr(1) || p || chr(1) || o), 1, 10)
                                 AS BIGINT)) AS BIGINT) AS pin
            FROM rew GROUP BY p ORDER BY p
        """,
        # Named-graph semantics: the quad aggregate replayed over the
        # materialized triples (g participates in the content pin).
        "q_graphs": f"""
            SELECT (g <> '') AS is_named,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(COUNT(DISTINCT g) AS BIGINT) AS n_graphs,
                   CAST(COUNT(DISTINCT s) AS BIGINT) AS n_subj,
                   CAST(SUM(CAST('0x' || substr(md5(
                     g || chr(1) || s || chr(1) || p || chr(1) || o),
                     1, 10) AS BIGINT)) AS BIGINT) AS pin
            FROM read_parquet('{ORACLE_DIR}/sf0.01/triples/*.parquet')
            GROUP BY 1 ORDER BY 1
        """,
        # Recrawl scheduler: fetch synthesis, the integer interval
        # estimator, and BOTH window passes (slot, then the
        # running-max queue decomposition) replayed from the
        # materialized fetch log.
        "q_frontier": f"""
            WITH raw AS (
              SELECT url, CAST(epoch(warc_ts) AS BIGINT) AS ts0
              FROM read_parquet('{ORACLE_DIR}/sf0.01/pages_crawl/*.parquet')
            ), ex AS (
              SELECT url, ts0 + 3600 * k AS ts
              FROM raw, LATERAL (
                SELECT unnest(generate_series(0,
                  CAST('0x' || substr(md5(url), 3, 2) AS BIGINT) % 4))
                  AS k) s
            ), f AS (
              SELECT url,
                regexp_extract(url,
                  '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1) AS host,
                ts,
                CASE WHEN substr(md5(url), 1, 2) < '55'
                     THEN substr(md5(url || CAST(ts AS VARCHAR)), 1, 4)
                     ELSE 'v0' END AS version
              FROM ex
            ), pu AS (
              SELECT host, url,
                     CAST(COUNT(*) AS BIGINT) AS n_fetches,
                     CAST(COUNT(DISTINCT version) AS BIGINT)
                       AS n_versions,
                     MAX(ts) AS last_ts
              FROM f GROUP BY host, url
            ), iv AS (
              SELECT host, url, n_fetches, n_versions,
                CAST(CASE WHEN n_fetches = 1 THEN 86400
                     ELSE least(172800, greatest(86400,
                          CAST(86400 AS BIGINT) * (n_fetches - 1)
                          // greatest(1, n_versions - 1)))
                END AS BIGINT) AS interval_s,
                last_ts
              FROM pu
            ), due AS (
              SELECT *, last_ts + interval_s AS next_due FROM iv
            ), q1 AS (
              SELECT *, CAST(ROW_NUMBER() OVER (
                  PARTITION BY host ORDER BY next_due, url)
                - 1 AS BIGINT) AS slot
              FROM due
            ), q2 AS (
              SELECT *, MAX(next_due - 5 * slot) OVER (
                  PARTITION BY host ORDER BY next_due, url
                  ROWS UNBOUNDED PRECEDING) AS mx
              FROM q1
            )
            SELECT host, url, n_fetches, n_versions, interval_s,
                   next_due, slot, 5 * slot + mx AS sched_ts
            FROM q2
            WHERE substr(md5(host), 1, 2) < '40'
            ORDER BY host, slot
        """,
        # Sitemap ingestion: XML synthesis (string_agg ORDER BY ==
        # sort_array), block regexes, field extraction and the entity
        # replace chain all replayed in DuckDB/RE2.
        "q_sitemap": f"""
            WITH u AS (
              SELECT DISTINCT url FROM
                read_parquet('{ORACLE_DIR}/sf0.01/pages_meta/*.parquet')
            ), e AS (
              SELECT regexp_extract(url,
                       '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1) AS host,
                     CAST(CAST('0x' || substr(md5(url), 5, 2) AS BIGINT)
                          % 10 AS VARCHAR) AS d,
                     url
              FROM u
            ), entry AS (
              SELECT host,
                '  <url>' || chr(10) || '    <loc>' ||
                replace(url || '?ref=sitemap&id=' || d, '&', '&amp;')
                || '</loc>' || chr(10) || '    <lastmod>2026-01-1'
                || d || '</lastmod>' || chr(10) ||
                CASE WHEN d < '5'
                     THEN '    <priority>0.' || d || '</priority>'
                          || chr(10)
                     ELSE '' END ||
                '  </url>' AS entry
              FROM e
            ), xs AS (
              SELECT 'https://' || host || '/sitemap.xml'
                       AS sitemap_url,
                '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
                || chr(10) || string_agg(entry, chr(10) ORDER BY entry)
                || chr(10) || '</urlset>' AS xml
              FROM entry GROUP BY host
            ), xi AS (
              SELECT 'https://' || host || '/sitemap_index.xml'
                       AS sitemap_url,
                '<sitemapindex>' || chr(10) || '  <sitemap>' || chr(10)
                || '    <loc>https://' || host || '/sitemap.xml</loc>'
                || chr(10) || '    <lastmod>2026-02-01</lastmod>'
                || chr(10) || '  </sitemap>' || chr(10)
                || '</sitemapindex>' AS xml
              FROM (SELECT DISTINCT host FROM e)
              WHERE substr(md5(host), 1, 2) < '40'
            ), blocks AS (
              SELECT 'url' AS kind, b
              FROM xs, LATERAL (SELECT unnest(regexp_extract_all(
                xml, '(?s)<url\\b[^>]*>(.*?)</url>', 1)) AS b) s
              UNION ALL
              SELECT 'sitemap' AS kind, b
              FROM xi, LATERAL (SELECT unnest(regexp_extract_all(
                xml, '(?s)<sitemap\\b[^>]*>(.*?)</sitemap>', 1)) AS b) s
            ), fields AS (
              SELECT kind,
                NULLIF(regexp_extract(b,
                  '(?s)<loc\\b[^>]*>\\s*(.*?)\\s*</loc>', 1), '')
                  AS loc0,
                NULLIF(regexp_extract(b,
                  '(?s)<lastmod\\b[^>]*>\\s*(.*?)\\s*</lastmod>', 1), '')
                  AS lastmod,
                NULLIF(regexp_extract(b,
                  '(?s)<priority\\b[^>]*>\\s*(.*?)\\s*</priority>', 1),
                  '') AS priority
              FROM blocks
            ), fin AS (
              SELECT kind,
                replace(replace(replace(replace(replace(loc0,
                  '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                  '&apos;', ''''), '&amp;', '&') AS loc,
                lastmod, priority
              FROM fields WHERE loc0 IS NOT NULL
            )
            SELECT kind, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(COUNT(DISTINCT loc) AS BIGINT) AS n_locs,
                   CAST(COUNT(lastmod) AS BIGINT) AS n_lastmod,
                   CAST(COUNT(priority) AS BIGINT) AS n_priority,
                   CAST(SUM(CAST('0x' || substr(md5(loc), 1, 10)
                                 AS BIGINT)) AS BIGINT) AS pin
            FROM fin GROUP BY kind ORDER BY kind
        """,
        # The cascade replayed as chained CTEs: daily FROM hourly,
        # weekly FROM daily — never from raw twice.
        "q_rollup_cascade": """
            WITH h AS (
              SELECT date_trunc('hour', ts) AS b, event_type,
                     CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(CAST(round(value * 100) AS BIGINT))
                          AS BIGINT) AS v
              FROM events GROUP BY 1, 2
            ), d AS (
              SELECT date_trunc('day', b) AS b, event_type,
                     CAST(SUM(n) AS BIGINT) AS n,
                     CAST(SUM(v) AS BIGINT) AS v
              FROM h GROUP BY 1, 2
            ), wk AS (
              SELECT date_trunc('week', b) AS b, event_type,
                     CAST(SUM(n) AS BIGINT) AS n,
                     CAST(SUM(v) AS BIGINT) AS v
              FROM d GROUP BY 1, 2
            ), unioned AS (
              SELECT 'hour' AS grain, b, event_type, n, v FROM h
              UNION ALL
              SELECT 'day', b, event_type, n, v FROM d
              UNION ALL
              SELECT 'week', b, event_type, n, v FROM wk
            )
            SELECT grain,
                   strftime(b, '%Y-%m-%d %H:%M:%S') AS bucket_start,
                   event_type,
                   n AS n_events,
                   v AS value
            FROM unioned ORDER BY grain, bucket_start, event_type
        """,
        # Priority arithmetic + per-stratum rank replayed with
        # DuckDB's own window.
        "q_priority_sample": """
            WITH d AS (
              SELECT doc_id, lang,
                     CAST(length(text) + 1 AS BIGINT) AS w
              FROM documents
            ), p AS (
              SELECT doc_id, lang, w,
                     CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                          1, 15) AS BIGINT) // w AS prio
              FROM d WHERE w > 0
            ), r AS (
              SELECT *, ROW_NUMBER() OVER (
                PARTITION BY lang ORDER BY prio, doc_id) AS rn
              FROM p
            )
            SELECT lang, doc_id, w FROM r WHERE rn <= 5
            ORDER BY lang, doc_id
        """,
        # Variants regenerated and the segment classifier replayed
        # with DuckDB's own list_transform + regexp_matches — same
        # anchored Java∩RE2 patterns, same sorted query names.
        "q_url_templates": f"""
            WITH u AS (
              SELECT DISTINCT url FROM read_parquet(
                '{ORACLE_DIR}/sf0.01/pages_meta/*.parquet')
            ), allu AS (
              SELECT url FROM u
              UNION ALL
              SELECT url || '/blob/' || substr(md5(url), 1, 12) FROM u
              UNION ALL
              SELECT url || '/u/' || substr(md5(url), 1, 8) || '-'
                     || substr(md5(url), 9, 4) || '-'
                     || substr(md5(url), 13, 4) || '-'
                     || substr(md5(url), 17, 4) || '-'
                     || substr(md5(url), 21, 12) FROM u
              UNION ALL
              SELECT url || '?session=' || substr(md5(url), 1, 6)
                     || '&ref=x' FROM u
            ), parts AS (
              SELECT url,
                regexp_extract(url,
                  '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)', 1) AS host,
                regexp_extract(url,
                  '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1)
                  AS path,
                regexp_extract(url, '\\?([^#]*)', 1) AS q
              FROM allu
            ), tpl AS (
              SELECT url, host,
                array_to_string(list_transform(
                  string_split(path, '/'),
                  s -> CASE
                    WHEN regexp_matches(s,
                      '(?i)^[0-9a-f]{{8}}-[0-9a-f]{{4}}-[0-9a-f]{{4}}-[0-9a-f]{{4}}-[0-9a-f]{{12}}$')
                      THEN '{{uuid}}'
                    WHEN regexp_matches(s, '^[0-9]+$') THEN '{{n}}'
                    WHEN regexp_matches(s, '(?i)^[0-9a-f]{{8,}}$')
                         AND regexp_matches(s, '(?i)[a-f]')
                         AND regexp_matches(s, '[0-9]')
                      THEN '{{hex}}'
                    ELSE s END), '/') AS tpath,
                array_to_string(list_sort(regexp_extract_all(
                  q, '(?:^|&)([^&=]+)=', 1)), '&') AS qnames
              FROM parts
            ), named AS (
              SELECT host || tpath ||
                     CASE WHEN qnames <> '' THEN '?' || qnames
                          ELSE '' END AS template,
                     url
              FROM tpl WHERE host <> ''
            )
            SELECT template,
                   CAST(COUNT(*) AS BIGINT) AS n_urls,
                   CAST(COUNT(DISTINCT url) AS BIGINT) AS n_distinct,
                   MIN(url) AS example
            FROM named GROUP BY template ORDER BY template
        """,
        # Declared-formula ground truth: flags and counts recomputed
        # from the md5 classes without parsing a byte of HTML.
        "q_page_directives": f"""
            WITH u AS (
              SELECT DISTINCT url FROM read_parquet(
                '{ORACLE_DIR}/sf0.01/pages_meta/*.parquet')
            ), c AS (
              SELECT CAST('0x' || substr(md5(url), 3, 2) AS BIGINT) % 4
                       AS d2,
                     CAST('0x' || substr(md5(url), 7, 2) AS BIGINT) % 3
                       AS nlinks
              FROM u
            ), f AS (
              SELECT d2 IN (0, 2) AS noindex,
                     d2 IN (1, 2) AS nofollow,
                     nlinks
              FROM c
            )
            SELECT noindex, nofollow,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(nlinks) AS BIGINT) AS n_links
            FROM f GROUP BY noindex, nofollow
            ORDER BY noindex, nofollow
        """,
        # Hamilton largest-remainder replayed with a PLAIN global
        # ROW_NUMBER over (rem DESC, host) — vs the operator's
        # two-level blocked rank; same +1 recipients required.
        "q_apportion": f"""
            WITH w AS (
              SELECT regexp_extract(url,
                       '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1) AS host,
                     CAST(COUNT(DISTINCT url) AS BIGINT) AS w
              FROM read_parquet(
                '{ORACLE_DIR}/sf0.01/pages_meta/*.parquet')
              GROUP BY host
            ), t AS (
              SELECT CAST(SUM(w) AS BIGINT) AS wtot FROM w
            ), j AS (
              SELECT host, w,
                     (997 * w) // wtot AS base,
                     (997 * w) % wtot AS rem
              FROM w CROSS JOIN t
            ), r AS (
              SELECT 997 - CAST(SUM(base) AS BIGINT) AS extras FROM j
            ), ranked AS (
              SELECT host, w, base,
                     ROW_NUMBER() OVER (ORDER BY rem DESC, host ASC)
                       AS rk
              FROM j
            )
            SELECT host, w,
                   CAST(base + CASE WHEN rk <= (SELECT extras FROM r)
                                    THEN 1 ELSE 0 END AS BIGINT)
                     AS alloc
            FROM ranked ORDER BY host
        """,
        # Identical XML rebuilt in SQL, re-extracted with the same
        # block/field regexes and entity replace chain (q_sitemap
        # discipline for the feed channel).
        "q_feeds": f"""
            WITH u AS (
              SELECT DISTINCT url FROM
                read_parquet('{ORACLE_DIR}/sf0.01/pages_meta/*.parquet')
            ), e AS (
              SELECT regexp_extract(url,
                       '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1) AS host,
                     CAST(CAST('0x' || substr(md5(url), 5, 2) AS BIGINT)
                          % 10 AS VARCHAR) AS d,
                     url
              FROM u
            ), marked AS (
              SELECT host, substr(md5(host), 1, 2) < '80' AS is_rss,
                     d, url,
                     replace(url || '?ref=feed&id=' || d, '&', '&amp;')
                       AS esc
              FROM e
            ), entry AS (
              SELECT host, is_rss,
                CASE WHEN is_rss THEN
                  '  <item>' || chr(10) || '    <title>Page ' || d
                  || '</title>' || chr(10) || '    <link>' || esc
                  || '</link>' || chr(10) || '    <guid>' || url
                  || '</guid>' || chr(10) ||
                  CASE WHEN d < '5'
                       THEN '    <pubDate>Mon, 0' || d
                            || ' Jan 2026</pubDate>' || chr(10)
                       ELSE '' END ||
                  '  </item>'
                ELSE
                  '  <entry>' || chr(10) || '    <title>Page ' || d
                  || '</title>' || chr(10) || '    <link href="' || esc
                  || '"/>' || chr(10) || '    <id>' || url
                  || '</id>' || chr(10) ||
                  CASE WHEN d < '5'
                       THEN '    <updated>2026-01-1' || d
                            || '</updated>' || chr(10)
                       ELSE '' END ||
                  '  </entry>'
                END AS entry
              FROM marked
            ), feeds AS (
              SELECT is_rss,
                CASE WHEN is_rss
                     THEN '<rss version="2.0"><channel>' || chr(10)
                     ELSE '<feed xmlns="http://www.w3.org/2005/Atom">'
                          || chr(10) END
                || string_agg(entry, chr(10) ORDER BY entry)
                || CASE WHEN is_rss
                        THEN chr(10) || '</channel></rss>'
                        ELSE chr(10) || '</feed>' END AS xml
              FROM entry GROUP BY host, is_rss
            ), blocks AS (
              SELECT 'rss' AS kind, b
              FROM feeds, LATERAL (SELECT unnest(regexp_extract_all(
                xml, '(?s)<item\\b[^>]*>(.*?)</item>', 1)) AS b) s
              UNION ALL
              SELECT 'atom' AS kind, b
              FROM feeds, LATERAL (SELECT unnest(regexp_extract_all(
                xml, '(?s)<entry\\b[^>]*>(.*?)</entry>', 1)) AS b) s
            ), fields AS (
              SELECT kind,
                NULLIF(CASE WHEN kind = 'rss'
                  THEN regexp_extract(b,
                    '(?s)<link\\b[^>]*>\\s*(.*?)\\s*</link>', 1)
                  ELSE regexp_extract(b,
                    '(?s)<link\\b[^>]*href\\s*=\\s*"([^"]*)"', 1)
                  END, '') AS link0,
                NULLIF(regexp_extract(b,
                  '(?s)<title\\b[^>]*>\\s*(.*?)\\s*</title>', 1), '')
                  AS title,
                NULLIF(CASE WHEN kind = 'rss'
                  THEN regexp_extract(b,
                    '(?s)<guid\\b[^>]*>\\s*(.*?)\\s*</guid>', 1)
                  ELSE regexp_extract(b,
                    '(?s)<id\\b[^>]*>\\s*(.*?)\\s*</id>', 1)
                  END, '') AS entry_id,
                NULLIF(CASE WHEN kind = 'rss'
                  THEN regexp_extract(b,
                    '(?s)<pubDate\\b[^>]*>\\s*(.*?)\\s*</pubDate>', 1)
                  ELSE regexp_extract(b,
                    '(?s)<updated\\b[^>]*>\\s*(.*?)\\s*</updated>', 1)
                  END, '') AS published
              FROM blocks
            ), fin AS (
              SELECT kind,
                replace(replace(replace(replace(replace(link0,
                  '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                  '&apos;', ''''), '&amp;', '&') AS link,
                title, entry_id, published
              FROM fields WHERE link0 IS NOT NULL
            )
            SELECT kind, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(COUNT(DISTINCT link) AS BIGINT) AS n_links,
                   CAST(COUNT(title) AS BIGINT) AS n_titles,
                   CAST(COUNT(entry_id) AS BIGINT) AS n_ids,
                   CAST(COUNT(published) AS BIGINT) AS n_pub,
                   CAST(SUM(CAST('0x' || substr(md5(link), 1, 10)
                                 AS BIGINT)) AS BIGINT) AS pin
            FROM fin GROUP BY kind ORDER BY kind
        """,
        # SPARQL filter surface: VALUES/IN, numeric TRY_CAST compare,
        # regexp_matches, LIMIT-OFFSET pagination — each predicate
        # replayed with DuckDB's own machinery.
        "q_sparql_filter": f"""
            WITH t AS (
              SELECT s, p, o FROM
                read_parquet('{ORACLE_DIR}/sf0.01/triples/*.parquet')
            )
            SELECT n.s AS page, n.o AS name, r.o AS rating
            FROM t n JOIN t r ON r.s = n.s
            WHERE n.p = 'http://schema.org/name'
              AND r.p = 'http://schema.org/ratingValue'
              AND r.o IN ('2.0','2.2','2.4','2.6','2.8','3.0','3.2','3.4')
              AND TRY_CAST(r.o AS DOUBLE) >= 2.2
              AND regexp_matches(n.o, '[24680]»$')
            ORDER BY page, rating LIMIT 200 OFFSET 10
        """,
        # NFC: the same synthetic decomposed corpus rebuilt with
        # chr() formulas and normalized by DuckDB's OWN
        # nfc_normalize — two independent UAX #15 implementations
        # must produce identical lengths, flags, and text pins.
        "q_nfc": f"""
            WITH ids AS (
              SELECT unnest(generate_series(
                0, {max(200, int(200_000 * 0.01)) - 1})) AS i
            ), t AS (
              SELECT i,
                'w' || chr(CAST(97 + i % 26 AS INTEGER)) ||
                CASE WHEN i % 3 > 0
                     THEN chr(CAST(768 + i % 5 AS INTEGER))
                     ELSE '' END || ' ' ||
                CASE WHEN i % 3 > 0
                     THEN chr(CAST(4352 + i % 19 AS INTEGER)) ||
                          chr(CAST(4449 + i % 21 AS INTEGER))
                     ELSE 'xy' END || ' q' ||
                CASE WHEN i % 2 = 1 THEN chr(807) ELSE '' END AS text
              FROM ids
            ), nn AS (
              SELECT i, text, nfc_normalize(text) AS nfc FROM t
            )
            SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(CASE WHEN text <> nfc THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_changed,
                   CAST(SUM(length(text)) AS BIGINT) AS len_before,
                   CAST(SUM(length(nfc)) AS BIGINT) AS len_after,
                   CAST(SUM(CAST('0x' || substr(md5(
                     CAST(i AS VARCHAR) || chr(1) || nfc), 1, 10)
                     AS BIGINT)) AS BIGINT) AS pin
            FROM nn
        """,
        # Anchor text: the synthesized (dst, anchor) pair set
        # regenerated from the (id, k) formulas, counted, and
        # top-3-ranked with the same (n DESC, anchor) tie-break.
        "q_anchor_text": f"""
            WITH ids AS (
              SELECT unnest(generate_series(
                0, {max(200, int(200_000 * 0.01)) - 1})) AS i
            ), ks AS (
              SELECT unnest(generate_series(0, 4)) AS k
            ), pairs AS (
              SELECT
                'http://site' || CAST((i*5+k) % 23 AS VARCHAR) ||
                '.example/page/' || CAST((i*5+k) % 51 AS VARCHAR)
                  AS dst,
                'term' || CAST((i*5+k) % 11 AS VARCHAR) ||
                ' w' || CAST((i*5+k) % 13 AS VARCHAR) AS anchor
              FROM ids, ks
            ), counts AS (
              SELECT dst, anchor, CAST(COUNT(*) AS BIGINT) AS n
              FROM pairs GROUP BY dst, anchor
            ), ranked AS (
              SELECT dst, anchor, n,
                     ROW_NUMBER() OVER (
                       PARTITION BY dst ORDER BY n DESC, anchor
                     ) AS rank
              FROM counts
            )
            SELECT dst, anchor, n, CAST(rank AS INTEGER) AS rank
            FROM ranked WHERE rank <= 3 ORDER BY dst, rank
        """,
        # EXIF certificate: every expected (media_id, ifd, name,
        # value) row regenerated from the generator's closed-form
        # formulas over generate_series — no payload byte read — and
        # SHACL report: every constraint replayed relationally over
        # the DISTINCT materialized triple set — focus filter,
        # per-path value joins, cardinality counts, datatype/
        # nodeKind/length/pattern row checks, NOT-IN class check —
        # with the same per-violation (focus, value) md5 pin.
        "q_shacl": f"""
            WITH t AS (
              SELECT DISTINCT s, p, o, o_kind, o_dt, o_lang
              FROM read_parquet('{ORACLE_DIR}/sf0.01/triples/*.parquet')
            ), focus AS (
              SELECT DISTINCT s FROM t
              WHERE p = 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
                AND o = 'http://schema.org/Thing'
            ), name_vals AS (
              SELECT f.s AS focus, t.o, t.o_kind, t.o_dt, t.o_lang
              FROM focus f
              JOIN t ON t.s = f.s AND t.p = 'http://schema.org/name'
            ), link_vals AS (
              SELECT f.s AS focus, t.o, t.o_kind
              FROM focus f
              JOIN t ON t.s = f.s AND t.p = 'http://schema.org/relatedLink'
            ), review_vals AS (
              SELECT f.s AS focus, t.o, t.o_kind
              FROM focus f
              JOIN t ON t.s = f.s AND t.p = 'http://schema.org/review'
            ), rating_vals AS (
              SELECT f.s AS focus, t.o, t.o_kind
              FROM focus f
              JOIN t ON t.s = f.s AND t.p = 'http://schema.org/ratingValue'
            ), viol AS (
              SELECT f.s AS focus, 'minCount' AS con,
                     'http://schema.org/name' AS path, '' AS value
              FROM focus f LEFT JOIN (
                SELECT focus, COUNT(*) AS n FROM name_vals GROUP BY focus
              ) c ON c.focus = f.s
              WHERE COALESCE(c.n, 0) < 1
              UNION ALL
              SELECT focus, 'maxCount', 'http://schema.org/name', ''
              FROM (
                SELECT focus, COUNT(*) AS n FROM name_vals GROUP BY focus
              ) WHERE n > 1
              UNION ALL
              SELECT focus, 'datatype', 'http://schema.org/name', o
              FROM name_vals
              WHERE NOT (o_kind = 1
                AND o_dt IN ('', 'http://www.w3.org/2001/XMLSchema#string')
                AND o_lang = '')
              UNION ALL
              SELECT focus, 'maxLength', 'http://schema.org/name', o
              FROM name_vals WHERE length(o) > 18
              UNION ALL
              SELECT focus, 'nodeKind', 'http://schema.org/relatedLink', o
              FROM link_vals WHERE o_kind <> 0
              UNION ALL
              SELECT focus, 'class', 'http://schema.org/relatedLink', o
              FROM link_vals
              WHERE o_kind <> 1 AND o NOT IN (SELECT s FROM focus)
              UNION ALL
              SELECT focus, 'nodeKind', 'http://schema.org/review', o
              FROM review_vals WHERE o_kind <> 2
              UNION ALL
              SELECT focus, 'pattern', 'http://schema.org/ratingValue', o
              FROM rating_vals
              WHERE o_kind <> 1
                 OR NOT regexp_matches(o, '^[0-9]+\\.[0-9]$')
            )
            SELECT con AS "constraint", path,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(COUNT(DISTINCT focus) AS BIGINT) AS n_focus,
                   CAST(SUM(CAST('0x' || substr(md5(
                     focus || chr(1) || value), 1, 10) AS BIGINT))
                     AS BIGINT) AS pin
            FROM viol GROUP BY con, path ORDER BY con, path
        """,
        # RDF/XML certificate: every expected canonical N-Triples
        # line regenerated closed-form from the doc id (typed node,
        # lang literal, typed literal, resource link, rdf:_n
        # container rows, property-attribute blank) — sorted and
        # md5-pinned exactly as the Spark side does. rt_ok is the
        # writer→reparse fixpoint, always 1 by construction.
        "q_rdfxml": f"""
            WITH ids AS (
              SELECT unnest(range(0,
                {max(64, int(200_000 * 0.01) // 8)})) AS i
            ), lines AS (
              SELECT i, '<http://ex.org/item/' || CAST(i AS VARCHAR)
                || '> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type>'
                || ' <http://schema.org/Thing> .' AS line
              FROM ids WHERE i % 2 = 0
              UNION ALL
              SELECT i, '<http://ex.org/item/' || CAST(i AS VARCHAR)
                || '> <http://schema.org/name> "Item '
                || CAST(i AS VARCHAR) || '"@en .' FROM ids
              UNION ALL
              SELECT i, '<http://ex.org/item/' || CAST(i AS VARCHAR)
                || '> <http://schema.org/age> "' || CAST(i AS VARCHAR)
                || '"^^<http://www.w3.org/2001/XMLSchema#integer> .'
              FROM ids
              UNION ALL
              SELECT i, '<http://ex.org/item/' || CAST(i AS VARCHAR)
                || '> <http://schema.org/knows> <http://ex.org/item/'
                || CAST((i * 7) % {max(64, int(200_000 * 0.01) // 8)}
                        AS VARCHAR)
                || '> .' FROM ids
              UNION ALL
              SELECT i, '<http://ex.org/item/' || CAST(i AS VARCHAR)
                || '> <http://www.w3.org/1999/02/22-rdf-syntax-ns#_'
                || CAST(j.j AS VARCHAR) || '> "v' || CAST(j.j AS VARCHAR)
                || '" .'
              FROM ids, LATERAL (
                SELECT unnest(range(1, 2 + i % 3)) AS j) j
              UNION ALL
              SELECT i, '<http://ex.org/item/' || CAST(i AS VARCHAR)
                || '> <http://schema.org/address> _:b1 .'
              FROM ids WHERE i % 4 = 0
              UNION ALL
              SELECT i, '_:b1 <http://schema.org/postalCode> "'
                || CAST(10000 + i AS VARCHAR) || '" .'
              FROM ids WHERE i % 4 = 0
            ), doc AS (
              SELECT i, CAST(COUNT(*) AS BIGINT) AS n_triples,
                     md5(string_agg(line, chr(10) ORDER BY line))
                       AS nt_md5
              FROM lines GROUP BY i
            )
            SELECT CAST(i AS BIGINT) AS doc_id, n_triples,
                   CAST(CASE WHEN i % 4 = 0 THEN 1 ELSE 0 END
                        AS BIGINT) AS n_blanks,
                   CAST(1 AS INTEGER) AS rt_ok, nt_md5
            FROM doc ORDER BY doc_id
        """,
        # PDF text extraction: every document's pages regenerated
        # closed-form from the row id (the writer/parser pair is the
        # unit under test — encode→decode must land exactly on this
        # formula), full text re-joined with chr(10), md5-pinned.
        "q_pdf_text": f"""
            WITH ids AS (
              SELECT unnest(range(0,
                {max(64, int(200_000 * 0.01) // 8)})) AS id
            ), pg AS (
              SELECT id, pp.p AS p,
                     'Doc ' || CAST(id AS VARCHAR) || ' page '
                     || CAST(pp.p AS VARCHAR) || ': '
                     || repeat('word ', CAST(1 + (id + pp.p) % 4 AS INT))
                     || '(' || chr(233) || ')\\.' AS t
              FROM ids, LATERAL (
                SELECT unnest(range(0, 1 + id % 3)) AS p) pp
            ), doc AS (
              SELECT id, CAST(COUNT(*) AS INT) AS n_pages,
                     string_agg(t, chr(10) ORDER BY p) AS full_text
              FROM pg GROUP BY id
            )
            SELECT CAST(id AS BIGINT) AS media_id, n_pages,
                   CAST(length(full_text) AS INT) AS n_chars,
                   md5(full_text) AS text_md5
            FROM doc
        """,
        # aggregated identically (per-row md5 pin over
        # media_id||chr(1)||value).
        "q_mm_exif": f"""
            WITH ids AS (
              SELECT unnest(generate_series(
                0, {max(64, int(200_000 * 0.01) // 64) - 1})) AS i
            ), rows_ AS (
              SELECT i AS media_id, 'ifd0' AS ifd, 'Make' AS name,
                     'Cam' || CAST(i % 7 AS VARCHAR) AS value FROM ids
              UNION ALL
              SELECT i, 'ifd0', 'Model',
                     'M' || CAST(i % 13 AS VARCHAR) FROM ids
              UNION ALL
              SELECT i, 'ifd0', 'Orientation',
                     CAST(1 + i % 8 AS VARCHAR) FROM ids
              UNION ALL
              SELECT i, 'ifd0', 'XResolution',
                     CAST(72 + (i % 4) * 24 AS VARCHAR) || '/1' FROM ids
              UNION ALL
              SELECT i, 'ifd0', 'DateTime',
                     '2020:01:' ||
                     lpad(CAST(1 + i % 28 AS VARCHAR), 2, '0') ||
                     ' 12:' || lpad(CAST(i % 60 AS VARCHAR), 2, '0') ||
                     ':00' FROM ids
              UNION ALL
              SELECT i, 'exif', 'ExposureTime',
                     '1/' || CAST(30 + i % 30 AS VARCHAR) FROM ids
              UNION ALL
              SELECT i, 'exif', 'ISOSpeedRatings',
                     CAST(100 + (i % 8) * 50 AS VARCHAR) FROM ids
              UNION ALL
              SELECT i, 'exif', 'PixelXDimension',
                     CAST(8 + (i * 37) % 24 AS VARCHAR) FROM ids
            )
            SELECT ifd, name, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(COUNT(DISTINCT value) AS BIGINT) AS n_vals,
                   CAST(SUM(CAST('0x' || substr(md5(
                     CAST(media_id AS VARCHAR) || chr(1) || value),
                     1, 10) AS BIGINT)) AS BIGINT) AS pin
            FROM rows_ GROUP BY ifd, name ORDER BY ifd, name
        """,
        # SPARQL BIND: the computed columns (string pipeline +
        # arithmetic rescale) and the bind-fed filter replayed in
        # SQL. Floats cross as round(x, 6); the filter applies to
        # the UNROUNDED value on both engines.
        "q_sparql_bind": f"""
            WITH t AS (
              SELECT s, p, o
              FROM read_parquet('{ORACLE_DIR}/sf0.01/triples/*.parquet')
            )
            SELECT n.s AS page,
                   upper(n.o) || '!' AS shout,
                   ROUND(TRY_CAST(v.o AS DOUBLE) * 10 - 5, 6) AS score
            FROM t n
            JOIN t v ON v.s = n.s
            WHERE n.p = 'http://schema.org/name'
              AND v.p = 'http://schema.org/ratingValue'
              AND (TRY_CAST(v.o AS DOUBLE) * 10 - 5) >= 20
            ORDER BY page LIMIT 300
        """,
        # SPARQL DESCRIBE: the distinct described-resource set
        # joined back as subject, replayed as a semi-join.
        "q_sparql_describe": f"""
            WITH t AS (
              SELECT s, p, o
              FROM read_parquet('{ORACLE_DIR}/sf0.01/triples/*.parquet')
            )
            SELECT s, p, o FROM t
            WHERE s IN (
              SELECT DISTINCT s FROM t
              WHERE p = 'http://schema.org/ratingValue'
                AND TRY_CAST(o AS DOUBLE) >= 4.5
            )
            ORDER BY s, p, o
        """,
        # Skolemization: the kind-guarded genid prefix concat
        # replayed over the materialized triples.
        "q_skolem": f"""
            WITH t AS (
              SELECT * FROM
                read_parquet('{ORACLE_DIR}/sf0.01/triples/*.parquet')
            ), sk AS (
              SELECT
                CASE WHEN s_kind = 2 THEN
                  'https://serd-spark.invalid/.well-known/genid/' || s
                ELSE s END AS s,
                CAST(CASE WHEN s_kind = 2 THEN 0 ELSE s_kind END
                     AS INTEGER) AS sk,
                CASE WHEN o_kind = 2 THEN
                  'https://serd-spark.invalid/.well-known/genid/' || o
                ELSE o END AS o,
                CAST(CASE WHEN o_kind = 2 THEN 0 ELSE o_kind END
                     AS INTEGER) AS ok
              FROM t
            )
            SELECT sk, ok, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(COUNT(DISTINCT s) AS BIGINT) AS n_subj,
                   CAST(SUM(CAST('0x' || substr(md5(
                     s || chr(1) || o), 1, 10) AS BIGINT)) AS BIGINT)
                     AS pin
            FROM sk GROUP BY sk, ok ORDER BY sk, ok
        """,
        # RDFC-1.0 certificate: per-document run hashes and the
        # isomorphism verdict recomputed from the materialized
        # canonical lines (ASCII-only, so binary UTF-8 ORDER BY here
        # equals Spark's array_sort ordering byte-for-byte).
        "q_c14n": f"""
            WITH l AS (
              SELECT * FROM
                read_parquet('{ORACLE_DIR}/sf0.01/c14n_lines/*.parquet')
            ), g AS (
              SELECT url,
                CAST(COUNT(*) FILTER (WHERE run = 'o') AS BIGINT) AS n_o,
                CAST(COUNT(*) FILTER (WHERE run = 'p') AS BIGINT) AS n_p,
                md5(COALESCE(string_agg(line, chr(10) ORDER BY line)
                    FILTER (WHERE run = 'o'), '')) AS h_o,
                md5(COALESCE(string_agg(line, chr(10) ORDER BY line)
                    FILTER (WHERE run = 'p'), '')) AS h_p
              FROM l GROUP BY url
            )
            SELECT url, n_o, n_p, h_o, h_p,
                   CAST(CASE WHEN h_o = h_p THEN 1 ELSE 0 END
                        AS INTEGER) AS iso
            FROM g ORDER BY url
        """,
        # VoID description: every statistic and partition triple
        # rebuilt from the materialized triples with DuckDB's own
        # aggregates.
        "q_void": f"""
            WITH t AS (
              SELECT s, p, o FROM
                read_parquet('{ORACLE_DIR}/sf0.01/triples/*.parquet')
            ), ds AS (SELECT 'https://serd-spark.invalid/kg' AS d)
            SELECT s, p, o FROM (
              SELECT d AS s,
                'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS p,
                'http://rdfs.org/ns/void#Dataset' AS o
              FROM ds WHERE EXISTS (SELECT 1 FROM t)
              UNION ALL
              SELECT d, 'http://rdfs.org/ns/void#triples',
                     CAST(COUNT(*) AS VARCHAR) FROM t, ds GROUP BY d
              UNION ALL
              SELECT d, 'http://rdfs.org/ns/void#distinctSubjects',
                     CAST(COUNT(DISTINCT s) AS VARCHAR)
              FROM t, ds GROUP BY d
              UNION ALL
              SELECT d, 'http://rdfs.org/ns/void#distinctObjects',
                     CAST(COUNT(DISTINCT o) AS VARCHAR)
              FROM t, ds GROUP BY d
              UNION ALL
              SELECT d, 'http://rdfs.org/ns/void#properties',
                     CAST(COUNT(DISTINCT p) AS VARCHAR)
              FROM t, ds GROUP BY d
              UNION ALL
              SELECT d, 'http://rdfs.org/ns/void#classes',
                     CAST(COUNT(DISTINCT o) AS VARCHAR)
              FROM t, ds
              WHERE p =
                'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
              GROUP BY d
              UNION ALL
              SELECT d, 'http://rdfs.org/ns/void#propertyPartition',
                     d || '/prop/' || md5(p)
              FROM t, ds GROUP BY d, p
              UNION ALL
              SELECT d || '/prop/' || md5(p),
                     'http://rdfs.org/ns/void#property', p
              FROM t, ds GROUP BY d, p
              UNION ALL
              SELECT d || '/prop/' || md5(p),
                     'http://rdfs.org/ns/void#triples',
                     CAST(COUNT(*) AS VARCHAR)
              FROM t, ds GROUP BY d, p
            )
            ORDER BY s, p, o
        """,
        # SPARQL MINUS: the anti join replayed as NOT EXISTS.
        "q_sparql_minus": f"""
            WITH t AS (
              SELECT s, p, o FROM
                read_parquet('{ORACLE_DIR}/sf0.01/triples/*.parquet')
            )
            SELECT n.s AS page, n.o AS name
            FROM t n
            WHERE n.p = 'http://schema.org/name'
              AND NOT EXISTS (
                SELECT 1 FROM t r
                WHERE r.p = 'http://schema.org/review' AND r.s = n.s
              )
            ORDER BY page LIMIT 400
        """,
        # robots.txt compliance: the URL-side match replayed as a
        # LIKE join (same escape discipline as the Spark patterns)
        # + the numeric precedence argmax over the materialized rules
        # table; the parse layer is pinned by unit tests.
        "q_robots": f"""
            WITH u AS (
              SELECT DISTINCT url FROM
                read_parquet('{ORACLE_DIR}/sf0.01/pages_meta/*.parquet')
            ), up AS (
              SELECT url,
                regexp_extract(url,
                  '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1) AS host,
                CASE WHEN regexp_extract(url,
                       '^[a-z][a-z0-9+.-]*://[^/?#]+([^?#]*)', 1) = ''
                     THEN '/'
                     ELSE regexp_extract(url,
                       '^[a-z][a-z0-9+.-]*://[^/?#]+([^?#]*)', 1)
                END AS path
              FROM u
            ), r AS (
              SELECT host, allow, like_pat, pat_len FROM
                read_parquet('{ORACLE_DIR}/sf0.01/robots_rules/*.parquet')
            ), sel AS (
              SELECT up.url, up.host, rr.pat_len * 2 + rr.allow AS k
              FROM up LEFT JOIN r rr
                ON rr.host = up.host
               AND up.path LIKE rr.like_pat ESCAPE '\\'
            ), best AS (
              SELECT url, host, MAX(k) AS k FROM sel GROUP BY url, host
            )
            SELECT (k IS NULL OR k % 2 = 1) AS allowed,
                   CAST(COUNT(*) AS BIGINT) AS n_urls,
                   CAST(COUNT(DISTINCT host) AS BIGINT) AS n_hosts,
                   CAST(SUM(CAST('0x' || substr(md5(url), 1, 10)
                                 AS BIGINT)) AS BIGINT) AS pin
            FROM best GROUP BY 1 ORDER BY 1
        """,
        # Compaction content certificate: the per-bucket aggregate of
        # the post-compaction table replayed from raw lineitem.
        "q_compact": """
            WITH li AS (
              SELECT l_orderkey * 10 + l_linenumber AS k,
                     CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
              FROM lineitem
            )
            SELECT CAST(CAST('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 8)
                        AS BIGINT) % 16 AS INT) AS kbucket,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(cents) AS BIGINT) AS sum_cents,
                   CAST(MIN(k) AS BIGINT) AS k_min,
                   CAST(MAX(k) AS BIGINT) AS k_max
            FROM li GROUP BY 1 ORDER BY kbucket
        """,
        # Keyed-table MERGE: update/insert/delete semantics and the
        # md5 storage bucketing replayed from raw orders.
        "q_upsert": """
            WITH o AS (
              SELECT o_orderkey AS k,
                     CAST(round(o_totalprice * 100) AS BIGINT) AS cents
              FROM orders
            ), upd AS (
              SELECT k, cents + 111 AS cents FROM o WHERE k % 7 = 0
              UNION ALL
              SELECT k + 100000000 AS k, k AS cents FROM o
              WHERE k % 97 = 0
            ), dels AS (
              SELECT k FROM o WHERE k % 13 = 0 AND k % 7 <> 0
            ), merged AS (
              SELECT k, cents FROM upd
              UNION ALL
              SELECT o.k, o.cents FROM o
              WHERE o.k NOT IN (SELECT k FROM upd)
                AND o.k NOT IN (SELECT k FROM dels)
            )
            SELECT CAST(CAST('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 8)
                        AS BIGINT) % 16 AS INT) AS kbucket,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(cents) AS BIGINT) AS sum_cents,
                   CAST(MIN(k) AS BIGINT) AS k_min,
                   CAST(MAX(k) AS BIGINT) AS k_max
            FROM merged GROUP BY 1 ORDER BY kbucket
        """,
        # Stream-stream interval join: wide watermark makes the
        # availableNow result exactly the batch inequality join.
        "stream_join": """
            SELECT c.event_id AS click_id,
                   CAST(COUNT(*) AS BIGINT) AS n_views,
                   CAST(MAX(v.event_id) AS BIGINT) AS last_view_id
            FROM events c JOIN events v
              ON v.user_id = c.user_id
             AND v.ts >= c.ts - INTERVAL 14400 SECOND AND v.ts <= c.ts
            WHERE c.event_type = 'click' AND v.event_type = 'view'
            GROUP BY c.event_id
            ORDER BY click_id
        """,
        # WARC fixpoint: the roundtrip aggregate recomputed from the
        # materialized source parquet — equality proves the sink and
        # scanner preserve every byte, record and timestamp.
        "q_assortativity": """
            WITH e0 AS (
              SELECT o_custkey % 9973 AS src, l_suppkey % 9973 AS dst
              FROM orders JOIN lineitem ON o_orderkey = l_orderkey
            ), e AS (
              SELECT src, dst FROM e0
              UNION ALL
              SELECT dst AS src, src AS dst FROM e0
            ), degx AS (
              SELECT src AS n_, CAST(COUNT(*) AS BIGINT) AS dx
              FROM e GROUP BY src
            ), degy AS (
              SELECT dst AS n_, CAST(COUNT(*) AS BIGINT) AS dy
              FROM e GROUP BY dst
            ), p AS (
              SELECT dx, dy FROM e
              JOIN degx ON e.src = degx.n_
              JOIN degy ON e.dst = degy.n_
            ), m AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(dx) AS BIGINT) AS sx,
                     CAST(SUM(dy) AS BIGINT) AS sy,
                     CAST(SUM(dx * dy) AS BIGINT) AS sxy,
                     CAST(SUM(dx * dx) AS BIGINT) AS sxx,
                     CAST(SUM(dy * dy) AS BIGINT) AS syy
              FROM p
            )
            SELECT n, sx, sy, sxy, sxx, syy,
                   CAST(round(
                     (n::DOUBLE * sxy::DOUBLE
                      - sx::DOUBLE * sy::DOUBLE)
                     / (sqrt(n::DOUBLE * sxx::DOUBLE
                             - sx::DOUBLE * sx::DOUBLE)
                        * sqrt(n::DOUBLE * syy::DOUBLE
                               - sy::DOUBLE * sy::DOUBLE))
                     * 1e6) AS BIGINT) AS r_micro
            FROM m
        """,
        "stream_funnel": """
            WITH e AS (
              SELECT user_id, ts, event_type FROM events
              WHERE event_type IN ('view', 'click', 'purchase')
            ), s1 AS (
              SELECT user_id, min(ts) AS t1 FROM e
              WHERE event_type = 'view' GROUP BY user_id
            ), s2 AS (
              SELECT e.user_id, min(e.ts) AS t2 FROM e
              JOIN s1 USING (user_id)
              WHERE e.event_type = 'click' AND e.ts > s1.t1
              GROUP BY e.user_id
            ), s3 AS (
              SELECT e.user_id, min(e.ts) AS t3 FROM e
              JOIN s2 USING (user_id)
              WHERE e.event_type = 'purchase' AND e.ts > s2.t2
              GROUP BY e.user_id
            )
            SELECT s1.user_id,
                   strftime(t1, '%Y-%m-%d %H:%M:%S.%f') AS t1,
                   strftime(t2, '%Y-%m-%d %H:%M:%S.%f') AS t2,
                   strftime(t3, '%Y-%m-%d %H:%M:%S.%f') AS t3
            FROM s1 JOIN s2 USING (user_id) JOIN s3 USING (user_id)
            ORDER BY user_id
        """,
        "q_length_batches": """
            WITH t AS (
              SELECT doc_id,
                     CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(regexp_split_to_array(trim(text),
                                                         '\\s+'))
                     END AS BIGINT) AS n_tokens
              FROM documents
            ), b AS (
              SELECT doc_id, n_tokens, n_tokens // 16 AS bucket,
                     (row_number() OVER (
                        PARTITION BY n_tokens // 16
                        ORDER BY n_tokens, doc_id) - 1) // 8
                       AS batch_idx
              FROM t
            )
            SELECT bucket, batch_idx,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(MAX(n_tokens) AS BIGINT) AS max_tok,
                   CAST(SUM(n_tokens) AS BIGINT) AS sum_tok,
                   CAST(MAX(n_tokens) * COUNT(*) - SUM(n_tokens)
                     AS BIGINT) AS padding_waste
            FROM b GROUP BY bucket, batch_idx
            ORDER BY bucket, batch_idx
        """,
        "q_c4_filters": f"""
            WITH p AS (
              SELECT url, string_split(text, chr(10)) AS lines
              FROM read_parquet('{ORACLE_DIR}/sf0.01/pages_text_latest/*.parquet')
            ), k AS (
              SELECT url, lines,
                     list_filter(lines, x ->
                       regexp_matches(trim(x), '[.!?"]$')
                       AND len(regexp_split_to_array(trim(x),
                                                     '\\s+')) >= 3
                       AND NOT contains(trim(x), '{{')
                       AND NOT contains(trim(x), '}}')
                       AND NOT contains(lower(trim(x)), 'lorem ipsum')
                     ) AS kept
              FROM p
            )
            SELECT url, CAST(len(lines) AS BIGINT) AS n_lines,
                   CAST(len(kept) AS BIGINT) AS n_kept,
                   md5(array_to_string(
                     list_transform(kept, x -> trim(x)), chr(10)))
                     AS kept_md5
            FROM k ORDER BY url
        """,
        "q_readability": """
            WITH f AS (
              SELECT doc_id,
                     CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(regexp_split_to_array(trim(text),
                                                         '\\s+'))
                     END AS BIGINT) AS words,
                     greatest(1::BIGINT, CAST(len(regexp_extract_all(
                       text, '[.!?]+')) AS BIGINT)) AS sentences,
                     CAST(len(regexp_extract_all(lower(text),
                       '[aeiouy]+')) AS BIGINT) AS vruns
              FROM documents
            ), s AS (
              SELECT doc_id, words, sentences,
                     greatest(words, vruns) AS syllables
              FROM f
            )
            SELECT doc_id, words, sentences, syllables,
                   CAST(206835000 - (1015000 * words) // sentences
                        - (84600000 * syllables)
                          // greatest(words, 1::BIGINT)
                     AS BIGINT) AS flesch_u,
                   CAST((390000 * words) // sentences
                        + (11800000 * syllables)
                          // greatest(words, 1::BIGINT)
                        - 15590000 AS BIGINT) AS grade_u
            FROM s ORDER BY doc_id
        """,
        "stream_upsert": f"""
            SELECT url, ts, hmd5 FROM (
              SELECT url,
                     strftime(warc_ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
                     hmd5,
                     row_number() OVER (
                       PARTITION BY url ORDER BY warc_ts DESC, _h DESC
                     ) AS rn
              FROM read_parquet(
                '{ORACLE_DIR}/sf0.01/upsert_raw_pages_h/*.parquet')
            ) WHERE rn = 1 ORDER BY url
        """,
        "q_sparql_update": f"""
            WITH store AS (
              SELECT DISTINCT s, p, o
              FROM read_parquet('{ORACLE_DIR}/sf0.01/triples/*.parquet')
            ), sol AS (
              SELECT s AS x, o AS y FROM store
              WHERE p = 'http://schema.org/relatedLink'
            ), kept AS (
              SELECT st.s, st.p, st.o FROM store st
              WHERE NOT EXISTS (
                SELECT 1 FROM sol
                WHERE st.s = sol.x
                  AND st.p = 'http://schema.org/relatedLink'
                  AND st.o = sol.y
              )
            ), ins AS (
              SELECT DISTINCT x AS s,
                     'http://www.w3.org/2000/01/rdf-schema#seeAlso'
                       AS p,
                     y AS o
              FROM sol
            ), fresh AS (
              SELECT i.s, i.p, i.o FROM ins i
              WHERE NOT EXISTS (
                SELECT 1 FROM kept k
                WHERE k.s = i.s AND k.p = i.p AND k.o = i.o
              )
            ), updated AS (
              SELECT * FROM kept UNION ALL SELECT * FROM fresh
            )
            SELECT p, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST('0x' || substr(md5(
                     concat_ws(chr(1), s, o)), 1, 10) AS BIGINT))
                     AS BIGINT) AS pin
            FROM updated GROUP BY p ORDER BY p
        """,
        "q_wat": f"""
            SELECT url, CAST(COUNT(*) AS BIGINT) AS n,
                   MIN(md5(wat)) AS h_min,
                   MAX(md5(wat)) AS h_max,
                   CAST(SUM(len(CAST(
                     json_extract(wat, '$.links') AS VARCHAR[]
                   ))) AS BIGINT) AS n_links
            FROM read_parquet('{ORACLE_DIR}/sf0.01/wat_src/*.parquet')
            GROUP BY url ORDER BY url
        """,
        "q_wet": f"""
            SELECT url, CAST(COUNT(*) AS BIGINT) AS n,
                   strftime(MAX(warc_ts), '%Y-%m-%d %H:%M:%S.%f')
                     AS ts_max,
                   MIN(md5(text)) AS h_min,
                   MAX(md5(text)) AS h_max
            FROM read_parquet('{ORACLE_DIR}/sf0.01/wet_src/*.parquet')
            GROUP BY url ORDER BY url
        """,
        "q_warc_roundtrip": f"""
            SELECT url, CAST(COUNT(*) AS BIGINT) AS n,
                   strftime(MAX(warc_ts), '%Y-%m-%d %H:%M:%S.%f')
                     AS ts_max,
                   MIN(md5(decode(html))) AS h_min,
                   MAX(md5(decode(html))) AS h_max
            FROM read_parquet('{ORACLE_DIR}/sf0.01/warc_src/*.parquet')
            GROUP BY url ORDER BY url
        """,
        # JSON props: DuckDB's own JSON engine re-extracts $.k — two
        # independent parsers must agree on every value.
        "q_json_props": """
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(json_extract_string(props, '$.k')
                                 AS BIGINT)) AS BIGINT) AS sum_k,
                   CAST(MIN(CAST(json_extract_string(props, '$.k')
                                 AS BIGINT)) AS BIGINT) AS min_k,
                   CAST(MAX(CAST(json_extract_string(props, '$.k')
                                 AS BIGINT)) AS BIGINT) AS max_k
            FROM events
            GROUP BY event_type
            ORDER BY event_type
        """,
        # 2-hop graph pattern: the BGP self-join replayed over the
        # materialized canonical triples.
        "q_kg_twohop": f"""
            WITH e AS (
              SELECT DISTINCT s, o
              FROM read_parquet('{ORACLE_DIR}/sf0.01/triples/*.parquet')
              WHERE p = 'http://schema.org/relatedLink'
            )
            SELECT a.s,
                   CAST(COUNT(*) AS BIGINT) AS n_paths,
                   CAST(COUNT(DISTINCT b.o) AS BIGINT) AS n_targets
            FROM e a JOIN e b ON a.o = b.s
            GROUP BY a.s
            ORDER BY n_paths DESC, a.s ASC
            LIMIT 50
        """,
        # Replay the curation funnel: lang filter, quality filter and
        # exact dedup recomputed INDEPENDENTLY in SQL; the near-dup
        # stage subtracts the materialized LSH loser set.
        "curate_metrics": f"""
            WITH lang_keep AS (
              SELECT doc_id, text FROM documents
              WHERE {_lang_case_sql()} = 'en'
            ), q AS (
              SELECT doc_id, text,
                     CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                     END AS q_tokens,
                     round(
                       (length(text) - length(regexp_replace(text,
                           '[^\\s\\p{{L}}\\p{{N}}]', '', 'g')))
                       / greatest(length(text), 1)::DOUBLE, 6)
                       AS q_punct_ratio,
                     round(
                       length(regexp_replace(text, '\\s+', '', 'g'))
                       / greatest(CASE WHEN length(trim(text)) = 0 THEN 0
                            ELSE len(regexp_split_to_array(trim(text),
                                                           '\\s+'))
                          END, 1)::DOUBLE, 6) AS q_mean_word_len
              FROM lang_keep
            ), quality_keep AS (
              SELECT doc_id, text FROM q
              WHERE q_tokens >= 5 AND q_mean_word_len <= 20.0
                AND q_punct_ratio <= 0.3
            ), exact_keep AS (
              SELECT doc_id FROM quality_keep
              WHERE doc_id IN (
                SELECT MIN(doc_id) FROM quality_keep
                GROUP BY md5(lower(regexp_replace(trim(text), '\\s+',
                                                  ' ', 'g')))
              )
            ), losers AS (
              SELECT doc_id
              FROM read_parquet('{ORACLE_DIR}/sf0.01/curate_losers/*.parquet')
            )
            SELECT 'input' AS stage,
                   (SELECT COUNT(*) FROM documents) AS n_docs
            UNION ALL SELECT 'lang_filter', COUNT(*) FROM lang_keep
            UNION ALL SELECT 'quality_filter', COUNT(*) FROM quality_keep
            UNION ALL SELECT 'exact_dedup', COUNT(*) FROM exact_keep
            UNION ALL SELECT 'near_dup_removal',
              (SELECT COUNT(*) FROM exact_keep
               WHERE doc_id NOT IN (SELECT doc_id FROM losers))
        """,
        # The 7-stage funnel: every filter stage replayed in SQL —
        # lang CASE, quality features, the unigram LM fit on the
        # post-quality survivors, exact dedup, the span frequency
        # table over the post-exact survivors — with only the LSH
        # loser set read from materialized parquet.
        "curate_metrics_full": f"""
            WITH lang_keep AS (
              SELECT doc_id, text FROM documents
              WHERE {_lang_case_sql()} = 'en'
            ), q AS (
              SELECT doc_id, text,
                     CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                     END AS q_tokens,
                     round(
                       (length(text) - length(regexp_replace(text,
                           '[^\\s\\p{{L}}\\p{{N}}]', '', 'g')))
                       / greatest(length(text), 1)::DOUBLE, 6)
                       AS q_punct_ratio,
                     round(
                       length(regexp_replace(text, '\\s+', '', 'g'))
                       / greatest(CASE WHEN length(trim(text)) = 0 THEN 0
                            ELSE len(regexp_split_to_array(trim(text),
                                                           '\\s+'))
                          END, 1)::DOUBLE, 6) AS q_mean_word_len
              FROM lang_keep
            ), quality_keep AS (
              SELECT doc_id, text FROM q
              WHERE q_tokens >= 5 AND q_mean_word_len <= 20.0
                AND q_punct_ratio <= 0.3
            ), lm_w2 AS (
              SELECT doc_id, w FROM (
                SELECT doc_id,
                       unnest(string_split(lower(regexp_replace(
                         trim(text), '\\s+', ' ', 'g')), ' ')) AS w
                FROM quality_keep
              ) WHERE w <> ''
            ), lm_counts AS (
              SELECT w, COUNT(*) AS cnt FROM lm_w2 GROUP BY w
            ), lm_tot AS (
              SELECT CAST(SUM(cnt) AS DOUBLE) AS total FROM lm_counts
            ), lm_vocab AS (
              SELECT w, CAST(round(ln(cnt / total) * 1000000) AS BIGINT)
                       AS lp
              FROM lm_counts, lm_tot
              ORDER BY cnt DESC, w ASC LIMIT 65536
            ), lm_oov AS (
              SELECT CAST(round(ln(0.5 / total) * 1000000) AS BIGINT)
                       AS oov
              FROM lm_tot
            ), lm_score AS (
              SELECT d.doc_id,
                     CAST(floor(SUM(COALESCE(v.lp, o.oov)) / COUNT(*))
                          AS BIGINT) AS lp_mean
              FROM lm_w2 d
              LEFT JOIN lm_vocab v USING (w)
              CROSS JOIN lm_oov o
              GROUP BY d.doc_id
            ), lm_keep AS (
              SELECT k.doc_id, k.text FROM quality_keep k
              JOIN lm_score s USING (doc_id)
              WHERE s.lp_mean >= -3450000
            ), exact_keep AS (
              SELECT doc_id, text FROM lm_keep
              WHERE doc_id IN (
                SELECT MIN(doc_id) FROM lm_keep
                GROUP BY md5(lower(regexp_replace(trim(text), '\\s+',
                                                  ' ', 'g')))
              )
            ), sp_toks AS (
              SELECT doc_id,
                     lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))
                       AS t,
                     string_split(lower(regexp_replace(trim(text),
                       '\\s+', ' ', 'g')), ' ') AS w
              FROM exact_keep
            ), sp_exp AS (
              SELECT doc_id, w,
                     unnest(generate_series(1, len(w) - 9)) AS i
              FROM sp_toks WHERE len(w) >= 10
            ), sp_spans AS (
              SELECT doc_id, array_to_string(w[i : i + 9], ' ') AS span
              FROM sp_exp
              UNION ALL
              SELECT doc_id, t AS span FROM sp_toks WHERE len(w) < 10
            ), sp_tot AS (
              SELECT span, COUNT(*) AS tot FROM sp_spans GROUP BY span
            ), sp_frac AS (
              SELECT s.doc_id,
                     round(SUM(CASE WHEN t.tot > 1 THEN 1 ELSE 0 END)
                           / COUNT(*)::DOUBLE, 6) AS f
              FROM sp_spans s JOIN sp_tot t USING (span)
              GROUP BY s.doc_id
            ), span_keep AS (
              SELECT e.doc_id FROM exact_keep e
              JOIN sp_frac USING (doc_id) WHERE f <= 0.5
            ), losers AS (
              SELECT doc_id FROM read_parquet(
                '{ORACLE_DIR}/sf0.01/curate_full_losers/*.parquet')
            )
            SELECT 'input' AS stage,
                   (SELECT COUNT(*) FROM documents) AS n_docs
            UNION ALL SELECT 'lang_filter', COUNT(*) FROM lang_keep
            UNION ALL SELECT 'quality_filter', COUNT(*) FROM quality_keep
            UNION ALL SELECT 'lm_filter', COUNT(*) FROM lm_keep
            UNION ALL SELECT 'exact_dedup', COUNT(*) FROM exact_keep
            UNION ALL SELECT 'span_filter', COUNT(*) FROM span_keep
            UNION ALL SELECT 'near_dup_removal',
              (SELECT COUNT(*) FROM span_keep
               WHERE doc_id NOT IN (SELECT doc_id FROM losers))
        """,
        # Rerun the IVF probe search independently: candidates from
        # the materialized (assignment ∈ probes) filter, exact cosine
        # + top-k with the id tie-break, all in SQL.
        "ann_ivf": f"""
            WITH probes AS (
              SELECT centroid
              FROM read_parquet('{ORACLE_DIR}/sf0.01/ann_probes/*.parquet')
            ), assign AS (
              SELECT vec_id, centroid
              FROM read_parquet('{ORACLE_DIR}/sf0.01/ann_assign/*.parquet')
            ), q AS (
              SELECT embedding::DOUBLE[] AS qv FROM embeddings
              WHERE vec_id = 0
            ), cand AS (
              SELECT e.vec_id, e.embedding::DOUBLE[] AS v
              FROM embeddings e
              JOIN assign a USING (vec_id)
              JOIN probes p ON a.centroid = p.centroid
            )
            SELECT vec_id,
                   round(list_dot_product(v, qv)
                         / (sqrt(list_dot_product(v, v))
                            * sqrt(list_dot_product(qv, qv))), 6) AS cos
            FROM cand, q
            ORDER BY cos DESC, vec_id
            LIMIT 10
        """,
        # Streaming-vs-batch equivalence: the Spark side went through
        # availableNow micro-batches + checkpointed foreachBatch; the
        # oracle re-extracts the same pages in ONE batch pass and
        # re-aggregates in DuckDB.
        # Replay the stateful streaming dedup's winner selection
        # independently: per-url arg_max on warc_ts over the RAW
        # (duplicate-bearing) pages the stream consumed. warc_ts is
        # unique per url by construction, so the (warc_ts, xxhash64)
        # tie-break never fires and max-ts is the full key.
        "stream_dedup_pages": f"""
            WITH w AS (
              SELECT url, MAX(warc_ts) AS ts,
                     ARG_MAX(text, warc_ts) AS text
              FROM read_parquet(
                '{ORACLE_DIR}/sf0.01/stream_raw_pages/*.parquet')
              GROUP BY url
            )
            SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(COUNT(DISTINCT url) AS BIGINT) AS n_urls,
                   CAST(SUM(CAST(epoch(ts) AS BIGINT)) AS BIGINT) AS sum_ts,
                   CAST(SUM(length(text)) AS BIGINT) AS total_len
            FROM w
        """,
        # Rebuild the node-constructor lexical forms in SQL: integer
        # canonical form, fixed-point decimal with trailing-zero trim
        # (keeping one fractional digit), std-alphabet base64 of the
        # first 8 chars, and the percent-escaped file URIs.
        "kg_node_ctors": """
            SELECT doc_id,
                   CAST(doc_id AS VARCHAR) AS int_lex,
                   CASE WHEN s LIKE '%.'
                        THEN s || '0' ELSE s END AS dec_lex,
                   base64(encode(substr(coalesce(text, ''), 1, 8))) AS b64,
                   'file:///data/doc%20' || doc_id || '.nt' AS file_uri,
                   'file://host.example/data/doc%20' || doc_id || '.nt'
                     AS file_uri_host
            FROM (
              SELECT doc_id, text,
                     regexp_replace(printf('%.2f', doc_id * 0.25),
                                    '0+$', '') AS s
              FROM documents
            )
            ORDER BY doc_id
        """,
        "stream_extract_counts": f"""
            SELECT syntax, rec, COUNT(*) AS n
            FROM read_parquet(
              '{ORACLE_DIR}/sf0.01/stream_batch_extract/*.parquet')
            GROUP BY syntax, rec
            ORDER BY syntax NULLS FIRST, rec NULLS FIRST
        """,
        "q_mm_vp8": f"""
            SELECT qi,
                   COUNT(*) AS n_media,
                   CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
                   CAST(SUM(CASE WHEN dec_sum = exp_sum THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_exact,
                   CAST(SUM(dec_sum) AS BIGINT) AS sum_pixels
            FROM read_parquet('{ORACLE_DIR}/sf0.01/mm_vp8/*.parquet')
            GROUP BY qi
            ORDER BY qi
        """,
        "mm_features": f"""
            SELECT COUNT(*) AS n_media,
                   CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
                   CAST(SUM(CAST(round(feature[1]::DOUBLE * 1000000)
                       AS BIGINT)) AS BIGINT) AS f0_millionths
            FROM read_parquet('{ORACLE_DIR}/sf0.01/mm_features/*.parquet')
        """,
        # Rebuild the probe aggregates from DECLARED metadata (columns
        # that never touched the payload bytes): image dims from the
        # table, MP4 dims/tracks from the synthesis formulas, WAV
        # duration from the integer sample math (n = 8*dur//50 samples
        # at 8 kHz → probed ms = n//8).
        # The entire AllPairs pipeline replayed: shingling, global
        # (df, token) canonical order, per-set integer prefix length,
        # size bound, and DuckDB's own list_intersect verify.
        "q_setsim": """
            WITH d AS (
              SELECT CAST(doc_id AS BIGINT) AS id, text FROM documents
              UNION ALL
              SELECT CAST(doc_id AS BIGINT) + 1000000,
                     text || ' mut alpha beta gama'
              FROM documents WHERE doc_id % 7 = 0
            ), tok AS (
              SELECT id, list_filter(string_split(
                       lower(regexp_replace(trim(text), '\\s+', ' ', 'g')),
                       ' '), x -> x <> '') AS arr
              FROM d
            ), grams AS (
              SELECT id, list_distinct(list_transform(
                       range(1, len(arr) - 1),
                       i -> arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2]))
                       AS st
              FROM tok WHERE len(arr) >= 3
            ), tokx AS (
              SELECT id, unnest(st) AS tk FROM grams
            ), freq AS (
              SELECT tk, CAST(COUNT(*) AS BIGINT) AS c
              FROM tokx GROUP BY tk
            ), ordered AS (
              SELECT id, list(tk ORDER BY c, tk) AS arr,
                     CAST(COUNT(*) AS BIGINT) AS n
              FROM tokx JOIN freq USING (tk) GROUP BY id
            ), pref AS (
              SELECT id, n,
                     unnest(list_slice(arr, 1,
                       CAST(n - ((800 * n + 999) // 1000) + 1 AS INT)))
                       AS tk
              FROM ordered
            ), cand AS (
              SELECT a.id AS id_a, b.id AS id_b,
                     MIN(a.n) AS na, MIN(b.n) AS nb
              FROM pref a JOIN pref b
                ON a.tk = b.tk AND a.id < b.id
              WHERE 1000 * LEAST(a.n, b.n) >= 800 * GREATEST(a.n, b.n)
              GROUP BY a.id, b.id
            ), ver AS (
              SELECT id_a, id_b,
                     CAST(len(list_intersect(oa.arr, ob.arr)) AS BIGINT)
                       AS inter,
                     na, nb
              FROM cand
              JOIN ordered oa ON oa.id = cand.id_a
              JOIN ordered ob ON ob.id = cand.id_b
            )
            SELECT id_a, id_b, inter,
                   na + nb - inter AS uni,
                   CAST(floor(CAST(1000 * inter AS DOUBLE)
                        / (na + nb - inter)) AS BIGINT) AS jac_permille
            FROM ver
            WHERE 1000 * inter >= 800 * (na + nb - inter)
            ORDER BY id_a, id_b
        """,
        # Snippet slices rebuilt with list_slice over the same token
        # arrays (inclusive-end vs Spark's start+length — same span).
        "q_snippets": """
            WITH tok AS (
              SELECT doc_id, list_filter(string_split(
                       lower(regexp_replace(trim(text), '\\s+', ' ', 'g')),
                       ' '), x -> x <> '') AS arr
              FROM documents
            ), m AS (
              SELECT doc_id, arr,
                     list_filter(range(1, len(arr)),
                       i -> arr[i] = 'table' AND arr[i+1] = 'hash')
                       AS hits
              FROM tok WHERE len(arr) >= 2
            )
            SELECT doc_id,
                   CAST(hits[1] AS BIGINT) AS first_pos,
                   array_to_string(list_slice(arr,
                     GREATEST(hits[1] - 3, 1), hits[1] + 4), ' ')
                     AS snippet
            FROM m WHERE len(hits) > 0
            ORDER BY doc_id
        """,
        # Token array + start-offset filter replayed with list ops —
        # same 1-based positions, same overlapping-match semantics.
        "q_phrase": """
            WITH tok AS (
              SELECT doc_id, list_filter(string_split(
                       lower(regexp_replace(trim(text), '\\s+', ' ', 'g')),
                       ' '), x -> x <> '') AS arr
              FROM documents
            ), m AS (
              SELECT doc_id,
                     list_filter(range(1, len(arr)),
                       i -> arr[i] = 'table' AND arr[i+1] = 'hash')
                       AS hits
              FROM tok WHERE len(arr) >= 2
            )
            SELECT doc_id,
                   CAST(len(hits) AS BIGINT) AS n_matches,
                   CAST(hits[1] AS BIGINT) AS first_pos
            FROM m WHERE len(hits) > 0
            ORDER BY doc_id
        """,
        # Full replay of the edit-distance join: same generated names,
        # same deletion-neighborhood blocking, DuckDB's OWN levenshtein
        # — an independent implementation of both stages.
        "q_fuzzy_join": """
            WITH base AS (
              SELECT CAST(c_custkey AS BIGINT) AS id,
                     lower(c_mktsegment) || ' ' ||
                       substr(md5(c_name), 1, 12) AS name
              FROM customer
            ), t AS (
              SELECT id + 1000000 AS tid,
                     CAST(id % 8 + 3 AS INT) AS pos, name
              FROM base WHERE id % 5 = 0
            ), twins AS (
              SELECT tid AS id,
                     substr(name, 1, pos - 1) || substr(name, pos + 1)
                       AS name
              FROM t
            ), names AS (
              SELECT * FROM base UNION ALL SELECT * FROM twins
            ), vars AS (
              SELECT id, name,
                     unnest(list_transform(
                       range(0, length(name) + 1),
                       i -> CASE WHEN i = 0 THEN name
                                 ELSE substr(name, 1, CAST(i AS INT) - 1)
                                      || substr(name, CAST(i AS INT) + 1)
                            END)) AS v
              FROM names
            ), pairs AS (
              SELECT a.id AS id_a, b.id AS id_b,
                     MIN(a.name) AS name_a, MIN(b.name) AS name_b
              FROM vars a JOIN vars b ON a.v = b.v AND a.id < b.id
              GROUP BY a.id, b.id
            )
            SELECT id_a, id_b, name_a, name_b,
                   CAST(levenshtein(name_a, name_b) AS INT) AS dist
            FROM pairs
            WHERE levenshtein(name_a, name_b) <= 1
            ORDER BY id_a, id_b
        """,
        # Declared (charset, text) only — n_exact == n asserts the
        # transcoder recovers the generator's character content on
        # every row; the md5 pin binds the actual string values.
        "q_transcode": f"""
            SELECT charset,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(COUNT(text) AS BIGINT) AS n_text,
                   CAST(COUNT(*) AS BIGINT) AS n_exact,
                   CAST(SUM(CAST('0x' || substr(md5(text), 1, 10)
                                 AS BIGINT)) AS BIGINT) AS pin
            FROM read_parquet('{ORACLE_DIR}/sf0.01/sniff_text/*.parquet')
            GROUP BY charset
            ORDER BY charset
        """,
        # Declared ground truth only — the meta parquet carries zero
        # payload bytes, so matching n_exact == n certifies the
        # byte-level sniffer against the generator on every row.
        "q_sniff": f"""
            SELECT mime, charset,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(COUNT(*) AS BIGINT) AS n_exact
            FROM read_parquet('{ORACLE_DIR}/sf0.01/sniff_meta/*.parquet')
            GROUP BY mime, charset
            ORDER BY mime, charset
        """,
        "mm_probe": f"""
            WITH m AS (
              SELECT media_id,
                     CASE mime WHEN 'image/bmp' THEN 'bmp'
                               WHEN 'image/png' THEN 'png'
                               WHEN 'image/gif' THEN 'gif'
                               WHEN 'image/jpeg' THEN 'jpeg'
                               WHEN 'image/webp' THEN 'webp'
                               WHEN 'audio/wav' THEN 'wav'
                               WHEN 'video/mp4' THEN 'mp4' END AS container,
                     CASE WHEN mime LIKE 'image/%' THEN width
                          WHEN mime = 'video/mp4'
                            THEN 320 + (media_id % 8) * 16 END AS pw,
                     CASE WHEN mime LIKE 'image/%' THEN height
                          WHEN mime = 'video/mp4'
                            THEN 240 + (media_id % 8) * 8 END AS ph,
                     CASE WHEN mime = 'video/mp4' THEN duration_ms
                          WHEN mime = 'audio/wav'
                            THEN ((8 * duration_ms) // 50) // 8
                          END AS pdur,
                     CASE WHEN mime = 'video/mp4'
                            THEN 1 + CASE WHEN media_id % 8 = 0
                                          THEN 0 ELSE 1 END
                          ELSE 1 END AS ptracks
              FROM read_parquet(
                '{ORACLE_DIR}/sf0.01/mm_media_meta/*.parquet')
            )
            SELECT container,
                   CAST(COUNT(*) AS BIGINT) AS n_media,
                   CAST(SUM(pw) AS BIGINT) AS sum_w,
                   CAST(SUM(ph) AS BIGINT) AS sum_h,
                   CAST(SUM(pdur) AS BIGINT) AS sum_dur,
                   CAST(SUM(ptracks) AS BIGINT) AS sum_tracks
            FROM m GROUP BY container ORDER BY container
        """,
        # Rebuild the video sample layout from DECLARED metadata only:
        # 10 fps (100 ms deltas), size_k = 500 + ((id*7 + k*13) % 200),
        # contiguous offsets from 4096 — the generator's ground truth,
        # recomputed without reading a single payload byte. The Spark
        # side recovers the same numbers from stts/stsz/stsc/stco.
        "mm_frames": f"""
            WITH v AS (
              SELECT media_id AS id, duration_ms // 100 AS n
              FROM read_parquet(
                '{ORACLE_DIR}/sf0.01/mm_media_meta/*.parquet')
              WHERE kind = 'video'
            ), frames AS (
              SELECT id, unnest(generate_series(0, n - 1)) AS k FROM v
            ), sized AS (
              SELECT id, k,
                     500 + ((id * 7 + k * 13) % 200) AS sz
              FROM frames
            ), offs AS (
              SELECT id, k, sz,
                     4096 + CAST(COALESCE(SUM(sz) OVER (
                       PARTITION BY id ORDER BY k
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), 0) AS BIGINT) AS off
              FROM sized
            ), sampled AS (
              SELECT id,
                     unnest(generate_series(0, (n - 1) * 100, 1000))
                       // 100 AS k
              FROM v
            )
            SELECT s.id AS media_id,
                   CAST(COUNT(*) AS BIGINT) AS n_sampled,
                   CAST(MAX(s.k) AS BIGINT) AS max_frame,
                   CAST(SUM(o.sz) AS BIGINT) AS sum_bytes,
                   CAST(MAX(o.off + o.sz) AS BIGINT) AS max_end_off
            FROM sampled s
            JOIN offs o ON o.id = s.id AND o.k = s.k
            GROUP BY s.id
        """,
        # Frame DECODE: structure (how many instants sample which
        # frame at what dimensions) recomputed from the generator
        # formulas alone — 4+id%5 frames at 200 ms deltas sampled
        # every 300 ms, dims 16+(id%3)*8 × 16+(id%2)*8 — while the
        # luminance sums re-aggregate the materialized per-frame rows
        # (pixel truth has no SQL formula; determinism is the claim).
        "mm_frame_decode": f"""
            WITH f AS (
              SELECT media_id,
                     CAST(SUM(lum_mean_u) AS BIGINT) AS sum_lum_mean_u,
                     CAST(SUM(lum_std_u) AS BIGINT) AS sum_lum_std_u
              FROM read_parquet(
                '{ORACLE_DIR}/sf0.01/mm_frame_decode/*.parquet')
              GROUP BY media_id
            ), m AS (
              SELECT media_id, 4 + media_id % 5 AS n_f FROM f
            )
            SELECT m.media_id,
                   CAST((200 * (n_f - 1)) // 300 + 1 AS BIGINT)
                     AS n_sampled,
                   CAST((300 * ((200 * (n_f - 1)) // 300)) // 200
                     AS BIGINT) AS max_frame,
                   CAST(16 + (m.media_id % 3) * 8 AS BIGINT) AS fw,
                   CAST(16 + (m.media_id % 2) * 8 AS BIGINT) AS fh,
                   f.sum_lum_mean_u, f.sum_lum_std_u
            FROM m JOIN f USING (media_id)
        """,
        # Round-trip INVARIANT oracles: the writer→parser fixpoint must
        # hold for EVERY statement/document, so the expected counts are
        # exactly the triple-table counts DuckDB derives independently —
        # one lost or mutated statement breaks the hash compare.
        "kg_roundtrip": f"""
            SELECT COUNT(*) AS n_lines, COUNT(*) AS n_roundtrip
            FROM read_parquet('{ORACLE_DIR}/sf0.01/triples/*.parquet')
        """,
        "kg_turtle": f"""
            SELECT COUNT(DISTINCT url) AS n_docs,
                   COUNT(DISTINCT url) AS n_roundtrip
            FROM read_parquet('{ORACLE_DIR}/sf0.01/triples/*.parquet')
        """,
        # Independent connected-components over the materialized
        # verified-link edges: reachability closure via recursive CTE,
        # canon = min reachable node — must equal Spark's union-find /
        # pointer-jumping label propagation exactly.
        "kg_linking": f"""
            WITH RECURSIVE l AS (
              SELECT entity_a, entity_b
              FROM read_parquet('{ORACLE_DIR}/sf0.01/links/*.parquet')
            ), edges AS (
              SELECT entity_a AS a, entity_b AS b FROM l
              UNION
              SELECT entity_b AS a, entity_a AS b FROM l
            ), reach(entity, r) AS (
              SELECT DISTINCT a, a FROM edges
              UNION
              SELECT e.a, reach.r FROM edges e
              JOIN reach ON reach.entity = e.b
            ), labels AS (
              SELECT entity, MIN(r) AS canon FROM reach GROUP BY entity
            )
            SELECT canon, COUNT(*) AS n_members
            FROM labels GROUP BY canon
            HAVING COUNT(*) > 1
            ORDER BY n_members DESC, canon
            LIMIT 50
        """,
        # Same closure, over the edge list the distributed-CC run
        # materialized — certifies linking.py's pointer-jumping path.
        "kg_linking_dist": f"""
            WITH RECURSIVE l AS (
              SELECT entity_a, entity_b
              FROM read_parquet('{ORACLE_DIR}/sf0.01/links_dist/*.parquet')
            ), edges AS (
              SELECT entity_a AS a, entity_b AS b FROM l
              UNION
              SELECT entity_b AS a, entity_a AS b FROM l
            ), reach(entity, r) AS (
              SELECT DISTINCT a, a FROM edges
              UNION
              SELECT e.a, reach.r FROM edges e
              JOIN reach ON reach.entity = e.b
            ), labels AS (
              SELECT entity, MIN(r) AS canon FROM reach GROUP BY entity
            )
            SELECT canon, COUNT(*) AS n_members
            FROM labels GROUP BY canon
            HAVING COUNT(*) > 1
            ORDER BY n_members DESC, canon
            LIMIT 50
        """,
        "kg_hub_salting": f"""
            SELECT (salt > 0) AS is_salted, COUNT(*) AS n_rows,
                   COUNT(DISTINCT salt) AS n_salts,
                   COUNT(DISTINCT subj_bucket) AS n_buckets
            FROM read_parquet('{ORACLE_DIR}/sf0.01/bucketed/*.parquet')
            GROUP BY 1 ORDER BY 1
        """,
        # Replay the full MinHash+LSH candidate pipeline from the
        # materialized signatures/band hashes: bucket-cap pruning
        # (max_bucket=1024), band equi-join, exact signature-agreement
        # Jaccard estimate, threshold 0.5 — all independently in SQL.
        "dedup_minhash_lsh": f"""
            WITH bands AS (
              SELECT entity, band, band_hash
              FROM read_parquet('{ORACLE_DIR}/sf0.01/minhash/bands/*.parquet')
            ), sigs AS (
              SELECT entity, sig
              FROM read_parquet('{ORACLE_DIR}/sf0.01/minhash/sigs/*.parquet')
            ), counts AS (
              SELECT band, band_hash, COUNT(*) AS m
              FROM bands GROUP BY band, band_hash
            ), pruned AS (
              SELECT b.entity, b.band, b.band_hash
              FROM bands b JOIN counts c USING (band, band_hash)
              WHERE c.m <= 1024
            ), pairs AS (
              SELECT DISTINCT a.entity AS entity_a, b.entity AS entity_b
              FROM pruned a JOIN pruned b USING (band, band_hash)
              WHERE a.entity < b.entity
            )
            SELECT p.entity_a, p.entity_b,
                   len(list_filter(list_zip(sa.sig, sb.sig),
                                   x -> x[1] = x[2])) / 64.0 AS jaccard_est
            FROM pairs p
            JOIN sigs sa ON sa.entity = p.entity_a
            JOIN sigs sb ON sb.entity = p.entity_b
            WHERE len(list_filter(list_zip(sa.sig, sb.sig),
                                  x -> x[1] = x[2])) / 64.0 >= 0.5
            ORDER BY entity_a, entity_b
        """,
        # Token entropy: (doc, token) counts, per-term micro rounding,
        # integer-div floor — all from raw text.
        "q_entropy": """
            WITH w AS (
              SELECT doc_id, unnest(list_filter(string_split(
                       lower(regexp_replace(trim(text), '\\s+', ' ', 'g')),
                       ' '), x -> x <> '')) AS w
              FROM documents
            ), counts AS (
              SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS c
              FROM w GROUP BY doc_id, w
            ), totals AS (
              SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_toks,
                     CAST(COUNT(*) AS BIGINT) AS n_types
              FROM counts GROUP BY doc_id
            ), terms AS (
              SELECT c.doc_id, t.n_toks, t.n_types,
                     CAST(round(CAST(c.c AS DOUBLE)
                                * ln(CAST(t.n_toks AS DOUBLE)
                                     / CAST(c.c AS DOUBLE))
                                * 1000000) AS BIGINT) AS term
              FROM counts c JOIN totals t USING (doc_id)
            )
            SELECT doc_id, n_toks, n_types,
                   CAST(CAST(SUM(term) AS BIGINT) // n_toks AS BIGINT)
                     AS entropy_micros
            FROM terms GROUP BY doc_id, n_toks, n_types
        """,
        # Blocklist filter: gazetteer-style matching + token counts +
        # the integer div density and flag, all replayed.
        "q_blocklist": f"""
            WITH tok AS (
              SELECT doc_id,
                     list_filter(string_split(
                       lower(regexp_replace(trim(text), '\\s+', ' ', 'g')),
                       ' '), x -> x <> '') AS arr
              FROM documents
            ), n AS (
              SELECT doc_id, CAST(len(arr) AS BIGINT) AS n_toks
              FROM tok WHERE len(arr) >= 1
            ), uni AS (
              SELECT doc_id, unnest(arr) AS g FROM tok
            ), bi AS (
              SELECT doc_id, arr[i.x] || ' ' || arr[i.x + 1] AS g
              FROM tok, LATERAL (
                SELECT unnest(range(1, len(arr))) AS x) i
            ), cand AS (
              SELECT doc_id, g FROM uni
              UNION ALL SELECT doc_id, g FROM bi
            ), dict(entity) AS (
              VALUES {", ".join("('" + e + "')" for e in _BLOCKLIST)}
            ), hits AS (
              SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
              FROM cand c JOIN dict d ON c.g = d.entity
              GROUP BY c.doc_id
            )
            SELECT n.doc_id, n.n_toks,
                   CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
                   CAST((COALESCE(h.n_hits, 0) * 1000000) // n.n_toks
                        AS BIGINT) AS hits_ppm,
                   CAST(CASE WHEN (COALESCE(h.n_hits, 0) * 1000000)
                                  // n.n_toks > 60000
                             THEN 1 ELSE 0 END AS INT) AS dropped
            FROM n LEFT JOIN hits h USING (doc_id)
        """,
        # Rare-token masking: keep-vocab, positional re-mask, and the
        # order-pinned string_agg md5 all rebuilt from raw text.
        "q_rare_mask": """
            WITH tok AS (
              SELECT doc_id,
                     list_filter(string_split(
                       lower(regexp_replace(trim(text), '\\s+', ' ', 'g')),
                       ' '), x -> x <> '') AS arr
              FROM documents
            ), pos AS (
              SELECT doc_id, i.x - 1 AS pos, arr[i.x] AS w
              FROM tok, LATERAL (
                SELECT unnest(range(1, len(arr) + 1)) AS x) i
            ), keep AS (
              SELECT w FROM pos GROUP BY w HAVING COUNT(*) >= 30
            ), m AS (
              SELECT p.doc_id, p.pos,
                     CASE WHEN k.w IS NOT NULL THEN p.w
                          ELSE '<unk>' END AS mw,
                     CASE WHEN k.w IS NULL THEN 1 ELSE 0 END AS is_m
              FROM pos p LEFT JOIN keep k ON p.w = k.w
            )
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_toks,
                   CAST(SUM(is_m) AS BIGINT) AS n_masked,
                   md5(string_agg(mw, ' ' ORDER BY pos)) AS masked_md5
            FROM m GROUP BY doc_id
        """,
        # Crawl stats: per-url fetch log collapsed, host re-derived
        # with the shared pattern, both aggregate levels replayed;
        # timestamps compared as integer epoch seconds.
        "q_crawl": f"""
            WITH per_url AS (
              SELECT url,
                     CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(MIN(epoch(warc_ts)) AS BIGINT) AS t0,
                     CAST(MAX(epoch(warc_ts)) AS BIGINT) AS t1
              FROM read_parquet('{ORACLE_DIR}/sf0.01/pages_crawl/*.parquet')
              GROUP BY url
            )
            SELECT lower(regexp_extract(url,
                     '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)', 1)) AS host,
                   CAST(COUNT(*) AS BIGINT) AS n_urls,
                   CAST(SUM(n) AS BIGINT) AS n_fetches,
                   CAST(SUM(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_refetched,
                   CAST(SUM(t1 - t0) AS BIGINT) AS sum_gap_sec
            FROM per_url GROUP BY host
        """,
        # Pair mining: the dedup_minhash_lsh replay with a lower
        # verify floor and the pos/hard_neg label CASE.
        "q_pair_mining": f"""
            WITH bands AS (
              SELECT entity, band, band_hash
              FROM read_parquet('{ORACLE_DIR}/sf0.01/minhash/bands/*.parquet')
            ), sigs AS (
              SELECT entity, sig
              FROM read_parquet('{ORACLE_DIR}/sf0.01/minhash/sigs/*.parquet')
            ), counts AS (
              SELECT band, band_hash, COUNT(*) AS m
              FROM bands GROUP BY band, band_hash
            ), pruned AS (
              SELECT b.entity, b.band, b.band_hash
              FROM bands b JOIN counts c USING (band, band_hash)
              WHERE c.m <= 1024
            ), pairs AS (
              SELECT DISTINCT a.entity AS entity_a, b.entity AS entity_b
              FROM pruned a JOIN pruned b USING (band, band_hash)
              WHERE a.entity < b.entity
            ), est AS (
              SELECT p.entity_a, p.entity_b,
                     len(list_filter(list_zip(sa.sig, sb.sig),
                                     x -> x[1] = x[2])) / 64.0 AS j
              FROM pairs p
              JOIN sigs sa ON sa.entity = p.entity_a
              JOIN sigs sb ON sb.entity = p.entity_b
            )
            SELECT CAST(entity_a AS BIGINT) AS id_a,
                   CAST(entity_b AS BIGINT) AS id_b,
                   j AS jaccard_est,
                   CASE WHEN j >= 0.5 THEN 'pos'
                        ELSE 'hard_neg' END AS label
            FROM est WHERE j >= 0.25
        """,
        # Heavy hitters: the oracle is the NAIVE exact aggregate the
        # sketch-filtered two-pass plan must equal (no false negatives
        # by est >= exact; false positives removed by the exact pass).
        "q_heavy_hitters": """
            WITH w AS (
              SELECT unnest(string_split(
                lower(regexp_replace(trim(text), '\\s+', ' ', 'g')),
                ' ')) AS w
              FROM documents
            )
            SELECT w, CAST(COUNT(*) AS BIGINT) AS n
            FROM w WHERE w <> ''
            GROUP BY w HAVING COUNT(*) >= 500
            ORDER BY n DESC, w ASC
        """,
        # Audio energy: every PCM sample regenerated from the integer
        # sawtooth formula with generate_series, then re-windowed —
        # the Spark side got them through real WAV bytes.
        "q_mm_audio": f"""
            WITH m AS (
              SELECT i AS media_id, 400 + (i * 37) % 800 AS n,
                     1 + i % 7 AS step, i % 100 AS phase
              FROM (SELECT unnest(generate_series(
                     0, {max(16, _n_pages("sf0.01") // 64) - 1})) AS i)
            ), s AS (
              SELECT media_id, jj.j,
                     ((phase + jj.j * step) * 97) % 24001 - 12000 AS v
              FROM m, LATERAL (
                SELECT unnest(generate_series(0, n - 1)) AS j) jj
            )
            SELECT media_id, CAST(j // 100 AS BIGINT) AS win,
                   CAST(COUNT(*) AS BIGINT) AS n_samples,
                   CAST(SUM(v * v) AS BIGINT) AS energy
            FROM s GROUP BY media_id, (j // 100)
        """,
        # Image dHash groups: pivot + xor/bit_count replayed from the
        # materialized per-image hashes (the hash layer is certified
        # by unit tests + the cross-format lossless_match itself).
        "q_mm_dhash": f"""
            WITH d AS (
              SELECT media_id, dhash
              FROM read_parquet('{ORACLE_DIR}/sf0.01/mm_dhash/*.parquet')
            ), g AS (
              SELECT media_id // 4 AS group_id, media_id % 4 AS v, dhash
              FROM d
            ), p AS (
              SELECT group_id,
                     MAX(CASE WHEN v = 0 THEN dhash END) AS h0,
                     MAX(CASE WHEN v = 1 THEN dhash END) AS h1,
                     MAX(CASE WHEN v = 2 THEN dhash END) AS h2,
                     MAX(CASE WHEN v = 3 THEN dhash END) AS h3
              FROM g GROUP BY group_id
            )
            SELECT group_id,
                   CAST(CASE WHEN h0 = h1 THEN 1 ELSE 0 END AS INT)
                     AS lossless_match,
                   CAST(bit_count(xor(h0, h2)) AS BIGINT) AS jpeg_hamming,
                   CAST(bit_count(xor(h0, h3)) AS BIGINT)
                     AS control_hamming
            FROM p
        """,
        # Dup clusters: LSH pair replay (as dedup_minhash_lsh) closed
        # by the recursive reachability CTE, min-STRING canon (the
        # linking contract), singleton rejoin, sizes and flags.
        "q_dup_clusters": f"""
            WITH RECURSIVE bands AS (
              SELECT entity, band, band_hash
              FROM read_parquet('{ORACLE_DIR}/sf0.01/minhash/bands/*.parquet')
            ), sigs AS (
              SELECT entity, sig
              FROM read_parquet('{ORACLE_DIR}/sf0.01/minhash/sigs/*.parquet')
            ), counts AS (
              SELECT band, band_hash, COUNT(*) AS m
              FROM bands GROUP BY band, band_hash
            ), pruned AS (
              SELECT b.entity, b.band, b.band_hash
              FROM bands b JOIN counts c USING (band, band_hash)
              WHERE c.m <= 1024
            ), vp AS (
              SELECT DISTINCT a.entity AS entity_a, b.entity AS entity_b
              FROM pruned a JOIN pruned b USING (band, band_hash)
              WHERE a.entity < b.entity
            ), verified AS (
              SELECT p.entity_a, p.entity_b
              FROM vp p
              JOIN sigs sa ON sa.entity = p.entity_a
              JOIN sigs sb ON sb.entity = p.entity_b
              WHERE len(list_filter(list_zip(sa.sig, sb.sig),
                                    x -> x[1] = x[2])) / 64.0 >= 0.5
            ), edges AS (
              SELECT entity_a AS a, entity_b AS b FROM verified
              UNION
              SELECT entity_b AS a, entity_a AS b FROM verified
            ), reach(entity, r) AS (
              SELECT DISTINCT a, a FROM edges
              UNION
              SELECT e.a, reach.r FROM edges e
              JOIN reach ON reach.entity = e.b
            ), labels AS (
              SELECT entity, MIN(r) AS canon FROM reach GROUP BY entity
            ), asg AS (
              SELECT d.doc_id,
                     CAST(COALESCE(l.canon, CAST(d.doc_id AS VARCHAR))
                          AS BIGINT) AS canon_id
              FROM documents d
              LEFT JOIN labels l ON l.entity = CAST(d.doc_id AS VARCHAR)
            ), sizes AS (
              SELECT canon_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
              FROM asg GROUP BY canon_id
            )
            SELECT a.doc_id, a.canon_id, s.cluster_size,
                   CAST(CASE WHEN a.doc_id = a.canon_id THEN 1 ELSE 0 END
                        AS INT) AS is_canonical
            FROM asg a JOIN sizes s USING (canon_id)
        """,
        "q_domain_cap": """
            SELECT doc_id, source, n_chars, CAST(rank AS INTEGER) AS rank
            FROM (
              SELECT doc_id, source, n_chars,
                     row_number() OVER (
                       PARTITION BY source
                       ORDER BY n_chars DESC, doc_id ASC) AS rank
              FROM documents
            ) WHERE rank <= 10
        """,
        # Line-level boilerplate removal replay: re-split the
        # materialized (url, text) by chr(10), count (host, RAW line)
        # document frequencies (Spark keys on xxhash64 — identical
        # absent collisions, absent at oracle scale), rebuild each
        # cleaned document with an ordered string_agg. COALESCE('')
        # matches Spark's md5 of the empty join when nothing survives.
        "q_line_dedup": f"""
            WITH pt AS (
              SELECT url,
                     lower(regexp_extract(url,
                       '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)', 1)) AS host,
                     string_split(text, chr(10)) AS ls
              FROM read_parquet('{ORACLE_DIR}/sf0.01/pages_text/*.parquet')
            ), lines AS (
              SELECT url, host, i - 1 AS pos, ls[i] AS line
              FROM (SELECT url, host, ls,
                           unnest(generate_series(1, len(ls))) AS i
                    FROM pt)
            ), hot AS (
              SELECT host, line FROM lines
              GROUP BY host, line HAVING COUNT(DISTINCT url) > 2
            ), flagged AS (
              SELECT l.url, l.pos, l.line,
                     (h.line IS NOT NULL) AS is_hot
              FROM lines l LEFT JOIN hot h
                ON h.host = l.host AND h.line = l.line
            )
            SELECT url, CAST(COUNT(*) AS BIGINT) AS n_lines,
                   CAST(SUM(CASE WHEN is_hot THEN 0 ELSE 1 END) AS BIGINT)
                     AS n_kept,
                   md5(COALESCE(string_agg(
                     CASE WHEN is_hot THEN NULL ELSE line END,
                     chr(10) ORDER BY pos), '')) AS kept_md5
            FROM flagged GROUP BY url
        """,
        # Cross-snapshot incremental dedup: the exact stage is replayed
        # from raw text (md5 fingerprints); the near stage from the
        # materialized signatures/bands — hot-bucket prune (counted
        # AFTER removing exact-dup new docs, as the operator never
        # signs them), NEW x OLD band join, agreement verify, and the
        # (jaccard DESC, old id ASC) best-match window. agree/64 is a
        # power-of-two fraction: exact in double on both engines.
        "q_dedup_incremental": f"""
            WITH newd AS (
              SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
              UNION ALL
              SELECT doc_id + 100000 AS doc_id, text FROM documents
              WHERE doc_id % 3 <> 0 AND doc_id % 17 = 1
            ), oldd AS (
              SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0
            ), fp_new AS (
              SELECT doc_id,
                     md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))
                       AS fp
              FROM newd
            ), fp_old AS (
              SELECT md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))
                       AS fp,
                     MIN(doc_id) AS exact_id
              FROM oldd GROUP BY 1
            ), exact AS (
              SELECT n.doc_id, o.exact_id FROM fp_new n JOIN fp_old o USING (fp)
            ), bn0 AS (
              SELECT b.entity, b.band, b.band_hash
              FROM read_parquet('{ORACLE_DIR}/sf0.01/inc/bands_new/*.parquet') b
              WHERE CAST(b.entity AS BIGINT) NOT IN (SELECT doc_id FROM exact)
            ), bo0 AS (
              SELECT entity, band, band_hash
              FROM read_parquet('{ORACLE_DIR}/sf0.01/inc/bands_old/*.parquet')
            ), bn AS (
              SELECT b.* FROM bn0 b JOIN (
                SELECT band, band_hash FROM bn0 GROUP BY 1, 2
                HAVING COUNT(*) <= 1024
              ) k USING (band, band_hash)
            ), bo AS (
              SELECT b.* FROM bo0 b JOIN (
                SELECT band, band_hash FROM bo0 GROUP BY 1, 2
                HAVING COUNT(*) <= 1024
              ) k USING (band, band_hash)
            ), cand AS (
              SELECT DISTINCT n.entity, o.entity AS entity_old
              FROM bn n JOIN bo o USING (band, band_hash)
            ), near0 AS (
              SELECT CAST(c.entity AS BIGINT) AS doc_id,
                     CAST(c.entity_old AS BIGINT) AS oid,
                     len(list_filter(list_zip(a.sig, b.sig),
                                     x -> x[1] = x[2])) / 64.0 AS j
              FROM cand c
              JOIN read_parquet('{ORACLE_DIR}/sf0.01/inc/sigs_new/*.parquet') a
                ON a.entity = c.entity
              JOIN read_parquet('{ORACLE_DIR}/sf0.01/inc/sigs_old/*.parquet') b
                ON b.entity = c.entity_old
            ), near AS (
              SELECT doc_id, oid, j FROM (
                SELECT *, row_number() OVER (
                  PARTITION BY doc_id ORDER BY j DESC, oid ASC) AS rn
                FROM near0 WHERE j >= 0.5
              ) WHERE rn = 1
            )
            SELECT n.doc_id,
                   CASE WHEN e.exact_id IS NOT NULL THEN 'exact'
                        WHEN nr.oid IS NOT NULL THEN 'near'
                        ELSE 'kept' END AS status,
                   COALESCE(e.exact_id, nr.oid) AS match_id,
                   CASE WHEN e.exact_id IS NULL THEN nr.j END AS jaccard_est
            FROM newd n
            LEFT JOIN exact e ON e.doc_id = n.doc_id
            LEFT JOIN near nr ON nr.doc_id = n.doc_id
        """,
        # Replay the hyperplane-LSH bucket join + exact cosine over the
        # materialized bucket assignment (planes are seed-deterministic,
        # so the Spark recompute must land in the same buckets).
        "dedup_embedding": f"""
            WITH bk AS (
              SELECT vec_id, bucket
              FROM read_parquet('{ORACLE_DIR}/sf0.01/emb_buckets/*.parquet')
            ), e AS (
              SELECT em.vec_id, bk.bucket, em.embedding::DOUBLE[] AS v
              FROM embeddings em JOIN bk USING (vec_id)
            )
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(
                     list_dot_product(a.v, b.v)
                     / (sqrt(list_dot_product(a.v, a.v))
                        * sqrt(list_dot_product(b.v, b.v))), 6) AS cos
            FROM e a JOIN e b ON a.bucket = b.bucket
                             AND a.vec_id < b.vec_id
            WHERE round(
                    list_dot_product(a.v, b.v)
                    / (sqrt(list_dot_product(a.v, a.v))
                       * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.4
            ORDER BY id_a, id_b
        """,
        # Brute-force all-pairs Hamming over the materialized SimHash
        # signatures: independently certifies that the Spark chunk-LSH
        # join recovers EVERY Hamming-<=3 pair (recall guarantee).
        "dedup_simhash": f"""
            WITH s AS (
              SELECT doc_id, simhash
              FROM read_parquet('{ORACLE_DIR}/sf0.01/simhash_sigs/*.parquet')
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER)
                     AS hamming
            FROM s a JOIN s b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
            ORDER BY id_a, id_b
        """,
        "q_filter_project": """
            SELECT l_orderkey, l_linenumber,
                   CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
                     AS gross_cents
            FROM lineitem
            WHERE l_quantity > 45 AND l_shipdate >= TIMESTAMP '1995-01-01'
        """,
        "q_agg_pricing": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                   CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                     AS sum_base_cents,
                   CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
                     AS BIGINT) AS sum_disc_cents,
                   COUNT(*) AS count_order
            FROM lineitem
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "q_join_agg": """
            SELECT c_mktsegment,
                   COUNT(*) AS n_orders,
                   CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                     AS revenue_cents
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment ORDER BY c_mktsegment
        """,
        "q_multi_join": """
            SELECT r_name, n_name,
                   CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                     AS BIGINT)) AS BIGINT) AS revenue_cents
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation   ON c_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            GROUP BY r_name, n_name ORDER BY r_name, n_name
        """,
        "q_window_toporder": """
            SELECT o_custkey, o_orderkey,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS top_cents
            FROM (
              SELECT *, row_number() OVER (
                PARTITION BY o_custkey
                ORDER BY o_totalprice DESC, o_orderkey
              ) AS rn FROM orders
            ) WHERE rn = 1
        """,
        "q_topk_orders": """
            SELECT o_orderkey,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
            FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
        """,
        "q_set_ops": """
            SELECT 'no_orders' AS tag, c_custkey FROM (
              SELECT c_custkey FROM customer
              EXCEPT SELECT o_custkey AS c_custkey FROM orders
            )
            UNION ALL
            SELECT 'has_orders' AS tag, c_custkey FROM (
              SELECT c_custkey FROM customer
              INTERSECT SELECT o_custkey AS c_custkey FROM orders
            )
        """,
        "q_rollup": """
            SELECT o_orderpriority, o_orderstatus,
                   COUNT(*) AS n_orders,
                   CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                     AS sum_cents
            FROM orders
            GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
            ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST
        """,
        "q_events_hourly": """
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
                     AS hour_start,
                   event_type,
                   COUNT(*) AS n_events,
                   CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                     AS value_cents
            FROM events
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "q_events_latest": """
            SELECT user_id, event_id,
                   strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str
            FROM (
              SELECT *, row_number() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC
              ) AS rn FROM events
            ) WHERE rn = 1
        """,
        "q_sessionize": """
            SELECT user_id,
                   CAST(SUM(CASE WHEN prev_us IS NULL
                             OR epoch_us(ts) - prev_us > 1800 * 1000000
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
                   COUNT(*) AS n_events
            FROM (
              SELECT user_id, ts,
                     lag(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts
                     ) AS prev_us
              FROM events
            )
            GROUP BY user_id ORDER BY user_id
        """,
        "q_dedup_exact": """
            SELECT md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp,
                   MIN(doc_id) AS rep_id,
                   COUNT(*) AS n_dups
            FROM documents GROUP BY 1 ORDER BY 1
        """,
        "q_token_stats": """
            SELECT doc_id,
                   CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                   END AS n_tokens,
                   len(regexp_extract_all(text,
                       '[A-Za-z]+|[0-9]+|[^\\sA-Za-z0-9]')) AS n_pieces,
                   length(trim(text)) AS n_chars_trim
            FROM documents
        """,
        "q_lang_id": f"""
            SELECT doc_id, {_lang_case_sql()} AS lang_pred FROM documents
        """,
        "q_quality": """
            SELECT doc_id,
                   length(text) AS q_chars,
                   CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                   END AS q_tokens,
                   round(
                     (length(text) - length(regexp_replace(text,
                         '[^\\s\\p{L}\\p{N}]', '', 'g')))
                     / greatest(length(text), 1)::DOUBLE, 6) AS q_punct_ratio,
                   round(
                     len(regexp_extract_all(text, '(?i)\\b(the|and|of|to|is)\\b'))
                     / greatest(CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                        END, 1)::DOUBLE, 6) AS q_stopword_ratio,
                   round(
                     length(regexp_replace(text, '\\s+', '', 'g'))
                     / greatest(CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                        END, 1)::DOUBLE, 6) AS q_mean_word_len
            FROM documents
        """,
        "q_fingerprint": """
            SELECT doc_id,
                   md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))
                     AS fp_md5
            FROM documents
        """,
        "q_repetition": """
            WITH base AS (
              SELECT doc_id,
                     CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                     END AS n,
                     regexp_split_to_array(trim(text), '\\s+') AS t,
                     string_split(text, chr(10)) AS lines
              FROM documents
            ), g AS (
              SELECT doc_id, n, t, lines,
                     CASE WHEN n >= 2 THEN list_transform(range(1, n),
                         i -> t[i] || ' ' || t[i+1]) ELSE [] END AS g2,
                     CASE WHEN n >= 3 THEN list_transform(range(1, n - 1),
                         i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                        ELSE [] END AS g3
              FROM base
            ), top2 AS (
              -- most-frequent-2-gram multiplicity, replayed the
              -- relational way (unnest + group) rather than Spark's
              -- sorted-array fold — independent formulation, same value
              SELECT doc_id, max(c) AS mx FROM (
                SELECT doc_id, gram, count(*) AS c
                FROM (SELECT doc_id, unnest(g2) AS gram FROM g)
                GROUP BY 1, 2
              ) GROUP BY 1
            )
            SELECT g.doc_id,
                   CAST(n AS BIGINT) AS r_tokens,
                   CASE WHEN n = 0 THEN 0.0
                        ELSE round(len(list_distinct(t)) / n::DOUBLE, 6)
                   END AS r_ttr,
                   round(coalesce(top2.mx, 0)
                         / greatest(len(g2), 1)::DOUBLE, 6) AS r_top2gram_frac,
                   round((len(g3) - len(list_distinct(g3)))
                         / greatest(len(g3), 1)::DOUBLE, 6) AS r_dup3gram_frac,
                   round((len(lines) - len(list_distinct(lines)))
                         / greatest(len(lines), 1)::DOUBLE, 6) AS r_dup_line_frac
            FROM g LEFT JOIN top2 ON top2.doc_id = g.doc_id
        """,
        "q_pii": """
            WITH aug AS (
              SELECT doc_id,
                     text || ' contact user' || CAST(doc_id AS VARCHAR)
                          || '@mail.example.com or 415-555-'
                          || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                          || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                          || '.7' AS t
              FROM documents
            )
            SELECT doc_id,
                   CAST(len(regexp_extract_all(t,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
                     AS BIGINT) AS pii_email,
                   CAST(len(regexp_extract_all(t,
                     '\\b\\d{3}-\\d{3}-\\d{4}\\b')) AS BIGINT) AS pii_phone,
                   CAST(len(regexp_extract_all(t,
                     '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b'))
                     AS BIGINT) AS pii_ipv4,
                   CAST(length(regexp_replace(regexp_replace(regexp_replace(t,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                     '<EMAIL>', 'g'),
                     '\\b\\d{3}-\\d{3}-\\d{4}\\b', '<PHONE>', 'g'),
                     '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b',
                     '<IP>', 'g')) AS BIGINT) AS redacted_len
            FROM aug
        """,
        "q_ngram_jaccard": grams_cte + """
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   round(len(list_intersect(a.gr, b.gr))
                         / len(list_distinct(list_concat(a.gr, b.gr)))::DOUBLE,
                         6) AS jaccard
            FROM grams a JOIN grams b ON b.doc_id = a.doc_id + 1
            ORDER BY a.doc_id
        """,
        "q_minhash_md5": """
            WITH norm AS (
              SELECT doc_id,
                     lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t
              FROM documents
            ), expanded AS (
              SELECT doc_id, t, unnest(generate_series(1, length(t) - 2)) AS i
              FROM norm WHERE length(t) >= 3
            ), grams AS (
              SELECT doc_id, substring(t, i::INT, 3) AS gram FROM expanded
              UNION ALL
              -- mirror Spark char_ngrams' short-text case (whole string)
              SELECT doc_id, t AS gram FROM norm WHERE length(t) < 3
            )
            SELECT doc_id,
                   MIN(md5(gram || '0')) AS h0,
                   MIN(md5(gram || '1')) AS h1,
                   MIN(md5(gram || '2')) AS h2,
                   MIN(md5(gram || '3')) AS h3
            FROM grams GROUP BY doc_id ORDER BY doc_id
        """,
        "q_cosine_topk": """
            WITH q AS (
              SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0
            )
            SELECT e.vec_id,
                   round(
                     list_dot_product(e.embedding::DOUBLE[], q.qv)
                     / (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                              e.embedding::DOUBLE[]))
                        * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos
            FROM embeddings e, q
            ORDER BY cos DESC, e.vec_id LIMIT 10
        """,
        "q_embedding_dups": """
            WITH e AS (
              SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
            )
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(
                     list_dot_product(a.v, b.v)
                     / (sqrt(list_dot_product(a.v, a.v))
                        * sqrt(list_dot_product(b.v, b.v))), 6) AS cos
            FROM e a, e b
            WHERE a.vec_id < b.vec_id
              AND round(
                    list_dot_product(a.v, b.v)
                    / (sqrt(list_dot_product(a.v, a.v))
                       * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.45
        """,
        "q_knn_join": """
            WITH qs AS (
              SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv
              FROM embeddings WHERE vec_id < 5
            ), scored AS (
              SELECT qs.q_id, e.vec_id AS n_id,
                     round(
                       list_dot_product(e.embedding::DOUBLE[], qs.qv)
                       / (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                                e.embedding::DOUBLE[]))
                          * sqrt(list_dot_product(qs.qv, qs.qv))), 6) AS cos
              FROM qs, embeddings e WHERE e.vec_id != qs.q_id
            )
            SELECT q_id, n_id, cos FROM (
              SELECT *, row_number() OVER (
                PARTITION BY q_id ORDER BY cos DESC, n_id
              ) AS rn FROM scored
            ) WHERE rn <= 3
        """,
        # Re-shingle the corpus and rebuild the span frequency table
        # INDEPENDENTLY (DuckDB list slicing vs Spark transform/slice).
        # The mirror keys spans by their raw gram TEXT while Spark keys
        # by xxhash64 — equivalent counts absent hash collisions, which
        # are provably absent at oracle scale (see corpus.span_hashes).
        # Exact-substring removal: winner-keeps semantics replayed on
        # raw grams — per-span (count, first-occurrence) via windows,
        # k-wide coverage expansion per removed occurrence, distinct
        # union, anti-join, ORDER BY-pinned reassembly + md5.
        "q_span_strip": """
            WITH norm AS (
              SELECT doc_id,
                     lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t
              FROM documents
            ), toks AS (
              SELECT doc_id, t, string_split(t, ' ') AS w FROM norm
            ), expanded AS (
              SELECT doc_id, w,
                     unnest(generate_series(1, len(w) - 9)) AS i
              FROM toks WHERE len(w) >= 10
            ), occ AS (
              SELECT doc_id, i,
                     array_to_string(w[i : i + 9], ' ') AS span
              FROM expanded
              UNION ALL
              SELECT doc_id, 1 AS i, t AS span FROM toks WHERE len(w) < 10
            ), ranked AS (
              SELECT doc_id, i,
                     COUNT(*) OVER (PARTITION BY span) AS tot,
                     ROW_NUMBER() OVER (
                       PARTITION BY span ORDER BY doc_id, i) AS rn
              FROM occ
            ), removal AS (
              SELECT doc_id, i FROM ranked WHERE tot > 1 AND rn > 1
            ), covered AS (
              SELECT DISTINCT doc_id, idx FROM (
                SELECT doc_id,
                       unnest(generate_series(i, i + 9)) AS idx
                FROM removal)
            ), tokens AS (
              SELECT t.doc_id, ix.idx AS idx, t.w[ix.idx] AS tok
              FROM toks t, LATERAL (
                SELECT unnest(generate_series(1, len(t.w))) AS idx) ix
            ), kept AS (
              SELECT tk.doc_id,
                     string_agg(tk.tok, ' ' ORDER BY tk.idx) AS s,
                     COUNT(*) AS nk
              FROM tokens tk
              LEFT JOIN covered c
                ON c.doc_id = tk.doc_id AND c.idx = tk.idx
              WHERE c.doc_id IS NULL
              GROUP BY tk.doc_id
            )
            SELECT t.doc_id,
                   CAST(len(t.w) AS BIGINT) AS n_tokens,
                   CAST(len(t.w) - COALESCE(k.nk, 0) AS BIGINT)
                     AS n_removed,
                   md5(COALESCE(k.s, '')) AS kept_md5
            FROM toks t LEFT JOIN kept k USING (doc_id)
            ORDER BY t.doc_id
        """,
        "q_span_dedup": """
            WITH norm AS (
              SELECT doc_id,
                     lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t
              FROM documents
            ), toks AS (
              SELECT doc_id, t, string_split(t, ' ') AS w FROM norm
            ), expanded AS (
              SELECT doc_id, w,
                     unnest(generate_series(1, len(w) - 9)) AS i
              FROM toks WHERE len(w) >= 10
            ), spans AS (
              SELECT doc_id,
                     array_to_string(w[i : i + 9], ' ') AS span
              FROM expanded
              UNION ALL
              -- mirror Spark span_hashes: a doc shorter than k tokens
              -- contributes its whole normalized text as one span
              SELECT doc_id, t AS span FROM toks WHERE len(w) < 10
            ), tot AS (
              SELECT span, COUNT(*) AS tot FROM spans GROUP BY span
            )
            SELECT s.doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_spans,
                   CAST(SUM(CASE WHEN t.tot > 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_dup_spans,
                   round(SUM(CASE WHEN t.tot > 1 THEN 1 ELSE 0 END)
                         / COUNT(*)::DOUBLE, 6) AS dup_frac
            FROM spans s JOIN tot t USING (span)
            GROUP BY s.doc_id
        """,
        # Rebuild the unigram model (counts, top-32 vocab cut with the
        # same (cnt DESC, w ASC) tie-break, OOV price) and re-score.
        "q_unigram_lm": """
            WITH norm AS (
              SELECT doc_id,
                     lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t
              FROM documents
            ), words AS (
              SELECT doc_id, unnest(string_split(t, ' ')) AS w FROM norm
            ), words2 AS (
              SELECT doc_id, w FROM words WHERE w <> ''
            ), counts AS (
              SELECT w, COUNT(*) AS cnt FROM words2 GROUP BY w
            ), tot AS (
              SELECT CAST(SUM(cnt) AS DOUBLE) AS total FROM counts
            ), vocab AS (
              SELECT w,
                     CAST(round(ln(cnt / total) * 1000000) AS BIGINT)
                       AS lp_micros
              FROM counts, tot
              ORDER BY cnt DESC, w ASC LIMIT 32
            ), oov AS (
              SELECT CAST(round(ln(0.5 / total) * 1000000) AS BIGINT)
                       AS oov_micros
              FROM tot
            )
            SELECT d.doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_toks,
                   CAST(SUM(COALESCE(v.lp_micros, o.oov_micros))
                        AS BIGINT) AS lp_sum_micros,
                   CAST(floor(SUM(COALESCE(v.lp_micros, o.oov_micros))
                              / COUNT(*)) AS BIGINT) AS lp_mean_micros
            FROM words2 d
            LEFT JOIN vocab v USING (w)
            CROSS JOIN oov o
            GROUP BY d.doc_id
        """,
        # Winnowing: DuckDB replays the min-of-w-window fingerprint
        # selection + distinct + xor pin from the materialized
        # positioned span hashes (pos is 0-based from posexplode).
        "q_winnow": f"""
            WITH s AS (
              SELECT doc_id, pos, h,
                     COUNT(*) OVER (PARTITION BY doc_id) AS n,
                     MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                                  ROWS BETWEEN CURRENT ROW
                                  AND 3 FOLLOWING) AS wmin,
                     MIN(h) OVER (PARTITION BY doc_id) AS gmin
              FROM read_parquet('{ORACLE_DIR}/sf0.01/winnow_spans/*.parquet')
            ), fp AS (
              SELECT DISTINCT doc_id,
                     CASE WHEN n <= 4 THEN gmin ELSE wmin END AS f
              FROM s WHERE n <= 4 OR pos <= n - 4
            ), agg AS (
              SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_fp,
                     CAST(bit_xor(f) AS BIGINT) AS fp_xor
              FROM fp GROUP BY doc_id
            ), nn AS (
              SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans
              FROM read_parquet('{ORACLE_DIR}/sf0.01/winnow_spans/*.parquet')
              GROUP BY doc_id
            )
            SELECT nn.doc_id, nn.n_spans, agg.n_fp, agg.fp_xor
            FROM nn JOIN agg USING (doc_id)
        """,
        # Winnow pairs: hot-bucket prune + fingerprint self-join +
        # shared-count replayed from the materialized (doc_id, f).
        "q_winnow_pairs": f"""
            WITH fps AS (
              SELECT doc_id, f
              FROM read_parquet('{ORACLE_DIR}/sf0.01/winnow_pair_fps/*.parquet')
            ), hot AS (
              SELECT f FROM fps GROUP BY f HAVING COUNT(*) > 32
            ), kept AS (
              SELECT doc_id, f FROM fps
              WHERE f NOT IN (SELECT f FROM hot)
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(COUNT(*) AS BIGINT) AS n_shared
            FROM kept a JOIN kept b
              ON a.f = b.f AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        """,
        # URL canonicalization: the messy URLs are re-synthesized from
        # doc_id and re-canonicalized with DuckDB's own regex chain
        # (RE2, \\1 replacements, explicit 'g') — semantics shared,
        # code not.
        "q_url_canon": r"""
            WITH raw AS (
              SELECT doc_id,
                CASE CAST(doc_id % 6 AS INTEGER)
                  WHEN 0 THEN 'HTTPS://' || upper('site' || (doc_id % 20))
                       || '.Example.COM:443/p/' || (doc_id % 100)
                       || '?utm_source=x&id=' || (doc_id % 50)
                  WHEN 1 THEN 'https://site' || (doc_id % 20)
                       || '.example.com/p/' || (doc_id % 100)
                       || '?id=' || (doc_id % 50)
                  WHEN 2 THEN 'http://site' || (doc_id % 20)
                       || '.example.com:80/p/' || (doc_id % 100) || '#sec'
                  WHEN 3 THEN 'https://site' || (doc_id % 20)
                       || '.example.com/p/' || (doc_id % 100)
                       || '?fbclid=ABC' || (doc_id % 50)
                  WHEN 4 THEN 'https://site' || (doc_id % 20)
                       || '.example.com/p/' || (doc_id % 100)
                       || '?gclid=1&id=' || (doc_id % 50) || '&utm_medium=m'
                  ELSE 'http://site' || (doc_id % 20)
                       || '.example.com/p/' || (doc_id % 100)
                END AS url
              FROM documents
            ), parts AS (
              SELECT doc_id, url,
                lower(regexp_extract(url,
                  '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
                lower(regexp_extract(url,
                  '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS hp,
                regexp_extract(url,
                  '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)', 1) AS rest
              FROM raw
            ), cleaned AS (
              SELECT doc_id, url, scheme,
                CASE WHEN scheme = 'http'
                       THEN regexp_replace(hp, ':80$', '')
                     WHEN scheme = 'https'
                       THEN regexp_replace(hp, ':443$', '')
                     ELSE hp END AS hp,
                regexp_replace(regexp_replace(regexp_replace(
                  regexp_replace(rest,
                    '([?&])(utm_[^=&#]*|fbclid|gclid)=[^&#]*', '\1', 'g'),
                  '&{2,}', '&', 'g'), '\?&', '?', 'g'),
                  '[?&]$', '', 'g') AS rest
              FROM parts
            ), canon AS (
              SELECT doc_id, url,
                CASE WHEN scheme = '' THEN trim(url)
                     ELSE scheme || '://' || hp || rest END AS canon
              FROM cleaned
            )
            SELECT doc_id, url, canon,
                   CAST(COUNT(*) OVER (PARTITION BY canon) AS BIGINT)
                     AS n_variants
            FROM canon
        """,
        # Bigram LM: the whole model rebuilt from raw text with a
        # structurally different pair derivation (positional lateral
        # unnest), then the identical conditional + OOV pricing.
        "q_bigram_lm": """
            WITH norm AS (
              SELECT doc_id,
                     lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t
              FROM documents
            ), tok AS (
              SELECT doc_id,
                     list_filter(string_split(t, ' '), x -> x <> '') AS arr
              FROM norm
            ), pairs AS (
              SELECT doc_id, arr[i.x] AS prev, arr[i.x + 1] AS w
              FROM tok, LATERAL (
                SELECT unnest(range(1, len(arr))) AS x
              ) i
            ), pc AS (
              SELECT prev, w, COUNT(*) AS cnt FROM pairs GROUP BY prev, w
            ), ctx AS (
              SELECT prev, SUM(cnt) AS ctx_cnt FROM pc GROUP BY prev
            ), tot AS (
              SELECT CAST(SUM(cnt) AS DOUBLE) AS total FROM pc
            ), vocab AS (
              SELECT pc.prev, pc.w,
                     CAST(round(ln(pc.cnt / ctx.ctx_cnt) * 1000000)
                          AS BIGINT) AS lp_micros
              FROM pc JOIN ctx USING (prev)
              ORDER BY pc.cnt DESC, pc.prev ASC, pc.w ASC LIMIT 32
            ), oov AS (
              SELECT CAST(round(ln(0.5 / total) * 1000000) AS BIGINT)
                       AS oov_micros
              FROM tot
            )
            SELECT p.doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_bigrams,
                   CAST(SUM(COALESCE(v.lp_micros, o.oov_micros))
                        AS BIGINT) AS lp_sum_micros,
                   CAST(floor(SUM(COALESCE(v.lp_micros, o.oov_micros))
                              / COUNT(*)) AS BIGINT) AS lp_mean_micros
            FROM pairs p
            LEFT JOIN vocab v ON p.prev = v.prev AND p.w = v.w
            CROSS JOIN oov o
            GROUP BY p.doc_id
        """,
        # Host/tld re-derived from the materialized (url, html) parquet
        # with the same RE2-safe pattern; byte lengths recomputed from
        # the BLOB by DuckDB itself.
        # Host link graph: every href re-extracted from the raw page
        # bytes with the identical RE2∩Java-regex pattern, hosts
        # re-derived with the shared absolute-URL pattern, weights
        # re-aggregated.
        "q_host_graph": f"""
            WITH a AS (
              SELECT lower(regexp_extract(url,
                       '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)', 1))
                       AS src_host,
                     unnest(regexp_extract_all(decode(html),
                       'href="([^"]*)"', 1)) AS href
              FROM read_parquet('{ORACLE_DIR}/sf0.01/pages_meta/*.parquet')
            ), e AS (
              SELECT src_host,
                     lower(regexp_extract(href,
                       '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)', 1))
                       AS dst_host
              FROM a
            )
            SELECT src_host, dst_host,
                   CAST(COUNT(*) AS BIGINT) AS n_links
            FROM e
            WHERE src_host <> '' AND dst_host <> ''
            GROUP BY src_host, dst_host
        """,
        # SCC by a COMPLETELY different formulation: full transitive
        # closure via recursive CTE, then scc(v) = min over v and all
        # u mutually reachable with v. The Spark side runs trim +
        # forward-min coloring + backward closure — any membership
        # error in any phase diverges. Edge set regenerated closed-form
        # (same arithmetic as q_scc's in-plan synthesis at sf0.01).
        "q_scc": f"""
            WITH RECURSIVE ids AS (
              SELECT unnest(range(0, {max(8, _n_pages("sf0.01") // 128) * 8}))
                     AS id
            ), e AS (
              SELECT id AS src,
                     (id - id % 8) + ((id % 8 + 1) % 8) AS dst
              FROM ids
              UNION
              SELECT g * 8 AS src, 0 AS dst
              FROM (SELECT unnest(range(3,
                     {max(8, _n_pages("sf0.01") // 128)})) AS g)
              UNION
              SELECT src, dst FROM (VALUES
                (0, 8), (8, 16),
                (16, {max(8, _n_pages("sf0.01") // 128) * 8})) t(src, dst)
              UNION
              SELECT {max(8, _n_pages("sf0.01") // 128) * 8} + i AS src,
                     {max(8, _n_pages("sf0.01") // 128) * 8} + i + 1 AS dst
              FROM (SELECT unnest(range(0, 4)) AS i)
            ), nodes AS (
              SELECT src AS node FROM e UNION SELECT dst FROM e
            ), reach AS (
              SELECT src AS a, dst AS b FROM e
              UNION
              SELECT r.a, e.dst AS b FROM reach r JOIN e ON e.src = r.b
            ), mutual AS (
              SELECT r1.a AS u, r1.b AS v
              FROM reach r1 JOIN reach r2
                ON r1.a = r2.b AND r1.b = r2.a
            ), comp AS (
              SELECT n.node,
                     least(n.node, coalesce(min(m.u), n.node)) AS scc
              FROM nodes n LEFT JOIN mutual m ON m.v = n.node
              GROUP BY n.node
            )
            SELECT CAST(scc AS BIGINT) AS scc,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(MAX(node) AS BIGINT) AS max_node
            FROM comp GROUP BY scc ORDER BY scc
        """,
        "q_domain_stats": f"""
            WITH p AS (
              SELECT lower(regexp_extract(url,
                       '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)', 1)) AS host,
                     url, octet_length(html) AS b
              FROM read_parquet('{ORACLE_DIR}/sf0.01/pages_meta/*.parquet')
            )
            SELECT host,
                   regexp_extract(host, '([^.]+)$', 1) AS tld,
                   CAST(COUNT(*) AS BIGINT) AS n_pages,
                   CAST(COUNT(DISTINCT url) AS BIGINT) AS n_urls,
                   CAST(SUM(b) AS BIGINT) AS sum_bytes,
                   CAST(floor(SUM(b) / COUNT(*)) AS BIGINT) AS mean_bytes
            FROM p GROUP BY host
        """,
        # Z-order key: the clamp + bit-interleave expression is
        # regenerated term-by-term for DuckDB by _zorder_sql_expr —
        # the engines share the formula by construction, so any
        # disagreement is an arithmetic-semantics divergence.
        "q_zorder": f"""
            SELECT l_orderkey,
                   CAST(l_linenumber AS INTEGER) AS l_linenumber,
                   CAST({_zorder_sql_expr('l_partkey', 'l_suppkey')}
                        AS BIGINT) AS zkey
            FROM lineitem
        """,
        # The bucketed join's RESULT must equal a plain relational
        # join — bucketing is a physical-layout property only.
        "q_bucketed_join": """
            SELECT c.c_mktsegment,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS sum_cents
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_mktsegment
        """,
        # Byte-identical md5-hex threshold comparison: fixed-width
        # lowercase hex strings order exactly like the 32-bit cut
        # values they spell, so string < string IS the numeric test.
        "q_stratified_sample": f"""
            WITH s AS (
              SELECT doc_id, lang,
                     substring(md5(doc_id::VARCHAR), 1, 8) AS b,
                     CASE lang
                       WHEN 'en' THEN '{_rate_hex(_SAMPLE_RATES["en"])}'
                       WHEN 'es' THEN '{_rate_hex(_SAMPLE_RATES["es"])}'
                       WHEN 'zh' THEN '{_rate_hex(_SAMPLE_RATES["zh"])}'
                       ELSE '{_rate_hex(_SAMPLE_DEFAULT)}'
                     END AS thr
              FROM documents
            )
            SELECT lang,
                   CAST(COUNT(*) AS BIGINT) AS n_kept,
                   CAST(SUM(doc_id) AS BIGINT) AS sum_ids
            FROM s WHERE b < thr GROUP BY lang
        """,
        # The identical SQL text modulo view names — two engines, one
        # query, per-row integer cents.
        "q_sql_q3": """
            SELECT l_orderkey,
                   CAST(SUM(CAST(ROUND(l_extendedprice
                        * (1 - l_discount) * 100) AS BIGINT))
                     AS BIGINT) AS revenue_cents,
                   strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
                   o_orderpriority
            FROM customer
            JOIN orders   ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate <  TIMESTAMP '1997-06-01 00:00:00'
              AND l_shipdate  >= TIMESTAMP '1997-06-01 00:00:00'
            GROUP BY l_orderkey, o_orderdate, o_orderpriority
            ORDER BY revenue_cents DESC, l_orderkey
            LIMIT 10
        """,
        "q_sql_q5": """
            SELECT n_name,
                   CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
                        * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
                   COUNT(*) AS n_items
            FROM customer
            JOIN orders   ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
                         AND c_nationkey = s_nationkey
            JOIN nation   ON s_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
            GROUP BY n_name
            ORDER BY revenue_cents DESC, n_name
        """,
        # Replays the FULL OUTER join + classification over the two
        # materialized (url, md5) tables.
        "q_crawl_delta": f"""
            WITH j AS (
              SELECT COALESCE(a.url, b.url) AS url,
                     CASE WHEN a.url IS NULL THEN 'added'
                          WHEN b.url IS NULL THEN 'removed'
                          WHEN a.h = b.h THEN 'unchanged'
                          ELSE 'changed' END AS status
              FROM read_parquet('{ORACLE_DIR}/sf0.01/crawl_a/*.parquet') a
              FULL OUTER JOIN
                   read_parquet('{ORACLE_DIR}/sf0.01/crawl_b/*.parquet') b
                ON a.url = b.url
            )
            SELECT status,
                   CAST(COUNT(*) AS BIGINT) AS n_urls,
                   CAST(SUM(length(url)) AS BIGINT) AS sum_len
            FROM j GROUP BY status ORDER BY status
        """,
        # Per-column UNION ALL aggregates with the same normalization
        # (micros for doubles, strftime for timestamps).
        "q_profile": """
            WITH p AS (
              SELECT 'event_id' AS "column", COUNT(*) AS n_total,
                     COUNT(event_id) AS n_nonnull,
                     COUNT(DISTINCT event_id) AS n_distinct,
                     CAST(MIN(event_id) AS VARCHAR) AS min_norm,
                     CAST(MAX(event_id) AS VARCHAR) AS max_norm
              FROM events
              UNION ALL
              SELECT 'ts', COUNT(*), COUNT(ts), COUNT(DISTINCT ts),
                     strftime(MIN(ts), '%Y-%m-%d %H:%M:%S'),
                     strftime(MAX(ts), '%Y-%m-%d %H:%M:%S')
              FROM events
              UNION ALL
              SELECT 'user_id', COUNT(*), COUNT(user_id),
                     COUNT(DISTINCT user_id),
                     CAST(MIN(user_id) AS VARCHAR),
                     CAST(MAX(user_id) AS VARCHAR)
              FROM events
              UNION ALL
              SELECT 'event_type', COUNT(*), COUNT(event_type),
                     COUNT(DISTINCT event_type),
                     MIN(event_type), MAX(event_type)
              FROM events
              UNION ALL
              SELECT 'value', COUNT(*), COUNT(value),
                     COUNT(DISTINCT value),
                     CAST(CAST(round(MIN(value) * 1000000) AS BIGINT)
                          AS VARCHAR),
                     CAST(CAST(round(MAX(value) * 1000000) AS BIGINT)
                          AS VARCHAR)
              FROM events
              UNION ALL
              SELECT 'props', COUNT(*), COUNT(props),
                     COUNT(DISTINCT props), MIN(props), MAX(props)
              FROM events
            )
            SELECT "column",
                   CAST(n_total AS BIGINT) AS n_total,
                   CAST(n_nonnull AS BIGINT) AS n_nonnull,
                   CAST(n_distinct AS BIGINT) AS n_distinct,
                   min_norm, max_norm
            FROM p ORDER BY "column"
        """,
        # Batch replay of the stream-static join: the dimension is a
        # pure function of event_type, the weighted sum is per-row
        # integer micros (order-insensitive).
        "stream_enrich": """
            SELECT substring(event_type, 1, 1) AS category,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(CAST(round(value * 1000000) AS BIGINT)
                        * length(event_type)) AS BIGINT) AS sum_wv_micros
            FROM events
            GROUP BY 1 ORDER BY category
        """,
        # Full detect+strip replay: same normalization, k=8 token
        # prefixes, integer-permille share cut, (host, own-prefix)
        # equality join and substring/ltrim arithmetic.
        "q_boilerplate": f"""
            WITH d AS (
              SELECT doc_id, source,
                     trim(regexp_replace(
                       text, '[ \\t\\n\\r\\f\\x0B]+', ' ', 'g')) AS norm
              FROM read_parquet(
                '{ORACLE_DIR}/sf0.01/boilerplate_docs/*.parquet')
            ), tk AS (
              SELECT *,
                     array_to_string(
                       string_split(norm, ' ')[1:8], ' ') AS prefix
              FROM d
            ), pp AS (
              SELECT source, prefix, COUNT(*) AS n_docs
              FROM tk WHERE prefix <> '' GROUP BY source, prefix
            ), ph AS (
              SELECT source, COUNT(*) AS host_docs
              FROM tk WHERE prefix <> '' GROUP BY source
            ), bp AS (
              SELECT pp.source, pp.prefix
              FROM pp JOIN ph USING (source)
              WHERE pp.n_docs >= 2
                AND pp.n_docs * 1000 // ph.host_docs >= 400
            ), st AS (
              SELECT tk.source,
                     CASE WHEN bp.prefix IS NOT NULL THEN 1 ELSE 0 END
                       AS stripped,
                     CASE WHEN bp.prefix IS NOT NULL
                          THEN ltrim(substring(
                            tk.norm, length(bp.prefix) + 1))
                          ELSE tk.norm END AS text2
              FROM tk LEFT JOIN bp
                ON tk.source = bp.source AND tk.prefix = bp.prefix
            )
            SELECT source,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(stripped) AS BIGINT) AS n_stripped,
                   CAST(SUM(length(text2)) AS BIGINT) AS sum_len_after
            FROM st GROUP BY source ORDER BY source
        """,
        # Identical total order, microsecond gap rule and virtual
        # __start__ state replayed with DuckDB windows.
        "q_transitions": """
            WITH o AS (
              SELECT event_type,
                     epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap,
                     lag(event_type) OVER w AS prev_raw
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            )
            SELECT CASE WHEN gap IS NULL OR gap > 1800 * 1000000
                        THEN '__start__' ELSE prev_raw END AS prev_state,
                   event_type AS next_state,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM o
            GROUP BY 1, 2
            ORDER BY prev_state, next_state
        """,
        # Re-scores the materialized corrupted table with the VERBATIM
        # signature pattern (pure literal alternation, identical in
        # Java regex and RE2; alternatives are mutually exclusive at
        # any position so leftmost-first vs leftmost-longest cannot
        # diverge).
        "q_mojibake": f"""
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text, 'Ã©|Ã¨|Ã¼|Ã¶|Ã¤|Ã±|Ã§|Ã |Â«|Â»|Â°|Â |â|â|â|â|â|â¦|ï»¿'))
                        AS BIGINT) AS mojibake_hits,
                   CAST(len(regexp_extract_all(text, '\ufffd'))
                        AS BIGINT) AS replacement_chars,
                   CAST(len(regexp_extract_all(text, '[^\\x00-\\x7f]'))
                        AS BIGINT) AS non_ascii_chars,
                   CAST(CASE WHEN len(regexp_extract_all(
                        text, 'Ã©|Ã¨|Ã¼|Ã¶|Ã¤|Ã±|Ã§|Ã |Â«|Â»|Â°|Â |â|â|â|â|â|â¦|ï»¿')) > 0
                        THEN 1 ELSE 0 END AS INT) AS flagged
            FROM read_parquet('{ORACLE_DIR}/sf0.01/mojibake_docs/*.parquet')
            ORDER BY doc_id
        """,
        # Same normalize→split tokenization, stride-24 window starts via
        # generate_series, 1-based inclusive list slicing, and the
        # dense chunk_idx from the start order.
        "q_chunking": """
            WITH toks AS (
              SELECT doc_id,
                     string_split(
                       trim(regexp_replace(
                         text, '[ \\t\\n\\r\\f\\x0B]+', ' ', 'g')),
                       ' '
                     ) AS t
              FROM documents
            ), nz AS (
              SELECT doc_id, t, len(t) AS n
              FROM toks WHERE len(t) > 0 AND t[1] <> ''
            ), st AS (
              SELECT doc_id, t, n,
                     unnest(generate_series(0, n - 1, 24)) AS start_
              FROM nz
            ), stf AS (
              SELECT * FROM st WHERE start_ = 0 OR start_ + 8 < n
            ), s AS (
              SELECT *,
                     CAST(row_number() OVER (
                       PARTITION BY doc_id ORDER BY start_) - 1 AS INT)
                       AS chunk_idx
              FROM stf
            )
            SELECT doc_id, chunk_idx,
                   array_to_string(t[start_ + 1 : start_ + 32], ' ')
                     AS chunk_text,
                   CAST(LEAST(32, n - start_) AS INT) AS n_tokens
            FROM s
            ORDER BY doc_id, chunk_idx
        """,
        # Byte-identical md5-hex split thresholds on the SOURCE key.
        "q_leakage_split": """
            WITH s AS (
              SELECT *,
                     CASE
                       WHEN substring(md5(source), 1, 8) < 'cccccccd'
                         THEN 'train'
                       WHEN substring(md5(source), 1, 8) < 'e6666666'
                         THEN 'valid'
                       ELSE 'test'
                     END AS split
              FROM documents
            )
            SELECT split,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(COUNT(DISTINCT source) AS BIGINT) AS n_keys,
                   CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars
            FROM s GROUP BY split ORDER BY split
        """,
        # Rebuild TF, DF, integer-micros IDF and the per-doc top-3
        # with the same (score DESC, term ASC) tie-break.
        "q_tfidf": """
            WITH norm AS (
              SELECT doc_id,
                     lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t
              FROM documents
            ), words AS (
              SELECT doc_id, unnest(string_split(t, ' ')) AS w FROM norm
            ), w2 AS (
              SELECT doc_id, w FROM words WHERE w <> ''
            ), tf AS (
              SELECT doc_id, w, COUNT(*) AS tf
              FROM w2 GROUP BY doc_id, w
            ), nd AS (
              SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents
            ), idf AS (
              SELECT w,
                     CAST(round(ln(n_docs / df) * 1000000) AS BIGINT)
                       AS idf_micros
              FROM (
                SELECT w, COUNT(*) AS df FROM tf GROUP BY w
                ORDER BY df DESC, w ASC LIMIT 262144
              ), nd
            ), scored AS (
              SELECT tf.doc_id, tf.w AS term,
                     CAST(tf.tf AS BIGINT) AS tf,
                     CAST(tf.tf * idf_micros AS BIGINT) AS score_micros
              FROM tf JOIN idf USING (w)
            )
            SELECT doc_id, term, tf, score_micros FROM (
              SELECT *, row_number() OVER (
                PARTITION BY doc_id
                ORDER BY score_micros DESC, term ASC
              ) AS rn FROM scored
            ) WHERE rn <= 3
        """,
        "q_keyword_search": """
            WITH norm AS (
              SELECT doc_id,
                     lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t
              FROM documents
            ), words AS (
              SELECT doc_id, unnest(string_split(t, ' ')) AS w FROM norm
            )
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
            FROM words WHERE w IN ('spark', 'query')
            GROUP BY doc_id
            HAVING COUNT(DISTINCT w) = 2
        """,
        # Full BM25 replay: tf/df/idf/dl/avgdl rebuilt from raw text,
        # and the identical pinned integer-micros DIV chain (DuckDB //
        # == Spark DIV on the all-positive operands here). The one
        # float op, ln() for idf, is rounded to micros per TERM on
        # both engines — same discipline as q_tfidf.
        "q_bm25": """
            WITH norm AS (
              SELECT doc_id,
                     lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t
              FROM documents
            ), words AS (
              SELECT doc_id, unnest(string_split(t, ' ')) AS w FROM norm
            ), w2 AS (
              SELECT doc_id, w FROM words WHERE w <> ''
            ), dl AS (
              SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
              FROM w2 GROUP BY doc_id
            ), stats AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                     greatest((CAST(SUM(dl) AS BIGINT) * 1000000)
                              // greatest(COUNT(*), 1), 1) AS avgdl_micros
              FROM dl
            ), tf AS (
              SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf
              FROM w2 WHERE w IN ('data', 'query', 'spark')
              GROUP BY doc_id, w
            ), idf AS (
              SELECT w,
                     CAST(round(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
                                * 1000000) AS BIGINT) AS idf_micros
              FROM (
                SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY w
              ), stats
            ), scored AS (
              SELECT tf.doc_id,
                     idf_micros * (
                       tf * 220 * 10000000000 // (
                         tf * 1000000 + 120 * (
                           250000
                           + 75 * (dl.dl * 1000000000000 // avgdl_micros)
                             // 100
                         ) // 100
                       )
                     ) // 1000000 AS s_micros
              FROM tf JOIN idf USING (w) JOIN dl USING (doc_id), stats
            )
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms,
                   CAST(SUM(s_micros) AS BIGINT) AS score_micros
            FROM scored GROUP BY doc_id
            ORDER BY score_micros DESC, doc_id ASC LIMIT 20
        """,
        # Re-shingle 13-grams and replay the benchmark overlap with
        # raw gram TEXT keys (Spark keys by xxhash64 — identical
        # counts absent collisions, which are absent at oracle scale).
        "q_decontaminate": """
            WITH norm AS (
              SELECT doc_id,
                     lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t
              FROM documents
            ), toks AS (
              SELECT doc_id, t, string_split(t, ' ') AS w FROM norm
            ), spans AS (
              SELECT doc_id, array_to_string(w[i : i + 12], ' ') AS span
              FROM (SELECT doc_id, w,
                           unnest(generate_series(1, len(w) - 12)) AS i
                    FROM toks WHERE len(w) >= 13)
              UNION ALL
              SELECT doc_id, t AS span FROM toks WHERE len(w) < 13
            ), bench AS (
              SELECT DISTINCT span, 1 AS hit FROM spans WHERE doc_id % 37 = 0
            )
            SELECT s.doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_spans,
                   CAST(SUM(COALESCE(b.hit, 0)) AS BIGINT) AS n_hit,
                   round(SUM(COALESCE(b.hit, 0)) / COUNT(*)::DOUBLE, 6)
                     AS hit_frac
            FROM spans s LEFT JOIN bench b USING (span)
            GROUP BY s.doc_id
        """,
        # Replay the as-of match as an inequality join + argmax —
        # fine at oracle scale, exactly the blowup the Spark
        # union+window shape avoids. Same (ts DESC, id DESC) winner.
        "q_asof_join": """
            WITH clicks AS (
              SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'click'
            ), views AS (
              SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'view'
            ), pairs AS (
              SELECT c.event_id AS click_id, c.user_id,
                     c.ts AS cts, v.event_id AS view_id, v.ts AS vts,
                     row_number() OVER (
                       PARTITION BY c.event_id
                       ORDER BY v.ts DESC NULLS LAST,
                                v.event_id DESC NULLS LAST
                     ) AS rn
              FROM clicks c LEFT JOIN views v
                ON v.user_id = c.user_id AND v.ts <= c.ts
            )
            SELECT click_id, user_id,
                   strftime(cts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
                   view_id,
                   strftime(vts, '%Y-%m-%d %H:%M:%S.%f') AS view_ts,
                   CAST(FLOOR(epoch(cts)) - FLOOR(epoch(vts)) AS BIGINT)
                     AS gap_s
            FROM pairs WHERE rn = 1
        """,
        "q_hll_rollup": _hll_rollup_oracle_sql(),
        "q_bitext": f"""
            WITH ap AS (
              SELECT a_id, centroid
              FROM read_parquet('{ORACLE_DIR}/sf0.01/bitext_probes/*.parquet')
            ), ba AS (
              SELECT b_id, centroid
              FROM read_parquet('{ORACLE_DIR}/sf0.01/bitext_assign/*.parquet')
            ), av AS (
              SELECT vec_id AS a_id, embedding::DOUBLE[] AS v
              FROM embeddings WHERE vec_id % 2 = 0
            ), bv AS (
              SELECT vec_id AS b_id, embedding::DOUBLE[] AS v
              FROM embeddings WHERE vec_id % 2 = 1
            ), cand AS (
              SELECT ap.a_id, ba.b_id,
                     CAST(round(
                       list_dot_product(av.v, bv.v)
                       / (sqrt(list_dot_product(av.v, av.v))
                          * sqrt(list_dot_product(bv.v, bv.v)))
                       * 1000000) AS BIGINT) AS cos_u
              FROM ap
              JOIN ba USING (centroid)
              JOIN av USING (a_id)
              JOIN bv USING (b_id)
            ), pos AS (
              SELECT * FROM cand WHERE cos_u > 0
            ), ranked AS (
              SELECT a_id, b_id, cos_u,
                     row_number() OVER (
                       PARTITION BY a_id ORDER BY cos_u DESC, b_id
                     ) AS ra,
                     row_number() OVER (
                       PARTITION BY b_id ORDER BY cos_u DESC, a_id
                     ) AS rb
              FROM pos
            ), sa AS (
              SELECT a_id, CAST(SUM(cos_u) AS BIGINT) AS da,
                     CAST(COUNT(*) AS BIGINT) AS na
              FROM ranked WHERE ra <= 4 GROUP BY a_id
            ), sb AS (
              SELECT b_id, CAST(SUM(cos_u) AS BIGINT) AS db,
                     CAST(COUNT(*) AS BIGINT) AS nb
              FROM ranked WHERE rb <= 4 GROUP BY b_id
            ), scored AS (
              SELECT r.a_id, r.b_id, r.cos_u,
                     CAST((2 * r.cos_u * 1000000 * sa.na * sb.nb)
                          // (sa.da * sb.nb + sb.db * sa.na)
                          AS BIGINT) AS margin_u
              FROM ranked r
              JOIN sa USING (a_id)
              JOIN sb USING (b_id)
            ), best AS (
              SELECT *, row_number() OVER (
                PARTITION BY a_id
                ORDER BY margin_u DESC, cos_u DESC, b_id
              ) AS rbest
              FROM scored
            )
            SELECT a_id, b_id, cos_u, margin_u FROM best
            WHERE rbest = 1 AND margin_u >= 1020000
            ORDER BY a_id
        """,
        "q_tables": f"""
            SELECT variant, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(COUNT(*) AS BIGINT) AS n_exact,
                   CAST(SUM(n_cells) AS BIGINT) AS cells
            FROM read_parquet('{ORACLE_DIR}/sf0.01/tables_meta/*.parquet')
            GROUP BY variant
            ORDER BY variant
        """,
        "q_kg_diff": f"""
            WITH tr AS (
              SELECT url, g, s, p, o, o_kind, o_dt, o_lang,
                     CAST('0x' || substr(md5(url), 1, 4) AS BIGINT)
                       % 10 AS cls
              FROM read_parquet('{ORACLE_DIR}/sf0.01/triples/*.parquet')
            ), old AS (
              SELECT g, s, p,
                     CASE WHEN cls = 1
                               AND p = 'http://schema.org/name'
                               AND o_kind = 1
                          THEN o || ' (stale)' ELSE o END AS o,
                     o_kind, o_dt, o_lang
              FROM tr
              WHERE NOT (cls = 0
                         AND p = 'http://schema.org/relatedLink')
            ), new AS (
              SELECT g, s, p, o, o_kind, o_dt, o_lang FROM tr
            ), merged AS (
              SELECT g, s, p, o, o_kind, o_dt, o_lang,
                     max(so) AS _o, max(sn) AS _n
              FROM (
                SELECT *, 1 AS so, 0 AS sn FROM old
                UNION ALL
                SELECT *, 0 AS so, 1 AS sn FROM new
              )
              GROUP BY g, s, p, o, o_kind, o_dt, o_lang
            )
            SELECT p,
                   CASE WHEN _n = 1 THEN 'added'
                        ELSE 'removed' END AS change,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST('0x' || substr(md5(
                     concat_ws(chr(1), g, s, p, o)), 1, 10) AS BIGINT))
                     AS BIGINT) AS pin
            FROM merged WHERE _o <> _n
            GROUP BY p, change
            ORDER BY p, change
        """,
        "q_funnel": """
            WITH e AS (
              SELECT user_id, ts, event_type FROM events
              WHERE event_type IN ('view', 'click', 'purchase')
            ), s1 AS (
              SELECT user_id, min(ts) AS t1 FROM e
              WHERE event_type = 'view' GROUP BY user_id
            ), s2 AS (
              SELECT e.user_id, min(e.ts) AS t2 FROM e
              JOIN s1 USING (user_id)
              WHERE e.event_type = 'click' AND e.ts > s1.t1
              GROUP BY e.user_id
            ), s3 AS (
              SELECT e.user_id, min(e.ts) AS t3 FROM e
              JOIN s2 USING (user_id)
              WHERE e.event_type = 'purchase' AND e.ts > s2.t2
              GROUP BY e.user_id
            ), u AS (SELECT DISTINCT user_id FROM e)
            SELECT u.user_id,
                   CAST(CASE WHEN t3 IS NOT NULL THEN 3
                             WHEN t2 IS NOT NULL THEN 2
                             WHEN t1 IS NOT NULL THEN 1
                             ELSE 0 END AS INT) AS steps_completed,
                   COALESCE(strftime(t1, '%Y-%m-%d %H:%M:%S.%f'), '')
                     AS t1,
                   COALESCE(strftime(t2, '%Y-%m-%d %H:%M:%S.%f'), '')
                     AS t2,
                   COALESCE(strftime(t3, '%Y-%m-%d %H:%M:%S.%f'), '')
                     AS t3
            FROM u
            LEFT JOIN s1 USING (user_id)
            LEFT JOIN s2 USING (user_id)
            LEFT JOIN s3 USING (user_id)
            ORDER BY user_id
        """,
        "q_skyline": """
            WITH p AS (
              SELECT p_partkey,
                     CAST(round(p_retailprice * 100) AS BIGINT)
                       AS price_c,
                     CAST(p_size AS BIGINT) AS size
              FROM part
            )
            SELECT p_partkey, price_c, size FROM p a
            WHERE NOT EXISTS (
              SELECT 1 FROM p b
              WHERE b.price_c <= a.price_c AND b.size >= a.size
                AND (b.price_c < a.price_c OR b.size > a.size)
            )
            ORDER BY p_partkey
        """,
        "q_pagerank": _pagerank_oracle_sql(n_iter=5),
        "q_trustrank": _ppr_oracle_sql(
            n_iter=5,
            seed_where="node % 50 = 0",
            dir_edges_sql="""
          SELECT o_custkey % 9973 AS src, l_suppkey % 9973 AS dst
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey""",
        ),
        "q_anf": _anf_oracle_sql(
            n_rounds=3,
            dir_edges_sql="""
          SELECT o_custkey % 9973 AS src, l_suppkey % 9973 AS dst
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey""",
        ),
        # Host centrality: edges re-derived from raw page bytes, all
        # rank iterations replayed — both pipeline stages certified.
        "q_host_rank": _pagerank_oracle_sql(
            n_iter=3,
            undirected=False,
            dir_edges_sql=_HOST_DIR_EDGES_SQL,
        ),
        # HITS over the same re-derived host edges: both score
        # vectors replayed through all iterations with the identical
        # quantized-L1 integer normalization.
        "q_hits": _hits_oracle_sql(n_iter=3, dir_edges_sql=_HOST_DIR_EDGES_SQL),
        "q_pca": _pca_oracle_sql(n_iter=8, dim=64),
        "q_kcore": _kcore_oracle_sql(k=35, n_rounds=4),
        "q_label_prop": _lpa_oracle_sql(n_iter=5),
        "q_bfs_hops": _bfs_oracle_sql(n_rounds=3),
        # FULL-relax Bellman-Ford rounds (vs the operator's
        # frontier-active rounds): after r rounds both equal the min
        # cost over ≤ r-edge paths, so identical rows certify the
        # frontier optimization. MATERIALIZED: each round references
        # the previous twice (owl_entail discipline).
        "q_sssp": """
            WITH e AS MATERIALIZED (
              SELECT src, dst, MIN(w) AS w FROM (
                SELECT o_custkey % 9973 AS src,
                       l_suppkey % 9973 AS dst,
                       1 + ((o_custkey % 9973) * 7
                            + (l_suppkey % 9973) * 13) % 9 AS w
                FROM orders JOIN lineitem ON o_orderkey = l_orderkey
              ) GROUP BY src, dst
            ), d0 AS MATERIALIZED (
              SELECT node, CAST(0 AS BIGINT) AS dist FROM (
                SELECT DISTINCT node FROM (
                  SELECT src AS node FROM e
                  UNION SELECT dst FROM e)
                WHERE node % 997 = 0)
            ), d1 AS MATERIALIZED (
              SELECT node, MIN(dist) AS dist FROM (
                SELECT node, dist FROM d0
                UNION ALL
                SELECT e.dst, d0.dist + e.w FROM d0
                JOIN e ON d0.node = e.src
              ) GROUP BY node
            ), d2 AS MATERIALIZED (
              SELECT node, MIN(dist) AS dist FROM (
                SELECT node, dist FROM d1
                UNION ALL
                SELECT e.dst, d1.dist + e.w FROM d1
                JOIN e ON d1.node = e.src
              ) GROUP BY node
            ), d3 AS MATERIALIZED (
              SELECT node, MIN(dist) AS dist FROM (
                SELECT node, dist FROM d2
                UNION ALL
                SELECT e.dst, d2.dist + e.w FROM d2
                JOIN e ON d2.node = e.src
              ) GROUP BY node
            )
            SELECT node, dist FROM d3 ORDER BY node
        """,
        "q_walks": _walks_oracle_sql(walk_len=3, walks_per_node=2),
        "q_link_predict": _link_predict_oracle_sql(
            max_center_deg=64, min_cn=2, top_k=50
        ),
        "q_kmeans": _kmeans_oracle_sql(n_iter=5, k=8),
        # SemDeDup: the k-means assignment (certified end-to-end by
        # q_kmeans's iteration replay) is materialized; DuckDB then
        # independently replays the within-cluster cosine join and
        # the smallest-smaller-id verdict over the raw embeddings.
        "q_semdedup": f"""
            WITH asg AS (
              SELECT vec_id, cluster
              FROM read_parquet('{ORACLE_DIR}/sf0.01/semdedup_assign/*.parquet')
            ), e AS (
              SELECT a.vec_id, a.cluster, em.embedding::DOUBLE[] AS v
              FROM asg a JOIN embeddings em USING (vec_id)
            ), dups AS (
              SELECT a.vec_id, MIN(b.vec_id) AS dup_of
              FROM e a JOIN e b ON a.cluster = b.cluster
                               AND b.vec_id < a.vec_id
              WHERE round(
                      list_dot_product(a.v, b.v)
                      / (sqrt(list_dot_product(a.v, a.v))
                         * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.4
              GROUP BY a.vec_id
            )
            SELECT asg.vec_id, asg.cluster,
                   dups.dup_of IS NULL AS kept,
                   CAST(COALESCE(dups.dup_of, -1) AS BIGINT) AS dup_of
            FROM asg LEFT JOIN dups USING (vec_id)
        """,
        "q_pq_search": _pq_oracle_sql(n_iter=3, k=16),
        # Replays the ENTIRE SQ8 pipeline from raw parquet: floor(v *
        # 2^20) quantization, per-dimension min/max, the 255-level
        # code rule, the query's own codes, and the span-scaled
        # integer distance — all operands non-negative at the
        # divisions, so //, div and numpy floor-div agree.
        "q_sq8": """
            WITH vm AS (
              SELECT vec_id, i - 1 AS d,
                     CAST(floor(embedding[i]::DOUBLE * 1048576) AS BIGINT)
                       AS q
              FROM (SELECT vec_id, embedding,
                           unnest(generate_series(1, 64)) AS i
                    FROM embeddings)
            ), st AS (
              SELECT d, MIN(q) AS lo, MAX(q) AS hi FROM vm GROUP BY d
            ), codes AS (
              SELECT vm.vec_id, vm.d,
                     CASE WHEN st.hi = st.lo THEN 0
                          ELSE CAST(((vm.q - st.lo) * 255)
                                    // (st.hi - st.lo) AS BIGINT)
                     END AS c
              FROM vm JOIN st USING (d)
            ), qc AS (
              SELECT d, c AS qcode FROM codes WHERE vec_id = 0
            ), dist AS (
              SELECT codes.vec_id,
                     CAST(SUM(
                       ((abs(codes.c - qc.qcode) * (st.hi - st.lo)) // 255)
                       * ((abs(codes.c - qc.qcode) * (st.hi - st.lo)) // 255)
                     ) AS BIGINT) AS sq_dist
              FROM codes JOIN qc USING (d) JOIN st USING (d)
              GROUP BY codes.vec_id
            )
            SELECT vec_id, sq_dist FROM dist
            ORDER BY sq_dist ASC, vec_id ASC LIMIT 10
        """,
        # Brute-force canonical a<b<c three-way self-join — the exact
        # count the degree-oriented wedge join must reproduce.
        "q_triangles": """
            WITH raw AS (
              SELECT DISTINCT (o.o_custkey % 9973) AS x,
                              (l.l_suppkey % 9973) AS y
              FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            ), e AS (
              SELECT DISTINCT least(x, y) AS a, greatest(x, y) AS b
              FROM raw WHERE x <> y
            ), nodes AS (
              SELECT a AS n FROM e UNION SELECT b FROM e
            )
            SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM nodes)
                     AS n_nodes,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
                   (SELECT CAST(COUNT(*) AS BIGINT)
                    FROM e e1
                    JOIN e e2 ON e2.a = e1.b
                    JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
                     AS n_triangles
        """,
        # Replay the range join as the naive inequality join the Spark
        # shape deliberately avoids; BETWEEN is inclusive on both ends,
        # matching range_join's [ts - before, ts + after].
        "q_range_join": """
            WITH clicks AS (
              SELECT event_id AS click_id, user_id, ts FROM events
              WHERE event_type = 'click'
            ), views AS (
              SELECT event_id AS view_id, user_id, ts FROM events
              WHERE event_type = 'view'
            )
            SELECT c.click_id, c.user_id,
                   CAST(COUNT(v.view_id) AS BIGINT) AS n_views_10m,
                   MAX(v.view_id) AS last_view_id
            FROM clicks c LEFT JOIN views v
              ON v.user_id = c.user_id
             AND v.ts BETWEEN c.ts - INTERVAL 600 SECOND AND c.ts
            GROUP BY c.click_id, c.user_id
        """,
        # Replay the percentile_disc rule itself (window cumsum over
        # the distinct-value table, rank = ceil(q*n/1000) in integer
        # arithmetic) — NOT quantile_disc(), whose interpolation rule
        # needn't match bit-for-bit.
        "q_quantiles": """
            WITH cents AS (
              SELECT l_returnflag,
                     CAST(round(l_extendedprice * 100) AS BIGINT) AS c
              FROM lineitem
            ), counts AS (
              SELECT l_returnflag, c, COUNT(*) AS cnt
              FROM cents GROUP BY 1, 2
            ), cum AS (
              SELECT l_returnflag, c,
                     SUM(cnt) OVER (PARTITION BY l_returnflag
                                    ORDER BY c) AS cu,
                     SUM(cnt) OVER (PARTITION BY l_returnflag) AS n
              FROM counts
            ), qs AS (
              SELECT unnest([10, 250, 500, 750, 990]) AS q_permille
            )
            SELECT l_returnflag, CAST(q_permille AS INTEGER) AS q_permille,
                   CAST(MIN(c) AS BIGINT) AS value
            FROM cum, qs
            WHERE cu >= (q_permille * n + 999) // 1000
            GROUP BY 1, 2
        """,
        # Identical hex-prefix sampling rule on both engines: a
        # fixed-width md5 PREFIX compare equals a numeric threshold
        # on the hash, with no integer conversion to disagree on.
        "q_distinct_sketch": """
            SELECT lang,
                   CAST(COUNT(DISTINCT text) AS BIGINT) AS n_kept,
                   CAST(COUNT(DISTINCT text) * 16 AS BIGINT)
                     AS distinct_est
            FROM documents
            WHERE text IS NOT NULL
              AND substring(md5(text), 1, 1) = '0'
            GROUP BY lang
        """,
        # Replays the ENTIRE HyperLogLog independently: same 60-bit
        # md5 hash, top-8-bit bucket, bin()-length rho (never
        # floor(log2)), exact-integer harmonic denominator, and the
        # identical left-associated double arithmetic for the
        # bias-corrected / linear-counting estimate.
        "q_hll": """
            WITH d AS (
              SELECT lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))
                       AS t
              FROM documents
            ), w AS (
              SELECT unnest(string_split(t, ' ')) AS w FROM d
            ), tok AS (
              SELECT w FROM w WHERE w <> ''
            ), h AS (
              SELECT CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) AS h
              FROM tok
            ), r AS (
              SELECT h >> 52 AS bucket,
                     MAX(CASE WHEN (h & ((1::BIGINT << 52) - 1)) = 0
                              THEN 53
                              ELSE 53 - length(bin(h & ((1::BIGINT << 52) - 1)))
                         END) AS rho
              FROM h GROUP BY bucket
            ), a AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n_regs,
                     CAST(SUM(1::BIGINT << CAST(53 - rho AS INTEGER))
                          AS BIGINT) AS denom_used
              FROM r
            ), s AS (
              SELECT CAST(256 AS BIGINT) AS m, n_regs,
                     CAST(256 - n_regs AS BIGINT) AS zero_regs,
                     CAST(denom_used + (256 - n_regs) * (1::BIGINT << 53)
                          AS BIGINT) AS denom
              FROM a
            ), e AS (
              SELECT m, n_regs, zero_regs, denom,
                     ((0.7213 / (1.0 + 1.079 / 256.0)) * 256.0 * 256.0)
                       * 9007199254740992.0 / denom AS raw
              FROM s
            )
            SELECT e.m, e.n_regs, e.zero_regs, e.denom,
                   CAST(round(CASE WHEN raw <= 640.0 AND zero_regs > 0
                                   THEN 256.0 * ln(256.0 / zero_regs)
                                   ELSE raw END, 0) AS BIGINT) AS hll_est,
                   (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) FROM tok)
                     AS exact_distinct
            FROM e
        """,
        # Replays the mixture pipeline end-to-end: token counts, the
        # per-domain aggregate, the overflow-safe two-step rate
        # division, and the (u32*1e6)>>32 membership rule.
        "q_mix": """
            WITH toks AS (
              SELECT lang AS stratum, doc_id,
                     CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                     END AS BIGINT) AS n_toks
              FROM documents
            ), dom AS (
              SELECT stratum, CAST(COUNT(*) AS BIGINT) AS total_docs,
                     CAST(SUM(n_toks) AS BIGINT) AS total_toks
              FROM toks GROUP BY stratum
            ), tot AS (
              SELECT CAST(SUM(total_toks) AS BIGINT) AS corpus_toks FROM dom
            ), w AS (
              SELECT * FROM (VALUES ('en', 300), ('zh', 250), ('es', 200),
                                    ('de', 150), ('fr', 100))
                     AS t(stratum, w_milli)
            ), rates AS (
              SELECT d.stratum,
                     CAST(COALESCE(w.w_milli, 0) AS BIGINT) AS w_milli,
                     d.total_docs, d.total_toks,
                     CAST(CASE WHEN d.total_toks = 0 THEN 0
                          ELSE least(1000000,
                            (((tot.corpus_toks * 4) // 5)
                              * COALESCE(w.w_milli, 0))
                              // d.total_toks * 1000
                            + ((((tot.corpus_toks * 4) // 5)
                              * COALESCE(w.w_milli, 0))
                              % d.total_toks) * 1000 // d.total_toks)
                     END AS BIGINT) AS rate_ppm
              FROM dom d LEFT JOIN w USING (stratum), tot
            ), kept AS (
              SELECT t.stratum, CAST(COUNT(*) AS BIGINT) AS kept_docs,
                     CAST(SUM(t.n_toks) AS BIGINT) AS kept_toks
              FROM toks t JOIN rates r USING (stratum)
              WHERE (CAST('0x' || substr(md5(CAST(t.doc_id AS VARCHAR)), 1, 8)
                          AS BIGINT) * 1000000) >> 32 < r.rate_ppm
              GROUP BY t.stratum
            )
            SELECT r.stratum, r.w_milli, r.total_docs, r.total_toks,
                   r.rate_ppm,
                   CAST(COALESCE(k.kept_docs, 0) AS BIGINT) AS kept_docs,
                   CAST(COALESCE(k.kept_toks, 0) AS BIGINT) AS kept_toks
            FROM rates r LEFT JOIN kept k USING (stratum)
        """,
        # Replays the ENTIRE log-linear sketch independently: same
        # clamped-and-self-corrected exponent (integer-shift compares
        # make the bucket float-proof), same pure-shift sub-bucket,
        # same rank rule and lower-bound estimate — bit-exact by
        # construction, not by luck.
        "q_sketch_quantiles": """
            WITH v AS (
              SELECT o_orderpriority AS grp,
                     CAST(round(o_totalprice * 100) AS BIGINT) AS v
              FROM orders
              WHERE CAST(round(o_totalprice * 100) AS BIGINT) >= 1
            ), e0 AS (
              SELECT grp, v,
                     LEAST(GREATEST(
                       CAST(floor(log2(v)) AS INTEGER), 0), 62) AS e0
              FROM v
            ), ec AS (
              SELECT grp, v,
                     CASE
                       WHEN e0 < 62
                            AND (CAST(1 AS BIGINT) << (e0 + 1)) <= v
                         THEN e0 + 1
                       WHEN (CAST(1 AS BIGINT) << e0) > v THEN e0 - 1
                       ELSE e0
                     END AS e
              FROM e0
            ), bk AS (
              SELECT grp,
                     CAST(e AS BIGINT) * 16 +
                     CASE WHEN e >= 4
                          THEN (v - (CAST(1 AS BIGINT) << e)) >> (e - 4)
                          ELSE (v - (CAST(1 AS BIGINT) << e)) << (4 - e)
                     END AS bucket
              FROM ec
            ), sk AS (
              SELECT grp, bucket, COUNT(*) AS cnt FROM bk GROUP BY 1, 2
            ), cum AS (
              SELECT grp, bucket,
                     SUM(cnt) OVER (PARTITION BY grp
                                    ORDER BY bucket) AS cu,
                     SUM(cnt) OVER (PARTITION BY grp) AS n
              FROM sk
            ), qs AS (
              SELECT unnest([500, 900, 990]) AS q_permille
            ), picked AS (
              SELECT grp, q_permille, MIN(bucket) AS b,
                     CAST(MAX(n) AS BIGINT) AS n
              FROM cum, qs
              WHERE cu >= (q_permille * n + 999) // 1000
              GROUP BY 1, 2
            )
            SELECT grp AS o_orderpriority,
                   CAST(q_permille AS INTEGER) AS q_permille,
                   CAST((CAST(1 AS BIGINT) << CAST(b // 16 AS INTEGER)) +
                        CASE WHEN b // 16 >= 4
                             THEN (b % 16) << CAST(b // 16 - 4 AS INTEGER)
                             ELSE (b % 16) >> CAST(4 - b // 16 AS INTEGER)
                        END AS BIGINT) AS est,
                   n
            FROM picked
        """,
        # Rebuilds both DSIR distributions and every document weight
        # from raw text: positional lateral unnest for the bigrams
        # (vs Spark's shifted-array transform), DuckDB's own hex→int
        # cast for the feature bucket, per-ln-term micro rounding so
        # the cross-bucket sum is integer on both engines.
        "q_dsir": """
            WITH d AS (
              SELECT doc_id, lang = 'en' AS is_t,
                     list_filter(string_split(
                       lower(regexp_replace(trim(text), '\\s+', ' ', 'g')),
                       ' '), x -> x <> '') AS ws
              FROM documents
            ), feats AS (
              SELECT doc_id, is_t,
                     CAST('0x' ||
                          substr(md5(ws[i] || ' ' || ws[i + 1]), 1, 8)
                          AS BIGINT) % 512 AS b
              FROM d, LATERAL (
                SELECT unnest(generate_series(1, len(ws) - 1)) AS i) s
              WHERE len(ws) >= 2
            ), bc AS (
              SELECT b, COUNT(*) AS cr,
                     SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS ct
              FROM feats GROUP BY b
            ), tot AS (
              SELECT CAST(SUM(cr) AS DOUBLE) AS tr,
                     CAST(SUM(ct) AS DOUBLE) AS tt
              FROM bc
            ), ratios AS (
              SELECT b,
                     CAST(round(ln((ct + 1.0) / (tt + 512)) * 1e6)
                          AS BIGINT)
                     - CAST(round(ln((cr + 1.0) / (tr + 512)) * 1e6)
                            AS BIGINT) AS lr
              FROM bc, tot
            )
            SELECT f.doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_feats,
                   CAST(SUM(r.lr) AS BIGINT) AS logw_micros,
                   CAST(SUM(r.lr) AS BIGINT) > 0 AS selected
            FROM feats f JOIN ratios r USING (b)
            GROUP BY f.doc_id
        """,
        # Naive Bayes quality classifier: class-conditional counts,
        # totals, vocabulary size, add-1 log terms (each rounded to
        # micros BEFORE the per-doc sum), doc prior, and every score
        # rebuilt from raw text + the same weak-label rule.
        "q_nb_quality": """
            WITH d AS (
              SELECT doc_id,
                     CASE WHEN source IN ('src0','src1','src2','src3')
                          THEN 1 ELSE 0 END AS y,
                     lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))
                       AS t
              FROM documents
            ), words AS (
              SELECT doc_id, y, unnest(string_split(t, ' ')) AS w FROM d
            ), words2 AS (
              SELECT doc_id, y, w FROM words WHERE w <> ''
            ), counts AS (
              SELECT w, CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(y) AS BIGINT) AS c_pos
              FROM words2 GROUP BY w
            ), tot AS (
              SELECT CAST(SUM(c_pos) AS BIGINT) AS t_pos,
                     CAST(SUM(n - c_pos) AS BIGINT) AS t_neg,
                     CAST(COUNT(*) AS BIGINT) AS v
              FROM counts
            ), model AS (
              SELECT w,
                     CAST(round(ln((c_pos + 1)
                                   / CAST(t_pos + v AS DOUBLE)) * 1000000)
                          AS BIGINT)
                   - CAST(round(ln((n - c_pos + 1)
                                   / CAST(t_neg + v AS DOUBLE)) * 1000000)
                          AS BIGINT) AS llr_micros
              FROM counts, tot
            ), prior AS (
              SELECT CAST(round(ln((SUM(y) + 1)
                                   / CAST(SUM(1 - y) + 1 AS DOUBLE))
                                * 1000000) AS BIGINT) AS prior_micros
              FROM d
            ), score AS (
              SELECT s.doc_id,
                     CAST(COUNT(*) AS BIGINT) AS n_toks,
                     CAST(SUM(m.llr_micros) AS BIGINT) AS llr_sum_micros
              FROM words2 s JOIN model m USING (w)
              GROUP BY s.doc_id
            )
            SELECT doc_id, n_toks, llr_sum_micros,
                   CAST(llr_sum_micros + p.prior_micros AS BIGINT)
                     AS score_micros,
                   CAST(CASE WHEN llr_sum_micros + p.prior_micros > 0
                             THEN 1 ELSE 0 END AS INT) AS pred
            FROM score CROSS JOIN prior p
        """,
        # Gazetteer mentions: unigram + bigram candidates re-derived
        # with a positional lateral unnest, joined to the VALUES
        # dictionary generated from the SAME Python list as the Spark
        # query (a unigram never contains a space, so string equality
        # alone cannot cross arities).
        "q_gazetteer": f"""
            WITH tok AS (
              SELECT doc_id,
                     list_filter(string_split(
                       lower(regexp_replace(trim(text), '\\s+', ' ', 'g')),
                       ' '), x -> x <> '') AS arr
              FROM documents
            ), uni AS (
              SELECT doc_id, unnest(arr) AS g FROM tok
            ), bi AS (
              SELECT doc_id, arr[i.x] || ' ' || arr[i.x + 1] AS g
              FROM tok, LATERAL (
                SELECT unnest(range(1, len(arr))) AS x) i
            ), cand AS (
              SELECT doc_id, g FROM uni
              UNION ALL SELECT doc_id, g FROM bi
            ), dict(entity) AS (
              VALUES {", ".join("('" + e + "')" for e in _GAZETTEER)}
            )
            SELECT c.doc_id, d.entity,
                   CAST(COUNT(*) AS BIGINT) AS n_mentions
            FROM cand c JOIN dict d ON c.g = d.entity
            GROUP BY c.doc_id, d.entity
        """,
        # PMI collocations: unigram + adjacent-pair counts, the pinned
        # double parenthesization of the PMI argument, micro rounding,
        # min-count guard and (pmi DESC, a, b) cut all replayed.
        "q_collocations": """
            WITH tok AS (
              SELECT list_filter(string_split(
                       lower(regexp_replace(trim(text), '\\s+', ' ', 'g')),
                       ' '), x -> x <> '') AS arr
              FROM documents
            ), words AS (
              SELECT unnest(arr) AS w FROM tok
            ), uc AS (
              SELECT w, CAST(COUNT(*) AS BIGINT) AS c_w
              FROM words GROUP BY w
            ), pairs AS (
              SELECT arr[i.x] AS a, arr[i.x + 1] AS b
              FROM tok, LATERAL (
                SELECT unnest(range(1, len(arr))) AS x) i
            ), pc AS (
              SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n_pair
              FROM pairs GROUP BY a, b
            ), tot AS (
              SELECT (SELECT CAST(SUM(c_w) AS BIGINT) FROM uc) AS n_toks,
                     (SELECT CAST(SUM(n_pair) AS BIGINT) FROM pc) AS n_pairs
            )
            SELECT pc.a, pc.b, pc.n_pair,
                   CAST(round(ln(
                     ((CAST(pc.n_pair AS DOUBLE) * CAST(t.n_toks AS DOUBLE))
                        / CAST(t.n_pairs AS DOUBLE))
                     * (CAST(t.n_toks AS DOUBLE)
                        / (CAST(ua.c_w AS DOUBLE) * CAST(ub.c_w AS DOUBLE)))
                   ) * 1000000) AS BIGINT) AS pmi_micros
            FROM pc
            JOIN uc ua ON pc.a = ua.w
            JOIN uc ub ON pc.b = ub.w
            CROSS JOIN tot t
            WHERE pc.n_pair >= 5
            ORDER BY pmi_micros DESC, pc.a ASC, pc.b ASC
            LIMIT 40
        """,
        # CCNet buckets: the q_bigram_lm model CTEs (independent pair
        # derivation), per-lang distinct-score cumsum, the identical
        # ceil((q*n)/1000) rank rule, and the tie-promoting CASE.
        "q_ccnet": """
            WITH norm AS (
              SELECT doc_id,
                     lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t
              FROM documents
            ), tok AS (
              SELECT doc_id,
                     list_filter(string_split(t, ' '), x -> x <> '') AS arr
              FROM norm
            ), pairs AS (
              SELECT doc_id, arr[i.x] AS prev, arr[i.x + 1] AS w
              FROM tok, LATERAL (
                SELECT unnest(range(1, len(arr))) AS x
              ) i
            ), pc AS (
              SELECT prev, w, COUNT(*) AS cnt FROM pairs GROUP BY prev, w
            ), ctx AS (
              SELECT prev, SUM(cnt) AS ctx_cnt FROM pc GROUP BY prev
            ), tot AS (
              SELECT CAST(SUM(cnt) AS DOUBLE) AS total FROM pc
            ), vocab AS (
              SELECT pc.prev, pc.w,
                     CAST(round(ln(pc.cnt / ctx.ctx_cnt) * 1000000)
                          AS BIGINT) AS lp_micros
              FROM pc JOIN ctx USING (prev)
              ORDER BY pc.cnt DESC, pc.prev ASC, pc.w ASC LIMIT 32
            ), oov AS (
              SELECT CAST(round(ln(0.5 / total) * 1000000) AS BIGINT)
                       AS oov_micros
              FROM tot
            ), scores AS (
              SELECT p.doc_id,
                     CAST(floor(SUM(COALESCE(v.lp_micros, o.oov_micros))
                                / COUNT(*)) AS BIGINT) AS lp
              FROM pairs p
              LEFT JOIN vocab v ON p.prev = v.prev AND p.w = v.w
              CROSS JOIN oov o
              GROUP BY p.doc_id
            ), sl AS (
              SELECT s.doc_id, d.lang, s.lp
              FROM scores s JOIN documents d USING (doc_id)
            ), cnt AS (
              SELECT lang, lp, COUNT(*) AS c FROM sl GROUP BY lang, lp
            ), cum AS (
              SELECT lang, lp,
                     SUM(c) OVER (PARTITION BY lang ORDER BY lp) AS cum,
                     SUM(c) OVER (PARTITION BY lang) AS n
              FROM cnt
            ), cuts AS (
              SELECT lang,
                     MIN(CASE WHEN cum >= (333 * n + 999) // 1000
                              THEN lp END) AS c_lo,
                     MIN(CASE WHEN cum >= (667 * n + 999) // 1000
                              THEN lp END) AS c_hi
              FROM cum GROUP BY lang
            )
            SELECT sl.doc_id, sl.lang, sl.lp AS lp_mean_micros,
                   CASE WHEN sl.lp >= c.c_hi THEN 'head'
                        WHEN sl.lp >= c.c_lo THEN 'middle'
                        ELSE 'tail' END AS bucket
            FROM sl JOIN cuts c USING (lang)
        """,
        # Semantic decontamination: every corpus-vs-benchmark pair
        # cosine (6 dp → micros, the q_cosine_topk discipline), the
        # max / hit-count aggregates and the flag replayed.
        "q_sem_decon": """
            WITH b AS (
              SELECT embedding::DOUBLE[] AS bv FROM embeddings
              WHERE vec_id % 37 = 0
            ), c AS (
              SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
              WHERE NOT (vec_id % 37 = 0)
            ), p AS (
              SELECT c.vec_id,
                     CAST(round(round(
                       list_dot_product(c.v, b.bv)
                       / (sqrt(list_dot_product(c.v, c.v))
                          * sqrt(list_dot_product(b.bv, b.bv))), 6)
                       * 1000000) AS BIGINT) AS cm
              FROM c, b
            )
            SELECT vec_id,
                   CAST(MAX(cm) AS BIGINT) AS max_cos_micros,
                   CAST(SUM(CASE WHEN cm >= 450000 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_hits,
                   CAST(CASE WHEN MAX(cm) >= 450000 THEN 1 ELSE 0 END
                        AS INT) AS contaminated
            FROM p GROUP BY vec_id
        """,
        # Weighted-minhash signature replayed wholesale: tokenize →
        # per-(doc, word) tf capped at 8 → generate_series replicas →
        # min over md5 hex strings (fixed-width hex compare = numeric
        # compare, the q_minhash_md5 discipline).
        "q_wminhash": """
            WITH d AS (
              SELECT doc_id,
                     lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))
                       AS t
              FROM documents
            ), w AS (
              SELECT doc_id, unnest(string_split(t, ' ')) AS w FROM d
            ), wf AS (
              SELECT doc_id, w, LEAST(COUNT(*), 8) AS tf
              FROM w WHERE w <> '' GROUP BY 1, 2
            ), r AS (
              SELECT doc_id, w,
                     unnest(generate_series(1, CAST(tf AS BIGINT))) AS r
              FROM wf
            )
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_replicas,
                   MIN(md5(w || '#' || CAST(r AS VARCHAR) || '#0')) AS h0,
                   MIN(md5(w || '#' || CAST(r AS VARCHAR) || '#1')) AS h1,
                   MIN(md5(w || '#' || CAST(r AS VARCHAR) || '#2')) AS h2,
                   MIN(md5(w || '#' || CAST(r AS VARCHAR) || '#3')) AS h3
            FROM r GROUP BY doc_id
        """,
        "q_shard": """
            SELECT doc_id,
                   CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                        AS BIGINT) % 8 AS shard,
                   CAST(ROW_NUMBER() OVER (
                     PARTITION BY CAST('0x' ||
                       substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                       AS BIGINT) % 8
                     ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ) AS BIGINT) AS pos
            FROM documents
        """,
        # Both rankers replayed end-to-end (the BM25 CTE chain is the
        # q_bm25 oracle verbatim; the cosine list the q_cosine_topk
        # one), then the RRF integer arithmetic on top.
        "q_rrf_fusion": """
            WITH norm AS (
              SELECT doc_id,
                     lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t
              FROM documents
            ), words AS (
              SELECT doc_id, unnest(string_split(t, ' ')) AS w FROM norm
            ), w2 AS (
              SELECT doc_id, w FROM words WHERE w <> ''
            ), dl AS (
              SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
              FROM w2 GROUP BY doc_id
            ), stats AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                     greatest((CAST(SUM(dl) AS BIGINT) * 1000000)
                              // greatest(COUNT(*), 1), 1) AS avgdl_micros
              FROM dl
            ), tf AS (
              SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf
              FROM w2 WHERE w IN ('data', 'query', 'spark')
              GROUP BY doc_id, w
            ), idf AS (
              SELECT w,
                     CAST(round(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
                                * 1000000) AS BIGINT) AS idf_micros
              FROM (
                SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY w
              ), stats
            ), scored AS (
              SELECT tf.doc_id,
                     idf_micros * (
                       tf * 220 * 10000000000 // (
                         tf * 1000000 + 120 * (
                           250000
                           + 75 * (dl.dl * 1000000000000 // avgdl_micros)
                             // 100
                         ) // 100
                       )
                     ) // 1000000 AS s_micros
              FROM tf JOIN idf USING (w) JOIN dl USING (doc_id), stats
            ), bmtop AS (
              SELECT doc_id,
                     ROW_NUMBER() OVER (ORDER BY score_micros DESC,
                                        doc_id ASC) AS rank
              FROM (
                SELECT doc_id, SUM(s_micros) AS score_micros
                FROM scored GROUP BY doc_id
                ORDER BY score_micros DESC, doc_id ASC LIMIT 20
              )
            ), q AS (
              SELECT embedding::DOUBLE[] AS qv FROM embeddings
              WHERE vec_id = 0
            ), costop AS (
              SELECT doc_id,
                     ROW_NUMBER() OVER (ORDER BY cos DESC,
                                        doc_id ASC) AS rank
              FROM (
                SELECT e.vec_id AS doc_id,
                       round(
                         list_dot_product(e.embedding::DOUBLE[], q.qv)
                         / (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                                  e.embedding::DOUBLE[]))
                            * sqrt(list_dot_product(q.qv, q.qv))), 6)
                         AS cos
                FROM embeddings e, q
                ORDER BY cos DESC, e.vec_id LIMIT 20
              )
            ), u AS (
              SELECT doc_id, 1000000 // (60 + rank) AS c FROM bmtop
              UNION ALL
              SELECT doc_id, 1000000 // (60 + rank) AS c FROM costop
            )
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lists,
                   CAST(SUM(c) AS BIGINT) AS rrf_micros
            FROM u GROUP BY doc_id
        """,
        # Bloom decontamination replayed bit-exactly — INCLUDING the
        # deterministic false positives: set bits and the 4-way
        # membership test rebuilt from raw text with DuckDB's own
        # hex→int cast; span derivation mirrors q_span_dedup's.
        "q_bloom_decon": """
            WITH norm AS (
              SELECT doc_id,
                     lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t
              FROM documents
            ), toks AS (
              SELECT doc_id, t, string_split(t, ' ') AS w FROM norm
            ), expanded AS (
              SELECT doc_id, w,
                     unnest(generate_series(1, len(w) - 12)) AS i
              FROM toks WHERE len(w) >= 13
            ), spans AS (
              SELECT doc_id, array_to_string(w[i : i + 12], ' ') AS g
              FROM expanded
              UNION ALL
              SELECT doc_id, t AS g FROM toks WHERE len(w) < 13
            ), bits AS (
              SELECT DISTINCT
                     CAST('0x' || substr(md5(s.g || '#' ||
                          CAST(j.j AS VARCHAR)), 1, 8) AS BIGINT)
                       % 65536 AS pos
              FROM spans s, (SELECT unnest([0, 1, 2, 3]) AS j) j
              WHERE s.doc_id % 23 = 0
            ), probed AS (
              SELECT doc_id,
                CAST('0x' || substr(md5(g || '#0'), 1, 8) AS BIGINT)
                  % 65536 AS p0,
                CAST('0x' || substr(md5(g || '#1'), 1, 8) AS BIGINT)
                  % 65536 AS p1,
                CAST('0x' || substr(md5(g || '#2'), 1, 8) AS BIGINT)
                  % 65536 AS p2,
                CAST('0x' || substr(md5(g || '#3'), 1, 8) AS BIGINT)
                  % 65536 AS p3
              FROM spans
            ), flagged AS (
              SELECT doc_id,
                     CASE WHEN p0 IN (SELECT pos FROM bits)
                           AND p1 IN (SELECT pos FROM bits)
                           AND p2 IN (SELECT pos FROM bits)
                           AND p3 IN (SELECT pos FROM bits)
                          THEN 1 ELSE 0 END AS hit
              FROM probed
            )
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_spans,
                   CAST(SUM(hit) AS BIGINT) AS n_hits,
                   round(SUM(hit) / COUNT(*)::DOUBLE, 6) AS hit_frac
            FROM flagged
            GROUP BY doc_id
        """,
        # Count-min cells, probes, and the min rule all replayed; the
        # LEFT JOIN + COALESCE(0) mirrors the absent-cell-reads-zero
        # convention.
        "q_countmin": """
            WITH d AS (
              SELECT lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))
                       AS t
              FROM documents
            ), w AS (
              SELECT unnest(string_split(t, ' ')) AS w FROM d
            ), wf AS (
              SELECT w, COUNT(*) AS exact_cnt FROM w
              WHERE w <> '' GROUP BY w
            ), top AS (
              SELECT w, CAST(exact_cnt AS BIGINT) AS exact_cnt
              FROM wf ORDER BY exact_cnt DESC, w ASC LIMIT 20
            ), cells AS (
              SELECT j.j AS row,
                     CAST('0x' || substr(md5(w.w || '#' ||
                          CAST(j.j AS VARCHAR)), 1, 8) AS BIGINT)
                       % 64 AS col,
                     COUNT(*) AS cnt
              FROM w, (SELECT unnest([0, 1, 2, 3]) AS j) j
              WHERE w.w <> ''
              GROUP BY 1, 2
            ), probe AS (
              SELECT t.w, t.exact_cnt, j.j AS row,
                     CAST('0x' || substr(md5(t.w || '#' ||
                          CAST(j.j AS VARCHAR)), 1, 8) AS BIGINT)
                       % 64 AS col
              FROM top t, (SELECT unnest([0, 1, 2, 3]) AS j) j
            )
            SELECT p.w, p.exact_cnt,
                   CAST(MIN(COALESCE(c.cnt, 0)) AS BIGINT) AS cms_est
            FROM probe p LEFT JOIN cells c USING (row, col)
            GROUP BY p.w, p.exact_cnt
        """,
        # Streaming-vs-batch equivalence for the windowed HDR sketch:
        # DuckDB rebuilds the day windows, the watermark eviction cut
        # (window_end <= max(ts) - 2h over the FILTERED rows — the
        # filter precedes the watermark in the stream too), the
        # clamped/self-corrected bucket math, and the quantile
        # extraction — all from raw events.
        # Streaming count-min: day windows, the eviction cut, the md5
        # cells, the three probes and the min-with-absent-cell=0 rule
        # all rebuilt from raw events.
        "stream_countmin": f"""
            WITH ev AS (
              SELECT CAST(user_id AS VARCHAR) AS uid, ts FROM events
            ), mx AS (
              SELECT max(ts) AS mts FROM ev
            ), kept AS (
              SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                     uid
              FROM ev, mx
              WHERE date_trunc('day', ts) + INTERVAL 1 DAY
                    <= mts - INTERVAL 2 HOUR
            ), cells AS (
              SELECT day, i.r AS row,
                     CAST('0x' || substr(md5(uid || '#' ||
                          CAST(i.r AS VARCHAR)), 1, 8) AS BIGINT) % 64
                       AS col,
                     CAST(COUNT(*) AS BIGINT) AS cnt
              FROM kept, LATERAL (
                SELECT unnest(range(0, 4)) AS r) i
              GROUP BY 1, 2, 3
            ), probes AS (
              SELECT d.day, u.uid, i.r AS row,
                     CAST('0x' || substr(md5(u.uid || '#' ||
                          CAST(i.r AS VARCHAR)), 1, 8) AS BIGINT) % 64
                       AS col
              FROM (SELECT DISTINCT day FROM kept) d
              CROSS JOIN (SELECT unnest([{", ".join("'" + u + "'" for u in _CM_PROBE_UIDS)}]) AS uid) u
              CROSS JOIN (SELECT unnest(range(0, 4)) AS r) i
            )
            SELECT p.day, p.uid,
                   CAST(MIN(COALESCE(c.cnt, 0)) AS BIGINT) AS cms_est
            FROM probes p
            LEFT JOIN cells c
              ON c.day = p.day AND c.row = p.row AND c.col = p.col
            GROUP BY p.day, p.uid
            ORDER BY p.day, p.uid
        """,
        # Streaming HLL: registers, eviction cut, exact-integer
        # denominators and the estimate arithmetic all replayed from
        # raw events (the q_hll discipline, per closed day).
        "stream_hll": """
            WITH ev AS (
              SELECT CAST(user_id AS VARCHAR) AS uid, ts FROM events
            ), mx AS (
              SELECT max(ts) AS mts FROM ev
            ), kept AS (
              SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                     uid
              FROM ev, mx
              WHERE date_trunc('day', ts) + INTERVAL 1 DAY
                    <= mts - INTERVAL 2 HOUR
            ), h AS (
              SELECT day,
                     CAST('0x' || substr(md5(uid), 1, 15) AS BIGINT) AS h
              FROM kept
            ), r AS (
              SELECT day, h >> 54 AS bucket,
                     MAX(CASE WHEN (h & ((1::BIGINT << 54) - 1)) = 0
                              THEN 55
                              ELSE 55 - length(bin(h & ((1::BIGINT << 54) - 1)))
                         END) AS rho
              FROM h GROUP BY day, bucket
            ), a AS (
              SELECT day, CAST(COUNT(*) AS BIGINT) AS n_regs,
                     CAST(SUM(1::BIGINT << CAST(55 - rho AS INTEGER))
                          AS BIGINT) AS denom_used
              FROM r GROUP BY day
            ), s AS (
              SELECT day, n_regs,
                     CAST(64 - n_regs AS BIGINT) AS zero_regs,
                     CAST(denom_used + (64 - n_regs) * (1::BIGINT << 55)
                          AS BIGINT) AS denom
              FROM a
            ), e AS (
              SELECT day, n_regs, zero_regs, denom,
                     CAST(0.709 AS DOUBLE) * 64.0 * 64.0
                       * 36028797018963968.0 / denom AS raw
              FROM s
            )
            SELECT day, n_regs, zero_regs, denom,
                   CAST(round(CASE WHEN raw <= 160.0 AND zero_regs > 0
                                   THEN 64.0 * ln(64.0 / zero_regs)
                                   ELSE raw END, 0) AS BIGINT) AS hll_est
            FROM e ORDER BY day
        """,
        "stream_quantiles": """
            WITH ev AS (
              SELECT event_type, ts,
                     CAST(round(value * 100) AS BIGINT) AS v
              FROM events
              WHERE CAST(round(value * 100) AS BIGINT) >= 1
            ), mx AS (
              SELECT max(ts) AS mts FROM ev
            ), kept AS (
              SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                     event_type, v
              FROM ev, mx
              WHERE date_trunc('day', ts) + INTERVAL 1 DAY
                    <= mts - INTERVAL 2 HOUR
            ), e0 AS (
              SELECT day, event_type, v,
                     LEAST(GREATEST(
                       CAST(floor(log2(v)) AS INTEGER), 0), 62) AS e0
              FROM kept
            ), ec AS (
              SELECT day, event_type, v,
                     CASE
                       WHEN e0 < 62
                            AND (CAST(1 AS BIGINT) << (e0 + 1)) <= v
                         THEN e0 + 1
                       WHEN (CAST(1 AS BIGINT) << e0) > v THEN e0 - 1
                       ELSE e0
                     END AS e
              FROM e0
            ), bk AS (
              SELECT day, event_type,
                     CAST(e AS BIGINT) * 16 +
                     CASE WHEN e >= 4
                          THEN (v - (CAST(1 AS BIGINT) << e)) >> (e - 4)
                          ELSE (v - (CAST(1 AS BIGINT) << e)) << (4 - e)
                     END AS bucket
              FROM ec
            ), sk AS (
              SELECT day, event_type, bucket, COUNT(*) AS cnt
              FROM bk GROUP BY 1, 2, 3
            ), cum AS (
              SELECT day, event_type, bucket,
                     SUM(cnt) OVER (PARTITION BY day, event_type
                                    ORDER BY bucket) AS cu,
                     SUM(cnt) OVER (PARTITION BY day, event_type) AS n
              FROM sk
            ), qs AS (
              SELECT unnest([500, 950]) AS q_permille
            ), picked AS (
              SELECT day, event_type, q_permille, MIN(bucket) AS b,
                     CAST(MAX(n) AS BIGINT) AS n
              FROM cum, qs
              WHERE cu >= (q_permille * n + 999) // 1000
              GROUP BY 1, 2, 3
            )
            SELECT day, event_type,
                   CAST(q_permille AS INTEGER) AS q_permille,
                   CAST((CAST(1 AS BIGINT) << CAST(b // 16 AS INTEGER)) +
                        CASE WHEN b // 16 >= 4
                             THEN (b % 16) << CAST(b // 16 - 4 AS INTEGER)
                             ELSE (b % 16) >> CAST(4 - b // 16 AS INTEGER)
                        END AS BIGINT) AS est,
                   n
            FROM picked
        """,
        "q_bpe_train": _bpe_oracle_sql(BPE_MERGES),
        # bpe_words recomputed from raw text with the identical
        # Java-whitespace rule (the class is embedded as RAW control
        # characters, so both engines see the same bytes); bpe_tokens
        # re-aggregated from the materialized per-doc counts.
        "q_bpe_tokenize": f"""
            WITH m AS (
              SELECT doc_id, bpe_tokens
              FROM read_parquet(
                '{ORACLE_DIR}/sf0.01/bpe_tokenized/*.parquet')
            )
            SELECT d.doc_id,
                   CAST(CASE WHEN d.text IS NULL
                               OR length(trim(d.text, ' \t\n\x0b\f\r')) = 0
                             THEN 0
                        ELSE len(regexp_split_to_array(
                               trim(d.text, ' \t\n\x0b\f\r'),
                               '[ \t\n\x0b\f\r]+'))
                        END AS BIGINT) AS bpe_words,
                   m.bpe_tokens
            FROM documents d JOIN m USING (doc_id)
            ORDER BY doc_id
        """,
        # The two-level prefix sum must equal the plain global window
        # cumsum it decomposes; same token rule as q_token_stats.
        "q_pack_sequences": """
            WITH counted AS (
              SELECT doc_id,
                     CAST(CASE WHEN text IS NULL OR length(trim(text)) = 0
                               THEN 0
                               ELSE len(regexp_split_to_array(trim(text),
                                                              '\\s+'))
                          END AS BIGINT) AS n_tokens
              FROM documents
            ), cum AS (
              SELECT doc_id, n_tokens,
                     CAST(COALESCE(SUM(n_tokens) OVER (
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0) AS BIGINT) AS tok_offset
              FROM counted
            )
            SELECT doc_id, n_tokens, tok_offset,
                   tok_offset // 2048 AS seq_first,
                   greatest(tok_offset, tok_offset + n_tokens - 1) // 2048
                     AS seq_last
            FROM cum
        """,
        # Gaps-and-islands replay of Spark's native session_window:
        # a new island when the inter-event gap >= 30 min (an event at
        # exactly start+gap starts a NEW session); end = last + 30 min.
        "q_session_window": """
            WITH ordered AS (
              SELECT user_id, ts,
                     CASE WHEN ts - lag(ts) OVER (
                            PARTITION BY user_id ORDER BY ts
                          ) >= INTERVAL 30 MINUTE
                          OR lag(ts) OVER (
                            PARTITION BY user_id ORDER BY ts
                          ) IS NULL
                          THEN 1 ELSE 0 END AS boundary
              FROM events
            ), islands AS (
              SELECT user_id, ts,
                     SUM(boundary) OVER (
                       PARTITION BY user_id ORDER BY ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                     ) AS island
              FROM ordered
            )
            SELECT user_id,
                   strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS sess_start,
                   strftime(MAX(ts) + INTERVAL 30 MINUTE,
                            '%Y-%m-%d %H:%M:%S.%f') AS sess_end,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM islands
            GROUP BY user_id, island
        """,
        # Same islands rebuild as q_session_window, PLUS the streaming
        # eviction cut: only sessions whose end (last + 30 min) is at
        # or before the final watermark max(ts) - 2 h were emitted
        # (boundary included — pinned empirically).
        # Streaming-vs-batch equivalence for near-dup suppression:
        # the stream feeds id-ordered slices, so "best earlier doc"
        # is brute-forceable as min (hamming, then id) over all
        # smaller-id docs within Hamming 3 — from signatures
        # materialized by an independent BATCH run of the same UDF.
        "stream_near_dups": f"""
            WITH s AS (
              SELECT doc_id, simhash
              FROM read_parquet(
                '{ORACLE_DIR}/sf0.01/stream_simhash_sigs/*.parquet')
            ), pairs AS (
              SELECT b.doc_id AS doc_id, a.doc_id AS dup_of,
                     CAST(bit_count(xor(a.simhash, b.simhash))
                          AS INTEGER) AS hamming
              FROM s a JOIN s b ON a.doc_id < b.doc_id
              WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
            ), ranked AS (
              SELECT doc_id, dup_of, hamming,
                     row_number() OVER (PARTITION BY doc_id
                                        ORDER BY hamming, dup_of) AS rn
              FROM pairs
            )
            SELECT doc_id, CAST(dup_of AS BIGINT) AS dup_of, hamming
            FROM ranked WHERE rn = 1 ORDER BY doc_id
        """,
        "stream_sessions": """
            WITH ordered AS (
              SELECT user_id, ts,
                     CASE WHEN ts - lag(ts) OVER (
                            PARTITION BY user_id ORDER BY ts
                          ) >= INTERVAL 30 MINUTE
                          OR lag(ts) OVER (
                            PARTITION BY user_id ORDER BY ts
                          ) IS NULL
                          THEN 1 ELSE 0 END AS boundary
              FROM events
            ), islands AS (
              SELECT user_id, ts,
                     SUM(boundary) OVER (
                       PARTITION BY user_id ORDER BY ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                     ) AS island
              FROM ordered
            ), sess AS (
              SELECT user_id,
                     MIN(ts) AS s,
                     MAX(ts) + INTERVAL 30 MINUTE AS e,
                     CAST(COUNT(*) AS BIGINT) AS n_events
              FROM islands
              GROUP BY user_id, island
            )
            SELECT user_id,
                   strftime(s, '%Y-%m-%d %H:%M:%S.%f') AS sess_start,
                   strftime(e, '%Y-%m-%d %H:%M:%S.%f') AS sess_end,
                   n_events
            FROM sess
            WHERE e <= (SELECT MAX(ts) FROM events) - INTERVAL 2 HOUR
        """,
        "q_fact_fusion": _fusion_oracle_sql(n_iter=3, final="winners"),
        "q_source_trust": _fusion_oracle_sql(n_iter=3, final="trust"),
        "q_owl_entail": _owl_oracle_sql(n_rounds=6),
        # negated property set: both components as NOT-IN scans,
        # DISTINCT + full-order LIMIT for a unique cut
        "q_sparql_npath": f"""
            WITH t AS (
              SELECT s, p, o
              FROM read_parquet('{ORACLE_DIR}/sf0.01/triples/*.parquet')
            ), u AS (
              SELECT s AS x, o AS y FROM t
              WHERE p NOT IN ('http://schema.org/name',
                              'http://schema.org/relatedLink')
              UNION ALL
              SELECT o AS x, s AS y FROM t
              WHERE p NOT IN ('http://schema.org/author')
            )
            SELECT DISTINCT x, y FROM u ORDER BY x, y LIMIT 600
        """,
        # SPARQL subselect: the inner grouped aggregate as a plain
        # subquery joined on the projected variable.
        "q_sparql_subselect": f"""
            WITH t AS (
              SELECT s, p, o
              FROM read_parquet('{ORACLE_DIR}/sf0.01/triples/*.parquet')
            ), sub AS (
              SELECT s AS x, CAST(COUNT(o) AS BIGINT) AS n
              FROM t WHERE p = 'http://schema.org/relatedLink'
              GROUP BY s
            )
            SELECT nm.s AS x, nm.o AS name, sub.n
            FROM t nm JOIN sub ON sub.x = nm.s
            WHERE nm.p = 'http://schema.org/name'
            ORDER BY x, name LIMIT 400
        """,
        # SURT keys: the synthesis re-derived from doc_id and every
        # rule replayed with DuckDB's own string/list functions.
        "q_surt": r"""
            WITH raw AS (
              SELECT doc_id,
                CASE CAST(doc_id % 5 AS INTEGER)
                  WHEN 0 THEN 'https://WWW.Site' || (doc_id % 20)
                       || '.Example.COM/p/' || (doc_id % 100)
                       || '?b=' || (doc_id % 9) || '&a=1'
                  WHEN 1 THEN 'http://site' || (doc_id % 20)
                       || '.example.com:80/p/' || (doc_id % 100)
                  WHEN 2 THEN 'https://site' || (doc_id % 20)
                       || '.example.com:8443/P/' || (doc_id % 100)
                       || '#frag'
                  WHEN 3 THEN 'http://www2.files.site' || (doc_id % 20)
                       || '.example.net'
                  ELSE 'relative/path/' || (doc_id % 100)
                END AS url
              FROM documents
            ), parts AS (
              SELECT doc_id, url,
                lower(regexp_extract(url,
                  '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
                lower(regexp_extract(url,
                  '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS hp,
                regexp_extract(url,
                  '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS pth,
                regexp_extract(url, '\?([^#]*)', 1) AS qry
              FROM raw
            ), norm AS (
              SELECT doc_id, url, scheme,
                regexp_replace(regexp_extract(hp, '^([^:]*)', 1),
                               '^www[0-9]*\.', '') AS host,
                CASE WHEN (scheme = 'http'
                           AND regexp_extract(hp, ':([0-9]+)$', 1) = '80')
                       OR (scheme = 'https'
                           AND regexp_extract(hp, ':([0-9]+)$', 1) = '443')
                     THEN ''
                     ELSE regexp_extract(hp, ':([0-9]+)$', 1) END AS port,
                CASE WHEN pth = '' THEN '/' ELSE pth END AS pth,
                qry
              FROM parts
            )
            SELECT doc_id, url,
              CASE WHEN scheme = '' THEN NULL
                ELSE array_to_string(list_reverse(string_split(host, '.')),
                                     ',')
                  || CASE WHEN port = '' THEN '' ELSE ':' || port END
                  || ')' || pth
                  || CASE WHEN qry = '' THEN ''
                     ELSE '?' || array_to_string(
                            list_sort(string_split(qry, '&')), '&') END
              END AS surt
            FROM norm
        """,
        # CDX index: every column recomputed from the materialized
        # (url, warc_ts, html) parquet — DuckDB's own SURT chain,
        # strftime, md5, octet_length. Row order is not compared
        # (the driver sorts), only the exact row set.
        "q_cdx": f"""
            WITH p AS (
              SELECT url, warc_ts, html
              FROM read_parquet('{ORACLE_DIR}/sf0.01/warc_src/*.parquet')
            ), parts AS (
              SELECT url, warc_ts, html,
                lower(regexp_extract(url,
                  '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
                lower(regexp_extract(url,
                  '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS hp,
                regexp_extract(url,
                  '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS pth,
                regexp_extract(url, '\\?([^#]*)', 1) AS qry
              FROM p
            ), norm AS (
              SELECT url, warc_ts, html, scheme,
                regexp_replace(regexp_extract(hp, '^([^:]*)', 1),
                               '^www[0-9]*\\.', '') AS host,
                CASE WHEN (scheme = 'http'
                           AND regexp_extract(hp, ':([0-9]+)$', 1) = '80')
                       OR (scheme = 'https'
                           AND regexp_extract(hp, ':([0-9]+)$', 1) = '443')
                     THEN ''
                     ELSE regexp_extract(hp, ':([0-9]+)$', 1) END AS port,
                CASE WHEN pth = '' THEN '/' ELSE pth END AS pth,
                qry
              FROM parts
            )
            SELECT
              array_to_string(list_reverse(string_split(host, '.')), ',')
                || CASE WHEN port = '' THEN '' ELSE ':' || port END
                || ')' || pth
                || CASE WHEN qry = '' THEN ''
                   ELSE '?' || array_to_string(
                          list_sort(string_split(qry, '&')), '&') END
                AS surt,
              strftime(warc_ts, '%Y%m%d%H%M%S') AS ts,
              url,
              md5(decode(html)) AS digest,
              CAST(octet_length(html) AS BIGINT) AS length
            FROM norm
            WHERE scheme <> ''
        """,
        # Redirect resolution: hop-at-a-time recursive CTE bounded at
        # max_hops — a structurally different formulation than the
        # Spark pointer doubling; terminal states must coincide.
        "q_redirects": """
            WITH RECURSIVE raw AS (
              SELECT 'u' || CAST(doc_id % 311 AS VARCHAR) AS src,
                     'u' || CAST((doc_id % 311) // 2 AS VARCHAR) AS dst
              FROM documents WHERE doc_id % 311 > 0
              UNION ALL
              SELECT 'c' || CAST(doc_id % 13 AS VARCHAR),
                     'c' || CAST((doc_id % 13 + 1) % 13 AS VARCHAR)
              FROM documents
              UNION ALL
              SELECT 'm' || CAST(doc_id % 5 AS VARCHAR),
                     CASE WHEN doc_id % 2 = 0
                          THEN 'u' || CAST(doc_id % 5 AS VARCHAR)
                          ELSE 't' || CAST(doc_id % 5 AS VARCHAR) END
              FROM documents
            ), edges AS (
              SELECT src, MIN(dst) AS dst FROM raw GROUP BY src
            ), walk(src, cur, dist) AS (
              SELECT src, dst, 1 FROM edges
              UNION ALL
              SELECT w.src, e.dst, w.dist + 1
              FROM walk w JOIN edges e ON e.src = w.cur
              WHERE w.dist < 20
            ), resolved AS (
              SELECT w.src, w.cur AS final, CAST(w.dist AS BIGINT) AS hops
              FROM walk w
              LEFT JOIN edges e ON e.src = w.cur
              WHERE e.src IS NULL
            )
            SELECT s.src,
                   COALESCE(r.final, '') AS final,
                   CAST(COALESCE(r.hops, -1) AS BIGINT) AS hops,
                   CASE WHEN r.src IS NULL THEN 'unresolved'
                        ELSE 'ok' END AS status
            FROM (SELECT DISTINCT src FROM edges) s
            LEFT JOIN resolved r ON r.src = s.src
        """,
    }
