"""Similarity search over an embedding column (``array<float>``).

Two paths, same results contract:

- ``brute_force_topk`` — exact cosine top-k. JVM-side zip_with /
  aggregate dot products (no Python), one pass over the table + a
  top-k sort. The correctness baseline, and the right choice when
  the query set is small and the table scan is already needed.
- ``ivf_topk`` — IVF-style two-stage search for scale: vectors are
  pre-assigned to centroids (coarse quantizer built once with a
  deterministic k-means on a sample), a query probes only the
  ``n_probe`` nearest centroid partitions. At 100 TB this turns a
  full scan per query into a read of n_probe/k of the data —
  partition pruning does the rest when the table is written
  partitioned by centroid id.

Both are deterministic (fixed seeds; ties broken by id).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from serd_spark.operators.dedup import cosine


def brute_force_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k for one query vector. The query is a
    literal array (broadcast by value into codegen); ordering ties
    break on id, so results are total-ordered and retry-stable."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        emb.select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), 6).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.col(id_col))
        .limit(k)
    )


# ------------------------------------------------------------ IVF path

def train_centroids(
    emb: DataFrame,
    n_centroids: int = 16,
    n_iter: int = 8,
    sample_rows: int = 4096,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 11,
) -> np.ndarray:
    """Deterministic Lloyd's k-means on a driver-side sample — the
    coarse quantizer.

    The sample is the ``sample_rows`` vectors whose ``xxhash64(id)``
    is smallest — a pure function of ids, so it is IDENTICAL across
    partition layouts, task retries, and cluster sizes (a bare
    ``limit()`` depends on partition order).  Spark compiles the
    ordered limit to TakeOrderedAndProject: one scan with a
    per-partition top-N heap and an N-row merge on the driver — no
    global sort shuffle, no full collect, at any table size."""
    rows = (
        emb.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
        .limit(sample_rows)
        .collect()
    )
    sample = np.array(
        [np.asarray(r[1], dtype=np.float64) for r in rows]
    )
    if len(sample) == 0:
        raise ValueError("train_centroids: embedding table is empty")
    # clamp: a table smaller than n_centroids must not crash the
    # seeding draw (rng.choice with replace=False needs size <= pop)
    n_centroids = min(n_centroids, len(sample))
    rng = np.random.default_rng(seed)
    cents = sample[rng.choice(len(sample), size=n_centroids, replace=False)]
    for _ in range(n_iter):
        # cosine assignment: normalize then argmax dot (zero-norm
        # guard: one all-zero vector must not NaN-poison every mean)
        sn = sample / np.maximum(
            np.linalg.norm(sample, axis=1, keepdims=True), 1e-12
        )
        cn = cents / np.maximum(
            np.linalg.norm(cents, axis=1, keepdims=True), 1e-12
        )
        assign = (sn @ cn.T).argmax(axis=1)
        for c in range(n_centroids):
            members = sample[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents


def assign_centroids(
    emb: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Vector → nearest centroid id. numpy matmul per Arrow batch
    (shuffle-free); write the result partitioned by ``centroid`` to
    get partition-pruned probes."""
    cn = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame({id_col: [], vec_col: [], "centroid": []})
                continue
            m = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            pdf = pdf.copy()
            pdf["centroid"] = (mn @ cn.T).argmax(axis=1).astype(np.int32)
            yield pdf

    schema = f"{id_col} long, {vec_col} array<float>, centroid int"
    return emb.select(id_col, vec_col).mapInPandas(run, schema=schema)


def probe_ids(
    centroids: np.ndarray, query_vec: list[float], n_probe: int = 4
) -> list[int]:
    """The ``n_probe`` centroid ids nearest the query by cosine —
    driver-side (centroid count is tiny by construction)."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    cn = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
    )
    return [int(c) for c in (cn @ qn).argsort()[::-1][:n_probe]]


def ivf_topk(
    assigned: DataFrame,
    centroids: np.ndarray,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe the ``n_probe`` centroids nearest the query, exact
    cosine inside them. The centroid filter is an IN-list literal →
    partition pruning when ``assigned`` is stored partitioned by
    centroid."""
    probes = probe_ids(centroids, query_vec, n_probe)
    return brute_force_topk(
        assigned.filter(F.col("centroid").isin(probes)),
        query_vec,
        k=k,
        id_col=id_col,
        vec_col=vec_col,
    )


def semantic_decontaminate(
    emb: DataFrame,
    bench_pred,
    threshold_micros: int = 450_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-space benchmark decontamination — the semantic
    complement to ``corpus.decontaminate``'s exact 13-gram overlap:
    a corpus document is contaminated when some benchmark item is
    CLOSE in embedding space even if no n-gram matches (paraphrased
    test questions, translated eval sets — the contamination that
    string overlap provably misses, which is why the recent LLM
    reports run both checks).

    ``bench_pred`` marks the benchmark rows inside ``emb``; every
    other row is corpus. Per corpus vector: max cosine against the
    benchmark set, the number of benchmark items above
    ``threshold_micros``, and the keep/flag decision.

    Cross-engine exactness: each pair cosine is rounded to 6 dp (the
    repo-wide per-row float rule), scaled to integer MICROS, and only
    integers are aggregated — max/count never touch floats.

    Scale shape (100 TB): a benchmark suite is thousands of vectors
    vs billions of corpus rows, so the benchmark side is BROADCAST
    (BroadcastNestedLoopJoin — the corpus never shuffles) and the
    per-vector aggregate partial-combines the B pair rows back to one
    row per corpus vector map-side. When the benchmark itself grows
    past broadcast scale, pre-bucket both sides with
    ``hyperplane_buckets`` and run this inside buckets — same
    verdict columns, LSH-bounded pair count.

    Returns (id_col, max_cos_micros, n_hits, contaminated)."""
    from serd_spark.operators.dedup import cosine

    bench = emb.filter(bench_pred).select(
        F.col(id_col).alias("_bid"), F.col(vec_col).alias("_bvec")
    )
    corpus = emb.filter(~bench_pred).select(id_col, vec_col)
    cm = (
        F.round(F.round(cosine(F.col(vec_col), F.col("_bvec")), 6) * 1e6)
        .cast("long")
        .alias("_cm")
    )
    thr = F.lit(int(threshold_micros)).cast("long")
    return (
        corpus.crossJoin(F.broadcast(bench))
        .select(id_col, cm)
        .groupBy(id_col)
        .agg(
            F.max("_cm").alias("max_cos_micros"),
            F.sum(F.when(F.col("_cm") >= thr, 1).otherwise(0))
            .cast("long")
            .alias("n_hits"),
        )
        .withColumn(
            "contaminated",
            (F.col("max_cos_micros") >= thr).cast("int"),
        )
    )
