"""Scalar (int8) quantization of embedding columns — the storage-bound
half of a vector index that PQ (``operators/pq.py``) does not cover:
keep every dimension, but store it as ONE byte. At 100 TB of
``array<float>`` embeddings, SQ8 cuts the vector payload 4× with no
training step at all (two corpus passes: a per-dimension min/max
aggregate, then a shuffle-free encode), which is why FAISS ships it as
``SQ8`` and vector stores default to it for re-rankable first-stage
retrieval.

Exactness contract (house rules, cf. ``operators/clustering.py``):

- floats are widened to double and scaled by 2^20 (power of two —
  exact in IEEE, no round-half anything), then floored to int64;
- the code is ``((q - lo_d) * 255) // (hi_d - lo_d)`` — non-negative
  integer division, where truncation and floor agree, so numpy,
  Spark's ``div`` and DuckDB's ``//`` cannot disagree;
- search distance is integer through and through:
  ``sum_d ((|c_d - qc_d| * span_d) div 255)^2`` — the per-dimension
  span scales code deltas back to quantized units, abs-before-divide
  keeps the operands non-negative, and the magnitudes (≤ 2^42 per
  term × dim) stay far inside int64.

Scale shape (100 TB):
- stats: posexplode → per-dimension min/max hash aggregate — the
  shuffle carries ``dim`` keys with full map-side combine, and the
  result (dim rows) is the only thing the driver ever holds;
- encode: ONE vectorized numpy crossing (iterator ``mapInPandas``),
  shuffle-free; write (id, codes) once and never rescan floats;
- search: pure JVM — the query's codes and per-dimension spans fold
  into whole-stage codegen as literals (``element_at`` per dimension,
  like ``pq_topk``'s ADC), one scan + TakeOrderedAndProject. No
  Python, no shuffle, no float math per candidate.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from serd_spark.operators.clustering import _quantize

LEVELS = 255  # codes span [0, 255] — one byte per dimension


def sq_stats(
    emb: DataFrame, vec_col: str = "embedding"
) -> tuple[np.ndarray, np.ndarray]:
    """Per-dimension (lo, hi) of the 2^20-quantized values: one
    posexplode + dim-keyed min/max aggregate (map-side combined; the
    shuffle carries ``dim`` keys). Returns two int64 arrays of length
    dim — the whole 'model', collected because it is dim-bounded (the
    same argument as pq_train's k×dim codebook collect)."""
    rows = (
        emb.select(F.posexplode(vec_col).alias("d", "x"))
        .select(
            "d",
            F.floor(F.col("x").cast("double") * F.lit(1 << 20))
            .cast("long")
            .alias("q"),
        )
        .groupBy("d")
        .agg(F.min("q").alias("lo"), F.max("q").alias("hi"))
        .collect()
    )
    if not rows:
        raise ValueError("sq_stats: embedding table is empty")
    dim = max(r["d"] for r in rows) + 1
    lo = np.zeros(dim, dtype=np.int64)
    hi = np.zeros(dim, dtype=np.int64)
    for r in rows:
        lo[r["d"]] = r["lo"]
        hi[r["d"]] = r["hi"]
    return lo, hi


def _encode_mat(vm: np.ndarray, lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    span = hi - lo
    safe = np.where(span == 0, 1, span)
    codes = ((vm - lo) * LEVELS) // safe
    return np.where(span == 0, 0, codes).astype(np.int32)


def sq_encode(
    emb: DataFrame,
    lo: np.ndarray,
    hi: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>[dim]) with codes in [0, 255] — one
    shuffle-free numpy crossing against the broadcast (lo, hi)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vm = _quantize(np.stack([np.asarray(v) for v in pdf[vec_col]]))
            codes = _encode_mat(vm, lo, hi)
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "codes": list(codes)}
            )

    return emb.select(id_col, vec_col).mapInPandas(
        run, schema=f"{id_col} long, codes array<int>"
    )


def sq_topk(
    encoded: DataFrame,
    lo: np.ndarray,
    hi: np.ndarray,
    query_vec: list[float],
    top_k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Quantized-L2 top-k: encode the query driver-side with the SAME
    rule, then per candidate sum dim integer terms
    ``((|c_d - qc_d| * span_d) div 255)^2`` entirely inside
    whole-stage codegen (query codes and spans are literals). Returns
    (id, sq_dist), ties broken by id — no float per candidate, no
    Python, no shuffle before the TakeOrderedAndProject."""
    qm = _quantize(np.asarray(query_vec, dtype=np.float64).reshape(1, -1))
    qc = _encode_mat(qm, lo, hi).reshape(-1)
    span = (hi - lo).astype(np.int64)
    dist = None
    for d in range(len(qc)):
        scaled = F.expr(
            f"(abs(element_at(codes, {d + 1}) - {int(qc[d])}) * "
            f"{int(span[d])}L) div 255"
        )
        term = scaled * scaled
        dist = term if dist is None else dist + term
    return (
        encoded.select(F.col(id_col), dist.cast("long").alias("sq_dist"))
        .orderBy(F.asc("sq_dist"), F.asc(id_col))
        .limit(top_k)
    )
