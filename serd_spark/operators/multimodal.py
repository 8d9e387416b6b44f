"""Multimodal columns: image/audio/video as opaque ``binary`` plus
typed metadata, with decode / feature-extract / resize / frame-sample
as Arrow-batched stages.

The real codec libraries (Pillow, ffmpeg, torchaudio, …) are NOT in
this container, so the byte-level decode is STUBBED — either a
clearly-marked ``NotImplementedError`` (``strict=True``) or a
deterministic fake decode derived from the bytes' blake2b digest
(``strict=False``, the default, so the Spark plumbing is exercised
end-to-end in tests). Everything Spark-side is real: schemas,
column pruning before the UDF barrier, iterator-form ``mapInPandas``
(one Arrow batch in flight — media rows are big), and deterministic
outputs under task retry.

At 100 TB: media bytes dominate row size, so every stage (a)
projects only (id, payload) before the UDF so Parquet column pruning
drops the rest, and (b) keeps ``maxRecordsPerBatch`` small via the
session conf rather than collecting whole partitions.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

FEATURE_DIM = 32


def _fake_decode(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a real decoder: expands the
    payload's blake2b digest into ``dim`` floats in [-1, 1). Stable
    across processes/retries; replace with the real codec when the
    library exists."""
    need = dim * 4
    out = b""
    counter = 0
    while len(out) < need:
        out += hashlib.blake2b(
            payload + counter.to_bytes(4, "big"), digest_size=32
        ).digest()
        counter += 1
    u = np.frombuffer(out[:need], dtype=np.uint32).astype(np.float64)
    return (u / 2**31) - 1.0


def decode_image(payload: bytes) -> np.ndarray:
    """REAL image decode — requires an imaging library that is not in
    this container. Spark plumbing around it is tested with the fake
    path."""
    raise NotImplementedError(
        "image decode needs Pillow/opencv (not installed in this sandbox); "
        "use strict=False for the deterministic fake decode"
    )


def extract_features(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    strict: bool = False,
    dim: int = FEATURE_DIM,
) -> DataFrame:
    """(id, payload) → (id, feature array<float>, n_bytes). Iterator
    mapInPandas: one media batch in flight at a time."""
    src = media.select(id_col, payload_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, sizes = [], []
            for raw in pdf[payload_col]:
                b = bytes(raw) if raw is not None else b""
                if strict:
                    decode_image(b)  # NotImplementedError by design
                feats.append(
                    _fake_decode(b, dim).astype(np.float32).tolist()
                )
                sizes.append(len(b))
            yield pd.DataFrame(
                {id_col: pdf[id_col], "feature": feats, "n_bytes": sizes}
            )

    return src.mapInPandas(
        run, schema=f"{id_col} long, feature array<float>, n_bytes long"
    )


def resize_plan(
    media: DataFrame,
    max_side: int = 256,
    id_col: str = "media_id",
) -> DataFrame:
    """Resize planning is pure metadata arithmetic → built-in columns
    (no UDF, no payload read: Catalyst prunes the binary column from
    the scan entirely). The byte-level resample would slot into
    ``extract_features``-style plumbing when a codec exists."""
    scale = F.when(
        F.greatest("width", "height") <= max_side, F.lit(1.0)
    ).otherwise(max_side / F.greatest("width", "height"))
    return media.select(
        id_col,
        "width",
        "height",
        F.round(scale, 6).alias("scale"),
        F.ceil(F.col("width") * scale).cast("int").alias("out_w"),
        F.ceil(F.col("height") * scale).cast("int").alias("out_h"),
    )


def frame_sample_plan(
    media: DataFrame,
    every_ms: int = 1000,
    id_col: str = "media_id",
) -> DataFrame:
    """Video frame sampling: one row per sampled timestamp —
    ``sequence`` + ``explode``, JVM-side. The per-frame decode then
    runs through ``extract_features`` plumbing."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            id_col,
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )


def synthesize_media(
    spark, n_rows: int, seed: int = 42, partitions: int = 8
) -> DataFrame:
    """Deterministic fake media table for tests/bench (payload bytes
    are a pure function of (seed, id))."""
    base = spark.range(0, n_rows, 1, partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "image", "audio", "video"]
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                kind = kinds[i % 4]
                payload = hashlib.blake2b(
                    f"{seed}:{i}".encode(), digest_size=32
                ).digest() * (4 + i % 8)
                rows.append(
                    (
                        i,
                        kind,
                        payload,
                        {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                        64 + (i * 37) % 1024 if kind == "image" else None,
                        64 + (i * 53) % 768 if kind == "image" else None,
                        1000 + (i * 101) % 60000 if kind != "image" else None,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "payload", "mime",
                    "width", "height", "duration_ms",
                ],
            )

    return base.mapInPandas(gen, schema=MEDIA_SCHEMA)
