"""Sequence packing — lay documents end-to-end in id order and cut
the token stream into fixed-budget training sequences (the GPT-style
"concatenate and chunk" pretraining layout). Each document learns its
global token offset and which sequences it lands in; the consumer
(the tokenizer/sharder writing training shards) splits on those
boundaries.

The core is a GLOBAL prefix sum over per-document token counts —
the textbook distributed two-level scan, because a single window over
``ORDER BY doc_id`` would funnel the whole corpus through one
partition:

  1. per-document token counts (scan, codegen, no shuffle);
  2. coarse blocks keyed by ``doc_id // block`` — per-block token
     sums via hash aggregate (map-side combine), then block prefix
     offsets via a window over the BLOCK table (thousands of rows at
     100 TB, the same bounded-small-table argument as
     ``stats.exact_quantiles``);
  3. within-block running sums via a window PARTITIONED by block —
     distributed, each partition holds one block's docs.

Total: one aggregate shuffle + one window shuffle keyed by block +
a broadcast of the block-offset table. All arithmetic is integer
token counts, so the DuckDB mirror replaying a plain global window
cumsum matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from serd_spark.operators.text import token_count


def pack_sequences(
    docs: DataFrame,
    budget_tokens: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    block: int = 4096,
) -> DataFrame:
    """Returns one row per document:
    ``(id_col, n_tokens, tok_offset, seq_first, seq_last)`` where
    ``tok_offset`` is the document's position in the concatenated
    token stream (ascending ``id_col`` order) and
    ``seq_first``/``seq_last`` are the first/last ``budget_tokens``-
    sized sequences it occupies (equal when it fits in one; a
    zero-token document occupies the sequence at its offset).

    ``block`` controls the coarse-scan granularity: ids are grouped
    by ``id // block``; with sparse ids blocks are merely uneven,
    never wrong.
    """
    if budget_tokens <= 0:
        raise ValueError("budget_tokens must be positive")
    if block <= 0:
        raise ValueError("block must be positive")

    counted = docs.select(
        F.col(id_col),
        # null text must not poison the prefix sums downstream
        F.coalesce(token_count(F.col(text_col)), F.lit(0))
        .cast("long")
        .alias("n_tokens"),
        F.expr(f"{id_col} div {block}").alias("_blk"),
    )
    blk_sums = counted.groupBy("_blk").agg(F.sum("n_tokens").alias("_bsum"))
    # prefix offsets over the tiny block table; the rowsBetween frame
    # ends at -1, so each block sums all STRICTLY earlier blocks
    wb = (
        Window.orderBy("_blk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    blk_off = blk_sums.select(
        "_blk",
        F.coalesce(F.sum("_bsum").over(wb), F.lit(0)).alias("_boff"),
    )
    # within-block running sum BEFORE each doc (distributed: one
    # window partition per block)
    wd = (
        Window.partitionBy("_blk")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = (
        counted.join(F.broadcast(blk_off), "_blk")
        .select(
            F.col(id_col),
            F.col("n_tokens"),
            (
                F.col("_boff")
                + F.coalesce(F.sum("n_tokens").over(wd), F.lit(0))
            ).alias("tok_offset"),
        )
    )
    return out.select(
        id_col,
        "n_tokens",
        "tok_offset",
        F.expr(f"tok_offset div {budget_tokens}").alias("seq_first"),
        F.expr(
            f"greatest(tok_offset, tok_offset + n_tokens - 1) div {budget_tokens}"
        ).alias("seq_last"),
    )


def length_batches(
    docs: DataFrame,
    batch_size: int,
    bucket_width: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Length-bucketed batching — group similar-length documents into
    fixed-count training batches so per-batch padding (to the batch
    max) stays small: the sorted-batching layout every padded-batch
    trainer uses, made deterministic and distributed.

    Plan: token counts (scan, codegen) → bucket = n_tokens div
    ``bucket_width`` → rank within bucket by (n_tokens, id) via a
    window PARTITIONED by bucket (never a global-order window; the
    bucket width bounds each partition's sort) → batch = rank div
    ``batch_size``. A trailing partial batch per bucket is kept and
    flagged, never silently merged across buckets (cross-bucket
    merging would reintroduce the padding waste the op exists to
    remove).

    Returns one row per document:
    ``(id_col, n_tokens, bucket, batch_idx, pos)`` with ``pos`` the
    document's 0-based slot in its batch.
    """
    if batch_size <= 0:
        raise ValueError("batch_size must be positive")
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    from pyspark.sql import Window

    counted = docs.select(
        F.col(id_col),
        F.coalesce(token_count(F.col(text_col)), F.lit(0))
        .cast("long")
        .alias("n_tokens"),
    ).withColumn("bucket", F.expr(f"n_tokens div {bucket_width}"))
    w = Window.partitionBy("bucket").orderBy("n_tokens", id_col)
    return (
        counted.withColumn(
            "_r", (F.row_number().over(w) - 1).cast("long")
        )
        .select(
            id_col,
            "n_tokens",
            "bucket",
            F.expr(f"_r div {batch_size}").alias("batch_idx"),
            (F.col("_r") % batch_size).alias("pos"),
        )
    )
