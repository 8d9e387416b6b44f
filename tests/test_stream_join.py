"""streaming_interval_join — wide-watermark batch equivalence and
tight-watermark eviction pinned with controlled arrival order."""

import time as _time
from datetime import datetime

from serd_spark.streaming.incremental import streaming_interval_join


def _ts(s):
    return datetime.fromisoformat(s)


def _write_batches(spark, d, schema, batches):
    for rows in batches:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(d))
        _time.sleep(1.1)  # distinct mtimes: file order = arrival order


def _run(spark, tmp_path, clicks_dir, views_dir, watermark, name):
    clicks = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(clicks_dir))
    )
    views = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(views_dir))
    )
    joined = streaming_interval_join(
        clicks, views, key="user_id", lookback_s=600, watermark=watermark
    ).select(
        "event_id", F_col("r_event_id").alias("view_id")
    )
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return {
        (r.event_id, r.view_id)
        for r in spark.sql(f"select * from {name}").collect()
    }


def F_col(c):
    from pyspark.sql import functions as F

    return F.col(c)


def test_wide_watermark_equals_batch_join(spark, tmp_path):
    cd, vd = tmp_path / "c", tmp_path / "v"
    _write_batches(
        spark, vd, "event_id long, ts timestamp, user_id long",
        [
            [(100, _ts("2024-01-01 10:00:00"), 1)],
            [(101, _ts("2024-01-01 10:04:00"), 1),
             (102, _ts("2024-01-01 10:20:00"), 2)],
        ],
    )
    _write_batches(
        spark, cd, "event_id long, ts timestamp, user_id long",
        [
            # matches BOTH views of user 1 (interval inclusive)
            [(1, _ts("2024-01-01 10:05:00"), 1)],
            # user 2, view 16 min earlier — outside the 10 min lookback
            [(2, _ts("2024-01-01 10:36:00"), 2),
             (3, _ts("2024-01-01 10:20:00"), 2)],  # exact-equal ts: match
        ],
    )
    got = _run(spark, tmp_path, cd, vd, "365 days", "wide_join")
    assert got == {(1, 100), (1, 101), (3, 102)}, got


def test_tight_watermark_evicts_state_one_batch_after_advance(spark, tmp_path):
    """Eviction timing, pinned empirically (the semantics the
    stream_join oracle's wide watermark sidesteps): the advanced
    watermark takes effect at batch N+1 and state CLEANUP runs at the
    END of that batch — so a late row arriving in batch N+1 still
    matches old state (Spark does not pre-filter join input by
    watermark), but one arriving in batch N+2 finds it evicted.
    Batch 1 advances both sides to ~12:00 → watermark 11:50 active in
    batch 2, view 100's state (evictable past 10:10) removed at batch
    2's end; the late 10:06 click in batch 3 emits nothing."""
    cd, vd = tmp_path / "c", tmp_path / "v"
    _write_batches(
        spark, vd, "event_id long, ts timestamp, user_id long",
        [
            [(100, _ts("2024-01-01 10:00:00"), 1)],
            [(101, _ts("2024-01-01 12:00:00"), 1)],
            [(102, _ts("2024-01-01 12:00:01"), 9)],
            [(103, _ts("2024-01-01 12:00:02"), 8)],
        ],
    )
    _write_batches(
        spark, cd, "event_id long, ts timestamp, user_id long",
        [
            [(1, _ts("2024-01-01 10:05:00"), 1)],
            [(2, _ts("2024-01-01 12:00:30"), 1)],
            [(4, _ts("2024-01-01 12:01:00"), 9)],
            [(3, _ts("2024-01-01 10:06:00"), 1)],  # LATE: state is gone
        ],
    )
    got = _run(spark, tmp_path, cd, vd, "10 minutes", "tight_join")
    assert (3, 100) not in got
    assert {(1, 100), (2, 101), (4, 102)} <= got, got
