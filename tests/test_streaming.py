"""Structured Streaming incremental pipeline."""

import os

import pytest
from pyspark.sql import functions as F

from serd_spark.sources.pages import synthesize_pages
from serd_spark.streaming.incremental import (
    run_incremental,
    streaming_crawl_stats,
    streaming_predicate_counts,
)


@pytest.fixture()
def pages_dir(spark, tmp_path):
    d = str(tmp_path / "pages")
    synthesize_pages(spark, 100, seed=42).coalesce(2).write.mode(
        "overwrite"
    ).parquet(d)
    return d


def test_incremental_extract_and_resume(spark, tmp_path, pages_dir):
    out = str(tmp_path / "triples")
    ckpt = str(tmp_path / "ckpt")

    q = run_incremental(spark, pages_dir, out, ckpt)
    q.awaitTermination(120)
    n1 = spark.read.parquet(out).filter(F.col("rec") == "t").count()
    docs1 = spark.read.parquet(out).filter(F.col("rec") == "d").count()
    assert n1 > 0
    assert docs1 == 100

    # no new files → restart processes nothing (checkpoint resume)
    q = run_incremental(spark, pages_dir, out, ckpt)
    q.awaitTermination(120)
    assert spark.read.parquet(out).filter(F.col("rec") == "d").count() == 100

    # new files → only the increment is processed
    more = synthesize_pages(spark, 160, seed=42).filter(
        F.col("url").rlike("/page/1[0-5][0-9]$")
    )
    more.coalesce(1).write.mode("append").parquet(pages_dir)
    q = run_incremental(spark, pages_dir, out, ckpt)
    q.awaitTermination(120)
    docs3 = spark.read.parquet(out).filter(F.col("rec") == "d").count()
    total_input = spark.read.parquet(pages_dir).count()
    # exactly-once: one 'd' marker per input row, old + increment
    # (the generator emits ~2% re-crawled urls, so compare row counts,
    # not distinct urls)
    assert docs3 == total_input > 100


def test_streaming_crawl_stats(spark, pages_dir):
    df = streaming_crawl_stats(spark, pages_dir, window="1 hour")
    q = (
        df.writeStream.format("memory")
        .queryName("crawl_stats")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode only emits closed windows; with a 1h watermark the
    # last window stays open, so just check the query ran and the
    # schema is right
    got = spark.sql("select * from crawl_stats")
    assert got.columns == ["window_start", "lang", "n_pages", "bytes_in"]


def test_streaming_predicate_counts(spark, pages_dir):
    df = streaming_predicate_counts(spark, pages_dir)
    q = (
        df.writeStream.format("memory")
        .queryName("pred_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.p: r.n_triples
        for r in spark.sql("select * from pred_counts").collect()
    }
    assert got.get("http://schema.org/name", 0) > 0


def test_stream_dedup_urls(spark, tmp_path):
    """Cross-batch stateful url dedup: re-crawled urls in later
    micro-batches must not re-emit."""
    from serd_spark.streaming.incremental import (
        stream_dedup_urls,
        stream_pages,
    )

    d = str(tmp_path / "pages_dup")
    base = synthesize_pages(spark, 60, seed=42)
    base.coalesce(1).write.mode("overwrite").parquet(d)
    # second file: 30 re-crawls of the same urls + 10 new pages
    dup = synthesize_pages(spark, 60, seed=42).limit(30).withColumn(
        "warc_ts", F.col("warc_ts") + F.expr("INTERVAL 2 DAYS")
    )
    new = synthesize_pages(spark, 80, seed=42).filter(
        F.col("url").rlike("/page/7[0-9]$")
    )
    dup.union(new).coalesce(1).write.mode("append").parquet(d)

    out = stream_dedup_urls(stream_pages(spark, d, max_files_per_trigger=1))
    ckpt = str(tmp_path / "ckpt_dedup")
    q = (
        out.writeStream.format("memory")
        .queryName("deduped_pages")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select url, count(*) n from deduped_pages group by url")
    assert got.filter(F.col("n") > 1).count() == 0
    total_distinct = spark.read.parquet(d).select("url").distinct().count()
    assert got.count() == total_distinct


def test_stream_dedup_urls_with_ttl(spark, tmp_path):
    """state_ttl_ms > 0 runs the ProcessingTimeTimeout path: with a
    long TTL the behavior is identical to forever-dedup (re-crawls in
    later batches are still dropped), and the timeout plumbing
    (setTimeoutDuration / hasTimedOut) is exercised end-to-end."""
    from serd_spark.streaming.incremental import (
        stream_dedup_urls,
        stream_pages,
    )

    d = str(tmp_path / "pages_ttl")
    base = synthesize_pages(spark, 40, seed=42)
    base.coalesce(1).write.mode("overwrite").parquet(d)
    dup = synthesize_pages(spark, 40, seed=42).limit(20).withColumn(
        "warc_ts", F.col("warc_ts") + F.expr("INTERVAL 2 DAYS")
    )
    dup.coalesce(1).write.mode("append").parquet(d)

    out = stream_dedup_urls(
        stream_pages(spark, d, max_files_per_trigger=1),
        state_ttl_ms=3_600_000,
    )
    ckpt = str(tmp_path / "ckpt_ttl")
    q = (
        out.writeStream.format("memory")
        .queryName("deduped_ttl")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select url, count(*) n from deduped_ttl group by url")
    assert got.filter(F.col("n") > 1).count() == 0
    assert got.count() == spark.read.parquet(d).select("url").distinct().count()


def test_stream_dedup_ttl_eviction_reemits(spark, tmp_path):
    """The hasTimedOut/state.remove branch itself: with a 1 ms TTL, a
    url seen in batch 1 whose marker expires during batch 2 (no data
    for it) is forgotten, so batch 3's re-crawl IS re-emitted — the
    documented TTL trade. Three single-file micro-batches in
    mtime order."""
    import time as _time

    from serd_spark.streaming.incremental import (
        stream_dedup_urls,
        stream_pages,
    )

    d = tmp_path / "pages_evict"
    d.mkdir()
    a = synthesize_pages(spark, 1, seed=42)        # url A
    b = synthesize_pages(spark, 2, seed=42).filter(
        F.col("url").rlike("/1$")
    )                                              # url B only
    a.coalesce(1).write.parquet(str(d / "f1"))
    _time.sleep(1.1)
    b.coalesce(1).write.parquet(str(d / "f2"))
    _time.sleep(1.1)
    a.withColumn(
        "warc_ts", F.col("warc_ts") + F.expr("INTERVAL 1 DAY")
    ).coalesce(1).write.parquet(str(d / "f3"))     # re-crawl of A

    out = stream_dedup_urls(
        stream_pages(spark, str(d) + "/*", max_files_per_trigger=1),
        state_ttl_ms=1,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("evict_ttl")
        .option("checkpointLocation", str(tmp_path / "ckpt_evict"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    counts = {
        r.url: r.n
        for r in spark.sql(
            "select url, count(*) n from evict_ttl group by url"
        ).collect()
    }
    # A was evicted between its two sightings → emitted twice
    a_url = a.first().url
    assert counts[a_url] == 2, counts


def test_streaming_sessions_merge_across_batches(spark, tmp_path):
    """Two events of one user arriving in DIFFERENT micro-batches must
    merge into one session in the state store; the flusher batch
    advances the watermark and evicts it (end <= watermark, boundary
    included — the comparator the stream_sessions oracle mirrors)."""
    import os
    import time as _time

    from datetime import datetime

    from pyspark.sql import functions as F

    from serd_spark.streaming.incremental import streaming_sessions

    def _ts(s):
        return datetime.fromisoformat(s)

    in_dir = tmp_path / "ev"
    in_dir.mkdir()
    batches = [
        [(1, _ts("2024-01-01 10:00:00")), (1, _ts("2024-01-01 10:05:00"))],
        # within 30 min of 10:05 -> must MERGE with the stored session
        [(1, _ts("2024-01-01 10:20:00")), (2, _ts("2024-01-01 10:00:00"))],
        # flusher: watermark -> 12:00, evicting both earlier sessions
        [(9, _ts("2024-01-01 13:00:00"))],
    ]
    for k, rows in enumerate(batches):
        p = str(in_dir / f"b{k}.parquet")
        spark.createDataFrame(
            rows, "user_id long, ts timestamp"
        ).coalesce(1).write.mode("overwrite").parquet(p)
        # FileStreamSource orders new files by modification time:
        # pin strictly increasing mtimes so arrival order == k
        t = 1_700_000_000 + 1000 * k
        for root, _, files in os.walk(p):
            for f in files:
                os.utime(os.path.join(root, f), (t, t))
    _time.sleep(0.01)

    ev = spark.readStream.schema("user_id long, ts timestamp").option(
        "maxFilesPerTrigger", 1
    ).parquet(str(in_dir) + "/*")
    agg = streaming_sessions(ev, gap="30 minutes", watermark="1 hour")
    q = (
        agg.writeStream.format("memory")
        .queryName("sess_merge")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql(
        "select user_id, session_window.start s, session_window.end e, "
        "n_events from sess_merge"
    ).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    # ONE merged session for user 1 spanning all three events
    assert len(by_user[1]) == 1
    u1 = by_user[1][0]
    assert u1["n_events"] == 3
    assert u1["s"] == _ts("2024-01-01 10:00:00")
    assert u1["e"] == _ts("2024-01-01 10:50:00")
    assert by_user[2][0]["n_events"] == 1
    # the flusher's own session is past the watermark: held, not emitted
    assert 9 not in by_user


def test_stream_near_dup_docs(spark, tmp_path):
    """Cross-batch streaming near-dup: identical text arriving in a
    later micro-batch is flagged against the state store; in-batch
    dups resolve by ascending doc_id; unrelated docs stay silent."""
    import time as _time

    from serd_spark.streaming.incremental import stream_near_dup_docs

    texts = {
        0: "alpha beta gamma delta epsilon zeta eta theta",
        1: "one two three four five six seven eight nine ten",
        2: "lorem ipsum dolor sit amet consectetur adipiscing elit",
        3: "pack my box with five dozen liquor jugs tonight",
        4: "the quick brown fox jumps over the lazy dog",
        5: "the quick brown fox jumps over the lazy dog",  # in-batch dup of 4
    }
    batch2 = {
        10: "alpha beta gamma delta epsilon zeta eta theta",  # dup of 0
        11: "completely different new content nobody matches here",
    }
    d = str(tmp_path / "docs_neardup")
    spark.createDataFrame(
        sorted(texts.items()), "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(d)
    _time.sleep(1.1)  # distinct mtimes: file order = arrival order
    spark.createDataFrame(
        sorted(batch2.items()), "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(d)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    out = stream_near_dup_docs(stream)
    ckpt = str(tmp_path / "ckpt_neardup")
    q = (
        out.writeStream.format("memory")
        .queryName("near_dups")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "select doc_id, min(struct(hamming, dup_of)) as m "
        "from near_dups group by doc_id"
    ).collect()
    got = {r.doc_id: (r.m.hamming, r.m.dup_of) for r in rows}
    assert got == {5: (0, 4), 10: (0, 0)}, got


def test_streaming_hdr_sketch_merges_late_data_and_evicts(spark, tmp_path):
    """The windowed sketch must (a) merge a late-but-within-watermark
    event into its day's bucket counts ACROSS micro-batches, (b) emit
    a window exactly once when the watermark passes its end, and (c)
    hold back the trailing open window — the semantics the
    stream_quantiles oracle replays."""
    import os
    import time as _time
    from datetime import datetime

    from serd_spark.streaming.incremental import streaming_hdr_sketch

    def _ts(s):
        return datetime.fromisoformat(s)

    in_dir = tmp_path / "ev"
    in_dir.mkdir()
    batches = [
        # day 1: two values in bucket ranges 16 (v=2..3) and 64 (v=16..31)
        [("a", _ts("2024-01-01 10:00:00"), 2),
         ("a", _ts("2024-01-01 11:00:00"), 17)],
        # LATE day-1 event (watermark still inside day 1) + day-2 row
        [("a", _ts("2024-01-01 09:00:00"), 3),
         ("a", _ts("2024-01-02 01:00:00"), 16)],
        # flusher: watermark -> day-3 01:00, evicting day 1 AND day 2
        [("a", _ts("2024-01-03 03:00:00"), 1)],
    ]
    for k, rows in enumerate(batches):
        p = str(in_dir / f"b{k}.parquet")
        spark.createDataFrame(
            rows, "event_type string, ts timestamp, value_long long"
        ).coalesce(1).write.mode("overwrite").parquet(p)
        t = 1_700_000_000 + 1000 * k
        for root, _, files in os.walk(p):
            for f in files:
                os.utime(os.path.join(root, f), (t, t))
    _time.sleep(0.01)

    ev = spark.readStream.schema(
        "event_type string, ts timestamp, value_long long"
    ).option("maxFilesPerTrigger", 1).parquet(str(in_dir) + "/*")
    sk = streaming_hdr_sketch(
        ev, "value_long", by=["event_type"], window="1 day",
        watermark="2 hours", sub_bits=4,
    )
    q = (
        sk.writeStream.format("memory")
        .queryName("hdr_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql(
        "SELECT date_format(window.start, 'yyyy-MM-dd') AS day,"
        " bucket, cnt FROM hdr_stream"
    ).collect()
    got = {(r["day"], r["bucket"]): r["cnt"] for r in rows}
    # day 1: v=2 -> bucket 16, v=3 -> bucket 24, late v=3? no: late
    # event value 3 -> e=1, sub=(3-2)<<3=8 -> bucket 24; v=2 -> 16;
    # v=17 -> e=4, sub=(17-16)>>0=1 -> bucket 65
    assert got[("2024-01-01", 16)] == 1
    assert got[("2024-01-01", 24)] == 1  # the LATE event, merged in
    assert got[("2024-01-01", 65)] == 1
    # day 2: v=16 -> bucket 64, emitted by the flusher
    assert got[("2024-01-02", 64)] == 1
    # trailing day 3 stays in state — never emitted
    assert not any(d == "2024-01-03" for d, _ in got)
    assert len(got) == 4


def test_streaming_countmin_merges_late_and_evicts(spark, tmp_path):
    """The windowed frequency sketch must merge a late-but-within-
    watermark event into its day's cells across micro-batches, emit a
    day exactly once at the eviction cut, and hold back the trailing
    open day — and the emitted cells must EQUAL the batch
    countmin_sketch over the evicted rows (the merge property the
    stream_countmin oracle replays)."""
    import os
    import time as _time
    from datetime import datetime

    from pyspark.sql import functions as F

    from serd_spark.operators.stats import countmin_sketch
    from serd_spark.streaming.incremental import streaming_countmin

    def _ts(s):
        return datetime.fromisoformat(s)

    in_dir = tmp_path / "ev"
    in_dir.mkdir()
    batches = [
        [("u1", _ts("2024-01-01 10:00:00")),
         ("u2", _ts("2024-01-01 11:00:00"))],
        # LATE day-1 repeat of u1 + a day-2 row
        [("u1", _ts("2024-01-01 09:00:00")),
         ("u3", _ts("2024-01-02 01:00:00"))],
        # flusher: advances the watermark past day 1 and day 2
        [("u9", _ts("2024-01-03 03:00:00"))],
    ]
    for k, rows in enumerate(batches):
        p = str(in_dir / f"b{k}.parquet")
        spark.createDataFrame(rows, "uid string, ts timestamp") \
            .coalesce(1).write.mode("overwrite").parquet(p)
        t = 1_700_000_000 + 1000 * k
        for root, _, files in os.walk(p):
            for f in files:
                os.utime(os.path.join(root, f), (t, t))
    _time.sleep(0.01)

    ev = spark.readStream.schema("uid string, ts timestamp") \
        .option("maxFilesPerTrigger", 1).parquet(str(in_dir) + "/*")
    sk = streaming_countmin(
        ev, "uid", window="1 day", watermark="2 hours", depth=2, width=16
    )
    q = (
        sk.writeStream.format("memory")
        .queryName("cm_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = spark.sql(
        "SELECT date_format(window.start, 'yyyy-MM-dd') AS day,"
        " row, col, cnt FROM cm_stream"
    ).collect()
    got = {(r["day"], r["row"], r["col"]): r["cnt"] for r in emitted}
    # only days 1 and 2 emitted; the open day 3 stays in state
    assert {d for d, _, _ in got} == {"2024-01-01", "2024-01-02"}
    # streaming cells == batch sketch over each closed day's rows
    for day, day_rows in [
        ("2024-01-01", [("u1",), ("u2",), ("u1",)]),
        ("2024-01-02", [("u3",)]),
    ]:
        batch = countmin_sketch(
            spark.createDataFrame(day_rows, "uid string"),
            "uid", depth=2, width=16,
        ).collect()
        expect = {(day, r["row"], r["col"]): r["cnt"] for r in batch}
        assert {k: v for k, v in got.items() if k[0] == day} == expect
    # the late u1 repeat merged: each depth row's day-1 cells sum to
    # all 3 day-1 events (collision-safe form of "the repeat counts")
    for row in (0, 1):
        assert sum(
            v for (d, r, _), v in got.items()
            if d == "2024-01-01" and r == row
        ) == 3


def test_streaming_enrich_matches_batch(spark, tmp_path):
    """Stream-static broadcast enrichment is batch-split-invariant:
    multi-file-trigger streaming output equals the batch join."""
    from serd_spark.streaming.incremental import streaming_enrich

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    rows = [(i, f"type{i % 3}", float(i)) for i in range(30)]
    batch = spark.createDataFrame(
        rows, "event_id long, event_type string, value double"
    )
    batch.repartition(5).write.parquet(in_dir)
    dim = spark.createDataFrame(
        [(f"type{i}", i * 10) for i in range(3)],
        "event_type string, weight long",
    )
    ev = (
        spark.readStream.schema(
            "event_id long, event_type string, value double"
        )
        .option("maxFilesPerTrigger", 2)
        .parquet(in_dir)
    )
    enriched = streaming_enrich(ev, dim, "event_type")

    def sink(bdf, bid):
        bdf.write.mode("overwrite").parquet(f"{out_dir}/batch_id={bid}")

    q = (
        enriched.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.event_id, r.weight)
        for r in spark.read.option("basePath", out_dir)
        .parquet(out_dir).collect()
    }
    want = {
        (r.event_id, r.weight)
        for r in batch.join(dim, "event_type").collect()
    }
    assert got == want and len(got) == 30


def test_streaming_hll_merges_late_and_evicts(spark, tmp_path):
    """The windowed HLL register table must max-merge a late-but-
    within-watermark event into its day across micro-batches, emit a
    closed day exactly once at the eviction cut, hold back the open
    trailing day — and the emitted registers must EQUAL the batch
    hll_sketch over the evicted rows (the merge law the stream_hll
    oracle replays)."""
    import os
    import time as _time
    from datetime import datetime

    from serd_spark.operators.stats import hll_sketch
    from serd_spark.streaming.incremental import streaming_hll

    def _ts(s):
        return datetime.fromisoformat(s)

    in_dir = tmp_path / "ev_hll"
    in_dir.mkdir()
    batches = [
        [("u1", _ts("2024-01-01 10:00:00")),
         ("u2", _ts("2024-01-01 11:00:00"))],
        # LATE day-1 rows (u1 repeat + new u7) + a day-2 row
        [("u1", _ts("2024-01-01 09:00:00")),
         ("u7", _ts("2024-01-01 09:30:00")),
         ("u3", _ts("2024-01-02 01:00:00"))],
        # flusher: advances the watermark past days 1 and 2
        [("u9", _ts("2024-01-03 03:00:00"))],
    ]
    for k, rows in enumerate(batches):
        p = str(in_dir / f"b{k}.parquet")
        spark.createDataFrame(rows, "uid string, ts timestamp") \
            .coalesce(1).write.mode("overwrite").parquet(p)
        t = 1_700_000_000 + 1000 * k
        for root, _, files in os.walk(p):
            for f in files:
                os.utime(os.path.join(root, f), (t, t))
    _time.sleep(0.01)

    ev = spark.readStream.schema("uid string, ts timestamp") \
        .option("maxFilesPerTrigger", 1).parquet(str(in_dir) + "/*")
    regs = streaming_hll(
        ev, "uid", window="1 day", watermark="2 hours", p=4
    )
    q = (
        regs.writeStream.format("memory")
        .queryName("hll_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = spark.sql(
        "SELECT date_format(window.start, 'yyyy-MM-dd') AS day,"
        " bucket, rho FROM hll_stream"
    ).collect()
    got = {(r["day"], r["bucket"]): r["rho"] for r in emitted}
    assert {d for d, _ in got} == {"2024-01-01", "2024-01-02"}
    for day, day_rows in [
        ("2024-01-01", [("u1",), ("u2",), ("u1",), ("u7",)]),
        ("2024-01-02", [("u3",)]),
    ]:
        batch = hll_sketch(
            spark.createDataFrame(day_rows, "uid string"), "uid", p=4
        ).collect()
        expect = {(day, r["bucket"]): r["rho"] for r in batch}
        assert {k: v for k, v in got.items() if k[0] == day} == expect


def test_streaming_funnel_chains_across_batches(spark, tmp_path):
    """The funnel chain must advance across micro-batches (view in
    batch 0, click in batch 1, purchase in batch 2 → ONE completion
    row emitted, in the purchase's batch), match the batch operator's
    chained-earliest timestamps under in-order arrival, and emit
    nothing for users stuck mid-chain."""
    import os
    import time as _time

    from datetime import datetime

    from serd_spark.streaming.incremental import streaming_funnel

    def _ts(s):
        return datetime.fromisoformat(s)

    in_dir = tmp_path / "ev"
    in_dir.mkdir()
    batches = [
        # click before any view must NOT advance; noise type ignored
        [
            (1, _ts("2024-01-01 09:00:00"), "click"),
            (1, _ts("2024-01-01 10:00:00"), "view"),
            (2, _ts("2024-01-01 10:00:00"), "view"),
            (1, _ts("2024-01-01 10:01:00"), "error"),
        ],
        [(1, _ts("2024-01-01 10:30:00"), "click")],
        [
            (1, _ts("2024-01-01 11:00:00"), "purchase"),
            (1, _ts("2024-01-01 11:30:00"), "purchase"),  # after done
        ],
    ]
    for k, rows in enumerate(batches):
        p = str(in_dir / f"b{k}.parquet")
        spark.createDataFrame(
            rows, "user_id long, ts timestamp, event_type string"
        ).coalesce(1).write.mode("overwrite").parquet(p)
        t = 1_700_000_000 + 1000 * k
        for root, _, files in os.walk(p):
            for f in files:
                os.utime(os.path.join(root, f), (t, t))
    _time.sleep(0.01)

    ev = spark.readStream.schema(
        "user_id long, ts timestamp, event_type string"
    ).option("maxFilesPerTrigger", 1).parquet(str(in_dir) + "/*")
    fun = streaming_funnel(ev, ["view", "click", "purchase"])
    q = (
        fun.writeStream.format("memory")
        .queryName("funnel_chain")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("select * from funnel_chain").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["user_id"] == 1
    assert (r["t_1"], r["t_2"], r["t_3"]) == (
        _ts("2024-01-01 10:00:00"),
        _ts("2024-01-01 10:30:00"),
        _ts("2024-01-01 11:00:00"),
    )


def test_streaming_upsert_latest_wins_out_of_order(spark, tmp_path):
    """Conditional streaming MERGE: the NEWER crawl arrives in an
    EARLIER micro-batch; the old crawl's later re-delivery must not
    clobber it — and a brand-new key in the later batch inserts."""
    import os
    import time as _time

    from datetime import datetime

    from serd_spark.streaming.incremental import streaming_upsert_sink

    def _ts(s):
        return datetime.fromisoformat(s)

    in_dir = tmp_path / "pg"
    in_dir.mkdir()
    batches = [
        [("u1", _ts("2024-01-02 00:00:00"), b"new", "n", "en")],
        [
            ("u1", _ts("2024-01-01 00:00:00"), b"old", "o", "en"),
            ("u2", _ts("2024-01-01 00:00:00"), b"x", "x", "en"),
        ],
    ]
    for k, rows in enumerate(batches):
        p = str(in_dir / f"b{k}.parquet")
        spark.createDataFrame(
            rows,
            "url string, warc_ts timestamp, html binary, "
            "text string, lang string",
        ).coalesce(1).write.mode("overwrite").parquet(p)
        t = 1_700_000_000 + 1000 * k
        for root, _, files in os.walk(p):
            for f in files:
                os.utime(os.path.join(root, f), (t, t))
    _time.sleep(0.01)

    from pyspark.sql import functions as F

    src = (
        spark.readStream.schema(
            "url string, warc_ts timestamp, html binary, "
            "text string, lang string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir) + "/*")
        .withColumn("_h", F.xxhash64("html"))
    )
    tbl = str(tmp_path / "tbl")
    sink = streaming_upsert_sink(
        spark, tbl, key="url", order_cols=["warc_ts", "_h"], n_buckets=4
    )
    q = (
        src.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["url"]: (r["warc_ts"], bytes(r["html"]))
        for r in spark.read.parquet(tbl).collect()
    }
    assert got == {
        "u1": (_ts("2024-01-02 00:00:00"), b"new"),
        "u2": (_ts("2024-01-01 00:00:00"), b"x"),
    }


def test_streaming_funnel_string_user_ids(spark, tmp_path):
    """ADVICE r4: the funnel output schema must take the key column's
    type from the stream (string user ids), not hardcode long."""
    import os as _os
    import time as _time

    from datetime import datetime

    from serd_spark.streaming.incremental import streaming_funnel

    def _ts(s):
        return datetime.fromisoformat(s)

    in_dir = tmp_path / "ev"
    in_dir.mkdir()
    rows = [
        ("alice", _ts("2024-01-01 10:00:00"), "view"),
        ("alice", _ts("2024-01-01 10:30:00"), "click"),
        ("bob", _ts("2024-01-01 10:00:00"), "view"),
    ]
    p = str(in_dir / "b0.parquet")
    spark.createDataFrame(
        rows, "user_id string, ts timestamp, event_type string"
    ).coalesce(1).write.mode("overwrite").parquet(p)
    t = 1_700_000_000
    for root, _, files in _os.walk(p):
        for f in files:
            _os.utime(_os.path.join(root, f), (t, t))
    _time.sleep(0.01)

    ev = spark.readStream.schema(
        "user_id string, ts timestamp, event_type string"
    ).parquet(str(in_dir) + "/*")
    fun = streaming_funnel(ev, ["view", "click"])
    assert dict(fun.dtypes)["user_id"] == "string"
    q = (
        fun.writeStream.format("memory")
        .queryName("funnel_str_uid")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.sql("select * from funnel_str_uid").collect()
    assert [(r["user_id"], r["t_1"], r["t_2"]) for r in out] == [
        ("alice", _ts("2024-01-01 10:00:00"), _ts("2024-01-01 10:30:00"))
    ]
