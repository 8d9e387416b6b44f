"""Driver-contract query family (split out of __spark_entry__.py; same
functions, same names — the entry module re-exports everything)."""

from serd_spark.contract.helpers import *  # noqa: F401,F403
# _trade_edges (the shared deterministic edge generator) lives with
# the graph family
from serd_spark.contract.q_batch2 import _trade_edges  # noqa: F401


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




__all__ = [
    'BPE_MERGES',
    'MIX_WEIGHTS',
    '_CM_PROBE_UIDS',
    '_OWL_INVERSE',
    '_OWL_SYMMETRIC',
    '_OWL_TRANSITIVE',
    '_fusion_claims',
    '_owl_edges',
    'q_bpe_tokenize',
    'q_bpe_train',
    'q_cdx',
    'q_distinct_sketch',
    'q_fact_fusion',
    'q_hll',
    'q_link_predict',
    'q_mix',
    'q_owl_entail',
    'q_pack_sequences',
    'q_quantiles',
    'q_range_join',
    'q_redirects',
    'q_session_window',
    'q_source_trust',
    'q_sparql_npath',
    'q_sparql_subselect',
    'q_surt',
    'q_walks',
    'stream_countmin',
    'stream_hll',
    'stream_quantiles',
    'stream_sessions',
]
