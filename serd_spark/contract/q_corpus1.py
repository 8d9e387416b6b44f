"""Driver-contract query family (split out of __spark_entry__.py; same
functions, same names — the entry module re-exports everything)."""

from serd_spark.contract.helpers import *  # noqa: F401,F403


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




__all__ = [
    '_SAMPLE_DEFAULT',
    '_SAMPLE_RATES',
    '_zorder_sql_expr',
    'q_anchor_text',
    'q_bloom_decon',
    'q_bucketed_join',
    'q_compact',
    'q_countmin',
    'q_crawl_delta',
    'q_domain_cap',
    'q_domain_stats',
    'q_hits',
    'q_host_graph',
    'q_host_rank',
    'q_json_props',
    'q_line_dedup',
    'q_nfc',
    'q_profile',
    'q_rrf_fusion',
    'q_scc',
    'q_shard',
    'q_sketch_quantiles',
    'q_sql_q3',
    'q_sql_q5',
    'q_stratified_sample',
    'q_upsert',
    'q_wminhash',
    'q_zorder',
    'stream_enrich',
    'stream_join',
]
