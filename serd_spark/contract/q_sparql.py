"""Driver-contract query family (split out of __spark_entry__.py; same
functions, same names — the entry module re-exports everything)."""

from serd_spark.contract.helpers import *  # noqa: F401,F403


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




__all__ = [
    '_SCHEMA_DOMAINS',
    '_SCHEMA_RANGES',
    '_SCHEMA_SUBCLASS',
    'q_apportion',
    'q_c14n',
    'q_feeds',
    'q_frontier',
    'q_graphs',
    'q_page_directives',
    'q_priority_sample',
    'q_rdfs_entail',
    'q_robots',
    'q_rollup_cascade',
    'q_sameas',
    'q_sitemap',
    'q_skolem',
    'q_sparql',
    'q_sparql_agg',
    'q_sparql_bind',
    'q_sparql_construct',
    'q_sparql_describe',
    'q_sparql_exists',
    'q_sparql_filter',
    'q_sparql_having',
    'q_sparql_minus',
    'q_sparql_opt',
    'q_sparql_path',
    'q_sparql_star',
    'q_sparql_update',
    'q_url_templates',
    'q_void',
    'q_warc_roundtrip',
]
