"""Sitemap parsing — protocol fields, entity decoding, index files."""

from serd_spark.operators.sitemap import parse_sitemaps

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc> https://h.example/a?x=1&amp;y=2 </loc>
    <lastmod>2026-01-03</lastmod>
    <changefreq>daily</changefreq>
    <priority>0.8</priority>
  </url>
  <url><loc>https://h.example/b</loc></url>
  <url><lastmod>2026-01-01</lastmod></url>
</urlset>
"""

INDEX = """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap>
    <loc>https://h.example/sitemap-news.xml</loc>
    <lastmod>2026-02-01</lastmod>
  </sitemap>
</sitemapindex>
"""


def _df(spark, rows):
    return spark.createDataFrame(rows, "sitemap_url string, xml string")


def test_urlset_fields_and_entities(spark):
    out = parse_sitemaps(_df(spark, [("https://h.example/sitemap.xml",
                                      URLSET)]))
    rows = {r.ord: r for r in out.collect()}
    # the loc-less third <url> block is dropped
    assert set(rows) == {0, 1}
    a = rows[0]
    assert a.kind == "url"
    assert a.loc == "https://h.example/a?x=1&y=2"  # entity + trim
    assert (a.lastmod, a.changefreq, a.priority) == (
        "2026-01-03", "daily", "0.8"
    )
    b = rows[1]
    assert b.loc == "https://h.example/b"
    assert b.lastmod is None and b.changefreq is None


def test_sitemapindex_children(spark):
    out = parse_sitemaps(_df(spark, [("https://h.example/sitemap.xml",
                                      INDEX)]))
    rows = out.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.kind == "sitemap"
    assert r.loc == "https://h.example/sitemap-news.xml"
    assert r.lastmod == "2026-02-01"
    # the <sitemapindex> wrapper itself must NOT match <sitemap\\b
    assert r.ord == 0


def test_double_encoded_entity_single_decodes(spark):
    xml = "<urlset><url><loc>https://h.example/&amp;amp;</loc></url></urlset>"
    out = parse_sitemaps(_df(spark, [("s", xml)]))
    assert out.collect()[0].loc == "https://h.example/&amp;"


RSS = """<rss version="2.0"><channel><title>Blog</title>
  <item>
    <title>First &amp; Foremost</title>
    <link>https://ex.org/a?x=1&amp;y=2</link>
    <guid>tag:ex.org,a</guid>
    <pubDate>Mon, 05 Jan 2026</pubDate>
  </item>
  <item><link>https://ex.org/b</link></item>
  <item><title>no link, dropped</title></item>
</channel></rss>"""

ATOM = """<feed xmlns="http://www.w3.org/2005/Atom">
  <title>Feed</title>
  <link href="https://ex.org/feed" rel="self"/>
  <entry>
    <title>Entry &lt;1&gt;</title>
    <link href="https://ex.org/e1?a=1&amp;b=2"/>
    <id>urn:e1</id>
    <updated>2026-01-02</updated>
  </entry>
  <entry><link rel="alternate" href="https://ex.org/e2"/></entry>
</feed>"""


def test_parse_feeds_rss_and_atom(spark):
    from serd_spark.operators.sitemap import parse_feeds

    df = spark.createDataFrame(
        [("https://ex.org/rss", RSS), ("https://ex.org/atom", ATOM)],
        "feed_url string, xml string",
    )
    rows = {
        (r.kind, r.ord): (r.link, r.title, r.entry_id, r.published)
        for r in parse_feeds(df).collect()
    }
    assert rows[("rss", 0)] == (
        "https://ex.org/a?x=1&y=2",
        "First & Foremost",
        "tag:ex.org,a",
        "Mon, 05 Jan 2026",
    )
    assert rows[("rss", 1)] == ("https://ex.org/b", None, None, None)
    assert ("rss", 2) not in rows  # linkless item dropped
    assert rows[("atom", 0)] == (
        "https://ex.org/e1?a=1&b=2",
        "Entry <1>",
        "urn:e1",
        "2026-01-02",
    )
    assert rows[("atom", 1)] == ("https://ex.org/e2", None, None, None)


def test_parse_feeds_feed_level_link_not_an_item(spark):
    from serd_spark.operators.sitemap import parse_feeds

    # the channel/feed-level <link> elements sit OUTSIDE item/entry
    # blocks and must not produce rows
    df = spark.createDataFrame(
        [("f", "<rss><channel><link>https://x/</link></channel></rss>")],
        "feed_url string, xml string",
    )
    assert parse_feeds(df).count() == 0


def test_parse_feeds_pure_jvm(spark):
    from serd_spark.operators.sitemap import parse_feeds

    df = spark.createDataFrame(
        [("f", RSS)], "feed_url string, xml string"
    )
    plan = (
        parse_feeds(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "PythonUDF" not in plan and "ArrowEval" not in plan
