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
