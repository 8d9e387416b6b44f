"""Sitemap ingestion — the discovery side of the crawl trio
(robots.py = compliance, frontier.py = scheduling, sitemap.py =
discovery). Parses sitemaps.org protocol files: <urlset> entries
(loc / lastmod / changefreq / priority) and <sitemapindex> child
pointers.

Parsing is PURE JVM: sitemap files are mechanical XML (the protocol
forbids arbitrary nesting — one <url> block per entry, one text-only
tag per field), so block extraction is one codegen'd
regexp_extract_all + explode and each field one regexp_extract —
no XML library, no Python, no UDF. That matters at scale: a single
sitemap file may carry 50k URLs and a large site thousands of files;
entries explode into corpus-sized rows that must never cross into
Python. The five standard XML entities are decoded with a replace
chain (&amp; last, so double-encoded text stays single-decoded —
the protocol requires entity-escaped URLs).

The same regexes (Java∩RE2 subset: (?s), lazy .*?, \\b) and the same
replace chain run verbatim in the DuckDB oracle mirror.

Out of scope, documented: gzip transport (decompress upstream),
schema validation, and the 50k-entries/50MB limits (a size gate
belongs in the fetcher).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_URL_BLOCK = r"(?s)<url\b[^>]*>(.*?)</url>"
_INDEX_BLOCK = r"(?s)<sitemap\b[^>]*>(.*?)</sitemap>"


def _field(block: Column, tag: str) -> Column:
    got = F.regexp_extract(block, rf"(?s)<{tag}\b[^>]*>\s*(.*?)\s*</{tag}>", 1)
    return F.when(got == "", F.lit(None).cast("string")).otherwise(got)


def xml_unescape(col: Column) -> Column:
    """Decode the five standard XML entities; &amp; LAST so
    '&amp;lt;' decodes to '&lt;' (one level), not '<'."""
    for ent, ch in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
        ("&apos;", "'"), ("&amp;", "&"),
    ):
        col = F.replace(col, F.lit(ent), F.lit(ch))
    return col


def parse_sitemaps(
    sitemaps: DataFrame, xml_col: str = "xml", src_col: str = "sitemap_url"
) -> DataFrame:
    """(sitemap_url, xml) → one row per entry:
    (sitemap_url, kind 'url'|'sitemap', ord, loc, lastmod,
    changefreq, priority). ``kind='sitemap'`` rows are
    <sitemapindex> children (loc only) — feed them back to the
    fetcher; ``kind='url'`` rows are page entries for the frontier."""
    def entries(pattern: str, kind: str) -> DataFrame:
        block = F.posexplode(
            F.regexp_extract_all(F.col(xml_col), F.lit(pattern), F.lit(1))
        )
        df = sitemaps.select(
            F.col(src_col).alias("sitemap_url"),
            block.alias("ord", "_b"),
        )
        return df.select(
            "sitemap_url",
            F.lit(kind).alias("kind"),
            "ord",
            xml_unescape(_field(F.col("_b"), "loc")).alias("loc"),
            _field(F.col("_b"), "lastmod").alias("lastmod"),
            _field(F.col("_b"), "changefreq").alias("changefreq"),
            _field(F.col("_b"), "priority").alias("priority"),
        )

    out = entries(_URL_BLOCK, "url").unionByName(
        entries(_INDEX_BLOCK, "sitemap")
    )
    return out.filter(F.col("loc").isNotNull())


_RSS_ITEM = r"(?s)<item\b[^>]*>(.*?)</item>"
_ATOM_ENTRY = r"(?s)<entry\b[^>]*>(.*?)</entry>"
_ATOM_LINK = r'(?s)<link\b[^>]*href\s*=\s*"([^"]*)"'


def parse_feeds(
    feeds: DataFrame, xml_col: str = "xml", src_col: str = "feed_url"
) -> DataFrame:
    """RSS 2.0 / Atom feed-item extraction — the OTHER discovery
    channel next to sitemaps (feeds surface new URLs minutes after
    publication; sitemaps lag). Same pure-JVM design as
    parse_sitemaps: one regexp_extract_all + posexplode per block
    kind, one regexp_extract per field, the shared entity-decode
    chain — no XML library, no Python. Both syntaxes are parsed from
    every input (a fetcher rarely knows which it got): RSS
    ``<item>`` children with text-element ``<link>``, Atom
    ``<entry>`` children with attribute-form ``<link href="…"/>``
    (first link wins — rel=self/alternate disambiguation is the
    caller's policy, documented out of scope like sitemap gzip).

    (feed_url, xml) → (feed_url, kind 'rss'|'atom', ord, link,
    title, entry_id, published); rows without a link are dropped.
    """

    def items(pattern: str, kind: str, link, idtag: str, pub: str):
        block = F.posexplode(
            F.regexp_extract_all(F.col(xml_col), F.lit(pattern), F.lit(1))
        )
        df = feeds.select(
            F.col(src_col).alias("feed_url"), block.alias("ord", "_b")
        )
        return df.select(
            "feed_url",
            F.lit(kind).alias("kind"),
            "ord",
            xml_unescape(link(F.col("_b"))).alias("link"),
            xml_unescape(_field(F.col("_b"), "title")).alias("title"),
            _field(F.col("_b"), idtag).alias("entry_id"),
            _field(F.col("_b"), pub).alias("published"),
        )

    def atom_link(b: Column) -> Column:
        got = F.regexp_extract(b, _ATOM_LINK, 1)
        return F.when(got == "", F.lit(None).cast("string")).otherwise(got)

    rss = items(
        _RSS_ITEM, "rss", lambda b: _field(b, "link"), "guid", "pubDate"
    )
    atom = items(_ATOM_ENTRY, "atom", atom_link, "id", "updated")
    return rss.unionByName(atom).filter(F.col("link").isNotNull())
