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
