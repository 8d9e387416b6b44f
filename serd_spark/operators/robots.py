"""robots.txt compliance filtering — the crawl-politeness gate a
Common-Crawl-style pipeline runs before fetching or before admitting
fetched pages into the corpus (RFC 9309; the reference serd scope is
RDF syntax, but its host pipeline consumes crawl corpora where this
filter is table stakes).

Two-table shape, sized for 100 TB: robots.txt files are a PER-HOST
table — millions of rows at web scale, bytes each — while the URL
table is the corpus. So parsing (the only Python) runs once over the
small host table via mapInPandas, emitting a flat RULES table that is
grouped per host and BROADCAST; the URL side is pure JVM — one
regexp host/path split, one broadcast join, and a row-local
higher-order FILTER + array_max over the (small) per-host rule array.
The corpus never shuffles and no Python ever sees a URL row.

RFC 9309 subset, documented divergences:
- Group selection: the group whose ``User-agent`` token equals the
  crawler's product token (case-insensitive) wins; otherwise the
  ``*`` group. Multiple groups for the same agent merge (RFC 9309
  §2.2.1). No longest-prefix agent matching (``FooBot/1.2`` must be
  matched by passing the product token ``foobot``).
- Rule matching: ``*`` matches any octet sequence, ``$`` anchors the
  pattern end, longest-raw-pattern wins, allow wins length ties
  (least-restrictive rule, RFC 9309 §2.2.2). No percent-decoding of
  paths or patterns.
- ``Sitemap``/``Crawl-delay``/unknown keys and comments are ignored.

Patterns compile to SQL ``LIKE`` (escape ``\\``, ``*`` → ``%``, no
trailing ``%`` when ``$``-anchored), so the match predicate is the
same expression in Spark and in the DuckDB oracle mirror.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RULES_SCHEMA = (
    "host string, rule_ord int, allow int, pattern string, "
    "like_pat string, pat_len int"
)


def like_pattern(path_pat: str) -> str:
    """robots path pattern → SQL LIKE pattern (backslash escape).
    ``*`` → ``%``; a trailing ``$`` anchors (no trailing ``%``)."""
    anchored = path_pat.endswith("$")
    if anchored:
        path_pat = path_pat[:-1]
    esc = (
        path_pat.replace("\\", "\\\\")
        .replace("%", "\\%")
        .replace("_", "\\_")
        .replace("*", "%")
    )
    if anchored or path_pat.endswith("*"):
        return esc
    return esc + "%"


def parse_robots(text: str, agent: str = "*") -> list[tuple[bool, str]]:
    """Parse one robots.txt body; return the (allow, pattern) rules
    of the group that applies to ``agent`` (lowercase product token).
    Empty-value rules are no-ops per RFC 9309 (an empty Disallow
    means 'allow everything', i.e. no rule)."""
    agent = agent.lower()
    groups: list[tuple[set[str], list[tuple[bool, str]]]] = []
    cur_agents: set[str] = set()
    cur_rules: list[tuple[bool, str]] | None = None
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if cur_rules is not None:  # a rule closed the agent list
                groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = set(), None
            cur_agents.add(val.lower())
        elif key in ("allow", "disallow"):
            if not cur_agents:
                continue  # rule before any user-agent line: ignored
            if cur_rules is None:
                cur_rules = []
            if val:  # empty value = no rule
                cur_rules.append((key == "allow", val))
    if cur_agents:
        groups.append((cur_agents, cur_rules or []))
    exact = [r for agents, rules in groups if agent in agents
             for r in rules]
    if any(agent in agents for agents, _ in groups):
        return exact
    return [r for agents, rules in groups if "*" in agents
            for r in rules]


def parse_sitemap_urls(text: str) -> list[str]:
    """``Sitemap:`` directives (RFC 9309 §2.3 allows them anywhere in
    the file, outside any group; first-seen order, deduped)."""
    out: list[str] = []
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        key, _, val = line.partition(":")
        # the value is itself a URL containing ':', so only the FIRST
        # colon splits; re-join is unnecessary because partition
        # keeps the remainder intact in ``val``
        if key.strip().lower() == "sitemap":
            val = val.strip()
            if val and val not in out:
                out.append(val)
    return out


def robots_sitemaps(robots: DataFrame) -> DataFrame:
    """(host, robots_txt) → (host, ord, sitemap_url): the discovery
    bridge from the compliance file into sitemap.py's parser. Same
    single-Python-crossing shape as robots_rules — host table only."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hosts, ords, urls = [], [], []
            for host, txt in zip(pdf["host"].values,
                                 pdf["robots_txt"].values):
                for i, u in enumerate(parse_sitemap_urls(txt or "")):
                    hosts.append(host)
                    ords.append(i)
                    urls.append(u)
            yield pd.DataFrame(
                {"host": hosts, "ord": ords, "sitemap_url": urls}
            )

    return robots.select("host", "robots_txt").mapInPandas(
        run, "host string, ord int, sitemap_url string"
    )


def robots_rules(robots: DataFrame, agent: str = "*") -> DataFrame:
    """(host, robots_txt) → flat rules table (RULES_SCHEMA) for
    ``agent``. One vectorized Python crossing over the HOST table —
    the small side; URL rows never enter Python."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hosts, ords, allows, pats, likes, lens = [], [], [], [], [], []
            for host, txt in zip(pdf["host"].values,
                                 pdf["robots_txt"].values):
                for i, (allow, pat) in enumerate(
                    parse_robots(txt or "", agent)
                ):
                    hosts.append(host)
                    ords.append(i)
                    allows.append(int(allow))
                    pats.append(pat)
                    likes.append(like_pattern(pat))
                    lens.append(len(pat))
            yield pd.DataFrame(
                {
                    "host": hosts, "rule_ord": ords, "allow": allows,
                    "pattern": pats, "like_pat": likes, "pat_len": lens,
                }
            )

    return robots.select("host", "robots_txt").mapInPandas(
        run, RULES_SCHEMA
    )


def robots_filter(
    urls: DataFrame, rules: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Annotate ``urls`` with the robots decision: ``allowed`` is
    true when no rule matches or the longest matching rule (allow
    wins ties) is an Allow. The rules table collapses to one
    rule-array row per host and is BROADCAST; the URL side is one
    join plus a row-local FILTER/array_max — zero shuffles on the
    corpus. Hosts with no robots row allow everything (RFC 9309:
    unavailable robots.txt means unrestricted)."""
    per_host = F.broadcast(
        rules.groupBy("host").agg(
            F.collect_list(
                F.struct("pat_len", "allow", "like_pat")
            ).alias("_rules")
        )
    )
    host = F.regexp_extract(F.col(url_col), r"^[a-z][a-z0-9+.-]*://([^/?#]+)", 1)
    path = F.regexp_extract(F.col(url_col), r"^[a-z][a-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    annotated = (
        urls.withColumn("host", host)
        .withColumn("path", F.when(path == "", F.lit("/")).otherwise(path))
        .join(per_host, "host", "left")
        # best = max over matching rules of (pat_len, allow): longest
        # pattern wins, allow wins the tie — RFC 9309 precedence
        .withColumn(
            "_best",
            F.array_max(
                F.expr(
                    "transform("
                    "  filter(_rules, r -> path like r.like_pat),"
                    "  r -> struct(r.pat_len as pat_len,"
                    "              r.allow as allow))"
                )
            ),
        )
        .withColumn(
            "allowed",
            F.coalesce(F.col("_best.allow") == 1, F.lit(True)),
        )
        .drop("_rules", "_best")
    )
    return annotated


def page_directives(
    pages: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """In-PAGE robots directives — the compliance signals robots.txt
    cannot carry: ``<meta name="robots" content="noindex, nofollow">``
    and per-anchor ``rel="nofollow"``. An indexing pipeline filters on
    ``noindex`` before materialization and a link-graph builder drops
    nofollow edges before PageRank (Google's original nofollow
    semantics), so both signals belong at ingest, next to the
    robots.txt gate (robots_filter) rather than after extraction.

    Pure JVM over the lossy binary→string cast (the tags are ASCII —
    the sniff.py argument): one regexp_extract for the robots meta
    block, one for its content attribute, one regexp_extract_all for
    nofollow anchors. Directive tokens are matched word-bounded and
    case-insensitively; ``none`` implies both noindex and nofollow
    (the documented Google/Bing equivalence).

    Returns (url_col, noindex boolean, nofollow boolean,
    n_nofollow_links int).
    """
    s = F.col(html_col).cast("string")
    block = F.regexp_extract(
        s, r"(?i)<meta\b[^>]*name\s*=\s*[\"']?robots\b[^>]*>", 0
    )
    content = F.regexp_extract(
        block, r"(?i)content\s*=\s*[\"']([^\"']*)", 1
    )
    none_tok = content.rlike(r"(?i)(^|[\s,])none([\s,]|$)")
    noindex = content.rlike(r"(?i)(^|[\s,])noindex([\s,]|$)") | none_tok
    nofollow = (
        content.rlike(r"(?i)(^|[\s,])nofollow([\s,]|$)") | none_tok
    )
    n_nofollow = F.size(
        F.regexp_extract_all(
            s,
            F.lit(r"(?i)<a\b[^>]*rel\s*=\s*[\"'][^\"']*nofollow"),
            F.lit(0),
        )
    )
    return pages.select(
        F.col(url_col),
        noindex.alias("noindex"),
        nofollow.alias("nofollow"),
        n_nofollow.cast("int").alias("n_nofollow_links"),
    )
