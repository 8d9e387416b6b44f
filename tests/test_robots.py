"""robots.txt parsing + compliance filter — RFC 9309 subset with
hand-computed expectations (group selection, precedence, wildcards,
anchors) and a Spark end-to-end decision check."""

from serd_spark.operators.robots import (
    like_pattern,
    parse_robots,
    robots_filter,
    robots_rules,
)

ROBOTS = """\
# politeness file
User-agent: other
Disallow: /

User-agent: *
Disallow: /page/1
Allow: /page/1*3$
Crawl-delay: 10
Sitemap: https://x.example/sitemap.xml

User-agent: serd
Disallow: /page/2
Allow: /page/22*
"""


# ------------------------------------------------------------- parser

def test_group_selection_exact_beats_star():
    assert parse_robots(ROBOTS, "serd") == [
        (False, "/page/2"), (True, "/page/22*")
    ]
    assert parse_robots(ROBOTS, "nobody") == [
        (False, "/page/1"), (True, "/page/1*3$")
    ]
    assert parse_robots(ROBOTS, "other") == [(False, "/")]


def test_agent_match_is_case_insensitive():
    assert parse_robots("User-Agent: SERD\nDisallow: /x\n", "serd") == [
        (False, "/x")
    ]


def test_same_agent_groups_merge():
    txt = "User-agent: a\nDisallow: /p\n\nUser-agent: a\nAllow: /q\n"
    assert parse_robots(txt, "a") == [(False, "/p"), (True, "/q")]


def test_shared_agent_list_and_empty_disallow():
    txt = (
        "User-agent: a\nUser-agent: b\nDisallow:\nDisallow: /only\n"
    )
    # empty Disallow is a no-op; both agents share the group
    assert parse_robots(txt, "a") == [(False, "/only")]
    assert parse_robots(txt, "b") == [(False, "/only")]


def test_rules_before_any_agent_are_ignored():
    assert parse_robots("Disallow: /x\nUser-agent: *\nAllow: /y\n",
                        "z") == [(True, "/y")]


def test_no_matching_group_means_no_rules():
    assert parse_robots("User-agent: a\nDisallow: /\n", "b") == []


# ------------------------------------------------------- like pattern

def test_like_pattern_wildcard_anchor_escape():
    assert like_pattern("/page/1") == "/page/1%"
    assert like_pattern("/page/1*3$") == "/page/1%3"
    assert like_pattern("/a_b%c") == "/a\\_b\\%c%"
    assert like_pattern("/x$") == "/x"


# ----------------------------------------------------- spark decision

def test_robots_filter_decisions(spark):
    robots = spark.createDataFrame(
        [("h.example", ROBOTS)], "host string, robots_txt string"
    )
    rules = robots_rules(robots, agent="serd")
    got = {
        (r.host, r.rule_ord): (r.allow, r.pattern, r.like_pat, r.pat_len)
        for r in rules.collect()
    }
    assert got == {
        ("h.example", 0): (0, "/page/2", "/page/2%", 7),
        ("h.example", 1): (1, "/page/22*", "/page/22%", 9),
    }
    urls = spark.createDataFrame(
        [
            ("https://h.example/page/2",),    # disallowed
            ("https://h.example/page/21",),   # prefix /page/2 → deny
            ("https://h.example/page/22",),   # longer Allow wins
            ("https://h.example/page/9",),    # no rule → allowed
            ("https://h.example",),           # empty path → "/" allowed
            ("https://nofile.example/page/2",),  # no robots → allowed
        ],
        "url string",
    )
    out = {r.url: r.allowed for r in robots_filter(urls, rules).collect()}
    assert out == {
        "https://h.example/page/2": False,
        "https://h.example/page/21": False,
        "https://h.example/page/22": True,
        "https://h.example/page/9": True,
        "https://h.example": True,
        "https://nofile.example/page/2": True,
    }


def test_robots_filter_star_group_wildcards(spark):
    robots = spark.createDataFrame(
        [("h.example", ROBOTS)], "host string, robots_txt string"
    )
    rules = robots_rules(robots, agent="nobody")  # falls to the * group
    urls = spark.createDataFrame(
        [
            ("https://h.example/page/1",),    # Disallow /page/1
            ("https://h.example/page/13",),   # Allow /page/1*3$ (longer)
            ("https://h.example/page/177",),  # ...but only when ending 3
            ("https://h.example/page/123",),  # wildcard middle match
            ("https://h.example/page/2",),    # * group has no /page/2
        ],
        "url string",
    )
    out = {r.url: r.allowed for r in robots_filter(urls, rules).collect()}
    assert out == {
        "https://h.example/page/1": False,
        "https://h.example/page/13": True,
        "https://h.example/page/177": False,
        "https://h.example/page/123": True,
        "https://h.example/page/2": True,
    }


def test_sitemap_directive_discovery(spark):
    from serd_spark.operators.robots import (
        parse_sitemap_urls,
        robots_sitemaps,
    )

    assert parse_sitemap_urls(ROBOTS) == ["https://x.example/sitemap.xml"]
    txt = (
        "Sitemap: https://h.example/a.xml\n"
        "User-agent: *\nDisallow: /\n"
        "sitemap: https://h.example/b.xml  # case-insensitive key\n"
        "Sitemap: https://h.example/a.xml\n"   # dedup
        "Sitemap:\n"                            # empty value ignored
    )
    assert parse_sitemap_urls(txt) == [
        "https://h.example/a.xml", "https://h.example/b.xml"
    ]
    df = spark.createDataFrame(
        [("h.example", txt)], "host string, robots_txt string"
    )
    got = [(r.host, r.ord, r.sitemap_url)
           for r in robots_sitemaps(df).orderBy("ord").collect()]
    assert got == [
        ("h.example", 0, "https://h.example/a.xml"),
        ("h.example", 1, "https://h.example/b.xml"),
    ]


def test_page_directives(spark):
    import pyspark.sql.functions as F

    from serd_spark.operators.robots import page_directives

    rows = [
        ("u1", b'<html><meta name="robots" content="noindex, nofollow">'),
        ("u2", b"<html><META NAME='robots' CONTENT='NOINDEX'>x"),
        ("u3", b'<html><meta name="robots" content="none">'),
        ("u4", b'<html><meta name="robots" content="noindexing">'),
        ("u5", b'<html><meta name="description" content="noindex">'),
        ("u6", b'<a href="/x" rel="nofollow">x</a><a rel="me nofollow" href="/y">y</a><a href="/z">z</a>'),
        ("u7", b"plain \xff bytes no tags"),
    ]
    df = spark.createDataFrame(
        [(u, bytearray(h)) for u, h in rows], "url string, html binary"
    )
    got = {
        r.url: (r.noindex, r.nofollow, r.n_nofollow_links)
        for r in page_directives(df).collect()
    }
    assert got["u1"] == (True, True, 0)
    assert got["u2"] == (True, False, 0)
    assert got["u3"] == (True, True, 0)     # none implies both
    assert got["u4"] == (False, False, 0)   # word-bounded: no prefix hit
    assert got["u5"] == (False, False, 0)   # wrong meta name
    assert got["u6"] == (False, False, 2)
    assert got["u7"] == (False, False, 0)   # invalid bytes are safe
