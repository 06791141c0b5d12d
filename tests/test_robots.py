"""robots.txt compliance (operators/robots.py) vs an independent
straightforward Python matcher, RFC 9309's own precedence examples, and
the join-based Spark evaluation end-to-end."""

import random
import re

import pytest
from pyspark.sql import functions as F

from sample_dms_kinesis_rds_mariadb_spark.operators.robots import (
    compile_robots_rules,
    parse_robots,
    robots_filter,
    robots_pattern_regex,
)


def _py_allowed(rules: list[tuple[bool, str]], path: str) -> bool:
    """Independent matcher: direct longest-match scan (allow wins ties),
    wildcard handled by its own translation — NOT the module's."""
    best = None  # (length, allow)
    for allow, pattern in rules:
        anchored = pattern.endswith("$")
        body = pattern[:-1] if anchored else pattern
        rx = ".*".join(re.escape(p) for p in body.split("*"))
        rx = "^" + rx + ("$" if anchored else "")
        if re.match(rx, path):
            key = (len(pattern), allow)
            if best is None or key > best:
                best = key
    return True if best is None else best[1]


ROBOTS = """
# example robots file
User-agent: googlebot
Disallow: /private/

User-agent: *
Allow: /public/
Disallow: /
Allow: /foo/*/bar
Disallow: /foo/*/bar/deep$
Allow: /dual
Disallow: /dual
"""


def test_parse_groups_and_agent_selection():
    star = parse_robots(ROBOTS, agent="*")
    assert (False, "/private/") not in star
    assert (True, "/public/") in star and (False, "/") in star
    goog = parse_robots(ROBOTS, agent="GoogleBot")
    assert goog == [(False, "/private/")]
    assert parse_robots("", agent="*") == []
    # rules before any user-agent line are ignored; empty Disallow = none
    assert parse_robots("Disallow: /x\nUser-agent: *\nDisallow:") == []


def test_rfc_precedence_semantics():
    rules = parse_robots(ROBOTS, agent="*")
    # longest match wins: /public/x matched by Allow /public/ (len 8)
    # over Disallow / (len 1)
    assert _py_allowed(rules, "/public/x") is True
    assert _py_allowed(rules, "/elsewhere") is False
    # wildcard + $ anchor: deeper disallow is LONGER and wins
    assert _py_allowed(rules, "/foo/a/bar") is True
    assert _py_allowed(rules, "/foo/a/bar/deep") is False
    assert _py_allowed(rules, "/foo/a/bar/deeper") is True  # $ fails
    # equal-length tie: Allow wins
    assert _py_allowed(rules, "/dual") is True


def test_pattern_translation():
    assert robots_pattern_regex("/a/*/b$") == r"^/a/.*/b$"
    assert robots_pattern_regex("/p") == "^/p"
    # regex metacharacters in paths stay literal
    rx = robots_pattern_regex("/q?.x")
    assert re.match(rx, "/q?.x") and not re.match(rx, "/qz.x")


def test_robots_filter_matches_python_reference(spark):
    rng = random.Random(11)
    rules_df = compile_robots_rules(
        spark,
        [("a.example", ROBOTS), ("b.example", "User-agent: *\nDisallow: /no/")],
        agent="*",
    )
    parsed = {
        "a.example": parse_robots(ROBOTS, "*"),
        "b.example": parse_robots("User-agent: *\nDisallow: /no/", "*"),
        "c.example": [],  # no robots file at all
    }
    paths = [
        "/public/x", "/elsewhere", "/foo/a/bar", "/foo/a/bar/deep",
        "/foo/a/bar/deeper", "/dual", "/no/way", "/yes/way", "/",
    ] + [f"/r/{rng.randrange(100)}" for _ in range(20)]
    rows = sorted(
        {(d, p) for d in ("a.example", "b.example", "c.example") for p in paths}
    )
    urls = spark.createDataFrame(rows, "domain string, path string")
    got = {
        (r["domain"], r["path"]): r["allowed"]
        for r in robots_filter(urls, rules_df).collect()
    }
    assert len(got) == len(rows)
    for d, p in rows:
        assert got[(d, p)] == _py_allowed(parsed[d], p), (d, p)


def test_robots_filter_keeps_extra_columns(spark):
    rules_df = compile_robots_rules(
        spark, [("a.example", "User-agent: *\nDisallow: /x")], agent="*"
    )
    urls = spark.createDataFrame(
        [("a.example", "/x/1", 10), ("a.example", "/y", 20)],
        "domain string, path string, score int",
    )
    out = {r["path"]: (r["allowed"], r["score"]) for r in robots_filter(urls, rules_df).collect()}
    assert out == {"/x/1": (False, 10), "/y": (True, 20)}


def test_matching_groups_combine_per_rfc():
    txt = (
        "User-agent: botA\nDisallow: /one\n\n"
        "User-agent: *\nDisallow: /star\n\n"
        "User-agent: botA\nUser-agent: botB\nDisallow: /two\n"
    )
    # all groups naming botA combine; the * group does NOT apply to botA
    assert parse_robots(txt, "botA") == [(False, "/one"), (False, "/two")]
    assert parse_robots(txt, "botB") == [(False, "/two")]
    assert parse_robots(txt, "other") == [(False, "/star")]


def test_sitemaps_and_crawl_delay():
    from sample_dms_kinesis_rds_mariadb_spark.operators.robots import (
        parse_crawl_delay,
        parse_sitemaps,
    )

    txt = (
        "Sitemap: https://ex.com/s1.xml\n"
        "User-agent: botA\nCrawl-delay: 2\nDisallow: /x\n\n"
        "User-agent: *\nCrawl-delay: 0.5\n"
        "Sitemap: https://ex.com/s2.xml # trailing comment\n"
        "User-agent: botA\nCrawl-delay: 7\n"
    )
    assert parse_sitemaps(txt) == [
        "https://ex.com/s1.xml", "https://ex.com/s2.xml",
    ]
    assert parse_crawl_delay(txt, "botA") == 7.0  # max across combined groups
    assert parse_crawl_delay(txt, "other") == 0.5
    assert parse_crawl_delay("User-agent: *\nDisallow: /", "*") is None
    assert parse_crawl_delay("User-agent: *\nCrawl-delay: soon", "*") is None


def test_sitemap_urls_extraction(spark):
    from sample_dms_kinesis_rds_mariadb_spark.functions.html import sitemap_urls

    xml = (
        '<?xml version="1.0"?><urlset>'
        "<url><loc> https://ex.com/a </loc></url>"
        "<url><LOC><![CDATA[https://ex.com/b?x=1]]></LOC></url>"
        "<url><lastmod>2026-01-01</lastmod></url></urlset>"
    )
    df = spark.createDataFrame([(xml,)], "xml string")
    got = df.select(sitemap_urls(F.col("xml")).alias("u")).collect()[0]["u"]
    assert list(got) == ["https://ex.com/a", "https://ex.com/b?x=1"]


def test_distributed_rule_compile_matches_driver_compile(spark):
    from sample_dms_kinesis_rds_mariadb_spark.operators.robots import (
        robots_rules_from_corpus,
    )

    corpus = [
        ("a.example", ROBOTS),
        ("b.example", "User-agent: *\nDisallow: /no/"),
        ("c.example", None),  # fetched nothing: contributes no rules
    ]
    driver = compile_robots_rules(
        spark, [(d, t) for d, t in corpus if t is not None], agent="*"
    )
    dist = robots_rules_from_corpus(
        spark.createDataFrame(corpus, "domain string, robots_txt string"),
        agent="*",
    )
    as_rows = lambda df: sorted(map(tuple, df.collect()))
    assert as_rows(dist) == as_rows(driver)
    # and it feeds robots_filter identically
    urls = spark.createDataFrame(
        [("a.example", "/public/x"), ("b.example", "/no/1")],
        "domain string, path string",
    )
    got = {r["path"]: r["allowed"] for r in robots_filter(urls, dist).collect()}
    assert got == {"/public/x": True, "/no/1": False}


def test_sitemap_locs_and_index_detection(spark):
    """sitemap_locs: <loc> extraction with the named-entity unescape
    chain (&amp; LAST — double-escaped text never double-decodes),
    whitespace trimming, numeric refs untouched; is_sitemap_index on
    the root tag only (r12)."""
    from pyspark.sql import functions as F

    from sample_dms_kinesis_rds_mariadb_spark.operators.robots import (
        is_sitemap_index,
        sitemap_locs,
    )

    urlset = (
        '<?xml version="1.0"?><urlset xmlns="x">'
        "<url><loc>  https://a.example/?x=1&amp;y=2 </loc></url>"
        "<url><loc>https://a.example/%20p?q=&amp;amp;z</loc></url>"
        "<url><loc>https://a.example/&#47;num</loc></url>"
        "</urlset>"
    )
    index = ('<sitemapIndex xmlns="x"><sitemap>'
             "<loc>https://a.example/sitemap-1.xml.gz</loc>"
             "</sitemap></sitemapIndex>")
    df = spark.createDataFrame([(1, urlset), (2, index), (3, "not xml")],
                               "id long, xml string")
    rows = {
        r["id"]: r
        for r in df.select(
            "id",
            sitemap_locs(F.col("xml")).alias("locs"),
            is_sitemap_index(F.col("xml")).alias("idx"),
        ).collect()
    }
    assert rows[1]["locs"] == [
        "https://a.example/?x=1&y=2",
        # &amp;amp; decodes ONCE -> &amp;
        "https://a.example/%20p?q=&amp;z",
        # numeric character references pass through untouched
        "https://a.example/&#47;num",
    ]
    assert rows[1]["idx"] is False
    assert rows[2]["locs"] == ["https://a.example/sitemap-1.xml.gz"]
    assert rows[2]["idx"] is True
    assert rows[3]["locs"] == [] and rows[3]["idx"] is False


def test_html_page_metadata_edge_cases(spark):
    """html_page_metadata: missing fields NULL (never ''), both quote
    styles, entity decode in title/description, first-match-wins for
    duplicated tags, jsonld_blocks multiple scripts (r12)."""
    from pyspark.sql import functions as F

    from sample_dms_kinesis_rds_mariadb_spark.functions.html import (
        html_page_metadata,
        jsonld_blocks,
    )

    html = (
        "<html><head><title>T &lt;1&gt; &amp;amp;</title>"
        "<meta name='description' content=''>"  # blank -> NULL
        "<meta property='og:image' content='https://i.example/a.png'>"
        "<link href='https://c.example/x' rel='canonical'>"
        '<script type="application/ld+json">{"a":1}</script>'
        "<script type='application/ld+json'>{\"b\":2}</script>"
        "<script>var notLd = 1;</script>"
        "</head></html>"
    )
    row = spark.createDataFrame([(html,)], "html string").select(
        html_page_metadata(F.col("html")).alias("m"),
        jsonld_blocks(F.col("html")).alias("j"),
    ).collect()[0]
    m = row["m"]
    assert m["title"] == "T <1> &amp;"  # &amp;amp; decodes ONCE
    assert m["description"] is None  # blank content is NULL
    assert m["og_image"] == "https://i.example/a.png"
    assert m["canonical"] == "https://c.example/x"  # reversed attr order
    assert m["lang"] is None and m["robots_meta"] is None
    assert list(row["j"]) == ['{"a":1}', '{"b":2}']
