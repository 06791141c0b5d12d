"""RSS/Atom feed parsing: both dialects in one pass, CDATA vs entity
decode, Atom href links, field fallbacks, NULL-not-'' — fixtures
composed from the published RSS 2.0 and RFC 4287 examples."""

from __future__ import annotations

from pyspark.sql import functions as F

from sample_dms_kinesis_rds_mariadb_spark.functions.feeds import (
    feed_entries,
    feed_kind,
    feed_title,
)

RSS = """<?xml version="1.0"?>
<rss version="2.0"><channel>
<title>Example Channel &amp; Co</title>
<link>https://ex.com/</link>
<item>
  <title><![CDATA[First &amp; stays literal]]></title>
  <link>https://ex.com/a?x=1&amp;y=2</link>
  <pubDate>Mon, 01 Jan 2024 10:00:00 GMT</pubDate>
  <description>Summary &lt;one&gt;</description>
</item>
<item><title>Second</title><link>https://ex.com/b</link></item>
</channel></rss>"""

ATOM = """<?xml version="1.0" encoding="utf-8"?>
<feed xmlns="http://www.w3.org/2005/Atom">
<title>Atom Feed</title>
<entry>
  <title>Entry One</title>
  <link rel="alternate" href="https://ex.com/e1"/>
  <published>2024-02-01T00:00:00Z</published>
  <summary>sum one</summary>
</entry>
<entry>
  <title>Entry Two</title>
  <link href="https://ex.com/e2"/>
  <updated>2024-02-02T00:00:00Z</updated>
</entry>
</feed>"""


def _parse(spark, xml):
    return spark.createDataFrame([(xml,)], "xml string").select(
        feed_kind(F.col("xml")).alias("kind"),
        feed_title(F.col("xml")).alias("ftitle"),
        feed_entries(F.col("xml")).alias("entries"),
    ).collect()[0]


def test_rss_items(spark):
    row = _parse(spark, RSS)
    assert row["kind"] == "rss"
    # channel title, entity-decoded; NOT the first item's title
    assert row["ftitle"] == "Example Channel & Co"
    e1, e2 = row["entries"]
    assert e1["title"] == "First &amp; stays literal"  # CDATA literal
    assert e1["link"] == "https://ex.com/a?x=1&y=2"  # entity-decoded
    assert e1["published"] == "Mon, 01 Jan 2024 10:00:00 GMT"
    assert e1["summary"] == "Summary <one>"
    assert e2["title"] == "Second" and e2["published"] is None
    assert e2["summary"] is None


def test_atom_entries(spark):
    row = _parse(spark, ATOM)
    assert row["kind"] == "atom"
    assert row["ftitle"] == "Atom Feed"
    e1, e2 = row["entries"]
    assert e1["link"] == "https://ex.com/e1"  # href ATTRIBUTE form
    assert e1["published"] == "2024-02-01T00:00:00Z"
    assert e1["summary"] == "sum one"
    # published falls back to <updated>
    assert e2["published"] == "2024-02-02T00:00:00Z"
    assert e2["link"] == "https://ex.com/e2"


def test_not_a_feed_and_empty(spark):
    row = _parse(spark, "<html><body>nope</body></html>")
    assert row["kind"] is None and row["entries"] == []
    row2 = _parse(spark, "<rss version='2.0'><channel><title>T</title>"
                         "</channel></rss>")
    assert row2["kind"] == "rss" and row2["entries"] == []
    assert row2["ftitle"] == "T"  # no items: the head IS the document


def test_review_fixes_rel_alternate_cdata_literal_headless(spark):
    """Review fixes: Atom rel='alternate' beats earlier self/replies
    links; CDATA content is literal (no inner trim); a headless
    fragment has NO channel title (never the first item's)."""
    atom = """<feed xmlns="http://www.w3.org/2005/Atom"><title>F</title>
<entry><title>E</title>
<link rel="replies" href="https://b.example/comments"/>
<link href="https://b.example/edit" rel="edit"/>
<link rel="alternate" href="https://b.example/post"/>
</entry></feed>"""
    row = _parse(spark, atom)
    assert row["entries"][0]["link"] == "https://b.example/post"
    cdata = ("<rss><channel><title>C</title><item>"
             "<title><![CDATA[  padded  ]]></title></item>"
             "</channel></rss>")
    row2 = _parse(spark, cdata)
    assert row2["entries"][0]["title"] == "  padded  "  # literal
    headless = "<item><title>Item One</title></item>"
    row3 = _parse(spark, headless)
    assert row3["ftitle"] is None  # no channel title, never the item's
    assert row3["entries"][0]["title"] == "Item One"
