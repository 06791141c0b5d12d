"""RSS 2.0 / Atom feed parsing as pure column expressions — the
syndication layer of a crawl (news, blogs, podcasts) carries clean
per-article titles, links, timestamps and summaries that are far
higher-precision than re-extracting them from the article HTML.

Spark-first shape: ``feed_entries`` is one ``regexp_extract_all`` over
the item/entry blocks plus per-field ``regexp_extract`` inside a
``transform`` — entirely codegen, a scan at 100 TB, no Python workers,
no shuffle. The field grammar covers both dialects in one pass:

- RSS ``<item>``: title, link (element text), pubDate, description
- Atom ``<entry>``: title, link (the ``href`` ATTRIBUTE — Atom links
  are empty elements), updated/published, summary/content

CDATA-wrapped values unwrap; plain values get the module's named-
entity decode (same five-entity chain as ``functions/html.py``, with
``&amp;`` last). Missing fields are NULL, never ''. Feed kind is
``feed_kind``: 'rss' / 'atom' / NULL (not a feed).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_ENTITIES = (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
             ("&#39;", "'"), ("&apos;", "'"), ("&amp;", "&"))


def _decode(col: Column) -> Column:
    for ent, ch in _ENTITIES:
        col = F.replace(col, F.lit(ent), F.lit(ch))
    return col


def _field(block: Column, tag: str) -> Column:
    """<tag>text</tag> or <tag><![CDATA[text]]></tag> from an item
    block: CDATA is literal, plain text entity-decodes; '' -> NULL."""
    raw = F.regexp_extract(
        block,
        f"(?is)<{tag}[^>]*>\\s*(<!\\[CDATA\\[.*?\\]\\]>|[^<]*?)\\s*</{tag}\\s*>",
        1,
    )
    is_cdata = F.lower(raw).startswith("<![cdata[")
    # CDATA content is LITERAL: no trim, no entity decode (the module
    # contract — only the wrapper goes)
    literal = raw.substr(F.lit(10), F.length(raw) - F.lit(12))
    return F.nullif(
        F.when(is_cdata, literal).otherwise(_decode(raw)), F.lit("")
    )


def feed_kind(col: Column) -> Column:
    """'rss' | 'atom' | NULL — by root element."""
    return (
        F.when(col.rlike(r"(?is)<\s*rss[\s>]"), F.lit("rss"))
        .when(col.rlike(r"(?is)<\s*feed[\s>]"), F.lit("atom"))
        .otherwise(F.lit(None).cast("string"))
    )


def feed_title(col: Column) -> Column:
    """The channel/feed-level title: the first title BEFORE any
    item/entry block. A document with items but nothing before them
    (a headless fragment) has no channel title — NULL, never the first
    item's; a feed with no items at all searches the whole document."""
    has_items = col.rlike(r"(?is)<\s*(item|entry)[\s>]")
    head = F.regexp_extract(col, r"(?is)^(.*?)<\s*(item|entry)[\s>]", 1)
    return _field(F.when(has_items, head).otherwise(col), "title")


def feed_entries(col: Column) -> Column:
    """ARRAY<STRUCT<title, link, published, summary>> — one struct per
    RSS <item> / Atom <entry>, document order."""
    blocks = F.concat(
        F.regexp_extract_all(col, F.lit(r"(?is)<item[\s>](.*?)</item\s*>"), 1),
        F.regexp_extract_all(col, F.lit(r"(?is)<entry[\s>](.*?)</entry\s*>"), 1),
    )

    def _entry(b: Column) -> Column:
        # Atom: <link href="..."/> attribute — prefer rel="alternate"
        # (the article URL) over whatever rel="self"/"replies"/"edit"
        # link happens to be listed first; fall back to the first href
        alt = F.coalesce(
            F.nullif(F.regexp_extract(
                b,
                r"(?is)<link\s[^>]*?rel\s*=\s*[\"']alternate[\"']"
                r"[^>]*?href\s*=\s*[\"']([^\"']*)", 1
            ), F.lit("")),
            F.nullif(F.regexp_extract(
                b,
                r"(?is)<link\s[^>]*?href\s*=\s*[\"']([^\"']*)[\"']"
                r"[^>]*?rel\s*=\s*[\"']alternate[\"']", 1
            ), F.lit("")),
        )
        link_attr = F.coalesce(alt, F.nullif(F.regexp_extract(
            b, r"(?is)<link\s[^>]*?href\s*=\s*[\"']([^\"']*)", 1
        ), F.lit("")))
        published = F.coalesce(
            _field(b, "pubDate"), _field(b, "published"), _field(b, "updated"),
            _field(b, "dc:date"),
        )
        summary = F.coalesce(
            _field(b, "description"), _field(b, "summary"),
        )
        return F.struct(
            _field(b, "title").alias("title"),
            F.coalesce(_field(b, "link"), link_attr).alias("link"),
            published.alias("published"),
            summary.alias("summary"),
        )

    return F.transform(blocks, _entry)
