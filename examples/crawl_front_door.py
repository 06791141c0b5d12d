"""The crawl front door, end to end (the r12 surface):

  mixed payloads (zip/tar archives, PDFs, HTML, RTF, SRT subtitles)
    → expand_archives        (members out of archives, bomb-capped)
    → route_document_texts   (binary magic → Arrow readers; subtitles
                              and HTML stay pure-codegen JVM-side)
    → html_page_metadata     (title/og/canonical signals on HTML rows)
  feed payloads → feed_entries (RSS/Atom article records)
  media payloads (IVF/Annex-B/MPEG-TS/M3U8/AVIF/WebM …)
    → extract_media_metadata (container + codec + stream-level truth)

Run: python examples/crawl_front_door.py  [sf_dir, default sf0.001]

Everything is a Spark plan from the engine's operator library; the
only collects are the demo summaries at the end.
"""

from __future__ import annotations

import io
import os
import sys
import zipfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sample_dms_kinesis_rds_mariadb_spark.functions.feeds import (
    feed_entries,
    feed_kind,
)
from sample_dms_kinesis_rds_mariadb_spark.functions.html import (
    html_page_metadata,
)
from sample_dms_kinesis_rds_mariadb_spark.plans.queries import load_table
from sample_dms_kinesis_rds_mariadb_spark.session import get_session
from sample_dms_kinesis_rds_mariadb_spark.sources.archives import (
    expand_archives,
)
from sample_dms_kinesis_rds_mariadb_spark.sources.docformats import (
    route_document_texts,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_session(app_name="crawl-front-door", cpus=8,
                        shuffle_partitions=8)
    docs = load_table(spark, sf_dir, "documents").limit(200).cache()
    rows = docs.select("doc_id", F.substring("text", 1, 300).alias("t")).collect()

    # --- synthesize a mixed crawl: every third payload is an archive
    def zip_of(safe: str) -> bytes:
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            z.writestr("page.html", f"<html><body><p>{safe}</p></body></html>")
            z.writestr("note.rtf", "{\\rtf1\\ansi " + safe[:120] + "\\par}")
        return buf.getvalue()

    payloads = []
    for r in rows:
        i, t = int(r["doc_id"]), (r["t"] or "")
        safe = "".join(c if " " <= c <= "~" else " " for c in t)
        if i % 3 == 0:
            payloads.append((i, bytearray(zip_of(safe))))
        elif i % 3 == 1:
            payloads.append((i, bytearray(
                f"<html><head><title>{safe[:40]}</title>"
                f'<meta property="og:title" content="doc {i}"/></head>'
                f"<body><p>{safe}</p></body></html>".encode())))
        else:
            payloads.append((i, bytearray(
                ("1\n00:00:01,000 --> 00:00:04,000\n" + safe[:80]
                 + "\n\n2\n00:00:05,000 --> 00:00:06,000\n<i>cue</i>\n"
                 ).encode())))
    crawl = spark.createDataFrame(payloads, "doc_id long, content binary")

    # --- stage 1: archives → member rows, re-joined with direct payloads
    members = expand_archives(crawl.filter(F.col("doc_id") % 3 == 0))
    member_docs = members.filter("error IS NULL").select(
        F.concat_ws("#", F.col("doc_id").cast("string"),
                    "member_name").alias("doc_id"),
        F.col("member_bytes").alias("content"),
    )
    direct_docs = crawl.filter(F.col("doc_id") % 3 != 0).select(
        F.col("doc_id").cast("string"), "content"
    )

    # --- stage 2: the front door (HTML/subtitles codegen, binary → Arrow)
    texts = route_document_texts(direct_docs.unionByName(member_docs))
    fmt_counts = {r["format"]: r["n"] for r in
                  texts.groupBy("format").agg(F.count("*").alias("n")).collect()}
    print("front door formats:", dict(sorted(fmt_counts.items())))

    # --- stage 3: page metadata on the HTML slice
    html_rows = crawl.filter(F.col("doc_id") % 3 == 1).select(
        "doc_id", F.decode("content", "UTF-8").alias("html"))
    meta = html_rows.select("doc_id", html_page_metadata(F.col("html")).alias("m"))
    got = meta.select("doc_id", "m.title", "m.og_title").orderBy("doc_id").first()
    if got is not None:
        print("page meta sample:", got["title"], "|", got["og_title"])
    else:
        print("page meta sample: (no HTML payloads in this corpus slice)")

    # --- stage 4: a feed
    feed = spark.createDataFrame([(1, (
        '<rss version="2.0"><channel><title>chan</title>'
        "<item><title>A</title><link>https://ex/a</link></item>"
        "<item><title>B</title><link>https://ex/b</link></item>"
        "</channel></rss>"))], "id long, xml string")
    entries = feed.select(feed_kind(F.col("xml")).alias("kind"),
                          F.explode(feed_entries(F.col("xml"))).alias("e"))
    print("feed:", [(r["kind"], r["e"]["title"], r["e"]["link"])
                    for r in entries.collect()])
    spark.stop()


if __name__ == "__main__":
    main()
