"""Binary-document intake for the curation façades (VERDICT r10 item
3): WARC-crawled PDFs/EPUBs flow end-to-end through ``curate()`` /
``curate_stream()`` in one call — sniff → extract → text pipeline,
error rows funneled. The manual composition this must match is the
one in tests/test_docformats.py's WARC→PDF test."""

from __future__ import annotations

import io
import json
import os
import time
import zipfile

from pyspark.sql import functions as F

from sample_dms_kinesis_rds_mariadb_spark.pipeline import curate, curate_stream
from sample_dms_kinesis_rds_mariadb_spark.sources.docformats import (
    route_document_texts,
)
from tests.pdf_writer import text_content, write_pdf


def _epub(chapters: list[str]) -> bytes:
    items = "".join(
        f'<item id="c{i}" href="c{i}.xhtml" '
        f'media-type="application/xhtml+xml"/>'
        for i in range(len(chapters))
    )
    spine = "".join(f'<itemref idref="c{i}"/>' for i in range(len(chapters)))
    opf = (
        '<package xmlns="http://www.idpf.org/2007/opf">'
        f"<manifest>{items}</manifest><spine>{spine}</spine></package>"
    )
    container = (
        '<container xmlns="urn:oasis:names:tc:opendocument:xmlns:container">'
        '<rootfiles><rootfile full-path="content.opf" '
        'media-type="application/oebps-package+xml"/></rootfiles>'
        "</container>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("mimetype", "application/epub+zip")
        zf.writestr("META-INF/container.xml", container)
        zf.writestr("content.opf", opf)
        for i, ch in enumerate(chapters):
            zf.writestr(f"c{i}.xhtml", f"<html><body><p>{ch}</p></body></html>")
    return buf.getvalue()


def _mixed_payloads() -> list[tuple[int, bytes, str]]:
    """(doc_id, content, origin) rows covering every route: HTML fast
    path, PDF/EPUB/RTF Arrow path, one broken payload (error row)."""
    return [
        (1, b"<html><body><p>Plain html page one two three.</p></body></html>",
         "web"),
        (2, write_pdf([text_content(["A pdf document body here."])]), "web"),
        (3, _epub(["An epub chapter with words."]), "web"),
        (4, rb"{\rtf1\ansi Rtf content words here}", "web"),
        (5, b"%PDF-1.5 truncated garbage", "web"),  # broken: error row
        (6, b"just plain text, no markup at all", "web"),
    ]


def test_route_document_texts_mixed(spark):
    df = spark.createDataFrame(
        [(i, bytearray(c), o) for i, c, o in _mixed_payloads()],
        "doc_id long, content binary, origin string",
    )
    rows = {r.doc_id: r for r in route_document_texts(df).collect()}
    assert rows[1].format == "html" and "one two three" in rows[1].text
    assert rows[2].format == "pdf" and "A pdf document body" in rows[2].text
    assert rows[3].format == "epub" and "epub chapter" in rows[3].text
    assert rows[4].format == "rtf" and "Rtf content" in rows[4].text
    assert rows[5].text is None and rows[5].error is not None
    assert rows[6].format == "html" and "plain text" in rows[6].text
    # passthrough column rides both branches
    assert all(r.origin == "web" for r in rows.values())


def test_route_document_texts_null_payload_is_error_row(spark):
    """A NULL content payload must NOT be silently dropped (the sniff
    predicate evaluates to NULL, excluding the row from BOTH branches
    unless routed explicitly) — it becomes an error row, the
    extract_document_texts gate contract."""
    df = spark.createDataFrame(
        [(1, bytearray(b"<html><p>ok page</p></html>")), (2, None)],
        "doc_id long, content binary",
    )
    rows = {r.doc_id: r for r in route_document_texts(df).collect()}
    assert len(rows) == 2
    assert rows[1].format == "html" and "ok page" in rows[1].text
    assert rows[2].text is None and rows[2].error is not None


def test_curate_binary_intake_matches_manual_compose(spark):
    docs = spark.createDataFrame(
        [(i, bytearray(c)) for i, c, _ in _mixed_payloads()],
        "doc_id long, content binary",
    )
    gates = {"min_len": F.length("text") >= 10}

    res = curate(docs, content_col="content", gates=gates, dedup=("exact",))
    facade_ids = sorted(
        r.doc_id for r in res.corpus.select("doc_id").collect()
    )

    manual = (
        route_document_texts(docs)
        .filter(F.col("error").isNull())
        .drop("error")
    )
    manual_res = curate(manual, gates=gates, dedup=("exact",))
    manual_ids = sorted(
        r.doc_id for r in manual_res.corpus.select("doc_id").collect()
    )
    assert facade_ids == manual_ids
    funnel = dict(res.funnel)
    assert funnel["input"] == 6
    assert funnel["extract_errors"] == 1
    assert funnel["extracted"] == 5


def test_curate_binary_intake_from_warc_bodies(spark):
    """Crawl reality end-to-end: WARC records (mixed HTML + PDF
    content types) → raw bodies → curate(content_col=...)."""
    from sample_dms_kinesis_rds_mariadb_spark.sources.warc import (
        warc_records,
    )

    def record(body: bytes, ctype: str, uri: str) -> bytes:
        http = (
            f"HTTP/1.1 200 OK\r\nContent-Type: {ctype}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode("latin-1") + body
        head = (
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"WARC-Record-ID: <urn:uuid:1>\r\n"
            b"WARC-Date: 2026-01-01T00:00:00Z\r\n"
            + f"WARC-Target-URI: {uri}\r\n".encode()
            + b"Content-Type: application/http; msgtype=response\r\n"
            + f"Content-Length: {len(http)}\r\n\r\n".encode()
        )
        return head + http + b"\r\n\r\n"

    pdf_blob = write_pdf([text_content(["Pdf body inside the warc."])])
    warc = (
        record(b"<p>Html body inside the warc, long enough.</p>",
               "text/html; charset=utf-8", "https://x.example/a")
        + record(pdf_blob, "application/pdf", "https://x.example/b.pdf")
    )
    df = spark.createDataFrame(
        [(0, bytearray(warc))], "file_id LONG, content BINARY"
    )
    payloads = warc_records(df, include_body=True).select(
        F.col("record_no").cast("long").alias("doc_id"),
        F.col("body").alias("content"),
    )
    res = curate(payloads, content_col="content", dedup=("exact",))
    texts = {r.doc_id: r.text for r in res.corpus.collect()}
    assert any("Pdf body inside the warc." in t for t in texts.values())
    assert any("Html body inside the warc" in t for t in texts.values())
    assert dict(res.funnel)["extract_errors"] == 0


def _await(query, timeout: float = 120.0) -> None:
    deadline = time.monotonic() + timeout
    while query.isActive and time.monotonic() < deadline:
        time.sleep(0.3)
    if query.isActive:
        query.stop()
    query.awaitTermination(10)


def test_curate_stream_binary_intake(spark, tmp_path):
    """The streaming dual: binary payloads arrive as a stream; the
    extracted gate counts extraction failures; output family equals
    the batch façade's."""
    src = str(tmp_path / "incoming")
    os.makedirs(src, exist_ok=True)
    rows = [(i, bytearray(c)) for i, c, _ in _mixed_payloads()]
    spark.createDataFrame(
        rows, "doc_id long, content binary"
    ).coalesce(1).write.parquet(os.path.join(src, "b0"))

    stream = (
        spark.readStream.schema("doc_id long, content binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "*"))
    )
    run = curate_stream(
        stream,
        index_path=str(tmp_path / "idx"),
        output_path=str(tmp_path / "corpus"),
        checkpoint=str(tmp_path / "ckpt"),
        content_col="content",
        gates={"min_len": F.length("text") >= 10},
    )
    _await(run.query)
    out = spark.read.parquet(str(tmp_path / "corpus"))
    got = {r.doc_id: r for r in out.collect()}
    # doc 5 fails extraction (extracted gate), the rest pass min_len
    assert set(got) == {1, 2, 3, 4, 6}
    assert "error" not in out.columns
    assert got[2].format == "pdf" and "A pdf document body" in got[2].text
    # the per-batch funnel recorded the gated input
    with open(run.funnel_path) as f:
        lines = [json.loads(ln) for ln in f if ln.strip()]
    assert lines and lines[0]["input"] == 5  # post-gate micro-batch rows


def test_subtitle_routing_in_front_door(spark):
    """r12: WEBVTT/SRT payloads route to the pure-codegen subtitle
    branch (format vtt/srt), anchored at document start so HTML that
    merely quotes a cue stays HTML; BOM-prefixed SRT still routes."""
    from sample_dms_kinesis_rds_mariadb_spark.sources.docformats import (
        route_document_texts,
    )

    srt = b"1\n00:00:01,000 --> 00:00:02,000\nHello <i>cue</i>\n"
    bom_srt = b"\xef\xbb\xbf" + srt
    vtt = (b"WEBVTT\n\n00:00:01.000 --> 00:00:02.000\n"
           b"<v Ann>Salut</v>\n")
    html_quoting_cue = (b"<html><body><p>example:</p><pre>1\n"
                        b"00:00:01,000 --> 00:00:02,000\nquoted</pre>"
                        b"</body></html>")
    df = spark.createDataFrame(
        [(1, bytearray(srt)), (2, bytearray(vtt)),
         (3, bytearray(html_quoting_cue)), (4, bytearray(bom_srt))],
        "doc_id long, content binary",
    )
    rows = {r["doc_id"]: r for r in route_document_texts(df).collect()}
    assert rows[1]["format"] == "srt" and rows[1]["text"] == "Hello cue"
    assert rows[2]["format"] == "vtt" and rows[2]["text"] == "Salut"
    assert rows[3]["format"] == "html" and "quoted" in rows[3]["text"]
    assert rows[4]["format"] == "srt" and "Hello cue" in rows[4]["text"]
    assert all(r["error"] is None for r in rows.values())


def test_bom_webvtt_routes_as_subtitle(spark):
    """Review fix: the WebVTT spec allows a BOM before 'WEBVTT' — the
    latin-1 probe sees it as 'ï»¿' and must still route."""
    from sample_dms_kinesis_rds_mariadb_spark.sources.docformats import (
        route_document_texts,
    )

    vtt = (b"\xef\xbb\xbfWEBVTT\n\n00:00:01.000 --> 00:00:02.000\nHi\n")
    df = spark.createDataFrame([(1, bytearray(vtt))],
                               "doc_id long, content binary")
    (row,) = route_document_texts(df).collect()
    assert row["format"] == "vtt" and row["text"] == "Hi"
