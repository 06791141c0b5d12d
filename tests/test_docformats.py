"""Document-format text extraction vs the independent spec-derived PDF
writer (tests/pdf_writer.py) and zipfile-built EPUB/DOCX fixtures: the
same text must come back through every PDF file layout (classic xref,
xref streams, object streams, PNG-predicted xref rows, wrong /Length,
Flate/ASCIIHex/plain), ToUnicode CMaps must map CID text, boundaries
must raise precisely, and the Spark leg must survive corrupt payloads
with per-row errors instead of task failures."""

from __future__ import annotations

import io
import zipfile

import pytest

from sample_dms_kinesis_rds_mariadb_spark.sources import pdf as P
from sample_dms_kinesis_rds_mariadb_spark.sources.docformats import (
    docx_text,
    epub_text,
    extract_document_texts,
    sniff_document_format,
)
from tests.pdf_writer import text_content, write_pdf

_LAYOUTS = (
    dict(),
    dict(compress="none"),
    dict(compress="hex"),
    dict(xref_stream=True),
    dict(xref_stream=True, objstm=True),
    dict(xref_stream=True, objstm=True, predictor=True),
    dict(wrong_length=True),
)


def _two_pages():
    return [
        text_content(["Hello PDF world.", "Second line here."]),
        text_content([["Kerned", -250, "words", -50, "x"]]),
    ]


def test_pdf_text_identical_across_every_file_layout():
    """Classic xref, xref streams, object streams, predicted xref rows,
    hex/plain/Flate content, and a lying /Length must all produce the
    IDENTICAL text — layout is transport, not content."""
    texts = set()
    for kw in _LAYOUTS:
        blob = write_pdf(_two_pages(), info={"Title": "Fixture Doc"}, **kw)
        texts.add(P.pdf_text(blob))
    assert len(texts) == 1
    t = texts.pop()
    assert "Hello PDF world.\nSecond line here." in t
    assert "Kerned wordsx" in t  # -250 kern spaces, -50 does not
    assert "\f" in t             # pages join with form-feed


def test_pdf_metadata_and_escapes():
    blob = write_pdf(
        [text_content(["A (parenthetical) line with \\ backslash."])],
        info={"Title": "T (x)", "Author": "A"},
    )
    assert "A (parenthetical) line with \\ backslash." in P.pdf_text(blob)
    m = P.pdf_metadata(blob)
    assert m["n_pages"] == 1 and m["title"] == "T (x)" and m["author"] == "A"
    assert m["version"] == "1.5"


def test_pdf_tounicode_cid_text():
    """Type0 text through a /ToUnicode CMap: 2-byte codes map through
    bfchar AND bfrange sections."""
    cmap = {0x0041: "H", 0x0042: "i", 0x0100: "a", 0x0101: "b",
            0x0102: "c"}
    rev = {v: k for k, v in cmap.items()}

    def enc(s):
        return b"".join(rev[ch].to_bytes(2, "big") for ch in s)

    blob = write_pdf(
        [text_content(["Hi", "abc"], encode=enc, hex_strings=True)],
        tounicode=cmap,
    )
    assert P.pdf_text(blob) == "Hi\nabc"


def test_pdf_boundaries_raise_precisely():
    # encryption
    blob = write_pdf([text_content(["secret"])])
    enc = blob.replace(
        b"/Root 1 0 R", b"/Root 1 0 R /Encrypt << /V 2 >>"
    )
    with pytest.raises(NotImplementedError, match="encrypted"):
        P.pdf_text(enc)
    # unsupported filter
    bad = blob.replace(b"/Filter /FlateDecode", b"/Filter /DCTDecode")
    with pytest.raises(NotImplementedError, match="DCTDecode"):
        P.pdf_text(bad)
    # not a PDF at all
    with pytest.raises(P.PdfError, match="missing %PDF-"):
        P.pdf_text(b"\x00\x01junk")


def test_pdf_broken_xref_falls_back_to_object_scan():
    """A corrupt startxref offset must not lose the document — the
    reader scans every 'N G obj' and finds the catalog."""
    blob = bytearray(write_pdf(_two_pages()))
    i = bytes(blob).rfind(b"startxref")
    j = bytes(blob).find(b"\n", i + 10)
    digits = bytes(blob)[i + 10 : j].strip()
    blob[i + 10 : i + 10 + len(digits)] = b"9" * len(digits)
    t = P.pdf_text(bytes(blob))
    assert "Hello PDF world." in t and "Kerned wordsx" in t


def test_pdf_lzw_filter_roundtrip():
    """LZWDecode (EarlyChange=1): compress a content stream with an
    independent TIFF-flavor LZW compressor and swap it in."""
    from tests.tiff_writer import _TiffLZW

    content = text_content(["LZW filtered text line."])
    import zlib

    flate = zlib.compress(content)
    blob = write_pdf([content])
    lzw = _TiffLZW().compress(content)
    swapped = blob.replace(
        b"/Filter /FlateDecode /Length %d" % len(flate),
        b"/Filter /LZWDecode /Length %d" % len(lzw),
    ).replace(flate, lzw)
    assert "LZW filtered text line." in P.pdf_text(swapped)


# --- EPUB / DOCX ---------------------------------------------------------


def _epub(chapters: list[tuple[str, str]], drm: bool = False,
          spine_order: list[str] | None = None) -> bytes:
    """Minimal OCF/OPF EPUB from (name, xhtml) chapters."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("mimetype", "application/epub+zip")
        zf.writestr(
            "META-INF/container.xml",
            '<?xml version="1.0"?>'
            '<container xmlns="urn:oasis:names:tc:opendocument:xmlns:'
            'container" version="1.0"><rootfiles>'
            '<rootfile full-path="OEBPS/content.opf" '
            'media-type="application/oebps-package+xml"/>'
            "</rootfiles></container>",
        )
        if drm:
            zf.writestr("META-INF/encryption.xml", "<encryption/>")
        items = "".join(
            f'<item id="c{i}" href="{name}" '
            'media-type="application/xhtml+xml"/>'
            for i, (name, _) in enumerate(chapters)
        )
        order = spine_order or [f"c{i}" for i in range(len(chapters))]
        refs = "".join(f'<itemref idref="{r}"/>' for r in order)
        zf.writestr(
            "OEBPS/content.opf",
            '<package xmlns="http://www.idpf.org/2007/opf" version="3.0">'
            f"<manifest>{items}</manifest><spine>{refs}</spine></package>",
        )
        for name, xhtml in chapters:
            zf.writestr(f"OEBPS/{name}", xhtml)
    return buf.getvalue()


def test_epub_spine_order_and_html_rules():
    from sample_dms_kinesis_rds_mariadb_spark.functions.html import (
        py_html_to_text,
    )

    ch1 = "<html><body><h1>One</h1><p>First &amp; chapter.</p></body></html>"
    ch2 = "<html><body><p>Second chapter.</p></body></html>"
    # zip order ch2-first is irrelevant: the SPINE orders chapters
    blob = _epub([("b.xhtml", ch2), ("a.xhtml", ch1)],
                 spine_order=["c1", "c0"])
    t = epub_text(blob)
    want = py_html_to_text(ch1) + "\f" + py_html_to_text(ch2)
    assert t == want
    assert "First & chapter." in t


def test_epub_drm_raises():
    blob = _epub([("a.xhtml", "<p>x</p>")], drm=True)
    with pytest.raises(NotImplementedError, match="DRM"):
        epub_text(blob)


def _docx(paragraphs: list[list[tuple[str, str]]]) -> bytes:
    """Minimal OOXML: paragraphs of (kind, value) runs, kind in
    t/tab/br."""
    w = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    body = ""
    for para in paragraphs:
        runs = ""
        for kind, val in para:
            if kind == "t":
                runs += f"<w:r><w:t>{val}</w:t></w:r>"
            elif kind == "tab":
                runs += "<w:r><w:tab/></w:r>"
            elif kind == "br":
                runs += "<w:r><w:br/></w:r>"
        body += f"<w:p>{runs}</w:p>"
    xml = (
        f'<w:document xmlns:w="{w}"><w:body>{body}</w:body></w:document>'
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("[Content_Types].xml", "<Types/>")
        zf.writestr("word/document.xml", xml)
    return buf.getvalue()


def test_docx_runs_tabs_breaks():
    blob = _docx(
        [
            [("t", "Name"), ("tab", ""), ("t", "Value")],
            [("t", "Line one"), ("br", ""), ("t", "line two")],
        ]
    )
    assert docx_text(blob) == "Name\tValue\nLine one\nline two"


def test_sniffing():
    assert sniff_document_format(write_pdf(_two_pages())) == "pdf"
    assert sniff_document_format(_epub([("a.xhtml", "<p>x</p>")])) == "epub"
    assert sniff_document_format(_docx([[("t", "x")]])) == "docx"
    assert sniff_document_format(b"PK\x03\x04garbage") is None
    assert sniff_document_format(b"plain text") is None


# --- Spark leg -------------------------------------------------------------


def test_extract_document_texts_spark_leg(spark):
    """Mixed batch through the Arrow pass: every format extracts, a
    corrupt payload sets error instead of killing the task, and the
    plan runs Arrow-side (MapInPandas), never row-at-a-time Python."""
    rows = [
        (0, write_pdf(_two_pages())),
        (1, _epub([("a.xhtml", "<p>Chapter text.</p>")])),
        (2, _docx([[("t", "Doc text.")]])),
        (3, b"%PDF-1.5 then total garbage"),
        (4, b"not a document at all"),
    ]
    df = spark.createDataFrame(
        [(i, bytearray(b)) for i, b in rows], "doc_id LONG, content BINARY"
    )
    out = extract_document_texts(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan or "ArrowEvalPython" in plan
    got = {r["doc_id"]: r for r in out.collect()}
    assert got[0]["format"] == "pdf" and "Hello PDF" in got[0]["text"]
    assert got[1]["format"] == "epub" and got[1]["text"] == "Chapter text."
    assert got[2]["format"] == "docx" and got[2]["text"] == "Doc text."
    assert got[3]["error"] is not None and got[3]["text"] is None
    assert got[4]["error"] is not None
    assert got[0]["n_chars"] == len(got[0]["text"])


def test_pdf_inside_warc_composition(spark):
    """Crawl reality: PDFs arrive inside WARC responses. warc_records
    with include_body=True keeps the RAW body bytes (the charset decode
    into `html` would mangle them); filtering on the HTTP content type
    and feeding `body` to extract_document_texts completes the document
    front door end to end."""
    from pyspark.sql import functions as F

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

    pdf_blob = write_pdf([text_content(["PDF inside a WARC record."])])
    warc = record(pdf_blob, "application/pdf", "https://x.example/a.pdf") \
        + record(b"<p>HTML record.</p>", "text/html; charset=utf-8",
                 "https://x.example/b.html")
    df = spark.createDataFrame(
        [(0, bytearray(warc))], "file_id LONG, content BINARY"
    )
    recs = warc_records(df, include_body=True)
    pdfs = recs.filter(
        F.col("http_content_type").startswith("application/pdf")
    ).select(
        F.col("record_no").cast("long").alias("doc_id"),
        F.col("body").alias("content"),
    )
    out = extract_document_texts(pdfs).collect()
    assert len(out) == 1
    assert out[0]["format"] == "pdf"
    assert "PDF inside a WARC record." in out[0]["text"]
    # the html leg is untouched: the html column still decodes
    html_rows = recs.filter(F.col("http_content_type").startswith(
        "text/html")).collect()
    assert html_rows[0]["html"] == "<p>HTML record.</p>"
    # default schema (no include_body) is unchanged
    assert "body" not in warc_records(df).columns


def test_pdf_ascii85_and_runlength_filters():
    """ASCII85Decode and RunLengthDecode round-trip through independent
    encoders in the writer (incl. the z shortcut and repeat runs)."""
    content = text_content(
        ["A85 text with zeros", "and a looooooooooooooong repeat run"]
    )
    for compress in ("a85", "rle"):
        blob = write_pdf([content], compress=compress)
        t = P.pdf_text(blob)
        assert "A85 text with zeros" in t, compress
        assert "looooooooooooooong" in t, compress
    # unit vectors for the decoders themselves
    from tests.pdf_writer import _a85_encode, _rle_encode

    import numpy as np

    rng = np.random.default_rng(6)
    for n in (0, 1, 2, 3, 4, 5, 63, 200):
        raw = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        assert P._ascii85_decode(_a85_encode(raw)) == raw, n
        assert P._runlength_decode(_rle_encode(raw)) == raw, n
    assert P._ascii85_decode(b"z~>") == b"\x00\x00\x00\x00"


def test_pdf_form_xobject_text():
    """Body text inside a /Form XObject (the office-exporter layout):
    the page content is just '/Fx1 Do' — the reader must splice the
    form's text in, using the FORM's own /Resources fonts."""
    pages = [
        text_content(["Form one text."]),
        text_content(["Form two text."]),
    ]
    blob = write_pdf(pages, form_xobject=True)
    t = P.pdf_text(blob)
    assert "Form one text." in t and "Form two text." in t
    assert t.count("\f") == 1
    # a form with a ToUnicode font keeps CID decode inside the form
    cmap = {0x0041: "O", 0x0042: "k"}
    rev = {v: k for k, v in cmap.items()}
    blob = write_pdf(
        [text_content(["Ok"], hex_strings=True,
                      encode=lambda s: b"".join(
                          rev[c].to_bytes(2, "big") for c in s))],
        form_xobject=True, tounicode=cmap,
    )
    assert P.pdf_text(blob) == "Ok"


def test_rtf_control_words_escapes_and_destinations():
    from sample_dms_kinesis_rds_mariadb_spark.sources.docformats import (
        rtf_text,
    )

    blob = (
        rb"{\rtf1\ansi{\fonttbl{\f0 Times New Roman;}}"
        rb"{\colortbl;\red0\green0\blue0;}"
        rb"{\*\generator FixtureWriter 1.0;}"
        rb"\f0 Hello\par World \'e9 caf\'e9 \u8212?dash"
        rb"\tab tabbed \{brace\} \\slash}"
    )
    t = rtf_text(blob)
    assert t.splitlines()[0] == "Hello"
    assert "World é café —dash\ttabbed {brace} \\slash" in t
    assert "Times" not in t and "generator" not in t  # destinations skipped
    # \uc2 skips TWO fallback chars after \u
    t2 = rtf_text(rb"{\rtf1 \uc2 a\u233??b}")
    assert t2 == "aéb"
    with pytest.raises(ValueError, match="rtf"):
        rtf_text(b"plain text")


def _odt(paragraphs: list[str]) -> bytes:
    t = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"
    body = "".join(f'<text:p>{p}</text:p>' for p in paragraphs)
    xml = (
        f'<office:document-content xmlns:office="urn:x" xmlns:text="{t}">'
        f"<office:body><office:text>{body}</office:text></office:body>"
        "</office:document-content>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("mimetype", "application/vnd.oasis.opendocument.text")
        zf.writestr("content.xml", xml)
    return buf.getvalue()


def test_odt_paragraphs_and_whitespace_elements():
    from sample_dms_kinesis_rds_mariadb_spark.sources.docformats import (
        odt_text,
    )

    blob = _odt(
        ["First paragraph.",
         'Col1<text:tab/>Col2',
         'Three<text:s text:c="3"/>spaces',
         'Break<text:line-break/>here']
    )
    assert odt_text(blob) == (
        "First paragraph.\nCol1\tCol2\nThree   spaces\nBreak\nhere"
    )
    assert sniff_document_format(blob) == "odt"


def test_rtf_odt_through_spark_leg(spark):
    rows = [
        (0, rb"{\rtf1 RTF body text\par here}"),
        (1, _odt(["ODT body text."])),
    ]
    df = spark.createDataFrame(
        [(i, bytearray(b)) for i, b in rows], "doc_id LONG, content BINARY"
    )
    got = {r["doc_id"]: r for r in extract_document_texts(df).collect()}
    assert got[0]["format"] == "rtf" and got[0]["text"] == (
        "RTF body text\nhere"
    )
    assert got[1]["format"] == "odt" and got[1]["text"] == "ODT body text."


def test_review_fixes_rtf_odt_sniff_a85():
    """Second-pass review fixes: (a) a backslash before a non-ASCII
    byte must not crash rtf_text; (b) surrogate-pair \\uN sequences
    (how Word writes emoji) combine into real code points — never lone
    surrogates (which Arrow strings reject); (c) ODT text nested in
    text:span/text:a (the LibreOffice shape) is kept; (d) ODF
    spreadsheets sniff as ods, not odt; (e) a corrupt ASCII85 group
    raises PdfError (the documented contract), not OverflowError."""
    from sample_dms_kinesis_rds_mariadb_spark.sources.docformats import (
        odt_text,
        rtf_text,
    )

    # (a) stray high byte after backslash: char stands for itself
    assert "abc" in rtf_text(b"{\\rtf1 \\\xe9abc}")
    # (b) U+1F600 as the surrogate pair Word emits
    t = rtf_text(rb"{\rtf1 ok \u-10179?\u-8704? done}")
    assert "\U0001f600" in t and not any(
        0xD800 <= ord(c) < 0xE000 for c in t
    )
    # a LONE surrogate is replaced, not emitted
    t2 = rtf_text(rb"{\rtf1 x\u-10179?y}")
    assert not any(0xD800 <= ord(c) < 0xE000 for c in t2)
    # (c) nested spans
    tns = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"
    xml = (
        f'<d xmlns:text="{tns}"><text:p><text:span>Hello '
        "<text:span>nested</text:span> world</text:span></text:p>"
        "<text:p><text:span>A<text:tab/>B</text:span></text:p></d>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("mimetype", "application/vnd.oasis.opendocument.text")
        zf.writestr("content.xml", xml)
    assert odt_text(buf.getvalue()) == "Hello nested world\nA\tB"
    # (d) spreadsheet flavor
    buf2 = io.BytesIO()
    with zipfile.ZipFile(buf2, "w") as zf:
        zf.writestr(
            "mimetype", "application/vnd.oasis.opendocument.spreadsheet"
        )
        zf.writestr("content.xml", "<x/>")
    assert sniff_document_format(buf2.getvalue()) == "ods"
    # (e) ASCII85 overflow
    blob = write_pdf([text_content(["x"])], compress="a85")
    import re as _re

    broken = _re.sub(rb"stream\n[^~]*~>", b"stream\nuuuuu~>", blob)
    with pytest.raises(P.PdfError, match="32 bits"):
        P.pdf_text(broken)
    # job-survival: both crashers flow to the error column
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is not None:
        df = spark.createDataFrame(
            [(0, bytearray(broken)), (1, bytearray(rb"{\rtf1 fine}"))],
            "doc_id LONG, content BINARY",
        )
        got = {r["doc_id"]: r for r in extract_document_texts(df).collect()}
        assert got[0]["error"] is not None
        assert got[1]["text"] == "fine"


def test_decompression_bomb_guards():
    """A crafted Flate stream (or zip member) that inflates past the
    64 MiB guard becomes a precise raise — never an executor OOM."""
    import zlib as _z

    bomb = _z.compress(b"\x00" * (80 * 1024 * 1024), 9)  # ~80 KB compressed
    pdf = (
        b"%%PDF-1.5\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Filter /FlateDecode /Length %d >>\nstream\n"
        % len(bomb) + bomb + b"\nendstream\nendobj\n%%EOF"
    )
    with pytest.raises(P.PdfError, match="bomb guard"):
        P.pdf_text(pdf)
    # zip-member analog: an oversized content.xml raises before reading
    import zlib

    big = b"<x>" + b"a" * (70 * 1024 * 1024) + b"</x>"
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("mimetype", "application/vnd.oasis.opendocument.text")
        zf.writestr("content.xml", big)
    from sample_dms_kinesis_rds_mariadb_spark.sources.docformats import (
        odt_text,
    )

    with pytest.raises(ValueError, match="bomb guard"):
        odt_text(buf.getvalue())


def test_pdf_utf16be_show_strings():
    """BOM-prefixed UTF-16BE literal show strings (the §7.9.2.2 text
    string form some generators emit without ToUnicode) decode to real
    Unicode; plain strings stay Latin-1."""
    def enc(s):
        return b"\xfe\xff" + s.encode("utf-16-be")

    blob = write_pdf(
        [text_content(["Ünïcodé — em-dash", "plain ascii"],
                      hex_strings=True, encode=enc)],
    )
    t = P.pdf_text(blob)
    assert "Ünïcodé — em-dash" in t and "plain ascii" in t


def test_pdf_hybrid_reference_layout():
    """Hybrid-reference files (§7.5.8.4, Acrobat optimized saves):
    classic table marks ObjStm members free, trailer /XRefStm points
    at the companion xref stream — the reader must follow it."""
    blob = write_pdf(
        _two_pages(), xref_stream=True, objstm=True, hybrid=True
    )
    assert b"/XRefStm" in blob and b"trailer" in blob
    t = P.pdf_text(blob)
    assert "Hello PDF world." in t and "Kerned wordsx" in t


def test_pdf_duplicate_kid_dag_bomb_rejected():
    """A /Pages DAG listing the same kid twice at 40 levels stays under
    any depth cap but explodes to 2^40 leaf visits — the visited-node
    guard must reject it fast instead of hanging the executor."""
    import time

    depth = 40
    objs = [b"<< /Type /Catalog /Pages 2 0 R >>"]
    for i in range(depth):
        num = 2 + i
        kid = num + 1
        objs.append(
            b"<< /Type /Pages /Kids [%d 0 R %d 0 R] /Count 2 >>"
            % (kid, kid)
        )
    leaf = 2 + depth
    objs.append(
        b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 612 792] >>"
        % (leaf - 1)
    )
    out = bytearray(b"%PDF-1.4\n")
    for i, body in enumerate(objs):
        out += b"%d 0 obj\n" % (i + 1) + body + b"\nendobj\n"
    out += b"startxref\n999999999\n%%EOF\n"  # broken: forces object scan
    t0 = time.monotonic()
    with pytest.raises(P.PdfError, match="revisit"):
        P.PdfDocument(bytes(out)).pages()
    assert time.monotonic() - t0 < 5.0


def test_pdf_page_count_capped_by_trailer_size():
    """pages() must refuse to collect more pages than the trailer /Size
    can account for (inconsistent or hostile page trees)."""
    blob = write_pdf(_two_pages())
    # shrink /Size so the 2-page collection overruns it
    doc = P.PdfDocument(blob)
    doc.trailer["Size"] = 1
    with pytest.raises(P.PdfError, match="/Size bound"):
        doc.pages()


def test_pdf_chained_filter_bomb_guard():
    """[/FlateDecode /RunLengthDecode] chains may legally inflate past
    the per-decoder caps; the per-stage guard must stop them."""
    import zlib

    # 600k repeat runs x 128 bytes = ~76.8 MB RunLength output
    rle = b"\x81\x41" * 600_000 + b"\x80"
    flated = zlib.compress(rle)
    stream = P.Stream(
        {"Filter": ["FlateDecode", "RunLengthDecode"]}, flated
    )
    with pytest.raises(P.PdfError, match="bomb guard"):
        P.decode_stream(stream, lambda x: x)
    # a bare oversized RunLength stream trips the in-decoder cap too
    stream2 = P.Stream({"Filter": "RunLengthDecode"}, rle)
    with pytest.raises(P.PdfError, match="bomb guard"):
        P.decode_stream(stream2, lambda x: x)


def _set_zip_encrypted_flag(blob: bytes) -> bytes:
    """Flip the general-purpose bit 0 (encrypted) on every local and
    central-directory header — the shape of password-protected members
    in crawled DOCX/EPUB files."""
    out = bytearray(blob)
    i = 0
    while True:
        i = out.find(b"PK\x03\x04", i)
        if i < 0:
            break
        out[i + 6] |= 0x01
        i += 4
    i = 0
    while True:
        i = out.find(b"PK\x01\x02", i)
        if i < 0:
            break
        out[i + 8] |= 0x01
        i += 4
    return bytes(out)


def test_extract_document_texts_survives_hostile_rows(spark):
    """Per-row error contract under the exception types crawl payloads
    actually raise: RuntimeError (encrypted zip member), ValueError
    (ODT nesting bomb), plus a good row — the task never aborts."""
    import xml.etree.ElementTree as _ET  # noqa: F401

    from sample_dms_kinesis_rds_mariadb_spark.sources.docformats import (
        extract_document_texts,
    )

    # encrypted DOCX: zipfile raises RuntimeError on member read
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("[Content_Types].xml", "<Types/>")
        zf.writestr("word/document.xml", "<w:document/>")
    encrypted = _set_zip_encrypted_flag(buf.getvalue())

    # ODT span-nesting bomb: ValueError from the depth cap
    t = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"
    deep = "<text:span>" * 300 + "x" + "</text:span>" * 300
    xml = (
        f'<office:document-content xmlns:office="urn:x" xmlns:text="{t}">'
        f"<office:body><office:text><text:p>{deep}</text:p>"
        "</office:text></office:body></office:document-content>"
    )
    buf2 = io.BytesIO()
    with zipfile.ZipFile(buf2, "w") as zf:
        zf.writestr("mimetype", "application/vnd.oasis.opendocument.text")
        zf.writestr("content.xml", xml)

    good = write_pdf([text_content(["ok doc"])])
    df = spark.createDataFrame(
        [(1, bytearray(encrypted)), (2, bytearray(buf2.getvalue())),
         (3, bytearray(good))],
        "doc_id long, content binary",
    )
    rows = {r.doc_id: r for r in extract_document_texts(df).collect()}
    assert rows[1].text is None and "RuntimeError" in rows[1].error
    assert rows[2].text is None and (
        "ValueError" in rows[2].error or "depth" in rows[2].error
    )
    assert rows[3].error is None and "ok doc" in rows[3].text


def test_pdf_identity_h_without_tounicode_policy():
    """Type0 /Identity-H with NO /ToUnicode: the documented
    deterministic CID policy — each 2-byte CID becomes its own
    codepoint when that is a valid non-control scalar (lossless for
    fonts whose CIDs are codepoints), never U+FFFD, never Latin-1
    mojibake of the byte stream."""
    def enc(s):
        return s.encode("utf-16-be")  # CIDs = codepoints

    cmap = {ord(c): c for c in set("Identity text!")}
    blob = write_pdf(
        [text_content(["Identity text!"], hex_strings=True, encode=enc)],
        tounicode=cmap,
    )
    # length-preserving font-object swap: drop the /ToUnicode ref for
    # /Encoding /Identity-H so the classic-xref offsets stay valid
    old = None
    m = __import__("re").search(
        rb"<< /Type /Font /Subtype /Type0 /BaseFont /Fixture "
        rb"/ToUnicode \d+ 0 R >>", blob)
    assert m
    old = m.group()
    base = b"<< /Type /Font /Subtype /Type0 /Encoding /Identity-H"
    new = base + b" " * (len(old) - len(base) - 2) + b">>"
    assert len(new) == len(old)
    patched = blob.replace(old, new)
    t = P.pdf_text(patched)
    assert "Identity text!" in t
    assert "�" not in t
    # CIDs outside the valid scalar range are SKIPPED, not garbled:
    # control codes and surrogate-range CIDs vanish deterministically
    def enc2(_s):
        return b"\x00H\x00i\x00\x01\xd8\x00\x00!"  # H, i, ctrl, surrogate, !

    blob2 = write_pdf(
        [text_content(["xx"], hex_strings=True, encode=enc2)],
        tounicode=cmap,
    )
    patched2 = blob2.replace(old, new)
    t2 = P.pdf_text(patched2)
    assert "Hi!" in t2 and "�" not in t2


def test_pdf_predefined_cjk_cmaps_decode_exactly():
    """Type0 fonts with predefined CJK CMaps and NO /ToUnicode (the
    common CJK-export shape): the Uni* CMaps' code values ARE Unicode
    (UTF-16BE show strings), the legacy CMaps' code space is the named
    national charset — both decode to the EXACT original text, ending
    the Latin-1 mojibake fallback for this class."""
    cases = [
        ("UniGB-UCS2-H", "utf-16-be", "简体中文测试。"),
        ("UniJIS-UCS2-HW-V", "utf-16-be", "日本語のテスト。"),
        ("UniKS-UTF16-H", "utf-16-be", "한국어 시험."),
        ("UniCNS-UCS2-H", "utf-16-be", "繁體中文測試。"),
        ("GBK-EUC-H", "gbk", "简体中文测试。"),
        ("90ms-RKSJ-H", "cp932", "日本語のテスト。"),
        ("KSC-EUC-H", "euc_kr", "한국어 시험."),
        ("B5pc-H", "big5", "繁體中文測試。"),
        ("GBK2K-H", "gb18030", "简体中文测试。"),
    ]
    for enc_name, codec, text in cases:
        blob = write_pdf(
            [text_content([text], hex_strings=True,
                          encode=lambda s, c=codec: s.encode(c))],
            type0_encoding=enc_name,
        )
        out = P.pdf_text(blob)
        assert text in out, (enc_name, out)
        assert "�" not in out, enc_name


def test_pdf_unknown_predefined_cmap_raises():
    """A Type0 font whose predefined CMap is OUTSIDE the registry must
    raise precisely (error row upstream), never emit Latin-1 mojibake
    of multi-byte code values."""
    blob = write_pdf(
        [text_content(["opaque"], hex_strings=True,
                      encode=lambda s: s.encode("utf-16-be"))],
        type0_encoding="Kanji-Custom-H",
    )
    with pytest.raises(NotImplementedError, match="Kanji-Custom-H"):
        P.pdf_text(blob)
