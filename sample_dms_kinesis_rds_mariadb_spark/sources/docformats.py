"""Document-format text extraction front door — PDF / EPUB / DOCX into
the ``documents``-shaped text the curation pipeline consumes.

Why it exists: the crawl intake (``sources/warc.py`` →
``functions/html.html_to_text`` → ``pipeline.curate``) read only HTML;
PDFs and packaged-XML formats are the next-largest text carriers in any
web corpus. Each reader is spec-derived and stdlib-only:

- **PDF** — ``sources/pdf.py`` (ISO 32000-1: xref tables + xref/object
  streams, Flate/LZW/ASCIIHex filters, the text-operator machine,
  ToUnicode CMaps; encryption raises);
- **EPUB** — OCF zip container (``META-INF/container.xml`` →  OPF
  package → spine order), each XHTML chapter through the repo's
  published ``html_to_text`` rule list (``functions/html.py`` — the
  same rules the Spark column uses, so EPUB text matches what the HTML
  leg would produce for the same markup). DRM (``encryption.xml``)
  raises;
- **DOCX** — OOXML zip (``word/document.xml``), ``w:t`` runs joined
  with paragraph breaks per ``w:p``, tabs per ``w:tab`` (ECMA-376
  §17.3). Password-protected OLE containers are not zips and raise;
- **ODT** — OpenDocument zip (``content.xml``): ``text:p``/``text:h``
  lines, ``text:tab``/``text:line-break``/``text:s`` whitespace
  elements (ODF 1.2 §6.1);
- **RTF** — control-word parser (group nesting, ``\\par``/``\\line``/
  ``\\tab``, ``\\'hh`` cp1252 escapes, ``\\uN`` with the ``\\uc``
  skip protocol, ``{\\*`` and table/style/info destinations skipped).

``extract_document_texts`` is the Spark leg: one Arrow ``mapInPandas``
pass sniffing each payload (%PDF-, zip magic + member names), returning
(doc per row: format, text, n_chars, error). Unreadable payloads set
``error`` instead of failing the task — the decode-gate contract the
media legs follow (``format='fake'`` there, ``error`` here, same idea:
one bad crawl payload never aborts a curation job).

At scale: per-row bounded work, the binary column never shuffles, text
lands as a plain string column ready for the text operators
(``functions/text.py``, dedup, curate gates).
"""

from __future__ import annotations

import io
import re
import zipfile
from typing import Iterator
from xml.etree import ElementTree

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from sample_dms_kinesis_rds_mariadb_spark.functions.html import (
    py_html_to_text,
)
from sample_dms_kinesis_rds_mariadb_spark.sources.pdf import (
    MAX_STREAM_BYTES,
    pdf_text,
)


def _zip_read(zf: zipfile.ZipFile, name: str) -> bytes:
    """Bounded zip-member read — the zip-bomb analog of the PDF
    stream guard: one crafted member must never OOM an executor (the
    payload becomes that row's error instead)."""
    info = zf.getinfo(name)
    if info.file_size > MAX_STREAM_BYTES:
        raise ValueError(
            f"zip member {name!r} inflates to {info.file_size} bytes "
            f"(> {MAX_STREAM_BYTES} bomb guard)"
        )
    return zf.read(name)


def epub_text(content: bytes) -> str:
    """Spine-ordered chapter text of an EPUB payload (OCF §3.5: the
    container points at the OPF package; the package's spine orders the
    manifest's XHTML items). Chapters join with form-feed."""
    zf = zipfile.ZipFile(io.BytesIO(content))
    names = set(zf.namelist())
    if "META-INF/encryption.xml" in names:
        raise NotImplementedError("DRM-protected EPUB not supported")
    container = ElementTree.fromstring(_zip_read(zf, "META-INF/container.xml"))
    ns = {"c": "urn:oasis:names:tc:opendocument:xmlns:container"}
    rootfile = container.find(".//c:rootfile", ns)
    if rootfile is None:
        raise ValueError("EPUB container has no rootfile")
    opf_path = rootfile.get("full-path")
    opf = ElementTree.fromstring(_zip_read(zf, opf_path))
    opf_ns = {"o": "http://www.idpf.org/2007/opf"}
    base = opf_path.rsplit("/", 1)[0] + "/" if "/" in opf_path else ""
    hrefs = {
        item.get("id"): item.get("href")
        for item in opf.findall(".//o:manifest/o:item", opf_ns)
    }
    chapters = []
    for itemref in opf.findall(".//o:spine/o:itemref", opf_ns):
        href = hrefs.get(itemref.get("idref"))
        if href is None:
            continue
        path = base + href
        if path not in names:
            continue
        html = _zip_read(zf, path).decode("utf-8", errors="replace")
        chapters.append(py_html_to_text(html))
    return "\f".join(chapters)


_W_NS = (
    "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
)


def docx_text(content: bytes) -> str:
    """Paragraph text of a DOCX payload: ``w:t`` runs concatenated,
    ``w:tab`` → tab, ``w:br``/``w:cr`` → newline, one newline per
    ``w:p`` (ECMA-376 Part 1 §17.3)."""
    zf = zipfile.ZipFile(io.BytesIO(content))
    xml = _zip_read(zf, "word/document.xml")
    root = ElementTree.fromstring(xml)
    paras = []
    for p in root.iter(_W_NS + "p"):
        parts = []
        for node in p.iter():
            tag = node.tag
            if tag == _W_NS + "t":
                parts.append(node.text or "")
            elif tag == _W_NS + "tab":
                parts.append("\t")
            elif tag in (_W_NS + "br", _W_NS + "cr"):
                parts.append("\n")
        paras.append("".join(parts))
    return "\n".join(paras)


_RTF_CW = re.compile(rb"([a-zA-Z]+)(-?\d+)? ?")

_RTF_DEST_SKIP = {
    "fonttbl", "colortbl", "stylesheet", "info", "pict", "object",
    "header", "footer", "headerl", "headerr", "footerl", "footerr",
    "themedata", "xmlnstbl", "listtable", "listoverridetable",
    "generator", "filetbl", "revtbl",
}


def rtf_text(content: bytes) -> str:
    """Plain text of an RTF payload (Word 97-2003 RTF spec): control
    words with optional numeric parameters, group nesting, ``\\par`` /
    ``\\line`` → newline, ``\\tab`` → tab, ``\\'hh`` cp1252 escapes,
    ``\\uN`` Unicode with the ``\\uc`` skip-count protocol, ``{\\*``
    and table/style/info destinations skipped."""
    if not content.startswith(b"{\\rtf"):
        raise ValueError("not an RTF payload (missing {\\rtf)")
    out: list[str] = []
    pos = 0
    n = len(content)
    # group state stack: (skipping?, uc skip count)
    stack: list[tuple[bool, int]] = []
    skipping = False
    uc = 1
    pending_uc_skip = 0
    while pos < n:
        c = content[pos]
        if c == 0x7B:  # {
            stack.append((skipping, uc))
            pos += 1
            # {\* ...} = optional destination: skip unless known
            if content[pos : pos + 2] == b"\\*":
                skipping = True
                pos += 2
        elif c == 0x7D:  # }
            if stack:
                skipping, uc = stack.pop()
            pos += 1
        elif c == 0x5C:  # backslash
            pos += 1
            if pos >= n:
                break
            e = content[pos]
            if e == 0x27:  # \'hh
                byte = int(content[pos + 1 : pos + 3], 16)
                pos += 3
                if pending_uc_skip:
                    pending_uc_skip -= 1
                elif not skipping:
                    out.append(bytes([byte]).decode("cp1252", "replace"))
            elif 0x41 <= e <= 0x5A or 0x61 <= e <= 0x7A:
                m = _RTF_CW.match(content, pos)
                param = int(m.group(2)) if m.group(2) else None
                pos = m.end()
                w = m.group(1).decode("ascii")
                if w in _RTF_DEST_SKIP:
                    skipping = True
                elif w == "uc":
                    uc = param if param is not None else 1
                elif w == "u" and param is not None:
                    if not skipping:
                        out.append(chr(param & 0xFFFF))
                    pending_uc_skip = uc
                elif not skipping:
                    if w in ("par", "line"):
                        out.append("\n")
                    elif w == "tab":
                        out.append("\t")
            else:
                # control symbol: \{ \} \\ literal; \~ nbsp; \- ignored
                if not skipping:
                    if e in b"{}\\":
                        out.append(chr(e))
                    elif e == 0x7E:
                        out.append(" ")
                pos += 1
        elif c in b"\r\n":
            pos += 1
        else:
            if pending_uc_skip:
                pending_uc_skip -= 1
            elif not skipping:
                out.append(chr(c) if c < 0x80 else
                           bytes([c]).decode("cp1252", "replace"))
            pos += 1
    text = "".join(out).strip()
    if any(0xD800 <= ord(ch) < 0xE000 for ch in text):
        # Word encodes non-BMP chars as \uN surrogate PAIRS: combine
        # them; replace lone surrogates (Arrow strings reject both)
        text = text.encode("utf-16", "surrogatepass").decode(
            "utf-16", "replace"
        )
    return text


_ODT_NS = "{urn:oasis:names:tc:opendocument:xmlns:text:1.0}"


def odt_text(content: bytes) -> str:
    """Paragraph text of an OpenDocument Text payload
    (``content.xml``): ``text:p``/``text:h`` → one line each,
    ``text:tab`` → tab, ``text:line-break`` → newline, ``text:s`` →
    ``text:c`` spaces (ODF 1.2 §6.1)."""
    zf = zipfile.ZipFile(io.BytesIO(content))
    root = ElementTree.fromstring(_zip_read(zf, "content.xml"))

    def _para(el, depth: int = 0) -> str:
        # recursive: LibreOffice wraps every styled run in text:span
        # (and links in text:a) — direct-children-only walks lose most
        # of the body text. Depth-capped: hostile crawl payloads nest
        # spans thousands deep to trip RecursionError.
        if depth > 128:
            raise ValueError("ODT span nesting exceeds depth 128")
        parts = [el.text or ""]
        for child in el:
            tag = child.tag
            if tag == _ODT_NS + "tab":
                parts.append("\t")
            elif tag == _ODT_NS + "line-break":
                parts.append("\n")
            elif tag == _ODT_NS + "s":
                parts.append(" " * int(child.get(_ODT_NS + "c", "1")))
            else:
                parts.append(_para(child, depth + 1))
            parts.append(child.tail or "")
        return "".join(parts)

    lines = []
    for p in root.iter():
        if p.tag in (_ODT_NS + "p", _ODT_NS + "h"):
            lines.append(_para(p))
    return "\n".join(lines)


def sniff_document_format(content: bytes) -> str | None:
    """'pdf' | 'epub' | 'docx' | 'odt' | 'rtf' | 'zip' | None from the
    payload bytes (zip flavors by member names, per their specs'
    media-type rules)."""
    if content.lstrip()[:5].startswith(b"%PDF-"):
        return "pdf"
    if content.startswith(b"{\\rtf"):
        return "rtf"
    if content[:2] == b"PK":
        try:
            names = set(
                zipfile.ZipFile(io.BytesIO(content)).namelist()
            )
        except zipfile.BadZipFile:
            return None
        if "META-INF/container.xml" in names:
            return "epub"
        if "word/document.xml" in names:
            return "docx"
        if "content.xml" in names:
            # ODF's rule: the 'mimetype' first member names the flavor —
            # only text documents are odt (ods/odp/odg mislabeled as odt
            # would run the text reader over spreadsheets/slides)
            if "mimetype" in names:
                try:
                    mt = zipfile.ZipFile(io.BytesIO(content)).read(
                        "mimetype"
                    ).decode("ascii", "replace").strip()
                except (zipfile.BadZipFile, KeyError):
                    mt = ""
                flavor = {
                    "application/vnd.oasis.opendocument.text": "odt",
                    "application/vnd.oasis.opendocument.spreadsheet": "ods",
                    "application/vnd.oasis.opendocument.presentation": "odp",
                    "application/vnd.oasis.opendocument.graphics": "odg",
                }.get(mt)
                if flavor:
                    return flavor
            return "odt"
        return "zip"
    return None


def document_text(
    content: bytes, fmt: str | None = None
) -> tuple[str, str]:
    """(format, text) for one payload; raises on unknown formats and at
    each reader's documented boundaries. ``fmt`` skips the sniff when
    the caller already ran it (the Arrow leg)."""
    if fmt is None:
        fmt = sniff_document_format(content)
    if fmt == "pdf":
        return "pdf", pdf_text(content)
    if fmt == "epub":
        return "epub", epub_text(content)
    if fmt == "docx":
        return "docx", docx_text(content)
    if fmt == "odt":
        return "odt", odt_text(content)
    if fmt == "rtf":
        return "rtf", rtf_text(content)
    raise ValueError(f"not a supported document format ({fmt})")


DOC_TEXT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("format", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("n_chars", T.IntegerType()),
        T.StructField("error", T.StringType()),
    ]
)


def extract_document_texts(df: DataFrame) -> DataFrame:
    """(doc_id, format, text, n_chars, error) via one Arrow
    ``mapInPandas`` pass over (doc_id, content) — the document dual of
    ``multimodal.extract_image_features``. A payload that fails its
    reader (corrupt structure, encryption, an unsupported filter) comes
    back with ``text=NULL`` and the raise message in ``error`` — the
    row survives, the job never aborts."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # columnar accumulation (r13): one list per output column, the
        # warc.py exploder idiom — same rows, same schema
        col_names = [f.name for f in DOC_TEXT_SCHEMA.fields]
        for pdf in batches:
            fmts, texts, lens, errs = [], [], [], []
            for content in pdf["content"]:
                blob = bytes(content) if content is not None else b""
                fmt = sniff_document_format(blob)
                text = None
                err = None
                try:
                    fmt, text = document_text(blob, fmt)
                except Exception as exc:  # noqa: BLE001
                    # Per-row error contract: ANY reader failure becomes an
                    # error row, never a task abort. Crawl payloads raise
                    # well beyond the obvious types — RuntimeError from
                    # encrypted zip members, RecursionError from
                    # self-referential structures, TypeError from malformed
                    # value types — so catch broadly here at the boundary.
                    err = f"{type(exc).__name__}: {exc}"[:500]
                fmts.append(fmt)
                texts.append(text)
                lens.append(len(text) if text is not None else None)
                errs.append(err)
            yield pd.DataFrame(
                {
                    # .to_numpy(): positional alignment by construction —
                    # mixing an indexed Series with positional lists would
                    # silently row-misalign if a batch ever carried a
                    # non-default index (r13 review note)
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "format": fmts,
                    "text": texts,
                    "n_chars": lens,
                    "error": errs,
                },
                columns=col_names,
            )

    return df.select("doc_id", "content").mapInPandas(
        _extract, schema=DOC_TEXT_SCHEMA
    )


# Crawl-reality composition: for PDFs inside WARC responses, filter
# sources/warc.py records on content-type application/pdf and feed the
# payload column here; HTML records keep their html_to_text leg. Both
# produce the same (doc_id, text) shape the curation facade consumes.


def route_document_texts(
    df: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "content",
) -> DataFrame:
    """Mixed crawl payloads → text, Spark-first: payloads whose first
    bytes carry a binary document magic (``%PDF-``, zip ``PK``,
    ``{\\rtf``) take the Arrow reader pass (:func:`document_text`);
    subtitle payloads (``WEBVTT`` magic, or the SRT counter+timestamp
    opening) take the pure-codegen ``functions.subtitles.subtitle_text``
    column (r12); everything else — the overwhelming majority of a
    crawl — is treated as HTML/markup and decoded through the
    pure-codegen ``functions.html.html_to_text`` column, so the common
    case never leaves the JVM. Output: ``(id, format, text, n_chars,
    error, *passthrough)`` — extraction failures are error ROWS, the
    gate contract of :func:`extract_document_texts`.

    At scale: the magic sniff is one codegen predicate over a 64-byte
    substring (plus a 256-byte probe for the SRT shape — no Python, no
    shuffle); each branch scans its slice once; the union is
    partition-local. Passthrough columns ride every branch, so no
    join-back is needed.
    """
    from pyspark.sql import functions as F

    from sample_dms_kinesis_rds_mariadb_spark.functions.html import (
        html_to_text,
    )
    from sample_dms_kinesis_rds_mariadb_spark.functions.subtitles import (
        subtitle_text,
    )

    keep = [c for c in df.columns if c not in (id_col, content_col)]
    head = F.decode(F.substring(F.col(content_col), 1, 64), "ISO-8859-1")
    is_doc = (
        F.ltrim(head).startswith("%PDF-")
        | head.startswith("PK")
        | head.startswith("{\\rtf")
        # NULL payloads: the startswith predicates evaluate to NULL, which
        # both filter(is_doc) and filter(~is_doc) would drop — a silent row
        # loss. Route NULL to the doc branch so it becomes an error row
        # (None -> b'' -> raise), the extract_document_texts gate contract.
        | F.col(content_col).isNull()
    )
    # subtitles: WEBVTT magic, or the SRT shape AT DOCUMENT START (a
    # counter line then a comma-millisecond timestamp) — anchored to
    # the payload head so HTML that merely QUOTES a cue can't reroute.
    # The probe decodes ISO-8859-1 (total, never throws — the sniffed
    # openings are ASCII); only the routed slice takes the UTF-8 decode
    sub_head = F.decode(F.substring(F.col(content_col), 1, 256), "ISO-8859-1")
    # a UTF-8 BOM (which the WebVTT spec allows before 'WEBVTT')
    # renders as 'ï»¿' through the latin-1 probe — strip it first
    is_vtt = F.ltrim(
        F.regexp_replace(sub_head, "^ï»¿", "")
    ).startswith("WEBVTT")
    # a UTF-8 BOM reads as 'ï»¿' through the latin-1 probe
    is_srt = sub_head.rlike(
        "^(?:ï»¿)?\\s*\\d+\\s*\\r?\\n\\d{2}:\\d{2}:\\d{2},\\d{3}\\s*-->"
    )
    is_sub = (is_vtt | is_srt) & ~is_doc

    # ONE pass for every non-doc payload (r13): the html and subtitle
    # branches used to be separate filters over the input, so an opaque or
    # expensive source was evaluated once per branch (3 scans of the input
    # counting the doc branch — real read amplification at crawl scale).
    # Merged: one filter, per-row `when` picks the subtitle or html text
    # chain; rows and values are identical, the input is now evaluated
    # exactly twice overall (JVM branch + Arrow doc branch). The text is
    # STAGED into a column before n_chars so the lambda-bearing subtitle
    # chain is not re-evaluated for the length (no CSE on lambda trees).
    utf8 = F.decode(F.col(content_col), "UTF-8")
    merged_text = F.when(is_sub, subtitle_text(utf8)).otherwise(
        html_to_text(utf8)
    )
    merged_fmt = (
        F.when(is_vtt & is_sub, F.lit("vtt"))
        .when(is_sub, F.lit("srt"))
        .otherwise(F.lit("html"))
    )
    html_rows = (
        df.filter(~is_doc)
        .select(
            F.col(id_col),
            merged_fmt.alias("format"),
            merged_text.alias("text"),
            *keep,
        )
        .select(
            F.col(id_col),
            "format",
            "text",
            F.length("text").cast("int").alias("n_chars"),
            F.lit(None).cast("string").alias("error"),
            *keep,
        )
    )

    out_fields = [
        df.schema[id_col],
        T.StructField("format", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("n_chars", T.IntegerType()),
        T.StructField("error", T.StringType()),
    ] + [df.schema[c] for c in keep]
    out_schema = T.StructType(out_fields)

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # columnar accumulation (r13): one list per output column instead
        # of one dict per row — the warc.py exploder idiom; same rows,
        # same schema, skips per-row dict allocation and pandas' row-wise
        # normalization
        col_names = [f.name for f in out_fields]
        for pdf in batches:
            fmts, texts, lens, errs = [], [], [], []
            for content in pdf[content_col]:
                blob = bytes(content) if content is not None else b""
                fmt = sniff_document_format(blob)
                text = None
                err = None
                try:
                    fmt, text = document_text(blob, fmt)
                except Exception as exc:  # noqa: BLE001 — per-row contract
                    err = f"{type(exc).__name__}: {exc}"[:500]
                fmts.append(fmt)
                texts.append(text)
                lens.append(len(text) if text is not None else None)
                errs.append(err)
            cols = {
                # .to_numpy(): positional alignment with the list columns
                # by construction (r13 review note)
                id_col: pdf[id_col].to_numpy(),
                "format": fmts,
                "text": texts,
                "n_chars": lens,
                "error": errs,
            }
            for k in keep:
                cols[k] = pdf[k].to_numpy()
            yield pd.DataFrame(cols, columns=col_names)

    doc_rows = df.filter(is_doc).select(
        id_col, content_col, *keep
    ).mapInPandas(_extract, schema=out_schema)

    return html_rows.unionByName(doc_rows)
