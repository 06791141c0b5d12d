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
  §17.3). Password-protected OLE containers are not zips and raise.

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
import zipfile
from typing import Iterator
from xml.etree import ElementTree

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from sample_dms_kinesis_rds_mariadb_spark.functions.html import (
    py_html_to_text,
)
from sample_dms_kinesis_rds_mariadb_spark.sources.pdf import pdf_text


def epub_text(content: bytes) -> str:
    """Spine-ordered chapter text of an EPUB payload (OCF §3.5: the
    container points at the OPF package; the package's spine orders the
    manifest's XHTML items). Chapters join with form-feed."""
    zf = zipfile.ZipFile(io.BytesIO(content))
    names = set(zf.namelist())
    if "META-INF/encryption.xml" in names:
        raise NotImplementedError("DRM-protected EPUB not supported")
    container = ElementTree.fromstring(zf.read("META-INF/container.xml"))
    ns = {"c": "urn:oasis:names:tc:opendocument:xmlns:container"}
    rootfile = container.find(".//c:rootfile", ns)
    if rootfile is None:
        raise ValueError("EPUB container has no rootfile")
    opf_path = rootfile.get("full-path")
    opf = ElementTree.fromstring(zf.read(opf_path))
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
        html = zf.read(path).decode("utf-8", errors="replace")
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
    xml = zf.read("word/document.xml")
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


def sniff_document_format(content: bytes) -> str | None:
    """'pdf' | 'epub' | 'docx' | 'zip' | None from the payload bytes
    (zip flavors by member names, per their specs' media-type rules)."""
    if content.lstrip()[:5].startswith(b"%PDF-"):
        return "pdf"
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
        return "zip"
    return None


def document_text(content: bytes) -> tuple[str, str]:
    """(format, text) for one payload; raises on unknown formats and at
    each reader's documented boundaries."""
    fmt = sniff_document_format(content)
    if fmt == "pdf":
        return "pdf", pdf_text(content)
    if fmt == "epub":
        return "epub", epub_text(content)
    if fmt == "docx":
        return "docx", docx_text(content)
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
        for pdf in batches:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                blob = bytes(content) if content is not None else b""
                fmt = sniff_document_format(blob)
                text = None
                err = None
                try:
                    fmt, text = document_text(blob)
                except (ValueError, NotImplementedError, KeyError,
                        ElementTree.ParseError, zipfile.BadZipFile,
                        IndexError) as exc:
                    err = f"{type(exc).__name__}: {exc}"[:500]
                rows.append(
                    {
                        "doc_id": doc_id,
                        "format": fmt,
                        "text": text,
                        "n_chars": len(text) if text is not None else None,
                        "error": err,
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in DOC_TEXT_SCHEMA.fields]
            )

    return df.select("doc_id", "content").mapInPandas(
        _extract, schema=DOC_TEXT_SCHEMA
    )


# Crawl-reality composition: for PDFs inside WARC responses, filter
# sources/warc.py records on content-type application/pdf and feed the
# payload column here; HTML records keep their html_to_text leg. Both
# produce the same (doc_id, text) shape the curation facade consumes.
