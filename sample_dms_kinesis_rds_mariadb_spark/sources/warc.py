"""WARC (Web ARChive, ISO 28500) ingestion — the container Common Crawl
and every other web archive ships, and therefore the front door of a
crawl-based training-data pipeline: WARC → records → HTTP bodies →
``functions/html.py::html_to_text`` → the documents table every other
operator in this engine consumes.

Format (spec-derived, no warcio dependency): a WARC file is a sequence
of records — ``WARC/1.x`` version line, CRLF-terminated named headers,
empty line, ``Content-Length`` payload bytes, two CRLFs. Common Crawl
stores each record as its OWN GZIP MEMBER concatenated into one ``.gz``
file (so readers can seek); :func:`iter_warc_records` handles plain
bytes and multi-member gzip alike. ``response`` records carry an HTTP
message as payload: status line, headers, blank line, body — split here,
with charset sniffed from the Content-Type header (fallback utf-8 with
replacement, the crawl-pipeline convention).

Scale shape: WARC payloads arrive as binary columns (e.g. via Spark's
``binaryFile`` source — one file per row) and explode into record rows
through Arrow-batched ``mapInPandas`` (:func:`warc_records`) —
partition-parallel, payloads never collected; the text column feeds the
pure-codegen HTML extraction and every downstream gate. Verified in
``tests/test_warc.py`` against an INDEPENDENT spec-derived writer,
including multi-member gzip and header edge cases.
"""

from __future__ import annotations

import gzip
import io
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def _gunzip_members(blob: bytes) -> bytes:
    """Decompress ALL members of a multi-member gzip stream (zlib stops
    at member boundaries; the loop walks them)."""
    out = bytearray()
    pos = 0
    while pos < len(blob):
        d = zlib.decompressobj(wbits=31)
        try:
            out += d.decompress(blob[pos:])
            out += d.flush()
        except zlib.error as exc:
            raise ValueError(
                f"WARC: corrupt gzip member at offset {pos}: {exc}"
            ) from exc
        consumed = len(blob) - pos - len(d.unused_data)
        if consumed <= 0:
            raise ValueError("WARC: gzip member consumed no bytes")
        pos += consumed
    return bytes(out)


def _parse_headers(block: bytes) -> dict[str, str]:
    """Named-field block → dict with LOWERCASED keys (field names are
    case-insensitive in both WARC and HTTP)."""
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n"):
        if not line:
            continue
        if b":" not in line:
            continue  # tolerate stray lines (observed in the wild)
        k, v = line.split(b":", 1)
        headers[k.strip().decode("latin-1").lower()] = v.strip().decode(
            "latin-1"
        )
    return headers


def split_http_payload(payload: bytes) -> tuple[int | None, dict, bytes]:
    """(status_code, headers, body) from an HTTP message payload; a
    payload without an HTTP status line returns (None, {}, payload)."""
    if not payload.startswith(b"HTTP/"):
        return None, {}, payload
    head, sep, body = payload.partition(b"\r\n\r\n")
    if not sep:
        head, sep, body = payload.partition(b"\n\n")
    line, _, rest = head.partition(b"\r\n")
    parts = line.split(b" ")
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        return None, {}, payload
    return status, _parse_headers(rest), body


def decode_body(body: bytes, content_type: str | None) -> str:
    """Charset-sniffed text decode: explicit ``charset=`` wins, then
    utf-8, with replacement — the standard crawl-pipeline fallback."""
    charset = None
    if content_type and "charset=" in content_type.lower():
        charset = (
            content_type.lower().split("charset=", 1)[1].split(";")[0].strip()
        )
    for enc in filter(None, (charset, "utf-8")):
        try:
            return body.decode(enc)
        except (UnicodeDecodeError, LookupError):
            continue
    return body.decode("utf-8", errors="replace")


def iter_warc_records(blob: bytes) -> Iterator[dict]:
    """Parse a WARC file's records. Yields dicts with the WARC headers
    (lowercased keys), ``payload`` bytes, and for HTTP response records
    ``http_status`` / ``http_headers`` / ``body``."""
    if blob[:2] == b"\x1f\x8b":
        blob = _gunzip_members(blob)
    pos = 0
    n = len(blob)
    while pos < n:
        # tolerate extra CRLFs between records
        while pos < n and blob[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        if not blob[pos : pos + 5] == b"WARC/":
            raise ValueError(f"WARC: expected version line at offset {pos}")
        head_end = blob.find(b"\r\n\r\n", pos)
        if head_end < 0:
            raise ValueError("WARC: truncated record header")
        version_line, _, header_block = blob[pos:head_end].partition(b"\r\n")
        headers = _parse_headers(header_block)
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError) as exc:
            raise ValueError("WARC: record missing Content-Length") from exc
        body_start = head_end + 4
        if body_start + length > n:
            raise ValueError("WARC: record payload truncated")
        payload = blob[body_start : body_start + length]
        rec = {
            "version": version_line.decode("latin-1"),
            "headers": headers,
            "payload": payload,
        }
        if headers.get("warc-type") == "response":
            status, http_headers, body = split_http_payload(payload)
            rec["http_status"] = status
            rec["http_headers"] = http_headers
            rec["body"] = body
        yield rec
        pos = body_start + length


WARC_RECORDS_SCHEMA = T.StructType(
    [
        T.StructField("file_id", T.LongType(), False),
        T.StructField("record_no", T.IntegerType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("http_content_type", T.StringType()),
        T.StructField("content_length", T.LongType()),
        T.StructField("html", T.StringType()),  # decoded response body
    ]
)


def warc_records(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "file_id",
    types: tuple[str, ...] = ("response",),
) -> DataFrame:
    """Explode binary WARC payloads (one file per input row — the
    ``binaryFile`` source shape) into one row per record of the selected
    WARC types, with HTTP response bodies charset-decoded into ``html``
    ready for :func:`functions.html.html_to_text`. Arrow-batched
    ``mapInPandas``: partition-parallel, nothing collected."""

    def _explode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fid, blob in zip(pdf[id_col], pdf[content_col]):
                data = bytes(blob) if blob is not None else b""
                for i, rec in enumerate(iter_warc_records(data)):
                    h = rec["headers"]
                    if types and h.get("warc-type") not in types:
                        continue
                    http_headers = rec.get("http_headers") or {}
                    ctype = http_headers.get("content-type")
                    body = rec.get("body")
                    rows.append(
                        {
                            "file_id": fid,
                            "record_no": i,
                            "warc_type": h.get("warc-type"),
                            "record_id": h.get("warc-record-id"),
                            "target_uri": h.get("warc-target-uri"),
                            "warc_date": h.get("warc-date"),
                            "http_status": rec.get("http_status"),
                            "http_content_type": ctype,
                            "content_length": len(rec["payload"]),
                            "html": (
                                decode_body(body, ctype)
                                if body is not None
                                else None
                            ),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_RECORDS_SCHEMA.fields]
            )

    return df.select(id_col, content_col).mapInPandas(
        _explode, schema=WARC_RECORDS_SCHEMA
    )


def write_warc_gz_members(records: list[bytes]) -> bytes:
    """Compress each serialized record as its own gzip member (the
    Common Crawl layout) — utility for tests and round-trip fixtures."""
    out = bytearray()
    for rec in records:
        buf = io.BytesIO()
        with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
            gz.write(rec)
        out += buf.getvalue()
    return bytes(out)
