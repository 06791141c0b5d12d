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


#: feed size for the multi-member gzip walk. Handing zlib the whole
#: remaining file per member makes it materialize the tail twice per
#: member (the input slice + ``unused_data``) — O(members x filesize)
#: memcpy, which at Common Crawl shapes (1 GB files, ~100k members)
#: dwarfs the inflate itself. Bounded feeding caps the per-member copy
#: at one chunk; members larger than a chunk just keep streaming.
_GZ_CHUNK = 1 << 16


def _gunzip_members(blob: bytes) -> bytes:
    """Decompress ALL members of a multi-member gzip stream (zlib stops
    at member boundaries; the loop walks them, fed in bounded chunks so
    the per-member input/tail copies are O(chunk), not O(remaining))."""
    out = bytearray()
    mv = memoryview(blob)
    n = len(blob)
    pos = 0
    while pos < n:
        d = zlib.decompressobj(wbits=31)
        start = pos
        try:
            while True:
                end = min(pos + _GZ_CHUNK, n)
                out += d.decompress(mv[pos:end])
                pos = end - len(d.unused_data)
                if d.eof or end == n:
                    out += d.flush()
                    break
        except zlib.error as exc:
            raise ValueError(
                f"WARC: corrupt gzip member at offset {start}: {exc}"
            ) from exc
        if pos <= start:
            raise ValueError("WARC: gzip member consumed no bytes")
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
    include_body: bool = False,
) -> DataFrame:
    """Explode binary WARC payloads (one file per input row — the
    ``binaryFile`` source shape) into one row per record of the selected
    WARC types, with HTTP response bodies charset-decoded into ``html``
    ready for :func:`functions.html.html_to_text`. Arrow-batched
    ``mapInPandas``: partition-parallel, nothing collected.

    ``file_id`` keeps the INPUT column's type — a long for synthetic ids,
    a string when the id is the ``binaryFile`` source's ``path`` column
    (the production shape). ``include_body=True`` appends the RAW
    response-body bytes as a ``body`` BINARY column — the feed for
    non-HTML payloads (e.g. application/pdf →
    ``sources/docformats.extract_document_texts``), which the charset
    decode into ``html`` would mangle."""
    fields = WARC_RECORDS_SCHEMA.fields[1:]
    if include_body:
        fields = fields + [T.StructField("body", T.BinaryType())]
    schema = T.StructType(
        [T.StructField(id_col, df.schema[id_col].dataType, False)]
        + fields
    )

    def _explode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # columnar accumulation (r13): one list per OUTPUT COLUMN instead
        # of one dict per record — pd.DataFrame from a dict of lists skips
        # the per-row dict allocation and pandas' row-wise dict
        # normalization (the parse pass's dominant non-zlib cost at ~2.4k
        # records per input file). Same rows, same schema.
        col_names = [f.name for f in schema.fields]
        for pdf in batches:
            cols: dict[str, list] = {name: [] for name in col_names}
            ap = {name: cols[name].append for name in col_names}
            for fid, blob in zip(pdf[id_col], pdf[content_col]):
                data = bytes(blob) if blob is not None else b""
                for i, rec in enumerate(iter_warc_records(data)):
                    h = rec["headers"]
                    if types and h.get("warc-type") not in types:
                        continue
                    http_headers = rec.get("http_headers") or {}
                    ctype = http_headers.get("content-type")
                    body = rec.get("body")
                    ap[id_col](fid)
                    ap["record_no"](i)
                    ap["warc_type"](h.get("warc-type"))
                    ap["record_id"](h.get("warc-record-id"))
                    ap["target_uri"](h.get("warc-target-uri"))
                    ap["warc_date"](h.get("warc-date"))
                    ap["http_status"](rec.get("http_status"))
                    ap["http_content_type"](ctype)
                    ap["content_length"](len(rec["payload"]))
                    ap["html"](
                        decode_body(body, ctype) if body is not None else None
                    )
                    if include_body:
                        ap["body"](body)
            yield pd.DataFrame(cols, columns=col_names)

    return df.select(id_col, content_col).mapInPandas(_explode, schema=schema)


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


def build_response_record(
    html: str,
    uri: str,
    rec_id: str,
    date: str = "2026-01-01T00:00:00Z",
    status: int = 200,
    content_type: str = "text/html; charset=utf-8",
) -> bytes:
    """Serialize one WARC ``response`` record (version line, named
    fields, CRLF CRLF, HTTP message payload, CRLF CRLF) — the writer
    counterpart of :func:`iter_warc_records`, used by the bench fixture
    and examples. The parity TESTS deliberately do not use this: they
    keep their own spec-derived serializer so reader and writer stay
    independent evidence."""
    body = html.encode("utf-8")
    http = (
        f"HTTP/1.1 {status} OK\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode("latin-1") + body
    head = (
        b"WARC/1.0\r\n"
        + b"WARC-Type: response\r\n"
        + f"WARC-Record-ID: {rec_id}\r\n".encode("latin-1")
        + f"WARC-Date: {date}\r\n".encode("latin-1")
        + f"WARC-Target-URI: {uri}\r\n".encode("latin-1")
        + f"Content-Length: {len(http)}\r\n".encode("latin-1")
    )
    return head + b"\r\n" + http + b"\r\n\r\n"


def synthesize_warc_corpus(
    out_dir: str,
    total_mb: float,
    n_files: int = 32,
    pool_size: int = 64,
    seed: int = 8,
) -> dict:
    """Deterministic multi-member-gzip WARC corpus for throughput
    measurement (bench leg, VERDICT r7 item 5): ``pool_size`` distinct
    ~4 KB HTML response records are serialized + gzipped ONCE, then the
    compressed members are tiled across ``n_files`` files until
    ``total_mb`` compressed bytes — synthesis cost is byte concatenation,
    so a 100 MB corpus builds in well under a second and the measured
    leg is decode/extract/gate work, not fixture work.

    Returns ``{"files": n, "records": n, "bytes": compressed_total}``.
    """
    import os
    import random

    rng = random.Random(seed)
    words = (
        "the quick brown fox jumps over lazy dog data table query scan "
        "join filter group sort window stream merge spark record archive "
        "crawl corpus token model train sample page content body text"
    ).split()

    members = []
    for i in range(pool_size):
        paras = "".join(
            "<p>" + " ".join(rng.choice(words) for _ in range(60)) + ".</p>"
            for _ in range(10)
        )
        html = (
            "<!DOCTYPE html><html><head><title>Synth page "
            f"{i}</title><style>p {{margin: 0}}</style>"
            "<script>var hidden = 1;</script></head><body>"
            f"<h1>Synthetic document {i}</h1>{paras}"
            f'<a href="https://synth.example/{i}/next">next</a>'
            "</body></html>"
        )
        rec = build_response_record(
            html,
            uri=f"https://synth.example/{i}",
            rec_id=f"<urn:uuid:synth-{i:04d}>",
        )
        buf = io.BytesIO()
        with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
            gz.write(rec)
        members.append(buf.getvalue())

    os.makedirs(out_dir, exist_ok=True)
    per_file = int(total_mb * 1024 * 1024 / n_files)
    n_records = 0
    n_bytes = 0
    for f_idx in range(n_files):
        chunks, size = [], 0
        m_idx = f_idx  # stagger so files differ
        while size < per_file:
            chunks.append(members[m_idx % pool_size])
            size += len(chunks[-1])
            m_idx += 1
            n_records += 1
        blob = b"".join(chunks)
        n_bytes += len(blob)
        with open(os.path.join(out_dir, f"synth-{f_idx:04d}.warc.gz"), "wb") as f:
            f.write(blob)
    return {"files": n_files, "records": n_records, "bytes": n_bytes}
