"""Spec-derived PDF text extraction (ISO 32000-1) — pure Python +
stdlib zlib, no PDF library.

Why it exists: a large-scale training-data pipeline's crawl intake is
not just HTML — PDFs are the next-largest text carrier, and the repo's
front door (WARC → html_to_text → curate) had no way to read them. This
module gives the same honest-decode treatment the media formats got
(operators/jpeg.py, operators/flac.py, operators/mp3_layer3.py): the
container and content-stream layers parse FOR REAL, with precise raise
boundaries instead of silent garbage.

What parses for real:

- object syntax: dictionaries, arrays, names (with ``#xx`` escapes),
  literal strings (all escape forms incl. octal and line continuation),
  hex strings, numerics, booleans/null, indirect references;
- cross-reference: CLASSIC xref tables and XREF STREAMS (/W field
  widths, /Index subsections, /Prev chains, PNG predictors 10-15 on the
  stream rows), plus OBJECT STREAMS (/Type /ObjStm) for compressed
  objects — i.e. both pre- and post-PDF-1.5 file layouts;
- stream filters: FlateDecode (with /DecodeParms PNG predictors),
  ASCIIHexDecode, ASCII85Decode, RunLengthDecode, LZWDecode
  (EarlyChange=1 — the TIFF-flavor decoder from ``operators/tiff.py``
  is the same code variant) and filter chains;
- the page tree (/Root → /Pages → /Kids, inherited /Resources), page
  /Contents (single stream or array), and Form XObjects — the ``Do``
  operator splices a form's own text in (with its own /Resources,
  recursion depth-capped), where real-world generators routinely put
  body text;
- the text layer: BT/ET blocks, Tj / TJ / ' / " show operators, the
  Td/TD/T*/TL/Tm positioning family (newline on a vertical move — the
  deterministic layout heuristic, documented below), TJ kern
  adjustments re-expanded to spaces past ``-SPACE_KERN`` thousandths of
  an em, /ToUnicode CMaps (bfchar + bfrange, 1- and 2-byte codes) for
  Type0/CID text.

Encryption (§7.6.3, via ``sources/pdf_crypto.py``): the standard
security handler with the EMPTY user password — RC4 40/128 (V1/V2/V4
/V2 filters), AES-128-CBC (/AESV2), AES-256-CBC (V5 R5/R6) — covers
owner-locked-but-readable documents, the common crawl shape.

HONEST BOUNDARIES (raise, never garble):

- encrypted documents that genuinely REQUIRE a password (non-empty
  user password, non-Standard handlers, unknown crypt filters) raise
  ``NotImplementedError`` naming the reason;
- stream filters outside {Flate, ASCIIHex, ASCII85, RunLength, LZW}
  (DCT, JBIG2, CCITT… are image filters and never carry text) raise
  naming the filter;
- simple fonts WITHOUT /ToUnicode decode their string bytes as
  Latin-1 — exact for the ASCII range of the Standard/WinAnsi
  encodings, deterministic (never wrong-but-plausible Unicode) beyond
  it. This is a documented lossy fallback, not a boundary raise,
  because it is what every crawl-scale extractor does.

Layout heuristics are deliberately minimal and DETERMINISTIC (an
independent implementation can replay them — the oracle property the
repo's decoders keep): vertical moves emit exactly one ``\\n``, TJ
kerns below ``-SPACE_KERN`` emit exactly one space, pages join with
``\\f``. No font-metric spacing model.

At scale: extraction runs per-row inside Arrow ``mapInPandas``
(``sources/docformats.py``) — bounded work per payload, nothing
collected, the binary column never shuffles.
"""

from __future__ import annotations

import re
import zlib
from dataclasses import dataclass

SPACE_KERN = 180.0  # TJ adjustment (thousandths of em) that reads as a space

# decompression-bomb guard: no single PDF stream may inflate past this
# (a crafted 1 KB Flate stream can expand ~1000:1 per pass; one payload
# must never OOM an executor — it becomes that row's error instead)
MAX_STREAM_BYTES = 64 * 1024 * 1024

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class PdfError(ValueError):
    """Malformed PDF structure (syntax, xref, stream framing)."""


@dataclass(frozen=True)
class Ref:
    num: int
    gen: int


class Stream:
    __slots__ = ("dict", "raw")

    def __init__(self, d: dict, raw: bytes) -> None:
        self.dict = d
        self.raw = raw


# --------------------------------------------------------------------------
# object-syntax lexer/parser (ISO 32000-1 §7.3)
# --------------------------------------------------------------------------


def _skip_ws(data: bytes, pos: int) -> int:
    n = len(data)
    while pos < n:
        c = data[pos]
        if c in _WS:
            pos += 1
        elif c == 0x25:  # % comment to end of line
            while pos < n and data[pos] not in b"\r\n":
                pos += 1
        else:
            break
    return pos


def _parse_name(data: bytes, pos: int) -> tuple[str, int]:
    # pos at '/'
    pos += 1
    out = bytearray()
    n = len(data)
    while pos < n:
        c = data[pos]
        if c in _WS or c in _DELIM:
            break
        if c == 0x23 and pos + 2 < n:  # #xx
            out.append(int(data[pos + 1 : pos + 3], 16))
            pos += 3
        else:
            out.append(c)
            pos += 1
    return out.decode("latin-1"), pos


def _parse_literal_string(data: bytes, pos: int) -> tuple[bytes, int]:
    # pos at '('
    pos += 1
    out = bytearray()
    depth = 1
    n = len(data)
    while pos < n:
        c = data[pos]
        if c == 0x5C:  # backslash
            pos += 1
            if pos >= n:
                break
            e = data[pos]
            if e in b"nrtbf":
                out.append({0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8,
                            0x66: 12}[e])
                pos += 1
            elif e in b"()\\":
                out.append(e)
                pos += 1
            elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                oct_digits = bytearray([e])
                pos += 1
                while (len(oct_digits) < 3 and pos < n
                       and 0x30 <= data[pos] <= 0x37):
                    oct_digits.append(data[pos])
                    pos += 1
                out.append(int(oct_digits, 8) & 0xFF)
            elif e in b"\r\n":  # line continuation
                pos += 1
                if e == 0x0D and pos < n and data[pos] == 0x0A:
                    pos += 1
            else:  # unknown escape: the char stands for itself
                out.append(e)
                pos += 1
        elif c == 0x28:
            depth += 1
            out.append(c)
            pos += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                pos += 1
                return bytes(out), pos
            out.append(c)
            pos += 1
        else:
            out.append(c)
            pos += 1
    raise PdfError("unterminated literal string")


def _parse_hex_string(data: bytes, pos: int) -> tuple[bytes, int]:
    # pos at '<' (single)
    end = data.find(b">", pos)
    if end < 0:
        raise PdfError("unterminated hex string")
    digits = re.sub(rb"[^0-9A-Fa-f]", b"", data[pos + 1 : end])
    if len(digits) % 2:
        digits += b"0"
    return bytes.fromhex(digits.decode("ascii")), end + 1


_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")


def parse_object(data: bytes, pos: int):
    """Parse one PDF object at ``pos`` → (object, next_pos). Indirect
    references come back as :class:`Ref`; streams are handled by the
    document layer (this parses the syntax layer only)."""
    pos = _skip_ws(data, pos)
    if pos >= len(data):
        raise PdfError("unexpected end of data")
    c = data[pos]
    if c == 0x2F:  # /Name
        return _parse_name(data, pos)
    if c == 0x28:  # (string)
        return _parse_literal_string(data, pos)
    if c == 0x3C:  # << dict >> or <hex>
        if data[pos : pos + 2] == b"<<":
            pos += 2
            d = {}
            while True:
                pos = _skip_ws(data, pos)
                if data[pos : pos + 2] == b">>":
                    return d, pos + 2
                if data[pos] != 0x2F:
                    raise PdfError(f"dict key must be a name at {pos}")
                key, pos = _parse_name(data, pos)
                val, pos = parse_object(data, pos)
                d[key] = val
        return _parse_hex_string(data, pos)
    if c == 0x5B:  # [ array ]
        pos += 1
        arr = []
        while True:
            pos = _skip_ws(data, pos)
            if data[pos] == 0x5D:
                return arr, pos + 1
            val, pos = parse_object(data, pos)
            arr.append(val)
    if data[pos : pos + 4] == b"true":
        return True, pos + 4
    if data[pos : pos + 5] == b"false":
        return False, pos + 5
    if data[pos : pos + 4] == b"null":
        return None, pos + 4
    m = _NUM_RE.match(data, pos)
    if m:
        tok = m.group()
        end = m.end()
        # "N G R" → indirect reference
        if b"." not in tok and not tok.startswith((b"+", b"-")):
            look = _skip_ws(data, end)
            m2 = re.match(rb"(\d+)", data[look:look + 16] or b"")
            if m2:
                after = _skip_ws(data, look + m2.end())
                if data[after : after + 1] == b"R" and (
                    after + 1 >= len(data)
                    or data[after + 1] in _WS
                    or data[after + 1] in _DELIM
                ):
                    return Ref(int(tok), int(m2.group(1))), after + 1
        return (float(tok) if b"." in tok else int(tok)), end
    raise PdfError(f"cannot parse object at byte {pos}")


# --------------------------------------------------------------------------
# filters
# --------------------------------------------------------------------------


def _png_unpredict(data: bytes, columns: int, colors: int, bpc: int) -> bytes:
    """Reverse PNG row predictors (the /DecodeParms Predictor >= 10
    family) — the same five filter types the repo's PNG decoder handles,
    specialized to the byte-aligned case xref streams use."""
    bpp = max(1, colors * bpc // 8)
    row_len = columns * bpp
    out = bytearray()
    prev = bytearray(row_len)
    pos = 0
    while pos < len(data):
        ft = data[pos]
        row = bytearray(data[pos + 1 : pos + 1 + row_len])
        if len(row) < row_len:
            raise PdfError("predictor row truncated")
        pos += 1 + row_len
        if ft == 1:  # sub
            for i in range(bpp, row_len):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ft == 2:  # up
            for i in range(row_len):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 3:  # average
            for i in range(row_len):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # paeth
            for i in range(row_len):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                cc = prev[i - bpp] if i >= bpp else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (
                    b if pb <= pc else cc
                )
                row[i] = (row[i] + pred) & 0xFF
        elif ft != 0:
            raise PdfError(f"unknown PNG predictor filter type {ft}")
        out += row
        prev = row
    return bytes(out)


def _lzw_decode_pdf(data: bytes) -> bytes:
    """PDF LZWDecode with the default EarlyChange=1 — code-for-code the
    TIFF-flavor variant (``operators/tiff.py``), run to the EOI marker."""
    from sample_dms_kinesis_rds_mariadb_spark.operators.tiff import (
        _lzw_decode_tiff,
    )

    out = _lzw_decode_tiff(data, MAX_STREAM_BYTES)
    if len(out) >= MAX_STREAM_BYTES:
        raise PdfError(
            f"LZW stream inflates past {MAX_STREAM_BYTES} bytes "
            "(decompression bomb guard)"
        )
    return out


def _ascii85_decode(data: bytes) -> bytes:
    """ASCII85Decode (§7.4.3): 5 chars '!'..'u' → 4 bytes base-85
    big-endian; 'z' → four zero bytes; a partial final group of n chars
    yields n−1 bytes (pad with 'u', truncate); '~>' terminates."""
    end = data.find(b"~>")
    if end >= 0:
        data = data[:end]
    data = re.sub(rb"[\x00\t\n\x0c\r ]", b"", data)
    out = bytearray()
    group: list[int] = []
    for c in data:
        if c == 0x7A:  # 'z'
            if group:
                raise PdfError("ASCII85: z inside a group")
            out += b"\x00\x00\x00\x00"
            continue
        if not 0x21 <= c <= 0x75:
            raise PdfError(f"ASCII85: invalid character {c}")
        group.append(c - 0x21)
        if len(group) == 5:
            v = 0
            for g in group:
                v = v * 85 + g
            if v > 0xFFFFFFFF:
                raise PdfError("ASCII85: group exceeds 32 bits")
            out += v.to_bytes(4, "big")
            group = []
    if group:
        if len(group) == 1:
            raise PdfError("ASCII85: lone trailing character")
        n = len(group)
        v = 0
        for g in group + [84] * (5 - n):
            v = v * 85 + g
        if v > 0xFFFFFFFF:
            raise PdfError("ASCII85: group exceeds 32 bits")
        out += v.to_bytes(4, "big")[: n - 1]
    return bytes(out)


def _runlength_decode(data: bytes) -> bytes:
    """RunLengthDecode (§7.4.5): length byte L — 0..127 copies the next
    L+1 bytes, 129..255 repeats the next byte 257−L times, 128 ends."""
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n:
        length = data[pos]
        pos += 1
        if length == 128:
            break
        if length < 128:
            chunk = data[pos : pos + length + 1]
            if len(chunk) != length + 1:
                raise PdfError("RunLength: literal run truncated")
            out += chunk
            pos += length + 1
        else:
            if pos >= n:
                raise PdfError("RunLength: repeat run truncated")
            out += bytes([data[pos]]) * (257 - length)
            pos += 1
        if len(out) > MAX_STREAM_BYTES:
            raise PdfError(
                f"RunLength stream inflates past {MAX_STREAM_BYTES} bytes "
                "(decompression bomb guard)"
            )
    return bytes(out)


def decode_stream(stream: Stream, resolve) -> bytes:
    """Apply the stream's /Filter chain to its raw bytes. ``resolve``
    maps a Ref to its object (filters/params may be indirect)."""
    data = stream.raw
    filt = resolve(stream.dict.get("Filter"))
    if filt is None:
        return data
    filters = filt if isinstance(filt, list) else [filt]
    parms = resolve(stream.dict.get("DecodeParms"))
    if not isinstance(parms, list):
        parms = [parms] * len(filters)
    for f, p in zip(filters, parms):
        f = resolve(f)
        p = resolve(p) or {}
        if f == "FlateDecode":
            try:
                dobj = zlib.decompressobj()
                data = dobj.decompress(data, MAX_STREAM_BYTES)
                if dobj.unconsumed_tail:
                    raise PdfError(
                        f"Flate stream inflates past {MAX_STREAM_BYTES} "
                        "bytes (decompression bomb guard)"
                    )
            except zlib.error as exc:
                raise PdfError(f"bad Flate stream: {exc}") from exc
        elif f == "ASCIIHexDecode":
            digits = re.sub(rb"[^0-9A-Fa-f>]", b"", data)
            digits = digits.split(b">")[0]
            if len(digits) % 2:
                digits += b"0"
            data = bytes.fromhex(digits.decode("ascii"))
        elif f == "LZWDecode":
            if resolve(p.get("EarlyChange", 1)) != 1:
                raise NotImplementedError(
                    "LZWDecode EarlyChange=0 not supported"
                )
            data = _lzw_decode_pdf(data)
        elif f == "ASCII85Decode":
            data = _ascii85_decode(data)
        elif f == "RunLengthDecode":
            data = _runlength_decode(data)
        else:
            raise NotImplementedError(f"PDF stream filter {f} not supported")
        pred = resolve(p.get("Predictor", 1))
        if pred and pred >= 10:
            data = _png_unpredict(
                data,
                resolve(p.get("Columns", 1)),
                resolve(p.get("Colors", 1)),
                resolve(p.get("BitsPerComponent", 8)),
            )
        elif pred and pred != 1:
            raise NotImplementedError(f"stream Predictor {pred}")
        # Per-stage bomb guard: a chained [/FlateDecode /RunLengthDecode]
        # stream could otherwise legally inflate 64 MiB of Flate output by
        # another 64:1, and stacked filters multiply further. Enforce the
        # cap after EVERY stage (including post-predictor), not only
        # inside the individual decoders.
        if len(data) > MAX_STREAM_BYTES:
            raise PdfError(
                f"stream filter chain inflates past {MAX_STREAM_BYTES} "
                "bytes (decompression bomb guard)"
            )
    return data


# --------------------------------------------------------------------------
# ToUnicode CMaps (§9.10.3)
# --------------------------------------------------------------------------


def parse_tounicode(cmap_bytes: bytes) -> tuple[dict[int, str], int]:
    """(code → text, code byte length) from a ToUnicode CMap: bfchar and
    bfrange sections; the code length comes from the codespacerange (1
    or 2 bytes — the lengths Type0/simple fonts emit)."""
    text = cmap_bytes.decode("latin-1", errors="replace")
    nbytes = 1
    m = re.search(
        r"begincodespacerange\s*<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>",
        text,
    )
    if m:
        nbytes = max(1, len(m.group(1)) // 2)
    out: dict[int, str] = {}

    def _uni(hexs: str) -> str:
        raw = bytes.fromhex(hexs)
        return raw.decode("utf-16-be", errors="replace")

    for sec in re.findall(
        r"beginbfchar(.*?)endbfchar", text, flags=re.S
    ):
        for src, dst in re.findall(
            r"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>", sec
        ):
            out[int(src, 16)] = _uni(dst)
    for sec in re.findall(
        r"beginbfrange(.*?)endbfrange", text, flags=re.S
    ):
        # <lo> <hi> <dst>  |  <lo> <hi> [<d1> <d2> ...]
        for lo, hi, body in re.findall(
            r"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*"
            r"(\[[^\]]*\]|<[0-9A-Fa-f]+>)",
            sec,
        ):
            lo_i, hi_i = int(lo, 16), int(hi, 16)
            if body.startswith("["):
                dsts = re.findall(r"<([0-9A-Fa-f]+)>", body)
                for i, d in enumerate(dsts):
                    if lo_i + i <= hi_i:
                        out[lo_i + i] = _uni(d)
            else:
                base = body.strip("<>")
                raw = bytes.fromhex(base)
                # increment the LAST code unit, per spec
                head, last = raw[:-2], int.from_bytes(raw[-2:], "big")
                for i in range(hi_i - lo_i + 1):
                    out[lo_i + i] = (
                        head + (last + i & 0xFFFF).to_bytes(2, "big")
                    ).decode("utf-16-be", errors="replace")
    return out, nbytes


# Adobe's predefined CJK CMaps (ISO 32000-1 §9.7.5.2, the public CMap
# registry for Adobe-GB1/CNS1/Japan1/Korea1/KR): the -H/-V suffix is
# writing mode only; what matters for TEXT is the code space. Two
# classes, both decodable deterministically and CORRECTLY:
#  * Uni<R>-UCS2 / Uni<R>-UTF16 CMaps map UNICODE code values to CIDs —
#    the show-string bytes ARE UTF-16BE text, so decoding them as
#    UTF-16BE recovers the exact original text (no font data needed);
#  * the legacy CMaps use the named national charset as the code space
#    (EUC-CN/GBK/GB18030, Big5, Shift-JIS/EUC-JP, EUC-KR/UHC), all of
#    which the stdlib codecs decode exactly.
_PREDEFINED_CMAPS = {
    # Adobe-GB1 (Simplified Chinese)
    "UniGB-UCS2": "utf-16-be", "UniGB-UTF16": "utf-16-be",
    "GB-EUC": "gb2312", "GBpc-EUC": "gb2312",
    "GBK-EUC": "gbk", "GBKp-EUC": "gbk", "GBK2K": "gb18030",
    "UniGB-UTF8": "utf-8",
    # Adobe-CNS1 (Traditional Chinese)
    "UniCNS-UCS2": "utf-16-be", "UniCNS-UTF16": "utf-16-be",
    "B5pc": "big5", "ETen-B5": "big5", "ETenms-B5": "big5",
    "HKscs-B5": "big5hkscs", "UniCNS-UTF8": "utf-8",
    # Adobe-Japan1
    "UniJIS-UCS2": "utf-16-be", "UniJIS-UCS2-HW": "utf-16-be",
    "UniJIS-UTF16": "utf-16-be", "UniJIS-UTF8": "utf-8",
    "90ms-RKSJ": "cp932", "90msp-RKSJ": "cp932", "90pv-RKSJ": "cp932",
    "Ext-RKSJ": "cp932", "Add-RKSJ": "cp932", "EUC": "euc_jp",
    # Adobe-Korea1 / Adobe-KR
    "UniKS-UCS2": "utf-16-be", "UniKS-UTF16": "utf-16-be",
    "UniKS-UTF8": "utf-8",
    "KSC-EUC": "euc_kr", "KSCms-UHC": "cp949", "KSCms-UHC-HW": "cp949",
    "KSCpc-EUC": "euc_kr",
}


def predefined_cmap_codec(encoding: str) -> str | None:
    """stdlib codec name for a predefined CMap /Encoding name, or None
    when the CMap is outside the registry above."""
    base = encoding
    if base.endswith(("-H", "-V")):
        base = base[:-2]
    return _PREDEFINED_CMAPS.get(base)


def _decode_text(
    raw: bytes, font: tuple | str | None
) -> str:
    if font is None:
        if raw[:2] == b"\xfe\xff":
            # BOM-prefixed UTF-16BE show string (some generators emit
            # these without a ToUnicode map — §7.9.2.2 text-string form)
            return raw[2:].decode("utf-16-be", errors="replace")
        return raw.decode("latin-1")
    if font == "identity-cid":
        # Type0 /Identity-H(-V) WITHOUT /ToUnicode: show strings carry
        # 2-byte glyph CIDs whose Unicode mapping lives only in the font
        # program. Documented DETERMINISTIC policy (not a raise, not
        # U+FFFD soup): each CID becomes the codepoint of its own value
        # when that is a valid non-control scalar, else it is skipped —
        # lossless for fonts whose CIDs are codepoints (common for
        # subset-embedded Latin text), replayable by an independent
        # implementation, and never wrong-but-plausible mojibake.
        out = []
        for i in range(0, len(raw) - 1, 2):
            cid = int.from_bytes(raw[i : i + 2], "big")
            if 0x20 <= cid < 0xD800 or 0xE000 <= cid <= 0xFFFD:
                out.append(chr(cid))
        return "".join(out)
    if isinstance(font, tuple) and font[0] == "charset":
        # predefined CJK CMap without /ToUnicode: the CMap's code space
        # is a known charset (see _PREDEFINED_CMAPS) — decode it with
        # the matching codec; invalid sequences surface as U+FFFD
        # (visible), never as plausible Latin-1 mojibake.
        return raw.decode(font[1], errors="replace")
    if isinstance(font, tuple) and font[0] == "type0-unknown":
        raise NotImplementedError(
            f"Type0 font with predefined CMap /{font[1]} and no "
            "/ToUnicode is outside the supported CMap registry "
            "(documented boundary — a Latin-1 fallback would be "
            "wrong-but-plausible mojibake)"
        )
    cmap, nbytes = font
    out = []
    for i in range(0, len(raw) - (nbytes - 1), nbytes):
        code = int.from_bytes(raw[i : i + nbytes], "big")
        out.append(cmap.get(code, ""))
    return "".join(out)


# --------------------------------------------------------------------------
# content-stream text interpreter (§9.4)
# --------------------------------------------------------------------------

_OP_RE = re.compile(rb"[A-Za-z'\"][A-Za-z0-9*'\"]*")


def _content_tokens(data: bytes):
    """Yield (kind, value) tokens from a content stream: 'obj' for
    operands (via parse_object), 'op' for operator keywords."""
    pos = 0
    n = len(data)
    while True:
        pos = _skip_ws(data, pos)
        if pos >= n:
            return
        c = data[pos]
        if c in b"/([<" or c == 0x3C or (
            0x30 <= c <= 0x39 or c in b"+-."
        ):
            try:
                obj, pos = parse_object(data, pos)
            except PdfError:
                pos += 1  # garbage byte inside content: skip it
                continue
            yield "obj", obj
            continue
        m = _OP_RE.match(data, pos)
        if m:
            yield "op", m.group().decode("latin-1")
            pos = m.end()
            continue
        pos += 1  # unknown delimiter: skip


def extract_text_from_content(
    content: bytes, fonts: dict[str, tuple[dict[int, str], int] | None],
    xobjects: dict | None = None,
) -> str:
    """Run the text-showing subset of the content-stream machine:
    deterministic newline on vertical moves (Td/TD with ty≠0, T*, a Tm
    whose f changed, the ' and " operators), one space per TJ kern below
    ``-SPACE_KERN``. ``xobjects`` maps /XObject resource names to
    zero-arg callables returning that Form XObject's text — the ``Do``
    operator splices it in (real-world PDFs routinely put body text in
    form XObjects)."""
    out: list[str] = []
    operands: list = []
    cur_font: tuple[dict[int, str], int] | None = None
    last_tm_f: float | None = None

    def _newline() -> None:
        if out and not out[-1].endswith("\n"):
            out.append("\n")

    for kind, val in _content_tokens(content):
        if kind == "obj":
            operands.append(val)
            continue
        op = val
        if op == "Tf" and len(operands) >= 2:
            name = operands[-2]
            cur_font = fonts.get(name) if isinstance(name, str) else None
        elif op == "Tj" and operands:
            if isinstance(operands[-1], bytes):
                out.append(_decode_text(operands[-1], cur_font))
        elif op == "TJ" and operands and isinstance(operands[-1], list):
            for item in operands[-1]:
                if isinstance(item, bytes):
                    out.append(_decode_text(item, cur_font))
                elif isinstance(item, (int, float)):
                    if item <= -SPACE_KERN and out and (
                        not out[-1].endswith((" ", "\n"))
                    ):
                        out.append(" ")
        elif op in ("'", '"'):
            _newline()
            if operands and isinstance(operands[-1], bytes):
                out.append(_decode_text(operands[-1], cur_font))
        elif op in ("Td", "TD") and len(operands) >= 2:
            ty = operands[-1]
            if isinstance(ty, (int, float)) and ty != 0:
                _newline()
        elif op == "T*":
            _newline()
        elif op == "Tm" and len(operands) >= 6:
            f = operands[-1]
            if isinstance(f, (int, float)):
                if last_tm_f is not None and f != last_tm_f:
                    _newline()
                last_tm_f = float(f)
        elif op == "BT":
            last_tm_f = None
        elif op == "Do" and operands and xobjects:
            name = operands[-1]
            sub = xobjects.get(name) if isinstance(name, str) else None
            if sub is not None:
                t = sub()
                if t:
                    _newline()
                    out.append(t)
        operands = []
    return "".join(out)


# --------------------------------------------------------------------------
# document layer: xref (classic + stream), object streams, page tree
# --------------------------------------------------------------------------

_OBJ_HEAD_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")


class PdfDocument:
    """Random-access reader over one PDF payload."""

    def __init__(self, data: bytes) -> None:
        if not data.lstrip()[:5].startswith(b"%PDF-"):
            raise PdfError("not a PDF (missing %PDF- header)")
        self.data = data
        self._cache: dict[int, object] = {}
        self._form_text: dict[tuple[int, int], str] = {}
        self._offsets: dict[int, int] = {}
        self._in_objstm: dict[int, tuple[int, int]] = {}
        self._crypt = None
        self._encrypt_num = None
        self.trailer: dict = {}
        try:
            self._load_xref()
        except PdfError:
            self._scan_objects()  # dirty-corpus fallback: brute scan
        if not self._offsets and not self._in_objstm:
            self._scan_objects()
        # Encryption (§7.6.3): the standard security handler covers the
        # owner-locked-but-readable case (EMPTY user password — the
        # common crawl shape). It must be set up BEFORE any object walk
        # (_find_root_by_scan) so nothing caches undecrypted. Documents
        # that genuinely need a password keep a precise raise.
        enc_ref = self.trailer.get("Encrypt")
        if enc_ref is not None:
            from .pdf_crypto import PdfCryptoError, StandardSecurityHandler

            if isinstance(enc_ref, Ref):
                self._encrypt_num = enc_ref.num
            enc = self.resolve(enc_ref)
            if not isinstance(enc, dict):
                raise PdfError("/Encrypt is not a dictionary")
            ids = self.resolve(self.trailer.get("ID")) or []
            id0 = ids[0] if ids and isinstance(ids[0], bytes) else b""
            try:
                self._crypt = StandardSecurityHandler(
                    enc, id0, resolve=self.resolve
                )
            except PdfCryptoError as exc:
                raise NotImplementedError(f"encrypted PDF: {exc}") from exc
            self._cache.clear()  # evict anything fetched pre-handler
        if "Root" not in self.trailer:
            self._find_root_by_scan()

    # -- xref ---------------------------------------------------------------

    def _load_xref(self) -> None:
        tail = self.data[-2048:]
        m = None
        for m in re.finditer(rb"startxref\s+(\d+)", tail):
            pass
        if m is None:
            raise PdfError("no startxref")
        offset = int(m.group(1))
        seen = set()
        while offset and offset not in seen:
            seen.add(offset)
            offset = self._load_xref_section(offset)

    def _load_xref_section(self, offset: int) -> int:
        data = self.data
        pos = _skip_ws(data, offset)
        if data[pos : pos + 4] == b"xref":
            return self._load_xref_classic(pos + 4)
        return self._load_xref_stream(pos)

    def _load_xref_classic(self, pos: int) -> int:
        data = self.data
        while True:
            pos = _skip_ws(data, pos)
            if data[pos : pos + 7] == b"trailer":
                pos = _skip_ws(data, pos + 7)
                trailer, _ = parse_object(data, pos)
                for k, v in trailer.items():
                    self.trailer.setdefault(k, v)
                # Hybrid-reference file (§7.5.8.4): a classic table whose
                # trailer carries /XRefStm marks object-stream members free
                # in the classic entries; the companion xref STREAM at that
                # offset holds their real (type-2) locations. Follow it
                # before /Prev or those objects are unreachable.
                xstm = trailer.get("XRefStm")
                if isinstance(xstm, (int, float)):
                    try:
                        self._load_xref_stream(
                            _skip_ws(data, int(xstm))
                        )
                    except (PdfError, NotImplementedError):
                        pass  # malformed hybrid stream: classic wins
                prev = trailer.get("Prev")
                return int(prev) if isinstance(prev, (int, float)) else 0
            m = re.match(rb"(\d+)\s+(\d+)", data[pos : pos + 40])
            if not m:
                raise PdfError(f"bad xref subsection header at {pos}")
            start, count = int(m.group(1)), int(m.group(2))
            pos += m.end()
            pos = _skip_ws(data, pos)
            entry_re = re.compile(rb"(\d{10})\s(\d{5})\s([nf])\s{0,2}")
            for i in range(count):
                em = entry_re.match(data, pos)
                if not em:
                    raise PdfError(f"bad xref entry at {pos}")
                if em.group(3) == b"n":
                    num = start + i
                    if num not in self._offsets and (
                        num not in self._in_objstm
                    ):
                        self._offsets[num] = int(em.group(1))
                pos = em.end()

    def _load_xref_stream(self, pos: int) -> int:
        data = self.data
        m = _OBJ_HEAD_RE.match(data, pos)
        if not m:
            raise PdfError(f"no xref stream at {pos}")
        d, body_pos = parse_object(data, m.end())
        stream = self._read_stream_body(d, body_pos)
        if stream is None:
            raise PdfError("xref object has no stream")
        if self.resolve(d.get("Type")) != "XRef":
            raise PdfError("xref stream /Type mismatch")
        decoded = decode_stream(stream, self.resolve)
        w = [int(x) for x in d["W"]]
        size = int(d["Size"])
        index = d.get("Index", [0, size])
        rw = sum(w)
        rows = [decoded[i : i + rw] for i in range(0, len(decoded), rw)]
        ri = 0
        for s in range(0, len(index), 2):
            start, count = int(index[s]), int(index[s + 1])
            for i in range(count):
                if ri >= len(rows) or len(rows[ri]) < rw:
                    break
                row = rows[ri]
                ri += 1
                p = 0
                ftype = (
                    int.from_bytes(row[p : p + w[0]], "big") if w[0] else 1
                )
                p += w[0]
                f2 = int.from_bytes(row[p : p + w[1]], "big")
                p += w[1]
                f3 = int.from_bytes(row[p : p + w[2]], "big")
                num = start + i
                if num in self._offsets or num in self._in_objstm:
                    continue
                if ftype == 1:
                    self._offsets[num] = f2
                elif ftype == 2:
                    self._in_objstm[num] = (f2, f3)
        for k, v in d.items():
            if k not in ("W", "Index", "Type", "Length", "Filter",
                         "DecodeParms"):
                self.trailer.setdefault(k, v)
        prev = d.get("Prev")
        return int(prev) if isinstance(prev, (int, float)) else 0

    def _scan_objects(self) -> None:
        """Fallback for broken xref: scan every ``N G obj`` in the file
        (later definitions win — incremental-update order)."""
        for m in _OBJ_HEAD_RE.finditer(self.data):
            # only at a plausible boundary (start of file or after ws/EOL)
            if m.start() and self.data[m.start() - 1] not in _WS:
                continue
            self._offsets[int(m.group(1))] = m.start()

    def _find_root_by_scan(self) -> None:
        for num in list(self._offsets) + list(self._in_objstm):
            try:
                obj = self.get(num)
            except (PdfError, NotImplementedError):
                continue
            if isinstance(obj, dict) and obj.get("Type") == "Catalog":
                self.trailer["Root"] = Ref(num, 0)
                return
        raise PdfError("no document catalog found")

    # -- objects ------------------------------------------------------------

    def _read_stream_body(self, d: dict, pos: int):
        data = self.data
        pos = _skip_ws(data, pos)
        if data[pos : pos + 6] != b"stream":
            return None
        pos += 6
        if data[pos : pos + 2] == b"\r\n":
            pos += 2
        elif data[pos : pos + 1] in (b"\n", b"\r"):
            pos += 1
        length = self.resolve(d.get("Length"))
        if isinstance(length, (int, float)) and length >= 0:
            raw = data[pos : pos + int(length)]
            after = _skip_ws(data, pos + int(length))
            if data[after : after + 9] not in (b"endstream",):
                # wrong /Length: fall through to the delimiter scan
                raw = None
        else:
            raw = None
        if raw is None:
            end = data.find(b"endstream", pos)
            if end < 0:
                raise PdfError("unterminated stream")
            raw = data[pos:end].rstrip(b"\r\n")
        return Stream(d, raw)

    def get(self, num: int):
        if num in self._cache:
            return self._cache[num]
        if num in self._offsets:
            pos = self._offsets[num]
            m = _OBJ_HEAD_RE.match(self.data, _skip_ws(self.data, pos))
            if not m or int(m.group(1)) != num:
                raise PdfError(f"object {num} not at recorded offset")
            obj, after = parse_object(self.data, m.end())
            if isinstance(obj, dict):
                stream = self._read_stream_body(obj, after)
                if stream is not None:
                    obj = stream
            # §7.6.2: strings and stream data of every TOP-LEVEL object
            # are encrypted with the (num, gen) object key — except the
            # /Encrypt dictionary itself and cross-reference streams.
            # ObjStm MEMBERS are exempt (their container was decrypted);
            # they come through the elif branch below and are skipped.
            if self._crypt is not None and num != self._encrypt_num:
                obj = self._decrypt_obj(obj, num, int(m.group(2)))
        elif num in self._in_objstm:
            stm_num, idx = self._in_objstm[num]
            obj = self._objstm_member(stm_num, idx)
        else:
            raise PdfError(f"object {num} not in xref")
        self._cache[num] = obj
        return obj

    def _decrypt_obj(self, obj, num: int, gen: int):
        """Recursively decrypt the strings (and stream bytes) of one
        indirect object with its object key."""
        if isinstance(obj, bytes):
            return self._crypt.decrypt_string(obj, num, gen)
        if isinstance(obj, list):
            return [self._decrypt_obj(v, num, gen) for v in obj]
        if isinstance(obj, Stream):
            d = self._decrypt_obj(obj.dict, num, gen)
            if d.get("Type") == "XRef":
                return Stream(d, obj.raw)  # xref streams never encrypted
            return Stream(
                d, self._crypt.decrypt_stream(obj.raw, num, gen)
            )
        if isinstance(obj, dict):
            return {
                k: self._decrypt_obj(v, num, gen) for k, v in obj.items()
            }
        return obj

    def _objstm_member(self, stm_num: int, idx: int):
        # A self-referential /ObjStm (its own entry marked type-2 inside
        # itself) would recurse get→_objstm_member→get forever.
        active = getattr(self, "_objstm_active", None)
        if active is None:
            active = self._objstm_active = set()
        if stm_num in active:
            raise PdfError(f"object stream {stm_num} references itself")
        active.add(stm_num)
        try:
            return self._objstm_member_inner(stm_num, idx)
        finally:
            active.discard(stm_num)

    def _objstm_member_inner(self, stm_num: int, idx: int):
        stm = self.get(stm_num)
        if not isinstance(stm, Stream) or (
            self.resolve(stm.dict.get("Type")) != "ObjStm"
        ):
            raise PdfError(f"object stream {stm_num} invalid")
        decoded = decode_stream(stm, self.resolve)
        n = int(self.resolve(stm.dict["N"]))
        first = int(self.resolve(stm.dict["First"]))
        header = decoded[:first].split()
        if idx >= n or 2 * idx + 1 >= len(header):
            raise PdfError(f"object stream index {idx} out of range")
        off = int(header[2 * idx + 1])
        obj, _ = parse_object(decoded, first + off)
        return obj

    def resolve(self, obj):
        """Follow indirect references (cycles guarded)."""
        hops = 0
        while isinstance(obj, Ref):
            obj = self.get(obj.num)
            hops += 1
            if hops > 64:
                raise PdfError("reference cycle")
        return obj

    # -- pages + text ---------------------------------------------------------

    def pages(self) -> list[dict]:
        root = self.resolve(self.trailer.get("Root"))
        if not isinstance(root, dict):
            raise PdfError("missing /Root catalog")
        out: list[dict] = []
        # Visited-node guard: a /Pages DAG that lists the same kid twice at
        # every level stays under any depth cap yet explodes exponentially
        # (2^depth leaf visits). Page-tree nodes are indirect objects, so the
        # Ref number identifies each node; revisiting one is malformed input.
        seen: set[int] = set()
        # Hard cap on collected pages: the trailer /Size bounds how many
        # objects (hence pages) a well-formed file can hold.
        try:
            max_pages = min(
                int(self.resolve(self.trailer.get("Size", 0))) or 65536, 65536
            )
        except (TypeError, ValueError):
            max_pages = 65536

        def walk(node, inherited_res, depth=0):
            if depth > 64:
                raise PdfError("page tree too deep")
            if isinstance(node, Ref):
                if node.num in seen:
                    raise PdfError("page tree node revisited (cycle or DAG)")
                seen.add(node.num)
            node = self.resolve(node)
            if not isinstance(node, dict):
                return
            res = node.get("Resources", inherited_res)
            if node.get("Type") == "Page":
                if len(out) >= max_pages:
                    raise PdfError("page count exceeds trailer /Size bound")
                if "Resources" not in node and res is not None:
                    node = dict(node)
                    node["Resources"] = res
                out.append(node)
                return
            for kid in self.resolve(node.get("Kids", [])) or []:
                walk(kid, res, depth + 1)

        walk(root.get("Pages"), None)
        return out

    def _fonts_of(self, res: dict):
        fonts: dict[str, tuple[dict[int, str], int] | None] = {}
        fdict = self.resolve(res.get("Font")) or {}
        for name, fref in fdict.items():
            font = self.resolve(fref)
            cmap = None
            if isinstance(font, dict):
                tu = self.resolve(font.get("ToUnicode"))
                if isinstance(tu, Stream):
                    cmap = parse_tounicode(
                        decode_stream(tu, self.resolve)
                    )
                elif self.resolve(font.get("Subtype")) == "Type0":
                    # predefined-CMap Type0 without ToUnicode: the
                    # deterministic policies (see _decode_text) —
                    # Identity → own-codepoint CIDs; registered CJK
                    # CMaps → exact charset decode; anything else → a
                    # precise raise instead of Latin-1 mojibake
                    enc = self.resolve(font.get("Encoding"))
                    if enc in ("Identity-H", "Identity-V"):
                        cmap = "identity-cid"
                    elif isinstance(enc, str):
                        codec = predefined_cmap_codec(enc)
                        cmap = (
                            ("charset", codec) if codec
                            else ("type0-unknown", enc)
                        )
            fonts[name] = cmap
        return fonts

    def _xobjects_of(self, res: dict, depth: int):
        """Form-XObject text closures for the ``Do`` operator: each form
        extracts lazily with ITS OWN /Resources (falling back to the
        caller's), recursion depth-capped against self-referential
        forms."""
        out: dict = {}
        if depth >= 16:
            return out
        xdict = self.resolve(res.get("XObject")) or {}
        for name, xref in xdict.items():
            xobj = self.resolve(xref)
            if not isinstance(xobj, Stream):
                continue
            if self.resolve(xobj.dict.get("Subtype")) != "Form":
                continue  # images have no text layer
            key = (xref.num, xref.gen) if isinstance(xref, Ref) else None

            def _run(xobj=xobj, key=key):
                # memoize per object: headers/watermarks shared across
                # pages (or invoked k times) decode and extract ONCE
                if key is not None and key in self._form_text:
                    return self._form_text[key]
                own = self.resolve(xobj.dict.get("Resources")) or res
                text = extract_text_from_content(
                    decode_stream(xobj, self.resolve),
                    self._fonts_of(own),
                    self._xobjects_of(own, depth + 1),
                )
                if key is not None:
                    self._form_text[key] = text
                return text

            out[name] = _run
        return out

    def page_text(self, page: dict) -> str:
        contents = self.resolve(page.get("Contents"))
        if contents is None:
            return ""
        parts = contents if isinstance(contents, list) else [contents]
        blob = b"\n".join(
            decode_stream(self.resolve(p), self.resolve)
            for p in parts
            if isinstance(self.resolve(p), Stream)
        )
        res = self.resolve(page.get("Resources")) or {}
        return extract_text_from_content(
            blob, self._fonts_of(res), self._xobjects_of(res, 0)
        )

    def text(self) -> str:
        """Full document text, pages joined with form-feed."""
        return "\f".join(self.page_text(p) for p in self.pages())


def pdf_text(content: bytes) -> str:
    """One-call text extraction. Raises :class:`PdfError` on structural
    corruption and ``NotImplementedError`` at the documented boundaries
    (encryption, unsupported filters)."""
    return PdfDocument(content).text()


def pdf_metadata(content: bytes) -> dict:
    """Container metadata without touching page content: page count,
    PDF version, /Info fields (Title/Author/Subject/Producer) when
    present and string-valued."""
    doc = PdfDocument(content)
    head = content.lstrip()[:16]
    m = re.match(rb"%PDF-(\d+\.\d+)", head)
    info = doc.resolve(doc.trailer.get("Info")) or {}
    out = {
        "version": m.group(1).decode("ascii") if m else None,
        "n_pages": len(doc.pages()),
    }
    for k in ("Title", "Author", "Subject", "Producer"):
        v = info.get(k) if isinstance(info, dict) else None
        v = doc.resolve(v)
        if isinstance(v, bytes):
            if v[:2] == b"\xfe\xff":
                out[k.lower()] = v[2:].decode("utf-16-be", "replace")
            else:
                out[k.lower()] = v.decode("latin-1")
    return out
