"""INDEPENDENT spec-derived PDF writer — the adversarial fixture
builder for ``sources/pdf.py`` (the established independent-writer
pattern: mp3_writer, flac_writer, jpeg_writer, binlog_writer). Emits
both file layouts from the ISO 32000-1 WRITE direction: the classic
xref-table form and the PDF-1.5 xref-stream + object-stream form (with
optional PNG ``up`` predictor on the xref rows), literal/hex strings,
Flate / ASCIIHex / plain content streams, TJ kern arrays, multi-page
trees, /Info dictionaries, and Type0-style fonts with a /ToUnicode
CMap. No code is shared with the reader."""

from __future__ import annotations

import zlib


def _esc(s: bytes) -> bytes:
    return s.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(
        b")", b"\\)"
    )


def text_content(
    lines: list[str | list],
    font: str = "F1",
    leading: int = 14,
    hex_strings: bool = False,
    encode=None,
) -> bytes:
    """A BT/ET text block: each entry of ``lines`` is either a plain
    string (shown with Tj) or a TJ array given as a list of strings and
    numeric kerns. ``encode`` maps a str to bytes (defaults to
    Latin-1; a CID encoder for ToUnicode fonts)."""
    enc = encode or (lambda s: s.encode("latin-1"))

    def _str(s: str) -> bytes:
        raw = enc(s)
        if hex_strings:
            return b"<" + raw.hex().encode("ascii") + b">"
        return b"(" + _esc(raw) + b")"

    out = [b"BT", b"/%s 12 Tf" % font.encode(), b"72 720 Td"]
    for i, line in enumerate(lines):
        if i:
            out.append(b"0 -%d Td" % leading)
        if isinstance(line, list):
            parts = []
            for item in line:
                if isinstance(item, str):
                    parts.append(_str(item))
                else:
                    parts.append(str(item).encode("ascii"))
            out.append(b"[" + b" ".join(parts) + b"] TJ")
        else:
            out.append(_str(line) + b" Tj")
    out.append(b"ET")
    return b"\n".join(out)


def tounicode_cmap(mapping: dict[int, str], nbytes: int = 2) -> bytes:
    """A ToUnicode CMap stream body: one codespacerange + bfchar
    entries (and a bfrange when the mapping holds a contiguous run,
    exercising both section kinds)."""
    hi = "FF" * nbytes
    lines = [
        b"/CIDInit /ProcSet findresource begin",
        b"12 dict begin",
        b"begincmap",
        b"1 begincodespacerange",
        b"<%s> <%s>" % (b"0" * 2 * nbytes, hi.encode()),
        b"endcodespacerange",
    ]
    items = sorted(mapping.items())
    # split a trailing contiguous ascending run into a bfrange
    run_start = len(items)
    while (
        run_start > 1
        and items[run_start - 1][0] == items[run_start - 2][0] + 1
        and ord(items[run_start - 1][1][-1])
        == ord(items[run_start - 2][1][-1]) + 1
        and len(items[run_start - 1][1]) == 1
    ):
        run_start -= 1
    chars = items[:run_start]
    run = items[run_start:]
    if chars:
        lines.append(b"%d beginbfchar" % len(chars))
        for code, txt in chars:
            uni = txt.encode("utf-16-be").hex().upper().encode()
            lines.append(
                b"<%0*X> <%s>" % (2 * nbytes, code, uni)
            )
        lines.append(b"endbfchar")
    if len(run) >= 2:
        lines.append(b"1 beginbfrange")
        lines.append(
            b"<%0*X> <%0*X> <%s>"
            % (
                2 * nbytes, run[0][0], 2 * nbytes, run[-1][0],
                run[0][1].encode("utf-16-be").hex().upper().encode(),
            )
        )
        lines.append(b"endbfrange")
    lines += [b"endcmap", b"end", b"end"]
    return b"\n".join(lines)


def _a85_encode(data: bytes) -> bytes:
    """Independent ASCII85 encoder (write direction of §7.4.3)."""
    out = bytearray()
    for i in range(0, len(data), 4):
        chunk = data[i : i + 4]
        n = len(chunk)
        v = int.from_bytes(chunk + b"\x00" * (4 - n), "big")
        digits = []
        for _ in range(5):
            digits.append(v % 85)
            v //= 85
        group = bytes(33 + d for d in reversed(digits))
        if n == 4 and group == b"!!!!!":
            out += b"z"
        else:
            out += group[: n + 1]
    return bytes(out) + b"~>"


def _rle_encode(data: bytes) -> bytes:
    """Independent RunLengthDecode encoder (write direction of §7.4.5):
    repeat runs of >= 3 as (257-n, byte), literals otherwise."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        j = i
        while j < n and j - i < 128:
            if j + 2 < n and data[j] == data[j + 1] == data[j + 2]:
                break
            j += 1
        out += bytes([j - i - 1]) + data[i:j]
        i = j
    return bytes(out) + b"\x80"


def write_pdf(
    page_contents: list[bytes],
    compress: str = "flate",        # "flate" | "hex" | "a85" | "rle" | "none"
    xref_stream: bool = False,
    objstm: bool = False,
    predictor: bool = False,
    info: dict[str, str] | None = None,
    tounicode: dict[int, str] | None = None,
    wrong_length: bool = False,
    form_xobject: bool = False,
    hybrid: bool = False,
    type0_encoding: str | None = None,
) -> bytes:
    """Assemble a complete PDF around the given per-page content
    streams. ``objstm`` packs the non-stream objects into a /Type
    /ObjStm (requires ``xref_stream``); ``predictor`` applies the PNG
    ``up`` predictor to the xref stream rows; ``wrong_length`` writes a
    /Length one byte short (readers must fall back to the endstream
    delimiter scan); ``tounicode`` attaches a /ToUnicode CMap to the
    font; ``form_xobject`` routes each page's content through a /Form
    XObject invoked by ``Do`` (the form carries its OWN /Resources —
    the layout office-suite exporters emit). ``hybrid`` emits the
    §7.5.8.4 hybrid-reference layout (Acrobat "optimized save"): a
    CLASSIC xref table that marks object-stream members free, whose
    trailer /XRefStm points at the companion xref stream holding their
    real type-2 locations — startxref targets the classic table."""
    if objstm and not xref_stream:
        raise ValueError("object streams need the xref-stream layout")
    if hybrid and not objstm:
        raise ValueError("the hybrid layout needs object streams")
    objects: dict[int, bytes] = {}
    stream_objs: set[int] = set()
    n_pages = len(page_contents)
    font_num = 3 + 2 * n_pages
    info_num = font_num + (2 if tounicode else 1)
    next_num = info_num + (1 if info else 0)

    kids = b" ".join(
        b"%d 0 R" % (3 + 2 * i) for i in range(n_pages)
    )
    objects[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objects[2] = (
        b"<< /Type /Pages /Kids [" + kids + b"] /Count %d >>" % n_pages
    )
    form_base = next_num
    if form_xobject:
        next_num += n_pages
    for i, content in enumerate(page_contents):
        page_num = 3 + 2 * i
        cont_num = 4 + 2 * i
        if form_xobject:
            # the page's own content only invokes the form; the form
            # carries the text and its OWN font resources
            form_num = form_base + i
            objects[page_num] = (
                b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                b"/Resources << /XObject << /Fx1 %d 0 R >> >> "
                b"/Contents %d 0 R >>" % (form_num, cont_num)
            )
            fbody = zlib.compress(content)
            objects[form_num] = (
                b"<< /Type /XObject /Subtype /Form /BBox [0 0 612 792] "
                b"/Resources << /Font << /F1 %d 0 R >> >> "
                b"/Filter /FlateDecode /Length %d >>\nstream\n"
                % (font_num, len(fbody)) + fbody + b"\nendstream"
            )
            stream_objs.add(form_num)
            content = b"/Fx1 Do"
        else:
            objects[page_num] = (
                b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                b"/Resources << /Font << /F1 %d 0 R >> >> "
                b"/Contents %d 0 R >>" % (font_num, cont_num)
            )
        if compress == "flate":
            body = zlib.compress(content)
            filt = b"/Filter /FlateDecode "
        elif compress == "hex":
            body = content.hex().encode("ascii") + b">"
            filt = b"/Filter /ASCIIHexDecode "
        elif compress == "a85":
            body = _a85_encode(content)
            filt = b"/Filter /ASCII85Decode "
        elif compress == "rle":
            body = _rle_encode(content)
            filt = b"/Filter /RunLengthDecode "
        else:
            body = content
            filt = b""
        length = len(body) - (1 if wrong_length else 0)
        objects[cont_num] = (
            b"<< %s/Length %d >>\nstream\n" % (filt, length)
            + body + b"\nendstream"
        )
        stream_objs.add(cont_num)
    if tounicode:
        cmap = tounicode_cmap(tounicode)
        objects[font_num] = (
            b"<< /Type /Font /Subtype /Type0 /BaseFont /Fixture "
            b"/ToUnicode %d 0 R >>" % (font_num + 1)
        )
        objects[font_num + 1] = (
            b"<< /Length %d >>\nstream\n" % len(cmap) + cmap
            + b"\nendstream"
        )
        stream_objs.add(font_num + 1)
    elif type0_encoding:
        # a Type0 CID font using a predefined CMap, NO /ToUnicode — the
        # CJK-export shape whose text policy pdf.py documents
        objects[font_num] = (
            b"<< /Type /Font /Subtype /Type0 /BaseFont /Fixture "
            b"/Encoding /" + type0_encoding.encode("ascii") + b" >>"
        )
    else:
        objects[font_num] = (
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
        )
    if info:
        body = b" ".join(
            b"/%s (%s)" % (k.encode(), _esc(v.encode("latin-1")))
            for k, v in info.items()
        )
        objects[info_num] = b"<< " + body + b" >>"

    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    in_stm: dict[int, int] = {}  # objnum -> index inside the ObjStm
    stm_members: list[int] = []
    if objstm:
        # dictionaries travel compressed; stream objects cannot
        stm_members = [n for n in sorted(objects) if n not in stream_objs]
    for num in sorted(objects):
        if num in stm_members:
            continue
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + objects[num] + b"\nendobj\n"
    objstm_num = 0
    if objstm and stm_members:
        objstm_num = next_num
        next_num += 1
        header = []
        body = bytearray()
        for i, num in enumerate(stm_members):
            header.append(b"%d %d" % (num, len(body)))
            body += objects[num] + b"\n"
            in_stm[num] = i
        head = b" ".join(header) + b"\n"
        payload = zlib.compress(bytes(head) + bytes(body))
        offsets[objstm_num] = len(out)
        out += (
            b"%d 0 obj\n<< /Type /ObjStm /N %d /First %d "
            b"/Filter /FlateDecode /Length %d >>\nstream\n"
            % (objstm_num, len(stm_members), len(head), len(payload))
            + payload + b"\nendstream\nendobj\n"
        )

    if not xref_stream:
        size = max(objects) + 1
        xref_pos = len(out)
        out += b"xref\n0 %d\n" % size
        out += b"0000000000 65535 f \n"
        for num in range(1, size):
            out += b"%010d 00000 n \n" % offsets.get(num, 0)
        trailer = b"<< /Size %d /Root 1 0 R" % size
        if info:
            trailer += b" /Info %d 0 R" % info_num
        trailer += b" >>"
        out += b"trailer\n" + trailer + b"\nstartxref\n%d\n%%%%EOF\n" \
            % xref_pos
        return bytes(out)

    # xref stream layout: W = [1 4 2]
    xref_num = next_num
    size = xref_num + 1
    rows = bytearray()
    rows += bytes([0]) + (0).to_bytes(4, "big") + (65535).to_bytes(2, "big")
    for num in range(1, size):
        if num in in_stm:
            rows += bytes([2]) + objstm_num.to_bytes(4, "big") \
                + in_stm[num].to_bytes(2, "big")
        elif num == xref_num:
            rows += bytes([1]) + (0).to_bytes(4, "big") \
                + (0).to_bytes(2, "big")  # patched below
        else:
            rows += bytes([1]) + offsets.get(num, 0).to_bytes(4, "big") \
                + (0).to_bytes(2, "big")
    xref_pos = len(out)
    # patch the xref stream's own offset into its row
    row_w = 7
    own = bytearray(rows)
    base = xref_num * row_w
    own[base : base + row_w] = (
        bytes([1]) + xref_pos.to_bytes(4, "big") + (0).to_bytes(2, "big")
    )
    rows = bytes(own)
    parms = b""
    if predictor:
        # PNG "up" predictor, Columns = row width
        pred_rows = bytearray()
        prev = bytes(row_w)
        for i in range(0, len(rows), row_w):
            row = rows[i : i + row_w]
            pred_rows.append(2)
            pred_rows += bytes(
                (row[j] - prev[j]) & 0xFF for j in range(row_w)
            )
            prev = row
        payload = zlib.compress(bytes(pred_rows))
        parms = (
            b"/DecodeParms << /Predictor 12 /Columns %d >> " % row_w
        )
    else:
        payload = zlib.compress(rows)
    d = (
        b"<< /Type /XRef /Size %d /W [1 4 2] /Root 1 0 R " % size
        + (b"/Info %d 0 R " % info_num if info else b"")
        + parms
        + b"/Filter /FlateDecode /Length %d >>" % len(payload)
    )
    out += b"%d 0 obj\n" % xref_num + d + b"\nstream\n" + payload \
        + b"\nendstream\nendobj\n"
    if hybrid:
        classic_pos = len(out)
        out += b"xref\n0 %d\n" % size
        out += b"0000000000 65535 f \n"
        for num in range(1, size):
            if num in in_stm:
                out += b"0000000000 00001 f \n"
            elif num == xref_num:
                out += b"%010d 00000 n \n" % xref_pos
            else:
                out += b"%010d 00000 n \n" % offsets.get(num, 0)
        trailer = b"<< /Size %d /Root 1 0 R /XRefStm %d" % (size, xref_pos)
        if info:
            trailer += b" /Info %d 0 R" % info_num
        trailer += b" >>"
        out += b"trailer\n" + trailer + b"\nstartxref\n%d\n%%%%EOF\n" \
            % classic_pos
        return bytes(out)
    out += b"startxref\n%d\n%%%%EOF\n" % xref_pos
    return bytes(out)
