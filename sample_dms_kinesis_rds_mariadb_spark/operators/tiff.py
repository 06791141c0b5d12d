"""Pure-Python baseline TIFF decoder — stdlib + numpy only.

Completes the engine's real-decode still-image set (PNM/BMP/PNG/JPEG/GIF)
with the remaining interchange format: both byte orders (II/MM), IFD
walking with inline-vs-offset values, strip assembly, Compression 1
(none), 32773 (PackBits) and 5 (TIFF-flavor LZW: MSB-first bit packing
and the spec's "early change" width switch — one code EARLIER than GIF's
LZW), Predictor 2 (horizontal differencing), photometric interpretations
WhiteIsZero / BlackIsZero / RGB / Palette (16-bit colormap scaled), and
alpha via ExtraSamples.

Lossless throughout, so tests assert EXACT pixel bytes against an
INDEPENDENT spec-derived writer (``tests/tiff_writer.py``).

Tiled layout (TIFF 6.0 §15) and 16-bit samples (MSB reduction, the
PNG-16 precedent) decode for real as of r12; Deflate (8/32946) and
planar configuration 2 since r8; new-style JPEG-in-TIFF
(compression 7, incl. the shared-JPEGTables abbreviated-stream form)
decodes through the repo's real JPEG decoder (r12). Honest boundaries
(``NotImplementedError``): sub-8-bit depths, 16-bit palettes,
old-style JPEG (6) and CCITT compressions, predictor 3, planar
JPEG-in-TIFF. Malformed streams raise ``ValueError``.
"""

from __future__ import annotations

import numpy as np

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 6: 1, 7: 1, 9: 4}


def _read_ifd(content: bytes, bo: str, pos: int) -> tuple[dict, int]:
    """One IFD: {tag: [values...]}, plus the next-IFD offset."""
    if pos + 2 > len(content):
        raise ValueError("TIFF: truncated IFD header")
    n = int.from_bytes(content[pos : pos + 2], bo)
    pos += 2
    if pos + 12 * n + 4 > len(content):
        raise ValueError("TIFF: truncated IFD")
    tags: dict[int, list[int]] = {}
    for e in range(n):
        ep = pos + 12 * e
        tag = int.from_bytes(content[ep : ep + 2], bo)
        typ = int.from_bytes(content[ep + 2 : ep + 4], bo)
        cnt = int.from_bytes(content[ep + 4 : ep + 8], bo)
        size = _TYPE_SIZES.get(typ)
        if size is None:
            continue  # unknown type: skip tag (spec-sanctioned)
        total = size * cnt
        if total <= 4:
            raw = content[ep + 8 : ep + 8 + total]
        else:
            off = int.from_bytes(content[ep + 8 : ep + 12], bo)
            if off + total > len(content):
                raise ValueError(f"TIFF: tag {tag} data out of bounds")
            raw = content[off : off + total]
        tags[tag] = [
            int.from_bytes(raw[i * size : (i + 1) * size], bo)
            for i in range(cnt)
        ]
    next_off = int.from_bytes(content[pos + 12 * n : pos + 12 * n + 4], bo)
    return tags, next_off


def _unpackbits(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while len(out) < expected:
        if i >= n:
            raise ValueError("TIFF: PackBits data exhausted")
        c = data[i]
        i += 1
        if c < 128:  # literal run of c+1 bytes
            if i + c + 1 > n:
                raise ValueError("TIFF: PackBits literal truncated")
            out += data[i : i + c + 1]
            i += c + 1
        elif c > 128:  # repeat next byte 257-c times
            if i >= n:
                raise ValueError("TIFF: PackBits repeat truncated")
            out += bytes([data[i]]) * (257 - c)
            i += 1
        # c == 128: noop
    return bytes(out[:expected])


def _lzw_decode_tiff(data: bytes, expected: int) -> bytes:
    """TIFF-flavor LZW (spec §13): 8-bit symbols, CLEAR=256, EOI=257,
    MSB-first bit packing, EARLY width change (the table's next code ==
    2^w - 1 already widens, one step before GIF's convention)."""
    clear, eoi = 256, 257
    base = [bytes([i]) for i in range(256)] + [b"", b""]
    table = list(base)
    code_size = 9
    prev: bytes | None = None
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while len(out) < expected:
        while nbits < code_size:
            if pos >= n:
                raise ValueError("TIFF: LZW data exhausted")
            acc = (acc << 8) | data[pos]
            nbits += 8
            pos += 1
        code = (acc >> (nbits - code_size)) & ((1 << code_size) - 1)
        nbits -= code_size
        if code == clear:
            table = list(base)
            code_size = 9
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError(f"TIFF: LZW code {code} before any output")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"TIFF: LZW code {code} out of range")
        out += entry
        prev = entry
        # EARLY change: widen when the NEXT append would get 2^w - 1
        if len(table) == (1 << code_size) - 1 and code_size < 12:
            code_size += 1
    return bytes(out[:expected])


def decode_tiff(content: bytes) -> tuple[int, int, int, bytes]:
    """FULL pixel decode of the first image in a baseline 8-bit TIFF.
    Returns ``(width, height, channels, pixels)`` — gray, RGB, or RGBA
    (ExtraSamples / palette handled; WhiteIsZero inverted to the usual
    black-is-zero convention)."""
    bo = _tiff_byte_order(content)
    ifd_off = int.from_bytes(content[4:8], bo)
    tags, _next = _read_ifd(content, bo, ifd_off)

    def one(tag, default=None):
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise ValueError(f"TIFF: missing required tag {tag}")
            return default
        return v[0]

    tiled = 322 in tags and 323 in tags
    if (322 in tags) != (323 in tags):
        raise ValueError("TIFF: TileWidth/TileLength must appear together")
    width = one(256)
    height = one(257)
    spp = one(277, 1)
    bits = tags.get(258, [8] * spp)
    if not (all(b == 8 for b in bits) or all(b == 16 for b in bits)):
        raise NotImplementedError(
            f"TIFF bit depths {bits} not supported (8- or 16-bit "
            "samples, uniform)"
        )
    sb = bits[0] // 8  # bytes per sample
    dt = np.uint8 if sb == 1 else np.dtype(
        "<u2" if bo == "little" else ">u2"
    )
    planar = one(284, 1)
    if planar not in (1, 2):
        raise ValueError(f"TIFF: invalid PlanarConfiguration {planar}")
    compression = one(259, 1)
    photometric = one(262)
    predictor = one(317, 1)
    if predictor not in (1, 2):
        raise NotImplementedError(f"TIFF predictor {predictor}")
    if tiled:
        offsets = tags.get(324)
        counts = tags.get(325)
        if not offsets or not counts or len(offsets) != len(counts):
            raise ValueError("TIFF: missing or mismatched tile tags")
        rows_per_strip = height  # unused on the tile path
    else:
        offsets = tags.get(273)
        counts = tags.get(279)
        if not offsets or not counts or len(offsets) != len(counts):
            raise ValueError("TIFF: missing or mismatched strip tags")
        rows_per_strip = one(278, height)

    if compression == 7:
        # new-style JPEG-in-TIFF (TIFF Technical Note 2): each strip or
        # tile is a JPEG stream — interchange, or abbreviated with the
        # shared tables in the JPEGTables tag (347), merged by splicing
        # the tables body between the segment's SOI and its first marker
        if planar == 2 and spp > 1:
            raise NotImplementedError(
                "planar JPEG-in-TIFF not supported (chunky only)"
            )
        from sample_dms_kinesis_rds_mariadb_spark.operators.jpeg import (
            decode_jpeg,
        )

        jt = tags.get(347)
        tables = bytes(jt) if jt else None
        if tables is not None and (
            tables[:2] != b"\xff\xd8" or tables[-2:] != b"\xff\xd9"
        ):
            raise ValueError("TIFF: malformed JPEGTables stream")

        def jseg(chunk: bytes):
            if chunk[:2] != b"\xff\xd8":
                raise ValueError("TIFF: JPEG segment without SOI")
            if tables is not None and len(tables) > 4:
                chunk = chunk[:2] + tables[2:-2] + chunk[2:]
            return decode_jpeg(chunk)

        out_arr = None
        if tiled:
            tw = one(322)
            tl = one(323)
            across = -(-width // tw)
            for t, (off, cnt) in enumerate(zip(offsets, counts)):
                if off + cnt > len(content):
                    raise ValueError("TIFF: tile out of bounds")
                jw, jh, jch, pix = jseg(content[off: off + cnt])
                if out_arr is None:
                    out_arr = np.zeros((height, width, jch),
                                       dtype=np.uint8)
                tile = np.frombuffer(pix, dtype=np.uint8).reshape(
                    jh, jw, jch
                )
                ty, tx = divmod(t, across)
                y0, x0 = ty * tl, tx * tw
                hc = min(jh, height - y0)
                wc = min(jw, width - x0)
                out_arr[y0: y0 + hc, x0: x0 + wc] = tile[:hc, :wc]
        else:
            y0 = 0
            for off, cnt in zip(offsets, counts):
                if off + cnt > len(content):
                    raise ValueError("TIFF: strip out of bounds")
                jw, jh, jch, pix = jseg(content[off: off + cnt])
                if out_arr is None:
                    out_arr = np.zeros((height, width, jch),
                                       dtype=np.uint8)
                strip = np.frombuffer(pix, dtype=np.uint8).reshape(
                    jh, jw, jch
                )
                hc = min(jh, height - y0)
                wc = min(jw, width)
                out_arr[y0: y0 + hc, :wc] = strip[:hc, :wc]
                y0 += hc
            if y0 < height:
                raise ValueError("TIFF: JPEG strips cover fewer rows "
                                 "than ImageLength")
        if out_arr is None:
            raise ValueError("TIFF: no JPEG segments")
        return width, height, out_arr.shape[2], out_arr.tobytes()

    def decompress(chunk: bytes, expected: int) -> bytes:
        if compression == 1:
            if len(chunk) < expected:
                raise ValueError("TIFF: uncompressed strip short")
            return chunk[:expected]
        if compression == 32773:
            return _unpackbits(chunk, expected)
        if compression == 5:
            return _lzw_decode_tiff(chunk, expected)
        if compression in (8, 32946):  # Adobe deflate / legacy deflate
            import zlib

            data = zlib.decompress(chunk)
            if len(data) < expected:
                raise ValueError("TIFF: deflate strip short")
            return data[:expected]
        raise NotImplementedError(
            f"TIFF compression {compression} not supported "
            "(none/PackBits/LZW/Deflate decode here)"
        )

    def read_strips(strip_list, sample_width: int) -> bytes:
        raw = bytearray()
        remaining = height
        for off, cnt in strip_list:
            if off + cnt > len(content):
                raise ValueError("TIFF: strip out of bounds")
            strip_rows = min(rows_per_strip, remaining)
            raw += decompress(content[off : off + cnt],
                              strip_rows * sample_width * sb)
            remaining -= strip_rows
        if remaining > 0:
            raise ValueError("TIFF: strips cover fewer rows than ImageLength")
        return bytes(raw)

    def undiff(a: np.ndarray, nchan: int) -> np.ndarray:
        # horizontal differencing per sample: cumulative sum along the
        # row, modulo the sample width
        h_, stride_ = a.shape
        return (
            np.cumsum(
                a.reshape(h_, stride_ // nchan, nchan), axis=1,
                dtype=np.uint64,
            )
            % (1 << (8 * sb))
        ).astype(dt).reshape(h_, stride_)

    if tiled:
        # TIFF 6.0 §15: a fixed tile grid, right/bottom tiles padded to
        # full size in the file and CLIPPED on assembly; planar=2 puts
        # each channel's full tile set consecutively (plane-major)
        tw = one(322)
        tl = one(323)
        if tw <= 0 or tl <= 0 or tw % 16 or tl % 16:
            raise ValueError("TIFF: tile dims must be positive multiples of 16")
        across = -(-width // tw)
        down = -(-height // tl)
        per_plane = across * down
        n_planes = spp if (planar == 2 and spp > 1) else 1
        tile_spp = 1 if n_planes > 1 else spp
        if len(offsets) != per_plane * n_planes:
            raise ValueError(
                f"TIFF: tile count {len(offsets)} != "
                f"{per_plane} tiles x {n_planes} planes"
            )
        planes = []
        for c in range(n_planes):
            plane = np.zeros((height, width * tile_spp), dtype=dt)
            for t in range(per_plane):
                off = offsets[c * per_plane + t]
                cnt = counts[c * per_plane + t]
                if off + cnt > len(content):
                    raise ValueError("TIFF: tile out of bounds")
                raw = decompress(content[off: off + cnt],
                                 tl * tw * tile_spp * sb)
                tile = np.frombuffer(raw, dtype=dt).reshape(
                    tl, tw * tile_spp
                )
                if predictor == 2:
                    tile = undiff(tile, tile_spp)
                ty, tx = divmod(t, across)
                y0 = ty * tl
                x0 = tx * tw * tile_spp
                hc = min(tl, height - y0)
                wc = min(tw, width - tx * tw) * tile_spp
                plane[y0: y0 + hc, x0: x0 + wc] = tile[:hc, :wc]
            planes.append(plane)
        if n_planes > 1:
            arr = np.stack(planes, axis=2).reshape(height, width * spp)
        else:
            arr = planes[0]
    elif planar == 2 and spp > 1:
        # plane-by-plane strips: all strips of channel 0, then channel 1...
        per_plane = (height + rows_per_strip - 1) // rows_per_strip
        if len(offsets) != per_plane * spp:
            raise ValueError(
                f"TIFF: planar strip count {len(offsets)} != "
                f"{per_plane} strips x {spp} planes"
            )
        planes = []
        for c in range(spp):
            sl = list(
                zip(
                    offsets[c * per_plane : (c + 1) * per_plane],
                    counts[c * per_plane : (c + 1) * per_plane],
                )
            )
            p = np.frombuffer(read_strips(sl, width), dtype=dt).reshape(
                height, width
            )
            if predictor == 2:
                p = undiff(p, 1)
            planes.append(p)
        arr = np.stack(planes, axis=2).reshape(height, width * spp)
    else:
        stride = width * spp
        arr = np.frombuffer(
            read_strips(list(zip(offsets, counts)), stride), dtype=dt
        ).reshape(height, stride)
        if predictor == 2:
            arr = undiff(arr, spp)
    if sb == 2:
        if photometric == 3:
            raise NotImplementedError(
                "16-bit palette TIFF not supported"
            )
        # the standard 8-bit reduction: keep the most-significant byte
        # (the PNG-16 precedent in multimodal._png_row_samples)
        arr = (arr.astype(np.uint16) >> 8).astype(np.uint8)
    arr = arr.reshape(height, width, spp)

    if photometric == 3:  # palette
        cmap = tags.get(320)
        if not cmap or len(cmap) % 3:
            raise ValueError("TIFF: palette image missing valid ColorMap")
        n_pal = len(cmap) // 3
        pal = np.array(
            [cmap[0:n_pal], cmap[n_pal : 2 * n_pal], cmap[2 * n_pal :]],
            dtype=np.uint32,
        ).T  # (n, 3), 16-bit values
        idx = arr[:, :, 0]
        if int(idx.max(initial=0)) >= n_pal:
            raise ValueError("TIFF: palette index out of range")
        rgb = (pal[idx] >> 8).astype(np.uint8)
        return width, height, 3, rgb.tobytes()
    if photometric == 0:  # WhiteIsZero: invert to black-is-zero
        arr = 255 - arr
    channels = spp
    return width, height, channels, arr.tobytes()


def _tiff_byte_order(content: bytes) -> str:
    if content[:4] == b"II*\x00":
        return "little"
    if content[:4] == b"MM\x00*":
        return "big"
    raise ValueError("not a TIFF (bad byte-order signature)")


def tiff_header(content: bytes) -> tuple[int, int, int]:
    """(width, height, channels) from the first IFD only — no strip
    decode; channels reports the palette-expanded count."""
    bo = _tiff_byte_order(content)
    tags, _ = _read_ifd(content, bo, int.from_bytes(content[4:8], bo))
    if 256 not in tags or 257 not in tags:
        raise ValueError("TIFF: missing dimensions")
    spp = tags.get(277, [1])[0]
    if tags.get(262, [1])[0] == 3:
        spp = 3  # palette expands to RGB
    return tags[256][0], tags[257][0], spp
