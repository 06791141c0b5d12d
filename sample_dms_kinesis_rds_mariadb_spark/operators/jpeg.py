"""Pure-Python JPEG decoder (ITU-T T.81) — stdlib + numpy only.

Closes the compressed-image boundary in ``operators/multimodal.py``:
decodes BASELINE/extended sequential (SOF0/1) and PROGRESSIVE (SOF2)
Huffman-coded JPEGs end-to-end — marker segments, DQT (8- and 16-bit
precision), DHT canonical Huffman tables (redefinable between scans),
DRI/RSTn restart intervals, 0xFF00 byte unstuffing, multi-scan frames
(spectral selection + successive approximation: DC/AC first and
refinement passes, EOB runs, the cross-block correction-bit protocol),
per-block dequantize → dezigzag → IDCT (vectorized numpy einsum over all
blocks at once), nearest-neighbor chroma upsampling for subsampled
components (4:2:0 / 4:2:2 / 4:4:4), and JFIF YCbCr→RGB.

Honest boundaries (raise ``NotImplementedError``): arithmetic coding
(SOF9+), lossless (SOF3), hierarchical/differential, and 12-bit
precision. Malformed streams raise ``ValueError``.

Scale note: this is the CORRECTNESS reference for the decode boundary —
entropy decode is a per-symbol Python loop (the IDCT and color transform
are vectorized), so throughput-critical 100-TB decode belongs in a native
library when one is available. The Spark-side plumbing
(``extract_image_features`` / ``resize_images`` ``mapInPandas`` dispatch)
is identical either way, which is the part that matters for the engine.

Verified in ``tests/test_jpeg.py`` and ``tests/test_jpeg_progressive.py``
against an INDEPENDENT spec-derived encoder (forward DCT + standard
Annex K tables, written against T.81, not against this decoder):
round-trip error bounds on random images, an EXACT flat-field
reconstruction, restart-marker pixel equality, and the central
progressive property — the progressive encoder frames the SAME quantized
coefficients as the baseline encoder, so decode must be BIT-IDENTICAL
across framings.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan position -> raster index within the 8x8 block (T.81 fig. 5)
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

# 8x8 DCT basis: M[u, x] = C(u)/2 * cos((2x+1) u pi / 16); inverse
# transform of a coefficient block F is M.T @ F @ M (T.81 A.3.3)
_M = np.zeros((8, 8))
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _M[_u, _x] = _c / 2.0 * np.cos((2 * _x + 1) * _u * np.pi / 16.0)

_SOF_MARKERS = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


class _Huff:
    """Canonical Huffman table: (length, code) -> value walk decode."""

    __slots__ = ("lut", "maxlen")

    def __init__(self, counts: list[int], values: bytes) -> None:
        self.lut: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        self.maxlen = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                if k >= len(values):
                    raise ValueError("DHT: fewer values than code counts")
                self.lut[(length, code)] = values[k]
                code += 1
                k += 1
                self.maxlen = length
            code <<= 1
        if k != len(values):
            raise ValueError("DHT: more values than code counts")


class _BitReader:
    """MSB-first bit reader over an UNSTUFFED entropy segment."""

    __slots__ = ("data", "pos", "buf", "n")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.buf = 0
        self.n = 0

    def read_bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy data")
            self.buf = self.data[self.pos]
            self.pos += 1
            self.n = 8
        self.n -= 1
        return (self.buf >> self.n) & 1

    def read_bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.read_bit()
        return v

    def decode(self, table: _Huff) -> int:
        code = 0
        for length in range(1, table.maxlen + 1):
            code = (code << 1) | self.read_bit()
            v = table.lut.get((length, code))
            if v is not None:
                return v
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    # T.81 F.2.2.1: low-magnitude codes are one's-complement negatives
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def parse_jpeg_header(content: bytes) -> tuple[int, int, int]:
    """(width, height, n_components) from the first SOFn — metadata-only
    parse, works for every JPEG flavor including progressive (the dims
    live in the frame header regardless of the coding process)."""
    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (bad SOI)")
    i = 2
    n = len(content)
    while i + 4 <= n:
        if content[i] != 0xFF:
            raise ValueError(f"JPEG: expected marker at offset {i}")
        marker = content[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:
            break
        seg_len = struct.unpack(">H", content[i + 2 : i + 4])[0]
        if seg_len < 2 or i + 2 + seg_len > n:
            raise ValueError("JPEG: truncated segment")
        if marker in _SOF_MARKERS:
            if seg_len < 8:
                raise ValueError("JPEG: SOF segment too short")
            height, width = struct.unpack(">HH", content[i + 5 : i + 9])
            nf = content[i + 9]
            if width == 0 or height == 0 or nf == 0:
                raise ValueError("JPEG: zero dimension in SOF")
            return width, height, nf
        i += 2 + seg_len
    raise ValueError("JPEG: no SOF frame header found")


def _entropy_segments(content: bytes, start: int) -> tuple[list[bytes], int]:
    """Unstuffed entropy data split at RSTn markers; returns (segments,
    offset of the terminating marker)."""
    segs: list[bytes] = []
    cur = bytearray()
    i = start
    n = len(content)
    while i < n:
        b = content[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = content[i + 1]
        if m == 0x00:  # stuffed data 0xFF
            cur.append(0xFF)
            i += 2
        elif m == 0xFF:  # fill byte
            i += 1
        elif 0xD0 <= m <= 0xD7:  # restart marker
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # EOI or the next real marker: scan data ends here
            break
    segs.append(bytes(cur))
    return segs, i


def _refine_nonzero(blk, z: int, bit: int, reader: "_BitReader") -> None:
    # correction bit for an already-visible coefficient (T.81 G.1.2.3):
    # magnitude gains `bit` when the stream says so and the bit isn't set
    if reader.read_bit():
        v = int(blk[z])
        if v & bit == 0:
            blk[z] = v + (bit if v > 0 else -bit)


def _decode_block_baseline(blk, reader, dc, ac, preds, ci) -> None:
    s = reader.decode(dc)
    if s > 11:
        raise ValueError(f"DC category {s} out of range")
    preds[ci] += _extend(reader.read_bits(s), s)
    blk[0] = preds[ci]
    k = 1
    while k < 64:
        rs = reader.decode(ac)
        r, size = rs >> 4, rs & 0x0F
        if size == 0:
            if r == 15:  # ZRL: 16 zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run overflows block")
        blk[ZIGZAG[k]] = _extend(reader.read_bits(size), size)
        k += 1


def _decode_block_ac_first(blk, reader, ac, ss, se, al, eobrun) -> None:
    if eobrun[0] > 0:
        eobrun[0] -= 1
        return
    k = ss
    while k <= se:
        rs = reader.decode(ac)
        r, size = rs >> 4, rs & 0x0F
        if size == 0:
            if r < 15:
                eobrun[0] = (1 << r) - 1
                if r:
                    eobrun[0] += reader.read_bits(r)
                break
            k += 16  # ZRL
        else:
            k += r
            if k > se:
                raise ValueError("AC run overflows spectral band")
            blk[ZIGZAG[k]] = _extend(reader.read_bits(size), size) << al
            k += 1


def _decode_block_ac_refine(blk, reader, ac, ss, se, al, eobrun) -> None:
    bit = 1 << al
    if eobrun[0] > 0:
        eobrun[0] -= 1
        for k in range(ss, se + 1):
            z = ZIGZAG[k]
            if blk[z] != 0:
                _refine_nonzero(blk, z, bit, reader)
        return
    k = ss
    while k <= se:
        rs = reader.decode(ac)
        r, size = rs >> 4, rs & 0x0F
        val = 0
        if size == 0:
            if r < 15:
                eobrun[0] = (1 << r) - 1
                if r:
                    eobrun[0] += reader.read_bits(r)
                r = 64  # EOB mid-block: refine the rest, then stop
            # r == 15: ZRL — pass over 16 zero-history slots
        else:
            if size != 1:
                raise ValueError("AC refinement magnitude must be 1")
            val = bit if reader.read_bit() else -bit
        while k <= se:
            z = ZIGZAG[k]
            if blk[z] != 0:
                _refine_nonzero(blk, z, bit, reader)
            else:
                if r == 0:
                    if val != 0:
                        blk[z] = val
                    k += 1
                    break
                r -= 1
            k += 1


def decode_jpeg(content: bytes) -> tuple[int, int, int, bytes]:
    """FULL pixel decode of a Huffman-coded JPEG — baseline/extended
    sequential (SOF0/1, single- or multi-scan) AND progressive (SOF2:
    spectral selection + successive approximation, DC/AC first and
    refinement scans, EOB runs, cross-block correction-bit protocol).

    Returns ``(width, height, channels, pixels)`` with ``pixels`` a
    row-major uint8 buffer — RGB for 3-component YCbCr frames, single
    plane for grayscale. See the module docstring for the remaining
    honest boundaries (arithmetic coding, lossless, hierarchical,
    12-bit).
    """
    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (bad SOI)")
    qtables: dict[int, np.ndarray] = {}      # id -> 64 raster-order values
    dc_tables: dict[int, _Huff] = {}
    ac_tables: dict[int, _Huff] = {}
    frame = None        # (width, height, [(cid, h, v, tq), ...])
    progressive = False
    restart_interval = 0
    coef: list[np.ndarray] = []   # per comp: (BY, BX, 64) raster-order ints
    geom = None         # (hmax, vmax, mcus_x, mcus_y, [(bw, bh)])
    saw_scan = False

    i = 2
    n = len(content)
    while i + 2 <= n:
        if content[i] != 0xFF:
            raise ValueError(f"JPEG: expected marker at offset {i}")
        marker = content[i + 1]
        if marker == 0xFF:
            i += 1
            continue
        if marker == 0xD9:
            break
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if i + 4 > n:
            raise ValueError("JPEG: truncated segment header")
        seg_len = struct.unpack(">H", content[i + 2 : i + 4])[0]
        seg = content[i + 4 : i + 2 + seg_len]
        if seg_len < 2 or len(seg) != seg_len - 2:
            raise ValueError("JPEG: truncated segment")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq not in (0, 1):
                    raise ValueError(f"DQT: bad precision {pq}")
                width_b = 2 if pq else 1
                if p + 64 * width_b > len(seg):
                    raise ValueError("DQT: truncated table")
                vals = [
                    int.from_bytes(seg[p + k * width_b : p + (k + 1) * width_b], "big")
                    for k in range(64)
                ]
                p += 64 * width_b
                # store raster-order (DQT is in zigzag order)
                raster = np.zeros(64, dtype=np.float64)
                for zz, v in enumerate(vals):
                    raster[ZIGZAG[zz]] = v
                qtables[tq] = raster
        elif marker == 0xC4:  # DHT — tables may be redefined between scans
            p = 0
            while p + 17 <= len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                counts = list(seg[p + 1 : p + 17])
                total = sum(counts)
                vals = seg[p + 17 : p + 17 + total]
                if len(vals) != total:
                    raise ValueError("DHT: truncated values")
                table = _Huff(counts, vals)
                (dc_tables if tc == 0 else ac_tables)[th] = table
                p += 17 + total
        elif marker == 0xDD:  # DRI
            if len(seg) < 2:
                raise ValueError("DRI: truncated")
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker in _SOF_MARKERS:
            if marker not in (0xC0, 0xC1, 0xC2):
                kind = {
                    0xC3: "lossless",
                    0xC5: "differential sequential",
                    0xC6: "differential progressive",
                    0xC7: "differential lossless",
                }.get(marker, "arithmetic-coded" if marker >= 0xC9 else "unknown")
                raise NotImplementedError(
                    f"JPEG {kind} (SOF{marker - 0xC0}) decode not supported — "
                    "Huffman sequential/progressive only"
                )
            progressive = marker == 0xC2
            precision = seg[0]
            if precision != 8:
                raise NotImplementedError(
                    f"{precision}-bit JPEG not supported (8-bit only)"
                )
            height, width = struct.unpack(">HH", seg[1:5])
            nf = seg[5]
            if width == 0 or height == 0:
                raise ValueError("JPEG: zero dimension in SOF")
            if nf not in (1, 3):
                raise NotImplementedError(
                    f"{nf}-component JPEG not supported (grayscale/YCbCr only)"
                )
            comps = []
            for c in range(nf):
                cid = seg[6 + c * 3]
                hv = seg[7 + c * 3]
                comps.append((cid, hv >> 4, hv & 0x0F, seg[8 + c * 3]))
            frame = (width, height, comps)
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            for _, h, v, _ in comps:
                if h < 1 or v < 1 or hmax % h or vmax % v:
                    raise NotImplementedError(
                        f"unsupported sampling factors h={h} v={v} "
                        "(must divide max)"
                    )
            mcus_x = -(-width // (8 * hmax))
            mcus_y = -(-height // (8 * vmax))
            dims = []
            coef = []
            for _, ch, cv, _tq in comps:
                # true block grid (ceil of the component's sample dims);
                # the ALLOCATION is the MCU-padded grid interleaved scans
                # cover
                comp_w = -(-width * ch // hmax)
                comp_h = -(-height * cv // vmax)
                bw = -(-comp_w // 8)
                bh = -(-comp_h // 8)
                dims.append((bw, bh))
                coef.append(
                    np.zeros((mcus_y * cv, mcus_x * ch, 64), dtype=np.int64)
                )
            geom = (hmax, vmax, mcus_x, mcus_y, dims)
        elif marker == 0xDA:  # SOS: decode this scan's entropy data now
            if frame is None:
                raise ValueError("JPEG: SOS before SOF")
            width, height, comps = frame
            hmax, vmax, mcus_x, mcus_y, dims = geom
            ns = seg[0]
            if len(seg) < 1 + 2 * ns + 3:
                raise ValueError("SOS: truncated scan header")
            scan_comps = []
            for c in range(ns):
                cs = seg[1 + c * 2]
                tt = seg[2 + c * 2]
                idx = next(
                    (k for k, fc in enumerate(comps) if fc[0] == cs), None
                )
                if idx is None:
                    raise ValueError(f"SOS references unknown component {cs}")
                scan_comps.append((idx, tt >> 4, tt & 0x0F))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah_al = seg[3 + 2 * ns]
            ah, al = ah_al >> 4, ah_al & 0x0F
            if se > 63 or ss > se:
                raise ValueError(f"SOS: bad spectral range {ss}..{se}")
            if not progressive and (ss, se, ah, al) != (0, 63, 0, 0):
                raise ValueError("sequential scan carries progressive params")
            if progressive and ss == 0 and se != 0:
                raise ValueError("progressive scan mixes DC and AC")
            if progressive and ss > 0 and ns != 1:
                raise ValueError("progressive AC scan must be single-component")

            segments, end = _entropy_segments(content, i + 2 + seg_len)
            preds = [0] * len(comps)
            eobrun = [0]

            # resolve the tables this scan actually uses
            use = []
            for ci, td, ta in scan_comps:
                dc = ac = None
                if ss == 0 and (not progressive or ah == 0):
                    dc = dc_tables.get(td)
                    if dc is None:
                        raise ValueError("SOS references missing DC table")
                if not progressive or ss > 0:
                    ac = ac_tables.get(ta)
                    if ac is None:
                        raise ValueError("SOS references missing AC table")
                use.append((ci, dc, ac))

            # multi-component scans interleave by MCU; single-component
            # scans are non-interleaved by definition (T.81) and walk the
            # component's TRUE block grid, not the MCU-padded one
            interleaved = ns > 1
            if interleaved:
                n_units = mcus_x * mcus_y
            else:
                bw, bh = dims[scan_comps[0][0]]
                n_units = bw * bh

            seg_idx = 0
            reader = _BitReader(segments[0])
            for u in range(n_units):
                if restart_interval and u and u % restart_interval == 0:
                    seg_idx += 1
                    if seg_idx >= len(segments):
                        raise ValueError("JPEG: missing restart segment")
                    reader = _BitReader(segments[seg_idx])
                    preds = [0] * len(comps)
                    eobrun[0] = 0
                if interleaved:
                    my, mx = divmod(u, mcus_x)
                    for (ci, dc, ac) in use:
                        _, ch, cv, _tq = comps[ci]
                        for v in range(cv):
                            for h in range(ch):
                                blk = coef[ci][my * cv + v, mx * ch + h]
                                if not progressive:
                                    _decode_block_baseline(
                                        blk, reader, dc, ac, preds, ci
                                    )
                                elif ah == 0:  # DC first
                                    sz = reader.decode(dc)
                                    if sz > 11:
                                        raise ValueError(
                                            f"DC category {sz} out of range"
                                        )
                                    preds[ci] += _extend(
                                        reader.read_bits(sz), sz
                                    )
                                    blk[0] = preds[ci] << al
                                else:  # DC refinement: one raw bit
                                    if reader.read_bit():
                                        blk[0] = int(blk[0]) | (1 << al)
                else:
                    ci, dc, ac = use[0]
                    by, bx = divmod(u, dims[ci][0])
                    blk = coef[ci][by, bx]
                    if not progressive:
                        _decode_block_baseline(blk, reader, dc, ac, preds, ci)
                    elif ss == 0 and ah == 0:
                        sz = reader.decode(dc)
                        if sz > 11:
                            raise ValueError(f"DC category {sz} out of range")
                        preds[ci] += _extend(reader.read_bits(sz), sz)
                        blk[0] = preds[ci] << al
                    elif ss == 0:
                        if reader.read_bit():
                            blk[0] = int(blk[0]) | (1 << al)
                    elif ah == 0:
                        _decode_block_ac_first(
                            blk, reader, ac, ss, se, al, eobrun
                        )
                    else:
                        _decode_block_ac_refine(
                            blk, reader, ac, ss, se, al, eobrun
                        )
            saw_scan = True
            i = end
            continue
        # APPn / COM / DNL etc.: skip
        i += 2 + seg_len

    if frame is None or not saw_scan:
        raise ValueError("JPEG: missing SOF or SOS")
    width, height, comps = frame
    hmax, vmax, mcus_x, mcus_y, dims = geom

    # dequantize + IDCT every block of each component at once, assemble
    planes = []
    for ci, (_, ch, cv, tq) in enumerate(comps):
        if tq not in qtables:
            raise ValueError(f"SOF references missing quant table {tq}")
        by_n, bx_n = mcus_y * cv, mcus_x * ch
        arr = coef[ci].astype(np.float64) * qtables[tq][None, None, :]
        blocks = arr.reshape(by_n * bx_n, 8, 8)
        pixels = np.einsum("ux,nuv,vy->nxy", _M, blocks, _M, optimize=True)
        pixels = np.clip(np.round(pixels + 128.0), 0, 255)
        plane = (
            pixels.reshape(by_n, bx_n, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(by_n * 8, bx_n * 8)
        )
        # upsample subsampled chroma by replication, crop to frame dims
        if ch != hmax or cv != vmax:
            plane = np.repeat(np.repeat(plane, vmax // cv, 0), hmax // ch, 1)
        planes.append(plane[:height, :width])

    if len(planes) == 1:
        return width, height, 1, planes[0].astype(np.uint8).tobytes()

    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack(
        [np.clip(np.round(p), 0, 255) for p in (r, g, b)], axis=-1
    ).astype(np.uint8)
    return width, height, 3, rgb.tobytes()
