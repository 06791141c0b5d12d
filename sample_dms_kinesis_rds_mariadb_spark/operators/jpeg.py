"""Pure-Python baseline JPEG decoder (ITU-T T.81) — stdlib + numpy only.

Closes the last compressed-image boundary in ``operators/multimodal.py``:
``decode_image`` previously parsed PNM/BMP/PNG for real and raised
``NotImplementedError`` for JPEG. This module decodes BASELINE sequential
DCT JPEGs (SOF0, and SOF1 extended-sequential — the overwhelming share of
real-world JPEG/JFIF files) end-to-end: marker segments, DQT (8- and
16-bit precision), DHT canonical Huffman tables, DRI/RSTn restart
intervals, interleaved single-scan entropy data with 0xFF00 byte
unstuffing, per-block dequantize → dezigzag → IDCT (vectorized numpy
einsum over all blocks at once), nearest-neighbor chroma upsampling for
subsampled components (4:2:0 / 4:2:2 / 4:4:4), and JFIF YCbCr→RGB.

Honest boundaries (raise ``NotImplementedError``): progressive (SOF2),
arithmetic coding (SOF9+), hierarchical, 12-bit precision, and
non-interleaved multi-scan files. Malformed streams raise ``ValueError``.

Scale note: this is the CORRECTNESS reference for the decode boundary —
entropy decode is a per-symbol Python loop (the IDCT and color transform
are vectorized), so throughput-critical 100-TB decode belongs in a native
library when one is available. The Spark-side plumbing
(``extract_image_features`` / ``resize_images`` ``mapInPandas`` dispatch)
is identical either way, which is the part that matters for the engine.

Verified in ``tests/test_jpeg.py`` against an INDEPENDENT spec-derived
encoder (forward DCT + standard Annex K tables, written against T.81, not
against this decoder): round-trip error bounds on random images, an
EXACT flat-field reconstruction, restart-marker pixel equality vs the
unrestarted encoding, and subsampling layouts.
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
_BASELINE_SOFS = {0xC0, 0xC1}  # huffman sequential (incl. extended)


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


def decode_jpeg(content: bytes) -> tuple[int, int, int, bytes]:
    """FULL pixel decode of a baseline JPEG.

    Returns ``(width, height, channels, pixels)`` with ``pixels`` a
    row-major uint8 buffer — RGB for 3-component YCbCr frames, single
    plane for grayscale. See the module docstring for supported layouts.
    """
    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (bad SOI)")
    qtables: dict[int, np.ndarray] = {}      # id -> 64 raster-order values
    dc_tables: dict[int, _Huff] = {}
    ac_tables: dict[int, _Huff] = {}
    frame = None        # (width, height, [(cid, h, v, tq), ...])
    restart_interval = 0
    scan = None         # ([(comp_idx, td, ta), ...], data_start)

    i = 2
    n = len(content)
    while i + 4 <= n:
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
        elif marker == 0xC4:  # DHT
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
            if marker not in _BASELINE_SOFS:
                kind = {
                    0xC2: "progressive",
                    0xC3: "lossless",
                    0xC5: "differential sequential",
                    0xC6: "differential progressive",
                    0xC7: "differential lossless",
                }.get(marker, "arithmetic-coded" if marker >= 0xC9 else "unknown")
                raise NotImplementedError(
                    f"JPEG {kind} (SOF{marker - 0xC0}) decode not supported — "
                    "baseline/extended sequential Huffman only"
                )
            precision = seg[0]
            if precision != 8:
                raise NotImplementedError(
                    f"{precision}-bit JPEG not supported (8-bit baseline only)"
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
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG: SOS before SOF")
            ns = seg[0]
            if ns != len(frame[2]):
                raise NotImplementedError(
                    "non-interleaved multi-scan JPEG not supported"
                )
            scan_comps = []
            for c in range(ns):
                cs = seg[1 + c * 2]
                tt = seg[2 + c * 2]
                idx = next(
                    (k for k, fc in enumerate(frame[2]) if fc[0] == cs), None
                )
                if idx is None:
                    raise ValueError(f"SOS references unknown component {cs}")
                scan_comps.append((idx, tt >> 4, tt & 0x0F))
            scan = (scan_comps, i + 2 + seg_len)
            break  # entropy data follows; single-scan decode
        # APPn / COM / DNL etc.: skip
        i += 2 + seg_len

    if frame is None or scan is None:
        raise ValueError("JPEG: missing SOF or SOS")
    width, height, comps = frame
    scan_comps, data_start = scan

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    for _, h, v, _ in comps:
        if h < 1 or v < 1 or hmax % h or vmax % v:
            raise NotImplementedError(
                f"unsupported sampling factors h={h} v={v} (must divide max)"
            )
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))

    segments, _end = _entropy_segments(content, data_start)

    # entropy decode: per-component coefficient stacks + block coordinates
    coefs: list[list[np.ndarray]] = [[] for _ in comps]
    positions: list[list[tuple[int, int]]] = [[] for _ in comps]
    preds = [0] * len(comps)
    seg_idx = 0
    reader = _BitReader(segments[0])
    for mcu in range(mcus_x * mcus_y):
        if restart_interval and mcu and mcu % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ValueError("JPEG: missing restart segment")
            reader = _BitReader(segments[seg_idx])
            preds = [0] * len(comps)
        my, mx = divmod(mcu, mcus_x)
        for comp_idx, td, ta in scan_comps:
            _, ch, cv, tq = comps[comp_idx]
            if tq not in qtables:
                raise ValueError(f"SOF references missing quant table {tq}")
            dc = dc_tables.get(td)
            ac = ac_tables.get(ta)
            if dc is None or ac is None:
                raise ValueError("SOS references missing Huffman table")
            for v in range(cv):
                for h in range(ch):
                    block = np.zeros(64, dtype=np.int32)
                    s = reader.decode(dc)
                    if s > 11:
                        raise ValueError(f"DC category {s} out of range")
                    diff = _extend(reader.read_bits(s), s)
                    preds[comp_idx] += diff
                    block[0] = preds[comp_idx]
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
                        block[ZIGZAG[k]] = _extend(reader.read_bits(size), size)
                        k += 1
                    coefs[comp_idx].append(block)
                    positions[comp_idx].append((my * cv + v, mx * ch + h))

    # dequantize + IDCT all blocks of each component at once, assemble
    planes = []
    for comp_idx, (_, ch, cv, tq) in enumerate(comps):
        blocks = np.stack(coefs[comp_idx]).astype(np.float64)  # (nb, 64)
        blocks *= qtables[tq][None, :]
        blocks = blocks.reshape(-1, 8, 8)
        pixels = np.einsum("ux,nuv,vy->nxy", _M, blocks, _M, optimize=True)
        pixels = np.clip(np.round(pixels + 128.0), 0, 255)
        by_n, bx_n = mcus_y * cv, mcus_x * ch
        plane4 = np.zeros((by_n, bx_n, 8, 8))
        pos = np.asarray(positions[comp_idx])
        plane4[pos[:, 0], pos[:, 1]] = pixels
        plane = plane4.transpose(0, 2, 1, 3).reshape(by_n * 8, bx_n * 8)
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
