"""Independent baseline JPEG ENCODER for decoder round-trip tests.

Written against ITU-T T.81 directly (forward DCT + quantize + zigzag +
Annex K standard Huffman tables + byte stuffing + markers), NOT against
the decoder under test — the two sides share only the published spec, so
round-trip agreement on random inputs is evidence both are correct
(independent errors would not cancel).

Supports grayscale, YCbCr 4:4:4 and 4:2:0, quality scaling (IJG
convention), DRI/RSTn restart intervals, and PROGRESSIVE framing
(``encode_jpeg_progressive``: spectral selection + successive
approximation over the same quantized coefficients, so cross-framing
decode equality is a bit-exact oracle).
"""

from __future__ import annotations

import struct

import numpy as np

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

# Annex K.1/K.2 base quantization tables (raster order)
STD_LUM_Q = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
])
STD_CHROM_Q = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
])

# Annex K.3 standard Huffman tables: (BITS counts, HUFFVAL)
DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
DC_CHROM = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

_MF = np.zeros((8, 8))
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _MF[_u, _x] = _c / 2.0 * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _build_codes(bits, vals):
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, length, code):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def pad_to_byte(self):
        while self.n:
            self.write(1, 1)  # pad with 1-bits (T.81 F.1.2.3)


def _scale_q(base, quality):
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _pad_replicate(plane, mult):
    h, w = plane.shape
    ph = -(-h // mult) * mult
    pw = -(-w // mult) * mult
    out = np.empty((ph, pw), dtype=plane.dtype)
    out[:h, :w] = plane
    out[h:, :w] = plane[-1:, :]
    out[:h, w:] = plane[:, -1:]
    out[h:, w:] = plane[-1, -1]
    return out


def _fdct_quant(plane, q):
    """Plane (multiple of 8) -> quantized zigzag coefficients per block,
    in raster block order: (blocks_y, blocks_x, 64)."""
    by, bx = plane.shape[0] // 8, plane.shape[1] // 8
    blocks = plane.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3).astype(np.float64)
    blocks -= 128.0
    coef = np.einsum("ux,yzxw,vw->yzuv", _MF, blocks, _MF, optimize=True)
    qraster = np.rint(coef.reshape(by, bx, 64) / q[None, None, :]).astype(np.int64)
    return qraster[:, :, ZIGZAG]


def _cat(v):
    return int(abs(v)).bit_length()


def _encode_block(bw, zz, pred, dc_codes, ac_codes):
    diff = int(zz[0]) - pred
    s = _cat(diff)
    bw.write(*dc_codes[s])
    if s:
        bits = diff if diff >= 0 else diff + (1 << s) - 1
        bw.write(s, bits & ((1 << s) - 1))
    run = 0
    last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            bw.write(*ac_codes[0xF0])  # ZRL
            run -= 16
        s = _cat(v)
        bw.write(*ac_codes[(run << 4) | s])
        bits = v if v >= 0 else v + (1 << s) - 1
        bw.write(s, bits & ((1 << s) - 1))
        run = 0
    if last_nz < 63:
        bw.write(*ac_codes[0x00])  # EOB
    return int(zz[0])


def _seg(marker, payload):
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _dqt(tq, q):
    zz = bytes(int(q[ZIGZAG[k]]) for k in range(64))
    return _seg(0xDB, bytes([tq]) + zz)


def _dht(tc, th, bits, vals):
    return _seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))


def _prepare_coefficients(pixels, quality, subsampling):
    """Shared front half of baseline and progressive encoding: color
    transform, subsampling, padding, FDCT, quantization. Returns
    (gray, h, w, comps, coef, lum_q, chrom_q, hmax, vmax, mcus_x, mcus_y)
    with coef[k] the (blocks_y, blocks_x, 64) zigzag-ordered quantized
    coefficients of component k over the MCU-padded grid."""
    pixels = np.asarray(pixels, dtype=np.float64)
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    lum_q = _scale_q(STD_LUM_Q, quality)
    chrom_q = _scale_q(STD_CHROM_Q, quality)

    if gray:
        comps = [(1, 1, 1, 0)]  # (cid, hs, vs, tq)
        planes = [pixels]
        hmax = vmax = 1
    else:
        r, g, b = pixels[..., 0], pixels[..., 1], pixels[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsampling == "4:2:0":
            comps = [(1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
            hmax = vmax = 2
            yp = _pad_replicate(y, 16)
            cb = _pad_replicate(cb, 16)
            cr = _pad_replicate(cr, 16)
            # 2x2 box average
            cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2).mean((1, 3))
            cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2).mean((1, 3))
            planes = [yp, cb, cr]
        elif subsampling == "4:2:2":
            comps = [(1, 2, 1, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
            hmax, vmax = 2, 1
            # MCUs are 16 wide x 8 tall: pad rows to 8, columns to 16
            ph = -(-h // 8) * 8
            pw = -(-w // 16) * 16

            def _pad2(pl):
                return np.pad(
                    pl, ((0, ph - pl.shape[0]), (0, pw - pl.shape[1])),
                    mode="edge",
                )

            yp, cb, cr = _pad2(y), _pad2(cb), _pad2(cr)
            # horizontal-only 2x1 box average
            cb = cb.reshape(cb.shape[0], cb.shape[1] // 2, 2).mean(2)
            cr = cr.reshape(cr.shape[0], cr.shape[1] // 2, 2).mean(2)
            planes = [yp, cb, cr]
        elif subsampling == "4:4:4":
            comps = [(1, 1, 1, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
            hmax = vmax = 1
            planes = [y, cb, cr]
        else:
            raise ValueError(f"unsupported subsampling {subsampling}")

    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    qmap = {0: lum_q, 1: chrom_q}
    coef = []
    for (cid, hs, vs, tq), plane in zip(comps, planes):
        need_y, need_x = mcus_y * vs * 8, mcus_x * hs * 8
        plane = np.pad(
            plane,
            ((0, need_y - plane.shape[0]), (0, need_x - plane.shape[1])),
            mode="edge",
        )
        coef.append(_fdct_quant(plane, qmap[tq].astype(np.float64)))
    return gray, h, w, comps, coef, lum_q, chrom_q, hmax, vmax, mcus_x, mcus_y


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 90,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """Encode an (h, w) grayscale or (h, w, 3) RGB uint8 array as a
    baseline JFIF JPEG."""
    (gray, h, w, comps, coef, lum_q, chrom_q,
     hmax, vmax, mcus_x, mcus_y) = _prepare_coefficients(
        pixels, quality, subsampling
    )

    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _dqt(0, lum_q)
    if not gray:
        out += _dqt(1, chrom_q)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for cid, hs, vs, tq in comps:
        sof += bytes([cid, (hs << 4) | vs, tq])
    out += _seg(0xC0, sof)
    out += _dht(0, 0, *DC_LUM)
    out += _dht(1, 0, *AC_LUM)
    if not gray:
        out += _dht(0, 1, *DC_CHROM)
        out += _dht(1, 1, *AC_CHROM)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(comps)])
    for k, (cid, _, _, _) in enumerate(comps):
        table = 0 if k == 0 else 1
        sos += bytes([cid, (table << 4) | table])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    dc_lum_codes = _build_codes(*DC_LUM)
    ac_lum_codes = _build_codes(*AC_LUM)
    dc_chrom_codes = _build_codes(*DC_CHROM)
    ac_chrom_codes = _build_codes(*AC_CHROM)
    bw = _BitWriter()
    preds = [0] * len(comps)
    rst = 0
    for mcu in range(mcus_x * mcus_y):
        if restart_interval and mcu and mcu % restart_interval == 0:
            bw.pad_to_byte()
            bw.out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) % 8
            preds = [0] * len(comps)
        my, mx = divmod(mcu, mcus_x)
        for k, (cid, hs, vs, tq) in enumerate(comps):
            dc_codes = dc_lum_codes if k == 0 else dc_chrom_codes
            ac_codes = ac_lum_codes if k == 0 else ac_chrom_codes
            for v in range(vs):
                for hh in range(hs):
                    zz = coef[k][my * vs + v, mx * hs + hh]
                    preds[k] = _encode_block(bw, zz, preds[k], dc_codes, ac_codes)
    bw.pad_to_byte()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# flat AC table holding ALL 256 symbols (255 at length 9 + 1 at length
# 10 — a DHT count byte maxes at 255) — progressive AC scans emit EOBn
# symbols (0x10..0xE0) the standard Annex K tables don't contain
AC_FLAT = ([0] * 8 + [255, 1] + [0] * 6, list(range(256)))


class _ProgState:
    """Per-scan progressive entropy state: pending EOB run + TWO
    correction-bit buffers (the T.81 G.1.2.3 / libjpeg protocol): ``be``
    holds bits of blocks already absorbed into the pending EOB run —
    they flush right after the EOBn symbol; ``br`` holds the CURRENT
    block's bits — they flush only after this block's own next symbol
    (ZRL or newly-nonzero code), never with the EOBn. Conflating the two
    puts current-block bits before the block's first symbol, which a
    decoder then reads as Huffman garbage."""

    def __init__(self, bw, ac_codes):
        self.bw = bw
        self.ac = ac_codes
        self.eobrun = 0
        self.be = []   # correction bits of EOB-run-absorbed blocks
        self.br = []   # correction bits of the block being encoded

    def flush_br(self):
        for b in self.br:
            self.bw.write(1, b)
        self.br = []

    def emit_eobrun(self):
        if self.eobrun > 0:
            r = self.eobrun.bit_length() - 1
            self.bw.write(*self.ac[r << 4])
            if r:
                self.bw.write(r, self.eobrun - (1 << r))
            self.eobrun = 0
            for b in self.be:
                self.bw.write(1, b)
            self.be = []

    def end_of_block(self):
        self.eobrun += 1
        self.be += self.br
        self.br = []
        if self.eobrun == 0x7FFF:
            self.emit_eobrun()


def _ac_first_block(ps, zz, ss, se, al):
    r = 0
    for k in range(ss, se + 1):
        v = int(zz[k])
        t = abs(v) >> al
        if t == 0:
            r += 1
            continue
        ps.emit_eobrun()
        while r > 15:
            ps.bw.write(*ps.ac[0xF0])
            r -= 16
        s = t.bit_length()
        ps.bw.write(*ps.ac[(r << 4) | s])
        ps.bw.write(s, t if v > 0 else ((1 << s) - 1 - t))
        r = 0
    if r > 0:
        ps.end_of_block()


def _ac_refine_block(ps, zz, ss, se, al):
    # last newly-visible position: ZRLs may only be emitted inside this
    # span — past it, zeros and correction bits fold into the EOB run
    eob_pos = ss - 1
    for k in range(ss, se + 1):
        if (abs(int(zz[k])) >> al) == 1:
            eob_pos = k
    r = 0
    for k in range(ss, se + 1):
        v = int(zz[k])
        t = abs(v) >> al
        if t == 0:
            r += 1
            continue
        # ANY nonzero settles pending ZRLs first (libjpeg ordering: the
        # buffered bits may not span a ZRL boundary on the wire)
        while r > 15 and k <= eob_pos:
            ps.emit_eobrun()
            ps.bw.write(*ps.ac[0xF0])
            r -= 16
            ps.flush_br()
        if t > 1:
            # already visible: buffer its correction bit (LSB of the
            # shifted magnitude); does NOT break the zero-history run
            ps.br.append(t & 1)
            continue
        # t == 1: newly visible in this scan
        ps.emit_eobrun()
        ps.bw.write(*ps.ac[(r << 4) | 1])
        ps.bw.write(1, 1 if v > 0 else 0)
        ps.flush_br()
        r = 0
    if r > 0 or ps.br:
        ps.end_of_block()


# default scan scripts: interleaved DC first + refine, per-component
# spectral bands, two successive-approximation levels
PROGRESSIVE_SCRIPT_GRAY = (
    ((0,), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((0,), 6, 63, 0, 2),
    ((0,), 0, 0, 1, 0),
    ((0,), 1, 63, 2, 1),
    ((0,), 1, 63, 1, 0),
)

PROGRESSIVE_SCRIPT_COLOR = (
    ((0, 1, 2), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((2,), 1, 63, 0, 1),
    ((1,), 1, 63, 0, 1),
    ((0,), 6, 63, 0, 2),
    ((0, 1, 2), 0, 0, 1, 0),
    ((0,), 1, 63, 2, 1),
    ((2,), 1, 63, 1, 0),
    ((1,), 1, 63, 1, 0),
    ((0,), 1, 63, 1, 0),
)


def encode_jpeg_progressive(
    pixels: np.ndarray,
    quality: int = 90,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
    script=None,
) -> bytes:
    """Encode as PROGRESSIVE JPEG (SOF2): spectral selection + successive
    approximation over the SAME quantized coefficients the baseline
    encoder writes, so a correct decoder must reconstruct bit-identical
    pixels from both framings. ``script`` entries are
    (component_indices, Ss, Se, Ah, Al)."""
    (gray, h, w, comps, coef, lum_q, chrom_q,
     hmax, vmax, mcus_x, mcus_y) = _prepare_coefficients(
        pixels, quality, subsampling
    )
    if script is None:
        script = PROGRESSIVE_SCRIPT_GRAY if gray else PROGRESSIVE_SCRIPT_COLOR

    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _dqt(0, lum_q)
    if not gray:
        out += _dqt(1, chrom_q)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for cid, hs, vs, tq in comps:
        sof += bytes([cid, (hs << 4) | vs, tq])
    out += _seg(0xC2, sof)
    out += _dht(0, 0, *DC_LUM)
    out += _dht(1, 0, *AC_FLAT)
    if not gray:
        out += _dht(0, 1, *DC_CHROM)
        out += _dht(1, 1, *AC_FLAT)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))

    dc_codes = {0: _build_codes(*DC_LUM), 1: _build_codes(*DC_CHROM)}
    ac_flat_codes = _build_codes(*AC_FLAT)

    for comp_ids, ss, se, ah, al in script:
        ns = len(comp_ids)
        sos = bytes([ns])
        for ci in comp_ids:
            table = 0 if ci == 0 else 1
            sos += bytes([comps[ci][0], (table << 4) | table])
        sos += bytes([ss, se, (ah << 4) | al])
        out += _seg(0xDA, sos)

        bw = _BitWriter()
        ps = _ProgState(bw, ac_flat_codes)
        preds = {ci: 0 for ci in comp_ids}
        rst = 0
        interleaved = ns > 1
        if interleaved:
            n_units = mcus_x * mcus_y
        else:
            ci0 = comp_ids[0]
            _, hs, vs, _ = comps[ci0]
            bw_blocks = -(--(-w * hs // hmax) // 8)
            comp_w = -(-w * hs // hmax)
            comp_h = -(-h * vs // vmax)
            bw_blocks = -(-comp_w // 8)
            bh_blocks = -(-comp_h // 8)
            n_units = bw_blocks * bh_blocks

        def emit_dc(ci, zz):
            dc = int(zz[0])
            if ah == 0:  # DC first: diff-code the point-transformed DC
                diff = (dc >> al) - preds[ci]
                preds[ci] = dc >> al
                s = abs(diff).bit_length()
                bw.write(*dc_codes[0 if ci == 0 else 1][s])
                if s:
                    bits = diff if diff >= 0 else diff + (1 << s) - 1
                    bw.write(s, bits & ((1 << s) - 1))
            else:  # DC refinement: one raw bit, no Huffman
                bw.write(1, (dc >> al) & 1)

        for u in range(n_units):
            if restart_interval and u and u % restart_interval == 0:
                ps.emit_eobrun()
                bw.pad_to_byte()
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                for ci in preds:
                    preds[ci] = 0
            if interleaved:
                my, mx = divmod(u, mcus_x)
                for ci in comp_ids:
                    _, hs, vs, _ = comps[ci]
                    for v in range(vs):
                        for hh in range(hs):
                            emit_dc(ci, coef[ci][my * vs + v, mx * hs + hh])
            else:
                by, bx = divmod(u, bw_blocks)
                zz = coef[comp_ids[0]][by, bx]
                if ss == 0:
                    emit_dc(comp_ids[0], zz)
                elif ah == 0:
                    _ac_first_block(ps, zz, ss, se, al)
                else:
                    _ac_refine_block(ps, zz, ss, se, al)
        ps.emit_eobrun()
        bw.pad_to_byte()
        out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_multiscan(
    pixels: np.ndarray, quality: int = 90, subsampling: str = "4:4:4"
) -> bytes:
    """BASELINE (SOF0) but NON-INTERLEAVED: one full-band Ns=1 scan per
    component (T.81 allows it; rare but legal) — same quantized
    coefficients as encode_jpeg, so decode must be pixel-identical."""
    (gray, h, w, comps, coef, lum_q, chrom_q,
     hmax, vmax, mcus_x, mcus_y) = _prepare_coefficients(
        pixels, quality, subsampling
    )
    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _dqt(0, lum_q)
    if not gray:
        out += _dqt(1, chrom_q)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for cid, hs, vs, tq in comps:
        sof += bytes([cid, (hs << 4) | vs, tq])
    out += _seg(0xC0, sof)
    out += _dht(0, 0, *DC_LUM)
    out += _dht(1, 0, *AC_LUM)
    if not gray:
        out += _dht(0, 1, *DC_CHROM)
        out += _dht(1, 1, *AC_CHROM)
    for ci, (cid, hs, vs, tq) in enumerate(comps):
        table = 0 if ci == 0 else 1
        out += _seg(0xDA, bytes([1, cid, (table << 4) | table, 0, 63, 0]))
        dc_codes = _build_codes(*(DC_LUM if ci == 0 else DC_CHROM))
        ac_codes = _build_codes(*(AC_LUM if ci == 0 else AC_CHROM))
        bw = _BitWriter()
        # non-interleaved scans walk the component's TRUE block grid
        comp_w = -(-w * hs // hmax)
        comp_h = -(-h * vs // vmax)
        bw_blocks = -(-comp_w // 8)
        bh_blocks = -(-comp_h // 8)
        pred = 0
        for by in range(bh_blocks):
            for bx in range(bw_blocks):
                pred = _encode_block(
                    bw, coef[ci][by, bx], pred, dc_codes, ac_codes
                )
        bw.pad_to_byte()
        out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
