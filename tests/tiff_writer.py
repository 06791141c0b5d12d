"""Independent baseline TIFF writer for decoder tests — composed from the
TIFF 6.0 specification (IFD layout, strip tags, PackBits, TIFF-flavor
LZW with MSB-first packing and EARLY width change, Predictor 2), NOT
from the decoder under test. Lossless, so parity is exact-byte."""

from __future__ import annotations

import numpy as np


def _packbits(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out.append(257 - run)
            out.append(data[i])
            i += run
            continue
        lit_start = i
        i += 1
        while (
            i < n
            and i - lit_start < 128
            and not (i + 1 < n and data[i] == data[i + 1])
        ):
            i += 1
        out.append(i - lit_start - 1)
        out += data[lit_start:i]
    return bytes(out)


class _TiffLZW:
    """TIFF-flavor LZW compressor: MSB-first packing, CLEAR=256, EOI=257,
    EARLY width change (post-emit, when next_code == 2^w - 1)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0
        self._reset()

    def _reset(self):
        self.table = {bytes([i]): i for i in range(256)}
        self.next_code = 258
        self.code_size = 9

    def _emit(self, code: int):
        self.acc = (self.acc << self.code_size) | code
        self.nbits += self.code_size
        while self.nbits >= 8:
            self.out.append((self.acc >> (self.nbits - 8)) & 0xFF)
            self.nbits -= 8

    def compress(self, data: bytes) -> bytes:
        self._emit(256)  # CLEAR
        buf = b""
        for b in data:
            cand = buf + bytes([b])
            if cand in self.table:
                buf = cand
                continue
            self._emit(self.table[buf])
            # EARLY change: widen post-emit one code sooner than GIF
            if (
                self.next_code == (1 << self.code_size) - 1
                and self.code_size < 12
            ):
                self.code_size += 1
            if self.next_code >= 4094:
                self._emit(256)
                self._reset()
            else:
                self.table[cand] = self.next_code
                self.next_code += 1
            buf = bytes([b])
        if buf:
            self._emit(self.table[buf])
        self._emit(257)  # EOI
        if self.nbits:
            self.out.append((self.acc << (8 - self.nbits)) & 0xFF)
        return bytes(self.out)


def write_tiff(
    pixels: np.ndarray,
    compression: int = 1,
    predictor: int = 1,
    photometric: int | None = None,
    colormap: list[int] | None = None,
    rows_per_strip: int | None = None,
    big_endian: bool = False,
    extra_entries: list | None = None,
    planar: int = 1,
    tile: tuple | None = None,
    jpegtables: bool = False,
) -> bytes:
    """Minimal single-IFD TIFF: ``pixels`` is (h, w) gray / palette
    indices or (h, w, c) with c in (3, 4). compression: 1 none,
    5 LZW, 32773 PackBits, 8 Deflate. planar=2 writes plane-by-plane
    strips (all strips of channel 0, then 1, ...). ``tile=(tw, tl)``
    writes the TIFF 6.0 §15 tiled layout instead of strips — tags
    322/323/324/325, right/bottom tiles padded to full size,
    plane-major tile order for planar=2."""
    pixels = np.asarray(pixels)
    wide = pixels.dtype == np.uint16
    if not wide:
        pixels = pixels.astype(np.uint8)
    h, w = pixels.shape[:2]
    spp = 1 if pixels.ndim == 2 else pixels.shape[2]
    if photometric is None:
        photometric = 1 if spp == 1 else 2
    bo = "big" if big_endian else "little"
    sdt = np.dtype(("<u2" if bo == "little" else ">u2") if wide
                   else "u1")
    pixels = pixels.astype(sdt)
    mod = 65536 if wide else 256
    rps = rows_per_strip or h
    flat = pixels.reshape(h, w * spp)

    def enc_strip(rows: np.ndarray) -> bytes:
        data = rows
        if predictor == 2:
            r3 = rows.reshape(rows.shape[0], w, spp).astype(np.int64)
            diff = r3.copy()
            diff[:, 1:, :] = (r3[:, 1:, :] - r3[:, :-1, :]) % mod
            data = diff.astype(sdt).reshape(rows.shape[0], w * spp)
        raw = data.tobytes()
        if compression == 1:
            return raw
        if compression == 32773:
            # PackBits operates per ROW per spec
            stride = w * spp * (2 if wide else 1)
            return b"".join(
                _packbits(raw[i : i + stride])
                for i in range(0, len(raw), stride)
            )
        if compression == 5:
            return _TiffLZW().compress(raw)
        if compression == 8:
            import zlib

            return zlib.compress(raw, 6)
        raise ValueError(compression)

    if compression == 7:
        # new-style JPEG-in-TIFF: each strip/tile is a JPEG stream from
        # the INDEPENDENT baseline encoder; jpegtables=True splits the
        # shared DQT/DHT segments into tag 347 (abbreviated streams)
        if wide or spp not in (1, 3) or planar == 2:
            raise ValueError("JPEG-in-TIFF writer: 8-bit gray/RGB "
                             "chunky only")
        from tests.jpeg_writer import encode_jpeg

        px3 = pixels if pixels.ndim == 3 else pixels[:, :, None]
        blocks = []
        if tile is not None:
            tw_, tl_ = tile
            for ty in range(0, h, tl_):
                for tx in range(0, w, tw_):
                    blk = np.zeros((tl_, tw_, spp), dtype=np.uint8)
                    seg = px3[ty: ty + tl_, tx: tx + tw_]
                    blk[: seg.shape[0], : seg.shape[1]] = seg
                    blocks.append(blk if spp == 3 else blk[:, :, 0])
        else:
            for y in range(0, h, rps):
                seg = px3[y: y + rps]
                blocks.append(seg if spp == 3 else seg[:, :, 0])
        streams = [encode_jpeg(b, quality=95) for b in blocks]
        tbl347 = None
        if jpegtables:
            def split(stream: bytes):
                # walk marker segments up to SOS; pull DQT/DHT out
                tables, rest = bytearray(), bytearray(b"\xff\xd8")
                i = 2
                while i + 4 <= len(stream):
                    assert stream[i] == 0xFF
                    m = stream[i + 1]
                    if m == 0xDA:
                        rest += stream[i:]
                        break
                    ln = int.from_bytes(stream[i + 2: i + 4], "big")
                    seg = stream[i: i + 2 + ln]
                    (tables if m in (0xDB, 0xC4) else rest).extend(seg)
                    i += 2 + ln
                return bytes(tables), bytes(rest)

            tabs, abbrevs = zip(*(split(st) for st in streams))
            assert len(set(tabs)) == 1  # shared tables across segments
            tbl347 = b"\xff\xd8" + tabs[0] + b"\xff\xd9"
            streams = list(abbrevs)
        strips = streams
        if photometric == 1 and spp == 3:
            photometric = 6  # YCbCr, the JPEG-in-TIFF convention

    def enc_block(rows: np.ndarray, row_w: int, sppx: int) -> bytes:
        data = rows
        if predictor == 2:
            r3 = rows.reshape(rows.shape[0], row_w, sppx).astype(np.int64)
            diff = r3.copy()
            diff[:, 1:, :] = (r3[:, 1:, :] - r3[:, :-1, :]) % mod
            data = diff.astype(sdt).reshape(rows.shape[0],
                                            row_w * sppx)
        raw = data.tobytes()
        if compression == 1:
            return raw
        if compression == 32773:
            stride = row_w * sppx * (2 if wide else 1)
            return b"".join(
                _packbits(raw[i: i + stride])
                for i in range(0, len(raw), stride)
            )
        if compression == 5:
            return _TiffLZW().compress(raw)
        if compression == 8:
            import zlib

            return zlib.compress(raw, 6)
        raise ValueError(compression)

    if compression == 7:
        pass  # strips already built above
    elif tile is not None:
        tw, tl = tile
        across = -(-w // tw)
        down = -(-h // tl)
        n_planes = spp if (planar == 2 and spp > 1) else 1
        tile_spp = 1 if n_planes > 1 else spp
        strips = []
        for c in range(n_planes):
            src = pixels[:, :, c] if n_planes > 1 else flat.reshape(
                h, w, spp
            )
            for t in range(across * down):
                ty, tx = divmod(t, across)
                blk = np.zeros((tl, tw * tile_spp), dtype=sdt)
                ys = src[ty * tl: ty * tl + tl]
                hc = ys.shape[0]
                if n_planes > 1:
                    seg = ys[:, tx * tw: tx * tw + tw]
                    blk[:hc, : seg.shape[1]] = seg
                else:
                    seg = ys[:, tx * tw: tx * tw + tw, :]
                    blk[:hc, : seg.shape[1] * spp] = seg.reshape(
                        hc, seg.shape[1] * spp
                    )
                strips.append(enc_block(blk, tw, tile_spp))
    elif planar == 2 and spp > 1:
        # per-plane strip sequences; predictor differencing is per plane
        # (single-sample rows), so reuse enc_strip with spp temporarily 1
        strips = []
        for c in range(spp):
            plane = pixels[:, :, c]
            for y in range(0, h, rps):
                rows = plane[y : y + rps]
                if predictor == 2:
                    d = rows.astype(np.int64).copy()
                    d[:, 1:] = (rows[:, 1:].astype(np.int64)
                                - rows[:, :-1]) % mod
                    raw = d.astype(sdt).tobytes()
                else:
                    raw = rows.tobytes()
                if compression == 1:
                    strips.append(raw)
                elif compression == 32773:
                    stride = w * (2 if wide else 1)
                    strips.append(
                        b"".join(
                            _packbits(raw[i : i + stride])
                            for i in range(0, len(raw), stride)
                        )
                    )
                elif compression == 5:
                    strips.append(_TiffLZW().compress(raw))
                elif compression == 8:
                    import zlib

                    strips.append(zlib.compress(raw, 6))
                else:
                    raise ValueError(compression)
    else:
        strips = [
            enc_strip(flat[y : y + rps]) for y in range(0, h, rps)
        ]

    entries = []  # (tag, type, count, values)
    entries.append((256, 3, 1, [w]))
    entries.append((257, 3, 1, [h]))
    entries.append((258, 3, spp, [16 if wide else 8] * spp))
    entries.append((259, 3, 1, [compression]))
    entries.append((262, 3, 1, [photometric]))
    entries.append((277, 3, 1, [spp]))
    if tile is not None:
        entries.append((322, 3, 1, [tile[0]]))
        entries.append((323, 3, 1, [tile[1]]))
    else:
        entries.append((278, 3, 1, [rps]))
    if planar != 1:
        entries.append((284, 3, 1, [planar]))
    if predictor != 1:
        entries.append((317, 3, 1, [predictor]))
    if spp == 4:
        entries.append((338, 3, 1, [2]))  # unassociated alpha
    if colormap is not None:
        entries.append((320, 3, len(colormap), list(colormap)))

    # caller-supplied raw entries, e.g. (274, 3, 1, raw2bytes) orientation
    # or (34675, 7, len(icc), icc_bytes) — raw VALUE bytes, not ints
    extras = list(extra_entries or [])
    if compression == 7 and jpegtables and tbl347:
        extras.append((347, 7, len(tbl347), tbl347))

    # layout: header(8) + IFD + out-of-line tag data + strips
    n_entries = len(entries) + 2 + len(extras)  # + StripOffsets/ByteCounts
    ifd_size = 2 + 12 * n_entries + 4
    data_pos = 8 + ifd_size
    extra = bytearray()

    def val_bytes(typ, values):
        size = {3: 2, 4: 4}[typ]
        return b"".join(int(v).to_bytes(size, bo) for v in values)

    strip_offsets = []
    strip_pos = data_pos
    # reserve out-of-line space for big tag values first
    pending = []
    for tag, typ, cnt, values in entries:
        raw = val_bytes(typ, values)
        pending.append((tag, typ, cnt, raw))
        if len(raw) > 4:
            strip_pos += len(raw)
    for tag, typ, cnt, raw in extras:
        pending.append((tag, typ, cnt, raw))
        if len(raw) > 4:
            strip_pos += len(raw)
    # strip offset/count arrays may themselves be out-of-line
    so_raw_len = 4 * len(strips)
    sc_raw_len = 4 * len(strips)
    if so_raw_len > 4:
        strip_pos += so_raw_len
    if sc_raw_len > 4:
        strip_pos += sc_raw_len
    p = strip_pos
    for sdata in strips:
        strip_offsets.append(p)
        p += len(sdata)

    off_tag, cnt_tag = (324, 325) if tile is not None else (273, 279)
    pending.append((off_tag, 4, len(strips), val_bytes(4, strip_offsets)))
    pending.append((cnt_tag, 4, len(strips),
                    val_bytes(4, [len(s) for s in strips])))
    pending.sort(key=lambda e: e[0])

    out = bytearray()
    out += (b"II*\x00" if bo == "little" else b"MM\x00*")
    out += (8).to_bytes(4, bo)
    out += len(pending).to_bytes(2, bo)
    data_cursor = data_pos
    ool = bytearray()
    for tag, typ, cnt, raw in pending:
        out += tag.to_bytes(2, bo) + typ.to_bytes(2, bo) + cnt.to_bytes(4, bo)
        if len(raw) <= 4:
            out += raw + b"\x00" * (4 - len(raw))
        else:
            out += data_cursor.to_bytes(4, bo)
            ool += raw
            data_cursor += len(raw)
    out += (0).to_bytes(4, bo)  # no next IFD
    out += ool
    for sdata in strips:
        out += sdata
    return bytes(out)
