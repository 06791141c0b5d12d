"""Independent GIF encoder for decoder tests — written from the GIF89a
specification (LZW compression with LSB-first variable-width codes,
CLEAR/EOI, dictionary reset at 4096), NOT from the decoder under test.
GIF is lossless, so decode parity is exact-byte."""

from __future__ import annotations


class _LZW:
    """Spec-derived GIF LZW compressor (LSB-first bit packing)."""

    def __init__(self, min_code_size: int):
        self.mcs = min_code_size
        self.clear = 1 << min_code_size
        self.eoi = self.clear + 1
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0
        self._reset()

    def _reset(self):
        self.table = {bytes([i]): i for i in range(self.clear)}
        self.next_code = self.eoi + 1
        self.code_size = self.mcs + 1

    def _emit(self, code: int):
        self.acc |= code << self.nbits
        self.nbits += self.code_size
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def compress(self, indices: bytes) -> bytes:
        self._emit(self.clear)
        buf = b""
        for b in indices:
            cand = buf + bytes([b])
            if cand in self.table:
                buf = cand
                continue
            self._emit(self.table[buf])
            # widen POST-emit, PRE-assign (the giflib pairing): the
            # decoder learns each entry one code later than the encoder
            # assigns it, so this ordering is what keeps both sides
            # switching width between the same two codes on the wire
            if (
                self.next_code == (1 << self.code_size)
                and self.code_size < 12
            ):
                self.code_size += 1
            if self.next_code >= 4096:
                # table full: 12-bit code space exhausted — clear and
                # rebuild (the decoder mirrors on the CLEAR code)
                self._emit(self.clear)
                self._reset()
            else:
                self.table[cand] = self.next_code
                self.next_code += 1
            buf = bytes([b])
        if buf:
            self._emit(self.table[buf])
        self._emit(self.eoi)
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def _blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def write_gif(
    frames: list[dict],
    width: int,
    height: int,
    palette: bytes,
    bg_index: int = 0,
) -> bytes:
    """Minimal GIF89a writer. Each frame dict: ``indices`` (row-major
    bytes of palette indices), optional ``left/top/width/height``
    (default full canvas), ``transparent`` (index or None), ``disposal``
    (0-3), ``interlace`` (bool), ``local_palette`` (bytes or None)."""
    n_colors = len(palette) // 3
    size_field = max((n_colors - 1).bit_length() - 1, 0)
    if 2 << size_field != n_colors:
        raise ValueError("palette size must be a power of two >= 2")
    out = bytearray(b"GIF89a")
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    out.append(0x80 | size_field)  # GCT present
    out.append(bg_index)
    out.append(0)  # aspect
    out += palette

    for f in frames:
        fw = f.get("width", width)
        fh = f.get("height", height)
        transparent = f.get("transparent")
        disposal = f.get("disposal", 0)
        if transparent is not None or disposal:
            flags = (disposal & 0x07) << 2
            gce = bytes([flags | (1 if transparent is not None else 0), 0, 0,
                         transparent if transparent is not None else 0])
            out += b"\x21\xf9" + bytes([len(gce)]) + gce + b"\x00"
        out.append(0x2C)
        out += f.get("left", 0).to_bytes(2, "little")
        out += f.get("top", 0).to_bytes(2, "little")
        out += fw.to_bytes(2, "little") + fh.to_bytes(2, "little")
        lct = f.get("local_palette")
        fpacked = 0x40 if f.get("interlace") else 0
        if lct is not None:
            ln = len(lct) // 3
            lsize = max((ln - 1).bit_length() - 1, 0)
            if 2 << lsize != ln:
                raise ValueError("local palette size must be a power of two")
            fpacked |= 0x80 | lsize
        out.append(fpacked)
        if lct is not None:
            out += lct
        indices = f["indices"]
        if f.get("interlace"):
            rows = [indices[y * fw : (y + 1) * fw] for y in range(fh)]
            order = []
            for start, step in _INTERLACE_PASSES:
                order.extend(range(start, fh, step))
            indices = b"".join(rows[y] for y in order)
        pal_n = (len(lct) // 3) if lct is not None else n_colors
        mcs = max(2, (pal_n - 1).bit_length())
        out.append(mcs)
        out += _blocks(_LZW(mcs).compress(indices))
    out.append(0x3B)
    return bytes(out)
