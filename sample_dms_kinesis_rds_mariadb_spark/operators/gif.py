"""Pure-Python GIF decoder (GIF87a/GIF89a) — stdlib + numpy only.

Extends the engine's real-decode image formats (PNM/BMP/PNG/JPEG in
``operators/multimodal.py`` / ``operators/jpeg.py``) with the remaining
common crawl format: LZW decompression (LSB-first variable-width codes,
CLEAR/EOI, 12-bit dictionary cap), global and local color tables,
interlaced row order, GIF89a graphic-control extensions (transparency →
RGBA output), and multi-frame animations with disposal-method
compositing (unspecified/keep, restore-background, restore-previous).

GIF is lossless, so tests assert EXACT pixel bytes against an
INDEPENDENT spec-derived encoder with a real LZW compressor
(``tests/gif_writer.py``).

Honest boundaries: malformed streams (bad signature, truncated blocks,
LZW code overflow, missing color table) raise ``ValueError``.
"""

from __future__ import annotations

import numpy as np

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _lzw_decode(data: bytes, min_code_size: int, expected: int) -> bytes:
    """GIF-flavor LZW: LSB-first bit packing, variable code width
    starting at ``min_code_size + 1``, CLEAR resets the dictionary, EOI
    ends the stream. Decodes at most ``expected`` indices (trailing
    garbage after the image area is ignored, matching real decoders)."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"GIF: bad LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1

    out = bytearray()
    # dictionary as list of bytes entries
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    code_size = min_code_size + 1
    prev: bytes | None = None

    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while len(out) < expected:
        while nbits < code_size:
            if pos >= n:
                raise ValueError("GIF: LZW data exhausted before image end")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError(f"GIF: LZW code {code} before any output")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"GIF: LZW code {code} out of range")
        out += entry
        prev = entry
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
    return bytes(out[:expected])


def _sub_blocks(content: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate data sub-blocks starting at ``pos``; returns (data,
    offset past the block terminator)."""
    chunks = []
    while True:
        if pos >= len(content):
            raise ValueError("GIF: truncated sub-block chain")
        ln = content[pos]
        pos += 1
        if ln == 0:
            return b"".join(chunks), pos
        if pos + ln > len(content):
            raise ValueError("GIF: truncated sub-block")
        chunks.append(content[pos : pos + ln])
        pos += ln


def parse_gif(content: bytes) -> dict:
    """Parse the container: ``{width, height, frames, bg_index,
    has_transparency}`` with ``frames`` a list of dicts holding each
    image descriptor's geometry, palette, transparency index, disposal
    method, and decoded INDEX array (h, w) — compositing happens in
    :func:`decode_gif`."""
    if content[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    if len(content) < 13:
        raise ValueError("GIF: truncated logical screen descriptor")
    width = int.from_bytes(content[6:8], "little")
    height = int.from_bytes(content[8:10], "little")
    packed = content[10]
    bg_index = content[11]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(
            content[pos : pos + 3 * n], dtype=np.uint8
        ).reshape(-1, 3)
        if len(gct) != n:
            raise ValueError("GIF: truncated global color table")
        pos += 3 * n

    frames = []
    transparent = None
    disposal = 0
    any_transparency = False
    while pos < len(content):
        b = content[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            if pos + 2 > len(content):
                raise ValueError("GIF: truncated extension")
            label = content[pos + 1]
            data, pos = _sub_blocks(content, pos + 2)
            if label == 0xF9 and len(data) >= 4:  # graphic control
                flags = data[0]
                disposal = (flags >> 2) & 0x07
                transparent = data[3] if flags & 0x01 else None
                if transparent is not None:
                    any_transparency = True
            continue
        if b == 0x2C:  # image descriptor
            if pos + 10 > len(content):
                raise ValueError("GIF: truncated image descriptor")
            left = int.from_bytes(content[pos + 1 : pos + 3], "little")
            top = int.from_bytes(content[pos + 3 : pos + 5], "little")
            fw = int.from_bytes(content[pos + 5 : pos + 7], "little")
            fh = int.from_bytes(content[pos + 7 : pos + 9], "little")
            fpacked = content[pos + 9]
            pos += 10
            lct = None
            if fpacked & 0x80:
                n = 2 << (fpacked & 0x07)
                lct = np.frombuffer(
                    content[pos : pos + 3 * n], dtype=np.uint8
                ).reshape(-1, 3)
                if len(lct) != n:
                    raise ValueError("GIF: truncated local color table")
                pos += 3 * n
            palette = lct if lct is not None else gct
            if palette is None:
                raise ValueError("GIF: frame has no color table")
            if pos >= len(content):
                raise ValueError("GIF: missing LZW minimum code size")
            mcs = content[pos]
            data, pos = _sub_blocks(content, pos + 1)
            idx = np.frombuffer(
                _lzw_decode(data, mcs, fw * fh), dtype=np.uint8
            )
            if len(idx) != fw * fh:
                raise ValueError("GIF: frame pixel data short")
            grid = idx.reshape(fh, fw)
            if fpacked & 0x40:  # interlaced: re-weave the 4 passes
                woven = np.empty_like(grid)
                src = 0
                for start, step in _INTERLACE_PASSES:
                    rows = range(start, fh, step)
                    for y in rows:
                        woven[y] = grid[src]
                        src += 1
                grid = woven
            if int(grid.max(initial=0)) >= len(palette):
                raise ValueError("GIF: palette index out of range")
            frames.append(
                {
                    "left": left,
                    "top": top,
                    "width": fw,
                    "height": fh,
                    "palette": palette,
                    "transparent": transparent,
                    "disposal": disposal,
                    "indices": grid,
                }
            )
            transparent = None
            disposal = 0
            continue
        raise ValueError(f"GIF: unknown block 0x{b:02x} at offset {pos}")
    if not frames:
        raise ValueError("GIF has no image data")
    return {
        "width": width,
        "height": height,
        "frames": frames,
        "bg_index": bg_index,
        "gct": gct,
        "has_transparency": any_transparency,
    }


def decode_gif(
    content: bytes, frame: int = 0
) -> tuple[int, int, int, bytes]:
    """FULL pixel decode of frame ``frame`` (composited over preceding
    frames per their disposal methods). Returns ``(width, height,
    channels, pixels)`` — RGB, or RGBA when any graphic-control
    extension declares transparency."""
    meta = parse_gif(content)
    w, h = meta["width"], meta["height"]
    if not 0 <= frame < len(meta["frames"]):
        raise ValueError(
            f"GIF: frame {frame} out of range ({len(meta['frames'])} frames)"
        )
    rgba = np.zeros((h, w, 4), dtype=np.uint8)  # transparent canvas
    for f in meta["frames"][: frame + 1]:
        prev = rgba.copy() if f["disposal"] == 3 else None
        y0, x0 = f["top"], f["left"]
        y1 = min(y0 + f["height"], h)
        x1 = min(x0 + f["width"], w)
        idx = f["indices"][: y1 - y0, : x1 - x0]
        colors = f["palette"][idx]
        alpha = np.full(idx.shape, 255, dtype=np.uint8)
        if f["transparent"] is not None:
            alpha[idx == f["transparent"]] = 0
        region = rgba[y0:y1, x0:x1]
        mask = alpha == 255
        region[mask] = np.concatenate(
            [colors, alpha[..., None]], axis=-1
        )[mask]
        if f is meta["frames"][frame]:
            break
        # dispose AFTER the frame displayed (prepare canvas for the next)
        if f["disposal"] == 2:  # restore to background = transparent
            rgba[y0:y1, x0:x1] = 0
        elif f["disposal"] == 3 and prev is not None:
            rgba = prev
    if meta["has_transparency"]:
        return w, h, 4, rgba.tobytes()
    return w, h, 3, rgba[:, :, :3].tobytes()


def gif_frame_count(content: bytes) -> int:
    return len(parse_gif(content)["frames"])


def gif_header(content: bytes) -> tuple[int, int, int]:
    """(width, height, channels) without LZW-decoding pixel data — walks
    the block structure only (extensions are length-prefixed), so the
    metadata path stays O(block count). Channels is 4 when any
    graphic-control extension declares a transparent index, else 3."""
    if content[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    if len(content) < 13:
        raise ValueError("GIF: truncated logical screen descriptor")
    width = int.from_bytes(content[6:8], "little")
    height = int.from_bytes(content[8:10], "little")
    packed = content[10]
    pos = 13 + (3 * (2 << (packed & 0x07)) if packed & 0x80 else 0)
    channels = 3
    saw_image = False
    while pos < len(content):
        b = content[pos]
        if b == 0x3B:
            break
        if b == 0x21:
            if pos + 2 > len(content):
                raise ValueError("GIF: truncated extension")
            label = content[pos + 1]
            data, pos = _sub_blocks(content, pos + 2)
            if label == 0xF9 and len(data) >= 4 and data[0] & 0x01:
                channels = 4
            continue
        if b == 0x2C:
            if pos + 10 > len(content):
                raise ValueError("GIF: truncated image descriptor")
            saw_image = True
            fw = int.from_bytes(content[pos + 5 : pos + 7], "little")
            fh = int.from_bytes(content[pos + 7 : pos + 9], "little")
            fpacked = content[pos + 9]
            pos += 10
            if fpacked & 0x80:
                pos += 3 * (2 << (fpacked & 0x07))
            if pos >= len(content):
                raise ValueError("GIF: missing LZW minimum code size")
            _data, pos = _sub_blocks(content, pos + 1)
            continue
        raise ValueError(f"GIF: unknown block 0x{b:02x} at offset {pos}")
    if not saw_image:
        raise ValueError("GIF has no image data")
    return width, height, channels
