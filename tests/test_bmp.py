"""BMP pixel decode (multimodal.decode_bmp) vs an INDEPENDENT
spec-derived writer — uncompressed BMP is lossless, so every check is
EXACT bytes: 24/32-bit truecolor, 8-bit palette, both row orders,
4-byte row padding, and the resize dispatch."""

import struct

import numpy as np
import pytest

from sample_dms_kinesis_rds_mariadb_spark.operators.multimodal import (
    decode_bmp,
    decode_image,
    resize_image,
)


def write_bmp(img: np.ndarray, top_down: bool = False) -> bytes:
    """Independent writer (BITMAPFILEHEADER + BITMAPINFOHEADER + BGRA
    palette for 8-bit + padded BGR(A) rows, bottom-up by default)."""
    h, w = img.shape[:2]
    ch = 1 if img.ndim == 2 else img.shape[2]
    bpp = 8 if ch == 1 else ch * 8
    stride = (w * bpp // 8 + 3) & ~3
    pal = b""
    if bpp == 8:
        pal = b"".join(
            bytes([i, (i * 3) % 256, (i * 7) % 256, 0]) for i in range(256)
        )  # B, G, R, reserved
    pix_off = 14 + 40 + len(pal)
    ys = range(h) if top_down else range(h - 1, -1, -1)
    rows = []
    for y in ys:
        if bpp == 8:
            row = bytes(img[y])
        elif bpp == 24:
            row = img[y][:, ::-1].tobytes()
        else:
            row = img[y][:, [2, 1, 0, 3]].tobytes()
        rows.append(row + b"\x00" * (stride - len(row)))
    data = b"".join(rows)
    hdr = b"BM" + struct.pack("<IHHI", pix_off + len(data), 0, 0, pix_off)
    info = struct.pack(
        "<IiiHHIIiiII",
        40, w, -h if top_down else h, 1, bpp, 0, len(data), 0, 0,
        256 if bpp == 8 else 0, 0,
    )
    return hdr + info + pal + data


PAL_RGB = np.array(
    [[(i * 7) % 256, (i * 3) % 256, i] for i in range(256)], dtype=np.uint8
)


@pytest.mark.parametrize("top_down", [False, True])
def test_bmp_truecolor_roundtrip(top_down):
    rng = np.random.default_rng(3 + top_down)
    rgb = rng.integers(0, 256, (7, 9, 3)).astype(np.uint8)  # odd width: padding
    w, h, c, px = decode_bmp(write_bmp(rgb, top_down=top_down))
    assert (w, h, c) == (9, 7, 3) and px == rgb.tobytes()
    rgba = rng.integers(0, 256, (5, 6, 4)).astype(np.uint8)
    w, h, c, px = decode_bmp(write_bmp(rgba, top_down=top_down))
    assert c == 4 and px == rgba.tobytes()


def test_bmp_palette_roundtrip():
    idx = np.random.default_rng(5).integers(0, 256, (4, 11)).astype(np.uint8)
    w, h, c, px = decode_bmp(write_bmp(idx))
    assert (w, h, c) == (11, 4, 3)
    assert px == PAL_RGB[idx].tobytes()


def test_bmp_boundaries():
    rgb = np.zeros((4, 4, 3), np.uint8)
    blob = bytearray(write_bmp(rgb))
    with pytest.raises(ValueError, match="header"):
        decode_bmp(b"XX" + bytes(blob[2:4]))
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(bytes(blob[: len(blob) - 8]))
    bf = bytearray(blob)
    bf[30:34] = struct.pack("<I", 3)  # BI_BITFIELDS
    with pytest.raises(NotImplementedError, match="compression"):
        decode_bmp(bytes(bf))
    rle = bytearray(blob)
    rle[30:34] = struct.pack("<I", 1)  # BI_RLE8 on a 24-bpp image: malformed
    with pytest.raises(ValueError, match="24 bpp"):
        decode_bmp(bytes(rle))


def write_bmp_rle(
    idx: np.ndarray, rle4: bool, runs: bool = True, deltas: bool = False
) -> bytes:
    """Independent RLE8/RLE4 encoder (bottom-up, BGRA palette quads).

    Encodes each storage row as: optional encoded runs (``runs=True``
    greedily emits repeat runs >= 3), absolute-mode literal blocks for
    the rest (2-byte aligned), end-of-line escapes, and a final
    end-of-bitmap. ``deltas=True`` replaces leading index-0 spans with a
    delta escape to exercise the skip path (skipped pixels are defined
    to read back as palette index 0)."""
    h, w = idx.shape
    n_pal = 16 if rle4 else 256
    pal = b"".join(
        bytes([i, (i * 3) % 256, (i * 7) % 256, 0]) for i in range(n_pal)
    )
    out = bytearray()
    for y in range(h - 1, -1, -1):  # storage order: bottom row first
        row = idx[y]
        x = 0
        if deltas and row[0] == 0:
            skip = 1
            while skip < w and row[skip] == 0 and skip < 255:
                skip += 1
            if skip < w:  # delta cannot usefully end a row
                out += bytes([0, 2, skip, 0])
                x = skip
        while x < w:
            run = 1
            while x + run < w and row[x + run] == row[x] and run < 255:
                run += 1
            if runs and run >= 3:
                if rle4:
                    v = (int(row[x]) << 4) | int(row[x])
                else:
                    v = int(row[x])
                out += bytes([run, v])
                x += run
                continue
            # absolute block: gather until the next long run (or row end)
            start = x
            while x < w and (x - start) < 254:
                run = 1
                while x + run < w and row[x + run] == row[x] and run < 255:
                    run += 1
                if runs and run >= 3:
                    break
                x += run
            n = x - start
            if n < 3:  # absolute mode needs >= 3; emit singleton runs
                for i in range(start, x):
                    v = int(row[i])
                    out += bytes([1, (v << 4) | v if rle4 else v])
                continue
            out += bytes([0, n])
            if rle4:
                lit = bytearray()
                for i in range(n):
                    if i % 2 == 0:
                        lit.append(int(row[start + i]) << 4)
                    else:
                        lit[-1] |= int(row[start + i])
                if len(lit) % 2:
                    lit.append(0)
                out += lit
            else:
                lit = bytes(int(row[start + i]) for i in range(n))
                out += lit + (b"\x00" if n % 2 else b"")
        out += b"\x00\x00"  # end of line
    out += b"\x00\x01"  # end of bitmap
    pix_off = 14 + 40 + len(pal)
    hdr = b"BM" + struct.pack("<IHHI", pix_off + len(out), 0, 0, pix_off)
    info = struct.pack(
        "<IiiHHIIiiII",
        40, w, h, 1, 4 if rle4 else 8, 2 if rle4 else 1,
        len(out), 0, 0, n_pal, 0,
    )
    return hdr + info + pal + bytes(out)


def _pal_rgb(n: int) -> np.ndarray:
    return np.array(
        [[(i * 7) % 256, (i * 3) % 256, i] for i in range(n)], dtype=np.uint8
    )


@pytest.mark.parametrize("rle4", [False, True])
@pytest.mark.parametrize("deltas", [False, True])
def test_bmp_rle_roundtrip(rle4, deltas):
    """Runs, absolute blocks, singleton runs, EOL, delta skips, EOB —
    decode must reproduce the index image exactly through the palette."""
    rng = np.random.default_rng(17 + rle4 + 2 * deltas)
    n_pal = 16 if rle4 else 256
    # mix of runs and noise; some rows lead with 0s so deltas engage
    idx = rng.integers(0, n_pal, (9, 23)).astype(np.uint8)
    idx[1, :] = 5                      # full-row run
    idx[3, :7] = 0                     # leading zeros -> delta skip
    idx[4, :] = np.arange(23) % n_pal  # pure literal row
    idx[6, 10:] = 9                    # trailing run
    blob = write_bmp_rle(idx, rle4=rle4, deltas=deltas)
    w, h, c, px = decode_bmp(blob)
    assert (w, h, c) == (23, 9, 3)
    assert px == _pal_rgb(n_pal)[idx].tobytes()


@pytest.mark.parametrize("rle4", [False, True])
def test_bmp_rle_all_literal(rle4):
    """runs=False forces absolute/singleton encoding everywhere."""
    rng = np.random.default_rng(31 + rle4)
    n_pal = 16 if rle4 else 256
    idx = rng.integers(0, n_pal, (5, 17)).astype(np.uint8)
    w, h, c, px = decode_bmp(write_bmp_rle(idx, rle4=rle4, runs=False))
    assert (w, h, c) == (17, 5, 3)
    assert px == _pal_rgb(n_pal)[idx].tobytes()


def test_bmp_rle_boundaries():
    idx = np.ones((3, 5), np.uint8)
    blob = bytearray(write_bmp_rle(idx, rle4=False))
    with pytest.raises(ValueError, match="end-of-bitmap"):
        decode_bmp(bytes(blob[:-2]))  # drop the EOB escape
    neg = bytearray(blob)
    neg[22:26] = struct.pack("<i", -3)  # top-down is illegal for RLE
    with pytest.raises(ValueError, match="bottom-up"):
        decode_bmp(bytes(neg))


def write_bmp_lowbit(idx: np.ndarray, bpp: int) -> bytes:
    """Independent uncompressed 1/4-bit palette writer (bottom-up)."""
    h, w = idx.shape
    n_pal = 1 << bpp
    pal = b"".join(
        bytes([i, (i * 3) % 256, (i * 7) % 256, 0]) for i in range(n_pal)
    )
    stride = (w * bpp + 31) // 32 * 4
    rows = []
    for y in range(h - 1, -1, -1):
        bits = "".join(format(int(v), f"0{bpp}b") for v in idx[y])
        bits += "0" * (stride * 8 - len(bits))
        rows.append(int(bits, 2).to_bytes(stride, "big"))
    data = b"".join(rows)
    pix_off = 14 + 40 + len(pal)
    hdr = b"BM" + struct.pack("<IHHI", pix_off + len(data), 0, 0, pix_off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, bpp, 0, len(data), 0, 0, n_pal, 0
    )
    return hdr + info + pal + data


@pytest.mark.parametrize("bpp", [1, 4])
def test_bmp_lowbit_uncompressed(bpp):
    rng = np.random.default_rng(43 + bpp)
    idx = rng.integers(0, 1 << bpp, (6, 13)).astype(np.uint8)
    w, h, c, px = decode_bmp(write_bmp_lowbit(idx, bpp))
    assert (w, h, c) == (13, 6, 3)
    assert px == _pal_rgb(1 << bpp)[idx].tobytes()


def test_bmp_resize_and_metadata_dispatch():
    rng = np.random.default_rng(9)
    rgb = rng.integers(0, 256, (8, 12, 3)).astype(np.uint8)
    blob = write_bmp(rgb)
    assert decode_image(blob) == (12, 8, 3, "bmp")
    out = resize_image(blob, 6, 4)
    assert out.startswith(b"P6\n6 4\n255\n")
    # nearest-neighbor top-left pixel preserved
    body = out.split(b"\n", 3)[3]
    assert body[0:3] == rgb[0, 0].tobytes()
