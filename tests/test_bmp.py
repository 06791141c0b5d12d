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
    rle = bytearray(blob)
    rle[30:34] = struct.pack("<I", 1)  # BI_RLE8
    with pytest.raises(NotImplementedError, match="compression"):
        decode_bmp(bytes(rle))


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
