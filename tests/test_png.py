"""Pure-Python PNG decode: fixture PNGs encoded by this INDEPENDENT
spec-derived writer, decoded by operators/multimodal.py::decode_png —
sha256 pixel parity, all five filters, CRC tamper detection, and the
extract_image_features dispatch wiring."""

import hashlib
import random
import struct
import zlib

import pytest

from sample_dms_kinesis_rds_mariadb_spark.operators.multimodal import (
    decode_image,
    decode_png,
    extract_image_features,
    resize_image,
)


def encode_png(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    filters=None,
    split_idat: bool = False,
) -> bytes:
    """Independent PNG encoder (written from the spec, not the decoder):
    8-bit, color type by channel count, per-row filter types applied
    forward (the decoder must undo them)."""
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    stride = width * channels
    bpp = channels
    rows = [pixels[y * stride : (y + 1) * stride] for y in range(height)]
    if filters is None:
        filters = [0] * height
    raw = bytearray()
    prev = bytes(stride)
    for f, row in zip(filters, rows):
        raw.append(f)
        if f == 0:
            enc = row
        elif f == 1:
            enc = bytes(
                (row[i] - (row[i - bpp] if i >= bpp else 0)) & 0xFF
                for i in range(stride)
            )
        elif f == 2:
            enc = bytes((row[i] - prev[i]) & 0xFF for i in range(stride))
        elif f == 3:
            enc = bytes(
                (row[i] - (((row[i - bpp] if i >= bpp else 0) + prev[i]) >> 1))
                & 0xFF
                for i in range(stride)
            )
        elif f == 4:
            out = bytearray()
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                out.append((row[i] - pred) & 0xFF)
            enc = bytes(out)
        else:
            raise ValueError(f)
        raw += enc
        prev = row
    z = zlib.compress(bytes(raw))
    if split_idat:
        mid = len(z) // 2
        idat = chunk(b"IDAT", z[:mid]) + chunk(b"IDAT", z[mid:])
    else:
        idat = chunk(b"IDAT", z)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + idat
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip_all_filters(channels):
    """Every filter type (0-4) in one image, every supported color type:
    decoded pixels are byte-identical (sha256) to what was encoded."""
    rng = random.Random(42 + channels)
    w, h = 13, 10  # odd width exercises non-aligned strides
    pixels = bytes(rng.randrange(256) for _ in range(w * h * channels))
    filters = [0, 1, 2, 3, 4, 4, 3, 2, 1, 0]
    blob = encode_png(w, h, channels, pixels, filters=filters)
    gw, gh, gc, got = decode_png(blob)
    assert (gw, gh, gc) == (w, h, channels)
    assert hashlib.sha256(got).hexdigest() == hashlib.sha256(pixels).hexdigest()


def test_png_split_idat_and_metadata():
    rng = random.Random(7)
    w, h = 32, 8
    pixels = bytes(rng.randrange(256) for _ in range(w * h * 3))
    blob = encode_png(w, h, 3, pixels, filters=[4] * h, split_idat=True)
    assert decode_png(blob)[3] == pixels  # IDAT chunks concatenate
    assert decode_image(blob) == (w, h, 3, "png")


def test_png_crc_tamper_detected():
    blob = bytearray(encode_png(4, 4, 3, bytes(range(48))))
    blob[40] ^= 0xFF  # somewhere inside IDAT payload
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(blob))


def test_png_unsupported_subformats():
    # palette (color type 3): header metadata works, pixel decode refuses
    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 5, 5, 8, 3, 0, 0, 0)
    pal = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"IEND", b"")
    assert decode_image(pal) == (5, 5, 3, "png")  # palette = 3 effective
    with pytest.raises(NotImplementedError, match="color_type=3"):
        decode_png(pal)
    # 16-bit
    ihdr16 = struct.pack(">IIBBBBB", 5, 5, 16, 2, 0, 0, 0)
    deep = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr16) + chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError, match="bit_depth=16"):
        decode_png(deep)


def test_png_resize_to_pnm():
    """PNG feeds the real resize path: RGBA drops alpha into a P6 whose
    pixels are the nearest-neighbor selection of the decoded buffer."""
    rng = random.Random(3)
    w, h = 8, 6
    pixels = bytes(rng.randrange(256) for _ in range(w * h * 4))
    blob = encode_png(w, h, 4, pixels, filters=[2] * h)
    out = resize_image(blob, 4, 3)
    assert out[:2] == b"P6"
    ow, oh, oc, fmt = decode_image(out)
    assert (ow, oh, oc, fmt) == (4, 3, 3, "ppm")
    # top-left pixel of the resize == top-left RGB of the source
    body = out.split(b"\n", 3)[3]
    assert body[0:3] == pixels[0:3]
    # grayscale PNG resizes to P5
    gpix = bytes(rng.randrange(256) for _ in range(w * h))
    gout = resize_image(encode_png(w, h, 1, gpix), 4, 3)
    assert gout[:2] == b"P5"


def test_png_features_dispatch_e2e(spark):
    """extract_image_features over PNG blobs: real decode through the
    Arrow-batched mapInPandas plumbing — format/dims/sha256 all real."""
    rng = random.Random(11)
    rows = []
    for i, (w, h, c) in enumerate([(6, 4, 3), (5, 7, 1), (9, 3, 4)]):
        pixels = bytes(rng.randrange(256) for _ in range(w * h * c))
        blob = encode_png(w, h, c, pixels, filters=[i % 5] * h)
        rows.append((i, bytearray(blob), "image", f"synthetic://{i}"))
    df = spark.createDataFrame(
        rows, "media_id long, content binary, media_type string, source_uri string"
    )
    got = {
        r["media_id"]: r
        for r in extract_image_features(df).collect()
    }
    assert got[0]["width"] == 6 and got[0]["channels"] == 3
    assert got[1]["height"] == 7 and got[1]["channels"] == 1
    assert got[2]["channels"] == 4
    for i, (mid, blob, _t, _u) in enumerate(rows):
        assert got[i]["format"] == "png"
        assert got[i]["sha256"] == hashlib.sha256(bytes(blob)).hexdigest()


def test_fake_mode_falls_back_on_corrupt_payloads():
    """fake=True's contract is any bytes → a row: corrupt/truncated
    payloads of REAL formats (bad PNG CRC, garbage after the magic,
    malformed PNM) fall back to the deterministic content-hash fake
    instead of failing the whole Spark stage; without fake, they still
    raise."""
    truncated_png = b"\x89PNG\r\n\x1a\n" + b"\x00" * 20
    w, h, c, fmt = decode_image(truncated_png, fake=True)
    assert fmt == "fake" and w >= 1 and h >= 1 and 1 <= c <= 4
    # deterministic: same bytes, same fake
    assert decode_image(truncated_png, fake=True) == (w, h, c, fmt)
    with pytest.raises(ValueError):
        decode_image(truncated_png)

    corrupt_pnm = b"P6\nnot numbers\n"
    wf, hf, cf, ff = decode_image(corrupt_pnm, fake=True)
    assert ff == "fake"
    with pytest.raises(ValueError):
        decode_image(corrupt_pnm)

    # intact real formats still decode for real under fake=True
    png = encode_png(3, 2, 3, bytes(range(18)))
    assert decode_image(png, fake=True)[3] == "png"


def test_fake_resize_falls_back_on_corrupt_payloads():
    """Same contract for resize_image: corrupt P6/PNG under fake=True
    yields a valid P6 of the target size; without fake, raises."""
    corrupt_p6 = b"P6\n4 4\n255\n"  # header claims pixels it doesn't have
    out = resize_image(corrupt_p6, 2, 2, fake=True)
    assert out.startswith(b"P6\n2 2\n255\n")
    assert len(out) == len(b"P6\n2 2\n255\n") + 2 * 2 * 3
    with pytest.raises(ValueError):
        resize_image(corrupt_p6, 2, 2)

    truncated_png = b"\x89PNG\r\n\x1a\n" + b"\xff" * 16
    out2 = resize_image(truncated_png, 3, 3, fake=True)
    assert out2.startswith(b"P6\n3 3\n255\n")
