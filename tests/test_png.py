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


_ADAM7_W = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def encode_png_ex(
    width: int,
    height: int,
    color_type: int,
    depth: int,
    samples: list[int],
    plte: bytes | None = None,
    trns: bytes | None = None,
    interlace: bool = False,
    filter_type: int = 0,
) -> bytes:
    """Generalized independent encoder (spec-derived): any color type /
    bit depth / Adam7 interlace; ``samples`` is the flat row-major list of
    RAW channel values (palette indices for type 3, 16-bit ints for depth
    16). ``filter_type`` 0 (None) or 2 (Up) is applied per row — Up on
    interlaced data verifies the decoder resets its predecessor row at
    every pass boundary."""
    rchan = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    def pack_row(vals):
        if depth == 8:
            return bytes(vals)
        if depth == 16:
            return b"".join(struct.pack(">H", v) for v in vals)
        out = bytearray()
        acc = nb = 0
        for v in vals:
            acc = (acc << depth) | v
            nb += depth
            if nb == 8:
                out.append(acc)
                acc = nb = 0
        if nb:
            out.append(acc << (8 - nb))
        return bytes(out)

    grid = [
        [
            samples[(y * width + x) * rchan : (y * width + x + 1) * rchan]
            for x in range(width)
        ]
        for y in range(height)
    ]
    raw = bytearray()
    passes = _ADAM7_W if interlace else ((0, 0, 1, 1),)
    for x0, y0, dx, dy in passes:
        ys = range(y0, height, dy)
        xs = range(x0, width, dx)
        if not len(ys) or not len(xs):
            continue
        rows = [pack_row([v for x in xs for v in grid[y][x]]) for y in ys]
        prev = bytes(len(rows[0]))
        for row in rows:
            raw.append(filter_type)
            if filter_type == 2:
                raw += bytes((row[i] - prev[i]) & 0xFF for i in range(len(row)))
            else:
                raw += row
            prev = row
    ihdr = struct.pack(
        ">IIBBBBB", width, height, depth, color_type, 0, 0, 1 if interlace else 0
    )
    body = chunk(b"IHDR", ihdr)
    if plte is not None:
        body += chunk(b"PLTE", plte)
    if trns is not None:
        body += chunk(b"tRNS", trns)
    body += chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")
    return b"\x89PNG\r\n\x1a\n" + body


def test_png_palette_decode_with_and_without_trns():
    rng = random.Random(13)
    w, h = 9, 6
    pal = bytes(rng.randrange(256) for _ in range(16 * 3))
    idx = [rng.randrange(16) for _ in range(w * h)]
    blob = encode_png_ex(w, h, 3, 8, idx, plte=pal)
    gw, gh, gc, got = decode_png(blob)
    want = b"".join(pal[i * 3 : i * 3 + 3] for i in idx)
    assert (gw, gh, gc) == (w, h, 3) and got == want
    assert decode_image(blob) == (w, h, 3, "png")
    # tRNS: output grows an alpha plane; metadata reports 4 channels too
    trns = bytes([10, 200, 255])
    blob_t = encode_png_ex(w, h, 3, 8, idx, plte=pal, trns=trns)
    gw, gh, gc, got = decode_png(blob_t)
    alpha = [trns[i] if i < len(trns) else 255 for i in idx]
    want_a = b"".join(
        pal[i * 3 : i * 3 + 3] + bytes([a]) for i, a in zip(idx, alpha)
    )
    assert (gc, got) == (4, want_a)
    assert decode_image(blob_t) == (w, h, 4, "png")
    # sub-byte palette indices (4-bit)
    idx4 = [rng.randrange(16) for _ in range(w * h)]
    blob4 = encode_png_ex(w, h, 3, 4, idx4, plte=pal)
    assert decode_png(blob4)[3] == b"".join(pal[i * 3 : i * 3 + 3] for i in idx4)


def test_png_16bit_keeps_high_byte():
    rng = random.Random(17)
    w, h = 7, 5
    vals = [rng.randrange(65536) for _ in range(w * h * 3)]
    blob = encode_png_ex(w, h, 2, 16, vals)
    gw, gh, gc, got = decode_png(blob)
    assert (gw, gh, gc) == (w, h, 3)
    assert got == bytes(v >> 8 for v in vals)


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_png_subbyte_gray_scales_to_8bit(depth):
    rng = random.Random(19 + depth)
    w, h = 11, 4  # odd width: rows end mid-byte
    vals = [rng.randrange(1 << depth) for _ in range(w * h)]
    blob = encode_png_ex(w, h, 0, depth, vals)
    gw, gh, gc, got = decode_png(blob)
    assert (gw, gh, gc) == (w, h, 1)
    assert got == bytes(v * 255 // ((1 << depth) - 1) for v in vals)


def test_png_adam7_interlace_matches_sequential():
    """Interlaced and sequential encodings of the same pixels decode
    byte-identically; Up-filtered rows prove per-pass predecessor reset."""
    rng = random.Random(23)
    w, h = 13, 11  # non-multiples of 8: ragged pass dimensions
    pixels = bytes(rng.randrange(256) for _ in range(w * h * 3))
    plain = encode_png(w, h, 3, pixels)
    inter = encode_png_ex(w, h, 2, 8, list(pixels), interlace=True)
    inter_up = encode_png_ex(
        w, h, 2, 8, list(pixels), interlace=True, filter_type=2
    )
    assert decode_png(plain)[3] == pixels
    assert decode_png(inter)[3] == pixels
    assert decode_png(inter_up)[3] == pixels
    # tiny images where some passes are EMPTY
    tiny = bytes(rng.randrange(256) for _ in range(3 * 2 * 3))
    assert decode_png(encode_png_ex(3, 2, 2, 8, list(tiny), interlace=True))[3] == tiny


def test_png_malformed_layouts_raise():
    rng = random.Random(29)
    # illegal depth/type combo (16-bit palette)
    blob = encode_png_ex(4, 4, 3, 8, [0] * 16, plte=bytes(48))
    bad = bytearray(blob)
    # IHDR depth byte: offset 8 (sig) + 8 (len+type) + 8 (w+h)
    bad[24] = 16
    import struct as _s

    crc = zlib.crc32(bytes(bad[12:29])) & 0xFFFFFFFF
    bad[29:33] = _s.pack(">I", crc)
    with pytest.raises(ValueError, match="illegal bit depth"):
        decode_png(bytes(bad))
    # palette image without PLTE
    raw = zlib.compress(bytes(b for _ in range(4) for b in ([0] + [0] * 4)))

    def chunk(typ, data):
        return (
            _s.pack(">I", len(data)) + typ + data
            + _s.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    no_plte = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", _s.pack(">IIBBBBB", 4, 4, 8, 3, 0, 0, 0))
        + chunk(b"IDAT", raw)
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="PLTE"):
        decode_png(no_plte)
    # out-of-range palette index
    oor = encode_png_ex(2, 2, 3, 8, [0, 1, 2, 9], plte=bytes(9))  # 3 entries
    with pytest.raises(ValueError, match="out of range"):
        decode_png(oor)
    assert rng  # keep the fixture import style consistent


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
