"""VP8L (WebP lossless) decoder vs the independent spec-derived
encoder (tests/vp8l_writer.py) — bit-exact roundtrips across the
feature grid, plus the recalled-constant pin for the short-distance
neighbor map and the integration into the shared image pipeline."""

from __future__ import annotations

import numpy as np
import pytest

from sample_dms_kinesis_rds_mariadb_spark.operators.webp_lossless import (
    VP8LError,
    decode_vp8l,
    vp8l_distance_map,
)
from tests.vp8l_writer import write_vp8l


def _img(w: int, h: int, seed: int = 7, colors: int | None = None,
         alpha: bool = False) -> np.ndarray:
    """Deterministic RGBA test image; ``colors`` caps the distinct
    pixel values (palette-friendly); repeated rows give LZ77 matches."""
    rng = np.random.default_rng(seed)
    if colors:
        pal = rng.integers(0, 256, size=(colors, 4), dtype=np.uint8)
        pal[:, 3] = rng.integers(0, 256, colors) if alpha else 255
        idx = rng.integers(0, colors, size=(h, w))
        idx[h // 2] = idx[0]  # a repeated row
        return pal[idx]
    arr = rng.integers(0, 256, size=(h, w, 4), dtype=np.uint8)
    if not alpha:
        arr[:, :, 3] = 255
    if h >= 3:
        arr[h // 2] = arr[0]
    return arr


def _roundtrip(rgba: np.ndarray, **kw) -> None:
    blob = write_vp8l(rgba, **kw)
    w, h, channels, pixels = decode_vp8l(blob)
    assert (w, h) == (rgba.shape[1], rgba.shape[0])
    want_channels = 4 if (rgba[:, :, 3] != 255).any() else 3
    assert channels == want_channels
    got = np.frombuffer(pixels, dtype=np.uint8).reshape(h, w, channels)
    np.testing.assert_array_equal(got, rgba[:, :, :channels])


# --- the recalled-constant pin ---------------------------------------------


def test_distance_map_pins_recalled_prefix():
    """The 120-entry neighbor map is generated from an ordering rule;
    this pins the generator against an INDEPENDENTLY recalled prefix of
    the spec's printed table, so a misremembered rule fails loudly."""
    want_prefix = [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
        (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
        (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
        (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
        (4, 2), (-4, 2), (0, 5),
    ]
    table = vp8l_distance_map()
    assert len(table) == 120
    assert len(set(table)) == 120
    assert table[: len(want_prefix)] == want_prefix
    # every entry is a causal offset
    assert all(dy > 0 or (dy == 0 and dx > 0) for dx, dy in table)
    # r13 self-review fix: the printed table's byte packing
    # (dy << 4) | (8 - dx) bounds the domain to dx in [-7, 8],
    # dy in [0, 7] — whose causal subset is EXACTLY the 120 entries,
    # so every offset must be representable (the first generator
    # admitted (-8, 1)/(-8, 2)/(-8, 3) via truncation)
    assert all(-7 <= dx <= 8 and 0 <= dy <= 7 for dx, dy in table)
    assert set(table) == {
        (dx, dy)
        for dy in range(0, 8) for dx in range(-7, 9)
        if dy > 0 or dx > 0
    }


# --- roundtrips across the feature grid ------------------------------------


def test_plain_literals_roundtrip():
    _roundtrip(_img(23, 11))


def test_alpha_roundtrip():
    _roundtrip(_img(16, 9, alpha=True, seed=3))


def test_one_pixel_and_one_row():
    _roundtrip(_img(1, 1))
    _roundtrip(_img(37, 1))
    _roundtrip(_img(1, 19))


def test_color_cache_roundtrip():
    for bits in (1, 4, 8):
        _roundtrip(_img(31, 17, colors=12, seed=bits), cache_bits=bits)


def test_backrefs_short_and_linear_distances():
    # repeated rows -> distance w (2D-mapped when short, linear when
    # wide); repeated runs -> distance 1
    img = _img(9, 12, colors=5, seed=11)     # dist 9 is plane-coded
    _roundtrip(img, backrefs=True)
    wide = _img(200, 6, colors=5, seed=12)   # dist 200 is linear
    wide[3] = wide[2]
    _roundtrip(wide, backrefs=True)


def test_backrefs_with_cache():
    _roundtrip(_img(40, 20, colors=9, seed=13), backrefs=True, cache_bits=5)


def test_subtract_green_roundtrip():
    _roundtrip(_img(21, 13, seed=5), subtract_green=True)


@pytest.mark.parametrize("mode", list(range(14)))
def test_predictor_modes_roundtrip(mode):
    img = _img(19, 10, seed=20 + mode)
    mw = -(-19 // 16)
    mh = -(-10 // 16)
    _roundtrip(img, predictor=(4, [mode] * (mw * mh)))


def test_predictor_mixed_block_modes():
    img = _img(40, 24, seed=40)
    size_bits = 3  # 8x8 blocks -> 5x3 grid
    modes = [(i * 5 + 3) % 14 for i in range(5 * 3)]
    _roundtrip(img, predictor=(size_bits, modes))


def test_color_transform_roundtrip():
    img = _img(24, 16, seed=50)
    elems = [0x2A0F33, 0x000000, 0x7F407F, 0x123456,
             0xFF80FF, 0x01FF02]  # r2b|g2b|g2r, incl. negative int8s
    _roundtrip(img, color_transform=(3, elems[: 3 * 2]))


@pytest.mark.parametrize("n_colors", [2, 3, 4, 9, 16, 17, 200])
def test_palette_bundling_widths(n_colors):
    """All four pixel-bundling widths: 1/2/4/8 indices per green byte."""
    img = _img(29, 7, colors=n_colors, seed=60 + n_colors)
    _roundtrip(img, palette=True)


def test_meta_huffman_groups():
    _roundtrip(_img(48, 24, colors=20, seed=70), meta_bits=4)


def test_max_symbol_and_forced_normal_codes():
    img = _img(18, 8, colors=6, seed=80)
    _roundtrip(img, use_max_symbol=True)
    _roundtrip(img, force_normal=True)
    _roundtrip(img, use_max_symbol=True, force_normal=True)


def test_stacked_transforms():
    img = _img(33, 21, seed=90)
    mw = -(-33 // 16)
    mh = -(-21 // 16)
    _roundtrip(
        img,
        predictor=(4, [7] * (mw * mh)),
        subtract_green=True,
        cache_bits=4,
        backrefs=True,
    )


def test_simple_code_stream_order_not_canonical():
    """§3.5.1: a simple 2-symbol code maps bit 0 to the FIRST symbol in
    stream order — a hand-built stream with symbols written descending
    must decode accordingly."""
    from tests.vp8l_writer import BitWriter

    bw = BitWriter()
    bw.write(1, 14)   # width 2
    bw.write(0, 14)   # height 1
    bw.write(0, 1)    # alpha
    bw.write(0, 3)    # version
    bw.write(0, 1)    # no transforms
    bw.write(0, 1)    # no color cache
    bw.write(0, 1)    # no meta
    # green: simple code, 2 symbols, DESCENDING: 200 then 3
    bw.write(1, 1)
    bw.write(1, 1)    # num_symbols - 1 = 1
    bw.write(1, 1)    # first symbol is 8-bit
    bw.write(200, 8)
    bw.write(3, 8)
    # red / blue / alpha: single-symbol simple codes (zero-bit)
    for sym in (10, 20, 255):
        bw.write(1, 1)
        bw.write(0, 1)
        bw.write(1, 1)
        bw.write(sym, 8)
    # distance: single symbol 0
    bw.write(1, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    # two pixels: green bit 0 -> 200, green bit 1 -> 3
    bw.write(0, 1)
    bw.write(1, 1)
    blob = b"\x2f" + bw.bytes()
    w, h, channels, pixels = decode_vp8l(blob)
    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(h, w, channels)
    assert list(arr[0, 0]) == [10, 200, 20]
    assert list(arr[0, 1]) == [10, 3, 20]


def test_malformed_streams_raise_precisely():
    good = write_vp8l(_img(8, 8))
    with pytest.raises(VP8LError, match="signature"):
        decode_vp8l(good.replace(b"VP8L", b"VP8L", 1)[:20] + b"\x00" * 4)
    with pytest.raises(VP8LError, match="truncated"):
        decode_vp8l(good[:-6])
    # lossy VP8 chunk routes to the codec boundary, not a parse error
    lossy = (b"RIFF" + (20).to_bytes(4, "little") + b"WEBP"
             + b"VP8 " + (8).to_bytes(4, "little")
             + b"\x00\x00\x00\x9d\x01\x2a\x08\x00")
    with pytest.raises(NotImplementedError, match="lossy"):
        decode_vp8l(lossy)


# --- integration: the shared image pipeline --------------------------------


def test_webp_joins_real_decode_image_path():
    from sample_dms_kinesis_rds_mariadb_spark.operators.multimodal import (
        decode_image,
        resize_image,
    )

    img = _img(30, 20, colors=14, seed=99)
    blob = write_vp8l(img, palette=True, backrefs=True)
    w, h, channels, fmt = decode_image(blob)
    assert (w, h, channels, fmt) == (30, 20, 3, "webp")
    resized = resize_image(blob, 9, 8)
    assert resized[:2] == b"P6"


def test_webp_dhash_real_path():
    from sample_dms_kinesis_rds_mariadb_spark.operators.image_dedup import (
        dhash64,
    )

    img = _img(32, 32, colors=10, seed=101)
    a = dhash64(write_vp8l(img, palette=True))
    b = dhash64(write_vp8l(img, cache_bits=6, backrefs=True))
    assert a == b  # same pixels, different encodings -> same fingerprint


def test_image_features_sweep_webp(spark):
    from sample_dms_kinesis_rds_mariadb_spark.operators.multimodal import (
        extract_image_features,
    )

    blob = write_vp8l(_img(25, 15, colors=8, seed=5))
    df = spark.createDataFrame(
        [(1, bytearray(blob))], "media_id long, content binary"
    )
    row = extract_image_features(df).collect()[0]
    assert row["format"] == "webp"
    assert (row["width"], row["height"]) == (25, 15)


def test_cross_format_transcode_dup_png_webp(spark):
    """The transcode-duplicate story for images (the Vorbis/MP3 audio
    dual): the SAME pixels saved as PNG and as lossless WebP must meet
    in image_near_pairs at hamming 0 — lossless transcoding cannot
    hide an image from the dedup path."""
    from tests.test_png import encode_png

    from sample_dms_kinesis_rds_mariadb_spark.operators.image_dedup import (
        image_near_pairs,
    )

    img = _img(32, 24, colors=12, seed=77)
    png = encode_png(32, 24, 3, img[:, :, :3].tobytes())
    webp = write_vp8l(img, palette=True, backrefs=True)
    other = _img(32, 24, seed=1234)  # unrelated noise image
    png_other = encode_png(32, 24, 3, other[:, :, :3].tobytes())
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(webp)), (3, bytearray(png_other))],
        "media_id long, content binary",
    )
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in image_near_pairs(df).collect()}
    assert pairs.get((1, 2)) == 0
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_select_predictor_tie_goes_to_top():
    """§4.2: Select returns LEFT only when strictly closer; ties go to
    TOP (r13 self-review fix — the roundtrip suite shares _select with
    the writer, so this pins the spec side independently)."""
    from sample_dms_kinesis_rds_mariadb_spark.operators.webp_lossless import (
        _select,
    )

    def px(v):
        return (0xFF << 24) | (v << 16) | (v << 8) | v

    # pL == pT (exact tie) -> TOP
    assert _select(px(10), px(20), px(15)) == px(20)
    # strictly closer LEFT (pL = sum|T-TL| < pT = sum|L-TL|) -> LEFT
    assert _select(px(10), px(16), px(15)) == px(10)


def test_animated_webp_falls_back_to_header_metadata():
    """r13 self-review fix: an extended (VP8X) WebP with no top-level
    VP8L chunk must keep reporting header metadata through
    decode_image, never an error row."""
    import struct

    from sample_dms_kinesis_rds_mariadb_spark.operators.multimodal import (
        decode_image,
    )

    vp8x = (b"VP8X" + struct.pack("<I", 10)
            + bytes([0x10, 0, 0, 0])           # alpha flag
            + (639).to_bytes(3, "little") + (479).to_bytes(3, "little"))
    blob = (b"RIFF" + struct.pack("<I", 4 + len(vp8x)) + b"WEBP" + vp8x)
    w, h, channels, fmt = decode_image(blob)
    assert (w, h, channels, fmt) == (640, 480, 4, "webp")
