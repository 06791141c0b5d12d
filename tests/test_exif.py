"""EXIF orientation + ICC presence (operators/exif.py) vs INDEPENDENT
spec-composed fixtures: a hand-packed EXIF APP1 TIFF block (both byte
orders, all 8 orientation values), ICC APP2 segments, TIFF IFD0 entries
written by tests/tiff_writer.py, and the end-to-end wiring through
extract_image_features' schema."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from sample_dms_kinesis_rds_mariadb_spark.operators.exif import (
    image_orientation_icc,
    jpeg_orientation_icc,
    tiff_orientation_icc,
)
from tests.jpeg_writer import encode_jpeg
from tests.tiff_writer import write_tiff


def exif_tiff_block(orientation: int, big_endian: bool = False) -> bytes:
    """Independent EXIF payload: TIFF header + one-entry IFD0 carrying
    tag 274 (orientation, SHORT) — packed by hand from the TIFF 6.0
    layout, not via the module under test."""
    bo = ">" if big_endian else "<"
    head = (b"MM" if big_endian else b"II") + struct.pack(bo + "H", 42)
    head += struct.pack(bo + "I", 8)  # IFD0 at offset 8
    ifd = struct.pack(bo + "H", 1)  # one entry
    ifd += struct.pack(bo + "HHI", 274, 3, 1)
    ifd += struct.pack(bo + "H", orientation) + b"\x00\x00"  # inline value
    ifd += struct.pack(bo + "I", 0)  # no next IFD
    return head + ifd


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def with_metadata(jpeg: bytes, orientation: int | None = None,
                  icc: bool = False, big_endian: bool = False) -> bytes:
    extra = b""
    if orientation is not None:
        extra += _seg(0xE1, b"Exif\x00\x00" + exif_tiff_block(orientation, big_endian))
    if icc:
        extra += _seg(0xE2, b"ICC_PROFILE\x00" + bytes([1, 1]) + b"\x00" * 32)
    return jpeg[:2] + extra + jpeg[2:]


@pytest.fixture(scope="module")
def base_jpeg():
    rng = np.random.default_rng(5)
    return encode_jpeg(rng.integers(0, 256, (16, 16, 3), dtype=np.uint8))


@pytest.mark.parametrize("orientation", list(range(1, 9)))
@pytest.mark.parametrize("big_endian", [False, True])
def test_jpeg_exif_orientation_all_values(base_jpeg, orientation, big_endian):
    j = with_metadata(base_jpeg, orientation=orientation, big_endian=big_endian)
    assert jpeg_orientation_icc(j) == (orientation, False)


def test_jpeg_icc_and_combined(base_jpeg):
    assert jpeg_orientation_icc(base_jpeg) == (None, False)
    assert jpeg_orientation_icc(with_metadata(base_jpeg, icc=True)) == (None, True)
    assert jpeg_orientation_icc(
        with_metadata(base_jpeg, orientation=6, icc=True)
    ) == (6, True)


def test_jpeg_malformed_exif_degrades_not_raises(base_jpeg):
    # APP1 claims Exif but the TIFF block is garbage — image stays usable
    j = base_jpeg[:2] + _seg(0xE1, b"Exif\x00\x00" + b"XX" * 5) + base_jpeg[2:]
    assert jpeg_orientation_icc(j) == (None, False)
    # out-of-spec orientation value (0) treated as unrecorded
    j = with_metadata(base_jpeg, orientation=0)
    assert jpeg_orientation_icc(j) == (None, False)


def test_jpeg_non_jpeg_raises():
    with pytest.raises(ValueError, match="SOI"):
        jpeg_orientation_icc(b"NOPE")


@pytest.mark.parametrize("big_endian", [False, True])
@pytest.mark.parametrize("orientation", [1, 3, 6, 8])
def test_tiff_orientation_both_orders(orientation, big_endian):
    px = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    bo = "big" if big_endian else "little"
    t = write_tiff(
        px,
        big_endian=big_endian,
        extra_entries=[(274, 3, 1, orientation.to_bytes(2, bo))],
    )
    assert tiff_orientation_icc(t) == (orientation, False)


def test_tiff_icc_presence_out_of_line():
    px = np.zeros((4, 4, 3), dtype=np.uint8)
    icc_payload = b"\x00" * 64  # >4 bytes -> out-of-line UNDEFINED entry
    t = write_tiff(
        px,
        extra_entries=[(34675, 7, len(icc_payload), icc_payload)],
    )
    assert tiff_orientation_icc(t) == (None, True)
    # the pixel decoder still decodes the same file (unknown-type tags
    # are spec-skipped there)
    from sample_dms_kinesis_rds_mariadb_spark.operators.tiff import decode_tiff

    w, h, c, pix = decode_tiff(t)
    assert (w, h, c) == (4, 4, 3)


def test_dispatch_and_feature_schema(spark):
    px = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    rng = np.random.default_rng(5)
    jpeg = with_metadata(
        encode_jpeg(rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)),
        orientation=6, icc=True,
    )
    tiff = write_tiff(px, extra_entries=[(274, 3, 1, (3).to_bytes(2, "little"))])
    ppm = b"P6\n4 4\n255\n" + bytes(48)
    assert image_orientation_icc(jpeg) == (6, True)
    assert image_orientation_icc(tiff) == (3, False)
    assert image_orientation_icc(ppm) == (None, False)
    assert image_orientation_icc(b"") == (None, False)

    from sample_dms_kinesis_rds_mariadb_spark.operators.multimodal import (
        extract_image_features,
    )

    df = spark.createDataFrame(
        [(1, bytearray(jpeg)), (2, bytearray(tiff)), (3, bytearray(ppm))],
        "media_id long, content binary",
    )
    rows = {r["media_id"]: r for r in extract_image_features(df).collect()}
    assert rows[1]["orientation"] == 6 and rows[1]["has_icc_profile"] is True
    assert rows[2]["orientation"] == 3 and rows[2]["has_icc_profile"] is False
    assert rows[3]["orientation"] is None and rows[3]["has_icc_profile"] is False
    assert rows[1]["format"] == "jpeg" and rows[2]["format"] == "tiff"
