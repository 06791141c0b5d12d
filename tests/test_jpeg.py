"""Baseline JPEG decode (operators/jpeg.py) vs the INDEPENDENT
spec-derived encoder in tests/jpeg_writer.py: round-trip error bounds,
an exact flat-field reconstruction, restart-marker pixel equality,
subsampling layouts, honest unsupported-subformat boundaries, and the
decode_image / resize_image / extract_image_features dispatch wiring."""

import hashlib

import numpy as np
import pytest

from sample_dms_kinesis_rds_mariadb_spark.operators.jpeg import (
    decode_jpeg,
    parse_jpeg_header,
)
from sample_dms_kinesis_rds_mariadb_spark.operators.multimodal import (
    decode_image,
    extract_image_features,
    resize_image,
)
from tests.jpeg_writer import encode_jpeg


def _smooth(h, w, channels=None, seed=7):
    """Band-limited test image: JPEG is a lossy transform codec, so
    round-trip bounds only make sense on signals the codec is built for
    (smooth gradients + mild noise), not white noise."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = 128 + 60 * np.sin(yy / 9.0) + 50 * np.cos(xx / 13.0)
    img = (
        np.stack([base + 10 * k for k in range(channels)], -1)
        if channels
        else base
    )
    return np.clip(img + rng.normal(0, 4, img.shape), 0, 255).astype(np.uint8)


def _decode_arr(blob):
    w, h, c, px = decode_jpeg(blob)
    arr = np.frombuffer(px, np.uint8).astype(np.float64)
    return arr.reshape((h, w, c) if c > 1 else (h, w)), (w, h, c)


def test_flat_field_reconstructs_exactly():
    """All-128 gray: level shift makes every DCT coefficient zero, so the
    decode must be bit-exact regardless of quantization — a known-answer
    test that doesn't depend on the encoder's quality knob."""
    flat = np.full((24, 40), 128, np.uint8)
    arr, (w, h, c) = _decode_arr(encode_jpeg(flat, quality=75))
    assert (w, h, c) == (40, 24, 1)
    assert (arr == 128).all()


def test_gray_roundtrip_and_header():
    img = _smooth(33, 49)  # non-multiple-of-8 dims: exercises edge crop
    blob = encode_jpeg(img, quality=92)
    arr, (w, h, c) = _decode_arr(blob)
    assert (w, h, c) == (49, 33, 1)
    assert abs(arr - img).mean() < 3.0
    assert parse_jpeg_header(blob) == (49, 33, 1)


def test_rgb_444_roundtrip():
    img = _smooth(40, 56, 3)
    arr, (w, h, c) = _decode_arr(encode_jpeg(img, quality=92, subsampling="4:4:4"))
    assert (w, h, c) == (56, 40, 3)
    assert abs(arr - img).mean() < 4.0


def test_rgb_422_roundtrip():
    img = _smooth(37, 51, 3, seed=13)
    blob = encode_jpeg(img, quality=92, subsampling="4:2:2")
    arr, (w, h, c) = _decode_arr(blob)
    assert (w, h, c) == (51, 37, 3)
    assert abs(arr - img).mean() < 5.0
    # DRI framing decodes pixel-identically (MCUs are 16x8 here)
    with_dri = encode_jpeg(img, quality=92, subsampling="4:2:2", restart_interval=3)
    assert decode_jpeg(with_dri)[3] == decode_jpeg(blob)[3]


def test_rgb_420_roundtrip_odd_dims():
    # odd dims force both luma edge-crop and chroma upsample crop
    img = _smooth(37, 51, 3, seed=13)
    arr, (w, h, c) = _decode_arr(encode_jpeg(img, quality=92, subsampling="4:2:0"))
    assert (w, h, c) == (51, 37, 3)
    assert abs(arr - img).mean() < 5.0


def test_quality_monotonicity():
    img = _smooth(32, 32, 3, seed=29)
    maes = []
    for q in (30, 60, 95):
        arr, _ = _decode_arr(encode_jpeg(img, quality=q))
        maes.append(abs(arr - img).mean())
    assert maes[2] < maes[1] < maes[0]


def test_restart_markers_decode_pixel_identical():
    """DRI/RSTn changes only the entropy framing (DC predictor resets +
    byte alignment), never the dequantized coefficients — decoded pixels
    must be EXACTLY equal to the unrestarted encoding's."""
    img = _smooth(40, 56, 3, seed=3)
    plain = encode_jpeg(img, quality=80, subsampling="4:2:0")
    restarted = encode_jpeg(
        img, quality=80, subsampling="4:2:0", restart_interval=2
    )
    assert plain != restarted  # the framings genuinely differ
    assert decode_jpeg(plain)[3] == decode_jpeg(restarted)[3]
    # and a gray DRI stream (interval crossing mid-row) decodes too
    g = _smooth(24, 41, seed=5)
    p2 = encode_jpeg(g, quality=85, restart_interval=3)
    assert decode_jpeg(p2)[3] == decode_jpeg(encode_jpeg(g, quality=85))[3]


def test_unsupported_subformats_raise_honestly():
    img = _smooth(16, 16)
    blob = bytearray(encode_jpeg(img, quality=80))
    sof = blob.find(b"\xff\xc0")
    # SOF2 marker with a baseline-style full-band scan header is MALFORMED
    # progressive (a real progressive stream is exercised positively in
    # test_jpeg_progressive.py) — and the metadata path still reports dims
    prog = bytes(blob[:sof + 1]) + b"\xc2" + bytes(blob[sof + 2 :])
    with pytest.raises(ValueError, match="mixes DC and AC"):
        decode_jpeg(prog)
    assert parse_jpeg_header(prog) == (16, 16, 1)
    assert decode_image(prog) == (16, 16, 1, "jpeg")  # metadata-only path
    # arithmetic coding keeps the honest NotImplementedError boundary
    arith = bytes(blob[:sof + 1]) + b"\xc9" + bytes(blob[sof + 2 :])
    with pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg(arith)
    # 12-bit precision (byte right after the SOF length)
    deep = bytearray(blob)
    deep[sof + 4] = 12
    with pytest.raises(NotImplementedError, match="12-bit"):
        decode_jpeg(bytes(deep))
    # malformed: bad SOI, truncated entropy data
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00\x01rubbish")
    with pytest.raises(ValueError):
        decode_jpeg(bytes(blob[: len(blob) // 2]))


def test_decode_image_dispatch_and_resize():
    img = _smooth(20, 30, 3, seed=17)
    blob = encode_jpeg(img, quality=90)
    assert decode_image(blob) == (30, 20, 3, "jpeg")
    out = resize_image(blob, 10, 5)
    assert out.startswith(b"P6\n10 5\n255\n")
    assert decode_image(out) == (10, 5, 3, "ppm")
    gray = encode_jpeg(_smooth(20, 30, seed=19), quality=90)
    assert decode_image(gray) == (30, 20, 1, "jpeg")
    assert resize_image(gray, 7, 7).startswith(b"P5\n")


def test_fake_mode_falls_back_on_corrupt_jpeg():
    truncated = encode_jpeg(_smooth(16, 16), quality=80)[:40]
    with pytest.raises((ValueError, NotImplementedError)):
        decode_image(truncated)
    w, h, c, fmt = decode_image(truncated, fake=True)
    assert fmt == "fake" and w >= 1 and h >= 1


def test_jpeg_features_dispatch_e2e(spark):
    """extract_image_features over JPEG blobs: real SOF metadata through
    the Arrow-batched mapInPandas plumbing."""
    rows = []
    for i, (h, w, c, sub) in enumerate(
        [(12, 18, 3, "4:2:0"), (9, 15, None, None), (8, 8, 3, "4:4:4")]
    ):
        img = _smooth(h, w, c, seed=40 + i)
        blob = (
            encode_jpeg(img, quality=85, subsampling=sub)
            if c
            else encode_jpeg(img, quality=85)
        )
        rows.append((i, bytearray(blob), "image", f"synthetic://{i}"))
    df = spark.createDataFrame(
        rows, "media_id long, content binary, media_type string, source_uri string"
    )
    got = {r["media_id"]: r for r in extract_image_features(df).collect()}
    assert got[0]["width"] == 18 and got[0]["channels"] == 3
    assert got[1]["height"] == 9 and got[1]["channels"] == 1
    assert got[2]["width"] == 8
    for i, (mid, blob, _t, _u) in enumerate(rows):
        assert got[i]["format"] == "jpeg"
        assert got[i]["sha256"] == hashlib.sha256(bytes(blob)).hexdigest()


def test_baseline_multiscan_non_interleaved_decodes_identically():
    """T.81 allows baseline frames split into one Ns=1 scan per
    component; same quantized coefficients as the interleaved framing,
    so decoded pixels must be EXACTLY equal."""
    from tests.jpeg_writer import encode_jpeg_multiscan

    for sub in ("4:4:4", "4:2:0"):
        img = _smooth(29, 43, 3, seed=57)
        inter = decode_jpeg(encode_jpeg(img, quality=87, subsampling=sub))
        multi = decode_jpeg(encode_jpeg_multiscan(img, quality=87, subsampling=sub))
        assert multi == inter, sub
    g = _smooth(21, 19, seed=58)
    assert decode_jpeg(encode_jpeg_multiscan(g)) == decode_jpeg(encode_jpeg(g))
