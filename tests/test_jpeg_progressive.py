"""Progressive JPEG decode (SOF2) vs the INDEPENDENT spec-derived
progressive encoder in tests/jpeg_writer.py.

The central property: the progressive encoder writes the SAME quantized
coefficients as the baseline encoder, only framed as spectral-selection +
successive-approximation scans — so the decoder must reconstruct pixels
BIT-IDENTICAL to the baseline decode. Any slip in the EOB-run protocol,
the correction-bit buffering (BE/BR split), the point transforms, or the
per-scan table/predictor state breaks exact equality somewhere."""

import numpy as np
import pytest

from sample_dms_kinesis_rds_mariadb_spark.operators.jpeg import (
    ZIGZAG,
    _BitReader,
    _decode_block_ac_first,
    _decode_block_ac_refine,
    _entropy_segments,
    _Huff,
    decode_jpeg,
    parse_jpeg_header,
)
from sample_dms_kinesis_rds_mariadb_spark.operators.multimodal import (
    decode_image,
    resize_image,
)
from tests.jpeg_writer import (
    AC_FLAT,
    _ac_first_block,
    _ac_refine_block,
    _BitWriter,
    _build_codes,
    _ProgState,
    encode_jpeg,
    encode_jpeg_progressive,
)


def _smooth(h, w, channels=None, seed=7):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = 128 + 60 * np.sin(yy / 9.0) + 50 * np.cos(xx / 13.0)
    img = (
        np.stack([base + 10 * k for k in range(channels)], -1)
        if channels
        else base
    )
    return np.clip(img + rng.normal(0, 4, img.shape), 0, 255).astype(np.uint8)


def test_progressive_equals_baseline_gray():
    g = _smooth(33, 49)
    assert decode_jpeg(encode_jpeg_progressive(g, 90)) == decode_jpeg(
        encode_jpeg(g, 90)
    )
    assert parse_jpeg_header(encode_jpeg_progressive(g, 90)) == (49, 33, 1)


@pytest.mark.parametrize("sub", ["4:4:4", "4:2:0", "4:2:2"])
def test_progressive_equals_baseline_color(sub):
    c = _smooth(37, 51, 3, seed=13)
    assert decode_jpeg(encode_jpeg_progressive(c, 85, sub)) == decode_jpeg(
        encode_jpeg(c, 85, sub)
    )


def test_progressive_restart_intervals_pixel_identical():
    c = _smooth(40, 56, 3, seed=3)
    base = decode_jpeg(encode_jpeg(c, 80, "4:2:0"))
    assert decode_jpeg(
        encode_jpeg_progressive(c, 80, "4:2:0", restart_interval=2)
    ) == base


def test_progressive_extreme_content():
    # noise stresses ZRL + dense bands; flat stresses maximal EOB runs
    noise = np.random.default_rng(3).integers(0, 256, (24, 40, 3)).astype(
        np.uint8
    )
    assert decode_jpeg(encode_jpeg_progressive(noise, 70)) == decode_jpeg(
        encode_jpeg(noise, 70)
    )
    flat = np.full((24, 40), 128, np.uint8)
    assert decode_jpeg(encode_jpeg_progressive(flat, 75))[3] == bytes(
        [128]
    ) * (24 * 40)


def test_progressive_custom_scripts():
    g = _smooth(16, 24, seed=11)
    base = decode_jpeg(encode_jpeg(g, 88))
    scripts = [
        # pure spectral selection, no successive approximation
        (((0,), 0, 0, 0, 0), ((0,), 1, 63, 0, 0)),
        # many narrow bands
        (
            ((0,), 0, 0, 0, 0),
            ((0,), 1, 2, 0, 0),
            ((0,), 3, 8, 0, 0),
            ((0,), 9, 30, 0, 0),
            ((0,), 31, 63, 0, 0),
        ),
        # three successive-approximation levels
        (
            ((0,), 0, 0, 0, 2),
            ((0,), 1, 63, 0, 3),
            ((0,), 0, 0, 2, 1),
            ((0,), 1, 63, 3, 2),
            ((0,), 0, 0, 1, 0),
            ((0,), 1, 63, 2, 1),
            ((0,), 1, 63, 1, 0),
        ),
    ]
    for script in scripts:
        got = decode_jpeg(encode_jpeg_progressive(g, 88, script=list(script)))
        assert got == base, f"script {script} diverged"


def test_progressive_dispatch_and_resize():
    c = _smooth(20, 30, 3, seed=17)
    blob = encode_jpeg_progressive(c, 90)
    assert decode_image(blob) == (30, 20, 3, "jpeg")
    out = resize_image(blob, 10, 5)
    assert out.startswith(b"P6\n10 5\n255\n")


def test_progressive_malformed_scans_raise():
    g = _smooth(16, 16)
    blob = encode_jpeg_progressive(g, 85)
    with pytest.raises(ValueError):
        decode_jpeg(blob[: len(blob) * 2 // 3])  # truncated mid-scan


def test_ac_scan_block_protocol_roundtrip():
    """Unit-level fuzz of the AC first+refine protocol across random
    multi-block sequences (EOB runs spanning blocks, ZRL in both modes,
    correction bits crossing run boundaries) — encoder output decoded
    through the real unstuffing path."""
    htab = _Huff(AC_FLAT[0], bytes(AC_FLAT[1]))
    codes = _build_codes(*AC_FLAT)
    rng = np.random.default_rng(42)
    for _trial in range(200):
        nblocks = int(rng.integers(2, 12))
        blocks = []
        for _b in range(nblocks):
            zz = np.zeros(64, dtype=np.int64)
            if rng.integers(0, 4) > 0:
                nnz = int(rng.integers(1, 10))
                pos = rng.choice(np.arange(1, 64), size=nnz, replace=False)
                zz[pos] = rng.integers(-40, 41, nnz)
            blocks.append(zz)
        al = 1

        def scan_bytes(encode_fn, al_arg):
            bw = _BitWriter()
            ps = _ProgState(bw, codes)
            for zz in blocks:
                encode_fn(ps, zz, 1, 63, al_arg)
            ps.emit_eobrun()
            bw.pad_to_byte()
            # route through the real unstuffer (byte stuffing is part of
            # the wire format; a raw reader would see 0x00 stuffing bytes)
            segs, _ = _entropy_segments(bytes(bw.out) + b"\xff\xd9", 0)
            return segs[0]

        first = scan_bytes(_ac_first_block, al)
        refine = scan_bytes(_ac_refine_block, 0)
        dec = [np.zeros(64, dtype=np.int64) for _ in range(nblocks)]
        eob = [0]
        rd = _BitReader(first)
        for blk in dec:
            _decode_block_ac_first(blk, rd, htab, 1, 63, al, eob)
        eob = [0]
        rd = _BitReader(refine)
        for blk in dec:
            _decode_block_ac_refine(blk, rd, htab, 1, 63, 0, eob)
        for b, zz in enumerate(blocks):
            want = np.zeros(64, dtype=np.int64)
            for k in range(1, 64):
                want[ZIGZAG[k]] = zz[k]
            assert (dec[b] == want).all(), f"block {b} mismatched"
