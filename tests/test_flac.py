"""FLAC frame decode vs the INDEPENDENT spec-derived encoder
(tests/flac_writer.py): FLAC is lossless, so decode must reproduce the
original samples BIT-FOR-BIT across every subframe type, stereo mode,
rice partitioning, and wasted-bits layout — with the format's own
integrity hooks (CRC-8/CRC-16/MD5) catching corruption."""

import math

import numpy as np
import pytest

from sample_dms_kinesis_rds_mariadb_spark.operators.flac import (
    decode_flac_samples,
    flac_metadata,
)
from tests.flac_writer import write_flac


def _sig(n, amp=12000, f=9.0, phase=0.0):
    return [int(amp * math.sin(i / f + phase)) + (i % 11) * 7 for i in range(n)]


def _assert_roundtrip(channels, blob, rate=8000):
    got_rate, got_ch, out, n = decode_flac_samples(blob)
    assert (got_rate, got_ch, n) == (rate, len(channels), len(channels[0]))
    for c, want in enumerate(channels):
        assert list(out[c :: len(channels)]) == list(want), f"channel {c}"


@pytest.mark.parametrize("kind,order", [
    ("fixed", 0), ("fixed", 1), ("fixed", 2), ("fixed", 3), ("fixed", 4),
    ("verbatim", 0),
])
def test_mono_subframe_types_bit_exact(kind, order):
    sig = _sig(500)  # 500 = 2 full 192-blocks + a short last block
    blob = write_flac([sig], subframe=kind, order=order)
    _assert_roundtrip([sig], blob)


def test_constant_subframe():
    sig = [-137] * 400
    blob = write_flac([sig], subframe="constant")
    _assert_roundtrip([sig], blob)


def test_lpc_subframe_bit_exact():
    sig = _sig(450)
    # arbitrary quantized predictor: ANY coefficients make a valid stream;
    # the decoder must invert the exact integer arithmetic incl. the shift
    blob = write_flac(
        [sig], subframe="lpc", order=3, lpc_coefs=[5, -4, 2], lpc_shift=2
    )
    _assert_roundtrip([sig], blob)


@pytest.mark.parametrize("stereo", ["left_side", "right_side", "mid_side",
                                    "independent"])
def test_stereo_decorrelation_modes(stereo):
    left = _sig(384, amp=9000, f=7.0)
    right = [l - int(800 * math.cos(i / 13)) for i, l in enumerate(left)]
    blob = write_flac([left, right], stereo=stereo)
    _assert_roundtrip([left, right], blob)


def test_rice_partitions_and_escape_and_method1():
    sig = _sig(384)
    for kw in (
        {"partition_order": 2},
        {"partition_order": 1, "method": 1},
        {"escape_bits": 17},
        {"escape_bits": 0},
    ):
        base = {"subframe": "fixed", "order": 2}
        base.update(kw)
        if base.get("escape_bits") == 0:
            # escape with 0 raw bits = all residuals zero: only valid for
            # a signal the order-2 predictor reproduces exactly (linear)
            s = list(range(0, 384 * 3, 3))
            blob = write_flac([s], **base)
            _assert_roundtrip([s], blob)
        else:
            blob = write_flac([sig], **base)
            _assert_roundtrip([sig], blob)


def test_wasted_bits():
    sig = [v << 3 for v in _sig(256, amp=1500)]
    blob = write_flac([sig], wasted=3)
    _assert_roundtrip([sig], blob)


def test_24_bit_and_8_bit_samples():
    sig24 = [v * 200 for v in _sig(300)]
    _assert_roundtrip([sig24], write_flac([sig24], bps=24))
    sig8 = [max(-128, min(127, v // 128)) for v in _sig(300)]
    _assert_roundtrip([sig8], write_flac([sig8], bps=8))


def test_corruption_detected():
    sig = _sig(300)
    blob = bytearray(write_flac([sig]))
    meta_end = blob.index(b"\xff\xf8")  # first frame sync
    # flip a bit inside frame data (past header): CRC-16 must catch it
    blob[meta_end + 24] ^= 0x40
    with pytest.raises(ValueError, match="CRC"):
        decode_flac_samples(bytes(blob))
    # tamper the STREAMINFO md5: decode must refuse
    blob2 = bytearray(write_flac([sig]))
    blob2[8 + 18] ^= 0xFF  # first md5 byte (4 magic + 4 hdr + 18 offset)
    with pytest.raises(ValueError, match="MD5"):
        decode_flac_samples(bytes(blob2))


def test_metadata_agrees_with_decode():
    sig = _sig(700)
    blob = write_flac([sig], sample_rate=44100)
    meta = flac_metadata(blob)
    rate, ch, out, n = decode_flac_samples(blob)
    assert meta["sample_rate"] == rate == 44100
    assert meta["total_samples"] == n == 700
    assert meta["channels"] == ch == 1


def test_audio_features_dispatch_flac(spark):
    """decode_audio routes fLaC payloads; extract_audio_features computes
    the rms from the REAL decoded stream."""
    from sample_dms_kinesis_rds_mariadb_spark.operators.multimodal import (
        decode_audio,
        extract_audio_features,
    )

    left = _sig(400, amp=7000)
    right = _sig(400, amp=5000, phase=1.2)
    blob = write_flac([left, right], sample_rate=16000, stereo="mid_side")
    rate, ch, bits, n_frames, _off, kind = decode_audio(blob)
    assert (rate, ch, bits, n_frames, kind) == (16000, 2, 16, 400, "flac")
    media = spark.createDataFrame(
        [(3, bytearray(blob))], "media_id LONG, content BINARY"
    )
    feats = extract_audio_features(media).collect()[0]
    assert feats["format"] == "flac"
    assert feats["sample_rate"] == 16000 and feats["n_frames"] == 400
    inter = np.empty(800, dtype=np.float64)
    inter[0::2], inter[1::2] = left, right
    want_rms = float(np.sqrt((inter ** 2).mean()))
    assert feats["rms"] == pytest.approx(want_rms, rel=1e-12)


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=20, deadline=None)
@given(
    blocks=st.integers(1, 3),
    block=st.sampled_from([192, 256]),
    bps=st.sampled_from([8, 16, 24]),
    kind=st.sampled_from(["fixed", "verbatim", "lpc"]),
    order=st.integers(0, 2),
    porder=st.integers(0, 2),
    method=st.integers(0, 1),
    wasted=st.integers(0, 2),
    seed=st.integers(0, 10_000),
)
def test_flac_roundtrip_property(
    blocks, block, bps, kind, order, porder, method, wasted, seed
):
    """FLAC is lossless: ANY signal through ANY (subframe type, rice
    partitioning, parameter width, wasted bits, sample width) must
    round-trip bit-exactly, with CRCs and MD5 all verifying."""
    rng = np.random.default_rng(seed)
    lim = 1 << (bps - 1 - wasted)
    sig = [int(x) << wasted for x in rng.integers(-lim, lim, blocks * block)]
    kw = dict(
        bps=bps, block_size=block, subframe=kind, order=max(order, 1),
        partition_order=porder, method=method, wasted=wasted,
    )
    if kind == "fixed":
        kw["order"] = order
    elif kind == "lpc":
        kw.update(lpc_coefs=[3, -2][: max(order, 1)], lpc_shift=1)
    blob = write_flac([sig], **kw)
    _rate, _ch, out, n = decode_flac_samples(blob)
    assert n == len(sig)
    assert list(out) == sig
