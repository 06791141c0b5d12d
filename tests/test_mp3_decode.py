"""MPEG-1 Layer III sample decode vs the independent spec-derived
encoder (tests/mp3_writer.py — the flac_writer/jpeg_writer adversarial
pattern): structural completeness of every shipped Huffman table,
filterbank and MDCT stage exactness, full encode→decode distortion
bounds (mono, LR stereo, MS stereo, long- and short-block intensity
stereo, mixed blocks, the unscaled short tail band, bit reservoir),
the documented boundaries, and the transcode-detection class through
audio_dedup.audio_near_pairs (WAV original vs MP3 re-encode)."""

from __future__ import annotations

import numpy as np
import pytest

from sample_dms_kinesis_rds_mariadb_spark.operators import mp3_layer3 as L3
from tests.mp3_writer import analyze_subbands, write_mp3


def _tone(n, rate=44100, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / rate
    return (
        9000 * np.sin(2 * np.pi * 440 * t)
        + 4000 * np.sin(2 * np.pi * 1200 * t + 0.6)
        + 1500 * np.sin(2 * np.pi * 3300 * t + 1.1)
        + 40 * rng.normal(size=n)
    )


def _snr(ref, got):
    err = ref - got
    return 10 * np.log10((ref @ ref) / (err @ err + 1e-30))


_DELAY = 1087  # 511 (polyphase pair) + 576 (MDCT granule TDAC)


# --- structural table validation ---------------------------------------------


def test_huffman_tables_are_complete_prefix_codes():
    """Every shipped code table is a COMPLETE prefix code (Kraft sum
    exactly 1, unique codewords, no codeword prefixing another) — the
    property that makes the decoder total on any bit pattern."""
    tables = {f"big{tid}": (l, c) for tid, (_d, l, c) in L3.HUFF_BIG.items()}
    tables["count1A"] = L3.HUFF_COUNT1A
    for name, (lens, codes) in tables.items():
        kraft = sum(2.0 ** -l for l in lens)
        assert kraft == 1.0, f"{name}: Kraft sum {kraft}"
        bits = [format(c, f"0{l}b") for l, c in zip(lens, codes)]
        assert all(len(b) == ln for b, ln in zip(bits, lens)), name
        assert len(set(bits)) == len(bits), f"{name}: duplicate codeword"
        for a in bits:
            for b in bits:
                assert a == b or not b.startswith(a), (
                    f"{name}: {a} prefixes {b}"
                )
    for tid, (dim, lens, _c) in L3.HUFF_BIG.items():
        assert len(lens) == dim * dim, f"table {tid} shape"


def test_huffman_roundtrip_every_symbol():
    """Encode every symbol of every table with its own codeword and
    decode it back — the tree builder and the bit-at-a-time decoder
    agree on the whole alphabet."""
    for tid, (dim, lens, codes) in L3.HUFF_BIG.items():
        bw_bits = []
        for ln, cd in zip(lens, codes):
            bw_bits.extend((cd >> (ln - 1 - i)) & 1 for i in range(ln))
        data = bytearray()
        acc = list(bw_bits) + [0] * 7
        for i in range(0, len(bw_bits), 8):
            data.append(int("".join(map(str, acc[i : i + 8])), 2))
        br = L3.BitReader(bytes(data))
        for sym in range(dim * dim):
            got = L3._huff_decode(br, L3._BIG_TREES[tid], L3._MAXLEN_BIG[tid])
            assert got == sym, (tid, sym)


# --- stage exactness ---------------------------------------------------------


def test_polyphase_pair_snr():
    """Analysis (independent encoder direction) → PolyphaseSynth must
    reconstruct at ≥ 55 dB with unit gain and 511-sample delay — the
    computed near-PR prototype's frozen contract."""
    rng = np.random.default_rng(3)
    x = rng.normal(size=8192)
    S = analyze_subbands(x)
    y = L3.PolyphaseSynth().run(S)
    a = x[2000:7000]
    b = y[2000 + 511 : 7000 + 511]
    g = (a @ b) / (b @ b)
    assert abs(g - 1.0) < 0.01
    assert _snr(a, b) > 55.0


def test_alias_butterflies_are_exact_inverses():
    from tests.mp3_writer import _alias_encode

    rng = np.random.default_rng(4)
    v = rng.normal(size=576)
    assert np.max(np.abs(L3.alias_reduce(_alias_encode(v)) - v)) < 1e-12
    # and the decoder-side inverse flag round-trips too
    assert np.max(
        np.abs(L3.alias_reduce(L3.alias_reduce(v, inverse=True)) - v)
    ) < 1e-12


def test_mdct_tdac_chain_is_lossless():
    """Encoder spectrum → alias_reduce → IMDCT → overlap-add reproduces
    the subband stream exactly (one-granule TDAC delay, > 200 dB)."""
    from tests.mp3_writer import _granule_spectrum

    rng = np.random.default_rng(5)
    x = 1000 * rng.normal(size=18 * 32 * 12)
    S = analyze_subbands(x)
    ov = np.zeros((32, 18))
    recs = []
    for gr in range(10):
        spec = _granule_spectrum(S, gr)
        ss, ov = L3.imdct_granule(L3.alias_reduce(spec), 0, ov)
        recs.append(ss)
    rec = np.concatenate(recs, axis=0)
    a = S[18 * 1 : 18 * 8].reshape(-1)
    b = rec[18 * 1 + 18 : 18 * 8 + 18].reshape(-1)
    assert _snr(a, b) > 200.0


# --- full round trips --------------------------------------------------------


def test_mono_roundtrip_distortion_bound():
    rate = 44100
    x = _tone(rate // 2, rate)
    sr, ch, y = L3.decode_mp3_samples(write_mp3(x, rate, 1))
    assert (sr, ch) == (rate, 1)
    a = x[3000:18000]
    b = y[3000 + _DELAY : 18000 + _DELAY]
    assert _snr(a, b) > 18.0                       # stated distortion bound
    assert abs(np.sqrt((b * b).mean()) / np.sqrt((a * a).mean()) - 1) < 0.1


def test_stereo_lr_and_ms_roundtrip():
    rate = 44100
    base = _tone(rate // 2, rate, seed=7)
    left, right = base, np.roll(base, 11) * 0.6
    inter = np.empty(2 * len(base))
    inter[0::2], inter[1::2] = left, right
    for mode in ("lr", "ms"):
        sr, ch, y = L3.decode_mp3_samples(
            write_mp3(inter, rate, 2, mode=mode)
        )
        assert (sr, ch) == (rate, 2)
        for ref, got in ((left, y[0::2]), (right, y[1::2])):
            a = ref[3000:15000]
            b = got[3000 + _DELAY : 15000 + _DELAY]
            assert _snr(a, b) > 16.0, mode


def _is_fixture(rate, n, ratio, seed=3, mono_hz=None):
    """Stereo pair for the intensity tests: independent L/R tones below
    the bound (sfb 13 = line 90 ≈ 3.4 kHz at 44.1k), a constant-panned
    complex above it with L = ratio * R, and an optional MONO tone at
    ``mono_hz`` (for the is_pos==7 band test)."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / rate
    low_l = 8000 * np.sin(2 * np.pi * 440 * t) + 3000 * np.sin(
        2 * np.pi * 1100 * t + 0.4
    )
    low_r = 7000 * np.sin(2 * np.pi * 620 * t + 0.2) + 2500 * np.sin(
        2 * np.pi * 1500 * t
    )
    high = 4000 * np.sin(2 * np.pi * 5000 * t + 0.9) + 2000 * np.sin(
        2 * np.pi * 6100 * t
    ) + 30 * rng.normal(size=n)
    left = low_l + ratio * high
    right = low_r + high
    if mono_hz is not None:
        mono = 3500 * np.sin(2 * np.pi * mono_hz * t + 0.3)
        left = left + mono
        right = right + mono
    inter = np.empty(2 * n)
    inter[0::2], inter[1::2] = left, right
    return left, right, inter


def test_intensity_stereo_roundtrip():
    """Long-block intensity stereo end to end: the writer transmits L+R
    above sfb 13 with per-band is_pos in the right channel's scalefactor
    field and rzero pinned at the bound; the decoder reconstructs the
    panning exactly for a constant-panned source (is_pos=4 ⇒
    L = tan(60°)·R). Both pure-IS and combined MS+IS frames."""
    rate = 44100
    ratio = np.tan(4 * np.pi / 12)  # is_pos = 4, recovered exactly
    left, right, inter = _is_fixture(rate, rate // 2, ratio)
    for mode in ("is", "ms_is"):
        out = write_mp3(inter, rate, 2, mode=mode)
        # header really flags intensity (mode_extension bit 0)
        assert (out[3] >> 6) == 0b01 and (out[3] >> 4) & 1, mode
        sr, ch, y = L3.decode_mp3_samples(out)
        assert (sr, ch) == (rate, 2)
        for ref, got in ((left, y[0::2]), (right, y[1::2])):
            a = ref[3000:15000]
            b = got[3000 + _DELAY : 15000 + _DELAY]
            assert _snr(a, b) > 16.0, mode


def test_intensity_is_pos7_band_falls_back_to_ms():
    """An is_pos==7 band inside the intensity region is NOT intensity
    decoded — the decoder falls back to MS for it (mode_ext = MS+IS).
    The fixture makes that band's content mono (L == R), which the MS
    fallback carries faithfully while the surrounding bands ride
    intensity."""
    rate = 44100
    ratio = np.tan(2 * np.pi / 12)
    # 6800 Hz -> line ~178: scalefactor band 16 (lines 162-196)
    left, right, inter = _is_fixture(rate, rate // 2, ratio, mono_hz=6800)
    out = write_mp3(inter, rate, 2, mode="ms_is", is_pos7_sfb=16)
    sr, ch, y = L3.decode_mp3_samples(out)
    assert (sr, ch) == (rate, 2)
    for ref, got in ((left, y[0::2]), (right, y[1::2])):
        a = ref[3000:15000]
        b = got[3000 + _DELAY : 15000 + _DELAY]
        assert _snr(a, b) > 16.0
    # and without the fallback band the same fixture still decodes (the
    # mono tone is intensity-representable at is_pos=3) — guard that the
    # is_pos7 path actually changed the bitstream
    assert out != write_mp3(inter, rate, 2, mode="ms_is")


def _is_short_fixture(rate, n, ratio, seed=17):
    """Stereo pair for the SHORT-block intensity tests: dense
    independent L/R tone stacks below the bound (short sfb 6 = line 30 ≈
    3.4 kHz) — every band 0-5 carries energy in every window, so the
    decoder's per-window zero-pattern bound lands exactly at 6 — and a
    constant-panned pair of tones above it with L = ratio * R."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / rate
    low_l = sum(
        a * np.sin(2 * np.pi * f * t + p)
        for a, f, p in [(7000, 300, 0.0), (5000, 700, 0.4), (4000, 1150, 0.9),
                        (3500, 1700, 1.3), (3000, 2300, 0.2),
                        (2800, 3000, 0.7)]
    )
    low_r = sum(
        a * np.sin(2 * np.pi * f * t + p)
        for a, f, p in [(6500, 380, 0.5), (5200, 820, 0.1), (4200, 1300, 1.1),
                        (3600, 1900, 0.8), (3100, 2500, 1.5),
                        (2900, 3200, 0.3)]
    )
    high = 4000 * np.sin(2 * np.pi * 5000 * t + 0.9) + 2200 * np.sin(
        2 * np.pi * 6100 * t
    ) + 25 * rng.normal(size=n)
    left = low_l + ratio * high
    right = low_r + high
    inter = np.empty(2 * n)
    inter[0::2], inter[1::2] = left, right
    return left, right, inter


def test_short_block_intensity_roundtrip():
    """SHORT-block intensity stereo end to end: the writer transmits
    L+R above short sfb 6 with per-(band, window) is_pos in the right
    channel's scalefactor field (and VERIFIES the decoder's per-window
    zero-pattern bound detection lands exactly at 6); the decoder
    reconstructs the panning for a constant-panned source. Both pure-IS
    and combined MS+IS frames."""
    rate = 44100
    ratio = np.tan(4 * np.pi / 12)  # is_pos = 4, recovered exactly
    left, right, inter = _is_short_fixture(rate, rate // 2, ratio)
    for mode in ("is", "ms_is"):
        out = write_mp3(inter, rate, 2, mode=mode, block_type=2,
                        is_bound_sfb=6)
        assert (out[3] >> 6) == 0b01 and (out[3] >> 4) & 1, mode
        sr, ch, y = L3.decode_mp3_samples(out)
        assert (sr, ch) == (rate, 2)
        for ref, got in ((left, y[0::2]), (right, y[1::2])):
            a = ref[3000:15000]
            b = got[3000 + _DELAY : 15000 + _DELAY]
            assert _snr(a, b) > 15.0, mode


def test_mixed_block_intensity_raises():
    """Mixed-block intensity stereo stays a documented boundary: a
    mixed-block stereo stream whose first header is patched to
    joint-stereo+IS raises precisely."""
    rate = 44100
    base = _tone(rate // 4, rate, seed=11)
    inter = np.empty(2 * len(base))
    inter[0::2], inter[1::2] = base, np.roll(base, 7) * 0.8
    stream = bytearray(
        write_mp3(inter, rate, 2, mode="lr", block_type=2, mixed=True)
    )
    stream[3] = (0b01 << 6) | (0b01 << 4)  # joint stereo, IS on
    with pytest.raises(NotImplementedError, match="mixed-block intensity"):
        L3.decode_mp3_samples(bytes(stream))


def test_short_block_roundtrip_distortion_bound():
    """block_type 2 end to end: the writer's three 12-point MDCTs per
    subband in Huffman (sfb-major, window-contiguous) order drive the
    decoder's windowed side info, short scalefactors, reorder_short,
    12×3 IMDCT and overlap-add — distortion at the same bound as long
    blocks."""
    rate = 44100
    x = _signal_fm(rate // 2, rate, seed=5)
    sr, ch, y = L3.decode_mp3_samples(write_mp3(x, rate, 1, block_type=2))
    assert (sr, ch) == (rate, 1)
    a = x[3000:18000]
    b = y[3000 + _DELAY : 18000 + _DELAY]
    assert _snr(a, b) > 18.0
    assert abs(np.sqrt((b * b).mean()) / np.sqrt((a * a).mean()) - 1) < 0.1


def test_mixed_block_roundtrip_distortion_bound():
    """Mixed blocks end to end: long sfbs 0-7 over the two lower
    subbands (36-point MDCT, normal long window, long-border-only alias
    butterflies) + short sfbs 3-11 over subbands 2-31, the mixed
    scalefactor layout (17·slen1 + 18·slen2 bits), and the per-subband
    hybrid IMDCT — distortion at the established bound."""
    rate = 44100
    x = _signal_fm(rate // 2, rate, seed=21)
    sr, ch, y = L3.decode_mp3_samples(
        write_mp3(x, rate, 1, block_type=2, mixed=True)
    )
    assert (sr, ch) == (rate, 1)
    a = x[3000:18000]
    b = y[3000 + _DELAY : 18000 + _DELAY]
    assert _snr(a, b) > 18.0
    assert abs(np.sqrt((b * b).mean()) / np.sqrt((a * a).mean()) - 1) < 0.1
    # and a mixed stream really differs from the non-mixed short stream
    assert write_mp3(x, rate, 1, block_type=2, mixed=True) != write_mp3(
        x, rate, 1, block_type=2
    )


def test_short_block_tail_band_requantizes():
    """Lines above the last short scalefactor band (band 12, ≥15.6 kHz
    at 44.1 kHz) requantize at the window gain and reorder like any
    band — a 16.5 kHz tone survives a short-block round trip instead of
    being silently zeroed."""
    rate = 44100
    t = np.arange(rate // 2) / rate
    x = 8000 * np.sin(2 * np.pi * 16500 * t) + 3000 * np.sin(
        2 * np.pi * 440 * t
    )
    sr, ch, y = L3.decode_mp3_samples(write_mp3(x, rate, 1, block_type=2))
    assert (sr, ch) == (rate, 1)
    a = x[3000:18000]
    b = y[3000 + _DELAY : 18000 + _DELAY]
    assert _snr(a, b) > 14.0
    # the tone is really there: energy at 16.5 kHz within 12% of source
    win = np.hanning(8192)
    f = np.fft.rfftfreq(8192, 1 / rate)
    bin_ = np.argmin(np.abs(f - 16500))
    pa = np.abs(np.fft.rfft(a[:8192] * win))[bin_]
    pb = np.abs(np.fft.rfft(b[:8192] * win))[bin_]
    assert pb == pytest.approx(pa, rel=0.12)


def test_bit_reservoir_roundtrip_and_truncated_start():
    """main_data_begin back-pointers: a stream whose frames each donate
    their first 40 main-data bytes to the previous frame decodes
    byte-identically to the no-reservoir stream; a stream cut mid-
    reservoir skips cleanly to the first self-contained frame."""
    rate = 44100
    x = _tone(rate // 2, rate, seed=9)
    plain = write_mp3(x, rate, 1)
    res = write_mp3(x, rate, 1, reservoir_shift=40)
    assert plain != res
    _sr, _ch, y0 = L3.decode_mp3_samples(plain)
    _sr, _ch, y1 = L3.decode_mp3_samples(res)
    assert np.array_equal(y0, y1)
    frame_len = 144 * 320000 // rate
    _sr, _ch, y2 = L3.decode_mp3_samples(res[frame_len:])
    # frame 1 is consumed as reservoir priming (begin > available), the
    # rest decodes: 2 frames' worth shorter than the full stream
    assert len(y2) == len(y1) - 2 * 1152


def test_documented_boundaries_raise():
    from tests.test_media_containers import mp3_frame

    # MPEG-2 LSF Layer III DECODES as of r11 (the zero frame → silence)
    sr, ch, y = L3.decode_mp3_samples(mp3_frame(mpeg1=False, bitrate_idx=4))
    assert sr == 22050 and len(y) % 576 == 0 and not np.any(y)
    # ... and so does MPEG-1 Layer II (r11)
    sr, ch, y = L3.decode_mp3_samples(mp3_frame(layer3=False))
    assert sr == 44100 and len(y) % 1152 == 0 and not np.any(y)
    with pytest.raises(ValueError, match="no MPEG audio frames"):
        L3.decode_mp3_samples(b"\x00" * 64)
    # a frame whose side info selects an unverified Huffman table: build
    # a zero frame and set granule-0 table_select[0]=16 with nonzero
    # big_values (bit layout: side info starts at byte 4; granule fields
    # begin after 9+5+4=18 bits; big_values at +12, table_select[0] at
    # +12+9+8+4+1 = +34 bits -> bit 52 overall)
    frame = bytearray(mp3_frame(mono=True))
    base = 4 * 8 + 18
    for i, bit in enumerate(f"{3:09b}"):        # big_values = 3
        if bit == "1":
            pos = base + 12 + i
            frame[pos // 8] |= 0x80 >> (pos % 8)
    for i, bit in enumerate(f"{16:05b}"):       # table_select[0] = 16
        if bit == "1":
            pos = base + 34 + i
            frame[pos // 8] |= 0x80 >> (pos % 8)
    # part2_3_length must cover the spectrum bits: set to 200
    for i, bit in enumerate(f"{200:012b}"):
        if bit == "1":
            pos = base + i
            frame[pos // 8] |= 0x80 >> (pos % 8)
    with pytest.raises(NotImplementedError, match="table 16"):
        L3.decode_mp3_samples(bytes(frame))


# --- Layer I -----------------------------------------------------------------


def _l1_tone(n, rate=44100):
    t = np.arange(n) / rate
    return (
        9000 * np.sin(2 * np.pi * 440 * t)
        + 4000 * np.sin(2 * np.pi * 1200 * t + 0.6)
        + 1500 * np.sin(2 * np.pi * 3300 * t + 1.1)
    )


def test_layer1_mono_and_stereo_roundtrip():
    """MPEG-1 Layer I end to end vs the independent encoder: 4-bit
    allocations, 6-bit scalefactor indices, midtread requantization,
    polyphase synthesis — only the 511-sample filterbank delay, no MDCT
    stage, so the bound is far above Layer III's."""
    from tests.mp3_writer import write_mp1

    rate = 44100
    x = _l1_tone(rate // 2, rate)
    sr, ch, y = L3.decode_mp3_samples(write_mp1(x, rate, 1))
    assert (sr, ch) == (rate, 1)
    assert _snr(x[3000:18000], y[3000 + 511 : 18000 + 511]) > 40.0
    left, right = x, np.roll(x, 11) * 0.6
    inter = np.empty(2 * len(x))
    inter[0::2], inter[1::2] = left, right
    sr, ch, y = L3.decode_mp3_samples(write_mp1(inter, rate, 2))
    assert (sr, ch) == (rate, 2)
    for ref, got in ((left, y[0::2]), (right, y[1::2])):
        assert _snr(ref[3000:18000], got[3000 + 511 : 18000 + 511]) > 40.0


def test_layer1_intensity_joint_stereo():
    """Layer I joint (intensity) stereo: above the mode_extension bound
    the sample codes are shared and each channel rebuilds via its OWN
    scalefactor — a source panned at an exact scalefactor-table ratio
    (0.5 = one 2^(-1/3) triple-step) reconstructs both channels."""
    from tests.mp3_writer import write_mp1

    rate = 44100
    t = np.arange(rate // 2) / rate
    low_l = 8000 * np.sin(2 * np.pi * 440 * t)
    low_r = 7000 * np.sin(2 * np.pi * 620 * t + 0.2)
    m = 4000 * np.sin(2 * np.pi * 6000 * t + 0.9) + 2000 * np.sin(
        2 * np.pi * 7100 * t
    )
    left, right = low_l + m, low_r + 0.5 * m
    inter = np.empty(2 * len(t))
    inter[0::2], inter[1::2] = left, right
    blob = write_mp1(inter, rate, 2, mode="intensity", bound_band=8)
    assert (blob[3] >> 6) == 0b01  # joint stereo flagged
    sr, ch, y = L3.decode_mp3_samples(blob)
    assert (sr, ch) == (rate, 2)
    assert _snr(left[3000:18000], y[0::2][3000 + 511 : 18000 + 511]) > 40.0
    assert _snr(right[3000:18000], y[1::2][3000 + 511 : 18000 + 511]) > 40.0


def test_layer1_forbidden_codes_raise():
    """The all-ones allocation code (15) and scalefactor index 63 are
    forbidden by ISO — both raise instead of decoding garbage."""
    from tests.mp3_writer import write_mp1

    rate = 44100
    blob = bytearray(write_mp1(_l1_tone(1200, rate), rate, 1))
    blob[4] |= 0xF0  # first allocation nibble -> 15
    with pytest.raises(ValueError, match="allocation code 15"):
        L3.decode_mp3_samples(bytes(blob))
    blob = bytearray(write_mp1(_l1_tone(1200, rate), rate, 1))
    # scalefactors start right after 32 allocation nibbles (= 16 bytes)
    blob[4 + 16] |= 0xFC  # first 6-bit scalefactor index -> 63
    with pytest.raises(ValueError, match="scalefactor index 63"):
        L3.decode_mp3_samples(bytes(blob))


# --- dispatch + perceptual-dedup integration ---------------------------------


def test_decode_audio_samples_dispatch_and_features(spark):
    from sample_dms_kinesis_rds_mariadb_spark.operators.multimodal import (
        decode_audio,
        decode_audio_samples,
        extract_audio_features,
    )

    rate = 44100
    x = _tone(rate // 2, rate)
    blob = write_mp3(x, rate, 1)
    meta = decode_audio(blob)
    assert meta[0] == rate and meta[1] == 1 and meta[5] == "mp3"
    sr, ch, samples = decode_audio_samples(blob)
    assert sr == rate and ch == 1 and len(samples) > len(x)
    df = spark.createDataFrame(
        [(0, bytearray(blob))], "media_id LONG, content BINARY"
    )
    row = extract_audio_features(df).collect()[0]
    assert row["format"] == "mp3" and row["rms"] is not None
    # rms within 12% of the source signal's (quantization + delay pads)
    assert row["rms"] == pytest.approx(float(np.sqrt((x * x).mean())),
                                       rel=0.12)


def _signal_fm(n, rate, seed=0):
    """Tones + FM sweep + noise — the audio_dedup test-signal family:
    band energies vary over time, which is what the Haitsma-Kalker
    second-difference bits encode."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / rate
    sig = (
        6000 * np.sin(2 * np.pi * 440 * t)
        + 3500 * np.sin(2 * np.pi * 880 * t + 0.7)
        + 2000 * np.sin(2 * np.pi * 1760 * t + 1.3)
        + 900 * np.sin(2 * np.pi * (500 + 300 * np.sin(2 * np.pi * 0.7 * t)) * t)
        + 150 * rng.normal(size=n)
    )
    return np.clip(sig, -32000, 32000)


def test_wav_vs_mp3_transcode_detected_by_audio_near_pairs(spark):
    """The crawl-dedup class that motivated the decoder: the SAME audio
    as WAV PCM16 and as an MP3 re-encode must pair via the perceptual
    fingerprints; unrelated audio must not. Operating point: the test
    encoder's verified-Huffman-subset quantizer distorts at ~21 dB —
    HARSHER than any real 128-320 kbps encoder (-35..-45 dB) — so the
    matcher runs at max_hamming=10 / min_frac=0.3, i.e. the published
    Haitsma-Kalker BER threshold (0.35 ≈ 11 of 32 bits), where the
    measured separation is transcode 0.46 vs unrelated 0.06."""
    from sample_dms_kinesis_rds_mariadb_spark.operators.audio_dedup import (
        audio_near_pairs,
    )
    from tests.test_operators import _wav

    rate = 44100
    x = _signal_fm(2 * rate, rate, seed=5)
    wav_blob = _wav([int(v) for v in x], rate=rate)
    mp3_blob = write_mp3(x, rate, 1)
    rng = np.random.default_rng(13)
    noise = _wav(
        [int(v) for v in np.clip(rng.normal(0, 8000, 2 * rate), -32000,
                                 32000)],
        rate=rate,
    )
    df = spark.createDataFrame(
        [(0, bytearray(wav_blob)), (1, bytearray(mp3_blob)),
         (2, bytearray(noise))],
        "media_id LONG, content BINARY",
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["match_frac"]
        for r in audio_near_pairs(df, max_hamming=10, min_frac=0.3).collect()
    }
    assert (0, 1) in pairs, "WAV->MP3 transcode not detected"
    assert not any(2 in p for p in pairs), "unrelated audio matched"


def test_audio_features_survive_corrupt_mp3_side_info(spark):
    """Review fix: an MP3 whose side info drives the bit reader past the
    frame (IndexError, not ValueError) must not kill the Arrow feature
    pass — the rms column comes back NULL and the row survives the
    fake_decode gate contract."""
    from sample_dms_kinesis_rds_mariadb_spark.operators.multimodal import (
        extract_audio_features,
    )
    from tests.test_media_containers import mp3_frame

    frame = bytearray(mp3_frame(mono=True))
    base = 4 * 8 + 18
    # big_values=400 with table 10 but a tiny zero-filled frame: the
    # spectrum read runs off the end of main data
    for val, off, width in ((4000, 0, 12), (400, 12, 9), (10, 34, 5)):
        for i, bit in enumerate(format(val, f"0{width}b")):
            if bit == "1":
                pos = base + off + i
                frame[pos // 8] |= 0x80 >> (pos % 8)
    df = spark.createDataFrame(
        [(0, bytearray(bytes(frame) * 3))], "media_id LONG, content BINARY"
    )
    row = extract_audio_features(df, fake_decode=True).collect()[0]
    assert row["format"] == "mp3" and row["rms"] is None


# --- property fuzz (the test_flac_roundtrip_property precedent) ----------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=10, deadline=None)
@given(
    mode=st.sampled_from(["mono", "lr", "ms"]),
    block=st.sampled_from([("long", False), ("short", False),
                           ("short", True)]),
    rate=st.sampled_from([44100, 48000, 32000]),
    seed=st.integers(0, 10_000),
    n_tones=st.integers(2, 5),
)
def test_mp3_roundtrip_property(mode, block, rate, seed, n_tones):
    """ANY tonal signal through ANY (stereo mode × block shape × sample
    rate) must decode within the codec's distortion bound and preserve
    rms — the structural paths (side info, scalefactor layouts incl.
    mixed, requantize, reorder, hybrid IMDCT, polyphase) hold across the
    whole parameter grid, not just the hand-picked fixtures."""
    from hypothesis import assume

    kind, mixed = block
    rng = np.random.default_rng(seed)
    n = rate // 4
    t = np.arange(n) / rate
    freqs = rng.uniform(120, 9000, n_tones)
    amps = rng.uniform(1500, 9000, n_tones)
    phases = rng.uniform(0, 2 * np.pi, n_tones)
    x = sum(a * np.sin(2 * np.pi * f * t + p)
            for a, f, p in zip(amps, freqs, phases))
    x = np.clip(x, -32000, 32000)
    bt = 2 if kind == "short" else 0
    try:
        if mode == "mono":
            blob = write_mp3(x, rate, 1, block_type=bt, mixed=mixed)
        else:
            left, right = x, np.roll(x, 13) * 0.7
            inter = np.empty(2 * n)
            inter[0::2], inter[1::2] = left, right
            blob = write_mp3(inter, rate, 2, mode=mode, block_type=bt,
                             mixed=mixed)
    except ValueError as exc:
        # the fixture encoder's simplistic CBR rate loop can't always fit
        # a dense random tone stack — an encoder capacity limit, not a
        # decoder property
        assert "bitstream overflow" in str(exc)
        assume(False)
    sr, ch, y = L3.decode_mp3_samples(blob)
    if mode == "mono":
        assert (sr, ch) == (rate, 1)
        got = [(x, y)]
    else:
        assert (sr, ch) == (rate, 2)
        got = [(left, y[0::2]), (right, y[1::2])]
    lo = 3000
    hi = min(9000, n - 1000, len(got[0][1]) - _DELAY)
    for ref, out in got:
        a = ref[lo:hi]
        b = out[lo + _DELAY : hi + _DELAY]
        assert _snr(a, b) > 13.0, (mode, kind, mixed, rate)
        assert abs(np.sqrt((b * b).mean()) /
                   (np.sqrt((a * a).mean()) + 1e-9) - 1) < 0.15


# --- MPEG-2 / 2.5 LSF Layer III (r11) -----------------------------------------


def test_lsf_mono_roundtrip_all_six_rates():
    """MPEG-2 (22.05/24/16 kHz) and MPEG-2.5 (11.025/12/8 kHz) mono
    long-block streams from the independent LSF writer decode within
    the stated distortion bound. One granule per frame: sample count is
    a multiple of 576."""
    from tests.mp3_writer import write_mp3_lsf

    for rate in (22050, 24000, 16000, 11025, 12000, 8000):
        x = _tone(rate, rate, seed=3)  # one second at every rate
        sr, ch, y = L3.decode_mp3_samples(write_mp3_lsf(x, rate, 1))
        assert (sr, ch) == (rate, 1)
        assert len(y) % 576 == 0
        a = x[3000 : rate - 2000]
        b = y[3000 + _DELAY : rate - 2000 + _DELAY]
        assert _snr(a, b) > 17.0, rate


def test_lsf_stereo_lr_and_ms_roundtrip():
    rate = 22050
    # noise-free fixture: the LSF stereo frame budget (501 main-data
    # bytes at CBR-160 for BOTH channels of the single granule) cannot
    # carry _tone()'s noise floor once it passes the quantizer's gate
    t = np.arange(rate // 2) / rate
    env = np.minimum(t / 0.05, 1.0)  # fade-in: no broadband attack
    base = (9000 * np.sin(2 * np.pi * 440 * t)
            + 4000 * np.sin(2 * np.pi * 1200 * t + 0.6)) * env
    right = (9000 * np.sin(2 * np.pi * 440 * t + 0.4)
             + 4000 * np.sin(2 * np.pi * 1200 * t + 1.0)) * 0.6 * env
    left = base
    inter = np.empty(2 * len(base))
    inter[0::2], inter[1::2] = left, right
    from tests.mp3_writer import write_mp3_lsf

    for mode in ("lr", "ms"):
        sr, ch, y = L3.decode_mp3_samples(
            write_mp3_lsf(inter, rate, 2, mode=mode)
        )
        assert (sr, ch) == (rate, 2)
        for ref, got in ((left, y[0::2]), (right, y[1::2])):
            a = ref[3000:9000]
            b = got[3000 + _DELAY : 9000 + _DELAY]
            assert _snr(a, b) > 15.0, mode


def test_lsf_short_block_roundtrip():
    rate = 16000
    x = _tone(rate // 2, rate, seed=13)
    from tests.mp3_writer import write_mp3_lsf

    sr, ch, y = L3.decode_mp3_samples(
        write_mp3_lsf(x, rate, 1, block_type=2)
    )
    assert (sr, ch) == (rate, 1)
    a = x[3000:6000]
    b = y[3000 + _DELAY : 6000 + _DELAY]
    assert _snr(a, b) > 15.0


def test_lsf_bit_reservoir_roundtrip():
    """The 8-bit LSF main_data_begin: frames donating their first 40
    main-data bytes to the previous frame decode byte-identically."""
    rate = 24000
    x = _tone(rate // 2, rate, seed=9)
    from tests.mp3_writer import write_mp3_lsf

    plain = write_mp3_lsf(x, rate, 1)
    res = write_mp3_lsf(x, rate, 1, reservoir_shift=40)
    assert plain != res
    _sr, _ch, y0 = L3.decode_mp3_samples(plain)
    _sr, _ch, y1 = L3.decode_mp3_samples(res)
    assert np.array_equal(y0, y1)


def test_lsf_scalefac_compress_layouts():
    """The three LSF (slen, nr_of_sfb) rows of ISO 13818-3 §2.4.3.2,
    including the implied preflag (no preflag bit exists in LSF side
    info) and exact bit consumption per row."""
    assert L3._lsf_slen(399) == ((4, 4, 3, 3), 0, 0)
    assert L3._lsf_slen(0) == ((0, 0, 0, 0), 0, 0)
    # row 1: sfc 400..499
    s = 450 - 400
    assert L3._lsf_slen(450) == (((s >> 2) // 5, (s >> 2) % 5, s % 4, 0),
                                 1, 0)
    # row 2: sfc >= 500 implies preflag
    assert L3._lsf_slen(517) == ((5, 2, 0, 0), 2, 1)

    # bit-exact read: row-2 long layout = 11 sfbs at slen0 + 10 at slen1
    g = {"scalefac_compress": 500 + 2 * 3 + 1, "block_type": 0,
         "mixed_block_flag": 0}  # slen (2, 1)
    vals = [3, 2, 1, 0, 3, 2, 1, 0, 3, 2, 1] + [1, 0, 1, 0, 1, 0, 1, 0, 1, 0]
    bw_bits = "".join(f"{v:02b}" for v in vals[:11]) + "".join(
        f"{v:01b}" for v in vals[11:]
    )
    data = bytes(
        int(bw_bits[i : i + 8].ljust(8, "0"), 2)
        for i in range(0, len(bw_bits), 8)
    )
    br = L3.BitReader(data)
    sf = L3.read_scalefactors_lsf(br, g)
    assert g["preflag"] == 1
    assert sf["l"][:21] == vals
    assert br.pos == 11 * 2 + 10 * 1


def test_lsf_intensity_stereo_raises():
    from tests.mp3_writer import write_mp3_lsf

    rate = 22050
    t = np.arange(rate // 4) / rate
    base = 9000 * np.sin(2 * np.pi * 440 * t)
    inter = np.empty(2 * len(base))
    inter[0::2], inter[1::2] = base, base * 0.5
    blob = bytearray(write_mp3_lsf(inter, rate, 2, mode="lr"))
    blob[3] = (0b01 << 6) | (0b01 << 4)  # joint stereo, IS on
    with pytest.raises(NotImplementedError, match="LSF.*intensity"):
        L3.decode_mp3_samples(bytes(blob))


def test_lsf_8khz_mixed_block_raises():
    """8 kHz MPEG-2.5 mixed blocks: no short-band edge lands on line 12
    and the long bands are 12 lines wide, so the 36-line mixed split
    does not align with the 8 kHz band tables — decoding with the
    6-band LSF assumption would emit silently wrong samples for lines
    36-71. Documented boundary: a precise raise, never garble."""
    g = {"block_type": 2, "mixed_block_flag": 1, "scalefac_scale": 0,
         "global_gain": 210, "subblock_gain": [0, 0, 0], "preflag": 0}
    sf = {"l": [0] * 22, "s": [[0, 0, 0] for _ in range(13)]}
    ix = np.zeros(576)
    with pytest.raises(NotImplementedError, match="8 kHz.*mixed"):
        L3.requantize(ix, g, sf, 8000)
    # every other LSF rate still takes the 6-band mixed path
    for rate in (22050, 24000, 16000, 11025, 12000):
        assert L3.requantize(ix, g, sf, rate).shape == (576,)


def test_lsf_sfb_tables_are_structurally_valid():
    """Every LSF band table: strictly increasing, correct entry count,
    correct endpoint — plus the cross-version invariant that the mixed
    long region (lines 0-35) spans exactly 6 LSF long sfbs (vs 8 in
    MPEG-1)."""
    for rate in L3.LSF_RATES:
        lo = L3.SFB_LONG[rate]
        sh = L3.SFB_SHORT[rate]
        assert len(lo) == 23 and lo[0] == 0 and lo[-1] == 576
        assert len(sh) == 14 and sh[0] == 0 and sh[-1] == 192
        assert all(a < b for a, b in zip(lo, lo[1:]))
        assert all(a < b for a, b in zip(sh, sh[1:]))
        if rate != 8000:
            assert lo[6] == 36  # mixed-block long region = 6 sfbs
    for rate in (44100, 48000, 32000):
        assert L3.SFB_LONG[rate][8] == 36  # MPEG-1: 8 sfbs


@settings(max_examples=8, deadline=None)
@given(
    mode=st.sampled_from(["mono", "lr", "ms"]),
    block=st.sampled_from(["long", "short"]),
    rate=st.sampled_from([22050, 24000, 16000, 11025, 12000, 8000]),
    seed=st.integers(0, 10_000),
    n_tones=st.integers(2, 4),
)
def test_lsf_roundtrip_property(mode, block, rate, seed, n_tones):
    """The LSF grid dual of test_mp3_roundtrip_property: ANY tonal
    signal through ANY (stereo mode × block shape × LSF sample rate)
    decodes within the distortion bound — the single-granule frames,
    LSF side info, 9-bit scalefac_compress partitions, and LSF band
    tables hold across the parameter space."""
    from hypothesis import assume

    from tests.mp3_writer import write_mp3_lsf

    rng = np.random.default_rng(seed)
    n = rate // 2
    t = np.arange(n) / rate
    top = 0.42 * rate  # stay under Nyquist at the low LSF rates
    freqs = rng.uniform(120, top, n_tones)
    amps = rng.uniform(1500, 9000, n_tones)
    phases = rng.uniform(0, 2 * np.pi, n_tones)
    env = np.minimum(t / 0.05, 1.0)
    x = sum(a * np.sin(2 * np.pi * f * t + p)
            for a, f, p in zip(amps, freqs, phases)) * env
    x = np.clip(x, -32000, 32000)
    bt = 2 if block == "short" else 0
    try:
        if mode == "mono":
            blob = write_mp3_lsf(x, rate, 1, block_type=bt)
        else:
            left, right = x, np.roll(x, 13) * 0.7
            inter = np.empty(2 * n)
            inter[0::2], inter[1::2] = left, right
            blob = write_mp3_lsf(inter, rate, 2, mode=mode, block_type=bt)
    except ValueError as exc:
        assert "bitstream overflow" in str(exc)
        assume(False)
    sr, ch, y = L3.decode_mp3_samples(blob)
    if mode == "mono":
        assert (sr, ch) == (rate, 1)
        got = [(x, y)]
    else:
        assert (sr, ch) == (rate, 2)
        got = [(left, y[0::2]), (right, y[1::2])]
    lo = 2000
    hi = min(n - 500, len(got[0][1]) - _DELAY)
    for ref, out in got:
        a = ref[lo:hi]
        b = out[lo + _DELAY : hi + _DELAY]
        assert _snr(a, b) > 12.0, (mode, block, rate)
        assert abs(np.sqrt((b * b).mean()) /
                   (np.sqrt((a * a).mean()) + 1e-9) - 1) < 0.15


def test_lsf_mp3_transcode_dup_detected(spark):
    """Cross-version transcode duplicates: the SAME 16 kHz signal as a
    WAV original and as its MPEG-2 LSF MP3 transcode must pair through
    audio_near_pairs — the speech/low-bitrate class the LSF decoder
    exists for (before r11 these payloads were error rows)."""
    from sample_dms_kinesis_rds_mariadb_spark.operators.audio_dedup import (
        audio_near_pairs,
    )
    from tests.mp3_writer import write_mp3_lsf
    from tests.test_operators import _wav

    rate = 16000
    x = _signal_fm(2 * rate, rate, seed=5)
    wav_blob = _wav([int(v) for v in x], rate=rate)
    mp3_blob = write_mp3_lsf(x, rate, 1)
    rng = np.random.default_rng(13)
    noise = _wav(
        [int(v) for v in np.clip(rng.normal(0, 8000, 2 * rate), -32000,
                                 32000)],
        rate=rate,
    )
    df = spark.createDataFrame(
        [(0, bytearray(wav_blob)), (1, bytearray(mp3_blob)),
         (2, bytearray(noise))],
        "media_id LONG, content BINARY",
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["match_frac"]
        for r in audio_near_pairs(df, max_hamming=10, min_frac=0.3).collect()
    }
    assert (0, 1) in pairs, "WAV->LSF-MP3 transcode not detected"
    assert not any(2 in p for p in pairs), "unrelated audio matched"


# --- Layer II (r11) ------------------------------------------------------------


def _l2_fixture(rate, n, stereo=False, seed=4):
    """Fade-in tone mixture (no broadband onset: low-bitrate Layer II
    CBR frames can't carry an attack transient's allocation)."""
    t = np.arange(n) / rate
    env = np.minimum(t / 0.05, 1.0)
    a = (9000 * np.sin(2 * np.pi * 440 * t)
         + 4000 * np.sin(2 * np.pi * 1200 * t + 0.6)) * env
    if not stereo:
        return a
    b = 7000 * np.sin(2 * np.pi * 600 * t + 0.2) * env
    inter = np.empty(2 * n)
    inter[0::2], inter[1::2] = a, b
    return a, b, inter


def test_layer2_mono_roundtrip_all_tables():
    """Layer II across all four allocation tables: B.2a (48 kHz / 192),
    B.2b (44.1 kHz / 192), B.2c (44.1 kHz / 48), B.2d (32 kHz / 48) —
    grouped (9/5-level triplet codes) and ungrouped classes both on the
    path, scfsi cycling all four sharing modes."""
    from tests.mp3_writer import write_mp2

    for rate, br in ((48000, 192), (44100, 192), (44100, 48),
                     (32000, 48), (32000, 192)):
        n = rate // 2
        x = _l2_fixture(rate, n)
        sr, ch, y = L3.decode_mp3_samples(write_mp2(x, rate, 1,
                                                    bitrate=br))
        assert (sr, ch) == (rate, 1)
        assert len(y) % 1152 == 0
        a = x[3000 : n - 2000]
        b = y[3000 + 511 : n - 2000 + 511]
        assert _snr(a, b) > 16.0, (rate, br)
        assert abs(np.sqrt((b * b).mean()) /
                   np.sqrt((a * a).mean()) - 1) < 0.1, (rate, br)


def test_layer2_stereo_roundtrip():
    from tests.mp3_writer import write_mp2

    rate = 44100
    n = rate // 2
    left, right, inter = _l2_fixture(rate, n, stereo=True)
    sr, ch, y = L3.decode_mp3_samples(write_mp2(inter, rate, 2,
                                                bitrate=384))
    assert (sr, ch) == (rate, 2)
    for ref, got in ((left, y[0::2]), (right, y[1::2])):
        a = ref[3000 : n - 2000]
        b = got[3000 + 511 : n - 2000 + 511]
        assert _snr(a, b) > 16.0


def test_layer2_requant_classes():
    """Grouped-class dequantization is symmetric and midtread-exact:
    the code for 0 decodes to 0, extremes are ±(levels-1)/levels-ish
    and mirror-symmetric; ungrouped classes share the Layer I formula."""
    for levels in (3, 5, 9):
        vals = [L3._l2_requant(v, levels) for v in range(levels)]
        assert abs(vals[levels // 2]) < 1e-12          # midtread zero
        for i in range(levels):
            assert abs(vals[i] + vals[levels - 1 - i]) < 1e-12
        assert max(vals) < 1.0
    assert L3._l2_requant(7, 15) == L3._l1_requant(7, 4)


def test_layer2_layout_selection():
    """The Table B.2 selection rule: per-channel bitrate <= 48 -> C/D
    tables; 48 kHz otherwise always B.2a; 96+ kbps/ch at 44.1/32 ->
    B.2b."""
    assert L3._l2_layout(44100, 48, 1)[0] == 8    # B.2c
    assert L3._l2_layout(32000, 48, 1)[0] == 12   # B.2d
    assert L3._l2_layout(48000, 192, 1)[0] == 27  # B.2a (48k: always)
    assert L3._l2_layout(48000, 384, 2)[0] == 27
    assert L3._l2_layout(44100, 80, 1)[0] == 27   # B.2a
    assert L3._l2_layout(44100, 192, 1)[0] == 30  # B.2b
    assert L3._l2_layout(32000, 384, 2)[0] == 30
    # nbal pattern of B.2a: 4,4,3,2 over the group boundaries
    _sbl, per_sb = L3._l2_layout(44100, 80, 1)
    assert [per_sb[i][0] for i in (0, 3, 11, 23)] == [4, 4, 3, 2]


def test_layer2_lsf_layout():
    """ISO 13818-3 Table B.1 is ONE layout for every LSF rate/bitrate:
    30 subbands, nbal 4/3/2 over the 4/7/19 groups, the grouped 3/5/9
    classes available in EVERY subband (the low-bitrate design point),
    and no 7-level or 65535-level classes anywhere."""
    for rate in (22050, 24000, 16000, 11025, 12000, 8000):
        for br in (8, 64, 160):
            sbl, per_sb = L3._l2_layout(rate, br, 1, lsf=True)
            assert sbl == 30
            assert [per_sb[i][0] for i in (0, 3, 4, 10, 11, 29)] == \
                [4, 4, 3, 3, 2, 2]
            for _nbal, classes in per_sb:
                assert classes[:3] == (3, 5, 9)
                assert 7 not in classes and 65535 not in classes
    # MPEG-1 selection unaffected
    assert L3._l2_layout(44100, 192, 1)[0] == 30


def test_layer2_lsf_mono_roundtrip_all_six_rates():
    """MPEG-2 and MPEG-2.5 Layer II (r12): the single Table B.1
    allocation layout decodes within the distortion bound at every LSF
    rate, from the independent encoder's write direction."""
    from tests.mp3_writer import write_mp2

    for rate, br in ((22050, 96), (24000, 96), (16000, 64),
                     (11025, 48), (12000, 48), (8000, 32)):
        n = max(rate // 2, 8000)  # keep the steady-state window non-empty
        x = _l2_fixture(rate, n)
        sr, ch, y = L3.decode_mp3_samples(write_mp2(x, rate, 1,
                                                    bitrate=br))
        assert (sr, ch) == (rate, 1)
        assert len(y) % 1152 == 0
        a = x[3000 : n - 2000]
        b = y[3000 + 511 : n - 2000 + 511]
        assert _snr(a, b) > 15.0, (rate, br)
        assert abs(np.sqrt((b * b).mean()) /
                   np.sqrt((a * a).mean()) - 1) < 0.1, (rate, br)


def test_layer2_lsf_stereo_roundtrip():
    from tests.mp3_writer import write_mp2

    rate = 22050
    n = rate // 2
    left, right, inter = _l2_fixture(rate, n, stereo=True)
    sr, ch, y = L3.decode_mp3_samples(write_mp2(inter, rate, 2,
                                                bitrate=160))
    assert (sr, ch) == (rate, 2)
    for ref, got in ((left, y[0::2]), (right, y[1::2])):
        a = ref[3000 : n - 2000]
        b = got[3000 + 511 : n - 2000 + 511]
        assert _snr(a, b) > 15.0
