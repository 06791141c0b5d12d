"""Perceptual audio dedup: Haitsma-Kalker spectral fingerprints vs an
independent direct-DFT reference, lossless format invariance (the same
samples through WAV-PCM16 and FLAC must fingerprint identically),
transcode (G.711) and time-shift robustness through the near-pair
engine, and the Arrow/no-cartesian plan shape."""

from __future__ import annotations

import math

import numpy as np
import pytest

from sample_dms_kinesis_rds_mariadb_spark.operators import audio_dedup as ad
from tests.flac_writer import write_flac
from tests.test_operators import _ulaw_compress, _wav, _wav_tagged


def _signal(n, rate=8000, seed=0):
    """Deterministic tone mixture + small seeded noise: band energies sit
    comfortably away from sign boundaries."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / rate
    sig = (
        6000 * np.sin(2 * np.pi * 440 * t)
        + 3500 * np.sin(2 * np.pi * 880 * t + 0.7)
        + 2000 * np.sin(2 * np.pi * 1760 * t + 1.3)
        + 900 * np.sin(2 * np.pi * (500 + 300 * np.sin(2 * np.pi * 0.7 * t)) * t)
        + 150 * rng.normal(size=n)
    )
    return np.clip(sig, -32000, 32000).astype(np.int64)


def _ref_fingerprints(samples, rate, frame, hop, n_bands=33):
    """INDEPENDENT reference: plain-loop Hann window, DIRECT-summation
    DFT magnitudes, independently recomputed log band edges, the
    published sign-bit rule."""
    sig = [float(x) for x in samples]
    if len(sig) < frame + hop:
        return []
    win = [0.5 - 0.5 * math.cos(2 * math.pi * i / (frame - 1)) for i in range(frame)]
    f_lo, f_hi = 300.0, min(3000.0, 0.45 * rate)
    edges_hz = [
        math.exp(
            math.log(f_lo)
            + (math.log(f_hi) - math.log(f_lo)) * m / n_bands
        )
        for m in range(n_bands + 1)
    ]
    bins = [round(h * frame / rate) for h in edges_hz]
    for i in range(1, len(bins)):
        if bins[i] <= bins[i - 1]:
            bins[i] = bins[i - 1] + 1
    n_frames = 1 + (len(sig) - frame) // hop
    energies = []
    for k in range(n_frames):
        seg = [sig[k * hop + i] * win[i] for i in range(frame)]
        # direct DFT over just the needed bins
        e = []
        for m in range(n_bands):
            total = 0.0
            for b in range(bins[m], bins[m + 1]):
                re = sum(
                    seg[i] * math.cos(2 * math.pi * b * i / frame)
                    for i in range(frame)
                )
                im = -sum(
                    seg[i] * math.sin(2 * math.pi * b * i / frame)
                    for i in range(frame)
                )
                total += re * re + im * im
            e.append(total)
        energies.append(e)
    out = []
    for k in range(1, n_frames):
        v = 0
        for m in range(n_bands - 1):
            d_now = energies[k][m] - energies[k][m + 1]
            d_prev = energies[k - 1][m] - energies[k - 1][m + 1]
            if d_now - d_prev > 0:
                v |= 1 << m
        out.append(v)
    return out


def test_fingerprint_matches_independent_reference():
    """Direct-DFT plain-loop reference vs the vectorized FFT path: sign
    bits may differ only where a second difference sits inside float
    noise — demand near-total agreement."""
    rate, frame, hop = 8000, 256, 128
    sig = _signal(1600, rate=rate, seed=3)
    got = ad.audio_fingerprint_frames(sig, rate, frame=frame, hop=hop)
    want = _ref_fingerprints(sig, rate, frame, hop)
    assert len(got) == len(want) > 5
    total_ham = sum(
        bin((g ^ w) & 0xFFFFFFFF).count("1") for g, w in zip(got, want)
    )
    assert total_ham <= max(1, len(got) // 2), (
        f"{total_ham} differing bits across {len(got)} frames"
    )


def test_lossless_format_invariance_wav_flac(spark):
    """The SAME samples through WAV PCM16 and FLAC decode to identical
    integers, so fingerprints must be bit-identical — content hashing,
    not byte hashing."""
    sig = [int(x) for x in _signal(6000, seed=5)]
    wav_blob = _wav(sig, rate=8000)
    flac_blob = write_flac([sig], sample_rate=8000)
    df = spark.createDataFrame(
        [(0, bytearray(wav_blob)), (1, bytearray(flac_blob))],
        "media_id LONG, content BINARY",
    )
    fps = ad.audio_fingerprints(df, frame=1024, hop=512).collect()
    by_id: dict[int, dict[int, int]] = {0: {}, 1: {}}
    for r in fps:
        by_id[r["media_id"]][r["frame_no"]] = r["afp"]
    assert by_id[0] == by_id[1] and len(by_id[0]) > 5


def test_mono_samples_dispatch_and_stereo_mean():
    rate, sig = ad.mono_samples(_wav([100, -100, 200, -200], rate=8000))
    assert rate == 8000 and list(sig) == [100.0, -100.0, 200.0, -200.0]
    # stereo averages to mono
    inter = [10, 30, -10, -30]  # frames (10,30), (-10,-30)
    rate, sig = ad.mono_samples(_wav(inter, rate=8000, channels=2))
    assert list(sig) == [20.0, -20.0]
    with pytest.raises(ValueError, match="300 Hz"):
        ad.audio_fingerprint_frames(np.zeros(9000), 500, frame=256, hop=128)


def test_transcode_shift_and_unrelated_pairs(spark):
    """The duplicate classes that matter: B = G.711 µ-law transcode of A
    (every byte differs, ~38 dB SNR), C = A trimmed by two hops
    (temporal shift), D = unrelated noise. A~B and A~C pair with a
    dominant alignment; D pairs with nothing."""
    rate, frame, hop = 8000, 2048, 1024
    a = _signal(26000, rate=rate, seed=11)
    b_codes = bytes(_ulaw_compress(int(x)) for x in a)
    blob_a = _wav([int(x) for x in a], rate=rate)
    blob_b = _wav_tagged(b_codes, 7, rate, 1, 8)  # µ-law transcode
    blob_c = _wav([int(x) for x in a[2 * hop :]], rate=rate)  # shift 2 hops
    rng = np.random.default_rng(99)
    blob_d = _wav(
        [int(x) for x in np.clip(rng.normal(0, 8000, 26000), -32000, 32000)],
        rate=rate,
    )
    df = spark.createDataFrame(
        [
            (0, bytearray(blob_a)),
            (1, bytearray(blob_b)),
            (2, bytearray(blob_c)),
            (3, bytearray(blob_d)),
        ],
        "media_id LONG, content BINARY",
    )
    pairs = {
        (r["id_a"], r["id_b"]): r
        for r in ad.audio_near_pairs(
            df, frame=frame, hop=hop, max_hamming=6, min_frac=0.5
        ).collect()
    }
    assert (0, 1) in pairs, "transcoded copy not detected"
    assert (0, 2) in pairs, "shifted copy not detected"
    assert not any(3 in p for p in pairs), "unrelated audio matched"
    assert pairs[(0, 1)]["match_frac"] >= 0.8
    ac = pairs[(0, 2)]
    assert ac["match_frac"] >= 0.8
    # the alignment offset is the 2-hop trim: aligned dominates scattered
    assert ac["aligned_matches"] >= 0.8 * ac["matched_frames"]


def test_audio_fingerprints_plan_shape(spark):
    df = spark.createDataFrame(
        [(0, bytearray(_wav([int(x) for x in _signal(5000)], rate=8000)))],
        "media_id LONG, content BINARY",
    )
    fps = ad.audio_fingerprints(df)
    plan = fps._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan or "MapInPandas" in plan
    out = ad.audio_near_pairs(df.union(df.select(
        (df.media_id + 1).alias("media_id"), "content")), min_frac=0.1)
    pplan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in pplan
    assert "BroadcastNestedLoopJoin" not in pplan


def test_decode_audio_samples_24_bit_and_features_rms(spark):
    """The shared sample dispatch handles 24-bit PCM (sign extension) and
    the features leg now reports rms for it (it was silently None
    before the dispatch was unified)."""
    import struct

    from sample_dms_kinesis_rds_mariadb_spark.operators.multimodal import (
        decode_audio_samples,
        extract_audio_features,
    )

    samples = [0, 1, -1, 8_388_607, -8_388_608, 123_456, -654_321]
    pcm = b"".join(
        int(s).to_bytes(3, "little", signed=True) for s in samples
    )
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000 * 3, 3, 24)
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    blob = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    rate, ch, sig = decode_audio_samples(blob)
    assert (rate, ch) == (8000, 1)
    assert [int(x) for x in sig] == samples
    media = spark.createDataFrame(
        [(0, bytearray(blob))], "media_id LONG, content BINARY"
    )
    feats = extract_audio_features(media).collect()[0]
    want = float(np.sqrt(np.mean(np.array(samples, dtype=np.float64) ** 2)))
    assert feats["rms"] == pytest.approx(want, rel=1e-12)
    assert feats["bits_per_sample"] == 24 and feats["n_frames"] == 7
