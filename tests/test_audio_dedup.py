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


# -- incremental perceptual audio index (r10) ---------------------------------


def _audio_media_df(spark, blobs: dict[int, bytes]):
    return spark.createDataFrame(
        [
            (i, bytearray(b), "audio", f"s://{i}")
            for i, b in sorted(blobs.items())
        ],
        "media_id LONG, content BINARY, media_type STRING, source_uri STRING",
    )


def _clip_family(seed: int, n_samples: int = 26000, rate: int = 8000):
    """(original WAV, µ-law transcode, 2-hop trim) — the duplicate classes
    the near-pair engine is proven to catch."""
    a = _signal(n_samples, rate=rate, seed=seed)
    orig = _wav([int(x) for x in a], rate=rate)
    transcode = _wav_tagged(
        bytes(_ulaw_compress(int(x)) for x in a), 7, rate, 1, 8
    )
    trim = _wav([int(x) for x in a[2 * 1024 :]], rate=rate)
    return orig, transcode, trim


def test_audio_index_incremental_equals_one_shot(spark, tmp_path):
    """AudioDedupIndex (VERDICT r9 #3): arrival-order dedup across 3
    batches equals the one-shot pair relation applied greedily (a clip
    loses iff it aligned-matches ANY lower-id clip — ids encode arrival;
    losers' fingerprints stay in the store so later dups of a dropped
    clip still dedup)."""
    fam_a = _clip_family(11)
    fam_b = _clip_family(31)
    rng = np.random.default_rng(99)
    noise = _wav(
        [int(x) for x in np.clip(rng.normal(0, 8000, 26000), -32000, 32000)],
        rate=8000,
    )
    blobs = {
        1: fam_a[0], 2: fam_b[0],          # batch 1: two originals
        101: fam_a[1], 102: noise,          # batch 2: A-transcode + noise
        201: fam_a[2], 202: fam_b[1],       # batch 3: A-trim + B-transcode
    }
    batches = ([1, 2], [101, 102], [201, 202])

    # ground truth: the one-shot pair relation over ALL clips
    pairs = {
        (r["id_a"], r["id_b"])
        for r in ad.audio_near_pairs(
            _audio_media_df(spark, blobs), max_hamming=6, min_frac=0.5
        ).collect()
    }
    want = [
        i for i in sorted(blobs)
        if not any((j, i) in pairs for j in sorted(blobs) if j < i)
    ]

    idx = ad.AudioDedupIndex.build(
        _audio_media_df(spark, {}), str(tmp_path / "aud-idx"),
        max_hamming=6, min_frac=0.5,
    )
    survivors = []
    for ids in batches:
        kept = idx.dedup_batch(
            _audio_media_df(spark, {i: blobs[i] for i in ids})
        )
        survivors.extend(r["media_id"] for r in kept.collect())
    assert sorted(survivors) == want
    assert 101 not in survivors and 201 not in survivors  # A dups dropped
    assert 202 not in survivors                           # B transcode dropped
    assert {1, 2, 102} <= set(survivors)


def test_audio_index_replay_reload_compact_and_short_clips(spark, tmp_path):
    """Crash-replay idempotence (same-batch stored ids excluded; duplicate
    store rows collapse), reload-from-meta, compaction preserving probes,
    and the too-short-to-fingerprint survivor rule."""
    import glob
    import os

    fam = _clip_family(17)
    path = str(tmp_path / "aud-idx")
    idx = ad.AudioDedupIndex.build(
        _audio_media_df(spark, {}), path, max_hamming=6, min_frac=0.5,
        bands=3,
    )
    batch = _audio_media_df(
        spark, {0: fam[0], 1: fam[1], 2: _wav([5, -5, 5, -5], rate=8000)}
    )
    first = sorted(r["media_id"] for r in idx.dedup_batch(batch).collect())
    # 1 (transcode) loses to 0 in-batch; 2 is too short to fingerprint
    # (no frames -> no pairs) and survives
    assert first == [0, 2]
    replay = sorted(r["media_id"] for r in idx.dedup_batch(batch).collect())
    assert replay == first  # crash-replay: identical verdicts, not []

    # a later near-dup of the DROPPED clip still dedups (loser signatures
    # were appended)
    later = _audio_media_df(spark, {9: fam[2]})
    reloaded = ad.AudioDedupIndex.load(spark, path)
    assert (reloaded.max_hamming, reloaded.bands, reloaded.min_frac) == (
        6, 3, 0.5
    )
    probe = reloaded.probe(later).collect()
    assert {r["stored_id"] for r in probe} >= {0, 1}
    assert reloaded.dedup_batch(later).count() == 0

    # compaction folds files; probes unchanged
    probe_before = sorted(
        (r["new_id"], r["stored_id"])
        for r in reloaded.probe(_audio_media_df(spark, {7: fam[0]})).collect()
    )
    n_before = len(glob.glob(os.path.join(path, "band=*", "*.parquet")))
    assert reloaded.compact(min_files=1) > 0
    assert len(glob.glob(os.path.join(path, "band=*", "*.parquet"))) < n_before
    probe_after = sorted(
        (r["new_id"], r["stored_id"])
        for r in reloaded.probe(_audio_media_df(spark, {7: fam[0]})).collect()
    )
    assert probe_after == probe_before and probe_before


def test_audio_index_probe_plan_shape(spark, tmp_path):
    """The probe is a bucket-bounded equi-join: no cartesian product, no
    Python beyond the Arrow fingerprint pass."""
    fam = _clip_family(23)
    path = str(tmp_path / "aud-idx")
    idx = ad.AudioDedupIndex.build(
        _audio_media_df(spark, {0: fam[0]}), path, max_hamming=6
    )
    probe = idx.probe(_audio_media_df(spark, {5: fam[1]}))
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_undecodable_payload_yields_no_fingerprints(spark):
    """Review fix: a gate-passing payload the sample decoders can't
    handle (here an MP3 selecting a Huffman table outside the verified
    subset — the shape of every LAME-encoded file) contributes ZERO
    fingerprint frames instead of failing the Arrow task, so
    audio_near_pairs still completes and the clip passes as unique."""
    import numpy as np

    from sample_dms_kinesis_rds_mariadb_spark.operators.audio_dedup import (
        audio_fingerprints,
        audio_near_pairs,
    )
    from tests.test_media_containers import mp3_frame
    from tests.test_operators import _wav

    # a Layer III frame whose side info selects table 16 (unverified):
    # same construction as the decoder boundary test
    frame = bytearray(mp3_frame(mono=True))
    base = 4 * 8 + 18
    for val, off, width in ((3, 12, 9), (16, 34, 5), (200, 0, 12)):
        for i, bit in enumerate(format(val, f"0{width}b")):
            if bit == "1":
                pos = base + off + i
                frame[pos // 8] |= 0x80 >> (pos % 8)
    bad_mp3 = bytes(frame)
    a = _signal(26000, seed=9)
    wav = _wav([int(v) for v in a], rate=8000)
    df = spark.createDataFrame(
        [(0, bytearray(wav)), (1, bytearray(wav)), (2, bytearray(bad_mp3))],
        "media_id LONG, content BINARY",
    )
    fps = audio_fingerprints(df)
    assert fps.filter(fps.media_id == 2).count() == 0
    assert fps.filter(fps.media_id == 0).count() > 0
    pairs = audio_near_pairs(df, max_hamming=6, min_frac=0.5).collect()
    ids = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 1) in ids and not any(2 in p for p in ids)
