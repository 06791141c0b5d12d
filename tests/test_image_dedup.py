"""Perceptual image dedup vs independent references: dHash/pHash computed
by plain-loop reimplementations over known pixel matrices, cross-format
fingerprint invariance (same pixels through PPM and GIF must hash
identically — both decoders are lossless), banded-join exactness vs a
brute-force all-pairs reference, perturbation/brightness invariants,
the Arrow/no-cartesian plan shape, and video near-dups (re-encode /
trim / unrelated classes over real MJPEG AVIs)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sample_dms_kinesis_rds_mariadb_spark.operators import image_dedup as idd


def _ppm(px: np.ndarray) -> bytes:
    h, w, _ = px.shape
    return b"P6\n%d %d\n255\n" % (w, h) + px.astype(np.uint8).tobytes()


def _pgm(px: np.ndarray) -> bytes:
    h, w = px.shape
    return b"P5\n%d %d\n255\n" % (w, h) + px.astype(np.uint8).tobytes()


def _ref_gray(px: np.ndarray) -> list[list[int]]:
    """Independent integer luma (plain loops)."""
    h, w, _ = px.shape
    return [
        [
            299 * int(px[i][j][0]) + 587 * int(px[i][j][1]) + 114 * int(px[i][j][2])
            for j in range(w)
        ]
        for i in range(h)
    ]


def _ref_resize(g: list[list[int]], out_h: int, out_w: int) -> list[list[int]]:
    """Independent nearest-neighbor: src = (dst * src_len) // dst_len."""
    h, w = len(g), len(g[0])
    return [
        [g[(i * h) // out_h][(j * w) // out_w] for j in range(out_w)]
        for i in range(out_h)
    ]


def _ref_dhash(px: np.ndarray) -> int:
    g = _ref_resize(_ref_gray(px), 8, 9)
    v = 0
    for i in range(8):
        for j in range(8):
            if g[i][j] > g[i][j + 1]:
                v |= 1 << (i * 8 + j)
    return v - (1 << 64) if v >= (1 << 63) else v


def _ref_phash(px: np.ndarray) -> int:
    import math

    g = _ref_resize(_ref_gray(px), 32, 32)
    gf = [[x / 1000.0 for x in row] for row in g]
    # independent direct-summation DCT-II (no matrix algebra)
    coef = [[0.0] * 8 for _ in range(8)]
    for u in range(8):
        for v in range(8):
            s = 0.0
            for i in range(32):
                ci = math.cos(math.pi * (2 * i + 1) * u / 64)
                for j in range(32):
                    s += gf[i][j] * ci * math.cos(math.pi * (2 * j + 1) * v / 64)
            au = math.sqrt(1 / 32) if u == 0 else math.sqrt(2 / 32)
            av = math.sqrt(1 / 32) if v == 0 else math.sqrt(2 / 32)
            coef[u][v] = au * av * s
    flat = [coef[u][v] for u in range(8) for v in range(8)]
    # 63 AC values -> odd count -> median is the 31st sorted value
    med = sorted(flat[1:])[31]
    bits = 0
    for b, x in enumerate(flat):
        if x > med:
            bits |= 1 << b
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def _rand_px(rng, h=40, w=56):
    return rng.integers(20, 236, (h, w, 3), dtype=np.int64)


def test_dhash_matches_independent_reference():
    rng = np.random.default_rng(11)
    for _ in range(6):
        px = _rand_px(rng, int(rng.integers(9, 70)), int(rng.integers(10, 90)))
        assert idd.dhash64(_ppm(px)) == _ref_dhash(px)


def test_phash_matches_independent_reference():
    rng = np.random.default_rng(13)
    for _ in range(3):
        px = _rand_px(rng, 48, 36)
        got = idd.phash64(_ppm(px))
        want = _ref_phash(px)
        # DCT summation order differs (matrix vs direct loops): bits near
        # the median can flip only if a coefficient is within float noise
        # of it — require exact equality, which holds because coefficients
        # on random images sit far (>> 1e-9) from the median
        assert bin((got ^ want) & ((1 << 64) - 1)).count("1") == 0


def test_fingerprints_invariant_across_lossless_formats(spark):
    """Identical pixels through PPM and GIF (both decode losslessly) must
    produce the IDENTICAL fingerprint — the whole point of hashing decoded
    content, not bytes."""
    from tests.gif_writer import write_gif

    rng = np.random.default_rng(7)
    # GIF needs a power-of-two palette: 16 colors
    palette = rng.integers(0, 256, (16, 3), dtype=np.int64)
    idx = rng.integers(0, 16, (24, 33))
    px = palette[idx]
    gif = write_gif(
        [{"indices": idx.astype(np.uint8).tobytes()}],
        33,
        24,
        palette.astype(np.uint8).tobytes(),
    )
    assert idd.dhash64(_ppm(px)) == idd.dhash64(gif)
    assert idd.phash64(_ppm(px)) == idd.phash64(gif)


def test_brightness_shift_invariance():
    """dHash compares neighbors; pHash thresholds AC coefficients on their
    median — a global +c (no clipping) changes only the DC coefficient,
    so both hashes are exactly invariant."""
    rng = np.random.default_rng(5)
    px = rng.integers(40, 200, (30, 30, 3), dtype=np.int64)
    brighter = px + 20
    assert idd.dhash64(_ppm(px)) == idd.dhash64(_ppm(brighter))
    assert idd.phash64(_ppm(px)) == idd.phash64(_ppm(brighter))


def test_grayscale_source_and_perturbation():
    rng = np.random.default_rng(3)
    g = rng.integers(0, 256, (40, 40), dtype=np.int64)
    base = idd.dhash64(_pgm(g))
    # small local perturbation: few bits move
    g2 = g.copy()
    g2[5, 5:9] = 255 - g2[5, 5:9]
    pert = idd.dhash64(_pgm(g2))
    ham = bin((base ^ pert) & ((1 << 64) - 1)).count("1")
    assert ham <= 8
    # unrelated image: far away
    g3 = rng.integers(0, 256, (40, 40), dtype=np.int64)
    far = bin((base ^ idd.dhash64(_pgm(g3))) & ((1 << 64) - 1)).count("1")
    assert far > 16


def test_banded_pairs_exact_vs_bruteforce(spark):
    """The banded join is EXACT for hamming <= bands-1: compare against an
    all-pairs reference on random fingerprints with planted near-dups,
    across even and uneven band splits."""
    rng = np.random.default_rng(42)
    fps = [int(x) for x in rng.integers(-(2**63), 2**63, 60, dtype=np.int64)]
    # plant near-dups: copies of fp[k] with a few flipped bits
    for k, flips in ((0, 2), (1, 4), (2, 7), (3, 0)):
        v = fps[k] & ((1 << 64) - 1)
        for b in rng.choice(64, flips, replace=False):
            v ^= 1 << int(b)
        fps.append(v - (1 << 64) if v >= (1 << 63) else v)
    df = spark.createDataFrame(
        [(i, fp) for i, fp in enumerate(fps)], "media_id LONG, dhash LONG"
    )
    # None = the MIH default (wide bands + radius-ball probe); explicit
    # bands <= max_hamming exercises every per-band radius from the
    # classic identical-key banding (radius 0) down to 2 wide bands
    # (radius 3 over 32-bit keys)
    for max_h, bands in (
        (7, None), (4, 5), (3, 11),   # radius 0 (classic pigeonhole)
        (7, 4), (7, 2), (6, 3),       # MIH: radius 1, 3, 2
        (5, 4), (4, 2),               # uneven splits with radius 1, 2
    ):
        got = {
            (r["id_a"], r["id_b"], r["hamming"])
            for r in idd.banded_hamming_pairs(
                df, max_hamming=max_h, bands=bands
            ).collect()
        }
        want = set()
        for i in range(len(fps)):
            for j in range(i + 1, len(fps)):
                h = bin((fps[i] ^ fps[j]) & ((1 << 64) - 1)).count("1")
                if h <= max_h:
                    want.add((i, j, h))
        assert got == want, f"max_hamming={max_h}, bands={bands}"
    with pytest.raises(ValueError, match="bands must be"):
        idd.banded_hamming_pairs(df, max_hamming=5, bands=0)


def test_mih_band_selection_and_ball():
    """The MIH default picks wide bands: 64-bit/r=7 -> 4 bands of 16-bit
    keys x 17 masks (vs the naive 8 bands of 8-bit keys); 32-bit/r=6 ->
    3 bands; radius-0 splits keep one exact key per band."""
    assert idd._mih_bands(7, 64) == 4
    assert idd._resolve_bands(None, 7, 64) == (4, 1)
    assert idd._mih_bands(6, 32) == 3
    assert idd._resolve_bands(None, 6, 32) == (3, 2)
    assert idd._resolve_bands(None, 0, 64) == (1, 0)
    assert idd._resolve_bands(8, 7, 64) == (8, 0)  # classic banding
    # ball enumeration: all masks within radius, exactly once
    masks = idd._ball_masks(16, 1)
    assert len(masks) == 17 and len(set(masks)) == 17
    assert all(bin(m).count("1") <= 1 for m in masks)
    masks2 = idd._ball_masks(11, 2)
    assert len(masks2) == 1 + 11 + 55 == idd._ball_size(11, 2)
    assert all(0 <= m < (1 << 11) for m in masks2)


def _media_df(spark, blobs):
    return spark.createDataFrame(
        [
            (i, bytearray(b), "image", f"synthetic://{i}")
            for i, b in enumerate(blobs)
        ],
        "media_id LONG, content BINARY, media_type STRING, source_uri STRING",
    )


def test_image_near_pairs_and_dedup_e2e(spark):
    """Decode -> fingerprint -> banded pairs -> transitive dedup, on real
    PPM payloads: A ~ B ~ C transitively clusters even if A and C never
    pair; the unrelated image survives."""
    rng = np.random.default_rng(21)
    base = rng.integers(30, 226, (36, 48, 3), dtype=np.int64)
    near1 = base.copy()
    near1[3, 4:7] += 5  # tiny local change
    near2 = near1.copy()
    near2[20, 10:12] -= 5
    other = rng.integers(30, 226, (36, 48, 3), dtype=np.int64)
    df = _media_df(spark, [_ppm(p) for p in (base, near1, near2, other)])
    pairs = idd.image_near_pairs(df, method="dhash", max_hamming=7).collect()
    pair_set = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 1) in pair_set or (0, 2) in pair_set
    assert not any(3 in p for p in pair_set)
    kept = sorted(
        r["media_id"] for r in idd.dedup_images(df, max_hamming=7).collect()
    )
    # transitive: {0,1,2} one cluster (0,1 and 1,2 pair at minimum) -> keep 0
    assert kept == [0, 3]


def test_fingerprint_plan_shape(spark):
    """Fingerprinting is ONE Arrow pass; the pair join has no cartesian
    product and no Python in the join/verify stages."""
    rng = np.random.default_rng(2)
    df = _media_df(
        spark, [_ppm(_rand_px(rng, 20, 20)) for _ in range(6)]
    )
    fps = idd.image_fingerprints(df)
    plan = fps._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan or "MapInPandas" in plan
    pairs = idd.banded_hamming_pairs(
        fps.select("media_id", "dhash"), max_hamming=7
    )
    pplan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in pplan
    assert "BroadcastNestedLoopJoin" not in pplan


# -- video near-dups (r9) -----------------------------------------------------


def _mjpeg_avi(frame_arrays, quality=90):
    from tests.avi_writer import write_avi
    from tests.jpeg_writer import encode_jpeg

    h, w, _ = frame_arrays[0].shape
    frames = [
        encode_jpeg(a.astype(np.uint8), quality=quality) for a in frame_arrays
    ]
    return write_avi(frames, w, h)


def test_video_fingerprints_real_decode(spark):
    """Container -> frames -> pixels -> dHash: the per-frame fingerprint of
    an MJPEG AVI equals dhash64 of the embedded JPEG bytes directly."""
    from sample_dms_kinesis_rds_mariadb_spark.operators import (
        image_dedup as idd,
    )
    from tests.jpeg_writer import encode_jpeg

    rng = np.random.default_rng(31)
    arrays = [
        np.clip(rng.normal(128, 40, (32, 48, 3)), 0, 255) for _ in range(4)
    ]
    jpegs = [encode_jpeg(a.astype(np.uint8)) for a in arrays]
    from tests.avi_writer import write_avi

    blob = write_avi(jpegs, 48, 32)
    df = _media_df(spark, [blob])
    got = {
        r["frame_no"]: r["frame_dhash"]
        for r in idd.video_fingerprints(df).collect()
    }
    assert got == {i: idd.dhash64(j) for i, j in enumerate(jpegs)}


def test_video_near_pairs_reencode_trim_and_unrelated(spark):
    """The duplicate classes that matter: B = A re-encoded at a lower JPEG
    quality (lossy — byte hashes all differ), C = A trimmed by one frame
    (temporal shift), D = unrelated. A~B and A~C pair with a dominant
    alignment; D pairs with nothing."""
    from sample_dms_kinesis_rds_mariadb_spark.operators import (
        image_dedup as idd,
    )

    rng = np.random.default_rng(17)
    # smooth frames (quantization-stable gradients + blobs)
    base_frames = []
    yy, xx = np.mgrid[0:32, 0:48]
    for i in range(6):
        a = (
            128
            + 60 * np.sin(xx / (4.0 + i) + i)
            + 50 * np.cos(yy / (5.0 + 0.5 * i))
        )
        base_frames.append(np.clip(a, 0, 255)[..., None].repeat(3, axis=2))
    vid_a = _mjpeg_avi(base_frames, quality=92)
    vid_b = _mjpeg_avi(base_frames, quality=70)      # re-encode
    vid_c = _mjpeg_avi(base_frames[1:], quality=92)  # trim first frame
    other = [
        np.clip(rng.normal(128, 55, (32, 48, 3)), 0, 255) for _ in range(6)
    ]
    vid_d = _mjpeg_avi(other, quality=92)
    df = _media_df(spark, [vid_a, vid_b, vid_c, vid_d])
    pairs = {
        (r["id_a"], r["id_b"]): r
        for r in idd.video_near_pairs(
            df, max_hamming=10, min_frac=0.6
        ).collect()
    }
    assert (0, 1) in pairs and (0, 2) in pairs and (1, 2) in pairs
    assert not any(3 in p for p in pairs)
    # re-encode: every frame matches at offset 0
    ab = pairs[(0, 1)]
    assert ab["aligned_matches"] == 6 and ab["match_frac"] == 1.0
    assert ab["matched_frames"] >= 6
    # trim: the 5 shared frames align at one offset (smooth neighboring
    # frames may ALSO cross-match, which is why matched_frames alone is
    # not the dedup signal)
    ac = pairs[(0, 2)]
    assert ac["aligned_matches"] == 5 and ac["match_frac"] == 1.0
    assert ac["matched_frames"] >= 5


def test_video_near_pairs_plan_no_cartesian(spark):
    from sample_dms_kinesis_rds_mariadb_spark.operators import (
        image_dedup as idd,
    )

    frames = [
        np.full((16, 16, 3), 40 * i % 255, dtype=np.int64) for i in range(3)
    ]
    df = _media_df(spark, [_mjpeg_avi(frames)] * 2)
    out = idd.video_near_pairs(df, min_frac=0.1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_banded_pairs_max_hamming_zero_exact_dups(spark):
    """max_hamming=0 (exact fingerprint duplicates) uses ONE 64-bit band
    whose all-ones mask only fits a LongType literal as -1 — regression
    for the literal-overflow found in review."""
    fps = [5, -7, 5, 123, -7, 5]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(fps)], "media_id LONG, dhash LONG"
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in idd.banded_hamming_pairs(df, max_hamming=0).collect()
    }
    assert got == {(0, 2), (0, 5), (2, 5), (1, 4)}
    # and through the sequence engine at fp_bits=64
    seq = spark.createDataFrame(
        [(0, 0, 11), (0, 1, -22), (1, 0, 11), (1, 1, -22), (2, 0, 99), (2, 1, 98)],
        "media_id LONG, frame_no INT, fp LONG",
    )
    pairs = idd.sequence_near_pairs(
        seq, "fp", fp_bits=64, max_hamming=0, min_frac=0.9
    ).collect()
    assert [(r["id_a"], r["id_b"], r["aligned_matches"]) for r in pairs] == [
        (0, 1, 2)
    ]


def test_dedup_images_keep_best_and_phash_pairs(spark):
    """keep='best' keeps the highest-quality cluster member (the
    resolution-preserving rule); the pHash method drives the pair path
    too."""
    rng = np.random.default_rng(33)
    base = rng.integers(30, 226, (36, 48, 3), dtype=np.int64)
    near = base.copy()
    near[2, 3:6] += 4
    other = rng.integers(30, 226, (36, 48, 3), dtype=np.int64)
    media = spark.createDataFrame(
        [
            (0, bytearray(_ppm(base)), "image", "s://0"),
            (1, bytearray(_ppm(near)), "image", "s://1"),
            (2, bytearray(_ppm(other)), "image", "s://2"),
        ],
        "media_id LONG, content BINARY, media_type STRING, source_uri STRING",
    )
    scored = media.withColumn(
        "quality", F.when(F.col("media_id") == 1, 9.0).otherwise(1.0)
    )
    kept = sorted(
        r["media_id"]
        for r in idd.dedup_images(
            scored, max_hamming=7, keep="best", quality_col="quality"
        ).collect()
    )
    assert kept == [1, 2]  # the higher-quality near-dup survives
    # pHash end-to-end: the same near-dup pair surfaces
    ppairs = {
        (r["id_a"], r["id_b"])
        for r in idd.image_near_pairs(
            media, method="phash", max_hamming=10
        ).collect()
    }
    assert (0, 1) in ppairs and not any(2 in p for p in ppairs)


# -- incremental perceptual index (r9) ---------------------------------------


def _ppm_family(rng, n, base=None):
    """n images; if base given, each is base with a tiny local edit
    (near-dups), else independent randoms."""
    out = []
    for i in range(n):
        if base is None:
            out.append(rng.integers(30, 226, (30, 40, 3), dtype=np.int64))
        else:
            px = base.copy()
            px[1 + i, 2:5] += 3
            out.append(px)
    return out


def test_image_index_incremental_equals_sequential_reference(spark, tmp_path):
    """Arrival-order dedup across 3 batches equals an independent Python
    reference (a new image loses iff within max_hamming of ANY previously
    seen fingerprint, or of a lower-id batch-mate)."""
    from sample_dms_kinesis_rds_mariadb_spark.operators.image_dedup import (
        ImageDedupIndex,
        dhash64,
    )

    rng = np.random.default_rng(77)
    base_a = rng.integers(30, 226, (30, 40, 3), dtype=np.int64)
    base_b = rng.integers(30, 226, (30, 40, 3), dtype=np.int64)
    fam_a = _ppm_family(rng, 3, base_a)        # near-dup family A
    fam_b = _ppm_family(rng, 2, base_b)        # near-dup family B
    uniq = _ppm_family(rng, 3)                 # singletons
    blobs = {
        1: _ppm(fam_a[0]), 2: _ppm(uniq[0]), 3: _ppm(fam_b[0]),
        101: _ppm(fam_a[1]), 102: _ppm(uniq[1]),
        201: _ppm(fam_a[2]), 202: _ppm(fam_b[1]), 203: _ppm(uniq[2]),
    }
    batches = ([1, 2, 3], [101, 102], [201, 202, 203])

    idx = ImageDedupIndex.build(
        _media_df(spark, []), str(tmp_path / "img-idx"), max_hamming=10
    )
    survivors = []
    for ids in batches:
        media = spark.createDataFrame(
            [(i, bytearray(blobs[i]), "image", f"s://{i}") for i in ids],
            "media_id LONG, content BINARY, media_type STRING, source_uri STRING",
        )
        kept = idx.dedup_batch(media)
        survivors.extend(r["media_id"] for r in kept.collect())

    # independent arrival-order reference over the same fingerprints
    fps = {i: dhash64(b) & ((1 << 64) - 1) for i, b in blobs.items()}
    seen: list[int] = []
    want = []
    for ids in batches:
        for i in sorted(ids):
            if all(bin(fps[i] ^ s).count("1") > 10 for s in seen):
                want.append(i)
            seen.append(fps[i])
    assert sorted(survivors) == sorted(want)
    assert 101 not in survivors and 201 not in survivors  # family A dups
    assert 202 not in survivors                           # family B dup
    assert {2, 102, 203} <= set(survivors)                # singletons live


def test_image_index_replay_reload_and_compact(spark, tmp_path):
    """Crash-replay idempotence, reload-from-meta, and compaction with
    probe results preserved."""
    import glob
    import os

    from sample_dms_kinesis_rds_mariadb_spark.operators.image_dedup import (
        ImageDedupIndex,
    )

    rng = np.random.default_rng(88)
    base = rng.integers(30, 226, (30, 40, 3), dtype=np.int64)
    near = base.copy()
    near[3, 4:7] += 3
    other = rng.integers(30, 226, (30, 40, 3), dtype=np.int64)
    path = str(tmp_path / "img-idx")
    idx = ImageDedupIndex.build(_media_df(spark, []), path, max_hamming=10)
    batch = _media_df(spark, [_ppm(base), _ppm(near), _ppm(other)])
    first = sorted(r["media_id"] for r in idx.dedup_batch(batch).collect())
    assert first == [0, 2]  # 1 loses to 0 in-batch
    # replay (foreachBatch crash re-run): verdicts identical, not []
    replay = sorted(r["media_id"] for r in idx.dedup_batch(batch).collect())
    assert replay == first
    # a later near-dup of a DROPPED image still dedups (signatures of
    # losers were appended)
    near2 = near.copy()
    near2[5, 6:8] += 3
    later = spark.createDataFrame(
        [(9, bytearray(_ppm(near2)), "image", "s://9")],
        "media_id LONG, content BINARY, media_type STRING, source_uri STRING",
    )
    reloaded = ImageDedupIndex.load(spark, path)
    # bands round-trips through the meta file (the MIH default for r=10)
    assert (reloaded.max_hamming, reloaded.bands) == (10, idd._mih_bands(10, 64))
    assert reloaded.dedup_batch(later).count() == 0
    # compaction folds files; probes unchanged
    probe_media = _media_df(spark, [_ppm(base)])
    probe_df = reloaded.probe(probe_media)
    before = sorted(
        (r["new_id"], r["stored_id"]) for r in probe_df.collect()
    )
    n_before = len(glob.glob(os.path.join(path, "band=*", "*.parquet")))
    assert reloaded.compact(min_files=1) > 0
    assert len(glob.glob(os.path.join(path, "band=*", "*.parquet"))) < n_before
    after = sorted(
        (r["new_id"], r["stored_id"])
        for r in reloaded.probe(probe_media).collect()
    )
    assert after == before and before  # base collides with its stored self? no:
    # media_id 0 probing: self-match with stored 0 excluded; matches 1 and 9


def test_resolve_bands_ball_cap_and_bit63_masks(spark):
    """Review fixes: (a) an explicit band count whose per-band probe
    ball is not enumerable raises instead of building ~6e8 driver-side
    masks (bands=1 at r=7 over 64 bits); (b) a legal wide band whose
    masks reach bit 63 goes through Spark literals as SIGNED 64-bit
    values — bands=1/r=1 over the full 64-bit key matches brute force."""
    import itertools as _it

    import pytest as _pytest

    from sample_dms_kinesis_rds_mariadb_spark.operators.image_dedup import (
        _resolve_bands,
        banded_hamming_pairs,
    )

    with _pytest.raises(ValueError, match="probe ball"):
        _resolve_bands(1, 7, 64)

    base = -(1 << 62)  # top bits set: the ball's bit-63 mask must fire
    # base ^ -(1 << 63) flips exactly bit 63 within the 64-bit domain
    # (the sign bits above cancel in two's complement)
    fps = spark.createDataFrame(
        [(0, base), (1, base ^ -(1 << 63)), (2, base ^ 1), (3, 12345)],
        "media_id LONG, dhash LONG",
    )
    got = {
        tuple(sorted((r["id_a"], r["id_b"])))
        for r in banded_hamming_pairs(
            fps, max_hamming=1, bands=1
        ).collect()
    }
    rows = {r["media_id"]: r["dhash"] for r in fps.collect()}
    want = {
        tuple(sorted(p))
        for p in _it.combinations(rows, 2)
        if bin((rows[p[0]] ^ rows[p[1]]) & ((1 << 64) - 1)).count("1") <= 1
    }
    assert got == want and len(want) == 2  # (0,1) via bit 63, (0,2) via bit 0


def test_video_fingerprints_fake_decode_skips_bad_container(spark):
    """A payload whose container walk fails (junk bytes, or an AVI with
    a non-MJPEG codec) raises by default, but with fake_decode=True it
    contributes ZERO frames — the dry-run never kills the Arrow task."""
    import pytest as _pytest

    from sample_dms_kinesis_rds_mariadb_spark.operators.image_dedup import (
        video_fingerprints,
    )
    from tests.avi_writer import write_avi
    from tests.jpeg_writer import encode_jpeg

    rng = np.random.default_rng(4)
    frames = [
        encode_jpeg(rng.integers(0, 256, (16, 16, 3)).astype(np.uint8))
        for _ in range(3)
    ]
    good = write_avi(frames, 16, 16)
    df = spark.createDataFrame(
        [(0, bytearray(good)), (1, bytearray(b"\x00junk-not-avi" * 4))],
        "media_id LONG, content BINARY",
    )
    with _pytest.raises(Exception):
        video_fingerprints(df).collect()
    fps = video_fingerprints(df, fake_decode=True)
    assert fps.filter(fps.media_id == 1).count() == 0
    assert fps.filter(fps.media_id == 0).count() == 3


def test_banded_hamming_pairs_idempotent_to_duplicate_rows(spark):
    """r13 self-review fix: duplicate (id, fp) input rows must not
    duplicate output pairs (the pre-r13 terminal distinct's behavior,
    preserved by an input-level distinct)."""
    rows = [(1, 0b1010), (2, 0b1010), (1, 0b1010), (2, 0b1010)]
    fps = spark.createDataFrame(rows, "media_id long, dhash long")
    got = idd.banded_hamming_pairs(fps, max_hamming=7).collect()
    assert [(r["id_a"], r["id_b"], r["hamming"]) for r in got] == [(1, 2, 0)]
