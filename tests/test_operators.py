"""Unit tests for the LLM-pipeline operators (dedup / similarity / text /
multimodal) on small controlled inputs — semantics checks complementing the
DuckDB oracle parity suite."""

import pytest
from pyspark.sql import functions as F

from sample_dms_kinesis_rds_mariadb_spark.functions.text import (
    doc_fingerprint,
    langid_heuristic,
    quality_columns,
    token_count,
)
from sample_dms_kinesis_rds_mariadb_spark.functions.hashing import shingles
from sample_dms_kinesis_rds_mariadb_spark.operators import dedup, multimodal, similarity


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again"),  # exact dup of 1
        (3, "the quick brown fox jumps over the lazy dog again and once"),  # near dup
        (4, "completely different content about spark query engines at scale"),
        (5, "el gato la casa los perros en la ciudad grande espanola hoy"),
    ]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING").cache()
    df.count()
    return df


def test_dedup_exact_keeps_min_id(docs):
    out = dedup.dedup_exact(docs, "doc_id", "text").collect()
    by_id = {r["doc_id"]: r["n_duplicates"] for r in out}
    assert by_id[1] == 2  # docs 1 and 2 collapse, min id kept
    assert 2 not in by_id
    assert by_id[3] == 1


def test_minhash_lsh_finds_near_dups(docs):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_lsh_candidate_pairs(docs, "doc_id", "text").collect()
    }
    assert (1, 2) in pairs  # identical docs always collide
    assert (1, 3) in pairs  # near-dup shares most shingles
    assert (1, 4) not in pairs and (1, 5) not in pairs


def test_dedup_minhash_survivors(docs):
    survivors = {
        r["doc_id"] for r in dedup.dedup_minhash_lsh(docs, "doc_id", "text").collect()
    }
    assert 1 in survivors
    assert 2 not in survivors and 3 not in survivors
    assert {4, 5} <= survivors


def test_ngram_jaccard_verification(docs):
    pairs = dedup.minhash_lsh_candidate_pairs(docs, "doc_id", "text")
    verified = dedup.ngram_jaccard_pairs(
        docs, pairs, "doc_id", "text", threshold=0.99
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in verified} == {(1, 2)}
    loose = dedup.ngram_jaccard_pairs(docs, pairs, "doc_id", "text", threshold=0.3)
    assert {(r["id_a"], r["id_b"]) for r in loose.collect()} >= {(1, 2), (1, 3)}


def test_simhash_near_pairs(docs):
    out = dedup.simhash_near_pairs(docs, "doc_id", "text", max_hamming=0).collect()
    assert {(r["id_a"], r["id_b"]) for r in out} >= {(1, 2)}
    near = dedup.simhash_near_pairs(docs, "doc_id", "text", max_hamming=10).collect()
    assert {(r["id_a"], r["id_b"]) for r in near} >= {(1, 2), (1, 3)}


def test_simhash_fingerprint_stability(docs):
    a = {r["doc_id"]: r["simhash"] for r in dedup.simhash_fingerprints(docs, "doc_id", "text").collect()}
    b = {r["doc_id"]: r["simhash"] for r in dedup.simhash_fingerprints(docs, "doc_id", "text").collect()}
    assert a == b  # deterministic
    assert a[1] == a[2]  # identical text → identical fingerprint


@pytest.fixture(scope="module")
def vectors(spark):
    import math

    rows = []
    for i in range(64):
        angle = (i / 64.0) * math.pi
        rows.append((i, [math.cos(angle), math.sin(angle), 0.0, 0.0]))
    df = spark.createDataFrame(rows, "vec_id INT, embedding ARRAY<FLOAT>").cache()
    df.count()
    return df


def test_brute_force_topk_exact(vectors):
    probe = [1.0, 0.0, 0.0, 0.0]  # = vec 0's direction
    out = similarity.brute_force_topk(vectors, probe, k=5, id_col="vec_id").collect()
    ids = [r["vec_id"] for r in out]
    assert ids[0] == 0  # exact match first
    assert set(ids) == {0, 1, 2, 3, 4}  # nearest angles
    sims = [r["cosine_sim"] for r in out]
    assert sims == sorted(sims, reverse=True)
    assert sims[0] == pytest.approx(1.0, abs=1e-6)


def test_lsh_topk_contains_true_neighbors(vectors):
    probe = [1.0, 0.0, 0.0, 0.0]
    out = similarity.lsh_bucketed_topk(vectors, probe, k=5, id_col="vec_id").collect()
    ids = [r["vec_id"] for r in out]
    assert 0 in ids  # the exact hit must survive bucketing
    exact = {0, 1, 2, 3, 4}
    assert len(exact & set(ids)) >= 3  # multiprobe recall


def test_ivf_topk_recall(vectors):
    probe = [1.0, 0.0, 0.0, 0.0]
    out = similarity.ivf_topk(
        vectors, probe, k=5, n_lists=4, n_probe=2, id_col="vec_id"
    ).collect()
    ids = [r["vec_id"] for r in out]
    assert 0 in ids  # exact hit survives list pruning
    exact = {0, 1, 2, 3, 4}
    assert len(exact & set(ids)) >= 3
    # determinism: seeded KMeans ⇒ identical result on re-run
    again = [
        r["vec_id"]
        for r in similarity.ivf_topk(
            vectors, probe, k=5, n_lists=4, n_probe=2, id_col="vec_id"
        ).collect()
    ]
    assert ids == again


def test_ivf_index_build_probe_split(vectors, tmp_path):
    """The registered ANN path: build writes a list-partitioned index once;
    probe is a partition-pruned scan with NO KMeans fit — the plan must show
    the ivf_list partition filter, and results must equal the one-shot
    operator's (same seed ⇒ same clustering)."""
    import contextlib
    import io

    probe = [1.0, 0.0, 0.0, 0.0]
    path = str(tmp_path / "ivf")
    index = similarity.IvfIndex.build(vectors, path, n_lists=4, id_col="vec_id")
    assert similarity.IvfIndex.exists(path)

    out_df = index.probe(probe, k=5, n_probe=2)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out_df.explain("formatted")
    plan = buf.getvalue()
    # partition pruning: the scan carries a PartitionFilters entry on
    # ivf_list, so only n_probe list directories are read
    assert "PartitionFilters" in plan and "ivf_list" in plan

    got = [r["vec_id"] for r in out_df.collect()]
    one_shot = [
        r["vec_id"]
        for r in similarity.ivf_topk(
            vectors, probe, k=5, n_lists=4, n_probe=2, id_col="vec_id"
        ).collect()
    ]
    assert got == one_shot


def test_ivf_medoid_centroids_deterministic(vectors, tmp_path):
    """The oracle-checkable IVF variant: fixed corpus rows as centroids, no
    clustering. Assignment must put each medoid in its own list (distance 0,
    ties to the lowest cid) and the medoid-built probe must keep the exact
    hit while reading only pruned partitions."""
    medoid_ids = [0, 16, 32, 48]
    cents = similarity.medoid_centroids(vectors, medoid_ids, id_col="vec_id")
    assert len(cents) == 4 and all(len(c) == 4 for c in cents)

    assigned = vectors.withColumn(
        "ivf_list", similarity.assign_to_centroids(F.col("embedding"), cents)
    )
    lists = {r["vec_id"]: r["ivf_list"] for r in assigned.collect()}
    for cid, mid in enumerate(medoid_ids):
        assert lists[mid] == cid  # a medoid is its own nearest centroid

    path = str(tmp_path / "ivf-medoid")
    index = similarity.IvfIndex.build(
        vectors, path, id_col="vec_id", centroids=cents
    )
    out = [r["vec_id"] for r in index.probe([1.0, 0.0, 0.0, 0.0], k=5, n_probe=2).collect()]
    assert out[0] == 0  # exact hit survives pruning

    with pytest.raises(ValueError):
        similarity.medoid_centroids(vectors, [0, 9999], id_col="vec_id")

    # reload from disk (a later session) probes without rebuilding
    again = similarity.IvfIndex.load(vectors.sparkSession, path, id_col="vec_id")
    reloaded = [
        r["vec_id"] for r in again.probe([1.0, 0.0, 0.0, 0.0], k=5, n_probe=2).collect()
    ]
    assert reloaded == out


def test_cosine_self_join_pairs(vectors):
    out = similarity.cosine_self_join_topk(
        vectors, threshold=0.999, id_col="vec_id"
    ).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in out}
    # adjacent angle steps differ by ~2.8° → cosine ≈ 0.9988 < 0.999;
    # only near-identical directions survive — none at this threshold
    for a, b in pairs:
        assert abs(a - b) <= 1


def test_text_functions(spark):
    df = spark.createDataFrame(
        [(1, "  The quick   brown fox! 123  ")], "id INT, text STRING"
    )
    row = df.select(
        token_count(F.col("text")).alias("tc"),
        doc_fingerprint(F.col("text")).alias("fp"),
        langid_heuristic(F.col("text")).alias("lang"),
        *[v.alias(k) for k, v in quality_columns(F.col("text")).items()],
    ).collect()[0]
    assert row["tc"] == 5  # The, quick, brown, fox!, 123
    assert row["fp"] == row["fp"].lower() and len(row["fp"]) == 32
    assert row["lang"] == "en"
    assert row["n_punct"] == 1
    assert row["n_digit"] == 3
    assert not row["is_quality"]  # too short


def test_shingles(spark):
    df = spark.createDataFrame([(1, "a b c d")], "id INT, text STRING")
    out = df.select(shingles(F.col("text"), 3).alias("s")).collect()[0]["s"]
    assert sorted(out) == ["a b c", "b c d"]


def test_multimodal_plumbing(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "spark engine")], "doc_id INT, text STRING"
    )
    media = multimodal.attach_binary_column(docs, "text", "doc_id")
    assert [f.name for f in media.schema.fields] == [
        "media_id",
        "content",
        "media_type",
        "source_uri",
    ]
    feats = multimodal.extract_image_features(media, fake_decode=True).collect()
    by_id = {r["media_id"]: r for r in feats}
    assert by_id[1]["n_bytes"] == len(b"hello world")
    assert 1 <= by_id[1]["width"] <= 2048 and 1 <= by_id[1]["height"] <= 2048
    # deterministic fake: same content → same dims
    again = {
        r["media_id"]: r
        for r in multimodal.extract_image_features(media, fake_decode=True).collect()
    }
    assert again[1]["width"] == by_id[1]["width"]
    # compressed formats remain an explicit stub boundary
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG\r\n", fake=False)


def test_decode_image_real_formats():
    """Library-free decode does REAL work on PPM/PGM/BMP bytes."""
    ppm = b"P6\n# a comment\n7 3\n255\n" + bytes(7 * 3 * 3)
    assert multimodal.decode_image(ppm) == (7, 3, 3, "ppm")
    pgm = b"P5 4 2 255 " + bytes(8)
    assert multimodal.decode_image(pgm) == (4, 2, 1, "pgm")
    # minimal BMP: BITMAPFILEHEADER + BITMAPINFOHEADER, 5x9 @ 24bpp
    header = bytearray(54)
    header[0:2] = b"BM"
    header[18:22] = (5).to_bytes(4, "little")
    header[22:26] = (-9).to_bytes(4, "little", signed=True)  # top-down
    header[28:30] = (24).to_bytes(2, "little")
    assert multimodal.decode_image(bytes(header)) == (5, 9, 3, "bmp")
    with pytest.raises(ValueError):
        multimodal.decode_image(b"P6\nnot-a-number\n")


def test_multimodal_real_ppm_pipeline(spark):
    """End-to-end REAL decode: synthesized PPM payloads through the Arrow
    mapInPandas path with fake_decode=False."""
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "x" * 100)], "doc_id INT, text STRING"
    )
    media = multimodal.attach_ppm_column(docs, "text", "doc_id")
    feats = {
        r["media_id"]: r
        for r in multimodal.extract_image_features(media, fake_decode=False).collect()
    }
    assert feats[1]["format"] == "ppm"
    assert feats[1]["width"] == multimodal.PPM_WIDTH
    assert feats[1]["height"] == (11 + 48) // 48  # text + one pad row
    assert feats[1]["channels"] == 3
    assert feats[2]["height"] == (100 + 48) // 48
    # payload really is a parseable PPM
    raw = media.filter(F.col("media_id") == 2).collect()[0]["content"]
    w, h, c, fmt = multimodal.decode_image(bytes(raw))
    assert (w, h, c, fmt) == (16, (100 + 48) // 48, 3, "ppm")


def test_frame_sampling(spark):
    docs = spark.createDataFrame([(1, "x" * 5000)], "doc_id INT, text STRING")
    media = multimodal.attach_binary_column(docs, "text", "doc_id")
    frames = multimodal.sample_frames(media, every_n_bytes=1024).collect()
    assert len(frames) == 4
    assert [f["byte_offset"] for f in frames] == [0, 1024, 2048, 3072]


def test_minhash_bands_beyond_four(docs, spark):
    """bands > 4 slice salted md5s — more bands for recall at large corpus
    sizes. Bands 0-3 must be byte-identical to the unsalted bands=4 output
    (the oracle-checked configuration), identical docs must collide in every
    band, and each extra band must stay SQL-reproducible (DuckDB recomputes
    md5('s1|' || shingle))."""
    from sample_dms_kinesis_rds_mariadb_spark.functions.hashing import (
        minhash_signatures,
    )

    four = minhash_signatures(docs, "doc_id", "text", bands=4).collect()
    eight = minhash_signatures(docs, "doc_id", "text", bands=8).collect()
    sig4 = {(r["doc_id"], r["band"]): r["signature"] for r in four}
    sig8 = {(r["doc_id"], r["band"]): r["signature"] for r in eight}
    assert {b for _, b in sig8} == set(range(8))
    for key, sig in sig4.items():
        assert sig8[key] == sig  # low bands unchanged by the salt ladder

    for b in range(8):
        assert sig8[(1, b)] == sig8[(2, b)]  # identical docs collide everywhere

    # cross-engine: DuckDB reproduces a salted band signature
    import duckdb

    text = docs.filter(F.col("doc_id") == 1).first()["text"]
    expected = duckdb.sql(
        """
        SELECT MIN(substr(md5('s1|' || t[i] || ' ' || t[i+1] || ' ' || t[i+2]), 1, 8))
        FROM (SELECT regexp_split_to_array(lower(trim($txt$""" + text + """$txt$)), '\\s+') AS t),
             LATERAL (SELECT unnest(generate_series(1, GREATEST(len(t) - 2, 0))) AS i)
        """
    ).fetchone()[0]
    assert sig8[(1, 4)] == expected

    with pytest.raises(ValueError):
        minhash_signatures(docs, "doc_id", "text", bands=0)


def test_resize_image_kernel_exact():
    """Nearest-neighbor semantics, asserted pixel-by-pixel: a 2x2 P6 scaled
    to 4x4 duplicates each source pixel into a 2x2 block."""
    px = bytes([255, 0, 0,  0, 255, 0,      # red  green
                0, 0, 255,  9, 9, 9])       # blue gray
    src = b"P6\n2 2\n255\n" + px
    out = multimodal.resize_image(src, 4, 4)
    assert multimodal.decode_image(out) == (4, 4, 3, "ppm")
    w, h, maxval, off = multimodal._parse_pnm_binary(out)
    assert (w, h, maxval) == (4, 4, 255)
    body = out[off:]
    def pixel(x, y):
        i = (y * 4 + x) * 3
        return tuple(body[i:i + 3])
    assert pixel(0, 0) == pixel(1, 1) == (255, 0, 0)
    assert pixel(2, 0) == pixel(3, 1) == (0, 255, 0)
    assert pixel(0, 2) == pixel(1, 3) == (0, 0, 255)
    assert pixel(2, 2) == pixel(3, 3) == (9, 9, 9)

    # identity resize is byte-preserving on the pixel buffer
    same = multimodal.resize_image(src, 2, 2)
    _, _, _, off2 = multimodal._parse_pnm_binary(same)
    assert same[off2:] == px

    # grayscale P5 path
    pgm = b"P5\n3 1\n255\n" + bytes([10, 20, 30])
    down = multimodal.resize_image(pgm, 1, 1)
    assert multimodal.decode_image(down) == (1, 1, 1, "pgm")

    # honest boundary: no library-free resize for compressed formats
    import pytest as _pytest
    with _pytest.raises(NotImplementedError):
        multimodal.resize_image(b"\x89PNG\r\n", 4, 4)
    fake = multimodal.resize_image(b"\x89PNG\r\n", 4, 4, fake=True)
    assert multimodal.decode_image(fake) == (4, 4, 3, "ppm")
    assert fake == multimodal.resize_image(b"\x89PNG\r\n", 4, 4, fake=True)


def test_resize_images_spark_pipeline(spark):
    """Bulk resize over real PPM payloads: mapInPandas plumbing, resized
    blobs feed straight back into the real decode path."""
    docs = spark.createDataFrame(
        [(1, "short text"), (2, "a much longer text " * 20)], "doc_id INT, text STRING"
    )
    media = multimodal.attach_ppm_column(docs, "text", "doc_id")
    resized = multimodal.resize_images(media, 8, 4)
    feats = {
        r["media_id"]: r
        for r in multimodal.extract_image_features(resized).collect()
    }
    assert set(feats) == {1, 2}
    for r in feats.values():
        assert (r["width"], r["height"], r["channels"], r["format"]) == (8, 4, 3, "ppm")
        assert r["n_bytes"] == len(b"P6\n8 4\n255\n") + 8 * 4 * 3


def _wav(samples, rate=8000, channels=1, extra_chunk=False):
    """Minimal valid RIFF/WAVE PCM16 writer for tests."""
    import struct

    pcm = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if extra_chunk:  # odd-sized chunk exercises word-alignment padding
        chunks += b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    chunks += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_decode_audio_real_wav():
    import math

    import pytest as _pytest

    blob = _wav([1000, -1000, 1000, -1000], rate=8000)
    rate, ch, bits, n_frames, off, fmt = multimodal.decode_audio(blob)
    assert (rate, ch, bits, n_frames, fmt) == (8000, 1, 16, 4, "wav")
    # stereo frames count frames, not samples; odd-size chunk skip works
    stereo = _wav([1, 2, 3, 4, 5, 6], rate=44100, channels=2, extra_chunk=True)
    rate, ch, bits, n_frames, _, _ = multimodal.decode_audio(stereo)
    assert (rate, ch, n_frames) == (44100, 2, 3)

    # r10: MPEG frames are no longer a boundary — a sync-valid payload
    # surfaces real container metadata (format 'mp3')
    assert multimodal.decode_audio(b"\xff\xfb\x90\x00 mp3 frame")[5] == "mp3"
    # a codec with no decoder (Ogg) keeps the honest boundary
    ogg = b"OggS" + b"\x00" * 24
    with _pytest.raises(NotImplementedError):
        multimodal.decode_audio(ogg)
    fake = multimodal.decode_audio(ogg, fake=True)
    assert fake == multimodal.decode_audio(ogg, fake=True)
    assert fake[5] == "fake"

    # non-PCM WAV is a codec boundary, not silent garbage
    import struct

    bad_fmt = struct.pack("<HHIIHH", 85, 1, 8000, 8000, 1, 16)  # 85 = mp3-in-wav
    nonpcm = (
        b"RIFF" + struct.pack("<I", 28) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(bad_fmt)) + bad_fmt
    )
    with _pytest.raises(NotImplementedError):
        multimodal.decode_audio(nonpcm)
    assert math.isclose(4 / 8000, 0.0005)

    # fake=True is the ANY-bytes dry-run contract: corrupt payloads of a
    # REAL format (truncated fLaC magic, truncated WAV chunk walk) fall
    # back to the deterministic fake instead of raising — mirroring
    # decode_image; without fake they stay honest errors
    for corrupt in (b"fLaC\x00\x01", blob[:20], nonpcm):
        with _pytest.raises((ValueError, NotImplementedError)):
            multimodal.decode_audio(corrupt)
        f1 = multimodal.decode_audio(corrupt, fake=True)
        assert f1 == multimodal.decode_audio(corrupt, fake=True)
        assert f1[5] == "fake"
    # a VALID payload under fake=True still decodes for real
    assert multimodal.decode_audio(blob, fake=True)[5] == "wav"


def test_extract_audio_features_spark(spark):
    """Audio twin of the image plumbing: real RIFF parse + vectorized rms
    over Arrow batches."""
    import math

    rows = [
        (1, bytearray(_wav([1000, -1000, 1000, -1000], rate=8000))),
        (2, bytearray(_wav([0] * 16000, rate=16000))),
    ]
    media = spark.createDataFrame(rows, "media_id LONG, content BINARY")
    feats = {
        r["media_id"]: r for r in multimodal.extract_audio_features(media).collect()
    }
    assert feats[1]["format"] == "wav" and feats[1]["n_frames"] == 4
    assert math.isclose(feats[1]["rms"], 1000.0)
    assert math.isclose(feats[1]["duration_sec"], 4 / 8000)
    assert math.isclose(feats[2]["duration_sec"], 1.0) and feats[2]["rms"] == 0.0


def _wav_tagged(body: bytes, tag: int, rate, channels, bits, extensible=False):
    """RIFF/WAVE writer for arbitrary format tags (float/G.711/extensible)."""
    import struct

    if extensible:
        # WAVE_FORMAT_EXTENSIBLE: tag 0xFFFE, real tag in SubFormat GUID
        guid = struct.pack("<H", tag) + b"\x00\x00" + bytes.fromhex(
            "00001000800000aa00389b71"
        )
        fmt = struct.pack(
            "<HHIIHHHHI",
            0xFFFE, channels, rate, rate * channels * bits // 8,
            channels * bits // 8, bits, 22, bits, 1,
        ) + guid
    else:
        fmt = struct.pack(
            "<HHIIHH",
            tag, channels, rate, rate * channels * bits // 8,
            channels * bits // 8, bits,
        )
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(body)) + body
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def _ulaw_compress(x: int) -> int:
    """Independent G.711 µ-law compressor (the published compress-side
    algorithm — NOT the expansion table under test)."""
    sign = 0x80 if x < 0 else 0
    if x < 0:
        x = -x
    x = min(x, 32635) + 0x84
    exponent = 7
    mask = 0x4000
    while exponent > 0 and not (x & mask):
        exponent -= 1
        mask >>= 1
    mantissa = (x >> (exponent + 3)) & 0x0F
    return ~(sign | (exponent << 4) | mantissa) & 0xFF


def _alaw_compress(x: int) -> int:
    """Independent G.711 A-law compressor (13-bit segment search)."""
    pcm = x >> 3
    if pcm >= 0:
        mask = 0xD5
    else:
        mask = 0x55
        pcm = -pcm - 1
    seg_ends = [0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF]
    seg = next((i for i, e in enumerate(seg_ends) if pcm <= e), 8)
    if seg >= 8:
        return 0x7F ^ mask
    aval = seg << 4
    aval |= (pcm >> 1) & 0x0F if seg < 2 else (pcm >> seg) & 0x0F
    return aval ^ mask


def test_decode_audio_g711_and_float():
    """G.711 expansion vs an independent compressor: decode(encode(x))
    must land within one quantization step of x across the 16-bit range;
    float32 WAV reports rms in the native [-1,1] domain; extensible
    headers resolve through the SubFormat GUID."""
    import math
    import struct

    import numpy as np

    rng = np.random.default_rng(3)
    samples = np.concatenate(
        [
            np.array([0, 1, -1, 7, -8, 32635, -32635], dtype=np.int64),
            rng.integers(-32000, 32000, 64),
        ]
    )
    for name, compress, tol_frac in (
        ("wav-ulaw", _ulaw_compress, 1 / 8),
        ("wav-alaw", _alaw_compress, 1 / 8),
    ):
        tag = 7 if name == "wav-ulaw" else 6
        body = bytes(compress(int(s)) for s in samples)
        blob = _wav_tagged(body, tag, 8000, 1, 8)
        rate, ch, bits, n_frames, off, fmt = multimodal.decode_audio(blob)
        assert (rate, ch, bits, n_frames, fmt) == (8000, 1, 8, len(samples), name)
        ulaw, alaw = multimodal._g711_tables()
        table = ulaw if name == "wav-ulaw" else alaw
        dec = table[np.frombuffer(blob, np.uint8, len(samples), off)]
        err = np.abs(dec.astype(np.int64) - samples)
        bound = np.maximum(np.abs(samples) * tol_frac, 80)
        assert (err <= bound).all(), f"{name}: max err {err.max()}"
        # expansion is sign-correct and monotone within each polarity
        assert int(table[_ulaw_compress(0) if tag == 7 else _alaw_compress(0)]) >= 0

    fl = np.array([0.5, -0.5, 0.25, -0.25], dtype="<f4")
    blob = _wav_tagged(fl.tobytes(), 3, 16000, 1, 32)
    rate, ch, bits, n_frames, off, fmt = multimodal.decode_audio(blob)
    assert (bits, n_frames, fmt) == (32, 4, "wav-float")
    ext = _wav_tagged(fl.tobytes(), 3, 16000, 1, 32, extensible=True)
    assert multimodal.decode_audio(ext)[5] == "wav-float"
    # unknown extensible sub-tag still raises honestly
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        multimodal.decode_audio(_wav_tagged(b"\x00" * 8, 85, 8000, 1, 16, extensible=True))
    assert math.isclose(0.5 * 0.5, 0.25)


def test_audio_features_g711_float_rms(spark):
    import math

    import numpy as np

    fl = np.array([0.5, -0.5, 0.5, -0.5], dtype="<f4")
    ul = bytes(_ulaw_compress(1000) for _ in range(8))
    rows = [
        (1, bytearray(_wav_tagged(fl.tobytes(), 3, 16000, 1, 32))),
        (2, bytearray(_wav_tagged(ul, 7, 8000, 1, 8))),
    ]
    media = spark.createDataFrame(rows, "media_id LONG, content BINARY")
    feats = {
        r["media_id"]: r for r in multimodal.extract_audio_features(media).collect()
    }
    assert feats[1]["format"] == "wav-float"
    assert math.isclose(feats[1]["rms"], 0.5, rel_tol=1e-6)
    assert feats[2]["format"] == "wav-ulaw"
    # µ-law 1000 decodes within one step of 1000 → rms near 1000
    assert abs(feats[2]["rms"] - 1000) <= 80
    assert math.isclose(feats[2]["duration_sec"], 8 / 8000)


def _winnow_py(text, k=5, window=4, hash_fn="crc32"):
    """Independent pure-Python winnowing reference (leftmost-min tie)."""
    import hashlib
    import zlib

    s = text.lower()
    grams = [s[i : i + k] for i in range(max(len(s) - k + 1, 0))]
    if hash_fn == "crc32":
        hashes = [zlib.crc32(g.encode()) for g in grams]
    else:
        hashes = [hashlib.md5(g.encode()).hexdigest()[:8] for g in grams]
    if not hashes:
        return set()
    out = set()
    n = len(hashes)
    starts = range(max(n - window, 0) + 1)
    for st in starts:
        win = hashes[st : st + window]
        h = min(win)
        out.add((st + win.index(h), h))
    return out


def test_winnowing_matches_python_reference(spark):
    texts = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "abc"),                      # shorter than k → no grams
        (3, "abcdefg"),                  # fewer grams than window → 1 fp
        (4, "aaaaaaaaaaaa"),             # degenerate: all grams identical
        (5, "the quick brown fox naps under the lazy dog"),
    ]
    df = spark.createDataFrame(texts, "doc_id INT, text STRING")
    for hash_fn in ("crc32", "md5_32"):
        got = {}
        for r in dedup.winnowing_fingerprints(
            df, "doc_id", "text", hash_fn=hash_fn
        ).collect():
            got.setdefault(r["doc_id"], set()).add((r["pos"], r["hash"]))
        for doc_id, text in texts:
            assert got.get(doc_id, set()) == _winnow_py(text, hash_fn=hash_fn), (
                hash_fn,
                doc_id,
            )

    # the winnowing guarantee in action: docs 1 and 5 share the substrings
    # "the quick brown fox " and " the lazy dog" (≥ k+window-1 chars) →
    # they must share at least one fingerprint hash
    h1 = {h for _, h in got[1]}
    h5 = {h for _, h in got[5]}
    assert h1 & h5
    # and a disjoint doc shares nothing
    assert not ({h for _, h in got.get(4, set())} & h1)


def test_bpe_pretokenize_and_stopwords(spark):
    from sample_dms_kinesis_rds_mariadb_spark.functions.text import (
        bpe_pretokenize,
        bpe_token_count,
        stopword_count,
        stopword_ratio_x100,
    )

    rows = [
        (1, "I'll say it's 2024, don't you?"),
        (2, "the cat sat on the mat"),
        (3, "xJ9#qq zz$$7"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "id INT, text STRING")
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            bpe_pretokenize(F.col("text")).alias("pieces"),
            bpe_token_count(F.col("text")).alias("n_bpe"),
            stopword_count(F.col("text")).alias("n_stop"),
            stopword_ratio_x100(F.col("text")).alias("stop_x100"),
        ).collect()
    }
    # GPT-2 split semantics: contractions split off, leading spaces attach
    assert out[1]["pieces"] == [
        "I", "'ll", " say", " it", "'s", " 2024", ",", " don", "'t", " you", "?",
    ]
    assert out[1]["n_bpe"] == 11
    # every character is covered by exactly the concatenation of the pieces
    assert "".join(out[1]["pieces"]) == rows[0][1]
    assert out[2]["n_stop"] == 3 and out[2]["stop_x100"] == 50  # the, on, the
    assert out[3]["n_stop"] == 0 and out[3]["stop_x100"] == 0
    assert out[4]["n_bpe"] == 0 and out[4]["stop_x100"] == 0


def test_hash_sampling_exact_and_deterministic(spark):
    """Sampling verdicts are a pure function of (key, salt): the kept-set
    matches an independent Python md5 computation row-for-row, the split is
    a disjoint partition, and re-running changes nothing."""
    import hashlib

    from sample_dms_kinesis_rds_mariadb_spark.operators import sampling

    n = 2000
    df = spark.range(n).withColumnRenamed("id", "doc_id")

    def py_bucket(key, salt):
        hx = hashlib.md5(f"{salt}|{key}".encode()).hexdigest()
        return int(hx[:8], 16) % 1_000_000

    kept = {r["doc_id"] for r in sampling.hash_sample(df, "doc_id", 0.3).collect()}
    expect = {i for i in range(n) if py_bucket(i, "sample") < 300_000}
    assert kept == expect
    assert kept == {
        r["doc_id"] for r in sampling.hash_sample(df, "doc_id", 0.3).collect()
    }  # rerun identical
    assert 0.25 < len(kept) / n < 0.35

    train, held = sampling.split_train_heldout(df, "doc_id", 0.2)
    tr = {r["doc_id"] for r in train.collect()}
    he = {r["doc_id"] for r in held.collect()}
    assert tr | he == set(range(n)) and not (tr & he)
    # widening the heldout keeps the old heldout inside it (stable boundary)
    _, held3 = sampling.split_train_heldout(df, "doc_id", 0.3)
    assert he <= {r["doc_id"] for r in held3.collect()}


def test_stratified_sample_and_mix(spark):
    from sample_dms_kinesis_rds_mariadb_spark.operators import sampling

    df = spark.range(3000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en")
        .when(F.col("id") % 3 == 1, "de")
        .otherwise("fr")
        .alias("lang"),
    )
    out = sampling.stratified_hash_sample(
        df, "doc_id", "lang", {"en": 1.0, "de": 0.2}, default_rate=0.0
    )
    by_lang = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert by_lang.get("en") == 1000          # rate 1.0 keeps all
    assert "fr" not in by_lang                # default 0.0 drops all
    assert 120 <= by_lang.get("de", 0) <= 280  # ~200

    web = spark.range(1000).select(F.col("id").alias("doc_id"), F.lit("web").alias("src"))
    code = spark.range(500).select(
        (F.col("id") + 10_000).alias("doc_id"), F.lit("code").alias("src")
    )
    mixed = sampling.mix_corpora([(web, 0.5), (code, 1.0)], "doc_id")
    counts = {
        r["src"]: r["n"]
        for r in mixed.groupBy("src").agg(F.count("*").alias("n")).collect()
    }
    assert counts["code"] == 500 and 400 <= counts["web"] <= 600
    # deterministic: the same mixture twice is row-identical
    a = sorted(r["doc_id"] for r in mixed.collect())
    b = sorted(
        r["doc_id"]
        for r in sampling.mix_corpora([(web, 0.5), (code, 1.0)], "doc_id").collect()
    )
    assert a == b


def test_winnowing_near_dups_finds_partial_overlap(spark):
    """Docs sharing a long passage pair up; disjoint docs don't."""
    shared = "the quick brown fox jumps over the lazy dog near the river bank"
    rows = [
        (1, shared + " and then some unique tail text for document one"),
        (2, "a completely different opening here but " + shared),
        (3, "zzz qqq unrelated content xxyy vvww entirely its own words"),
    ]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    pairs = {
        (r["id_a"], r["id_b"]): r["shared_fingerprints"]
        for r in dedup.winnowing_near_dups(df, "doc_id", "text").collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] >= 2
    assert not any(3 in p for p in pairs)


def test_split_column_agrees_with_two_frame_split(spark):
    """split_column must reproduce split_train_heldout's verdicts exactly
    (same md5 buckets, same salt) — it is the single-scan shape of the same
    operator."""
    from sample_dms_kinesis_rds_mariadb_spark.operators.sampling import (
        split_column,
        split_train_heldout,
    )

    df = spark.range(0, 3000).withColumnRenamed("id", "k")
    train, heldout = split_train_heldout(df, "k", 0.25)
    labeled = split_column(df, "k", 0.25)
    got_heldout = {
        r["k"] for r in labeled.filter("split = 'heldout'").collect()
    }
    assert got_heldout == {r["k"] for r in heldout.collect()}
    assert len(got_heldout) + train.count() == 3000
    # rate lands near the requested fraction
    assert abs(len(got_heldout) / 3000 - 0.25) < 0.03


def test_ivf_index_append_uses_stored_centroids(spark, tmp_path):
    """Appending vectors must assign against the PERSISTED centroids (no
    refit) and make the new vectors findable by probes, while existing
    assignments stay byte-identical."""
    import os

    from sample_dms_kinesis_rds_mariadb_spark.operators.similarity import IvfIndex

    def vec(seed):
        import random

        r = random.Random(seed)
        return [r.uniform(-1, 1) for _ in range(8)]

    base = [(i, vec(i)) for i in range(50)]
    df = spark.createDataFrame(base, "vec_id long, embedding array<double>")
    path = str(tmp_path / "ivf-append")
    idx = IvfIndex.build(df, path, n_lists=4)
    before = {
        (r["vec_id"], r["ivf_list"])
        for r in spark.read.parquet(path).select("vec_id", "ivf_list").collect()
    }
    centroids_before = list(idx.centroids)

    new = spark.createDataFrame(
        [(100, vec(7))], "vec_id long, embedding array<double>"
    )  # duplicate of vec 7's embedding: must land in the same list
    idx.append(new)

    assert idx.centroids == centroids_before  # no refit
    after = {
        (r["vec_id"], r["ivf_list"])
        for r in spark.read.parquet(path).select("vec_id", "ivf_list").collect()
    }
    assert before <= after and len(after) == len(before) + 1
    list_of_7 = {l for v, l in before if v == 7}.pop()
    assert (100, list_of_7) in after
    # the appended vector is probe-visible and ranks at the top (cos=1)
    top = IvfIndex.load(spark, path).probe(vec(7), k=2, n_probe=1).collect()
    assert {r["vec_id"] for r in top} == {7, 100}


def _bpe_ref(piece, merges):
    """Independent reference BPE (GPT-2 encoder style: min-ranked pair via
    get_pairs, rebuild with index scanning) — structurally different from
    the engine's merge loop."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    word = tuple(piece)
    while len(word) > 1:
        pairs = {(word[i], word[i + 1]) for i in range(len(word) - 1)}
        bigram = min(pairs, key=lambda p: ranks.get(p, float("inf")))
        if bigram not in ranks:
            break
        first, second = bigram
        new_word = []
        i = 0
        while i < len(word):
            try:
                j = word.index(first, i)
            except ValueError:
                new_word.extend(word[i:])
                break
            new_word.extend(word[i:j])
            i = j
            if i < len(word) - 1 and word[i + 1] == second:
                new_word.append(first + second)
                i += 2
            else:
                new_word.append(word[i])
                i += 1
        word = tuple(new_word)
    return word


def test_bpe_exact_counts_match_reference(spark):
    from sample_dms_kinesis_rds_mariadb_spark.functions.text import (
        bpe_pretokenize,
        make_bpe_counter,
    )

    # a small trained-vocabulary analog: character merges building up common
    # English chunks (order = priority, as in any public merges.txt)
    merges = [
        ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("an", "d"),
        ("e", "r"), ("o", "n"), ("a", "t"), (" ", "the"), (" ", "and"),
        ("in", "g"), ("c", "at"), (" ", "cat"), ("s", "at"), (" s", "at"),
    ]
    rows = [
        (1, "the cat sat on the mat"),
        (2, "I'll say it's 2024, don't you?"),
        (3, "thin thing another"),
        (4, ""),
        (5, "aaaa bbbb the the the"),
        (6, "naïve café — résumé"),  # non-ASCII survives charwise
    ]
    df = spark.createDataFrame(rows, "id INT, text STRING")
    counter = make_bpe_counter(spark, merges)
    got = {
        r["id"]: (r["pieces"], r["n"])
        for r in df.select(
            "id",
            bpe_pretokenize(F.col("text")).alias("pieces"),
            counter(bpe_pretokenize(F.col("text"))).alias("n"),
        ).collect()
    }
    for rid, _text in rows:
        pieces, n = got[rid]
        want = sum(len(_bpe_ref(p, merges)) for p in pieces)
        assert n == want, (rid, pieces, n, want)
    # merges actually fire: "the" collapses to one token, so the count is
    # strictly below the pre-token piece character total
    pieces1, n1 = got[1]
    assert n1 < sum(len(p) for p in pieces1)
    assert got[4][1] == 0


def test_semantic_dedup_matches_bruteforce(spark):
    """SemDeDup parity: with FIXED centroids, the within-cluster pair set
    and the survivor set must equal a brute-force Python reference (assign
    by euclidean argmin, all-pairs cosine inside each cluster)."""
    import math
    import random

    rng = random.Random(7)
    dim = 8
    centroids = [
        [10.0 if i == j else 0.0 for i in range(dim)] for j in range(4)
    ]
    rows = []
    for vid in range(40):
        c = centroids[vid % 4]
        v = [x + rng.uniform(-1.0, 1.0) for x in c]
        rows.append((vid, v))
    # planted near-dups: tiny perturbations of existing rows
    for vid, src in ((100, 3), (101, 10), (102, 3)):
        v = [x + rng.uniform(-1e-4, 1e-4) for x in rows[src][1]]
        rows.append((vid, v))
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")

    threshold = 0.999

    def assign(v):
        def d2(a, b):
            return sum((x - y) ** 2 for x, y in zip(a, b))

        return min(range(len(centroids)), key=lambda c: (d2(v, centroids[c]), c))

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return num / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))

    by_cluster = {}
    for vid, v in rows:
        by_cluster.setdefault(assign(v), []).append((vid, v))
    want_pairs = set()
    for members in by_cluster.values():
        for i, (ia, va) in enumerate(members):
            for ib, vb in members[i + 1 :]:
                lo, hi = min(ia, ib), max(ia, ib)
                if cos(va, vb) >= threshold:
                    want_pairs.add((lo, hi))
    got_pairs = {
        (r["id_a"], r["id_b"])
        for r in similarity.semantic_dedup_pairs(
            df, threshold=threshold, centroids=centroids
        ).collect()
    }
    assert got_pairs == want_pairs and want_pairs  # planted dups detected

    want_losers = {b for _, b in want_pairs}
    got_survivors = {
        r["vec_id"]
        for r in similarity.semantic_dedup(
            df, threshold=threshold, centroids=centroids
        ).collect()
    }
    assert got_survivors == {vid for vid, _ in rows} - want_losers
    # the keeper of each planted pair is the ORIGINAL (lower id)
    assert {3, 10}.issubset(got_survivors)
    assert {100, 101, 102}.isdisjoint(got_survivors)


def test_semantic_dedup_kmeans_path(spark):
    """The KMeans path (no fixed centroids) runs end-to-end, keeps
    id-ordering semantics, and its pair set contains the planted
    perturbation pair regardless of learned cluster boundaries around it."""
    import random

    rng = random.Random(11)
    rows = [
        (vid, [rng.uniform(-1, 1) for _ in range(8)]) for vid in range(30)
    ]
    rows.append((99, [x + 1e-5 for x in rows[5][1]]))
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    pairs = similarity.semantic_dedup_pairs(
        df, threshold=0.9999, n_lists=3, seed=1
    ).collect()
    assert (5, 99) in {(r["id_a"], r["id_b"]) for r in pairs}
    survivors = {
        r["vec_id"]
        for r in similarity.semantic_dedup(df, threshold=0.9999, n_lists=3, seed=1).collect()
    }
    assert 5 in survivors and 99 not in survivors


def _lev_ref(a, b):
    """Textbook DP Levenshtein — independent of Spark's kernel."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_edit_distance_pairs_matches_reference(spark, docs):
    pairs = dedup.minhash_lsh_candidate_pairs(docs, "doc_id", "text")
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    got = {
        (r["id_a"], r["id_b"]): r["edit_distance"]
        for r in dedup.edit_distance_pairs(
            docs, pairs, "doc_id", "text", max_distance=15
        ).collect()
    }
    want = {}
    for (ia, ib) in {tuple(r) for r in pairs.select("id_a", "id_b").collect()}:
        d = _lev_ref(texts[ia], texts[ib])
        if d <= 15:
            want[(ia, ib)] = d
    assert got == want and (1, 2) in got and got[(1, 2)] == 0
    # the bound actually prunes: a tight threshold keeps only exact dups
    tight = {
        (r["id_a"], r["id_b"])
        for r in dedup.edit_distance_pairs(
            docs, pairs, "doc_id", "text", max_distance=0
        ).collect()
    }
    assert tight == {(1, 2)}


def test_bpe_byte_level_counts_match_reference(spark):
    """byte_level=True: pieces run through the published GPT-2 byte→unicode
    alphabet, so real merges.txt symbols (Ġ = space, bytes of multi-byte
    chars) match. Counts must equal the char-level reference applied to the
    byte-mapped text, and hand-computed cases pin the alphabet itself."""
    from sample_dms_kinesis_rds_mariadb_spark.functions.text import (
        _byte_to_unicode,
        bpe_pretokenize,
        make_bpe_counter,
    )

    table = _byte_to_unicode()
    assert table[ord(" ")] == "Ġ"  # Ġ — the signature GPT-2 symbol
    assert table[ord("A")] == "A"  # printable bytes map to themselves
    assert len(set(table.values())) == 256  # bijection

    merges = [
        ("t", "h"), ("th", "e"), ("Ġ", "the"),  # builds " the" = Ġthe
        ("o", "r"), ("e", "or"),
    ]
    rows = [
        (1, "the theory"),
        (2, "café"),  # é is 2 UTF-8 bytes -> 2 byte tokens, no merges
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "id INT, text STRING")
    counter = make_bpe_counter(spark, merges, byte_level=True)
    got = {
        r["id"]: (r["pieces"], r["n"])
        for r in df.select(
            "id",
            bpe_pretokenize(F.col("text")).alias("pieces"),
            counter(bpe_pretokenize(F.col("text"))).alias("n"),
        ).collect()
    }
    # independent check: byte-map each piece, then run the char-level ref
    for rid, _text in rows:
        pieces, n = got[rid]
        want = sum(
            len(_bpe_ref("".join(table[b] for b in p.encode("utf-8")), merges))
            for p in pieces
        )
        assert n == want, (rid, pieces, n, want)
    # hand-computed: "the"->the(1); " theory"->Ġthe,or,y? no — Ġ,t,h,e,o,r,y
    # => th => the => Ġthe; o,r => or ; y  => 3 tokens. Total 4.
    assert got[1][1] == 4
    # café: c,a,f self-map; é -> 2 byte symbols, no merges fire -> 5
    assert got[2][1] == 5
    assert got[3][1] == 0


def test_hard_negatives_match_per_bucket_bruteforce(spark):
    """Contract parity: within each LSH bucket, the mined negatives must be
    exactly the per-anchor top-k different-label vectors by cosine (ties by
    negative_id) — computed independently in Python from the operator's own
    bucket assignments."""
    import itertools
    import math
    import random

    rng = random.Random(0xBEEF)
    dim = 8
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(dim)], i % 3) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    k = 4
    out = similarity.hard_negatives(df, k=k, n_planes=3, seed=7)
    got = {}
    for r in out.collect():
        got.setdefault(r["anchor_id"], []).append(
            (r["rank"], r["negative_id"], r["cosine_sim"])
        )
    for v in got.values():
        v.sort()

    buckets = {
        r["vec_id"]: r["lsh_bucket"]
        for r in similarity.with_lsh_buckets(df, "embedding", 3, 7).collect()
    }

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        return dot / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))

    by_id = {i: (v, l) for i, v, l in rows}
    for i, (va, la) in by_id.items():
        cands = [
            (j, cos(va, vb))
            for j, (vb, lb) in by_id.items()
            if j != i and lb != la and buckets[j] == buckets[i]
        ]
        want = sorted(cands, key=lambda t: (-t[1], t[0]))[:k]
        have = [(nid, sim) for _, nid, sim in got.get(i, [])]
        assert len(have) == len(want), i
        for (gn, gs), (wn, ws) in zip(have, want):
            assert gn == wn and gs == pytest.approx(ws, rel=1e-9), i
    # sanity: negatives never share the anchor's label, ranks start at 1
    for r in similarity.hard_negatives(df, k=2, n_planes=3, seed=7).collect():
        assert r["label"] != r["neg_label"] and r["rank"] in (1, 2)


def test_hard_negatives_validation(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0], 0)], "vec_id long, embedding array<double>, label int"
    )
    with pytest.raises(ValueError, match="k must be"):
        similarity.hard_negatives(df, k=0)


# ---------------------------------------------------------------------------
# int8 quantization + coarse/rerank ANN


def test_quantize_matches_python_reference(spark):
    """Spark quantization (scale + int8 image) must be element-exact vs the
    pure-Python mirror, including zero vectors and the clamp edge."""
    from sample_dms_kinesis_rds_mariadb_spark.functions.vectors import (
        reference_quantize,
    )

    import random

    rng = random.Random(7)
    vecs = [[rng.uniform(-3, 3) for _ in range(8)] for _ in range(50)]
    vecs += [[0.0] * 8, [1e-30] * 8, [-2.5, 2.5, 0.5, -0.5, 1.0, 0.0, 0.0, 3.0]]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id INT, embedding ARRAY<DOUBLE>"
    )
    out = {
        r["vec_id"]: (list(r["qvec"]), r["qscale"])
        for r in similarity.quantize_embeddings(df).collect()
    }
    for i, v in enumerate(vecs):
        want_q, want_s = reference_quantize(v)
        got_q, got_s = out[i]
        assert got_q == want_q, (i, v)
        assert got_s == pytest.approx(want_s, rel=1e-6)


def test_quantized_cosine_close_to_exact(spark, vectors):
    """int8 cosine error stays tiny (the scales cancel, error comes only
    from element rounding): every pairwise-vs-probe value within 2e-2."""
    from sample_dms_kinesis_rds_mariadb_spark.functions import vectors as V

    q = similarity.quantize_embeddings(vectors).cache()
    probe = [0.6, 0.8, 0.0, 0.0]
    qp, _s = similarity._py_quantize(probe)
    qp_lit = F.array(*[F.lit(x) for x in qp]).cast("array<tinyint>")
    both = q.select(
        V.cosine_similarity(
            V.to_double_array(F.col("embedding")), F.array(*[F.lit(x) for x in probe])
        ).alias("exact"),
        V.quantized_cosine(F.col("qvec"), qp_lit).alias("approx"),
    ).collect()
    assert both
    for r in both:
        assert abs(r["exact"] - r["approx"]) < 2e-2
    q.unpersist()


def test_quantized_topk_rerank_matches_exact(spark, vectors):
    """Coarse int8 + exact rerank must return the exact top-k (these
    vectors are well separated, so oversample=4 recovers it) with TRUE
    cosine scores, and full oversampling (== corpus) is exact by
    construction."""
    probe = [1.0, 0.0, 0.0, 0.0]
    q = similarity.quantize_embeddings(vectors).cache()
    q.count()
    want = similarity.brute_force_topk(vectors, probe, k=5, id_col="vec_id").collect()
    got = similarity.quantized_topk_rerank(q, probe, k=5, id_col="vec_id").collect()
    assert [r["vec_id"] for r in got] == [r["vec_id"] for r in want]
    for g, w in zip(got, want):
        assert g["cosine_sim"] == pytest.approx(w["cosine_sim"], rel=1e-12)
    full = similarity.quantized_topk_rerank(
        q, probe, k=5, oversample=64, id_col="vec_id"
    ).collect()
    assert [r["vec_id"] for r in full] == [r["vec_id"] for r in want]
    q.unpersist()


def test_quantized_zero_vector_never_ranks(spark):
    """A zero vector quantizes to all-0 / scale 0 and must sort LAST in the
    coarse pass (NULL quantized cosine), never crash the probe."""
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 0.0])],
        "vec_id INT, embedding ARRAY<DOUBLE>",
    )
    q = similarity.quantize_embeddings(df)
    out = similarity.quantized_topk_rerank(q, [1.0, 0.0], k=2, id_col="vec_id")
    assert [r["vec_id"] for r in out.collect()] == [1, 2]


def test_quantized_rerank_plan_broadcasts_candidates(spark, vectors):
    import contextlib
    import io

    q = similarity.quantize_embeddings(vectors)
    out = similarity.quantized_topk_rerank(q, [1.0, 0.0, 0.0, 0.0], k=3, id_col="vec_id")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# reciprocal-rank fusion + leakage-safe split


def test_rrf_fuse_matches_python_reference(spark):
    from sample_dms_kinesis_rds_mariadb_spark.operators import search

    lex = {101: 1, 102: 2, 103: 3, 104: 4}
    vec = {103: 1, 105: 2, 101: 3}
    dfs = [
        spark.createDataFrame(
            [(i, r) for i, r in d.items()], "doc_id long, rank int"
        )
        for d in (lex, vec)
    ]
    want = search.reference_rrf([lex, vec], k=4, weights=[1.0, 2.0])
    got = [
        (r["doc_id"], r["rrf_score"])
        for r in search.rrf_fuse(dfs, "doc_id", k=4, weights=[1.0, 2.0]).collect()
    ]
    assert [i for i, _ in got] == [i for i, _ in want]
    for (gi, gs), (wi, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-12)
    with pytest.raises(ValueError, match="weights"):
        search.rrf_fuse(dfs, "doc_id", weights=[1.0])


def test_rrf_hybrid_bm25_plus_ann_end_to_end(spark):
    """Fuse a real BM25 top-k with a real cosine top-k: a doc ranked well
    by BOTH retrievers must outrank one ranked well by only one."""
    from sample_dms_kinesis_rds_mariadb_spark.operators import search

    docs = spark.createDataFrame(
        [
            (1, "spark query engine", [1.0, 0.0]),
            (2, "query engine spark spark", [0.9, 0.44]),
            (3, "cooking recipes", [0.95, 0.31]),
            (4, "unrelated text", [0.0, 1.0]),
        ],
        "doc_id long, text string, embedding array<double>",
    )
    lex = search.with_rank(
        search.bm25_search(docs, "doc_id", "text", "spark engine", k=4),
        "bm25",
        "doc_id",
    )
    vec = search.with_rank(
        similarity.brute_force_topk(docs, [1.0, 0.0], k=4, id_col="doc_id"),
        "cosine_sim",
        "doc_id",
    )
    fused = search.rrf_fuse([lex, vec], "doc_id", k=4).collect()
    # doc 1: top-lexical AND top-vector; docs 3/4 each appear high in only one
    assert fused[0]["doc_id"] == 1


def test_split_leakage_safe_clusters_stay_together(spark):
    from sample_dms_kinesis_rds_mariadb_spark.operators import sampling

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(200)], "doc_id long, text string"
    )
    # chains: 0-1-2 one cluster, 10-11 another; rest untouched
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)], "id_a long, id_b long"
    )
    out = sampling.split_leakage_safe(df, pairs, "doc_id", 0.3).collect()
    side = {r["doc_id"]: r["split"] for r in out}
    assert len(side) == 200
    assert side[0] == side[1] == side[2]
    assert side[10] == side[11]
    # untouched rows: verdict identical to the plain split (same salt)
    plain = {
        r["doc_id"]: r["split"]
        for r in sampling.split_column(df, "doc_id", 0.3).collect()
    }
    for i in range(200):
        if i not in (0, 1, 2, 10, 11):
            assert side[i] == plain[i], i
    # both sides populated and deterministic across re-runs
    assert {"train", "heldout"} == set(side.values())
    again = {
        r["doc_id"]: r["split"]
        for r in sampling.split_leakage_safe(df, pairs, "doc_id", 0.3).collect()
    }
    assert again == side


def test_split_leakage_safe_end_to_end_with_minhash_pairs(spark):
    """Wire the real candidate generator in: MinHash pairs over a corpus
    with planted near-dups; no pair may straddle the split."""
    from sample_dms_kinesis_rds_mariadb_spark.operators import dedup, sampling

    base = [
        "the quick brown fox jumps over the lazy dog again and again",
        "completely different content about spark physical plans",
        "a third unrelated document mentioning nothing in common",
    ]
    rows = []
    for i in range(60):
        t = base[i % 3] + f" filler {i % 7}"
        rows.append((i, t))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = dedup.minhash_lsh_candidate_pairs(df, "doc_id", "text")
    out = sampling.split_leakage_safe(df, pairs, "doc_id", 0.4)
    side = {r["doc_id"]: r["split"] for r in out.collect()}
    for p in pairs.collect():
        assert side[p["id_a"]] == side[p["id_b"]], (p["id_a"], p["id_b"])


def test_ivf_int8_probe_matches_exact(spark, vectors, tmp_path):
    """IVF-SQ: a quantize=True build probes via the byte column and reranks
    exactly — same ids and true cosines as the exact probe; unquantized
    layouts reject coarse='int8' loudly; appends keep the layout."""
    path = str(tmp_path / "ivfq")
    idx = similarity.IvfIndex.build(
        vectors, path, n_lists=4, id_col="vec_id", quantize=True
    )
    probe = [1.0, 0.0, 0.0, 0.0]
    want = idx.probe(probe, k=5, n_probe=4).collect()
    got = idx.probe(probe, k=5, n_probe=4, coarse="int8").collect()
    assert [r["vec_id"] for r in got] == [r["vec_id"] for r in want]
    for g, w in zip(got, want):
        assert g["cosine_sim"] == pytest.approx(w["cosine_sim"], rel=1e-12)
    # append quantizes to match the stored schema; new vector is findable
    extra = spark.createDataFrame(
        [(999, [1.0, 0.001, 0.0, 0.0])], "vec_id INT, embedding ARRAY<FLOAT>"
    )
    idx.append(extra)
    after = idx.probe(probe, k=2, n_probe=4, coarse="int8").collect()
    # vec 0 IS the probe direction (cosine 1.0); the appended 999 at
    # cosine ~0.9999995 must land second
    assert [r["vec_id"] for r in after] == [0, 999]
    # plain build: int8 probe refuses
    plain = similarity.IvfIndex.build(
        vectors, str(tmp_path / "ivfp"), n_lists=4, id_col="vec_id"
    )
    with pytest.raises(ValueError, match="quantize=True"):
        plain.probe(probe, coarse="int8")
    with pytest.raises(ValueError, match="coarse"):
        plain.probe(probe, coarse="fast")


def test_temperature_weights_math():
    from sample_dms_kinesis_rds_mariadb_spark.operators.sampling import (
        temperature_weights,
    )

    sizes = {"big": 900.0, "small": 100.0}
    # alpha=1: natural proportions -> uniform keep rate (= target on both)
    w1 = temperature_weights(sizes, alpha=1.0)
    assert w1["big"] == pytest.approx(1.0) and w1["small"] == pytest.approx(1.0)
    # alpha=0: equal representation -> big keeps 1/9th of small's rate
    w0 = temperature_weights(sizes, alpha=0.0)
    assert w0["small"] == pytest.approx(1.0)
    assert w0["big"] == pytest.approx(100.0 / 900.0)
    # intermediate alpha: expected-row ratios follow size^alpha exactly
    w = temperature_weights(sizes, alpha=0.3)
    got_ratio = (sizes["big"] * w["big"]) / (sizes["small"] * w["small"])
    assert got_ratio == pytest.approx((900.0 / 100.0) ** 0.3)
    # the binding corpus keeps exactly target_fraction
    w_half = temperature_weights(sizes, alpha=0.0, target_fraction=0.5)
    assert max(w_half.values()) == pytest.approx(0.5)
    with pytest.raises(ValueError, match="alpha"):
        temperature_weights(sizes, alpha=2.0)
    with pytest.raises(ValueError, match="size"):
        temperature_weights({"x": 0.0})


def test_knn_join_matches_per_probe_bruteforce(vectors):
    probes = vectors.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    out = similarity.knn_join(vectors, probes, k=5).collect()
    by_probe = {}
    for r in out:
        by_probe.setdefault(r["probe_id"], []).append(r)
    assert set(by_probe) == {0, 1, 2}
    for pid, rows in by_probe.items():
        rows.sort(key=lambda r: r["rank"])
        # parity vs the single-probe exact operator
        probe_vec = [
            float(x)
            for x in vectors.filter(F.col("vec_id") == pid).first()["embedding"]
        ]
        expect = similarity.brute_force_topk(vectors, probe_vec, k=5).collect()
        assert [r["vec_id"] for r in rows] == [e["vec_id"] for e in expect]
        for r, e in zip(rows, expect):
            assert r["cosine_sim"] == pytest.approx(e["cosine_sim"], abs=1e-9)
        assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]


def test_lsh_knn_join_zero_planes_equals_exact(vectors):
    probes = vectors.filter(F.col("vec_id").isin(0, 7, 33)).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    exact = similarity.knn_join(vectors, probes, k=4)
    approx = similarity.lsh_knn_join(vectors, probes, k=4, n_planes=0)
    # one bucket (0) holds everything -> candidate set == corpus == exact
    a = sorted(map(tuple, approx.collect()))
    e = sorted(map(tuple, exact.collect()))
    assert a == e
    rec = similarity.topk_recall(approx, exact).collect()
    assert all(r["recall"] == 1.0 for r in rec) and len(rec) == 3


def test_lsh_knn_join_recall_and_plan(vectors):
    probes = vectors.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    approx = similarity.lsh_knn_join(
        vectors, probes, k=5, n_planes=4, seed=7, multiprobe=True
    )
    plan = approx._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    exact = similarity.knn_join(vectors, probes, k=5)
    rec = similarity.topk_recall(approx, exact).collect()
    assert len(rec) == 8
    assert all(0.0 <= r["recall"] <= 1.0 for r in rec)
    # every approx hit must carry the SAME score the exact side computed
    escore = {
        (r["probe_id"], r["vec_id"]): r["cosine_sim"] for r in exact.collect()
    }
    for r in approx.collect():
        key = (r["probe_id"], r["vec_id"])
        if key in escore:
            assert r["cosine_sim"] == escore[key]


def test_topk_recall_math(spark):
    exact = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 20), (2, 21), (3, 30)],
        "probe_id int, vec_id int",
    )
    approx = spark.createDataFrame(
        [(1, 10), (1, 99), (2, 20), (2, 21)],  # probe 3 returned nothing
        "probe_id int, vec_id int",
    )
    got = {
        r["probe_id"]: (r["n_exact"], r["n_hit"], r["recall"])
        for r in similarity.topk_recall(approx, exact).collect()
    }
    assert got == {1: (2, 1, 0.5), 2: (2, 2, 1.0), 3: (1, 0, 0.0)}


def test_ivf_knn_join_full_probe_equals_exact(vectors):
    cents = similarity.medoid_centroids(vectors, [0, 16, 32, 48])
    probes = vectors.filter(F.col("vec_id").isin(2, 40)).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    exact = similarity.knn_join(vectors, probes, k=4)
    full = similarity.ivf_knn_join(
        vectors, probes, cents, k=4, n_probe=len(cents)
    )
    assert sorted(map(tuple, full.collect())) == sorted(map(tuple, exact.collect()))


def test_ivf_knn_join_pruned_probe(vectors):
    cents = similarity.medoid_centroids(vectors, [0, 16, 32, 48])
    probes = vectors.filter(F.col("vec_id").isin(2, 40)).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    approx = similarity.ivf_knn_join(vectors, probes, cents, k=4, n_probe=1)
    plan = approx._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    rows = approx.collect()
    # candidates come only from the probe's own list: every returned
    # neighbor must share the probe's assignment
    assigned = {
        r["vec_id"]: r["ivf_list"]
        for r in vectors.select(
            "vec_id",
            similarity.assign_to_centroids(F.col("embedding"), cents).alias(
                "ivf_list"
            ),
        ).collect()
    }
    for r in rows:
        assert assigned[r["vec_id"]] == assigned[r["probe_id"]]
    exact = similarity.knn_join(vectors, probes, k=4)
    rec = similarity.topk_recall(approx, exact).collect()
    assert len(rec) == 2 and all(0.0 <= r["recall"] <= 1.0 for r in rec)
    # the unit-circle fixture is dense around each probe, so its own-list
    # neighbors include the true top ones: recall must be positive
    assert sum(r["recall"] for r in rec) > 0


def test_nearest_lists_expr_matches_driver_reference(vectors):
    cents = similarity.medoid_centroids(vectors, [0, 16, 32, 48])
    rows = vectors.select(
        "vec_id",
        similarity.nearest_lists_expr(F.col("embedding"), cents, 2).alias("ls"),
    ).collect()
    got = {r["vec_id"]: list(r["ls"]) for r in rows}
    raw = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in vectors.collect()}
    for vid, vec in raw.items():
        assert got[vid] == similarity._nearest_lists(cents, vec, 2), vid


def test_simhash_null_text_emits_no_row(spark):
    """NULL-text docs must emit NO fingerprint row (the explode-era output
    contract the array-space rewrite preserves) — a NULL fingerprint row
    would cluster every NULL-text doc as one 'duplicate' group downstream."""
    from sample_dms_kinesis_rds_mariadb_spark.functions.hashing import (
        simhash60_md5,
        simhash64,
    )

    df = spark.createDataFrame(
        [(1, "some real text here"), (2, None), (3, "other real words")],
        "doc_id long, text string",
    )
    for fn, col in ((simhash60_md5, "simhash60"), (simhash64, "simhash")):
        rows = fn(df, "doc_id", "text").collect()
        assert sorted(r["doc_id"] for r in rows) == [1, 3]
        assert all(r[col] is not None for r in rows)


def test_simhash_arrow_fold_parity(spark, monkeypatch):
    """The Arrow bit-fold kernel (r13) must be bit-identical to the JVM
    zip_with fold on every edge the fold defines: plain text, empty
    string, single token, long repetitive docs, non-ASCII, whitespace
    runs — and the NULL-text no-row contract."""
    from sample_dms_kinesis_rds_mariadb_spark.functions import hashing as hh

    df = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, ""),
            (2, None),
            (3, "one"),
            (4, "a b c d e f g h i j " * 30),
            (5, "Ünïcode tökens ünïcode"),
            (6, "  spaces   and\ttabs\nnewlines "),
        ],
        "doc_id long, text string",
    )
    for fn, col in ((hh.simhash60_md5, "simhash60"), (hh.simhash64, "simhash")):
        monkeypatch.setattr(hh, "SIMHASH_ARROW", True)
        arrow = {r["doc_id"]: r[col] for r in fn(df, "doc_id", "text").collect()}
        monkeypatch.setattr(hh, "SIMHASH_ARROW", False)
        jvm = {r["doc_id"]: r[col] for r in fn(df, "doc_id", "text").collect()}
        assert arrow == jvm
        assert 2 not in arrow  # NULL text emits no row on BOTH paths


def test_temperature_rates_upsample_math():
    from sample_dms_kinesis_rds_mariadb_spark.operators.sampling import (
        temperature_rates,
    )

    sizes = {"big": 900.0, "small": 100.0}
    r1 = temperature_rates(sizes, alpha=1.0)
    assert r1 == {"big": 1.0, "small": pytest.approx(1.0)}
    r0 = temperature_rates(sizes, alpha=0.0)
    assert r0["big"] == pytest.approx(1.0)
    assert r0["small"] == pytest.approx(9.0)  # equalized -> 9 epochs
    r = temperature_rates(sizes, alpha=0.3)
    got_ratio = (sizes["big"] * r["big"]) / (sizes["small"] * r["small"])
    assert got_ratio == pytest.approx((900.0 / 100.0) ** 0.3)
    capped = temperature_rates(sizes, alpha=0.0, max_rate=4.0)
    assert capped["small"] == 4.0 and capped["big"] == pytest.approx(1.0)
    with pytest.raises(ValueError, match="max_rate"):
        temperature_rates(sizes, max_rate=0.5)


def test_replicate_fraction_and_epoch_mixture(spark):
    from sample_dms_kinesis_rds_mariadb_spark.operators.sampling import (
        hash_sample,
        mix_corpora_epochs,
        replicate_fraction,
    )

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(400)], "doc_id long, text string"
    )
    rep = replicate_fraction(df, "doc_id", 2.5, salt="t")
    rows = rep.collect()
    by_epoch = {}
    for r in rows:
        by_epoch.setdefault(r["epoch"], set()).add(r["doc_id"])
    # two full epochs, identical membership
    assert by_epoch[0] == by_epoch[1] == {i for i in range(400)}
    # fractional epoch: the deterministic hash_sample subset, ~50%
    frac = {r["doc_id"] for r in hash_sample(df, "doc_id", 0.5, salt="t#2").collect()}
    assert by_epoch[2] == frac
    assert 120 <= len(frac) <= 280
    # determinism
    again = replicate_fraction(df, "doc_id", 2.5, salt="t").collect()
    assert sorted((r["doc_id"], r["epoch"]) for r in rows) == sorted(
        (r["doc_id"], r["epoch"]) for r in again
    )
    # times <= 1 degenerates to a plain sample; times == 0 -> empty
    assert replicate_fraction(df, "doc_id", 0.0, salt="t").count() == 0
    one = replicate_fraction(df, "doc_id", 1.0, salt="t")
    assert one.count() == 400 and one.select("epoch").distinct().count() == 1
    with pytest.raises(ValueError, match="collision"):
        replicate_fraction(rep, "doc_id", 1.0)

    small = spark.createDataFrame(
        [(1000 + i, f"rare {i}") for i in range(50)], "doc_id long, text string"
    )
    mixed = mix_corpora_epochs([(df, 1.0), (small, 3.0)], key_col="doc_id")
    assert mixed.count() == 400 + 150
    assert mixed.filter(F.col("doc_id") >= 1000).count() == 150


def test_bmp_negative_width_rejected():
    from sample_dms_kinesis_rds_mariadb_spark.operators.multimodal import (
        decode_image,
    )

    bad = bytearray(b"BM" + b"\x00" * 40)
    bad[18:22] = (-16).to_bytes(4, "little", signed=True)   # width
    bad[22:26] = (16).to_bytes(4, "little", signed=True)    # height
    bad[28:30] = (24).to_bytes(2, "little")                 # bpp
    with pytest.raises(ValueError, match="width"):
        decode_image(bytes(bad))
    # negative HEIGHT stays valid (top-down row order)
    bad[18:22] = (16).to_bytes(4, "little", signed=True)
    bad[22:26] = (-16).to_bytes(4, "little", signed=True)
    w, h, c, fmt = decode_image(bytes(bad))
    assert (w, h, fmt) == (16, 16, "bmp")


def test_empty_doc_counts_zero_tokens(spark):
    """split('') yields [''] — empty/whitespace docs must report 0 tokens
    (they inflated corpus token stats by 1 each), with NULL text staying
    NULL and avg token length 0 instead of a division error."""
    from sample_dms_kinesis_rds_mariadb_spark.functions.text import (
        quality_columns,
        token_count,
    )

    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "two words"), (4, None)],
        "id long, text string",
    )
    qc = quality_columns(F.col("text"))
    rows = {
        r["id"]: r
        for r in df.select(
            "id",
            token_count(F.col("text")).alias("n"),
            qc["n_tokens"].alias("qn"),
            qc["avg_token_len_x100"].alias("avg"),
        ).collect()
    }
    assert rows[1]["n"] == 0 and rows[2]["n"] == 0
    assert rows[3]["n"] == 2
    assert rows[4]["n"] is None
    assert rows[1]["avg"] == 0 and rows[2]["avg"] == 0


def test_ivf_index_compact_bounds_files_and_preserves_probes(spark, tmp_path):
    """VERDICT r6 item 3: per-list append files fold back via rename-swap;
    centroid sidecar carried, probes identical, quantized layout intact."""
    import glob
    import os

    from sample_dms_kinesis_rds_mariadb_spark.operators.similarity import IvfIndex

    def vec(seed):
        import random

        r = random.Random(seed)
        return [r.uniform(-1, 1) for _ in range(8)]

    df = spark.createDataFrame(
        [(i, vec(i)) for i in range(40)], "vec_id long, embedding array<double>"
    )
    path = str(tmp_path / "ivf-compact")
    idx = IvfIndex.build(df, path, n_lists=4, quantize=True)
    for i in range(40, 52):
        idx.append(
            spark.createDataFrame(
                [(i, vec(i))], "vec_id long, embedding array<double>"
            )
        )

    def n_files():
        return len(glob.glob(os.path.join(path, "ivf_list=*", "*.parquet")))

    before_files = n_files()
    before = [
        (r["vec_id"], r["cosine_sim"])
        for r in idx.probe(vec(43), k=5, n_probe=4).collect()
    ]
    before_int8 = [
        (r["vec_id"], r["cosine_sim"])
        for r in idx.probe(vec(43), k=5, n_probe=4, coarse="int8").collect()
    ]
    assert idx.compact(min_files=10_000) == 0
    removed = idx.compact(min_files=1)
    assert removed > 0 and n_files() == before_files - removed
    reloaded = IvfIndex.load(spark, path)
    assert reloaded.centroids == idx.centroids  # sidecar survived
    after = [
        (r["vec_id"], r["cosine_sim"])
        for r in reloaded.probe(vec(43), k=5, n_probe=4).collect()
    ]
    after_int8 = [
        (r["vec_id"], r["cosine_sim"])
        for r in reloaded.probe(vec(43), k=5, n_probe=4, coarse="int8").collect()
    ]
    assert after == before and after_int8 == before_int8
    # appends continue on the compacted layout
    reloaded.append(
        spark.createDataFrame([(900, vec(43))], "vec_id long, embedding array<double>")
    )
    top = reloaded.probe(vec(43), k=2, n_probe=1).collect()
    assert {r["vec_id"] for r in top} == {43, 900}


def test_ivf_index_crashed_compact_heals(spark, tmp_path):
    """IVF dual of the MinHash heal test: a compact crashed between its
    renames is repaired by the next probe/append, centroid sidecar intact."""
    import os
    import shutil

    from sample_dms_kinesis_rds_mariadb_spark.operators.similarity import IvfIndex

    def vec(seed):
        import random

        r = random.Random(seed)
        return [r.uniform(-1, 1) for _ in range(8)]

    df = spark.createDataFrame(
        [(i, vec(i)) for i in range(30)], "vec_id long, embedding array<double>"
    )
    path = str(tmp_path / "ivf-heal")
    idx = IvfIndex.build(df, path, n_lists=4)
    before = [(r["vec_id"], r["cosine_sim"]) for r in idx.probe(vec(9), k=3).collect()]

    shutil.copytree(path, path + ".compact")
    os.rename(path, path + ".old")
    after = [(r["vec_id"], r["cosine_sim"]) for r in idx.probe(vec(9), k=3).collect()]
    assert after == before
    assert os.path.exists(path) and not os.path.exists(path + ".old")
    assert IvfIndex.exists(path)

    shutil.copytree(path, path + ".compact")
    os.rename(path, path + ".old")
    idx.append(
        spark.createDataFrame([(99, vec(9))], "vec_id long, embedding array<double>")
    )
    top = idx.probe(vec(9), k=2, n_probe=1).collect()
    assert {r["vec_id"] for r in top} == {9, 99}  # old + new data both live
