"""End-to-end STREAMING corpus curation: the full batch pipeline (quality
gate -> benchmark decontamination -> incremental near-dup dedup) run as a
foreachBatch stage over arriving files, asserted row-equal to the same
stages applied batch-by-batch in arrival order — the streaming dual of
examples/llm_data_pipeline.py's curation front half."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from sample_dms_kinesis_rds_mariadb_spark.functions.text import quality_columns
from sample_dms_kinesis_rds_mariadb_spark.operators.dedup import (
    MinHashIndex,
    decontaminate,
)
from tests.test_streaming import await_finished

SCHEMA = "doc_id long, text string"

_BENCH_Q = (
    "which river is the longest river in the world measured from source "
    "to mouth exactly"
)


# distinct bodies (shared templates would make EVERYTHING a MinHash
# near-dup); each >= 50 chars / >= 10 tokens so the quality gate passes
_RIVERS = (
    "broad rivers carve valleys and carry sediment downstream across "
    "continents feeding floodplains deltas and the communities along them"
)
_GLACIERS = (
    "slow glaciers grind bedrock into flour while storing ancient ice "
    "that records centuries of climate in compressed seasonal layers"
)
_VOLCANOES = (
    "explosive volcanoes build islands from repeated eruptions as magma "
    "cools into basalt shields and steep layered stratocones over time"
)
_DESERTS = (
    "arid deserts bloom briefly after rainfall when dormant seeds race "
    "through germination flowering and seed set before the moisture ends"
)


def _batches():
    b1 = [
        (1, _RIVERS),
        (2, "short junk"),                                # quality-fail
        (3, _GLACIERS),
    ]
    b2 = [
        (101, _RIVERS + " indeed"),                       # near-dup of 1
        (102, "quiz answer " + _BENCH_Q + " plus trailing words filler"),  # contaminated
        (103, _VOLCANOES),
    ]
    b3 = [
        (201, _DESERTS),
        (202, _GLACIERS + " truly"),                      # near-dup of 3
    ]
    return b1, b2, b3


def _gate(df):
    qc = quality_columns(F.col("text"))
    return df.filter(qc["is_quality"])


def test_streaming_curation_equals_sequential_batch(spark, tmp_path):
    bench = spark.createDataFrame(
        [(900, _BENCH_Q)], "bench_id long, btext string"
    ).cache()
    bench.count()
    try:
        _run_curation(spark, tmp_path, bench)
    finally:
        bench.unpersist()  # keep the suite-shared session cache-leak-free


def _run_curation(spark, tmp_path, bench):

    # ---- reference: the same stages applied batch-by-batch in order ----
    ref_idx = MinHashIndex.build(
        spark.createDataFrame([], SCHEMA),
        str(tmp_path / "ref-idx"),
        "doc_id",
        "text",
    )
    expected: set[int] = set()
    for rows in _batches():
        df = spark.createDataFrame(rows, SCHEMA)
        clean = decontaminate(
            _gate(df), bench, "doc_id", "text",
            bench_id_col="bench_id", bench_text_col="btext", n=13,
        )
        kept = ref_idx.dedup_batch(clean, "text")
        expected |= {r["doc_id"] for r in kept.collect()}

    # ---- streaming: identical stages inside foreachBatch ----
    src = str(tmp_path / "incoming")
    corpus = str(tmp_path / "corpus")
    os.makedirs(src, exist_ok=True)
    for i, rows in enumerate(_batches()):
        with open(os.path.join(src, f"b{i}.json"), "w") as f:
            f.write(
                "\n".join(json.dumps({"doc_id": d, "text": t}) for d, t in rows)
            )
    idx = MinHashIndex.build(
        spark.createDataFrame([], SCHEMA),
        str(tmp_path / "stream-idx"),
        "doc_id",
        "text",
    )

    def _curate(batch_df, _bid):
        clean = decontaminate(
            _gate(batch_df), bench, "doc_id", "text",
            bench_id_col="bench_id", bench_text_col="btext", n=13,
        )
        idx.dedup_batch(clean, "text").write.mode("append").parquet(corpus)

    q = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .writeStream.foreachBatch(_curate)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    await_finished(q)

    got = {r["doc_id"] for r in spark.read.parquet(corpus).collect()}
    # every gate did its job...
    assert 2 not in got          # quality-failed
    assert 102 not in got        # benchmark-contaminated
    assert len(got & {1, 101}) == 1 and len(got & {3, 202}) == 1  # dedup
    assert {103, 201} <= got     # clean singletons survive
    # ...and the stream is row-equal to the sequential batch pipeline,
    # up to micro-batch arrival order within near-dup families: file
    # order is not name-deterministic, so compare family-collapsed sets
    def collapse(s):
        fam = {1: "A", 101: "A", 3: "B", 202: "B"}
        return {fam.get(d, d) for d in s}

    assert collapse(got) == collapse(expected)


def test_streaming_curation_auto_compact_bounds_store_files(spark, tmp_path):
    """VERDICT r6 item 7: a long-lived curation stream with
    ``auto_compact_files`` keeps the signature store's file count BOUNDED
    (every micro-batch otherwise adds one file per band) while the dedup
    verdicts stay exactly those of the unmaintained index."""
    import glob

    n_batches = 12
    bands = 4
    ceiling = 2 * bands + 1  # auto-compact threshold (> 2*bands contract)

    # near-dup pairs across far-apart batches force real store probes
    def batch_rows(i):
        return [
            (i * 10 + 1, f"document number {i} about topic alpha with plenty "
                         f"of unique running text to shingle reliably"),
            (i * 10 + 2, _RIVERS + f" variant {i}"),  # near-dup family
        ]

    src = str(tmp_path / "incoming")
    os.makedirs(src, exist_ok=True)
    for i in range(n_batches):
        with open(os.path.join(src, f"b{i:03d}.json"), "w") as f:
            f.write(
                "\n".join(
                    json.dumps({"doc_id": d, "text": t}) for d, t in batch_rows(i)
                )
            )

    maintained = MinHashIndex.build(
        spark.createDataFrame([], SCHEMA), str(tmp_path / "m-idx"),
        "doc_id", "text", bands=bands, auto_compact_files=ceiling,
    )
    plain = MinHashIndex.build(
        spark.createDataFrame([], SCHEMA), str(tmp_path / "p-idx"),
        "doc_id", "text", bands=bands,
    )
    corpus = str(tmp_path / "corpus")
    peak_files = []

    def _curate(batch_df, _bid):
        maintained.dedup_batch(batch_df, "text").write.mode("append").parquet(corpus)
        peak_files.append(
            len(glob.glob(os.path.join(maintained.path, "band=*", "*.parquet")))
        )

    q = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .writeStream.foreachBatch(_curate)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    await_finished(q)

    # bounded: the store never exceeds threshold + one batch's worth of
    # files (compaction runs right after the append that crosses it)
    assert max(peak_files) <= ceiling + bands
    assert peak_files[-1] <= ceiling + bands
    # sequential reference over the SAME batches, unmaintained index:
    # verdicts must be identical up to micro-batch arrival order within a
    # near-dup family (file order is not name-deterministic) — compare
    # family-collapsed, like the row-equality test above
    expected = set()
    for i in range(n_batches):
        kept = plain.dedup_batch(
            spark.createDataFrame(batch_rows(i), SCHEMA), "text"
        )
        expected |= {r["doc_id"] for r in kept.collect()}
    got = {r["doc_id"] for r in spark.read.parquet(corpus).collect()}
    assert {d % 10 for d in got} == {d % 10 for d in expected}
    assert len(got) == len(expected)
    # the unmaintained store really did grow past the ceiling (the test
    # would be vacuous otherwise)
    assert len(
        glob.glob(os.path.join(plain.path, "band=*", "*.parquet"))
    ) > ceiling + bands


def test_curate_stream_facade_equals_batch_curate(spark, tmp_path):
    """pipeline.curate_stream (VERDICT r8 item 6): one call composes
    gates -> build-once Bloom decontamination -> incremental MinHash dedup
    -> parquet append. Multi-batch arrival must equal the one-shot batch
    facade up to near-dup family order (first-arrival vs lowest-id
    survivor), the per-trigger gate funnel must arrive in the progress
    events' observed metrics, and the per-batch stage funnel in the JSONL
    log."""
    from pyspark.sql import functions as F

    from sample_dms_kinesis_rds_mariadb_spark.pipeline import (
        curate,
        curate_stream,
    )

    bench = spark.createDataFrame(
        [(900, _BENCH_Q)], "bench_id long, btext string"
    ).cache()
    bench.count()
    gates = {"quality": quality_columns(F.col("text"))["is_quality"]}
    try:
        src = str(tmp_path / "incoming")
        os.makedirs(src, exist_ok=True)
        for i, rows in enumerate(_batches()):
            with open(os.path.join(src, f"b{i}.json"), "w") as f:
                f.write(
                    "\n".join(
                        json.dumps({"doc_id": d, "text": t}) for d, t in rows
                    )
                )
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(src)
        )
        run = curate_stream(
            stream,
            index_path=str(tmp_path / "idx"),
            output_path=str(tmp_path / "corpus"),
            checkpoint=str(tmp_path / "ckpt"),
            gates=gates,
            decontaminate_against=bench,
            bench_id_col="bench_id",
            bench_text_col="btext",
        )
        await_finished(run.query)
        got = {
            r["doc_id"]
            for r in spark.read.parquet(str(tmp_path / "corpus")).collect()
        }

        # one-shot batch facade over the SAME docs
        all_rows = [r for rows in _batches() for r in rows]
        docs = spark.createDataFrame(all_rows, SCHEMA)
        res = curate(
            docs,
            gates=gates,
            dedup=("minhash",),
            decontaminate_against=bench.select(
                F.col("bench_id").alias("doc_id"),
                F.col("btext").alias("text"),
            ),
            report=False,
        )
        expected = {r["doc_id"] for r in res.corpus.collect()}

        def collapse(s):
            fam = {1: "A", 101: "A", 3: "B", 202: "B"}
            return {fam.get(d, d) for d in s}

        assert collapse(got) == collapse(expected)
        assert 2 not in got and 102 not in got

        # per-batch stage funnel (JSONL): 3 batches, monotone stage counts
        funnel = run.funnel()
        assert len(funnel) == 3
        assert sum(f["input"] for f in funnel) == 7  # post-gate rows
        assert all(f["decontaminated"] <= f["input"] for f in funnel)
        assert all(f["kept"] <= f["decontaminated"] for f in funnel)
        assert sum(f["kept"] for f in funnel) == len(got)

        # per-trigger GATE funnel rides the progress events (observe)
        gate_rows = run.gate_progress()
        assert gate_rows, "no observed gate metrics in progress events"
        assert sum(g["input_rows"] for g in gate_rows) == 8
        assert sum(g["after_quality"] for g in gate_rows) == 7
    finally:
        bench.unpersist()


def test_curate_stream_resumes_existing_index(spark, tmp_path):
    """A second curate_stream run against the SAME index path resumes it:
    re-arriving near-dups of already-kept docs are dropped, not re-kept."""
    from sample_dms_kinesis_rds_mariadb_spark.pipeline import curate_stream

    src1 = str(tmp_path / "in1")
    os.makedirs(src1, exist_ok=True)
    with open(os.path.join(src1, "a.json"), "w") as f:
        f.write(json.dumps({"doc_id": 1, "text": _RIVERS}))
    run1 = curate_stream(
        spark.readStream.schema(SCHEMA).json(src1),
        index_path=str(tmp_path / "idx"),
        output_path=str(tmp_path / "corpus"),
        checkpoint=str(tmp_path / "ck1"),
    )
    await_finished(run1.query)

    src2 = str(tmp_path / "in2")
    os.makedirs(src2, exist_ok=True)
    with open(os.path.join(src2, "b.json"), "w") as f:
        f.write(
            json.dumps({"doc_id": 50, "text": _RIVERS + " again"})
            + "\n"
            + json.dumps({"doc_id": 51, "text": _DESERTS})
        )
    run2 = curate_stream(
        spark.readStream.schema(SCHEMA).json(src2),
        index_path=str(tmp_path / "idx"),
        output_path=str(tmp_path / "corpus"),
        checkpoint=str(tmp_path / "ck2"),
    )
    await_finished(run2.query)
    got = {
        r["doc_id"]
        for r in spark.read.parquet(str(tmp_path / "corpus")).collect()
    }
    assert got == {1, 51}  # 50 deduped against the RESUMED index


def test_exactly_once_batch_write_overwrites_on_replay(spark, tmp_path):
    """_exactly_once_batch_write (r10, ADVICE fix): batch-scoped
    deterministic file names in a FLAT output dir — a replayed batch
    replaces its own files (no duplicate rows for the crash window
    between the parquet write and the funnel commit), different batches
    and different checkpoints never collide, and plain
    spark.read.parquet(output_path) keeps working."""
    import glob

    from sample_dms_kinesis_rds_mariadb_spark.pipeline import (
        _exactly_once_batch_write,
    )

    out = str(tmp_path / "corpus")
    os.makedirs(out, exist_ok=True)
    b0 = spark.createDataFrame([(1, "a"), (2, "b")], SCHEMA)
    _exactly_once_batch_write(b0, out, "ckpt-x", 0)
    assert {r["doc_id"] for r in spark.read.parquet(out).collect()} == {1, 2}
    # replay of batch 0 (possibly with identical content): no duplicates
    _exactly_once_batch_write(b0, out, "ckpt-x", 0)
    got = [r["doc_id"] for r in spark.read.parquet(out).collect()]
    assert sorted(got) == [1, 2]
    # a second batch unions in
    _exactly_once_batch_write(
        spark.createDataFrame([(3, "c")], SCHEMA), out, "ckpt-x", 1
    )
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(out).collect()
    ) == [1, 2, 3]
    # a different checkpoint reusing batch id 0 does NOT clobber ckpt-x's
    _exactly_once_batch_write(
        spark.createDataFrame([(9, "z")], SCHEMA), out, "ckpt-y", 0
    )
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(out).collect()
    ) == [1, 2, 3, 9]
    # flat layout: every data file is a prefixed sibling, no subdirs left
    assert not [
        p for p in glob.glob(os.path.join(out, "*")) if os.path.isdir(p)
    ]
    assert all(
        os.path.basename(p).startswith("batch-")
        for p in glob.glob(os.path.join(out, "*.parquet"))
    )


def test_curate_stream_crash_between_write_and_funnel_is_exactly_once(
    spark, tmp_path
):
    """The r9 ADVICE crash window: parquet written, funnel line NOT
    committed, micro-batch replays. Simulated by deleting the last
    batch's funnel line and its checkpoint commit file, then restarting
    the stream — the replay must OVERWRITE that batch's parquet (same
    verdicts, no duplicate rows), not append a second copy."""
    from sample_dms_kinesis_rds_mariadb_spark.pipeline import curate_stream

    src = str(tmp_path / "in")
    os.makedirs(src, exist_ok=True)
    for i, rows in enumerate(_batches()):
        with open(os.path.join(src, f"b{i}.json"), "w") as f:
            f.write(
                "\n".join(json.dumps({"doc_id": d, "text": t}) for d, t in rows)
            )
    kwargs = dict(
        index_path=str(tmp_path / "idx"),
        output_path=str(tmp_path / "corpus"),
        checkpoint=str(tmp_path / "ckpt"),
    )
    run = curate_stream(
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(src),
        **kwargs,
    )
    await_finished(run.query)
    before = sorted(
        r["doc_id"] for r in spark.read.parquet(kwargs["output_path"]).collect()
    )
    funnel_lines = open(run.funnel_path).read().strip().splitlines()
    n_batches = len(funnel_lines)
    assert n_batches == 3
    last_id = max(json.loads(ln)["batch_id"] for ln in funnel_lines)
    # simulate the crash: the batch's parquet files exist, but neither
    # the funnel line nor the checkpoint commit made it to disk
    with open(run.funnel_path, "w") as f:
        for ln in funnel_lines:
            if json.loads(ln)["batch_id"] != last_id:
                f.write(ln + "\n")
    os.remove(os.path.join(kwargs["checkpoint"], "commits", str(last_id)))
    crc = os.path.join(kwargs["checkpoint"], "commits", f".{last_id}.crc")
    if os.path.exists(crc):  # local-FS checksum sidecar blocks the re-commit
        os.remove(crc)
    run2 = curate_stream(
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(src),
        **kwargs,
    )
    await_finished(run2.query)
    after = sorted(
        r["doc_id"] for r in spark.read.parquet(kwargs["output_path"]).collect()
    )
    assert after == before  # identical verdicts, zero duplicates
    replayed = [
        json.loads(ln) for ln in open(run2.funnel_path) if ln.strip()
    ]
    assert len(replayed) == n_batches  # the funnel line was re-committed


# -- streaming MEDIA curation (r10: VERDICT item 6) ---------------------------

MEDIA_SCHEMA = (
    "media_id LONG, content BINARY, media_type STRING, source_uri STRING"
)


def _media_batch_file(spark, src_dir: str, name: str, rows) -> None:
    """Write one parquet FILE into the streaming source dir (one trigger
    with maxFilesPerTrigger=1)."""
    import glob
    import shutil

    tmp = os.path.join(src_dir, f".stage-{name}")
    spark.createDataFrame(rows, MEDIA_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(tmp)
    part = glob.glob(os.path.join(tmp, "*.parquet"))[0]
    os.replace(part, os.path.join(src_dir, f"{name}.parquet"))
    shutil.rmtree(tmp, ignore_errors=True)


def _media_blobs():
    """Image families + audio family + a corrupt payload, ids encoding
    arrival order across 3 batches."""
    import numpy as np

    from tests.gif_writer import write_gif
    from tests.test_audio_dedup import _clip_family
    from tests.test_operators import _wav  # noqa: F401 (via _clip_family)

    rng = np.random.default_rng(9)

    def ppm(px):
        h, w, _ = px.shape
        return b"P6\n%d %d\n255\n" % (w, h) + px.astype(np.uint8).tobytes()

    palette = rng.integers(0, 256, (16, 3), dtype=np.int64)
    idx = rng.integers(0, 16, (24, 32))
    base_px = palette[idx]
    gif_blob = write_gif(
        [{"indices": idx.astype(np.uint8).tobytes()}],
        32, 24, palette.astype(np.uint8).tobytes(),
    )
    u1 = ppm(rng.integers(0, 256, (24, 32, 3), dtype=np.int64))
    u2 = ppm(rng.integers(0, 256, (24, 32, 3), dtype=np.int64))
    audio_orig, audio_transcode, _ = _clip_family(11)
    blobs = {
        1: ("image", ppm(base_px)),          # batch 1: original
        2: ("audio", audio_orig),            # batch 1: audio original
        3: ("image", u1),                    # batch 1: unrelated
        101: ("image", ppm(base_px)),        # batch 2: exact byte dup of 1
        102: ("image", b"\x00\x01not-an-image"),  # batch 2: decode-gate drop
        103: ("image", gif_blob),            # batch 2: GIF re-encode of 1
        201: ("audio", audio_transcode),     # batch 3: transcode of 2
        202: ("image", u2),                  # batch 3: unrelated
    }
    return blobs, ([1, 2, 3], [101, 102, 103], [201, 202])


def test_curate_media_stream_family_equal_and_audio(spark, tmp_path):
    """curate_media_stream: 3-batch arrival must equal the one-shot
    curate_media over the image rows (ids encode arrival, so survivors
    match exactly: sha dup, perceptual GIF re-encode, and the corrupt
    payload all drop) and the opt-in audio branch drops the µ-law
    transcode of a batch-1 clip via AudioDedupIndex."""
    from sample_dms_kinesis_rds_mariadb_spark.pipeline import (
        curate_media,
        curate_media_stream,
    )

    blobs, batches = _media_blobs()
    src = str(tmp_path / "in")
    os.makedirs(src, exist_ok=True)
    for i, ids in enumerate(batches):
        _media_batch_file(
            spark, src, f"b{i}",
            [(j, bytearray(blobs[j][1]), blobs[j][0], f"s://{j}")
             for j in ids],
        )
    run = curate_media_stream(
        spark.readStream.schema(MEDIA_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        index_path=str(tmp_path / "img-idx"),
        output_path=str(tmp_path / "media-out"),
        checkpoint=str(tmp_path / "ckpt"),
        audio_index_path=str(tmp_path / "aud-idx"),
    )
    await_finished(run.query)
    got = sorted(
        r["media_id"]
        for r in spark.read.parquet(str(tmp_path / "media-out")).collect()
    )

    # one-shot image reference: same rows, batch façade
    image_rows = [
        (j, bytearray(b), t, f"s://{j}")
        for j, (t, b) in sorted(blobs.items()) if t == "image"
    ]
    res = curate_media(
        spark.createDataFrame(image_rows, MEDIA_SCHEMA), report=False
    )
    want_images = sorted(r["media_id"] for r in res.corpus.collect())
    assert [i for i in got if blobs[i][0] == "image"] == want_images
    assert want_images == [1, 3, 202]   # 101 sha, 103 dhash, 102 gated
    assert [i for i in got if blobs[i][0] == "audio"] == [2]  # 201 transcode

    funnel = run.funnel()
    assert [f["batch_id"] for f in funnel] == [0, 1, 2]
    assert funnel[1]["input"] == 3 and funnel[1]["decodable"] == 2
    assert funnel[1]["dedup_sha256"] == 1    # 101 dropped vs stored digest
    assert funnel[1]["dedup_dhash"] == 0     # 103 dropped vs stored dhash
    assert funnel[2]["audio_in"] == 1 and funnel[2]["audio_kept"] == 0
    assert sum(f["kept"] for f in funnel) == len(got)


def test_curate_media_stream_replay_is_exactly_once(spark, tmp_path):
    """A replayed media micro-batch (crash between the parquet write and
    the funnel commit) reproduces identical verdicts and OVERWRITES its
    own files — no duplicate survivors."""
    from sample_dms_kinesis_rds_mariadb_spark.pipeline import (
        curate_media_stream,
    )

    blobs, batches = _media_blobs()
    src = str(tmp_path / "in")
    os.makedirs(src, exist_ok=True)
    for i, ids in enumerate(batches):
        _media_batch_file(
            spark, src, f"b{i}",
            [(j, bytearray(blobs[j][1]), blobs[j][0], f"s://{j}")
             for j in ids],
        )
    kwargs = dict(
        index_path=str(tmp_path / "img-idx"),
        output_path=str(tmp_path / "media-out"),
        checkpoint=str(tmp_path / "ckpt"),
        audio_index_path=str(tmp_path / "aud-idx"),
    )

    def _stream():
        return (
            spark.readStream.schema(MEDIA_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    run = curate_media_stream(_stream(), **kwargs)
    await_finished(run.query)
    before = sorted(
        r["media_id"]
        for r in spark.read.parquet(kwargs["output_path"]).collect()
    )
    lines = open(run.funnel_path).read().strip().splitlines()
    last_id = max(json.loads(ln)["batch_id"] for ln in lines)
    with open(run.funnel_path, "w") as f:
        for ln in lines:
            if json.loads(ln)["batch_id"] != last_id:
                f.write(ln + "\n")
    os.remove(os.path.join(kwargs["checkpoint"], "commits", str(last_id)))
    crc = os.path.join(kwargs["checkpoint"], "commits", f".{last_id}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    run2 = curate_media_stream(_stream(), **kwargs)
    await_finished(run2.query)
    after = sorted(
        r["media_id"]
        for r in spark.read.parquet(kwargs["output_path"]).collect()
    )
    assert after == before
    assert len(run2.funnel()) == len(lines)


def test_curate_media_stream_custom_id_col_and_null_type(spark, tmp_path):
    """Review fixes at the streaming façade: (a) id_col other than
    media_id works — the batch body normalizes per micro-batch and the
    output files carry the caller's column name; (b) a NULL media_type
    row flows through the IMAGE branch under an active audio index
    instead of vanishing from both filters."""
    import numpy as np

    from sample_dms_kinesis_rds_mariadb_spark.pipeline import (
        curate_media_stream,
    )

    rng = np.random.default_rng(23)

    def ppm(px):
        h, w, _ = px.shape
        return b"P6\n%d %d\n255\n" % (w, h) + px.astype(np.uint8).tobytes()

    schema = "img_id LONG, content BINARY, media_type STRING, source_uri STRING"
    rows = [
        (1, bytearray(ppm(rng.integers(0, 256, (16, 16, 3), dtype=np.int64))),
         "image", "s://1"),
        (2, bytearray(ppm(rng.integers(0, 256, (16, 16, 3), dtype=np.int64))),
         None, "s://2"),  # NULL type -> image branch
    ]
    src = str(tmp_path / "in")
    os.makedirs(src, exist_ok=True)
    import glob
    import shutil

    tmp = os.path.join(src, ".stage-b0")
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(tmp)
    os.replace(
        glob.glob(os.path.join(tmp, "*.parquet"))[0],
        os.path.join(src, "b0.parquet"),
    )
    shutil.rmtree(tmp, ignore_errors=True)

    run = curate_media_stream(
        spark.readStream.schema(schema).parquet(src),
        index_path=str(tmp_path / "img-idx"),
        output_path=str(tmp_path / "out"),
        checkpoint=str(tmp_path / "ckpt"),
        id_col="img_id",
        audio_index_path=str(tmp_path / "aud-idx"),
    )
    await_finished(run.query)
    out = spark.read.parquet(str(tmp_path / "out"))
    assert "img_id" in out.columns
    assert sorted(r["img_id"] for r in out.collect()) == [1, 2]
