"""One-call curation pipeline façade (VERDICT r7 item 8).

The operator library is a toolkit — gates, dedup families,
decontamination, splits, budget-sharded export, data card — and
``examples/llm_data_pipeline.py`` chains them manually. :func:`curate`
composes the standard funnel in one call::

    result = curate(
        docs,
        gates={"lang": F.col("lang") == "en", "quality": qc["is_quality"]},
        dedup=("exact", "minhash"),
        decontaminate_against=eval_docs,
        heldout_frac=0.05,
        export_path="/data/out", export_budget=1_000_000,
        data_card_path="/data/out/card.json",
    )
    result.corpus      # the curated (train) DataFrame — lazy
    result.funnel      # ordered (stage, surviving_rows) pairs
    result.manifest    # budget-shard manifest (if exported)
    result.data_card   # card dict (if requested)

Scale shape: every stage is one of the library's audited shapes — the
gates ride a single observe'd scan (no extra job for their counts), the
dedup stages are hash/band shuffles on (id, fingerprint)-width rows, the
split is a stateless md5-bucket verdict, and the export is the two-pass
prefix-sum sharder. The only driver-side values are the funnel counts,
the manifest, and the card. Stage counts for the non-gate stages are one
``count()`` action each — skip them with ``report=False`` when the run
is pure throughput (the gate funnel still arrives free on the export's
scan).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .functions.hashing import shingles
from .operators.audit import audited_filter, funnel_report
from .operators.dedup import (
    dedup_connected,
    decontaminate,
    doc_fingerprint,
    minhash_lsh_candidate_pairs,
)
from .operators.export import write_budget_shards
from .operators.profile import write_data_card
from .operators.sampling import split_train_heldout
from .functions.text import token_count

DEDUP_STAGES = ("exact", "minhash")


@dataclass
class StreamingCuration:
    """Handle for a running :func:`curate_stream`: the StreamingQuery, the
    incremental MinHash index, and the per-trigger funnel log."""

    query: object  # pyspark.sql.streaming.StreamingQuery
    index: object  # operators.dedup.MinHashIndex
    funnel_path: str

    def funnel(self) -> list[dict]:
        """Per-micro-batch stage counts, in trigger order (one JSON object
        per completed batch: batch_id, input, decontaminated, kept)."""
        import json
        import os

        if not os.path.exists(self.funnel_path):
            return []
        with open(self.funnel_path) as f:
            return [json.loads(line) for line in f if line.strip()]

    def gate_progress(self) -> list[dict]:
        """The gate funnel per trigger, read from the streaming progress
        events' observed metrics (``observed_gates`` attaches them to the
        scan — zero extra jobs)."""
        out = []
        for p in self.query.recentProgress:
            m = (p.get("observedMetrics") or {}).get("curate_gates")
            if m is not None:
                out.append(dict(m.asDict()) if hasattr(m, "asDict") else dict(m))
        return out


def curate_media(
    media: DataFrame,
    *,
    id_col: str = "media_id",
    min_width: int | None = None,
    min_height: int | None = None,
    dedup: tuple[str, ...] = ("sha256", "dhash"),
    dhash_max_hamming: int = 7,
    report: bool = True,
    audio: bool = False,
    audio_max_hamming: int = 6,
    audio_min_frac: float = 0.5,
) -> CurationResult:
    """The MEDIA dual of :func:`curate`: decode gate → exact byte dedup →
    perceptual near-dup dedup over a binary media table (the
    ``MEDIA_SCHEMA`` shape), with the same funnel accounting.

    1. **decode gate** — one Arrow metadata pass
       (``multimodal.extract_image_features`` with the any-bytes-row
       contract); payloads whose REAL decode fails drop, as do images
       under ``min_width``/``min_height``.
    2. **sha256 dedup** — keep the lowest id per payload digest (byte
       duplicates: the same file crawled twice).
    3. **dhash dedup** — transitive perceptual dedup
       (:func:`operators.image_dedup.dedup_images`): re-encodes, format
       conversions and mild edits of the same image collapse to one
       survivor (keep-lowest-id).
    4. **audio** (r10, opt-in ``audio=True`` — the batch twin of
       :func:`curate_media_stream`'s branch): rows with
       ``media_type = 'audio'`` bypass the image stages and run their own
       decode gate (``extract_audio_features`` any-bytes pass) → sha256
       byte dedup (when ``'sha256' in dedup``) → perceptual near-dup
       dedup (``audio_dedup.audio_near_pairs`` + transitive
       keep-lowest-id, when ``'dhash' in dedup`` — the same toggle as
       the image perceptual stage). Rows with NULL ``media_type`` fall
       to the image branch. Without the flag, audio rows fall to the
       IMAGE decode gate and drop — the pre-r10 behavior, kept as the
       default for façade stability.

    Stages are skipped when absent from ``dedup`` / gates are None.
    Returns the surviving media rows plus the funnel."""
    from .operators.image_dedup import dedup_images
    from .operators.multimodal import extract_image_features

    for d in dedup:
        if d not in ("sha256", "dhash"):
            raise ValueError(f"unknown media dedup stage {d!r}")
    # the Arrow feature passes and the dedup operators address the id
    # column as media_id — normalize a custom id_col at the boundary and
    # restore it on the way out
    rename = id_col != "media_id"
    if rename:
        if "media_id" in media.columns:
            raise ValueError(
                f"id_col={id_col!r} conflicts with an existing media_id "
                "column"
            )
        media = media.withColumnRenamed(id_col, "media_id")
    orig_id_col, id_col = id_col, "media_id"
    funnel: list[tuple[str, int]] = []
    audio_rows = None
    cur = media
    if audio:
        # coalesce: a NULL media_type must fall to the image branch, not
        # vanish from both (NULL == 'audio' and NOT NULL are both NULL)
        is_audio = F.coalesce(
            F.col("media_type") == F.lit("audio"), F.lit(False)
        )
        audio_rows = media.filter(is_audio)
        cur = media.filter(~is_audio)
    if report:
        funnel.append(("input", cur.count()))

    # decode gate: fake_decode=True makes undecodable payloads surface as
    # format='fake' rows instead of failing the task — the gate drops them
    feats = extract_image_features(
        cur.select(id_col, "content"), fake_decode=True
    ).select(id_col, "format", "width", "height", "sha256")
    keep = F.col("format") != "fake"
    if min_width is not None:
        keep = keep & (F.col("width") >= min_width)
    if min_height is not None:
        keep = keep & (F.col("height") >= min_height)
    # pin the decode pass: the funnel counts and the sha/dhash stages all
    # consume this frame, and mapInPandas is opaque to plan reuse — an
    # unpinned lineage re-decodes every payload per downstream action.
    # Bounded: one narrow row per payload.
    kept_feats = feats.filter(keep).localCheckpoint(eager=True)
    cur = cur.join(kept_feats.select(id_col), id_col, "left_semi")
    if report:
        funnel.append(("decodable", cur.count()))

    if "sha256" in dedup:
        keepers = (
            kept_feats.groupBy("sha256")
            .agg(F.min(id_col).alias(id_col))
            .select(id_col)
        )
        cur = cur.join(keepers, id_col, "left_semi")
        if report:
            funnel.append(("dedup_sha256", cur.count()))

    if "dhash" in dedup:
        cur = dedup_images(cur, max_hamming=dhash_max_hamming)
        if report:
            funnel.append(("dedup_dhash", cur.count()))

    if audio_rows is not None:
        from .operators.audio_dedup import audio_near_pairs
        from .operators.dedup import dedup_connected
        from .operators.multimodal import extract_audio_features

        if report:
            funnel.append(("audio_in", audio_rows.count()))
        afeats = extract_audio_features(
            audio_rows.select(id_col, "content"), fake_decode=True
        ).filter(F.col("format") != "fake")
        akept = audio_rows.join(
            afeats.select(id_col), id_col, "left_semi"
        )
        if report:
            funnel.append(("audio_decodable", akept.count()))
        if "sha256" in dedup:
            keepers = (
                akept.select(id_col, F.sha2(F.col("content"), 256).alias("_d"))
                .groupBy("_d")
                .agg(F.min(id_col).alias(id_col))
                .select(id_col)
            )
            akept = akept.join(keepers, id_col, "left_semi")
            if report:
                funnel.append(("audio_dedup_sha256", akept.count()))
        if "dhash" in dedup:
            # the perceptual stage obeys the same dedup toggle as the
            # image branch ('dhash' = perceptual near-dup on/off)
            # pin before the self-join pair engine: the decode gate's
            # Arrow pass would otherwise re-run per join side
            akept = akept.localCheckpoint(eager=True)
            pairs = audio_near_pairs(
                akept, max_hamming=audio_max_hamming,
                min_frac=audio_min_frac,
            )
            akept = dedup_connected(akept, pairs, id_col, keep="min_id")
            if report:
                funnel.append(("audio_dedup_perceptual", akept.count()))
        cur = cur.unionByName(akept)

    if rename:
        cur = cur.withColumnRenamed("media_id", orig_id_col)
    return CurationResult(corpus=cur, heldout=None, funnel=funnel)


def _exactly_once_batch_write(
    kept: DataFrame, output_path: str, checkpoint: str, batch_id: int
) -> None:
    """Idempotent micro-batch parquet write: the batch's rows land under
    deterministic file names ``batch-<ckpt8>-<batch_id>-NNN.parquet``
    directly in ``output_path`` (flat — ``spark.read.parquet(output_path)``
    keeps working), via a hidden scratch dir on the same filesystem. A
    replayed batch first DELETES its own prefix, so the crash window
    between this write and the funnel commit yields exactly-once rows,
    not at-least-once (r9 ADVICE). The recompute is verdict-identical on
    replay (the index probe's same-batch self-exclusion), so deleting and
    rewriting is safe."""
    import glob
    import hashlib
    import os
    import shutil

    ckpt8 = hashlib.sha256(checkpoint.encode()).hexdigest()[:8]
    prefix = f"batch-{ckpt8}-{int(batch_id)}-"
    # dot-prefixed scratch inside output_path: same FS (os.replace is a
    # rename, never a copy) and invisible to Spark's file listing
    scratch = os.path.join(output_path, f".tmp-{prefix.rstrip('-')}")
    kept.write.mode("overwrite").parquet(scratch)
    for old in glob.glob(os.path.join(output_path, prefix + "*")):
        os.remove(old)
    for i, src in enumerate(
        sorted(glob.glob(os.path.join(scratch, "*.parquet")))
    ):
        os.replace(src, os.path.join(output_path, f"{prefix}{i:05d}.parquet"))
    shutil.rmtree(scratch, ignore_errors=True)


def curate_stream(
    stream: DataFrame,
    *,
    index_path: str,
    output_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    content_col: str | None = None,
    gates: dict[str, Column] | None = None,
    decontaminate_against: DataFrame | None = None,
    bench_id_col: str | None = None,
    bench_text_col: str | None = None,
    decontaminate_n: int = 13,
    decontaminate_fpp: float = 0.01,
    minhash_n: int = 3,
    minhash_bands: int = 4,
    auto_compact_files: int | None = None,
    funnel_path: str | None = None,
    available_now: bool = True,
    processing_time: str | None = None,
) -> StreamingCuration:
    """The STREAMING dual of :func:`curate`: (optional binary intake →)
    gates → Bloom benchmark decontamination → incremental MinHash
    near-dup dedup → parquet append, composed as one ``foreachBatch``
    stage over an arriving stream. With ``content_col`` the stream
    carries raw crawl payloads; they route through
    :func:`sources.docformats.route_document_texts` and extraction
    failures drop through an implicit ``extracted`` gate counted in the
    same observed-metrics channel as the user gates.

    Stage shapes (each the library's audited streaming form):

    1. **gates** ride the stream itself via :func:`operators.audit
       .observed_gates` — the per-trigger gate funnel arrives in every
       progress event's observed metrics (``gate_progress()``), zero
       extra jobs.
    2. **decontamination** uses a Bloom filter BUILT ONCE at setup
       (:func:`operators.dedup.build_decontamination_bloom`); each
       micro-batch pays one Arrow probe pass + an exact verify join
       bounded to its flagged slice — the benchmark is never re-scanned.
    3. **dedup** is the incremental :class:`operators.dedup.MinHashIndex`
       (created at ``index_path`` or resumed if one exists): each batch
       probes the store on (band, signature) and appends its own
       signatures — batch-shuffle-sized, never corpus-sized, with
       ``auto_compact_files`` bounding store file counts on long runs.
    4. survivors land in ``output_path`` under BATCH-SCOPED deterministic
       file names (``batch-<ckpt>-<id>-NNN.parquet`` via
       :func:`_exactly_once_batch_write`) and the per-batch stage counts
       append to ``funnel_path`` (JSONL) — multi-batch arrival is
       row-equal to running the batch stages sequentially per arrival
       (tested), and family-equal to the one-shot batch :func:`curate`
       (first-arrival vs lowest-id survivor). A replayed micro-batch
       OVERWRITES its own files, so consumers of ``output_path`` see
       exactly-once rows even for a crash between the parquet write and
       the funnel commit (r9 ADVICE: plain append was at-least-once
       across that window).
    """
    import json
    import os

    from .operators.dedup import (
        MinHashIndex,
        build_decontamination_bloom,
        decontaminate_bloom,
    )
    from .operators.audit import observed_gates

    spark = stream.sparkSession
    if funnel_path is None:
        funnel_path = output_path.rstrip("/") + ".funnel.jsonl"

    cur = stream
    if content_col is not None:
        # binary intake (the streaming dual of curate()'s stage 0):
        # route raw payloads through the document front door; extraction
        # failures drop through an implicit first GATE whose count rides
        # the same observed-metrics channel as the user gates
        from .sources.docformats import route_document_texts

        cur = route_document_texts(
            cur, id_col=id_col, content_col=content_col
        )
        if text_col != "text":
            cur = cur.withColumnRenamed("text", text_col)
        gates = {"extracted": F.col("error").isNull(), **(gates or {})}
    if gates:
        cur = observed_gates(cur, gates, name="curate_gates")
    if content_col is not None:
        cur = cur.drop("error")

    bloom = None
    if decontaminate_against is not None:
        bloom = build_decontamination_bloom(
            decontaminate_against,
            bench_id_col or id_col,
            bench_text_col or text_col,
            n=decontaminate_n,
            fpp=decontaminate_fpp,
        )

    if MinHashIndex.exists(index_path):
        index = MinHashIndex.load(
            spark, index_path, auto_compact_files=auto_compact_files
        )
    else:
        if content_col is not None:
            from pyspark.sql import types as _T

            sig_schema = _T.StructType(
                [stream.schema[id_col],
                 _T.StructField(text_col, _T.StringType())]
            )
        else:
            sig_schema = stream.select(id_col, text_col).schema
        empty = spark.createDataFrame([], sig_schema)
        index = MinHashIndex.build(
            empty, index_path, id_col, text_col,
            n=minhash_n, bands=minhash_bands,
            auto_compact_files=auto_compact_files,
        )

    def _curate_batch(batch_df, batch_id) -> None:
        # replay guard: Structured Streaming re-runs a micro-batch whose
        # checkpoint didn't commit (crash between our writes and the
        # commit). The funnel log records completed (checkpoint, batch_id)
        # pairs — skip a batch already processed, so output rows and
        # funnel lines never duplicate. Scoped to THIS checkpoint: batch
        # ids restart per checkpoint, and a later stream appending to the
        # same output path legitimately reuses them. (A crash BETWEEN the
        # parquet write and the funnel append replays the batch, and
        # _exactly_once_batch_write overwrites that batch's own files —
        # exactly-once output; the index probe's self-exclusion keeps the
        # replayed verdicts identical.)
        if os.path.exists(funnel_path):
            with open(funnel_path) as f:
                done = {
                    (d.get("checkpoint"), d["batch_id"])
                    for d in (json.loads(ln) for ln in f if ln.strip())
                }
            if (checkpoint, int(batch_id)) in done:
                return
        # (a batch NOT in the funnel may still have written parquet —
        # crash between the two; _exactly_once_batch_write overwrites
        # that batch's own files below, so no duplicate rows survive)
        # pin the micro-batch ONCE: every action below would otherwise
        # re-execute the observed gate scan (foreachBatch frames re-run
        # their lineage per action), multiplying the per-trigger observed
        # metrics by the action count — the checkpoint fires them exactly
        # once per trigger and the stages read the pinned rows
        batch_df = batch_df.localCheckpoint(eager=True)
        n_in = batch_df.count()
        clean = batch_df
        if bloom is not None:
            # pin the decontaminated frame too: the count below plus the
            # index probe/in-batch signatures/append/write would otherwise
            # re-run the Bloom Arrow pass + verify join ~5x per trigger
            clean = decontaminate_bloom(
                batch_df, None, id_col, text_col, prebuilt=bloom
            ).localCheckpoint(eager=True)
        n_clean = clean.count() if bloom is not None else n_in
        kept = index.dedup_batch(clean, text_col)
        _exactly_once_batch_write(kept, output_path, checkpoint, batch_id)
        # count what THIS batch kept from its own written files (never a
        # full re-read of the accumulated output)
        n_kept = kept.count()
        with open(funnel_path, "a") as f:
            f.write(
                json.dumps(
                    {
                        "batch_id": int(batch_id),
                        "checkpoint": checkpoint,
                        "input": int(n_in),
                        "decontaminated": int(n_clean),
                        "kept": int(n_kept),
                    }
                )
                + "\n"
            )

    writer = cur.writeStream.foreachBatch(_curate_batch).option(
        "checkpointLocation", checkpoint
    )
    if processing_time is not None:
        writer = writer.trigger(processingTime=processing_time)
    elif available_now:
        writer = writer.trigger(availableNow=True)
    os.makedirs(os.path.dirname(funnel_path) or ".", exist_ok=True)
    return StreamingCuration(
        query=writer.start(), index=index, funnel_path=funnel_path
    )


@dataclass
class StreamingMediaCuration:
    """Handle for a running :func:`curate_media_stream`: the
    StreamingQuery, the incremental indexes, and the per-trigger funnel
    log (same accessors as :class:`StreamingCuration`)."""

    query: object  # pyspark.sql.streaming.StreamingQuery
    image_index: object | None  # operators.image_dedup.ImageDedupIndex
    sha_index: object | None    # operators.dedup.ExactDigestIndex
    audio_index: object | None  # operators.audio_dedup.AudioDedupIndex
    funnel_path: str

    def funnel(self) -> list[dict]:
        import json
        import os

        if not os.path.exists(self.funnel_path):
            return []
        with open(self.funnel_path) as f:
            return [json.loads(line) for line in f if line.strip()]


def curate_media_stream(
    stream: DataFrame,
    *,
    index_path: str,
    output_path: str,
    checkpoint: str,
    id_col: str = "media_id",
    min_width: int | None = None,
    min_height: int | None = None,
    dedup: tuple[str, ...] = ("sha256", "dhash"),
    dhash_max_hamming: int = 7,
    audio_index_path: str | None = None,
    audio_max_hamming: int = 6,
    audio_min_frac: float = 0.5,
    auto_compact_files: int | None = None,
    funnel_path: str | None = None,
    available_now: bool = True,
    processing_time: str | None = None,
) -> StreamingMediaCuration:
    """The STREAMING dual of :func:`curate_media` (VERDICT r9 #6): decode
    gate → incremental exact byte dedup → incremental perceptual dedup,
    composed as one ``foreachBatch`` stage with :func:`curate_stream`'s
    replay-skip + exactly-once-write machinery.

    Stage shapes (each the library's audited incremental form):

    1. **decode gate** — one Arrow metadata pass per batch
       (``extract_image_features(fake_decode=True)``); payloads whose
       REAL decode fails drop, as do images under ``min_width``/
       ``min_height``.
    2. **sha256** — :class:`operators.dedup.ExactDigestIndex` at
       ``index_path + "-sha"``: prefix-partitioned digest store, batch
       probes never re-hash the corpus.
    3. **dhash** — :class:`operators.image_dedup.ImageDedupIndex` at
       ``index_path``: multi-index-hashed perceptual store; a new image
       within ``dhash_max_hamming`` bits of ANY stored image loses
       (arrival-order precedence — the streaming analog of the batch
       façade's lowest-id rule).
    4. **audio** (opt-in via ``audio_index_path``) — rows with
       ``media_type = 'audio'`` bypass the image stages and dedup through
       :class:`operators.audio_dedup.AudioDedupIndex` (decode gate:
       clips whose real decode fails drop via the same any-bytes Arrow
       features pass).

    Survivors land under batch-scoped exactly-once file names
    (:func:`_exactly_once_batch_write`); the per-batch funnel appends to
    ``funnel_path`` JSONL. Multi-batch arrival is family-equal to the
    one-shot :func:`curate_media` (first-arrival vs lowest-id survivor)
    and a replayed batch reproduces identical verdicts (tested)."""
    import json
    import os

    from .operators.audio_dedup import AudioDedupIndex
    from .operators.dedup import ExactDigestIndex
    from .operators.image_dedup import ImageDedupIndex
    from .operators.multimodal import (
        extract_audio_features,
        extract_image_features,
    )

    for d in dedup:
        if d not in ("sha256", "dhash"):
            raise ValueError(f"unknown media dedup stage {d!r}")
    spark = stream.sparkSession
    # the index classes and Arrow passes address the id column as
    # media_id — normalize a custom id_col per batch and restore it on
    # the output files (same boundary rule as curate_media)
    rename = id_col != "media_id"
    if rename and "media_id" in stream.columns:
        raise ValueError(
            f"id_col={id_col!r} conflicts with an existing media_id column"
        )
    if funnel_path is None:
        funnel_path = output_path.rstrip("/") + ".funnel.jsonl"
    empty = spark.createDataFrame([], stream.schema)
    if rename:
        empty = empty.withColumnRenamed(id_col, "media_id")

    sha_index = None
    if "sha256" in dedup:
        sha_path = index_path.rstrip("/") + "-sha"
        sha_index = (
            ExactDigestIndex.load(
                spark, sha_path, auto_compact_files=auto_compact_files
            )
            if ExactDigestIndex.exists(sha_path)
            else ExactDigestIndex.build(
                spark.createDataFrame([], "media_id long, sha256 string"),
                sha_path, "media_id", "sha256",
                auto_compact_files=auto_compact_files,
            )
        )
    image_index = None
    if "dhash" in dedup:
        image_index = (
            ImageDedupIndex.load(
                spark, index_path, auto_compact_files=auto_compact_files
            )
            if ImageDedupIndex.exists(index_path)
            else ImageDedupIndex.build(
                empty, index_path, max_hamming=dhash_max_hamming,
                auto_compact_files=auto_compact_files,
            )
        )
    audio_index = None
    if audio_index_path is not None:
        audio_index = (
            AudioDedupIndex.load(
                spark, audio_index_path,
                auto_compact_files=auto_compact_files,
            )
            if AudioDedupIndex.exists(audio_index_path)
            else AudioDedupIndex.build(
                empty, audio_index_path, max_hamming=audio_max_hamming,
                min_frac=audio_min_frac,
                auto_compact_files=auto_compact_files,
            )
        )

    def _curate_batch(batch_df, batch_id) -> None:
        # the curate_stream replay guard verbatim: a batch whose funnel
        # line committed is skipped; one that crashed mid-write replays
        # with identical verdicts (index same-batch self-exclusion) and
        # overwrites its own output files
        if os.path.exists(funnel_path):
            with open(funnel_path) as f:
                done = {
                    (d.get("checkpoint"), d["batch_id"])
                    for d in (json.loads(ln) for ln in f if ln.strip())
                }
            if (checkpoint, int(batch_id)) in done:
                return
        if rename:
            batch_df = batch_df.withColumnRenamed(id_col, "media_id")
        batch_df = batch_df.localCheckpoint(eager=True)
        n_in = batch_df.count()
        counts: dict[str, int] = {"input": n_in}

        # coalesce: a NULL media_type falls to the image branch instead
        # of vanishing from both filters
        is_audio = F.coalesce(
            F.col("media_type") == F.lit("audio"), F.lit(False)
        )
        images = (
            batch_df.filter(~is_audio)
            if audio_index is not None else batch_df
        )
        audio = (
            batch_df.filter(is_audio)
            if audio_index is not None else None
        )

        # decode gate (the curate_media stage 1, pinned once per batch);
        # the batch frame's id column is media_id here (renamed above)
        feats = extract_image_features(
            images.select("media_id", "content"), fake_decode=True
        ).select("media_id", "format", "width", "height", "sha256")
        keep = F.col("format") != "fake"
        if min_width is not None:
            keep = keep & (F.col("width") >= min_width)
        if min_height is not None:
            keep = keep & (F.col("height") >= min_height)
        kept_feats = feats.filter(keep).localCheckpoint(eager=True)
        cur = images.join(
            kept_feats.select("media_id"), "media_id", "left_semi"
        )
        counts["decodable"] = cur.count()

        if sha_index is not None:
            kept_ids = sha_index.dedup_batch(
                kept_feats.select("media_id", "sha256"), "media_id"
            ).select("media_id")
            cur = cur.join(kept_ids, "media_id", "left_semi")
            counts["dedup_sha256"] = cur.count()
        if image_index is not None:
            cur = image_index.dedup_batch(
                cur.localCheckpoint(eager=True)
            ).localCheckpoint(eager=True)
            counts["dedup_dhash"] = cur.count()

        if audio is not None:
            counts["audio_in"] = audio.count()
            afeats = extract_audio_features(
                audio.select("media_id", "content"), fake_decode=True
            ).select("media_id", "format")
            decodable = audio.join(
                afeats.filter(F.col("format") != "fake").select("media_id"),
                "media_id", "left_semi",
            )
            akept = audio_index.dedup_batch(
                decodable.localCheckpoint(eager=True)
            ).localCheckpoint(eager=True)
            counts["audio_kept"] = akept.count()
            cur = cur.unionByName(akept)

        if rename:
            cur = cur.withColumnRenamed("media_id", id_col)
        _exactly_once_batch_write(cur, output_path, checkpoint, batch_id)
        counts["kept"] = (
            counts.get("dedup_dhash", counts.get("dedup_sha256",
                       counts["decodable"]))
            + counts.get("audio_kept", 0)
        )
        with open(funnel_path, "a") as f:
            f.write(
                json.dumps(
                    {"batch_id": int(batch_id), "checkpoint": checkpoint,
                     **{k: int(v) for k, v in counts.items()}}
                )
                + "\n"
            )

    writer = stream.writeStream.foreachBatch(_curate_batch).option(
        "checkpointLocation", checkpoint
    )
    if processing_time is not None:
        writer = writer.trigger(processingTime=processing_time)
    elif available_now:
        writer = writer.trigger(availableNow=True)
    os.makedirs(os.path.dirname(funnel_path) or ".", exist_ok=True)
    return StreamingMediaCuration(
        query=writer.start(), image_index=image_index, sha_index=sha_index,
        audio_index=audio_index, funnel_path=funnel_path,
    )


@dataclass
class CurationResult:
    corpus: DataFrame
    heldout: DataFrame | None
    funnel: list[tuple[str, int]] = field(default_factory=list)
    manifest: dict | None = None
    data_card: dict | None = None


def curate(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    content_col: str | None = None,
    gates: dict[str, Column] | None = None,
    dedup: tuple[str, ...] = ("exact",),
    minhash_jaccard: tuple[int, int] = (2, 3),
    decontaminate_against: DataFrame | None = None,
    decontaminate_n: int = 13,
    dsir_target: DataFrame | None = None,
    dsir_n: int | None = None,
    dsir_dim: int = 8192,
    dsir_seed: str = "dsir",
    heldout_frac: float | None = None,
    export_path: str | None = None,
    export_budget: int | None = None,
    data_card_path: str | None = None,
    data_card_name: str | None = None,
    report: bool = True,
) -> CurationResult:
    """Compose the standard curation funnel over ``docs``:

    0. **binary intake** — when ``content_col`` is given, ``docs``
       carries raw crawl payloads (HTML bytes, PDFs, EPUB/DOCX/ODT/RTF)
       instead of text: they route through
       :func:`sources.docformats.route_document_texts` (HTML on the
       pure-codegen column path, binary document formats through the
       Arrow reader pass), extraction failures become counted
       ``extract_errors`` funnel rows, and survivors' text feeds the
       stages below as ``text_col``.
    1. **gates** — named keep-conditions applied as ONE audited filter
       (:func:`operators.audit.audited_filter`); their per-gate counts
       ride the next action's scan for free.
    2. **dedup** — any of ``"exact"`` (keep lowest id per normalized
       fingerprint) and ``"minhash"`` (LSH candidates → exact n-gram
       Jaccard ≥ ``minhash_jaccard`` → transitive connected-components
       removal), in the given order.
    3. **decontaminate** — drop documents sharing any
       ``decontaminate_n``-gram with ``decontaminate_against``
       (id + text columns named like ``docs``').
    4. **DSIR selection** — keep the ``dsir_n`` documents most like
       ``dsir_target`` by hashed-n-gram importance weight
       (:func:`operators.dsir.dsir_select`, Gumbel-top-k, deterministic
       under ``dsir_seed``).
    5. **split** — md5-bucket train/heldout at ``heldout_frac`` (heldout
       is returned, never exported).
    6. **export** — token-budget shards (``export_budget`` tokens per
       shard) + manifest, when ``export_path`` is given.
    7. **data card** — :func:`operators.profile.write_data_card` on the
       final corpus, when ``data_card_path`` is given.

    Stages are skipped when their argument is None/empty. ``report=True``
    adds one bounded ``count()`` per non-gate stage to the funnel;
    ``report=False`` leaves the pipeline fully lazy (the gate funnel is
    still recorded if any action runs).
    """
    for d in dedup:
        if d not in DEDUP_STAGES:
            raise ValueError(f"unknown dedup stage {d!r}; pick from {DEDUP_STAGES}")

    funnel: list[tuple[str, int]] = []
    cur = docs
    gate_obs = None
    if report:
        funnel.append(("input", cur.count()))

    if content_col is not None:
        from .sources.docformats import route_document_texts

        routed = route_document_texts(
            cur, id_col=id_col, content_col=content_col
        )
        if report:
            # one count on the error slice; the extracted count rides
            # the next stage's "input"-successor entry below
            funnel.append(
                ("extract_errors",
                 routed.filter(F.col("error").isNotNull()).count())
            )
        cur = routed.filter(F.col("error").isNull()).drop("error")
        if text_col != "text":
            cur = cur.withColumnRenamed("text", text_col)
        if report:
            funnel.append(("extracted", cur.count()))

    if gates:
        cur, gate_obs = audited_filter(cur, gates)
        if report:
            # one scan materializes ALL per-gate counts (the observe rides
            # it); Observation.get BLOCKS until the observed frame has seen
            # an action, so never read it before one has run
            cur.count()
            funnel.extend(
                (k, v)
                for k, v in funnel_report(gate_obs)
                if k != "input_rows"
            )

    for d in dedup:
        if d == "exact":
            keepers = (
                cur.select(
                    id_col, doc_fingerprint(F.col(text_col)).alias("__fp")
                )
                .groupBy("__fp")
                .agg(F.min(id_col).alias(id_col))
                .select(id_col)
            )
            cur = cur.join(keepers, id_col, "left_semi")
        elif d == "minhash":
            pairs = minhash_lsh_candidate_pairs(cur, id_col, text_col)
            sets = cur.select(
                id_col, shingles(F.col(text_col), 3).alias("__sh")
            )
            inter = F.size(F.array_intersect(F.col("__sa"), F.col("__sb")))
            union = F.size("__sa") + F.size("__sb") - inter
            num, den = minhash_jaccard
            verified = (
                pairs.join(
                    sets.select(
                        F.col(id_col).alias("id_a"), F.col("__sh").alias("__sa")
                    ),
                    "id_a",
                )
                .join(
                    sets.select(
                        F.col(id_col).alias("id_b"), F.col("__sh").alias("__sb")
                    ),
                    "id_b",
                )
                .filter(inter * den >= union * num)
                .select("id_a", "id_b")
            )
            cur = dedup_connected(cur, verified, id_col)
        if report:
            funnel.append((f"dedup_{d}", cur.count()))

    if decontaminate_against is not None:
        cur = decontaminate(
            cur, decontaminate_against, id_col, text_col, n=decontaminate_n
        )
        if report:
            funnel.append(("decontaminated", cur.count()))

    if dsir_target is not None:
        if dsir_n is None:
            raise ValueError("dsir_target requires dsir_n (documents to keep)")
        from .operators.dsir import dsir_select

        cur = dsir_select(
            cur, dsir_target, text_col, n=dsir_n, id_col=id_col,
            dim=dsir_dim, seed=dsir_seed,
        ).drop("dsir_log_w", "dsir_key")
        if report:
            funnel.append(("dsir_selected", cur.count()))

    heldout = None
    if heldout_frac is not None:
        cur, heldout = split_train_heldout(cur, id_col, heldout_frac)
        if report:
            funnel.append(("train_split", cur.count()))

    manifest = None
    if export_path is not None:
        if export_budget is None:
            raise ValueError("export_path requires export_budget (tokens/shard)")
        sized = cur.withColumn("__n_tokens", token_count(F.col(text_col)))
        manifest = write_budget_shards(
            sized, export_path, "__n_tokens", budget=export_budget,
            order_col=id_col,
        )
        if report:
            funnel.append(("exported", int(manifest["total_rows"])))

    card = None
    if data_card_path is not None:
        card = write_data_card(
            cur, data_card_path, text_col=text_col, name=data_card_name,
            extra={"funnel": funnel} if funnel else None,
        )

    # report=False but an export/card action DID run on the gated frame:
    # the observation captured that action's scan — surface it. (With no
    # action at all the metrics never exist and Observation.get would
    # block forever; leave the funnel empty for the fully-lazy run.)
    if gate_obs is not None and not report and (
        manifest is not None or card is not None
    ):
        funnel = [
            (k, v) for k, v in funnel_report(gate_obs) if k != "input_rows"
        ] + funnel

    return CurationResult(
        corpus=cur,
        heldout=heldout,
        funnel=funnel,
        manifest=manifest,
        data_card=card,
    )
