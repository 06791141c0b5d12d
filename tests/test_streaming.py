"""Structured Streaming unit tests: stateful before-image enrichment
(applyInPandasWithState), its batch/window dual, watermarked windowed
aggregation, and the sink's streaming read-back."""

import json
import os
import time

import pytest

from tests.conftest import await_finished, drain_memory_sink
from pyspark.sql import functions as F

from sample_dms_kinesis_rds_mariadb_spark.sources.changefeed import FEED_SCHEMA
from sample_dms_kinesis_rds_mariadb_spark.streaming.state import (
    enrich_before_images,
    enrich_before_images_batch,
)

CHANGES = [
    {"seq": 1, "schema": "db", "table": "t", "op": "insert", "txn_id": "a",
     "commit_ts": "2024-01-01T00:00:00", "data": {"id": "1", "v": "one"}},
    {"seq": 2, "schema": "db", "table": "t", "op": "update", "txn_id": "b",
     "commit_ts": "2024-01-01T00:00:01", "data": {"id": "1", "v": "two"}},
    {"seq": 3, "schema": "db", "table": "t", "op": "update", "txn_id": "c",
     "commit_ts": "2024-01-01T00:00:02", "data": {"id": "1", "v": "three"}},
    {"seq": 4, "schema": "db", "table": "t", "op": "delete", "txn_id": "d",
     "commit_ts": "2024-01-01T00:00:03", "data": {"id": "1", "v": "three"}},
    {"seq": 5, "schema": "db", "table": "t", "op": "insert", "txn_id": "e",
     "commit_ts": "2024-01-01T00:00:04", "data": {"id": "2", "v": "x"}},
]


def _write_feed(path: str, changes: list[dict]) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "changes-000000.json"), "w") as f:
        f.write("\n".join(json.dumps(c) for c in changes) + "\n")


def _assert_enrichment(rows):
    by_seq = {r["seq"]: r for r in rows}
    assert by_seq[2]["before"] == {"id": "1", "v": "one"}
    assert by_seq[3]["before"] == {"id": "1", "v": "two"}
    assert by_seq[4]["before"] == {"id": "1", "v": "three"}
    assert by_seq[1]["before"] is None
    assert by_seq[5]["before"] is None


def test_stateful_before_image_streaming(spark, tmp_path):
    """K4 via applyInPandasWithState: a feed WITHOUT before-images gets them
    attached from per-key state."""
    feed_path = str(tmp_path / "feed")
    _write_feed(feed_path, CHANGES)
    stream = spark.readStream.schema(FEED_SCHEMA).json(feed_path)
    enriched = enrich_before_images(
        stream, F.element_at(F.col("data"), "id")
    )
    q = (
        enriched.writeStream.format("memory")
        .queryName("enriched_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    # stateful + ProcessingTimeTimeout: availableNow never self-terminates
    # (the operator requires batches until state empties) — drain and stop
    drain_memory_sink(spark, q, "enriched_sink", 5)
    rows = [r.asDict(recursive=True) for r in spark.sql("SELECT * FROM enriched_sink").collect()]
    assert len(rows) == 5
    _assert_enrichment(rows)


def test_stateful_enrichment_across_arrow_chunks(spark, tmp_path):
    """ADVICE regression: one key's rows spanning MULTIPLE Arrow chunks must
    still replay in seq order (the enrich function concatenates chunks before
    sorting; per-chunk sorting spliced wrong before-images)."""
    n = 40
    changes = [
        {
            "seq": i + 1,
            "schema": "db",
            "table": "t",
            "op": "insert" if i == 0 else "update",
            "txn_id": f"t{i}",
            "commit_ts": f"2024-01-01T00:00:{i:02d}",
            "data": {"id": "1", "v": str(i)},
        }
        # reversed on disk: chunk-local sorting would "fix" each chunk but
        # replay the chunks themselves out of order
        for i in reversed(range(n))
    ]
    feed_path = str(tmp_path / "feed")
    _write_feed(feed_path, changes)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        stream = spark.readStream.schema(FEED_SCHEMA).json(feed_path)
        enriched = enrich_before_images(stream, F.element_at(F.col("data"), "id"))
        q = (
            enriched.writeStream.format("memory")
            .queryName("chunked_sink")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        drain_memory_sink(spark, q, "chunked_sink", n)
        rows = [
            r.asDict(recursive=True)
            for r in spark.sql("SELECT * FROM chunked_sink").collect()
        ]
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert len(rows) == n
    by_seq = {r["seq"]: r for r in rows}
    for i in range(1, n):  # update seq=i+1 sees the i-th image
        assert by_seq[i + 1]["before"] == {"id": "1", "v": str(i - 1)}, (
            f"seq {i + 1} got before {by_seq[i + 1]['before']}"
        )


def test_before_image_batch_dual(spark):
    """The batch window-lag formulation produces identical enrichment."""
    df = spark.createDataFrame(
        [
            (c["seq"], c["schema"], c["table"], c["op"], c["txn_id"],
             c["commit_ts"], c["data"], None, None)
            for c in CHANGES
        ],
        FEED_SCHEMA,
    )
    out = enrich_before_images_batch(df, F.element_at(F.col("data"), "id"))
    rows = [r.asDict(recursive=True) for r in out.collect()]
    _assert_enrichment(rows)


def test_watermarked_window_agg(spark, tmp_path):
    """Streaming tumbling-window count with a watermark (SURVEY §2.10 T2
    generalized: event-time windowing for late data)."""
    src = str(tmp_path / "events")
    os.makedirs(src, exist_ok=True)
    events = [
        {"event_id": 1, "ts": "2024-01-01T00:00:10", "event_type": "click"},
        {"event_id": 2, "ts": "2024-01-01T00:00:50", "event_type": "click"},
        {"event_id": 3, "ts": "2024-01-01T00:01:10", "event_type": "click"},
        {"event_id": 4, "ts": "2024-01-01T00:01:20", "event_type": "view"},
    ]
    with open(os.path.join(src, "e.json"), "w") as f:
        f.write("\n".join(json.dumps(e) for e in events))
    stream = (
        spark.readStream.schema("event_id LONG, ts STRING, event_type STRING")
        .json(src)
        .withColumn("event_time", F.to_timestamp("ts"))
        .withWatermark("event_time", "10 minutes")
        .groupBy(F.window("event_time", "1 minute"), F.col("event_type"))
        .agg(F.count("*").alias("n"))
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("win_sink")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    await_finished(q)
    rows = spark.sql(
        "SELECT window.start AS s, event_type, n FROM win_sink ORDER BY s, event_type"
    ).collect()
    got = [(str(r["s"]), r["event_type"], r["n"]) for r in rows]
    assert got == [
        ("2024-01-01 00:00:00", "click", 2),
        ("2024-01-01 00:01:00", "click", 1),
        ("2024-01-01 00:01:00", "view", 1),
    ]


def test_session_window_streaming(spark, tmp_path):
    """Streaming session windows (gap-based) — the streaming counterpart of
    the batch gaps-and-islands sessionization plan."""
    src = str(tmp_path / "sess")
    os.makedirs(src, exist_ok=True)
    events = [
        {"user_id": 1, "ts": "2024-01-01T00:00:00"},
        {"user_id": 1, "ts": "2024-01-01T00:10:00"},   # same session (gap 10m < 30m)
        {"user_id": 1, "ts": "2024-01-01T02:00:00"},   # new session
        {"user_id": 2, "ts": "2024-01-01T00:00:00"},
    ]
    with open(os.path.join(src, "e.json"), "w") as f:
        f.write("\n".join(json.dumps(e) for e in events))
    stream = (
        spark.readStream.schema("user_id LONG, ts STRING")
        .json(src)
        .withColumn("event_time", F.to_timestamp("ts"))
        .withWatermark("event_time", "1 hour")
        .groupBy(F.session_window("event_time", "30 minutes"), F.col("user_id"))
        .agg(F.count("*").alias("n"))
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("sess_sink")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
        .trigger(availableNow=True)
        .start()
    )
    await_finished(q)
    rows = spark.sql(
        "SELECT user_id, n FROM sess_sink ORDER BY user_id, session_window.start"
    ).collect()
    assert [(r["user_id"], r["n"]) for r in rows] == [(1, 2), (1, 1), (2, 1)]


def test_stream_store_read_stream(spark, tmp_path):
    """S5 streaming read-back: tail the sink as a stream and parse envelopes."""
    from sample_dms_kinesis_rds_mariadb_spark.envelope import (
        control_events,
        parse_json_records,
    )
    from sample_dms_kinesis_rds_mariadb_spark.sinks.stream_sink import StreamStore
    from sample_dms_kinesis_rds_mariadb_spark.spec import TaskSettings

    store = StreamStore(spark, str(tmp_path / "stream"), shards=1)
    env = control_events(
        spark, [("db", "t", "drop-table"), ("db", "t", "create-table")], TaskSettings()
    ).withColumn("_order", F.col("_order").cast("long"))
    store.append_envelopes(env)

    q = (
        parse_json_records(store.read_stream())
        .writeStream.format("memory")
        .queryName("tail_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .trigger(availableNow=True)
        .start()
    )
    await_finished(q)
    rows = spark.sql(
        "SELECT metadata.operation AS op, sequence_number FROM tail_sink ORDER BY sequence_number"
    ).collect()
    assert [r["op"] for r in rows] == ["drop-table", "create-table"]
    assert [r["sequence_number"] for r in rows] == [1, 2]


def _wire_batch(spark, pairs):
    """Build a minimal wire-format batch: (PartitionKey, payload) pairs."""
    rows = [(json.dumps({"data": {"v": v}, "metadata": {}}), pk) for pk, v in pairs]
    return spark.createDataFrame(rows, "Data STRING, PartitionKey STRING")


def test_shard_iterator_types(spark, tmp_path):
    """Kinesis iterator surface: TRIM_HORIZON, LATEST, AT/AFTER_SEQUENCE_NUMBER
    (reference run.py:175-179 uses TRIM_HORIZON; the rest generalize it)."""
    from sample_dms_kinesis_rds_mariadb_spark.sinks.stream_sink import StreamStore

    store = StreamStore(spark, str(tmp_path / "stream"), shards=1)
    store.append(_wire_batch(spark, [("k", "a"), ("k", "b")]))

    latest = store.get_shard_iterator(0, "LATEST")  # position: after batch 1
    store.append(_wire_batch(spark, [("k", "c"), ("k", "d")]))

    # TRIM_HORIZON sees everything, in sequence order
    horizon = store.get_shard_iterator(0, "TRIM_HORIZON")
    recs = horizon.get_records()
    assert [r["Data"]["data"]["v"] for r in recs] == ["a", "b", "c", "d"]
    assert [r["SequenceNumber"] for r in recs] == [1, 2, 3, 4]
    assert recs[0]["PartitionKey"] == "k"
    # exhausted cursor returns nothing new
    assert horizon.get_records() == []

    # LATEST sees only records appended after iterator creation
    assert [r["Data"]["data"]["v"] for r in latest.get_records()] == ["c", "d"]

    # AT_SEQUENCE_NUMBER is inclusive, AFTER_ exclusive
    at = store.get_shard_iterator(0, "AT_SEQUENCE_NUMBER", starting_sequence_number=3)
    assert [r["SequenceNumber"] for r in at.get_records()] == [3, 4]
    after = store.get_shard_iterator(
        0, "AFTER_SEQUENCE_NUMBER", starting_sequence_number=3
    )
    assert [r["SequenceNumber"] for r in after.get_records()] == [4]

    # paged consumption advances the cursor (GetRecords limit)
    paged = store.get_shard_iterator(0, "TRIM_HORIZON")
    assert [r["SequenceNumber"] for r in paged.get_records(limit=3)] == [1, 2, 3]
    assert [r["SequenceNumber"] for r in paged.get_records(limit=3)] == [4]

    with pytest.raises(ValueError):
        store.get_shard_iterator(0, "AT_SEQUENCE_NUMBER")
    with pytest.raises(ValueError):
        store.get_shard_iterator(5, "LATEST")
    with pytest.raises(ValueError):
        store.get_shard_iterator(0, "BOGUS")


def test_sequence_offsets_recover_across_processes(spark, tmp_path):
    """A fresh StreamStore over an existing record log continues the per-shard
    sequence instead of reissuing from 0 (cross-process restart)."""
    from sample_dms_kinesis_rds_mariadb_spark.sinks.stream_sink import StreamStore

    path = str(tmp_path / "stream")
    first = StreamStore(spark, path, shards=2)
    first.append(_wire_batch(spark, [("k1", "a"), ("k2", "b"), ("k1", "c")]))

    # simulate restart: new store object, same path
    second = StreamStore(spark, path, shards=2)
    second.append(_wire_batch(spark, [("k1", "d"), ("k2", "e")]))

    rows = second.read().collect()
    seqs = {}
    for r in rows:
        seqs.setdefault(r["shard_id"], []).append(r["sequence_number"])
    # per shard: strictly increasing, no duplicates
    for shard, ss in seqs.items():
        assert ss == sorted(ss), f"shard {shard} out of order: {ss}"
        assert len(ss) == len(set(ss)), f"shard {shard} duplicated seqs: {ss}"
    assert sum(len(s) for s in seqs.values()) == 5


def test_stream_compaction_preserves_content_and_sequence(spark, tmp_path):
    """compact() coalesces the record log without changing what any reader
    sees, and appends afterwards continue the per-shard sequence."""
    import os

    from sample_dms_kinesis_rds_mariadb_spark.sinks.stream_sink import StreamStore

    path = str(tmp_path / "stream")
    store = StreamStore(spark, path, shards=4)
    for batch in range(5):
        store.append(
            _wire_batch(spark, [(f"k{i}", f"b{batch}v{i}") for i in range(8)])
        )
    records_dir = os.path.join(path, "records")
    n_before = len([f for f in os.listdir(records_dir) if f.endswith(".parquet")])
    before = [
        (r["shard_id"], r["sequence_number"], r["Data"])
        for r in store.read().collect()
    ]
    assert len(before) == 40

    removed = store.compact(min_files=2)
    assert removed > 0
    n_after = len([f for f in os.listdir(records_dir) if f.endswith(".parquet")])
    assert n_after < n_before and n_after <= 4  # ≤ one file per shard

    after = [
        (r["shard_id"], r["sequence_number"], r["Data"])
        for r in store.read().collect()
    ]
    assert after == before

    # appends continue the sequence over the compacted log
    store.append(_wire_batch(spark, [(f"k{i}", "post") for i in range(8)]))
    rows = store.read().collect()
    assert len(rows) == 48
    per_shard = {}
    for r in rows:
        per_shard.setdefault(r["shard_id"], []).append(r["sequence_number"])
    for ss in per_shard.values():
        assert ss == list(range(1, len(ss) + 1))  # dense, ordered, no dupes

    # below the threshold it's a no-op
    assert store.compact(min_files=1000) == 0


def test_auto_compaction_bounds_file_count(spark, tmp_path):
    """A long-lived task loop appends forever; with auto_compact_files
    opted in, the record log's file count must stay bounded instead of
    growing O(appends), and no reader-visible state may change."""
    import os

    from sample_dms_kinesis_rds_mariadb_spark.sinks.stream_sink import StreamStore

    path = str(tmp_path / "stream")
    store = StreamStore(spark, path, shards=2, auto_compact_files=6)
    records_dir = os.path.join(path, "records")
    max_files = 0
    for batch in range(12):
        store.append(
            _wire_batch(spark, [(f"k{i}", f"b{batch}v{i}") for i in range(4)])
        )
        max_files = max(
            max_files,
            len([f for f in os.listdir(records_dir) if f.endswith(".parquet")]),
        )
    # each append adds <= shards files; compaction folds back to <= shards
    assert max_files <= 6 + 2
    rows = store.read().collect()
    assert len(rows) == 48
    per_shard = {}
    for r in rows:
        per_shard.setdefault(r["shard_id"], []).append(r["sequence_number"])
    for ss in per_shard.values():
        assert ss == list(range(1, len(ss) + 1))  # dense, ordered, no dupes


def test_concurrent_appends_keep_sequences_dense(spark, tmp_path):
    """Two writers appending concurrently (T6: concurrent tasks share one
    stream) must interleave without losing or duplicating sequence numbers."""
    import threading

    from sample_dms_kinesis_rds_mariadb_spark.sinks.stream_sink import StreamStore

    store = StreamStore(spark, str(tmp_path / "stream"), shards=2)
    batches = [
        _wire_batch(spark, [(f"k{i}", f"w{w}b{b}") for i in range(6)])
        for w in range(2)
        for b in range(3)
    ]
    for df in batches:
        df.cache().count()  # materialize before the threads race

    errs = []

    def writer(dfs):
        try:
            for df in dfs:
                store.append(df)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    t1 = threading.Thread(target=writer, args=(batches[:3],))
    t2 = threading.Thread(target=writer, args=(batches[3:],))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs

    rows = store.read().collect()
    assert len(rows) == 36
    per_shard = {}
    for r in rows:
        per_shard.setdefault(r["shard_id"], []).append(r["sequence_number"])
    for ss in per_shard.values():
        assert sorted(ss) == list(range(1, len(ss) + 1))
    for df in batches:
        df.unpersist()


def test_shard_iterator_at_timestamp(spark, tmp_path):
    """AT_TIMESTAMP starts at an arrival-ts floor, then pages by sequence."""
    import time as _time

    from sample_dms_kinesis_rds_mariadb_spark.sinks.stream_sink import StreamStore

    store = StreamStore(spark, str(tmp_path / "stream"), shards=1)
    store.append(_wire_batch(spark, [("k", "old1"), ("k", "old2")]))
    _time.sleep(0.05)
    ts = _time.time()
    _time.sleep(0.05)
    store.append(_wire_batch(spark, [("k", "new1"), ("k", "new2"), ("k", "new3")]))

    it = store.get_shard_iterator(0, "AT_TIMESTAMP", timestamp=ts)
    first = it.get_records(limit=2)
    assert [r["Data"]["data"]["v"] for r in first] == ["new1", "new2"]
    # after the first page the cursor is sequence-driven: the ts floor is
    # dropped but nothing re-delivers and nothing is skipped
    rest = it.get_records()
    assert [r["Data"]["data"]["v"] for r in rest] == ["new3"]
    assert it.get_records() == []

    with pytest.raises(ValueError):
        store.get_shard_iterator(0, "AT_TIMESTAMP")  # timestamp required


def test_streaming_session_window_with_watermark(spark, tmp_path):
    """Session windows on a STREAM (SURVEY §2.10; the batch dual is the
    `session_windows` catalog query): gap-based sessions merge incrementally
    under a watermark — Spark's MergingSessions operator, not a batch-only
    trick. Two users, one with a 2-event session and a later singleton."""
    src = str(tmp_path / "sess_events")
    os.makedirs(src, exist_ok=True)
    events = [
        {"user_id": 1, "ts": "2024-01-01T00:00:00"},
        {"user_id": 1, "ts": "2024-01-01T00:10:00"},  # same session (gap < 30m)
        {"user_id": 1, "ts": "2024-01-01T01:30:00"},  # new session
        {"user_id": 2, "ts": "2024-01-01T00:05:00"},
    ]
    with open(os.path.join(src, "e.json"), "w") as f:
        f.write("\n".join(json.dumps(e) for e in events))
    stream = (
        spark.readStream.schema("user_id LONG, ts STRING")
        .json(src)
        .withColumn("event_time", F.to_timestamp("ts"))
        .withWatermark("event_time", "1 hour")
        .groupBy("user_id", F.session_window("event_time", "30 minutes"))
        .agg(F.count("*").alias("n"))
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("sess_sink")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
        .trigger(availableNow=True)
        .start()
    )
    await_finished(q)
    rows = spark.sql(
        "SELECT user_id, session_window.start AS s, n FROM sess_sink ORDER BY user_id, s"
    ).collect()
    got = [(r["user_id"], str(r["s"]), r["n"]) for r in rows]
    assert got == [
        (1, "2024-01-01 00:00:00", 2),
        (1, "2024-01-01 01:30:00", 1),
        (2, "2024-01-01 00:05:00", 1),
    ]


def test_streaming_asof_enrichment_matches_batch(spark, tmp_path):
    """foreachBatch as-of stage: each micro-batch enriched against
    TableMaterializer state must be row-equal to the batch asof_join over
    the same probe rows and the same snapshot (the streaming dual of the
    SCD2 batch time travel)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from sample_dms_kinesis_rds_mariadb_spark.operators.joins import asof_join
    from sample_dms_kinesis_rds_mariadb_spark.streaming.apply import (
        TableMaterializer,
    )
    from sample_dms_kinesis_rds_mariadb_spark.streaming.enrichment import (
        asof_enrich_stage,
    )
    from sample_dms_kinesis_rds_mariadb_spark.streaming.schema_evolution import (
        TableRegistry,
    )

    # build side: replicated price history in the materializer
    registry = TableRegistry()
    prices = spark.createDataFrame(
        [
            (pid, k, dt.datetime(2024, 1, 1, 0, m), float(k * 100 + m))
            for pid, (k, m) in enumerate(
                (k, m) for k in (1, 2) for m in (0, 5, 10)
            )
        ],
        "price_id LONG, k LONG, effective_ts TIMESTAMP, px DOUBLE",
    ).cache()
    prices.count()
    registry.register_from_df("db", "prices", prices, primary_key="price_id")
    mat = TableMaterializer(spark, registry, str(tmp_path / "state"), n_buckets=4)
    mat.overwrite("db", "prices", prices)

    # probe side: an event feed arriving in 3 micro-batches
    feed_path = str(tmp_path / "events")
    os.makedirs(feed_path)
    all_events = []
    for fno in range(3):
        batch = [
            {"pid": fno * 10 + i, "k": 1 + (i % 3), "ts": f"2024-01-01T00:{2 + 3 * i:02d}:30"}
            for i in range(4)  # k in {1,2,3}: 3 has no build rows -> NULL asof
        ]
        all_events.extend(batch)
        with open(os.path.join(feed_path, f"events-{fno}.json"), "w") as f:
            f.write("\n".join(json.dumps(e) for e in batch) + "\n")

    out_path = str(tmp_path / "enriched")
    stage = asof_enrich_stage(
        lambda: mat.table("db", "prices").drop("price_id"),
        lambda df, _id: df.write.mode("append").parquet(out_path),
        on="k",
        ts="ts",
        build_ts="effective_ts",
    )
    stream = spark.readStream.schema("pid LONG, k LONG, ts TIMESTAMP").option(
        "maxFilesPerTrigger", "1"
    ).json(feed_path)
    q = (
        stream.writeStream.foreachBatch(stage)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    await_finished(q)

    got = sorted(
        (
            r.asDict(recursive=True)
            for r in spark.read.parquet(out_path).collect()
        ),
        key=lambda r: r["pid"],
    )
    probe = spark.createDataFrame(
        [(e["pid"], e["k"], dt.datetime.fromisoformat(e["ts"])) for e in all_events],
        "pid LONG, k LONG, ts TIMESTAMP",
    )
    want = sorted(
        (
            r.asDict(recursive=True)
            for r in asof_join(
                probe,
                prices.drop("price_id"),
                on="k",
                ts="ts",
                build_ts="effective_ts",
            ).collect()
        ),
        key=lambda r: r["pid"],
    )
    assert len(got) == 12
    assert got == want
    # sanity: enrichment actually attached state (k=1 at 00:08:30 -> px of
    # the 00:05 row), and keys without build rows got NULL
    by_pid = {r["pid"]: r for r in got}
    assert by_pid[2]["asof"] is None  # k=3: no price history


def test_auto_compact_threshold_needs_headroom_over_shards(spark, tmp_path):
    """compact() leaves up to one file per shard and each append adds up to
    one more per shard, so any threshold <= 2*shards would re-trigger a
    full-log rewrite after (almost) every append — reject at construction.
    The boundary matters: the earlier `> shards` bound still thrashed at
    auto_compact_files == shards+1..2*shards."""
    import pytest as _pytest

    from sample_dms_kinesis_rds_mariadb_spark.sinks.stream_sink import StreamStore

    with _pytest.raises(ValueError, match="auto_compact_files"):
        StreamStore(spark, str(tmp_path / "a"), shards=4, auto_compact_files=4)
    with _pytest.raises(ValueError, match="auto_compact_files"):
        # the band the 2*shards bound newly rejects
        StreamStore(spark, str(tmp_path / "b"), shards=4, auto_compact_files=8)
    StreamStore(spark, str(tmp_path / "c"), shards=4, auto_compact_files=9)


def test_stateful_before_image_ttl_evicts_idle_keys(spark, tmp_path):
    """State TTL: an idle key's image is EVICTED on timeout (the
    hasTimedOut path must remove, not refresh — falling through to the
    normal path would re-arm the timeout and the state would live
    forever). After eviction, an update for the key gets a NULL
    before-image, like the reference past its retention horizon."""
    import time as _time

    def ch(seq, op, key, val):
        return {
            "seq": seq, "schema": "db", "table": "t", "op": op,
            "txn_id": f"t{seq}", "commit_ts": f"2024-01-01T00:00:{seq:02d}",
            "data": {"id": key, "v": val},
        }

    feed_path = str(tmp_path / "feed")
    _write_feed(feed_path, [ch(1, "insert", "1", "one")])
    stream = spark.readStream.schema(FEED_SCHEMA).json(feed_path)
    enriched = enrich_before_images(
        stream, F.element_at(F.col("data"), "id"), ttl_ms=500
    )
    q = (
        enriched.writeStream.format("memory")
        .queryName("ttl_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        def wait_rows(n):
            for _ in range(120):
                if spark.sql("SELECT * FROM ttl_sink").count() >= n:
                    return
                _time.sleep(0.5)
            raise AssertionError(f"sink never reached {n} rows")

        wait_rows(1)               # batch 1: key 1 insert -> state stored
        _time.sleep(1.5)           # let the 500 ms TTL elapse
        # batch 2 carries only key 2 -> key 1 gets the timeout invocation
        with open(os.path.join(feed_path, "changes-000001.json"), "w") as f:
            f.write(json.dumps(ch(2, "insert", "2", "two")) + "\n")
        wait_rows(2)
        _time.sleep(0.5)
        # batch 3: update for key 1 AFTER eviction -> NULL before-image
        with open(os.path.join(feed_path, "changes-000002.json"), "w") as f:
            f.write(json.dumps(ch(3, "update", "1", "three")) + "\n")
        wait_rows(3)
        rows = {
            r["seq"]: r.asDict(recursive=True)
            for r in spark.sql("SELECT * FROM ttl_sink").collect()
        }
        assert rows[3]["before"] is None  # state was evicted, not refreshed
        # (within-TTL splicing is covered by the other streaming tests,
        # which run at the default 24 h TTL — at a 500 ms TTL every idle
        # key legitimately evicts between micro-batches)
    finally:
        q.stop()


def _write_json_batches(path, batches):
    os.makedirs(path)
    for i, batch in enumerate(batches):
        p = os.path.join(path, f"b{i}.json")
        with open(p, "w") as f:
            f.write("\n".join(json.dumps(e) for e in batch) + "\n")
        # FileStreamSource orders files by MODIFICATION TIME; same-second
        # writes tie and can replay a LATE file first, advancing the
        # watermark past the early rows (which then drop as late data) —
        # pin strictly increasing mtimes so batch order is the list order
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))


def test_stream_interval_join_inner_matches_batch(spark, tmp_path):
    """Watermarked stream-stream interval join: the inner join over two live
    feeds must equal the batch interval join over the same data, and the
    plan must carry watermarks on both sides (the state-bound contract)."""
    from sample_dms_kinesis_rds_mariadb_spark.streaming.enrichment import (
        stream_interval_join,
    )

    t0 = "2024-01-01T00:"
    clicks = [
        [{"k": 1, "click_id": 10, "click_ts": f"{t0}00:00"},
         {"k": 2, "click_id": 11, "click_ts": f"{t0}00:30"}],
        [{"k": 1, "click_id": 12, "click_ts": f"{t0}05:00"},
         {"k": 3, "click_id": 13, "click_ts": f"{t0}06:00"}],
        [{"k": 1, "click_id": 14, "click_ts": f"{t0}40:00"}],
    ]
    purchases = [
        [{"k": 1, "purchase_id": 20, "purchase_ts": f"{t0}04:00", "amount": 5.0}],
        [{"k": 2, "purchase_id": 21, "purchase_ts": f"{t0}20:00", "amount": 7.0},
         {"k": 1, "purchase_id": 22, "purchase_ts": f"{t0}09:00", "amount": 9.0}],
        [{"k": 9, "purchase_id": 23, "purchase_ts": f"{t0}41:00", "amount": 1.0}],
    ]
    lpath, rpath = str(tmp_path / "clicks"), str(tmp_path / "purchases")
    _write_json_batches(lpath, clicks)
    _write_json_batches(rpath, purchases)
    lschema = "k LONG, click_id LONG, click_ts TIMESTAMP"
    rschema = "k LONG, purchase_id LONG, purchase_ts TIMESTAMP, amount DOUBLE"
    ls = spark.readStream.schema(lschema).option("maxFilesPerTrigger", "1").json(lpath)
    rs = spark.readStream.schema(rschema).option("maxFilesPerTrigger", "1").json(rpath)
    joined = stream_interval_join(
        ls, rs, "k",
        left_ts="click_ts", right_ts="purchase_ts",
        lower_seconds=0, upper_seconds=600, watermark_seconds=30,
    )
    out = str(tmp_path / "attributed")
    q = (
        joined.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    # awaitTermination returns False on timeout WITHOUT raising — assert it,
    # or a slow box reads a half-written sink and fails on row content
    finished = q.awaitTermination(300)
    if not finished:
        q.stop()
    assert finished, "availableNow stream did not finish within 300s"

    got = sorted(
        (r["click_id"], r["purchase_id"])
        for r in spark.read.parquet(out).collect()
    )
    lb = spark.read.schema(lschema).json(lpath)
    rb = spark.read.schema(rschema).json(rpath)
    want = sorted(
        (r["click_id"], r["purchase_id"])
        for r in lb.join(
            rb,
            (lb["k"] == rb["k"])
            & (rb["purchase_ts"] >= lb["click_ts"])
            & (rb["purchase_ts"] <= lb["click_ts"] + F.expr("INTERVAL 600 SECONDS")),
            "inner",
        ).collect()
    )
    # sanity on the fixture: multiple matches, a same-key miss outside the
    # window (click 14 vs purchase 22), and unmatched keys on both sides
    assert ((10, 20) in want and (12, 22) in want and len(want) >= 2)
    assert got == want


def test_stream_interval_join_validation(spark, tmp_path):
    from sample_dms_kinesis_rds_mariadb_spark.streaming.enrichment import (
        stream_interval_join,
    )

    df = spark.createDataFrame([], "k LONG, ts TIMESTAMP, v LONG")
    other = spark.createDataFrame([], "k LONG, ts2 TIMESTAMP, w LONG")
    with pytest.raises(ValueError, match="how"):
        stream_interval_join(df, other, "k", left_ts="ts", right_ts="ts2", how="full")
    with pytest.raises(ValueError, match="upper_seconds"):
        stream_interval_join(
            df, other, "k", left_ts="ts", right_ts="ts2",
            lower_seconds=10, upper_seconds=5,
        )
    collide = spark.createDataFrame([], "k LONG, ts2 TIMESTAMP, v LONG")
    with pytest.raises(ValueError, match="collision"):
        stream_interval_join(df, collide, "k", left_ts="ts", right_ts="ts2")


def test_enrichment_passes_ddl_events_through(spark, tmp_path):
    """Control records must survive the before-image enrichment UNTOUCHED:
    the stateful operator's fixed Arrow schema has no ddl column, so an
    alter-table routed through it used to come out with ddl=NULL —
    destroying the payload any downstream schema-evolution stage needs."""
    changes = [
        {
            "seq": 1,
            "schema": "db",
            "table": "t",
            "op": "insert",
            "txn_id": "t1",
            "commit_ts": "2024-01-01T00:00:01",
            "data": {"id": "1", "v": "a"},
        },
        {
            "seq": 2,
            "schema": "db",
            "table": "t",
            "op": "alter-table",
            "commit_ts": "2024-01-01T00:00:02",
            "ddl": {
                "action": "add-column",
                "column": "extra",
                "type": "varchar(10)",
                "default": "x",
            },
        },
        {
            "seq": 3,
            "schema": "db",
            "table": "t",
            "op": "update",
            "txn_id": "t3",
            "commit_ts": "2024-01-01T00:00:03",
            "data": {"id": "1", "v": "b"},
        },
    ]
    feed_path = str(tmp_path / "feed")
    _write_feed(feed_path, changes)
    stream = spark.readStream.schema(FEED_SCHEMA).json(feed_path)
    enriched = enrich_before_images(stream, F.element_at(F.col("data"), "id"))
    q = (
        enriched.writeStream.format("memory")
        .queryName("ddl_passthrough_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    drain_memory_sink(spark, q, "ddl_passthrough_sink", 3)
    rows = {
        r["seq"]: r.asDict(recursive=True)
        for r in spark.sql("SELECT * FROM ddl_passthrough_sink").collect()
    }
    assert len(rows) == 3
    ddl = rows[2]["ddl"]
    assert ddl == {
        "action": "add-column",
        "column": "extra",
        "type": "varchar(10)",
        "default": "x",
    }
    # and the data ops still enriched normally around it
    assert rows[3]["before"] == {"id": "1", "v": "a"}


def test_changefeed_explicit_seq_advances_counter(spark, tmp_path):
    """Caller-supplied seq values must pull the auto counter forward: a
    later auto-assigned seq BELOW an explicit one would let the stale
    explicit event outrank newer changes in last-writer-per-key applies."""
    from sample_dms_kinesis_rds_mariadb_spark.sources.changefeed import ChangeFeed

    feed = ChangeFeed(spark, str(tmp_path / "feed"))
    feed.append_changes(
        [{"schema": "db", "table": "t", "op": "insert", "seq": 100,
          "commit_ts": "2024-01-01T00:00:00", "data": {"id": "1"}}]
    )
    feed.append_changes(
        [{"schema": "db", "table": "t", "op": "update",
          "commit_ts": "2024-01-01T00:00:01", "data": {"id": "1"}}]
    )
    seqs = sorted(r["seq"] for r in feed.read_batch().collect())
    assert seqs == [100, 101]


def test_sequence_floor_survives_full_retention_trim(spark, tmp_path):
    """All record files trimmed away + cross-process reopen: new appends
    must CONTINUE the per-shard sequence (duplicate sequence numbers would
    break AFTER_SEQUENCE_NUMBER checkpoints and Kinesis semantics)."""
    from datetime import datetime, timedelta, timezone

    from sample_dms_kinesis_rds_mariadb_spark.sinks.stream_sink import StreamStore

    path = str(tmp_path / "store")
    s1 = StreamStore(spark, path, shards=1, retention_hours=1)
    df = spark.createDataFrame(
        [(f"d{i}", "k") for i in range(5)], "Data STRING, PartitionKey STRING"
    )
    s1.append(df)
    max_before = max(
        r["sequence_number"] for r in s1.read().collect()
    )
    # trim EVERYTHING (pretend far future)
    removed = s1.trim_expired(now=datetime.now(timezone.utc) + timedelta(days=10))
    assert removed >= 1
    # cross-process restart over the fully trimmed store
    s2 = StreamStore(spark, path, shards=1, retention_hours=1)
    s2.append(df)
    seqs = sorted(r["sequence_number"] for r in s2.read().collect())
    assert seqs[0] == max_before + 1  # continued, not reissued from 1
    assert len(seqs) == 5


def test_stateful_before_image_transform_with_state(spark, tmp_path):
    """K4 on the Spark-4 transformWithState API: same enrichment as the
    applyInPandasWithState path (the declared-TTL successor — state
    eviction moves into the state store, no manual timeout re-arming)."""
    # transformWithState's Python runner protocol needs the protobuf
    # package — absent in this container (environment boundary, like the
    # live-network CDC connectors); the operator's enrichment loop is the
    # applyInPandasWithState twin's, which runs fully above.
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithStateInPandas requires python protobuf",
    )
    from sample_dms_kinesis_rds_mariadb_spark.streaming.state import (
        enrich_before_images_tws,
    )

    feed_path = str(tmp_path / "feed")
    _write_feed(feed_path, CHANGES)
    stream = spark.readStream.schema(FEED_SCHEMA).json(feed_path)
    enriched = enrich_before_images_tws(
        stream, F.element_at(F.col("data"), "id")
    )
    q = (
        enriched.writeStream.format("memory")
        .queryName("tws_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    drain_memory_sink(spark, q, "tws_sink", 5)
    rows = [
        r.asDict(recursive=True)
        for r in spark.sql("SELECT * FROM tws_sink").collect()
    ]
    assert len(rows) == 5
    _assert_enrichment(rows)
