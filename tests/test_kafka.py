"""Kafka wire protocol (sinks/kafka.py) against an INDEPENDENT fake
broker (tests/fake_kafka_broker.py — the server half written from the
same public spec with its OWN record-batch codec): published CRC-32C
check vectors, varint round-trips, cross-implementation batch codec
parity, produce/fetch/list-offsets e2e over real sockets, and the
reference's 5/4/3 CDC contract delivered through the Kafka path."""

from __future__ import annotations

import json
import time

import pytest

from sample_dms_kinesis_rds_mariadb_spark.sinks import kafka as kf
from tests.fake_kafka_broker import (
    FakeKafkaBroker,
    _decode_batch,
    _encode_batch,
)


def test_crc32c_published_check_vectors():
    """The iSCSI/RFC-3720 CRC-32C check values — plain CRC-32 would pass
    a self-round-trip and fail every real broker."""
    assert kf.crc32c(b"123456789") == 0xE3069283
    assert kf.crc32c(b"") == 0
    assert kf.crc32c(b"\x00" * 32) == 0x8A9136AA
    assert kf.crc32c(b"\xff" * 32) == 0x62A8AB43


def test_varint_zigzag_round_trip():
    for v in (0, 1, -1, 63, -64, 64, 300, -300, 2**31 - 1, -(2**31),
              2**40, -(2**40)):
        enc = kf.write_varint(v)
        got, pos = kf.read_varint(enc, 0)
        assert (got, pos) == (v, len(enc)), v
    # zigzag property: small magnitudes encode in one byte
    assert len(kf.write_varint(-1)) == 1
    assert len(kf.write_varint(63)) == 1
    assert len(kf.write_varint(64)) == 2


def test_record_batch_codec_cross_implementation():
    rows = [
        (b"k1", b"v1"),
        (None, b"value-without-key"),
        (b"k3", None),
        ("unicode-é".encode(), json.dumps({"a": 1}).encode()),
    ]
    # client encode -> broker decode
    batch = kf.encode_record_batch(rows, base_offset=7)
    assert _decode_batch(batch) == rows
    # broker encode -> client decode (offsets assigned from base)
    blob = _encode_batch(rows, base_offset=42)
    got = kf.decode_record_batches(blob)
    assert [(k, v) for _o, k, v in got] == rows
    assert [o for o, _k, _v in got] == [42, 43, 44, 45]
    # tamper: both decoders refuse on CRC
    bad = bytearray(batch)
    bad[-1] ^= 0x01
    with pytest.raises(ValueError, match="CRC"):
        kf.decode_record_batches(bytes(bad))
    with pytest.raises(ValueError, match="CRC"):
        _decode_batch(bytes(bad))


def test_produce_fetch_e2e_over_sockets():
    broker = FakeKafkaBroker()
    try:
        with kf.KafkaClient("127.0.0.1", broker.port) as c:
            vers = c.api_versions()
            assert vers[0][1] >= 3 and vers[1][1] >= 4
            assert c.metadata(["events"]) == {"events": [0]}
            base1 = c.produce("events", 0, [(b"a", b"1"), (b"b", b"2")])
            base2 = c.produce("events", 0, [(None, b"3")])
            assert (base1, base2) == (0, 2)
            assert c.list_offsets("events", 0) == 3
            assert c.list_offsets("events", 0, ts=-2) == 0
            rows = c.fetch("events", 0, 0)
            assert [(o, k, v) for o, k, v in rows] == [
                (0, b"a", b"1"), (1, b"b", b"2"), (2, None, b"3"),
            ]
            # mid-offset fetch returns only the tail
            assert [o for o, _k, _v in c.fetch("events", 0, 2)] == [2]
            # empty fetch past the end
            assert c.fetch("events", 0, 3) == []
    finally:
        broker.close()


def test_cdc_contract_through_kafka(spark, tmp_path):
    """The reference's 5/4/3 CDC contract (create/insert/alter phases,
    run.py:296-314) delivered THROUGH the Kafka path: engine envelopes
    produced to the fake broker per phase, fetched back from offset 0,
    byte-equal JSON and key = partition key."""
    from sample_dms_kinesis_rds_mariadb_spark.engine import ReplicationEngine
    from sample_dms_kinesis_rds_mariadb_spark.fixtures import (
        DB_NAME,
        TABLES,
        reference_pipeline,
    )
    from tests.test_cdc import (
        ACCOUNT_INSERT,
        ALTERS,
        AUTHOR_INSERT,
        CREATES,
        NOVEL_INSERTS,
    )

    spec = reference_pipeline(str(tmp_path / "feed"))
    eng = ReplicationEngine(spark, spec, str(tmp_path / "work"))
    for table, (schema, _, pk, defaults) in TABLES.items():
        eng.register_table(
            "mariadb-source", DB_NAME, table,
            spark.createDataFrame([], schema), pk, defaults,
        )
    broker = FakeKafkaBroker()
    try:
        feed = eng.changefeed("mariadb-source")
        ts0 = time.time() - 1
        feed.append_changes(CREATES)
        # two concurrent tasks, one stream — exactly the reference setup
        # behind the 5-event create phase (2 bootstrap + 3 CREATE)
        eng.start_task("cdc-task-1")
        eng.start_task("cdc-task-2")
        eng.wait_for_task_status("cdc-task-1", "running")
        eng.wait_for_task_status("cdc-task-2", "running")
        with kf.KafkaClient("127.0.0.1", broker.port) as c:
            phase_a = eng.consume(after_ts=ts0, expected_count=5, retries=120)
            kf.produce_events(c, "dms-events", phase_a)

            time.sleep(0.3)
            ts1 = time.time()
            feed.append_changes([AUTHOR_INSERT, ACCOUNT_INSERT, *NOVEL_INSERTS])
            phase_b = eng.consume(after_ts=ts1, expected_count=4, retries=120)
            kf.produce_events(c, "dms-events", phase_b)

            time.sleep(0.3)
            ts2 = time.time()
            feed.append_changes(ALTERS)
            phase_c = eng.consume(after_ts=ts2, expected_count=3, retries=120)
            kf.produce_events(c, "dms-events", phase_c)

            got = kf.consume_events(c, "dms-events", 0)
            assert c.list_offsets("dms-events", 0) == 12
        want = phase_a + phase_b + phase_c
        assert len(got) == 12  # 5 + 4 + 3
        ops = [e["metadata"]["operation"] for e in got]
        assert ops[:5] == ["create-table"] * 5  # 2 bootstrap + 3 CREATE
        assert ops[5:9] == ["insert"] * 4
        assert ops[9:] == ["alter-table"] * 3
        # byte-faithful delivery: every envelope survives the wire intact
        for g, w in zip(got, want):
            assert g == json.loads(json.dumps(w, sort_keys=True))
        # ordered-delivery contract: message key == the envelope's
        # partition key (same key -> same partition -> ordered)
        raw = broker.logs[("dms-events", 0)]
        for (key, _val), w in zip(raw, want):
            pk = (w.get("partition_key") or "").encode() or None
            assert key == pk
    finally:
        broker.close()
        for t in ("cdc-task-1", "cdc-task-2"):
            try:
                eng.stop_task(t)
            except Exception:
                pass


def test_kafka_relay_incremental_no_redelivery(spark, tmp_path):
    """StreamStore -> Kafka relay: pump delivers the unread suffix only,
    the sequence high-water survives a relay RESTART (state file), and
    per-key ordering carries into the topic."""
    from sample_dms_kinesis_rds_mariadb_spark.sinks.stream_sink import (
        StreamStore,
    )

    store = StreamStore(spark, str(tmp_path / "stream"))

    def _events(lo, hi):
        return [
            {
                "data": {"id": str(i)},
                "before-image": None,
                "metadata": {"operation": "insert", "table-name": "t"},
                "partition_key": f"k{i % 3}",
            }
            for i in range(lo, hi)
        ]

    df1 = spark.createDataFrame(
        [(json.dumps(e, sort_keys=True), e["partition_key"]) for e in _events(0, 7)],
        "Data STRING, PartitionKey STRING",
    )
    store.append(df1)

    broker = FakeKafkaBroker()
    try:
        state = str(tmp_path / "relay.state")
        with kf.KafkaClient("127.0.0.1", broker.port) as c:
            relay = kf.KafkaRelay(store, c, "dms-relay", state_path=state)
            assert relay.pump() == 7
            assert relay.pump() == 0  # caught up: nothing re-delivers

            # more records arrive; only the suffix ships
            df2 = spark.createDataFrame(
                [
                    (json.dumps(e, sort_keys=True), e["partition_key"])
                    for e in _events(7, 10)
                ],
                "Data STRING, PartitionKey STRING",
            )
            store.append(df2)
            assert relay.pump() == 3

        # restart: a NEW relay over the same state file sees nothing new
        with kf.KafkaClient("127.0.0.1", broker.port) as c2:
            relay2 = kf.KafkaRelay(store, c2, "dms-relay", state_path=state)
            assert relay2.pump() == 0
            got = kf.consume_events(c2, "dms-relay", 0)
        assert [e["data"]["id"] for e in got] == [str(i) for i in range(10)]
        keys = [k for k, _v in broker.logs[("dms-relay", 0)]]
        assert keys == [f"k{i % 3}".encode() for i in range(10)]
    finally:
        broker.close()
