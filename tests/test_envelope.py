"""Envelope codec unit tests: encode → JSON wire shape → parse roundtrip
(reference stack.py:210-220, run.py:196-198)."""

import json

from pyspark.sql import functions as F

from sample_dms_kinesis_rds_mariadb_spark.envelope import (
    control_events,
    encode_data_events,
    parse_json_records,
    to_json_records,
)
from sample_dms_kinesis_rds_mariadb_spark.fixtures import seed_df
from sample_dms_kinesis_rds_mariadb_spark.spec import TaskSettings


def test_load_event_shape(spark):
    df = seed_df(spark, "authors")
    env = encode_data_events(df, "testdb", "authors", "load", TaskSettings())
    rows = env.collect()
    assert len(rows) == 1
    r = rows[0].asDict(recursive=True)
    assert r["data"]["first_name"] == "John"
    assert r["data"]["author_id"] == "1"
    assert r["before-image"] is None
    assert r["metadata"]["record-type"] == "data"
    assert r["metadata"]["operation"] == "load"
    assert r["metadata"]["schema-name"] == "testdb"
    assert r["metadata"]["table-name"] == "authors"
    assert r["partition_key"] == "testdb.authors"


def test_null_columns_included_by_default(spark):
    # include_null_and_empty (stack.py:215): profile_picture is NULL in seed
    df = seed_df(spark, "accounts")
    env = encode_data_events(df, "testdb", "accounts", "load", TaskSettings())
    r = env.collect()[0].asDict(recursive=True)
    assert "profile_picture" in r["data"]
    assert r["data"]["profile_picture"] is None

    env2 = encode_data_events(
        df, "testdb", "accounts", "load", TaskSettings(include_null_and_empty=False)
    )
    r2 = env2.collect()[0].asDict(recursive=True)
    assert "profile_picture" not in r2["data"]


def test_control_events_order_and_shape(spark):
    env = control_events(
        spark,
        [("testdb", "authors", "drop-table"), ("testdb", "authors", "create-table")],
        TaskSettings(),
    )
    rows = [r.asDict(recursive=True) for r in env.orderBy("_order").collect()]
    assert [r["metadata"]["operation"] for r in rows] == ["drop-table", "create-table"]
    assert all(r["metadata"]["record-type"] == "control" for r in rows)
    assert all(r["data"] is None for r in rows)


def test_json_roundtrip(spark):
    df = seed_df(spark, "novels")
    env = encode_data_events(df, "testdb", "novels", "insert", TaskSettings())
    wire = to_json_records(env)
    w = wire.collect()[0]
    payload = json.loads(w["Data"])
    assert set(payload.keys()) == {"data", "before-image", "metadata"}
    assert w["PartitionKey"] == "testdb.novels"

    back = parse_json_records(wire)
    r = back.orderBy(F.col("data.novel_id")).collect()[0].asDict(recursive=True)
    assert r["data"]["title"] == "The Great Adventure"
    assert r["metadata"]["operation"] == "insert"
    assert r["partition_key"] == "testdb.novels"


def test_binary_column_base64(spark):
    """BLOB columns travel base64 in the envelope (the DMS JSON wire rule),
    not a lossy UTF-8 cast."""
    import base64

    df = spark.createDataFrame(
        [(1, bytearray(b"\x00\xff\x10binary"))], "id INT, blob BINARY"
    )
    env = encode_data_events(df, "db", "t", "load", TaskSettings())
    r = env.collect()[0].asDict(recursive=True)
    assert r["data"]["blob"] == base64.b64encode(b"\x00\xff\x10binary").decode()
    assert r["data"]["id"] == "1"  # non-binary untouched


def test_transaction_details_toggle(spark):
    df = seed_df(spark, "authors")
    env = encode_data_events(
        df,
        "testdb",
        "authors",
        "insert",
        TaskSettings(include_transaction_details=True),
        txn_id=F.lit("txn-42"),
    )
    assert env.collect()[0]["metadata"]["transaction-id"] == "txn-42"

    env2 = encode_data_events(
        df,
        "testdb",
        "authors",
        "insert",
        TaskSettings(include_transaction_details=False),
        txn_id=F.lit("txn-42"),
    )
    assert env2.collect()[0]["metadata"]["transaction-id"] is None


def test_primary_key_mode_null_pk_falls_back_to_table_key(spark):
    """primary-key routing with partition_include_schema_table=False: control
    events (null _pk) and rows whose table has no known PK must fall back to
    schema.table — a NULL PartitionKey would collapse every such event onto
    the one shard xxhash64(null) hashes to, and real Kinesis rejects empty
    partition keys."""
    from sample_dms_kinesis_rds_mariadb_spark.streaming.cdc import encode_change_batch

    settings = TaskSettings(
        partition_key_type="primary-key", partition_include_schema_table=False
    )
    batch = (
        spark.createDataFrame(
            [
                (1, "insert", {"id": "7", "v": "x"}, None),
                (2, "drop-table", None, None),
                (3, "insert", {"k": "9"}, None),  # table absent from pk_by_table
            ],
            "seq LONG, op STRING, data MAP<STRING,STRING>, before MAP<STRING,STRING>",
        )
        .withColumn("schema", F.lit("testdb"))
        .withColumn("table", F.when(F.col("seq") == 3, "orphan").otherwise("novels"))
        .withColumn("commit_ts", F.lit("2024-01-01T00:00:00Z"))
        .withColumn("txn_id", F.lit(None).cast("string"))
    )
    env = encode_change_batch(batch, settings, pk_by_table={("testdb", "novels"): "id"})
    keys = {r["_order"]: r["partition_key"] for r in env.collect()}
    assert keys[1] == "7"  # PK routing for the known table
    assert keys[2] == "testdb.novels"  # control event falls back to table key
    assert keys[3] == "testdb.orphan"  # unknown-PK table falls back too
    assert all(k is not None for k in keys.values())


def test_json_roundtrip_adversarial_strings(spark):
    """Envelope values survive the JSON wire byte-for-byte: quotes,
    backslashes, control chars, newlines, unicode (CJK/emoji/RTL),
    JSON-shaped strings, and long payloads must all parse back identical
    (the DMS wire is JSON — escaping bugs corrupt replicated data)."""
    nasty = [
        'quote " inside',
        "backslash \\ and \\\\ double",
        "newline\nand\ttab\rand\fformfeed",
        "control \x01\x02\x1f chars",
        "unicode: é中文 \U0001f600 שלום",
        '{"looks":"like json","n":[1,2]}',
        "trailing space  ",
        "",
        "x" * 5000,
        "null",
        "slash / and <html> & amp",
    ]
    rows = [(i, s) for i, s in enumerate(nasty)]
    df = spark.createDataFrame(rows, "id INT, v STRING")
    env = encode_data_events(df, "db", "t", "load", TaskSettings())
    back = parse_json_records(to_json_records(env))
    got = {
        int(r["data"]["id"]): r["data"]["v"]
        for r in back.collect()
    }
    for i, s in enumerate(nasty):
        assert got[i] == s, f"row {i} corrupted: {got[i]!r} != {s!r}"


def test_user_column_named_before_ships_in_data(spark):
    """A source table whose OWN column is literally named 'before' (plain
    string, not the CDC-attached image struct) must keep it in the data
    map — the unconditional exclusion silently truncated such rows."""
    from sample_dms_kinesis_rds_mariadb_spark.envelope import encode_data_events
    from sample_dms_kinesis_rds_mariadb_spark.spec import TaskSettings

    df = spark.createDataFrame(
        [(1, "prior-value")], "id LONG, before STRING"
    )
    env = encode_data_events(
        df, "db", "t", "load", TaskSettings(), pk_column="id"
    ).collect()
    assert env[0]["data"]["before"] == "prior-value"


def test_pk_only_before_image_selects_pk_by_name(spark):
    """pk-only before images must carry the PRIMARY KEY whatever the
    caller's before_columns ordering (the old [:1] truncation kept the
    first listed column instead)."""
    from pyspark.sql import functions as F

    from sample_dms_kinesis_rds_mariadb_spark.envelope import encode_data_events
    from sample_dms_kinesis_rds_mariadb_spark.spec import TaskSettings

    df = spark.createDataFrame(
        [(2, "new-name")], "id LONG, name STRING"
    ).select(
        "id",
        "name",
        F.struct(
            F.lit("old-name").alias("name"), F.col("id").alias("id")
        ).alias("before"),  # pk listed SECOND
    )
    env = encode_data_events(
        df,
        "db",
        "t",
        "update",
        TaskSettings(before_image=True, before_image_type="pk-only"),
        before_columns=["name", "id"],  # pk listed SECOND
        pk_column="id",
    ).collect()
    assert env[0]["before-image"] == {"id": "2"}
