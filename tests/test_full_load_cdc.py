"""full-load-and-cdc migration type: snapshot, binlog-position handoff, then
CDC applies ONLY post-snapshot changes; a checkpointed restart resumes CDC
without re-snapshotting (round-2 stretch item; DMS supports this third
migration type — the reference uses only the two pure modes)."""

import time

import pytest

from sample_dms_kinesis_rds_mariadb_spark.engine import ReplicationEngine
from sample_dms_kinesis_rds_mariadb_spark.fixtures import DB_NAME, TABLES, seed_df
from sample_dms_kinesis_rds_mariadb_spark.spec import (
    EndpointSpec,
    PipelineSpec,
    SelectionRule,
    TaskSettings,
    TaskSpec,
)

EP = "mariadb-source"


@pytest.fixture()
def engine(spark, tmp_path):
    spec = PipelineSpec(
        endpoints=[
            EndpointSpec(
                EP,
                "memory",
                {"schema_name": DB_NAME, "changefeed_path": str(tmp_path / "feed")},
            )
        ],
        tasks=[
            TaskSpec(
                "flc-task",
                EP,
                "full-load-and-cdc",
                [SelectionRule(DB_NAME, "novels")],
                TaskSettings(before_image=True),
            )
        ],
        shards=1,
    )
    eng = ReplicationEngine(spark, spec, str(tmp_path / "work"))
    _, _, pk, defaults = TABLES["novels"]
    df = seed_df(spark, "novels").cache()
    df.count()
    eng.register_table(EP, DB_NAME, "novels", df, pk, defaults)
    return eng


def test_apply_exceptions_recorded(spark, tmp_path):
    """DMS conflict semantics: a change for a table that doesn't exist on
    the target neither kills the task nor vanishes — it lands as a row in
    awsdms_apply_exceptions, queryable over SQL, while valid changes in the
    same stream keep applying."""
    spec = PipelineSpec(
        endpoints=[
            EndpointSpec(
                EP,
                "memory",
                {"schema_name": DB_NAME, "changefeed_path": str(tmp_path / "feed")},
            )
        ],
        tasks=[
            TaskSpec(
                "cdc-any",
                EP,
                "cdc",
                [SelectionRule(DB_NAME, "%")],
                TaskSettings(before_image=True),
            )
        ],
        shards=1,
    )
    eng = ReplicationEngine(spark, spec, str(tmp_path / "work"))
    _, _, pk, defaults = TABLES["novels"]
    df = seed_df(spark, "novels").cache()
    df.count()
    eng.register_table(EP, DB_NAME, "novels", df, pk, defaults)

    eng.changefeed(EP).append_changes(
        [
            {
                "schema": DB_NAME,
                "table": "ghosts",  # never registered on the target
                "op": "insert",
                "txn_id": "g1",
                "commit_ts": "2024-01-01T00:00:01",
                "data": {"ghost_id": "1", "name": "casper"},
            },
            {
                "schema": DB_NAME,
                "table": "novels",
                "op": "insert",
                "txn_id": "n1",
                "commit_ts": "2024-01-01T00:00:02",
                "data": {"novel_id": "9", "title": "Fine", "author_id": "1"},
            },
        ]
    )
    eng.start_task("cdc-any")
    eng.wait_for_task_status("cdc-any", "running")

    def _applied():
        try:
            return any(
                r["title"] == "Fine"
                for r in eng.query_result("SELECT title FROM novels")
            )
        except Exception:
            return False  # view appears with the first applied batch

    _wait_for(_applied)
    eng.stop_task("cdc-any")

    excs = eng.query_result(
        "SELECT task_name, table_owner, table_name, statement, error "
        "FROM awsdms_apply_exceptions ORDER BY table_name"
    )
    assert len(excs) == 1
    assert excs[0]["table_name"] == "ghosts"
    assert excs[0]["task_name"] == "cdc-any"
    assert "not registered" in excs[0]["error"]
    # the valid change in the same stream applied
    titles = {r["title"] for r in eng.query_result("SELECT title FROM novels")}
    assert "Fine" in titles


def test_table_validation(engine):
    """DMS table-validation analog: after a clean snapshot the source and
    target validate; a target-side drift (post-snapshot insert the source
    never got) is detected with an exact mismatch count."""
    engine.start_task("flc-task")
    engine.wait_for_task_status("flc-task", "running")
    # "running" covers the full-load phase too (DMS semantics) — wait for
    # the snapshot to finish materializing before validating
    _wait_for(
        lambda: engine.materializer.exists(DB_NAME, "novels")
        and engine.materializer.table(DB_NAME, "novels").count() == 2
    )

    v = engine.validate_table(EP, DB_NAME, "novels")
    assert v["ValidationState"] == "Validated"
    assert v["SourceRows"] == v["TargetRows"] == 2
    assert v["MismatchedRows"] == 0

    engine.changefeed(EP).append_changes(
        [
            {
                "schema": DB_NAME,
                "table": "novels",
                "op": "insert",
                "txn_id": "drift",
                "commit_ts": "2024-01-01T00:00:30",
                "data": {"novel_id": "77", "title": "Target Only", "author_id": "1"},
            }
        ]
    )
    _wait_for(lambda: len(engine.query_result("SELECT * FROM novels")) == 3)
    engine.stop_task("flc-task")

    v = engine.validate_table(EP, DB_NAME, "novels")
    assert v["ValidationState"] == "Mismatched records"
    assert v["SourceRows"] == 2 and v["TargetRows"] == 3
    assert v["MismatchedRows"] == 1


def _wait_for(fn, timeout=60, every=0.5):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if fn():
            return
        time.sleep(every)
    raise TimeoutError("condition not met")


def test_full_load_and_cdc_handoff(engine):
    # a change committed BEFORE the snapshot: its effect is (by definition)
    # already inside the registered source table. If CDC wrongly replayed it,
    # the title would flip to the marker value.
    engine.changefeed(EP).append_changes(
        [
            {
                "schema": DB_NAME,
                "table": "novels",
                "op": "update",
                "txn_id": "pre",
                "commit_ts": "2024-01-01T00:00:00",
                "data": {
                    "novel_id": "1",
                    "title": "WRONGLY-REPLAYED",
                    "author_id": "1",
                },
            }
        ]
    )
    engine.start_task("flc-task")
    engine.wait_for_task_status("flc-task", "running")
    # snapshot contract: drop + create + 2 loads (+1 CDC bootstrap control)
    events = engine.consume(after_ts=0, expected_count=5)
    ops = [e["metadata"]["operation"] for e in events]
    assert ops.count("load") == 2
    assert ops.count("drop-table") == 1
    novel_creates = [
        e
        for e in events
        if e["metadata"]["operation"] == "create-table"
        and e["metadata"]["table-name"] == "novels"
    ]
    bootstrap = [
        e
        for e in events
        if e["metadata"]["table-name"] == "awsdms_apply_exceptions"
    ]
    assert len(novel_creates) == 1
    assert len(bootstrap) == 1  # T7 bootstrap rides the CDC start

    # post-snapshot changes: one insert, one update — these MUST apply
    engine.changefeed(EP).append_changes(
        [
            {
                "schema": DB_NAME,
                "table": "novels",
                "op": "insert",
                "txn_id": "post1",
                "commit_ts": "2024-01-01T00:00:10",
                "data": {"novel_id": "9", "title": "Post Snapshot", "author_id": "1"},
            },
            {
                "schema": DB_NAME,
                "table": "novels",
                "op": "update",
                "txn_id": "post2",
                "commit_ts": "2024-01-01T00:00:11",
                "data": {"novel_id": "2", "title": "Retitled", "author_id": "1"},
            },
        ]
    )
    _wait_for(
        lambda: len(engine.query_result("SELECT * FROM novels")) == 3
        and engine.query_result(
            "SELECT title FROM novels WHERE novel_id = 2"
        )[0]["title"]
        == "Retitled"
    )
    engine.stop_task("flc-task")

    rows = {
        r["novel_id"]: r["title"]
        for r in engine.query_result("SELECT novel_id, title FROM novels")
    }
    assert rows[9] == "Post Snapshot"
    assert rows[2] == "Retitled"
    # the pre-snapshot change was NOT replayed over the snapshot
    assert rows[1] != "WRONGLY-REPLAYED"

    # restart resumes CDC — no second snapshot (still exactly 2 load events),
    # and new changes keep applying
    engine.start_task("flc-task")
    engine.wait_for_task_status("flc-task", "running")
    engine.changefeed(EP).append_changes(
        [
            {
                "schema": DB_NAME,
                "table": "novels",
                "op": "delete",
                "txn_id": "post3",
                "commit_ts": "2024-01-01T00:00:20",
                "data": {"novel_id": "9", "title": "Post Snapshot", "author_id": "1"},
            }
        ]
    )
    _wait_for(lambda: len(engine.query_result("SELECT * FROM novels")) == 2)
    engine.stop_task("flc-task")
    all_ops = [e["metadata"]["operation"] for e in engine.consume()]
    assert all_ops.count("load") == 2, "restart must not re-snapshot"


def test_table_validation_checksum_survives_ansi_overflow(spark, tmp_path):
    """Regression (round-8 verdict item 1): the order-independent content
    checksum used to be SUM(xxhash64(...)) — full-range signed-64 values
    whose running sum exits int64 almost surely once row counts are
    non-trivial, throwing ARITHMETIC_OVERFLOW under the session's ANSI
    mode. 20k deterministic rows (no timestamp defaults, so the hashes —
    and the old code's overflow — are reproducible) make the old failure
    certain; the XOR fold must validate cleanly and still catch a
    single-row drift."""
    from pyspark.sql import functions as F

    spec = PipelineSpec(
        endpoints=[EndpointSpec(EP, "memory", {"schema_name": DB_NAME})],
        tasks=[],
        shards=1,
    )
    eng = ReplicationEngine(spark, spec, str(tmp_path / "work"))
    n = 20_000
    df = (
        spark.range(n)
        .select(
            F.col("id").cast("int").alias("row_id"),
            F.concat(F.lit("payload-"), F.col("id").cast("string")).alias("payload"),
        )
        .cache()
    )
    df.count()
    # certainty check for the OLD failure mode: the int64 running sum of
    # these exact row hashes leaves [-2^63, 2^63) (computed overflow-free
    # in decimal), so SUM-based checksumming could not have survived ANSI
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit("\x00NULL"))
        for c in sorted(df.columns)
    ]
    dec_sum = (
        df.select(
            F.xxhash64(F.concat_ws("\x01", *parts))
            .cast("decimal(38,0)")
            .alias("h")
        )
        .agg(F.sum("h").alias("s"))
        .first()["s"]
    )
    assert abs(int(dec_sum)) >= 2**63, "fixture no longer overflow-certain"

    eng.register_table(EP, DB_NAME, "wide_rows", df, primary_key="row_id")
    eng.materializer.overwrite(DB_NAME, "wide_rows", df)

    v = eng.validate_table(EP, DB_NAME, "wide_rows")
    assert v["ValidationState"] == "Validated"
    assert v["SourceRows"] == v["TargetRows"] == n
    assert v["MismatchedRows"] == 0

    drifted = df.withColumn(
        "payload",
        F.when(F.col("row_id") == 123, F.lit("tampered")).otherwise(
            F.col("payload")
        ),
    )
    eng.materializer.overwrite(DB_NAME, "wide_rows", drifted)
    v = eng.validate_table(EP, DB_NAME, "wide_rows")
    assert v["ValidationState"] == "Mismatched records"
    assert v["MismatchedRows"] == 1
