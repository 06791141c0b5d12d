"""CDC e2e: the reference's streaming flow (SURVEY §3.2) with its golden
contracts — create phase 5 events (2 bootstrap + 3 CREATE), insert phase 4
data events, alter phase 3 control events (reference run.py:271-329;
tests/test_infra.py:649-714) — plus update/delete with before-images and
materialized query-surface checks the reference implies (J1, A1, P1)."""

import time

import pytest

from pyspark.sql import types as T

from sample_dms_kinesis_rds_mariadb_spark.engine import ReplicationEngine
from sample_dms_kinesis_rds_mariadb_spark.fixtures import (
    DB_NAME,
    TABLES,
    reference_pipeline,
)


@pytest.fixture()
def engine(spark, tmp_path):
    spec = reference_pipeline(str(tmp_path / "feed"))
    eng = ReplicationEngine(spark, spec, str(tmp_path / "work"))
    # CDC starts from empty recreated tables (run.py:283-285): register the
    # schemas (create) with no rows.
    for table, (schema, _, pk, defaults) in TABLES.items():
        eng.register_table(
            "mariadb-source",
            DB_NAME,
            table,
            spark.createDataFrame([], schema),
            pk,
            defaults,
        )
    yield eng
    for t in ("cdc-task-1", "cdc-task-2"):
        try:
            eng.stop_task(t)
        except Exception:
            pass


AUTHOR_INSERT = {
    "schema": DB_NAME,
    "table": "authors",
    "op": "insert",
    "txn_id": "txn-1",
    "commit_ts": "2024-01-01T00:00:01",
    "data": {
        "author_id": "1",
        "first_name": "John",
        "last_name": "Doe",
        "date_of_birth": "1980-01-01",
        "nationality": "American",
        "biography": "Biography of John Doe.",
        "email": "john.doe@example.com",
        "phone_number": "123-456-7890",
        "active": "true",
        "created_at": "2021-01-01 12:00:00",
    },
}

ACCOUNT_INSERT = {
    "schema": DB_NAME,
    "table": "accounts",
    "op": "insert",
    "txn_id": "txn-1",
    "commit_ts": "2024-01-01T00:00:01",
    "data": {
        "id": "1",
        "name": "Alice",
        "age": "30",
        "birth_date": "1991-05-21",
        "account_balance": "1500.00",
        "is_active": "true",
        "signup_time": "2021-01-08 09:00:00",
        "last_login": "2021-03-10 08:00:00",
        "bio": "Bio of Alice",
        "profile_picture": None,
        "favorite_color": "red",
        "height": "1.70",
        "weight": "60.5",
    },
}

NOVEL_INSERTS = [
    {
        "schema": DB_NAME,
        "table": "novels",
        "op": "insert",
        "txn_id": "txn-2",
        "commit_ts": "2024-01-01T00:00:02",
        "data": {
            "novel_id": "1",
            "title": "The Great Adventure",
            "author_id": "1",
            "publish_date": "2020-06-01",
            "isbn": "978-3-16-148410-0",
            "genre": "Adventure",
            "page_count": "300",
            "publisher": "Adventure Press",
            "language": "English",
            "available_copies": "10",
            "total_copies": "20",
            "created_at": "2021-01-02 10:00:00",
        },
    },
    {
        "schema": DB_NAME,
        "table": "novels",
        "op": "insert",
        "txn_id": "txn-2",
        "commit_ts": "2024-01-01T00:00:02",
        "data": {
            "novel_id": "2",
            "title": "Journey to the Stars",
            "author_id": "1",
            "publish_date": "2021-04-10",
            "isbn": "978-0-11-322456-7",
            "genre": "Science Fiction",
            "page_count": "350",
            "publisher": "SciFi Universe",
            "language": "English",
            "available_copies": "12",
            "total_copies": "25",
            "created_at": "2021-04-11 10:00:00",
        },
    },
]

CREATES = [
    {"schema": DB_NAME, "table": t, "op": "create-table", "commit_ts": "2024-01-01T00:00:00"}
    for t in ("authors", "accounts", "novels")
]

ALTERS = [
    {
        "schema": DB_NAME,
        "table": "authors",
        "op": "alter-table",
        "commit_ts": "2024-01-01T00:00:03",
        "ddl": {"action": "modify-column", "column": "email", "type": "varchar(100)"},
    },
    {
        "schema": DB_NAME,
        "table": "accounts",
        "op": "alter-table",
        "commit_ts": "2024-01-01T00:00:03",
        "ddl": {"action": "drop-column", "column": "profile_picture"},
    },
    {
        "schema": DB_NAME,
        "table": "novels",
        "op": "alter-table",
        "commit_ts": "2024-01-01T00:00:03",
        "ddl": {
            "action": "add-column",
            "column": "is_stock",
            "type": "boolean",
            "default": "true",
        },
    },
]


def _ops(events):
    return [e["metadata"]["operation"] for e in events]


def test_cdc_three_phase_contracts(engine):
    feed = engine.changefeed("mariadb-source")

    # Phase A — creates issued BEFORE tasks start are still captured (CDC
    # starts from a binlog position, not "now": run.py:295-298)
    ts_create = time.time() - 1
    feed.append_changes(CREATES)
    engine.start_task("cdc-task-1")
    engine.start_task("cdc-task-2")
    engine.wait_for_task_status("cdc-task-1", "running")
    engine.wait_for_task_status("cdc-task-2", "running")
    events = engine.consume(after_ts=ts_create, expected_count=5, retries=120)
    assert len(events) == 5  # 2 bootstrap + 3 CREATE (run.py:296-297)
    ops = _ops(events)
    assert ops.count("create-table") == 5
    bootstrap = [
        e for e in events
        if e["metadata"]["table-name"] == "awsdms_apply_exceptions"
    ]
    assert len(bootstrap) == 2
    assert all(e["metadata"]["record-type"] == "control" for e in events)

    # Phase B — inserts ⇒ 4 data events (run.py:305-306)
    time.sleep(0.3)
    ts_insert = time.time()
    feed.append_changes([AUTHOR_INSERT, ACCOUNT_INSERT, *NOVEL_INSERTS])
    events = engine.consume(after_ts=ts_insert, expected_count=4, retries=120)
    assert len(events) == 4
    assert _ops(events).count("insert") == 4
    by_table = {}
    for e in events:
        by_table.setdefault(e["metadata"]["table-name"], []).append(e)
    assert {t: len(v) for t, v in by_table.items()} == {
        "authors": 1,
        "accounts": 1,
        "novels": 2,
    }
    # before-image null on inserts; txn details carried (K5)
    assert all(e["before-image"] is None for e in events)
    assert by_table["authors"][0]["metadata"]["transaction-id"] == "txn-1"

    # Phase C — 3 ALTERs ⇒ 3 control events (run.py:313-314)
    time.sleep(0.3)
    ts_alter = time.time()
    feed.append_changes(ALTERS)
    events = engine.consume(after_ts=ts_alter, expected_count=3, retries=120)
    assert len(events) == 3
    assert _ops(events).count("alter-table") == 3
    assert all(e["metadata"]["record-type"] == "control" for e in events)

    # statistics (A2): inserts counted per table per task
    stats1 = engine.describe_table_statistics("cdc-task-1")
    by_name = {s["TableName"]: s for s in stats1}
    assert by_name["authors"]["Inserts"] == 1
    assert by_name["accounts"]["Inserts"] == 1
    assert by_name["authors"]["Ddls"] >= 1  # create + alter
    stats2 = engine.describe_table_statistics("cdc-task-2")
    assert {s["TableName"]: s["Inserts"] for s in stats2 if s["TableName"] == "novels"} == {
        "novels": 2
    }

    # post-ALTER schemas (tests/test_infra.py:693-707)
    authors_fields = {
        d["Field"]: d["Type"] for d in engine.registry.describe(DB_NAME, "authors")
    }
    assert authors_fields["email"] == "string"  # varchar(100) → string
    accounts_fields = [d["Field"] for d in engine.registry.describe(DB_NAME, "accounts")]
    assert "profile_picture" not in accounts_fields
    novels = engine.registry.get(DB_NAME, "novels")
    assert novels.struct["is_stock"].dataType == T.BooleanType()
    assert novels.defaults["is_stock"] == "true"

    # materialized query surface (M5): counts (A1), projection (P1), FK join (J1)
    assert engine.query("SELECT COUNT(*) AS count FROM authors").collect()[0]["count"] == 1
    assert engine.query("SELECT COUNT(*) AS count FROM novels").collect()[0]["count"] == 2
    names = engine.query_result("SELECT first_name, last_name FROM authors")
    assert names == [{"first_name": "John", "last_name": "Doe"}]
    joined = engine.query_result(
        "SELECT n.title, a.first_name FROM novels n JOIN authors a USING (author_id) "
        "ORDER BY n.novel_id"
    )
    assert [j["title"] for j in joined] == [
        "The Great Adventure",
        "Journey to the Stars",
    ]
    # added-with-default column materializes as TRUE (C6)
    stock = engine.query_result("SELECT novel_id, is_stock FROM novels ORDER BY novel_id")
    assert all(r["is_stock"] is True for r in stock)


def test_cdc_checkpoint_restart(engine):
    """T1/T4: a stopped CDC task restarted with its checkpoint resumes from
    the committed offset — no duplicate bootstrap control event, no replay
    of already-delivered changes."""
    feed = engine.changefeed("mariadb-source")
    ts0 = time.time() - 1
    feed.append_changes([AUTHOR_INSERT])
    engine.start_task("cdc-task-1")
    engine.wait_for_task_status("cdc-task-1", "running")
    first = engine.consume(after_ts=ts0, expected_count=2, retries=120)
    assert len(first) == 2  # bootstrap + insert
    engine.stop_task("cdc-task-1")

    feed.append_changes([ACCOUNT_INSERT])
    engine.start_task("cdc-task-1")
    engine.wait_for_task_status("cdc-task-1", "running")
    allev = engine.consume(after_ts=ts0, expected_count=3, retries=120)
    # exactly one new event: the account insert; no second bootstrap
    assert len(allev) == 3
    ops = [(e["metadata"]["operation"], e["metadata"]["table-name"]) for e in allev]
    assert ops.count(("create-table", "awsdms_apply_exceptions")) == 1
    assert ("insert", "accounts") in ops
    engine.stop_task("cdc-task-1")


def test_cdc_update_delete_before_image(engine):
    """UPDATE/DELETE carry full-column before-images (stack.py:331-336) and
    the materializer applies them (upsert/delete by PK)."""
    feed = engine.changefeed("mariadb-source")
    ts0 = time.time() - 1
    feed.append_changes([AUTHOR_INSERT, ACCOUNT_INSERT, *NOVEL_INSERTS])
    engine.start_task("cdc-task-1")
    engine.start_task("cdc-task-2")
    engine.consume(after_ts=ts0, expected_count=6, retries=120)  # 2 bootstrap + 4

    time.sleep(0.3)
    ts1 = time.time()
    updated = dict(AUTHOR_INSERT["data"], first_name="Jane")
    feed.append_changes(
        [
            {
                "schema": DB_NAME,
                "table": "authors",
                "op": "update",
                "txn_id": "txn-9",
                "commit_ts": "2024-01-01T00:01:00",
                "data": updated,
                "before": AUTHOR_INSERT["data"],
            },
            {
                "schema": DB_NAME,
                "table": "novels",
                "op": "delete",
                "txn_id": "txn-10",
                "commit_ts": "2024-01-01T00:01:01",
                "data": NOVEL_INSERTS[1]["data"],
                "before": NOVEL_INSERTS[1]["data"],
            },
        ]
    )
    events = engine.consume(after_ts=ts1, expected_count=2, retries=120)
    upd = next(e for e in events if e["metadata"]["operation"] == "update")
    assert upd["data"]["first_name"] == "Jane"
    assert upd["before-image"]["first_name"] == "John"  # full-column (K4)
    dele = next(e for e in events if e["metadata"]["operation"] == "delete")
    assert dele["before-image"]["title"] == "Journey to the Stars"

    # materialized state reflects the update and the delete
    assert (
        engine.query("SELECT first_name FROM authors").collect()[0]["first_name"]
        == "Jane"
    )
    assert engine.query("SELECT COUNT(*) AS c FROM novels").collect()[0]["c"] == 1

    stats1 = engine.describe_table_statistics("cdc-task-1")
    authors_stats = next(s for s in stats1 if s["TableName"] == "authors")
    assert authors_stats["Updates"] == 1
    stats2 = engine.describe_table_statistics("cdc-task-2")
    novels_stats = next(s for s in stats2 if s["TableName"] == "novels")
    assert novels_stats["Deletes"] == 1
