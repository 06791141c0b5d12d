"""Bucketed materializer: write amplification bounded to touched buckets,
superseded-version vacuum, and pk-changing updates (round-2 items; the
round-1 materializer rewrote the whole table per micro-batch)."""

import os

import pytest


from sample_dms_kinesis_rds_mariadb_spark.sources.changefeed import FEED_SCHEMA
from sample_dms_kinesis_rds_mariadb_spark.streaming.apply import TableMaterializer
from sample_dms_kinesis_rds_mariadb_spark.streaming.schema_evolution import (
    TableRegistry,
)

N_BUCKETS = 8


@pytest.fixture()
def mat(spark, tmp_path):
    registry = TableRegistry()
    base = spark.createDataFrame(
        [(i, f"name-{i}", i * 10) for i in range(100)], "id LONG, name STRING, v LONG"
    ).cache()
    base.count()
    registry.register_from_df("testdb", "items", base, primary_key="id")
    m = TableMaterializer(
        spark, registry, str(tmp_path / "state"), n_buckets=N_BUCKETS
    )
    m.overwrite("testdb", "items", base)
    return m


def _batch(spark, rows):
    """rows: list of (seq, op, data_dict, before_dict|None)."""
    payload = [
        {
            "seq": seq,
            "schema": "testdb",
            "table": "items",
            "op": op,
            "txn_id": f"t{seq}",
            "commit_ts": "2024-01-01T00:00:00",
            "data": data,
            "before": before,
            "ddl": None,
        }
        for seq, op, data, before in rows
    ]
    df = spark.createDataFrame(payload, FEED_SCHEMA).cache()
    df.count()
    return df


def _version_snapshot(mat):
    return {k: v for k, v in mat._buckets[("testdb", "items")].items()}


def test_upsert_rewrites_only_touched_buckets(spark, mat):
    before = _version_snapshot(mat)
    # one key → exactly one touched bucket
    mat.apply_change_batch(
        _batch(spark, [(1, "update", {"id": "5", "name": "renamed", "v": "50"}, None)])
    )
    after = _version_snapshot(mat)
    bumped = [k for k in after if after[k] != before[k]]
    assert len(bumped) == 1, f"expected 1 bucket rewritten, got {bumped}"
    got = {r["id"]: r["name"] for r in mat.table("testdb", "items").collect()}
    assert len(got) == 100
    assert got[5] == "renamed"


def test_vacuum_reaps_superseded_versions(spark, tmp_path):
    registry = TableRegistry()
    base = spark.createDataFrame(
        [(i, f"name-{i}", i * 10) for i in range(100)], "id LONG, name STRING, v LONG"
    ).cache()
    base.count()
    registry.register_from_df("testdb", "items", base, primary_key="id")
    # zero grace: superseded versions reap at the next publish (the default
    # 60 s grace protects concurrent readers — see test below)
    mat = TableMaterializer(
        spark, registry, str(tmp_path / "state"), n_buckets=N_BUCKETS,
        vacuum_grace_sec=0,
    )
    mat.overwrite("testdb", "items", base)
    for seq in range(1, 4):
        mat.apply_change_batch(
            _batch(
                spark,
                [(seq, "update", {"id": "5", "name": f"n{seq}", "v": "50"}, None)],
            )
        )
    # on disk: every bucket dir holds exactly ONE version directory
    tdir = os.path.join(mat.path, "testdb.items")
    for b in sorted(os.listdir(tdir)):
        if not b.startswith("b"):
            continue
        versions = os.listdir(os.path.join(tdir, b))
        assert len(versions) == 1, f"bucket {b} kept {versions}"
    got = {r["id"]: r["name"] for r in mat.table("testdb", "items").collect()}
    assert got[5] == "n3"


def test_vacuum_grace_protects_inflight_readers(spark, mat):
    """A plan built against the pre-publish version still collects after a
    publish: superseded versions survive for vacuum_grace_sec (the fixture
    uses the 60 s default), then an explicit vacuum(all_versions=True)
    reaps them."""
    stale_plan = mat.table("testdb", "items")  # plan holds current paths
    mat.apply_change_batch(
        _batch(spark, [(1, "update", {"id": "5", "name": "bumped", "v": "50"}, None)])
    )
    assert stale_plan.count() == 100  # old version still on disk
    assert len(mat._retired) == 1
    mat.vacuum(all_versions=True)
    assert not mat._retired


def test_pk_changing_update_removes_stale_row(spark, mat):
    """ADVICE item: an UPDATE whose after-image carries a NEW pk must remove
    the old-pk row (from the before-image), not leave a stale duplicate."""
    mat.apply_change_batch(
        _batch(
            spark,
            [
                (
                    1,
                    "update",
                    {"id": "105", "name": "moved", "v": "50"},
                    {"id": "5", "name": "name-5", "v": "50"},
                )
            ],
        )
    )
    rows = {r["id"]: r["name"] for r in mat.table("testdb", "items").collect()}
    assert 105 in rows and rows[105] == "moved"
    assert 5 not in rows, "stale old-pk row survived a pk-changing update"
    assert len(rows) == 100


def test_delete_then_empty_bucket_reads_clean(spark, mat):
    # delete every key in one bucket's range; table still reads consistently
    mat.apply_change_batch(
        _batch(
            spark,
            [
                (i + 1, "delete", {"id": str(i), "name": f"name-{i}", "v": str(i * 10)}, None)
                for i in range(100)
            ],
        )
    )
    assert mat.table("testdb", "items").count() == 0
    # re-insert works after full emptying
    mat.apply_change_batch(
        _batch(spark, [(200, "insert", {"id": "1", "name": "back", "v": "10"}, None)])
    )
    got = mat.table("testdb", "items").collect()
    assert [(r["id"], r["name"]) for r in got] == [(1, "back")]

def test_cross_process_restart_restores_manifest(spark, tmp_path, mat):
    """ADVICE item: the bucket manifest must survive a process restart — a
    fresh materializer over the same workdir previously started empty, so
    CDC applied onto nothing and queries silently lost pre-restart rows."""
    mat.apply_change_batch(
        _batch(spark, [(1, "update", {"id": "5", "name": "pre-restart", "v": "50"}, None)])
    )
    # "new process": fresh registry + materializer over the same directory
    registry2 = TableRegistry()
    registry2.register_from_df(
        "testdb",
        "items",
        spark.createDataFrame([], "id LONG, name STRING, v LONG"),
        primary_key="id",
    )
    mat2 = TableMaterializer(spark, registry2, mat.path, n_buckets=N_BUCKETS)
    assert mat2.restore() == [("testdb", "items")]
    got = {r["id"]: r["name"] for r in mat2.table("testdb", "items").collect()}
    assert len(got) == 100
    assert got[5] == "pre-restart"
    # CDC keeps applying on the restored state
    mat2.apply_change_batch(
        _batch(spark, [(2, "insert", {"id": "500", "name": "post", "v": "1"}, None)])
    )
    assert mat2.table("testdb", "items").count() == 101
    # second restore is a no-op (state already loaded)
    assert mat2.restore() == []


def test_reapplying_same_batch_is_idempotent(spark, mat):
    """At-least-once delivery: a redelivered micro-batch (same change events,
    same seqs) must leave the materialized table exactly as a single apply
    did — last-change-per-pk upsert is naturally idempotent."""
    batch = _batch(
        spark,
        [
            (1, "update", {"id": "3", "name": "renamed", "v": "99"}, None),
            (2, "insert", {"id": "200", "name": "new", "v": "1"}, None),
            (3, "delete", {"id": "7", "name": "name-7", "v": "70"}, None),
        ],
    )
    assert mat.apply_change_batch(batch) == []
    once = sorted(
        (r["id"], r["name"], r["v"])
        for r in mat.table("testdb", "items").collect()
    )

    assert mat.apply_change_batch(batch) == []  # redelivery
    twice = sorted(
        (r["id"], r["name"], r["v"])
        for r in mat.table("testdb", "items").collect()
    )
    assert twice == once
    assert (3, "renamed", 99) in {(r[0], r[1], r[2]) for r in twice}
    ids = {r[0] for r in twice}
    assert 200 in ids and 7 not in ids and len(twice) == 100


def test_same_batch_pk_change_does_not_resurrect_old_key(spark, mat):
    """insert(id=200) then a pk-changing update 200→201 in ONE batch: only
    id=201 may survive — the after-image-partitioned window used to let
    both rows through (the superseded insert sat in its own partition)."""
    batch = _batch(
        spark,
        [
            (1001, "insert", {"id": "200", "name": "n", "v": "1"}, None),
            (
                1002,
                "update",
                {"id": "201", "name": "n", "v": "2"},
                {"id": "200", "name": "n", "v": "1"},
            ),
        ],
    )
    assert mat.apply_change_batch(batch) == []
    rows = {r["id"]: r["v"] for r in mat.table("testdb", "items").collect()}
    assert 200 not in rows
    assert rows[201] == 2


def test_null_data_delete_supersedes_same_batch_insert(spark, mat):
    """A MINIMAL-image delete (null after image, key only in before) must
    delete the key even when the same batch inserted it — the null _pk
    partition used to never outrank the insert's partition."""
    batch = _batch(
        spark,
        [
            (1101, "insert", {"id": "300", "name": "x", "v": "5"}, None),
            (1102, "delete", None, {"id": "300", "name": "x", "v": "5"}),
        ],
    )
    assert mat.apply_change_batch(batch) == []
    ids = {r["id"] for r in mat.table("testdb", "items").collect()}
    assert 300 not in ids


def test_same_batch_pk_chain_collapses(spark, mat):
    """A chain 400→401→402 in one batch leaves exactly the final key."""
    batch = _batch(
        spark,
        [
            (1201, "insert", {"id": "400", "name": "c", "v": "1"}, None),
            (1202, "update", {"id": "401", "name": "c", "v": "2"},
             {"id": "400", "name": "c", "v": "1"}),
            (1203, "update", {"id": "402", "name": "c", "v": "3"},
             {"id": "401", "name": "c", "v": "2"}),
        ],
    )
    assert mat.apply_change_batch(batch) == []
    rows = {r["id"]: r["v"] for r in mat.table("testdb", "items").collect()}
    assert 400 not in rows and 401 not in rows
    assert rows[402] == 3


def test_schema_qualified_views(spark, tmp_path):
    """Two schemas holding the same table name: the qualified views stay
    distinct (the bare view is last-writer-wins by documented rule)."""
    registry = TableRegistry()
    a = spark.createDataFrame([(1, "from-db1")], "id LONG, v STRING")
    b = spark.createDataFrame([(2, "from-db2")], "id LONG, v STRING")
    registry.register_from_df("db1", "orders", a, primary_key="id")
    registry.register_from_df("db2", "orders", b, primary_key="id")
    m = TableMaterializer(spark, registry, str(tmp_path / "st"), n_buckets=2)
    m.overwrite("db1", "orders", a)
    m.overwrite("db2", "orders", b)
    m.register_view("db1", "orders")
    m.register_view("db2", "orders")
    assert spark.sql("SELECT v FROM db1_orders").collect()[0]["v"] == "from-db1"
    assert spark.sql("SELECT v FROM db2_orders").collect()[0]["v"] == "from-db2"
    # bare name resolves to the most recently registered schema
    assert spark.sql("SELECT v FROM orders").collect()[0]["v"] == "from-db2"
