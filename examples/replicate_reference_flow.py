"""The reference's whole `make run` flow (run.py:212-329) on the Spark
engine, end to end: seed → full-load tasks with the 6/4-event contracts →
CDC tasks with the 5/4/3 contracts → statistics → SQL validation.

Run:  cd /root/repo && python examples/replicate_reference_flow.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sample_dms_kinesis_rds_mariadb_spark import get_session
from sample_dms_kinesis_rds_mariadb_spark.engine import ReplicationEngine
from sample_dms_kinesis_rds_mariadb_spark.fixtures import (
    DB_NAME,
    TABLES,
    reference_pipeline,
    seed_df,
)


def ops(events):
    return [(e["metadata"]["operation"], e["metadata"]["table-name"]) for e in events]


def main() -> None:
    spark = get_session(app_name="reference-flow", cpus=8, shuffle_partitions=8)
    workdir = tempfile.mkdtemp(prefix="reference-flow-")
    engine = ReplicationEngine(
        spark, reference_pipeline(os.path.join(workdir, "feed")), workdir
    )

    # --- seed source tables (run_queries_on_mysql analog, run.py:89-112) ---
    for table, (_, _, pk, defaults) in TABLES.items():
        df = seed_df(spark, table).cache()
        df.count()
        engine.register_table("mariadb-source", DB_NAME, table, df, pk, defaults)

    # --- full-load flow (run.py:212-268) -----------------------------------
    ts = time.time() - 1
    engine.start_task("full-load-task-1")
    engine.wait_for_task_status("full-load-task-1", "stopped")
    ev1 = engine.consume(after_ts=ts, expected_count=6)
    print(f"full-load-task-1: {len(ev1)} events (contract 6)")
    for op, t in ops(ev1):
        print(f"  {op:14s} {t}")

    ts2 = time.time()
    engine.start_task("full-load-task-2")
    engine.wait_for_task_status("full-load-task-2", "stopped")
    ev2 = engine.consume(after_ts=ts2, expected_count=4)
    print(f"full-load-task-2: {len(ev2)} events (contract 4)")

    print("table statistics (task 1):")
    print(json.dumps(engine.describe_table_statistics("full-load-task-1"), indent=2))

    # --- the literal consumer loop (wait_for_kinesis, run.py:168-199):
    # GetShardIterator(TRIM_HORIZON) then paged GetRecords(Limit=50)
    it = engine.get_shard_iterator(0, "TRIM_HORIZON")
    total = 0
    while True:
        page = it.get_records(limit=50)
        if not page:
            break
        total += len(page)
    print(f"TRIM_HORIZON paged scan: {total} records (= {len(ev1) + len(ev2)})")

    # --- CDC flow (run.py:271-329): recreate, capture, alter -----------------
    feed = engine.changefeed("mariadb-source")
    ts3 = time.time()
    feed.append_changes(
        [
            {"schema": DB_NAME, "table": t, "op": "create-table",
             "commit_ts": "2024-01-01T00:00:00"}
            for t in ("authors", "accounts", "novels")
        ]
    )
    engine.start_task("cdc-task-1")
    engine.start_task("cdc-task-2")
    engine.wait_for_task_status("cdc-task-1", "running")
    engine.wait_for_task_status("cdc-task-2", "running")
    creates = engine.consume(after_ts=ts3, expected_count=5)
    print(f"CDC create phase: {len(creates)} events (contract 5 = 2 bootstrap + 3 CREATE)")

    ts4 = time.time()
    feed.append_changes(
        [
            {"schema": DB_NAME, "table": "novels", "op": "insert", "txn_id": "txn-1",
             "commit_ts": "2024-01-01T00:00:01",
             "data": {"novel_id": "1", "title": "The Great Adventure",
                      "author_id": "1", "publish_date": "2020-06-01",
                      "isbn": "978-3-16-148410-0", "genre": "Adventure",
                      "page_count": "300", "publisher": "Adventure Press",
                      "language": "English", "available_copies": "10",
                      "total_copies": "20", "created_at": "2021-01-02 10:00:00"}},
        ]
    )
    inserts = engine.consume(after_ts=ts4, expected_count=1)
    print(f"CDC insert phase: {len(inserts)} data event(s)")

    ts5 = time.time()
    feed.append_changes(
        [
            {"schema": DB_NAME, "table": "novels", "op": "alter-table",
             "commit_ts": "2024-01-01T00:00:02",
             "ddl": {"action": "add-column", "column": "is_stock",
                     "type": "boolean", "default": "true"}},
        ]
    )
    alters = engine.consume(after_ts=ts5, expected_count=1)
    print(f"CDC alter phase: {len(alters)} control event(s)")
    print("post-ALTER novels schema:")
    for row in engine.describe_table(DB_NAME, "novels"):
        print(f"  {row['Field']:20s} {row['Type']}")

    # --- SQL over replicated tables (run.py:231-241 generalized) ------------
    print("validation query:", engine.query_result(
        "SELECT title, author_id, is_stock FROM novels ORDER BY novel_id"
    ))

    engine.stop_task("cdc-task-1")
    engine.stop_task("cdc-task-2")
    print("done.")


if __name__ == "__main__":
    main()
