"""Replication task lifecycle (SURVEY §2.10 T3/T4/T6/T7).

Tasks are the system's "queries" (SURVEY §1.1 item 4). The reference drives
them through a status state machine — start-replication, poll
``describe_replication_tasks`` until running/stopped, stop-replication
(reference run.py:140-165) — with full-load tasks self-terminating to
``stopped`` and CDC tasks staying ``running`` until stopped (run.py:246,
292-293, 323-326).

- Full load = a batch job per selected table (thread-wrapped so the driver
  API is poll-based like the reference's).
- CDC = a Structured Streaming query (micro-batch trigger) with a
  ``foreachBatch`` sink that appends envelopes to the stream store, updates
  statistics, applies DDL to the registry, and upserts materialized state.
  Multiple tasks run concurrently on one SparkSession sharing one sink (T6),
  exactly Spark's multi-StreamingQuery scheduler.
"""

from __future__ import annotations

import threading
import time
import traceback

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from sample_dms_kinesis_rds_mariadb_spark.catalog import SourceCatalog
from sample_dms_kinesis_rds_mariadb_spark.envelope import control_events
from sample_dms_kinesis_rds_mariadb_spark.sinks.stream_sink import StreamStore
from sample_dms_kinesis_rds_mariadb_spark.sources.changefeed import ChangeFeed
from sample_dms_kinesis_rds_mariadb_spark.sources.snapshot import snapshot_task_events
from sample_dms_kinesis_rds_mariadb_spark.spec import TaskSpec, select_tables
from sample_dms_kinesis_rds_mariadb_spark.streaming.apply import TableMaterializer
from sample_dms_kinesis_rds_mariadb_spark.streaming.cdc import encode_change_batch
from sample_dms_kinesis_rds_mariadb_spark.streaming.schema_evolution import TableRegistry
from sample_dms_kinesis_rds_mariadb_spark.streaming.statistics import StatisticsService

# DMS-compatible task states (observed set: run.py:140-165, 246, 292)
READY = "ready"
STARTING = "starting"
RUNNING = "running"
STOPPED = "stopped"
FAILED = "failed"

EXCEPTIONS_TABLE = "awsdms_apply_exceptions"

# The DMS apply-exceptions table shape (TASK_NAME/TABLE_OWNER/TABLE_NAME/
# ERROR_TIME/STATEMENT/ERROR in DMS terms) + a synthetic pk for the
# materializer's keyed storage.
_EXCEPTIONS_STRUCT = None  # built lazily to avoid importing types at module load


def _exceptions_struct():
    global _EXCEPTIONS_STRUCT
    if _EXCEPTIONS_STRUCT is None:
        from pyspark.sql import types as T

        _EXCEPTIONS_STRUCT = T.StructType(
            [
                T.StructField("exception_id", T.LongType(), False),
                T.StructField("task_name", T.StringType()),
                T.StructField("table_owner", T.StringType()),
                T.StructField("table_name", T.StringType()),
                T.StructField("error_time", T.TimestampType()),
                T.StructField("statement", T.StringType()),
                T.StructField("error", T.StringType()),
            ]
        )
    return _EXCEPTIONS_STRUCT


class ReplicationTask:
    def __init__(
        self,
        spark: SparkSession,
        spec: TaskSpec,
        catalog: SourceCatalog,
        store: StreamStore,
        stats: StatisticsService,
        registry: TableRegistry,
        materializer: TableMaterializer | None = None,
        changefeed: ChangeFeed | None = None,
        default_schema: str = "main",
    ) -> None:
        self.spark = spark
        self.spec = spec
        self.catalog = catalog
        self.store = store
        self.stats = stats
        self.registry = registry
        self.materializer = materializer
        self.changefeed = changefeed
        self.default_schema = default_schema
        self.status = READY
        self.error: str | None = None
        self._thread: threading.Thread | None = None
        self._query = None
        self._lock = threading.Lock()
        self._stop_requested = threading.Event()

    # -- lifecycle ----------------------------------------------------------
    def start(self) -> None:
        """start-replication (reference run.py:140-145)."""
        with self._lock:
            if self.status in (STARTING, RUNNING):
                raise RuntimeError(f"task {self.spec.task_id} already {self.status}")
            self.status = STARTING
            self._stop_requested.clear()
        if self.spec.migration_type == "full-load":
            self._thread = threading.Thread(target=self._run_full_load, daemon=True)
            self._thread.start()
        elif self.spec.migration_type == "full-load-and-cdc":
            self._thread = threading.Thread(
                target=self._run_full_load_then_cdc, daemon=True
            )
            self._thread.start()
        else:
            # cross-process restart of a pure-CDC task: the on-disk bucket
            # manifest must be reloaded BEFORE the stream resumes, or the
            # first apply merges onto empty state and its manifest save
            # erases every other table's versions (restore() no-ops when
            # state is live or no manifest exists)
            if self.materializer is not None:
                self.materializer.restore()
            # same atomicity as the full-load-and-cdc thread: a stop()
            # racing this start must either be seen here (flag set before
            # we take the lock → never start) or see the started query
            # (its _query read takes the same lock) — never slip between
            with self._lock:
                if self._stop_requested.is_set():
                    self.status = STOPPED
                    return
                self._start_cdc()

    def stop(self) -> None:
        """stop-replication (reference run.py:148-151). Drains in-flight
        micro-batches first (processAllAvailable) so stop() never truncates a
        committed change mid-apply — matches DMS's stop-after-commit
        semantics."""
        # signal first: a full-load(-and-cdc) thread that has not started
        # its CDC query yet must NOT start it after we return — without the
        # flag, stop() during the snapshot phase was a silent no-op race
        # (status flipped to stopped, then the thread set it back to
        # running and left an unstoppable query behind)
        self._stop_requested.set()
        # read _query under the task lock: the full-load-and-cdc thread
        # starts its CDC query inside the same lock after re-checking the
        # flag, so this read happens either before that block (the thread
        # will see the flag and never start) or after it (q is the live
        # query and gets stopped) — never in between
        with self._lock:
            q = self._query
        if q is not None:
            try:
                q.processAllAvailable()
            except Exception:
                pass
            q.stop()
            # wait for the query thread to fully terminate
            while q.isActive:
                time.sleep(0.05)
            self._query = None
        self.status = STOPPED

    def wait_for_status(self, status: str, retries: int = 240, sleep: float = 0.5) -> None:
        """Poll-with-retry-budget (reference run.py:154-165, budgets :23-24)."""
        for _ in range(retries):
            self._refresh_status()
            if self.status == status:
                return
            if self.status == FAILED:
                raise RuntimeError(
                    f"task {self.spec.task_id} failed: {self.error}"
                )
            time.sleep(sleep)
        raise TimeoutError(
            f"task {self.spec.task_id} did not reach {status!r} "
            f"(currently {self.status!r})"
        )

    # -- full load (S1) ------------------------------------------------------
    def _full_load_once(self) -> None:
        """One snapshot pass over the selected tables (no status transitions
        — shared by the pure full-load and full-load-and-cdc types)."""
        tables = select_tables(
            self.catalog.list_tables(self.spec.source), self.spec.rules
        )
        if not tables:
            return
        # one DataFrame → one distributed write job for the whole task;
        # persist so the stats aggregation reuses the computed envelopes
        # instead of re-evaluating the scan+encode lineage
        env = snapshot_task_events(
            self.spark,
            self.catalog,
            self.spec.source,
            tables,
            self.spec.settings,
            pk_by_table=self._pk_lookup(),
        ).persist()
        try:
            for schema_name, table_name in tables:
                self.stats.mark_table_state(
                    self.spec.task_id, schema_name, table_name, "Full load"
                )
            self.store.append_envelopes(env)
            self.stats.record_batch(self.spec.task_id, env)
            for schema_name, table_name in tables:
                self.stats.mark_table_state(
                    self.spec.task_id, schema_name, table_name, "Table completed"
                )
        finally:
            env.unpersist()

    def _run_full_load(self) -> None:
        try:
            self.status = RUNNING
            self._full_load_once()
            self.status = STOPPED  # full load self-terminates (run.py:246)
        except Exception:
            self.error = traceback.format_exc()
            self.status = FAILED

    def _run_full_load_then_cdc(self) -> None:
        """DMS migration type ``full-load-and-cdc``: record the feed position,
        snapshot, then stream only changes committed AFTER the position
        (binlog handoff — changes at or before it are already in the
        snapshot). The handoff position persists next to the checkpoint, so
        a restart resumes CDC (never re-snapshots, never re-filters against
        a newer position)."""
        import os

        try:
            self.status = RUNNING
            if self.changefeed is None:
                raise RuntimeError(
                    "full-load-and-cdc task requires a changefeed on its endpoint"
                )
            pos_file = f"{self.store.path}/checkpoints/{self.spec.task_id}.position"
            if os.path.exists(pos_file):
                with open(pos_file) as f:
                    position = int(f.read().strip())  # resume: snapshot done
                # cross-process restart: the position survives on disk but
                # the materializer manifest is in-memory — restore it from
                # its persisted transaction-log tip, else CDC applies onto
                # empty state and queries silently lose pre-restart rows;
                # a pre-manifest workdir falls back to re-materializing the
                # baseline from the source (CDC after `position` re-applies
                # idempotently: last-change-per-pk upserts)
                if self.materializer is not None:
                    restored = self.materializer.restore()
                    if not restored and not self.materializer._buckets:
                        for s, t in select_tables(
                            self.catalog.list_tables(self.spec.source),
                            self.spec.rules,
                        ):
                            self.materializer.overwrite(
                                s, t, self.catalog.load(self.spec.source, s, t)
                            )
            else:
                position = self.changefeed.current_position()
                self._full_load_once()
                # the loaded snapshot is the CDC baseline: materialize it so
                # post-snapshot upserts/deletes apply onto queryable state
                if self.materializer is not None:
                    for s, t in select_tables(
                        self.catalog.list_tables(self.spec.source), self.spec.rules
                    ):
                        self.materializer.overwrite(
                            s, t, self.catalog.load(self.spec.source, s, t)
                        )
                os.makedirs(os.path.dirname(pos_file), exist_ok=True)
                with open(pos_file, "w") as f:
                    f.write(str(position))
            # flag-check + query start are ATOMIC under the lock: without
            # it, stop() could set the flag between the check and
            # _start_cdc(), see _query still None, report STOPPED, and the
            # thread would then start an unstoppable query behind it.
            # stop() reads _query under the same lock, so it either runs
            # before this block (we see the flag and never start) or after
            # it (it sees the started query and stops it).
            with self._lock:
                if self._stop_requested.is_set():
                    self.status = STOPPED  # stop() arrived during the snapshot
                    return
                self._start_cdc(after_seq=position)
        except Exception:
            self.error = traceback.format_exc()
            self.status = FAILED

    # -- CDC (S2) -------------------------------------------------------------
    def _start_cdc(self, after_seq: int = 0) -> None:
        if self.changefeed is None:
            raise RuntimeError("CDC task requires a changefeed on its endpoint")
        import os

        checkpoint = f"{self.store.path}/checkpoints/{self.spec.task_id}"
        # the registry is session-scoped: (re)register the exceptions-table
        # schema on every start so conflict recording works after restarts
        self._ensure_exceptions_registered()
        # bootstrap control event only on FIRST start — a checkpointed
        # restart resumes the stream, it doesn't re-create the exceptions
        # table (T7); DMS likewise bootstraps once per task
        if not os.path.exists(checkpoint):
            self._emit_exceptions_bootstrap()
        stream = self.changefeed.read_stream(self.spec.rules)
        if after_seq:
            # binlog-position handoff (full-load-and-cdc): pre-snapshot
            # changes are already reflected in the loaded state
            stream = stream.filter(F.col("seq") > after_seq)
        def process(batch_df, epoch_id: int) -> None:
            if batch_df.isEmpty():
                return
            batch_df = batch_df.persist()
            # fresh per batch (cheap driver dict): a table registered after
            # task start routes by its real pk instead of falling back
            pk_by_table = self._pk_lookup()
            env = encode_change_batch(batch_df, self.spec.settings, pk_by_table).persist()
            try:
                # effects-before-visibility: registry evolution and table
                # materialization land BEFORE the events appear in the
                # stream, so a consumer that has seen an event can rely on
                # its side effects being queryable (consume-then-query is
                # race-free)
                excs = self._apply_ddl(batch_df)
                if self.materializer is not None:
                    excs += self._apply_changes_around_drops(batch_df)
                if excs:
                    self._record_apply_exceptions(excs)
                self.store.append_envelopes(env)
                self.stats.record_batch(self.spec.task_id, env)
            finally:
                env.unpersist()
                batch_df.unpersist()

        self._query = (
            stream.writeStream.foreachBatch(process)
            .option("checkpointLocation", checkpoint)
            .trigger(processingTime="500 milliseconds")
            .start()
        )
        self.status = RUNNING

    def _refresh_status(self) -> None:
        """Reconcile ``status`` with the streaming query's liveness: a query
        killed by an executor/driver exception would otherwise leave the
        task claiming ``running`` forever (stop() nulls ``_query`` before
        setting stopped, so a clean stop never reaches this path)."""
        q = self._query
        if q is None or self.status != RUNNING:
            return
        try:
            if q.isActive:
                return
            exc = q.exception()
        except Exception:
            return
        if exc is not None:
            self.error = str(exc)
            self.status = FAILED
        else:
            self.status = STOPPED

    def _apply_changes_around_drops(self, batch_df) -> list[dict]:
        """Apply data changes and drop-table truncations in COMMIT (seq)
        order: a drop truncates only the changes that precede it, and
        changes after the drop (a re-created table) land on the truncated
        state. Drop-free batches — the overwhelming case — apply in one
        call. Truncating before ALL data changes regardless of seq (the
        previous shape) resurrected pre-drop inserts onto a table the
        source had emptied."""
        drops = (
            batch_df.filter(F.col("op") == "drop-table")
            .select("schema", "table", "seq")
            .orderBy("seq")
            .collect()
        )
        if not drops:
            return self.materializer.apply_change_batch(batch_df)
        excs: list[dict] = []
        prev = None
        for d in drops:
            seg = batch_df.filter(
                (F.col("seq") <= d["seq"])
                if prev is None
                else ((F.col("seq") > prev) & (F.col("seq") <= d["seq"]))
            )
            excs += self.materializer.apply_change_batch(seg)
            if self.materializer.exists(d["schema"], d["table"]):
                self.materializer.truncate(d["schema"], d["table"])
            prev = d["seq"]
        excs += self.materializer.apply_change_batch(
            batch_df.filter(F.col("seq") > prev)
        )
        return excs

    def _pk_lookup(self) -> dict[tuple[str, str], str]:
        # snapshot under the registry's own lock: concurrent register()
        # from another task/thread must not blow up the dict iteration
        lock = getattr(self.registry, "_lock", None)
        tables = getattr(self.registry, "_tables", {})
        if lock is not None:
            with lock:
                return {k: td.primary_key for k, td in tables.items()}
        return {k: td.primary_key for k, td in tables.items()}

    def _emit_exceptions_bootstrap(self) -> None:
        """Exception-table bootstrap control event at CDC task start (T7):
        the reference expects one ``awsdms_apply_exceptions`` create per CDC
        task ("2 create apply_dms_exception" for two tasks, run.py:296-297).
        """
        env = control_events(
            self.spark,
            [(self.default_schema, EXCEPTIONS_TABLE, "create-table")],
            self.spec.settings,
        ).withColumn("_order", F.col("_order").cast("long"))
        self.store.append_envelopes(env)
        self.stats.record_counts(
            self.spec.task_id, self.default_schema, EXCEPTIONS_TABLE, "create-table", 1
        )

    def _ensure_exceptions_registered(self) -> None:
        """Register the exceptions-table schema so apply conflicts are
        QUERYABLE over SQL, the way DMS materializes them on the target."""
        try:
            self.registry.get(self.default_schema, EXCEPTIONS_TABLE)
        except KeyError:
            from sample_dms_kinesis_rds_mariadb_spark.streaming.schema_evolution import (
                TableDef,
            )

            self.registry.register(
                TableDef(
                    schema_name=self.default_schema,
                    table_name=EXCEPTIONS_TABLE,
                    struct=_exceptions_struct(),
                    primary_key="exception_id",
                )
            )

    def _record_apply_exceptions(self, excs: list[dict]) -> None:
        """Persist apply conflicts into ``awsdms_apply_exceptions`` (DMS
        semantics: a failing change never kills the task; it lands in the
        exceptions table for inspection). Bounded, rare, control-plane-sized
        writes."""
        import time as _time
        from datetime import datetime, timezone

        if self.materializer is None:
            return
        now = datetime.now(timezone.utc)
        rows = [
            {
                "exception_id": _time.time_ns() + i,
                "task_name": self.spec.task_id,
                "table_owner": e["schema_name"],
                "table_name": e["table_name"],
                "error_time": now,
                "statement": e["statement"],
                "error": e["error"],
            }
            for i, e in enumerate(excs)
        ]
        self.materializer.append_rows(self.default_schema, EXCEPTIONS_TABLE, rows)

    def _apply_ddl(self, batch_df) -> list[dict]:
        """Registry-side schema evolution (T5); bounded collect — DDL events
        are rare control records, never row-volume. Per-statement fault
        isolation, like data applies: a malformed/unknown-table DDL lands
        in the exceptions table instead of killing the streaming query
        (drop-table truncation happens seq-interleaved with data changes —
        see :meth:`_apply_changes_around_drops`)."""
        ddls = (
            batch_df.filter(F.col("op") == "alter-table")
            .select("schema", "table", "ddl.*", "seq")
            .orderBy("seq")
            .collect()
        )
        excs: list[dict] = []
        for r in ddls:
            try:
                self.registry.apply_ddl(
                    r["schema"],
                    r["table"],
                    action=r["action"],
                    column=r["column"],
                    new_type=r["type"],
                    default=r["default"],
                )
            except Exception as exc:  # noqa: BLE001 — isolate per statement
                excs.append(
                    {
                        "schema_name": r["schema"],
                        "table_name": r["table"],
                        "statement": f"alter-table {r['action']} {r['column']}",
                        "error": f"{type(exc).__name__}: {exc}",
                    }
                )
        return excs


class PollingReplicationTask(ReplicationTask):
    """A CDC task whose source is a :class:`~...jdbc_poll.JdbcPollingCapture`
    run as a FIRST-CLASS task, not a manual pump loop: the reference's task
    state machine (start-replication → running → stop-replication,
    run.py:140-165) wrapped around polling capture (SURVEY §2.1 S2b).

    ``capture`` is duck-typed — anything with ``pump(feed) -> int`` and its
    own persistence qualifies: :class:`~...jdbc_poll.JdbcPollingCapture`,
    a :class:`~...jdbc_poll.PollCycleCoordinator` (multi-table cycles), or
    a :class:`~...binlog.BinlogTail` (a binlog FILE chain as a first-class
    CDC task — the reference's actual wire format under the same
    lifecycle).

    Composition: a daemon pumper thread calls ``capture.pump(changefeed)``
    every ``poll_interval`` seconds (the capture-agent role Debezium/DMS run
    as a dedicated process), while the inherited CDC streaming query
    consumes the feed — envelope encode, statistics, registry evolution
    (the capture's DDL control events), materialized apply all ride the
    same machinery as binlog-fed tasks.

    Lifecycle guarantees:
    - ``start()`` reaches RUNNING only after the streaming query is live;
      the pumper starts after it, so the first pump's events are consumed
      by a running stream.
    - ``stop()`` signals the pumper, JOINS it (an in-flight pump completes
      and its events are drained — no straggler pump can append after the
      stream stops), then drains + stops the query (stop-after-commit).
    - a pump exception lands the task in FAILED with the traceback in
      ``error`` (the scheduler-visible failure the reference polls for);
      the capture's own state persistence (``state_path``) makes a
      restarted task resume from the saved high-water mark instead of
      re-snapshotting.
    """

    def __init__(self, *args, capture, poll_interval: float = 1.0, **kwargs):
        super().__init__(*args, **kwargs)
        if self.changefeed is None:
            raise ValueError("PollingReplicationTask requires a changefeed")
        self.capture = capture
        self.poll_interval = poll_interval
        self.polls = 0  # completed pump count (observable by tests/monitors)
        self._pump_thread: threading.Thread | None = None
        self._pump_stop = threading.Event()

    def start(self) -> None:
        with self._lock:
            if self.status in (STARTING, RUNNING):
                raise RuntimeError(
                    f"task {self.spec.task_id} already {self.status}"
                )
            self.status = STARTING
            self._stop_requested.clear()
            self._pump_stop.clear()
        # cross-process restart: reload materialized state before the
        # stream resumes (same contract as the pure-CDC start path)
        if self.materializer is not None:
            self.materializer.restore()
        with self._lock:
            if self._stop_requested.is_set():
                self.status = STOPPED
                return
            self._start_cdc()
        # pumper starts AFTER the query: its first append is consumed by a
        # live stream. A stop() racing this point has already set
        # _pump_stop, so the loop exits before its first pump.
        self._pump_thread = threading.Thread(target=self._pump_loop, daemon=True)
        self._pump_thread.start()

    def _pump_loop(self) -> None:
        try:
            while not self._pump_stop.is_set():
                self.capture.pump(self.changefeed)
                self.polls += 1
                self._pump_stop.wait(self.poll_interval)
        except Exception:
            self.error = traceback.format_exc()
            self.status = FAILED

    def stop(self) -> None:
        # order matters: pumper signalled AND JOINED before the query
        # drains, so every appended change is consumed and no pump runs
        # after STOPPED is reported
        self._pump_stop.set()
        t = self._pump_thread
        if t is not None:
            t.join()
            self._pump_thread = None
        super().stop()
