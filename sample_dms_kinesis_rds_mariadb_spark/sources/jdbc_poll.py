"""Query-based incremental CDC over JDBC — the standard capture fallback
when binlog access is unavailable (managed databases without replication
privileges, or non-MySQL JDBC sources).

The reference's CDC tasks tail the MariaDB binlog (ROW/Full images,
``dms_sample/stack.py:372-376``); in environments where that is not
grantable, every replication product falls back to polling: select rows
whose monotonically-nondecreasing CURSOR column (an ``updated_at``
timestamp, a version counter, an auto-increment id) advanced past the last
high-water mark. ``JdbcPollingCapture`` implements that capture and PUMPS
the increments into a :class:`~...changefeed.ChangeFeed` — from there the
engine's entire CDC machinery (streaming tasks, envelope encode, apply,
statistics, before-image state) consumes them unchanged.

Documented limits of polling capture, inherent to the technique:
- **no deletes** (a vanished row never appears in a cursor query; pair with
  soft-delete columns or periodic reconciliation),
- **no intermediate versions** (two updates between polls capture once),
- **cursor discipline** (rows must bump the cursor on change; rows sharing
  the boundary cursor value are handled by the re-read + fingerprint skip
  below, never lost and never re-delivered).

Scale shape: the cursor predicate pushes into the JDBC WHERE clause
(``PushedFilters`` on the JDBC relation), so each poll transfers only the
increment. The pump's driver hop is increment-sized — the capture agent
role here is what Debezium/DMS run as a dedicated process; at 100 TB the
corpus never routes through this path, only the change trickle does.
"""

from __future__ import annotations

import json
from datetime import datetime, timezone

from pyspark.sql import functions as F

from sample_dms_kinesis_rds_mariadb_spark.sources.changefeed import ChangeFeed


class JdbcPollingCapture:
    """Capture agent for one (schema, table) over a registered JDBC
    endpoint (``catalog.SourceCatalog``). Call :meth:`pump` on a schedule;
    each call appends one increment to the feed and advances the
    high-water mark.

    ``initial``: ``"snapshot"`` emits every existing row as op
    ``insert`` on the first pump (initial-load semantics); ``"now"``
    starts the mark at the current maximum and captures only subsequent
    changes.
    """

    def __init__(
        self,
        catalog,
        endpoint: str,
        schema: str,
        table: str,
        cursor_col: str,
        initial: str = "snapshot",
    ) -> None:
        if initial not in ("snapshot", "now"):
            raise ValueError(f"initial must be 'snapshot' or 'now', got {initial!r}")
        self.catalog = catalog
        self.endpoint = endpoint
        self.schema = schema
        self.table = table
        self.cursor_col = cursor_col
        self._hwm = None
        # fingerprints of rows already delivered AT the high-water mark —
        # bounded by the rows sharing one cursor value. The re-read of the
        # inclusive boundary plus this skip gives exactly-once capture even
        # for coarse cursors (second-granularity timestamps where more rows
        # can commit at the mark after a poll read it).
        self._boundary_fps: frozenset = frozenset()
        self._initial = initial
        self._started = False

    @staticmethod
    def _fingerprint(data: dict) -> str:
        return json.dumps(data, sort_keys=True, default=str)

    def pump(self, feed: ChangeFeed) -> int:
        """One poll: capture rows with cursor >= high-water mark (first
        call follows ``initial``), skipping boundary rows already
        delivered; advance the mark; return rows captured. Rows are
        captured in cursor order so ``seq`` assignment preserves commit
        order between polls. Each captured row carries its full image as
        ``data`` (op ``update`` after the initial snapshot — polling
        cannot distinguish insert from update; the applier's per-PK
        upsert makes the distinction immaterial for state)."""
        df = self._load()
        first = not self._started
        self._started = True
        if first and self._initial == "now":
            row = df.agg(F.max(self.cursor_col)).first()
            self._hwm = row[0]
            if self._hwm is not None:
                # rows AT the mark count as already seen, or the next
                # poll's inclusive boundary re-read would deliver history
                self._boundary_fps = frozenset(
                    self._fingerprint(
                        {
                            k: (None if v is None else str(v))
                            for k, v in r.asDict().items()
                        }
                    )
                    for r in df.filter(
                        F.col(self.cursor_col) == F.lit(self._hwm)
                    ).collect()
                )
            return 0
        if self._hwm is not None:
            df = df.filter(F.col(self.cursor_col) >= F.lit(self._hwm))
        rows = df.orderBy(self.cursor_col).collect()  # increment-sized hop
        op = "insert" if first and self._initial == "snapshot" else "update"
        now = datetime.now(timezone.utc).strftime("%Y-%m-%dT%H:%M:%S")
        changes = []
        for r in rows:
            d = r.asDict()
            data = {k: (None if v is None else str(v)) for k, v in d.items()}
            fp = self._fingerprint(data)
            if d[self.cursor_col] == self._hwm and fp in self._boundary_fps:
                continue  # boundary row from the previous poll
            changes.append(
                {
                    "schema": self.schema,
                    "table": self.table,
                    "op": op,
                    "txn_id": f"poll-{self.cursor_col}-{d[self.cursor_col]}",
                    "commit_ts": now,
                    "data": data,
                    "before": None,
                }
            )
        cursors = [r[self.cursor_col] for r in rows if r[self.cursor_col] is not None]
        if cursors:
            new_hwm = max(cursors)
            carried = (
                self._boundary_fps if new_hwm == self._hwm else frozenset()
            )
            self._boundary_fps = carried | frozenset(
                self._fingerprint(
                    {k: (None if v is None else str(v)) for k, v in r.asDict().items()}
                )
                for r in rows
                if r[self.cursor_col] == new_hwm
            )
            self._hwm = new_hwm
        if changes:
            feed.append_changes(changes)
        return len(changes)

    def _load(self):
        return self.catalog.load(self.endpoint, self.schema, self.table)
