"""Slowly-changing-dimension (type 2) history from a change feed.

The engine keeps the full CDC envelope history (reference: the Kinesis
stream retains every change event, ``run.py:296-314``); ``TableMaterializer``
(streaming/apply.py) folds it to the LATEST image, and ``asof_join``
(operators/joins.py) answers point-in-time lookups against the raw history.
``scd2_history`` is the third classic consumer: materialize the history as a
versioned dimension table with ``valid_from`` / ``valid_to`` / ``is_current``
— the shape warehouse joins and the ``range_join`` operator expect.

Scale shape: ONE hash exchange on the key columns + a per-key sort
(``lead`` window). No self-join — the naive formulation (join each version
to the next-later version per key) is a corpus² risk under key skew; the
window form shuffles each row exactly once. Delete events close the open
interval without emitting a version row, so a reinserted key starts a new
interval chain with a gap — time travel over the gap correctly finds no row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

RESERVED = ("valid_from", "valid_to", "is_current")


def scd2_history(
    changes: DataFrame,
    key_cols: list[str] | str,
    ts_col: str,
    op_col: str | None = None,
    seq_col: str | None = None,
    delete_ops: tuple[str, ...] = ("delete",),
) -> DataFrame:
    """Build an SCD2 version table from one-row-per-change history.

    ``changes``: key columns + attribute columns + ``ts_col`` (change
    timestamp). With ``op_col``, rows whose op is in ``delete_ops`` close
    the previous version's interval and emit no version themselves; without
    it every row is an upsert. ``seq_col`` breaks timestamp ties (later
    sequence wins the instant; the earlier tied row gets a zero-length
    interval, which point-in-time consumers never select because interval
    membership is ``valid_from <= t < valid_to``).

    Output: attribute columns (``ts_col``/``op_col``/``seq_col`` removed)
    + ``valid_from`` (the change ts), ``valid_to`` (next change ts for the
    key, NULL while open), ``is_current`` (open interval, not deleted).
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    for c in RESERVED:
        if c in changes.columns:
            raise ValueError(f"column collision: input already has '{c}'")
    order = [F.col(ts_col)] + ([F.col(seq_col)] if seq_col else [])
    w = Window.partitionBy(*keys).orderBy(*order)
    # valid_to = the NEXT change of any kind (update or delete) for the key:
    # lead over one per-key sort — deletes participate in the frame (they
    # close intervals) and are dropped from the output afterwards
    versioned = changes.withColumn("valid_to", F.lead(F.col(ts_col)).over(w))
    if op_col is not None:
        # NULL ops are upserts, not deletes: a bare NOT-isin is NULL for a
        # NULL op, and a NULL filter verdict DROPS the row — it would still
        # close the previous version via lead() but emit no version of its
        # own, leaving a silent hole in the key's timeline
        versioned = versioned.filter(
            F.coalesce(~F.col(op_col).isin(*delete_ops), F.lit(True))
        )
    drop = [ts_col] + ([op_col] if op_col else []) + ([seq_col] if seq_col else [])
    return (
        versioned.withColumn("valid_from", F.col(ts_col))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop(*drop)
    )


def snapshot_at(history: DataFrame, ts) -> DataFrame:
    """The dimension as of ``ts``: rows whose interval contains the instant
    (``valid_from <= ts < valid_to``; open intervals extend to +inf). A
    narrow filter over the SCD2 table — no shuffle, and on a store
    partitioned by ``is_current`` the common "current snapshot" probe prunes
    to the open partition."""
    t = F.lit(ts)
    return history.filter(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    ).drop("valid_to", "is_current")


def scd2_join(
    probe: DataFrame,
    history: DataFrame,
    on: list[str] | str,
    ts: str,
    bucket_seconds: int = 86400,
    materialize: bool = True,
) -> DataFrame:
    """Enrich each probe row with the version valid at its timestamp — the
    warehouse fact-to-dimension join against an SCD2 table.

    DO NOT feed an SCD2 table to ``range_join`` directly: its NULL-bound
    drop (correct for malformed intervals) would silently discard every
    OPEN interval — i.e. all CURRENT versions. This helper routes the two
    interval shapes to their cheapest correct plans and unions:

    - **closed intervals** (``valid_to`` set): the time-bucketed
      ``range_join`` equi-join on (key, bucket) — bounded candidates,
      never a nested loop;
    - **open intervals** (``valid_to`` NULL — at most ONE per key, by SCD2
      construction): a plain key equi-join + ``valid_from <= ts`` filter —
      no bucketing needed, since disjointness guarantees at most one
      match.

    Inner-join semantics: probe rows in a coverage gap (key deleted at
    that time, or unknown) are absent — matching ``snapshot_at``, which
    this is the join-shaped dual of. One shuffle per arm; dimension arms
    broadcast when small, like any equi-join.

    ``materialize`` (default True) pins ``history`` with an eager
    localCheckpoint before splitting: the two arms would otherwise each
    re-execute the full upstream lineage — including ``scd2_history``'s
    window shuffle over the raw change stream — doubling the dominant
    cost (same rationale as the dedup self-join pinning,
    operators/dedup.py ``_pin``). Pass False for a fully lazy plan.
    """
    from sample_dms_kinesis_rds_mariadb_spark.operators.joins import range_join

    keys = [on] if isinstance(on, str) else list(on)
    if materialize:
        history = history.localCheckpoint(eager=True)
    closed = history.filter(F.col("valid_to").isNotNull()).drop("is_current")
    open_ = history.filter(F.col("valid_to").isNull()).drop(
        "valid_to", "is_current"
    )
    via_closed = range_join(
        probe,
        closed,
        ts=ts,
        start="valid_from",
        end="valid_to",
        on=keys,
        bucket_seconds=bucket_seconds,
    ).drop("valid_to")
    via_open = probe.join(open_, on=keys, how="inner").filter(
        F.col("valid_from") <= F.col(ts)
    )
    return via_closed.unionByName(via_open)
