"""Streaming as-of enrichment — the streaming dual of the batch SCD2 time
travel (``operators.joins.asof_join`` over the CDC envelope history,
tests/test_joins.py::test_asof_time_travel_over_cdc_history).

The reference pipeline's consumer reads ordered CDC events (reference
run.py:175-188); enriching each event with the latest preceding dimension
state is the standard continuous companion. Spark's stream-stream join can't
express "latest build row at or before the probe timestamp" against mutable
table state (interval joins need two watermarked streams and bounded time
ranges), so the engine runs the enrichment as a ``foreachBatch`` stage:

- probe side = the micro-batch (bounded, arrives every trigger);
- build side = a SNAPSHOT supplier evaluated at batch time — e.g.
  ``lambda: materializer.table(schema, table)`` over the engine's replicated
  state (``TableMaterializer`` publishes versioned buckets, so a plan built
  at batch start reads a consistent version even while CDC applies land);
- the join itself is :func:`~..operators.joins.asof_join`'s union+window
  formulation — per trigger the shuffle carries |micro-batch| + |snapshot|
  rows keyed on ``on``, no join explosion, so cost scales with trigger size
  and snapshot size, never with stream history.

This is the stream-static pattern (re-resolved per micro-batch) rather than
a stateful stream-stream operator: the build side is authoritative mutable
table state, not a second event stream, and snapshot-per-batch gives exactly
the read-committed semantics a dimension lookup wants.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sample_dms_kinesis_rds_mariadb_spark.operators.joins import asof_join


def asof_enrich_stage(
    build_supplier: Callable[[], DataFrame],
    sink: Callable[[DataFrame, int], None],
    *,
    on: str | list[str],
    ts: str = "ts",
    build_ts: str | None = None,
    tolerance_seconds: float | None = None,
    tie_break: str | None = None,
    direction: str = "backward",
) -> Callable[[DataFrame, int], None]:
    """Build a ``foreachBatch`` handler that as-of enriches every micro-batch.

    ``build_supplier`` is called once per trigger so the enrichment always
    sees the CURRENT build-side state (a materialized table keeps evolving
    under CDC); ``sink`` receives the enriched DataFrame (probe columns plus
    the ``asof`` struct) and the batch id — write it, append it to a stream
    store, or chain another stage. All as-of parameters match
    :func:`~..operators.joins.asof_join` exactly, and the per-batch result is
    row-equal to running the batch operator over the same probe rows and the
    same snapshot (tested in tests/test_streaming.py).

    Usage::

        q = (events.writeStream
             .foreachBatch(asof_enrich_stage(
                 lambda: mat.table("db", "prices"),
                 lambda df, _id: df.write.mode("append").parquet(out),
                 on="k", ts="event_ts", build_ts="effective_ts"))
             .start())
    """

    def stage(batch_df: DataFrame, batch_id: int) -> None:
        enriched = asof_join(
            batch_df,
            build_supplier(),
            on=on,
            ts=ts,
            build_ts=build_ts,
            tolerance_seconds=tolerance_seconds,
            tie_break=tie_break,
            direction=direction,
        )
        sink(enriched, batch_id)

    return stage


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    *,
    left_ts: str,
    right_ts: str,
    lower_seconds: float = 0.0,
    upper_seconds: float = 900.0,
    watermark_seconds: float = 60.0,
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream interval join — correlate two LIVE event
    feeds where the right event must land within
    ``[left_ts + lower_seconds, left_ts + upper_seconds]`` of its left
    partner (click→purchase attribution, request→response pairing, CDC
    event↔audit-log correlation).

    This is the true stream-stream operator, complementary to
    :func:`asof_enrich_stage`: the as-of stage probes authoritative TABLE
    state per micro-batch, while this joins two unbounded STREAMS with
    bounded mutual wait. Both inputs get event-time watermarks and the join
    condition carries the explicit time range — exactly the two conditions
    Spark's state store needs to evict buffered rows, so state is bounded
    by ``watermark + upper_seconds`` of stream history per key regardless
    of how long the query runs (without them Spark buffers both streams
    FOREVER; with them this scales like any keyed shuffle at 1000
    executors).

    ``how``: ``inner`` or ``left_outer`` (unmatched left rows emit with
    NULL right columns once the watermark passes their join window —
    Spark's contract for outer stream-stream joins; expect them only after
    later events advance the clock).

    Column names must not collide across the sides except for ``on``
    (pre-alias as usual). Equality keys keep the shuffle an equi-join;
    the range predicate only bounds state and refines matches.
    """
    if how not in ("inner", "left_outer"):
        raise ValueError(f"how must be inner/left_outer, got {how!r}")
    if upper_seconds < lower_seconds:
        raise ValueError("upper_seconds must be >= lower_seconds")
    keys = [on] if isinstance(on, str) else list(on)
    overlap = (set(left.columns) & set(right.columns)) - set(keys)
    if overlap:
        raise ValueError(f"left/right column collision: {sorted(overlap)}")
    wm = f"{watermark_seconds} seconds"
    l = left.withWatermark(left_ts, wm)
    r = right.withWatermark(right_ts, wm)
    cond = None
    for k in keys:
        eq = l[k] == r[k]
        cond = eq if cond is None else cond & eq
    lo = F.expr(f"INTERVAL {float(lower_seconds)} SECONDS")
    hi = F.expr(f"INTERVAL {float(upper_seconds)} SECONDS")
    cond = (
        cond
        & (r[right_ts] >= l[left_ts] + lo)
        & (r[right_ts] <= l[left_ts] + hi)
    )
    joined = l.join(r, cond, how)
    # de-duplicate the key columns (present on both sides after a raw
    # Column-condition join); keep the left copy, which is non-NULL for
    # every emitted row in both supported join types
    return joined.select(
        *[l[k].alias(k) for k in keys],
        *[c for c in left.columns if c not in keys],
        *[c for c in right.columns if c not in keys],
    )
