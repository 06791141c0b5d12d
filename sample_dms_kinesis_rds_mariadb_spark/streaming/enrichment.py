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
