"""Temporal analytics over the event stream: as-of enrichment, incident
range-joins, and gap-based sessionization — the three standard time-join
shapes over an arrival-ordered stream (the same surface the reference's
consumer reads in order, run.py:175-188), each in its scale-safe form.

Run: python examples/temporal_analytics.py  [sf_dir, default sf0.001]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sample_dms_kinesis_rds_mariadb_spark.operators.joins import (
    asof_join,
    asof_join_broadcast,
    asof_join_epoched,
    range_join,
)
from sample_dms_kinesis_rds_mariadb_spark.plans.queries import load_table
from sample_dms_kinesis_rds_mariadb_spark.session import get_session


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_session(app_name="temporal-demo")
    e = load_table(spark, sf_dir, "events")

    # 1. as-of: each click enriched with the user's latest preceding purchase
    clicks = e.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("value"))
    )
    enriched = asof_join(clicks, purchases, on="user_id", ts="ts", tolerance_seconds=7 * 86400)
    with_state = enriched.filter(F.col("asof").isNotNull()).count()
    print(f"as-of: {with_state}/{enriched.count()} clicks have a purchase in the prior 7 days")

    # skew-resistant variant (hot users): identical semantics, (key, epoch) windows
    epoched = asof_join_epoched(
        clicks, purchases, on="user_id", ts="ts",
        tolerance_seconds=7 * 86400, epoch_seconds=86400,
    )
    assert epoched.filter(F.col("asof").isNotNull()).count() == with_state

    # zero-probe-shuffle variant (small dimension history): build side
    # collapses to per-key sorted arrays and broadcasts — the clicks never
    # exchange. Same semantics, pick by build-side size.
    broadcasted = asof_join_broadcast(
        clicks, purchases, on="user_id", ts="ts", tolerance_seconds=7 * 86400
    )
    assert broadcasted.filter(F.col("asof").isNotNull()).count() == with_state

    # 2. range join: clicks falling inside 5-minute error-incident windows
    incidents = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("incident_id"),
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("end_ts"),
    )
    hits = range_join(
        clicks.select("ts"), incidents, ts="ts", start="start_ts", end="end_ts",
        bucket_seconds=300,
    )
    print(f"range: {hits.count()} clicks landed inside an error window")

    # 3. sessions: 30-minute-gap session windows per user (batch mode of the
    # Structured Streaming session operator)
    sess = (
        e.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count("*").alias("n"))
    )
    stats = sess.agg(
        F.count("*").alias("sessions"),
        F.round(F.avg("n"), 2).alias("avg_events"),
        F.max("n").alias("max_events"),
    ).first()
    print(
        f"sessions: {stats['sessions']} total, avg {stats['avg_events']} "
        f"events, busiest {stats['max_events']}"
    )

    # 4. SCD2: treat each user's purchases as value changes and build the
    # versioned dimension — then a point-in-time snapshot, the warehouse
    # dual of the per-probe as-of in step 1
    from sample_dms_kinesis_rds_mariadb_spark.operators.scd import (
        scd2_history,
        snapshot_at,
    )

    hist = scd2_history(
        purchases.select("user_id", "ts", "value"), "user_id", ts_col="ts"
    )
    mid = e.agg(F.min("ts") + (F.max("ts") - F.min("ts")) / 2).first()[0]
    snap = snapshot_at(hist, mid)
    print(
        f"scd2: {hist.count()} versions across "
        f"{hist.select('user_id').distinct().count()} users; "
        f"{snap.count()} users had purchase state as of {mid}"
    )
    print("done.")


if __name__ == "__main__":
    main()
