"""Capture the connected_components ROUND-BODY physical plan, before vs
after the r13 self-loop restructure, into plans/r13/.

The operator's public return value is a checkpointed frame whose plan is
just an RDD scan, so the round-body plan — where the r13 change lives —
is reconstructed here verbatim from the two shapes of
operators/dedup.py's loop (the before body from commit f722093, the
after body from HEAD) over the same tiny checkpointed fixtures. The
files are evidence of the per-round operator shape: the before plan
carries TWO joins (neighbor-min + labels left join) plus the jump
self-join; the after plan carries ONE join plus the jump self-join.

Usage: python tools/capture_cc_round_plans.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sample_dms_kinesis_rds_mariadb_spark.session import get_session


def main() -> None:
    spark = get_session(app_name="cc-round-plans")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r13",
    )
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 40, 2)], "id_a long, id_b long"
    )
    both = pairs.select(
        F.col("id_a").alias("u"), F.col("id_b").alias("v")
    ).union(pairs.select(F.col("id_b").alias("u"), F.col("id_a").alias("v")))
    plain = both.distinct().localCheckpoint(eager=True)
    labels = (
        plain.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )

    # ---- BEFORE (f722093 dedup.py:768-811): neighbor-min join + labels
    # left join + jump self-join
    edges_b = plain
    propagated = (
        edges_b.join(labels, edges_b["v"] == labels["node"])
        .groupBy(F.col("u").alias("node"))
        .agg(F.min("label").alias("nbr_min"))
    )
    stepped_b = labels.join(propagated, "node", "left").select(
        "node",
        F.col("label").alias("_old"),
        F.least(
            F.col("label"), F.coalesce("nbr_min", F.col("label"))
        ).alias("_mid"),
    )
    parent_b = stepped_b.select(
        F.col("node").alias("_p_node"), F.col("_mid").alias("_p_label")
    )
    round_before = (
        stepped_b.join(parent_b, stepped_b["_mid"] == parent_b["_p_node"],
                       "left")
        .select(
            "node",
            F.col("_old"),
            F.least(
                F.col("_mid"), F.coalesce(F.col("_p_label"), F.col("_mid"))
            ).alias("label"),
        )
        .select("node", "label")
    )

    # ---- AFTER (HEAD dedup.py): self-loop edges, ONE join + agg
    # carries both _mid and _old, then the jump self-join; on the
    # small-graph path (node count <= broadcast_nodes) the labels and
    # parent sides ship as broadcast relations, so the round is
    # exchange-free except the min-aggregate
    edges_a = plain.union(
        labels.select(F.col("node").alias("u"), F.col("node").alias("v"))
    ).localCheckpoint(eager=True)
    lab_a = F.broadcast(labels)
    stepped_a = (
        edges_a.join(lab_a, edges_a["v"] == lab_a["node"])
        .groupBy(F.col("u").alias("node"))
        .agg(
            F.min("label").alias("_mid"),
            F.max(
                F.when(F.col("v") == F.col("u"), F.col("label"))
            ).alias("_old"),
        )
    )
    parent_a = F.broadcast(stepped_a.select(
        F.col("node").alias("_p_node"), F.col("_mid").alias("_p_label")
    ))
    round_after = (
        stepped_a.join(parent_a, stepped_a["_mid"] == parent_a["_p_node"],
                       "left")
        .select(
            "node",
            F.col("_old"),
            F.least(
                F.col("_mid"), F.coalesce(F.col("_p_label"), F.col("_mid"))
            ).alias("label"),
        )
        .select("node", "label")
    )

    for name, frame in (
        ("connected_components_round_before", round_before),
        ("connected_components_round_after", round_after),
    ):
        plan = frame._sc._jvm.PythonSQLUtils.explainString(
            frame._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(plan)
        n_joins = plan.count("Join")
        print(name, "joins-in-plan:", n_joins)
    spark.stop()


if __name__ == "__main__":
    main()
