"""Interleaved A/B for the CC per-round checkpoint (VERDICT r13 item 6):
checkpoint_rounds=True (materialize `stepped`, one extra job per round)
vs False (jump side recomputes the duplicated subtree) on ring-graph
synthetics at two shapes — the broadcast-path shape and a forced
sort-merge shape (broadcast gate lowered).

Usage: python tools/ab_cc_r14.py [n_nodes ...]   (default 200000)
Env:   SPARK_GRAFT_AB_SWEEPS (default 3)
Appends one JSON line to plans/r14/ab_r14.jsonl and prints it.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sizes = [int(x) for x in sys.argv[1:]] or [200_000]
    sweeps = int(os.environ.get("SPARK_GRAFT_AB_SWEEPS", "3"))

    from pyspark.sql import functions as F

    from sample_dms_kinesis_rds_mariadb_spark.operators.dedup import (
        connected_components,
    )
    from sample_dms_kinesis_rds_mariadb_spark.session import get_session

    spark = get_session(app_name="ab-cc-r14")
    loadavg = list(os.getloadavg())
    spark.range(1000).selectExpr("sum(id)").collect()
    t0 = time.perf_counter()
    spark.range(200_000_000).selectExpr("sum(id * id % 1000)").collect()
    calibration_sec = round(time.perf_counter() - t0, 3)
    par = spark.sparkContext.defaultParallelism

    chain = 200

    def ring(n: int):
        return (
            spark.range(n)
            .select(
                F.col("id").alias("id_a"),
                F.when(
                    F.col("id") % chain == chain - 1,
                    F.col("id") - (chain - 1),
                )
                .otherwise(F.col("id") + 1)
                .alias("id_b"),
            )
            .repartition(par)
            .localCheckpoint(eager=True)
        )

    results: dict[str, dict[str, list[float]]] = {}
    for n in sizes:
        edges = ring(n)
        for mode, bc_nodes in (("bcast", 10_000_000), ("smj", 1)):
            key = f"cc_{mode}_{n}"
            results[key] = {"ckpt": [], "recompute": []}
            for sweep in range(sweeps):
                arms = (
                    ("ckpt", "recompute")
                    if sweep % 2 == 0
                    else ("recompute", "ckpt")
                )
                for arm in arms:
                    spark.sparkContext.setJobDescription(
                        f"ab:cc:{key}:{arm}:{sweep}"
                    )
                    t0 = time.perf_counter()
                    connected_components(
                        edges,
                        broadcast_nodes=bc_nodes,
                        checkpoint_rounds=(arm == "ckpt"),
                    ).write.mode("overwrite").format("noop").save()
                    results[key][arm].append(
                        round(time.perf_counter() - t0, 3)
                    )
                    spark.sparkContext.setJobDescription(None)

    rec = {
        "toggle": "cc_ckpt",
        "chain": chain,
        "calibration_sec": calibration_sec,
        "loadavg": loadavg,
        "sweeps": sweeps,
        "results": results,
    }
    line = json.dumps(rec)
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r14", "ab_r14.jsonl",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "a") as f:
        f.write(line + "\n")
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
