"""Dim-crossover sweep for the PAIR cosine kernels (r14): at which
vector dimension does the Arrow pair-dot kernel beat the interpreted
JVM fold at a bench-like (small-batch) pair volume?

Synthesizes 2000 deterministic vectors per dim, runs the SemDeDup pair
shape (32 medoid clusters → ~60k-125k pairs) and the hard-negatives
shape under both arms, interleaved in one session.

Usage: python tools/ab_dim_sweep.py [dim ...]    (default 64 256 768)
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
    dims = [int(x) for x in sys.argv[1:]] or [64, 256, 768]
    sweeps = int(os.environ.get("SPARK_GRAFT_AB_SWEEPS", "3"))

    from pyspark.sql import functions as F

    from sample_dms_kinesis_rds_mariadb_spark.functions import vectors as _vec
    from sample_dms_kinesis_rds_mariadb_spark.operators import (
        similarity as _sim,
    )
    from sample_dms_kinesis_rds_mariadb_spark.session import get_session

    spark = get_session(app_name="ab-dim-sweep")
    loadavg = list(os.getloadavg())
    spark.range(1000).selectExpr("sum(id)").collect()
    t0 = time.perf_counter()
    spark.range(200_000_000).selectExpr("sum(id * id % 1000)").collect()
    calibration_sec = round(time.perf_counter() - t0, 3)
    par = spark.sparkContext.defaultParallelism

    def _noop(df) -> None:
        df.write.mode("overwrite").format("noop").save()

    def synth(dim: int):
        # deterministic pseudo-embeddings: sin over (id, j) — dense,
        # non-degenerate, same cost shape as real vectors
        return (
            spark.range(2000)
            .select(
                F.col("id").alias("vec_id"),
                F.expr(
                    f"transform(sequence(0, {dim - 1}), "
                    f"j -> sin(cast(id * {dim} + j AS DOUBLE) * 0.7))"
                ).alias("embedding"),
            )
            .repartition(par)
            .localCheckpoint(eager=True)
        )

    results: dict[str, dict[str, list[float]]] = {}
    for dim in dims:
        emb = synth(dim)
        cents = _sim.medoid_centroids(emb, list(range(0, 320, 10)))

        def leg_sem():
            _noop(
                _sim.semantic_dedup_pairs(emb, threshold=0.2, centroids=cents)
            )

        def leg_hn():
            _noop(
                _sim.hard_negatives(
                    emb.withColumn(
                        "label", (F.col("vec_id") % 2).cast("int")
                    ),
                    k=5,
                    id_col="vec_id",
                    dim=dim,
                )
            )

        for lname, fn in (("sem", leg_sem), ("hn", leg_hn)):
            key = f"{lname}_d{dim}"
            results[key] = {"on": [], "off": []}
            for sweep in range(sweeps):
                arms = (
                    ("on", "off") if sweep % 2 == 0 else ("off", "on")
                )
                for arm in arms:
                    # force the pair kernel on/off regardless of the dim
                    # gate so the sweep measures the two executions
                    _vec.COSINE_ARROW = arm == "on"
                    saved = getattr(_vec, "PAIR_ARROW_MIN_DIM", None)
                    if saved is not None:
                        _vec.PAIR_ARROW_MIN_DIM = 0
                    spark.sparkContext.setJobDescription(
                        f"ab:dim:{key}:{arm}:{sweep}"
                    )
                    t0 = time.perf_counter()
                    fn()
                    results[key][arm].append(
                        round(time.perf_counter() - t0, 3)
                    )
                    spark.sparkContext.setJobDescription(None)
                    if saved is not None:
                        _vec.PAIR_ARROW_MIN_DIM = saved
    _vec.COSINE_ARROW = True

    rec = {
        "toggle": "pair_dim_sweep",
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
