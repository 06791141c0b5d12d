"""Measure the per-task Python-worker fixed cost (VERDICT r13 item 7).

Three questions, one session each:
1. cold-vs-warm: what does the FIRST Arrow job pay (worker fork + numpy/
   pandas import) vs steady state? → justifies (or not) a one-time
   untimed worker pre-warm in bench.py's warm-up region.
2. per-task slope: same rows, more tasks — wall(P) for P partitions;
   the slope is the per-task attach/stream-setup overhead.
3. worker.reuse off: the contrast run showing reuse (the default) is
   already the win.

Usage: python tools/worker_attach_probe.py
Appends one JSON line to plans/r14/ab_r14.jsonl and prints it.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_session(reuse: bool) -> dict:
    import pandas as pd
    from pyspark.sql import SparkSession
    from pyspark.sql.functions import col, pandas_udf

    from sample_dms_kinesis_rds_mariadb_spark.session import get_session

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    spark = get_session(
        app_name=f"worker-probe-reuse-{reuse}",
        extra_conf={"spark.python.worker.reuse": str(reuse).lower()},
    )
    spark.range(1000).selectExpr("sum(id)").collect()

    def ident(s):
        return s

    ident.__annotations__ = {"s": pd.Series, "return": pd.Series}
    u = pandas_udf("long")(ident)

    out: dict = {"reuse": reuse, "runs": {}}
    n_rows = 320_000
    # first Arrow job of the session (cold fork+import), then warm repeats
    for label, parts in (
        ("cold_32", 32),
        ("warm_32a", 32),
        ("warm_32b", 32),
        ("warm_1", 1),
        ("warm_8", 8),
        ("warm_128", 128),
        ("warm_32c", 32),
    ):
        df = spark.range(n_rows).repartition(parts).select(
            u(col("id")).alias("x")
        )
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        out["runs"][label] = round(time.perf_counter() - t0, 3)
    spark.stop()
    return out


def main() -> None:
    loadavg = list(os.getloadavg())
    rec = {
        "toggle": "worker_attach",
        "loadavg": loadavg,
        "sessions": [run_session(True), run_session(False)],
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


if __name__ == "__main__":
    main()
