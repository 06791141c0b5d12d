"""Interleaved widen-placement A/B for the two sink legs (VERDICT r13
item 3 / what's-wrong item 2): arm "widen" = the r13 bench shape (the
single-file lineitem repartitioned INSIDE the timed leg), arm "raw" =
the pre-r13 shape (single-task map stage). Both sink legs, both arms,
every sweep, alternating order — one session, so a host phase hits all
four cells.

Usage: python tools/ab_sink_r14.py
Env:   SPARK_GRAFT_SF_DIR, SPARK_GRAFT_AB_SWEEPS (default 3)
Appends one JSON line to plans/r14/ab_r14.jsonl and prints it.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sweeps = int(os.environ.get("SPARK_GRAFT_AB_SWEEPS", "3"))

    from pyspark.sql import functions as F

    from sample_dms_kinesis_rds_mariadb_spark.envelope import (
        encode_data_events,
        to_json_records,
    )
    from sample_dms_kinesis_rds_mariadb_spark.plans.queries import load_table
    from sample_dms_kinesis_rds_mariadb_spark.session import (
        get_session,
        widen_small_input,
    )
    from sample_dms_kinesis_rds_mariadb_spark.sinks.stream_sink import (
        StreamStore,
    )
    from sample_dms_kinesis_rds_mariadb_spark.spec import TaskSettings
    from sample_dms_kinesis_rds_mariadb_spark.streaming.cdc import (
        encode_change_batch,
    )

    spark = get_session(app_name="ab-sink-r14")
    loadavg = list(os.getloadavg())
    spark.range(1000).selectExpr("sum(id)").collect()
    t0 = time.perf_counter()
    spark.range(200_000_000).selectExpr("sum(id * id % 1000)").collect()
    calibration_sec = round(time.perf_counter() - t0, 3)

    li_raw = load_table(spark, sf_dir, "lineitem")

    def li_for(arm: str):
        return widen_small_input(li_raw) if arm == "widen" else li_raw

    fl_settings = TaskSettings(partition_key_type="primary-key")
    cdc_settings = TaskSettings(
        before_image=True, partition_key_type="primary-key"
    )

    def full_load_leg(li) -> None:
        tmp = tempfile.mkdtemp(prefix="ab-sink-")
        try:
            store = StreamStore(spark, tmp, shards=32)
            env = encode_data_events(
                li, "main", "lineitem", "load", fl_settings,
                pk_column="l_orderkey",
            )
            store.append(to_json_records(env))
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    def cdc_leg(li) -> None:
        data_map = F.create_map(
            *[
                x
                for c in li.columns
                for x in (F.lit(c), F.col(c).cast("string"))
            ]
        )
        feed = li.select(
            F.monotonically_increasing_id().alias("seq"),
            F.lit("main").alias("schema"),
            F.lit("lineitem").alias("table"),
            F.lit("insert").alias("op"),
            F.concat(
                F.lit("txn-"), (F.col("l_orderkey") % 1000).cast("string")
            ).alias("txn_id"),
            F.lit("2024-01-01T00:00:00").alias("commit_ts"),
            data_map.alias("data"),
            F.lit(None).cast("map<string,string>").alias("before"),
        )
        tmp = tempfile.mkdtemp(prefix="ab-sink-")
        try:
            store = StreamStore(spark, tmp, shards=32)
            env = encode_change_batch(
                feed, cdc_settings, {("main", "lineitem"): "l_orderkey"}
            )
            store.append(to_json_records(env))
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    legs = {
        "full_load_envelope_sink": full_load_leg,
        "cdc_apply_sink": cdc_leg,
    }
    results = {n: {"widen": [], "raw": []} for n in legs}
    for sweep in range(sweeps):
        arms = ("widen", "raw") if sweep % 2 == 0 else ("raw", "widen")
        for name, fn in legs.items():
            for arm in arms:
                spark.sparkContext.setJobDescription(
                    f"ab:sink:{name}:{arm}:{sweep}"
                )
                t0 = time.perf_counter()
                fn(li_for(arm))
                results[name][arm].append(
                    round(time.perf_counter() - t0, 3)
                )
                spark.sparkContext.setJobDescription(None)

    rec = {
        "toggle": "sink_widen",
        "sf_dir": sf_dir,
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
