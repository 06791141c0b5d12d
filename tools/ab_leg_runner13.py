"""One arm of the r13 interleaved A/B protocol (VERDICT r12 item 1):
run the six legs where the driver's BENCH_r12 artifact read >=1.5x its
r11 value, in a FRESH SparkSession against the repo checkout given as
argv[1], print one JSON line. The orchestrator alternates HEAD and the
r11 worktree (commit c74fcf9) so box drift hits both arms equally —
the pairing, not the absolute numbers, is the comparison currency.

Legs: q5_region_volume (4.2x), dedup_minhash_lsh (3.5x), dedup_exact
(3.7x), semantic_dedup (1.6x), simhash_dedup (2.0x),
connected_components_minhash (1.8x). Each invocation also times the
fixed-work calibration probe so readings can be cross-referenced
against the run's host state (with the r11 caveat of record: the probe
tracks CPU clock, not IO/steal contention — pairing is the currency).

Usage: python tools/ab_leg_runner13.py <repo_dir> [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    repo = os.path.abspath(sys.argv[1])
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    sys.path.insert(0, repo)

    from sample_dms_kinesis_rds_mariadb_spark.plans import (  # noqa: F401
        llm_queries as _llm,  # registers the LLM-pipeline catalog entries
    )
    from sample_dms_kinesis_rds_mariadb_spark.plans import queries as _q
    from sample_dms_kinesis_rds_mariadb_spark.session import (
        get_session,
        widen_small_input,
    )

    spark = get_session(app_name="ab13-bench")
    loadavg = list(os.getloadavg())

    spark.range(1000).selectExpr("sum(id)").collect()
    t0 = time.perf_counter()
    spark.range(200_000_000).selectExpr("sum(id * id % 1000)").collect()
    calibration_sec = round(time.perf_counter() - t0, 3)
    _q.load_table(spark, sf_dir, "region").count()

    timings: dict[str, float] = {}

    for name in (
        "q5_region_volume",
        "dedup_exact",
        "dedup_minhash_lsh",
        "simhash_dedup",
        "semantic_dedup",
    ):
        spec = _q.QUERIES[name]
        t0 = time.perf_counter()
        spec.spark_fn(spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        timings[name] = round(time.perf_counter() - t0, 3)

    from sample_dms_kinesis_rds_mariadb_spark.operators.dedup import (
        connected_components,
        minhash_lsh_candidate_pairs,
    )

    _docs = widen_small_input(_q.load_table(spark, sf_dir, "documents"))
    t0 = time.perf_counter()
    connected_components(
        minhash_lsh_candidate_pairs(_docs, "doc_id", "text")
    ).write.mode("overwrite").format("noop").save()
    timings["connected_components_minhash"] = round(
        time.perf_counter() - t0, 3
    )

    print(json.dumps({
        "repo": repo,
        "sf_dir": sf_dir,
        "calibration_sec": calibration_sec,
        "loadavg_start": loadavg,
        "loadavg_end": list(os.getloadavg()),
        "timings": timings,
    }, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
