"""One arm of the interleaved A/B protocol (BASELINE.md r5/r10 items):
run the five contested legs in a FRESH SparkSession against the repo
checkout given as argv[1], print one JSON line. The orchestrator
alternates HEAD and the r9 worktree so box drift hits both arms
equally.

Legs (VERDICT r10 item 1): decontaminate_bloom, warc_curation_pipeline,
plus three core legs (q1_pricing_summary, dedup_minhash_lsh,
envelope_full_load). Each invocation also times the fixed-work
calibration probe so readings can be normalized.

Usage: python tools/ab_leg_runner.py <repo_dir> [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
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

    spark = get_session(app_name="ab-bench")
    loadavg = list(os.getloadavg())

    spark.range(1000).selectExpr("sum(id)").collect()
    t0 = time.perf_counter()
    spark.range(200_000_000).selectExpr("sum(id * id % 1000)").collect()
    calibration_sec = round(time.perf_counter() - t0, 3)
    _q.load_table(spark, sf_dir, "region").count()

    timings: dict[str, float] = {}

    for name in ("q1_pricing_summary", "dedup_minhash_lsh",
                 "envelope_full_load"):
        spec = _q.QUERIES[name]
        t0 = time.perf_counter()
        spec.spark_fn(spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        timings[name] = round(time.perf_counter() - t0, 3)

    from pyspark.sql import functions as F

    from sample_dms_kinesis_rds_mariadb_spark.operators.dedup import (
        decontaminate_bloom,
    )

    _docs = widen_small_input(_q.load_table(spark, sf_dir, "documents"))
    _bench_docs = _docs.select(
        F.col("doc_id").alias("bench_id"), F.col("text").alias("btext")
    ).limit(64)
    t0 = time.perf_counter()
    decontaminate_bloom(
        _docs, _bench_docs, "doc_id", "text",
        bench_id_col="bench_id", bench_text_col="btext",
    ).write.mode("overwrite").format("noop").save()
    timings["decontaminate_bloom"] = round(time.perf_counter() - t0, 3)

    from sample_dms_kinesis_rds_mariadb_spark.functions.html import (
        html_to_text,
    )
    from sample_dms_kinesis_rds_mariadb_spark.functions.text import (
        with_gopher_quality_flags,
    )
    from sample_dms_kinesis_rds_mariadb_spark.sources.warc import (
        synthesize_warc_corpus,
        warc_records,
    )

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf_num = float(sf) if sf.replace(".", "").isdigit() else 0.1
    warc_mb = float(os.environ.get("SPARK_GRAFT_WARC_MB", str(1000 * sf_num)))
    warc_dir = tempfile.mkdtemp(prefix="ab-warc-")
    try:
        warc_stats = synthesize_warc_corpus(warc_dir, warc_mb)
        t0 = time.perf_counter()
        warc_bin = (
            spark.read.format("binaryFile")
            .load(warc_dir)
            .select(F.col("path").alias("file_id"), "content")
        )
        _wtext = warc_records(warc_bin).select(
            "file_id", "record_no",
            html_to_text(F.col("html")).alias("text"),
        )
        with_gopher_quality_flags(_wtext, "text").drop("text").write.mode(
            "overwrite"
        ).format("noop").save()
        warc_sec = time.perf_counter() - t0
        timings["warc_curation_pipeline"] = round(warc_sec, 3)
        records_per_sec = round(warc_stats["records"] / warc_sec, 1)
    finally:
        shutil.rmtree(warc_dir, ignore_errors=True)

    print(json.dumps({
        "repo": repo,
        "sf_dir": sf_dir,
        "calibration_sec": calibration_sec,
        "loadavg_start": loadavg,
        "loadavg_end": list(os.getloadavg()),
        "timings": timings,
        "warc_records_per_sec": records_per_sec,
    }, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
