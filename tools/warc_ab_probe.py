"""Interleaved A/B probe for the warc_curation_pipeline leg: times the
exact bench.py leg (binaryFile scan -> warc_records -> html_to_text ->
staged Gopher gate -> noop sink) against the repo checkout given as
argv[1], printing one JSON line. The orchestrating shell alternates
checkouts so host drift hits both arms equally.

Usage: python tools/warc_ab_probe.py <repo_dir>
Env:   SPARK_GRAFT_WARC_MB (default 100), SPARK_GRAFT_PROBE_RUNS (3)
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time


def main() -> None:
    repo = os.path.abspath(sys.argv[1])
    sys.path.insert(0, repo)
    runs = int(os.environ.get("SPARK_GRAFT_PROBE_RUNS", "3"))
    warc_mb = float(os.environ.get("SPARK_GRAFT_WARC_MB", "100"))

    from pyspark.sql import functions as F

    from sample_dms_kinesis_rds_mariadb_spark.functions.html import html_to_text
    from sample_dms_kinesis_rds_mariadb_spark.functions.text import (
        with_gopher_quality_flags,
    )
    from sample_dms_kinesis_rds_mariadb_spark.session import get_session
    from sample_dms_kinesis_rds_mariadb_spark.sources.warc import (
        synthesize_warc_corpus,
        warc_records,
    )

    spark = get_session(app_name="warc-ab-probe")
    loadavg = list(os.getloadavg())
    spark.range(1000).selectExpr("sum(id)").collect()
    t0 = time.perf_counter()
    spark.range(200_000_000).selectExpr("sum(id * id % 1000)").collect()
    calibration_sec = round(time.perf_counter() - t0, 3)

    warc_dir = tempfile.mkdtemp(prefix="warc-ab-")
    try:
        stats = synthesize_warc_corpus(warc_dir, warc_mb)
        one_file = sorted(glob.glob(os.path.join(warc_dir, "*")))[0]
        warm_bin = (
            spark.read.format("binaryFile")
            .load(one_file)
            .select(F.col("path").alias("file_id"), "content")
        )
        with_gopher_quality_flags(
            warc_records(warm_bin).select(
                "file_id", "record_no",
                html_to_text(F.col("html")).alias("text"),
            ),
            "text",
        ).drop("text").write.mode("overwrite").format("noop").save()

        samples = []
        for _ in range(runs):
            warc_bin = (
                spark.read.format("binaryFile")
                .load(warc_dir)
                .select(F.col("path").alias("file_id"), "content")
            )
            wtext = warc_records(warc_bin).select(
                "file_id", "record_no",
                html_to_text(F.col("html")).alias("text"),
            )
            out = with_gopher_quality_flags(wtext, "text").drop("text")
            t0 = time.perf_counter()
            out.write.mode("overwrite").format("noop").save()
            samples.append(round(time.perf_counter() - t0, 3))
        print(json.dumps({
            "repo": repo,
            "leg": "warc_curation_pipeline",
            "samples": samples,
            "records": stats["records"],
            "calibration_sec": calibration_sec,
            "loadavg": loadavg,
        }))
    finally:
        shutil.rmtree(warc_dir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
