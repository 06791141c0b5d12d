"""One arm of the pdf_text_extraction interleaved A/B (VERDICT r11
item 4): time ONLY the pdf_text_extraction EXTRA leg in a fresh
SparkSession against the repo checkout given as argv[1], print one
JSON line. The orchestrator alternates HEAD and the pre-hardening
checkout (d2bc392) so box drift hits both arms equally; the question
is what share of the r11 2,291->1,433 docs/s reading is the
visited-guard/per-stage-cap hardening vs methodology+noise.

Usage: python tools/ab_pdf_leg.py <repo_dir> [sf_dir]
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
        llm_queries as _llm,
    )
    from sample_dms_kinesis_rds_mariadb_spark.plans import queries as _q
    from sample_dms_kinesis_rds_mariadb_spark.session import get_session

    spark = get_session(app_name="ab-pdf")
    spark.range(1000).selectExpr("sum(id)").collect()
    t0 = time.perf_counter()
    spark.range(200_000_000).selectExpr("sum(id * id % 1000)").collect()
    calibration_sec = round(time.perf_counter() - t0, 3)

    spec = _q.EXTRA_QUERIES["pdf_text_extraction"]
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        spec.spark_fn(spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        samples.append(round(time.perf_counter() - t0, 3))

    print(json.dumps({
        "repo": repo,
        "calibration_sec": calibration_sec,
        "loadavg": list(os.getloadavg()),
        "samples": samples,
        "median": sorted(samples)[1],
    }, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
