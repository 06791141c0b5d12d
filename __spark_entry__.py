"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query on sf0.001 (smoke check).
``queries()`` — every implemented operator from SURVEY §2 + the north-star
LLM-pipeline ops, as (spark, sf_dir) → DataFrame callables.
``oracle_sql()`` — DuckDB-runnable ANSI SQL equivalents (column names and
result types matched; see plans/queries.py header for the exactness rules).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sample_dms_kinesis_rds_mariadb_spark.plans import queries as _q  # noqa: E402
from sample_dms_kinesis_rds_mariadb_spark.plans import llm_queries as _lq  # noqa: E402,F401


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: TPC-H Q1-style pricing summary on sf0.001."""
    return _q.QUERIES["q1_pricing_summary"].spark_fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries_dict()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_dict()
