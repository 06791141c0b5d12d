"""PySpark-native CDC/replication + analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference sample (localstack-samples/sample-dms-kinesis-rds-mariadb): a
CDC/replication dataflow (full-load snapshot + binlog-style change streams →
JSON envelope stream with selection rules, before-images, control records,
per-table statistics, schema evolution) re-expressed Spark-first on the
DataFrame / SQL / Structured Streaming stack, plus the full relational query
surface and large-scale training-data pipeline operators (dedup, similarity
search, text analysis, multimodal columns).

Everything here derives from public knowledge only: the Apache Spark / PySpark
API and the reference repo's observable semantics (cited per-module as
reference file:line).
"""

from sample_dms_kinesis_rds_mariadb_spark.session import get_session
from sample_dms_kinesis_rds_mariadb_spark.spec import (
    EndpointSpec,
    PipelineSpec,
    SelectionRule,
    TaskSettings,
    TaskSpec,
)

__all__ = [
    "get_session",
    "EndpointSpec",
    "PipelineSpec",
    "SelectionRule",
    "TaskSettings",
    "TaskSpec",
]

__version__ = "0.1.0"
