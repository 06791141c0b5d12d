from sample_dms_kinesis_rds_mariadb_spark.sinks.stream_sink import StreamStore

__all__ = ["StreamStore"]
