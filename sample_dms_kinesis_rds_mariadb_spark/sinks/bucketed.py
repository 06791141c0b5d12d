"""Bucketed-table storage for co-located joins (SURVEY §7 M6 scale path).

Big fact-to-fact joins shuffle both sides on the join key every query. When
the same join recurs (orders⋈lineitem, repeated CDC-applied-table joins),
bucketing pre-partitions the stored data by key hash so Spark's planner
drops the Exchange entirely — the join runs shuffle-free, verified in
tests/test_bucketing.py by asserting the physical plan has no Exchange
under the SortMergeJoin.

At 100 TB this is the difference between re-shuffling terabytes per query
and a scan-local join; bucket counts should be sized so a bucket ≈ one
executor-core's working set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    bucket_col: str,
    num_buckets: int,
    sort_col: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) external parquet
    table registered in the session catalog. Sorting within buckets lets the
    sort-merge join skip its sort as well."""
    writer = (
        df.write.format("parquet")
        .option("path", path)
        .bucketBy(num_buckets, bucket_col)
    )
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    writer.mode("overwrite").saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key — planner
    elides the shuffle when bucket specs match."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
