"""SparkSession factory with engine defaults.

Scale posture: these defaults are chosen for correctness on local[N] while
remaining the right *shape* for a 1000-executor cluster — AQE on (runtime
coalesce + skew-join handling), UTC session timezone (the reference's MariaDB
rows are naive timestamps; SURVEY §1.2), Arrow for the Pandas-UDF slow path.
On a real cluster only the resource numbers change (executor count/memory,
shuffle partitions sized to ~128 MB per partition of shuffle data), not the
plan shapes produced by the engine.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_session(
    app_name: str = "dms-spark-engine",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` or ``*``. Shuffle partitions
    default to the core count — for local mode there is no benefit to the
    stock 200; on a cluster callers pass an explicit value sized to the data.
    """
    if cpus is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        n = os.cpu_count() or 8 if cpus == "*" else int(cpus)
        shuffle_partitions = max(int(n), 8)

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # INT96 (the legacy default) carries no min/max column stats, which
        # defeats row-group pruning on timestamp predicates (stream reads,
        # retention trims); TIMESTAMP_MICROS matches Spark's µs precision
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # testdata's events table carries TIMESTAMP(NANOS) parquet, which
        # Spark rejects by default; read as long and convert at load time
        # (plans/queries.py load_table truncates ns → µs like every engine
        # with µs-precision timestamps does)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def widen_small_input(df, min_splits: int | None = None):
    """Spread a SMALL scan across the session's parallelism before
    compute-heavy narrow stages (tokenize/explode/fold pipelines).

    A parquet row group is the atomic read split, so a table that arrives
    as a handful of single-row-group files serializes every downstream
    narrow stage onto that many tasks no matter how many cores the session
    has — the local-testdata shape (one file, one row group per table). A
    real corpus arrives in thousands of splits, where this helper must
    cost nothing: it no-ops whenever the source already reports at least
    ``min_splits`` (default: the session's default parallelism) input
    files, so the repartition shuffle only ever moves inputs small enough
    to have too few files. Sources with no file listing (in-memory frames)
    are treated as small.
    """
    spark = df.sparkSession
    target = min_splits or spark.sparkContext.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:
        n_files = 0
    if n_files >= target:
        return df
    return df.repartition(target)
