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

_STATE_STORE_PROVIDERS = {
    "hdfs": (
        "org.apache.spark.sql.execution.streaming.state."
        "HDFSBackedStateStoreProvider"
    ),
    "rocksdb": (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    ),
}


def get_session(
    app_name: str = "dms-spark-engine",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    state_store: str | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` or ``*``. Shuffle partitions
    default to the core count — for local mode there is no benefit to the
    stock 200; on a cluster callers pass an explicit value sized to the data.

    ``state_store`` (or ``$SPARK_GRAFT_STATE_STORE``) picks the streaming
    state-store backend: ``"hdfs"`` (default — every key's state lives on
    the executor JVM heap between checkpoints) or ``"rocksdb"`` (state
    spills to local SSD; the backend for production stateful streaming —
    the before-image cache keeps one row image PER SOURCE KEY for the TTL
    window, so at 10^9 hot keys the heap-backed store OOMs while RocksDB
    pages; see SCALE.md's streaming-state sizing). The provider is a
    runtime SQLConf — per-session here, but individual queries can flip it
    via ``spark.conf.set`` before ``start()`` as the RocksDB tests do.
    """
    if cpus is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        n = os.cpu_count() or 8 if cpus == "*" else int(cpus)
        shuffle_partitions = max(int(n), 8)
    if state_store is None:
        state_store = os.environ.get("SPARK_GRAFT_STATE_STORE", "hdfs")
    if state_store not in _STATE_STORE_PROVIDERS:
        raise ValueError(
            f"state_store must be one of {sorted(_STATE_STORE_PROVIDERS)}, "
            f"got {state_store!r}"
        )

    # guide §4.5/§2: one Spark task is already the unit of parallelism, so
    # BLAS/OMP thread pools inside each concurrent Python worker
    # oversubscribe the cores N-fold (N workers x N BLAS threads). Measured
    # on the vorbis IMDCT matvec: 32 concurrent workers at default OpenBLAS
    # threading run ~130 ms per 2048x1024 matvec vs 2-4 ms single-threaded
    # (14x wall-clock on the whole batch). Pin the math libraries to one
    # thread per worker — the standard posture on multi-task executors at
    # any scale. setdefault: an explicit operator override in the
    # environment still wins.
    for _var in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS",
                 "MKL_NUM_THREADS", "NUMEXPR_NUM_THREADS"):
        os.environ.setdefault(_var, "1")

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
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            _STATE_STORE_PROVIDERS[state_store],
        )
    )
    # cluster shape for the same pin: executors launch Python workers with
    # the executor env, so carry the single-thread BLAS posture there too
    # (harmless in local mode, where workers inherit the driver env above)
    for _var in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS",
                 "MKL_NUM_THREADS", "NUMEXPR_NUM_THREADS"):
        builder = builder.config(
            f"spark.executorEnv.{_var}", os.environ[_var]
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
