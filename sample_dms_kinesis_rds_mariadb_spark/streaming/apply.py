"""Materialize the change stream into queryable tables (SURVEY §7 M5).

The reference validates replication by querying the *source* tables over SQL
(run.py:231-241); the engine generalizes this: change events are applied to
per-table materialized state keyed on the primary key (insert/update upsert,
delete removes), registered as session views, and the full Spark SQL surface
runs on top (projections P1/P2, counts A1, the FK join J1, anything else).

Implementation is copy-on-write parquet versions per table: each applied
batch computes last-writer-wins per key (window over pk by commit ``seq``),
anti-joins the current version against touched keys, unions the upserts, and
writes a new version directory. At 100 TB the identical logic is a Delta /
Iceberg ``MERGE INTO`` (same plan shape: hash join on pk + file rewrite
limited to touched partitions); plain parquet is used here to stay
dependency-free. State is re-projected through the evolving TableDef on
every read, so DDL drift (T5) never invalidates stored files.
"""

from __future__ import annotations

import os
import threading

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sample_dms_kinesis_rds_mariadb_spark.streaming.schema_evolution import (
    TableDef,
    TableRegistry,
)


def conform(df: DataFrame, tdef: TableDef) -> DataFrame:
    """Project any stored/typed DataFrame onto the current evolved schema:
    add-column fills the default, drop-column prunes, modify-column casts
    (reference lib/query.py:59-66 semantics)."""
    cols = []
    for f in tdef.struct.fields:
        if f.name in df.columns:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            d = tdef.defaults.get(f.name)
            if d is None:
                cols.append(F.lit(None).cast(f.dataType).alias(f.name))
            elif d.strip().lower() == "current_timestamp":
                cols.append(F.current_timestamp().cast(f.dataType).alias(f.name))
            else:
                cols.append(F.lit(d).cast(f.dataType).alias(f.name))
    return df.select(*cols)


class TableMaterializer:
    def __init__(self, spark: SparkSession, registry: TableRegistry, path: str) -> None:
        self.spark = spark
        self.registry = registry
        self.path = path
        self._versions: dict[tuple[str, str], int] = {}
        self._lock = threading.Lock()
        os.makedirs(path, exist_ok=True)

    def _dir(self, schema: str, table: str, version: int) -> str:
        return os.path.join(self.path, f"{schema}.{table}", f"v{version:06d}")

    def exists(self, schema: str, table: str) -> bool:
        return (schema, table) in self._versions

    def table(self, schema: str, table: str) -> DataFrame:
        """Current typed state, conformed to the evolved schema."""
        tdef = self.registry.get(schema, table)
        with self._lock:
            v = self._versions.get((schema, table))
        if v is None:
            return self.spark.createDataFrame([], tdef.struct)
        return conform(self.spark.read.parquet(self._dir(schema, table, v)), tdef)

    def overwrite(self, schema: str, table: str, df: DataFrame) -> None:
        tdef = self.registry.get(schema, table)
        with self._lock:
            v = self._versions.get((schema, table), -1) + 1
            conform(df, tdef).write.mode("overwrite").parquet(self._dir(schema, table, v))
            self._versions[(schema, table)] = v
        self.register_view(schema, table)

    def truncate(self, schema: str, table: str) -> None:
        tdef = self.registry.get(schema, table)
        self.overwrite(schema, table, self.spark.createDataFrame([], tdef.struct))

    def register_view(self, schema: str, table: str) -> None:
        self.table(schema, table).createOrReplaceTempView(table)

    def apply_change_batch(self, batch: DataFrame) -> None:
        """Apply one change-feed micro-batch (sources/changefeed.py shape) to
        materialized state: per table, last change per primary key wins
        (window by pk ordered by commit ``seq`` desc — a hash-partitioned
        shuffle on pk, no global sort), then upsert = anti-join current state
        on touched keys ∪ surviving after-images; delete drops the key.
        """
        touched = [
            (r["schema"], r["table"])
            for r in batch.filter(
                F.col("op").isin("insert", "update", "delete")
            )
            .select("schema", "table")
            .distinct()
            .collect()
        ]
        for schema, table in sorted(touched):
            try:
                tdef = self.registry.get(schema, table)
            except KeyError:
                continue
            pk = tdef.primary_key
            changes = batch.filter(
                (F.col("schema") == schema)
                & (F.col("table") == table)
                & F.col("op").isin("insert", "update", "delete")
            ).withColumn("_pk", F.col("data").getItem(pk))
            w = Window.partitionBy("_pk").orderBy(F.col("seq").desc())
            last = changes.withColumn("_rn", F.row_number().over(w)).filter(
                F.col("_rn") == 1
            )
            survivors = last.filter(F.col("op") != "delete").select(
                *tdef.typed_projection("data")
            )
            keys = last.select(F.col("_pk").cast(tdef.struct[pk].dataType).alias(pk))
            current = self.table(schema, table)
            merged = current.join(F.broadcast(keys), pk, "left_anti").unionByName(
                survivors
            )
            self.overwrite(schema, table, merged)
