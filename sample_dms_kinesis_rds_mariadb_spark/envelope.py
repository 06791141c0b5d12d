"""Change-event envelope: schema + encode/decode.

The stream's record type is the DMS-style JSON envelope (public AWS contract),
configured in the reference at dms_sample/stack.py:210-220 and observed at
run.py:196-198:

    {"data": {col: val, ...},
     "before-image": {col: val, ...},          # CDC update/delete only
     "metadata": {"timestamp": ..., "record-type": "data"|"control",
                  "operation": "load"|"insert"|"update"|"delete"|
                               "create-table"|"drop-table"|"alter-table",
                  "partition-key-type": "schema-table",
                  "schema-name": ..., "table-name": ...,
                  "transaction-id": ...}}

Because ``data``'s fields vary per table and evolve under DDL (SURVEY §1.2),
the transport representation is ``MAP<STRING,STRING>`` — one stable schema for
every table — and the typed per-table StructType is applied at the apply layer
(streaming/apply.py). Encoding stays entirely JVM-side: ``create_map`` +
``to_json`` + ``concat_ws``, no Python UDFs, so it whole-stage-codegens and
scales linearly with executors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sample_dms_kinesis_rds_mariadb_spark.spec import TaskSettings

# Operations (reference dms_sample/stack.py:217, README.md:119-148)
DATA_OPERATIONS = ("load", "insert", "update", "delete")
CONTROL_OPERATIONS = ("create-table", "drop-table", "alter-table")

METADATA_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.StringType()),
        T.StructField("record-type", T.StringType()),
        T.StructField("operation", T.StringType()),
        T.StructField("partition-key-type", T.StringType()),
        # populated when include_partition_value and the row's PK is known
        # (stack.py:216); null otherwise — from_json tolerates absence
        T.StructField("partition-key-value", T.StringType()),
        T.StructField("schema-name", T.StringType()),
        T.StructField("table-name", T.StringType()),
        T.StructField("transaction-id", T.StringType()),
    ]
)

ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("data", T.MapType(T.StringType(), T.StringType())),
        T.StructField("before-image", T.MapType(T.StringType(), T.StringType())),
        T.StructField("metadata", METADATA_SCHEMA),
    ]
)


def _row_as_map(
    columns: list[str],
    prefix: str | None = None,
    binary_columns: set[str] | None = None,
) -> Column:
    """MAP<col_name, string_value> over the given columns (JVM-side).

    Null values are preserved in the map (``include_null_and_empty``,
    reference stack.py:215). Binary columns are base64-encoded — the DMS
    JSON envelope encodes BLOBs as base64; a raw string cast would attempt a
    UTF-8 decode of arbitrary bytes.
    """
    pairs: list[Column] = []
    for c in columns:
        ref = F.col(f"{prefix}.{c}") if prefix else F.col(c)
        if binary_columns and c in binary_columns:
            pairs.append(F.lit(c))
            pairs.append(F.base64(ref))
        else:
            pairs.append(F.lit(c))
            pairs.append(ref.cast("string"))
    return F.create_map(*pairs)


def _metadata_struct(
    operation: Column,
    record_type: Column,
    schema_name: Column,
    table_name: Column,
    txn_id: Column,
    event_ts: Column,
    settings: TaskSettings,
    pk_value: Column | None = None,
) -> Column:
    include_pk = settings.include_partition_value and pk_value is not None
    return F.struct(
        F.date_format(event_ts, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'").alias("timestamp"),
        record_type.alias("record-type"),
        operation.alias("operation"),
        F.lit(settings.partition_key_type).alias("partition-key-type"),
        (pk_value.cast("string") if include_pk else F.lit(None).cast("string")).alias(
            "partition-key-value"
        ),
        schema_name.alias("schema-name"),
        table_name.alias("table-name"),
        (txn_id if settings.include_transaction_details else F.lit(None).cast("string")).alias(
            "transaction-id"
        ),
    )


def partition_key_col(settings: TaskSettings, pk_value: Column | None = None) -> Column:
    """Stream routing key (SURVEY §2.2 K2; reference stack.py:216,219).

    - ``schema-table`` mode: ``schema.table`` — all of a table's changes hash
      to one shard (total order per table, serial per table at the sink).
    - ``primary-key`` mode: the row's PK value, prefixed ``schema.table.``
      when ``partition_include_schema_table`` — a single table's rows fan out
      across every shard (the scale mode; per-PK changes stay FIFO because
      equal keys hash to the same shard).
    """
    base = F.concat_ws(
        ".", F.col("metadata.`schema-name`"), F.col("metadata.`table-name`")
    )
    if settings.partition_key_type == "primary-key" and pk_value is not None:
        if settings.partition_include_schema_table:
            return F.concat_ws(".", base, pk_value.cast("string"))
        # control events and rows whose table has no known PK carry a null
        # pk_value; fall back to schema.table routing for them (a real
        # Kinesis put rejects empty partition keys, and DMS keys control
        # records by schema/table) instead of collapsing every such event
        # onto the single shard xxhash64(null) hashes to
        return F.coalesce(pk_value.cast("string"), base)
    return base


def encode_data_events(
    df: DataFrame,
    schema_name: str,
    table_name: str,
    operation: str,
    settings: TaskSettings,
    txn_id: Column | None = None,
    event_ts: Column | None = None,
    before_columns: list[str] | None = None,
    pk_column: str | None = None,
) -> DataFrame:
    """Project a typed table DataFrame into envelope rows (record-type=data).

    ``before_columns`` names struct-prefixed columns ``before.<col>`` in
    ``df`` to attach as the ``before-image`` map (CDC update/delete; reference
    stack.py:331-336). ``pk_column`` names the table's primary key: it feeds
    the ``partition-key-value`` metadata field (stack.py:216) and, in
    ``primary-key`` partition mode, the routing key itself — without it a
    whole table is one partition key, i.e. one shard, i.e. serial at the
    sink. Returns columns: envelope fields + ``partition_key``.
    """
    if operation not in DATA_OPERATIONS:
        raise ValueError(f"not a data operation: {operation!r}")
    # exclude the CDC-attached transport columns from the data map — but
    # "before" only when it IS the attached image (struct/map typed): a
    # USER column named before is real data and must ship. The
    # underscore-prefixed _txn_id/_commit_ts stay reserved transport names
    # (the CDC encoder owns that namespace).
    def _is_attached(name: str) -> bool:
        if name not in df.columns:
            return False
        if name == "before":
            return isinstance(
                df.schema[name].dataType, (T.StructType, T.MapType)
            )
        return True

    attached = {c for c in ("before", "_txn_id", "_commit_ts") if _is_attached(c)}
    data_cols = [c for c in df.columns if c not in attached]
    binary_cols = {
        f.name for f in df.schema.fields if isinstance(f.dataType, T.BinaryType)
    }
    ts = event_ts if event_ts is not None else F.current_timestamp()
    txn = txn_id if txn_id is not None else F.lit(None).cast("string")

    data_map = _row_as_map(data_cols, binary_columns=binary_cols)
    if not settings.include_null_and_empty:
        data_map = F.map_filter(data_map, lambda k, v: v.isNotNull() & (v != F.lit("")))

    if before_columns:
        if settings.before_image_type == "pk-only":
            # select the PK by NAME when known — truncating to the first
            # listed column silently picked whatever the caller happened to
            # order first, losing the key the pk-only image exists to carry
            if pk_column is not None:
                pk_before = f"before.{pk_column}"
                before_columns = [
                    c for c in before_columns
                    if c == pk_before or c.split(".", 1)[-1] == pk_column
                ] or before_columns[:1]
            else:
                before_columns = before_columns[:1]
        before_map = _row_as_map(
            before_columns, prefix="before", binary_columns=binary_cols
        )
    else:
        before_map = F.lit(None).cast(T.MapType(T.StringType(), T.StringType()))

    pk_value = F.col(pk_column) if pk_column is not None else None
    out = df.select(
        data_map.alias("data"),
        before_map.alias("before-image"),
        _metadata_struct(
            F.lit(operation),
            F.lit("data"),
            F.lit(schema_name),
            F.lit(table_name),
            txn.cast("string"),
            ts,
            settings,
            pk_value=pk_value,
        ).alias("metadata"),
        *(
            [pk_value.cast("string").alias("_pk")]
            if pk_value is not None
            else []
        ),
    )
    out = out.withColumn(
        "partition_key",
        partition_key_col(
            settings, F.col("_pk") if pk_value is not None else None
        ),
    )
    return out.drop("_pk") if pk_value is not None else out


def control_events(
    spark: SparkSession,
    items: list[tuple[str, str, str]],
    settings: TaskSettings,
    event_ts: Column | None = None,
) -> DataFrame:
    """Control records (record-type=control) for DDL, interleaved with data
    events in the stream (reference stack.py:214,217; SURVEY §2.2 K3).

    ``items`` = [(schema_name, table_name, operation), ...] in emission order.
    """
    for _, _, op in items:
        if op not in CONTROL_OPERATIONS:
            raise ValueError(f"not a control operation: {op!r}")
    # pure-JVM construction (range + literal array explode) — a Python-list
    # createDataFrame would put a Python-worker scan in every downstream
    # evaluation of the envelope stream
    items_arr = F.array(
        *[
            F.struct(
                F.lit(i).alias("idx"),
                F.lit(s).alias("schema_name"),
                F.lit(t).alias("table_name"),
                F.lit(o).alias("operation"),
            )
            for i, (s, t, o) in enumerate(items)
        ]
    )
    base = (
        spark.range(1)
        .select(F.explode(items_arr).alias("it"))
        .select("it.*")
    )
    ts = event_ts if event_ts is not None else F.current_timestamp()
    out = base.orderBy("idx").select(
        F.lit(None).cast(T.MapType(T.StringType(), T.StringType())).alias("data"),
        F.lit(None).cast(T.MapType(T.StringType(), T.StringType())).alias("before-image"),
        _metadata_struct(
            F.col("operation"),
            F.lit("control"),
            F.col("schema_name"),
            F.col("table_name"),
            F.lit(None).cast("string"),
            ts,
            settings,
        ).alias("metadata"),
        F.col("idx").alias("_order"),
    )
    return out.withColumn("partition_key", partition_key_col(settings))


def to_json_records(df: DataFrame) -> DataFrame:
    """Serialize envelope rows to the wire shape: ``Data`` JSON bytes-as-string
    + ``PartitionKey`` (reference stack.py:212; run.py:196-198; K1).
    """
    return df.select(
        F.to_json(
            F.struct("data", "`before-image`", "metadata"),
            # null columns/fields stay in the wire JSON — the reference's
            # include-null-and-empty envelope setting (stack.py:215)
            {"ignoreNullFields": "false"},
        ).alias("Data"),
        F.col("partition_key").alias("PartitionKey"),
        *[c for c in df.columns if c.startswith("_")],
    )


def parse_json_records(df: DataFrame) -> DataFrame:
    """Inverse of to_json_records: parse ``Data`` and splice in the partition
    key — the reference consumer's ``{**json.loads(r["Data"]),
    "partition_key": r["PartitionKey"]}`` (run.py:196-198; SURVEY §2.4 P3).
    """
    parsed = df.withColumn("_env", F.from_json(F.col("Data"), ENVELOPE_SCHEMA))
    keep = [c for c in df.columns if c not in ("Data", "PartitionKey", "_env")]
    return parsed.select(
        F.col("_env.data").alias("data"),
        F.col("_env.`before-image`").alias("before-image"),
        F.col("_env.metadata").alias("metadata"),
        F.col("PartitionKey").alias("partition_key"),
        *keep,
    )
