"""Source catalog: endpoint resolution + table registry.

The reference resolves its sources at task start (endpoint descriptors +
Secrets Manager credentials — reference dms_sample/stack.py:224-258,
run.py:47-69). Here an endpoint resolves to a set of (schema, table) →
DataFrame providers:

- ``parquet``: a directory holding ``<table>.parquet`` files (the driver's
  testdata layout), schema name taken from endpoint options.
- ``memory``: DataFrames registered programmatically (used by the e2e tests
  to seed the reference's authors/accounts/novels fixtures).
- ``jdbc``: ``spark.read.jdbc`` options passthrough (credential fields may be
  late-bound through ``credential_provider``) — the direct analog of the
  reference's MySQL source endpoint (S3).
- ``orc``: same layout with ``<table>.orc`` — Spark-builtin columnar
  alternative; pushdown/pruning behave like parquet.
- ``avro``: a directory of ``<table>.avro`` Object Container Files read
  by the spec-derived pure-Python reader (``sources/avro.py``) — this
  environment ships no avro jar; schema from one bounded header peek or
  ``options["schemas"]``, decode is a per-file Arrow ``mapInPandas``.
- ``jsonl`` / ``csv``: a directory of ``<table>.jsonl`` / ``<table>.csv``
  files — the wire formats raw corpora actually arrive in. Pass explicit
  per-table DDL via ``options["schemas"]`` (``{table: "col TYPE, ..."}``):
  at 100 TB schema INFERENCE is itself a full data scan, so the explicit
  path is the production path (inference remains a convenience fallback,
  plus ``header`` for csv).

Listing is metadata-only: selection rules run against ``list_tables()``
output so non-matching tables are never scanned (SURVEY §4 X1).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sample_dms_kinesis_rds_mariadb_spark.spec import EndpointSpec


class SourceCatalog:
    def __init__(self, spark: SparkSession) -> None:
        self.spark = spark
        self._endpoints: dict[str, EndpointSpec] = {}
        # (endpoint, schema, table) -> provider
        self._memory: dict[tuple[str, str, str], Callable[[], DataFrame]] = {}
        self.credential_provider: Callable[[str], dict] | None = None

    def register_endpoint(self, spec: EndpointSpec) -> None:
        if spec.engine not in (
            "parquet", "orc", "memory", "jdbc", "jsonl", "csv", "avro"
        ):
            raise ValueError(f"unsupported endpoint engine: {spec.engine!r}")
        self._endpoints[spec.name] = spec

    def register_memory_table(
        self, endpoint: str, schema: str, table: str, df: DataFrame
    ) -> None:
        self._memory[(endpoint, schema, table)] = lambda: df

    def drop_memory_table(self, endpoint: str, schema: str, table: str) -> None:
        self._memory.pop((endpoint, schema, table), None)

    def list_tables(self, endpoint: str) -> list[tuple[str, str]]:
        spec = self._endpoints[endpoint]
        if spec.engine == "memory":
            return sorted(
                (s, t) for (e, s, t) in self._memory if e == endpoint
            )
        if spec.engine in ("parquet", "orc", "jsonl", "csv", "avro"):
            suffix = f".{spec.engine}"
            schema = spec.options.get("schema_name", "main")
            path = spec.options["path"]
            return sorted(
                (schema, f[: -len(suffix)])
                for f in os.listdir(path)
                if f.endswith(suffix)
            )
        if spec.engine == "jdbc":
            # JDBC table listing requires a live connection; callers supply
            # the table list via options["tables"] = ["schema.table", ...].
            entries = spec.options.get("tables", [])
            bad = [t for t in entries if "." not in t]
            if bad:
                raise ValueError(
                    f"jdbc endpoint {endpoint!r}: options['tables'] entries "
                    f"must be 'schema.table', got {bad!r}"
                )
            return sorted(tuple(t.split(".", 1)) for t in entries)
        raise AssertionError(spec.engine)

    def load(self, endpoint: str, schema: str, table: str) -> DataFrame:
        spec = self._endpoints[endpoint]
        if spec.engine == "memory":
            return self._memory[(endpoint, schema, table)]()
        if spec.engine == "parquet":
            return self.spark.read.parquet(
                os.path.join(spec.options["path"], f"{table}.parquet")
            )
        if spec.engine == "orc":
            # ORC is Spark-builtin (no extra package) and columnar like
            # parquet: predicate pushdown + column pruning both apply, so
            # a table graduating from csv/jsonl staging keeps its scan
            # characteristics either way
            return self.spark.read.orc(
                os.path.join(spec.options["path"], f"{table}.orc")
            )
        if spec.engine == "avro":
            # no avro jar in this environment: the spec-derived OCF
            # reader (sources/avro.py) — binaryFile scan + Arrow decode,
            # schema from one header peek or options["schemas"][table]
            from sample_dms_kinesis_rds_mariadb_spark.sources.avro import (
                read_avro,
            )

            return read_avro(
                self.spark,
                os.path.join(spec.options["path"], f"{table}.avro"),
                schema_json=spec.options.get("schemas", {}).get(table),
            )
        if spec.engine in ("jsonl", "csv"):
            path = os.path.join(
                spec.options["path"], f"{table}.{spec.engine}"
            )
            ddl = spec.options.get("schemas", {}).get(table)
            reader = self.spark.read
            if ddl is not None:
                reader = reader.schema(ddl)
            if spec.engine == "jsonl":
                return reader.json(path)
            return reader.csv(
                path,
                header=str(spec.options.get("header", True)).lower() == "true",
                inferSchema=ddl is None,
            )
        if spec.engine == "jdbc":
            opts = self.resolve_jdbc_options(spec, schema, table)
            return self.spark.read.format("jdbc").options(**opts).load()
        raise AssertionError(spec.engine)

    def resolve_jdbc_options(
        self, spec: EndpointSpec, schema: str, table: str
    ) -> dict:
        """Assemble the jdbc reader options, resolving late-bound credentials
        — the analog of DMS fetching the endpoint secret at task start
        (reference dms_sample/stack.py:235-249, run.py:64-69). Split out so
        the resolution logic is testable without a live database."""
        opts = dict(spec.options)
        opts.pop("tables", None)
        opts.pop("schema_name", None)
        opts.pop("changefeed_path", None)
        if self.credential_provider is not None and "secret_id" in opts:
            creds = self.credential_provider(opts.pop("secret_id"))
            opts.update(creds)
        opts["dbtable"] = f"{schema}.{table}"
        return opts
