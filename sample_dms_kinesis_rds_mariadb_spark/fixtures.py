"""Shared fixtures: the reference's data model + pipeline, in one module.

The reference duplicates its SQL corpus between run.py and the test file
(lib/query.py ≡ tests/test_infra.py:24-109); SURVEY §5 calls for a single
shared fixture module instead — this is it. Schemas and seed rows follow
FIXTURES.md §1 (derived from reference lib/query.py:1-57), the pipeline spec
mirrors the four task definitions (reference dms_sample/stack.py:92-186).
"""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from sample_dms_kinesis_rds_mariadb_spark.spec import (
    EndpointSpec,
    PipelineSpec,
    SelectionRule,
    TaskSettings,
    TaskSpec,
)

DB_NAME = "testdb"

# --- authors (reference lib/query.py:21-36) --------------------------------
AUTHORS_SCHEMA = T.StructType(
    [
        T.StructField("author_id", T.IntegerType(), False),
        T.StructField("first_name", T.StringType(), False),
        T.StructField("last_name", T.StringType(), False),
        T.StructField("date_of_birth", T.DateType()),
        T.StructField("nationality", T.StringType()),
        T.StructField("biography", T.StringType()),
        T.StructField("email", T.StringType()),
        T.StructField("phone_number", T.StringType()),
        T.StructField("active", T.BooleanType()),
        T.StructField("created_at", T.TimestampType()),
    ]
)

AUTHORS_DEFAULTS = {"active": "true", "created_at": "current_timestamp"}

AUTHORS_ROWS = [
    (
        1,
        "John",
        "Doe",
        dt.date(1980, 1, 1),
        "American",
        "Biography of John Doe.",
        "john.doe@example.com",
        "123-456-7890",
        True,
        dt.datetime(2021, 1, 1, 12, 0, 0),
    )
]

# --- accounts (reference lib/query.py:1-19) ---------------------------------
ACCOUNTS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("age", T.ShortType()),
        T.StructField("birth_date", T.DateType()),
        T.StructField("account_balance", T.DecimalType(10, 2)),
        T.StructField("is_active", T.BooleanType()),
        T.StructField("signup_time", T.TimestampType()),
        T.StructField("last_login", T.TimestampType()),
        T.StructField("bio", T.StringType()),
        T.StructField("profile_picture", T.BinaryType()),
        T.StructField("favorite_color", T.StringType()),
        T.StructField("height", T.FloatType()),
        T.StructField("weight", T.DoubleType()),
    ]
)

ACCOUNTS_DEFAULTS = {"signup_time": "current_timestamp"}

ACCOUNTS_ROWS = [
    (
        1,
        "Alice",
        30,
        dt.date(1991, 5, 21),
        Decimal("1500.00"),
        True,
        dt.datetime(2021, 1, 8, 9, 0, 0),
        dt.datetime(2021, 3, 10, 8, 0, 0),
        "Bio of Alice",
        None,
        "red",
        1.70,
        60.5,
    )
]

# --- novels (reference lib/query.py:38-57) -----------------------------------
NOVELS_SCHEMA = T.StructType(
    [
        T.StructField("novel_id", T.IntegerType(), False),
        T.StructField("title", T.StringType(), False),
        T.StructField("author_id", T.IntegerType()),
        T.StructField("publish_date", T.DateType()),
        T.StructField("isbn", T.StringType()),
        T.StructField("genre", T.StringType()),
        T.StructField("page_count", T.IntegerType()),
        T.StructField("publisher", T.StringType()),
        T.StructField("language", T.StringType()),
        T.StructField("available_copies", T.IntegerType()),
        T.StructField("total_copies", T.IntegerType()),
        T.StructField("created_at", T.TimestampType()),
    ]
)

NOVELS_DEFAULTS = {"created_at": "current_timestamp"}

NOVELS_ROWS = [
    (
        1,
        "The Great Adventure",
        1,
        dt.date(2020, 6, 1),
        "978-3-16-148410-0",
        "Adventure",
        300,
        "Adventure Press",
        "English",
        10,
        20,
        dt.datetime(2021, 1, 2, 10, 0, 0),
    ),
    (
        2,
        "Journey to the Stars",
        1,
        dt.date(2021, 4, 10),
        "978-0-11-322456-7",
        "Science Fiction",
        350,
        "SciFi Universe",
        "English",
        12,
        25,
        dt.datetime(2021, 4, 11, 10, 0, 0),
    ),
]

TABLES = {
    "authors": (AUTHORS_SCHEMA, AUTHORS_ROWS, "author_id", AUTHORS_DEFAULTS),
    "accounts": (ACCOUNTS_SCHEMA, ACCOUNTS_ROWS, "id", ACCOUNTS_DEFAULTS),
    "novels": (NOVELS_SCHEMA, NOVELS_ROWS, "novel_id", NOVELS_DEFAULTS),
}


def seed_df(spark: SparkSession, table: str) -> DataFrame:
    schema, rows, _, _ = TABLES[table]
    return spark.createDataFrame(rows, schema)


def reference_pipeline(
    changefeed_path: str, endpoint_name: str = "mariadb-source"
) -> PipelineSpec:
    """The four reference tasks (dms_sample/stack.py:93-186): two CDC + two
    full-load, selection ``a%`` vs exact ``novels``, before-image on for CDC
    (:331-336), single-shard target (:356)."""
    cdc_settings = TaskSettings(before_image=True)
    fl_settings = TaskSettings()
    endpoint = EndpointSpec(
        name=endpoint_name,
        engine="memory",
        options={"schema_name": DB_NAME, "changefeed_path": changefeed_path},
    )
    rules_a = [SelectionRule(DB_NAME, "a%")]
    rules_novels = [SelectionRule(DB_NAME, "novels")]
    return PipelineSpec(
        endpoints=[endpoint],
        tasks=[
            TaskSpec("cdc-task-1", endpoint_name, "cdc", rules_a, cdc_settings),
            TaskSpec("cdc-task-2", endpoint_name, "cdc", rules_novels, cdc_settings),
            TaskSpec("full-load-task-1", endpoint_name, "full-load", rules_a, fl_settings),
            TaskSpec(
                "full-load-task-2", endpoint_name, "full-load", rules_novels, fl_settings
            ),
        ],
        shards=1,
    )
