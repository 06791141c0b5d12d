"""Query catalog: every operator the engine claims, as (Spark plan, DuckDB
oracle SQL) pairs over the driver's testdata tables.

Each entry maps a SURVEY §2 operator (or an LLM-pipeline operator from the
north star) to an executable Spark DataFrame program plus an equivalent ANSI
SQL string the driver runs on DuckDB; names, aliases, and result types are
kept bit-compatible across both engines:

- double columns are cast to DECIMAL **before** aggregation (order-independent
  exact arithmetic in both engines; double summation order would differ);
- aggregate results are cast to the same DECIMAL(38,s) on both sides;
- every LIMIT is paired with a fully deterministic ORDER BY;
- md5 (identical hex in both engines) is the cross-engine hash primitive.

Scale notes are in each query's docstring: these plans are written for the
1000-executor case (broadcast the dimension side, aggregate before join where
possible, filters first so parquet scans prune), verified by `.explain()` in
tests/test_plans.py.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


# {path: [ns timestamp column names]} — the footer probe is a driver-side
# pyarrow read; memoized so repeated load_table calls (every catalog query,
# every bench iteration) pay it once per path per process
_NS_COLUMNS_CACHE: dict[str, list[str]] = {}
_NANOS_CONF_SET: set[int] = set()


def _ns_columns(path: str) -> list[str]:
    if path not in _NS_COLUMNS_CACHE:
        try:
            import pyarrow.parquet as pq

            arrow_schema = pq.read_schema(path)
            _NS_COLUMNS_CACHE[path] = [
                f.name for f in arrow_schema if str(f.type) == "timestamp[ns]"
            ]
        except Exception:
            _NS_COLUMNS_CACHE[path] = []
    return _NS_COLUMNS_CACHE[path]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    # runtime-settable; required for TIMESTAMP(NANOS) parquet (events table)
    # — the caller's session may not have it (e.g. the driver's own session);
    # set once per session, not per call
    if id(spark) not in _NANOS_CONF_SET:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        _NANOS_CONF_SET.add(id(spark))
    df = spark.read.parquet(path)
    # TIMESTAMP(NANOS) columns surface as raw nano longs (see session.py);
    # convert to µs-precision timestamps — the same truncation DuckDB applies
    # when casting ns → its µs TIMESTAMP, so both engines see equal values.
    for col_name in _ns_columns(path):
        df = df.withColumn(
            col_name,
            F.timestamp_micros(F.floor(F.col(col_name) / F.lit(1000)).cast("long")),
        )
    return df


@dataclass(frozen=True)
class QuerySpec:
    name: str
    description: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    tags: tuple[str, ...] = field(default_factory=tuple)


QUERIES: dict[str, QuerySpec] = {}

# Oracle-checked queries OUTSIDE the driver's 50-entry correctness cap: the
# pytest parity harness (tests/test_oracle_parity.py) runs these against
# DuckDB exactly like catalog entries, but they don't occupy a driver slot —
# used when a new operator family earns a catalog seat and the displaced
# query's mechanism still deserves cross-engine coverage.
EXTRA_QUERIES: dict[str, QuerySpec] = {}


def register(
    name: str,
    description: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    extra: bool = False,
):
    def deco(fn):
        target = EXTRA_QUERIES if extra else QUERIES
        target[name] = QuerySpec(name, description, fn, oracle, tags)
        return fn

    return deco


def queries_dict() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.spark_fn for name, spec in QUERIES.items()}


def oracle_dict() -> dict[str, str]:
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle}


def _dec(col: str, scale: int = 2):
    return F.col(col).cast(f"decimal(18,{scale})")


# ---------------------------------------------------------------------------
# Relational surface (SURVEY §2.3-§2.9). The reference's own workload is
# tiny projections/counts/lookups (run.py:231-241, tests/test_infra.py:
# 253-267); the engine generalizes to full Spark SQL — these queries prove
# the generalized surface against an independent engine.
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    "TPC-H Q1-style grouped aggregation: filter → groupBy → sum/count "
    "(SURVEY §2.6; partial aggregation map-side, 2-key groupBy shuffle is "
    "bounded by distinct flag/status pairs — trivially scalable)",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_qty,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_base_price,
               CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_disc_price,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    tags=("agg", "filter"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = (_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))).cast(
        "decimal(38,4)"
    )
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            # exact decimal arithmetic, rendered as DOUBLE on both engines:
            # decimal->double is the correctly-rounded nearest double in both
            # Spark (BigDecimal.doubleValue) and DuckDB, so the driver's value
            # hash sees identical float64 bits — DECIMAL output columns hash
            # differently per engine (trailing-zero canonicalization).
            F.sum(_dec("l_quantity")).cast("decimal(38,2)").cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("decimal(38,2)").cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("decimal(38,4)").cast("double").alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q3_shipping_priority",
    "TPC-H Q3-style 3-way join + group + top-k (SURVEY §2.5; customer is the "
    "small side → broadcast; top-k via orderBy+limit = TakeOrdered, no full "
    "sort at scale)",
    oracle="""
        SELECT l.l_orderkey,
               CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue,
               CAST(o.o_orderdate AS DATE) AS orderdate
        FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
          AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        GROUP BY l.l_orderkey, o.o_orderdate
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    tags=("join", "agg", "topk"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    revenue = (_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))).cast(
        "decimal(38,4)"
    )
    return (
        l.join(o.join(F.broadcast(c), o.o_custkey == c.c_custkey), l.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(revenue).cast("decimal(38,4)").cast("double").alias("revenue"))
        .select(
            "l_orderkey", "revenue", F.col("o_orderdate").cast("date").alias("orderdate")
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@register(
    "q5_region_volume",
    "TPC-H Q5-style 6-way star join (SURVEY §2.5 J1 generalized: dims "
    "broadcast, facts shuffle once on the join key)",
    oracle="""
        SELECT n.n_name AS nation,
               CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue
        FROM region r
        JOIN nation n ON n.n_regionkey = r.r_regionkey
        JOIN customer c ON c.c_nationkey = n.n_nationkey
        JOIN orders o ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = n.n_nationkey
        WHERE r.r_name = 'ASIA'
        GROUP BY n.n_name
        ORDER BY revenue DESC, nation
    """,
    tags=("join", "agg"),
)
def q5_region_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    revenue = (_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))).cast(
        "decimal(38,4)"
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(
            F.broadcast(s),
            (s.s_suppkey == l.l_suppkey) & (s.s_nationkey == n.n_nationkey),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum(revenue).cast("decimal(38,4)").cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "nation")
    )


@register(
    "projection_filter",
    "Column projection + WHERE (SURVEY §2.4 P1, §2.3 F5: `SELECT first_name, "
    "last_name FROM authors` generalized; projection/filter push to parquet)",
    oracle="""
        SELECT c_name, CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal
        FROM customer
        WHERE c_mktsegment = 'AUTOMOBILE' AND c_acctbal > 1000
        ORDER BY c_custkey
    """,
    tags=("projection", "filter"),
)
def projection_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return (
        c.filter((F.col("c_mktsegment") == "AUTOMOBILE") & (F.col("c_acctbal") > 1000))
        .orderBy("c_custkey")
        .select("c_name", _dec("c_acctbal").cast("double").alias("acctbal"))
    )


@register(
    "point_lookup",
    "Key lookup (SURVEY §2.3 F4: `next(stat for ... if TableName==x)` "
    "analog — predicate pushdown makes this a pruned scan)",
    oracle="""
        SELECT o_orderkey, o_custkey, o_orderstatus,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice
        FROM orders WHERE o_orderkey = 42
    """,
    tags=("filter",),
)
def point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey") == 42).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        _dec("o_totalprice").cast("double").alias("totalprice"),
    )


@register(
    "count_star_tables",
    "COUNT(*) per table (SURVEY §2.6 A1: `SELECT COUNT(*) FROM {table}` for "
    "each table, tests/test_infra.py:253-267)",
    oracle="""
        SELECT 'customer' AS table_name, COUNT(*) AS row_count FROM customer
        UNION ALL SELECT 'orders', COUNT(*) FROM orders
        UNION ALL SELECT 'lineitem', COUNT(*) FROM lineitem
        UNION ALL SELECT 'events', COUNT(*) FROM events
        ORDER BY table_name
    """,
    tags=("agg",),
)
def count_star_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = []
    for t in ("customer", "orders", "lineitem", "events"):
        parts.append(
            load_table(spark, sf_dir, t).agg(
                F.lit(t).alias("table_name"), F.count("*").alias("row_count")
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("table_name")


@register(
    "like_filter_select",
    "SQL-LIKE selection (SURVEY §2.3 F1, §2.9 C4: the `a%` table-mapping "
    "wildcard applied as a row predicate)",
    oracle="""
        SELECT p_brand, COUNT(*) AS n_parts
        FROM part WHERE p_name LIKE 's%'
        GROUP BY p_brand ORDER BY p_brand
    """,
    tags=("filter", "agg"),
)
def like_filter_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 's%' matches a real slice of the testdata part names (the 'a%' the
    # reference mapping rule uses matches NOTHING in this corpus — a
    # 0-row-vs-0-row oracle comparison is vacuously green, r10 review)
    p = load_table(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_name").like("s%"))
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_parts"))
        .orderBy("p_brand")
    )


@register(
    "multi_key_sort",
    "Multi-key sort (SURVEY §2.7 O1: statistics ordered by (SchemaName, "
    "TableName), run.py:206-208; range-partitioned sort at scale)",
    oracle="""
        SELECT s_suppkey, s_name, s_nationkey,
               CAST(CAST(s_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal
        FROM supplier
        ORDER BY s_nationkey, acctbal DESC, s_suppkey
        LIMIT 100
    """,
    tags=("sort", "limit"),
)
def multi_key_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    return (
        s.select(
            "s_suppkey",
            "s_name",
            "s_nationkey",
            _dec("s_acctbal").cast("double").alias("acctbal"),
        )
        .orderBy("s_nationkey", F.col("acctbal").desc(), "s_suppkey")
        .limit(100)
    )


@register(
    "semi_join_exists",
    "Left-semi join (SURVEY §2.5: EXISTS — customers having ≥1 'F' order)",
    oracle="""
        SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
        ORDER BY c_custkey
    """,
    tags=("join",),
)
def semi_join_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "anti_join_not_exists",
    "Left-anti join (SURVEY §2.5: NOT EXISTS — customers with no "
    "large order)",
    oracle="""
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_totalprice > 400000)
        ORDER BY c_custkey
    """,
    tags=("join",),
)
def anti_join_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    # every testdata customer HAS an order, so the bare no-orders form
    # returned 0 rows on both engines — vacuously green (r10 review);
    # the large-order predicate keeps a real survivor/dropped split
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 400000
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "fk_join_dimension",
    "FK dimension join + ordered string aggregation (SURVEY §2.5 J1: "
    "novels⋈authors analog — nation⋈region broadcast hash join, dimension "
    "never shuffles the fact; listagg of member nations per region)",
    oracle="""
        SELECT r.r_name AS region_name, COUNT(*) AS n_nations,
               string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations
        FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name ORDER BY r.r_name
    """,
    tags=("join", "agg", "function"),
)
def fk_join_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.count("*").alias("n_nations"),
            # sorted collect + concat = deterministic listagg on both engines
            F.concat_ws(",", F.array_sort(F.collect_list("n_name"))).alias("nations"),
        )
        .orderBy("region_name")
    )


@register(
    "window_topk_per_group",
    "Window row_number per key (SURVEY §2.9 C7 auto-increment analog; top "
    "order per customer — hash-partitioned window, no global sort)",
    oracle="""
        SELECT o_custkey, o_orderkey,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice
        FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders
        ) WHERE rn = 1 AND o_custkey <= 500
        ORDER BY o_custkey
    """,
    tags=("window",),
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("o_custkey") <= 500))
        .select(
            "o_custkey",
            "o_orderkey",
            _dec("o_totalprice").cast("double").alias("totalprice"),
        )
        .orderBy("o_custkey")
    )


@register(
    "cdc_apply_latest",
    "CDC upsert semantics as a batch analog (SURVEY §7 M5: last change per "
    "key wins — the materializer's core plan: hash shuffle on key + "
    "row_number, exactly how the engine applies micro-batches)",
    oracle="""
        SELECT user_id, event_type AS last_event_type, value AS last_value
        FROM (
          SELECT user_id, event_type, value,
                 ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
          FROM events
        ) WHERE rn = 1
        ORDER BY user_id
    """,
    tags=("window", "cdc"),
)
def cdc_apply_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("event_id").desc())
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("last_event_type"),
            F.col("value").alias("last_value"),
        )
        .orderBy("user_id")
    )


@register(
    "per_key_operation_counts",
    "Conditional-aggregation counters (SURVEY §2.6 A2: the per-table "
    "Inserts/Updates/Deletes statistics shape — sum(when(op=x,1)) per key)",
    oracle="""
        SELECT user_id,
               COUNT(*) FILTER (WHERE event_type = 'click') AS clicks,
               COUNT(*) FILTER (WHERE event_type = 'view') AS views,
               COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchases,
               COUNT(*) FILTER (WHERE event_type = 'error') AS errors,
               COUNT(*) AS total
        FROM events GROUP BY user_id ORDER BY user_id
    """,
    tags=("agg", "cdc"),
)
def per_key_operation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")

    def cnt(t):
        return F.count(F.when(F.col("event_type") == t, 1))

    return (
        e.groupBy("user_id")
        .agg(
            cnt("click").alias("clicks"),
            cnt("view").alias("views"),
            cnt("purchase").alias("purchases"),
            cnt("error").alias("errors"),
            F.count("*").alias("total"),
        )
        .orderBy("user_id")
    )


@register(
    "grouping_sets_totals",
    "GROUPING SETS / ROLLUP / CUBE family in one pass (SURVEY §2.6 builtin "
    "surface: the four explicit sets (f,s),(f),(s),() equal CUBE(f,s) and "
    "contain every ROLLUP(f,s) set; GROUPING() markers disambiguate "
    "subtotal rows from genuine NULL groups)",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
               CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
               COUNT(*) AS n,
               CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag),
                                (l_linestatus), ())
        ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    tags=("agg",),
)
def grouping_sets_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One multi-set aggregation pass: Spark expands the grouping sets and
    aggregates them in a single shuffle (no union of 4 scans), the same
    shape ROLLUP/CUBE lower to — the scale-correct form of subtotal
    reporting."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_returnflag"], ["l_linestatus"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_rf"),
            F.grouping("l_linestatus").cast("int").alias("g_ls"),
            F.count("*").alias("n"),
            F.sum(_dec("l_quantity")).cast("decimal(38,2)").cast("double").alias("sum_qty"),
        )
        .orderBy(
            "g_rf",
            "g_ls",
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@register(
    "distinct_count",
    "COUNT(DISTINCT) + HAVING (SURVEY §2.6: exact distinct aggregation — "
    "two-phase partial-distinct shuffle in Spark; post-aggregation predicate "
    "keeps only groups with >10 distinct parts)",
    oracle="""
        SELECT l_returnflag,
               COUNT(DISTINCT l_partkey) AS distinct_parts,
               COUNT(DISTINCT l_suppkey) AS distinct_suppliers
        FROM lineitem GROUP BY l_returnflag
        HAVING COUNT(DISTINCT l_partkey) > 10
        ORDER BY l_returnflag
    """,
    tags=("agg", "filter"),
)
def distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("distinct_parts"),
            F.countDistinct("l_suppkey").alias("distinct_suppliers"),
        )
        .filter(F.col("distinct_parts") > 10)
        .orderBy("l_returnflag")
    )


@register(
    "json_extract_props",
    "JSON parse + partition-key computation (SURVEY §2.9 C2: "
    "`json.loads(record['Data'])` analog via get_json_object over the events "
    "props column; SURVEY §2.2 K2 / §2.9 C3: concat_ws('.', schema, table) "
    "routing key — both per-record scalar paths of the envelope encoder, "
    "grouped together)",
    oracle="""
        SELECT concat_ws('.', 'main', event_type) AS partition_key,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
               COUNT(*) AS n
        FROM events
        GROUP BY partition_key, k_value ORDER BY partition_key, k_value
    """,
    tags=("json", "function"),
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.select(
            F.concat_ws(".", F.lit("main"), F.col("event_type")).alias(
                "partition_key"
            ),
            F.get_json_object(F.col("props"), "$.k").cast("bigint").alias("k_value"),
        )
        .groupBy("partition_key", "k_value")
        .agg(F.count("*").alias("n"))
        .orderBy("partition_key", "k_value")
    )


@register(
    "timestamp_threshold_filter",
    "Arrival-timestamp predicate (SURVEY §2.3 F3: ApproximateArrivalTimestamp "
    "> threshold, run.py:187-188)",
    oracle="""
        SELECT event_type, COUNT(*) AS n,
               MIN(event_id) AS first_event, MAX(event_id) AS last_event
        FROM events
        WHERE ts > TIMESTAMP '2024-01-20 00:00:00'
        GROUP BY event_type ORDER BY event_type
    """,
    tags=("filter", "streaming"),
)
def timestamp_threshold_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.filter(F.col("ts") > F.lit("2024-01-20 00:00:00").cast("timestamp"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.min("event_id").alias("first_event"),
            F.max("event_id").alias("last_event"),
        )
        .orderBy("event_type")
    )


@register(
    "date_parts_agg",
    "Timestamp extraction + date arithmetic (SURVEY §2.9 C5/C8: "
    "unix_timestamp/date literals — orders bucketed by year/month; "
    "span_days = datediff over the month's order-date range)",
    oracle="""
        SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
               CAST(EXTRACT(month FROM o_orderdate) AS INT) AS order_month,
               COUNT(*) AS n_orders,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS total,
               CAST(date_diff('day', CAST(MIN(o_orderdate) AS DATE),
                                     CAST(MAX(o_orderdate) AS DATE)) AS INT) AS span_days
        FROM orders
        GROUP BY order_year, order_month
        ORDER BY order_year, order_month
    """,
    tags=("function", "agg"),
)
def date_parts_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("decimal(38,2)").cast("double").alias("total"),
            F.datediff(
                F.max("o_orderdate").cast("date"), F.min("o_orderdate").cast("date")
            ).alias("span_days"),
        )
        .orderBy("order_year", "order_month")
    )


@register(
    "case_when_buckets",
    "CASE WHEN range bucketing (value histogram — the engine's conditional "
    "projection path)",
    oracle="""
        SELECT CASE
                 WHEN o_totalprice < 50000 THEN 'small'
                 WHEN o_totalprice < 150000 THEN 'medium'
                 ELSE 'large'
               END AS bucket,
               COUNT(*) AS n,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS total
        FROM orders GROUP BY bucket ORDER BY bucket
    """,
    tags=("function", "agg"),
)
def case_when_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .otherwise("large")
    )
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.sum(_dec("o_totalprice")).cast("decimal(38,2)").cast("double").alias("total"),
        )
        .orderBy("bucket")
    )


@register(
    "intersect_except",
    "Set operations INTERSECT / EXCEPT / UNION-distinct (SURVEY §2.8 "
    "generalized): customer keys in both, only one, or either of two order "
    "status sets",
    oracle="""
        SELECT 'both' AS side, COUNT(*) AS n FROM (
          SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
          INTERSECT
          SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        )
        UNION ALL
        SELECT 'only_f', COUNT(*) FROM (
          SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
          EXCEPT
          SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        )
        UNION ALL
        SELECT 'either', COUNT(*) FROM (
          SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
          UNION
          SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        )
        ORDER BY side
    """,
    tags=("setop",),
)
def intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    f_keys = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    o_keys = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    both = f_keys.intersect(o_keys).agg(
        F.lit("both").alias("side"), F.count("*").alias("n")
    )
    # subtract = SQL EXCEPT (set semantics); exceptAll would keep multiset
    # leftovers for keys that merely appear more often on the left
    only_f = f_keys.subtract(o_keys).agg(
        F.lit("only_f").alias("side"), F.count("*").alias("n")
    )
    # union().distinct() = SQL UNION (distinct) — dedup happens in one hash
    # shuffle after the cheap concatenation, no sort
    either = f_keys.union(o_keys).distinct().agg(
        F.lit("either").alias("side"), F.count("*").alias("n")
    )
    return both.unionByName(only_f).unionByName(either).orderBy("side")


@register(
    "correlated_subquery",
    "Correlated scalar subquery via the SQL API (SURVEY §2.1 S4: the "
    "interactive SQL surface; Catalyst decorrelates to a join)",
    oracle="""
        SELECT o.o_custkey, COUNT(*) AS n_above_own_avg
        FROM orders o
        WHERE o.o_totalprice > (
          SELECT AVG(o2.o_totalprice) FROM orders o2
          WHERE o2.o_custkey = o.o_custkey
        )
        GROUP BY o.o_custkey ORDER BY o.o_custkey
    """,
    tags=("join", "sql"),
)
def correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_csq")
    return spark.sql(
        """
        SELECT o.o_custkey, COUNT(*) AS n_above_own_avg
        FROM orders_csq o
        WHERE o.o_totalprice > (
          SELECT AVG(o2.o_totalprice) FROM orders_csq o2
          WHERE o2.o_custkey = o.o_custkey
        )
        GROUP BY o.o_custkey ORDER BY o.o_custkey
        """
    )


@register(
    "min_max_by",
    "min_by / max_by argmin-argmax aggregation (each nation's cheapest and "
    "priciest part)",
    oracle="""
        SELECT p_brand,
               arg_min(p_name, printf('%012.2f', p_retailprice) || '|' || p_name) AS cheapest_part,
               arg_max(p_name, printf('%012.2f', p_retailprice) || '|' || p_name) AS priciest_part,
               COUNT(*) AS n_parts
        FROM part GROUP BY p_brand ORDER BY p_brand
    """,
    tags=("agg",),
)
def min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    # zero-padded price keeps string order = numeric order; name tie-break
    # makes argmin/argmax deterministic in both engines
    key = F.concat_ws(
        "|", F.format_string("%012.2f", F.col("p_retailprice")), F.col("p_name")
    )
    return (
        p.groupBy("p_brand")
        .agg(
            F.min_by("p_name", key).alias("cheapest_part"),
            F.max_by("p_name", key).alias("priciest_part"),
            F.count("*").alias("n_parts"),
        )
        .orderBy("p_brand")
    )


@register(
    "window_lead_lag",
    "lead/lag/first_value window functions plus gaps-and-islands "
    "sessionization: order-to-order price deltas per customer, and a running "
    "session id that increments whenever >90 days pass between consecutive "
    "orders (lag gap -> new-session flag -> running sum)",
    oracle="""
        SELECT o_custkey, o_orderkey, delta_prev, first_price,
               CAST(SUM(new_sess) OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS session_id
        FROM (
          SELECT o_custkey, o_orderkey, o_orderdate,
                 CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                      - CAST(LAG(o_totalprice) OVER w AS DECIMAL(18,2)) AS DECIMAL(38,2)) AS DOUBLE) AS delta_prev,
                 CAST(CAST(CAST(FIRST_VALUE(o_totalprice) OVER w AS DECIMAL(18,2)) AS DECIMAL(38,2)) AS DOUBLE) AS first_price,
                 CASE WHEN date_diff('day', CAST(LAG(o_orderdate) OVER w AS DATE),
                                     CAST(o_orderdate AS DATE)) > 90
                      THEN 1 ELSE 0 END AS new_sess
          FROM orders
          WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        )
        WHERE o_custkey <= 200
        ORDER BY o_custkey, o_orderkey
    """,
    tags=("window",),
)
def window_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function family over one shared sort: lag delta, first_value,
    and gaps-and-islands sessionization (new session when >90 days separate
    consecutive orders; session id = running sum of new-session flags).
    All three expressions reuse the same (o_custkey, order-date) window, so
    the plan sorts each customer partition once — no extra shuffle or sort
    per expression at scale."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    price = _dec("o_totalprice")
    gap_days = F.datediff(
        F.to_date("o_orderdate"), F.to_date(F.lag("o_orderdate").over(w))
    )
    return (
        o.withColumn(
            "delta_prev",
            (price - F.lag(price).over(w)).cast("decimal(38,2)").cast("double"),
        )
        .withColumn(
            "first_price", F.first(price).over(w).cast("decimal(38,2)").cast("double")
        )
        .withColumn("new_sess", F.when(gap_days > 90, F.lit(1)).otherwise(F.lit(0)))
        .withColumn(
            "session_id",
            F.sum("new_sess")
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("bigint"),
        )
        .filter(F.col("o_custkey") <= 200)
        .select("o_custkey", "o_orderkey", "delta_prev", "first_price", "session_id")
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "ntile_buckets",
    "NTILE quartiles over account balances per nation (rank-family window)",
    oracle="""
        SELECT s_nationkey, quartile, COUNT(*) AS n,
               CAST(CAST(MIN(CAST(s_acctbal AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS min_bal
        FROM (
          SELECT s_nationkey, s_acctbal,
                 NTILE(4) OVER (PARTITION BY s_nationkey
                                ORDER BY s_acctbal, s_suppkey) AS quartile
          FROM supplier
        )
        GROUP BY s_nationkey, quartile
        ORDER BY s_nationkey, quartile
    """,
    tags=("window", "agg"),
)
def ntile_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy("s_acctbal", "s_suppkey")
    return (
        s.withColumn("quartile", F.ntile(4).over(w))
        .groupBy("s_nationkey", "quartile")
        .agg(
            F.count("*").alias("n"),
            F.min(_dec("s_acctbal")).cast("decimal(38,2)").cast("double").alias("min_bal"),
        )
        .orderBy("s_nationkey", "quartile")
    )


@register(
    "stats_moments",
    "stddev/variance + exact interpolated median aggregation (sample "
    "moments rounded to absorb summation-order noise in parallel "
    "evaluation; percentile(0.5) is deterministic on sorted doubles in "
    "both engines)",
    oracle="""
        SELECT o_orderstatus,
               CAST(CAST(ROUND(stddev_samp(o_totalprice), 2) AS DECIMAL(18,2)) AS DOUBLE) AS stddev_price,
               CAST(CAST(ROUND(var_samp(o_totalprice), 1) AS DECIMAL(24,1)) AS DOUBLE) AS var_price,
               CAST(CAST(ROUND(quantile_cont(o_totalprice, 0.5), 4) AS DECIMAL(18,4)) AS DOUBLE) AS median_price,
               COUNT(*) AS n
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    tags=("agg",),
)
def stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.round(F.stddev_samp("o_totalprice"), 2)
            .cast("decimal(18,2)")
            .cast("double")
            .alias("stddev_price"),
            F.round(F.var_samp("o_totalprice"), 1)
            .cast("decimal(24,1)")
            .cast("double")
            .alias("var_price"),
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 4)
            .cast("decimal(18,4)")
            .cast("double")
            .alias("median_price"),
            F.count("*").alias("n"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "array_element_stats",
    "Array/higher-order functions over the embedding column: per-label "
    "dimensionality and element extrema (aggregate over ARRAY<FLOAT>)",
    oracle="""
        SELECT label,
               COUNT(*) AS n_vectors,
               MIN(len(embedding)) AS min_dim,
               MAX(len(embedding)) AS max_dim,
               CAST(CAST(ROUND(MIN(list_min(CAST(embedding AS DOUBLE[]))), 5) AS DECIMAL(18,5)) AS DOUBLE) AS global_min,
               CAST(CAST(ROUND(MAX(list_max(CAST(embedding AS DOUBLE[]))), 5) AS DECIMAL(18,5)) AS DOUBLE) AS global_max
        FROM embeddings GROUP BY label ORDER BY label
    """,
    tags=("function", "similarity"),
)
def array_element_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    arr = F.col("embedding").cast("array<double>")
    return (
        e.groupBy("label")
        .agg(
            F.count("*").alias("n_vectors"),
            F.min(F.size("embedding")).alias("min_dim"),
            F.max(F.size("embedding")).alias("max_dim"),
            F.round(F.min(F.array_min(arr)), 5)
            .cast("decimal(18,5)")
            .cast("double")
            .alias("global_min"),
            F.round(F.max(F.array_max(arr)), 5)
            .cast("decimal(18,5)")
            .cast("double")
            .alias("global_max"),
        )
        .orderBy("label")
    )


@register(
    "left_outer_join_nulls",
    "LEFT OUTER join with null-side handling (coalesce over the unmatched "
    "side): every customer with order count incl. zero",
    oracle="""
        SELECT c.c_custkey,
               COALESCE(o.n_orders, 0) AS n_orders,
               CASE WHEN o.n_orders IS NULL THEN 'inactive' ELSE 'active' END AS status
        FROM customer c
        LEFT JOIN (SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey) o
          ON o.o_custkey = c.c_custkey
        ORDER BY c.c_custkey
    """,
    tags=("join", "function"),
)
def left_outer_join_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .select(
            "c_custkey",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.when(F.col("n_orders").isNull(), "inactive")
            .otherwise("active")
            .alias("status"),
        )
        .orderBy("c_custkey")
    )


@register(
    "full_outer_join",
    "FULL OUTER join: nation keys present on customer and/or supplier side",
    oracle="""
        SELECT COALESCE(c.k, s.k) AS nationkey,
               COALESCE(c.n_cust, 0) AS n_cust,
               COALESCE(s.n_supp, 0) AS n_supp
        FROM (SELECT c_nationkey AS k, COUNT(*) AS n_cust FROM customer GROUP BY 1) c
        FULL OUTER JOIN
             (SELECT s_nationkey AS k, COUNT(*) AS n_supp FROM supplier GROUP BY 1) s
          ON c.k = s.k
        ORDER BY nationkey
    """,
    tags=("join",),
)
def full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.count("*").alias("n_cust"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("k"))
        .agg(F.count("*").alias("n_supp"))
    )
    return (
        c.join(s, "k", "full_outer")
        .select(
            F.col("k").alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
        .orderBy("nationkey")
    )


@register(
    "regexp_extract_groups",
    "Regex group extraction + string scalar functions (SURVEY §2.9 C8 "
    "generalized: regexp_extract / upper / substr / replace / length — all "
    "codegen'd; numeric suffix of the source tag drives the grouping)",
    oracle="""
        SELECT CAST(regexp_extract(source, 'src([0-9]+)', 1) AS INT) AS src_num,
               upper(substr(MIN(source), 1, 3)) AS src_prefix,
               replace(MIN(source), 'src', 'S#') AS src_masked,
               MIN(length(source)) AS min_src_len,
               COUNT(*) AS n_docs
        FROM documents GROUP BY src_num ORDER BY src_num
    """,
    tags=("function", "text"),
)
def regexp_extract_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            F.regexp_extract("source", r"src([0-9]+)", 1).cast("int").alias("src_num"),
            F.col("source"),
        )
        .groupBy("src_num")
        .agg(
            F.upper(F.substring(F.min("source"), 1, 3)).alias("src_prefix"),
            F.regexp_replace(F.min("source"), "src", "S#").alias("src_masked"),
            F.min(F.length("source")).alias("min_src_len"),
            F.count("*").alias("n_docs"),
        )
        .orderBy("src_num")
    )


@register(
    "envelope_full_load",
    "The engine's core operator end-to-end as a batch plan: full-load "
    "envelope encode (control events + per-row load events, JSON wire "
    "format) → parse back → aggregate per operation (SURVEY §2.1 S1, §2.2 "
    "K1-K3, §2.4 P3; all JVM-side create_map/to_json/from_json — one "
    "codegen'd scan, no shuffle until the bounded group)",
    oracle="""
        SELECT * FROM (
          SELECT 'load' AS operation, COUNT(*) AS n,
                 CAST(CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_acctbal
          FROM supplier
          UNION ALL SELECT 'drop-table', 1, NULL
          UNION ALL SELECT 'create-table', 1, NULL
        ) ORDER BY operation
    """,
    tags=("envelope", "cdc"),
)
def envelope_full_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_kinesis_rds_mariadb_spark.envelope import (
        control_events,
        encode_data_events,
        parse_json_records,
        to_json_records,
    )
    from sample_dms_kinesis_rds_mariadb_spark.spec import TaskSettings

    settings = TaskSettings()
    s = load_table(spark, sf_dir, "supplier")
    env = control_events(
        spark,
        [("main", "supplier", "drop-table"), ("main", "supplier", "create-table")],
        settings,
    ).drop("_order").unionByName(
        encode_data_events(s, "main", "supplier", "load", settings)
    )
    parsed = parse_json_records(to_json_records(env))
    return (
        parsed.groupBy(F.col("metadata.operation").alias("operation"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("data").getItem("s_acctbal").cast("decimal(18,2)"))
            .cast("decimal(38,2)")
            .cast("double")
            .alias("sum_acctbal"),
        )
        .orderBy("operation")
    )


@register(
    "tumbling_window_counts",
    "Tumbling-window aggregation — the batch-equivalent plan of the "
    "streaming windowed agg (SURVEY §2.10; Structured Streaming shares this "
    "incremental plan with watermarks)",
    oracle="""
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
               COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS n_users
        FROM events
        WHERE event_type = 'click'
        GROUP BY window_start
        ORDER BY window_start
        LIMIT 200
    """,
    tags=("streaming", "agg"),
)
def tumbling_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.filter(F.col("event_type") == "click")
        .groupBy(
            # string-typed window edge: timestamp objects hash differently
            # across engines once a tz attaches; the formatted form doesn't
            F.date_format(
                F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss"
            ).alias("window_start")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("window_start")
        .limit(200)
    )


@register(
    "asof_join_enrich",
    "Backward as-of join: enrich each click event with the latest preceding "
    "purchase by the same user (SURVEY §2.5 extension — the standard "
    "temporal companion of the arrival-ordered stream, reference "
    "run.py:175-188; implemented as union-tag + per-key window carry-forward "
    "in operators/joins.py — ONE shuffle, zero join operators)",
    oracle="""
        WITH probe AS (
            SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
            FROM events WHERE event_type = 'click'
        ),
        build AS (
            SELECT user_id, ts, max_by(value, event_id) AS value
            FROM (
                SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value, event_id
                FROM events WHERE event_type = 'purchase'
            )
            GROUP BY user_id, ts
        )
        SELECT p.event_id, p.user_id,
               strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
               strftime(b.ts, '%Y-%m-%d %H:%M:%S.%f') AS asof_ts,
               b.value AS asof_value
        FROM probe p ASOF LEFT JOIN build b
          ON p.user_id = b.user_id AND p.ts >= b.ts
        ORDER BY p.event_id
    """,
    tags=("join", "temporal"),
)
def asof_join_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_kinesis_rds_mariadb_spark.operators.joins import asof_join

    e = load_table(spark, sf_dir, "events")
    probe = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    # pre-aggregate the build side to unique (user_id, ts) so tie-breaking is
    # deterministic on both engines (max_by event_id picks the same row)
    build = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("value"))
    )
    out = asof_join(probe, build, on="user_id", ts="ts")
    # string-typed timestamps: tz-independent for NTZ on both engines (same
    # convention as tumbling_window_counts)
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", fmt).alias("ts"),
        F.date_format(F.col("asof")["ts"], fmt).alias("asof_ts"),
        F.col("asof")["value"].alias("asof_value"),
    ).orderBy("event_id")


@register(
    "range_join_incidents",
    "Interval (range) join: bucket click events into the 5-minute incident "
    "windows opened by error events, then aggregate per incident (SURVEY "
    "§2.5 extension; time-bucketed equi-join in operators/joins.py replaces "
    "the O(n*m) nested-loop Catalyst would pick for a pure inequality join)",
    oracle="""
        WITH clicks AS (
            SELECT CAST(ts AS TIMESTAMP) AS ts, value
            FROM events WHERE event_type = 'click'
        ),
        incidents AS (
            SELECT event_id AS incident_id,
                   CAST(ts AS TIMESTAMP) AS start_ts,
                   CAST(ts AS TIMESTAMP) + INTERVAL 5 MINUTE AS end_ts
            FROM events WHERE event_type = 'error'
        )
        SELECT i.incident_id,
               COUNT(*) AS n_clicks,
               CAST(CAST(SUM(CAST(c.value AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_value
        FROM clicks c JOIN incidents i
          ON c.ts >= i.start_ts AND c.ts < i.end_ts
        GROUP BY i.incident_id
        ORDER BY i.incident_id
    """,
    tags=("join", "temporal", "agg"),
)
def range_join_incidents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sample_dms_kinesis_rds_mariadb_spark.operators.joins import range_join

    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("ts", "value")
    incidents = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("incident_id"),
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("end_ts"),
    )
    pairs = range_join(
        clicks, incidents, ts="ts", start="start_ts", end="end_ts",
        bucket_seconds=300,
    )
    return (
        pairs.groupBy("incident_id")
        .agg(
            F.count("*").alias("n_clicks"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("decimal(38,6)")
            .cast("double")
            .alias("sum_value"),
        )
        .orderBy("incident_id")
    )


@register(
    "session_windows",
    "Gap-based sessionization: Spark's built-in session_window (the "
    "Structured Streaming session operator, SURVEY §2.10, run in batch "
    "mode) groups each user's events into 30-minute-gap sessions, then a "
    "second aggregation summarizes per user. New session when "
    "ts >= prev_ts + gap — verified against a lag+cumsum SQL formulation",
    oracle="""
        WITH t AS (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
        ),
        s AS (
            SELECT user_id, ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                          OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS new_s
            FROM t
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        g AS (
            SELECT user_id,
                   SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
            FROM s
        ),
        sess AS (
            SELECT user_id, sid, COUNT(*) AS n FROM g GROUP BY user_id, sid
        )
        SELECT user_id,
               COUNT(*) AS n_sessions,
               CAST(SUM(n) AS BIGINT) AS n_events,
               CAST(MAX(n) AS BIGINT) AS max_session_events
        FROM sess
        GROUP BY user_id
        ORDER BY user_id
    """,
    tags=("streaming", "agg", "window"),
)
def session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    sess = (
        e.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count("*").alias("n"))
    )
    return (
        sess.groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("n").alias("n_events"),
            F.max("n").alias("max_session_events"),
        )
        .orderBy("user_id")
    )


@register(
    "table_checksum",
    "Order-independent per-group content checksum — the cross-engine mirror "
    "of engine.validate_table's fold (engine.py canonical(): sorted columns, "
    "null-safe \\x01-joined canonical string, hash, overflow-free "
    "order-independent aggregate). DuckDB has no xxhash64, so both sides "
    "hash with md5 and fold the first 15 hex chars (60 bits, < int64) as an "
    "unbounded-precision SUM — proving the checksum MECHANISM survives "
    "full-table row counts on an independent engine. Output rendered as "
    "string (the parity harness rejects DECIMAL columns).",
    oracle="""
        SELECT o_orderstatus,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(CONCAT('0x', SUBSTR(md5(
                   CONCAT_WS(chr(1),
                       COALESCE(CAST(o_orderkey AS VARCHAR), chr(0) || 'NULL'),
                       COALESCE(CAST(o_custkey AS VARCHAR), chr(0) || 'NULL'),
                       COALESCE(o_orderstatus, chr(0) || 'NULL'),
                       COALESCE(printf('%.2f', o_totalprice), chr(0) || 'NULL'),
                       COALESCE(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'),
                                chr(0) || 'NULL'),
                       COALESCE(o_orderpriority, chr(0) || 'NULL')
                   )), 1, 15)) AS BIGINT)) AS VARCHAR) AS content_checksum
        FROM orders
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    tags=("validation", "agg"),
    extra=True,
)
def table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    canonical = F.concat_ws(
        "\x01",
        F.coalesce(F.col("o_orderkey").cast("string"), F.lit("\x00NULL")),
        F.coalesce(F.col("o_custkey").cast("string"), F.lit("\x00NULL")),
        F.coalesce(F.col("o_orderstatus"), F.lit("\x00NULL")),
        F.coalesce(
            F.format_string("%.2f", F.col("o_totalprice")), F.lit("\x00NULL")
        ),
        F.coalesce(
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"), F.lit("\x00NULL")
        ),
        F.coalesce(F.col("o_orderpriority"), F.lit("\x00NULL")),
    )
    return (
        o.select(
            "o_orderstatus",
            F.conv(F.substring(F.md5(canonical), 1, 15), 16, 10)
            .cast("decimal(38,0)")
            .alias("_h"),
        )
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("_h").cast("string").alias("content_checksum"),
        )
        .orderBy("o_orderstatus")
    )
