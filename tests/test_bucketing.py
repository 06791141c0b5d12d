"""Bucketed-table co-located join: the planner must elide the shuffle when
both sides share the bucket spec (SURVEY §7 M6 scale path)."""

import contextlib
import io

import pytest

from sample_dms_kinesis_rds_mariadb_spark.plans.queries import load_table
from sample_dms_kinesis_rds_mariadb_spark.sinks.bucketed import (
    bucketed_join,
    write_bucketed,
)

SF = "/root/testdata/sf0.001"


def _physical_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture()
def bucketed_tables(spark, tmp_path):
    orders = load_table(spark, SF, "orders")
    lineitem = load_table(spark, SF, "lineitem")
    write_bucketed(
        orders, "b_orders", str(tmp_path / "orders"), "o_orderkey", 8, "o_orderkey"
    )
    write_bucketed(
        lineitem,
        "b_lineitem",
        str(tmp_path / "lineitem"),
        "l_orderkey",
        8,
        "l_orderkey",
    )
    yield orders, lineitem
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_elides_shuffle(spark, bucketed_tables):
    orders, lineitem = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a non-broadcast join so the Exchange question is real
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bucketed_join(
            spark,
            "b_lineitem",
            "b_orders",
            on=spark.table("b_lineitem").l_orderkey
            == spark.table("b_orders").o_orderkey,
        )
        plan = _physical_plan(joined)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange" not in plan, "bucketed join still shuffles"

        # identical join on plain parquet DOES shuffle — the control
        plain = lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        plain_plan = _physical_plan(plain)
        assert "Exchange" in plain_plan

        # results identical
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
