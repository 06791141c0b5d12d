"""Salted skew-handling: results must equal the direct (unsalted) plans."""

from pyspark.sql import functions as F

from sample_dms_kinesis_rds_mariadb_spark.operators.skew import (
    salted_aggregate,
    salted_broadcast_left_join,
)
from sample_dms_kinesis_rds_mariadb_spark.plans.queries import load_table

SF = "/root/testdata/sf0.001"


def test_salted_aggregate_matches_direct(spark):
    e = load_table(spark, SF, "events")
    direct = {
        (r["user_id"],): (r["cnt"], round(r["sum_v"], 4))
        for r in e.groupBy("user_id")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 4).alias("sum_v"))
        .collect()
    }
    salted = {
        (r["user_id"],): (r["cnt"], round(r["sum_v"], 4))
        for r in salted_aggregate(
            e,
            ["user_id"],
            partial_aggs={"cnt": F.count("*"), "sum_v": F.sum("value")},
            merge_aggs={"cnt": F.sum("cnt"), "sum_v": F.round(F.sum("sum_v"), 4)},
        ).collect()
    }
    assert salted == direct


def test_salted_join_matches_direct_left(spark):
    li = load_table(spark, SF, "lineitem")
    # restrict the small side so some big-side keys are UNMATCHED — the left
    # join must keep them with nulls (round-1 version silently inner-joined)
    orders = (
        load_table(spark, SF, "orders")
        .filter(F.col("o_orderkey") % 2 == 0)
        .select("o_orderkey", "o_orderstatus")
    )
    li = li.withColumnRenamed("l_orderkey", "o_orderkey")
    direct = li.join(orders, "o_orderkey", "left")
    salted = salted_broadcast_left_join(li, orders, "o_orderkey")
    assert salted.count() == direct.count()
    assert (
        salted.filter(F.col("o_orderstatus").isNull()).count()
        == direct.filter(F.col("o_orderstatus").isNull()).count()
        > 0
    )


def test_key_skew_profile_finds_hot_key(spark):
    from sample_dms_kinesis_rds_mariadb_spark.operators.skew import (
        key_skew_profile,
    )

    rows = [("hot",)] * 800 + [("warm",)] * 150 + [(f"k{i}",) for i in range(50)]
    df = spark.createDataFrame(rows, "k string")
    prof = key_skew_profile(df, "k", top_n=3).collect()
    assert [r["k"] for r in prof] == ["hot", "warm", "k0"]
    assert prof[0]["n"] == 800 and abs(prof[0]["share"] - 0.8) < 1e-9
    assert prof[1]["n"] == 150 and abs(prof[1]["share"] - 0.15) < 1e-9


def test_partition_size_histogram_sums_to_total(spark):
    from sample_dms_kinesis_rds_mariadb_spark.operators.skew import (
        partition_size_histogram,
    )

    df = spark.range(1000).repartition(8, "id")
    hist = partition_size_histogram(df).collect()
    assert sum(r["n"] for r in hist) == 1000
    assert len(hist) <= 8


def test_partition_size_histogram_shows_empty_partitions(spark):
    """Empty partitions are the imbalance being diagnosed — they must show
    as explicit zero rows, not vanish from the histogram."""
    from sample_dms_kinesis_rds_mariadb_spark.operators.skew import (
        partition_size_histogram,
    )

    df = spark.createDataFrame([("a",)] * 100, "k string").repartition(8, "k")
    hist = partition_size_histogram(df).collect()
    assert len(hist) == 8
    assert sum(r["n"] for r in hist) == 100
    assert sum(1 for r in hist if r["n"] == 0) == 7  # one key -> one bucket


def test_aqe_skew_join_splits_hot_partition(spark):
    """Evidence that the session's AQE skew-join handling actually fires:
    a hot-key sort-merge join ends up SortMergeJoin(skew=true) with the
    skewed side's AQEShuffleRead marked skewed. Notable constraint (why
    the dim side is a plain shuffle): OptimizeSkewedJoin matches
    SMJ(Sort(ShuffleRead), Sort(ShuffleRead)) — an aggregation between the
    sort and the shuffle read on EITHER side defeats the split, so joins
    against freshly-aggregated frames should materialize or salt instead
    of relying on AQE."""
    conf = spark.conf
    keys = [
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.autoBroadcastJoinThreshold",
    ]
    saved = {}
    for k in keys:
        try:
            saved[k] = conf.get(k)
        except Exception:
            saved[k] = None
    try:
        # local-mode partitions are tiny; lower the size thresholds so the
        # ~9 MB hot partition (95% of rows on one key, incompressible md5
        # payload) qualifies as skewed
        conf.set(keys[0], "262144")
        conf.set(keys[1], "65536")
        conf.set(keys[2], "2")
        conf.set(keys[3], "-1")  # force a shuffle join, not broadcast
        big = (
            spark.range(200000)
            .withColumn(
                "k",
                F.when(F.col("id") % 100 < 95, F.lit(0))
                .otherwise((F.col("id") % 7) + 1)
                .cast("int"),
            )
            .withColumn("pay", F.md5(F.col("id").cast("string")))
        )
        dim = spark.range(8).select(
            F.col("id").cast("int").alias("k"), (F.col("id") * 10).alias("v")
        )
        out = big.join(dim, "k")
        assert len(out.collect()) == 200000  # finalizes THIS plan
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan
        assert "skewed" in plan  # the hot side's AQEShuffleRead
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)
