"""Skew-handling utilities (SURVEY §7 M6: 'skewed keys → salting or AQE').

AQE's skew-join handling is on by default in the engine session; these are
the explicit techniques for the cases AQE can't fix:

- ``salted_aggregate``: two-phase aggregation for hot grouping keys. Phase 1
  groups on (key, salt) — the hot key's rows spread over S reducers — phase 2
  re-aggregates the S partials per key. Correct for any algebraic aggregate
  expressed as (partial, merge) pairs.
- ``salted_broadcast_left_join``: replicate-the-small-side salting for joins
  where one key dominates and the small side can't broadcast whole.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt_col(salt_buckets: int):
    """Uniform random salt bucket in one codegen op — rand() is already
    uniform, so hashing it first (the previous form) was redundant work;
    one definition also keeps the two salted operators' salt TYPE aligned."""
    return (F.rand(seed=7) * F.lit(salt_buckets)).cast("int")


def salted_aggregate(
    df: DataFrame,
    key_cols: list[str],
    partial_aggs: dict[str, Column],
    merge_aggs: dict[str, Column],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``partial_aggs``: output name → aggregate over the raw rows (phase 1).
    ``merge_aggs``: output name → aggregate over the phase-1 partials
    (referencing the phase-1 output names). Example::

        salted_aggregate(
            events, ["user_id"],
            partial_aggs={"cnt": F.count("*"), "sum_v": F.sum("value")},
            merge_aggs={"cnt": F.sum("cnt"), "sum_v": F.sum("sum_v")},
        )
    """
    salted = df.withColumn(
        "_salt", _salt_col(salt_buckets)
    )
    phase1 = salted.groupBy(*key_cols, "_salt").agg(
        *[c.alias(name) for name, c in partial_aggs.items()]
    )
    return phase1.groupBy(*key_cols).agg(
        *[c.alias(name) for name, c in merge_aggs.items()]
    )


def salted_broadcast_left_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """LEFT-join a skewed big side to a small side by salting the big side
    and exploding the small side across all salt values (small side stays
    broadcastable at `|small| × salt_buckets`).

    True left semantics: the exploded small side carries EVERY salt value
    for every key, so a big row matches iff its key exists in ``small`` —
    unmatched big rows survive with nulls, exactly ``big.join(small, key,
    "left")``.
    """
    big_salted = big.withColumn(
        "_salt", _salt_col(salt_buckets)
    )
    small_exploded = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return big_salted.join(
        F.broadcast(small_exploded), [key, "_salt"], "left"
    ).drop("_salt")


def key_skew_profile(
    df: DataFrame,
    key_cols: list[str] | str,
    top_n: int = 20,
) -> DataFrame:
    """The decision input for the two utilities above: the ``top_n`` hottest
    keys with their row count and share of the total.

    A key whose ``share`` approaches ``1 / parallelism`` is a straggler
    candidate — route it through ``salted_aggregate`` /
    ``salted_broadcast_left_join`` (or trust AQE's skew-join split if it is
    a join input). Scale shape: the per-key count is a map-side-combined
    groupBy (the hot key collapses to one partial per upstream partition
    BEFORE the shuffle, so profiling skew never suffers from it); the total
    is a one-row aggregate joined in by broadcast; top-n is TakeOrdered —
    no global sort.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    counts = df.groupBy(*keys).agg(F.count("*").alias("n"))
    total = counts.agg(F.sum("n").alias("_total"))
    return (
        counts.join(F.broadcast(total))
        .select(
            *keys,
            "n",
            (F.col("n") / F.col("_total")).alias("share"),
        )
        .orderBy(F.desc("n"), *keys)
        .limit(top_n)
    )


def partition_size_histogram(df: DataFrame) -> DataFrame:
    """Rows per physical partition of ``df`` AS CURRENTLY PARTITIONED —
    the empirical view of whether a chosen partitioning balanced (e.g.
    after ``repartition(keys)`` or a custom bucketing). One narrow
    ``spark_partition_id`` tag + a tiny groupBy (≤ #partitions rows),
    densified against the planned partition count so EMPTY partitions show
    as explicit zero rows — they are precisely the imbalance a user is
    looking for. (The ``df.rdd`` partition probe may execute upstream
    shuffle stages under AQE; this is a diagnostic tool, not a pipeline
    stage.)"""
    n_parts = df.rdd.getNumPartitions()
    counts = (
        df.select(F.spark_partition_id().alias("partition_id"))
        .groupBy("partition_id")
        .agg(F.count("*").alias("n"))
    )
    all_ids = df.sparkSession.range(n_parts).select(
        F.col("id").cast("int").alias("partition_id")
    )
    # FULL outer, not left: the rdd probe and the counts aggregation are two
    # independent executions of df — if the second run plans MORE partitions
    # (source gained files in between, AQE re-plan), a left join from the
    # probe's id range would silently DROP those counts and break the
    # sum(hist) == row-count invariant
    return (
        all_ids.join(counts, "partition_id", "full")
        .select(
            "partition_id",
            F.coalesce("n", F.lit(0)).alias("n"),
        )
        .orderBy("partition_id")
    )
