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
        "_salt", F.pmod(F.xxhash64(F.rand(seed=7)), F.lit(salt_buckets))
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
        "_salt", F.pmod(F.xxhash64(F.rand(seed=7)), F.lit(salt_buckets)).cast("int")
    )
    small_exploded = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return big_salted.join(
        F.broadcast(small_exploded), [key, "_salt"], "left"
    ).drop("_salt")
