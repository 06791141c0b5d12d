"""Vector functions over ARRAY<FLOAT|DOUBLE> embedding columns.

Built on `F.zip_with` / `F.aggregate` — higher-order functions evaluated
JVM-side per row, no Python round-trip — the scan-speed path for
similarity search over billions of embeddings. Accumulation order is
element order (left fold), so results are bit-deterministic for a given
row in any engine that folds left-to-right (DuckDB's list_inner_product
matches; verified by the oracle harness).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(col: Column) -> Column:
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def euclidean_distance(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
