"""Similarity search over embedding columns (north-star op).

- ``brute_force_topk``: exact cosine top-k vs a probe vector. One scan, one
  TakeOrdered — the correctness baseline. At 100 TB this is a full-scan
  operator (fine for one-off probes; batch probes should use the LSH path).
- ``lsh_bucketed_topk``: random-hyperplane LSH — the scale path. Vectors
  hash to a sign-pattern bucket; a probe only scans its own bucket
  (multi-probe: + neighboring buckets at hamming distance 1). Planes are
  seeded deterministically so bucketing is reproducible across runs/sessions.
- ``cosine_self_join_topk``: all-pairs top-k within LSH buckets (embedding
  near-dup dedup support).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sample_dms_kinesis_rds_mariadb_spark.functions.vectors import (
    cosine_similarity,
    dot,
    to_double_array,
)


def _probe_lit(probe: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in probe]).cast("array<double>")


def brute_force_topk(
    df: DataFrame,
    probe: list[float],
    k: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine vs a probe vector. orderBy+limit compiles to
    TakeOrdered (per-partition heap + driver merge of k·P rows), never a
    global sort."""
    sim = cosine_similarity(to_double_array(F.col(vec_col)), _probe_lit(probe))
    return (
        df.select(F.col(id_col), sim.alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )


def hyperplanes(dim: int, n_planes: int = 8, seed: int = 42) -> np.ndarray:
    """Deterministic random hyperplanes for sign-LSH."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket(vec: Column, planes: np.ndarray) -> Column:
    """Sign-pattern bucket id: bit i = sign(vec · plane_i). Pure expressions
    (one dot product per plane), no UDF."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        d = dot(vec, F.array(*[F.lit(float(x)) for x in plane]).cast("array<double>"))
        bucket = bucket + F.when(d > 0, F.lit(1 << i).cast("long")).otherwise(0)
    return bucket


def with_lsh_buckets(
    df: DataFrame, vec_col: str = "embedding", n_planes: int = 8, seed: int = 42
) -> DataFrame:
    """Attach the LSH bucket column; persist/bucket-by this for repeated
    probes (the 'index build' of this ANN scheme)."""
    dim = len(df.select(vec_col).first()[0])
    planes = hyperplanes(dim, n_planes, seed)
    return df.withColumn(
        "lsh_bucket", lsh_bucket(to_double_array(F.col(vec_col)), planes)
    )


def lsh_bucketed_topk(
    df: DataFrame,
    probe: list[float],
    k: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 42,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: score only vectors in the probe's bucket (and, with
    multiprobe, buckets at hamming distance 1 — recall boost for boundary
    vectors). Bucket filter prunes the scan before any vector math runs."""
    dim = len(probe)
    planes = hyperplanes(dim, n_planes, seed)
    signs = planes @ np.asarray(probe, dtype=float)
    probe_bucket = int(sum(1 << i for i, s in enumerate(signs) if s > 0))
    buckets = [probe_bucket]
    if multiprobe:
        buckets += [probe_bucket ^ (1 << i) for i in range(n_planes)]

    bucketed = with_lsh_buckets(df, vec_col, n_planes, seed)
    sim = cosine_similarity(to_double_array(F.col(vec_col)), _probe_lit(probe))
    return (
        bucketed.filter(F.col("lsh_bucket").isin(buckets))
        .select(F.col(id_col), sim.alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )


def ivf_assignments(
    df: DataFrame,
    n_lists: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    sample_fraction: float = 1.0,
) -> tuple[DataFrame, list[list[float]]]:
    """IVF index build: KMeans centroids (Spark ML, seeded ⇒ reproducible)
    + per-vector nearest-centroid assignment.

    The scale path for repeated probes: cluster once (sampled training at
    100 TB — `sample_fraction`), store `ivf_list` alongside the vectors
    (partition/bucket by it), and probes scan only their nearest lists.
    Returns (assigned_df, centroids).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    vecs = df.select(
        F.col(id_col), array_to_vector(to_double_array(F.col(vec_col))).alias("features")
    )
    train = vecs if sample_fraction >= 1.0 else vecs.sample(sample_fraction, seed)
    model = KMeans(k=n_lists, seed=seed, featuresCol="features").fit(train)
    assigned = (
        model.transform(vecs)
        .select(
            id_col,
            F.col("prediction").alias("ivf_list"),
            vector_to_array("features").alias("_v"),
        )
    )
    centroids = [[float(x) for x in c] for c in model.clusterCenters()]
    out = df.join(assigned.select(id_col, "ivf_list"), id_col)
    return out, centroids


def ivf_topk(
    df: DataFrame,
    probe: list[float],
    k: int = 20,
    n_lists: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via IVF: score only vectors in the ``n_probe``
    lists whose centroids are closest to the probe. List pruning happens
    before any per-vector math — at scale, with the table partitioned by
    ``ivf_list``, this is partition pruning on the scan."""
    import numpy as np

    assigned, centroids = ivf_assignments(
        df, n_lists=n_lists, id_col=id_col, vec_col=vec_col, seed=seed
    )
    c = np.asarray(centroids)
    p = np.asarray(probe, dtype=float)
    dists = ((c - p) ** 2).sum(axis=1)
    probe_lists = [int(i) for i in np.argsort(dists)[:n_probe]]

    sim = cosine_similarity(to_double_array(F.col(vec_col)), _probe_lit(probe))
    return (
        assigned.filter(F.col("ivf_list").isin(probe_lists))
        .select(F.col(id_col), sim.alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )


def cosine_self_join_topk(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Embedding near-duplicate pairs: all pairs within one LSH bucket with
    cosine ≥ threshold. The self-join key is the bucket — quadratic only in
    bucket occupancy (expected n/2^planes), linear in corpus size."""
    b = with_lsh_buckets(df, vec_col, n_planes, seed)
    a = b.select(
        F.col("lsh_bucket"),
        F.col(id_col).alias("id_a"),
        to_double_array(F.col(vec_col)).alias("va"),
    )
    c = b.select(
        F.col("lsh_bucket"),
        F.col(id_col).alias("id_b"),
        to_double_array(F.col(vec_col)).alias("vb"),
    )
    return (
        a.join(c, "lsh_bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine_sim", cosine_similarity(F.col("va"), F.col("vb")))
        .filter(F.col("cosine_sim") >= threshold)
        .select("id_a", "id_b", "cosine_sim")
        .distinct()
    )
