"""Approximate sketches for corpus curation at 100 TB: quantile thresholds,
heavy hitters, vocabulary top-k.

Exact order statistics need a global sort (full shuffle of the corpus) and
exact frequency needs per-key state proportional to cardinality; at 100 TB
the scale path is a mergeable sketch computed map-side. Everything here
stays JVM-side (Spark's built-in GK/approx aggregates or plain partial
aggregation) and nothing collects data rows to the driver — thresholds flow
back into the plan through a broadcast of a one-row aggregate, so the gate
composes with any downstream plan.

The typical use is quality gating — "keep documents above the q-th quality
percentile" — where an approximate threshold is semantically fine: the
threshold itself is a heuristic, and rel_err on the *rank* (percentile_approx
guarantees rank error <= accuracy) translates to a boundary fuzz far smaller
than the noise of any quality score.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sample_dms_kinesis_rds_mariadb_spark.operators.sampling import hash_sample


def approx_quantiles(
    df: DataFrame,
    col: str,
    probs: list[float],
    rel_err: float = 0.01,
    by: list[str] | None = None,
) -> DataFrame:
    """Approximate quantiles of ``col`` via Spark's GK sketch
    (``percentile_approx``): one mergeable aggregate, no global sort.

    Returns one row per group (or a single row) with an array column
    ``quantiles`` aligned with ``probs``. ``rel_err`` is the guaranteed
    rank error: each returned value's true rank is within
    ``rel_err * n`` of the requested one.
    """
    if not probs:
        raise ValueError("probs must be non-empty")
    for p in probs:
        if not 0.0 <= p <= 1.0:
            raise ValueError(f"probs must be in [0,1], got {p}")
    accuracy = max(1, int(1.0 / max(rel_err, 1e-6)))
    agg = F.percentile_approx(
        F.col(col), F.array(*[F.lit(p) for p in probs]), F.lit(accuracy)
    ).alias("quantiles")
    if by:
        return df.groupBy(*by).agg(agg)
    return df.agg(agg)


def filter_above_quantile(
    df: DataFrame, col: str, q: float, rel_err: float = 0.01
) -> DataFrame:
    """Keep rows with ``col`` >= the approximate ``q``-th quantile.

    The threshold is a ONE-ROW aggregate broadcast back into the plan (a
    1-row nested-loop broadcast is a constant, not a join explosion) — no
    ``collect``, no driver round-trip, so the gate chains lazily inside a
    bigger pipeline and recomputes consistently on retry.
    """
    thr = approx_quantiles(df, col, [q], rel_err=rel_err).select(
        F.element_at("quantiles", 1).alias("_q_threshold")
    )
    return (
        df.crossJoin(F.broadcast(thr))
        .filter(F.col(col) >= F.col("_q_threshold"))
        .drop("_q_threshold")
    )


def heavy_hitters(df: DataFrame, col: str, k: int = 100) -> DataFrame:
    """Exact top-k most frequent values of ``col``.

    groupBy + count is already the scale shape — map-side partial
    aggregation collapses each partition to its distinct values before the
    shuffle, and the top-k is TakeOrdered (no global sort). This is exact
    and preferable whenever distinct-value cardinality is bounded (labels,
    languages, domains). For unbounded cardinality under a fixed budget,
    use :func:`heavy_hitters_sampled`.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    return (
        df.groupBy(F.col(col).alias("value"))
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "value")
        .limit(k)
    )


def heavy_hitters_sampled(
    df: DataFrame,
    col: str,
    key_col: str,
    k: int = 100,
    sample_rate: float = 0.01,
    salt: str = "hh",
) -> DataFrame:
    """Estimated top-k frequencies from a deterministic hash sample.

    Rows are sampled by ``md5(salt|key_col)`` (operators/sampling.py) so the
    sample — and therefore the estimate — is reproducible run-to-run; counts
    scale up by ``1/sample_rate`` (``n_est``). Relative error for a value
    with true count c is ~ 1/sqrt(c * rate), so hot values (the ones top-k
    cares about) are accurate while the long tail never enters the shuffle:
    per-key state is bounded by the sample's cardinality, not the corpus's.

    PRECONDITION: ``key_col`` must be a row-unique id UNCORRELATED with
    ``col`` (hash sampling keeps ALL rows of kept keys — cluster sampling).
    Passing ``key_col == col`` or any correlated key makes ``n_est``
    either ~1/rate× a value's true count or 0; the error formula above
    holds only for row-unique keys.
    """
    if not 0.0 < sample_rate <= 1.0:
        raise ValueError(f"sample_rate must be in (0,1], got {sample_rate}")
    sampled = hash_sample(df, key_col, sample_rate, salt=salt)
    return (
        sampled.groupBy(F.col(col).alias("value"))
        .agg(F.round(F.count("*") / F.lit(sample_rate)).cast("long").alias("n_est"))
        .orderBy(F.desc("n_est"), "value")
        .limit(k)
    )


def top_tokens(df: DataFrame, text_col: str, k: int = 1000) -> DataFrame:
    """Vocabulary top-k: most frequent whitespace tokens of normalized text
    — the first pass of any tokenizer/stopword-list build.

    explode → partial-agg count → TakeOrdered. The explode inflates rows,
    but the partial aggregation collapses each partition to its distinct
    tokens before the shuffle, so shuffle volume is bounded by per-partition
    vocabulary, not token count.
    """
    from sample_dms_kinesis_rds_mariadb_spark.functions.text import clean_tokens

    # clean_tokens drops the '' a blank doc splits to — without it every
    # empty/whitespace-only document votes the empty string into the vocab
    toks = df.select(F.explode(clean_tokens(F.col(text_col))).alias("value"))
    return (
        toks.groupBy("value")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "value")
        .limit(k)
    )


def distinct_sketch(
    df: DataFrame,
    value_col: str,
    by: list[str] | None = None,
    lg_k: int = 12,
) -> DataFrame:
    """Mergeable HLL distinct-count sketch of ``value_col`` (per group when
    ``by`` is given): column ``sketch`` (binary, Apache DataSketches HLL,
    Spark's public ``hll_sketch_agg``) + ``estimate`` (approx distinct).

    Why a sketch column and not ``approx_count_distinct``: the SKETCH is the
    mergeable partial — persist per-partition/per-day sketches once, then
    answer any rollup ("distinct users this quarter") by merging kilobyte
    sketches instead of rescanning 100 TB. ``lg_k=12`` gives ~1.6% relative
    standard error in 4 KB; raise to 14-16 for tighter bounds.
    """
    keys = by or []
    grouped = df.groupBy(*keys) if keys else df.groupBy()
    out = grouped.agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias("sketch")
    )
    return out.withColumn(
        "estimate", F.hll_sketch_estimate(F.col("sketch"))
    )


def merge_distinct_sketches(
    sketches: DataFrame,
    by: list[str] | None = None,
    sketch_col: str = "sketch",
) -> DataFrame:
    """Roll pre-computed HLL sketches up to coarser groups (or one total):
    ``hll_union_agg`` over kilobyte sketch blobs — the 100 TB rollup that
    never touches row data. Output shape matches ``distinct_sketch``."""
    keys = by or []
    grouped = sketches.groupBy(*keys) if keys else sketches.groupBy()
    out = grouped.agg(
        F.hll_union_agg(F.col(sketch_col), F.lit(True)).alias("sketch")
    )
    return out.withColumn(
        "estimate", F.hll_sketch_estimate(F.col("sketch"))
    )


def _cms_cells(value: F.Column, depth: int, width: int) -> F.Column:
    """ARRAY<STRUCT<r,c>> of the value's count-min cells: row r uses
    xxhash64 salted with r (deterministic across runs/engines), column =
    pmod(hash, width). Inline array — no per-row explode cost until the
    caller chooses to explode."""
    return F.array(
        *[
            F.struct(
                F.lit(r).alias("r"),
                F.pmod(F.xxhash64(F.lit(r), value), F.lit(width)).alias("c"),
            )
            for r in range(depth)
        ]
    )


def cms_build(
    df: DataFrame,
    col: str,
    depth: int = 5,
    width: int = 8192,
    by: list[str] | None = None,
) -> DataFrame:
    """Mergeable count-min sketch of ``col`` frequencies (per group when
    ``by`` is given): sparse cell rows ``(by..., r, c, cnt)`` — the
    point-frequency twin of :func:`distinct_sketch`'s HLL. Persist
    per-day/per-shard sketches once; answer "how often did THIS domain /
    token / url appear" over any span by merging ≤ depth×width cell rows
    per sketch instead of rescanning the corpus. Estimates are biased UP
    only (classic CMS guarantee): error ≤ e/width × N with prob 1-e^-depth.

    Scale shape: the corpus-sized shuffle is the per-item exact count
    (needed by any frequency computation); cells fan out from the DISTINCT
    items only, and the result is bounded by depth×width rows per group
    regardless of corpus size. Build/merge/query must share depth+width
    (cell hashes are salted xxhash64, engine-stable).
    """
    keys = list(by or [])
    items = (
        df.groupBy(*keys, F.col(col).alias("value"))
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("cell", F.explode(_cms_cells(F.col("value"), depth, width)))
    )
    return (
        items.groupBy(*keys, F.col("cell.r").alias("r"), F.col("cell.c").alias("c"))
        .agg(F.sum("n").alias("cnt"))
    )


def cms_merge(sketches: DataFrame, by: list[str] | None = None) -> DataFrame:
    """Merge count-min sketches (same depth/width): cell-wise sum — the
    union sketch is EXACTLY the sketch of the unioned corpora, so rollups
    lose nothing vs re-sketching (asserted cell-identical in tests).
    Coarser ``by`` than the build's rolls groups up, like
    :func:`merge_distinct_sketches`."""
    keys = list(by or [])
    return sketches.groupBy(*keys, "r", "c").agg(F.sum("cnt").alias("cnt"))


def cms_query(
    sketch: DataFrame,
    items: DataFrame,
    col: str,
    depth: int = 5,
    width: int = 8192,
) -> DataFrame:
    """Approximate frequency of each item in ``items[col]``: min over the
    item's depth cells (a cell absent from the sparse sketch is 0). The
    SKETCH side broadcasts — it is ≤ depth×width cell rows by construction
    regardless of corpus size — so arbitrarily many probe items stream
    through a broadcast hash join with no shuffle on either side.
    Queries an UNGROUPED sketch — filter a grouped build to one group (or
    roll groups up via :func:`cms_merge` with ``by=[]``) first."""
    probes = items.select(F.col(col).alias("value")).distinct().withColumn(
        "cell", F.explode(_cms_cells(F.col("value"), depth, width))
    ).select("value", F.col("cell.r").alias("r"), F.col("cell.c").alias("c"))
    joined = probes.join(F.broadcast(sketch), ["r", "c"], "left").na.fill(
        {"cnt": 0}
    )
    return joined.groupBy("value").agg(F.min("cnt").alias("estimate"))
