"""DSIR — Data Selection with Importance Resampling (Xie et al., NeurIPS
2023): pick raw-corpus documents whose hashed-n-gram distribution looks
like a target corpus, by importance weight under two bag-of-hashed-ngrams
models.

    log w(x) = Σ_{f ∈ ngrams(x)} [ log p̂_target(h(f)) − log p̂_raw(h(f)) ]

then sample without replacement via the Gumbel-top-k trick over
``log w(x) + Gumbel(0,1)`` — here with DETERMINISTIC md5-derived Gumbel
noise (the repo's seeded-verdict discipline: reruns and engines agree).

Scale shape: fitting each distribution is ONE corpus scan (explode hashed
feature ids → hash-aggregate with map-side partials → ``dim``-bounded
collect — the classifier-training bound). Scoring is pure codegen: the
log-ratio vector constant-folds into an array literal (same discipline as
``functions/classify.py::linear_score``; crc32 hashing and left-fold
double addition keep scores bit-reproducible against the Python
reference), and selection is orderBy+limit → TakeOrdered, never a global
sort. No UDF anywhere.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sample_dms_kinesis_rds_mariadb_spark.functions.classify import (
    classifier_features,
    feature_indices,
)


def fit_hashed_distribution(
    df: DataFrame, text_col: str, dim: int = 8192, *, bigrams: bool = True
) -> list[int]:
    """Hashed-n-gram bucket counts over a corpus: one distributed scan
    (explode → groupBy bucket id → count), collected as a dense
    ``dim``-length vector — bounded by ``dim``, not corpus size."""
    idx = feature_indices(
        classifier_features(F.col(text_col), bigrams=bigrams), dim
    )
    rows = (
        df.select(F.explode(idx).alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    counts = [0] * dim
    for r in rows:
        counts[int(r["b"])] = int(r["n"])
    return counts


def dsir_log_ratio(
    target_counts: list[int], raw_counts: list[int], alpha: float = 1.0
) -> list[float]:
    """Per-bucket ``log p̂_target − log p̂_raw`` with add-``alpha``
    smoothing (both distributions must cover every bucket or an unseen
    bucket would score ±inf)."""
    if len(target_counts) != len(raw_counts):
        raise ValueError("distribution dims differ")
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    dim = len(target_counts)
    pt = sum(target_counts) + alpha * dim
    pr = sum(raw_counts) + alpha * dim
    return [
        math.log((t + alpha) / pt) - math.log((r + alpha) / pr)
        for t, r in zip(target_counts, raw_counts)
    ]


def dsir_log_weight(
    text: Column, log_ratio: list[float], *, bigrams: bool = True
) -> Column:
    """Σ log-ratio over the document's hashed n-grams as a pure-codegen
    fold — the log importance weight. Empty documents score 0 (weight 1:
    no evidence either way). Left-to-right fold in document order, so the
    double sum bit-matches the Python reference."""
    dim = len(log_ratio)
    wlit = F.lit([float(w) for w in log_ratio])
    idx = feature_indices(classifier_features(text, bigrams=bigrams), dim)
    return F.aggregate(
        idx, F.lit(0.0), lambda acc, i: acc + F.element_at(wlit, i + F.lit(1))
    )


def _gumbel(key: Column, seed: str) -> Column:
    """Deterministic Gumbel(0,1) noise from md5(seed|key): u ∈ (0,1) off
    the first 8 hex digits (+0.5 offset keeps u strictly interior), then
    −log(−log u). Engine-independent and rerun-stable."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws("|", F.lit(seed), key.cast("string"))), 1, 8),
        16,
        10,
    ).cast("bigint")
    u = (h % F.lit(1_000_000) + F.lit(0.5)) / F.lit(1_000_000.0)
    return -F.log(-F.log(u))


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    text_col: str,
    n: int,
    id_col: str,
    dim: int = 8192,
    alpha: float = 1.0,
    seed: str = "dsir",
    *,
    bigrams: bool = True,
) -> DataFrame:
    """The full DSIR pipeline: fit target + raw hashed distributions (one
    scan each), attach ``dsir_log_w`` and the Gumbel-perturbed
    ``dsir_key``, keep the top ``n`` by key (Gumbel-top-k == sampling
    n docs without replacement with probability ∝ w(x)). Ties on the key
    break by id for determinism. Returns the selected rows with both
    score columns attached."""
    p = fit_hashed_distribution(target, text_col, dim, bigrams=bigrams)
    q = fit_hashed_distribution(raw, text_col, dim, bigrams=bigrams)
    ratio = dsir_log_ratio(p, q, alpha)
    scored = raw.withColumn(
        "dsir_log_w", dsir_log_weight(F.col(text_col), ratio, bigrams=bigrams)
    ).withColumn(
        "dsir_key", F.col("dsir_log_w") + _gumbel(F.col(id_col), seed)
    )
    return scored.orderBy(F.col("dsir_key").desc(), F.col(id_col)).limit(n)


def reference_log_weight(
    text: str, log_ratio: list[float], *, bigrams: bool = True
) -> float:
    """Independent driver-side mirror (zlib crc32, same feature order,
    left-fold addition) — validate a log-ratio vector against a sample
    before a 100 TB selection run."""
    import zlib

    from sample_dms_kinesis_rds_mariadb_spark.functions.text import (
        py_clean_tokens,
    )

    toks = py_clean_tokens(text)
    feats = list(toks)
    if bigrams:
        feats += [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    dim = len(log_ratio)
    total = 0.0
    for f in feats:
        total = total + log_ratio[zlib.crc32(f.encode("utf-8")) % dim]
    return total
