"""Document chunking, sequence packing, and PII redaction — the
text-preparation stages between a curated corpus and a training run.

Scale shapes:

- ``chunk_by_tokens`` is pure JVM array algebra (tokenize → window slices →
  posexplode). No Python workers, no shuffle: a narrow map over the corpus.
- ``pack_sequences`` is exact greedy bin packing, which is inherently a
  sequential scan — so it runs the scan *per hash bucket* with Arrow-batched
  ``applyInPandas``: buckets are independent, the driver never sees a row,
  and parallelism = number of buckets. This is the documented "Spark lacks
  the operator → applyInPandas" escape hatch, not a hot-path UDF habit.
- ``redact_pii`` is a chain of codegen'd ``regexp_replace`` — no UDF.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sample_dms_kinesis_rds_mariadb_spark.functions.hashing import (
    normalize_text,
    tokenize,
)


def chunk_by_tokens(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_tokens: int,
    overlap: int = 0,
) -> DataFrame:
    """Split each document into chunks of at most ``max_tokens`` whitespace
    tokens, with ``overlap`` tokens shared between consecutive chunks.

    Output: (id, chunk_id, chunk_text, n_tokens) — chunk_id is 0-based and
    per-document contiguous; empty documents yield zero chunks. All JVM:
    ``sequence`` generates the chunk start offsets, ``slice`` cuts the token
    array, ``posexplode`` flattens. One narrow projection, no shuffle.
    """
    if max_tokens < 1:
        raise ValueError("max_tokens must be >= 1")
    if not 0 <= overlap < max_tokens:
        raise ValueError("overlap must be in [0, max_tokens)")
    step = max_tokens - overlap
    # THE shared tokenization (drops the [''] a blank doc splits to)
    from sample_dms_kinesis_rds_mariadb_spark.functions.text import clean_tokens

    toks = clean_tokens(F.col(text_col))
    # chunk starts: 1, 1+step, 1+2*step, ... (slice() is 1-based); the last
    # chunk starts at or before the final token. The sequence stops at
    # size-overlap so an overlap-only tail never forms its own chunk.
    starts = F.when(
        F.size(toks) > 0,
        F.sequence(F.lit(1), F.greatest(F.size(toks) - F.lit(overlap), F.lit(1)), F.lit(step)),
    ).otherwise(F.array().cast("array<int>"))
    chunks = F.transform(
        starts, lambda s: F.slice(toks, s, F.lit(max_tokens))
    )
    out = df.select(
        F.col(id_col),
        F.posexplode(chunks).alias("chunk_id", "_chunk_toks"),
    )
    return out.select(
        id_col,
        "chunk_id",
        F.array_join("_chunk_toks", " ").alias("chunk_text"),
        F.size("_chunk_toks").alias("n_tokens"),
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    max_len: int,
    n_buckets: int = 256,
) -> DataFrame:
    """Greedy first-fit-by-order sequence packing: assign each document to a
    pack so every pack's total token count is <= ``max_len``.

    Documents are hash-partitioned into ``n_buckets`` independent buckets
    (pack ids are globally unique as ``bucket * 2^32 + local``), sorted by
    id within the bucket for determinism, then packed by the exact greedy
    rule — start a new pack when adding the next document would overflow.
    Documents longer than ``max_len`` get a pack of their own.

    Exact greedy is a sequential scan, so it runs inside Arrow-batched
    ``applyInPandas`` per bucket — parallel across buckets, no driver data.
    Returns the input columns plus ``pack_id`` and ``pack_total``
    (the pack's final token total, repeated on each member row).
    """
    if max_len < 1:
        raise ValueError("max_len must be >= 1")
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")

    from pyspark.sql.types import LongType, StructField, StructType

    tagged = df.withColumn(
        # NULL sizes count as 0 (the budget_shard_column rule): a NULL long
        # becomes NaN at the Arrow boundary and astype('int64') would kill
        # the whole job with an opaque pandas error
        n_tokens_col,
        F.coalesce(F.col(n_tokens_col), F.lit(0)),
    ).withColumn(
        "_bucket", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets)).cast("int")
    )
    # fresh StructType: StructType.add mutates in place, which would corrupt
    # the input DataFrame's cached Python-side schema
    schema_out = StructType(
        list(tagged.schema.fields)
        + [StructField("pack_id", LongType()), StructField("pack_total", LongType())]
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        bucket = int(pdf["_bucket"].iloc[0]) if len(pdf) else 0
        base = bucket << 32
        pack_ids, totals = [], []
        local, running = 0, 0
        for n in pdf[n_tokens_col].astype("int64"):
            if running and running + n > max_len:
                local += 1
                running = 0
            running += int(n)
            pack_ids.append(base + local)
            totals.append(running)
        pdf["pack_id"] = pd.Series(pack_ids, dtype="int64")
        # final total per pack, repeated on each member row
        pdf["pack_total"] = pd.Series(totals, dtype="int64")
        if len(pdf):
            pdf["pack_total"] = pdf.groupby("pack_id")["pack_total"].transform("max")
        return pdf

    return (
        tagged.groupBy("_bucket")
        .applyInPandas(_pack, schema=schema_out)
        .drop("_bucket")
    )


# -- PII redaction -----------------------------------------------------------
# codegen'd regexp_replace chain; patterns are deliberately conservative
# (high precision) — corpus redaction wants few false positives on code/math

_PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])\.){3}(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])\b", "<IP>"),
    ("phone", r"(?:\+?[0-9]{1,3}[-. ]?)?(?:\([0-9]{3}\)|[0-9]{3})[-. ][0-9]{3}[-. ][0-9]{4}\b", "<PHONE>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
]


def redact_pii(col: Column) -> Column:
    """Replace emails / IPv4s / phone numbers / SSN-shaped ids with typed
    placeholder tags. Order matters (emails before phones so digits inside
    addresses aren't half-eaten); each pass is a codegen'd regexp_replace."""
    out = col
    for _, pat, tag in _PII_PATTERNS:
        out = F.regexp_replace(out, pat, tag)
    return out


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-kind match counts (for audit columns / drop thresholds)."""
    return {
        name: F.size(F.regexp_extract_all(col, F.lit(pat), F.lit(0)))
        for name, pat, _ in _PII_PATTERNS
    }
