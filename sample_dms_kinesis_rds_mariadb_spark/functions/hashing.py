"""Hashing primitives for near-duplicate detection (north-star ops).

Two families:

- **md5-based** (cross-engine verifiable): identical hex in Spark and DuckDB,
  used where the operator is oracle-checked. Banded MinHash takes one md5 per
  shingle and slices the digest into per-band hashes, so B independent
  permutation-approximations come from one hash computation.
- **xxhash64-based** (engine-native fast path): Spark's 64-bit xxhash is the
  cheap JVM hash for production SimHash fingerprints where cross-engine
  equality is not required.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sample_dms_kinesis_rds_mariadb_spark.functions.text import (
    normalize_text,
    tokenize,
    word_ngrams,
    zip_ngrams,
)


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of normalized text."""
    return F.array_distinct(word_ngrams(tokenize(normalize_text(text)), n))


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, bands: int = 4
) -> DataFrame:
    """(id, band, signature) — one MinHash signature per document per band.

    Band *b* (b < 4) hashes are the 8-hex slices ``[8b, 8b+8)`` of one md5
    per shingle (md5 bits are uniform, so the slices act as independent hash
    functions); bands beyond 4 slice SALTED digests ``md5('s<k>|' || shingle)``
    — still one deterministic md5 family, so every band stays
    SQL-reproducible, and recall can scale with corpus size (100 TB corpora
    want more bands) without changing the bands<=4 output. Plan shape:
    explode shingles once (no per-band row explosion), aggregate ``bands``
    independent slice-mins per document — partial aggregation collapses each
    partition to <=1 row per doc before the shuffle, so shuffle volume is
    |docs|*|bands| cells, never corpus-sized — then unpivot to
    (id, band, signature).
    """
    if bands < 1:
        raise ValueError("bands must be >= 1")
    # ALL in array space — no explode, no groupBy shuffle (measured 3.3x
    # faster than the explode + per-band MIN aggregate at sf0.1, 0.68 s vs
    # 2.2 s warm, exact-equal output incl. the salted bands>4 path): one
    # md5 per shingle per digest family, bound to a column so the 4 band
    # slices share it (verified: one md5 per family in the optimized
    # plan), then array_min per band. Duplicates are harmless under min(),
    # so no array_distinct pass is needed. Docs with no shingles (< n
    # tokens) emit no rows, matching the aggregate formulation.
    toks = tokenize(normalize_text(F.col(text_col)))
    sh = word_ngrams(toks, n)
    n_digests = (bands + 3) // 4

    # closure FACTORIES, not default-arg binding: a two-parameter lambda
    # (e.g. ``lambda d, _b=b``) makes Spark pass the element INDEX as the
    # second argument, silently clobbering the bound value
    def _salted_md5(salt: str):
        return lambda t: F.md5(F.concat(F.lit(salt), t))

    def _slice(b: int):
        return lambda d: F.substring(d, 1 + 8 * (b % 4), 8)

    dcols = []
    for k in range(n_digests):
        expr = F.transform(sh, F.md5 if k == 0 else _salted_md5(f"s{k}|"))
        dcols.append(expr.alias(f"_h{k}"))
    bound = df.select(F.col(id_col).alias("_id"), *dcols)
    mins = bound.select(
        "_id",
        *[
            F.array_min(F.transform(F.col(f"_h{b // 4}"), _slice(b))).alias(
                f"_b{b}"
            )
            for b in range(bands)
        ],
    )
    stack_expr = ", ".join(f"{b}, _b{b}" for b in range(bands))
    return mins.selectExpr(
        f"_id AS {id_col}",
        f"stack({bands}, {stack_expr}) AS (band, signature)",
    ).filter(F.col("signature").isNotNull())


def simhash16_md5(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """16-bit SimHash over DISTINCT tokens with md5-derived bit vectors —
    the cross-engine-verifiable variant (md5 hex → int is reproducible in
    any engine; see the DuckDB oracle of catalog query
    ``simhash_fingerprints``). Still the explode → 16 conditional sums →
    bit-reassembly shape with one doc-id shuffle (simhash60/64 moved to
    the no-shuffle array-space form; this narrow variant is not in a hot
    path and keeps the historical formulation as its reference).
    """
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.array_distinct(tokenize(normalize_text(F.col(text_col))))
        ).alias("_tok"),
    ).withColumn(
        "_h", F.conv(F.substring(F.md5("_tok"), 1, 4), 16, 10).cast("int")
    )
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("_h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(
                -1
            )
        ).alias(f"_b{b}")
        for b in range(16)
    ]
    agg = toks.groupBy("_id").agg(*bit_sums)
    fp = F.lit(0)
    for b in range(16):
        fp = fp + F.when(F.col(f"_b{b}") > 0, F.lit(1 << b)).otherwise(0)
    return agg.select(F.col("_id").alias(id_col), fp.cast("int").alias("simhash16"))


#: Arrow dispatch for the SimHash bit fold (r13): the zip_with fold is a
#: lambda-bearing tree, so it is evaluated INTERPRETED — ~2*nbits element
#: ops per token per row with per-op dispatch overhead. Above this many
#: (tokens unknown at plan time, so the gate is just "a real session
#: exists"), the fold runs as a numpy kernel over the staged hash array —
#: pure integer math, bit-identical by construction. False = always use
#: the JVM fold (the A/B lever; also the no-session fallback).
SIMHASH_ARROW = True


def _simhash_fp_arrow_udf(masks: list[int]):
    """Arrow twin of :func:`_simhash_fp` — exact integer math, so
    bit-identical (no float order-of-operations question at all): per
    row, bit b's count is ``2*popcount_b - n_hashes`` (each hash adds +1
    if ``h & masks[b] != 0`` else -1, exactly the fold's
    ``when().otherwise(-1)``, which also maps a NULL hash element to -1 —
    mirrored by substituting 0 for NULL elements, since ``0 & m == 0``);
    the fingerprint is the int64 wrap-sum of the masks whose count is
    positive. NULL hash ARRAY (NULL text) → NULL fingerprint, matching
    the fold-over-NULL-array result the callers filter on."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    Mu = np.asarray([m & 0xFFFFFFFFFFFFFFFF for m in masks], dtype=np.uint64)
    Mi = Mu.view(np.int64)

    def fp(harrs):
        out = []
        for a in harrs:
            if a is None:
                out.append(None)
                continue
            arr = np.asarray(
                [0 if h is None else h for h in a], dtype=np.int64
            )
            if arr.size == 0:
                out.append(0)
                continue
            bits = (arr.view(np.uint64)[:, None] & Mu[None, :]) != 0
            counts = 2 * bits.sum(axis=0, dtype=np.int64) - arr.size
            out.append(int(Mi[counts > 0].sum()))
        return pd.Series(out, dtype="object")

    fp.__annotations__ = {"harrs": pd.Series, "return": pd.Series}
    return pandas_udf("long")(fp)


def _simhash_fp_df(
    df: DataFrame, id_col: str, hashes, masks: list[int], out_col: str
) -> DataFrame:
    """(id, fingerprint) with the fold auto-dispatched: the md5/xxhash64
    hash computation ALWAYS stays a JVM codegen projection (staged into a
    column so the Arrow input is just the array); only the bit fold
    crosses to numpy when :data:`SIMHASH_ARROW` and a session is active.
    NULL fingerprints (NULL text) are filtered — both the fold and the
    kernel preserve that contract."""
    use_arrow = SIMHASH_ARROW
    if use_arrow:
        from pyspark.sql import SparkSession

        use_arrow = SparkSession.getActiveSession() is not None
    if use_arrow:
        # staged-column collision guard (the decontaminate_bloom
        # '_bloom_toks' rule): fail precisely, not with an ambiguous-
        # reference analysis error downstream
        if "_sh_hashes" in df.columns:
            raise ValueError(
                "column collision: input already has '_sh_hashes'"
            )
        staged = df.select(F.col(id_col), hashes.alias("_sh_hashes"))
        fp = _simhash_fp_arrow_udf(masks)(F.col("_sh_hashes"))
        return staged.select(F.col(id_col), fp.alias(out_col)).filter(
            F.col(out_col).isNotNull()
        )
    return df.select(F.col(id_col), _simhash_fp(hashes, masks).alias(out_col)).filter(
        F.col(out_col).isNotNull()
    )


def _simhash_fp(hashes, masks: list[int]):
    """SimHash fingerprint from a per-doc hash ARRAY, entirely in array
    space: fold the hashes into per-bit +1/-1 counts (one zip_with against
    the mask literal per hash), then sum the masks of positive bits. NO
    explode, NO shuffle — the whole fingerprint is a narrow projection.
    (The previous explode → 60-conditional-SUM groupBy formulation was
    measured 6.8x slower at sf0.1 — 4.5 s vs 0.67 s warm — despite its
    sums being codegen'd: the per-token row explosion and the doc-id
    shuffle dominate, and both vanish here. Bit-identical output.)"""
    masks_lit = F.lit(masks).cast("array<bigint>")
    counts = F.aggregate(
        hashes,
        F.expr(f"array_repeat(0, {len(masks)})"),
        lambda acc, h: F.zip_with(
            acc,
            masks_lit,
            lambda a, m: a + F.when(h.bitwiseAND(m) != 0, 1).otherwise(-1),
        ),
    )
    return F.aggregate(
        F.zip_with(
            counts,
            masks_lit,
            lambda c, m: F.when(c > 0, m).otherwise(F.lit(0).cast("bigint")),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def simhash60_md5(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """60-bit SimHash over DISTINCT tokens with md5-derived bit vectors —
    the cross-engine-verifiable wide variant: 15 hex chars of the token's
    md5 give 60 reproducible bits (fits a signed 64-bit long positively in
    both engines), so the whole near-dup pipeline built on it is
    oracle-checkable. Computed per doc in array space (:func:`_simhash_fp`)
    — a narrow no-shuffle projection."""
    hashes = F.transform(
        F.array_distinct(tokenize(normalize_text(F.col(text_col)))),
        lambda tk: F.conv(F.substring(F.md5(tk), 1, 15), 16, 10).cast("long"),
    )
    # NULL text folds to a NULL fingerprint; the explode formulation
    # emitted NO row for such docs — keep that output contract
    return _simhash_fp_df(
        df, id_col, hashes, [1 << b for b in range(60)], "simhash60"
    )


def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash fingerprint per document (engine-native xxhash64).

    Per token OCCURRENCE (repeats weigh in, classic SimHash): 64-bit hash;
    per bit: +1 if set else -1, summed over tokens; fingerprint bit = 1
    where the sum is positive. Computed per doc in array space
    (:func:`_simhash_fp`) — a narrow no-shuffle projection; the sign bit's
    mask is ``-(1 << 63)`` (the long with only bit 63 set), so both the
    membership test and the reassembly handle bit 63 exactly as the old
    per-bit CASE chain did."""
    hashes = F.transform(
        tokenize(normalize_text(F.col(text_col))), lambda tk: F.xxhash64(tk)
    )
    masks = [1 << b for b in range(63)] + [-(1 << 63)]
    # NULL text -> no row, matching the explode formulation (see simhash60)
    return _simhash_fp_df(df, id_col, hashes, masks, "simhash")


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))
