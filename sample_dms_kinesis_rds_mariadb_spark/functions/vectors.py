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
    # NULL (not an ANSI DIVIDE_BY_ZERO crash) when either side is the zero
    # vector — one degenerate embedding in a 100 TB corpus must rank last,
    # not kill the job; desc ordering puts NULLs last by default
    na, nb = l2_norm(a), l2_norm(b)
    return F.when((na > 0) & (nb > 0), dot(a, b) / (na * nb))


def euclidean_distance(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


# --- int8 scalar quantization ------------------------------------------------
#
# Symmetric per-vector max-abs quantization: q_i = round(x_i / scale) with
# scale = max|x| / 127, stored as ARRAY<TINYINT> + one FLOAT scale — 4x
# smaller than float32 at rest AND in flight (a coarse ANN scan reads only
# the byte column; shuffles/broadcasts of candidate vectors shrink 4x).
# For COSINE the per-vector scales cancel, so the quantized similarity
# needs no dequantization at all. Everything stays codegen (higher-order
# functions, no UDF); round() is HALF_UP (away from zero), mirrored
# exactly by reference_quantize for cross-engine parity tests.

QUANT_MAX = 127


def quantize_scale(vec: Column) -> Column:
    """Per-vector quantization scale: max|x| / 127 (0.0 for a zero or
    empty vector — its quantized form is all zeros either way)."""
    max_abs = F.aggregate(
        vec,
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, F.abs(x)),
    )
    return (max_abs / F.lit(float(QUANT_MAX))).cast("float")


def quantize_vector(vec: Column, scale: Column) -> Column:
    """ARRAY<TINYINT> image of ``vec`` under ``scale`` (elements in
    [-127, 127]; a zero scale maps everything to 0)."""
    # clamp BEFORE the tinyint cast: the float32-rounded scale can be a hair
    # below max|x|/127, pushing round() to 128 — which would WRAP to -128
    # under a bare cast (non-ANSI), flipping the largest element's sign
    return F.transform(
        vec,
        lambda x: F.when(
            scale > 0,
            F.greatest(
                F.lit(-float(QUANT_MAX)),
                F.least(F.lit(float(QUANT_MAX)), F.round(x / scale)),
            ),
        )
        .otherwise(F.lit(0.0))
        .cast("tinyint"),
    )


def dequantize_vector(qvec: Column, scale: Column) -> Column:
    """ARRAY<DOUBLE> reconstruction; per-element error <= scale/2."""
    return F.transform(qvec, lambda q: q.cast("double") * scale)


def quantized_cosine(qa: Column, qb: Column) -> Column:
    """Cosine over two quantized vectors — scales cancel, so this is the
    integer-dot / norms ratio with NO dequantization. NULL for a zero
    (all-0 quantized) side, matching cosine_similarity's 0-norm NULL."""
    da = F.aggregate(
        F.zip_with(qa, qb, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(
        F.aggregate(
            qa, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )
    nb = F.sqrt(
        F.aggregate(
            qb, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )
    return F.when((na > 0) & (nb > 0), da / (na * nb))


def reference_quantize(vec: list[float]) -> tuple[list[int], float]:
    """Pure-Python mirror of quantize_scale + quantize_vector (HALF_UP
    rounding, away from zero — Spark's round()) for parity tests."""
    import math

    max_abs = max((abs(x) for x in vec), default=0.0)
    scale = float(np_float32(max_abs / QUANT_MAX))
    if scale <= 0:
        return [0] * len(vec), scale
    out = []
    for x in vec:
        v = x / scale
        r = math.floor(v + 0.5) if v >= 0 else math.ceil(v - 0.5)
        out.append(max(-QUANT_MAX, min(QUANT_MAX, int(r))))
    return out, scale


def np_float32(x: float) -> float:
    """Round-trip through float32 — the stored precision of the scale."""
    import struct

    return struct.unpack("f", struct.pack("f", x))[0]
