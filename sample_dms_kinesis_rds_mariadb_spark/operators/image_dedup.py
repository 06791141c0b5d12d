"""Perceptual image dedup — dHash/pHash 64-bit fingerprints computed over
the repo's REAL pixel decoders, plus a pigeonhole-banded hamming self-join
for near-duplicate pairs: the multimodal dual of the text near-dup family
in ``operators/dedup.py`` (simhash banding at ``simhash_near_pairs``).

Why it exists: the multimodal pipeline decodes pixels for real
(``operators/multimodal.py``, ``operators/jpeg.py`` …) and dedups TEXT
eight ways, but a multimodal training corpus hits the same image
re-encoded, resized, and recompressed constantly — byte-level sha256
dedup misses every one of them. Perceptual hashes fingerprint the IMAGE
CONTENT: the published dHash (difference hash — Krawetz) and pHash
(DCT low-frequency hash) reduce any decodable payload to 64 bits whose
hamming distance tracks visual similarity.

Determinism contract (what makes fingerprints oracle-checkable):

- decode + nearest-neighbor resize reuse ``multimodal.resize_image``
  (floor index map ``src = (dst * src_len) // dst_len``) — the exact
  pixel selection an independent SQL engine can replay;
- grayscale is the INTEGER ITU-R BT.601 weighted sum
  ``299·R + 587·G + 114·B`` with NO division (fingerprint bits only
  compare lumas within one image, so the /1000 scale is irrelevant and
  dropping it keeps every intermediate an exact int64 — bit-identical in
  any engine); single-channel images use ``1000·v`` for the same scale;
- dHash bit ``i*8 + j`` is ``gray[i][j] > gray[i][j+1]`` over the 9×8
  grid, packed row-major, wrapped to a SIGNED 64-bit value (Spark
  BIGINT).

Scale shape: fingerprinting is one ``mapInPandas`` Arrow pass
(partition-parallel, the binary column never shuffles); the near-dup
join banding splits the 64-bit fingerprint into ``max_hamming + 1``
contiguous bands so any pair within the threshold MUST agree on at least
one band (pigeonhole) — candidates meet in a (band, key) equi-join,
exact hamming verifies, and no all-pairs comparison ever happens.
Transitive clustering / survivor choice reuses
``dedup.connected_components`` / ``dedup.dedup_connected``.
"""

from __future__ import annotations

import itertools
from math import comb
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sample_dms_kinesis_rds_mariadb_spark.operators.dedup import _pin
from sample_dms_kinesis_rds_mariadb_spark.operators.multimodal import (
    _parse_pnm_binary,
    resize_image,
)

_GRAY_W = (299, 587, 114)  # BT.601 luma weights ×1000 — integer, no division


def small_gray(
    content: bytes, width: int, height: int, fake: bool = False
) -> np.ndarray:
    """Decode + nearest-neighbor resize to ``height×width`` and reduce to
    the integer luma plane (int64 ``299R+587G+114B``; ``1000·v`` for
    grayscale sources). All real formats ``resize_image`` handles
    (PNM/BMP/PNG/JPEG/GIF/TIFF/lossless-WebP) decode for real;
    ``fake=True`` keeps the
    any-bytes-produce-a-row dry-run contract."""
    blob = resize_image(content, width, height, fake=fake)
    channels = 3 if blob[:2] == b"P6" else 1
    _w, _h, _maxval, off = _parse_pnm_binary(blob)
    arr = np.frombuffer(
        blob, dtype=np.uint8, count=width * height * channels, offset=off
    ).reshape(height, width, channels).astype(np.int64)
    if channels == 3:
        return (
            _GRAY_W[0] * arr[:, :, 0]
            + _GRAY_W[1] * arr[:, :, 1]
            + _GRAY_W[2] * arr[:, :, 2]
        )
    return 1000 * arr[:, :, 0]


def _pack_signed64(bits: np.ndarray) -> int:
    """Pack a flat boolean array (64 entries, index = bit position) into a
    signed 64-bit int (Spark BIGINT two's complement)."""
    v = 0
    for b, on in enumerate(bits):
        if on:
            v |= 1 << b
    return v - (1 << 64) if v >= (1 << 63) else v


def dhash64(content: bytes, fake: bool = False) -> int:
    """The published dHash (difference hash): 9×8 grayscale, bit
    ``i*8 + j`` = ``gray[i][j] > gray[i][j+1]`` — 8 horizontal-gradient
    bits per row, 64 total, row-major, signed-64 packed."""
    g = small_gray(content, 9, 8, fake=fake)
    bits = (g[:, :8] > g[:, 1:]).reshape(64)
    return _pack_signed64(bits)


def _dct2_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis matrix (the standard definition):
    D[k, m] = a_k · cos(π·(2m+1)·k / (2n)), a_0 = sqrt(1/n),
    a_k = sqrt(2/n)."""
    k = np.arange(n).reshape(-1, 1).astype(np.float64)
    m = np.arange(n).reshape(1, -1).astype(np.float64)
    d = np.cos(np.pi * (2 * m + 1) * k / (2 * n))
    d[0, :] *= np.sqrt(1.0 / n)
    d[1:, :] *= np.sqrt(2.0 / n)
    return d


_DCT32 = _dct2_matrix(32)


def phash64(content: bytes, fake: bool = False) -> int:
    """The published pHash: 32×32 grayscale → 2-D orthonormal DCT-II →
    top-left 8×8 low-frequency block → bit = coefficient > median of the
    63 AC coefficients (DC excluded from the median, per the classic
    pHash; the DC position still gets a bit — trivially 1 for any
    non-degenerate image). Row-major, signed-64 packed."""
    g = small_gray(content, 32, 32, fake=fake).astype(np.float64) / 1000.0
    coef = _DCT32 @ g @ _DCT32.T
    block = coef[:8, :8].reshape(64)
    med = float(np.median(block[1:]))
    return _pack_signed64(block > med)


IMAGE_FP_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("dhash", T.LongType()),
        T.StructField("phash", T.LongType()),
    ]
)


def image_fingerprints(
    df: DataFrame,
    fake_decode: bool = False,
    methods: tuple[str, ...] = ("dhash", "phash"),
) -> DataFrame:
    """(media_id, dhash, phash) via one Arrow ``mapInPandas`` pass — the
    canonical multimodal plumbing (``extract_image_features`` shape):
    partition-parallel, one decode feeds both hashes, the binary column
    never shuffles. ``methods`` limits which hashes compute (mapInPandas
    is opaque to column pruning, so a dhash-only caller would otherwise
    pay pHash's 32×32 DCT per payload for a column it drops); the
    unrequested column comes back NULL with the schema unchanged.
    Undecodable payloads raise unless ``fake_decode``."""
    if not methods or any(m not in ("dhash", "phash") for m in methods):
        raise ValueError(f"methods must be among dhash/phash, got {methods}")

    def _fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                blob = bytes(content) if content is not None else b""
                rows.append(
                    {
                        "media_id": media_id,
                        "dhash": dhash64(blob, fake=fake_decode)
                        if "dhash" in methods else None,
                        "phash": phash64(blob, fake=fake_decode)
                        if "phash" in methods else None,
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMAGE_FP_SCHEMA.fields]
            )

    return df.select("media_id", "content").mapInPandas(
        _fp, schema=IMAGE_FP_SCHEMA
    )


def _band_bounds(bands: int, width: int = 64) -> list[tuple[int, int]]:
    """Split ``width`` bits into ``bands`` contiguous (offset, size) chunks,
    sizes differing by at most 1 (64 isn't divisible by e.g. 5 or 11)."""
    base, extra = divmod(width, bands)
    out, off = [], 0
    for i in range(bands):
        size = base + (1 if i < extra else 0)
        out.append((off, size))
        off += size
    return out


def _signed64(mask: int) -> int:
    """A bit mask as the SIGNED 64-bit value Spark's LongType literal
    accepts — the 64-bit band of a bands=1 split is all ones, which only
    fits as -1 (two's complement)."""
    return mask - (1 << 64) if mask >= (1 << 63) else mask


def _ball_size(width: int, radius: int) -> int:
    """Number of XOR masks within hamming ``radius`` of 0 over ``width``
    bits: Σ_{j≤radius} C(width, j)."""
    return sum(comb(width, j) for j in range(min(radius, width) + 1))


def _ball_masks(width: int, radius: int) -> list[int]:
    """Every XOR mask of popcount ≤ ``radius`` within ``width`` bits, in a
    deterministic (popcount, then combination) order — the radius ball a
    multi-index-hashing probe enumerates per band."""
    out = []
    for j in range(min(radius, width) + 1):
        for combo in itertools.combinations(range(width), j):
            m = 0
            for bit in combo:
                m |= 1 << bit
            out.append(m)
    return out


def _mih_bands(max_hamming: int, fp_bits: int, max_ball: int = 128) -> int:
    """Default band count for multi-index hashing (Norouzi, Punjani &
    Fleet, "Fast Search in Hamming Space with Multi-Index Hashing", CVPR
    2012): splitting ``fp_bits`` into ``b`` bands with per-band probe
    radius ⌊r/b⌋ keeps the pigeonhole guarantee for ANY ``b`` — if every
    band differed by more than ⌊r/b⌋ bits the total would exceed
    b·(⌊r/b⌋+1) − 1 ≥ r.  Wider bands (smaller ``b``) mean exponentially
    more buckets (fewer candidate collisions) at the price of a bigger
    per-band probe ball, so pick the ``b`` minimizing the expected
    candidate cost ``b · ball / 2^(fp_bits/b)`` subject to the ball
    staying enumerable (≤ ``max_ball`` masks).  For 64-bit/r=7 this
    lands on 4 bands of 16-bit keys × 17 masks (65,536 buckets/band vs
    the naive r+1-banding's 256); for 32-bit/r=6 on 3 bands of ~11-bit
    keys × 67 masks (2,048 buckets vs 16-32)."""
    best, best_cost = None, None
    for b in range(1, min(max_hamming + 1, fp_bits) + 1):
        width = -(-fp_bits // b)  # widest band of an uneven split
        ball = _ball_size(width, max_hamming // b)
        if ball > max_ball:
            continue
        cost = b * ball / 2.0 ** (fp_bits / b)
        if best_cost is None or cost < best_cost:
            best, best_cost = b, cost
    return best if best is not None else min(max_hamming + 1, fp_bits)


def _resolve_bands(
    bands: int | None, max_hamming: int, fp_bits: int
) -> tuple[int, int]:
    """(bands, per-band probe radius). ``bands=None`` picks the MIH
    default; any explicit ``bands`` in [1, fp_bits] is exact — with
    ``bands > max_hamming`` the radius is 0 (the classic r+1-band
    pigeonhole, identical keys only), with fewer-but-wider bands the
    probe enumerates the ⌊r/b⌋ ball per band."""
    if bands is None:
        bands = _mih_bands(max_hamming, fp_bits)
    if not 1 <= bands <= fp_bits:
        raise ValueError(f"bands must be in [1, {fp_bits}], got {bands}")
    radius = max_hamming // bands
    # an explicit low band count must still be ENUMERABLE: the probe
    # ball is Σ_{j≤⌊r/b⌋} C(width, j) literal masks per band — bands=1
    # with r=7 over 64 bits would be ~6.2e8 masks (a driver blowup), so
    # refuse anything past a generous literal budget instead
    width = -(-fp_bits // bands)
    ball = _ball_size(width, radius)
    if ball > 65536:
        raise ValueError(
            f"bands={bands} needs a per-band probe ball of {ball} masks "
            f"(width {width}, radius {radius}) — raise bands (or pass "
            "bands=None for the MIH default)"
        )
    return bands, radius


def _banded(
    fps: DataFrame, keep_cols: list[str], fp_col: str, bands: int,
    fp_bits: int,
) -> DataFrame:
    """Explode each fingerprint row into its (band, key) bucket rows —
    the shared pigeonhole construction behind :func:`banded_hamming_pairs`
    and :func:`sequence_near_pairs`."""
    return fps.select(
        *[F.col(c) for c in keep_cols],
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(F.col(fp_col), off)
                        .bitwiseAND(F.lit(_signed64((1 << size) - 1)))
                        .alias("key"),
                    )
                    for i, (off, size) in enumerate(
                        _band_bounds(bands, width=fp_bits)
                    )
                ]
            )
        ).alias("bk"),
    ).select(*keep_cols, "bk.band", "bk.key")


def _banded_probe(
    fps: DataFrame, keep_cols: list[str], fp_col: str, bands: int,
    fp_bits: int, radius: int,
) -> DataFrame:
    """The PROBE side of a multi-index-hashing join: each fingerprint row
    explodes into (band, key ⊕ mask) for every XOR mask of popcount ≤
    ``radius`` in that band — so a probe row lands in the bucket of every
    stored key within ``radius`` bits of its own band key.  ``radius=0``
    degenerates to :func:`_banded` (exact keys, one row per band).  The
    masks are literals (Σ ball sizes per fingerprint, e.g. 4×17=68 for
    64-bit/r=7); the band key computes once per output row — shift, and,
    xor, all codegen."""
    if radius <= 0:
        return _banded(fps, keep_cols, fp_col, bands, fp_bits)
    bounds = _band_bounds(bands, width=fp_bits)
    per_band = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftrightunsigned(F.col(fp_col), off)
                .bitwiseAND(F.lit(_signed64((1 << size) - 1)))
                .alias("base"),
                F.array(
                    *[F.lit(_signed64(m)) for m in _ball_masks(size, radius)]
                ).alias("masks"),
            )
            for i, (off, size) in enumerate(bounds)
        ]
    )
    return (
        fps.select(
            *[F.col(c) for c in keep_cols], F.explode(per_band).alias("bv")
        )
        .select(
            *keep_cols,
            F.col("bv.band").alias("band"),
            F.col("bv.base").alias("_base"),
            F.explode("bv.masks").alias("_mask"),
        )
        .select(
            *keep_cols,
            "band",
            F.col("_base").bitwiseXOR(F.col("_mask")).alias("key"),
        )
    )


def banded_hamming_pairs(
    fps: DataFrame,
    id_col: str = "media_id",
    fp_col: str = "dhash",
    max_hamming: int = 7,
    bands: int | None = None,
    materialize: bool = True,
) -> DataFrame:
    """(id_a, id_b, hamming) for every pair within ``max_hamming`` bits —
    EXACT (not approximate), via multi-index hashing (Norouzi et al.
    2012): the fingerprint splits into ``bands`` chunks and a pair
    within ``max_hamming`` total bits must agree within ⌊r/b⌋ bits on at
    least one chunk (generalized pigeonhole — see :func:`_mih_bands`),
    so the probe side enumerates the per-band ⌊r/b⌋ radius ball and
    candidates meet in a (band, key) equi-join; exact ``bit_count(xor)``
    then verifies.  The default band count (4 wide 16-bit bands for
    r=7) keeps ~2^16 buckets per band where the naive ``max_hamming+1``
    banding (8 bands of 8-bit keys) had 256 — candidate pairs scale
    ~n²·ball/2^width per band, ~256× fewer at the same exactness.
    Passing an explicit ``bands > max_hamming`` reproduces the classic
    identical-key banding (probe radius 0). Same downstream shape as
    ``dedup.simhash_near_pairs``.

    Scale shape: candidates meet only inside equal (band, key) buckets —
    never all-pairs — and (r13) the banded self-join runs over DISTINCT
    fingerprints, expanded back to id pairs afterwards: the r13 scaling
    harness measured the candidate term ∝ n²·ball/2^width turning
    superlinear past ~100k rows, and on dup-heavy corpora (image
    dedup's whole premise) the distinct count n' ≪ n cuts that term by
    (n/n')² while the output stays bit-identical (exact-dup groups
    rejoin through the fingerprint). ``materialize`` pins both frames
    so fingerprints compute once."""
    bands, radius = _resolve_bands(bands, max_hamming, 64)
    # (id, fp) distinct keeps the function idempotent to duplicate
    # input rows, which the pre-r13 terminal .distinct() absorbed
    pinned = _pin(fps.select(id_col, fp_col).distinct(), materialize)
    uniq = _pin(pinned.select(fp_col).distinct(), materialize)
    a = _banded_probe(uniq, [fp_col], fp_col, bands, 64, radius).select(
        "band", "key", F.col(fp_col).alias("fp_a")
    )
    b = _banded(uniq, [fp_col], fp_col, bands, 64).select(
        "band", "key", F.col(fp_col).alias("fp_b")
    )
    # fingerprint-level pairs: fp_a < fp_b for cross pairs, fp_a == fp_b
    # kept so exact-duplicate groups (>=2 ids on one fingerprint) expand
    fp_pairs = (
        a.join(b, ["band", "key"])
        .filter(F.col("fp_a") <= F.col("fp_b"))
        .select(
            "fp_a",
            "fp_b",
            F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))).alias(
                "hamming"
            ),
        )
        .distinct()  # a pair can meet in several bands
        .filter(F.col("hamming") <= max_hamming)
    )
    mem_a = pinned.select(
        F.col(fp_col).alias("fp_a"), F.col(id_col).alias("_ida")
    )
    mem_b = pinned.select(
        F.col(fp_col).alias("fp_b"), F.col(id_col).alias("_idb")
    )
    # each id carries exactly one fingerprint, so a cross id pair arises
    # from exactly one fingerprint pair — no final distinct needed
    cross = (
        fp_pairs.filter(F.col("fp_a") != F.col("fp_b"))
        .join(mem_a, "fp_a")
        .join(mem_b, "fp_b")
        .select(
            F.least("_ida", "_idb").alias("id_a"),
            F.greatest("_ida", "_idb").alias("id_b"),
            "hamming",
        )
    )
    same = (
        fp_pairs.filter(F.col("fp_a") == F.col("fp_b"))
        .join(mem_a, "fp_a")
        .join(mem_b, "fp_b")
        .filter(F.col("_ida") < F.col("_idb"))
        .select(
            F.col("_ida").alias("id_a"),
            F.col("_idb").alias("id_b"),
            "hamming",
        )
    )
    return cross.unionByName(same)


def image_near_pairs(
    df: DataFrame,
    method: str = "dhash",
    max_hamming: int = 7,
    bands: int | None = None,
    fake_decode: bool = False,
) -> DataFrame:
    """Near-duplicate image pairs end-to-end: real decode → dHash/pHash →
    banded hamming self-join. (id_a, id_b, hamming)."""
    if method not in ("dhash", "phash"):
        raise ValueError(f"method must be 'dhash' or 'phash', got {method!r}")
    fps = image_fingerprints(
        df, fake_decode=fake_decode, methods=(method,)
    ).select("media_id", method)
    return banded_hamming_pairs(
        fps, id_col="media_id", fp_col=method,
        max_hamming=max_hamming, bands=bands,
    )


VIDEO_FP_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("frame_dhash", T.LongType()),
    ]
)


def video_fingerprints(
    df: DataFrame, every_k: int = 1, fake_decode: bool = False
) -> DataFrame:
    """Per-frame dHash fingerprints for video payloads: every ``k``-th
    REAL frame of each MJPEG AVI (the in-repo container + JPEG decoders)
    reduced to a 64-bit dHash — ONE Arrow ``mapInPandas`` pass, container
    → frames → pixels → bits without the binary column ever shuffling.
    Output (media_id, frame_no, frame_dhash). A payload whose container
    walk fails (non-AVI bytes, a non-MJPEG codec) raises unless
    ``fake_decode`` — with it, the payload contributes ZERO frames
    (stays unique downstream), the image/audio any-bytes dry-run
    contract."""
    from sample_dms_kinesis_rds_mariadb_spark.operators.avi import (
        video_frames,
    )

    def _fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                blob = bytes(content) if content is not None else b""
                try:
                    frames = list(video_frames(blob, every_k=every_k))
                except (ValueError, NotImplementedError, IndexError):
                    if not fake_decode:
                        raise
                    frames = []
                for frame_no, frame in frames:
                    rows.append(
                        {
                            "media_id": media_id,
                            "frame_no": frame_no,
                            "frame_dhash": dhash64(frame, fake=fake_decode),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in VIDEO_FP_SCHEMA.fields]
            )

    return df.select("media_id", "content").mapInPandas(
        _fp, schema=VIDEO_FP_SCHEMA
    )


def sequence_near_pairs(
    fps: DataFrame,
    fp_col: str,
    fp_bits: int = 64,
    id_col: str = "media_id",
    frame_col: str = "frame_no",
    max_hamming: int = 7,
    bands: int | None = None,
    min_frac: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs of FRAME SEQUENCES (videos, audio streams):
    given per-frame fingerprints (id, frame_no, fp of ``fp_bits`` bits),
    find id pairs where a large fraction of frames match perceptually
    along ONE temporal alignment. The shared engine behind
    :func:`video_near_pairs` and ``audio_dedup.audio_near_pairs``.

    Output (id_a < id_b, matched_frames, aligned_matches, match_frac):
    ``aligned_matches`` is the largest match subset sharing one offset
    frame_b − frame_a (genuine duplicates align; coincidental hits
    scatter) and ``match_frac`` = aligned_matches / min(n_frames).

    Scale shape: multi-index-hashing banding over the fingerprint (exact
    for ``max_hamming`` — per-band ⌊r/b⌋ probe ball, see
    :func:`banded_hamming_pairs`), (band, key) equi-join candidates only,
    per-pair aggregation bounded by matched pairs — never all-pairs on
    sequences or frames."""
    bands, radius = _resolve_bands(bands, max_hamming, fp_bits)
    n_frames = fps.groupBy(id_col).agg(F.count("*").alias("n_frames"))
    a = _banded_probe(
        fps, [id_col, frame_col, fp_col], fp_col, bands, fp_bits, radius
    ).select(
        "band", "key",
        F.col(id_col).alias("id_a"),
        F.col(frame_col).alias("frame_a"),
        F.col(fp_col).alias("fp_a"),
    )
    b = _banded(
        fps, [id_col, frame_col, fp_col], fp_col, bands, fp_bits
    ).select(
        "band", "key",
        F.col(id_col).alias("id_b"),
        F.col(frame_col).alias("frame_b"),
        F.col(fp_col).alias("fp_b"),
    )
    matches = (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
            <= F.lit(int(max_hamming))
        )
        .select("id_a", "frame_a", "id_b", "frame_b")
        .distinct()
    )
    na = n_frames.select(
        F.col(id_col).alias("id_a"), F.col("n_frames").alias("_na")
    )
    nb = n_frames.select(
        F.col(id_col).alias("id_b"), F.col("n_frames").alias("_nb")
    )
    return _sequence_alignment(matches, na, nb, min_frac)


def _sequence_alignment(
    matches: DataFrame, na: DataFrame, nb: DataFrame, min_frac: float
) -> DataFrame:
    """The temporal-alignment aggregate shared by
    :func:`sequence_near_pairs` and ``AudioDedupIndex.probe``: from
    verified frame matches (id_a, frame_a, id_b, frame_b), per pair the
    largest match subset sharing ONE offset frame_b − frame_a (genuine
    duplicates align, coincidental hits scatter), fractioned by the
    shorter sequence (``na``/``nb``: (id_a|id_b, _na|_nb) frame counts).
    Aggregation is bounded by matched pairs — never all-pairs."""
    per_offset = matches.groupBy(
        "id_a", "id_b", (F.col("frame_b") - F.col("frame_a")).alias("_off")
    ).agg(F.count_distinct("frame_a").alias("_n"))
    aligned = per_offset.groupBy("id_a", "id_b").agg(
        F.max("_n").alias("aligned_matches")
    )
    matched = matches.groupBy("id_a", "id_b").agg(
        F.count_distinct("frame_a").alias("matched_frames")
    )
    return (
        matched.join(aligned, ["id_a", "id_b"])
        .join(na, "id_a")
        .join(nb, "id_b")
        .withColumn(
            "match_frac",
            F.col("aligned_matches") / F.least("_na", "_nb"),
        )
        .filter(F.col("match_frac") >= F.lit(float(min_frac)))
        .select(
            "id_a", "id_b", "matched_frames", "aligned_matches", "match_frac"
        )
    )


def video_near_pairs(
    df: DataFrame,
    every_k: int = 1,
    max_hamming: int = 7,
    bands: int | None = None,
    min_frac: float = 0.5,
    materialize: bool = True,
    fake_decode: bool = False,
) -> DataFrame:
    """Near-duplicate VIDEO pairs: two videos are near-dups when a large
    fraction of their sampled frames match perceptually (per-frame dHash
    within ``max_hamming`` bits) — the re-encoded/trimmed/re-muxed
    duplicate class a multimodal training corpus hits constantly, which
    byte hashing and single-image dedup both miss.

    Output per pair (id_a < id_b): ``matched_frames`` (distinct frames of
    ``id_a`` with a perceptual match in ``id_b`` — can exceed the shorter
    video's length when similar neighboring frames cross-match),
    ``aligned_matches`` (the largest subset sharing ONE temporal offset
    frame_b − frame_a — the consistency guard: genuine duplicates match
    along a single alignment, coincidental frame hits scatter), and
    ``match_frac`` = aligned_matches / min(n_frames) — the temporally
    consistent overlap share; pairs below ``min_frac`` drop.

    Scale shape: the frame-hash table is (videos × frames/k) narrow rows;
    the matching itself is :func:`sequence_near_pairs` (pigeonhole
    banding, alignment aggregate — never all-pairs on videos or
    frames). ``fake_decode=True`` lets a dirty corpus through: payloads
    whose container walk fails contribute zero frames (stay unique)
    instead of failing the task."""
    fps = _pin(
        video_fingerprints(df, every_k=every_k, fake_decode=fake_decode),
        materialize,
    )
    return sequence_near_pairs(
        fps, "frame_dhash", fp_bits=64,
        max_hamming=max_hamming, bands=bands, min_frac=min_frac,
    )


def dedup_images(
    df: DataFrame,
    method: str = "dhash",
    max_hamming: int = 7,
    fake_decode: bool = False,
    keep: str = "min_id",
    quality_col: str | None = None,
) -> DataFrame:
    """Keep ONE image per transitive near-dup cluster: pairs →
    ``dedup.connected_components`` hash-min labels → anti-join the
    losers. ``keep="min_id"`` (default, deterministic) keeps the
    smallest media_id; ``keep="best"`` keeps the member with the highest
    ``quality_col`` (e.g. pixel count or a caption score — a near-dup
    image cluster usually mixes an original with recompressed thumbnails,
    and the arbitrary-member rule throws resolution away for free).
    Images in no pair survive untouched."""
    from sample_dms_kinesis_rds_mariadb_spark.operators.dedup import (
        dedup_connected,
    )

    pairs = image_near_pairs(
        df, method=method, max_hamming=max_hamming, fake_decode=fake_decode
    )
    return dedup_connected(
        df, pairs, "media_id", keep=keep, quality_col=quality_col
    )


class ImageDedupIndex:
    """Incremental PERCEPTUAL image-dedup index — the image dual of
    ``dedup.MinHashIndex``: dedupe NEW image batches against every image
    seen so far without recomputing anything over the corpus.

    The store persists each seen image's dHash banded into
    ``bands = max_hamming + 1`` pigeonhole buckets, parquet-PARTITIONED
    BY band (the build-once/probe-many split shared by all the index
    stores): probing a batch fingerprints the NEW payloads only and
    equi-joins their (band, key) rows against the store — candidates are
    bucket-bounded, the exact ``bit_count(xor)`` verify runs on
    candidates only, and precedence is arrival order (a new image within
    ``max_hamming`` bits of ANY stored image loses).

    ``dedup_batch`` appends ALL of the batch's fingerprints (survivors
    and losers alike — later near-dups of a dropped image still dedup),
    is CRASH-REPLAY idempotent (self-matches and same-batch stored ids
    are excluded, the ``MinHashIndex`` contract), and the store carries
    the shared maintenance surface: ``compact()`` rename-swap folding,
    crash healing, opt-in ``auto_compact_files``.
    """

    META_FILE = "_imagededup_meta.json"

    def __init__(
        self,
        spark,
        path: str,
        max_hamming: int,
        bands: int,
        auto_compact_files: int | None = None,
    ) -> None:
        if auto_compact_files is not None and auto_compact_files <= 2 * bands:
            raise ValueError(
                f"auto_compact_files ({auto_compact_files}) must exceed "
                f"2 x bands ({2 * bands}) or every append re-triggers a "
                "full store rewrite"
            )
        self.spark = spark
        self.path = path
        self.max_hamming = max_hamming
        self.bands = bands
        self.auto_compact_files = auto_compact_files
        self._schema_ddl = "band INT, key BIGINT, media_id BIGINT, fp BIGINT"

    # -- lifecycle -----------------------------------------------------------

    @classmethod
    def build(
        cls,
        df: DataFrame,
        path: str,
        max_hamming: int = 7,
        bands: int | None = None,
        fake_decode: bool = False,
        auto_compact_files: int | None = None,
    ) -> "ImageDedupIndex":
        import json
        import os

        bands, _radius = _resolve_bands(bands, max_hamming, 64)
        idx = cls(
            df.sparkSession, path, max_hamming, bands,
            auto_compact_files=auto_compact_files,
        )
        idx._banded(idx._fps(df, fake_decode)).write.mode(
            "overwrite"
        ).partitionBy("band").parquet(path)
        with open(os.path.join(path, cls.META_FILE), "w") as f:
            json.dump(
                {
                    "max_hamming": max_hamming,
                    "bands": bands,
                    "schema": idx._schema_ddl,
                },
                f,
            )
        return idx

    @classmethod
    def load(
        cls, spark, path: str, auto_compact_files: int | None = None
    ) -> "ImageDedupIndex":
        import json
        import os

        with open(os.path.join(path, cls.META_FILE)) as f:
            meta = json.load(f)
        return cls(
            spark, path, meta["max_hamming"], meta["bands"],
            auto_compact_files=auto_compact_files,
        )

    @classmethod
    def exists(cls, path: str) -> bool:
        import os

        return os.path.exists(os.path.join(path, cls.META_FILE))

    # -- internals -----------------------------------------------------------

    def _fps(self, media: DataFrame, fake_decode: bool) -> DataFrame:
        """(media_id, fp) — the ONE decode+hash pass; every banded view
        (store keys, probe ball) derives from this frame so callers that
        need both pin it once and never decode twice."""
        return image_fingerprints(
            media, fake_decode=fake_decode, methods=("dhash",)
        ).select("media_id", F.col("dhash").alias("fp"))

    def _banded(self, fps: DataFrame) -> DataFrame:
        """Exact (band, key) rows — the STORE layout."""
        return _banded(fps, ["media_id", "fp"], "fp", self.bands, 64).select(
            "band", "key", "media_id", "fp"
        )

    def _probe_banded(self, fps: DataFrame) -> DataFrame:
        """(band, key ⊕ mask) rows over the per-band ⌊r/b⌋ ball — the
        multi-index-hashing PROBE layout (radius 0 when the store was
        built with classic ``max_hamming+1`` banding)."""
        radius = self.max_hamming // self.bands
        return _banded_probe(
            fps, ["media_id", "fp"], "fp", self.bands, 64, radius
        ).select("band", "key", "media_id", "fp")

    def _store(self) -> DataFrame:
        """Snapshot-pinned store frame (the MinHashIndex `_store` rule: a
        later append must never leak into an already-built probe)."""
        import glob
        import os

        from sample_dms_kinesis_rds_mariadb_spark.operators.store_maint import (
            heal_partitioned_store,
        )

        heal_partitioned_store(self.path)
        files = sorted(
            glob.glob(os.path.join(self.path, "band=*", "*.parquet"))
        )
        if not files:
            return self.spark.createDataFrame([], self._schema_ddl)
        return self.spark.read.option("basePath", self.path).parquet(*files)

    # -- operations ----------------------------------------------------------

    def probe(
        self, media: DataFrame, fake_decode: bool = False
    ) -> DataFrame:
        """(new_id, stored_id, hamming) for every batch image within
        ``max_hamming`` bits of a stored image. Bucket-bounded equi-join
        + exact verify; self-matches excluded."""
        return self._probe_fps(self._fps(media, fake_decode))

    def _probe_fps(self, fps: DataFrame) -> DataFrame:
        new = self._probe_banded(fps).select(
            "band", "key",
            F.col("media_id").alias("new_id"), F.col("fp").alias("new_fp"),
        )
        store = self._store().select(
            "band", "key",
            F.col("media_id").alias("stored_id"), F.col("fp").alias("st_fp"),
        )
        return (
            new.join(store, ["band", "key"])
            .filter(F.col("new_id") != F.col("stored_id"))
            .select(
                "new_id",
                "stored_id",
                F.bit_count(
                    F.col("new_fp").bitwiseXOR(F.col("st_fp"))
                ).alias("hamming"),
            )
            .distinct()
            .filter(F.col("hamming") <= F.lit(int(self.max_hamming)))
        )

    def append(self, media: DataFrame, fake_decode: bool = False) -> None:
        self._append_banded(self._banded(self._fps(media, fake_decode)))

    def _append_banded(self, banded: DataFrame) -> None:
        import glob
        import os

        from sample_dms_kinesis_rds_mariadb_spark.operators.store_maint import (
            heal_partitioned_store,
        )

        heal_partitioned_store(self.path)
        banded.write.mode("append").partitionBy("band").parquet(self.path)
        if self.auto_compact_files is not None:
            n = len(glob.glob(os.path.join(self.path, "band=*", "*.parquet")))
            if n >= self.auto_compact_files:
                self.compact(min_files=self.auto_compact_files)

    def compact(self, min_files: int = 64) -> int:
        from sample_dms_kinesis_rds_mariadb_spark.operators.store_maint import (
            compact_partitioned_store,
        )

        return compact_partitioned_store(
            self.spark, self.path, "band", min_files=min_files
        )

    def dedup_batch(
        self, media: DataFrame, fake_decode: bool = False
    ) -> DataFrame:
        """Survivors of the batch: drop images within ``max_hamming`` of
        the store or of a LOWER-id image in the same batch, then append
        the batch's fingerprints. The MinHashIndex ``dedup_batch``
        discipline verbatim: losers pinned before the append, same-batch
        stored ids excluded for crash-replay idempotence.  The expensive
        decode+hash runs ONCE: the fingerprint frame is pinned and feeds
        the store probe, the in-batch self-join (probe-ball side a vs
        exact side b), and the parquet append."""
        batch_ids = media.select(
            F.col("media_id").alias("stored_id")
        ).distinct()
        fps = self._fps(media, fake_decode).localCheckpoint(eager=True)
        vs_store = (
            self._probe_fps(fps)
            .join(batch_ids, "stored_id", "left_anti")
            .select(F.col("new_id").alias("media_id"))
        )
        a = self._probe_banded(fps).select(
            "band", "key", F.col("media_id").alias("id_a"),
            F.col("fp").alias("fp_a"),
        )
        b = self._banded(fps).select(
            "band", "key", F.col("media_id").alias("id_b"),
            F.col("fp").alias("fp_b"),
        )
        in_batch = (
            a.join(b, ["band", "key"])
            .filter(F.col("id_a") < F.col("id_b"))
            .filter(
                F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
                <= F.lit(int(self.max_hamming))
            )
            .select(F.col("id_b").alias("media_id"))
        )
        losers = (
            vs_store.union(in_batch).distinct().localCheckpoint(eager=True)
        )
        self._append_banded(self._banded(fps))
        return media.join(losers, "media_id", "left_anti")
