"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, partitioning, Arrow
batch shape, `mapInPandas` UDF signatures; the actual media decode is
STUBBED (the container has no image/audio libraries): ``decode_image``
raises NotImplementedError unless ``fake=True``, in which case it produces
a deterministic fake (dimensions derived from the content hash) so the
pipeline shape is exercisable end-to-end.

At scale: binary payloads stay columnar in parquet; metadata-only plans never
read the binary column (columnar pruning), and decode/feature-extract runs as
Arrow-batched ``mapInPandas`` — one Python worker per input split, payloads
streamed batch-wise, never collected.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType()),
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("source_uri", T.StringType()),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("sha256", T.StringType()),
    ]
)


def decode_image(content: bytes, fake: bool = False) -> tuple[int, int, int]:
    """Decode image dimensions. STUB: real decode needs an image library not
    present in this container."""
    if not fake:
        raise NotImplementedError(
            "image decode requires an image library (PIL/opencv) — "
            "not available in this environment; pass fake=True for the "
            "deterministic test double"
        )
    h = hashlib.sha256(content).digest()
    width = 1 + (int.from_bytes(h[0:2], "big") % 2048)
    height = 1 + (int.from_bytes(h[2:4], "big") % 2048)
    channels = 1 + (h[4] % 4)
    return width, height, channels


def attach_binary_column(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Test helper: manufacture a media table from a text table (binary
    payload = utf-8 bytes) — exercises the exact schema/plumbing a real
    image table would use."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("content"),
        F.lit("image").alias("media_type"),
        F.concat(F.lit("synthetic://"), F.col(id_col).cast("string")).alias("source_uri"),
    )


def extract_image_features(df: DataFrame, fake_decode: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over the binary column via
    ``mapInPandas`` — the canonical multimodal plumbing. Partition-parallel;
    each batch is a pandas DataFrame of (media_id, content)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                blob = bytes(content) if content is not None else b""
                width, height, channels = decode_image(blob, fake=fake_decode)
                rows.append(
                    {
                        "media_id": media_id,
                        "n_bytes": len(blob),
                        "width": width,
                        "height": height,
                        "channels": channels,
                        "sha256": hashlib.sha256(blob).hexdigest(),
                    }
                )
            yield pd.DataFrame(rows)

    return df.select("media_id", "content").mapInPandas(
        _extract, schema=IMAGE_FEATURES_SCHEMA
    )


def sample_frames(df: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """Frame-sampling plumbing stand-in: emit one row per sampled offset of
    each payload (video frame-sample analog). Pure Spark: posexplode over a
    computed offset sequence — no Python in the hot path."""
    return df.select(
        "media_id",
        F.posexplode(
            F.sequence(
                F.lit(0),
                F.greatest(
                    (F.length("content") / every_n_bytes).cast("int") - 1, F.lit(0)
                ),
            )
        ).alias("frame_no", "offset_step"),
    ).select(
        "media_id",
        "frame_no",
        (F.col("offset_step") * every_n_bytes).alias("byte_offset"),
    )
