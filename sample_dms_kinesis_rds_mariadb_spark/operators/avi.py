"""MJPEG-in-AVI video decode — stdlib RIFF walk + the baseline JPEG
decoder (``operators/jpeg.py``), no media library.

Upgrades the engine's video surface from byte-offset frame-sampling
plumbing (``multimodal.sample_frames``) to REAL container parsing: an AVI
file is a RIFF tree (``hdrl`` header list with ``avih``/``strh``/``strf``,
``movi`` list holding ``##dc``/``##db`` frame chunks), and an MJPEG AVI's
frame chunks are standalone baseline JPEGs — so with the in-repo JPEG
decoder the whole video path is decodable end-to-end: container →
per-frame JPEG bytes → pixels.

Honest boundary: non-MJPEG codecs (the ``strf`` BITMAPINFOHEADER's
``biCompression`` says which) parse for METADATA (dims/fps/frame count)
but raise ``NotImplementedError`` on frame pixel decode, same contract as
``decode_image``'s unsupported formats.

Scale shape: ``extract_video_features`` / ``sample_video_frames`` are
Arrow-batched ``mapInPandas`` — payloads stream batch-wise, partition-
parallel, never collected; sampled frames come out as binary JPEG
payloads that feed straight back into ``extract_image_features`` /
``resize_images`` (one composable media pipeline). Verified in
``tests/test_avi.py`` against an INDEPENDENT spec-derived AVI writer.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def _chunks(buf: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_size) for RIFF chunks in [pos, end);
    LIST chunks yield their list-type as fourcc prefix 'LIST:'."""
    while pos + 8 <= end:
        cid = buf[pos : pos + 4]
        size = struct.unpack("<I", buf[pos + 4 : pos + 8])[0]
        body = pos + 8
        if body + size > len(buf):
            raise ValueError(f"truncated AVI chunk {cid!r} at offset {pos}")
        if cid == b"LIST":
            yield b"LIST:" + buf[body : body + 4], body + 4, size - 4
        else:
            yield cid, body, size
        pos = body + size + (size & 1)  # word alignment


def parse_avi(content: bytes) -> dict:
    """Parse the AVI container: returns ``{width, height, fps, n_frames,
    codec, frames}`` with ``frames`` the list of (offset, size) of video
    stream chunks in ``movi`` order. Metadata comes from ``avih`` and the
    first ``vids`` stream's ``strh``/``strf``."""
    if content[:4] != b"RIFF" or content[8:12] != b"AVI ":
        raise ValueError("not an AVI (bad RIFF/AVI signature)")
    riff_size = struct.unpack("<I", content[4:8])[0]
    end = min(len(content), 8 + riff_size)
    avih = None
    codec = None
    scale = rate = None
    stream_no = -1
    vids_stream = None
    frames: list[tuple[int, int]] = []

    def walk(pos: int, end: int) -> None:
        nonlocal avih, codec, scale, rate, stream_no, vids_stream
        for cc, body, size in _chunks(content, pos, end):
            if cc == b"avih":
                avih = content[body : body + size]
            elif cc == b"LIST:strl":
                stream_no += 1
                walk(body, body + size)
            elif cc in (b"LIST:hdrl", b"LIST:odml"):
                walk(body, body + size)
            elif cc == b"strh":
                if content[body : body + 4] == b"vids" and vids_stream is None:
                    vids_stream = stream_no
                    # dwScale at offset 20, dwRate at 24 (fps = rate/scale)
                    scale, rate = struct.unpack(
                        "<II", content[body + 20 : body + 28]
                    )
            elif cc == b"strf" and vids_stream == stream_no and codec is None:
                # BITMAPINFOHEADER: biCompression fourcc at offset 16
                codec = content[body + 16 : body + 20].decode(
                    "ascii", "replace"
                )
            elif cc == b"LIST:movi":
                if vids_stream is None:
                    raise ValueError("AVI movi list before any vids stream")
                want = b"%02d" % vids_stream
                for fcc, fbody, fsize in _chunks(content, body, body + size):
                    if fcc[:2] == want and fcc[2:4] in (b"dc", b"db"):
                        frames.append((fbody, fsize))

    walk(12, end)
    if avih is None or len(avih) < 40:
        raise ValueError("AVI missing avih main header")
    if vids_stream is None:
        raise ValueError("AVI has no video stream")
    usec_per_frame, = struct.unpack("<I", avih[0:4])
    total_frames, = struct.unpack("<I", avih[16:20])
    width, height = struct.unpack("<II", avih[32:40])
    if rate and scale:
        fps = rate / scale
    elif usec_per_frame:
        fps = 1e6 / usec_per_frame
    else:
        fps = 0.0
    return {
        "width": int(width),
        "height": int(height),
        "fps": float(fps),
        "n_frames": len(frames) or int(total_frames),
        "codec": (codec or "").strip("\x00") or "DIB ",
        "frames": frames,
    }


def video_frames(
    content: bytes, every_k: int = 1
) -> Iterator[tuple[int, bytes]]:
    """(frame_no, frame_bytes) for every k-th video frame, in stream order.
    For MJPEG each payload is a standalone baseline JPEG (decodable by
    ``operators.jpeg.decode_jpeg`` / ``multimodal.decode_image``); other
    codecs raise — metadata stays available through :func:`parse_avi`."""
    if every_k < 1:
        raise ValueError(f"every_k must be >= 1, got {every_k}")
    meta = parse_avi(content)
    if meta["codec"].upper() not in ("MJPG", "MJPEG"):
        raise NotImplementedError(
            f"AVI codec {meta['codec']!r} frame decode not supported — "
            "MJPEG only (frames are standalone baseline JPEGs)"
        )
    for i, (off, size) in enumerate(meta["frames"]):
        if i % every_k == 0:
            yield i, content[off : off + size]


VIDEO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("fps", T.DoubleType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("codec", T.StringType()),
        T.StructField("sha256", T.StringType()),
    ]
)

SAMPLED_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("source_uri", T.StringType()),
    ]
)


def extract_video_features(df: DataFrame) -> DataFrame:
    """Arrow-batched AVI metadata extraction via ``mapInPandas`` — the
    video twin of ``extract_image_features``. Header-only parse: frame
    payloads are located but never pixel-decoded here."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                blob = bytes(content) if content is not None else b""
                meta = parse_avi(blob)
                rows.append(
                    {
                        "media_id": media_id,
                        "n_bytes": len(blob),
                        "width": meta["width"],
                        "height": meta["height"],
                        "fps": meta["fps"],
                        "n_frames": meta["n_frames"],
                        "codec": meta["codec"],
                        "sha256": hashlib.sha256(blob).hexdigest(),
                    }
                )
            yield pd.DataFrame(rows)

    return df.select("media_id", "content").mapInPandas(
        _extract, schema=VIDEO_FEATURES_SCHEMA
    )


def sample_video_frames(df: DataFrame, every_k: int = 1) -> DataFrame:
    """Every k-th REAL frame of each MJPEG AVI as a binary JPEG payload —
    rows carry the MEDIA_SCHEMA columns, so the output feeds directly into
    ``extract_image_features`` / ``resize_images`` (container → frames →
    pixels, one composable pipeline). Arrow-batched ``mapInPandas``;
    frame bytes are sliced per batch, never collected driver-side."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                blob = bytes(content) if content is not None else b""
                for frame_no, frame in video_frames(blob, every_k=every_k):
                    rows.append(
                        {
                            "media_id": media_id,
                            "frame_no": frame_no,
                            "content": frame,
                            "media_type": "image",
                            "source_uri": f"avi://{media_id}/frame/{frame_no}",
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in SAMPLED_FRAMES_SCHEMA.fields]
            )

    return df.select("media_id", "content").mapInPandas(
        _sample, schema=SAMPLED_FRAMES_SCHEMA
    )
