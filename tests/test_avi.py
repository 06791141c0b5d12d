"""MJPEG AVI container decode (operators/avi.py) vs the INDEPENDENT
spec-derived writer in tests/avi_writer.py: metadata parity, frame
extraction, per-frame pixel round-trip through the baseline JPEG decoder,
codec boundaries, and the container → frames → image-features pipeline
composition in Spark."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sample_dms_kinesis_rds_mariadb_spark.operators.avi import (
    extract_video_features,
    parse_avi,
    sample_video_frames,
    video_frames,
)
from sample_dms_kinesis_rds_mariadb_spark.operators.jpeg import decode_jpeg
from sample_dms_kinesis_rds_mariadb_spark.operators.multimodal import (
    extract_image_features,
)
from tests.avi_writer import write_avi
from tests.jpeg_writer import encode_jpeg


def _frame_img(h, w, t):
    yy, xx = np.mgrid[0:h, 0:w]
    base = 128 + 60 * np.sin(yy / 7.0 + t) + 50 * np.cos(xx / 11.0 - t)
    return np.clip(np.stack([base] * 3, -1), 0, 255).astype(np.uint8)


def _mjpeg_avi(n_frames=6, h=24, w=32, fps=10, **kw):
    imgs = [_frame_img(h, w, t) for t in range(n_frames)]
    frames = [encode_jpeg(im, quality=88) for im in imgs]
    return write_avi(frames, width=w, height=h, fps=fps, **kw), imgs, frames


def test_parse_avi_metadata():
    blob, _imgs, frames = _mjpeg_avi(n_frames=7, h=24, w=32, fps=10)
    meta = parse_avi(blob)
    assert (meta["width"], meta["height"]) == (32, 24)
    assert meta["fps"] == pytest.approx(10.0)
    assert meta["n_frames"] == 7
    assert meta["codec"] == "MJPG"
    assert [s for _o, s in meta["frames"]] == [len(f) for f in frames]
    # no-index variant parses identically
    blob2, _i, _f = _mjpeg_avi(n_frames=7, h=24, w=32, fps=10, with_index=False)
    assert parse_avi(blob2)["n_frames"] == 7


def test_video_frames_roundtrip_pixels():
    blob, imgs, frames = _mjpeg_avi(n_frames=5)
    got = list(video_frames(blob))
    assert [n for n, _ in got] == [0, 1, 2, 3, 4]
    # extracted bytes are the EXACT encoded frames
    assert [f for _n, f in got] == frames
    # and each decodes to pixels near the source image
    for (n, fb), img in zip(got, imgs):
        w, h, c, px = decode_jpeg(fb)
        arr = np.frombuffer(px, np.uint8).reshape(h, w, c).astype(float)
        assert abs(arr - img).mean() < 4.0
    # every_k sampling
    assert [n for n, _ in video_frames(blob, every_k=2)] == [0, 2, 4]


def test_non_mjpeg_codec_boundary():
    blob, _imgs, _frames = _mjpeg_avi(n_frames=3)
    other = write_avi(
        [b"\x00" * 64] * 3, width=16, height=16, fps=5, codec=b"XVID"
    )
    meta = parse_avi(other)  # metadata still parses
    assert meta["codec"] == "XVID" and meta["n_frames"] == 3
    with pytest.raises(NotImplementedError, match="XVID"):
        list(video_frames(other))
    with pytest.raises(ValueError, match="RIFF"):
        parse_avi(b"not an avi at all")
    with pytest.raises(ValueError):
        parse_avi(blob[: len(blob) // 2])  # truncated chunk


def test_extract_video_features_e2e(spark):
    blobs = []
    for i, (n, h, w, fps) in enumerate([(4, 16, 24, 5), (6, 24, 32, 10)]):
        blob, _im, _fr = _mjpeg_avi(n_frames=n, h=h, w=w, fps=fps)
        blobs.append((i, bytearray(blob), "video", f"synthetic://{i}"))
    df = spark.createDataFrame(
        blobs,
        "media_id long, content binary, media_type string, source_uri string",
    )
    got = {r["media_id"]: r for r in extract_video_features(df).collect()}
    assert got[0]["n_frames"] == 4 and got[0]["width"] == 24
    assert got[1]["fps"] == pytest.approx(10.0) and got[1]["height"] == 24
    assert all(got[i]["codec"] == "MJPG" for i in (0, 1))


def test_container_to_frames_to_image_features_pipeline(spark):
    """The composition the module exists for: AVI → sampled JPEG frames →
    extract_image_features, all real decode, all Arrow-batched."""
    blob, _imgs, frames = _mjpeg_avi(n_frames=6, h=24, w=32)
    df = spark.createDataFrame(
        [(7, bytearray(blob), "video", "synthetic://7")],
        "media_id long, content binary, media_type string, source_uri string",
    )
    sampled = sample_video_frames(df, every_k=2)
    rows = sampled.collect()
    assert [r["frame_no"] for r in rows] == [0, 2, 4]
    assert all(bytes(r["content"]).startswith(b"\xff\xd8") for r in rows)
    feats = extract_image_features(
        sampled.select(
            (F.col("media_id") * 100 + F.col("frame_no")).alias("media_id"),
            "content",
        )
    ).collect()
    assert len(feats) == 3
    for r in feats:
        assert r["format"] == "jpeg"
        assert (r["width"], r["height"], r["channels"]) == (32, 24, 3)
