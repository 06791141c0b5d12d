"""Independent MJPEG AVI writer for container-decoder tests — composed
from the AVI RIFF spec (OpenDML / Microsoft AVI file format), NOT from
the parser under test. Frames are whatever byte payloads the caller
supplies (tests pass baseline JPEGs from tests/jpeg_writer.py)."""

from __future__ import annotations

import struct


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def write_avi(
    frames: list[bytes],
    width: int,
    height: int,
    fps: int = 25,
    codec: bytes = b"MJPG",
    with_index: bool = True,
) -> bytes:
    """Minimal single-video-stream AVI: hdrl(avih + strl(strh, strf)) +
    movi(00dc frames) + optional idx1."""
    max_frame = max((len(f) for f in frames), default=0)
    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps,   # dwMicroSecPerFrame
        max_frame * fps,    # dwMaxBytesPerSec
        0,                  # dwPaddingGranularity
        0x10,               # dwFlags: AVIF_HASINDEX
        len(frames),        # dwTotalFrames
        0,                  # dwInitialFrames
        1,                  # dwStreams
        max_frame,          # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,
    )
    strh = (
        b"vids"
        + codec
        + struct.pack(
            "<IHHIIIIIIII4h",
            0,              # dwFlags
            0, 0,           # wPriority, wLanguage
            0,              # dwInitialFrames
            1,              # dwScale
            fps,            # dwRate
            0,              # dwStart
            len(frames),    # dwLength
            max_frame,      # dwSuggestedBufferSize
            10_000,         # dwQuality
            0,              # dwSampleSize
            0, 0, width, height,  # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, codec, width * height * 3, 0, 0, 0, 0
    )
    hdrl = _list(b"hdrl", _chunk(b"avih", avih) + _list(
        b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)
    ))
    movi_body = b"".join(_chunk(b"00dc", f) for f in frames)
    movi = _list(b"movi", movi_body)
    idx = b""
    if with_index:
        entries = []
        off = 4  # idx1 offsets are relative to the movi list-type fourcc
        for f in frames:
            entries.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(f)))
            off += 8 + len(f) + (len(f) & 1)
        idx = _chunk(b"idx1", b"".join(entries))
    return _chunk(b"RIFF", b"AVI " + hdrl + movi + idx)
