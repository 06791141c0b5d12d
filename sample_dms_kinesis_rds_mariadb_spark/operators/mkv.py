"""Matroska / WebM container metadata — EBML (RFC 8794) + the public
Matroska element registry, spec-derived, no media library.

Why it exists: WebM is the dominant open video container in a crawl
(every YouTube-ecosystem re-upload, most HTML5 `<video>` assets);
before this module those payloads were ``container='unknown'`` rows in
the media metadata sweep. This walks the EBML tree — variable-length
element IDs and sizes (the VINT encoding), unknown-size segments (the
streaming form), Info (TimestampScale + Duration), and Tracks
(codec id, video dims, audio rate/channels) — and normalizes to the
same metadata shape as MP4/Ogg/MP3.

Failure posture: element IDs that don't match the registry are
SKIPPED (size-delimited, so the walk never desyncs); a wrong or
missing element degrades to a null field, never to a wrong-but-
plausible value. Depth- and count-capped against hostile nesting.

At scale: one linear header walk per payload inside the same Arrow
``mapInPandas`` sweep as MP3/MP4/FLAC/Ogg/WAV/ADTS.
"""

from __future__ import annotations

import struct

# EBML / Matroska element IDs (the public registry), with the ID's
# leading-length bits INCLUDED (as they appear in the stream)
EBML_HEADER = 0x1A45DFA3
DOCTYPE = 0x4282
SEGMENT = 0x18538067
INFO = 0x1549A966
TIMESTAMP_SCALE = 0x2AD7B1
DURATION = 0x4489
MUX_APP = 0x4D80
TRACKS = 0x1654AE6B
TRACK_ENTRY = 0xAE
TRACK_TYPE = 0x83
CODEC_ID = 0x86
CODEC_PRIVATE = 0x63A2
VIDEO = 0xE0
PIXEL_WIDTH = 0xB0
PIXEL_HEIGHT = 0xBA
AUDIO = 0xE1
SAMPLING_FREQUENCY = 0xB5
CHANNELS = 0x9F

_NESTED = {EBML_HEADER, SEGMENT, INFO, TRACKS, TRACK_ENTRY, VIDEO, AUDIO}


class MkvError(ValueError):
    """Not a Matroska/WebM stream, or a malformed one."""


# Matroska CodecPrivate per codec-id (the public codec mappings):
# AVC/HEVC/AV1 carry the same ISOBMFF decoder-configuration records as
# MP4; VP9 uses the "VP9 Codec Feature Metadata" (id,len,value) list.
def _vp9_features(private: bytes) -> dict:
    info = {"codec": "vp9", "profile": None, "level": None, "width": None,
            "height": None, "bit_depth": None, "chroma": None,
            "interlaced": False}
    pos = 0
    while pos + 2 <= len(private):
        fid, ln = private[pos], private[pos + 1]
        if pos + 2 + ln > len(private):
            # a partial value would int.from_bytes into a plausible
            # wrong number — degrade to None via the caller's contract
            raise ValueError("truncated VP9 codec feature metadata")
        val = int.from_bytes(private[pos + 2 : pos + 2 + ln], "big")
        if fid == 1:
            info["profile"] = f"profile{val}"
        elif fid == 2:
            info["level"] = f"{val / 10:g}"
        elif fid == 3:
            info["bit_depth"] = val
        pos += 2 + ln
    return info


def _codec_profile(codec_id: str | None, private: bytes | None) -> str | None:
    """CodecPrivate -> normalized profile string; degrades to None on
    any parse failure (a metadata pass, never a throw)."""
    if not codec_id or private is None:
        return None
    from sample_dms_kinesis_rds_mariadb_spark.operators.video_codecs import (
        parse_av1c,
        parse_avcc,
        parse_hvcc,
        profile_string,
    )

    parsers = {
        "V_MPEG4/ISO/AVC": parse_avcc,
        "V_MPEGH/ISO/HEVC": parse_hvcc,
        "V_AV1": parse_av1c,
        "V_VP9": _vp9_features,
    }
    fn = parsers.get(codec_id)
    if fn is None:
        return None
    try:
        return profile_string(fn(private))
    except ValueError:
        return None


def _read_vint(data: bytes, pos: int, keep_marker: bool) -> tuple[int, int]:
    """(value, new_pos) for one EBML variable-length integer. IDs keep
    the length-marker bit (they are matched as they appear); sizes
    strip it. All-ones size payload means 'unknown size' → -1."""
    if pos >= len(data):
        raise MkvError("EBML vint past end")
    first = data[pos]
    if first == 0:
        raise MkvError("invalid EBML vint (leading zero byte)")
    length = 8 - first.bit_length() + 1
    if pos + length > len(data):
        raise MkvError("truncated EBML vint")
    if keep_marker:
        value = 0
        for i in range(length):
            value = (value << 8) | data[pos + i]
    else:
        value = first & ((1 << (8 - length)) - 1)
        ones = value == (1 << (8 - length)) - 1
        for i in range(1, length):
            b = data[pos + i]
            value = (value << 8) | b
            ones = ones and b == 0xFF
        if ones:
            value = -1  # unknown size (streamed segments)
    return value, pos + length


def _walk(data: bytes, pos: int, end: int, depth: int = 0):
    """Yield (element_id, body_start, body_end) within [pos, end)."""
    if depth > 8:
        raise MkvError("EBML nesting exceeds depth 8")
    count = 0
    while pos < end:
        eid, pos = _read_vint(data, pos, keep_marker=True)
        size, pos = _read_vint(data, pos, keep_marker=False)
        body_end = end if size < 0 else min(pos + size, end)
        yield eid, pos, body_end
        pos = body_end
        count += 1
        if count > 4096:
            raise MkvError("EBML element count exceeds the sanity cap")


def _uint(data: bytes, a: int, b: int) -> int:
    v = 0
    for i in range(a, min(b, a + 8)):
        v = (v << 8) | data[i]
    return v


def _float(data: bytes, a: int, b: int) -> float | None:
    n = b - a
    if n == 4:
        return struct.unpack(">f", data[a:b])[0]
    if n == 8:
        return struct.unpack(">d", data[a:b])[0]
    return None


def is_mkv(content: bytes) -> bool:
    return content[:4] == b"\x1aE\xdf\xa3"


def mkv_metadata(content: bytes) -> dict:
    """container ('webm'|'mkv' by DocType), duration_sec, width/height
    + video_codec of the first video track, sample_rate/channels +
    audio_codec of the first audio track."""
    if not is_mkv(content):
        raise MkvError("no EBML magic")
    doctype = None
    tscale = 1_000_000  # Matroska default: ns per timestamp unit
    duration_units = None
    video: dict = {}
    audio: dict = {}

    def handle_track(a: int, b: int) -> None:
        ttype = None
        codec = None
        private = None
        vdims: dict = {}
        adims: dict = {}
        for eid, x, y in _walk(content, a, b, 3):
            if eid == TRACK_TYPE:
                ttype = _uint(content, x, y)
            elif eid == CODEC_ID:
                codec = content[x:y].decode("ascii", "replace")
            elif eid == CODEC_PRIVATE:
                private = content[x:y]
            elif eid == VIDEO:
                for e2, p, q in _walk(content, x, y, 4):
                    if e2 == PIXEL_WIDTH:
                        vdims["width"] = _uint(content, p, q)
                    elif e2 == PIXEL_HEIGHT:
                        vdims["height"] = _uint(content, p, q)
            elif eid == AUDIO:
                for e2, p, q in _walk(content, x, y, 4):
                    if e2 == SAMPLING_FREQUENCY:
                        f = _float(content, p, q)
                        if f:
                            adims["sample_rate"] = int(round(f))
                    elif e2 == CHANNELS:
                        adims["channels"] = _uint(content, p, q)
        if ttype == 1 and not video:
            video.update(vdims, codec=codec,
                         profile=_codec_profile(codec, private))
        elif ttype == 2 and not audio:
            audio.update(adims, codec=codec)

    for eid, a, b in _walk(content, 0, len(content)):
        if eid == EBML_HEADER:
            for e2, x, y in _walk(content, a, b, 1):
                if e2 == DOCTYPE:
                    doctype = content[x:y].decode("ascii", "replace")
        elif eid == SEGMENT:
            for e2, x, y in _walk(content, a, b, 1):
                if e2 == INFO:
                    for e3, p, q in _walk(content, x, y, 2):
                        if e3 == TIMESTAMP_SCALE:
                            tscale = _uint(content, p, q)
                        elif e3 == DURATION:
                            duration_units = _float(content, p, q)
                elif e2 == TRACKS:
                    for e3, p, q in _walk(content, x, y, 2):
                        if e3 == TRACK_ENTRY:
                            handle_track(p, q)
    if doctype is None:
        raise MkvError("EBML stream carries no DocType")
    duration = None
    if duration_units is not None:
        duration = duration_units * tscale / 1e9
    return {
        "container": "webm" if doctype == "webm" else "mkv",
        "doctype": doctype,
        "duration_sec": duration,
        "width": video.get("width"),
        "height": video.get("height"),
        "video_codec": video.get("codec"),
        "video_profile": video.get("profile"),
        "sample_rate": audio.get("sample_rate"),
        "channels": audio.get("channels"),
        "audio_codec": audio.get("codec"),
    }
