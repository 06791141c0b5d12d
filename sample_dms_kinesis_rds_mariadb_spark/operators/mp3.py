"""MP3 (MPEG-1/2/2.5 audio) metadata extraction — spec-derived, no codec
library.

Covers the curation-relevant surface of an MP3 payload without decoding
audio: ID3v1 / ID3v2.2-2.4 tags, the MPEG audio frame-header walk
(version, layer, bitrate, sample rate, channel mode, per-frame length
arithmetic from ISO/IEC 11172-3 §2.4.2.3 / 13818-3), and the Xing/Info
and VBRI VBR headers for exact VBR durations. PCM SAMPLE decode (r10)
lives in ``operators/mp3_layer3.py`` — real for MPEG-1 Layer III, with
the Huffman-table-subset and MPEG-2/2.5 boundaries documented there —
and is re-exported here as :func:`decode_mp3_audio`.

Reference behavior parity: the reference pipeline treats media as opaque
payloads with typed metadata (SURVEY.md multimodal mandate); this module
supplies the audio-container metadata leg.

At scale: runs per-row inside Arrow-batched ``mapInPandas``
(``multimodal.extract_media_metadata``) — bounded work per payload, the
frame walk is a single linear pass over the blob, nothing collected.
"""

from __future__ import annotations

# bitrate tables in kbps, index 1..14 (0 = free-format, 15 = invalid) —
# ISO 11172-3 Table B.1 / 13818-3. Key: (mpeg1?, layer)
_BITRATES = {
    (True, 1): (32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    (True, 2): (32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    (True, 3): (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    (False, 1): (32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    (False, 2): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    (False, 3): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
# sample-rate table by version bits (00=2.5, 10=2, 11=1), index 0..2
_SAMPLE_RATES = {
    "1": (44100, 48000, 32000),
    "2": (22050, 24000, 16000),
    "2.5": (11025, 12000, 8000),
}
_VERSION_BITS = {0b00: "2.5", 0b10: "2", 0b11: "1"}
_LAYER_BITS = {0b01: 3, 0b10: 2, 0b11: 1}

# ID3v2.3/2.4 (and v2.2 3-char) text-frame IDs worth surfacing
_ID3_TEXT_FRAMES = {
    "TIT2": "title", "TT2": "title",
    "TPE1": "artist", "TP1": "artist",
    "TALB": "album", "TAL": "album",
    "TYER": "year", "TDRC": "year", "TYE": "year",
    "TRCK": "track", "TRK": "track",
    "TCON": "genre", "TCO": "genre",
}
_ID3_ENCODINGS = {0: "latin-1", 1: "utf-16", 2: "utf-16-be", 3: "utf-8"}


def parse_frame_header(hdr: bytes) -> dict:
    """Decode one 4-byte MPEG audio frame header.

    Returns version ('1'/'2'/'2.5'), layer (1/2/3), bitrate_kbps,
    sample_rate, channels (1/2), samples (per frame), frame_len (bytes,
    including the header), crc (bool). Raises ValueError on anything
    that is not a valid, non-free-format frame header.
    """
    if len(hdr) < 4 or hdr[0] != 0xFF or (hdr[1] & 0xE0) != 0xE0:
        raise ValueError("no MPEG frame sync")
    vbits = (hdr[1] >> 3) & 0b11
    lbits = (hdr[1] >> 1) & 0b11
    if vbits not in _VERSION_BITS or lbits not in _LAYER_BITS:
        raise ValueError("reserved MPEG version/layer")
    version = _VERSION_BITS[vbits]
    layer = _LAYER_BITS[lbits]
    crc = (hdr[1] & 0x01) == 0
    br_idx = hdr[2] >> 4
    sr_idx = (hdr[2] >> 2) & 0b11
    if br_idx in (0, 15) or sr_idx == 3:
        raise ValueError("free-format/invalid bitrate or bad sample-rate index")
    padding = (hdr[2] >> 1) & 1
    channels = 1 if ((hdr[3] >> 6) & 0b11) == 0b11 else 2
    mpeg1 = version == "1"
    bitrate = _BITRATES[(mpeg1, layer)][br_idx - 1] * 1000
    sample_rate = _SAMPLE_RATES[version][sr_idx]
    if layer == 1:
        samples = 384
        frame_len = (12 * bitrate // sample_rate + padding) * 4
    else:
        samples = 1152 if (layer == 2 or mpeg1) else 576
        frame_len = samples // 8 * bitrate // sample_rate + padding
    return {
        "version": version, "layer": layer, "bitrate_kbps": bitrate // 1000,
        "sample_rate": sample_rate, "channels": channels,
        "samples": samples, "frame_len": frame_len, "crc": crc,
    }


def _side_info_len(version: str, channels: int) -> int:
    """Layer III side-information size (bytes) — where Xing/Info lives."""
    if version == "1":
        return 17 if channels == 1 else 32
    return 9 if channels == 1 else 17


def parse_vbr_header(frame: bytes, hdr: dict) -> dict | None:
    """Xing/Info (LAME) or VBRI (Fraunhofer) header inside the first frame.

    Returns {'tag': 'Xing'|'Info'|'VBRI', 'frames': int|None,
    'bytes': int|None} or None if the frame carries neither.
    """
    off = 4 + (2 if hdr["crc"] else 0) + _side_info_len(
        hdr["version"], hdr["channels"]
    )
    if frame[off : off + 4] in (b"Xing", b"Info"):
        tag = frame[off : off + 4].decode()
        flags = int.from_bytes(frame[off + 4 : off + 8], "big")
        pos = off + 8
        n_frames = n_bytes = None
        if flags & 0x1:
            n_frames = int.from_bytes(frame[pos : pos + 4], "big")
            pos += 4
        if flags & 0x2:
            n_bytes = int.from_bytes(frame[pos : pos + 4], "big")
        return {"tag": tag, "frames": n_frames, "bytes": n_bytes}
    if frame[36:40] == b"VBRI":  # fixed offset: 4-byte header + 32
        return {
            "tag": "VBRI",
            "frames": int.from_bytes(frame[50:54], "big"),
            "bytes": int.from_bytes(frame[46:50], "big"),
        }
    return None


def _unsynchronize(data: bytes) -> bytes:
    """Reverse ID3v2 unsynchronisation: FF 00 -> FF."""
    return data.replace(b"\xff\x00", b"\xff")


def _syncsafe(b: bytes) -> int:
    n = 0
    for byte in b:
        n = (n << 7) | (byte & 0x7F)
    return n


def _decode_text_frame(data: bytes) -> str | None:
    if not data:
        return None
    enc = _ID3_ENCODINGS.get(data[0])
    if enc is None:
        return None
    try:
        return data[1:].decode(enc).rstrip("\x00").strip() or None
    except UnicodeDecodeError:
        return None


def parse_id3v2(content: bytes) -> tuple[dict, int]:
    """Parse a leading ID3v2.2/2.3/2.4 tag.

    Returns ({title, artist, album, year, track, genre} — present keys
    only — , total tag size including the 10-byte header). ( {}, 0 ) if
    no tag. Handles sync-safe sizes, the tag-level unsynchronisation
    flag, extended headers, and v2.4's per-frame sync-safe sizes.
    """
    if content[:3] != b"ID3" or len(content) < 10:
        return {}, 0
    major = content[3]
    flags = content[5]
    size = _syncsafe(content[6:10])
    total = 10 + size + (10 if flags & 0x10 else 0)  # footer flag (v2.4)
    body = content[10 : 10 + size]
    if flags & 0x80:  # tag-level unsynchronisation
        body = _unsynchronize(body)
    pos = 0
    if flags & 0x40 and len(body) >= 4:  # extended header: skip
        if major == 4:
            pos = _syncsafe(body[0:4])
        else:
            pos = 4 + int.from_bytes(body[0:4], "big")
    tags: dict = {}
    id_len, sz_len = (3, 3) if major == 2 else (4, 4)
    frame_hdr = id_len + sz_len + (0 if major == 2 else 2)
    while pos + frame_hdr <= len(body):
        fid = body[pos : pos + id_len]
        if fid.strip(b"\x00") == b"":  # padding
            break
        try:
            fid_s = fid.decode("ascii")
        except UnicodeDecodeError:
            break
        raw_sz = body[pos + id_len : pos + id_len + sz_len]
        if major == 4:
            fsize = _syncsafe(raw_sz)
        else:
            fsize = int.from_bytes(raw_sz, "big")
        data = body[pos + frame_hdr : pos + frame_hdr + fsize]
        key = _ID3_TEXT_FRAMES.get(fid_s)
        if key and key not in tags:
            val = _decode_text_frame(data)
            if val:
                tags[key] = val
        pos += frame_hdr + fsize
    return tags, total


def parse_id3v1(content: bytes) -> dict:
    """Trailing 128-byte ID3v1 tag → {title, artist, album, year} (present
    keys only; {} if absent)."""
    if len(content) < 128 or content[-128:-125] != b"TAG":
        return {}
    tag = content[-128:]

    def field(a: int, b: int) -> str | None:
        s = tag[a:b].split(b"\x00", 1)[0].decode("latin-1").strip()
        return s or None

    out = {}
    for key, a, b in (
        ("title", 3, 33), ("artist", 33, 63), ("album", 63, 93), ("year", 93, 97)
    ):
        v = field(a, b)
        if v:
            out[key] = v
    return out


def mp3_metadata(content: bytes) -> dict:
    """Full metadata walk of an MP3 payload.

    Returns: container='mp3', version, layer, sample_rate, channels,
    n_frames, duration_sec, bitrate_kbps (average; exact for CBR, from
    the VBR header or the frame walk for VBR), vbr (bool), tags (merged
    ID3v2 over ID3v1). Counts every sync-valid frame in one linear pass,
    resynchronizing across junk bytes. Raises ValueError if no MPEG
    frame is found at all.
    """
    tags_v2, tag_size = parse_id3v2(content)
    tags_v1 = parse_id3v1(content)
    end = len(content) - 128 if tags_v1 else len(content)
    pos = tag_size
    first = None
    vbr_info = None
    n_frames = 0
    audio_bytes = 0
    bitrates = set()
    while pos + 4 <= end:
        try:
            hdr = parse_frame_header(content[pos : pos + 4])
        except ValueError:
            pos += 1  # resync
            continue
        if first is None:
            first = hdr
            vbr_info = parse_vbr_header(content[pos : pos + hdr["frame_len"]], hdr)
            if vbr_info is not None:
                # the Xing/Info/VBRI frame itself carries no audio
                pos += hdr["frame_len"]
                continue
        n_frames += 1
        audio_bytes += hdr["frame_len"]
        bitrates.add(hdr["bitrate_kbps"])
        pos += hdr["frame_len"]
    if first is None:
        raise ValueError("no MPEG audio frame found")
    rate = first["sample_rate"]
    if vbr_info is not None and vbr_info.get("frames"):
        n_frames = vbr_info["frames"]
        if vbr_info.get("bytes"):
            audio_bytes = vbr_info["bytes"]
    duration = n_frames * first["samples"] / rate if rate else 0.0
    vbr = (vbr_info is not None and vbr_info["tag"] in ("Xing", "VBRI")) or len(
        bitrates
    ) > 1
    if duration > 0 and audio_bytes:
        avg_kbps = audio_bytes * 8 / duration / 1000
    else:
        avg_kbps = float(first["bitrate_kbps"])
    return {
        "container": "mp3",
        "version": first["version"],
        "layer": first["layer"],
        "sample_rate": rate,
        "channels": first["channels"],
        "n_frames": n_frames,
        "duration_sec": duration,
        "bitrate_kbps": avg_kbps,
        "vbr": vbr,
        "tags": {**tags_v1, **tags_v2},
    }


def decode_mp3_audio(content: bytes):
    """(sample_rate, channels, interleaved float64 PCM-domain samples) —
    REAL MPEG-1 Layer III sample decode (r10): Huffman spectrum,
    requantization, stereo, alias butterflies, IMDCT, and the polyphase
    synthesis live in ``operators/mp3_layer3.py`` (see its docstring for
    the two documented boundaries: the verified Huffman-table subset and
    MPEG-2/2.5)."""
    from sample_dms_kinesis_rds_mariadb_spark.operators.mp3_layer3 import (
        decode_mp3_samples,
    )

    return decode_mp3_samples(content)
