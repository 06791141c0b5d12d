"""FLAC container metadata — spec-derived (the flac format spec /
RFC 9639), no codec library.

Parses the metadata-block chain: STREAMINFO (sample rate, channels,
bits per sample, total samples → exact duration, raw-audio MD5) and
VORBIS_COMMENT (title/artist/album tags). Frame decode (rice-coded
subframes) is the usual codec boundary: ``NotImplementedError``.

At scale: bounded per-payload header walk inside Arrow-batched
``mapInPandas`` (``multimodal.extract_media_metadata``).
"""

from __future__ import annotations

_TAG_KEYS = {"title": "title", "artist": "artist", "album": "album"}


def flac_metadata(content: bytes) -> dict:
    """Walk fLaC metadata blocks.

    Returns: container='flac', sample_rate, channels, bits_per_sample,
    total_samples, duration_sec, md5 (hex of the decoded-audio MD5
    STREAMINFO carries), tags. Raises ValueError if the magic or a
    well-formed STREAMINFO is missing.
    """
    if content[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (no fLaC magic)")
    pos = 4
    info = None
    tags: dict = {}
    while pos + 4 <= len(content):
        hdr = content[pos]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        length = int.from_bytes(content[pos + 1 : pos + 4], "big")
        body = content[pos + 4 : pos + 4 + length]
        if len(body) < length:
            raise ValueError("truncated FLAC metadata block")
        if btype == 0:  # STREAMINFO
            if length != 34:
                raise ValueError(f"STREAMINFO must be 34 bytes, got {length}")
            bits = int.from_bytes(body[10:18], "big")  # the packed 64 bits
            sample_rate = bits >> 44
            channels = ((bits >> 41) & 0x7) + 1
            bps = ((bits >> 36) & 0x1F) + 1
            total = bits & ((1 << 36) - 1)
            info = {
                "sample_rate": sample_rate,
                "channels": channels,
                "bits_per_sample": bps,
                "total_samples": total,
                "md5": body[18:34].hex(),
            }
        elif btype == 4:  # VORBIS_COMMENT (little-endian framing)
            p = 0
            vlen = int.from_bytes(body[p : p + 4], "little")
            p += 4 + vlen
            n = int.from_bytes(body[p : p + 4], "little")
            p += 4
            for _ in range(n):
                if p + 4 > len(body):
                    break
                clen = int.from_bytes(body[p : p + 4], "little")
                p += 4
                try:
                    comment = body[p : p + clen].decode("utf-8")
                except UnicodeDecodeError:
                    comment = ""
                p += clen
                key, _, val = comment.partition("=")
                mapped = _TAG_KEYS.get(key.lower())
                if mapped and val and mapped not in tags:
                    tags[mapped] = val
        pos += 4 + length
        if last:
            break
    if info is None:
        raise ValueError("FLAC stream missing STREAMINFO")
    duration = (
        info["total_samples"] / info["sample_rate"] if info["sample_rate"] else None
    )
    return {"container": "flac", **info, "duration_sec": duration, "tags": tags}


def decode_flac_audio(content: bytes) -> bytes:
    raise NotImplementedError(
        "FLAC frame decode (rice-coded subframes) requires a codec "
        "implementation out of scope — flac_metadata() is the real surface"
    )
