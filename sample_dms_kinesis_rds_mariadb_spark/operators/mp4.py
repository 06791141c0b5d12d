"""MP4 / ISO base media file format (ISO/IEC 14496-12) metadata walk —
spec-derived, no media library.

Extracts the curation-relevant container surface without touching sample
data: brand (ftyp), movie duration (mvhd, v0/v1), per-track kind +
codec fourcc (tkhd/mdia/mdhd/hdlr/stsd), video dimensions, audio sample
rate/channels, and iTunes-style ilst title/artist when present. QuickTime
.mov shares the structure and parses identically.

Sample decode (avc1/hev1/mp4a payloads) is a codec-library boundary —
``NotImplementedError`` — same contract as the other media modules.

At scale: a pure box-tree walk over byte offsets; per-payload bounded
work inside Arrow-batched ``mapInPandas``
(``multimodal.extract_media_metadata``), nothing collected.
"""

from __future__ import annotations


def _boxes(data: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for each box in [start, end).
    Handles 64-bit largesize (size==1) and to-end-of-file (size==0)."""
    pos = start
    while pos + 8 <= end:
        size = int.from_bytes(data[pos : pos + 4], "big")
        typ = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated largesize box header")
            size = int.from_bytes(data[pos + 8 : pos + 16], "big")
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < body - pos or pos + size > end:
            raise ValueError(f"malformed box {typ!r} at {pos}: size {size}")
        yield typ, body, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, typ: bytes):
    for t, a, b in _boxes(data, start, end):
        if t == typ:
            return a, b
    return None


# container boxes the track walk descends through
_ITUNES_KEYS = {b"\xa9nam": "title", b"\xa9ART": "artist", b"\xa9alb": "album"}


def _video_config(data: bytes, start: int, end: int) -> str | None:
    """Parse the decoder-configuration child box of a video sample
    entry (avcC/hvcC/vpcC/av1C) into the normalized profile string, or
    None when absent/unparseable — the container walk must stay a
    metadata pass, never a throw (``video_codecs`` raises precisely;
    here a bad config degrades to a null field)."""
    from sample_dms_kinesis_rds_mariadb_spark.operators.video_codecs import (
        parse_av1c,
        parse_avcc,
        parse_hvcc,
        parse_vpcc,
        profile_string,
    )

    parsers = {b"avcC": parse_avcc, b"hvcC": parse_hvcc,
               b"vpcC": parse_vpcc, b"av1C": parse_av1c}
    try:
        for t, a, b in _boxes(data, start, end):
            fn = parsers.get(t)
            if fn is not None:
                return profile_string(fn(data[a:b]))
    except ValueError:
        return None
    return None


def _parse_tracks(data: bytes, moov_a: int, moov_b: int) -> list[dict]:
    tracks = []
    for t, a, b in _boxes(data, moov_a, moov_b):
        if t != b"trak":
            continue
        track: dict = {"kind": None, "codec": None, "width": None,
                       "height": None, "sample_rate": None, "channels": None,
                       "duration_sec": None, "profile": None}
        mdia = _find(data, a, b, b"mdia")
        if mdia is None:
            continue
        mdhd = _find(data, mdia[0], mdia[1], b"mdhd")
        timescale = None
        if mdhd is not None:
            ver = data[mdhd[0]]
            if ver == 1:
                timescale = int.from_bytes(data[mdhd[0] + 20 : mdhd[0] + 24], "big")
                dur = int.from_bytes(data[mdhd[0] + 24 : mdhd[0] + 32], "big")
            else:
                timescale = int.from_bytes(data[mdhd[0] + 12 : mdhd[0] + 16], "big")
                dur = int.from_bytes(data[mdhd[0] + 16 : mdhd[0] + 20], "big")
            if timescale:
                track["duration_sec"] = dur / timescale
        hdlr = _find(data, mdia[0], mdia[1], b"hdlr")
        if hdlr is not None:
            handler = data[hdlr[0] + 8 : hdlr[0] + 12]
            track["kind"] = {b"vide": "video", b"soun": "audio"}.get(
                handler, handler.decode("latin-1").strip()
            )
        minf = _find(data, mdia[0], mdia[1], b"minf")
        if minf is None:
            tracks.append(track)
            continue
        stbl = _find(data, minf[0], minf[1], b"stbl")
        stsd = _find(data, stbl[0], stbl[1], b"stsd") if stbl else None
        if stsd is not None:
            # stsd: version/flags (4) + entry_count (4), then sample entries
            n = int.from_bytes(data[stsd[0] + 4 : stsd[0] + 8], "big")
            if n >= 1:
                for typ, ea, eb in _boxes(data, stsd[0] + 8, stsd[1]):
                    track["codec"] = typ.decode("latin-1").strip()
                    if track["kind"] == "video" and eb - ea >= 28:
                        # VisualSampleEntry: 6 reserved + 2 data_ref_index +
                        # 16 predefined/reserved, then width/height uint16
                        track["width"] = int.from_bytes(
                            data[ea + 24 : ea + 26], "big"
                        )
                        track["height"] = int.from_bytes(
                            data[ea + 26 : ea + 28], "big"
                        )
                        # decoder configuration children follow the
                        # 78-byte VisualSampleEntry fields (14496-15)
                        track["profile"] = _video_config(data, ea + 78, eb)
                    elif track["kind"] == "audio" and eb - ea >= 28:
                        # AudioSampleEntry: 6+2 then 8 reserved, channelcount
                        # uint16, samplesize, predefined, reserved, then
                        # samplerate as 16.16 fixed
                        track["channels"] = int.from_bytes(
                            data[ea + 16 : ea + 18], "big"
                        )
                        track["sample_rate"] = int.from_bytes(
                            data[ea + 24 : ea + 26], "big"
                        )
                    break
        tracks.append(track)
    return tracks


def _parse_ilst(data: bytes, moov_a: int, moov_b: int) -> dict:
    """iTunes-style metadata: moov/udta/meta/ilst/<key>/data."""
    udta = _find(data, moov_a, moov_b, b"udta")
    if udta is None:
        return {}
    meta = _find(data, udta[0], udta[1], b"meta")
    if meta is None:
        return {}
    # meta is a FullBox: 4 bytes version/flags precede its children
    ilst = _find(data, meta[0] + 4, meta[1], b"ilst")
    if ilst is None:
        return {}
    out = {}
    for t, a, b in _boxes(data, ilst[0], ilst[1]):
        key = _ITUNES_KEYS.get(t)
        if key is None:
            continue
        d = _find(data, a, b, b"data")
        if d is None:
            continue
        # data box: 4-byte type indicator (1 = UTF-8) + 4-byte locale
        if int.from_bytes(data[d[0] : d[0] + 4], "big") == 1:
            try:
                out[key] = data[d[0] + 8 : d[1]].decode("utf-8")
            except UnicodeDecodeError:
                pass
    return out


def _parse_heif_meta(content: bytes, meta_a: int, meta_b: int,
                     brand: str | None) -> dict:
    """Image ISOBMFF (HEIF/AVIF, the ISO 23008-12 'meta' layout): the
    largest ispe in iprp/ipco carries the primary image's dimensions
    (thumbnails get smaller ones); the codec config box names the
    coding — av1C → av1 (AVIF), hvcC → hevc (HEIC)."""
    from sample_dms_kinesis_rds_mariadb_spark.operators.video_codecs import (
        parse_av1c,
        parse_hvcc,
        profile_string,
    )

    config_parsers = {b"av1C": parse_av1c, b"hvcC": parse_hvcc}
    width = height = None
    codec = None
    profiles: set[str | None] = set()
    iprp = _find(content, meta_a + 4, meta_b, b"iprp")  # meta is a FullBox
    if iprp is not None:
        ipco = _find(content, iprp[0], iprp[1], b"ipco")
        if ipco is not None:
            best = 0
            for t, a, b in _boxes(content, ipco[0], ipco[1]):
                if t == b"ispe" and b - a >= 12:
                    w = int.from_bytes(content[a + 4 : a + 8], "big")
                    h = int.from_bytes(content[a + 8 : a + 12], "big")
                    if w * h > best:
                        best, width, height = w * h, w, h
                elif t in config_parsers:
                    if codec is None:
                        codec = "av1" if t == b"av1C" else "hevc"
                    try:
                        # ispe stays authoritative for dimensions; the
                        # config record supplies profile/depth/chroma
                        profiles.add(
                            profile_string(config_parsers[t](content[a:b]))
                        )
                    except ValueError:
                        profiles.add(None)
    # without walking pitm/ipma item associations we cannot tell WHICH
    # config belongs to the primary image, so a profile is reported
    # only when every config in ipco agrees (thumbnail != primary →
    # ambiguous → NULL, never the wrong-but-plausible pick)
    profile = next(iter(profiles)) if len(profiles) == 1 else None
    if width is None:
        raise ValueError("HEIF meta carries no ispe item")
    return {
        "container": "heif",
        "brand": brand,
        "duration_sec": None,
        "tracks": [],
        "width": width,
        "height": height,
        "video_codec": codec,
        "video_profile": profile,
        "audio_codec": None,
        "sample_rate": None,
        "channels": None,
        "tags": {},
    }


def _walk_traf(data: bytes, a: int, b: int, per_track: dict) -> None:
    """One traf box: fold its tfhd defaults and trun sample tables into
    the per-track accumulator (14496-12 §8.8.7/8.8.8). Sample counts are
    clamped to the trun box's actual byte extent, so a forged count
    cannot make the walk quadratic in anything but real payload."""
    track_id = None
    default_dur = default_size = None
    tfdt_base = None
    for typ, ba, bb in _boxes(data, a, b):
        if typ == b"tfdt" and bb - ba >= 8:
            ver = data[ba]
            tfdt_base = int.from_bytes(
                data[ba + 4 : ba + 12 if ver else ba + 8], "big"
            )
        elif typ == b"tfhd" and bb - ba >= 8:
            flags = int.from_bytes(data[ba + 1 : ba + 4], "big")
            track_id = int.from_bytes(data[ba + 4 : ba + 8], "big")
            pos = ba + 8
            if flags & 0x1:  # base-data-offset
                pos += 8
            if flags & 0x2:  # sample-description-index
                pos += 4
            if flags & 0x8 and pos + 4 <= bb:
                default_dur = int.from_bytes(data[pos : pos + 4], "big")
                pos += 4
            if flags & 0x10 and pos + 4 <= bb:
                default_size = int.from_bytes(data[pos : pos + 4], "big")
        elif typ == b"trun" and bb - ba >= 8:
            flags = int.from_bytes(data[ba + 1 : ba + 4], "big")
            count = int.from_bytes(data[ba + 4 : ba + 8], "big")
            pos = ba + 8
            if flags & 0x1:  # data-offset
                pos += 4
            if flags & 0x4:  # first-sample-flags
                pos += 4
            per = sum(4 for f in (0x100, 0x200, 0x400, 0x800) if flags & f)
            if per:
                count = min(count, max((bb - pos) // per, 0))
            st = per_track.setdefault(track_id, {
                "n_samples": 0, "total_bytes": 0, "dur_units": 0,
                "dur_known": True, "bytes_known": True, "tfdt_first": None,
            })
            # earliest decode time across the segment's fragments (tfdt
            # precedes trun inside a traf, so the local is populated)
            if st["tfdt_first"] is None and tfdt_base is not None:
                st["tfdt_first"] = tfdt_base
            st["n_samples"] += count
            has_dur = bool(flags & 0x100)
            has_size = bool(flags & 0x200)
            if not has_dur:
                if default_dur is not None:
                    st["dur_units"] += count * default_dur
                else:  # per-track default lives in the init segment's trex
                    st["dur_known"] = False
            if not has_size:
                if default_size is not None:
                    st["total_bytes"] += count * default_size
                else:
                    st["bytes_known"] = False
            if has_dur or has_size:
                size_off = 4 if has_dur else 0
                for i in range(count):
                    o = pos + i * per
                    if has_dur:
                        st["dur_units"] += int.from_bytes(
                            data[o : o + 4], "big"
                        )
                    if has_size:
                        st["total_bytes"] += int.from_bytes(
                            data[o + size_off : o + size_off + 4], "big"
                        )


def _parse_fragment(content: bytes, brand: str | None) -> dict:
    """DASH/CMAF media segment (styp/moof/mdat, no moov; r13 full
    fragmented walk): the headline duration comes from the first sidx
    subsegment table when present; per-track sample counts, byte
    totals, durations, and average bitrates come from the
    moof→traf→tfhd/trun sample tables, with each sidx's reference_ID
    supplying the timescale for the matching track. Tracks carry the
    progressive-MP4 row shape (kind/codec/geometry stay None — those
    live in the init segment) plus track_id/n_samples/total_bytes/
    avg_bitrate_bps."""
    duration = None
    start_sec = None  # sidx earliest_presentation_time (segment align)
    n_moof = 0
    timescales: dict[int, int] = {}
    per_track: dict = {}
    for typ, a, b in _boxes(content, 0, len(content)):
        if typ == b"moof":
            n_moof += 1
            for t2, a2, b2 in _boxes(content, a, b):
                if t2 == b"traf":
                    _walk_traf(content, a2, b2, per_track)
        elif typ == b"sidx" and b - a >= 12:
            ver = content[a]
            ref_id = int.from_bytes(content[a + 4 : a + 8], "big")
            timescale = int.from_bytes(content[a + 8 : a + 12], "big")
            if timescale:
                timescales.setdefault(ref_id, timescale)
            pos = a + 12 + (8 if ver == 0 else 16)
            if duration is None and pos + 4 <= b and timescale:
                ept = int.from_bytes(
                    content[a + 12 : a + 16 if ver == 0 else a + 20], "big"
                )
                start_sec = ept / timescale
                count = int.from_bytes(content[pos + 2 : pos + 4], "big")
                pos += 4
                total = 0
                for _ in range(count):
                    if pos + 12 > b:
                        break
                    total += int.from_bytes(content[pos + 4 : pos + 8], "big")
                    pos += 12
                duration = total / timescale
    if n_moof == 0 and duration is None:
        raise ValueError("not an ISO-BMFF file: no moov, moof, or sidx")
    tracks = []
    for tid, st in sorted(per_track.items(), key=lambda kv: kv[0] or 0):
        ts = timescales.get(tid)
        dur = (
            st["dur_units"] / ts
            if ts and st["dur_known"] and st["dur_units"] else None
        )
        total_bytes = st["total_bytes"] if st["bytes_known"] else None
        tracks.append({
            "kind": None, "codec": None, "width": None, "height": None,
            "sample_rate": None, "channels": None, "profile": None,
            "duration_sec": dur,
            "track_id": tid,
            "n_samples": st["n_samples"],
            "total_bytes": total_bytes,
            "avg_bitrate_bps": (
                round(8 * total_bytes / dur)
                if dur and total_bytes is not None else None
            ),
            # tfdt decode-time offset of the segment's first fragment
            "start_sec": (
                st["tfdt_first"] / ts
                if ts and st["tfdt_first"] is not None else None
            ),
        })
    return {
        "container": "mp4-fragment",
        "brand": brand,
        "duration_sec": duration,
        "tracks": tracks,
        "width": None,
        "height": None,
        "video_codec": None,
        "video_profile": None,
        "audio_codec": None,
        "sample_rate": None,
        "channels": None,
        "tags": {},
        "n_fragments": n_moof,
        "start_sec": start_sec,
    }


def mp4_metadata(content: bytes) -> dict:
    """Walk an MP4/MOV container.

    Returns: container='mp4', brand, duration_sec (mvhd), tracks (list of
    per-track dicts), width/height/codec of the first video track,
    sample_rate/channels of the first audio track, tags (ilst
    title/artist/album). Image ISOBMFF (AVIF/HEIC) returns
    container='heif' with ispe dimensions; moov-less DASH/CMAF media
    segments return container='mp4-fragment' with the sidx duration.
    Raises ValueError when none of those structures exist.
    """
    brand = None
    moov = None
    meta_box = None
    for typ, a, b in _boxes(content, 0, len(content)):
        if typ in (b"ftyp", b"styp") and brand is None:
            brand = content[a : a + 4].decode("latin-1").strip()
        elif typ == b"moov":
            moov = (a, b)
        elif typ == b"meta":
            meta_box = (a, b)
    if moov is None:
        if meta_box is not None and brand in (
            "avif", "avis", "heic", "heix", "mif1", "msf1"
        ):
            return _parse_heif_meta(content, meta_box[0], meta_box[1], brand)
        return _parse_fragment(content, brand)
    mvhd = _find(content, moov[0], moov[1], b"mvhd")
    duration = None
    if mvhd is not None:
        ver = content[mvhd[0]]
        if ver == 1:
            ts = int.from_bytes(content[mvhd[0] + 20 : mvhd[0] + 24], "big")
            dur = int.from_bytes(content[mvhd[0] + 24 : mvhd[0] + 32], "big")
        else:
            ts = int.from_bytes(content[mvhd[0] + 12 : mvhd[0] + 16], "big")
            dur = int.from_bytes(content[mvhd[0] + 16 : mvhd[0] + 20], "big")
        if ts:
            duration = dur / ts
    tracks = _parse_tracks(content, moov[0], moov[1])
    video = next((t for t in tracks if t["kind"] == "video"), None)
    audio = next((t for t in tracks if t["kind"] == "audio"), None)
    return {
        "container": "mp4",
        "brand": brand,
        "duration_sec": duration,
        "tracks": tracks,
        "width": video["width"] if video else None,
        "height": video["height"] if video else None,
        "video_codec": video["codec"] if video else None,
        "video_profile": video["profile"] if video else None,
        "audio_codec": audio["codec"] if audio else None,
        "sample_rate": audio["sample_rate"] if audio else None,
        "channels": audio["channels"] if audio else None,
        "tags": _parse_ilst(content, moov[0], moov[1]),
    }


def decode_mp4_samples(content: bytes) -> bytes:
    """Sample (frame/audio) decode is a codec-library boundary — the
    container walk (``mp4_metadata``) is the real, tested surface."""
    raise NotImplementedError(
        "MP4 sample decode requires codec libraries (H.264/AAC) — "
        "mp4_metadata() extracts the container metadata for real"
    )
