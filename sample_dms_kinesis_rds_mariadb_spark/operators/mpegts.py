"""MPEG transport stream (ISO/IEC 13818-1) metadata walk — the
container every HLS segment (.ts) and broadcast capture in a crawl
ships in, spec-derived, no media library.

What it extracts: packet stride (188 plain / 192 M2TS / 204 RS-coded),
the PAT → PMT chain (program map, stream types → codec names), duration
from the PCR span on the PCR PID (PES PTS span as the fallback), and —
because the video elementary stream is Annex B — the H.264/HEVC SPS
geometry via :mod:`operators.video_codecs`, so a bare HLS segment
yields the same profile/level/dims row an MP4 does.

Failure posture: not-a-TS and structurally broken streams raise
``ValueError``; missing tables degrade to null fields (a segment
without a PMT in its first packets is still a TS). The walk is
size-delimited per packet, so it never desyncs past a corrupt packet —
it resynchronizes on the next stride-aligned 0x47.

At scale: one linear pass over the payload inside the same Arrow
``mapInPandas`` media sweep as MP4/Matroska; per-payload bounded with
a packet-count cap. SPS parsing costs O(parameter set) once.
"""

from __future__ import annotations

SYNC = 0x47
MAX_PACKETS = 2_000_000  # ~376 MB at stride 188 — far past any segment

# ISO 13818-1 Table 2-34 + common registrations
STREAM_TYPES = {
    0x01: "mpeg1video", 0x02: "mpeg2video", 0x03: "mpeg1audio",
    0x04: "mpeg2audio", 0x0F: "aac", 0x11: "aac-latm", 0x1B: "h264",
    0x24: "hevc", 0x81: "ac3", 0x87: "eac3", 0x06: "private-pes",
    0x15: "id3-metadata",
}

_VIDEO_TYPES = {0x01, 0x02, 0x1B, 0x24}
_AUDIO_TYPES = {0x03, 0x04, 0x0F, 0x11, 0x81, 0x87}


def detect_stride(content: bytes) -> tuple[int, int]:
    """(stride, first_offset): 188-byte packets, 192 (M2TS — a 4-byte
    copy-permission/timestamp prefix BEFORE each packet), or 204
    (Reed-Solomon trailer). Requires three aligned sync bytes."""
    for stride, off in ((188, 0), (192, 4), (204, 0)):
        if len(content) >= off + 2 * stride + 1 and all(
            content[off + i * stride] == SYNC for i in range(3)
        ):
            return stride, off
    raise ValueError("not an MPEG transport stream (no 0x47 sync pattern)")


def is_mpegts(content: bytes) -> bool:
    try:
        detect_stride(content)
        return True
    except ValueError:
        return False


def _psi_section(payload: bytes) -> bytes:
    """PSI payload begins with a pointer_field when PUSI is set."""
    if not payload:
        raise ValueError("empty PSI payload")
    ptr = payload[0]
    return payload[1 + ptr :]


def _parse_pat(section: bytes) -> dict[int, int]:
    """table_id 0x00 → {program_number: program_map_PID}."""
    if len(section) < 12 or section[0] != 0x00:
        raise ValueError("not a PAT section")
    length = ((section[1] & 0x0F) << 8) | section[2]
    end = min(3 + length - 4, len(section))  # strip CRC32
    out = {}
    pos = 8
    while pos + 4 <= end:
        prog = (section[pos] << 8) | section[pos + 1]
        pid = ((section[pos + 2] & 0x1F) << 8) | section[pos + 3]
        if prog != 0:  # 0 = network PID
            out[prog] = pid
        pos += 4
    return out


def _parse_pmt(section: bytes) -> tuple[int, list[tuple[int, int]]]:
    """table_id 0x02 → (pcr_pid, [(stream_type, elementary_pid), ...])."""
    if len(section) < 16 or section[0] != 0x02:
        raise ValueError("not a PMT section")
    length = ((section[1] & 0x0F) << 8) | section[2]
    end = min(3 + length - 4, len(section))
    pcr_pid = ((section[8] & 0x1F) << 8) | section[9]
    info_len = ((section[10] & 0x0F) << 8) | section[11]
    pos = 12 + info_len
    streams = []
    while pos + 5 <= end:
        stype = section[pos]
        epid = ((section[pos + 1] & 0x1F) << 8) | section[pos + 2]
        es_len = ((section[pos + 3] & 0x0F) << 8) | section[pos + 4]
        streams.append((stype, epid))
        pos += 5 + es_len
    return pcr_pid, streams


def _pes_pts(payload: bytes) -> int | None:
    """PTS (90 kHz) from a PES header at a payload-unit start."""
    if len(payload) < 14 or payload[:3] != b"\x00\x00\x01":
        return None
    stream_id = payload[3]
    if not (0xC0 <= stream_id <= 0xEF or stream_id == 0xBD):
        return None  # only audio/video/private-1 carry PTS we trust
    flags = payload[7]
    if not flags & 0x80:  # PTS_DTS_flags
        return None
    p = payload[9:14]
    return (((p[0] >> 1) & 0x07) << 30) | (p[1] << 22) | ((p[2] >> 1) << 15) \
        | (p[3] << 7) | (p[4] >> 1)


def ts_metadata(content: bytes) -> dict:
    """Walk a transport stream: container='mpegts', stride, programs,
    video/audio codec names, duration (PCR span, PES-PTS fallback),
    and SPS-derived width/height/profile for H.264/HEVC video."""
    stride, first_off = detect_stride(content)
    pmt_pids: set[int] = set()
    pcr_pid = None
    streams: list[tuple[int, int]] = []
    # PCR span tracked PER PID: in a multi-program mux each program has
    # its own clock, and the PMT naming the PCR PID may arrive after
    # the first PCR — mixing two clocks would fabricate a duration
    pcr_span: dict[int, list[int]] = {}
    # PTS fallback tracked PER PID like the PCR span: a multi-program or
    # multi-stream mux without usable PCR must not mix timelines from
    # unrelated elementary streams into one duration (r12 ADVICE)
    pts_span: dict[int, list[int]] = {}
    video_pid = None
    video_es = bytearray()
    n_packets = 0
    pos = first_off
    while pos + 188 <= len(content) and n_packets < MAX_PACKETS:
        if content[pos] != SYNC:
            # resync on the next stride boundary that carries sync
            pos += stride
            continue
        n_packets += 1
        pkt = content[pos : pos + 188]
        pos += stride
        pusi = (pkt[1] >> 6) & 1
        pid = ((pkt[1] & 0x1F) << 8) | pkt[2]
        afc = (pkt[3] >> 4) & 0x3
        body = 4
        if afc & 0x2:  # adaptation field
            af_len = pkt[4]
            if af_len > 183:
                continue  # corrupt adaptation length: skip packet
            if af_len >= 7 and pkt[5] & 0x10:  # PCR flag
                b = pkt[6:12]
                base = (b[0] << 25) | (b[1] << 17) | (b[2] << 9) \
                    | (b[3] << 1) | (b[4] >> 7)
                span = pcr_span.setdefault(pid, [base, base])
                span[1] = base
            body = 5 + af_len
        if not afc & 0x1:
            continue  # no payload
        payload = pkt[body:]
        if pid == 0 and pusi:
            try:
                pmt_pids.update(_parse_pat(_psi_section(payload)).values())
            except ValueError:
                pass
        elif pid in pmt_pids and pusi and not streams:
            try:
                pcr_pid, streams = _parse_pmt(_psi_section(payload))
                for stype, epid in streams:
                    if stype in _VIDEO_TYPES and video_pid is None:
                        video_pid = epid
            except ValueError:
                pass
        else:
            if pusi:
                pts = _pes_pts(payload)
                if pts is not None:
                    span = pts_span.setdefault(pid, [pts, pts])
                    span[1] = pts
            if pid == video_pid and len(video_es) < 262144:
                if pusi and payload[:3] == b"\x00\x00\x01" and len(payload) > 8:
                    hdr = 9 + payload[8]  # PES header_data_length
                    video_es += payload[hdr:]
                elif video_es:
                    video_es += payload
    if n_packets == 0:
        raise ValueError("no TS packets")
    video_codec = audio_codec = None
    for stype, _epid in streams:
        name = STREAM_TYPES.get(stype, f"type-0x{stype:02x}")
        if stype in _VIDEO_TYPES and video_codec is None:
            video_codec = name
        elif stype in _AUDIO_TYPES and audio_codec is None:
            audio_codec = name
    duration = None
    # one program clock only: the PMT-named PCR PID, or the single PID
    # that carried PCRs; several PCR PIDs with no PMT → PTS fallback
    span = pcr_span.get(pcr_pid) if pcr_pid is not None else (
        next(iter(pcr_span.values())) if len(pcr_span) == 1 else None
    )
    if span is not None and span[1] > span[0]:
        duration = (span[1] - span[0]) / 90_000.0
    else:
        # single-stream PTS fallback: the detected video PID's span,
        # else the only PID that carried PTS, else the first PMT-listed
        # elementary PID with a span — never a cross-PID mix
        pspan = pts_span.get(video_pid)
        if pspan is None and len(pts_span) == 1:
            pspan = next(iter(pts_span.values()))
        if pspan is None:
            pspan = next(
                (pts_span[epid] for _st, epid in streams
                 if epid in pts_span), None
            )
        if pspan is not None and pspan[1] > pspan[0]:
            duration = (pspan[1] - pspan[0]) / 90_000.0
    stream_info: dict = {}
    if video_codec in ("h264", "hevc") and video_es:
        from sample_dms_kinesis_rds_mariadb_spark.operators.video_codecs import (
            annexb_metadata,
        )

        try:
            stream_info = annexb_metadata(bytes(video_es))
        except ValueError:
            stream_info = {}
    return {
        "container": "mpegts",
        "stride": stride,
        "n_packets": n_packets,
        "programs": sorted(pmt_pids),
        "video_codec": video_codec,
        "audio_codec": audio_codec,
        "duration_sec": duration,
        "width": stream_info.get("width"),
        "height": stream_info.get("height"),
        "stream": stream_info,
    }
