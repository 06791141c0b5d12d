"""MPEG-TS metadata walk vs an INDEPENDENT ISO 13818-1 serializer:
its own packetizer, PSI section builder (real CRC32/MPEG), PES header
and PCR encoding — no code shared with the reader under test."""

from __future__ import annotations

import pytest

from sample_dms_kinesis_rds_mariadb_spark.operators.mpegts import (
    detect_stride,
    is_mpegts,
    ts_metadata,
)
from tests.video_writer import h264_sps, hevc_sps


# --------------------------------------------------------------------------
# independent writer
# --------------------------------------------------------------------------


def _crc32_mpeg(data: bytes) -> int:
    """CRC-32/MPEG-2 (poly 0x04C11DB7, init 0xFFFFFFFF, no reflection)."""
    crc = 0xFFFFFFFF
    for byte in data:
        crc ^= byte << 24
        for _ in range(8):
            crc = ((crc << 1) ^ 0x04C11DB7 if crc & 0x80000000 else crc << 1) \
                & 0xFFFFFFFF
    return crc


class TsWriter:
    def __init__(self, stride: int = 188):
        self.stride = stride
        self.out = bytearray()
        self.cc: dict[int, int] = {}

    def _packet(self, pid: int, payload: bytes, pusi: bool,
                pcr: int | None = None) -> bytes:
        cc = self.cc.get(pid, 0)
        self.cc[pid] = (cc + 1) & 0xF
        if pcr is not None:
            # flags byte (PCR flag) + 6 PCR bytes (33-bit base, 6
            # reserved, 9-bit extension)
            af_body = bytes([
                0x10,
                (pcr >> 25) & 0xFF, (pcr >> 17) & 0xFF, (pcr >> 9) & 0xFF,
                (pcr >> 1) & 0xFF, ((pcr & 1) << 7) | 0x7E, 0x00,
            ])
        else:
            af_body = b""
        need_af = bool(af_body) or len(payload) < 184
        if need_af:
            if not af_body:
                af_body = b"\x00"  # flags byte, nothing set
            room = 184 - 1 - len(af_body)
            body = payload[:room]
            stuffing = room - len(body)
            af = (bytes([len(af_body) + stuffing]) + af_body
                  + b"\xff" * stuffing)
            ctrl = 0x30
        else:
            body = payload[:184]
            af = b""
            ctrl = 0x10
        pkt = bytes([0x47, (0x40 if pusi else 0) | (pid >> 8),
                     pid & 0xFF, ctrl | cc]) + af + body
        assert len(pkt) == 188, len(pkt)
        if self.stride == 192:
            pkt = b"\x00\x00\x00\x00" + pkt
        elif self.stride == 204:
            pkt = pkt + b"\x00" * 16
        self.out += pkt
        return payload[len(body):]

    def send(self, pid: int, payload: bytes, pcr: int | None = None) -> None:
        rest = self._packet(pid, payload, pusi=True, pcr=pcr)
        while rest:
            rest = self._packet(pid, rest, pusi=False)

    def _section(self, table_id: int, body: bytes) -> bytes:
        length = len(body) + 4  # + CRC32
        sec = bytes([table_id, 0xB0 | (length >> 8), length & 0xFF]) + body
        return sec + _crc32_mpeg(sec).to_bytes(4, "big")

    def pat(self, program: int, pmt_pid: int) -> None:
        body = b"\x00\x01\xc1\x00\x00"  # tsid, version/current, sec#s
        body += bytes([program >> 8, program & 0xFF,
                       0xE0 | (pmt_pid >> 8), pmt_pid & 0xFF])
        self.send(0, b"\x00" + self._section(0x00, body))

    def pmt(self, pmt_pid: int, pcr_pid: int,
            streams: list[tuple[int, int]]) -> None:
        body = b"\x00\x01\xc1\x00\x00"
        body += bytes([0xE0 | (pcr_pid >> 8), pcr_pid & 0xFF, 0xF0, 0x00])
        for stype, epid in streams:
            body += bytes([stype, 0xE0 | (epid >> 8), epid & 0xFF,
                           0xF0, 0x00])
        self.send(pmt_pid, b"\x00" + self._section(0x02, body))

    def pes(self, pid: int, stream_id: int, pts: int, es: bytes,
            pcr: int | None = None) -> None:
        pts_bytes = bytes([
            0x20 | ((pts >> 29) & 0x0E) | 1,
            (pts >> 22) & 0xFF, ((pts >> 14) & 0xFE) | 1,
            (pts >> 7) & 0xFF, ((pts << 1) & 0xFE) | 1,
        ])
        opt = bytes([0x80, 0x80, len(pts_bytes)]) + pts_bytes
        length = len(opt) + len(es)
        header = (b"\x00\x00\x01" + bytes([stream_id])
                  + bytes([min(length, 0xFFFF) >> 8,
                           min(length, 0xFFFF) & 0xFF]))
        self.send(pid, header + opt + es, pcr=pcr)


def make_ts(stride=188, video="h264", with_pcr=True, seconds=6.0) -> bytes:
    w = TsWriter(stride)
    w.pat(1, 0x100)
    vtype = 0x1B if video == "h264" else 0x24
    w.pmt(0x100, 0x101, [(vtype, 0x101), (0x0F, 0x102)])
    sps = (h264_sps(profile=100, level=40, width_mbs=80, height_units=45)
           if video == "h264" else hevc_sps(width=1280, height=720))
    es = b"\x00\x00\x00\x01" + sps + b"\x00\x00\x01" + b"\x65" + b"\x00" * 300
    base_pcr = 900_000
    for i in range(8):
        pts = base_pcr + int(i * seconds / 7 * 90_000)
        w.pes(0x101, 0xE0, pts, es,
              pcr=pts if with_pcr else None)
        w.pes(0x102, 0xC0, pts, b"\xff\xf1" + b"\x00" * 60)
    return bytes(w.out)


# --------------------------------------------------------------------------
# tests
# --------------------------------------------------------------------------


@pytest.mark.parametrize("stride", [188, 192, 204])
def test_stride_detection(stride):
    blob = make_ts(stride=stride)
    got_stride, off = detect_stride(blob)
    assert got_stride == stride
    assert off == (4 if stride == 192 else 0)
    assert is_mpegts(blob)


def test_h264_segment_metadata():
    m = ts_metadata(make_ts())
    assert m["container"] == "mpegts"
    assert m["video_codec"] == "h264" and m["audio_codec"] == "aac"
    assert (m["width"], m["height"]) == (1280, 720)
    assert m["stream"]["profile"] == "high" and m["stream"]["level"] == "4"
    assert m["duration_sec"] == pytest.approx(6.0, rel=0.01)
    assert m["programs"] == [0x100]


def test_hevc_segment_metadata():
    m = ts_metadata(make_ts(video="hevc"))
    assert m["video_codec"] == "hevc"
    assert (m["width"], m["height"]) == (1280, 720)


def test_pts_fallback_when_no_pcr():
    m = ts_metadata(make_ts(with_pcr=False, seconds=4.0))
    assert m["duration_sec"] == pytest.approx(4.0, rel=0.01)


def test_not_a_ts_raises():
    with pytest.raises(ValueError):
        detect_stride(b"GET / HTTP/1.1\r\nHost: example.com\r\n" * 30)
    assert not is_mpegts(b"G" + b"\x00" * 400)


def test_corrupt_packet_resync():
    blob = bytearray(make_ts())
    # clobber one mid-stream packet's sync byte: the walk must skip it
    # and keep the stream's metadata intact
    blob[188 * 6] = 0x00
    m = ts_metadata(bytes(blob))
    assert m["container"] == "mpegts" and m["video_codec"] == "h264"


def test_media_sweep_dispatches_mpegts(spark):
    from sample_dms_kinesis_rds_mariadb_spark.operators.multimodal import (
        extract_media_metadata,
        media_container_metadata,
    )

    m = media_container_metadata(make_ts())
    assert m["container"] == "mpegts"
    assert m["video_profile"] == "h264 high@4 8bit 4:2:0"
    df = spark.createDataFrame(
        [(1, bytearray(make_ts())), (2, bytearray(b"plain text " * 40))],
        "media_id long, content binary",
    )
    rows = {r["media_id"]: r for r in extract_media_metadata(df).collect()}
    assert rows[1]["container"] == "mpegts"
    assert rows[1]["width"] == 1280
    assert rows[2]["container"] == "unknown"


def test_multi_program_pcr_clocks_not_mixed():
    """Review fix: a PCR seen on another program's PID before the PMT
    names the real PCR PID must not seed the duration span."""
    w = TsWriter()
    # program 2's clock ticks FIRST, huge offset
    w.pes(0x201, 0xE0, 5_000_000, b"\x00" * 40, pcr=5_000_000)
    w.pat(1, 0x100)
    w.pmt(0x100, 0x101, [(0x1B, 0x101)])
    for i in range(4):
        w.pes(0x101, 0xE0, 900_000 + i * 90_000, b"\x00" * 40,
              pcr=900_000 + i * 90_000)
    m = ts_metadata(bytes(w.out))
    # the named PCR PID's own span: 3 s — never (900k..5M)/90k
    assert m["duration_sec"] == pytest.approx(3.0)


def test_pts_fallback_per_pid_not_mixed():
    """r12 ADVICE: in a no-PCR mux the PTS duration fallback must come
    from a single elementary stream (the video PID), never a cross-PID
    mix of unrelated timelines."""
    w = TsWriter()
    w.pat(1, 0x100)
    w.pmt(0x100, 0x101, [(0x1B, 0x101), (0x0F, 0x102)])
    for i in range(4):
        # video spans 2 s; audio sits on a timeline 550 s away
        w.pes(0x101, 0xE0, 900_000 + i * 60_000, b"\x00" * 40)
        w.pes(0x102, 0xC0, 50_000_000 + i * 15_000, b"\xff\xf1" + b"\x00" * 40)
    m = ts_metadata(bytes(w.out))
    assert m["duration_sec"] == pytest.approx(2.0)


def test_pts_fallback_ambiguous_pids_yield_no_duration():
    """No PMT, no PCR, two PIDs on unrelated timelines: refusing a
    duration beats inventing one from a cross-PID span."""
    w = TsWriter()
    for i in range(3):
        w.pes(0x201, 0xE0, 1_000_000 + i * 90_000, b"\x00" * 40)
        w.pes(0x202, 0xC0, 99_000_000 + i * 90_000, b"\x00" * 40)
    m = ts_metadata(bytes(w.out))
    assert m["duration_sec"] is None
