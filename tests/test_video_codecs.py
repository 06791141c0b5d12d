"""Video codec bitstream metadata: H.264/HEVC SPS, VP9, AV1, the
ISOBMFF config records, IVF, Annex B — parsed values must match the
INDEPENDENT spec-derived writers in tests/video_writer.py field for
field, and malformed input must raise, never guess."""

from __future__ import annotations

import struct

import pytest

from sample_dms_kinesis_rds_mariadb_spark.operators.video_codecs import (
    annexb_metadata,
    av1_obus,
    ivf_metadata,
    parse_av1_sequence_header,
    parse_av1c,
    parse_avcc,
    parse_h264_sps,
    parse_hevc_sps,
    parse_hvcc,
    parse_vp9_keyframe,
    parse_vpcc,
    profile_string,
)
from tests.video_writer import (
    av1_sequence_header,
    av1c,
    avcc,
    h264_sps,
    hevc_sps,
    hvcc,
    ivf,
    obu,
    vp9_keyframe,
    vpcc,
)


# --------------------------------------------------------------------------
# H.264
# --------------------------------------------------------------------------


def test_h264_baseline_640x480():
    info = parse_h264_sps(h264_sps(profile=66, level=30, width_mbs=40, height_units=30))
    assert info == {
        "codec": "h264", "profile": "baseline", "level": "3",
        "width": 640, "height": 480, "bit_depth": 8, "chroma": "4:2:0",
        "interlaced": False,
    }


def test_h264_high_1080p_crop():
    # 1920x1088 coded, bottom-cropped to 1080: CropUnitY = 2 (4:2:0,
    # frame_mbs_only) so crop_bottom = 4
    sps = h264_sps(profile=100, level=40, width_mbs=120, height_units=68,
                   crop=(0, 0, 0, 4))
    info = parse_h264_sps(sps)
    assert (info["width"], info["height"]) == (1920, 1080)
    assert info["profile"] == "high" and info["level"] == "4"


def test_h264_high10_422_crop_units():
    # 4:2:2 -> CropUnitX = 2, CropUnitY = 1: crop left+right 2+2 takes
    # 8 luma columns; top+bottom 3+1 takes 4 rows
    sps = h264_sps(profile=110, level=51, width_mbs=8, height_units=8,
                   chroma_format_idc=2, bit_depth=10, crop=(2, 2, 3, 1))
    info = parse_h264_sps(sps)
    assert (info["width"], info["height"]) == (128 - 8, 128 - 4)
    assert info["bit_depth"] == 10 and info["chroma"] == "4:2:2"
    assert info["profile"] == "high10" and info["level"] == "5.1"


def test_h264_interlaced_doubles_height():
    info = parse_h264_sps(h264_sps(width_mbs=45, height_units=18, frame_mbs_only=0))
    assert (info["width"], info["height"]) == (720, 576)
    assert info["interlaced"] is True


def test_h264_scaling_lists_and_poc1_are_skipped_correctly():
    sps = h264_sps(profile=100, width_mbs=80, height_units=45,
                   scaling_lists=True, poc_type=1)
    info = parse_h264_sps(sps)
    assert (info["width"], info["height"]) == (1280, 720)


def test_h264_emulation_prevention_roundtrip():
    # constraint byte 00 + level_idc 00 + ue(63) sps_id makes the RBSP
    # open with 64 00 00 02: the writer must insert the 03 byte, the
    # parser must strip it
    kw = dict(profile=100, level=0, sps_id=63, width_mbs=120, height_units=68)
    plain = h264_sps(epb=False, **kw)
    guarded = h264_sps(epb=True, **kw)
    assert b"\x00\x00\x02" in plain
    assert b"\x00\x00\x03\x02" in guarded and guarded != plain
    info = parse_h264_sps(guarded)
    assert (info["width"], info["height"]) == (1920, 1088)


def test_h264_malformed_raises():
    good = h264_sps()
    with pytest.raises(ValueError):
        parse_h264_sps(b"")
    with pytest.raises(ValueError):
        parse_h264_sps(bytes([0x80]) + good[1:])  # forbidden bit
    with pytest.raises(ValueError):
        parse_h264_sps(bytes([0x61]) + good[1:])  # slice NAL, not SPS
    with pytest.raises(ValueError):
        parse_h264_sps(good[:6])  # truncated
    with pytest.raises(ValueError):
        # crop that consumes the whole frame
        parse_h264_sps(h264_sps(width_mbs=2, height_units=2, crop=(16, 16, 0, 0)))


def test_avcc_record():
    info = parse_avcc(avcc(h264_sps(profile=100, level=41, width_mbs=120,
                                    height_units=68, crop=(0, 0, 0, 4))))
    assert (info["width"], info["height"]) == (1920, 1080)
    assert info["level"] == "4.1"
    with pytest.raises(ValueError):
        parse_avcc(b"\x02\x64\x00\x28\xff\xe1")  # bad version
    with pytest.raises(ValueError):
        parse_avcc(bytes([1, 100, 0, 40, 0xFF, 0xE0]))  # zero SPS


# --------------------------------------------------------------------------
# HEVC
# --------------------------------------------------------------------------


def test_hevc_main_1080p():
    info = parse_hevc_sps(hevc_sps(profile=1, level=120, width=1920, height=1080))
    assert info == {
        "codec": "hevc", "profile": "main", "level": "4",
        "width": 1920, "height": 1080, "bit_depth": 8, "chroma": "4:2:0",
        "interlaced": False,
    }


def test_hevc_main10_conformance_window():
    # 4:2:0 -> window offsets are in 2-sample chroma units
    info = parse_hevc_sps(hevc_sps(profile=2, level=153, width=3840,
                                   height=2176, bit_depth=10,
                                   conf_window=(0, 0, 0, 8)))
    assert (info["width"], info["height"]) == (3840, 2160)
    assert info["profile"] == "main10" and info["level"] == "5.1"
    assert info["bit_depth"] == 10


def test_hevc_sub_layer_ptl_is_skipped():
    info = parse_hevc_sps(hevc_sps(width=1280, height=720, sub_layers=2))
    assert (info["width"], info["height"]) == (1280, 720)


def test_hevc_malformed_raises():
    good = hevc_sps()
    with pytest.raises(ValueError):
        parse_hevc_sps(good[:5])
    with pytest.raises(ValueError):
        parse_hevc_sps(bytes([32 << 1, 1]) + good[2:])  # VPS, not SPS


def test_hvcc_record():
    info = parse_hvcc(hvcc(hevc_sps(profile=1, width=1920, height=1080)))
    assert (info["width"], info["height"]) == (1920, 1080)
    with pytest.raises(ValueError):
        parse_hvcc(b"\x00" * 23)


# --------------------------------------------------------------------------
# Annex B
# --------------------------------------------------------------------------


def test_annexb_h264_finds_sps_after_other_nals():
    aud = b"\x09\xf0"
    stream = (b"\x00\x00\x00\x01" + aud
              + b"\x00\x00\x01" + h264_sps(profile=100, width_mbs=80, height_units=45)
              + b"\x00\x00\x00\x01" + b"\x68\xce\x38\x80")
    info = annexb_metadata(stream)
    assert info["codec"] == "h264"
    assert (info["width"], info["height"]) == (1280, 720)


def test_annexb_hevc_stream():
    stream = (b"\x00\x00\x00\x01" + bytes([32 << 1, 1, 0x0C])
              + b"\x00\x00\x01" + hevc_sps(width=640, height=360))
    info = annexb_metadata(stream)
    assert info["codec"] == "hevc"
    assert (info["width"], info["height"]) == (640, 360)


def test_annexb_no_start_code_raises():
    with pytest.raises(ValueError):
        annexb_metadata(b"\x01\x02\x03\x04" * 8)


# --------------------------------------------------------------------------
# VP9
# --------------------------------------------------------------------------


def test_vp9_profile0():
    info = parse_vp9_keyframe(vp9_keyframe(profile=0, width=1280, height=720))
    assert info["codec"] == "vp9" and info["profile"] == "profile0"
    assert (info["width"], info["height"]) == (1280, 720)
    assert info["bit_depth"] == 8 and info["chroma"] == "4:2:0"


def test_vp9_profile2_12bit():
    info = parse_vp9_keyframe(vp9_keyframe(profile=2, width=3840, height=2160,
                                           bit_depth=12))
    assert info["bit_depth"] == 12
    assert (info["width"], info["height"]) == (3840, 2160)


def test_vp9_srgb_is_444():
    info = parse_vp9_keyframe(vp9_keyframe(profile=1, width=64, height=64,
                                           color_space=7))
    assert info["chroma"] == "4:4:4"


def test_vp9_non_keyframe_raises():
    frame = bytearray(vp9_keyframe())
    # flip frame_type: bit 6 of the header for profile 0 (marker 2 +
    # profile 2 + show_existing 1 bits consumed, then frame_type)
    with pytest.raises(ValueError):
        parse_vp9_keyframe(bytes([0b10_0_0_0_1_1_0]) + bytes(frame[1:]))
    with pytest.raises(ValueError):
        parse_vp9_keyframe(b"\xff\xff\xff")  # bad marker


def test_vpcc_record():
    info = parse_vpcc(vpcc(profile=2, level=41, bit_depth=10))
    assert info["profile"] == "profile2" and info["level"] == "4.1"
    assert info["bit_depth"] == 10
    with pytest.raises(ValueError):
        parse_vpcc(b"\x00\x00")


# --------------------------------------------------------------------------
# AV1
# --------------------------------------------------------------------------


def test_av1_reduced_still_picture_header():
    payload = av1_sequence_header(profile=0, level_idx=8, width=1920,
                                  height=1080, reduced=True)
    info = parse_av1_sequence_header(payload)
    assert info["profile"] == "main" and info["level"] == "4.0"
    assert (info["width"], info["height"]) == (1920, 1080)
    assert info["chroma"] == "4:2:0"


def test_av1_full_header_with_timing_and_decoder_model():
    payload = av1_sequence_header(profile=2, level_idx=13, width=7680,
                                  height=4320, bit_depth=12, timing_info=True)
    info = parse_av1_sequence_header(payload)
    assert info["profile"] == "professional" and info["level"] == "5.1"
    assert (info["width"], info["height"]) == (7680, 4320)
    assert info["bit_depth"] == 12 and info["chroma"] == "4:2:0"


def test_av1_high_profile_is_444():
    info = parse_av1_sequence_header(
        av1_sequence_header(profile=1, level_idx=5, width=512, height=512)
    )
    assert info["profile"] == "high" and info["chroma"] == "4:4:4"
    assert info["level"] == "3.1"


def test_av1c_with_and_without_config_obus():
    seq = obu(1, av1_sequence_header(width=1280, height=720))
    info = parse_av1c(av1c(seq))
    assert (info["width"], info["height"]) == (1280, 720)
    bare = parse_av1c(av1c(None, profile=0, level_idx=12))
    assert bare["width"] is None and bare["level"] == "5.0"
    with pytest.raises(ValueError):
        parse_av1c(b"\x01\x00\x00\x00")  # bad marker


def test_av1_obu_walk_rejects_garbage():
    with pytest.raises(ValueError):
        list(av1_obus(b"\x80\x01\x02"))  # forbidden bit
    with pytest.raises(ValueError):
        list(av1_obus(obu(1, b"x" * 10)[:-5]))  # truncated payload


# --------------------------------------------------------------------------
# IVF
# --------------------------------------------------------------------------


def test_ivf_vp9_stream():
    frames = [vp9_keyframe(profile=0, width=320, height=180)] + [b"\x00" * 12] * 29
    blob = ivf(b"VP90", 320, 180, 30, 1, frames)
    m = ivf_metadata(blob)
    assert m["codec"] == "vp9" and m["n_frames"] == 30
    assert (m["width"], m["height"]) == (320, 180)
    assert m["duration_sec"] == pytest.approx(1.0)
    assert m["stream"]["profile"] == "profile0"


def test_ivf_av1_stream_and_header_fallback():
    seq = obu(1, av1_sequence_header(width=640, height=360)) + obu(6, b"\x00" * 4)
    blob = ivf(b"AV01", 640, 360, 24, 1, [seq, b"\x01" * 5])
    m = ivf_metadata(blob)
    assert m["codec"] == "av1" and m["stream"]["profile"] == "main"
    # unknown codec falls back to header dims, no stream info
    m2 = ivf_metadata(ivf(b"VP80", 176, 144, 15, 1, [b"\x00" * 10]))
    assert m2["codec"] == "vp8" and (m2["width"], m2["height"]) == (176, 144)
    assert m2["stream"] == {}


def test_ivf_malformed_raises():
    with pytest.raises(ValueError):
        ivf_metadata(b"DKIF" + b"\x00" * 10)
    good = ivf(b"VP90", 64, 64, 30, 1, [b"\x00" * 8])
    with pytest.raises(ValueError):
        ivf_metadata(good[:-4])  # truncated frame


# --------------------------------------------------------------------------
# profile_string + container integration
# --------------------------------------------------------------------------


def test_profile_string_formatting():
    info = parse_h264_sps(h264_sps(profile=100, level=40, width_mbs=120,
                                   height_units=68, crop=(0, 0, 0, 4)))
    assert profile_string(info) == "h264 high@4 8bit 4:2:0"
    assert profile_string(parse_vpcc(vpcc(profile=0, level=0))) == (
        "vp9 profile0 8bit 4:2:0"
    )


def test_mp4_sample_entry_carries_decoder_config():
    from sample_dms_kinesis_rds_mariadb_spark.operators.mp4 import mp4_metadata
    from tests.test_media_containers import box, full, mvhd

    cfg = box(b"avcC", avcc(h264_sps(profile=100, level=41, width_mbs=120,
                                     height_units=68, crop=(0, 0, 0, 4))))
    entry = box(b"avc1", b"\x00" * 24 + struct.pack(">HH", 1920, 1080)
                + b"\x00" * 50 + cfg)
    stsd = box(b"stsd", full(0, struct.pack(">I", 1) + entry))
    mdhd = box(b"mdhd", full(0, struct.pack(">IIII", 0, 0, 30000, 90000)
                             + b"\x00" * 4))
    hdlr = box(b"hdlr", full(0, b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"v\x00"))
    trak = box(b"trak", box(b"mdia", mdhd + hdlr
                            + box(b"minf", box(b"stbl", stsd))))
    blob = (box(b"ftyp", b"isom" + b"\x00" * 12)
            + box(b"moov", mvhd(600, 1200) + trak))
    m = mp4_metadata(blob)
    assert m["video_codec"] == "avc1"
    assert m["video_profile"] == "h264 high@4.1 8bit 4:2:0"
    assert (m["width"], m["height"]) == (1920, 1080)


def test_mkv_codec_private_profiles():
    from sample_dms_kinesis_rds_mariadb_spark.operators.mkv import mkv_metadata
    from tests.test_media_containers import _ebml_elem, _ebml_uint

    def blob(codec_id: bytes, private: bytes) -> bytes:
        header = _ebml_elem(0x1A45DFA3, _ebml_elem(0x4282, b"matroska"))
        track = _ebml_elem(
            0xAE,
            _ebml_uint(0x83, 1)
            + _ebml_elem(0x86, codec_id)
            + _ebml_elem(0x63A2, private)
            + _ebml_elem(0xE0, _ebml_uint(0xB0, 1920) + _ebml_uint(0xBA, 1080)),
        )
        seg = _ebml_elem(0x18538067, _ebml_elem(0x1654AE6B, track))
        return header + seg

    m = mkv_metadata(blob(b"V_MPEG4/ISO/AVC",
                          avcc(h264_sps(profile=77, level=31, width_mbs=45,
                                        height_units=36))))
    assert m["video_profile"] == "h264 main@3.1 8bit 4:2:0"
    m = mkv_metadata(blob(b"V_MPEGH/ISO/HEVC",
                          hvcc(hevc_sps(profile=2, bit_depth=10))))
    assert m["video_profile"] == "hevc main10@4 10bit 4:2:0"
    # VP9 codec feature metadata: (id, len, value) triples
    m = mkv_metadata(blob(b"V_VP9", bytes([1, 1, 2, 2, 1, 41, 3, 1, 10])))
    assert m["video_profile"] == "vp9 profile2@4.1 10bit"
    m = mkv_metadata(blob(b"V_AV1", av1c(obu(1, av1_sequence_header()))))
    assert m["video_profile"].startswith("av1 main@4.0")
    # garbage private degrades to None, never a throw
    m = mkv_metadata(blob(b"V_MPEG4/ISO/AVC", b"\xde\xad"))
    assert m["video_profile"] is None and m["width"] == 1920


def test_media_metadata_sweep_video_streams(spark):
    from sample_dms_kinesis_rds_mariadb_spark.operators.multimodal import (
        extract_media_metadata,
        media_container_metadata,
    )

    ivf_blob = ivf(b"VP90", 320, 180, 30, 1,
                   [vp9_keyframe(profile=0, width=320, height=180)])
    es_blob = (b"\x00\x00\x00\x01"
               + h264_sps(profile=100, width_mbs=80, height_units=45))
    hevc_blob = b"\x00\x00\x01" + hevc_sps(width=640, height=360)
    m = media_container_metadata(ivf_blob)
    assert m["container"] == "ivf" and m["video_codec"] == "vp9"
    assert m["video_profile"] == "vp9 profile0 8bit 4:2:0"
    m = media_container_metadata(es_blob)
    assert m["container"] == "h264" and m["width"] == 1280
    m = media_container_metadata(hevc_blob)
    assert m["container"] == "hevc" and m["width"] == 640

    df = spark.createDataFrame(
        [(1, bytearray(ivf_blob)), (2, bytearray(es_blob)),
         (3, bytearray(hevc_blob)), (4, bytearray(b"\x00\x00\x01garbage"))],  # 'g'=0x67 parses as SPS but fails the plausibility gate (profile 97)
        "media_id long, content binary",
    )
    rows = {r["media_id"]: r for r in extract_media_metadata(df).collect()}
    assert rows[1]["container"] == "ivf"
    assert rows[2]["video_profile"] == "h264 high@3 8bit 4:2:0"
    assert rows[3]["container"] == "hevc"
    assert rows[4]["container"] == "unknown"  # start code but no SPS
