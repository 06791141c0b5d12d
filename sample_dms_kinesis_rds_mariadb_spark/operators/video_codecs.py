"""Video codec bitstream metadata — H.264/AVC SPS, H.265/HEVC SPS,
VP9 uncompressed frame header, AV1 sequence-header OBU — parsed from
the public bitstream specs (ITU-T H.264 7.3.2.1 / H.265 7.3.2.2, the
VP9 Bitstream & Decoding Process Specification 6.2, the AV1 Bitstream
& Decoding Process 5.5), plus the ISO-BMFF decoder-configuration boxes
that carry them (avcC / hvcC / vpcC / av1C, ISO 14496-15 and the
public VP9/AV1 ISOBMFF bindings) and the raw elementary-stream
containers (Annex B start-code streams, the IVF framing used for raw
VP9/AV1).

Why it exists: the container walks (MP4/Matroska/AVI) report the
codec *fourcc* and the container's idea of the display size, but a
crawl-scale curation pipeline needs the stream-level truth — profile,
level, bit depth, chroma format, and the CODED dimensions — to route,
cap, and dedup video by what a decoder would actually have to do.
Sample decode of these codecs remains the documented boundary
(``operators/avi.py``, ``operators/mp4.py``); the parameter sets are
fully public exp-Golomb/bit syntax with no codebooks, so the metadata
surface is implemented for real.

Failure posture matches the other media modules: malformed or
truncated parameter sets raise ``ValueError`` (never a
wrong-but-plausible geometry); unknown profiles degrade to the numeric
id, never a guess. Callers inside the metadata sweep catch and null
the fields.

At scale: a few hundred BITS of header per payload, parsed once per
row inside the same Arrow ``mapInPandas`` sweep as the container
walks — O(parameter set), not O(payload).
"""

from __future__ import annotations

import struct


class _Bits:
    """MSB-first bit reader with the exp-Golomb reads the H.26x and AV1
    syntaxes share (AV1 calls ue(v) "uvlc"). Raises ValueError past the
    end — a truncated parameter set must never yield a plausible value."""

    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.nbits = 8 * len(data)

    def u(self, n: int) -> int:
        if self.pos + n > self.nbits:
            raise ValueError("truncated bitstream")
        v = 0
        p = self.pos
        for _ in range(n):
            v = (v << 1) | ((self.data[p >> 3] >> (7 - (p & 7))) & 1)
            p += 1
        self.pos = p
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 32:
                raise ValueError("exp-Golomb run too long")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)


def _rbsp(nal_body: bytes) -> bytes:
    """Strip emulation-prevention bytes (00 00 03 -> 00 00) from an
    H.26x NAL unit body (spec 7.4.1/7.4.2)."""
    out = bytearray()
    i, n = 0, len(nal_body)
    while i < n:
        if i + 2 < n and nal_body[i] == 0 and nal_body[i + 1] == 0 and nal_body[i + 2] == 3:
            out += b"\x00\x00"
            i += 3
        else:
            out.append(nal_body[i])
            i += 1
    return bytes(out)


# --------------------------------------------------------------------------
# H.264 / AVC (ITU-T H.264 7.3.2.1 seq_parameter_set_data)
# --------------------------------------------------------------------------

_H264_PROFILES = {
    66: "baseline", 77: "main", 88: "extended", 100: "high",
    110: "high10", 122: "high422", 244: "high444", 44: "cavlc444",
    83: "scalable-baseline", 86: "scalable-high",
    118: "multiview-high", 128: "stereo-high",
}

# profiles whose SPS carries chroma_format_idc / bit depths / scaling
_H264_HIGH_SET = {100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135}

_H264_CHROMA = {0: "4:0:0", 1: "4:2:0", 2: "4:2:2", 3: "4:4:4"}
# (SubWidthC, SubHeightC) per chroma_format_idc (H.264 Table 6-1)
_SUBWH = {1: (2, 2), 2: (2, 1), 3: (1, 1)}


def _skip_h264_scaling_list(b: _Bits, size: int) -> None:
    last, nxt = 8, 8
    for _ in range(size):
        if nxt != 0:
            nxt = (last + b.se() + 256) % 256
        if nxt != 0:
            last = nxt


def parse_h264_sps(nal: bytes) -> dict:
    """Parse an AVC sequence parameter set. ``nal`` is the full NAL
    unit: a 1-byte header whose nal_unit_type must be 7 (and whose
    forbidden_zero_bit must be clear) followed by the SPS RBSP."""
    if not nal:
        raise ValueError("empty SPS")
    if nal[0] & 0x80:
        raise ValueError("forbidden_zero_bit set: not a NAL unit")
    if (nal[0] & 0x1F) != 7:
        raise ValueError(f"not an SPS NAL (type {nal[0] & 0x1F})")
    b = _Bits(_rbsp(nal[1:]))
    profile_idc = b.u(8)
    b.u(8)  # constraint_set flags + reserved
    level_idc = b.u(8)
    b.ue()  # seq_parameter_set_id
    chroma_format_idc = 1
    bit_depth = 8
    separate_colour = 0
    if profile_idc in _H264_HIGH_SET:
        chroma_format_idc = b.ue()
        if chroma_format_idc > 3:
            raise ValueError(f"chroma_format_idc {chroma_format_idc}")
        if chroma_format_idc == 3:
            separate_colour = b.u(1)
        bit_depth = 8 + b.ue()  # bit_depth_luma_minus8
        b.ue()  # bit_depth_chroma_minus8
        b.u(1)  # qpprime_y_zero_transform_bypass
        if b.u(1):  # seq_scaling_matrix_present
            for i in range(8 if chroma_format_idc != 3 else 12):
                if b.u(1):
                    _skip_h264_scaling_list(b, 16 if i < 6 else 64)
    b.ue()  # log2_max_frame_num_minus4
    poc_type = b.ue()
    if poc_type == 0:
        b.ue()
    elif poc_type == 1:
        b.u(1)
        b.se()
        b.se()
        for _ in range(b.ue()):
            b.se()
    b.ue()  # max_num_ref_frames
    b.u(1)  # gaps_in_frame_num_value_allowed
    pic_width_in_mbs = b.ue() + 1
    pic_height_in_map_units = b.ue() + 1
    frame_mbs_only = b.u(1)
    if not frame_mbs_only:
        b.u(1)  # mb_adaptive_frame_field
    b.u(1)  # direct_8x8_inference
    width = pic_width_in_mbs * 16
    height = (2 - frame_mbs_only) * pic_height_in_map_units * 16
    if b.u(1):  # frame_cropping
        left, right, top, bottom = b.ue(), b.ue(), b.ue(), b.ue()
        if chroma_format_idc == 0 or separate_colour:
            cw, ch = 1, 2 - frame_mbs_only
        else:
            sw, sh = _SUBWH[chroma_format_idc]
            cw, ch = sw, sh * (2 - frame_mbs_only)
        width -= (left + right) * cw
        height -= (top + bottom) * ch
    if width <= 0 or height <= 0:
        raise ValueError("SPS crop exceeds coded size")
    return {
        "codec": "h264",
        "profile": _H264_PROFILES.get(profile_idc, str(profile_idc)),
        "level": f"{level_idc / 10:g}",
        "width": width,
        "height": height,
        "bit_depth": bit_depth,
        "chroma": _H264_CHROMA[chroma_format_idc],
        "interlaced": frame_mbs_only == 0,
    }


def parse_avcc(body: bytes) -> dict:
    """AVCDecoderConfigurationRecord (ISO 14496-15 5.3.3.1): version,
    profile/level bytes, then the SPS list — the first SPS carries the
    stream geometry."""
    if len(body) < 7 or body[0] != 1:
        raise ValueError("not an avcC record")
    n_sps = body[5] & 0x1F
    pos = 6
    for _ in range(n_sps):
        if pos + 2 > len(body):
            raise ValueError("truncated avcC SPS list")
        ln = struct.unpack_from(">H", body, pos)[0]
        pos += 2
        sps = body[pos : pos + ln]
        if len(sps) != ln:
            raise ValueError("truncated avcC SPS")
        return parse_h264_sps(sps)
    raise ValueError("avcC carries no SPS")


# --------------------------------------------------------------------------
# H.265 / HEVC (ITU-T H.265 7.3.2.2 seq_parameter_set_rbsp)
# --------------------------------------------------------------------------

_HEVC_PROFILES = {1: "main", 2: "main10", 3: "mainstillpicture", 4: "rext"}


def _hevc_ptl(b: _Bits, max_sub_layers_minus1: int) -> tuple[int, int]:
    """profile_tier_level(1, sps_max_sub_layers_minus1): returns
    (general_profile_idc, general_level_idc)."""
    b.u(2)  # general_profile_space
    b.u(1)  # general_tier_flag
    profile_idc = b.u(5)
    b.u(32)  # general_profile_compatibility_flags
    b.u(48)  # progressive/interlaced/non-packed/frame-only + reserved43 + inbld
    level_idc = b.u(8)
    sub_profile = []
    sub_level = []
    for _ in range(max_sub_layers_minus1):
        sub_profile.append(b.u(1))
        sub_level.append(b.u(1))
    if max_sub_layers_minus1 > 0:
        for _ in range(max_sub_layers_minus1, 8):
            b.u(2)  # reserved_zero_2bits
    for i in range(max_sub_layers_minus1):
        if sub_profile[i]:
            b.u(2 + 1 + 5)
            b.u(32)
            b.u(48)
        if sub_level[i]:
            b.u(8)
    return profile_idc, level_idc


def parse_hevc_sps(nal: bytes) -> dict:
    """Parse an HEVC SPS NAL unit (2-byte NAL header, type 33)."""
    if len(nal) < 3:
        raise ValueError("truncated HEVC NAL")
    if nal[0] & 0x80:
        raise ValueError("forbidden_zero_bit set")
    if ((nal[0] >> 1) & 0x3F) != 33:
        raise ValueError(f"not an HEVC SPS (type {(nal[0] >> 1) & 0x3F})")
    b = _Bits(_rbsp(nal[2:]))
    b.u(4)  # sps_video_parameter_set_id
    max_sub_layers_minus1 = b.u(3)
    b.u(1)  # sps_temporal_id_nesting
    profile_idc, level_idc = _hevc_ptl(b, max_sub_layers_minus1)
    b.ue()  # sps_seq_parameter_set_id
    chroma_format_idc = b.ue()
    if chroma_format_idc > 3:
        raise ValueError(f"chroma_format_idc {chroma_format_idc}")
    separate_colour = b.u(1) if chroma_format_idc == 3 else 0
    width = b.ue()  # pic_width_in_luma_samples
    height = b.ue()
    if b.u(1):  # conformance_window_flag
        left, right, top, bottom = b.ue(), b.ue(), b.ue(), b.ue()
        if chroma_format_idc == 0 or separate_colour:
            sw, sh = 1, 1
        else:
            sw, sh = _SUBWH[chroma_format_idc]
        width -= (left + right) * sw
        height -= (top + bottom) * sh
    bit_depth = 8 + b.ue()  # bit_depth_luma_minus8
    if width <= 0 or height <= 0:
        raise ValueError("HEVC conformance window exceeds coded size")
    return {
        "codec": "hevc",
        "profile": _HEVC_PROFILES.get(profile_idc, str(profile_idc)),
        "level": f"{level_idc / 30:g}",
        "width": width,
        "height": height,
        "bit_depth": bit_depth,
        "chroma": _H264_CHROMA[chroma_format_idc],
        "interlaced": False,
    }


def parse_hvcc(body: bytes) -> dict:
    """HEVCDecoderConfigurationRecord (ISO 14496-15 8.3.3.1): 22 fixed
    bytes, then NAL arrays — find the SPS array (NAL type 33)."""
    if len(body) < 23 or body[0] != 1:
        raise ValueError("not an hvcC record")
    n_arrays = body[22]
    pos = 23
    for _ in range(n_arrays):
        if pos + 3 > len(body):
            raise ValueError("truncated hvcC arrays")
        nal_type = body[pos] & 0x3F
        n_nalus = struct.unpack_from(">H", body, pos + 1)[0]
        pos += 3
        for _ in range(n_nalus):
            if pos + 2 > len(body):
                raise ValueError("truncated hvcC NAL list")
            ln = struct.unpack_from(">H", body, pos)[0]
            pos += 2
            nal = body[pos : pos + ln]
            if len(nal) != ln:
                raise ValueError("truncated hvcC NAL")
            pos += ln
            if nal_type == 33:
                return parse_hevc_sps(nal)
    raise ValueError("hvcC carries no SPS")


# --------------------------------------------------------------------------
# Annex B elementary streams (H.264/H.265 start-code framing, Annex B)
# --------------------------------------------------------------------------


def annexb_nal_units(data: bytes, limit: int = 64):
    """Yield NAL unit byte ranges from a start-code-framed stream.
    Bounded: stops after ``limit`` NALs — the parameter sets a metadata
    pass needs sit at the front."""
    i = data.find(b"\x00\x00\x01")
    if i < 0:
        raise ValueError("no Annex B start code")
    count = 0
    while i >= 0 and count < limit:
        start = i + 3
        j = data.find(b"\x00\x00\x01", start)
        end = j if j >= 0 else len(data)
        # trailing zero of a 4-byte start code belongs to the next code
        body_end = end
        while body_end > start and data[body_end - 1] == 0:
            body_end -= 1
        if body_end > start:
            yield data[start:body_end]
            count += 1
        i = j


# Raw elementary streams carry no container-level corroboration, so a
# sniffed SPS must also look like one a conforming encoder would emit:
# a published profile id, a published level, and a codec-legal
# geometry. Arbitrary bytes behind a start code decode to *something*
# under exp-Golomb — without this gate that something would be a
# wrong-but-plausible row, the failure mode these modules refuse.
_H264_LEVELS = {9, 10, 11, 12, 13, 20, 21, 22, 30, 31, 32,
                40, 41, 42, 50, 51, 52, 60, 61, 62}


def _sniff_plausible(info: dict) -> bool:
    if not (16 <= (info["width"] or 0) <= 16384):
        return False
    if not (16 <= (info["height"] or 0) <= 16384):
        return False
    return not info["profile"].isdigit()  # unknown numeric profile id


def h264_annexb_metadata(data: bytes) -> dict:
    """Metadata for a raw H.264 Annex B elementary stream: the first
    plausible SPS in the stream."""
    for nal in annexb_nal_units(data):
        if (nal[0] & 0x1F) == 7 and not (nal[0] & 0x80):
            try:
                info = parse_h264_sps(nal)
            except ValueError:
                continue
            if _sniff_plausible(info) and round(float(info["level"]) * 10) in _H264_LEVELS:
                return info
    raise ValueError("no H.264 SPS in stream")


def hevc_annexb_metadata(data: bytes) -> dict:
    for nal in annexb_nal_units(data):
        if len(nal) >= 3 and not (nal[0] & 0x80) and ((nal[0] >> 1) & 0x3F) == 33:
            try:
                info = parse_hevc_sps(nal)
            except ValueError:
                continue
            level_idc = round(float(info["level"]) * 30)
            if _sniff_plausible(info) and level_idc % 3 == 0 and 30 <= level_idc <= 186:
                return info
    raise ValueError("no HEVC SPS in stream")


def annexb_metadata(data: bytes) -> dict:
    """Sniff an Annex B stream: H.264 and HEVC share the framing, so
    try the AVC SPS first (its parse self-validates via the type bits
    and geometry checks), then HEVC. Raises if neither carries a
    parameter set this walk recognizes."""
    try:
        return h264_annexb_metadata(data)
    except ValueError:
        return hevc_annexb_metadata(data)


# --------------------------------------------------------------------------
# VP9 (VP9 Bitstream & Decoding Process Specification 6.2 + vpcC)
# --------------------------------------------------------------------------

_VP9_SYNC = 0x498342


def parse_vp9_keyframe(data: bytes) -> dict:
    """Parse the uncompressed header of a VP9 KEY frame (the first
    frame of any raw stream). Non-key or show-existing frames raise —
    their headers carry no geometry."""
    b = _Bits(data)
    if b.u(2) != 2:
        raise ValueError("bad VP9 frame marker")
    profile = b.u(1) | (b.u(1) << 1)
    if profile == 3 and b.u(1):
        raise ValueError("reserved VP9 profile bit set")
    if b.u(1):  # show_existing_frame
        raise ValueError("show-existing frame: no header geometry")
    frame_type = b.u(1)
    b.u(1)  # show_frame
    b.u(1)  # error_resilient_mode
    if frame_type != 0:
        raise ValueError("not a VP9 keyframe")
    if b.u(24) != _VP9_SYNC:
        raise ValueError("bad VP9 sync code")
    bit_depth = 8
    if profile >= 2:
        bit_depth = 12 if b.u(1) else 10
    color_space = b.u(3)
    if color_space != 7:  # CS_RGB
        b.u(1)  # color_range
        if profile in (1, 3):
            sx, sy = b.u(1), b.u(1)
            b.u(1)  # reserved
        else:
            sx = sy = 1
    else:
        if profile in (1, 3):
            b.u(1)  # reserved
        sx = sy = 0
    width = b.u(16) + 1
    height = b.u(16) + 1
    chroma = {(1, 1): "4:2:0", (1, 0): "4:2:2", (0, 0): "4:4:4", (0, 1): "4:4:0"}[(sx, sy)]
    return {
        "codec": "vp9",
        "profile": f"profile{profile}",
        "level": None,
        "width": width,
        "height": height,
        "bit_depth": bit_depth,
        "chroma": chroma,
        "interlaced": False,
    }


def parse_vpcc(body: bytes) -> dict:
    """VPCodecConfigurationBox payload (vpcC, the public VP9 ISOBMFF
    binding): a FullBox — version/flags then profile, level,
    bitDepth/chroma/range packed byte."""
    if len(body) < 8:
        raise ValueError("truncated vpcC")
    if body[0] != 1:
        raise ValueError(f"vpcC version {body[0]}")
    profile, level = body[4], body[5]
    packed = body[6]
    bit_depth = packed >> 4
    chroma_idx = (packed >> 1) & 0x7
    chroma = {0: "4:2:0", 1: "4:2:0", 2: "4:2:2", 3: "4:4:4"}.get(chroma_idx)
    return {
        "codec": "vp9",
        "profile": f"profile{profile}",
        "level": f"{level / 10:g}" if level else None,
        "width": None,
        "height": None,
        "bit_depth": bit_depth,
        "chroma": chroma,
        "interlaced": False,
    }


# --------------------------------------------------------------------------
# AV1 (AV1 Bitstream & Decoding Process 5.5 sequence_header_obu + av1C)
# --------------------------------------------------------------------------

_AV1_PROFILES = {0: "main", 1: "high", 2: "professional"}


def _av1_level(idx: int) -> str | None:
    if idx == 31:  # LEVEL_MAX
        return None
    return f"{2 + (idx >> 2)}.{idx & 3}"


def _leb128(data: bytes, pos: int) -> tuple[int, int]:
    v = 0
    for i in range(8):
        if pos >= len(data):
            raise ValueError("truncated leb128")
        byte = data[pos]
        pos += 1
        v |= (byte & 0x7F) << (7 * i)
        if not byte & 0x80:
            return v, pos
    raise ValueError("leb128 too long")


def av1_obus(data: bytes, limit: int = 64):
    """Yield (obu_type, payload) from a length-framed OBU stream (the
    av1C configOBUs / ISOBMFF sample form)."""
    pos = 0
    count = 0
    while pos < len(data) and count < limit:
        hdr = data[pos]
        if hdr & 0x80:
            raise ValueError("OBU forbidden bit set")
        obu_type = (hdr >> 3) & 0xF
        has_ext = (hdr >> 2) & 1
        has_size = (hdr >> 1) & 1
        pos += 1
        if has_ext:
            pos += 1
        if has_size:
            size, pos = _leb128(data, pos)
        else:
            size = len(data) - pos
        payload = data[pos : pos + size]
        if len(payload) != size:
            raise ValueError("truncated OBU")
        yield obu_type, payload
        pos += size
        count += 1


def parse_av1_sequence_header(payload: bytes) -> dict:
    """sequence_header_obu (AV1 spec 5.5.1), through color_config."""
    b = _Bits(payload)
    profile = b.u(3)
    if profile > 2:
        raise ValueError(f"AV1 seq_profile {profile}")
    b.u(1)  # still_picture
    reduced = b.u(1)
    decoder_model_info = False
    buffer_delay_bits = 0
    if reduced:
        level_idx = b.u(5)
    else:
        if b.u(1):  # timing_info_present
            b.u(32)  # num_units_in_display_tick
            b.u(32)  # time_scale
            if b.u(1):  # equal_picture_interval
                b.ue()  # num_ticks_per_picture_minus_1 (uvlc)
            if b.u(1):  # decoder_model_info_present
                decoder_model_info = True
                buffer_delay_bits = b.u(5) + 1
                b.u(32)  # num_units_in_decoding_tick
                b.u(5)  # buffer_removal_time_length_minus_1
                b.u(5)  # frame_presentation_time_length_minus_1
        initial_display_delay_present = b.u(1)
        n_ops = b.u(5) + 1
        level_idx = 0
        for i in range(n_ops):
            b.u(12)  # operating_point_idc
            li = b.u(5)  # seq_level_idx
            if i == 0:
                level_idx = li
            if li > 7:
                b.u(1)  # seq_tier
            if decoder_model_info and b.u(1):  # decoder_model_present_for_op
                b.u(buffer_delay_bits)  # decoder_buffer_delay
                b.u(buffer_delay_bits)  # encoder_buffer_delay
                b.u(1)  # low_delay_mode_flag
            if initial_display_delay_present and b.u(1):
                b.u(4)  # initial_display_delay_minus_1
    wbits = b.u(4) + 1
    hbits = b.u(4) + 1
    width = b.u(wbits) + 1
    height = b.u(hbits) + 1
    # skip to color_config: frame-id / tool flags
    if not reduced:
        if b.u(1):  # frame_id_numbers_present
            b.u(4)  # delta_frame_id_length_minus_2
            b.u(3)  # additional_frame_id_length_minus_1
    b.u(1)  # use_128x128_superblock
    b.u(1)  # enable_filter_intra
    b.u(1)  # enable_intra_edge_filter
    order_hint = False
    if not reduced:
        b.u(1)  # enable_interintra_compound
        b.u(1)  # enable_masked_compound
        b.u(1)  # enable_warped_motion
        b.u(1)  # enable_dual_filter
        order_hint = bool(b.u(1))
        if order_hint:
            b.u(1)  # enable_jnt_comp
            b.u(1)  # enable_ref_frame_mvs
        if not b.u(1):  # seq_choose_screen_content_tools
            force_sct = b.u(1)
        else:
            force_sct = 2  # SELECT_SCREEN_CONTENT_TOOLS
        if force_sct > 0:
            if not b.u(1):  # seq_choose_integer_mv
                b.u(1)  # seq_force_integer_mv
        if order_hint:
            b.u(3)  # order_hint_bits_minus_1
    b.u(1)  # enable_superres
    b.u(1)  # enable_cdef
    b.u(1)  # enable_restoration
    # color_config (5.5.2)
    high_bitdepth = b.u(1)
    if profile == 2 and high_bitdepth:
        bit_depth = 12 if b.u(1) else 10
    else:
        bit_depth = 10 if high_bitdepth else 8
    mono = b.u(1) if profile != 1 else 0
    if b.u(1):  # color_description_present
        primaries, transfer, matrix = b.u(8), b.u(8), b.u(8)
    else:
        primaries = transfer = matrix = 2  # unspecified
    if mono:
        chroma = "4:0:0"
    elif primaries == 1 and transfer == 13 and matrix == 0:
        chroma = "4:4:4"
    else:
        b.u(1)  # color_range
        if profile == 0:
            sx = sy = 1
        elif profile == 1:
            sx = sy = 0
        else:
            if bit_depth == 12:
                sx = b.u(1)
                sy = b.u(1) if sx else 0
            else:
                sx, sy = 1, 0
        chroma = {(1, 1): "4:2:0", (1, 0): "4:2:2", (0, 0): "4:4:4"}[(sx, sy)]
        if sx and sy:
            b.u(2)  # chroma_sample_position
    return {
        "codec": "av1",
        "profile": _AV1_PROFILES[profile],
        "level": _av1_level(level_idx),
        "width": width,
        "height": height,
        "bit_depth": bit_depth,
        "chroma": chroma,
        "interlaced": False,
    }


def parse_av1c(body: bytes) -> dict:
    """AV1CodecConfigurationRecord (av1C, the public AV1 ISOBMFF
    binding): 4 fixed bytes then configOBUs — parse the sequence
    header OBU if present, else fall back to the record's own
    profile/level fields."""
    if len(body) < 4 or body[0] != 0x81:
        raise ValueError("not an av1C record (marker/version)")
    for obu_type, payload in av1_obus(body[4:]):
        if obu_type == 1:  # OBU_SEQUENCE_HEADER
            return parse_av1_sequence_header(payload)
    profile = body[1] >> 5
    level_idx = body[1] & 0x1F
    return {
        "codec": "av1",
        "profile": _AV1_PROFILES.get(profile, str(profile)),
        "level": _av1_level(level_idx),
        "width": None,
        "height": None,
        "bit_depth": None,
        "chroma": None,
        "interlaced": False,
    }


# --------------------------------------------------------------------------
# IVF — the raw-frame container VP8/VP9/AV1 test vectors and crawl
# elementary streams ship in (public libvpx/libaom framing)
# --------------------------------------------------------------------------

_IVF_CODECS = {b"VP80": "vp8", b"VP90": "vp9", b"AV01": "av1"}


def is_ivf(content: bytes) -> bool:
    return content[:4] == b"DKIF"


def ivf_metadata(content: bytes) -> dict:
    """IVF header + first-frame codec parse. Returns container='ivf',
    codec, width/height (header), duration (last frame PTS + 1 at the
    header timebase), n_frames, and the stream-level info dict from the
    first keyframe when the codec parse succeeds."""
    if not is_ivf(content) or len(content) < 32:
        raise ValueError("not an IVF file")
    version, hdr_size, fourcc, width, height, den, num, n_frames = struct.unpack_from(
        "<HH4sHHIII", content, 4
    )
    if version != 0 or hdr_size < 32:
        raise ValueError(f"IVF version {version} / header {hdr_size}")
    codec = _IVF_CODECS.get(fourcc, fourcc.decode("latin-1").strip())
    pos = hdr_size
    duration = None
    last_pts = None
    first_payload = None
    walked = 0
    while pos + 12 <= len(content) and walked < 1_000_000:
        size, pts = struct.unpack_from("<IQ", content, pos)
        frame = content[pos + 12 : pos + 12 + size]
        if len(frame) != size:
            raise ValueError("truncated IVF frame")
        if first_payload is None:
            first_payload = frame
        last_pts = pts
        pos += 12 + size
        walked += 1
    if last_pts is not None and den:
        duration = (last_pts + 1) * num / den
    stream: dict = {}
    if first_payload:
        try:
            if codec == "vp9":
                stream = parse_vp9_keyframe(first_payload)
            elif codec == "av1":
                for obu_type, payload in av1_obus(first_payload):
                    if obu_type == 1:
                        stream = parse_av1_sequence_header(payload)
                        break
        except ValueError:
            stream = {}
    return {
        "container": "ivf",
        "codec": codec,
        "width": stream.get("width") or width,
        "height": stream.get("height") or height,
        "duration_sec": duration,
        "n_frames": walked,
        "stream": stream,
    }


# --------------------------------------------------------------------------
# display helper shared by the container walks
# --------------------------------------------------------------------------


def profile_string(info: dict) -> str:
    """'h264 high@4.0 8bit 4:2:0' — the normalized video_profile field
    the metadata sweep carries."""
    parts = [info["codec"]]
    prof = info.get("profile")
    level = info.get("level")
    if prof and level:
        parts.append(f"{prof}@{level}")
    elif prof:
        parts.append(prof)
    if info.get("bit_depth"):
        parts.append(f"{info['bit_depth']}bit")
    if info.get("chroma"):
        parts.append(info["chroma"])
    return " ".join(parts)
