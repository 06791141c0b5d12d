"""INDEPENDENT video parameter-set writers for the video_codecs tests.

Serializes H.264/HEVC SPS, VP9 keyframe headers, AV1 sequence-header
OBUs and the avcC/hvcC/vpcC/av1C/IVF wrappers directly from the public
bitstream specs — a separate bit-packer and exp-Golomb encoder from
the reader under test (which uses an MSB-first reader + decoder), so a
shared misreading of the spec cannot self-validate.
"""

from __future__ import annotations

import struct


class BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def u(self, n: int, v: int) -> "BitWriter":
        if v < 0 or v >= (1 << n):
            raise ValueError(f"{v} does not fit in {n} bits")
        self.bits.extend((v >> (n - 1 - i)) & 1 for i in range(n))
        return self

    def ue(self, v: int) -> "BitWriter":
        code = v + 1
        nbits = code.bit_length()
        self.u(nbits - 1, 0)
        self.u(nbits, code)
        return self

    def se(self, v: int) -> "BitWriter":
        # spec mapping: v>0 -> 2v-1, v<=0 -> -2v
        self.ue(2 * v - 1 if v > 0 else -2 * v)
        return self

    def rbsp_trailing(self) -> "BitWriter":
        self.u(1, 1)
        while len(self.bits) % 8:
            self.u(1, 0)
        return self

    def pad_align(self) -> "BitWriter":
        while len(self.bits) % 8:
            self.u(1, 0)
        return self

    def to_bytes(self) -> bytes:
        self.pad_align()
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            byte = 0
            for bit in self.bits[i : i + 8]:
                byte = (byte << 1) | bit
            out.append(byte)
        return bytes(out)


def insert_epb(rbsp: bytes) -> bytes:
    """Emulation-prevention: any 00 00 followed by 00/01/02/03 gets a
    03 inserted (H.264/H.265 7.4.1)."""
    out = bytearray()
    zeros = 0
    for byte in rbsp:
        if zeros >= 2 and byte <= 3:
            out.append(3)
            zeros = 0
        out.append(byte)
        zeros = zeros + 1 if byte == 0 else 0
    return bytes(out)


HIGH_SET = {100, 110, 122, 244, 44, 83, 86, 118, 128}


def h264_sps(
    profile: int = 66,
    level: int = 30,
    width_mbs: int = 40,
    height_units: int = 30,
    frame_mbs_only: int = 1,
    crop: tuple[int, int, int, int] | None = None,
    chroma_format_idc: int = 1,
    bit_depth: int = 8,
    poc_type: int = 0,
    scaling_lists: bool = False,
    epb: bool = True,
    sps_id: int = 0,
) -> bytes:
    b = BitWriter()
    b.u(8, profile)
    b.u(8, 0)  # constraint flags
    b.u(8, level)
    b.ue(sps_id)
    if profile in HIGH_SET:
        b.ue(chroma_format_idc)
        if chroma_format_idc == 3:
            b.u(1, 0)  # separate_colour_plane
        b.ue(bit_depth - 8)
        b.ue(bit_depth - 8)
        b.u(1, 0)  # qpprime
        b.u(1, 1 if scaling_lists else 0)
        if scaling_lists:
            for i in range(8 if chroma_format_idc != 3 else 12):
                present = 1 if i in (0, 6) else 0
                b.u(1, present)
                if present:
                    for _ in range(16 if i < 6 else 64):
                        b.se(0)  # delta_scale
    b.ue(4)  # log2_max_frame_num_minus4
    b.ue(poc_type)
    if poc_type == 0:
        b.ue(4)
    elif poc_type == 1:
        b.u(1, 0)
        b.se(1)
        b.se(-1)
        b.ue(2)
        b.se(3)
        b.se(-3)
    b.ue(4)  # max_num_ref_frames
    b.u(1, 0)  # gaps
    b.ue(width_mbs - 1)
    b.ue(height_units - 1)
    b.u(1, frame_mbs_only)
    if not frame_mbs_only:
        b.u(1, 0)  # mbaff
    b.u(1, 1)  # direct_8x8
    if crop:
        b.u(1, 1)
        for c in crop:
            b.ue(c)
    else:
        b.u(1, 0)
    b.u(1, 0)  # vui_parameters_present
    b.rbsp_trailing()
    rbsp = b.to_bytes()
    return bytes([0x67]) + (insert_epb(rbsp) if epb else rbsp)


def avcc(sps: bytes, n_pps: int = 1) -> bytes:
    rec = bytearray([1, sps[1], sps[2], sps[3], 0xFF, 0xE1])
    rec += struct.pack(">H", len(sps)) + sps
    rec.append(n_pps)
    for _ in range(n_pps):
        pps = bytes([0x68, 0xCE, 0x38, 0x80])
        rec += struct.pack(">H", len(pps)) + pps
    return bytes(rec)


def hevc_sps(
    profile: int = 1,
    level: int = 120,
    width: int = 1920,
    height: int = 1080,
    chroma_format_idc: int = 1,
    bit_depth: int = 8,
    conf_window: tuple[int, int, int, int] | None = None,
    sub_layers: int = 0,
) -> bytes:
    b = BitWriter()
    b.u(4, 0)  # vps id
    b.u(3, sub_layers)  # sps_max_sub_layers_minus1
    b.u(1, 1)  # temporal_id_nesting
    # profile_tier_level
    b.u(2, 0)
    b.u(1, 0)
    b.u(5, profile)
    b.u(32, 1 << (31 - profile))  # compat flags
    b.u(48, 0b1011 << 44)  # progressive/interlaced/nonpacked/frameonly + reserved
    b.u(8, level)
    sub_flags = [(1, 1)] * sub_layers
    for p, l in sub_flags:
        b.u(1, p)
        b.u(1, l)
    if sub_layers > 0:
        for _ in range(sub_layers, 8):
            b.u(2, 0)
    for p, l in sub_flags:
        if p:
            b.u(8, (0 << 6) | (0 << 5) | 2)  # space/tier/profile_idc=2
            b.u(32, 0)
            b.u(48, 0)
        if l:
            b.u(8, 90)
    b.ue(0)  # sps id
    b.ue(chroma_format_idc)
    if chroma_format_idc == 3:
        b.u(1, 0)
    b.ue(width)
    b.ue(height)
    if conf_window:
        b.u(1, 1)
        for c in conf_window:
            b.ue(c)
    else:
        b.u(1, 0)
    b.ue(bit_depth - 8)  # bit_depth_luma_minus8
    b.ue(bit_depth - 8)
    b.rbsp_trailing()
    # HEVC NAL header: forbidden(1)=0, type(6)=33, layer(6)=0, tid+1(3)=1
    return bytes([33 << 1, 1]) + insert_epb(b.to_bytes())


def hvcc(sps: bytes) -> bytes:
    rec = bytearray()
    rec.append(1)  # configurationVersion
    rec.append(1)  # space/tier/profile_idc
    rec += struct.pack(">I", 0x60000000)  # compat
    rec += b"\x00" * 6  # constraints
    rec.append(120)  # level
    rec += struct.pack(">H", 0xF000)  # reserved + min_spatial_seg
    rec.append(0xFC)  # reserved + parallelism
    rec.append(0xFC | 1)  # reserved + chroma
    rec.append(0xF8)  # reserved + depth luma
    rec.append(0xF8)  # reserved + depth chroma
    rec += struct.pack(">H", 0)  # avgFrameRate
    rec.append(0x03)  # cfr/layers/nested/lengthSizeMinusOne
    vps = bytes([32 << 1, 1, 0x0C, 0x01, 0xFF, 0xFF])
    pps = bytes([34 << 1, 1, 0xC1, 0x62])
    rec.append(3)  # numOfArrays
    for nal_type, nal in ((32, vps), (33, sps), (34, pps)):
        rec.append(nal_type)
        rec += struct.pack(">H", 1)
        rec += struct.pack(">H", len(nal)) + nal
    return bytes(rec)


def vp9_keyframe(
    profile: int = 0,
    width: int = 1280,
    height: int = 720,
    bit_depth: int = 8,
    color_space: int = 2,
) -> bytes:
    b = BitWriter()
    b.u(2, 2)  # frame_marker
    b.u(1, profile & 1)
    b.u(1, (profile >> 1) & 1)
    if profile == 3:
        b.u(1, 0)
    b.u(1, 0)  # show_existing_frame
    b.u(1, 0)  # frame_type = KEY
    b.u(1, 1)  # show_frame
    b.u(1, 0)  # error_resilient
    b.u(24, 0x498342)
    if profile >= 2:
        b.u(1, 1 if bit_depth == 12 else 0)
    if color_space != 7:
        b.u(3, color_space)
        b.u(1, 0)  # color_range
        if profile in (1, 3):
            b.u(1, 0)  # subsampling_x
            b.u(1, 0)
            b.u(1, 0)  # reserved
    else:
        b.u(3, 7)
        if profile in (1, 3):
            b.u(1, 0)
    b.u(16, width - 1)
    b.u(16, height - 1)
    b.u(1, 0)  # render_and_frame_size_different
    return b.to_bytes() + b"\x00" * 8  # compressed header stub


def vpcc(profile: int = 0, level: int = 31, bit_depth: int = 8) -> bytes:
    return bytes(
        [1, 0, 0, 0, profile, level, (bit_depth << 4) | (1 << 1), 1, 1, 1]
    ) + struct.pack(">H", 0)


def av1_sequence_header(
    profile: int = 0,
    level_idx: int = 8,
    width: int = 1920,
    height: int = 1080,
    bit_depth: int = 8,
    reduced: bool = False,
    timing_info: bool = False,
) -> bytes:
    b = BitWriter()
    b.u(3, profile)
    b.u(1, 0)  # still_picture
    b.u(1, 1 if reduced else 0)
    if reduced:
        b.u(5, level_idx)
    else:
        b.u(1, 1 if timing_info else 0)
        if timing_info:
            b.u(32, 1)  # num_units_in_display_tick
            b.u(32, 30)  # time_scale
            b.u(1, 1)  # equal_picture_interval
            b.ue(0)  # num_ticks_per_picture_minus_1 (uvlc)
            b.u(1, 1)  # decoder_model_info_present
            b.u(5, 15)  # buffer_delay_length_minus_1
            b.u(32, 1)
            b.u(5, 9)
            b.u(5, 9)
        b.u(1, 1 if timing_info else 0)  # initial_display_delay_present
        n_ops = 2 if timing_info else 1
        b.u(5, n_ops - 1)
        for i in range(n_ops):
            b.u(12, 0)
            b.u(5, level_idx)
            if level_idx > 7:
                b.u(1, 0)  # seq_tier
            if timing_info:
                b.u(1, 1)  # decoder_model_present_for_op
                b.u(16, 100)  # decoder_buffer_delay
                b.u(16, 100)  # encoder_buffer_delay
                b.u(1, 0)  # low_delay
                b.u(1, 1)  # initial_display_delay_present_for_op
                b.u(4, 3)
    b.u(4, 15)  # frame_width_bits_minus_1
    b.u(4, 15)
    b.u(16, width - 1)
    b.u(16, height - 1)
    if not reduced:
        b.u(1, 0)  # frame_id_numbers_present
    b.u(1, 1)  # use_128x128_superblock
    b.u(1, 0)  # filter_intra
    b.u(1, 0)  # intra_edge
    if not reduced:
        b.u(1, 0)  # interintra
        b.u(1, 0)  # masked_compound
        b.u(1, 0)  # warped_motion
        b.u(1, 0)  # dual_filter
        b.u(1, 1)  # enable_order_hint
        b.u(1, 0)  # jnt_comp
        b.u(1, 0)  # ref_frame_mvs
        b.u(1, 1)  # seq_choose_screen_content_tools
        # force_sct == SELECT(2) > 0:
        b.u(1, 1)  # seq_choose_integer_mv
        b.u(3, 6)  # order_hint_bits_minus_1
    b.u(1, 0)  # superres
    b.u(1, 1)  # cdef
    b.u(1, 1)  # restoration
    # color_config
    high = 1 if bit_depth > 8 else 0
    b.u(1, high)
    if profile == 2 and high:
        b.u(1, 1 if bit_depth == 12 else 0)
    if profile != 1:
        b.u(1, 0)  # mono_chrome
    b.u(1, 1)  # color_description_present
    b.u(8, 1)  # primaries BT.709
    b.u(8, 1)  # transfer
    b.u(8, 1)  # matrix
    b.u(1, 0)  # color_range
    if profile == 0:
        sx = sy = 1  # 4:2:0 implied
    elif profile == 1:
        sx = sy = 0
    else:
        if bit_depth == 12:
            b.u(1, 1)  # subsampling_x
            b.u(1, 1)
            sx = sy = 1
        else:
            sx, sy = 1, 0  # 4:2:2 implied for profile-2 8/10-bit
    if sx and sy:
        b.u(2, 0)  # chroma_sample_position
    b.u(1, 0)  # separate_uv_delta_q
    b.u(1, 0)  # film_grain_params_present
    b.pad_align()
    return b.to_bytes()


def leb128(v: int) -> bytes:
    out = bytearray()
    while True:
        byte = v & 0x7F
        v >>= 7
        if v:
            out.append(byte | 0x80)
        else:
            out.append(byte)
            return bytes(out)


def obu(obu_type: int, payload: bytes) -> bytes:
    return bytes([(obu_type << 3) | 0x02]) + leb128(len(payload)) + payload


def av1c(seq_obu: bytes | None, profile: int = 0, level_idx: int = 8) -> bytes:
    rec = bytearray([0x81, (profile << 5) | level_idx, 0, 0])
    if seq_obu:
        rec += seq_obu
    return bytes(rec)


def ivf(fourcc: bytes, width: int, height: int, rate: int, scale: int,
        frames: list[bytes]) -> bytes:
    hdr = b"DKIF" + struct.pack(
        "<HH4sHHIIII", 0, 32, fourcc, width, height, rate, scale,
        len(frames), 0
    )
    body = b"".join(
        struct.pack("<IQ", len(f), i) + f for i, f in enumerate(frames)
    )
    return hdr + body
