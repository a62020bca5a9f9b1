"""Synthesize well-formed H.264 elementary streams for analyzer tests.

Builds SPS/PPS/SEI/AUD/slice NAL units bit-by-bit (with emulation-prevention
escaping) so the native analyzers can be diffed byte-for-byte against the
reference binaries compiled from /root/reference.  Only syntax the analyzers
actually decode needs to be semantically meaningful; slice *payloads* are
random filler.
"""

from __future__ import annotations

import dataclasses

import numpy as np


class BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def u(self, value: int, n: int) -> "BitWriter":
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)
        return self

    def ue(self, value: int) -> "BitWriter":
        lead = (value + 1).bit_length() - 1
        self.u(0, lead)
        self.u(value + 1, lead + 1)
        return self

    def se(self, value: int) -> "BitWriter":
        self.ue(2 * value - 1 if value > 0 else -2 * value)
        return self

    def rbsp_trailing(self) -> "BitWriter":
        self.u(1, 1)
        while len(self.bits) % 8:
            self.u(0, 1)
        return self

    def byte_align(self) -> "BitWriter":
        while len(self.bits) % 8:
            self.u(0, 1)
        return self

    def to_bytes(self) -> bytes:
        assert len(self.bits) % 8 == 0
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i:i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def escape(rbsp: bytes) -> bytes:
    """Insert emulation-prevention 0x03 bytes."""
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def nal(ref_idc: int, nal_type: int, rbsp: bytes, long_sc: bool = False) -> bytes:
    sc = b"\x00\x00\x00\x01" if long_sc else b"\x00\x00\x01"
    return sc + bytes([(ref_idc << 5) | nal_type]) + escape(rbsp)


@dataclasses.dataclass
class SpsParams:
    profile_idc: int = 77          # Main
    level_idc: int = 40
    width_mbs: int = 120           # 1920
    height_map_units: int = 68     # 1088 progressive
    frame_mbs_only: int = 1
    aspect_ratio_idc: int = 1
    num_units_in_tick: int = 1001
    time_scale: int = 60000
    hrd: bool = True
    bit_rate_value_minus1: int = 78124   # (78125)<<6 = 5 Mbps at scale 0
    bit_rate_scale: int = 0
    pic_struct_present: int = 1
    log2_max_frame_num_minus4: int = 4
    log2_max_poc_lsb_minus4: int = 4
    initial_cpb_len: int = 23
    cpb_removal_len: int = 23
    dpb_len: int = 23


def sps_nal(p: SpsParams, long_sc: bool = False) -> bytes:
    w = BitWriter()
    w.u(p.profile_idc, 8)
    w.u(0, 6)                      # constraint_set0..5
    w.u(0, 2)                      # reserved
    w.u(p.level_idc, 8)
    w.ue(0)                        # seq_parameter_set_id
    if p.profile_idc in (100, 110, 122, 244, 44, 83, 86, 118, 128, 138,
                         139, 134, 135):
        w.ue(1)                    # chroma_format_idc 4:2:0
        w.ue(0)                    # bit_depth_luma_minus8
        w.ue(0)                    # bit_depth_chroma_minus8
        w.u(0, 1)                  # qpprime
        w.u(0, 1)                  # seq_scaling_matrix_present
    w.ue(p.log2_max_frame_num_minus4)
    w.ue(0)                        # pic_order_cnt_type
    w.ue(p.log2_max_poc_lsb_minus4)
    w.ue(4)                        # max_num_ref_frames
    w.u(0, 1)                      # gaps_in_frame_num_value_allowed
    w.ue(p.width_mbs - 1)
    w.ue(p.height_map_units - 1)
    w.u(p.frame_mbs_only, 1)
    if not p.frame_mbs_only:
        w.u(0, 1)                  # mb_adaptive_frame_field
    w.u(1, 1)                      # direct_8x8_inference
    w.u(0, 1)                      # frame_cropping
    w.u(1, 1)                      # vui_parameters_present
    w.u(1, 1)                      # aspect_ratio_info_present
    w.u(p.aspect_ratio_idc, 8)
    if p.aspect_ratio_idc == 255:
        w.u(4, 16).u(3, 16)
    w.u(0, 1)                      # overscan_info_present
    w.u(0, 1)                      # video_signal_type_present
    w.u(0, 1)                      # chroma_loc_info_present
    w.u(1, 1)                      # timing_info_present
    w.u(p.num_units_in_tick, 32)
    w.u(p.time_scale, 32)
    w.u(1, 1)                      # fixed_frame_rate
    w.u(1 if p.hrd else 0, 1)      # nal_hrd_parameters_present
    if p.hrd:
        w.ue(0)                    # cpb_cnt_minus1
        w.u(p.bit_rate_scale, 4)
        w.u(0, 4)                  # cpb_size_scale
        w.ue(p.bit_rate_value_minus1)
        w.ue(78124)                # cpb_size_value_minus1
        w.u(1, 1)                  # cbr_flag
        w.u(p.initial_cpb_len, 5)
        w.u(p.cpb_removal_len, 5)
        w.u(p.dpb_len, 5)
        w.u(23, 5)                 # time_offset_length
    w.u(0, 1)                      # vcl_hrd_parameters_present
    if p.hrd:
        w.u(0, 1)                  # low_delay_hrd
    w.u(p.pic_struct_present, 1)
    w.u(0, 1)                      # bitstream_restriction
    w.rbsp_trailing()
    return nal(3, 7, w.to_bytes(), long_sc)


def pps_nal() -> bytes:
    w = BitWriter()
    w.ue(0).ue(0)                  # pps_id, sps_id
    w.u(0, 1)                      # entropy_coding_mode (CAVLC)
    w.u(0, 1)                      # bottom_field_pic_order_in_frame_present
    w.ue(0)                        # num_slice_groups_minus1
    w.ue(0).ue(0)                  # num_ref_idx_l0/l1_default_active_minus1
    w.u(0, 1)                      # weighted_pred
    w.u(0, 2)                      # weighted_bipred_idc
    w.ue(0).ue(0).ue(0)            # init_qp/qs/chroma offsets (se==ue for 0)
    w.u(1, 1)                      # deblocking_filter_control_present
    w.u(0, 1)                      # constrained_intra_pred
    w.u(0, 1)                      # redundant_pic_cnt_present
    w.rbsp_trailing()
    return nal(3, 8, w.to_bytes())


def aud_nal(primary_pic_type: int = 7, long_sc: bool = False) -> bytes:
    w = BitWriter()
    w.u(primary_pic_type, 3)
    w.rbsp_trailing()
    return nal(0, 9, w.to_bytes(), long_sc)


def sei_nal(p: SpsParams, pic_struct: int | None = None,
            buffering_period: bool = False,
            extra_payload: bytes | None = None) -> bytes:
    w = BitWriter()
    if buffering_period:
        pw = BitWriter()
        pw.ue(0)                   # seq_parameter_set_id
        if p.hrd:
            pw.u(90000, p.initial_cpb_len + 1)
            pw.u(0, p.initial_cpb_len + 1)
        pw.byte_align()
        payload = pw.to_bytes()
        w.u(0, 8)                  # payloadType buffering_period
        w.u(len(payload), 8)
        for b in payload:
            w.u(b, 8)
    if pic_struct is not None:
        pw = BitWriter()
        if p.hrd:
            pw.u(2, p.cpb_removal_len + 1)
            pw.u(1, p.dpb_len + 1)
        if p.pic_struct_present:
            pw.u(pic_struct, 4)
        pw.byte_align()
        payload = pw.to_bytes()
        w.u(1, 8)                  # payloadType pic_timing
        w.u(len(payload), 8)
        for b in payload:
            w.u(b, 8)
    if extra_payload is not None:
        w.u(136, 8)                # an unhandled payload type (skipped)
        w.u(len(extra_payload), 8)
        for b in extra_payload:
            w.u(b, 8)
    w.rbsp_trailing()              # SEI rbsp trailing byte (0x80)
    return nal(0, 6, w.to_bytes())


def slice_nal(p: SpsParams, slice_type: int, frame_num: int, poc_lsb: int,
              idr: bool = False, ref_idc: int = 2,
              field_pic: int = 0, bottom_field: int = 0,
              payload_bytes: int = 64, rng: np.random.Generator | None = None,
              long_sc: bool = False) -> bytes:
    w = BitWriter()
    w.ue(0)                        # first_mb_in_slice
    w.ue(slice_type)
    w.ue(0)                        # pic_parameter_set_id
    w.u(frame_num, p.log2_max_frame_num_minus4 + 4)
    if not p.frame_mbs_only:
        w.u(field_pic, 1)
        if field_pic:
            w.u(bottom_field, 1)
    if idr:
        w.ue(frame_num % 4)        # idr_pic_id
    w.u(poc_lsb, p.log2_max_poc_lsb_minus4 + 4)
    if rng is None:
        rng = np.random.default_rng(slice_type * 131 + frame_num)
    for b in rng.integers(0, 256, payload_bytes, dtype=np.uint8):
        w.u(int(b), 8)
    w.rbsp_trailing()
    return nal(ref_idc, 5 if idr else 1, w.to_bytes(), long_sc)


def _scaling_list(w: BitWriter, n: int) -> None:
    w.se(1)                        # delta: 8 -> 9
    for _ in range(n - 1):
        w.se(0)


def sps_scaling_nal(p: SpsParams) -> bytes:
    """High-profile SPS with seq scaling matrices (h264_parse-only path)."""
    assert p.profile_idc == 100
    w = BitWriter()
    w.u(p.profile_idc, 8).u(0, 8).u(p.level_idc, 8)
    w.ue(1)                        # seq_parameter_set_id 1 (distinct)
    w.ue(1).ue(0).ue(0)            # chroma 4:2:0, bit depths
    w.u(0, 1)                      # qpprime
    w.u(1, 1)                      # seq_scaling_matrix_present
    for i in range(8):
        present = 1 if i in (0, 3, 6) else 0
        w.u(present, 1)
        if present:
            _scaling_list(w, 16 if i < 6 else 64)
    w.ue(p.log2_max_frame_num_minus4)
    w.ue(0)
    w.ue(p.log2_max_poc_lsb_minus4)
    w.ue(4).u(0, 1)
    w.ue(p.width_mbs - 1).ue(p.height_map_units - 1)
    w.u(1, 1)                      # frame_mbs_only
    w.u(1, 1).u(0, 1)              # direct_8x8, no cropping
    w.u(0, 1)                      # no VUI
    w.rbsp_trailing()
    return nal(3, 7, w.to_bytes())


def pps_ext_nal() -> bytes:
    """PPS with the transform_8x8/scaling-list extension tail."""
    w = BitWriter()
    w.ue(1).ue(0)                  # pps_id 1, sps_id 0
    w.u(1, 1)                      # CABAC
    w.u(0, 1)
    w.ue(0)
    w.ue(2).ue(2)
    w.u(1, 1)                      # weighted_pred
    w.u(2, 2)
    w.se(-3).se(2).se(-1)          # qp/qs/chroma offsets
    w.u(1, 1).u(0, 1).u(0, 1)
    w.u(1, 1)                      # transform_8x8_mode
    w.u(1, 1)                      # pic_scaling_matrix_present
    for i in range(8):             # 6 + 2*transform_8x8
        present = 1 if i in (1, 7) else 0
        w.u(present, 1)
        if present:
            _scaling_list(w, 16 if i < 6 else 64)
    w.se(-2)                       # second_chroma_qp_index_offset
    w.rbsp_trailing()
    return nal(3, 8, w.to_bytes())


def seq_ext_nal() -> bytes:
    w = BitWriter()
    w.ue(0)                        # seq_parameter_set_id
    w.ue(1)                        # aux_format_idc
    w.ue(2)                        # bit_depth_aux_minus8
    w.u(1, 1)                      # alpha_incr_flag
    w.u(123, 11).u(456, 11)        # alpha opaque/transparent (2+9 bits)
    w.u(0, 1)                      # additional extension flag
    w.rbsp_trailing()
    return nal(0, 13, w.to_bytes())


def _sei_payload(w: BitWriter, ptype: int, pw: BitWriter) -> None:
    pw.byte_align()
    payload = pw.to_bytes()
    w.u(ptype, 8)
    w.u(len(payload), 8)
    for b in payload:
        w.u(b, 8)


def sei_extended_nal(p: SpsParams) -> bytes:
    """SEI with the payload types h264_parse decodes beyond 0/1."""
    w = BitWriter()
    pw = BitWriter()               # pic_timing with a full clock timestamp
    if p.hrd:
        pw.u(5, p.cpb_removal_len + 1)
        pw.u(2, p.dpb_len + 1)
    pw.u(0, 4)                     # pic_struct 0 -> 1 clock TS
    pw.u(1, 1)                     # clock_timestamp_flag
    pw.u(1, 2).u(0, 1).u(4, 5)     # ct_type, nuit_field, counting_type
    pw.u(1, 1)                     # full_timestamp_flag
    pw.u(0, 1).u(0, 1)
    pw.u(17, 8)                    # n_frames
    pw.u(42, 6).u(13, 6).u(7, 5)   # s/m/h
    pw.u(99, 23)                   # time_offset (time_offset_length=23)
    _sei_payload(w, 1, pw)
    pw = BitWriter()               # recovery_point
    pw.ue(12).u(1, 1).u(0, 1).u(2, 2)
    _sei_payload(w, 6, pw)
    pw = BitWriter()               # dec_ref_pic_marking_repetition
    pw.u(1, 1).ue(3)
    _sei_payload(w, 7, pw)
    pw = BitWriter()               # scene_info, transition > 3
    pw.u(1, 1).ue(2).ue(5).ue(9)
    _sei_payload(w, 9, pw)
    pw = BitWriter()               # user_data_unregistered (printable)
    for b in b"0123456789abcdef" + b"dtv-utils-tpu native analyzer":
        pw.u(b, 8)
    _sei_payload(w, 5, pw)
    w.rbsp_trailing()
    return nal(0, 6, w.to_bytes())


def make_extended_stream(seed: int = 11) -> bytes:
    """Exercises h264_parse-only syntax (scaling lists, PPS ext, SEI set)."""
    p = SpsParams(profile_idc=100)
    rng = np.random.default_rng(seed)
    out = bytearray()
    out += aud_nal(7, long_sc=True)
    out += sps_nal(p)
    out += sps_scaling_nal(p)
    out += pps_nal()
    out += pps_ext_nal()
    out += seq_ext_nal()
    out += sei_extended_nal(p)
    out += slice_nal(p, 7, 0, 0, idr=True, ref_idc=3, rng=rng)
    # two slices of the same picture, then a new picture (boundary check)
    out += slice_nal(p, 5, 1, 2, ref_idc=2, rng=rng)
    out += slice_nal(p, 5, 1, 2, ref_idc=2, rng=rng)
    out += slice_nal(p, 5, 2, 4, ref_idc=2, rng=rng)
    out += aud_nal(0)
    out += sei_nal(p, pic_struct=0, buffering_period=True)
    out += slice_nal(p, 0, 3, 6, ref_idc=2, rng=rng)
    out += nal(0, 10, b"")         # end of sequence
    out += aud_nal(7)
    return bytes(out)


def make_stream(interlaced: bool = False, profile: int = 77,
                n_gops: int = 2, seed: int = 7) -> bytes:
    """A deterministic multi-GOP stream exercising every picture label."""
    p = SpsParams(profile_idc=profile,
                  frame_mbs_only=0 if interlaced else 1,
                  height_map_units=34 if interlaced else 68,
                  level_idc=11 if profile == 66 else 40)
    rng = np.random.default_rng(seed)
    out = bytearray()
    poc = 0
    frame_num = 0
    for g in range(n_gops):
        long_sc = (g % 2 == 0)
        out += aud_nal(7, long_sc=long_sc)
        out += sps_nal(p, long_sc=not long_sc)
        out += pps_nal()
        out += sei_nal(p, pic_struct=0 if not interlaced else 3,
                       buffering_period=True, extra_payload=b"\x55" * 5)
        out += slice_nal(p, 7, frame_num, 0, idr=True, ref_idc=3,
                         payload_bytes=96, rng=rng)
        frame_num += 1
        cadence = [(0, 2, False), (1, 0, False), (1, 2, False),  # P b B
                   (2, 2, False), (3, 2, False), (4, 2, False),  # I SP SI
                   (5, 2, False), (7, 2, True)]                  # P(+5) I(+5)
        for k, (stype, ref, _) in enumerate(cadence):
            poc = (poc + 2) % (1 << (p.log2_max_poc_lsb_minus4 + 4))
            out += aud_nal(rng.integers(0, 8))
            if interlaced:
                # alternate field pairs and frame-coded pulldown pictures
                if k % 3 == 2:
                    out += sei_nal(p, pic_struct=3 + (k % 4))
                    out += slice_nal(p, stype, frame_num, poc, ref_idc=ref,
                                     payload_bytes=48 + 8 * k, rng=rng)
                else:
                    out += sei_nal(p, pic_struct=1)
                    out += slice_nal(p, stype, frame_num, poc, ref_idc=ref,
                                     field_pic=1, bottom_field=k % 2,
                                     payload_bytes=48 + 8 * k, rng=rng)
            else:
                out += sei_nal(p, pic_struct=0)
                out += slice_nal(p, stype, frame_num, poc, ref_idc=ref,
                                 payload_bytes=48 + 8 * k, rng=rng)
            frame_num += 1
    out += aud_nal(7)  # closing AUD so the last picture flushes at EOF
    return bytes(out)
