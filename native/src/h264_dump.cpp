// Verbose H.264 elementary-stream NAL dumper ("h264_parse" equivalent).
//
// Behavior contract: byte-identical stdout to the reference tool built from
// /root/reference/h264_parse/ (MPEG4IP-derived) for well-formed input,
// including its banner, per-NAL headers, every printed syntax element, the
// §7.4.1.2.4 picture-boundary report, and its observable quirks [QUIRK].
// Clean-room structure: one bounds-checked ThrowingReader (vs CBitstream),
// table-driven label printing, explicit DecoderState struct.

#include <cctype>
#include <cinttypes>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace dtv {
namespace {

constexpr size_t kMaxBuffer = 65536 * 8;

enum class BitstreamErr { kPastEnd, kTooManyBits };

// Bounds-checked MSB-first reader with the reference CBitstream's error
// semantics (mpeg4ip_bitstream.h:30-33): >32 bits per read throws
// kTooManyBits, reading past the end throws kPastEnd.
class ThrowingReader {
 public:
  ThrowingReader(const uint8_t* data, uint64_t n_bits)
      : data_(data), n_bits_(n_bits) {}

  uint64_t bits_remain() const { return n_bits_ - pos_; }

  uint32_t get(unsigned n) {
    if (n > 32) throw BitstreamErr::kTooManyBits;
    if (n > bits_remain()) throw BitstreamErr::kPastEnd;
    uint32_t v = 0;
    for (unsigned i = 0; i < n; i++) {
      v = (v << 1) | ((data_[pos_ >> 3] >> (7 - (pos_ & 7))) & 1);
      ++pos_;
    }
    return v;
  }

  uint32_t peek(unsigned n) {
    uint64_t saved = pos_;
    uint32_t v = get(n);
    pos_ = saved;
    return v;
  }

  // Exp-Golomb ue(v) with the reference's byte-chunked zero scan
  // (main.cpp:54-86): identical values AND identical throw behavior at
  // stream end (final get(zeros+1) is what trips kPastEnd/kTooManyBits).
  uint32_t ue() {
    unsigned zeros = 0;
    for (;;) {
      uint64_t left = bits_remain();
      uint32_t read;
      if (left < 8) {
        read = peek(left) << (8 - left);
      } else {
        read = peek(8);
        if (read == 0) {
          get(8);
          zeros += 8;
          continue;
        }
      }
      unsigned coded = 0;
      for (uint32_t bit = 0x80; coded < 8 && !(read & bit); bit >>= 1) coded++;
      get(coded);
      zeros += coded;
      break;
    }
    return get(zeros + 1) - 1;
  }

  int32_t se() {
    uint32_t v = ue();
    if ((v & 1) == 0) return -static_cast<int32_t>(v >> 1);
    return static_cast<int32_t>((v + 1) >> 1);
  }

 private:
  const uint8_t* data_;
  uint64_t n_bits_;
  uint64_t pos_ = 0;
};

struct DecoderState {  // persistent across NALs, zero-initialized
  uint32_t profile = 0;
  uint32_t chroma_format_idc = 0;
  uint32_t log2_max_frame_num_minus4 = 0;
  uint32_t log2_max_pic_order_cnt_lsb_minus4 = 0;
  uint32_t pic_order_cnt_type = 0;
  uint32_t delta_pic_order_always_zero_flag = 0;
  uint32_t frame_mbs_only_flag = 0;
  uint32_t pic_order_present_flag = 0;  // from PPS
  uint32_t pic_struct_present_flag = 0;
  uint32_t cpb_cnt_minus1 = 0;
  uint32_t initial_cpb_removal_delay_length_minus1 = 0;
  uint32_t cpb_removal_delay_length_minus1 = 0;
  uint32_t dpb_output_delay_length_minus1 = 0;
  uint32_t time_offset_length = 0;
  uint32_t nal_hrd_bp_present = 0, vcl_hrd_bp_present = 0;
  uint32_t cpb_dpb_delays_present = 0;
  // per-slice (picture-boundary comparison per H.264 §7.4.1.2.4)
  uint32_t nal_ref_idc = 0;
  uint32_t nal_unit_type = 0;
  uint32_t frame_num = 0;
  uint32_t field_pic_flag = 0;
  uint32_t bottom_field_flag = 0;
  uint32_t idr_pic_id = 0;
  uint32_t pic_order_cnt_lsb = 0;
  int32_t delta_pic_order_cnt_bottom = 0;
  int32_t delta_pic_order_cnt[2] = {0, 0};
};

void check_0s(ThrowingReader& bs, int count) {
  uint32_t val = bs.get(count);
  if (val != 0) {
    printf("field error - %d bits should be 0 is %x\n", count, val);
  }
}

void hrd_parameters(DecoderState& dec, ThrowingReader& bs) {
  uint32_t cpb_cnt = dec.cpb_cnt_minus1 = bs.ue();
  printf("     cpb_cnt_minus1: %u\n", cpb_cnt);
  printf("     bit_rate_scale: %u\n", bs.get(4));
  printf("     cpb_size_scale: %u\n", bs.get(4));
  for (uint32_t ix = 0; ix <= cpb_cnt; ix++) {
    printf("      bit_rate_value_minus1[%u]: %u\n", ix, bs.ue());
    printf("      cpb_size_value_minus1[%u]: %u\n", ix, bs.ue());
    printf("      cbr_flag[%u]: %u\n", ix, bs.get(1));
  }
  uint32_t temp = dec.initial_cpb_removal_delay_length_minus1 = bs.get(5);
  printf("     initial_cpb_removal_delay_length_minus1: %u\n", temp);
  dec.cpb_removal_delay_length_minus1 = temp = bs.get(5);
  printf("     cpb_removal_delay_length_minus1: %u\n", temp);
  dec.dpb_output_delay_length_minus1 = temp = bs.get(5);
  printf("     dpb_output_delay_length_minus1: %u\n", temp);
  dec.time_offset_length = temp = bs.get(5);
  printf("     time_offset_length: %u\n", temp);
}

void vui_parameters(DecoderState& dec, ThrowingReader& bs) {
  uint32_t temp = bs.get(1);
  printf("    aspect_ratio_info_present_flag: %u\n", temp);
  if (temp) {
    temp = bs.get(8);
    printf("     aspect_ratio_idc:%u\n", temp);  // [QUIRK] no space
    if (temp == 0xff) {
      printf("      sar_width: %u\n", bs.get(16));
      printf("      sar_height: %u\n", bs.get(16));
    }
  }
  temp = bs.get(1);
  printf("    overscan_info_present_flag: %u\n", temp);
  if (temp) printf("     overscan_appropriate_flag: %u\n", bs.get(1));
  temp = bs.get(1);
  printf("    video_signal_info_present_flag: %u\n", temp);
  if (temp) {
    printf("     video_format: %u\n", bs.get(3));
    printf("     video_full_range_flag: %u\n", bs.get(1));
    temp = bs.get(1);
    printf("     colour_description_present_flag: %u\n", temp);
    if (temp) {
      printf("      colour_primaries: %u\n", bs.get(8));
      printf("      transfer_characteristics: %u\n", bs.get(8));
      printf("      matrix_coefficients: %u\n", bs.get(8));
    }
  }
  temp = bs.get(1);
  printf("    chroma_loc_info_present_flag: %u\n", temp);
  if (temp) {
    printf("     chroma_sample_loc_type_top_field: %u\n", bs.ue());
    printf("     chroma_sample_loc_type_bottom_field: %u\n", bs.ue());
  }
  temp = bs.get(1);
  printf("    timing_info_present_flag: %u\n", temp);
  if (temp) {
    printf("     num_units_in_tick: %u\n", bs.get(32));
    printf("     time_scale: %u\n", bs.get(32));
    printf("     fixed_frame_scale: %u\n", bs.get(1));
  }
  temp = bs.get(1);
  printf("    nal_hrd_parameters_present_flag: %u\n", temp);
  if (temp) {
    dec.nal_hrd_bp_present = 1;
    dec.cpb_dpb_delays_present = 1;
    hrd_parameters(dec, bs);
  }
  uint32_t temp2 = bs.get(1);
  printf("    vcl_hrd_parameters_present_flag: %u\n", temp2);
  if (temp2) {
    dec.vcl_hrd_bp_present = 1;
    dec.cpb_dpb_delays_present = 1;
    hrd_parameters(dec, bs);
  }
  if (temp || temp2) printf("    low_delay_hrd_flag: %u\n", bs.get(1));
  dec.pic_struct_present_flag = temp = bs.get(1);
  printf("    pic_struct_present_flag: %u\n", temp);
  temp = bs.get(1);  // bitstream_restriction_flag (not printed)
  if (temp) {
    printf("    motion_vectors_over_pic_boundaries_flag: %u\n", bs.get(1));
    printf("    max_bytes_per_pic_denom: %u\n", bs.ue());
    printf("    max_bits_per_mb_denom: %u\n", bs.ue());
    printf("    log2_max_mv_length_horizontal: %u\n", bs.ue());
    printf("    log2_max_mv_length_vertical: %u\n", bs.ue());
    printf("    num_reorder_frames: %u\n", bs.ue());
    printf("     max_dec_frame_buffering: %u\n", bs.ue());
  }
}

uint32_t ceil_log2(uint32_t val) {
  uint32_t ix = 0, cval = 1;
  while (ix < 32) {
    if (cval >= val) return ix;
    cval <<= 1;
    ix++;
  }
  return ix;
}

void scaling_list(uint32_t ix, uint32_t size, ThrowingReader& bs) {
  uint32_t last_scale = 8, next_scale = 8;
  for (uint32_t jx = 0; jx < size; jx++) {
    if (next_scale != 0) {
      int32_t delta = bs.se();
      next_scale = (last_scale + delta + 256) % 256;
      printf("     delta: %d\n", delta);
    }
    if (next_scale != 0) last_scale = next_scale;
    printf("     scaling list[%u][%u]: %u\n", ix, jx, last_scale);
  }
}

void parse_sps(DecoderState& dec, ThrowingReader& bs) {
  uint32_t temp;
  dec.profile = bs.get(8);
  printf("   profile: %u\n", dec.profile);
  // [QUIRK] reference typo "constaint" kept
  printf("   constaint_set0_flag: %d\n", bs.get(1));
  printf("   constaint_set1_flag: %d\n", bs.get(1));
  printf("   constaint_set2_flag: %d\n", bs.get(1));
  printf("   constaint_set3_flag: %d\n", bs.get(1));
  check_0s(bs, 4);
  printf("   level_idc: %u\n", bs.get(8));
  printf("   seq parameter set id: %u\n", bs.ue());
  if (dec.profile == 100 || dec.profile == 110 || dec.profile == 122 ||
      dec.profile == 144) {
    dec.chroma_format_idc = bs.ue();
    printf("   chroma format idx: %u\n", dec.chroma_format_idc);
    if (dec.chroma_format_idc == 3) {
      printf("    resigual colour transform flag: %u\n", bs.get(1));
    }
    uint32_t bit_depth_luma_minus8 = bs.ue();
    printf("   bit depth luma minus8: %u\n", bit_depth_luma_minus8);
    bs.ue();  // bit_depth_chroma_minus8
    // [QUIRK] the reference prints the luma value on the chroma line
    printf("   bit depth chroma minus8: %u\n", bit_depth_luma_minus8);
    printf("   Qpprime Y Zero Transform Bypass flag: %u\n", bs.get(1));
    uint32_t scaling_present = bs.get(1);
    printf("   Seq Scaling Matrix Present Flag: %u\n", scaling_present);
    if (scaling_present) {
      for (uint32_t ix = 0; ix < 8; ix++) {
        temp = bs.get(1);
        printf("   Seq Scaling List[%u] Present Flag: %u\n", ix, temp);
        if (temp) scaling_list(ix, ix < 6 ? 16 : 64, bs);
      }
    }
  }
  dec.log2_max_frame_num_minus4 = bs.ue();
  printf("   log2_max_frame_num_minus4: %u\n", dec.log2_max_frame_num_minus4);
  dec.pic_order_cnt_type = bs.ue();
  printf("   pic_order_cnt_type: %u\n", dec.pic_order_cnt_type);
  if (dec.pic_order_cnt_type == 0) {
    dec.log2_max_pic_order_cnt_lsb_minus4 = bs.ue();
    printf("    log2_max_pic_order_cnt_lsb_minus4: %u\n",
           dec.log2_max_pic_order_cnt_lsb_minus4);
  } else if (dec.pic_order_cnt_type == 1) {
    dec.delta_pic_order_always_zero_flag = bs.get(1);
    printf("    delta_pic_order_always_zero_flag: %u\n",
           dec.delta_pic_order_always_zero_flag);
    printf("    offset_for_non_ref_pic: %d\n", bs.se());
    printf("    offset_for_top_to_bottom_field: %d\n", bs.se());
    temp = bs.ue();
    for (uint32_t ix = 0; ix < temp; ix++) {
      printf("      offset_for_ref_frame[%u]: %d\n", ix, bs.se());
    }
  }
  printf("   num_ref_frames: %u\n", bs.ue());
  printf("   gaps_in_frame_num_value_allowed_flag: %u\n", bs.get(1));
  uint32_t pic_width_in_mbs = bs.ue() + 1;
  printf("   pic_width_in_mbs_minus1: %u (%u)\n", pic_width_in_mbs - 1,
         pic_width_in_mbs * 16);
  uint32_t pic_height_in_map_units = bs.ue() + 1;
  printf("   pic_height_in_map_minus1: %u\n", pic_height_in_map_units - 1);
  dec.frame_mbs_only_flag = bs.get(1);
  printf("   frame_mbs_only_flag: %u\n", dec.frame_mbs_only_flag);
  printf("     derived height: %u\n",
         (2 - dec.frame_mbs_only_flag) * pic_height_in_map_units * 16);
  if (!dec.frame_mbs_only_flag) {
    printf("    mb_adaptive_frame_field_flag: %u\n", bs.get(1));
  }
  printf("   direct_8x8_inference_flag: %u\n", bs.get(1));
  temp = bs.get(1);
  printf("   frame_cropping_flag: %u\n", temp);
  if (temp) {
    printf("     frame_crop_left_offset: %u\n", bs.ue());
    printf("     frame_crop_right_offset: %u\n", bs.ue());
    printf("     frame_crop_top_offset: %u\n", bs.ue());
    printf("     frame_crop_bottom_offset: %u\n", bs.ue());
  }
  temp = bs.get(1);
  printf("   vui_parameters_present_flag: %u\n", temp);
  if (temp) vui_parameters(dec, bs);
}

void parse_seq_ext(ThrowingReader& bs) {
  printf("   seq_parameter_set_id: %u\n", bs.ue());
  uint32_t temp = bs.ue();
  printf("   aux format idc: %u\n", temp);
  if (temp != 0) {
    temp = bs.ue();
    printf("    bit depth aux minus8:%u\n", temp);
    printf("    alpha incr flag:%u\n", bs.get(1));
    printf("    alpha opaque value: %u\n", bs.get(temp + 9));
    printf("    alpha transparent value: %u\n", bs.get(temp + 9));
  }
  printf("   additional extension flag: %u\n", bs.get(1));
}

constexpr uint8_t kTrailingBits[9] = {0,    0x1,  0x2,  0x4, 0x8,
                                      0x10, 0x20, 0x40, 0x80};

void parse_pps(DecoderState& dec, ThrowingReader& bs) {
  printf("   pic_parameter_set_id: %u\n", bs.ue());
  printf("   seq_parameter_set_id: %u\n", bs.ue());
  printf("   entropy_coding_mode_flag: %u\n", bs.get(1));
  dec.pic_order_present_flag = bs.get(1);
  printf("   pic_order_present_flag: %u\n", dec.pic_order_present_flag);
  uint32_t num_slice_groups = bs.ue();
  printf("   num_slice_groups_minus1: %u\n", num_slice_groups);
  if (num_slice_groups > 0) {
    uint32_t map_type = bs.ue();
    printf("    slice_group_map_type: %u\n", map_type);
    if (map_type == 0) {
      for (uint32_t g = 0; g <= num_slice_groups; g++) {
        printf("     run_length_minus1[%u]: %u\n", g, bs.ue());
      }
    } else if (map_type == 2) {
      for (uint32_t g = 0; g < num_slice_groups; g++) {
        printf("     top_left[%u]: %u\n", g, bs.ue());
        printf("     bottom_right[%u]: %u\n", g, bs.ue());
      }
    } else if (map_type < 6) {
      printf("     slice_group_change_direction_flag: %u\n", bs.get(1));
      printf("     slice_group_change_rate_minus1: %u\n", bs.ue());
    } else if (map_type == 6) {
      uint32_t count = bs.ue();
      printf("     pic_size_in_map_units_minus1: %u\n", count);
      uint32_t bits = ceil_log2(num_slice_groups + 1);
      printf("     bits - %u\n", bits);
      for (uint32_t g = 0; g <= count; g++) {
        printf("      slice_group_id[%u]: %u\n", g, bs.get(bits));
      }
    }
  }
  printf("   num_ref_idx_l0_active_minus1: %u\n", bs.ue());
  printf("   num_ref_idx_l1_active_minus1: %u\n", bs.ue());
  printf("   weighted_pred_flag: %u\n", bs.get(1));
  printf("   weighted_bipred_idc: %u\n", bs.get(2));
  printf("   pic_init_qp_minus26: %d\n", bs.se());
  printf("   pic_init_qs_minus26: %d\n", bs.se());
  printf("   chroma_qp_index_offset: %d\n", bs.se());
  printf("   deblocking_filter_control_present_flag: %u\n", bs.get(1));
  printf("   constrained_intra_pred_flag: %u\n", bs.get(1));
  printf("   redundant_pic_cnt_present_flag: %u\n", bs.get(1));
  uint64_t bits = bs.bits_remain();
  if (bits == 0) return;
  if (bits <= 8) {
    uint8_t trail_check = bs.peek(bits);
    if (trail_check == kTrailingBits[bits]) return;
  }
  uint8_t transform_8x8 = bs.get(1);
  printf("   transform_8x8_mode_flag: %u\n", transform_8x8);
  uint32_t temp = bs.get(1);
  printf("   pic_scaling_matrix_present_flag: %u\n", temp);
  if (temp) {
    uint32_t max_count = 6 + 2 * transform_8x8;
    for (uint32_t ix = 0; ix < max_count; ix++) {
      temp = bs.get(1);
      printf("   Pic Scaling List[%u] Present Flag: %u\n", ix, temp);
      if (temp) scaling_list(ix, ix < 6 ? 16 : 64, bs);
    }
  }
  printf("   second_chroma_qp_index_offset: %u\n", bs.se());
}

constexpr const char* kSeiNames[19] = {
    "buffering_period",
    "pic_timing",
    "pan_scan_rect",
    "filler_payload",
    "user_data_registered_itu_t_t35",
    "user_data_unregistered",
    "recovery_point",
    "dec_ref_pic_marking_repetition",
    "spare_pic",
    "scene_info",
    "sub_seq_info",
    "sub_seq-layer_characteristics",
    "full_frame_freeze",
    "full_frame_freeze_release",
    "full_frame_snapshot",
    "progressive_refinement_segment_start",
    "progressive_refinement_segment_end",
    "motioned_constrained_slice_group_set",
};

void parse_sei(DecoderState& dec, ThrowingReader& bs) {
  std::vector<uint8_t> payload;
  std::string printable;
  while (bs.bits_remain() >= 16) {
    uint32_t payload_type = 0, read_val;
    while ((read_val = bs.get(8)) == 0xff) payload_type += 255;
    payload_type += read_val;
    uint32_t payload_size = 0;
    while ((read_val = bs.get(8)) == 0xff) payload_size += 255;
    payload_size += read_val;
    const char* name =
        payload_type <= 18 ? kSeiNames[payload_type] : "unknown value";
    printf("   payload_type: %u %s\n", payload_type, name);
    printf("   payload_size: %u", payload_size);
    payload.clear();
    printable.clear();
    if (payload_size > 8) printf("\n   ");
    bool is_printable = true;
    for (uint32_t count = payload_size, ix = 0; count > 0; count--) {
      uint8_t b = bs.get(8);
      payload.push_back(b);
      if (isprint(b)) {
        printable.push_back(static_cast<char>(b));
      } else {
        printable.push_back('.');
        is_printable = false;
      }
      ++ix;
      printf(" 0x%x", b);
      if ((ix % 8) == 0) printf("\n   ");
    }
    printf("\n");
    if (is_printable || payload_type == 4 || payload_type == 5) {
      printf("    string is \"%s\"\n", printable.c_str());
    }
    try {
      ThrowingReader pb(payload.data(), uint64_t{payload_size} * 8);
      switch (payload_type) {
        case 0:
          printf("    seq_parameter_set_id: %u\n", pb.ue());
          if (dec.nal_hrd_bp_present) {
            for (uint32_t ix = 0; ix <= dec.cpb_cnt_minus1; ix++) {
              printf("    initial_cpb_removal_delay[%u]: %u\n", ix,
                     pb.get(dec.initial_cpb_removal_delay_length_minus1 + 1));
              printf("    initial_cpb_removal_delay_offset[%u]: %u\n", ix,
                     pb.get(dec.initial_cpb_removal_delay_length_minus1 + 1));
            }
          }
          if (dec.vcl_hrd_bp_present) {
            for (uint32_t ix = 0; ix <= dec.cpb_cnt_minus1; ix++) {
              printf("    initial_cpb_removal_delay[%u]: %u\n", ix,
                     pb.get(dec.initial_cpb_removal_delay_length_minus1 + 1));
              printf("    initial_cpb_removal_delay_offset[%u]: %u\n", ix,
                     pb.get(dec.initial_cpb_removal_delay_length_minus1 + 1));
            }
          }
          break;
        case 1: {
          if (dec.cpb_dpb_delays_present) {
            printf("    cpb_removal_delay: %u\n",
                   pb.get(dec.cpb_removal_delay_length_minus1 + 1));
            printf("    dpb_output_delay: %u\n",
                   pb.get(dec.dpb_output_delay_length_minus1 + 1));
          }
          if (dec.pic_struct_present_flag) {
            uint32_t pic_struct = pb.get(4);
            printf("    pict_struct: %u\n", pic_struct);
            uint32_t n_clock_ts = 0;
            if (pic_struct < 3) n_clock_ts = 1;
            else if (pic_struct < 5 || pic_struct == 7) n_clock_ts = 2;
            else if (pic_struct < 9) n_clock_ts = 3;
            for (uint32_t ix = 0; ix < n_clock_ts; ix++) {
              uint32_t flag = pb.get(1);
              printf("    clock_timestamp_flag[%u]: %u\n", ix, flag);
              if (flag) {
                printf("     ct_type: %u\n", pb.get(2));
                printf("     nuit_field_base_flag: %u\n", pb.get(1));
                printf("     counting_type: %u\n", pb.get(5));
                uint32_t full_ts = pb.get(1);
                printf("     full_timestamp_flag: %u\n", full_ts);
                printf("     discontinuity_flag: %u\n", pb.get(1));
                printf("     cnt_dropped_flag: %u\n", pb.get(1));
                printf("     n_frame: %u\n", pb.get(8));
                if (full_ts) {
                  printf("     seconds_value: %u\n", pb.get(6));
                  printf("     minutes_value: %u\n", pb.get(6));
                  printf("     hours_value: %u\n", pb.get(5));
                } else {
                  uint32_t f = pb.get(1);
                  printf("     seconds_flag: %u\n", f);
                  if (f) {
                    printf("     seconds_value: %u\n", pb.get(6));
                    f = pb.get(1);
                    printf("     minutes_flag: %u\n", f);
                    if (f) {
                      printf("     minutes_value: %u\n", pb.get(6));
                      f = pb.get(1);
                      printf("     hours_flag: %u\n", f);
                      if (f) printf("     hours_value: %u\n", pb.get(5));
                    }
                  }
                }
                if (dec.time_offset_length > 0) {
                  printf("     time_offset: %d\n",
                         pb.get(dec.time_offset_length));
                }
              }
            }
          }
          break;
        }
        case 2: {
          printf("    pan_scan_rect_id: %u\n", pb.ue());
          uint32_t cancel = pb.get(1);
          printf("    pan_scan_rect_cancel_flag: %u\n", cancel);
          if (!cancel) {
            uint32_t cnt = pb.ue();
            printf("     pan_scan_cnd_minus1: %u\n", cnt);
            for (uint32_t ix = 0; ix <= cnt; ix++) {
              // [QUIRK] reference prints se(v) offsets with %u
              printf("      pan_scan_rect_left_offset[%u]: %u\n", ix,
                     pb.se());
              printf("      pan_scan_rect_right_offset[%u]: %u\n", ix,
                     pb.se());
              printf("      pan_scan_rect_top_offset[%u]: %u\n", ix, pb.se());
              printf("      pan_scan_rect_bottom_offset[%u]: %u\n", ix,
                     pb.se());
            }
            printf("      pan_scan_rect_repitition_period: %u\n", pb.ue());
          }
          break;
        }
        case 6:
          printf("    recovery_frame_cnt: %u\n", pb.ue());
          printf("    exact_match_flag: %u\n", pb.get(1));
          printf("    broken_link_flag: %u\n", pb.get(1));
          printf("    changing_slice_group_idc: %u\n", pb.get(2));
          break;
        case 7:
          printf("    original_idr_flag: %u\n", pb.get(1));
          printf("    original_frame_num: %u\n", pb.ue());
          if (!dec.frame_mbs_only_flag) {
            uint32_t f = pb.get(1);
            printf("    original_field_pic_flag: %u\n", f);
            if (f) {
              printf("     original_bottom_field_flag: %u\n", pb.get(1));
            }
          }
          break;
        case 8: {
          printf("    target_frame_num: %u\n", pb.ue());
          uint32_t spare_field_flag = pb.get(1);
          printf("    spare_field_flag: %u\n", spare_field_flag);
          if (spare_field_flag) {
            printf("     target_bottom_field_flag: %u\n", pb.get(1));
          }
          printf("    num_spare_pics_minus1: %u\n", pb.ue());
          break;
        }
        case 9: {
          uint32_t present = pb.get(1);
          printf("    scene_info_present_flag: %u\n", present);
          if (present) {
            printf("     scene_id: %u\n", pb.ue());
            uint32_t transition = pb.ue();
            printf("     scene_transition_type: %u\n", transition);
            if (transition > 3) {
              printf("      second_scene_id: %u\n", pb.ue());
            }
          }
          break;
        }
        default:
          break;
      }
    } catch (BitstreamErr err) {
      printf("\nERROR reading bitstream %s\n\n",
             err == BitstreamErr::kPastEnd ? "read past payload end"
                                           : "too many bits requested");
    }
  }
}

constexpr const char* kNalNames[13] = {
    "Coded slice of non-IDR picture",
    "Coded slice data partition A",
    "Coded slice data partition B",
    "Coded slice data partition C",
    "Coded slice of an IDR picture",
    "SEI",
    "Sequence parameter set",
    "Picture parameter set",
    "Access unit delimeter",  // [QUIRK] reference typo kept
    "End of Sequence",
    "end of stream",
    "filler data",
    "Sequence parameter set extension",
};

const char* nal_unit_type_name(uint8_t type) {
  if (type == 0 || type >= 24) return "unspecified";
  if (type < 14) return kNalNames[type - 1];
  return "reserved";
}

constexpr const char* kSliceTypeNames[10] = {"P",  "B",  "I", "SP", "SI",
                                             "P",  "B",  "I", "SP", "SI"};

void slice_header(DecoderState& dec, ThrowingReader& bs) {
  printf("   first_mb_in_slice: %u\n", bs.ue());
  uint32_t stype = bs.ue();
  printf("   slice_type: %u (%s)\n", stype,
         stype < 10 ? kSliceTypeNames[stype] : "invalid");
  printf("   pic_parameter_set_id: %u\n", bs.ue());
  dec.frame_num = bs.get(dec.log2_max_frame_num_minus4 + 4);
  printf("   frame_num: %u (%u bits)\n", dec.frame_num,
         dec.log2_max_frame_num_minus4 + 4);
  dec.field_pic_flag = 0;
  dec.bottom_field_flag = 0;
  dec.delta_pic_order_cnt[0] = 0;
  dec.delta_pic_order_cnt[1] = 0;
  if (!dec.frame_mbs_only_flag) {
    dec.field_pic_flag = bs.get(1);
    printf("   field_pic_flag: %u\n", dec.field_pic_flag);
    if (dec.field_pic_flag) {
      dec.bottom_field_flag = bs.get(1);
      printf("    bottom_field_flag: %u\n", dec.bottom_field_flag);
    }
  }
  if (dec.nal_unit_type == 5) {
    dec.idr_pic_id = bs.ue();
    printf("   idr_pic_id: %u\n", dec.idr_pic_id);
  }
  switch (dec.pic_order_cnt_type) {
    case 0:
      dec.pic_order_cnt_lsb = bs.get(dec.log2_max_pic_order_cnt_lsb_minus4 + 4);
      printf("   pic_order_cnt_lsb: %u\n", dec.pic_order_cnt_lsb);
      if (dec.pic_order_present_flag && !dec.field_pic_flag) {
        dec.delta_pic_order_cnt_bottom = bs.se();
        printf("   delta_pic_order_cnt_bottom: %d\n",
               dec.delta_pic_order_cnt_bottom);
      }
      break;
    case 1:
      if (!dec.delta_pic_order_always_zero_flag) {
        dec.delta_pic_order_cnt[0] = bs.se();
        printf("   delta_pic_order_cnt[0]: %d\n", dec.delta_pic_order_cnt[0]);
      }
      if (dec.pic_order_present_flag && !dec.field_pic_flag) {
        dec.delta_pic_order_cnt[1] = bs.se();
        printf("   delta_pic_order_cnt[1]: %d\n", dec.delta_pic_order_cnt[1]);
      }
      break;
  }
}

uint8_t parse_nal(DecoderState& dec, ThrowingReader& bs) {
  uint8_t type = 0;
  try {
    if (bs.get(24) == 0) bs.get(8);  // 3- or 4-byte start code
    check_0s(bs, 1);
    dec.nal_ref_idc = bs.get(2);
    dec.nal_unit_type = type = bs.get(5);
    printf(" ref %u type %u %s\n", dec.nal_ref_idc, type,
           nal_unit_type_name(type));
    switch (type) {
      case 1:
      case 5:
        slice_header(dec, bs);
        break;
      case 7:
        parse_sps(dec, bs);
        break;
      case 8:
        parse_pps(dec, bs);
        break;
      case 6:
        parse_sei(dec, bs);
        break;
      case 9:
        printf("   primary_pic_type: %u\n", bs.get(3));
        break;
      case 13:
        parse_seq_ext(bs);
        break;
    }
  } catch (BitstreamErr err) {
    printf("\nERROR reading bitstream %s\n\n",
           err == BitstreamErr::kPastEnd ? "read past NAL end"
                                         : "too many bits requested");
  }
  return type;
}

// H.264 §7.4.1.2.4 first-VCL-NAL picture boundary test, with the reference's
// exact field subset (main.cpp:853-895; bottom_field_flag not compared).
bool same_picture(const DecoderState& prev, const DecoderState& on) {
  if (prev.frame_num != on.frame_num) return false;
  if (prev.field_pic_flag != on.field_pic_flag) return false;
  if (prev.nal_ref_idc != on.nal_ref_idc &&
      (prev.nal_ref_idc == 0 || on.nal_ref_idc == 0)) {
    return false;
  }
  if (prev.frame_num == on.frame_num &&
      prev.pic_order_cnt_type == on.pic_order_cnt_type) {
    if (prev.pic_order_cnt_type == 0) {
      if (prev.pic_order_cnt_lsb != on.pic_order_cnt_lsb) return false;
      if (prev.delta_pic_order_cnt_bottom != on.delta_pic_order_cnt_bottom) {
        return false;
      }
    } else if (prev.pic_order_cnt_type == 1) {
      if (prev.delta_pic_order_cnt[0] != on.delta_pic_order_cnt[0]) {
        return false;
      }
      if (prev.delta_pic_order_cnt[1] != on.delta_pic_order_cnt[1]) {
        return false;
      }
    }
  }
  if (prev.nal_unit_type == 5 && on.nal_unit_type == 5 &&
      prev.idr_pic_id != on.idr_pic_id) {
    return false;
  }
  return true;
}

// Returns the offset of the next start code after the one (if any) that the
// buffer begins with; 0 when none found (main.cpp:671-698 semantics).
uint32_t find_next_start_code(const uint8_t* buf, uint32_t len) {
  uint32_t offset = 0;
  if (len > 3 && buf[0] == 0 && buf[1] == 0 && buf[2] == 0 && buf[3] == 1) {
    offset = 4;
  } else if (len > 2 && buf[0] == 0 && buf[1] == 0 && buf[2] == 1) {
    offset = 3;
  }
  uint32_t val = 0xffffffff;
  while (offset + 3 < len) {
    val = (val << 8) | buf[offset];
    offset++;
    if (val == 0x00000001u) return offset - 4;
    if ((val & 0x00ffffffu) == 0x000001u) return offset - 3;
  }
  return 0;
}

// In-place removal of every 0x03 that follows 00 00 (main.cpp:700-716: the
// reference removes unconditionally, not only before 00/01/02/03).
uint32_t remove_emulation(uint8_t* buf, uint32_t len) {
  uint32_t out = 0, in = 0, zeros = 0;
  while (in < len) {
    if (zeros >= 2 && buf[in] == 3 && in + 1 < len) {
      zeros = 0;
      in++;  // drop the emulation byte
      continue;
    }
    zeros = (buf[in] == 0) ? zeros + 1 : 0;
    buf[out++] = buf[in++];
  }
  return out;
}

}  // namespace

int h264_dump_main(int argc, char** argv) {
  const char* prog = argv[0];
  const char* usage = "[-version] <file-name>\n";
  int argi = 1;
  while (argi < argc && argv[argi][0] == '-') {
    std::string opt = argv[argi];
    if (opt == "-v" || opt == "-version" || opt == "--version") {
      fprintf(stderr, "%s - %s version %s\n", prog, "mpeg4ip", "1.5.0.1");
      return 0;
    }
    fprintf(stderr, "usage: %s %s", prog, usage);
    return 0;
  }
  if (argc - argi < 1) {
    fprintf(stderr, "usage: %s %s", prog, usage);
    return 1;
  }
  printf("%s - %s version %s\n", prog, "mpeg4ip", "1.5.0.1");
  FILE* f = fopen(argv[argi], "rb");
  if (!f) {
    fprintf(stderr, "file %s not found\n", prog);  // [QUIRK] prints argv[0]
    return -1;
  }

  // Sliding-window scan with the reference's exact control flow
  // (main.cpp:968-1040): the trailing NAL is never parsed (no start code
  // closes it), and a window with zero complete NALs is a hard error.
  std::vector<uint8_t> buffer(kMaxBuffer);
  uint32_t buffer_on = 0, buffer_size = 0;
  DecoderState dec, prevdec;
  bool have_prevdec = false;
  while (!feof(f)) {
    if (buffer_on != 0) {
      buffer_on = buffer_size - buffer_on;  // retained tail length
      memmove(buffer.data(), buffer.data() + (buffer_size - buffer_on),
              buffer_on);
    }
    buffer_size = static_cast<uint32_t>(
        fread(buffer.data() + buffer_on, 1, kMaxBuffer - buffer_on, f));
    buffer_size += buffer_on;
    buffer_on = 0;

    bool done = false;
    while (!done) {
      uint32_t ret = find_next_start_code(buffer.data() + buffer_on,
                                          buffer_size - buffer_on);
      if (ret == 0) {
        done = true;
        if (buffer_on == 0) {
          fprintf(stderr, "couldn't find start code in buffer from 0\n");
          fclose(f);
          return -1;
        }
      } else {
        if (ret > 3) {
          uint32_t nal_len = remove_emulation(buffer.data() + buffer_on, ret);
          printf("Nal length %u start code %u bytes \n", nal_len,
                 buffer[buffer_on + 2] == 1 ? 3 : 4);
          ThrowingReader bs(buffer.data() + buffer_on, uint64_t{nal_len} * 8);
          uint8_t type = parse_nal(dec, bs);
          if (type >= 1 && type <= 5) {
            if (have_prevdec) {
              bool bound = same_picture(prevdec, dec);
              printf("Nal is %s\n",
                     bound ? "part of last picture" : "new picture");
            }
            prevdec = dec;
            have_prevdec = true;
          } else if (type >= 9 && type <= 11) {
            have_prevdec = false;
          }
        }
        buffer_on += ret;
      }
    }
  }
  fclose(f);
  return 0;
}

}  // namespace dtv
