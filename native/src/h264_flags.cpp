// H.264 elementary-stream access-unit analyzer ("flags264" equivalent).
//
// Behavior contract: byte-identical stdout to the reference tool
// /root/reference/flags264.c for well-formed input (verified in
// tests/test_native_h264.py against the reference binary).  The reference is
// a single 1096-line main() with ~50 file-scope locals and a 600-line
// printf ladder; this implementation is a small state machine over explicit
// structs with a compositional one-line picture printer.  Reference quirks
// that are part of the observable contract are kept and marked [QUIRK].
//
// Scan model (same algorithm as the reference, which is the right one for a
// streaming scanner): a 32-bit shift register detects start codes with no
// NAL buffering; payloads of the three NAL types we decode (SPS, SEI, coded
// slice) are captured byte-by-byte with inline emulation-prevention removal
// and parsed when the *next* start code closes them.

#include <cinttypes>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

#include "dtv/bitreader.hpp"

namespace dtv {
namespace {

// Capture buffer for one in-flight NAL payload.  `remaining` mirrors the
// reference's countdown registers: SPS/SEI stop capturing after 256 bytes
// and then can no longer be finalized; a slice stops capturing after 255
// bytes but stays armed so the closing start code still parses its header
// (flags264.c:578-600 slice "sticky 1" counter).
struct Capture {
  int remaining = 0;    // 0 = inactive
  bool sticky = false;  // slice mode: clamp countdown at 1, stop appending
  std::vector<uint8_t> bytes;

  bool active() const { return remaining != 0; }
  void arm(bool sticky_mode) {
    remaining = 256;
    sticky = sticky_mode;
    bytes.clear();
  }
  void disarm() { remaining = 0; }
};

struct SpsInfo {  // persistent across SPSes; last one wins
  uint32_t profile_idc = 0;
  uint32_t constraint_set3_flag = 0;
  uint32_t level_idc = 0;
  uint32_t log2_max_frame_num_minus4 = 0;
  uint32_t pic_order_cnt_type = 0;
  uint32_t log2_max_pic_order_cnt_lsb_minus4 = 0;
  uint32_t pic_width_in_mbs_minus1 = 0;
  uint32_t pic_height_in_map_units_minus1 = 0;
  uint32_t frame_mbs_only_flag = 0;
  uint32_t aspect_ratio_idc = 0;
  uint32_t num_units_in_tick = 0;
  uint32_t time_scale = 0;
  uint32_t separate_colour_plane_flag = 0;
  // HRD state shared by SEI parsing
  uint32_t cpb_cnt_minus1 = 0;
  uint32_t bit_rate_scale = 0;  // [QUIRK] only the NAL-HRD branch updates it
  uint32_t bit_rate_value_minus1 = 0;
  uint32_t nal_hrd_present = 0, vcl_hrd_present = 0;
  uint32_t nal_initial_cpb_len = 0, nal_cpb_removal_len = 0, nal_dpb_len = 0;
  uint32_t vcl_initial_cpb_len = 0, vcl_cpb_removal_len = 0, vcl_dpb_len = 0;
  uint32_t pic_struct_present_flag = 0;
};

struct SliceInfo {  // header of the most recent coded slice
  uint32_t slice_type = 0;
  uint32_t frame_num = 0;
  uint32_t field_pic_flag = 0;
  uint32_t bottom_field_flag = 0;
  uint32_t pic_order_cnt_lsb = 0;
  uint32_t nal_ref_idc = 0;
  uint32_t idr = 0;
};

class Flags264 {
 public:
  void feed(const uint8_t* buf, size_t len) {
    for (size_t i = 0; i < len; i++) {
      step(buf[i]);
      offset_++;
    }
  }

  void finish() {
    if (slice_cap_.active()) {
      parse_slice_header();
      slice_cap_.disarm();
    }
    // [QUIRK] the EOF picture line prints even if no AUD was ever seen,
    // using whatever slice header was parsed last (flags264.c:838-1093).
    print_picture(offset_);
  }

 private:
  void step(uint8_t byte) {
    parsed_ = parse_;
    parse_ = (parse_ << 8) | byte;

    if ((parse_ & 0xffffff00u) == 0x00000100u) {
      // A start code closes any in-flight capture.
      if (sps_cap_.active()) {
        parse_sps();
        sps_cap_.disarm();
      }
      if (slice_cap_.active()) {
        parse_slice_header();
        slice_cap_.disarm();
      }
      if (sei_cap_.active()) {
        parse_sei();
        sei_cap_.disarm();
      }
    }

    if (parse_ == 0x00000127u || parse_ == 0x00000147u ||
        parse_ == 0x00000167u) {
      sps_cap_.arm(false);
    } else if (sps_cap_.active()) {
      append(sps_cap_);
    } else if (parse_ == 0x00000106u && seen_sps_) {
      sei_cap_.arm(false);
    } else if (sei_cap_.active()) {
      append(sei_cap_);
    } else if (parse_ == 0x00000101u || parse_ == 0x00000121u ||
               parse_ == 0x00000141u || parse_ == 0x00000161u ||
               parse_ == 0x00000125u || parse_ == 0x00000145u ||
               parse_ == 0x00000165u) {
      pending_ref_idc_ = (parse_ & 0x60u) >> 5;
      pending_idr_ = (parse_ & 0x1fu) == 5;
      slice_cap_.arm(true);
    } else if (slice_cap_.active()) {
      append(slice_cap_);
    } else if (parse_ == 0x00000109u) {
      on_aud();
    }
  }

  void append(Capture& c) {
    if (c.sticky) {
      if (--c.remaining == 0) {
        c.remaining = 1;  // stay armed, stop appending
        return;
      }
    } else {
      --c.remaining;
    }
    // Emulation-prevention removal in the shift-register domain: the 0x03 of
    // 00 00 03 0x is appended, then backed out when the following byte shows
    // it was an emulation byte (flags264.c:541-547).
    if ((parse_ & 0x00ffffffu) == 0x000003u) emulation_ = true;
    if (parse_ >= 0x00000300u && parse_ <= 0x00000303u && emulation_) {
      if (!c.bytes.empty()) c.bytes.pop_back();
      emulation_ = false;
    }
    c.bytes.push_back(static_cast<uint8_t>(parse_ & 0xff));
  }

  void on_aud() {
    // 4-byte vs 3-byte start code: top byte of the previous register value
    // is 0 exactly when a zero preceded the 00 00 01 (flags264.c:600-606).
    uint64_t aud_offset =
        offset_ - (((parsed_ & 0xff000000u) == 0) ? 4 : 3);
    if (!seen_first_aud_) {
      seen_first_aud_ = true;
    } else {
      print_picture(aud_offset);
      prev_aud_offset_ = aud_offset;
    }
  }

  // ---- SPS ----
  void parse_sps() {
    BitReader r(sps_cap_.bytes);
    SpsInfo& s = sps_;
    s.profile_idc = r.bits(8);
    r.skip(3);  // constraint_set0..2
    s.constraint_set3_flag = r.bits(1);
    r.skip(4);  // constraint_set4..5 + reserved
    s.level_idc = r.bits(8);
    uint32_t temp = r.ue();  // seq_parameter_set_id
    switch (s.profile_idc) {
      case 100: case 110: case 122: case 244: case 44: case 83: case 86:
      case 118: case 128: case 138: case 139: case 134: case 135: {
        uint32_t chroma_format_idc = r.ue();
        if (chroma_format_idc == 3) s.separate_colour_plane_flag = r.bits(1);
        r.ue();  // bit_depth_luma_minus8
        r.ue();  // bit_depth_chroma_minus8
        r.bits(1);  // qpprime_y_zero_transform_bypass_flag
        temp = r.bits(1);  // seq_scaling_matrix_present_flag
        // [QUIRK] scaling lists are not skipped by the reference
        // (flags264.c:156-158 "fix me"); inputs with them misparse there too.
        break;
      }
      default:
        break;
    }
    s.log2_max_frame_num_minus4 = r.ue();
    s.pic_order_cnt_type = r.ue();
    if (s.pic_order_cnt_type == 0) {
      s.log2_max_pic_order_cnt_lsb_minus4 = r.ue();
    } else if (temp == 1) {
      // [QUIRK] the reference tests the *previous* scratch value instead of
      // pic_order_cnt_type here (flags264.c:165), so type-1 POC fields are
      // only consumed when that scratch happens to be 1.  Kept verbatim.
      r.bits(1);  // delta_pic_order_always_zero_flag
      r.ue();     // offset_for_non_ref_pic
      r.ue();     // offset_for_top_to_bottom_field
      uint32_t n = r.ue();
      for (uint32_t j = 0; j < n; j++) r.ue();
    }
    r.ue();     // max_num_ref_frames
    r.bits(1);  // gaps_in_frame_num_value_allowed_flag
    s.pic_width_in_mbs_minus1 = r.ue();
    s.pic_height_in_map_units_minus1 = r.ue();
    s.frame_mbs_only_flag = r.bits(1);
    if (!s.frame_mbs_only_flag) r.bits(1);  // mb_adaptive_frame_field_flag
    r.bits(1);  // direct_8x8_inference_flag
    if (r.bits(1)) {  // frame_cropping_flag
      r.ue(); r.ue(); r.ue(); r.ue();
    }
    if (r.bits(1)) {  // vui_parameters_present_flag
      if (r.bits(1)) {  // aspect_ratio_info_present_flag
        s.aspect_ratio_idc = r.bits(8);
        if (s.aspect_ratio_idc == 255) { r.bits(16); r.bits(16); }
      }
    }
    // [QUIRK] the reference parses the rest of the VUI unconditionally, even
    // when vui_parameters_present_flag is 0 (flags264.c:191-257).
    if (r.bits(1)) r.bits(1);  // overscan
    if (r.bits(1)) {           // video_signal_type
      r.bits(3); r.bits(1);
      if (r.bits(1)) { r.bits(8); r.bits(8); r.bits(8); }
    }
    if (r.bits(1)) { r.ue(); r.ue(); }  // chroma_loc_info
    if (r.bits(1)) {  // timing_info_present_flag
      s.num_units_in_tick = r.bits(32);
      s.time_scale = r.bits(32);
      r.bits(1);  // fixed_frame_rate_flag
    }
    s.nal_hrd_present = r.bits(1);
    if (s.nal_hrd_present) {
      s.cpb_cnt_minus1 = r.ue();
      s.bit_rate_scale = r.bits(4);
      r.bits(4);  // cpb_size_scale
      for (uint32_t j = 0; j <= s.cpb_cnt_minus1; j++) {
        s.bit_rate_value_minus1 = r.ue();
        r.ue();     // cpb_size_value_minus1
        r.bits(1);  // cbr_flag
      }
      s.nal_initial_cpb_len = r.bits(5);
      s.nal_cpb_removal_len = r.bits(5);
      s.nal_dpb_len = r.bits(5);
      r.bits(5);  // time_offset_length
    }
    s.vcl_hrd_present = r.bits(1);
    if (s.vcl_hrd_present) {
      s.cpb_cnt_minus1 = r.ue();
      r.bits(4);  // bit_rate_scale [QUIRK: not stored, see SpsInfo]
      r.bits(4);  // cpb_size_scale
      for (uint32_t j = 0; j <= s.cpb_cnt_minus1; j++) {
        s.bit_rate_value_minus1 = r.ue();
        r.ue();
        r.bits(1);
      }
      s.vcl_initial_cpb_len = r.bits(5);
      s.vcl_cpb_removal_len = r.bits(5);
      s.vcl_dpb_len = r.bits(5);
      r.bits(5);
    }
    if (s.nal_hrd_present || s.vcl_hrd_present) r.bits(1);  // low_delay_hrd
    s.pic_struct_present_flag = r.bits(1);

    if (!seen_sps_) print_sequence_summary();
    seen_sps_ = true;
  }

  void print_sequence_summary() const {
    const SpsInfo& s = sps_;
    switch (s.profile_idc) {
      case 66:  printf("Baseline Profile, "); break;
      case 77:  printf("Main Profile, "); break;
      case 88:  printf("Extended Profile, "); break;
      case 100: printf("High Profile, "); break;
      case 110: printf("High 10 Profile, "); break;
      case 122: printf("High 4:2:2 Profile, "); break;
      case 144: printf("High 4:4:4 Profile, "); break;
      default:  printf("Unknown Profile, \n"); break;
    }
    if (s.level_idc == 11 && s.constraint_set3_flag == 1) {
      printf("Level = 1.b\n");
    } else {
      printf("Level = %d.%d\n", s.level_idc / 10, s.level_idc % 10);
    }
    printf("Horizontal Size = %d\n", (s.pic_width_in_mbs_minus1 + 1) * 16);
    // Map units are field-pairs when the stream is interlaced.
    printf("Vertical Size = %d\n", (s.pic_height_in_map_units_minus1 + 1) *
                                       (s.frame_mbs_only_flag ? 16 : 32));
    static const char* kAspect[17] = {
        "Unspecified", "1:1 (square)", "12:11", "10:11", "16:11", "40:33",
        "24:11", "20:11", "32:11", "80:33", "18:11", "15:11", "64:33",
        "160:99", "4:3", "3:2", "2:1"};
    if (s.aspect_ratio_idc <= 16) {
      printf("Aspect ratio = %s\n", kAspect[s.aspect_ratio_idc]);
    } else if (s.aspect_ratio_idc == 255) {
      printf("Aspect ratio = Extended_SAR\n");
    } else {
      printf("Aspect ratio = Reserved\n");
    }
    double rate = (double)s.time_scale / (double)s.num_units_in_tick;
    if (s.frame_mbs_only_flag == 0) {
      printf("Field rate = %2.3f\n", rate);
    } else {
      printf("Frame rate = %2.3f\n", rate / 2.0);
    }
    if (s.nal_hrd_present || s.vcl_hrd_present) {
      printf("Bit rate = %d\n",
             (s.bit_rate_value_minus1 + 1) << (6 + s.bit_rate_scale));
    }
  }

  // ---- coded slice header ----
  void parse_slice_header() {
    BitReader r(slice_cap_.bytes);
    SliceInfo& sl = slice_;
    sl.nal_ref_idc = pending_ref_idc_;
    sl.idr = pending_idr_;
    r.ue();  // first_mb_in_slice
    sl.slice_type = r.ue();
    r.ue();  // pic_parameter_set_id
    if (sps_.separate_colour_plane_flag == 1) r.bits(2);
    sl.frame_num = r.bits(sps_.log2_max_frame_num_minus4 + 4);
    if (!sps_.frame_mbs_only_flag) {
      sl.field_pic_flag = r.bits(1);
      if (sl.field_pic_flag) sl.bottom_field_flag = r.bits(1);
    }
    if (sl.idr) r.ue();  // idr_pic_id
    if (sps_.pic_order_cnt_type == 0) {
      sl.pic_order_cnt_lsb =
          r.bits(sps_.log2_max_pic_order_cnt_lsb_minus4 + 4);
    }
  }

  // ---- SEI ----
  void parse_sei() {
    // Captured bytes end with the SEI rbsp trailing byte plus the 3 or 4
    // start-code bytes of the closing NAL; trim them (flags264.c:407-413).
    long idx = static_cast<long>(sei_cap_.bytes.size()) * 8;
    idx -= ((parsed_ & 0xff000000u) == 0) ? 40 : 32;
    BitReader r(sei_cap_.bytes);
    const SpsInfo& s = sps_;
    if (idx <= 0) return;
    do {
      uint32_t payload_type = 0;
      while (r.peek(8) == 0xff) { r.bits(8); idx -= 8; payload_type += 255; }
      payload_type += r.bits(8);
      idx -= 8;
      long payload_bits = 0;
      while (r.peek(8) == 0xff) { r.bits(8); idx -= 8; payload_bits += 255; }
      payload_bits += r.bits(8);
      idx -= 8;
      payload_bits *= 8;
      switch (payload_type) {
        case 0: {  // buffering_period
          uint64_t before = r.bit_pos();
          r.ue();  // seq_parameter_set_id
          long used = static_cast<long>(r.bit_pos() - before);
          idx -= used;
          payload_bits -= used;
          if (s.nal_hrd_present) {
            for (uint32_t j = 0; j <= s.cpb_cnt_minus1; j++) {
              r.bits(s.nal_initial_cpb_len + 1);
              r.bits(s.nal_initial_cpb_len + 1);
              idx -= 2 * (s.nal_initial_cpb_len + 1);
              payload_bits -= 2 * (s.nal_initial_cpb_len + 1);
            }
          }
          if (s.vcl_hrd_present) {
            for (uint32_t j = 0; j <= s.cpb_cnt_minus1; j++) {
              r.bits(s.vcl_initial_cpb_len + 1);
              r.bits(s.vcl_initial_cpb_len + 1);
              idx -= 2 * (s.vcl_initial_cpb_len + 1);
              payload_bits -= 2 * (s.vcl_initial_cpb_len + 1);
            }
          }
          r.skip(payload_bits);
          idx -= payload_bits;
          break;
        }
        case 1: {  // pic_timing
          if (s.nal_hrd_present || s.vcl_hrd_present) {
            r.bits(s.nal_cpb_removal_len + 1);
            r.bits(s.nal_dpb_len + 1);
            idx -= (s.nal_cpb_removal_len + 1) + (s.nal_dpb_len + 1);
            payload_bits -= (s.nal_cpb_removal_len + 1) + (s.nal_dpb_len + 1);
          }
          if (s.pic_struct_present_flag) {
            pic_struct_ = r.bits(4);
            idx -= 4;
            payload_bits -= 4;
          }
          r.skip(payload_bits);
          idx -= payload_bits;
          break;
        }
        case 4: {  // user_data_registered_itu_t_t35
          long j = 1;
          if (r.bits(8) == 0xff) { r.bits(8); j = 2; }
          while (j < payload_bits / 8) { r.bits(8); j++; }
          idx -= j * 8;
          payload_bits -= j * 8;
          r.skip(payload_bits);
          idx -= payload_bits;
          break;
        }
        case 5:  // user_data_unregistered
          r.skip(payload_bits);
          idx -= payload_bits;
          break;
        case 6: {  // recovery_point
          uint64_t before = r.bit_pos();
          r.ue();  // recovery_frame_cnt
          long used = static_cast<long>(r.bit_pos() - before);
          idx -= used;
          payload_bits -= used;
          r.bits(4);
          idx -= 4;
          payload_bits -= 4;
          r.skip(payload_bits);
          idx -= payload_bits;
          break;
        }
        default:
          r.skip(payload_bits);
          idx -= payload_bits;
          break;
      }
    } while (idx > 0);
  }

  // ---- picture line ----
  void print_picture(uint64_t end_offset) const {
    const SliceInfo& sl = slice_;
    // Base label: I/IDR/P/B/b/SP/SI; lowercase b = non-reference B.
    const char* label;
    bool idr_style = false;  // IDR lines print POC with %d instead of %3d
    switch (sl.slice_type % 5) {
      case 0: label = "P"; break;
      case 1: label = sl.nal_ref_idc == 0 ? "b" : "B"; break;
      case 2:
        if (sl.idr) { label = "IDR"; idr_style = true; }
        else { label = "I"; }
        break;
      case 3: label = "SP"; break;
      case 4: label = "SI"; break;
      default: return;
    }
    if (sl.slice_type > 9) return;  // reference prints nothing
    char structure[16];
    if (sps_.frame_mbs_only_flag == 0) {
      if (sl.field_pic_flag) {
        snprintf(structure, sizeof structure, "%s field",
                 sl.bottom_field_flag ? "bot" : "top");
      } else {
        // Frame-coded picture in an interlaced sequence: pulldown cadence
        // from the last pic_timing SEI; other pic_struct values print no
        // line at all in the reference (no default case).
        switch (pic_struct_) {
          case 3: strcpy(structure, "tb  frame"); break;
          case 4: strcpy(structure, "bt  frame"); break;
          case 5: strcpy(structure, "tbt frame"); break;
          case 6: strcpy(structure, "btb frame"); break;
          default: return;
        }
      }
    } else {
      strcpy(structure, "frame");
    }
    if (idr_style) {
      printf("%s %s POC = %d, Pic# = %3d, position = %" PRIu64
             ", bits = %" PRIu64 "\n",
             label, structure, sl.pic_order_cnt_lsb, sl.frame_num,
             prev_aud_offset_, (end_offset - prev_aud_offset_) * 8);
    } else {
      printf("%s %s POC = %3d, Pic# = %3d, position = %" PRIu64
             ", bits = %" PRIu64 "\n",
             label, structure, sl.pic_order_cnt_lsb, sl.frame_num,
             prev_aud_offset_, (end_offset - prev_aud_offset_) * 8);
    }
  }

  uint32_t parse_ = 0, parsed_ = 0;
  uint64_t offset_ = 0, prev_aud_offset_ = 0;
  bool seen_sps_ = false, seen_first_aud_ = false, emulation_ = false;
  uint32_t pending_ref_idc_ = 0, pending_idr_ = 0;
  uint32_t pic_struct_ = 0;
  Capture sps_cap_, slice_cap_, sei_cap_;
  SpsInfo sps_;
  SliceInfo slice_;
};

}  // namespace

int flags264_main(int argc, char** argv) {
  if (argc != 2) {
    fprintf(stderr, "usage: flags264 <infile>\n");
    return -1;
  }
  FILE* fp = fopen(argv[1], "rb");
  if (!fp) {
    fprintf(stderr, "Cannot open input file <%s>\n", argv[1]);
    return -1;
  }
  Flags264 an;
  std::vector<uint8_t> buf(16384);
  size_t n;
  while ((n = fread(buf.data(), 1, buf.size(), fp)) > 0) an.feed(buf.data(), n);
  an.finish();
  fclose(fp);
  return 0;
}

}  // namespace dtv
