// ATSC 3.0 L1-signaling decoder ("l1dump" equivalent).
//
// Behavior contract: byte-identical stdout to /root/reference/l1dump.c for
// well-formed base64 L1 captures (verified against the reference binary in
// tests/test_native_l1dump.py).  Clean-room architecture: ONE structured
// parse into explicit L1Basic/Subframe/Plp structs followed by a printer,
// instead of the reference's two full bit-walks over a global cursor.  The
// embedded per-PLP rate calculator shares its A/322 cell tables with the
// Python rates/ oracles via a header generated from
// dtv_utils_tpu/rates/atsc3_tables.py (native/gen_tables.py).
//
// Reference quirks that are part of the observable contract are kept and
// marked [QUIRK].

#include <array>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include "atsc3_tables.inc"

namespace dtv {
namespace {

// ---------------------------------------------------------------- base64 --
int b64_value(char c) {
  if (c >= 'A' && c <= 'Z') return c - 'A';
  if (c >= 'a' && c <= 'z') return c - 'a' + 26;
  if (c >= '0' && c <= '9') return c - '0' + 52;
  if (c == '+') return 62;
  if (c == '/') return 63;
  return -1;
}

bool b64_decode(const std::string& in, std::vector<uint8_t>& out) {
  if (in.empty() || in.size() % 4) return false;
  size_t n = in.size() / 4 * 3;
  if (in[in.size() - 1] == '=') n--;
  if (in[in.size() - 2] == '=') n--;
  out.clear();
  out.reserve(n);
  uint32_t acc = 0;
  int have = 0;
  for (char c : in) {
    if (c == '=') break;
    int v = b64_value(c);
    if (v < 0) return false;
    acc = (acc << 6) | v;
    if (++have == 4) {
      out.push_back(acc >> 16);
      out.push_back(acc >> 8);
      out.push_back(acc);
      acc = have = 0;
    }
  }
  if (have) {  // trailing partial group (with '=' padding)
    acc <<= 6 * (4 - have);
    if (have >= 2) out.push_back(acc >> 16);
    if (have >= 3) out.push_back(acc >> 8);
  }
  out.resize(n);
  return true;
}

// ------------------------------------------------------------- bit reader --
class Bits {
 public:
  explicit Bits(const std::vector<uint8_t>& bytes) : b_(bytes) {}
  int64_t get(int count) {
    int64_t v = 0;
    for (int i = 0; i < count; i++) {
      uint64_t p = pos_++;
      int bit = (p >> 3) < b_.size() ? (b_[p >> 3] >> (7 - (p & 7))) & 1 : 0;
      v = (v << 1) | bit;
    }
    return v;
  }
  uint64_t pos() const { return pos_; }

 private:
  const std::vector<uint8_t>& b_;
  uint64_t pos_ = 0;
};

// ----------------------------------------------------------------- model --
struct Plp {
  int id = 0, lls = 0, layer = 0;
  long start = 0, size = 0;
  int scrambler = 0, fec_type = 0, mod = 0, cod = 0, ti_mode = 0;
  long fec_block_start = 0, cti_fec_block_start = 0;
  int num_channel_bonded = 0, bonding_format = 0;
  std::vector<int> bonded_rf;
  bool has_mimo_opts = false;
  int mimo_comb = 0, mimo_iq = 0, mimo_ph = 0;
  // layer 0:
  int dispersed = 0;
  long num_subslices = 0, subslice_interval = 0;
  bool has_ext_il = false;
  int ext_il = 0;
  int cti_depth = 0, cti_start_row = 0;
  int hti_inter = 0, hti_num_ti_blocks = 0;
  long hti_fec_max = 0;
  std::vector<long> hti_fec_blocks;
  int hti_cell_il = 0;
  // layer != 0:
  int ldm_level = 0;
};

struct Subframe {
  // signaled only for subframe > 0 (subframe 0 uses the L1-Basic fields)
  int mimo = 0, miso = 0, fft = 0, cred = 0, gi = 0;
  int num_ofdm_symbols = 0, pilot = 0, boost = 0;
  int sbs_first = 0, sbs_last = 0;
  int multiplex = -1, freq_interleaver = 0;
  long sbs_null_cells = -1;
  std::vector<Plp> plps;
  // derived (the reference's pass-1 subframe_info)
  int fft_actual = 8192, gi_samples = 0, num_preamble = 0;
  // L1D-version>=2 MIMO-mixed extension
  int mimo_mixed = 0;
  std::vector<std::array<int, 4>> mixed_plp;  // present,comb,iq,ph
};

struct L1 {
  int version = 0, mimo_pilot = 0, lls = 0, time_info = 0, return_ch = 0;
  int papr = 0, flm = 0;
  long frame_length = 0, excess = 0, time_offset = 0, add_samples = 0;
  int num_subframes = 0;  // raw field (actual count = +1)
  int preamble_num_symbols = 0;  // +1 applied
  int preamble_cred = 0, content_tag = 0;
  long detail_size_bytes = 0;
  int detail_fec = 0, add_parity = 0;
  long detail_total_cells = 0;
  int fs_mimo = 0, fs_miso = 0, fs_fft = 0, fs_cred = 0, fs_gi = 0;
  int fs_num_ofdm = 0, fs_pilot = 0, fs_boost = 0;
  int fs_sbs_first = 0, fs_sbs_last = 0, fs_mimo_mixed = 0;
  uint32_t b_crc = 0;
  int d_version = 0, num_rf = 0;
  std::vector<uint32_t> bonded_bsid;
  long t_sec = 0, t_msec = 0, t_usec = 0, t_nsec = 0;
  std::vector<Subframe> subs;
  uint32_t bsid = 0;
  bool has_bsid = false;
  uint32_t d_crc = 0;
};

int fft_actual(int e) { return e == 1 ? 16384 : e == 2 ? 32768 : e == 0 ? 8192 : 8192; }
int gi_samples_of(int e) {
  static const int s[13] = {0,   192,  384,  512,  768,  1024, 1536,
                            2048, 2432, 3072, 3648, 4096, 4864};
  return (e >= 1 && e <= 12) ? s[e] : 0;
}

// ----------------------------------------------------------------- parse --
void parse_plp(Bits& r, const L1& l1, Subframe& sf, bool first_sub, Plp& p,
               int& persist_ext_il) {
  p.id = r.get(6);
  p.lls = r.get(1);
  p.layer = r.get(2);
  p.start = r.get(24);
  p.size = r.get(24);
  p.scrambler = r.get(2);
  p.fec_type = r.get(4);
  if (p.fec_type <= 5) {
    p.mod = r.get(4);
    p.cod = r.get(4);
  }
  p.ti_mode = r.get(2);
  if (p.ti_mode == 0) {
    p.fec_block_start = r.get(15);
  } else if (p.ti_mode == 1) {
    p.cti_fec_block_start = r.get(22);
  }
  if (l1.num_rf > 0) {
    p.num_channel_bonded = r.get(3);
    if (p.num_channel_bonded > 0) {
      p.bonding_format = r.get(2);
      for (int k = 0; k < p.num_channel_bonded; k++) {
        p.bonded_rf.push_back(r.get(3));
      }
    }
  }
  if ((first_sub && l1.fs_mimo == 1) || (!first_sub && sf.mimo)) {
    p.has_mimo_opts = true;
    p.mimo_comb = r.get(1);
    p.mimo_iq = r.get(1);
    p.mimo_ph = r.get(1);
  }
  if (p.layer == 0) {
    p.dispersed = r.get(1);
    if (p.dispersed) {
      p.num_subslices = r.get(14);
      p.subslice_interval = r.get(24);
    }
    if ((p.ti_mode == 1 || p.ti_mode == 2) && p.mod == 0) {
      p.has_ext_il = true;
      p.ext_il = r.get(1);
      persist_ext_il = p.ext_il;
    }
    // [QUIRK] TI_extended_interleaving persists across PLPs in the
    // reference (file-lifetime variable, l1dump.c:160); CTI depth labels
    // for later PLPs use the last value read.
    p.ext_il = persist_ext_il;
    if (p.ti_mode == 1) {
      p.cti_depth = r.get(3);
      p.cti_start_row = r.get(11);
    } else if (p.ti_mode == 2) {
      p.hti_inter = r.get(1);
      p.hti_num_ti_blocks = r.get(4);
      p.hti_fec_max = r.get(12);
      if (p.hti_inter == 0) {
        p.hti_fec_blocks.push_back(r.get(12));
      } else {
        for (int k = 0; k <= p.hti_num_ti_blocks; k++) {
          p.hti_fec_blocks.push_back(r.get(12));
        }
      }
      p.hti_cell_il = r.get(1);
    }
  } else {
    p.ldm_level = r.get(5);
  }
}

void parse(Bits& r, L1& l1) {
  l1.version = r.get(3);
  l1.mimo_pilot = r.get(1);
  l1.lls = r.get(1);
  l1.time_info = r.get(2);
  l1.return_ch = r.get(1);
  l1.papr = r.get(2);
  l1.flm = r.get(1);
  if (l1.flm == 0) {
    l1.frame_length = r.get(10);
    l1.excess = r.get(13);
  } else {
    l1.time_offset = r.get(16);
    l1.add_samples = r.get(7);
  }
  l1.num_subframes = r.get(8);
  l1.preamble_num_symbols = r.get(3) + 1;
  l1.preamble_cred = r.get(3);
  l1.content_tag = r.get(2);
  l1.detail_size_bytes = r.get(13);
  l1.detail_fec = r.get(3);
  l1.add_parity = r.get(2);
  l1.detail_total_cells = r.get(19);
  l1.fs_mimo = r.get(1);
  l1.fs_miso = r.get(2);
  l1.fs_fft = r.get(2);
  l1.fs_cred = r.get(3);
  l1.fs_gi = r.get(4);
  l1.fs_num_ofdm = r.get(11) + 1;
  l1.fs_pilot = r.get(5);
  l1.fs_boost = r.get(3);
  l1.fs_sbs_first = r.get(1);
  l1.fs_sbs_last = r.get(1);
  if (l1.version == 0) {
    r.get(48);
  } else {
    l1.fs_mimo_mixed = r.get(1);
    r.get(47);
  }
  l1.b_crc = (uint32_t)r.get(32);

  l1.d_version = r.get(4);
  l1.num_rf = r.get(3);
  for (int i = 1; i <= l1.num_rf; i++) {
    l1.bonded_bsid.push_back((uint32_t)r.get(16));
    r.get(3);
  }
  if (l1.time_info != 0) {
    l1.t_sec = r.get(32);
    l1.t_msec = r.get(10);
    if (l1.time_info != 1) {
      l1.t_usec = r.get(10);
      if (l1.time_info != 2) {
        l1.t_nsec = r.get(10);
      }
    }
  }
  int persist_ext_il = 0;
  l1.subs.resize(l1.num_subframes + 1);
  for (int i = 0; i <= l1.num_subframes; i++) {
    Subframe& sf = l1.subs[i];
    if (i == 0) {
      sf.fft = l1.fs_fft;
      sf.cred = l1.fs_cred;
      sf.gi = l1.fs_gi;
      sf.pilot = l1.fs_pilot;
      sf.boost = l1.fs_boost;
      sf.mimo = l1.fs_mimo;
      sf.num_ofdm_symbols = l1.fs_num_ofdm;
      sf.sbs_first = l1.fs_sbs_first;
      sf.sbs_last = l1.fs_sbs_last;
      sf.num_preamble = l1.preamble_num_symbols;
    } else {
      sf.mimo = r.get(1);
      sf.miso = r.get(2);
      sf.fft = r.get(2);
      sf.cred = r.get(3);
      sf.gi = r.get(4);
      sf.num_ofdm_symbols = r.get(11) + 1;
      sf.pilot = r.get(5);
      sf.boost = r.get(3);
      sf.sbs_first = r.get(1);
      sf.sbs_last = r.get(1);
    }
    sf.fft_actual = fft_actual(sf.fft);
    sf.gi_samples = gi_samples_of(sf.gi);
    if (l1.num_subframes > 0) sf.multiplex = r.get(1);
    sf.freq_interleaver = r.get(1);
    // [QUIRK] for subframes > 0 the reference stores sbs_last into the
    // sbs_first variable (l1dump.c pass 1 :409-412, pass 2 :1819-1822), so
    // the null-cells read and the rate call both key on sbs_last.
    int effective_sbs = (i == 0)
        ? (l1.fs_sbs_first == 1 || l1.fs_sbs_last == 1)
        : (sf.sbs_last == 1);
    if (effective_sbs) sf.sbs_null_cells = r.get(13);
    int num_plp = r.get(6);
    sf.plps.resize(num_plp + 1);
    for (int j = 0; j <= num_plp; j++) {
      parse_plp(r, l1, sf, i == 0, sf.plps[j], persist_ext_il);
    }
  }
  if (l1.d_version >= 1) {
    l1.has_bsid = true;
    l1.bsid = (uint32_t)r.get(16);
  }
  if (l1.d_version >= 2) {
    // [QUIRK] the reference's loop reuses the *last* subframe's PLP count
    // and mimo bit here (l1dump.c:2225-2252 variables persist).
    int last_nplp = (int)l1.subs.back().plps.size() - 1;
    for (int i = 0; i <= l1.num_subframes; i++) {
      Subframe& sf = l1.subs[i];
      if (i > 0) sf.mimo_mixed = r.get(1);
      bool cond = (i == 0) ? (l1.fs_mimo_mixed == 1) : (sf.mimo_mixed == 1);
      if (cond) {
        for (int j = 0; j <= last_nplp; j++) {
          std::array<int, 4> f{0, 0, 0, 0};
          f[0] = r.get(1);
          if (f[0] == 1) {
            f[1] = r.get(1);
            f[2] = r.get(1);
            f[3] = r.get(1);
          }
          sf.mixed_plp.push_back(f);
        }
      }
    }
  }
  long pad = ((l1.detail_size_bytes * 8) - 32) - ((long)r.pos() - 200);
  if (pad > 0) r.get(pad);
  l1.d_crc = (uint32_t)r.get(32);
}

// ------------------------------------------------------- rate calculator --
struct CellLookup {
  int first_preamble, preamble, data, sbs, sbs_data, papr;
};

CellLookup lookup_cells(int fft_enum, int gi, int pilot, int cred,
                        int boost) {
  CellLookup c{};
  int pp = (pilot >= 0 && pilot < 16) ? pilot : 0;
  int row;
  if (fft_enum == 1) {  // 16K
    c.papr = 144;
    row = (gi >= 1 && gi <= 11) ? 6 + gi : 7;
    c.data = kDataCells16K[pp][cred];
    c.sbs = kSbsCells16K[pp][cred];
    c.sbs_data = kSbsDataCells16K[pp][cred][boost];
  } else if (fft_enum == 2) {  // 32K
    c.papr = 288;
    bool sp8 = (pilot == 6 || pilot == 7);
    if (gi >= 1 && gi <= 8) row = 17 + gi;
    else if (gi == 9) row = sp8 ? 26 : 27;
    else if (gi == 10) row = sp8 ? 28 : 29;
    else if (gi == 11) row = 30;
    else if (gi == 12) row = 31;
    else row = 18;
    c.data = kDataCells32K[pp][cred];
    c.sbs = kSbsCells32K[pp][cred];
    c.sbs_data = kSbsDataCells32K[pp][cred][boost];
  } else {  // 8K and the reserved-FFT default path
    c.papr = 72;
    row = (gi >= 1 && gi <= 7) ? gi - 1 : 0;
    c.data = kDataCells8K[pp][cred];
    c.sbs = kSbsCells8K[pp][cred];
    c.sbs_data = kSbsDataCells8K[pp][cred][boost];
  }
  c.first_preamble = kPreambleCells[row][4];
  c.preamble = kPreambleCells[row][cred];
  return c;
}

const int kKbchNormal[12] = {8448,  12768, 17088, 21408, 25728, 30048,
                             34368, 38688, 43008, 47328, 51648, 55968};
const int kKbchShort[12] = {1992,  3072,  4152,  5232,  6312,  7392,
                            8472,  9552,  10632, 11712, 12792, 13872};

// The reference's embedded atsc3rate (l1dump.c:2278-3064): prints sub-frame
// time (multi-subframe only), frame time, available PLP cells and the
// TS/PLP bitrates for one PLP.
void plp_rate_report(const L1& l1, int subframe, const Plp& p) {
  const Subframe& sf = l1.subs[subframe];
  int num_subframes = l1.num_subframes + 1;
  int numpreamblesyms = (subframe == 0) ? l1.preamble_num_symbols : 0;
  int numpayloadsyms = sf.num_ofdm_symbols;
  int firstsbs = (subframe == 0) ? l1.fs_sbs_first : sf.sbs_last;  // [QUIRK]
  int framesize = !(p.fec_type & 1);  // even fec_type = 16K LDPC = short
  double kbch = 0.0, fecsize = 0.0;
  if (framesize == 0) {
    fecsize = 64800.0;
    kbch = (p.cod >= 0 && p.cod < 12) ? kKbchNormal[p.cod] : 0;
  } else if (framesize == 1) {
    fecsize = 16200.0;
    kbch = (p.cod >= 0 && p.cod < 12) ? kKbchShort[p.cod] : 0;
  }
  int mod = (p.mod >= 0 && p.mod <= 5) ? 2 + 2 * p.mod : 2;  // bits/cell

  // [QUIRK] switch(0) in the reference: L1-Basic cells are always the
  // mode-1 value regardless of the signaled FEC mode (l1dump.c:2294-2313).
  int l1cells = 3820 + (int)l1.detail_total_cells;

  CellLookup cl = lookup_cells(sf.fft, sf.gi, sf.pilot, sf.cred, sf.boost);
  // paprmode is the TR bit of the 2-bit field (l1dump.c:586 `value & 1`)
  int papr_cells = (l1.papr & 1) ? cl.papr : 0;

  double T = 1.0 / (384000.0 * 18.0);
  double TB = 1.0 / 6144000.0;
  double TF = 0.0;
  if (l1.flm == 0) {
    for (int n = 0; n < num_subframes; n++) {
      const Subframe& s = l1.subs[n];
      if (n == 0) {
        double TS = T * (s.fft_actual + s.gi_samples) * 1000.0;
        double TSX =
            T * (s.fft_actual + s.gi_samples + l1.excess) * 1000.0;
        double part = s.num_ofdm_symbols * TSX + s.num_preamble * TS +
                      3072.0 * 4 * TB * 1000.0;
        TF += part;
        if (subframe == n && num_subframes > 1) {
          if (num_subframes - 1 == n) {
            printf("sub-frame time = %f ms\n",
                   part + (l1.frame_length * 5.0 - TF));
          } else {
            printf("sub-frame time = %f ms\n", part);
          }
        }
      } else {
        double TS =
            T * (s.fft_actual + s.gi_samples + l1.excess) * 1000.0;
        double part = (double)s.num_ofdm_symbols * TS;
        TF += part;
        if (subframe == n && num_subframes > 1) {
          if (num_subframes - 1 == n) {
            printf("sub-frame time = %f ms\n",
                   part + (l1.frame_length * 5.0 - TF));
          } else {
            printf("sub-frame time = %f ms\n", part);
          }
        }
      }
    }
    TF = l1.frame_length * 5.0;
  } else {
    for (int n = 0; n < num_subframes; n++) {
      const Subframe& s = l1.subs[n];
      double TS = T * (s.fft_actual + s.gi_samples) * 1000.0;
      double part;
      if (n == 0) {
        part = (s.num_ofdm_symbols + s.num_preamble) * TS +
               3072.0 * 4 * TB * 1000.0;
      } else {
        part = (double)s.num_ofdm_symbols * TS;
      }
      TF += part;
      if (subframe == n && num_subframes > 1) {
        printf("sub-frame time = %f ms\n", part);
      }
    }
  }
  printf("frame time = %f ms\n", TF);

  int total_preamble_cells = 0;
  for (int n = 1; n < numpreamblesyms; n++) {
    total_preamble_cells += cl.preamble - papr_cells;
  }
  int first_preamble_cells = cl.first_preamble;
  if (numpreamblesyms == 0) {
    first_preamble_cells = 0;
    l1cells = 0;
  }
  int totalcells;
  if (firstsbs) {
    totalcells = first_preamble_cells + total_preamble_cells +
                 (numpayloadsyms - 2) * (cl.data - papr_cells) +
                 (cl.sbs - papr_cells) * 2;
  } else {
    totalcells = first_preamble_cells + total_preamble_cells +
                 (numpayloadsyms - 1) * (cl.data - papr_cells) +
                 (cl.sbs - papr_cells);
  }
  int sbsnullcells = cl.sbs - cl.sbs_data;
  int availablecells = firstsbs ? totalcells - l1cells - sbsnullcells * 2
                                : totalcells - l1cells - sbsnullcells;
  printf("Available PLP cells = %d\n", availablecells);
  double fecrate = (kbch - 16) / fecsize;
  double bitrate = (1000.0 / TF) * (p.size * mod * fecrate);
  printf("TS bitrate = %.03f\n", bitrate);
  fecrate = kbch / fecsize;
  bitrate = (1000.0 / TF) * (p.size * mod * fecrate);
  printf("PLP bitrate = %.03f\n", bitrate);
}

// ----------------------------------------------------------------- print --
const char* kCredStr[5] = {"5.832 MHz", "5.751 MHz", "5.670 MHz",
                           "5.589 MHz", "5.508 MHz"};
const char* kGiStr[13] = {"Reserved",  "GI1_192",  "GI2_384",  "GI3_512",
                          "GI4_768",   "GI5_1024", "GI6_1536", "GI7_2048",
                          "GI8_2432",  "GI9_3072", "GI10_3648",
                          "GI11_4096", "GI12_4864"};
const char* kPilotStr[16] = {"SP3_2",  "SP3_4",  "SP4_2",  "SP4_4",
                             "SP6_2",  "SP6_4",  "SP8_2",  "SP8_4",
                             "SP12_2", "SP12_4", "SP16_2", "SP16_4",
                             "SP24_2", "SP24_4", "SP32_2", "SP32_4"};
const char* kMisoStr[4] = {"No MISO", "MISO with 64 coefficients",
                           "MISO with 256 coefficients", "Reserved"};
const char* kFftStr[4] = {"8K", "16K", "32K", "Reserved"};
const char* kMixedStr[4] = {"All PLPs in first subframe use SISO",
                            "PLPs of both types in first subframe",
                            "All PLPs in first subframe use MIMO",
                            "Invalid Combination"};
const char* kMixedSubStr[4] = {"All PLPs in subframe use SISO",
                               "PLPs of both types in subframe",
                               "All PLPs in subframe use MIMO",
                               "Invalid Combination"};

const char* cred_str(int v) { return (v >= 0 && v <= 4) ? kCredStr[v] : "Reserved"; }
const char* gi_str(int v) { return (v >= 0 && v <= 12) ? kGiStr[v] : "Reserved"; }

void print_pilot(const char* prefix, int pilot, int boost) {
  if (pilot >= 0 && pilot < 16) {
    printf("%s_scattered_pilot_pattern = %s\n", prefix, kPilotStr[pilot]);
    if (boost >= 0 && boost < 5) {
      printf("%s_scattered_pilot_boost = %s\n", prefix,
             kPilotBoostStr[pilot][boost]);
    } else {
      printf("%s_scattered_pilot_boost = Reserved\n", prefix);
    }
  } else {
    printf("%s_scattered_pilot_pattern = Reserved\n", prefix);
    printf("%s_scattered_pilot_boost = Undefined\n", prefix);
  }
}

void print_plp(const L1& l1, int i, int j, const Plp& p) {
  printf("********** plp = %d **********\n", j);
  printf("L1D_plp%d_id = %d\n", j, p.id);
  printf("L1D_plp%d_lls_flag = %d\n", j, p.lls);
  printf("L1D_plp%d_layer = %s\n", j,
         p.layer == 0 ? "Core" : p.layer == 1 ? "Enhanced" : "Reserved");
  printf("L1D_plp%d_start = %ld\n", j, p.start);
  printf("L1D_plp%d_size = %ld\n", j, p.size);
  printf("L1D_plp%d_scrambler_type = %s\n", j,
         p.scrambler == 0 ? "PRBS" : "Reserved");
  static const char* fec_names[6] = {
      "BCH + 16K LDPC", "BCH + 64K LDPC", "CRC + 16K LDPC",
      "CRC + 64K LDPC", "16K LDPC only",  "64K LDPC only"};
  printf("L1D_plp%d_fec_type = %s\n", j,
         p.fec_type <= 5 ? fec_names[p.fec_type] : "Reserved");
  if (p.fec_type <= 5) {
    static const char* mods[6] = {"QPSK",    "16QAM",   "64QAM",
                                  "256QAM",  "1024QAM", "4096QAM"};
    printf("L1D_plp%d_mod = %s\n", j,
           p.mod <= 5 ? mods[p.mod] : "Reserved");
    if (p.cod <= 11) {
      printf("L1D_plp%d_cod = %d/15\n", j, p.cod + 2);
    } else {
      printf("L1D_plp%d_cod = Reserved\n", j);
    }
  }
  static const char* ti_names[4] = {
      "No time interleaving", "Convolutional time interleaving",
      "Hybrid time interleaving", "Reserved"};
  printf("L1D_plp%d_TI_mode = %s\n", j, ti_names[p.ti_mode]);
  if (p.ti_mode == 0) {
    printf("L1D_plp%d_fec_block_start = %ld\n", j, p.fec_block_start);
  } else if (p.ti_mode == 1) {
    printf("L1D_plp%d_CTI_fec_block_start = %ld\n", j,
           p.cti_fec_block_start);
  }
  if (l1.num_rf > 0) {
    printf("L1D_plp%d_num_channel_bonded = %d\n", j, p.num_channel_bonded);
    if (p.num_channel_bonded > 0) {
      printf("L1D_plp%d_channel_bonding_format = %s\n", j,
             p.bonding_format == 0   ? "Plain channel bonding"
             : p.bonding_format == 1 ? "SNR averaged channel bonding"
                                     : "Reserved");
      for (int rf : p.bonded_rf) {
        printf("L1D_plp%d_bonded_rf_id = %d\n", j, rf);
      }
    }
  }
  if (p.has_mimo_opts) {
    printf("L1D_plp%d_mimo_stream_combining = %d\n", j, p.mimo_comb);
    printf("L1D_plp%d_mimo_IQ_interleaving = %d\n", j, p.mimo_iq);
    printf("L1D_plp%d_mimo_PH = %d\n", j, p.mimo_ph);
  }
  if (p.layer == 0) {
    if (p.dispersed == 0) {
      printf("L1D_plp%d_type = non-dispersed\n", j);
    } else {
      printf("L1D_plp%d_type = dispersed\n", j);
      printf("L1D_plp%d_num_subslices = %ld\n", j, p.num_subslices + 1);
      printf("L1D_plp%d_subslice_interval = %ld\n", j, p.subslice_interval);
    }
    if (p.has_ext_il) {
      printf("L1D_plp%d_TI_extended_interleaving = %s\n", j,
             p.ext_il ? "enabled" : "disabled");
    }
    if (p.ti_mode == 1) {
      switch (p.cti_depth) {
        case 0: printf("L1D_plp%d_CTI_depth = 512\n", j); break;
        case 1: printf("L1D_plp%d_CTI_depth = 724\n", j); break;
        case 2:
          printf("L1D_plp%d_CTI_depth = %s\n", j,
                 p.ext_il == 0 ? "887" : "1254");
          break;
        case 3:
          printf("L1D_plp%d_CTI_depth = %s\n", j,
                 p.ext_il == 0 ? "1024" : "1448");
          break;
        default: printf("L1D_plp%d_CTI_depth = Reserved\n", j); break;
      }
      printf("L1D_plp%d_CTI_start_row = %d\n", j, p.cti_start_row);
    } else if (p.ti_mode == 2) {
      printf("L1D_plp%d_HTI_inter_subframe = %d\n", j, p.hti_inter);
      printf("L1D_plp%d_HTI_num_ti_blocks = %d\n", j,
             p.hti_num_ti_blocks + 1);
      printf("L1D_plp%d_HTI_num_fec_blocks_max = %ld\n", j,
             p.hti_fec_max + 1);
      for (long v : p.hti_fec_blocks) {
        printf("L1D_plp%d_HTI_num_fec_blocks = %ld\n", j, v + 1);
      }
      printf("L1D_plp%d_HTI_cell_interleaver = %s\n", j,
             p.hti_cell_il ? "enabled" : "disabled");
    }
  } else {
    static const char* ldm[32] = {
        "0.0 dB",  "0.05 dB", "1.0 dB",  "1.5 dB",  "2.0 dB",  "2.5 dB",
        "3.0 dB",  "3.5 dB",  "4.0 dB",  "4.5 dB",  "5.0 dB",  "6.0 dB",
        "7.0 dB",  "8.0 dB",  "9.0 dB",  "10.0 dB", "11.0 dB", "12.0 dB",
        "13.0 dB", "14.0 dB", "15.0 dB", "16.0 dB", "17.0 dB", "18.0 dB",
        "19.0 dB", "20.0 dB", "21.0 dB", "22.0 dB", "23.0 dB", "24.0 dB",
        "25.0 dB", "Reserved"};
    printf("L1D_plp%d_ldm_injection_level = %s\n", j, ldm[p.ldm_level]);
  }
  plp_rate_report(l1, i, p);
}

void print_report(const L1& l1) {
  printf("L1B_version = %d\n", l1.version);
  printf("L1B_mimo_scattered_pilot_encoding = %s\n",
         l1.mimo_pilot == 0 ? "Walsh-Hadamard pilots or no MIMO subframes"
                            : "Null pilots");
  printf("L1B_lls_flag = %s\n", l1.lls == 0 ? "No LLS in current frame"
                                            : "LLS in current frame");
  static const char* time_strs[4] = {
      "Time information is not included in the current frame",
      "Time information is included in the current frame and signaled to "
      "ms precision",
      "Time information is included in the current frame and signaled to "
      "µs precision",
      "Time information is included in the current frame and signaled to "
      "ns precision"};
  printf("L1B_time_info_flag = %s\n", time_strs[l1.time_info]);
  printf("L1B_return_channel_flag = %d\n", l1.return_ch);
  static const char* papr_strs[4] = {"No PAPR reduction used",
                                     "Tone reservation only", "ACE only",
                                     "Both TR and ACE"};
  printf("L1B_papr_reduction = %s\n", papr_strs[l1.papr]);
  printf("L1B_frame_length_mode = %s\n",
         l1.flm == 0 ? "time-aligned" : "symbol-aligned");
  if (l1.flm == 0) {
    printf("L1B_frame_length = %ld\n", l1.frame_length);
    printf("L1B_excess_samples_per_symbol = %ld\n", l1.excess);
  } else {
    printf("L1B_time_offset = %ld\n", l1.time_offset);
    printf("L1B_additional samples = %ld\n", l1.add_samples);
  }
  printf("L1B_num_subframes = %d\n", l1.num_subframes + 1);
  printf("L1B_preamble_num_symbols = %d\n", l1.preamble_num_symbols);
  if (l1.preamble_num_symbols > 1) {
    printf("L1B_preamble_reduced_carriers = %s\n", cred_str(l1.preamble_cred));
  }
  printf("L1B_L1_Detail_content_tag = %d\n", l1.content_tag);
  printf("L1B_L1_Detail_size_bytes = %ld\n", l1.detail_size_bytes);
  if (l1.detail_fec <= 6) {
    printf("L1B_L1_Detail_fec_type = Mode %d\n", l1.detail_fec + 1);
  } else {
    printf("L1B_L1_Detail_fec_type = Reserved\n");
  }
  static const char* parity_strs[4] = {
      "K=0 (No additional parity used)",
      "K=1)",  // [QUIRK] stray paren in the reference
      "K=2", "Reserved for future use"};
  printf("L1B_L1_additional_parity_mode = %s\n", parity_strs[l1.add_parity]);
  printf("L1B_L1_Detail_total_cells = %ld\n", l1.detail_total_cells);
  printf("L1B_first_sub_mimo = %s\n", l1.fs_mimo == 0 ? "No MIMO" : "MIMO");
  printf("L1B_first_sub_miso = %s\n", kMisoStr[l1.fs_miso]);
  printf("L1B_first_sub_fft_size = %s\n", kFftStr[l1.fs_fft]);
  printf("L1B_first_sub_reduced_carriers = %s\n", cred_str(l1.fs_cred));
  printf("L1B_first_sub_guard_interval = %s\n", gi_str(l1.fs_gi));
  printf("L1B_first_sub_num_ofdm_symbols = %d\n", l1.fs_num_ofdm);
  print_pilot("L1B_first_sub", l1.fs_pilot, l1.fs_boost);
  printf("L1B_first_sub_sbs_first = %s\n",
         l1.fs_sbs_first == 0 ? "not present" : "present");
  printf("L1B_first_sub_sbs_last = %s\n",
         l1.fs_sbs_last == 0 ? "not present" : "present");
  if (l1.version >= 1) {
    printf("L1B_first_sub_mimo_mixed = %s\n",
           kMixedStr[l1.fs_mimo_mixed | (l1.fs_mimo << 1)]);
  }
  printf("L1B_crc = 0x%08x\n", l1.b_crc);

  printf("L1D_version = %d\n", l1.d_version);
  if (l1.num_rf == 0) {
    printf("L1D_num_rf = No Channel Bonding\n");
  } else {
    printf("L1D_num_rf = Channel Bonding, %d channel(s)\n", l1.num_rf);
  }
  for (uint32_t b : l1.bonded_bsid) {
    printf("L1D_bonded_bsid = 0x%04x\n", b);
  }
  if (l1.time_info != 0) {
    printf("L1D_time_sec = %ld\n", l1.t_sec);
    printf("L1D_time_msec = %ld\n", l1.t_msec);
    if (l1.time_info != 1) {
      printf("L1D_time_usec = %ld\n", l1.t_usec);
      if (l1.time_info != 2) {
        printf("L1D_time_nsec = %ld\n", l1.t_nsec);
      }
    }
  }
  for (int i = 0; i <= l1.num_subframes; i++) {
    const Subframe& sf = l1.subs[i];
    printf("******** subframe = %d ********\n", i);
    if (i > 0) {
      printf("L1D_mimo = %s\n", sf.mimo == 0 ? "No MIMO" : "MIMO");
      printf("L1D_miso = %s\n", kMisoStr[sf.miso]);
      printf("L1D_fft_size = %s\n", kFftStr[sf.fft]);
      printf("L1D_reduced_carriers = %s\n", cred_str(sf.cred));
      printf("L1D_guard_interval = %s\n", gi_str(sf.gi));
      printf("L1D_num_ofdm_symbols = %d\n", sf.num_ofdm_symbols);
      print_pilot("L1D", sf.pilot, sf.boost);
      printf("L1D_sbs_first = %s\n",
             sf.sbs_first == 0 ? "not present" : "present");
      printf("L1D_sbs_last = %s\n",
             sf.sbs_last == 0 ? "not present" : "present");
    }
    if (sf.multiplex >= 0) {
      printf("L1D_subframe_multiplex = %d\n", sf.multiplex);
    }
    printf("L1D_frequency_interleaver = %s\n",
           sf.freq_interleaver == 0 ? "Preamble Only" : "All Symbols");
    if (sf.sbs_null_cells >= 0) {
      printf("L1D_sbs_null_cells = %ld\n", sf.sbs_null_cells);
    }
    printf("L1D_num_plp = %d\n", (int)sf.plps.size());
    for (int j = 0; j < (int)sf.plps.size(); j++) {
      print_plp(l1, i, j, sf.plps[j]);
    }
  }
  if (l1.has_bsid) printf("L1D_bsid = 0x%04x\n", l1.bsid);
  if (l1.d_version >= 2) {
    for (int i = 0; i <= l1.num_subframes; i++) {
      const Subframe& sf = l1.subs[i];
      if (i > 0) {
        // [QUIRK] the combined value uses the mimo bit of the *last*
        // subframe parsed, not subframe i (persisted variable).
        int combined = sf.mimo_mixed | (l1.subs.back().mimo << 1);
        printf("L1D_mimo_mixed = %s\n", kMixedSubStr[combined]);
      }
      for (int j = 0; j < (int)sf.mixed_plp.size(); j++) {
        const auto& f = sf.mixed_plp[j];
        printf("L1D_plp%d_mimo = %s\n", j, f[0] == 0 ? "No MIMO" : "MIMO");
        if (f[0] == 1) {
          printf("L1D_plp%d_mimo_stream_combining = %d\n", j, f[1]);
          printf("L1D_plp%d_mimo_IQ_interleaving = %d\n", j, f[2]);
          printf("L1D_plp%d_mimo_PH = %d\n", j, f[3]);
        }
      }
    }
  }
  printf("L1D_crc = 0x%08x\n", l1.d_crc);
}

}  // namespace

int l1dump_main(int argc, char** argv) {
  if (argc != 2) {
    fprintf(stderr, "usage: l1dump <filename>\n");
    return -1;
  }
  FILE* fp = fopen(argv[1], "rb");
  if (!fp) {
    fprintf(stderr, "Cannot open input file <%s>\n", argv[1]);
    return -1;
  }
  std::string text;
  char buf[4096];
  size_t n;
  while ((n = fread(buf, 1, sizeof buf, fp)) > 0) text.append(buf, n);
  fclose(fp);
  size_t cut = text.find_first_of("\r\n");
  if (cut != std::string::npos) text.resize(cut);
  std::vector<uint8_t> bytes;
  if (!b64_decode(text, bytes)) {
    fprintf(stderr, "Decode Failure\n");
    return -1;
  }
  Bits r(bytes);
  L1 l1;
  parse(r, l1);
  print_report(l1);
  return 0;
}

}  // namespace dtv
