// MSB-first bit reader over a byte buffer, shared by every native analyzer
// (the reference carries three separate bit-reader implementations:
// /root/reference/flags264.c:14-50, /root/reference/xport.c:1495-1532 and
// /root/reference/h264_parse/mpeg4ip_bitstream.h:35-205; here there is one).
//
// Reads past the end return zero bits instead of touching stale memory; the
// reference reads whatever its static buffers held, which only diverges on
// malformed input (see PARITY.md).
#pragma once

#include <cstddef>
#include <cstdint>
#include <vector>

namespace dtv {

class BitReader {
 public:
  BitReader() = default;
  BitReader(const uint8_t* data, size_t n_bytes)
      : data_(data), n_bits_(n_bytes * 8) {}
  explicit BitReader(const std::vector<uint8_t>& v)
      : BitReader(v.data(), v.size()) {}

  uint64_t bit_pos() const { return pos_; }
  void seek_bits(uint64_t p) { pos_ = p; }
  uint64_t bits_left() const { return pos_ < n_bits_ ? n_bits_ - pos_ : 0; }

  uint32_t bits(unsigned n) {
    uint32_t v = 0;
    while (n--) v = (v << 1) | bit();
    return v;
  }

  uint32_t peek(unsigned n) const {
    BitReader tmp = *this;
    return tmp.bits(n);
  }

  // Exp-Golomb ue(v) (H.264 / H.265 / DVB descriptors).
  uint32_t ue() {
    unsigned zeros = 0;
    while (bit() == 0) {
      if (++zeros > 32 || bits_left() == 0) return 0;  // malformed guard
    }
    return ((1u << zeros) - 1) + bits(zeros);
  }

  // Exp-Golomb se(v).
  int32_t se() {
    uint32_t k = ue();
    int32_t v = (k + 1) >> 1;
    return (k & 1) ? v : -v;
  }

  void skip(unsigned n) { pos_ += n; }

 private:
  uint32_t bit() {
    if (pos_ >= n_bits_) {
      ++pos_;
      return 0;
    }
    uint32_t b = (data_[pos_ >> 3] >> (7 - (pos_ & 7))) & 1;
    ++pos_;
    return b;
  }

  const uint8_t* data_ = nullptr;
  uint64_t n_bits_ = 0;
  uint64_t pos_ = 0;
};

}  // namespace dtv
