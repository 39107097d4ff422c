// rANS range coder — the native entropy-coding backend.
//
// TPU-native replacement for the reference's C++ deps (compressai's _CXX rANS
// and torchac; SURVEY §2.4): the device computes symbols + cdf indexes under
// XLA, this host coder turns them into real bitstreams. API mirrors the
// compressai encode/decode_with_indexes contract (quantized 16-bit CDF tables,
// escape symbol + bypass for out-of-range values) so the batched
// `entropy_trick` (entropy_models.py:278-290) maps onto one call.
//
// Standard byte-wise rANS: 32-bit state in [2^23, 2^31), 16-bit probability
// precision, LIFO encode (ops collected forward, encoded in reverse, byte
// stream reversed) so decode is a forward pass.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr uint32_t kPrec = 16;                 // cdf precision bits
constexpr uint32_t kRansL = 1u << 23;          // renorm lower bound
constexpr int32_t kBypassPrec = 4;             // bypass chunk bits
constexpr int32_t kMaxBypass = (1 << kBypassPrec) - 1;

struct SymOp {
  uint32_t start;
  uint32_t freq;   // 0 => bypass op, raw value in `start` with kBypassPrec bits
};

class Encoder {
 public:
  void put(uint32_t start, uint32_t freq) { ops_.push_back({start, freq}); }
  void put_bypass(uint32_t val) { ops_.push_back({val, 0}); }

  std::vector<uint8_t> flush() {
    std::vector<uint8_t> out;
    uint64_t state = kRansL;
    for (auto it = ops_.rbegin(); it != ops_.rend(); ++it) {
      if (it->freq == 0) {  // bypass: uniform over 2^kBypassPrec
        uint64_t x_max = ((uint64_t)(kRansL >> kBypassPrec) << 8);
        while (state >= x_max) {
          out.push_back(state & 0xff);
          state >>= 8;
        }
        state = (state << kBypassPrec) | it->start;
      } else {
        uint64_t x_max = ((uint64_t)(kRansL >> kPrec) << 8) * it->freq;
        while (state >= x_max) {
          out.push_back(state & 0xff);
          state >>= 8;
        }
        state = ((state / it->freq) << kPrec) + (state % it->freq) + it->start;
      }
    }
    // final state, 4 bytes little-endian (reversed below -> decoder reads first)
    out.push_back(state & 0xff);
    out.push_back((state >> 8) & 0xff);
    out.push_back((state >> 16) & 0xff);
    out.push_back((state >> 24) & 0xff);
    std::vector<uint8_t> rev(out.rbegin(), out.rend());
    return rev;
  }

 private:
  std::vector<SymOp> ops_;
};

class Decoder {
 public:
  Decoder(const uint8_t* data, int n) : data_(data), n_(n), pos_(0) {
    state_ = 0;
    for (int i = 0; i < 4; ++i) state_ = (state_ << 8) | next_byte();
  }

  uint32_t cf() const { return state_ & ((1u << kPrec) - 1); }

  void advance(uint32_t start, uint32_t freq) {
    state_ = (uint64_t)freq * (state_ >> kPrec) + cf() - start;
    while (state_ < kRansL) state_ = (state_ << 8) | next_byte();
  }

  uint32_t get_bypass() {
    uint32_t val = state_ & kMaxBypass;
    state_ >>= kBypassPrec;
    while (state_ < kRansL) state_ = (state_ << 8) | next_byte();
    return val;
  }

 private:
  uint8_t next_byte() { return pos_ < n_ ? data_[pos_++] : 0; }
  const uint8_t* data_;
  int n_;
  int pos_;
  uint64_t state_;
};

inline void encode_value(Encoder& enc, int32_t value, const int32_t* cdf,
                         int32_t cdf_len) {
  const int32_t max_value = cdf_len - 2;  // escape symbol index
  int32_t raw = 0;
  int32_t sym = value;
  if (value < 0) {
    raw = -2 * value - 1;
    sym = max_value;
  } else if (value >= max_value) {
    raw = 2 * (value - max_value);
    sym = max_value;
  }
  enc.put((uint32_t)cdf[sym], (uint32_t)(cdf[sym + 1] - cdf[sym]));
  if (sym == max_value) {
    int32_t n_bypass = 0;
    while ((raw >> (n_bypass * kBypassPrec)) != 0) ++n_bypass;
    int32_t v = n_bypass;
    while (v >= kMaxBypass) {
      enc.put_bypass(kMaxBypass);
      v -= kMaxBypass;
    }
    enc.put_bypass(v);
    for (int32_t j = 0; j < n_bypass; ++j)
      enc.put_bypass((raw >> (j * kBypassPrec)) & kMaxBypass);
  }
}

inline int32_t decode_value(Decoder& dec, const int32_t* cdf, int32_t cdf_len) {
  const int32_t max_value = cdf_len - 2;
  uint32_t cf = dec.cf();
  // linear scan is fine: cdf_len is small (<= a few hundred)
  int32_t sym = 0;
  while (sym < cdf_len - 1 && (uint32_t)cdf[sym + 1] <= cf) ++sym;
  dec.advance((uint32_t)cdf[sym], (uint32_t)(cdf[sym + 1] - cdf[sym]));
  if (sym == max_value) {
    int32_t n_bypass = 0;
    int32_t v = dec.get_bypass();
    while (v == kMaxBypass) {
      n_bypass += v;
      v = dec.get_bypass();
    }
    n_bypass += v;
    int32_t raw = 0;
    for (int32_t j = 0; j < n_bypass; ++j)
      raw |= (int32_t)dec.get_bypass() << (j * kBypassPrec);
    if (raw & 1)
      sym = -(raw + 1) / 2;
    else
      sym = raw / 2 + max_value;
  }
  return sym;
}

}  // namespace

extern "C" {

// Encode n symbols. cdfs is [num_cdfs, cdf_stride] row-major; indexes[i]
// selects the row, offsets[i_row] shifts symbols into table space.
// Returns byte count written to out, or -1 if out_capacity exceeded.
int rans_encode_with_indexes(const int32_t* symbols, const int32_t* indexes,
                             int n, const int32_t* cdfs, int cdf_stride,
                             const int32_t* cdf_lengths, const int32_t* offsets,
                             uint8_t* out, int out_capacity) {
  Encoder enc;
  for (int i = 0; i < n; ++i) {
    const int32_t idx = indexes[i];
    const int32_t* cdf = cdfs + (int64_t)idx * cdf_stride;
    encode_value(enc, symbols[i] - offsets[idx], cdf, cdf_lengths[idx]);
  }
  std::vector<uint8_t> bytes = enc.flush();
  if ((int)bytes.size() > out_capacity) return -1;
  std::memcpy(out, bytes.data(), bytes.size());
  return (int)bytes.size();
}

int rans_decode_with_indexes(const uint8_t* data, int nbytes,
                             const int32_t* indexes, int n,
                             const int32_t* cdfs, int cdf_stride,
                             const int32_t* cdf_lengths, const int32_t* offsets,
                             int32_t* out_symbols) {
  Decoder dec(data, nbytes);
  for (int i = 0; i < n; ++i) {
    const int32_t idx = indexes[i];
    const int32_t* cdf = cdfs + (int64_t)idx * cdf_stride;
    out_symbols[i] = decode_value(dec, cdf, cdf_lengths[idx]) + offsets[idx];
  }
  return 0;
}

}  // extern "C"
