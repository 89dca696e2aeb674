// cloudini_tpu native host runtime.
//
// Owns the host-side hot paths that are inherently sequential and therefore
// wasteful on the TPU VPU or in Python:
//   * stage-1 decode of interleaved streams that mix self-delimiting varints
//     with fixed-size (COPY/XOR) and Gorilla bit-packed tokens
//   * stage-1 encode of the same mixed streams (host fallback for plans the
//     device does not cover: Gorilla, FLOAT64 lossy)
//   * standalone Gorilla column encode/decode
//
// This is an original implementation of the wire format (documented against
// the reference at cloudini_lib/src/*, e.g. field_encoder.hpp:142-312 for the
// Gorilla layout and encoding_utils.hpp:55-148 for varints); it shares no
// code with the reference. Exposed as a C ABI consumed via ctypes.
//
// Error codes: 0 ok; negative = error (see kErr* below).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int kErrTruncated = -1;
constexpr int kErrOverflow = -2;
constexpr int kErrNanMarker = -3;
constexpr int kErrOutputFull = -4;
constexpr int kErrBadUnit = -5;
constexpr int kErrCorruptGorilla = -6;

// Field decoded (stream consumed) but not stored (basic_types.hpp:71).
constexpr uint32_t kSkipStore = 0xFFFFFFFFu;

// unit kinds (must match cloudini_tpu.core.plan.UnitKind order used by the loader)
enum UnitKind : int32_t {
  kFloatNLossy = 0,
  kFloatLossy = 1,
  kIntDelta = 2,
  kFloatXor = 3,
  kGorilla = 4,
  kCopy = 5,
};

struct UnitSpec {
  int32_t kind;
  int32_t lanes;       // 1..4 (FloatN), else 1
  int32_t type_code;   // FieldType enum value (width/signedness)
  int32_t _pad;
  uint32_t offsets[4]; // byte offsets within the point
  float res[4];        // resolutions (lossy floats)
};

inline int field_width(int32_t type_code) {
  switch (type_code) {
    case 1: case 2: return 1;
    case 3: case 4: return 2;
    case 5: case 6: return 4;
    case 7: return 4;
    case 8: return 8;
    case 9: case 10: return 8;
    default: return 0;
  }
}

// --- varint -----------------------------------------------------------------

// zigzag varint with the +1 NaN-reservation bias (wire spec:
// encoding_utils.hpp:55-67). Returns byte count written.
inline size_t put_varint(int64_t value, uint8_t* dst) {
  uint64_t u = (static_cast<uint64_t>(value) << 1) ^ static_cast<uint64_t>(value >> 63);
  u += 1;  // 0 reserved for the NaN marker
  size_t n = 0;
  while (u > 0x7F) {
    dst[n++] = static_cast<uint8_t>(u) | 0x80;
    u >>= 7;
  }
  dst[n++] = static_cast<uint8_t>(u);
  return n;
}

// Returns bytes consumed, or a negative error. *out receives the signed
// value; *is_nan is set when the token is the reserved NaN marker — biased
// value 0 at ANY length (the +1 bias reserves it; a valid encoder emits it
// as the single byte 0, but non-canonical encodings like 0x80 0x00 decode
// the same way on every backend).
inline int get_varint(const uint8_t* p, size_t avail, int64_t* out, bool* is_nan) {
  uint64_t u = 0;
  int shift = 0;
  size_t i = 0;
  for (;;) {
    if (i >= avail) return kErrTruncated;
    const uint8_t b = p[i++];
    if (shift >= 64 || (shift == 63 && (b & 0x7F) > 1)) return kErrOverflow;
    u |= static_cast<uint64_t>(b & 0x7F) << shift;
    if ((b & 0x80) == 0) break;
    if (shift >= 63) return kErrOverflow;
    shift += 7;
  }
  if (u == 0) {
    *out = 0;
    *is_nan = true;
    return static_cast<int>(i);
  }
  *is_nan = false;
  u -= 1;
  *out = static_cast<int64_t>((u >> 1) ^ (~(u & 1) + 1));
  return static_cast<int>(i);
}

// --- gorilla ----------------------------------------------------------------

// Byte-aligned-per-value Gorilla/Chimp XOR coder. Each value occupies whole
// bytes; bits are LSB-first within bytes (wire: field_encoder.hpp:142-312).
struct GorillaState {
  uint64_t prev_bits = 0;
  int prev_leading = -1;  // -1 = sentinel
  int prev_trailing = 0;
  bool first = true;
  int type_bits = 64;
};

inline int clz64(uint64_t x, int bits) {
  if (x == 0) return bits;
  return __builtin_clzll(x) - (64 - bits);
}

inline int ctz64(uint64_t x, int bits) {
  if (x == 0) return bits;
  return __builtin_ctzll(x);
}

// Encode one value; returns bytes written (or negative on full output).
inline int gorilla_put(GorillaState& st, uint64_t cur, uint8_t* dst, size_t cap) {
  unsigned __int128 acc = 0;
  int nbits = 0;
  if (st.first) {
    st.first = false;
    st.prev_bits = cur;
    acc = cur;
    nbits = st.type_bits;
  } else {
    const uint64_t x = cur ^ st.prev_bits;
    st.prev_bits = cur;
    if (x == 0) {
      nbits = 1;  // single '0' bit
    } else {
      acc = 1;  // flag '1'
      nbits = 1;
      const int lead = clz64(x, st.type_bits);
      const int trail = ctz64(x, st.type_bits);
      if (st.prev_leading >= 0 && lead >= st.prev_leading && trail >= st.prev_trailing) {
        nbits += 1;  // control '0'
        const int meaningful = st.type_bits - st.prev_leading - st.prev_trailing;
        acc |= static_cast<unsigned __int128>(x >> st.prev_trailing) << nbits;
        nbits += meaningful;
      } else {
        acc |= static_cast<unsigned __int128>(1) << nbits;  // control '1'
        nbits += 1;
        const int stored_lead = lead > 31 ? 31 : lead;
        const int meaningful = st.type_bits - stored_lead - trail;
        acc |= static_cast<unsigned __int128>(stored_lead) << nbits;
        nbits += 5;
        acc |= static_cast<unsigned __int128>(meaningful - 1) << nbits;
        nbits += 6;
        acc |= static_cast<unsigned __int128>(x >> trail) << nbits;
        nbits += meaningful;
        st.prev_leading = stored_lead;
        st.prev_trailing = trail;
      }
    }
  }
  const int nbytes = (nbits + 7) / 8;
  if (static_cast<size_t>(nbytes) > cap) return kErrOutputFull;
  for (int k = 0; k < nbytes; ++k) {
    dst[k] = static_cast<uint8_t>(acc >> (8 * k));
  }
  return nbytes;
}

// Decode one value; *consumed receives bytes read. Returns 0 or error.
inline int gorilla_get(GorillaState& st, const uint8_t* p, size_t avail,
                       uint64_t* out, int* consumed) {
  if (st.first) {
    const int nbytes = st.type_bits / 8;
    if (avail < static_cast<size_t>(nbytes)) return kErrTruncated;
    uint64_t v = 0;
    std::memcpy(&v, p, nbytes);
    st.first = false;
    st.prev_bits = v;
    *out = v;
    *consumed = nbytes;
    return 0;
  }
  if (avail < 1) return kErrTruncated;
  const uint8_t b0 = p[0];
  if ((b0 & 1) == 0) {
    *out = st.prev_bits;
    *consumed = 1;
    return 0;
  }
  uint64_t x;
  int nbytes;
  if ((b0 & 2) == 0) {
    // window reuse before any window was established, or a window that no
    // longer fits the type, is corrupt input (a valid encoder can't emit it);
    // without this guard the shifts below are UB on negative counts
    if (st.prev_leading < 0) return kErrCorruptGorilla;
    const int meaningful = st.type_bits - st.prev_leading - st.prev_trailing;
    if (meaningful < 1 || meaningful > st.type_bits) return kErrCorruptGorilla;
    nbytes = (2 + meaningful + 7) / 8;
    if (avail < static_cast<size_t>(nbytes)) return kErrTruncated;
    unsigned __int128 acc = 0;
    for (int k = 0; k < nbytes; ++k) acc |= static_cast<unsigned __int128>(p[k]) << (8 * k);
    const uint64_t bits = static_cast<uint64_t>(acc >> 2) &
        (meaningful >= 64 ? ~0ULL : ((1ULL << meaningful) - 1));
    x = bits << st.prev_trailing;
  } else {
    if (avail < 2) return kErrTruncated;
    const uint32_t head = p[0] | (static_cast<uint32_t>(p[1]) << 8);
    const int stored_lead = (head >> 2) & 0x1F;
    const int meaningful = ((head >> 7) & 0x3F) + 1;
    if (stored_lead + meaningful > st.type_bits) return kErrCorruptGorilla;
    nbytes = (13 + meaningful + 7) / 8;
    if (avail < static_cast<size_t>(nbytes)) return kErrTruncated;
    unsigned __int128 acc = 0;
    for (int k = 0; k < nbytes; ++k) acc |= static_cast<unsigned __int128>(p[k]) << (8 * k);
    const uint64_t bits = static_cast<uint64_t>(acc >> 13) &
        (meaningful >= 64 ? ~0ULL : ((1ULL << meaningful) - 1));
    const int trail = st.type_bits - stored_lead - meaningful;
    x = bits << trail;
    st.prev_leading = stored_lead;
    st.prev_trailing = trail;
  }
  const uint64_t v = x ^ st.prev_bits;
  st.prev_bits = v;
  *out = v;
  *consumed = nbytes;
  return 0;
}

// --- per-unit predictor state -----------------------------------------------

struct UnitState {
  int64_t prev_i64[4] = {0, 0, 0, 0};
  int32_t prev_i32[4] = {0, 0, 0, 0};
  uint64_t prev_bits = 0;
  GorillaState gorilla;
};

inline void store_le(uint8_t* dst, uint64_t v, int width) {
  for (int k = 0; k < width; ++k) dst[k] = static_cast<uint8_t>(v >> (8 * k));
}

inline uint64_t load_le(const uint8_t* src, int width) {
  uint64_t v = 0;
  for (int k = 0; k < width; ++k) v |= static_cast<uint64_t>(src[k]) << (8 * k);
  return v;
}

inline int64_t load_int_field(const uint8_t* src, int32_t type_code) {
  const int w = field_width(type_code);
  uint64_t u = load_le(src, w);
  const bool is_signed = (type_code == 1 || type_code == 3 || type_code == 5 || type_code == 9);
  if (is_signed && w < 8) {
    const uint64_t sign = 1ULL << (8 * w - 1);
    if (u & sign) u |= ~0ULL << (8 * w);
  }
  return static_cast<int64_t>(u);
}

// int64 delta arithmetic must WRAP (the wire encodes deltas mod 2^64), but
// signed overflow is UB in C++17 — compute in uint64 and cast back.
inline int64_t wrap_sub(int64_t a, int64_t b) {
  return static_cast<int64_t>(static_cast<uint64_t>(a) - static_cast<uint64_t>(b));
}

inline int64_t wrap_add(int64_t a, int64_t b) {
  return static_cast<int64_t>(static_cast<uint64_t>(a) + static_cast<uint64_t>(b));
}

}  // namespace

extern "C" {

// Decode one chunk's regular interleaved stream into row-major points.
// Returns bytes consumed (>=0) or an error (<0).
long long cldn_decode_chunk(
    const uint8_t* data, long long size, const UnitSpec* units, int n_units,
    uint8_t* out_rows, long long point_step, long long n_points) {
  UnitState* states = new UnitState[n_units];
  for (int u = 0; u < n_units; ++u) {
    if (units[u].kind == kGorilla) {
      states[u].gorilla.type_bits = field_width(units[u].type_code) * 8;
    }
  }

  long long pos = 0;
  long long err = 0;
  for (long long pt = 0; pt < n_points && err == 0; ++pt) {
    uint8_t* row = out_rows + pt * point_step;
    for (int u = 0; u < n_units && err == 0; ++u) {
      const UnitSpec& spec = units[u];
      UnitState& st = states[u];
      switch (spec.kind) {
        case kFloatNLossy: {
          for (int lane = 0; lane < spec.lanes; ++lane) {
            int64_t diff;
            bool is_nan;
            const int n = get_varint(data + pos, size - pos, &diff, &is_nan);
            if (n < 0) { err = n; break; }
            pos += n;
            if (is_nan) {
              st.prev_i32[lane] = 0;
              const uint32_t qnan = 0x7FC00000u;
              if (spec.offsets[lane] != kSkipStore) store_le(row + spec.offsets[lane], qnan, 4);
              continue;
            }
            const int32_t v = static_cast<int32_t>(
                static_cast<uint32_t>(diff) + static_cast<uint32_t>(st.prev_i32[lane]));
            st.prev_i32[lane] = v;
            const float f = static_cast<float>(v) * spec.res[lane];
            uint32_t bits;
            std::memcpy(&bits, &f, 4);
            if (spec.offsets[lane] != kSkipStore) store_le(row + spec.offsets[lane], bits, 4);
          }
        } break;
        case kFloatLossy: {
          const bool f64 = spec.type_code == 8;
          int64_t diff;
          bool is_nan;
          const int n = get_varint(data + pos, size - pos, &diff, &is_nan);
          if (n < 0) { err = n; break; }
          pos += n;
          if (is_nan) {
            st.prev_i64[0] = 0;
            if (spec.offsets[0] != kSkipStore) {
              if (f64) {
                store_le(row + spec.offsets[0], 0x7FF8000000000000ULL, 8);
              } else {
                store_le(row + spec.offsets[0], 0x7FC00000u, 4);
              }
            }
            break;
          }
          const int64_t v = wrap_add(st.prev_i64[0], diff);
          st.prev_i64[0] = v;
          if (spec.offsets[0] == kSkipStore) {
          } else if (f64) {
            const double f = static_cast<double>(v) * static_cast<double>(spec.res[0]);
            uint64_t bits;
            std::memcpy(&bits, &f, 8);
            store_le(row + spec.offsets[0], bits, 8);
          } else {
            const float f = static_cast<float>(v) * spec.res[0];
            uint32_t bits;
            std::memcpy(&bits, &f, 4);
            store_le(row + spec.offsets[0], bits, 4);
          }
        } break;
        case kIntDelta: {
          int64_t diff;
          bool is_nan;
          const int n = get_varint(data + pos, size - pos, &diff, &is_nan);
          if (n < 0) { err = n; break; }
          if (is_nan) { err = kErrNanMarker; break; }  // illegal in int lanes
          pos += n;
          const int64_t v = wrap_add(st.prev_i64[0], diff);
          st.prev_i64[0] = v;
          if (spec.offsets[0] != kSkipStore)
            store_le(row + spec.offsets[0], static_cast<uint64_t>(v), field_width(spec.type_code));
        } break;
        case kFloatXor: {
          const int w = field_width(spec.type_code);
          if (pos + w > size) { err = kErrTruncated; break; }
          const uint64_t resid = load_le(data + pos, w);
          pos += w;
          const uint64_t v = resid ^ st.prev_bits;
          st.prev_bits = v;
          if (spec.offsets[0] != kSkipStore) store_le(row + spec.offsets[0], v, w);
        } break;
        case kGorilla: {
          uint64_t v;
          int consumed;
          const int rc = gorilla_get(st.gorilla, data + pos, size - pos, &v, &consumed);
          if (rc < 0) { err = rc; break; }
          pos += consumed;
          if (spec.offsets[0] != kSkipStore) store_le(row + spec.offsets[0], v, field_width(spec.type_code));
        } break;
        case kCopy: {
          const int w = field_width(spec.type_code);
          if (pos + w > size) { err = kErrTruncated; break; }
          if (spec.offsets[0] != kSkipStore) std::memcpy(row + spec.offsets[0], data + pos, w);
          pos += w;
        } break;
        default:
          err = kErrBadUnit;
      }
    }
  }
  delete[] states;
  return err != 0 ? err : pos;
}

// Encode one chunk's regular interleaved stream. Returns bytes written or <0.
long long cldn_encode_chunk(
    const uint8_t* rows, long long point_step, long long n_points,
    const UnitSpec* units, int n_units, uint8_t* out, long long cap) {
  UnitState* states = new UnitState[n_units];
  float mult[64][4];
  for (int u = 0; u < n_units; ++u) {
    if (units[u].kind == kGorilla) {
      states[u].gorilla.type_bits = field_width(units[u].type_code) * 8;
    }
    if (units[u].kind == kFloatNLossy) {
      for (int lane = 0; lane < units[u].lanes; ++lane) {
        mult[u][lane] = 1.0f / units[u].res[lane];
      }
    } else if (units[u].kind == kFloatLossy) {
      mult[u][0] = 0;  // computed below per type
    }
  }

  long long pos = 0;
  long long err = 0;
  for (long long pt = 0; pt < n_points && err == 0; ++pt) {
    const uint8_t* row = rows + pt * point_step;
    for (int u = 0; u < n_units && err == 0; ++u) {
      const UnitSpec& spec = units[u];
      UnitState& st = states[u];
      if (cap - pos < 16 * 4) { err = kErrOutputFull; break; }
      switch (spec.kind) {
        case kFloatNLossy: {
          for (int lane = 0; lane < spec.lanes; ++lane) {
            float x;
            std::memcpy(&x, row + spec.offsets[lane], 4);
            if (std::isnan(x)) {
              out[pos++] = 0;
              st.prev_i32[lane] = 0;
              continue;
            }
            // SSE-equivalent: ties-to-even rounding, overflow -> INT32_MIN
            const float r = nearbyintf(x * mult[u][lane]);
            int32_t q;
            if (r >= -2147483648.0f && r < 2147483648.0f) {
              q = static_cast<int32_t>(r);
            } else {
              q = INT32_MIN;
            }
            const int32_t d = static_cast<int32_t>(
                static_cast<uint32_t>(q) - static_cast<uint32_t>(st.prev_i32[lane]));
            st.prev_i32[lane] = q;
            pos += put_varint(d, out + pos);
          }
        } break;
        case kFloatLossy: {
          const bool f64 = spec.type_code == 8;
          int64_t q;
          bool nan;
          if (f64) {
            double x;
            std::memcpy(&x, row + spec.offsets[0], 8);
            nan = std::isnan(x);
            const double m = 1.0 / static_cast<double>(spec.res[0]);
            q = nan ? 0 : static_cast<int64_t>(std::round(x * m));
          } else {
            float x;
            std::memcpy(&x, row + spec.offsets[0], 4);
            nan = std::isnan(x);
            const float m = static_cast<float>(1.0 / static_cast<double>(spec.res[0]));
            q = nan ? 0 : static_cast<int64_t>(roundf(x * m));
          }
          if (nan) {
            out[pos++] = 0;
            st.prev_i64[0] = 0;
            break;
          }
          const int64_t d = wrap_sub(q, st.prev_i64[0]);
          st.prev_i64[0] = q;
          pos += put_varint(d, out + pos);
        } break;
        case kIntDelta: {
          const int64_t v = load_int_field(row + spec.offsets[0], spec.type_code);
          const int64_t d = wrap_sub(v, st.prev_i64[0]);
          st.prev_i64[0] = v;
          pos += put_varint(d, out + pos);
        } break;
        case kFloatXor: {
          const int w = field_width(spec.type_code);
          const uint64_t v = load_le(row + spec.offsets[0], w);
          store_le(out + pos, v ^ st.prev_bits, w);
          st.prev_bits = v;
          pos += w;
        } break;
        case kGorilla: {
          const int w = field_width(spec.type_code);
          const uint64_t v = load_le(row + spec.offsets[0], w);
          const int n = gorilla_put(st.gorilla, v, out + pos, cap - pos);
          if (n < 0) { err = n; break; }
          pos += n;
        } break;
        case kCopy: {
          const int w = field_width(spec.type_code);
          std::memcpy(out + pos, row + spec.offsets[0], w);
          pos += w;
        } break;
        default:
          err = kErrBadUnit;
      }
    }
  }
  delete[] states;
  return err != 0 ? err : pos;
}

// V5 adaptive section encode: values of one int field for one chunk ->
// mode byte + payload (wire: v5_codec.cpp:33-38, 423-491; layout documented
// in cloudini_tpu/ref/v5.py which is the oracle for these bytes).
// Returns bytes written or <0.
long long cldn_v5_encode_section(
    const int64_t* signed_vals, const uint64_t* raw_vals, long long n,
    int mode, int bpv, uint8_t* out, long long cap) {
  long long pos = 0;
  auto put8 = [&](uint8_t b) -> bool {
    if (pos >= cap) return false;
    out[pos++] = b;
    return true;
  };
  auto put_raw = [&](uint64_t v) -> bool {
    if (pos + bpv > cap) return false;
    store_le(out + pos, v, bpv);
    pos += bpv;
    return true;
  };
  auto put_uvarint = [&](uint64_t u) -> bool {
    while (u > 0x7F) {
      if (!put8(static_cast<uint8_t>(u) | 0x80)) return false;
      u >>= 7;
    }
    return put8(static_cast<uint8_t>(u));
  };
  auto put_zigzag = [&](int64_t v) -> bool {
    // the +1 NaN-reservation bias, like put_varint
    if (pos + 10 > cap) return false;
    pos += put_varint(v, out + pos);
    return true;
  };

  if (!put8(static_cast<uint8_t>(mode))) return kErrOutputFull;
  switch (mode) {
    case 0: {  // DeltaVarint
      int64_t prev = 0;
      for (long long i = 0; i < n; ++i) {
        if (!put_zigzag(wrap_sub(signed_vals[i], prev))) return kErrOutputFull;
        prev = signed_vals[i];
      }
    } break;
    case 1: {  // Palette: u16 count + values (first occurrence) + packed idx
      // insertion-order open-addressing map over the raw u64 values
      size_t tab = 1;
      while (tab < static_cast<size_t>(2 * n + 2)) tab <<= 1;
      std::vector<uint64_t> keys(tab);
      std::vector<int32_t> slot_rank(tab, -1);
      std::vector<uint64_t> palette;
      std::vector<int32_t> idx(n);
      for (long long i = 0; i < n; ++i) {
        const uint64_t v = raw_vals[i];
        uint64_t h = v * 0x9E3779B97F4A7C15ULL;
        h ^= h >> 32;
        size_t s = static_cast<size_t>(h) & (tab - 1);
        for (;;) {
          if (slot_rank[s] < 0) {
            slot_rank[s] = static_cast<int32_t>(palette.size());
            keys[s] = v;
            palette.push_back(v);
            break;
          }
          if (keys[s] == v) break;
          s = (s + 1) & (tab - 1);
        }
        idx[i] = slot_rank[s];
      }
      const size_t count = palette.size();
      if (count == 0 || count > 0xFFFF) return kErrBadUnit;
      if (!put8(count & 0xFF) || !put8((count >> 8) & 0xFF)) return kErrOutputFull;
      for (uint64_t v : palette) {
        if (!put_raw(v)) return kErrOutputFull;
      }
      int bits = 0;
      while ((1ULL << bits) < count) ++bits;  // ceil(log2(count)), 0 for 1
      const long long nbytes = (static_cast<long long>(bits) * n + 7) / 8;
      if (pos + nbytes > cap) return kErrOutputFull;
      std::memset(out + pos, 0, nbytes);
      long long bitpos = 0;
      for (long long i = 0; i < n; ++i) {  // LSB-first
        uint32_t v = static_cast<uint32_t>(idx[i]);
        for (int b = 0; b < bits; ++b, ++bitpos) {
          out[pos + (bitpos >> 3)] |= ((v >> b) & 1) << (bitpos & 7);
        }
      }
      pos += nbytes;
    } break;
    case 2: {  // Rle: u32 run count + (raw value + uvarint length)*
      if (pos + 4 > cap) return kErrOutputFull;
      const long long rc_pos = pos;
      pos += 4;
      uint32_t runs = 0;
      long long i = 0;
      while (i < n) {
        long long j = i + 1;
        while (j < n && raw_vals[j] == raw_vals[i]) ++j;
        if (!put_raw(raw_vals[i]) || !put_uvarint(static_cast<uint64_t>(j - i)))
          return kErrOutputFull;
        ++runs;
        i = j;
      }
      store_le(out + rc_pos, runs, 4);
    } break;
    case 3: {  // DeltaRle: u32 run count + (zigzag diff + uvarint length)*
      if (pos + 4 > cap) return kErrOutputFull;
      const long long rc_pos = pos;
      pos += 4;
      uint32_t runs = 0;
      int64_t prev = 0;
      long long i = 0;
      while (i < n) {
        const int64_t d = wrap_sub(signed_vals[i], prev);
        long long j = i + 1;
        while (j < n && wrap_sub(signed_vals[j], signed_vals[j - 1]) == d) ++j;
        if (!put_zigzag(d) || !put_uvarint(static_cast<uint64_t>(j - i)))
          return kErrOutputFull;
        ++runs;
        prev = signed_vals[j - 1];
        i = j;
      }
      store_le(out + rc_pos, runs, 4);
    } break;
    default:
      return kErrBadUnit;
  }
  return pos;
}

// V5 adaptive-mode probe: size all four wire modes over the probe window and
// return the smallest (analyzeAdaptiveIntField + selectBestAdaptiveIntMode,
// reference v5_codec.cpp:387-412). Byte-for-byte the same size math as the
// numpy oracle (ref/v5.py analyze_modes); ties resolve in mode order
// DeltaVarint < Palette < Rle < DeltaRle like the oracle's strict '<'.
long long cldn_v5_analyze_modes(const int64_t* signed_vals,
                                const uint64_t* raw_vals, long long n,
                                int bpv) {
  if (n <= 0) return 0;
  auto zz = [](int64_t v) -> uint64_t {
    return ((static_cast<uint64_t>(v) << 1) ^ static_cast<uint64_t>(v >> 63)) +
           1;  // +1: raw 0 reserved for the NaN marker
  };
  auto vlen = [](uint64_t u) -> long long {
    long long l = 1;
    while (u > 0x7F) {
      u >>= 7;
      ++l;
    }
    return l;
  };
  long long delta_bytes = 1;
  long long palette_count = 0;
  size_t tab = 1;
  while (tab < static_cast<size_t>(2 * n + 2)) tab <<= 1;
  std::vector<uint64_t> keys(tab);
  std::vector<uint8_t> used(tab, 0);
  int64_t prev = 0;
  for (long long k = 0; k < n; ++k) {
    delta_bytes += vlen(zz(wrap_sub(signed_vals[k], prev)));
    prev = signed_vals[k];
    const uint64_t v = raw_vals[k];
    uint64_t h = v * 0x9E3779B97F4A7C15ULL;
    h ^= h >> 32;
    size_t s = static_cast<size_t>(h) & (tab - 1);
    for (;;) {
      if (!used[s]) {
        used[s] = 1;
        keys[s] = v;
        ++palette_count;
        break;
      }
      if (keys[s] == v) break;
      s = (s + 1) & (tab - 1);
    }
  }
  long long rle_bytes = 1 + 4;
  long long i = 0;
  while (i < n) {
    long long j = i + 1;
    while (j < n && raw_vals[j] == raw_vals[i]) ++j;
    rle_bytes += bpv + vlen(static_cast<uint64_t>(j - i));
    i = j;
  }
  long long drle_bytes = 1 + 4;
  prev = 0;
  i = 0;
  while (i < n) {
    const int64_t d = wrap_sub(signed_vals[i], prev);
    long long j = i + 1;
    while (j < n && wrap_sub(signed_vals[j], signed_vals[j - 1]) == d) ++j;
    drle_bytes += vlen(zz(d)) + vlen(static_cast<uint64_t>(j - i));
    prev = signed_vals[j - 1];
    i = j;
  }
  int bits = 0;
  while ((1LL << bits) < palette_count) ++bits;
  const long long palette_bytes =
      1 + 2 + palette_count * bpv + (static_cast<long long>(bits) * n + 7) / 8;
  int best_mode = 0;
  long long best = delta_bytes;
  if (palette_bytes < best) {
    best_mode = 1;
    best = palette_bytes;
  }
  if (rle_bytes < best) {
    best_mode = 2;
    best = rle_bytes;
  }
  if (drle_bytes < best) {
    best_mode = 3;
  }
  return best_mode;
}

// Extraction helper shared by the *_rows entry points: strided little-endian
// field bytes -> (sign-extended int64, zero-extended uint64) — the two views
// the reference keeps (v5_codec.cpp:680-688).
static void v5_extract(const uint8_t* rows, long long n, int point_step,
                       int offset, int bpv, int is_signed, int64_t* sv,
                       uint64_t* rv) {
  for (long long i = 0; i < n; ++i) {
    uint64_t u = 0;
    std::memcpy(&u, rows + i * point_step + offset, bpv);
    rv[i] = u;
    if (is_signed && bpv < 8) {
      const uint64_t sign = 1ULL << (8 * bpv - 1);
      sv[i] = static_cast<int64_t>((u ^ sign) - sign);
    } else {
      sv[i] = static_cast<int64_t>(u);
    }
  }
}

// Row-direct variants: extraction + probe/section-emit in one native call
// (the per-chunk numpy strided extraction cost ~0.6 ms of the 3.8 ms
// single-message p50, r5 latency profile).
long long cldn_v5_analyze_modes_rows(const uint8_t* rows, long long n,
                                     int point_step, int offset, int bpv,
                                     int is_signed) {
  if (n <= 0) return 0;
  std::vector<int64_t> sv(n);
  std::vector<uint64_t> rv(n);
  v5_extract(rows, n, point_step, offset, bpv, is_signed, sv.data(), rv.data());
  return cldn_v5_analyze_modes(sv.data(), rv.data(), n, bpv);
}

long long cldn_v5_encode_section_rows(const uint8_t* rows, long long n,
                                      int point_step, int offset, int bpv,
                                      int is_signed, int mode, uint8_t* out,
                                      long long cap) {
  if (n <= 0) return kErrBadUnit;
  std::vector<int64_t> sv(n);
  std::vector<uint64_t> rv(n);
  v5_extract(rows, n, point_step, offset, bpv, is_signed, sv.data(), rv.data());
  return cldn_v5_encode_section(sv.data(), rv.data(), n, mode, bpv, out, cap);
}

// Standalone Gorilla column encode: bits[n] -> byte-aligned stream.
// lengths[i] receives the per-value byte count. Returns total bytes or <0.
long long cldn_gorilla_encode_column(
    const uint64_t* bits, long long n, int type_bits, uint8_t* out, long long cap,
    int32_t* lengths) {
  GorillaState st;
  st.type_bits = type_bits;
  long long pos = 0;
  for (long long i = 0; i < n; ++i) {
    const int written = gorilla_put(st, bits[i], out + pos, cap - pos);
    if (written < 0) return written;
    lengths[i] = written;
    pos += written;
  }
  return pos;
}

long long cldn_gorilla_decode_column(
    const uint8_t* data, long long size, long long n, int type_bits, uint64_t* out) {
  GorillaState st;
  st.type_bits = type_bits;
  long long pos = 0;
  for (long long i = 0; i < n; ++i) {
    int consumed;
    const int rc = gorilla_get(st, data + pos, size - pos, &out[i], &consumed);
    if (rc < 0) return rc;
    pos += consumed;
  }
  return pos;
}

}  // extern "C"
