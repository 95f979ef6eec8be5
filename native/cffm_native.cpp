// Native data-path for cffm-tpu: TSV/CSV parsing + feature hashing.
//
// The input pipeline must feed >=1M examples/s (SURVEY.md §8 hard part
// #5: "host CPU can become the bottleneck before the TPU does");
// Python-level line splitting tops out far below that. This library
// parses raw Criteo/Avazu text buffers directly into the int32/float32
// batch arrays the device consumes. Semantics bit-match
// cffm_tpu/data/hashing.py (FNV-1a, log^2 bucketization) — enforced by
// tests/test_native_loader.py.
//
// Build: make -C native   (or the auto-build in cffm_tpu/data/native.py)

#include <cmath>
#include <cstdint>
#include <cstring>

namespace {

constexpr uint64_t kFnvPrime = 0x100000001B3ull;
constexpr uint64_t kFnvOffset = 0xCBF29CE484222325ull;

inline uint64_t fnv1a(const char* s, long n) {
  uint64_t h = kFnvOffset;
  for (long i = 0; i < n; ++i) {
    h = (h ^ static_cast<unsigned char>(s[i])) * kFnvPrime;
  }
  return h;
}

// Criteo-style integer bucketization; matches hashing.bucketize_log2.
inline int32_t bucketize_log2(long v, long num_buckets) {
  double out;
  if (v > 2) {
    double lg = std::log(static_cast<double>(v));
    out = std::floor(lg * lg) + 3.0;
  } else {
    out = static_cast<double>((v < -1 ? -1 : v) + 1);
  }
  long o = static_cast<long>(out);
  if (o < 0) o = 0;
  if (o >= num_buckets) o = num_buckets - 1;
  return static_cast<int32_t>(o);
}

// Parse a (possibly empty/negative) integer field; empty -> fallback.
inline long parse_int(const char* s, long n, long fallback) {
  if (n <= 0) return fallback;
  long sign = 1, i = 0, v = 0;
  if (s[0] == '-') { sign = -1; i = 1; }
  for (; i < n; ++i) {
    char c = s[i];
    if (c < '0' || c > '9') break;
    v = v * 10 + (c - '0');
  }
  return sign * v;
}

// Sakamoto's algorithm (0 = Sunday); bit-matches
// cffm_tpu/data/readers.py day_of_week_yymmdd (years 2000-2099).
inline int32_t day_of_week_yymmdd(long yymmdd) {
  static const int t[12] = {0, 3, 2, 5, 0, 3, 5, 1, 4, 6, 2, 4};
  long y = 2000 + yymmdd / 10000;
  long m = (yymmdd / 100) % 100;
  long d = yymmdd % 100;
  if (m < 1) m = 1;
  if (m > 12) m = 12;
  if (m < 3) y -= 1;
  return static_cast<int32_t>((y + y / 4 - y / 100 + y / 400 + t[m - 1] + d) % 7);
}

}  // namespace

extern "C" {

// Hash a packed array of strings (offsets into one byte buffer).
void fnv_hash_batch(const char* buf, const long* starts, const long* ends,
                    long n, long num_buckets, int32_t* out) {
  for (long i = 0; i < n; ++i) {
    uint64_t h = fnv1a(buf + starts[i], ends[i] - starts[i]);
    out[i] = static_cast<int32_t>(h % static_cast<uint64_t>(num_buckets));
  }
}

// Criteo TSV: label \t 13 ints \t 26 categorical, '\n' rows.
// Returns number of rows parsed (<= batch_cap). `consumed` gets the
// byte offset just past the last parsed row.
long parse_criteo(const char* buf, long len, long batch_cap,
                  const long* vocab_sizes,  // 39 entries
                  int32_t* out_ids,         // (batch_cap, 39)
                  float* out_dense,         // (batch_cap, 13) or nullptr
                  float* out_labels,        // (batch_cap,)
                  long* consumed) {
  long row = 0;
  long pos = 0;
  while (row < batch_cap && pos < len) {
    // find end of line
    const char* nl = static_cast<const char*>(
        memchr(buf + pos, '\n', static_cast<size_t>(len - pos)));
    if (nl == nullptr) break;  // incomplete row: stop
    long line_end = nl - buf;

    long field_start = pos;
    int field = 0;
    bool ok = true;
    int32_t* ids = out_ids + row * 39;
    for (long i = pos; i <= line_end && field <= 39; ++i) {
      if (i == line_end || buf[i] == '\t') {
        const char* s = buf + field_start;
        long flen = i - field_start;
        if (field == 0) {
          out_labels[row] = static_cast<float>(parse_int(s, flen, 0));
        } else if (field <= 13) {
          long v = parse_int(s, flen, -1);
          ids[field - 1] = bucketize_log2(v, vocab_sizes[field - 1]);
          if (out_dense != nullptr) {
            double d = v > 0 ? static_cast<double>(v) : 0.0;
            out_dense[row * 13 + (field - 1)] =
                static_cast<float>(std::log1p(d));
          }
        } else if (field <= 39) {
          uint64_t h = fnv1a(s, flen);
          ids[field - 1] =
              static_cast<int32_t>(h % static_cast<uint64_t>(vocab_sizes[field - 1]));
        }
        ++field;
        field_start = i + 1;
      }
    }
    if (field < 40) ok = false;  // malformed row: skip it
    if (ok) ++row;
    pos = line_end + 1;
  }
  *consumed = pos;
  return row;
}

// Avazu CSV: id,click,hour(YYMMDDHH),C1,...,C21 (24 cols), header handled
// by caller. 23 output fields: hour-of-day, day-of-week proxy, 21 hashed.
long parse_avazu(const char* buf, long len, long batch_cap,
                 const long* vocab_sizes,  // 23 entries
                 int32_t* out_ids,         // (batch_cap, 23)
                 float* out_labels,        // (batch_cap,)
                 long* consumed) {
  long row = 0;
  long pos = 0;
  while (row < batch_cap && pos < len) {
    const char* nl = static_cast<const char*>(
        memchr(buf + pos, '\n', static_cast<size_t>(len - pos)));
    if (nl == nullptr) break;
    long line_end = nl - buf;

    long field_start = pos;
    int field = 0;
    int32_t* ids = out_ids + row * 23;
    bool ok = true;
    for (long i = pos; i <= line_end && field <= 24; ++i) {
      if (i == line_end || buf[i] == ',') {
        const char* s = buf + field_start;
        long flen = i - field_start;
        if (field == 1) {
          out_labels[row] = static_cast<float>(parse_int(s, flen, 0));
        } else if (field == 2) {
          if (flen >= 8) {
            long hh = parse_int(s + flen - 2, 2, 0);
            long yymmdd = parse_int(s, 6, 0);
            long v0 = vocab_sizes[0] - 1;
            ids[0] = static_cast<int32_t>(hh < v0 ? hh : v0);
            long dow = day_of_week_yymmdd(yymmdd);
            long v1 = vocab_sizes[1] - 1;
            ids[1] = static_cast<int32_t>(dow < v1 ? dow : v1);
          } else {
            ok = false;
          }
        } else if (field >= 3 && field <= 23) {
          uint64_t h = fnv1a(s, flen);
          ids[field - 1] =
              static_cast<int32_t>(h % static_cast<uint64_t>(vocab_sizes[field - 1]));
        }
        ++field;
        field_start = i + 1;
      }
    }
    if (field < 24) ok = false;
    if (ok) ++row;
    pos = line_end + 1;
  }
  *consumed = pos;
  return row;
}

}  // extern "C"
