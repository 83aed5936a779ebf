// tfplus_native — C++ host-side helpers for the TPU-native framework.
//
// Native equivalents of the reference's C++ host components that still
// matter in a TPU design (the table engine itself moved on-device):
//   * 64-bit key fingerprinting for string features
//     (reference: utility.h:96-112 ModKeyImpl via Fingerprint64)
//   * CRC32 (zlib polynomial, slice-by-8) for the checkpoint bundle
//     (reference: forked TensorBundle per-segment CRC, tensor_bundle.cc)
//   * a high-throughput Criteo TSV batch parser feeding the input pipeline
//     (reference ingests Criteo via TF ops; Python line parsing is ~50x
//     slower than this)
//
// Exposed as a plain C ABI consumed via ctypes (tfplus_tpu/io/native.py).
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <cmath>

extern "C" {

// ---------------------------------------------------------------------------
// FNV-1a 64-bit fingerprint (string feature keys -> uint64 id space)
// ---------------------------------------------------------------------------

static inline uint64_t fnv1a64(const char* s, int64_t n) {
  uint64_t h = 0xCBF29CE484222325ULL;
  for (int64_t i = 0; i < n; ++i) {
    h ^= (uint64_t)(uint8_t)s[i];
    h *= 0x100000001B3ULL;
  }
  return h;
}

uint64_t tfp_fnv1a64(const char* s, int64_t n) { return fnv1a64(s, n); }

// Batch variant: `offsets` has n+1 entries into `buf`.
void tfp_fnv1a64_batch(const char* buf, const int64_t* offsets, int64_t n,
                       uint64_t* out) {
  for (int64_t i = 0; i < n; ++i) {
    out[i] = fnv1a64(buf + offsets[i], offsets[i + 1] - offsets[i]);
  }
}

// ---------------------------------------------------------------------------
// CRC32 (zlib polynomial 0xEDB88320), slice-by-8
// ---------------------------------------------------------------------------

static uint32_t kCrcTab[8][256];
static bool crc_init_done = false;

static void crc_init() {
  for (uint32_t i = 0; i < 256; ++i) {
    uint32_t c = i;
    for (int k = 0; k < 8; ++k) c = (c & 1) ? 0xEDB88320u ^ (c >> 1) : c >> 1;
    kCrcTab[0][i] = c;
  }
  for (uint32_t i = 0; i < 256; ++i) {
    uint32_t c = kCrcTab[0][i];
    for (int t = 1; t < 8; ++t) {
      c = kCrcTab[0][c & 0xFF] ^ (c >> 8);
      kCrcTab[t][i] = c;
    }
  }
  crc_init_done = true;
}

uint32_t tfp_crc32(const uint8_t* data, int64_t n, uint32_t seed) {
  if (!crc_init_done) crc_init();
  uint32_t c = seed ^ 0xFFFFFFFFu;
  while (n >= 8) {
    uint32_t lo, hi;
    memcpy(&lo, data, 4);
    memcpy(&hi, data + 4, 4);
    lo ^= c;
    c = kCrcTab[7][lo & 0xFF] ^ kCrcTab[6][(lo >> 8) & 0xFF] ^
        kCrcTab[5][(lo >> 16) & 0xFF] ^ kCrcTab[4][lo >> 24] ^
        kCrcTab[3][hi & 0xFF] ^ kCrcTab[2][(hi >> 8) & 0xFF] ^
        kCrcTab[1][(hi >> 16) & 0xFF] ^ kCrcTab[0][hi >> 24];
    data += 8;
    n -= 8;
  }
  while (n--) c = kCrcTab[0][(c ^ *data++) & 0xFF] ^ (c >> 8);
  return c ^ 0xFFFFFFFFu;
}

// ---------------------------------------------------------------------------
// Criteo TSV batch parser
//   line := label \t I1..I13 \t C1..C26      (ints may be empty; cats hex)
// Outputs match tfplus_tpu/data/criteo.py: numeric = log1p(max(v,0)),
// cats = (fnv1a64(str) & (2^40-1)) | column_tag<<40, 0 for empty.
// Returns number of rows parsed; *consumed = bytes of `buf` used (complete
// lines only, so callers can re-feed the remainder).
// ---------------------------------------------------------------------------

int64_t tfp_parse_criteo(const char* buf, int64_t len, int64_t max_rows,
                         float* numeric /*[max_rows,13]*/,
                         int64_t* cats /*[max_rows,26]*/,
                         float* labels /*[max_rows]*/, int64_t* consumed) {
  int64_t pos = 0, rows = 0;
  *consumed = 0;
  while (rows < max_rows) {
    // find end of line
    int64_t eol = pos;
    while (eol < len && buf[eol] != '\n') ++eol;
    if (eol >= len) break;  // incomplete line
    const char* p = buf + pos;
    const char* end = buf + eol;

    int field = 0;
    bool ok = true;
    float* nrow = numeric + rows * 13;
    int64_t* crow = cats + rows * 26;
    while (p <= end && field < 40) {
      const char* fstart = p;
      while (p < end && *p != '\t') ++p;
      int64_t flen = p - fstart;
      if (field == 0) {
        labels[rows] = flen ? (float)strtod(fstart, nullptr) : 0.0f;
      } else if (field <= 13) {
        if (flen) {
          double v = strtod(fstart, nullptr);
          nrow[field - 1] = (float)log1p(v > 0 ? v : 0.0);
        } else {
          nrow[field - 1] = 0.0f;
        }
      } else {
        int c = field - 14;
        uint64_t h = flen ? fnv1a64(fstart, flen) : 0;
        crow[c] = (int64_t)((h & ((1ULL << 40) - 1)) | ((uint64_t)c << 40));
      }
      ++field;
      if (p < end) ++p;  // skip tab
      else break;
    }
    if (field < 40) ok = false;  // malformed line -> skip
    pos = eol + 1;
    *consumed = pos;
    if (ok) ++rows;
  }
  return rows;
}

}  // extern "C"
