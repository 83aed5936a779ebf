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
// FarmHash Fingerprint64 (the farmhashna::Hash64 algorithm) — implemented
// from the published FarmHash specification so STRING feature ids match the
// reference's utility.h ModKeyImpl (farmhash::Fingerprint64) and TFPlus
// checkpoints containing string-hashed keys import with identical routing.
// Verified in tests against tf.fingerprint(method="farmhash64").
// ---------------------------------------------------------------------------

static const uint64_t kFH0 = 0xc3a5c85c97cb3127ULL;
static const uint64_t kFH1 = 0xb492b66fbe98f273ULL;
static const uint64_t kFH2 = 0x9ae16a3b2f90404fULL;

static inline uint64_t fh_fetch64(const char* p) {
  uint64_t v;
  memcpy(&v, p, 8);
  return v;  // little-endian hosts only (this image)
}
static inline uint32_t fh_fetch32(const char* p) {
  uint32_t v;
  memcpy(&v, p, 4);
  return v;
}
static inline uint64_t fh_rot(uint64_t v, int s) {
  return s == 0 ? v : (v >> s) | (v << (64 - s));
}
static inline uint64_t fh_shiftmix(uint64_t v) { return v ^ (v >> 47); }
static inline uint64_t fh_len16(uint64_t u, uint64_t v, uint64_t mul) {
  uint64_t a = (u ^ v) * mul;
  a ^= a >> 47;
  uint64_t b = (v ^ a) * mul;
  b ^= b >> 47;
  return b * mul;
}

static uint64_t fh_len0to16(const char* s, int64_t len) {
  if (len >= 8) {
    uint64_t mul = kFH2 + (uint64_t)len * 2;
    uint64_t a = fh_fetch64(s) + kFH2;
    uint64_t b = fh_fetch64(s + len - 8);
    uint64_t c = fh_rot(b, 37) * mul + a;
    uint64_t d = (fh_rot(a, 25) + b) * mul;
    return fh_len16(c, d, mul);
  }
  if (len >= 4) {
    uint64_t mul = kFH2 + (uint64_t)len * 2;
    uint64_t a = fh_fetch32(s);
    return fh_len16((uint64_t)len + (a << 3), fh_fetch32(s + len - 4), mul);
  }
  if (len > 0) {
    uint8_t a = (uint8_t)s[0];
    uint8_t b = (uint8_t)s[len >> 1];
    uint8_t c = (uint8_t)s[len - 1];
    uint32_t y = (uint32_t)a + ((uint32_t)b << 8);
    uint32_t z = (uint32_t)len + ((uint32_t)c << 2);
    return fh_shiftmix((uint64_t)y * kFH2 ^ (uint64_t)z * kFH0) * kFH2;
  }
  return kFH2;
}

static uint64_t fh_len17to32(const char* s, int64_t len) {
  uint64_t mul = kFH2 + (uint64_t)len * 2;
  uint64_t a = fh_fetch64(s) * kFH1;
  uint64_t b = fh_fetch64(s + 8);
  uint64_t c = fh_fetch64(s + len - 8) * mul;
  uint64_t d = fh_fetch64(s + len - 16) * kFH2;
  return fh_len16(fh_rot(a + b, 43) + fh_rot(c, 30) + d,
                  a + fh_rot(b + kFH2, 18) + c, mul);
}

static uint64_t fh_len33to64(const char* s, int64_t len) {
  uint64_t mul = kFH2 + (uint64_t)len * 2;
  uint64_t a = fh_fetch64(s) * kFH2;
  uint64_t b = fh_fetch64(s + 8);
  uint64_t c = fh_fetch64(s + len - 8) * mul;
  uint64_t d = fh_fetch64(s + len - 16) * kFH2;
  uint64_t y = fh_rot(a + b, 43) + fh_rot(c, 30) + d;
  uint64_t z = fh_len16(y, a + fh_rot(b + kFH2, 18) + c, mul);
  uint64_t e = fh_fetch64(s + 16) * mul;
  uint64_t f = fh_fetch64(s + 24);
  uint64_t g = (y + fh_fetch64(s + len - 32)) * mul;
  uint64_t h = (z + fh_fetch64(s + len - 24)) * mul;
  return fh_len16(fh_rot(e + f, 43) + fh_rot(g, 30) + h,
                  e + fh_rot(f + a, 18) + g, mul);
}

static inline void fh_weak32(uint64_t w, uint64_t x, uint64_t y, uint64_t z,
                             uint64_t a, uint64_t b, uint64_t* o1,
                             uint64_t* o2) {
  a += w;
  b = fh_rot(b + a + z, 21);
  uint64_t c = a;
  a += x;
  a += y;
  b += fh_rot(a, 44);
  *o1 = a + z;
  *o2 = b + c;
}

static inline void fh_weak32s(const char* s, uint64_t a, uint64_t b,
                              uint64_t* o1, uint64_t* o2) {
  fh_weak32(fh_fetch64(s), fh_fetch64(s + 8), fh_fetch64(s + 16),
            fh_fetch64(s + 24), a, b, o1, o2);
}

static uint64_t farmhash64(const char* s, int64_t len) {
  if (len <= 16) return fh_len0to16(s, len);
  if (len <= 32) return fh_len17to32(s, len);
  if (len <= 64) return fh_len33to64(s, len);
  const uint64_t seed = 81;
  uint64_t x = seed;
  uint64_t y = seed * kFH1 + 113;
  uint64_t z = fh_shiftmix(y * kFH2 + 113) * kFH2;
  uint64_t v1 = 0, v2 = 0, w1 = 0, w2 = 0;
  x = x * kFH2 + fh_fetch64(s);
  const char* end = s + ((len - 1) / 64) * 64;
  const char* last64 = end + ((len - 1) & 63) - 63;
  do {
    x = fh_rot(x + y + v1 + fh_fetch64(s + 8), 37) * kFH1;
    y = fh_rot(y + v2 + fh_fetch64(s + 48), 42) * kFH1;
    x ^= w2;
    y += v1 + fh_fetch64(s + 40);
    z = fh_rot(z + w1, 33) * kFH1;
    fh_weak32s(s, v2 * kFH1, x + w1, &v1, &v2);
    fh_weak32s(s + 32, z + w2, y + fh_fetch64(s + 16), &w1, &w2);
    uint64_t t = z;
    z = x;
    x = t;
    s += 64;
  } while (s != end);
  uint64_t mul = kFH1 + ((z & 0xff) << 1);
  s = last64;
  w1 += (uint64_t)((len - 1) & 63);
  v1 += w1;
  w1 += v1;
  x = fh_rot(x + y + v1 + fh_fetch64(s + 8), 37) * mul;
  y = fh_rot(y + v2 + fh_fetch64(s + 48), 42) * mul;
  x ^= w2 * 9;
  y += v1 * 9 + fh_fetch64(s + 40);
  z = fh_rot(z + w1, 33) * mul;
  fh_weak32s(s, v2 * mul, x + w1, &v1, &v2);
  fh_weak32s(s + 32, z + w2, y + fh_fetch64(s + 16), &w1, &w2);
  uint64_t t = z;
  z = x;
  x = t;
  return fh_len16(fh_len16(v1, w1, mul) + fh_shiftmix(y) * kFH0 + z,
                  fh_len16(v2, w2, mul) + x, mul);
}

uint64_t tfp_farmhash64(const char* s, int64_t n) { return farmhash64(s, n); }

void tfp_farmhash64_batch(const char* buf, const int64_t* offsets, int64_t n,
                          uint64_t* out) {
  for (int64_t i = 0; i < n; ++i) {
    out[i] = farmhash64(buf + offsets[i], offsets[i + 1] - offsets[i]);
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


// ---------------------------------------------------------------------------
// Multithreaded prefetching Criteo loader — the native data-loader runtime.
//
// Reference counterpart: TFPlus feeds Criteo through TF's C++ tf.data
// runtime (example/dcn/train.py builds a TextLineDataset input_fn); the
// TPU-native framework has no TF runtime, so this supplies the equivalent:
// a reader thread streams the file in ~4 MB line-aligned chunks, a pool of
// parser threads turns chunks into row blocks (same field semantics as
// tfp_parse_criteo above), and a bounded queue hands blocks to the trainer.
// Row ORDER ACROSS CHUNKS IS NOT PRESERVED when threads > 1 (irrelevant for
// shuffled training; use threads=1 for deterministic order).
// ---------------------------------------------------------------------------

}  // extern "C"   (C++ internals below; C ABI re-opened at the end)

#include <condition_variable>
#include <cstdio>
#include <deque>
#include <memory>
#include <mutex>
#include <thread>
#include <vector>

namespace {

struct RowBlock {
  int64_t n = 0;
  std::vector<float> numeric;   // [n, 13]
  std::vector<int64_t> cats;    // [n, 26]
  std::vector<float> labels;    // [n]
};

struct Chunk {
  std::vector<char> data;
};

constexpr int64_t kChunkBytes = 4 << 20;

struct Loader {
  FILE* f = nullptr;
  int64_t queue_cap = 8;
  bool reader_done = false;
  int active_parsers = 0;
  std::mutex mu;
  std::condition_variable cv_chunk_space, cv_chunk_avail, cv_block_avail,
      cv_block_space;
  std::deque<std::unique_ptr<Chunk>> chunks;
  std::deque<std::unique_ptr<RowBlock>> blocks;
  std::unique_ptr<RowBlock> partial;  // handed-out remainder
  int64_t partial_off = 0;
  std::vector<std::thread> threads;
  bool closing = false;

  void reader() {
    std::vector<char> carry;
    while (true) {
      auto ck = std::make_unique<Chunk>();
      ck->data.resize(carry.size() + kChunkBytes);
      memcpy(ck->data.data(), carry.data(), carry.size());
      size_t got = fread(ck->data.data() + carry.size(), 1, kChunkBytes, f);
      int64_t total = (int64_t)(carry.size() + got);
      carry.clear();
      if (total == 0) break;
      ck->data.resize(total);
      if (got > 0) {
        // cut at the last newline; carry the tail to the next chunk
        int64_t cut = total;
        while (cut > 0 && ck->data[cut - 1] != '\n') --cut;
        if (cut == 0) { // pathological single long line; keep growing
          carry.assign(ck->data.begin(), ck->data.end());
          continue;
        }
        carry.assign(ck->data.begin() + cut, ck->data.end());
        ck->data.resize(cut);
      } else if (total > 0 && ck->data[total - 1] != '\n') {
        ck->data.push_back('\n');  // EOF without trailing newline
      }
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_chunk_space.wait(lk, [&] {
          return closing || (int64_t)chunks.size() < queue_cap; });
        if (closing) return;
        chunks.push_back(std::move(ck));
        cv_chunk_avail.notify_one();
      }
      if (got == 0) break;
    }
    std::unique_lock<std::mutex> lk(mu);
    reader_done = true;
    cv_chunk_avail.notify_all();
  }

  void parser() {
    while (true) {
      std::unique_ptr<Chunk> ck;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_chunk_avail.wait(lk, [&] {
          return closing || !chunks.empty() || reader_done; });
        if (closing) return;
        if (chunks.empty()) {  // reader done and queue drained
          if (--active_parsers == 0) cv_block_avail.notify_all();
          return;
        }
        ck = std::move(chunks.front());
        chunks.pop_front();
        cv_chunk_space.notify_one();
      }
      auto blk = std::make_unique<RowBlock>();
      int64_t max_rows = 1 + (int64_t)ck->data.size() / 20;  // lower bound ~20B/line
      blk->numeric.resize(max_rows * 13);
      blk->cats.resize(max_rows * 26);
      blk->labels.resize(max_rows);
      int64_t consumed = 0;
      blk->n = tfp_parse_criteo(ck->data.data(), (int64_t)ck->data.size(),
                                max_rows, blk->numeric.data(),
                                blk->cats.data(), blk->labels.data(),
                                &consumed);
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_block_space.wait(lk, [&] {
          return closing || (int64_t)blocks.size() < queue_cap; });
        if (closing) return;
        if (blk->n) {
          blocks.push_back(std::move(blk));
          cv_block_avail.notify_one();
        }
      }
    }
  }

  // Fill caller buffers with up to `want` rows; 0 => end of stream.
  int64_t next(int64_t want, float* numeric, int64_t* cats, float* labels) {
    int64_t filled = 0;
    while (filled < want) {
      if (!partial) {
        std::unique_lock<std::mutex> lk(mu);
        cv_block_avail.wait(lk, [&] {
          return !blocks.empty() || active_parsers == 0 || closing; });
        if (closing) break;
        if (blocks.empty()) break;  // drained + all parsers exited
        partial = std::move(blocks.front());
        blocks.pop_front();
        partial_off = 0;
        cv_block_space.notify_all();
      }
      int64_t take = std::min(want - filled, partial->n - partial_off);
      memcpy(numeric + filled * 13, partial->numeric.data() + partial_off * 13,
             take * 13 * sizeof(float));
      memcpy(cats + filled * 26, partial->cats.data() + partial_off * 26,
             take * 26 * sizeof(int64_t));
      memcpy(labels + filled, partial->labels.data() + partial_off,
             take * sizeof(float));
      filled += take;
      partial_off += take;
      if (partial_off >= partial->n) { partial.reset(); partial_off = 0; }
    }
    return filled;
  }
};

}  // namespace

extern "C" {

void* tfp_loader_open(const char* path, int threads, int64_t queue_cap) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  auto* L = new Loader();
  L->f = f;
  if (queue_cap > 0) L->queue_cap = queue_cap;
  if (threads < 1) threads = 1;
  L->active_parsers = threads;
  L->threads.emplace_back([L] { L->reader(); });
  for (int i = 0; i < threads; ++i)
    L->threads.emplace_back([L] { L->parser(); });
  return L;
}

int64_t tfp_loader_next(void* loader, int64_t want, float* numeric,
                        int64_t* cats, float* labels) {
  if (!loader) return -1;
  return static_cast<Loader*>(loader)->next(want, numeric, cats, labels);
}

void tfp_loader_close(void* loader) {
  if (!loader) return;
  auto* L = static_cast<Loader*>(loader);
  {
    std::unique_lock<std::mutex> lk(L->mu);
    L->closing = true;
    L->cv_chunk_space.notify_all();
    L->cv_chunk_avail.notify_all();
    L->cv_block_space.notify_all();
    L->cv_block_avail.notify_all();
  }
  for (auto& t : L->threads) t.join();
  fclose(L->f);
  delete L;
}

}  // extern "C"
