// kektor_native — host-side C++ runtime support.
//
// TPU-native replacement for the reference's native layer
// (native/compute/src/lib.rs: AVX2/FMA/NEON distance kernels exported over a
// C ABI; pkg/storage/mmap: the arena; pkg/persistence/frame.go: CRC-framed
// journal). The TPU owns the hot distance path (MXU matmuls in Pallas/XLA);
// this library covers what belongs on the host:
//
//   * vectorized f32 L2 / dot / cosine batch distances + exact top-k —
//     the CPU parity oracle for kernel tests and a fallback for tiny indexes
//   * slice-by-8 CRC32 and journal frame scanning/validation — makes AOF
//     replay and corruption resync IO-bound instead of Python-bound
//   * mmap arena file reader/writer — zero-copy host spill of vector blocks
//     (arena.go:378-446 semantics: 64-byte header, chunked f32 payload)
//
// Built as a plain shared library; Python binds with ctypes (no pybind11 in
// the image). All exports use a C ABI.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <cstdio>
#include <queue>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// distances
// ---------------------------------------------------------------------------

// Squared L2 between one query and n rows. out[n].
void kn_l2_batch(const float* q, const float* rows, int64_t n, int64_t d,
                 float* out) {
  for (int64_t i = 0; i < n; ++i) {
    const float* r = rows + i * d;
    float acc = 0.f;
#pragma omp simd reduction(+ : acc)
    for (int64_t j = 0; j < d; ++j) {
      float t = q[j] - r[j];
      acc += t * t;
    }
    out[i] = acc;
  }
}

void kn_dot_batch(const float* q, const float* rows, int64_t n, int64_t d,
                  float* out) {
  for (int64_t i = 0; i < n; ++i) {
    const float* r = rows + i * d;
    float acc = 0.f;
#pragma omp simd reduction(+ : acc)
    for (int64_t j = 0; j < d; ++j) acc += q[j] * r[j];
    out[i] = acc;
  }
}

// cosine distance on pre-normalized vectors: 1 - dot.
void kn_cosine_batch(const float* q, const float* rows, int64_t n, int64_t d,
                     float* out) {
  kn_dot_batch(q, rows, n, d, out);
  for (int64_t i = 0; i < n; ++i) out[i] = 1.f - out[i];
}

// int8 dot with int32 accumulation (reference dot_product_i8).
void kn_dot_i8_batch(const int8_t* q, const int8_t* rows, int64_t n,
                     int64_t d, int32_t* out) {
  for (int64_t i = 0; i < n; ++i) {
    const int8_t* r = rows + i * d;
    int32_t acc = 0;
#pragma omp simd reduction(+ : acc)
    for (int64_t j = 0; j < d; ++j)
      acc += static_cast<int32_t>(q[j]) * static_cast<int32_t>(r[j]);
    out[i] = acc;
  }
}

// Exact top-k (ascending distance). idx_out/dist_out have k slots.
void kn_topk(const float* dists, int64_t n, int64_t k, int32_t* idx_out,
             float* dist_out) {
  using P = std::pair<float, int32_t>;
  std::priority_queue<P> heap;  // max-heap of the best k
  for (int64_t i = 0; i < n; ++i) {
    if ((int64_t)heap.size() < k) {
      heap.emplace(dists[i], (int32_t)i);
    } else if (dists[i] < heap.top().first) {
      heap.pop();
      heap.emplace(dists[i], (int32_t)i);
    }
  }
  int64_t m = (int64_t)heap.size();
  for (int64_t i = m - 1; i >= 0; --i) {
    dist_out[i] = heap.top().first;
    idx_out[i] = heap.top().second;
    heap.pop();
  }
  for (int64_t i = m; i < k; ++i) {
    dist_out[i] = __builtin_inff();
    idx_out[i] = -1;
  }
}

// Brute-force search: queries [b, d] x rows [n, d] -> per-query top-k.
void kn_bruteforce_topk(const float* queries, int64_t b, const float* rows,
                        int64_t n, int64_t d, int64_t k, int metric,
                        int32_t* idx_out, float* dist_out) {
  std::vector<float> scratch(n);
  for (int64_t qi = 0; qi < b; ++qi) {
    const float* q = queries + qi * d;
    if (metric == 0)
      kn_l2_batch(q, rows, n, d, scratch.data());
    else
      kn_cosine_batch(q, rows, n, d, scratch.data());
    kn_topk(scratch.data(), n, k, idx_out + qi * k, dist_out + qi * k);
  }
}

// ---------------------------------------------------------------------------
// CRC32 (IEEE, zlib-compatible) — slice-by-8
// ---------------------------------------------------------------------------

static uint32_t crc_table[8][256];
static std::atomic<bool> crc_ready{false};

static void crc_init() {
  bool expected = false;
  static std::atomic<bool> building{false};
  if (crc_ready.load(std::memory_order_acquire)) return;
  if (building.exchange(true)) {
    while (!crc_ready.load(std::memory_order_acquire)) {}
    return;
  }
  for (uint32_t i = 0; i < 256; ++i) {
    uint32_t c = i;
    for (int j = 0; j < 8; ++j) c = (c >> 1) ^ (0xEDB88320u & (-(c & 1u)));
    crc_table[0][i] = c;
  }
  for (int t = 1; t < 8; ++t)
    for (uint32_t i = 0; i < 256; ++i)
      crc_table[t][i] =
          (crc_table[t - 1][i] >> 8) ^ crc_table[0][crc_table[t - 1][i] & 0xFF];
  crc_ready.store(true, std::memory_order_release);
  (void)expected;
}

uint32_t kn_crc32(const uint8_t* data, int64_t len, uint32_t seed) {
  crc_init();
  uint32_t c = ~seed;
  while (len >= 8) {
    uint32_t lo, hi;
    std::memcpy(&lo, data, 4);
    std::memcpy(&hi, data + 4, 4);
    lo ^= c;
    c = crc_table[7][lo & 0xFF] ^ crc_table[6][(lo >> 8) & 0xFF] ^
        crc_table[5][(lo >> 16) & 0xFF] ^ crc_table[4][lo >> 24] ^
        crc_table[3][hi & 0xFF] ^ crc_table[2][(hi >> 8) & 0xFF] ^
        crc_table[1][(hi >> 16) & 0xFF] ^ crc_table[0][hi >> 24];
    data += 8;
    len -= 8;
  }
  while (len-- > 0) c = (c >> 8) ^ crc_table[0][(c ^ *data++) & 0xFF];
  return ~c;
}

// ---------------------------------------------------------------------------
// journal frame scanning (frame layout: [A5][op u8][len u32][crc u32][payload])
// ---------------------------------------------------------------------------

static const uint8_t KN_MAGIC = 0xA5;
static const uint32_t KN_MAX_PAYLOAD = 1u << 30;

// Scan a buffer, writing (offset, payload_len, opcode) triples for every
// valid frame; resyncs past corruption by searching the next valid magic.
// Returns the number of frames found; *corrupt_regions counts resyncs.
int64_t kn_scan_frames(const uint8_t* buf, int64_t len, int64_t max_frames,
                       int64_t* offsets, int64_t* lengths, uint8_t* opcodes,
                       int64_t* corrupt_regions) {
  crc_init();
  int64_t pos = 0, found = 0, corrupt = 0;
  const int64_t HDR = 10;  // 1 + 1 + 4 + 4
  while (pos + HDR <= len && found < max_frames) {
    bool ok = false;
    if (buf[pos] == KN_MAGIC) {
      uint32_t plen, crc;
      std::memcpy(&plen, buf + pos + 2, 4);
      std::memcpy(&crc, buf + pos + 6, 4);
      if (plen <= KN_MAX_PAYLOAD && pos + HDR + plen <= len) {
        if (kn_crc32(buf + pos + HDR, plen, 0) == crc) {
          offsets[found] = pos + HDR;
          lengths[found] = plen;
          opcodes[found] = buf[pos + 1];
          ++found;
          pos += HDR + plen;
          ok = true;
        }
      }
    }
    if (!ok) {
      ++corrupt;
      // resync: find the next byte that parses as a valid frame
      int64_t scan = pos + 1;
      bool resynced = false;
      while (scan + HDR <= len) {
        if (buf[scan] == KN_MAGIC) {
          uint32_t plen, crc;
          std::memcpy(&plen, buf + scan + 2, 4);
          std::memcpy(&crc, buf + scan + 6, 4);
          if (plen <= KN_MAX_PAYLOAD && scan + HDR + plen <= len &&
              kn_crc32(buf + scan + HDR, plen, 0) == crc) {
            pos = scan;
            resynced = true;
            break;
          }
        }
        ++scan;
      }
      if (!resynced) break;
    }
  }
  if (corrupt_regions) *corrupt_regions = corrupt;
  return found;
}

// ---------------------------------------------------------------------------
// arena spill files (arena.go:14-20 header: magic, version, dim, precision)
// ---------------------------------------------------------------------------

static const uint32_t ARENA_MAGIC = 0x4B544E41;  // "KTNA"

int kn_arena_write(const char* path, const float* data, int64_t rows,
                   int64_t dim) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  uint32_t header[16] = {0};
  header[0] = ARENA_MAGIC;
  header[1] = 1;  // version
  header[2] = (uint32_t)dim;
  header[3] = 0;  // precision: f32
  std::memcpy(header + 4, &rows, 8);
  if (std::fwrite(header, sizeof(header), 1, f) != 1) {
    std::fclose(f);
    return -2;
  }
  size_t n = (size_t)rows * (size_t)dim;
  size_t wrote = std::fwrite(data, sizeof(float), n, f);
  std::fclose(f);
  return wrote == n ? 0 : -3;
}

// Reads rows [row_start, row_start+count) into out. Returns 0 on success.
int kn_arena_read(const char* path, int64_t row_start, int64_t count,
                  float* out, int64_t* dim_out, int64_t* rows_out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  uint32_t header[16];
  if (std::fread(header, sizeof(header), 1, f) != 1 ||
      header[0] != ARENA_MAGIC) {
    std::fclose(f);
    return -2;
  }
  int64_t dim = header[2], rows;
  std::memcpy(&rows, header + 4, 8);
  if (dim_out) *dim_out = dim;
  if (rows_out) *rows_out = rows;
  if (count > 0) {
    if (row_start + count > rows) {
      std::fclose(f);
      return -3;
    }
    std::fseek(f, (long)(sizeof(header) + row_start * dim * sizeof(float)),
               SEEK_SET);
    size_t n = (size_t)count * (size_t)dim;
    if (std::fread(out, sizeof(float), n, f) != n) {
      std::fclose(f);
      return -4;
    }
  }
  std::fclose(f);
  return 0;
}

}  // extern "C"
