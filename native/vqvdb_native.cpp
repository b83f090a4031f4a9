// vqvdb_native — native host runtime for vqvdb_tpu.
//
// The reference implements its host hot loops in C++: TBB-parallel leaf
// gather/scatter between OpenVDB trees and batch buffers
// (src/orchestrator/VQVAECodec.cpp) and buffered interleaved chunk IO for
// the .vqvdb container (src/Utils/VQVDB_Reader.cpp). This library is the
// TPU-host equivalent, exposed as a plain C ABI consumed via ctypes
// (vqvdb_tpu/runtime/native_io.py):
//
//   * interleave / deinterleave of (origin, indices) chunks — single pass,
//     no intermediate numpy temporaries;
//   * dense<->leaf gather/scatter for 8^3 blocks — cache-friendly row
//     copies (64 rows of 8 floats per leaf), threaded over leaves;
//   * streamed file write of interleaved chunks.
//
// Build: native/build.sh -> vqvdb_tpu/native/libvqvdb_native.so
// Pure-numpy fallbacks exist for every entry point; behaviour must match
// bit-for-bit (tests/test_native_io.py).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int kLeafDim = 8;
constexpr int kOriginBytes = 3 * sizeof(int32_t);

// Run fn(start, end) over [0, n) on up to `threads` workers.
template <typename Fn>
void parallel_range(int64_t n, Fn fn, int threads) {
  if (threads <= 1 || n < 1024) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> pool;
  const int64_t chunk = (n + threads - 1) / threads;
  for (int t = 0; t < threads; ++t) {
    const int64_t s = t * chunk;
    const int64_t e = std::min(n, s + chunk);
    if (s >= e) break;
    pool.emplace_back([=] { fn(s, e); });
  }
  for (auto& th : pool) th.join();
}

int hw_threads() {
  const unsigned n = std::thread::hardware_concurrency();
  return n == 0 ? 1 : static_cast<int>(n);
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// Chunk interleave: (origins i32[n,3], indices u8[n,block]) -> u8[n, 12+block]
// ---------------------------------------------------------------------------
void vq_interleave(const int32_t* origins, const uint8_t* indices, int64_t n,
                   int64_t block_bytes, uint8_t* out) {
  const int64_t chunk = kOriginBytes + block_bytes;
  parallel_range(
      n,
      [=](int64_t s, int64_t e) {
        for (int64_t i = s; i < e; ++i) {
          uint8_t* dst = out + i * chunk;
          std::memcpy(dst, origins + i * 3, kOriginBytes);
          std::memcpy(dst + kOriginBytes, indices + i * block_bytes,
                      block_bytes);
        }
      },
      hw_threads());
}

// ---------------------------------------------------------------------------
// Chunk deinterleave: u8[n, 12+block] -> (origins i32[n,3], indices u8[n,block])
// ---------------------------------------------------------------------------
void vq_deinterleave(const uint8_t* raw, int64_t n, int64_t block_bytes,
                     int32_t* origins, uint8_t* indices) {
  const int64_t chunk = kOriginBytes + block_bytes;
  parallel_range(
      n,
      [=](int64_t s, int64_t e) {
        for (int64_t i = s; i < e; ++i) {
          const uint8_t* src = raw + i * chunk;
          std::memcpy(origins + i * 3, src, kOriginBytes);
          std::memcpy(indices + i * block_bytes, src + kOriginBytes,
                      block_bytes);
        }
      },
      hw_threads());
}

// ---------------------------------------------------------------------------
// Dense -> leaves gather.
// dense: f32[X, Y, Z, C] (C-contiguous), leaves out: f32[n, 8, 8, 8, C].
// origins are absolute index-space coords; dense spans [lo, lo+dims).
// Out-of-range voxels are filled with `background`.
// ---------------------------------------------------------------------------
void vq_gather_leaves(const float* dense, int64_t dx, int64_t dy, int64_t dz,
                      int64_t c, const int32_t* origins, const int32_t* lo,
                      int64_t n, float background, float* leaves) {
  const int64_t row = c;                 // innermost z-row element stride
  const int64_t ystride = dz * c;
  const int64_t xstride = dy * dz * c;
  const int64_t leaf_sz = kLeafDim * kLeafDim * kLeafDim * c;
  parallel_range(
      n,
      [=](int64_t s, int64_t e) {
        for (int64_t i = s; i < e; ++i) {
          const int64_t ox = origins[i * 3 + 0] - lo[0];
          const int64_t oy = origins[i * 3 + 1] - lo[1];
          const int64_t oz = origins[i * 3 + 2] - lo[2];
          float* out = leaves + i * leaf_sz;
          const bool inside = ox >= 0 && oy >= 0 && oz >= 0 &&
                              ox + kLeafDim <= dx && oy + kLeafDim <= dy &&
                              oz + kLeafDim <= dz;
          if (inside) {
            for (int x = 0; x < kLeafDim; ++x)
              for (int y = 0; y < kLeafDim; ++y)
                std::memcpy(
                    out + ((x * kLeafDim) + y) * kLeafDim * c,
                    dense + (ox + x) * xstride + (oy + y) * ystride + oz * row,
                    kLeafDim * c * sizeof(float));
          } else {
            for (int x = 0; x < kLeafDim; ++x)
              for (int y = 0; y < kLeafDim; ++y)
                for (int z = 0; z < kLeafDim; ++z) {
                  const int64_t gx = ox + x, gy = oy + y, gz = oz + z;
                  float* dst = out + (((x * kLeafDim) + y) * kLeafDim + z) * c;
                  if (gx >= 0 && gy >= 0 && gz >= 0 && gx < dx && gy < dy &&
                      gz < dz) {
                    std::memcpy(dst,
                                dense + gx * xstride + gy * ystride + gz * row,
                                c * sizeof(float));
                  } else {
                    for (int64_t ch = 0; ch < c; ++ch) dst[ch] = background;
                  }
                }
          }
        }
      },
      hw_threads());
}

// ---------------------------------------------------------------------------
// Leaves -> dense scatter (inverse of gather; leaves fully inside assumed
// after bbox allocation). Threads partition leaves; leaf regions are
// disjoint by construction (unique origins), so no synchronization needed —
// same safety-by-disjointness argument as the reference's TBB scatter.
// ---------------------------------------------------------------------------
void vq_scatter_leaves(const float* leaves, const int32_t* origins,
                       const int32_t* lo, int64_t n, int64_t dx, int64_t dy,
                       int64_t dz, int64_t c, float* dense) {
  const int64_t row = c;
  const int64_t ystride = dz * c;
  const int64_t xstride = dy * dz * c;
  const int64_t leaf_sz = kLeafDim * kLeafDim * kLeafDim * c;
  parallel_range(
      n,
      [=](int64_t s, int64_t e) {
        for (int64_t i = s; i < e; ++i) {
          const int64_t ox = origins[i * 3 + 0] - lo[0];
          const int64_t oy = origins[i * 3 + 1] - lo[1];
          const int64_t oz = origins[i * 3 + 2] - lo[2];
          const float* src = leaves + i * leaf_sz;
          for (int x = 0; x < kLeafDim; ++x)
            for (int y = 0; y < kLeafDim; ++y)
              std::memcpy(
                  dense + (ox + x) * xstride + (oy + y) * ystride + oz * row,
                  src + ((x * kLeafDim) + y) * kLeafDim * c,
                  kLeafDim * c * sizeof(float));
        }
      },
      hw_threads());
}

// ---------------------------------------------------------------------------
// Streamed interleaved write: append n chunks to an open FILE*.
// Returns 0 on success, nonzero on IO error.
// ---------------------------------------------------------------------------
int vq_write_chunks(const char* path, int append, const int32_t* origins,
                    const uint8_t* indices, int64_t n, int64_t block_bytes) {
  FILE* f = std::fopen(path, append ? "ab" : "wb");
  if (!f) return 1;
  const int64_t chunk = kOriginBytes + block_bytes;
  std::vector<uint8_t> buf(static_cast<size_t>(chunk) * n);
  vq_interleave(origins, indices, n, block_bytes, buf.data());
  const size_t wrote = std::fwrite(buf.data(), 1, buf.size(), f);
  const int err = (wrote != buf.size()) || std::fclose(f);
  return err ? 2 : 0;
}

int vq_version() { return 1; }

}  // extern "C"
