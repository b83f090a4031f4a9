// ThreadSanitizer harness for the threaded native host library.
//
// The library's concurrency model is safety-by-disjointness (threads
// partition the leaf axis; per-leaf output regions never overlap — the same
// argument as the reference's TBB scatter, ref: src/orchestrator/
// VQVAECodec.cpp:157-199). This driver exercises every threaded entry point
// (interleave, deinterleave, gather, scatter) at sizes well above the
// parallel threshold so the claim is *checked* under TSan instead of only
// argued in comments.
//
// Build + run (also `make tsan` / tests/test_native_io.py::test_tsan_clean):
//   g++ -fsanitize=thread -O1 -std=c++17 -pthread native/tsan_check.cpp \
//       -o /tmp/vq_tsan && /tmp/vq_tsan
// Exit code 0 with no TSan report = clean.

#include <cstdint>
#include <cstdio>
#include <vector>

#include "vqvdb_native.cpp"  // exercise the exact shipped code

int main() {
  const int64_t n = 4096;         // > parallel_range threshold (1024)
  const int64_t block = 64;       // 4*4*4 uint8 indices
  const int64_t c = 1;
  const int64_t dim = 128;        // dense volume 128^3 holds 16^3 leaves

  // Unique origins on the 8-aligned lattice (the disjointness contract).
  std::vector<int32_t> origins(n * 3);
  for (int64_t i = 0; i < n; ++i) {
    origins[i * 3 + 0] = static_cast<int32_t>((i / 256) % 16) * 8;
    origins[i * 3 + 1] = static_cast<int32_t>((i / 16) % 16) * 8;
    origins[i * 3 + 2] = static_cast<int32_t>(i % 16) * 8;
  }
  std::vector<uint8_t> indices(n * block);
  for (size_t i = 0; i < indices.size(); ++i) indices[i] = i & 0xFF;

  std::vector<uint8_t> raw(n * (12 + block));
  vq_interleave(origins.data(), indices.data(), n, block, raw.data());

  std::vector<int32_t> org2(n * 3);
  std::vector<uint8_t> idx2(n * block);
  vq_deinterleave(raw.data(), n, block, org2.data(), idx2.data());
  for (int64_t i = 0; i < n * 3; ++i)
    if (org2[i] != origins[i]) { std::puts("origin mismatch"); return 1; }
  for (int64_t i = 0; i < n * block; ++i)
    if (idx2[i] != indices[i]) { std::puts("index mismatch"); return 1; }

  const int32_t lo[3] = {0, 0, 0};
  std::vector<float> dense(dim * dim * dim * c, 0.5f);
  std::vector<float> leaves(n * 512 * c);
  vq_gather_leaves(dense.data(), dim, dim, dim, c, origins.data(), lo, n,
                   0.0f, leaves.data());

  std::vector<float> dense2(dim * dim * dim * c, 0.0f);
  vq_scatter_leaves(leaves.data(), origins.data(), lo, n, dim, dim, dim, c,
                    dense2.data());
  for (size_t i = 0; i < dense2.size(); ++i)
    if (dense2[i] != 0.5f) { std::puts("scatter mismatch"); return 1; }

  // Threaded flat copy (vq_copy_mt) — size above the 1 MiB threading
  // threshold, forced to 4 workers so the parallel path runs even where
  // hardware_concurrency() is 1.
  std::vector<uint8_t> big(3u << 20), big2(3u << 20);
  for (size_t i = 0; i < big.size(); ++i) big[i] = i & 0xFF;
  vq_copy_mt(big.data(), big2.data(), static_cast<int64_t>(big.size()), 4);
  for (size_t i = 0; i < big.size(); ++i)
    if (big2[i] != big[i]) { std::puts("copy_mt mismatch"); return 1; }

  std::puts("tsan_check: all threaded paths clean");
  return 0;
}
