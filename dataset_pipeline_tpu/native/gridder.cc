// Native host kernels for grid construction and PLY staging.
//
// The device compute path is JAX/XLA; these are the host-runtime pieces the
// reference implements in C++ (uniform-grid acceleration structures,
// bulk point-cloud staging) where a Python loop would dominate end-to-end
// time at 10^6..10^7-element scale. Exposed via a plain C ABI for ctypes.

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <atomic>
#include <thread>
#include <vector>

extern "C" {

// Insert triangles (given per-face cell ranges) into a dense cell table of
// up to max_per_cell entries per cell. Table must be pre-filled with -1.
// Returns the number of dropped (overflowed) entries.
int64_t insert_triangles(const int64_t* lo, const int64_t* hi, int64_t nfaces,
                         const int64_t* dims, int32_t max_per_cell,
                         int32_t* table, int32_t* counts, int64_t num_cells) {
  const int64_t ny = dims[1], nz = dims[2];
  int64_t dropped = 0;
  for (int64_t f = 0; f < nfaces; ++f) {
    const int64_t* l = lo + 3 * f;
    const int64_t* h = hi + 3 * f;
    for (int64_t i = l[0]; i <= h[0]; ++i) {
      for (int64_t j = l[1]; j <= h[1]; ++j) {
        for (int64_t k = l[2]; k <= h[2]; ++k) {
          int64_t cell = (i * ny + j) * nz + k;
          if (cell < 0 || cell >= num_cells) continue;
          int32_t c = counts[cell];
          if (c < max_per_cell) {
            table[cell * max_per_cell + c] = (int32_t)f;
            counts[cell] = c + 1;
          } else {
            ++dropped;
          }
        }
      }
    }
  }
  return dropped;
}

// Parallel gather of interleaved binary-PLY vertex records into contiguous
// float32 position / uint8 color / float32 normal arrays.
// stride = record size in bytes; offsets in bytes; -1 offset = absent.
void gather_ply_vertices(const uint8_t* data, int64_t count, int64_t stride,
                         int64_t px_off, int64_t nx_off, int64_t rgb_off,
                         float* positions, float* normals, uint8_t* colors) {
  int nthreads = (int)std::min<int64_t>(std::thread::hardware_concurrency(),
                                        std::max<int64_t>(count / 250000, 1));
  if (nthreads < 1) nthreads = 1;
  std::vector<std::thread> threads;
  auto work = [&](int64_t start, int64_t end) {
    for (int64_t i = start; i < end; ++i) {
      const uint8_t* rec = data + i * stride;
      std::memcpy(positions + 3 * i, rec + px_off, 12);
      if (nx_off >= 0) std::memcpy(normals + 3 * i, rec + nx_off, 12);
      if (rgb_off >= 0) std::memcpy(colors + 3 * i, rec + rgb_off, 3);
    }
  };
  int64_t chunk = (count + nthreads - 1) / nthreads;
  for (int t = 0; t < nthreads; ++t) {
    int64_t s = t * chunk;
    int64_t e = std::min(count, s + chunk);
    if (s < e) threads.emplace_back(work, s, e);
  }
  for (auto& th : threads) th.join();
}

// Morton-order 3D cell ids for points over a bounded grid (for locality-
// preserving sorts feeding the device voxel grid).
void morton_cell_ids(const float* points, int64_t n, const float* origin,
                     float inv_cell, int32_t bits, uint64_t* out) {
  auto spread = [](uint64_t x) {
    x &= 0x1fffff;
    x = (x | (x << 32)) & 0x1f00000000ffffULL;
    x = (x | (x << 16)) & 0x1f0000ff0000ffULL;
    x = (x | (x << 8)) & 0x100f00f00f00f00fULL;
    x = (x | (x << 4)) & 0x10c30c30c30c30c3ULL;
    x = (x | (x << 2)) & 0x1249249249249249ULL;
    return x;
  };
  const uint64_t maxc = (1ULL << bits) - 1;
  for (int64_t i = 0; i < n; ++i) {
    const float* p = points + 3 * i;
    uint64_t cx = (uint64_t)std::max(0.0f, (p[0] - origin[0]) * inv_cell);
    uint64_t cy = (uint64_t)std::max(0.0f, (p[1] - origin[1]) * inv_cell);
    uint64_t cz = (uint64_t)std::max(0.0f, (p[2] - origin[2]) * inv_cell);
    cx = std::min(cx, maxc); cy = std::min(cy, maxc); cz = std::min(cz, maxc);
    out[i] = spread(cx) | (spread(cy) << 1) | (spread(cz) << 2);
  }
}

}  // extern "C"
