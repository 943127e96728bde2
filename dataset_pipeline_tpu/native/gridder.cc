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
#include <unordered_map>
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

// Greedy radius merge of close points, matching the reference's
// MergeClosePoints semantics (opt/multi_scale_point_cloud.cc:44-125):
// iterate seed points in input order, skipping seeds already merged;
// average positions over ALL points within merge_distance of the seed
// (including points already merged into earlier clusters — the reference
// only skips done SEEDS, not done neighbors); average the color over the
// dominant scan's members only; max_radius = max over members. The KdTree
// radius search is replaced by a uniform grid with cell = merge_distance
// and a 27-cell probe with exact distance recheck. Returns the number of
// output points.
int64_t greedy_merge(const float* pts, const float* colors,
                     const uint8_t* scans, const float* max_radius,
                     int64_t n, float merge_distance, int32_t num_scans,
                     float* out_pts, float* out_colors, uint8_t* out_scans,
                     float* out_max_radius) {
  if (n == 0) return 0;
  const float r2 = merge_distance * merge_distance;
  const float inv_cell = 1.0f / std::max(merge_distance, 1e-12f);
  float mn[3] = {pts[0], pts[1], pts[2]};
  for (int64_t i = 1; i < n; ++i)
    for (int d = 0; d < 3; ++d) mn[d] = std::min(mn[d], pts[3 * i + d]);
  // 21-bit packed cell key; coordinates clamp at 2^21-2 so the +1 probe stays
  // in range (collisions would only add distance-rejected candidates anyway,
  // because the exact r2 test below keeps correctness).
  const int64_t maxc = (1LL << 21) - 2;
  auto cell_of = [&](const float* p, int64_t c[3]) {
    for (int d = 0; d < 3; ++d) {
      int64_t v = (int64_t)((p[d] - mn[d]) * inv_cell);
      c[d] = std::min(std::max(v, (int64_t)0), maxc);
    }
  };
  auto key_of = [](const int64_t c[3]) {
    return ((uint64_t)c[0] << 42) | ((uint64_t)c[1] << 21) | (uint64_t)c[2];
  };
  std::unordered_map<uint64_t, std::vector<int32_t>> grid;
  grid.reserve((size_t)(n / 2 + 16));
  for (int64_t i = 0; i < n; ++i) {
    int64_t c[3];
    cell_of(pts + 3 * i, c);
    grid[key_of(c)].push_back((int32_t)i);
  }
  std::vector<char> done(n, 0);
  std::vector<double> color_sum(num_scans);
  std::vector<int> scan_count(num_scans);
  int64_t m = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (done[i]) continue;
    std::fill(color_sum.begin(), color_sum.end(), 0.0);
    std::fill(scan_count.begin(), scan_count.end(), 0);
    double avg[3] = {0, 0, 0};
    int total = 0;
    float mr = -1.0f;
    int best_scan = 0, best_count = 0;
    const float* p = pts + 3 * i;
    int64_t c[3];
    cell_of(p, c);
    for (int64_t di = -1; di <= 1; ++di) {
      for (int64_t dj = -1; dj <= 1; ++dj) {
        for (int64_t dk = -1; dk <= 1; ++dk) {
          int64_t cc[3] = {c[0] + di, c[1] + dj, c[2] + dk};
          if (cc[0] < 0 || cc[1] < 0 || cc[2] < 0) continue;
          auto it = grid.find(key_of(cc));
          if (it == grid.end()) continue;
          for (int32_t j : it->second) {
            const float* q = pts + 3 * j;
            const float dx = q[0] - p[0], dy = q[1] - p[1], dz = q[2] - p[2];
            if (dx * dx + dy * dy + dz * dz > r2) continue;
            avg[0] += q[0];
            avg[1] += q[1];
            avg[2] += q[2];
            const int s = scans[j];
            color_sum[s] += colors[j];
            if (++scan_count[s] > best_count) {
              best_count = scan_count[s];
              best_scan = s;
            }
            if (max_radius[j] > mr) mr = max_radius[j];
            ++total;
            done[j] = 1;
          }
        }
      }
    }
    out_pts[3 * m + 0] = (float)(avg[0] / total);
    out_pts[3 * m + 1] = (float)(avg[1] / total);
    out_pts[3 * m + 2] = (float)(avg[2] / total);
    out_colors[m] = (float)(color_sum[best_scan] / scan_count[best_scan]);
    out_scans[m] = (uint8_t)best_scan;
    out_max_radius[m] = mr;
    ++m;
  }
  return m;
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
