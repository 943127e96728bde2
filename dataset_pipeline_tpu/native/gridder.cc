// Native host kernels for grid construction and PLY staging.
//
// The device compute path is JAX/XLA; these are the host-runtime pieces the
// reference implements in C++ (uniform-grid acceleration structures,
// bulk point-cloud staging) where a Python loop would dominate end-to-end
// time at 10^6..10^7-element scale. Exposed via a plain C ABI for ctypes.

#include <cmath>
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

// Exact k-nearest-neighbor search over a uniform grid with expanding-ring
// probes. Host-side counterpart of the reference's PCL KdTree queries
// (opt/problem.cc:706-786 DeterminePointNeighbors; the cleaner's
// LocalStatisticalOutlierRemoval). Threaded over queries.
//
// Grid: CSR layout (counting sort by cell id). Per query: examine rings of
// cells around the query's cell, keeping a bounded max-heap of the k best;
// stop when the ring's minimum possible distance exceeds the current k-th
// best (and the heap is full). Exact for any point distribution.
namespace {

struct KnnGrid {
  float origin[3];
  float inv_cell;
  float cell;
  int64_t dims[3];
  std::vector<int64_t> cell_start;  // num_cells + 1
  std::vector<int32_t> order;       // point index per sorted slot
  std::vector<float> sorted_pts;    // (n,3) positions in slot order
};

inline int64_t clampi(int64_t v, int64_t lo, int64_t hi) {
  return v < lo ? lo : (v > hi ? hi : v);
}

void build_knn_grid(const float* pts, int64_t n, float cell, KnnGrid* g) {
  float mn[3] = {pts[0], pts[1], pts[2]};
  float mx[3] = {pts[0], pts[1], pts[2]};
  for (int64_t i = 1; i < n; ++i) {
    for (int d = 0; d < 3; ++d) {
      const float v = pts[3 * i + d];
      if (v < mn[d]) mn[d] = v;
      if (v > mx[d]) mx[d] = v;
    }
  }
  g->cell = cell;
  g->inv_cell = 1.0f / cell;
  int64_t num_cells = 1;
  for (int d = 0; d < 3; ++d) {
    g->origin[d] = mn[d];
    g->dims[d] = std::max<int64_t>(
        (int64_t)((mx[d] - mn[d]) * g->inv_cell) + 1, 1);
    num_cells *= g->dims[d];
  }
  std::vector<int32_t> cid(n);
  g->cell_start.assign(num_cells + 1, 0);
  const int64_t ny = g->dims[1], nz = g->dims[2];
  for (int64_t i = 0; i < n; ++i) {
    const float* p = pts + 3 * i;
    int64_t cx = clampi((int64_t)((p[0] - g->origin[0]) * g->inv_cell), 0, g->dims[0] - 1);
    int64_t cy = clampi((int64_t)((p[1] - g->origin[1]) * g->inv_cell), 0, ny - 1);
    int64_t cz = clampi((int64_t)((p[2] - g->origin[2]) * g->inv_cell), 0, nz - 1);
    int64_t c = (cx * ny + cy) * nz + cz;
    cid[i] = (int32_t)c;
    ++g->cell_start[c + 1];
  }
  for (int64_t c = 0; c < num_cells; ++c) g->cell_start[c + 1] += g->cell_start[c];
  g->order.resize(n);
  std::vector<int64_t> cursor(g->cell_start.begin(), g->cell_start.end() - 1);
  for (int64_t i = 0; i < n; ++i) g->order[cursor[cid[i]]++] = (int32_t)i;
  g->sorted_pts.resize(3 * n);
  for (int64_t s = 0; s < n; ++s)
    std::memcpy(&g->sorted_pts[3 * s], pts + 3 * g->order[s], 12);
}

// Bounded max-heap over (d2, idx) pairs, capacity k.
struct KBest {
  float* d2;
  int32_t* idx;
  int k;
  int size = 0;
  inline float worst() const { return size == k ? d2[0] : 3.4e38f; }
  inline void push(float d, int32_t i) {
    if (size < k) {
      int c = size++;
      d2[c] = d; idx[c] = i;
      while (c > 0) {
        int p = (c - 1) >> 1;
        if (d2[p] >= d2[c]) break;
        std::swap(d2[p], d2[c]); std::swap(idx[p], idx[c]);
        c = p;
      }
    } else if (d < d2[0]) {
      d2[0] = d; idx[0] = i;
      int c = 0;
      for (;;) {
        int l = 2 * c + 1, r = l + 1, m = c;
        if (l < k && d2[l] > d2[m]) m = l;
        if (r < k && d2[r] > d2[m]) m = r;
        if (m == c) break;
        std::swap(d2[m], d2[c]); std::swap(idx[m], idx[c]);
        c = m;
      }
    }
  }
};

// Processes queries qorder[q_start..q_end) (qorder = cell-sorted query
// indices for cache locality; nullptr = natural order). Output rows are
// written at the ORIGINAL query index.
void knn_query_range(const float* pts, const KnnGrid& g, const float* queries,
                     const int32_t* qorder, int64_t q_start, int64_t q_end,
                     int k, int32_t skip_self, int32_t* out_idx,
                     float* out_d2) {
  const int64_t nx = g.dims[0], ny = g.dims[1], nz = g.dims[2];
  std::vector<float> hd(k);
  std::vector<int32_t> hi(k);
  for (int64_t qs = q_start; qs < q_end; ++qs) {
    const int64_t qi = qorder ? (int64_t)qorder[qs] : qs;
    const float* p = queries + 3 * qi;
    KBest heap{hd.data(), hi.data(), k, 0};
    const float fx = (p[0] - g.origin[0]) * g.inv_cell;
    const float fy = (p[1] - g.origin[1]) * g.inv_cell;
    const float fz = (p[2] - g.origin[2]) * g.inv_cell;
    const int64_t cx = clampi((int64_t)fx, 0, nx - 1);
    const int64_t cy = clampi((int64_t)fy, 0, ny - 1);
    const int64_t cz = clampi((int64_t)fz, 0, nz - 1);
    // Last ring that still intersects the grid at all.
    const int64_t last_ring = std::max(
        std::max(std::max(cx, nx - 1 - cx), std::max(cy, ny - 1 - cy)),
        std::max(cz, nz - 1 - cz));
    const float px = p[0], py = p[1], pz = p[2];
    auto visit_cell = [&](int64_t x, int64_t y, int64_t z) {
      const int64_t c = (x * ny + y) * nz + z;
      const int64_t s = g.cell_start[c], e = g.cell_start[c + 1];
      const float* sp = g.sorted_pts.data() + 3 * s;
      for (int64_t t = s; t < e; ++t, sp += 3) {
        const float dx = sp[0] - px;
        const float dy = sp[1] - py;
        const float dz = sp[2] - pz;
        const float d2 = dx * dx + dy * dy + dz * dz;
        if (d2 < heap.worst()) {
          const int32_t j = g.order[t];
          if (skip_self && j == (int32_t)qi) continue;
          heap.push(d2, j);
        }
      }
    };
    for (int64_t ring = 0; ring <= last_ring; ++ring) {
      // Min possible distance from the query to any point in a cell at
      // Chebyshev cell-distance `ring`: (ring-1)*cell (the query may sit
      // anywhere inside its own cell). Once the heap is full and that
      // bound exceeds the current k-th best, no farther ring can improve.
      if (heap.size == k && ring >= 2) {
        const float sep = (float)(ring - 1) * g.cell;
        if (sep * sep > heap.worst()) break;
      }
      const int64_t x0 = cx - ring, x1 = cx + ring;
      const int64_t y0 = cy - ring, y1 = cy + ring;
      const int64_t z0 = cz - ring, z1 = cz + ring;
      for (int64_t x = std::max<int64_t>(x0, 0); x <= std::min(x1, nx - 1); ++x) {
        const bool x_face = (x == x0 || x == x1);
        for (int64_t y = std::max<int64_t>(y0, 0); y <= std::min(y1, ny - 1); ++y) {
          if (x_face || y == y0 || y == y1) {
            // full z column belongs to the shell
            for (int64_t z = std::max<int64_t>(z0, 0);
                 z <= std::min(z1, nz - 1); ++z)
              visit_cell(x, y, z);
          } else {
            // interior in x and y: only the two z faces are on the shell
            if (z0 >= 0) visit_cell(x, y, z0);
            if (z1 < nz && z1 != z0) visit_cell(x, y, z1);
          }
        }
      }
    }
    // heap-sort ascending into the output row
    int32_t* oi = out_idx + (int64_t)k * qi;
    float* od = out_d2 + (int64_t)k * qi;
    int m = heap.size;
    for (int t = m - 1; t >= 0; --t) {
      od[t] = hd[0]; oi[t] = hi[0];
      hd[0] = hd[heap.size - 1]; hi[0] = hi[heap.size - 1];
      --heap.size;
      int c = 0;
      for (;;) {
        int l = 2 * c + 1, r = l + 1, mm = c;
        if (l < heap.size && hd[l] > hd[mm]) mm = l;
        if (r < heap.size && hd[r] > hd[mm]) mm = r;
        if (mm == c) break;
        std::swap(hd[mm], hd[c]); std::swap(hi[mm], hi[c]);
        c = mm;
      }
    }
    for (int t = m; t < k; ++t) { od[t] = 3.4e38f; oi[t] = -1; }
  }
}

}  // namespace

// Exact kNN: each of q queries gets its k nearest among the n points
// (ascending). skip_self=1 excludes the point with the same INDEX as the
// query (for self-queries where queries==pts). Returns 0 on success.
int32_t grid_knn(const float* pts, int64_t n, const float* queries, int64_t q,
                 int32_t k, int32_t skip_self, float cell_hint,
                 int32_t* out_idx, float* out_d2) {
  if (n <= 0 || q <= 0 || k <= 0) return 1;
  float mn[3] = {pts[0], pts[1], pts[2]}, mx[3] = {pts[0], pts[1], pts[2]};
  for (int64_t i = 1; i < n; ++i)
    for (int d = 0; d < 3; ++d) {
      const float v = pts[3 * i + d];
      if (v < mn[d]) mn[d] = v;
      if (v > mx[d]) mx[d] = v;
    }
  float cell = cell_hint;
  if (cell <= 0.0f) {
    // Size cells for ~2 k points per ball of radius=cell: with density
    // rho = n / volume, cell = (2k/rho)^(1/3). Estimate volume from the
    // bounding box (robust enough; expanding rings fix any misestimate).
    double vol = 1.0;
    for (int d = 0; d < 3; ++d) vol *= std::max(1e-6, (double)(mx[d] - mn[d]));
    cell = (float)std::cbrt(vol * (double)(2 * k) / (double)n);
    if (!(cell > 0.0f)) cell = 1.0f;
  }
  // Cap total cells at ~4n (memory) by growing the cell if needed.
  for (;;) {
    double nc = 1.0;
    for (int d = 0; d < 3; ++d)
      nc *= std::max<int64_t>((int64_t)((mx[d] - mn[d]) / cell) + 1, 1);
    if (nc <= 4.0 * (double)n + 64.0) break;
    cell *= 1.5f;
  }
  KnnGrid g;
  build_knn_grid(pts, n, cell, &g);
  // Cell-sort the queries so threads touch the grid coherently (at 10^7
  // points the grid tables exceed L2/L3; natural order thrashes).
  std::vector<int32_t> qorder;
  if (q > 100000) {
    if (queries == pts && (int64_t)g.order.size() == q) {
      qorder = g.order;
    } else {
      const int64_t ny = g.dims[1], nz = g.dims[2];
      std::vector<std::pair<int64_t, int32_t>> keyed(q);
      for (int64_t i = 0; i < q; ++i) {
        const float* p = queries + 3 * i;
        int64_t cx = clampi((int64_t)((p[0] - g.origin[0]) * g.inv_cell), 0, g.dims[0] - 1);
        int64_t cy = clampi((int64_t)((p[1] - g.origin[1]) * g.inv_cell), 0, ny - 1);
        int64_t cz = clampi((int64_t)((p[2] - g.origin[2]) * g.inv_cell), 0, nz - 1);
        keyed[i] = {(cx * ny + cy) * nz + cz, (int32_t)i};
      }
      std::sort(keyed.begin(), keyed.end());
      qorder.resize(q);
      for (int64_t i = 0; i < q; ++i) qorder[i] = keyed[i].second;
    }
  }
  const int32_t* qo = qorder.empty() ? nullptr : qorder.data();
  int nthreads = (int)std::min<int64_t>(std::thread::hardware_concurrency(),
                                        std::max<int64_t>(q / 20000, 1));
  if (nthreads < 1) nthreads = 1;
  if (nthreads == 1) {
    knn_query_range(pts, g, queries, qo, 0, q, k, skip_self, out_idx, out_d2);
  } else {
    std::vector<std::thread> threads;
    const int64_t chunk = (q + nthreads - 1) / nthreads;
    for (int t = 0; t < nthreads; ++t) {
      const int64_t s = t * chunk, e = std::min(q, s + chunk);
      if (s < e)
        threads.emplace_back(knn_query_range, pts, std::cref(g), queries, qo,
                             s, e, k, skip_self, out_idx, out_d2);
    }
    for (auto& th : threads) th.join();
  }
  return 0;
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
