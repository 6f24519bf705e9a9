// Host-side coordinate engine for warpconvnet_tpu.
//
// Native (C++/OpenMP) equivalents of the reference's CUDA coordinate
// machinery (warpconvnet/csrc/cuhash_*.cu) for the parts of the system that
// run on the HOST in a TPU deployment: the input pipeline voxelizes point
// clouds, deduplicates coordinates and pre-builds kernel-map pair tables
// while the TPU executes the previous step. Exposed to Python via ctypes
// (no pybind11 in this image).
//
// All functions use caller-allocated output buffers and int32/float32 C
// layouts matching numpy defaults.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#endif

namespace {

// 4D-free packed key: 3 x 21-bit biased coords in a uint64.
inline uint64_t pack_key(int32_t x, int32_t y, int32_t z) {
  constexpr int64_t kBias = 1 << 20;
  return (static_cast<uint64_t>(static_cast<int64_t>(x) + kBias) << 42) |
         (static_cast<uint64_t>(static_cast<int64_t>(y) + kBias) << 21) |
         static_cast<uint64_t>(static_cast<int64_t>(z) + kBias);
}

struct KeyHash {
  size_t operator()(uint64_t k) const {
    // splitmix64 finalizer
    k += 0x9e3779b97f4a7c15ull;
    k = (k ^ (k >> 30)) * 0xbf58476d1ce4e5b9ull;
    k = (k ^ (k >> 27)) * 0x94d049bb133111ebull;
    return static_cast<size_t>(k ^ (k >> 31));
  }
};

}  // namespace

extern "C" {

// Voxelize float points: floor(points / voxel_size); keep first occurrence
// of each voxel. Returns number of unique voxels (<= capacity).
// out_coords: [capacity, 3] int32; out_src_index: [capacity] int32 — index of
// the representative point (the reference's to_unique "first index" payload).
int32_t wct_voxelize(const float* points, int64_t n, float voxel_size,
                     int32_t* out_coords, int32_t* out_src_index,
                     int64_t capacity) {
  std::unordered_map<uint64_t, int32_t, KeyHash> seen;
  seen.reserve(static_cast<size_t>(n * 2));
  int32_t count = 0;
  const float inv = 1.0f / voxel_size;
  for (int64_t i = 0; i < n; ++i) {
    int32_t c[3];
    for (int d = 0; d < 3; ++d) {
      c[d] = static_cast<int32_t>(std::floor(points[i * 3 + d] * inv));
    }
    uint64_t key = pack_key(c[0], c[1], c[2]);
    auto it = seen.find(key);
    if (it == seen.end()) {
      if (count >= capacity) continue;
      seen.emplace(key, count);
      out_coords[count * 3 + 0] = c[0];
      out_coords[count * 3 + 1] = c[1];
      out_coords[count * 3 + 2] = c[2];
      out_src_index[count] = static_cast<int32_t>(i);
      ++count;
    }
  }
  return count;
}

// Voxelize + CSR mapping for feature reduction: also emits, for every input
// point, the id of its voxel (out_voxel_id [n]), so the host can reduce
// features (mean/max) before upload. Returns unique count.
int32_t wct_voxelize_csr(const float* points, int64_t n, float voxel_size,
                         int32_t* out_coords, int32_t* out_voxel_id,
                         int64_t capacity) {
  std::unordered_map<uint64_t, int32_t, KeyHash> seen;
  seen.reserve(static_cast<size_t>(n * 2));
  int32_t count = 0;
  const float inv = 1.0f / voxel_size;
  for (int64_t i = 0; i < n; ++i) {
    int32_t c[3];
    for (int d = 0; d < 3; ++d) {
      c[d] = static_cast<int32_t>(std::floor(points[i * 3 + d] * inv));
    }
    uint64_t key = pack_key(c[0], c[1], c[2]);
    auto it = seen.find(key);
    int32_t id;
    if (it == seen.end()) {
      if (count >= capacity) {
        out_voxel_id[i] = -1;
        continue;
      }
      id = count++;
      seen.emplace(key, id);
      out_coords[id * 3 + 0] = c[0];
      out_coords[id * 3 + 1] = c[1];
      out_coords[id * 3 + 2] = c[2];
    } else {
      id = it->second;
    }
    out_voxel_id[i] = id;
  }
  return count;
}

// Unique int coords (dedup), e.g. after host-side striding.
int32_t wct_unique_coords(const int32_t* coords, int64_t n,
                          int32_t* out_coords, int64_t capacity) {
  std::unordered_map<uint64_t, int32_t, KeyHash> seen;
  seen.reserve(static_cast<size_t>(n * 2));
  int32_t count = 0;
  for (int64_t i = 0; i < n; ++i) {
    uint64_t key =
        pack_key(coords[i * 3], coords[i * 3 + 1], coords[i * 3 + 2]);
    if (seen.emplace(key, count).second) {
      if (count >= capacity) { seen.erase(key); continue; }
      std::memcpy(out_coords + count * 3, coords + i * 3, 3 * sizeof(int32_t));
      ++count;
    }
  }
  return count;
}

// Dense pair-table kernel map (the reference's packed_kernel_map, host
// flavor): table[k, o] = index i of in_coords with
//   in_coords[i] == stride * out_coords[o] + offsets[k],   or -1.
// table: [num_offsets, n_out] int32 (row-major). OpenMP over offsets*outputs.
void wct_build_pair_table(const int32_t* in_coords, int64_t n_in,
                          const int32_t* out_coords, int64_t n_out,
                          const int32_t* offsets, int64_t num_offsets,
                          const int32_t* stride, int32_t* table) {
  std::unordered_map<uint64_t, int32_t, KeyHash> map;
  map.reserve(static_cast<size_t>(n_in * 2));
  for (int64_t i = 0; i < n_in; ++i) {
    map.emplace(
        pack_key(in_coords[i * 3], in_coords[i * 3 + 1], in_coords[i * 3 + 2]),
        static_cast<int32_t>(i));
  }
#if defined(_OPENMP)
#pragma omp parallel for schedule(static)
#endif
  for (int64_t ko = 0; ko < num_offsets * n_out; ++ko) {
    const int64_t k = ko / n_out;
    const int64_t o = ko % n_out;
    int32_t q[3];
    for (int d = 0; d < 3; ++d) {
      q[d] = out_coords[o * 3 + d] * stride[d] + offsets[k * 3 + d];
    }
    auto it = map.find(pack_key(q[0], q[1], q[2]));
    table[ko] = (it == map.end()) ? -1 : it->second;
  }
}

// Reverse table: rev[k, i] = o with table[k, o] == i, else -1.
void wct_reverse_pair_table(const int32_t* table, int64_t num_offsets,
                            int64_t n_out, int64_t n_in, int32_t* rev) {
#if defined(_OPENMP)
#pragma omp parallel for schedule(static)
#endif
  for (int64_t k = 0; k < num_offsets; ++k) {
    int32_t* row = rev + k * n_in;
    std::fill(row, row + n_in, -1);
    const int32_t* trow = table + k * n_out;
    for (int64_t o = 0; o < n_out; ++o) {
      const int32_t i = trow[o];
      if (i >= 0 && i < n_in) row[i] = static_cast<int32_t>(o);
    }
  }
}

// Strided output coords: unique(in_coords / stride). Returns count.
int32_t wct_stride_coords(const int32_t* in_coords, int64_t n_in,
                          const int32_t* stride, int32_t* out_coords,
                          int64_t capacity) {
  std::vector<int32_t> down(static_cast<size_t>(n_in) * 3);
  for (int64_t i = 0; i < n_in; ++i) {
    for (int d = 0; d < 3; ++d) {
      int32_t c = in_coords[i * 3 + d];
      int32_t s = stride[d];
      // floor division for negatives
      down[i * 3 + d] = (c >= 0) ? (c / s) : ((c - s + 1) / s);
    }
  }
  return wct_unique_coords(down.data(), n_in, out_coords, capacity);
}

int32_t wct_num_threads() {
#if defined(_OPENMP)
  return omp_get_max_threads();
#else
  return 1;
#endif
}

}  // extern "C"
