// Native host-side point-cloud ops for the CPU data pipeline.
//
// TPU-native counterpart of the reference's C++ preprocessing extensions
// (src/models/backbone_kpconv/cpp_wrappers/: grid subsampling and radius
// neighbors) and the kiss-icp voxel downsample. The TPU compute path does
// preprocessing on-device (ops/subsample.py, ops/neighbors.py); these
// functions serve the HOST side: data-loader downsampling of raw LiDAR
// scans, offline overlap precomputation, and an exact oracle for tests.
//
// Exposed with a plain C ABI for ctypes (no pybind11 in this image).
// Build: cpp/build.sh -> libspr_native.so
//
// All implementations are original, written against the documented semantics:
//   * grid_subsample: voxel barycenters, origin = floor(min/dl)*dl.
//   * voxel_downsample_first: one (first) point per voxel.
//   * radius_neighbors: K closest supports within radius per query,
//     shadow index = n_support for missing entries.
//   * mutual_overlap: masks of points with a counterpart within radius.

#include <cstdint>
#include <cmath>
#include <cstring>
#include <unordered_map>
#include <vector>
#include <algorithm>

namespace {

struct VoxelKey {
    int32_t x, y, z;
    bool operator==(const VoxelKey& o) const {
        return x == o.x && y == o.y && z == o.z;
    }
};

struct VoxelKeyHash {
    size_t operator()(const VoxelKey& k) const {
        // FNV-style mix of the three coords.
        uint64_t h = 1469598103934665603ull;
        for (int32_t v : {k.x, k.y, k.z}) {
            h ^= static_cast<uint64_t>(static_cast<uint32_t>(v));
            h *= 1099511628211ull;
        }
        return static_cast<size_t>(h);
    }
};

inline VoxelKey key_of(const float* p, float inv_dl, float ox, float oy,
                       float oz) {
    return VoxelKey{
        static_cast<int32_t>(std::floor((p[0] - ox) * inv_dl)),
        static_cast<int32_t>(std::floor((p[1] - oy) * inv_dl)),
        static_cast<int32_t>(std::floor((p[2] - oz) * inv_dl))};
}

// Simple uniform-grid spatial hash for radius queries.
class HashGrid {
  public:
    HashGrid(const float* pts, int64_t n, float cell) : pts_(pts), cell_(cell) {
        inv_ = 1.0f / cell;
        cells_.reserve(static_cast<size_t>(n));
        for (int64_t i = 0; i < n; ++i) {
            cells_[key_of(pts + 3 * i, inv_, 0.f, 0.f, 0.f)].push_back(i);
        }
    }

    template <typename F>
    void for_neighbors(const float* q, float radius, F&& fn) const {
        int32_t cx = static_cast<int32_t>(std::floor(q[0] * inv_));
        int32_t cy = static_cast<int32_t>(std::floor(q[1] * inv_));
        int32_t cz = static_cast<int32_t>(std::floor(q[2] * inv_));
        int32_t r = static_cast<int32_t>(std::ceil(radius * inv_));
        float r2 = radius * radius;
        for (int32_t dz = -r; dz <= r; ++dz)
            for (int32_t dy = -r; dy <= r; ++dy)
                for (int32_t dx = -r; dx <= r; ++dx) {
                    auto it = cells_.find(VoxelKey{cx + dx, cy + dy, cz + dz});
                    if (it == cells_.end()) continue;
                    for (int64_t j : it->second) {
                        const float* s = pts_ + 3 * j;
                        float d0 = q[0] - s[0], d1 = q[1] - s[1], d2 = q[2] - s[2];
                        float d = d0 * d0 + d1 * d1 + d2 * d2;
                        if (d <= r2) fn(j, d);
                    }
                }
    }

  private:
    const float* pts_;
    float cell_, inv_;
    std::unordered_map<VoxelKey, std::vector<int64_t>, VoxelKeyHash> cells_;
};

}  // namespace

extern "C" {

// Voxel-grid barycenter subsampling. out_points must hold n_points * 3
// floats; returns the number of voxels written (<= n_points).
int64_t spr_grid_subsample(const float* points, int64_t n_points,
                           float voxel_size, float* out_points) {
    if (n_points == 0) return 0;
    float mn[3] = {points[0], points[1], points[2]};
    for (int64_t i = 1; i < n_points; ++i)
        for (int d = 0; d < 3; ++d)
            mn[d] = std::min(mn[d], points[3 * i + d]);
    float ox = std::floor(mn[0] / voxel_size) * voxel_size;
    float oy = std::floor(mn[1] / voxel_size) * voxel_size;
    float oz = std::floor(mn[2] / voxel_size) * voxel_size;
    float inv = 1.0f / voxel_size;

    struct Acc { double s[3] = {0, 0, 0}; int64_t cnt = 0; };
    std::unordered_map<VoxelKey, Acc, VoxelKeyHash> acc;
    acc.reserve(static_cast<size_t>(n_points));
    for (int64_t i = 0; i < n_points; ++i) {
        Acc& a = acc[key_of(points + 3 * i, inv, ox, oy, oz)];
        for (int d = 0; d < 3; ++d) a.s[d] += points[3 * i + d];
        a.cnt += 1;
    }
    int64_t m = 0;
    for (const auto& kv : acc) {
        for (int d = 0; d < 3; ++d)
            out_points[3 * m + d] =
                static_cast<float>(kv.second.s[d] / kv.second.cnt);
        ++m;
    }
    return m;
}

// One (first) point per voxel, preserving input order (kiss-icp semantics).
int64_t spr_voxel_downsample_first(const float* points, int64_t n_points,
                                   float voxel_size, float* out_points) {
    std::unordered_map<VoxelKey, char, VoxelKeyHash> seen;
    seen.reserve(static_cast<size_t>(n_points));
    float inv = 1.0f / voxel_size;
    int64_t m = 0;
    for (int64_t i = 0; i < n_points; ++i) {
        auto res = seen.emplace(key_of(points + 3 * i, inv, 0.f, 0.f, 0.f), 1);
        if (res.second) {
            std::memcpy(out_points + 3 * m, points + 3 * i, 3 * sizeof(float));
            ++m;
        }
    }
    return m;
}

// K closest supports within `radius` per query; out_idx (n_queries * k)
// filled with support indices, shadow = n_supports where absent.
void spr_radius_neighbors(const float* queries, int64_t n_queries,
                          const float* supports, int64_t n_supports,
                          float radius, int32_t k, int64_t* out_idx) {
    HashGrid grid(supports, n_supports, radius);
    std::vector<std::pair<float, int64_t>> cand;
    for (int64_t i = 0; i < n_queries; ++i) {
        cand.clear();
        grid.for_neighbors(queries + 3 * i, radius,
                           [&](int64_t j, float d) { cand.emplace_back(d, j); });
        int64_t kept = std::min<int64_t>(k, static_cast<int64_t>(cand.size()));
        std::partial_sort(cand.begin(), cand.begin() + kept, cand.end());
        for (int64_t c = 0; c < k; ++c)
            out_idx[i * k + c] = c < kept ? cand[c].second : n_supports;
    }
}

// Mutual overlap masks: src/tgt points with any counterpart within radius.
void spr_mutual_overlap(const float* src, int64_t n_src, const float* tgt,
                        int64_t n_tgt, float radius, uint8_t* src_mask,
                        uint8_t* tgt_mask) {
    HashGrid tgrid(tgt, n_tgt, radius);
    std::memset(tgt_mask, 0, static_cast<size_t>(n_tgt));
    for (int64_t i = 0; i < n_src; ++i) {
        bool hit = false;
        tgrid.for_neighbors(src + 3 * i, radius, [&](int64_t j, float) {
            hit = true;
            tgt_mask[j] = 1;
        });
        src_mask[i] = hit ? 1 : 0;
    }
    // tgt points may also match src points that themselves had no hit only if
    // radius asymmetric — with a symmetric radius the scan above covers both
    // directions (any tgt within r of a src is marked, and vice versa).
}

}  // extern "C"
