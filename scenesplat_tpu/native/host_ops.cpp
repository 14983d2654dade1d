// Native host-side data-path kernels for scenesplat_tpu.
//
// TPU-native counterpart of the reference's CUDA/numba host helpers: the TPU
// does the model math; the host hot path (voxel hashing, grid sampling, kNN
// label voting) runs here in C++ (reference equivalents:
// pointcept/datasets/transform.py:1402-1416 fnv hash, :1182-1330 GridSample,
// pointcept/utils/misc.py:17-95 numba majority vote + cKDTree voting).
//
// Exposed with extern "C" and loaded via ctypes (no pybind11 in this image).
// Every entry point has a numpy fallback in scenesplat_tpu/native/__init__.py.

#include <cstdint>
#include <cstring>
#include <vector>
#include <unordered_map>
#include <algorithm>
#include <cmath>
#include <functional>
#include <random>

extern "C" {

// FNV64-1A over rows of an int64 [n, d] array (matches numpy reference).
void fnv_hash_rows(const int64_t* arr, int64_t n, int64_t d, uint64_t* out) {
    const uint64_t prime = 1099511628211ULL;
    for (int64_t i = 0; i < n; ++i) {
        uint64_t h = 14695981039346656037ULL;
        const int64_t* row = arr + i * d;
        for (int64_t j = 0; j < d; ++j) {
            h *= prime;
            h ^= (uint64_t)row[j];
        }
        out[i] = h;
    }
}

// Train-mode grid sampling: one uniformly-random point per occupied voxel
// (reservoir sampling, single O(n) pass; reference transform.py:1262-1297
// does argsort + unique + random pick). Returns the number of selected
// points; selected indices in out_idx (capacity n), per-point cell id in
// out_cell (for inverse mapping).
int64_t grid_sample_train(
    const int32_t* grid_coord,  // [n, 3], non-negative
    int64_t n,
    uint64_t seed,
    int64_t* out_idx,   // [<=n] selected original indices
    int64_t* out_cell   // [n] cell id per point (0..m-1)
) {
    struct Slot { int64_t pick; int64_t count; int64_t cell; };
    std::unordered_map<uint64_t, Slot> cells;
    cells.reserve((size_t)n * 2);
    std::mt19937_64 rng(seed);
    int64_t m = 0;
    for (int64_t i = 0; i < n; ++i) {
        const int32_t* g = grid_coord + i * 3;
        // exact 21-bit packed voxel key (injective; no hash collisions)
        uint64_t h = ((uint64_t)(uint32_t)g[0] << 42)
                   | ((uint64_t)(uint32_t)g[1] << 21)
                   | (uint64_t)(uint32_t)g[2];
        auto it = cells.find(h);
        if (it == cells.end()) {
            cells.emplace(h, Slot{i, 1, m});
            out_cell[i] = m;
            ++m;
        } else {
            Slot& s = it->second;
            s.count += 1;
            // reservoir: replace pick with prob 1/count
            if ((int64_t)(rng() % (uint64_t)s.count) == 0) s.pick = i;
            out_cell[i] = s.cell;
        }
    }
    std::vector<int64_t> picks((size_t)m);
    for (auto& kv : cells) picks[(size_t)kv.second.cell] = kv.second.pick;
    std::memcpy(out_idx, picks.data(), (size_t)m * sizeof(int64_t));
    return m;
}

// Brute-force-free kNN via spatial hash grid: for each query, search the
// 27-neighborhood of its cell, expanding rings until k found (data assumed
// roughly uniform at ``cell`` resolution). Returns indices [m, k].
void knn_grid(
    const float* data, int64_t n,
    const float* query, int64_t m,
    int64_t k, float cell,
    int32_t* out_idx  // [m, k]
) {
    // exact 21-bit packing per axis: injective for |cell coord| < 2^20
    // (FNV on small lattice coords collides heavily and duplicates results)
    auto pack = [](int64_t gx, int64_t gy, int64_t gz) -> uint64_t {
        const int64_t off = 1LL << 20;
        return ((uint64_t)(gx + off) << 42) | ((uint64_t)(gy + off) << 21)
               | (uint64_t)(gz + off);
    };
    auto key = [cell, pack](float x, float y, float z) -> uint64_t {
        return pack(
            (int64_t)std::floor(x / cell),
            (int64_t)std::floor(y / cell),
            (int64_t)std::floor(z / cell));
    };
    std::unordered_map<uint64_t, std::vector<int32_t>> grid;
    grid.reserve((size_t)n * 2);
    for (int64_t i = 0; i < n; ++i)
        grid[key(data[i * 3], data[i * 3 + 1], data[i * 3 + 2])].push_back((int32_t)i);

    std::vector<std::pair<float, int32_t>> cand;
    for (int64_t q = 0; q < m; ++q) {
        const float* p = query + q * 3;
        int64_t cx = (int64_t)std::floor(p[0] / cell);
        int64_t cy = (int64_t)std::floor(p[1] / cell);
        int64_t cz = (int64_t)std::floor(p[2] / cell);
        cand.clear();
        for (int64_t ring = 1; ring <= 64; ++ring) {
            cand.clear();
            for (int64_t dx = -ring; dx <= ring; ++dx)
                for (int64_t dy = -ring; dy <= ring; ++dy)
                    for (int64_t dz = -ring; dz <= ring; ++dz) {
                        uint64_t h = pack(cx + dx, cy + dy, cz + dz);
                        auto it = grid.find(h);
                        if (it == grid.end()) continue;
                        for (int32_t idx : it->second) {
                            float ddx = data[idx * 3] - p[0];
                            float ddy = data[idx * 3 + 1] - p[1];
                            float ddz = data[idx * 3 + 2] - p[2];
                            cand.emplace_back(ddx * ddx + ddy * ddy + ddz * ddz, idx);
                        }
                    }
            // enough candidates AND the guaranteed-covered radius (the query
            // may sit at a cell corner, so only (ring-1) cells are certain)
            // encloses the k-th distance
            if ((int64_t)cand.size() >= k) {
                std::nth_element(cand.begin(), cand.begin() + (k - 1), cand.end());
                float kth = cand[(size_t)(k - 1)].first;
                float safe = (float)(ring - 1) * cell;
                if (kth <= safe * safe || ring == 64) break;
            }
        }
        int64_t kk = std::min<int64_t>(k, (int64_t)cand.size());
        std::partial_sort(cand.begin(), cand.begin() + kk, cand.end());
        for (int64_t j = 0; j < k; ++j)
            out_idx[q * k + j] = (int32_t)(j < kk ? cand[(size_t)j].second
                                                  : (kk > 0 ? cand[0].second : 0));
    }
}

// PointGroup proposal clustering: connected components of the same-label
// radius graph (reference pointgroup_ops ballquery_batch_p + bfs_cluster,
// libs/pointgroup_ops/src/bfs_cluster.cpp). Union-find over grid-hash
// neighbor candidates gives the same components as BFS. Components smaller
// than min_points get id -1. Returns the number of clusters kept.
int64_t pointgroup_cluster(
    const float* coord,    // [n, 3] (bias-shifted centers)
    const int32_t* labels, // [n] semantic label per point
    int64_t n,
    float radius,
    int32_t min_points,
    int32_t* out_cluster   // [n] compact cluster id or -1
) {
    const float r2 = radius * radius;
    auto pack = [](int64_t gx, int64_t gy, int64_t gz) -> uint64_t {
        const int64_t off = 1LL << 20;
        return ((uint64_t)(gx + off) << 42) | ((uint64_t)(gy + off) << 21)
               | (uint64_t)(gz + off);
    };
    std::unordered_map<uint64_t, std::vector<int32_t>> grid;
    grid.reserve((size_t)n * 2);
    auto cell_of = [&](int64_t i, int64_t& cx, int64_t& cy, int64_t& cz) {
        cx = (int64_t)std::floor(coord[i * 3] / radius);
        cy = (int64_t)std::floor(coord[i * 3 + 1] / radius);
        cz = (int64_t)std::floor(coord[i * 3 + 2] / radius);
    };
    for (int64_t i = 0; i < n; ++i) {
        int64_t cx, cy, cz;
        cell_of(i, cx, cy, cz);
        grid[pack(cx, cy, cz)].push_back((int32_t)i);
    }
    std::vector<int32_t> parent((size_t)n);
    for (int64_t i = 0; i < n; ++i) parent[(size_t)i] = (int32_t)i;
    std::function<int32_t(int32_t)> find = [&](int32_t x) {
        while (parent[(size_t)x] != x) {
            parent[(size_t)x] = parent[(size_t)parent[(size_t)x]];
            x = parent[(size_t)x];
        }
        return x;
    };
    for (int64_t i = 0; i < n; ++i) {
        int64_t cx, cy, cz;
        cell_of(i, cx, cy, cz);
        for (int64_t dx = -1; dx <= 1; ++dx)
            for (int64_t dy = -1; dy <= 1; ++dy)
                for (int64_t dz = -1; dz <= 1; ++dz) {
                    auto it = grid.find(pack(cx + dx, cy + dy, cz + dz));
                    if (it == grid.end()) continue;
                    for (int32_t j : it->second) {
                        if (j <= (int32_t)i || labels[j] != labels[i]) continue;
                        float ddx = coord[j * 3] - coord[i * 3];
                        float ddy = coord[j * 3 + 1] - coord[i * 3 + 1];
                        float ddz = coord[j * 3 + 2] - coord[i * 3 + 2];
                        if (ddx * ddx + ddy * ddy + ddz * ddz > r2) continue;
                        int32_t ri = find((int32_t)i), rj = find(j);
                        if (ri != rj) parent[(size_t)ri] = rj;
                    }
                }
    }
    std::unordered_map<int32_t, int32_t> sizes;
    for (int64_t i = 0; i < n; ++i) sizes[find((int32_t)i)] += 1;
    std::unordered_map<int32_t, int32_t> remap;
    int32_t next_id = 0;
    for (int64_t i = 0; i < n; ++i) {
        int32_t r = find((int32_t)i);
        if (sizes[r] < min_points) { out_cluster[i] = -1; continue; }
        auto it = remap.find(r);
        if (it == remap.end()) { remap.emplace(r, next_id); out_cluster[i] = next_id++; }
        else out_cluster[i] = it->second;
    }
    return next_id;
}

// Per-row majority vote over k neighbor labels; ignore_index never wins
// unless all votes are ignored (reference utils/misc.py:17-51).
void majority_vote(
    const int32_t* labels, int64_t m, int64_t k,
    int32_t num_classes, int32_t ignore_index,
    int32_t* out  // [m]
) {
    std::vector<int32_t> counts((size_t)num_classes);
    for (int64_t i = 0; i < m; ++i) {
        std::fill(counts.begin(), counts.end(), 0);
        for (int64_t j = 0; j < k; ++j) {
            int32_t lab = labels[i * k + j];
            if (lab == ignore_index || lab < 0 || lab >= num_classes) continue;
            ++counts[(size_t)lab];
        }
        // count ties break to the SMALLEST class id, matching the reference
        // scan (pointcept/utils/misc.py:42-46) and np.argmax semantics
        int32_t best = ignore_index, best_count = 0;
        for (int32_t c = 0; c < num_classes; ++c) {
            if (counts[(size_t)c] > best_count) {
                best_count = counts[(size_t)c];
                best = c;
            }
        }
        out[i] = best;
    }
}

// Dense-voxel-grid submanifold conv plan, host side. Exact semantics of the
// device builder (ops/subm_conv.py:build_subm_conv_plan_dense, itself the
// TPU rebuild of spconv SubMConv3d's GPU hash table,
// point_transformer_v3m1_base.py:277-287): scatter point ids into a
// [ex, ey, ez + 2r] grid, then read every point's k^3 neighborhood. The plan
// is a pure function of grid_coord, so the data-loader workers build it here
// and ship it as a batch input — plan construction overlaps device compute
// entirely instead of eating ~70 ms/fwd of device scalar-gather time.
//
// out_nbr is [n, k^3] point-major (contiguous per-point writes; the device
// transposes to its [K3, N] layout in one cheap pass). Invalid slots are 0.
void subm_dense_plan(
    const int32_t* grid_coord,  // [n, 3]
    const uint8_t* mask,        // [n]
    int64_t n,
    int32_t k, int32_t ex, int32_t ey, int32_t ez,
    int32_t* out_nbr,           // [n, k^3] neighbor index (0 where invalid)
    uint8_t* out_valid          // [n, k^3]
) {
    // Sorted two-pointer merge instead of a dense grid: at flagship extents
    // the scene is ~0.1% occupied, so grid probes are all cache misses into
    // a 133 MB buffer (measured 189 ms at 32k); sorting once and scanning a
    // z-window per (dx, dy) column offset is O(k^2 * n) sequential work.
    const int32_t r = k / 2;
    const int64_t k3 = (int64_t)k * k * k;

    auto key_of = [&](int64_t x, int64_t y, int64_t z) {
        return (x * ey + y) * ez + z;
    };
    // queries: every masked point, sorted by (x, y, z); OOB centers still
    // query (their in-extent column offsets can match), matching the device
    // builder's clip-and-mask semantics
    static thread_local std::vector<std::pair<int64_t, int32_t>> qry;
    qry.clear();
    qry.reserve((size_t)n);
    for (int64_t i = 0; i < n; ++i) {
        if (!mask[i]) {
            std::memset(out_nbr + i * k3, 0, (size_t)k3 * sizeof(int32_t));
            std::memset(out_valid + i * k3, 0, (size_t)k3);
            continue;
        }
        const int32_t* g = grid_coord + i * 3;
        // lexicographic sort key over possibly-negative coords: offset by k
        // (any offset preserving order works; keys are only for ordering)
        qry.emplace_back(
            key_of((int64_t)g[0] + k, (int64_t)g[1] + k, (int64_t)g[2] + k),
            (int32_t)i);
    }
    std::sort(qry.begin(), qry.end());
    const int64_t nq = (int64_t)qry.size();

    // (key, id) of in-extent masked points, sorted by key: the shifted sort
    // key above is strictly monotone in (x, y, z), so the in-extent subset
    // of the sorted queries is already key-ordered — one sort, not two
    static thread_local std::vector<std::pair<int64_t, int32_t>> data;
    data.clear();
    data.reserve((size_t)nq);
    for (int64_t qi = 0; qi < nq; ++qi) {
        const int32_t i = qry[(size_t)qi].second;
        const int32_t* g = grid_coord + (int64_t)i * 3;
        if (g[0] < 0 || g[0] >= ex || g[1] < 0 || g[1] >= ey || g[2] < 0 ||
            g[2] >= ez)
            continue;
        data.emplace_back(key_of(g[0], g[1], g[2]), i);
    }
    const int64_t nd = (int64_t)data.size();

    // tmp rows in sorted-query order (contiguous writes), permuted to
    // original order at the end
    static thread_local std::vector<int32_t> tmp_nbr;
    static thread_local std::vector<uint8_t> tmp_val;
    tmp_nbr.assign((size_t)(nq * k3), 0);
    tmp_val.assign((size_t)(nq * k3), 0);

    for (int32_t dx = -r; dx <= r; ++dx) {
        for (int32_t dy = -r; dy <= r; ++dy) {
            const int64_t kbase = ((int64_t)(dx + r) * k + (dy + r)) * k;
            int64_t p = 0;  // advances monotonically over data
            for (int64_t qi = 0; qi < nq; ++qi) {
                const int32_t i = qry[(size_t)qi].second;
                const int32_t* g = grid_coord + (int64_t)i * 3;
                const int32_t qx = g[0] + dx, qy = g[1] + dy, z = g[2];
                if (qx < 0 || qx >= ex || qy < 0 || qy >= ey || z < 0 ||
                    z >= ez)
                    continue;
                const int64_t base = key_of(qx, qy, z);
                const int32_t dz_lo = z - r < 0 ? -z : -r;
                const int32_t dz_hi = z + r >= ez ? ez - 1 - z : r;
                const int64_t lo = base + dz_lo;
                while (p < nd && data[(size_t)p].first < lo) ++p;
                int32_t* nbr_row = tmp_nbr.data() + qi * k3 + kbase;
                uint8_t* val_row = tmp_val.data() + qi * k3 + kbase;
                for (int64_t j = p;
                     j < nd && data[(size_t)j].first <= base + dz_hi; ++j) {
                    const int32_t dz = (int32_t)(data[(size_t)j].first - base);
                    nbr_row[dz + r] = data[(size_t)j].second;
                    val_row[dz + r] = 1;
                }
            }
        }
    }

    for (int64_t qi = 0; qi < nq; ++qi) {
        const int64_t i = qry[(size_t)qi].second;
        std::memcpy(out_nbr + i * k3, tmp_nbr.data() + qi * k3,
                    (size_t)k3 * sizeof(int32_t));
        std::memcpy(out_valid + i * k3, tmp_val.data() + qi * k3, (size_t)k3);
    }
}

}  // extern "C"
