// Native radius-graph builder: uniform cell-list, O(n * neighbors).
//
// TPU-native replacement for the reference's dense sklearn
// pairwise_distances radius graphs (multipole-graph-neural-operator/
// utilities.py:276-289, 391-425), which are O(n^2) in time and memory —
// 3.4e9 pair distances at the s=241 grid. The cell list bins points into
// boxes of side r and scans the 3^d neighboring boxes per point.
//
// Semantics match the reference: all ordered pairs (i, j) with
// dist(a_i, b_j) <= r, INCLUDING self-pairs (distance 0), in
// unspecified order (the Python wrapper sorts). Supports d in {1, 2, 3}
// and the bipartite variant (rows from A, columns from B).
//
// ABI (ctypes): two-phase. gpde_radius_graph builds into thread-local
// buffers and returns the edge count; gpde_copy_edges copies them out.

#include <cstdint>
#include <cmath>
#include <cstring>
#include <vector>
#include <unordered_map>
#include <algorithm>

namespace {

struct CellKey {
    int64_t c[3];
    bool operator==(const CellKey& o) const {
        return c[0] == o.c[0] && c[1] == o.c[1] && c[2] == o.c[2];
    }
};

struct CellHash {
    size_t operator()(const CellKey& k) const {
        // 64-bit mix of the three coordinates
        uint64_t h = 1469598103934665603ull;
        for (int i = 0; i < 3; ++i) {
            h ^= static_cast<uint64_t>(k.c[i]) + 0x9e3779b97f4a7c15ull;
            h *= 1099511628211ull;
        }
        return static_cast<size_t>(h);
    }
};

thread_local std::vector<int64_t> g_src;
thread_local std::vector<int64_t> g_dst;

inline CellKey cell_of(const double* p, int64_t dim, double inv_r) {
    CellKey k{{0, 0, 0}};
    for (int64_t j = 0; j < dim; ++j)
        k.c[j] = static_cast<int64_t>(std::floor(p[j] * inv_r));
    return k;
}

}  // namespace

extern "C" {

// Builds edges (i, j) with ||a_i - b_j|| <= r. Pass b == nullptr for the
// self-graph (b = a). Returns edge count, or -1 on invalid input.
int64_t gpde_radius_graph(const double* a, int64_t na,
                          const double* b, int64_t nb,
                          int64_t dim, double r) {
    if (dim < 1 || dim > 3 || r <= 0.0 || na <= 0) return -1;
    const double* bb = (b == nullptr) ? a : b;
    const int64_t nbb = (b == nullptr) ? na : nb;
    if (nbb <= 0) return -1;

    g_src.clear();
    g_dst.clear();

    const double inv_r = 1.0 / r;
    const double r2 = r * r;

    // bin the B points
    std::unordered_map<CellKey, std::vector<int64_t>, CellHash> cells;
    cells.reserve(static_cast<size_t>(nbb));
    for (int64_t j = 0; j < nbb; ++j)
        cells[cell_of(bb + j * dim, dim, inv_r)].push_back(j);

    const int64_t lo = -1, hi = 1;
    for (int64_t i = 0; i < na; ++i) {
        const double* p = a + i * dim;
        CellKey base = cell_of(p, dim, inv_r);
        int64_t d0lo = lo, d0hi = hi;
        int64_t d1lo = (dim > 1) ? lo : 0, d1hi = (dim > 1) ? hi : 0;
        int64_t d2lo = (dim > 2) ? lo : 0, d2hi = (dim > 2) ? hi : 0;
        for (int64_t dx = d0lo; dx <= d0hi; ++dx)
        for (int64_t dy = d1lo; dy <= d1hi; ++dy)
        for (int64_t dz = d2lo; dz <= d2hi; ++dz) {
            CellKey k{{base.c[0] + dx, base.c[1] + dy, base.c[2] + dz}};
            auto it = cells.find(k);
            if (it == cells.end()) continue;
            for (int64_t j : it->second) {
                const double* q = bb + j * dim;
                double d2 = 0.0;
                for (int64_t t = 0; t < dim; ++t) {
                    double diff = p[t] - q[t];
                    d2 += diff * diff;
                }
                if (d2 <= r2) {
                    g_src.push_back(i);
                    g_dst.push_back(j);
                }
            }
        }
    }
    return static_cast<int64_t>(g_src.size());
}

// Copies the edges produced by the last gpde_radius_graph call on this
// thread into caller-allocated arrays of length >= count.
void gpde_copy_edges(int64_t* src_out, int64_t* dst_out) {
    std::memcpy(src_out, g_src.data(), g_src.size() * sizeof(int64_t));
    std::memcpy(dst_out, g_dst.data(), g_dst.size() * sizeof(int64_t));
    g_src.clear();
    g_src.shrink_to_fit();
    g_dst.clear();
    g_dst.shrink_to_fit();
}

}  // extern "C"
