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
thread_local std::vector<double> g_dist;
thread_local std::vector<double> g_dx;
thread_local std::vector<double> g_dy;

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

// Periodic (2-torus, period 1 per axis) radius graph with the min-image
// metric minimized over the 9 shifted copies — the intended semantics of
// the reference's TorusGridSplitter.torus_connectivity
// (multipole-graph-neural-operator/utilities.py:1190-1227; see
// graph/build.py torus2d_connectivity for the reference-bug notes).
// Cell list on the wrapped coordinates (cell size >= r), so O(n *
// neighbors) instead of the dense 9-copy O(n^2) numpy path. Shift order
// and first-min tie-breaking match numpy's argmin over the shift axis
// ((sx, sy) for sx in {0,1,-1} for sy in {0,1,-1}) so results are
// bit-identical to the Python implementation. Emits, per edge, the
// distance and signed periodic differences x_i - (x_j + s*) of the
// argmin copy. Returns edge count, or -1 on invalid input.
int64_t gpde_torus2d_graph(const double* pts, int64_t n, double r) {
    if (n <= 0 || r <= 0.0) return -1;
    g_src.clear(); g_dst.clear();
    g_dist.clear(); g_dx.clear(); g_dy.clear();

    const double SHIFTS[3] = {0.0, 1.0, -1.0};

    // wrapped coordinates for binning only (distances use raw coords)
    const int64_t nc = std::max<int64_t>(
        1, static_cast<int64_t>(std::floor(1.0 / r)));
    const double cs = 1.0 / static_cast<double>(nc);
    std::vector<int64_t> cell(n);
    std::unordered_map<int64_t, std::vector<int64_t>> bins;
    bins.reserve(static_cast<size_t>(n));
    for (int64_t i = 0; i < n; ++i) {
        double qx = pts[2 * i] - std::floor(pts[2 * i]);
        double qy = pts[2 * i + 1] - std::floor(pts[2 * i + 1]);
        int64_t cx = std::min<int64_t>(
            static_cast<int64_t>(qx / cs), nc - 1);
        int64_t cy = std::min<int64_t>(
            static_cast<int64_t>(qy / cs), nc - 1);
        cell[i] = cx * nc + cy;
        bins[cell[i]].push_back(i);
    }

    for (int64_t i = 0; i < n; ++i) {
        const double pix = pts[2 * i], piy = pts[2 * i + 1];
        int64_t cx = cell[i] / nc, cy = cell[i] % nc;
        // wrapped neighbor cells, deduplicated (nc may be 1 or 2)
        int64_t xs[3], ys[3];
        int nx = 0, ny = 0;
        for (int64_t d = -1; d <= 1; ++d) {
            int64_t wx = ((cx + d) % nc + nc) % nc;
            int64_t wy = ((cy + d) % nc + nc) % nc;
            bool seen = false;
            for (int t = 0; t < nx; ++t) seen |= (xs[t] == wx);
            if (!seen) xs[nx++] = wx;
            seen = false;
            for (int t = 0; t < ny; ++t) seen |= (ys[t] == wy);
            if (!seen) ys[ny++] = wy;
        }
        for (int a = 0; a < nx; ++a)
        for (int b = 0; b < ny; ++b) {
            auto it = bins.find(xs[a] * nc + ys[b]);
            if (it == bins.end()) continue;
            for (int64_t j : it->second) {
                const double pjx = pts[2 * j], pjy = pts[2 * j + 1];
                double best = 1e300, bx = 0.0, by = 0.0;
                for (int si = 0; si < 3; ++si)
                for (int sj = 0; sj < 3; ++sj) {
                    double dx = pix - (pjx + SHIFTS[si]);
                    double dy = piy - (pjy + SHIFTS[sj]);
                    double d2 = dx * dx + dy * dy;
                    if (d2 < best) { best = d2; bx = dx; by = dy; }
                }
                // compare on sqrt like the numpy path (dmin <= r on
                // distances, not squares) for bit-identical boundaries
                double dd = std::sqrt(best);
                if (dd <= r) {
                    g_src.push_back(i);
                    g_dst.push_back(j);
                    g_dist.push_back(dd);
                    g_dx.push_back(bx);
                    g_dy.push_back(by);
                }
            }
        }
    }
    return static_cast<int64_t>(g_src.size());
}

// Copies the torus edges + geometry from the last gpde_torus2d_graph
// call on this thread into caller-allocated arrays of length >= count.
void gpde_copy_torus_edges(int64_t* src_out, int64_t* dst_out,
                           double* dist_out, double* dx_out,
                           double* dy_out) {
    std::memcpy(src_out, g_src.data(), g_src.size() * sizeof(int64_t));
    std::memcpy(dst_out, g_dst.data(), g_dst.size() * sizeof(int64_t));
    std::memcpy(dist_out, g_dist.data(), g_dist.size() * sizeof(double));
    std::memcpy(dx_out, g_dx.data(), g_dx.size() * sizeof(double));
    std::memcpy(dy_out, g_dy.data(), g_dy.size() * sizeof(double));
    g_src.clear(); g_src.shrink_to_fit();
    g_dst.clear(); g_dst.shrink_to_fit();
    g_dist.clear(); g_dist.shrink_to_fit();
    g_dx.clear(); g_dx.shrink_to_fit();
    g_dy.clear(); g_dy.shrink_to_fit();
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
