// Native ray–cell intersection for unstructured meshes.
//
// The reference delegates ray/cell queries to VTK's C++ locators
// (utils.py:372,406,454 — find_cells_intersecting_line).  The TPU build's
// primary path is the on-device DDA over voxel grids (ctc/raytrace.py); this
// extension supplies the host-side equivalent for *unstructured* meshes,
// where cells are arbitrary convex elements summarized by their axis-aligned
// bounding boxes (exact for the hex/voxel meshes the CTC workflow uses,
// a superset for skewed elements).
//
// Algorithm: bin cell AABBs into a uniform grid; per ray, 3D-DDA through the
// bins, slab-test each candidate AABB, dedup with a per-thread visit-stamp
// array.  OpenMP across rays.
//
// C API (ctypes-friendly):
//   long trace_segments_aabb(boxes[n_cells*6] (xmin,xmax,ymin,ymax,zmin,zmax),
//                            n_cells, p1s[n_rays*3], p2s[n_rays*3], n_rays,
//                            out_rays[max_hits], out_cells[max_hits],
//                            max_hits)
//   returns the number of (ray, cell) hit pairs written, or -(needed) if
//   max_hits was too small.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

struct Grid {
    double lo[3], inv_cell[3];
    int dims[3];
    std::vector<std::vector<int32_t>> bins;

    int bin_index(int ix, int iy, int iz) const {
        return ix + dims[0] * (iy + dims[1] * iz);
    }
};

inline int clampi(int v, int lo, int hi) {
    return v < lo ? lo : (v > hi ? hi : v);
}

bool segment_hits_aabb(const double* p1, const double* dir, double t0,
                       double t1, const double* box) {
    // slab test on [t0, t1]
    for (int a = 0; a < 3; ++a) {
        const double lo = box[2 * a], hi = box[2 * a + 1];
        if (std::fabs(dir[a]) < 1e-300) {
            if (p1[a] < lo || p1[a] > hi) return false;
            continue;
        }
        double ta = (lo - p1[a]) / dir[a];
        double tb = (hi - p1[a]) / dir[a];
        if (ta > tb) std::swap(ta, tb);
        t0 = std::max(t0, ta);
        t1 = std::min(t1, tb);
        if (t0 > t1) return false;
    }
    return true;
}

}  // namespace

extern "C" {

long trace_segments_aabb(const double* boxes, long n_cells,
                         const double* p1s, const double* p2s, long n_rays,
                         int64_t* out_rays, int64_t* out_cells,
                         long max_hits) {
    if (n_cells <= 0 || n_rays <= 0) return 0;

    // --- build the uniform grid over the mesh bounds ---
    Grid g;
    double hi[3];
    for (int a = 0; a < 3; ++a) {
        g.lo[a] = boxes[2 * a];
        hi[a] = boxes[2 * a + 1];
    }
    for (long c = 1; c < n_cells; ++c) {
        for (int a = 0; a < 3; ++a) {
            g.lo[a] = std::min(g.lo[a], boxes[6 * c + 2 * a]);
            hi[a] = std::max(hi[a], boxes[6 * c + 2 * a + 1]);
        }
    }
    const int target = std::max(1, (int)std::cbrt((double)n_cells));
    for (int a = 0; a < 3; ++a) {
        double span = std::max(hi[a] - g.lo[a], 1e-12);
        g.dims[a] = std::min(std::max(target, 1), 256);
        g.inv_cell[a] = g.dims[a] / span;
    }
    g.bins.resize((size_t)g.dims[0] * g.dims[1] * g.dims[2]);
    for (long c = 0; c < n_cells; ++c) {
        int b0[3], b1[3];
        for (int a = 0; a < 3; ++a) {
            b0[a] = clampi((int)((boxes[6 * c + 2 * a] - g.lo[a])
                                 * g.inv_cell[a]), 0, g.dims[a] - 1);
            b1[a] = clampi((int)((boxes[6 * c + 2 * a + 1] - g.lo[a])
                                 * g.inv_cell[a]), 0, g.dims[a] - 1);
        }
        for (int iz = b0[2]; iz <= b1[2]; ++iz)
            for (int iy = b0[1]; iy <= b1[1]; ++iy)
                for (int ix = b0[0]; ix <= b1[0]; ++ix)
                    g.bins[g.bin_index(ix, iy, iz)].push_back((int32_t)c);
    }

    // --- trace rays (OpenMP), collect into per-thread buffers ---
    int n_threads = 1;
#ifdef _OPENMP
    n_threads = omp_get_max_threads();
#endif
    std::vector<std::vector<int64_t>> t_rays(n_threads), t_cells(n_threads);

#pragma omp parallel
    {
        int tid = 0;
#ifdef _OPENMP
        tid = omp_get_thread_num();
#endif
        std::vector<int64_t> stamp((size_t)n_cells, -1);
        auto& my_rays = t_rays[tid];
        auto& my_cells = t_cells[tid];

#pragma omp for schedule(dynamic, 16)
        for (long r = 0; r < n_rays; ++r) {
            const double* p1 = p1s + 3 * r;
            const double* p2 = p2s + 3 * r;
            double dir[3] = {p2[0] - p1[0], p2[1] - p1[1], p2[2] - p1[2]};

            // clip the segment to the grid AABB
            double t0 = 0.0, t1 = 1.0;
            bool miss = false;
            for (int a = 0; a < 3; ++a) {
                double glo = g.lo[a];
                double ghi = g.lo[a] + g.dims[a] / g.inv_cell[a];
                if (std::fabs(dir[a]) < 1e-300) {
                    if (p1[a] < glo || p1[a] > ghi) { miss = true; break; }
                    continue;
                }
                double ta = (glo - p1[a]) / dir[a];
                double tb = (ghi - p1[a]) / dir[a];
                if (ta > tb) std::swap(ta, tb);
                t0 = std::max(t0, ta);
                t1 = std::min(t1, tb);
                if (t0 > t1) { miss = true; break; }
            }
            if (miss) continue;

            // DDA through grid bins
            double pe[3];
            int vox[3], step[3];
            double tmax[3], tdelta[3];
            for (int a = 0; a < 3; ++a) {
                pe[a] = p1[a] + (t0 + 1e-12) * dir[a];
                vox[a] = clampi((int)((pe[a] - g.lo[a]) * g.inv_cell[a]),
                                0, g.dims[a] - 1);
                if (dir[a] > 0) step[a] = 1;
                else if (dir[a] < 0) step[a] = -1;
                else step[a] = 0;
                if (step[a] != 0) {
                    double bound = g.lo[a] + (vox[a] + (step[a] > 0 ? 1 : 0))
                                   / g.inv_cell[a];
                    tmax[a] = (bound - p1[a]) / dir[a];
                    tdelta[a] = std::fabs(1.0 / (g.inv_cell[a] * dir[a]));
                } else {
                    tmax[a] = 1e300;
                    tdelta[a] = 1e300;
                }
            }

            while (true) {
                const auto& bin = g.bins[g.bin_index(vox[0], vox[1], vox[2])];
                for (int32_t c : bin) {
                    if (stamp[(size_t)c] == r) continue;
                    if (segment_hits_aabb(p1, dir, t0, t1, boxes + 6 * c)) {
                        stamp[(size_t)c] = r;
                        my_rays.push_back(r);
                        my_cells.push_back(c);
                    }
                }
                int axis = 0;
                if (tmax[1] < tmax[axis]) axis = 1;
                if (tmax[2] < tmax[axis]) axis = 2;
                if (tmax[axis] > t1) break;
                vox[axis] += step[axis];
                if (vox[axis] < 0 || vox[axis] >= g.dims[axis]) break;
                tmax[axis] += tdelta[axis];
            }
        }
    }

    // --- gather ---
    long total = 0;
    for (int t = 0; t < n_threads; ++t) total += (long)t_rays[t].size();
    if (total > max_hits) return -total;
    long off = 0;
    for (int t = 0; t < n_threads; ++t) {
        std::memcpy(out_rays + off, t_rays[t].data(),
                    t_rays[t].size() * sizeof(int64_t));
        std::memcpy(out_cells + off, t_cells[t].data(),
                    t_cells[t].size() * sizeof(int64_t));
        off += (long)t_rays[t].size();
    }
    return total;
}

}  // extern "C"
