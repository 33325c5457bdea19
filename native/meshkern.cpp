// Native mesh kernels for cfd2_tpu (C++17 + OpenMP, ctypes ABI).
//
// The reference implements its host-side mesh pipeline in Rust with rayon +
// SIMD (src/solver/mesh/*).  These are the equivalent native kernels for the
// hot loops that don't vectorize well in NumPy:
//
//   * poisson_disk     — variable-radius Bridson sampling with built-in SDF
//                        evaluators (reference delaunay.rs:200-334)
//   * smooth_mesh      — Laplacian smoothing with SDF re-projection
//                        (reference structs.rs:159-292)
//
// Exposed with a plain C ABI for ctypes; Python falls back to the NumPy
// implementations when the shared library is unavailable.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <random>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// SDF evaluators.  geom_kind: 0=ChannelWithObstacle, 1=BackwardsStep,
// 2=RectangularChannel, 3=CircleObstacle.  params layout per kind matches
// cfd2_tpu/mesh/geometry.py.

static inline double box_sdf(double px, double py, double cx, double cy,
                             double hx, double hy) {
    double dx = std::fabs(px - cx) - hx;
    double dy = std::fabs(py - cy) - hy;
    double ox = dx > 0 ? dx : 0;
    double oy = dy > 0 ? dy : 0;
    double outside = std::sqrt(ox * ox + oy * oy);
    double inside = std::fmin(std::fmax(dx, dy), 0.0);
    return inside + outside;
}

static double eval_sdf(int kind, const double* p, double x, double y) {
    switch (kind) {
        case 0: {  // ChannelWithObstacle: length, height, ox, oy, r
            double box = box_sdf(x, y, p[0] / 2, p[1] / 2, p[0] / 2, p[1] / 2);
            double circ = std::hypot(x - p[2], y - p[3]) - p[4];
            return std::fmax(box, -circ);
        }
        case 1: {  // BackwardsStep: length, h_inlet, h_outlet, step_x
            double outer = box_sdf(x, y, p[0] / 2, p[2] / 2, p[0] / 2, p[2] / 2);
            double sh = p[2] - p[1], sw = p[3];
            double block = box_sdf(x, y, sw / 2, sh / 2, sw / 2, sh / 2);
            return std::fmax(outer, -block);
        }
        case 2:  // RectangularChannel: length, height
            return box_sdf(x, y, p[0] / 2, p[1] / 2, p[0] / 2, p[1] / 2);
        case 3:  // CircleObstacle: cx, cy, r (fluid outside)
            return p[2] - std::hypot(x - p[0], y - p[1]);
        default:
            return 1e30;
    }
}

double meshkern_sdf(int kind, const double* params, double x, double y) {
    return eval_sdf(kind, params, x, y);
}

// ---------------------------------------------------------------------------
// Variable-radius Bridson Poisson-disk sampling.
// boundary: (nb, 2) seed points.  out: caller-allocated (max_out, 2).
// Returns number of points written (including the boundary seeds).

int64_t meshkern_poisson_disk(
    int geom_kind, const double* geom_params,
    const double* boundary, int64_t nb,
    double min_cell, double max_cell, double growth_rate,
    double domain_x, double domain_y,
    uint64_t seed, double* out, int64_t max_out) {

    const double cell = min_cell / std::sqrt(2.0);
    const int gw = (int)std::ceil(domain_x / cell);
    const int gh = (int)std::ceil(domain_y / cell);
    std::vector<std::vector<int64_t>> grid((size_t)gw * gh);

    std::vector<double> xs, ys;
    xs.reserve(max_out);
    ys.reserve(max_out);

    auto grid_idx = [&](double x, double y) -> int64_t {
        int gx = (int)(x / cell);
        int gy = (int)(y / cell);
        if (gx < 0) gx = 0;
        if (gy < 0) gy = 0;
        if (gx >= gw) gx = gw - 1;
        if (gy >= gh) gy = gh - 1;
        return (int64_t)gy * gw + gx;
    };

    auto radius = [&](double x, double y) {
        double d = std::fabs(eval_sdf(geom_kind, geom_params, x, y));
        double slope = growth_rate - 1.0;
        if (slope < 0) slope = 0;
        double r = min_cell + slope * d;
        return r < max_cell ? r : max_cell;
    };

    auto has_close = [&](double x, double y, double r) {
        int w = (int)std::ceil(r / cell);
        int gx = (int)(x / cell);
        int gy = (int)(y / cell);
        for (int iy = gy - w; iy <= gy + w; ++iy) {
            if (iy < 0 || iy >= gh) continue;
            for (int ix = gx - w; ix <= gx + w; ++ix) {
                if (ix < 0 || ix >= gw) continue;
                for (int64_t j : grid[(size_t)iy * gw + ix]) {
                    double dx = xs[j] - x, dy = ys[j] - y;
                    if (dx * dx + dy * dy < r * r) return true;
                }
            }
        }
        return false;
    };

    std::vector<int64_t> active;
    if (nb > max_out) nb = max_out;  // out is caller-allocated (max_out, 2)
    for (int64_t i = 0; i < nb; ++i) {
        xs.push_back(boundary[2 * i]);
        ys.push_back(boundary[2 * i + 1]);
        grid[grid_idx(xs[i], ys[i])].push_back(i);
        active.push_back(i);
    }

    std::mt19937_64 rng(seed);
    std::uniform_real_distribution<double> unif(0.0, 1.0);
    const int k = 30;
    const double two_pi = 6.283185307179586;

    while (!active.empty() && (int64_t)xs.size() < max_out) {
        size_t ai = (size_t)(unif(rng) * active.size());
        if (ai >= active.size()) ai = active.size() - 1;
        int64_t pi = active[ai];
        double px = xs[pi], py = ys[pi];
        double r = radius(px, py);

        bool found = false;
        for (int t = 0; t < k; ++t) {
            double ang = unif(rng) * two_pi;
            double dist = r * (1.0 + unif(rng));
            double nx = px + dist * std::cos(ang);
            double ny = py + dist * std::sin(ang);
            if (nx < 0 || nx > domain_x || ny < 0 || ny > domain_y) continue;
            if (eval_sdf(geom_kind, geom_params, nx, ny) >= -0.3 * r) continue;
            double nr = radius(nx, ny);
            if (has_close(nx, ny, nr)) continue;
            int64_t idx = (int64_t)xs.size();
            if (idx >= max_out) break;
            xs.push_back(nx);
            ys.push_back(ny);
            grid[grid_idx(nx, ny)].push_back(idx);
            active.push_back(idx);
            found = true;
        }
        if (!found) {
            active[ai] = active.back();
            active.pop_back();
        }
    }

    int64_t n = (int64_t)xs.size();
    for (int64_t i = 0; i < n; ++i) {
        out[2 * i] = xs[i];
        out[2 * i + 1] = ys[i];
    }
    return n;
}

// ---------------------------------------------------------------------------
// Laplacian smoothing with SDF re-projection (one batch of iterations).
// vx/vy: (nv) vertex coords, modified in place.
// adj_off: (nv+1) CSR offsets, adj: neighbor vertex ids.
// fixed: (nv) 1 = surface vertex (re-projected), on_box: 1 = pinned.

void meshkern_smooth(
    int geom_kind, const double* geom_params,
    double* vx, double* vy, int64_t nv,
    const int64_t* adj_off, const int64_t* adj,
    const uint8_t* fixed, const uint8_t* on_box,
    int iterations, double alpha) {

    std::vector<double> nx(nv), ny(nv);
    for (int it = 0; it < iterations; ++it) {
#pragma omp parallel for schedule(static)
        for (int64_t i = 0; i < nv; ++i) {
            double x_old = vx[i], y_old = vy[i];
            int64_t s = adj_off[i], e = adj_off[i + 1];
            if (on_box[i] || s == e) {
                nx[i] = x_old;
                ny[i] = y_old;
                continue;
            }
            double sx = 0, sy = 0;
            for (int64_t kk = s; kk < e; ++kk) {
                sx += vx[adj[kk]];
                sy += vy[adj[kk]];
            }
            double cnt = (double)(e - s);
            double x_new = x_old + (sx / cnt - x_old) * alpha;
            double y_new = y_old + (sy / cnt - y_old) * alpha;

            if (fixed[i]) {
                // Project back onto the SDF zero level (structs.rs:247-263).
                double d = eval_sdf(geom_kind, geom_params, x_new, y_new);
                const double eps = 1e-6;
                double gx = eval_sdf(geom_kind, geom_params, x_new + eps, y_new)
                          - eval_sdf(geom_kind, geom_params, x_new - eps, y_new);
                double gy = eval_sdf(geom_kind, geom_params, x_new, y_new + eps)
                          - eval_sdf(geom_kind, geom_params, x_new, y_new - eps);
                double gn = std::sqrt(gx * gx + gy * gy);
                if (gn > 1e-30) {
                    x_new -= gx / gn * d;
                    y_new -= gy / gn * d;
                }
            }

            // Reject edge-collapsing moves (structs.rs:266-281).
            bool bad = false;
            for (int64_t kk = s; kk < e; ++kk) {
                double dx = x_new - vx[adj[kk]];
                double dy = y_new - vy[adj[kk]];
                if (dx * dx + dy * dy < 1e-8) { bad = true; break; }
            }
            nx[i] = bad ? x_old : x_new;
            ny[i] = bad ? y_old : y_new;
        }
        std::memcpy(vx, nx.data(), sizeof(double) * nv);
        std::memcpy(vy, ny.data(), sizeof(double) * nv);
    }
}

// ---------------------------------------------------------------------------
// Greedy AMG aggregation over an ELL adjacency (reference amg.rs:84-116).
// ell_ngh: (n, k) neighbor ids (self = no edge), mask: (n, k) validity.
// agg_out: (n).  Returns the number of aggregates.

int64_t meshkern_amg_aggregate(
    const int32_t* ell_ngh, const uint8_t* mask,
    int64_t n, int64_t k, int64_t* agg_out) {
    for (int64_t i = 0; i < n; ++i) agg_out[i] = -1;
    int64_t num = 0;
    for (int64_t i = 0; i < n; ++i) {
        if (agg_out[i] >= 0) continue;
        agg_out[i] = num;
        const int32_t* row = ell_ngh + i * k;
        const uint8_t* mrow = mask + i * k;
        for (int64_t s = 0; s < k; ++s) {
            int64_t j = row[s];
            if (mrow[s] && j != i && agg_out[j] < 0) agg_out[j] = num;
        }
        ++num;
    }
    return num;
}

}  // extern "C"
