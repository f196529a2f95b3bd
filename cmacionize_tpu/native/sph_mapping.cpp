// SPH particle <-> Cartesian grid mapping kernels (native host-side path).
//
// Native equivalent of the reference's SPHArrayInterface mapping machinery
// (/root/reference/src/SPHArrayInterface.cpp — M-over-V, centroid and
// kernel-weighted mappings over an Octree neighbor search): the gridding of
// large particle sets is host-side, branchy, scatter-heavy work that neither
// the TPU nor numpy's add.at handle well, so it lives in C++ like the
// reference's does.  Exposed through ctypes (see native/__init__.py);
// cmacionize_tpu.api falls back to a numpy implementation when the shared
// library has not been built.
//
// All functions use SI units and C-contiguous double arrays.

#include <algorithm>
#include <cmath>
#include <cstdint>

extern "C" {

// Nearest-cell mass deposition: grid[cell] += m; density = mass / V_cell.
void deposit_m_over_v(const double *positions, const double *masses,
                      int64_t n_part, const double *anchor,
                      const double *sides, const int64_t *dims,
                      double *grid /* [nx*ny*nz], pre-zeroed */) {
  const double inv_dx = dims[0] / sides[0];
  const double inv_dy = dims[1] / sides[1];
  const double inv_dz = dims[2] / sides[2];
  const double cell_volume =
      (sides[0] / dims[0]) * (sides[1] / dims[1]) * (sides[2] / dims[2]);
  const double inv_cell_volume = 1.0 / cell_volume;
  for (int64_t i = 0; i < n_part; ++i) {
    int64_t ix = (int64_t)((positions[3 * i] - anchor[0]) * inv_dx);
    int64_t iy = (int64_t)((positions[3 * i + 1] - anchor[1]) * inv_dy);
    int64_t iz = (int64_t)((positions[3 * i + 2] - anchor[2]) * inv_dz);
    ix = std::max<int64_t>(0, std::min(ix, dims[0] - 1));
    iy = std::max<int64_t>(0, std::min(iy, dims[1] - 1));
    iz = std::max<int64_t>(0, std::min(iz, dims[2] - 1));
    grid[(ix * dims[1] + iy) * dims[2] + iz] += masses[i] * inv_cell_volume;
  }
}

// Cubic-spline (M4) kernel value for q = r/h, normalized in 3D.
static inline double cubic_spline(double q, double h) {
  const double sigma = 1.0 / (M_PI * h * h * h);
  if (q < 1.0) {
    return sigma * (1.0 - 1.5 * q * q * (1.0 - 0.5 * q));
  } else if (q < 2.0) {
    const double two_minus_q = 2.0 - q;
    return sigma * 0.25 * two_minus_q * two_minus_q * two_minus_q;
  }
  return 0.0;
}

// Kernel-weighted density deposition: for each particle, distribute its mass
// over the cells within 2h using the cubic-spline kernel (the "centroid"-
// style mapping of the reference, evaluated at cell centers, normalized per
// particle so total mass is conserved exactly).
void deposit_sph_kernel(const double *positions, const double *masses,
                        const double *smoothing_lengths, int64_t n_part,
                        const double *anchor, const double *sides,
                        const int64_t *dims,
                        double *grid /* pre-zeroed */) {
  const double dx = sides[0] / dims[0];
  const double dy = sides[1] / dims[1];
  const double dz = sides[2] / dims[2];
  const double cell_volume = dx * dy * dz;
  for (int64_t i = 0; i < n_part; ++i) {
    const double px = positions[3 * i];
    const double py = positions[3 * i + 1];
    const double pz = positions[3 * i + 2];
    const double h = smoothing_lengths[i];
    const double support = 2.0 * h;
    int64_t ix0 = (int64_t)std::floor((px - support - anchor[0]) / dx);
    int64_t ix1 = (int64_t)std::floor((px + support - anchor[0]) / dx);
    int64_t iy0 = (int64_t)std::floor((py - support - anchor[1]) / dy);
    int64_t iy1 = (int64_t)std::floor((py + support - anchor[1]) / dy);
    int64_t iz0 = (int64_t)std::floor((pz - support - anchor[2]) / dz);
    int64_t iz1 = (int64_t)std::floor((pz + support - anchor[2]) / dz);
    ix0 = std::max<int64_t>(ix0, 0);
    iy0 = std::max<int64_t>(iy0, 0);
    iz0 = std::max<int64_t>(iz0, 0);
    ix1 = std::min(ix1, dims[0] - 1);
    iy1 = std::min(iy1, dims[1] - 1);
    iz1 = std::min(iz1, dims[2] - 1);
    // first pass: kernel weights + normalization
    double wsum = 0.0;
    for (int64_t ix = ix0; ix <= ix1; ++ix) {
      const double cx = anchor[0] + (ix + 0.5) * dx - px;
      for (int64_t iy = iy0; iy <= iy1; ++iy) {
        const double cy = anchor[1] + (iy + 0.5) * dy - py;
        for (int64_t iz = iz0; iz <= iz1; ++iz) {
          const double cz = anchor[2] + (iz + 0.5) * dz - pz;
          const double r = std::sqrt(cx * cx + cy * cy + cz * cz);
          wsum += cubic_spline(r / h, h);
        }
      }
    }
    if (wsum <= 0.0) {
      // support smaller than a cell: nearest-cell fallback
      int64_t ix = (int64_t)((px - anchor[0]) / dx);
      int64_t iy = (int64_t)((py - anchor[1]) / dy);
      int64_t iz = (int64_t)((pz - anchor[2]) / dz);
      ix = std::max<int64_t>(0, std::min(ix, dims[0] - 1));
      iy = std::max<int64_t>(0, std::min(iy, dims[1] - 1));
      iz = std::max<int64_t>(0, std::min(iz, dims[2] - 1));
      grid[(ix * dims[1] + iy) * dims[2] + iz] += masses[i] / cell_volume;
      continue;
    }
    const double m_over_wsum_v = masses[i] / (wsum * cell_volume);
    for (int64_t ix = ix0; ix <= ix1; ++ix) {
      const double cx = anchor[0] + (ix + 0.5) * dx - px;
      for (int64_t iy = iy0; iy <= iy1; ++iy) {
        const double cy = anchor[1] + (iy + 0.5) * dy - py;
        for (int64_t iz = iz0; iz <= iz1; ++iz) {
          const double cz = anchor[2] + (iz + 0.5) * dz - pz;
          const double r = std::sqrt(cx * cx + cy * cy + cz * cz);
          const double w = cubic_spline(r / h, h);
          if (w > 0.0) {
            grid[(ix * dims[1] + iy) * dims[2] + iz] += w * m_over_wsum_v;
          }
        }
      }
    }
  }
}

// Inverse mapping: nearest-cell sampling of a grid field at positions.
void sample_grid(const double *grid, const int64_t *dims,
                 const double *anchor, const double *sides,
                 const double *positions, int64_t n_part, double *out) {
  const double inv_dx = dims[0] / sides[0];
  const double inv_dy = dims[1] / sides[1];
  const double inv_dz = dims[2] / sides[2];
  for (int64_t i = 0; i < n_part; ++i) {
    int64_t ix = (int64_t)((positions[3 * i] - anchor[0]) * inv_dx);
    int64_t iy = (int64_t)((positions[3 * i + 1] - anchor[1]) * inv_dy);
    int64_t iz = (int64_t)((positions[3 * i + 2] - anchor[2]) * inv_dz);
    ix = std::max<int64_t>(0, std::min(ix, dims[0] - 1));
    iy = std::max<int64_t>(0, std::min(iy, dims[1] - 1));
    iz = std::max<int64_t>(0, std::min(iz, dims[2] - 1));
    out[i] = grid[(ix * dims[1] + iy) * dims[2] + iz];
  }
}

}  // extern "C"
