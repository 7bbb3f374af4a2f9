// lrs_native — host-side native kernels for the lrs_pnp_dip_tpu framework.
//
// The reference's native surface is MEX binaries (BM3D) plus the Cython
// NLM inside scikit-image (SURVEY §2.4).  This library provides the
// framework's own native host path:
//   * pairwise fast-NLM (2-D, float32) with the exact semantics documented
//     in lrs_pnp_dip_tpu/ops/nlm.py — used as an independent test oracle
//     and as a CPU fallback denoiser via ctypes;
//   * batched column-NLM (the ISTA hot path shape) with OpenMP over blocks
//     — the host-side analogue of the MATLAB twin's parfor
//     (main_LRS_PnP.m:100);
//   * im2col block extraction / sum-scatter with the reference's
//     stride-and-append rule, for host-side data preprocessing at scale.
//
// Build: make -C native   (produces liblrs_native.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// ---------------------------------------------------------------- helpers
static inline int reflect_index(int i, int n) {
  // numpy 'reflect' (no edge repeat) for one bounce; n == 1 degenerates to 0
  if (n == 1) return 0;
  if (i < 0) i = -i;
  if (i >= n) i = 2 * n - 2 - i;
  return i;
}

// ------------------------------------------------------------------- NLM
// Pairwise fast-NLM of a 2-D image, matching ops/nlm.py::nlm2d:
// reflect pad by offset+d+1, half-space shift loop with alpha=0.5 on the
// t_col==0 axis, symmetric pair accumulation, h2s2 = h^2 * s^2.
void nlm2d(const float* image, int n_row, int n_col, float h, int s, int d,
           float* out) {
  const int offset = s / 2;
  const int pad = offset + d + 1;
  const int pr = n_row + 2 * pad, pc = n_col + 2 * pad;
  std::vector<double> P((size_t)pr * pc);
  for (int r = 0; r < pr; ++r) {
    const int sr = reflect_index(r - pad, n_row);
    for (int c = 0; c < pc; ++c) {
      const int sc = reflect_index(c - pad, n_col);
      P[(size_t)r * pc + c] = image[(size_t)sr * n_col + sc];
    }
  }
  const double h2s2 = std::max((double)h * h * s * s, 1e-30);
  std::vector<double> num((size_t)pr * pc, 0.0), den((size_t)pr * pc, 0.0);

  for (int t_row = -d; t_row <= d; ++t_row) {
    for (int t_col = 0; t_col <= d; ++t_col) {
      const double alpha = (t_col == 0 && t_row != 0) ? 0.5 : 1.0;
      const int r_lo = std::max(offset, offset - t_row);
      const int r_hi = pr - std::max(offset, offset + t_row);
      for (int r = r_lo; r < r_hi; ++r) {
        for (int c = offset; c < pc - offset - t_col; ++c) {
          double dist = 0.0;
          for (int u = -offset; u <= offset; ++u) {
            const double* row_a = &P[(size_t)(r + u) * pc];
            const double* row_b = &P[(size_t)(r + t_row + u) * pc];
            for (int v = -offset; v <= offset; ++v) {
              const double diff = row_a[c + v] - row_b[c + t_col + v];
              dist += diff * diff;
            }
          }
          const double w = alpha * std::exp(-std::max(dist, 0.0) / h2s2);
          const double a = P[(size_t)r * pc + c];
          const double b = P[(size_t)(r + t_row) * pc + c + t_col];
          num[(size_t)r * pc + c] += w * b;
          den[(size_t)r * pc + c] += w;
          num[(size_t)(r + t_row) * pc + c + t_col] += w * a;
          den[(size_t)(r + t_row) * pc + c + t_col] += w;
        }
      }
    }
  }
  for (int r = 0; r < n_row; ++r)
    for (int c = 0; c < n_col; ++c) {
      const size_t i = (size_t)(r + pad) * pc + (c + pad);
      out[(size_t)r * n_col + c] = (float)(num[i] / std::max(den[i], 1e-30));
    }
}

// Batched (K,1)-column NLM: nB vectors of length K, h per block.
// OpenMP-parallel over blocks.
void nlm_column_batch(const float* vecs, int n_blocks, int k,
                      const float* h, int s, int d, float* out) {
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (int b = 0; b < n_blocks; ++b) {
    // a (K,1) image: reuse nlm2d with n_col = 1
    nlm2d(vecs + (size_t)b * k, k, 1, h[b], s, d, out + (size_t)b * k);
  }
}

// ---------------------------------------------------------------- im2col
// Block-start offsets with the reference append rule; returns count.
static int block_starts(int extent, int bb, int stride, std::vector<int>* out) {
  out->clear();
  const int last = extent - bb;
  for (int x = 0; x <= last; x += stride) out->push_back(x);
  if (extent % bb != 0 && out->back() != last) out->push_back(last);
  return (int)out->size();
}

int n_blocks(int n_pix, int n_band, int bb, int stride) {
  std::vector<int> xs, ys;
  block_starts(n_pix, bb, stride, &xs);
  block_starts(n_band, bb, stride, &ys);
  return (int)(xs.size() * ys.size());
}

// Extract blocks: Y (n_pix, n_band) row-major -> blocks (nB, bb*bb) with
// band-major entries, reference (Fortran) block ordering.
void extract_blocks(const float* Y, int n_pix, int n_band, int bb, int stride,
                    float* blocks) {
  std::vector<int> xs, ys;
  block_starts(n_pix, bb, stride, &xs);
  block_starts(n_band, bb, stride, &ys);
  const int nx = (int)xs.size();
  const int nb_total = nx * (int)ys.size();
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (int j = 0; j < nb_total; ++j) {
    const int x = xs[j % nx];
    const int y = ys[j / nx];
    float* dst = blocks + (size_t)j * bb * bb;
    for (int a = 0; a < bb; ++a)        // band_local
      for (int p = 0; p < bb; ++p)      // pixel_local
        dst[a * bb + p] = Y[(size_t)(x + p) * n_band + (y + a)];
  }
}

// Sum-scatter adjoint; also accumulates per-entry coverage counts.
void scatter_blocks(const float* blocks, int n_pix, int n_band, int bb,
                    int stride, float* out, float* weight) {
  std::vector<int> xs, ys;
  block_starts(n_pix, bb, stride, &xs);
  block_starts(n_band, bb, stride, &ys);
  const int nx = (int)xs.size();
  const int nb_total = nx * (int)ys.size();
  std::memset(out, 0, sizeof(float) * (size_t)n_pix * n_band);
  std::memset(weight, 0, sizeof(float) * (size_t)n_pix * n_band);
  for (int j = 0; j < nb_total; ++j) {
    const int x = xs[j % nx];
    const int y = ys[j / nx];
    const float* src = blocks + (size_t)j * bb * bb;
    for (int a = 0; a < bb; ++a)
      for (int p = 0; p < bb; ++p) {
        out[(size_t)(x + p) * n_band + (y + a)] += src[a * bb + p];
        weight[(size_t)(x + p) * n_band + (y + a)] += 1.0f;
      }
  }
}

// ------------------------------------------------------------ tile loader
// Extract spatial tiles from a big (H, W, B) float32 cube (row-major).
// origins: n_tiles pairs (h0, w0); each tile is (th, tw, B), clamped
// reads are the caller's responsibility (origins must satisfy
// h0+th <= H, w0+tw <= W).  OpenMP-parallel over tiles — the host-side
// feeder for the large tiled-cube workload.
void extract_tiles(const float* cube, int H, int W, int B,
                   const int* origins, int n_tiles, int th, int tw,
                   float* out) {
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (int t = 0; t < n_tiles; ++t) {
    const int h0 = origins[2 * t];
    const int w0 = origins[2 * t + 1];
    float* dst = out + (size_t)t * th * tw * B;
    for (int i = 0; i < th; ++i) {
      const float* src_row = cube + ((size_t)(h0 + i) * W + w0) * B;
      std::memcpy(dst + (size_t)i * tw * B, src_row, sizeof(float) * (size_t)tw * B);
    }
  }
}

}  // extern "C"
