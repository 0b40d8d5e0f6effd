// Native host kernels for iSegProbe-TPU.
//
// Implements the framework's two host-side native components (SURVEY.md §2.11):
//
//  1. edt_l2sq / edt_l2 — exact squared / plain Euclidean distance transform of
//     a binary mask via the Felzenszwalb–Huttenlocher two-pass algorithm
//     (same output as cv2.distanceTransform(mask, DIST_L2, maskSize=0), the op
//     the reference clicker relies on — reference: core/inference/clicker.py:72-73).
//     Distance is from each NON-ZERO pixel to the nearest ZERO pixel; zero at
//     zero pixels; "infinite" (1e20 squared) if the mask has no zero pixel.
//
//  2. click_dist_maps — per-click min normalized squared-distance maps over the
//     pixel grid, two layers (positive clicks = first half of the points array,
//     negative = second half). Computes the same quantity as the reference's
//     Cython BFS kernel (reference: core/utils/cython/_get_dist_maps.pyx:18-64):
//     on an unobstructed 4-connected grid the BFS relaxation converges to the
//     exact per-source minimum, so a direct evaluation is behaviorally
//     identical and simpler.
//
// Build: `make` in this directory produces libisegprobe_native.so, loaded via
// ctypes (isegprobe_tpu/ops/native_lib.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <limits>
#include <vector>

namespace {

constexpr float kInf = 1e20f;

// 1-D squared-distance lower envelope (Felzenszwalb & Huttenlocher 2004).
// f: input costs (length n), d: output min_j (f[j] + (i-j)^2).
// Only finite parabolas (f[q] < kInf) are inserted, so the envelope
// bookkeeping never has to reason about infinities.
void dt1d(const float* f, int n, float* d, int* v, double* z) {
  constexpr double kNegInfZ = -1e30;
  constexpr double kPosInfZ = 1e30;
  int k = -1;
  for (int q = 0; q < n; ++q) {
    if (f[q] >= kInf) continue;
    if (k < 0) {
      k = 0;
      v[0] = q;
      z[0] = kNegInfZ;
      z[1] = kPosInfZ;
      continue;
    }
    double s = ((f[q] + (double)q * q) - (f[v[k]] + (double)v[k] * v[k])) /
               (2.0 * (q - v[k]));
    while (s <= z[k]) {
      --k;  // k stays >= 0: z[0] = -inf and s is finite
      s = ((f[q] + (double)q * q) - (f[v[k]] + (double)v[k] * v[k])) /
          (2.0 * (q - v[k]));
    }
    ++k;
    v[k] = q;
    z[k] = s;
    z[k + 1] = kPosInfZ;
  }

  if (k < 0) {  // no finite source anywhere in this line
    for (int q = 0; q < n; ++q) d[q] = kInf;
    return;
  }
  int kk = 0;
  for (int q = 0; q < n; ++q) {
    while (z[kk + 1] < q) ++kk;
    float dq = (float)(q - v[kk]);
    d[q] = dq * dq + f[v[kk]];
  }
}

}  // namespace

extern "C" {

// Exact squared L2 EDT. mask: h*w uint8 (row-major), out: h*w float32.
void edt_l2sq(const uint8_t* mask, int h, int w, float* out) {
  std::vector<float> col(h > w ? h : w);
  std::vector<float> res(h > w ? h : w);
  std::vector<int> v(h > w ? h : w);
  std::vector<double> z((h > w ? h : w) + 1);

  // Pass 1: columns. out[i*w+j] = min squared vertical distance to a zero pixel.
  for (int j = 0; j < w; ++j) {
    for (int i = 0; i < h; ++i) col[i] = mask[i * w + j] ? kInf : 0.0f;
    dt1d(col.data(), h, res.data(), v.data(), z.data());
    for (int i = 0; i < h; ++i) out[i * w + j] = res[i];
  }
  // Pass 2: rows, lower envelope over the column results.
  for (int i = 0; i < h; ++i) {
    float* row = out + (size_t)i * w;
    for (int j = 0; j < w; ++j) col[j] = row[j];
    dt1d(col.data(), w, res.data(), v.data(), z.data());
    for (int j = 0; j < w; ++j) row[j] = res[j];
  }
}

// Exact L2 EDT (sqrt of the above).
void edt_l2(const uint8_t* mask, int h, int w, float* out) {
  edt_l2sq(mask, h, w, out);
  const size_t n = (size_t)h * w;
  for (size_t i = 0; i < n; ++i) {
    out[i] = out[i] >= kInf ? kInf : std::sqrt(out[i]);
  }
}

// Per-click min normalized squared-distance maps.
// points: n_points rows of (y, x, index) float32; first n_points/2 positive.
// out: 2*h*w float32, initialized to 1e6 where no valid click exists.
void click_dist_maps(const float* points, int n_points, int h, int w,
                     float norm_delimiter, float* out) {
  const size_t layer = (size_t)h * w;
  std::fill(out, out + 2 * layer, 1e6f);
  const float inv = 1.0f / norm_delimiter;

  for (int p = 0; p < n_points; ++p) {
    const float py = points[p * 3 + 0];
    const float px = points[p * 3 + 1];
    // invalid click iff max(y, x) < 0 — the single convention shared with
    // dist_maps.py and the numpy fallback
    if (std::max(py, px) < 0.0f) continue;
    const int li = (p >= n_points / 2) ? 1 : 0;
    // The reference BFS rounds click coordinates to the grid
    // (_get_dist_maps.pyx:31: round(points[i, 0])).
    const float cy = std::nearbyint(py);
    const float cx = std::nearbyint(px);
    float* dst = out + li * layer;
    for (int i = 0; i < h; ++i) {
      const float dy = (i - cy) * inv;
      const float dy2 = dy * dy;
      float* row = dst + (size_t)i * w;
      for (int j = 0; j < w; ++j) {
        const float dx = (j - cx) * inv;
        const float d2 = dy2 + dx * dx;
        if (d2 < row[j]) row[j] = d2;
      }
    }
  }
}

}  // extern "C"
