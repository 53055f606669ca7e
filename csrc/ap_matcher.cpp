// Native greedy detection<->GT matcher for AP evaluation (component C19).
//
// The pycocotools role in the reference stack (its only C extension used by
// this pipeline) is fast COCO evaluation; this is the TPU-framework
// equivalent: the per-class greedy matching loop — O(n_det * gt_per_image *
// n_thresholds), the host-side eval hot spot at COCO scale (5k images x 80
// classes x 10 IoU thresholds) — in C++, exposed through a plain C ABI for
// ctypes (no pybind11 in this environment).
//
// Build: g++ -O3 -shared -fPIC -o libap_matcher.so ap_matcher.cpp
//
// Semantics are identical to eval/ap.py::_match_class (greedy, score order,
// per-threshold independent claiming, best-IoU-first GT preference) and are
// cross-checked in tests/test_native_ap.py.

#include <cstdint>
#include <vector>
#include <algorithm>
#include <unordered_map>

namespace {

inline float iou(const float* a, const float* b) {
  const float x0 = std::max(a[0], b[0]);
  const float y0 = std::max(a[1], b[1]);
  const float x1 = std::min(a[2], b[2]);
  const float y1 = std::min(a[3], b[3]);
  const float iw = std::max(0.0f, x1 - x0);
  const float ih = std::max(0.0f, y1 - y0);
  const float inter = iw * ih;
  const float area_a =
      std::max(0.0f, a[2] - a[0]) * std::max(0.0f, a[3] - a[1]);
  const float area_b =
      std::max(0.0f, b[2] - b[0]) * std::max(0.0f, b[3] - b[1]);
  const float uni = area_a + area_b - inter;
  return uni > 1e-9f ? inter / uni : 0.0f;
}

}  // namespace

extern "C" {

// det_* are pre-sorted by descending score. tp_out is (n_thr, n_det) row-major
// uint8. gt arrays are grouped arbitrarily; image ids are matched exactly.
void sbd_match_class(const float* det_boxes, const int32_t* det_img_ids,
                     int32_t n_det, const float* gt_boxes,
                     const int32_t* gt_img_ids, int32_t n_gt,
                     const float* thresholds, int32_t n_thr,
                     uint8_t* tp_out) {
  // group GT indices by image
  std::unordered_map<int32_t, std::vector<int32_t>> gt_by_img;
  gt_by_img.reserve(64);
  for (int32_t g = 0; g < n_gt; ++g) gt_by_img[gt_img_ids[g]].push_back(g);

  std::vector<uint8_t> claimed(static_cast<size_t>(n_thr) * n_gt, 0);
  std::vector<std::pair<float, int32_t>> cand;  // (iou, gt_idx), desc

  for (int32_t d = 0; d < n_det; ++d) {
    auto it = gt_by_img.find(det_img_ids[d]);
    if (it == gt_by_img.end()) continue;
    const auto& gts = it->second;
    cand.clear();
    for (int32_t g : gts) {
      const float v = iou(det_boxes + 4 * d, gt_boxes + 4 * g);
      if (v > 0.0f) cand.emplace_back(v, g);
    }
    // stable: ties keep GT index order, matching the numpy argsort fallback
    std::stable_sort(cand.begin(), cand.end(),
                     [](const auto& a, const auto& b) { return a.first > b.first; });
    for (int32_t t = 0; t < n_thr; ++t) {
      const float thr = thresholds[t];
      for (const auto& [v, g] : cand) {
        if (v < thr) break;  // sorted descending: nothing further matches
        uint8_t& cl = claimed[static_cast<size_t>(t) * n_gt + g];
        if (!cl) {
          cl = 1;
          tp_out[static_cast<size_t>(t) * n_det + d] = 1;
          break;
        }
      }
    }
  }
}

}  // extern "C"
