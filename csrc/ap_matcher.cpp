// Native greedy detection<->GT matcher for AP evaluation (component C19).
//
// The pycocotools role in the reference stack (its only C extension used by
// this pipeline) is fast COCO evaluation; this is the TPU-framework
// equivalent: the per-class COCOeval-protocol greedy matching loop —
// O(n_det * gt_per_image * n_thresholds), the host-side eval hot spot at
// COCO scale (5k images x 80 classes x 10 IoU thresholds) — in C++, exposed
// through a plain C ABI for ctypes (no pybind11 in this environment).
//
// Build: g++ -O3 -shared -fPIC -o libap_matcher.so ap_matcher.cpp
//
// Semantics are identical to eval/ap.py::_match_class (greedy, score order,
// per-threshold independent claiming, crowd IoU = intersection/det-area,
// non-ignored GTs scanned first, best-IoU wins with ties to the later GT,
// ignored detections excluded from TP and FP) and are cross-checked in
// tests/test_native_ap.py.

#include <cstdint>
#include <vector>
#include <algorithm>
#include <unordered_map>

namespace {

// IoU of det a against gt b; crowd gts use intersection / area(a)
// (pycocotools convention: a crowd region covers the detection).
inline float iou(const float* a, const float* b, bool b_crowd) {
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
  const float uni = b_crowd ? area_a : area_a + area_b - inter;
  return uni > 1e-9f ? inter / uni : 0.0f;
}

}  // namespace

extern "C" {

// COCOeval-protocol matcher. det_* are pre-sorted by descending score (and
// pre-truncated to maxDet per image by the caller). det_oob marks detections
// outside the area range (ignored if unmatched). gt_crowd marks crowd GTs
// (never exhausted by a match); gt_ignore marks GTs excluded from scoring
// (crowd and/or out-of-area — matching one ignores the detection).
// Outputs: tp_out and ig_out, (n_thr, n_det) row-major uint8.
void sbd_match_class_full(const float* det_boxes, const int32_t* det_img_ids,
                          const uint8_t* det_oob, int32_t n_det,
                          const float* gt_boxes, const int32_t* gt_img_ids,
                          const uint8_t* gt_crowd, const uint8_t* gt_ignore,
                          int32_t n_gt, const float* thresholds,
                          int32_t n_thr, uint8_t* tp_out, uint8_t* ig_out) {
  // group GT indices by image, non-ignored first (stable) — the scan order
  std::unordered_map<int32_t, std::vector<int32_t>> gt_by_img;
  gt_by_img.reserve(64);
  for (int32_t g = 0; g < n_gt; ++g) gt_by_img[gt_img_ids[g]].push_back(g);
  for (auto& [img, v] : gt_by_img) {
    std::stable_sort(v.begin(), v.end(), [&](int32_t a, int32_t b) {
      return gt_ignore[a] < gt_ignore[b];
    });
  }

  std::vector<uint8_t> claimed(static_cast<size_t>(n_thr) * n_gt, 0);
  std::vector<float> ious;  // per-det IoU against its image's GTs (scan order)

  for (int32_t d = 0; d < n_det; ++d) {
    auto it = gt_by_img.find(det_img_ids[d]);
    if (it == gt_by_img.end()) {
      if (det_oob[d]) {
        for (int32_t t = 0; t < n_thr; ++t)
          ig_out[static_cast<size_t>(t) * n_det + d] = 1;
      }
      continue;
    }
    const auto& order = it->second;
    ious.resize(order.size());
    for (size_t k = 0; k < order.size(); ++k) {
      const int32_t g = order[k];
      ious[k] = iou(det_boxes + 4 * d, gt_boxes + 4 * g, gt_crowd[g] != 0);
    }
    for (int32_t t = 0; t < n_thr; ++t) {
      float best_iou = thresholds[t];
      int32_t best = -1;  // index into `order`
      for (size_t k = 0; k < order.size(); ++k) {
        const int32_t g = order[k];
        if (claimed[static_cast<size_t>(t) * n_gt + g] && !gt_crowd[g])
          continue;
        if (best > -1 && !gt_ignore[order[best]] && gt_ignore[g])
          break;  // holding a real match; only ignored GTs remain
        if (ious[k] < best_iou) continue;
        best_iou = ious[k];
        best = static_cast<int32_t>(k);
      }
      if (best >= 0) {
        const int32_t g = order[best];
        claimed[static_cast<size_t>(t) * n_gt + g] = 1;
        if (gt_ignore[g])
          ig_out[static_cast<size_t>(t) * n_det + d] = 1;
        else
          tp_out[static_cast<size_t>(t) * n_det + d] = 1;
      } else if (det_oob[d]) {
        ig_out[static_cast<size_t>(t) * n_det + d] = 1;
      }
    }
  }
}

}  // extern "C"
