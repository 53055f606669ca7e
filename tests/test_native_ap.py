"""Native C++ AP matcher vs the pure-Python reference path (must be identical),
including the COCOeval crowd-ignore and area-stratification semantics."""

import numpy as np
import pytest

from shape_based_object_detection_tpu.eval.ap import (
    DetectionRecord, GroundTruthRecord, coco_map,
)
from shape_based_object_detection_tpu.utils import native


def _random_records(rng, n_images=6, n_classes=3, with_crowd=False):
    dets, gts = [], []
    for img in range(n_images):
        g = int(rng.integers(1, 5))
        cxcy = rng.uniform(0.2, 0.8, (g, 2))
        wh = rng.uniform(0.1, 0.3, (g, 2))
        gt_boxes = np.concatenate([cxcy - wh / 2, cxcy + wh / 2], 1).astype(np.float32)
        gt_labels = rng.integers(1, n_classes + 1, g).astype(np.int64)
        crowd = (rng.uniform(size=g) < 0.3) if with_crowd else None
        gts.append(GroundTruthRecord(img, gt_boxes, gt_labels, crowd))

        d = int(rng.integers(2, 8))
        base = gt_boxes[rng.integers(0, g, d)]
        noise = rng.normal(0, 0.03, (d, 4)).astype(np.float32)
        det_boxes = base + noise
        dets.append(DetectionRecord(
            img, det_boxes, rng.uniform(0.1, 1.0, d).astype(np.float32),
            rng.integers(1, n_classes + 1, d).astype(np.int64)))
    return dets, gts


@pytest.mark.parametrize("with_crowd", [False, True])
@pytest.mark.parametrize("area_scale", [1.0, 512.0])
def test_native_matches_python(rng, monkeypatch, with_crowd, area_scale):
    if native.load_ap_matcher() is None:
        pytest.skip("g++ unavailable")
    dets, gts = _random_records(rng, with_crowd=with_crowd)
    m_native = coco_map(dets, gts, area_scale=area_scale)

    # disable the native fast path -> pure-Python reference loop
    monkeypatch.setattr(native, "match_class_strata_native",
                        lambda *a, **k: None)
    m_python = coco_map(dets, gts, area_scale=area_scale)

    for key in ("mAP", "AP50", "AP75", "APsmall", "APmedium", "APlarge",
                "AR1", "AR10", "AR100"):
        np.testing.assert_allclose(m_native[key], m_python[key], atol=1e-9,
                                   err_msg=key)
    for c in m_native["per_class"]:
        np.testing.assert_allclose(
            m_native["per_class"][c], m_python["per_class"][c], atol=1e-9)


def test_native_library_builds():
    lib = native.load_ap_matcher()
    if lib is None:
        pytest.skip("g++ unavailable")
    # direct call on a trivial case: one det == one gt, no crowd/area flags
    out = native.match_class_native(
        np.asarray([[0, 0, 1, 1]], np.float32), np.asarray([0], np.int32),
        np.zeros(1, np.uint8),
        np.asarray([[0, 0, 1, 1]], np.float32), np.asarray([0], np.int32),
        np.zeros(1, np.uint8), np.zeros(1, np.uint8),
        np.asarray([0.5, 0.95], np.float32),
    )
    assert out is not None
    tp, ig = out
    np.testing.assert_array_equal(tp, [[1], [1]])
    np.testing.assert_array_equal(ig, [[0], [0]])


def test_native_crowd_ignore_direct():
    """A det over a crowd GT is ignored, not FP; crowd IoU = inter/det-area."""
    if native.load_ap_matcher() is None:
        pytest.skip("g++ unavailable")
    # det fully inside a big crowd region: plain IoU would be small (0.25),
    # crowd IoU is 1.0
    out = native.match_class_native(
        np.asarray([[0, 0, 0.5, 0.5]], np.float32), np.asarray([0], np.int32),
        np.zeros(1, np.uint8),
        np.asarray([[0, 0, 1, 1]], np.float32), np.asarray([0], np.int32),
        np.ones(1, np.uint8), np.ones(1, np.uint8),
        np.asarray([0.5], np.float32),
    )
    tp, ig = out
    np.testing.assert_array_equal(tp, [[0]])
    np.testing.assert_array_equal(ig, [[1]])


def test_strata_call_equals_per_range_calls(rng):
    """The single multi-stratum native call must reproduce the per-range
    single calls exactly (same protocol, amortized IoUs/marshaling)."""
    if native.load_ap_matcher() is None:
        pytest.skip("g++ unavailable")
    n, m = 20, 12
    det_boxes = rng.uniform(0, 1, (n, 4)).astype(np.float32)
    det_boxes[:, 2:] += det_boxes[:, :2]
    det_imgs = rng.integers(0, 3, n).astype(np.int32)
    # score-sorted input is the contract; boxes are already in random order
    gt_boxes = rng.uniform(0, 1, (m, 4)).astype(np.float32)
    gt_boxes[:, 2:] += gt_boxes[:, :2]
    gt_imgs = rng.integers(0, 3, m).astype(np.int32)
    gt_crowd = (rng.uniform(size=m) < 0.25).astype(np.uint8)
    thr = np.arange(0.5, 1.0, 0.05).astype(np.float32)

    k = 3
    det_oob = (rng.uniform(size=(k, n)) < 0.2).astype(np.uint8)
    gt_ignore = ((rng.uniform(size=(k, m)) < 0.3) | gt_crowd[None].astype(
        bool)).astype(np.uint8)

    tp_s, ig_s = native.match_class_strata_native(
        det_boxes, det_imgs, det_oob, gt_boxes, gt_imgs, gt_crowd,
        gt_ignore, thr)
    for s in range(k):
        tp_1, ig_1 = native.match_class_native(
            det_boxes, det_imgs, det_oob[s], gt_boxes, gt_imgs, gt_crowd,
            gt_ignore[s], thr)
        np.testing.assert_array_equal(tp_s[s], tp_1, err_msg=f"stratum {s}")
        np.testing.assert_array_equal(ig_s[s], ig_1, err_msg=f"stratum {s}")
