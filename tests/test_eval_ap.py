"""First-party AP evaluation tests (component C19): hand-computed cases."""

import numpy as np
import pytest

from shape_based_object_detection_tpu.eval.ap import (
    DetectionRecord, GroundTruthRecord, coco_map, voc_map,
)


def _box(x0, y0, x1, y1):
    return np.asarray([x0, y0, x1, y1], np.float32)


def test_perfect_detections_ap1():
    gt = [GroundTruthRecord(0, np.stack([_box(0, 0, 10, 10), _box(20, 20, 30, 30)]),
                            np.asarray([1, 2]))]
    det = [DetectionRecord(0, np.stack([_box(0, 0, 10, 10), _box(20, 20, 30, 30)]),
                           np.asarray([0.9, 0.8]), np.asarray([1, 2]))]
    m = coco_map(det, gt)
    assert m["mAP"] == 1.0 and m["AP50"] == 1.0 and m["AP75"] == 1.0
    v = voc_map(det, gt)
    assert v["mAP"] == 1.0


def test_missed_gt_halves_recall():
    # 2 GT, 1 perfect detection -> VOC 11-point AP ~ 6/11 (recall plateau 0.5)
    gt = [GroundTruthRecord(0, np.stack([_box(0, 0, 10, 10), _box(20, 20, 30, 30)]),
                            np.asarray([1, 1]))]
    det = [DetectionRecord(0, _box(0, 0, 10, 10)[None], np.asarray([0.9]),
                           np.asarray([1]))]
    v = voc_map(det, gt)
    np.testing.assert_allclose(v["mAP"], 6.0 / 11.0, atol=1e-6)


def test_false_positive_lowers_precision():
    gt = [GroundTruthRecord(0, _box(0, 0, 10, 10)[None], np.asarray([1]))]
    det = [DetectionRecord(
        0,
        np.stack([_box(50, 50, 60, 60), _box(0, 0, 10, 10)]),
        np.asarray([0.95, 0.9]),  # the FP outranks the TP
        np.asarray([1, 1]),
    )]
    m = coco_map(det, gt)
    # precision at full recall is 0.5; 101-pt AP = 0.5 (max precision 0.5 everywhere)
    np.testing.assert_allclose(m["AP50"], 0.5, atol=0.01)


def test_duplicate_detection_is_fp():
    gt = [GroundTruthRecord(0, _box(0, 0, 10, 10)[None], np.asarray([1]))]
    det = [DetectionRecord(
        0, np.stack([_box(0, 0, 10, 10), _box(0.5, 0, 10, 10)]),
        np.asarray([0.9, 0.8]), np.asarray([1, 1]),
    )]
    v = voc_map(det, gt)
    assert v["mAP"] == 1.0  # duplicate FP after full recall doesn't hurt 11pt AP
    m = coco_map(det, gt)
    assert m["AP50"] == 1.0


def test_localization_quality_affects_coco_not_voc():
    # IoU ~0.6 box: counts at 0.5/0.55/0.6 but not above
    gt = [GroundTruthRecord(0, _box(0, 0, 10, 10)[None], np.asarray([1]))]
    det = [DetectionRecord(0, _box(0, 0, 10, 6.2)[None], np.asarray([0.9]),
                           np.asarray([1]))]
    v = voc_map(det, gt)
    assert v["mAP"] == 1.0
    m = coco_map(det, gt)
    assert 0.0 < m["mAP"] < 0.5
    assert m["AP50"] == 1.0 and m["AP75"] == 0.0


def test_class_confusion_is_fp():
    gt = [GroundTruthRecord(0, _box(0, 0, 10, 10)[None], np.asarray([1]))]
    det = [DetectionRecord(0, _box(0, 0, 10, 10)[None], np.asarray([0.9]),
                           np.asarray([2]))]
    v = voc_map(det, gt)
    assert v["mAP"] == 0.0


def test_evaluator_accumulation():
    from shape_based_object_detection_tpu.eval import Evaluator
    from shape_based_object_detection_tpu.ops.nms import Detections

    ev = Evaluator()
    det = Detections(
        boxes=np.asarray([[[0.0, 0.0, 0.5, 0.5], [0, 0, 0, 0]]]),
        scores=np.asarray([[0.9, 0.0]]),
        labels=np.asarray([[1, 0]]),
        valid=np.asarray([[True, False]]),
    )
    gt_boxes = np.asarray([[[0.0, 0.0, 0.5, 0.5], [0, 0, 0, 0]]])
    gt_labels = np.asarray([[1, 0]])
    gt_valid = np.asarray([[True, False]])
    ev.add_batch(det, gt_boxes, gt_labels, gt_valid)
    assert ev.coco()["mAP"] == 1.0
    assert ev.voc()["mAP"] == 1.0


# ---- COCOeval protocol: crowd-ignore, area strata, AR (VERDICT r1 item 5) --


def test_crowd_match_is_ignored_not_fp():
    """A high-scoring det inside a crowd region must not poison precision."""
    gt = [GroundTruthRecord(
        0,
        np.stack([_box(0, 0, 10, 10), _box(50, 50, 100, 100)]),
        np.asarray([1, 1]),
        crowd=np.asarray([False, True]),
    )]
    det = [DetectionRecord(
        0,
        # det 1 sits fully inside the crowd: plain IoU 0.04, crowd IoU 1.0
        np.stack([_box(60, 60, 70, 70), _box(0, 0, 10, 10)]),
        np.asarray([0.95, 0.9]),
        np.asarray([1, 1]),
    )]
    m = coco_map(det, gt)
    # without crowd handling the 0.95 det would be a rank-1 FP -> AP50 0.5
    assert m["AP50"] == 1.0 and m["mAP"] == 1.0


def test_crowd_not_counted_in_recall_denominator():
    gt = [GroundTruthRecord(
        0, np.stack([_box(0, 0, 10, 10), _box(50, 50, 100, 100)]),
        np.asarray([1, 1]), crowd=np.asarray([False, True]))]
    det = [DetectionRecord(0, _box(0, 0, 10, 10)[None], np.asarray([0.9]),
                           np.asarray([1]))]
    m = coco_map(det, gt)
    assert m["mAP"] == 1.0  # the crowd GT is not a missed GT


def test_real_gt_preferred_over_crowd():
    """When both a real GT and a crowd overlap a det, the real GT wins."""
    gt = [GroundTruthRecord(
        0, np.stack([_box(0, 0, 10, 10), _box(0, 0, 100, 100)]),
        np.asarray([1, 1]), crowd=np.asarray([False, True]))]
    det = [DetectionRecord(0, _box(0, 0, 10, 10)[None], np.asarray([0.9]),
                           np.asarray([1]))]
    m = coco_map(det, gt)
    assert m["mAP"] == 1.0  # counted as TP on the real GT, recall 1/1


def test_area_stratified_ap():
    # one small GT (10x10 = 100 px^2) and one large GT (200x200 = 40000 px^2)
    gt = [GroundTruthRecord(
        0, np.stack([_box(0, 0, 10, 10), _box(300, 300, 500, 500)]),
        np.asarray([1, 1]))]
    det = [DetectionRecord(
        0, np.stack([_box(0, 0, 10, 10), _box(300, 300, 500, 500)]),
        np.asarray([0.9, 0.8]), np.asarray([1, 1]))]
    m = coco_map(det, gt)
    assert m["APsmall"] == 1.0
    assert m["APlarge"] == 1.0
    assert np.isnan(m["APmedium"])  # no medium GT anywhere -> excluded
    assert m["mAP"] == 1.0


def test_out_of_area_det_ignored_in_stratum():
    """In the large stratum, an unmatched small det is ignored, not FP."""
    gt = [GroundTruthRecord(0, _box(300, 300, 500, 500)[None],
                            np.asarray([1]))]
    det = [DetectionRecord(
        0,
        np.stack([_box(0, 0, 5, 5), _box(300, 300, 500, 500)]),
        np.asarray([0.95, 0.9]),  # small FP outranks the large TP
        np.asarray([1, 1]))]
    m = coco_map(det, gt)
    assert m["APlarge"] == 1.0  # the small det is out of the stratum
    # no small GT exists -> the small stratum is excluded (NaN), matching
    # pycocotools' -1 convention
    assert np.isnan(m["APsmall"])


def test_area_scale_converts_normalized_boxes():
    """Normalized boxes with area_scale=512: 0.01^2 canvas box = 5.12px box
    (small); 0.5^2 = 256px box (large)."""
    gt = [GroundTruthRecord(
        0, np.stack([_box(0, 0, 0.02, 0.02), _box(0.3, 0.3, 0.8, 0.8)]),
        np.asarray([1, 1]))]
    det = [DetectionRecord(
        0, np.stack([_box(0, 0, 0.02, 0.02), _box(0.3, 0.3, 0.8, 0.8)]),
        np.asarray([0.9, 0.8]), np.asarray([1, 1]))]
    m = coco_map(det, gt, area_scale=512.0)
    assert m["APsmall"] == 1.0 and m["APlarge"] == 1.0


def test_average_recall_maxdets():
    """3 GT, 3 perfect dets in one image: AR1 = 1/3, AR10 = AR100 = 1."""
    boxes = np.stack([_box(0, 0, 10, 10), _box(20, 20, 30, 30),
                      _box(40, 40, 50, 50)])
    gt = [GroundTruthRecord(0, boxes, np.asarray([1, 1, 1]))]
    det = [DetectionRecord(0, boxes, np.asarray([0.9, 0.8, 0.7]),
                           np.asarray([1, 1, 1]))]
    m = coco_map(det, gt)
    np.testing.assert_allclose(m["AR1"], 1.0 / 3.0, atol=1e-9)
    np.testing.assert_allclose(m["AR10"], 1.0, atol=1e-9)
    np.testing.assert_allclose(m["AR100"], 1.0, atol=1e-9)


def test_area_stratified_ar():
    """Two small GTs (one detected) + one large GT (detected): ARsmall = 1/2,
    ARlarge = 1, ARmedium undefined, overall AR100 = 2/3 (pycocotools
    summarize rows 10-12, maxDets=100)."""
    gt = [GroundTruthRecord(
        0, np.stack([_box(0, 0, 10, 10), _box(100, 100, 110, 110),
                     _box(300, 300, 500, 500)]),
        np.asarray([1, 1, 1]))]
    det = [DetectionRecord(
        0, np.stack([_box(0, 0, 10, 10), _box(300, 300, 500, 500)]),
        np.asarray([0.9, 0.8]), np.asarray([1, 1]))]
    m = coco_map(det, gt)
    np.testing.assert_allclose(m["ARsmall"], 0.5, atol=1e-9)
    np.testing.assert_allclose(m["ARlarge"], 1.0, atol=1e-9)
    assert np.isnan(m["ARmedium"])
    np.testing.assert_allclose(m["AR100"], 2.0 / 3.0, atol=1e-9)


def test_evaluator_crowd_plumbing():
    from shape_based_object_detection_tpu.eval import Evaluator
    from shape_based_object_detection_tpu.ops.nms import Detections

    ev = Evaluator(area_scale=100.0)
    det = Detections(
        boxes=np.asarray([[[0.0, 0.0, 0.5, 0.5], [0.6, 0.6, 0.9, 0.9]]]),
        scores=np.asarray([[0.95, 0.9]]),
        labels=np.asarray([[1, 1]]),
        valid=np.asarray([[True, True]]),
    )
    gt_boxes = np.asarray([[[0.0, 0.0, 0.5, 0.5], [0.5, 0.5, 1.0, 1.0]]])
    gt_labels = np.asarray([[1, 1]])
    gt_valid = np.asarray([[True, True]])
    gt_crowd = np.asarray([[False, True]])
    ev.add_batch(det, gt_boxes, gt_labels, gt_valid, gt_crowd=gt_crowd)
    m = ev.coco()
    assert m["mAP"] == 1.0  # second det ignored on the crowd, first is TP


def test_per_image_area_factor_original_pixels():
    """pycocotools strata use ORIGINAL-image annotation areas: the same
    normalized box is 'small' on a small source image and 'medium' on a big
    one. Image 0: 640x480 source, a 0.05x0.05 box = 32x24 px = 768 px^2
    (small). Image 1: 1280x960 source, same normalized box = 64x48 px =
    3072 px^2 (medium)."""
    nbox = _box(0.1, 0.1, 0.15, 0.15)
    gt = [
        GroundTruthRecord(0, nbox[None], np.asarray([1]),
                          area_factor=640.0 * 480.0),
        GroundTruthRecord(1, nbox[None], np.asarray([1]),
                          area_factor=1280.0 * 960.0),
    ]
    det = [
        DetectionRecord(0, nbox[None], np.asarray([0.9]), np.asarray([1])),
        DetectionRecord(1, nbox[None], np.asarray([0.9]), np.asarray([1])),
    ]
    m = coco_map(det, gt)
    assert m["APsmall"] == 1.0   # only image 0's GT is in-stratum, matched
    assert m["APmedium"] == 1.0  # only image 1's GT
    assert np.isnan(m["APlarge"])
    # without the factors, both boxes are tiny normalized areas -> both small
    gt_nf = [GroundTruthRecord(r.image_id, r.boxes, r.labels) for r in gt]
    m2 = coco_map(det, gt_nf, area_scale=512.0)
    assert m2["APsmall"] == 1.0 and np.isnan(m2["APmedium"])


def test_evaluator_area_factors_plumbing():
    from shape_based_object_detection_tpu.eval import Evaluator
    from shape_based_object_detection_tpu.ops.nms import Detections

    ev = Evaluator(area_scale=1.0)
    det = Detections(
        boxes=np.asarray([[[0.1, 0.1, 0.15, 0.15]]]),
        scores=np.asarray([[0.9]]),
        labels=np.asarray([[1]]),
        valid=np.asarray([[True]]),
    )
    gt_boxes = np.asarray([[[0.1, 0.1, 0.15, 0.15]]])
    ev.add_batch(det, gt_boxes, np.asarray([[1]]), np.asarray([[True]]),
                 area_factors=np.asarray([1280.0 * 960.0]))
    m = ev.coco()
    assert m["APmedium"] == 1.0 and np.isnan(m["APsmall"])


def test_group_by_class_merges_duplicate_image_records():
    """Several GroundTruthRecords sharing an image_id (one record per COCO
    annotation) merge instead of overwriting: both GTs are countable."""
    from shape_based_object_detection_tpu.eval.ap import (
        DetectionRecord, GroundTruthRecord, voc_map,
    )

    gts = [
        GroundTruthRecord(image_id=0,
                          boxes=np.asarray([[0.0, 0.0, 10.0, 10.0]]),
                          labels=np.asarray([1])),
        GroundTruthRecord(image_id=0,
                          boxes=np.asarray([[20.0, 20.0, 30.0, 30.0]]),
                          labels=np.asarray([1])),
    ]
    dets = [DetectionRecord(
        image_id=0,
        boxes=np.asarray([[0.0, 0.0, 10.0, 10.0], [20.0, 20.0, 30.0, 30.0]]),
        scores=np.asarray([0.9, 0.8]), labels=np.asarray([1, 1]))]
    m = voc_map(dets, gts, use_11point=False)
    assert m["mAP"] == pytest.approx(1.0)  # both GTs found = perfect AP


def test_voc_map_excludes_undefined_classes():
    """A class whose GTs are all crowd (AP undefined) is excluded from the
    mean instead of deflating it with 0.0 (coco_map nanmean semantics)."""
    from shape_based_object_detection_tpu.eval.ap import (
        DetectionRecord, GroundTruthRecord, voc_map,
    )

    gts = [GroundTruthRecord(
        image_id=0,
        boxes=np.asarray([[0.0, 0.0, 10.0, 10.0], [20.0, 20.0, 30.0, 30.0]]),
        labels=np.asarray([1, 2]), crowd=np.asarray([False, True]))]
    dets = [DetectionRecord(
        image_id=0, boxes=np.asarray([[0.0, 0.0, 10.0, 10.0]]),
        scores=np.asarray([0.9]), labels=np.asarray([1]))]
    m = voc_map(dets, gts, use_11point=False)
    assert m["mAP"] == pytest.approx(1.0)  # class 2 undefined, excluded
    assert 2 not in m["per_class"]


def test_ar_truncation_equals_rematch():
    """AR@1/AR@10 derived by rank truncation equal a real re-match at the
    smaller max_det (randomized cross-check)."""
    from shape_based_object_detection_tpu.eval import ap as ap_lib

    rng = np.random.default_rng(11)
    for _ in range(5):
        gts, crs, dets = {}, {}, []
        for img in range(3):
            g = rng.integers(1, 5)
            b = rng.uniform(0, 80, (g, 2))
            gts[img] = np.concatenate(
                [b, b + rng.uniform(5, 30, (g, 2))], axis=1)
            crs[img] = rng.random(g) < 0.25
            for _d in range(int(rng.integers(3, 15))):
                base = gts[img][rng.integers(0, g)]
                jit = rng.normal(0, 4, 4)
                dets.append((img, base + jit, float(rng.random())))
        thr = ap_lib.COCO_IOU_THRESHOLDS
        tp, ig, _, n_gt, ranks = ap_lib._match_class(
            dets, gts, thr, crowd=crs, area_range=(0.0, 1e10), max_det=100,
            return_ranks=True)
        for md in (1, 3):
            keep = ranks < md
            trunc = ap_lib._recall_from_tp(tp[:, keep], n_gt, ig[:, keep])
            tp_m, ig_m, _, n_gt_m = ap_lib._match_class(
                dets, gts, thr, crowd=crs, area_range=(0.0, 1e10), max_det=md)
            rematch = ap_lib._recall_from_tp(tp_m, n_gt_m, ig_m)
            np.testing.assert_allclose(trunc, rematch)
