"""First-party AP evaluation tests (component C19): hand-computed cases."""

import numpy as np

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
