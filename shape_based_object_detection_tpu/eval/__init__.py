"""Evaluation: first-party COCO-style and VOC-style mAP (component C19)."""

from shape_based_object_detection_tpu.eval.ap import (
    DetectionRecord,
    GroundTruthRecord,
    coco_map,
    voc_map,
    Evaluator,
)
