"""Detection math: pure-jnp + Pallas kernels (SURVEY.md §2 C11-C16)."""

from shape_based_object_detection_tpu.ops import boxes
from shape_based_object_detection_tpu.ops import anchors
from shape_based_object_detection_tpu.ops import nms
from shape_based_object_detection_tpu.ops import matching
from shape_based_object_detection_tpu.ops.boxes import (
    cxcywh_to_xyxy,
    xyxy_to_cxcywh,
    box_area,
    iou_matrix,
    pairwise_intersection,
    encode_boxes,
    decode_boxes,
    shape_similarity,
    clip_boxes,
)
from shape_based_object_detection_tpu.ops.anchors import (
    ssd_anchors,
    retinanet_anchors,
    anchors_for_model,
)
from shape_based_object_detection_tpu.ops.nms import (
    nms_mask,
    batched_class_aware_nms,
)
from shape_based_object_detection_tpu.ops.nms_matrix import (
    batched_class_aware_nms_matrix,
)
from shape_based_object_detection_tpu.ops.matching import match_anchors

__all__ = [
    "boxes", "anchors", "nms", "matching",
    "cxcywh_to_xyxy", "xyxy_to_cxcywh", "box_area", "iou_matrix",
    "pairwise_intersection", "encode_boxes", "decode_boxes",
    "shape_similarity", "clip_boxes",
    "ssd_anchors", "retinanet_anchors", "anchors_for_model",
    "nms_mask", "batched_class_aware_nms", "match_anchors",
]
