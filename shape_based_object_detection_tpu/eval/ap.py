"""Average-precision evaluation (component C19, SURVEY.md §2).

pycocotools is not installed in this environment (SURVEY.md §7), so this is a
first-party vectorized numpy implementation of:

- COCO-style AP: greedy score-ordered matching per class at IoU thresholds
  .50:.05:.95, 101-point interpolated precision, mean over thresholds and
  classes (the COCOeval 'bbox' protocol, minus crowd/area handling which the
  reference pipeline also doesn't exercise; area-stratified AP is provided).
- VOC-style AP: 11-point interpolated (VOC2007) or continuous (VOC2010+) at
  IoU 0.5.

Inputs are plain numpy per-image records, so the device produces padded
Detections, the host strips padding via the validity mask and accumulates.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence, Tuple

import numpy as np

COCO_IOU_THRESHOLDS = np.arange(0.5, 1.0, 0.05)


@dataclasses.dataclass
class DetectionRecord:
    image_id: int
    boxes: np.ndarray  # (N, 4) xyxy
    scores: np.ndarray  # (N,)
    labels: np.ndarray  # (N,) int


@dataclasses.dataclass
class GroundTruthRecord:
    image_id: int
    boxes: np.ndarray  # (G, 4) xyxy
    labels: np.ndarray  # (G,) int


def _iou_matrix_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), np.float32)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = np.clip(a[:, 2] - a[:, 0], 0, None) * np.clip(a[:, 3] - a[:, 1], 0, None)
    area_b = np.clip(b[:, 2] - b[:, 0], 0, None) * np.clip(b[:, 3] - b[:, 1], 0, None)
    return inter / np.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-9)


def _match_class(
    dets: List[Tuple[int, np.ndarray, float]],  # (image_id, box, score)
    gts: Dict[int, np.ndarray],  # image_id -> (G, 4)
    iou_thresholds: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Greedy matching for one class. Returns (tp (T, N), scores (N,), n_gt).

    tp[t, i] = 1 if detection i (score-sorted) matches an unclaimed GT at
    threshold iou_thresholds[t].
    """
    n_gt = sum(len(v) for v in gts.values())
    if not dets:
        return np.zeros((len(iou_thresholds), 0)), np.zeros(0), n_gt
    dets = sorted(dets, key=lambda d: -d[2])
    scores = np.asarray([d[2] for d in dets])
    n = len(dets)
    t_count = len(iou_thresholds)

    # native C++ fast path (csrc/ap_matcher.cpp); identical semantics
    from shape_based_object_detection_tpu.utils.native import match_class_native

    if n_gt:
        gt_img_ids = np.concatenate(
            [np.full(len(b), img, np.int32) for img, b in gts.items()])
        gt_flat = (np.concatenate([np.asarray(b) for b in gts.values()])
                   if gts else np.zeros((0, 4), np.float32))
        det_boxes = np.stack([d[1] for d in dets]).astype(np.float32)
        det_imgs = np.asarray([d[0] for d in dets], np.int32)
        tp_native = match_class_native(
            det_boxes, det_imgs, gt_flat.astype(np.float32), gt_img_ids,
            np.asarray(iou_thresholds, np.float32))
        if tp_native is not None:
            return tp_native.astype(np.float32), scores, n_gt

    tp = np.zeros((t_count, n), np.float32)

    # per-image IoU between that image's (sorted) dets and its GT
    claimed = {
        img: np.zeros((t_count, len(boxes)), bool) for img, boxes in gts.items()
    }
    for i, (img, box, _) in enumerate(dets):
        gt_boxes = gts.get(img)
        if gt_boxes is None or len(gt_boxes) == 0:
            continue
        ious = _iou_matrix_np(box[None], gt_boxes)[0]
        order = np.argsort(-ious)
        for t in range(t_count):
            thr = iou_thresholds[t]
            for g in order:
                if ious[g] < thr:
                    break
                if not claimed[img][t, g]:
                    claimed[img][t, g] = True
                    tp[t, i] = 1.0
                    break
    return tp, scores, n_gt


def _ap_from_tp(tp: np.ndarray, n_gt: int, interpolation: str) -> np.ndarray:
    """tp: (T, N) score-sorted hits -> (T,) AP values."""
    t_count, n = tp.shape
    if n_gt == 0:
        return np.full((t_count,), np.nan)
    if n == 0:
        return np.zeros((t_count,))
    cum_tp = np.cumsum(tp, axis=1)
    cum_fp = np.cumsum(1.0 - tp, axis=1)
    recall = cum_tp / n_gt
    precision = cum_tp / np.maximum(cum_tp + cum_fp, 1e-9)

    aps = np.zeros((t_count,))
    for t in range(t_count):
        p, r = precision[t], recall[t]
        # monotone precision envelope
        p_env = np.maximum.accumulate(p[::-1])[::-1]
        if interpolation == "101point":  # COCO
            grid = np.linspace(0, 1, 101)
            idx = np.searchsorted(r, grid, side="left")
            p_at = np.where(idx < len(p_env), p_env[np.minimum(idx, len(p_env) - 1)], 0.0)
            aps[t] = p_at.mean()
        elif interpolation == "11point":  # VOC2007
            grid = np.linspace(0, 1, 11)
            ap = 0.0
            for g in grid:
                mask = r >= g
                ap += p_env[mask].max() if mask.any() else 0.0
            aps[t] = ap / 11.0
        else:  # continuous (VOC2010+ / area under PR)
            r_ext = np.concatenate([[0.0], r, [r[-1]]])
            p_ext = np.concatenate([[0.0], p_env, [0.0]])
            aps[t] = np.sum((r_ext[1:-1] - r_ext[:-2]) * p_ext[1:-1])
    return aps


def _group_by_class(
    detections: Sequence[DetectionRecord],
    ground_truth: Sequence[GroundTruthRecord],
):
    classes = set()
    for g in ground_truth:
        classes.update(np.unique(g.labels).tolist())
    dets_by_class: Dict[int, List] = {c: [] for c in classes}
    gts_by_class: Dict[int, Dict[int, np.ndarray]] = {c: {} for c in classes}
    for d in detections:
        for box, score, label in zip(d.boxes, d.scores, d.labels):
            if int(label) in dets_by_class:
                dets_by_class[int(label)].append((d.image_id, np.asarray(box), float(score)))
    for g in ground_truth:
        for c in classes:
            m = g.labels == c
            if m.any():
                gts_by_class[c][g.image_id] = np.asarray(g.boxes)[m]
    return sorted(classes), dets_by_class, gts_by_class


def coco_map(
    detections: Sequence[DetectionRecord],
    ground_truth: Sequence[GroundTruthRecord],
) -> Dict[str, float]:
    """Returns {'mAP', 'AP50', 'AP75', per-class APs under 'per_class'}."""
    classes, dets_by_class, gts_by_class = _group_by_class(detections, ground_truth)
    per_class = {}
    all_aps = []
    for c in classes:
        tp, scores, n_gt = _match_class(
            dets_by_class[c], gts_by_class[c], COCO_IOU_THRESHOLDS
        )
        aps = _ap_from_tp(tp, n_gt, "101point")
        per_class[c] = aps
        all_aps.append(aps)
    if not all_aps:
        return {"mAP": 0.0, "AP50": 0.0, "AP75": 0.0, "per_class": {}}
    stacked = np.stack(all_aps)  # (C, T)
    with np.errstate(invalid="ignore"):
        mean_per_t = np.nanmean(stacked, axis=0)
    return {
        "mAP": float(np.nanmean(stacked)),
        "AP50": float(mean_per_t[0]),
        "AP75": float(mean_per_t[5]),
        "per_class": {c: float(np.nanmean(a)) for c, a in per_class.items()},
    }


def voc_map(
    detections: Sequence[DetectionRecord],
    ground_truth: Sequence[GroundTruthRecord],
    iou_threshold: float = 0.5,
    use_11point: bool = True,
) -> Dict[str, float]:
    classes, dets_by_class, gts_by_class = _group_by_class(detections, ground_truth)
    per_class = {}
    for c in classes:
        tp, scores, n_gt = _match_class(
            dets_by_class[c], gts_by_class[c], np.asarray([iou_threshold])
        )
        ap = _ap_from_tp(tp, n_gt, "11point" if use_11point else "continuous")[0]
        per_class[c] = float(ap) if np.isfinite(ap) else 0.0
    vals = [v for v in per_class.values()]
    return {
        "mAP": float(np.mean(vals)) if vals else 0.0,
        "per_class": per_class,
    }


class Evaluator:
    """Accumulates device Detections batches (padded + masked) into records."""

    def __init__(self):
        self.detections: List[DetectionRecord] = []
        self.ground_truth: List[GroundTruthRecord] = []
        self._next_id = 0

    def add_batch(self, det, gt_boxes, gt_labels, gt_valid) -> None:
        """det: ops.nms.Detections (device or numpy); gt_*: (B, G, ...)."""
        boxes = np.asarray(det.boxes)
        scores = np.asarray(det.scores)
        labels = np.asarray(det.labels)
        valid = np.asarray(det.valid)
        gt_boxes = np.asarray(gt_boxes)
        gt_labels = np.asarray(gt_labels)
        gt_valid = np.asarray(gt_valid)
        for b in range(boxes.shape[0]):
            img_id = self._next_id
            self._next_id += 1
            v = valid[b]
            self.detections.append(
                DetectionRecord(img_id, boxes[b][v], scores[b][v], labels[b][v])
            )
            gv = gt_valid[b]
            self.ground_truth.append(
                GroundTruthRecord(img_id, gt_boxes[b][gv], gt_labels[b][gv])
            )

    def coco(self) -> Dict[str, float]:
        return coco_map(self.detections, self.ground_truth)

    def voc(self, iou_threshold: float = 0.5) -> Dict[str, float]:
        return voc_map(self.detections, self.ground_truth, iou_threshold)
