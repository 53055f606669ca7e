"""Round-based exact greedy NMS (the MXU formulation of component C16).

Greedy NMS's keep set has a closed fixpoint characterization:

    keep[i]  <=>  no j with score_j > score_i, IoU(i, j) >= t and keep[j]

Iterating "i is KEPT once every higher-scored overlapping candidate is
SUPPRESSED; i is SUPPRESSED once any higher-scored KEPT candidate overlaps
it" converges to exactly the sequential greedy result in D rounds, where D is
the longest suppression chain (typically 5-15 on real detections, vs
max_detections sequential steps for the scan/Pallas formulations).

Each round is two (B, N) x (N, N) masked matrix products — MXU work — inside
a ``lax.while_loop`` that exits at the fixpoint. The (N, N) IoU matrix is
computed once (N = pre-NMS top-k, e.g. 1000 -> 4 MB/image..8 MB bf16 batch).

All three NMS backends (scan, Pallas, matrix) are interchangeable and tested
equal.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from shape_based_object_detection_tpu.ops import boxes as box_ops
from shape_based_object_detection_tpu.ops.nms import Detections


def _suppression_matrix(boxes_xyxy, scores, valid, iou_threshold):
    """S[b, j, i] = 1 if candidate j can suppress candidate i (j stronger,
    overlapping). Ties broken by index (lower index wins), matching the
    sort-then-scan semantics."""
    iou = box_ops.iou_matrix(boxes_xyxy, boxes_xyxy)  # (B, N, N)
    n = scores.shape[-1]
    idx = jnp.arange(n)
    stronger = (scores[..., :, None] > scores[..., None, :]) | (
        (scores[..., :, None] == scores[..., None, :])
        & (idx[:, None] < idx[None, :])
    )
    s = (iou >= iou_threshold) & stronger & valid[..., :, None] & valid[..., None, :]
    return s.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("iou_threshold", "max_detections"))
def batched_class_aware_nms_matrix(
    boxes_xyxy: jnp.ndarray,  # (B, N, 4) normalized
    scores: jnp.ndarray,  # (B, N)
    classes: jnp.ndarray,  # (B, N) int32
    valid: jnp.ndarray,  # (B, N) bool
    iou_threshold: float,
    max_detections: int,
) -> Detections:
    b, n, _ = boxes_xyxy.shape
    from shape_based_object_detection_tpu.ops.nms import class_offset_boxes

    shifted = class_offset_boxes(boxes_xyxy, classes)
    s = _suppression_matrix(shifted, scores, valid, iou_threshold)  # (B,N,N)

    kept0 = jnp.zeros((b, n), jnp.float32)
    supp0 = jnp.where(valid, 0.0, 1.0)  # padding rows start suppressed

    def cond(state):
        kept, supp, changed, _ = state
        return changed

    def body(state):
        kept, supp, _, rounds = state
        # i suppressed once a kept stronger candidate overlaps it
        hit = jnp.einsum("bj,bji->bi", kept, s) > 0.0
        new_supp = jnp.maximum(supp, hit.astype(jnp.float32))
        # i kept once ALL stronger overlapping candidates are suppressed
        # (and it isn't suppressed itself)
        blockers = jnp.einsum("bj,bji->bi", 1.0 - new_supp, s)
        new_kept = jnp.where(
            (blockers == 0.0) & (new_supp == 0.0), 1.0, kept
        )
        changed = jnp.any((new_kept != kept) | (new_supp != supp))
        return new_kept, new_supp, changed, rounds + 1

    kept, supp, _, rounds = jax.lax.while_loop(
        cond, body, (kept0, supp0, jnp.bool_(True), jnp.int32(0))
    )

    # top max_detections kept candidates by score (scores are >= 0 here)
    kept_scores = jnp.where(kept > 0, scores, -1.0)
    top_scores, top_idx = jax.lax.top_k(kept_scores, max_detections)
    out_valid = top_scores > -0.5
    out_boxes = jnp.take_along_axis(boxes_xyxy, top_idx[..., None], axis=1)
    out_classes = jnp.take_along_axis(classes, top_idx, axis=1)
    return Detections(
        boxes=out_boxes,
        scores=jnp.where(out_valid, top_scores, 0.0),
        labels=out_classes,
        valid=out_valid,
    )
