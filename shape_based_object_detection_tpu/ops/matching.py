"""Anchor <-> ground-truth assignment (component C13 — the research
contribution of the reference, SURVEY.md §2).

The matcher computes a dense (A, G) match-quality matrix

    quality = (1 - w) * IoU + w * shape_similarity        (w = cfg.shape_weight)

then assigns per-anchor labels with thresholds and an ignore band, and
(optionally) force-assigns each GT its best anchor so no GT goes unmatched
(the SSD "bipartite" step). Everything is vectorized jnp with static shapes —
invalid (padding) GT rows are masked to quality -1 so they can never match.

Output label convention: -1 = ignore, 0 = background, 1..C = foreground class
(GT labels are 1-based foreground ids). Loss functions interpret this per
family (softmax-with-background for SSD, sigmoid-focal for RetinaNet).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from shape_based_object_detection_tpu.config import MatchConfig
from shape_based_object_detection_tpu.ops import boxes as box_ops


class MatchResult(NamedTuple):
    matched_gt_idx: jnp.ndarray  # (A,) int32, gt index per anchor (0 if none)
    cls_targets: jnp.ndarray  # (A,) int32 in {-1, 0, 1..C}
    reg_targets: jnp.ndarray  # (A, 4) encoded offsets (valid where positive)
    positive: jnp.ndarray  # (A,) bool
    quality: jnp.ndarray  # (A,) matched quality (debug/metrics)


def match_anchors(
    anchors_cxcywh: jnp.ndarray,  # (A, 4)
    gt_boxes_xyxy: jnp.ndarray,  # (G, 4) normalized, padded
    gt_labels: jnp.ndarray,  # (G,) int32 in [1, C], padding arbitrary
    gt_valid: jnp.ndarray,  # (G,) bool
    cfg: MatchConfig,
    variances=(0.1, 0.2),
) -> MatchResult:
    anchors_xyxy = box_ops.cxcywh_to_xyxy(anchors_cxcywh)
    gt_cxcywh = box_ops.xyxy_to_cxcywh(gt_boxes_xyxy)

    iou = box_ops.iou_matrix(anchors_xyxy, gt_boxes_xyxy)  # (A, G)
    if cfg.shape_weight > 0.0:
        sim = box_ops.shape_similarity(anchors_cxcywh, gt_cxcywh, cfg.shape_tau)
        quality = (1.0 - cfg.shape_weight) * iou + cfg.shape_weight * sim
    else:
        quality = iou
    quality = jnp.where(gt_valid[None, :], quality, -1.0)

    best_q = jnp.max(quality, axis=1)  # (A,)
    best_g = jnp.argmax(quality, axis=1).astype(jnp.int32)  # (A,)

    # allow_low_quality (torchvision naming) and force_match_for_each_gt (SSD
    # naming) are the same mechanism: every GT claims its best anchor even
    # below the positive threshold.
    if cfg.force_match_for_each_gt or cfg.allow_low_quality:
        # Each valid GT claims its single best anchor, overriding thresholds.
        # Later GTs win scatter conflicts (matches the family's sequential
        # per-GT loop semantics).
        a_star = jnp.argmax(quality, axis=0).astype(jnp.int32)  # (G,)
        g_ids = jnp.arange(quality.shape[1], dtype=jnp.int32)
        safe_a = jnp.where(gt_valid, a_star, quality.shape[0])  # drop invalid
        best_g = best_g.at[safe_a].set(g_ids, mode="drop")
        best_q = best_q.at[safe_a].set(2.0, mode="drop")  # above any threshold

    matched_label = gt_labels[best_g].astype(jnp.int32)  # (A,)
    positive = best_q >= cfg.pos_threshold
    ignore = jnp.logical_and(best_q >= cfg.neg_threshold,
                             jnp.logical_not(positive))
    cls_targets = jnp.where(positive, matched_label, 0)
    cls_targets = jnp.where(ignore, -1, cls_targets)

    matched_boxes = gt_cxcywh[best_g]  # (A, 4)
    reg_targets = box_ops.encode_boxes(matched_boxes, anchors_cxcywh, variances)
    reg_targets = jnp.where(positive[:, None], reg_targets, 0.0)

    return MatchResult(
        matched_gt_idx=best_g,
        cls_targets=cls_targets,
        reg_targets=reg_targets,
        positive=positive,
        quality=best_q,
    )


def match_batch(
    anchors_cxcywh: jnp.ndarray,  # (A, 4)
    gt_boxes_xyxy: jnp.ndarray,  # (B, G, 4)
    gt_labels: jnp.ndarray,  # (B, G)
    gt_valid: jnp.ndarray,  # (B, G)
    cfg: MatchConfig,
    variances=(0.1, 0.2),
) -> MatchResult:
    """vmap of :func:`match_anchors` over the batch dimension."""
    return jax.vmap(
        lambda b, l, v: match_anchors(anchors_cxcywh, b, l, v, cfg, variances)
    )(gt_boxes_xyxy, gt_labels, gt_valid)
