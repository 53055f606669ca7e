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


def _claimed_gt_per_anchor(gt_best_a: jnp.ndarray, gt_valid: jnp.ndarray,
                           num_anchors: int) -> jnp.ndarray:
    """(A,) int32: the highest-index valid GT claiming each anchor via the
    force-match step, or -1 where unclaimed. A deterministic max-scatter —
    ``.at[].set`` with duplicate indices is unspecified, which would make
    conflicting GT claims backend-dependent."""
    g_ids = jnp.arange(gt_valid.shape[0], dtype=jnp.int32)
    safe_a = jnp.where(gt_valid, gt_best_a, num_anchors)  # drop invalid
    return jnp.full((num_anchors,), -1, jnp.int32).at[safe_a].max(
        g_ids, mode="drop")


class MatchResult(NamedTuple):
    matched_gt_idx: jnp.ndarray  # (A,) int32, gt index per anchor (0 if none)
    cls_targets: jnp.ndarray  # (A,) int32 in {-1, 0, 1..C}
    reg_targets: jnp.ndarray  # (A, 4) encoded offsets (valid where positive)
    positive: jnp.ndarray  # (A,) bool
    quality: jnp.ndarray  # (A,) matched quality (debug/metrics)


def _assign_from_reductions(
    anchors_cxcywh: jnp.ndarray,  # (A, 4)
    gt_boxes_xyxy: jnp.ndarray,  # (G, 4)
    gt_labels: jnp.ndarray,  # (G,)
    gt_valid: jnp.ndarray,  # (G,) bool
    best_q: jnp.ndarray,  # (A,) max_g quality
    best_g: jnp.ndarray,  # (A,) argmax_g quality
    gt_best_a: jnp.ndarray,  # (G,) argmax_a quality (per-GT best anchor)
    cfg: MatchConfig,
    variances,
) -> MatchResult:
    """O(A) epilogue shared by the dense-jnp and Pallas reduction paths:
    force-match scatter, thresholding with ignore band, offset encoding."""
    gt_cxcywh = box_ops.xyxy_to_cxcywh(gt_boxes_xyxy)
    num_anchors = anchors_cxcywh.shape[0]

    # allow_low_quality (torchvision naming) and force_match_for_each_gt (SSD
    # naming) are the same mechanism: every GT claims its best anchor even
    # below the positive threshold.
    if cfg.force_match_for_each_gt or cfg.allow_low_quality:
        # Each valid GT claims its single best anchor, overriding thresholds.
        # Later GTs win scatter conflicts (the family's sequential per-GT
        # loop semantics). NOTE: .at[].set with duplicate indices applies an
        # UNSPECIFIED update, so conflicts are resolved with a max-scatter
        # (max g = later GT; commutative => deterministic on every backend).
        claim = _claimed_gt_per_anchor(gt_best_a, gt_valid, num_anchors)
        claimed = claim >= 0
        best_g = jnp.where(claimed, claim, best_g)
        best_q = jnp.where(claimed, 2.0, best_q)  # above any threshold

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


def _quality_matrix(anchors_cxcywh, gt_boxes_xyxy, gt_valid, cfg):
    anchors_xyxy = box_ops.cxcywh_to_xyxy(anchors_cxcywh)
    iou = box_ops.iou_matrix(anchors_xyxy, gt_boxes_xyxy)  # (A, G)
    if cfg.shape_weight > 0.0:
        gt_cxcywh = box_ops.xyxy_to_cxcywh(gt_boxes_xyxy)
        sim = box_ops.shape_similarity(anchors_cxcywh, gt_cxcywh, cfg.shape_tau)
        quality = (1.0 - cfg.shape_weight) * iou + cfg.shape_weight * sim
    else:
        quality = iou
    return jnp.where(gt_valid[None, :], quality, -1.0)


def match_anchors(
    anchors_cxcywh: jnp.ndarray,  # (A, 4)
    gt_boxes_xyxy: jnp.ndarray,  # (G, 4) normalized, padded
    gt_labels: jnp.ndarray,  # (G,) int32 in [1, C], padding arbitrary
    gt_valid: jnp.ndarray,  # (G,) bool
    cfg: MatchConfig,
    variances=(0.1, 0.2),
) -> MatchResult:
    """Dense-jnp single-sample matcher (the reference semantics)."""
    quality = _quality_matrix(anchors_cxcywh, gt_boxes_xyxy, gt_valid, cfg)
    best_q = jnp.max(quality, axis=1)  # (A,)
    best_g = jnp.argmax(quality, axis=1).astype(jnp.int32)  # (A,)
    a_star = jnp.argmax(quality, axis=0).astype(jnp.int32)  # (G,)
    return _assign_from_reductions(
        anchors_cxcywh, gt_boxes_xyxy, gt_labels, gt_valid,
        best_q, best_g, a_star, cfg, variances)


from shape_based_object_detection_tpu.utils.platform import (
    use_pallas_default as _use_pallas_default,
)


def match_batch(
    anchors_cxcywh: jnp.ndarray,  # (A, 4)
    gt_boxes_xyxy: jnp.ndarray,  # (B, G, 4)
    gt_labels: jnp.ndarray,  # (B, G)
    gt_valid: jnp.ndarray,  # (B, G)
    cfg: MatchConfig,
    variances=(0.1, 0.2),
) -> MatchResult:
    """Batched matcher. ``cfg.backend`` selects the reduction path: the
    fused Pallas kernel (ops/matching_pallas.py — no (A, G) matrix in HBM)
    on TPU, or the dense-jnp vmap elsewhere; both produce identical
    assignments."""
    backend = cfg.backend
    if backend == "auto":
        backend = "pallas" if _use_pallas_default() else "jnp"
    if backend == "pallas":
        from shape_based_object_detection_tpu.ops.matching_pallas import (
            match_reductions_pallas,
        )

        best_q, best_g, gt_a, m_label, m_reg = match_reductions_pallas(
            anchors_cxcywh, gt_boxes_xyxy, gt_labels, gt_valid,
            shape_weight=cfg.shape_weight, tau=cfg.shape_tau,
            variances=tuple(variances),
            interpret=not _use_pallas_default())
        num_anchors = anchors_cxcywh.shape[0]

        def assemble(gt_b, gt_l, gt_v, bq, bg, ga, lbl, reg):
            # Force-match fix-ups touch at most G anchors, so patch the
            # kernel's matched values with O(G) scatters (the kernel already
            # produced labels/offsets for the argmax assignment; vmapped
            # full-width gathers are the slow path this backend avoids).
            if cfg.force_match_for_each_gt or cfg.allow_low_quality:
                safe_a = jnp.where(gt_v, ga, num_anchors)  # drop invalid
                # deterministic later-GT-wins conflict resolution (max-
                # scatter; see _claimed_gt_per_anchor) — then every duplicate
                # fix-up scatter below carries IDENTICAL values (the same
                # post-claim winner), so scatter order cannot matter and the
                # path stays bit-identical to the jnp matcher.
                claim = _claimed_gt_per_anchor(ga, gt_v, num_anchors)
                claimed_mask = claim >= 0
                bg = jnp.where(claimed_mask, claim, bg)
                bq = jnp.where(claimed_mask, 2.0, bq)
                # O(G) fix-ups only (a dense (A,) gather from the small GT
                # table is the slow lowering this backend avoids)
                winner = claim[jnp.clip(ga, 0, num_anchors - 1)]  # (G,)
                winner = jnp.maximum(winner, 0)
                lbl_fix = gt_l.astype(jnp.int32)[winner]
                lbl = lbl.at[safe_a].set(lbl_fix, mode="drop")
                claimed_anchors = anchors_cxcywh[
                    jnp.clip(ga, 0, num_anchors - 1)]
                enc = box_ops.encode_boxes(
                    box_ops.xyxy_to_cxcywh(gt_b)[winner], claimed_anchors,
                    variances)
                reg = reg.at[safe_a].set(enc, mode="drop")
            positive = bq >= cfg.pos_threshold
            ignore = jnp.logical_and(bq >= cfg.neg_threshold,
                                     jnp.logical_not(positive))
            cls_targets = jnp.where(positive, lbl, 0)
            cls_targets = jnp.where(ignore, -1, cls_targets)
            reg = jnp.where(positive[:, None], reg, 0.0)
            return MatchResult(matched_gt_idx=bg, cls_targets=cls_targets,
                               reg_targets=reg, positive=positive, quality=bq)

        return jax.vmap(assemble)(gt_boxes_xyxy, gt_labels, gt_valid,
                                  best_q, best_g, gt_a, m_label, m_reg)
    return jax.vmap(
        lambda b, l, v: match_anchors(anchors_cxcywh, b, l, v, cfg, variances)
    )(gt_boxes_xyxy, gt_labels, gt_valid)
