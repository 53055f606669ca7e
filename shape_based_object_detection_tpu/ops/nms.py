"""Batched class-aware NMS with static shapes (component C16, SURVEY.md §2).

The reference family implements post-processing as a per-class Python loop on
the host — its inference hot loop. Here NMS is a fixed-shape XLA program that
runs on-device inside the same jitted function as the forward pass:

- Greedy NMS is expressed as ``max_detections`` sequential select-and-suppress
  steps over a fixed candidate set (``lax.scan``). Each step is O(N) vector
  work (one argmax + one IoU row), so the whole thing is O(max_det * N) with
  no N x N materialization, static shapes, and no host round-trip. This is
  bit-identical to classic sort-then-suppress NMS truncated to the top
  ``max_detections`` survivors.
- Class-awareness uses the coordinate-offset trick: shifting each candidate
  box by ``class_id * offset`` (offset > any box extent) makes cross-class
  IoU exactly 0, so one single-class NMS pass is mathematically identical to
  independent per-class NMS. See `ops/nms_pallas.py` for the Pallas kernel
  variant of the suppression loop.

A full keep-mask variant (``nms_mask``) exists for golden-parity tests against
a torch reference implementation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from shape_based_object_detection_tpu.ops import boxes as box_ops

_NEG_INF = -1e10


def class_offset_boxes(boxes_xyxy: jnp.ndarray,
                       classes: jnp.ndarray) -> jnp.ndarray:
    """Offset trick shared by every NMS backend: boxes live in [0, 1], so
    shifting each by ``class_id * 2.0`` makes cross-class IoU exactly 0 and
    one single-class pass == independent per-class NMS. The 2.0 separation
    encodes the clipped-[0,1]-boxes invariant (detection.postprocess clips
    before NMS) — widen it if unclipped/pixel boxes are ever fed in.
    ``classes`` broadcasts against boxes' leading dims."""
    return boxes_xyxy + classes.astype(boxes_xyxy.dtype)[..., None] * 2.0


def _iou_row(box: jnp.ndarray, all_boxes: jnp.ndarray) -> jnp.ndarray:
    """IoU of one (4,) box against (N, 4) boxes -> (N,).

    Deliberately NOT shared with boxes.iou_matrix: this row kernel is the
    scan-NMS inner loop and must stay bit-identical to the Pallas kernel's
    inline IoU (the backends are tested bit-equal), so its eps/clamping is
    pinned here."""
    lt = jnp.maximum(box[:2], all_boxes[:, :2])
    rb = jnp.minimum(box[2:], all_boxes[:, 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[:, 0] * wh[:, 1]
    area_a = jnp.clip(box[2] - box[0], 0.0, None) * jnp.clip(box[3] - box[1], 0.0, None)
    area_b = box_ops.box_area(all_boxes)
    return inter / jnp.maximum(area_a + area_b - inter, 1e-8)


class NMSResult(NamedTuple):
    indices: jnp.ndarray  # (max_detections,) int32 into the candidate set
    scores: jnp.ndarray  # (max_detections,) suppressed entries are -inf-ish
    valid: jnp.ndarray  # (max_detections,) bool


def greedy_nms(
    boxes_xyxy: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
    max_detections: int,
) -> NMSResult:
    """Single-class greedy NMS over a fixed-size candidate set.

    Args:
      boxes_xyxy: (N, 4). scores: (N,). valid: (N,) bool — padding rows must
        be False; they can never be selected nor suppress anything.
    Returns indices of survivors in score order, padded with ``valid=False``.
    """
    live = jnp.where(valid, scores, _NEG_INF)

    def step(live_scores, _):
        idx = jnp.argmax(live_scores)
        best = live_scores[idx]
        is_valid = best > _NEG_INF / 2
        ious = _iou_row(boxes_xyxy[idx], boxes_xyxy)
        suppress = ious >= iou_threshold  # includes self (IoU 1)
        live_scores = jnp.where(
            jnp.logical_and(is_valid, suppress), _NEG_INF, live_scores
        )
        return live_scores, (idx.astype(jnp.int32), best, is_valid)

    _, (idx, sc, ok) = jax.lax.scan(step, live, None, length=max_detections)
    return NMSResult(indices=idx, scores=jnp.where(ok, sc, 0.0), valid=ok)


def soft_nms(
    boxes_xyxy: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    sigma: float,
    score_threshold: float,
    max_detections: int,
) -> NMSResult:
    """Gaussian Soft-NMS (Bodla et al. 2017, arXiv:1704.04503).

    Same greedy select loop as :func:`greedy_nms`, but instead of removing
    candidates above an IoU threshold, every remaining candidate's score is
    decayed multiplicatively by ``exp(-iou^2 / sigma)`` against the selected
    box. Selected entries report their (cumulatively decayed) score; entries
    whose decayed score falls below ``score_threshold`` come back invalid.
    Scores must be non-negative (post-activation), which detect() guarantees.
    """
    live = jnp.where(valid, scores, _NEG_INF)

    def step(live_scores, _):
        idx = jnp.argmax(live_scores)
        best = live_scores[idx]
        is_valid = best > jnp.maximum(score_threshold, _NEG_INF / 2)
        ious = _iou_row(boxes_xyxy[idx], boxes_xyxy)
        decay = jnp.exp(-(ious * ious) / sigma)
        decayed = jnp.where(live_scores > 0, live_scores * decay, live_scores)
        live_scores = jnp.where(is_valid, decayed, live_scores)
        live_scores = live_scores.at[idx].set(_NEG_INF)  # consume selection
        return live_scores, (idx.astype(jnp.int32), best, is_valid)

    _, (idx, sc, ok) = jax.lax.scan(step, live, None, length=max_detections)
    return NMSResult(indices=idx, scores=jnp.where(ok, sc, 0.0), valid=ok)


def batched_class_aware_soft_nms(
    boxes_xyxy: jnp.ndarray,  # (B, N, 4) normalized
    scores: jnp.ndarray,  # (B, N)
    classes: jnp.ndarray,  # (B, N) int32
    valid: jnp.ndarray,  # (B, N) bool
    sigma: float,
    score_threshold: float,
    max_detections: int,
) -> Detections:
    """Class-aware Soft-NMS via the same coordinate-offset trick (cross-class
    IoU is exactly 0, so cross-class decay is exp(0)=1: a no-op)."""

    def one(b, s, c, v):
        res = soft_nms(class_offset_boxes(b, c), s, v, sigma,
                       score_threshold, max_detections)
        return b[res.indices], res.scores, c[res.indices], res.valid

    bx, sc, cl, ok = jax.vmap(one)(boxes_xyxy, scores, classes, valid)
    return Detections(boxes=bx, scores=sc, labels=cl, valid=ok)


def nms_mask(
    boxes_xyxy: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Full (N,) keep mask — classic NMS semantics, for tests/golden parity."""
    n = boxes_xyxy.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    res = greedy_nms(boxes_xyxy, scores, valid, iou_threshold, max_detections=n)
    keep = jnp.zeros((n,), dtype=bool)
    # .max, not .set: invalid slots carry a dummy index (the argmax over an
    # all-suppressed set) and must not clear a previously kept entry.
    return keep.at[res.indices].max(res.valid, mode="drop")


class Detections(NamedTuple):
    """Fixed-size per-image detection set (the public detect() output)."""

    boxes: jnp.ndarray  # (B, max_detections, 4) xyxy
    scores: jnp.ndarray  # (B, max_detections)
    labels: jnp.ndarray  # (B, max_detections) int32
    valid: jnp.ndarray  # (B, max_detections) bool


def _single_image_class_aware_nms(
    boxes_xyxy: jnp.ndarray,  # (N, 4) in [0, 1]
    scores: jnp.ndarray,  # (N,)
    classes: jnp.ndarray,  # (N,) int32
    valid: jnp.ndarray,  # (N,) bool
    iou_threshold: float,
    max_detections: int,
):
    shifted = class_offset_boxes(boxes_xyxy, classes)
    res = greedy_nms(shifted, scores, valid, iou_threshold, max_detections)
    return (
        boxes_xyxy[res.indices],
        res.scores,
        classes[res.indices],
        res.valid,
    )


def batched_class_aware_nms(
    boxes_xyxy: jnp.ndarray,  # (B, N, 4) normalized
    scores: jnp.ndarray,  # (B, N)
    classes: jnp.ndarray,  # (B, N) int32
    valid: jnp.ndarray,  # (B, N) bool
    iou_threshold: float,
    max_detections: int,
) -> Detections:
    """Class-aware NMS over a batch of fixed-size candidate sets."""
    fn = jax.vmap(
        lambda b, s, c, v: _single_image_class_aware_nms(
            b, s, c, v, iou_threshold, max_detections
        )
    )
    bx, sc, cl, ok = fn(boxes_xyxy, scores, classes, valid)
    return Detections(boxes=bx, scores=sc, labels=cl, valid=ok)


def select_top_candidates(
    boxes_xyxy: jnp.ndarray,  # (A, 4) decoded boxes (shared across classes)
    class_scores: jnp.ndarray,  # (A, C) per-class selection scores
    score_threshold: float,
    top_k: int,
    approx: bool = False,
    activation=None,
    two_stage: bool | None = None,
):
    """:func:`select_top_candidate_pairs` + the box gather (legacy surface;
    detection.postprocess uses the pairs form and DEFERS box decoding to the
    K winners instead of decoding all A anchors)."""
    anchor_idx, top_scores, class_idx, ok = select_top_candidate_pairs(
        class_scores, score_threshold, top_k, approx=approx,
        activation=activation, two_stage=two_stage)
    return boxes_xyxy[anchor_idx], top_scores, class_idx, ok


def select_top_candidate_pairs(
    class_scores: jnp.ndarray,  # (A, C) per-class selection scores
    score_threshold: float,
    top_k: int,
    approx: bool = False,
    activation=None,
    two_stage: bool | None = None,
):
    """Keep the top-k (anchor, class) pairs by score — EXACTLY — in two
    stages that avoid ever running top-k over the full A*C pair set:

      1. reduce: per-anchor best class score (A*C -> A, one streaming pass)
         and top-k_a anchors by that maximum, k_a = min(top_k, A).
      2. top-k over only the selected anchors' pairs (k_a*C candidates).

    This is exact, not approximate: if pair (a, c) with score s is among the
    true top-k, fewer than k anchors can have max-score > s (each such anchor
    contributes a pair outscoring s), so anchor a is always in stage 1's
    top-k anchors. Cuts selection cost ~C-fold vs flat top-k (measured 6.0ms
    -> sub-ms at RetinaNet/COCO scale, 49k anchors x 80 classes) and needs no
    ``approx_max_k`` (which also faults the v5e runtime in one bf16 SSD-512
    program — STATUS.md).

    Returns (anchor_idx (K,), scores (K,), classes (K,), valid (K,)) with
    classes in [0, C). Below-threshold pairs are masked invalid (but still
    occupy slots if fewer than K pass — callers rely on the valid mask,
    giving exact per-class score-threshold semantics with static shapes).
    Returning INDICES (not boxes) lets the caller decode only the K winning
    anchors — box decode/clip/convert over all A anchors is pure HBM
    bandwidth that selection makes unnecessary.

    ``approx`` is accepted for config compatibility and ignored: the exact
    two-stage selection is faster than ``approx_max_k`` was. ``activation``
    (e.g. sigmoid) is applied to the K selected scores only — pass raw logits
    as ``class_scores`` when the activation is monotonic and save an (A, C)
    elementwise pass.

    ``two_stage=None`` auto-selects by pair count: the prereduce pays off
    once A*C is large, while at small A*C and batch 1 the two dependent
    top_k's serial latency loses to one flat top_k (measured: R50 49k x 80
    wins at every batch, +16..31%; SSD 0.5-0.7M pairs wins at batch >= ~4
    but loses ~28% at batch 1 — postprocess() passes the batch-aware
    choice explicitly).
    """
    a, c = class_scores.shape
    if two_stage is None:
        two_stage = a * c >= 2_000_000
    # Selection runs in the input dtype: a forced f32 cast costs ~14% at
    # SSD-300 batch 1 (wider sort keys), and bf16 tie-collapse only permutes
    # equal-scoring candidates — parity mode is f32 end to end regardless.
    scores = class_scores
    if two_stage:
        k_a = min(top_k, a)
        anchor_best = jnp.max(scores, axis=-1)  # (A,) streaming reduce
        _, anchor_sel = jax.lax.top_k(anchor_best, k_a)  # (k_a,)
        sel_scores = scores[anchor_sel]  # (k_a, C) gather
        k = min(top_k, k_a * c)
        top_scores, top_idx = jax.lax.top_k(sel_scores.reshape(-1), k)
        anchor_idx = anchor_sel[top_idx // c]
    else:
        k = min(top_k, a * c)
        top_scores, top_idx = jax.lax.top_k(scores.reshape(-1), k)
        anchor_idx = top_idx // c
    if activation is not None:
        top_scores = activation(top_scores)
    class_idx = (top_idx % c).astype(jnp.int32)
    return (
        anchor_idx,
        top_scores,
        class_idx,
        top_scores > score_threshold,
    )
