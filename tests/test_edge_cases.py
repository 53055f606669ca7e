"""Degenerate-input behavior: empty GT, empty candidates, single box —
static-shape code must stay finite and sane at the boundaries."""

import numpy as np
import jax
import jax.numpy as jnp

from shape_based_object_detection_tpu.config import LossConfig, MatchConfig
from shape_based_object_detection_tpu import losses as L
from shape_based_object_detection_tpu.ops import nms as N
from shape_based_object_detection_tpu.ops.matching import match_anchors, MatchResult


def _empty_match(b, a):
    return MatchResult(
        matched_gt_idx=jnp.zeros((b, a), jnp.int32),
        cls_targets=jnp.zeros((b, a), jnp.int32),  # all background
        reg_targets=jnp.zeros((b, a, 4)),
        positive=jnp.zeros((b, a), bool),
        quality=jnp.zeros((b, a)),
    )


def test_losses_finite_with_zero_positives(rng):
    b, a, c = 2, 32, 4
    match = _empty_match(b, a)
    logits_sm = jnp.asarray(rng.normal(size=(b, a, c + 1)).astype(np.float32))
    logits_fc = jnp.asarray(rng.normal(size=(b, a, c)).astype(np.float32))
    preds = jnp.asarray(rng.normal(size=(b, a, 4)).astype(np.float32))

    total_mb, m = L.multibox_loss(logits_sm, preds, match, LossConfig())
    assert np.isfinite(float(total_mb))
    assert float(m["loss_box"]) == 0.0  # no positives -> no box loss

    total_fl, m = L.focal_loss(logits_fc, preds, match, LossConfig(kind="focal"))
    assert np.isfinite(float(total_fl))

    # gradients stay finite too
    g = jax.grad(lambda lg: L.focal_loss(lg, preds, match,
                                         LossConfig(kind="focal"))[0])(logits_fc)
    assert np.isfinite(np.asarray(g)).all()


def test_nms_all_invalid():
    boxes = jnp.zeros((1, 8, 4))
    scores = jnp.ones((1, 8))
    classes = jnp.zeros((1, 8), jnp.int32)
    valid = jnp.zeros((1, 8), bool)
    det = N.batched_class_aware_nms(boxes, scores, classes, valid, 0.5, 4)
    assert not np.asarray(det.valid).any()

    from shape_based_object_detection_tpu.ops.nms_matrix import (
        batched_class_aware_nms_matrix,
    )

    det2 = batched_class_aware_nms_matrix(boxes, scores, classes, valid, 0.5, 4)
    assert not np.asarray(det2.valid).any()


def test_nms_single_box():
    boxes = jnp.asarray([[[0.1, 0.1, 0.5, 0.5]]])
    scores = jnp.asarray([[0.9]])
    classes = jnp.asarray([[2]], dtype=jnp.int32)
    valid = jnp.ones((1, 1), bool)
    det = N.batched_class_aware_nms(boxes, scores, classes, valid, 0.5, 3)
    v = np.asarray(det.valid[0])
    assert v.tolist() == [True, False, False]
    assert int(det.labels[0, 0]) == 2


def test_matcher_single_anchor_single_gt():
    anchors = jnp.asarray([[0.5, 0.5, 0.4, 0.4]])
    gt = jnp.asarray([[0.3, 0.3, 0.7, 0.7]])
    res = match_anchors(anchors, gt, jnp.asarray([3], jnp.int32),
                        jnp.ones(1, bool), MatchConfig(pos_threshold=0.5,
                                                       neg_threshold=0.5))
    assert int(res.cls_targets[0]) == 3  # IoU = 1 -> positive


def test_select_top_candidates_k_larger_than_pool(rng):
    boxes = jnp.asarray(rng.uniform(0, 1, (5, 4)).astype(np.float32))
    scores = jnp.asarray(rng.uniform(0, 1, (5, 2)).astype(np.float32))
    bx, sc, cl, ok = N.select_top_candidates(boxes, scores, 0.5, top_k=100)
    assert sc.shape == (10,)  # clamped to A*C
