"""Matcher tests (component C13): torch-golden parity + invariants."""

import numpy as np
import jax.numpy as jnp
import torch

from shape_based_object_detection_tpu.config import MatchConfig
from shape_based_object_detection_tpu.ops import boxes as B
from shape_based_object_detection_tpu.ops import matching as M
from tests.golden import torch_ops as G


def _boxes(rng, n):
    cxcy = rng.uniform(0.25, 0.75, size=(n, 2))
    wh = rng.uniform(0.05, 0.35, size=(n, 2))
    return np.concatenate([cxcy - wh / 2, cxcy + wh / 2], 1).astype(np.float32)


def _anchors(rng, a):
    return np.asarray(B.xyxy_to_cxcywh(jnp.asarray(_boxes(rng, a))))


def test_matcher_iou_mode_matches_torch(rng):
    anchors = _anchors(rng, 120)
    gt = _boxes(rng, 7)
    labels = rng.integers(1, 5, size=(7,)).astype(np.int32)
    cfg = MatchConfig(pos_threshold=0.5, neg_threshold=0.4, shape_weight=0.0,
                      force_match_for_each_gt=True)

    res = M.match_anchors(
        jnp.asarray(anchors), jnp.asarray(gt), jnp.asarray(labels),
        jnp.ones(7, bool), cfg,
    )
    gold_labels, gold_g, _ = G.match_anchors(
        torch.from_numpy(anchors), torch.from_numpy(gt),
        torch.from_numpy(labels).long(), pos_t=0.5, neg_t=0.4, force_match=True,
    )
    np.testing.assert_array_equal(np.asarray(res.cls_targets), gold_labels.numpy())
    # gt assignment must agree wherever positive
    pos = np.asarray(res.positive)
    np.testing.assert_array_equal(
        np.asarray(res.matched_gt_idx)[pos], gold_g.numpy()[pos]
    )


def test_matcher_shape_mode_matches_torch(rng):
    anchors = _anchors(rng, 90)
    gt = _boxes(rng, 5)
    labels = rng.integers(1, 3, size=(5,)).astype(np.int32)
    cfg = MatchConfig(pos_threshold=0.5, neg_threshold=0.5, shape_weight=0.3,
                      shape_tau=1.0, force_match_for_each_gt=True)
    res = M.match_anchors(
        jnp.asarray(anchors), jnp.asarray(gt), jnp.asarray(labels),
        jnp.ones(5, bool), cfg,
    )
    gold_labels, _, _ = G.match_anchors(
        torch.from_numpy(anchors), torch.from_numpy(gt),
        torch.from_numpy(labels).long(), pos_t=0.5, neg_t=0.5,
        shape_weight=0.3, shape_tau=1.0, force_match=True,
    )
    np.testing.assert_array_equal(np.asarray(res.cls_targets), gold_labels.numpy())


def test_every_valid_gt_gets_an_anchor(rng):
    anchors = _anchors(rng, 200)
    gt = _boxes(rng, 6)
    labels = np.arange(1, 7, dtype=np.int32)
    cfg = MatchConfig(pos_threshold=0.99, neg_threshold=0.99)  # brutal thresholds
    res = M.match_anchors(
        jnp.asarray(anchors), jnp.asarray(gt), jnp.asarray(labels),
        jnp.ones(6, bool), cfg,
    )
    matched = set(np.asarray(res.matched_gt_idx)[np.asarray(res.positive)].tolist())
    assert matched == set(range(6))  # force-match guarantees coverage


def test_invalid_gt_never_matches(rng):
    anchors = _anchors(rng, 100)
    gt = _boxes(rng, 4)
    labels = np.full(4, 2, np.int32)
    valid = np.array([True, True, False, False])
    cfg = MatchConfig(pos_threshold=0.3, neg_threshold=0.3)
    res = M.match_anchors(
        jnp.asarray(anchors), jnp.asarray(gt), jnp.asarray(labels),
        jnp.asarray(valid), cfg,
    )
    pos_g = np.asarray(res.matched_gt_idx)[np.asarray(res.positive)]
    assert (pos_g < 2).all()


def test_no_gt_all_background():
    anchors = np.asarray([[0.5, 0.5, 0.2, 0.2], [0.3, 0.3, 0.1, 0.1]], np.float32)
    gt = np.zeros((3, 4), np.float32)
    res = M.match_anchors(
        jnp.asarray(anchors), jnp.asarray(gt),
        jnp.ones(3, jnp.int32), jnp.zeros(3, bool), MatchConfig(),
    )
    assert (np.asarray(res.cls_targets) == 0).all()
    assert not np.asarray(res.positive).any()


def test_reg_targets_decode_back_to_gt(rng):
    anchors = _anchors(rng, 150)
    gt = _boxes(rng, 3)
    labels = np.ones(3, np.int32)
    cfg = MatchConfig(pos_threshold=0.3, neg_threshold=0.3)
    res = M.match_anchors(
        jnp.asarray(anchors), jnp.asarray(gt), jnp.asarray(labels),
        jnp.ones(3, bool), cfg,
    )
    pos = np.asarray(res.positive)
    dec = B.cxcywh_to_xyxy(
        B.decode_boxes(res.reg_targets, jnp.asarray(anchors))
    )
    matched_gt = gt[np.asarray(res.matched_gt_idx)]
    np.testing.assert_allclose(np.asarray(dec)[pos], matched_gt[pos], atol=1e-4)


def test_force_match_conflict_later_gt_wins_deterministically():
    """Two valid GTs whose best anchor is the SAME anchor: the later (higher
    index) GT wins, deterministically, on both backends — .at[].set with
    duplicate indices is unspecified, so this pins the sequential-loop
    semantics the reference family uses."""
    import dataclasses

    # one anchor both GTs prefer, plus a far-away anchor
    anchors = jnp.asarray([[0.5, 0.5, 0.2, 0.2],
                           [0.05, 0.05, 0.05, 0.05]], jnp.float32)
    # both GTs overlap anchor 0 best (tiny boxes near its center), with low
    # IoU so only the force-match step assigns them
    gt = jnp.asarray([[[0.45, 0.45, 0.50, 0.50],
                       [0.50, 0.50, 0.55, 0.55]]], jnp.float32)
    labels = jnp.asarray([[3, 7]], jnp.int32)
    valid = jnp.ones((1, 2), bool)

    for backend in ("jnp", "pallas"):
        cfg = dataclasses.replace(MatchConfig(), backend=backend,
                                  force_match_for_each_gt=True)
        out = M.match_batch(anchors, gt, labels, valid, cfg)
        # anchor 0 claimed by both -> later GT (index 1, label 7) wins
        assert int(out.matched_gt_idx[0, 0]) == 1, backend
        assert int(out.cls_targets[0, 0]) == 7, backend
        # and its offsets encode GT 1 against anchor 0
        enc = np.asarray(B.encode_boxes(
            B.xyxy_to_cxcywh(gt[0, 1:2]), anchors[0:1], (0.1, 0.2)))[0]
        np.testing.assert_allclose(np.asarray(out.reg_targets[0, 0]), enc,
                                   atol=1e-6)
