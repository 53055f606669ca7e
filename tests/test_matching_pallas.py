"""Pallas match-reduction kernel (ops/matching_pallas.py) vs the dense-jnp
matcher: identical assignments (indices exactly, qualities to float tolerance)
across shapes, shape_weight settings, validity patterns, and ties. Runs the
kernel in interpret mode on the CPU test mesh."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shape_based_object_detection_tpu.config import MatchConfig
from shape_based_object_detection_tpu.ops import matching
from shape_based_object_detection_tpu.ops.matching_pallas import (
    match_reductions_pallas,
)


def _random_case(seed, b, a, g, valid_frac=0.4):
    rng = np.random.default_rng(seed)
    anchors = np.stack([
        rng.uniform(0.1, 0.9, (a,)), rng.uniform(0.1, 0.9, (a,)),
        rng.uniform(0.02, 0.5, (a,)), rng.uniform(0.02, 0.5, (a,)),
    ], axis=1).astype(np.float32)
    gt = np.sort(rng.uniform(0, 1, (b, g, 2, 2)), axis=2)
    gt = gt.transpose(0, 1, 3, 2).reshape(b, g, 4).astype(np.float32)
    labels = rng.integers(1, 21, (b, g)).astype(np.int32)
    valid = rng.uniform(size=(b, g)) < valid_frac
    if b > 1:
        valid[1] = False  # one sample with zero valid GTs
    return (jnp.asarray(anchors), jnp.asarray(gt), jnp.asarray(labels),
            jnp.asarray(valid))


def _jnp_reductions(anchors, gt, valid, cfg):
    def one(gt_b, valid_b):
        q = matching._quality_matrix(anchors, gt_b, valid_b, cfg)
        return (jnp.max(q, axis=1), jnp.argmax(q, axis=1).astype(jnp.int32),
                jnp.argmax(q, axis=0).astype(jnp.int32))

    return jax.vmap(one)(gt, valid)


@pytest.mark.parametrize("shape_weight", [0.0, 0.6])
@pytest.mark.parametrize("b,a,g", [(2, 700, 33), (1, 100, 5), (3, 1200, 100)])
def test_reductions_match_dense(shape_weight, b, a, g):
    from shape_based_object_detection_tpu.ops import boxes as box_ops

    cfg = MatchConfig(shape_weight=shape_weight, shape_tau=2.0)
    anchors, gt, labels, valid = _random_case(7, b, a, g)
    bq, bg, ga, lbl, reg = match_reductions_pallas(
        anchors, gt, labels, valid, shape_weight=shape_weight, tau=2.0,
        interpret=True)
    rq, rg, ra = _jnp_reductions(anchors, gt, valid, cfg)
    np.testing.assert_allclose(np.asarray(bq), np.asarray(rq), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(bg), np.asarray(rg))
    # per-GT argmax only matters for valid GTs (epilogue drops the rest)
    np.testing.assert_array_equal(np.asarray(ga)[np.asarray(valid)],
                                  np.asarray(ra)[np.asarray(valid)])
    # matched values == gathered values
    ref_lbl = jnp.take_along_axis(labels, rg, axis=1)
    np.testing.assert_array_equal(np.asarray(lbl), np.asarray(ref_lbl))
    gtc = box_ops.xyxy_to_cxcywh(gt)
    ref_boxes = jnp.take_along_axis(gtc, rg[..., None], axis=1)
    ref_reg = box_ops.encode_boxes(ref_boxes, anchors[None], (0.1, 0.2))
    np.testing.assert_allclose(np.asarray(reg), np.asarray(ref_reg),
                               atol=1e-5)


def test_full_match_batch_backends_agree():
    cfg = MatchConfig(pos_threshold=0.5, neg_threshold=0.4, shape_weight=0.3,
                      force_match_for_each_gt=True)
    anchors, gt, labels, valid = _random_case(11, 4, 900, 40)
    ref = matching.match_batch(anchors, gt, labels, valid,
                               dataclasses.replace(cfg, backend="jnp"))
    out = matching.match_batch(anchors, gt, labels, valid,
                               dataclasses.replace(cfg, backend="pallas"))
    np.testing.assert_array_equal(np.asarray(out.matched_gt_idx),
                                  np.asarray(ref.matched_gt_idx))
    np.testing.assert_array_equal(np.asarray(out.cls_targets),
                                  np.asarray(ref.cls_targets))
    np.testing.assert_array_equal(np.asarray(out.positive),
                                  np.asarray(ref.positive))
    np.testing.assert_allclose(np.asarray(out.reg_targets),
                               np.asarray(ref.reg_targets), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.quality),
                               np.asarray(ref.quality), atol=1e-6)


def test_ties_break_identically():
    # duplicate GTs and duplicate anchors force max-quality ties everywhere
    anchors = jnp.asarray(
        np.tile(np.array([[0.5, 0.5, 0.2, 0.2]], np.float32), (256, 1)))
    gt = jnp.asarray(
        np.tile(np.array([[[0.4, 0.4, 0.6, 0.6]]], np.float32), (1, 10, 1)))
    labels = jnp.ones((1, 10), jnp.int32)
    valid = jnp.ones((1, 10), bool)
    cfg = MatchConfig(shape_weight=0.5)
    bq, bg, ga, _, _ = match_reductions_pallas(anchors, gt, labels, valid,
                                               shape_weight=0.5,
                                               interpret=True)
    rq, rg, ra = _jnp_reductions(anchors, gt, valid, cfg)
    np.testing.assert_array_equal(np.asarray(bg), np.asarray(rg))
    np.testing.assert_array_equal(np.asarray(ga), np.asarray(ra))
    np.testing.assert_allclose(np.asarray(bq), np.asarray(rq), atol=1e-7)


def test_all_invalid_sample_matches_dense():
    cfg = MatchConfig()
    anchors, gt, labels, valid = _random_case(3, 2, 600, 20, valid_frac=0.0)
    ref = matching.match_batch(anchors, gt, labels, valid,
                               dataclasses.replace(cfg, backend="jnp"))
    out = matching.match_batch(anchors, gt, labels, valid,
                               dataclasses.replace(cfg, backend="pallas"))
    assert not bool(np.asarray(out.positive).any())
    np.testing.assert_array_equal(np.asarray(out.cls_targets),
                                  np.asarray(ref.cls_targets))


def test_duplicate_gt_same_anchor_consistent():
    """Two valid GTs with identical boxes but different labels claim the SAME
    anchor in the force-match scatter. Whatever winner the conflict resolves
    to, the patched label/offsets must describe that same winner (internally
    consistent), and both backends must agree exactly."""
    anchors = jnp.asarray(np.array(
        [[0.5, 0.5, 0.2, 0.2], [0.2, 0.2, 0.1, 0.1], [0.8, 0.8, 0.3, 0.3],
         [0.3, 0.7, 0.15, 0.15]] * 64, np.float32))
    dup = np.array([0.45, 0.45, 0.55, 0.55], np.float32)
    gt = jnp.asarray(np.stack([np.stack([dup, dup, [0.1, 0.1, 0.3, 0.3]])]))
    labels = jnp.asarray(np.array([[3, 7, 1]], np.int32))
    valid = jnp.ones((1, 3), bool)
    cfg = MatchConfig(pos_threshold=0.5, neg_threshold=0.4,
                      force_match_for_each_gt=True)
    out = {}
    for backend in ("jnp", "pallas"):
        out[backend] = matching.match_batch(
            anchors, gt, labels, valid,
            dataclasses.replace(cfg, backend=backend))
    for field in ("matched_gt_idx", "cls_targets", "positive"):
        np.testing.assert_array_equal(
            np.asarray(getattr(out["pallas"], field)),
            np.asarray(getattr(out["jnp"], field)), err_msg=field)
    np.testing.assert_allclose(np.asarray(out["pallas"].reg_targets),
                               np.asarray(out["jnp"].reg_targets), atol=1e-6)
    # internal consistency: the positive anchor claimed by the duplicate GTs
    # carries the label of the GT recorded in matched_gt_idx
    for backend in ("jnp", "pallas"):
        r = out[backend]
        idx = np.asarray(r.matched_gt_idx)[0]
        cls = np.asarray(r.cls_targets)[0]
        pos = np.asarray(r.positive)[0]
        lab = np.asarray(labels)[0]
        assert (cls[pos] == lab[idx[pos]]).all(), backend
