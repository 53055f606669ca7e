"""Geometry core tests (component C12): torch-golden parity + properties."""

import numpy as np
import jax.numpy as jnp
import torch

from shape_based_object_detection_tpu.ops import boxes as B
from tests.golden import torch_ops as G


def _random_boxes_xyxy(rng, n):
    cxcy = rng.uniform(0.2, 0.8, size=(n, 2))
    wh = rng.uniform(0.05, 0.4, size=(n, 2))
    b = np.concatenate([cxcy - wh / 2, cxcy + wh / 2], axis=1)
    return b.astype(np.float32)


def test_convert_roundtrip(rng):
    b = _random_boxes_xyxy(rng, 64)
    out = np.asarray(B.cxcywh_to_xyxy(B.xyxy_to_cxcywh(jnp.asarray(b))))
    np.testing.assert_allclose(out, b, atol=1e-6)


def test_iou_matches_torch(rng):
    a = _random_boxes_xyxy(rng, 33)
    b = _random_boxes_xyxy(rng, 17)
    ours = np.asarray(B.iou_matrix(jnp.asarray(a), jnp.asarray(b)))
    gold = G.iou_matrix(torch.from_numpy(a), torch.from_numpy(b)).numpy()
    np.testing.assert_allclose(ours, gold, atol=1e-6)


def test_iou_properties(rng):
    a = _random_boxes_xyxy(rng, 20)
    m = np.asarray(B.iou_matrix(jnp.asarray(a), jnp.asarray(a)))
    # symmetry, self-IoU == 1, range [0, 1]
    np.testing.assert_allclose(m, m.T, atol=1e-6)
    np.testing.assert_allclose(np.diag(m), 1.0, atol=1e-5)
    assert (m >= 0).all() and (m <= 1.0 + 1e-6).all()


def test_disjoint_boxes_zero_iou():
    a = jnp.asarray([[0.0, 0.0, 0.1, 0.1]])
    b = jnp.asarray([[0.5, 0.5, 0.6, 0.6]])
    assert float(B.iou_matrix(a, b)[0, 0]) == 0.0


def test_encode_decode_roundtrip(rng):
    gt = B.xyxy_to_cxcywh(jnp.asarray(_random_boxes_xyxy(rng, 50)))
    anchors = B.xyxy_to_cxcywh(jnp.asarray(_random_boxes_xyxy(rng, 50)))
    off = B.encode_boxes(gt, anchors)
    rec = B.decode_boxes(off, anchors)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(gt), atol=1e-4)


def test_encode_matches_torch(rng):
    gt = _random_boxes_xyxy(rng, 40)
    an = _random_boxes_xyxy(rng, 40)
    gt_c = B.xyxy_to_cxcywh(jnp.asarray(gt))
    an_c = B.xyxy_to_cxcywh(jnp.asarray(an))
    ours = np.asarray(B.encode_boxes(gt_c, an_c))
    gold = G.encode(
        G.xyxy_to_cxcywh(torch.from_numpy(gt)),
        G.xyxy_to_cxcywh(torch.from_numpy(an)),
    ).numpy()
    # XLA-CPU vs torch libm differ by a few 1e-4 on log/div; parity bar is 1e-3
    np.testing.assert_allclose(ours, gold, rtol=1e-3, atol=5e-4)


def test_decode_matches_torch(rng):
    off = rng.normal(size=(40, 4)).astype(np.float32)
    an = B.xyxy_to_cxcywh(jnp.asarray(_random_boxes_xyxy(rng, 40)))
    ours = np.asarray(B.decode_boxes(jnp.asarray(off), an))
    gold = G.decode(torch.from_numpy(off), torch.from_numpy(np.asarray(an))).numpy()
    np.testing.assert_allclose(ours, gold, rtol=1e-3, atol=5e-4)


def test_shape_similarity_matches_torch(rng):
    a = B.xyxy_to_cxcywh(jnp.asarray(_random_boxes_xyxy(rng, 25)))
    b = B.xyxy_to_cxcywh(jnp.asarray(_random_boxes_xyxy(rng, 13)))
    ours = np.asarray(B.shape_similarity(a, b, tau=1.5))
    gold = G.shape_similarity(
        torch.from_numpy(np.asarray(a)), torch.from_numpy(np.asarray(b)), tau=1.5
    ).numpy()
    np.testing.assert_allclose(ours, gold, rtol=1e-4, atol=1e-5)


def test_shape_similarity_identity_and_translation_invariance():
    a = jnp.asarray([[0.5, 0.5, 0.2, 0.1]])
    b = jnp.asarray([[0.1, 0.9, 0.2, 0.1]])  # same shape, elsewhere
    assert float(B.shape_similarity(a, a)[0, 0]) == 1.0
    assert abs(float(B.shape_similarity(a, b)[0, 0]) - 1.0) < 1e-6
