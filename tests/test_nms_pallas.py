"""Pallas NMS kernel tests (interpret mode on CPU; the same kernel compiles
with Mosaic on TPU). Must match the lax.scan reference bit-for-bit."""

import numpy as np
import jax.numpy as jnp

from shape_based_object_detection_tpu.ops import nms as N
from shape_based_object_detection_tpu.ops.nms_pallas import (
    greedy_nms_pallas, batched_class_aware_nms_pallas,
)


def _candidates(rng, b, n):
    cxcy = rng.uniform(0.2, 0.8, (b, n, 2))
    wh = rng.uniform(0.05, 0.3, (b, n, 2))
    boxes = np.concatenate([cxcy - wh / 2, cxcy + wh / 2], -1).astype(np.float32)
    scores = rng.uniform(0, 1, (b, n)).astype(np.float32)
    return boxes, scores


def test_pallas_matches_scan(rng):
    b, n, k = 3, 128, 20
    boxes, scores = _candidates(rng, b, n)
    valid = np.ones((b, n), bool)
    valid[:, -10:] = False  # padding rows

    idx, sc, ok = greedy_nms_pallas(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
        0.5, k, interpret=True,
    )
    for i in range(b):
        ref = N.greedy_nms(jnp.asarray(boxes[i]), jnp.asarray(scores[i]),
                           jnp.asarray(valid[i]), 0.5, k)
        np.testing.assert_array_equal(np.asarray(ok[i]), np.asarray(ref.valid))
        m = np.asarray(ref.valid)
        np.testing.assert_array_equal(np.asarray(idx[i])[m],
                                      np.asarray(ref.indices)[m])
        np.testing.assert_allclose(np.asarray(sc[i])[m],
                                   np.asarray(ref.scores)[m], atol=1e-6)


def test_pallas_class_aware_matches_reference(rng):
    b, n, k = 2, 64, 30
    boxes, scores = _candidates(rng, b, n)
    classes = rng.integers(0, 4, (b, n)).astype(np.int32)
    valid = np.ones((b, n), bool)

    det_p = batched_class_aware_nms_pallas(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes),
        jnp.asarray(valid), 0.5, k, interpret=True,
    )
    det_r = N.batched_class_aware_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes),
        jnp.asarray(valid), 0.5, k,
    )
    np.testing.assert_array_equal(np.asarray(det_p.valid), np.asarray(det_r.valid))
    m = np.asarray(det_r.valid)
    np.testing.assert_allclose(np.asarray(det_p.boxes)[m],
                               np.asarray(det_r.boxes)[m], atol=1e-6)
    np.testing.assert_array_equal(np.asarray(det_p.labels)[m],
                                  np.asarray(det_r.labels)[m])


def test_matrix_nms_matches_reference(rng):
    """Round-based matrix NMS (third backend) == scan class-aware NMS."""
    from shape_based_object_detection_tpu.ops.nms_matrix import (
        batched_class_aware_nms_matrix,
    )

    b, n, k = 2, 64, 30
    boxes, scores = _candidates(rng, b, n)
    classes = rng.integers(0, 4, (b, n)).astype(np.int32)
    valid = np.ones((b, n), bool)
    valid[:, -7:] = False

    det_m = batched_class_aware_nms_matrix(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes),
        jnp.asarray(valid), 0.5, k,
    )
    det_r = N.batched_class_aware_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes),
        jnp.asarray(valid), 0.5, k,
    )
    np.testing.assert_array_equal(np.asarray(det_m.valid), np.asarray(det_r.valid))
    m = np.asarray(det_r.valid)
    np.testing.assert_allclose(np.asarray(det_m.boxes)[m],
                               np.asarray(det_r.boxes)[m], atol=1e-6)
    np.testing.assert_array_equal(np.asarray(det_m.labels)[m],
                                  np.asarray(det_r.labels)[m])
    np.testing.assert_allclose(np.asarray(det_m.scores)[m],
                               np.asarray(det_r.scores)[m], atol=1e-6)
