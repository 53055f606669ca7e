"""Hypothesis property tests over the geometry core (SURVEY.md §4 item 2)."""

import numpy as np
import jax.numpy as jnp
from hypothesis import given, settings, strategies as st
import hypothesis.extra.numpy as hnp

from shape_based_object_detection_tpu.ops import boxes as B
from shape_based_object_detection_tpu.ops import nms as N

_SETTINGS = dict(max_examples=25, deadline=None)


def _boxes_strategy(n):
    cxcy = hnp.arrays(np.float64, (n, 2), elements=st.floats(0.1, 0.9))
    wh = hnp.arrays(np.float64, (n, 2), elements=st.floats(0.02, 0.5))
    return st.tuples(cxcy, wh).map(
        lambda t: np.concatenate(
            [t[0] - t[1] / 2, t[0] + t[1] / 2], axis=1).astype(np.float32))


@settings(**_SETTINGS)
@given(_boxes_strategy(8))
def test_iou_symmetric_and_bounded(boxes):
    m = np.asarray(B.iou_matrix(jnp.asarray(boxes), jnp.asarray(boxes)))
    np.testing.assert_allclose(m, m.T, atol=1e-6)
    assert (m >= -1e-6).all() and (m <= 1 + 1e-6).all()
    np.testing.assert_allclose(np.diag(m), 1.0, atol=1e-5)


@settings(**_SETTINGS)
@given(_boxes_strategy(6), _boxes_strategy(6))
def test_encode_decode_inverse(gt, anchors):
    gt_c = B.xyxy_to_cxcywh(jnp.asarray(gt))
    an_c = B.xyxy_to_cxcywh(jnp.asarray(anchors))
    rec = B.decode_boxes(B.encode_boxes(gt_c, an_c), an_c)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(gt_c),
                               rtol=1e-3, atol=1e-4)


@settings(**_SETTINGS)
@given(_boxes_strategy(10),
       hnp.arrays(np.float64, (10,), elements=st.floats(0.01, 1.0)))
def test_nms_keeps_top_scorer_and_no_overlaps(boxes, scores):
    # Cast BEFORE computing the reference argmax: distinct float64 scores can
    # collapse to ties in float32 (hypothesis found 0.9999999999999999 vs 1.0),
    # and then the f64 argmax names a different element than the (stable,
    # first-index-wins) NMS tie-break over the f32 values the kernel sees.
    scores = scores.astype(np.float32)
    keep = np.asarray(N.nms_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.5))
    # the global top scorer always survives (ties: first max index, matching
    # the stable descending sort inside greedy_nms)
    assert keep[np.argmax(scores)]
    # no two kept boxes overlap >= threshold
    kept = boxes[keep]
    if len(kept) > 1:
        ious = np.array(B.iou_matrix(jnp.asarray(kept), jnp.asarray(kept)))
        np.fill_diagonal(ious, 0.0)
        assert (ious < 0.5).all()


@settings(**_SETTINGS)
@given(_boxes_strategy(6))
def test_shape_similarity_range_and_self(boxes):
    c = B.xyxy_to_cxcywh(jnp.asarray(boxes))
    sim = np.asarray(B.shape_similarity(c, c))
    assert (sim > 0).all() and (sim <= 1 + 1e-6).all()
    np.testing.assert_allclose(np.diag(sim), 1.0, atol=1e-5)


@settings(**_SETTINGS)
@given(st.integers(5, 60), st.integers(2, 9), st.integers(1, 80),
       st.integers(0, 10_000))
def test_selection_strategies_agree(a, c, k, seed):
    """Two-stage and flat candidate selection return the same top-k score
    multiset for arbitrary shapes (the exactness theorem, property-tested)."""
    rng = np.random.default_rng(seed)
    boxes = np.concatenate([rng.uniform(0.1, 0.5, (a, 2)),
                            rng.uniform(0.5, 0.9, (a, 2))], 1).astype(np.float32)
    scores = rng.uniform(0, 1, (a, c)).astype(np.float32)
    out = {}
    for two_stage in (True, False):
        _, sc, cl, ok = N.select_top_candidates(
            jnp.asarray(boxes), jnp.asarray(scores),
            score_threshold=0.3, top_k=k, two_stage=two_stage)
        out[two_stage] = (np.asarray(sc), np.asarray(ok))
    np.testing.assert_allclose(out[True][0], out[False][0], atol=1e-6)
    np.testing.assert_array_equal(out[True][1], out[False][1])


@settings(**_SETTINGS)
@given(_boxes_strategy(12), st.integers(0, 10_000))
def test_soft_nms_scores_monotone_decayed(boxes, seed):
    """Soft-NMS never raises a score: every returned score <= the candidate's
    original, and the selected sequence is non-increasing."""
    rng = np.random.default_rng(seed)
    scores = rng.uniform(0.1, 1.0, (len(boxes),)).astype(np.float32)
    res = N.soft_nms(jnp.asarray(boxes), jnp.asarray(scores),
                     jnp.ones(len(boxes), bool), sigma=0.5,
                     score_threshold=0.01, max_detections=len(boxes))
    ok = np.asarray(res.valid)
    sc = np.asarray(res.scores)[ok]
    idx = np.asarray(res.indices)[ok]
    assert (sc <= scores[idx] + 1e-6).all()
    assert (np.diff(sc) <= 1e-6).all()


def test_nms_tie_break_is_stable_first_index():
    """Regression: distinct f64 scores that collapse to a tie in f32 (found by
    hypothesis: 0.9999999999999999 vs 1.0) must resolve to the FIRST index,
    matching jnp's stable descending sort — and the pre-cast argmax must agree."""
    boxes = np.tile(np.array([[0.25, 0.25, 0.75, 0.75]], np.float32), (10, 1))
    scores64 = np.ones((10,), np.float64)
    scores64[0] = 0.9999999999999999  # < 1.0 in f64, == 1.0f in f32
    scores = scores64.astype(np.float32)
    assert (scores == scores[0]).all()  # the cast collapses the distinction
    keep = np.asarray(N.nms_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.5))
    assert keep.tolist() == [True] + [False] * 9
    assert keep[np.argmax(scores)]
