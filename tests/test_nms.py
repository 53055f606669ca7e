"""NMS tests (component C16): torch-golden parity, padding invariance,
class-offset correctness."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from shape_based_object_detection_tpu.ops import nms as N
from tests.golden import torch_ops as G


def _random_candidates(rng, n):
    cxcy = rng.uniform(0.2, 0.8, size=(n, 2))
    wh = rng.uniform(0.05, 0.3, size=(n, 2))
    boxes = np.concatenate([cxcy - wh / 2, cxcy + wh / 2], 1).astype(np.float32)
    scores = rng.uniform(0.01, 1.0, size=(n,)).astype(np.float32)
    return boxes, scores


def test_nms_matches_torch_golden(rng):
    boxes, scores = _random_candidates(rng, 80)
    keep_gold = G.nms(torch.from_numpy(boxes), torch.from_numpy(scores), 0.5)
    res = N.greedy_nms(
        jnp.asarray(boxes), jnp.asarray(scores),
        jnp.ones(80, bool), 0.5, max_detections=80,
    )
    ours = np.asarray(res.indices)[np.asarray(res.valid)]
    np.testing.assert_array_equal(ours, keep_gold.numpy())


def test_nms_mask_matches_torch(rng):
    boxes, scores = _random_candidates(rng, 50)
    keep_gold = set(G.nms(torch.from_numpy(boxes), torch.from_numpy(scores), 0.45).tolist())
    mask = np.asarray(N.nms_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.45))
    assert set(np.nonzero(mask)[0].tolist()) == keep_gold


def test_nms_padding_invariance(rng):
    """Padding rows (valid=False) must not change the kept set."""
    boxes, scores = _random_candidates(rng, 30)
    pad_boxes = np.concatenate([boxes, np.zeros((20, 4), np.float32)])
    pad_scores = np.concatenate([scores, np.full(20, 5.0, np.float32)])  # high!
    valid = np.concatenate([np.ones(30, bool), np.zeros(20, bool)])

    r1 = N.greedy_nms(jnp.asarray(boxes), jnp.asarray(scores),
                      jnp.ones(30, bool), 0.5, 30)
    r2 = N.greedy_nms(jnp.asarray(pad_boxes), jnp.asarray(pad_scores),
                      jnp.asarray(valid), 0.5, 30)
    k1 = np.asarray(r1.indices)[np.asarray(r1.valid)]
    k2 = np.asarray(r2.indices)[np.asarray(r2.valid)]
    np.testing.assert_array_equal(k1, k2)


def test_class_aware_nms_equals_per_class(rng):
    """Offset-trick class-aware NMS == independent per-class NMS."""
    n = 60
    boxes, scores = _random_candidates(rng, n)
    classes = rng.integers(0, 4, size=(n,)).astype(np.int32)

    det = N.batched_class_aware_nms(
        jnp.asarray(boxes)[None], jnp.asarray(scores)[None],
        jnp.asarray(classes)[None], jnp.ones((1, n), bool),
        iou_threshold=0.5, max_detections=n,
    )
    kept = set()
    idx = np.asarray(det.indices if hasattr(det, "indices") else [])
    ours = set()
    v = np.asarray(det.valid[0])
    for b, s, c, ok in zip(np.asarray(det.boxes[0]), np.asarray(det.scores[0]),
                           np.asarray(det.labels[0]), v):
        if ok:
            ours.add((tuple(np.round(b, 5)), round(float(s), 5), int(c)))

    gold = set()
    for c in range(4):
        m = classes == c
        if m.sum() == 0:
            continue
        keep = G.nms(torch.from_numpy(boxes[m]), torch.from_numpy(scores[m]), 0.5)
        bsel, ssel = boxes[m][keep.numpy()], scores[m][keep.numpy()]
        for b, s in zip(bsel, ssel):
            gold.add((tuple(np.round(b, 5)), round(float(s), 5), c))
    assert ours == gold


def test_nms_is_jittable_static(rng):
    boxes, scores = _random_candidates(rng, 64)
    f = jax.jit(lambda b, s, v: N.greedy_nms(b, s, v, 0.5, 10))
    r = f(jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(64, bool))
    assert r.indices.shape == (10,)


def test_select_top_candidates(rng):
    a, c = 100, 5
    boxes, _ = _random_candidates(rng, a)
    scores = rng.uniform(0, 1, size=(a, c)).astype(np.float32)
    bx, sc, cl, ok = N.select_top_candidates(
        jnp.asarray(boxes), jnp.asarray(scores), score_threshold=0.5, top_k=30
    )
    assert bx.shape == (30, 4) and sc.shape == (30,)
    sc_np = np.asarray(sc)
    # top-k really is the k largest
    assert np.isclose(sc_np[0], scores.max())
    assert (np.diff(sc_np) <= 1e-6).all()
    assert (np.asarray(ok) == (sc_np > 0.5)).all()
    # class/anchor recovery is consistent
    flat = scores.reshape(-1)
    top = np.sort(flat)[::-1][:30]
    np.testing.assert_allclose(sc_np, top, atol=1e-6)


def _soft_nms_golden(boxes, scores, sigma, score_threshold, max_det):
    """Independent O(n^2) reference of Gaussian Soft-NMS (Bodla et al. 2017)."""
    boxes = boxes.copy()
    scores = scores.astype(np.float64).copy()
    alive = np.ones(len(scores), bool)
    out = []
    for _ in range(max_det):
        if not alive.any():
            break
        idx = int(np.argmax(np.where(alive, scores, -np.inf)))
        s = scores[idx]
        if s <= score_threshold:
            break
        out.append((idx, s))
        alive[idx] = False
        # IoU of selected vs everyone
        lt = np.maximum(boxes[idx, :2], boxes[:, :2])
        rb = np.minimum(boxes[idx, 2:], boxes[:, 2:])
        wh = np.clip(rb - lt, 0, None)
        inter = wh[:, 0] * wh[:, 1]
        a = (boxes[idx, 2] - boxes[idx, 0]) * (boxes[idx, 3] - boxes[idx, 1])
        b = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        iou = inter / np.maximum(a + b - inter, 1e-8)
        scores = np.where(alive, scores * np.exp(-(iou ** 2) / sigma), scores)
    return out


def test_soft_nms_matches_independent_golden(rng):
    boxes, scores = _random_candidates(rng, 60)
    sigma, thr = 0.5, 0.05
    gold = _soft_nms_golden(boxes, scores, sigma, thr, 60)

    res = N.soft_nms(jnp.asarray(boxes), jnp.asarray(scores),
                     jnp.ones(60, bool), sigma, thr, 60)
    ok = np.asarray(res.valid)
    ours_idx = np.asarray(res.indices)[ok]
    ours_sc = np.asarray(res.scores)[ok]
    gold_idx = np.asarray([g[0] for g in gold])
    gold_sc = np.asarray([g[1] for g in gold])
    np.testing.assert_array_equal(ours_idx, gold_idx)
    np.testing.assert_allclose(ours_sc, gold_sc, rtol=1e-5)


def test_soft_nms_padding_invariance(rng):
    boxes, scores = _random_candidates(rng, 30)
    pad_boxes = np.concatenate([boxes, np.zeros((10, 4), np.float32)])
    pad_scores = np.concatenate([scores, np.full(10, 9.0, np.float32)])
    valid = np.concatenate([np.ones(30, bool), np.zeros(10, bool)])
    r1 = N.soft_nms(jnp.asarray(boxes), jnp.asarray(scores),
                    jnp.ones(30, bool), 0.5, 0.05, 30)
    r2 = N.soft_nms(jnp.asarray(pad_boxes), jnp.asarray(pad_scores),
                    jnp.asarray(valid), 0.5, 0.05, 30)
    np.testing.assert_array_equal(
        np.asarray(r1.indices)[np.asarray(r1.valid)],
        np.asarray(r2.indices)[np.asarray(r2.valid)])


def test_soft_nms_sigma_zero_limit_equals_hard_for_disjoint(rng):
    """Non-overlapping boxes: soft and hard NMS keep everything, same order."""
    boxes = np.asarray([[0.0, 0.0, 0.1, 0.1],
                        [0.3, 0.3, 0.4, 0.4],
                        [0.6, 0.6, 0.7, 0.7]], np.float32)
    scores = np.asarray([0.9, 0.8, 0.7], np.float32)
    soft = N.soft_nms(jnp.asarray(boxes), jnp.asarray(scores),
                      jnp.ones(3, bool), 0.5, 0.01, 3)
    hard = N.greedy_nms(jnp.asarray(boxes), jnp.asarray(scores),
                        jnp.ones(3, bool), 0.5, 3)
    np.testing.assert_array_equal(np.asarray(soft.indices),
                                  np.asarray(hard.indices))
    np.testing.assert_allclose(np.asarray(soft.scores),
                               np.asarray(hard.scores), rtol=1e-6)


def test_class_aware_soft_nms_no_cross_class_decay(rng):
    """Identical overlapping boxes in different classes must both survive
    with undecayed scores (offset trick -> cross-class IoU 0)."""
    box = np.asarray([[0.2, 0.2, 0.6, 0.6]], np.float32)
    boxes = np.concatenate([box, box]).astype(np.float32)
    scores = np.asarray([0.9, 0.8], np.float32)
    classes = np.asarray([0, 1], np.int32)
    det = N.batched_class_aware_soft_nms(
        jnp.asarray(boxes)[None], jnp.asarray(scores)[None],
        jnp.asarray(classes)[None], jnp.ones((1, 2), bool),
        sigma=0.5, score_threshold=0.05, max_detections=2)
    assert bool(np.all(np.asarray(det.valid[0])))
    np.testing.assert_allclose(np.sort(np.asarray(det.scores[0])),
                               [0.8, 0.9], rtol=1e-6)


def test_detect_with_soft_nms_runs(rng):
    """End-to-end postprocess with soft_nms_sigma > 0 compiles and runs."""
    import dataclasses
    from shape_based_object_detection_tpu import config as config_lib
    from shape_based_object_detection_tpu.detection import postprocess
    from shape_based_object_detection_tpu.ops import anchors as anchor_lib

    cfg = config_lib.tiny_test_model("retinanet")
    cfg = dataclasses.replace(
        cfg, detect=dataclasses.replace(cfg.detect, soft_nms_sigma=0.5))
    anchors = anchor_lib.anchors_for_model(cfg)
    a = anchors.shape[0]
    cls = jnp.asarray(rng.normal(size=(2, a, cfg.num_classes)), jnp.float32)
    off = jnp.asarray(rng.normal(scale=0.1, size=(2, a, 4)), jnp.float32)
    det = postprocess(cls, off, anchors, cfg)
    assert det.boxes.shape == (2, cfg.detect.max_detections, 4)
    assert bool(np.all(np.asarray(det.scores) >= 0))


def test_two_stage_selection_equals_flat_topk(rng):
    """The two-stage (anchor-max -> pair) selection must return exactly the
    flat top-k pair set (scores identical; pairs consistent)."""
    for a, c, k in [(500, 7, 64), (100, 3, 300), (40, 5, 1000)]:
      for two_stage in (True, False):
        boxes, _ = _random_candidates(rng, a)
        scores = rng.uniform(0, 1, size=(a, c)).astype(np.float32)
        bx, sc, cl, ok = N.select_top_candidates(
            jnp.asarray(boxes), jnp.asarray(scores),
            score_threshold=0.5, top_k=k, two_stage=two_stage)
        kk = min(k, a * c)
        flat_sorted = np.sort(scores.reshape(-1))[::-1][:kk]
        np.testing.assert_allclose(np.asarray(sc), flat_sorted, atol=1e-6)
        # every returned pair's score is genuine
        got_boxes = np.asarray(bx)
        got_cls = np.asarray(cl)
        for i in range(kk):
            # find anchors whose box matches; one must carry this score
            matches = np.where(
                (np.abs(boxes - got_boxes[i]).max(axis=1) < 1e-6))[0]
            assert any(
                abs(scores[m, got_cls[i]] - float(sc[i])) < 1e-6
                for m in matches)
