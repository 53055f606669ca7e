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
