"""Serving Predictor tests (fixed-batch padded inference, submit/poll)."""

import numpy as np

from shape_based_object_detection_tpu import config as config_lib
from shape_based_object_detection_tpu.serving import Predictor


def test_predictor_roundtrip(rng):
    cfg = config_lib.get_config("tiny_retinanet")
    pred = Predictor(cfg, batch_size=4, min_score=0.0)

    imgs = [
        rng.integers(0, 255, (96, 128, 3), dtype=np.uint8),
        rng.integers(0, 255, (64, 64, 3), dtype=np.uint8),
    ]
    out = pred.predict(imgs)
    assert len(out) == 2  # unpadded: only the submitted images come back
    for det, img in zip(out, imgs):
        h, w = img.shape[:2]
        assert det.boxes.shape[1] == 4 if det.boxes.size else True
        if det.boxes.size:
            assert (det.boxes[:, [0, 2]] <= w + 1e-3).all()
            assert (det.boxes[:, [1, 3]] <= h + 1e-3).all()
            assert (det.boxes >= -1e-3).all()

    # submit/poll overlap protocol
    pred.submit(imgs)
    out2 = pred.poll()
    assert len(out2) == 2


def test_predictor_chunks_large_requests(rng):
    """predict() accepts requests larger than the compiled batch (chunks
    into multiple dispatches); results match per-image single requests."""
    cfg = config_lib.get_config("tiny_retinanet")
    pred = Predictor(cfg, batch_size=2, min_score=0.0)
    imgs = [rng.integers(0, 255, (60 + 7 * i, 80, 3)).astype(np.uint8)
            for i in range(5)]
    out = pred.predict(imgs)  # 5 images through batch-2 -> 3 dispatches
    assert len(out) == 5
    solo = pred.predict([imgs[3]])[0]
    np.testing.assert_allclose(out[3].boxes, solo.boxes, atol=1e-5)
    np.testing.assert_allclose(out[3].scores, solo.scores, atol=1e-5)
