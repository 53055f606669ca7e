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


def test_bucketed_predictor_matches_fixed(rng):
    """Batch-size bucketing is invisible to results: padding a request to
    the smallest fitting bucket returns the same detections as padding to
    the full compiled batch (per-image independence of the program)."""
    cfg = config_lib.get_config("tiny_retinanet")
    imgs = [rng.integers(0, 255, (60 + 7 * i, 80, 3)).astype(np.uint8)
            for i in range(3)]
    fixed = Predictor(cfg, batch_size=4)
    bucketed = Predictor(cfg, batch_size=4, bucket_sizes=(1, 2, 4))
    bucketed.warmup()
    for n in (1, 3):
        a = fixed.predict(imgs[:n])
        b = bucketed.predict(imgs[:n])
        assert len(a) == len(b) == n
        for da, db in zip(a, b):
            np.testing.assert_array_equal(da.boxes, db.boxes)
            np.testing.assert_array_equal(da.scores, db.scores)
            np.testing.assert_array_equal(da.labels, db.labels)


def test_submit_poll_fifo_two_in_flight(rng):
    """Two batches may be in flight at once (the HTTP batcher's
    double-buffering contract); poll() returns them in submit order."""
    cfg = config_lib.get_config("tiny_retinanet")
    pred = Predictor(cfg, batch_size=2)
    a = rng.integers(0, 255, (50, 70, 3)).astype(np.uint8)
    b = rng.integers(0, 255, (90, 40, 3)).astype(np.uint8)
    pred.submit([a])
    pred.submit([b, b])
    first = pred.poll()
    second = pred.poll()
    assert len(first) == 1 and len(second) == 2
    ref = pred.predict([a])[0]
    np.testing.assert_array_equal(first[0].boxes, ref.boxes)


def test_prepare_batch_preresized_pair(rng):
    """The ((S,S,3), (h,w)) fast-path item: boxes map back to the supplied
    ORIGINAL size, not the resized canvas (the HTTP server's ingest)."""
    from shape_based_object_detection_tpu.serving import prepare_batch

    size = config_lib.get_config("tiny_retinanet").model.image_size
    resized = rng.integers(0, 255, (size, size, 3)).astype(np.uint8)
    batch, sizes = prepare_batch([(resized, (480, 640))], size, 2)
    assert batch.shape[0] == 2 and sizes == [(480, 640)]
    np.testing.assert_array_equal(batch[0], resized)


def test_prepare_batch_preresized_rejects_bad_items(rng):
    """Wrong shape or non-uint8 dtype in the pre-resized fast path raises
    (real errors, not asserts: a float array must never be silently
    value-truncated into the uint8 batch)."""
    import pytest

    from shape_based_object_detection_tpu.serving import prepare_batch

    size = 32
    ok = rng.integers(0, 255, (size, size, 3)).astype(np.uint8)
    with pytest.raises(ValueError, match="shape"):
        prepare_batch([(ok[:16], (10, 10))], size, 1)
    with pytest.raises(ValueError, match="uint8"):
        prepare_batch([(ok.astype(np.float32), (10, 10))], size, 1)
    batch, sizes = prepare_batch([(ok, (10, 20))], size, 1)
    np.testing.assert_array_equal(batch[0], ok)
    assert sizes == [(10, 20)]
