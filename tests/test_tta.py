"""Horizontal-flip test-time augmentation (detection.postprocess_tta_hflip).

TTA is a merge at the candidate level: both orientations run through the
exact two-stage selection, the flipped branch's boxes are mirrored back, and
one class-aware NMS covers the union. These tests pin the three contracts:
mirroring is an exact involution, the merge degenerates to the plain path
when either branch is empty, and the end-to-end detect fn is flip-equivariant
by construction.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from shape_based_object_detection_tpu import config as config_lib
from shape_based_object_detection_tpu.detection import (
    make_detect_fn, mirror_boxes_x, postprocess, postprocess_tta_hflip,
)
from shape_based_object_detection_tpu.models.factory import build_model

pytestmark = pytest.mark.slow  # compile-heavy; deselect with -m "not slow"


def test_mirror_boxes_is_involution(rng):
    x1 = rng.uniform(0, 0.8, (32, 1))
    y1 = rng.uniform(0, 0.8, (32, 1))
    boxes = np.concatenate(
        [x1, y1, x1 + rng.uniform(0, 0.2, (32, 1)),
         y1 + rng.uniform(0, 0.2, (32, 1))], axis=1)
    m = np.asarray(mirror_boxes_x(jnp.asarray(boxes)))
    # stays a valid box in [0,1] with x1 <= x2, same width/height
    assert (m[:, 0] <= m[:, 2]).all()
    np.testing.assert_allclose(m[:, 2] - m[:, 0], boxes[:, 2] - boxes[:, 0],
                               atol=1e-6)
    np.testing.assert_allclose(m[:, [1, 3]], boxes[:, [1, 3]], atol=0)
    np.testing.assert_allclose(
        np.asarray(mirror_boxes_x(jnp.asarray(m))), boxes, atol=1e-6)


def _toy_setup(rng, b=2, a=64, k=3, top_k=8):
    """Tiny synthetic (cls_logits, box_offsets, anchors, cfg) for direct
    postprocess tests — sigmoid scoring, no model needed."""
    cfg = config_lib.tiny_test_model("retinanet")
    cfg = dataclasses.replace(
        cfg, detect=dataclasses.replace(
            cfg.detect, use_sigmoid=True, pre_nms_top_k=top_k,
            max_detections=top_k, score_threshold=0.05))
    cxy = rng.uniform(0.2, 0.8, (a, 2))
    wh = rng.uniform(0.05, 0.2, (a, 2))
    anchors = jnp.asarray(np.concatenate([cxy, wh], 1), jnp.float32)
    logits = jnp.asarray(rng.normal(0, 2, (b, a, k)), jnp.float32)
    offsets = jnp.asarray(rng.normal(0, 0.5, (b, a, 4)), jnp.float32)
    return logits, offsets, anchors, cfg


def test_tta_merge_empty_flipped_half_is_plain(rng):
    """If the flipped branch scores nothing above threshold, TTA output ==
    plain postprocess of the original branch (merge adds nothing)."""
    logits, offsets, anchors, cfg = _toy_setup(rng)
    dead = jnp.full_like(logits, -30.0)  # sigmoid ~ 1e-13 << threshold
    cls2 = jnp.concatenate([logits, dead], 0)
    off2 = jnp.concatenate([offsets, offsets], 0)
    tta = postprocess_tta_hflip(cls2, off2, anchors, cfg)
    plain = postprocess(logits, offsets, anchors, cfg)
    np.testing.assert_array_equal(np.asarray(tta.valid),
                                  np.asarray(plain.valid))
    v = np.asarray(plain.valid)
    np.testing.assert_allclose(np.asarray(tta.boxes)[v],
                               np.asarray(plain.boxes)[v], atol=1e-6)
    np.testing.assert_allclose(np.asarray(tta.scores)[v],
                               np.asarray(plain.scores)[v], atol=1e-6)
    np.testing.assert_array_equal(np.asarray(tta.labels)[v],
                                  np.asarray(plain.labels)[v])


def test_tta_merge_empty_original_half_is_mirrored_plain(rng):
    """If the original branch is empty, TTA output == the plain detections
    of the flipped branch, mirrored back into original coordinates."""
    logits, offsets, anchors, cfg = _toy_setup(rng)
    dead = jnp.full_like(logits, -30.0)
    cls2 = jnp.concatenate([dead, logits], 0)
    off2 = jnp.concatenate([offsets, offsets], 0)
    tta = postprocess_tta_hflip(cls2, off2, anchors, cfg)
    plain = postprocess(logits, offsets, anchors, cfg)
    # mirroring doesn't change IoU relations (isometry), so the NMS
    # survivor set and order are identical
    np.testing.assert_array_equal(np.asarray(tta.valid),
                                  np.asarray(plain.valid))
    v = np.asarray(plain.valid)
    np.testing.assert_allclose(
        np.asarray(tta.boxes)[v],
        np.asarray(mirror_boxes_x(plain.boxes))[v], atol=1e-6)
    np.testing.assert_allclose(np.asarray(tta.scores)[v],
                               np.asarray(plain.scores)[v], atol=1e-6)


def test_tta_detect_flip_equivariant(rng):
    """End-to-end: detect_tta(hflip(x)) is the exact mirror of
    detect_tta(x) — the merged candidate set is mirror-symmetric by
    construction, so NMS picks the same (mirrored) survivors."""
    cfg = config_lib.get_config("tiny_retinanet")
    # score_threshold=0: the π=0.01 bias init puts a fresh model's sigmoid
    # scores (~0.01) below the serving threshold
    model_cfg = dataclasses.replace(
        cfg.model, detect=dataclasses.replace(
            cfg.model.detect, tta_hflip=True, score_threshold=0.0))
    module, variables, anchors = build_model(model_cfg)
    detect = make_detect_fn(module, anchors, model_cfg, cfg.data)

    s = model_cfg.image_size
    x = jnp.asarray(rng.integers(0, 255, (2, s, s, 3)), jnp.uint8)
    det = detect(variables, x)
    det_f = detect(variables, x[:, :, ::-1, :])

    np.testing.assert_array_equal(np.asarray(det.valid),
                                  np.asarray(det_f.valid))
    v = np.asarray(det.valid)
    assert v.any(), "random tiny model should fire some detections"
    np.testing.assert_allclose(
        np.asarray(det_f.boxes)[v],
        np.asarray(mirror_boxes_x(det.boxes))[v], atol=2e-5)
    np.testing.assert_allclose(np.asarray(det_f.scores)[v],
                               np.asarray(det.scores)[v], atol=2e-5)
    np.testing.assert_array_equal(np.asarray(det_f.labels)[v],
                                  np.asarray(det.labels)[v])
    # output contract unchanged vs the plain path
    md = model_cfg.detect.max_detections
    assert det.boxes.shape == (2, md, 4)
    assert det.scores.shape == det.labels.shape == det.valid.shape == (2, md)


def test_multiscale_single_scale_matches_detect_single_image(rng):
    """MultiScaleDetector with one scale reduces exactly to the plain
    single-image path (the merge NMS over one already-NMS'd set is a
    fixed point: survivors can't suppress each other again)."""
    from shape_based_object_detection_tpu.detection import (
        MultiScaleDetector, detect_single_image,
    )

    cfg = config_lib.get_config("tiny_retinanet")
    model_cfg = dataclasses.replace(
        cfg.model, detect=dataclasses.replace(cfg.model.detect,
                                              score_threshold=0.0))
    module, variables, anchors = build_model(model_cfg)
    img = rng.integers(0, 255, (100, 140, 3), dtype=np.uint8)

    ms = MultiScaleDetector(model_cfg, variables,
                            scales=[model_cfg.image_size], data_cfg=cfg.data)
    b_ms, s_ms, l_ms = ms(img)

    detect = make_detect_fn(module, anchors, model_cfg, cfg.data)
    b_1, s_1, l_1 = detect_single_image(detect, variables, img,
                                        model_cfg.image_size)
    assert len(b_ms) and len(b_ms) == len(b_1)
    np.testing.assert_allclose(b_ms, b_1, atol=1e-3)
    np.testing.assert_allclose(s_ms, s_1, atol=1e-6)
    np.testing.assert_array_equal(l_ms, l_1)


def test_multiscale_merges_two_scales(rng):
    """Two scales share one param set (RetinaNet is scale-agnostic); the
    merged result is a valid NMS output: scores descend, and no two
    same-class survivors overlap above the NMS threshold."""
    from shape_based_object_detection_tpu.detection import (
        MultiScaleDetector,
    )
    from shape_based_object_detection_tpu.ops.boxes import iou_matrix

    cfg = config_lib.get_config("tiny_retinanet")
    model_cfg = dataclasses.replace(
        cfg.model, detect=dataclasses.replace(cfg.model.detect,
                                              score_threshold=0.0))
    _, variables, _ = build_model(model_cfg)
    img = rng.integers(0, 255, (100, 140, 3), dtype=np.uint8)

    s0 = model_cfg.image_size
    ms = MultiScaleDetector(model_cfg, variables, scales=[s0, 2 * s0],
                            data_cfg=cfg.data)
    boxes, scores, labels = ms(img)
    assert len(boxes), "merged multi-scale detections expected"
    assert (np.diff(scores) <= 1e-6).all(), "NMS emits in score order"
    iou = np.asarray(iou_matrix(
        jnp.asarray(boxes, jnp.float32), jnp.asarray(boxes, jnp.float32)))
    same_class = labels[:, None] == labels[None, :]
    off_diag = ~np.eye(len(boxes), dtype=bool)
    thr = model_cfg.detect.nms_iou_threshold
    assert (iou[same_class & off_diag] < thr + 1e-6).all(), (
        "cross-scale duplicates must be suppressed by the merge NMS")


def test_multiscale_rejects_plan_changing_ssd_scale(rng):
    """SSD's extras/head plan is a function of image_size (ADVICE round 2):
    requesting a scale whose plan differs from the params' must raise a
    clear error at construction, not crash inside apply."""
    import pytest

    import jax
    import jax.numpy as jnp

    from shape_based_object_detection_tpu.detection import MultiScaleDetector
    from shape_based_object_detection_tpu.models.factory import build_module

    # the documented USER_GUIDE trap: --tta-scales 512 on the default
    # SSD-300 config (the extras plan grows a block at 512). Abstract
    # variables suffice — validation never touches real weights.
    cfg = config_lib.get_config("config1_ssd300_infer")
    module = build_module(cfg.model)
    abs_vars = jax.eval_shape(module.init, jax.random.PRNGKey(0),
                              jnp.zeros((1, 300, 300, 3), jnp.float32))
    with pytest.raises(ValueError, match="not\\s+scale-agnostic"):
        MultiScaleDetector(cfg.model, abs_vars, scales=[300, 512],
                           data_cfg=cfg.data)


def test_multiscale_letterbox_scales_align_subpixel(rng):
    """Letterbox content fractions round per scale; the per-scale correction
    in MultiScaleDetector.__call__ must land both scales' boxes in the same
    exact x/max(h,w) frame: running the SAME image through two different
    letterbox scales with identical params yields merged boxes whose
    unprojection matches the single-scale result within a sub-pixel."""
    from shape_based_object_detection_tpu.detection import (
        MultiScaleDetector, detect_single_image,
    )

    cfg = config_lib.get_config("tiny_retinanet")
    model_cfg = dataclasses.replace(
        cfg.model, detect=dataclasses.replace(cfg.model.detect,
                                              score_threshold=0.0))
    module, variables, anchors = build_model(model_cfg)
    # odd original size -> per-scale rounding of the content extent differs
    img = rng.integers(0, 255, (101, 143, 3), dtype=np.uint8)
    s0 = model_cfg.image_size

    ms = MultiScaleDetector(model_cfg, variables, scales=[s0],
                            data_cfg=cfg.data, letterbox=True)
    b_ms, s_ms, _ = ms(img)

    detect = make_detect_fn(module, anchors, model_cfg, cfg.data)
    b_1, s_1, _ = detect_single_image(detect, variables, img, s0,
                                      letterbox=True)
    assert len(b_ms) == len(b_1) and len(b_ms) > 0
    # single-scale path has no correction; the corrected path differs from
    # it by at most the rounding slack (< 1 original px)
    np.testing.assert_allclose(b_ms, b_1, atol=1.0)
    np.testing.assert_allclose(s_ms, s_1, atol=1e-6)


def test_tta_through_predictor(rng):
    """The serving Predictor picks tta_hflip up from the config (every
    cfg-driven path funnels through make_detect_fn): mirrored input images
    come back with mirrored pixel-space detections."""
    from shape_based_object_detection_tpu.serving import Predictor

    cfg = config_lib.get_config("tiny_retinanet")
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(
            cfg.model, detect=dataclasses.replace(
                cfg.model.detect, tta_hflip=True, score_threshold=0.0)))
    pred = Predictor(cfg, batch_size=2, min_score=0.0)
    img = rng.integers(0, 255, (96, 160, 3), dtype=np.uint8)
    out, out_f = pred.predict([img, img[:, ::-1, :]])
    assert len(out.boxes) and len(out.boxes) == len(out_f.boxes)
    w = img.shape[1]
    mirrored = np.stack(
        [w - out.boxes[:, 2], out.boxes[:, 1],
         w - out.boxes[:, 0], out.boxes[:, 3]], axis=1)
    np.testing.assert_allclose(out_f.boxes, mirrored, atol=0.05)
    np.testing.assert_allclose(out_f.scores, out.scores, atol=2e-5)


def test_multiscale_batch_single_scale_is_plain_detect(rng):
    """MultiScaleBatchDetector with only the base scale is EXACTLY the plain
    batched detect fn (no resize wrapper, no merge — same jitted program)."""
    from shape_based_object_detection_tpu.detection import (
        MultiScaleBatchDetector,
    )

    cfg = config_lib.get_config("tiny_retinanet")
    model_cfg = dataclasses.replace(
        cfg.model, detect=dataclasses.replace(cfg.model.detect,
                                              score_threshold=0.0))
    module, variables, anchors = build_model(model_cfg)
    s0 = model_cfg.image_size
    imgs = rng.integers(0, 255, (2, s0, s0, 3), dtype=np.uint8)

    ms = MultiScaleBatchDetector(model_cfg, variables, [s0], cfg.data)
    det_ms = ms(variables, jnp.asarray(imgs))
    detect = make_detect_fn(module, anchors, model_cfg, cfg.data)
    det_1 = detect(variables, jnp.asarray(imgs))
    np.testing.assert_array_equal(np.asarray(det_ms.valid),
                                  np.asarray(det_1.valid))
    np.testing.assert_allclose(np.asarray(det_ms.boxes),
                               np.asarray(det_1.boxes), atol=0)
    np.testing.assert_allclose(np.asarray(det_ms.scores),
                               np.asarray(det_1.scores), atol=0)


def test_multiscale_batch_merges_two_scales(rng):
    """Batched two-scale TTA: one uint8 upload serves both scales (the
    non-base program resizes on-device); the merged per-image output is a
    valid class-aware NMS result over the union."""
    from shape_based_object_detection_tpu.detection import (
        MultiScaleBatchDetector,
    )
    from shape_based_object_detection_tpu.ops.boxes import iou_matrix

    cfg = config_lib.get_config("tiny_retinanet")
    model_cfg = dataclasses.replace(
        cfg.model, detect=dataclasses.replace(cfg.model.detect,
                                              score_threshold=0.0))
    _, variables, _ = build_model(model_cfg)
    s0 = model_cfg.image_size
    imgs = rng.integers(0, 255, (2, s0, s0, 3), dtype=np.uint8)

    ms = MultiScaleBatchDetector(model_cfg, variables, [s0, 2 * s0],
                                 cfg.data)
    det = ms(variables, jnp.asarray(imgs))
    thr = model_cfg.detect.nms_iou_threshold
    for b in range(2):
        v = np.asarray(det.valid[b])
        assert v.any(), "merged multi-scale detections expected"
        boxes = np.asarray(det.boxes[b])[v]
        scores = np.asarray(det.scores[b])[v]
        labels = np.asarray(det.labels[b])[v]
        assert (np.diff(scores) <= 1e-6).all(), "NMS emits in score order"
        iou = np.asarray(iou_matrix(jnp.asarray(boxes, jnp.float32),
                                    jnp.asarray(boxes, jnp.float32)))
        same = labels[:, None] == labels[None, :]
        off_diag = ~np.eye(len(boxes), dtype=bool)
        assert (iou[same & off_diag] < thr + 1e-6).all(), (
            "cross-scale duplicates must be suppressed by the merge NMS")


def test_multiscale_batch_rejects_plan_changing_ssd_scale():
    """The batched class shares MultiScaleDetector's constructor-time scale
    validation (SSD's extras/head plan depends on image_size)."""
    import jax

    from shape_based_object_detection_tpu.detection import (
        MultiScaleBatchDetector,
    )
    from shape_based_object_detection_tpu.models.factory import build_module

    cfg = config_lib.get_config("config1_ssd300_infer")
    module = build_module(cfg.model)
    abs_vars = jax.eval_shape(module.init, jax.random.PRNGKey(0),
                              jnp.zeros((1, 300, 300, 3), jnp.float32))
    with pytest.raises(ValueError, match="not\\s+scale-agnostic"):
        MultiScaleBatchDetector(cfg.model, abs_vars, [300, 512], cfg.data)
