"""End-to-end inference: the public ``detect()`` (SURVEY.md §3.2).

The whole pipeline — normalize -> backbone/heads -> decode -> score ->
class-aware NMS -> fixed-size top-k — is ONE jitted XLA program per
(model, batch-shape); no per-image host round-trips (BASELINE.json:6). The
reference runs post-processing as a per-class Python loop on the host; here
it is on-device with static shapes and a validity mask.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from shape_based_object_detection_tpu.config import ModelConfig, DataConfig
from shape_based_object_detection_tpu.ops import anchors as anchor_lib
from shape_based_object_detection_tpu.ops import boxes as box_ops
from shape_based_object_detection_tpu.ops import nms as nms_lib
from shape_based_object_detection_tpu.utils import image as image_lib


from shape_based_object_detection_tpu.utils.platform import (
    use_pallas_default as _use_pallas_default,
)


def postprocess(
    cls_logits: jnp.ndarray,  # (B, A, K)
    box_offsets: jnp.ndarray,  # (B, A, 4)
    anchors_cxcywh: jnp.ndarray,  # (A, 4)
    cfg: ModelConfig,
    use_pallas: bool | None = None,
) -> nms_lib.Detections:
    """Decode + score + class-aware NMS. Labels are 0-based foreground ids.

    On TPU the NMS suppression loop runs as the VMEM-resident Pallas kernel
    (ops/nms_pallas.py); elsewhere the lax.scan formulation is used. Both are
    numerically identical (tested)."""
    det = cfg.detect
    if det.use_sigmoid:
        # sigmoid is monotonic: select on raw logits, activate only the
        # K winners (skips a full (B, A, C) elementwise pass)
        sel_scores, activation = cls_logits, jax.nn.sigmoid
    else:
        # softmax couples classes per anchor: activate before selection
        sel_scores = jax.nn.softmax(cls_logits, axis=-1)[..., 1:]
        activation = None

    batch = cls_logits.shape[0]
    pairs = box_offsets.shape[1] * sel_scores.shape[-1]
    select = jax.vmap(
        functools.partial(
            nms_lib.select_top_candidate_pairs,
            score_threshold=det.score_threshold,
            top_k=det.pre_nms_top_k,
            approx=det.approx_topk,
            activation=activation,
            # batch-aware strategy choice (see select_top_candidate_pairs):
            # the prereduce amortizes at batch, flat top_k wins at b1
            # small-A*C
            two_stage=(pairs >= 2_000_000 or batch >= 4),
        )
    )
    anchor_idx, cand_scores, cand_classes, cand_valid = select(sel_scores)

    # Deferred decode: box decode/clip/convert is row-wise elementwise, so
    # decoding only the K selected anchors (gathered offsets + anchors) is
    # bit-identical to decoding all A anchors and gathering — and skips an
    # (B, A, 4) HBM round-trip per stage (A up to ~196k at 1024px vs K=1000).
    cand_offsets = jnp.take_along_axis(
        box_offsets, anchor_idx[..., None], axis=1)  # (B, K, 4)
    cand_anchors = anchors_cxcywh[anchor_idx]  # (B, K, 4)
    decoded = box_ops.decode_boxes(cand_offsets, cand_anchors,
                                   cfg.anchors.variances)
    cand_boxes = box_ops.clip_boxes(box_ops.cxcywh_to_xyxy(decoded))

    backend = det.nms_backend
    if use_pallas is not None:  # explicit override (tests, legacy arg)
        backend = "pallas" if use_pallas else "scan"
    if backend == "auto":
        backend = "pallas" if _use_pallas_default() else "scan"

    if det.soft_nms_sigma > 0:
        # Soft-NMS decays scores rather than suppressing; it has its own
        # scan formulation (backend choice does not apply).
        return nms_lib.batched_class_aware_soft_nms(
            cand_boxes, cand_scores, cand_classes, cand_valid,
            sigma=det.soft_nms_sigma, score_threshold=det.score_threshold,
            max_detections=det.max_detections)

    args = (cand_boxes, cand_scores, cand_classes, cand_valid)
    kwargs = dict(iou_threshold=det.nms_iou_threshold,
                  max_detections=det.max_detections)
    if backend == "pallas":
        from shape_based_object_detection_tpu.ops.nms_pallas import (
            batched_class_aware_nms_pallas,
        )

        return batched_class_aware_nms_pallas(*args, **kwargs)
    if backend == "matrix":
        from shape_based_object_detection_tpu.ops.nms_matrix import (
            batched_class_aware_nms_matrix,
        )

        return batched_class_aware_nms_matrix(*args, **kwargs)
    return nms_lib.batched_class_aware_nms(*args, **kwargs)


def make_detect_fn(module, anchors_cxcywh: jnp.ndarray, cfg: ModelConfig,
                   data_cfg: DataConfig | None = None,
                   use_pallas: bool | None = None):
    """Returns jitted detect(params, images) -> Detections.

    ``images``: (B, H, W, 3) uint8 (raw) or float (pre-normalized if
    normalize=False semantics are needed, pass uint8 — normalization happens
    on-device). H=W=cfg.image_size; resizing arbitrary inputs to that static
    shape is the input pipeline's job (host decode only).
    """
    mean = data_cfg.mean if data_cfg else image_lib.IMAGENET_MEAN
    std = data_cfg.std if data_cfg else image_lib.IMAGENET_STD

    @jax.jit
    def detect(params, images):
        x = image_lib.normalize_images(images, mean, std)
        cls_logits, box_offsets = module.apply(params, x)
        return postprocess(cls_logits, box_offsets, anchors_cxcywh, cfg,
                           use_pallas=use_pallas)

    return detect


def detect_single_image(detect_fn, params, image_np, image_size: int,
                        letterbox: bool = False) -> Tuple:
    """Convenience host wrapper: arbitrary (H, W, 3) uint8 numpy image ->
    (boxes_px, scores, labels) in original pixel coordinates.

    Host work is resize-to-static-shape only (one shape -> one compile).
    ``letterbox=True`` uses the aspect-preserving pad-bottom/right path.
    """
    import numpy as np

    h, w = image_np.shape[:2]
    # Host resize to the static network size (BILINEAR — the one filter used
    # by every serving path, so --config and --artifact detections agree).
    from PIL import Image

    from shape_based_object_detection_tpu.utils.image import (
        boxes_norm_to_original_px, letterbox_image_host,
    )

    if letterbox:
        batch = letterbox_image_host(image_np, image_size)[None]
    else:
        img = Image.fromarray(image_np).resize((image_size, image_size),
                                               Image.BILINEAR)
        batch = np.asarray(img, dtype=np.uint8)[None]
    det = detect_fn(params, jnp.asarray(batch))
    valid = np.asarray(det.valid[0])
    boxes = boxes_norm_to_original_px(
        np.asarray(det.boxes[0])[valid], h, w, letterbox)
    return boxes, np.asarray(det.scores[0])[valid], np.asarray(det.labels[0])[valid]
