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


def select_candidates(
    cls_logits: jnp.ndarray,  # (B, A, K)
    box_offsets: jnp.ndarray,  # (B, A, 4)
    anchors_cxcywh: jnp.ndarray,  # (A, 4)
    cfg: ModelConfig,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Stage 1 of postprocess: exact two-stage top-k candidate selection +
    deferred decode. Returns ``(boxes_xyxy, scores, classes, valid)``, each
    ``(B, pre_nms_top_k, ...)`` with boxes clipped to [0, 1]."""
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
    return cand_boxes, cand_scores, cand_classes, cand_valid


def run_nms(
    cand_boxes: jnp.ndarray,  # (B, N, 4) xyxy in [0, 1]
    cand_scores: jnp.ndarray,  # (B, N)
    cand_classes: jnp.ndarray,  # (B, N) int32
    cand_valid: jnp.ndarray,  # (B, N) bool
    cfg: ModelConfig,
    use_pallas: bool | None = None,
) -> nms_lib.Detections:
    """Stage 2 of postprocess: class-aware NMS over a candidate set. Every
    backend selects by argmax, so candidates need not be score-sorted (the
    TTA path relies on this to concatenate two top-k sets directly)."""
    det = cfg.detect
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
    cands = select_candidates(cls_logits, box_offsets, anchors_cxcywh, cfg)
    return run_nms(*cands, cfg, use_pallas=use_pallas)


def mirror_boxes_x(boxes_xyxy: jnp.ndarray) -> jnp.ndarray:
    """Reflect normalized xyxy boxes across the vertical image midline
    (x -> 1 - x). An involution; preserves x1 <= x2 by swapping the pair."""
    return jnp.stack(
        [1.0 - boxes_xyxy[..., 2], boxes_xyxy[..., 1],
         1.0 - boxes_xyxy[..., 0], boxes_xyxy[..., 3]], axis=-1)


def postprocess_tta_hflip(
    cls_logits: jnp.ndarray,  # (2B, A, K): [original; hflipped] halves
    box_offsets: jnp.ndarray,  # (2B, A, 4)
    anchors_cxcywh: jnp.ndarray,
    cfg: ModelConfig,
    use_pallas: bool | None = None,
) -> nms_lib.Detections:
    """Merge-postprocess for hflip TTA: the first half of the batch is the
    original orientation, the second half the horizontally flipped copy.
    Each half goes through the exact two-stage candidate selection, the
    flipped half's decoded boxes are mirrored back into original
    coordinates, and one class-aware NMS runs over the union (2K
    candidates). NMS is argmax-ordered, so the concatenated set needs no
    re-sort; the output is flip-equivariant by construction (tested)."""
    b = cls_logits.shape[0] // 2
    bo, so, co, vo = select_candidates(
        cls_logits[:b], box_offsets[:b], anchors_cxcywh, cfg)
    bf, sf, cf, vf = select_candidates(
        cls_logits[b:], box_offsets[b:], anchors_cxcywh, cfg)
    merged = (jnp.concatenate([bo, mirror_boxes_x(bf)], axis=1),
              jnp.concatenate([so, sf], axis=1),
              jnp.concatenate([co, cf], axis=1),
              jnp.concatenate([vo, vf], axis=1))
    return run_nms(*merged, cfg, use_pallas=use_pallas)


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

    if cfg.detect.tta_hflip:
        @jax.jit
        def detect_tta(params, images):
            x = image_lib.normalize_images(images, mean, std)
            # One doubled-batch forward keeps the MXU batched (a second
            # sequential forward would halve utilization at small batch).
            both = jnp.concatenate([x, x[:, :, ::-1, :]], axis=0)
            cls_logits, box_offsets = module.apply(params, both)
            return postprocess_tta_hflip(cls_logits, box_offsets,
                                         anchors_cxcywh, cfg,
                                         use_pallas=use_pallas)

        return detect_tta

    @jax.jit
    def detect(params, images):
        x = image_lib.normalize_images(images, mean, std)
        cls_logits, box_offsets = module.apply(params, x)
        return postprocess(cls_logits, box_offsets, anchors_cxcywh, cfg,
                           use_pallas=use_pallas)

    return detect


def _build_scale_programs(model_cfg: ModelConfig, variables, scales,
                          data_cfg: DataConfig | None = None,
                          use_pallas: bool | None = None,
                          quantize: str = "", activation_scales=None):
    """One jitted detect() per scale, all serving the SAME param set, plus
    the jitted cross-scale merge NMS. Validates each scale's architecture
    against the shared params via ``jax.eval_shape`` (no FLOPs) — SSD's
    extras/head plan is a function of image_size, so a foreign scale either
    refuses to build or builds a different param tree; both raise a clear
    error naming the scale. Shared by :class:`MultiScaleDetector`
    (per-image, host resize) and :class:`MultiScaleBatchDetector`
    (batched eval, on-device resize).

    ``quantize`` ("", "weights", "full") builds each scale's program as the
    int8 serving tier instead of float: the weights are scale-agnostic, so
    ONE :func:`quantize.quantize_params` tree serves every scale's program
    (returned as ``serving_variables``; pass THAT to the per-scale fns).
    ``activation_scales`` (dict or JSON path) makes "full" use calibrated
    static scales; per-TENSOR activation scales have no spatial dimension,
    so scales calibrated at the base size apply at every scale — measure
    the residual drift with ``eval_cli --tta-scales ... --quantize full
    --act-scales`` (the combined best-throughput + best-accuracy tier).

    Returns ``(per_scale, merge, serving_variables)``."""
    import dataclasses

    from shape_based_object_detection_tpu.models.factory import build_module
    from shape_based_object_detection_tpu.quantize import (
        load_activation_scales, make_quantized_detect_fn,
        normalize_quantize_mode, quantize_params,
    )

    quantize = normalize_quantize_mode(quantize)
    if isinstance(activation_scales, str):
        activation_scales = load_activation_scales(activation_scales)
    if activation_scales is not None and quantize != "full":
        raise ValueError(
            "activation_scales only applies to quantize mode 'full'")

    ref_tree = jax.tree_util.tree_map(jnp.shape, variables)
    per_scale = []
    for s in scales:
        scfg = dataclasses.replace(model_cfg, image_size=s)
        module = build_module(scfg)  # params are shared across scales
        err = (
            f"multi-scale TTA: scale {s} changes the model's "
            f"parameter plan (family {model_cfg.family!r} is not "
            f"scale-agnostic — SSD's extras/heads depend on "
            f"image_size), so the shared params cannot serve it. "
            f"Use scales that preserve the plan, or a RetinaNet "
            f"config (ResNet+FPN+shared subnets work at any size).")
        try:
            abs_vars = jax.eval_shape(
                module.init, jax.random.PRNGKey(0),
                jnp.zeros((1, s, s, 3), jnp.float32))
        except Exception as e:
            raise ValueError(f"{err} (build error: {e})") from e
        if jax.tree_util.tree_map(jnp.shape, abs_vars) != ref_tree:
            raise ValueError(err)
        anchors = anchor_lib.anchors_for_model(scfg)
        if quantize:
            fn = make_quantized_detect_fn(
                module, anchors, scfg, data_cfg, use_pallas=use_pallas,
                int8_activations=(quantize == "full"),
                activation_scales=activation_scales)
        else:
            fn = make_detect_fn(module, anchors, scfg, data_cfg,
                                use_pallas=use_pallas)
        per_scale.append((fn, s))

    @jax.jit
    def merge(boxes, scores, classes, valid):
        return run_nms(boxes, scores, classes, valid, model_cfg,
                       use_pallas=use_pallas)

    serving_variables = quantize_params(variables) if quantize else variables
    return per_scale, merge, serving_variables


class MultiScaleBatchDetector:
    """Batched multi-scale TTA for evaluation (`eval_cli --tta-scales`).

    Input is the input pipeline's fixed ``(B, S, S, 3)`` uint8 batch at the
    BASE image size S; each non-base scale's jitted program resizes the
    whole canvas on-device (bilinear, ``utils.image.resize_images``) ahead
    of the shared-params forward, so the host uploads every batch exactly
    once regardless of the scale count — the TPU-first layout of the
    classic multi-scale eval loop. Per-scale detections are in normalized
    [0, 1] coordinates (scale-independent), merged by one jitted
    class-aware NMS. Because the resize covers the whole canvas, a
    letterboxed base keeps its content fraction bit-exactly at every
    scale — the per-scale rounding correction the per-image
    :class:`MultiScaleDetector` needs does not arise here.

    Caveat recorded, not hidden: for real datasets the loader already
    resized original->base on the host, so non-base scales see
    base->scale pixels (a double resample), not original->scale. On the
    synthetic capstone benchmark the originals ARE base-sized, so the
    measurement there is exact. Composes with hflip TTA via
    ``model_cfg.detect.tta_hflip`` (each scale's program doubles its
    batch internally).
    """

    def __init__(self, model_cfg: ModelConfig, variables, scales,
                 data_cfg: DataConfig | None = None,
                 use_pallas: bool | None = None,
                 quantize: str = "", activation_scales=None):
        if not scales:
            raise ValueError("scales must name at least one image size")
        self.scales = tuple(int(s) for s in scales)
        per_scale, self._merge, self.serving_variables = (
            _build_scale_programs(model_cfg, variables, self.scales,
                                  data_cfg, use_pallas,
                                  quantize=quantize,
                                  activation_scales=activation_scales))
        self._quantized = bool(quantize)
        base = model_cfg.image_size
        self._fns = []
        for fn, s in per_scale:
            if s == base:
                self._fns.append(fn)
            else:
                self._fns.append(self._with_resize(fn, s))

    @staticmethod
    def _with_resize(fn, s: int):
        @jax.jit
        def scaled(params, images):
            x = images.astype(jnp.float32)
            if images.dtype == jnp.uint8:
                x = x / 255.0  # float path: normalize_images skips /255
            return fn(params, image_lib.resize_images(x, s))

        return scaled

    def __call__(self, params, images) -> nms_lib.Detections:
        if self._quantized:
            # the quantized per-scale programs expect the QTensor tree built
            # in __init__ (self.serving_variables); a float tree here would
            # silently evaluate the float path and measure nothing
            from shape_based_object_detection_tpu.quantize import QTensor

            leaves = jax.tree_util.tree_leaves(
                params, is_leaf=lambda x: isinstance(x, QTensor))
            if not any(isinstance(l, QTensor) for l in leaves):
                raise ValueError(
                    "this MultiScaleBatchDetector was built with quantize="
                    "...; call it with .serving_variables (the quantized "
                    "tree), not the float variables")
        parts = [fn(params, images) for fn in self._fns]
        if len(parts) == 1:
            return parts[0]
        return self._merge(
            jnp.concatenate([d.boxes for d in parts], axis=1),
            jnp.concatenate([d.scores for d in parts], axis=1),
            jnp.concatenate([d.labels for d in parts], axis=1),
            jnp.concatenate([d.valid for d in parts], axis=1))


class MultiScaleDetector:
    """Multi-scale test-time augmentation (the second classic TTA axis next
    to :func:`postprocess_tta_hflip`, composable with it via
    ``model_cfg.detect.tta_hflip``).

    XLA compiles one program per static shape, so each scale is its own
    jitted detect(), with ONE set of params serving every scale when the
    architecture permits it; only the modules' traced shapes and the anchor
    grids differ. Per-scale detections land in normalized [0, 1]
    coordinates (scale-independent), so the cross-scale merge is a single
    jitted class-aware NMS over the concatenated per-scale survivor sets —
    the same argmax-ordered NMS the TTA merge uses, no re-sort needed.

    Param sharing across scales is NOT free for every family member:
    RetinaNet (ResNet+FPN+shared subnets) is scale-agnostic, but SSD's
    extras plan and head count are a function of image_size (the plan
    grows an extra block at 512, and each scale adds/removes per-scale
    head convs), so an SSD param set trained at one size cannot serve
    another. ``__init__`` validates every requested scale against the
    given params via ``jax.eval_shape`` (no FLOPs) and raises a clear
    error naming the offending scale instead of crashing inside apply.

    Host cost is one resize per scale; device cost is one forward+NMS per
    scale plus the (tiny) merge program.
    """

    def __init__(self, model_cfg: ModelConfig, variables, scales,
                 data_cfg: DataConfig | None = None,
                 use_pallas: bool | None = None, letterbox: bool = False,
                 quantize: str = "", activation_scales=None):
        if not scales:
            raise ValueError("scales must name at least one image size")
        self.scales = tuple(int(s) for s in scales)
        self.letterbox = letterbox
        # quantize != "" stores the QTensor tree — the per-scale programs
        # built below are the matching int8 tier (weights are
        # scale-agnostic, so one quantized tree serves every scale)
        self._per_scale, self._merge, self.variables = _build_scale_programs(
            model_cfg, variables, self.scales, data_cfg, use_pallas,
            quantize=quantize, activation_scales=activation_scales)

    def __call__(self, image_np) -> Tuple:
        """Arbitrary (H, W, 3) uint8 numpy image -> (boxes_px, scores,
        labels) in original pixel coordinates, merged across scales."""
        import numpy as np
        from PIL import Image

        from shape_based_object_detection_tpu.utils.image import (
            boxes_norm_to_original_px, letterbox_image_host,
        )

        h, w = image_np.shape[:2]
        parts = []
        corrections = []
        for fn, s in self._per_scale:
            if self.letterbox:
                batch = letterbox_image_host(image_np, s)[None]
                # Letterbox rounds the content size to whole pixels per
                # scale (nw = round(w*s/M)), so the content fraction nw/s
                # differs slightly across scales while the merge +
                # unprojection use ONE shared transform (x * max(h, w)).
                # Rescale each scale's boxes to the exact x/M frame
                # (factor s*w / (nw*M), identity when rounding is exact)
                # so cross-scale near-duplicates align sub-pixel for the
                # merge NMS and the shared unprojection is exact.
                m = max(h, w)
                nh = max(1, round(h * s / m))
                nw = max(1, round(w * s / m))
                cx, cy = s * w / (nw * m), s * h / (nh * m)
                corrections.append(
                    jnp.asarray([cx, cy, cx, cy], jnp.float32))
            else:
                img = Image.fromarray(image_np).resize((s, s),
                                                       Image.BILINEAR)
                batch = np.asarray(img, dtype=np.uint8)[None]
                corrections.append(None)
            parts.append(fn(self.variables, jnp.asarray(batch)))
        det = self._merge(
            jnp.concatenate([
                d.boxes if c is None else d.boxes * c
                for d, c in zip(parts, corrections)], axis=1),
            jnp.concatenate([d.scores for d in parts], axis=1),
            jnp.concatenate([d.labels for d in parts], axis=1),
            jnp.concatenate([d.valid for d in parts], axis=1))
        valid = np.asarray(det.valid[0])
        boxes = boxes_norm_to_original_px(
            np.asarray(det.boxes[0])[valid], h, w, self.letterbox)
        return (boxes, np.asarray(det.scores[0])[valid],
                np.asarray(det.labels[0])[valid])


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
