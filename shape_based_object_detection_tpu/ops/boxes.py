"""Box geometry ops (component C12, SURVEY.md §2).

Conventions
-----------
- ``xyxy``: (x_min, y_min, x_max, y_max); ``cxcywh``: (cx, cy, w, h).
- Coordinates are in [0, 1] image-fraction units unless noted (SSD family
  convention; pixel coordinates also work — the math is scale-free except
  where an image size is an explicit argument).
- All functions are pure jnp, shape-polymorphic over leading batch dims, and
  jit/vmap/grad-safe (no data-dependent control flow).

Encode/decode follow the SSD offset parameterization with variances
(Liu et al. 2016 eq. 2; the reference family uses variances (0.1, 0.2)):

  t_x = (g_cx - a_cx) / (a_w * v_c)      g_cx = a_cx + t_x * v_c * a_w
  t_w = log(g_w / a_w) / v_s             g_w  = a_w * exp(t_w * v_s)

Shape similarity (the research contribution, component C13's kernel) measures
aspect/size agreement independent of location:

  shape_sim(a, g) = exp(-(|log(w_a / w_g)| + |log(h_a / h_g)|) / tau)

which is 1 for identical shapes and decays symmetrically in log-space; the
exact reference formula was unverifiable (SURVEY.md §7) so tau parameterizes
the decay and the blend weight lives in MatchConfig.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def cxcywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) center-size -> corner form."""
    cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [cx - w / 2.0, cy - h / 2.0, cx + w / 2.0, cy + h / 2.0], axis=-1
    )


def xyxy_to_cxcywh(boxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) corner -> center-size form."""
    x0, y0, x1, y1 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [(x0 + x1) / 2.0, (y0 + y1) / 2.0, x1 - x0, y1 - y0], axis=-1
    )


def box_area(boxes_xyxy: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) -> (...,) area, clamped at 0 for degenerate boxes."""
    w = jnp.clip(boxes_xyxy[..., 2] - boxes_xyxy[..., 0], 0.0, None)
    h = jnp.clip(boxes_xyxy[..., 3] - boxes_xyxy[..., 1], 0.0, None)
    return w * h


def pairwise_intersection(a_xyxy: jnp.ndarray, b_xyxy: jnp.ndarray) -> jnp.ndarray:
    """Intersection areas between every pair: (N, 4) x (M, 4) -> (N, M).

    Also accepts leading batch dims: (..., N, 4) x (..., M, 4) -> (..., N, M).
    """
    lt = jnp.maximum(a_xyxy[..., :, None, :2], b_xyxy[..., None, :, :2])
    rb = jnp.minimum(a_xyxy[..., :, None, 2:], b_xyxy[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    return wh[..., 0] * wh[..., 1]


def iou_matrix(a_xyxy: jnp.ndarray, b_xyxy: jnp.ndarray) -> jnp.ndarray:
    """Jaccard overlap between every pair: (..., N, 4) x (..., M, 4) -> (..., N, M)."""
    inter = pairwise_intersection(a_xyxy, b_xyxy)
    area_a = box_area(a_xyxy)[..., :, None]
    area_b = box_area(b_xyxy)[..., None, :]
    union = area_a + area_b - inter
    return inter / jnp.maximum(union, _EPS)


def encode_boxes(
    gt_cxcywh: jnp.ndarray,
    anchors_cxcywh: jnp.ndarray,
    variances=(0.1, 0.2),
) -> jnp.ndarray:
    """GT boxes -> regression offsets relative to anchors. (..., 4) -> (..., 4)."""
    vc, vs = variances
    g_cxcy, g_wh = gt_cxcywh[..., :2], gt_cxcywh[..., 2:]
    a_cxcy, a_wh = anchors_cxcywh[..., :2], anchors_cxcywh[..., 2:]
    t_cxcy = (g_cxcy - a_cxcy) / (jnp.maximum(a_wh, _EPS) * vc)
    t_wh = jnp.log(jnp.maximum(g_wh, _EPS) / jnp.maximum(a_wh, _EPS)) / vs
    return jnp.concatenate([t_cxcy, t_wh], axis=-1)


def decode_boxes(
    offsets: jnp.ndarray,
    anchors_cxcywh: jnp.ndarray,
    variances=(0.1, 0.2),
) -> jnp.ndarray:
    """Regression offsets -> boxes in cxcywh. Inverse of :func:`encode_boxes`."""
    vc, vs = variances
    a_cxcy, a_wh = anchors_cxcywh[..., :2], anchors_cxcywh[..., 2:]
    g_cxcy = a_cxcy + offsets[..., :2] * vc * a_wh
    g_wh = a_wh * jnp.exp(offsets[..., 2:] * vs)
    return jnp.concatenate([g_cxcy, g_wh], axis=-1)


def shape_similarity(
    a_cxcywh: jnp.ndarray,
    b_cxcywh: jnp.ndarray,
    tau: float = 1.0,
) -> jnp.ndarray:
    """Pairwise shape similarity in (0, 1]: (..., N, 4) x (..., M, 4) -> (..., N, M).

    exp(-(|log(w_a/w_b)| + |log(h_a/h_b)|) / tau); equals 1 iff the two boxes
    have identical width and height regardless of position.
    """
    log_wh_a = jnp.log(jnp.maximum(a_cxcywh[..., 2:], _EPS))
    log_wh_b = jnp.log(jnp.maximum(b_cxcywh[..., 2:], _EPS))
    d = jnp.abs(log_wh_a[..., :, None, :] - log_wh_b[..., None, :, :]).sum(-1)
    return jnp.exp(-d / tau)


def clip_boxes(boxes_xyxy: jnp.ndarray, lo: float = 0.0, hi: float = 1.0) -> jnp.ndarray:
    """Clamp corner-form boxes into [lo, hi]."""
    return jnp.clip(boxes_xyxy, lo, hi)


def boxes_to_original(
    boxes_xyxy_norm: jnp.ndarray,
    orig_h,
    orig_w,
    letterboxed: bool = False,
) -> jnp.ndarray:
    """Map normalized boxes on the network input back to original pixel coords.

    Plain-resize mode (the family default): multiply by (W, H). Letterbox
    mode (aspect-preserving pad bottom/right): the source occupies the
    top-left max(H,W)-normalized region of the canvas, so canvas fraction f
    maps to pixel f * max(H, W), clipped to the image. Jit-safe for traced
    orig_h/orig_w.
    """
    w = jnp.asarray(orig_w, jnp.float32)
    h = jnp.asarray(orig_h, jnp.float32)
    if letterboxed:
        longest = jnp.maximum(h, w)
        boxes = boxes_xyxy_norm * longest
    else:
        boxes = boxes_xyxy_norm * jnp.stack([w, h, w, h], axis=-1)
    return jnp.stack(
        [
            jnp.clip(boxes[..., 0], 0, w),
            jnp.clip(boxes[..., 1], 0, h),
            jnp.clip(boxes[..., 2], 0, w),
            jnp.clip(boxes[..., 3], 0, h),
        ],
        axis=-1,
    )
