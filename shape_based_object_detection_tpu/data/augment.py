"""Fused on-device augmentation (component C4, SURVEY.md §2).

The reference family runs PIL/torchvision transforms per image on the host —
its training throughput ceiling. Here the entire augmentation pipeline is one
jitted, vmapped jnp program (BASELINE.json:6 "preprocessing fuses into XLA"):

1. photometric distortion: brightness / contrast / saturation / hue, each
   applied with prob 0.5 (HSV math implemented branchless in jnp);
2. geometry: zoom-out "expand" and IoU-constrained random crop composed into a
   SINGLE sampling window per image, applied with ONE
   ``jax.image.scale_and_translate`` warp (bilinear). Candidate crop windows
   are evaluated vectorized (no rejection loop): T candidates are scored
   against the SSD IoU constraint and the first satisfying one wins;
3. horizontal flip with prob 0.5;
4. normalization (ImageNet mean/std).

Boxes ride along affinely with validity-mask updates — static shapes
throughout (MAX_BOXES padding).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from shape_based_object_detection_tpu.config import DataConfig

_NUM_CROP_TRIALS = 16
# SSD sampling modes: min-IoU constraint per mode; -1 = no crop (identity).
# numpy, NOT jnp: a module-level jnp constant initializes the JAX backend at
# import time — on the axon runtime that means creating a TPU client the
# moment anything imports the data package (observed hanging in
# make_c_api_client when the tunnel is flaky, and it breaks CPU-forcing
# callers that configure the platform after import). jnp ops consume the
# numpy array identically and it constant-folds inside jit.
import numpy as _np

_CROP_MIN_IOUS = _np.asarray([-1.0, 0.0, 0.1, 0.3, 0.5, 0.7, 0.9],
                             dtype=_np.float32)


# ---------------------------------------------------------------------------
# Color: branchless HSV <-> RGB
# ---------------------------------------------------------------------------


def rgb_to_hsv(rgb: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) in [0,1] -> (h, s, v) with h in [0,1)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    mx = jnp.max(rgb, axis=-1)
    mn = jnp.min(rgb, axis=-1)
    d = mx - mn
    safe_d = jnp.where(d > 0, d, 1.0)
    h = jnp.where(
        mx == r, (g - b) / safe_d % 6.0,
        jnp.where(mx == g, (b - r) / safe_d + 2.0, (r - g) / safe_d + 4.0),
    )
    h = jnp.where(d > 0, h / 6.0, 0.0)
    s = jnp.where(mx > 0, d / jnp.where(mx > 0, mx, 1.0), 0.0)
    return jnp.stack([h, s, mx], axis=-1)


def hsv_to_rgb(hsv: jnp.ndarray) -> jnp.ndarray:
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    h6 = (h % 1.0) * 6.0
    c = v * s
    x = c * (1.0 - jnp.abs(h6 % 2.0 - 1.0))
    m = v - c
    i = jnp.floor(h6).astype(jnp.int32) % 6
    # sector table (r,g,b): 0:(c,x,0) 1:(x,c,0) 2:(0,c,x) 3:(0,x,c) 4:(x,0,c)
    # 5:(c,0,x) — expressed as masked selects (jnp.choose lowers to a slow
    # gather; this is pure VPU)
    zero = jnp.zeros_like(c)
    in_ = lambda *ks: jnp.logical_or(i == ks[0], i == ks[1])
    r = jnp.where(in_(0, 5), c, jnp.where(in_(1, 4), x, zero))
    g = jnp.where(in_(1, 2), c, jnp.where(in_(0, 3), x, zero))
    b = jnp.where(in_(3, 4), c, jnp.where(in_(2, 5), x, zero))
    return jnp.stack([r + m, g + m, b + m], axis=-1)


def photometric_distort(rng: jax.Array, img: jnp.ndarray) -> jnp.ndarray:
    """img: (H, W, 3) float in [0,1]. SSD-style random photometric chain."""
    k = jax.random.split(rng, 8)
    apply = jax.random.uniform(k[0], (4,)) < 0.5
    # params are ALWAYS sampled in f32 (the augmentation stream is invariant
    # to the compute dtype), then cast to the image's dtype for application
    dt = img.dtype

    # brightness: +/- 32/255
    delta = jax.random.uniform(k[1], (), minval=-32.0 / 255,
                               maxval=32.0 / 255).astype(dt)
    img = jnp.where(apply[0], img + delta, img)
    # contrast: x0.5 .. x1.5
    alpha_c = jax.random.uniform(k[2], (), minval=0.5, maxval=1.5).astype(dt)
    img = jnp.where(apply[1], img * alpha_c, img)
    img = jnp.clip(img, 0.0, 1.0)
    # saturation & hue in HSV space
    hsv = rgb_to_hsv(img)
    alpha_s = jax.random.uniform(k[3], (), minval=0.5, maxval=1.5).astype(dt)
    s = jnp.where(apply[2], jnp.clip(hsv[..., 1] * alpha_s, 0, 1), hsv[..., 1])
    dh = jax.random.uniform(k[4], (), minval=-18.0 / 360,
                            maxval=18.0 / 360).astype(dt)
    h = jnp.where(apply[3], (hsv[..., 0] + dh) % 1.0, hsv[..., 0])
    img = hsv_to_rgb(jnp.stack([h, s, hsv[..., 2]], axis=-1))
    return jnp.clip(img, 0.0, 1.0)


# ---------------------------------------------------------------------------
# Geometry: expand + IoU-crop as one window, one warp
# ---------------------------------------------------------------------------


def _sample_window(rng: jax.Array, boxes: jnp.ndarray, valid: jnp.ndarray,
                   do_expand: bool, do_crop: bool) -> jnp.ndarray:
    """Returns (4,) window (x0, y0, x1, y1) in normalized source coords.

    Window > [0,1] extent = zoom-out expansion (filled with the mean color);
    window < [0,1] = crop. Identity = (0,0,1,1).
    """
    k = jax.random.split(rng, 6)
    window = jnp.asarray([0.0, 0.0, 1.0, 1.0])

    if do_expand:
        # zoom out by ratio r in [1, 4] with prob 0.5
        r = jax.random.uniform(k[0], (), minval=1.0, maxval=4.0)
        off = jax.random.uniform(k[1], (2,)) * (r - 1.0)
        expanded = jnp.asarray([-off[0], -off[1], r - off[0], r - off[1]])
        use = jax.random.uniform(k[2], ()) < 0.5
        window = jnp.where(use, expanded, window)

    if do_crop:
        # SSD IoU-constrained crop, vectorized over trials
        t = _NUM_CROP_TRIALS
        mode = jax.random.randint(k[3], (), 0, len(_CROP_MIN_IOUS))
        min_iou = jnp.asarray(_CROP_MIN_IOUS)[mode]
        kw, kxy = jax.random.split(k[4])
        wh = jax.random.uniform(kw, (t, 2), minval=0.3, maxval=1.0)
        # aspect constraint 0.5 < w/h < 2
        ar_ok = jnp.logical_and(wh[:, 0] / wh[:, 1] > 0.5,
                                wh[:, 0] / wh[:, 1] < 2.0)
        xy0 = jax.random.uniform(kxy, (t, 2)) * (1.0 - wh)
        cand = jnp.concatenate([xy0, xy0 + wh], axis=1)  # (T, 4)

        # Candidates live in WINDOW space (they compose onto the possibly-
        # expanded window below — the reference crops the expanded canvas),
        # so the constraints must score GT boxes mapped into that same
        # space; testing original-image boxes against window-space
        # candidates would validate a different region than the one taken.
        w0xy = window[:2]
        wsz2 = window[2:] - window[:2]
        boxes_w = (boxes - jnp.concatenate([w0xy, w0xy])) / jnp.concatenate(
            [wsz2, wsz2])

        # constraint: max IoU(crop, any valid gt) >= min_iou  AND at least one
        # gt center inside (so the crop keeps an object)
        from shape_based_object_detection_tpu.ops import boxes as box_ops

        iou = box_ops.iou_matrix(cand, boxes_w)  # (T, G)
        iou = jnp.where(valid[None, :], iou, -1.0)
        centers = (boxes_w[:, :2] + boxes_w[:, 2:]) / 2.0
        inside = jnp.logical_and(
            (centers[None, :, :] > cand[:, None, :2]).all(-1),
            (centers[None, :, :] < cand[:, None, 2:]).all(-1),
        )
        inside = jnp.logical_and(inside, valid[None, :])
        ok = jnp.logical_and(
            jnp.logical_and(ar_ok, (iou.max(1) >= min_iou)),
            inside.any(1),
        )
        any_ok = ok.any()
        first = jnp.argmax(ok)  # first satisfying trial
        crop = cand[first]
        no_crop = mode == 0
        use_crop = jnp.logical_and(jnp.logical_not(no_crop), any_ok)
        # Compose crop with the (possibly expanded) window: crop coords are in
        # window space.
        w0 = window[:2]
        wsz = window[2:] - window[:2]
        composed = jnp.concatenate([w0 + crop[:2] * wsz, w0 + crop[2:] * wsz])
        window = jnp.where(use_crop, composed, window)

    return window


def _warp_image(img: jnp.ndarray, window: jnp.ndarray, out_size: int,
                fill: jnp.ndarray) -> jnp.ndarray:
    """One bilinear warp: sample `window` (normalized src coords) onto a
    (out_size, out_size) canvas; outside-image regions get `fill`."""
    h, w = img.shape[0], img.shape[1]
    # output px o maps to input px: in = (o/out) * win_size * dim + win0 * dim
    # scale_and_translate semantics: in = (out - translation) / scale
    win_w = (window[2] - window[0]) * w
    win_h = (window[3] - window[1]) * h
    scale = jnp.stack([out_size / win_h, out_size / win_w])
    translation = jnp.stack([-window[1] * h * scale[0], -window[0] * w * scale[1]])
    warped = jax.image.scale_and_translate(
        img - fill, (out_size, out_size, 3), (0, 1, 2),
        jnp.concatenate([scale, jnp.ones(1)]),
        jnp.concatenate([translation, jnp.zeros(1)]),
        method="linear", antialias=False,
    )
    return warped + fill


def _transform_boxes(boxes: jnp.ndarray, valid: jnp.ndarray,
                     window: jnp.ndarray):
    """Map boxes through the window; drop boxes whose center leaves it."""
    w0 = jnp.concatenate([window[:2], window[:2]])
    wsz = jnp.concatenate([window[2:] - window[:2]] * 2)
    out = (boxes - w0) / wsz
    centers = (out[:, :2] + out[:, 2:]) / 2.0
    inside = jnp.logical_and((centers > 0.0).all(-1), (centers < 1.0).all(-1))
    out = jnp.clip(out, 0.0, 1.0)
    wh = out[:, 2:] - out[:, :2]
    nonempty = (wh > 1e-3).all(-1)
    new_valid = valid & inside & nonempty
    return jnp.where(new_valid[:, None], out, 0.0), new_valid


def _augment_one(rng: jax.Array, img_u8: jnp.ndarray, boxes: jnp.ndarray,
                 labels: jnp.ndarray, valid: jnp.ndarray, cfg: DataConfig,
                 out_size: int):
    k = jax.random.split(rng, 4)
    dtype = jnp.dtype(cfg.augment_dtype)
    img = img_u8.astype(dtype) / jnp.asarray(255.0, dtype)

    if cfg.photometric:
        img = photometric_distort(k[0], img)

    mean = jnp.asarray(cfg.mean, dtype)
    window = _sample_window(k[1], boxes, valid, cfg.expand, cfg.random_crop)
    img = _warp_image(img, window, out_size, mean)
    boxes, valid = _transform_boxes(boxes, valid, window)

    if cfg.hflip:
        flip = jax.random.uniform(k[2], ()) < 0.5
        img = jnp.where(flip, img[:, ::-1, :], img)
        flipped = jnp.stack(
            [1.0 - boxes[:, 2], boxes[:, 1], 1.0 - boxes[:, 0], boxes[:, 3]],
            axis=1,
        )
        boxes = jnp.where(flip, flipped, boxes)
        # the flip formula turns zeroed padding rows into (1, 0, 1, 0):
        # restore the invalid-rows-are-zero invariant _transform_boxes set
        boxes = jnp.where(valid[:, None], boxes, 0.0)

    std = jnp.asarray(cfg.std, dtype)
    img = (img - mean) / std
    return img, boxes, labels, valid


def augment_batch(
    rng: jax.Array,
    images_u8: jnp.ndarray,  # (B, H, W, 3) uint8, already at a static size
    boxes: jnp.ndarray,  # (B, G, 4) normalized xyxy, padded
    labels: jnp.ndarray,  # (B, G) int32
    valid: jnp.ndarray,  # (B, G) bool
    cfg: DataConfig,
    out_size: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full train-time augmentation, one fused program, vmapped over batch."""
    rngs = jax.random.split(rng, images_u8.shape[0])
    return jax.vmap(
        lambda r, i, b, l, v: _augment_one(r, i, b, l, v, cfg, out_size)
    )(rngs, images_u8, boxes, labels, valid)


# NOTE: there is deliberately no eval-time preprocessing helper here — the
# inference paths (detect_single_image, serving.prepare_batch, eval_cli) do
# their geometry on the host via utils.image (square or letterbox per
# DataConfig.letterbox) and normalize inside the jitted detect() program. A
# device-side square-resize helper used to live here; it ignored the
# letterbox config and had no production callers, so it was removed rather
# than left as a geometry trap (round-2 review finding).
