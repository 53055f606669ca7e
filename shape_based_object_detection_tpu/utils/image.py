"""Image preprocessing that runs on-device inside jit (BASELINE.json:6 —
"image preprocessing fuses into XLA so host-side PIL/torchvision transforms
disappear"). Host code only decodes bytes; everything after is jnp.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize_images(
    images: jnp.ndarray,
    mean: Tuple[float, float, float] = IMAGENET_MEAN,
    std: Tuple[float, float, float] = IMAGENET_STD,
) -> jnp.ndarray:
    """uint8/float (B, H, W, 3) -> float32 normalized. Jit-safe."""
    x = images.astype(jnp.float32)
    if images.dtype == jnp.uint8:
        x = x / 255.0
    m = jnp.asarray(mean, jnp.float32)
    s = jnp.asarray(std, jnp.float32)
    return (x - m) / s


def resize_images(images: jnp.ndarray, size: int) -> jnp.ndarray:
    """Bilinear resize (B, H, W, 3) -> (B, size, size, 3), on device."""
    b, _, _, c = images.shape
    return jax.image.resize(
        images.astype(jnp.float32), (b, size, size, c), method="bilinear"
    )


def letterbox_images(images: jnp.ndarray, size: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Aspect-preserving resize into a size x size canvas (pad bottom/right).

    All images in the batch share a static (H, W), so the scale is static too.
    Returns (canvas, scale) where boxes map as box_canvas = box_px * scale / size.
    """
    b, h, w, c = images.shape
    scale = size / max(h, w)
    # max(1, ...) mirrors letterbox_image_host: extreme aspect ratios must
    # not round the short side down to a zero-sized resize target.
    nh, nw = max(1, round(h * scale)), max(1, round(w * scale))
    resized = jax.image.resize(
        images.astype(jnp.float32), (b, nh, nw, c), method="bilinear"
    )
    canvas = jnp.zeros((b, size, size, c), jnp.float32)
    canvas = canvas.at[:, :nh, :nw, :].set(resized)
    return canvas, jnp.float32(scale)


def letterbox_image_host(img: np.ndarray, size: int) -> np.ndarray:
    """Host-side counterpart of :func:`letterbox_images` for the per-sample
    decode path: aspect-preserving BILINEAR resize into the top-left of a
    zero (size, size, 3) uint8 canvas (pad bottom/right).

    Normalized canvas coordinates for a pixel box are box_px / max(H, W)
    (the inverse of ops.boxes.boxes_to_original(letterboxed=True)).
    """
    from PIL import Image

    h, w = img.shape[:2]
    scale = size / max(h, w)
    nh, nw = max(1, round(h * scale)), max(1, round(w * scale))
    resized = np.asarray(
        Image.fromarray(img).resize((nw, nh), Image.BILINEAR), np.uint8)
    canvas = np.zeros((size, size, 3), np.uint8)
    canvas[:nh, :nw] = resized
    return canvas


def boxes_px_to_input_norm(boxes_px: np.ndarray, h: int, w: int,
                           letterbox: bool = False) -> np.ndarray:
    """Pixel xyxy boxes -> normalized coords in the network-input frame.

    Square-resize mode divides by (W, H); letterbox mode divides by
    max(H, W) (the content occupies the top-left fraction of the canvas).
    Out-of-bounds annotations (present in real VOC/COCO files) are clipped
    to the IMAGE-CONTENT extent in both modes — in letterbox mode that is
    (w, h)/max(h, w), not the full canvas, so a too-wide annotation never
    extends a training target into the zero padding.
    """
    if letterbox:
        m = np.float32(max(h, w))
        ext = np.array([w, h, w, h], np.float32) / m
        return np.clip(boxes_px / m, 0.0, ext)
    out = boxes_px / np.array([w, h, w, h], np.float32)
    return np.clip(out, 0.0, 1.0)


def boxes_norm_to_original_px(boxes_norm: np.ndarray, h: int, w: int,
                              letterbox: bool = False) -> np.ndarray:
    """Numpy inverse of :func:`boxes_px_to_input_norm` (host post-process),
    clipped to the original image bounds. Mirrors
    ops.boxes.boxes_to_original."""
    if letterbox:
        boxes = boxes_norm * np.float32(max(h, w))
    else:
        boxes = boxes_norm * np.array([w, h, w, h], np.float32)
    return np.stack([
        np.clip(boxes[..., 0], 0, w),
        np.clip(boxes[..., 1], 0, h),
        np.clip(boxes[..., 2], 0, w),
        np.clip(boxes[..., 3], 0, h),
    ], axis=-1)


def decode_image_host(path_or_bytes) -> np.ndarray:
    """Host-side JPEG/PNG decode -> (H, W, 3) uint8. The only host image op."""
    from PIL import Image
    import io

    if isinstance(path_or_bytes, (bytes, bytearray)):
        img = Image.open(io.BytesIO(path_or_bytes))
    else:
        img = Image.open(path_or_bytes)
    return np.asarray(img.convert("RGB"), dtype=np.uint8)


def effective_decode_backend(backend: str = "auto") -> str:
    """Resolve a DataConfig.decode_backend value to what will actually run
    on this host: "native" (csrc/jpeg_decoder.cpp built and loadable) or
    "pil". The resolved value participates in the sample-cache fingerprint —
    the two backends produce slightly different pixels (DCT-domain prescale
    vs full decode), so caches must not be shared across them."""
    if backend == "pil":
        return "pil"
    if backend not in ("auto", "native"):
        raise ValueError(f"decode_backend must be auto|native|pil: {backend!r}")
    from shape_based_object_detection_tpu.utils.native import load_image_lib

    if load_image_lib() is not None:
        return "native"
    if backend == "native":
        # "native" is an assertion that the C path runs — a silent PIL
        # fallback here would quietly change pixels (and the cache key)
        raise RuntimeError(
            "decode_backend='native' but csrc/jpeg_decoder.cpp did not "
            "build/load (needs g++ and libjpeg); use 'auto' to allow the "
            "PIL fallback")
    return "pil"


def load_resized_image_host(path_or_bytes, size: int, letterbox: bool = False,
                            backend: str = "auto"):
    """Fused host decode + resize -> ((S, S, 3) uint8, orig_h, orig_w).

    JPEG inputs take the first-party C path (csrc/jpeg_decoder.cpp: libjpeg
    DCT-domain prescale + PIL-equivalent triangle resample, GIL released)
    unless ``backend="pil"``; PNG/other formats and any bytes the C path
    rejects fall back to PIL + :func:`letterbox_image_host` / square
    BILINEAR resize. This is the per-sample hot path of every dataset
    (SURVEY.md §2 C4: the reference's host work is PIL/libjpeg decode)."""
    data = None
    if isinstance(path_or_bytes, (bytes, bytearray)):
        data = bytes(path_or_bytes)
    elif backend != "pil":
        with open(path_or_bytes, "rb") as f:
            data = f.read()
    if backend != "pil" and data is not None and data[:2] == b"\xff\xd8":
        from shape_based_object_detection_tpu.utils.native import (
            decode_jpeg_resize_native,
        )

        r = decode_jpeg_resize_native(data, size, letterbox)
        if r is not None:
            return r
    from PIL import Image

    img = decode_image_host(data if data is not None else path_or_bytes)
    h, w = img.shape[:2]
    if letterbox:
        out = letterbox_image_host(img, size)
    else:
        out = np.asarray(
            Image.fromarray(img).resize((size, size), Image.BILINEAR),
            np.uint8)
    return out, h, w
