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
    nh, nw = round(h * scale), round(w * scale)
    resized = jax.image.resize(
        images.astype(jnp.float32), (b, nh, nw, c), method="bilinear"
    )
    canvas = jnp.zeros((b, size, size, c), jnp.float32)
    canvas = canvas.at[:, :nh, :nw, :].set(resized)
    return canvas, jnp.float32(scale)


def decode_image_host(path_or_bytes) -> np.ndarray:
    """Host-side JPEG/PNG decode -> (H, W, 3) uint8. The only host image op."""
    from PIL import Image
    import io

    if isinstance(path_or_bytes, (bytes, bytearray)):
        img = Image.open(io.BytesIO(path_or_bytes))
    else:
        img = Image.open(path_or_bytes)
    return np.asarray(img.convert("RGB"), dtype=np.uint8)
