"""Feature Pyramid Network neck (component C9, SURVEY.md §2).

RetinaNet-style FPN (Lin et al. 2017): lateral 1x1 on C3-C5, top-down
nearest-neighbor upsample + add, 3x3 smoothing, plus P6 (3x3/2 on C5) and
P7 (ReLU + 3x3/2 on P6). Upsampling uses broadcast-reshape nearest (exact 2x),
which XLA fuses; `jax.image.resize` handles ragged shapes.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def nearest_upsample_to(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    b, xh, xw, c = x.shape
    if h == 2 * xh and w == 2 * xw:
        # exact 2x: broadcast trick (cheaper than gather-based resize)
        y = jnp.broadcast_to(x[:, :, None, :, None, :], (b, xh, 2, xw, 2, c))
        return y.reshape(b, h, w, c)
    return jax.image.resize(x, (b, h, w, c), method="nearest")


class FPN(nn.Module):
    out_channels: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, c3: jnp.ndarray, c4: jnp.ndarray, c5: jnp.ndarray
                 ) -> List[jnp.ndarray]:
        ch = self.out_channels
        lat = lambda i, x: nn.Conv(ch, (1, 1), dtype=self.dtype,
                                   name=f"lateral_{i}")(x)
        smooth = lambda i, x: nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)),
                                      dtype=self.dtype, name=f"smooth_{i}")(x)

        p5 = lat(5, c5)
        p4 = lat(4, c4) + nearest_upsample_to(p5, c4.shape[1], c4.shape[2])
        p3 = lat(3, c3) + nearest_upsample_to(p4, c3.shape[1], c3.shape[2])
        p3, p4, p5 = smooth(3, p3), smooth(4, p4), smooth(5, p5)

        p6 = nn.Conv(ch, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                     dtype=self.dtype, name="p6")(c5)
        p7 = nn.Conv(ch, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                     dtype=self.dtype, name="p7")(nn.relu(p6))
        return [p3, p4, p5, p6, p7]
