"""VGG-16 SSD trunk (component C6, SURVEY.md §2).

Standard SSD surgery on VGG-16 (Liu et al. 2016 §3): conv1_1..conv4_3 with a
ceil-mode pool3 (so 300px -> 38x38 at conv4_3), a 3x3/1 pool5, dilated conv6
(d=6) and 1x1 conv7 replacing fc6/fc7. Layout is NHWC (TPU-native); all convs
use explicit torch-equivalent padding so a torch golden with identical weights
produces identical activations.

conv4_3 features pass through a learned per-channel L2Norm scale (init 20),
the family-standard trick for mixing shallow features into the detector.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn


def _round_ch(c: int, mult: float) -> int:
    return max(8, int(c * mult))


class L2Norm(nn.Module):
    """Channelwise L2 normalization with a learned scale (SSD conv4_3)."""

    init_scale: float = 20.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param(
            "scale",
            lambda key, shape: jnp.full(shape, self.init_scale, jnp.float32),
            (x.shape[-1],),
        )
        norm = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1,
                                keepdims=True) + 1e-10)
        return (x / norm.astype(x.dtype)) * scale.astype(x.dtype)


class VGG16Trunk(nn.Module):
    """Returns (conv4_3 pre-norm feature, conv7 feature).

    ``remat`` enables segment-wise rematerialization: the trunk is split into
    four checkpointed segments (stages 1-2 / stage 3 / stage 4 / stage 5 +
    conv6/conv7) via ``nn.remat`` on module-first closures, so the backward
    pass holds one segment's activations at a time instead of all of them —
    the same per-block scheme models/resnet.py uses, at VGG-stage granularity.
    Param names are unchanged (segments are plain closures over explicitly
    named child convs), so checkpoints and torch goldens are unaffected.
    """

    width_mult: float = 1.0
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        w = lambda c: _round_ch(c, self.width_mult)
        conv = lambda c, name, **kw: nn.Conv(
            c, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name=name, **kw
        )
        relu = nn.relu
        pool = lambda x: nn.max_pool(x, (2, 2), strides=(2, 2))

        def seg12(mdl, x):
            x = relu(conv(w(64), "conv1_1")(x))
            x = relu(conv(w(64), "conv1_2")(x))
            x = pool(x)
            x = relu(conv(w(128), "conv2_1")(x))
            x = relu(conv(w(128), "conv2_2")(x))
            return pool(x)

        def seg3(mdl, x):
            x = relu(conv(w(256), "conv3_1")(x))
            x = relu(conv(w(256), "conv3_2")(x))
            x = relu(conv(w(256), "conv3_3")(x))
            # pool3 is ceil-mode in the family (75 -> 38 at 300px): pad odd
            # dims. Each spatial dim independently (a non-square map may be
            # odd in only one); max_pool pads with -inf, so padding is exact
            # ceil_mode.
            ph, pw = x.shape[1] % 2, x.shape[2] % 2
            if ph or pw:
                return nn.max_pool(x, (2, 2), strides=(2, 2),
                                   padding=((0, ph), (0, pw)))
            return pool(x)

        def seg4(mdl, x):
            x = relu(conv(w(512), "conv4_1")(x))
            x = relu(conv(w(512), "conv4_2")(x))
            return relu(conv(w(512), "conv4_3")(x))

        def seg5(mdl, x):
            x = pool(x)
            x = relu(conv(w(512), "conv5_1")(x))
            x = relu(conv(w(512), "conv5_2")(x))
            x = relu(conv(w(512), "conv5_3")(x))
            # pool5: 3x3 stride 1 pad 1 (keeps spatial size)
            x = nn.max_pool(x, (3, 3), strides=(1, 1),
                            padding=((1, 1), (1, 1)))
            # conv6: 3x3 dilation 6, pad 6 (the fc6 replacement)
            x = relu(
                nn.Conv(w(1024), (3, 3), padding=((6, 6), (6, 6)),
                        kernel_dilation=(6, 6), dtype=self.dtype,
                        name="conv6")(x)
            )
            # conv7: 1x1 (the fc7 replacement)
            return relu(nn.Conv(w(1024), (1, 1), dtype=self.dtype,
                                name="conv7")(x))

        if self.remat:
            seg12, seg3, seg4, seg5 = (nn.remat(f)
                                       for f in (seg12, seg3, seg4, seg5))
        x = seg3(self, seg12(self, x))
        conv4_3 = seg4(self, x)
        x = seg5(self, conv4_3)
        return conv4_3, x
