"""ResNet-50/101 backbone (component C8, SURVEY.md §2).

Standard bottleneck ResNet v1 (He et al. 2015) with the torchvision-style "B"
downsampling (stride 2 in each stage's first 3x3). Returns C3, C4, C5 feature
taps for the FPN. NHWC, explicit padding matching a torch golden.

BatchNorm is frozen by default (`train_bn=False`): detection fine-tuning
freezes backbone BN statistics (standard practice, and it keeps train_step a
pure function of params). With `train_bn=True` AND a call-time `train=True`,
BN normalizes with batch statistics and updates running stats through the
mutable `batch_stats` collection (train.py threads this when
ModelConfig.train_bn is set). Eval/detect call with train=False and always
use running averages.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

STAGE_BLOCKS = {
    "resnet50": (3, 4, 6, 3),
    "resnet101": (3, 4, 23, 3),
}


class Bottleneck(nn.Module):
    channels: int  # bottleneck width; output is 4x this
    stride: int = 1
    dtype: jnp.dtype = jnp.float32
    train_bn: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        use_batch_stats = train and self.train_bn
        bn = lambda name: nn.BatchNorm(
            use_running_average=not use_batch_stats, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        out_ch = self.channels * 4
        residual = x
        y = nn.Conv(self.channels, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.relu(bn("bn1")(y))
        y = nn.Conv(self.channels, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype,
                    name="conv2")(y)
        y = nn.relu(bn("bn2")(y))
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = bn("bn3")(y)
        if residual.shape[-1] != out_ch or self.stride != 1:
            residual = nn.Conv(out_ch, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="downsample")(x)
            residual = bn("downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """Returns (C3, C4, C5) with strides (8, 16, 32)."""

    variant: str = "resnet50"
    width_mult: float = 1.0
    dtype: jnp.dtype = jnp.float32
    train_bn: bool = False
    # Per-block rematerialization (ModelConfig.remat): only each bottleneck's
    # INPUT is saved for backward; the three convs + BN inside are recomputed.
    # Same param tree (names are set explicitly), grad-identical, ~stage-sized
    # activation memory instead of whole-trunk.
    remat: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        from shape_based_object_detection_tpu.models.vgg import _round_ch

        blocks = STAGE_BLOCKS[self.variant]
        w = lambda c: _round_ch(c, self.width_mult)
        # static_argnums counts self: (self=0, x=1, train=2)
        block_cls = (nn.remat(Bottleneck, static_argnums=(2,))
                     if self.remat else Bottleneck)

        x = nn.Conv(w(64), (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not (train and self.train_bn),
                         momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        taps = []
        widths = (w(64), w(128), w(256), w(512))
        for stage, (n_blocks, ch) in enumerate(zip(blocks, widths)):
            for blk in range(n_blocks):
                stride = 2 if (blk == 0 and stage > 0) else 1
                x = block_cls(channels=ch, stride=stride, dtype=self.dtype,
                              train_bn=self.train_bn,
                              name=f"layer{stage + 1}_{blk}")(x, train)
            taps.append(x)
        return taps[1], taps[2], taps[3]  # C3, C4, C5
