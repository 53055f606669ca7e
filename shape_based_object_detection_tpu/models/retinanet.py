"""RetinaNet detector (component C10, SURVEY.md §2).

ResNet-50/101 + FPN P3-P7 + shared 4-conv cls/box subnets (Lin et al. 2017
§4). The classification head's final bias is initialized to
-log((1-pi)/pi) with pi=0.01 so training starts with low foreground
probability (the focal-loss stabilization trick). Per-cell anchor ordering
(octave-major, ratio-minor) matches ops/anchors.retinanet_anchors.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from shape_based_object_detection_tpu.config import ModelConfig
from shape_based_object_detection_tpu.models.resnet import ResNet
from shape_based_object_detection_tpu.models.fpn import FPN

PRIOR_PROB = 0.01


class RetinaNetHead(nn.Module):
    """One shared subnet applied to every pyramid level."""

    num_outputs: int  # per-anchor outputs: C for cls, 4 for box
    num_anchors: int
    depth: int = 4
    channels: int = 256
    final_bias: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(self.depth):
            x = nn.Conv(self.channels, (3, 3), padding=((1, 1), (1, 1)),
                        dtype=self.dtype,
                        kernel_init=nn.initializers.normal(0.01),
                        name=f"conv_{i}")(x)
            x = nn.relu(x)
        x = nn.Conv(self.num_anchors * self.num_outputs, (3, 3),
                    padding=((1, 1), (1, 1)), dtype=self.dtype,
                    kernel_init=nn.initializers.normal(0.01),
                    bias_init=nn.initializers.constant(self.final_bias),
                    name="predict")(x)
        b, h, w, _ = x.shape
        return x.reshape(b, h * w * self.num_anchors, self.num_outputs)


class RetinaNet(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, images: jnp.ndarray,
                 train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """images: (B, H, W, 3) normalized. Returns (cls_logits (B,A,C),
        box_offsets (B,A,4)) — sigmoid classification, no background class.
        ``train=True`` with ``cfg.train_bn`` switches backbone BN to batch
        statistics (mutable 'batch_stats'); otherwise a no-op."""
        cfg = self.cfg
        dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
        x = images.astype(dtype)
        with jax.default_matmul_precision(cfg.precision):
            return self._forward(x, dtype, train)

    def _forward(self, x, dtype, train=False):
        cfg = self.cfg
        c3, c4, c5 = ResNet(variant=cfg.backbone, width_mult=cfg.width_mult,
                            dtype=dtype, train_bn=cfg.train_bn,
                            remat=cfg.remat, name="backbone")(x, train)
        fpn_cls = nn.remat(FPN) if cfg.remat else FPN
        pyramid = fpn_cls(out_channels=cfg.fpn_channels, dtype=dtype,
                          name="fpn")(c3, c4, c5)

        from shape_based_object_detection_tpu.ops.anchors import num_anchors_per_cell

        a = num_anchors_per_cell(cfg.anchors, 0, "retinanet")
        # With cfg.remat, each per-level head application is its own remat
        # segment: the 4-deep 256-channel subnet towers at P3 (80x80 at 640px)
        # are the largest non-backbone activations; only the pyramid inputs
        # and final predictions survive the forward.
        head_cls = nn.remat(RetinaNetHead) if cfg.remat else RetinaNetHead
        cls_head = head_cls(
            num_outputs=cfg.num_classes, num_anchors=a, depth=cfg.head_depth,
            channels=cfg.fpn_channels,
            final_bias=-math.log((1.0 - PRIOR_PROB) / PRIOR_PROB),
            dtype=dtype, name="cls_head")
        box_head = head_cls(
            num_outputs=4, num_anchors=a, depth=cfg.head_depth,
            channels=cfg.fpn_channels, dtype=dtype, name="box_head")

        cls_out = [cls_head(p) for p in pyramid]
        box_out = [box_head(p) for p in pyramid]
        cls_logits = jnp.concatenate(cls_out, axis=1).astype(jnp.float32)
        box_offsets = jnp.concatenate(box_out, axis=1).astype(jnp.float32)
        return cls_logits, box_offsets

    def feature_sizes(self) -> Tuple[int, ...]:
        from shape_based_object_detection_tpu.ops.anchors import (
            retinanet_feature_sizes,
        )

        return retinanet_feature_sizes(self.cfg.image_size, self.cfg.anchors.strides)
