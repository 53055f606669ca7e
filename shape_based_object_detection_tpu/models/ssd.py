"""SSD-300/512 detector (component C7, SURVEY.md §2).

Extra feature layers conv8-conv11 (+conv12 for 512) on top of the VGG trunk,
plus per-scale 3x3 loc/cls heads. One `__call__` = one XLA program producing
(B, num_priors, C+1) class logits and (B, num_priors, 4) box offsets, with the
prior ordering matching ops/anchors.ssd_anchors (cell row-major, per-cell
[ratios..., extra-sqrt-prior]).
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from shape_based_object_detection_tpu.config import ModelConfig
from shape_based_object_detection_tpu.models.vgg import VGG16Trunk, L2Norm, _round_ch
from shape_based_object_detection_tpu.ops.anchors import ssd_extra_plan as _ssd_extra_plan


class SSDExtras(nn.Module):
    """conv8_1/8_2 .. tail; returns the list of extra feature maps."""

    image_size: int
    width_mult: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        w = lambda c: _round_ch(c, self.width_mult)
        feats = []
        relu = nn.relu

        def block(x, c1, c2, stride, pad, name, kernel=3):
            x = relu(nn.Conv(c1, (1, 1), dtype=self.dtype, name=f"{name}_1")(x))
            x = relu(
                nn.Conv(c2, (kernel, kernel), strides=(stride, stride),
                        padding=((pad, pad), (pad, pad)), dtype=self.dtype,
                        name=f"{name}_2")(x)
            )
            return x

        for name, c1, c2, stride, pad, kernel in _ssd_extra_plan(self.image_size):
            x = block(x, w(c1), w(c2), stride, pad, name, kernel)
            feats.append(x)
        return feats


class SSD(nn.Module):
    """Full SSD model: trunk + extras + multibox heads."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, images: jnp.ndarray,
                 train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """images: (B, H, W, 3) normalized. Returns (cls_logits, box_offsets).
        ``train`` is accepted for train-loop uniformity; SSD has no BatchNorm
        so it is a no-op."""
        del train
        cfg = self.cfg
        dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
        x = images.astype(dtype)
        with jax.default_matmul_precision(cfg.precision):
            return self._forward(x, dtype)

    def _forward(self, x, dtype):
        cfg = self.cfg

        # ModelConfig.remat: segment-wise rematerialization (trunk stages via
        # VGG16Trunk.remat, extras as one checkpointed segment) — the SSD
        # family's counterpart of models/resnet.py per-block nn.remat, so the
        # train.py/train_cli model-remat promotion is honored here too.
        conv4_3, conv7 = VGG16Trunk(width_mult=cfg.width_mult, dtype=dtype,
                                    remat=cfg.remat, name="vgg")(x)
        conv4_3 = L2Norm(name="l2norm")(conv4_3)
        extras_cls = nn.remat(SSDExtras) if cfg.remat else SSDExtras
        extras = extras_cls(image_size=cfg.image_size, width_mult=cfg.width_mult,
                            dtype=dtype, name="extras")(conv7)
        feats = [conv4_3, conv7] + extras

        from shape_based_object_detection_tpu.ops.anchors import num_anchors_per_cell

        num_priors = [num_anchors_per_cell(cfg.anchors, i, "ssd")
                      for i in range(len(cfg.anchors.aspect_ratios))]
        assert len(feats) == len(num_priors), (
            f"{len(feats)} feature maps vs {len(num_priors)} anchor specs")

        cls_out, box_out = [], []
        c_cls = cfg.num_classes + 1  # softmax with background at index 0
        for i, (f, a) in enumerate(zip(feats, num_priors)):
            loc = nn.Conv(a * 4, (3, 3), padding=((1, 1), (1, 1)), dtype=dtype,
                          name=f"loc_{i}")(f)
            cls = nn.Conv(a * c_cls, (3, 3), padding=((1, 1), (1, 1)),
                          dtype=dtype, name=f"cls_{i}")(f)
            b, h, wdt, _ = loc.shape
            box_out.append(loc.reshape(b, h * wdt * a, 4))
            cls_out.append(cls.reshape(b, h * wdt * a, c_cls))

        cls_logits = jnp.concatenate(cls_out, axis=1).astype(jnp.float32)
        box_offsets = jnp.concatenate(box_out, axis=1).astype(jnp.float32)
        return cls_logits, box_offsets

    def feature_sizes(self) -> Tuple[int, ...]:
        from shape_based_object_detection_tpu.ops.anchors import ssd_feature_sizes

        return ssd_feature_sizes(self.cfg.image_size)
