"""Model construction (the public by-name builders, SURVEY.md §3.5).

``build_model(cfg_or_name)`` returns (module, params, anchors) — module is a
Flax linen Module whose __call__ compiles to a single XLA program, params are
freshly initialized (use utils/torch_convert for the torch-parity path), and
anchors are the (A, 4) normalized-cxcywh priors whose count matches the
model's flattened head output.
"""

from __future__ import annotations

from typing import Tuple, Union

import jax
import jax.numpy as jnp

from shape_based_object_detection_tpu import config as config_lib
from shape_based_object_detection_tpu.config import ModelConfig
from shape_based_object_detection_tpu.ops import anchors as anchor_lib


def build_module(cfg: ModelConfig):
    if cfg.family == "ssd":
        from shape_based_object_detection_tpu.models.ssd import SSD

        return SSD(cfg=cfg)
    if cfg.family == "retinanet":
        from shape_based_object_detection_tpu.models.retinanet import RetinaNet

        return RetinaNet(cfg=cfg)
    raise ValueError(f"unknown model family {cfg.family!r}")


def build_model(
    cfg_or_name: Union[ModelConfig, str],
    rng: jax.Array | None = None,
) -> Tuple:
    """Returns (module, params, anchors_cxcywh)."""
    if isinstance(cfg_or_name, str):
        cfg = config_lib.get_config(cfg_or_name).model
    else:
        cfg = cfg_or_name
    module = build_module(cfg)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
    params = module.init(rng, dummy)
    anchors = anchor_lib.anchors_for_model(cfg)

    # Consistency check: anchor count must equal the head's flattened length.
    num_pred = jax.eval_shape(lambda p, x: module.apply(p, x)[0], params, dummy
                              ).shape[1]
    assert anchors.shape[0] == num_pred, (
        f"anchor/head mismatch: {anchors.shape[0]} anchors vs {num_pred} predictions")
    return module, params, anchors
