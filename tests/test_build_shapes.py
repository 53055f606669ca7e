"""Wiring checks for every production model config via eval_shape (no
compile/execute — catches anchor/head mismatches across the whole zoo fast)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shape_based_object_detection_tpu import config as config_lib
from shape_based_object_detection_tpu.models.factory import build_module
from shape_based_object_detection_tpu.ops import anchors as anchor_lib


@pytest.mark.parametrize("model_cfg,expected_anchors", [
    (config_lib.SSD300, 8732),
    (config_lib.SSD512, 24564),
    (config_lib.RETINANET_R50_512, 49104),
    (config_lib.RETINANET_R101, None),
])
def test_model_head_matches_anchors(model_cfg, expected_anchors):
    module = build_module(model_cfg)
    anchors = anchor_lib.anchors_for_model(model_cfg)
    if expected_anchors is not None:
        assert anchors.shape[0] == expected_anchors

    s = model_cfg.image_size
    dummy = jnp.zeros((1, s, s, 3), jnp.float32)
    variables = jax.eval_shape(
        lambda: module.init(jax.random.PRNGKey(0), dummy))
    cls_shape, box_shape = jax.eval_shape(
        lambda v: module.apply(v, dummy), variables)
    assert cls_shape.shape[1] == anchors.shape[0]
    assert box_shape.shape == (1, anchors.shape[0], 4)
    k = model_cfg.num_classes + (1 if model_cfg.family == "ssd" else 0)
    assert cls_shape.shape[2] == k


def test_param_counts_sane():
    """Full-width param counts in the family's expected ranges."""
    module = build_module(config_lib.RETINANET_R50_512)
    dummy = jnp.zeros((1, 512, 512, 3), jnp.float32)
    variables = jax.eval_shape(lambda: module.init(jax.random.PRNGKey(0), dummy))
    n = sum(int(np.prod(l.shape))
            for l in jax.tree_util.tree_leaves(variables["params"]))
    assert 30e6 < n < 45e6, n  # RetinaNet-R50: ~34-38M

    module = build_module(config_lib.SSD300)
    dummy = jnp.zeros((1, 300, 300, 3), jnp.float32)
    variables = jax.eval_shape(lambda: module.init(jax.random.PRNGKey(0), dummy))
    n = sum(int(np.prod(l.shape))
            for l in jax.tree_util.tree_leaves(variables["params"]))
    assert 20e6 < n < 40e6, n  # SSD300-VGG16: ~26M
